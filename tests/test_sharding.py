"""Training-shard export: deterministic assignment + one-file-per-shard
layout + manifest (operators/sharding.py).

The delivery stage of a curation pipeline: the reference hands
materialized conversations to consumers one document at a time
(ref pkg/client/client.go consume loop); at training scale the
consumable unit is a shard directory a dataloader claims whole.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from aktuell_spark.operators.sharding import (
    assign_shards,
    shard_id,
    write_training_shards,
)

N = 16


def py_shard(key: str, n_shards: int) -> int:
    """Independent recomputation: md5-prefix shard, as any external
    consumer (DuckDB, pandas) would derive it."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(f"doc-{i:04d}", f"text {i}", i % 7) for i in range(300)],
        "doc_id string, text string, grp int",
    )


def test_assignment_matches_independent_md5(spark, docs):
    rows = assign_shards(docs, "doc_id", N).select("doc_id", "shard").collect()
    assert len(rows) == 300
    for r in rows:
        assert r["shard"] == py_shard(r["doc_id"], N), r["doc_id"]


def test_assignment_is_partitioning_invariant(spark, docs):
    a = {r["doc_id"]: r["shard"]
         for r in assign_shards(docs, "doc_id", N).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in assign_shards(docs.repartition(13), "doc_id", N).collect()}
    assert a == b


def test_assignment_is_narrow(spark, docs):
    plan = assign_shards(docs, "doc_id", N)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one hash per row, map-side


def test_write_one_file_per_shard_and_manifest(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, "doc_id", N)

    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk["n_shards"] == N and on_disk["shards"] == manifest
    assert sum(m["rows"] for m in manifest) == 300

    seen_rows = 0
    for m in manifest:
        files = glob.glob(os.path.join(path, f"shard={m['shard']}", "*.parquet"))
        if m["rows"] == 0:
            assert files == []
            continue
        assert len(files) == 1, f"shard {m['shard']}: want ONE claimable file"
        back = spark.read.parquet(os.path.join(path, f"shard={m['shard']}"))
        assert back.count() == m["rows"]
        seen_rows += m["rows"]
        # every row really belongs to this shard
        for r in back.select("doc_id").collect():
            assert py_shard(r["doc_id"], N) == m["shard"]
    assert seen_rows == 300


def test_roundtrip_preserves_rows(spark, docs, tmp_path):
    path = str(tmp_path / "shards2")
    write_training_shards(docs, path, "doc_id", N)
    back = spark.read.parquet(path)
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # shard column survives as partition column
    assert "shard" in back.columns
