"""Stream-maintained ANN index (round-6 task #3): the CDC stream keeps
the LSH-bucketed index live; queries against it must match the
batch-built index exactly — after bounded replay, after updates and
deletes, and across restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.similarity import knn_lsh
from aktuell_spark.streaming.ann_index import (
    VEC_FEED_SCHEMA,
    batch_index_oracle,
    knn_from_index,
    run_ann_index_stream,
    with_cell,
)

N_PLANES = 6


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .localCheckpoint()
    )


def _as_feed(df, seq_col=None, op="insert"):
    out = df
    if "seq" not in out.columns:
        out = out.withColumn(
            "seq", F.col(seq_col or "vec_id").cast("long")
        )
    if "op" not in out.columns:
        out = out.withColumn("op", F.lit(op))
    return out.select("vec_id", "embedding", "op", "seq")


def _write_feed(df, path, mode="append"):
    df.coalesce(1).write.mode(mode).parquet(path)


def _index_rows(table):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["embedding"]))
        for r in table.read().collect()
    )


def _knn_rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_built_index_equals_batch(spark, emb, tmp_path):
    base = str(tmp_path)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    _write_feed(_as_feed(half), f"{base}/feed")
    _write_feed(_as_feed(rest), f"{base}/feed")
    _, table = run_ann_index_stream(
        spark, f"{base}/feed", f"{base}/table", f"{base}/ckpt",
        n_planes=N_PLANES, n_buckets=8, max_files_per_trigger=1,
    )
    want = sorted(
        (r["vec_id"], r["cell"], tuple(r["embedding"]))
        for r in batch_index_oracle(emb, N_PLANES).collect()
    )
    assert _index_rows(table) == want

    got = _knn_rows(knn_from_index(table, k=3, max_bucket_size=64))
    ref = _knn_rows(knn_lsh(emb, k=3, n_planes=N_PLANES, max_bucket_size=64))
    assert got == ref and len(got) > 0

    # restart from the same checkpoint: a no-op
    _, table2 = run_ann_index_stream(
        spark, f"{base}/feed", f"{base}/table", f"{base}/ckpt",
        n_planes=N_PLANES, n_buckets=8,
    )
    assert _index_rows(table2) == want


def test_updates_and_deletes_maintain_index(spark, emb, tmp_path):
    """Updates move a vector to its NEW cell (old entry replaced via
    LWW, not orphaned); deletes drop it from every probe."""
    base = str(tmp_path)
    initial = emb.limit(60).localCheckpoint()
    _write_feed(_as_feed(initial), f"{base}/feed")
    _, table = run_ann_index_stream(
        spark, f"{base}/feed", f"{base}/table", f"{base}/ckpt",
        n_planes=N_PLANES, n_buckets=8,
    )

    ids = [r["vec_id"] for r in initial.select("vec_id").collect()]
    upd_id, del_id = ids[0], ids[1]
    # flip the sign of every dimension -> guaranteed different cell
    updated = (
        initial.filter(F.col("vec_id") == upd_id)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: -x).cast("array<float>"),
        )
    )
    gen2 = _as_feed(updated, op="update").withColumn(
        "seq", F.lit(10_000_000).cast("long")
    ).unionByName(
        spark.createDataFrame(
            [(del_id, None, "delete", 10_000_001)], VEC_FEED_SCHEMA
        )
    )
    _write_feed(gen2, f"{base}/feed")
    _, table = run_ann_index_stream(
        spark, f"{base}/feed", f"{base}/table", f"{base}/ckpt",
        n_planes=N_PLANES, n_buckets=8,
    )

    # batch golden: apply the update + delete to the initial set
    final = (
        initial.filter(~F.col("vec_id").isin([upd_id, del_id]))
        .unionByName(updated)
    )
    want = sorted(
        (r["vec_id"], r["cell"], tuple(r["embedding"]))
        for r in batch_index_oracle(final, N_PLANES).collect()
    )
    assert _index_rows(table) == want

    got = _knn_rows(knn_from_index(table, k=3, max_bucket_size=64))
    ref = _knn_rows(knn_lsh(final, k=3, n_planes=N_PLANES, max_bucket_size=64))
    assert got == ref
    assert not any(r[0] == del_id or r[1] == del_id for r in got)


def test_cell_probe_restricts_scan(spark, emb, tmp_path):
    base = str(tmp_path)
    _write_feed(_as_feed(emb), f"{base}/feed")
    _, table = run_ann_index_stream(
        spark, f"{base}/feed", f"{base}/table", f"{base}/ckpt",
        n_planes=N_PLANES, n_buckets=8,
    )
    cells = [
        r["cell"]
        for r in with_cell(emb, N_PLANES).select("cell").distinct().collect()
    ][:2]
    probed = knn_from_index(table, k=3, cells=cells)
    full = knn_from_index(table, k=3)
    got, want = _knn_rows(probed), _knn_rows(
        full.join(
            with_cell(emb, N_PLANES)
            .filter(F.col("cell").isin(cells))
            .select(F.col("vec_id").alias("query_id")),
            "query_id",
        )
    )
    assert got == want and len(got) > 0
    # the cell predicate reaches the scan (pushed filter on cell)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
