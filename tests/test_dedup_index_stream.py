"""Stream-maintained MinHash-LSH dedup index: the live index must find
exactly the near-dup pairs the batch sweep finds on the final corpus —
for any batch slicing, across restarts, and for late-arriving
duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import minhash_lsh_pairs
from aktuell_spark.streaming.dedup_index import run_dedup_index_stream


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )


def _feed(docs):
    return docs.withColumn("seq", F.col("doc_id"))


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_stream_pairs_equal_batch_for_any_slicing(spark, docs, tmp_path):
    want = _pairs(minhash_lsh_pairs(docs, threshold=0.2))
    assert want, "fixture corpus has no near-dup pairs; test is vacuous"
    for slices, name in ((2, "s2"), (5, "s5")):
        base = str(tmp_path / name)
        for i in range(slices):
            (
                _feed(docs.filter(F.col("doc_id") % slices == i))
                .coalesce(1).write.mode("append").parquet(f"{base}/feed")
            )
        _, index = run_dedup_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
            threshold=0.2, n_buckets=8, max_files_per_trigger=1,
        )
        assert _pairs(index.found_pairs()) == want, f"slicing {slices}"


def test_restart_is_noop_and_late_dup_found(spark, docs, tmp_path):
    base = str(tmp_path)
    first = docs.filter(F.col("doc_id") >= 10)
    _feed(first).coalesce(1).write.parquet(f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    before = _pairs(index.found_pairs())
    # restart on the same checkpoint: nothing new
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    assert _pairs(index.found_pairs()) == before

    # generation 2: the held-back docs arrive later; the index must
    # discover exactly the pairs the batch sweep finds on the union
    late = docs.filter(F.col("doc_id") < 10)
    _feed(late).coalesce(1).write.mode("append").parquet(f"{base}/feed")
    _, index = run_dedup_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        threshold=0.2, n_buckets=8,
    )
    want = _pairs(minhash_lsh_pairs(docs, threshold=0.2))
    assert _pairs(index.found_pairs()) == want
