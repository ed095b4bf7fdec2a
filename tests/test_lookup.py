"""Bucket-pruned point reads.

Two halves under test:
1. Driver-side XXH64 parity — the pure-Python hash in
   functions/xxh64.py must equal ``F.xxhash64`` (seed 42) bit-for-bit,
   else lookup() would scan the WRONG bucket and silently return empty.
   Pinned over randomized strings (len 0..64 crossing every tail-size
   branch: 32-byte stripes, 8-byte words, 4-byte word, single bytes;
   multi-byte UTF-8) and int/long encodings.
2. lookup()/lookup_many() semantics + the scale shape: results equal a
   full-scan filter, the files actually read all live in the pruned
   bucket dirs (``inputFiles``), and the key predicate reaches the
   parquet scan (``PushedFilters``) so row-group stats can skip within
   a bucket.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aktuell_spark.functions.xxh64 import spark_bucket, spark_xxhash64, xxh64
from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _seed_table(spark, tmp_path, **kw):
    table = BucketedUpsertTable(spark, str(tmp_path / "t"), n_buckets=8, **kw)
    rows = []
    seq = 0
    for c in range(20):
        for t in range(3):
            seq += 1
            rows.append((seq, "insert", f"conv-{c}", t, "user",
                         f"text-{c}-{t}", "", "2025-01-01 00:00:00"))
    table.merge_batch(_batch(spark, rows), 0)
    # an update and a delete so lookup sees post-merge state
    table.merge_batch(_batch(spark, [
        (seq + 1, "update", "conv-3", 1, "user", "text-3-1-v2", "",
         "2025-01-01 00:01:00"),
        (seq + 2, "delete", "conv-3", 2, None, None, None,
         "2025-01-01 00:01:01"),
    ]), 1)
    return table


# -- XXH64 parity ------------------------------------------------------

def test_xxh64_reference_vectors():
    """Spot values computed with the reference xxhash CLI (public
    algorithm test vectors, seed 0): XXH64("") = ef46db3751d8e999,
    XXH64("a") = d24ec4f1a98c6e5b, XXH64("abc") = 44bc2cf5ad770999."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_xxh64_matches_spark_strings(spark):
    rng = random.Random(7)
    alphabet = "abcdefghij0123456789-_/ äöüßλ中文🙂"
    vals = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 65)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["v"]: r["h"] for r in
           df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert spark_xxhash64(v, "string") == got[v], repr(v)


def test_xxh64_matches_spark_ints_and_longs(spark):
    rng = random.Random(11)
    ivals = [0, -1, 1, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(50)
    ]
    lvals = [0, -1, 2**63 - 1, -(2**63)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(50)
    ]
    df = spark.createDataFrame(
        list(zip(ivals, lvals[: len(ivals)])), "i int, l long"
    )
    rows = df.select(
        "i", "l", F.xxhash64("i").alias("hi"), F.xxhash64("l").alias("hl")
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["i"], "int") == r["hi"]
        assert spark_xxhash64(r["l"], "long") == r["hl"]


def test_bucket_of_matches_write_layout(spark, tmp_path):
    """Every conv's rows must physically live in the dir bucket_of
    predicts — parity of pmod semantics included (negative hashes)."""
    table = _seed_table(spark, tmp_path)
    placed = {
        r["conv_id"]: r["bucket"]
        for r in table._read_raw().select("conv_id", "bucket").distinct().collect()
    }
    for conv, b in placed.items():
        assert table.bucket_of(conv) == b == spark_bucket(conv, 8)


# -- lookup semantics + plan shape ------------------------------------

def test_lookup_equals_full_scan_filter(spark, tmp_path):
    table = _seed_table(spark, tmp_path)
    got = {(r["turn_idx"], r["text"]) for r in table.lookup("conv-3").collect()}
    want = {(r["turn_idx"], r["text"]) for r in
            table.read().filter(F.col("conv_id") == "conv-3").collect()}
    assert got == want
    assert got == {(0, "text-3-0"), (1, "text-3-1-v2")}  # turn 2 deleted


def test_lookup_scans_single_bucket_with_pushed_filter(spark, tmp_path):
    table = _seed_table(spark, tmp_path)
    df = table.lookup("conv-7")
    b = table.bucket_of("conv-7")
    files = df.inputFiles()
    assert files and all(f"bucket={b}/" in f for f in files)
    from aktuell_spark.plans.explain import has_pushed_filter

    assert has_pushed_filter(df, "conv_id"), (
        "key equality must reach the parquet scan for row-group skipping"
    )


def test_lookup_many_prunes_to_union_of_buckets(spark, tmp_path):
    table = _seed_table(spark, tmp_path)
    keys = ["conv-1", "conv-5", "conv-9", "conv-9"]
    df = table.lookup_many(keys)
    got = {r["conv_id"] for r in df.collect()}
    assert got == {"conv-1", "conv-5", "conv-9"}
    assert df.count() == 9
    allowed = {table.bucket_of(k) for k in keys}
    assert all(
        any(f"bucket={b}/" in f for b in allowed) for f in df.inputFiles()
    )
    assert table.lookup_many([]).count() == 0
    assert table.lookup("no-such-conv").count() == 0


def test_lookup_on_merge_on_read_and_as_of(spark, tmp_path):
    table = _seed_table(spark, tmp_path, merge_on_read=True)
    got = {(r["turn_idx"], r["text"]) for r in table.lookup("conv-3").collect()}
    assert got == {(0, "text-3-0"), (1, "text-3-1-v2")}
    before = {(r["turn_idx"], r["text"]) for r in
              table.lookup("conv-3", as_of_epoch=0).collect()}
    assert before == {(0, "text-3-0"), (1, "text-3-1"), (2, "text-3-2")}
    b = table.bucket_of("conv-3")
    assert all(f"bucket={b}/" in f for f in table.lookup("conv-3").inputFiles())
