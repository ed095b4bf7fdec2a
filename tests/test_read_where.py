"""Pruned standing reads (round-8 optimization): ``read_where`` and the
lookup pre-predicate must push the key restriction BELOW the
merge-on-read run collapse without changing any surviving row —
including keys whose newest run row is a delete tombstone or an LWW
replacement."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _table(spark, tmp_path, mor):
    return BucketedUpsertTable(
        spark, str(tmp_path / ("mor" if mor else "cow")), n_buckets=4,
        key=("k",), payload=("k", "v"), order_col="seq",
        payload_schema=_SCHEMA, merge_on_read=mor,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, seq long, op string")


def _run(spark, tmp_path, mor):
    t = _table(spark, tmp_path, mor)
    t.merge_batch(_batch(spark, [
        (1, "a1", 1, "insert"), (2, "b1", 2, "insert"),
        (3, "c1", 3, "insert"), (9, "z1", 4, "insert"),
    ]), 0)
    t.merge_batch(_batch(spark, [
        (2, "b2", 10, "insert"),          # LWW replacement
        (3, None, 11, "delete"),          # tombstone
        (5, "e1", 12, "insert"),
    ]), 1)
    keys = spark.createDataFrame([(1,), (2,), (3,), (7,)], "k long")
    got = {r["k"]: r["v"] for r in t.read_where(keys, "k").collect()}
    # 1 untouched, 2 replaced by LWW, 3 deleted, 7 absent
    assert got == {1: "a1", 2: "b2"}, got
    # parity with the unpruned read
    want = {
        r["k"]: r["v"]
        for r in t.read().filter(F.col("k").isin(1, 2, 3, 7)).collect()
    }
    assert got == want
    # lookup_many (pre_pred below the collapse on MoR) agrees too
    got2 = {r["k"]: r["v"] for r in t.lookup_many([1, 2, 3, 7]).collect()}
    assert got2 == want


def test_read_where_mor(spark, tmp_path):
    _run(spark, tmp_path, mor=True)


def test_read_where_cow(spark, tmp_path):
    _run(spark, tmp_path, mor=False)
