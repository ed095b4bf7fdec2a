"""Residual dynamic payload fields (schemaless document columns,
reference pkg/models/types.go:16): the ``extra`` map rides through the
sink, and partial updates whose delta keys name no fixed column fold
into it (upsert via updated_fields, delete via removed_fields)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import PAYLOAD_COLS
from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, text string, "
    "tool string, updated_fields map<string,string>, removed_fields array<string>, "
    "ts string, extra map<string,string>"
)
PAYLOAD_X = (*PAYLOAD_COLS, "extra")


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _table(spark, root, **kw):
    return BucketedUpsertTable(spark, str(root), n_buckets=2, payload=PAYLOAD_X, **kw)


ROWS_E0 = [
    (1, "insert", "A", 0, "user", "hi", "py",
     None, None, "2025-01-01 00:00:00", {"origin": "web", "note": "n0"}),
    (2, "insert", "B", 0, "user", "yo", "",
     None, None, "2025-01-01 00:00:00", None),
]
ROWS_E1 = [
    # delta: fixed column + residual upsert + residual delete
    (3, "update", "A", 0, None, None, None,
     {"text": "hi2", "score": "9"}, ["note"], "2025-01-01 01:00:00", None),
]


def test_extra_rides_through_cow_sink(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    t.merge_batch(_mk(spark, ROWS_E0), 0)
    got = {r["conv_id"]: r for r in t.read().collect()}
    assert dict(got["A"]["extra"]) == {"origin": "web", "note": "n0"}
    assert got["B"]["extra"] is None


def test_partial_update_folds_residual_keys_cow(spark, tmp_path):
    t = _table(spark, tmp_path / "t", partial_updates=True)
    t.merge_batch(_mk(spark, ROWS_E0), 0)
    t.merge_batch(_mk(spark, ROWS_E1), 1)
    got = {r["conv_id"]: r for r in t.read().collect()}
    assert got["A"]["text"] == "hi2"
    assert dict(got["A"]["extra"]) == {"origin": "web", "score": "9"}


def test_partial_update_folds_residual_keys_mor(spark, tmp_path):
    t = _table(spark, tmp_path / "t", partial_updates=True, merge_on_read=True)
    t.merge_batch(_mk(spark, ROWS_E0), 0)
    t.merge_batch(_mk(spark, ROWS_E1), 1)
    got = {r["conv_id"]: r for r in t.read().collect()}
    assert got["A"]["text"] == "hi2"
    assert dict(got["A"]["extra"]) == {"origin": "web", "score": "9"}
    # compaction preserves the folded residual state
    t.compact(tombstone_horizon=0)
    got = {r["conv_id"]: r for r in t.read().collect()}
    assert dict(got["A"]["extra"]) == {"origin": "web", "score": "9"}
    assert got["B"]["extra"] is None
