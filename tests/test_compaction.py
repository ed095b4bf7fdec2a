"""Tombstone compaction: delete markers at or below the source's replay
floor are garbage-collectible without breaking LWW correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _seed(spark, root):
    table = BucketedUpsertTable(spark, str(root), n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
        (3, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:00:02"),
        (4, "delete", "a", 0, None, None, None, "2025-01-01 00:00:03"),
        (5, "delete", "b", 0, None, None, None, "2025-01-01 00:00:04"),
    ]), 0)
    return table


def test_compact_drops_old_tombstones_only(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    raw_ops = [r["op"] for r in table._read_raw().collect()]
    assert raw_ops.count("delete") == 2
    visible_before = sorted(map(tuple, table.read().collect()))

    # horizon 4: tombstone seq 4 is GC'd, seq 5 still guards
    out = table.compact(tombstone_horizon=4)
    assert out["removed"] == 1
    raw = {(r["conv_id"], r["op"]) for r in table._read_raw().collect()}
    assert ("a", "delete") not in raw and ("b", "delete") in raw
    assert sorted(map(tuple, table.read().collect())) == visible_before

    # second compact at the same horizon removes nothing (idempotent)
    assert table.compact(tombstone_horizon=4)["removed"] == 0


def test_compact_then_merge_still_lww_correct(spark, tmp_path):
    """Arrivals after compaction are >= horizon by contract: a replayed
    delete re-tombstones harmlessly, a newer write wins LWW."""
    table = _seed(spark, tmp_path / "t")
    table.compact(tombstone_horizon=5)  # both tombstones gone
    assert [r["op"] for r in table._read_raw().collect()].count("delete") == 0

    table.merge_batch(_batch(spark, [
        (5, "delete", "b", 0, None, None, None, "2025-01-01 00:00:04"),  # replayed delete
        (6, "insert", "a", 0, "u", "a-new", "", "2025-01-01 00:01:00"),  # newer write
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"c": "c0", "a": "a-new"}


def test_compact_survives_restart_and_recovery(spark, tmp_path):
    root = str(tmp_path / "t")
    table = _seed(spark, root)
    table.compact(tombstone_horizon=5)
    # restart: recovery must not restore the pre-compaction image
    table2 = BucketedUpsertTable(spark, root, n_buckets=4)
    assert [r["op"] for r in table2._read_raw().collect()].count("delete") == 0
    assert {r["conv_id"] for r in table2.read().collect()} == {"c"}
