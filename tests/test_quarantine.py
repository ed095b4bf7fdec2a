"""Dead-letter quarantine: malformed events (null key/seq) must not
poison the table layout — they route to _quarantine and the clean rows
merge normally. Without it a null key hashes to a null bucket and the
bucket-dir listing every read depends on stops parsing."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def test_quarantine_splits_bad_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4, quarantine=True)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", None, 0, "u", "poison", "", "2025-01-01 00:00:01"),
        (None, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:02"),
        (3, None, None, None, None, "op-and-key-null", "", "2025-01-01 00:00:03"),
        (4, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:00:04"),
    ]), 0)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"a": "a0", "c": "c0"}
    bad = {r["text"] for r in table.quarantined().collect()}
    assert bad == {"poison", "b0", "op-and-key-null"}
    with open(os.path.join(root, "_metrics", "epoch-0.json")) as f:
        assert json.load(f)["quarantined_rows"] == 3


def test_quarantine_markers_pass_through(spark, tmp_path):
    """drop/rename markers have null keys BY DESIGN — never quarantined."""
    table = BucketedUpsertTable(
        spark, str(tmp_path / "t2"), n_buckets=4, quarantine=True
    )
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (10, "drop", None, None, None, None, None, "2025-01-01 01:00:00"),
        (11, "insert", "e", 0, "u", "e0", "", "2025-01-01 01:00:01"),
    ]), 1)
    assert {r["conv_id"] for r in table.read().collect()} == {"e"}
    assert table.quarantined() is None or table.quarantined().count() == 0


def test_quarantine_replay_idempotent(spark, tmp_path):
    table = BucketedUpsertTable(
        spark, str(tmp_path / "t3"), n_buckets=4, quarantine=True
    )
    b = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", None, 0, "u", "bad", "", "2025-01-01 00:00:01"),
    ])
    table.merge_batch(b, 0)
    table.merge_batch(b, 0)  # replayed epoch is a committed no-op
    assert table.quarantined().count() == 1
    assert table.read().count() == 1


def test_clean_batches_leave_no_quarantine_dirs(spark, tmp_path):
    root = str(tmp_path / "t4")
    table = BucketedUpsertTable(spark, root, n_buckets=4, quarantine=True)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    assert table.quarantined() is None or table.quarantined().count() == 0


def test_pipeline_quarantine_end_to_end(spark, tmp_path):
    """Streaming path: a feed with planted malformed rows completes and
    materializes only the clean rows; the dead letters are queryable."""
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline

    good = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ])
    bad = _batch(spark, [
        (3, "insert", None, 0, "u", "dead1", "", "2025-01-01 00:00:02"),
        (None, "insert", "c", 0, "u", "dead2", "", "2025-01-01 00:00:03"),
    ])
    feed = str(tmp_path / "feed")
    full = good.unionByName(bad).withColumn("database", F.lit("aktuell")) \
        .withColumn("collection", F.lit("transcripts"))
    full.coalesce(1).write.parquet(feed)
    _, table = run_cdc_pipeline(
        spark, feed, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=4, quarantine=True,
    )
    assert {r["conv_id"] for r in table.read().collect()} == {"a", "b"}
    assert {r["text"] for r in table.quarantined().collect()} == {"dead1", "dead2"}


def test_fanout_quarantine_from_yaml_config(spark, tmp_path):
    """Deployment path: a YAML config with engine.quarantine routes
    malformed events per-subscription instead of poisoning any table."""
    from aktuell_spark.config import load_manager

    cfg = tmp_path / "engine.yaml"
    cfg.write_text(
        """
mongodb:
  databases:
    - name: aktuell
      collections: [transcripts]
engine:
  quarantine: true
  n_buckets: 4
"""
    )
    good = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ])
    bad = _batch(spark, [
        (2, "insert", None, 0, "u", "dead", "", "2025-01-01 00:00:01"),
    ])
    feed = str(tmp_path / "feed")
    good.unionByName(bad).withColumn("database", F.lit("aktuell")) \
        .withColumn("collection", F.lit("transcripts")) \
        .coalesce(1).write.parquet(feed)
    mgr, settings = load_manager(
        spark, str(cfg), feed_dir=feed,
        root=str(tmp_path / "root"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert settings.quarantine is True
    mgr.run(await_termination=True)
    got = mgr.read("aktuell", "aktuell.transcripts")
    assert {r["conv_id"] for r in got.collect()} == {"a"}
    sub_table = mgr.sinks["aktuell"].tables["aktuell.transcripts"]
    assert {r["text"] for r in sub_table.quarantined().collect()} == {"dead"}


def test_quarantine_with_merge_on_read(spark, tmp_path):
    table = BucketedUpsertTable(
        spark, str(tmp_path / "qmor"), n_buckets=4,
        merge_on_read=True, quarantine=True,
    )
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", None, 0, "u", "dead", "", "2025-01-01 00:00:01"),
    ]), 0)
    assert {r["conv_id"] for r in table.read().collect()} == {"a"}
    assert {r["text"] for r in table.quarantined().collect()} == {"dead"}


def test_quarantine_with_partial_updates(spark, tmp_path):
    table = BucketedUpsertTable(
        spark, str(tmp_path / "qpart"), n_buckets=4,
        partial_updates=True, quarantine=True,
    )
    full = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", None, 0, "u", "dead", "", "2025-01-01 00:00:01"),
    ]).withColumn("updated_fields", F.lit(None).cast("map<string,string>")) \
      .withColumn("removed_fields", F.lit(None).cast("array<string>"))
    table.merge_batch(full, 0)
    assert {r["conv_id"] for r in table.read().collect()} == {"a"}
    assert {r["text"] for r in table.quarantined().collect()} == {"dead"}


def test_vacuum_quarantine(spark, tmp_path):
    table = BucketedUpsertTable(
        spark, str(tmp_path / "qv"), n_buckets=4, quarantine=True
    )
    for ep in (0, 1):
        table.merge_batch(_batch(spark, [
            (10 * ep + 1, "insert", "a", ep, "u", "ok", "", "2025-01-01 00:00:00"),
            (10 * ep + 2, "insert", None, ep, "u", f"dead{ep}", "", "2025-01-01 00:00:01"),
        ]), ep)
    assert table.quarantined().count() == 2
    assert table.vacuum_quarantine(up_to_epoch=0) == 1
    assert {r["text"] for r in table.quarantined().collect()} == {"dead1"}
    assert table.read().count() == 2  # data untouched
