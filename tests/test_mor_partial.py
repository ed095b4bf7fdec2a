"""Merge-on-read × partial updates: LSM runs store delta columns and the
read-time collapse folds post-images (reconstruct_post_images), so a
delta-only change feed (the reference's no-UpdateLookup shape,
/root/reference/pkg/models/types.go:17-18) gets MoR's O(batch) ingest
and still materializes byte-identically to the copy-on-write path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from aktuell_spark.streaming.sink import BucketedUpsertTable

CHANGE_DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, text string, "
    "tool string, updated_fields map<string,string>, removed_fields array<string>, "
    "ts string"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _rows(table):
    return sorted(map(tuple, table.read().collect()))


def test_mor_partial_equals_cow_partial(spark, tmp_path):
    """Delta-only feed through MoR+partials and CoW+partials across
    multiple epochs: identical materialized rows."""
    t = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=24, seed=37)
    ch = gen_transcript_changes(t, seed=37, partial_updates=True).localCheckpoint()
    feed = f"{tmp_path}/feed"
    write_change_feed(ch, feed, n_files=3)

    _, cow = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/cow", f"{tmp_path}/cowck",
        n_buckets=4, max_files_per_trigger=1, partial_updates=True,
    )
    _, mor = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/mor", f"{tmp_path}/morck",
        n_buckets=4, max_files_per_trigger=1, partial_updates=True,
        merge_on_read=True,
    )
    assert _rows(mor) == _rows(cow)
    # MoR really appended: runs from more than one epoch exist
    data = f"{tmp_path}/mor/data"
    epochs = {
        f.split("-")[0]
        for e in os.listdir(data) if e.startswith("bucket=")
        for f in os.listdir(os.path.join(data, e)) if f.endswith(".parquet")
    }
    assert len(epochs) > 1, epochs


def test_mor_partial_fold_semantics_across_epochs(spark, tmp_path):
    table = BucketedUpsertTable(
        spark, str(tmp_path / "t"), n_buckets=2,
        partial_updates=True, merge_on_read=True,
    )
    # epoch 0: bases
    table.merge_batch(_mk(spark, [
        (1, "insert", "A", 0, "user", "hello", "search", None, None, "2025-01-01 00:00:00"),
        (2, "insert", "C", 0, "user", "bye", "", None, None, "2025-01-01 00:00:00"),
    ]), 0)
    # epoch 1: delta onto A (text), delete C, orphan delta for B
    table.merge_batch(_mk(spark, [
        (3, "update", "A", 0, None, None, None, {"text": "hello v2"}, None, "2025-01-01 01:00:00"),
        (4, "delete", "C", 0, None, None, None, None, None, "2025-01-01 01:00:00"),
        (5, "update", "B", 0, None, None, None, {"text": "orphan"}, None, "2025-01-01 01:00:00"),
    ]), 1)
    # epoch 2: remove A's tool, zombie delta for C (after delete)
    table.merge_batch(_mk(spark, [
        (6, "update", "A", 0, None, None, None, None, ["tool"], "2025-01-01 02:00:00"),
        (7, "update", "C", 0, None, None, None, {"text": "zombie"}, None, "2025-01-01 02:00:00"),
    ]), 2)

    got = {r["conv_id"]: r for r in table.read().collect()}
    assert set(got) == {"A"}
    assert got["A"]["text"] == "hello v2"
    assert got["A"]["tool"] is None
    assert got["A"]["role"] == "user"

    # replay of a committed epoch is a no-op
    before = _rows(table)
    table.merge_batch(_mk(spark, [
        (3, "update", "A", 0, None, None, None, {"text": "hello v2"}, None, "2025-01-01 01:00:00"),
    ]), 1)
    assert _rows(table) == before


def test_mor_partial_compact_folds_and_preserves(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(
        spark, root, n_buckets=2, partial_updates=True, merge_on_read=True,
    )
    table.merge_batch(_mk(spark, [
        (1, "insert", "A", 0, "user", "v0", "py", None, None, "2025-01-01 00:00:00"),
        (2, "insert", "B", 0, "user", "b0", "", None, None, "2025-01-01 00:00:00"),
    ]), 0)
    for i in range(1, 5):
        table.merge_batch(_mk(spark, [
            (1 + i, "update", "A", 0, None, None, None, {"text": f"v{i}"}, None,
             f"2025-01-01 0{i}:00:00"),
        ]), i)
    before = _rows(table)
    assert table.max_runs_per_bucket() >= 2
    table.compact(tombstone_horizon=0)
    assert _rows(table) == before
    assert table.max_runs_per_bucket() == 1
    # post-compaction state is full images: a later delta still folds
    table.merge_batch(_mk(spark, [
        (10, "update", "A", 0, None, None, None, {"text": "after-compact"}, None,
         "2025-01-01 06:00:00"),
    ]), 10)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got["A"] == "after-compact" and got["B"] == "b0"
