"""Collection-level ops: drop truncates (persisted watermark), rename
preserves data. Reference op enum: pkg/models/types.go:101-108."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from aktuell_spark.fixtures import (
    gen_transcript_changes,
    gen_transcripts,
    inject_collection_op,
)
from aktuell_spark.operators.cdc import apply_collection_ops, latest_image
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def test_drop_truncates_and_floor_persists(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
        (3, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:00:02"),
    ]), 0)
    # epoch 1: drop, then re-insert a and insert e AFTER the drop
    table.merge_batch(_batch(spark, [
        (10, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (11, "insert", "e", 0, "u", "e0", "", "2025-01-01 01:00:01"),
        (12, "insert", "a", 0, "u", "a-reborn", "", "2025-01-01 01:00:02"),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"e": "e0", "a": "a-reborn"}
    assert table.drop_floor() == 10

    # epoch 2: late duplicate of a pre-drop insert must NOT resurrect
    table.merge_batch(_batch(spark, [
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 2)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert "b" not in got and got["a"] == "a-reborn"

    # a restarted table object sees the same floor
    assert BucketedUpsertTable(spark, root, n_buckets=4).drop_floor() == 10


def test_drop_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    drop_batch = _batch(spark, [
        (5, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (6, "insert", "z", 0, "u", "z0", "", "2025-01-01 01:00:01"),
    ])
    table.merge_batch(drop_batch, 1)
    first = sorted(map(tuple, table.read().collect()))
    # replay of the committed epoch is a no-op; a forced re-merge of the
    # same batch under a new epoch converges to the same rows
    table.merge_batch(drop_batch, 1)
    table.merge_batch(drop_batch, 2)
    assert sorted(map(tuple, table.read().collect())) == first


def test_rename_preserves_data_and_records_lineage(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (2, "rename", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (3, "insert", "b", 0, "u", "b0", "", "2025-01-01 01:00:01"),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"a": "a0", "b": "b0"}  # rename did not truncate
    assert table.drop_floor() is None
    assert os.path.exists(os.path.join(root, "_metrics", "rename-1.json"))


def test_drop_in_partial_update_mode(spark, tmp_path):
    ddl = DDL + ", updated_fields map<string,string>, removed_fields array<string>"
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4, partial_updates=True)
    mk = lambda rows: spark.createDataFrame(rows, ddl).withColumn(
        "ts", F.to_timestamp("ts")
    )
    table.merge_batch(mk([
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00", None, None),
    ]), 0)
    # drop kills a; a delta for a after the drop matches nothing
    table.merge_batch(mk([
        (5, "drop", "", -1, None, None, None, "2025-01-01 01:00:00", None, None),
        (6, "update", "a", 0, None, None, None, "2025-01-01 01:00:01", {"text": "ghost"}, None),
        (7, "insert", "b", 0, "u", "b0", "", "2025-01-01 01:00:02", None, None),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"b": "b0"}


def test_streaming_drop_equals_batch_oracle(spark, tmp_path):
    """End-to-end: generated feed + injected drop through the streaming
    pipeline equals apply_collection_ops → latest_image run in batch."""
    t = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=30, seed=11)
    ch = gen_transcript_changes(t, seed=11)
    # double the seqs so the injected drop gets a unique odd seq mid-feed
    ch = ch.withColumn("seq", F.col("seq") * 2)
    n = ch.agg(F.max("seq")).first()[0]
    drop_seq = n // 2 + 1  # odd → unique
    feed = inject_collection_op(
        ch, "drop", drop_seq, datetime.datetime(2025, 1, 1, 12, 0, 0)
    ).localCheckpoint()

    write_change_feed(feed, f"{tmp_path}/feed", n_files=3)
    _, table = run_cdc_pipeline(
        spark, f"{tmp_path}/feed", f"{tmp_path}/tab", f"{tmp_path}/ck",
        n_buckets=8, max_files_per_trigger=1,
    )
    want = latest_image(apply_collection_ops(feed))
    got_rows = sorted(map(tuple, table.read().collect()))
    want_rows = sorted(map(tuple, want.select(*table.payload).collect()))
    assert got_rows == want_rows and len(got_rows) > 0
    assert table.drop_floor() == drop_seq


def test_drop_and_rename_in_same_batch(spark, tmp_path):
    """The marker collapse is keyed per op (_mk), so one batch carrying
    BOTH a drop and a rename applies both: truncation happens AND the
    rename is recorded."""
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (5, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (6, "rename", "", -1, None, None, None, "2025-01-01 01:00:01"),
        (7, "insert", "b", 0, "u", "b0", "", "2025-01-01 01:00:02"),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"b": "b0"}  # drop applied
    assert table.drop_floor() == 5
    assert os.path.exists(os.path.join(root, "_metrics", "rename-1.json"))


def test_marker_rows_never_enter_data_buckets(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "rename", "", -1, None, None, None, "2025-01-01 00:00:01"),
    ]), 0)
    raw = table._read_raw()
    ops = {r["op"] for r in raw.collect()}
    assert ops == {"insert"}
    assert not os.path.exists(os.path.join(root, "data", "bucket=-1"))


def test_drop_retry_after_floor_persisted_still_truncates(spark, tmp_path):
    """Review finding: if the drop epoch crashed AFTER persisting the
    floor but BEFORE the swap, the replayed batch used to filter the
    marker out (seq > floor is false at seq == floor) and skip the
    present-bucket truncation forever. Markers are floor-exempt now."""
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
        (3, "insert", "c", 0, "u", "c0", "", "2025-01-01 00:00:02"),
    ]), 0)
    # simulate the crashed epoch's side effect: floor persisted, no swap
    table._advance_drop_floor(10)
    assert table.drop_floor() == 10
    # Structured Streaming replays the drop epoch
    table.merge_batch(_batch(spark, [
        (10, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (11, "insert", "e", 0, "u", "e0", "", "2025-01-01 01:00:01"),
    ]), 1)
    got = {r["conv_id"] for r in table.read().collect()}
    assert got == {"e"}, f"replayed drop must still truncate, got {got}"


def test_stale_redelivered_drop_does_not_rewrite(spark, tmp_path):
    """A duplicate of an OLD drop (below the governing floor) is
    subsumed: no present-bucket expansion, state unchanged."""
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (5, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (6, "insert", "b", 0, "u", "b0", "", "2025-01-01 01:00:01"),
    ]), 0)
    before = sorted(map(tuple, table.read().collect()))
    # epoch 1 redelivers an older drop (seq 3 < floor 5) alone
    table.merge_batch(_batch(spark, [
        (3, "drop", "", -1, None, None, None, "2025-01-01 00:30:00"),
    ]), 1)
    assert table.drop_floor() == 5
    assert sorted(map(tuple, table.read().collect())) == before
