"""Merge-on-read sink mode: epochs append LSM-style bucket runs, reads
collapse, compact() folds. Ingest is O(batch) with no read-modify-write
of existing state — the write-heavy-CDC counterpart to copy-on-write."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _bucket_files(root):
    out = {}
    data = os.path.join(root, "data")
    for e in os.listdir(data):
        if e.startswith("bucket="):
            out[e] = sorted(
                f for f in os.listdir(os.path.join(data, e)) if f.endswith(".parquet")
            )
    return out


def test_mor_appends_equal_cow_state(spark, tmp_path):
    """Same feed through MoR (appends) and CoW (rewrites): identical
    visible state; MoR buckets accumulate one run per epoch."""
    t = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=24, seed=31)
    ch = gen_transcript_changes(t, seed=31).localCheckpoint()
    feed = f"{tmp_path}/feed"
    write_change_feed(ch, feed, n_files=3)

    _, cow = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/cow", f"{tmp_path}/cowck",
        n_buckets=4, max_files_per_trigger=1,
    )
    _, mor = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/mor", f"{tmp_path}/morck",
        n_buckets=4, max_files_per_trigger=1, merge_on_read=True,
    )
    assert sorted(map(tuple, mor.read().collect())) == sorted(
        map(tuple, cow.read().collect())
    )
    # MoR really appended: some bucket holds runs from more than one epoch
    epochs_seen = {
        f.split("-")[0] for fs in _bucket_files(f"{tmp_path}/mor").values() for f in fs
    }
    assert len(epochs_seen) > 1, f"expected multi-epoch runs, saw {epochs_seen}"


def test_mor_replay_and_crash_recovery(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=2, merge_on_read=True)
    b0 = _batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ])
    table.merge_batch(b0, 0)
    first = sorted(map(tuple, table.read().collect()))
    table.merge_batch(b0, 0)  # committed replay is a no-op
    assert sorted(map(tuple, table.read().collect())) == first

    # simulate a crash mid-append of epoch 1: files moved, no commit
    b1 = _batch(spark, [(3, "update", "a", 0, "u", "a1", "", "2025-01-01 01:00:00")])
    bdir = os.path.join(root, "data", "bucket=0")
    os.makedirs(bdir, exist_ok=True)
    with open(os.path.join(root, "_inflight-epoch-1"), "w") as f:
        f.write("0,1")
    for b in (0, 1):
        d = os.path.join(root, "data", f"bucket={b}")
        if os.path.isdir(d):
            with open(os.path.join(d, "epoch1-0.parquet"), "w") as f:
                f.write("torn half-written run")
    # replay: recovery must delete exactly epoch1-* files, then re-append
    table.merge_batch(b1, 1)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"a": "a1", "b": "b0"}


def test_mor_drop_floor_applies_at_read(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=2, merge_on_read=True)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        (5, "drop", "", -1, None, None, None, "2025-01-01 01:00:00"),
        (6, "insert", "c", 0, "u", "c0", "", "2025-01-01 01:00:01"),
    ]), 1)
    assert {r["conv_id"] for r in table.read().collect()} == {"c"}
    assert table.drop_floor() == 5
    # late pre-drop duplicate appended later still dead at read
    table.merge_batch(_batch(spark, [
        (2, "insert", "b", 0, "u", "b0", "", "2025-01-01 00:00:01"),
    ]), 2)
    assert {r["conv_id"] for r in table.read().collect()} == {"c"}


def test_mor_compact_folds_runs(spark, tmp_path):
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=2, merge_on_read=True)
    for e in range(3):
        table.merge_batch(_batch(spark, [
            (10 * e + 1, "insert", f"k{e}", 0, "u", f"v{e}", "", "2025-01-01 00:00:00"),
            (10 * e + 2, "update", "k0", 0, "u", f"k0v{e}", "", "2025-01-01 00:00:01"),
        ]), e)
    table.merge_batch(_batch(spark, [
        (99, "delete", "k1", 0, None, None, None, "2025-01-01 02:00:00"),
    ]), 3)
    before = sorted(map(tuple, table.read().collect()))
    assert any(len(fs) > 1 for fs in _bucket_files(root).values())

    out = table.compact(tombstone_horizon=99)
    assert all(len(fs) == 1 for fs in _bucket_files(root).values())
    assert sorted(map(tuple, table.read().collect())) == before
    assert out["rows"] == len(before)  # tombstone + duplicate runs folded away

    # post-compaction ingest keeps working (appends onto folded buckets)
    table.merge_batch(_batch(spark, [
        (100, "insert", "z", 0, "u", "z0", "", "2025-01-01 03:00:00"),
    ]), 4)
    assert ("z", 0, "u", "z0", "") == tuple(
        table.read().filter(F.col("conv_id") == "z").collect()[0]
    )[:5]


def test_mor_read_skips_uncommitted_epoch_files(spark, tmp_path):
    """Snapshot isolation: run files land before the commit marker; a
    reader must not see an epoch that has no marker yet."""
    import shutil

    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=2, merge_on_read=True)
    table.merge_batch(_batch(spark, [
        (1, "insert", "a", 0, "u", "a0", "", "2025-01-01 00:00:00"),
    ]), 0)
    before = sorted(map(tuple, table.read().collect()))
    # plant a run file for epoch 99 with no _commits/99 marker
    for e in os.listdir(os.path.join(root, "data")):
        bdir = os.path.join(root, "data", e)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(bdir, f), os.path.join(bdir, "epoch99-0.parquet")
                )
    assert sorted(map(tuple, table.read().collect())) == before
    # once the marker exists the file is visible (duplicate row collapses
    # to the same image, so state is unchanged but the file is read)
    with open(os.path.join(root, "_commits", "99"), "w") as f:
        f.write("ok")
    assert sorted(map(tuple, table.read().collect())) == before


# merge_on_read + partial_updates is now a supported combination;
# coverage lives in tests/test_mor_partial.py


def test_mor_with_enrichment(spark, tmp_path):
    """Review finding: enrich=True used to silently drop merge_on_read.
    Enriched MoR must append runs AND materialize enriched columns."""
    from aktuell_spark.streaming.pipeline import enrich_turns

    t = gen_transcripts(spark, n_convs=10, avg_turns=5, hot_turns=10, seed=37)
    ch = gen_transcript_changes(t, seed=37).localCheckpoint()
    feed = f"{tmp_path}/feed"
    write_change_feed(ch, feed, n_files=2)
    _, table = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/tab", f"{tmp_path}/ck",
        n_buckets=4, enrich=True, merge_on_read=True, max_files_per_trigger=1,
    )
    assert table.merge_on_read  # flag actually reached the sink
    got = table.read()
    assert {"n_tokens", "quality_score", "fingerprint"} <= set(got.columns)
    want = enrich_turns(latest_image(ch)).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_maybe_compact_policy(spark, tmp_path):
    """Auto-fold only past the run threshold; tombstones above the
    (defaulted) horizon survive compaction."""
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=1, merge_on_read=True)
    for e in range(4):
        table.merge_batch(_batch(spark, [
            (e + 1, "insert", f"k{e}", 0, "u", f"v{e}", "", "2025-01-01 00:00:00"),
        ]), e)
    table.merge_batch(_batch(spark, [
        (10, "delete", "k0", 0, None, None, None, "2025-01-01 01:00:00"),
    ]), 4)
    assert table.max_runs_per_bucket() == 5
    assert table.maybe_compact(max_runs=8) is None  # under threshold
    before = sorted(map(tuple, table.read().collect()))
    out = table.maybe_compact(max_runs=2)
    assert out is not None and table.max_runs_per_bucket() == 1
    assert sorted(map(tuple, table.read().collect())) == before
    # default horizon (no drop floor) == 0: the tombstone (seq 10) survives
    raw_ops = [r["op"] for r in table._read_raw().collect()]
    assert raw_ops.count("delete") == 1
