"""Crash-safe bucket swap: a crash at ANY point of the epoch swap must
be recoverable — in particular the window where a live bucket dir has
been moved aside but its replacement not yet moved in (the round-1
protocol lost that bucket's untouched keys on replay)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _rows(e0=True):
    epoch0 = [
        (1, "insert", "a", 0, "user", "a0", "", "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "user", "b0", "", "2025-01-01 00:00:01"),
        (3, "insert", "c", 0, "user", "c0", "", "2025-01-01 00:00:02"),
        (4, "insert", "d", 0, "user", "d0", "", "2025-01-01 00:00:03"),
    ]
    epoch1 = [
        (5, "update", "a", 0, "user", "a1", "", "2025-01-01 01:00:00"),
        (6, "insert", "e", 0, "user", "e0", "", "2025-01-01 01:00:01"),
        (7, "delete", "b", 0, None, None, None, "2025-01-01 01:00:02"),
    ]
    return epoch0 if e0 else epoch1


def _final_state(spark, root):
    table = BucketedUpsertTable(spark, str(root), n_buckets=4)
    table.merge_batch(_batch(spark, _rows(True)), 0)
    table.merge_batch(_batch(spark, _rows(False)), 1)
    return sorted(map(tuple, table.read().collect()))


def test_crash_mid_swap_recovers(spark, tmp_path, monkeypatch):
    expected = _final_state(spark, tmp_path / "clean")

    root = str(tmp_path / "crash")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, _rows(True)), 0)

    # crash injection: allow the aside move, die before the new bucket
    # lands — the exact window that used to orphan the bucket
    real_replace = os.replace
    calls = {"n": 0}

    def dying_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-swap")
        real_replace(src, dst)

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(RuntimeError, match="injected"):
        table.merge_batch(_batch(spark, _rows(False)), 1)
    monkeypatch.setattr(os, "replace", real_replace)

    # disk is now mid-swap: at least one aside exists, epoch 1 uncommitted
    asides = [e for e in os.listdir(root) if e.startswith("_aside-epoch-1")]
    assert asides, "crash injection did not hit the swap window"
    assert not table.is_committed(1)

    # replay epoch 1 (Structured Streaming would retry the same batch)
    table.merge_batch(_batch(spark, _rows(False)), 1)
    assert sorted(map(tuple, table.read().collect())) == expected
    assert table.is_committed(1)
    assert not [e for e in os.listdir(root) if e.startswith(("_aside", "_tmp"))]


def test_restart_after_crash_recovers(spark, tmp_path, monkeypatch):
    """Same crash, but recovery happens in a NEW table object
    (process restart) before any merge."""
    expected = _final_state(spark, tmp_path / "clean")
    root = str(tmp_path / "crash")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, _rows(True)), 0)
    pre_epoch1 = sorted(map(tuple, table.read().collect()))

    real_replace = os.replace
    calls = {"n": 0}

    def dying_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-swap")
        real_replace(src, dst)

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(RuntimeError):
        table.merge_batch(_batch(spark, _rows(False)), 1)
    monkeypatch.setattr(os, "replace", real_replace)

    # "restart": constructor recovery restores the pre-epoch image
    table2 = BucketedUpsertTable(spark, root, n_buckets=4)
    assert sorted(map(tuple, table2.read().collect())) == pre_epoch1
    table2.merge_batch(_batch(spark, _rows(False)), 1)
    assert sorted(map(tuple, table2.read().collect())) == expected


def test_stale_aside_of_committed_epoch_is_garbage_collected(spark, tmp_path):
    """Crash between the commit marker and aside cleanup: the aside is
    stale and must NOT be restored over committed state."""
    root = str(tmp_path / "t")
    table = BucketedUpsertTable(spark, root, n_buckets=4)
    table.merge_batch(_batch(spark, _rows(True)), 0)
    table.merge_batch(_batch(spark, _rows(False)), 1)
    expected = sorted(map(tuple, table.read().collect()))

    # fabricate a leftover aside for the committed epoch 1
    stale = os.path.join(root, "_aside-epoch-1", "bucket=0")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")

    table2 = BucketedUpsertTable(spark, root, n_buckets=4)
    assert not os.path.exists(os.path.join(root, "_aside-epoch-1"))
    assert sorted(map(tuple, table2.read().collect())) == expected
