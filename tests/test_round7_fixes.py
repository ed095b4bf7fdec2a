"""Round-7 ADVICE fixes, each with the failure mode it closes.

1. fanout deferred drops drain on close(): a drop deferred by an
   in-flight epoch must not leak on disk when the stream stops before
   another epoch completes.
2. connected_components self-loop parity is pinned in
   tests/test_components_star.py; salted-export NULL segments in
   tests/test_salted_export.py; dedup-index update semantics in
   tests/test_dedup_index_stream.py.
"""

from __future__ import annotations

import os
import threading

import pytest

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.streaming.fanout import FanoutSink, Subscription


@pytest.fixture(scope="module")
def change_batch(spark):
    t = gen_transcripts(spark, n_convs=8, avg_turns=4, seed=71)
    return gen_transcript_changes(t, seed=71).localCheckpoint()


def test_deferred_drop_drains_on_close_when_stream_stops(
    spark, change_batch, tmp_path
):
    """Drop deferred mid-epoch + stream stops (no further epoch ever
    runs) → close() removes the directory instead of leaking it."""
    sink = FanoutSink(
        spark, str(tmp_path / "stop"),
        [Subscription("a"), Subscription("b")], n_buckets=4,
    )
    table_b_root = sink.tables["b"].root
    started, release = threading.Event(), threading.Event()
    orig = sink.tables["a"].merge_batch

    def blocking_merge(df, epoch_id):
        started.set()
        assert release.wait(timeout=60)
        return orig(df, epoch_id)

    sink.tables["a"].merge_batch = blocking_merge
    th = threading.Thread(target=lambda: sink.merge_batch(change_batch, 0))
    th.start()
    assert started.wait(timeout=60)
    sink.remove_subscription("b", drop_table=True)
    assert os.path.isdir(table_b_root)  # deferred: epoch in flight
    # while the epoch is still merging, close() must NOT rip the dir out
    # from under it
    assert sink.drain_deferred_drops() == []
    assert os.path.isdir(table_b_root)
    release.set()
    th.join(timeout=120)
    assert not th.is_alive()
    # the epoch-end drain already ran; close() is an idempotent no-op
    assert not os.path.isdir(table_b_root)
    sink.close()

    # now the pure stopped-stream shape: defer with refs held manually,
    # release WITHOUT another merge_batch, and let close() drain
    sink2 = FanoutSink(
        spark, str(tmp_path / "stop2"),
        [Subscription("a"), Subscription("b")], n_buckets=4,
    )
    root2 = sink2.tables["b"].root
    with sink2._lifecycle_lock:
        sink2._epoch_refs += 1  # simulate a crash mid-epoch
    sink2.remove_subscription("b", drop_table=True)
    assert os.path.isdir(root2)
    with sink2._lifecycle_lock:
        sink2._epoch_refs -= 1  # stream died; no epoch-end drain ran
    assert os.path.isdir(root2)
    assert sink2.drain_deferred_drops() == [root2]
    assert not os.path.isdir(root2)
    sink2.close()  # idempotent
