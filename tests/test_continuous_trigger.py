"""Forever-running tail (processingTime trigger): the pipeline keeps
consuming as new files land, mirroring the reference's blocking
change-stream loop (/root/reference/pkg/sync/database.go:97-121)."""

from __future__ import annotations

import time

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed


def _wait_until(pred, timeout_s=90, poll_s=0.5):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            # polling a LIVE copy-on-write table races with the epoch
            # bucket swap (the parquet stand-in has no MVCC snapshots —
            # Iceberg readers would pin one); a torn read just retries
            if pred():
                return True
        except Exception:
            pass
        time.sleep(poll_s)
    return False


def test_processing_time_tail_consumes_mid_run_appends(spark, tmp_path):
    t = gen_transcripts(spark, n_convs=16, avg_turns=6, hot_turns=20, seed=21)
    ch = gen_transcript_changes(t, seed=21).localCheckpoint()
    n = ch.count()
    wave1 = ch.filter(ch.seq <= n // 2).localCheckpoint()
    wave2 = ch.filter(ch.seq > n // 2).localCheckpoint()
    assert wave1.count() > 0 and wave2.count() > 0

    feed = f"{tmp_path}/feed"
    write_change_feed(wave1, feed, n_files=2)

    query, table = run_cdc_pipeline(
        spark, feed, f"{tmp_path}/tab", f"{tmp_path}/ck", n_buckets=4,
        trigger={"processingTime": "1 second"}, await_termination=False,
    )
    try:
        want1 = latest_image(wave1).count()
        assert _wait_until(lambda: table.read().count() == want1), (
            f"tail never materialized wave 1 ({table.read().count()} vs {want1})"
        )

        # live append while the query keeps running — the tail must pick
        # it up on a later trigger without a restart
        write_change_feed(wave2, feed, n_files=2)
        want_all = latest_image(ch).count()
        assert _wait_until(lambda: table.read().count() == want_all), (
            f"tail never caught up ({table.read().count()} vs {want_all})"
        )
    finally:
        query.stop()

    # final state identical to the batch golden over the whole feed
    got = sorted(map(tuple, table.read().collect()))
    want = sorted(map(tuple, latest_image(ch).select(*table.payload).collect()))
    assert got == want
