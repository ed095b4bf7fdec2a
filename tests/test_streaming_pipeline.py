"""End-to-end streaming CDC: feed → watermark dedupe → exactly-once MERGE.

Analogues of the reference integration suite
(/root/reference/tests/integration_test.go): snapshot+changes equality
(:311-394), load-test completeness (:512-646 — all events land), and the
reconnect/resume tests (pkg/client/client.go:431-485) upgraded to
checkpoint restart with zero loss and byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from tests.conftest import assert_same_rows, golden_replay


def _dirs(tmp_path):
    return (
        str(tmp_path / "feed"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
    )


def test_pipeline_end_to_end(spark, tmp_path):
    feed, table_root, ckpt = _dirs(tmp_path)
    t = gen_transcripts(spark, n_convs=25, avg_turns=8, hot_turns=60, seed=7)
    ch = gen_transcript_changes(t, seed=7).localCheckpoint()
    write_change_feed(ch, feed, n_files=6)

    _, table = run_cdc_pipeline(
        spark, feed, table_root, ckpt, n_buckets=8, max_files_per_trigger=2
    )
    golden = golden_replay([r.asDict() for r in ch.collect()])
    assert_same_rows(table.read(), golden)


def test_pipeline_restart_from_checkpoint_byte_identical(spark, tmp_path):
    """Two waves with a stop between: restart must pick up only new files
    and converge to the full replay, with per-turn text byte-identical."""
    feed, table_root, ckpt = _dirs(tmp_path)
    t = gen_transcripts(spark, n_convs=25, avg_turns=8, hot_turns=60, seed=11)
    ch = gen_transcript_changes(t, seed=11).localCheckpoint()
    n = ch.agg(F.max("seq")).collect()[0][0]
    wave1 = ch.filter(F.col("seq") <= n // 2)
    wave2 = ch.filter(F.col("seq") > n // 2)

    write_change_feed(wave1, feed, n_files=4)
    _, table = run_cdc_pipeline(spark, feed, table_root, ckpt, n_buckets=8)
    mid_state = {r["conv_id"] + ":" + str(r["turn_idx"]): r["text"] for r in table.read().collect()}
    golden_mid = golden_replay([r.asDict() for r in wave1.collect()])
    assert len(mid_state) == len(golden_mid)

    write_change_feed(wave2, feed, n_files=4)
    _, table = run_cdc_pipeline(spark, feed, table_root, ckpt, n_buckets=8)
    golden = golden_replay([r.asDict() for r in ch.collect()])
    assert_same_rows(table.read(), golden)

    # byte-identical vs an independent batch replay under stable ordering
    batch = latest_image(ch).orderBy("conv_id", "turn_idx").collect()
    stream_rows = table.read().orderBy("conv_id", "turn_idx").collect()
    assert [r["text"] for r in batch] == [r["text"] for r in stream_rows]


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running a committed epoch (failure-recovery replay) must not
    change state — the exactly-once guarantee of the sink."""
    feed, table_root, ckpt = _dirs(tmp_path)
    t = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=20, seed=3)
    ch = gen_transcript_changes(t, seed=3).localCheckpoint()
    write_change_feed(ch, feed, n_files=2)
    _, table = run_cdc_pipeline(spark, feed, table_root, ckpt, n_buckets=4)
    before = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}

    # replay epoch 0 verbatim (marker present → no-op)
    table.merge_batch(ch.limit(50), 0)
    after = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert before == after

    # simulate failure-before-commit: remove marker, re-merge same batch
    import os

    os.remove(os.path.join(table.commits_dir, "0"))
    from aktuell_spark.schemas import CHANGE_SCHEMA  # noqa: F401

    table.merge_batch(ch, 0)  # full batch re-applied over final state
    after2 = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert before == after2


def test_subscription_filter_wildcards(spark):
    from aktuell_spark.streaming.pipeline import subscription_filter

    t = gen_transcripts(spark, n_convs=5, avg_turns=4, hot_turns=8, seed=1)
    ch = gen_transcript_changes(t, seed=1)
    assert subscription_filter(ch, "aktuell", "transcripts").count() == ch.count()
    assert subscription_filter(ch, "", "").count() == ch.count()  # full wildcard
    assert subscription_filter(ch, "other", "").count() == 0
    assert subscription_filter(ch, "aktuell", "nope").count() == 0


def test_change_feed_append_keeps_replay_order(spark, tmp_path):
    """A second ``write_change_feed`` generation must replay AFTER the
    first: the file source orders the backlog by mtime, and a later
    append's part-00000-<uuid> sorts lexically BETWEEN the first
    generation's files — re-stamping the whole listing would let deltas
    replay before their base images, which partial-update (Mongo)
    semantics silently drop as orphans. Stamping only the newly created
    files, offset past the previous max mtime, keeps cross-generation
    arrival order a correctness contract."""
    import os

    feed, table_root, ckpt = _dirs(tmp_path)
    ddl = (
        "seq long, op string, database string, collection string, conv_id string, "
        "turn_idx int, role string, text string, tool string, "
        "updated_fields map<string,string>, removed_fields array<string>, "
        "ts string, extra map<string,string>"
    )

    def _mk(rows):
        return spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.to_timestamp("ts")
        )

    keys = [("A", 0), ("A", 1), ("B", 0), ("B", 1)]
    gen1 = _mk([
        (i + 1, "insert", "aktuell", "transcripts", c, t, "user", f"base-{c}{t}",
         None, None, None, "2025-01-01 00:00:00", None)
        for i, (c, t) in enumerate(keys)
    ])
    gen2 = _mk([
        (i + 10, "update", "aktuell", "transcripts", c, t, None, None, None,
         {"text": f"v2-{c}{t}"}, None, "2025-01-01 01:00:00", None)
        for i, (c, t) in enumerate(keys)
    ])
    write_change_feed(gen1, feed, n_files=2)
    first = {n: os.path.getmtime(os.path.join(feed, n))
             for n in os.listdir(feed) if n.endswith(".parquet")}
    write_change_feed(gen2, feed, n_files=2)
    second = {n: os.path.getmtime(os.path.join(feed, n))
              for n in os.listdir(feed) if n.endswith(".parquet")}
    # generation 1 mtimes untouched; every generation-2 file sorts after
    for n, mt in first.items():
        assert second[n] == mt
    assert min(v for n, v in second.items() if n not in first) > max(first.values())

    # one file per trigger = replay strictly in mtime order; if any delta
    # arrived before its base it would be dropped as an orphan
    _, table = run_cdc_pipeline(
        spark, feed, table_root, ckpt, n_buckets=4,
        partial_updates=True, max_files_per_trigger=1,
    )
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert got == {(c, t): f"v2-{c}{t}" for (c, t) in keys}


def test_pipeline_with_enrichment(spark, tmp_path):
    """enrich=True materializes per-turn text metrics next to the
    payload; text itself stays byte-identical to the plain path."""
    feed, table_root, ckpt = _dirs(tmp_path)
    t = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=15, seed=19)
    ch = gen_transcript_changes(t, seed=19).localCheckpoint()
    write_change_feed(ch, feed, n_files=2)
    _, table = run_cdc_pipeline(
        spark, feed, table_root, ckpt, n_buckets=4, enrich=True
    )
    rows = table.read().collect()
    golden = golden_replay([r.asDict() for r in ch.collect()])
    assert {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows} == {
        k: v["text"] for k, v in golden.items()
    }
    for r in rows:
        assert r["n_tokens"] == len(r["text"].split())
        assert len(r["fingerprint"]) == 16
        assert 0.0 <= r["quality_score"] <= 1.0


def test_observe_quality_metrics_on_progress(spark, tmp_path):
    """Observation-API counters ride the progress events: per batch,
    event count / null-text rows / deletes, with no extra Spark job."""
    from aktuell_spark.streaming.metrics import ProgressRecorder

    feed, table_root, ckpt = _dirs(tmp_path)
    t = gen_transcripts(spark, n_convs=10, avg_turns=5, hot_turns=10, seed=3)
    ch = gen_transcript_changes(t, seed=3).localCheckpoint()
    write_change_feed(ch, feed, n_files=2)
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        _, table = run_cdc_pipeline(
            spark, feed, table_root, ckpt, n_buckets=4, observe=True
        )
        import time as _t
        for _ in range(40):  # listener bus is async
            with rec._lock:
                got = [p for p in rec.progress if p.get("observed")]
            if got:
                break
            _t.sleep(0.5)
        assert got, "no observed metrics arrived on progress events"
        obs = got[0]["observed"]["ingest"]
        total_events = sum(
            p["observed"]["ingest"]["n_events"] for p in got
        )
        assert total_events == ch.count()
        assert {"n_events", "n_null_text", "n_deletes", "approx_convs"} <= set(obs)
    finally:
        spark.streams.removeListener(rec)
