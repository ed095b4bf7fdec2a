"""Multi-subscription fan-out: one feed → N per-subscription tables.

Reference: hub routes one change event to every subscribed client
(/root/reference/pkg/server/websocket.go:226-293); five concurrent
clients each receive their filtered stream
(tests/integration_test.go:433-509)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.streaming.bootstrap import EngineConfig
from aktuell_spark.streaming.fanout import (
    EngineManager,
    Subscription,
    run_fanout_pipeline,
)
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed


@pytest.fixture(scope="module")
def two_collection_feed(spark, tmp_path_factory):
    """Change feed whose events split across two collections."""
    base = tmp_path_factory.mktemp("fanout")
    t = gen_transcripts(spark, n_convs=24, avg_turns=8, hot_turns=30, seed=13)
    ch = gen_transcript_changes(t, seed=13).withColumn(
        "collection",
        F.when(
            F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0, F.lit("transcripts")
        ).otherwise(F.lit("notes")),
    ).localCheckpoint()
    feed = f"{base}/feed"
    write_change_feed(ch, feed, n_files=3)
    return base, feed, ch


def test_fanout_matches_single_subscription_runs(spark, two_collection_feed):
    """Each fanned-out table is byte-identical to a dedicated
    single-subscription pipeline over the same feed."""
    base, feed, _ = two_collection_feed
    subs = [
        Subscription("s_tr", collection="transcripts"),
        Subscription("s_no", collection="notes"),
    ]
    _, sink = run_fanout_pipeline(
        spark, feed, f"{base}/fan", f"{base}/fanck", subs, n_buckets=8,
        max_files_per_trigger=1,
    )
    for name, coll in [("s_tr", "transcripts"), ("s_no", "notes")]:
        _, solo = run_cdc_pipeline(
            spark, feed, f"{base}/solo_{name}", f"{base}/solock_{name}",
            collection=coll, n_buckets=8,
        )
        fan_rows = sorted(map(tuple, sink.read(name).collect()))
        solo_rows = sorted(map(tuple, solo.read().collect()))
        assert fan_rows == solo_rows and len(fan_rows) > 0

    # the two views partition the feed's keys (collections are disjoint)
    tr = {(r["conv_id"], r["turn_idx"]) for r in sink.read("s_tr").collect()}
    no = {(r["conv_id"], r["turn_idx"]) for r in sink.read("s_no").collect()}
    assert not (tr & no)


def test_fanout_doc_level_predicate(spark, two_collection_feed):
    """Subscription.predicate = the reference's TODO'd document filter
    (pkg/client/client.go:397-398): a predicate on an always-present
    column narrows the subscription to matching events only."""
    base, feed, ch = two_collection_feed
    hot = ch.filter(F.col("conv_id") == "c000000")
    assert hot.count() > 0
    subs = [Subscription("s_hot", predicate="conv_id = 'c000000'")]
    _, sink = run_fanout_pipeline(
        spark, feed, f"{base}/pred", f"{base}/predck", subs, n_buckets=4,
    )
    got_keys = {(r["conv_id"], r["turn_idx"]) for r in sink.read("s_hot").collect()}
    assert got_keys and all(k[0] == "c000000" for k in got_keys)
    # equals the batch golden over the same filtered events
    from aktuell_spark.operators.cdc import latest_image

    want_keys = {
        (r["conv_id"], r["turn_idx"]) for r in latest_image(hot).collect()
    }
    assert got_keys == want_keys


def test_fanout_restart_is_noop(spark, two_collection_feed):
    base, feed, _ = two_collection_feed
    subs = [Subscription("a", collection="transcripts"),
            Subscription("b", collection="notes")]
    _, sink = run_fanout_pipeline(
        spark, feed, f"{base}/re", f"{base}/reck", subs, n_buckets=4,
    )
    before = {n: sorted(map(tuple, sink.read(n).collect())) for n in ("a", "b")}
    _, sink2 = run_fanout_pipeline(
        spark, feed, f"{base}/re", f"{base}/reck", subs, n_buckets=4,
    )
    after = {n: sorted(map(tuple, sink2.read(n).collect())) for n in ("a", "b")}
    assert after == before


def test_fanout_validates_subscriptions(spark, two_collection_feed):
    base, feed, _ = two_collection_feed
    cfg = EngineConfig(databases={"aktuell": ["transcripts"]})
    with pytest.raises(ValueError, match="invalid subscription"):
        run_fanout_pipeline(
            spark, feed, f"{base}/v", f"{base}/vck",
            [Subscription("bad", database="aktuell", collection="secrets")],
            config=cfg,
        )
    with pytest.raises(ValueError, match="duplicate"):
        run_fanout_pipeline(
            spark, feed, f"{base}/v2", f"{base}/v2ck",
            [Subscription("x"), Subscription("x")],
        )


def test_fanout_per_subscription_stats(spark, two_collection_feed):
    """A3 fan-in: per-subscription lineage aggregates from committed
    epoch metrics (reference: per-DB stats map, manager.go:213-219)."""
    base, feed, _ = two_collection_feed
    subs = [Subscription("sa", collection="transcripts"),
            Subscription("sb", collection="notes")]
    _, sink = run_fanout_pipeline(
        spark, feed, f"{base}/st", f"{base}/stck", subs, n_buckets=4,
    )
    stats = sink.stats()
    assert set(stats) == {"sa", "sb"}
    for name in ("sa", "sb"):
        assert stats[name]["epochs"] >= 1
        assert stats[name]["merged_rows"] > 0
        assert 1 <= stats[name]["touched_buckets"] <= 4


def test_fanout_with_partial_updates(spark, tmp_path):
    """Fan-out composes with delta-only feeds: each subscription's table
    reconstructs post-images independently."""
    from aktuell_spark.streaming.fanout import FanoutSink

    t = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=12, seed=19)
    full = gen_transcript_changes(t, seed=19).localCheckpoint()
    part = gen_transcript_changes(t, seed=19, partial_updates=True).localCheckpoint()
    write_change_feed(part, f"{tmp_path}/feed", n_files=2)

    sink = FanoutSink(spark, f"{tmp_path}/fan", [Subscription("all")],
                      n_buckets=4, partial_updates=True)
    stream = spark.readStream.schema(part.schema).parquet(f"{tmp_path}/feed")
    q = (stream.writeStream.foreachBatch(sink.foreach_batch())
         .option("checkpointLocation", f"{tmp_path}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    from aktuell_spark.operators.cdc import latest_image

    got = sorted(map(tuple, sink.read("all").collect()))
    want = sorted(map(tuple, latest_image(full).collect()))
    assert got == want and len(got) > 0


def test_engine_manager_per_database_pipelines(spark, tmp_path):
    """SyncManager analogue: one pipeline per configured database; each
    database's subscriptions see exactly their slice; cross-DB stats
    fan-in works; invalid/unrouted subscriptions rejected."""
    from aktuell_spark.streaming.fanout import EngineManager

    t = gen_transcripts(spark, n_convs=16, avg_turns=6, hot_turns=16, seed=23)
    ch = gen_transcript_changes(t, seed=23).withColumn(
        "database",
        F.when(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0, F.lit("prod"))
        .otherwise(F.lit("staging")),
    ).localCheckpoint()
    feed = f"{tmp_path}/feed"
    write_change_feed(ch, feed, n_files=2)

    cfg = EngineConfig(databases={"prod": [], "staging": []})
    mgr = EngineManager(
        spark, feed, f"{tmp_path}/eng", f"{tmp_path}/engck", cfg,
        [Subscription("p_all", database="prod"),
         Subscription("s_all", database="staging")],
        n_buckets=4,
    )
    mgr.run()

    from aktuell_spark.operators.cdc import latest_image

    for db, sub in (("prod", "p_all"), ("staging", "s_all")):
        got = sorted(map(tuple, mgr.read(db, sub).collect()))
        want = sorted(map(tuple, latest_image(
            ch.filter(F.col("database") == db)
        ).collect()))
        assert got == want and len(got) > 0, db

    stats = mgr.stats()
    assert set(stats) == {"prod", "staging"}
    assert stats["prod"]["p_all"]["merged_rows"] > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not configured"):
        EngineManager(spark, feed, f"{tmp_path}/x", f"{tmp_path}/xck", cfg,
                      [Subscription("bad", database="nope")])
    with _pytest.raises(ValueError, match="set Subscription.database"):
        EngineManager(spark, feed, f"{tmp_path}/y", f"{tmp_path}/yck", cfg,
                      [Subscription("unrouted")])


def test_fanout_merges_run_concurrently(spark, two_collection_feed):
    """N-subscription epoch wall < sum of the same merges run
    sequentially (Spark interleaves jobs submitted from driver
    threads), with results identical and per-table commit markers
    intact — the hub-style one-loop delivery, parallelized."""
    import time

    from aktuell_spark.streaming.fanout import FanoutSink

    base, feed, ch = two_collection_feed
    batch = ch.localCheckpoint()
    subs = [Subscription(f"p{i}") for i in range(6)]  # wildcard × 6

    # warm-up epoch (JIT, listing) on separate roots, then measure
    FanoutSink(spark, f"{base}/warm", subs, n_buckets=8).merge_batch(batch, 0)

    seq_sink = FanoutSink(spark, f"{base}/seq", subs, n_buckets=8)
    t0 = time.time()
    for s in subs:  # the round-2 sequential shape
        seq_sink.tables[s.name].merge_batch(s.apply(batch), 0)
    seq_wall = time.time() - t0

    par_sink = FanoutSink(spark, f"{base}/par", subs, n_buckets=8)
    t0 = time.time()
    par_sink.merge_batch(batch, 0)
    par_wall = time.time() - t0

    assert par_wall < seq_wall, f"parallel {par_wall:.2f}s !< sequential {seq_wall:.2f}s"
    for s in subs:
        assert par_sink.tables[s.name].is_committed(0)
        a = sorted(map(tuple, par_sink.read(s.name).collect()))
        b = sorted(map(tuple, seq_sink.read(s.name).collect()))
        assert a == b and len(a) > 0


def test_engine_manager_processing_time_tail(spark, tmp_path):
    """EngineManager as a forever-running tail (the reference's
    operating mode): processingTime trigger, mid-run feed append is
    picked up without a restart, per-DB queries stopped by the caller."""
    import time

    ddl = (
        "seq long, op string, database string, collection string, "
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    )

    def mk(rows):
        return (
            spark.createDataFrame(rows, ddl)
            .withColumn("ts", F.to_timestamp("ts"))
            .withColumn("updated_fields", F.lit(None).cast("map<string,string>"))
            .withColumn("removed_fields", F.lit(None).cast("array<string>"))
        )

    feed = str(tmp_path / "feed")
    mk([(1, "insert", "dbA", "t", "a", 0, "u", "a0", None, "2025-01-01 00:00:00")]) \
        .write.mode("append").parquet(feed)

    mgr = EngineManager(
        spark, feed, str(tmp_path / "root"), str(tmp_path / "ck"),
        config=EngineConfig(databases={"dbA": []}),
        subscriptions=[Subscription(name="s", database="dbA", collection="t")],
        n_buckets=2,
    )
    queries = mgr.run(trigger={"processingTime": "1 second"},
                      await_termination=False)
    try:
        def wait(n):
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if mgr.read("dbA", "s").count() == n:
                        return True
                except Exception:
                    pass
                time.sleep(0.5)
            return False

        assert wait(1), "tail never materialized wave 1"
        mk([(2, "insert", "dbA", "t", "b", 0, "u", "b0", None, "2025-01-01 00:00:05")]) \
            .write.mode("append").parquet(feed)
        assert wait(2), "tail never caught up with the appended wave"
    finally:
        for q in queries.values():
            q.stop()
