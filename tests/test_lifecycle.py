"""Runtime subscription lifecycle (VERDICT r5 tasks #2/#8).

The reference's core interactive feature: subscribe/unsubscribe on a
RUNNING server (/root/reference/pkg/server/websocket.go:445-531,633-662;
client at pkg/client/client.go:194-199; the integration suite asserts
unsubscribe stops delivery, tests/integration_test.go:648-734).

Spark restatement: FanoutSink/EngineManager mutate their live
subscription set between epochs — an added subscriber snapshot-seeds
from a same-scope table image and then tails the feed; a removed
subscriber's table freezes while others continue; a predicate swap cuts
over at a known epoch boundary without reseeding.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.bootstrap import EngineConfig
from aktuell_spark.streaming.fanout import EngineManager, FanoutSink, Subscription
from aktuell_spark.streaming.pipeline import read_change_stream, write_change_feed


@pytest.fixture(scope="module")
def split_feed(spark, tmp_path_factory):
    """A change feed split into two generations around a seq midpoint —
    generation 2 is appended to the SAME feed dir later, modelling live
    arrivals on a running server."""
    base = tmp_path_factory.mktemp("lifecycle")
    t = gen_transcripts(spark, n_convs=24, avg_turns=8, hot_turns=30, seed=21)
    ch = gen_transcript_changes(t, seed=21).localCheckpoint()
    mid = ch.agg(F.max("seq")).collect()[0][0] // 2
    ch1 = ch.filter(F.col("seq") <= mid).localCheckpoint()
    ch2 = ch.filter(F.col("seq") > mid).localCheckpoint()
    assert ch1.count() > 0 and ch2.count() > 0
    return base, ch, ch1, ch2


def _run_bounded(spark, sink, feed, ckpt):
    """One availableNow pass of the feed through the GIVEN sink (the
    same sink object across passes = a server that kept running while
    files arrived)."""
    q = (
        read_change_stream(spark, feed)
        .writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_add_subscription_mid_feed_converges(spark, split_feed):
    base, ch, ch1, ch2 = split_feed
    feed, ckpt = f"{base}/add_feed", f"{base}/add_ck"
    write_change_feed(ch1, feed, n_files=2)
    sink = FanoutSink(spark, f"{base}/add", [Subscription("early")], n_buckets=4)
    _run_bounded(spark, sink, feed, ckpt)

    # subscribe mid-feed: snapshot-seed from the same-scope live table,
    # then tail the remaining generation on the same checkpoint
    sink.add_subscription(
        Subscription("late"),
        seed_df=sink.tables["early"].read_with_lineage(),
    )
    write_change_feed(ch2, feed, n_files=2)
    _run_bounded(spark, sink, feed, ckpt)

    early, late = _rows(sink.read("early")), _rows(sink.read("late"))
    assert late == early and len(late) > 0
    # and both equal the batch golden over the full feed
    assert early == _rows(latest_image(ch))


def test_remove_subscription_freezes_table_then_resubscribe(spark, split_feed):
    base, ch, ch1, ch2 = split_feed
    feed, ckpt = f"{base}/rm_feed", f"{base}/rm_ck"
    write_change_feed(ch1, feed, n_files=2)
    sink = FanoutSink(
        spark, f"{base}/rm",
        [Subscription("a"), Subscription("b")], n_buckets=4,
    )
    _run_bounded(spark, sink, feed, ckpt)
    frozen_rows = _rows(sink.read("b"))

    sink.remove_subscription("b")
    write_change_feed(ch2, feed, n_files=2)
    _run_bounded(spark, sink, feed, ckpt)

    # removed subscriber's table stopped changing; the other advanced
    assert _rows(sink.read("b")) == frozen_rows
    a_rows = _rows(sink.read("a"))
    assert a_rows == _rows(latest_image(ch)) and a_rows != frozen_rows

    # resubscribe (client.go:469-485): the frozen table resumes and the
    # lineage-preserving seed fills the gap — including deletes that
    # happened while unsubscribed (tombstones ride the seed)
    sink.add_subscription(
        Subscription("b"), seed_df=sink.tables["a"].read_with_lineage()
    )
    assert _rows(sink.read("b")) == a_rows

    # re-adding a live name refuses; removing an unknown name refuses
    with pytest.raises(ValueError, match="already live"):
        sink.add_subscription(Subscription("b"))
    with pytest.raises(KeyError):
        sink.remove_subscription("nope")


def test_update_predicate_epoch_cutover(spark, tmp_path):
    """Predicate swap on a live subscription: rows merged before the
    cutover epoch reflect the old predicate, rows after reflect the
    new; a replay of a committed pre-cutover epoch is a no-op."""
    ddl = (
        "seq long, op string, database string, collection string, "
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    )

    def batch(rows):
        return spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.to_timestamp("ts")
        )

    sink = FanoutSink(
        spark, str(tmp_path / "pred"),
        [Subscription("s", predicate="role = 'user'")], n_buckets=2,
    )
    e0 = batch([
        (1, "insert", "aktuell", "transcripts", "u1", 0, "user", "keep", "",
         "2025-01-01 00:00:00"),
        (2, "insert", "aktuell", "transcripts", "a1", 0, "assistant", "drop", "",
         "2025-01-01 00:00:01"),
    ])
    sink.merge_batch(e0, 0)
    assert {r["conv_id"] for r in sink.read("s").collect()} == {"u1"}

    cutover = sink.update_predicate("s", "role = 'assistant'")
    assert cutover == 1

    e1 = batch([
        (3, "insert", "aktuell", "transcripts", "u2", 0, "user", "now-drop", "",
         "2025-01-01 00:01:00"),
        (4, "insert", "aktuell", "transcripts", "a2", 0, "assistant", "now-keep", "",
         "2025-01-01 00:01:01"),
    ])
    sink.merge_batch(e1, 1)
    # epoch-0 rows keep the old-predicate selection; epoch-1 rows use
    # the new predicate
    assert {r["conv_id"] for r in sink.read("s").collect()} == {"u1", "a2"}

    # replaying the committed pre-cutover epoch is a no-op (markers)
    sink.merge_batch(e0, 0)
    assert {r["conv_id"] for r in sink.read("s").collect()} == {"u1", "a2"}
    # and the predicate history answers per-epoch
    sub = sink.subs[0]
    assert sub.predicate_at(0) == "role = 'user'"
    assert sub.predicate_at(1) == "role = 'assistant'"


def test_manager_runtime_lifecycle(spark, split_feed):
    """EngineManager end-to-end: add a subscription on a running
    manager (validated against the config), converge, then remove it
    while the sibling keeps syncing."""
    base, ch, ch1, ch2 = split_feed
    feed = f"{base}/mgr_feed"
    write_change_feed(ch1, feed, n_files=2)
    cfg = EngineConfig(databases={"aktuell": []})
    mgr = EngineManager(
        spark, feed, f"{base}/mgr", f"{base}/mgrck", cfg,
        [Subscription("main", database="aktuell")], n_buckets=4,
    )
    mgr.run()

    with pytest.raises(ValueError, match="not configured"):
        mgr.add_subscription(Subscription("bad", database="nope"))
    with pytest.raises(KeyError, match="no running pipeline"):
        mgr.add_subscription(
            Subscription("x", database="aktuell2"),
        ) if not cfg.databases.setdefault("aktuell2", []) else None

    mgr.add_subscription(
        Subscription("late", database="aktuell"),
        seed_df=mgr.sinks["aktuell"].tables["main"].read_with_lineage(),
    )
    write_change_feed(ch2, feed, n_files=2)
    mgr.run()  # resumes the same sinks (lifecycle state survives)
    assert _rows(mgr.read("aktuell", "late")) == _rows(mgr.read("aktuell", "main"))
    assert _rows(mgr.read("aktuell", "main")) == _rows(latest_image(ch))

    mgr.remove_subscription("aktuell", "late")
    assert "late" not in [s.name for s in mgr.by_db["aktuell"]]
    # frozen table still readable
    assert len(_rows(mgr.read("aktuell", "late"))) > 0
