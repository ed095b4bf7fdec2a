"""Stateful CEP: turns×tools join + conversation close.

Streaming runs use file feeds with availableNow; matched output is
compared against the batch inner-join oracle (order-insensitive).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_tool_events, gen_transcripts
from aktuell_spark.streaming.stateful import (
    join_turns_tools_native,
    join_turns_tools_stateful,
)


@pytest.fixture(scope="module")
def fixture(spark):
    t = gen_transcripts(spark, n_convs=15, avg_turns=8, hot_turns=30, seed=21)
    te = gen_tool_events(t, seed=21)
    return t.localCheckpoint(), te.localCheckpoint()


def _batch_oracle(turns, tools):
    """Expected inner matches on (conv_id, turn_idx)."""
    t = turns.select("conv_id", "turn_idx", "role", "text")
    c = tools.select("conv_id", "turn_idx", "call_id", "status")
    return {
        (r["conv_id"], r["turn_idx"], r["call_id"], r["status"], r["text"])
        for r in t.join(c, ["conv_id", "turn_idx"]).collect()
    }


def test_stateful_join_batch_mode_matches(spark, fixture):
    turns, tools = fixture
    rows = join_turns_tools_stateful(turns, tools).collect()
    got_matched = {
        (r["conv_id"], r["turn_idx"], r["call_id"], r["status"], r["text"])
        for r in rows if r["call_id"] is not None
    }
    assert got_matched == _batch_oracle(turns, tools)
    assert len(got_matched) > 0
    # batch = stream-at-end: every turn appears exactly once
    assert len(rows) == turns.count()
    unmatched = [r for r in rows if r["call_id"] is None]
    assert all(r["status"] is None for r in unmatched)


def test_stateful_join_streaming_two_waves(spark, fixture, tmp_path):
    """Split both feeds across micro-batches; a turn arriving in wave 1
    must still match its tool event arriving in wave 2 (state carries
    across batches and checkpoint restarts)."""
    turns, tools = fixture
    tdir, cdir, outdir, ck = (
        str(tmp_path / "turns"), str(tmp_path / "tools"),
        str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    # interleave: turns even-half first, tools odd-half first
    turns.filter(F.col("turn_idx") % 2 == 0).write.parquet(tdir, mode="append")
    tools.filter(F.col("turn_idx") % 2 == 1).write.parquet(cdir, mode="append")

    def run():
        ts = spark.readStream.schema(turns.schema).parquet(tdir)
        cs = spark.readStream.schema(tools.schema).parquet(cdir)
        # huge flush gap: no timeout fires mid-test, so output is
        # exactly the matched pairs (flush behavior tested separately)
        j = join_turns_tools_stateful(ts, cs, flush_gap_s=10**7)
        q = (
            j.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    turns.filter(F.col("turn_idx") % 2 == 1).write.parquet(tdir, mode="append")
    tools.filter(F.col("turn_idx") % 2 == 0).write.parquet(cdir, mode="append")
    run()

    got = {
        (r["conv_id"], r["turn_idx"], r["call_id"], r["status"], r["text"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert got == _batch_oracle(turns, tools)


def test_stateful_join_timeout_flushes_unmatched(spark, tmp_path):
    """A turn with no tool event is flushed with null status once the
    watermark passes its flush horizon (CEP 'call never completed')."""
    import datetime as dt

    tdir, cdir, outdir, ck = (
        str(tmp_path / "turns"), str(tmp_path / "tools"),
        str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    t0 = dt.datetime(2025, 1, 1)
    turns_schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    tools_schema = "conv_id string, turn_idx int, tool string, call_id string, status string, ts timestamp"
    spark.createDataFrame(
        [("orphan", 0, "tool", "no call ever", "search", t0)], turns_schema
    ).write.parquet(tdir, mode="append")
    # and the mirror case: a tool call whose turn never arrives
    spark.createDataFrame(
        [("orphan_call", 3, "search", "c-77", "ok", t0)], tools_schema
    ).write.parquet(cdir, mode="append")

    def run():
        ts = spark.readStream.schema(turns_schema).parquet(tdir)
        cs = spark.readStream.schema(tools_schema).parquet(cdir)
        j = join_turns_tools_stateful(ts, cs, watermark="10 seconds", flush_gap_s=60)
        q = (
            j.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # advance watermark far past the orphan's flush horizon via another conv
    spark.createDataFrame(
        [("mover", 1, "user", "advance the clock", "", t0 + dt.timedelta(hours=2))],
        turns_schema,
    ).write.parquet(tdir, mode="append")
    run()
    run()  # one more trigger so the fired timeout's output is committed

    out = spark.read.parquet(outdir).filter("conv_id = 'orphan'").collect()
    assert len(out) == 1
    assert out[0]["call_id"] is None and out[0]["status"] is None
    assert out[0]["text"] == "no call ever"
    # the orphan CALL is flushed too, with null turn columns (a call
    # whose turn never arrived is a data-quality signal, not silence)
    oc = spark.read.parquet(outdir).filter("conv_id = 'orphan_call'").collect()
    assert len(oc) == 1
    assert oc[0]["call_id"] == "c-77" and oc[0]["status"] == "ok"
    assert oc[0]["text"] is None and oc[0]["turn_ts"] is None
    assert oc[0]["tool"] == "search"


def test_stateful_join_batch_flushes_orphan_calls(spark):
    turns_schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    tools_schema = "conv_id string, turn_idx int, tool string, call_id string, status string, ts timestamp"
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    turns = spark.createDataFrame([("c", 0, "user", "hi", "", t0)], turns_schema)
    tools = spark.createDataFrame(
        [("c", 0, "search", "c-1", "ok", t0), ("c", 9, "search", "c-2", "err", t0)],
        tools_schema,
    )
    rows = {r["turn_idx"]: r for r in join_turns_tools_stateful(turns, tools).collect()}
    assert rows[0]["call_id"] == "c-1" and rows[0]["text"] == "hi"
    assert rows[9]["call_id"] == "c-2" and rows[9]["text"] is None


def test_native_join_matches_range_filtered_oracle(spark, fixture):
    turns, tools = fixture
    got = {
        (r["conv_id"], r["turn_idx"], r["call_id"])
        for r in join_turns_tools_native(turns, tools, range_s=120).collect()
    }
    # oracle: inner join with |call_ts - turn_ts| <= 120s
    t = turns.select("conv_id", "turn_idx", F.col("ts").alias("turn_ts"))
    c = tools.select("conv_id", "turn_idx", "call_id", F.col("ts").alias("call_ts"))
    exp = {
        (r["conv_id"], r["turn_idx"], r["call_id"])
        for r in t.join(c, ["conv_id", "turn_idx"]).filter(
            F.abs(F.col("call_ts").cast("long") - F.col("turn_ts").cast("long")) <= 120
        ).collect()
    }
    assert got == exp and len(got) > 0
