"""Native stream-stream event-time join: the streaming result must
equal the identical join run in batch (inner join is deterministic
under bounded replay — matches emit as they arrive; the watermark only
bounds state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_tool_events, gen_transcripts
from aktuell_spark.streaming.native_join import join_turns_tools_native


def _fixture(spark, tmp_path):
    t = gen_transcripts(spark, n_convs=15, avg_turns=6, hot_turns=20, seed=13)
    te = gen_tool_events(t, seed=13)
    tdir, edir = str(tmp_path / "turns"), str(tmp_path / "tools")
    t.write.parquet(tdir)
    te.write.parquet(edir)
    return t, te, tdir, edir


def _rows(df):
    return {
        (r["conv_id"], r["turn_idx"], r["call_id"], r["status"], r["gap_seconds"])
        for r in df.collect()
    }


def test_stream_stream_join_equals_batch(spark, tmp_path):
    t, te, tdir, edir = _fixture(spark, tmp_path)
    batch = join_turns_tools_native(t, te)
    want = _rows(batch)
    assert want, "fixture must produce matches"

    st = spark.readStream.schema(t.schema).parquet(tdir)
    se = spark.readStream.schema(te.schema).parquet(edir)
    out = str(tmp_path / "out")
    q = (
        join_turns_tools_native(st, se)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.read.parquet(out))
    assert got == want


def test_native_join_state_is_bounded(spark, tmp_path):
    """The streaming plan must carry watermarks on both sides — without
    them the state store grows without bound (Spark would reject or
    buffer forever)."""
    t, te, tdir, edir = _fixture(spark, tmp_path)
    st = spark.readStream.schema(t.schema).parquet(tdir)
    se = spark.readStream.schema(te.schema).parquet(edir)
    j = join_turns_tools_native(st, se)
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("watermark") >= 2 or plan.count("EventTimeWatermark") >= 2


def test_native_join_respects_gap_bound(spark):
    DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    turns = spark.createDataFrame(
        [("c", 0, "assistant", "x", "search", "2025-01-01 00:00:00")], DDL
    ).withColumn("ts", F.to_timestamp("ts"))
    tools = spark.createDataFrame(
        [
            ("c", 0, "search", "call-in", "ok", "2025-01-01 00:01:59"),
            ("c", 0, "search", "call-out", "ok", "2025-01-01 00:02:01"),
        ],
        "conv_id string, turn_idx int, tool string, call_id string, status string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["call_id"] for r in join_turns_tools_native(turns, tools, 120).collect()}
    assert got == {"call-in"}
