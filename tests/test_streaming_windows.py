"""Window rollups running in true streaming mode vs the batch oracle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcripts
from aktuell_spark.operators.windows import session_counts, tumbling_counts


def test_tumbling_streaming_complete_equals_batch(spark, tmp_path):
    turns = gen_transcripts(spark, n_convs=12, avg_turns=8, hot_turns=30, seed=31)
    feed = str(tmp_path / "feed")
    turns.write.parquet(feed)

    batch = {
        (r["conv_id"], r["window_start"]): r["n"]
        for r in tumbling_counts(turns, "ts", "5 minutes", keys=["conv_id"]).collect()
    }

    stream = spark.readStream.schema(turns.schema).parquet(feed)
    rollup = tumbling_counts(stream, "ts", "5 minutes", keys=["conv_id"])
    q = (
        rollup.writeStream.format("memory")
        .queryName("tumbling_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["window_start"]): r["n"]
        for r in spark.sql("select * from tumbling_rollup").collect()
    }
    assert got == batch and len(got) > 0


def test_session_streaming_append_with_watermark(spark, tmp_path):
    """Session windows in append mode emit once the watermark passes the
    session close; a far-future mover closes everything."""
    turns = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=20, seed=37)
    feed, outdir, ck = (str(tmp_path / "f"), str(tmp_path / "o"), str(tmp_path / "c"))
    turns.write.parquet(feed, mode="append")

    batch = {
        (r["conv_id"], r["session_start"], r["last_ts"]): r["n"]
        for r in session_counts(turns, "ts", "30 minutes", keys=["conv_id"]).collect()
    }

    def run():
        s = spark.readStream.schema(turns.schema).parquet(feed)
        rollup = session_counts(
            s.withWatermark("ts", "10 seconds"), "ts", "30 minutes", keys=["conv_id"]
        )
        q = (
            rollup.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    mover = spark.createDataFrame(
        [("zzz", 0, "user", "tick", "", dt.datetime(2026, 6, 1))], turns.schema
    )
    mover.write.parquet(feed, mode="append")
    run()

    got = {
        (r["conv_id"], r["session_start"], r["last_ts"]): r["n"]
        for r in spark.read.parquet(outdir).collect()
        if r["conv_id"] != "zzz"
    }
    assert got == batch and len(got) > 0


def test_lineage_columns(spark, tmp_path):
    from aktuell_spark.streaming.metrics import with_lineage

    turns = gen_transcripts(spark, n_convs=3, avg_turns=4, hot_turns=6, seed=2)
    p = str(tmp_path / "t")
    turns.write.parquet(p)
    df = with_lineage(spark.read.parquet(p), batch_id=7)
    row = df.first()
    assert row["_batch_id"] == 7
    assert row["_partition_id"] >= 0
    assert p.split("/")[-1] in row["_source_file"]


def test_progress_recorder(spark, tmp_path):
    from aktuell_spark.streaming.metrics import ProgressRecorder

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        turns = gen_transcripts(spark, n_convs=5, avg_turns=4, hot_turns=8, seed=3)
        feed = str(tmp_path / "feed")
        turns.write.parquet(feed)
        s = spark.readStream.schema(turns.schema).parquet(feed)
        q = (
            s.groupBy("conv_id").count()
            .writeStream.format("memory").queryName("pr_test")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        import time

        for _ in range(20):  # listener bus is async
            if rec.summary().get("batches"):
                break
            time.sleep(0.5)
        s = rec.summary()
        assert s["batches"] >= 1 and s["total_rows"] == turns.count()
        assert s["p95_batch_sec"] is not None
    finally:
        spark.streams.removeListener(rec)
