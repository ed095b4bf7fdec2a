"""Conversation-close CEP (inactivity timeout, SURVEY §2.5 W4 / §2.8 T6)."""

from __future__ import annotations

import datetime as dt

from aktuell_spark.fixtures import gen_transcripts
from aktuell_spark.streaming.stateful import close_conversations_stateful


def test_close_emits_after_inactivity(spark, tmp_path):
    tdir, outdir, ck = (
        str(tmp_path / "turns"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    turns = gen_transcripts(spark, n_convs=8, avg_turns=6, hot_turns=12, seed=5)
    expected = {
        (r["conv_id"], r["count"]) for r in turns.groupBy("conv_id").count().collect()
    }
    turns.write.parquet(tdir, mode="append")

    def run():
        ts = spark.readStream.schema(turns.schema).parquet(tdir)
        q = (
            close_conversations_stateful(ts, gap_s=1800)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # watermark mover: a turn one year later closes everything else
    mover = spark.createDataFrame(
        [("zzz-mover", 0, "user", "tick", "", dt.datetime(2026, 1, 1))],
        turns.schema,
    )
    mover.write.parquet(tdir, mode="append")
    run()
    run()  # extra trigger commits the fired timeouts

    got = {
        (r["conv_id"], r["n_turns"])
        for r in spark.read.parquet(outdir).collect()
        if r["conv_id"] != "zzz-mover"
    }
    assert got == expected
