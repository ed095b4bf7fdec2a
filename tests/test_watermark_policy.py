"""W5: the opt-in watermarked in-stream dedupe — policy behavior.

The default pipeline (dedupe='sink') is batch-slicing-independent; the
watermark mode bounds dedupe state but inherits Spark's late-row drop
semantics. These tests pin (a) no duplicate seqs pass, (b) the sink
still converges when the watermark comfortably exceeds the feed's
disorder, and (c) a sliding-window rollup in streaming complete mode
matches batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.windows import sliding_counts
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed
from tests.conftest import assert_same_rows, golden_replay


def test_watermark_dedupe_mode_converges_with_generous_delay(spark, tmp_path):
    """With watermark >> max event-time disorder (fixture: 2h late +
    3h op-chain spread < 48h), no live row is dropped and the result
    matches the golden replay."""
    feed, table_root, ckpt = (
        str(tmp_path / "f"), str(tmp_path / "t"), str(tmp_path / "c")
    )
    t = gen_transcripts(spark, n_convs=15, avg_turns=6, hot_turns=20, seed=23)
    ch = gen_transcript_changes(t, seed=23).localCheckpoint()
    write_change_feed(ch, feed, n_files=4)
    _, table = run_cdc_pipeline(
        spark, feed, table_root, ckpt,
        dedupe="watermark", watermark="48 hours", max_files_per_trigger=2,
        n_buckets=4,
    )
    golden = golden_replay([r.asDict() for r in ch.collect()])
    assert_same_rows(table.read(), golden)


def test_sliding_window_streaming_complete_equals_batch(spark, tmp_path):
    turns = gen_transcripts(spark, n_convs=8, avg_turns=6, hot_turns=15, seed=29)
    feed = str(tmp_path / "feed")
    turns.write.parquet(feed)
    batch = {
        (r["window_start"],): r["n"]
        for r in sliding_counts(turns, "ts", "10 minutes", "2 minutes").collect()
    }
    stream = spark.readStream.schema(turns.schema).parquet(feed)
    q = (
        sliding_counts(stream, "ts", "10 minutes", "2 minutes")
        .writeStream.format("memory").queryName("sliding_rollup")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"],): r["n"]
        for r in spark.sql("select * from sliding_rollup").collect()
    }
    assert got == batch and len(got) > 0
