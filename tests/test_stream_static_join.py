"""Stream-static dimension enrichment: the streaming counterpart of the
batch UpdateLookup join (reference hits the source DB per event,
/root/reference/pkg/models/types.go:17-18) — here a broadcast join
re-planned per micro-batch, so a dim lookup never shuffles the stream
and a missing dim row never drops a change event."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import latest_image
from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed


def _feed(spark, tmp_path, seed=31):
    t = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=30, seed=seed)
    ch = gen_transcript_changes(t, seed=seed).localCheckpoint()
    feed = str(tmp_path / "feed")
    write_change_feed(ch, feed, n_files=4)
    return ch, feed


def _dim(spark, ch, drop_one=True):
    """conv-level dim keyed on conv_id; optionally drop one conv to
    exercise the left-join missing-row path."""
    convs = [r["conv_id"] for r in ch.select("conv_id").distinct().collect()]
    convs.sort()
    rows = [
        (c, f"channel-{i % 3}", i % 5)
        for i, c in enumerate(convs if not drop_one else convs[1:])
    ]
    return spark.createDataFrame(
        rows, "conv_id string, channel string, priority int"
    ), convs[0]


def test_stream_static_enrichment_matches_batch_join(spark, tmp_path):
    ch, feed = _feed(spark, tmp_path)
    dim, missing_conv = _dim(spark, ch)

    _, table = run_cdc_pipeline(
        spark, feed, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=8, max_files_per_trigger=2, static_dim=dim,
    )
    got = table.read()
    assert "channel" in got.columns and "priority" in got.columns

    want = latest_image(ch).join(F.broadcast(dim), "conv_id", "left")
    g = {(r["conv_id"], r["turn_idx"]): (r["channel"], r["priority"], r["text"])
         for r in got.collect()}
    w = {(r["conv_id"], r["turn_idx"]): (r["channel"], r["priority"], r["text"])
         for r in want.collect()}
    assert g == w

    # the conv missing from the dim survived with null dim columns
    missing_rows = [k for k in g if k[0] == missing_conv]
    assert missing_rows and all(g[k][0] is None for k in missing_rows)


def test_stream_static_restart_noop(spark, tmp_path):
    ch, feed = _feed(spark, tmp_path, seed=37)
    dim, _ = _dim(spark, ch, drop_one=False)
    args = (spark, feed, str(tmp_path / "table"), str(tmp_path / "ckpt"))
    _, table = run_cdc_pipeline(*args, n_buckets=8, static_dim=dim)
    n1 = table.read().count()
    _, table = run_cdc_pipeline(*args, n_buckets=8, static_dim=dim)
    assert table.read().count() == n1


def test_stream_static_rejects_partial_updates(spark, tmp_path):
    dim = spark.createDataFrame([("c", "x", 1)],
                                "conv_id string, channel string, priority int")
    with pytest.raises(ValueError):
        run_cdc_pipeline(
            spark, str(tmp_path / "f"), str(tmp_path / "t"),
            str(tmp_path / "c"), static_dim=dim, partial_updates=True,
        )


def test_stream_static_combines_with_enrichment(spark, tmp_path):
    """enrich=True (text metrics) and static_dim (dim columns) stack:
    the payload carries both."""
    ch, feed = _feed(spark, tmp_path, seed=41)
    dim, _ = _dim(spark, ch, drop_one=False)
    _, table = run_cdc_pipeline(
        spark, feed, str(tmp_path / "t"), str(tmp_path / "c"),
        n_buckets=8, static_dim=dim, enrich=True,
    )
    got = table.read()
    for col in ("quality_score", "fingerprint", "channel", "priority"):
        assert col in got.columns, col
    r = got.filter(F.col("text").isNotNull()).first()
    assert r["channel"] is not None and r["quality_score"] is not None
