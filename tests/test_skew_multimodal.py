"""Salted aggregation correctness + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.functions.multimodal import extract_features, synthesize_media
from aktuell_spark.operators.skew import salted_agg, salted_repartition


@pytest.fixture(scope="module")
def hot(spark):
    # 3 hot convs carry most rows (generator plants them)
    t = gen_transcripts(spark, n_convs=20, avg_turns=6, hot_turns=120, seed=13)
    return t.localCheckpoint()


def test_salted_agg_equals_plain_agg(spark, hot):
    plain = {
        (r["conv_id"],): (r["n"], r["mx"], round(r["av"], 6))
        for r in hot.groupBy("conv_id")
        .agg(F.count("turn_idx").alias("n"), F.max("turn_idx").alias("mx"),
             F.avg("turn_idx").alias("av"))
        .collect()
    }
    salted = {
        (r["conv_id"],): (r["count_turn_idx"], r["max_turn_idx"], round(r["avg_turn_idx"], 6))
        for r in salted_agg(
            hot, ["conv_id"],
            {"turn_idx": "count"}, salt_buckets=8, salt_col="turn_idx",
        )
        .join(
            salted_agg(hot, ["conv_id"], {"turn_idx": "max"}, salt_buckets=8,
                       salt_col="turn_idx"),
            "conv_id",
        )
        .join(
            salted_agg(hot, ["conv_id"], {"turn_idx": "avg"}, salt_buckets=8,
                       salt_col="turn_idx"),
            "conv_id",
        )
        .collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark, hot):
    """Phase-1 output must contain multiple salt rows for the hot key —
    i.e. the hot conv's rows really were split across reducers."""
    salt = F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(8))
    n_parts = (
        hot.filter(F.col("conv_id") == "c000000")
        .select(salt.alias("s")).distinct().count()
    )
    assert n_parts == 8


def test_salted_repartition_balances(spark, hot):
    rp = salted_repartition(hot, "conv_id", salt_buckets=8, n_partitions=8)
    sizes = rp.groupBy(F.spark_partition_id().alias("p")).count().collect()
    counts = [r["count"] for r in sizes]
    total = sum(counts)
    # hot conv is ~25% of data; without salting one partition would hold
    # all of it. With salting no partition should exceed ~2x fair share.
    assert max(counts) < 2.0 * total / len(counts) + 30


def test_multimodal_feature_extraction(spark):
    media = synthesize_media(spark, n=32, seed=9)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] == 64  # 16 hex chars → 8 bytes × 8 reps
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram
    # determinism across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_multimodal_unknown_mime_raises(spark):
    from aktuell_spark.functions.multimodal import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "application/pdf")


# -- real codecs (PNG IHDR + CRC, WAV RIFF) ----------------------------

def test_png_codec_roundtrip_and_corruption():
    from aktuell_spark.functions.multimodal import decode_png_header, png_bytes

    p = png_bytes(13, 7, seed=3)
    meta = decode_png_header(p)
    assert meta == {"width": 13, "height": 7, "bit_depth": 8,
                    "color_type": 2, "channels": 3}
    # grayscale variant
    g = decode_png_header(png_bytes(5, 4, seed=1, color_type=0))
    assert (g["width"], g["channels"]) == (5, 1)
    # corruption: truncation, foreign bytes, and a flipped IHDR bit
    assert decode_png_header(p[:20]) is None
    assert decode_png_header(b"junk" * 20) is None
    flipped = bytearray(p)
    flipped[17] ^= 0x01  # width byte — CRC must catch it
    assert decode_png_header(bytes(flipped)) is None
    assert decode_png_header(None) is None


def test_wav_codec_matches_stdlib_wave_module():
    """Independent decoder proof: Python's own wave module reads our
    synthesized RIFF bytes and agrees with our header parse."""
    import io
    import wave

    from aktuell_spark.functions.multimodal import decode_wav_header, wav_bytes

    w = wav_bytes(100, 22050, 2, seed=1)
    got = decode_wav_header(w)
    wf = wave.open(io.BytesIO(w))
    assert got == {"channels": wf.getnchannels(), "sample_rate": wf.getframerate(),
                   "bit_depth": wf.getsampwidth() * 8, "n_samples": wf.getnframes()}
    assert decode_wav_header(w[:10]) is None


def test_extract_media_meta_distributed(spark):
    """The Arrow batch path over planted real blobs: every valid PNG row
    carries its true dims, every WAV its true rate, and the planted
    corrupt rows (media_id % 8 == 7) come back valid=false."""
    from aktuell_spark.functions.multimodal import (
        extract_media_meta,
        synthesize_real_media,
    )

    meta = {r["media_id"]: r for r in
            extract_media_meta(synthesize_real_media(spark, n=64, seed=9)).collect()}
    assert len(meta) == 64
    for i, r in meta.items():
        if i % 8 == 7:
            assert not r["valid"] and r["width"] is None
        elif i % 2 == 0:
            assert r["valid"] and r["mime"] == "image/png"
            assert (r["width"], r["height"]) == (4 + i % 13, 3 + i % 7)
            assert r["channels"] == 3 and r["sample_rate"] is None
        else:
            assert r["valid"] and r["mime"] == "audio/wav"
            assert r["sample_rate"] == 8000 * (1 + i % 3)
            assert r["n_samples"] == 50 + i % 40 and r["width"] is None
