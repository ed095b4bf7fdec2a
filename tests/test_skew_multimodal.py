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
