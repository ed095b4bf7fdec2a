"""CDC batch semantics vs the golden replay oracle.

Analogue of the reference's TestSubscriptionAndChangeDetection
(/root/reference/tests/integration_test.go:237-308) and the client-merge
semantics tests, minus the transport.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
from aktuell_spark.operators.cdc import (
    apply_batch_to_state,
    collapse_last_writer_wins,
    dedupe_events,
    latest_image,
)
from tests.conftest import assert_df_equal, assert_same_rows, golden_replay


def _fixture(spark, n_convs=30, seed=42):
    t = gen_transcripts(spark, n_convs=n_convs, avg_turns=8, hot_turns=60, seed=seed)
    # localCheckpoint: cut the window-over-global-order lineage so branchy
    # tests (self-joins, exceptAll) replan against a materialized scan
    return t, gen_transcript_changes(t, seed=seed).localCheckpoint()


def _comparable(df):
    """Map columns are not set-op comparable; serialize them."""
    for c in ("updated_fields", "extra"):
        if c in df.columns:
            df = df.withColumn(c, F.to_json(c))
    return df


def test_generator_deterministic(spark):
    t1, c1 = _fixture(spark)
    t2, c2 = _fixture(spark)
    c1, c2 = _comparable(c1), _comparable(c2)
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0


def test_generator_has_duplicates_and_chains(spark):
    _, ch = _fixture(spark)
    total = ch.count()
    distinct_seq = ch.select("seq").distinct().count()
    assert total > distinct_seq, "fixture must contain redelivered (dup-seq) events"
    chains = (
        ch.groupBy("conv_id", "turn_idx").count().filter(F.col("count") >= 3).count()
    )
    assert chains > 0, "fixture must contain insert→update→delete chains"


def test_dedupe_events(spark):
    _, ch = _fixture(spark)
    deduped = dedupe_events(ch)
    assert deduped.count() == ch.select("seq").distinct().count()


def test_collapse_last_writer_wins(spark):
    _, ch = _fixture(spark)
    collapsed = collapse_last_writer_wins(dedupe_events(ch))
    assert collapsed.groupBy("conv_id", "turn_idx").count().agg(
        F.max("count")
    ).collect()[0][0] == 1
    # the surviving row per key must carry that key's max seq
    mx = dedupe_events(ch).groupBy("conv_id", "turn_idx").agg(F.max("seq").alias("seq"))
    got = {tuple(r) for r in collapsed.select("conv_id", "turn_idx", "seq").collect()}
    exp = {tuple(r) for r in mx.collect()}
    assert got == exp


def test_latest_image_matches_golden_replay(spark):
    _, ch = _fixture(spark)
    golden = golden_replay([r.asDict() for r in ch.collect()])
    assert_same_rows(latest_image(ch), golden)


def test_apply_batch_incremental_equals_full_replay(spark):
    """Splitting the stream into arbitrary batches must converge to the
    same state as a single replay (micro-batch-boundary independence)."""
    _, ch = _fixture(spark, n_convs=20)
    full = latest_image(ch)
    n = ch.agg(F.max("seq")).collect()[0][0]
    cut1, cut2 = n // 3, 2 * n // 3
    b1 = ch.filter(F.col("seq") <= cut1)
    b2 = ch.filter((F.col("seq") > cut1) & (F.col("seq") <= cut2))
    b3 = ch.filter(F.col("seq") > cut2)
    state = latest_image(b1)
    state = apply_batch_to_state(state, b2)
    state = apply_batch_to_state(state, b3)
    assert_df_equal(state, full)


def test_hash_seq_mode_same_final_state(spark):
    """seq_mode='hash' (bench-scale, no global sort) must materialize the
    same final payload as arrival-order seqs: LWW only needs per-key
    chain monotonicity."""
    t = gen_transcripts(spark, n_convs=20, avg_turns=8, hot_turns=40, seed=42)
    arrival = gen_transcript_changes(t, seed=42, seq_mode="arrival").localCheckpoint()
    hashed = gen_transcript_changes(t, seed=42, seq_mode="hash").localCheckpoint()
    a = {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"]) for r in latest_image(arrival).collect()}
    b = {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"]) for r in latest_image(hashed).collect()}
    assert a == b
    # uniqueness holds at fixture scale
    assert hashed.select("seq").distinct().count() == hashed.dropDuplicates(["seq"]).count()
