"""Round-4 widening: CEP sequence detection, SCD2 history, winnowing
fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.functions.winnow import (
    WINNOW_K,
    with_winnow_fingerprints,
    winnow_overlap_pairs,
)
from aktuell_spark.operators.cep import detect_sequence
from aktuell_spark.operators.history import scd2_history

EV_DDL = "user_id long, event_id long, event_type string, ts string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


# -- CEP sequence detection --------------------------------------------

def test_cep_contiguous_match_and_non_match(spark):
    df = _ev(spark, [
        # user 1: exact contiguous funnel
        (1, 10, "view", "2025-01-01 00:00:00", 1.0),
        (1, 11, "click", "2025-01-01 00:01:00", 1.0),
        (1, 12, "purchase", "2025-01-01 00:02:00", 9.0),
        # user 2: interrupted (error between click and purchase) — no match
        (2, 20, "view", "2025-01-01 00:00:00", 1.0),
        (2, 21, "click", "2025-01-01 00:01:00", 1.0),
        (2, 22, "error", "2025-01-01 00:01:30", 0.0),
        (2, 23, "purchase", "2025-01-01 00:02:00", 9.0),
        # user 3: funnel split across the key boundary must not match
        (3, 30, "view", "2025-01-01 00:00:00", 1.0),
        (3, 31, "click", "2025-01-01 00:01:00", 1.0),
        (4, 32, "purchase", "2025-01-01 00:02:00", 9.0),
    ])
    got = detect_sequence(
        df, ["event_type = 'view'", "event_type = 'click'",
             "event_type = 'purchase'"],
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["user_id"], r["start_event_id"], r["end_event_id"],
            r["span_seconds"]) == (1, 10, 12, 120)


def test_cep_within_bound_and_overlaps(spark):
    df = _ev(spark, [
        # overlapping AA pattern: rows 1,2 and 2,3 both match
        (1, 1, "error", "2025-01-01 00:00:00", 0.0),
        (1, 2, "error", "2025-01-01 00:00:10", 0.0),
        (1, 3, "error", "2025-01-01 02:00:00", 0.0),
    ])
    hits = detect_sequence(df, ["event_type = 'error'", "event_type = 'error'"])
    assert {(r["start_event_id"], r["span_seconds"]) for r in hits.collect()} == {
        (1, 10), (2, 7190)
    }
    bounded = detect_sequence(
        df, ["event_type = 'error'", "event_type = 'error'"], within_seconds=60
    )
    assert [r["start_event_id"] for r in bounded.collect()] == [1]


def test_cep_single_step_is_a_filter(spark):
    df = _ev(spark, [(1, 1, "view", "2025-01-01 00:00:00", 1.0),
                     (1, 2, "click", "2025-01-01 00:01:00", 1.0)])
    got = detect_sequence(df, ["event_type = 'click'"]).collect()
    assert len(got) == 1 and got[0]["span_seconds"] == 0


# -- SCD2 history ------------------------------------------------------

def test_scd2_versions_intervals_and_tombstone(spark):
    ddl = ("conv_id string, turn_idx int, seq long, op string, text string")
    df = spark.createDataFrame([
        ("A", 0, 1, "insert", "v1"),
        ("A", 0, 5, "update", "v2"),
        ("A", 0, 9, "update", "v3"),
        ("B", 0, 2, "insert", "b1"),
        ("B", 0, 7, "delete", None),
    ], ddl)
    h = {(r["conv_id"], r["version"]): r for r in scd2_history(df).collect()}
    a1, a2, a3 = h[("A", 1)], h[("A", 2)], h[("A", 3)]
    assert (a1["valid_from"], a1["valid_to"], a1["is_current"]) == (1, 5, False)
    assert (a2["valid_from"], a2["valid_to"], a2["is_current"]) == (5, 9, False)
    assert (a3["valid_from"], a3["valid_to"], a3["is_current"]) == (9, None, True)
    # the delete closes B: last version exists but is not current
    b2 = h[("B", 2)]
    assert b2["op"] == "delete" and b2["valid_to"] is None and not b2["is_current"]
    # history row count == event count (nothing lost, nothing invented)
    assert len(h) == 5


def test_scd2_current_rows_equal_lww_materialization(spark):
    """is_current rows must equal the latest-image collapse the sink
    materializes — SCD2 is a superset view of the same stream."""
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.operators.cdc import latest_image

    t = gen_transcripts(spark, n_convs=10, avg_turns=6, hot_turns=12, seed=23)
    ch = gen_transcript_changes(t, seed=23).localCheckpoint()
    cur = scd2_history(ch).filter("is_current").select("conv_id", "turn_idx", "text")
    lww = latest_image(ch).select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, lww.collect()))


# -- winnowing fingerprints --------------------------------------------

def test_winnow_identical_docs_share_all_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "The quick  brown fox jumps over the lazy dog  "),  # normalizes equal
         (3, "completely different content with other words")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprints"]
           for r in with_winnow_fingerprints(df).collect()}
    assert fps[1] == fps[2] and len(fps[1]) > 0
    assert set(fps[1]) != set(fps[3])


def test_winnow_insertion_robustness(spark):
    """An edit changes only fingerprints near the edit site: a long
    shared suffix/prefix keeps shared fingerprints (the winnowing
    guarantee sampling-every-kth-hash lacks)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    edited = "INSERTED WORDS " + base
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    fps = {r["doc_id"]: set(r["fingerprints"])
           for r in with_winnow_fingerprints(df).collect()}
    shared = fps[1] & fps[2]
    assert len(shared) >= len(fps[1]) // 2, (len(shared), len(fps[1]))
    pairs = winnow_overlap_pairs(df, min_shared=2, max_df=None).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["shared_fps"] == len(shared)


def test_winnow_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"),                      # < k normalized chars: dropped
         (2, "exactly8"),                  # one k-gram -> one fingerprint
         (3, "abcdefghij")],               # < w k-grams -> global min only
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprints"]
           for r in with_winnow_fingerprints(df).collect()}
    assert 1 not in got
    assert len(got[2]) == 1
    assert len(got[3]) == 1
    assert len("exactly8") == WINNOW_K


def test_winnow_fingerprints_narrow_plan(spark):
    from aktuell_spark.plans.explain import count_exchanges

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = with_winnow_fingerprints(d.select("doc_id", "text"))
    assert count_exchanges(df) == 0, "fingerprinting must not shuffle"
