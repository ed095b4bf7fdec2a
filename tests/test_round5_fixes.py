"""Round-5 defect fixes (ADVICE.md):

1. ``changes()`` on a merge_on_read+partial_updates table returns per-key
   NET changes — delta maps merged across the range, not last-delta-wins.
2. The repetition UDF mirrors engine split semantics for empty/null text
   (DuckDB ``regexp_split_to_array`` parity).
3. ``connected_components`` raises on non-convergence instead of
   returning silently-wrong labels.
4. compact()/expire_runs() lineage records no longer inherit the previous
   merge epoch's quarantined count.
5. ``interval_join`` output contains no internal columns (gap_us leak).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

PARTIAL_DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, updated_fields map<string,string>, "
    "removed_fields array<string>, ts string"
)


def _pbatch(spark, rows):
    return spark.createDataFrame(rows, PARTIAL_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _mor_partial(spark, tmp_path, name):
    return BucketedUpsertTable(
        spark, str(tmp_path / name), n_buckets=4,
        merge_on_read=True, partial_updates=True,
    )


def test_changes_partial_merges_delta_maps(spark, tmp_path):
    """A key touched by partial updates in SEVERAL epochs of the range
    must surface ONE net delta carrying every epoch's fields — the old
    last-writer-wins collapse silently dropped epoch 1's map."""
    t = _mor_partial(spark, tmp_path, "net")
    t.merge_batch(_pbatch(spark, [
        (1, "insert", "a", 0, "u", "a0", "t0", None, None, "2025-01-01 00:00:00"),
        (2, "insert", "c", 0, "u", "c0", "t0", None, None, "2025-01-01 00:00:01"),
    ]), 0)
    t.merge_batch(_pbatch(spark, [
        (3, "update", "a", 0, None, None, None, {"role": "r1"}, None,
         "2025-01-01 00:01:00"),
    ]), 1)
    t.merge_batch(_pbatch(spark, [
        (4, "update", "a", 0, None, None, None, {"tool": "t2"}, ["text"],
         "2025-01-01 00:02:00"),
        (5, "update", "c", 0, "u", "c1", "t0", None, None,
         "2025-01-01 00:02:01"),
    ]), 2)

    ch = {r["conv_id"]: r for r in t.changes(since_epoch=0).collect()}
    # a: partial-only in (0, 2] -> merged net delta, both epochs' fields
    a = ch["a"]
    assert a["op"] == "update" and a["text"] is None
    assert a["updated_fields"] == {"role": "r1", "tool": "t2"}
    assert a["removed_fields"] == ["text"]
    assert a["seq"] == 4
    # c: full image in range -> reconstructed post-image, delta maps null
    c = ch["c"]
    assert c["text"] == "c1" and c["updated_fields"] is None

    # removal cancels an earlier set (and a later set cancels a removal)
    t.merge_batch(_pbatch(spark, [
        (6, "update", "a", 0, None, None, None, None, ["role"],
         "2025-01-01 00:03:00"),
    ]), 3)
    a2 = {r["conv_id"]: r for r in t.changes(0).collect()}["a"]
    assert a2["updated_fields"] == {"tool": "t2"}
    assert sorted(a2["removed_fields"]) == ["role", "text"]


def test_changes_partial_feeds_downstream(spark, tmp_path):
    """Tail-the-feed convergence for partial tables: a downstream
    partial sink applying changes() epoch ranges ends byte-equal to the
    upstream read — including a range that spans several delta epochs."""
    up = _mor_partial(spark, tmp_path, "up")
    up.merge_batch(_pbatch(spark, [
        (1, "insert", "a", 0, "u", "a0", "t0", None, None, "2025-01-01 00:00:00"),
        (2, "insert", "b", 0, "u", "b0", "t0", None, None, "2025-01-01 00:00:01"),
    ]), 0)
    up.merge_batch(_pbatch(spark, [
        (3, "update", "a", 0, None, None, None, {"text": "a1"}, None,
         "2025-01-01 00:01:00"),
    ]), 1)
    up.merge_batch(_pbatch(spark, [
        (4, "update", "a", 0, None, None, None, {"role": "r2"}, ["tool"],
         "2025-01-01 00:02:00"),
        (5, "delete", "b", 0, None, None, None, None, None,
         "2025-01-01 00:02:01"),
    ]), 2)

    down = _mor_partial(spark, tmp_path, "down")
    # one bootstrap epoch, then ONE range spanning both delta epochs
    down.merge_batch(up.changes(-1, 0).drop("bucket"), 0)
    down.merge_batch(up.changes(0, 2).drop("bucket"), 1)
    assert (
        sorted(map(tuple, down.read().collect()))
        == sorted(map(tuple, up.read().collect()))
    )
    a = {r["conv_id"]: r for r in down.read().collect()}["a"]
    assert (a["text"], a["role"], a["tool"]) == ("a1", "r2", None)


def test_repetition_empty_null_matches_duckdb(spark):
    """Split-semantics parity on the degenerate docs the fixtures don't
    (yet) contain: null text, empty text, whitespace-only text."""
    from aktuell_spark.functions.textops import with_repetition_stats
    from aktuell_spark.queries import _gopher_repetition_sql

    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "x y x y x y x y"),
        (4, "one two three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["top2gram_frac"], r["flag_repetitive"])
        for r in with_repetition_stats(docs).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(r[0]): (r[1], r[2], r[5])
        for r in con.execute(_gopher_repetition_sql()).fetchall()
    }
    for k in want:
        n_g, f_g, fl_g = got[k]
        n_w, f_w, fl_w = want[k]
        assert (n_g is None) == (n_w is None) and (n_g == n_w or n_w is None)
        assert f_g == pytest.approx(float(f_w))
        assert fl_g == fl_w, (k, fl_g, fl_w)


def test_components_nonconvergence_raises(spark):
    from aktuell_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=2)
    # and converges fine with enough rounds
    out = connected_components(chain, max_rounds=20)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_quarantine_count_not_attributed_to_compact(spark, tmp_path):
    t = BucketedUpsertTable(
        spark, str(tmp_path / "q"), n_buckets=2,
        merge_on_read=True, quarantine=True,
    )
    bad = spark.createDataFrame(
        [
            (1, "insert", "a", 0, "u", "a0", "t", "2025-01-01 00:00:00"),
            (2, "insert", None, 0, "u", "oops", "t", "2025-01-01 00:00:01"),
        ],
        "seq long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    t.merge_batch(bad, 0)
    t.compact(tombstone_horizon=0)
    hist = {r["epoch"]: r["quarantined_rows"] for r in t.history().collect()}
    assert hist[0] == 1
    # the compaction commit must NOT re-report epoch 0's count
    assert all(v == 0 for e, v in hist.items() if e != 0)


def test_interval_join_no_internal_columns(spark):
    from aktuell_spark.operators.interval import interval_join

    left = spark.createDataFrame(
        [("e1", "u1", "2025-01-01 00:00:00")], "event_id string, user_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("c1", "u1", "2025-01-01 01:00:00")], "event_id string, user_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = interval_join(left, right, lower=0, upper=86_400, key="user_id")
    assert "gap_us" not in out.columns
    assert not [c for c in out.columns if c.startswith("_")]
    assert out.collect()[0]["gap_seconds"] == 3600
