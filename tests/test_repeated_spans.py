"""Exact repeated-substring spans (Lee et al. exact-substring dedup,
gram-hash-join form): known-overlap fixtures pin the span semantics
(maximal coalescing, same-doc repeats, sub-threshold misses), and the
registered query must match its DuckDB oracle bit-for-bit."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import repeated_substring_spans


def _spans(spark, rows, min_len):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        map(tuple, repeated_substring_spans(df, min_len=min_len).collect())
    )


def test_known_spans_and_maximal_coalescing(spark):
    boiler = "this exact license header is repeated verbatim!"  # 48 chars
    rows = [
        (1, f"{boiler} plus unique tail one"),
        (2, f"unique head two {boiler} and more"),
        (3, "entirely unique document with no repetition"),
    ]
    got = _spans(spark, rows, min_len=40)
    # one maximal span per carrier, covering the full shared region
    # (the shared region may extend past `boiler` by shared punctuation
    # — both docs continue with a space)
    by_doc = {r[0]: r for r in got}
    assert set(by_doc) == {1, 2}
    d1, d2 = by_doc[1], by_doc[2]
    assert d1[1] == 1  # doc 1 starts with the boilerplate
    assert d2[1] == 17  # doc 2: after "unique head two "
    assert d1[3] >= len(boiler) and d2[3] >= len(boiler)
    # spans are maximal: exactly ONE span per doc, not one per gram
    assert len(got) == 2


def test_same_doc_repetition_counts(spark):
    chunk = "a self repeated chunk of thirty+ characters!"
    rows = [(7, f"{chunk} middle filler text {chunk}")]
    got = _spans(spark, rows, min_len=40)
    assert {r[0] for r in got} == {7}
    assert len(got) == 2  # both occurrences reported


def test_below_threshold_shared_text_is_ignored(spark):
    rows = [
        (1, "short shared bit & a lot of unique text around it padded"),
        (2, "short shared bit ^ totally different continuation here!!"),
    ]
    # the shared prefix is 17 chars < min_len=40 → no spans
    assert _spans(spark, rows, min_len=40) == []


def test_matches_duckdb_oracle_on_corpus(spark):
    from aktuell_spark.queries import EXTRA_QUERIES

    fn, sql = EXTRA_QUERIES["repeated_spans"]
    got = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert got, "corpus fixture has no repeated spans; test is vacuous"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_strip_repeated_spans_cuts_exactly(spark):
    from aktuell_spark.functions.dedupe import strip_repeated_spans

    boiler = "this exact license header is repeated verbatim!"  # 48 chars
    rows = [
        (1, f"{boiler} plus unique tail one"),
        (2, f"unique head two {boiler} and more"),
        (3, "entirely unique document with no repetition"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r[0]: (r[1], r[2]) for r in strip_repeated_spans(df, min_len=40).collect()}
    assert set(got) == {1, 2, 3}
    # doc 3 untouched
    assert got[3] == (rows[2][1], 0)
    # the boilerplate is gone from both carriers; unique parts survive
    for d in (1, 2):
        assert boiler not in got[d][0]
        assert got[d][1] >= len(boiler)
    assert got[1][0].endswith("plus unique tail one")
    assert got[2][0].startswith("unique head two")
    # cut lengths reconcile: len(text) == len(clean) + removed
    for i, t in rows:
        assert len(t) == len(got[i][0]) + got[i][1]


def test_strip_repeated_matches_duckdb_oracle(spark):
    from aktuell_spark.queries import EXTRA_QUERIES

    fn, sql = EXTRA_QUERIES["strip_repeated"]
    got = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert any(r[2] > 0 for r in got), "nothing stripped; test is vacuous"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
