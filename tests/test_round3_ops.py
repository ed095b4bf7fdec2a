"""Round-3 widening: as-of join, PII scrubbing, deterministic sampling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aktuell_spark.functions.sampling import deterministic_sample, stratified_counts
from aktuell_spark.functions.textops import scrub_pii
from aktuell_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u", 1, _ts(10)), ("u", 2, _ts(20)), ("u", 3, _ts(5)), ("v", 4, _ts(50))],
        "k string, id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", "a", _ts(8)), ("u", "b", _ts(20)), ("w", "z", _ts(1))],
        "k string, tag string, ts timestamp",
    )
    rows = {r["id"]: r for r in asof_join(left, right, on=["k"]).collect()}
    assert len(rows) == 4
    assert rows[1]["tag_asof"] == "a"          # newest right <= ts(10)
    assert rows[2]["tag_asof"] == "b"          # tie at ts(20) matches
    assert rows[3]["tag_asof"] is None         # nothing at or before ts(5)
    assert rows[4]["tag_asof"] is None         # key v has no right rows
    assert rows[1]["ts_asof"] == _ts(8)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("u", 1, _ts(100))], "k string, id int, ts timestamp")
    right = spark.createDataFrame([("u", "old", _ts(10))], "k string, tag string, ts timestamp")
    got = asof_join(left, right, on=["k"], tolerance_s=30).collect()[0]
    assert got["tag_asof"] is None  # match exists but is older than 30s
    got = asof_join(left, right, on=["k"], tolerance_s=1000).collect()[0]
    assert got["tag_asof"] == "old"


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            ("reach me at bob.smith+x@corp.example.org thanks",),
            ("call +49 (30) 1234-5678 now",),
            ("server 192.168.0.12 timed out",),
            ("clean text with no identifiers",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(scrub_pii("text")).collect()]
    assert got[0] == "reach me at <EMAIL> thanks"
    assert got[1] == "call <PHONE> now"
    assert got[2] == "server <IP> timed out"
    assert got[3] == "clean text with no identifiers"


def test_deterministic_sample_is_stable_across_partitioning(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r[0] for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    b = {
        r[0]
        for r in deterministic_sample(df.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b  # membership is a pure function of the key
    assert 0.15 < len(a) / 2000 < 0.25
    # rate edges
    assert deterministic_sample(df, "doc_id", 0.0).count() == 0
    assert deterministic_sample(df, "doc_id", 1.0).count() == 2000


def test_stratified_counts_audit(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("src")
    )
    rows = {r["src"]: r for r in stratified_counts(df, "doc_id", "src", 0.5).collect()}
    assert set(rows) == {"0", "1", "2", "3"}
    for r in rows.values():
        assert r["n_total"] == 250
        assert 0.35 < r["realized_rate"] < 0.65
    full = stratified_counts(df, "doc_id", "src", 1.0).collect()
    assert all(r["n_sampled"] == r["n_total"] for r in full)
