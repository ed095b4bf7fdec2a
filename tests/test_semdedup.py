"""SemDeDup library operator (functions/semdedup.py): corpus-scaled K,
deterministic assignment, duplicate marking; BM25 terms-DataFrame
retrieval (functions/retrieval.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.retrieval import bm25_topk
from aktuell_spark.functions.semdedup import semdedup, semdedup_k, semdedup_trained


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .localCheckpoint()
    )


def test_semdedup_k_scales_with_corpus():
    assert semdedup_k(0) == 8 and semdedup_k(10) == 8  # floor
    for n in (100, 400, 500, 10_000, 1_000_000):
        assert semdedup_k(n) == math.ceil(math.sqrt(n))
    # monotone: bigger corpus never gets fewer clusters
    ks = [semdedup_k(n) for n in range(1, 5000, 37)]
    assert ks == sorted(ks)


def test_semdedup_trained_is_deterministic_across_partitionings(spark, emb):
    a = sorted(map(tuple, semdedup_trained(emb, train_sample=2000).collect()))
    b = sorted(
        map(
            tuple,
            semdedup_trained(emb.repartition(7), train_sample=2000).collect(),
        )
    )
    assert a == b
    assert len(a) == emb.count()  # every vector assigned exactly once


def test_semdedup_marks_exact_duplicate(spark, emb):
    # clone vector 3 under a HIGHER id: cosine 1.0 → same cluster, dup
    clone = emb.filter(F.col("vec_id") == 3).select(
        F.lit(900_000).cast("long").alias("vec_id"), "embedding"
    )
    out = semdedup_trained(emb.unionByName(clone), k=8, train_sample=2000)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[900_000]["is_dup"] is True
    assert rows[900_000]["cluster"] == rows[3]["cluster"]
    # keep-lowest-id: the original is not marked by its own clone alone
    base = {r["vec_id"]: r for r in semdedup_trained(emb, k=8, train_sample=2000).collect()}
    assert rows[3]["is_dup"] == base[3]["is_dup"]


def test_semdedup_explicit_centroids_respects_cap(spark, emb):
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    # cap=1: only the single lowest-id member of each cluster can ever
    # be a candidate, so dups are exactly vectors within tau of it
    out = semdedup(emb, cents, tau=0.99, cap=1)
    assert out.filter(F.col("is_dup")).count() <= emb.count()
    assert set(out.columns) == {"vec_id", "cluster", "is_dup"}


def test_bm25_topk_ranking_and_term_join(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark merge"),
            (2, "spark merge"),
            (3, "unrelated words entirely"),
            (4, "merge"),
        ],
        "doc_id long, text string",
    )
    terms = spark.createDataFrame(
        [("spark",), ("merge",), ("spark",)], "term string"  # dup term ignored
    )
    out = bm25_topk(docs, terms, topk=10).collect()
    got = [r["doc_id"] for r in out]
    assert 3 not in got  # no query term → excluded
    assert got[0] in (1, 2)  # both match 2 terms; doc 3 never first
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    # two-term docs outrank the one-term doc
    assert got.index(4) == len(got) - 1


def test_bm25_topk_truncates_to_k(spark):
    docs = spark.createDataFrame(
        [(i, "common filler text") for i in range(20)],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, spark.createDataFrame([("common",)], "term string"), topk=5)
    rows = out.collect()
    assert len(rows) == 5
    # identical docs → identical scores → ties break by doc_id asc
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]
