"""Text analysis + dedup operators (training-data pipeline ops)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from aktuell_spark.functions.textops import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different text with other words entirely"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "a of the to and"),  # all stopwords
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark, docs):
    got = {r["doc_id"]: r for r in with_token_stats(docs).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["n_distinct_tokens"] == 8  # 'the' twice
    assert got[4]["n_tokens"] == 5


def test_quality_score_monotonicity(spark, docs):
    got = {r["doc_id"]: r for r in with_quality_score(docs).collect()}
    assert got[4]["stopword_ratio"] == 1.0
    assert 0 < got[0]["stopword_ratio"] < 0.5
    assert got[2]["distinct_ratio"] == 1.0


def test_lang_id_deterministic(spark, docs):
    a = {(r["doc_id"], r["pred_lang"]) for r in with_lang_id(docs).collect()}
    b = {(r["doc_id"], r["pred_lang"]) for r in with_lang_id(docs).collect()}
    assert a == b
    # 'the' is an en marker → doc 0 predicts en
    assert (0, "en") in a


def test_fingerprint_matches_md5(spark, docs):
    got = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(docs).collect()}
    expect = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()[:16]
    assert got[0] == expect
    assert got[0] == got[3]  # exact dup → same fingerprint
    assert got[0] != got[1]


def test_exact_dedup_groups(spark, docs):
    got = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert got[0] == 2  # docs 0 and 3
    assert got[1] == 1


def test_shingles(spark, docs):
    sh = shingles(docs.filter("doc_id = 0")).collect()
    got = {r["shingle"] for r in sh}
    assert "the quick brown" in got and "the lazy dog" in got
    assert len(got) == 7  # 9 tokens → 7 trigrams, all distinct


def test_jaccard_finds_near_dup_pair(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.4 < pairs[(0, 1)] < 1.0  # near dup
    assert (1, 3) in pairs
    assert all(a < b for (a, b) in pairs)


def test_minhash_lsh_recall_on_near_dups(spark, docs):
    exact = {(r["doc_a"], r["doc_b"]) for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh <= exact  # LSH-verified pairs are a subset of exact
    assert (0, 3) in lsh  # identical docs always collide in every band


def test_minhash_signature_identical_for_identical_docs(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[3]
    assert sigs[0] != sigs[2]
    assert len(sigs[0]) == 16


def test_simhash_near_for_near_dups(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got[0] == got[3]
    ham_near = bin(got[0] ^ got[1]).count("1")
    ham_far = bin(got[0] ^ got[2]).count("1")
    assert ham_near < ham_far


def test_knn_bruteforce_self_similarity(spark):
    from aktuell_spark.functions.similarity import knn_bruteforce

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
           knn_bruteforce(emb, [0], k=3).collect()}
    assert got[(0, 1)] == 1
    assert got[(0, 3)] == 3  # antipode last


def test_hll_distinct_within_tolerance(spark):
    """HLL sketch estimate within its configured rsd of the exact count."""
    from aktuell_spark.queries import q_distinct_count, q_hll_distinct

    sf = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r["n_users"] for r in q_distinct_count(spark, sf).collect()}
    approx = {r["event_type"]: r["approx_users"] for r in q_hll_distinct(spark, sf).collect()}
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.10, (et, approx[et], n)


def test_minhash_scaled_parameters(spark, docs):
    """The graded defaults (16 perms / 4 bands) are corpus-sized; the
    machinery must hold at production widths: 64 perms / 16 bands still
    finds the near-dup pair, and signature width follows num_perm."""
    from aktuell_spark.functions.dedupe import minhash_lsh_pairs, minhash_signatures

    sigs = {r["doc_id"]: r["sig"] for r in
            minhash_signatures(docs, num_perm=64).collect()}
    assert all(len(s) == 64 for s in sigs.values())
    assert sigs[0] == sigs[3]  # exact dups agree at any width

    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, threshold=0.2, num_perm=64, num_bands=16).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs
