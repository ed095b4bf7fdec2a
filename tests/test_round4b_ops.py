"""Round-4 widening part 2: Gopher repetition filters, benchmark
decontamination, int8-quantized ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import contamination_overlap
from aktuell_spark.functions.similarity import knn_bruteforce, knn_quantized, quantize_int8
from aktuell_spark.functions.textops import with_repetition_stats

SF001 = "/root/testdata/sf0.001"


# -- Gopher repetition -------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_planted_loop_flags(spark):
    df = _docs(spark, [
        # doc 0: "ab cd" repeated 10× — top 2-gram covers ALL chars
        (0, " ".join(["ab cd"] * 10)),
        # doc 1: all-distinct tokens, long enough that a single bigram
        # occurrence stays under every threshold (Gopher's fractions
        # legitimately flag very short docs)
        (1, " ".join(f"tok{i:03d}" for i in range(40))),
    ])
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert got[0]["flag_repetitive"] and got[0]["top2gram_frac"] == 1.0
    # 5-gram "ab cd ab cd ab" etc. all duplicated → full coverage
    assert got[0]["dup5gram_frac"] == 1.0
    assert not got[1]["flag_repetitive"]
    assert got[1]["top3gram_frac"] < 0.5 and got[1]["dup5gram_frac"] == 0.0


def test_repetition_hand_computed(spark):
    # "aa bb aa bb cc": 2-grams = aa bb(×2), bb aa, bb cc → top2 = 2*4=8
    # of total 10 chars; 3-grams all distinct (max count 1, chars 6);
    # no 5-gram dup (only one 5-gram).
    df = _docs(spark, [(0, "aa bb aa bb cc")])
    r = with_repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 5
    assert r["top2gram_frac"] == 0.8
    assert r["top3gram_frac"] == 0.6
    assert r["dup5gram_frac"] == 0.0
    assert r["flag_repetitive"]  # 0.8 > 0.20


def test_repetition_short_docs_no_crash(spark):
    df = _docs(spark, [(0, "solo"), (1, "two words"), (2, "")])
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert got[0]["top2gram_frac"] == 0.0
    assert not got[2]["flag_repetitive"]


def test_repetition_no_shuffle_single_udf_eval(spark):
    from aktuell_spark.plans.explain import count_exchanges

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    df = with_repetition_stats(docs).select(
        "doc_id", "top2gram_frac", "top3gram_frac", "dup5gram_frac",
        "flag_repetitive",
    )
    assert count_exchanges(df) == 0, "per-doc scoring must not shuffle"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("rep_counts") <= 1, (
        "pandas UDF must be evaluated once (ArrowEvalPython dedup)"
    )


# -- decontamination ---------------------------------------------------

def test_contamination_planted_overlap(spark):
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    df = _docs(spark, [
        (0, bench_text),                       # benchmark (pred: id==0)
        (1, "prefix " + bench_text),           # shares all 8-grams
        (2, "totally unrelated words " * 5),   # no overlap
        (3, "quick brown fox jumps over the lazy dog"),  # one 8-gram
    ])
    got = {
        r["doc_id"]: r
        for r in contamination_overlap(df, F.col("doc_id") == 0, n=8).collect()
    }
    assert set(got) == {1, 3}
    # doc 1: 4 distinct 8-grams, 3 of them in the bench doc
    assert got[1]["n_overlap_grams"] == 3 and got[1]["n_grams"] == 4
    assert got[3]["n_overlap_grams"] == 1 and got[3]["n_grams"] == 1
    assert got[3]["overlap_frac"] == 1.0


def test_contamination_benchmark_rows_never_emitted(spark):
    df = _docs(spark, [(0, "a b c d e f g h i"), (17, "a b c d e f g h i")])
    got = contamination_overlap(df, F.col("doc_id") % 17 == 0, n=8).collect()
    assert [r["doc_id"] for r in got] == []  # both rows are benchmark


# -- int8-quantized ANN ------------------------------------------------

def test_quantize_int8_values(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # scale = 127/1.0; floor(x*127 + 0.5)
    assert got[0]["qvec"] == [127, -63, 32, 0]
    assert got[0]["qnorm"] == 127 * 127 + 63 * 63 + 32 * 32
    assert got[1]["qvec"] == [0, 0, 0, 0] and got[1]["qnorm"] == 0


def test_quantized_knn_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    qids = list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, qids, k=5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_quantized(emb, qids, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"int8 quantization recall {recall} too low"


def test_quantized_knn_broadcasts_queries(spark):
    from aktuell_spark.plans.explain import join_strategies

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    df = knn_quantized(emb, list(range(5)), k=3)
    assert "BroadcastNestedLoopJoin" in join_strategies(df) or (
        "BroadcastHashJoin" in join_strategies(df)
    )
    assert "CartesianProduct" not in join_strategies(df)


# -- connected components / dedup clusters -----------------------------

def test_connected_components_chain_and_island(spark):
    from aktuell_spark.operators.components import connected_components

    # path 1-2-3-4-5 (diameter 4 — needs >1 propagation round) + island 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "doc_a long, doc_b long",
    )
    got = {r["vertex"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_sizes_and_canonicals(spark):
    from aktuell_spark.operators.components import dedup_clusters

    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert {d: r["cluster_id"] for d, r in got.items()} == {
        3: 3, 7: 3, 9: 3, 20: 20, 21: 20,
    }
    assert got[7]["cluster_size"] == 3 and got[20]["cluster_size"] == 2


# -- stratified sampling / packing / tf-idf ----------------------------

def test_stratified_sample_rates_and_determinism(spark):
    from aktuell_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rates = {"en": 0.2, "zh": 1.0}
    s = stratified_sample(docs, "doc_id", "lang", rates, default_rate=0.5)
    got = s.groupBy("lang").count().collect()
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in got:
        rate = rates.get(r["lang"], 0.5)
        assert r["count"] <= base[r["lang"]]
        if rate == 1.0:
            assert r["count"] == base[r["lang"]]  # zh kept whole
    # determinism across partitionings: same surviving ids
    ids1 = {r["doc_id"] for r in s.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), "doc_id", "lang", rates, default_rate=0.5
        ).collect()
    }
    assert ids1 == ids2


def test_stratified_sample_rejects_bad_rate(spark):
    from aktuell_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "lang", {"en": 1.5})


def test_pack_sequences_chunking(spark):
    from aktuell_spark.functions.packing import pack_sequences

    # one shard (ids all % 64 distinct but use n_shards=1): docs of
    # 3,4,5 tokens, target 6 → offsets 0,3,7 → packs 0,0,1
    df = _docs(spark, [(0, "a b c"), (1, "d e f g"), (2, "h i j k l")])
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, target_tokens=6, n_shards=1).collect()
    }
    assert [got[i]["start_offset"] for i in range(3)] == [0, 3, 7]
    assert [got[i]["pack_id"] for i in range(3)] == [0, 0, 1]
    assert got[2]["n_tokens"] == 5


def test_pack_stats_fill(spark):
    from aktuell_spark.functions.packing import pack_sequences, pack_stats

    df = _docs(spark, [(0, "a b c"), (1, "d e f g"), (2, "h i j k l")])
    packed = pack_sequences(df, target_tokens=6, n_shards=1)
    stats = {r["pack_id"]: r for r in pack_stats(packed, 6).collect()}
    assert stats[0]["n_docs"] == 2 and stats[0]["pack_tokens"] == 7
    assert stats[1]["n_docs"] == 1 and stats[1]["fill_ratio"] == 0.8333


def test_pack_sequences_single_shuffle(spark):
    from aktuell_spark.functions.packing import pack_sequences
    from aktuell_spark.plans.explain import count_exchanges

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    df = pack_sequences(docs, target_tokens=512)
    assert count_exchanges(df) == 1, "packing must shuffle once (shard key)"


def test_tfidf_top_terms_ranking(spark):
    from aktuell_spark.functions.tfidf import tfidf_top_terms

    df = _docs(spark, [
        (0, "apple apple apple common"),
        (1, "banana common common"),
        (2, "common cherry"),
    ])
    got = tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r for r in got}
    # rare term with high tf wins over the everywhere-term
    assert top[0]["term"] == "apple" and top[0]["tf"] == 3
    assert top[1]["term"] == "banana"
    assert top[2]["term"] == "cherry"
    assert top[0]["score"] == round(3 * 3 / 1, 4)


def test_tfidf_max_df_guard(spark):
    from aktuell_spark.functions.tfidf import tfidf_top_terms

    df = _docs(spark, [
        (0, "apple common"), (1, "banana common"), (2, "cherry common"),
    ])
    got = tfidf_top_terms(df, k=3, max_df=2).collect()
    assert all(r["term"] != "common" for r in got)


# -- interval (range) join ---------------------------------------------

def test_interval_join_semantics(spark):
    from aktuell_spark.operators.interval import interval_join

    DDL = "event_id long, user_id long, ts string"
    left = spark.createDataFrame([
        (1, 7, "2025-01-01 00:00:00"),
        (2, 7, "2025-01-01 02:00:00"),
        (3, 8, "2025-01-01 00:00:00"),
    ], DDL).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([
        (10, 7, "2025-01-01 00:00:30"),   # 30s after 1 — in [0, 60]
        (11, 7, "2025-01-01 00:01:00"),   # exactly 60s — inclusive bound
        (12, 7, "2025-01-01 00:01:01"),   # 61s — out
        (13, 7, "2025-01-01 02:00:05"),   # 5s after 2 — in
        (14, 9, "2025-01-01 00:00:10"),   # other user — out
        (15, 8, "2024-12-31 23:59:30"),   # BEFORE left 3 — out
    ], DDL).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["l_event_id"], r["r_event_id"], r["gap_seconds"])
           for r in interval_join(left, right, 0, 60).collect()}
    assert got == {(1, 10, 30), (1, 11, 60), (2, 13, 5)}


def test_interval_join_negative_window(spark):
    from aktuell_spark.operators.interval import interval_join

    DDL = "event_id long, user_id long, ts string"
    left = spark.createDataFrame(
        [(1, 7, "2025-01-01 00:01:00")], DDL
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([
        (10, 7, "2025-01-01 00:00:30"),  # 30s BEFORE left — in [-60, 0]
        (11, 7, "2025-01-01 00:01:30"),  # after — out
    ], DDL).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["r_event_id"], r["gap_seconds"])
           for r in interval_join(left, right, -60, 0).collect()}
    assert got == {(10, -30)}


def test_interval_join_subsecond_exactness(spark):
    """Gaps compare at microsecond precision — a 60.4s gap must NOT
    match an inclusive 60s bound (seconds-truncating epochs let it)."""
    from aktuell_spark.operators.interval import interval_join

    DDL = "event_id long, user_id long, ts string"
    left = spark.createDataFrame(
        [(1, 7, "2025-01-01 00:00:00.300")], DDL
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([
        (10, 7, "2025-01-01 00:01:00.700"),  # 60.4s — out
        (11, 7, "2025-01-01 00:01:00.200"),  # 59.9s — in
    ], DDL).withColumn("ts", F.to_timestamp("ts"))
    got = {r["r_event_id"] for r in interval_join(left, right, 0, 60).collect()}
    assert got == {11}


def test_interval_join_never_nested_loop(spark):
    from aktuell_spark.plans.explain import join_strategies
    from aktuell_spark.queries import q_interval_join

    df = q_interval_join(spark, "/root/testdata/sf0.001")
    strats = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strats, strats
    assert "CartesianProduct" not in strats, strats
