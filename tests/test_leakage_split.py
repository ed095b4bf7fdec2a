"""Leakage-safe train/val split (queries.q_leakage_split building
blocks): near-dup cluster members can never straddle the split.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import ngram_jaccard_pairs
from aktuell_spark.operators.components import dedup_clusters
from aktuell_spark.operators.sharding import shard_id


# Each family = [two train-hash ids, one val-hash id] under the
# md5%10<9 rule, so a doc-level split is GUARANTEED to straddle every
# family (verified by driver-side md5 below).
FAMILIES = [
    [1000, 1001, 1005], [1002, 1003, 1019], [1004, 1006, 1023],
    [1007, 1008, 1025], [1009, 1010, 1057], [1011, 1012, 1068],
    [1013, 1014, 1075], [1015, 1016, 1104], [1017, 1018, 1129],
    [1020, 1021, 1146],
]


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 distinct docs + 10 near-dup families of 3 members each whose
    # texts differ by a one-word suffix (Jaccard >> 0.2)
    rows = []
    for i in range(40):
        rows.append((i, f"unique document number {i} " + " ".join(
            f"w{i}x{j}" for j in range(12))))
    for f_, members in enumerate(FAMILIES):
        # every stem token carries the family index — no n-gram is
        # shared across families, so clusters stay family-sized
        stem = " ".join(f"fam{f_}tok{k} fam{f_}body{k} fam{f_}txt{k}"
                        for k in range(6))
        for m, doc_id in enumerate(members):
            rows.append((doc_id, stem + f" tail{m}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def split_of(df, col):
    return df.withColumn(
        "split",
        F.when(shard_id(F.col(col), 10) < 9, "train").otherwise("val"),
    )


def test_cluster_split_never_straddles(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, threshold=0.2, max_df=100)
    comp = dedup_clusters(pairs).select("doc_id", "cluster_id")
    labeled = split_of(
        corpus.join(comp, "doc_id", "left").withColumn(
            "cluster_id", F.coalesce("cluster_id", "doc_id")
        ),
        "cluster_id",
    )
    straddle = (
        labeled.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddle == 0

    # the families really did cluster (split protection is non-trivial)
    fam = labeled.filter(F.col("doc_id") >= 1000)
    sizes = {r["cluster_id"]: r["n"] for r in
             fam.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()}
    assert sizes == {min(m): 3 for m in FAMILIES}


def test_naive_split_would_leak(spark, corpus):
    """Doc-level hashing splits at least one engineered family across
    train/val — the failure mode the cluster split exists to prevent."""
    pairs = ngram_jaccard_pairs(corpus, threshold=0.2, max_df=100)
    comp = dedup_clusters(pairs).select("doc_id", "cluster_id")
    naive = split_of(corpus.join(comp, "doc_id", "inner"), "doc_id")
    leaked = (
        naive.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    # every family carries one val-hash member by construction
    assert leaked == len(FAMILIES)
