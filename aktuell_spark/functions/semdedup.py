"""SemDeDup semantic deduplication (Abbas et al. 2023, public method)
as a first-class library operator: cluster embeddings with spherical
k-means, then mark any vector whose cosine to a LOWER-ID member of the
same cluster reaches tau as a semantic duplicate (keep-lowest-id
policy — deterministic, engine-independent).

Scale shape (the point at 100 TB):

- assignment is ``ivf_assign`` — a NARROW Arrow-batched matrix product
  against the broadcast centroid artifact; no shuffle, no join;
- the duplicate test joins ONLY within a cluster, against a
  deterministic per-cluster candidate cap (same guard as the ANN
  family) — never corpus-wide all-pairs;
- K scales with the corpus (``semdedup_k``: K = ceil(sqrt(N)) with a
  floor), so the expected cluster size is ~sqrt(N) and the capped
  within-cluster join stays linear in N;
- training (``train_ivf_centroids``) fits on a sample, as k-means
  always does at scale — the model is K x d floats on the driver,
  never data rows.

Reference behavior re-expressed: the reference ships no embedding
pipeline; this implements the round brief's training-data-curation
surface with the repo's shared ANN machinery
(functions/similarity.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aktuell_spark.functions.similarity import (
    cosine6,
    ivf_assign,
    train_ivf_centroids,
)


def semdedup_k(n: int, k_min: int = 8) -> int:
    """Cluster count for a corpus of ``n`` vectors: ceil(sqrt(n)) with
    a floor. Keeps E[cluster size] ~ sqrt(n), so the capped
    within-cluster pair test is O(n * cap) total — the knob the
    SemDeDup paper scales with corpus size (they use 110k clusters for
    LAION-440M; sqrt gives the same order)."""
    return max(k_min, math.isqrt(max(int(n), 1) - 1) + 1)


def semdedup(
    emb: DataFrame,
    centroids,
    tau: float = 0.35,
    cap: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mark semantic duplicates against an explicit centroid model.

    ``centroids``: list of (cell_id, vector) — the broadcast artifact
    ``train_ivf_centroids`` returns (or any externally trained model).
    Returns (id_col, cluster, is_dup): every input vector, its cluster,
    and whether a lower-id cluster member within cosine >= tau exists.
    Cosines round to 6 decimals before the threshold test (cross-engine
    reproducible, same as the ANN family).
    """
    assigned = ivf_assign(
        emb.select(id_col, vec_col), centroids, vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col("cell").alias("cluster"),
    )
    wc = Window.partitionBy("cluster").orderBy(F.col("vec_id").asc())
    cand = (
        assigned.withColumn("rib", F.row_number().over(wc))
        .filter(F.col("rib") <= cap)
        .select(
            F.col("cluster").alias("c2"),
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("cand_vec"),
        )
    )
    dup = (
        assigned.join(
            cand,
            (F.col("cluster") == F.col("c2"))
            & (F.col("cand_id") < F.col("vec_id")),
        )
        .filter(cosine6(F.col("embedding"), F.col("cand_vec")) >= tau)
        .select("vec_id")
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        assigned.join(dup, "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            "cluster",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def semdedup_trained(
    emb: DataFrame,
    k: int | None = None,
    tau: float = 0.35,
    cap: int = 256,
    train_sample: int | None = None,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with IN-ENGINE TRAINED centroids: spherical k-means via
    ``train_ivf_centroids`` (cross-engine-reproducible config: first-k
    init, 6-decimal centroid quantization), K defaulting to the
    corpus-scaled ``semdedup_k``. ``train_sample``: fit on vectors with
    id < train_sample only (k-means always fits on a sample at scale);
    the dedup pass covers the full corpus either way."""
    if k is None:
        k = semdedup_k(emb.count())
    train = emb.select(id_col, vec_col)
    if train_sample is not None:
        train = train.filter(F.col(id_col) < train_sample)
    cents = train_ivf_centroids(
        train, k=k, n_iter=n_iter, init="first", quantize=6,
        id_col=id_col, vec_col=vec_col,
    )
    return semdedup(emb, cents, tau=tau, cap=cap, id_col=id_col, vec_col=vec_col)
