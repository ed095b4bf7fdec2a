"""Connected components over a pair list — the clustering step every
near-dup pipeline runs after pair generation (LSH/Jaccard emit PAIRS;
deduplication needs CLUSTERS, so transitively linked docs collapse to
one canonical id).

Algorithm: hash-min label propagation. Every vertex starts labeled with
its own id; each round takes the min of its label and its neighbors'
labels; converged when no label changes. Rounds = graph diameter, and
near-dup clusters are shallow (a cluster of variants of one document is
star-like, diameter ≤ ~3), so 3-5 rounds close real corpora. Each round
is one shuffle (groupBy vertex) — the classic MapReduce CC shape.

Scale notes:
- lineage is cut per round with ``localCheckpoint`` — without it the
  iterated plan doubles every round and the job dies on plan size long
  before data size matters (on a cluster, checkpoint to durable storage
  instead so executor loss doesn't recompute all rounds);
- convergence is probed with ``limit(1).count()`` on the changed set —
  a bounded driver action, never a full collect;
- for HIGH-diameter graphs (web graphs, social), swap the round body
  for large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond") — same per-round shuffle cost, O(log²) rounds.
  Dedup graphs don't need it; the hook is the round body, not the loop.

Reference parity: the reference engine has no graph step at all (its
dedup story stops at change-stream idempotency); this operator exists
for the training-data pipeline family the round brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Labels every vertex of the pair graph with its component's
    minimum vertex id. Output: (vertex, cluster_id).

    Deterministic: min-label is order-insensitive, so the result is
    independent of partitioning and round count past convergence.
    """
    sym = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialize the edge list ONCE — every round joins it, and an
        # expensive upstream pair job (LSH/Jaccard) would otherwise
        # re-run per round (measured 26 s → 8 s at sf0.1)
        .localCheckpoint()
    )
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    changed = 0
    for _ in range(max_rounds):
        nbr = (
            sym.join(
                labels.select(F.col("u").alias("v"), "label"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        staged = labels.join(nbr, "u", "left").select(
            "u",
            "label",
            F.least(
                F.col("label"), F.coalesce("nbr_min", "label")
            ).alias("new_label"),
        ).localCheckpoint()
        changed = (
            staged.filter(F.col("new_label") < F.col("label")).limit(1).count()
        )
        labels = staged.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    if changed != 0:
        # silent non-convergence would hand wrong cluster_ids to every
        # downstream dedup decision — refuse loudly instead. Rounds
        # needed = graph diameter; dup graphs are shallow, so hitting
        # this means the input is not a near-dup pair graph (or
        # max_rounds was set far too low for a pathological chain).
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds (labels still changing); raise max_rounds or use a "
            "large-star/small-star variant for high-diameter graphs"
        )
    return labels.select(F.col("u").alias("vertex"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Near-dup clusters from a pair list: (doc_id, cluster_id,
    cluster_size), cluster_id = min doc_id of the component (the
    canonical survivor under keep-first dedup). Docs in no pair are not
    emitted — they are their own trivial cluster."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "cluster_id").select(
        F.col("vertex").alias("doc_id"), "cluster_id", "cluster_size"
    )
