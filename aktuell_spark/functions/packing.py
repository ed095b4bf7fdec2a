"""Sequence packing: assign documents to fixed-token-budget packs — the
batch-construction step between a curated corpus and a training run
(docs are concatenated in a deterministic order and cut into
``target_tokens`` windows; a doc belongs to the pack its first token
lands in).

Semantics (chunked packing, deterministic and engine-reproducible):
within a shard, docs are ordered by id; ``pack_id`` = (cumulative token
count BEFORE the doc) // target. This is the concat-then-chunk packing
streaming loaders use — NOT first-fit bin packing, which is inherently
sequential state (a reduce over the whole shard) and whose outputs
depend on traversal order; chunked packing is a pure window expression.

Scale shape: a GLOBAL ordering would serialize the corpus through one
partition — instead docs are sharded by a deterministic key hash
(``doc_id % n_shards``; shards ≈ executor count × a few) and packed
per shard. Pack boundaries never cross shards, so each shard's window
runs partition-local after ONE shuffle on the shard key. Pack ids are
globalized as (shard, pack_in_shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_N_SHARDS = 64


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = DEFAULT_N_SHARDS,
) -> DataFrame:
    """Output: (doc_id, shard, n_tokens, start_offset, pack_id) where
    ``start_offset`` is the token offset of the doc inside its shard's
    concat stream and ``pack_id`` = start_offset // target_tokens.
    One shuffle (the shard key), then partition-local window sums.
    """
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive, got {target_tokens}")
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    d = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn(
        "pack_id", F.floor(F.col("start_offset") / target_tokens)
    )


def pack_stats(packed: DataFrame, target_tokens: int) -> DataFrame:
    """Per-pack fill audit: docs per pack and fill ratio vs target (the
    number a pipeline watches to size ``target_tokens`` — low fill means
    doc-boundary waste). Map-side combinable groupBy."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(target_tokens), 4).alias("fill_ratio"),
    )
