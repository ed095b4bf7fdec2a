"""Training-shard export: the delivery stage of a curation pipeline.

The reference streams per-conversation materializations to consumers
one document at a time (client SDK consume, ref
``pkg/client/client.go`` / ``pkg/sync/database.go`` snapshot batches);
at training scale the consumable unit is instead a SHARD — a
size-bounded, deterministically-assigned file a dataloader can claim.
This module provides that batch-side shape on Spark:

- ``shard_id(col, n_shards)`` — pure-column deterministic shard
  assignment from the first 8 hex digits of ``md5(key)``. md5 (not
  ``F.xxhash64``) on purpose: every engine agrees on md5 bytes, so the
  assignment is reproducible by DuckDB/Trino/pandas consumers and the
  driver's cross-engine oracle, while xxhash64 seeds differ across
  engines. Uniformity is the same (md5 prefix is uniform); cost is one
  hash per row, map-side, no shuffle.
- ``write_training_shards(df, path, key, n_shards)`` — ONE file per
  shard directory: ``repartition(col)`` routes each shard value to
  exactly one task, ``partitionBy("shard")`` splits directories, so a
  dataloader claims ``shard=K/part-*.parquet`` atomically. Returns a
  driver-side manifest (n_shards rows — bounded) with per-shard row
  counts the consumer can verify against.

Scale shape: assignment is a narrow map; the write is one keyed
exchange into n_shards tasks. At 100 TB you raise n_shards (shards
should be ~0.5-2 GB each), never the per-shard fan-in — the exchange
stays one shuffle whose reducer count IS the shard count.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(col, n_shards: int):
    """Deterministic shard in [0, n_shards) from md5(key) — engine-
    portable (md5 prefix parsed as hex), unlike xxhash64 whose seed
    and availability differ across engines."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_shards).cast("int")


def assign_shards(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Add a ``shard`` column; narrow (no shuffle)."""
    return df.withColumn("shard", shard_id(F.col(key), n_shards))


def write_training_shards(
    df: DataFrame, path: str, key: str, n_shards: int
) -> list[dict]:
    """Write ``df`` as ``path/shard=K/part-*.parquet`` with exactly one
    file per non-empty shard, plus ``path/_manifest.json``.

    ``repartition(n_shards, shard)`` then ``partitionBy(shard)``: each
    shard value lands in one task, so each directory holds one file a
    dataloader can claim whole. The manifest is n_shards rows of
    driver-side state — bounded regardless of table size.
    """
    sharded = assign_shards(df, key, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    counts = {
        int(r["shard"]): (int(r["n"]), int(r["keys"]))
        for r in sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct(key).alias("keys"))
        .collect()
    }
    manifest = [
        {"shard": s, "rows": counts.get(s, (0, 0))[0],
         "distinct_keys": counts.get(s, (0, 0))[1]}
        for s in range(n_shards)
    ]
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump({"n_shards": n_shards, "key": key, "shards": manifest}, f)
    return manifest
