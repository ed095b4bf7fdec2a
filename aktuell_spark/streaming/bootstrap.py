"""Snapshot-then-tail bootstrap + subscription validation.

T3 (SURVEY §2.8): the reference streams a bounded snapshot of current
state before live changes (protocol at
/root/reference/pkg/server/websocket.go:534-631, README.md:59-64, msg
types pkg/models/types.go:95-97). Spark restatement: seed the
materialized table from a bounded read of the base table (as synthetic
'insert' events with seq below every live seq), then run the normal CDC
pipeline on top — the stream MERGEs over the snapshot exactly like the
client merges live changes over its snapshot array.

F3: config-driven subscription validation mirroring
``IsValidSubscription`` (/root/reference/pkg/sync/manager.go:222-241):
database must be configured; empty collection list allows all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import PAYLOAD_COLS
from aktuell_spark.operators.snapshot import SnapshotOptions, snapshot_scan
from aktuell_spark.streaming.pipeline import run_cdc_pipeline
from aktuell_spark.streaming.sink import BucketedUpsertTable


@dataclass
class EngineConfig:
    """Configured databases → allowed collections (empty = all),
    mirroring DatabaseConfig (/root/reference/pkg/models/types.go:59-72)."""

    databases: dict[str, list[str]] = field(default_factory=dict)

    def is_valid_subscription(self, database: str, collection: str) -> bool:
        if database not in self.databases:
            return False
        allowed = self.databases[database]
        return not allowed or collection == "" or collection in allowed


def bootstrap_snapshot(
    spark: SparkSession,
    base_table: DataFrame,
    table_root: str,
    opts: SnapshotOptions | None = None,
    n_buckets: int = 32,
    enrich: bool = False,
) -> BucketedUpsertTable:
    """Seed the materialized table from a bounded snapshot scan.

    Snapshot rows enter as 'insert' events with unique NEGATIVE seqs
    (below every live seq), so any live change for the same key wins the
    MERGE — identical to the client applying changes over its snapshot
    array. Seqs must be unique, not a constant: the sink's redelivery
    dedupe is dropDuplicates(seq), and a constant would collapse the
    whole snapshot to one row.

    ``enrich`` must match the tail pipeline's flag: an enriched tail
    reads the enriched state columns back from the seeded parquet, so
    the seed has to materialize them too (same schema, same functions).
    """
    snap = snapshot_scan(base_table, opts or SnapshotOptions())
    seeded = snap.select(*PAYLOAD_COLS).withColumn(
        "seq", (F.lit(-1) - F.monotonically_increasing_id()).cast("long")
    ).withColumn("op", F.lit("insert"))
    if enrich:
        from aktuell_spark.streaming.pipeline import ENRICHED_EXTRA_COLS, enrich_turns

        seeded = enrich_turns(seeded)
        table = BucketedUpsertTable(
            spark, table_root, n_buckets=n_buckets,
            payload=(*PAYLOAD_COLS, *ENRICHED_EXTRA_COLS),
            payload_schema=seeded.schema,
        )
    else:
        table = BucketedUpsertTable(spark, table_root, n_buckets=n_buckets)
    table.merge_batch(seeded, epoch_id=-1)
    return table


def snapshot_then_tail(
    spark: SparkSession,
    base_table: DataFrame,
    feed_dir: str,
    table_root: str,
    checkpoint_dir: str,
    opts: SnapshotOptions | None = None,
    **pipeline_kwargs,
):
    """Full bootstrap: snapshot seed + live tail from the change feed.

    Returns (query, table). Restarting skips the seed if epoch -1 is
    already committed (idempotent bootstrap).
    """
    # seed and tail MUST agree on n_buckets: bucket assignment is
    # pmod(hash(key), n_buckets), so a mismatch would place the same key
    # in two bucket dirs and duplicate it on read
    n_buckets = pipeline_kwargs.get("n_buckets", 32)
    table = bootstrap_snapshot(
        spark, base_table, table_root, opts, n_buckets=n_buckets,
        enrich=pipeline_kwargs.get("enrich", False),
    )
    query, table = run_cdc_pipeline(
        spark, feed_dir, table_root, checkpoint_dir, **pipeline_kwargs
    )
    return query, table
