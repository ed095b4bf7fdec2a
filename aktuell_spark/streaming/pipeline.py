"""The flagship dataflow: change stream → dedupe → exactly-once MERGE.

Spark restatement of the reference's whole server
(/root/reference/cmd/server/main.go:58-118 wiring;
pkg/sync/database.go:64-121 change-stream pull loop;
pkg/server/websocket.go:226-293 fan-out):

    readStream(change events)
      → filter(database/collection)            # subscription predicate F1
      → withWatermark("ts", delay)             # replaces drop-on-overflow
      → dropDuplicatesWithinWatermark("seq")   # resume-token identity
      → foreachBatch(BucketedUpsertTable)      # exactly-once MERGE

The reference's channel hops / goroutines become Spark stages; its
at-most-once drops (database.go:110-115) become checkpointed offsets.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.schemas import CHANGE_SCHEMA
from aktuell_spark.streaming.sink import BucketedUpsertTable


def write_change_feed(events: DataFrame, feed_dir: str, n_files: int = 8) -> None:
    """Lay a bounded CDC replay down as a file-source feed.

    Files are written in ``seq`` ranges so the file source replays in
    arrival order. Range-partitioning keeps this a single pass; at scale
    the feed is Kafka or an Iceberg changelog and this helper disappears.

    The file source orders a backlog by modification time, but write
    tasks finish in arbitrary order — without correction a later seq
    range can carry an earlier mtime and replay FIRST. LWW merges are
    order-insensitive so plain CDC wouldn't care, but partial updates
    have Mongo semantics (a delta whose base hasn't arrived matches
    nothing), so arrival order must follow seq order: stamp mtimes
    along the path order (part-NNNNN tracks the range partition id).
    """
    before: set[str] = set()
    prev_max = 0.0
    if os.path.isdir(feed_dir):
        for name in os.listdir(feed_dir):
            if name.endswith(".parquet"):
                before.add(name)
                prev_max = max(prev_max, os.path.getmtime(os.path.join(feed_dir, name)))
    (
        events.repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .write.mode("append")
        .parquet(feed_dir)
    )
    # Stamp ONLY the files this call created, strictly after the previous
    # generation's max mtime — a second append's part-00000-<uuid> sorts
    # lexically BETWEEN the first generation's files, so re-stamping the
    # whole listing would break cross-generation arrival order (deltas
    # before their base images under partial-update replay).
    t0 = max(time.time(), prev_max + 1.0)
    new_files = [
        n for n in sorted(os.listdir(feed_dir))
        if n.endswith(".parquet") and n not in before
    ]
    for i, name in enumerate(new_files):
        os.utime(os.path.join(feed_dir, name), (t0 + i, t0 + i))


def read_change_stream(
    spark: SparkSession,
    feed_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(feed_dir)


def subscription_filter(
    stream: DataFrame, database: str = "", collection: str = ""
) -> DataFrame:
    """Subscription predicate (F1): empty string = wildcard.

    Reference: isClientSubscribed,
    /root/reference/pkg/server/websocket.go:271-293 (empty collection
    wildcard at :286-288) and the client-side mirror
    pkg/client/client.go:388-401 (empty db also wildcards).
    """
    cond = F.lit(True)
    if database:
        cond = cond & (F.col("database") == database)
    if collection:
        cond = cond & (F.col("collection") == collection)
    return stream.filter(cond)


ENRICHED_EXTRA_COLS = (
    "n_tokens", "stopword_ratio", "distinct_ratio", "quality_score", "fingerprint"
)


def enrich_turns(df):
    """Ingest-time text enrichment: token stats, quality score, content
    fingerprint materialized next to the payload (north star: per-turn
    text transforms run in-engine; these are JVM-side column
    expressions, no Python). Null text (deletes) yields null metrics."""
    from aktuell_spark.functions.textops import with_fingerprint, with_quality_score

    return with_fingerprint(with_quality_score(df))


def run_cdc_pipeline(
    spark: SparkSession,
    feed_dir: str,
    table_root: str,
    checkpoint_dir: str,
    dedupe: str = "sink",
    watermark: str = "4 hours",
    database: str = "aktuell",
    collection: str = "transcripts",
    n_buckets: int = 32,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    enrich: bool = False,
    partial_updates: bool = False,
    trigger: dict | None = None,
    merge_on_read: bool = False,
    static_dim=None,
    static_dim_on: str = "conv_id",
    quarantine: bool = False,
    observe: bool = False,
):
    """Run the CDC pipeline; default trigger is availableNow (bounded
    replay). Pass ``trigger={"processingTime": "2 seconds"}`` for the
    forever-running tail the reference operates as
    (/root/reference/pkg/sync/database.go:97-121) — combine with
    ``await_termination=False`` and stop the query yourself.

    Restart with the same ``checkpoint_dir`` resumes from committed
    offsets — the upgrade over the reference's resume-less reconnect
    (pkg/client/client.go:431-485: missed events are simply lost).
    Returns the (query, table) pair.

    ``dedupe`` modes:

    - ``"sink"`` (default, the correctness path): redelivered events are
      neutralized by the sink's last-writer-wins MERGE on ``seq`` —
      idempotent, deterministic, independent of batch boundaries and
      watermark progression. Output is byte-identical for any replay
      slicing of the same input.
    - ``"watermark"``: additionally run in-stream
      ``dropDuplicatesWithinWatermark(["seq"])`` to bound redelivery work
      before the shuffle. CAVEAT (measured, not theoretical): any
      watermark-stateful operator *drops* rows later than the watermark,
      and the watermark advances per micro-batch — so output then depends
      on batch slicing unless ``watermark`` exceeds the worst event-time
      disorder in the feed. Use only when the disorder bound is known;
      the sink MERGE still backstops correctness for what passes through.
    """
    from aktuell_spark.operators.cdc import PAYLOAD_COLS

    if enrich and partial_updates:
        # enrichment derives columns from text; a delta-only update has
        # no text until the sink reconstructs it, so ingest-time
        # enrichment would materialize stale/null metrics. Recompute
        # enrichment downstream of the table instead.
        raise ValueError("enrich=True is incompatible with partial_updates=True")
    if static_dim is not None and partial_updates:
        # dim columns ride the full post-image; a delta-only event has
        # no stable row to hang them on until the sink reconstructs it
        raise ValueError(
            "static_dim is incompatible with partial_updates=True"
        )
    stream = read_change_stream(spark, feed_dir, max_files_per_trigger)
    stream = subscription_filter(stream, database, collection)
    if observe:
        # per-micro-batch data-quality counters on the progress event
        # (Observation API — computed inside the batch's job, no second
        # pass); ProgressRecorder surfaces them under "observed"
        from aktuell_spark.streaming.metrics import observe_quality

        stream = observe_quality(stream)
    dim_cols: tuple[str, ...] = ()
    if static_dim is not None:
        # stream-static enrichment: Spark re-plans the join per
        # micro-batch, so the dim may even be updated between batches.
        # Broadcast pinned — a dim lookup must never shuffle the stream
        # (the reference's UpdateLookup hits Mongo per event;
        # /root/reference/pkg/models/types.go:17-18); left join so a
        # missing dim row never drops a change event.
        import pyspark.sql.functions as _F

        dim_cols = tuple(
            c for c in static_dim.columns if c != static_dim_on
        )
        stream = stream.join(
            _F.broadcast(static_dim), on=static_dim_on, how="left"
        )
    if enrich:
        stream = enrich_turns(stream)
        payload = (*PAYLOAD_COLS, *ENRICHED_EXTRA_COLS, *dim_cols)
        table = BucketedUpsertTable(
            spark, table_root, n_buckets=n_buckets, payload=payload,
            payload_schema=stream.schema, merge_on_read=merge_on_read,
            quarantine=quarantine,
        )
    elif dim_cols:
        table = BucketedUpsertTable(
            spark, table_root, n_buckets=n_buckets,
            payload=(*PAYLOAD_COLS, *dim_cols),
            payload_schema=stream.schema, merge_on_read=merge_on_read,
            quarantine=quarantine,
        )
    else:
        table = BucketedUpsertTable(
            spark, table_root, n_buckets=n_buckets,
            partial_updates=partial_updates, merge_on_read=merge_on_read,
            quarantine=quarantine,
        )
    if dedupe == "watermark":
        stream = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["seq"]
        )
    query = (
        stream.writeStream.foreachBatch(table.foreach_batch())
        .option("checkpointLocation", os.path.join(checkpoint_dir))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query, table
