"""Stream-maintained ANN index: the LSH-bucketed vector index kept up
to date by the CDC stream instead of rebuilt per query (round-6 task
#3 — the batch index from functions/similarity.py, given the curation
sink's exactly-once maintenance pattern, streaming/curation.py:90).

Each micro-batch of vector events (insert/update/delete by ``vec_id``)
is assigned its LSH cell IN-STREAM (``sign_bucket`` — pure column
arithmetic, zero shuffle) and merged exactly-once into a vec_id-keyed
``BucketedUpsertTable``. LWW by ``seq`` makes updates replace the old
embedding (and its stale cell) atomically, deletes drop the vector via
the sink's tombstones, and crash/replay is idempotent — the index is
never rebuilt, only maintained.

Probing reads the materialized (vec_id, cell, embedding) rows and runs
the SAME in-cell top-k join as the batch path
(``similarity.knn_from_cells``), so a stream-built index answers
queries identically to a batch-built one — pinned by
tests/test_ann_stream.py and the ``ann_incremental`` oracle query.

Scale shape: per-batch cost is one narrow map + the sink's single
bucket shuffle on vec_id (uniform — ids, not content). Cell lookups on
the read side push a ``cell IN (...)`` predicate into the parquet scan;
``table.compact(sort_within=("cell",))`` clusters rows by cell so
row-group min/max stats skip non-probed cells — the LSM analogue of an
IVF inverted list. The cell column is recomputed ONLY for arriving
vectors; standing vectors are never rescanned.

Reference behavior re-expressed: continuous per-collection sync into
client state (/root/reference/pkg/sync/database.go:97-121), re-targeted
at vector-index maintenance per the round brief.
"""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.functions.similarity import knn_from_cells, sign_bucket
from aktuell_spark.streaming.sink import BucketedUpsertTable

VEC_FEED_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("op", T.StringType()),
    T.StructField("seq", T.LongType()),
])

ANN_INDEX_PAYLOAD = ("vec_id", "cell", "embedding")

ANN_INDEX_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cell", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def ann_index_table(
    spark: SparkSession, root: str, n_buckets: int = 32
) -> BucketedUpsertTable:
    return BucketedUpsertTable(
        spark, root, n_buckets=n_buckets,
        key=("vec_id",), payload=ANN_INDEX_PAYLOAD,
        order_col="seq", payload_schema=ANN_INDEX_SCHEMA,
    )


def with_cell(vectors: DataFrame, n_planes: int) -> DataFrame:
    """Assign the LSH cell for arriving vectors — narrow, stream-safe.
    Delete events carry no embedding; their cell is null (the sink
    removes by key, not by cell)."""
    return vectors.withColumn(
        "cell",
        F.when(
            F.col("embedding").isNotNull(),
            sign_bucket(F.col("embedding"), n_planes).cast("long"),
        ),
    )


def run_ann_index_stream(
    spark: SparkSession,
    feed_dir: str,
    table_root: str,
    checkpoint_dir: str,
    n_planes: int = 8,
    n_buckets: int = 32,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger: dict | None = None,
):
    """Tail a vector-event feed into the live ANN index. Same lifecycle
    contract as run_cdc_pipeline: bounded availableNow replay by
    default, restart from checkpoint is a no-op, epoch commits are
    idempotent. Returns (query, table)."""
    reader = spark.readStream.schema(VEC_FEED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    indexed = with_cell(stream, n_planes).select(
        "vec_id", "cell", "embedding", "seq", "op"
    )
    table = ann_index_table(spark, table_root, n_buckets=n_buckets)
    query = (
        indexed.writeStream.foreachBatch(table.foreach_batch())
        .option("checkpointLocation", os.path.join(checkpoint_dir))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query, table


def knn_from_index(
    table: BucketedUpsertTable,
    k: int = 5,
    max_bucket_size: int = 64,
    cells: list[int] | None = None,
) -> DataFrame:
    """Top-k in-cell neighbors from the LIVE index — identical output
    to ``knn_lsh`` over the same vector set (cells were assigned with
    the same planes at ingest). ``cells`` restricts the probe to the
    given LSH cells; the filter pushes into the parquet scan."""
    rows = table.read().select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        F.col("cell").alias("bucket"),
    )
    if cells is not None:
        rows = rows.filter(F.col("bucket").isin(cells))
    return knn_from_cells(rows, k, max_bucket_size)


def batch_index_oracle(
    emb: DataFrame, n_planes: int = 8
) -> DataFrame:
    """The batch-built index a stream-built one must equal: one pass of
    cell assignment over the full vector set."""
    return with_cell(
        emb.select("vec_id", "embedding"), n_planes
    ).select("vec_id", "cell", "embedding")
