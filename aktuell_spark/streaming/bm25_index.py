"""Stream-maintained BM25 retrieval index: the inverted term index kept
live by the document stream instead of re-tokenizing the corpus per
query — the fourth instance of the incremental-index pattern
(streaming/ann_index.py, dedup_index.py, cluster_index.py).

Two exactly-once tables under one root, merged per micro-batch under
the SAME epoch id (idempotent crash/replay, like the dedup index):

- ``postings`` — (term, doc_id) → tf: the inverted index proper,
  BUCKETED BY TERM so a query's candidate set is a bucket-pruned
  ``lookup_many`` on its terms — search IO is O(query terms' posting
  lists), never the corpus;
- ``docs``    — doc_id → (dl, doc_seq): per-document token length, the
  BM25 length-normalization side (plus N/avgdl corpus stats — a
  2-column, column-pruned scan at search time; a production deployment
  would additionally fold N/avgdl into a running 1-row aggregate).

Per micro-batch: arriving docs are tokenized IN-STREAM with the exact
expression the batch ``bm25_topk`` uses (lower/trim/split), reduced to
per-(doc, term) tf rows — narrow + one map-side-combinable groupBy —
and merged. A redelivered doc LWW-replaces its postings; terms its new
text no longer contains get tombstones (the retraction check is gated
on redelivery — insert-only epochs never scan the postings table).

``search`` pulls the query terms' postings (bucket-pruned), joins
document lengths, and runs the SAME shared scoring stage
(``functions.retrieval.bm25_rank``) as the batch path — so the live
index answers a query IDENTICALLY to the batch sweep on the final
corpus, pinned by tests/test_bm25_index_stream.py across slicings,
restarts, and changed-text redeliveries, and graded cross-engine by
the ``bm25_incremental`` oracle query (the batch BM25 SQL verbatim).

Reference behavior re-expressed: continuous per-collection sync into
client state (/root/reference/pkg/sync/database.go:97-121), re-targeted
at retrieval-index maintenance per the round brief.
"""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

BM25_FEED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("seq", T.LongType()),
])

_POSTINGS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("tf", T.DoubleType()),
])

_DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("dl", T.DoubleType()),
    T.StructField("doc_seq", T.LongType()),
])


def _tokens(text_col):
    """The batch bm25_topk tokenizer, verbatim — parity is the point."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


class StreamingBM25Index:
    """foreachBatch body + the two standing tables + search."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.postings = BucketedUpsertTable(
            spark, os.path.join(root, "postings"), n_buckets=n_buckets,
            key=("term", "doc_id"), payload=("term", "doc_id", "tf"),
            order_col="seq", bucket_key="term",
            payload_schema=_POSTINGS_SCHEMA,
        )
        self.docs = BucketedUpsertTable(
            spark, os.path.join(root, "docs"), n_buckets=n_buckets,
            key=("doc_id",), payload=("doc_id", "dl", "doc_seq"),
            order_col="seq", payload_schema=_DOCS_SCHEMA,
        )

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.postings.is_committed(epoch_id) and self.docs.is_committed(
            epoch_id
        ):
            return
        pins: list[DataFrame] = []

        def _pin(df: DataFrame) -> DataFrame:
            pins.append(df.persist())
            return pins[-1]

        # latest row per doc within the batch (a feed may redeliver)
        arriving = _pin(
            batch_df.select("doc_id", "text", "seq")
            .groupBy("doc_id")
            .agg(F.max(F.struct("seq", "text")).alias("w"))
            .select(
                "doc_id",
                F.col("w.text").alias("text"),
                F.col("w.seq").alias("seq"),
            )
        )
        try:
            # out-of-order protection: a redelivery whose seq is <= the
            # standing doc_seq is STALE — indexing it would LWW-replace
            # newer postings (postings rows carry epoch-based seqs, see
            # below). The check is a 2-column scan of docs joined to the
            # broadcast batch keys — gated; first epoch skips it.
            standing_empty = self.docs._read_raw() is None  # listing only
            updated: list[int] = []
            if not standing_empty:
                st_small = (
                    self.docs.read()
                    .select("doc_id", F.col("doc_seq").alias("_st_seq"))
                    # batch-bounded: the standing scan streams past the
                    # broadcast key filter, only matching rows survive
                    .join(
                        F.broadcast(arriving.select("doc_id")),
                        "doc_id",
                        "left_semi",
                    )
                )
                joined = _pin(arriving.join(F.broadcast(st_small), "doc_id", "left"))
                batch = _pin(
                    joined.filter(
                        F.col("_st_seq").isNull()
                        | (F.col("seq") > F.col("_st_seq"))
                    ).select("doc_id", "text", "seq")
                )
                # ids genuinely REPLACING a standing doc: their stale
                # postings need the retraction check
                updated = [
                    r[0]
                    for r in joined.filter(
                        F.col("_st_seq").isNotNull()
                        & (F.col("seq") > F.col("_st_seq"))
                    ).select("doc_id").collect()
                ]
            else:
                batch = arriving
            new_postings = _pin(
                batch.select(
                    "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
                )
                .groupBy("term", "doc_id")
                .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            )
            # postings rows (inserts AND tombstones) carry seq = epoch
            # id: replay-stable, monotone across epochs, and comparable
            # between an insert and the tombstone that must beat it —
            # feed seqs live only in the docs table (true per-doc LWW).
            epoch_seq = F.lit(int(epoch_id)).cast("long")
            ops = new_postings.withColumn("op", F.lit("insert"))
            if updated:
                stale = (
                    self.postings.read()
                    .filter(F.col("doc_id").isin(updated))
                    .select("term", "doc_id")
                    .join(
                        new_postings.select("term", "doc_id"),
                        ["term", "doc_id"],
                        "left_anti",
                    )
                    .withColumn("tf", F.lit(None).cast("double"))
                    .withColumn("op", F.lit("delete"))
                )
                ops = ops.unionByName(stale)
            self.postings.merge_batch(ops.withColumn("seq", epoch_seq), epoch_id)
            self.docs.merge_batch(
                batch.select(
                    "doc_id",
                    F.size(_tokens(F.col("text"))).cast("double").alias("dl"),
                    F.col("seq").alias("doc_seq"),
                    "seq",
                ).withColumn("op", F.lit("insert")),
                epoch_id,
            )
        finally:
            for df in pins:
                df.unpersist()

    def foreach_batch(self):
        return lambda df, epoch: self.merge_batch(df, epoch)

    def search(
        self,
        terms: list[str],
        k1: float = 1.2,
        b: float = 0.75,
        topk: int = 50,
    ) -> DataFrame:
        """BM25 top-k from the LIVE index: bucket-pruned postings read
        on the query terms, document lengths joined by key, corpus
        stats from a 2-column scan of the docs table — then the shared
        batch scoring stage. Output (doc_id, rank, score), identical to
        ``bm25_topk`` on the same corpus."""
        from aktuell_spark.functions.retrieval import bm25_rank

        qterms = sorted(set(terms))
        post = self.postings.lookup_many(qterms).select("term", "doc_id", "tf")
        dls = self.docs.read().select("doc_id", "dl")
        stats = dls.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        tf = post.join(dls, "doc_id").select("doc_id", "dl", "term", "tf")
        return bm25_rank(tf, stats, k1=k1, b=b, topk=topk)


def run_bm25_index_stream(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger: dict | None = None,
):
    """Tail a document feed into the live BM25 index. Same lifecycle
    contract as run_cdc_pipeline. Returns (query, index)."""
    reader = spark.readStream.schema(BM25_FEED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    index = StreamingBM25Index(spark, root, n_buckets=n_buckets)
    query = (
        stream.writeStream.foreachBatch(index.foreach_batch())
        .option("checkpointLocation", os.path.join(checkpoint_dir))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query, index
