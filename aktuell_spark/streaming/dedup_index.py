"""Stream-maintained MinHash-LSH dedup index: near-duplicate pair
detection kept live by the document stream instead of re-banding the
whole corpus per sweep (the second instance of the round-6
incremental-index pattern, after streaming/ann_index.py).

Three exactly-once tables under one root, all merged per micro-batch
under the SAME epoch id (each has its own commit marker, so a crash
between merges replays idempotently):

- ``bands``  — (doc_id, band_idx) → band_key: the LSH index proper,
  BUCKETED BY band_key (the probe's search key) and merge-on-read.
  LWW by seq; a re-sent doc's old rows in OTHER buckets are tombstoned
  from the docs pre-image (re-banded old text).
- ``docs``   — doc_id → (text, n_sh, doc_seq): the corpus side the
  exact-Jaccard verification reads. ``n_sh`` (distinct-shingle count)
  is computed IN-STREAM at ingest and persisted, so verification never
  re-aggregates a standing doc's shingles; ``doc_seq`` makes
  latest-text resolution explicit when a doc is redelivered.
- ``pairs``  — (doc_a, doc_b) → jaccard: verified near-dup pairs,
  upserted per epoch (seq = epoch id). A redelivered doc with CHANGED
  text re-verifies every standing pair it touches: still-matching
  pairs refresh their jaccard, no-longer-matching pairs get tombstones
  — so the table tracks the batch sweep on the LATEST corpus, not
  append-only evidence of past versions.

Per micro-batch, every stage is candidate-bounded:

1. the arriving docs are minhashed + banded IN-STREAM (the same
   ``band_table`` the batch path uses) and probed against the standing
   index with one equi-join on (band_idx, band_key) — probe cost is
   |batch| x bucket sizes, never corpus x corpus;
2. redelivered doc ids (a bucket-pruned ``lookup_many`` on the batch's
   ids — O(|batch|) buckets read) pull their standing pairs for the
   retraction check (any still-valid pair is rediscovered by the probe
   in step 1, since its updated member's new bands are probed);
   insert-only epochs skip the pairs scan entirely;
3. the verification corpus is fetched by bucket-pruned ``lookup_many``
   on exactly the candidate-pair member ids (id lists are metadata —
   longs, bounded by the probe-join output we materialize anyway;
   above _MAX_LOOKUP_IDS it degrades to one broadcast semi-join scan),
   resolved latest-text-by-seq, and verified with the shared
   candidate-bounded exact-Jaccard stage using the persisted n_sh —
   NO full-corpus shingle explode or aggregate, ever: epoch cost stays
   flat as the standing corpus grows (pinned by
   tests/test_dedup_index_stream.py::test_epoch_cost_is_candidate_bounded).

Every near-dup pair has a later-arriving member, so the stream
discovers exactly the pairs the batch ``minhash_lsh_pairs`` finds on
the final corpus (latest text per doc) — pinned by
tests/test_dedup_index_stream.py across batch slicings, restarts, and
changed-text redeliveries, and graded cross-engine by the
``dedup_incremental`` oracle query (the batch MinHash SQL verbatim).

Reference behavior re-expressed: continuous per-collection sync into
client state (/root/reference/pkg/sync/database.go:97-121), re-targeted
at dedup-index maintenance per the round brief.
"""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import (
    NUM_BANDS,
    NUM_PERM,
    band_table,
    minhash_signatures,
    verify_jaccard,
)
from aktuell_spark.streaming.sink import BucketedUpsertTable

DEDUP_FEED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("seq", T.LongType()),
])

_BANDS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("band_idx", T.IntegerType()),
    T.StructField("band_key", T.StringType()),
])

_DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_sh", T.LongType()),
    T.StructField("doc_seq", T.LongType()),
])

# lookup_many builds a literal IN-list; past this many ids the plan
# stops being worth it — degrade to one broadcast-semi-join scan of the
# standing table (IO-proportional, still no explode/aggregate).
_MAX_LOOKUP_IDS = 10_000

_PAIRS_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType()),
    T.StructField("doc_b", T.LongType()),
    T.StructField("jaccard", T.DoubleType()),
])


class StreamingDedupIndex:
    """foreachBatch body + the three standing tables."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int = 3,
        threshold: float = 0.2,
        num_perm: int = NUM_PERM,
        num_bands: int = NUM_BANDS,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.n, self.threshold = n, threshold
        self.num_perm, self.num_bands = num_perm, num_bands
        # bands is BUCKETED BY BAND_KEY (the probe's search key, VERDICT
        # r7 #3): the per-epoch probe prunes to the batch's band-key
        # buckets plus a pre-collapse semi-filter on the keys
        # themselves, so probe IO is O(batch band keys' postings), not
        # O(standing index). That also forces MERGE-ON-READ: band keys
        # hash into every bucket, so a CoW epoch would rewrite the whole
        # corpus-sized bands table (the BM25-postings hazard). A
        # redelivered doc's OLD band rows are tombstoned from the docs
        # pre-image (re-banded old text) — needed because its new band
        # keys land in different buckets, so LWW alone can't replace
        # them.
        self.bands = BucketedUpsertTable(
            spark, os.path.join(root, "bands"), n_buckets=n_buckets,
            key=("doc_id", "band_idx"), payload=("doc_id", "band_idx", "band_key"),
            order_col="seq", bucket_key="band_key",
            payload_schema=_BANDS_SCHEMA, merge_on_read=True,
        )
        # docs is corpus-sized and doc-bucketed — every batch touches
        # every bucket, so it is MoR for the same reason (the gate and
        # the verification lookups push their key sets below the run
        # collapse; compact() folds runs on the maintenance cadence)
        self.docs = BucketedUpsertTable(
            spark, os.path.join(root, "docs"), n_buckets=n_buckets,
            key=("doc_id",), payload=("doc_id", "text", "n_sh", "doc_seq"),
            order_col="seq", payload_schema=_DOCS_SCHEMA,
            merge_on_read=True,
        )
        self.pairs = BucketedUpsertTable(
            spark, os.path.join(root, "pairs"), n_buckets=n_buckets,
            key=("doc_a", "doc_b"), payload=("doc_a", "doc_b", "jaccard"),
            order_col="seq", payload_schema=_PAIRS_SCHEMA,
        )

    def _fetch_docs(self, ids: list[int]) -> DataFrame:
        """Standing docs for an explicit id set: bucket-pruned
        lookup_many (reads only the ids' buckets) up to _MAX_LOOKUP_IDS,
        then one broadcast-semi-join scan — never an explode/aggregate
        over the standing table either way."""
        if not ids:
            return self.docs.read().limit(0)
        if len(ids) <= _MAX_LOOKUP_IDS:
            return self.docs.lookup_many(ids)
        id_df = self.spark.createDataFrame(
            [(int(i),) for i in ids], "doc_id long"
        )
        return self.docs.read().join(F.broadcast(id_df), "doc_id", "left_semi")

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if (
            self.pairs.is_committed(epoch_id)
            and self.docs.is_committed(epoch_id)
            and self.bands.is_committed(epoch_id)
        ):
            return
        from aktuell_spark.functions.dedupe import _token_ngrams

        pins: list[DataFrame] = []

        def _pin(df: DataFrame) -> DataFrame:
            pins.append(df.persist())
            return pins[-1]

        # latest row per doc within the batch, with the persisted
        # verification metadata: n_sh = distinct-shingle count (same
        # expression the shared shingle stage uses, null/empty-guarded
        # like decontam_index's — size(NULL) is -1), doc_seq = seq copy
        arriving = _pin(
            batch_df.select("doc_id", "text", "seq")
            .groupBy("doc_id")
            .agg(F.max(F.struct("seq", "text")).alias("w"))
            .select(
                "doc_id",
                F.col("w.text").alias("text"),
                F.greatest(
                    F.size(
                        F.array_distinct(_token_ngrams(F.col("w.text"), self.n))
                    ),
                    F.lit(0),
                ).cast("long").alias("n_sh"),
                F.col("w.seq").alias("doc_seq"),
                F.col("w.seq").alias("seq"),
            )
        )
        try:
            # stale-redelivery gate (the same one the bm25/decontam/span
            # indexes apply): an out-of-order redelivery whose seq is <=
            # the standing doc_seq must not probe, retract, or index —
            # its text is older than the standing corpus. One 2-column
            # standing scan past a broadcast key filter; ``updated`` is
            # only the ids GENUINELY replacing a standing doc.
            batch_keys = arriving.select("doc_id")
            standing_empty = self.docs._read_raw() is None  # listing only
            updated: list[int] = []
            if not standing_empty:
                st = (
                    # read_where: the batch-key restriction runs BELOW
                    # the MoR run collapse, so the gate collapses only
                    # the overlapping ids' rows, never the whole table
                    self.docs.read_where(batch_keys, "doc_id")
                    .select("doc_id", F.col("doc_seq").alias("_st_seq"))
                )
                joined = _pin(arriving.join(F.broadcast(st), "doc_id", "left"))
                batch = _pin(
                    joined.filter(
                        F.col("_st_seq").isNull()
                        | (F.col("seq") > F.col("_st_seq"))
                    ).drop("_st_seq")
                )
                updated = [
                    r[0]
                    for r in joined.filter(
                        F.col("_st_seq").isNotNull()
                        & (F.col("seq") > F.col("_st_seq"))
                    ).select("doc_id").collect()
                ]
                batch_keys = batch.select("doc_id")
            else:
                batch = arriving
            new_bands = _pin(
                band_table(
                    minhash_signatures(
                        batch, "doc_id", "text", self.n, num_perm=self.num_perm
                    ),
                    self.num_perm,
                    self.num_bands,
                )
            )
            # probe: arriving bands vs (standing index ∪ this batch) —
            # one equi-join on the band key; the standing side never
            # self-joins, AND the standing read is pruned to the
            # batch's band keys (bucket-dir pruning + pre-collapse
            # semi-filter: bands is bucketed by band_key), so per-epoch
            # probe IO is O(batch keys' posting lists), not O(index)
            standing = self.bands.read_where(
                new_bands.select("band_key").distinct(), "band_key"
            ).select("doc_id", "band_idx", "band_key")
            all_bands = standing.unionByName(
                new_bands.select("doc_id", "band_idx", "band_key")
            )
            cand = _pin(
                new_bands.alias("a")
                .join(
                    all_bands.alias("b"),
                    (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")),
                )
                .select(
                    F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                )
                .distinct()
            )
            # updated docs (ids genuinely replacing a standing doc, per
            # the gate above): their existing pairs are stale. Any such
            # pair that still band-collides on the CURRENT signatures is
            # rediscovered by the probe join above (its updated member
            # is in new_bands), so verifying ``cand`` alone reproduces
            # the batch LSH sweep on the latest corpus exactly; standing
            # pairs of updated docs that do NOT re-verify get
            # tombstones.
            if updated:
                old_pairs = _pin(
                    self.pairs.read()
                    .filter(
                        F.col("doc_a").isin(updated)
                        | F.col("doc_b").isin(updated)
                    )
                    .select("doc_a", "doc_b")
                )
            else:
                old_pairs = None
            # candidate members whose text must come from the standing
            # table (batch members already carry theirs) — collected as
            # metadata, bounded by the probe output
            need_ids = [] if standing_empty else [
                r[0]
                for r in cand.select(
                    F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
                )
                .distinct()
                .join(batch_keys, "doc_id", "left_anti")
                .collect()
            ]
            standing_c = self._fetch_docs(sorted(need_ids)).select(
                "doc_id", "text", "n_sh", "doc_seq"
            )
            # latest text per doc: the gate already dropped batch rows
            # older than standing state, and need_ids excludes batch
            # ids, so the two sides are DISJOINT one-row-per-doc sets —
            # a plain union, no LWW collapse shuffle needed
            corpus = _pin(
                standing_c.unionByName(
                    batch.select("doc_id", "text", "n_sh", "doc_seq")
                ).select("doc_id", "text", "n_sh")
            )
            verified = _pin(
                verify_jaccard(
                    cand, corpus, "doc_id", "text", self.n, self.threshold,
                    persist=False, sizes=corpus.select("doc_id", "n_sh"),
                )
            )
            # one op per pair key per epoch: verified pairs upsert (a
            # re-verified pair refreshes its jaccard), standing pairs of
            # updated docs that no longer verify get tombstones. seq =
            # epoch id: stable under replay, monotone across epochs, so
            # a later re-discovery outranks an earlier tombstone.
            epoch_seq = F.lit(int(epoch_id)).cast("long")
            pair_ops = verified.withColumn("op", F.lit("insert"))
            if old_pairs is not None:
                retract = (
                    old_pairs.join(
                        verified.select("doc_a", "doc_b"),
                        ["doc_a", "doc_b"],
                        "left_anti",
                    )
                    .withColumn("jaccard", F.lit(None).cast("double"))
                    .withColumn("op", F.lit("delete"))
                )
                pair_ops = pair_ops.unionByName(retract)
            # pairs and bands merge CONCURRENTLY (guide-§2.6 job
            # overlap): their ops plans read only pinned batch-side
            # data plus their OWN table's pre-swap files (read inside
            # their own job1, before their own swap), so neither can
            # observe the other's rewrite; replay tolerates either
            # committing alone (the probe's candidate set is
            # distinct-deduped, so re-probing against its own new bands
            # is a no-op). ``docs`` still merges LAST — the next
            # epoch's stale-redelivery gate reads its current state as
            # the pre-epoch image.
            from concurrent.futures import ThreadPoolExecutor

            bands_ops = new_bands.join(
                batch.select("doc_id", "seq"), "doc_id"
            ).withColumn("op", F.lit("insert"))
            if updated:
                # tombstone the updated docs' OLD band rows, re-derived
                # from the stored pre-image (|updated|-bounded): the new
                # band keys hash to different buckets, so the new
                # inserts cannot LWW-replace the old rows. A tombstone
                # is emitted ONLY when the old row lives in a different
                # bucket than the doc's new row for that band_idx —
                # when buckets coincide the new insert replaces the old
                # row by plain LWW (same bucket+key, higher seq), and
                # skipping the tombstone avoids an insert/delete seq
                # tie inside one bucket.
                nb = F.pmod(F.xxhash64("band_key"), F.lit(self.bands.n_buckets))
                old_bands = band_table(
                    minhash_signatures(
                        self._fetch_docs(sorted(updated))
                        .select("doc_id", "text"),
                        "doc_id", "text", self.n, num_perm=self.num_perm,
                    ),
                    self.num_perm,
                    self.num_bands,
                )
                new_buckets = new_bands.select(
                    "doc_id", "band_idx", nb.cast("int").alias("_nb")
                )
                stale_bands = (
                    old_bands.withColumn("_ob", nb.cast("int"))
                    # LEFT join: a doc whose new text yields no bands
                    # (too short) still tombstones every old row
                    .join(new_buckets, ["doc_id", "band_idx"], "left")
                    .filter(
                        F.col("_nb").isNull()
                        | (F.col("_ob") != F.col("_nb"))
                    )
                    .select("doc_id", "band_idx", "band_key")
                )
                bands_ops = bands_ops.unionByName(
                    stale_bands.join(batch.select("doc_id", "seq"), "doc_id")
                    .withColumn("op", F.lit("delete"))
                )
            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [
                    pool.submit(
                        self.pairs.merge_batch,
                        pair_ops.withColumn("seq", epoch_seq), epoch_id,
                    ),
                    pool.submit(self.bands.merge_batch, bands_ops, epoch_id),
                ]
                for f in futs:
                    f.result()
            self.docs.merge_batch(
                batch.withColumn("op", F.lit("insert")), epoch_id
            )
        finally:
            for df in pins:
                df.unpersist()

    def foreach_batch(self):
        return lambda df, epoch: self.merge_batch(df, epoch)

    def found_pairs(self) -> DataFrame:
        return self.pairs.read().select("doc_a", "doc_b", "jaccard")


def run_dedup_index_stream(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 0.2,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger: dict | None = None,
):
    """Tail a document feed into the live dedup index. Same lifecycle
    contract as run_cdc_pipeline. Returns (query, index)."""
    reader = spark.readStream.schema(DEDUP_FEED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    index = StreamingDedupIndex(
        spark, root, n=n, threshold=threshold, n_buckets=n_buckets
    )
    query = (
        stream.writeStream.foreachBatch(index.foreach_batch())
        .option("checkpointLocation", os.path.join(checkpoint_dir))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query, index
