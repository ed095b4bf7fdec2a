"""Stream-maintained repeated-substring (boilerplate) index: the exact
span detector (functions/dedupe.py::repeated_substring_spans) kept live
by the document stream — the SIXTH instance of the incremental-index
pattern (ann_index, dedup_index, cluster_index, bm25_index,
decontam_index).

The incremental problem is a COUNTED one: a gram-start position is
marked iff its gram hash occurs at >= 2 (doc, pos) sites corpus-wide,
so an arriving document can flip OTHER documents' standing positions —
a gram whose count crosses 1→2 retro-marks its old site, a changed-text
redelivery that drops a copy crosses 2→1 and must UNMARK the surviving
site. Four exactly-once tables under one epoch id, ALL merge-on-read
(pure appends; no cross-table read-then-rewrite hazard and O(batch)
epoch ingest):

- ``positions`` — (gh, doc_id, pos), bucketed by gram hash: every
  min_len-char gram-start site (the corpus-chars-sized table).
- ``counts``    — gh → cnt, bucketed by gram hash: the per-gram site
  count, the 1→2 / 2→1 transition detector — so an epoch reads ONE row
  per touched gram instead of that gram's whole posting list.
- ``marked``    — (doc_id, pos), bucketed by doc: the repeated
  positions, i.e. the materialized read surface. ``spans()`` is one
  per-doc gaps-and-islands window over it (|marked|-bounded, the same
  shared ``positions_to_spans`` stage the batch detector uses).
- ``docs``      — doc_id → (text, doc_seq): per-doc LWW (stale
  out-of-order redeliveries dropped), and the pre-image a redelivery's
  retraction re-grams. MERGES LAST, so the gate always reads pre-epoch
  state even on replay.

Replay-stable read-modify-write (the part the other five indexes don't
need): counts are old+delta, so a replay after a partial commit (e.g.
counts committed, marked not) must NOT read its own half-applied
output. Every standing read of ``positions``/``counts`` during a merge
is AS OF THE LAST EPOCH COMMITTED STRICTLY BEFORE this one — MoR run
files make that a free snapshot read — so a replayed epoch recomputes
byte-identical deltas and transitions no matter which subset of tables
already committed (tests/test_span_index_stream.py crash seams).
Corollary on maintenance: a FULL ``compact()`` records its cutoff at
the newest committed epoch, which would make the NEXT epoch's
as-of-previous read refuse — so the index's maintenance entry point is
``expire(upto)`` (``expire_runs``): runs at or below the cutoff fold
into per-bucket bases while snapshots above it stay valid, keeping the
read amplification bounded without ever invalidating the next merge
(pinned by a fold-then-keep-streaming test).

Per-epoch cost: O(batch chars) gram rows, a bucket-pruned 1-row-per-
touched-gram counts probe, and standing-site lookups ONLY for grams
that actually cross the repeated threshold (bounded by those grams'
posting lists). ``spans()`` must equal the batch sweep on the final
corpus — pinned across slicings, arrival orders, both-direction
transitions, stale redeliveries, restarts, and partial-commit replays,
and graded as ``span_incremental`` against the batch spans SQL
verbatim.

Reference behavior re-expressed: continuous per-collection sync into
client state (/root/reference/pkg/sync/database.go:97-121), re-targeted
at training-data curation per the round brief.
"""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.streaming.sink import BucketedUpsertTable

SPAN_FEED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("seq", T.LongType()),
])

_POSITIONS_SCHEMA = T.StructType([
    T.StructField("gh", T.LongType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("pos", T.IntegerType()),
])

_COUNTS_SCHEMA = T.StructType([
    T.StructField("gh", T.LongType()),
    T.StructField("cnt", T.LongType()),
])

_MARKED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pos", T.IntegerType()),
])

_DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("doc_seq", T.LongType()),
])

_MAX_LOOKUP_IDS = 512


class StreamingSpanIndex:
    """foreachBatch body + the four standing tables + the read."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        min_len: int = 30,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.min_len = min_len
        self.positions = BucketedUpsertTable(
            spark, os.path.join(root, "positions"), n_buckets=n_buckets,
            key=("gh", "doc_id", "pos"), payload=("gh", "doc_id", "pos"),
            order_col="seq", payload_schema=_POSITIONS_SCHEMA,
            merge_on_read=True,
        )
        self.counts = BucketedUpsertTable(
            spark, os.path.join(root, "counts"), n_buckets=n_buckets,
            key=("gh",), payload=("gh", "cnt"),
            order_col="seq", payload_schema=_COUNTS_SCHEMA,
            merge_on_read=True,
        )
        self.marked = BucketedUpsertTable(
            spark, os.path.join(root, "marked"), n_buckets=n_buckets,
            key=("doc_id", "pos"), payload=("doc_id", "pos"),
            order_col="seq", payload_schema=_MARKED_SCHEMA,
            merge_on_read=True,
        )
        self.docs = BucketedUpsertTable(
            spark, os.path.join(root, "docs"), n_buckets=n_buckets,
            key=("doc_id",), payload=("doc_id", "text", "doc_seq"),
            order_col="seq", payload_schema=_DOCS_SCHEMA,
            merge_on_read=True,
        )

    # ------------------------------------------------------------------
    def expire(self, upto: int | None = None) -> None:
        """Fold run files at or below ``upto`` into per-bucket bases on
        all four tables (Iceberg expire_snapshots analogue). Defaults to
        last-committed-epoch - 1: the newest epoch stays travelable, so
        the NEXT merge's as-of-previous reads remain valid — the safe
        maintenance cadence for a live stream (a full compact() would
        record its cutoff at the newest epoch and refuse them)."""
        if upto is None:
            eps = [
                int(c)
                for c in os.listdir(self.counts.commits_dir)
                if c.lstrip("-").isdigit() and int(c) >= 0
            ]
            if len(eps) < 2:
                return
            upto = max(eps) - 1
        for t in (self.positions, self.counts, self.marked, self.docs):
            t.expire_runs(upto)

    def _prev_epoch(self, table: BucketedUpsertTable, epoch_id: int):
        """Last epoch committed STRICTLY before this one — the snapshot
        every standing read during this epoch's merge pins to, so a
        replay reads the same pre-epoch state even after a partial
        commit."""
        eps = []
        for c in os.listdir(table.commits_dir):
            try:
                e = int(c)
            except ValueError:
                continue
            if e < epoch_id:
                eps.append(e)
        return max(eps) if eps else None

    def _asof_pruned(
        self, table: BucketedUpsertTable, prev, gh_df: DataFrame
    ) -> DataFrame:
        """Pre-epoch snapshot of ``table`` restricted to the probe
        grams' buckets (dir-level pruning; the bucket-id collect is
        bounded by n_buckets) AND to the probe grams themselves — the
        broadcast semi-filter runs BEFORE the MoR collapse, so only the
        touched grams' rows pay the collapse shuffle, not the whole
        bucket scan (group-preserving: gh is part of every key)."""
        if prev is None:
            return table.read().limit(0)
        buckets = sorted(
            r[0]
            for r in gh_df.select(
                F.pmod(F.xxhash64("gh"), F.lit(table.n_buckets))
                .cast("int").alias("b")
            ).distinct().collect()
        )
        raw = (
            table._read_raw(
                buckets=buckets, as_of_epoch=prev, semi_filter=(gh_df, "gh")
            )
            if buckets else None
        )
        if raw is None:
            return table.read().limit(0)
        return raw.filter(F.col("op") != "delete").select(*table.payload)

    def _fetch_docs(self, ids: list[int]) -> DataFrame:
        if not ids:
            return self.docs.read().limit(0)
        if len(ids) <= _MAX_LOOKUP_IDS:
            return self.docs.lookup_many(ids)
        id_df = self.spark.createDataFrame(
            [(int(i),) for i in ids], "doc_id long"
        )
        return self.docs.read().join(F.broadcast(id_df), "doc_id", "left_semi")

    def _grams(self, df: DataFrame) -> DataFrame:
        """(gh, doc_id, pos) via the shared batch gram stage."""
        from aktuell_spark.functions.dedupe import char_gram_positions

        return char_gram_positions(df, "doc_id", "text", self.min_len).select(
            F.col("h").alias("gh"), "doc_id", "pos"
        )

    # ------------------------------------------------------------------
    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        tables = (self.positions, self.counts, self.marked, self.docs)
        if all(t.is_committed(epoch_id) for t in tables):
            return
        pins: list[DataFrame] = []

        def _pin(df: DataFrame) -> DataFrame:
            pins.append(df.persist())
            return pins[-1]

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
            # stale-redelivery gate + update detection against the docs
            # table, which merges LAST — its current state is always the
            # pre-epoch image, replay included
            updated: list[int] = []
            if self.docs._read_raw() is not None:
                st = (
                    # read_where: the batch-key restriction runs below
                    # the MoR run collapse (and prunes bucket dirs), so
                    # the gate collapses only the overlapping ids' rows
                    self.docs.read_where(arriving.select("doc_id"), "doc_id")
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
            else:
                batch = arriving

            prev_pos = self._prev_epoch(self.positions, epoch_id)
            prev_cnt = self._prev_epoch(self.counts, epoch_id)
            key3 = ["gh", "doc_id", "pos"]

            new_pos = self._grams(batch)
            if updated:
                old_pos = self._grams(
                    self._fetch_docs(updated).select("doc_id", "text")
                )
                added = _pin(new_pos.join(old_pos, key3, "left_anti"))
                removed = _pin(old_pos.join(new_pos, key3, "left_anti"))
            else:
                added = _pin(new_pos)
                removed = _pin(new_pos.limit(0))

            # per-gram deltas + pre-epoch counts → transition classes.
            # The touched-gram set IS the delta join's key set: one
            # full-outer join of the two per-gram delta aggregates
            # replaces the earlier union+distinct of raw sites plus
            # three left joins (two fewer 600k-row shuffles per epoch);
            # insert-only epochs (the common case) carry an empty
            # removed side through for free.
            d_add = added.groupBy("gh").agg(F.count(F.lit(1)).alias("_a"))
            d_rem = removed.groupBy("gh").agg(F.count(F.lit(1)).alias("_r"))
            touched = _pin(
                d_add.join(d_rem, "gh", "full_outer").select(
                    "gh",
                    F.coalesce(F.col("_a"), F.lit(0)).alias("_a"),
                    F.coalesce(F.col("_r"), F.lit(0)).alias("_r"),
                )
            )
            old_counts = self._asof_pruned(self.counts, prev_cnt, touched)
            cnts = _pin(
                touched.join(old_counts, "gh", "left")
                .select(
                    "gh",
                    F.coalesce(F.col("cnt"), F.lit(0)).alias("_old"),
                    (
                        F.coalesce(F.col("cnt"), F.lit(0))
                        + F.col("_a")
                        - F.col("_r")
                    ).cast("long").alias("_new"),
                )
            )
            epoch_seq = F.lit(int(epoch_id)).cast("long")

            def _ops(df: DataFrame, op: str) -> DataFrame:
                return df.withColumn("op", F.lit(op)).withColumn(
                    "seq", epoch_seq
                )

            pos_ops = _ops(added, "insert").unionByName(
                _ops(removed, "delete")
            )
            cnt_ops = _ops(
                cnts.filter(F.col("_new") > 0).select(
                    "gh", F.col("_new").alias("cnt")
                ),
                "insert",
            ).unionByName(
                _ops(
                    cnts.filter(F.col("_new") <= 0).select(
                        "gh", F.lit(None).cast("long").alias("cnt")
                    ),
                    "delete",
                )
            )

            # transition classes partition the touched GRAMS — but not
            # the (doc, pos) KEYS: an updated document reuses positions,
            # so one key can get a mark from its NEW gram and an unmark
            # from its OLD gram in the same epoch (e.g. the old gram
            # drops 2→1 while the new gram rises 1→2). Marks always
            # assert the current truth ("the gram now at p is
            # repeated"), so marks take precedence (see below).
            up = cnts.filter((F.col("_old") < 2) & (F.col("_new") >= 2)).select("gh")
            down = cnts.filter((F.col("_old") >= 2) & (F.col("_new") < 2)).select("gh")
            steady = cnts.filter((F.col("_old") >= 2) & (F.col("_new") >= 2)).select("gh")
            # up ∪ steady ≡ grams repeated AFTER this epoch (_new >= 2):
            # ONE added-side join replaces the former two legs
            rep_new = cnts.filter(F.col("_new") >= 2).select("gh")
            trans = _pin(up.unionByName(down).distinct())
            # standing sites are read ONLY for grams that actually cross
            # the threshold — pre-epoch snapshot, bucket-pruned
            standing = _pin(self._asof_pruned(self.positions, prev_pos, trans))

            marks = (
                standing.join(up, "gh")
                .join(removed, key3, "left_anti")  # site gone this epoch
                .select("doc_id", "pos")
                .unionByName(added.join(rep_new, "gh").select("doc_id", "pos"))
            )
            unmarks = (
                removed.join(steady, "gh").select("doc_id", "pos")
                .unionByName(standing.join(down, "gh").select("doc_id", "pos"))
            )
            marks_d = _pin(marks.dropDuplicates(["doc_id", "pos"]))
            # marks win key conflicts: every mark source implies the
            # key's CURRENT gram is repeated after this epoch, while an
            # unmark may be driven by the key's REPLACED gram
            unmarks_d = unmarks.dropDuplicates(["doc_id", "pos"]).join(
                marks_d, ["doc_id", "pos"], "left_anti"
            )
            marked_ops = _ops(marks_d, "insert").unionByName(
                _ops(unmarks_d, "delete")
            )

            # populate the shared persisted intermediates ONCE before
            # forking: the three merges all read added/removed/cnts/
            # marks_d, and concurrent first-touch would race to compute
            # the same cache blocks in each thread (measured as every
            # merge paying the full gram-explode cost at epoch 0)
            cnts.count()
            marks_d.count()
            # the three MoR tables merge CONCURRENTLY (guide-§2.6
            # job overlap: each merge is one small bucketed write job,
            # and the tail of one merge leaves most cores idle for the
            # next): appends never delete files, every standing read in
            # the ops plans is an as-of-previous snapshot over a path
            # list fixed at plan time, and replay tolerates ANY subset
            # of the three committing (as-of-previous reads are the
            # point) — only ``docs`` must still merge LAST, because the
            # next epoch's stale-redelivery gate reads its current
            # state as the pre-epoch image.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=3) as pool:
                futs = [
                    pool.submit(self.positions.merge_batch, pos_ops, epoch_id),
                    pool.submit(self.counts.merge_batch, cnt_ops, epoch_id),
                    pool.submit(self.marked.merge_batch, marked_ops, epoch_id),
                ]
                for f in futs:
                    f.result()
            self.docs.merge_batch(
                _ops(
                    batch.select(
                        "doc_id", "text", F.col("seq").alias("doc_seq")
                    ),
                    "insert",
                ),
                epoch_id,
            )
        finally:
            for df in pins:
                df.unpersist()

    def foreach_batch(self):
        return lambda df, epoch: self.merge_batch(df, epoch)

    # ------------------------------------------------------------------
    def spans(self) -> DataFrame:
        """Current maximal repeated spans from the LIVE index: one
        gaps-and-islands window over the marked-positions table (the
        shared batch stage), identical to ``repeated_substring_spans``
        on the same corpus."""
        from aktuell_spark.functions.dedupe import positions_to_spans

        return positions_to_spans(self.marked.read(), self.min_len)

    def cleaned(self) -> DataFrame:
        """Live cleaned corpus: every repeated span cut out of the
        standing documents — the stream-maintained form of the batch
        ``strip_repeated_spans`` (same shared cut stage over
        ``spans()``; one row per standing doc)."""
        from aktuell_spark.functions.dedupe import strip_repeated_spans

        return strip_repeated_spans(
            self.docs.read().select("doc_id", "text"),
            min_len=self.min_len,
            spans=self.spans(),
        )


def run_span_index_stream(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    min_len: int = 30,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger: dict | None = None,
):
    """Tail a document feed into the live repeated-span index. Same
    lifecycle contract as run_cdc_pipeline. Returns (query, index)."""
    reader = spark.readStream.schema(SPAN_FEED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    index = StreamingSpanIndex(
        spark, root, min_len=min_len, n_buckets=n_buckets
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
