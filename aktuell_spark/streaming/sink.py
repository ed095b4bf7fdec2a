"""Exactly-once keyed upsert sink for ``foreachBatch``.

This is the engine's materialized table — the Spark-side replacement for
the reference's client-side snapshot array mutated by
``applyChangeToSnapshot``
(/root/reference/react-client/src/hooks/useAktuellStream.ts:125-171) and
for its at-most-once delivery (events dropped on channel overflow,
/root/reference/pkg/sync/database.go:110-115). Here nothing is ever
dropped: checkpointed offsets + an idempotent epoch-committed MERGE give
exactly-once.

With an Iceberg catalog on a real cluster this whole class collapses to::

    MERGE INTO transcripts t USING batch s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'delete' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *

No Iceberg runtime jar ships in this sandbox, so the same semantics are
implemented as a bucketed-parquet copy-on-write table: state is hash-
partitioned into ``bucket = pmod(xxhash64(conv_id), n_buckets)`` dirs; a
micro-batch rewrites only the buckets it touches (Iceberg's partition-
level copy-on-write, hand-rolled). Scale math: at 10^12 turns with 2^14
buckets each bucket holds ~6e7 rows ≈ a few GB of parquet — one executor
task each; merge cost per batch is proportional to touched buckets, not
table size, and hot conversations spread because bucket count ≫ executor
count.

Exactly-once protocol:
- each epoch writes to ``_tmp-epoch-<n>``, then swaps each touched
  bucket crash-safely: the live dir is first moved aside to
  ``_aside-epoch-<n>/bucket=K``, then the new dir moved in — at every
  instant either the pre-epoch or the post-epoch image of a bucket
  exists on disk;
- a ``_commits/<n>`` marker is written last, then asides are deleted;
- ``_recover()`` (constructor + every merge) undoes interrupted epochs:
  asides of an uncommitted epoch are restored over any half-swapped
  state (the replayed batch re-merges deterministically onto the
  pre-epoch image), asides of a committed epoch are garbage-collected;
- a replayed epoch (failure before marker) re-merges idempotently —
  LWW over (pre-epoch state ∪ same batch) converges to the same rows;
- deletes persist as tombstones (op='delete' rows) so a duplicate of an
  older update replayed in a later epoch cannot resurrect a deleted key;
  ``read()`` filters tombstones.

Isolation caveat (parquet stand-in only): a concurrent ``read()`` racing
the swap of a live epoch can observe a torn view and should retry;
Iceberg readers pin a table snapshot (MVCC) and don't have this window.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import KEY_COLS, PAYLOAD_COLS, collapse_last_writer_wins


class BucketedUpsertTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        key=KEY_COLS,
        payload=PAYLOAD_COLS,
        order_col: str = "seq",
        bucket_key: str | None = None,
        payload_schema=None,
        partial_updates: bool = False,
        ts_col: str = "ts",
        merge_on_read: bool = False,
        quarantine: bool = False,
        cow_retain_epochs: int = 0,
    ) -> None:
        self.spark = spark
        self.root = root
        # cow_retain_epochs (copy-on-write tables only): keep the last N
        # epochs' aside dirs (the pre-epoch images of touched buckets)
        # instead of deleting them at commit, so ``read(as_of_epoch)``
        # works for the most recent N epochs on CoW too — the epoch-
        # aside retention option the MoR mode gets for free from its run
        # files. Storage cost is bounded: N × (touched buckets per
        # epoch), pruned automatically at each commit. Travel beyond the
        # window refuses loudly.
        self.cow_retain_epochs = cow_retain_epochs
        self.n_buckets = n_buckets
        self.key = tuple(key)
        self.payload = tuple(payload)
        self.order_col = order_col
        self.bucket_key = bucket_key or self.key[0]
        self.state_cols = (*self.payload, order_col, "op")
        # partial_updates: batches may carry update events WITHOUT a full
        # post-image (updated_fields/removed_fields only — the reference's
        # no-UpdateLookup case, pkg/models/types.go:17-18); the merge then
        # reconstructs post-images against existing state. Delta values
        # are strings (map<string,string>), so every non-key, non-ts
        # payload column must be a string column in this mode.
        self.partial_updates = partial_updates
        self.ts_col = ts_col
        # merge_on_read: epochs APPEND per-bucket files (Iceberg/Hudi MoR,
        # LSM-style) instead of rewriting touched buckets — per-epoch cost
        # is O(batch) with zero read-modify-write of existing state; reads
        # collapse across epoch files and compact() folds them back to one
        # file per bucket. The write-heavy-CDC trade: cheapest possible
        # ingest, read amplification bounded by compaction cadence.
        # merge_on_read + partial_updates: LSM runs store the raw events
        # INCLUDING updated_fields/removed_fields, and the read-time
        # collapse is reconstruct_post_images instead of plain LWW —
        # delta-only feeds get MoR's O(batch) ingest (not even a keyed
        # collapse on the write path) and reads fold post-images.
        self.merge_on_read = merge_on_read
        # "extra" is the residual map column — folded as a map by
        # reconstruct_post_images, never a string delta target itself
        self.delta_cols = tuple(
            c for c in self.payload
            if c not in self.key and c != ts_col and c != "extra"
        )
        # quarantine (dead-letter path): a malformed event — null key or
        # null seq on a non-marker row — would otherwise hash to a null
        # bucket and poison the table layout (bucket=__HIVE_DEFAULT__
        # breaks the int-parsed dir listing every read depends on).
        # Opt-in because it costs one extra Spark job per epoch; when on,
        # bad rows land in _quarantine/epoch-N (idempotent overwrite on
        # replay) and the epoch's lineage records the count.
        self.quarantine = quarantine
        self._payload_schema = payload_schema
        self.data_dir = os.path.join(root, "data")
        self.commits_dir = os.path.join(root, "_commits")
        self.metrics_dir = os.path.join(root, "_metrics")
        self.quarantine_dir = os.path.join(root, "_quarantine")
        for d in (self.data_dir, self.commits_dir, self.metrics_dir):
            os.makedirs(d, exist_ok=True)
        self._recover()

    def _aside_dir(self, epoch_id: int) -> str:
        return os.path.join(self.root, f"_aside-epoch-{epoch_id}")

    def _retain_dir(self, epoch_id: int) -> str:
        return os.path.join(self.root, f"_retain-epoch-{epoch_id}")

    def _retained_epochs(self) -> set[int]:
        out = set()
        for entry in os.listdir(self.root):
            if entry.startswith("_retain-epoch-"):
                out.add(int(entry[len("_retain-epoch-"):]))
        return out

    def _retain_aside(self, epoch_id: int) -> None:
        """Promote a committed epoch's aside to the retention set and
        prune beyond the window. Idempotent; crash-safe (a replay finds
        either the aside or the retain dir, never neither)."""
        aside, retain = self._aside_dir(epoch_id), self._retain_dir(epoch_id)
        if os.path.isdir(aside):
            shutil.rmtree(retain, ignore_errors=True)
            os.replace(aside, retain)
        elif not os.path.isdir(retain):
            # epoch only created new buckets: empty pre-image, but the
            # marker dir must exist so the window check can tell
            # "retained, nothing to restore" from "expired"
            os.makedirs(retain, exist_ok=True)
        for e in sorted(self._retained_epochs())[: -self.cow_retain_epochs]:
            shutil.rmtree(self._retain_dir(e), ignore_errors=True)

    def _recover(self) -> None:
        """Undo interrupted epochs (crash-safe swap, see module doc).

        For every ``_aside-epoch-<n>``: if epoch n committed, the aside
        is garbage (crash between marker and cleanup) — delete it; if
        uncommitted, the epoch died mid-swap — restore each aside bucket
        over whatever half-swapped state exists, so the table is exactly
        its pre-epoch image and the replay re-merges onto it. Stale
        ``_tmp-epoch-*`` dirs are always disposable.
        """
        for entry in os.listdir(self.root):
            path = os.path.join(self.root, entry)
            if entry.startswith("_tmp-epoch-"):
                shutil.rmtree(path, ignore_errors=True)
            elif entry.startswith("_inflight-epoch-"):
                # merge-on-read append died mid-move: delete exactly this
                # epoch's files (prefix-named) so the replay re-appends
                epoch = int(entry[len("_inflight-epoch-"):])
                if not self.is_committed(epoch):
                    with open(path) as f:
                        marked = [int(x) for x in f.read().split(",") if x]
                    prefix = f"epoch{epoch}-"
                    for b in marked:
                        bdir = os.path.join(self.data_dir, f"bucket={b}")
                        if not os.path.isdir(bdir):
                            continue
                        for fn in os.listdir(bdir):
                            if fn.startswith(prefix):
                                os.remove(os.path.join(bdir, fn))
                os.remove(path)
            elif entry.startswith("_aside-epoch-"):
                epoch = int(entry[len("_aside-epoch-"):])  # may be negative
                if not self.is_committed(epoch):
                    for bdir in os.listdir(path):
                        dst = os.path.join(self.data_dir, bdir)
                        shutil.rmtree(dst, ignore_errors=True)
                        os.replace(os.path.join(path, bdir), dst)
                    shutil.rmtree(path, ignore_errors=True)
                elif (
                    self.cow_retain_epochs > 0
                    and not self.merge_on_read
                    and epoch >= 0
                ):
                    # crash landed between the commit marker and the
                    # retention move: finish the move instead of
                    # discarding the pre-image
                    self._retain_aside(epoch)
                else:
                    shutil.rmtree(path, ignore_errors=True)

    # -- reads ---------------------------------------------------------
    def read(self, as_of_epoch: int | None = None) -> DataFrame:
        """Current materialized state (tombstones filtered).

        ``as_of_epoch`` (merge-on-read tables only): snapshot time
        travel — the state as of that committed epoch, the Iceberg
        ``VERSION AS OF`` analogue. MoR keeps every epoch's run files
        until compaction, so history is already on disk: restrict the
        scan to runs with epoch <= E and apply the drop floor AS
        RECORDED in E's commit marker (not today's — a later collection
        drop must not erase the snapshot). CoW tables raise unless built
        with ``cow_retain_epochs > 0``, which keeps the last N epochs'
        aside pre-images and reconstructs snapshots inside that window
        (refusing loudly beyond it). Also raises on tables that have
        compacted (runs were merged; travel below the compaction point
        would silently resurrect pre-compaction rows — refuse loudly
        instead).
        """
        raw = self._read_raw(as_of_epoch=as_of_epoch)
        if raw is None:
            return self.spark.createDataFrame([], self._state_schema()).select(*self.payload)
        return raw.filter(F.col("op") != "delete").select(*self.payload)

    def read_where(self, keys_df: DataFrame, col: str) -> DataFrame:
        """``read()`` restricted to the key values in ``keys_df[col]``,
        with the restriction applied BELOW the merge-on-read run
        collapse (see ``_read_raw``'s ``semi_filter``): a per-epoch
        gate probing a batch-bounded key set pays a |matching rows|
        collapse, never a full-table one. ``col`` must be part of the
        table key (group-preserving). On copy-on-write state this is
        just read-then-semi-join (no collapse to push below).

        When ``col`` is the table's bucket key, directory-level pruning
        applies too: the probe keys' bucket ids (a collect bounded by
        n_buckets, computed from the keys — metadata, not data) restrict
        the scan to their buckets, the same pruning lookup_many does."""
        buckets = None
        if col == self.bucket_key:
            buckets = sorted(
                r[0]
                for r in keys_df.select(
                    F.pmod(F.xxhash64(col), F.lit(self.n_buckets))
                    .cast("int").alias("b")
                ).distinct().collect()
            )
            if not buckets:
                return self.spark.createDataFrame(
                    [], self._state_schema()
                ).select(*self.payload)
        raw = self._read_raw(buckets=buckets, semi_filter=(keys_df, col))
        if raw is None:
            return self.spark.createDataFrame(
                [], self._state_schema()
            ).select(*self.payload)
        return raw.filter(F.col("op") != "delete").select(*self.payload)

    def read_with_lineage(self, include_tombstones: bool = True) -> DataFrame:
        """Materialized state INCLUDING the order/op lineage columns
        (``state_cols`` = payload + seq + op). The seed source for
        runtime resubscribe (FanoutSink.add_subscription): rows keep
        their TRUE seqs, so LWW resolves them exactly against both a
        resumed table's stale rows and future live events — a
        negative-seq snapshot seed cannot. Tombstones are included by
        default (a key deleted during an unsubscribe gap must delete in
        the resumed table too); note compaction past a tombstone's
        horizon removes it, downgrading a later gap-fill for that key."""
        raw = self._read_raw()
        if raw is None:
            return self.spark.createDataFrame([], self._state_schema())
        out = raw.select(*self.state_cols)
        if not include_tombstones:
            out = out.filter(F.col("op") != "delete")
        return out

    # -- point reads (bucket-pruned) ----------------------------------
    def bucket_of(self, key_value) -> int:
        """The bucket directory this key's rows live in, computed
        DRIVER-SIDE with zero Spark jobs: a pure-Python XXH64 (seed 42,
        functions/xxh64.py) reproduces ``pmod(xxhash64(key), n_buckets)``
        — the exact layout expression at :meth:`_bucket_col`. Parity
        with the JVM hash is pinned by tests/test_lookup.py."""
        from aktuell_spark.functions.xxh64 import spark_bucket

        dtype = next(
            (f.dataType.simpleString() for f in self._state_schema().fields
             if f.name == self.bucket_key),
            "string",
        )
        return spark_bucket(key_value, self.n_buckets, dtype)

    def lookup(self, key_value, as_of_epoch: int | None = None) -> DataFrame:
        """Point read: every live row whose ``bucket_key`` equals
        ``key_value`` (for transcripts: one conversation's turns).

        Scale shape: the scan lists and reads exactly ONE of the
        ``n_buckets`` directories (O(table/n_buckets) instead of
        O(table)), and the equality predicate is pushed into the
        parquet scan so row-group min/max stats skip files within the
        bucket — after sort-order compaction each bucket file is
        key-ordered, so a point read touches ~one row group. Both
        halves are plan-asserted (tests/test_lookup.py: single bucket
        path + PushedFilters). This is the Iceberg bucket-partition-
        pruned point query; the reference analogue is the client
        querying one collection document by key
        (/root/reference/pkg/client/client.go:169-192).
        """
        return self._lookup_buckets(
            {self.bucket_of(key_value)}, [key_value], as_of_epoch
        )

    def lookup_many(self, key_values, as_of_epoch: int | None = None) -> DataFrame:
        """Batched point read: like :meth:`lookup` but prunes to the
        UNION of the keys' buckets — k keys touch at most min(k,
        n_buckets) directories. The key-set membership filter stays a
        literal IN-list (pushed to parquet as ``In``), never a join."""
        vals = list(dict.fromkeys(key_values))
        if not vals:
            return self.read().limit(0)
        return self._lookup_buckets(
            {self.bucket_of(v) for v in vals}, vals, as_of_epoch
        )

    def _lookup_buckets(self, buckets, vals, as_of_epoch) -> DataFrame:
        pred = (
            F.col(self.bucket_key).isin(vals)
            if len(vals) > 1 else F.col(self.bucket_key) == F.lit(vals[0])
        )
        if as_of_epoch is not None and not self.merge_on_read:
            # CoW retention reconstructs from aside dirs; bucket-pruning
            # that path is not wired — keep correctness, lose pruning
            raw = self._read_raw(as_of_epoch=as_of_epoch)
        else:
            # the key predicate goes BELOW the merge-on-read collapse
            # (pre_pred): it is key-determined, so dropping whole key
            # groups first cannot change any surviving row — and only
            # the looked-up keys' rows pay the run-collapse shuffle
            # instead of every row of the touched buckets. It lands
            # directly above the parquet scan, so PushedFilters carries
            # it into row-group skipping as before.
            raw = self._read_raw(
                buckets=sorted(buckets), as_of_epoch=as_of_epoch,
                pre_pred=pred,
            )
        if raw is None:
            return self.read().limit(0)
        return (
            raw.filter(pred)
            .filter(F.col("op") != "delete")
            .select(*self.payload)
        )

    def _changes_cow(
        self, since_epoch: int, until_epoch: int | None
    ) -> DataFrame:
        """Per-key net changes in (since, until] on a CoW table with
        epoch retention: state-at-until ANTI-JOIN state-at-since on
        (bucket, key, seq). Sound because CoW state is already the LWW
        collapse (one row per live key) and tombstones stay in the
        bucket files until compaction — so a changed key surfaces
        exactly its final image in the range, a deleted key surfaces
        its tombstone with the delete's real seq, and an untouched key
        (same seq on both sides) cancels. IO is bounded by the
        sidecar-recorded touched buckets of the range, not table size;
        the diff is one broadcast-or-shuffle join per changed bucket
        set. Refuses outside the retention window or past compaction
        (delegated to the as-of reconstruction)."""
        committed = self._committed_epochs()
        real = sorted(e for e in committed if e >= 0)
        hi = until_epoch if until_epoch is not None else (
            max(real) if real else since_epoch
        )
        if until_epoch is not None and until_epoch not in committed:
            raise ValueError(f"until_epoch {until_epoch} is not committed")
        if since_epoch >= 0 and since_epoch not in committed:
            raise ValueError(f"since_epoch {since_epoch} is not committed")
        rng = [e for e in real if since_epoch < e <= hi]
        cols = [*self.state_cols, "bucket"]
        if self.partial_updates:
            cols += ["updated_fields", "removed_fields"]

        def _empty():
            e = (
                self.spark.createDataFrame([], self._state_schema())
                .withColumn("bucket", F.lit(0))
            )
            if self.partial_updates:
                e = e.withColumn(
                    "updated_fields", F.lit(None).cast("map<string,string>")
                ).withColumn(
                    "removed_fields", F.lit(None).cast("array<string>")
                )
            return e.select(*cols).limit(0)

        if not rng:
            return _empty()
        touched: set[int] = set()
        for e in rng:
            try:
                with open(
                    os.path.join(self.metrics_dir, f"epoch-{e}.json")
                ) as f:
                    touched |= set(json.load(f).get("touched_buckets", []))
            except (OSError, ValueError) as exc:
                raise ValueError(
                    f"changes() cannot bound the diff: metrics sidecar "
                    f"for epoch {e} is missing or corrupt ({exc})"
                ) from exc
        if not touched:
            return _empty()
        new = (
            self._read_raw(buckets=sorted(touched))
            if hi == max(real)
            else self._read_raw(buckets=sorted(touched), as_of_epoch=hi)
        )
        if new is None:
            return _empty()
        old = (
            self._read_raw(buckets=sorted(touched), as_of_epoch=since_epoch)
            if since_epoch in committed
            else None
        )
        missing = [c for c in cols if c not in new.columns]
        if missing:
            # non-partial state never carries the delta-map columns;
            # emit them null so the feed schema matches MoR changes()
            new = new.withColumn(
                "updated_fields", F.lit(None).cast("map<string,string>")
            ).withColumn("removed_fields", F.lit(None).cast("array<string>"))
        new = new.select(*cols)
        if old is None:
            return new
        keys = ["bucket", *self.key, self.order_col]
        return new.join(old.select(*keys), keys, "left_anti")

    def changes(self, since_epoch: int, until_epoch: int | None = None) -> DataFrame:
        """Incremental change read (Iceberg incremental-scan analogue):
        the per-key net changes committed in epochs (since, until] of a
        merge-on-read table — the table's OWN downstream change feed,
        so a consumer can tail this sink the way this sink tails its
        source. Each MoR run file already holds the epoch's per-key
        last-writer-wins collapse, so the scan reads exactly those runs
        (no state diffing); a key touched in several epochs of the
        range collapses to its final image in the range. Deletes are
        KEPT (op='delete' rows are the point of a change feed).
        CoW tables built with ``cow_retain_epochs > 0`` serve the same
        feed inside their retention window by diffing adjacent retained
        states per bucket (tombstones are physically kept in CoW
        buckets until compaction, so deletes carry their TRUE seqs);
        plain CoW and post-compaction raise, same as time travel.
        """
        if not self.merge_on_read:
            if self.cow_retain_epochs > 0:
                return self._changes_cow(since_epoch, until_epoch)
            raise ValueError(
                "changes() requires merge_on_read=True (copy-on-write "
                "epochs rewrite buckets; per-epoch deltas are not "
                "kept) — or a CoW table built with cow_retain_epochs "
                "> 0 for a bounded recent-epoch window"
            )
        committed = self._committed_epochs()
        if since_epoch < self._expire_floor(committed) - 1:
            # the range must start at or after the fold point: base
            # files are not epoch-scoped, so epochs at or below the
            # cutoff no longer exist as per-epoch deltas
            raise ValueError(
                "changes() unavailable below the compaction/expiry "
                "cutoff (those runs were folded away)"
            )
        hi = until_epoch if until_epoch is not None else max(
            (e for e in committed if e >= 0), default=since_epoch
        )
        paths = []
        for b in sorted(self._present_buckets()):
            bdir = os.path.join(self.data_dir, f"bucket={b}")
            for fn in sorted(os.listdir(bdir)):
                if not (fn.endswith(".parquet") and fn.startswith("epoch")):
                    continue
                ep = int(fn[len("epoch"):fn.rfind("-")])
                if ep in committed and since_epoch < ep <= hi:
                    paths.append(os.path.join(bdir, fn))
        cols = [*self.state_cols, "bucket"]
        mor_partial = self.partial_updates
        if mor_partial:
            cols += ["updated_fields", "removed_fields"]
        if not paths:
            empty = (
                self.spark.createDataFrame([], self._state_schema())
                .withColumn("bucket", F.lit(0))
            )
            if mor_partial:
                empty = empty.withColumn(
                    "updated_fields", F.lit(None).cast("map<string,string>")
                ).withColumn(
                    "removed_fields", F.lit(None).cast("array<string>")
                )
            return empty.select(*cols).limit(0)
        df = (
            self.spark.read.option("basePath", self.data_dir)
            # evolved tables: older runs lack later-added columns; merge
            # footers like read() so the range scan unions cleanly
            .option("mergeSchema", "true")
            .parquet(*paths)
        )
        missing = [c for c in self.state_cols if c not in df.columns]
        if missing:
            schema = {f.name: f.dataType for f in self._state_schema().fields}
            for c in missing:
                df = df.withColumn(c, F.lit(None).cast(schema[c]))
        df = df.select(*cols)
        # collapse across the range: one row per key, the newest write
        df = df.repartition(
            self._write_parallelism(self.n_buckets), "bucket"
        )
        if not mor_partial:
            return collapse_last_writer_wins(
                df, key=("bucket", *self.key), order_col=self.order_col
            )
        # partial-updates tables: a plain LWW collapse would keep only the
        # NEWEST delta row for a key touched in several epochs of the
        # range, silently dropping earlier epochs' updated_fields /
        # removed_fields. Per-key net change instead: keys with a full
        # image in the range fold to the reconstructed post-image (delta
        # maps nulled — the row IS the new state); delta-only keys fold
        # their chains into ONE net partial via merge_delta_chains, so a
        # downstream partial-updates sink applying the feed converges to
        # the same state as applying every epoch one by one.
        from aktuell_spark.operators.cdc import (
            is_partial_update,
            merge_delta_chains,
            reconstruct_post_images,
        )

        keyb = ["bucket", *self.key]
        part = is_partial_update(df)
        base_keys = df.filter(~part).select(*keyb).distinct()
        full_side = reconstruct_post_images(
            df.join(base_keys, on=keyb, how="left_semi"),
            key=keyb,
            order_col=self.order_col,
            delta_cols=self.delta_cols,
            ts_col=self.ts_col,
        ).withColumn(
            "updated_fields", F.lit(None).cast("map<string,string>")
        ).withColumn(
            "removed_fields", F.lit(None).cast("array<string>")
        )
        delta_side = merge_delta_chains(
            df.filter(part).join(base_keys, on=keyb, how="left_anti"),
            key=keyb,
            order_col=self.order_col,
            ts_col=self.ts_col,
        )
        return full_side.select(*cols).unionByName(delta_side.select(*cols))

    def _committed_epochs(self) -> set[int]:
        out = set()
        for c in os.listdir(self.commits_dir):
            try:
                out.add(int(c))
            except ValueError:
                pass
        return out

    def _expire_floor(self, committed: set[int]) -> int:
        """Lowest epoch still time-travelable: the max ``expire_cutoff``
        recorded by compaction/expiry commits, +1. Full compactions and
        legacy markers without a recorded cutoff fold EVERYTHING —
        returned as a floor above every real epoch (refuse all)."""
        floor = -(1 << 62)  # no compaction: everything travelable
        for ep in committed:
            if ep > self.COMPACT_EPOCH_BASE:
                continue
            try:
                with open(os.path.join(self.commits_dir, str(ep))) as f:
                    rec = json.loads(f.read())
                cutoff = rec["expire_cutoff"]
            except (ValueError, OSError, KeyError):
                cutoff = (1 << 62)  # legacy marker: fold-all
            floor = max(floor, cutoff + 1)
        return floor

    def _floor_at_epoch(self, committed: set[int], as_of_epoch: int) -> int | None:
        """Drop floor recorded in the newest commit marker <= E; markers
        predating floor recording fall back to the current floor
        (conservative: never resurrects dropped rows)."""
        for ep in sorted((e for e in committed if e >= 0), reverse=True):
            if ep > as_of_epoch:
                continue
            try:
                with open(os.path.join(self.commits_dir, str(ep))) as f:
                    rec = json.loads(f.read())
                return rec.get("floor")
            except (ValueError, OSError):
                return self.drop_floor()  # legacy "ok" marker
        return None

    def _read_raw(
        self,
        buckets: list[int] | None = None,
        as_of_epoch: int | None = None,
        semi_filter: tuple[DataFrame, str] | None = None,
        pre_pred=None,
    ) -> DataFrame | None:
        """``semi_filter=(keys_df, col)``: left-semi filter on
        ``col`` applied BEFORE the merge-on-read collapse, so a probe
        restricted to a key subset collapses only that subset's rows
        instead of the whole bucket scan (the collapse is per-key LWW
        and ``col`` must be part of the key, so dropping whole key
        groups up front cannot change any surviving row). Ignored
        semantics-free on copy-on-write state (no collapse; the caller
        filters after). ``pre_pred`` is the literal-predicate cousin
        (same group-preservation contract, but a plain Column pushed
        into the parquet scan)."""
        if as_of_epoch is not None and not self.merge_on_read:
            if self.cow_retain_epochs > 0:
                out = self._read_cow_as_of(
                    as_of_epoch,
                    buckets=set(buckets) if buckets is not None else None,
                )
                if out is not None and pre_pred is not None:
                    out = out.filter(pre_pred)
                if out is not None and semi_filter is not None:
                    keys_df, col = semi_filter
                    out = out.join(keys_df.select(col), col, "left_semi")
                return out
            raise ValueError(
                "as_of_epoch requires merge_on_read=True (copy-on-write "
                "epochs rewrite buckets in place; history is not kept) — "
                "or a CoW table built with cow_retain_epochs > 0 for a "
                "bounded recent-epoch window"
            )
        present = {
            int(e.split("=", 1)[1])
            for e in os.listdir(self.data_dir)
            if e.startswith("bucket=")
        }
        if buckets is not None:
            present &= set(buckets)
        if not present:
            return None
        # concrete dir list (not a glob): dir-level pruning — only touched
        # buckets are scanned, the Iceberg-partition-pruning equivalent
        if self.merge_on_read:
            # snapshot isolation for LSM runs: an epoch's files land in
            # the live dirs BEFORE its commit marker, so filter reads to
            # files of committed epochs (epoch id is in the filename) —
            # a racing reader can no longer observe rows that recovery
            # would roll back. Compacted files (part-*) are post-swap.
            committed = set()
            for c in os.listdir(self.commits_dir):
                try:
                    committed.add(int(c))
                except ValueError:
                    pass
            if as_of_epoch is not None and as_of_epoch < self._expire_floor(
                committed
            ):
                raise ValueError(
                    "as_of_epoch unavailable: runs at or below the "
                    "compaction/expiry cutoff were folded away"
                )
            paths = []
            for b in sorted(present):
                bdir = os.path.join(self.data_dir, f"bucket={b}")
                for fn in sorted(os.listdir(bdir)):
                    if not fn.endswith(".parquet"):
                        continue
                    if fn.startswith("epoch"):
                        ep = int(fn[len("epoch"):fn.rfind("-")])
                        if ep not in committed:
                            continue
                        if as_of_epoch is not None and ep > as_of_epoch:
                            continue
                    paths.append(os.path.join(bdir, fn))
            if not paths:
                return None
        else:
            paths = [os.path.join(self.data_dir, f"bucket={b}") for b in sorted(present)]
        reader = self.spark.read.option("basePath", self.data_dir)
        if self.merge_on_read:
            # schema evolution (Iceberg add-column analogue): a payload
            # column added mid-stream exists only in newer runs; without
            # footer-merging the union read throws on the older files.
            # mergeSchema reads every footer (metadata, not data) and
            # fills missing columns with null — the cast below then pins
            # the declared payload schema. CoW doesn't need it (every
            # epoch rewrites whole buckets under the current schema).
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*paths)
        mor_partial = self.merge_on_read and self.partial_updates
        extra = ("updated_fields", "removed_fields") if mor_partial else ()
        missing = [c for c in self.state_cols if c not in df.columns]
        if missing and self.merge_on_read:
            # table declared with a column no run carries yet
            schema = {f.name: f.dataType for f in self._state_schema().fields}
            for c in missing:
                df = df.withColumn(c, F.lit(None).cast(schema[c]))
        df = df.select(*self.state_cols, *extra, "bucket")
        if pre_pred is not None:
            df = df.filter(pre_pred)
        if semi_filter is not None:
            # no broadcast hint: AQE broadcasts a small key set and
            # falls back to a shuffle semi-join for a huge one (the
            # collapse below shuffles anyway, so nothing is lost)
            keys_df, col = semi_filter
            df = df.join(keys_df.select(col), col, "left_semi")
        if self.merge_on_read:
            # epoch files are un-merged LSM runs: collapse to one row per
            # key at read time; rows at or below the drop floor are dead
            # (physically removed only at compaction). Bucket-first
            # single-shuffle shape: repartition on bucket, then the
            # (bucket, key) aggregation is partition-local and the
            # output stays bucket-partitioned (compact() writes it with
            # no further exchange).
            floor = (
                self.drop_floor()
                if as_of_epoch is None
                else self._floor_at_epoch(committed, as_of_epoch)
            )
            if floor is not None:
                df = df.filter(F.col(self.order_col) > floor)
            df = df.repartition(self._write_parallelism(len(present)), "bucket")
            if mor_partial:
                from aktuell_spark.operators.cdc import reconstruct_post_images

                df = reconstruct_post_images(
                    df,
                    key=("bucket", *self.key),
                    order_col=self.order_col,
                    delta_cols=self.delta_cols,
                    ts_col=self.ts_col,
                )
            else:
                df = collapse_last_writer_wins(
                    df, key=("bucket", *self.key), order_col=self.order_col
                )
        return df

    def _read_cow_as_of(
        self, as_of_epoch: int, buckets: set[int] | None = None
    ) -> DataFrame | None:
        """Reconstruct a CoW snapshot from retained epoch asides.

        State at epoch E, per bucket: if some later epoch touched the
        bucket, the FIRST such epoch's aside holds exactly the bucket's
        image at E (the pre-epoch copy the swap set aside); otherwise
        the live bucket IS the image at E. A bucket first created after
        E is skipped (it did not exist at E). Requires every committed
        epoch in (E, head] to still be in the retention window; refuses
        loudly otherwise — and refuses below any compaction, which
        rewrites buckets outside the epoch protocol."""
        committed = self._committed_epochs()
        if as_of_epoch not in committed:
            raise ValueError(f"epoch {as_of_epoch} is not committed")
        if any(e <= self.COMPACT_EPOCH_BASE for e in committed):
            raise ValueError(
                "as_of_epoch unavailable on a compacted CoW table "
                "(compaction rewrites buckets outside the epoch asides)"
            )
        later = sorted(e for e in committed if e > as_of_epoch and e >= 0)
        retained = self._retained_epochs()
        missing = [e for e in later if e not in retained]
        if missing:
            raise ValueError(
                f"as_of_epoch {as_of_epoch} is outside the CoW retention "
                f"window (epochs {missing} expired; retain_epochs="
                f"{self.cow_retain_epochs})"
            )
        touched_by: dict[int, set[int]] = {}
        for e in later:
            try:
                with open(os.path.join(self.metrics_dir, f"epoch-{e}.json")) as f:
                    touched_by[e] = set(json.load(f).get("touched_buckets", []))
            except (OSError, ValueError) as exc:
                # a later committed epoch whose touched-bucket record
                # cannot be read means the pre-image chain is broken:
                # defaulting to "touched nothing" would silently serve
                # CURRENT bucket contents as history — refuse loudly,
                # per this method's own time-travel contract
                raise ValueError(
                    f"cannot reconstruct epoch {as_of_epoch}: metrics "
                    f"sidecar for later committed epoch {e} is missing "
                    f"or corrupt ({exc})"
                ) from exc
        all_buckets: set[int] = set(self._present_buckets())
        for e in later:
            rdir = self._retain_dir(e)
            for entry in os.listdir(rdir):
                if entry.startswith("bucket="):
                    all_buckets.add(int(entry.split("=", 1)[1]))
        if buckets is not None:
            # caller already knows which buckets can differ (e.g. the
            # changes() diff) — skip reconstructing the rest
            all_buckets &= buckets
        pieces = []
        for b in sorted(all_buckets):
            first = min((e for e in later if b in touched_by[e]), default=None)
            if first is None:
                p = os.path.join(self.data_dir, f"bucket={b}")
            else:
                p = os.path.join(self._retain_dir(first), f"bucket={b}")
            if not os.path.isdir(p):
                continue  # bucket born after E
            pieces.append(
                self.spark.read.parquet(p).withColumn("bucket", F.lit(b))
            )
        if not pieces:
            return None
        df = pieces[0]
        for piece in pieces[1:]:
            df = df.unionByName(piece)
        df = df.select(*self.state_cols, "bucket")
        floor = self._floor_at_epoch(committed, as_of_epoch)
        if floor is not None:
            df = df.filter(F.col(self.order_col) > floor)
        return df

    def _state_schema(self):
        import pyspark.sql.types as T

        if self._payload_schema is not None:
            fields = [f for f in self._payload_schema.fields if f.name in self.payload]
            fields.append(T.StructField(self.order_col, T.LongType(), True))
            fields.append(T.StructField("op", T.StringType(), True))
            return T.StructType(fields)
        from aktuell_spark.schemas import CHANGE_SCHEMA

        names = set(self.state_cols)
        return T.StructType([f for f in CHANGE_SCHEMA.fields if f.name in names])

    # -- exactly-once merge -------------------------------------------
    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(os.path.join(self.commits_dir, str(epoch_id)))

    def _bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.bucket_key)), F.lit(self.n_buckets)).cast("int")

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body: idempotent MERGE of one micro-batch."""
        if self.is_committed(epoch_id):
            return
        # in-process retry of a failed epoch reuses this object — roll
        # back any half-swapped state before re-merging (cheap listdir)
        self._recover()
        t0 = time.time()
        if self.quarantine:
            batch_df = self._quarantine_split(batch_df, epoch_id)
        if self.partial_updates:
            self._merge_with_partials(batch_df, epoch_id, t0)
            return
        # ---- job 1 (often the ONLY Spark job of the epoch): filter the
        # stored drop floor, collapse in-batch chains, write bucketed tmp.
        # Touched buckets, row counts and collection-op markers then come
        # FREE from the written files (dir listing + parquet footers) —
        # no separate driver action, no cache of the raw batch.
        # No dropDuplicates(seq) pre-pass: redelivered events carry the
        # same (key, seq, payload), so the max_by collapse already picks
        # exactly one of them — an explicit dedupe would only add a
        # second full shuffle (measured ~half the merge cost).
        floor = self.drop_floor()
        phases: dict[str, float] = {}
        op = F.col("op")
        b = batch_df.select(*self.state_cols)
        marker = op.isin("drop", "rename")
        if floor is not None:
            # markers are EXEMPT from the floor filter: a retried drop
            # epoch has already persisted its floor, and filtering the
            # marker out (seq > floor is false at seq == floor) would
            # skip the present-bucket truncation on the replay — old
            # rows in untouched buckets would survive forever
            b = b.filter(marker | (F.col(self.order_col) > floor))
        b = b.withColumn(
            "bucket", F.when(marker, F.lit(-1)).otherwise(self._bucket_col())
        ).withColumn(
            # markers collapse per op (not per sentinel key): a batch may
            # carry both a drop and a rename and must keep both
            "_mk", F.when(marker, op).otherwise(F.lit(""))
        )
        if not self.merge_on_read:
            present0 = self._present_buckets()
            if present0:
                # table already has state: the single-pass path folds
                # batch and existing buckets in ONE collapse+write (the
                # write-tmp-then-merge path paid two full write passes)
                self._merge_single_pass(b, epoch_id, t0, phases, set(present0))
                return
        # ONE shuffle for collapse + bucketed write: repartition by
        # bucket FIRST, then group by (bucket, key). hash(bucket)
        # co-locates every row of a key (bucket is a function of the
        # bucket column of the key), so Catalyst's EnsureRequirements
        # sees ClusteredDistribution(bucket, key...) already satisfied —
        # the aggregation is partition-local and the write needs no
        # second repartition. The old collapse-then-repartition plan
        # moved the full payload through two exchanges; measured 1.6x
        # slower at 18M events.
        b = b.repartition(self._write_parallelism(self.n_buckets), "bucket")
        if self.merge_on_read:
            # LSM runs don't need the in-batch LWW collapse: EVERY read
            # of a MoR table already collapses per key across runs, so
            # in-run duplicates fold there identically — skipping the
            # aggregation keeps job 1 at shuffle+write only. (Runs grow
            # by the in-batch duplicate rate until compaction; CoW keeps
            # the collapse because its bucket files ARE the state.)
            collapsed = b.drop("_mk")
        else:
            collapsed = collapse_last_writer_wins(
                b, key=("bucket", *self.key, "_mk"), order_col=self.order_col
            ).drop("_mk")
        tmp = os.path.join(self.root, f"_tmp-epoch-{epoch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            collapsed.write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        phases["job1_write_sec"] = round(time.time() - t0, 3)

        t1 = time.time()
        touched, n_rows, batch_drop = self._tmp_stats(tmp, epoch_id)
        phases["footer_stats_sec"] = round(time.time() - t1, 3)
        new_floor = self._advance_drop_floor(batch_drop)
        if not touched and batch_drop is None:
            shutil.rmtree(tmp, ignore_errors=True)
            self._commit(epoch_id, rows=0, buckets=[], t0=t0, phases=phases)
            return
        if self.merge_on_read:
            # LSM append: the collapsed batch files become this epoch's
            # run inside each bucket dir. No job 2 ever — drops are
            # handled by the (already advanced) floor at read time.
            self._append_epoch_files(tmp, touched, n_rows, epoch_id, t0, phases)
            return

        present = set(self._present_buckets())
        # a GOVERNING drop (this batch's marker is the current floor —
        # first application or a retried epoch) truncates every existing
        # bucket; a stale redelivered marker below the floor is subsumed
        governing_drop = batch_drop is not None and batch_drop == new_floor
        all_touched = sorted(set(touched) | present) if governing_drop else touched
        if not all_touched:  # pure-marker batch into an empty table
            shutil.rmtree(tmp, ignore_errors=True)
            self._commit(epoch_id, rows=0, buckets=[], t0=t0)
            return

        t2 = time.time()
        if (set(all_touched) & present) or governing_drop:
            # ---- job 2 (only when existing buckets overlap or a drop
            # arrived): fold existing state in. Reads the already-
            # collapsed tmp (smaller than the raw batch), one keyed
            # shuffle over (existing ∪ batch) — in-batch chains and the
            # cross-epoch MERGE fold together.
            tmp_data = self._read_tmp(tmp, touched) if touched else None
            existing = self._read_raw(buckets=all_touched)
            if tmp_data is None and existing is None:  # unreachable: all_touched nonempty
                shutil.rmtree(tmp, ignore_errors=True)
                self._commit(epoch_id, rows=0, buckets=[], t0=t0)
                return
            if tmp_data is None:
                src = existing
            elif existing is None:
                src = tmp_data
            else:
                src = existing.unionByName(tmp_data)
            if new_floor is not None:
                src = src.filter(F.col(self.order_col) > new_floor)
            # same single-shuffle shape as job 1: partition by bucket,
            # partition-local collapse, direct bucketed write
            src = src.repartition(self._write_parallelism(len(all_touched)), "bucket")
            merged = collapse_last_writer_wins(
                src, key=("bucket", *self.key), order_col=self.order_col
            )
            tmp2 = tmp + ".merged"
            shutil.rmtree(tmp2, ignore_errors=True)
            (
                merged.write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(tmp2)
            )
            shutil.rmtree(tmp, ignore_errors=True)
            tmp = tmp2
            phases["job2_merge_sec"] = round(time.time() - t2, 3)
            # n_rows stays the collapsed-batch count: merged_rows lineage
            # means "changes processed this epoch" on EVERY path (fresh,
            # overlap, MoR, partial) — not post-merge table size, which
            # would re-count existing state each epoch
        self._swap_and_commit(tmp, all_touched, n_rows, epoch_id, t0, phases)

    def _merge_single_pass(
        self, b: DataFrame, epoch_id: int, t0: float,
        phases: dict, present: set[int],
    ) -> None:
        """Copy-on-write MERGE into a table with existing buckets, in
        ONE data pass over the batch: a per-bucket stats aggregate on
        the persisted batch (counts, distinct keys, marker seqs — no
        write) replaces the write-tmp-then-footer-stat job, and a
        single shuffle folds existing state and batch together into the
        swap image — where the former path wrote the collapsed batch to
        a tmp dir and then read it straight back for the merge job
        (two full write passes per epoch, measured ~0.6 s/epoch extra
        on the CDC bench). Fresh tables (no buckets yet) and
        merge-on-read keep the write-then-stat path: their single job
        IS the minimal plan, and the written files double as the stats
        source. ``merged_rows`` lineage stays the post-collapse count
        (distinct keys per bucket)."""
        b = b.persist()
        try:
            op, seq = F.col("op"), F.col(self.order_col)
            t1 = time.time()
            stats = b.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(*[F.col(k) for k in self.key]).alias("nk"),
                F.max(F.when(op == "drop", seq)).alias("dmax"),
                F.max(F.when(op == "rename", seq)).alias("rmax"),
            ).collect()
            phases["batch_stats_sec"] = round(time.time() - t1, 3)
            touched = sorted(r["bucket"] for r in stats if r["bucket"] != -1)
            n_rows = sum(r["nk"] for r in stats if r["bucket"] != -1)
            batch_drop = max(
                (r["dmax"] for r in stats if r["dmax"] is not None), default=None
            )
            rename_seq = max(
                (r["rmax"] for r in stats if r["rmax"] is not None), default=None
            )
            if rename_seq is not None:
                with open(
                    os.path.join(self.metrics_dir, f"rename-{epoch_id}.json"), "w"
                ) as f:
                    json.dump({"epoch": epoch_id, "rename_seq": rename_seq}, f)
            new_floor = self._advance_drop_floor(batch_drop)
            governing_drop = batch_drop is not None and batch_drop == new_floor
            all_touched = (
                sorted(set(touched) | present) if governing_drop else touched
            )
            if not all_touched:
                self._commit(epoch_id, rows=0, buckets=[], t0=t0, phases=phases)
                return
            t2 = time.time()
            ev = b.filter(~op.isin("drop", "rename")).drop("_mk")
            existing = self._read_raw(buckets=all_touched)
            src = ev if existing is None else existing.unionByName(ev)
            if new_floor is not None:
                src = src.filter(seq > new_floor)
            src = src.repartition(
                self._write_parallelism(len(all_touched)), "bucket"
            )
            merged = collapse_last_writer_wins(
                src, key=("bucket", *self.key), order_col=self.order_col
            )
            tmp = os.path.join(self.root, f"_tmp-epoch-{epoch_id}")
            shutil.rmtree(tmp, ignore_errors=True)
            merged.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
            phases["merge_write_sec"] = round(time.time() - t2, 3)
        finally:
            b.unpersist()
        self._swap_and_commit(tmp, all_touched, n_rows, epoch_id, t0, phases)

    # reserved (very negative) epoch-id space for compaction commits so
    # they share the crash-safe swap + recovery machinery
    COMPACT_EPOCH_BASE = -1_000_000

    def compact(
        self, tombstone_horizon: int, sort_within: tuple[str, ...] = ()
    ) -> dict:
        """Rewrite every bucket, dropping delete tombstones at or below
        ``tombstone_horizon`` (Iceberg analogue: rewrite_data_files +
        expiring delete files).

        ``sort_within``: cluster rows inside each bucket file by these
        columns (Iceberg's sort-order rewrite, the single-column cousin
        of z-ordering). Parquet stores per-row-group min/max stats; a
        sorted file makes them DISJOINT, so a point/range predicate on
        the sort key skips whole row groups at scan time. Cost is a
        partition-local sort during the rewrite (no extra shuffle —
        rows are already bucket-partitioned).

        Tombstones exist to neutralize redeliveries of pre-delete
        events. Once the source can no longer replay seqs <= horizon
        (its retention/checkpoint floor), those tombstones are dead
        weight: any future arrival has seq >= horizon >= tombstone seq,
        so it either re-deletes (harmless) or is a legitimately newer
        write that would win LWW anyway. Passing a horizon ahead of the
        source's replay floor is the caller's contract violation.

        Uses the same aside-swap + commit-marker protocol as epochs
        (reserved negative ids), so a crash mid-compaction recovers.
        Returns {"removed": n, "buckets": n, "rows": n}.
        """
        self._recover()
        t0 = time.time()
        present = self._present_buckets()
        if not present:
            return {"removed": 0, "buckets": 0, "rows": 0}
        prior = sum(
            1 for c in os.listdir(self.commits_dir)
            if int(c) <= self.COMPACT_EPOCH_BASE
        )
        cid = self.COMPACT_EPOCH_BASE - prior
        before = self._parquet_rows(self.data_dir)
        keep = self._read_raw().filter(
            (F.col("op") != "delete") | (F.col(self.order_col) > tombstone_horizon)
        )
        if self.merge_on_read and self.partial_updates:
            # compacted rows are full post-images; keep the delta columns
            # (as nulls) so compacted and fresh run files share a schema
            keep = keep.withColumn(
                "updated_fields", F.lit(None).cast("map<string,string>")
            ).withColumn("removed_fields", F.lit(None).cast("array<string>"))
        if not self.merge_on_read:
            # CoW rows come back scan-partitioned; co-locate per bucket.
            # (MoR reads are already bucket-partitioned by _read_raw.)
            keep = keep.repartition(self._write_parallelism(len(present)), "bucket")
        if sort_within:
            keep = keep.sortWithinPartitions(*sort_within)
        tmp = os.path.join(self.root, f"_tmp-epoch-{cid}")
        shutil.rmtree(tmp, ignore_errors=True)
        keep.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
        n_rows = self._parquet_rows(tmp)
        # record how far history folded: as-of/incremental reads above
        # the max epoch compacted here remain valid (= current state)
        top = max((e for e in self._committed_epochs() if 0 <= e), default=-1)
        self._swap_and_commit(tmp, present, n_rows, cid, t0,
                              marker_extra={"expire_cutoff": top})
        return {"removed": before - n_rows, "buckets": len(present), "rows": n_rows}

    def expire_runs(self, keep_after_epoch: int) -> dict:
        """Fold runs with epoch <= ``keep_after_epoch`` into per-bucket
        base files, KEEPING newer runs intact (Iceberg expire_snapshots
        analogue): time travel and ``changes()`` stay valid for epochs
        after the cutoff, while history below it stops accumulating
        read amplification and disk.

        The base is the collapsed state AS OF the cutoff — including
        delete tombstones (they must keep neutralizing replays) and the
        cutoff's drop floor. Newer run files are copied into the tmp
        image and the whole bucket swaps under the standard aside
        protocol, so a crash at any point recovers; the compaction
        marker records the cutoff for the as-of/changes guards.
        """
        if not self.merge_on_read:
            raise ValueError("expire_runs requires merge_on_read=True")
        self._recover()
        t0 = time.time()
        committed = self._committed_epochs()
        if keep_after_epoch < self._expire_floor(committed):
            raise ValueError("cutoff below an earlier compaction/expiry")
        present = self._present_buckets()
        if not present:
            return {"buckets": 0, "rows": 0, "kept_runs": 0}
        prior = sum(
            1 for c in os.listdir(self.commits_dir)
            if int(c) <= self.COMPACT_EPOCH_BASE
        )
        cid = self.COMPACT_EPOCH_BASE - prior
        base = self._read_raw(as_of_epoch=keep_after_epoch)
        if self.partial_updates and base is not None:
            base = base.withColumn(
                "updated_fields", F.lit(None).cast("map<string,string>")
            ).withColumn("removed_fields", F.lit(None).cast("array<string>"))
        tmp = os.path.join(self.root, f"_tmp-epoch-{cid}")
        shutil.rmtree(tmp, ignore_errors=True)
        if base is not None:
            base.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
        n_rows = self._parquet_rows(tmp) if os.path.isdir(tmp) else 0
        # carry newer runs (and only them) into the post-swap image
        kept = 0
        for b in present:
            src = os.path.join(self.data_dir, f"bucket={b}")
            dst = os.path.join(tmp, f"bucket={b}")
            os.makedirs(dst, exist_ok=True)
            for fn in sorted(os.listdir(src)):
                if not (fn.endswith(".parquet") and fn.startswith("epoch")):
                    continue
                ep = int(fn[len("epoch"):fn.rfind("-")])
                if ep in committed and ep > keep_after_epoch:
                    shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))
                    kept += 1
        self._swap_and_commit(
            tmp, present, n_rows, cid, t0,
            marker_extra={"expire_cutoff": keep_after_epoch},
        )
        return {"buckets": len(present), "rows": n_rows, "kept_runs": kept}

    def _append_epoch_files(
        self, tmp: str, touched: list[int], n_rows: int, epoch_id: int, t0: float,
        phases: dict | None = None,
    ) -> None:
        """Merge-on-read commit: move this epoch's bucket files into the
        live bucket dirs under epoch-tagged names.

        Exactly-once: an ``_inflight-epoch-<n>`` marker brackets the
        moves; a crash before the commit marker leaves the inflight
        marker behind, and ``_recover`` deletes exactly this epoch's
        files (filename prefix) before the replay re-appends them.
        """
        inflight = os.path.join(self.root, f"_inflight-epoch-{epoch_id}")
        with open(inflight, "w") as f:
            f.write(",".join(map(str, touched)))
        for b in touched:
            src = os.path.join(tmp, f"bucket={b}")
            dst = os.path.join(self.data_dir, f"bucket={b}")
            os.makedirs(dst, exist_ok=True)
            files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
            for i, f in enumerate(files):
                os.replace(
                    os.path.join(src, f),
                    os.path.join(dst, f"epoch{epoch_id}-{i}.parquet"),
                )
        shutil.rmtree(tmp, ignore_errors=True)
        self._commit(epoch_id, rows=n_rows, buckets=touched, t0=t0, phases=phases)
        os.remove(inflight)

    def max_runs_per_bucket(self) -> int:
        """Largest file count in any bucket dir (MoR read amplification)."""
        worst = 0
        for e in os.listdir(self.data_dir):
            bdir = os.path.join(self.data_dir, e)
            if e.startswith("bucket=") and os.path.isdir(bdir):
                worst = max(
                    worst,
                    sum(1 for f in os.listdir(bdir) if f.endswith(".parquet")),
                )
        return worst

    def maybe_compact(
        self, max_runs: int = 8, tombstone_horizon: int | None = None
    ) -> dict | None:
        """Compaction policy for merge-on-read: fold when any bucket
        accumulates more than ``max_runs`` epoch runs (bounds read
        amplification). ``tombstone_horizon`` defaults to the drop floor
        (0 if none) — i.e. GC nothing a replay could still need unless
        the caller states a higher replay floor. Returns compact()'s
        summary, or None if under threshold. Call off the hot path (a
        maintenance tick, not inside foreachBatch)."""
        if self.max_runs_per_bucket() <= max_runs:
            return None
        if tombstone_horizon is None:
            tombstone_horizon = self.drop_floor() or 0
        return self.compact(tombstone_horizon=tombstone_horizon)

    def _write_parallelism(self, n: int) -> int:
        """Task count for bucketed writes: one-task-per-bucket up to a
        multiple of the cluster's parallelism (a task holding several
        buckets still writes exactly one file per bucket dir)."""
        cores = self.spark.sparkContext.defaultParallelism
        return max(1, min(n, cores * 4))

    def _read_tmp(self, tmp: str, buckets: list[int]) -> DataFrame:
        paths = [os.path.join(tmp, f"bucket={b}") for b in buckets]
        return self.spark.read.option("basePath", tmp).parquet(*paths).select(
            *self.state_cols, "bucket"
        )

    def _tmp_stats(self, tmp: str, epoch_id: int):
        """Epoch stats read back from the tmp write — dir listing for the
        touched set, parquet footers (metadata only, no Spark job) for
        row counts, and the tiny ``bucket=-1`` marker dir for
        collection-op seqs (drop/rename)."""
        touched, n_rows, batch_drop, rename_seq = [], 0, None, None
        if not os.path.isdir(tmp):
            return touched, n_rows, batch_drop
        import pyarrow.parquet as pq

        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith("bucket="):
                continue
            bdir = os.path.join(tmp, entry)
            bucket = int(entry.split("=", 1)[1])
            nb = sum(
                pq.read_metadata(os.path.join(bdir, f)).num_rows
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
            if bucket == -1:
                # marker rows: at most one drop + one rename post-collapse
                for f in os.listdir(bdir):
                    if not f.endswith(".parquet"):
                        continue
                    t = pq.read_table(os.path.join(bdir, f), columns=["op", self.order_col])
                    for o, s in zip(t.column("op").to_pylist(), t.column(self.order_col).to_pylist()):
                        if o == "drop":
                            batch_drop = s if batch_drop is None else max(batch_drop, s)
                        elif o == "rename":
                            rename_seq = s if rename_seq is None else max(rename_seq, s)
            else:
                touched.append(bucket)
                n_rows += nb
        if rename_seq is not None:
            # rename preserves documents (Mongo semantics); record it as
            # lineage — routing changes fall out of subscription_filter
            # because later events carry the new collection name
            with open(os.path.join(self.metrics_dir, f"rename-{epoch_id}.json"), "w") as f:
                json.dump({"epoch": epoch_id, "rename_seq": rename_seq}, f)
        return touched, n_rows, batch_drop

    def _parquet_rows(self, root: str) -> int:
        import pyarrow.parquet as pq

        total = 0
        for entry in os.listdir(root):
            bdir = os.path.join(root, entry)
            if not (entry.startswith("bucket=") and os.path.isdir(bdir)):
                continue
            total += sum(
                pq.read_metadata(os.path.join(bdir, f)).num_rows
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
        return total

    # -- collection-level ops (drop/rename, reference op enum:
    # /root/reference/pkg/models/types.go:101-108) ----------------------
    @property
    def _drop_seq_path(self) -> str:
        return os.path.join(self.root, "_drop_seq")

    def drop_floor(self) -> int | None:
        """Highest applied collection-drop seq (None = never dropped)."""
        try:
            with open(self._drop_seq_path) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _advance_drop_floor(self, batch_drop: int | None) -> int | None:
        """Monotonically persist the drop watermark; returns the floor.

        The floor is the collection-level tombstone: every row with
        seq <= floor is dead, and persisting it means a duplicate of an
        older event replayed EPOCHS later still cannot resurrect dropped
        keys (same argument as per-key delete tombstones). Written
        atomically and idempotently (replays rewrite the same value).
        """
        stored = self.drop_floor()
        new = stored if batch_drop is None else max(batch_drop, stored or batch_drop)
        if new is not None and new != stored:
            tmp = self._drop_seq_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(new))
            os.replace(tmp, self._drop_seq_path)
        return new

    def _present_buckets(self) -> list[int]:
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(self.data_dir)
            if e.startswith("bucket=")
        )

    def _batch_stats(self, batch: DataFrame, epoch_id: int):
        """One action: per-bucket counts + collection-op seq maxima.

        A drop expands the touched set to every existing bucket (the
        truncation rewrites them all — the Iceberg equivalent is a
        partition-wide DELETE).
        """
        op, seq = F.col("op"), F.col(self.order_col)
        stats = batch.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(op == "drop", seq)).alias("dmax"),
            F.max(F.when(op == "rename", seq)).alias("rmax"),
        ).collect()
        touched = [r["bucket"] for r in stats if r["bucket"] != -1]
        n_rows = sum(r["n"] for r in stats if r["bucket"] != -1)
        batch_drop = max((r["dmax"] for r in stats if r["dmax"] is not None), default=None)
        rename_seq = max((r["rmax"] for r in stats if r["rmax"] is not None), default=None)
        if rename_seq is not None:
            # rename preserves documents (Mongo semantics); record it as
            # lineage — routing changes fall out of subscription_filter
            # because later events carry the new collection name
            with open(os.path.join(self.metrics_dir, f"rename-{epoch_id}.json"), "w") as f:
                json.dump({"epoch": epoch_id, "rename_seq": rename_seq}, f)
        floor = self._advance_drop_floor(batch_drop)
        if batch_drop is not None:
            touched = sorted(set(touched) | set(self._present_buckets()))
        return touched, n_rows, floor

    def _filter_collection_ops(self, batch: DataFrame, floor: int | None) -> DataFrame:
        """Exclude drop/rename marker rows from the payload and apply the
        drop watermark BEFORE the collapse shuffle (dead rows never move)."""
        ev = batch.filter(~F.col("op").isin("drop", "rename"))
        if floor is not None:
            ev = ev.filter(F.col(self.order_col) > floor)
        return ev

    def _merge_with_partials(self, batch_df: DataFrame, epoch_id: int, t0: float) -> None:
        """MERGE where updates may be deltas: union existing state (all
        full images) with the batch, then reconstruct post-images per key.

        A partial in this batch whose base landed in a previous epoch
        folds onto the state row; one whose base is in the SAME batch
        folds onto the in-batch insert. Replay is idempotent: the stored
        row carries the max applied seq, so replayed deltas (seq <= it)
        are never re-applied.
        """
        from aktuell_spark.operators.cdc import reconstruct_post_images

        if self.merge_on_read:
            self._append_partial_run(batch_df, epoch_id, t0)
            return

        delta_schema = ("updated_fields", "removed_fields")
        marker = F.col("op").isin("drop", "rename")
        batch = batch_df.select(*self.state_cols, *delta_schema).withColumn(
            # markers route to the reserved -1 bucket (same as the CoW
            # path) so a marker-bearing batch doesn't mark a real data
            # bucket touched and force a pointless read-reconstruct-swap
            "bucket", F.when(marker, F.lit(-1)).otherwise(self._bucket_col())
        )
        batch = batch.persist()
        # touched buckets from the raw batch (cannot pre-collapse: a
        # delta's base may live only in existing state)
        touched, n_rows, drop_floor = self._batch_stats(batch, epoch_id)
        if not touched:
            batch.unpersist()
            self._commit(epoch_id, rows=0, buckets=[], t0=t0)
            return

        ev = self._filter_collection_ops(batch, drop_floor)
        existing = self._read_raw(buckets=touched)
        if existing is not None and drop_floor is not None:
            existing = existing.filter(F.col(self.order_col) > drop_floor)
        if existing is None:
            src = ev
        else:
            src = existing.withColumn(
                "updated_fields", F.lit(None).cast("map<string,string>")
            ).withColumn(
                "removed_fields", F.lit(None).cast("array<string>")
            ).unionByName(ev)
        # bucket-first single shuffle: reconstruct's base-agg, partial-
        # agg, and join all cluster on (bucket, key), satisfied by the
        # hash(bucket) repartition — partition-local, and the write
        # needs no second exchange
        src = src.repartition(
            self._write_parallelism(max(len(touched), 1)), "bucket"
        )
        merged = reconstruct_post_images(
            src,
            key=("bucket", *self.key),
            order_col=self.order_col,
            delta_cols=self.delta_cols,
            ts_col=self.ts_col,
        )
        self._write_and_swap(merged, batch, touched, n_rows, epoch_id, t0)

    def _append_partial_run(self, batch_df: DataFrame, epoch_id: int, t0: float) -> None:
        """Merge-on-read ingest of a delta-carrying batch: the run stores
        the RAW events (full images and deltas alike, delta columns
        included) — no keyed shuffle at all on the write path; the
        read-time collapse (`_read_raw`) reconstructs post-images. The
        cheapest possible ingest for the reference's no-UpdateLookup
        delta stream (pkg/models/types.go:17-18)."""
        phases: dict[str, float] = {}
        floor = self.drop_floor()
        op = F.col("op")
        marker = op.isin("drop", "rename")
        b = batch_df.select(*self.state_cols, "updated_fields", "removed_fields")
        if floor is not None:
            # markers stay floor-exempt (retried drop must still truncate)
            b = b.filter(marker | (F.col(self.order_col) > floor))
        b = b.withColumn(
            "bucket", F.when(marker, F.lit(-1)).otherwise(self._bucket_col())
        )
        b = b.repartition(self._write_parallelism(self.n_buckets), "bucket")
        tmp = os.path.join(self.root, f"_tmp-epoch-{epoch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        b.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
        phases["job1_write_sec"] = round(time.time() - t0, 3)
        t1 = time.time()
        touched, n_rows, batch_drop = self._tmp_stats(tmp, epoch_id)
        phases["footer_stats_sec"] = round(time.time() - t1, 3)
        self._advance_drop_floor(batch_drop)
        if not touched and batch_drop is None:
            shutil.rmtree(tmp, ignore_errors=True)
            self._commit(epoch_id, rows=0, buckets=[], t0=t0, phases=phases)
            return
        self._append_epoch_files(tmp, touched, n_rows, epoch_id, t0, phases)

    def _write_and_swap(
        self, merged: DataFrame, cached: DataFrame, touched: list[int],
        n_rows: int, epoch_id: int, t0: float,
    ) -> None:
        tmp = os.path.join(self.root, f"_tmp-epoch-{epoch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        # one output file per bucket dir; buckets are small by design.
        # Caller hands us a bucket-partitioned plan — write directly.
        (
            merged.select(*self.state_cols, "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        cached.unpersist()
        self._swap_and_commit(tmp, touched, n_rows, epoch_id, t0)

    def _swap_and_commit(
        self, tmp: str, touched: list[int], n_rows: int, epoch_id: int, t0: float,
        phases: dict | None = None, marker_extra: dict | None = None,
    ) -> None:
        # crash-safe swap: live bucket moves aside BEFORE the new one
        # moves in; a crash at any point leaves either image restorable
        # (_recover), never a missing bucket whose only copy was _tmp
        t_swap = time.time()
        aside = self._aside_dir(epoch_id)
        shutil.rmtree(aside, ignore_errors=True)
        os.makedirs(aside, exist_ok=True)
        for b in touched:
            src = os.path.join(tmp, f"bucket={b}")
            dst = os.path.join(self.data_dir, f"bucket={b}")
            if os.path.exists(dst):
                os.replace(dst, os.path.join(aside, f"bucket={b}"))
            if os.path.exists(src):
                os.replace(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        if phases is not None:
            phases["swap_sec"] = round(time.time() - t_swap, 3)
        self._commit(epoch_id, rows=n_rows, buckets=touched, t0=t0,
                     phases=phases, marker_extra=marker_extra)

    def _commit(
        self, epoch_id: int, rows: int, buckets: list[int], t0: float,
        phases: dict | None = None, marker_extra: dict | None = None,
    ) -> None:
        # per-epoch lineage + metrics (north rule: per-partition lineage)
        rec = {
            "epoch": epoch_id,
            "merged_rows": rows,
            "touched_buckets": sorted(buckets),
            "merge_sec": round(time.time() - t0, 3),
        }
        if self.quarantine:
            # only when the split actually ran for THIS epoch —
            # compact()/expire_runs() commits never quarantine, and the
            # stale count from the previous merge epoch must not be
            # re-attributed to them in the lineage record
            if getattr(self, "_last_quarantined_epoch", None) == epoch_id:
                rec["quarantined_rows"] = getattr(self, "_last_quarantined", 0)
        if phases:
            rec["phases"] = phases
        with open(os.path.join(self.metrics_dir, f"epoch-{epoch_id}.json"), "w") as f:
            json.dump(rec, f)
        with open(os.path.join(self.commits_dir, str(epoch_id)), "w") as f:
            # marker content = snapshot metadata (drop floor at commit
            # time) so as-of reads apply the floor of THEIR epoch, not
            # today's; is_committed only tests existence, and legacy
            # "ok" markers still parse (fallback to the current floor)
            f.write(json.dumps(
                {"floor": self.drop_floor(), **(marker_extra or {})}
            ))
        # asides are only needed to roll back an uncommitted epoch —
        # unless CoW retention keeps them as recent-epoch pre-images
        if (
            self.cow_retain_epochs > 0
            and not self.merge_on_read
            and epoch_id >= 0
        ):
            self._retain_aside(epoch_id)
        else:
            shutil.rmtree(self._aside_dir(epoch_id), ignore_errors=True)

    def foreach_batch(self):
        """Bind for ``writeStream.foreachBatch``."""
        return lambda df, epoch: self.merge_batch(df, epoch)

    # -- dead-letter quarantine ---------------------------------------
    def _quarantine_split(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Route malformed events (null key / null seq on a non-marker
        row) to ``_quarantine/epoch-N`` and return the clean remainder.
        Null-safe: an event with a null ``op`` AND a broken key is still
        quarantined (three-valued logic would otherwise let it through).
        Idempotent on replay (same epoch overwrites its own dir)."""
        marker = F.coalesce(F.col("op").isin("drop", "rename"), F.lit(False))
        ok = F.col(self.order_col).isNotNull()
        for k in self.key:
            ok = ok & F.col(k).isNotNull()
        ok = F.coalesce(ok, F.lit(False))
        qdir = os.path.join(self.quarantine_dir, f"epoch-{epoch_id}")
        batch_df.filter(~(marker | ok)).write.mode("overwrite").parquet(qdir)
        # flat dir (no bucket= partitions): count footers directly
        import pyarrow.parquet as pq

        n_bad = sum(
            pq.read_metadata(os.path.join(qdir, f)).num_rows
            for f in os.listdir(qdir)
            if f.endswith(".parquet")
        )
        self._last_quarantined = n_bad
        self._last_quarantined_epoch = epoch_id
        if n_bad == 0:
            shutil.rmtree(qdir, ignore_errors=True)
            return batch_df
        return batch_df.filter(marker | ok)

    def vacuum_quarantine(self, up_to_epoch: int) -> int:
        """Drop dead-letter dirs of epochs <= ``up_to_epoch`` (after the
        operator has inspected/re-driven them — the quarantine is a
        review queue, not an archive). Returns dirs removed. Safe at
        any time: quarantined rows never participate in merges."""
        removed = 0
        if not os.path.isdir(self.quarantine_dir):
            return 0
        for d in sorted(os.listdir(self.quarantine_dir)):
            if not d.startswith("epoch-"):
                continue
            if int(d[len("epoch-"):]) <= up_to_epoch:
                shutil.rmtree(
                    os.path.join(self.quarantine_dir, d), ignore_errors=True
                )
                removed += 1
        return removed

    def quarantined(self) -> DataFrame | None:
        """Every dead-lettered event across epochs (None if clean)."""
        if not os.path.isdir(self.quarantine_dir):
            return None
        dirs = [
            os.path.join(self.quarantine_dir, d)
            for d in sorted(os.listdir(self.quarantine_dir))
        ]
        return self.spark.read.parquet(*dirs) if dirs else None

    # -- metadata tables (Iceberg `snapshots` / `files` analogues) -----
    def history(self) -> DataFrame:
        """Commit history as a DataFrame (Iceberg ``snapshots`` table
        analogue): one row per committed epoch from the lineage sidecars
        — epoch, merged rows, touched bucket count, merge seconds, and
        the quarantined count when the dead-letter path is on. Driver
        cost is one listdir + one tiny JSON read per epoch (metadata is
        METADATA — never a Spark job over data files)."""
        rows = []
        for fn in sorted(os.listdir(self.metrics_dir)):
            if not (fn.startswith("epoch-") and fn.endswith(".json")):
                continue
            with open(os.path.join(self.metrics_dir, fn)) as f:
                rec = json.load(f)
            rows.append((
                int(rec["epoch"]),
                int(rec.get("merged_rows", 0)),
                len(rec.get("touched_buckets", [])),
                float(rec.get("merge_sec", 0.0)),
                int(rec.get("quarantined_rows", 0)),
            ))
        return self.spark.createDataFrame(
            rows,
            "epoch long, merged_rows long, touched_buckets int, "
            "merge_sec double, quarantined_rows long",
        )

    def files(self) -> DataFrame:
        """Data-file inventory (Iceberg ``files`` table analogue): one
        row per live parquet file with bucket, epoch (MoR runs; -1 for
        compacted/CoW files), bytes, and footer row count. The input to
        a compaction policy (many small runs in one bucket -> compact)
        and to size-skew audits."""
        import pyarrow.parquet as pq

        rows = []
        for entry in sorted(os.listdir(self.data_dir)):
            if not entry.startswith("bucket="):
                continue
            bucket = int(entry.split("=", 1)[1])
            bdir = os.path.join(self.data_dir, entry)
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                ep = -1
                if fn.startswith("epoch"):
                    ep = int(fn[len("epoch"):fn.rfind("-")])
                path = os.path.join(bdir, fn)
                rows.append((
                    bucket, ep, fn, os.path.getsize(path),
                    pq.read_metadata(path).num_rows,
                ))
        return self.spark.createDataFrame(
            rows,
            "bucket int, epoch long, file string, bytes long, n_rows long",
        )
