"""Multi-subscription fan-out: one change feed → N subscribers.

Spark restatement of the reference's hub fan-out
(/root/reference/pkg/server/websocket.go:226-293: one change event is
routed to every subscribed client; 5-concurrent-clients test at
tests/integration_test.go:433-509). Each subscription materializes its
filtered view into its own exactly-once table.

Design for scale: the source is read ONCE per micro-batch; the batch is
cached and each subscription's filter + MERGE runs against the cache,
so fan-out cost is N× the (small) merge, not N× the source scan. Each
per-subscription table keeps its own commit markers, so a replayed
epoch skips the subscriptions that already committed and re-merges only
the ones that didn't — per-subscription exactly-once.

``Subscription.predicate`` is the document-level filter the reference
leaves as a TODO (pkg/client/client.go:397-398): any SQL boolean
expression over the event columns, evaluated per event. Delete events
and collection markers bypass the predicate (their payload fields are
null and must still reach the subscription table to remove/truncate
keys) — the predicate selects which LIVE documents the subscriber sees.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from aktuell_spark.streaming.bootstrap import EngineConfig
from aktuell_spark.streaming.pipeline import read_change_stream, subscription_filter
from aktuell_spark.streaming.sink import BucketedUpsertTable


@dataclass
class Subscription:
    """Named subscription: namespace match (F1) + optional doc filter."""

    name: str
    database: str = ""
    collection: str = ""
    predicate: str | None = None
    # runtime predicate updates as epoch-stamped cutovers
    # [(from_epoch, predicate)], newest-applicable wins: a filter change
    # on a LIVE subscription takes effect at a known epoch boundary
    # instead of requiring a reseed, and an uncommitted epoch replayed
    # after a crash re-merges under the predicate that epoch had
    # (committed replays are no-ops via the table's commit markers
    # either way). In-memory, like the reference's per-client
    # subscription state (pkg/server/websocket.go:445-531).
    predicate_updates: list = field(default_factory=list)

    def predicate_at(self, epoch_id: int | None) -> str | None:
        pred = self.predicate
        for from_epoch, p in self.predicate_updates:
            if epoch_id is None or epoch_id >= from_epoch:
                pred = p
        return pred

    def apply(self, df: DataFrame, epoch_id: int | None = None) -> DataFrame:
        from pyspark.sql import functions as F

        out = subscription_filter(df, self.database, self.collection)
        pred = self.predicate_at(epoch_id)
        if pred:
            # deletes (and collection markers) bypass the doc-level
            # predicate: payload fields are null on a delete event, so a
            # payload predicate would silently drop it and the
            # subscription table would keep the deleted key forever
            out = out.filter(
                F.col("op").isin("delete", "drop", "rename") | F.expr(pred)
            )
        return out


class FanoutSink:
    """foreachBatch body that MERGEs one batch into N subscription tables."""

    # Reserved negative epoch-id space for rename-driven seeds/drops so
    # they ride the sink's idempotent commit-marker machinery (distinct
    # from BucketedUpsertTable.COMPACT_EPOCH_BASE at -1e6). ONE base with
    # step encoded in parity — seed = even offset, drop = odd — so the
    # two spaces stay disjoint for EVERY rename seq (two separate bases
    # 1e9 apart collide once seq*100 exceeds the gap; benchmarks replay
    # 74M-event feeds, so seq routinely passes 10M).
    RENAME_BASE = -3_000_000_000
    # reserved space for same-batch rename-chain segment merges
    # (epoch_id is Spark's small micro-batch counter, segments < 100)
    RENAME_SEG_BASE = -2_000_000_000

    @classmethod
    def _seed_epoch(cls, seq: int, si: int) -> int:
        return cls.RENAME_BASE - seq * 200 - si * 2

    @classmethod
    def _drop_epoch(cls, seq: int, si: int) -> int:
        return cls.RENAME_BASE - seq * 200 - si * 2 - 1

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        subs: list[Subscription],
        n_buckets: int = 32,
        partial_updates: bool = False,
        merge_on_read: bool = False,
        rename_aware: bool = True,
        quarantine: bool = False,
    ) -> None:
        names = [s.name for s in subs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate subscription names: {names}")
        self.subs = list(subs)
        # runtime subscribe/unsubscribe on a LIVE sink (the reference's
        # core interactive feature, pkg/server/websocket.go:445-531,
        # 633-662): mutations and per-epoch membership snapshots
        # synchronize here; frozen tables of removed subscriptions stay
        # readable until drop
        self._lifecycle_lock = threading.Lock()
        self._last_epoch = -1
        self._frozen: dict[str, BucketedUpsertTable] = {}
        # epochs currently merging (each holds a membership+tables
        # snapshot); remove_subscription(drop_table=True) defers the
        # physical rmtree until no in-flight epoch references tables
        self._epoch_refs = 0
        self._deferred_drops: list[str] = []
        self._spark = spark
        self._root = root
        self._table_kwargs = dict(
            n_buckets=n_buckets,
            partial_updates=partial_updates,
            merge_on_read=merge_on_read,
            quarantine=quarantine,
        )
        # rename_aware: a rename marker (op='rename', extra['to']=target,
        # reference op enum pkg/models/types.go:101-108) MOVES documents:
        # the target collection's subscriptions are seeded from the source
        # collection's table, then the source table is truncated (Mongo
        # drops the old namespace). Costs one tiny marker probe per epoch
        # over the cached batch. Multi-hop chains (a->b AND b->c in the
        # SAME micro-batch) take the segmented path: the batch is split
        # at rename seq boundaries and merged hop-by-hop, so each seed
        # sees the events that arrived before its rename.
        self.rename_aware = rename_aware
        # driver threads submitting concurrent merge jobs per epoch;
        # actions release the GIL while blocked on the JVM, so merges
        # genuinely overlap. Bounded: each thread pins a few driver RPCs
        # and a job group, not executor resources.
        self.max_concurrency = 8
        self.tables = {
            s.name: BucketedUpsertTable(
                spark,
                os.path.join(root, f"sub={s.name}"),
                n_buckets=n_buckets,
                partial_updates=partial_updates,
                merge_on_read=merge_on_read,
                quarantine=quarantine,
            )
            for s in subs
        }

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        with self._lifecycle_lock:
            # snapshot membership AND the name->table mapping together:
            # add/remove_subscription may run on another thread while
            # this epoch merges; the epoch uses the membership (and the
            # table objects) it started with (the reference's hub
            # delivers in-flight messages to the client set at send
            # time, pkg/server/websocket.go:226-249). A concurrent
            # remove only mutates self.tables — this epoch's snapshot
            # still resolves every name it started with, and the
            # physical drop is deferred until the epoch releases it.
            subs = list(self.subs)
            tables = dict(self.tables)
            self._epoch_refs += 1
            self._last_epoch = max(self._last_epoch, epoch_id)
        try:
            self._merge_epoch(subs, tables, batch_df, epoch_id)
        finally:
            with self._lifecycle_lock:
                self._epoch_refs -= 1
            self.drain_deferred_drops()

    def drain_deferred_drops(self) -> list[str]:
        """Physically remove table dirs whose drop an in-flight epoch
        deferred (remove_subscription(drop_table=True) mid-merge).
        Runs automatically at the end of every epoch; ALSO call it from
        shutdown (``close``) — if the stream stops before another epoch
        completes, the rmtree would otherwise never run and the dropped
        table leaks on disk. No-op while any epoch is still merging.
        Returns the roots it removed."""
        with self._lifecycle_lock:
            if self._epoch_refs > 0 or not self._deferred_drops:
                return []
            drops, self._deferred_drops = self._deferred_drops, []
        import shutil

        for root in drops:
            shutil.rmtree(root, ignore_errors=True)
        return drops

    def close(self) -> None:
        """Shutdown hook for a stopped stream: drain deferred drops.
        Idempotent; safe to call any time no epoch is in flight."""
        self.drain_deferred_drops()

    def _merge_epoch(
        self,
        subs: list[Subscription],
        tables: dict[str, BucketedUpsertTable],
        batch_df: DataFrame,
        epoch_id: int,
    ) -> None:
        pending = [
            s for s in subs if not tables[s.name].is_committed(epoch_id)
        ]
        if not pending and not self.rename_aware:
            return
        batch_df = batch_df.persist()
        try:
            renames = self._detect_renames(batch_df) if self.rename_aware else []
            renames.sort()
            chained = {o for (_s, o, _n, _t) in renames} & {
                n for (_s, _o, n, _t) in renames
            }
            if renames and chained:
                # Same-batch chain (a->b AND b->c, either seq order): a
                # rename's SOURCE table must hold its same-batch
                # pre-rename events before it is seeded from. Split the
                # batch at rename seq boundaries and merge hop-by-hop;
                # each segment commits under a reserved per-segment
                # epoch id, so a crash mid-chain replays exactly.
                from pyspark.sql import functions as F

                prev = None
                for i, (seq, old, new, ts) in enumerate(renames):
                    seg = batch_df.filter(F.col("seq") < seq)
                    if prev is not None:
                        seg = seg.filter(F.col("seq") >= prev)
                    self._merge_subs(
                        subs, tables, seg,
                        self.RENAME_SEG_BASE - epoch_id * 100 - i,
                    )
                    self._apply_rename(seq, old, new, ts, subs, tables)
                    prev = seq
                self._merge_subs(
                    subs, tables, batch_df.filter(F.col("seq") >= prev),
                    epoch_id,
                )
            elif renames:
                # independent renames: merge everything that is not a
                # rename TARGET, move the tables, then merge the targets
                # (their events are post-rename by construction)
                target_cols = {new for (_seq, _old, new, _ts) in renames}
                phase1 = [s for s in pending if s.collection not in target_cols]
                phase2 = [s for s in pending if s.collection in target_cols]
                self._merge_subs(phase1, tables, batch_df, epoch_id)
                for seq, old, new, ts in renames:
                    self._apply_rename(seq, old, new, ts, subs, tables)
                self._merge_subs(phase2, tables, batch_df, epoch_id)
            else:
                self._merge_subs(pending, tables, batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    def _merge_subs(self, pending: list[Subscription],
                    tables: dict[str, BucketedUpsertTable],
                    batch_df: DataFrame, epoch_id: int) -> None:
        if not pending:
            return
        if len(pending) == 1:
            s = pending[0]
            tables[s.name].merge_batch(s.apply(batch_df, epoch_id), epoch_id)
            return
        # concurrent per-subscription merges over the shared
        # cached batch: Spark's scheduler interleaves jobs from
        # multiple driver threads, so epoch latency is bounded by
        # the slowest subscription, not the sum (the reference's
        # hub delivers to all clients from one loop,
        # websocket.go:226-249). Safe: tables are disjoint roots,
        # each with its own commit marker — a failed thread
        # leaves its table uncommitted and the epoch replay
        # re-merges only that one.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(len(pending), self.max_concurrency)
        ) as pool:
            futs = [
                pool.submit(
                    tables[s.name].merge_batch,
                    s.apply(batch_df, epoch_id),
                    epoch_id,
                )
                for s in pending
            ]
            for f in futs:
                f.result()  # re-raise the first failure

    def _detect_renames(self, batch_df: DataFrame):
        """Bounded probe: rename markers carrying a target namespace.
        Collection-level ops are rare; the collect is a handful of rows
        over the already-cached batch."""
        from pyspark.sql import functions as F

        if "extra" not in batch_df.columns:
            return []
        to = F.element_at(F.col("extra"), F.lit("to"))
        return [
            (r["seq"], r["collection"], r["to"], r["ts"])
            for r in batch_df.filter((F.col("op") == "rename") & to.isNotNull())
            .select("seq", "collection", to.alias("to"), "ts")
            .collect()
        ]

    def _apply_rename(self, seq: int, old: str, new: str, ts,
                      subs: list[Subscription],
                      tables: dict[str, BucketedUpsertTable]) -> None:
        """Move documents old→new: seed every subscription on the target
        collection from every subscription table on the source, then
        truncate the source tables (Mongo rename leaves nothing under
        the old namespace). Seeds/drops commit under reserved epoch ids
        derived from the rename seq — replays skip committed steps, so
        a crash anywhere in the sequence recovers exactly."""
        from pyspark.sql import functions as F

        sources = [s for s in subs if s.collection == old]
        targets = [s for s in subs if s.collection == new]
        for si, src in enumerate(sources):
            st = tables[src.name]
            seed = st._read_raw()
            for tgt in targets:
                tt = tables[tgt.name]
                seed_epoch = self._seed_epoch(seq, si)
                if tt.is_committed(seed_epoch) or seed is None:
                    continue
                # Stamp seeded rows' order col to the RENAME seq: the
                # rename re-creates the target namespace (Mongo
                # semantics), so seeds must land ABOVE any drop floor an
                # earlier drop/rename left on the target table (original
                # seqs could sit below it and be filtered as
                # resurrections). Post-rename updates carry seq > rename
                # seq and still win LWW; idempotent across replays.
                sdf = seed.drop("bucket").withColumn(
                    tt.order_col, F.lit(seq).cast("long")
                )
                if tt.partial_updates:
                    sdf = sdf.withColumn(
                        "updated_fields", F.lit(None).cast("map<string,string>")
                    ).withColumn("removed_fields", F.lit(None).cast("array<string>"))
                tt.merge_batch(sdf, seed_epoch)
            # truncate the source AFTER all targets seeded: a synthetic
            # drop marker at the rename seq rides the sink's normal
            # drop-floor machinery (idempotent, replay-safe)
            drop_epoch = self._drop_epoch(seq, si)
            if not st.is_committed(drop_epoch):
                schema = st._state_schema()
                vals = []
                for f in schema.fields:
                    if f.name == st.key[0]:
                        vals.append("")
                    elif f.name in st.key:
                        vals.append(-1)
                    elif f.name == st.order_col:
                        vals.append(seq)
                    elif f.name == "op":
                        vals.append("drop")
                    elif f.name == st.ts_col:
                        vals.append(ts)
                    else:
                        vals.append(None)
                drop_df = st.spark.createDataFrame([tuple(vals)], schema)
                if st.partial_updates:
                    drop_df = drop_df.withColumn(
                        "updated_fields", F.lit(None).cast("map<string,string>")
                    ).withColumn(
                        "removed_fields", F.lit(None).cast("array<string>")
                    )
                st.merge_batch(drop_df, drop_epoch)

    # reserved epoch-id space for runtime-subscribe snapshot seeds:
    # between the compaction base (-1e6 - k) and the rename-segment base
    # (-2e9), so seed commits never collide with either. Each seed takes
    # the next free id below the base (scan of the table's own commit
    # markers), so re-bootstrapping a resumed table is NOT skipped by an
    # old seed's marker, and a crash-replayed seed re-merges the same
    # content (harmless by LWW).
    SEED_EPOCH_BASE = -2_000_000

    def add_subscription(
        self, sub: Subscription, seed_df: DataFrame | None = None
    ) -> BucketedUpsertTable:
        """Subscribe on a RUNNING sink (the reference's runtime
        subscribe, pkg/server/websocket.go:445-531; snapshot-then-tail
        bootstrap protocol at websocket.go:534-631).

        Registration happens FIRST (under the lock), so every epoch
        that starts after this call merges into the new table; only
        then is ``seed_df`` merged — the snapshot leg. ``seed_df`` is
        the subscriber's current-state view (state-shaped rows, e.g.
        another table's ``read()`` or a base-table snapshot ALREADY
        filtered to this subscription's scope); its rows enter as
        synthetic inserts with unique NEGATIVE seqs, so any live change
        — including one racing this call — wins the LWW merge exactly
        like the client applying changes over its snapshot array. The
        seed commits under SEED_EPOCH, making re-bootstrap idempotent.

        A previously removed subscription of the same name resumes its
        frozen table (the reference's resubscribe,
        pkg/client/client.go:469-485). For that gap-filling case the
        negative-seq snapshot seed is NOT enough — stale positive-seq
        rows in the frozen table would beat it under LWW — so a seed
        that carries ``seq``/``op`` columns (e.g. another same-scope
        table's ``read_with_lineage()``, tombstones included) is merged
        AS-IS: rows keep their true seqs and LWW resolves them against
        both stale frozen rows and future live events.
        """
        from pyspark.sql import functions as F

        with self._lifecycle_lock:
            if any(s.name == sub.name for s in self.subs):
                raise ValueError(f"subscription {sub.name!r} already live")
            table = self._frozen.pop(sub.name, None)
            if table is None:
                table = BucketedUpsertTable(
                    self._spark,
                    os.path.join(self._root, f"sub={sub.name}"),
                    **self._table_kwargs,
                )
            self.tables[sub.name] = table
            self.subs.append(sub)
        if seed_df is not None:
            if "seq" in seed_df.columns and "op" in seed_df.columns:
                seeded = seed_df.select(*table.state_cols)
            else:
                seeded = (
                    seed_df.select(*table.payload)
                    .withColumn(
                        "seq",
                        (F.lit(-1) - F.monotonically_increasing_id()).cast("long"),
                    )
                    .withColumn("op", F.lit("insert"))
                )
            table.merge_batch(seeded, self._next_seed_epoch(table))
        return table

    def _next_seed_epoch(self, table: BucketedUpsertTable) -> int:
        used = sum(
            1
            for e in table._committed_epochs()
            if self.SEED_EPOCH_BASE - 999_999 <= e <= self.SEED_EPOCH_BASE
        )
        # loud guard on band exhaustion: the 1M-id seed band is sized
        # for ~10^6 re-bootstraps of one subscription; running off its
        # end would silently collide with the rename-segment band
        if used >= 999_000:
            raise RuntimeError(
                f"seed-epoch band nearly exhausted ({used} of 1M ids "
                f"used below {self.SEED_EPOCH_BASE}); compact or "
                "recreate the subscription table"
            )
        return self.SEED_EPOCH_BASE - used

    def remove_subscription(self, name: str, drop_table: bool = False) -> None:
        """Unsubscribe on a RUNNING sink (websocket.go:633-662; the
        integration suite asserts delivery stops,
        tests/integration_test.go:648-734): future epochs skip this
        subscription, its table stops changing. The table stays
        readable (frozen) unless ``drop_table`` — the reference keeps
        client-side state after unsubscribe too. Only MEMBERSHIP
        mutates here: an in-flight epoch merges with the snapshot it
        took, so the physical rmtree is deferred until no epoch holds
        a reference (drained at epoch end in merge_batch)."""
        import shutil

        with self._lifecycle_lock:
            keep = [s for s in self.subs if s.name != name]
            if len(keep) == len(self.subs):
                raise KeyError(f"no live subscription {name!r}")
            self.subs = keep
            table = self.tables.pop(name)
            if drop_table:
                if self._epoch_refs > 0:
                    self._deferred_drops.append(table.root)
                    return
            else:
                self._frozen[name] = table
                return
        shutil.rmtree(table.root, ignore_errors=True)

    def update_predicate(self, name: str, predicate: str | None) -> int:
        """Replace a LIVE subscription's doc-level predicate with an
        epoch-stamped cutover (no reseed, no pipeline restart): epochs
        before the returned cutover epoch keep the old predicate,
        epochs at or after it use the new one — and a crash-replayed
        earlier epoch still merges under its own era\'s predicate."""
        with self._lifecycle_lock:
            for s in self.subs:
                if s.name == name:
                    cutover = self._last_epoch + 1
                    s.predicate_updates.append((cutover, predicate))
                    return cutover
        raise KeyError(f"no live subscription {name!r}")

    def foreach_batch(self):
        return lambda df, epoch: self.merge_batch(df, epoch)

    def read(self, name: str) -> DataFrame:
        t = self.tables.get(name) or self._frozen.get(name)
        if t is None:
            raise KeyError(f"unknown subscription {name!r}")
        return t.read()

    def stats(self) -> dict[str, dict]:
        """Per-subscription sync-stats fan-in (A3 — the reference's
        per-DB stats map, /root/reference/pkg/sync/manager.go:213-219):
        aggregates each table's committed epoch lineage. Driver-side
        file reads only — no Spark job."""
        import json

        out: dict[str, dict] = {}
        for name, t in self.tables.items():
            epochs, rows, buckets = 0, 0, set()
            for f in os.listdir(t.metrics_dir):
                if not (f.startswith("epoch-") and f.endswith(".json")):
                    continue
                with open(os.path.join(t.metrics_dir, f)) as fh:
                    m = json.load(fh)
                epochs += 1
                rows += m.get("merged_rows", 0)
                buckets.update(m.get("touched_buckets", []))
            out[name] = {
                "epochs": epochs,
                "merged_rows": rows,
                "touched_buckets": len(buckets),
            }
        return out


class EngineManager:
    """Multi-database coordinator: one fan-out pipeline per configured
    database (the reference's SyncManager starts one change-stream
    pipeline per DB and fans events to subscribers,
    /root/reference/pkg/sync/manager.go:144-219).

    Subscriptions are grouped by database; each database gets its own
    streaming query, checkpoint, and per-subscription tables under
    ``root/db=<name>/``. ``stats()`` is the cross-database fan-in
    (manager.go:213-219's map of db → SyncStats).
    """

    def __init__(
        self,
        spark: SparkSession,
        feed_dir: str,
        root: str,
        checkpoint_dir: str,
        config: EngineConfig,
        subscriptions: list[Subscription],
        n_buckets: int = 32,
        partial_updates: bool = False,
        merge_on_read: bool = False,
        quarantine: bool = False,
    ) -> None:
        self.spark = spark
        self.feed_dir = feed_dir
        self.root = root
        self.checkpoint_dir = checkpoint_dir
        self.config = config
        self.n_buckets = n_buckets
        # sink modes apply engine-wide, the way the reference's server
        # options apply to every managed database (cmd/server/main.go
        # config layer); jobs/run_pipeline.py exposes the same flags
        self.partial_updates = partial_updates
        self.merge_on_read = merge_on_read
        self.quarantine = quarantine
        self.by_db: dict[str, list[Subscription]] = {}
        for s in subscriptions:
            if not s.database:
                raise ValueError(
                    f"subscription {s.name!r}: the manager routes per database; "
                    "set Subscription.database"
                )
            if not config.is_valid_subscription(s.database, s.collection):
                raise ValueError(
                    f"invalid subscription {s.name!r}: "
                    f"{s.database}/{s.collection} is not configured"
                )
            self.by_db.setdefault(s.database, []).append(s)
        self.sinks: dict[str, FanoutSink] = {}

    def run(
        self,
        max_files_per_trigger: int | None = None,
        trigger: dict | None = None,
        await_termination: bool = True,
    ) -> dict[str, object]:
        """Run every database's pipeline (default: availableNow bounded
        replay, awaited to completion).

        All per-DB streaming queries START before any is awaited, so
        they run concurrently on the shared session — the reference's
        one-goroutine-per-DB shape (manager.go:144-170). Each query has
        its own checkpoint and per-subscription commit markers, so a
        failure in one DB leaves the others' exactly-once state intact.
        For a forever-running tail pass ``trigger={"processingTime":
        "2 seconds"}, await_termination=False`` and stop the returned
        queries yourself (the reference's continuous operating mode).
        """
        queries = {}
        for db, subs in self.by_db.items():
            q, sink = run_fanout_pipeline(
                self.spark,
                self.feed_dir,
                os.path.join(self.root, f"db={db}"),
                os.path.join(self.checkpoint_dir, f"db={db}"),
                subs,
                n_buckets=self.n_buckets,
                config=self.config,
                partial_updates=self.partial_updates,
                merge_on_read=self.merge_on_read,
                quarantine=self.quarantine,
                max_files_per_trigger=max_files_per_trigger,
                await_termination=False,
                trigger=trigger,
                # a re-run on a live manager (bounded-trigger restart)
                # keeps each DB's sink, so runtime lifecycle state
                # (added/removed subscriptions, predicate cutovers)
                # survives across run() calls
                sink=self.sinks.get(db),
            )
            queries[db] = q
            self.sinks[db] = sink
        if await_termination:
            for q in queries.values():
                q.awaitTermination()
        return queries

    def read(self, database: str, subscription: str) -> DataFrame:
        return self.sinks[database].read(subscription)

    def stats(self) -> dict[str, dict]:
        """db → per-subscription lineage fan-in (A3, manager.go:213-219)."""
        return {db: sink.stats() for db, sink in self.sinks.items()}

    # -- runtime subscription lifecycle (websocket.go:445-531,633-662) --
    def add_subscription(
        self, sub: Subscription, seed_df: DataFrame | None = None
    ) -> BucketedUpsertTable:
        """Subscribe on a RUNNING manager: validates against the config
        (IsValidSubscription, manager.go:222-241), then registers on the
        database's live sink with an optional snapshot seed (see
        ``FanoutSink.add_subscription``). The database's pipeline must
        already be running — the manager routes per configured DB, like
        the reference's per-database sync managers (manager.go:144-170)."""
        if not self.config.is_valid_subscription(sub.database, sub.collection):
            raise ValueError(
                f"invalid subscription {sub.name!r}: "
                f"{sub.database}/{sub.collection} is not configured"
            )
        if sub.database not in self.sinks:
            raise KeyError(
                f"database {sub.database!r} has no running pipeline; "
                "runtime add requires the DB's stream to be live"
            )
        table = self.sinks[sub.database].add_subscription(sub, seed_df)
        self.by_db.setdefault(sub.database, []).append(sub)
        return table

    def remove_subscription(
        self, database: str, name: str, drop_table: bool = False
    ) -> None:
        """Unsubscribe on a RUNNING manager: the subscription's table
        stops changing while every other subscription continues
        (integration_test.go:648-734's unsubscribe-stops-delivery)."""
        self.sinks[database].remove_subscription(name, drop_table=drop_table)
        self.by_db[database] = [
            s for s in self.by_db.get(database, []) if s.name != name
        ]

    def update_predicate(
        self, database: str, name: str, predicate: str | None
    ) -> int:
        """Epoch-stamped predicate cutover on a live subscription."""
        return self.sinks[database].update_predicate(name, predicate)


def run_fanout_pipeline(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    subs: list[Subscription],
    n_buckets: int = 32,
    config: EngineConfig | None = None,
    partial_updates: bool = False,
    merge_on_read: bool = False,
    quarantine: bool = False,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger: dict | None = None,
    sink: FanoutSink | None = None,
):
    """One readStream → N per-subscription exactly-once tables.

    ``config`` (when given) validates every subscription up front,
    mirroring IsValidSubscription (pkg/sync/manager.go:222-241).
    Default trigger is availableNow (bounded replay); pass
    ``trigger={"processingTime": "2 seconds"}`` for the forever-running
    tail the reference operates as — combine with
    ``await_termination=False`` and stop the query yourself.
    Returns (query, sink).
    """
    if config is not None:
        for s in subs:
            if not config.is_valid_subscription(s.database, s.collection):
                raise ValueError(
                    f"invalid subscription {s.name!r}: "
                    f"{s.database}/{s.collection} is not configured"
                )
    if sink is None:
        # pass an existing sink to RESUME a pipeline (bounded-trigger
        # restart) without losing runtime lifecycle state — live adds,
        # frozen tables of removed subscriptions, predicate cutovers
        sink = FanoutSink(
            spark,
            root,
            subs,
            n_buckets=n_buckets,
            partial_updates=partial_updates,
            merge_on_read=merge_on_read,
            quarantine=quarantine,
        )
    stream = read_change_stream(spark, feed_dir, max_files_per_trigger)
    query = (
        stream.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query, sink
