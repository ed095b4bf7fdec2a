"""Snapshot scans — the bounded "snapshot-then-tail" bootstrap.

``snapshot_with_batches`` tags a BOUNDED snapshot (client-paging sizes,
guarded) with a single global window; ``export_with_batches`` is the
table-scale variant: range partitioning + per-partition ranks + driver
cumsum of ~n partition counts — no single-reducer stage anywhere.

Mirrors ``SnapshotOptions`` + ``StreamSnapshot``
(/root/reference/pkg/models/types.go:24-30,
/root/reference/pkg/sync/database.go:225-333): count + filter + sort +
limit, streamed in batches. The reference paginates with skip/limit
(database.go:287-293) — an O(n²) server-side scan pattern; here a single
sorted, limited read is planned once (Catalyst pushes the filter to
parquet and plans limit as TakeOrdered), and batching is a
``row_number``-derived column, not repeated scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class SnapshotOptions:
    """Per-subscription snapshot knobs (types.go:24-30, defaults at
    database.go:232-240)."""

    filter_expr: str | None = None
    sort: list[tuple[str, str]] = field(default_factory=list)  # (col, "asc"|"desc")
    limit: int = 10_000
    batch_size: int = 100


def snapshot_scan(df: DataFrame, opts: SnapshotOptions) -> DataFrame:
    """Bounded snapshot: filter → sort → limit (S6/O1/O2)."""
    out = df
    if opts.filter_expr:
        out = out.filter(opts.filter_expr)
    if opts.sort:
        out = out.orderBy(
            *[F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in opts.sort]
        )
    return out.limit(opts.limit)


def snapshot_total(df: DataFrame, opts: SnapshotOptions) -> int:
    """Snapshot-total bookkeeping (S7, database.go:254-266)."""
    out = df.filter(opts.filter_expr) if opts.filter_expr else df
    return min(out.count(), opts.limit)


# snapshot_with_batches assigns batch ids with an UNPARTITIONED window —
# a deliberate single-reducer step, safe only because snapshots are
# bounded (the reference's snapshot protocol pages a client-sized view,
# types.go:24-30). Guarded so nobody runs it on an unbounded table.
MAX_BATCHED_SNAPSHOT_ROWS = 1_000_000


def snapshot_with_batches(df: DataFrame, opts: SnapshotOptions) -> DataFrame:
    """Snapshot rows tagged with a batch number (replaces skip/limit
    pagination, O3): batch_id = (rank-1) / batch_size. One scan, no
    re-reads; consumers iterate batch_id groups.

    ``opts.limit`` is capped at MAX_BATCHED_SNAPSHOT_ROWS: batch ids come
    from a global (unpartitioned) row_number, which serializes onto one
    reducer — bounded by design for client-facing snapshots, wrong for
    table-scale exports (use the streaming pipeline for those).
    """
    if opts.limit > MAX_BATCHED_SNAPSHOT_ROWS:
        raise ValueError(
            f"snapshot_with_batches limit={opts.limit} exceeds "
            f"{MAX_BATCHED_SNAPSHOT_ROWS}: batch tagging is a single-"
            "reducer global window; page a bounded snapshot instead"
        )
    snap = snapshot_scan(df, opts)
    order = (
        [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in opts.sort]
        if opts.sort
        else [F.lit(1)]
    )
    w = Window.orderBy(*order)
    return snap.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / opts.batch_size).cast("int")
    )


def export_with_batches(
    df: DataFrame,
    sort: list[tuple[str, str]],
    batch_size: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered batch ids WITHOUT a global window — the
    table-scale replacement for skip/limit pagination (O3) when the
    export is not client-bounded.

    Shape: range-repartition on the sort keys (globally ordered
    partitions) → per-partition rank (window partitioned by partition
    id: every group is one partition, all reducers busy) → driver
    cumsum of ~n_partitions counts → batch_id = (offset + rank - 1) /
    batch_size. The heaviest stage is the range shuffle itself; nothing
    funnels through one task.

    The range-partitioned frame is persisted so the count pass and the
    output pass see the SAME sampled range boundaries (two actions over
    an unpersisted range shuffle may re-sample differently); the result
    is eagerly materialized (localCheckpoint) and the source cache
    released before returning, so repeated exports in a long-lived
    session don't pin stale copies of the table in executor storage.
    """
    out, parted = _export_with_batches_lazy(df, sort, batch_size, n_partitions)
    out = out.localCheckpoint(eager=True)
    parted.unpersist()
    return out


def _export_with_batches_lazy(
    df: DataFrame,
    sort: list[tuple[str, str]],
    batch_size: int,
    n_partitions: int | None = None,
):
    """Internals of export_with_batches pre-materialization — returns
    (lazy output, persisted source) so plan tests can assert the
    no-single-reducer shape before AQE/checkpoint obscure it."""
    order = [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in sort]
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["c"] for r in
              parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = parted.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    out = (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "batch_id", ((F.col("_off") + F.col("_rn") - 1) / batch_size).cast("int")
        )
        .drop("_pid", "_off", "_rn")
    )
    return out, parted
