"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC query on sf0.001; ``queries`` exposes
every implemented operator from SURVEY.md §2 (registry in
``aktuell_spark.queries``); ``oracle_sql`` gives the DuckDB oracle per
query (omitted for non-SQL-expressible streaming/stateful ops, which get
the driver's rows-only check).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aktuell_spark.queries import QUERIES, q_cdc_latest_image  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins materialization on sf0.001."""
    return q_cdc_latest_image(spark, "/root/testdata/sf0.001")


_FEED_CACHE: dict[bool, str] = {}


def _shared_feed(spark: SparkSession, partial_updates: bool) -> str:
    """Generate the CDC replay feed ONCE per (partial_updates) shape and
    share it across the three streaming variants — the generation (a
    Spark job + file write) used to dominate each variant's cost and the
    52-query driver run. Tables/checkpoints stay per-call (fresh
    exactly-once state is the thing under test); the cached feed is
    read-only input."""
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.streaming.pipeline import write_change_feed

    if partial_updates not in _FEED_CACHE:
        base = tempfile.mkdtemp(prefix="aktuell_feed_")
        t = gen_transcripts(spark, n_convs=30, avg_turns=8, hot_turns=60, seed=42)
        ch = gen_transcript_changes(
            t, seed=42, partial_updates=partial_updates
        ).localCheckpoint()
        write_change_feed(ch, f"{base}/feed", n_files=4)
        _FEED_CACHE[partial_updates] = f"{base}/feed"
    return _FEED_CACHE[partial_updates]


def _stream_cdc(
    spark: SparkSession, merge_on_read: bool, partial_updates: bool = False
) -> DataFrame:
    """Full streaming path: generated transcript CDC feed → stream →
    exactly-once foreachBatch MERGE → materialized table."""
    from aktuell_spark.session import _ship_package
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline

    _ship_package(spark)
    feed = _shared_feed(spark, partial_updates)
    base = tempfile.mkdtemp(prefix="aktuell_stream_")
    try:
        _, table = run_cdc_pipeline(
            spark, feed, f"{base}/table", f"{base}/ckpt",
            n_buckets=8, merge_on_read=merge_on_read,
            partial_updates=partial_updates,
        )
        out = table.read().localCheckpoint()  # materialize before cleanup
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _stream_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write streaming MERGE (rows-only check): non-SQL-
    expressible stateful streaming."""
    return _stream_cdc(spark, merge_on_read=False)


def _stream_cdc_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read streaming mode (rows-only check): epochs append
    LSM-style bucket runs, reads collapse — must materialize the exact
    same rows as the copy-on-write path."""
    return _stream_cdc(spark, merge_on_read=True)


def _stream_cdc_mor_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read × partial updates (rows-only check): LSM runs store
    delta columns, reads reconstruct post-images — must materialize the
    exact same rows as the copy-on-write partial path (pytest asserts
    the byte equivalence; this query pins the row shape)."""
    return _stream_cdc(spark, merge_on_read=True, partial_updates=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly DRIVER_WINDOW (50) entries: the rotated head (round-7
    stalest-first policy: the 26 queries last graded in round 4 + the 4
    new round-7 operators — two library promotions and the two new
    stream-maintained indexes), then the three rows-only streaming
    variants, then a tail that re-grades the two materially-changed
    incremental indexes and refreshes the r5-graded block — every entry
    gets a driver correctness row and the rotation is pinned by
    tests/test_registry_window.py."""
    from aktuell_spark.queries import STREAM_INSERT_AFTER

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in QUERIES.items():
        out[name] = fn
        if name == STREAM_INSERT_AFTER:
            out["stream_cdc_materialize"] = _stream_cdc_materialize
            out["stream_cdc_mor"] = _stream_cdc_mor
            out["stream_cdc_mor_partial"] = _stream_cdc_mor_partial
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
