"""Time-window rollups: tumbling, sliding, session.

The reference computes all of these client-side over the live stream
(changes/sec + totals: react-client/src/types/aktuell.ts:64-69,
Stats.tsx:54-94; "last changes" ring buffer: useAktuellStream.ts:248;
idle-close analogue: 60 s read deadline, pkg/server/websocket.go:336-345).
Here they are declarative groupBys that run identically in batch and in
Structured Streaming (append/update mode with a watermark).

Scale: each rollup is one map-side-combinable shuffle on
(key, window) — partial aggregation happens before the exchange, so
cardinality at the shuffle is windows × keys, not input rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "5 minutes",
    keys: Sequence[str] = (),
    agg: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling-window counts per key (SURVEY §2.5 W3).

    Output: keys..., window_start (epoch seconds, long), n.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for col, fn in (agg or {}).items():
        aggs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    out_cols = ["n"] + [f"{fn}_{col}" for col, fn in (agg or {}).items()]
    return (
        df.groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            *[F.col(x) for x in out_cols],
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "60 seconds",
    slide: str = "10 seconds",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Sliding-window counts (W2 — the changes/sec dashboard stat).

    Output: keys..., window_start (epoch seconds), n. Each row lands in
    size/slide windows; Spark's native window() expands them without a
    Python loop.
    """
    return (
        df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(*keys, F.col("w.start").cast("timestamp").cast("long").alias("window_start"), "n")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Sequence[str] = ("conv_id",),
) -> DataFrame:
    """Session windows with inactivity gap (W4 — conversation close).

    Native ``session_window`` (Spark ≥3.2); in streaming it emits a
    session only once the watermark passes its close — exactly the
    "conversation closed on inactivity" CEP the north rule asks for.

    Output: keys..., session_start, last_ts (epoch seconds), n.
    """
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.max(ts_col).alias("_last"))
        .select(
            *keys,
            F.col("w.start").cast("timestamp").cast("long").alias("session_start"),
            F.col("_last").cast("timestamp").cast("long").alias("last_ts"),
            "n",
        )
    )


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """Parse a Spark interval string ('5 minutes') to seconds.

    Raises on unknown units instead of silently mis-scaling the rate
    divisor (a '5 minutes' window must divide by 300, not 5).
    """
    parts = spec.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNIT_SECONDS:
        raise ValueError(f"unsupported interval spec {spec!r}; use '<n> <unit>'")
    return int(parts[0]) * _UNIT_SECONDS[parts[1].lower()]


def rate_per_second(
    df: DataFrame, ts_col: str = "ts", size: str = "60 seconds", slide: str = "10 seconds"
) -> DataFrame:
    """Events/sec over a sliding window (dashboard changesPerSecond,
    react-client/src/types/aktuell.ts:66)."""
    size_s = _interval_seconds(size)
    return sliding_counts(df, ts_col, size, slide).withColumn(
        "rate_per_sec", F.round(F.col("n") / F.lit(size_s), 4)
    )
