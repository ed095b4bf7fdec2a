"""Interval (range) join: pair events whose timestamps fall within a
bounded window of each other — "every click within 5 minutes after an
error", "every tool result within 60 s of its call". The reference's
client reacts to one event at a time (/root/reference/pkg/client/
client.go:299-326) and cannot express cross-event temporal joins at
all; Spark CAN express them as a theta-join, but plans them as
BroadcastNestedLoopJoin / CartesianProduct — quadratic work that dies
at corpus scale.

This operator plans the O(N) shape instead: quantize time into buckets
of width = the window span, duplicate the LEFT side into each bucket a
match could land in (a fixed 2-copy explode — the span covers at most
2 buckets after shifting), equi-join on (key, bucket), then refine
with the exact range predicate. Work is linear in input plus true
matches; the join is a plain shuffled hash/sort-merge equi-join, never
a nested loop (plan-asserted in tests/test_plans.py).

Semantics: (l, r) pairs with r.ts - l.ts in [lower, upper] seconds
(inclusive) and l.key == r.key. Comparison is exact MICROSECOND
arithmetic (unix_micros here, epoch_us in the DuckDB oracle) — a
seconds-granularity epoch truncates sub-second timestamps and Spark
truncates where DuckDB rounds, producing off-by-one-second gaps on
the same data (observed, not hypothetical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(col) -> "F.Column":
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lower: int,
    upper: int,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with ``right.ts - left.ts`` in
    ``[lower, upper]`` seconds and equal ``key``.

    Output: every left column prefixed ``l_``, every right column
    prefixed ``r_``, plus ``gap_seconds``. ``upper > lower`` required;
    negative bounds express "right before left".
    """
    if upper <= lower:
        raise ValueError(f"need upper > lower, got [{lower}, {upper}]")
    lower_us, upper_us = lower * 1_000_000, upper * 1_000_000
    span = upper_us - lower_us
    l = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        _epoch_us(F.col(left_ts)).alias("_lt"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        _epoch_us(F.col(right_ts)).alias("_rt"),
    )
    # shift right so the window becomes [0, span]; bucket width = span.
    # A left row in bucket b matches shifted-right rows in buckets
    # {b, b+1} only, so TWO left copies cover every candidate.
    # integral `div`, not floor(double division): epoch micros sit near
    # 2^50 and a one-ulp error in the double quotient flips the bucket
    # at exact boundaries. `div` truncates toward zero, which equals
    # floor for the non-negative epochs this joins (post-1970 data).
    r = r.withColumn("_rs", F.col("_rt") - F.lit(lower_us)).withColumn(
        "_rbucket", F.expr(f"_rs div {span}")
    )
    l = l.withColumn("_lb0", F.expr(f"_lt div {span}")).withColumn(
        "_lbucket",
        F.explode(F.array(F.col("_lb0"), F.col("_lb0") + 1)),
    )
    joined = l.join(
        r,
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col("_lbucket") == F.col("_rbucket")),
    )
    out = joined.filter(
        (F.col("_rt") - F.col("_lt") >= lower_us)
        & (F.col("_rt") - F.col("_lt") <= upper_us)
    ).withColumn("_gap_us", F.col("_rt") - F.col("_lt")).withColumn(
        "gap_seconds", F.floor(F.col("_gap_us") / 1_000_000)
    )
    drop = [c for c in out.columns if c.startswith("_")]
    return out.drop(*drop)
