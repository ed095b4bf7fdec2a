"""As-of join: attach the most recent right-side row at or before each
left row's event time, per key.

The reference's dashboard answers "what was the last tool call when
this turn happened" by scanning its in-memory event array
(/root/reference/react-client/src/hooks/useAktuellStream.ts:125-171
keeps events newest-first and the UI picks the first match); at engine
scale the same question is an AS-OF join. Spark has no native asof
operator (pandas-on-Spark merge_asof exists but shuffles per call and
is driver-orchestrated), so this is the classic union + last-non-null
window composition:

    union(left tagged, right tagged)
      → window per key ordered by (ts, side)   # right sorts first on ties
      → last(right payload, ignorenulls) over rows unbounded→current
      → keep left rows; optional tolerance filter

Scale shape: ONE shuffle on the join key, then a partition-local sort —
the same cost Catalyst pays for any stream-stream interval join.
Per-key data volume bounds the window state; hot keys are bounded by
the tolerance filter applied before the window when given (rows older
than ``tolerance`` before the oldest possible match are still needed,
so pre-filtering is only sound on the left side; we filter after).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_s: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the newest right row with
    ``right_ts <= left_ts`` on the same key (backward as-of), or nulls.

    ``right_cols`` defaults to every non-key right column; they come
    back suffixed. ``tolerance_s`` drops matches older than the given
    seconds (the match becomes null, the left row stays).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    rpay = F.struct(
        F.col(right_ts).cast("timestamp").alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols if c != right_ts],
    )
    lcols = [c for c in left.columns if c not in on]
    l = left.select(
        *on,
        F.col(left_ts).cast("timestamp").alias("__evt"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in lcols]).alias("__lpay"),
        F.lit(None).cast(
            right.select(rpay.alias("x")).schema["x"].dataType.simpleString()
        ).alias("__rpay"),
    )
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("__evt"),
        F.lit(0).alias("__side"),  # ties: right row visible to same-ts left
        F.lit(None).cast(l.schema["__lpay"].dataType.simpleString()).alias("__lpay"),
        rpay.alias("__rpay"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__evt"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance_s is not None:
        match = F.when(
            F.col("__m.__ts") >= F.col("__evt") - F.expr(f"INTERVAL {tolerance_s} SECONDS"),
            F.col("__m"),
        )
    sel = [
        *on,
        *[F.col(f"__lpay.{c}").alias(c) for c in lcols],
    ]
    sel.append(match["__ts"].alias(f"{right_ts}{suffix}"))
    for c in right_cols:
        if c != right_ts:
            sel.append(match[c].alias(f"{c}{suffix}"))
    return out.select(*sel)
