"""CEP sequence detection: contiguous event patterns per key.

The reference is billed as a real-time sync/CEP layer but ships no
pattern operator — its closest analogue is the client-side handler
chain reacting to one event at a time (/root/reference/pkg/client/
client.go:299-326). This operator adds the MATCH_RECOGNIZE-style
primitive a CEP engine needs: detect ``steps`` — a list of boolean SQL
predicates — matched by CONSECUTIVE events of one key's ordered
stream, with the whole span inside a time budget.

Contiguity (AB must be adjacent, not merely ordered) is the
deterministic, SQL-mirrorable semantics: a match at row i means
step[j] holds at row i+j for every j. Skipping variants (A ... B)
compose from this by pre-filtering the stream to relevant event types
before detection.

Scale shape: ONE shuffle (the per-key window); each extra pattern step
is one more ``lead`` over the same window spec, so Spark evaluates all
leads in a single window physical node. No joins, no state blowup —
at 10^12 events this is a partition-local linear scan after the
shuffle, and AQE/salting handle hot keys exactly as for the rollup
windows (SURVEY §2.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_sequence(
    df: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Rows starting a contiguous match of ``steps`` for their key.

    Returns one row per match: the key, the first matched event's
    order/ts (``start_*``), the last matched event's order/ts
    (``end_*``), and ``span_seconds``. ``within_seconds`` bounds
    end_ts - start_ts (None = unbounded).
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of SQL predicates")
    w = Window.partitionBy(key_col).orderBy(order_col)
    out = df
    conds = []
    for j, pred in enumerate(steps):
        hit = F.expr(pred)
        conds.append(F.lead(hit, j).over(w) if j else hit)
    last = len(steps) - 1
    end_order = F.lead(F.col(order_col), last).over(w) if last else F.col(order_col)
    end_ts = F.lead(F.col(ts_col), last).over(w) if last else F.col(ts_col)
    match = conds[0]
    for c in conds[1:]:
        match = match & c
    out = (
        out.withColumn("_match", match)
        .withColumn("_end_order", end_order)
        .withColumn("_end_ts", end_ts)
        .filter(F.col("_match"))
    )
    # epoch-second floor diff: timestamps may arrive as TIMESTAMP_NTZ
    # (plain parquet), which Spark won't cast to long directly; NTZ →
    # LTZ under the engine's pinned UTC session timezone is exactly
    # DuckDB's epoch(naive-ts) semantics, keeping the oracle bit-equal
    def _secs(c):
        return c.cast("timestamp_ltz").cast("long")

    span = _secs(F.col("_end_ts")) - _secs(F.col(ts_col))
    out = out.select(
        F.col(key_col),
        F.col(order_col).alias("start_" + order_col),
        F.col(ts_col).alias("start_ts"),
        F.col("_end_order").alias("end_" + order_col),
        F.col("_end_ts").alias("end_ts"),
        span.alias("span_seconds"),
    )
    if within_seconds is not None:
        out = out.filter(F.col("span_seconds") <= within_seconds)
    return out
