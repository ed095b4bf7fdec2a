"""Native stream-stream event-time join (Spark built-in), the
declarative sibling of the buffered `stateful.join_turns_tools_stateful`.

Two watermarked streams join on key equality plus a bounded event-time
range; Spark's state store buffers each side only within the watermark
bound and evicts as it advances — state is O(events inside the time
window), not O(stream). This is SURVEY §2.3 J3's native expression:
use it when plain match semantics suffice; the applyInPandasWithState
variant exists for what the native operator cannot express (ordered
per-conversation buffers, flush-with-null on timeout, custom match
priority).

Semantics (inner join, deterministic under bounded replay): tool events
pair with their turn when conv_id and turn_idx match and the tool
event's time is within ±``max_gap_s`` of the turn's — the generator
contract (fixtures §3: tool ts within ±60 s of the turn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_turns_tools_native(
    turns: DataFrame,
    tools: DataFrame,
    max_gap_s: int = 120,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner stream-stream join: (conv_id, turn_idx, role, text, tool,
    turn_ts, call_id, status, tool_ts, gap_seconds).

    Both sides must carry ``ts``; streaming inputs are watermarked so
    the state store evicts rows older than watermark + gap. Works
    identically on batch inputs (no watermark needed) — the join is the
    same logical plan either way.
    """
    t = turns.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts").alias("turn_ts"),
    )
    e = tools.select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("t_turn_idx"),
        "call_id", "status",
        F.col("ts").alias("tool_ts"),
    )
    if turns.isStreaming:
        t = t.withWatermark("turn_ts", watermark)
    if tools.isStreaming:
        e = e.withWatermark("tool_ts", watermark)
    cond = (
        (F.col("conv_id") == F.col("t_conv_id"))
        & (F.col("turn_idx") == F.col("t_turn_idx"))
        & (F.col("tool_ts") >= F.col("turn_ts") - F.expr(f"INTERVAL {max_gap_s} SECONDS"))
        & (F.col("tool_ts") <= F.col("turn_ts") + F.expr(f"INTERVAL {max_gap_s} SECONDS"))
    )
    return (
        t.join(e, cond, "inner")
        .drop("t_conv_id", "t_turn_idx")
        .withColumn(
            "gap_seconds",
            F.floor(
                (F.unix_micros(F.col("tool_ts")) - F.unix_micros(F.col("turn_ts")))
                / 1_000_000
            ),
        )
    )
