"""Stateful CEP: turns × tool-call events join with per-conversation
ordered buffers, and inactivity-based conversation close.

North-rule J3/T6 (SURVEY §2.3/§2.8): the reference keeps per-client
subscription state in its hub (/root/reference/pkg/server/websocket.go:44,
499-501) and delivers in arrival order; here the per-key state is an
``applyInPandasWithState`` group state keyed by ``conv_id`` holding
ordered unmatched-turn / unmatched-call buffers, flushed on event-time
timeout — the Spark-native replacement for hub bookkeeping, with
watermark-driven cleanup instead of unbounded growth.

Two implementations are provided on purpose:

- ``join_turns_tools_stateful`` — custom CEP operator: emits an
  enriched row the moment both sides of (conv_id, turn_idx) have
  arrived, and flushes unmatched turns with null status when the
  watermark passes their timeout (the CEP "tool call never completed"
  signal the native join cannot express).
- ``join_turns_tools_native`` — plain watermarked stream-stream
  interval join (Catalyst-managed state) for the common case; prefer it
  when the unmatched-flush semantics aren't needed.

Scale: state is per-conversation and bounded by the watermark delay;
hot conversations are still one state key — the upstream salted
repartition (operators/skew.py) applies only to aggregations, so the
state-op shuffle must rely on conv_id cardinality ≫ cores, which holds
at 10^12-turn scale. RocksDB state store keeps buffers off-heap.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

JOIN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("turn_ts", T.TimestampType(), True),
        T.StructField("call_id", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("call_ts", T.TimestampType(), True),
    ]
)

# state: JSON-encoded ordered buffers of unmatched rows per side
STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_json", T.StringType(), True),
        T.StructField("calls_json", T.StringType(), True),
        T.StructField("last_us", T.LongType(), True),
    ]
)

_US = 1_000_000


def _union_sides(turns: DataFrame, tools: DataFrame) -> DataFrame:
    t = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        F.lit(None).cast("string").alias("call_id"),
        F.lit(None).cast("string").alias("status"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.lit("turn").alias("side"),
    )
    c = tools.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        "tool",
        "call_id",
        "status",
        F.col("ts").cast("timestamp").alias("ts"),
        F.lit("tool_event").alias("side"),
    )
    return t.unionByName(c)


def _make_join_fn(flush_gap_s: int):
    def fn(key, pdf_iter, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            # watermark passed the flush horizon: emit unmatched turns
            # with null status (tool never reported) AND unmatched calls
            # with null turn columns (turn never arrived — a data-quality
            # signal; silently dropping them hides feed gaps), then drop
            # the state
            (turns_json, calls_json, _last_us) = state.get
            turns = json.loads(turns_json) if turns_json else []
            calls = json.loads(calls_json) if calls_json else []
            state.remove()
            if turns or calls:
                turns.sort(key=lambda r: r["turn_idx"])
                calls.sort(key=lambda r: r["turn_idx"])
                yield pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "turn_idx": [r["turn_idx"] for r in turns]
                        + [r["turn_idx"] for r in calls],
                        "role": [r["role"] for r in turns] + [None] * len(calls),
                        "text": [r["text"] for r in turns] + [None] * len(calls),
                        "tool": [r["tool"] for r in turns]
                        + [r["tool"] for r in calls],
                        "turn_ts": [pd.Timestamp(r["ts"], unit="us") for r in turns]
                        + [pd.NaT] * len(calls),
                        "call_id": [None] * len(turns)
                        + [r["call_id"] for r in calls],
                        "status": [None] * len(turns) + [r["status"] for r in calls],
                        "call_ts": [pd.NaT] * len(turns)
                        + [pd.Timestamp(r["ts"], unit="us") for r in calls],
                    }
                )
            return

        if state.exists:
            (turns_json, calls_json, last_us) = state.get
            turns = {r["turn_idx"]: r for r in json.loads(turns_json or "[]")}
            calls = {r["turn_idx"]: r for r in json.loads(calls_json or "[]")}
        else:
            turns, calls, last_us = {}, {}, 0

        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts", kind="stable")
            for row in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(row.ts).value // 1000)
                last_us = max(last_us, ts_us)
                if row.side == "turn":
                    rec = {
                        "turn_idx": int(row.turn_idx),
                        "role": row.role,
                        "text": row.text,
                        "tool": row.tool,
                        "ts": ts_us,
                    }
                    if int(row.turn_idx) in calls:
                        c = calls.pop(int(row.turn_idx))
                        out.append((rec, c))
                    else:
                        turns[int(row.turn_idx)] = rec
                else:
                    rec = {
                        "turn_idx": int(row.turn_idx),
                        "call_id": row.call_id,
                        "status": row.status,
                        "tool": row.tool,
                        "ts": ts_us,
                    }
                    if int(row.turn_idx) in turns:
                        t = turns.pop(int(row.turn_idx))
                        out.append((t, rec))
                    else:
                        calls[int(row.turn_idx)] = rec

        state.update(
            (json.dumps(sorted(turns.values(), key=lambda r: r["turn_idx"])),
             json.dumps(sorted(calls.values(), key=lambda r: r["turn_idx"])),
             last_us)
        )
        # flush unmatched once the watermark passes (last event time +
        # gap). NOT getCurrentWatermarkMs()+gap: the watermark is 0 in
        # the first micro-batch, which would anchor the timeout in 1970
        # and fire it the moment the watermark jumps to real event time.
        # Spark requires the timeout to sit strictly beyond the current
        # watermark, hence the max().
        timeout_ms = max(last_us // 1000 + flush_gap_s * 1000,
                         state.getCurrentWatermarkMs() + 1000)
        state.setTimeoutTimestamp(timeout_ms)

        if out:
            out.sort(key=lambda p: p[0]["turn_idx"])
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": [t["turn_idx"] for t, _ in out],
                    "role": [t["role"] for t, _ in out],
                    "text": [t["text"] for t, _ in out],
                    "tool": [t["tool"] for t, _ in out],
                    "turn_ts": [pd.Timestamp(t["ts"], unit="us") for t, _ in out],
                    "call_id": [c["call_id"] for _, c in out],
                    "status": [c["status"] for _, c in out],
                    "call_ts": [pd.Timestamp(c["ts"], unit="us") for _, c in out],
                }
            )

    return fn


def _batch_join_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch fallback: same matcher, run once per conv over all rows
    (stream-at-end semantics — unmatched turns emitted with nulls)."""
    pdf = pdf.sort_values("ts", kind="stable")
    turns_buf: dict[int, dict] = {}
    calls_buf: dict[int, dict] = {}
    out = []
    for row in pdf.itertuples(index=False):
        idx = int(row.turn_idx)
        if row.side == "turn":
            rec = {"turn_idx": idx, "role": row.role, "text": row.text,
                   "tool": row.tool, "ts": row.ts}
            if idx in calls_buf:
                out.append((rec, calls_buf.pop(idx)))
            else:
                turns_buf[idx] = rec
        else:
            rec = {"turn_idx": idx, "call_id": row.call_id,
                   "status": row.status, "tool": row.tool, "ts": row.ts}
            if idx in turns_buf:
                out.append((turns_buf.pop(idx), rec))
            else:
                calls_buf[idx] = rec
    for idx in sorted(turns_buf):  # flush unmatched turns
        out.append((turns_buf[idx], None))
    for idx in sorted(calls_buf):  # flush unmatched (orphan) calls too
        out.append((None, calls_buf[idx]))
    out.sort(key=lambda p: (p[0] or p[1])["turn_idx"])
    conv = pdf["conv_id"].iloc[0] if len(pdf) else None
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": [(t or c)["turn_idx"] for t, c in out],
            "role": [t["role"] if t else None for t, _ in out],
            "text": [t["text"] if t else None for t, _ in out],
            "tool": [(t or c)["tool"] for t, c in out],
            "turn_ts": [t["ts"] if t else pd.NaT for t, _ in out],
            "call_id": [c["call_id"] if c else None for _, c in out],
            "status": [c["status"] if c else None for _, c in out],
            "call_ts": [c["ts"] if c else pd.NaT for _, c in out],
        }
    )


def join_turns_tools_stateful(
    turns: DataFrame,
    tools: DataFrame,
    watermark: str = "1 hour",
    flush_gap_s: int = 3600,
) -> DataFrame:
    """Stateful turns×tools join with ordered per-conversation buffers.

    Streaming input runs the stateful operator; batch input (Spark 4
    forbids ``applyInPandasWithState`` in batch) runs an equivalent
    ``applyInPandas`` with stream-at-end semantics — every timeout has
    fired, so output = matches plus unmatched turns flushed with null
    status.
    """
    unioned = _union_sides(turns, tools)
    if not unioned.isStreaming:
        return unioned.groupBy("conv_id").applyInPandas(
            _batch_join_fn, schema=JOIN_OUTPUT_SCHEMA
        )
    unioned = unioned.withWatermark("ts", watermark)
    return unioned.groupBy("conv_id").applyInPandasWithState(
        _make_join_fn(flush_gap_s),
        outputStructType=JOIN_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def join_turns_tools_native(
    turns: DataFrame, tools: DataFrame, watermark: str = "1 hour", range_s: int = 120
) -> DataFrame:
    """Native watermarked stream-stream join (J3 comparison variant).

    Equi-join on (conv_id, turn_idx) plus an event-time range bound so
    Catalyst can GC join state; inner matches only.
    """
    t = turns.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts").alias("turn_ts"),
    )
    c = tools.select(
        F.col("conv_id").alias("c_conv_id"),
        F.col("turn_idx").alias("c_turn_idx"),
        "call_id", "status",
        F.col("ts").alias("call_ts"),
    )
    if t.isStreaming:
        t = t.withWatermark("turn_ts", watermark)
        c = c.withWatermark("call_ts", watermark)
    cond = (
        (F.col("conv_id") == F.col("c_conv_id"))
        & (F.col("turn_idx") == F.col("c_turn_idx"))
        & (F.col("call_ts") >= F.col("turn_ts") - F.expr(f"INTERVAL {range_s} SECONDS"))
        & (F.col("call_ts") <= F.col("turn_ts") + F.expr(f"INTERVAL {range_s} SECONDS"))
    )
    return t.join(c, cond, "inner").select(
        "conv_id", "turn_idx", "role", "text", "tool",
        "turn_ts", "call_id", "status", "call_ts",
    )


def close_conversations_stateful(
    turns: DataFrame, gap_s: int = 1800
) -> DataFrame:
    """CEP: emit (conv_id, n_turns, first_ts, last_ts) when a
    conversation has been idle for ``gap_s`` (event time) — the
    stateful counterpart of ``session_window`` that also carries
    accumulated per-conversation aggregates."""
    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_turns", T.LongType(), False),
            T.StructField("first_ts", T.TimestampType(), True),
            T.StructField("last_ts", T.TimestampType(), True),
        ]
    )
    st_schema = T.StructType(
        [
            T.StructField("n", T.LongType(), True),
            T.StructField("first_us", T.LongType(), True),
            T.StructField("last_us", T.LongType(), True),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return
        n, first_us, last_us = (state.get if state.exists else (0, None, None))
        for pdf in pdf_iter:
            ts_us = pdf["ts"].astype("int64") // 1000
            n += len(pdf)
            first_us = min(x for x in [first_us, int(ts_us.min())] if x is not None)
            last_us = max(x for x in [last_us or 0, int(ts_us.max())])
        state.update((n, first_us, last_us))
        # anchor to last event time; keep strictly beyond the watermark
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_s * 1000, state.getCurrentWatermarkMs() + 1000)
        )
        return
        yield  # pragma: no cover — generator form

    src = turns.select("conv_id", F.col("ts").cast("timestamp").alias("ts"))
    if src.isStreaming:
        src = src.withWatermark("ts", f"{gap_s} seconds")
    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=st_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
