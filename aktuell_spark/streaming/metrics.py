"""Streaming observability: per-query progress metrics + lineage.

Replaces the reference's hand-rolled stats and heartbeats
(SyncStats /root/reference/pkg/sync/manager.go:126-142, ping/pong
liveness /root/reference/pkg/server/websocket.go:336-345): a
``StreamingQueryListener`` records every micro-batch's rows, durations,
and watermark; per-partition lineage columns are stamped by
``with_lineage``. Progress JSON is the query heartbeat — no sockets.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects micro-batch progress; optionally appends JSONL to disk.

    Thread-safe (listener callbacks arrive on Spark's listener bus
    thread). ``summary()`` yields sustained rows/sec and duration
    percentiles — the numbers BENCH.md reports.
    """

    def __init__(self, out_path: str | None = None) -> None:
        self.progress: list[dict] = []
        self.out_path = out_path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "timestamp": p.timestamp,
            "event_time": dict(p.eventTime or {}),
        }
        # Observation-API data-quality counters (observe_quality):
        # computed inside the batch's own job, surfaced per micro-batch
        obs = dict(p.observedMetrics or {})
        if obs:
            rec["observed"] = {
                name: row.asDict() for name, row in obs.items()
            }
        with self._lock:
            self.progress.append(rec)
            if self.out_path:
                os.makedirs(os.path.dirname(self.out_path), exist_ok=True)
                with open(self.out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict:
        with self._lock:
            rows = [p for p in self.progress if p["num_input_rows"] > 0]
        if not rows:
            return {"batches": 0}
        total_rows = sum(p["num_input_rows"] for p in rows)
        durs = sorted(
            (p["duration_ms"].get("triggerExecution", 0)) / 1000.0 for p in rows
        )
        total_sec = sum(durs)
        p95 = durs[max(0, int(len(durs) * 0.95) - 1)]
        return {
            "batches": len(rows),
            "total_rows": total_rows,
            "busy_sec": round(total_sec, 3),
            "rows_per_sec": round(total_rows / total_sec, 1) if total_sec else None,
            "p50_batch_sec": round(durs[len(durs) // 2], 3),
            "p95_batch_sec": round(p95, 3),
        }


def with_lineage(df: DataFrame, batch_id: int | None = None) -> DataFrame:
    """Stamp per-partition lineage columns (north rule): source file,
    partition id, and micro-batch id. Cheap metadata columns — no data
    movement."""
    out = df.withColumn("_partition_id", F.spark_partition_id())
    try:
        out = out.withColumn("_source_file", F.col("_metadata.file_path"))
    except Exception:
        out = out.withColumn("_source_file", F.input_file_name())
    if batch_id is not None:
        out = out.withColumn("_batch_id", F.lit(batch_id))
    return out


def observe_quality(stream: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach per-micro-batch data-quality counters via the Observation
    API (the Spark-native way to get in-stream metrics WITHOUT a second
    job): event count, null-text rows, delete ops, and distinct-ish
    conversation reach per batch — computed inside the batch's own job
    and delivered on the progress event (ProgressRecorder stores them
    under ``observed``). Zero extra passes, zero driver collects."""
    return stream.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum((F.col("op") == "delete").cast("long")).alias("n_deletes"),
        F.approx_count_distinct("conv_id").alias("approx_convs"),
    )
