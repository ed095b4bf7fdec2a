"""Two-cluster-size scaling benchmark (BASELINE.json north rule).

A real N vs 4N executor comparison isn't possible in this sandbox, so —
per BASELINE.md — the identical CDC job runs at ``local[8]`` and
``local[32]`` (separate JVMs, same pre-generated feed) and we report
sustained events/sec at both plus scaling efficiency
``(eps_32 / eps_8) / 4``.

Usage:
    python tools/bench_scaling.py [--convs 50000] [--out BENCH.md]
    python tools/bench_scaling.py worker --cores N --feed DIR   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORK = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/aktuell_scaling")


def gen_feed(n_convs: int) -> tuple[str, int]:
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.session import get_spark
    from aktuell_spark.streaming.pipeline import write_change_feed

    feed = os.path.join(WORK, "feed")
    marker = os.path.join(WORK, f"feed_ready_{n_convs}")
    if os.path.exists(marker):
        with open(marker) as f:
            return feed, int(f.read())
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="scaling_gen", cores=32)
    t = gen_transcripts(spark, n_convs=n_convs, avg_turns=20, hot_turns=400, seed=42)
    ch = gen_transcript_changes(t, seed=42).localCheckpoint()
    n = ch.count()
    write_change_feed(ch, feed, n_files=32)
    spark.stop()
    with open(marker, "w") as f:
        f.write(str(n))
    return feed, n


def run_worker(cores: int, feed: str) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "worker", "--cores", str(cores), "--feed", feed],
        capture_output=True, text=True, timeout=3600,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def worker_main(cores: int, feed: str) -> None:
    from aktuell_spark.session import get_spark
    from aktuell_spark.streaming.metrics import ProgressRecorder
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    base = tempfile.mkdtemp(prefix=f"scale{cores}_")
    t0 = time.time()
    _, table = run_cdc_pipeline(
        spark, feed, f"{base}/table", f"{base}/ckpt",
        n_buckets=64, max_files_per_trigger=8,
    )
    wall = time.time() - t0
    n_rows = table.read().count()
    time.sleep(2)  # listener bus drain
    summ = rec.summary()
    events = summ.get("total_rows", 0)
    print(json.dumps({
        "cores": cores,
        "events": events,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(events / wall, 1),
        "p95_batch_sec": summ.get("p95_batch_sec"),
        "p50_batch_sec": summ.get("p50_batch_sec"),
        "batches": summ.get("batches"),
        "materialized_rows": n_rows,
    }))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    w = sub.add_parser("worker")
    w.add_argument("--cores", type=int, required=True)
    w.add_argument("--feed", required=True)
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--out", default="BENCH.md")
    args, _ = ap.parse_known_args()

    if args.cmd == "worker":
        worker_main(args.cores, args.feed)
        return

    feed, n_events = gen_feed(args.convs)
    print(f"feed ready: {n_events} events", file=sys.stderr)
    r8 = run_worker(8, feed)
    print("local[8]:", r8, file=sys.stderr)
    r32 = run_worker(32, feed)
    print("local[32]:", r32, file=sys.stderr)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / 4.0

    result = {"n_events": n_events, "local8": r8, "local32": r32,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = f"""# BENCH — streaming CDC scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox method (per BASELINE.md): identical exactly-once CDC job — file
feed -> subscription filter -> foreachBatch LWW MERGE into the bucketed
table — run in separate JVMs at `local[8]` and `local[32]` over the same
pre-generated feed ({n_events:,} change events, seed 42,
maxFilesPerTrigger=8, 64 buckets).

| cluster size | events | wall (s) | sustained events/s | p50 batch (s) | p95 batch (s) |
|---|---|---|---|---|---|
| local[8]  (N)  | {r8['events']:,} | {r8['wall_sec']} | {r8['events_per_sec']:,} | {r8['p50_batch_sec']} | {r8['p95_batch_sec']} |
| local[32] (4N) | {r32['events']:,} | {r32['wall_sec']} | {r32['events_per_sec']:,} | {r32['p50_batch_sec']} | {r32['p95_batch_sec']} |

**Scaling efficiency (eps_4N / eps_N) / 4 = {eff:.3f}**

p95 end-to-end sync latency (event ingest -> row visible in the sink)
is bounded by the p95 micro-batch trigger duration above: every event in
a batch is queryable after its foreachBatch commit.

Caveats: single-host local mode shares one page cache and memory bus
between "executors"; the 8-core run still benefits from 32 hardware
threads for GC/IO, which deflates measured efficiency vs a true
multi-host cluster.
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
