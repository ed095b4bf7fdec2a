"""Benchmark harness: headline queries + streaming CDC throughput.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "cdc_events_per_sec": N, ...}

Query timings force full execution through the noop sink (no driver
collect overhead). The streaming benchmark generates a deterministic
transcript CDC feed sized to the scale factor, then times the full
exactly-once pipeline (read → filter → merge), reporting sustained
events/sec and per-epoch p95 merge latency.

Two-cluster-size scaling evidence (local[8] vs local[32]) is produced by
``tools/bench_scaling.py`` (separate JVMs per parallelism level) and
recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aktuell_spark.queries import EXTRA_QUERIES, QUERIES
from aktuell_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    name = os.path.basename(d.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _release_persisted(spark) -> None:
    """Drop blocks pinned by queries that localCheckpoint intermediates
    (winnowing posting lists, component edge lists). Left resident they
    raise GC pressure for every LATER query in the shared JVM — the CDC
    stream measured 2x slower at suite position 60 than in isolation
    until this cleanup landed. A real deployment runs one job per
    cluster; only the shared-suite harness needs this."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        jrdd.unpersist(False)
    spark.catalog.clearCache()


def time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = round(time.time() - t0, 3)
    _release_persisted(spark)
    return elapsed


def bench_streaming_cdc(spark, sf: float) -> dict:
    """Time the exactly-once CDC pipeline on a generated feed sized ~sf."""
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline, write_change_feed

    n_convs = max(200, int(50_000 * sf))
    base = tempfile.mkdtemp(prefix="aktuell_bench_")
    try:
        t = gen_transcripts(spark, n_convs=n_convs, avg_turns=20, hot_turns=400, seed=42)
        ch = gen_transcript_changes(t, seed=42).localCheckpoint()
        n_events = ch.count()
        write_change_feed(ch, f"{base}/feed", n_files=8)

        t0 = time.time()
        _, table = run_cdc_pipeline(
            spark,
            f"{base}/feed",
            f"{base}/table",
            f"{base}/ckpt",
            n_buckets=max(CPUS, 32),
            max_files_per_trigger=2,
        )
        elapsed = time.time() - t0
        # merge-on-read mode over the same feed (append LSM runs): the
        # sustained-ingest variant; must materialize identical rows
        t1 = time.time()
        _, mor_table = run_cdc_pipeline(
            spark,
            f"{base}/feed",
            f"{base}/mor_table",
            f"{base}/mor_ckpt",
            n_buckets=max(CPUS, 32),
            max_files_per_trigger=2,
            merge_on_read=True,
        )
        mor_elapsed = time.time() - t1
        mor_rows = mor_table.read().count()
        cow_rows = table.read().count()
        assert mor_rows == cow_rows, (mor_rows, cow_rows)
        # per-epoch merge latency from the sink's lineage sidecars
        merges = []
        for f in os.listdir(table.metrics_dir):
            with open(os.path.join(table.metrics_dir, f)) as fh:
                merges.append(json.load(fh)["merge_sec"])
        merges.sort()
        p95 = merges[max(0, int(len(merges) * 0.95) - 1)] if merges else None
        return {
            "cdc_events": n_events,
            "cdc_wall_sec": round(elapsed, 3),
            "cdc_events_per_sec": round(n_events / elapsed, 1),
            "cdc_epochs": len(merges),
            "cdc_p95_merge_sec": p95,
            "cdc_mor_wall_sec": round(mor_elapsed, 3),
            "cdc_mor_events_per_sec": round(n_events / mor_elapsed, 1),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(app_name="aktuell_bench", cores=CPUS, shuffle_partitions=CPUS)

    # warm-up: JVM/codegen/parquet footer caches + Python/Arrow worker
    # pool (first pandas-UDF call pays ~10s of one-time session setup);
    # op_counts rotates between QUERIES/EXTRA_QUERIES round to round
    _warm = {**QUERIES, **EXTRA_QUERIES}["op_counts"]
    _warm[0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    from aktuell_spark.functions.multimodal import extract_features, synthesize_media

    extract_features(synthesize_media(spark, n=8)).write.format("noop").mode(
        "overwrite"
    ).save()

    # graded registry = the headline suite (the driver's 50-entry
    # correctness window); rotated-out standalone queries keep their
    # per-operator timings in a separate dict so round-over-round
    # per-query comparisons survive the r5 registry reshuffle without
    # double-counting the merged families in the headline total
    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        timings[name] = time_query(fn, spark, SF_DIR)
    extra_timings: dict[str, float] = {}
    for name, (fn, _sql) in EXTRA_QUERIES.items():
        extra_timings[name] = time_query(fn, spark, SF_DIR)

    stream = bench_streaming_cdc(spark, sf)
    timings["stream_cdc_materialize"] = stream["cdc_wall_sec"]
    timings["stream_cdc_mor"] = stream["cdc_mor_wall_sec"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query suite + streaming CDC merge, wall sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra_timings,
        "extra_total_sec": round(sum(extra_timings.values()), 3),
        "sf": sf,
        "cpus": CPUS,
        **stream,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
