"""Per-query isolation bench (round-8 optimization instrumentation).

``bench.py`` is the frozen driver contract; this harness is the
guide-§1 measurement loop used while optimizing: run named queries
through the noop sink (full materialization, no sink cost) N times
inside ONE warm session, releasing persisted blocks between runs, and
print per-run seconds plus the min/mean. The min over repeats is the
noise-robust statistic on this multi-tenant host (single full-bench
runs swing up to 2x run-to-run — see BENCH.md).

Usage:
    python bench_extra.py [-n REPEATS] query [query ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py \
        repeated_spans dedup_incremental

A streaming warm-up (one cheap incremental-index replay at sf0.01)
precedes measurement so the first streaming query doesn't absorb the
one-time micro-batch machinery setup that bench.py amortizes across
its suite.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aktuell_spark.queries import EXTRA_QUERIES, QUERIES
from aktuell_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    reg = {**QUERIES, **EXTRA_QUERIES}
    names = args or ["repeated_spans"]
    spark = get_spark(app_name="bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    reg["op_counts"][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    if any("incremental" in n or n.startswith("stream") for n in names):
        reg["dedup_incremental"][0](spark, "/root/testdata/sf0.01").write.format(
            "noop"
        ).mode("overwrite").save()

    def release() -> None:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
        spark.catalog.clearCache()

    release()
    for name in names:
        fn, _ = reg[name]
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            release()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:28s} min={min(samples):7.2f} "
            f"mean={sum(samples) / len(samples):7.2f} runs={samples}"
        )


if __name__ == "__main__":
    main()
