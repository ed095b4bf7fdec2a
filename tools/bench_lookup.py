"""Point-read pruning micro-benchmark.

Builds a BucketedUpsertTable from synthetic transcripts (same fixtures
as the scaling harness), then times three ways to fetch one
conversation's turns:

  full_scan   — table.read().filter(conv_id = k)  (every bucket dir)
  lookup      — table.lookup(k)                   (ONE bucket dir,
                driver-side XXH64, pushed filter)
  lookup_many — table.lookup_many(16 keys)        (<=16 bucket dirs)

Prints one JSON line with wall times and the files-read counts, the
evidence behind SURVEY §12.8's O(table/n_buckets) claim. Run alone
(shares the machine with nothing) for stable numbers:

    python tools/bench_lookup.py --convs 200000 --buckets 64
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from aktuell_spark.fixtures import gen_transcript_changes, gen_transcripts
    from aktuell_spark.session import get_spark
    from aktuell_spark.streaming.sink import BucketedUpsertTable

    base = tempfile.mkdtemp(prefix="aktuell_lookup_")
    spark = get_spark(app_name="bench_lookup", cores=32)
    t = gen_transcripts(spark, n_convs=args.convs, avg_turns=20,
                        hot_turns=200, seed=42)
    ch = gen_transcript_changes(t, seed=42, seq_mode="hash")
    table = BucketedUpsertTable(spark, os.path.join(base, "tbl"),
                                n_buckets=args.buckets)
    table.merge_batch(ch, 0)
    n_rows = table.read().count()

    keys = [f"c{i * (args.convs // 20) + 7:06d}" for i in range(16)]
    key = keys[0]

    def best(fn):
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn().collect()
            times.append(time.time() - t0)
        return round(min(times), 4)

    from pyspark.sql import functions as F

    full = best(lambda: table.read().filter(F.col("conv_id") == key))
    one = best(lambda: table.lookup(key))
    many = best(lambda: table.lookup_many(keys))
    files_full = len(table.read().inputFiles())
    files_one = len(table.lookup(key).inputFiles())
    files_many = len(table.lookup_many(keys).inputFiles())

    print(json.dumps({
        "rows": n_rows, "n_buckets": args.buckets,
        "full_scan_sec": full, "lookup_sec": one, "lookup_many16_sec": many,
        "files_full": files_full, "files_lookup": files_one,
        "files_lookup_many16": files_many,
        "speedup_lookup": round(full / max(one, 1e-9), 1),
    }))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
