"""spark-submit entry point for the stream-maintained indexes.

Cluster deployment (north rule):

    python tools/make_pyfiles.py                       # build dist zip
    spark-submit --py-files dist/aktuell_spark.zip \\
        jobs/run_index.py --kind ann \\
        --feed  s3://bucket/vector_events/ \\
        --root  s3://bucket/ann_index/ \\
        --checkpoint s3://bucket/ckpt/ann/ \\
        [--continuous]

``--kind`` picks the index family:

- ``ann``      — LSH vector index maintained by insert/update/delete
  vector events (streaming/ann_index.py); feed columns
  (vec_id, embedding, op, seq).
- ``dedup``    — MinHash band index + verified near-dup pairs
  (streaming/dedup_index.py); feed columns (doc_id, text, seq).
- ``clusters`` — live connected-components table over a near-dup pair
  stream (streaming/cluster_index.py); feed columns
  (doc_a, doc_b, seq).
- ``bm25``     — live inverted term index (streaming/bm25_index.py);
  feed columns (doc_id, text, seq). ``--terms`` scores a sample query
  after the bounded replay.
- ``decontam`` — live benchmark n-gram overlap index
  (streaming/decontam_index.py); feed columns (doc_id, text, seq),
  benchmark membership ``doc_id % --bench-mod == 0``.
- ``span``     — live repeated-substring (boilerplate) index
  (streaming/span_index.py); feed columns (doc_id, text, seq),
  span threshold ``--min-len``.

All six share the engine's lifecycle contract: availableNow bounded
replay by default (``--continuous`` tails with a processingTime
trigger), restart from the same checkpoint is a no-op, every epoch
commit is idempotent.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["ann", "dedup", "clusters", "bm25", "decontam",
                             "span"])
    ap.add_argument("--feed", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--continuous", action="store_true")
    # ann knobs
    ap.add_argument("--n-planes", type=int, default=8)
    # dedup knobs
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--ngram", type=int, default=3)
    # bm25 knobs
    ap.add_argument("--terms", default=None,
                    help="comma-separated query terms to score post-replay")
    # decontam knobs
    ap.add_argument("--bench-mod", type=int, default=17)
    ap.add_argument("--decontam-ngram", type=int, default=8)
    # span knobs
    ap.add_argument("--min-len", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"aktuell_{args.kind}_index"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    trigger = {"processingTime": "10 seconds"} if args.continuous else None
    common = dict(
        n_buckets=args.n_buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        await_termination=not args.continuous,
        trigger=trigger,
    )
    if args.kind == "ann":
        from aktuell_spark.streaming.ann_index import run_ann_index_stream

        query, table = run_ann_index_stream(
            spark, args.feed, args.root, args.checkpoint,
            n_planes=args.n_planes, **common,
        )
        if args.continuous:
            query.awaitTermination()
        print(json.dumps({"kind": "ann", "rows": table.read().count()}))
    elif args.kind == "dedup":
        from aktuell_spark.streaming.dedup_index import run_dedup_index_stream

        query, index = run_dedup_index_stream(
            spark, args.feed, args.root, args.checkpoint,
            n=args.ngram, threshold=args.threshold, **common,
        )
        if args.continuous:
            query.awaitTermination()
        print(json.dumps({
            "kind": "dedup",
            "docs": index.docs.read().count(),
            "pairs": index.found_pairs().count(),
        }))
    elif args.kind == "clusters":
        from aktuell_spark.streaming.cluster_index import (
            run_cluster_index_stream,
        )

        query, index = run_cluster_index_stream(
            spark, args.feed, args.root, args.checkpoint, **common,
        )
        if args.continuous:
            query.awaitTermination()
        print(json.dumps({
            "kind": "clusters", "vertices": index.read().count(),
        }))
    elif args.kind == "bm25":
        from aktuell_spark.streaming.bm25_index import run_bm25_index_stream

        query, index = run_bm25_index_stream(
            spark, args.feed, args.root, args.checkpoint, **common,
        )
        if args.continuous:
            query.awaitTermination()
        out = {"kind": "bm25", "docs": index.docs.read().count()}
        if args.terms:
            out["top"] = [
                r.asDict()
                for r in index.search(args.terms.split(","), topk=10).collect()
            ]
        print(json.dumps(out))
    elif args.kind == "decontam":
        from aktuell_spark.streaming.decontam_index import (
            run_decontam_index_stream,
        )

        mod = args.bench_mod
        query, index = run_decontam_index_stream(
            spark, args.feed, args.root, args.checkpoint,
            bench_pred=lambda c: c % mod == 0,
            n=args.decontam_ngram, **common,
        )
        if args.continuous:
            query.awaitTermination()
        print(json.dumps({
            "kind": "decontam",
            "contaminated_docs": index.contamination().count(),
        }))
    else:
        from aktuell_spark.streaming.span_index import run_span_index_stream

        query, index = run_span_index_stream(
            spark, args.feed, args.root, args.checkpoint,
            min_len=args.min_len, **common,
        )
        if args.continuous:
            query.awaitTermination()
        print(json.dumps({
            "kind": "span", "spans": index.spans().count(),
        }))


if __name__ == "__main__":
    main()
