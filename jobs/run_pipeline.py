"""spark-submit entry point for the CDC pipeline.

Cluster deployment (north rule):

    python tools/make_pyfiles.py                       # build dist zip
    spark-submit --py-files dist/aktuell_spark.zip \\
        jobs/run_pipeline.py \\
        --feed  s3://bucket/changes/ \\
        --table s3://bucket/transcripts_materialized/ \\
        --checkpoint s3://bucket/ckpt/transcripts/ \\
        [--database aktuell] [--collection transcripts] \\
        [--n-buckets 16384] [--continuous]

On a cluster the session comes from spark-submit (master/executors set
by the submitter); this script only builds the query. ``--continuous``
uses a processingTime trigger instead of availableNow.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default=None,
        help="YAML config (reference-compatible, see aktuell_spark/config.py): "
             "runs the multi-database EngineManager instead of a single pipeline",
    )
    ap.add_argument("--feed", default=None)
    ap.add_argument("--table", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--database", default="aktuell")
    ap.add_argument("--collection", default="transcripts")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--metrics-out", default=None)
    ap.add_argument(
        "--partial-updates", action="store_true",
        help="reconstruct post-images from updated_fields/removed_fields",
    )
    ap.add_argument(
        "--merge-on-read", action="store_true",
        help="append LSM runs per epoch instead of rewriting buckets "
             "(write-heavy ingest; run compact() off the hot path)",
    )
    ap.add_argument(
        "--static-dim", default=None,
        help="parquet path of a dimension table broadcast-joined into "
             "the stream per micro-batch (stream-static enrichment)",
    )
    ap.add_argument("--static-dim-on", default="conv_id")
    ap.add_argument(
        "--quarantine", action="store_true",
        help="route malformed events (null key/seq) to _quarantine "
             "instead of failing the table layout",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("aktuell_cdc_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.config:
        # multi-database deployment from YAML — the reference's
        # config-file entry point (cmd/server/main.go:147-180)
        from aktuell_spark.config import load_manager

        mgr, settings = load_manager(
            spark, args.config,
            feed_dir=args.feed, root=args.table, checkpoint_dir=args.checkpoint,
            # CLI mode flags override the YAML engine block when set
            partial_updates=args.partial_updates or None,
            merge_on_read=args.merge_on_read or None,
            quarantine=args.quarantine or None,
        )
        trig = {"processingTime": "10 seconds"} if args.continuous else None
        queries = mgr.run(
            max_files_per_trigger=settings.max_files_per_trigger, trigger=trig,
            await_termination=not args.continuous,
        )
        if args.continuous:
            for q in queries.values():
                q.awaitTermination()
        print(json.dumps({"stats": mgr.stats()}))
        return
    for req in ("feed", "table", "checkpoint"):
        if not getattr(args, req):
            ap.error(f"--{req} is required without --config")

    from aktuell_spark.streaming.metrics import ProgressRecorder
    from aktuell_spark.streaming.pipeline import run_cdc_pipeline

    rec = ProgressRecorder(out_path=args.metrics_out)
    spark.streams.addListener(rec)

    static_dim = (
        spark.read.parquet(args.static_dim) if args.static_dim else None
    )
    _, table = run_cdc_pipeline(
        spark, args.feed, args.table, args.checkpoint,
        database=args.database, collection=args.collection,
        n_buckets=args.n_buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        partial_updates=args.partial_updates,
        merge_on_read=args.merge_on_read,
        static_dim=static_dim, static_dim_on=args.static_dim_on,
        quarantine=args.quarantine,
        trigger={"processingTime": "10 seconds"} if args.continuous else None,
    )
    import time

    for _ in range(20):  # listener bus is async; drain before summary
        if rec.summary().get("batches"):
            break
        time.sleep(0.5)
    print(json.dumps({"progress": rec.summary(), "rows": table.read().count()}))


if __name__ == "__main__":
    main()
