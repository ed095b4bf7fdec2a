"""Stream-maintained connected components: the live cluster table must
equal batch connected_components over the union of all pair batches —
for any slicing, when standing clusters merge via a late edge, and
across restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.operators.components import connected_components
from aktuell_spark.streaming.cluster_index import (
    StreamingClusterIndex,
    run_cluster_index_stream,
)


def _labels(df):
    return sorted((r["vertex"], r["cluster_id"]) for r in df.collect())


def _pairs_df(spark, pairs, seq0=0):
    return spark.createDataFrame(
        [(a, b, seq0 + i) for i, (a, b) in enumerate(pairs)],
        "doc_a long, doc_b long, seq long",
    )


def test_incremental_equals_batch_any_slicing(spark, tmp_path):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _labels(
        connected_components(_pairs_df(spark, pairs), algorithm="star")
    )
    for slices in (3, 7):
        base = str(tmp_path / f"s{slices}")
        for i in range(slices):
            chunk = pairs[i::slices]
            if not chunk:
                continue
            _pairs_df(spark, chunk, seq0=i * 1000).coalesce(1).write.mode(
                "append"
            ).parquet(f"{base}/feed")
        _, index = run_cluster_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
            n_buckets=8, max_files_per_trigger=1,
        )
        assert _labels(index.read()) == want, f"slicing {slices}"


def test_late_edge_merges_standing_clusters(spark, tmp_path):
    base = str(tmp_path)
    index = StreamingClusterIndex(spark, f"{base}/idx", n_buckets=4)
    # epoch 0: two separate clusters {3,5,8} and {9,12}
    index.merge_batch(_pairs_df(spark, [(5, 3), (5, 8), (12, 9)]), 0)
    assert _labels(index.read()) == [
        (3, 3), (5, 3), (8, 3), (9, 9), (12, 9),
    ]
    # epoch 1: a late edge bridges them + a fresh singleton pair
    index.merge_batch(_pairs_df(spark, [(8, 12), (40, 41)], seq0=10), 1)
    assert _labels(index.read()) == [
        (3, 3), (5, 3), (8, 3), (9, 3), (12, 3), (40, 40), (41, 40),
    ]
    # replayed epoch is a committed no-op
    index.merge_batch(_pairs_df(spark, [(8, 12)], seq0=10), 1)
    assert _labels(index.read())[3] == (9, 3)


def test_restart_and_empty_batch(spark, tmp_path):
    base = str(tmp_path)
    _pairs_df(spark, [(1, 2), (2, 3)]).coalesce(1).write.parquet(
        f"{base}/feed"
    )
    _, index = run_cluster_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=4,
    )
    before = _labels(index.read())
    assert before == [(1, 1), (2, 1), (3, 1)]
    # restart: no new files -> state unchanged
    _, index = run_cluster_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt", n_buckets=4,
    )
    assert _labels(index.read()) == before
    # an explicitly empty epoch commits and changes nothing
    index.merge_batch(
        _pairs_df(spark, []).limit(0), 99,
    )
    assert _labels(index.read()) == before


def test_update_heavy_feed_redelivered_edges_and_cascading_merges(
    spark, tmp_path
):
    """Update-heavy stream (VERDICT r6 #7): every epoch REDELIVERS all
    previously-sent edges (new seqs) alongside one new bridge edge that
    merges two standing clusters — the table must track batch CC after
    every generation, and redelivery must not corrupt or duplicate
    labels."""
    base = str(tmp_path)
    # chain segments that successively merge: {0,1},{2,3},{4,5},{6,7}
    segments = [(0, 1), (2, 3), (4, 5), (6, 7)]
    bridges = [(1, 2), (3, 4), (5, 6)]  # each merges two standing clusters
    sent: list[tuple[int, int]] = list(segments)
    _pairs_df(spark, sent, seq0=0).coalesce(1).write.mode("append").parquet(
        f"{base}/feed"
    )
    seq0 = 1000
    for bridge in bridges:
        # redeliver EVERYTHING sent so far (update-heavy), plus the bridge
        gen = sent + [bridge]
        _pairs_df(spark, gen, seq0=seq0).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/feed")
        sent.append(bridge)
        seq0 += 1000
        _, index = run_cluster_index_stream(
            spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
            n_buckets=8, max_files_per_trigger=1,
        )
        want = _labels(connected_components(_pairs_df(spark, sent)))
        assert _labels(index.read()) == want, f"after bridge {bridge}"
    # final state: one component rooted at 0, every vertex exactly once
    final = _labels(index.read())
    assert final == [(v, 0) for v in range(8)]
