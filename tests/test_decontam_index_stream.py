"""Stream-maintained decontamination index: the live index must report
contamination exactly as the batch contamination_overlap sweep on the
final corpus — for any batch slicing and ARRIVAL ORDER (training docs
before the benchmark docs they contaminate require the retro-probe),
across restarts, for changed-text redeliveries on BOTH sides, and
ignoring stale out-of-order redeliveries. Plus the scale gate: epochs
with no new benchmark grams never scan the training posting table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import contamination_overlap
from aktuell_spark.streaming.decontam_index import (
    StreamingDecontamIndex,
    run_decontam_index_stream,
)

N = 4  # short grams so small fixtures contaminate
BENCH = lambda c: c % 10 == 0  # noqa: E731

ROWS = [
    # benchmark docs (ids % 10 == 0)
    (10, "alpha beta gamma delta epsilon zeta"),
    (20, "one two three four five six seven"),
    # training docs
    (1, "prefix alpha beta gamma delta suffix words"),        # hits 10
    (2, "one two three four and also two three four five"),   # hits 20
    (3, "completely unrelated text with no overlap at all"),
    (4, "alpha beta gamma delta epsilon zeta copied exactly"),  # hits 10
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _want(spark, rows):
    return sorted(
        map(tuple, contamination_overlap(_df(spark, rows), BENCH(F.col("doc_id")), n=N).collect())
    )


def _got(index):
    return sorted(map(tuple, index.contamination().collect()))


def _run(spark, base, **kw):
    return run_decontam_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        bench_pred=BENCH, n=N, n_buckets=8, **kw,
    )[1]


def _write(spark, base, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, seq long"
    ).coalesce(1).write.mode("append").parquet(f"{base}/feed")


def test_stream_equals_batch_for_any_slicing_and_order(spark, tmp_path):
    want = _want(spark, ROWS)
    assert len(want) == 3, "fixture must contaminate; test is vacuous"
    seqd = [(i, t, i) for i, t in ROWS]
    slicings = {
        # benchmark first (probe leg), training first (retro-probe
        # leg), interleaved (both + in-batch leg)
        "bench_first": [seqd[:2], seqd[2:]],
        "train_first": [seqd[2:], seqd[:2]],
        "one_by_one": [[r] for r in seqd],
        "all_at_once": [seqd],
    }
    for name, files in slicings.items():
        base = str(tmp_path / name)
        for chunk in files:
            _write(spark, base, chunk)
        index = _run(spark, base, max_files_per_trigger=1)
        assert _got(index) == want, name


def test_stream_equals_batch_on_real_corpus(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    want = sorted(
        map(
            tuple,
            contamination_overlap(docs, F.col("doc_id") % 17 == 0, n=8).collect(),
        )
    )
    assert want, "corpus fixture has no contamination; test is vacuous"
    base = str(tmp_path)
    feed = docs.withColumn("seq", F.col("doc_id").cast("long"))
    for p in (0, 1):
        feed.filter(F.col("doc_id") % 2 == p).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/feed")
    _, index = run_decontam_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        bench_pred=lambda c: c % 17 == 0, n=8, n_buckets=8,
        max_files_per_trigger=1,
    )
    assert _got(index) == want


def test_redeliveries_both_sides_restart_and_stale(spark, tmp_path):
    base = str(tmp_path)
    rows = {i: t for i, t in ROWS}
    _write(spark, base, [(i, t, i) for i, t in ROWS])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    # restart on the same checkpoint: a no-op
    assert _got(_run(spark, base)) == _got(index)

    # training doc 1 redelivered WITHOUT the contaminating span → its
    # row must disappear (hits retracted, denominator updated)
    rows[1] = "prefix now totally clean suffix words here"
    _write(spark, base, [(1, rows[1], 100)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert 1 not in {r[0] for r in _got(index)}

    # training doc 3 redelivered WITH a contaminating span → appears
    rows[3] = "four five six seven appended to unrelated text"
    _write(spark, base, [(3, rows[3], 101)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert 3 in {r[0] for r in _got(index)}

    # benchmark doc 10 redelivered with its grams REMOVED: it was the
    # sole carrier, so doc 4's hits must retract; doc 20's grams are
    # untouched so doc 2 stays
    rows[10] = "totally different benchmark content now"
    _write(spark, base, [(10, rows[10], 102)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert {r[0] for r in _got(index)} == {2, 3}

    # benchmark doc 30 arrives carrying doc 20's grams, then doc 20
    # drops them: the gram survives via the OTHER carrier, hits stay
    rows[30] = "one two three four five six seven"
    _write(spark, base, [(30, rows[30], 103)])
    rows[20] = "benchmark twenty rewritten clean"
    _write(spark, base, [(20, rows[20], 104)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert 2 in {r[0] for r in _got(index)}

    # stale out-of-order redelivery (seq below standing): ignored
    _write(spark, base, [(1, "alpha beta gamma delta stale", 5)])
    index = _run(spark, base)
    assert _got(index) == _want(spark, list(rows.items()))
    assert 1 not in {r[0] for r in _got(index)}


def test_train_only_epochs_never_scan_training_postings(spark, tmp_path):
    """The scale gate: the training posting table (corpus-sized at
    100 TB) is read ONLY by the retro-probe, which only bench-gram-
    bearing epochs run — and then bucket-pruned. Deterministic spy on
    the pruned-read helper; no timing."""
    base = str(tmp_path)
    index = StreamingDecontamIndex(
        spark, f"{base}/idx", bench_pred=BENCH, n=N, n_buckets=8
    )
    calls: list[tuple[str, int]] = []
    orig = index._pruned_grams

    def spy(table, gh_df):
        out = orig(table, gh_df)
        calls.append((table.root.rsplit("/", 1)[-1], out))
        return out

    index._pruned_grams = spy

    def batch(rows, epoch):
        index.merge_batch(
            spark.createDataFrame(rows, "doc_id long, text string, seq long"),
            epoch,
        )

    # epochs 0-2: training docs only — the training posting table must
    # never be probed (and nothing needs the bench side either)
    batch([(1, ROWS[2][1], 1)], 0)
    batch([(2, ROWS[3][1], 2)], 1)
    batch([(3, ROWS[4][1], 3)], 2)
    assert [c[0] for c in calls] == []
    # epoch 3: a benchmark doc arrives — exactly one retro-probe of
    # train_grams (bucket-pruned inside the helper)
    batch([(10, ROWS[0][1], 4)], 3)
    assert [c[0] for c in calls] == ["train_grams"]
    # epoch 4: training-only again — no further train_grams probes
    batch([(5, "more clean training text arrives here", 5)], 4)
    assert [c[0] for c in calls] == ["train_grams"]
    # and the index is still exactly the batch sweep
    want = _want(
        spark,
        [ROWS[2], ROWS[3], ROWS[4], ROWS[0],
         (5, "more clean training text arrives here")],
    )
    assert _got(index) == want


def test_compact_then_reads_stay_green(spark, tmp_path):
    """Maintenance entry point: compact() folds the MoR tables' runs
    (it previously raised TypeError — the sink's compact needs a
    tombstone horizon) and the contamination report is unchanged."""
    base = str(tmp_path)
    rows = [
        (i, f"one two three four w{i}a w{i}b", i) for i in range(1, 30)
    ] + [(34, "one two three four shared gram here", 34)]
    spark.createDataFrame(
        rows, "doc_id long, text string, seq long"
    ).coalesce(1).write.mode("append").parquet(f"{base}/feed")
    _, index = run_decontam_index_stream(
        spark, f"{base}/feed", f"{base}/idx", f"{base}/ckpt",
        bench_pred=lambda c: c % 17 == 0, n=4, n_buckets=4,
    )
    before = sorted(map(tuple, index.contamination().collect()))
    index.compact()
    assert sorted(map(tuple, index.contamination().collect())) == before
    assert index.train_grams.max_runs_per_bucket() <= 1
