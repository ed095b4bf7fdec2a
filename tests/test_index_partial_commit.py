"""Partial-commit replay: an index epoch merges SEVERAL exactly-once
tables; a crash between two of those merges leaves the epoch half
committed (e.g. gram postings landed, hits/docs did not). Structured
Streaming replays the whole batch — the replay recomputes its probe and
retraction legs against standing tables that ALREADY contain this
epoch's half-committed rows, and must still converge to the same state
as a crash-free run. These tests inject the crash at the worst seam
(after the posting tables commit, before the derived tables do) in an
epoch that carries a changed-text REDELIVERY, the path whose replay
must re-derive retractions from already-tombstoned standing rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import contamination_overlap
from aktuell_spark.functions.retrieval import bm25_topk
from aktuell_spark.streaming.bm25_index import StreamingBM25Index
from aktuell_spark.streaming.decontam_index import StreamingDecontamIndex

BENCH = lambda c: c % 10 == 0  # noqa: E731

EPOCH0 = [
    (10, "alpha beta gamma delta epsilon zeta", 1),
    (1, "prefix alpha beta gamma delta suffix words", 2),
    (2, "clean text with no overlap anywhere", 3),
]
# epoch 1: new training doc + doc 1 REDELIVERED clean (hits must
# retract) + benchmark doc 20 arrives (retro-probe runs)
EPOCH1 = [
    (3, "alpha beta gamma delta copied again", 4),
    (1, "now totally clean replacement text here", 10),
    (20, "one two three four five six", 5),
]
FINAL = [
    (10, "alpha beta gamma delta epsilon zeta"),
    (1, "now totally clean replacement text here"),
    (2, "clean text with no overlap anywhere"),
    (3, "alpha beta gamma delta copied again"),
    (20, "one two three four five six"),
]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, seq long")


def _crash_then_replay(spark, index, crash_table, feed0, feed1):
    """Run epoch 0 clean; crash epoch 1 inside ``crash_table``'s merge
    (after every table merged before it committed); replay epoch 1."""
    index.merge_batch(_batch(spark, feed0), 0)
    real = crash_table.merge_batch

    def dying(df, epoch_id):
        raise RuntimeError("injected crash between table merges")

    crash_table.merge_batch = dying
    with pytest.raises(RuntimeError, match="injected"):
        index.merge_batch(_batch(spark, feed1), 1)
    crash_table.merge_batch = real
    # the seam is real: some of the epoch's tables committed, not all
    index.merge_batch(_batch(spark, feed1), 1)


def test_decontam_partial_commit_replay(spark, tmp_path):
    index = StreamingDecontamIndex(
        spark, str(tmp_path / "idx"), bench_pred=BENCH, n=4, n_buckets=4
    )
    _crash_then_replay(spark, index, index.hits, EPOCH0, EPOCH1)
    assert index.train_grams.is_committed(1) and index.hits.is_committed(1)
    want = sorted(
        map(
            tuple,
            contamination_overlap(
                spark.createDataFrame(FINAL, "doc_id long, text string"),
                BENCH(F.col("doc_id")),
                n=4,
            ).collect(),
        )
    )
    got = sorted(map(tuple, index.contamination().collect()))
    assert got == want
    ids = {r[0] for r in got}
    assert 3 in ids and 1 not in ids  # retraction survived the replay


def test_bm25_partial_commit_replay(spark, tmp_path):
    index = StreamingBM25Index(spark, str(tmp_path / "idx"), n_buckets=4)
    # crash after postings committed, before docs: replay must re-run
    # the retraction scan against postings that already carry epoch 1's
    # rows and tombstones
    _crash_then_replay(spark, index, index.docs, EPOCH0, EPOCH1)
    assert index.postings.is_committed(1) and index.docs.is_committed(1)
    terms = ["alpha", "clean", "five"]
    want = sorted(
        map(
            tuple,
            bm25_topk(
                spark.createDataFrame(FINAL, "doc_id long, text string"),
                spark.createDataFrame([(t,) for t in terms], "term string"),
                topk=10,
            ).collect(),
        )
    )
    got = sorted(map(tuple, index.search(terms, topk=10).collect()))
    assert got == want
    # doc 1's old 'alpha' posting was tombstoned pre-crash; the replay
    # must not resurrect it
    assert 1 not in {
        r[0] for r in index.postings.lookup_many(["alpha"]).collect()
    }
