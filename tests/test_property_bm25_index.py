"""Property test for the stream-maintained BM25 index: for ANY event
sequence (inserts, changed-text/verbatim/stale redeliveries) under ANY
slicing, the live index must answer a query exactly as the batch
bm25_topk sweep on the final LWW corpus (ranking is deterministic: the
shared scoring stage rounds to 6 decimals and ties break on doc id)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aktuell_spark.functions.retrieval import bm25_topk
from aktuell_spark.streaming.bm25_index import StreamingBM25Index

FRAGS = [
    "spark merge join vector",
    "merge merge conflict here",
    "vector index scan probe",
    "plain filler words only",
]
TERMS = ["spark", "merge", "vector", "probe"]

event_st = st.tuples(
    st.integers(0, 4),
    st.lists(st.integers(0, 3), min_size=0, max_size=3),
    st.integers(0, 99),
)
ops_st = st.lists(event_st, min_size=1, max_size=12)


def _text(frag_idx: list[int]) -> str:
    return " ".join(FRAGS[i] for i in frag_idx)


def _final_corpus(batches):
    latest: dict[int, tuple[int, str]] = {}
    for chunk in batches:
        per: dict[int, tuple[int, str]] = {}
        for d, t, s in chunk:
            if d not in per or (s, t) > per[d]:
                per[d] = (s, t)
        for d, (s, t) in per.items():
            if d not in latest or s > latest[d][0]:
                latest[d] = (s, t)
    return [(d, t) for d, (s, t) in latest.items()]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_st, cut=st.integers(1, 11))
def test_bm25_index_equals_batch_for_any_events(
    spark, tmp_path_factory, ops, cut
):
    rows = [(d, _text(frags), s) for d, frags, s in ops]
    root = str(tmp_path_factory.mktemp("bm25prop"))
    index = StreamingBM25Index(spark, root, n_buckets=4)
    batches = [b for b in (rows[:cut], rows[cut:]) if b]
    for epoch, chunk in enumerate(batches):
        index.merge_batch(
            spark.createDataFrame(
                chunk, "doc_id long, text string, seq long"
            ),
            epoch,
        )
    final = _final_corpus(batches)
    fdf = spark.createDataFrame(final, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in TERMS], "term string")
    want = sorted(map(tuple, bm25_topk(fdf, tdf, topk=10).collect()))
    got = sorted(map(tuple, index.search(TERMS, topk=10).collect()))
    assert got == want, (final, got, want)
