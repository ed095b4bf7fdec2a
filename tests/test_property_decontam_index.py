"""Property test for the stream-maintained decontamination index: for
ANY event sequence (benchmark docs and training docs interleaved in any
order, changed-text/verbatim/stale redeliveries) under ANY slicing, the
live contamination report must equal the batch contamination_overlap
sweep on the final LWW corpus. Texts come from a small fragment pool so
benchmark/training gram overlaps (and their retractions) happen in
every example."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aktuell_spark.functions.dedupe import contamination_overlap
from aktuell_spark.streaming.decontam_index import StreamingDecontamIndex

N = 3  # word n-grams
BENCH = lambda c: c % 2 == 0  # noqa: E731  — even doc ids are benchmark
FRAGS = [
    "alpha beta gamma delta",
    "one two three four",
    "red green blue yellow",
    "aa bb cc dd",
]

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
def test_decontam_index_equals_batch_for_any_events(
    spark, tmp_path_factory, ops, cut
):
    rows = [(d, _text(frags), s) for d, frags, s in ops]
    root = str(tmp_path_factory.mktemp("decprop"))
    index = StreamingDecontamIndex(
        spark, root, bench_pred=BENCH, n=N, n_buckets=4
    )
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
    want = sorted(
        map(
            tuple,
            contamination_overlap(fdf, BENCH(F.col("doc_id")), n=N).collect(),
        )
    )
    got = sorted(map(tuple, index.contamination().collect()))
    assert got == want, (final, got, want)
