"""Property test for the stream-maintained repeated-span index: for ANY
event sequence (inserts, changed-text redeliveries, verbatim and stale
redeliveries) under ANY batch slicing, the live span table must equal
the batch repeated_substring_spans sweep on the final LWW corpus, and
the counts table must hold the exact per-gram site counts.

Texts are built from a tiny fragment pool so gram collisions (the 1→2 /
2→1 transitions) happen constantly — each example exercises retro-marks
and survivor-unmarks many times. Spark work per example is kept small:
fragments are short, min_len 12, few docs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aktuell_spark.functions.dedupe import (
    char_gram_positions,
    repeated_substring_spans,
)
from aktuell_spark.streaming.span_index import StreamingSpanIndex

L = 12
FRAGS = [
    "the quick brown fox jumps",
    "lorem ipsum dolor sit amet",
    "license header text block",
    "zzzz yyyy xxxx wwww vvvv",
]

# an event is (doc 0-4, fragment indices composing its text, seq 0-99)
event_st = st.tuples(
    st.integers(0, 4),
    st.lists(st.integers(0, 3), min_size=0, max_size=3),
    st.integers(0, 99),
)
ops_st = st.lists(event_st, min_size=1, max_size=12)


def _text(frag_idx: list[int]) -> str:
    return " | ".join(FRAGS[i] for i in frag_idx)


def _final_corpus(batches):
    """The engine's LWW: within a batch the (seq, text)-max row per doc
    wins; across batches only a STRICTLY greater seq replaces standing
    state (equal-seq redeliveries are stale and dropped)."""
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
def test_span_index_equals_batch_for_any_events(spark, tmp_path_factory, ops, cut):
    rows = [(d, _text(frags), s) for d, frags, s in ops]
    root = str(tmp_path_factory.mktemp("spanprop"))
    index = StreamingSpanIndex(spark, root, min_len=L, n_buckets=4)
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
    want = sorted(map(tuple, repeated_substring_spans(fdf, min_len=L).collect()))
    got = sorted(map(tuple, index.spans().collect()))
    assert got == want, (final, got, want)
    got_cnt = {r[0]: r[1] for r in index.counts.read().collect()}
    want_cnt = {
        r[0]: r[1]
        for r in char_gram_positions(fdf, "doc_id", "text", L)
        .groupBy("h").count().collect()
    }
    assert got_cnt == want_cnt
