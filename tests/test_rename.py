"""Rename end-to-end (reference op enum pkg/models/types.go:101-108):
batch read-path aliasing via resolve_renames, and streaming fan-out
propagation — a subscription to the NEW collection name sees pre-rename
rows, and the old namespace is left empty (Mongo rename semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import rename_intervals, resolve_renames
from aktuell_spark.streaming.fanout import FanoutSink, Subscription

DDL = (
    "seq long, op string, database string, collection string, conv_id string, "
    "turn_idx int, role string, text string, tool string, "
    "updated_fields map<string,string>, removed_fields array<string>, "
    "ts string, extra map<string,string>"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL).withColumn("ts", F.to_timestamp("ts"))


def _ev(seq, op, col, conv, text, ts, extra=None, db="aktuell"):
    return (seq, op, db, col, conv, 0, "user", text, None, None, None, ts, extra)


def test_rename_intervals_compose_chains():
    # a->b at 10, b->c at 20: early a-events land in c; a b-event
    # before 20 lands in c; post-cut events keep their name
    rows = rename_intervals([(10, "a", "b"), (20, "b", "c")])
    got = {(r[0], r[1] < -(2**61), r[2]): r[3] for r in rows}
    assert got[("a", True, 10)] == "c"
    assert got[("b", True, 20)] == "c"


def test_resolve_renames_batch(spark):
    events = _mk(spark, [
        _ev(1, "insert", "old", "x", "pre-rename", "2025-01-01 00:00:00"),
        _ev(2, "insert", "other", "y", "unrelated", "2025-01-01 00:00:01"),
        _ev(5, "rename", "old", "", None, "2025-01-01 00:10:00", {"to": "new"}),
        _ev(7, "insert", "new", "z", "post-rename", "2025-01-01 00:20:00"),
        _ev(8, "insert", "old", "w", "recreated-old", "2025-01-01 00:30:00"),
    ])
    got = {r["conv_id"]: r["collection_resolved"]
           for r in resolve_renames(events).collect()}
    # the marker row itself (seq == rename seq) stays under the old name
    assert got == {"x": "new", "y": "other", "z": "new", "w": "old", "": "old"}


def test_fanout_rename_moves_documents(spark, tmp_path):
    subs = [
        Subscription(name="on_old", collection="old"),
        Subscription(name="on_new", collection="new"),
    ]
    sink = FanoutSink(spark, str(tmp_path / "root"), subs, n_buckets=2)
    # epoch 0: documents live under 'old'
    sink.merge_batch(_mk(spark, [
        _ev(1, "insert", "old", "a", "a0", "2025-01-01 00:00:00"),
        _ev(2, "insert", "old", "b", "b0", "2025-01-01 00:00:01"),
    ]), 0)
    assert sink.read("on_new").count() == 0
    # epoch 1: rename old->new arrives, plus a post-rename update on new
    sink.merge_batch(_mk(spark, [
        _ev(10, "rename", "old", "", None, "2025-01-01 01:00:00", {"to": "new"}),
        _ev(11, "update", "new", "a", "a1", "2025-01-01 01:00:01"),
        _ev(12, "insert", "new", "c", "c0", "2025-01-01 01:00:02"),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in sink.read("on_new").collect()}
    assert got == {"a": "a1", "b": "b0", "c": "c0"}
    # Mongo semantics: nothing remains under the old namespace
    assert sink.read("on_old").count() == 0

    # epoch replay is a no-op (per-table commit markers incl. seeds/drops)
    sink.merge_batch(_mk(spark, [
        _ev(10, "rename", "old", "", None, "2025-01-01 01:00:00", {"to": "new"}),
        _ev(11, "update", "new", "a", "a1", "2025-01-01 01:00:01"),
        _ev(12, "insert", "new", "c", "c0", "2025-01-01 01:00:02"),
    ]), 1)
    got = {r["conv_id"]: r["text"] for r in sink.read("on_new").collect()}
    assert got == {"a": "a1", "b": "b0", "c": "c0"}


def test_fanout_rename_same_batch_pre_rename_rows(spark, tmp_path):
    """Pre-rename events arriving in the SAME batch as the marker still
    reach the new name (sources merge before targets are seeded)."""
    subs = [
        Subscription(name="on_old", collection="old"),
        Subscription(name="on_new", collection="new"),
    ]
    sink = FanoutSink(spark, str(tmp_path / "root"), subs, n_buckets=2)
    sink.merge_batch(_mk(spark, [
        _ev(1, "insert", "old", "a", "a0", "2025-01-01 00:00:00"),
        _ev(2, "rename", "old", "", None, "2025-01-01 00:10:00", {"to": "new"}),
        _ev(3, "insert", "new", "b", "b0", "2025-01-01 00:20:00"),
    ]), 0)
    got = {r["conv_id"]: r["text"] for r in sink.read("on_new").collect()}
    assert got == {"a": "a0", "b": "b0"}
    assert sink.read("on_old").count() == 0


def test_fanout_rename_chain_same_batch(spark, tmp_path):
    """a->b AND b->c in ONE micro-batch: the segmented path merges
    hop-by-hop, so an event destined to b between the two renames still
    flows through to c — byte-identical to the split-batch replay."""
    subs = [
        Subscription(name="on_a", collection="a"),
        Subscription(name="on_b", collection="b"),
        Subscription(name="on_c", collection="c"),
    ]
    one = _mk(spark, [
        _ev(1, "insert", "a", "x", "x0", "2025-01-01 00:00:00"),
        _ev(10, "rename", "a", "", None, "2025-01-01 00:10:00", {"to": "b"}),
        _ev(15, "insert", "b", "y", "y0", "2025-01-01 00:15:00"),
        _ev(20, "rename", "b", "", None, "2025-01-01 00:20:00", {"to": "c"}),
        _ev(25, "insert", "c", "z", "z0", "2025-01-01 00:25:00"),
    ])
    sink = FanoutSink(spark, str(tmp_path / "one"), subs, n_buckets=2)
    sink.merge_batch(one, 0)
    got = {r["conv_id"]: r["text"] for r in sink.read("on_c").collect()}
    assert got == {"x": "x0", "y": "y0", "z": "z0"}
    assert sink.read("on_a").count() == 0
    assert sink.read("on_b").count() == 0

    # split-batch replay of the same events must match exactly
    ref = FanoutSink(spark, str(tmp_path / "ref"), subs, n_buckets=2)
    for i, lohi in enumerate([(0, 10), (10, 20), (20, 99)]):
        ref.merge_batch(
            one.filter((F.col("seq") >= lohi[0]) & (F.col("seq") < lohi[1])), i
        )
    ref_got = {r["conv_id"]: r["text"] for r in ref.read("on_c").collect()}
    assert ref_got == got

    # replay of the chained epoch is a no-op (segment + seed/drop markers)
    sink.merge_batch(one, 0)
    assert {r["conv_id"] for r in sink.read("on_c").collect()} == {"x", "y", "z"}


def test_fanout_rename_chain_reverse_seq_order(spark, tmp_path):
    """b->c at seq 10 THEN a->b at seq 20 (source of the later rename is
    the target of the earlier one): x moves to b and STAYS there, y left
    b at seq 10."""
    subs = [
        Subscription(name="on_a", collection="a"),
        Subscription(name="on_b", collection="b"),
        Subscription(name="on_c", collection="c"),
    ]
    sink = FanoutSink(spark, str(tmp_path / "root"), subs, n_buckets=2)
    sink.merge_batch(_mk(spark, [
        _ev(1, "insert", "a", "x", "x0", "2025-01-01 00:00:00"),
        _ev(5, "insert", "b", "y", "y0", "2025-01-01 00:05:00"),
        _ev(10, "rename", "b", "", None, "2025-01-01 00:10:00", {"to": "c"}),
        _ev(20, "rename", "a", "", None, "2025-01-01 00:20:00", {"to": "b"}),
    ]), 0)
    assert {r["conv_id"] for r in sink.read("on_b").collect()} == {"x"}
    assert {r["conv_id"] for r in sink.read("on_c").collect()} == {"y"}
    assert sink.read("on_a").count() == 0


# -- property: interval composition == brute-force chain walk ----------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _NAMES = ["a", "b", "c", "d"]

    def _brute_final(markers, c, s):
        cur, s_cur = c, s
        for seq, old, new in sorted(markers):
            if seq > s_cur and old == cur:
                cur, s_cur = new, seq
        return cur

    @st.composite
    def _marker_sets(draw):
        n = draw(st.integers(0, 6))
        seqs = draw(st.lists(st.integers(1, 50), min_size=n, max_size=n,
                             unique=True))
        out = []
        for q in seqs:
            old = draw(st.sampled_from(_NAMES))
            new = draw(st.sampled_from([x for x in _NAMES if x != old]))
            out.append((q, old, new))
        return out

    @given(_marker_sets(), st.sampled_from(_NAMES), st.integers(0, 55))
    @settings(max_examples=200, deadline=None)
    def test_rename_intervals_match_brute_force(markers, name, seq):
        rows = rename_intervals(markers)
        got = name
        for (n, lo, hi, final) in rows:
            if n == name and lo <= seq < hi:
                got = final
                break
        assert got == _brute_final(markers, name, seq)
except ImportError:  # pragma: no cover
    pass
