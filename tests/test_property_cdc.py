"""Property-based CDC semantics: for ANY op sequence, the engine's
last-writer-wins materialization equals the sequential golden replay
(reference merge semantics: useAktuellStream.ts:125-171), and batch
slicing never changes the result.

hypothesis drives the op generator; Spark work is kept small per example
(deadline disabled — JVM latency, not algorithmic cost).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import apply_batch_to_state, latest_image
from tests.conftest import golden_partial_replay, golden_replay

KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 2)]
T0 = dt.datetime(2025, 1, 1)

CHANGE_DDL = (
    "seq long, op string, database string, collection string, conv_id string, "
    "turn_idx int, role string, text string, tool string, "
    "updated_fields map<string,string>, removed_fields array<string>, ts timestamp"
)


def ops_to_rows(ops):
    """ops: list of (key_idx, op_code, payload_int) → change-event rows.
    Duplicates get the same seq as the row they duplicate."""
    rows = []
    for seq, (key_idx, op_code, payload) in enumerate(ops, start=1):
        conv, turn = KEYS[key_idx % len(KEYS)]
        op = ["insert", "update", "replace", "delete"][op_code % 4]
        is_delete = op == "delete"
        rows.append(
            (
                seq, op, "aktuell", "transcripts", conv, turn,
                None if is_delete else "user",
                None if is_delete else f"text-{payload}",
                None if is_delete else "",
                None, None, T0 + dt.timedelta(seconds=seq),
            )
        )
    return rows


op_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 3), st.integers(0, 99)),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy, dup_every=st.integers(2, 7), cut=st.integers(1, 29))
def test_lww_equals_golden_replay_and_batch_invariance(spark, ops, dup_every, cut):
    rows = ops_to_rows(ops)
    # redeliver every k-th event verbatim (same seq)
    rows = rows + [r for i, r in enumerate(rows) if i % dup_every == 0]
    df = spark.createDataFrame(rows, CHANGE_DDL)

    golden = golden_replay([dict(zip(
        ["seq", "op", "database", "collection", "conv_id", "turn_idx", "role",
         "text", "tool", "updated_fields", "removed_fields", "ts"], r)) for r in rows])

    full = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in latest_image(df).collect()
    }
    assert full == {k: v["text"] for k, v in golden.items()}

    # batch-boundary invariance: split at an arbitrary seq
    cut = min(cut, len(ops))
    b1 = df.filter(F.col("seq") <= cut)
    b2 = df.filter(F.col("seq") > cut)
    state = latest_image(b1)
    state = apply_batch_to_state(state, b2)
    inc = {(r["conv_id"], r["turn_idx"]): r["text"] for r in state.collect()}
    assert inc == full


def partial_ops_to_rows(ops):
    """Random chains mixing full images and deltas.

    op_code % 6: 0=insert, 1=full update, 2=delta set-text,
    3=delta remove-tool, 4=delete, 5=delta set-role.
    """
    rows = []
    for seq, (key_idx, op_code, payload) in enumerate(ops, start=1):
        conv, turn = KEYS[key_idx % len(KEYS)]
        code = op_code % 6
        ts = T0 + dt.timedelta(seconds=seq)
        base = (seq, "aktuell", "transcripts", conv, turn)
        if code == 0:
            rows.append((base[0], "insert", *base[1:], "user", f"t{payload}",
                         f"tool{payload % 3}", None, None, ts))
        elif code == 1:
            rows.append((base[0], "update", *base[1:], "user", f"t{payload}",
                         f"tool{payload % 3}", {"text": f"t{payload}"}, None, ts))
        elif code == 2:
            rows.append((base[0], "update", *base[1:], None, None, None,
                         {"text": f"t{payload}"}, None, ts))
        elif code == 3:
            rows.append((base[0], "update", *base[1:], None, None, None,
                         None, ["tool"], ts))
        elif code == 4:
            rows.append((base[0], "delete", *base[1:], None, None, None,
                         None, None, ts))
        else:
            rows.append((base[0], "update", *base[1:], None, None, None,
                         {"role": f"r{payload % 4}"}, None, ts))
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy, cut=st.integers(1, 29))
def test_partial_reconstruction_equals_golden_and_slicing_invariant(spark, ops, cut):
    """For ANY mixed full/delta op sequence: (a) a two-slice sink merge
    equals the sequential golden replay; (b) slicing position never
    changes the result (delta whose base is in an earlier slice folds
    onto persisted state)."""
    import tempfile

    from aktuell_spark.streaming.sink import BucketedUpsertTable

    rows = partial_ops_to_rows(ops)
    golden = golden_partial_replay([
        dict(zip(("seq", "op", "database", "collection", "conv_id", "turn_idx",
                  "role", "text", "tool", "updated_fields", "removed_fields",
                  "ts"), r))
        for r in rows
    ])
    df = spark.createDataFrame(rows, CHANGE_DDL)
    cut_seq = min(cut, len(rows))

    with tempfile.TemporaryDirectory() as root:
        table = BucketedUpsertTable(spark, root, n_buckets=4, partial_updates=True)
        table.merge_batch(df.filter(F.col("seq") <= cut_seq), 0)
        table.merge_batch(df.filter(F.col("seq") > cut_seq), 1)
        got = {(r["conv_id"], r["turn_idx"]): r.asDict()
               for r in table.read().collect()}

    assert set(got) == set(golden)
    for k, exp in golden.items():
        for c in ("role", "text", "tool", "ts"):
            assert got[k][c] == exp[c], f"{k}.{c}: {got[k][c]!r} != {exp[c]!r}"
