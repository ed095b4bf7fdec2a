"""SFT example builder: rendered text + loss-active span table
(functions/sft.py). Spans are verified against a driver-side Python
re-rendering — an independent oracle, same idea as golden_replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.functions.sft import sft_spans, sft_text

ROWS = [
    # conv, turn, role, text
    ("c1", 1, "user", "hi"),
    ("c1", 2, "assistant", "hello there"),
    ("c1", 3, "user", "do thing"),
    ("c1", 4, "assistant", None),        # empty assistant turn
    ("c1", 5, "assistant", "done"),
    ("c2", 1, "assistant", "solo"),
    ("c3", 1, "user", "no assistant turn here"),
]


def py_render(rows):
    """Independent re-rendering: text per conv + loss spans."""
    out = {}
    for conv, turn, role, text in sorted(rows):
        s = f"<|{role}|>{text if text is not None else ''}\n"
        t, spans = out.get(conv, ("", []))
        if role == "assistant":
            spans = spans + [(len(t), len(t) + len(s))]
        out[conv] = (t + s, spans)
    return out


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string"
    )


def test_spans_match_python_rendering(spark, turns):
    want = py_render(ROWS)
    got = sft_spans(turns).collect()
    by_conv: dict = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert set(by_conv) == {"c1", "c2"}  # c3 has no loss turns
    for conv, rows in by_conv.items():
        rows.sort(key=lambda r: r["span_idx"])
        text, spans = want[conv]
        assert [r["span_idx"] for r in rows] == list(range(1, len(spans) + 1))
        assert [(r["start_char"], r["end_char"]) for r in rows] == spans
        for r in rows:
            assert r["total_chars"] == len(text)
            assert r["seg_chars"] == r["end_char"] - r["start_char"]


def test_spans_index_into_rendered_text(spark, turns):
    """The span table and the rendered text agree: slicing the text at
    each span yields exactly the assistant segments."""
    text = {r["conv_id"]: r["sft_text"] for r in sft_text(turns).collect()}
    for r in sft_spans(turns).collect():
        seg = text[r["conv_id"]][r["start_char"]:r["end_char"]]
        assert seg.startswith("<|assistant|>") and seg.endswith("\n")


def test_rendered_text_matches_python(spark, turns):
    want = py_render(ROWS)
    got = {r["conv_id"]: r["sft_text"] for r in sft_text(turns).collect()}
    assert got == {c: t for c, (t, _) in want.items()}


def test_single_shuffle_plan(spark, turns):
    """Both windows + the filter plan under ONE exchange — the second
    window reuses the first's partitioning and ordering."""
    plan = sft_spans(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_partitioning_invariance(spark, turns):
    a = sorted(map(tuple, sft_spans(turns).collect()))
    b = sorted(map(tuple, sft_spans(turns.repartition(7)).collect()))
    assert a == b


def test_packed_spans_match_python(spark):
    """Packed-stream coordinates vs a driver-side recomputation of the
    same chunked-packing semantics (numeric conv keys; shard is the
    portable md5 assignment from operators/sharding.py)."""
    import hashlib

    from aktuell_spark.functions.sft import packed_sft_spans

    rows = [
        (conv, t, ("assistant" if t % 2 == 0 else "user"), f"text {conv} {t}")
        for conv in range(1, 12)
        for t in range(1, conv + 2)
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    target, n_shards = 50, 4

    # python oracle
    segs: dict = {}
    for conv, t, role, text in sorted(rows):
        segs.setdefault(conv, []).append((t, role, f"<|{role}|>{text}\n"))
    conv_chars = {c: sum(len(s) for _, _, s in v) for c, v in segs.items()}
    want = set()
    by_shard: dict = {}
    for c in sorted(segs):
        md5_shard = int(
            hashlib.md5(str(c).encode()).hexdigest()[:8], 16
        ) % n_shards
        by_shard.setdefault(md5_shard, []).append(c)
    for shard, convs in by_shard.items():
        off = 0
        for c in convs:
            pos, idx = 0, 0
            for _, role, s in segs[c]:
                if role == "assistant":
                    idx += 1
                    a = off + pos
                    want.add((c, idx, shard, a // target, a, a + len(s)))
                pos += len(s)
            off += conv_chars[c]

    got = {
        (r["conv_id"], r["span_idx"], r["shard"], r["pack_id"],
         r["abs_start"], r["abs_end"])
        for r in packed_sft_spans(
            df, target_chars=target, n_shards=n_shards
        ).collect()
    }
    assert got == want


def test_packed_spans_string_conv_ids(spark):
    """String conversation keys (the partial-update tables' conv_id
    shape) must shard portably, not collapse into a null shard via a
    failed numeric cast (round-6 ADVICE fix)."""
    import hashlib

    from aktuell_spark.functions.sft import packed_sft_spans

    rows = [
        (f"conv-{c}", t, ("assistant" if t % 2 == 0 else "user"), f"m{c}.{t}")
        for c in range(6)
        for t in range(1, 4)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = packed_sft_spans(df, target_chars=40, n_shards=4).collect()
    assert out, "string keys produced no spans"
    assert all(r["shard"] is not None for r in out)
    got_shards = {r["conv_id"]: r["shard"] for r in out}
    for cid, shard in got_shards.items():
        want = int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 4
        assert shard == want, (cid, shard, want)
    assert len(set(got_shards.values())) > 1, "all convs in one shard"


def test_preference_pairs(spark):
    from aktuell_spark.functions.sft import preference_pairs

    rows = [
        # conv 1: clear best/worst
        (1, 1, "assistant", 0.9), (1, 2, "assistant", 0.1),
        (1, 3, "assistant", 0.5), (1, 4, "user", 99.0),
        # conv 2: score tie -> id tiebreak (chosen=lowest id among max,
        # rejected=lowest id among min, and chosen != rejected)
        (2, 5, "assistant", 0.7), (2, 6, "assistant", 0.7),
        # conv 3: single candidate -> no pair
        (3, 7, "assistant", 0.3),
        # conv 4: no candidates at all
        (4, 8, "user", 0.8),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, score double"
    )
    got = {r["conv_id"]: r for r in preference_pairs(df).collect()}
    # conv 2 is all-tied: no strict preference, no pair
    assert set(got) == {1}
    assert (got[1]["chosen_id"], got[1]["rejected_id"]) == (1, 2)
    assert abs(got[1]["margin"] - 0.8) < 1e-9
    assert got[1]["margin"] > 0


def test_preference_pairs_partitioning_invariant(spark):
    from aktuell_spark.functions.sft import preference_pairs

    rows = [(c, c * 10 + t, "assistant", float((c * 7 + t * 3) % 11) / 11)
            for c in range(1, 20) for t in range(1, 6)]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, score double"
    )
    a = sorted(map(tuple, preference_pairs(df).collect()))
    b = sorted(map(tuple, preference_pairs(df.repartition(13)).collect()))
    assert a == b and len(a) == 19
