"""Two-phase salted export for hot conversations (round-6 task #6):
one pathologically hot conversation must not serialize a single task in
sft_text / conversation_export, and the salted output must stay
byte-identical to the flat path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.fixtures import gen_transcripts
from aktuell_spark.functions.sft import export_conversations, sft_text


@pytest.fixture(scope="module")
def hot(spark):
    """3 hot conversations (600 turns) among 20 normal ones."""
    return gen_transcripts(
        spark, n_convs=23, avg_turns=6, hot_turns=600, n_hot=3, seed=66
    ).localCheckpoint()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sft_text_salted_byte_identical(spark, hot):
    flat = sft_text(hot)
    for span in (16, 100, 7):
        salted = sft_text(hot, salt_span=span)
        assert _rows(salted) == _rows(flat)


def test_export_conversations_salted_byte_identical(spark, hot):
    seg = F.concat_ws("@", F.col("role"), F.col("turn_idx").cast("string"))
    flat = export_conversations(hot, seg)
    seg2 = F.concat_ws("@", F.col("role"), F.col("turn_idx").cast("string"))
    salted = export_conversations(hot, seg2, salt_span=50)
    assert _rows(salted) == _rows(flat)


def test_salted_plan_partitions_on_conv_and_block(spark, hot):
    """The phase-1 exchange must key on (conv, block) — the hot
    conversation's 600 turns spread across block groups instead of one
    reducer — and the phase-2 exchange on conv alone."""
    import re

    plan = sft_text(hot, salt_span=32)._jdf.queryExecution().executedPlan().toString()
    parts = [
        [k.strip() for k in p.split(",")[:-1]]  # last item = numPartitions
        for p in re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    ]
    # phase 1 keys on (conv_id, block) — Catalyst renames the floor()
    # alias to _groupingexpression, so assert by key COUNT; phase 2
    # keys on conv_id alone
    assert any(len(p) == 2 and p[0].startswith("conv_id") for p in parts), parts
    assert any(len(p) == 1 and p[0].startswith("conv_id") for p in parts), parts
    # the hot conv splits into many phase-1 groups
    n_groups = (
        hot.filter(F.col("conv_id") == "c000000")
        .select((F.floor(F.col("turn_idx") / 32)).alias("b"))
        .distinct()
        .count()
    )
    assert n_groups >= 600 // 32


def test_salt_span_validation(spark, hot):
    with pytest.raises(ValueError, match="salt_span"):
        sft_text(hot, salt_span=0)
    with pytest.raises(ValueError, match="salt_span"):
        export_conversations(hot, F.col("text"), salt_span=-3)


def test_salted_export_nullable_segments_stay_byte_identical(spark):
    """A NULL segment (e.g. null role null-propagating through concat)
    is skipped by the flat path's array_join WITHOUT a separator; the
    salted path must not inject one even when a whole order-block
    renders NULL (ADVICE r6)."""
    from pyspark.sql import functions as F

    from aktuell_spark.functions.sft import export_conversations

    rows = [
        # conv c1: block 0 (turns 0-1) entirely NULL segs, block 1 mixed
        ("c1", 0, None), ("c1", 1, None), ("c1", 2, "x"), ("c1", 3, None),
        # conv c2: leading real, NULL tail block
        ("c2", 0, "a"), ("c2", 1, "b"), ("c2", 4, None), ("c2", 5, None),
        # conv c3: all NULL
        ("c3", 0, None), ("c3", 1, None),
        # conv c4: empty-STRING segments are real elements (kept, with seps)
        ("c4", 0, ""), ("c4", 1, ""), ("c4", 2, "z"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, piece string")
    seg = F.col("piece")  # NULL piece → NULL segment
    for sep in ("|", ""):
        flat = {
            r["conv_id"]: tuple(r)
            for r in export_conversations(df, seg, sep=sep).collect()
        }
        salted = {
            r["conv_id"]: tuple(r)
            for r in export_conversations(df, seg, sep=sep, salt_span=2).collect()
        }
        assert flat == salted, f"sep={sep!r}"
    # sanity: flat semantics are what array_join gives
    flat = {r["conv_id"]: r["log"]
            for r in export_conversations(df, seg, sep="|").collect()}
    assert flat == {"c1": "x", "c2": "a|b", "c3": "", "c4": "||z"}
