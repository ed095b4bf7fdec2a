"""Curriculum ordering + token-budget mixture (queries-level ops):
plan shape and keep-all/clamp semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aktuell_spark.queries import (
    MIX_BUDGET,
    MIX_WEIGHTS,
    q_curriculum_order,
    q_token_budget_mix,
)

SF = "/root/testdata/sf0.001"


def test_curriculum_order_single_exchange(spark):
    plan = (
        q_curriculum_order(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # one shard-keyed window, no global sort


def test_curriculum_order_is_dense_and_binned(spark):
    rows = q_curriculum_order(spark, SF).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["ord"])
        assert [r["ord"] for r in rs] == list(range(1, len(rs) + 1))
        bins = [r["bin"] for r in rs]
        assert bins == sorted(bins, reverse=True)  # hardest-last curriculum


def test_token_budget_mix_semantics(spark):
    # sf0.01: fr's budget share (4000 tokens) exceeds its corpus
    # (~3.8k tokens), so the clamp path is really taken
    rows = {r["lang"]: r
            for r in q_token_budget_mix(spark, "/root/testdata/sf0.01").collect()}
    assert set(rows) == set(MIX_WEIGHTS)
    for lang, r in rows.items():
        assert 0.0 < r["rate"] <= 1.0
        if r["rate"] == 1.0:  # keep-all path: clamped overshoot
            assert r["tokens_sampled"] == r["lang_tokens"]
            assert MIX_BUDGET * MIX_WEIGHTS[lang] >= r["lang_tokens"]
        else:
            assert r["tokens_sampled"] <= r["lang_tokens"]
    # the fr overshoot fixture really exercises the clamp
    assert rows["fr"]["rate"] == 1.0


def test_token_budget_mix_deterministic(spark):
    a = sorted(map(tuple, q_token_budget_mix(spark, SF).collect()))
    b = sorted(map(tuple, q_token_budget_mix(spark, SF).collect()))
    assert a == b
