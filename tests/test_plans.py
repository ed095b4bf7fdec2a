"""Physical-plan assertions: the plans we designed are the plans we get.

These are scale guardrails — each assertion is a property that, if it
silently regressed, would turn a 100 TB job from feasible to impossible
(full-table scan, sort-merge instead of broadcast, extra shuffles).
"""

from __future__ import annotations

from aktuell_spark.plans.explain import (
    count_exchanges,
    has_pushed_filter,
    join_strategies,
    read_schema_columns,
)
from aktuell_spark.queries import (
    q_cdc_latest_image,
    q_postimage_enrich,
    q_subscription_filter,
    q_token_stats,
    q_tumbling_window,
)

SF = "/root/testdata/sf0.01"


def test_subscription_filter_pushes_to_scan(spark):
    df = q_subscription_filter(spark, SF)
    assert has_pushed_filter(df, "event_type"), "isin filter must reach parquet"
    read = read_schema_columns(df)
    assert "props" not in read and "value" not in read, (
        f"column pruning failed: scan reads {read}"
    )


def test_broadcast_join_chosen_for_small_dim(spark):
    df = q_postimage_enrich(spark, SF)
    assert "BroadcastHashJoin" in join_strategies(df)
    assert "SortMergeJoin" not in join_strategies(df)


def test_latest_image_single_shuffle(spark):
    # LWW = one Exchange on the key, nothing else
    df = q_cdc_latest_image(spark, SF)
    assert count_exchanges(df) == 1, "latest-image must shuffle exactly once"


def test_tumbling_window_single_shuffle_partial_agg(spark):
    df = q_tumbling_window(spark, SF)
    assert count_exchanges(df) == 1, "windowed count must be one shuffle (map-side partial)"


def test_token_stats_no_shuffle(spark):
    df = q_token_stats(spark, SF)
    assert count_exchanges(df) == 0, "narrow text ops must not shuffle"
    read = read_schema_columns(df)
    assert set(read) <= {"doc_id", "text"}, f"scan should read only id+text, got {read}"
