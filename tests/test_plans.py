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


def test_bpe_token_stats_no_shuffle(spark):
    from aktuell_spark.queries import q_token_stats_bpe

    df = q_token_stats_bpe(spark, SF)
    assert count_exchanges(df) == 0, "BPE token stats must be a narrow map"
    read = read_schema_columns(df)
    assert set(read) <= {"doc_id", "text"}, f"scan should read only id+text, got {read}"


def test_multi_subscription_routing_single_scan(spark):
    """Routing one event to N subscribers must be ONE scan + explode,
    never N scans (the plan contains a single parquet relation)."""
    from aktuell_spark.plans.explain import formatted_plan
    from aktuell_spark.queries import q_multi_subscription_routing

    df = q_multi_subscription_routing(spark, SF)
    import re

    plan = formatted_plan(df)
    # detail-section nodes only ("(N) Scan parquet"), so the tree header
    # rendering of the same node isn't double-counted
    scans = [ln for ln in plan.splitlines() if re.match(r"^\(\d+\) Scan parquet", ln)]
    assert len(scans) == 1, f"expected one source scan, plan has {len(scans)}"
    assert count_exchanges(df) == 1, "routing rollup is one keyed shuffle"


def test_knn_multiprobe_no_nested_loop(spark):
    """The probe join must stay an equi-join on bucket — a nested-loop
    (cartesian) join here is the N^2 failure mode."""
    from aktuell_spark.queries import q_knn_multiprobe

    df = q_knn_multiprobe(spark, SF)
    assert "BroadcastNestedLoopJoin" not in join_strategies(df)


def test_reconstruct_post_images_no_cartesian(spark):
    """Partial-update reconstruction: one keyed base/deltas join, no
    nested loops, bounded exchanges (bases agg + deltas agg + join)."""
    from pyspark.sql import functions as F

    from aktuell_spark.operators.cdc import reconstruct_post_images

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("event_id").alias("seq"),
        F.lit("insert").alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.lit("x").alias("text"),
        F.lit("t").alias("tool"),
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    df = reconstruct_post_images(ev)
    assert "BroadcastNestedLoopJoin" not in join_strategies(df)
    assert count_exchanges(df) <= 3, (
        f"reconstruction should be <= 3 exchanges, got {count_exchanges(df)}"
    )


def test_deterministic_sample_no_shuffle(spark):
    from aktuell_spark.functions.sampling import deterministic_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    df = deterministic_sample(d, "doc_id", 0.1)
    assert count_exchanges(df) == 0, "hash-membership sampling must not shuffle"


def test_pii_scrub_no_shuffle_and_pruned(spark):
    from aktuell_spark.queries import q_pii_scrub

    df = q_pii_scrub(spark, SF)
    assert count_exchanges(df) == 0, "regexp scrub is a narrow map"
    read = read_schema_columns(df)
    assert set(read) <= {"doc_id", "text"}, f"scan should read only id+text, got {read}"


def test_pii_scrub_single_regexp_evaluation(spark):
    """The three-regexp chain must appear ONCE in the optimized plan:
    ``had_pii`` compares the materialized ``text_scrubbed`` attribute
    instead of re-inlining the chain (CollapseProject only duplicates
    CHEAP expressions, and regexp_replace is not cheap). Two copies
    doubles the scan cost of a 100 TB text corpus."""
    from aktuell_spark.functions.textops import with_pii_scrub

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    df = with_pii_scrub(d)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("<EMAIL>") == 1, (
        f"regexp chain duplicated in plan:\n{plan}"
    )


def test_asof_join_single_shuffle_no_nested_loop(spark):
    from aktuell_spark.queries import q_asof_join

    df = q_asof_join(spark, SF)
    # union of the two sides + one window partitioned by the key: the
    # sides each shuffle once into the window's clustering; anything
    # quadratic (BroadcastNestedLoopJoin / CartesianProduct) is a bug
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert count_exchanges(df) <= 3, f"asof should be union+window shuffles, got {count_exchanges(df)}"


def test_resolve_renames_broadcasts_lookup(spark):
    from aktuell_spark.queries import q_rename_routing

    df = q_rename_routing(spark, SF)
    assert "SortMergeJoin" not in join_strategies(df), (
        "rename interval lookup must broadcast, never sort-merge"
    )


def test_bm25_topk_take_ordered_never_global_sort(spark):
    from aktuell_spark.plans.explain import formatted_plan
    from aktuell_spark.queries import q_bm25_topk

    df = q_bm25_topk(spark, SF)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, (
        "top-k must be per-partition heaps + driver merge of k rows"
    )
    # the terms side must broadcast, never shuffle the corpus to meet it
    assert "BroadcastHashJoin" in join_strategies(df)
    assert "SortMergeJoin" not in join_strategies(df)


def test_semdedup_trained_assignment_is_narrow(spark):
    from aktuell_spark.plans.explain import formatted_plan
    from aktuell_spark.queries import q_semdedup_trained

    df = q_semdedup_trained(spark, SF)
    plan = formatted_plan(df)
    # assignment is an Arrow-batched matrix product inside the UDF
    # closure — centroids must NOT appear as a join side
    assert "ArrowEvalPython" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repeated_spans_linear_never_pairwise(spark):
    from aktuell_spark.plans.explain import formatted_plan
    from aktuell_spark.queries import q_repeated_spans

    df = q_repeated_spans(spark, SF)
    plan = formatted_plan(df)
    # the repeated-gram check is count>=2 on the hash — a pair join
    # here (gram explode squared) is the 100 TB killer
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # gram groupBy + per-doc window: at most 2 hash shuffles (the
    # repeated-hash set rides a broadcast, or AQE adds one more —
    # never more than 3)
    assert count_exchanges(df) <= 3, formatted_plan(df)
    read = read_schema_columns(df)
    assert set(read) <= {"doc_id", "text"}, f"scan must prune to id+text, got {read}"


def test_decontam_contamination_read_is_keyed(spark, tmp_path):
    """The live contamination report is one groupBy over hits + one
    keyed join to the docs denominators — a pair join or nested loop
    here would make reads corpus-quadratic."""
    from pyspark.sql import functions as F

    from aktuell_spark.plans.explain import formatted_plan
    from aktuell_spark.streaming.decontam_index import StreamingDecontamIndex

    index = StreamingDecontamIndex(
        spark, str(tmp_path / "idx"), bench_pred=lambda c: c % 10 == 0,
        n=4, n_buckets=4,
    )
    index.merge_batch(
        spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta", 1),
                (1, "prefix alpha beta gamma delta suffix words", 2),
            ],
            "doc_id long, text string, seq long",
        ),
        0,
    )
    df = index.contamination()
    assert df.count() == 1
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
