"""SFT example building: transcripts -> templated training text with
loss-active character spans.

The reference materializes per-conversation ordered turn state for
clients (client merge useAktuellStream.ts:125-171; per-turn stable
ordering is the O4 guarantee). The training-side consumer of exactly
that state is an SFT example builder: render the ordered turns into one
templated string per conversation and mark which character ranges the
loss applies to (the "assistant" turns) — the loss mask every
instruction-tuning pipeline needs.

Spark shape: ONE shuffle (hash by conversation), everything after is
partition-local window arithmetic over the ordered turns. The second
window (span numbering after the loss-role filter) reuses the first
window's partitioning+ordering, so Catalyst plans no extra exchange.
Offsets are exact integer char arithmetic — byte-identical across
engines — so the span table is value-verifiable against a pure-SQL
oracle, unlike a rendered-text-only contract where a masking bug could
hide.

At 10^12 turns: per-conversation work only; no global sort, no
driver-side state. Skewed (hot) conversations no longer serialize one
long task: ``sft_text(salt_span=...)`` (and conversation_export's
export_conversations) take the two-phase salted-block path — partial
render per (conv, order-block), then a bounded block-order merge —
byte-identical to the flat path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aktuell_spark.operators.sharding import shard_id


def render_segment(role_col: str, text_col: str):
    """One turn's rendered segment: ``<|role|>text\\n``. NULL text
    renders as empty (the turn header still takes space, exactly like
    a tool-call turn with no content)."""
    return F.concat(
        F.lit("<|"), F.col(role_col), F.lit("|>"),
        F.coalesce(F.col(text_col), F.lit("")), F.lit("\n"),
    )


def sft_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_role: str = "assistant",
) -> DataFrame:
    """Loss-active spans of the rendered conversation.

    One row per loss-role turn: ``(conv, span_idx, start_char,
    end_char, seg_chars, total_chars)`` — ``[start_char, end_char)``
    indexes into the string ``sft_text`` builds, ``span_idx`` numbers
    the loss spans within the conversation, ``total_chars`` is the full
    rendered length. ``order_col`` must be unique per conversation
    (the engine's stable-ordering invariant guarantees this for
    materialized turns).
    """
    seg = render_segment(role_col, text_col)
    w = Window.partitionBy(conv_col).orderBy(order_col)
    w_all = Window.partitionBy(conv_col)
    seg_chars = F.length(seg)
    return (
        df.select(
            F.col(conv_col),
            F.col(order_col),
            F.col(role_col),
            seg_chars.alias("seg_chars"),
        )
        .withColumn(
            "start_char",
            (F.sum("seg_chars").over(w) - F.col("seg_chars")).cast("long"),
        )
        .withColumn("total_chars", F.sum("seg_chars").over(w_all).cast("long"))
        .filter(F.col(role_col) == loss_role)
        .select(
            F.col(conv_col),
            F.row_number().over(w).cast("long").alias("span_idx"),
            F.col("start_char"),
            (F.col("start_char") + F.col("seg_chars")).cast("long").alias("end_char"),
            F.col("seg_chars").cast("long").alias("seg_chars"),
            F.col("total_chars"),
        )
    )


def sft_text(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    salt_span: int | None = None,
) -> DataFrame:
    """The rendered training string per conversation — the text the
    spans index into. Map-side partial ``collect_list`` then a
    partition-local ``array_sort`` on the unique order key (same shape
    as conversation_export; never a global sort).

    ``salt_span`` turns on the TWO-PHASE hot-conversation path (round-6
    task #6): phase 1 groups by (conv, floor(order/salt_span)) — a
    pathologically hot conversation's turns spread across many reducer
    tasks instead of serializing one — and renders each contiguous
    order-block to a partial string; phase 2 re-groups by conv alone
    and concatenates the (few, pre-rendered) blocks in block order.
    floor() blocking is MONOTONE in the order key, so block-local sort
    + block-order concat equals the global per-conv order and the
    output is byte-identical to the unsalted path (pinned by
    tests/test_salted_export.py). Phase-2 fan-in per conversation is
    n_turns/salt_span rows, bounded by span choice, not by how hot the
    conversation is."""
    seg = render_segment(role_col, text_col)
    if salt_span is None:
        packed = F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), seg.alias("s")))
        )
        return df.groupBy(F.col(conv_col)).agg(
            F.array_join(F.transform(packed, lambda x: x["s"]), "").alias("sft_text"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
        )
    if salt_span <= 0:
        raise ValueError(f"salt_span must be positive, got {salt_span}")
    blk = F.floor(F.col(order_col) / salt_span).cast("long")
    part = df.groupBy(F.col(conv_col), blk.alias("_blk")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(order_col).alias("o"), seg.alias("s"))
                    )
                ),
                lambda x: x["s"],
            ),
            "",
        ).alias("_part"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    merged = F.array_sort(
        F.collect_list(F.struct(F.col("_blk").alias("o"), F.col("_part").alias("s")))
    )
    return part.groupBy(F.col(conv_col)).agg(
        F.array_join(F.transform(merged, lambda x: x["s"]), "").alias("sft_text"),
        F.sum("_n").cast("long").alias("n_turns"),
    )


def export_conversations(
    df: DataFrame,
    seg,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    sep: str = "|",
    salt_span: int | None = None,
) -> DataFrame:
    """Generic ordered per-conversation serialization: one row per
    conversation with ``seg`` (a Column — the rendered per-event
    segment) concatenated in ``order_col`` order, plus count/min/max
    lineage. The batch form of the streaming engine's stable-per-turn-
    ordering guarantee (O4). ``salt_span`` enables the same two-phase
    hot-conversation path as sft_text: partial ``sep``-joined strings
    per contiguous order-block, then a bounded block-order merge —
    byte-identical because floor-blocking is monotone in the order key
    and ``sep`` joins associate."""
    o = F.col(order_col)
    if salt_span is None:
        packed = F.array_sort(
            F.collect_list(F.struct(o.alias("o"), seg.alias("s")))
        )
        return df.groupBy(F.col(conv_col)).agg(
            F.count("*").alias("n_events"),
            F.min(order_col).alias("first_o"),
            F.max(order_col).alias("last_o"),
            F.array_join(F.transform(packed, lambda x: x["s"]), sep).alias("log"),
        )
    if salt_span <= 0:
        raise ValueError(f"salt_span must be positive, got {salt_span}")
    blk = F.floor(o / salt_span).cast("long")
    part = df.groupBy(F.col(conv_col), blk.alias("_blk")).agg(
        F.count("*").alias("_n"),
        F.min(order_col).alias("_first"),
        F.max(order_col).alias("_last"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(o.alias("o"), seg.alias("s")))
                ),
                lambda x: x["s"],
            ),
            sep,
        ).alias("_part"),
        # non-null segments in the block: the flat path's array_join
        # skips NULL segments WITHOUT a separator, so a block that
        # contributed zero elements must not inject one at the merge
        # (an empty-STRING partial from real "" segments still counts)
        F.sum(seg.isNotNull().cast("long")).alias("_nn"),
    )
    merged = F.array_sort(
        F.collect_list(
            F.when(
                F.col("_nn") > 0,
                F.struct(F.col("_blk").alias("o"), F.col("_part").alias("s")),
            )
        )
    )
    return part.groupBy(F.col(conv_col)).agg(
        F.sum("_n").alias("n_events"),
        F.min("_first").alias("first_o"),
        F.max("_last").alias("last_o"),
        F.array_join(F.transform(merged, lambda x: x["s"]), sep).alias("log"),
    )


def packed_sft_spans(
    df: DataFrame,
    target_chars: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_role: str = "assistant",
    n_shards: int = 64,
) -> DataFrame:
    """Loss spans in PACKED-STREAM coordinates — the join of the SFT
    mask with chunked sequence packing (functions/packing.py
    semantics): conversations are sharded by key, concatenated in
    conversation order within each shard, and cut into
    ``target_chars`` windows; every loss span lands at
    ``[abs_start, abs_end)`` in its shard's concat stream with
    ``pack_id = abs_start // target_chars``. This is exactly what a
    dataloader needs to reconstruct the loss mask of a packed batch.

    Scale shape: conversation-keyed window (spans) + one
    conversation-keyed agg (rendered lengths, same key — Catalyst
    reuses the partitioning) + one shard-keyed window (conversation
    start offsets; n_shards bounds nothing by corpus size) + one
    equi-join back on the conversation key. No global sort; pack
    boundaries never cross shards.
    """
    if target_chars <= 0:
        raise ValueError(f"target_chars must be positive, got {target_chars}")
    spans = sft_spans(df, conv_col, order_col, role_col, text_col, loss_role)
    conv_len = (
        df.select(
            F.col(conv_col), render_segment(role_col, text_col).alias("_seg")
        )
        .groupBy(conv_col)
        .agg(F.sum(F.length("_seg")).cast("long").alias("conv_chars"))
        .withColumn("shard", shard_id(F.col(conv_col), n_shards).cast("long"))
    )
    w_shard = (
        Window.partitionBy("shard")
        .orderBy(conv_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    starts = conv_len.withColumn(
        "conv_start",
        (F.sum("conv_chars").over(w_shard) - F.col("conv_chars")).cast("long"),
    )
    return (
        spans.join(starts, conv_col)
        .select(
            F.col(conv_col),
            "span_idx",
            "shard",
            F.floor((F.col("conv_start") + F.col("start_char")) / target_chars)
            .cast("long")
            .alias("pack_id"),
            (F.col("conv_start") + F.col("start_char")).alias("abs_start"),
            (F.col("conv_start") + F.col("end_char")).alias("abs_end"),
        )
    )


def preference_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "turn_idx",
    role_col: str = "role",
    score_col: str = "score",
    loss_role: str = "assistant",
) -> DataFrame:
    """Preference-pair extraction (DPO/RLHF data prep): per
    conversation, the highest-scored loss-role turn becomes ``chosen``
    and the lowest-scored becomes ``rejected`` (ties broken by id
    ascending — fully deterministic, engine-reproducible). Conversations
    with fewer than two candidates, or whose candidates all tie, yield
    no pair — only strict preferences (margin > 0) are emitted.

    ONE map-side-combinable shuffle: chosen/rejected are
    ``max(struct(score, -id))`` / ``min(struct(score, id))`` — struct
    ordering gives exactly the (score, id-tiebreak) argmax/argmin, and
    partial aggregation combines on the map side, so the exchange
    carries one row per (partition, conversation) however long the
    conversations are. Strictly cheaper at scale than the equivalent
    two rank windows + self-join (full sort + 3 exchanges).
    """
    cand = df.filter(F.col(role_col) == loss_role).select(
        F.col(conv_col), F.col(id_col), F.col(score_col)
    )
    agg = cand.groupBy(conv_col).agg(
        F.max(
            F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("ni"))
        ).alias("_best"),
        F.min(
            F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
        ).alias("_worst"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        # only STRICT preferences leave the operator: an all-tied
        # conversation carries no preference signal (margin-0 pairs
        # are useless to DPO and ambiguous under tiebreaks)
        agg.filter(
            (F.col("_n") >= 2) & (F.col("_best.s") > F.col("_worst.s"))
        )
        .select(
            conv_col,
            (-F.col("_best.ni")).alias("chosen_id"),
            F.col("_worst.i").alias("rejected_id"),
            F.round(F.col("_best.s"), 6).alias("chosen_score"),
            F.round(F.col("_worst.s"), 6).alias("rejected_score"),
            F.round(F.col("_best.s") - F.col("_worst.s"), 6).alias("margin"),
        )
    )
