"""CDC core: dedupe, last-writer-wins collapse, materialization.

This is the Spark restatement of the reference's client-side CDC merge
(`applyChangeToSnapshot`,
/root/reference/react-client/src/hooks/useAktuellStream.ts:125-171:
insert→push, update/replace→replace-by-id else push, delete→remove) and
its resume-token identity (/root/reference/pkg/sync/database.go:176-178).

Scale notes:
- ``dedupe_events`` / ``collapse_last_writer_wins`` shuffle once on the
  primary key — the same shuffle Catalyst would need for any keyed merge;
  the window aggregation is map-side-combinable via AQE.
- All predicates are plain column expressions → full pushdown/pruning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY_COLS: tuple[str, str] = ("conv_id", "turn_idx")
PAYLOAD_COLS: tuple[str, ...] = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def dedupe_events(events: DataFrame, key: Sequence[str] = ("seq",)) -> DataFrame:
    """Drop redelivered events (identical ``seq``).

    Batch analogue of the streaming watermarked
    ``dropDuplicates([\"seq\"])`` — the reference has no dedupe at all
    (blind resubscribe redelivers, pkg/client/client.go:469-485); we make
    redelivery harmless instead.
    """
    return events.dropDuplicates(list(key))


def collapse_last_writer_wins(
    events: DataFrame, key: Sequence[str] = KEY_COLS, order_col: str = "seq"
) -> DataFrame:
    """Keep only the newest event per key (max ``seq``).

    A micro-batch (or a bounded replay) may hold insert→update→delete
    chains for one key; MERGE semantics need exactly one source row per
    key. Equivalent SQL: ``row_number() over (partition by key order by
    seq desc) = 1`` — implemented as ``max_by(struct(*), seq)`` instead:
    hash aggregation with map-side partial combine, vs the window form's
    full sort per partition (and no partial aggregation). Ties on
    ``order_col`` pick an arbitrary row, same as row_number ties —
    harmless because equal-seq rows are redeliveries of the same event.
    """
    cols = [c for c in events.columns]
    packed = events.groupBy(*key).agg(
        F.max_by(F.struct(*[F.col(c) for c in cols if c not in key]), F.col(order_col)).alias("_r")
    )
    return packed.select(*key, *[F.col(f"_r.{c}").alias(c) for c in cols if c not in key])


def apply_collection_ops(events: DataFrame, order_col: str = "seq") -> DataFrame:
    """Batch analogue of the sink's collection-op handling
    (drop/rename, reference op enum /root/reference/pkg/models/types.go:101-108).

    The newest ``drop`` seq is a collection-level tombstone: every event
    at or below it is dead (MongoDB drop removes all documents).
    ``rename`` preserves documents — marker rows are removed, routing is
    the subscription filter's job. The floor travels as a broadcast
    one-row aggregate, so this is a narrow filter with no driver action
    and no shuffle beyond the scalar agg.
    """
    floor = events.agg(
        F.max(F.when(F.col("op") == "drop", F.col(order_col))).alias("_floor")
    )
    out = events.join(F.broadcast(floor), how="cross")
    out = out.filter(~F.col("op").isin("drop", "rename"))
    out = out.filter(F.col("_floor").isNull() | (F.col(order_col) > F.col("_floor")))
    return out.drop("_floor")


def rename_intervals(
    markers: Sequence[tuple[int, str, str]],
) -> list[tuple[str, int, int, str]]:
    """Compose rename markers ``(seq, old, new)`` into lookup intervals
    ``(name, lo, hi, final)``: an event on collection *name* with
    ``lo <= seq < hi`` finally belongs to collection *final* after every
    later rename (chains compose: a→b then b→c maps an early a-event to
    c). Rows where final == name are omitted. Marker counts are
    collection-level ops — a handful per table lifetime — so this is
    driver-side math over a tiny list, never data-sized.
    """
    rs = sorted(markers)

    def final(c: str, s: int) -> str:
        cur, s_cur = c, s
        for seq, old, new in rs:
            if seq > s_cur and old == cur:
                cur, s_cur = new, seq
        return cur

    LO = -(2**62)
    out: list[tuple[str, int, int, str]] = []
    for c in sorted({old for _, old, _ in rs}):
        lo = LO
        for cut in sorted({seq for seq, old, _ in rs if old == c}):
            f = final(c, cut - 1)
            if f != c:
                out.append((c, lo, cut, f))
            lo = cut
    return out


def resolve_renames(events: DataFrame, extra_col: str = "extra") -> DataFrame:
    """Read-path rename aliasing (reference op enum
    pkg/models/types.go:101-108; Mongo rename preserves documents under
    the new namespace): adds ``collection_resolved`` — the collection an
    event finally belongs to after every rename in the feed — so a
    subscription to the new name sees pre-rename rows too.

    Rename markers carry the target namespace as ``extra['to']`` (the
    change stream's ``to`` field). The marker set is collected to the
    driver (bounded: collection-level ops, not data) and applied as a
    broadcast interval join — one narrow pass, no shuffle of *events*.
    """
    op = F.col("op")
    if extra_col not in events.columns:
        return events.withColumn("collection_resolved", F.col("collection"))
    to = F.element_at(F.col(extra_col), F.lit("to"))
    markers = [
        (r["seq"], r["collection"], r["to"])
        for r in events.filter((op == "rename") & to.isNotNull())
        .select("seq", "collection", to.alias("to"))
        .collect()
    ]
    intervals = rename_intervals(markers)
    if not intervals:
        return events.withColumn("collection_resolved", F.col("collection"))
    lookup = events.sparkSession.createDataFrame(
        intervals, "name string, lo long, hi long, final string"
    )
    joined = events.join(
        F.broadcast(lookup),
        (F.col("collection") == F.col("name"))
        & (F.col("seq") >= F.col("lo"))
        & (F.col("seq") < F.col("hi")),
        "left",
    )
    return joined.withColumn(
        "collection_resolved", F.coalesce(F.col("final"), F.col("collection"))
    ).drop("name", "lo", "hi", "final")


def is_partial_update(events: DataFrame):
    """Predicate: event carries a partial update (no full post-image).

    Reference semantics: update events carry ``UpdatedFields`` /
    ``RemovedFields`` (/root/reference/pkg/models/types.go:17-18); the
    full post-image is only present when the source can do UpdateLookup
    (/root/reference/pkg/sync/database.go:78). An update with a null
    ``text`` payload and a non-null delta is the no-UpdateLookup case.
    Misclassification is harmless when both representations are
    consistent: applying the delta to the prior image IS the post-image.
    Materialized state rows never carry deltas, so they are always full.
    """
    return (
        (F.col("op") == "update")
        & F.col("text").isNull()
        & (F.col("updated_fields").isNotNull() | F.col("removed_fields").isNotNull())
    )


def reconstruct_post_images(
    events: DataFrame,
    key: Sequence[str] = KEY_COLS,
    order_col: str = "seq",
    delta_cols: Sequence[str] = ("role", "text", "tool"),
    ts_col: str = "ts",
    extra_col: str = "extra",
) -> DataFrame:
    """Collapse a batch that mixes full images and partial updates into
    one full post-image row per key (S3 — the reference's
    SetFullDocument(UpdateLookup) done in-engine, database.go:78).

    Per key: take the newest *full* event (insert/replace/delete or
    update-with-post-image) as the base, then fold every partial update
    newer than it in ``seq`` order — ``updated_fields[c]`` overwrites
    column c, membership in ``removed_fields`` nulls it, the envelope
    ``ts``/``seq`` advance with each applied event. MongoDB semantics
    preserved: a partial update with no base (update on a missing doc)
    matches nothing and is dropped; partials sequenced after a delete
    are no-ops (the tombstone stays).

    All JVM-side: one ``max_by`` hash-agg for bases, one
    ``collect_list`` agg for partials (bounded by a key's in-flight
    delta chain, not table size), one key-partitioned join, and a
    higher-order ``aggregate`` fold — no Python, no window sort.
    Output: key + delta_cols + ts + ``order_col`` + op.

    Residual dynamic fields: when the input carries ``extra_col`` (a
    ``map<string,string>`` of schemaless document fields, reference
    pkg/models/types.go:16), delta keys that name no fixed column fold
    into that map — ``updated_fields['k']`` upserts ``extra[k]``,
    membership in ``removed_fields`` deletes it.
    """
    fold_extra = extra_col in events.columns
    part = is_partial_update(events)
    base = collapse_last_writer_wins(events.filter(~part), key=key, order_col=order_col)

    ups = (
        events.filter(part)
        .groupBy(*key)
        .agg(
            # array_sort with an explicit seq comparator: sort_array
            # cannot order structs that contain map columns
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("seq"),
                        F.col("updated_fields").alias("uf"),
                        F.col("removed_fields").alias("rf"),
                        F.col(ts_col).alias("ts"),
                    )
                ),
                lambda l, r: F.when(l["seq"] < r["seq"], F.lit(-1))
                .when(l["seq"] > r["seq"], F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("_ups")
        )
    )

    joined = base.join(ups, on=list(key), how="left")

    empty_map = F.create_map().cast("map<string,string>")
    empty_arr = F.array().cast("array<string>")

    def _apply(acc, u):
        fields = []
        for c in delta_cols:
            fields.append(
                F.when(F.map_contains_key(u["uf"], F.lit(c)), F.element_at(u["uf"], F.lit(c)))
                .when(
                    F.coalesce(F.array_contains(u["rf"], F.lit(c)), F.lit(False)),
                    F.lit(None).cast("string"),
                )
                .otherwise(acc[c])
                .alias(c)
            )
        if fold_extra:
            # residual delta keys (not a fixed column) upsert/delete in
            # the extra map; all map ops, no duplicate keys by
            # construction (kept ∩ new = ∅), stays JVM-side
            uf = F.coalesce(u["uf"], empty_map)
            rf = F.coalesce(u["rf"], empty_arr)
            uf_res = F.map_filter(uf, lambda k, _v: ~k.isin(*delta_cols))
            kept = F.map_filter(
                F.coalesce(acc[extra_col], empty_map),
                lambda k, _v: ~F.array_contains(rf, k)
                & ~F.map_contains_key(uf_res, k),
            )
            fields.append(F.map_concat(kept, uf_res).alias(extra_col))
        fields.append(u["ts"].alias("ts"))
        fields.append(u["seq"].alias("seq"))
        return F.struct(*fields)

    init = F.struct(
        *[F.col(c).alias(c) for c in delta_cols],
        *([F.col(extra_col).alias(extra_col)] if fold_extra else []),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("seq"),
    )
    empty = F.array().cast(ups.schema["_ups"].dataType)
    applicable = F.when(F.col("op") == "delete", empty).otherwise(
        F.filter(F.coalesce(F.col("_ups"), empty), lambda u: u["seq"] > F.col(order_col))
    )
    folded = F.aggregate(applicable, init, _apply)

    passthrough = [c for c in events.columns
                   if c not in (*key, *delta_cols, ts_col, order_col, "op",
                                "updated_fields", "removed_fields", extra_col)]
    return joined.select(
        *key,
        *[folded[c].alias(c) for c in delta_cols],
        *([folded[extra_col].alias(extra_col)] if fold_extra else []),
        folded["ts"].alias(ts_col),
        folded["seq"].alias(order_col),
        "op",
        *passthrough,
    )


def merge_delta_chains(
    events: DataFrame,
    key: Sequence[str] = KEY_COLS,
    order_col: str = "seq",
    ts_col: str = "ts",
) -> DataFrame:
    """Fold a per-key chain of partial updates into ONE net partial.

    The change-feed analogue of ``reconstruct_post_images`` for keys
    that have no full image in the folded range: the output row is
    still a partial update (``op='update'``, null payload columns) but
    its ``updated_fields``/``removed_fields`` are the NET delta of the
    whole chain — a later set of field c wins over an earlier one, a
    removal cancels an earlier set (and vice versa), and the envelope
    ``ts``/``seq`` advance to the newest event's. Applying the merged
    delta to any base state gives the same result as applying the chain
    event-by-event in ``seq`` order (MongoDB update semantics,
    reference pkg/models/types.go:17-18).

    One hash-agg ``collect_list`` per key (bounded by a key's in-flight
    delta chain, not table size) + a JVM-side higher-order fold — no
    Python, no window sort. Non-key columns other than the delta maps
    and the envelope pass through from the newest event.
    """
    empty_map = F.create_map().cast("map<string,string>")
    empty_arr = F.array().cast("array<string>")
    other = [
        c for c in events.columns
        if c not in (*key, "updated_fields", "removed_fields", ts_col, order_col)
    ]
    chains = events.groupBy(*key).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("seq"),
                    F.col("updated_fields").alias("uf"),
                    F.col("removed_fields").alias("rf"),
                    F.col(ts_col).alias("ts"),
                )
            ),
            lambda l, r: F.when(l["seq"] < r["seq"], F.lit(-1))
            .when(l["seq"] > r["seq"], F.lit(1))
            .otherwise(F.lit(0)),
        ).alias("_chain"),
        F.max_by(
            F.struct(*[F.col(c) for c in other]), F.col(order_col)
        ).alias("_r"),
    )

    def _fold(acc, u):
        uf = F.coalesce(u["uf"], empty_map)
        rf = F.coalesce(u["rf"], empty_arr)
        # fields set by this event win; fields it removes drop out of
        # the accumulated set-map, and fields it sets drop out of the
        # accumulated removal list (an event's own uf/rf are disjoint)
        kept = F.map_filter(
            acc["uf"],
            lambda k, _v: ~F.map_contains_key(uf, k) & ~F.array_contains(rf, k),
        )
        return F.struct(
            F.map_concat(kept, uf).alias("uf"),
            F.array_distinct(
                F.concat(
                    F.filter(acc["rf"], lambda f: ~F.map_contains_key(uf, f)), rf
                )
            ).alias("rf"),
            u["ts"].alias("ts"),
            u["seq"].alias("seq"),
        )

    init = F.struct(
        empty_map.alias("uf"),
        empty_arr.alias("rf"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("long").alias("seq"),
    )
    folded = F.aggregate(F.col("_chain"), init, _fold)
    return chains.select(
        *key,
        *[F.col(f"_r.{c}").alias(c) for c in other],
        folded["uf"].alias("updated_fields"),
        folded["rf"].alias("removed_fields"),
        folded["ts"].alias(ts_col),
        folded["seq"].alias(order_col),
    )


def latest_image(
    events: DataFrame,
    key: Sequence[str] = KEY_COLS,
    payload: Sequence[str] = PAYLOAD_COLS,
) -> DataFrame:
    """Materialize current state from a bounded CDC replay.

    dedupe → last-writer-wins → drop deleted keys → project post-image.
    This is the batch golden path the streaming sink must converge to
    (reference semantics: useAktuellStream.ts:125-171 replayed to the
    end of the stream).
    """
    newest = collapse_last_writer_wins(dedupe_events(events), key=key)
    return newest.filter(F.col("op") != "delete").select(*payload)


def apply_batch_to_state(
    state: DataFrame,
    batch: DataFrame,
    key: Sequence[str] = KEY_COLS,
    payload: Sequence[str] = PAYLOAD_COLS,
) -> DataFrame:
    """One MERGE step: fold a change batch into an existing state table.

    Iceberg equivalent (what we'd run with a real catalog)::

        MERGE INTO state t USING batch_collapsed s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *

    Expressed relationally: state rows not touched by the batch, unioned
    with the batch's surviving post-images. One shuffle on the key.
    """
    collapsed = collapse_last_writer_wins(dedupe_events(batch), key=key)
    survivors = collapsed.filter(F.col("op") != "delete").select(*payload)
    untouched = state.join(collapsed.select(*key), on=list(key), how="left_anti")
    return untouched.unionByName(survivors)
