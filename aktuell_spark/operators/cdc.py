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
