"""SCD type-2 history view of a CDC stream: every key version with its
validity interval, not just the latest image.

The reference's client materialization keeps only current state —
update/replace overwrite the row in place and history is gone
(/root/reference/react-client/src/hooks/useAktuellStream.ts:133-165).
A warehouse-grade CDC sink also serves time travel: "what did this
turn say before the edit?" This operator derives the slowly-changing-
dimension type-2 table from the same ordered event stream the LWW sink
consumes — each event opens a version valid from its own order key
until the key's next event.

Scale shape: ONE shuffle (per-key window), then ``row_number`` +
``lead`` evaluate in a single window node — the history table costs
exactly one pass more than the latest-image collapse, and at 10^12
events it degrades identically (partition-local after the key
shuffle; AQE/salting for hot keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aktuell_spark.operators.cdc import KEY_COLS


def scd2_history(
    events: DataFrame,
    key: Sequence[str] = KEY_COLS,
    order_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Version every key's events into SCD2 validity intervals.

    Adds: ``version`` (1-based per key, in ``order_col`` order),
    ``valid_from`` (= the event's order key), ``valid_to`` (the next
    version's order key; null while current), ``is_current`` (last
    version AND not a delete — a closing tombstone leaves the key with
    no current version, matching the LWW sink's read filter).
    """
    w = Window.partitionBy(*key).orderBy(order_col)
    return (
        events.withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn(
            "is_current",
            F.col("valid_to").isNull() & (F.col(op_col) != F.lit("delete")),
        )
    )
