"""Top-k / recency operators.

Reference analogue: the dashboard's "last 100 changes" ring buffer
(newest first, /root/reference/react-client/src/hooks/useAktuellStream.ts:248).

Scale: per-key top-k is a single shuffle; the rank filter applies before
any sort of the full data (no global orderBy). For global top-k, prefer
``orderBy(...).limit(k)`` which Spark executes as a TakeOrderedAndProject
(per-partition heap + driver merge — no full sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    k: int,
    desc: bool = True,
) -> DataFrame:
    """Keep the top-``k`` rows per key by ``order_by`` (W1/O4).

    ``order_by`` should include a unique tiebreaker for determinism.
    Output adds ``rn`` (1-based rank, newest first when ``desc``).
    """
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def latest_k_global(df: DataFrame, order_by: Sequence[str], k: int = 100) -> DataFrame:
    """Global "last k" buffer (ring-buffer analogue) — TakeOrdered, not a
    full sort."""
    return df.orderBy(*[F.col(c).desc() for c in order_by]).limit(k)
