"""Hot-key (skew) handling: salted two-phase aggregation.

The reference has no answer to hot keys — one serial cursor and one hub
goroutine (/root/reference/pkg/server/websocket.go:226-267) process
everything. At 10^12-turn scale a handful of hot conversations (the
fixture plants 1-3 conv_ids carrying ~30% of events) would pin single
reducers; AQE only rebalances *joins*, not aggregations, so hot-key
aggregation needs the classic salt → partial-agg → unsalt → final-agg
pattern:

    phase 1: groupBy(key, salt)  — hot key split across S reducers
    phase 2: groupBy(key)        — S partial rows per key, trivially small

Both shuffles are map-side combinable; the second shuffle moves only
keys × S rows. Correct for any algebraic aggregate (sum/count/min/max);
avg is derived as sum/count after phase 2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregates that re-combine with themselves across salt partitions
_REMERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: {column: fn} with fn in sum/count/min/max/avg. The salt is
    derived from a high-cardinality column when given (deterministic),
    else from ``rand`` — prefer deterministic salts so restarts/retries
    reproduce identical partitioning (north-rule determinism).

    Output: keys... plus ``{fn}_{col}`` columns — identical to the
    unsalted ``df.groupBy(keys).agg(...)`` result.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
        if salt_col
        else (F.rand(seed=42) * salt_buckets).cast("int")
    )
    need_avg = [c for c, fn in aggs.items() if fn == "avg"]
    phase1_aggs = []
    for c, fn in aggs.items():
        if fn == "avg":
            phase1_aggs.append(F.sum(c).alias(f"__s_{c}"))
            phase1_aggs.append(F.count(c).alias(f"__c_{c}"))
        elif fn == "count":
            phase1_aggs.append(F.count(c).alias(f"count_{c}"))
        else:
            phase1_aggs.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)

    phase2_aggs = []
    for c, fn in aggs.items():
        if fn == "avg":
            phase2_aggs.append(F.sum(f"__s_{c}").alias(f"__s_{c}"))
            phase2_aggs.append(F.sum(f"__c_{c}").alias(f"__c_{c}"))
        else:
            name = f"{fn}_{c}"
            phase2_aggs.append(getattr(F, _REMERGE[fn])(name).alias(name))
    out = partial.groupBy(*keys).agg(*phase2_aggs)
    for c in need_avg:
        out = out.withColumn(f"avg_{c}", F.col(f"__s_{c}") / F.col(f"__c_{c}")).drop(
            f"__s_{c}", f"__c_{c}"
        )
    return out


def salted_repartition(
    df: DataFrame,
    key: str = "conv_id",
    salt_buckets: int = 8,
    n_partitions: int | None = None,
    salt_from: str = "turn_idx",
) -> DataFrame:
    """Spread hot keys across ``salt_buckets`` partitions for narrow
    per-row work (T7): repartition on hash(key, salt) where the salt is
    derived deterministically from ``salt_from`` (any high-cardinality
    secondary column of the frame).

    Use before expensive map-side transforms (text normalization,
    pandas UDFs) when a hot conv would otherwise pin one task; do NOT
    use before keyed stateful ops (state requires all rows of a key on
    one partition).
    """
    if salt_from not in df.columns:
        raise ValueError(
            f"salt_from column {salt_from!r} not in frame; pick any "
            f"high-cardinality secondary column of {df.columns}"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets))
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key), salt.alias("__salt"))
