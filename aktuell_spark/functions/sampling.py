"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only per partitioning — a repartition or
a different file split changes which rows survive, which breaks
resumable pipelines and cross-engine audits. These samplers hash the
ROW KEY instead: membership is a pure function of the key, so the
sample is identical across cluster sizes, retries, and engines (the
DuckDB oracle reproduces it exactly — md5 is md5 everywhere).

Scale: narrow map + filter, no shuffle; the hash prefix comparison is
a constant-length string compare inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """First 4 hex chars of md5(salt || key) — 65536 stable buckets.
    String md5 (not xxhash64) on purpose: every engine reproduces it,
    so oracle SQL and resumed runs select the same rows."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 4)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash (stable everywhere).

    The threshold is the rate mapped onto the 16-bit hex prefix space;
    realized rate converges to ``rate`` at corpus scale (hash
    uniformity), exactly reproducible by any engine with md5.
    """
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return df
    threshold = format(int(rate * 0x10000), "04x")
    return df.filter(hash_bucket(key, salt) < F.lit(threshold))


def stratified_counts(
    df: DataFrame, key: str, stratum: str, rate: float, salt: str = ""
) -> DataFrame:
    """Per-stratum audit of a deterministic sample: total rows, sampled
    rows, realized rate. One hash-groupBy — the audit a pipeline runs
    before committing to a sampling threshold."""
    # "g" sorts above every hex digit -> rate 1.0 keeps all rows
    threshold = "g" if rate >= 1.0 else format(int(rate * 0x10000), "04x")
    sampled = (hash_bucket(key, salt) < F.lit(threshold)).cast("long")
    return df.groupBy(stratum).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled).alias("n_sampled"),
        F.round(F.sum(sampled) / F.count(F.lit(1)), 4).alias("realized_rate"),
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the balanced-sampling pass a
    training mix needs (e.g. downsample the dominant language, keep all
    of a rare one). Each stratum gets its own hash threshold; membership
    is still a pure function of (salt, key), so the same rows survive on
    any cluster size, retry, or engine.

    Zero shuffle: the per-stratum threshold is a small CASE chain on the
    stratum column (strata are enumerable — languages, sources), the
    membership test one md5-prefix compare, all inside codegen.
    """
    def thr(rate: float) -> str:
        if not (0.0 <= rate <= 1.0):
            raise ValueError(f"rate must be in [0,1], got {rate}")
        # "g" sorts above every hex digit -> rate 1.0 keeps all rows
        return "g" if rate >= 1.0 else format(int(rate * 0x10000), "04x")

    threshold: Column = F.lit(thr(default_rate))
    for s, r in sorted(rates.items()):
        threshold = F.when(F.col(stratum) == s, F.lit(thr(r))).otherwise(
            threshold
        )
    return df.filter(hash_bucket(key, salt) < threshold)
