"""Text analysis for a training-data pipeline: token stats, quality
scoring, language ID, fingerprinting.

All column expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python in the hot path. These are the
batch/stream text transforms the north rule routes through vectorized
Arrow; everything here stays inside codegen, which is strictly faster.

Scale: every operator is a narrow map over the documents table — no
shuffle at all. At 100 TB they run at parquet-scan speed with full
column pruning (only ``text`` + id are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed stopword list (shared with SQL oracles — keep sorted, tiny)
STOPWORDS = ("a", "and", "of", "the", "to")

# fixed per-language marker tokens for the n-gram/marker heuristic.
# Deterministic rule, not a learned model: score(lang) = #tokens in the
# marker set; predict argmax, ties broken by lang name ascending.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow", "value", "row"),
    "es": ("query", "filter", "line", "scan", "column"),
    "de": ("table", "window", "key", "batch", "order"),
    "fr": ("data", "hash", "spark", "part", "join"),
    "zh": ("merge", "small", "agg", "vector", "big"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (BPE-ish splitting is a regex swap)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


# BPE-ish pre-tokenization: letter runs, digit runs, and single
# non-alphanumeric marks — the classic GPT-2-style word/number/punct
# split that BPE merges then operate on. Plain enough to be identical
# under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokens (letters/digits/punct split), JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)


def with_bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting on the BPE-ish split (vs whitespace in
    ``with_token_stats``): n_bpe_tokens, n_distinct_bpe, punct_ratio.
    Narrow map, no shuffle — parquet-scan speed at any size."""
    t = bpe_ish_tokens(text_col)
    punct = F.size(F.filter(t, lambda x: x.rlike(r"^[^A-Za-z0-9]$")))
    return (
        df.withColumn("n_bpe_tokens", F.size(t))
        .withColumn("n_distinct_bpe", F.size(F.array_distinct(t)))
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(F.size(t), F.lit(1)), 4),
        )
    )


def normalize_text(text: Column | str) -> Column:
    """lower + trim + collapse whitespace — the canonical form used by
    exact dedup and fingerprinting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct_tokens, avg_token_len (rounded)."""
    t = tokens(text_col)
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(t)))
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")))
                / F.size(t),
                4,
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: stopword ratio, distinct-token
    ratio, and a combined score. Mirrors the length/punct/stopword
    scoring used by web-scale corpus filters (C4/Gopher-style rules),
    expressed as pure column arithmetic."""
    t = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    out = (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("stopword_ratio", F.round(n_stop / F.size(t), 4))
        .withColumn(
            "distinct_ratio", F.round(F.size(F.array_distinct(t)) / F.size(t), 4)
        )
    )
    return out.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.col("distinct_ratio") * 0.4
            + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.2,
            4,
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID (deterministic heuristic).

    pred_lang = argmax over LANG_MARKERS of marker-token hits; ties go
    to the alphabetically-first language. Emits pred_lang + lang_score.
    """
    t = tokens(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    # array_max on (score, lang) struct: max score; lang DESC on ties —
    # so to break ties by lang ASC we compare on (score, reversed name)
    best = F.reduce(
        F.array(*scores),
        F.struct(F.lit(-1).alias("s"), F.lit("").alias("l")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]), x
        ).otherwise(acc),
    )
    return df.withColumn("pred_lang", best["l"]).withColumn("lang_score", best["s"])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (64-bit prefix
    as hex). Stable content identity for exact dedup across shards."""
    return df.withColumn(
        "fingerprint", F.substring(F.md5(normalize_text(text_col)), 1, 16)
    )


# PII scrubbing (training-data hygiene). Patterns are deliberately
# lookaround-free so Java regex (Spark) and RE2 (DuckDB oracle) agree.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(text: Column | str) -> Column:
    """Replace emails / international-format phones / IPv4 literals with
    typed placeholders. Order matters: emails first (a phone pattern
    could otherwise eat digit runs inside mailbox names). All JVM-side
    regexp_replace — no Python, full codegen."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return c


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``text`` scrubbed + a flag column marking rows that changed.

    The three-regexp chain is projected ONCE and ``had_pii`` compares
    the materialized attribute. Referencing the ``scrub_pii`` expression
    object from both columns would put two copies of the chain in the
    plan (and CollapseProject only re-inlines CHEAP expressions, so the
    attribute reference stays a single evaluation — plan-asserted in
    tests/test_plans.py). At corpus scale the regex chain IS the scan
    cost; halving it matters.
    """
    return df.withColumn("text_scrubbed", scrub_pii(text_col)).withColumn(
        "had_pii", F.col(text_col) != F.col("text_scrubbed")
    )
