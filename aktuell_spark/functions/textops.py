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

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under
#                      postponed annotation evaluation (PEP 563 strings)
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


# ----------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
# Models" §A1.1 — public spec). Per-document word n-gram repetition:
#   top2gram_frac / top3gram_frac — fraction of word characters covered
#     by the single most frequent word 2-/3-gram (count × chars, clamped
#     at 1.0 — overlapping occurrences can exceed the total),
#   dup5gram_frac — true character COVERAGE of duplicated 5-grams: the
#     union of token positions inside any 5-gram occurring ≥ twice
#     (count × chars would double-count overlaps — a looping doc
#     measured 4.0 under it),
# with the published flag thresholds (0.20 / 0.18 / 0.15).
#
# Scale shape: each document is scored INDEPENDENTLY, so the right
# 100 TB plan is a zero-shuffle narrow map — NOT explode + groupBy
# (which would shuffle the full token stream, ~2× corpus bytes, just to
# count within-row frequencies). Within-row counting needs a frequency
# map, which built-in higher-order functions can only express as an
# O(n²) per-element filter scan that also trips the §8.4 CollapseProject
# re-evaluation trap — so this is one of the few places the engine uses
# a vectorized Arrow pandas UDF (Counter per doc, O(n)), per the
# round brief's UDF escape hatch. The UDF emits exact INTEGER
# numerators/denominators; fractions and flags are derived JVM-side
# (F.round + integer compares), keeping float policy identical to the
# DuckDB oracle.
# ----------------------------------------------------------------------

# published Gopher thresholds, as (numerator multiplier, denominator
# multiplier) integer pairs so flag math is exact in both engines:
#   frac > 0.20  ⇔  chars * 5  > total
#   frac > 0.18  ⇔  chars * 50 > total * 9
#   frac > 0.15  ⇔  chars * 20 > total * 3
REP_TOP2_THRESH = (5, 1)
REP_TOP3_THRESH = (50, 9)
REP_DUP5_THRESH = (20, 3)

_REP_STRUCT = (
    "total_chars long, n_tokens long, top2_chars long, "
    "top3_chars long, dup5_chars long"
)


def _repetition_counts_udf():
    """Vectorized pandas UDF: per-doc n-gram repetition numerators.

    chars(gram) = sum of its tokens' lengths (joining spaces excluded);
    total_chars = sum of all token lengths. All outputs are exact
    integers — no float leaves Python, so engine float policy cannot
    diverge.
    """
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_REP_STRUCT)
    def rep_counts(text: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in
               ("total_chars", "n_tokens", "top2_chars", "top3_chars",
                "dup5_chars")}
        for t in text:
            if t is None:
                # engine split semantics: split(NULL) is NULL, so every
                # stat propagates null (the DuckDB oracle's
                # regexp_split_to_array(NULL) agrees)
                for k in out:
                    out[k].append(None)
                continue
            stripped = t.strip()
            # regexp_split_to_array('', '\\s+') yields [''] — one empty
            # token — and str.split() yields []; mirror the engine so
            # empty-after-trim text counts 1 token on both sides
            toks = stripped.split() if stripped else [""]
            lens = [len(x) for x in toks]
            total = sum(lens)
            n = len(toks)

            def top_gram_chars(size: int) -> int:
                if n < size:
                    return 0
                c = Counter(tuple(toks[i:i + size])
                            for i in range(n - size + 1))
                return max(cnt * sum(len(w) for w in g)
                           for g, cnt in c.items())

            def dup_coverage_chars(size: int) -> int:
                if n < size:
                    return 0
                c = Counter(tuple(toks[i:i + size])
                            for i in range(n - size + 1))
                covered: set[int] = set()
                for i in range(n - size + 1):
                    if c[tuple(toks[i:i + size])] >= 2:
                        covered.update(range(i, i + size))
                return sum(lens[j] for j in covered)

            out["total_chars"].append(total)
            out["n_tokens"].append(n)
            out["top2_chars"].append(top_gram_chars(2))
            out["top3_chars"].append(top_gram_chars(3))
            out["dup5_chars"].append(dup_coverage_chars(5))
        # nullable Int64: None entries (null-text rows) must reach Arrow
        # as nulls, not float64 NaN
        return pd.DataFrame({k: pd.array(v, dtype="Int64") for k, v in out.items()})

    return rep_counts


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition stats + flags; zero-shuffle narrow map.

    Emits ``n_tokens``, the three character-coverage fractions (rounded
    4 places, JVM ``F.round`` so HALF_UP matches the oracle), and
    ``flag_repetitive`` — true when ANY published threshold trips.
    Flags compare integers (no float boundary risk).
    """
    rep = _repetition_counts_udf()
    df = df.withColumn("_rep", rep(F.col(text_col)))
    r = F.col("_rep")
    total = r["total_chars"]

    def frac(c: Column) -> Column:
        return F.when(
            total > 0, F.least(F.round(c / total, 4), F.lit(1.0))
        ).otherwise(F.lit(0.0))

    (t2n, t2d), (t3n, t3d), (d5n, d5d) = (
        REP_TOP2_THRESH, REP_TOP3_THRESH, REP_DUP5_THRESH,
    )
    flag = (
        (r["top2_chars"] * t2n > total * t2d)
        | (r["top3_chars"] * t3n > total * t3d)
        | (r["dup5_chars"] * d5n > total * d5d)
    )
    return (
        df.withColumn("n_tokens", r["n_tokens"])
        .withColumn("top2gram_frac", frac(r["top2_chars"]))
        .withColumn("top3gram_frac", frac(r["top3_chars"]))
        .withColumn("dup5gram_frac", frac(r["dup5_chars"]))
        .withColumn("flag_repetitive", flag)
        .drop("_rep")
    )
