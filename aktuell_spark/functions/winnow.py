"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS).

The rolling-fingerprint counterpart to the md5 whole-document
fingerprint (textops.with_fingerprint): hash every k-gram of the
normalized text, then keep the minimum hash of each sliding window of
``w`` consecutive k-gram hashes. Any sufficiently long shared substring
between two documents forces shared fingerprints, so overlap detection
is a join on fingerprint values — no pairwise comparison. The guarantee
winnowing adds over "every k-th hash" sampling is positional
robustness: insertions/deletions outside a window never shift which
hashes the window selects.

Engine-portability: the k-gram hash is the first 8 hex chars of md5
(both Spark and DuckDB compute identical md5), and window minima
compare the fixed-width hex LEXICOGRAPHICALLY — no engine-specific
64-bit hash (xxhash64 has no DuckDB equivalent), so the oracle
reproduces fingerprints bit-for-bit.

Scale shape: pure narrow column expressions (normalize → k-gram hash
array → window minima → distinct), zero shuffles until the caller
groups/joins on fingerprints. The k-gram hash array is O(len(text))
per row and stays inside the task. Plan care (SURVEY §8.4, measured
here as a >100× hang): indexing an array expression from inside a
``transform`` lambda (``i -> f(arr, i)``) re-evaluates the whole
producing chain per ELEMENT after project collapse — withColumn
attributes do not protect. Both the k-gram build and the window
minima therefore use the shingles idiom: a constant number of shifted
``slice``s folded with ``zip_with`` (k-grams: char-array slices folded
with ``concat``; window minima: hash-array slices folded with
``least``), so every upstream expression is referenced a constant
number of times per ROW, never per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aktuell_spark.functions.textops import normalize_text

WINNOW_K = 8  # k-gram length in characters
WINNOW_W = 4  # window: consecutive k-gram hashes per minimum


def _kgram_hashes(t: Column, k: int) -> Column:
    """Array of 8-hex-char md5 prefixes over every k-gram of ``t``.

    k-grams come from k shifted slices of the char array folded with
    ``zip_with``/``concat`` — constant references per row (the
    ``transform(sequence, i -> substr(t, i, k))`` form re-evaluates
    ``t``'s producing chain per element after project collapse)."""
    cs = F.split(t, "")
    m = F.greatest(F.length(t) - k + 1, F.lit(0))
    grams = F.slice(cs, 1, m)
    for j in range(1, k):
        grams = F.zip_with(grams, F.slice(cs, 1 + j, m), lambda x, y: F.concat(x, y))
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, 8))


def with_winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Add ``fingerprints``: sorted distinct window-min k-gram hashes.

    Documents shorter than ``k`` normalized chars are dropped (they
    have no k-gram; the caller can union them back as exact-dup-only).
    Texts with fewer than ``w`` k-grams contribute their single global
    minimum — every document with at least one k-gram has at least one
    fingerprint.
    """
    t = normalize_text(text_col)
    hs = (
        df.withColumn("_t", t)
        .filter(F.length("_t") >= k)
        .withColumn("_hs", _kgram_hashes(F.col("_t"), k))
    )
    # window minima: w shifted slices folded with least() — constant
    # references of _hs per row (never a per-element lambda index)
    n_win = F.greatest(F.size("_hs") - (w - 1), F.lit(0))
    mins_col = F.slice("_hs", 1, n_win)
    for j in range(1, w):
        mins_col = F.zip_with(
            mins_col, F.slice("_hs", 1 + j, n_win), lambda x, y: F.least(x, y)
        )
    mins = hs.withColumn(
        "_mins",
        F.when(F.size("_hs") < w, F.array(F.array_min("_hs"))).otherwise(mins_col),
    )
    return mins.withColumn(
        "fingerprints", F.array_sort(F.array_distinct("_mins"))
    ).drop("_t", "_hs", "_mins")


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_df: int | None = 200,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints.

    Inverted-index join (explode fingerprints → self-join on the
    fingerprint → count shared per pair), the same bucketed-never-
    all-pairs shape as the MinHash-LSH and shingle-Jaccard operators.
    ``max_df`` drops stop-fingerprints (shared by more than that many
    docs) before the join — the posting-list guard that bounds the
    quadratic blowup of a boilerplate k-gram at corpus scale.
    """
    # materialize the per-doc fingerprint arrays ONCE, BEFORE exploding:
    # (1) Generate re-evaluates its child projection per OUTPUT row, so
    # exploding straight off the md5 k-gram chain runs the chain ~|fps|
    # times per doc (measured 10× on this stage alone at sf0.1), and
    # (2) the posting list feeds the stop-fp groupBy and BOTH sides of
    # the self-join, each of which would re-run the chain again (whole
    # query measured 165 s → 12 s with this one barrier). The compact
    # (id, fingerprints[]) rows are ~2× text bytes; on a cluster,
    # persist to executor storage / durable checkpoint instead.
    wf = (
        with_winnow_fingerprints(df, text_col, k, w)
        .select(F.col(id_col).alias("id"), "fingerprints")
        .localCheckpoint()
    )
    fp = wf.select("id", F.explode("fingerprints").alias("fp"))
    if max_df is not None:
        keep = fp.groupBy("fp").count().filter(F.col("count") <= max_df)
        fp = fp.join(F.broadcast(keep.select("fp")), "fp")
    return (
        fp.alias("a")
        .join(fp.alias("b"), (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
