"""TF-IDF top terms per document — the keyword/salience primitive for
corpus exploration and quality slicing (what is this doc about; which
docs are dominated by boilerplate terms).

Weighting: the log-free rational variant score = tf · N / df. The
classic ln((N+1)/(df+1)) ranks IDENTICALLY (ln is monotone in N/df) but
transcendental-function bit-parity across engines' libm is not
guaranteed, and this engine's correctness gate is a typed value hash —
so the score stays in exact integer arithmetic until one final double
division (same IEEE op in both engines), rounded to 4.

Scale shape: explode → tf groupBy(doc, term) → df groupBy(term) → one
equi-join on term → per-doc top-k window. All aggregations map-side
combinable; the df (document-frequency) join is a standard shuffle
equi-join on the term — vocabulary is ~√corpus, never broadcast-sized
at 100 TB, and AQE handles the skewed head terms (stopwords) which the
max_df guard can additionally drop entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Top-``k`` terms per doc by tf·N/df. Output: (doc_id, term, tf,
    term_df, score, rank); ties broken by term ascending. ``max_df``
    drops terms appearing in more than that many docs (stopword guard —
    the head of the df distribution is boilerplate, and dropping it also
    removes the skewed join keys)."""
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("term_df") <= max_df)
    n_docs = df.select(F.count(F.lit(1))).collect()[0][0]  # 1-row agg
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.round(F.col("tf") * F.lit(int(n_docs)) / F.col("term_df"), 4)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "term_df", "score", "rank")
    )
