"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact cosine top-k — broadcast the (small) query
  set against the corpus; dot products run JVM-side via
  ``F.zip_with``/``F.aggregate`` (no Python). This is the correctness
  baseline; cost O(|Q|·N) with the corpus scanned once.
- ``knn_lsh``: the scale path — random-hyperplane LSH restricted to
  axis-aligned planes (sign bits of the first ``n_planes`` dimensions),
  so buckets are reproducible in plain SQL. Candidates come from an
  equi-join on bucket key; cosine is computed only within buckets.
  At 100 TB the corpus is bucketed/partitioned by the key so a query
  touches one partition (IVF-style cell routing).

Cosine on the candidate-scoring hot path runs as a vectorized Arrow
pandas UDF (``cosine6``: one matrix pass per batch, float64) and is
rounded to 6 decimals before any ranking — summation-order differences
between engines live far below that quantum, so results stay
reproducible against the DuckDB oracle. The Catalyst higher-order
variant (``cosine``) is kept for pure-SQL-expressible contexts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


@F.pandas_udf(T.DoubleType())
def cosine6(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized pair cosine, rounded to 6 decimals — the hot path of
    every ANN candidate-scoring join.

    One Arrow batch = one ``einsum`` matrix pass in float64 (no per-row
    Python, no interpreted Catalyst fold: the higher-order ``aggregate``
    variant above does not participate in whole-stage codegen and
    measured ~4-5x slower on the pair joins). Rounding to 6 happens
    inside the UDF so engines disagreeing below 1e-6 (summation order)
    still emit identical sims — same quantization the DuckDB oracle
    applies."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(np.round(dots / np.maximum(den, 1e-300), 6))


def knn_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Output: (query_id, neighbor_id, rank, sim) — sim rounded to 6,
    ranked by (sim desc, neighbor_id asc) for determinism.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine6(F.col("qvec"), F.col("cvec")))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


DEFAULT_TARGET_BUCKET = 64
DEFAULT_MAX_BUCKET = 256


def adaptive_n_planes(
    n_vectors: int,
    target_bucket_size: int = DEFAULT_TARGET_BUCKET,
    min_planes: int = 8,
    max_planes: int = 24,
) -> int:
    """Plane count that keeps expected bucket size ~target.

    The in-bucket self-join costs Σ|bucket|² ≈ N²/2^planes; holding
    |bucket| ≈ target makes that Σ ≈ N·target — LINEAR in corpus size.
    8 planes is right up to ~16k vectors; 10^9 vectors want ~24 (the
    round-1 fixed 8 was quadratic at scale — this is the fix).
    """
    import math

    if n_vectors <= 0:
        return min_planes
    need = math.ceil(math.log2(max(n_vectors / target_bucket_size, 1)))
    return max(min_planes, min(max_planes, need))


def sign_bucket(vec_col, n_planes: int = 8):
    """LSH bucket key: sign bits of the first n_planes dimensions,
    packed little-endian into an int. Axis-aligned hyperplanes — fully
    reproducible in SQL (DuckDB oracle) and an effective partitioner
    for roughly-isotropic embeddings."""
    bucket = F.lit(0)
    for j in range(n_planes):
        bit = F.when(F.element_at(vec_col, j + 1) >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def _bucketed(emb: DataFrame, id_col: str, vec_col: str, n_planes: int) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )


def _capped_candidates(b: DataFrame, max_bucket_size: int) -> DataFrame:
    """Neighbor-side per-bucket cap: only the first ``max_bucket_size``
    vectors of a bucket (deterministic: lowest ids) serve as candidates.

    This bounds a skewed bucket's join fan-out to |bucket|·cap instead
    of |bucket|² — the skew backstop on top of adaptive plane count.
    The rank window shuffles once on bucket (the same partitioning the
    candidate join needs anyway).
    """
    w = Window.partitionBy("bucket").orderBy(F.col("id").asc())
    return (
        b.withColumn("_rib", F.row_number().over(w))
        .filter(F.col("_rib") <= max_bucket_size)
        .drop("_rib")
    )


def knn_lsh(
    emb: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """All-pairs ANN: top-k cosine neighbors per vector *within its LSH
    bucket* (IVF-cell approximation of the kNN graph).

    Output: (query_id, neighbor_id, rank, sim). Recall < 1 by design.
    ``n_planes=None`` adapts to the corpus size (one count action) so
    the in-bucket join stays ~N·target_bucket instead of N²/2^planes;
    ``max_bucket_size`` caps a skewed bucket's candidate side on top.
    """
    if n_planes is None:
        n_planes = adaptive_n_planes(emb.count())
    b = _bucketed(emb, id_col, vec_col, n_planes)
    return knn_from_cells(b, k, max_bucket_size)


def knn_from_cells(
    b: DataFrame, k: int, max_bucket_size: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """The in-cell top-k join over an ALREADY-bucketed vector set
    (columns: id, vec, bucket) — shared by knn_lsh (cells computed on
    the fly) and the stream-maintained ANN index (cells read back from
    the materialized index table, streaming/ann_index.py)."""
    c = _capped_candidates(b, max_bucket_size)
    scored = (
        b.alias("a")
        .join(
            c.alias("c"),
            (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") != F.col("c.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            cosine6(F.col("a.vec"), F.col("c.vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def knn_lsh_multiprobe(
    emb: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    n_probes: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Multi-probe ANN: each query also probes the ``n_probes``
    Hamming-1 neighbor cells of its own bucket (bit j flipped, j < n_probes).

    The standard recall/cost knob for high plane counts: raising planes
    shrinks buckets (cheap joins) but splits true neighbors across cell
    walls; probing adjacent cells recovers them at cost ×(1+n_probes) on
    the QUERY side only — the candidate side is still bucketed once and
    capped. n_probes=0 degenerates to ``knn_lsh``.
    Output: (query_id, neighbor_id, rank, sim).
    """
    if n_planes is None:
        n_planes = adaptive_n_planes(emb.count())
    n_probes = min(n_probes, n_planes)
    b = _bucketed(emb, id_col, vec_col, n_planes)
    c = _capped_candidates(b, max_bucket_size)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_probes)],
    )
    q = b.select("id", "vec", F.explode(probes).alias("bucket"))
    scored = (
        q.alias("a")
        .join(
            c.alias("c"),
            (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") != F.col("c.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            cosine6(F.col("a.vec"), F.col("c.vec")).alias("sim"),
        )
        # a neighbor can be reached via several probes — dedupe before
        # rank; the pair's sim is probe-independent and min() is
        # order-insensitive (first() was safe only by that accident)
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_assign(emb: DataFrame, centroids, vec_col: str = "embedding", nprobe: int = 1):
    """Assign each vector to its ``nprobe`` nearest centroid cells.

    ``centroids``: list of (cell_id, vector) — a small model artifact
    that travels inside the UDF closure (Spark broadcasts the serialized
    function once per executor), so assignment is a NARROW map: no
    shuffle, no join, and plan size independent of centroid count
    (thousands of cells are fine — nothing is inlined as literals).

    Scoring is one Arrow-batched matrix product per partition chunk
    (batch×dims @ dims×k), not a per-row loop: vectors and centroids are
    L2-normalized in float64 so cosine = dot. Sims round to 6 decimals
    before ranking (ties then break by cell_id asc) — the same
    quantization the DuckDB oracle applies, making cell choice
    reproducible across engines. Returns the frame with an exploded
    ``cell`` column (nprobe rows per vector, probe_rank 1 = nearest), so
    callers can derive the candidate index from the SAME assignment.
    """
    cents = sorted(centroids, key=lambda c: c[0])  # cid asc = stable tie order
    cid_arr = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.array([c[1] for c in cents], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    CnT = np.ascontiguousarray(Cn.T)
    n_take = min(nprobe, len(cents))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.stack([]) raises; empty Arrow batches happen
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        sims = np.round(Vn @ CnT, 6)
        # centroids are pre-sorted by cid, so a STABLE descending-sim
        # argsort yields exactly (sim desc, cid asc) — the oracle's order
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n_take]
        return pd.Series(list(cid_arr[idx].astype(np.int32)))

    return emb.select(
        "*", F.posexplode(nearest_cells(F.col(vec_col))).alias("_pos", "cell")
    ).withColumn("probe_rank", (F.col("_pos") + 1).cast("int")).drop("_pos")


def knn_ivf(
    emb: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """IVF-style ANN: top-k cosine neighbors searched within each
    query's ``nprobe`` nearest centroid cells (the inverted-file
    counterpart to the sign-plane LSH path; real deployments train
    centroids with k-means — any deterministic centroid set works here).

    The candidate side indexes each vector in its SINGLE nearest cell
    (capped per cell); the query side probes ``nprobe`` cells. Same
    scale shape as knn_lsh: narrow assignment, one equi-join on cell,
    work ~ N x nprobe x cell_size.
    Output: (query_id, neighbor_id, rank, sim).
    """
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # One assignment definition serves both sides: probe_rank==1 rows are
    # the candidate index (each vector in its single nearest cell), all
    # rows are the query probes. The vectorized assignment is a cheap
    # narrow map, so the two sides simply recompute it — no persist, no
    # executor storage pinned across calls (a long-lived session runs
    # many of these).
    assigned = ivf_assign(base, centroids, "vec", nprobe=nprobe).withColumnRenamed(
        "cell", "bucket"
    )
    indexed = assigned.filter(F.col("probe_rank") == 1).drop("probe_rank")
    c = _capped_candidates(indexed, max_cell_size)
    q = assigned.drop("probe_rank")
    scored = (
        q.alias("a")
        .join(
            c.alias("c"),
            (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") != F.col("c.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            cosine6(F.col("a.vec"), F.col("c.vec")).alias("sim"),
        )
        # a pair reachable via several probes has ONE sim (cosine is a
        # function of the pair); min() is order-insensitive, making the
        # determinism explicit where first() only happened to be safe
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def train_ivf_centroids(
    emb: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
    quantize: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means trainer for IVF cells.

    DataFrame-native Lloyd iterations: each pass is one narrow
    vectorized assignment (``ivf_assign``, nprobe=1) followed by a
    per-cell, per-dimension ``avg`` hash aggregate (k cells × d columns,
    map-side combinable) — the driver only ever holds the k×d centroid
    matrix, never data rows. Means are re-normalized to the unit sphere
    (assignment metric is cosine). Empty cells keep their previous
    centroid. Init is k seed vectors spread deterministically by
    ``xxhash64(id)`` (seeded sampling without a global sort).

    Returns ``[(cell_id, vector)]`` — the broadcast model artifact
    ``knn_ivf`` consumes. Production analogue: k-means|| init + more
    iterations; the loop shape (narrow assign + one agg per pass) is
    already the 100 TB-safe one.

    ``init``: ``"hash"`` (default) spreads seeds by ``xxhash64(id)``;
    ``"first"`` takes the first k rows by id — the cross-engine-
    reproducible init the DuckDB oracle mirrors (xxhash64 has no DuckDB
    equivalent). ``quantize``: round each centroid component to that
    many decimals after normalization, so an engine whose float-sum
    order differs (partial aggregation vs sequential) lands on the
    identical centroid — the same 6-decimal quantization ``ivf_assign``
    applies to sims.
    """
    import math

    if init == "first":
        order = (F.col(id_col),)
    elif init == "hash":
        order = (F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003)), F.col(id_col))
    else:
        raise ValueError(f"unknown init {init!r}")
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(*order)
        .limit(k)
        .collect()  # bounded: k rows — the model, not the data
    )
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]
    d = len(cents[0][1])
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    for _ in range(n_iter):
        assigned = ivf_assign(base, cents, "vec", nprobe=1)
        # per-cell per-dimension mean via posexplode + one hash agg over
        # (cell, dim) — k*d tiny rows through the shuffle; measured
        # faster than k*d separate avg() expressions (64-wide codegen)
        means = (
            assigned.select("cell", F.posexplode("vec").alias("_i", "_x"))
            .groupBy("cell", "_i")
            .agg(F.avg("_x").alias("_m"))
            .collect()  # bounded: k*d rows — the model, not the data
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], [0.0] * d)[r["_i"]] = float(r["_m"])
        new = dict(cents)
        for cell, vec in by_cell.items():
            norm = math.sqrt(sum(x * x for x in vec)) or 1.0
            if quantize is None:
                new[cell] = [x / norm for x in vec]
            else:
                new[cell] = [round(x / norm, quantize) for x in vec]
        cents = sorted(new.items())
    return cents


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family): candidate
    pairs from sign-bucket LSH cells, kept when cosine >= threshold.

    Same scale guards as ``knn_lsh``: adaptive plane count + capped
    candidate side. Output: (vec_a, vec_b, sim) with vec_a < vec_b.
    """
    if n_planes is None:
        n_planes = adaptive_n_planes(emb.count())
    b = _bucketed(emb, id_col, vec_col, n_planes)
    c = _capped_candidates(b, max_bucket_size)
    return (
        b.alias("a")
        .join(
            c.alias("c"),
            (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.id") < F.col("c.id")),
        )
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("c.id").alias("vec_b"),
            cosine6(F.col("a.vec"), F.col("c.vec")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


# ----------------------------------------------------------------------
# int8 scalar quantization (the SQ8 compression every vector store uses
# at scale: 4× smaller vectors, integer dot products). Per-vector
# symmetric quantization — scale = 127/max|x|, q = floor(x·scale + 0.5)
# — keeps COSINE exact up to quantization error because the per-vector
# scale cancels in dot/(|a||b|). All arithmetic is double-precision IEEE
# then integer, so the DuckDB oracle reproduces every quantized value
# bit-for-bit (no engine rounding-mode divergence: floor(x+0.5) instead
# of round()'s HALF_UP-vs-banker's ambiguity).
# ----------------------------------------------------------------------

def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Add ``out_col``: the int8-range quantized vector (as array<long>)
    and ``qnorm``: its exact integer squared norm.

    Plan care (§8.4): the scale factor is paired with the elements via
    ``zip_with(v, array_repeat(scale, size(v)))`` so the max-abs chain
    is evaluated once per ROW; putting ``scale`` inside a ``transform``
    lambda would re-inline the array_max chain per ELEMENT after
    project collapse. Zero shuffle, zero Python.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = emb.withColumn("_v", v).withColumn(
        "_amax", F.array_max(F.transform(F.col("_v"), F.abs))
    )
    scale = F.when(F.col("_amax") > 0, F.lit(127.0) / F.col("_amax")).otherwise(
        F.lit(0.0)
    )
    q = F.zip_with(
        F.col("_v"),
        F.array_repeat(scale, F.size(F.col("_v"))),
        lambda x, s: F.floor(x * s + F.lit(0.5)),
    )
    df = df.withColumn(out_col, q).withColumn(
        "qnorm",
        F.aggregate(
            F.col(out_col),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ),
    )
    return df.drop("_v", "_amax")


def knn_quantized(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors computed entirely on int8-quantized
    vectors (integer dot products; exact up to quantization error).

    Same output contract as :func:`knn_bruteforce`. The scan reads 4×
    fewer vector bytes at scale, and the dot product is an integer fold
    inside codegen — this is the compression leg of the ANN family
    (bucketing legs: LSH/IVF). Broadcast query side; ties broken
    (sim desc, neighbor_id asc).
    """
    qz = quantize_int8(emb, vec_col)
    q = qz.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_q"),
        F.col("qnorm").alias("qn_q"),
    )
    c = qz.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("q_c"),
        F.col("qnorm").alias("qn_c"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_q"), F.col("q_c"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.when(
                (F.col("qn_q") > 0) & (F.col("qn_c") > 0),
                F.round(
                    dot / (F.sqrt(F.col("qn_q")) * F.sqrt(F.col("qn_c"))), 6
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
