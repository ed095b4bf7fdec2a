"""Property-based invariants for the round-4 widening operators.

Each property is a contract a 100 TB deployment leans on: packing
conserves tokens and respects budgets regardless of input shape;
deterministic sampling is a pure function of the key (partitioning
cannot change membership); int8 quantization bounds the cosine error;
connected components are invariant under edge order and direction.

hypothesis drives the generators; Spark work is kept small per example
(deadline disabled — JVM latency, not algorithmic cost).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcdef", min_size=1, max_size=4)
texts = st.lists(words, min_size=0, max_size=30).map(" ".join)


@given(docs=st.lists(texts, min_size=1, max_size=12), target=st.integers(1, 40))
@settings(**SETTINGS)
def test_packing_conserves_tokens_and_orders(spark, docs, target):
    from aktuell_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = pack_sequences(df, target_tokens=target, n_shards=2).collect()
    rows = sorted(got, key=lambda r: (r["shard"], r["doc_id"]))
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        offset = 0
        for r in shard_rows:
            # offsets are exactly the running token total, in id order
            assert r["start_offset"] == offset
            assert r["pack_id"] == offset // target
            offset += r["n_tokens"]
    # token conservation across the whole corpus. Spec is the engine
    # convention (Spark split == DuckDB regexp_split_to_array): an
    # empty/whitespace-only doc yields [''] — ONE empty token — where
    # Python's ''.split() would yield zero; re.split reproduces it.
    import re

    assert sum(r["n_tokens"] for r in rows) == sum(
        len(re.split(r"\s+", t.strip())) for t in docs
    )


@given(
    rates=st.dictionaries(
        st.sampled_from(["en", "de", "zh"]),
        st.floats(0.0, 1.0, allow_nan=False),
        max_size=3,
    ),
    nparts=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_stratified_sample_partitioning_invariant(spark, rates, nparts):
    from aktuell_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "de", "zh"][i % 3]) for i in range(60)],
        "doc_id long, lang string",
    )
    a = {r["doc_id"] for r in
         stratified_sample(df, "doc_id", "lang", rates, 0.4).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(df.repartition(nparts), "doc_id", "lang",
                           rates, 0.4).collect()}
    assert a == b


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
        min_size=4, max_size=8,
    )
)
@settings(**SETTINGS)
def test_quantization_cosine_error_bound(spark, vec):
    """cos(q(v), q(w)) stays within the scalar-quantization error bound
    of cos(v, w) for a fixed companion vector."""
    import math

    from aktuell_spark.functions.similarity import quantize_int8

    w = [1.0] * len(vec)
    df = spark.createDataFrame(
        [(0, vec), (1, w)], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["qvec"] for r in quantize_int8(df).collect()}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    exact = cos(vec, w)
    approx = cos(got[0], got[1])
    # 1/127 per-component relative error -> loose cosine bound
    assert abs(exact - approx) <= 0.08


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=12,
    ),
    seed=st.integers(0, 3),
)
@settings(**SETTINGS)
def test_components_invariant_under_edge_order_and_flip(spark, edges, seed):
    from aktuell_spark.operators.components import connected_components

    import random

    base = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    rnd = random.Random(seed)
    flipped = [(b, a) if rnd.random() < 0.5 else (a, b) for a, b in edges]
    rnd.shuffle(flipped)
    other = spark.createDataFrame(flipped, "doc_a long, doc_b long")
    got1 = {r["vertex"]: r["cluster_id"]
            for r in connected_components(base).collect()}
    got2 = {r["vertex"]: r["cluster_id"]
            for r in connected_components(other).collect()}
    assert got1 == got2
    # every cluster id is the min of its members
    members: dict[int, list[int]] = {}
    for v, c in got1.items():
        members.setdefault(c, []).append(v)
    for c, vs in members.items():
        assert c == min(vs)


@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500)),
                   min_size=1, max_size=8),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500)),
                    min_size=1, max_size=8),
    lower=st.integers(-120, 120),
    width=st.integers(1, 180),
)
@settings(**SETTINGS)
def test_interval_join_equals_naive_theta_join(spark, lefts, rights, lower, width):
    """The bucketed equi-join must emit EXACTLY the pairs the naive
    O(N^2) definition emits, for any window placement (positive,
    negative, straddling zero) — the bucket math is the risky part."""
    import datetime as dt

    from aktuell_spark.operators.interval import interval_join

    upper = lower + width
    t0 = dt.datetime(2025, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, t0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, t0 + dt.timedelta(seconds=s))
         for i, (k, s) in enumerate(rights)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {(r["l_event_id"], r["r_event_id"])
           for r in interval_join(ldf, rdf, lower, upper).collect()}
    want = {
        (i, 100 + j)
        for i, (lk, ls) in enumerate(lefts)
        for j, (rk, rs) in enumerate(rights)
        if lk == rk and lower <= rs - ls <= upper
    }
    assert got == want
