"""Large-star/small-star connected components (round-6 task #2).

The O(log n)-round path must (a) agree label-for-label with hash-min on
arbitrary graphs, and (b) converge on a diameter-10^4 chain that would
exhaust hash-min's round budget.
"""

from __future__ import annotations

import random

import pytest

from aktuell_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _labels(df):
    return sorted((r["vertex"], r["cluster_id"]) for r in df.collect())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_matches_hashmin_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n_vertices, n_edges = 120, 150
    pairs = [
        (rng.randrange(n_vertices), rng.randrange(n_vertices))
        for _ in range(n_edges)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long").repartition(5)
    a = _labels(connected_components(df, algorithm="hashmin"))
    b = _labels(connected_components(df, algorithm="star"))
    assert a == b and len(a) > 0


def test_star_closes_deep_chain_where_hashmin_exhausts(spark):
    """A 10^4-diameter chain: hash-min needs ~10^4 rounds (raises on a
    20-round budget); star closes in O(log n) rounds and labels every
    vertex with the chain head."""
    n = 10_000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    ).repartition(8)

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=20, algorithm="hashmin")

    out = connected_components(chain, max_rounds=30, algorithm="star")
    rows = out.collect()
    assert len(rows) == n + 1
    assert {r["cluster_id"] for r in rows} == {0}


def test_star_star_forest_and_multiple_components(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = _labels(connected_components(df, algorithm="star"))
    assert got == [
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    ]


def test_dedup_clusters_algorithm_parameter(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 101)], "doc_a long, doc_b long"
    )
    a = sorted(map(tuple, dedup_clusters(pairs).collect()))
    b = sorted(map(tuple, dedup_clusters(pairs, algorithm="star").collect()))
    assert a == b
    assert (5, 5, 3) in a and (100, 100, 2) in a


def test_star_rejects_unknown_algorithm(spark):
    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(df, algorithm="bfs")


def test_auto_falls_back_to_star_on_deep_graphs(spark):
    """algorithm="auto": shallow graphs take the cheap hash-min path;
    a deep chain exhausts the shallow budget and silently switches to
    the star rounds instead of raising."""
    shallow = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    assert _labels(connected_components(shallow, algorithm="auto")) == [
        (1, 1), (2, 1), (3, 1), (7, 7), (9, 7),
    ]
    n = 64  # diameter 64 > the auto path's 8-round hash-min budget
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    out = connected_components(chain, algorithm="auto", max_rounds=30)
    rows = out.collect()
    assert len(rows) == n + 1
    assert {r["cluster_id"] for r in rows} == {0}


def test_self_loop_vertices_identical_on_both_paths(spark):
    """A vertex appearing ONLY in self-loop pairs is a singleton
    component on BOTH paths (so algorithm='auto' output never depends
    on which path happened to run)."""
    pairs = spark.createDataFrame(
        [(1, 2), (7, 7), (3, 3), (3, 4)], "doc_a long, doc_b long"
    )
    want = {(1, 1), (2, 1), (7, 7), (3, 3), (4, 3)}
    for algo in ("hashmin", "star", "auto"):
        got = {
            (r["vertex"], r["cluster_id"])
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == want, algo
