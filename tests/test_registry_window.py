"""Registry ↔ driver-window bookkeeping (VERDICT r4 #1/#3).

The driver's correctness gate grades exactly the FIRST 50 insertion-order
entries of ``__spark_entry__.queries()``. These tests pin the contract so
a future query addition cannot silently push entries out of the graded
window again: the registry must fit the window EXACTLY, the round-4
queries the r4 window missed must sit at the head, and every graded
entry needs either an oracle or a documented rows-only reason.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry
from aktuell_spark.queries import DRIVER_WINDOW, EXTRA_QUERIES, QUERIES

# the only registered queries with no DuckDB-expressible oracle, by
# design (stateful streaming / engine-generated fixtures): additions
# here need a justification in SURVEY §11
ROWS_ONLY = {
    "turn_tool_join_native",
    "stream_cdc_materialize",
    "stream_cdc_mor",
    "stream_cdc_mor_partial",
    "stateful_turn_tool_join",
    "multimodal_features",
}


def test_registry_fits_driver_window_exactly():
    q = entry.queries()
    assert len(q) == DRIVER_WINDOW, (
        f"{len(q)} registered queries vs driver window {DRIVER_WINDOW}: "
        "every entry past the window gets NO correctness row — merge or "
        "rotate into EXTRA_QUERIES instead of appending"
    )


def test_previously_ungraded_queries_lead():
    """The 22 queries the r4 driver window missed come first."""
    names = list(entry.queries())
    must_lead = {
        "deterministic_sample", "cep_funnel", "scd2_history",
        "winnow_fingerprints", "winnow_pairs", "gopher_repetition",
        "decontaminate", "ann_quantized", "dedup_clusters",
        "stratified_sample", "pack_sequences", "tfidf_top_terms",
        "dedup_corpus", "interval_join", "turn_tool_join_native",
        "funnel_rate", "top_paths", "cohort_retention", "curate_corpus",
        "stream_cdc_materialize", "stream_cdc_mor", "stream_cdc_mor_partial",
    }
    assert set(names[: len(must_lead)]) == must_lead


def test_every_graded_entry_has_oracle_or_is_declared_rows_only():
    q, o = entry.queries(), entry.oracle_sql()
    missing = {n for n in q if n not in o}
    assert missing == ROWS_ONLY


def test_registries_disjoint_and_callable():
    assert not set(QUERIES) & set(EXTRA_QUERIES)
    for name, (fn, sql) in {**QUERIES, **EXTRA_QUERIES}.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
