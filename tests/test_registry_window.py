"""Registry ↔ driver-window bookkeeping + ROTATION POLICY.

The driver's correctness gate grades exactly the FIRST 50
insertion-order entries of ``__spark_entry__.queries()``. These tests
pin three contracts:

1. the registry fits the window EXACTLY (an appended query cannot
   silently fall outside the graded window);
2. every graded entry has an oracle or a documented rows-only reason;
3. the ROTATION POLICY (VERDICT r5 #1): each round's head block holds
   only queries that have never had a driver correctness row — the
   previous round's (now driver-proven) head rotates out to
   EXTRA_QUERIES, where tools/check_oracle.py --extra keeps it green.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry
from aktuell_spark.queries import (
    DRIVER_WINDOW,
    EXTRA_QUERIES,
    PREV_ROUND_HEAD,
    QUERIES,
    _HEAD,
)

# the only registered queries with no DuckDB-expressible oracle, by
# design (stateful streaming / engine-generated fixtures): additions
# here need a justification in SURVEY §11
ROWS_ONLY = {
    "stream_cdc_materialize",
    "stream_cdc_mor",
    "stream_cdc_mor_partial",
    "stateful_turn_tool_join",
    "multimodal_features",
    # rotated out of the window but still oracle-less by design
    "turn_tool_join_native",
}


def test_registry_fits_driver_window_exactly():
    q = entry.queries()
    assert len(q) == DRIVER_WINDOW, (
        f"{len(q)} registered queries vs driver window {DRIVER_WINDOW}: "
        "every entry past the window gets NO correctness row — merge or "
        "rotate into EXTRA_QUERIES instead of appending"
    )


def test_head_is_never_driver_graded():
    """Rotation policy, part 1: every head entry (+ the three streaming
    inserts) must be new to the driver — no row in any prior round's
    CORRECTNESS file (the repo keeps them all)."""
    repo = Path(__file__).resolve().parent.parent
    prior = set()
    for f in sorted(repo.glob("CORRECTNESS_r0[1-5].json")):
        prior |= set(json.loads(f.read_text()))
    stale = [n for n in _HEAD if n in prior]
    assert stale == [], f"head entries already driver-graded: {stale}"


def test_head_disjoint_from_previous_round_head():
    """Rotation policy, part 2: the r5 head is driver-proven; re-grading
    it would waste the window. It must have rotated out entirely."""
    overlap = set(_HEAD) & set(PREV_ROUND_HEAD)
    assert overlap == set(), overlap
    # and the rotated-out queries are still registered (as extras)
    missing = [n for n in PREV_ROUND_HEAD
               if n not in EXTRA_QUERIES and n not in QUERIES]
    assert missing == [], missing


def test_window_leads_with_head_then_stream_entries():
    names = list(entry.queries())
    assert names[: len(_HEAD)] == list(_HEAD)
    assert names[len(_HEAD): len(_HEAD) + 3] == [
        "stream_cdc_materialize", "stream_cdc_mor", "stream_cdc_mor_partial",
    ]


def test_every_graded_entry_has_oracle_or_is_declared_rows_only():
    q, o = entry.queries(), entry.oracle_sql()
    missing = {n for n in q if n not in o}
    assert missing == ROWS_ONLY - {"turn_tool_join_native"}


def test_registries_disjoint_and_callable():
    assert not set(QUERIES) & set(EXTRA_QUERIES)
    for name, (fn, sql) in {**QUERIES, **EXTRA_QUERIES}.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
        if sql is None:
            assert name in ROWS_ONLY, f"{name} lost its oracle silently"
