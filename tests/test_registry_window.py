"""Registry ↔ driver-window bookkeeping + ROTATION POLICY.

The driver's correctness gate grades exactly the FIRST 50
insertion-order entries of ``__spark_entry__.queries()``. These tests
pin three contracts:

1. the registry fits the window EXACTLY (an appended query cannot
   silently fall outside the graded window);
2. every graded entry has an oracle or a documented rows-only reason;
3. the ROTATION POLICY (VERDICT r5 #1, generalized in round 7 now every
   query has at least one driver row): the head block holds the STALEST
   queries — nothing graded in either of the two most recent rounds —
   plus brand-new operators; the previous round's (now driver-proven)
   head rotates out to EXTRA_QUERIES, where
   tools/check_oracle.py --extra keeps it green.
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


def test_head_is_stalest_first():
    """Rotation policy, part 1 (round-7 form): no head entry was graded
    in either of the two most recent rounds' CORRECTNESS files — the
    window refreshes the stalest rows first (or grades brand-new
    operators for the first time)."""
    repo = Path(__file__).resolve().parent.parent
    recent = set()
    for f in sorted(repo.glob("CORRECTNESS_r0[5-6].json")):
        recent |= set(json.loads(f.read_text()))
    fresh = [n for n in _HEAD if n in recent]
    assert fresh == [], f"head entries graded within the last 2 rounds: {fresh}"


def test_head_disjoint_from_previous_round_head():
    """Rotation policy, part 2: the r6 head is driver-proven; re-grading
    it in the HEAD would waste the window (the tail may re-grade an
    entry whose code materially changed). It must have rotated out of
    the head entirely."""
    overlap = set(_HEAD) & set(PREV_ROUND_HEAD)
    assert overlap == set(), overlap
    # and the rotated-out queries are still registered (window tail for
    # materially-changed code, extras otherwise)
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
    assert missing == ROWS_ONLY & set(q)
    # round 7: only the three streaming variants are in-window rows-only
    assert missing == {
        "stream_cdc_materialize", "stream_cdc_mor", "stream_cdc_mor_partial",
    }


def test_registries_disjoint_and_callable():
    assert not set(QUERIES) & set(EXTRA_QUERIES)
    for name, (fn, sql) in {**QUERIES, **EXTRA_QUERIES}.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name
        if sql is None:
            assert name in ROWS_ONLY, f"{name} lost its oracle silently"
