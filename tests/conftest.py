from __future__ import annotations

import pytest

from aktuell_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aktuell_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def golden_replay(event_rows):
    """Driver-side oracle: replay CDC ops in seq order into a dict.

    Implements exactly the reference's client merge semantics
    (/root/reference/react-client/src/hooks/useAktuellStream.ts:125-171):
    insert→put, update/replace→overwrite, delete→remove. Duplicate seq
    values are applied once (idempotent redelivery). Test-scale only.
    """
    state: dict[tuple, dict] = {}
    seen: set[int] = set()
    for r in sorted(event_rows, key=lambda r: r["seq"]):
        if r["seq"] in seen:
            continue
        seen.add(r["seq"])
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "role": r["role"],
                "text": r["text"],
                "tool": r["tool"],
                "ts": r["ts"],
            }
    return state


def golden_partial_replay(event_rows):
    """Sequential oracle WITH delta application (MongoDB semantics: an
    update without a post-image mutates an existing doc via
    updated_fields/removed_fields, and matches nothing otherwise).
    Shared by the partial-update unit tests and the hypothesis property
    suite. Test-scale only."""
    state: dict[tuple, dict] = {}
    seen: set[int] = set()
    for r in sorted(event_rows, key=lambda r: r["seq"]):
        if r["seq"] in seen:
            continue
        seen.add(r["seq"])
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(key, None)
        elif r["op"] == "update" and r["text"] is None and (
            r.get("updated_fields") is not None
            or r.get("removed_fields") is not None
        ):
            if key not in state:
                continue  # update matched nothing
            doc = state[key]
            for c in ("role", "text", "tool"):
                if r.get("updated_fields") and c in r["updated_fields"]:
                    doc[c] = r["updated_fields"][c]
                elif r.get("removed_fields") and c in r["removed_fields"]:
                    doc[c] = None
            doc["ts"] = r["ts"]
        else:
            state[key] = {
                "conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
                "role": r["role"], "text": r["text"], "tool": r["tool"],
                "ts": r["ts"],
            }
    return state


def assert_df_equal(a, b):
    """Order-insensitive multiset equality via collect.

    (exceptAll over window-function plans trips a Spark 4.1.2 internal
    planner bug — INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND — so tests compare
    collected rows; fixture-scale only.)
    """
    from collections import Counter

    ca = Counter(tuple(r) for r in a.collect())
    cb = Counter(tuple(r) for r in b.collect())
    assert ca == cb, f"row multisets differ: {(ca - cb), (cb - ca)}"


def assert_same_rows(df, expected_state):
    """Order-insensitive equality of a payload DataFrame vs golden dict."""
    got = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in df.collect()}
    assert set(got) == set(expected_state), (
        f"key sets differ: only_got={list(set(got) - set(expected_state))[:5]} "
        f"only_exp={list(set(expected_state) - set(got))[:5]}"
    )
    for k, exp in expected_state.items():
        g = got[k]
        for col, v in exp.items():
            assert g[col] == v, f"{k}.{col}: {g[col]!r} != {v!r}"
