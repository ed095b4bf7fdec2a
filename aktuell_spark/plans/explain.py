"""Physical-plan inspection: assert the plan we designed is the plan we
got.

The reference hand-implements pushdown/pruning/limits
(/root/reference/pkg/sync/database.go:67-75,242-249 — $match pushed into
the change stream, filters into Find); Catalyst does all of that for us,
but silently NOT getting it (a filter stuck above a join, a broadcast
that fell back to sort-merge, a scan reading every column) is the #1 way
a 100 TB job dies. These helpers turn plan properties into testable
assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan reports a pushed filter containing
    ``fragment`` (check `PushedFilters:` in the formatted plan)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            cols.extend(re.findall(r"(\w+):", line.split("ReadSchema:")[1]))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in the physical plan (Broadcast/SortMerge/Hash)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        for s in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin"):
            if s in line and s not in out:
                out.append(s)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (each Exchange is a full shuffle).
    Counts detail-section nodes '(N) Exchange' so the tree header isn't
    double-counted; Reused/Broadcast exchanges excluded (broadcast is
    not a repartitioning shuffle)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, flags=re.MULTILINE))


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better."""
    plan = formatted_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "WholeStageCodegen" in line:
            ids.add(line.strip())
    return len(ids)
