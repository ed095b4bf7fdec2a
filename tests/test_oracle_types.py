"""Oracle typing lint: no DuckDB oracle may emit HUGEINT.

DuckDB widens integer ``sum()`` to HUGEINT (int128); Spark emits BIGINT
for the same aggregate. The driver's typed value hash distinguishes the
two even when every value is equal, so an uncast integer sum fails the
correctness gate despite matching rows — the exact bug shipped twice
(simhash round 1, deterministic_sample round 3). This lint DESCRIBEs
every registered oracle against the sf0.01 views and fails on any
HUGEINT/UHUGEINT column, so the class cannot ship a third time.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _oracles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_has_no_hugeint_columns(con, name, sql):
    cols = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c[0], c[1]) for c in cols if "HUGEINT" in c[1].upper()]
    assert not bad, (
        f"oracle {name!r} emits int128 columns {bad}: Spark produces BIGINT "
        "for integer sums — CAST(sum(...) AS BIGINT) in the oracle SQL"
    )
