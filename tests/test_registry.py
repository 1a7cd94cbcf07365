"""Registry-wide contract tests.

The driver's correctness gate compares each ``queries()`` entry with its
``oracle_sql()`` twin by row count + schema + order-insensitive value hash
(columns sorted by NAME before hashing). These tests enforce the cheap
halves of that contract for every registered entry without executing the
full queries:

  * every PySpark entry analyzes against the sf0.001 tables (catalyst
    resolution = schema, column, and type errors surface here);
  * every oracle twin parses in DuckDB and yields exactly the same column
    names (the #1 silent hash-mismatch cause).
"""

from __future__ import annotations

import duckdb
import pytest

from flnr_wins_spark.plans.common import all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def registry():
    return all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'"
        )
    return con


def test_registry_nonempty_and_unique(registry):
    assert len(registry) >= 50
    assert all(qd.fn is not None for qd in registry.values())


@pytest.mark.slow
def test_every_query_analyzes(spark, registry):
    failures = []
    for name, qd in registry.items():
        try:
            df = qd.fn(spark, SF_DIR)
            assert len(df.columns) > 0
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)


@pytest.mark.slow
def test_oracle_sql_parses_and_columns_match(spark, registry, duck):
    failures = []
    for name, qd in registry.items():
        if qd.sql is None:
            continue
        try:
            oracle_cols = [
                d[0]
                for d in duck.execute(
                    f"SELECT * FROM ({qd.sql}) oracle_probe LIMIT 0"
                ).description
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle SQL failed to parse: {e}")
            continue
        spark_cols = qd.fn(spark, SF_DIR).columns
        if sorted(spark_cols) != sorted(oracle_cols):
            failures.append(
                f"{name}: spark cols {sorted(spark_cols)} != oracle cols {sorted(oracle_cols)}"
            )
    assert not failures, "\n".join(failures)


def test_grade_first_names_all_resolve(registry):
    """Every name in the grading-priority list must be a registered
    entry — a typo would silently drop the entry to import-order position
    and waste a driver grading slot on the wrong query."""
    from flnr_wins_spark.plans.common import _GRADE_FIRST

    unknown = [n for n in _GRADE_FIRST if n not in registry]
    assert unknown == [], unknown
    assert len(set(_GRADE_FIRST)) == len(_GRADE_FIRST)  # no duplicates
