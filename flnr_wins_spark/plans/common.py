"""Query registry + determinism helpers.

Every engine capability gets a named entry: a PySpark implementation
``fn(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) an ANSI-SQL
twin the DuckDB oracle runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash, so:

  * every computed column is aliased identically on both sides;
  * double aggregations go through exact DECIMAL arithmetic then cast back to
    DOUBLE (order-insensitive => bit-identical across engines);
  * integer-width types are cast explicitly (DuckDB len()/row_number() return
    BIGINT; Spark's size()/row_number() return INT — we standardize);
  * every ORDER BY carries a unique-key tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None  # DuckDB oracle; None => rows-only check
    note: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, sql: str | None = None, note: str = "", bench: bool = False, tags: tuple[str, ...] = ()):
    """Register a query/operator entry."""

    def deco(fn):
        _REGISTRY[name] = QueryDef(name=name, fn=fn, sql=sql, note=note, bench=bench, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Import all plan modules and return the full registry."""
    import flnr_wins_spark.plans.events  # noqa: F401
    import flnr_wins_spark.plans.extensions  # noqa: F401
    import flnr_wins_spark.plans.parity  # noqa: F401
    import flnr_wins_spark.plans.relational  # noqa: F401
    import flnr_wins_spark.plans.tpch  # noqa: F401

    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Determinism helpers
# ---------------------------------------------------------------------------

def dsum(col: Column, scale: int = 2, prec: int = 27) -> Column:
    """Order-insensitive double sum: route through exact decimal arithmetic.

    ``SUM(double)`` is order-dependent in IEEE754 — different partitionings
    give different last bits. Casting each row to DECIMAL makes the sum exact
    and therefore identical across Spark and DuckDB; the final cast back to
    DOUBLE is a single deterministic conversion. Cost at scale: decimal sum is
    marginally slower than double sum but stays in whole-stage codegen.
    """
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 2, prec: int = 27) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from flnr_wins_spark.sources import read_table

    return read_table(spark, sf_dir, name)
