"""Multi-dimensional data layout: Z-order (Morton) interleaving.

Range-partitioning on ONE column gives perfect skipping on that column and
none on any other; at 100 TB the scan-pruning win usually has to cover two
or three predicates (tenant + date, user + time). Z-ordering interleaves
the bits of several normalized columns into one sort key, so sorting by it
co-locates rows that are close in EVERY dimension — parquet min/max stats
then prune scans for predicates on any interleaved column (the technique
behind Delta/Iceberg Z-order clustering).

Everything is a JVM bit-twiddling expression (codegen-friendly, no UDF) and
a single ``repartitionByRange`` — the one shuffle any re-layout needs. The
bit interleave is a pure integer function, so a SQL oracle reproduces the
key bit-exactly.

The reference has no layout surface (its tables are copied wholesale,
``src/wins_transform_staging.py:132,145``); this is an engine extension for
the scan-pruning stance of SURVEY.md §4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one BIGINT Morton key. Dimension d's bit i lands at output
    position ``i * len(cols) + d`` — an explicit OR chain, fully folded by
    codegen. ``len(cols) * bits`` must be <= 63.

    Callers normalize each dimension into [0, 2^bits) first (e.g. day
    number, hash bucket, id mod 2^bits); out-of-range bits are masked off.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed 64-bit key")
    key = F.lit(0).cast("bigint")
    for d, c in enumerate(cols):
        v = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return key


def zorder_key_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB/ANSI bit ops) — the
    oracle twin of :func:`zorder_key`."""
    n = len(exprs)
    terms = []
    for d, e in enumerate(exprs):
        v = f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + d})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[Column],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_zorder",
) -> DataFrame:
    """Attach the Morton key and range-partition + locally sort by it —
    ready for a parquet/Delta write whose files carry tight min/max stats
    on every interleaved dimension. One shuffle; the sort is within
    partitions only."""
    out = df.withColumn(key_col, zorder_key(cols, bits=bits))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, key_col).sortWithinPartitions(key_col)
