"""Global ranking without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces every row
through ONE task — the classic scale trap (a 100 TB sort funnels into a
single executor thread). The standard distributed rewrite, used here:

  1. range-partition by the sort key (`repartitionByRange` — Spark samples
     boundaries, giving ~equal partitions) and **pin the partitioning** with
     an eager ``localCheckpoint`` so every downstream branch observes the
     same physical partition assignment;
  2. compute per-partition row counts (a partitions-sized frame), prefix-sum
     them with a window over that TINY frame, and broadcast-join the offsets
     back: global_rank = partition_offset + local row_number.

Why the checkpoint is load-bearing, not belt-and-braces: range boundaries
are *sampled* (nondeterministic), and ``spark_partition_id()`` is
nondeterministic, so deriving the counts branch and the main branch from the
same *lazy* plan is only correct if Spark happens to reuse one physical
exchange for both. ``localCheckpoint(eager=True)`` materializes the ranged
partitions exactly once; both branches then read the same frozen blocks, so
the offsets always describe the partitions the ranks are computed in. The
final output is deterministic because the sort key is a total order (callers
must include a unique tiebreak column) — the checkpoint guarantees internal
consistency, the total order guarantees run-to-run stability.

(Trade-off at cluster scale: localCheckpoint stores blocks on executors; an
executor loss forces recompute of the lost blocks upstream. That is the
standard cost of this idiom — cf. operators/graph.py's iteration
truncation — and far cheaper than a single-partition global sort.
operators/packing.py avoids the issue differently — it shards by a
deterministic content hash because its running sum doesn't need a total
order across shards; a global rank does, hence range sharding + pinning.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Internal column names: prefixed to avoid colliding with caller columns.
_PID = "_gr_pid"
_CNT = "_gr_n"
_OFF = "_gr_offset"
_TOT = "_gr_total"


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based dense global row number under ``ORDER BY order_cols``
    (which MUST be a total order — include a unique key as tiebreak).
    No single-partition stage: see module docstring for the dataflow.
    """
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Eager materialization pins partition assignment (see module docstring);
    # without it the counts branch and the rank branch could range-sample
    # different boundaries and silently produce duplicated/gapped ranks.
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy(_PID).agg(F.count("*").alias(_CNT))
    # partitions-sized frame: the unpartitioned window here is over ≤ n rows
    offsets = counts.withColumn(
        _OFF,
        F.coalesce(
            F.sum(_CNT).over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PID, _OFF)
    local = Window.partitionBy(_PID).orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.row_number().over(local) + F.col(_OFF)).cast("bigint"))
        .drop(_PID, _OFF)
    )


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    k: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) binning: assign each row to one of ``k``
    near-equal-population buckets by rank of ``value_col``.

    bucket = ((rn-1) * k) div N + 1 — true integer division (`div`), so any
    SQL engine reproduces it bit-exactly at any row count (unlike NTILE,
    whose remainder-placement rule is easy to mis-mirror, and unlike
    float-divide-then-floor, which is only exact below ~2^50 rows).
    Adds columns ``rn`` and ``bucket``.
    """
    ranked = global_row_number(df, [value_col, tiebreak_col])
    total = ranked.agg(F.count("*").alias(_TOT))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "bucket",
            # `div` = integer division on BIGINT operands (DuckDB spells it
            # `//`) — no floating-point round-trip
            (F.expr(f"((rn - 1) * {k}) div {_TOT}") + F.lit(1)).cast("int"),
        )
        .drop(_TOT)
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    lower_pct: int = 5,
    upper_pct: int = 95,
    out_col: str = "winsorized",
) -> DataFrame:
    """Clamp ``value_col`` to its [lower_pct, upper_pct] rank-based
    percentile bounds (robust outlier treatment before scaling/featurizing).

    Percentile = the value at rank ``ceil(p * N / 100)`` under
    ``ORDER BY value, tiebreak`` — all integer arithmetic
    (``(p*N + 99) div 100``), so any SQL engine lands on the identical bound
    row, unlike interpolating percentile definitions which differ per engine.

    Dataflow: global rank via :func:`global_row_number` (no single-partition
    sort), N and the two bound rows reduce to one-row frames that
    broadcast back — the corpus is scanned, never re-shuffled, for the
    clamp itself.
    """
    ranked = global_row_number(df, [value_col, tiebreak_col], out_col="_wz_rn")
    total = ranked.agg(F.count("*").alias(_TOT))
    with_n = ranked.crossJoin(F.broadcast(total))
    lo_rank = F.greatest(F.lit(1), F.expr(f"({lower_pct} * {_TOT} + 99) div 100"))
    hi_rank = F.expr(f"({upper_pct} * {_TOT} + 99) div 100")
    bounds = with_n.groupBy().agg(
        F.min(F.when(F.col("_wz_rn") == lo_rank, F.col(value_col))).alias("_wz_lo"),
        F.min(F.when(F.col("_wz_rn") == hi_rank, F.col(value_col))).alias("_wz_hi"),
    )
    return (
        ranked.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("_wz_lo")), F.col("_wz_hi")),
        )
        .drop("_wz_rn", "_wz_lo", "_wz_hi")
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Robust standardization ``(x - median) / IQR`` — the outlier-immune
    alternative to z-scoring for feature prep (mean/std are dragged by the
    tails a web-scale corpus always has; median/IQR are not).

    Median and quartiles are exact rank-based order statistics (value at
    rank ``ceil(p*N/100)``, ORDER BY value + tiebreak — the winsorize
    convention, identical in any engine; interpolating definitions
    differ). The scale expression is two correctly-rounded IEEE ops on
    identical operands, so the output is engine-exact. Degenerate case:
    IQR = 0 (constant-heavy column) yields NULL rather than a division
    blow-up — callers treat NULL as "column carries no spread signal".

    Dataflow mirrors :func:`winsorize`: sharded global rank, three bound
    rows reduced to a one-row broadcast frame, one narrow projection —
    the corpus never re-shuffles for the scaling itself.
    """
    ranked = global_row_number(df, [value_col, tiebreak_col], out_col="_rs_rn")
    total = ranked.agg(F.count("*").alias(_TOT))
    with_n = ranked.crossJoin(F.broadcast(total))
    q1_rank = F.greatest(F.lit(1), F.expr(f"(25 * {_TOT} + 99) div 100"))
    q2_rank = F.greatest(F.lit(1), F.expr(f"(50 * {_TOT} + 99) div 100"))
    q3_rank = F.greatest(F.lit(1), F.expr(f"(75 * {_TOT} + 99) div 100"))
    bounds = with_n.groupBy().agg(
        F.min(F.when(F.col("_rs_rn") == q1_rank, F.col(value_col))).alias("_rs_q1"),
        F.min(F.when(F.col("_rs_rn") == q2_rank, F.col(value_col))).alias("_rs_q2"),
        F.min(F.when(F.col("_rs_rn") == q3_rank, F.col(value_col))).alias("_rs_q3"),
    )
    iqr = F.col("_rs_q3") - F.col("_rs_q1")
    return (
        ranked.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.when(
                iqr != 0,
                (F.col(value_col) - F.col("_rs_q2")) / iqr,
            ),
        )
        .drop("_rs_rn", "_rs_q1", "_rs_q2", "_rs_q3")
    )
