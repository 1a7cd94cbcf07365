"""Interval (range) join: pair rows whose event times fall within a window.

Spark has no native range join (the reference has no joins beyond left-outer
equi at all — SURVEY.md §2c); the naive formulation
``a JOIN b ON a.key = b.key AND b.ts <= a.ts AND a.ts < b.ts + w`` plans as a
sort-merge on the key with a per-key quadratic filter — fine for narrow keys,
catastrophic for hot keys.

``interval_join`` uses the standard bucketing rewrite: quantize time into
``window``-sized buckets; a row pairs only with rows in its own or the
previous bucket, so the join becomes an EQUI-join on (key, bucket) — hash
shuffle, codegen, AQE skew handling all apply — followed by the exact
range predicate on the (small) bucket-local candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    window_seconds: int,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) with ``l.key = r.key`` and
    ``r.time <= l.time < r.time + window_seconds``.

    Returns left columns plus right columns suffixed. Exact — bucketing only
    prunes candidates, the precise predicate is applied after the equi-join.
    """
    bkt = lambda c: F.floor(F.unix_timestamp(F.col(c)) / window_seconds)  # noqa: E731
    l_ = left.select(
        *[F.col(c) for c in left.columns], bkt(time_col).alias("_bkt")
    )
    r_ = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        F.explode(
            F.array(bkt(time_col), bkt(time_col) + 1)
        ).alias("_bkt"),
    )
    lt, rt = F.col(time_col), F.col(f"{time_col}{suffix}")
    return (
        l_.join(
            r_,
            (F.col(key) == F.col(f"{key}{suffix}")) & (l_["_bkt"] == r_["_bkt"]),
        )
        .filter((rt <= lt) & (lt < rt + F.expr(f"INTERVAL {window_seconds} SECONDS")))
        .drop("_bkt")
    )
