"""Shared parallelism guard for under-split inputs.

Single-file corpora/media tables scan as ONE partition (and every bench
input parquet is a single row group, so splits cannot help) — any
CPU-heavy per-row pass after such a scan would run on one core / one
Python worker. ``spread`` repartitions an under-split frame up to the
default parallelism and no-ops on anything already at least that wide
(any cluster-scale input), the same guard ``minhash_signature_table``
exposes as ``min_parallelism``. Callers apply it only before per-row pure
passes (distance/signature folds, mapInPandas decoders), so row placement
cannot change any result.

One definition (r15 ADVICE: it was triplicated across operators/dedup,
functions/vectors and functions/multimodal) so the threshold rule and any
future fix live in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff it is narrower.

    The partition-count probe (``df.rdd.getNumPartitions()``) costs one
    plan-to-RDD conversion on the driver per call — acceptable for the
    scan-rooted frames this guards; do not call it inside per-round loops.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
