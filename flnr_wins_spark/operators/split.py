"""Deterministic dataset splitting for training pipelines.

``rand()``-based splits are non-reproducible across runs/partitionings and
leak rows between splits when data is reprocessed. The standard fix is a
content-addressed split: bucket every row by a cryptographic hash of its
key — membership is a pure function of the key, stable across runs,
engines, and cluster layouts, and new data lands in the same proportions
without touching old assignments.

Implementation detail: the first two hex chars of md5(key) give 256 evenly
distributed buckets; a row is 'test' when its prefix sorts below the
fraction threshold. Lexicographic hex comparison is engine-portable (the
DuckDB oracle runs the identical expression), unlike xxhash64/rand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key: Column, buckets: int = 256) -> Column:
    """Stable bucket id in [0, buckets) from the md5 of the (stringified)
    key. JVM-side: md5 + substring + conv, no UDF."""
    width = max(2, (buckets - 1).bit_length() + 3 >> 2)
    return F.conv(
        F.substring(F.md5(F.encode(key.cast("string"), "UTF-8")), 1, width), 16, 10
    ).cast("long") % buckets


def kfold_split(
    df: DataFrame, id_col: str, k: int = 5, fold_col: str = "fold"
) -> DataFrame:
    """Assign each row a cross-validation fold in [0, k) by content hash.

    Same discipline as ``train_test_split``: membership is a pure function
    of the key, so folds are stable across runs, engines, and partitionings,
    and incremental data lands in folds at the same proportions. Fold sizes
    are even up to the hash-bucket quantization of ``split_bucket``.
    Narrow map-side projection — no shuffle, safe at any scale.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(fold_col, split_bucket(F.col(id_col), k).cast("int"))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Tag each row 'train' or 'test' deterministically by key hash.

    ``test_fraction`` is quantized to 1/256 granularity. The same key always
    lands in the same split — re-runs, backfills, and engine changes cannot
    leak test rows into training.
    """
    from flnr_wins_spark.operators.sample import _threshold_hex

    threshold = _threshold_hex(test_fraction)
    prefix = F.substring(F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), 1, 2)
    return df.withColumn(
        split_col, F.when(prefix < threshold, "test").otherwise("train")
    )
