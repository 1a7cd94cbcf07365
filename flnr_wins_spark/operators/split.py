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


def key_hex(key: Column) -> Column:
    """The ONE key-canonicalization + hash expression every
    content-addressed split shares (train/test, k-fold, shard): md5 over
    the UTF-8 bytes of the stringified key. A divergent copy would let
    shard membership silently stop matching fold/split membership for
    the same key."""
    return F.md5(F.encode(key.cast("string"), "UTF-8"))


def split_bucket(key: Column, buckets: int = 256) -> Column:
    """Stable bucket id in [0, buckets) from the md5 of the (stringified)
    key. JVM-side: md5 + substring + conv, no UDF."""
    width = max(2, (buckets - 1).bit_length() + 3 >> 2)
    return F.conv(
        F.substring(key_hex(key), 1, width), 16, 10
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
    prefix = F.substring(key_hex(F.col(id_col)), 1, 2)
    return df.withColumn(
        split_col, F.when(prefix < threshold, "test").otherwise("train")
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard ordering.

    Exporting a corpus for training needs a layout that is (a) stable
    across runs/engines/partitionings — resharding must not reshuffle
    examples between shards, or resumed training re-sees data — and
    (b) order-defined within each shard, so shard files are byte-stable.
    Content addressing gives both: ``shard`` = md5-bucket of the key mod
    ``n_shards`` (pure function of the key, like ``kfold_split``), and
    ``pos`` = rank within the shard by (md5 hex, key) — a total order
    that is itself content-derived, i.e. a deterministic per-shard
    shuffle (hash order ~ uniform), exactly what LM training wants
    instead of source order.

    Scale: one hash projection (no UDF), one shuffle on ``shard``; the
    rank window partitions by shard, so state per task is one shard's
    rows — size the shard count so corpus/n_shards fits a task (the
    standard export knob). No global sort, no driver collect."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = df.withColumn("_hx", key_hex(F.col(id_col))).withColumn(
        shard_col,
        (F.conv(F.substring(F.col("_hx"), 1, 4), 16, 10).cast("long")
         % n_shards).cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_hx"), F.col(id_col))
    return (
        out.withColumn(pos_col, F.row_number().over(w).cast("bigint"))
        .drop("_hx")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
) -> None:
    """Materialize the corpus as ``n_shards`` deterministic parquet
    shards: one file per shard (``shard=<k>/`` hive dirs), rows inside
    each file in the content-derived ``pos`` order. repartition on the
    shard column routes each shard to one task; the per-task
    sortWithinPartitions leads with the partition column (the dynamic
    writer requires it) then pos, so re-exports of identical data are
    row-for-row identical."""
    staged = shard_assign(df, id_col, n_shards)
    (
        staged.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    prior_weight: int = 20,
    target_scale: int = 2,
) -> DataFrame:
    """Leakage-free OUT-OF-FOLD target encoding — the standard way to feed
    a high-cardinality categorical to a model without target leakage: each
    row's encoding is the smoothed target mean computed over the OTHER
    folds only (its own fold's rows never contribute to it), with the
    fold assignment content-addressed (``kfold_split``) so the encoding is
    reproducible across runs, engines, and partitionings.

        enc(row in fold f, cat c)
            = (S_c - S_cf + m * G_f) / (n_c - n_cf + m)
        G_f = (S_tot - S_f) / (n_tot - n_f)     (out-of-fold GLOBAL prior
                                                 — the prior itself must
                                                 not see the row's fold)

    Exactness discipline (plans/common.py): every sum routes through
    DECIMAL(27, ``target_scale``) so S values are exact and
    order-insensitive; the final arithmetic is a fixed parenthesization of
    casts/divisions on those exact values — engine-identical.

    Scale shape: two tiny aggregates ((cat, fold) and cat margins — both
    category-bounded, broadcast) joined back onto the narrow row
    projection; the corpus shuffles once for each aggregate with map-side
    combine and never self-joins. Returns (id, cat, fold, enc).
    """
    if prior_weight <= 0:
        raise ValueError("prior_weight must be > 0 (it is the n_oof=0 fallback)")
    dec = f"decimal(27,{target_scale})"
    rows = kfold_split(
        df.select(
            F.col(id_col).alias("id"),
            F.col(cat_col).alias("cat"),
            F.col(target_col).cast(dec).alias("y"),
        ),
        "id",
        k=k,
    )
    cf = rows.groupBy("cat", "fold").agg(
        F.sum("y").alias("s_cf"), F.count(F.lit(1)).cast("bigint").alias("n_cf")
    )
    c = cf.groupBy("cat").agg(
        F.sum("s_cf").alias("s_c"), F.sum("n_cf").cast("bigint").alias("n_c")
    )
    fm = cf.groupBy("fold").agg(
        F.sum("s_cf").alias("s_f"), F.sum("n_cf").cast("bigint").alias("n_f")
    )
    tot = cf.groupBy().agg(
        F.sum("s_cf").alias("s_tot"), F.sum("n_cf").cast("bigint").alias("n_tot")
    )
    g = (
        fm.crossJoin(F.broadcast(tot))
        .select(
            "fold",
            (
                (F.col("s_tot") - F.col("s_f")).cast("double")
                / (F.col("n_tot") - F.col("n_f")).cast("double")
            ).alias("g_f"),
        )
    )
    m = float(prior_weight)
    enc = (
        ((F.col("s_c") - F.col("s_cf")).cast("double") + (F.lit(m) * F.col("g_f")))
        / ((F.col("n_c") - F.col("n_cf")).cast("double") + F.lit(m))
    )
    # null-safe category joins: NULL is its own category (standard target
    # encoding treats missing as a level) — a plain equi-join would
    # silently DROP every NULL-category row from the output
    r_ = rows.alias("_r")
    cf_ = cf.alias("_cf")
    c_ = c.alias("_c")
    g_ = g.alias("_g")
    return (
        r_.join(
            F.broadcast(cf_),
            F.col("_r.cat").eqNullSafe(F.col("_cf.cat"))
            & (F.col("_r.fold") == F.col("_cf.fold")),
        )
        .join(F.broadcast(c_), F.col("_r.cat").eqNullSafe(F.col("_c.cat")))
        .join(F.broadcast(g_), F.col("_r.fold") == F.col("_g.fold"))
        .select(
            F.col("_r.id").alias("id"),
            F.col("_r.cat").alias("cat"),
            F.col("_r.fold").cast("int").alias("fold"),
            enc.alias("enc"),
        )
    )
