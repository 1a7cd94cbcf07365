"""Benchmark decontamination for training corpora.

Standard public technique (described in the GPT-3, PaLM, and Llama reports):
before training, flag or drop training documents that share long word
n-grams with evaluation benchmarks — otherwise test-set leakage inflates
eval scores. The reference has no such surface (it is a geospatial ETL,
``src/wins_transform_staging.py``); this is an engine extension for the
LLM-pipeline north star.

Spark-first design, sized for a 100 TB corpus vs a tiny eval suite:

- n-gram generation is a pure JVM higher-order-function expression
  (``split`` → ``filter`` → ``transform``/``slice``) — whole-stage codegen,
  no Python UDF, no extra pass over the text.
- the eval side is tiny (benchmark suites are at most ~1e6 distinct grams),
  so it is ``broadcast()``: the train-side match is a map-side hash join —
  the 100 TB corpus is never shuffled.
- only the contaminated minority reaches the aggregate, so the final
  groupBy is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col: Column, n: int) -> Column:
    """Sliding word ``n``-grams of a text column as ``array<string>``.

    Tokenization is lowercase alphanumeric runs (locale-free, portable to
    the DuckDB oracle). Entirely JVM expression code: ``slice`` with a
    column start over a ``sequence`` of offsets.
    """
    toks = F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda x: x != "")
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-document contamination report: (id, n_shared_grams) for every
    train document sharing at least one word n-gram with the eval set.

    The eval gram set is deduplicated and broadcast; train grams are
    deduplicated per document *map-side* (``array_distinct`` before the
    explode) so a gram repeated inside one document counts once without a
    corpus-wide distinct shuffle — the only shuffle in the plan is the
    final groupBy over the contaminated minority.

    Gram generation is narrow, so its parallelism equals the scan's split
    count — plentiful at corpus scale, but a small single-file input would
    pin the CPU-heavy gram build to one core; ``min_parallelism``
    repartitions the raw docs when the scan is under-split.
    """
    if min_parallelism is not None and train.rdd.getNumPartitions() < min_parallelism:
        train = train.repartition(min_parallelism)
    eval_grams = (
        eval_df.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g")
        )
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_ids: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Split train into (clean, contaminated) by eval n-gram overlap.

    With ``broadcast_ids`` (default) the contaminated id set — normally a
    small fraction of the corpus — is broadcast for the anti/semi joins, so
    the full corpus still never shuffles. Pass ``False`` for pathological
    overlap (eval text massively duplicated into train) where the id set
    may exceed executor memory; AQE then picks the join strategy.
    """
    report = contamination(train, eval_df, text_col, id_col, n)
    ids = report.select(id_col)
    if broadcast_ids:
        ids = F.broadcast(ids)
    clean = train.join(ids, id_col, "left_anti")
    contaminated = train.join(ids, id_col, "left_semi")
    return clean, contaminated
