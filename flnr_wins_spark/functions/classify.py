"""Document classifiers for corpus curation: a batch perceptron (integer
weights, bit-exact) and a multinomial Naive Bayes (decimal-routed log
probabilities) — the two classic cheap "quality / language classifier"
shapes an LLM-data pipeline runs at corpus scale (fastText-style filtering
reduced to engine-native aggregations, so no external training toolkit).

Reference analog: none — the reference (`/root/reference/src/
wins_transform_staging.py`) has no learned components; these belong to the
SURVEY §2c "what we add anyway" training-data-pipeline surface.

Scale notes (the 100 TB contract):

* Both training loops are ``iters`` (perceptron) or 1 (NB counting) full
  scans with map-side-combinable aggregations; the learned model is a few
  rows and always travels by broadcast. No vector/weight ever becomes a
  shuffle key.
* All arithmetic that crosses a partition boundary is integer (perceptron)
  or DECIMAL-routed ln (NB) — the plans/common.py determinism rule — so
  both classifiers are exactly reproducible across partitionings AND
  engines (DuckDB oracle twins hash-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flnr_wins_spark.functions.text import tokens


def token_count_feature(text_col: Column, term: str) -> Column:
    """Integer feature: occurrences of ``term`` as a whitespace token."""
    return F.size(F.filter(tokens(text_col), lambda x: x == F.lit(term))).cast(
        "bigint"
    )


def perceptron_fit(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 3,
    lr: int = 1,
) -> DataFrame:
    """Batch perceptron over integer features; returns a ONE-ROW DataFrame
    ``(b, w_<f1>, ..., w_<fd>)`` of bigint weights.

    Per iteration: broadcast the current weight row, compute each row's
    margin ``y * (w·x + b)``, and apply the summed update over misclassified
    rows (margin <= 0): ``w += lr * Σ y*x``, ``b += lr * Σ y``. With integer
    features and labels in {-1,+1} every weight stays a bigint, so the
    trained model is bit-exact under any partitioning — which is what lets
    a fixed unrolled-iteration DuckDB twin hash-match it.

    Scale shape: each round is ONE full scan ending in a scalar aggregate
    (map-side combined, d+1 output cells); the weight row rides a broadcast
    crossJoin. ``iters`` is a fixed budget (mirror of ``kmeans_fit``).
    Lineage is truncated per round with ``localCheckpoint`` — the weight
    row is tiny but its plan nests a full scan per round otherwise.
    """
    x = feats.select(
        F.col(label_col).cast("bigint").alias("_y"),
        *[F.col(c).cast("bigint").alias(c) for c in feature_cols],
    )
    zero = F.lit(0).cast("bigint")
    w = x.groupBy().agg(
        F.max(zero).alias("b"),
        *[F.max(zero).alias(f"w_{c}") for c in feature_cols],
    )
    for _ in range(iters):
        margin = F.col("_y") * (
            F.col("b")
            + sum((F.col(f"w_{c}") * F.col(c) for c in feature_cols), zero)
        )
        mis = x.crossJoin(F.broadcast(w)).withColumn("_m", margin)
        upd = F.when(F.col("_m") <= 0, F.lit(1)).otherwise(F.lit(0))
        w = mis.groupBy().agg(
            (F.first("b") + lr * F.sum(upd * F.col("_y"))).cast("bigint").alias("b"),
            *[
                (F.first(f"w_{c}") + lr * F.sum(upd * F.col("_y") * F.col(c)))
                .cast("bigint")
                .alias(f"w_{c}")
                for c in feature_cols
            ],
        ).localCheckpoint()
    return w


def perceptron_score(
    feats: DataFrame,
    weights: DataFrame,
    feature_cols: list[str],
    id_col: str = "id",
) -> DataFrame:
    """Score rows against a trained weight row: returns
    ``(id, margin, pred)`` with ``margin = w·x + b`` (bigint) and
    ``pred = 1 if margin > 0 else -1``. Broadcast of the one-row model;
    the scan itself is a narrow map."""
    zero = F.lit(0).cast("bigint")
    margin = F.col("b") + sum(
        (F.col(f"w_{c}") * F.col(c) for c in feature_cols), zero
    )
    return (
        feats.crossJoin(F.broadcast(weights))
        .select(
            F.col(id_col).alias("id"),
            margin.cast("bigint").alias("margin"),
            F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
        )
    )


def naive_bayes_fit(
    train: DataFrame,
    text_col: str = "text",
    class_col: str = "cls",
) -> tuple[DataFrame, DataFrame]:
    """Multinomial Naive Bayes with add-1 smoothing, trained by counting.

    Returns ``(term_lp, class_lp)``:

    * ``term_lp (term, cls, lp)`` — ln P(term|cls) for every (term, class)
      seen in training, lp = ln((count(term,cls)+1) / (tokens_cls + V)),
      routed through DECIMAL(27,9);
    * ``class_lp (cls, prior_lp, floor_lp)`` — ln P(cls) and the smoothing
      floor ln(1 / (tokens_cls + V)) for unseen terms.

    Training is two groupBy passes over the exploded token stream (term
    counts, class totals) plus a distinct-term count for V — all map-side
    combinable. The model is vocabulary-sized (small relative to the
    corpus) and is meant to be broadcast by ``naive_bayes_score``.
    """
    toks = train.select(
        F.col(class_col).alias("cls"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tc = toks.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("n"))
    cls_tot = tc.groupBy("cls").agg(F.sum("n").cast("bigint").alias("tok_c"))
    vocab_n = tc.select("term").distinct().groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    n_docs = train.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    cls_docs = train.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dc")
    )
    dec_ln = lambda c: F.log(c).cast("decimal(27,9)")  # noqa: E731
    denom = (F.col("tok_c") + F.col("v")).cast("double")
    term_lp = (
        tc.join(F.broadcast(cls_tot), "cls")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "term",
            "cls",
            dec_ln((F.col("n") + 1).cast("double") / denom).alias("lp"),
        )
    )
    class_lp = (
        cls_docs.join(F.broadcast(n_docs))
        .join(F.broadcast(cls_tot), "cls")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "cls",
            dec_ln(F.col("dc").cast("double") / F.col("nd").cast("double")).alias(
                "prior_lp"
            ),
            dec_ln(F.lit(1.0) / denom).alias("floor_lp"),
        )
    )
    return term_lp, class_lp


def naive_bayes_score(
    docs: DataFrame,
    term_lp: DataFrame,
    class_lp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its argmax-class under the NB model: returns
    ``(id, pred_cls, score)`` with score = prior_lp + Σ_t lp(t, cls) as a
    DECIMAL(27,9) sum (order-insensitive, engine-exact).

    Shape: explode doc tokens once, fan out ×C classes via a broadcast
    crossJoin on the (tiny) class table, left-join the broadcast model on
    (term, cls) with the per-class floor as the unseen fallback, one
    groupBy (id, cls) decimal sum, then a per-id window argmax with a
    deterministic tie-break (score DESC, cls ASC). The corpus-side stream
    never shuffles on a hot key: the only wide exchange is keyed on
    (id, cls), which is unique per document."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    per_class = (
        toks.crossJoin(F.broadcast(class_lp))
        .join(F.broadcast(term_lp), ["term", "cls"], "left")
        .groupBy("id", "cls")
        .agg(
            (
                F.first("prior_lp")
                + F.sum(F.coalesce(F.col("lp"), F.col("floor_lp")))
            ).alias("score")
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("cls").asc())
    return (
        per_class.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", F.col("cls").alias("pred_cls"), F.col("score").cast("double").alias("score"))
    )
