"""Tests for corpus classifiers (functions/classify.py): the batch
perceptron must actually LEARN a linearly separable concept (not just
compute deterministically), and Naive Bayes must recover an obvious
vocabulary split. Determinism of both is what the DuckDB oracle twins
check; these tests pin learnability."""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.functions.classify import (
    naive_bayes_fit,
    naive_bayes_score,
    perceptron_fit,
    perceptron_score,
)


def _sep_feats(spark):
    # y = +1 iff f1 >= 5; margin grows with |f1 - 4.5| so a perceptron
    # separates it in few rounds.
    rows = [(i, 1 if i % 10 >= 5 else -1, i % 10, 1) for i in range(200)]
    return spark.createDataFrame(rows, "id long, y long, f1 long, f2 long")


def test_perceptron_learns_separable(spark):
    feats = _sep_feats(spark)
    w = perceptron_fit(feats, ["f1", "f2"], label_col="y", iters=20)
    scored = perceptron_score(feats, w, ["f1", "f2"], id_col="id")
    acc = (
        scored.join(feats.select("id", "y"), "id")
        .agg(F.avg((F.col("pred") == F.col("y")).cast("double")))
        .first()[0]
    )
    assert acc >= 0.95


def test_perceptron_integer_weights_deterministic(spark):
    feats = _sep_feats(spark)
    w1 = perceptron_fit(feats, ["f1", "f2"], iters=3).first()
    w2 = perceptron_fit(feats.repartition(13), ["f1", "f2"], iters=3).first()
    assert w1 == w2  # bit-exact regardless of partitioning


def test_naive_bayes_recovers_vocab_split(spark):
    train = spark.createDataFrame(
        [("en", "the cat sat on the mat"), ("en", "the dog ate the bone"),
         ("fr", "le chat est sur le tapis"), ("fr", "le chien mange un os")],
        "cls string, text string",
    )
    test = spark.createDataFrame(
        [(1, "the cat ate"), (2, "le chat mange")], "doc_id long, text string"
    )
    term_lp, class_lp = naive_bayes_fit(train)
    out = {r["id"]: r["pred_cls"] for r in naive_bayes_score(test, term_lp, class_lp).collect()}
    assert out == {1: "en", 2: "fr"}


def test_naive_bayes_unseen_term_uses_floor(spark):
    train = spark.createDataFrame(
        [("a", "x x x"), ("b", "y y y")], "cls string, text string"
    )
    test = spark.createDataFrame([(1, "zzz x")], "doc_id long, text string")
    term_lp, class_lp = naive_bayes_fit(train)
    res = naive_bayes_score(test, term_lp, class_lp).collect()
    assert len(res) == 1 and res[0]["pred_cls"] == "a"
