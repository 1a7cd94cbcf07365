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


# ---------------------------------------------------------------------------
# Corpus statistics (text.py round-4 additions)
# ---------------------------------------------------------------------------

def test_cooccurrence_pmi_finds_planted_collocation(spark):
    from flnr_wins_spark.functions.text import cooccurrence_pmi

    # "zig zag" always co-occurs; filler tokens are common everywhere.
    rows = [(i, "zig zag on the on the on the") for i in range(10)]
    rows += [(100 + i, "the on the on the on") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = cooccurrence_pmi(df, min_count=5, top_k=3).collect()
    assert (top[0]["a"], top[0]["b"]) == ("zig", "zag")
    assert float(top[0]["pmi"]) > 0


def test_bigram_quality_flags_improbable_stream(spark):
    from flnr_wins_spark.functions.text import bigram_quality

    common = [(i, "alpha beta gamma delta") for i in range(20)]
    weird = [(999, "delta alpha gamma beta")]  # unseen transitions
    df = spark.createDataFrame(common + weird, "doc_id long, text string")
    nll = {r["id"]: r["avg_nll"] for r in bigram_quality(df).collect()}
    assert nll[999] > nll[0]  # improbable bigrams score higher nll


def test_bigram_quality_skips_single_token_docs(spark):
    from flnr_wins_spark.functions.text import bigram_quality

    df = spark.createDataFrame(
        [(1, "only"), (2, "two tokens")], "doc_id long, text string"
    )
    out = bigram_quality(df).collect()
    assert {r["id"] for r in out} == {2}
    assert out[0]["n_bigrams"] == 1


def test_bpe_train_merges_and_applies(spark):
    from flnr_wins_spark.functions.text import bpe_train

    # 'aaab' x3, 'ab' x2: round 1 must merge ('a','a') (count 2*3=6 beats
    # ('a','b') count 5); round 2 then sees 'aa_a_b' and 'a_b' so ('a','b')
    # wins with count 5 — proving the merge APPLICATION feeds the recount.
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab ab")], "doc_id long, text string"
    )
    out = {r["round"]: (r["a"], r["b"], r["cnt"]) for r in bpe_train(docs, rounds=2).collect()}
    assert out[1] == ("a", "a", 6)
    assert out[2] == ("a", "b", 5)


def test_bpe_train_leftmost_nonoverlapping(spark):
    from flnr_wins_spark.functions.text import bpe_train

    # 'aaaa': positions (a,a) x3 in round 1; leftmost merge yields aa_aa,
    # so round 2's top pair is ('aa','aa') with count 1
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = {r["round"]: (r["a"], r["b"], r["cnt"]) for r in bpe_train(docs, rounds=2).collect()}
    assert out[1] == ("a", "a", 3)
    assert out[2] == ("aa", "aa", 1)
