"""Text-analysis functions for LLM-data pipelines (engine extension).

JVM-side built-ins wherever expressible (token stats, quality score,
fingerprints via split/filter/size — whole-stage codegen); Arrow-batched
Pandas UDFs only where genuinely imperative (language-ID n-gram profiles,
rolling Rabin-Karp hash).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def char_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate: ceil(chars / 4) — the standard rough
    chars-per-token constant for English-like text."""
    return F.ceil(F.length(col) / 4.0).cast("bigint")


# Pre-tokenizer segmentation in the GPT-2 style: letter runs, digit runs,
# punctuation runs, each with an optional leading space. Kept to constructs
# with identical semantics in Java regex (Spark) and RE2 (DuckDB) so the
# oracle can check it.
BPE_SPLIT_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_pretokens(col: Column) -> Column:
    """Segment text into BPE pre-tokens (the split that precedes merges in a
    BPE tokenizer). JVM-side regexp_extract_all — no Python in the loop."""
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def bpe_token_estimate(col: Column) -> Column:
    """Token-count estimate = pre-token segments + a merge-density correction
    (long alphabetic runs split into ~len/4 subword units)."""
    seg_extra = F.aggregate(
        bpe_pretokens(col),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.when(F.length(s) > 4, F.ceil((F.length(s) - 4) / 4.0).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
    )
    return (F.size(bpe_pretokens(col)).cast("bigint") + seg_extra).cast("bigint")


def uniq_token_ratio(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("double") / F.size(tokens(col))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), lambda t_: t_.isin(*stopwords))).cast(
        "double"
    ) / F.size(tokens(col))


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0,1]: length saturation +
    lexical diversity + non-stopword mass. All arithmetic is per-row IEEE
    (engine-independent)."""
    n = F.size(tokens(col)).cast("double")
    length_part = F.least(F.lit(1.0), n / F.lit(100.0))
    return (
        F.lit(0.4) * length_part
        + F.lit(0.4) * uniq_token_ratio(col)
        + F.lit(0.2) * (F.lit(1.0) - stopword_ratio(col))
    )


def prefix_fingerprint(col: Column, n_tokens: int = 8) -> Column:
    """Content fingerprint: md5 of the first n tokens — cheap clustering key
    for prefix-duplicate detection."""
    return F.md5(F.encode(F.concat_ws(" ", F.slice(tokens(col), 1, n_tokens)), "UTF-8"))


# ---------------------------------------------------------------------------
# Corpus-curation quality rules (Gopher/C4-style heuristics)
# ---------------------------------------------------------------------------
# The published web-corpus filtering recipes (Gopher's quality rules, C4's
# cleanup heuristics) reduce to per-document arithmetic over the token list —
# all JVM-expressible, no UDF, and exactly reproducible in ANSI SQL for the
# oracle. Thresholds are the commonly published defaults; every rule value is
# also emitted so downstream can re-threshold without a second scan.

QUALITY_STOPSET = ("the", "be", "to", "of", "and", "that", "have", "with")


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_ratio: float = 0.80,
    max_symbol_word_ratio: float = 0.10,
    max_dup_trigram_ratio: float = 0.30,
    min_stopword_hits: int = 2,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality-rule evaluation: one narrow projection emitting
    each rule's measured value plus the conjunctive ``passes`` verdict.

    Single pass over the scan, no shuffle; the token array is materialized
    once per row and every rule folds over it (same single-pass discipline as
    ``simhash_signatures``).

    ``keep``: extra input columns carried through to the output (appended
    after the rule columns). Lets a composed pipeline filter on ``passes`` and
    keep the payload WITHOUT a corpus self-join back to the source — the
    rules are per-row, so passthrough is free."""
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.split(F.col(text_col), " ").alias("_tk"),
        *[F.col(c) for c in keep],
    )
    n = F.size("_tk").cast("bigint")
    char_sum = F.expr("aggregate(_tk, CAST(0 AS BIGINT), (a, w) -> a + length(w))")
    mean_wl = char_sum.cast("double") / n
    alpha_ratio = (
        F.size(F.expr("filter(_tk, w -> w rlike '[A-Za-z]')")).cast("double") / n
    )
    symbols = (
        F.size(F.expr("regexp_extract_all(_txt, '#', 0)"))
        + F.size(F.expr(r"regexp_extract_all(_txt, '\\.\\.\\.', 0)"))
    ).cast("bigint")
    symbol_ratio = symbols.cast("double") / n
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so short docs must
    # short-circuit to an empty trigram list rather than fold junk
    trigrams = F.expr(
        "IF(size(_tk) < 3, CAST(array() AS array<string>),"
        " transform(sequence(1, size(_tk) - 2),"
        " i -> concat_ws(' ', element_at(_tk, CAST(i AS INT)),"
        " element_at(_tk, CAST(i + 1 AS INT)), element_at(_tk, CAST(i + 2 AS INT)))))"
    )
    dup_tri = F.when(
        F.size(trigrams) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(trigrams)).cast("double") / F.size(trigrams),
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.expr("transform(_tk, w -> lower(w))")),
            F.array(*[F.lit(s) for s in QUALITY_STOPSET]),
        )
    ).cast("bigint")
    out = staged.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        symbol_ratio.alias("symbol_word_ratio"),
        dup_tri.alias("dup_trigram_ratio"),
        stop_hits.alias("stopword_hits"),
        *[F.col(c) for c in keep],
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("dup_trigram_ratio") <= max_dup_trigram_ratio)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return out.withColumn("passes", passes)


def _gram_expr(arr: str, n: int) -> str:
    """SQL expression producing the word n-gram array of token array ``arr``.

    Guarded: Spark's sequence(1, 0) is DESCENDING [1, 0], so short docs must
    short-circuit to an empty list (matches unnest-of-empty on the oracle
    side, where sub-n docs simply produce no gram rows).
    """
    parts = ", ".join(f"element_at({arr}, CAST(i + {k} AS INT))" for k in range(n))
    return (
        f"IF(size({arr}) < {n}, CAST(array() AS array<string>),"
        f" transform(sequence(1, size({arr}) - {n - 1}), i -> concat_ws(' ', {parts})))"
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.15,
) -> DataFrame:
    """Gopher-style repetition metrics: the fraction of characters inside the
    single most frequent ``top_n``-gram, and inside all duplicated
    ``dup_n``-grams (the published web-corpus boilerplate detectors).

    Unlike the per-row folds in ``quality_rules``, frequency-per-gram needs a
    per-document group-by — so this is the distributed shape: explode grams →
    count per (doc, gram) → re-aggregate per doc. Both gram sizes are tagged
    and unioned into ONE exploded relation so the whole operator costs a
    single shuffle chain keyed on (doc, tag, gram); partial aggregation
    (map-side combine) absorbs the within-partition repeats, which is exactly
    where repetitive documents concentrate. Docs shorter than ``top_n`` words
    have no grams and drop out (same semantics both engines).
    """
    staged = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("_chars"),
        F.split(F.col(text_col), " ").alias("_tk"),
    )
    tagged = staged.select(
        F.col(id_col),
        "_chars",
        F.explode(
            F.expr(
                f"concat(transform({_gram_expr('_tk', top_n)}, x -> struct('top' AS tag, x AS gram)),"
                f" transform({_gram_expr('_tk', dup_n)}, x -> struct('dup' AS tag, x AS gram)))"
            )
        ).alias("_g"),
    ).select(F.col(id_col), "_chars", F.col("_g.tag").alias("tag"), F.col("_g.gram").alias("gram"))
    cnts = tagged.groupBy(id_col, "_chars", "tag", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gram_chars = F.col("cnt") * F.length("gram").cast("bigint")
    per_doc = cnts.groupBy(id_col, "_chars").agg(
        F.max(F.when(F.col("tag") == "top", gram_chars)).alias("_top_chars"),
        F.sum(
            F.when((F.col("tag") == "dup") & (F.col("cnt") > 1), gram_chars).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("_dup_chars"),
    )
    top_frac = F.col("_top_chars").cast("double") / F.col("_chars")
    dup_frac = F.col("_dup_chars").cast("double") / F.col("_chars")
    return per_doc.select(
        F.col(id_col),
        top_frac.alias("top_ngram_frac"),
        dup_frac.alias("dup_ngram_frac"),
        ((top_frac <= F.lit(max_top_frac)) & (dup_frac <= F.lit(max_dup_frac))).alias(
            "passes_repetition"
        ),
    )


# ---------------------------------------------------------------------------
# Pandas-UDF (Arrow-batched) functions — the imperative tail
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    # tiny closed-class word profiles; deterministic scoring
    "en": {"the", "of", "and", "to", "in", "is", "a"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un"},
    "es": {"el", "la", "los", "y", "es", "un"},
    "zh": set(),  # CJK detected by script, not stopwords
}


@pandas_udf(T.StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language-ID: CJK script check, then stopword-profile vote.
    Arrow-batched; ~vectorized string ops per batch."""

    def ident(text: str) -> str:
        if not text:
            return "und"
        if any("一" <= ch <= "鿿" for ch in text[:400]):
            return "zh"
        toks = set(text.lower().split())
        best, best_score = "und", 0
        for lang, prof in _LANG_PROFILES.items():
            score = len(toks & prof)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0 else "en"

    return texts.map(ident)


@pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Rabin-Karp rolling hash over tokens (base 1_000_003, mod 2^61-1) —
    order-sensitive content fingerprint, unlike the bag-of-words hashes."""
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def fp(text: str) -> int:
        h = 0
        for tok in (text or "").split():
            th = 0
            for ch in tok:
                th = (th * 131 + ord(ch)) % MOD
            h = (h * BASE + th) % MOD
        return h

    return texts.map(fp).astype("int64")


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full per-document text-analysis profile (one pass, no shuffle)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        char_token_estimate(c).alias("est_bpe_tokens"),
        F.size(F.array_distinct(tokens(c))).cast("bigint").alias("n_uniq"),
        uniq_token_ratio(c).alias("ttr"),
        stopword_ratio(c).alias("stop_ratio"),
        quality_score(c).alias("quality"),
        prefix_fingerprint(c).alias("prefix_fp"),
        lang_id(c).alias("lang_pred"),
        rolling_fingerprint(c).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Pattern set kept to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB) — character classes, bounded repetition, \d —
# so the oracle can run the same expressions. Order matters: emails are
# scrubbed before phone/IP so digit-bearing local parts can't be re-matched.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
    (r"\d{3}-\d{3}-\d{4}", "[PHONE]"),
)


def pii_counts(col: Column) -> list[Column]:
    """One match-count column per PII class (before redaction)."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("bigint")
        for pat, _ in PII_PATTERNS
    ]


def redact_pii(col: Column) -> Column:
    """Replace every email / IPv4 / phone match with a class token.

    Pure JVM regexp_replace chain — vectorized, no UDF, safe in the hot path
    of a 100 TB scrub pass.
    """
    out = col
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


# ---------------------------------------------------------------------------
# Corpus-LM quality scoring
# ---------------------------------------------------------------------------

def unigram_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality score: the corpus's own token
    frequencies are the model, each document scores its mean negative
    log-probability, avg_nll = -(1/|d|) Σ ln(count(t)/total). High avg_nll
    = improbable token stream (mojibake, boilerplate codes, wrong-language
    shards) — the classic cheap perplexity proxy for corpus filtering
    (KenLM-style filtering with the LM reduced to unigrams, so it trains in
    one aggregation pass instead of an external toolkit).

    Returns (id, n_tokens, avg_nll). Two shuffles: the vocab count groupBy
    and the token→vocab join (both keyed on the term; vocab is Zipf-skewed
    but the join side is pre-aggregated counts, one row per term, so the
    hot key carries one lookup row, not a bucket). Per-token ln() is
    rounded through DECIMAL(27,9) before the sum — the plans/common.py
    trick that makes the double sum order-insensitive AND absorbs the
    sub-ulp ln() differences between engines, so the score is exactly
    oracle-checkable.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_tf"))
    total = vocab.agg(F.sum("_tf").cast("bigint").alias("_total"))
    nll = F.log(
        F.col("_total").cast("double") / F.col("_tf").cast("double")
    ).cast("decimal(27,9)")
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum(nll).cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def bigram_pairs(df: DataFrame, text_col: str = "text", id_col: str | None = None):
    """Adjacent-token pairs as rows ``(a, b)`` (plus ``id`` when ``id_col``
    is given). The pair list is built JVM-side with transform/sequence over
    the split array — one generated-code pass, no per-token row explosion
    before the single explode of ready-made pairs."""
    cols = [F.col(id_col).alias("id")] if id_col else []
    # Materialize the split ONCE as a column before the lambda: referencing
    # split(text) inside transform() re-splits the string per position
    # (O(len²) per doc — measured 8x slower at sf0.1).
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, so docs under 2
    # tokens need an explicit empty-array guard, not greatest().
    pair = F.explode(
        F.expr(
            "transform(if(size(_tk) >= 2, sequence(1, size(_tk) - 1), array()),"
            " i -> struct(element_at(_tk, i) AS a, element_at(_tk, i + 1) AS b))"
        )
    ).alias("p")
    return (
        df.select(*cols, F.split(F.col(text_col), " ").alias("_tk"))
        .select(*[c for c in ("id",) if id_col], pair)
        .select(*[c for c in ("id",) if id_col], "p.a", "p.b")
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs:
    ``pmi = ln( (n_ab / B) / ((n_a / N) * (n_b / N)) )`` with B = total
    bigrams, N = total unigrams — the collocation statistic behind
    phrase-mining / word2vec-era preprocessing. Returns the ``top_k``
    pairs (a, b, n_ab, lift_q6, pmi) with ``n_ab >= min_count``, ordered by
    (lift_q6 DESC, a, b).

    Engine-exactness: ranking on ``CAST(ln(<double>) AS DECIMAL(27,9))``
    failed the driver gate (CORRECTNESS_r04 x_cooccur_pmi hash mismatch) —
    a 1-ulp libm difference between engines flips a value sitting on a
    0.5e-9 rounding boundary or at the rank-k frontier. The ranking key is
    therefore ``lift_q6 = floor(1e6 * n_ab * N^2 / (B * n_a * n_b))``,
    computed entirely in exact integer/decimal arithmetic (the lift whose
    log IS the PMI; ln is monotone, so the ordering is identical up to the
    deterministic q6 truncation, and ties break on (a, b)). ``pmi`` =
    ln(lift_q6 / 1e6) ships for display but is EXCLUDED from the graded
    projection — only integer-exact columns are hashed.

    Magnitude envelope: numerator n_ab * N^2 * 1e6 must fit DECIMAL(38,0)
    / HUGEINT — safe through N ~ 1e14 total tokens; beyond that, rank on
    the double-ln variant (approximate ordering) or drop the 1e6 scale.

    Scale shape: bigram and unigram tables are both pre-aggregated counts
    before any join, so the two term-keyed joins attach ONE lookup row per
    hot key (Zipf skew is harmless); the final top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    bg = bigram_pairs(df, text_col=text_col)
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    totals = uni.agg(
        F.sum("n_t").cast("bigint").alias("n_uni")
    )
    pairs = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    b_total = pairs.agg(F.sum("n_ab").cast("bigint").alias("n_bg"))
    lift_q6 = F.expr(
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * CAST(n_uni AS DECIMAL(19,0))"
        " * CAST(n_uni AS DECIMAL(19,0)) * 1000000) div"
        " (CAST(n_bg AS DECIMAL(38,0)) * CAST(na AS DECIMAL(19,0))"
        " * CAST(nb AS DECIMAL(19,0))) AS BIGINT)"
    )
    return (
        pairs.filter(F.col("n_ab") >= min_count)
        .join(uni.select(F.col("term").alias("a"), F.col("n_t").alias("na")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("n_t").alias("nb")), "b")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(b_total))
        .select("a", "b", "n_ab", lift_q6.alias("lift_q6"))
        .withColumn(
            "pmi", F.log(F.col("lift_q6").cast("double") / F.lit(1000000.0))
        )
        .orderBy(F.col("lift_q6").desc(), "a", "b")
        .limit(top_k)
    )


def bigram_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model quality score with add-1 smoothing: the corpus
    is its own model, each document scores
    ``avg_nll = -(1/|pairs|) Σ ln( (c(ab)+1) / (c(a)+V) )`` — one Markov
    order above ``unigram_quality``, the next-cheapest KenLM-style
    perplexity proxy. Returns (id, n_bigrams, avg_nll); docs with fewer
    than 2 tokens produce no row (no bigram evidence).

    Same determinism rule as unigram_quality: per-pair ln routed through
    DECIMAL(27,9). Shuffle shape: both model tables are pre-aggregated
    counts, so the (a,b)- and a-keyed joins attach single lookup rows; the
    per-doc sum shuffles on (id), unique per document.
    """
    pairs = bigram_pairs(df, text_col=text_col, id_col=id_col)
    bgc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    v = uni.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    nll = F.log(
        (F.col("c_a") + F.col("v")).cast("double") / (F.col("c_ab") + 1).cast("double")
    ).cast("decimal(27,9)")
    return (
        pairs.join(bgc, ["a", "b"])
        .join(uni.select(F.col("term").alias("a"), "c_a"), "a")
        .crossJoin(F.broadcast(v))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(nll).cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", rounds: int = 3, sep: str = "_"
) -> DataFrame:
    """Distributed BPE tokenizer training, the real merge loop (not just the
    pair statistic): per round, count adjacent symbol pairs across the
    corpus (weighted by word frequency), pick the most frequent pair
    (tie-break lexicographic), and apply the merge leftmost-first
    non-overlapping to every word — exactly Sennrich et al.'s algorithm.
    Returns the learned merge table ``(round, a, b, cnt)``.

    Engine shape, and why it scales:

      * the corpus collapses to the (word, freq) vocabulary FIRST — the
        classic BPE trick; merge rounds then run on a model-sized table,
        not the corpus. At 100 TB the only corpus-wide work is the one
        word-count groupBy.
      * each round is: pair groupBy (map-side combined) → 1-row TakeOrdered
        argmax → broadcast crossJoin + a JVM string-fold applying the
        merge. Lineage truncates per round (``localCheckpoint``), mirroring
        kmeans_fit/pagerank.
      * the merge application is a left fold with a delimited-string
        accumulator — the identical fold runs on DuckDB via list_reduce,
        which is what makes the whole training loop (counts, argmax AND
        merge application) hash-checkable. Precondition: tokens must not
        contain ``sep`` (filtered defensively).
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & (~F.col("w").contains(sep)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = words.select(
        "freq",
        F.expr(
            f"array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
            f" '{sep}')"
        ).alias("sy"),
    ).localCheckpoint()
    pair_expr = (
        f"transform(if(size(split(sy, '{sep}')) >= 2,"
        f"             sequence(1, size(split(sy, '{sep}')) - 1), array()),"
        f" i -> struct(element_at(split(sy, '{sep}'), i) AS a,"
        f"             element_at(split(sy, '{sep}'), i + 1) AS b))"
    )
    fold_expr = (
        f"aggregate(slice(split(sy, '{sep}'), 2, size(split(sy, '{sep}')) - 1),"
        f" element_at(split(sy, '{sep}'), 1),"
        f" (acc, s) -> IF((acc = a OR endswith(acc, concat('{sep}', a))) AND s = b,"
        f"                concat(substring(acc, 1, length(acc) - length(a)), a, b),"
        f"                concat(acc, '{sep}', s)))"
    )
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            syms.select("freq", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .select(F.lit(r).cast("int").alias("round"), "a", "b", "cnt")
            .localCheckpoint()
        )
        merges.append(top)
        syms = (
            syms.crossJoin(F.broadcast(top.select("a", "b")))
            .select("freq", F.expr(fold_expr).alias("sy"))
            .localCheckpoint()
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def median_low_udaf():
    """Arrow-batched GROUPED_AGG pandas UDF: exact LOWER median (selection,
    not interpolation — the result is a real data point, which is what
    keeps a rank-based SQL oracle able to reproduce it bit-for-bit).
    Defined here (not at the call site) because signature inference needs
    ``pd`` resolvable in the module globals under postponed annotations."""

    @pandas_udf("double")
    def median_low(v: pd.Series) -> float:
        s = v.sort_values().reset_index(drop=True)
        return float(s[(len(s) - 1) // 2])

    return median_low


def tfidf_keywords(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF keywords (classic keyword extraction).

    score(d, t) = tf(d,t) * ln(N / df(t)), rounded through DECIMAL(27,9)
    (the unigram_quality trick) so sub-ulp ln() differences between engines
    vanish and ranks are engine-exact; ties break on the term itself.
    Terms present in every document score ln(1)=0 and are dropped — tf-idf's
    built-in stopword suppression.

    Scale shape: tf groupBy keyed on (doc, term); document frequency over
    the pre-aggregated tf table (one row per (doc, term), so a hot term
    contributes df rows, not token occurrences); the join back ships one
    row per term; the top-k window partitions by document (bounded by
    per-doc vocabulary). No driver-side state.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    score = (
        (
            F.col("tf")
            * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
        )
        .cast("decimal(27,9)")
        .cast("double")
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select("id", "term", score.alias("score"))
        .filter(F.col("score") > 0)
        .withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(F.col("id").alias(id_col), "term", "score", "kw_rank")
    )


def maxmatch_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_words: int = 200,
    max_token_len: int = 8,
    max_word_len: int = 16,
    top_k: int = 50,
    max_rounds: int | None = None,
) -> DataFrame:
    """Greedy longest-match-first (MaxMatch / WordPiece-core) subword
    tokenization over the corpus, returning the ``top_k`` (token, total)
    counts. The vocabulary is corpus-derived and deterministic: the
    ``top_words`` most frequent whole words of length <= ``max_token_len``
    (ties broken by the word itself) plus every single character seen — the
    char fallback guarantees one-symbol progress, so tokenization of a word
    terminates in <= ``max_word_len`` rounds.

    The scale trick is MEMOIZATION BY DISTINCT WORD: tokenization runs on
    the (truncated-to-``max_word_len``) distinct-word table, not on corpus
    occurrences — a 100 TB corpus has a bounded word vocabulary, and
    per-document counts come back from one join against the word-count
    table (the same cache trick tokenizer runtimes use per batch, here made
    global). Each greedy round is: explode <= ``max_token_len`` candidate
    prefix lengths, broadcast-join the vocabulary (~top_words + alphabet
    rows), keep MAX(length) per in-flight word — all JVM, no Python. Rounds
    are data-independent in the worst case (``max_word_len``) so a
    fixed-unroll SQL twin is exact; the Spark loop early-exits when every
    word is fully consumed, which cannot change the result (finished words
    leave the state table).
    """
    rounds = max_rounds if max_rounds is not None else max_word_len
    occ = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("w0")
    ).filter(F.col("w0") != "")
    wc = (
        occ.select(F.substring("w0", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    top = (
        wc.filter(F.length("w") <= max_token_len)
        .orderBy(F.col("n").desc(), "w")
        .limit(top_words)
        .select(F.col("w").alias("tok"))
    )
    chars = wc.select(
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
        F.col("w"),
    ).select(F.expr("substring(w, i, 1)").alias("tok")).distinct()
    vocab = top.union(chars).distinct().localCheckpoint()

    states = wc.select("w", F.lit(0).alias("pos"))
    word_tokens = []
    for _ in range(rounds):
        if states.isEmpty():
            break
        cand = (
            states.select(
                "w",
                "pos",
                F.explode(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_token_len), F.length("w") - F.col("pos")),
                    )
                ).alias("L"),
            )
            .withColumn("piece", F.expr("substring(w, pos + 1, L)"))
            .join(F.broadcast(vocab), F.col("piece") == F.col("tok"))
        )
        best = cand.groupBy("w", "pos").agg(F.max("L").alias("best"))
        word_tokens.append(
            best.select(
                "w", F.expr("substring(w, pos + 1, best)").alias("tok")
            ).localCheckpoint()
        )
        states = (
            best.select("w", (F.col("pos") + F.col("best")).alias("pos"))
            .filter(F.col("pos") < F.length("w"))
            .localCheckpoint()
        )
    if not word_tokens:  # empty corpus / no tokenizable words
        return wc.select(
            F.col("w").alias("tok"), F.col("n").alias("total")
        ).limit(0)
    wt = word_tokens[0]
    for part in word_tokens[1:]:
        wt = wt.union(part)
    totals = (
        wt.join(wc, "w")
        .groupBy("tok")
        .agg(F.sum("n").cast("bigint").alias("total"))
        .orderBy(F.col("total").desc(), "tok")
        .limit(top_k)
    )
    return totals


@pandas_udf(T.StringType())
def nfc_normalize(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization (canonical composition) — the first step
    of any web-crawl text-cleaning pipeline: visually-identical strings
    with different combining-mark encodings ('e' + U+0301 vs U+00E9)
    become byte-identical, so every downstream exact/near dedup hash sees
    one canonical form. Arrow-batched (stdlib unicodedata implements
    UAX#15 — the DuckDB oracle's nfc_normalize() agrees codepoint for
    codepoint, which is what x_text_nfc hash-checks). NULL in -> NULL out,
    matching both the oracle's nfc_normalize(NULL) and Spark's own
    string-function convention."""
    import unicodedata

    return texts.map(lambda t: None if t is None else unicodedata.normalize("NFC", t))


def html_strip(col: Column) -> Column:
    """Boilerplate markup removal, entirely JVM-side: drop tags, decode
    the five predefined XML entities, collapse whitespace runs, trim.
    regexp semantics chosen to behave identically under Java regex
    (Spark) and RE2 (DuckDB oracle): no backreferences, no lookaround."""
    s = F.regexp_replace(col, "<[^>]*>", " ")
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    # explicit class, NOT \s: Java's \s includes \x0B (vertical tab) but
    # RE2's does not — the one place the two regex dialects disagree here
    return F.trim(F.regexp_replace(s, "[ \\t\\n\\r\\f\\x0B]+", " "))


def optimal_segment_stats(
    df: DataFrame,
    text_col: str = "text",
    top_words: int = 200,
    max_token_len: int = 8,
    max_word_len: int = 16,
    top_k: int = 200,
) -> DataFrame:
    """OPTIMAL (minimal-piece) subword segmentation — the DP objective of
    unigram/WordPiece tokenizers, next to :func:`maxmatch_token_counts`'s
    greedy heuristic. For each distinct word, computes the MINIMUM number
    of vocabulary pieces that exactly cover it (the same corpus-derived
    vocabulary as MaxMatch: ``top_words`` frequent whole words of length
    <= ``max_token_len``, ties by word, plus every single character — the
    char fallback guarantees a segmentation exists). Returns the ``top_k``
    most frequent words (ties by word) as (w, n_chars, n_pieces, n_occ).

    Implementation is breadth-first shortest path over (word, position)
    run ENTIRELY as DataFrame rounds (no Python in the loop): each round
    explodes candidate piece lengths from the frontier, broadcast-joins
    the vocabulary, and keeps newly reached positions (anti-join against
    visited). The first round that reaches position == len(word) IS the
    minimum — rounds are bounded by ``max_word_len``, so a recursive-CTE
    twin enumerating reachable (word, pos, steps) states and taking
    MIN(steps) is exact. Memoized by distinct word, same 100 TB posture
    as MaxMatch: corpus size only enters through the word-count join.
    """
    occ = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("w0")
    ).filter(F.col("w0") != "")
    wc = (
        occ.select(F.substring("w0", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    top = (
        wc.filter(F.length("w") <= max_token_len)
        .orderBy(F.col("n").desc(), "w")
        .limit(top_words)
        .select(F.col("w").alias("tok"))
    )
    chars = wc.select(
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"), F.col("w")
    ).select(F.expr("substring(w, i, 1)").alias("tok")).distinct()
    vocab = top.union(chars).distinct().localCheckpoint()

    frontier = wc.select("w", F.lit(0).alias("pos"))
    visited = frontier
    done = None
    for step in range(1, max_word_len + 1):
        if frontier.isEmpty():
            break
        nxt = (
            frontier.select(
                "w",
                "pos",
                F.explode(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_token_len), F.length("w") - F.col("pos")),
                    )
                ).alias("L"),
            )
            .withColumn("piece", F.expr("substring(w, pos + 1, L)"))
            .join(F.broadcast(vocab), F.col("piece") == F.col("tok"))
            .select("w", (F.col("pos") + F.col("L")).alias("pos"))
            .distinct()
            .join(visited, ["w", "pos"], "left_anti")
            .localCheckpoint()
        )
        finished = nxt.filter(F.col("pos") == F.length("w")).select(
            "w", F.lit(step).cast("int").alias("n_pieces")
        )
        done = finished if done is None else done.union(finished)
        frontier = nxt.filter(F.col("pos") < F.length("w"))
        visited = visited.union(nxt).localCheckpoint()
    if done is None:
        return wc.select(
            "w",
            F.length("w").cast("int").alias("n_chars"),
            F.lit(0).cast("int").alias("n_pieces"),
            F.col("n").alias("n_occ"),
        ).limit(0)
    return (
        done.join(wc, "w")
        .select(
            "w",
            F.length("w").cast("int").alias("n_chars"),
            "n_pieces",
            F.col("n").alias("n_occ"),
        )
        .orderBy(F.col("n_occ").desc(), "w")
        .limit(top_k)
    )


@pandas_udf(T.DoubleType())
def compression_ratio(texts: pd.Series) -> pd.Series:
    """zlib-compressed size over raw size — the CCNet/Gopher-family
    "compressibility" quality signal: highly repetitive boilerplate and
    template spam compress far below natural prose (ratio < ~0.3 on web
    text is a strong junk indicator), while random noise refuses to
    compress (ratio near 1). Arrow-batched; fixed zlib level 6 so the
    score is deterministic per zlib build. NULL in -> NULL out; empty
    text -> NULL (a 0-byte doc has no meaningful ratio).

    No cross-engine oracle exists (DuckDB has no zlib expression), so the
    signal is pytest-gated like the streaming sinks; downstream
    filter/aggregate plumbing stays inside the oracle-checked quality
    chain."""
    import zlib

    def ratio(t):
        if t is None or len(t) == 0:
            return None
        raw = t.encode("utf-8")
        return len(zlib.compress(raw, 6)) / len(raw)

    return texts.map(ratio)


def unigram_lm_stats(
    df: DataFrame,
    text_col: str = "text",
    top_words: int = 150,
    top_pieces: int = 300,
    max_piece_len: int = 4,
    max_word_len: int = 12,
) -> DataFrame:
    """SentencePiece-style UNIGRAM-LM tokenizer fit + Viterbi evaluation —
    the probabilistic member of the tokenizer family (BPE = merge-based,
    MaxMatch = greedy longest-first, optimal_segment_stats = minimal-piece;
    unigram-LM = maximum-likelihood segmentation under piece log-probs).

    Fit (the corpus-scale half, fully distributed):

      * word counts over lowercase alnum tokens (words truncated to
        ``max_word_len``) — one shuffle;
      * seed piece counts: every substring of length <= ``max_piece_len``
        of every DISTINCT word, weighted by the word's occurrence count
        (overlapping occurrences counted) — memoized by distinct word,
        so corpus size enters only through the word-count join;
      * vocabulary = ALL single characters (the fallback that guarantees
        a segmentation exists) + the ``top_pieces`` most frequent longer
        pieces (ties by piece); piece score = ln(count/total) rounded
        through DECIMAL(27,9) IN-ENGINE (the plans/common.py libm rule —
        both engines compute their own ln, the rounding absorbs the ulp).

    Evaluate (the model-sized half, driver-side): for the ``top_words``
    most frequent words, the Viterbi-best segmentation under the
    lexicographic objective (max total score, tie -> fewest pieces) via
    exact ``decimal.Decimal`` DP — decimal sums are order-free, so the
    best (score, n_pieces) VALUE is unique regardless of which optimal
    path realizes it, which is what makes the SQL twin (bounded
    recursive-CTE path enumeration, exact decimal sums, argmax) land on
    identical values with no path-tiebreak hazard.

    Returns (w, n_occ, n_pieces, score_e9) — score in exact 1e-9 units
    (BIGINT), the driver-representable projection of the decimal sum.
    Scale posture: the only driver-side materializations are the
    vocabulary (<= top_pieces + alphabet) and the graded word list —
    model-sized, the kmeans_fit/pca posture.
    """
    from decimal import Decimal

    occ = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("w0")
    ).filter(F.col("w0") != "")
    wc = (
        occ.select(F.substring("w0", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    pieces = (
        wc.select(
            "w", "n", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i")
        )
        .select(
            "w", "n", "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - F.col("i") + 1),
                )
            ).alias("l"),
        )
        .select(F.expr("substring(w, i, l)").alias("p"), "n")
        .groupBy("p")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    chars = pieces.filter(F.length("p") == 1)
    multi = (
        pieces.filter(F.length("p") >= 2)
        .orderBy(F.col("cnt").desc(), "p")
        .limit(top_pieces)
    )
    vocab = chars.unionByName(multi)
    total = vocab.groupBy().agg(F.sum("cnt").cast("bigint").alias("t"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "p",
        F.log(F.col("cnt").cast("double") / F.col("t").cast("double"))
        .cast("decimal(27,9)")
        .alias("s"),
    )
    model = {r["p"]: Decimal(r["s"]) for r in scored.collect()}
    top = (
        wc.orderBy(F.col("n").desc(), "w").limit(top_words).collect()
    )
    rows = []
    for r in top:
        w, n_occ = r["w"], int(r["n"])
        best: dict[int, tuple[Decimal, int]] = {0: (Decimal(0), 0)}
        for pos in range(1, len(w) + 1):
            cands = []
            for ln_ in range(1, min(max_piece_len, pos) + 1):
                piece = w[pos - ln_ : pos]
                prev = best.get(pos - ln_)
                if prev is not None and piece in model:
                    cands.append((prev[0] + model[piece], -(prev[1] + 1)))
            if cands:
                s, negk = max(cands)
                best[pos] = (s, -negk)
        score, k = best[len(w)]
        rows.append((w, n_occ, k, int(score.scaleb(9))))
    from flnr_wins_spark.localrel import local_df

    return local_df(
        df.sparkSession, rows, "w string, n_occ bigint, n_pieces int, score_e9 bigint"
    )
