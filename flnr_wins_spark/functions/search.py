"""Keyword retrieval: inverted-index postings + BM25 ranking.

The reference engine has no text-retrieval surface (its 319-line ETL at
/root/reference/src/wins_transform_staging.py is attribute joins only); this
module adds the search primitive a training-data pipeline needs for corpus
triage ("find the docs about X") — expressed as plain DataFrame ops so
Catalyst keeps the whole plan in codegen.

Scale shape (100 TB corpus, Q query terms):

  * one-shot retrieval (``bm25_topk``) computes doc length and per-term tf
    as ARRAY functions in the scan projection — the corpus is tokenized
    once and NO token-level row ever reaches an exchange; only matching
    (doc_id, term, tf, dl) rows are exploded for scoring;
  * index builds explode postings NARROW (no shuffle) and pre-aggregate to
    (term, doc_id, tf) with map-side combine before any exchange;
  * document-frequency and corpus stats aggregate to model-sized frames and
    broadcast;
  * in a standing deployment, doc lengths / avgdl / df are corpus metadata
    you materialize once per snapshot and reuse per query — the dataflow here
    recomputes them inline so a single call is self-contained.

Determinism contract (plans/common.py): IEEE +,-,*,/ are correctly rounded,
so identically-parenthesized expressions match DuckDB bit-for-bit; ln() may
differ by 1 ulp across libm implementations, so per-term scores round through
DECIMAL(27,9) before the per-doc sum (also making the sum order-insensitive).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens of a text column (empties dropped)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index postings: one (term, doc_id, tf) row per distinct term
    per document. One shuffle (groupBy term+doc with map-side combine)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    unpersist: bool = False,
) -> DataFrame:
    """BM25 top-k document retrieval (Robertson/Sparck Jones probabilistic
    weighting, the Lucene-default `+1` idf variant so weights stay positive).
    Returns (doc_id, score, rank), rank 1..k by descending score.

    Corpus stats (N, avgdl) are over documents with >=1 token. Scoring:

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        tfn(t,d)= tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
        score   = sum_t idf(t) * tfn(t,d)       (decimal-routed, see module)

    ``unpersist=True`` eagerly materializes the (k-row) result and releases
    the internal per-doc cache before returning — the right mode for
    multi-corpus loops, which otherwise accumulate one session-lifetime
    cached table per corpus (same convention as
    ``operators.dedup.minhash_lsh_pairs``).

    Shuffle shape: ``dl`` and each query term's ``tf`` are computed IN THE
    SCAN PROJECTION with array functions (size/filter over the token
    array), so the corpus is tokenized ONCE and no token-level row ever
    reaches an exchange — the old explode → groupBy(doc) / groupBy(doc,
    term) pair of token-volume shuffles is gone entirely. Only the narrow
    (doc_id, dl, tf…) per-doc frame persists; matching docs explode ≤ Q
    struct rows each for the scoring join. Values are identical to the
    exploded form: size(filter(tokens, t = term)) IS the occurrence count
    and size(tokens) IS the doc length.
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        # F.array() of zero term structs is array<void>, which fails at
        # analysis when '_t.term' is extracted — return the empty result the
        # old isin([]) path produced (doc_id keeps the input's type)
        return (
            docs.select(F.col(id_col).alias("doc_id"))
            .filter(F.lit(False))
            .withColumn("score", F.lit(0.0))
            .withColumn("rank", F.lit(0).cast("bigint"))
        )
    tk = tokens(F.col(text_col))
    per_doc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tk).cast("bigint").alias("dl"),
            F.array(
                *[
                    F.struct(
                        F.lit(t_).alias("term"),
                        F.size(F.filter(tk, lambda x: x == F.lit(t_)))
                        .cast("bigint")
                        .alias("tf"),
                    )
                    for t_ in terms
                ]
            ).alias("_tfs"),
        )
        # docs whose token list is empty (or NULL text: size(null) = -1)
        # never reached the exploded doclen either
        .filter(F.col("dl") >= 1)
        .persist()
    )
    stats = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode("_tfs").alias("_t"))
        .select("doc_id", "dl", F.col("_t.term").alias("term"), F.col("_t.tf").alias("tf"))
        .filter(F.col("tf") >= 1)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    joined = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    out = _bm25_rank(joined, k, k1, b)
    if unpersist:
        out = out.localCheckpoint(eager=True)
        per_doc.unpersist()
    return out


def _bm25_score_topk(
    tf: DataFrame, doclen: DataFrame, stats: DataFrame, k: int, k1: float, b: float
) -> DataFrame:
    """Shared BM25 scorer: ``tf`` is already filtered to the query terms
    (one (doc_id, term, tf) row per hit), ``doclen``/``stats`` are the
    corpus-side index tables. df is derived from ``tf`` (count of docs per
    surviving term — identical to the full-index df for those terms).
    Identical math whether the index is freshly tokenized or loaded from a
    persisted snapshot, which is what lets the persisted-index entry share
    the fresh-build oracle verbatim."""
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return _bm25_rank(joined, k, k1, b)


def _bm25_rank(joined: DataFrame, k: int, k1: float, b: float) -> DataFrame:
    """BM25 ranking over per-hit rows already carrying
    (doc_id, tf, df, dl, n_docs, avgdl) — the one set of score expressions
    shared by every entry path, so fresh-build, array-projected and
    persisted-index retrieval stay bit-identical."""
    idf = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))))
    )
    scored = (
        joined.select("doc_id", (idf * tfn).alias("_s"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("_s").cast("decimal(27,9)")).cast("double").alias("score"))
    )
    # TakeOrderedAndProject does the global top-k (per-partition heaps, no
    # single-partition sort barrier); the rank window then sees only k rows.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def build_bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three tables a persisted BM25 index needs: postings
    (term, doc_id, tf), doclen (doc_id, dl), stats (n_docs, sum_dl,
    avgdl — one row; sum_dl is the exact bigint token total so
    :func:`merge_bm25_index` can merge stats without re-aggregating
    doclen). Build once per corpus version, snapshot each through
    ``sources.snapshots.write_snapshot``, and serve every later query from
    the loaded tables with :func:`bm25_topk_from_index` — tokenization
    cost is paid once per corpus, not once per query. One tokenize scan
    feeds all three aggregates."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    doclen = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    stats = doclen.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    postings = (
        toks.groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    return postings, doclen, stats


def merge_bm25_index(
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """INCREMENTAL index maintenance: tokenize only ``new_docs`` (doc ids
    must be new — re-indexing an existing id is a delete+add the caller
    performs upstream) and merge into the existing index. Postings and
    doclen append (disjoint ids, no join); stats merge from the two
    one-row stats frames via exact bigint sums, so n_docs/sum_dl/avgdl
    are BIT-IDENTICAL to a from-scratch build over the union — indexing
    cost per refresh is O(new docs), never O(corpus). Snapshot the merged
    tables to version the index."""
    np_, nd, ns = build_bm25_index(new_docs, text_col, id_col)
    both = stats.select("n_docs", "sum_dl").unionByName(
        ns.select("n_docs", "sum_dl")
    )
    merged_stats = both.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    ).select(
        "n_docs",
        "sum_dl",
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    return (
        postings.unionByName(np_),
        doclen.unionByName(nd),
        merged_stats,
    )


def bm25_topk_from_index(
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served from a prebuilt (usually snapshot-loaded) index —
    same scoring as :func:`bm25_topk` (shared ``_bm25_score_topk``), so
    probe-over-loaded-index == probe-over-fresh-build exactly. The postings
    filter to the query terms reaches the parquet scan as a pushed IN
    predicate: a query touches the handful of matching postings row
    groups, never the whole index."""
    tf = postings.filter(F.col("term").isin(list(query_terms))).select(
        "doc_id", "term", "tf"
    )
    return _bm25_score_topk(tf, doclen, stats, k, k1, b)


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted-index postings: one (term, doc_id, pos) row per
    token occurrence (0-based position). The narrow explode shuffles
    nothing by itself; downstream consumers filter to their query terms
    BEFORE any exchange."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over positional postings: returns
    ``(doc_id, n_hits)`` for documents containing the k query terms at
    consecutive positions, with ``n_hits`` = number of distinct start
    positions — the classic positional-index phrase-AND plan.

    Scale shape: postings are filtered to the k phrase terms while still
    narrow (predicate reaches the scan side of every exchange), then the
    k per-term streams equi-join on ``(doc_id, pos - i)`` — each join key
    is unique per occurrence, so no hot keys; corpus rows that don't
    contain every phrase term never survive the first inner join. The
    per-doc count is one map-side-combinable groupBy.
    """
    assert len(phrase) >= 2, "phrase needs at least two terms"
    post = positional_postings(docs, text_col=text_col, id_col=id_col).filter(
        F.col("term").isin(list(phrase))
    )
    acc = (
        post.filter(F.col("term") == phrase[0])
        .select("doc_id", F.col("pos").alias("start"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = post.filter(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        acc = acc.join(nxt, ["doc_id", "start"])
    return acc.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (the standard
    hybrid-search combiner): each system contributes ``1/(c + rank)`` for
    the documents it returned, fused score = the sum. Returns
    ``(doc_id, rrf, n_systems, rank)``, top ``k`` by fused score with a
    doc_id tiebreak.

    Rank-only fusion means the systems' score scales never need
    calibration — exactly why RRF is the default lexical+dense combiner.
    Per-system contributions round through DECIMAL(27,12) before the sum
    (three+ doubles would otherwise sum order-dependently). Each input is
    already k-bounded, so everything here is result-sized; the fuse is a
    single tiny groupBy + TakeOrdered.
    """
    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col)))
            .cast("decimal(27,12)")
            .alias("_contrib"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("doc_id").agg(
        F.sum("_contrib").cast("double").alias("rrf"),
        F.count(F.lit(1)).cast("bigint").alias("n_systems"),
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def cross_rerank(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    w_overlap: float = 1.0,
    w_idf: float = 0.2,
    w_phrase: float = 0.5,
    q_id: str = "query_id",
    q_text_col: str = "q_text",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-encoder-STYLE second-stage reranker: first-stage candidates
    (term-overlap recall, ``n_candidates`` per query) are re-scored on
    JOINT query-document interaction features — the retrieve-then-rerank
    posture every production search/RAG stack uses (BM25/ANN recall is
    cheap per doc; the expensive pair scorer only ever sees k-bounded
    candidates).

    The scorer is a linear model over three interaction features (a
    deterministic stand-in for a learned cross-encoder — a real one slots
    into the same dataflow as an Arrow-batched pandas_udf with broadcast
    weights; this engine ships the feature plumbing and keeps the scorer
    oracle-exact):

      * ``overlap``  — |q_terms ∩ d_terms| / |q_terms|  (exact rational);
      * ``idf``      — sum of ln(N/df) over the shared terms, df counted
        over the full corpus but only for QUERY vocabulary (query-sized,
        broadcast); per-term ln rounds through DECIMAL(27,9) (libm-ulp
        rule) and the sum is order-insensitive;
      * ``phrase``   — how many query word-bigrams appear verbatim in the
        raw document text (substring containment — the adjacency signal
        bag-of-words retrieval loses).

    score = w_overlap*overlap + w_idf*idf + w_phrase*phrase, fixed
    parenthesization, engine-exact. Returns (query_id, doc_id, score,
    rank) with rank 1..k per query.

    Scale shape: queries broadcast everywhere (Q rows); the one corpus
    pass computes distinct-token arrays; candidate generation is a
    broadcast nested-loop against the tiny query side filtered to
    shared>=1 then a per-query k-bounded window; feature joins touch only
    candidate rows. At 100 TB swap the self-contained first stage for
    bm25_topk / ANN postings — the reranker half is unchanged.
    """
    qt = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_text_col).alias("_qtext"),
        F.array_distinct(tokens(F.col(q_text_col))).alias("_qt"),
    )
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_dtext"),
        F.array_distinct(tokens(F.col(text_col))).alias("_dt"),
    )
    pairs = dt.join(F.broadcast(qt), F.expr("size(array_intersect(_dt, _qt)) >= 1"))
    shared = F.size(F.array_intersect(F.col("_dt"), F.col("_qt")))
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("_shared").desc(), F.col("doc_id")
    )
    cand = (
        pairs.select("query_id", "doc_id", "_qtext", "_qt", "_dt", "_dtext",
                     shared.alias("_shared"))
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= n_candidates)
    )
    # document frequency over the FULL corpus, restricted to query
    # vocabulary (query-sized result -> broadcast); N = corpus size
    qterms = qt.select(F.explode("_qt").alias("term")).distinct()
    dfreq = (
        dt.select("doc_id", F.explode("_dt").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    ndocs = dt.groupBy().agg(F.count("*").cast("bigint").alias("n"))
    idf_terms = (
        cand.select(
            "query_id", "doc_id",
            F.explode(F.array_intersect(F.col("_dt"), F.col("_qt"))).alias("term"),
        )
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(ndocs))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(F.col("n").cast("double") / F.col("df").cast("double"))
                .cast("decimal(27,9)")
            )
            .cast("double")
            .alias("_fidf")
        )
    )
    # guarded: Spark's sequence(1, 0) is DESCENDING [1, 0] (the
    # quality_rules trap) — a one-word query must yield an empty bigram
    # list, not an element_at(arr, 0) error
    bigrams = F.expr(
        "IF(size(split(_qtext, ' ')) < 2, CAST(array() AS array<string>),"
        " transform(sequence(1, size(split(_qtext, ' ')) - 1),"
        " i -> concat(element_at(split(_qtext, ' '), CAST(i AS INT)), ' ',"
        " element_at(split(_qtext, ' '), CAST(i + 1 AS INT)))))"
    )
    fphrase = F.size(
        F.filter(bigrams, lambda bg: F.instr(F.col("_dtext"), bg) > 0)
    ).cast("double")
    foverlap = F.col("_shared").cast("double") / F.size(F.col("_qt")).cast("double")
    feats = cand.join(idf_terms, ["query_id", "doc_id"]).select(
        "query_id", "doc_id",
        foverlap.alias("_fov"),
        F.col("_fidf"),
        fphrase.alias("_fph"),
    )
    score = (
        (F.lit(w_overlap) * F.col("_fov"))
        + (F.lit(w_idf) * F.col("_fidf"))
    ) + (F.lit(w_phrase) * F.col("_fph"))
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        feats.select("query_id", "doc_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ranking_metrics(
    results: DataFrame,
    labels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Offline evaluation of a retrieval ranking — the metrics every
    search/RAG stack is tuned against, computed exactly:

      * ``recall_k``  — relevant found in the top k / total relevant
        (exact rational);
      * ``mrr``       — 1 / rank of the first relevant hit (exact
        rational; 0.0 when no hit);
      * ``ndcg``      — DCG@k / ideal-DCG@k with binary gains
        ``1/log2(rank+1)``; each per-rank gain rounds through
        DECIMAL(20,9) (log2 is libm — the plans/common.py rule), the two
        sums are exact decimals, and the final division is one
        correctly-rounded double op — engine-identical.

    ``results`` carries (query, candidate, rank 1..n) from any retriever;
    ``labels`` carries (query, candidate) pairs judged RELEVANT (binary
    qrels). Queries present in ``results`` but with zero relevant labels
    are dropped (their metrics are undefined — the TREC convention).

    Returns one row per query: (query_id, n_rel, hits_k, recall_k, mrr,
    dcg_e9, ideal_e9, ndcg). DCG sums surface as exact 1e-9 BIGINT units
    (driver-representable), ndcg as the double ratio.

    Scale shape: one broadcast-sized join of the k-bounded results
    against the qrels, two per-query aggregates — result-sized, never
    corpus-sized.
    """
    res = results.select(
        F.col(query_col).alias("q"),
        F.col(cand_col).alias("c"),
        F.col(rank_col).cast("bigint").alias("r"),
    ).filter(F.col("r") <= k)
    lab = labels.select(
        F.col(query_col).alias("q"), F.col(cand_col).alias("c")
    ).distinct()
    n_rel = lab.groupBy("q").agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    gain = F.lit(1.0) / F.log2(F.col("r").cast("double") + F.lit(1.0))
    hits = (
        res.join(lab, ["q", "c"])
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("hits_k"),
            F.min("r").alias("first_r"),
            F.sum(gain.cast("decimal(20,9)")).alias("dcg"),
        )
    )
    # ideal DCG@k: the best achievable ordering packs relevant docs into
    # ranks 1..min(k, n_rel) — a pure function of n_rel, computed by
    # exploding that tiny per-query range (never the corpus)
    ideal = (
        n_rel.select(
            "q", "n_rel",
            F.explode(
                F.sequence(F.lit(1), F.least(F.lit(k).cast("bigint"), F.col("n_rel")))
            ).alias("r"),
        )
        .select(
            "q", "n_rel",
            (F.lit(1.0) / F.log2(F.col("r").cast("double") + F.lit(1.0)))
            .cast("decimal(20,9)")
            .alias("g"),
        )
        .groupBy("q", "n_rel")
        .agg(F.sum("g").alias("idcg"))
    )
    return (
        ideal.join(hits, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_rel",
            F.coalesce("hits_k", F.lit(0)).cast("bigint").alias("hits_k"),
            (
                F.coalesce("hits_k", F.lit(0)).cast("double")
                / F.col("n_rel").cast("double")
            ).alias("recall_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_r").cast("double"), F.lit(0.0)
            ).alias("mrr"),
            F.coalesce((F.col("dcg") * F.lit(1_000_000_000)).cast("bigint"), F.lit(0))
            .alias("dcg_e9"),
            (F.col("idcg") * F.lit(1_000_000_000)).cast("bigint").alias("ideal_e9"),
            (
                F.coalesce(F.col("dcg"), F.lit(0).cast("decimal(20,9)")).cast("double")
                / F.col("idcg").cast("double")
            ).alias("ndcg"),
        )
    )
