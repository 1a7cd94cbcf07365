"""Tests for LLM-data-pipeline extension operators: dedup, similarity,
text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    normalize_text,
    shingle_sets,
    simhash_pairs,
    simhash_signatures,
)
from flnr_wins_spark.functions.vectors import ann_lsh_topk, brute_force_topk
from flnr_wins_spark.functions.multimodal import extract_features, to_media_table
from flnr_wins_spark.functions.text import text_profile


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),       # exact dup of 1
            (3, "THE  Quick Brown fox jumps over the lazy dog"),      # dup after normalize
            (4, "the quick brown fox jumps over the lazy cat today"), # near dup
            (5, "completely different words here nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )


class TestExactDedup:
    def test_keeps_lowest_id(self, spark, docs):
        kept = exact_dedup(docs, "text", "doc_id")
        got = {r.doc_id: r.n_copies for r in kept.collect()}
        assert got == {1: 2, 3: 1, 4: 1, 5: 1}

    def test_normalized(self, spark, docs):
        kept = exact_dedup(docs, "text", "doc_id", normalize=True)
        got = {r.doc_id: r.n_copies for r in kept.collect()}
        assert got == {1: 3, 4: 1, 5: 1}


class TestJaccard:
    def test_shingles(self, spark, docs):
        sh = shingle_sets(docs.filter("doc_id = 1"), "text", "doc_id", n=3)
        shingles = {r.shingle for r in sh.collect()}
        assert "the quick brown" in shingles and len(shingles) == 7

    def test_near_dup_pairs(self, spark, docs):
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 4) in pairs and 0.5 <= pairs[(1, 4)] < 1.0
        assert all(5 not in p for p in pairs)

    def test_stop_shingle_cap(self, spark, docs):
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        # cap=1 removes every shared shingle -> no pairs survive
        assert jaccard_pairs(sh, 0.1, max_shingle_freq=1).count() == 0

    def test_default_cap_bounds_pathological_cluster(self, spark):
        """A 300-identical-doc cluster's every shingle has freq 300 > the
        default cap of 256, so the default configuration emits ZERO pairs
        for it (bounded) while an organic near-dup cluster whose shingles
        sit under the cap keeps all its pairs."""
        from flnr_wins_spark.operators.dedup import stop_shingle_count

        mega = [(i, "spam spam spam wonderful spam lovely spam egg and spam")
                for i in range(300)]
        near = [
            (1000, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1001, "alpha beta gamma delta epsilon zeta eta theta kappa"),
        ]
        docs = spark.createDataFrame(mega + near, "doc_id long, text string")
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        got = {(r.id_a, r.id_b) for r in jaccard_pairs(sh, 0.5).collect()}
        assert got == {(1000, 1001)}  # megacluster contributed nothing
        audit = stop_shingle_count(sh, 256).collect()[0]
        assert audit.dropped_shingles == 8  # the mega-doc's distinct shingles
        assert audit.dropped_occurrences == 8 * 300


class TestMinHashLSH:
    def test_matches_exact_pairs(self, spark, docs):
        got = {(r.id_a, r.id_b) for r in
               minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        want = {(r.id_a, r.id_b) for r in jaccard_pairs(sh, 0.5).collect()}
        assert got == want and (1, 2) in got

    def test_bucket_width_cap_trims_pathological_cluster(self, spark):
        """A K-identical-doc megacluster makes every one of its LSH buckets K
        wide and the band self-join K^2. The cap must drop those buckets (the
        cluster is exact-dup territory anyway) while an organic near-dup
        cluster below the cap keeps all its pairs."""
        mega = [(i, "spam spam spam wonderful spam lovely spam egg and spam") for i in range(300)]
        near = [
            (1000, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1001, "alpha beta gamma delta epsilon zeta eta theta kappa"),
            (1002, "alpha beta gamma delta epsilon zeta eta theta mu"),
        ]
        docs = spark.createDataFrame(mega + near, "doc_id long, text string")
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.5, max_bucket_width=32
        ).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        # the 300-doc cluster (300*299/2 = 44850 pairs uncapped) is gone...
        assert not any(a < 1000 for a, _ in got)
        # ...while the organic cluster's pairs all survive
        assert {(1000, 1001), (1000, 1002), (1001, 1002)} <= got

    def test_md5_hash_mode_matches_xxhash64(self, spark, docs):
        """The engine-portable md5 hash mode changes only candidate
        GENERATION; exact verification means both modes converge to the same
        verified pair set on a corpus whose near-dups all collide in >= 1
        band (overwhelmingly likely at 16 tables)."""
        xx = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
              minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
        md = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
              minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                hash_fn="md5").collect()}
        assert xx == md and md

    def test_bad_hash_fn_rejected(self, spark, docs):
        with pytest.raises(ValueError):
            minhash_lsh_pairs(docs, "text", "doc_id", hash_fn="sha999")

    def test_bucket_width_cap_default_off(self, spark, docs):
        got = {(r.id_a, r.id_b) for r in
               minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                 max_bucket_width=None).collect()}
        assert (1, 2) in got

    def test_band_width_and_amplification(self, spark, docs):
        """band_width=2 AND-folds pairs of min-hashes into each band key:
        the candidate set shrinks (strictly fewer false positives on a
        shared-vocab corpus) but the VERIFIED output is identical — exact
        Jaccard verification makes the banding dial output-invariant."""
        from flnr_wins_spark.operators.dedup import (
            minhash_bands,
            minhash_signature_table,
        )

        r1 = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
              minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
        r2 = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
              minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                band_width=2).collect()}
        assert r1 == r2 and r2
        # the r=2 signature is 16 band keys (same shape), each the xxhash64
        # fold of 2 min-hashes — NOT equal to the r=1 signature values
        s1 = minhash_signature_table(docs, "text", "doc_id").select("sig")
        s2 = minhash_signature_table(
            docs, "text", "doc_id", band_width=2
        ).select("sig")
        assert s1.first().sig != s2.first().sig
        assert len(s2.first().sig) == 16
        # banding explodes to the same (id, band) key space either way
        assert minhash_bands(
            minhash_signature_table(docs, "text", "doc_id", band_width=2)
        ).groupBy("band").count().count() == 16

    def test_band_width_requires_xxhash64(self, spark, docs):
        with pytest.raises(ValueError):
            minhash_lsh_pairs(docs, "text", "doc_id", hash_fn="md5",
                              band_width=2)
        with pytest.raises(ValueError):
            minhash_lsh_pairs(docs, "text", "doc_id", band_width=0)

    def test_unpersist_releases_signature_cache(self, spark, docs):
        """A multi-corpus loop with ``unpersist=True`` must not accumulate
        corpus-sized signature caches: each call may leave at most its tiny
        checkpointed pairs result behind, never the MEMORY_AND_DISK
        signature table (which the lazy default keeps for the session)."""
        jsc = spark.sparkContext._jsc
        base = set(jsc.getPersistentRDDs().keySet().toArray())
        results = []
        for _ in range(2):
            out = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                    unpersist=True)
            results.append({(r.id_a, r.id_b) for r in out.collect()})
        after = set(jsc.getPersistentRDDs().keySet().toArray())
        # <= 1 new persisted RDD per call (the checkpointed pairs); the
        # signature cache itself was registered AND released inside each call
        assert len(after - base) <= 2
        assert results[0] == results[1] and (1, 2) in results[0]


class TestSpanDedup:
    def test_repeated_span_kept_only_in_first_doc(self, spark):
        from flnr_wins_spark.operators.dedup import span_dedup

        boiler = "a b c d"  # k=4 -> one full boilerplate segment
        df = spark.createDataFrame(
            [
                (1, boiler + " u1 u2 u3 u4"),
                (2, boiler + " v1 v2 v3 v4"),
                (3, "w1 w2 w3 w4 " + boiler),
            ],
            "doc_id long, text string",
        )
        out = {r.id: r for r in span_dedup(df, "text", "doc_id", k=4).collect()}
        assert out[1].text_clean == boiler + " u1 u2 u3 u4"
        assert out[2].text_clean == "v1 v2 v3 v4"  # boilerplate span removed
        assert out[3].text_clean == "w1 w2 w3 w4"
        assert out[2].n_segments == 2 and out[2].n_kept == 1

    def test_fully_duplicated_doc_survives_empty(self, spark):
        from flnr_wins_spark.operators.dedup import span_dedup

        df = spark.createDataFrame(
            [(1, "x1 x2 x3 x4"), (2, "x1 x2 x3 x4")], "doc_id long, text string"
        )
        out = {r.id: r for r in span_dedup(df, "text", "doc_id", k=4).collect()}
        assert out[1].text_clean == "x1 x2 x3 x4"
        assert out[2].text_clean == "" and out[2].n_kept == 0

    def test_tail_segment_shorter_than_k(self, spark):
        from flnr_wins_spark.operators.dedup import span_dedup

        df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        row = span_dedup(df, "text", "doc_id", k=4).collect()[0]
        assert row.text_clean == "a b c d e" and row.n_segments == 2


class TestUrlFilter:
    @pytest.fixture()
    def urls(self, spark):
        return spark.createDataFrame(
            [
                (1, "https://www.good.example.org/page"),
                (2, "https://Bad.Spam.COM:8080/x?q=1"),
                (3, "http://user:pw@sub.spam.com/y"),
                (4, "ftp://files.archive.net/z"),
                (5, "no-scheme-here/path"),
                (6, "https://localhost/admin"),
            ],
            "doc_id long, url string",
        )

    def test_host_and_domain_extraction(self, spark, urls):
        from flnr_wins_spark.functions.urls import with_url_parts

        got = {r.doc_id: (r.host, r.domain) for r in with_url_parts(urls, "url").collect()}
        assert got[1] == ("www.good.example.org", "example.org")
        assert got[2] == ("bad.spam.com", "spam.com")    # port stripped, lowercased
        assert got[3] == ("sub.spam.com", "spam.com")    # userinfo stripped
        assert got[4] == ("files.archive.net", "archive.net")
        assert got[5] == ("", "")                        # no scheme -> empty host
        assert got[6] == ("localhost", "localhost")      # single label passthrough

    def test_blocklist_split(self, spark, urls):
        from flnr_wins_spark.functions.urls import domain_blocklist_filter

        kept = domain_blocklist_filter(urls, "url", ["SPAM.com"])
        rejected = domain_blocklist_filter(urls, "url", ["SPAM.com"], mode="rejected")
        assert {r.doc_id for r in kept.collect()} == {1, 4, 5, 6}
        assert {r.doc_id for r in rejected.collect()} == {2, 3}

    def test_blocklist_broadcast_plan(self, spark, urls):
        from flnr_wins_spark.functions.urls import domain_blocklist_filter

        plan = domain_blocklist_filter(urls, "url", ["spam.com"])._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestSimHash:
    def test_exact_dups_distance_zero(self, spark, docs):
        sigs = simhash_signatures(docs, "text", "doc_id")
        pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(sigs, 8).collect()}
        assert pairs.get((1, 2)) == 0          # identical bags -> identical signature
        assert (1, 5) not in pairs             # unrelated docs nowhere close

    def test_signature_deterministic(self, spark, docs):
        s1 = {r.id: r.simhash for r in simhash_signatures(docs, "text", "doc_id").collect()}
        s2 = {r.id: r.simhash for r in simhash_signatures(docs, "text", "doc_id").collect()}
        assert s1 == s2


@pytest.fixture()
def vectors(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),    # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.9, 0.1]),    # closest to 2
            (4, [-1.0, 0.0, 0.0]),   # opposite of 0
        ],
        "vec_id long, embedding array<double>",
    )


class TestSimilarity:
    def test_brute_force_topk(self, spark, vectors):
        q = vectors.filter("vec_id in (0, 2)")
        out = brute_force_topk(q, vectors, k=2)
        top = {(r.query_id, r.rank): r.cand_id for r in out.collect()}
        assert top[(0, 1)] == 1 and top[(2, 1)] == 3
        got0 = [r for r in out.collect() if r.query_id == 0]
        assert all(r.cand_id != 0 for r in got0)  # self excluded

    def test_ann_lsh_finds_near_neighbor(self, spark, vectors):
        q = vectors.filter("vec_id = 0")
        out = ann_lsh_topk(q, vectors, dim=3, k=2, bits=8, bands=4)
        got = [r.cand_id for r in out.orderBy("rank").collect()]
        # ANN: must surface the true nearest (1 shares most sign buckets);
        # opposite vector must not rank first
        assert got and got[0] == 1

    def test_ivf_probes_find_near_neighbor(self, spark, vectors):
        from flnr_wins_spark.functions.vectors import ivf_topk

        q = vectors.filter("vec_id in (0, 2)")
        # nlist=5 -> every vector is its own cell; nprobe=3 covers the
        # true-neighbor cell for both queries
        out = ivf_topk(q, vectors, nlist=5, nprobe=3, k=2)
        top = {(r.query_id, r.rank): r.cand_id for r in out.collect()}
        assert top[(0, 1)] == 1 and top[(2, 1)] == 3

    def test_ivf_excludes_self(self, spark, vectors):
        from flnr_wins_spark.functions.vectors import ivf_topk

        out = ivf_topk(vectors, vectors, nlist=3, nprobe=2, k=3)
        assert all(r.query_id != r.cand_id for r in out.collect())


class TestKMeans:
    @pytest.fixture()
    def blobs(self, spark):
        # two tight clusters around (10,0) and (0,10), 20 points each
        rows = [(i, [10.0 + (i % 5) * 0.1, (i % 4) * 0.1]) for i in range(20)]
        rows += [(100 + i, [(i % 5) * 0.1, 10.0 + (i % 4) * 0.1]) for i in range(20)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_exactly_k_centroids_deterministic(self, spark, blobs):
        from flnr_wins_spark.functions.vectors import kmeans_fit

        c1 = kmeans_fit(blobs, k=2, iters=3).collect()
        c2 = kmeans_fit(blobs.repartition(5), k=2, iters=3).collect()
        assert len(c1) == 2
        assert sorted((r.cent_id, r.centroid) for r in c1) == sorted(
            (r.cent_id, r.centroid) for r in c2
        )

    def test_converges_to_blob_means(self, spark, blobs):
        from flnr_wins_spark.functions.vectors import kmeans_assign, kmeans_fit

        cents = kmeans_fit(blobs, k=2, iters=4)
        v = blobs.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        cells = {r.id: r.cell for r in kmeans_assign(v, cents).collect()}
        left = {cells[i] for i in range(20)}
        right = {cells[100 + i] for i in range(20)}
        # each blob maps to exactly one (distinct) cell
        assert len(left) == 1 and len(right) == 1 and left != right

    def test_empty_cell_keeps_previous_centroid(self, spark):
        from flnr_wins_spark.functions.vectors import kmeans_fit

        # k=3 over 2 distinct points: one cell must go empty yet survive
        df = spark.createDataFrame(
            [(i, [float(i % 2) * 10, 0.0]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        cents = kmeans_fit(df, k=3, iters=2).collect()
        assert len(cents) == 3
        assert all(r.centroid is not None for r in cents)

    def test_sampled_fit_deterministic_and_content_addressed(self, spark, blobs):
        from flnr_wins_spark.functions.vectors import kmeans_fit

        # sampled fit is partition-invariant (content-addressed draw +
        # decimal-routed means — nothing depends on data placement) ...
        s1 = kmeans_fit(blobs, k=2, iters=3, fit_sample=10).collect()
        s2 = kmeans_fit(blobs.repartition(7), k=2, iters=3, fit_sample=10).collect()
        assert sorted((r.cent_id, r.centroid) for r in s1) == sorted(
            (r.cent_id, r.centroid) for r in s2
        )
        # ... and equals an exact (full) fit over the explicit sample subset:
        # the sample is the fit_sample lowest md5(id:seed) rows, no more rule
        h = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":42")))
        subset = blobs.withColumn("_h", h).orderBy("_h").limit(10).drop("_h")
        full = kmeans_fit(subset, k=2, iters=3, fit_sample=None).collect()
        assert sorted((r.cent_id, r.centroid) for r in s1) == sorted(
            (r.cent_id, r.centroid) for r in full
        )
        # a sample covering the corpus reproduces the unsampled fit exactly
        all1 = kmeans_fit(blobs, k=2, iters=3, fit_sample=1000).collect()
        all2 = kmeans_fit(blobs, k=2, iters=3, fit_sample=None).collect()
        assert sorted((r.cent_id, r.centroid) for r in all1) == sorted(
            (r.cent_id, r.centroid) for r in all2
        )

    def test_trained_ivf_finds_neighbors(self, spark, blobs):
        from flnr_wins_spark.functions.vectors import ivf_topk, kmeans_fit

        cents = kmeans_fit(blobs, k=2, iters=3)
        q = blobs.filter("vec_id = 0")
        out = ivf_topk(q, blobs, nlist=2, nprobe=1, k=3, centroids=cents).collect()
        # nearest neighbors of a (10,0)-blob point live in the same blob
        assert out and all(r.cand_id < 100 for r in out)


class TestAnnRecallContracts:
    """Recall floors vs brute_force_topk for every ANN variant. Without
    these, a silent recall collapse (bad seed, bad banding, broken probe
    routing) still 'passes' the rows-only driver check — here it turns a
    test red instead."""

    K = 5

    @pytest.fixture()
    def corpus(self, spark):
        # 8 well-separated direction clusters in 16-dim, 15 members each:
        # a member's true top-5 neighbors are always within its cluster
        import random

        rng = random.Random(11)
        centers = []
        for _ in range(8):
            v = [rng.gauss(0, 1) for _ in range(16)]
            n = sum(x * x for x in v) ** 0.5
            centers.append([x / n for x in v])
        rows = [
            (c * 100 + i, [x + rng.gauss(0, 0.02) for x in centers[c]])
            for c in range(8)
            for i in range(15)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def _truth(self, corpus, queries):
        from flnr_wins_spark.functions.vectors import brute_force_topk

        exact = brute_force_topk(queries, corpus, k=self.K)
        truth = {}
        for r in exact.collect():
            truth.setdefault(r.query_id, set()).add(r.cand_id)
        return truth

    @staticmethod
    def _recall(truth, got_rows):
        got = {}
        for r in got_rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return hits / sum(len(v) for v in truth.values())

    def test_ann_lsh_recall_floor(self, spark, corpus):
        from flnr_wins_spark.functions.vectors import ann_lsh_topk

        queries = corpus.filter(F.col("vec_id") % 100 == 0)
        truth = self._truth(corpus, queries)
        got = ann_lsh_topk(queries, corpus, dim=16, k=self.K, bits=16, bands=4).collect()
        assert self._recall(truth, got) >= 0.8

    def test_ivf_untrained_recall_floor(self, spark, corpus):
        from flnr_wins_spark.functions.vectors import ivf_topk

        queries = corpus.filter(F.col("vec_id") % 100 == 0)
        truth = self._truth(corpus, queries)
        got = ivf_topk(queries, corpus, nlist=8, nprobe=3, k=self.K).collect()
        assert self._recall(truth, got) >= 0.8

    def test_pq_recall_floor(self, spark):
        from flnr_wins_spark.functions.vectors import pq_encode, pq_fit, pq_topk

        # PQ needs within-cluster spread: on a near-degenerate cluster every
        # member shares the same codes and ADC ties make member-level recall
        # pure tie-break noise. σ=0.3 around well-separated centers gives the
        # codebooks real variance to encode — that's the regime PQ targets.
        import random

        rng = random.Random(11)
        centers = []
        for _ in range(8):
            v = [rng.gauss(0, 1) for _ in range(16)]
            n = sum(x * x for x in v) ** 0.5
            centers.append([5 * x / n for x in v])
        rows = [
            (c * 100 + i, [x + rng.gauss(0, 0.3) for x in centers[c]])
            for c in range(8)
            for i in range(15)
        ]
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = corpus.filter(F.col("vec_id") % 100 == 0)
        truth = self._truth(corpus, queries)
        books = pq_fit(corpus, dim=16, m=8, ksub=32, iters=4)
        enc = pq_encode(corpus, books, dim=16, m=8)
        got = pq_topk(queries, enc, books, dim=16, m=8, k=self.K).collect()
        assert self._recall(truth, got) >= 0.7


class TestBpeTokenize:
    def test_pretokens_segmentation(self, spark):
        from flnr_wins_spark.functions.text import bpe_pretokens

        df = spark.createDataFrame([("hello world, 42 tests!",)], "text string")
        (row,) = df.select(bpe_pretokens(F.col("text")).alias("p")).collect()
        assert row.p == ["hello", " world", ",", " 42", " tests", "!"]

    def test_estimate_grows_with_long_words(self, spark):
        from flnr_wins_spark.functions.text import bpe_token_estimate

        df = spark.createDataFrame(
            [("cat dog",), ("internationalization",)], "text string"
        )
        got = {r.text: r.n for r in df.select(
            "text", bpe_token_estimate(F.col("text")).alias("n")).collect()}
        assert got["cat dog"] == 2
        # 20-char word: 1 pre-token + ceil(16/4) = 5
        assert got["internationalization"] == 5


class TestText:
    def test_profile_columns_and_values(self, spark, docs):
        prof = {r.doc_id: r for r in text_profile(docs).collect()}
        assert prof[1].n_tokens == 9
        assert prof[1].n_uniq == 8          # 'the' twice
        assert prof[1].lang_pred == "en"
        assert prof[1].rolling_fp == prof[2].rolling_fp  # same text, same hash
        assert prof[1].rolling_fp != prof[4].rolling_fp
        assert 0.0 <= prof[1].quality <= 1.0
        assert prof[1].prefix_fp != prof[5].prefix_fp

    def test_normalize_text(self, spark):
        df = spark.createDataFrame([("  A   b  C ",)], "t string")
        assert df.select(normalize_text(F.col("t")).alias("n")).collect()[0].n == "a b c"


class TestMultimodal:
    def test_media_table_and_features(self, spark, docs):
        media = to_media_table(docs, "text", "doc_id")
        assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
        m = media.filter("media_id = 1").collect()[0]
        assert m.meta.n_bytes == len(m.content)

        feats = extract_features(media, dim=4, fake=True)
        got = {r.media_id: r for r in feats.collect()}
        assert len(got[1].feature) == 4
        assert got[1].content_hash == got[2].content_hash   # same bytes
        assert got[1].feature == got[2].feature             # deterministic fake decode
        assert got[1].content_hash != got[5].content_hash

    def test_frame_sampling_fanout(self, spark, docs):
        from flnr_wins_spark.functions.multimodal import sample_frames, to_media_table

        media = to_media_table(docs, "text", "doc_id")
        frames = sample_frames(media, n_frames=4)
        rows = frames.collect()
        assert len(rows) == docs.count() * 4
        # per-media byte spans partition the content exactly
        by_media = {}
        for r in rows:
            by_media.setdefault(r.media_id, 0)
            by_media[r.media_id] += r.n_bytes
        n_bytes = {r.media_id: r.meta.n_bytes for r in media.collect()}
        assert by_media == n_bytes

    def test_resize_passthrough_meta(self, spark, docs):
        from flnr_wins_spark.functions.multimodal import resize_image, to_media_table

        media = to_media_table(docs, "text", "doc_id")
        out = resize_image(media, 64, 48)
        r = out.orderBy("media_id").first()
        assert r.meta.width == 64 and r.meta.height == 48
        assert bytes(r.content) == bytes(media.orderBy("media_id").first().content)

    def test_real_decode_guards_unsupported_containers(self, spark, docs):
        # text bytes are not a recognized image container: the honest guard
        # still raises for anything the stdlib decoder can't parse
        media = to_media_table(docs, "text", "doc_id")
        with pytest.raises(Exception, match="NotImplementedError|unrecognized image"):
            extract_features(media, fake=False).collect()


def _bmp_24(width, height, rgb_rows, top_down=False):
    """Build an uncompressed 24-bit BMP from rows of (r, g, b) tuples."""
    stride = (width * 3 + 3) & ~3
    raster = b""
    rows = rgb_rows if top_down else list(reversed(rgb_rows))
    for row in rows:
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        raster += line + b"\x00" * (stride - len(line))
    h = height if not top_down else -height
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raster


class TestRealImageDecode:
    PIXELS = [[(255, 0, 10), (1, 2, 3)], [(4, 5, 6), (7, 8, 9)]]  # 2x2 RGB

    def test_ppm_p6_with_comments(self):
        from flnr_wins_spark.functions.multimodal import decode_image

        raster = b"".join(bytes(p) for row in self.PIXELS for p in row)
        data = b"P6\n# a comment\n2 2\n# another\n255\n" + raster
        ch, w, h, px = decode_image(data)
        assert (ch, w, h) == (3, 2, 2)
        assert px == raster

    def test_pgm_p5_single_channel(self):
        from flnr_wins_spark.functions.multimodal import decode_image

        ch, w, h, px = decode_image(b"P5\n3 1\n255\n\x01\x02\x03")
        assert (ch, w, h, px) == (1, 3, 1, b"\x01\x02\x03")

    def test_bmp_matches_ppm_pixels_bottom_up_and_top_down(self):
        from flnr_wins_spark.functions.multimodal import decode_image

        raster = b"".join(bytes(p) for row in self.PIXELS for p in row)
        ppm = decode_image(b"P6\n2 2\n255\n" + raster)
        for td in (False, True):
            bmp = decode_image(_bmp_24(2, 2, self.PIXELS, top_down=td))
            # same logical image -> identical normalized pixel bytes across
            # containers, regardless of BMP row order/padding/BGR layout
            assert bmp == ppm

    def test_real_features_integer_exact(self):
        from flnr_wins_spark.functions.multimodal import _real_features

        raster = b"".join(bytes(p) for row in self.PIXELS for p in row)
        feats = _real_features(b"P6\n2 2\n255\n" + raster)
        assert feats[:3] == [3.0, 2.0, 2.0]
        assert feats[3] == 255 + 1 + 4 + 7  # R channel sum
        assert feats[4] == 0 + 2 + 5 + 8
        assert feats[5] == 10 + 3 + 6 + 9
        assert feats[6] == 0.0 and feats[7] == 255.0

    def test_unsupported_raises(self):
        from flnr_wins_spark.functions.multimodal import decode_image

        # truncated JPEG fails loudly (real decoder now dispatches on FFD8)
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
        with pytest.raises(NotImplementedError):
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # still no webp
        with pytest.raises(NotImplementedError):
            decode_image(b"")


class TestWavDecode:
    SAMPLES = [0, 100, -200, 32767, -32768, 5, -5, 0]

    def _wav(self, samples, channels=1, rate=8000):
        import io
        import struct
        import wave

        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
        w.close()
        return buf.getvalue()

    def test_matches_stdlib_wave_writer(self):
        from flnr_wins_spark.functions.multimodal import decode_wav

        ch, rate, ss = decode_wav(self._wav(self.SAMPLES))
        assert (ch, rate, ss) == (1, 8000, self.SAMPLES)

    def test_extra_chunks_and_padding_skipped(self):
        """RIFF chunk walking: a LIST chunk (odd size -> pad byte) before
        data must not derail fmt/data discovery."""
        import struct

        from flnr_wins_spark.functions.multimodal import decode_wav

        payload = b"".join(struct.pack("<h", s) for s in self.SAMPLES)
        fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
            "<HHIIHH", 1, 1, 8000, 16000, 2, 16
        )
        lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
        data = b"data" + struct.pack("<I", len(payload)) + payload
        body = b"WAVE" + fmt + lst + data
        wav = b"RIFF" + struct.pack("<I", len(body)) + body
        ch, rate, ss = decode_wav(wav)
        assert (ch, rate, ss) == (1, 8000, self.SAMPLES)

    def test_audio_features_integer_exact(self):
        from flnr_wins_spark.functions.multimodal import _audio_features

        feats = _audio_features(self._wav(self.SAMPLES))
        assert feats[:3] == [1.0, 8000.0, 8.0]
        assert feats[3] == float(sum(self.SAMPLES))
        assert feats[4] == -32768.0 and feats[5] == 32767.0
        assert feats[6] == float(sum(abs(s) for s in self.SAMPLES))
        # sign changes: 100/-200, -200/32767, 32767/-32768, -32768/5, 5/-5
        assert feats[7] == 5.0

    def test_unsupported_raises(self):
        from flnr_wins_spark.functions.multimodal import decode_wav

        with pytest.raises(NotImplementedError):
            decode_wav(b"OggS vorbis-ish")
        with pytest.raises(NotImplementedError):
            decode_wav(b"")
        # 8-bit PCM is honest-guarded, not silently misdecoded
        import struct

        fmt8 = b"fmt " + struct.pack("<I", 16) + struct.pack(
            "<HHIIHH", 1, 1, 8000, 8000, 1, 8
        )
        body = b"WAVE" + fmt8 + b"data" + struct.pack("<I", 2) + b"\x01\x02"
        with pytest.raises(NotImplementedError):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestConnectedComponents:
    def test_chain_and_island(self, spark):
        from flnr_wins_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
        )
        got = {r.id: r.cluster_id for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_survivor_policy(self, spark):
        from flnr_wins_spark.operators.graph import dedup_clusters

        pairs = spark.createDataFrame([(5, 7), (7, 9)], "id_a long, id_b long")
        rows = {r.id: r for r in dedup_clusters(pairs).collect()}
        assert rows[5].is_survivor and not rows[7].is_survivor and not rows[9].is_survivor
        assert all(r.cluster_id == 5 for r in rows.values())

    def test_star_matches_label_propagation(self, spark):
        from flnr_wins_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20), (7, 5), (5, 6)],
            "id_a long, id_b long",
        )
        label = {r.id: r.cluster_id for r in connected_components(edges).collect()}
        star = {r.id: r.cluster_id
                for r in connected_components(edges, algorithm="star").collect()}
        assert star == label
        assert star[4] == 1 and star[11] == 10 and star[20] == 20 and star[7] == 5

    def test_star_converges_on_high_diameter_chain(self, spark):
        """A 200-vertex chain has diameter 199 — label propagation needs 199
        rounds (far past any sane max_iter); large/small-star must collapse
        it in O(log^2 n) rounds. max_iter=12 proves the geometric collapse."""
        from flnr_wins_spark.operators.graph import connected_components

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(199)], "id_a long, id_b long"
        )
        got = {r.id: r.cluster_id
               for r in connected_components(chain, max_iter=12, algorithm="star").collect()}
        assert len(got) == 200 and set(got.values()) == {0}
        with pytest.raises(RuntimeError):
            connected_components(chain, max_iter=12, algorithm="label")

    def test_unknown_algorithm_rejected(self, spark):
        from flnr_wins_spark.operators.graph import connected_components

        edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError):
            connected_components(edges, algorithm="bogus")


class TestProductQuantization:
    def test_adc_exact_on_centroid_aligned_vectors(self, spark):
        from flnr_wins_spark.functions.vectors import pq_encode, pq_topk

        books = spark.createDataFrame(
            [(0, 1, [0.0, 0.0]), (0, 2, [10.0, 10.0]),
             (1, 1, [0.0, 0.0]), (1, 2, [10.0, 10.0])],
            "sub int, cent_id long, centroid array<double>",
        )
        vecs = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0, 0.0]),
             (2, [10.0, 10.0, 10.0, 10.0]),
             (3, [0.0, 0.0, 10.0, 10.0])],
            "vec_id long, embedding array<double>",
        )
        enc = pq_encode(vecs, books, dim=4, m=2)
        codes = {r.id: list(r.codes) for r in enc.collect()}
        assert codes == {1: [1, 1], 2: [2, 2], 3: [1, 2]}
        q = spark.createDataFrame([(99, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
        got = {r.cand_id: (r.approx_sqdist, r["rank"]) for r in pq_topk(q, enc, books, dim=4, m=2, k=3).collect()}
        # centroid-aligned vectors make ADC distances exact
        assert got == {1: (0.0, 1), 3: (200.0, 2), 2: (400.0, 3)}

    def test_trained_cluster_recall(self, spark):
        from flnr_wins_spark.functions.vectors import pq_encode, pq_fit, pq_topk

        import random

        rng = random.Random(3)
        centers = [[rng.uniform(-5, 5) for _ in range(8)] for _ in range(6)]
        rows = [
            (i, [c + rng.gauss(0, 0.05) for c in centers[i % 6]])
            for i in range(120)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = pq_fit(emb, dim=8, m=2, ksub=8, iters=3)
        enc = pq_encode(emb, books, dim=8, m=2)
        queries = emb.filter(F.col("vec_id") < 4)
        got = pq_topk(queries, enc, books, dim=8, m=2, k=5).collect()
        assert len(got) == 20
        # ADC collapses same-code candidates to one distance, so member-level
        # recall inside a tight cluster is tie-break noise; the meaningful
        # property is that every retrieved candidate is from the query's true
        # cluster (codebooks learned the 6 well-separated clusters).
        assert all(r.cand_id % 6 == r.query_id % 6 for r in got)

    def test_fit_rejects_indivisible_dim(self, spark):
        from flnr_wins_spark.functions.vectors import pq_fit

        emb = spark.createDataFrame([(1, [0.0] * 6)], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            pq_fit(emb, dim=6, m=4)


class TestBM25:
    def test_hand_computed_scores(self, spark):
        import math

        from flnr_wins_spark.functions.search import bm25_topk

        docs = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry cherry apple")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.score, r["rank"]) for r in bm25_topk(docs, ["apple"], k=10).collect()}
        # N=3, avgdl=3, df(apple)=2 => idf=ln(1.6)
        idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
        d1 = idf * (2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0)))
        d3 = idf * (1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 4 / 3.0)))
        assert set(got) == {1, 3}
        assert got[1][1] == 1 and got[3][1] == 2
        assert got[1][0] == pytest.approx(d1, rel=1e-9)
        assert got[3][0] == pytest.approx(d3, rel=1e-9)

    def test_multi_term_and_k_cap(self, spark):
        from flnr_wins_spark.functions.search import bm25_topk, build_postings

        docs = spark.createDataFrame(
            [(i, "common filler" + (" rare" if i == 7 else "")) for i in range(20)],
            "doc_id long, text string",
        )
        top = sorted(bm25_topk(docs, ["rare", "common"], k=3).collect(), key=lambda r: r["rank"])
        assert len(top) == 3
        # the only doc containing the rare term outranks pure-common docs
        assert top[0].doc_id == 7 and top[0]["rank"] == 1
        postings = {(r.term, r.doc_id): r.tf for r in build_postings(docs).collect()}
        assert postings[("rare", 7)] == 1 and postings[("common", 0)] == 1


class TestQuantizedTopk:
    def test_quantization_roundtrip_and_recall(self, spark):
        from flnr_wins_spark.functions.vectors import brute_force_topk, int8_quantize, quantized_topk

        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        codes = emb.select(int8_quantize(F.col("embedding")).alias("q")).collect()
        for r in codes:
            assert all(-127 <= c <= 127 for c in r.q.codes)
            assert r.q.scale > 0
        queries = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.cand_id)
            for r in brute_force_topk(queries, emb, k=5).collect()
        }
        quant = {
            (r.query_id, r.cand_id)
            for r in quantized_topk(queries, emb, k=5).collect()
        }
        # int8 keeps ~1% relative error on dots: top-5 overlap stays high
        assert len(exact & quant) >= 0.7 * len(exact)

    def test_zero_vector_guard(self, spark):
        from flnr_wins_spark.functions.vectors import int8_quantize

        emb = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
        got = emb.select(int8_quantize(F.col("embedding")).alias("q")).collect()[0].q
        assert got.codes == [0, 0, 0] and got.scale == 1.0


class TestSemanticDedup:
    def test_clones_cluster_and_singletons_survive(self, spark):
        from flnr_wins_spark.functions.vectors import semantic_dedup

        import math

        # 12 well-separated unit-ish vectors + scaled clones of ids 0 and 5;
        # a clone's unit vector is identical to its original's, so they must
        # share a k-means cell and link at any threshold
        def vec(i):
            return [math.cos(i * 0.5), math.sin(i * 0.5), float(i % 3)]

        rows = [(i, vec(i)) for i in range(12)]
        rows += [(100, [2 * x for x in vec(0)]), (105, [3 * x for x in vec(5)])]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {r.id: r for r in semantic_dedup(emb, k=4, iters=2, threshold=0.9999).collect()}
        assert len(got) == 14  # every input row gets a verdict
        assert got[100].cluster_id == 0 and not got[100].is_survivor
        assert got[105].cluster_id == 5 and not got[105].is_survivor
        assert got[0].is_survivor and got[5].is_survivor
        # at this threshold the remaining distinct directions stay singletons
        singles = [i for i in range(12) if i not in (0, 5)]
        assert all(got[i].cluster_id == i and got[i].is_survivor for i in singles)

    def test_hot_cell_guard_bounds_pathological_cell(self, spark):
        """k-means dumps 400 near-identical embeddings into one cell; with
        ``max_cell_width`` below that the cell is excluded from pair
        generation (rows pass through as their own survivors — fail open),
        while normal-width cells still dedup. Uncapped, the same input
        collapses the clones to one survivor."""
        import math

        from flnr_wins_spark.functions.vectors import semantic_dedup

        clones = [(i, [1.0, 0.001 * (i % 7), 0.0]) for i in range(400)]
        distinct = [(1000 + i, [math.cos(2 + i), math.sin(2 + i), 1.0]) for i in range(3)]
        emb = spark.createDataFrame(clones + distinct, "vec_id long, embedding array<double>")
        capped = {r.id: r for r in semantic_dedup(
            emb, k=4, iters=2, threshold=0.99, max_cell_width=100
        ).collect()}
        assert len(capped) == 403
        # hot cell excluded -> every clone survives as its own cluster
        assert all(capped[i].is_survivor and capped[i].cluster_id == i for i in range(400))
        # default (high) cap still collapses the clones
        uncapped = {r.id: r for r in semantic_dedup(
            emb, k=4, iters=2, threshold=0.99
        ).collect()}
        survivors = [i for i in range(400) if uncapped[i].is_survivor]
        assert len(survivors) < 400 and uncapped[0].is_survivor


class TestPageRank:
    def test_star_graph_ranks_hub_highest(self, spark):
        from flnr_wins_spark.operators.graph import pagerank_integer

        # undirected star: hub 0 <-> spokes 1..4; hub must outrank spokes,
        # spokes must tie exactly (integer arithmetic => exact equality)
        spokes = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
        edges = spark.createDataFrame(spokes, "src long, dst long")
        got = {r.id: r["rank"] for r in pagerank_integer(edges, n_iter=10).collect()}
        assert got[0] > got[1]
        assert len({got[i] for i in range(1, 5)}) == 1
        # total mass stays near the scale (floor-division leakage only)
        assert 0.95 * 1_000_000_000_000 < sum(got.values()) <= 1_000_000_000_000

    def test_deterministic_across_partitionings(self, spark):
        from flnr_wins_spark.operators.graph import pagerank_integer

        edges = spark.createDataFrame(
            [(a, b) for a in range(6) for b in range(6) if (a + b) % 3 == 0 and a != b],
            "src long, dst long",
        )
        one = {r.id: r["rank"] for r in pagerank_integer(edges.coalesce(1), n_iter=6).collect()}
        many = {r.id: r["rank"] for r in pagerank_integer(edges.repartition(7), n_iter=6).collect()}
        assert one == many


class TestApproxDistinct:
    def test_within_error_bound(self, spark):
        from flnr_wins_spark.plans.common import all_queries

        df = all_queries()["q_events_approx_distinct"].fn(
            spark, "/root/testdata/sf0.001"
        )
        from flnr_wins_spark.sources import read_table

        ev = read_table(spark, "/root/testdata/sf0.001", "events")
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        for r in df.collect():
            assert abs(r.approx_users - exact[r.event_type]) <= 0.1 * exact[r.event_type]


class TestTrainTestSplit:
    def test_deterministic_and_disjoint(self, spark):
        from flnr_wins_spark.operators.split import train_test_split

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.2).collect()}
        b = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.2).collect()}
        assert a == b  # stable across runs
        frac = sum(1 for v in a.values() if v == "test") / len(a)
        assert 0.15 < frac < 0.25  # ~20% within hash noise

    def test_membership_survives_data_growth(self, spark):
        from flnr_wins_spark.operators.split import train_test_split

        small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in train_test_split(small, "doc_id", 0.1).collect()}
        b = {r.doc_id: r.split for r in train_test_split(big, "doc_id", 0.1).collect()}
        assert all(b[k] == v for k, v in a.items())  # old rows never move

    def test_boundary_fractions(self, spark):
        # fraction=1.0 formerly produced the 3-char threshold '100', which
        # sorts under most 2-hex prefixes and silently kept only ~6.6%
        from flnr_wins_spark.operators.split import train_test_split

        df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
        all_test = {r.split for r in train_test_split(df, "doc_id", 1.0).collect()}
        assert all_test == {"test"}
        all_train = {r.split for r in train_test_split(df, "doc_id", 0.0).collect()}
        assert all_train == {"train"}

    def test_kfold_stable_and_covering(self, spark):
        from flnr_wins_spark.operators.split import kfold_split

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.fold for r in kfold_split(df, "doc_id", k=5).collect()}
        b = {r.doc_id: r.fold for r in kfold_split(df.repartition(13), "doc_id", k=5).collect()}
        assert a == b  # partitioning-independent
        assert set(a.values()) == set(range(5))
        sizes = [sum(1 for v in a.values() if v == f) for f in range(5)]
        assert min(sizes) > 0.6 * max(sizes)  # even-ish within hash noise

    def test_kfold_rejects_degenerate_k(self, spark):
        from flnr_wins_spark.operators.split import kfold_split

        df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            kfold_split(df, "doc_id", k=1)

    def test_shard_assign_stable_and_order_defined(self, spark):
        from flnr_wins_spark.operators.split import shard_assign

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {(r.doc_id): (r.shard, r.pos) for r in shard_assign(df, "doc_id", 8).collect()}
        b = {(r.doc_id): (r.shard, r.pos) for r in shard_assign(
            df.repartition(13), "doc_id", 8).collect()}
        assert a == b  # partitioning-independent, total order included
        # shards cover [0, 8), even-ish; pos is 1..|shard| dense per shard
        shards = sorted({s for s, _ in a.values()})
        assert shards == list(range(8))
        for s in shards:
            poss = sorted(p for sh, p in a.values() if sh == s)
            assert poss == list(range(1, len(poss) + 1))
        sizes = [sum(1 for sh, _ in a.values() if sh == s) for s in shards]
        assert min(sizes) > 0.6 * max(sizes)
        # membership is content-addressed: growth never moves old rows
        big = {r.doc_id: r.shard for r in shard_assign(
            spark.range(0, 4000).withColumnRenamed("id", "doc_id"), "doc_id", 8
        ).collect()}
        assert all(big[k] == s for k, (s, _) in a.items())

    def test_write_training_shards_byte_stable_layout(self, spark, tmp_path):
        import glob

        from flnr_wins_spark.operators.split import write_training_shards

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id").withColumn(
            "text", F.concat(F.lit("doc "), F.col("doc_id"))
        )
        p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
        write_training_shards(df, p1, "doc_id", 4)
        write_training_shards(df.repartition(7), p2, "doc_id", 4)
        # one data file per shard dir (filter on the BASENAME — the full
        # glob path never starts with '.'/'_')
        import os

        for base in (p1, p2):
            for s in range(4):
                files = [
                    f for f in glob.glob(f"{base}/shard={s}/*.parquet")
                    if not os.path.basename(f).startswith((".", "_"))
                ]
                assert len(files) == 1, (base, s, files)
        # re-export of identical data is row-for-row identical per shard
        for s in range(4):
            r1 = spark.read.parquet(f"{p1}/shard={s}").collect()
            r2 = spark.read.parquet(f"{p2}/shard={s}").collect()
            assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


class TestStratifiedSample:
    def test_membership_is_key_deterministic(self, spark):
        from flnr_wins_spark.operators.sample import stratified_sample

        rows = [(i, "A" if i % 2 == 0 else "B") for i in range(400)]
        df = spark.createDataFrame(rows, "k long, seg string")
        s1 = {r.k for r in stratified_sample(df, "k", "seg", {"A": 0.5}, 0.1).collect()}
        # Re-run over a different partitioning: identical membership.
        s2 = {
            r.k
            for r in stratified_sample(
                df.repartition(7), "k", "seg", {"A": 0.5}, 0.1
            ).collect()
        }
        assert s1 == s2 and s1

    def test_fractions_apply_per_stratum(self, spark):
        from flnr_wins_spark.operators.sample import stratified_sample

        rows = [(i, "A" if i % 2 == 0 else "B") for i in range(2000)]
        df = spark.createDataFrame(rows, "k long, seg string")
        got = stratified_sample(df, "k", "seg", {"A": 0.5}, 0.0).collect()
        segs = {r.seg for r in got}
        assert segs == {"A"}  # default 0.0 drops all of B
        # ~50% of the 1000 A-rows, md5-uniform: generous tolerance
        assert 350 < len(got) < 650

    def test_superset_monotonic(self, spark):
        """A higher fraction's sample contains the lower fraction's (prefix
        thresholds nest) — the property that makes mixing rates tunable
        without resampling."""
        from flnr_wins_spark.operators.sample import stratified_sample

        df = spark.createDataFrame([(i, "A") for i in range(500)], "k long, seg string")
        small = {r.k for r in stratified_sample(df, "k", "seg", {"A": 0.1}).collect()}
        big = {r.k for r in stratified_sample(df, "k", "seg", {"A": 0.4}).collect()}
        assert small <= big

    def test_full_keep_fraction(self, spark):
        """'all of books' must mean ALL: fraction 1.0 (and anything rounding
        to 256/256) keeps every row of the stratum."""
        from flnr_wins_spark.operators.sample import stratified_sample

        rows = [(i, "books" if i % 2 == 0 else "web") for i in range(1000)]
        df = spark.createDataFrame(rows, "k long, seg string")
        got = stratified_sample(df, "k", "seg", {"books": 1.0, "web": 0.999}, 0.0).collect()
        assert sum(1 for r in got if r.seg == "books") == 500
        assert sum(1 for r in got if r.seg == "web") == 500


class TestTemperatureResample:
    @pytest.fixture()
    def skewed(self, spark):
        # 1000 'web', 250 'wiki', 40 'books'
        rows = (
            [(i, "web") for i in range(1000)]
            + [(10_000 + i, "wiki") for i in range(250)]
            + [(20_000 + i, "books") for i in range(40)]
        )
        return spark.createDataFrame(rows, "k long, src string")

    def test_smallest_stratum_keeps_everything(self, spark, skewed):
        from flnr_wins_spark.operators.sample import temperature_resample

        out = temperature_resample(skewed, "k", "src", tau=0.5).collect()
        books = [r for r in out if r.src == "books"]
        assert len(books) == 40 and books[0].rate_q == 256

    def test_rates_flatten_monotonically(self, spark, skewed):
        from flnr_wins_spark.operators.sample import temperature_resample

        out = temperature_resample(skewed, "k", "src", tau=0.5).collect()
        rate = {r.src: r.rate_q for r in out}
        assert rate["books"] > rate["wiki"] > rate["web"]
        # sqrt(40/1000)=0.2 -> web keeps ~20%, md5-uniform tolerance
        n_web = sum(1 for r in out if r.src == "web")
        assert 120 < n_web < 280

    def test_tau_one_is_identity(self, spark, skewed):
        from flnr_wins_spark.operators.sample import temperature_resample

        out = temperature_resample(skewed, "k", "src", tau=1.0)
        assert out.count() == skewed.count()

    def test_membership_partition_invariant(self, spark, skewed):
        from flnr_wins_spark.operators.sample import temperature_resample

        s1 = {r.k for r in temperature_resample(skewed, "k", "src").collect()}
        s2 = {r.k for r in temperature_resample(skewed.repartition(13), "k", "src").collect()}
        assert s1 == s2 and s1


class TestSequencePacking:
    def test_offsets_contiguous_and_packs_bounded(self, spark):
        from flnr_wins_spark.operators.packing import pack_manifest, pack_sequences

        df = spark.createDataFrame(
            [(i, 10 + (i * 37) % 90) for i in range(300)], "doc_id long, n_tokens long"
        )
        packed = pack_sequences(df, "doc_id", "n_tokens", budget=128, shards=4)
        rows = packed.collect()
        # Per shard: offsets are exactly the running sum (contiguous stream).
        by_shard = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.pack_offset)):
            expect = by_shard.get(r.shard, 0)
            assert r.pack_offset == expect
            by_shard[r.shard] = expect + r.n_tokens
        # Every doc fits under budget, so no pack exceeds budget + max_doc.
        manifest = {r.pack_id: r.tokens_total for r in pack_manifest(packed).collect()}
        assert all(v < 128 + 100 for v in manifest.values())
        # Composite id round-trips the shard (high bits) and local pack (low).
        assert all(r.pack_id >> 40 == r.shard for r in rows)
        assert all(r.pack_id & ((1 << 40) - 1) == r.local_pack for r in rows)

    def test_manifest_respects_token_col_name(self, spark):
        from flnr_wins_spark.operators.packing import pack_manifest, pack_sequences

        df = spark.createDataFrame(
            [(i, 10) for i in range(50)], "doc_id long, tok_count long"
        )
        packed = pack_sequences(df, "doc_id", "tok_count", budget=40, shards=2)
        manifest = pack_manifest(packed, token_col="tok_count").collect()
        assert sum(r.tokens_total for r in manifest) == 500
        assert sum(r.n_docs for r in manifest) == 50

    def test_deterministic_across_partitionings(self, spark):
        from flnr_wins_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, 5 + i % 20) for i in range(200)], "doc_id long, n_tokens long"
        )
        a = {(r.doc_id, r.pack_id) for r in pack_sequences(df, "doc_id", "n_tokens", 64).collect()}
        b = {
            (r.doc_id, r.pack_id)
            for r in pack_sequences(df.repartition(13), "doc_id", "n_tokens", 64).collect()
        }
        assert a == b


class TestPiiRedact:
    def test_redacts_all_classes(self, spark):
        from flnr_wins_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [(1, "write bob.smith+x@corp.example.org or call 604-555-1234 from 192.168.0.1 ok")],
            "id long, text string",
        )
        n_email, n_ip, n_phone = pii_counts(F.col("text"))
        row = df.select(
            redact_pii(F.col("text")).alias("clean"),
            n_email.alias("e"), n_ip.alias("i"), n_phone.alias("p"),
        ).collect()[0]
        assert (row.e, row.i, row.p) == (1, 1, 1)
        assert "[EMAIL]" in row.clean and "[IP]" in row.clean and "[PHONE]" in row.clean
        assert "bob" not in row.clean and "192.168" not in row.clean and "555-1234" not in row.clean


class TestDecontam:
    def test_ngrams_and_overlap_counting(self, spark):
        from flnr_wins_spark.operators.decontam import contamination, word_ngrams

        # One train doc fully contains the eval text (3 shared 3-grams),
        # one shares nothing, one is too short to produce any 3-gram.
        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over"),
                (2, "completely unrelated words here entirely"),
                (3, "too short"),
            ],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(100, "quick brown fox jumps")], "doc_id long, text string"
        )
        grams = train.select(word_ngrams(F.col("text"), 3).alias("g")).collect()
        assert len(grams[0].g) == 4 and grams[0].g[0] == "the quick brown"
        assert grams[2].g == []  # shorter than n -> empty, not null
        got = {r.doc_id: r.n_shared_grams for r in contamination(train, ev, n=3).collect()}
        assert got == {1: 2}  # "quick brown fox", "brown fox jumps"

    def test_repeated_gram_counts_once_and_tokenize_normalizes(self, spark):
        from flnr_wins_spark.operators.decontam import contamination

        train = spark.createDataFrame(
            [(1, "Alpha, BETA; gamma!! alpha beta gamma")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
        got = contamination(train, ev, n=3).collect()
        # the gram appears twice in doc 1 but is deduped per document
        assert [(r.doc_id, r.n_shared_grams) for r in got] == [(1, 1)]

    def test_decontaminate_split_is_exhaustive(self, spark):
        from flnr_wins_spark.operators.decontam import decontaminate

        train = spark.createDataFrame(
            [(i, f"doc {i} " + "shared common phrase tail words" if i % 2 == 0
              else f"doc {i} private distinct content body text") for i in range(10)],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(99, "shared common phrase tail words")], "doc_id long, text string"
        )
        clean, dirty = decontaminate(train, ev, n=4)
        c = {r.doc_id for r in clean.collect()}
        d = {r.doc_id for r in dirty.collect()}
        assert c | d == set(range(10)) and not (c & d)
        assert d == {i for i in range(10) if i % 2 == 0}


class TestQualityRules:
    def test_rule_values_and_verdict(self, spark):
        from flnr_wins_spark.functions.text import quality_rules

        # 60 varied words incl. stopwords: no repeated trigrams, mean len ~5
        good = "the of " + " ".join(f"word{i}" for i in range(58))
        docs = spark.createDataFrame(
            [
                (1, good),                                   # passes everything
                (2, "short doc"),                            # too few words
                (3, " ".join(["spam"] * 80)),                # all-dup trigrams, no stopwords
                (4, " ".join(["### ##"] * 60)),              # symbols, no alpha
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in quality_rules(docs).collect()}
        assert got[1].passes
        assert not got[2].passes and got[2].n_words == 2
        assert not got[3].passes and got[3].dup_trigram_ratio > 0.9
        assert got[3].stopword_hits == 0
        assert not got[4].passes and got[4].alpha_word_ratio == 0.0

    def test_short_docs_trigram_zero(self, spark):
        # sequence(1, 0) is descending in Spark — 1- and 2-word docs must
        # report dup_trigram_ratio 0, not fold junk trigrams
        from flnr_wins_spark.functions.text import quality_rules

        docs = spark.createDataFrame(
            [(1, "one"), (2, "two words")], "doc_id long, text string"
        )
        got = {r.doc_id: r.dup_trigram_ratio for r in quality_rules(docs).collect()}
        assert got == {1: 0.0, 2: 0.0}


class TestRepetitionStats:
    def test_fractions_and_verdict(self, spark):
        from flnr_wins_spark.functions.text import repetition_stats

        varied = " ".join(f"w{i}" for i in range(40))        # all 2-grams unique
        spam = " ".join(["ab cd"] * 30)                      # one 2-gram dominates
        docs = spark.createDataFrame(
            [(1, varied), (2, spam), (3, "one")],            # 3: shorter than top_n
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in repetition_stats(docs).collect()}
        # doc 3 has no 2-grams -> absent (same as the oracle's unnest-of-empty)
        assert set(got) == {1, 2}
        assert got[1].passes_repetition
        # most frequent 2-gram of the varied doc covers ~2 words out of 40
        assert got[1].top_ngram_frac < 0.10 and got[1].dup_ngram_frac == 0.0
        # the spam doc's dominant 2-gram ('cd ab' x29 or 'ab cd' x30) covers
        # most characters, and its repeated 5-grams cover more than all of it
        assert not got[2].passes_repetition
        assert got[2].top_ngram_frac > 0.45 and got[2].dup_ngram_frac > 1.0

    def test_single_shuffle_chain(self, spark):
        # both gram sizes must share one exploded relation: exactly one
        # Exchange below the first aggregate (plus the per-doc re-agg)
        from flnr_wins_spark.functions.text import repetition_stats

        docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2


class TestDocChunking:
    def test_overlap_and_reconstruction(self, spark):
        from flnr_wins_spark.operators.packing import chunk_documents

        words = [f"w{i}" for i in range(25)]
        docs = spark.createDataFrame([(1, " ".join(words)), (2, "tiny doc")],
                                     "doc_id long, text string")
        got = {(r.doc_id, r.chunk_idx): r for r in
               chunk_documents(docs, "text", "doc_id",
                               chunk_tokens=10, overlap=4).collect()}
        # doc 1: 25 tokens, chunk 10, step 6 -> chunks at 0,6,12,18 (4 chunks)
        assert {i for d, i in got if d == 1} == {0, 1, 2, 3}
        assert got[(1, 0)].chunk_text.split() == words[0:10]
        assert got[(1, 1)].chunk_text.split() == words[6:16]   # 4-token overlap
        assert got[(1, 3)].chunk_text.split() == words[18:25]  # short tail
        assert got[(1, 3)].chunk_n_tokens == 7
        # doc at/under budget -> exactly one chunk: itself
        assert {i for d, i in got if d == 2} == {0}
        assert got[(2, 0)].chunk_text == "tiny doc"

    def test_overlap_must_be_smaller(self, spark):
        from flnr_wins_spark.operators.packing import chunk_documents

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, "text", "doc_id", chunk_tokens=8, overlap=8)


class TestAudioChunks:
    def test_chunk_ranges_exact(self, spark):
        from flnr_wins_spark.functions.multimodal import audio_chunk_manifest

        audio = spark.createDataFrame(
            [(1, 16000, 165000), (2, 16000, 160000), (3, 8000, 0)],
            "media_id long, sample_rate int, n_samples long",
        ).select(
            "media_id",
            F.struct(
                F.lit("audio/pcm").alias("mime"),
                F.col("sample_rate"),
                F.col("n_samples"),
                F.lit(0).cast("bigint").alias("n_bytes"),
            ).alias("meta"),
        )
        out = audio_chunk_manifest(audio, chunk_seconds=10, bytes_per_sample=2)
        rows = {(r.media_id, r.chunk_idx): r for r in out.collect()}
        # 165000 samples @16kHz/10s chunks of 160000 -> 2 chunks, tail 5000
        assert rows[(1, 0)].chunk_samples == 160000
        assert rows[(1, 1)].chunk_samples == 5000
        assert rows[(1, 1)].start_byte == 320000 and rows[(1, 1)].chunk_bytes == 10000
        # exact multiple -> exactly one chunk, no empty tail
        assert (2, 0) in rows and (2, 1) not in rows
        # zero samples -> no chunks at all
        assert not any(m == 3 for m, _ in rows)
        # chunk samples always sum back to n_samples
        assert sum(r.chunk_samples for (m, _), r in rows.items() if m == 1) == 165000


class TestUrlCanonicalize:
    def test_rules(self, spark):
        from flnr_wins_spark.functions.urls import canonical_url

        cases = [
            (1, "HTTP://WWW.Ex.COM:80/A/b/?utm_source=t&z=1&a=2#f"),
            (2, "https://ex.com:443/"),
            (3, "https://ex.com:8443/p"),   # non-default port kept
            (4, "http://ex.com"),           # empty path -> '/'
            (5, "not a url"),               # passthrough
            (6, "http://ex.com/p?gclid=1&ref=2"),  # all params tracking
        ]
        df = spark.createDataFrame(cases, "id long, url string")
        got = {r.id: r.c for r in df.select("id", canonical_url(F.col("url")).alias("c")).collect()}
        assert got[1] == "http://ex.com/A/b?a=2&z=1"
        assert got[2] == "https://ex.com/"
        assert got[3] == "https://ex.com:8443/p"
        assert got[4] == "http://ex.com/"
        assert got[5] == "not a url"
        assert got[6] == "http://ex.com/p"


class TestMaxMatchTokenize:
    def _counts(self, spark, texts, **kw):
        from flnr_wins_spark.functions.text import maxmatch_token_counts

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        return {
            r.tok: r.total for r in maxmatch_token_counts(df, **kw).collect()
        }

    def test_char_fallback_after_known_prefix(self, spark):
        got = self._counts(
            spark, ["abcd abcd abcd", "abcdzz"], top_words=1
        )
        # vocab = {abcd} + chars; abcdzz -> abcd + z + z
        assert got["abcd"] == 4 and got["z"] == 2
        assert "abcdzz" not in got

    def test_greedy_takes_longest_match(self, spark):
        got = self._counts(spark, ["ab abc abx"], top_words=2)
        # vocab words (count ties broken by word asc): {ab, abc} + chars
        # abx -> ab + x (greedy from the left, abx itself not in vocab)
        assert got["ab"] == 2 and got["abc"] == 1 and got["x"] == 1

    def test_early_exit_equals_fixed_rounds(self, spark):
        texts = ["the quick brown fox jumps over the lazy dog" * 2, "qzqzqzqz"]
        a = self._counts(spark, texts, top_words=3)
        b = self._counts(spark, texts, top_words=3, max_rounds=16)
        assert a == b

    def test_long_words_truncate(self, spark):
        got = self._counts(spark, ["a" * 40], top_words=0, max_word_len=16)
        # truncated to 16 chars, all-char fallback
        assert got == {"a": 16}


class TestQoiCodec:
    def test_round_trip_all_ops(self, spark):
        from flnr_wins_spark.functions.multimodal import _decode_qoi, encode_qoi

        # crafted stream walking every op family: run, diff, luma, literal,
        # index revisit
        px = bytearray()
        r, g, b = 10, 20, 30
        px += bytes((r, g, b)) * 5                     # RUN
        r, g, b = r + 1, g - 2, b + 1                  # DIFF
        px += bytes((r, g, b))
        r, g, b = r + 20 + 5, g + 20, b + 20 - 3       # LUMA
        px += bytes((r, g, b))
        px += bytes((200, 5, 99))                      # RGB literal
        px += bytes((10, 20, 30))                      # INDEX (seen before)
        while len(px) < 3 * 16:
            px += bytes((0, 0, 0))
        enc = encode_qoi(3, 4, 4, bytes(px))
        assert enc[:4] == b"qoif"
        c, w, h, out = _decode_qoi(enc)
        assert (c, w, h) == (3, 4, 4) and out == bytes(px)

    def test_wrap_matches_local_encode(self, spark):
        from flnr_wins_spark.functions.multimodal import encode_qoi, wrap_qoi

        px = bytes(range(48))  # 4x4 RGB
        media = spark.createDataFrame(
            [(1, bytearray(px), ("image/qoi", 4, 4, 48))],
            "media_id long, content binary, meta struct<mime:string,width:int,height:int,n_bytes:bigint>",
        )
        got = bytes(wrap_qoi(media, 4, 4).collect()[0].content)
        assert got == encode_qoi(3, 4, 4, px)

    def test_run_compresses(self, spark):
        from flnr_wins_spark.functions.multimodal import _decode_qoi, encode_qoi

        px = bytes([7, 8, 9]) * 100
        enc = encode_qoi(3, 10, 10, px)
        assert len(enc) < 40  # header 14 + few run bytes + end marker 8
        assert _decode_qoi(enc)[3] == px


class TestCodecGuards:
    def test_qoi_truncated_raises(self, spark):
        from flnr_wins_spark.functions.multimodal import _decode_qoi, encode_qoi

        import pytest

        enc = encode_qoi(3, 4, 4, bytes(range(48)))
        with pytest.raises((ValueError, IndexError)):
            _decode_qoi(enc[: len(enc) // 2])

    def test_qoi_bad_magic_raises(self, spark):
        from flnr_wins_spark.functions.multimodal import _decode_qoi

        import pytest

        with pytest.raises(ValueError):
            _decode_qoi(b"nope" + b"\x00" * 20)

    def test_unknown_container_honest_guard(self, spark):
        from flnr_wins_spark.functions.multimodal import decode_image

        import pytest

        # JPEG now really decodes; a truncated stream fails loudly rather
        # than guard-raising, and unknown containers keep the honest guard
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0JFIF-ish")
        with pytest.raises(NotImplementedError):
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_minhash_signatures_match_reference(spark):
    """Regression pin for the PySpark Column-API lambda-collision bug: many
    top-level F.transform(lambda ...) columns in ONE select silently corrupt
    each other's values (SQL-parsed F.expr lambdas are immune — that's what
    minhash_signature_table now uses). Every md5 min-hash must equal the
    hashlib-recomputed minimum over the row's own shingle set, in the full
    16-column select context where the old code was wrong."""
    import hashlib

    from flnr_wins_spark.operators.dedup import minhash_signature_table

    docs = spark.createDataFrame(
        [(i, f"w{i} " + "the quick brown fox jumps over dog number %d" % (i % 3))
         for i in range(8)],
        "doc_id bigint, text string",
    )
    agg = minhash_signature_table(docs, "text", "doc_id", num_hash_tables=16, hash_fn="md5")
    for row in agg.collect():
        for i in range(16):
            want = min(
                hashlib.md5(f"{sh}:{42 + i}".encode()).hexdigest() for sh in row.shset
            )
            assert row.sig[i] == want, (row.id, i)


def test_maxmatch_empty_corpus(spark):
    from flnr_wins_spark.functions.text import maxmatch_token_counts

    df = spark.createDataFrame([(1, "!!! ???"), (2, "")], "doc_id bigint, text string")
    out = maxmatch_token_counts(df)
    assert out.count() == 0 and out.columns == ["tok", "total"]


class TestAdpcm:
    def test_constant_blocks_decode_bit_exactly(self, spark):
        from flnr_wins_spark.functions.multimodal import decode_wav, encode_wav_adpcm

        vals = [0, 100, -32768, 32767, -5, 1234, -9999, 42]
        samples = [v for v in vals for _ in range(9)]
        ch, rate, out = decode_wav(encode_wav_adpcm(8000, samples))
        assert (ch, rate) == (1, 8000)
        assert out == samples

    def test_sloped_signal_tracks_after_adaptation(self, spark):
        import math

        from flnr_wins_spark.functions.multimodal import decode_wav, encode_wav_adpcm

        sig = [int(8000 * math.sin(i / 5)) for i in range(90)]
        _, _, out = decode_wav(encode_wav_adpcm(8000, sig, samples_per_block=9))
        # first block is the cold-start ramp (step index adapts from 0);
        # once adapted the per-sample error is step-bounded and small
        tail_err = max(abs(a - b) for a, b in zip(sig[18:], out[18:]))
        assert tail_err < 600
        # headers resync the predictor every block: block-start samples exact
        assert all(out[i] == sig[i] for i in range(0, 90, 9))

    def test_bad_step_index_rejected(self, spark):
        from flnr_wins_spark.functions.multimodal import decode_wav, encode_wav_adpcm

        data = bytearray(encode_wav_adpcm(8000, [7] * 9))
        # corrupt the block header's step index past the table
        idx = data.index(b"data") + 8 + 2
        data[idx] = 120
        import pytest

        with pytest.raises(ValueError, match="step index"):
            decode_wav(bytes(data))


def test_minhash_index_refresh_equals_fresh_build(spark, tmp_path):
    """The persisted-dedup-index entry's refresh claim, pinned: appending
    a new batch's signature rows to the index (the next write_snapshot —
    O(new) signing work) yields EXACTLY the index a full rebuild over the
    combined corpus would, so a later probe returns identical pairs
    either way."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.dedup import (
        exact_jaccard,
        minhash_bands,
        minhash_signature_table,
    )
    from flnr_wins_spark.sources.snapshots import read_snapshot, write_snapshot

    texts = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 4} end") for i in range(12)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    probe_docs = docs.filter(F.col("doc_id") % 3 == 2)

    def sig(d):
        return minhash_signature_table(d, "text", "doc_id", num_hash_tables=8, hash_fn="md5")

    base = str(tmp_path)
    write_snapshot(sig(b0), f"{base}/idx")                      # v1: batch 0
    write_snapshot(sig(b0).unionByName(sig(b1)), f"{base}/idx")  # v2: refresh

    def probe(index_df):
        pb = minhash_bands(sig(probe_docs), 8).withColumnRenamed("id", "id_new")
        ib = minhash_bands(index_df, 8).withColumnRenamed("id", "id_base")
        cand = pb.join(ib, ["band", "mhv"]).select("id_new", "id_base").distinct()
        a = sig(probe_docs).select(F.col("id").alias("id_new"), F.col("shset").alias("sh_n"))
        b = index_df.select(F.col("id").alias("id_base"), F.col("shset").alias("sh_b"))
        out = (
            cand.join(a, "id_new").join(b, "id_base")
            .select("id_new", "id_base", exact_jaccard(F.col("sh_n"), F.col("sh_b")).alias("j"))
            .filter(F.col("j") >= 0.5)
        )
        return sorted((r.id_new, r.id_base, r.j) for r in out.collect())

    refreshed = probe(read_snapshot(spark, f"{base}/idx"))       # loaded v2
    fresh = probe(sig(b0.unionByName(b1)))                        # full rebuild
    assert refreshed == fresh and len(refreshed) > 0


def test_dhash_bits_gradient_luma_and_downsample():
    """dHash exactness on the paths the graded PGM entry does NOT touch:
    RGB integer luma and the nearest-neighbor downsample. A horizontal
    dark->bright ramp hashes to all-ones (left < right everywhere ->
    bits CLEAR... direction check: bit set iff left > right), a reverse
    ramp to all-ones, and an 18x16 image downsamples to the same hash as
    its 9x8 half-size twin."""
    from flnr_wins_spark.functions.multimodal import dhash_bits

    def pgm(w, h, pix):
        return f"P5\n{w} {h}\n255\n".encode() + bytes(pix)

    # increasing ramp: left < right everywhere -> no bit set
    inc = [x * 20 for x in range(9)] * 8
    assert dhash_bits(pgm(9, 8, inc)) == 0
    # decreasing ramp: left > right everywhere -> all 64 bits set
    dec = [(8 - x) * 20 for x in range(9)] * 8
    assert dhash_bits(pgm(9, 8, dec)) == (1 << 64) - 1
    # downsample: 2x-scaled image hashes identically (nearest neighbor)
    base = [(x * 37 + y * 11) % 251 for y in range(8) for x in range(9)]
    big = [
        base[(y // 2) * 9 + (x // 2)] for y in range(16) for x in range(18)
    ]
    assert dhash_bits(pgm(18, 16, big)) == dhash_bits(pgm(9, 8, base))
    # RGB luma: a P6 whose luma equals the P5 above hashes identically
    rgb = []
    for v in base:
        rgb += [v, v, v]  # (299v+587v+114v)//1000 == v
    p6 = f"P6\n9 8\n255\n".encode() + bytes(rgb)
    assert dhash_bits(p6) == dhash_bits(pgm(9, 8, base))


def test_audio_fingerprint_channels_and_guards():
    """Fingerprint exactness on the paths the graded entry does NOT
    touch: stereo clips fingerprint on channel 0 only, and a clip too
    short for the frame count fails loudly."""
    import pytest

    from flnr_wins_spark.functions.multimodal import audio_fingerprint_bits

    def wav(channels, samples):
        import struct

        data = b"".join(struct.pack("<h", s) for s in samples)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, 8000,
                          8000 * 2 * channels, 2 * channels, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        return hdr + data

    # mono ramp-up energies -> no gradient bit set; ramp-down -> all set
    up = [i * 10 for i in range(130)]
    assert audio_fingerprint_bits(wav(1, up)) == 0
    down = [(130 - i) * 10 for i in range(130)]
    assert audio_fingerprint_bits(wav(1, down)) == (1 << 64) - 1
    # stereo: channel 1 is LOUD noise; fingerprint must follow channel 0
    import itertools

    stereo = list(
        itertools.chain.from_iterable(
            (s, 30000 if i % 2 == 0 else -30000) for i, s in enumerate(up)
        )
    )
    assert audio_fingerprint_bits(wav(2, stereo)) == 0
    with pytest.raises(ValueError, match="needs at least"):
        audio_fingerprint_bits(wav(1, [5] * 10))
