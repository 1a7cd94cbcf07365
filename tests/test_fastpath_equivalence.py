"""Fast-path == portable-twin equivalence pins.

Five registry entries run xxhash64/HLL fast paths the DuckDB oracle
cannot grade directly (their portable md5 twins carry the hash-checked
evidence). These tests make each ungraded fast path inherit that evidence:
every fast path is asserted equal to an independent construction — the
portable mode, an explode-based ground truth, an exact-scan equivalent, or
a pure-Python reimplementation — on a fixture.

Entry -> test map:
  x_dedup_minhash_lsh      -> TestMinhashFastPath (plus the md5==xx pair
                              test in test_extensions.py)
  x_dedup_simhash          -> TestSimhashFastPath
  x_similarity_ann_lsh     -> TestAnnLshFastPath
  x_similarity_ivf         -> TestIvfFastPath
  x_text_langid            -> oracle-graded since r6 (pure-SQL twin of the
                              UDF); TestLangidFastPath stays as the
                              pure-Python third implementation
  q_events_approx_distinct -> TestApproxDistinct
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestMinhashFastPath:
    def test_xxhash64_signatures_match_explode_ground_truth(self, spark):
        """The shingle-major fold (aggregate + zip_with/least) must produce
        the same per-table minima as a lambda-free explode -> groupBy-min
        over the SAME two-tier hash — an independent Spark construction
        that cannot share the fold's (historical) lambda-collision or
        init-value bugs."""
        from flnr_wins_spark.operators.dedup import minhash_signature_table

        docs = spark.createDataFrame(
            [(i, f"u{i} " + "alpha beta gamma delta epsilon zeta %d" % (i % 4))
             for i in range(12)],
            "doc_id bigint, text string",
        )
        agg = minhash_signature_table(
            docs, "text", "doc_id", num_hash_tables=16, hash_fn="xxhash64"
        )
        truth = (
            agg.select("id", F.explode("shset").alias("s"))
            .select(
                "id",
                *[
                    F.expr(f"xxhash64(xxhash64(s), CAST(42 + {i} AS INT))").alias(
                        f"h{i}"
                    )
                    for i in range(16)
                ],
            )
            .groupBy("id")
            .agg(*[F.min(f"h{i}").alias(f"m{i}") for i in range(16)])
        )
        want = {r["id"]: [r[f"m{i}"] for i in range(16)] for r in truth.collect()}
        for row in agg.collect():
            assert list(row.sig) == want[row.id], row.id

    def test_max_shingles_cap_is_prefix_slice(self, spark):
        from flnr_wins_spark.operators.dedup import minhash_signature_table

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(100)))], "doc_id bigint, text string"
        )
        full = minhash_signature_table(docs, "text", "doc_id").collect()[0]
        capped = minhash_signature_table(
            docs, "text", "doc_id", max_shingles=10
        ).collect()[0]
        assert len(capped.shset) == 10
        assert list(capped.shset) == list(full.shset)[:10]


class TestSimhashFastPath:
    def test_fast_and_portable_modes_agree_on_pairs(self, spark):
        """Different hash families give different signatures, but the PAIR
        decisions must coincide on a fixture whose duplicates are exact
        (identical docs -> identical signatures in any mode -> hamming 0)
        and whose non-dups are token-disjoint (expected hamming ~bits/2,
        far beyond the cap, in any mode)."""
        from flnr_wins_spark.operators.dedup import simhash_pairs, simhash_signatures

        vocab = [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten",
            "red orange yellow green blue indigo violet umber ochre teal",
        ]
        rows = []
        for i, text in enumerate(vocab):
            rows += [(10 * i, text), (10 * i + 1, text)]  # exact-dup pair each
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        fast = simhash_pairs(
            simhash_signatures(docs, "text", "doc_id", hash_fn="xxhash64", bits=64),
            max_hamming=8, bands=4, bits=64,
        )
        portable = simhash_pairs(
            simhash_signatures(docs, "text", "doc_id", hash_fn="md5", bits=60),
            max_hamming=8, bands=4, bits=60,
        )
        fp = {(r.id_a, r.id_b) for r in fast.collect()}
        pp = {(r.id_a, r.id_b) for r in portable.collect()}
        assert fp == pp == {(0, 1), (10, 11), (20, 21)}


class TestAnnLshFastPath:
    def test_fast_and_portable_modes_agree_on_clustered_vectors(self, spark):
        """Near-identical vectors share hyperplane signs in ANY hash mode,
        so on a tight-cluster fixture both modes recall the same
        candidates and the exact re-rank makes their outputs identical."""
        from flnr_wins_spark.functions.vectors import ann_lsh_topk

        dim = 16
        rows = []
        for c in range(3):  # 3 well-separated clusters of 4
            base = [1.0 if d % 3 == c else 0.05 * c for d in range(dim)]
            for j in range(4):
                vec = list(base)
                vec[(5 * j) % dim] += 0.01 * j  # tiny intra-cluster jitter
                rows.append((4 * c + j, vec))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = emb.filter(F.col("vec_id") % 4 == 0)

        def run(mode):
            out = ann_lsh_topk(q, emb, dim=dim, k=3, hash_fn=mode)
            return {
                (r.query_id, r.cand_id, r.rank, round(r.cosine, 9))
                for r in out.collect()
            }

        fast, portable = run("xxhash64"), run("md5")
        assert fast == portable and fast
        # every query's top hit is from its own cluster
        top = {r[0]: r[1] for r in fast if r[2] == 1}
        for qid, cid in top.items():
            assert qid // 4 == cid // 4


class TestIvfFastPath:
    def test_full_probe_equals_brute_force(self, spark):
        """nprobe == nlist makes IVF search every cell — the pruning
        disappears and the output must equal the exact scan, rank for
        rank. This is the invariant that makes nprobe a pure
        recall/latency dial rather than a correctness knob."""
        from flnr_wins_spark.functions.vectors import brute_force_topk, ivf_topk

        rows = [
            (i, [((i * 7 + d * 3) % 13) / 13.0 + 0.1 for d in range(8)])
            for i in range(30)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.cand_id, r.rank): round(r.cosine, 12)
            for r in brute_force_topk(q, emb, k=4).collect()
        }
        ivf = {
            (r.query_id, r.cand_id, r.rank): round(r.cosine, 12)
            for r in ivf_topk(q, emb, nlist=4, nprobe=4, k=4).collect()
        }
        assert ivf == exact and exact


class TestLangidFastPath:
    def test_langid_and_fingerprint_match_pure_python_reimpl(self, spark):
        """The pandas-UDF fast path vs an independent driver-side
        recomputation (own stopword vote + own Rabin-Karp loop) over real
        fixture documents — the per-row contract the rows-only entry
        can't get from the oracle."""
        from flnr_wins_spark.functions.text import _LANG_PROFILES, lang_id, rolling_fingerprint

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang")
            .limit(60)
        )
        got = {
            r.doc_id: (r.pred, r.fp)
            for r in docs.select(
                "doc_id",
                lang_id(F.col("text")).alias("pred"),
                rolling_fingerprint(F.col("text")).alias("fp"),
            ).collect()
        }
        MOD, BASE = (1 << 61) - 1, 1_000_003
        for row in docs.collect():
            text = row.text or ""
            if any("一" <= ch <= "鿿" for ch in text[:400]):
                want_lang = "zh"
            else:
                toks = set(text.lower().split())
                want_lang, best = "und", 0
                for lang, prof in _LANG_PROFILES.items():
                    s = len(toks & prof)
                    if s > best:
                        want_lang, best = lang, s
                if best == 0:
                    want_lang = "en" if text else "und"
            h = 0
            for tok in text.split():
                th = 0
                for ch in tok:
                    th = (th * 131 + ord(ch)) % MOD
                h = (h * BASE + th) % MOD
            assert got[row.doc_id] == (want_lang, h), row.doc_id


class TestApproxDistinct:
    def test_hll_within_rsd_bound_of_exact(self, spark):
        """HLL sketches aren't oracle-comparable across engines; the
        correctness contract is the rsd bound against the exact count —
        asserted at 5 sigma of the configured 2% rsd."""
        rows = [(f"t{i % 3}", i % 700) for i in range(5000)]
        df = spark.createDataFrame(rows, "event_type string, user_id int")
        out = df.groupBy("event_type").agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        for r in out.collect():
            assert abs(r.approx_users - r.exact_users) <= 0.1 * r.exact_users


class TestTextCleaning:
    def test_html_strip_entities_and_double_escapes(self, spark):
        from flnr_wins_spark.functions.text import html_strip
        from pyspark.sql import functions as F

        rows = [
            (1, "<p>a  b</p>", "a b"),
            (2, "x &amp; y", "x & y"),
            # double-escape survives: &amp;lt; must become the LITERAL &lt;
            (3, "&amp;lt;not-a-tag&amp;gt;", "&lt;not-a-tag&gt;"),
            (4, "<a href='q'>link</a>trail", "link trail"),
            (5, "&quot;q&quot; &apos;a&apos;", "\"q\" 'a'"),
            (6, "", ""),
        ]
        df = spark.createDataFrame([(i, s) for i, s, _ in rows], "id long, s string")
        got = {r.id: r.c for r in df.select("id", html_strip(F.col("s")).alias("c")).collect()}
        for i, _, want in rows:
            assert got[i] == want, i

    def test_nfc_composes_combining_marks(self, spark):
        import unicodedata

        from flnr_wins_spark.functions.text import nfc_normalize
        from pyspark.sql import functions as F

        decomposed = "éclair; Å; b̀"  # é, Å, b+grave(no precomposed)
        df = spark.createDataFrame([(1, decomposed)], "id long, s string")
        got = df.select(nfc_normalize(F.col("s")).alias("n")).collect()[0].n
        assert got == unicodedata.normalize("NFC", decomposed)
        assert "é" in got and "Å" in got  # composed forms present
        assert "b̀" in got  # no precomposed b-grave: stays decomposed

    def test_nfc_preserves_null(self, spark):
        """Advisor finding (r5): NULL must map to NULL (the oracle's
        nfc_normalize(NULL) and Spark string-function convention), not to
        the empty string."""
        from flnr_wins_spark.functions.text import nfc_normalize
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
        got = {r.id: r.n for r in
               df.select("id", nfc_normalize(F.col("s")).alias("n")).collect()}
        assert got[1] is None and got[2] == "x"


class TestOptimalSegmentation:
    def test_optimal_beats_greedy_on_crafted_vocab(self, spark):
        """'abcd' with vocab {abc, cd, ab, a..d}: greedy longest-first takes
        abc + d = 2... craft the classic case where greedy is WORSE:
        vocab {ab, abc, cde, c, d, e}: 'abcde' greedy = abc+d+e (3),
        optimal = ab+cde (2)."""
        from flnr_wins_spark.functions.text import optimal_segment_stats

        # corpus frequencies force the vocab: make 'ab', 'abc', 'cde'
        # frequent whole words, then measure the rare word 'abcde'
        rows = (
            [(i, "ab abc cde") for i in range(50)]
            + [(1000, "abcde")]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # top_words=3 keeps only the frequent {ab, abc, cde} as whole-word
        # vocab — the rare 'abcde' itself must NOT enter the vocabulary
        out = {r.w: r.n_pieces for r in
               optimal_segment_stats(df, top_words=3, top_k=50).collect()}
        assert out["ab"] == 1 and out["abc"] == 1 and out["cde"] == 1
        assert out["abcde"] == 2  # ab + cde; greedy would need 3 (abc,d,e)

    def test_char_fallback_always_segments(self, spark):
        from flnr_wins_spark.functions.text import optimal_segment_stats

        df = spark.createDataFrame(
            [(1, "zzqqxx unseen")], "doc_id long, text string"
        )
        out = {r.w: (r.n_chars, r.n_pieces) for r in
               optimal_segment_stats(df, top_words=0, top_k=50).collect()}
        # with no whole-word vocab, every word segments to its chars
        assert out["zzqqxx"] == (6, 6) and out["unseen"] == (6, 6)


class TestLlmCoreReviewFixes:
    def test_exact_dedup_keeps_all_null_text_rows(self, spark):
        """Review finding: NULL digests grouped into one window partition,
        silently deleting all but one failed-extraction row. NULL text has
        no content to compare — every such row is kept (n_copies=1)."""
        from flnr_wins_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "x"), (4, "x")], "doc_id long, text string"
        )
        out = {r.doc_id: r.n_copies for r in exact_dedup(df, "text", "doc_id").collect()}
        assert out == {1: 1, 2: 1, 3: 2}

    def test_simhash_signatures_skip_null_text(self, spark):
        """Review finding: NULL text folded to signature 0, pairing every
        contentless doc with every other at hamming 0."""
        from flnr_wins_spark.operators.dedup import simhash_signatures

        df = spark.createDataFrame(
            [(1, None), (2, "a b c"), (3, None)], "doc_id long, text string"
        )
        sigs = simhash_signatures(df, "text", "doc_id").collect()
        assert [r.id for r in sigs] == [2]

    def test_knn_classify_uses_colliding_id_train_rows(self, spark):
        """Review finding: brute_force_topk's self-exclusion filtered out
        train rows whose id equals the query's id even though queries and
        train are disjoint datasets with separate id namespaces."""
        from flnr_wins_spark.functions.vectors import knn_classify

        q = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
        train = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 7),   # id collides with the query; nearest
                (2, [0.9, 0.1], 7),
                (3, [0.0, 1.0], 9),
                (4, [0.1, 1.0], 9),
                (5, [0.0, 0.9], 9),
            ],
            "vec_id long, embedding array<double>, label int",
        )
        out = knn_classify(q, train, k=3).collect()[0]
        # with row 1 included the 3-NN are labels {7,7,9} -> 7; the old
        # exclusion made them {7,9,9} -> 9
        assert out.pred_lbl == 7 if hasattr(out, "pred_lbl") else out[1] == 7

    def test_embedding_covariance_survives_bigint_scale(self, spark):
        """Review finding: cov_num cast to BIGINT silently NULLed past
        ~3e5 rows; the DECIMAL(38,0) output must stay exact and pca must
        accept it."""
        from flnr_wins_spark.functions.vectors import embedding_covariance

        # big values so n*Sxy exceeds what float64 could even hold exactly
        rows = [(i, [30000.0, -30000.0]) for i in range(2000)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {(r.i, r.j): r for r in embedding_covariance(df, 2, scale=4).collect()}
        v = out[(0, 0)]
        assert v.cov_num is not None
        q = 30000 * 10**4
        assert int(v.sxy) == 2000 * q * q  # 1.8e23 — far beyond BIGINT
        assert int(v.cov_num) == 2000 * int(v.sxy) - int(v.sx) * int(v.sx)


class TestCompressionRatio:
    def test_repetitive_text_compresses_far_below_prose(self, spark):
        from flnr_wins_spark.functions.text import compression_ratio
        from pyspark.sql import functions as F

        import random

        rng = random.Random(7)
        prose = " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(200)
        )
        rows = [
            (1, "spam spam spam " * 100),  # template junk
            (2, prose),                    # high-entropy "natural" text
            (3, None),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r.id: r.cr for r in
               df.select("id", compression_ratio(F.col("text")).alias("cr")).collect()}
        assert got[1] < 0.15 < got[2] <= 1.2
        assert got[3] is None and got[4] is None

    def test_matches_driver_zlib_exactly(self, spark):
        import zlib

        from flnr_wins_spark.functions.text import compression_ratio
        from pyspark.sql import functions as F

        t = "the quick brown fox jumps over the lazy dog " * 10
        df = spark.createDataFrame([(1, t)], "id long, text string")
        got = df.select(compression_ratio(F.col("text")).alias("cr")).collect()[0].cr
        raw = t.encode()
        assert got == len(zlib.compress(raw, 6)) / len(raw)


class TestUnigramLm:
    def test_frequent_short_word_is_one_piece_and_scores_rank_sanely(self, spark):
        from flnr_wins_spark.functions.text import unigram_lm_stats

        docs = spark.createDataFrame(
            [(i, "data " * 20 + "qzxvkj") for i in range(5)],
            "doc_id long, text string",
        )
        got = {r.w: r for r in unigram_lm_stats(docs).collect()}
        # 'data' (<= max_piece_len) is its own vocabulary piece: 1-piece
        # Viterbi segmentation with a better (less negative) score than the
        # rare junk word, which must fall back to characters
        assert got["data"].n_pieces == 1
        assert got["qzxvkj"].n_pieces >= 2
        assert got["data"].score_e9 > got["qzxvkj"].score_e9
        assert got["data"].n_occ == 100 and got["qzxvkj"].n_occ == 5

    def test_viterbi_prefers_likely_pieces_over_fewest(self, spark):
        """Unigram-LM's defining behavior vs minimal-piece DP: with 'ab'
        overwhelmingly frequent and 'abab' rare-but-present, the word
        'abab' segments as ab+ab (2 likely pieces) when 2*ln P(ab) beats
        ln P(abab) — the probability objective, not the piece-count one."""
        from flnr_wins_spark.functions.text import unigram_lm_stats

        docs = spark.createDataFrame(
            [(0, "ab " * 400 + "abab")], "doc_id long, text string"
        )
        got = {r.w: r for r in unigram_lm_stats(docs).collect()}
        # ln P(ab) ~ ln(~0.45); 2x that ~ -1.6 vs ln P(abab) ~ ln(1/total)
        # ~ -7: the two-piece segmentation wins despite more pieces
        assert got["abab"].n_pieces == 2

    def test_deterministic_across_partitionings(self, spark):
        from flnr_wins_spark.functions.text import unigram_lm_stats

        docs = spark.createDataFrame(
            [(i, f"alpha beta{i % 7} gamma delta{i % 3}") for i in range(60)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, unigram_lm_stats(docs).collect()))
        b = sorted(map(tuple, unigram_lm_stats(docs.repartition(11)).collect()))
        assert a == b  # exact decimal DP: bit-identical, not approximate
