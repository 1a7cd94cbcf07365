"""Tests for blocked fuzzy join (operators/linkage.py) and phrase search
(functions/search.py positional postings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.operators.linkage import fuzzy_join
from flnr_wins_spark.functions.search import phrase_search


def test_fuzzy_join_finds_edits_within_band(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zenith ltd"), (3, "acme company")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "acme cor"), (12, "zenith ltd xx"), (13, "acme co")],
        "rid long, rname string",
    )
    out = fuzzy_join(left, right, "name", "rname", max_dist=2)
    pairs = {(r["id"], r["rid"], r["dist"]) for r in out.collect()}
    assert (1, 10, 1) in pairs          # one insert
    assert (1, 11, 1) in pairs          # one delete
    assert (2, 12, 3) not in pairs      # 3 edits > max_dist
    assert all(d <= 2 for _, _, d in pairs)


def test_fuzzy_join_emits_each_pair_once(spark):
    left = spark.createDataFrame([(1, "abcd")], "id long, name string")
    right = spark.createDataFrame([(9, "abcde")], "rid long, rname string")
    out = fuzzy_join(left, right, "name", "rname", max_dist=2).collect()
    assert len(out) == 1  # 3x band replication must not duplicate hits


def test_fuzzy_join_hot_block_guard(spark):
    left = spark.createDataFrame([(1, "aaaa")], "id long, name string")
    right = spark.createDataFrame(
        [(i, "aaab") for i in range(20)], "rid long, rname string"
    )
    out = fuzzy_join(left, right, "name", "rname", max_dist=2, max_block_width=10)
    assert out.count() == 0  # degenerate block dropped, not exploded


def test_phrase_search_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data big data pipelines big data"),
            (2, "data big data"),
            (3, "big pipelines data"),   # terms present, never adjacent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_hits"] for r in phrase_search(docs, ["big", "data"]).collect()}
    assert out == {1: 3, 2: 1}


def test_phrase_search_three_terms(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b"), (3, "c a c b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_hits"] for r in phrase_search(docs, ["a", "b", "c"]).collect()}
    assert out == {1: 1}


def test_random_projection_shape_and_determinism(spark):
    from flnr_wins_spark.functions.vectors import random_projection

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(16)]), (2, [1.0] * 16)],
        "vec_id long, embedding array<double>",
    )
    out1 = random_projection(df, dim=16, out_dim=4).collect()
    out2 = random_projection(df.repartition(7), dim=16, out_dim=4).collect()
    assert all(len(r["rp"]) == 4 for r in out1)
    assert {r["id"]: r["rp"] for r in out1} == {r["id"]: r["rp"] for r in out2}
    # signs are +-1 only: projecting the all-ones vector gives an integer sum
    ones = [r["rp"] for r in out1 if r["id"] == 2][0]
    assert all(v == int(v) and abs(v) <= 16 for v in ones)


def test_tfidf_pairs_rank_rare_term_overlap_higher(spark):
    from flnr_wins_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "unique glyph unique glyph common common common"),
            (2, "unique glyph unique glyph common common other"),
            (3, "common common common common common common stuff"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r["cosine"]
             for r in tfidf_cosine_pairs(docs, min_cosine=0.0, max_df=10).collect()}
    # rare-term overlap dominates; (1,3) share only 'common', whose
    # idf = ln(3/3) = 0 zeroes its weight entirely
    assert pairs[(1, 2)] > pairs.get((1, 3), 0.0)
    assert pairs[(1, 2)] > 0.7


def test_tfidf_unpersist_releases_weight_cache(spark):
    """Advisor finding (r5): tfidf_cosine_pairs persisted its corpus-sized
    weight table with no release path — repeated calls in a long session
    accumulate cached corpora. Mirror minhash_lsh_pairs: unpersist=True
    pins the tiny pairs result and drops the weight cache."""
    from flnr_wins_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "unique glyph unique glyph common common common"),
            (2, "unique glyph unique glyph common common other"),
            (3, "common common common common common common stuff"),
        ],
        "doc_id long, text string",
    )
    jsc = spark.sparkContext._jsc
    base = set(jsc.getPersistentRDDs().keySet().toArray())
    results = []
    for _ in range(2):
        out = tfidf_cosine_pairs(docs, min_cosine=0.0, max_df=10, unpersist=True)
        results.append({(r["a"], r["b"]) for r in out.collect()})
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    # <= 1 new persisted RDD per call (the checkpointed pairs); the weight
    # cache itself was registered AND released inside each call
    assert len(after - base) <= 2
    assert results[0] == results[1] and (1, 2) in results[0]


def test_tfidf_max_df_prunes_hot_terms(spark):
    from flnr_wins_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(i, "boiler plate every where") for i in range(5)],
        "doc_id long, text string",
    )
    # every term exceeds max_df=3 -> no vectors survive -> no pairs
    assert tfidf_cosine_pairs(docs, min_cosine=0.0, max_df=3).count() == 0


class TestSortedNeighborhood:
    def test_finds_adjacent_variants(self, spark):
        from flnr_wins_spark.operators.linkage import sorted_neighborhood

        left = spark.createDataFrame(
            [(1, "alpha centauri"), (2, "betelgeuse"), (3, "zeta reticuli")],
            "id bigint, name string",
        )
        # 1-edit variants sort right next to their originals
        right = spark.createDataFrame(
            [(11, "alpha centaurix"), (13, "zeta reticulix"), (12, "unrelated")],
            "vid bigint, vname string",
        )
        got = {
            (r.id, r.vid): r.dist
            for r in sorted_neighborhood(
                left, right, "id", "name", "vid", "vname", window=3, max_dist=2
            ).collect()
        }
        assert (1, 11) in got and got[(1, 11)] == 1
        assert (3, 13) in got and got[(3, 13)] == 1
        assert all(v != 12 for (_, v) in got)

    def test_window_bounds_candidates(self, spark):
        from flnr_wins_spark.operators.linkage import sorted_neighborhood

        left = spark.createDataFrame(
            [(i, f"k{i:03d}") for i in range(20)], "id bigint, name string"
        )
        right = spark.createDataFrame(
            [(100 + i, f"k{i:03d}x") for i in range(20)], "vid bigint, vname string"
        )
        out = sorted_neighborhood(
            left, right, "id", "name", "vid", "vname", window=2
        ).collect()
        assert all(r.pos_gap <= 2 for r in out)
        # every exact-neighbor pair (kNNN vs kNNNx sorts adjacent) is found
        found = {(r.id, r.vid) for r in out if r.dist == 1}
        assert found == {(i, 100 + i) for i in range(20)}


class TestTfidfKeywords:
    def test_idf_suppresses_ubiquitous_terms(self, spark):
        from flnr_wins_spark.functions.text import tfidf_keywords

        docs = spark.createDataFrame(
            [
                (1, "common apple apple"),
                (2, "common banana"),
                (3, "common cherry cherry cherry"),
            ],
            "doc_id bigint, text string",
        )
        out = tfidf_keywords(docs, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.term)
        # 'common' is in every doc -> idf 0 -> never a keyword
        assert all("common" not in terms for terms in by_doc.values())
        assert by_doc[1][0] == "apple" and by_doc[3][0] == "cherry"

    def test_rank_deterministic_on_ties(self, spark):
        from flnr_wins_spark.functions.text import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "zz aa"), (2, "qq ww")], "doc_id bigint, text string"
        )
        out = {
            (r.doc_id, r.kw_rank): r.term
            for r in tfidf_keywords(docs, k=2).collect()
        }
        # equal scores break ties on the term string ascending
        assert out[(1, 1)] == "aa" and out[(1, 2)] == "zz"
        assert out[(2, 1)] == "qq" and out[(2, 2)] == "ww"


class TestGoldenRecords:
    def test_consolidation_with_singletons(self, spark):
        from flnr_wins_spark.operators.linkage import golden_records

        ents = spark.createDataFrame(
            [(1, "acme corp"), (2, "acme corp."), (3, "acme inc"), (9, "zebra llc")],
            "id bigint, name string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
        )
        out = {r.cluster_id: r for r in golden_records(ents, pairs, "id", ["name"]).collect()}
        # 1-2-3 merge under survivor id 1; 9 is a singleton cluster
        assert out[1].n_members == 3 and out[1].name == "acme corp"
        assert out[9].n_members == 1 and out[9].name == "zebra llc"
        assert set(out) == {1, 9}
