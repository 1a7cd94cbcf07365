"""Unit tests for the analytics operators (funnel, retention, global rank,
equi-depth bins, winsorize, Count-Min, Bloom prefilter, group cap).

Each operator is also differentially oracle-checked via its registry entry
(plans/analytics.py); these tests pin the semantic edge cases the oracle's
fixture may not hit (strict ordering, ties, collisions, hot groups,
caller-column collisions) and the determinism contracts.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# funnel / retention
# ---------------------------------------------------------------------------


class TestFunnel:
    def _events(self, spark):
        rows = [
            # u1 completes signup -> click -> purchase strictly in order
            (1, _ts("2024-01-01T10:00:00"), "signup"),
            (1, _ts("2024-01-01T11:00:00"), "click"),
            (1, _ts("2024-01-01T12:00:00"), "purchase"),
            # u2 clicks BEFORE signup, never after -> stops at step 1
            (2, _ts("2024-01-01T09:00:00"), "click"),
            (2, _ts("2024-01-01T10:00:00"), "signup"),
            # u3 clicks at the exact signup instant -> strict > excludes it
            (3, _ts("2024-01-01T10:00:00"), "signup"),
            (3, _ts("2024-01-01T10:00:00"), "click"),
            # u4 never signs up -> not in the funnel at all
            (4, _ts("2024-01-01T10:00:00"), "purchase"),
        ]
        return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    def test_strict_ordering_and_counts(self, spark):
        from flnr_wins_spark.operators.funnel import funnel_counts

        out = funnel_counts(
            self._events(spark), ["signup", "click", "purchase"]
        ).collect()
        by_step = {r["step"]: r for r in out}
        assert by_step[1]["users"] == 3  # u1, u2, u3 signed up
        assert by_step[2]["users"] == 1  # only u1 clicked strictly after
        assert by_step[3]["users"] == 1
        assert by_step[2]["event_type"] == "click"

    def test_earliest_completion_frontier(self, spark):
        # second click earlier than first purchase must NOT reset the frontier:
        # purchase counts if after the EARLIEST click
        from flnr_wins_spark.operators.funnel import funnel_counts

        rows = [
            (1, _ts("2024-01-01T10:00:00"), "signup"),
            (1, _ts("2024-01-01T11:00:00"), "click"),
            (1, _ts("2024-01-01T13:00:00"), "click"),
            (1, _ts("2024-01-01T12:00:00"), "purchase"),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        out = {r["step"]: r["users"] for r in funnel_counts(ev, ["signup", "click", "purchase"]).collect()}
        assert out[3] == 1

    def test_empty_steps_raise(self, spark):
        from flnr_wins_spark.operators.funnel import funnel_counts

        with pytest.raises(ValueError):
            funnel_counts(self._events(spark), [])


class TestRetention:
    def test_offsets(self, spark):
        from flnr_wins_spark.operators.funnel import retention_cohorts

        rows = [
            (1, _ts("2024-01-01T10:00:00")),  # Mon wk0
            (1, _ts("2024-01-10T10:00:00")),  # wk1
            (1, _ts("2024-01-24T10:00:00")),  # wk3
            (2, _ts("2024-01-03T10:00:00")),  # same cohort week
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = retention_cohorts(ev).collect()
        grid = {(r["cohort_week"], r["week_offset"]): r["active_users"] for r in out}
        wk = dt.date(2024, 1, 1)
        assert grid[(wk, 0)] == 2
        assert grid[(wk, 1)] == 1
        assert grid[(wk, 3)] == 1
        assert (wk, 2) not in grid


# ---------------------------------------------------------------------------
# global rank / bins / winsorize
# ---------------------------------------------------------------------------


class TestGlobalRowNumber:
    def test_matches_single_partition_window(self, spark):
        from flnr_wins_spark.operators.ranking import global_row_number

        df = spark.range(500).select(
            F.col("id"), (F.col("id") * 37 % 101).alias("v")
        )
        got = {
            r["id"]: r["rn"]
            for r in global_row_number(df, ["v", "id"], num_partitions=7).collect()
        }
        want = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want

    def test_ranks_are_gapless_permutation(self, spark):
        # the ADVICE failure mode was duplicated/gapped ranks when the counts
        # branch and the rank branch saw different partition assignments;
        # localCheckpoint pins them — ranks must be exactly 1..N
        from flnr_wins_spark.operators.ranking import global_row_number

        df = spark.range(1000).select(F.col("id"), F.rand(7).alias("v"))
        rns = sorted(
            r["rn"] for r in global_row_number(df, ["v", "id"], num_partitions=13).collect()
        )
        assert rns == list(range(1, 1001))

    def test_no_caller_column_collision(self, spark):
        from flnr_wins_spark.operators.ranking import global_row_number

        df = spark.range(50).select(F.col("id"), F.lit(9).alias("_pid"))
        out = global_row_number(df, ["id"])
        assert set(out.columns) == {"id", "_pid", "rn"}
        assert out.filter(F.col("_pid") != 9).count() == 0


class TestEquidepthBins:
    def test_populations_and_monotonicity(self, spark):
        from flnr_wins_spark.operators.ranking import equidepth_bins

        df = spark.range(100).select(F.col("id"), (F.col("id") % 40).alias("v"))
        out = equidepth_bins(df, "v", "id", k=4).collect()
        pops = {}
        for r in out:
            pops[r["bucket"]] = pops.get(r["bucket"], 0) + 1
        assert pops == {1: 25, 2: 25, 3: 25, 4: 25}
        # bucket is monotone in rank
        by_rn = sorted(out, key=lambda r: r["rn"])
        assert all(a["bucket"] <= b["bucket"] for a, b in zip(by_rn, by_rn[1:]))

    def test_uneven_total(self, spark):
        from flnr_wins_spark.operators.ranking import equidepth_bins

        df = spark.range(10).select(F.col("id"), F.col("id").alias("v"))
        out = equidepth_bins(df, "v", "id", k=3).collect()
        pops = {}
        for r in out:
            pops[r["bucket"]] = pops.get(r["bucket"], 0) + 1
        assert sum(pops.values()) == 10
        assert max(pops.values()) - min(pops.values()) <= 1


class TestWinsorize:
    def test_clamps_to_rank_percentiles(self, spark):
        from flnr_wins_spark.operators.ranking import winsorize

        # values 1..100: p5 bound = value at rank 5 (=5), p95 at rank 95 (=95)
        df = spark.range(1, 101).select(F.col("id"), F.col("id").cast("double").alias("v"))
        out = {r["id"]: r["winsorized"] for r in winsorize(df, "v", "id").collect()}
        assert out[1] == 5.0 and out[4] == 5.0 and out[5] == 5.0
        assert out[50] == 50.0
        assert out[95] == 95.0 and out[96] == 95.0 and out[100] == 95.0


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------


class TestCountMin:
    def test_overestimate_invariant(self, spark):
        from flnr_wins_spark.functions.sketches import countmin_estimates

        df = spark.range(2000).select((F.col("id") % 97).alias("k"))
        out = countmin_estimates(df, "k", depth=4, hex_chars=1).collect()
        assert len(out) == 97
        assert all(r["est_cnt"] >= r["true_cnt"] for r in out)

    def test_exact_when_wide(self, spark):
        # 16^4 = 65536 buckets vs 20 items: collision probability ~0 per seed,
        # and min over 4 seeds needs ALL to collide -> estimates are exact
        from flnr_wins_spark.functions.sketches import countmin_estimates

        df = spark.range(200).select((F.col("id") % 20).alias("k"))
        out = countmin_estimates(df, "k", depth=4, hex_chars=4).collect()
        assert all(r["est_cnt"] == r["true_cnt"] for r in out)


class TestBloomPrefilter:
    def test_superset_of_semi_join_and_exact_finish(self, spark):
        from flnr_wins_spark.functions.sketches import bloom_prefilter

        big = spark.range(3000).select((F.col("id") % 300).alias("k"), F.col("id"))
        keys = spark.range(40).select((F.col("id") * 7).alias("kk"))
        pre = bloom_prefilter(big, keys, "k", "kk", depth=3, hex_chars=1)
        exact = big.join(keys, big["k"] == keys["kk"], "left_semi")
        pre_ids = {r["id"] for r in pre.collect()}
        exact_ids = {r["id"] for r in exact.collect()}
        assert exact_ids <= pre_ids  # no false negatives, ever
        # exact semi-join on survivors == exact semi-join directly
        finish = pre.join(keys, pre["k"] == keys["kk"], "left_semi")
        assert {r["id"] for r in finish.collect()} == exact_ids
        # and the narrow buckets actually pruned something
        assert len(pre_ids) < big.count()

    def test_caller_bucket_column_no_collision(self, spark):
        from flnr_wins_spark.functions.sketches import bloom_prefilter

        big = spark.range(100).select(
            (F.col("id") % 10).alias("k"), F.lit("boom").alias("_bloom_bucket")
        )
        keys = spark.range(3).select(F.col("id").alias("kk"))
        out = bloom_prefilter(big, keys, "k", "kk", depth=2, hex_chars=2)
        semi = {r["k"] for r in out.collect()}
        assert {0, 1, 2} <= semi


# ---------------------------------------------------------------------------
# group cap
# ---------------------------------------------------------------------------


class TestGroupCap:
    def test_cap_and_determinism(self, spark):
        from flnr_wins_spark.operators.sample import group_cap

        df = spark.range(500).select(
            (F.col("id") % 5).cast("string").alias("g"), F.col("id")
        )
        a = group_cap(df, ["g"], "id", k=7)
        counts = {r["g"]: r["n"] for r in a.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert all(v == 7 for v in counts.values())
        b = group_cap(df, ["g"], "id", k=7)
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}

    def test_small_groups_kept_whole(self, spark):
        from flnr_wins_spark.operators.sample import group_cap

        df = spark.range(3).select(F.lit("g").alias("g"), F.col("id"))
        assert group_cap(df, ["g"], "id", k=10).count() == 3

    def test_prefilter_path_bounded_and_deterministic(self, spark):
        from flnr_wins_spark.operators.sample import group_cap

        df = spark.range(5000).select(
            (F.col("id") % 3).cast("string").alias("g"), F.col("id")
        )
        out = group_cap(df, ["g"], "id", k=5, prefilter_margin=4.0)
        counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert all(v <= 5 for v in counts.values())
        again = group_cap(df, ["g"], "id", k=5, prefilter_margin=4.0)
        assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
        # with a generous margin the prefilter should not change the result
        exact = group_cap(df, ["g"], "id", k=5)
        assert {tuple(r) for r in out.collect()} == {tuple(r) for r in exact.collect()}


# ---------------------------------------------------------------------------
# containment / unigram quality / z-order / fill-forward
# ---------------------------------------------------------------------------


class TestContainment:
    def test_small_doc_inside_big_doc(self, spark):
        from flnr_wins_spark.operators.dedup import containment_pairs, shingle_sets

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "intro words alpha beta gamma delta and a very long tail "
                    "of unrelated content continuing on and on"),
                (3, "nothing shared here at all friends"),
            ],
            "doc_id long, text string",
        )
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        got = {(r.id_a, r.id_b): r.containment
               for r in containment_pairs(sh, 0.9).collect()}
        # doc1's 2 shingles both occur in doc2 -> containment 1.0; the
        # reverse direction is far below threshold; doc3 shares nothing
        assert got == {(1, 2): 1.0}

    def test_direction_asymmetry(self, spark):
        from flnr_wins_spark.operators.dedup import containment_pairs, shingle_sets

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e f g h i j k l m n o p")],
            "doc_id long, text string",
        )
        sh = shingle_sets(docs, "text", "doc_id", n=3)
        got = {(r.id_a, r.id_b): r.containment
               for r in containment_pairs(sh, 0.0).collect()}
        assert got[(1, 2)] == 1.0 and got[(2, 1)] < 0.25


class TestUnigramQuality:
    def test_rare_token_doc_scores_higher(self, spark):
        from flnr_wins_spark.functions.text import unigram_quality

        docs = spark.createDataFrame(
            [(1, "common common common common"),
             (2, "common common common xylophone")],
            "doc_id long, text string",
        )
        got = {r.id: r for r in unigram_quality(docs).collect()}
        assert got[1].n_tokens == 4 and got[2].n_tokens == 4
        # doc2 contains the rarest token -> higher mean negative log-prob
        assert got[2].avg_nll > got[1].avg_nll
        import math
        # doc1: 4 tokens of 'common' (tf=7, total=8): avg_nll = ln(8/7)
        assert got[1].avg_nll == pytest.approx(math.log(8 / 7), abs=1e-8)


class TestZorder:
    def test_key_interleaves_bits(self, spark):
        from flnr_wins_spark.operators.layout import zorder_key

        df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
        z = df.select(zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")).collect()[0].z
        # x bits at even positions, y bits at odd:
        # x=101 -> bits at 0,4; y=011 -> bits at 1,3  => z=011011
        assert z == 0b011011

    def test_locality_beats_single_column_sort(self, spark):
        """Sorting by the z-key must give each file (partition) a tighter
        combined x/y min-max envelope than sorting by x alone gives for y:
        that envelope IS the parquet-stats pruning win."""
        from flnr_wins_spark.operators.layout import zorder_layout

        n = 1024
        df = spark.createDataFrame(
            [(i, i % 32, (i * 7) % 32) for i in range(n)], "id long, x long, y long"
        )
        parts = (
            zorder_layout(df, [F.col("x"), F.col("y")], bits=5, num_partitions=8)
            .select("x", "y", F.spark_partition_id().alias("p"))
            .groupBy("p")
            .agg((F.max("y") - F.min("y")).alias("yspan"), (F.max("x") - F.min("x")).alias("xspan"))
            .collect()
        )
        # with 8 partitions over a 32x32 grid, each z-range covers a sub-
        # quadrant: every partition's y-span AND x-span stay well under the
        # full 31 range a one-column sort leaves on the other column
        # (ideal equal-size chunks give spans <= 17; range-sampled partition
        # boundaries add slack, so assert the pruning-relevant bound)
        assert all(r.yspan <= 24 and r.xspan <= 24 for r in parts)

    def test_too_many_bits_rejected(self, spark):
        from flnr_wins_spark.operators.layout import zorder_key

        with pytest.raises(ValueError):
            zorder_key([F.lit(1), F.lit(2)], bits=32)


class TestFillForward:
    def test_fill_semantics(self, spark):
        # covered by the oracle at fixture scale; here pin the tiny edge:
        # leading NULLs stay NULL, later values do not bleed backwards
        from pyspark.sql import Window

        df = spark.createDataFrame(
            [(1, 1, None), (1, 2, 10.0), (1, 3, None), (2, 1, None)],
            "k long, seq long, v double",
        )
        w = Window.partitionBy("k").orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
        got = {(r.k, r.seq): r.f for r in df.select(
            "k", "seq", F.last("v", ignorenulls=True).over(w).alias("f")).collect()}
        assert got[(1, 1)] is None and got[(1, 2)] == 10.0
        assert got[(1, 3)] == 10.0 and got[(2, 1)] is None


class TestPackTexts:
    def test_eos_join_in_pack_order(self, spark):
        from flnr_wins_spark.operators.packing import pack_sequences, pack_texts

        docs = spark.createDataFrame(
            [(i, f"doc{i} words here", 3) for i in range(20)],
            "doc_id long, text string, n_tokens long",
        )
        packed = pack_sequences(docs, "doc_id", "n_tokens", budget=6, shards=4)
        out = pack_texts(packed, "doc_id", "text", eos="|")
        rows = out.collect()
        # every pack's n_docs matches its seq_text piece count
        assert all(r.n_docs == len(r.seq_text.split("|")) for r in rows)
        assert sum(r.n_docs for r in rows) == 20
        # deterministic across invocations
        again = {r.pack_id: r.seq_text for r in pack_texts(packed, "doc_id", "text", eos="|").collect()}
        assert {r.pack_id: r.seq_text for r in rows} == again


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [("a", v) for v in range(10)] * 3, "g string, v int"
        )
        row = kmv_distinct(df, "g", "v", k=64).collect()[0]
        # fewer than k distinct values -> estimate IS the exact count
        assert (row.n_kept, row.est_distinct, row.true_distinct) == (10, 10.0, 10)

    def test_estimate_in_range_above_k(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame([("a", v) for v in range(2000)], "g string, v int")
        row = kmv_distinct(df, "g", "v", k=64).collect()[0]
        assert row.n_kept == 64 and row.true_distinct == 2000
        # KMV stderr ~ 1/sqrt(k-1) ~ 12.6%; allow 5 sigma
        assert 2000 * 0.4 < row.est_distinct < 2000 * 1.7

    def test_estimate_deterministic(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [("a", v) for v in range(500)] + [("b", v) for v in range(100)],
            "g string, v int",
        ).repartition(7)
        a = sorted(map(tuple, kmv_distinct(df, "g", "v", k=32).collect()))
        b = sorted(map(tuple, kmv_distinct(df.repartition(3), "g", "v", k=32).collect()))
        assert a == b

    def test_null_values_are_ignored(self, spark):
        # NULL hashes to NULL; Spark's ascending window ranks NULLs FIRST
        # while DuckDB ranks them LAST — unfiltered, a NULL would occupy
        # rank 1 (corrupting n_kept/hk) and break the oracle contract.
        # The sketch must match COUNT(DISTINCT) semantics: NULLs don't count.
        from flnr_wins_spark.functions.sketches import kmv_distinct

        clean = spark.createDataFrame(
            [("a", v) for v in range(10)], "g string, v int"
        )
        dirty = spark.createDataFrame(
            [("a", v) for v in range(10)] + [("a", None)] * 5, "g string, v int"
        )
        a = sorted(map(tuple, kmv_distinct(clean, "g", "v", k=8).collect()))
        b = sorted(map(tuple, kmv_distinct(dirty, "g", "v", k=8).collect()))
        assert a == b

    def test_null_values_ignored_in_set_similarity(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_set_similarity

        clean = spark.createDataFrame(
            [("a", v) for v in range(20)] + [("b", v) for v in range(10, 30)],
            "g string, v int",
        )
        dirty = clean.unionByName(
            spark.createDataFrame([("a", None), ("b", None)], "g string, v int")
        )
        a = sorted(map(tuple, kmv_set_similarity(clean, "g", "v", k=8).collect()))
        b = sorted(map(tuple, kmv_set_similarity(dirty, "g", "v", k=8).collect()))
        assert a == b

    def test_prefilter_preserves_result_when_dense(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame([("a", v) for v in range(5000)], "g string, v int")
        exact = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16).collect()))
        pre = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16, prefilter_bits=3).collect()))
        # 5000 distinct >> 16 * 2^3: the lowest 1/8 slice still holds the 16 minima
        assert exact == pre


class TestRollingAnalytics:
    def test_zscore_flags_spike(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(minutes=i), 1, "view", 10.0 + (i % 3) * 0.5, "{}")
            for i in range(30)
        ]
        rows.append((99, base + dt.timedelta(minutes=99), 1, "view", 400.0, "{}"))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        # same expression shape as the x_rolling_zscore registry entry
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        c = df.select("user_id", "event_id", F.round(F.col("value") * 100).cast("bigint").alias("vc"), "ts")
        win = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
        w = c.select(
            "event_id", "vc",
            F.count("vc").over(win).alias("n"),
            F.sum("vc").over(win).alias("s"),
            F.sum(F.col("vc") * F.col("vc")).over(win).alias("ss"),
        )
        mean = F.col("s").cast("double") / F.col("n").cast("double")
        var = (F.col("ss").cast("double") - F.col("s").cast("double") ** 2 / F.col("n").cast("double")) / (
            F.col("n") - 1
        ).cast("double")
        z = (F.col("vc").cast("double") - mean) / F.sqrt(var)
        flagged = (
            w.filter((F.col("n") >= 10) & (F.col("ss") * F.col("n") > F.col("s") * F.col("s")))
            .select("event_id", z.alias("z"))
            .filter(F.abs(F.col("z")) > 3.0)
            .collect()
        )
        assert [r.event_id for r in flagged] == [99]

    def test_streak_islands(self, spark):
        import datetime as dt
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        days = [1, 2, 3, 7, 8, 20]  # streaks: 3, 2, 1
        df = spark.createDataFrame(
            [(1, dt.date(2024, 1, d)) for d in days], "user_id long, day date"
        )
        r = df.withColumn(
            "anchor",
            F.date_sub(F.col("day"), F.row_number().over(Window.partitionBy("user_id").orderBy("day"))),
        )
        runs = r.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
        out = runs.groupBy("user_id").agg(
            F.sum("len").alias("n_active_days"), F.max("len").alias("max_streak")
        ).collect()[0]
        assert (out.n_active_days, out.max_streak) == (6, 3)


class TestKmvSetOps:
    def test_small_sets_exact(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_set_similarity

        rows = [("A", v) for v in range(20)] + [("B", v) for v in range(10, 40)]
        df = spark.createDataFrame(rows, "g string, v int")
        out = kmv_set_similarity(df, "g", "v", k=64).collect()[0]
        # both sets under k: sketches ARE the sets -> estimates exact
        assert (out.true_union, out.true_inter) == (40, 10)
        assert out.union_est == 40.0
        assert abs(out.inter_est - 10.0) < 1e-9
        assert abs(out.jaccard_est - 10 / 40) < 1e-9

    def test_estimates_track_truth_above_k(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_set_similarity

        rows = [("A", v) for v in range(1000)] + [("B", v) for v in range(500, 1500)]
        df = spark.createDataFrame(rows, "g string, v int")
        out = kmv_set_similarity(df, "g", "v", k=64).collect()[0]
        assert (out.true_union, out.true_inter) == (1500, 500)
        # ~12.6% stderr at k=64; allow generous 5-sigma style bands
        assert 900 < out.union_est < 2400
        assert 0.1 < out.jaccard_est < 0.65

    def test_all_pairs_emitted(self, spark):
        from flnr_wins_spark.functions.sketches import kmv_set_similarity

        rows = [(g, v) for g in "ABC" for v in range(5)]
        df = spark.createDataFrame(rows, "g string, v int")
        got = {(r.ga, r.gb) for r in kmv_set_similarity(df, "g", "v", k=8).collect()}
        assert got == {("A", "B"), ("A", "C"), ("B", "C")}


class TestCorrAndAb:
    def test_correlation_exact_linear(self, spark):
        # y = 2x exactly -> corr 1; z anti-correlated -> corr -1
        from flnr_wins_spark.plans.common import all_queries  # noqa: F401
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(float(i), float(2 * i), float(100 - i)) for i in range(50)],
            "x double, y double, z double",
        )
        cents = {c: F.round(F.col(c) * 100).cast("bigint") for c in ("x", "y", "z")}
        n = F.count(F.lit(1)).cast("bigint")
        aggs = [n.alias("n")]
        for c in ("x", "y", "z"):
            aggs.append(F.sum(cents[c].cast("decimal(38,0)")).alias(f"s_{c}"))
            aggs.append(F.sum((cents[c] * cents[c]).cast("decimal(38,0)")).alias(f"q_{c}"))
        aggs.append(F.sum((cents["x"] * cents["y"]).cast("decimal(38,0)")).alias("x_xy"))
        aggs.append(F.sum((cents["x"] * cents["z"]).cast("decimal(38,0)")).alias("x_xz"))
        row = df.agg(*aggs).collect()[0]

        def corr(sx, sy, qx, qy, sxy, n):
            import math
            num = float(n * sxy - sx * sy)
            return num / (math.sqrt(float(n * qx - sx * sx)) * math.sqrt(float(n * qy - sy * sy)))

        assert abs(corr(row.s_x, row.s_y, row.q_x, row.q_y, row.x_xy, row.n) - 1.0) < 1e-12
        assert abs(corr(row.s_x, row.s_z, row.q_x, row.q_z, row.x_xz, row.n) + 1.0) < 1e-12

    def test_ab_test_z_sign(self, spark):
        """Variant with the higher conversion rate drives the z sign."""
        import datetime as dt
        from flnr_wins_spark.plans.common import all_queries

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for uid in range(20):
            # even users (variant 0) convert; odd don't
            val = 200.0 if uid % 2 == 0 else 10.0
            rows.append((eid, base, uid, "purchase", val, "{}"))
            eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        import tempfile, os
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = all_queries()["x_ab_test"].fn(spark, d).collect()[0]
        assert out.rate_a == 1.0 and out.rate_b == 0.0 and out.z > 0


class TestM4AndImpute:
    def test_m4_picks_extremes_and_endpoints(self, spark):
        import datetime as dt
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        base = dt.datetime(2024, 1, 1, 10)
        vals = [50, 10, 99, 30]  # first=50, min=10, max=99, last=30
        df = spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)],
            "event_id long, ts timestamp, value double",
        )
        c = df.select(
            F.date_trunc("hour", "ts").alias("bucket"), "ts", "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
        wa = Window.partitionBy("bucket").orderBy("ts", "event_id")
        wd = Window.partitionBy("bucket").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        r = c.select("bucket", "vc", F.row_number().over(wa).alias("rn_a"),
                     F.row_number().over(wd).alias("rn_d"))
        out = r.groupBy("bucket").agg(
            F.min("vc").alias("vmin"), F.max("vc").alias("vmax"),
            F.max(F.when(F.col("rn_a") == 1, F.col("vc"))).alias("vfirst"),
            F.max(F.when(F.col("rn_d") == 1, F.col("vc"))).alias("vlast"),
        ).collect()[0]
        assert (out.vmin, out.vmax, out.vfirst, out.vlast) == (1000, 9900, 5000, 3000)

    def test_impute_fills_group_mean(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "a", None), (4, "b", 7), (5, "b", None)],
            "event_id long, event_type string, vc long",
        )
        means = df.groupBy("event_type").agg(
            F.expr("CAST(sum(vc) AS BIGINT) div CAST(count(vc) AS BIGINT)").alias("mean_c")
        )
        out = {
            r.event_id: (r.vc_imputed, r.was_imputed)
            for r in df.join(F.broadcast(means), "event_type")
            .select("event_id", F.coalesce("vc", "mean_c").alias("vc_imputed"),
                    F.col("vc").isNull().alias("was_imputed"))
            .collect()
        }
        assert out[3] == (15, True) and out[5] == (7, True)
        assert out[1] == (10, False)


class TestIncrementalJoin:
    def test_equals_full_rebuild(self, spark):
        from flnr_wins_spark.operators.merge import incremental_join

        a = spark.createDataFrame([(k, f"a{k}") for k in range(20)], "k long, av string")
        b = spark.createDataFrame(
            [(k % 10, f"b{i}") for i, k in enumerate(range(30))], "k long, bv string"
        )
        from pyspark.sql import functions as F

        oa, da = a.filter(F.col("k") % 3 != 0), a.filter(F.col("k") % 3 == 0)
        ob, db = b.filter(F.col("k") % 2 != 0), b.filter(F.col("k") % 2 == 0)
        inc = sorted(map(tuple, incremental_join(oa, da, ob, db, ["k"]).collect()))
        full = sorted(map(tuple, a.join(b, "k").collect()))
        assert inc == full

    def test_prev_reuse_not_recomputed(self, spark):
        from flnr_wins_spark.operators.merge import incremental_join

        a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, av string")
        b = spark.createDataFrame([(1, "p"), (2, "q")], "k long, bv string")
        empty_a = a.limit(0)
        empty_b = b.limit(0)
        prev = a.join(b, ["k"])
        # with empty deltas the result IS prev
        out = sorted(map(tuple, incremental_join(a, empty_a, b, empty_b, ["k"], prev=prev).collect()))
        assert out == sorted(map(tuple, prev.collect()))


def test_trajectory_similarity_orders_by_edit_distance(spark):
    import datetime as dt
    from flnr_wins_spark.plans.common import all_queries
    import os, tempfile

    base = dt.datetime(2024, 1, 1)
    # user 0: s,c,p ; user 1: s,c,p (dist 0) ; user 2: s,c (dist 1) ;
    # user 3: v,v,v (dist 3)
    rows, eid = [], 0
    for uid, types in [(0, "scp"), (1, "scp"), (2, "sc"), (3, "vvv")]:
        for i, ch in enumerate(types):
            full = {"s": "signup", "c": "click", "p": "purchase", "v": "view"}[ch]
            rows.append((eid, base + dt.timedelta(minutes=i), uid, full, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = all_queries()["x_trajectory_similarity"].fn(spark, d).collect()
    assert [(r.user_id, r.dist) for r in out] == [(1, 0), (2, 1), (3, 3)]


def test_itemknn_cooccurrence_cosine(spark):
    """Hand-checkable 3-basket example: items {1,2} always co-occur; 3
    appears once with 1."""
    from flnr_wins_spark.plans.common import all_queries
    import os, tempfile
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(100, 7), (100, 14), (101, 7), (101, 14), (102, 7), (102, 21)],
        "l_orderkey long, l_partkey long",
    )
    d = tempfile.mkdtemp()
    li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    out = {
        (r.item, r.rec): (round(r.score, 6), r.rec_rank)
        for r in all_queries()["x_recommend_itemknn"].fn(spark, d).collect()
    }
    import math
    # c7=3, c14=2, c21=1; c(7,14)=2, c(7,21)=1
    assert out[(7, 14)] == (round(2 / math.sqrt(3 * 2), 6), 1)
    assert out[(7, 21)] == (round(1 / math.sqrt(3 * 1), 6), 2)
    assert out[(14, 7)][1] == 1 and out[(21, 7)][1] == 1
    assert (14, 21) not in out  # never co-occur


def test_churn_training_set_no_leakage(spark):
    """Features must not see post-cutoff events; the label must."""
    import datetime as dt
    import os, tempfile
    from flnr_wins_spark.plans.common import all_queries

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: active before AND after cutoff -> not churned
        (1, base, 1, "purchase", 100.0, "{}"),
        (2, base + dt.timedelta(days=20), 1, "view", 1.0, "{}"),
        # user 2: only before cutoff -> churned; post-cutoff purchase of user 1
        (3, base + dt.timedelta(days=1), 2, "purchase", 50.0, "{}"),
        # anchor the max ts (cutoff = day 21 - 7 = day 14)
        (4, base + dt.timedelta(days=21), 1, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r for r in all_queries()["x_churn_training_set"].fn(spark, d).collect()}
    # user 1: features only from pre-cutoff events (1 event, 1 purchase)
    assert out[1].n_events == 1 and out[1].n_purchases == 1 and not out[1].churned
    assert out[2].n_events == 1 and out[2].churned


def test_cms_join_size_never_undershoots(spark):
    from flnr_wins_spark.functions.sketches import cms_join_size

    a = spark.createDataFrame([(i % 20,) for i in range(300)], "k int")
    b = spark.createDataFrame([(i % 25,) for i in range(200)], "k int")
    row = cms_join_size(a, b, "k", "k", depth=4, hex_chars=1).collect()[0]
    true = a.join(b, "k").count()
    assert row.true_size == true
    assert row.est_size >= true  # upper-bound guarantee
    # with only 16 buckets and 20-25 keys, collisions exist but the 4-seed
    # min keeps the bound loose-but-sane
    assert row.est_size <= true * 4


def test_cms_join_size_empty_side_estimates_zero(spark):
    # empty side -> zero per-seed rows -> the estimate must coalesce to 0
    # (not NULL), keeping the ">= true size" upper-bound contract
    from flnr_wins_spark.functions.sketches import cms_join_size

    a = spark.createDataFrame([(i,) for i in range(10)], "k int")
    empty = spark.createDataFrame([], "k int")
    row = cms_join_size(a, empty, "k", "k", depth=4, hex_chars=1).collect()[0]
    assert (row.est_size, row.true_size) == (0, 0)


class TestBottomkQuantiles:
    def test_estimates_close_to_exact_quantiles(self, spark):
        from flnr_wins_spark.functions.sketches import bottomk_quantiles

        rows = [(i, "a", float(i % 1000)) for i in range(20000)]
        df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        row = bottomk_quantiles(df, "event_type", "value", "event_id", k=256).collect()[0]
        assert row.n_total == 20000 and row.n_kept == 256
        # uniform 0..999: true p50=500, p90=900; rank stderr ~ 3% of range
        assert abs(row.q50 - 500) < 100
        assert abs(row.q90 - 900) < 100

    def test_partition_invariant_and_merge_equivalent(self, spark):
        from flnr_wins_spark.functions.sketches import bottomk_quantiles

        rows = [(i, "g", float((i * 37) % 500)) for i in range(5000)]
        df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        a = sorted(map(tuple, bottomk_quantiles(df, "event_type", "value", "event_id").collect()))
        b = sorted(map(tuple, bottomk_quantiles(df.repartition(17), "event_type", "value", "event_id").collect()))
        assert a == b

    def test_null_values_and_keys_excluded(self, spark):
        from flnr_wins_spark.functions.sketches import bottomk_quantiles

        clean = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(50)],
            "event_id long, event_type string, value double",
        )
        dirty = clean.unionByName(
            spark.createDataFrame(
                [(999, "g", None), (None, "g", 3.0)],
                "event_id long, event_type string, value double",
            )
        )
        a = sorted(map(tuple, bottomk_quantiles(clean, "event_type", "value", "event_id", k=16).collect()))
        b = sorted(map(tuple, bottomk_quantiles(dirty, "event_type", "value", "event_id", k=16).collect()))
        assert a == b

    def test_duplicate_rows_collapse_like_the_streaming_sink(self, spark):
        """Advisor finding (r5): the streaming sink dedups (g, h, v) before
        the bottom-k cut but the batch twin did not, so a corpus with
        genuinely duplicated (key, value) rows broke batch-twin
        equivalence. The sample must be a pure function of the row SET:
        duplicated rows may not occupy two of the k slots."""
        from flnr_wins_spark.functions.sketches import bottomk_quantiles

        base = spark.createDataFrame(
            [(i, "g", float(i * 3 % 11)) for i in range(12)],
            "event_id long, event_type string, value double",
        )
        doubled = base.unionByName(base)
        a = bottomk_quantiles(base, "event_type", "value", "event_id", k=4).collect()[0]
        b = bottomk_quantiles(doubled, "event_type", "value", "event_id", k=4).collect()[0]
        # identical sample (n_kept + order statistics); only the raw row
        # total reflects the duplication
        assert (a.n_kept, a.q50, a.q90) == (b.n_kept, b.q50, b.q90)
        assert (a.n_total, b.n_total) == (12, 24)


class TestLinearAttribution:
    def test_equal_split_with_floor_dust(self, spark):
        import datetime as dt

        from flnr_wins_spark.operators.funnel import linear_attribution

        b = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: ad, email, ad, then a 10.0 purchase -> ad 2/3, email 1/3
            (1, b, 1, "ad", 0.0),
            (2, b.replace(hour=1), 1, "email", 0.0),
            (3, b.replace(hour=2), 1, "ad", 0.0),
            (4, b.replace(hour=3), 1, "purchase", 10.0),
            # user 2: no touches -> full credit under 'none'
            (5, b, 2, "purchase", 5.0),
        ]
        ev = spark.createDataFrame(
            [(eid, ts, u, t, v) for eid, ts, u, t, v in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = {r.touch: (r.n_purchases_touched, r.revenue_micro)
               for r in linear_attribution(ev).collect()}
        # 10.0 -> 10_000_000 micro; ad: (1e7*2) div 3 = 6_666_666;
        # email: (1e7*1) div 3 = 3_333_333; 1 micro-unit of dust dropped
        assert out["ad"] == (1, 6_666_666)
        assert out["email"] == (1, 3_333_333)
        assert out["none"] == (1, 5_000_000)

    def test_touch_after_purchase_not_credited(self, spark):
        import datetime as dt

        from flnr_wins_spark.operators.funnel import linear_attribution

        b = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (1, b, 1, "purchase", 4.0),
                (2, b.replace(hour=1), 1, "ad", 0.0),  # after: no credit
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = {r.touch: r.revenue_micro for r in linear_attribution(ev).collect()}
        assert out == {"none": 4_000_000}


class TestBfsDistances:
    def test_min_hop_distances_on_path_graph(self, spark):
        from flnr_wins_spark.operators.graph import bfs_distances

        # path 1-2-3-4-5 plus a shortcut 1-4: dist(4) must be 1 via shortcut
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "id_a long, id_b long"
        )
        srcs = spark.createDataFrame([(1,)], "id long")
        got = {r.id: r.dist for r in bfs_distances(edges, srcs, max_hops=4).collect()}
        assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}

    def test_max_hops_truncates_and_multi_source_min(self, spark):
        from flnr_wins_spark.operators.graph import bfs_distances

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "id_a long, id_b long"
        )
        srcs = spark.createDataFrame([(0,), (10,)], "id long")
        got = {r.id: r.dist for r in bfs_distances(edges, srcs, max_hops=2).collect()}
        # reachable ball only, min over the two sources
        assert got == {0: 0, 10: 0, 1: 1, 9: 1, 2: 2, 8: 2}


class TestBottomkDuplicateKeys:
    def test_duplicate_key_ties_cut_deterministically(self, spark):
        """Review finding: ordering the bottom-k cut by hash alone made the
        sample depend on arrival order when duplicate keys (same hash,
        different values) straddle rank k; (h, v) ordering pins it."""
        from flnr_wins_spark.functions.sketches import bottomk_quantiles

        rows = [(i, "g", float(i)) for i in range(8)]
        rows += [(3, "g", 99.0), (3, "g", -7.0)]  # duplicate key 3, 3 values
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        outs = [
            sorted(map(tuple, bottomk_quantiles(
                df.repartition(p), "event_type", "value", "event_id", k=5
            ).collect()))
            for p in (1, 7, 13)
        ]
        assert outs[0] == outs[1] == outs[2]


class TestKaplanMeier:
    def test_survival_monotone_and_absorbs_at_zero(self, spark):
        from flnr_wins_spark.plans.common import all_queries

        out = all_queries()["x_kaplan_meier"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r.event_type, []).append(r)
        assert len(by_g) >= 3
        for g, rows in by_g.items():
            rows.sort(key=lambda r: r.t)
            # at-risk counts strictly decrease along the time grid
            risks = [r.n_risk for r in rows]
            assert risks == sorted(risks, reverse=True)
            # ln S is non-increasing while defined; once NULL (absorbed),
            # it stays NULL
            seen_null = False
            prev = 0
            for r in rows:
                if r.ln_s_e9 is None:
                    seen_null = True
                else:
                    assert not seen_null, g
                    assert r.ln_s_e9 <= prev
                    prev = r.ln_s_e9
            # the final time bucket absorbs (everyone at risk dies or the
            # curve ends) only if d == n_risk there; sanity: n_risk at the
            # last time equals that row's d + c
            last = rows[-1]
            assert last.n_risk == last.d + last.c


class TestSeasonalDecompose:
    def test_components_reconstruct_and_seasonality_recovered(self, spark):
        """On a constructed series with a known hour-of-day pattern, the
        decomposition must (a) reconstruct y = trend + seasonal +
        remainder exactly where trend is defined, and (b) recover the
        injected seasonal ordering."""
        import datetime as dt

        from flnr_wins_spark.plans.common import all_queries
        from pyspark.sql import functions as F

        out = all_queries()["x_seasonal_decompose"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        # sf0.001 is sparse: not every hour has events — the decomposition
        # runs on the OBSERVED hourly series (row-frame MA)
        assert len(out) > 400
        n_edge = sum(1 for r in out if r.trend is None)
        assert n_edge == 24  # 12 rows at each end of the ordered series
        for r in out:
            if r.trend is not None:
                assert abs((r.trend + r.seasonal + r.remainder) - r.y) < 1e-9
            else:
                assert r.remainder is None
        # seasonal indices sum to ~0 over the 24 hours (additive model)
        by_hod = {}
        for r in out:
            by_hod[r.hod] = r.seasonal
        assert len(by_hod) == 24
        assert abs(sum(by_hod.values())) < max(abs(v) for v in by_hod.values()) * 24


class TestRobustScale:
    def test_median_maps_to_zero_and_iqr_normalizes(self, spark):
        from flnr_wins_spark.operators.ranking import robust_scale

        # values 1..100: q1=25, q2=50, q3=75, IQR=50
        df = spark.range(1, 101).select(
            F.col("id"), F.col("id").cast("double").alias("v")
        )
        got = {r["id"]: r["scaled"] for r in robust_scale(df, "v", "id").collect()}
        assert got[50] == 0.0
        assert got[75] == 0.5 and got[25] == -0.5
        assert got[100] == 1.0

    def test_zero_iqr_yields_null(self, spark):
        from flnr_wins_spark.operators.ranking import robust_scale

        df = spark.range(20).select(F.col("id"), F.lit(7.0).alias("v"))
        rows = robust_scale(df, "v", "id").collect()
        assert all(r["scaled"] is None for r in rows)


class TestHoltGrouped:
    def test_contract_violations_raise_loudly(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from flnr_wins_spark.operators.forecast import holt_smooth_grouped

        df = spark.createDataFrame(
            [("g", 1, 1.0), ("g", 1, 2.0)], "grp string, t int, v double"
        )
        with pytest.raises(ValueError, match="distinct"):
            holt_smooth_grouped(df, "grp", "t", "t")
        with pytest.raises(ValueError, match="rn"):
            holt_smooth_grouped(df.withColumnRenamed("t", "rn"), "grp", "rn", "v")
        # order ties within a group: undefined recurrence, raises in-batch
        with pytest.raises(Exception, match="ties"):
            holt_smooth_grouped(df, "grp", "t", "v").collect()
        # NULL values: fail fast instead of silently poisoning the series
        nulls = spark.createDataFrame(
            [("g", 1, 1.0), ("g", 2, None)], "grp string, t int, v double"
        )
        with pytest.raises(Exception, match="NaN"):
            holt_smooth_grouped(nulls, "grp", "t", "v").collect()

    def test_groups_are_independent_and_match_single_series(self, spark):
        """Each group's output must equal running the recurrence on that
        group alone — the distribution is across series, never within."""
        from flnr_wins_spark.operators.forecast import holt_smooth_grouped

        df = spark.createDataFrame(
            [("a", i, float(i * i % 7)) for i in range(1, 9)]
            + [("b", i, float(10 - i)) for i in range(1, 6)],
            "grp string, t int, v double",
        )
        both = {
            (r.grp, r.rn): (r.level, r.trend, r.onestep)
            for r in holt_smooth_grouped(df, "grp", "t", "v").collect()
        }
        for g in ("a", "b"):
            alone = {
                (r.grp, r.rn): (r.level, r.trend, r.onestep)
                for r in holt_smooth_grouped(
                    df.filter(df.grp == g), "grp", "t", "v"
                ).collect()
            }
            assert alone == {k: v for k, v in both.items() if k[0] == g}
