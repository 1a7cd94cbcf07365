"""Product-analytics, sketch, graph-analytics, privacy, and
robust-statistics registry entries.

The reference has no event-sequence, sketch, graph, or distributional
surface at all (SURVEY.md §2c — /root/reference/src/wins_transform_staging.py
is batch attribute QA only); these are engine extensions. Every entry here
is deterministic by construction (md5 content addressing, integer rank/
sufficient-statistic arithmetic, decimal-routed doubles), so each has an
exact DuckDB oracle twin — including the sketches (Count-Min, Bloom, KMV),
the unrolled-round graph operators (k-core), and the closed-form statistics
(OLS, Pearson, two-proportion z).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import query, sql_dsum, t

_FUNNEL_STEPS = ("signup", "click", "purchase")


@query(
    "x_funnel_counts",
    sql="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 1 AS step, 'signup' AS event_type, (SELECT COUNT(*) FROM s1) AS users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
    note="strictly-ordered funnel conversion (earliest-completion frontier); "
    "every shuffle keyed on user_id, stages filter to one event type first",
    bench=True,
)
def x_funnel_counts(spark, sf_dir):
    from flnr_wins_spark.operators.funnel import funnel_counts

    return funnel_counts(t(spark, sf_dir, "events"), list(_FUNNEL_STEPS))


@query(
    "x_retention_cohorts",
    sql="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    note="weekly cohort retention; two user_id-keyed shuffles then a tiny "
    "(cohort, offset) grid aggregate",
)
def x_retention_cohorts(spark, sf_dir):
    from flnr_wins_spark.operators.funnel import retention_cohorts

    return retention_cohorts(t(spark, sf_dir, "events"))


@query(
    "x_global_rank",
    sql="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
    FROM orders
    """,
    note="global row_number WITHOUT a single-partition window: range-shard, "
    "pin partitions (localCheckpoint), prefix-sum per-shard counts, "
    "broadcast offsets back (operators/ranking.py)",
)
def x_global_rank(spark, sf_dir):
    from flnr_wins_spark.operators.ranking import global_row_number

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_row_number(orders, ["o_totalprice", "o_orderkey"]).select(
        "o_orderkey", "rn"
    )


@query(
    "x_equidepth_bins",
    sql="""
    WITH r AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER () AS total
      FROM orders
    )
    SELECT o_orderkey, rn, CAST(((rn - 1) * 16) // total + 1 AS INT) AS bucket
    FROM r
    """,
    note="equi-depth (quantile) binning via distributed global rank; "
    "bucket boundary is pure integer arithmetic, bit-exact in any engine",
)
def x_equidepth_bins(spark, sf_dir):
    from flnr_wins_spark.operators.ranking import equidepth_bins

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return equidepth_bins(orders, "o_totalprice", "o_orderkey", k=16).select(
        "o_orderkey", "rn", "bucket"
    )


@query(
    "x_winsorize",
    sql="""
    WITH r AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ), b AS (
      SELECT MIN(CASE WHEN rn = greatest(1, (5 * n + 99) // 100)
                      THEN o_totalprice END) AS lo,
             MIN(CASE WHEN rn = (95 * n + 99) // 100
                      THEN o_totalprice END) AS hi
      FROM r
    )
    SELECT o_orderkey, o_totalprice,
           least(greatest(o_totalprice, lo), hi) AS winsorized
    FROM r, b
    """,
    note="rank-based winsorization (clamp to p5/p95): percentile = value at "
    "rank ceil(p*N/100) — integer arithmetic, identical bound row in every "
    "engine, no interpolation ambiguity",
)
def x_winsorize(spark, sf_dir):
    from flnr_wins_spark.operators.ranking import winsorize

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return winsorize(orders, "o_totalprice", "o_orderkey").select(
        "o_orderkey", "o_totalprice", "winsorized"
    )


@query(
    "x_countmin",
    sql="""
    WITH counts AS (
      SELECT o_custkey AS item, COUNT(*) AS true_cnt FROM orders GROUP BY 1
    ), fanned AS (
      SELECT item, true_cnt, s.seed,
             substr(md5('s' || CAST(s.seed AS VARCHAR) || ':'
                        || CAST(item AS VARCHAR)), 1, 1) AS bucket
      FROM counts, (SELECT unnest(range(4)) AS seed) s
    ), cells AS (
      SELECT seed, bucket, SUM(true_cnt) AS cell_sum
      FROM fanned GROUP BY 1, 2
    )
    SELECT item, true_cnt, CAST(MIN(cell_sum) AS BIGINT) AS est_cnt
    FROM fanned JOIN cells USING (seed, bucket)
    GROUP BY 1, 2
    """,
    note="Count-Min sketch (4x16 cells, md5 buckets = engine-portable): "
    "est >= true always; collisions at this tiny width prove the oracle "
    "rebuilds the identical sketch",
)
def x_countmin(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import countmin_estimates

    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return countmin_estimates(orders, "o_custkey", depth=4, hex_chars=1)


@query(
    "x_bloom_prefilter",
    sql="""
    WITH keys AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
    SELECT l_suppkey, COUNT(*) AS n
    FROM lineitem
    WHERE substr(md5('s0:' || CAST(l_suppkey AS VARCHAR)), 1, 1) IN
            (SELECT DISTINCT substr(md5('s0:' || CAST(s_suppkey AS VARCHAR)), 1, 1) FROM keys)
      AND substr(md5('s1:' || CAST(l_suppkey AS VARCHAR)), 1, 1) IN
            (SELECT DISTINCT substr(md5('s1:' || CAST(s_suppkey AS VARCHAR)), 1, 1) FROM keys)
      AND substr(md5('s2:' || CAST(l_suppkey AS VARCHAR)), 1, 1) IN
            (SELECT DISTINCT substr(md5('s2:' || CAST(s_suppkey AS VARCHAR)), 1, 1) FROM keys)
    GROUP BY 1
    """,
    note="explicit Bloom-style join prefilter: 3 broadcast semi-joins "
    "against <=16-row bucket lists — big side never shuffles; deliberately "
    "narrow buckets so false positives exercise the superset semantics",
)
def x_bloom_prefilter(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import bloom_prefilter

    sup = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").select("l_suppkey")
    kept = bloom_prefilter(li, sup, "l_suppkey", "s_suppkey", depth=3, hex_chars=1)
    return kept.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "x_group_topk_sample",
    sql="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
    note="deterministic per-group cap (per-domain page cap): k smallest "
    "md5('cap:'||key) per group — stable under re-runs/engines; optional "
    "hash-threshold prefilter handles hot groups (operators/sample.py)",
)
def x_group_topk_sample(spark, sf_dir):
    from flnr_wins_spark.operators.sample import group_cap

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    return group_cap(docs, ["source"], "doc_id", k=10)


def _zorder_sql() -> str:
    from flnr_wins_spark.operators.layout import zorder_key_sql

    day = "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    return (
        "SELECT o_orderkey, CAST("
        + zorder_key_sql(["o_custkey", day], bits=12)
        + " AS BIGINT) AS zval FROM orders"
    )


@query(
    "x_zorder_layout",
    sql=_zorder_sql(),
    note="Z-order (Morton) layout key over (customer, order-day): bit "
    "interleave as a pure JVM OR-chain; sorting by it co-locates rows in "
    "BOTH dimensions so parquet min/max stats prune either predicate "
    "(operators/layout.py zorder_layout adds the one range shuffle)",
)
def x_zorder_layout(spark, sf_dir):
    from flnr_wins_spark.operators.layout import zorder_key

    orders = t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    )
    return orders.select(
        "o_orderkey",
        zorder_key([F.col("o_custkey"), day], bits=12).alias("zval"),
    )


@query(
    "x_group_regression",
    sql="""
    WITH p AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 - epoch_us(TIMESTAMP '2024-01-01') // 1000000 AS x,
             CAST(round(value * 100) AS BIGINT) AS yc
      FROM events
    ),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(x * yc) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM p GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
             AS slope_cs,
           (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
                                  / CAST(n * sxx - sx * sx AS DOUBLE))
                                 * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_c
    FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
    note="per-group OLS trend fit (closed form): y scaled to exact centi-"
    "units so every sufficient statistic is a bigint — the model fit is "
    "map-side-combinable sums, one shuffle on the group key, zero Python; "
    "slope/intercept leave integer space only in the final division",
)
def x_group_regression(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        (
            F.expr("unix_micros(cast(ts as timestamp_ltz)) div 1000000")
            - F.expr("unix_micros(cast(timestamp '2024-01-01' as timestamp_ltz)) div 1000000")
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("yc"),
    )
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("yc").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return (
        s.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            "n",
            slope.alias("slope_cs"),
            ((F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
             / F.col("n").cast("double")).alias("intercept_c"),
        )
    )


# Co-purchase graph for the graph-analytics entries: parts appearing in the
# same order are linked; the %7 subset keeps the demo graph at a density
# where triangles/cores are non-trivial (~0.04 edge probability at every SF).
_COPURCHASE_SQL = """
      SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey % 7 = 0 AND b.l_partkey % 7 = 0
"""


def _copurchase_edges(spark, sf_dir):
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_partkey") % 7 == 0)
    )
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("id_a"), F.col("b.l_partkey").alias("id_b")
    )


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    # AS MATERIALIZED: each e{i} references e{i-1} three times — inlined
    # (DuckDB's default for multi-referenced CTEs can still inline) the
    # expansion is 3^rounds scans of the parquet
    ctes = [f"e0 AS MATERIALIZED ({_COPURCHASE_SQL})"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT u FROM (SELECT lo AS u FROM e{p} UNION ALL "
            f"SELECT hi AS u FROM e{p}) s GROUP BY u HAVING COUNT(*) >= {k})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT lo, hi FROM e{p} "
            f"WHERE lo IN (SELECT u FROM n{i}) AND hi IN (SELECT u FROM n{i}))"
        )
    last = f"e{rounds}"
    return (
        "WITH " + ", ".join(ctes) + f" SELECT u AS id, CAST(COUNT(*) AS BIGINT) AS "
        f"core_degree FROM (SELECT lo AS u FROM {last} UNION ALL SELECT hi AS u "
        f"FROM {last}) s GROUP BY u"
    )


@query(
    "x_triangle_count",
    sql=f"""
    WITH e AS ({_COPURCHASE_SQL}),
    tri AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM e e1 JOIN e e2 ON e2.lo = e1.hi
                JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
    FROM (SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
          UNION ALL SELECT z AS id FROM tri) v
    GROUP BY id
    """,
    note="per-vertex triangle counts, degree-oriented node-iterator (Suri & "
    "Vassilvitskii WWW'11): wedges enumerate only at the low-(degree,id) "
    "endpoint so fan-out is O(sqrt(m)) even on power-law graphs; the "
    "triangle SET is orientation-independent, so the oracle's naive "
    "lo<mid<hi 3-way join lands on identical counts",
    bench=True,
)
def x_triangle_count(spark, sf_dir):
    from flnr_wins_spark.operators.graph import triangle_counts

    return triangle_counts(_copurchase_edges(spark, sf_dir))


@query(
    "x_kcore",
    sql=_kcore_oracle_sql(k=10, rounds=6),
    note="k-core decomposition (k=10) by 6 unrolled peel rounds: each round "
    "drops vertices with degree < k and cascades; peeling is monotone so a "
    "converged Spark loop == the fixed-round SQL twin; per round one degree "
    "groupBy + two vertex-keyed semi-joins (survivor set O(V), NOT "
    "broadcast)",
)
def x_kcore(spark, sf_dir):
    from flnr_wins_spark.operators.graph import kcore

    return kcore(_copurchase_edges(spark, sf_dir), k=10, rounds=6)


@query(
    "x_dq_expectations",
    sql="""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(o_custkey) AS BIGINT) AS nn_cust,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_ok,
             CAST(MIN(o_totalprice) AS DOUBLE) AS mn_tp,
             CAST(MAX(o_totalprice) AS DOUBLE) AS mx_tp,
             CAST(SUM(CASE WHEN regexp_matches(o_orderpriority,
                   '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) AS pat,
             CAST(COUNT(o_orderpriority) AS BIGINT) AS nn_pri,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                   THEN 1 ELSE 0 END) AS BIGINT) AS cont,
             CAST(COUNT(o_orderstatus) AS BIGINT) AS nn_st
      FROM orders
    )
    SELECT 'completeness(o_custkey)' AS check_name,
           CAST(nn_cust AS DOUBLE) / CAST(n AS DOUBLE) AS metric,
           CAST(nn_cust AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 AS passed FROM a
    UNION ALL
    SELECT 'distinctness(o_orderkey)',
           CAST(nd_ok AS DOUBLE) / CAST(n AS DOUBLE),
           CAST(nd_ok AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 FROM a
    UNION ALL
    SELECT 'min(o_totalprice)', mn_tp, mn_tp >= 0.0 FROM a
    UNION ALL
    SELECT 'max(o_totalprice)', mx_tp, mx_tp <= 1000000.0 FROM a
    UNION ALL
    SELECT 'pattern(o_orderpriority)',
           CAST(pat AS DOUBLE) / CAST(nn_pri AS DOUBLE),
           CAST(pat AS DOUBLE) / CAST(nn_pri AS DOUBLE) >= 1.0 FROM a
    UNION ALL
    SELECT 'containment(o_orderstatus)',
           CAST(cont AS DOUBLE) / CAST(nn_st AS DOUBLE),
           CAST(cont AS DOUBLE) / CAST(nn_st AS DOUBLE) >= 1.0 FROM a
    """,
    note="deequ-style declarative expectation suite: ALL checks evaluate in "
    "ONE aggregation pass (map-side-combinable metrics; count-distinct is "
    "the one expand+two-phase agg), fan-out to per-check rows happens on "
    "the single aggregate row — table scanned once no matter how many "
    "expectations are declared (operators/dataquality.py)",
)
def x_dq_expectations(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import (
        check_expectations,
        completeness,
        containment,
        distinctness,
        max_bound,
        min_bound,
        pattern_conformance,
    )

    orders = t(spark, sf_dir, "orders")
    checks = [
        completeness("o_custkey"),
        distinctness("o_orderkey"),
        min_bound("o_totalprice", 0.0),
        max_bound("o_totalprice", 1_000_000.0),
        pattern_conformance("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        containment("o_orderstatus", ["O", "F", "P"]),
    ]
    return check_expectations(orders, checks).withColumnRenamed("check", "check_name")


def _profile_col_sql(i: int, c: str) -> str:
    s = f"CAST({c} AS VARCHAR)"
    return (
        f"CAST(COUNT({s}) AS BIGINT) AS nn{i}, "
        f"CAST(COUNT(DISTINCT {s}) AS BIGINT) AS nd{i}, "
        f"MIN({s}) AS mn{i}, MAX({s}) AS mx{i}, "
        f"SUM(CAST(length({s}) AS DECIMAL(27,0))) AS sl{i}"
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_SQL = (
    "WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(_profile_col_sql(i, c) for i, c in enumerate(_PROFILE_COLS))
    + " FROM documents) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, n, CAST(n - nn{i} AS BIGINT) AS nulls, "
        f"nd{i} AS n_distinct, mn{i} AS min_s, mx{i} AS max_s, "
        f"CAST(sl{i} AS DOUBLE) / CAST(nn{i} AS DOUBLE) AS avg_len FROM a"
        for i, c in enumerate(_PROFILE_COLS)
    )
)


@query(
    "x_profile_columns",
    sql=_PROFILE_SQL,
    note="per-column statistical profile (drift detection input): nulls, "
    "distincts, lexicographic min/max of the string rendering, exact-decimal "
    "average length — all columns in ONE pass, stacked from the single "
    "aggregate row (operators/dataquality.py profile_columns)",
)
def x_profile_columns(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import profile_columns

    docs = t(spark, sf_dir, "documents")
    return profile_columns(docs, list(_PROFILE_COLS))


@query(
    "x_event_paths",
    sql="""
    WITH o AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM o WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
    note="top event-type paths (behavioral trigrams): per-user ordered "
    "LEAD window (keyed shuffle), then a map-side-combined path count and "
    "TakeOrdered top-20 — the funnel-free path-analysis complement",
)
def x_event_paths(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        o.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@query(
    "x_distinct_kmv",
    sql="""
    WITH d AS (
      SELECT DISTINCT event_type AS g,
             CAST(concat('0x', substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h
      FROM events
      WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d
    ), a AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(CASE WHEN rn = 64 THEN h END) AS hk
      FROM r WHERE rn <= 64 GROUP BY g
    ), tr AS (
      SELECT event_type AS g, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
      FROM events GROUP BY 1
    )
    SELECT a.g AS event_type,
           n_kept,
           CASE WHEN hk IS NOT NULL
                THEN 17732923532771328.0 / CAST(hk AS DOUBLE)
                ELSE CAST(n_kept AS DOUBLE) END AS est_distinct,
           true_distinct
    FROM a JOIN tr USING (g)
    """,
    note="K-minimum-values distinct estimator (k=64, 48-bit md5 hashes): "
    "deterministic integer construction + one IEEE division => the "
    "hash-checkable witness for the rows-only HLL entry "
    "(q_events_approx_distinct); bottom-k summaries are mergeable "
    "(functions/sketches.py kmv_distinct, hot-group prefilter_bits dial)",
)
def x_distinct_kmv(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import kmv_distinct

    ev = t(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_distinct(ev, "event_type", "user_id", k=64)


@query(
    "x_rolling_zscore",
    sql="""
    WITH c AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS vc, ts
      FROM events
    ), w AS (
      SELECT user_id, event_id, vc,
             CAST(COUNT(vc) OVER win AS BIGINT) AS n,
             CAST(SUM(vc) OVER win AS BIGINT) AS s,
             CAST(SUM(vc * vc) OVER win AS BIGINT) AS ss
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, vc,
           (CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS z
    FROM w
    WHERE n >= 10
      AND ss * n > s * s
      AND abs((CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))) > 3.0
    """,
    note="rolling-window anomaly detection: per-user trailing-20 z-score "
    "from exact BIGINT centi-unit sufficient statistics (sum, sum-of-"
    "squares) — one user-keyed window shuffle, doubles enter only in the "
    "final identically-shaped mean/std expression so both engines agree "
    "bit-for-bit; flags |z| > 3",
)
def x_rolling_zscore(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        "ts",
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    )
    w = c.select(
        "user_id",
        "event_id",
        "vc",
        F.count("vc").over(win).cast("bigint").alias("n"),
        F.sum("vc").over(win).cast("bigint").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(win).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    z = (F.col("vc").cast("double") - mean) / F.sqrt(var)
    return (
        w.filter(
            (F.col("n") >= 10)
            & (F.col("ss") * F.col("n") > F.col("s") * F.col("s"))
        )
        .select("user_id", "event_id", "vc", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3.0)
    )


@query(
    "x_user_streaks",
    sql="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    r AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS anchor
      FROM d
    ), runs AS (
      SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, anchor
    )
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS max_streak
    FROM runs GROUP BY user_id
    """,
    note="gaps-and-islands: longest consecutive-active-day streak per user "
    "via the date-minus-rank anchor trick — pure integer/date arithmetic, "
    "two user-keyed shuffles (distinct days, rank window) then a tiny "
    "per-anchor count",
)
def x_user_streaks(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    r = d.withColumn(
        "anchor",
        F.date_sub(
            F.col("day"),
            F.row_number().over(Window.partitionBy("user_id").orderBy("day")),
        ),
    )
    runs = r.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("max_streak"),
    )


@query(
    "x_attribution_linear",
    sql="""
    WITH conv AS (
      SELECT user_id AS u, ts AS p_ts, event_id AS p_id,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_mic
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT user_id AS u, ts AS t_ts, event_id AS t_id, event_type AS touch
      FROM events WHERE event_type <> 'purchase'
    ), per AS (
      SELECT p_id, v_mic, touch, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM conv JOIN touches USING (u)
      WHERE t_ts < p_ts OR (t_ts = p_ts AND t_id < p_id)
      GROUP BY 1, 2, 3
    ), tot AS (
      SELECT p_id, CAST(SUM(cnt) AS BIGINT) AS n FROM per GROUP BY 1
    ), credited AS (
      SELECT touch, per.p_id, (v_mic * cnt) // n AS credit_mic
      FROM per JOIN tot USING (p_id)
    ), touched AS (
      SELECT touch, CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
             CAST(SUM(credit_mic) AS BIGINT) AS revenue_micro
      FROM credited GROUP BY 1
    ), untouched AS (
      SELECT 'none' AS touch, CAST(COUNT(*) AS BIGINT) AS n_purchases_touched,
             CAST(COALESCE(SUM(v_mic), 0) AS BIGINT) AS revenue_micro
      FROM conv WHERE p_id NOT IN (SELECT DISTINCT p_id FROM per)
    )
    SELECT * FROM touched
    UNION ALL
    SELECT * FROM untouched WHERE n_purchases_touched > 0
    """,
    note="linear multi-touch attribution: every prior touch shares the "
    "conversion's value equally, in integer micro-units with floor-"
    "division credit ((v*cnt) div n — deterministic dust, engine-exact, "
    "no cross-engine decimal-division scale rules); untouched conversions "
    "keep full credit under 'none'. Complements x_attribution_last_touch",
)
def x_attribution_linear(spark, sf_dir):
    from flnr_wins_spark.operators.funnel import linear_attribution

    return linear_attribution(t(spark, sf_dir, "events"))


@query(
    "x_attribution_last_touch",
    sql=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'none') AS touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {sql_dsum('value')} AS revenue
    FROM marked WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    note="last-touch marketing attribution: per-purchase credit to the "
    "user's most recent non-purchase event (IGNORE NULLS last_value over a "
    "trailing frame — one user-keyed window shuffle), then a tiny "
    "per-channel decimal-exact revenue rollup",
)
def x_attribution_last_touch(spark, sf_dir):
    from pyspark.sql import Window

    from flnr_wins_spark.plans.common import dsum

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            dsum(F.col("value")).alias("revenue"),
        )
    )


@query(
    "x_kmv_set_ops",
    sql="""
    WITH d AS MATERIALIZED (
      SELECT DISTINCT event_type AS g,
             CAST(concat('0x', substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h
      FROM events
      WHERE user_id IS NOT NULL
    ), sk AS MATERIALIZED (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d) q
      WHERE rn <= 64
    ), pairs AS (
      SELECT a.g AS ga, b.g AS gb
      FROM (SELECT DISTINCT g FROM sk) a JOIN (SELECT DISTINCT g FROM sk) b
        ON a.g < b.g
    ), tagged AS (
      SELECT p.ga, p.gb, s.h, 1 AS a, 0 AS b FROM sk s JOIN pairs p ON s.g = p.ga
      UNION ALL
      SELECT p.ga, p.gb, s.h, 0 AS a, 1 AS b FROM sk s JOIN pairs p ON s.g = p.gb
    ), merged AS (
      SELECT ga, gb, h, MAX(a) AS a, MAX(b) AS b
      FROM tagged GROUP BY ga, gb, h
    ), bk AS (
      SELECT * FROM (
        SELECT ga, gb, h, a, b,
               row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        FROM merged) q WHERE rn <= 64
    ), agg AS (
      SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(CASE WHEN rn = 64 THEN h END) AS hk,
             CAST(SUM(a * b) AS BIGINT) AS inter_num
      FROM bk GROUP BY ga, gb
    ), dv AS MATERIALIZED (
      SELECT DISTINCT event_type AS g, user_id AS v FROM events
      WHERE user_id IS NOT NULL
    ), tv AS (
      SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS true_union,
             CAST(SUM(a * b) AS BIGINT) AS true_inter
      FROM (
        SELECT ga, gb, v, MAX(a) AS a, MAX(b) AS b FROM (
          SELECT p.ga, p.gb, s.v, 1 AS a, 0 AS b FROM dv s JOIN pairs p ON s.g = p.ga
          UNION ALL
          SELECT p.ga, p.gb, s.v, 0 AS a, 1 AS b FROM dv s JOIN pairs p ON s.g = p.gb
        ) t GROUP BY ga, gb, v
      ) m GROUP BY ga, gb
    )
    SELECT agg.ga, agg.gb, n_kept,
           CASE WHEN hk IS NOT NULL
                THEN 17732923532771328.0 / CAST(hk AS DOUBLE)
                ELSE CAST(n_kept AS DOUBLE) END AS union_est,
           (CAST(inter_num AS DOUBLE) / CAST(n_kept AS DOUBLE))
             * (CASE WHEN hk IS NOT NULL
                     THEN 17732923532771328.0 / CAST(hk AS DOUBLE)
                     ELSE CAST(n_kept AS DOUBLE) END) AS inter_est,
           CAST(inter_num AS DOUBLE) / CAST(n_kept AS DOUBLE) AS jaccard_est,
           true_union, true_inter
    FROM agg JOIN tv ON agg.ga = tv.ga AND agg.gb = tv.gb
    """,
    note="KMV set algebra (Beyer SIGMOD'07): pairwise union/intersection/"
    "Jaccard estimates between per-event-type user sets computed from the "
    "bottom-64 sketches ALONE (bottom-k(A∪B) ∩ A ⊆ bottom-k(A) soundness) "
    "— cross-shard overlap without rescanning values; deterministic md5 "
    "construction, exact truth columns carried for inspection "
    "(functions/sketches.py kmv_set_similarity)",
)
def x_kmv_set_ops(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import kmv_set_similarity

    ev = t(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_set_similarity(ev, "event_type", "user_id", k=64)


@query(
    "x_k_anonymity",
    sql="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
           COUNT(*) < 5 AS violates_k,
           COUNT(DISTINCT c_mktsegment) < 2 AS violates_l
    FROM customer
    GROUP BY 1, 2
    """,
    note="k-anonymity + l-diversity audit (Sweeney / Machanavajjhala): "
    "equivalence classes over generalized quasi-identifiers (nation, "
    "2000-unit balance band), one groupBy pass, per-class size and "
    "sensitive-attribute diversity with violation flags "
    "(operators/dataquality.py k_anonymity_report)",
)
def x_k_anonymity(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import k_anonymity_report

    cust = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    return k_anonymity_report(
        cust, ["c_nationkey", "bal_band"], "c_mktsegment", k=5, l=2
    )


# Correlation matrix: every pairwise Pearson r from ONE aggregation pass of
# exact sufficient statistics. Columns are scaled to exact centi-units
# (bigint), all sums ride DECIMAL(38,0) (squares of 1e7-cent prices times
# 6e5 rows overflow bigint), and doubles appear only in the final
# identically-shaped num/sqrt(den) expression — engine-bit-exact.
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs():
    cols = _CORR_COLS
    return [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]


def _corr_sql() -> str:
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _CORR_COLS:
        sums.append(f"SUM(CAST(CAST(round({c} * 100) AS BIGINT) AS DECIMAL(38,0))) AS s_{c}")
        sums.append(
            f"SUM(CAST(CAST(round({c} * 100) AS BIGINT) * CAST(round({c} * 100) AS BIGINT) AS DECIMAL(38,0))) AS q_{c}"
        )
    for a, b in _corr_pairs():
        sums.append(
            f"SUM(CAST(CAST(round({a} * 100) AS BIGINT) * CAST(round({b} * 100) AS BIGINT) AS DECIMAL(38,0))) AS x_{a}_{b}"
        )
    selects = []
    for a, b in _corr_pairs():
        num = f"CAST(n * x_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
        da = f"sqrt(CAST(n * q_{a} - s_{a} * s_{a} AS DOUBLE))"
        db = f"sqrt(CAST(n * q_{b} - s_{b} * s_{b} AS DOUBLE))"
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, {num} / ({da} * {db}) AS corr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem) "
        + " UNION ALL ".join(selects)
    )


@query(
    "x_correlation_matrix",
    sql=_corr_sql(),
    note="pairwise Pearson correlation matrix from ONE pass of exact "
    "sufficient statistics (centi-unit bigints summed in DECIMAL(38,0) — "
    "price squares overflow bigint at SF>=0.1); doubles only in the final "
    "identically-shaped closed form, per-pair fan-out on the single "
    "aggregate row",
)
def x_correlation_matrix(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cents = {
        c: F.round(F.col(c) * 100).cast("bigint") for c in _CORR_COLS
    }
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(cents[c].cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(F.sum((cents[c] * cents[c]).cast("decimal(38,0)")).alias(f"q_{c}"))
    for a, b in _corr_pairs():
        aggs.append(F.sum((cents[a] * cents[b]).cast("decimal(38,0)")).alias(f"x_{a}_{b}"))
    srow = li.agg(*aggs)
    stack_args = []
    for a, b in _corr_pairs():
        num = (F.col("n") * F.col(f"x_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
        da = F.sqrt((F.col("n") * F.col(f"q_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double"))
        db = F.sqrt((F.col("n") * F.col(f"q_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double"))
        stack_args.extend([F.lit(a), F.lit(b), num / (da * db)])
    return srow.select(
        F.stack(F.lit(len(_corr_pairs())), *stack_args).alias("col_a", "col_b", "corr")
    )


@query(
    "x_ab_test",
    sql="""
    WITH u AS (
      SELECT user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), s AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM u GROUP BY variant
    ), w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
             MAX(CASE WHEN variant = 0 THEN conv END) AS conv_a,
             MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
             MAX(CASE WHEN variant = 1 THEN conv END) AS conv_b
      FROM s
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z
    FROM w
    """,
    note="A/B conversion analysis (conversion = any high-value purchase, so rates are non-degenerate): deterministic variant hash (user_id "
    "parity), per-user conversion flag (one user-keyed groupBy), then the "
    "two-proportion pooled z-statistic from exact integer counts — doubles "
    "enter only in the final identically-shaped rate/z expression",
)
def x_ab_test(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted")
    ).select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "converted")
    s = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    w = s.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (ra - rb) / F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return w.select(
        "n_a", "conv_a", "n_b", "conv_b",
        ra.alias("rate_a"), rb.alias("rate_b"), z.alias("z"),
    )


@query(
    "x_events_m4",
    sql="""
    WITH c AS (
      SELECT date_trunc('hour', ts) AS bucket, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ), r AS (
      SELECT bucket, vc,
             row_number() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM c
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(vc) AS vmin, MAX(vc) AS vmax,
           MAX(CASE WHEN rn_a = 1 THEN vc END) AS vfirst,
           MAX(CASE WHEN rn_d = 1 THEN vc END) AS vlast
    FROM r GROUP BY bucket
    """,
    note="M4 visual downsampling (Jugel et al., ICDE'14): per time bucket "
    "keep exactly min/max/first/last — the 4 points that make a line chart "
    "pixel-identical to the full series; one bucket-keyed window shuffle + "
    "map-side-combined agg, centi-unit bigints end to end",
)
def x_events_m4(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    c = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    wa = Window.partitionBy("bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("bucket").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = c.select(
        "bucket",
        "vc",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("vc").alias("vmin"),
        F.max("vc").alias("vmax"),
        F.max(F.when(F.col("rn_a") == 1, F.col("vc"))).alias("vfirst"),
        F.max(F.when(F.col("rn_d") == 1, F.col("vc"))).alias("vlast"),
    )


@query(
    "x_impute_nulls",
    sql="""
    WITH holes AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 11 = 0 THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS vc
      FROM events
    ), means AS (
      SELECT event_type,
             CAST(SUM(vc) AS BIGINT) // CAST(COUNT(vc) AS BIGINT) AS mean_c
      FROM holes GROUP BY event_type
    )
    SELECT h.event_id,
           coalesce(h.vc, m.mean_c) AS vc_imputed,
           h.vc IS NULL AS was_imputed
    FROM holes h JOIN means m USING (event_type)
    """,
    note="group-wise null imputation (feature-engineering staple): "
    "per-group integer mean of the non-null values (floor division — fully "
    "integer, engine-exact) fills the holes, imputation flag carried; one "
    "group agg + one broadcast-sized join back, no row ever leaves the "
    "executor. Holes injected deterministically (event_id % 11) since the "
    "fixture has no natural nulls",
)
def x_impute_nulls(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    holes = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.round(F.col("value") * 100).cast("bigint")
        ).alias("vc"),
    )
    # floor division via pmod (exact for all signs — Spark's `div`
    # truncates toward zero, DuckDB's `//` floors; pmod is non-negative for
    # a positive divisor, so (s - pmod(s, c)) div c == floor(s / c))
    means = holes.groupBy("event_type").agg(
        F.expr(
            "(CAST(sum(vc) AS BIGINT) - pmod(CAST(sum(vc) AS BIGINT), count(vc)))"
            " div count(vc)"
        ).alias("mean_c")
    )
    return (
        holes.join(F.broadcast(means), "event_type")
        .select(
            "event_id",
            F.coalesce(F.col("vc"), F.col("mean_c")).alias("vc_imputed"),
            F.col("vc").isNull().alias("was_imputed"),
        )
    )


@query(
    "x_incremental_join",
    sql="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_custkey,
           CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_c
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    note="incremental join maintenance (IVM delta rule): base/delta split "
    "by deterministic hash on each side, new join = prev ∪ ΔA⋈B ∪ A⋈ΔB ∪ "
    "ΔA⋈ΔB — the oracle is the FULL REBUILD join, so the driver "
    "hash-proves the incremental composition identity value-for-value; "
    "delta terms broadcast (refresh cost follows the change set) "
    "(operators/merge.py incremental_join)",
)
def x_incremental_join(spark, sf_dir):
    from flnr_wins_spark.operators.merge import incremental_join

    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
    )
    old_a = od.filter(F.pmod(F.col("o_orderkey"), F.lit(10)) != 0)
    delta_a = od.filter(F.pmod(F.col("o_orderkey"), F.lit(10)) == 0)
    old_b = li.filter(F.pmod(F.col("l_linenumber"), F.lit(4)) != 0)
    delta_b = li.filter(F.pmod(F.col("l_linenumber"), F.lit(4)) == 0)
    return incremental_join(old_a, delta_a, old_b, delta_b, ["o_orderkey"]).select(
        "o_orderkey", "l_linenumber", "o_custkey", "qty_c"
    )


@query(
    "x_trajectory_similarity",
    sql="""
    WITH seqs AS (
      SELECT user_id,
             substr(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
                    1, 50) AS seq
      FROM events GROUP BY user_id
    ), q AS (SELECT seq AS qseq FROM seqs WHERE user_id = 0)
    SELECT user_id, CAST(levenshtein(seq, qseq) AS BIGINT) AS dist
    FROM seqs, q
    WHERE user_id <> 0
    ORDER BY dist, user_id
    LIMIT 10
    """,
    note="trajectory similarity search (PAPERS.md REPOSE/top-k family, "
    "reduced to event-type strings): per-user ordered behavioral sequence "
    "(one user-keyed agg, sequences capped at 50 symbols), broadcast query "
    "sequence, JVM levenshtein (integer DP, engine-exact), TakeOrdered "
    "top-10 — query cost is one linear scan of the sequence table, and a "
    "length-band prefilter (fuzzy_join's gate) bounds it further when a "
    "distance cutoff is known",
)
def x_trajectory_similarity(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.substring(
            F.expr(
                "concat_ws('', transform(array_sort("
                "collect_list(struct(ts, event_id, substring(event_type, 1, 1) AS c))"
                "), s -> s.c))"
            ),
            1,
            50,
        ).alias("seq")
    )
    q = seqs.filter(F.col("user_id") == 0).select(F.col("seq").alias("qseq"))
    return (
        seqs.filter(F.col("user_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "user_id",
            F.levenshtein(F.col("seq"), F.col("qseq")).cast("bigint").alias("dist"),
        )
        .orderBy("dist", "user_id")
        .limit(10)
    )


@query(
    "x_time_to_convert",
    sql="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT e.user_id,
             CAST(date_diff('second', s1.t, MIN(e.ts)) AS BIGINT) AS secs
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id, s1.t
    ), r AS (
      SELECT secs, row_number() OVER (ORDER BY secs, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MIN(CASE WHEN rn = (50 * n + 99) // 100 THEN secs END) AS BIGINT)
             AS median_s,
           CAST(MIN(CASE WHEN rn = (90 * n + 99) // 100 THEN secs END) AS BIGINT)
             AS p90_s
    FROM r
    """,
    note="conversion-latency distribution: earliest signup -> earliest "
    "subsequent purchase per user (funnel frontier), then EXACT rank-based "
    "median/p90 in integer seconds (value at rank ceil(p*N/100), the "
    "winsorize rule — no interpolation ambiguity, engine-bit-exact); the "
    "rank comes from the range-sharded global_row_number, NOT a "
    "single-partition window",
)
def x_time_to_convert(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t"))
        .groupBy("user_id", "t")
        .agg(F.min("ts").alias("pt"))
        .select(
            "user_id",
            (
                F.expr("unix_micros(cast(pt as timestamp_ltz)) div 1000000")
                - F.expr("unix_micros(cast(t as timestamp_ltz)) div 1000000")
            ).cast("bigint").alias("secs"),
        )
    )
    from flnr_wins_spark.operators.ranking import global_row_number

    ranked = global_row_number(conv, ["secs", "user_id"])
    nrow = conv.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = ranked.crossJoin(F.broadcast(nrow)).select("secs", "rn", "n")
    return r.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.min(
            F.when(F.col("rn") == F.expr("(50 * n + 99) div 100"), F.col("secs")).cast("bigint")
        ).alias("median_s"),
        F.min(
            F.when(F.col("rn") == F.expr("(90 * n + 99) div 100"), F.col("secs")).cast("bigint")
        ).alias("p90_s"),
    )


@query(
    "x_recommend_itemknn",
    sql="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem WHERE l_partkey % 7 = 0
    ),
    cnt AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY item),
    co AS (
      SELECT a.item AS ia, bb.item AS ib, CAST(COUNT(*) AS BIGINT) AS cab
      FROM b a JOIN b bb ON a.basket = bb.basket AND a.item < bb.item
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT ia AS item, ib AS rec, cab FROM co
      UNION ALL
      SELECT ib, ia, cab FROM co
    ),
    scored AS (
      SELECT s.item, s.rec,
             CAST(s.cab AS DOUBLE) / (sqrt(CAST(ci.c AS DOUBLE))
                                      * sqrt(CAST(cj.c AS DOUBLE))) AS score
      FROM sym s JOIN cnt ci ON ci.item = s.item JOIN cnt cj ON cj.item = s.rec
    )
    SELECT item, rec, score, CAST(rn AS INT) AS rec_rank FROM (
      SELECT item, rec, score,
             row_number() OVER (PARTITION BY item ORDER BY score DESC, rec) AS rn
      FROM scored) q
    WHERE rn <= 5
    """,
    note="item-KNN collaborative filtering (classic co-occurrence "
    "recommender): distinct basket-item pairs, within-basket item pairs "
    "(fan-out bounded by basket size), cosine over binary basket vectors = "
    "cab/sqrt(ca*cb) from exact integer counts, per-item top-5 window — "
    "the %7 item subset keeps the demo co-occurrence graph density "
    "realistic at every SF",
)
def x_recommend_itemknn(spark, sf_dir):
    from pyspark.sql import Window

    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 7 == 0)
        .select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    cnt = li.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
    )
    sym = co.select(
        F.col("ia").alias("item"), F.col("ib").alias("rec"), "cab"
    ).unionByName(co.select(F.col("ib").alias("item"), F.col("ia").alias("rec"), "cab"))
    scored = (
        sym.join(cnt.withColumnRenamed("item", "item").alias("ci"), on=F.col("ci.item") == sym.item)
        .select(sym.item, sym.rec, sym.cab, F.col("ci.c").alias("ca"))
        .join(cnt.withColumnRenamed("item", "rec_i").alias("cj"), on=F.col("cj.rec_i") == F.col("rec"))
        .select(
            "item",
            "rec",
            (
                F.col("cab").cast("double")
                / (F.sqrt(F.col("ca").cast("double")) * F.sqrt(F.col("c").cast("double")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("score").desc(), "rec")
    return (
        scored.withColumn("rec_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rec_rank") <= 5)
        .select("item", "rec", "score", "rec_rank")
    )


@query(
    "x_churn_training_set",
    sql="""
    WITH cut AS (
      SELECT MAX(ts) - INTERVAL 7 DAY AS cutoff FROM events
    ),
    feats AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
             CAST(date_diff('day', CAST(MAX(e.ts) AS DATE),
                            CAST(cut.cutoff AS DATE)) AS BIGINT) AS days_inactive
      FROM events e CROSS JOIN cut
      WHERE e.ts <= cut.cutoff
      GROUP BY user_id, cut.cutoff
    ),
    future AS (
      SELECT DISTINCT user_id FROM events e CROSS JOIN cut WHERE e.ts > cut.cutoff
    )
    SELECT f.user_id, n_events, n_purchases, value_c, days_inactive,
           future.user_id IS NULL AS churned
    FROM feats f LEFT JOIN future ON f.user_id = future.user_id
    """,
    note="leakage-free churn training-set construction: features aggregate "
    "STRICTLY before the cutoff (the point-in-time discipline of "
    "x_pit_join, applied to label generation), the label looks only at the "
    "7-day future window; the cutoff is a broadcast scalar aggregate, "
    "features one user-keyed groupBy, label one anti-joinable distinct",
)
def x_churn_training_set(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(F.expr("max(ts) - INTERVAL 7 DAY").alias("cutoff"))
    before = ev.crossJoin(F.broadcast(cut)).filter(F.col("ts") <= F.col("cutoff"))
    feats = before.groupBy("user_id", "cutoff").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("value_c"),
        F.datediff(F.col("cutoff").cast("date"), F.max("ts").cast("date"))
        .cast("bigint")
        .alias("days_inactive"),
    )
    future = (
        ev.crossJoin(F.broadcast(cut))
        .filter(F.col("ts") > F.col("cutoff"))
        .select("user_id")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    return (
        feats.join(future, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "value_c",
            "days_inactive",
            F.col("_seen").isNull().alias("churned"),
        )
    )


_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


@query(
    "x_skew_report",
    sql=f"""
    WITH kv AS (
      {" UNION ALL ".join(f"SELECT '{k}' AS key_col, CAST({k} AS VARCHAR) AS key FROM lineitem" for k in _SKEW_KEYS)}
    ),
    c AS (
      SELECT key_col, key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM kv GROUP BY 1, 2
    ),
    s AS (
      SELECT key_col, CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(SUM(cnt) AS BIGINT) AS total
      FROM c GROUP BY key_col
    )
    SELECT s.key_col, n_keys, max_cnt,
           CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_cnt,
           CAST(max_cnt AS DOUBLE)
             / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_factor,
           MIN(CASE WHEN c.cnt = s.max_cnt THEN c.key END) AS hottest_key
    FROM s JOIN c ON c.key_col = s.key_col
    GROUP BY s.key_col, n_keys, max_cnt, total
    """,
    note="join-key skew diagnostics (the measurement feeding salting/AQE "
    "decisions): per key column — distinct keys, hottest-key count, "
    "max/avg skew factor, and the hottest key itself (min-key tiebreak); "
    "all columns profile in ONE scan via a stacked (col, value) explode "
    "and a single map-side-combined count",
)
def x_skew_report(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    kv = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("key_col"), F.col(k).cast("string").alias("key")
                    )
                    for k in _SKEW_KEYS
                ]
            )
        ).alias("kv")
    ).select("kv.key_col", "kv.key")
    c = kv.groupBy("key_col", "key").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    s = c.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    avg = F.col("total").cast("double") / F.col("n_keys").cast("double")
    return (
        s.join(c, "key_col")
        .groupBy("key_col", "n_keys", "max_cnt", "total")
        .agg(
            F.min(
                F.when(F.col("cnt") == F.col("max_cnt"), F.col("key"))
            ).alias("hottest_key")
        )
        .select(
            "key_col",
            "n_keys",
            "max_cnt",
            avg.alias("avg_cnt"),
            (F.col("max_cnt").cast("double") / avg).alias("skew_factor"),
            "hottest_key",
        )
    )


@query(
    "x_join_size_estimate",
    sql="""
    WITH ca AS (
      SELECT s.seed, substr(md5('s' || CAST(s.seed AS VARCHAR) || ':'
                                || CAST(o_custkey AS VARCHAR)), 1, 2) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c_a
      FROM orders, (SELECT unnest(range(4)) AS seed) s
      GROUP BY 1, 2
    ), cb AS (
      SELECT s.seed, substr(md5('s' || CAST(s.seed AS VARCHAR) || ':'
                                || CAST(c_custkey AS VARCHAR)), 1, 2) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c_b
      FROM customer, (SELECT unnest(range(4)) AS seed) s
      GROUP BY 1, 2
    ), per_seed AS (
      SELECT ca.seed, CAST(SUM(c_a * c_b) AS BIGINT) AS dot
      FROM ca JOIN cb USING (seed, bucket) GROUP BY ca.seed
    ), est AS (SELECT CAST(COALESCE(MIN(dot), 0) AS BIGINT) AS est_size FROM per_seed),
    tr AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS true_size
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT est_size, true_size FROM est, tr
    """,
    note="join-size estimation WITHOUT executing the join (AMS/CMS inner "
    "product): min over 4 seeds of the 256-bucket count dot product — a "
    "guaranteed upper bound (collisions only add mass); one aggregation "
    "pass per side, sketches mergeable; md5 buckets = oracle-exact "
    "(functions/sketches.py cms_join_size)",
)
def x_join_size_estimate(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import cms_join_size

    od = t(spark, sf_dir, "orders").select("o_custkey")
    cu = t(spark, sf_dir, "customer").select("c_custkey")
    return cms_join_size(od, cu, "o_custkey", "c_custkey", depth=4, hex_chars=2)


@query(
    "x_kaplan_meier",
    sql="""
    WITH obs AS (
      SELECT event_type AS g,
             CAST(CAST(floor(value) AS BIGINT) % 50 AS INTEGER) AS t,
             CASE WHEN event_id % 4 > 0 THEN 1 ELSE 0 END AS ev
      FROM events WHERE value IS NOT NULL
    ),
    per_t AS (
      SELECT g, t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM obs GROUP BY 1, 2
    ),
    risk AS (
      SELECT g, t, d, c,
             CAST(SUM(d + c) OVER (PARTITION BY g ORDER BY t DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM per_t
    ),
    terms AS (
      SELECT g, t, d, c, n_risk,
             CASE WHEN d < n_risk THEN
               CAST(ln(1.0 - (CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                    AS DECIMAL(20,9))
             END AS lnterm,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS absorbed
      FROM risk
    ),
    cum AS (
      SELECT g, t, d, c, n_risk,
             CAST(SUM(lnterm) OVER w AS DECIMAL(38,9)) AS ln_s,
             CAST(SUM(absorbed) OVER w AS BIGINT) AS zeroed
      FROM terms
      WINDOW w AS (PARTITION BY g ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT g AS event_type, t, n_risk, d, c,
           CASE WHEN zeroed = 0 THEN CAST(ln_s * 1000000000 AS BIGINT) END
             AS ln_s_e9
    FROM cum
    """,
    note="Kaplan-Meier product-limit survival curves per group: at-risk "
    "counts via one reverse cumulative window, per-time hazard terms "
    "ln(1 - d/n) decimal-rounded (exact rational d/n, single libm ln), "
    "survival reported as the EXACT cumulative decimal ln-sum in 1e-9 "
    "BIGINT units (a product of doubles would be order-fragile; the "
    "ln-domain sum is order-free) — NULL once the curve absorbs at zero "
    "(d = n_risk, where ln is undefined). Shuffles once on the group "
    "key; event-time grid is value-bounded, not row-bounded",
)
def x_kaplan_meier(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        F.col("event_type").alias("g"),
        (F.floor(F.col("value")).cast("bigint") % 50).cast("int").alias("t"),
        F.when(F.col("event_id") % 4 > 0, F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    per_t = obs.groupBy("g", "t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    w_rev = (
        Window.partitionBy("g")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_rev).cast("bigint")
    )
    lnterm = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            F.lit(1.0) - (F.col("d").cast("double") / F.col("n_risk").cast("double"))
        ).cast("decimal(20,9)"),
    )
    absorbed = F.when(F.col("d") >= F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    w_fwd = (
        Window.partitionBy("g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = risk.select(
        "g", "t", "d", "c", "n_risk",
        F.sum(lnterm).over(w_fwd).cast("decimal(38,9)").alias("ln_s"),
        F.sum(absorbed).over(w_fwd).cast("bigint").alias("zeroed"),
    )
    return cum.select(
        F.col("g").alias("event_type"),
        "t",
        "n_risk",
        "d",
        "c",
        F.when(
            F.col("zeroed") == 0,
            (F.col("ln_s") * F.lit(1_000_000_000)).cast("bigint"),
        ).alias("ln_s_e9"),
    )


@query(
    "x_seasonal_decompose",
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             SUM(CAST(value AS DECIMAL(27,6))) AS ydec
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT h, CAST(ydec AS DOUBLE) AS y,
             CASE WHEN COUNT(*) OVER w = 25
                  THEN CAST(SUM(ydec) OVER w AS DOUBLE) / 25.0 END AS trend
      FROM hourly
      WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (SELECT h, y, trend, y - trend AS d FROM tr),
    seas AS (
      SELECT CAST(hour(h) AS INTEGER) AS hod,
             CAST(SUM(CAST(d AS DECIMAL(27,9))) AS DOUBLE)
               / CAST(COUNT(d) AS DOUBLE) AS seasonal
      FROM det WHERE d IS NOT NULL GROUP BY 1
    )
    SELECT det.h AS h, CAST(hour(det.h) AS INTEGER) AS hod, y, trend,
           s.seasonal AS seasonal, det.d - s.seasonal AS remainder
    FROM det JOIN seas s ON CAST(hour(det.h) AS INTEGER) = s.hod
    """,
    note="classical additive seasonal decomposition of the hourly series "
    "(period 24): centered 25-hour moving-average trend (NULL on the 12 "
    "edge hours), per-hour-of-day seasonal means of the detrended series, "
    "remainder = detrended - seasonal. Exactness: hourly sums and all "
    "means route through decimals (window sums exact, one double "
    "division each). Scale shape: the corpus-sized pass is the hourly "
    "groupBy; the global-order window then runs on the CALENDAR-bounded "
    "series (720 rows/month regardless of corpus size), so the "
    "single-partition window is series-sized, never corpus-sized. The MA "
    "frame is ROW-based over OBSERVED hours (sparse series: empty hours "
    "are absent, not zero-filled — left as the caller's resampling "
    "decision)",
)
def x_seasonal_decompose(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"), "value"
        )
        .groupBy("h")
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("ydec"))
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    tr = hourly.select(
        "h",
        F.col("ydec").cast("double").alias("y"),
        F.when(
            F.count(F.lit(1)).over(w) == 25,
            F.sum("ydec").over(w).cast("double") / F.lit(25.0),
        ).alias("trend"),
    )
    det = tr.withColumn("d", F.col("y") - F.col("trend"))
    seas = (
        det.filter(F.col("d").isNotNull())
        .groupBy(F.hour("h").cast("int").alias("hod"))
        .agg(
            (
                F.sum(F.col("d").cast("decimal(27,9)")).cast("double")
                / F.count("d").cast("double")
            ).alias("seasonal")
        )
    )
    return (
        det.withColumn("hod", F.hour("h").cast("int"))
        .join(F.broadcast(seas), "hod")
        .select(
            "h", "hod", "y", "trend", "seasonal",
            (F.col("d") - F.col("seasonal")).alias("remainder"),
        )
    )


@query(
    "x_robust_scale",
    sql="""
    WITH r AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ), b AS (
      SELECT MIN(CASE WHEN rn = greatest(1, (25 * n + 99) // 100)
                      THEN o_totalprice END) AS q1,
             MIN(CASE WHEN rn = greatest(1, (50 * n + 99) // 100)
                      THEN o_totalprice END) AS q2,
             MIN(CASE WHEN rn = greatest(1, (75 * n + 99) // 100)
                      THEN o_totalprice END) AS q3
      FROM r
    )
    SELECT o_orderkey, o_totalprice,
           CASE WHEN q3 - q1 <> 0
                THEN (o_totalprice - q2) / (q3 - q1) END AS scaled
    FROM r, b
    """,
    note="robust standardization (x - median)/IQR with exact rank-based "
    "quartiles (value at rank ceil(p*N/100), the winsorize convention — "
    "identical bound rows in every engine, no interpolation ambiguity); "
    "IQR=0 yields NULL, never a division blow-up; sharded global rank, "
    "bounds broadcast — the corpus never re-shuffles for the scaling",
)
def x_robust_scale(spark, sf_dir):
    from flnr_wins_spark.operators.ranking import robust_scale

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return robust_scale(orders, "o_totalprice", "o_orderkey").select(
        "o_orderkey", "o_totalprice", "scaled"
    )


@query(
    "x_benford_audit",
    sql="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    grid AS (SELECT CAST(i AS INTEGER) AS digit FROM range(1, 10) t(i)),
    f AS (
      SELECT g.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN c ON g.digit = c.digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM f)
    SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS observed,
           CAST(CAST(ln(1.0 + (CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
                     / ln(10.0) AS DECIMAL(20,9)) AS DOUBLE) AS expected,
           (CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
             - CAST(CAST(ln(1.0 + (CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
                         / ln(10.0) AS DECIMAL(20,9)) AS DOUBLE) AS deviation
    FROM f CROSS JOIN tot
    """,
    note="Benford first-digit audit — the classic fabricated-numbers "
    "screen for financial/count columns: observed first-digit shares vs "
    "the Benford expectation log10(1 + 1/d), per-digit deviation. "
    "Expected probs route through DECIMAL(20,9) (two libm lns); observed "
    "shares are single divisions of exact counts. One digit-extraction "
    "scan + a 9-row aggregate",
)
def x_benford_audit(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spark_grid = orders.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    f = spark_grid.join(c, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    tot = f.groupBy().agg(F.sum("n").cast("bigint").alias("nt"))
    observed = F.col("n").cast("double") / F.col("nt").cast("double")
    expected = (
        (
            F.log(F.lit(1.0) + (F.lit(1.0) / F.col("digit").cast("double")))
            / F.log(F.lit(10.0))
        )
        .cast("decimal(20,9)")
        .cast("double")
    )
    return f.crossJoin(F.broadcast(tot)).select(
        "digit", "n",
        observed.alias("observed"),
        expected.alias("expected"),
        (observed - expected).alias("deviation"),
    )


@query(
    "x_cusum_changepoint",
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             SUM(CAST(value AS DECIMAL(27,6))) AS ydec
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT CAST(CAST(SUM(ydec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  AS DECIMAL(20,9)) AS mu
      FROM hourly
    ),
    c AS (
      SELECT h, CAST(ydec AS DOUBLE) AS y,
             SUM(CAST(ydec AS DECIMAL(24,6)) - (SELECT mu FROM stats))
               OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cus
      FROM hourly
    )
    SELECT h, y, CAST(cus AS DOUBLE) AS cusum,
           ABS(cus) = MAX(ABS(cus)) OVER () AS changepoint
    FROM c
    """,
    note="CUSUM mean-shift changepoint detection on the hourly event "
    "series: cumulative sum of deviations from the series mean, exact in "
    "decimals (hourly sums DECIMAL(27,6); the ONE double division for "
    "the mean is IEEE-correctly-rounded in both engines and re-routed "
    "through DECIMAL(20,9), the proven libm pattern; the running sum is "
    "an exact decimal fold) — the argmax |CUSUM| row is the maximum-"
    "likelihood single changepoint, flagged by exact-decimal equality so "
    "no tiebreak hazard exists. Scale shape: the corpus-sized pass is "
    "the hourly groupBy; both windows then run on the CALENDAR-bounded "
    "series (720 rows/month regardless of corpus size) — series-sized, "
    "never corpus-sized, same doctrine as x_seasonal_decompose",
)
def x_cusum_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"), "value"
        )
        .groupBy("h")
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("ydec"))
    )
    stats = hourly.agg(
        (
            F.sum("ydec").cast("double") / F.count(F.lit(1)).cast("double")
        ).cast("decimal(20,9)").alias("mu")
    )
    run = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # (24,6)-(20,9) -> DECIMAL(28,9); its windowed sum is DECIMAL(38,9),
    # exactly at the cap — a wider operand would trip Spark's overflow
    # rule and silently truncate the running sum's scale to 6, while the
    # (24,6) downcast keeps headroom to |hourly sum| < 1e18 (Spark's
    # non-ANSI decimal downcast NULLs on overflow where DuckDB raises;
    # 1e18 is already past double-exactness, so the bound is not the
    # binding constraint)
    cus = F.sum(F.col("ydec").cast("decimal(24,6)") - F.col("mu")).over(run)
    return (
        hourly.crossJoin(F.broadcast(stats))
        .select(
            "h",
            F.col("ydec").cast("double").alias("y"),
            cus.alias("_cus"),
        )
        .select(
            "h", "y",
            F.col("_cus").cast("double").alias("cusum"),
            (F.abs(F.col("_cus")) == F.max(F.abs(F.col("_cus"))).over(whole))
            .alias("changepoint"),
        )
    )


@query(
    "x_holt_forecast",
    sql="""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT d, y, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily
    ),
    holt AS (
      SELECT rn, d, y, y AS level, CAST(0 AS DOUBLE) AS trend,
             CAST(NULL AS DOUBLE) AS onestep
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.d, s.y,
             CAST(0.5 AS DOUBLE) * s.y
               + CAST(0.5 AS DOUBLE) * (h.level + h.trend),
             CAST(0.25 AS DOUBLE)
               * ((CAST(0.5 AS DOUBLE) * s.y
                   + CAST(0.5 AS DOUBLE) * (h.level + h.trend)) - h.level)
               + CAST(0.75 AS DOUBLE) * h.trend,
             h.level + h.trend
      FROM holt h JOIN seq s ON s.rn = h.rn + 1
    )
    SELECT rn, d, y, level, trend, onestep FROM holt
    """,
    note="Holt linear-trend exponential smoothing over the daily revenue "
    "series (alpha=1/2, beta=1/4 — dyadic, so every smoothing product is "
    "an exact IEEE operation): level/trend recurrences and the one-step-"
    "ahead forecast, fitted sequentially. The oracle is a true recursive-"
    "CTE twin with the IDENTICAL operation order, so doubles land on the "
    "same bits (the memory-proven pure-fold discipline — no pairwise "
    "summation anywhere). Scale shape: the corpus-sized pass is the "
    "daily groupBy; the recurrence then runs driver-side on the "
    "CALENDAR-BOUNDED series (~2.4k rows regardless of corpus size — "
    "the same model-sized-collect doctrine as the unigram-LM fit and "
    "the seasonal/CUSUM series windows). Routed through the DISTRIBUTED "
    "per-group operator (operators/forecast.py holt_smooth_grouped) as a "
    "single-group call: the recurrence runs inside ONE Arrow batch on an "
    "executor — no driver collect anywhere in the plan, and the op order "
    "is the shared holt_step, so the bits are unchanged from the "
    "driver-side original",
)
def x_holt_forecast(spark, sf_dir):
    from flnr_wins_spark.operators.forecast import holt_smooth_grouped

    od = t(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .cast("double")
        .alias("rev")
    )
    smoothed = holt_smooth_grouped(
        daily.withColumn("grp", F.lit("all")), "grp", "d", "rev"
    )
    return smoothed.select("rn", "d", "y", "level", "trend", "onestep")


@query(
    "x_holt_forecast_grouped",
    sql="""
    WITH RECURSIVE daily AS (
      SELECT o_orderpriority AS grp, o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1, 2
    ),
    seq AS (
      SELECT grp, d, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d)
                  AS BIGINT) AS rn
      FROM daily
    ),
    holt AS (
      SELECT grp, rn, d, y, y AS level, CAST(0 AS DOUBLE) AS trend,
             CAST(NULL AS DOUBLE) AS onestep
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.grp, s.rn, s.d, s.y,
             CAST(0.5 AS DOUBLE) * s.y
               + CAST(0.5 AS DOUBLE) * (h.level + h.trend),
             CAST(0.25 AS DOUBLE)
               * ((CAST(0.5 AS DOUBLE) * s.y
                   + CAST(0.5 AS DOUBLE) * (h.level + h.trend)) - h.level)
               + CAST(0.75 AS DOUBLE) * h.trend,
             h.level + h.trend
      FROM holt h JOIN seq s ON s.grp = h.grp AND s.rn = h.rn + 1
    )
    SELECT grp, rn, d, y, level, trend, onestep FROM holt
    """,
    note="DISTRIBUTED per-group Holt smoothing — the forecasting-at-scale "
    "shape: one shuffle on the group key, then every series' recurrence "
    "runs inside its own Arrow batch (applyInPandas), no driver collect "
    "anywhere (the single-series x_holt_forecast documents the "
    "driver-side posture; THIS is the one that holds at millions of "
    "series). The per-row update is plain Python floats in a fixed IEEE "
    "op order, so the recursive-CTE oracle (recursion keyed by (grp, "
    "rn)) lands on identical bits. State per task is one series, "
    "calendar-bounded",
)
def x_holt_forecast_grouped(spark, sf_dir):
    from flnr_wins_spark.operators.forecast import holt_smooth_grouped

    od = t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderdate").alias("d"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .cast("double")
        .alias("rev")
    )
    return holt_smooth_grouped(daily, "grp", "d", "rev")
