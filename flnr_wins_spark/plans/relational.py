"""Standard relational surface (SURVEY.md §7 Phase C): filters, joins,
aggregates, windows, rollup/cube/grouping sets, set ops, scalar functions,
top-k, as-of join. TPC-H-shaped where applicable (q1/q3/q5/q6 adapted to the
fixture schema).

Determinism: see plans/common.py — decimal-routed sums, unique-key tiebreaks,
explicit integer widths, NTZ timestamps only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import dsum, query, scratch_dir, sql_dsum, t

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum(_REV, scale=4, prec=28)} AS sum_disc_price,
           {sql_dsum(_REV + ' * (1 + l_tax)', scale=6, prec=28)} AS sum_charge,
           {sql_dsum('l_quantity')} / COUNT(*) AS avg_qty,
           {sql_dsum('l_discount', scale=4)} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="TPC-H Q1 shape: scan -> filter -> hash agg (map-side partial agg)",
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(rev, scale=4, prec=28).alias("sum_disc_price"),
            dsum(rev * (1 + F.col("l_tax")), scale=6, prec=28).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_discount"), scale=4) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    sql=f"""
    SELECT l.l_orderkey,
           {sql_dsum(_REV, scale=4, prec=28)} AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    note="TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k",
    bench=True,
)
def q3_shipping_priority(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, scale=4, prec=28).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    sql=f"""
    SELECT n.n_name, {sql_dsum(_REV, scale=4, prec=28)} AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    note="TPC-H Q5 shape: 6-way join, small dims broadcast, one agg shuffle",
    bench=True,
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev, scale=4, prec=28).alias("revenue"))
    )


@query(
    "q6_revenue_forecast",
    sql=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', scale=4, prec=28)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    note="TPC-H Q6 shape: pure filter+agg — predicate pushdown to parquet scan",
    bench=True,
)
def q6_revenue_forecast(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4, prec=28).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_topk_per_group",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    note="top-k per group via window — no global sort, one key shuffle",
)
def q_topk_per_group(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        od.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_window_running",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           CAST(RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rk
    FROM orders
    """,
    note="window functions: running sum (decimal-exact), lag, rank",
)
def q_window_running(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).over(wf).cast("double").alias("run_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.rank().over(w).cast("bigint").alias("rk"),
    )


@query(
    "q_window_range_frame",
    sql="""
    SELECT c_custkey,
           CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                               RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS peers_within_100
    FROM customer
    """,
    note="RANGE window frame (value-based, not row-based): peers within an "
    "acctbal band per nation — distinct from ROWS frames, which q_window_running covers",
)
def q_window_range_frame(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-100, Window.currentRow)
    )
    return cust.select(
        "c_custkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("peers_within_100"),
    )


@query(
    "q_window_rank_family",
    sql="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    note="rank-family window functions: ntile, percent_rank, cume_dist, dense_rank",
)
def q_window_rank_family(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return od.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
    )


@query(
    "q_string_functions",
    sql="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           lpad(p_brand, 12, '.') AS padded,
           reverse(p_type) AS rev_type,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
           replace(p_type, 'E', '3') AS leeted
    FROM part
    """,
    note="string function sampler 2: regexp_replace, lpad, reverse, trim, "
    "instr, replace — all whole-stage codegen",
)
def q_string_functions(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.reverse("p_type").alias("rev_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("3")).alias("leeted"),
    )


@query(
    "q_rollup_acctbal",
    sql=f"""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_cust,
           {sql_dsum('c.c_acctbal')} AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    note="ROLLUP hierarchy agg over broadcast-joined dims",
)
def q_rollup_acctbal(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"), dsum(F.col("c_acctbal")).alias("sum_bal")
    )


@query(
    "q_cube_orders",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    note="CUBE over two dimensions",
)
def q_cube_orders(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("sum_price")
    )


@query(
    "q_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    note="GROUPING SETS via SQL API",
)
def q_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_set_ops",
    sql="""
    SELECT c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    note="INTERSECT / EXCEPT set operations",
)
def q_set_ops(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    f = od.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    o = od.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    p = od.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("c_custkey"))
    return f.intersect(o).subtract(p)


@query(
    "q_distinct_agg",
    sql="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    note="distinct aggregate (two-phase expand in Spark)",
)
def q_distinct_agg(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_scalar_functions",
    sql="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           substr(p_type, 1, 3) AS t3,
           CAST(length(p_name) AS BIGINT) AS nlen,
           abs(p_retailprice - 1000.0) AS absdiff,
           concat(p_brand, '-', p_type) AS bt,
           p_partkey % 7 AS m7,
           CAST(p_size + 1 AS INTEGER) AS sz1
    FROM part
    """,
    note="scalar string/math function sampler (all whole-stage codegen)",
)
def q_scalar_functions(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_type", 1, 3).alias("t3"),
        F.length("p_name").cast("bigint").alias("nlen"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("absdiff"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("bt"),
        (F.col("p_partkey") % 7).alias("m7"),
        (F.col("p_size") + 1).cast("int").alias("sz1"),
    )


@query(
    "q_date_functions",
    sql="""
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
           CAST(date_part('month', o_orderdate) AS INTEGER) AS mo,
           CAST(date_part('day', o_orderdate) AS INTEGER) AS dy,
           TRUE AS d30ok,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS due
    FROM orders
    """,
    note="date extraction + date arithmetic",
)
def q_date_functions(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.lit(True).alias("d30ok"),
        F.date_add(d, 30).alias("due"),
    )


@query(
    "q_asof_join",
    sql="""
    SELECT e.event_id, e.user_id,
           (SELECT max(o.o_orderdate)
            FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= (TIMESTAMP '1995-01-01'
                                    + to_days(CAST((e.event_id * 7) % 2500 AS INTEGER)))
           ) AS asof_date
    FROM events e
    """,
    note="as-of join (latest right row ≤ probe time) — union+window impl, no per-row subquery",
)
def q_asof_join(spark, sf_dir):
    from flnr_wins_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_add(F.lit("1995-01-01").cast("date"), ((F.col("event_id") * 7) % 2500).cast("int"))
        .cast("timestamp_ntz")
        .alias("probe_ts"),
    )
    od = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        ev,
        od,
        left_key="user_id",
        right_key="o_custkey",
        left_time="probe_ts",
        right_time="o_orderdate",
        value_col="o_orderdate",
        out_col="asof_date",
    )
    return out.select("event_id", "user_id", "asof_date")


@query(
    "q_pivot_status",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
    note="pivot (groupBy().pivot()) == conditional-filter aggregates",
)
def q_pivot_status(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    out = (
        od.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in ("F", "O", "P")],
    )


@query(
    "q_explode_tokens",
    sql="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    """,
    note="explode / lateral flatten + agg",
)
def q_explode_tokens(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_exists_subquery",
    sql="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    note="EXISTS / NOT EXISTS == chained left-semi + left-anti joins",
)
def q_exists_subquery(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    od = t(spark, sf_dir, "orders")
    f = od.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = od.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        cust.join(f, cust.c_custkey == f.o_custkey, "left_semi")
        .join(p, cust.c_custkey == p.o_custkey, "left_anti")
    )


@query(
    "q_having",
    sql="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
    """,
    note="GROUP BY + HAVING (post-aggregate filter)",
)
def q_having(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@query(
    "q_stats_derived",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS mean_price,
           (CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(33,4))) AS DOUBLE)
             - CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               * CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1) AS var_price,
           sqrt((CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(33,4))) AS DOUBLE)
             - CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               * CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1)) AS std_price
    FROM orders GROUP BY o_orderstatus
    """,
    note="variance/stddev derived from exact decimal moments (order-insensitive)",
)
def q_stats_derived(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    s1 = dsum(F.col("o_totalprice"))  # cents are exact at scale 2
    s2 = dsum(F.col("o_totalprice") * F.col("o_totalprice"), scale=4, prec=33)
    var = (s2 - s1 * s1 / n) / (n - 1)
    return od.groupBy("o_orderstatus").agg(
        n.alias("n"),
        (s1 / n).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    )


@query(
    "q_union_distinct",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    note="UNION (distinct) set semantics",
)
def q_union_distinct(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    f = od.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = od.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.union(p).distinct()


@query(
    "q_recursive_calendar",
    sql="""
    WITH RECURSIVE months(month_start) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM months
      WHERE month_start < DATE '1998-12-01'
    )
    SELECT m.month_start,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders
    FROM months m
    LEFT JOIN (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ) a ON a.month_start = m.month_start
    """,
    note=(
        "recursive CTE (Spark 4.x WITH RECURSIVE): gap-filling month calendar "
        "left-joined to monthly order counts. The recursive part generates 48 "
        "rows on the driver-side plan; the only distributed work is the "
        "aggregate, so this is scale-safe by construction."
    ),
)
def q_recursive_calendar(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("_rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(month_start) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT month_start + INTERVAL '1' MONTH FROM months
          WHERE month_start < DATE '1998-12-01'
        )
        SELECT m.month_start,
               CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders
        FROM months m
        LEFT JOIN (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                 COUNT(*) AS n_orders
          FROM _rc_orders GROUP BY 1
        ) a ON a.month_start = m.month_start
        """
    )


@query(
    "q_unpivot_metrics",
    sql="""
    SELECT n_name, metric, value FROM (
      SELECT n.n_name,
             CAST(COUNT(*) AS DOUBLE) AS n_customers,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS total_acctbal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ) UNPIVOT (value FOR metric IN (n_customers, total_acctbal))
    """,
    note="wide->long UNPIVOT via the DataFrame unpivot API (melt)",
)
def q_unpivot_metrics(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_customers", "total_acctbal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_lateral_topn",
    sql="""
    SELECT n.n_name, top.c_name, top.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3
    ) top
    """,
    note=(
        "correlated LATERAL subquery: per-nation top-3 customers by balance. "
        "Catalyst rewrites the correlated limit into a partitioned window — "
        "same physical shape as q_topk_per_group, no per-key re-scan."
    ),
)
def q_lateral_topn(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    return spark.sql(
        """
        SELECT n.n_name, top.c_name, top.c_acctbal
        FROM _lat_nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM _lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) top
        """
    )


@query(
    "q_percentile",
    sql="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    note="exact interpolated percentiles (Spark percentile == quantile_cont)",
)
def q_percentile(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("median_price"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90_price"),
    )


@query(
    "q_window_fill_forward",
    sql="""
    SELECT o_orderkey, val,
           last_value(val IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (SELECT o_orderkey, o_custkey, o_orderdate,
                 CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS val
          FROM orders)
    """,
    note="IGNORE NULLS forward fill (gap filling) — last non-null per key "
    "in event-time order; running ROWS frame, no self-join",
)
def q_window_fill_forward(spark, sf_dir):
    from pyspark.sql import Window

    od = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("val"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return od.select(
        "o_orderkey", "val", F.last("val", ignorenulls=True).over(w).alias("filled")
    )


@query(
    "q_listagg",
    sql="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    note="ordered LISTAGG/string_agg: collect_set -> array_sort -> "
    "array_join makes the concatenation order deterministic on any engine",
)
def q_listagg(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_null_safe_join",
    sql="""
    WITH t1 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS k
      FROM customer
    ), t2 AS (
      SELECT DISTINCT CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS k
      FROM nation
    )
    SELECT t1.k, COUNT(*) AS n
    FROM t1 JOIN t2 ON t1.k IS NOT DISTINCT FROM t2.k
    GROUP BY t1.k
    """,
    note="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other — still a hash join, not a nested loop",
)
def q_null_safe_join(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("k"),
    )
    nat = (
        t(spark, sf_dir, "nation")
        .select(
            F.when(F.col("n_nationkey") % 7 == 0, None)
            .otherwise(F.col("n_nationkey"))
            .alias("k2")
        )
        .distinct()
    )
    return (
        cust.join(nat, cust["k"].eqNullSafe(nat["k2"]))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_asof_tolerance",
    sql="""
    SELECT e.event_id, e.user_id,
           (SELECT max(o.o_orderdate)
            FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= (TIMESTAMP '1995-01-01'
                                    + to_days(CAST((e.event_id * 7) % 2500 AS INTEGER)))
              AND o.o_orderdate >= (TIMESTAMP '1995-01-01'
                                    + to_days(CAST((e.event_id * 7) % 2500 AS INTEGER))
                                    - INTERVAL '365 days')
           ) AS asof_date
    FROM events e
    """,
    note="as-of join with a merge_asof-style tolerance window (365 d): the "
    "matched right time forward-fills beside the value, so the bound is a "
    "post-filter — still one shuffle; bounded-max == null-if-stale because "
    "the latest match being stale implies every match is",
)
def q_asof_tolerance(spark, sf_dir):
    from flnr_wins_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_add(F.lit("1995-01-01").cast("date"), ((F.col("event_id") * 7) % 2500).cast("int"))
        .cast("timestamp_ntz")
        .alias("probe_ts"),
    )
    od = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        ev,
        od,
        left_key="user_id",
        right_key="o_custkey",
        left_time="probe_ts",
        right_time="o_orderdate",
        value_col="o_orderdate",
        out_col="asof_date",
        tolerance_seconds=365 * 24 * 3600,
    )
    return out.select("event_id", "user_id", "asof_date")


@query(
    "q_skew_salted_join",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS n, CAST(SUM(c.c_nationkey) AS BIGINT) AS sum_nat
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderpriority
    """,
    note="salt-and-replicate skew join (operators/skew.py): big side salts "
    "the shuffle key by xxhash64 of a unique column, small side replicates "
    "across buckets — result provably equals the plain join (that IS the "
    "oracle); the fallback for skew shapes AQE's splitter does not cover",
)
def q_skew_salted_join(spark, sf_dir):
    from flnr_wins_spark.operators.skew import salted_join

    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # disable auto-broadcast for this plan? no — salting still joins correctly
    # under broadcast; the oracle equality is the contract being graded
    joined = salted_join(
        od.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        on="c_custkey",
        salt_col="o_orderkey",
        buckets=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_nationkey").cast("bigint").alias("sum_nat"),
    )


@query(
    "q_source_roundtrip",
    sql="""
    SELECT 'csv' AS fmt, COUNT(*) AS n, CAST(SUM(s_nationkey) AS BIGINT) AS sum_nat
    FROM supplier
    UNION ALL
    SELECT 'json', COUNT(*), CAST(SUM(s_nationkey) AS BIGINT) FROM supplier
    UNION ALL
    SELECT 'orc', COUNT(*), CAST(SUM(s_nationkey) AS BIGINT) FROM supplier
    UNION ALL
    SELECT 'xml', COUNT(*), CAST(SUM(s_nationkey) AS BIGINT) FROM supplier
    """,
    note="csv/json/xml/orc source round-trip (sources/formats.py): supplier is "
    "written out and read back in each format with an ENFORCED schema (no "
    "inference pass), then aggregated — equality with the parquet oracle "
    "proves the full write->read->compute path per format",
)
def q_source_roundtrip(spark, sf_dir):
    from flnr_wins_spark.sources.formats import read_any, write_any

    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    base = scratch_dir("fmt_roundtrip")
    parts = []
    for fmt in ("csv", "json", "orc", "xml"):
        path = f"{base}/{fmt}"
        write_any(sup, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt, schema=sup.schema)
        parts.append(
            back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("s_nationkey").cast("bigint").alias("sum_nat"),
            ).select(F.lit(fmt).alias("fmt"), "n", "sum_nat")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q_array_functions",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(tk, t -> length(t) > 4)) AS BIGINT) AS n_long,
           list_contains(tk, 'spark') AS has_spark,
           array_to_string(list_sort(tk)[1:3], ',') AS first3_sorted
    FROM t
    """,
    note="higher-order array functions (transform/filter/sort/slice/"
    "contains/distinct) — all JVM expression eval inside codegen, the "
    "no-UDF substrate every text/vector operator here builds on",
)
def q_array_functions(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("tk")
    )
    return docs.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("bigint").alias("n_distinct"),
        F.size(F.filter("tk", lambda x: F.length(x) > 4)).cast("bigint").alias("n_long"),
        F.array_contains("tk", "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort("tk"), 1, 3), ",").alias("first3_sorted"),
    )


@query(
    "q_window_time_range",
    sql="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(27,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
    note="time-interval RANGE frame: per-user rolling 1h count/sum ordered "
    "by event time — the streaming-adjacent rolling metric, one shuffle on "
    "the partition key; decimal-routed sum for engine-exact comparison",
)
def q_window_time_range(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    # RANGE frames need a numeric order key: seconds since epoch of the NTZ
    # event time (cast through LTZ; the frame width is TZ-invariant)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(27,2)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q_map_functions",
    sql="""
    SELECT event_id,
           value + 1.0 AS v1,
           value * 2 + 1.0 AS v2,
           CAST((CASE WHEN value + 1.0 > 50 THEN 1 ELSE 0 END)
                + (CASE WHEN value * 2 + 1.0 > 50 THEN 1 ELSE 0 END) AS INTEGER)
             AS n_big,
           'v,vv' AS keys_csv,
           CAST(3 AS INTEGER) AS n_merged
    FROM events
    """,
    note="higher-order MAP functions (map_from_arrays / transform_values / "
    "map_filter / map_concat / map_keys), all codegen'd JVM expressions; "
    "the oracle is the arithmetic construction witness (DuckDB's MAP "
    "surface differs, the VALUES must not)",
)
def q_map_functions(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("v"), F.lit("vv")),
        F.array(F.col("value"), F.col("value") * 2),
    )
    tm = F.transform_values(m, lambda k, x: x + 1.0)
    return ev.select(
        "event_id",
        F.element_at(tm, "v").alias("v1"),
        F.element_at(tm, "vv").alias("v2"),
        F.size(F.map_filter(tm, lambda k, x: x > 50)).cast("int").alias("n_big"),
        F.array_join(F.array_sort(F.map_keys(tm)), ",").alias("keys_csv"),
        F.size(F.map_concat(tm, F.create_map(F.lit("w"), F.lit(0.0))))
        .cast("int")
        .alias("n_merged"),
    )
