"""Extended TPC-H-shaped relational coverage (SURVEY.md §7 Phase C).

The reference has no relational query surface beyond §2b (left-outer equi
join, COUNT(*) GROUP BY — ``src/wins_transform_staging.py:177,240-243``); the
driver's gate runs TPC-H-shaped fixtures, so the standard decision-support
query shapes live here, adapted to the fixture schema (no partsupp table; no
commit/receipt dates, ship modes, phones, or comments — predicates are
adapted to the columns that exist, query *shape* is preserved).

Plan-shape notes per query record why each is the plan we'd want at 100 TB:
dimension sides broadcast, fact-fact joins shuffle on their natural keys,
aggregations are partial (map-side) before the exchange, and no query
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import dsum, query, sql_dsum, t

_REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@query(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    note="TPC-H Q4 shape (commitdate predicate adapted to shipdate): "
    "semi-join then agg; Catalyst plans EXISTS as left-semi, date filter "
    "pushed to the orders scan",
)
def q4_order_priority(spark, sf_dir):
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    matched = od.join(
        li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q7_volume_shipping",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', scale=4, prec=28)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
             {_REV} AS volume
      FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
      WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
        AND c.c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    note="TPC-H Q7 shape: fact-fact shuffle join on orderkey; both nation "
    "dims broadcast (fixed 25-row cardinality), SF-scaling sides AQE-planned; "
    "the disjunctive nation-pair predicate applies post-join",
)
def q7_volume_shipping(spark, sf_dir):
    sup = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    od = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), scale=4, prec=28).alias("revenue"))
    )


@query(
    "q8_national_market_share",
    sql=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", scale=4, prec=28)}
             / {sql_dsum('volume', scale=4, prec=28)} AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             {_REV} AS volume, n2.n_name AS nation
      FROM part p, supplier s, lineitem l, orders o, customer c,
           nation n1, nation n2, region r
      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
        AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    note="TPC-H Q8 shape: 8-way join, nation/region broadcast, SF-scaling part/supplier AQE-planned, conditional "
    "market-share ratio per year",
)
def q8_national_market_share(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
        .withColumn("nat_volume", vol)
        .groupBy("o_year")
        .agg(
            (
                dsum(F.col("nat_volume"), scale=4, prec=28)
                / dsum(F.col("volume"), scale=4, prec=28)
            ).alias("mkt_share")
        )
    )


@query(
    "q10_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name, {sql_dsum(_REV, scale=4, prec=28)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10 shape: selective fact filters -> shuffle join -> agg -> "
    "top-20 (TakeOrderedAndProject, no full sort)",
)
def q10_returned_items(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), scale=4, prec=28).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipping_delay",
    sql="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT l_orderkey,
             CASE WHEN date_diff('day', CAST(o2.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= 30 THEN 'fast'
                  WHEN date_diff('day', CAST(o2.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= 90 THEN 'normal'
                  ELSE 'slow' END AS delay_bucket
      FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
      WHERE l.l_shipdate >= o2.o_orderdate
        AND o2.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o2.o_orderdate < TIMESTAMP '1997-01-01'
    ) d JOIN orders o ON d.l_orderkey = o.o_orderkey
    GROUP BY delay_bucket
    """,
    note="TPC-H Q12 shape (shipmode adapted to shipping-delay buckets): "
    "join + CASE bucketing + conditional counts",
)
def q12_shipping_delay(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(bucket.alias("delay_bucket"), high.alias("_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15)
      AND NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    note="TPC-H Q16 shape (lineitem stands in for partsupp): NOT EXISTS "
    "subquery = anti-join (matches Spark left_anti semantics exactly, "
    "including NULL keys — NOT IN would diverge on NULLs), IN-list + <> "
    "filters, COUNT(DISTINCT)",
)
def q16_supplier_part_counts(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15)
    )
    li = t(spark, sf_dir, "lineitem")
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    note="TPC-H Q13 shape: left-outer join preserving order-less customers, "
    "two-level aggregation (per-key count then histogram); second agg input "
    "is one row per customer so the re-shuffle is tiny",
)
def q13_customer_distribution(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(od, cust.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_effect",
    sql=f"""
    SELECT 100.00 * {sql_dsum(f"CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END", scale=4, prec=28)}
           / {sql_dsum(_REV, scale=4, prec=28)} AS promo_revenue
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    note="TPC-H Q14 shape (PROMO prefix adapted to the categorical p_type): "
    "filtered part side AQE-planned (broadcast at runtime while it fits), single global agg with conditional numerator",
)
def q14_promo_effect(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(promo, scale=4, prec=28)
                / dsum(_rev(), scale=4, prec=28)
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_REV, scale=4, prec=28)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s, revenue r
    WHERE s.s_suppkey = r.supplier_no
      AND r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    note="TPC-H Q15 shape: agg once, global max reduced to a one-row scalar "
    "and broadcast back over the revenue relation — no second scan of "
    "lineitem, no single-partition window barrier",
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), scale=4, prec=28).alias("total_revenue")
    )
    # exact decimal-routed sums make the max-equality deterministic; the max
    # collapses to ONE row, so broadcasting it is bounded by construction
    # (unlike broadcasting the supplier-cardinality `revenue` itself)
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    best = revenue.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    sup = t(spark, sf_dir, "supplier")
    return (
        best.join(sup, best.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    sql=f"""
    SELECT {sql_dsum('l.l_extendedprice', scale=4, prec=28)} / 7.0 AS avg_yearly
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
    note="TPC-H Q17 shape: correlated scalar subquery decorrelated into a "
    "per-part pre-aggregation joined back (Catalyst does the same rewrite); "
    "per-part avg relation is partkey-cardinality — UNBOUNDED at scale, so no explicit broadcast hint; AQE broadcasts it at runtime only while it fits",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum(F.col("l_extendedprice"), scale=4, prec=28) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_volume_customer",
    sql=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice,
           {sql_dsum('l.l_quantity')} AS sum_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 140
      )
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    note="TPC-H Q18 shape, aggregate-once form: the HAVING aggregate IS the "
    "output aggregate (both are SUM(CAST(l_quantity AS DECIMAL(27,2))) per "
    "l_orderkey — the semi-join keeps every lineitem row of a qualifying "
    "order, so re-summing after the semi-join returns the value the HAVING "
    "already computed). One lineitem scan + one l_orderkey exchange; the "
    "filtered per-order frame (rare orders above the threshold) then "
    "broadcast-joins orders and customer",
    bench=True,
)
def q18_large_volume_customer(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    per = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("_q"))
        .filter(F.col("_q") > 140)
    )
    return (
        per.join(od, per.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            F.col("_q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    sql=f"""
    SELECT {sql_dsum(_REV, scale=4, prec=28)} AS revenue
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND ((p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
        OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
        OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15))
    """,
    note="TPC-H Q19 shape: disjunctive mixed-table predicate; filtered part side AQE-planned "
    "and the OR-of-ANDs evaluates in the join's codegen stage",
)
def q19_discounted_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    pred = (
        ((br == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((br == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((br == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(dsum(_rev(), scale=4, prec=28).alias("revenue"))
    )


@query(
    "q22_global_sales_opportunity",
    sql="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
    note="TPC-H Q22 shape (phone-prefix adapted to nationkey; anti-join "
    "scoped to recent orders so the fixture yields rows): scalar agg "
    "broadcast into the filter, anti-join against orders, then group",
)
def q22_global_sales_opportunity(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = od.filter(F.col("o_orderdate") >= _ts("2000-01-01"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(27,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    sql="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost AS supplycost
    FROM part, supplier, ps, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    """,
    note="TPC-H Q2 shape (no partsupp fixture: supply cost derived as the "
    "per-(part,supplier) minimum unit price observed in lineitem). The "
    "correlated MIN subquery is planned as a window min over the "
    "region-scoped join — one scan, no re-read; nation/region broadcast, supplier/part AQE-planned",
)
def q2_min_cost_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # Region-scoped (part, supplier, cost) relation; the correlated subquery in
    # the oracle scopes to the same region, so a per-partkey window min over
    # this relation is semantically identical and needs no second pass.
    scoped = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    best = scoped.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return best.join(part, best.ps_partkey == part.p_partkey).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        F.col("ps_supplycost").alias("supplycost"),
    )


@query(
    "q9_product_type_profit",
    sql=f"""
    SELECT n_name AS nation, o_year, {sql_dsum('amount', scale=4, prec=28)} AS sum_profit
    FROM (
      SELECT n.n_name, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * 0.1 * l.l_quantity AS amount
      FROM part p, supplier s, lineitem l, orders o, nation n
      WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
        AND p.p_name LIKE '%gear%'
    ) profit
    GROUP BY n_name, o_year
    """,
    note="TPC-H Q9 shape (no ps_supplycost: cost modeled as 10% of "
    "p_retailprice). part filter prunes before the fact join; part/supplier/"
    "nation broadcast, part/supplier AQE-planned; the lineitem-orders join is the dominant shuffle",
    bench=True,
)
def q9_product_type_profit(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.1) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), scale=4, prec=28).alias("sum_profit"))
    )


@query(
    "q11_important_value",
    sql=f"""
    WITH scoped AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
    )
    SELECT l_partkey, {sql_dsum('val', scale=4, prec=28)} AS value
    FROM scoped
    GROUP BY l_partkey
    HAVING {sql_dsum('val', scale=4, prec=28)} > (
      SELECT {sql_dsum('val', scale=4, prec=28)} * 0.001 FROM scoped)
    """,
    note="TPC-H Q11 shape (partsupp value replaced by shipped revenue per "
    "part for one nation's suppliers). Scalar-subquery threshold broadcast "
    "into the HAVING filter; per-part agg shuffles once on l_partkey",
)
def q11_important_value(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scoped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("l_partkey", _rev().alias("val"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        dsum(F.col("val"), scale=4, prec=28).alias("value")
    )
    total = scoped.agg(
        (dsum(F.col("val"), scale=4, prec=28) * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@query(
    "q20_potential_promotion",
    sql="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 45)
    """,
    note="TPC-H Q20 shape (availqty threshold adapted to shipped quantity "
    "per supplier-part). Inner agg then left-semi join; filtered part side AQE-planned "
    "into the inner join, the semi probe side is tiny",
)
def q20_potential_promotion(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey")
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q21_suppliers_kept_waiting",
    sql="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
    GROUP BY s_name
    """,
    note="TPC-H Q21 shape (receipt-vs-commit lateness adapted to shipdate > "
    "orderdate + 60d). The exists/not-exists pair is decorrelated into "
    "per-order WINDOW aggregates (distinct suppliers, distinct late "
    "suppliers, via size(collect_set) which skips NULLs exactly like "
    "COUNT(DISTINCT)) — ONE l_orderkey exchange carries the joined rows "
    "once, where the groupBy+self-join form paid three exchanges plus an "
    "Expand doubling for the dual distinct",
    bench=True,
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    j = li.join(od, li.l_orderkey == od.o_orderkey).withColumn("is_late", late)
    w = Window.partitionBy("l_orderkey")
    culprit = (
        j.withColumn("nsupp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "nlate",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        culprit.join(supp, culprit.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
