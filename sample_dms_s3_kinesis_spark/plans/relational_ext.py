"""Extended relational surface: the remaining TPC-H query shapes the
driver's trimmed schema supports (no partsupp / commitdate / receiptdate
columns exist, so Q2/Q4/Q12/Q16/Q19-Q21 appear as adapted shapes), plus
window-function, statistical-aggregate, string/date scalar, JSON, and
sessionization coverage.  Same conventions as ``registry``: exact
decimal money math, fixed-scale rounding on both sides, deterministic
tie-breaks, identical column aliases.

All functions here are generalized-surface ops (SURVEY §2.4/§2.6/§2.8
"Catalyst built-ins" rows); each docstring notes the §2 hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.plans.registry import (
    _cents,
    _money,
    _register,
    _sum_cents,
    t,
)


@_register(
    "q04_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    "TPC-H Q4-style: EXISTS correlated semi-join + grouped count",
    "O23 (semi-join) generalized",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "q07_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(volume) AS DOUBLE), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7-style: bidirectional nation-pair volume by year",
    "joins generalized; disjunctive join predicate",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _money(
                _sum_cents(
                    _cents(F.col("l_extendedprice"))
                    * (100 - _cents(F.col("l_discount"))),
                    scale=4,
                ),
                4,
            ).alias("revenue")
        )
    )


@_register(
    "q08_market_share",
    """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n1.n_name AS nation
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE'
    ) all_nations
    GROUP BY o_year
    """,
    "TPC-H Q8-style: market share = conditional fraction of volume",
    "conditional agg (O17 gen); exact decimal sums before double division",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = _cents(F.col("l_extendedprice")) * (
        100 - _cents(F.col("l_discount"))
    )
    zero = F.lit(0).cast("long")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r["r_regionkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                _sum_cents(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    ),
                    scale=4,
                ).cast("double")
                / _sum_cents(F.col("volume"), scale=4).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@_register(
    "q09_product_profit",
    """
    SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS amount
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    "TPC-H Q9-style: part-name LIKE filter, profit by nation and year",
    "O10 LIKE generalized; multi-join",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            _money(
                _sum_cents(
                    _cents(F.col("l_extendedprice"))
                    * (100 - _cents(F.col("l_discount"))),
                    scale=4,
                ),
                4,
            ).alias("sum_profit")
        )
    )


@_register(
    "q11_supplier_value",
    """
    SELECT s_suppkey, ROUND(CAST(value AS DOUBLE), 2) AS value
    FROM (SELECT l_suppkey AS s_suppkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
          FROM lineitem GROUP BY l_suppkey) sv
    WHERE value > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.011
                   FROM lineitem)
    """,
    "TPC-H Q11-style: group value vs scalar-subquery fraction of total",
    "scalar subquery generalized; exact decimal sums",
)
def q11_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    per_supp = l.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        _sum_cents(_cents(F.col("l_extendedprice"))).alias("value")
    )
    total = l.agg(
        (
            _sum_cents(_cents(F.col("l_extendedprice"))).cast("double")
            * F.lit(0.011)
        ).alias("_thr")
    )
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_thr"))
        .select("s_suppkey", _money(F.col("value"), 2).alias("value"))
    )


@_register(
    "q13_order_count_dist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13-style: left outer join + two-level aggregation",
    "outer join generalized",
)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    "TPC-H Q14-style: promo revenue percentage (conditional / total)",
    "conditional agg; broadcast part join",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-07-01 00:00:00")))
    )
    p = t(spark, sf_dir, "part")
    volume = _cents(F.col("l_extendedprice")) * (
        100 - _cents(F.col("l_discount"))
    )
    zero = F.lit(0).cast("long")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * _sum_cents(
                    F.when(F.col("p_type") == "PROMO", volume).otherwise(zero),
                    scale=4,
                ).cast("double")
                / _sum_cents(volume, scale=4).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@_register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "TPC-H Q15-style: top supplier via MAX scalar subquery (exact decimal ties)",
    "scalar subquery; deterministic equality on exact decimals",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _sum_cents(
            _cents(F.col("l_extendedprice"))
            * (100 - _cents(F.col("l_discount"))),
            scale=4,
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        s.join(F.broadcast(revenue), s["s_suppkey"] == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max"))
        .select(
            "s_suppkey",
            "s_name",
            _money(F.col("total_revenue"), 4).alias("total_revenue"),
        )
    )


@_register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    "TPC-H Q17-style: correlated AVG subquery per part (integral doubles => exact)",
    "correlated scalar subquery",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # l_quantity holds integral values, so the double AVG is exact and
    # order-insensitive — safe on both engines.
    avg_qty = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_thr")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(avg_qty), l["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            F.round(
                _sum_cents(_cents(F.col("l_extendedprice"))).cast("double")
                / F.lit(7.0),
                4,
            ).alias("avg_yearly")
        )
    )


@_register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey
    """,
    "TPC-H Q18-style: IN-subquery with HAVING over grouped sums",
    "IN subquery; two-phase aggregation",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_sum_cents(_cents(F.col("l_quantity"))).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big).withColumnRenamed("l_orderkey", "_big_ok"),
               o["o_orderkey"] == F.col("_big_ok"), "left_semi")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(l, F.col("o_orderkey") == l["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(_money(_sum_cents(_cents(F.col("l_quantity"))), 2).alias("sum_qty"))
    )


@_register(
    "q22_idle_rich_customers",
    """
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    "TPC-H Q22-style: above-average balance + anti-join on urgent orders",
    "anti join (O23/O25 gen); scalar subquery with exact mean",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    mean = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                _sum_cents(_cents(F.col("c_acctbal"))).cast("double")
                / F.count(F.lit(1))
            ).alias("_mean")
        )
    )
    return (
        c.join(F.broadcast(mean))
        .filter(F.col("c_acctbal") > F.col("_mean"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money(_sum_cents(_cents(F.col("c_acctbal"))), 2).alias("totacctbal"),
        )
    )


# =====================================================================
# Joins beyond inner/semi: full outer, cross
# =====================================================================

@_register(
    "q_full_outer_nation_counts",
    """
    SELECT COALESCE(cn, sn) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS cn, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey AS sn, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON cn = sn
    """,
    "full outer join of per-nation customer/supplier counts",
    "outer join family (SURVEY §2.6 generalized)",
)
def q_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, F.col("cn") == F.col("sn"), "full").select(
        F.coalesce("cn", "sn").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@_register(
    "q_cross_join_region_status",
    """
    SELECT r.r_name, sc.o_orderstatus, sc.cnt
    FROM region r
    CROSS JOIN (SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
                GROUP BY o_orderstatus) sc
    """,
    "cross join of a tiny dim against an aggregate (broadcast NLJ)",
    "cross/nested-loop join family (SURVEY §2.6 generalized)",
)
def q_cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").select("r_name")
    sc = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return r.crossJoin(F.broadcast(sc)).select("r_name", "o_orderstatus", "cnt")


# =====================================================================
# Window functions: lag/lead, rank family, first/last
# =====================================================================

@_register(
    "q_window_lag_lead",
    """
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER w, 4) AS delta_prev,
           LEAD(event_id) OVER w AS next_event
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "lag/lead over per-user event sequences (unique tie-break)",
    "window functions (SURVEY §2.7 generalized)",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@_register(
    "q_window_rank_family",
    """
    SELECT c_custkey, c_nationkey,
           NTILE(4)     OVER w AS quartile,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM customer
    WHERE c_nationkey < 5
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    "rank-family window functions with deterministic ordering",
    "window functions (SURVEY §2.7 generalized)",
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@_register(
    "q_window_first_last",
    """
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER w AS last_event,
           COUNT(*)              OVER w AS n_events
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "first/last value over an unbounded frame, collapsed per user",
    "window frames (SURVEY §2.7 generalized)",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.count(F.lit(1)).over(w).alias("n_events"),
    ).distinct()


# =====================================================================
# Statistical / percentile aggregates
# =====================================================================

@_register(
    "q_percentile_agg",
    """
    SELECT c_mktsegment,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY c_acctbal), 4) AS median_bal,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY c_acctbal), 4) AS p90_bal
    FROM customer GROUP BY c_mktsegment
    """,
    "exact interpolated percentiles per group",
    "aggregations generalized (SURVEY §2.4)",
)
def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
    )


@_register(
    "q_stats_agg",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
             AS mean_bal,
           ROUND(SQRT((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                                  * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       - POW(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
                           / COUNT(*))
                      / (COUNT(*) - 1)), 4) AS sd_bal
    FROM customer GROUP BY c_mktsegment
    """,
    "mean/stddev from exact decimal moments (order-insensitive)",
    "aggregations generalized (SURVEY §2.4); fp-determinism pattern",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    bal = _cents(F.col("c_acctbal"))
    n = F.count(F.lit(1))
    sum_x = _sum_cents(bal).cast("double")
    sum_x2 = _sum_cents(bal * bal, scale=4).cast("double")
    return c.groupBy("c_mktsegment").agg(
        n.alias("n"),
        F.round(sum_x / n, 4).alias("mean_bal"),
        F.round(F.sqrt((sum_x2 - F.pow(sum_x, 2) / n) / (n - F.lit(1))), 4).alias(
            "sd_bal"
        ),
    )


# =====================================================================
# Grouping sets / pivot
# =====================================================================

@_register(
    "q_grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "explicit GROUPING SETS aggregation",
    "grouping sets (SURVEY §2.4 generalized)",
)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@_register(
    "q_pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot order status into per-priority count columns",
    "pivot (SURVEY §2.4 generalized; O17 conditional-count shape)",
)
def q_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# =====================================================================
# Scalar function coverage: strings, dates
# =====================================================================

@_register(
    "q_string_functions",
    """
    SELECT p_partkey,
           UPPER(p_name) AS upper_name,
           SUBSTRING(p_name, 1, 5) AS prefix5,
           REPLACE(p_name, ' ', '_') AS snake_name,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REVERSE(p_brand) AS rev_brand,
           LPAD(CAST(p_size AS VARCHAR), 3, '0') AS padded_size,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word
    FROM part WHERE p_partkey <= 500
    """,
    "string scalar surface: case, substring, replace, pad, split, regexp",
    "scalar functions (SURVEY §2.8)",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.length("p_name").cast("int").alias("name_len"),
        F.reverse("p_brand").alias("rev_brand"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("padded_size"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@_register(
    "q_date_functions",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY yr, qtr, mo
    """,
    "date-part extraction + grouped aggregation",
    "scalar functions (SURVEY §2.8: date parse/compare family)",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money(_sum_cents(_cents(F.col("o_totalprice"))), 2).alias("total_price"),
    )


# =====================================================================
# Event-stream analytics: tumbling windows, sessionization
# =====================================================================

@_register(
    "q_tumbling_window_events",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY hour_start, event_type
    """,
    "tumbling 1-hour windowed aggregation (batch twin of the streaming op)",
    "SURVEY §2.7 map-level equivalent (window()); O17 shape",
)
def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # window() is the streaming-native form; date_trunc is its batch
    # equivalent and keeps the oracle comparable.
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _money(F.sum(F.col("value").cast("decimal(18,4)")), 4).alias("sum_value"),
    )


@_register(
    "q_sessionize_events",
    """
    WITH marks AS (
      SELECT user_id, event_id,
             CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess,
             ts
      FROM events WHERE user_id < 50),
    sess AS (
      SELECT user_id, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marks)
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    "30-min-gap sessionization via window cumsum (session_window() twin)",
    "SURVEY §2.7 map-level equivalent (session_window())",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    marks = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us > 1_800_000_000, 1)
        .when(gap_us.isNull(), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marks.select(
        "user_id", "event_id", F.sum("new_sess").over(wsum).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# =====================================================================
# Composed near-dup scale pipeline
# =====================================================================

@_register(
    "q_lsh_jaccard_verified",
    None,
    "MinHash-LSH candidates + exact n-gram Jaccard verification "
    "(the subquadratic 100 TB near-dup pipeline; every returned pair "
    "has true jaccard >= threshold)",
    "dedup: MinHash+LSH -> exact verify composition",
)
def q_lsh_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import dedup

    d = t(spark, sf_dir, "documents")
    return dedup.lsh_verified_jaccard_pairs(d, threshold=0.5)


# =====================================================================
# Streaming operators in batch mode (unified API): window(),
# session_window() — same functions streamed in streaming/windows.py
# =====================================================================

@_register(
    "q_window_agg_events",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           STRFTIME(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY window_start, window_end, event_type
    """,
    "window() tumbling aggregation run in batch mode (streaming twin: "
    "streaming.windows.tumbling_counts)",
    "SURVEY §2.7 window() — unified batch/stream API",
)
def q_window_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.streaming.windows import tumbling_counts

    ev = t(spark, sf_dir, "events")
    out = tumbling_counts(ev, watermark="10 years")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n",
        # sum_value is an exact DECIMAL(18,4) aggregate; render as
        # double to match the oracle's pandas dtype (see _money).
        F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"),
    )


@_register(
    "q_session_window_events",
    """
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id < 50),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks)
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    "session_window() aggregation run in batch mode (streaming twin: "
    "streaming.windows.session_counts)",
    "SURVEY §2.7 session_window() — unified batch/stream API",
)
def q_session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.streaming.windows import session_counts

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = session_counts(ev, watermark="10 years")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@_register(
    "q_multimodal_audio_features",
    None,
    "audio decode/resample/window featurization plumbing over binary "
    "assets via mapInPandas (decode kernel stubbed; batch shape real)",
    "north-star: multimodal columns (audio)",
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=64)
    out = multimodal.extract_audio_features(
        assets.filter(F.col("media_type") == "audio")
    )
    # feature is array<float>; the driver's canonicalizer cannot hash
    # array cells, so serialize it for the registered surface.
    return out.withColumn("feature", F.to_json("feature"))


# =====================================================================
# Skew-mitigation operators (exact; oracle-checked against the naive
# formulations)
# =====================================================================

@_register(
    "q_two_phase_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
    "exact per-key distinct count via dedup-then-count (skew-safe twin "
    "of COUNT(DISTINCT))",
    "skew: two-phase distinct (SURVEY §2.4 generalized)",
)
def q_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import skew

    ev = t(spark, sf_dir, "events")
    return skew.two_phase_distinct_count(ev, "event_type", "user_id")


@_register(
    "q_salted_join_agg",
    """
    SELECT n.n_name, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "salted equi-join (skewed side spread over salt buckets) feeding an "
    "aggregate — result identical to the plain join",
    "skew: salted join (SURVEY §2.6 generalized)",
)
def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import skew

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = skew.salted_join(
        c.withColumnRenamed("c_nationkey", "n_nationkey"),
        n,
        "n_nationkey",
        salt=8,
        salt_source="c_custkey",
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _money(_sum_cents(_cents(F.col("c_acctbal"))), 2).alias("total_bal"),
    )


# =====================================================================
# Additional text / aggregate coverage
# =====================================================================

@_register(
    "q_text_tokens_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    "BPE-ish pretoken counting (letter/digit/punctuation runs)",
    "north-star: token counting (BPE-ish regex)",
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import bpe_ish_token_count

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))


@_register(
    "q_approx_distinct_users",
    None,
    "approx_count_distinct (HLL++) per event_type — sketch-based "
    "distinct at scale; exactness bound tested in pytest vs the exact "
    "count (no oracle: DuckDB's sketch differs)",
    "SURVEY §2.4 generalized (approx_count_distinct)",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@_register(
    "q_ann_batch_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS query_vec
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.query_vec), 6) AS cosine
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 5
    """,
    "exact top-k neighbors for a batch of query vectors (broadcast "
    "queries, per-query rank window)",
    "north-star: similarity search (batched exact baseline)",
)
def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.similarity import batch_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return batch_topk(emb, queries, k=5)


# =====================================================================
# Set operations and array aggregation
# =====================================================================

@_register(
    "q_intersect_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "INTERSECT of building-segment customers and urgent-order customers",
    "set ops (SURVEY §2.6 generalized)",
)
def q_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@_register(
    "q_except_customers",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "EXCEPT: customers with no urgent orders",
    "set ops (SURVEY §2.6 generalized)",
)
def q_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@_register(
    "q_array_agg_priorities",
    """
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), '|') AS priorities,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    "collect_set aggregation, sorted and string-joined (the driver's "
    "canonicalizer cannot hash raw array cells)",
    "array agg (SURVEY §2.4 generalized)",
)
def q_array_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q_null_handling",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_totalprice IS NULL THEN 0.0
                ELSE ROUND(o_totalprice, 2) END AS price_safe
    FROM orders WHERE o_orderkey <= 2000
    """,
    "null-handling scalar surface: coalesce / nullif / case-is-null",
    "scalar functions (SURVEY §2.8); O12 null semantics generalized",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
        F.when(F.col("o_totalprice").isNull(), F.lit(0.0))
        .otherwise(F.round("o_totalprice", 2))
        .alias("price_safe"),
    )


# =====================================================================
# Remaining TPC-H shape adaptations (trimmed schema)
# =====================================================================

@_register(
    "q02_min_cost_supplier",
    """
    SELECT s.s_name, s.s_acctbal, n.n_name, p.p_partkey, p.p_name
    FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (SELECT MAX(s2.s_acctbal)
                         FROM supplier s2
                           JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                           JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
                           JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
                         WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    GROUP BY s.s_name, s.s_acctbal, n.n_name, p.p_partkey, p.p_name
    """,
    "TPC-H Q2-style: best supplier per part via correlated MAX subquery",
    "correlated scalar subquery; multi-dim join",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).join(
        F.broadcast(europe_sup), l["l_suppkey"] == F.col("s_suppkey")
    )
    best = offers.groupBy("p_partkey").agg(F.max("s_acctbal").alias("_best"))
    return (
        offers.join(F.broadcast(best), on="p_partkey")
        .filter(F.col("s_acctbal") == F.col("_best"))
        .groupBy("s_name", "s_acctbal", "n_name", "p_partkey", "p_name")
        .agg(F.lit(1).alias("_d"))
        .drop("_d")
    )


@_register(
    "q12_status_priority",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    "TPC-H Q12-style: priority-class conditional counts per line status",
    "conditional agg over join (O17 gen)",
)
def q12_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_register(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#23' AND p.p_size IN (5, 15, 25, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16-style: distinct supplier counts with NOT-IN exclusion",
    "NOT IN subquery + distinct agg",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23") & F.col("p_size").isin(5, 15, 25, 35)
    )
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        l.join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    "TPC-H Q19-style: disjunctive cross-table predicates over a join",
    "disjunctive predicates; join filter pushdown",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        _money(
            _sum_cents(
                _cents(F.col("l_extendedprice"))
                * (100 - _cents(F.col("l_discount"))),
                scale=4,
            ),
            4,
        ).alias("revenue")
    )


@_register(
    "q20_part_suppliers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50)
    """,
    "TPC-H Q20-style: nested IN subqueries with HAVING",
    "nested IN subqueries",
)
def q20_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    heavy = (
        l.join(F.broadcast(red), on="l_partkey", how="left_semi")
        .groupBy("l_suppkey")
        .agg(_sum_cents(_cents(F.col("l_quantity"))).alias("_sq"))
        .filter(F.col("_sq") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(F.broadcast(heavy), on="s_suppkey", how="left_semi").select(
        "s_name", "s_acctbal"
    )


@_register(
    "q21_multi_supplier_orders",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
    "TPC-H Q21-style: suppliers on multi-supplier finished orders "
    "(EXISTS with inequality correlation)",
    "correlated EXISTS; self-join on fact table",
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    l1 = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l2 = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    return (
        l1.join(o, l1["l_orderkey"] == o["o_orderkey"])
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ------------------------------------------------------------------
# Deterministic split / sampling surface (training-data pipeline ops).
# The md5-bucket expression is engine-portable, so these are exact
# oracle checks, not rows-only.
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators import sampling  # noqa: E402

_B = "substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 8)"
_B42 = _B.format(seed=42)
_B7 = _B.format(seed=7)
_B13 = _B.format(seed=13)


@_register(
    "q_hash_split",
    f"""
    WITH h AS (
      SELECT CASE
        WHEN {_B42} < '{sampling._hex_threshold(0.9)}' THEN 'train'
        WHEN {_B42} < '{sampling._hex_threshold(0.95)}' THEN 'val'
        ELSE 'test' END AS split
      FROM documents)
    SELECT split, COUNT(*) AS n_docs FROM h GROUP BY split
    """,
    "deterministic md5-bucket train/val/test split (stable under "
    "re-runs, repartitioning, and corpus growth)",
    "sampling: hash split",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.hash_split(d, id_col="doc_id", seed=42)
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


@_register(
    "q_stratified_sample",
    f"""
    SELECT lang, COUNT(*) AS n_docs
    FROM documents
    WHERE {_B13} < CASE lang
        WHEN 'de' THEN '{sampling._hex_threshold(0.25)}'
        WHEN 'en' THEN '{sampling._hex_threshold(0.5)}'
        WHEN 'zh' THEN '{sampling._hex_threshold(1.0)}'
        ELSE '{sampling._hex_threshold(0.1)}' END
    GROUP BY lang
    """,
    "deterministic per-stratum downsampling (e.g. rebalance languages; "
    "keep-all and near-drop strata in one narrow filter)",
    "sampling: stratified",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        d,
        strata_col="lang",
        fractions={"de": 0.25, "en": 0.5, "zh": 1.0},
        id_col="doc_id",
        seed=13,
        default_fraction=0.1,
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@_register(
    "q_group_sample_topk",
    f"""
    WITH r AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_B7}, doc_id) AS rk
      FROM documents)
    SELECT lang, doc_id FROM r WHERE rk <= 5
    """,
    "deterministic k-per-group sample (reproducible reservoir stand-in)",
    "sampling: k per group",
)
def q_group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.group_sample_topk(d, group_col="lang", id_col="doc_id", k=5, seed=7)
    return out.select("lang", "doc_id")


@_register(
    "q_mixture_sample",
    """
    WITH c AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
               FROM documents GROUP BY lang),
    t(lang, share) AS (VALUES ('en', 0.4), ('de', 0.3), ('zh', 0.3)),
    j AS (SELECT c.lang, c.n, t.share FROM c JOIN t USING (lang)),
    b AS (SELECT MIN(n / share) AS budget FROM j),
    f AS (SELECT lang,
                 LEAST(budget * share / n, 1.0) AS frac
          FROM j CROSS JOIN b),
    thr AS (SELECT lang,
                   CASE WHEN frac >= 1.0 THEN 'g'
                        ELSE printf('%08x', CAST(FLOOR(frac * 4294967296.0) AS BIGINT))
                   END AS bound
            FROM f),
    kept AS (SELECT d.lang
             FROM documents d JOIN thr ON d.lang = thr.lang
             WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':11'), 1, 8) < thr.bound)
    SELECT lang, COUNT(*) AS n_docs FROM kept GROUP BY lang
    """,
    "mixture sampling: deterministically rebalance the corpus to a "
    "target domain mixture with maximum retention (the scarcest domain "
    "keeps everything; budget arithmetic is op-order-identical on both "
    "engines so the hash thresholds match bit-for-bit)",
    "sampling: mixture rebalance (north-star)",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.mixture_sample(
        d,
        domain_col="lang",
        target_shares={"en": 0.4, "de": 0.3, "zh": 0.3},
        id_col="doc_id",
        seed=11,
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@_register(
    "q_token_budget_sample",
    """
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             SUM(n_chars) OVER (
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 8),
                        doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM r WHERE cum <= 50000 GROUP BY lang
    """,
    "token-budget sampling: keep documents in deterministic hash order "
    "until the cumulative weight reaches the budget ('give me N tokens "
    "of this corpus, reproducibly'); two-phase bucketed cumsum plan — "
    "the oracle's single global window is the semantic spec, the Spark "
    "plan runs 256 parallel prefix-bucket windows",
    "sampling: token budget (north-star)",
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.token_budget_sample(
        d, weight_col="n_chars", budget=50_000, id_col="doc_id", seed=5
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@_register(
    "q_pack_sequences",
    """
    WITH r AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 8),
                        doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents),
    p AS (
      SELECT doc_id,
             CAST(FLOOR(CAST(cum - n_chars AS DOUBLE) / 4096) AS BIGINT) AS bin_id,
             n_chars
      FROM r)
    SELECT bin_id, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM p GROUP BY bin_id
    """,
    "sequence packing layout: concat-then-chunk bin assignment "
    "(bin = floor(start_offset / seq_len) over the deterministic hash "
    "order) — the distributed plan for GPT-style packing; per-bin doc "
    "counts and weights",
    "sampling/packing: sequence packing (north-star)",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.pack_sequences(
        d, weight_col="n_chars", seq_len=4096, id_col="doc_id", seed=5
    )
    return out.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@_register(
    "q_top_fraction_quality",
    """
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id ASC) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs, CAST(MIN(n_chars) AS BIGINT) AS min_chars
    FROM r WHERE rk <= CEIL(0.25 * cnt) GROUP BY lang
    """,
    "rank-based quality filter: keep the top 25% of documents per "
    "language by length (exact ceil(frac*n) per group, no quantile "
    "interpolation to diverge between engines)",
    "sampling/quality: top-fraction per group (north-star)",
)
def q_top_fraction_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.top_fraction_per_group(
        d, value_col="n_chars", group_col="lang", fraction=0.25, id_col="doc_id"
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
    )


@_register(
    "q_sliding_window_events",
    """
    WITH x AS (
      SELECT event_type,
             EPOCH_US(ts) - EPOCH_US(ts) % 900000000 AS ws_max
      FROM events),
    w AS (
      SELECT event_type,
             unnest(list_transform(range(0, 4), i -> ws_max - i * 900000000)) AS ws
      FROM x)
    SELECT STRFTIME(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
           STRFTIME(make_timestamp(ws + 3600000000), '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type, COUNT(*) AS n
    FROM w GROUP BY window_start, window_end, event_type
    """,
    "sliding (hopping) 1h/15min windowed counts run in batch mode "
    "(streaming twin: streaming.windows.sliding_counts; each event "
    "lands in window/slide = 4 overlapping windows)",
    "SURVEY §2.7 window(slide) — unified batch/stream API",
)
def q_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.streaming.windows import sliding_counts

    ev = t(spark, sf_dir, "events")
    out = sliding_counts(
        ev, window="1 hour", slide="15 minutes", watermark="10 years"
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n",
    )


# ------------------------------------------------------------------
# Text repetition / normalization surface (quality filtering ops).
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators import text as _text  # noqa: E402


@_register(
    "q_text_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    g AS (
      SELECT doc_id, t,
             list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS grams
      FROM toks)
    SELECT doc_id,
           CASE WHEN len(t) > 0
                THEN ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                ELSE 0.0 END AS dup_token_frac,
           CASE WHEN len(grams) > 0
                THEN ROUND(CAST(list_max(list_transform(grams,
                       x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE)
                     / len(grams), 6)
                ELSE 0.0 END AS top_bigram_frac
    FROM g
    """,
    "Gopher-style repetition signals: repeated-token fraction and "
    "most-frequent-bigram coverage per document",
    "text: repetition quality",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.partitioning import spread

    d = t(spark, sf_dir, "documents")
    # Materialize the bigram array in its own projection: the count
    # lambda references it many times and higher-order lambdas defeat
    # Catalyst CSE.  spread(): the quadratic bigram count is compute-
    # bound, and a single-file parquet scan would pin it to one core.
    grams = spread(d).select(
        "doc_id",
        _text.dup_token_fraction(F.col("text")).alias("dup_token_frac"),
        _text.word_bigrams(F.col("text")).alias("_grams"),
    )
    return grams.select(
        "doc_id",
        "dup_token_frac",
        _text.top_bigram_fraction(F.col("_grams")).alias("top_bigram_frac"),
    )


@_register(
    "q_text_normalize",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(regexp_replace(
               lower(text), '\p{N}+', '0', 'g'),
               '[^\p{L}\p{N} ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS norm_md5,
           CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(
               lower(text), '\p{N}+', '0', 'g'),
               '[^\p{L}\p{N} ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents
    """,
    "canonical normalized text (lowercase, digit-fold, punct→space, "
    "whitespace-collapse), exported as md5+length",
    "text: normalization / scrubbing",
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    norm = _text.normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def _oracle_script_langid() -> str:
    """DuckDB replay of detect_script + lang_id_unicode over the
    multilingual doc_id fixture (RE2 script classes; the marker-word
    fallback CASE mirrors registry._oracle_langid)."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        LANG_MARKERS,
        LANG_ORDER,
        SCRIPT_CLASSES,
        SCRIPT_LANG,
    )

    cnt_cols = ", ".join(
        f"length(regexp_replace(text, '[^{re2}]', '', 'g')) AS c{i}"
        for i, (_n, _j, re2) in enumerate(SCRIPT_CLASSES)
    )
    names = [n for n, _j, _r in SCRIPT_CLASSES]
    total = " + ".join(f"c{i}" for i in range(len(names)))
    script_case = f"'{names[-1]}'"
    for i in reversed(range(len(names) - 1)):
        cond = " AND ".join(
            f"c{i} >= c{j}" for j in range(i + 1, len(names))
        )
        script_case = (
            f"CASE WHEN {cond} THEN '{names[i]}' ELSE {script_case} END"
        )
    marker = {
        lang: "len(list_filter(tkl, x -> x IN ("
        + ", ".join(repr(w) for w in LANG_MARKERS[lang])
        + ")))"
        for lang in LANG_ORDER
    }
    marker_case = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1 :]
        cond = " AND ".join(
            f"{marker[lang]} >= {marker[o]}" for o in later
        )
        marker_case = (
            f"CASE WHEN {cond} THEN '{lang}' ELSE {marker_case} END"
        )
    kana_idx = names.index("kana")
    mapped = " ".join(
        f"WHEN script0 = '{s}' THEN '{l}'"
        for s, l in SCRIPT_LANG.items()
    )
    fixture = """
      SELECT doc_id,
             CASE CAST(doc_id % 12 AS INTEGER)
               WHEN 0 THEN 'the quick fox and the dog of '
                           || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN 'le chat et la maison est '
                           || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '这是一个测试文档' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '日本語のテキスト' || CAST(doc_id AS VARCHAR)
               WHEN 4 THEN '한국어 텍스트입니다 ' || CAST(doc_id AS VARCHAR)
               WHEN 5 THEN 'Привет мир это тест '
                           || CAST(doc_id AS VARCHAR)
               WHEN 6 THEN 'النص العربي هنا ' || CAST(doc_id AS VARCHAR)
               WHEN 7 THEN 'Ελληνικό κείμενο εδώ '
                           || CAST(doc_id AS VARCHAR)
               WHEN 8 THEN 'यह हिंदी पाठ है ' || CAST(doc_id AS VARCHAR)
               WHEN 9 THEN 'ข้อความภาษาไทย' || CAST(doc_id AS VARCHAR)
               WHEN 10 THEN CAST(doc_id AS VARCHAR) || ' !!! 123'
               ELSE 'der hund und das ist '
                    || CAST(doc_id AS VARCHAR)
             END AS text
      FROM documents"""
    return f"""
    WITH s AS ({fixture}),
    c AS (SELECT doc_id, text, {cnt_cols},
                 string_split_regex(trim(lower(text)), '\\s+') AS tkl
          FROM s),
    d AS (SELECT *, ({total}) AS total, {script_case} AS script0
          FROM c)
    SELECT doc_id,
           CASE WHEN total = 0 THEN 'unknown' ELSE script0 END
             AS script,
           CASE WHEN total > 0 AND c{kana_idx} > 0
                     AND script0 IN ('han', 'kana') THEN 'ja'
                WHEN total > 0 AND script0 <> 'latin'
                  THEN CASE {mapped} ELSE NULL END
                ELSE {marker_case} END AS lang
    FROM d
    """


@_register(
    "q_script_langid",
    _oracle_script_langid(),
    "script-first language ID over a 12-variant multilingual fixture "
    "(English/French/German marker rows, Han, kana-mixed Japanese, "
    "Hangul, Cyrillic, Arabic, Greek, Devanagari, Thai, and a "
    "letterless row): detect_script (per-script letter counts, "
    "deterministic argmax, 'unknown' when letterless) + "
    "lang_id_unicode (script->language map with the kana-in-CJK->ja "
    "rule; Latin and unknown fall back to the marker-word heuristic). "
    " The upgrade that stops every non-Latin document classifying as "
    "'en'; the oracle regenerates counts, argmax, the kana rule, and "
    "the marker fallback in RE2/DuckDB, so any divergence in the "
    "script classes or tie order hash-mismatches",
    "text: script detection + script-first language ID",
)
def q_script_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id")
    sid = (F.col("doc_id") % 12).cast("int")
    ds = F.col("doc_id").cast("string")
    txt = (
        F.when(sid == 0, F.concat(F.lit("the quick fox and the dog of "), ds))
        .when(sid == 1, F.concat(F.lit("le chat et la maison est "), ds))
        .when(sid == 2, F.concat(F.lit("这是一个测试文档"), ds))
        .when(sid == 3, F.concat(F.lit("日本語のテキスト"), ds))
        .when(sid == 4, F.concat(F.lit("한국어 텍스트입니다 "), ds))
        .when(sid == 5, F.concat(F.lit("Привет мир это тест "), ds))
        .when(sid == 6, F.concat(F.lit("النص العربي هنا "), ds))
        .when(sid == 7, F.concat(F.lit("Ελληνικό κείμενο εδώ "), ds))
        .when(sid == 8, F.concat(F.lit("यह हिंदी पाठ है "), ds))
        .when(sid == 9, F.concat(F.lit("ข้อความภาษาไทย"), ds))
        .when(sid == 10, F.concat(ds, F.lit(" !!! 123")))
        .otherwise(F.concat(F.lit("der hund und das ist "), ds))
    )
    fix = d.select("doc_id", txt.alias("text"))
    return fix.select(
        "doc_id",
        _text.detect_script(F.col("text")).alias("script"),
        _text.lang_id_unicode(F.col("text")).alias("lang"),
    )


@_register(
    "q_text_normalize_unicode",
    r"""
    WITH s AS (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INTEGER)
               WHEN 0 THEN '文档' || CAST(doc_id AS VARCHAR)
                           || '号：内容测试！'
               WHEN 1 THEN 'テスト' || CAST(doc_id AS VARCHAR) || 'です。'
               WHEN 2 THEN 'Документ ' || CAST(doc_id AS VARCHAR)
                           || ' — тест!'
               WHEN 3 THEN 'Café №' || CAST(doc_id AS VARCHAR)
                           || ' très bien, voilà.'
               ELSE 'Doc #' || CAST(doc_id AS VARCHAR) || ', plain ASCII.'
             END AS text,
             CASE CAST(doc_id % 5 AS INTEGER)
               WHEN 0 THEN 'han' WHEN 1 THEN 'kana'
               WHEN 2 THEN 'cyrillic' WHEN 3 THEN 'latin_ext'
               ELSE 'ascii' END AS script
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
      FROM s),
    seg AS (
      SELECT doc_id,
             SUM(CASE WHEN regexp_matches(tk,
                   '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}\p{Thai}\p{Lao}\p{Khmer}\p{Myanmar}]')
                 THEN len(list_distinct(list_transform(
                        range(1, greatest(length(tk) - 2, 1) + 1),
                        i -> substr(tk, CAST(i AS INTEGER), 3))))
                 ELSE 1 END) AS n_seg_tokens
      FROM tok GROUP BY doc_id)
    SELECT s.doc_id, s.script,
           trim(regexp_replace(regexp_replace(regexp_replace(lower(s.text),
               '\p{N}+', '0', 'g'), '[^\p{L}\p{N} ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm,
           CAST(seg.n_seg_tokens AS BIGINT) AS n_seg_tokens
    FROM s JOIN seg USING (doc_id)
    """,
    "Unicode text layer over a deterministic multilingual fixture "
    "(Han / kana / Cyrillic / accented-Latin / ASCII rows synthesized "
    "from doc_id): normalize_text with \\p{L}\\p{N} keep-classes (the "
    "norm STRING itself is compared, so Java-regex and RE2 must agree "
    "byte-for-byte on non-Latin text) and segment_tokens' character-"
    "n-gram fallback for space-free scripts (per-doc segment-token "
    "count; a CJK clause token expands to its distinct char 3-grams "
    "instead of collapsing to one opaque token).  Guards the r14 fix "
    "for the English-only normalizer that collapsed every non-Latin "
    "document into a single dup cluster",
    "text: Unicode normalization + space-free-script segmentation",
)
def q_text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id")
    sid = (F.col("doc_id") % 5).cast("int")
    ds = F.col("doc_id").cast("string")
    txt = (
        F.when(sid == 0, F.concat(F.lit("文档"), ds, F.lit("号：内容测试！")))
        .when(sid == 1, F.concat(F.lit("テスト"), ds, F.lit("です。")))
        .when(sid == 2, F.concat(F.lit("Документ "), ds, F.lit(" — тест!")))
        .when(sid == 3, F.concat(F.lit("Café №"), ds, F.lit(" très bien, voilà.")))
        .otherwise(F.concat(F.lit("Doc #"), ds, F.lit(", plain ASCII.")))
    )
    script = (
        F.when(sid == 0, F.lit("han"))
        .when(sid == 1, F.lit("kana"))
        .when(sid == 2, F.lit("cyrillic"))
        .when(sid == 3, F.lit("latin_ext"))
        .otherwise(F.lit("ascii"))
    )
    fix = d.select("doc_id", script.alias("script"), txt.alias("text"))
    return fix.select(
        "doc_id",
        "script",
        _text.normalize_text(F.col("text")).alias("norm"),
        F.size(_text.segment_tokens(F.col("text")))
        .cast("long")
        .alias("n_seg_tokens"),
    )


# ------------------------------------------------------------------
# No-equi-key interval join (binned range join).
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators.intervals import binned_range_join  # noqa: E402


@_register(
    "q_binned_range_join",
    """
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 20) p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
    "interval join with NO equality key: clicks from any user falling "
    "in each purchase's following hour — binned equi-join plan instead "
    "of Spark's broadcast-nested-loop",
    "custom operator (binned range join)",
)
def q_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    intervals = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 20)
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("w_start"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(hour_us)).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"),
    )
    joined = binned_range_join(
        clicks,
        intervals,
        point_col="c_us",
        start_col="w_start",
        end_col="w_end",
        bin_width=hour_us,
    )
    return joined.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@_register(
    "q_text_tfidf_topk",
    r"""
    WITH terms AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN dfreq df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored)
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    """,
    "top-3 TF-IDF terms per document (distributed doc-frequency join, "
    "no driver-side vocabulary)",
    "text: TF-IDF",
)
def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return _text.tfidf_topk(d, k=3)


# ------------------------------------------------------------------
# Vector utility surface (embedding hygiene ops).
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators import similarity as _sim  # noqa: E402


@_register(
    "q_embedding_normalize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v,
                 sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
          FROM e),
    u AS (SELECT vec_id,
                 CASE WHEN nrm > 0 THEN list_transform(v, x -> ROUND(x / nrm, 6))
                      ELSE v END AS unit_vec
          FROM n)
    SELECT vec_id,
           CAST(unnest(range(0, len(unit_vec))) AS BIGINT) AS dim,
           unnest(unit_vec) AS u
    FROM u
    """,
    "L2-normalize the embedding column (unit vectors; zero vectors "
    "pass through) — per-row fold, no shuffle; exploded to scalar "
    "(vec_id, dim, u) rows because the driver cannot hash array cells",
    "similarity: vector normalization",
)
def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        emb.select("vec_id", _sim.l2_normalize(v, scale=6).alias("unit_vec"))
        .select("vec_id", F.posexplode("unit_vec").alias("dim", "u"))
        .select("vec_id", F.col("dim").cast("long").alias("dim"), "u")
    )


@_register(
    "q_embedding_centroids",
    """
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    x AS (SELECT label, unnest(v) AS val, unnest(range(0, len(v))) AS dim FROM e)
    SELECT label, dim, ROUND(AVG(val), 6) AS c
    FROM x GROUP BY label, dim
    """,
    "per-label centroid vectors (coarse-quantizer build): one wide "
    "64-slot AVG aggregate, no explode shuffle",
    "similarity: centroid build",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cent = _sim.label_centroids(emb, dim=64)
    return cent.select(
        "label", F.posexplode("centroid").alias("dim", "c")
    ).select("label", F.col("dim").cast("long").alias("dim"), F.round("c", 6).alias("c"))


# ------------------------------------------------------------------
# Flagship composition: the end-to-end curation pipeline a training-
# data run executes — quality filter → exact dedup on normalized text
# → deterministic split — as ONE declarative plan Catalyst optimizes
# globally (filter pushdown through the dedup join, partial aggs).
# ------------------------------------------------------------------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower(text), "
    r"'\p{N}+', '0', 'g'), '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))"
)


@_register(
    "q_curation_pipeline",
    rf"""
    WITH q AS (
      SELECT doc_id, lang, md5({_NORM_SQL}) AS h,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    f AS (SELECT * FROM q WHERE n_tokens >= 5),
    surv AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY h),
    kept AS (SELECT f.doc_id, f.lang FROM f JOIN surv USING (doc_id)),
    tk AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM tk WHERE len(t) >= 3),
    bgr AS (SELECT DISTINCT gram FROM g WHERE doc_id % 41 = 0),
    contam AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bgr USING (gram)
      WHERE g.doc_id % 41 <> 0),
    clean AS (
      SELECT doc_id, lang FROM kept
      WHERE doc_id % 41 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contam)),
    s AS (
      SELECT lang, CASE
        WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)
             < '{sampling._hex_threshold(0.9)}' THEN 'train'
        WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)
             < '{sampling._hex_threshold(0.95)}' THEN 'val'
        ELSE 'test' END AS split
      FROM clean)
    SELECT split, lang, COUNT(*) AS n_docs
    FROM s GROUP BY split, lang
    """,
    "end-to-end curation: quality filter → exact dedup on normalized "
    "text (min-id survivor) → benchmark decontamination (held-out "
    "doc_id%41 slice excluded, 3-gram-overlap docs dropped) → "
    "deterministic train/val/test split → per-(split, lang) counts",
    "flagship composition (north-star pipeline)",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import curation as _cur

    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "text",
        F.md5(_text.normalize_text(F.col("text"))).alias("_h"),
        _text.token_count(F.col("text")).alias("_nt"),
    )
    f = base.filter(F.col("_nt") >= 5)
    surv = f.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    kept = f.join(surv.select("doc_id"), "doc_id", "left_semi")
    # Decontaminate: the held-out benchmark slice leaves the training
    # corpus entirely, and any remaining doc sharing a word 3-gram
    # with it is dropped.  Contamination depends only on text, so the
    # overlap is computed from the RAW scan (one cheap pass) and
    # anti-joined against the dedup pipeline — running decontaminate()
    # over `kept` directly would recompute the groupBy+semi-join
    # pipeline for both the gram side and the anti-join side.
    bench = d.filter(F.col("doc_id") % 41 == 0)
    hits = _cur.ngram_overlap(
        d.filter(F.col("doc_id") % 41 != 0), bench, n=3, broadcast=True
    ).select("doc_id")
    clean = kept.filter(F.col("doc_id") % 41 != 0).join(
        hits, "doc_id", "left_anti"
    )
    split = sampling.hash_split(clean, id_col="doc_id", seed=42)
    return split.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


@_register(
    "q_winnowed_fingerprints",
    None,
    "winnowing (MOSS) substring fingerprint density per document "
    "(xxhash64 — soundness pytest-checked, no SQL oracle)",
    "text: winnowing fingerprints",
)
def q_winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.partitioning import spread

    d = t(spark, sf_dir, "documents")
    return spread(d).select(
        "doc_id",
        F.size(
            _text.winnowed_fingerprints(F.col("text"), shingle=8, window=4)
        ).alias("n_fingerprints"),
    )


# ------------------------------------------------------------------
# SCD2 (type-2) history — the dimension-history extension of the
# type-1 latest-wins CDC merge (O24).
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.apply import scd2_history  # noqa: E402


@_register(
    "q_scd2_history",
    """
    WITH c AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
      FROM events
      WHERE user_id < 40 AND event_type IN ('purchase', 'error')),
    h AS (
      SELECT user_id, event_id, ts, value, op,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ts
      FROM c)
    SELECT user_id, event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           ROUND(value, 6) AS value,
           STRFTIME(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to_str,
           (valid_to_ts IS NULL) AS is_current
    FROM h WHERE op <> 'delete'
    """,
    "type-2 dimension history from a change stream: versions with "
    "validity intervals; deletes close intervals and emit nothing",
    "O24 extension (SCD2 history)",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    c = ev.filter(
        (F.col("user_id") < 40) & F.col("event_type").isin("purchase", "error")
    ).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    out = scd2_history(c, key_cols=["user_id"], order_cols=["ts", "event_id"])
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.round("value", 6).alias("value"),
        F.date_format("valid_to_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to_str"),
        "is_current",
    )


# ------------------------------------------------------------------
# Corpus-curation surface (operators.curation / text PII): benchmark
# decontamination, cross-doc duplicated n-grams, unigram-LM scoring,
# PII redaction.  North-star training-data ops, exactly oracle-checked.
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators import curation as _curation  # noqa: E402


@_register(
    "q_decontaminate",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM toks WHERE len(t) >= 3),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 41 = 0)
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 41 <> 0
    GROUP BY g.doc_id
    """,
    "benchmark decontamination: corpus docs sharing any distinct word "
    "n-gram with the held-out benchmark slice (GPT-3 appendix-C-style "
    "overlap check; n=3 here so the synthetic corpus shows signal — "
    "production would use 8-13); broadcast benchmark gram digests",
    "curation: decontamination",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0)
    corpus = d.filter(F.col("doc_id") % 41 != 0)
    return _curation.ngram_overlap(corpus, bench, n=3)


@_register(
    "q_dup_ngram_stats",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                    t[i+3] || ' ' || t[i+4]))) AS gram
      FROM toks WHERE len(t) >= 5),
    df AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY gram)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           ROUND(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
    FROM g JOIN df USING (gram)
    GROUP BY doc_id
    """,
    "RefinedWeb-style duplicated-content signal: per doc, count and "
    "fraction of its distinct 5-grams appearing in >=2 documents "
    "(digest-shuffled doc-frequency join)",
    "curation: cross-doc duplicated n-grams",
)
def q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return _curation.dup_ngram_stats(d, n=5)


@_register(
    "q_unigram_lm_score",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS tok
      FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-SUM(log2(CAST(c AS DOUBLE) / n)) / COUNT(*), 6)
             AS cross_entropy
    FROM toks JOIN cnt USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    "perplexity-filter stand-in: per-doc cross-entropy under a "
    "corpus-trained unigram LM (AQE-broadcast vocabulary join)",
    "curation: unigram LM quality score",
)
def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return _curation.unigram_lm_stats(d)


@_register(
    "q_redact_pii",
    r"""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUMBER>', 'g') AS redacted,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_hits
    FROM events
    """,
    "PII scrubbing: regexp redaction with match counts (number kind "
    "over events.props; email/ipv4/phone kinds pytest-checked vs "
    "Python re on synthetic text)",
    "curation: PII redaction",
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import pii_count, redact_pii

    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        redact_pii(F.col("props"), kinds=("number",)).alias("redacted"),
        pii_count(F.col("props"), kinds=("number",)).alias("n_hits"),
    )


_SHARD_DIG = "substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)"


@_register(
    "q_assign_shards",
    f"""
    WITH d AS (
      SELECT doc_id, {_SHARD_DIG} AS dig FROM documents),
    s AS (
      SELECT doc_id, dig,
             CAST(((instr('0123456789abcdef', dig[1]) - 1) * 256
                 + (instr('0123456789abcdef', dig[2]) - 1) * 16
                 + (instr('0123456789abcdef', dig[3]) - 1)) % 8
               AS BIGINT) AS shard
      FROM d)
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY dig, doc_id) AS BIGINT) AS pos
    FROM s
    """,
    "deterministic training-shard assignment: digest-mod shard id plus "
    "reproducible within-shard position (replayable data recipe; one "
    "sort task per shard = the shard-file write shape)",
    "sampling: shard assignment / training order",
)
def q_assign_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.sampling import assign_shards

    d = t(spark, sf_dir, "documents")
    return assign_shards(d, num_shards=8, seed=0).select("doc_id", "shard", "pos")


@_register(
    "q_dedup_incremental",
    """
    WITH new_b AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
    old_b AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
    fresh AS (
      SELECT n.doc_id, n.h FROM new_b n
      WHERE n.h NOT IN (SELECT h FROM old_b))
    SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY h
    """,
    "incremental exact dedup: admit only new-batch docs whose content "
    "digest is absent from the existing corpus, then min-id survivor "
    "within the batch (the every-crawl ingestion gate)",
    "dedup: incremental cross-corpus",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import dedup_against

    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    existing = d.filter(F.col("doc_id") % 2 == 0)
    return dedup_against(new, existing)


# =====================================================================
# round-4 additions: canonical dedup, quality scoring, composition
# =====================================================================

@_register(
    "q_dedup_canonical",
    """
    WITH pr AS (
      SELECT doc_id, text,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 0
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 1
                  ELSE 2 END AS prio
      FROM documents),
    g AS (
      SELECT doc_id, prio,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY prio, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY text) AS gs,
             MIN(prio) OVER (PARTITION BY text) AS mp
      FROM pr)
    SELECT doc_id, CAST(gs AS BIGINT) AS group_size,
           CAST(mp AS BIGINT) AS src_priority
    FROM g WHERE rn = 1
    """,
    "exact dedup with priority-based survivor selection (prefer curated "
    "sources over crawl copies, id tie-break) via min_by in one digest "
    "aggregate",
    "dedup: canonical survivor selection",
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import dedup_canonical

    d = t(spark, sf_dir, "documents")
    tier1 = [f"src{i}" for i in range(5)]
    tier2 = [f"src{i}" for i in range(5, 10)]
    prio = (
        F.when(F.col("source").isin(tier1), F.lit(0))
        .when(F.col("source").isin(tier2), F.lit(1))
        .otherwise(F.lit(2))
    )
    return dedup_canonical(d, prio)


@_register(
    "q_quality_score_filter",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tkl
      FROM documents),
    s AS (
      SELECT doc_id,
             CASE WHEN len(tkl) > 0 THEN ROUND(
               0.4 * LEAST(CAST(len(tkl) AS DOUBLE) / 64, 1.0)
             + 0.3 * LEAST(5.0 * CAST(len(list_filter(tkl, x -> x IN
                 ('the','a','an','of','and','to','in','is','it','for')))
                 AS DOUBLE) / len(tkl), 1.0)
             + 0.3 * CAST(len(list_distinct(tkl)) AS DOUBLE) / len(tkl),
             6) ELSE 0.0 END AS quality_score
      FROM toks)
    SELECT doc_id, quality_score,
           CAST(quality_score >= 0.5 AS INT) AS keep
    FROM s
    """,
    "fixed-weight composite quality score (length, stopword, "
    "distinct-token components) + keep decision — the linear stand-in "
    "for a learned quality classifier",
    "text: quality filtering",
)
def q_quality_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import quality_score

    return quality_score(t(spark, sf_dir, "documents"))


@_register(
    "q_corpus_composition",
    """
    WITH g AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             SUM(len(string_split_regex(trim(text), '\\s+'))) AS n_tokens
      FROM documents GROUP BY source, lang)
    SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
             AS token_share
    FROM g
    """,
    "corpus composition: docs, tokens, token share per (source, lang) — "
    "the pre-sampling mixing report",
    "sampling: corpus composition",
)
def q_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.sampling import corpus_composition

    return corpus_composition(t(spark, sf_dir, "documents"))


@_register(
    "q_dup_span_coverage",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tkl
      FROM documents),
    base AS (
      SELECT doc_id, tkl, len(tkl) AS nt FROM toks WHERE len(tkl) >= 5),
    pg AS (
      SELECT doc_id, nt, i - 1 AS s, i + 3 AS e,
             array_to_string(tkl[i:i+4], ' ') AS g
      FROM base, UNNEST(range(1, nt - 3)) AS t(i)),
    dupg AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM pg)
      GROUP BY g HAVING COUNT(*) > 1),
    spans AS (
      SELECT p.doc_id, p.nt, p.s, p.e FROM pg p JOIN dupg d USING (g)),
    sw AS (
      SELECT doc_id, nt, s, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      FROM spans),
    adds AS (
      SELECT doc_id, nt,
             GREATEST(e - GREATEST(s - 1, COALESCE(pe, -1)), 0) AS a
      FROM sw)
    SELECT doc_id, CAST(MAX(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(a) AS BIGINT) AS covered_tokens,
           ROUND(CAST(SUM(a) AS DOUBLE) / MAX(nt), 6) AS span_frac
    FROM adds GROUP BY doc_id
    """,
    "duplicated-SPAN coverage: per doc, token positions covered by any "
    "cross-document duplicated n-gram window (interval union via "
    "sweep-line window, no self-join) — the RefinedWeb duplicated-text "
    "footprint",
    "curation: duplicated-span coverage",
)
def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.curation import dup_span_coverage

    return dup_span_coverage(t(spark, sf_dir, "documents"), n=5)


@_register(
    "q_vocab_topk",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    counts AS (
      SELECT lang, token, COUNT(*) AS n_occurrences
      FROM tok GROUP BY lang, token),
    ranked AS (
      SELECT lang, token, n_occurrences,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY n_occurrences DESC, token ASC) AS rank
      FROM counts)
    SELECT lang, CAST(rank AS INT) AS rank, token,
           CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM ranked WHERE rank <= 20
    """,
    "top-20 most frequent tokens per language (heavy-hitter vocabulary "
    "build preceding tokenizer training); partial-agg shuffle, rank "
    "window over the O(vocab) aggregate only",
    "text: vocabulary build",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import vocab_topk

    return vocab_topk(t(spark, sf_dir, "documents"), k=20)


@_register(
    "q_embedding_quantize",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dims AS (
      SELECT i FROM UNNEST(range(1, 1 + len((SELECT e FROM v LIMIT 1)))) AS t(i)),
    params AS (
      SELECT i, MIN(e[i]) AS mn, MAX(e[i]) AS mx
      FROM v, dims GROUP BY i),
    q AS (
      SELECT v.vec_id, p.i,
             CASE WHEN p.mx > p.mn
                  THEN CAST(LEAST(GREATEST(
                         ROUND((v.e[p.i] - p.mn) / (p.mx - p.mn) * 255),
                         0), 255) AS INT) - 128
                  ELSE 0 END AS qc
      FROM v, params p)
    SELECT vec_id,
           to_json(list(qc ORDER BY i)) AS qvec
    FROM q GROUP BY vec_id
    """,
    "scalar int8 quantization of the embedding corpus (per-dimension "
    "min/max calibration in one wide aggregate; 4-8x storage for "
    "IVF+SQ indexes); qvec serialized to JSON for the hash gate",
    "similarity: scalar quantization",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        quantization_params,
        quantize_embeddings,
    )

    emb = t(spark, sf_dir, "embeddings")
    params = quantization_params(emb)
    out = quantize_embeddings(emb, params)
    return out.select("vec_id", F.to_json("qvec").alias("qvec"))


@_register(
    "q_length_histogram",
    """
    SELECT lang,
           CAST(len(string_split_regex(trim(text), '\\s+')) // 10 * 10 AS BIGINT)
             AS len_bucket,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang, len_bucket
    """,
    "document token-length histogram per language (width-10 buckets) — "
    "the length-distribution report behind truncation/packing choices",
    "text: length distribution",
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    bucket = (
        F.floor(token_count(F.col("text")) / F.lit(10)) * F.lit(10)
    ).cast("long")
    return d.groupBy("lang", bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@_register(
    "q_remove_dup_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tko,
             string_split_regex(trim(lower(text)), '\\s+') AS tkl
      FROM documents),
    base AS (SELECT doc_id, tko, tkl, len(tko) AS nt FROM toks),
    pg AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tkl[i:i+4], ' ') AS g
      FROM base, UNNEST(range(1, nt - 3)) AS t(i) WHERE nt >= 5),
    dupg AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM pg)
      GROUP BY g HAVING COUNT(*) > 1),
    cov AS (
      SELECT DISTINCT p.doc_id, u.p
      FROM pg p JOIN dupg d USING (g),
           UNNEST(range(p.pos, p.pos + 5)) AS u(p)),
    tp AS (
      SELECT doc_id, nt, tko[i] AS tok, i - 1 AS p
      FROM base, UNNEST(range(1, nt + 1)) AS t(i)),
    kept AS (
      SELECT tp.doc_id, tp.tok, tp.p
      FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
      WHERE cov.p IS NULL),
    rb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
             COUNT(*) AS kept
      FROM kept GROUP BY doc_id)
    SELECT b.doc_id,
           COALESCE(rb.clean_text, '') AS clean_text,
           CAST(b.nt - COALESCE(rb.kept, 0) AS BIGINT) AS n_removed
    FROM base b LEFT JOIN rb USING (doc_id)
    """,
    "rebuild documents with cross-document duplicated spans removed "
    "(RefinedWeb remediation; anti-join covered positions, ordered "
    "per-doc reassembly)",
    "curation: duplicated-span removal",
)
def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.curation import (
        remove_duplicated_spans,
    )

    return remove_duplicated_spans(t(spark, sf_dir, "documents"), n=5)


@_register(
    "q_near_dedup_against",
    None,  # est_jaccard is Spark-hash-specific; exactness via pytest
    "incremental cross-corpus near-dup admission: new batch banded "
    "against the existing corpus (never self-joined), unflagged docs "
    "admitted",
    "dedup: incremental near-dup gate",
)
def q_near_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import near_dedup_against

    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    existing = d.filter(F.col("doc_id") % 2 == 0)
    return near_dedup_against(new, existing, num_hashes=64, bands=16, threshold=0.9)


@_register(
    "q_simhash_pairs_against",
    None,  # hamming over xxhash64 fingerprints is Spark-hash-specific
    "incremental cross-corpus SimHash near-dup: new batch's 16-bit "
    "fingerprint chunks joined against the existing corpus's (never "
    "self-joined), pairs verified at hamming <= 3 — the hamming-side "
    "admission gate (pytest proves exact equality with the cross "
    "subset of the self-join operator)",
    "dedup: incremental SimHash gate",
)
def q_simhash_pairs_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import simhash_pairs_against

    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    existing = d.filter(F.col("doc_id") % 2 == 0)
    return simhash_pairs_against(new, existing, max_hamming=3)


@_register(
    "q_embedding_near_dup_against",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         n AS (SELECT * FROM e WHERE vec_id % 2 = 1),
         o AS (SELECT * FROM e WHERE vec_id % 2 = 0)
    SELECT n.vec_id AS new_id, o.vec_id AS existing_id,
           ROUND(list_cosine_similarity(n.v, o.v), 6) AS cosine
    FROM n JOIN o ON n.label = o.label
    WHERE list_cosine_similarity(n.v, o.v) >= 0.4
    """,
    "incremental cross-corpus embedding near-dup: new batch's vectors "
    "block-joined against the existing corpus (never self-paired), "
    "cosine >= threshold flagged — the embedding-side admission gate "
    "completing the minhash/simhash trio",
    "dedup: incremental embedding gate",
)
def q_embedding_near_dup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        embedding_near_dup_against,
    )

    e = t(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") % 2 == 1)
    existing = e.filter(F.col("vec_id") % 2 == 0)
    return embedding_near_dup_against(new, existing, threshold=0.4)


@_register(
    "q_nb_lang_classify",
    r"""
    WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    te AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    toks AS (
      SELECT lang AS label,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM tr),
    counts AS (SELECT label, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    totals AS (SELECT label, SUM(c) AS n FROM counts GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM counts),
    dc AS (SELECT lang AS label, COUNT(*) AS d FROM tr GROUP BY 1),
    dt AS (SELECT COUNT(*) AS t FROM tr),
    lm AS (
      SELECT dc.label,
             ln(dc.d) - ln(dt.t) AS log_prior,
             0 - ln(totals.n + vocab.v) AS log_default
      FROM dc, dt, totals, vocab WHERE dc.label = totals.label),
    tm AS (
      SELECT counts.label, counts.token,
             ln(counts.c + 1.0) - ln(totals.n + vocab.v) AS log_cond
      FROM counts, totals, vocab WHERE counts.label = totals.label),
    tt AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM te),
    seen AS (
      SELECT tt.doc_id, tm.label, SUM(tm.log_cond) AS s, COUNT(*) AS m
      FROM tt JOIN tm ON tt.token = tm.token GROUP BY 1, 2),
    nn AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n
      FROM te),
    scores AS (
      SELECT nn.doc_id, lm.label,
             lm.log_prior + COALESCE(seen.s, 0)
               + (nn.n - COALESCE(seen.m, 0)) * lm.log_default AS score
      FROM nn CROSS JOIN lm
      LEFT JOIN seen ON nn.doc_id = seen.doc_id AND lm.label = seen.label)
    SELECT doc_id, label AS predicted
    FROM (SELECT doc_id, label,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, label ASC
                 ) AS r
          FROM scores)
    WHERE r = 1
    """,
    "model-based curation: multinomial Naive Bayes token model trained "
    "on the even-id half (label = lang), argmax prediction for the "
    "odd-id half — fastText-style language/quality filtering as pure "
    "Catalyst aggregates (min top-2 margin 4e-3 at sf0.01, ten orders "
    "above cross-engine float noise, so the discrete argmax is "
    "oracle-stable)",
    "classify: Naive Bayes",
)
def q_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import classify

    d = t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    tm, lm = classify.nb_train(train, label_col="lang")
    return classify.nb_classify(test, tm, lm).select("doc_id", "predicted")


@_register(
    "q_chunk_documents",
    r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, len(toks), 48)) AS start
      FROM d)
    SELECT doc_id,
           (start // 48) AS chunk_id,
           array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text,
           LEAST(64, n - start) AS n_tokens
    FROM s
    """,
    "context-window prep: split each document into 64-token chunks "
    "with 16-token overlap (stride 48); the final chunk keeps its "
    "natural length — exact chunk strings verified cross-engine",
    "sampling: document chunking",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.sampling import chunk_documents

    return chunk_documents(
        t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@_register(
    "q_winnowing_containment",
    None,  # xxhash64 fingerprints are Spark-hash-specific
    "substring-level containment candidates: docs sharing >= 3 winnowed "
    "fingerprints, with shared counts and containment ratio "
    "(shared / min fingerprint set size) — catches quotation/boilerplate "
    "relationships Jaccard-style near-dup misses",
    "dedup: winnowing containment",
)
def q_winnowing_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        winnowing_containment_pairs,
    )

    return winnowing_containment_pairs(
        t(spark, sf_dir, "documents"), shingle=6, window=4, min_shared=3
    )


@_register(
    "q_profile_documents",
    """
    SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(doc_id) AS n_null,
           COUNT(DISTINCT doc_id) AS n_distinct,
           MIN(doc_id)::VARCHAR AS min_value,
           MAX(doc_id)::VARCHAR AS max_value
    FROM documents
    UNION ALL
    SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
           COUNT(DISTINCT text), MIN(text), MAX(text) FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
           COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
           COUNT(DISTINCT source), MIN(source), MAX(source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
           COUNT(DISTINCT n_chars), MIN(n_chars)::VARCHAR,
           MAX(n_chars)::VARCHAR FROM documents
    """,
    "per-column dataset profile (rows, nulls, distinct, min/max) in one "
    "wide aggregation pass — the data-quality report generalizing the "
    "reference's per-table replication statistics to column level",
    "profiling: table profile",
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.profiling import profile_table

    return profile_table(t(spark, sf_dir, "documents"))


@_register(
    "q_oov_rate",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents),
    counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
    vocab AS (
      SELECT token FROM (
        SELECT token,
               ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS r
        FROM counts) WHERE r <= 32)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
    "tokenizer-coverage QA: per-document out-of-vocabulary rate against "
    "the corpus top-32 token vocabulary (rank ties broken by token) — "
    "the dial for sizing a tokenizer vocabulary against a corpus",
    "text: OOV rate",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # top-K via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge of K rows), never the single-task global
    # sort an unpartitioned rank window would plan.
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("token"))
        .limit(32)
        .select("token", F.lit(True).alias("_in"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


# ------------------------------------------------ round-5 additions


@_register(
    "q_corpus_diff",
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS od FROM documents WHERE doc_id % 7 <> 0),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                      ELSE text END) AS nd
      FROM documents WHERE doc_id % 5 <> 0)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.od = n.nd THEN 'unchanged'
                ELSE 'changed' END AS change
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
    "snapshot versioning: per-id added/removed/changed/unchanged between "
    "two corpus releases via a full outer join of 16-byte text digests "
    "(the release diff a no-change-log dataset pipeline runs per crawl)",
    "versioning: corpus snapshot diff",
)
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.versioning import corpus_diff

    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


@_register(
    "q_weighted_sample",
    """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || '7'),
                                  1, 8))::UBIGINT + 0.5) / 4294967296.0,
                 1.0 / CAST(n_chars AS DOUBLE)) AS k
      FROM documents WHERE n_chars > 0
      ORDER BY k DESC, doc_id ASC LIMIT 50)
    """,
    "deterministic weighted sampling without replacement (A-Res "
    "exponential keys from the md5 hash bucket, global top-k via "
    "per-partition heaps) — inclusion probability proportional to "
    "document length",
    "sampling: weighted without replacement",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return sampling.weighted_sample(
        d, id_col="doc_id", weight_col="n_chars", k=50, seed=7
    ).select("doc_id", "lang", "n_chars")


@_register(
    "q_bigram_lm_score",
    r"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
      FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i + 1])) AS g
      FROM docs WHERE len(tk) >= 2),
    bc AS (SELECT g, COUNT(*) AS c FROM big GROUP BY g),
    ctx AS (SELECT split_part(g, ' ', 1) AS w, SUM(c) AS cc
            FROM bc GROUP BY 1),
    prob AS (
      SELECT g, log2(CAST(c AS DOUBLE) / cc) AS lp
      FROM bc JOIN ctx ON split_part(g, ' ', 1) = w)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(lp) / COUNT(*), 6) AS cross_entropy
    FROM big JOIN prob USING (g)
    GROUP BY doc_id
    """,
    "order-sensitive perplexity stand-in: per-doc cross-entropy under a "
    "corpus-trained bigram LM (context counts re-grouped from the same "
    "bigram aggregate; probability table joined once, AQE-broadcast)",
    "curation: bigram LM quality score",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return _curation.bigram_lm_stats(d)


@_register(
    "q_semantic_dedup",
    None,  # k-means cells from Spark-side xxhash64 seeds; pytest proves
    # cells=1 == brute force and survivor-set soundness
    "SemDeDup-style semantic near-dup pairs: deterministic k-means "
    "(seed pick + Lloyd refinement) then exact cosine pairs within "
    "each learned cell only — O(sum cell^2), never O(n^2)",
    "dedup: semantic (cluster-then-pair)",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.semantic_dedup_pairs(
        emb, cells=8, threshold=0.4, iters=2, broadcast=True
    )


from sample_dms_s3_kinesis_spark.operators.skew import skew_report  # noqa: E402


@_register(
    "q_skew_report",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events
               GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS t FROM c)
    SELECT user_id, n_rows, ROUND(n_rows / t, 6) AS share
    FROM c CROSS JOIN tot
    ORDER BY n_rows DESC, user_id ASC NULLS FIRST LIMIT 20
    """,
    "shuffle-skew diagnosis: top-20 heavy-hitter key values with their "
    "row share (partial-agg groupBy + per-partition top-k heaps + "
    "broadcast 1-row total; the report never concentrates the hot key)",
    "ops: shuffle-key skew report",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return skew_report(ev, "user_id", top=20)


@_register(
    "q_vocab_coverage",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS t FROM cnt),
    rk AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
      FROM cnt QUALIFY r <= 64),
    ks AS (SELECT unnest([8, 16, 32, 64]) AS vocab_size)
    SELECT vocab_size,
           CAST(SUM(c) AS BIGINT) AS covered,
           CAST(t AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(c) AS DOUBLE) / t, 6) AS coverage
    FROM rk JOIN ks ON r <= vocab_size CROSS JOIN tot
    GROUP BY vocab_size, t
    """,
    "tokenizer-sizing coverage curve: fraction of token occurrences "
    "covered by the top-K vocabulary at K in {8,16,32,64} — q_oov_rate's "
    "corpus-level dual, computed on the <=64-row ranked frame",
    "text: vocabulary coverage curve",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return _text.vocab_coverage(d, sizes=(8, 16, 32, 64))


@_register(
    "q_winsorize",
    """
    WITH b AS (
      SELECT lang,
             PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
             PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
      FROM documents GROUP BY lang)
    SELECT doc_id, lang, n_chars,
           ROUND(LEAST(GREATEST(CAST(n_chars AS DOUBLE), lo), hi), 4)
             AS n_chars_w
    FROM documents JOIN b USING (lang)
    """,
    "per-group outlier trimming: clamp document length to its "
    "language's interpolated p05/p95 (percentile aggregate + bounds "
    "join-back; no window over the corpus) before length feeds a "
    "sampler or mixture weight",
    "profiling: winsorize per group",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.profiling import winsorize

    d = t(spark, sf_dir, "documents")
    out = winsorize(d, "n_chars", group_cols=["lang"])
    return out.select(
        "doc_id", "lang", "n_chars", F.round("n_chars_w", 4).alias("n_chars_w")
    )


_MH_INDEX_CACHE: dict = {}


def _minhash_index(spark: SparkSession, sf_dir: str):
    """Build + save the corpus half's index once per (app, sf); serve
    the gate from the LOADED copy — the durable every-crawl shape
    (signatures parquet on storage; per probe only the new batch pays
    shingle+minhash computation)."""
    from sample_dms_s3_kinesis_spark.operators.dedup import MinhashIndex

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _MH_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="mh-index-")
        existing = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
        MinhashIndex.build(existing, num_hashes=128, bands=32).save(path)
        _MH_INDEX_CACHE[key] = path
    from sample_dms_s3_kinesis_spark.operators.dedup import MinhashIndex as MI

    return MI.load(spark, path)


@_register(
    "q_minhash_index_gate",
    None,  # xxhash64 signature family — pytest pins exact equality
    # with the recompute operator and the save/load roundtrip
    "persisted admission gate: near-dup matches of the odd-id half of "
    "the corpus against a SAVED MinhashIndex of the even-id half — the "
    "existing corpus's shingle+minhash pass is paid once at build, "
    "every probe pays only the new batch",
    "dedup: persisted minhash index gate",
)
def q_minhash_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    new = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return _minhash_index(spark, sf_dir).pairs_against(new, threshold=0.5)


@_register(
    "q_weighted_sample_group",
    """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':' || '7'), 1, 8))::UBIGINT
                             + 0.5) / 4294967296.0,
                            1.0 / CAST(n_chars AS DOUBLE)) DESC,
                        doc_id ASC) AS rk
      FROM documents WHERE n_chars > 0)
    WHERE rk <= 10
    """,
    "per-group weighted sampling without replacement: the k largest "
    "A-Res keys within each language (row_number window partitioned by "
    "the group — shuffle keyed on the group, nothing global)",
    "sampling: weighted per group",
)
def q_weighted_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return sampling.weighted_sample_per_group(
        d, group_cols="lang", id_col="doc_id", weight_col="n_chars",
        k=10, seed=7,
    ).select("doc_id", "lang", "n_chars")


@_register(
    "q_prefix_jaccard_pairs",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_distinct(string_split_regex(trim(lower(text)), '\s+')),
               x -> x <> '') AS tk
      FROM documents),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.tk, b.tk)) AS inter,
             len(a.tk) AS na, len(b.tk) AS nb
      FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
    FROM p
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.95
    """,
    "EXACT token-set Jaccard similarity join via prefix filtering "
    "(ppjoin family): rarity-sorted prefixes bound the candidate join "
    "to rare-token buckets, an exact intersection count verifies — "
    "every qualifying pair, no LSH recall loss (the oracle is the "
    "brute-force all-pairs join)",
    "dedup: prefix-filter exact Jaccard join",
)
def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import prefix_jaccard_pairs

    d = t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(d, threshold=0.95)


@_register(
    "q_profile_drift",
    """
    WITH oldt AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
    newt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text,
             lang, n_chars
      FROM documents WHERE doc_id % 5 <> 0),
    po AS (
      SELECT 'text' AS column, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(text) AS n_null,
             COUNT(DISTINCT text) AS n_distinct,
             MIN(text) AS mn, MAX(text) AS mx FROM oldt
      UNION ALL
      SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM oldt
      UNION ALL
      SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars), MIN(n_chars)::VARCHAR,
             MAX(n_chars)::VARCHAR FROM oldt),
    pn AS (
      SELECT 'text' AS column, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(text) AS n_null,
             COUNT(DISTINCT text) AS n_distinct,
             MIN(text) AS mn, MAX(text) AS mx FROM newt
      UNION ALL
      SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM newt
      UNION ALL
      SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars), MIN(n_chars)::VARCHAR,
             MAX(n_chars)::VARCHAR FROM newt)
    SELECT po.column,
           po.n_rows AS n_rows_old, pn.n_rows AS n_rows_new,
           po.n_null AS n_null_old, pn.n_null AS n_null_new,
           po.n_distinct AS n_distinct_old, pn.n_distinct AS n_distinct_new,
           NOT (po.mn IS NOT DISTINCT FROM pn.mn) AS min_changed,
           NOT (po.mx IS NOT DISTINCT FROM pn.mx) AS max_changed
    FROM po JOIN pn ON po.column = pn.column
    """,
    "column-level drift between two snapshot releases: per-column "
    "profiles joined with null/distinct/range deltas — the release QA "
    "complement of q_corpus_diff (which rows changed vs how the "
    "distributions moved); one wide aggregate pass per snapshot",
    "profiling: snapshot drift report",
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.profiling import profile_drift

    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return profile_drift(old, new, columns=["text", "lang", "n_chars"])


@_register(
    "q_lsh_quality",
    None,  # both sides Spark-side; the EXACT side is itself oracle-
    # checked (q_prefix_jaccard_pairs), the report is pytest-bounded
    "LSH calibration report: MinHash+LSH precision/recall measured "
    "against the EXACT prefix-filter similarity join at the same "
    "threshold — the pipeline-owner's dial for trusting (num_hashes, "
    "bands) on a corpus before the full run",
    "dedup: LSH quality calibration",
)
def q_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import lsh_quality_report

    d = t(spark, sf_dir, "documents")
    return lsh_quality_report(d, threshold=0.9, num_hashes=128, bands=32)


@_register(
    "q_dedup_report",
    """
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           ROUND(1 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*),
                 6) AS dup_rate
    FROM documents GROUP BY source
    """,
    "per-source duplication health report: docs, distinct contents "
    "(16-byte digest, never bodies), dup rate — the ops dashboard row "
    "that says which upstream source is flooding the corpus with "
    "copies (digest-keyed partial-agg distinct)",
    "ops: per-source dedup report",
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5(F.col("text"))).alias("n_unique"),
        F.round(
            F.lit(1)
            - F.count_distinct(F.md5(F.col("text"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


@_register(
    "q_corr_stats",
    r"""
    WITH m AS (
      SELECT lang,
             COUNT(*) AS n,
             SUM(n_chars) AS sx,
             SUM(n_chars * n_chars) AS sxx,
             SUM(tk) AS sy,
             SUM(tk * tk) AS syy,
             SUM(n_chars * tk) AS sxy,
             SUM(z) AS sz,
             SUM(n_chars * z) AS sxz
      FROM (SELECT lang, n_chars,
                   len(string_split_regex(trim(lower(text)), '\s+')) AS tk,
                   doc_id % 97 AS z
            FROM documents)
      GROUP BY lang)
    SELECT lang,
           ROUND((n * sxy - sx * sy) /
                 sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                      * (n * syy - sy * sy)), 4) AS corr_chars_tokens,
           ROUND((sxz - CAST(sx AS DOUBLE) * sz / n) / (n - 1), 4)
             AS covar_noise
    FROM m
    """,
    "correlation/covariance per group (SURVEY 2.4 generalized) from "
    "EXACT integer moment sums — the float-determinism pattern: "
    "engine-internal corr/covar accumulate in float and differ in the "
    "last decimals across engines/partitionings, so the moments are "
    "summed exactly (integers) and the division happens once at the "
    "end; single pass, map-side partials",
    "aggregations generalized (SURVEY 2.4): corr/covar",
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long")
    z = (F.col("doc_id") % 97).cast("long")
    x = F.col("n_chars").cast("long")
    base = d.select(F.col("lang"), x.alias("x"), tk.alias("y"), z.alias("z"))
    m = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    covar = (
        F.col("sxz") - F.col("sx").cast("double") * F.col("sz") / F.col("n")
    ) / (F.col("n") - 1)
    return m.select(
        "lang",
        F.round(corr, 4).alias("corr_chars_tokens"),
        F.round(covar, 4).alias("covar_noise"),
    )


@_register(
    "q_token_cosine_pairs",
    r"""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk
          WHERE tok <> '' GROUP BY doc_id, tok),
    n AS (SELECT doc_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
          FROM c GROUP BY doc_id),
    d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.c * b.c) AS dot
          FROM c a JOIN c b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
    FROM d JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
    WHERE CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) >= 0.95
    """,
    "EXACT cosine join over sparse term-frequency vectors: dot "
    "products from a token-keyed self-join of the (doc, token, count) "
    "matrix — only docs sharing a token pair, integer math to the "
    "final division (the bag-of-words twin of the prefix Jaccard join)",
    "dedup: exact term-vector cosine join",
)
def q_token_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import token_cosine_pairs

    d = t(spark, sf_dir, "documents")
    return token_cosine_pairs(d, threshold=0.95)


@_register(
    "q_simhash_quality",
    None,  # simhash side is Spark-hash-specific; the exact side is
    # oracle-checked via q_token_cosine_pairs
    "SimHash calibration report: precision/recall of the 64-bit "
    "hamming gate measured against the EXACT binary term-vector "
    "cosine join at the targeted operating point (hamming h estimates "
    "angle pi*h/64) — the hamming-side twin of q_lsh_quality",
    "dedup: SimHash quality calibration",
)
def q_simhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        simhash_quality_report,
    )

    d = t(spark, sf_dir, "documents")
    return simhash_quality_report(d, max_hamming=6, threshold=0.97)


@_register(
    "q_ann_recall",
    None,  # approximate-method report; brute-force side is the
    # oracle-checked q_ann_cosine_topk shape
    "ANN calibration: recall@10 of the IVF probe and the multi-probe "
    "hyperplane LSH against the exact brute-force top-10 for a query "
    "vector — the third calibration report (lexical LSH, hamming "
    "SimHash, now vector ANN), one row per method",
    "similarity: ANN recall calibration",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    exact = {
        r["vec_id"]
        for r in _sim.brute_force_topk(emb, qv, k=10).collect()
    }
    rows = []
    for method, df in (
        ("ivf", _sim.ivf_topk(emb, qv, k=10, cells=8, nprobe=4)),
        ("lsh", _sim.lsh_topk(emb, qv, k=10, planes=8)),
    ):
        got = {r["vec_id"] for r in df.collect()}
        rows.append((method, len(got & exact), len(exact),
                     round(len(got & exact) / len(exact), 6)))
    return spark.createDataFrame(
        rows, "method string, hits int, k int, recall double"
    )


_LAYOUT_CACHE: dict = {}


@_register(
    "q_skipping_report",
    None,  # filesystem-layout report (footer metadata, no row data)
    "data-skipping effectiveness report: fraction of parquet row "
    "groups a min/max footer check prunes for a range predicate, on "
    "an unclustered vs a range-clustered copy of documents — the "
    "measurement that justifies clustered write layouts at 100 TB",
    "layout: skipping effectiveness report",
)
def q_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.layout import (
        skipping_report,
        write_range_clustered,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    paths = _LAYOUT_CACHE.get(key)
    if paths is None:
        import tempfile

        base = tempfile.mkdtemp(prefix="layout-report-")
        d = t(spark, sf_dir, "documents")
        d.repartition(8).write.parquet(f"{base}/flat")
        write_range_clustered(
            d, f"{base}/clustered", cluster_cols=["n_chars"], num_files=8
        )
        paths = (f"{base}/flat", f"{base}/clustered")
        _LAYOUT_CACHE[key] = paths
    rows = []
    for layout, p in zip(("unclustered", "range_clustered"), paths):
        r = skipping_report(p, "n_chars", lo=0, hi=120)
        rows.append(
            (layout, r["row_groups"], r["skippable"], r["skip_fraction"])
        )
    return spark.createDataFrame(
        rows, "layout string, row_groups int, skippable int, skip_fraction double"
    )


@_register(
    "q_image_near_dup",
    None,  # binary media + perceptual hash: pytest-proven vs a Python
    # reference (decode+aHash brute force)
    "multimodal dedup: image near-duplicate pairs by 64-bit perceptual "
    "hash (Arrow-batched P6 decode + block-mean aHash), candidates and "
    "verification via the SAME chunk-banded hamming join SimHash text "
    "dedup uses — re-encoded copies of each image must pair at "
    "distance 0, corrupt payloads never pair",
    "multimodal: perceptual-hash near-dup",
)
def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=64).filter(
        F.col("media_type") == "image"
    )
    copies = assets.withColumn("asset_id", F.col("asset_id") + 1000)
    return multimodal.image_near_dup_pairs(
        assets.unionByName(copies), max_hamming=3
    )


@_register(
    "q_audio_near_dup",
    None,  # binary media + energy fingerprint: pytest-proven vs a
    # Python reference (decode+hash brute force)
    "multimodal dedup, audio side: near-duplicate pairs by 64-bit "
    "energy fingerprint (Arrow-batched PCM16 WAV decode, "
    "gain-invariant frame-RMS-vs-median bits) over the same "
    "chunk-banded hamming join as SimHash and the image phash",
    "multimodal: audio fingerprint near-dup",
)
def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=64).filter(
        F.col("media_type") == "audio"
    )
    copies = assets.withColumn("asset_id", F.col("asset_id") + 1000)
    return multimodal.audio_near_dup_pairs(
        assets.unionByName(copies), max_hamming=3
    )


_SH_INDEX_CACHE: dict = {}


@_register(
    "q_simhash_index_gate",
    None,  # xxhash64 fingerprint family — pytest pins exact equality
    # with the recompute operator and the save/load roundtrip
    "persisted hamming admission gate: near-dup matches of the odd-id "
    "half of the corpus against a SAVED SimhashIndex of the even-id "
    "half — 8 bytes per indexed document, the cheapest durable "
    "near-dup index (the minhash twin is q_minhash_index_gate)",
    "dedup: persisted simhash index gate",
)
def q_simhash_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import SimhashIndex

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _SH_INDEX_CACHE.get(key)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="sh-index-")
        existing = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
        SimhashIndex.build(existing).save(path)
        _SH_INDEX_CACHE[key] = path
    new = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return SimhashIndex.load(spark, path).pairs_against(new, max_hamming=3)


@_register(
    "q_prefix_jaccard_against",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_distinct(string_split_regex(trim(lower(text)), '\s+')),
               x -> x <> '') AS tk
      FROM documents),
    p AS (
      SELECT n.doc_id AS new_id, e.doc_id AS existing_id,
             len(list_intersect(n.tk, e.tk)) AS inter,
             len(n.tk) AS na, len(e.tk) AS nb
      FROM s n JOIN s e
        ON n.doc_id % 2 = 1 AND e.doc_id % 2 = 0)
    SELECT new_id, existing_id,
           ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
    FROM p
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.95
    """,
    "EXACT incremental admission gate: every (new, existing) pair with "
    "token-set Jaccard >= tau via cross-corpus prefix filtering — the "
    "no-recall-loss twin of the minhash/simhash *_against gates "
    "(oracle = brute-force cross join)",
    "dedup: exact incremental Jaccard gate",
)
def q_prefix_jaccard_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        prefix_jaccard_pairs_against,
    )

    d = t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs_against(
        d.filter(F.col("doc_id") % 2 == 1),
        d.filter(F.col("doc_id") % 2 == 0),
        threshold=0.95,
    )


@_register(
    "q_token_cosine_against",
    r"""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk
          WHERE tok <> '' GROUP BY doc_id, tok),
    n AS (SELECT doc_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
          FROM c GROUP BY doc_id),
    d AS (SELECT a.doc_id AS new_id, b.doc_id AS existing_id,
                 SUM(a.c * b.c) AS dot
          FROM c a JOIN c b
            ON a.tok = b.tok AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          GROUP BY 1, 2)
    SELECT new_id, existing_id,
           ROUND(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
    FROM d JOIN n na ON na.doc_id = new_id
           JOIN n nb ON nb.doc_id = existing_id
    WHERE CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) >= 0.95
    """,
    "EXACT incremental cosine gate: (new, existing) pairs with "
    "term-frequency cosine >= tau from a token-keyed join of the two "
    "sparse count matrices — the bag-of-words twin of "
    "q_prefix_jaccard_against, integer math to the final division",
    "dedup: exact incremental cosine gate",
)
def q_token_cosine_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        token_cosine_pairs_against,
    )

    d = t(spark, sf_dir, "documents")
    return token_cosine_pairs_against(
        d.filter(F.col("doc_id") % 2 == 1),
        d.filter(F.col("doc_id") % 2 == 0),
        threshold=0.95,
    )


@_register(
    "q_mad_by_lang",
    """
    WITH med AS (
      SELECT lang,
             PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY n_chars) AS m
      FROM documents GROUP BY lang)
    SELECT d.lang,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (
                   ORDER BY ABS(d.n_chars - med.m)), 4) AS mad,
           ROUND(ANY_VALUE(med.m), 4) AS median
    FROM documents d JOIN med ON d.lang = med.lang
    GROUP BY d.lang
    """,
    "robust spread per group: median absolute deviation of document "
    "length per language (per-group median via percentile aggregate, "
    "bounds joined back — no window over the corpus) — the "
    "outlier-insensitive counterpart of q_stats_agg's stddev",
    "aggregations generalized (SURVEY 2.4): robust spread",
)
def q_mad_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.percentile(F.col("n_chars").cast("double"), F.lit(0.5)).alias("m")
    )
    return (
        d.join(med, on="lang")
        .groupBy("lang")
        .agg(
            F.round(
                F.percentile(
                    F.abs(F.col("n_chars") - F.col("m")), F.lit(0.5)
                ),
                4,
            ).alias("mad"),
            F.round(F.any_value(F.col("m")), 4).alias("median"),
        )
    )


@_register(
    "q_entropy_by_source",
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n FROM documents
      GROUP BY source, lang),
    tot AS (SELECT source, SUM(n) AS tn FROM c GROUP BY source)
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM((CAST(n AS DOUBLE) / tn)
                      * log2(CAST(n AS DOUBLE) / tn)), 6) AS lang_entropy
    FROM c JOIN tot ON c.source = tot.source
    GROUP BY c.source
    """,
    "corpus-mixture health: Shannon entropy of the language "
    "distribution per source (exact integer counts to the final "
    "division — cross-engine float determinism) — low entropy flags a "
    "source collapsing to one language",
    "profiling: distribution entropy report",
)
def q_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("tn"))
    p = F.col("n").cast("double") / F.col("tn")
    return (
        c.join(tot, on="source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round((-F.sum(p * F.log2(p))), 6).alias("lang_entropy"),
        )
    )


@_register(
    "q_containment_against",
    None,  # xxhash64 fingerprints; pytest pins cross-subset equality
    # with the self-join operator (r6 window rotation)
    "incremental containment gate: new docs sharing >= 3 winnowed "
    "fingerprints with an admitted doc (quotation/boilerplate "
    "inclusion the Jaccard/cosine gates score low) — fingerprint join "
    "is new x existing with the hot-fingerprint cap on the corpus side",
    "dedup: incremental winnowing containment gate",
)
def q_containment_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        winnowing_containment_against,
    )

    d = t(spark, sf_dir, "documents")
    return winnowing_containment_against(
        d.filter(F.col("doc_id") % 2 == 1),
        d.filter(F.col("doc_id") % 2 == 0),
        shingle=6, window=4, min_shared=3,
    )


@_register(
    "q_pack_spans",
    """
    WITH r AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 8),
                        doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents WHERE n_chars > 0),
    s AS (
      SELECT doc_id, cum - n_chars AS st, cum AS en FROM r),
    x AS (
      SELECT doc_id, st, en,
             unnest(generate_series(CAST(FLOOR(CAST(st AS DOUBLE) / 4096) AS BIGINT),
                                    CAST(FLOOR(CAST(en - 1 AS DOUBLE) / 4096) AS BIGINT)))
               AS bin_id
      FROM s)
    SELECT bin_id, doc_id,
           CAST(GREATEST(st, bin_id * 4096) - bin_id * 4096 AS BIGINT) AS bin_start,
           CAST(LEAST(en, (bin_id + 1) * 4096) - bin_id * 4096 AS BIGINT) AS bin_end,
           CAST(GREATEST(st, bin_id * 4096) - st AS BIGINT) AS doc_offset
    FROM x
    """,
    "sequence-packing loader manifest: one row per (training sequence, "
    "document) with the token span the doc occupies inside the "
    "sequence and its doc-internal offset — what a loader needs for "
    "attention masks and boundary splits (256-bucket prefix cumsum + "
    "bounded per-doc bin explode)",
    "sampling/packing: packed-sequence spans",
)
def q_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return sampling.pack_sequence_spans(
        d, weight_col="n_chars", seq_len=4096, id_col="doc_id", seed=5
    )


@_register(
    "q_curation_pipeline_v2",
    r"""
    WITH w AS (
      SELECT lang,
             PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
             PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
      FROM documents GROUP BY lang),
    trimmed AS (
      SELECT d.doc_id, d.lang, d.text, d.n_chars,
             LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), w.lo), w.hi) AS ncw
      FROM documents d JOIN w ON d.lang = w.lang),
    q AS (
      SELECT * FROM trimmed
      WHERE ncw >= 100
        AND len(string_split_regex(trim(lower(text)), '\s+')) >= 20),
    dedup AS (
      SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    kept AS (
      SELECT q.* FROM q JOIN dedup USING (doc_id)),
    sampled AS (
      SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                               || ':' || '11'), 1, 8))::UBIGINT
                               + 0.5) / 4294967296.0,
                              1.0 / CAST(n_chars AS DOUBLE)) DESC,
                          doc_id ASC) AS rk
        FROM kept WHERE n_chars > 0)
      WHERE rk <= 20)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled GROUP BY lang
    """,
    "end-to-end curation v2 over the round-5 layer: per-language "
    "winsorized length floor -> token-count quality filter -> exact "
    "dedup (md5 min-id) -> per-group A-Res weighted sample (k=20 per "
    "language, length-proportional) -> per-language composition — "
    "every stage oracle-checked individually, composed here in one "
    "declarative plan",
    "curation: end-to-end pipeline v2 (north-star)",
)
def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.profiling import winsorize
    from sample_dms_s3_kinesis_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    trimmed = winsorize(d, "n_chars", group_cols=["lang"])
    q = trimmed.filter(
        (F.col("n_chars_w") >= 100) & (token_count(F.col("text")) >= 20)
    )
    survivors = (
        q.select(F.md5("text").alias("_h"), "doc_id")
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = q.join(survivors, on="doc_id")
    sampled = sampling.weighted_sample_per_group(
        kept, group_cols="lang", id_col="doc_id",
        weight_col="n_chars", k=20, seed=11,
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@_register(
    "q_dedup_segments",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tks,
             len(string_split_regex(trim(text), '\s+')) AS nt
      FROM documents),
    segs0 AS (
      SELECT doc_id, i AS pos,
             array_to_string(tks[i*12+1 : i*12+12], ' ') AS seg
      FROM base, UNNEST(range(0, CAST(ceil(nt / 12.0) AS BIGINT))) AS t(i)),
    segs AS (
      SELECT doc_id, pos, seg, lower(seg) AS key FROM segs0 WHERE seg <> ''),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
        FROM segs) WHERE rn = 1),
    rb AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS ns FROM segs GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text,
           CAST(COALESCE(tot.ns, 0) - COALESCE(rb.nk, 0) AS BIGINT)
             AS n_removed
    FROM documents d LEFT JOIN rb USING (doc_id) LEFT JOIN tot USING (doc_id)
    """,
    "global segment-level dedup (C4 sentence-dedup shape on fixed "
    "12-token segments): corpus-wide keep-first of repeated segments, "
    "per-doc ordered rebuild — exact string match cross-engine; the "
    "oracle's row_number window equals the operator's skew-safe "
    "MIN(struct) aggregate because both order by (doc_id, pos)",
    "curation: segment-level global dedup",
)
def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.curation import dedup_segments

    return dedup_segments(t(spark, sf_dir, "documents"), width=12)


@_register(
    "q_dedup_segments_against",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tks,
             len(string_split_regex(trim(text), '\s+')) AS nt
      FROM documents),
    segs0 AS (
      SELECT doc_id, i AS pos,
             array_to_string(tks[i*12+1 : i*12+12], ' ') AS seg
      FROM base, UNNEST(range(0, CAST(ceil(nt / 12.0) AS BIGINT))) AS t(i)),
    segs AS (
      SELECT doc_id, pos, seg, lower(seg) AS key FROM segs0 WHERE seg <> ''),
    newsegs AS (SELECT * FROM segs WHERE doc_id % 2 = 1),
    oldkeys AS (SELECT DISTINCT key FROM segs WHERE doc_id % 2 = 0),
    fresh AS (
      SELECT n.* FROM newsegs n LEFT JOIN oldkeys o USING (key)
      WHERE o.key IS NULL),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
        FROM fresh) WHERE rn = 1),
    rb AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS ns FROM newsegs GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text,
           CAST(COALESCE(tot.ns, 0) - COALESCE(rb.nk, 0) AS BIGINT)
             AS n_removed
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      LEFT JOIN rb USING (doc_id) LEFT JOIN tot USING (doc_id)
    """,
    "incremental segment-level dedup gate: rebuild NEW (odd-id) docs "
    "with segments already in the EXISTING (even-id) corpus anti-joined "
    "away, then keep-first within the batch — exact string match "
    "cross-engine; the corpus side reduces to distinct keys only",
    "curation: incremental segment dedup (admission remediation)",
)
def q_dedup_segments_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.curation import (
        dedup_segments_against,
    )

    d = t(spark, sf_dir, "documents")
    return dedup_segments_against(
        d.filter(F.col("doc_id") % 2 == 1),
        d.filter(F.col("doc_id") % 2 == 0),
        width=12,
    )


@_register(
    "q_unpivot_metrics",
    """
    WITH a AS (
      SELECT l_returnflag,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
             ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM a
    """,
    "UNPIVOT/melt: wide per-flag measure columns to long (metric, "
    "value) rows — Spark's native unpivot operator (the oracle spells "
    "it as the equivalent UNION ALL); long form is the shape metric "
    "stores and plotting layers ingest",
    "O17 generalized: wide-to-long reshape",
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        _money(_sum_cents(_cents(F.col("l_quantity"))), 2).alias("sum_qty"),
        _money(_sum_cents(_cents(F.col("l_extendedprice"))), 2).alias("sum_price"),
        _money(_sum_cents(_cents(F.col("l_discount"))), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


@_register(
    "q_array_hof_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_aggregate(
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
             'sum') AS BIGINT) AS sum_q6,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           list_max(
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           ) AS max_q6
    FROM embeddings
    """,
    "higher-order array functions (transform / filter / aggregate) "
    "over the embedding column, quantized to exact integers (floor at "
    "1e-6) so the fold is bit-identical cross-engine — the "
    "whole-stage-codegen path for array math, no explode and no UDF",
    "§2.8 scalar functions generalized: array HOFs",
)
def q_array_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    q6 = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(q6, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "sum_q6"
        ),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias(
            "n_pos"
        ),
        F.array_max(q6).alias("max_q6"),
    )


@_register(
    "q_dedup_segments_within",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tks,
             len(string_split_regex(trim(text), '\s+')) AS nt
      FROM documents),
    segs0 AS (
      SELECT doc_id, i AS pos,
             array_to_string(tks[i*12+1 : i*12+12], ' ') AS seg
      FROM base, UNNEST(range(0, CAST(ceil(nt / 12.0) AS BIGINT))) AS t(i)),
    segs AS (
      SELECT doc_id, pos, seg, lower(seg) AS key FROM segs0 WHERE seg <> ''),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY doc_id, key ORDER BY pos) AS rn
        FROM segs) WHERE rn = 1),
    rb AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS ns FROM segs GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text,
           CAST(COALESCE(tot.ns, 0) - COALESCE(rb.nk, 0) AS BIGINT)
             AS n_removed
    FROM documents d LEFT JOIN rb USING (doc_id) LEFT JOIN tot USING (doc_id)
    """,
    "within-document repetition removal (Gopher/FineWeb repeated-lines "
    "rule): keep the first occurrence of each repeated 12-token segment "
    "INSIDE the same document only — composes with q_dedup_segments' "
    "corpus-wide pass; skew-proof because the aggregate key includes "
    "the doc id",
    "curation: within-doc segment dedup",
)
def q_dedup_segments_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.curation import (
        dedup_segments_within,
    )

    return dedup_segments_within(t(spark, sf_dir, "documents"), width=12)


@_register(
    "q_temperature_mixture",
    """
    WITH c AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
               FROM documents GROUP BY lang),
    w AS (SELECT lang, n, POW(n, 1.0 / 2.0) AS w FROM c),
    tot AS (SELECT MAX(cum) AS tot FROM (
              SELECT SUM(w) OVER (ORDER BY lang ROWS UNBOUNDED PRECEDING)
                AS cum FROM w)),
    s AS (SELECT lang, n, w / tot AS share FROM w CROSS JOIN tot),
    b AS (SELECT MIN(n / share) AS budget FROM s),
    f AS (SELECT lang, LEAST(budget * share / n, 1.0) AS frac
          FROM s CROSS JOIN b),
    thr AS (SELECT lang,
                   CASE WHEN frac >= 1.0 THEN 'g'
                        ELSE printf('%08x', CAST(FLOOR(frac * 4294967296.0) AS BIGINT))
                   END AS bound
            FROM f),
    kept AS (SELECT d.lang
             FROM documents d JOIN thr ON d.lang = thr.lang
             WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':13'), 1, 8) < thr.bound)
    SELECT lang, COUNT(*) AS n_docs FROM kept GROUP BY lang
    """,
    "temperature-scaled mixture sampling (share ∝ n^(1/T), T=2 — the "
    "multilingual exponent-smoothing rule): head languages downsample "
    "toward the tail, scarcest-relative-to-share language kept whole; "
    "shares accumulate in sorted-lang order on both engines so the "
    "budget arithmetic and hash thresholds match bit-for-bit",
    "sampling: temperature rebalance (north-star)",
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    out = sampling.temperature_mixture_sample(
        d, domain_col="lang", temperature=2.0, id_col="doc_id", seed=13
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@_register(
    "q_bpe_merges",
    None,  # iterative (one argmax round per merge) — not SQL-expressible;
    # pytest proves exact equality with a pure-Python Sennrich-style
    # reference (tests/test_bpe_ops.py), including a hypothesis sweep
    "BPE tokenizer induction over the corpus: 16 merge rounds on the "
    "weighted vocabulary (corpus shuffles ONCE into (word, count); each "
    "round is a vocabulary-sized pair-count aggregate + top-1 via "
    "TakeOrderedAndProject — one driver row per round), merge rewrite "
    "is a pure Catalyst array fold; deterministic count-then-lex "
    "tie-break makes the merge list a pure function of the corpus",
    "north-star: tokenizer induction (train the tokenizer ON the "
    "curated corpus)",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import bpe

    return bpe.merges_frame(
        t(spark, sf_dir, "documents"), n_merges=16, min_pair_count=2
    )


@_register(
    "q_funnel_counts",
    """
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.ts
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts
           GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM t1
    UNION ALL
    SELECT 2 AS step, 'click' AS step_name, COUNT(*) AS n_users FROM t2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS step_name, COUNT(*) AS n_users FROM t3
    """,
    "ordered funnel (view → click → purchase, strict event-time order "
    "between steps): per-user matching is ONE sorted-array fold after "
    "one user-key shuffle — the oracle's k-fold iterative-min CTE chain "
    "is the semantic spec, the Spark plan touches the event table once "
    "instead of k times",
    "O17 generalized: event-sequence funnel",
)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.funnel_counts(
        t(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


@_register(
    "q_cohort_retention",
    """
    WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS period
          FROM events)
    SELECT cohort,
           CAST(date_diff('day', cohort, period) / 7 AS INT)
             AS period_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY cohort, period_offset
    """,
    "cohort retention matrix: users bucketed by first-activity week "
    "(Monday-truncated in both engines), exact distinct-user counts "
    "per (cohort, week-offset) cell; two aggregates, never a per-user "
    "matrix",
    "O17 generalized: cohort retention",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.cohort_retention(t(spark, sf_dir, "events"))


@_register(
    "q_pq_topk",
    None,  # approximate ANN family (like IVF/LSH): iterative training +
    # hash-seeded codebooks are not SQL-expressible; pytest pins encode
    # vs a per-subspace nearest-code check, asymmetric-distance scoring
    # vs a Python table reference, recall vs brute force, and train
    # determinism under repartition (tests/test_similarity_ops.py)
    "product-quantization ANN: train m=4 codebooks (one bounded explode "
    "to subvectors, Lloyd rounds shared across subspaces, driver sees "
    "only m·codes rows/round), encode the corpus to m small codes, and "
    "serve top-k by asymmetric distance — m table lookups per vector "
    "from a driver-built query table, TakeOrderedAndProject finish; "
    "the float vectors are never read at query time",
    "north-star: similarity search (PQ — the memory side of "
    "billion-scale ANN)",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    query = [0.1] * 64
    cb = _sim.pq_train(e, m=4, codes=16, iters=1, dim=64)
    enc = _sim.pq_encode(e, cb, m=4, dim=64)
    return _sim.pq_topk(enc, cb, query, k=10)


@_register(
    "q_funnel_conversion",
    """
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.ts
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts
           GROUP BY e.user_id)
    SELECT COUNT(*) AS n_converted,
           ROUND(CAST(SUM(epoch_us(t3.ts) - epoch_us(t1.ts)) AS DOUBLE)
                 / COUNT(*) / 1000000.0, 6) AS avg_seconds
    FROM t3 JOIN t1 USING (user_id)
    """,
    "funnel time-to-convert: mean first-view→purchase latency over "
    "fully-converted users; microsecond differences sum exactly in "
    "bigint with ONE double division at the end (the corr/covar "
    "exact-moments lesson applied to latency), so the mean is "
    "bit-identical cross-engine",
    "O17 generalized: funnel conversion latency",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.funnel_conversion_stats(
        t(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


@_register(
    "q_resample_ffill",
    """
    WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS s,
                      date_trunc('hour', MAX(ts)) AS e
               FROM events GROUP BY user_id),
    g AS (SELECT user_id,
                 UNNEST(generate_series(s, e, INTERVAL 6 HOUR)) AS grid_ts
          FROM b),
    u AS (SELECT user_id, ts AS ot, value AS v, 0 AS isg,
                 event_id AS tie, NULL::TIMESTAMP AS grid_ts
          FROM events
          UNION ALL
          SELECT user_id, grid_ts AS ot, NULL AS v, 1 AS isg,
                 4611686018427387904 AS tie, grid_ts
          FROM g),
    f AS (SELECT user_id, grid_ts, isg,
                 LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ot, isg, tie
                   ROWS UNBOUNDED PRECEDING) AS value
          FROM u)
    SELECT user_id, grid_ts, value FROM f WHERE isg = 1
    """,
    "time-grid resampling with forward fill (6-hour grid per user from "
    "first to last observation hour): bounded grid explode + ONE "
    "per-key ordered window carrying last_value(ignore nulls); order "
    "(instant, grid-after-obs, event id) is deterministic under "
    "duplicate timestamps and the filled value is an exact input copy",
    "O17 generalized: gap-filling resample",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.resample_ffill(t(spark, sf_dir, "events"), step_hours=6)


@_register(
    "q_rolling_7d_value",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v_q6
      FROM events GROUP BY event_type, day)
    SELECT event_type, day, n,
           CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(v_q6) OVER w AS BIGINT) AS v_q6_7d
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    "rolling 7-day window per event type over daily aggregates: the "
    "RANGE interval frame sums the trailing week even across missing "
    "days (a ROWS frame would silently shrink the window); values are "
    "floor-quantized to exact integers so the rolling sums are "
    "bit-identical cross-engine; the window runs over the tiny "
    "per-(type, day) frame, never the raw events",
    "§2.7 window generalized: interval range frame",
)
def q_rolling_7d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("v_q6"),
    )
    # RANGE frame needs a numeric order key in Spark: days since epoch.
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).cast("long").alias("n_7d"),
        F.sum("v_q6").over(w).cast("long").alias("v_q6_7d"),
    )


@_register(
    "q_daily_anomaly",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY event_type, day),
    m AS (
      SELECT event_type, COUNT(*) AS k,
             CAST(SUM(CAST(n AS BIGINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(n AS BIGINT) * CAST(n AS BIGINT)) AS DOUBLE) AS s2
      FROM d GROUP BY event_type)
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n,
           ROUND((d.n - s1 / k)
                 / SQRT(s2 / k - (s1 / k) * (s1 / k)), 4) AS zscore
    FROM d JOIN m ON d.event_type = m.event_type
    WHERE ABS((d.n - s1 / k)
              / SQRT(s2 / k - (s1 / k) * (s1 / k))) > 1.5
    """,
    "daily volume anomaly flags per event type: z-scores from EXACT "
    "integer moment sums (SUM(n), SUM(n*n) in bigint, divided once at "
    "the end — the engine-internal stddev accumulates in float and "
    "differs cross-engine in the 4th decimal); the per-type moments "
    "broadcast back onto the daily frame",
    "O17 generalized: anomaly detection over volume series",
)
def q_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    j = d.join(F.broadcast(m), on="event_type")
    mean = F.col("s1") / F.col("k")
    z = (F.col("n").cast("double") - mean) / F.sqrt(
        F.col("s2") / F.col("k") - mean * mean
    )
    return j.filter(F.abs(z) > 1.5).select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(z, 4).alias("zscore"),
    )


@_register(
    "q_ivfpq_topk",
    None,  # approximate ANN (IVFADC); pytest pins search vs a Python
    # asymmetric-distance reference over the same probed cells, recall
    # vs brute force, and a save/load roundtrip whose loaded probe
    # partition-prunes on the cell key (tests/test_similarity_ops.py)
    "IVF-PQ ANN (IVFADC): coarse cells prune the corpus to "
    "nprobe/cells, PQ codes of cell residuals shrink the rest to a few "
    "bytes/vector; search builds one m×codes distance table per probed "
    "cell on the driver and scores by table lookups — corpus floats "
    "are never read at query time",
    "north-star: similarity search (IVF-PQ composition)",
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    idx = _sim.IvfPqIndex.build(e, cells=8, m=4, codes=16, iters=1, dim=64)
    return idx.search([0.1] * 64, k=10, nprobe=3)


@_register(
    "q_cohort_ltv",
    """
    WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
               FROM events GROUP BY user_id),
    r AS (SELECT e.user_id, f.cohort,
                 CAST(date_diff('day', f.cohort,
                                date_trunc('week', e.ts)) / 7 AS INT)
                   AS period_offset,
                 CAST(FLOOR(e.value * 1000000) AS BIGINT) AS v_q6
          FROM events e JOIN f USING (user_id)
          WHERE e.event_type = 'purchase'),
    g AS (SELECT cohort, period_offset,
                 CAST(SUM(v_q6) AS BIGINT) AS rev_q6
          FROM r GROUP BY cohort, period_offset)
    SELECT cohort, period_offset, rev_q6,
           CAST(SUM(rev_q6) OVER (PARTITION BY cohort ORDER BY period_offset
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_rev_q6
    FROM g
    """,
    "cohort lifetime value: purchase revenue per (first-activity-week "
    "cohort, week offset) plus the running cumulative — the LTV curve; "
    "revenue floor-quantized to exact integers so sums and cumsums are "
    "bit-identical cross-engine; the running window orders the tiny "
    "per-cohort frame, never the events",
    "O17 generalized: cohort lifetime value",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, on="user_id")
        .select(
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort"))
                / F.lit(7)
            )
            .cast("int")
            .alias("period_offset"),
            F.floor(F.col("value") * 1000000).cast("long").alias("v_q6"),
        )
    )
    g = r.groupBy("cohort", "period_offset").agg(
        F.sum("v_q6").cast("long").alias("rev_q6")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("period_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort",
        "period_offset",
        "rev_q6",
        F.sum("rev_q6").over(w).cast("long").alias("cum_rev_q6"),
    )


@_register(
    "q_rolling_wau",
    """
    WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                       user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           COUNT(DISTINCT u.user_id) AS wau
    FROM days d JOIN du u
      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    "rolling 7-day active users per day (WAU): daily distinct "
    "(day, user) pairs range-join the day grid within the trailing "
    "week, then an exact two-phase distinct count — the join input is "
    "the per-day distinct frame (≤ users × days rows), never raw "
    "events, so the 7× fan-out is bounded and exact",
    "§2.7 window generalized: sliding distinct users",
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    j = days.join(
        du,
        (F.col("day") >= F.date_sub(F.col("d"), 6)) & (F.col("day") <= F.col("d")),
    )
    return (
        j.groupBy("d")
        .agg(F.count_distinct(F.col("user_id")).alias("wau"))
        .withColumnRenamed("d", "day")
    )


@_register(
    "q_session_stats",
    """
    WITH marks AS (
      SELECT user_id, event_id, ts,
             CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marks),
    g AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS dur_us
      FROM sess GROUP BY user_id, session_id)
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS avg_events_per_session,
           ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS avg_duration_seconds
    FROM g
    """,
    "session summary over 30-min-gap sessionization: counts and means "
    "from exact bigint sums (durations in microseconds) with one "
    "double division at the end — the session-window KPI rollup",
    "§2.7 generalized: session statistics",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = tus - F.lag(tus).over(w)
    marks = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us > 1_800_000_000, 1)
        .when(gap_us.isNull(), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marks.select(
        "user_id", "ts", F.sum("new_sess").over(wsum).alias("session_id")
    )
    g = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("dur_us"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events_per_session"),
        F.round(
            F.sum("dur_us").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0),
            6,
        ).alias("avg_duration_seconds"),
    )


@_register(
    "q_event_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n
    FROM s WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    "event-type transition matrix (first-order Markov counts): LEAD "
    "per user in strict (ts, event id) order, then a grouped count — "
    "the behavioral-flow input for journey analysis; one user-key "
    "shuffle, the transition aggregate is 25 cells",
    "§2.7 generalized: transition counts",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        s.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "q_edit_distance_pairs",
    """
    WITH d AS (SELECT doc_id, substr(text, 1, 24) AS k FROM documents),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 levenshtein(a.k, b.k) AS distance
          FROM d a JOIN d b
            ON a.doc_id < b.doc_id
           AND abs(len(a.k) - len(b.k)) <= 2)
    SELECT id_a, id_b, CAST(distance AS BIGINT) AS distance
    FROM p WHERE distance <= 2
    """,
    "exact edit-distance similarity join (ed ≤ 2 on 24-char prefixes): "
    "lossless q-gram count filter (one edit destroys ≤ q grams, so "
    "near pairs share ≥ max−k·q multiset grams — an equi-join on "
    "(gram, occurrence) plus a length band), levenshtein verifies "
    "candidates only; the oracle is the brute-force quadratic join",
    "dedup: exact string-similarity join (Gravano q-gram filter)",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import dedup as _dd

    out = _dd.edit_distance_pairs(
        t(spark, sf_dir, "documents"), k=2, q=3, prefix_len=24
    )
    return out.select(
        "id_a", "id_b", F.col("distance").cast("long").alias("distance")
    )


@_register(
    "q_edit_distance_against",
    """
    WITH d AS (SELECT doc_id, substr(text, 1, 24) AS k FROM documents),
    p AS (SELECT n.doc_id AS id_new, e.doc_id AS id_existing,
                 levenshtein(n.k, e.k) AS distance
          FROM (SELECT * FROM d WHERE doc_id % 2 = 1) n
          JOIN (SELECT * FROM d WHERE doc_id % 2 = 0) e
            ON abs(len(n.k) - len(e.k)) <= 2)
    SELECT id_new, id_existing, CAST(distance AS BIGINT) AS distance
    FROM p WHERE distance <= 2
    """,
    "incremental edit-distance admission gate: NEW (odd-id) documents "
    "against the EXISTING (even-id) corpus with the same lossless "
    "q-gram count filter — the corpus never self-pairs; completes the "
    "{Jaccard, cosine, edit} × {self, incremental} exact-join matrix",
    "dedup: incremental string-similarity gate",
)
def q_edit_distance_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import dedup as _dd

    d = t(spark, sf_dir, "documents")
    out = _dd.edit_distance_pairs_against(
        d.filter(F.col("doc_id") % 2 == 1),
        d.filter(F.col("doc_id") % 2 == 0),
        k=2,
        q=3,
        prefix_len=24,
    )
    return out.select(
        "id_new", "id_existing", F.col("distance").cast("long").alias("distance")
    )


@_register(
    "q_hll_daily_union",
    None,  # approximate (Apache DataSketches HLL) — no DuckDB oracle;
    # pytest bounds the estimate against the exact distinct count
    "mergeable distinct-count sketches: one HLL sketch per day "
    "(hll_sketch_agg), merged with hll_union_agg into the monthly "
    "distinct-user estimate — the re-aggregatable form a metrics store "
    "keeps so ANY date range's uniques come from merging daily "
    "sketches instead of rescanning events; per-day rows also carry "
    "their own estimates",
    "O17 generalized: mergeable sketch aggregation",
)
def q_hll_daily_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("_sk"))
    per_day = daily.select(
        "day", F.hll_sketch_estimate("_sk").alias("est_users")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("est_users")
    ).select(F.lit(None).cast("date").alias("day"), "est_users")
    return per_day.unionByName(merged).orderBy(F.col("day").asc_nulls_last())


@_register(
    "q_boolean_search",
    r"""
    WITH p AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents)
    SELECT doc_id FROM (
      SELECT DISTINCT doc_id, token FROM p
      WHERE token IN ('table', 'spark', 'key'))
    GROUP BY doc_id HAVING COUNT(*) = 3
    """,
    "conjunctive boolean retrieval (AND of three terms): posting-list "
    "intersection as one distinct + grouped count — the inverted-index "
    "read path; at scale the posting frame is a stored table bucketed "
    "by token and the term filter prunes at the source",
    "search: boolean retrieval",
)
def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import search

    return search.boolean_search(
        t(spark, sf_dir, "documents"), ["table", "spark", "key"]
    )


@_register(
    "q_phrase_search",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tks
      FROM documents),
    p AS (SELECT doc_id, i AS pos, tks[i + 1] AS token
          FROM base, UNNEST(range(0, len(tks))) AS t(i))
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM p a JOIN p b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.token = 'table' AND b.token = 'row'
    GROUP BY a.doc_id
    """,
    "exact consecutive-phrase retrieval ('table row'): anchor-shifted "
    "positional postings checked with ONE per-doc aggregate — a "
    "k-term phrase stays one explode + one aggregate instead of k-1 "
    "position self-joins (the oracle spells the 2-term join form)",
    "search: phrase retrieval",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import search

    return search.phrase_search(
        t(spark, sf_dir, "documents"), ["table", "row"]
    )


@_register(
    "q_bm25_search",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tks
      FROM documents),
    p AS (SELECT doc_id, tks[i + 1] AS token
          FROM base, UNNEST(range(0, len(tks))) AS t(i)),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM p GROUP BY doc_id),
    s AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avglen
          FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM p
           WHERE token IN ('table', 'spark') GROUP BY doc_id, token),
    dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    sc AS (SELECT tf.doc_id,
                  LN(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * ((1.0 - 0.75)
                                + 0.75 * CAST(dl.dl AS DOUBLE) / s.avglen))
                    AS sc
           FROM tf JOIN dl USING (doc_id) CROSS JOIN s
                   JOIN dfq USING (token))
    SELECT doc_id, ROUND(SUM(sc), 4) AS score FROM sc
    GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
    """,
    "BM25-ranked retrieval (Lucene idf): corpus stats and per-term "
    "document frequencies are tiny broadcast aggregates, scoring is a "
    "per-(doc, term) expression summed per doc, TakeOrderedAndProject "
    "finishes; identical op order on both engines so scores match at "
    "4 decimals",
    "search: BM25 ranking",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import search

    return search.bm25_search(
        t(spark, sf_dir, "documents"), ["table", "spark"], topk=10
    )


@_register(
    "q_hybrid_rrf_search",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tks
      FROM documents),
    p AS (SELECT doc_id, tks[i + 1] AS token
          FROM base, UNNEST(range(0, len(tks))) AS t(i)),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM p GROUP BY doc_id),
    s AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avglen
          FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM p
           WHERE token IN ('table', 'spark') GROUP BY doc_id, token),
    dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    sc AS (SELECT tf.doc_id,
                  LN(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * ((1.0 - 0.75)
                                + 0.75 * CAST(dl.dl AS DOUBLE) / s.avglen))
                    AS sc
           FROM tf JOIN dl USING (doc_id) CROSS JOIN s
                   JOIN dfq USING (token)),
    lexpool AS (SELECT doc_id, ROUND(SUM(sc), 4) AS score FROM sc
                GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
    lex AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                        AS DOUBLE) AS rank_1
            FROM lexpool),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    densepool AS (
      SELECT vec_id,
             ROUND(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
               AS cosine
      FROM e
      WHERE list_cosine_similarity(v, (SELECT qv FROM q)) IS NOT NULL
      ORDER BY cosine DESC, vec_id ASC LIMIT 50),
    dense AS (SELECT vec_id AS doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC,
                                             vec_id ASC)
                          AS DOUBLE) AS rank_2
              FROM densepool),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.rank_1, d.rank_2
      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
    SELECT doc_id, rank_1, rank_2,
           ROUND(COALESCE(1.0 / (60.0 + rank_1), 0.0)
                 + COALESCE(1.0 / (60.0 + rank_2), 0.0), 6) AS rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """,
    "hybrid RAG retrieval: BM25 lexical top-50 + exact-cosine dense "
    "top-50 (query = embedding of vec_id 0, doc_id-aligned corpus) "
    "fused by Reciprocal Rank Fusion 1/(60+rank) — each channel ends "
    "as TakeOrderedAndProject, ranks are windows over the ≤50-row "
    "channel results, and the fusion full-outer join is pool-bounded; "
    "ranks surface as DOUBLE (missing channel = NULL) so both "
    "engines' pandas sinks render identically",
    "search: hybrid lexical+dense retrieval (RRF fusion)",
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import search

    emb = t(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return search.hybrid_rrf_search(
        t(spark, sf_dir, "documents"),
        emb,
        ["table", "spark"],
        qv,
        k=10,
        pool=50,
    )


_POSTINGS_SAVE_CACHE: dict[str, str] = {}


@_register(
    "q_postings_search",
    r"""
    WITH p AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents),
    hit AS (
      SELECT doc_id FROM (
        SELECT DISTINCT doc_id, token FROM p
        WHERE token IN ('table', 'spark'))
      GROUP BY doc_id HAVING COUNT(*) = 2),
    bad AS (SELECT DISTINCT doc_id FROM p WHERE token = 'slow')
    SELECT h.doc_id FROM hit h LEFT JOIN bad b USING (doc_id)
    WHERE b.doc_id IS NULL
    """,
    "boolean AND-NOT retrieval served from a SAVED inverted index "
    "(PostingsIndex.save/load): postings persist partitioned by a "
    "256-way token hash bucket, so the loaded query's term filter "
    "prunes storage partitions (pytest pins the PartitionFilters); "
    "results are exactly the in-memory boolean form, which the SQL "
    "oracle spells directly",
    "search: persisted inverted index",
)
def q_postings_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from sample_dms_s3_kinesis_spark.operators import search as _search

    key = f"{sf_dir}|postings"
    path = _POSTINGS_SAVE_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="postings-index-")
        _search.PostingsIndex.build(t(spark, sf_dir, "documents")).save(path)
        _POSTINGS_SAVE_CACHE[key] = path
    loaded = _search.PostingsIndex.load(spark, path)
    return loaded.search(["table", "spark"], exclude=["slow"])


@_register(
    "q_sql_entry_revenue",
    """
    SELECT o.o_orderpriority,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
             AS revenue,
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    "the SQL ENTRY PATH: the same ANSI string runs through spark.sql "
    "over registered temp views AND through the DuckDB oracle — "
    "proving dialect-portable SQL is a first-class way into the "
    "engine, not just the DataFrame API (Catalyst plans both "
    "identically: pushed filter, broadcast-ability, partial aggs)",
    "§3 query lifecycle: SQL entry point",
)
def q_sql_entry_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
                 AS revenue,
               COUNT(*) AS n_items
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY o.o_orderpriority
        """
    )


@_register(
    "q_daily_trend",
    """
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, x),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM d GROUP BY event_type)
    SELECT event_type,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS slope_per_day,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx)
                 / n, 6) AS intercept
    FROM m
    """,
    "per-type linear trend of daily event volume: OLS slope/intercept "
    "from EXACT bigint moment sums (n, Σx, Σy, Σxx, Σxy) with the "
    "divisions done once at the end — bit-identical cross-engine, the "
    "same exact-moments discipline as corr/anomaly; the regression "
    "runs over the tiny per-day frame",
    "O17 generalized: volume trend fitting",
)
def q_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("long")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    slope = (nn * F.col("sxy") - sx * F.col("sy")) / (
        nn * F.col("sxx") - sx * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    return m.select(
        "event_type",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


@_register(
    "q_funnel_windowed",
    """
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.ts
             AND e.ts <= t1.ts + INTERVAL 48 HOUR
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts
             AND e.ts <= t1.ts + INTERVAL 48 HOUR
           GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM t1
    UNION ALL
    SELECT 2 AS step, 'click' AS step_name, COUNT(*) AS n_users FROM t2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS step_name, COUNT(*) AS n_users FROM t3
    """,
    "conversion-window funnel (steps 2+ must land within 48 h of the "
    "user's FIRST view — first-touch anchoring): same single-scan "
    "sorted-array fold, with the window armed by the fold's tracked "
    "first-match time; the oracle's CTE chain carries t1 into every "
    "later step's bound",
    "O17 generalized: windowed funnel",
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.funnel_counts(
        t(spark, sf_dir, "events"),
        steps=["view", "click", "purchase"],
        within_hours=48,
    )


@_register(
    "q_group_split",
    """
    WITH s AS (
      SELECT source,
             CASE WHEN substr(md5(source || ':17'), 1, 8)
                       < printf('%08x', CAST(FLOOR(0.8 * 4294967296.0) AS BIGINT))
                  THEN 'train' ELSE 'heldout' END AS split
      FROM (SELECT DISTINCT source FROM documents)),
    j AS (SELECT d.doc_id, d.source, s.split
          FROM documents d JOIN s USING (source))
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM j GROUP BY split
    """,
    "group-aware train/heldout split: the hash runs on the GROUP key "
    "(source), so every document of a source lands in the same split — "
    "the leakage-safe split for grouped data (near-identical docs from "
    "one source can never straddle the boundary); same deterministic "
    "md5-threshold machinery as hash_split, keyed one level up",
    "sampling: group-aware split (leakage-safe)",
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    split = sampling.hash_split(
        d.select("source").distinct(),
        id_col="source",
        weights=(("train", 0.8), ("heldout", 0.2)),
        seed=17,
    )
    return (
        d.join(split, on="source")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


@_register(
    "q_split_leakage",
    """
    WITH sp AS (
      SELECT doc_id, md5(text) AS h,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 8)
                       < printf('%08x', CAST(FLOOR(0.8 * 4294967296.0) AS BIGINT))
                  THEN 'train' ELSE 'heldout' END AS split
      FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sp a JOIN sp b
        ON a.h = b.h AND a.doc_id < b.doc_id
       AND a.split <> b.split)
    SELECT COUNT(*) AS n_cross_dup_pairs,
           COUNT(DISTINCT id_a) + COUNT(DISTINCT id_b) AS n_docs_involved
    FROM pairs
    """,
    "split-leakage audit: exact-duplicate pairs that STRADDLE a "
    "doc-id-hashed train/heldout split (the eval-contamination check a "
    "pipeline runs before trusting a benchmark number) — digest "
    "self-join restricted to cross-split pairs, shuffles 16-byte "
    "hashes only; composes the dedup digest machinery with hash_split",
    "curation: split-leakage audit",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = sampling.hash_split(
        t(spark, sf_dir, "documents"),
        id_col="doc_id",
        weights=(("train", 0.8), ("heldout", 0.2)),
        seed=3,
    ).select("doc_id", F.md5("text").alias("h"), "split")
    a = d.select(
        F.col("doc_id").alias("id_a"), "h", F.col("split").alias("_sa")
    )
    b = d.select(
        F.col("doc_id").alias("id_b"), "h", F.col("split").alias("_sb")
    )
    pairs = a.join(b, on="h").filter(
        (F.col("id_a") < F.col("id_b")) & (F.col("_sa") != F.col("_sb"))
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_cross_dup_pairs"),
        (
            F.count_distinct("id_a") + F.count_distinct("id_b")
        ).alias("n_docs_involved"),
    )


@_register(
    "q_stickiness",
    """
    WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                       user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
    wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
            FROM days d JOIN du u
              ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
            GROUP BY d.day)
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
    "engagement stickiness (DAU/WAU per day): daily exact distincts "
    "joined to the trailing-week rolling distinct, one exact double "
    "division — the classic engagement ratio over the bounded per-day "
    "distinct frame",
    "O17 generalized: engagement ratio",
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    wau = (
        days.join(
            du,
            (F.col("day") >= F.date_sub(F.col("d"), 6))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
        .withColumnRenamed("d", "day")
    )
    return dau.join(wau, on="day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@_register(
    "q_resample_interpolate",
    """
    WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS s,
                      date_trunc('hour', MAX(ts)) AS e
               FROM events GROUP BY user_id),
    g AS (SELECT user_id,
                 UNNEST(generate_series(s, e, INTERVAL 6 HOUR)) AS grid_ts
          FROM b),
    u AS (SELECT user_id, ts AS ot, value AS v, 0 AS isg,
                 event_id AS tie, NULL::TIMESTAMP AS grid_ts
          FROM events
          UNION ALL
          SELECT user_id, grid_ts AS ot, NULL AS v, 1 AS isg,
                 4611686018427387904 AS tie, grid_ts
          FROM g),
    w AS (SELECT user_id, grid_ts, isg, epoch_us(ot) AS ot_us,
                 LAST_VALUE(v IGNORE NULLS) OVER wb AS v0,
                 LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(ot) END
                            IGNORE NULLS) OVER wb AS t0,
                 FIRST_VALUE(v IGNORE NULLS) OVER wf AS v1,
                 FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(ot) END
                             IGNORE NULLS) OVER wf AS t1
          FROM u
          WINDOW wb AS (PARTITION BY user_id ORDER BY ot, isg, tie
                        ROWS UNBOUNDED PRECEDING),
                 wf AS (PARTITION BY user_id ORDER BY ot, isg, tie
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT user_id, grid_ts,
           ROUND(CASE WHEN v0 IS NULL THEN NULL
                      WHEN v1 IS NULL THEN v0
                      ELSE v0 + (v1 - v0)
                           * (CAST(ot_us - t0 AS DOUBLE)
                              / CAST(t1 - t0 AS DOUBLE))
                 END, 6) AS value
    FROM w WHERE isg = 1
    """,
    "linear-interpolation resampling (6h grid per user): each grid "
    "instant blends the bracketing observations with exact bigint "
    "micros arithmetic and ONE double division, mirrored op-for-op by "
    "the oracle — NULL before the first observation, forward-fill "
    "after the last; one extra window pass over the ffill plan's sort, "
    "no extra shuffle",
    "O17 generalized: interpolating resample",
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    return analytics.resample_interpolate(
        t(spark, sf_dir, "events"), step_hours=6
    )


@_register(
    "q_split_leakage_near",
    None,  # xxhash64 minhash family — rows-only like its LSH siblings;
    # the exact-dup side of the same audit is oracle-checked as
    # q_split_leakage
    "NEAR-duplicate split-leakage audit: MinHash-LSH candidate pairs "
    "verified to Jaccard ≥ 0.8 that STRADDLE the train/heldout split — "
    "exact-dup leakage (q_split_leakage) catches copies, this catches "
    "the paraphrase/boilerplate overlap that actually contaminates "
    "benchmarks; composes lsh_verified_jaccard_pairs with hash_split "
    "at zero extra shuffle over the pair frame",
    "curation: near-dup split-leakage audit",
)
def q_split_leakage_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import dedup as _dd

    d = sampling.hash_split(
        t(spark, sf_dir, "documents"),
        id_col="doc_id",
        weights=(("train", 0.8), ("heldout", 0.2)),
        seed=3,
    )
    pairs = _dd.lsh_verified_jaccard_pairs(d, threshold=0.8)
    sp = d.select("doc_id", "split")
    j = (
        pairs.join(
            sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "split", "_sa"
            ),
            on="id_a",
        )
        .join(
            sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "split", "_sb"
            ),
            on="id_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_cross_near_pairs"),
        (
            F.count_distinct("id_a") + F.count_distinct("id_b")
        ).alias("n_docs_involved"),
    )


@_register(
    "q_top_journeys",
    """
    WITH marks AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marks),
    j AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
      FROM sess GROUP BY user_id, session_id)
    SELECT journey, COUNT(*) AS n_sessions
    FROM j GROUP BY journey
    ORDER BY n_sessions DESC, journey LIMIT 20
    """,
    "top user journeys: per 30-min session, the ordered event-type "
    "path as a string (deterministic (ts, event id) order), then "
    "frequency-ranked top-20 — the behavioral-pattern mining query; "
    "journey assembly is a per-session sort_array fold, the ranking "
    "is TakeOrderedAndProject over the journey-count frame",
    "§2.7 generalized: session journey mining",
)
def q_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = tus - F.lag(tus).over(w)
    marks = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(gap_us > 1_800_000_000, 1)
        .when(gap_us.isNull(), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marks.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_sess").over(wsum).alias("session_id"),
    )
    j = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.unix_micros(F.col("ts").cast("timestamp")).alias(
                                "_t"
                            ),
                            F.col("event_id").alias("_i"),
                            F.col("event_type").alias("_y"),
                        )
                    )
                ),
                lambda s: s["_y"],
            ),
            ">",
        ).alias("journey")
    )
    return (
        j.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("journey"))
        .limit(20)
    )


@_register(
    "q_check_expectations",
    """
    WITH a AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE)
                      THEN 1 ELSE 0 END) AS v_notnull,
             SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                      THEN 1 ELSE 0 END) AS v_positive,
             SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
                      THEN 1 ELSE 0 END) AS v_status,
             SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
               - COUNT(DISTINCT o_orderkey) AS v_unique
      FROM orders)
    SELECT 'orderkey_unique' AS rule, n AS n_rows,
           CAST(v_unique AS BIGINT) AS n_violations, v_unique = 0 AS passed
    FROM a
    UNION ALL
    SELECT 'custkey_not_null', n, CAST(v_notnull AS BIGINT), v_notnull = 0 FROM a
    UNION ALL
    SELECT 'totalprice_positive', n, CAST(v_positive AS BIGINT), v_positive = 0 FROM a
    UNION ALL
    SELECT 'status_in_domain', n, CAST(v_status AS BIGINT), v_status = 0 FROM a
    """,
    "declarative data-quality expectations (Deequ shape): four rules — "
    "key uniqueness, not-null, positivity, domain membership — checked "
    "in ONE aggregate pass (k rules = one scan, not k); NULL predicate "
    "results count as violations on both engines",
    "O25 proactive twin: contract assertion before shipping",
)
def q_check_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import quality as _q

    return _q.check_expectations(
        t(spark, sf_dir, "orders"),
        [
            _q.UniqueRule("orderkey_unique", ("o_orderkey",)),
            _q.not_null("custkey_not_null", "o_custkey"),
            _q.RowRule("totalprice_positive", F.col("o_totalprice") > 0),
            _q.in_set("status_in_domain", "o_orderstatus", ["O", "F", "P"]),
        ],
    )


@_register(
    "q_quarantine",
    """
    SELECT doc_id,
           CASE WHEN NOT COALESCE(text IS NOT NULL, FALSE)
                  THEN 'text_not_null'
                WHEN NOT COALESCE(n_chars >= 100, FALSE)
                  THEN 'min_length'
                WHEN NOT COALESCE(lang IN ('en','de','zh'), FALSE)
                  THEN 'lang_domain'
           END AS failed_rule
    FROM documents
    WHERE CASE WHEN NOT COALESCE(text IS NOT NULL, FALSE)
                 THEN 'text_not_null'
               WHEN NOT COALESCE(n_chars >= 100, FALSE)
                 THEN 'min_length'
               WHEN NOT COALESCE(lang IN ('en','de','zh'), FALSE)
                 THEN 'lang_domain'
          END IS NOT NULL
    """,
    "contract quarantine over documents: rows failing the declared "
    "contract divert with the FIRST failing rule's name (declaration "
    "order) — the O25 apply-exceptions side channel generalized to "
    "arbitrary rule sets; one narrow CASE projection, no shuffle",
    "O25 generalized: rule-labeled quarantine",
)
def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import quality as _q

    _, invalid = _q.quarantine(
        t(spark, sf_dir, "documents"),
        [
            _q.not_null("text_not_null", "text"),
            _q.RowRule("min_length", F.col("n_chars") >= 100),
            _q.in_set("lang_domain", "lang", ["en", "de", "zh"]),
        ],
    )
    return invalid.select("doc_id", "failed_rule")


@_register(
    "q_funnel_by_cohort",
    """
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.ts
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts
           GROUP BY e.user_id),
    f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
          FROM events GROUP BY user_id),
    d AS (SELECT f.user_id, f.cohort,
                 CASE WHEN t3.user_id IS NOT NULL THEN 3
                      WHEN t2.user_id IS NOT NULL THEN 2
                      WHEN t1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS depth
          FROM f LEFT JOIN t1 USING (user_id)
                 LEFT JOIN t2 USING (user_id)
                 LEFT JOIN t3 USING (user_id))
    SELECT cohort,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN depth >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_entered,
           CAST(SUM(CASE WHEN depth >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           ROUND(CAST(SUM(CASE WHEN depth >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS conversion_rate
    FROM d GROUP BY cohort
    """,
    "conversion by signup cohort: funnel depth per user joined to the "
    "first-activity-week cohort, rolled up to entered/converted counts "
    "and a rate per cohort — the composition a growth team reads "
    "weekly; the funnel fold and the cohort aggregate each shuffle the "
    "user key once and the final rollup is cohort-sized",
    "O17 generalized: cohort-sliced funnel",
)
def q_funnel_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import analytics

    ev = t(spark, sf_dir, "events")
    depth = analytics.user_funnel_depth(
        ev, steps=["view", "click", "purchase"]
    ).select("user_id", "depth")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    d = cohorts.join(depth, on="user_id", how="left").select(
        "cohort", F.coalesce(F.col("depth"), F.lit(0)).alias("depth")
    )
    return d.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("depth") >= 1, 1).otherwise(0)).alias("n_entered"),
        F.sum(F.when(F.col("depth") >= 3, 1).otherwise(0)).alias(
            "n_converted"
        ),
        F.round(
            F.sum(F.when(F.col("depth") >= 3, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("conversion_rate"),
    )


_PMI_SQL = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
  FROM toks, UNNEST(tk) AS u(w) GROUP BY w
),
big AS (
  SELECT tk[i] AS w1, tk[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM toks, UNNEST(range(1, len(tk))) AS r(i)
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST((SELECT SUM(c_w) FROM uni) AS BIGINT) AS n_tok,
         CAST((SELECT SUM(n_pair) FROM big) AS BIGINT) AS n_big
)
SELECT b.w1, b.w2, b.n_pair,
       ROUND(LN((CAST(b.n_pair AS DOUBLE) * t2.n_tok * t2.n_tok)
                / (CAST(t2.n_big AS DOUBLE) * a.c_w * c.c_w)), 4) + 0.0
         AS pmi
FROM big b
JOIN uni a ON b.w1 = a.w
JOIN uni c ON b.w2 = c.w
CROSS JOIN tot t2
WHERE b.n_pair >= 5
"""


@_register(
    "q_pmi_bigrams",
    _PMI_SQL,
    "PMI collocation extraction: one ln over exact integer counts "
    "(unigram + bigram aggregates share the tokenize; min_count "
    "prunes before the vocab joins)",
    "text analysis: collocations (PMI)",
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import text as _text

    return _text.pmi_bigrams(t(spark, sf_dir, "documents"), min_count=5)


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       ROUND(CAST(t.o_totalprice AS DOUBLE), 2) AS top_price
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
) t
"""


@_register(
    "q_lateral_top_order",
    _LATERAL_SQL,
    "LATERAL correlated subquery entry path: per-customer top order, "
    "the SAME ANSI string through spark.sql and the oracle (Catalyst "
    "decorrelates it into the window/aggregate plan q_topk_per_group "
    "writes by hand — no per-row re-execution survives optimization)",
    "§3 query lifecycle: SQL entry point (LATERAL)",
)
def q_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# Shared oracle CTE: content-defined chunk starts as a recursive fold —
# the md5 hex-nibble boundary class renders identically in DuckDB and
# Spark, so boundaries (and therefore chunks) match exactly.  Mirrors
# cdc_chunks' aggregate fold: s0=0; s_{k+1} = min(s_k + max_tokens,
# first boundary position >= s_k + min_tokens), appended while <= n-1.
_CDC_CHUNK_CTE = r"""
WITH RECURSIVE tokf AS (
  SELECT doc_id, tks, len(tks) AS n,
         [i for i in range(1, len(tks))
            if substr(md5(tks[i+1]), 1, 1) = '0'] AS bpos
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '') AS tks
    FROM documents)
  WHERE len(tks) > 0),
starts(doc_id, s, k) AS (
  SELECT doc_id, 0, 0 FROM tokf
  UNION ALL
  SELECT doc_id, nxt, k + 1 FROM (
    SELECT t.doc_id,
           LEAST(st.s + 32,
                 COALESCE(list_min(list_filter(t.bpos,
                                               i -> i >= st.s + 4)),
                          st.s + 32)) AS nxt,
           st.k AS k, t.n AS n
    FROM starts st JOIN tokf t USING (doc_id)) q
  WHERE nxt <= n - 1),
chunks AS (
  SELECT st.doc_id, st.k AS chunk_idx,
         array_to_string(t.tks[st.s + 1 : COALESCE(nx.s, t.n)],
                         ' ') AS chunk_text,
         CAST(COALESCE(nx.s, t.n) - st.s AS INT) AS n_tokens
  FROM starts st JOIN tokf t USING (doc_id)
  LEFT JOIN starts nx
    ON nx.doc_id = st.doc_id AND nx.k = st.k + 1)
"""


@_register(
    "q_cdc_chunks",
    _CDC_CHUNK_CTE
    + """
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
           n_tokens
    FROM chunks
    """,
    "content-defined chunking: content-hash token-class boundaries "
    "with min/max bounds — shuffle-free per-doc Catalyst fold; "
    "boundaries re-synchronize after edits where fixed-width grids "
    "cannot.  md5 hex-nibble boundary class (same 2^-4 rate as the "
    "xxhash64 default) so the DuckDB oracle reproduces every boundary "
    "exactly via a recursive-CTE fold",
    "text analysis: content-defined chunking",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import text as _text

    return _text.cdc_chunks(
        t(spark, sf_dir, "documents"), mask_bits=4, min_tokens=4,
        max_tokens=32, boundary="md5",
    )


@_register(
    "q_dedup_segments_cdc",
    _CDC_CHUNK_CTE
    + """
    , segs AS (
      SELECT doc_id, chunk_idx AS pos, chunk_text AS seg,
             lower(chunk_text) AS key
      FROM chunks),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY doc_id, pos) AS rn
        FROM segs) WHERE rn = 1),
    rb AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS ns FROM segs GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text,
           CAST(COALESCE(tot.ns, 0) - COALESCE(rb.nk, 0) AS BIGINT)
             AS n_removed
    FROM documents d LEFT JOIN rb USING (doc_id)
                     LEFT JOIN tot USING (doc_id)
    """,
    "global keep-first segment dedup over content-defined chunks: "
    "catches repeated passages at ANY offset (insertion-shifted "
    "copies that defeat the fixed-width grid); same skew-safe "
    "MIN(struct) aggregate as q_dedup_segments.  md5 boundary class "
    "makes the chunk grid DuckDB-replicable, so the oracle is the "
    "exact rebuilt string",
    "dedup: segment-level (content-defined)",
)
def q_dedup_segments_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import curation as _cur

    return _cur.dedup_segments_cdc(
        t(spark, sf_dir, "documents"), mask_bits=4, min_tokens=4,
        max_tokens=32, boundary="md5",
    )


@_register(
    "q_neardup_degrees",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_distinct(string_split_regex(trim(lower(text)), '\s+')),
               x -> x <> '') AS tk
      FROM documents),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.tk, b.tk)) AS inter,
             len(a.tk) AS na, len(b.tk) AS nb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
            / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)))
            >= 0.8),
    ends AS (
      SELECT id_a AS id FROM p UNION ALL SELECT id_b FROM p)
    SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM ends GROUP BY id
    """,
    "degree histogram of the exact near-dup pair graph (one explode + "
    "map-side-combined count): the boilerplate-hub diagnostic run "
    "before cluster resolution",
    "dedup: near-dup graph diagnostics (degrees)",
)
def q_neardup_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import graph as _graph
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    pairs = prefix_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8)
    return _graph.degree_stats(pairs)


@_register(
    "q_pagerank_neardup",
    None,
    "PageRank centrality over the symmetrized near-dup pair graph "
    "(the crawl-seeding quality signal applied to duplication "
    "structure): fixed power iteration, one dst-keyed map-side-"
    "combined shuffle per round, dangling mass via a broadcast 1-row "
    "aggregate, lineage cut per iteration (rows-only: iterative "
    "float fixpoint; Python-model equality pytest-pinned)",
    "iterative: PageRank centrality",
)
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import graph as _graph
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    # Edge source is the LSH near-dup graph — the scale-default pair
    # path (O(collisions) banded join).  The exact prefix-filter join
    # at this threshold materializes ~3M edges on the sf0.1 corpus
    # (dense synthetic near-dup structure, ~125 s) and times the pair
    # join, not the centrality op this query exists to exercise
    # (bench tier-2 finding, r8).
    pairs = minhash_lsh_pairs(t(spark, sf_dir, "documents"), threshold=0.8)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return _graph.pagerank(edges, iterations=8)


@_register(
    "q_dedup_segments_cdc_against",
    _CDC_CHUNK_CTE
    + """
    , segs AS (
      SELECT doc_id, chunk_idx AS pos, chunk_text AS seg,
             lower(chunk_text) AS key
      FROM chunks),
    newsegs AS (SELECT * FROM segs WHERE doc_id % 5 = 0),
    oldkeys AS (SELECT DISTINCT key FROM segs WHERE doc_id % 5 <> 0),
    fresh AS (
      SELECT n.* FROM newsegs n LEFT JOIN oldkeys o USING (key)
      WHERE o.key IS NULL),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY doc_id, pos) AS rn
        FROM fresh) WHERE rn = 1),
    rb AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS ns FROM newsegs GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text,
           CAST(COALESCE(tot.ns, 0) - COALESCE(rb.nk, 0) AS BIGINT)
             AS n_removed
    FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
    LEFT JOIN rb USING (doc_id) LEFT JOIN tot USING (doc_id)
    """,
    "incremental content-defined segment dedup: NEW docs rebuilt with "
    "corpus-present chunks removed (distinct-key anti-join) + in-batch "
    "keep-first — catches passages lifted from the corpus behind an "
    "inserted preamble, which the fixed-width incremental grid misses. "
    "md5 boundary class makes the chunk grid DuckDB-replicable, so the "
    "oracle is the exact rebuilt string",
    "dedup: segment-level incremental (content-defined)",
)
def q_dedup_segments_cdc_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import curation as _cur

    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    existing = d.filter(F.col("doc_id") % 5 != 0)
    return _cur.dedup_segments_cdc_against(
        new, existing, mask_bits=4, min_tokens=4, max_tokens=32,
        boundary="md5",
    )


@_register(
    "q_cms_daily_freq",
    """
    WITH seeds AS (SELECT UNNEST(range(5)) AS d),
    counters AS (
      SELECT s.d,
             CAST(('0x' || substr(md5(e.event_type || ':' ||
                   CAST(s.d AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS b,
             COUNT(*) AS cnt
      FROM events e CROSS JOIN seeds s
      GROUP BY 1, 2),
    probes AS (SELECT DISTINCT event_type FROM events
               WHERE event_type IS NOT NULL),
    pb AS (
      SELECT p.event_type, s.d,
             CAST(('0x' || substr(md5(p.event_type || ':' ||
                   CAST(s.d AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS b
      FROM probes p CROSS JOIN seeds s)
    SELECT pb.event_type, CAST(MIN(c.cnt) AS BIGINT) AS est_count
    FROM pb JOIN counters c USING (d, b)
    GROUP BY pb.event_type
    ORDER BY pb.event_type
    """,
    "mergeable FREQUENCY sketches (the Count-Min twin of "
    "q_hll_daily_union, as a relational (d,b,cnt) table rather than "
    "an opaque binary): one sketch per day over event_type, merged by "
    "re-aggregation into range estimates probed engine-side — "
    "never-undercount + overcount bounds pytest-pinned.  Exact since "
    "r8: the md5 hash family (bucket = first-8-hex of md5('v:d') mod "
    "width) is replicated verbatim in DuckDB, and per-day build + "
    "counter-sum merge == the oracle's global counters, so every "
    "estimate hash-matches cross-engine",
    "O17 generalized: mergeable sketch aggregation (frequency)",
)
def q_cms_daily_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import sketches as _sk

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    daily = _sk.cms_table(
        ev, "event_type", width=256, depth=5, group_cols=("day",),
        hash_family="md5",
    )
    merged = _sk.cms_merge(daily, drop_cols=("day",))
    return _sk.cms_estimate(
        merged, ev.select("event_type"), "event_type", width=256, depth=5,
        hash_family="md5",
    ).orderBy("event_type")


@_register(
    "q_kmv_user_overlap",
    """
    WITH types AS (
      SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS rn
      FROM (SELECT DISTINCT event_type FROM events)),
    ka AS (
      SELECT h FROM (
        SELECT DISTINCT
          CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
               AS BIGINT) + 1 AS DOUBLE) / 281474976710657.0 AS h
        FROM events
        WHERE event_type = (SELECT event_type FROM types WHERE rn = 1))
      ORDER BY h LIMIT 256),
    kb AS (
      SELECT h FROM (
        SELECT DISTINCT
          CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
               AS BIGINT) + 1 AS DOUBLE) / 281474976710657.0 AS h
        FROM events
        WHERE event_type = (SELECT event_type FROM types WHERE rn = 2))
      ORDER BY h LIMIT 256),
    u AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (
          SELECT h FROM ka UNION ALL SELECT h FROM kb))
      ORDER BY h LIMIT 256),
    stats AS (SELECT COUNT(*) AS n, MAX(h) AS theta FROM u),
    mm AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m
      FROM (SELECT h FROM ka INTERSECT SELECT h FROM kb) x
      JOIN u USING (h)),
    est AS (
      SELECT CASE WHEN s.n < 256 THEN mm.m ELSE mm.m / s.theta END
               AS est_intersection,
             CASE WHEN s.n < 256 THEN CAST(s.n AS DOUBLE)
                  ELSE 255.0 / s.theta END AS est_union
      FROM stats s, mm)
    SELECT (SELECT event_type FROM types WHERE rn = 1) AS type_a,
           (SELECT event_type FROM types WHERE rn = 2) AS type_b,
           ROUND(est_intersection, 2) AS est_intersection,
           ROUND(est_union, 2) AS est_union,
           ROUND(est_intersection / est_union, 4) AS est_jaccard
    FROM est
    """,
    "bottom-k theta sketch set ALGEBRA (the capability HLL lacks): "
    "audience overlap between two event types estimated from their "
    "KMV sketches — intersection / union / jaccard from k-row "
    "synopses instead of a distinct-join over raw events.  Exact "
    "since r8: the md5 hash family (first-12-hex of md5(user_id) as "
    "a 48-bit integer, exact in a double, mapped to (0,1) by one "
    "IEEE division both engines round identically) lets DuckDB "
    "rebuild both sketches, the union sketch, theta and the "
    "intersection samples verbatim; accuracy + exact-mode "
    "pytest-pinned",
    "O17 generalized: mergeable sketch set operations",
)
def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import sketches as _sk

    ev = t(spark, sf_dir, "events")
    types = [
        r["event_type"]
        for r in ev.select("event_type").distinct().orderBy("event_type").limit(2).collect()
    ]
    if len(types) < 2:
        raise ValueError(
            "q_kmv_user_overlap needs >= 2 distinct event_type values; "
            f"found {types}"
        )
    a = _sk.kmv_table(
        ev.filter(F.col("event_type") == types[0]), "user_id", k=256,
        hash_family="md5",
    )
    b = _sk.kmv_table(
        ev.filter(F.col("event_type") == types[1]), "user_id", k=256,
        hash_family="md5",
    )
    out = _sk.kmv_intersect_estimate(a, b, k=256)
    return out.select(
        F.lit(types[0]).alias("type_a"),
        F.lit(types[1]).alias("type_b"),
        F.round("est_intersection", 2).alias("est_intersection"),
        F.round("est_union", 2).alias("est_union"),
        F.round("est_jaccard", 4).alias("est_jaccard"),
    )


_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT event_type AS src, next_type AS dst FROM (
    SELECT event_type,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events) x
  WHERE next_type IS NOT NULL AND next_type <> event_type
),
reach(dst, depth) AS (
  SELECT dst, 1 AS depth FROM edges WHERE src = 'signup'
  UNION ALL
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.dst
  WHERE r.depth < 3
)
SELECT dst, CAST(MIN(depth) AS BIGINT) AS min_depth
FROM reach GROUP BY dst
"""


@_register(
    "q_recursive_reachability",
    _REACH_SQL,
    "RECURSIVE CTE entry path (Spark 4 WITH RECURSIVE == DuckDB, same "
    "ANSI string): min-hop reachability from 'signup' over the "
    "observed per-user event-transition graph — depth-bounded "
    "iteration, each step one src-keyed join over the distinct edge "
    "frame (the transition graph is event-type-cardinality tiny; the "
    "per-user LEAD feeding it is the only corpus-sized pass)",
    "§3 query lifecycle: SQL entry point (recursive CTE)",
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_REACH_SQL)


@_register(
    "q_record_linkage",
    """
    WITH c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                      c_acctbal
               FROM customer),
    p AS (
      SELECT a.c_custkey AS c_custkey_a, b.c_custkey AS c_custkey_b,
             ROUND(1.0 - CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE)
                   / GREATEST(LENGTH(a.c_name), LENGTH(b.c_name)), 6)
               AS name_sim,
             1.0 / (1.0 + CAST(ABS(a.c_acctbal - b.c_acctbal) AS DOUBLE)
                          / 100.0) AS bal_sim
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey),
    s AS (
      SELECT c_custkey_a, c_custkey_b,
             ROUND(0.8 * name_sim + 0.2 * bal_sim, 6) AS score
      FROM p WHERE name_sim >= 0.9)
    SELECT c_custkey_a, c_custkey_b, score,
           (ROW_NUMBER() OVER (PARTITION BY c_custkey_a
                               ORDER BY score DESC, c_custkey_b) = 1
            AND ROW_NUMBER() OVER (PARTITION BY c_custkey_b
                                   ORDER BY score DESC, c_custkey_a) = 1)
             AS is_mutual
    FROM s
    """,
    "record linkage / entity resolution over customer: candidates "
    "blocked on (nation, mktsegment) PLUS a deletion-neighborhood "
    "key on the name (FastSS/symmetric-delete — complete for "
    "levenshtein <= 1, which the 0.9 gate over <=19-char names "
    "implies: 1 - 2/19 < 0.9), scored by 0.8·levenshtein name "
    "similarity + 0.2·account-balance proximity via the NULL-score "
    "drop contract, then mutual-best-match flagged with two "
    "endpoint-partitioned windows over the thresholded pair frame "
    "(bounded by match volume, not corpus size).  The oracle stays "
    "the flat-blocked brute force, so the candidate generator's "
    "completeness is hash-checked cross-engine every round",
    "linkage: edit-blocked multi-field entity resolution + mutual "
    "best match",
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import linkage

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    name_sim = F.round(
        F.lit(1.0)
        - F.levenshtein(F.col("c_name_a"), F.col("c_name_b"))
        / F.greatest(F.length("c_name_a"), F.length("c_name_b")),
        6,
    )
    bal_sim = F.lit(1.0) / (
        F.lit(1.0)
        + F.abs(F.col("c_acctbal_a") - F.col("c_acctbal_b")).cast("double")
        / F.lit(100.0)
    )
    score = F.when(
        name_sim >= 0.9, F.round(0.8 * name_sim + 0.2 * bal_sim, 6)
    )
    # deletion-neighborhood candidates: the flat (nation, segment)
    # blocks pay block²/2 levenshtein calls — 6 s at sf0.1 became
    # 569 s at sf1 (92x for 10x rows).  name_sim >= 0.9 over TPC-H's
    # 18-char names means lev <= 1, for which the variant-hash join
    # is COMPLETE — same output, candidate volume ~ match volume.
    pairs = linkage.edit_blocked_self_linkage(
        cust,
        block_on=["c_nationkey", "c_mktsegment"],
        id_col="c_custkey",
        string_col="c_name",
        score=score,
    )
    return linkage.mutual_best_flag(pairs, "c_custkey_a", "c_custkey_b")


@_register(
    "q_corpus_diversity",
    """
    WITH e AS (
      SELECT label,
             list_transform(embedding::DOUBLE[], x -> CAST(x AS DOUBLE))
               AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    w AS (
      SELECT label, v,
             sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
               AS nrm
      FROM e),
    f AS (SELECT label, list_transform(v, x -> x / nrm) AS uv
          FROM w WHERE nrm > 0),
    d AS (SELECT label, i AS pos, uv[i + 1] AS comp
          FROM f, UNNEST(range(0, len(uv))) AS t(i)),
    s AS (SELECT label, pos, SUM(comp) AS sdim
          FROM d GROUP BY label, pos),
    agg AS (SELECT label, SUM(sdim * sdim) AS ssq
            FROM s GROUP BY label),
    cnt AS (SELECT label, COUNT(*) AS n_vectors FROM f GROUP BY label)
    SELECT c.label, c.n_vectors,
           CASE WHEN c.n_vectors >= 2 THEN
             ROUND((a.ssq - c.n_vectors)
                   / (c.n_vectors * (c.n_vectors - 1.0)), 6)
           END AS mean_pairwise_cosine
    FROM cnt c JOIN agg a USING (label)
    """,
    "per-label corpus diversity: mean pairwise cosine from the "
    "centroid identity Σ_{i≠j}cos = ||Σ v̂||² − n — an O(n²) KPI in "
    "ONE linear pass (normalize, posexplode, per-dim map-side-combined "
    "sum, dim-sized per-group reduce); the oracle replays the same "
    "algebra and pytest proves it equals the brute-force pair mean",
    "similarity: one-pass corpus diversity (mixture-collapse KPI)",
)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.embedding_diversity(
        t(spark, sf_dir, "embeddings"), label_col="label"
    )


# ------------------------------------------------------------------
# HTML / markup text extraction (operators/text.py html_* family).
# The oracle replays the operator's regexp chain step-for-step in
# DuckDB SQL; the builders below mirror text._html_pre_clean /
# _html_block_breaks / _html_strip_tags / decode_html_entities /
# _html_ws_normalize one regexp_replace per line, so a diff between
# engine and oracle is a diff between two readable chains.
# ------------------------------------------------------------------

def _sqlq(s: str) -> str:
    return s.replace("'", "''")


def _duck_html_pre_clean(e: str) -> str:
    e = f"regexp_replace({e}, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')"
    e = f"regexp_replace({e}, '[\\r\\n\\t]+', ' ', 'g')"
    e = f"regexp_replace({e}, '(?s)<!--.*?-->', ' ', 'g')"
    for tag in _text._HTML_DROP_CONTENT:
        e = f"regexp_replace({e}, '(?is)<{tag}\\b.*?</{tag}\\s*>', ' ', 'g')"
    return e


def _duck_html_block_breaks(e: str) -> str:
    return (
        f"regexp_replace({e}, '(?i)</?(?:{_text._HTML_BLOCK_TAGS})\\b[^>]*>',"
        " chr(10), 'g')"
    )


def _duck_html_strip_tags(e: str) -> str:
    return f"regexp_replace({e}, '(?s)<[/!?a-zA-Z][^>]*>', ' ', 'g')"


def _duck_html_entities(e: str) -> str:
    e = f"regexp_replace({e}, '[\\x01\\x02\\x03]', '', 'g')"
    for code, repl in _text._HTML_TYPOGRAPHIC:
        e = f"regexp_replace({e}, '&#{code};', '{_sqlq(repl)}', 'g')"
    # both numeric spellings mark against the SAME text, then ONE
    # decode pass (hex heads tagged 'x') — mirrors text.py exactly
    e = (
        f"regexp_replace({e}, '{_text._HTML_NUM_RE}',"
        " chr(1)||'\\1'||chr(2), 'g')"
    )
    e = (
        f"regexp_replace({e}, '{_text._HTML_HEX_RE}',"
        " chr(1)||'x\\1'||chr(2), 'g')"
    )
    e = f"regexp_replace({e}, '&#38;|&#[xX]26;', chr(3), 'g')"
    e = (
        f"list_aggregate(list_transform(string_split({e}, chr(1)), p -> "
        "CASE WHEN regexp_matches(p, '^[0-9]{2,3}'||chr(2)) THEN "
        "chr(CAST(regexp_extract(p, '^([0-9]+)'||chr(2), 1) AS INT)) || "
        "regexp_replace(p, '^[0-9]+'||chr(2), '') "
        "WHEN regexp_matches(p, '^x[0-9a-fA-F]{2}'||chr(2)) THEN "
        "chr(('0x' || regexp_extract(p, '^x([0-9a-fA-F]+)'||chr(2), 1))"
        "::INT) || "
        "regexp_replace(p, '^x[0-9a-fA-F]+'||chr(2), '') ELSE p END), "
        "'string_agg', '')"
    )
    for name, repl in _text._HTML_NAMED:
        e = f"regexp_replace({e}, '&{name};', '{_sqlq(repl)}', 'g')"
    return f"regexp_replace({e}, chr(3), '&', 'g')"


def _duck_html_ws(e: str) -> str:
    # \x{00A0}: raw non-breaking spaces collapse like the engine's
    # \u00a0 class (RE2 spelling of the same codepoint)
    e = f"regexp_replace({e}, '[ \\t\\r\\x{{00A0}}]+', ' ', 'g')"
    e = f"regexp_replace({e}, ' ?\\n ?', chr(10), 'g')"
    e = f"regexp_replace({e}, '\\n+', chr(10), 'g')"
    e = f"trim({e}, ' ')"
    return f"regexp_replace({e}, '^\\n+|\\n+$', '', 'g')"


def _duck_html_extract(e: str) -> str:
    return _duck_html_ws(_duck_html_entities(_duck_html_strip_tags(
        _duck_html_block_breaks(_duck_html_pre_clean(e)))))


_DUCK_TXTLEN = (
    "length(trim(regexp_replace(regexp_replace({x}, '(?s)<[/!?a-zA-Z][^>]*>', ' ',"
    " 'g'), '\\s+', ' ', 'g'), ' '))"
)


def _duck_html_main(e: str, min_chars: int = 15, max_ld: float = 0.5) -> str:
    blocks = (
        f"string_split({_duck_html_block_breaks(_duck_html_pre_clean(e))},"
        " chr(10))"
    )
    tl_b = _DUCK_TXTLEN.format(x="b")
    tl_a = _DUCK_TXTLEN.format(x="a")
    keep = (
        f"list_filter({blocks}, b -> {tl_b} >= {min_chars} AND "
        f"coalesce(list_sum(list_transform(regexp_extract_all(b, "
        f"'(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), a -> {tl_a})), 0)::DOUBLE "
        f"<= {max_ld} * ({tl_b})::DOUBLE)"
    )
    joined = f"coalesce(list_aggregate({keep}, 'string_agg', chr(10)), '')"
    return _duck_html_ws(_duck_html_entities(_duck_html_strip_tags(joined)))


# Deterministic wrapper that turns each document into an HTML page with
# every feature class the extractor handles: nav/footer link farms (the
# boilerplate heuristic's target), heading, comment, invisible <script>
# and <style> content, named + numeric + typographic entities, and the
# body text with every 'e' re-encoded as '&#101;' so the generic
# numeric decode runs thousands of times per doc.  Single-quote-free so
# both engines embed it as a plain literal.
_HTML_WRAP_PREFIX = (
    '<html><head><title>T</title><style>p{x:1}</style></head><body>'
    '<div id="nav"><a href="/">Home</a> <a href="/a">About</a> '
    '<a href="/b">Blog</a></div><h1>Doc '
)
_HTML_WRAP_MID = " &amp; notes</h1><!-- c --><p>"
_HTML_WRAP_TAIL = (
    "</p><p>Tail &lt;b&gt; &#8220;q&#8221;&nbsp;end of tail block</p>"
    "<script>var x = 1 < 2;</script>"
    '<div><a href="/p">Privacy</a> <a href="/t">Terms</a></div>'
    "</body></html>"
)

_DUCK_WRAPPED_HTML = (
    f"'{_HTML_WRAP_PREFIX}' || CAST(doc_id AS VARCHAR) || "
    f"'{_HTML_WRAP_MID}' || replace(text, 'e', '&#101;') || "
    f"'{_HTML_WRAP_TAIL}'"
)


def _wrapped_html() -> F.Column:
    """The Spark twin of _DUCK_WRAPPED_HTML (kept in lockstep with it
    and shared by every query that synthesizes pages)."""
    return F.concat(
        F.lit(_HTML_WRAP_PREFIX),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_WRAP_MID),
        F.replace(F.col("text"), F.lit("e"), F.lit("&#101;")),
        F.lit(_HTML_WRAP_TAIL),
    )


@_register(
    "q_html_extract",
    f"""
    WITH h AS (SELECT doc_id, {_DUCK_WRAPPED_HTML} AS html FROM documents),
    x AS (SELECT doc_id, {_duck_html_extract("html")} AS extracted,
                 {_duck_html_main("html")} AS main_content
          FROM h)
    SELECT doc_id,
           md5(extracted) AS extracted_md5,
           CAST(length(extracted) AS BIGINT) AS extracted_len,
           CAST(len(list_filter(string_split(extracted, chr(10)),
                                b -> b != '')) AS INT) AS n_blocks,
           md5(main_content) AS main_md5,
           CAST(length(main_content) AS BIGINT) AS main_len,
           left(main_content, 80) AS main_prefix
    FROM x
    """,
    "HTML text extraction: tag-strip + entity decode (named, numeric-"
    "ASCII, typographic) + block boundaries + link-density boilerplate "
    "removal, as pure Catalyst regexp/HOF chains over synthesized "
    "per-document pages; oracle replays the identical chain in DuckDB",
    "text: HTML/markup extraction (web-crawl ingest step)",
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.partitioning import spread

    # the ~40-regex extraction chain is compute-bound per row and the
    # single-file scan pins it to one core without the spread
    d = spread(t(spark, sf_dir, "documents"))
    html = _wrapped_html()
    # Bind the two extracted strings once (projection barrier) — the
    # downstream md5/length/split reference them several times and the
    # chain is ~40 regexps deep.
    x = d.select(
        "doc_id",
        _text.html_extract(html).alias("extracted"),
        _text.html_main_content(html).alias("main_content"),
    )
    return x.select(
        "doc_id",
        F.md5("extracted").alias("extracted_md5"),
        F.length("extracted").cast("long").alias("extracted_len"),
        F.size(F.filter(F.split("extracted", "\n", -1), lambda b: b != ""))
        .alias("n_blocks"),
        F.md5("main_content").alias("main_md5"),
        F.length("main_content").cast("long").alias("main_len"),
        F.substring("main_content", 1, 80).alias("main_prefix"),
    )


# ------------------------------------------------------------------
# URL / domain curation (operators/urls.py): parse + registered domain
# + per-domain frequency caps over deterministically synthesized crawl
# URLs (scheme/case/port/query/ccTLD variety so every parse branch and
# the second-level-suffix rule execute).
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.operators import urls as _urls  # noqa: E402

_URL_SL_SQL = "[" + ", ".join(
    f"'{s}'" for s in _urls.SECOND_LEVEL_SUFFIXES
) + "]"


# Shared synthesized-URL + parse + registered-domain CTE chain (the
# oracle twin of _urls.parse_urls over the deterministic URL wrapper);
# both URL queries build on it.
_URL_PARSED_CTE = f"""
    u AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'https' END)
             || '://'
             || (CASE WHEN doc_id % 3 = 0 THEN 'www.'
                      WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END)
             || (CASE WHEN doc_id % 6 = 0 THEN upper(source) ELSE source END)
             || (CASE WHEN doc_id % 4 = 0 THEN '.co.uk'
                      WHEN doc_id % 4 = 1 THEN '.org'
                      WHEN doc_id % 4 = 2 THEN '.com' ELSE '.net.au' END)
             || (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END)
             || '/p/' || CAST(doc_id AS VARCHAR)
             || (CASE WHEN doc_id % 5 = 0
                      THEN '?ref=r8&x=' || CAST(doc_id AS VARCHAR)
                      ELSE '' END) AS url
      FROM documents),
    p AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
               '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS url_scheme,
             regexp_replace(lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
               '\.+$', '', 'g') AS url_host,
             NULLIF(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:@]+:([0-9]+)(?:[/?#]|$)',
               1), '')::INT AS url_port,
             regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
               AS url_path,
             regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\\?([^#]*)', 1)
               AS url_query
      FROM u),
    d AS (
      SELECT *,
             CASE WHEN len(string_split(url_host, '.')) <= 2 THEN url_host
                  WHEN list_contains({_URL_SL_SQL},
                       array_to_string(string_split(url_host, '.')[-2:], '.'))
                  THEN array_to_string(string_split(url_host, '.')[-3:], '.')
                  ELSE array_to_string(string_split(url_host, '.')[-2:], '.')
             END AS url_domain
      FROM p)"""


def _wrapped_url() -> F.Column:
    """Deterministic per-document crawl URL (the Spark twin of
    _URL_PARSED_CTE's u): mixed-case scheme/host, ports, queries and
    ccTLD suffixes so every parse branch executes."""
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 3 == 0, F.lit("www."))
        .when(did % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit("")),
        F.when(did % 6 == 0, F.upper("source")).otherwise(F.col("source")),
        F.when(did % 4 == 0, F.lit(".co.uk"))
        .when(did % 4 == 1, F.lit(".org"))
        .when(did % 4 == 2, F.lit(".com"))
        .otherwise(F.lit(".net.au")),
        F.when(did % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/p/"),
        did.cast("string"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit("?ref=r8&x="), did.cast("string")),
        ).otherwise(F.lit("")),
    )


@_register(
    "q_url_domain_caps",
    f"""
    WITH {_URL_PARSED_CTE}
    SELECT doc_id, url_scheme, url_host, url_port, url_path, url_query,
           url_domain,
           CAST(CASE WHEN ROW_NUMBER() OVER (
                  PARTITION BY url_domain ORDER BY doc_id) <= 3
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM d
    """,
    "URL curation: parse scheme/host/port/path/query, registered "
    "domain with second-level-suffix rule (co.uk/net.au), and a "
    "3-per-domain frequency cap (RefinedWeb-style) over synthesized "
    "crawl URLs — regexp chain + one domain window, exact oracle",
    "curation: URL parse + per-domain caps",
)
def q_url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    with_url = d.select(
        "doc_id", "source", _wrapped_url().alias("url")
    )
    parsed = _urls.parse_urls(with_url)
    # key the cap window on the already-parsed domain column — else
    # the full parse chain re-evaluates per row inside the window key
    capped = _urls.domain_caps(
        parsed, domain_col="url_domain", max_per_domain=3
    )
    return capped.select(
        "doc_id", "url_scheme", "url_host", "url_port", "url_path",
        "url_query", "url_domain", "kept",
    )


@_register(
    "q_url_caps_incremental",
    f"""
    WITH {_URL_PARSED_CTE},
    prior AS (
      SELECT url_domain AS dom, COUNT(*) AS n_prior
      FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
    nw AS (
      SELECT doc_id, url_domain,
             ROW_NUMBER() OVER (
               PARTITION BY url_domain ORDER BY doc_id) AS rk
      FROM d WHERE doc_id % 2 = 1)
    SELECT n.doc_id, n.url_domain,
           CAST(CASE WHEN n.rk + COALESCE(p.n_prior, 0) <= 3
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM nw n LEFT JOIN prior p ON p.dom = n.url_domain
    """,
    "incremental per-domain admission gate (domain_caps_against): new "
    "batch rows keep only while corpus-admitted + earlier-batch counts "
    "stay within the domain budget — corpus ships COUNTS, never rows "
    "(even doc_ids as corpus, odd as the new batch; exact oracle)",
    "curation: URL per-domain caps, incremental gate",
)
def q_url_caps_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    # project the registered domain ONCE per frame and key everything
    # on it — unparameterized, the ~10-regex parse chain would run for
    # the corpus aggregate, the window key AND the output column
    with_dom = d.select(
        "doc_id",
        _urls.registered_domain(
            _urls.url_host(_wrapped_url())
        ).alias("url_domain"),
    )
    corpus = with_dom.filter(did % 2 == 0)
    new = with_dom.filter(did % 2 == 1)
    out = _urls.domain_caps_against(
        new, corpus, domain_col="url_domain", max_per_domain=3
    )
    return out.select("doc_id", "url_domain", "kept")


# ------------------------------------------------------------------
# Retrieval ranking-quality eval (search.ranking_metrics_report).
# Run and qrels are synthesized from md5 so both engines rank and
# grade identically: rank = md5 order, grade = first hex nibble % 4
# over a sparsified doc subset.
# ------------------------------------------------------------------

@_register(
    "q_ranking_metrics",
    """
    WITH qs AS (SELECT unnest(range(5)) AS query_id),
    scored AS (
      SELECT q.query_id, d.doc_id,
             md5(CAST(q.query_id AS VARCHAR) || ':'
                 || CAST(d.doc_id AS VARCHAR)) AS h
      FROM qs q CROSS JOIN documents d),
    run AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY h, doc_id) AS rank
        FROM scored)
      WHERE rank <= 10),
    rel AS (
      SELECT * FROM (
        SELECT q.query_id, d.doc_id,
               ('0x' || substring(md5('r' || CAST(q.query_id AS VARCHAR)
                  || ':' || CAST(d.doc_id AS VARCHAR)), 1, 1))::INT % 4
                 AS rel
        FROM qs q CROSS JOIN documents d
        WHERE d.doc_id % 3 = 0)
      WHERE rel > 0),
    hits AS (
      SELECT r.query_id, r.rank, COALESCE(g.rel, 0) AS g,
             SUM(CASE WHEN COALESCE(g.rel, 0) > 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY r.query_id ORDER BY r.rank
                     ROWS UNBOUNDED PRECEDING) AS cum_rel
      FROM run r LEFT JOIN rel g
        ON g.query_id = r.query_id AND g.doc_id = r.doc_id),
    perq AS (
      SELECT query_id,
             SUM((POWER(2, g) - 1) / LOG2(rank + 1)) AS dcg,
             MIN(CASE WHEN g > 0 THEN rank END) AS first_rel,
             COUNT(CASE WHEN g > 0 THEN 1 END) AS n_hit,
             SUM(CASE WHEN g > 0
                 THEN cum_rel::DOUBLE / rank END) AS ap_num
      FROM hits GROUP BY query_id),
    ideal AS (
      SELECT query_id,
             SUM(CASE WHEN irk <= 10
                 THEN (POWER(2, rel) - 1) / LOG2(irk + 1) END) AS idcg,
             COUNT(*) AS n_rel
      FROM (SELECT query_id, rel, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, doc_id) AS irk
            FROM rel)
      GROUP BY query_id)
    SELECT i.query_id,
           ROUND(COALESCE(p.dcg, 0) / i.idcg, 6) AS ndcg,
           ROUND(COALESCE(1.0 / p.first_rel, 0), 6) AS mrr,
           ROUND(COALESCE(p.ap_num, 0) / LEAST(i.n_rel, 10), 6) AS ap,
           ROUND(COALESCE(p.n_hit, 0)::DOUBLE / i.n_rel, 6) AS recall
    FROM ideal i LEFT JOIN perq p USING (query_id)
    ORDER BY i.query_id
    """,
    "retrieval ranking-quality eval: nDCG@10 (graded exponential "
    "gain, log2 discount), MRR@10, AP@10 and Recall@10 per query over "
    "an md5-synthesized run and graded qrels — the TREC-style eval "
    "set closing the loop on the BM25/RRF read side; exact oracle",
    "retrieval: ranking metrics (nDCG/MRR/recall)",
)
def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    from sample_dms_s3_kinesis_spark.operators import search as _search

    d = t(spark, sf_dir, "documents").select("doc_id")
    qs = spark.range(5).select(F.col("id").alias("query_id"))
    scored = qs.crossJoin(d).select(
        "query_id",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("query_id"), F.col("doc_id"))
        ).alias("_h"),
    )
    run = (
        scored.withColumn(
            "rank",
            F.row_number().over(
                _W.partitionBy("query_id").orderBy("_h", "doc_id")
            ),
        )
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = (
        qs.crossJoin(d.filter(F.col("doc_id") % 3 == 0))
        .select(
            "query_id",
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("r"),
                                F.col("query_id").cast("string"),
                                F.lit(":"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                % 4
            ).alias("rel"),
        )
        .filter(F.col("rel") > 0)
    )
    return _search.ranking_metrics_report(
        run, qrels, k=10, query_col="query_id"
    ).orderBy("query_id")


@_register(
    "q_hard_negatives",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS query_vec
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                          q.query_vec), 6) AS cosine
      FROM embeddings e CROSS JOIN q),
    banded AS (
      SELECT * FROM scored WHERE cosine >= 0.2 AND cosine < 0.99),
    ranked AS (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM banded)
    SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 5
    """,
    "hard-negative mining for contrastive training: per anchor, the "
    "top-5 most similar corpus vectors inside the [0.2, 0.99) cosine "
    "band — informative negatives below the near-duplicate band that "
    "would poison training as false negatives; exact oracle",
    "similarity: hard-negative mining (contrastive training prep)",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        mine_hard_negatives,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return mine_hard_negatives(emb, queries, k=5, lo=0.2, hi=0.99)


@_register(
    "q_line_boilerplate",
    f"""
    WITH h AS (SELECT doc_id, {_DUCK_WRAPPED_HTML} AS html FROM documents),
    x AS (SELECT doc_id, {_duck_html_extract("html")} AS txt FROM h),
    x2 AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM x),
    lines AS (
      SELECT doc_id, i AS pos, ls[i + 1] AS line
      FROM x2, UNNEST(range(0, len(ls))) AS t(i)),
    boiler AS (
      SELECT lh FROM (
        SELECT DISTINCT doc_id, md5(trim(line, ' ')) AS lh
        FROM lines WHERE length(trim(line, ' ')) >= 1)
      GROUP BY lh HAVING COUNT(*) > 2),
    kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM lines l LEFT JOIN boiler b
        ON length(trim(l.line, ' ')) >= 1
           AND md5(trim(l.line, ' ')) = b.lh
      WHERE b.lh IS NULL),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS txt
      FROM kept GROUP BY doc_id),
    final AS (
      SELECT d.doc_id, COALESCE(r.txt, '') AS txt
      FROM (SELECT doc_id FROM documents) d
      LEFT JOIN rebuilt r USING (doc_id))
    SELECT doc_id, md5(txt) AS clean_md5,
           CAST(length(txt) AS BIGINT) AS clean_len,
           CAST(len(list_filter(string_split(txt, chr(10)),
                                x -> x <> '')) AS INT) AS n_lines
    FROM final
    """,
    "C4-style line-level boilerplate removal composed with HTML "
    "extraction: lines (blocks) appearing in > 2 distinct documents — "
    "the shared nav/tail/footer every synthesized page carries — are "
    "removed corpus-wide and documents rebuilt in line order; exact "
    "oracle replays the extraction chain + distinct-doc line counts",
    "curation: line-level boilerplate removal (cross-document)",
)
def q_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import curation as _cur

    d = t(spark, sf_dir, "documents")
    html = _wrapped_html()
    extracted = d.select(
        "doc_id", _text.html_extract(html).alias("text")
    )
    clean = _cur.drop_frequent_lines(extracted, max_docs=2)
    return clean.select(
        "doc_id",
        F.md5("text").alias("clean_md5"),
        F.length("text").cast("long").alias("clean_len"),
        F.size(
            F.filter(F.split("text", "\n", -1), lambda x: x != "")
        ).alias("n_lines"),
    )


@_register(
    "q_calibration_report",
    """
    WITH scored AS (
      SELECT ('0x' || substring(md5('s' || CAST(event_id AS VARCHAR)),
                                1, 6))::INT / 16777216.0 AS s,
             CASE WHEN ('0x' || substring(
                          md5('y' || CAST(event_id AS VARCHAR)),
                          1, 6))::INT / 16777216.0
                       < ('0x' || substring(
                            md5('s' || CAST(event_id AS VARCHAR)),
                            1, 6))::INT / 16777216.0
                  THEN 1 ELSE 0 END AS y
      FROM events),
    per_bin AS (
      SELECT LEAST(CAST(FLOOR(s * 10) AS INT), 9) AS bin,
             COUNT(*) AS n, SUM(s) AS sum_s, SUM(y) AS sum_y
      FROM scored GROUP BY 1),
    tot AS (
      SELECT SUM(n) AS N, SUM(ABS(sum_y - sum_s)) AS ece_num
      FROM per_bin)
    SELECT p.bin, CAST(p.n AS BIGINT) AS n,
           ROUND(p.sum_s / p.n, 6) AS conf,
           ROUND(p.sum_y::DOUBLE / p.n, 6) AS acc,
           CAST(0 AS BIGINT) AS n_excluded,
           ROUND(t.ece_num / t.N, 6) AS ece
    FROM per_bin p CROSS JOIN tot t
    ORDER BY p.bin
    """,
    "reliability diagram + expected calibration error over a "
    "synthesized perfectly-calibrated-in-expectation classifier "
    "(md5-fraction scores, Bernoulli(score) labels from an "
    "independent md5 fraction — both exact binary fractions, so the "
    "engines agree bit-for-bit); ECE from exact per-bin sums, one "
    "division at the end",
    "eval: calibration / reliability (ECE)",
)
def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        calibration_report,
    )

    ev = t(spark, sf_dir, "events").select("event_id")

    def frac(prefix: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(prefix), F.col("event_id").cast("string")
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(16777216.0)
        )

    scored = ev.select(
        frac("s").alias("score"),
        (frac("y") < frac("s")).cast("bigint").alias("label"),
    )
    return calibration_report(scored, score="score", label="label", bins=10)


# ------------------------------------------------------------------
# Crawl-container ingestion (sources/crawl.py): WARC + JSON-lines
# readers — the actual first step of the RefinedWeb/C4 pipeline the
# curation operators model.  Fixtures are synthesized FROM the
# documents table with Spark itself (distributed write, no driver
# loop), cached per (app, sf); the oracles recompute the expected
# admitted rows directly from the table, so the whole container
# round-trip (record framing, header parse, corrupt/ non-response/
# non-200 rejection, HTML extraction) is exact-checked cross-engine.
# ------------------------------------------------------------------

from sample_dms_s3_kinesis_spark.sources import crawl as _crawl  # noqa: E402

_CRAWL_FIXTURE_CACHE: dict = {}


# charset-fixture prefixes: non-ASCII, encodable in the declared
# charset (Latin-1 covers U+00A0-U+00FF only — no em-dash), shared
# verbatim by the binary writer and the DuckDB oracle
_CS_PREFIX_L1 = "café ñ £ "
_CS_PREFIX_SJ = "こんにちは "
# meta declarations for the sniffing variants — part of the BODY text
# (the prescan reads them, the decode keeps them)
_CS_META_L1 = '<meta charset="ISO-8859-1">'
_CS_META_SJ = (
    '<meta http-equiv="Content-Type" '
    'content="text/html; charset=Shift_JIS">'
)


def _crawl_fixture(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Write the JSONL / WARC fixture for ``sf_dir`` once per app and
    return its directory.  Deterministic: contents derive only from the
    documents table, so the oracle can predict every record."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    path = _CRAWL_FIXTURE_CACHE.get(key)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix=f"crawl-{kind}-")
        out = f"{path}/data"
        d = t(spark, sf_dir, "documents")
        if kind == "warc_enc":
            # HTTP-encoded .warc.gz containers: doc_id % 5 selects the
            # body coding (0 plain, 1 chunked, 2 gzip, 3 chunked+gzip,
            # 4 deflate).  Compressed members need REAL codec bytes,
            # which no Spark sink emits — each partition writes one
            # multi-member .warc.gz via the Python record builder
            # (executor-local file I/O: fine for a local-mode test
            # fixture; production WARC spill would go through an
            # object-store client).
            import os as _os

            _os.makedirs(out, exist_ok=True)
            rows = d.select("doc_id", "source", _wrapped_html().alias("html"))

            def _write_part(it):
                import gzip as _gz
                import zlib as _zlib

                from pyspark import TaskContext

                recs = []
                for r in it:
                    uri = (
                        f"https://{r['source']}.example.com/p/"
                        f"{r['doc_id']}"
                    )
                    body = r["html"].encode()
                    v = r["doc_id"] % 5
                    te = "chunked" if v in (1, 3) else None
                    ce = (
                        "gzip"
                        if v in (2, 3)
                        else ("deflate" if v == 4 else None)
                    )
                    if ce == "gzip":
                        body = _gz.compress(body, mtime=0)
                    elif ce == "deflate":
                        body = _zlib.compress(body)
                    if te:
                        body = _crawl.http_chunk_bytes(body, 512)
                    recs.append(
                        _gz.compress(
                            _crawl.warc_response_record_bytes(
                                uri,
                                body,
                                transfer_encoding=te,
                                content_encoding=ce,
                            ),
                            mtime=0,
                        )
                    )
                if recs:
                    pid = TaskContext.get().partitionId()
                    with open(
                        f"{out}/part-{pid:05d}.warc.gz", "wb"
                    ) as f:
                        f.write(b"".join(recs))

            rows.repartition(8).foreachPartition(_write_part)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_enc_rej":
            # Reject-reason observability fixture: doc_id % 8 selects
            # the coding (0 plain, 1 chunked, 2 gzip, 3 chunked+gzip,
            # 4 deflate, 5 br, 6 zstd, 7 unsupported — split by
            # doc_id % 16: 7 -> Content-Encoding 'compress', 15 ->
            # Transfer-Encoding 'gzip'), and doc_id % 32 < 8 corrupts
            # variants 1-3 (broken chunk size line / truncated gzip)
            # so every reject reason appears at an oracle-predictable
            # key set.  br/zstd bodies carry REAL codec bytes when the
            # optional package is importable, raw bytes otherwise (the
            # decoder never touches them without the package).
            import os as _os

            _os.makedirs(out, exist_ok=True)
            rows = d.select("doc_id", "source", _wrapped_html().alias("html"))

            def _write_rej_part(it):
                import gzip as _gz
                import zlib as _zlib

                from pyspark import TaskContext

                br = _crawl._load_brotli()
                zc = None
                if _crawl._load_zstd() is not None:
                    try:
                        from compression import zstd as _zs

                        zc = _zs.compress
                    except ImportError:
                        import zstandard as _zs

                        zc = _zs.ZstdCompressor().compress
                recs = []
                for r in it:
                    uri = (
                        f"https://{r['source']}.example.com/p/"
                        f"{r['doc_id']}"
                    )
                    body = r["html"].encode()
                    v = r["doc_id"] % 8
                    corrupt = r["doc_id"] % 32 < 8
                    te = "chunked" if v in (1, 3) else None
                    ce = {
                        2: "gzip",
                        3: "gzip",
                        4: "deflate",
                        5: "br",
                        6: "zstd",
                    }.get(v)
                    if v == 7:
                        if r["doc_id"] % 16 == 7:
                            ce = "compress"
                        else:
                            te = "gzip"
                    if ce == "gzip":
                        body = _gz.compress(body, mtime=0)
                        if v == 2 and corrupt:
                            body = body[:-4]  # CRC/length trailer gone
                    elif ce == "deflate":
                        body = _zlib.compress(body)
                    elif ce == "br" and br is not None:
                        body = br.compress(body)
                    elif ce == "zstd" and zc is not None:
                        body = zc(body)
                    if te == "chunked":
                        body = _crawl.http_chunk_bytes(body, 512)
                        if corrupt:
                            body = b"Z" + body[1:]  # size line broken
                    recs.append(
                        _gz.compress(
                            _crawl.warc_response_record_bytes(
                                uri,
                                body,
                                transfer_encoding=te,
                                content_encoding=ce,
                            ),
                            mtime=0,
                        )
                    )
                if recs:
                    pid = TaskContext.get().partitionId()
                    with open(
                        f"{out}/part-{pid:05d}.warc.gz", "wb"
                    ) as f:
                        f.write(b"".join(recs))

            rows.repartition(8).foreachPartition(_write_rej_part)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_charset":
            # Charset-sniff + transcode fixture: doc_id % 12 selects
            # how the encoding is declared (0 none, 1 explicit utf-8
            # header, 2 header Latin-1, 3 header Shift-JIS, 4 header
            # unknown, 5 header Latin-1 under gzip, 6 META Latin-1,
            # 7 META http-equiv Shift-JIS, 8 UTF-8 BOM, 9 UTF-16LE
            # BOM, 10 UTF-8 BOM vs a WRONG Latin-1 header — BOM wins,
            # 11 META Latin-1 under gzip).  Non-UTF-8 variants carry a
            # non-ASCII prefix so the transcode is observable (the
            # corpus text itself is ASCII), and their bytes REALLY are
            # the declared encoding — which no Spark sink emits, so
            # the binary per-partition writer (same shape as warc_enc).
            import os as _os

            _os.makedirs(out, exist_ok=True)
            rows = d.select("doc_id", "source", _wrapped_html().alias("html"))

            def _write_cs_part(it):
                import gzip as _gz

                from pyspark import TaskContext

                recs = []
                for r in it:
                    uri = (
                        f"https://{r['source']}.example.com/p/"
                        f"{r['doc_id']}"
                    )
                    v = r["doc_id"] % 12
                    ce = "gzip" if v in (5, 11) else None
                    ct = {
                        1: "text/html; charset=UTF-8",
                        2: "text/html; charset=ISO-8859-1",
                        3: 'text/html; charset="Shift_JIS"',
                        4: "text/html; charset=x-unknown-8bit",
                        5: "text/html; charset=ISO-8859-1",
                        10: "text/html; charset=ISO-8859-1",
                    }.get(v, "text/html")
                    if v in (2, 5):
                        body = (_CS_PREFIX_L1 + r["html"]).encode(
                            "iso-8859-1"
                        )
                    elif v == 3:
                        body = (_CS_PREFIX_SJ + r["html"]).encode(
                            "shift_jis"
                        )
                    elif v in (6, 11):
                        body = (
                            _CS_META_L1 + _CS_PREFIX_L1 + r["html"]
                        ).encode("iso-8859-1")
                    elif v == 7:
                        body = (
                            _CS_META_SJ + _CS_PREFIX_SJ + r["html"]
                        ).encode("shift_jis")
                    elif v == 8:
                        body = b"\xef\xbb\xbf" + r["html"].encode()
                    elif v == 9:
                        # Python utf-16 emits the LE BOM first
                        body = (_CS_PREFIX_L1 + r["html"]).encode(
                            "utf-16"
                        )
                    elif v == 10:
                        body = b"\xef\xbb\xbf" + (
                            _CS_PREFIX_L1 + r["html"]
                        ).encode()
                    else:
                        body = r["html"].encode()
                    if ce == "gzip":
                        body = _gz.compress(body, mtime=0)
                    recs.append(
                        _gz.compress(
                            _crawl.warc_response_record_bytes(
                                uri,
                                body,
                                http_content_type=ct,
                                content_encoding=ce,
                            ),
                            mtime=0,
                        )
                    )
                if recs:
                    pid = TaskContext.get().partitionId()
                    with open(
                        f"{out}/part-{pid:05d}.warc.gz", "wb"
                    ) as f:
                        f.write(b"".join(recs))

            rows.repartition(8).foreachPartition(_write_cs_part)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_redirect":
            # Redirect topology, doc_id % 8 selects the role (hosts
            # rotate doc_id % 3 so chains hop ACROSS hosts):
            #   0/1/2 -> 301/302/307 with an absolute Location to
            #            url(doc_id+1): the 3-hop chain 8k->8k+3;
            #   3     -> 200 page (chain landing);
            #   4     -> 301 with a ROOT-RELATIVE Location
            #            ("/r/{id}?v=2" — RFC 7231 allows it; resolves
            #            against the request URI);
            #   5/6   -> 302s at each other: the 2-cycle the hop bound
            #            must cut;
            #   7     -> 404, no Location (redirect_edges ignores it).
            did = F.col("doc_id").cast("string")
            g = F.col("doc_id") % 8

            def _rurl(i):
                return F.concat(
                    F.lit("https://h"),
                    (i % 3).cast("string"),
                    F.lit(".example.com/r/"),
                    i.cast("string"),
                )

            url = _rurl(F.col("doc_id"))
            loc = (
                F.when(g.isin(0, 1, 2, 5), _rurl(F.col("doc_id") + 1))
                .when(g == 4, F.concat(F.lit("/r/"), did, F.lit("?v=2")))
                .when(g == 6, _rurl(F.col("doc_id") - 1))
            )
            status = (
                F.when(g == 0, 301)
                .when(g == 1, 302)
                .when(g == 2, 307)
                .when(g == 4, 301)
                .when(g.isin(5, 6), 302)
                .when(g == 7, 404)
                .otherwise(200)
            )
            body = F.when(g == 3, _wrapped_html()).otherwise(
                F.lit("<html><body>moved</body></html>")
            )
            lines = d.select(
                F.when(
                    loc.isNotNull(),
                    _crawl.warc_response_record(
                        target_uri=url,
                        body=body,
                        http_status=status,
                        extra_http_headers=(
                            F.concat(F.lit("Location: "), loc),
                        ),
                    ),
                )
                .otherwise(
                    _crawl.warc_response_record(
                        target_uri=url, body=body, http_status=status
                    )
                )
                .alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_val":
            # Cache-validator fixture: doc_id % 3 selects the header
            # set (0: quoted ETag + Last-Modified, 1: weak W/ ETag
            # only, 2: neither) — the raw forms RFC 7232 compares
            # byte-wise, at oracle-predictable values.
            did = F.col("doc_id").cast("string")
            uri = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            ss = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
            v = F.col("doc_id") % 3
            body = F.lit("<html><body>validator page</body></html>")
            etag_strong = F.concat(
                F.lit('ETag: "e-'), did, F.lit('"')
            )
            etag_weak = F.concat(
                F.lit('ETag: W/"e-'), did, F.lit('"')
            )
            lm = F.concat(
                F.lit("Last-Modified: Mon, 01 Jan 2024 00:00:"),
                ss,
                F.lit(" GMT"),
            )
            lines = d.select(
                F.when(
                    v == 0,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        extra_http_headers=(etag_strong, lm),
                    ),
                )
                .when(
                    v == 1,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        extra_http_headers=(etag_weak,),
                    ),
                )
                .otherwise(
                    _crawl.warc_response_record(
                        target_uri=uri, body=body
                    )
                )
                .alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_robots":
            # On-page robots fixture: doc_id % 6 selects the directive
            # channel (0 none, 1 meta noindex, 2 meta nofollow,
            # 3 meta "noindex, nofollow", 4 X-Robots-Tag: noindex
            # header, 5 X-Robots-Tag: none header); every page carries
            # one anchor so a frontier consumer can observe nofollow.
            did = F.col("doc_id").cast("string")
            uri = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            v = F.col("doc_id") % 6
            meta = (
                F.when(
                    v == 1,
                    F.lit('<meta name="robots" content="noindex">'),
                )
                .when(
                    v == 2,
                    F.lit('<meta name="robots" content="nofollow">'),
                )
                .when(
                    v == 3,
                    F.lit(
                        '<meta name="robots" '
                        'content="noindex, nofollow">'
                    ),
                )
                .otherwise(F.lit(""))
            )
            body = F.concat(
                F.lit("<html><head>"),
                meta,
                F.lit('</head><body><a href="/next/'),
                did,
                F.lit('">n</a><p>robots page</p></body></html>'),
            )
            xr = F.when(
                v == 4, F.lit("X-Robots-Tag: noindex")
            ).otherwise(F.lit("X-Robots-Tag: none"))
            lines = d.select(
                F.when(
                    v >= 4,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        extra_http_headers=(xr,),
                    ),
                )
                .otherwise(
                    _crawl.warc_response_record(
                        target_uri=uri, body=body
                    )
                )
                .alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_backoff":
            # Rate-limit fixture: doc_id % 5 selects the response
            # (0/4: 200 page — the schedulable frontier; 1: 429 with
            # delta-seconds Retry-After 60+(doc_id%7)*10; 2: 503 with
            # an IMF-fixdate Retry-After (2+doc_id%4) minutes past the
            # pinned now of 2024-02-01 00:00:00, Feb 1 2024 = Thu;
            # 3: 429 with NO Retry-After — default penalty).
            did = F.col("doc_id").cast("string")
            uri = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            v = F.col("doc_id") % 5
            body = F.lit("<html><body>rate page</body></html>")
            ra_delta = F.concat(
                F.lit("Retry-After: "),
                (F.lit(60) + (F.col("doc_id") % 7) * 10).cast("string"),
            )
            mm = F.lpad(
                (F.lit(2) + F.col("doc_id") % 4).cast("string"), 2, "0"
            )
            ra_date = F.concat(
                F.lit("Retry-After: Thu, 01 Feb 2024 00:"),
                mm,
                F.lit(":00 GMT"),
            )
            lines = d.select(
                F.when(
                    v == 1,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        http_status=F.lit(429),
                        extra_http_headers=(ra_delta,),
                    ),
                )
                .when(
                    v == 2,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        http_status=F.lit(503),
                        extra_http_headers=(ra_date,),
                    ),
                )
                .when(
                    v == 3,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=body,
                        http_status=F.lit(429),
                    ),
                )
                .otherwise(
                    _crawl.warc_response_record(
                        target_uri=uri, body=body
                    )
                )
                .alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "warc_mime":
            # Content-type fixture: doc_id % 6 selects the declared
            # media type (0 text/html; 1 TEXT/HTML + charset=UTF-8 —
            # case + parameter fold; 2 text/plain; 3 application/pdf;
            # 4 application/json; 5 image/png) — every body is the
            # same text page, so the ONLY discriminator is the header,
            # exactly the r14 hazard (declared binary whose bytes
            # happen to decode).
            did = F.col("doc_id").cast("string")
            uri = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            v = F.col("doc_id") % 6
            body = F.concat(
                F.lit("<html><body><p>typed page "),
                did,
                F.lit("</p></body></html>"),
            )

            def _rec(ct: str):
                return _crawl.warc_response_record(
                    target_uri=uri, body=body, http_content_type=ct
                )

            lines = d.select(
                F.when(v == 0, _rec("text/html"))
                .when(v == 1, _rec("TEXT/HTML ; charset=UTF-8"))
                .when(v == 2, _rec("text/plain"))
                .when(v == 3, _rec("application/pdf"))
                .when(v == 4, _rec("application/json"))
                .otherwise(_rec("image/png"))
                .alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "cdx_hist":
            # Three-capture history per doc for the recrawl scheduler:
            # Jan 1 (digest v1), Mar 15 (current digest), May 20
            # (changed AGAIN for doc_id % 3 == 0, unchanged otherwise)
            # — so a third of the keys show 2 observed changes and the
            # rest 1, at oracle-predictable timestamps (the seconds
            # field is doc_id % 60, identical across captures, so
            # spans are exact whole days).
            did = F.col("doc_id").cast("string")
            urlkey = F.concat(
                F.lit("com,"), F.col("source"), F.lit(")/p/"), did
            )
            url = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            ss = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")

            def _hline(ts_prefix, digest):
                js = F.to_json(
                    F.struct(
                        url.alias("url"),
                        F.lit("200").alias("status"),
                        digest.alias("digest"),
                    )
                )
                return F.concat(
                    urlkey,
                    F.lit(" "),
                    F.concat(F.lit(ts_prefix), ss),
                    F.lit(" "),
                    js,
                )

            l1 = _hline(
                "202401010000",
                F.md5(F.concat(F.col("text"), F.lit("v1"))),
            )
            l2 = _hline("202403150000", F.md5(F.col("text")))
            l3 = _hline(
                "202405200000",
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.md5(F.concat(F.col("text"), F.lit("v3"))),
                ).otherwise(F.md5(F.col("text"))),
            )
            lines = d.select(
                F.explode(F.array(l1, l2, l3)).alias("value")
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "cdx":
            # CDXJ index sidecar: TWO captures per doc (an older 'v1'
            # content digest, then the current one ~10 weeks later);
            # every 29th doc's SECOND capture line is truncated by one
            # char (malformed JSON -> rejects channel), so for those
            # urlkeys the latest VALID capture is the older one
            did = F.col("doc_id").cast("string")
            urlkey = F.concat(
                F.lit("com,"), F.col("source"), F.lit(")/p/"), did
            )
            url = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                did,
            )
            status = F.when(
                F.col("doc_id") % 13 == 0, F.lit("404")
            ).otherwise(F.lit("200"))
            ss = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")

            def _line(ts_prefix, digest):
                js = F.to_json(
                    F.struct(
                        url.alias("url"),
                        status.alias("status"),
                        digest.alias("digest"),
                        F.col("n_chars").cast("string").alias("length"),
                    )
                )
                return F.concat(
                    urlkey,
                    F.lit(" "),
                    F.concat(F.lit(ts_prefix), ss),
                    F.lit(" "),
                    js,
                )

            l1 = _line(
                "202401010000", F.md5(F.concat(F.col("text"), F.lit("v1")))
            )
            lines = (
                d.withColumn(
                    "_l2", _line("202403150000", F.md5(F.col("text")))
                )
                .withColumn(
                    "_l2",
                    F.when(
                        F.col("doc_id") % 29 == 0,
                        F.expr("substring(_l2, 1, length(_l2) - 1)"),
                    ).otherwise(F.col("_l2")),
                )
                .select(
                    F.explode(F.array(l1, F.col("_l2"))).alias("value")
                )
            )
            lines.write.mode("overwrite").text(out)
            _CRAWL_FIXTURE_CACHE[key] = path
            return out
        if kind == "jsonl":
            # one JSON object per doc; every 37th line is truncated by
            # one character (drops the closing brace -> malformed), so
            # the corrupt channel is exercised at a known key set
            lines = d.select(
                F.col("doc_id"),
                F.to_json(F.struct("doc_id", "text", "lang", "source")).alias(
                    "_js"
                ),
            ).select(
                F.when(
                    F.col("doc_id") % 37 == 0,
                    F.expr("substring(_js, 1, length(_js) - 1)"),
                )
                .otherwise(F.col("_js"))
                .alias("value")
            )
        else:
            # WARC: every 11th doc ships only a request record (filter
            # coverage), every 13th a 404 response (status coverage),
            # every 17th a CHUNKED-transfer-coded 200 (the decode
            # branch — warc_responses must reassemble the entity or
            # these docs digest wrong / go missing vs the oracle),
            # the rest plain 200 responses with the synthesized HTML
            uri = F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
            )
            lines = d.select(
                F.when(
                    F.col("doc_id") % 11 == 0,
                    _crawl.warc_request_record(target_uri=uri),
                )
                .when(
                    F.col("doc_id") % 13 == 0,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=F.lit("<html><body>404 not found</body></html>"),
                        http_status=F.lit(404),
                    ),
                )
                .when(
                    F.col("doc_id") % 17 == 0,
                    _crawl.warc_response_record(
                        target_uri=uri,
                        body=_crawl.http_chunked_body(
                            _wrapped_html(), chunk_chars=256
                        ),
                        extra_http_headers=(
                            "Transfer-Encoding: chunked",
                        ),
                    ),
                )
                .otherwise(
                    _crawl.warc_response_record(target_uri=uri, body=_wrapped_html())
                )
                .alias("value")
            )
        from sample_dms_s3_kinesis_spark.operators.partitioning import spread

        # one part file per core: record-per-row framing makes the row
        # order irrelevant (every consumer is set-based), and the read
        # side — lineSep text or one-task-per-file gz — parallelizes by
        # file count
        writer = spread(lines).write.mode("overwrite")
        if kind == "warc_gz":
            # whole-file gzip members via the sink codec — the
            # non-splittable container shape read_warc_gz targets
            writer = writer.option("compression", "gzip")
        writer.text(out)
        _CRAWL_FIXTURE_CACHE[key] = path
    return f"{path}/data"


@_register(
    "q_jsonl_ingest",
    """
    SELECT doc_id, md5(text) AS text_md5, lang, source,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE doc_id % 37 = 0) AS n_rejects
    FROM documents
    WHERE doc_id % 37 <> 0
    """,
    "JSON-lines crawl-container ingestion: write the corpus as a JSONL "
    "dump (one truncated line per 37 docs), read it back schema-on-read "
    "through sources/crawl.read_jsonl, split the corrupt-line rejects "
    "channel, and return the admitted records (text digested) plus the "
    "reject count; oracle recomputes both directly from the table",
    "crawl ingestion: JSONL container (reference parity: containerized "
    "files from object storage bound schema-on-read, run.py:162-164)",
)
def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "jsonl")
    df = _crawl.read_jsonl(
        spark, path, "doc_id long, text string, lang string, source string"
    )
    records = _crawl.jsonl_records(df)
    n_rejects = _crawl.jsonl_rejects(df).agg(
        F.count(F.lit(1)).alias("n_rejects")
    )
    return records.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "lang",
        "source",
    ).crossJoin(F.broadcast(n_rejects))


@_register(
    "q_cdx_ingest",
    """
    SELECT 'com,' || source || ')/p/' || CAST(doc_id AS VARCHAR)
             AS urlkey,
           CASE WHEN doc_id % 29 = 0
                THEN '202401010000' ELSE '202403150000' END
             || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             AS capture_ts,
           CASE WHEN doc_id % 13 = 0 THEN '404' ELSE '200' END
             AS status,
           CASE WHEN doc_id % 29 = 0 THEN md5(text || 'v1')
                ELSE md5(text) END AS digest,
           CAST(CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 2 END AS BIGINT)
             AS n_captures,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE doc_id % 29 = 0) AS n_rejects
    FROM documents
    """,
    "CDX crawl-index ingestion + latest-capture selection: the corpus "
    "framed as a CDXJ index sidecar (two captures per URL, one "
    "truncated line per 29 docs), read back schema-on-read through "
    "read_cdx, malformed lines split to the rejects channel, and "
    "cdx_latest_captures picks the newest VALID capture per urlkey — "
    "the index-side selection a real corpus build runs before "
    "touching any WARC byte; oracle recomputes every row from the "
    "table (corrupted second captures fall back to the older digest)",
    "crawl ingestion: CDX index sidecar + latest-capture selection",
)
def q_cdx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "cdx")
    df = _crawl.read_cdx(
        spark,
        path,
        "url string, status string, digest string, length string",
    )
    records = _crawl.jsonl_records(df)
    latest = _crawl.cdx_latest_captures(records)
    n_rejects = _crawl.jsonl_rejects(df).agg(
        F.count(F.lit(1)).alias("n_rejects")
    )
    return latest.select(
        "urlkey",
        "capture_ts",
        "status",
        "digest",
        "n_captures",
    ).crossJoin(F.broadcast(n_rejects))


# Shared oracle for both WARC ingest flavors (text fold and gz): the
# container round-trip must reproduce exactly the 200-response
# survivors and their extraction digests, whatever the container
# encoding.
_WARC_INGEST_ORACLE = f"""
    WITH h AS (SELECT doc_id, source, {_DUCK_WRAPPED_HTML} AS html
               FROM documents
               WHERE doc_id % 11 <> 0 AND doc_id % 13 <> 0),
    x AS (SELECT doc_id, source, {_duck_html_extract("html")} AS extracted
          FROM h)
    SELECT doc_id,
           'https://' || source || '.example.com/p/'
             || CAST(doc_id AS VARCHAR) AS target_uri,
           CAST(200 AS INT) AS http_status,
           md5(extracted) AS extracted_md5,
           CAST(length(extracted) AS BIGINT) AS extracted_len
    FROM x
    """


def _warc_ingest_result(responses: DataFrame) -> DataFrame:
    """Shared tail of the WARC ingest queries: intact 200 responses →
    (doc_id from URI, extraction digest)."""
    extracted = responses.filter(
        F.col("length_ok") & (F.col("http_status") == 200)
    ).select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        "target_uri",
        "http_status",
        _text.html_extract(F.col("body")).alias("extracted"),
    )
    return extracted.select(
        "doc_id",
        "target_uri",
        "http_status",
        F.md5("extracted").alias("extracted_md5"),
        F.length("extracted").cast("long").alias("extracted_len"),
    )


@_register(
    "q_warc_ingest",
    _WARC_INGEST_ORACLE,
    "WARC crawl-container ingestion: frame the corpus as WARC response/"
    "request records (Spark-built, text-sink written), fold records "
    "back out of the container via the lineSep boundary split, keep "
    "only intact 200 responses, extract page text from the HTTP body "
    "and digest it; oracle recomputes the surviving doc set and the "
    "extraction chain straight from the table",
    "crawl ingestion: WARC container (text-source fold; html_extract "
    "chain is the q_html_extract oracle twin)",
)
def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc")
    return _warc_ingest_result(
        _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    )


@_register(
    "q_warc_gz_ingest",
    _WARC_INGEST_ORACLE,
    "gzip-WARC crawl-container ingestion: the same record set framed "
    "into .warc.gz containers (sink gzip codec, non-splittable — one "
    "task per file) and read back through the binaryFile+mapInPandas "
    "path; identical oracle to q_warc_ingest, so the Python parse "
    "twin is exact-checked cross-engine, not just frame-equivalent",
    "crawl ingestion: gzip WARC container (file-granularity "
    "parallelism, streaming member decompression)",
)
def q_warc_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_gz")
    return _warc_ingest_result(
        _crawl.warc_responses(_crawl.read_warc_gz(spark, path))
    )


@_register(
    "q_warc_encoded_ingest",
    f"""
    WITH h AS (SELECT doc_id, source, {_DUCK_WRAPPED_HTML} AS html
               FROM documents),
    x AS (SELECT doc_id, source, {_duck_html_extract("html")} AS extracted
          FROM h)
    SELECT doc_id,
           'https://' || source || '.example.com/p/'
             || CAST(doc_id AS VARCHAR) AS target_uri,
           CASE WHEN doc_id % 5 IN (1, 3) THEN 'chunked' END
             AS http_transfer_encoding,
           CASE WHEN doc_id % 5 IN (2, 3) THEN 'gzip'
                WHEN doc_id % 5 = 4 THEN 'deflate' END
             AS http_content_encoding,
           md5(extracted) AS extracted_md5,
           CAST(length(extracted) AS BIGINT) AS extracted_len
    FROM x
    """,
    "HTTP-encoded WARC ingestion: every doc framed into .warc.gz with "
    "doc_id%5 selecting the body coding (plain / chunked / gzip / "
    "chunked+gzip / deflate), read back through read_warc_gz("
    "binary_payload=True) and decoded by warc_responses — Catalyst "
    "chunked fold, Arrow decompressors, RFC decode order — then the "
    "standard extraction digest.  The oracle recomputes every row "
    "straight from the table, so a decode fault in ANY coding variant "
    "hash-mismatches; coverage the real Common Crawl corpus shape "
    "requires",
    "crawl ingestion: HTTP-encoded bodies (chunked / gzip / both)",
)
def q_warc_encoded_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_enc")
    resp = _crawl.warc_responses(
        _crawl.read_warc_gz(spark, path, binary_payload=True)
    )
    extracted = resp.filter(
        F.col("length_ok")
        & (F.col("http_status") == 200)
        & F.col("body").isNotNull()
    ).select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        "target_uri",
        "http_transfer_encoding",
        "http_content_encoding",
        _text.html_extract(F.col("body")).alias("extracted"),
    )
    return extracted.select(
        "doc_id",
        "target_uri",
        "http_transfer_encoding",
        "http_content_encoding",
        F.md5("extracted").alias("extracted_md5"),
        F.length("extracted").cast("long").alias("extracted_len"),
    )


_HAS_BR = _crawl._load_brotli() is not None
_HAS_ZSTD = _crawl._load_zstd() is not None


@_register(
    "q_warc_reject_reasons",
    f"""
    WITH v AS (
      SELECT doc_id % 8 AS v, doc_id % 16 AS v16,
             (doc_id % 32 < 8) AS corrupt
      FROM documents),
    m AS (
      SELECT CASE WHEN v IN (1, 3) THEN 'chunked'
                  WHEN v = 7 AND v16 = 15 THEN 'gzip' END
               AS http_transfer_encoding,
             CASE WHEN v IN (2, 3) THEN 'gzip'
                  WHEN v = 4 THEN 'deflate'
                  WHEN v = 5 THEN 'br'
                  WHEN v = 6 THEN 'zstd'
                  WHEN v = 7 AND v16 = 7 THEN 'compress' END
               AS http_content_encoding,
             CASE WHEN v IN (1, 3) AND corrupt
                    THEN 'bad_chunked_framing'
                  WHEN v = 2 AND corrupt THEN 'decompress_failed'
                  WHEN v = 5 AND NOT {str(_HAS_BR).upper()}
                    THEN 'br_unavailable'
                  WHEN v = 6 AND NOT {str(_HAS_ZSTD).upper()}
                    THEN 'zstd_unavailable'
                  WHEN v = 7 AND v16 = 7
                    THEN 'unsupported_content_encoding'
                  WHEN v = 7 AND v16 = 15
                    THEN 'unsupported_transfer_encoding'
             END AS body_reject_reason
      FROM v)
    SELECT http_transfer_encoding, http_content_encoding,
           body_reject_reason,
           CAST(count(*) AS BIGINT) AS n_responses,
           CAST(sum(CASE WHEN body_reject_reason IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
    FROM m
    GROUP BY 1, 2, 3
    """,
    "per-coding decode observability: the corpus framed into .warc.gz "
    "with doc_id%8 selecting the body coding (plain / chunked / gzip "
    "/ chunked+gzip / deflate / br / zstd / unsupported) and "
    "doc_id%32<8 corrupting variants 1-3, read back through "
    "read_warc_gz(binary_payload=True) + warc_responses, then grouped "
    "on (transfer-coding, content-coding, body_reject_reason) — the "
    "funnel report a corpus owner reads to see exactly WHAT a crawl "
    "ingest loses and why (br pages on a brotli-less cluster, corrupt "
    "members, exotic codings).  The oracle recomputes every group "
    "from doc_id arithmetic, with the optional-codec availability "
    "flags embedded at import (brotli/zstd decode exactly when their "
    "package is importable; absent packages reject with the distinct "
    "*_unavailable reason, never a silent NULL)",
    "crawl ingestion: per-coding reject-reason funnel (br/zstd "
    "optional-codec observability)",
)
def q_warc_reject_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_enc_rej")
    resp = _crawl.warc_responses(
        _crawl.read_warc_gz(spark, path, binary_payload=True)
    )
    return resp.groupBy(
        "http_transfer_encoding",
        "http_content_encoding",
        "body_reject_reason",
    ).agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.sum(F.col("body").isNotNull().cast("long")).alias("n_decoded"),
    )


@_register(
    "q_redirect_frontier",
    """
    WITH RECURSIVE
    base AS (SELECT doc_id AS d, doc_id % 8 AS g, doc_id % 3 AS h
             FROM documents),
    edges AS (
      SELECT 'https://h' || h || '.example.com/r/' || d AS src,
             CASE WHEN g IN (0, 1, 2, 5)
                    THEN 'https://h' || ((d + 1) % 3)
                         || '.example.com/r/' || (d + 1)
                  WHEN g = 4
                    THEN 'https://h' || h || '.example.com/r/' || d
                         || '?v=2'
                  WHEN g = 6
                    THEN 'https://h' || ((d - 1) % 3)
                         || '.example.com/r/' || (d - 1)
             END AS dst
      FROM base WHERE g IN (0, 1, 2, 4, 5, 6)),
    walk AS (
      SELECT src AS url, dst AS cur, 1 AS hops FROM edges
      UNION ALL
      SELECT w.url, e.dst, w.hops + 1
      FROM walk w JOIN edges e ON w.cur = e.src
      WHERE w.hops < 6),
    fin AS (
      SELECT url, arg_max(cur, hops) AS final_url,
             CAST(max(hops) AS BIGINT) AS hops
      FROM walk GROUP BY url)
    SELECT f.url, f.final_url, f.hops,
           f.final_url NOT IN (SELECT src FROM edges) AS resolved,
           regexp_extract(f.url, 'https://([^/]+)', 1)
             <> regexp_extract(f.final_url, 'https://([^/]+)', 1)
             AS cross_host
    FROM fin f
    """,
    "redirect-chain frontier resolution: the corpus framed into WARC "
    "with doc_id%8 selecting the role (3-hop 301/302/307 chains across "
    "rotating hosts, a root-relative Location per RFC 7231, a 2-cycle "
    "loop, a Location-less 404), read back through read_warc_records + "
    "warc_responses (NEW http_location column), 3xx edges resolved "
    "against the request URI by crawl.redirect_edges, chains collapsed "
    "by urls.follow_redirects under a 6-hop bound — per source URL the "
    "landing URL, hop count, resolved flag (false = the loop the bound "
    "cut) and whether the chain crossed hosts.  The oracle recomputes "
    "the walk with a recursive CTE over the same doc_id-arithmetic "
    "edge set, so a fault in Location parsing, relative resolution, "
    "the walk, or the loop bound hash-mismatches",
    "crawl ingestion: redirect chains -> frontier (real crawls are "
    "~20-30% redirects)",
)
def q_redirect_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_redirect")
    resp = _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    fin = _urls.follow_redirects(
        _crawl.redirect_edges(resp), max_hops=6
    )
    return fin.select(
        "url",
        "final_url",
        "hops",
        "resolved",
        (
            _urls.url_host(F.col("url"))
            != _urls.url_host(F.col("final_url"))
        ).alias("cross_host"),
    )


@_register(
    "q_charset_transcode",
    f"""
    WITH h AS (SELECT doc_id, doc_id % 12 AS v,
                      {_DUCK_WRAPPED_HTML} AS html
               FROM documents),
    b AS (
      SELECT doc_id, v,
             CASE WHEN v IN (2, 5, 9, 10) THEN '{_CS_PREFIX_L1}' || html
                  WHEN v = 3 THEN '{_CS_PREFIX_SJ}' || html
                  WHEN v IN (6, 11)
                    THEN '{_CS_META_L1}' || '{_CS_PREFIX_L1}' || html
                  WHEN v = 7
                    THEN '{_CS_META_SJ}' || '{_CS_PREFIX_SJ}' || html
                  WHEN v = 4 THEN NULL
                  ELSE html END AS body
      FROM h)
    SELECT doc_id,
           CASE WHEN v = 1 THEN 'utf-8'
                WHEN v IN (2, 5, 10) THEN 'iso-8859-1'
                WHEN v = 3 THEN 'shift_jis'
                WHEN v = 4 THEN 'x-unknown-8bit' END AS http_charset,
           CASE WHEN v = 1 THEN 'utf-8'
                WHEN v IN (2, 5, 6, 11) THEN 'iso-8859-1'
                WHEN v IN (3, 7) THEN 'shift_jis'
                WHEN v = 4 THEN 'x-unknown-8bit'
                WHEN v IN (8, 10) THEN 'utf-8'
                WHEN v = 9 THEN 'utf-16' END AS charset_sniffed,
           CASE WHEN v IN (1, 2, 3, 4, 5) THEN 'header'
                WHEN v IN (6, 7, 11) THEN 'meta'
                WHEN v IN (8, 9, 10) THEN 'bom' END AS charset_source,
           CASE WHEN v IN (5, 11) THEN 'gzip' END
             AS http_content_encoding,
           CASE WHEN v = 4 THEN 'unsupported_charset' END
             AS body_reject_reason,
           md5(body) AS body_md5,
           CAST(length(body) AS BIGINT) AS body_len
    FROM b
    """,
    "charset detection + transcoding with WHATWG precedence (BOM > "
    "Content-Type header > <meta charset>/<meta http-equiv> prescan): "
    "the corpus framed into .warc.gz with doc_id%12 selecting the "
    "declaration channel (none / header utf-8 / header Latin-1 / "
    "header Shift-JIS / header unknown / header Latin-1 under gzip / "
    "META Latin-1 / META http-equiv Shift-JIS / UTF-8 BOM / UTF-16LE "
    "BOM / UTF-8 BOM beating a WRONG Latin-1 header / META Latin-1 "
    "under gzip), non-UTF-8 bodies carrying REAL bytes of that "
    "encoding plus a non-ASCII prefix, read back through read_warc_gz"
    "(binary_payload=True) + warc_responses — header parse, prescan, "
    "BOM strip, the entity-udf transcode (composed with decompression "
    "for the gzip variants), the charset_sniffed/charset_source "
    "observability pair, and the counted unsupported_charset reject.  "
    "The oracle recomputes every body digest from the table, so a "
    "mojibake, a missed transcode, an unstripped BOM, or a precedence "
    "fault hash-mismatches",
    "crawl ingestion: charset sniffing + transcoding (BOM > header > "
    "meta; non-UTF-8 pages land as clean UTF-8)",
)
def q_charset_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_charset")
    resp = _crawl.warc_responses(
        _crawl.read_warc_gz(spark, path, binary_payload=True)
    )
    return resp.select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        "http_charset",
        "charset_sniffed",
        "charset_source",
        "http_content_encoding",
        "body_reject_reason",
        F.md5("body").alias("body_md5"),
        F.length("body").cast("long").alias("body_len"),
    )


@_register(
    "q_crawl_pipeline",
    f"""
    WITH h AS (SELECT doc_id, source, {_DUCK_WRAPPED_HTML} AS html
               FROM documents
               WHERE doc_id % 11 <> 0 AND doc_id % 13 <> 0),
    pages AS (
      SELECT doc_id, source || '.example.com' AS host,
             {_duck_html_extract("html")} AS text
      FROM h),
    q AS (
      SELECT *,
             CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 20
                  THEN 1 ELSE 0 END AS ok
      FROM pages),
    surv AS (
      SELECT MIN(doc_id) AS doc_id
      FROM q WHERE ok = 1 GROUP BY md5(text)),
    ranked AS (
      SELECT q.doc_id, q.host,
             ROW_NUMBER() OVER (PARTITION BY q.host
                                ORDER BY q.doc_id) AS rk
      FROM q JOIN surv USING (doc_id)),
    adm AS (
      SELECT doc_id, host,
             CASE WHEN rk <= 40 THEN 1 ELSE 0 END AS admitted
      FROM ranked)
    SELECT q.host,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(q.ok) AS BIGINT) AS n_quality,
           CAST(COUNT(a.doc_id) AS BIGINT) AS n_unique,
           CAST(COALESCE(SUM(a.admitted), 0) AS BIGINT) AS n_admitted
    FROM q LEFT JOIN adm a ON q.doc_id = a.doc_id
    GROUP BY q.host
    """,
    "crawl-container-to-corpus admission funnel, per host: WARC "
    "fixture -> intact-200 container filter -> HTML extraction -> "
    "token-count quality gate -> exact dedup (md5 min-id among "
    "quality survivors) -> per-host frequency cap (40, doc_id order) "
    "-> 4-stage funnel counts.  Every stage is the production "
    "operator (crawl reader, html_extract, token_count, dedup "
    "min-id, urls.domain_caps) and every stage replays in DuckDB — "
    "the container-borne twin of q_curation_pipeline_v2",
    "curation: crawl-to-corpus pipeline (north-star composition)",
)
def q_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators.text import token_count

    path = _crawl_fixture(spark, sf_dir, "warc")
    resp = _crawl.warc_responses(
        _crawl.read_warc_records(spark, path)
    ).filter(
        F.col("length_ok")
        & (F.col("http_status") == 200)
        & F.col("target_uri").isNotNull()
    )
    pages = resp.select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        _urls.url_host(F.col("target_uri")).alias("host"),
        _text.html_extract(F.col("body")).alias("text"),
    )
    q = pages.withColumn(
        "ok", (token_count(F.col("text")) >= 20).cast("int")
    )
    surv = (
        q.filter(F.col("ok") == 1)
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    admitted = _urls.domain_caps(
        q.join(surv, "doc_id").select("doc_id", "host"),
        domain_col="host",
        max_per_domain=40,
        order_col="doc_id",
        keep_col="admitted",
    ).select("doc_id", F.col("admitted").cast("int").alias("admitted"))
    return (
        q.join(admitted, "doc_id", "left")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("ok").cast("long").alias("n_quality"),
            F.count("admitted").cast("long").alias("n_unique"),
            F.coalesce(F.sum("admitted").cast("long"), F.lit(0)).alias(
                "n_admitted"
            ),
        )
        .select(
            "host",
            F.col("n_pages").cast("long").alias("n_pages"),
            "n_quality",
            "n_unique",
            "n_admitted",
        )
    )


@_register(
    "q_url_blocklist",
    f"""
    WITH {_URL_PARSED_CTE}
    SELECT doc_id, url_domain,
           CAST(CASE WHEN url_domain IN
                  ('src0.org', 'src1.com', 'src2.net.au', 'src3.co.uk')
                THEN 0 ELSE 1 END AS INT) AS kept
    FROM d
    """,
    "URL curation: RefinedWeb-style domain blocklist over synthesized "
    "crawl URLs — registered-domain match closes subdomain evasion "
    "(the host-shaped entry 'cdn.src2.net.au' normalizes to its "
    "registered domain under the second-level-suffix rule), broadcast "
    "LEFT join against the blocklist frame; exact oracle",
    "curation: URL domain blocklist",
)
def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    parsed = _urls.parse_urls(
        d.select("doc_id", "source", _wrapped_url().alias("url"))
    )
    # frame path — the shape real multi-million-entry lists use; the
    # host-shaped entry exercises entry normalization
    blocklist = spark.createDataFrame(
        [("src0.org",), ("src1.com",), ("cdn.src2.net.au",),
         ("src3.co.uk",)],
        "domain string",
    )
    flagged = _urls.domain_blocklist(
        parsed, blocklist, domain_col="url_domain"
    )
    return flagged.select("doc_id", "url_domain", "kept")


from sample_dms_s3_kinesis_spark.operators import robots as _robots  # noqa: E402


@_register(
    "q_robots_gate",
    """
    SELECT doc_id,
           source || '.example.com' AS host,
           CASE doc_id % 4
             WHEN 0 THEN '/p/' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN '/private/ok' || CAST(doc_id AS VARCHAR)
             ELSE '/private/okay/' || CAST(doc_id AS VARCHAR)
           END AS url_path,
           CAST(CASE WHEN length(source) = 4
                THEN CASE WHEN doc_id % 4 = 1 THEN 0 ELSE 1 END
                ELSE CASE WHEN doc_id % 4 IN (2, 3) THEN 0 ELSE 1 END
           END AS INT) AS allowed
    FROM documents
    """,
    "robots.txt compliance gate: per-host robots files (two variants "
    "with comments, multi-group structure and an unrelated agent "
    "group) parse into agent rules, and every synthesized page gets "
    "an allow/deny decision for agent '*' under RFC 9309 semantics — "
    "longest match wins, Allow wins ties, unmatched paths allowed; "
    "oracle = the hand-derived decision table (parser internals are "
    "pinned by test_robots_ops.py)",
    "curation: robots.txt compliance (crawl-politeness audit)",
)
def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pages = d.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.when(did % 4 == 0, F.concat(F.lit("/p/"), did.cast("string")))
        .when(did % 4 == 1, F.concat(F.lit("/private/"), did.cast("string")))
        .when(
            did % 4 == 2, F.concat(F.lit("/private/ok"), did.cast("string"))
        )
        .otherwise(F.concat(F.lit("/private/okay/"), did.cast("string")))
        .alias("url_path"),
    )
    files = (
        d.select("source")
        .distinct()
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.when(
                F.length("source") == 4,
                F.lit(
                    "# variant A\nUser-agent: *\nDisallow: /private\n"
                    "Allow: /private/ok\n\nUser-agent: otherbot\n"
                    "Disallow: /\n"
                ),
            )
            .otherwise(
                F.lit(
                    "User-agent: *\nDisallow: /private/ok\n"
                    "# variant B comment\nUnknown: x\n"
                )
            )
            .alias("robots_txt"),
        )
    )
    rules = _robots.parse_robots(files)
    decisions = _robots.robots_decisions(pages, rules, agent="*")
    return pages.join(decisions, ["host", "url_path"]).select(
        "doc_id", "host", "url_path", "allowed"
    )


@_register(
    "q_cdx_selection_pipeline",
    """
    WITH cap AS (
      SELECT doc_id, source,
             source || '.example.com' AS host,
             'com,' || source || ')/p/' || CAST(doc_id AS VARCHAR)
               AS urlkey,
             CASE WHEN doc_id % 13 = 0 THEN '404' ELSE '200' END
               AS status,
             CASE WHEN doc_id % 29 = 0 THEN md5(text || 'v1')
                  ELSE md5(text) END AS digest
      FROM documents),
    agg1 AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_latest,
             CAST(SUM(CASE WHEN status = '200' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_200
      FROM cap GROUP BY host),
    corp AS (
      SELECT DISTINCT md5(text) AS digest FROM documents
      WHERE doc_id % 2 = 0),
    u AS (
      SELECT c.* FROM cap c
      WHERE c.status = '200'
        AND NOT EXISTS (SELECT 1 FROM corp WHERE corp.digest = c.digest)),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY urlkey)
               AS rk
      FROM u),
    agg2 AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_unseen,
             CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected
      FROM r GROUP BY host)
    SELECT a1.host, a1.n_latest, a1.n_200,
           COALESCE(a2.n_unseen, 0) AS n_unseen,
           COALESCE(a2.n_selected, 0) AS n_selected
    FROM agg1 a1 LEFT JOIN agg2 a2 USING (host)
    """,
    "index-side capture SELECTION funnel, per host: CDX sidecar -> "
    "latest valid capture per urlkey -> status-200 filter -> "
    "unseen-digest gate (anti-join against the already-ingested "
    "corpus digests — the exact admission shape CorpusIngestTask "
    "runs, applied BEFORE any fetch) -> per-host frequency cap (15, "
    "urlkey order) -> 4-stage funnel counts.  The fetch tier of a "
    "real corpus build only ever touches n_selected records — this "
    "query IS the reason the CDX reader exists; every stage replays "
    "in DuckDB (corrupted second captures fall back to the older "
    "digest, which the unseen gate then treats as novel)",
    "curation: CDX-driven capture selection (index-side twin of "
    "q_crawl_pipeline)",
)
def q_cdx_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "cdx")
    records = _crawl.jsonl_records(
        _crawl.read_cdx(
            spark,
            path,
            "url string, status string, digest string, length string",
        )
    )
    latest = _crawl.cdx_latest_captures(records).withColumn(
        "host", _urls.url_host(F.col("url"))
    )
    agg1 = latest.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_latest"),
        F.sum((F.col("status") == "200").cast("long")).alias("n_200"),
    )
    # the already-ingested corpus side: digests only, bodies never
    # shuffle — the same projection the streaming ingest gate uses
    d = t(spark, sf_dir, "documents")
    corp = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    unseen = latest.filter(F.col("status") == "200").join(
        corp, "digest", "left_anti"
    )
    capped = _urls.domain_caps(
        unseen,
        domain_col="host",
        max_per_domain=15,
        order_col="urlkey",
        keep_col="selected",
    )
    agg2 = capped.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_unseen"),
        F.sum(F.col("selected").cast("long")).alias("n_selected"),
    )
    return agg1.join(agg2, "host", "left").select(
        "host",
        "n_latest",
        "n_200",
        F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
        F.coalesce(F.col("n_selected"), F.lit(0)).alias("n_selected"),
    )


@_register(
    "q_sitemap_ingest",
    """
    SELECT source || '.example.com' AS host,
           'url' AS kind,
           'https://' || source || '.example.com/p/'
             || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '&src=cdx' ELSE '' END
             AS loc,
           '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             AS lastmod
    FROM documents
    UNION ALL
    SELECT DISTINCT source || '.example.com', 'sitemap',
           'https://' || source || '.example.com/sitemap-2.xml',
           NULL
    FROM documents
    """,
    "sitemap XML ingestion (URL discovery): per-host <urlset> docs "
    "(one <url> entry per page, every 4th loc XML-escaped with &amp;) "
    "plus a <sitemapindex> doc with a child sitemap entry, parsed by "
    "sitemap_entries — entity-decoded locs, lastmod carried, "
    "mandatory-loc rule enforced; the step between "
    "robots_sitemaps and the crawl frontier.  Oracle recomputes every "
    "entry straight from the table (decoded '&' and all)",
    "crawl ingestion: sitemap XML (urlset + sitemapindex)",
)
def q_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    entry = F.concat(
        F.lit("<url><loc> https://"),
        host,
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("&amp;src=cdx")).otherwise(
            F.lit("")
        ),
        F.lit(" </loc><lastmod>2024-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod></url>"),
    )
    urlsets = (
        d.select(host.alias("host"), entry.alias("_e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0"?><urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.concat_ws("", F.collect_list("_e")),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    indexes = (
        d.select(host.alias("host"))
        .distinct()
        .select(
            "host",
            F.concat(
                F.lit("<sitemapindex><sitemap><loc>https://"),
                F.col("host"),
                F.lit(
                    "/sitemap-2.xml</loc></sitemap>"
                    "<!-- entry without a loc: dropped -->"
                    "<sitemap><lastmod>2024-01-01</lastmod></sitemap>"
                    "</sitemapindex>"
                ),
            ).alias("xml"),
        )
    )
    files = urlsets.unionByName(indexes)
    return _crawl.sitemap_entries(files)


@_register(
    "q_robots_politeness",
    """
    SELECT DISTINCT source || '.example.com' AS host,
           CASE WHEN length(source) = 4 THEN 0.5 END AS crawl_delay,
           CAST(CASE WHEN length(source) = 4 THEN 2 ELSE 1 END AS BIGINT)
             AS n_sitemaps
    FROM documents
    """,
    "robots.txt politeness metadata: per-host Crawl-delay for a "
    "specific agent (exact-agent group shadows '*', strictest-of-many "
    "wins, non-numeric values ignored -> NULL delay) and the "
    "group-independent Sitemap count — the fetch-scheduling inputs a "
    "polite crawler needs next to the allow/deny gate; oracle = the "
    "hand-derived per-variant table",
    "curation: robots.txt politeness metadata (Crawl-delay + Sitemap)",
)
def q_robots_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    files = (
        d.select("source")
        .distinct()
        .select(
            host.alias("host"),
            F.when(
                F.length("source") == 4,
                F.concat(
                    F.lit(
                        "User-agent: *\nCrawl-delay: 2\n"
                        "Disallow: /private\n\n"
                        "User-agent: fastbot\nCrawl-delay: 0.25\n"
                        "Crawl-delay: 0.5\nSitemap: https://"
                    ),
                    host,
                    F.lit("/sitemap.xml\nSitemap: https://"),
                    host,
                    F.lit("/sitemap2.xml\n"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit(
                        "User-agent: *\nDisallow: /x\n"
                        "Crawl-delay: notanumber\nSitemap: https://"
                    ),
                    host,
                    F.lit("/s.xml\n"),
                )
            )
            .alias("robots_txt"),
        )
    )
    delays = _robots.robots_crawl_delays(files, agent="fastbot")
    maps = _robots.robots_sitemaps(files).groupBy("host").agg(
        F.count(F.lit(1)).alias("n_sitemaps")
    )
    return (
        files.select("host")
        .join(delays, "host", "left")
        .join(maps, "host", "left")
        .select(
            "host",
            "crawl_delay",
            F.coalesce(F.col("n_sitemaps"), F.lit(0)).alias("n_sitemaps"),
        )
    )


@_register(
    "q_frontier_pipeline",
    """
    WITH hosts AS (
      SELECT DISTINCT source, source || '.org' AS host FROM documents),
    urls AS (
      SELECT source || '.org' AS host, doc_id,
             'https://' || source || '.org/p/' || CAST(doc_id AS VARCHAR)
               AS url
      FROM documents),
    f AS (
      SELECT *, CASE WHEN host IN ('src1.org', 'src3.org', 'src15.org')
                THEN 0 ELSE 1 END AS kept
      FROM urls),
    agg1 AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
             CAST(SUM(1 - kept) AS BIGINT) AS n_blocked
      FROM f GROUP BY host),
    u AS (SELECT * FROM f WHERE kept = 1 AND doc_id % 3 <> 0),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS rk
      FROM u),
    agg2 AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_unseen,
             CAST(SUM(CASE WHEN rk <= 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected
      FROM r GROUP BY host)
    SELECT h.host,
           CAST(CASE WHEN length(h.source) = 4 THEN 2 ELSE 1 END
                AS BIGINT) AS n_sitemaps_discovered,
           a1.n_urls, a1.n_blocked,
           COALESCE(a2.n_unseen, 0) AS n_unseen,
           COALESCE(a2.n_selected, 0) AS n_selected
    FROM hosts h JOIN agg1 a1 USING (host)
    LEFT JOIN agg2 a2 USING (host)
    """,
    "discovery-side frontier composition, per host — the sitemap twin "
    "of q_cdx_selection_pipeline: robots.txt names each host's "
    "sitemaps (robots_sitemaps; short-source hosts also name an extra "
    "sitemap that is never fetched, dropped by the fetch semi-join), "
    "the fetched <urlset> docs parse through sitemap_entries, "
    "discovered URLs run the registered-domain blocklist "
    "(www.src3.org normalizes onto src3.org), the unseen gate "
    "anti-joins already-crawled URLs (doc_id%3=0), and domain_caps "
    "selects the first 8 per host in URL order — 5-stage funnel "
    "counts, every stage the production operator and every stage "
    "replayed in DuckDB",
    "curation: sitemap-discovery frontier funnel (discovery-side twin "
    "of q_cdx_selection_pipeline)",
)
def q_frontier_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".org"))
    # 1. per-host robots.txt naming this host's sitemap(s)
    files = (
        d.select("source")
        .distinct()
        .select(
            host.alias("host"),
            F.concat(
                F.lit(
                    "User-agent: *\nDisallow: /private\n"
                    "Sitemap: https://"
                ),
                host,
                F.lit("/sitemap.xml\n"),
                F.when(
                    F.length("source") == 4,
                    F.concat(
                        F.lit("Sitemap: https://"),
                        host,
                        F.lit("/sitemap-extra.xml\n"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("robots_txt"),
        )
    )
    discovered = _robots.robots_sitemaps(files)
    n_disc = discovered.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_sitemaps_discovered")
    )
    # 2. the fetch tier only has /sitemap.xml docs; discovery gates
    # which of them parse (broadcast semi-join — the discovered list
    # is sitemap-cardinality, tiny next to any real corpus)
    entry = F.concat(
        F.lit("<url><loc>https://"),
        host,
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc></url>"),
    )
    urlsets = (
        d.select(host.alias("host"), entry.alias("_e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0"?><urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.concat_ws("", F.collect_list("_e")),
                F.lit("</urlset>"),
            ).alias("xml")
        )
        .select(
            "host",
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")
            ).alias("sitemap_url"),
            "xml",
        )
    )
    fetched = urlsets.join(
        F.broadcast(
            discovered.select(F.col("sitemap").alias("sitemap_url"))
        ),
        "sitemap_url",
        "left_semi",
    )
    # 3. parse the fetched sitemaps into the discovered URL list
    entries = _crawl.sitemap_entries(fetched, key_cols=["host"])
    urls_df = entries.filter(F.col("kind") == "url").select(
        "host", F.col("loc").alias("url")
    )
    # 4. registered-domain blocklist (www.src3.org -> src3.org)
    parsed = _urls.parse_urls(urls_df)
    flagged = _urls.domain_blocklist(
        parsed,
        spark.createDataFrame(
            [("src1.org",), ("www.src3.org",), ("src15.org",)],
            "domain string",
        ),
        domain_col="url_domain",
    )
    agg1 = flagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum((F.col("kept") == 0).cast("long")).alias("n_blocked"),
    )
    # 5. unseen gate: anti-join the already-crawled URL set (URL-level
    # twin of the digest gate in q_cdx_selection_pipeline)
    crawled = d.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    unseen = (
        flagged.filter(F.col("kept") == 1)
        .select("host", "url")
        .join(crawled, "url", "left_anti")
    )
    # 6. per-host frequency cap in URL order
    capped = _urls.domain_caps(
        unseen,
        domain_col="host",
        max_per_domain=8,
        order_col="url",
        keep_col="selected",
    )
    agg2 = capped.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_unseen"),
        F.sum(F.col("selected").cast("long")).alias("n_selected"),
    )
    return (
        n_disc.join(agg1, "host", "left")
        .join(agg2, "host", "left")
        .select(
            "host",
            "n_sitemaps_discovered",
            "n_urls",
            "n_blocked",
            F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
            F.coalesce(F.col("n_selected"), F.lit(0)).alias(
                "n_selected"
            ),
        )
    )



@_register(
    "q_link_frontier",
    """
    WITH links AS (
      SELECT source || '.net' AS page_host,
             'https://hub.net/h/' || CAST(doc_id % 50 AS VARCHAR)
               || '?a=1&b=' || CAST(doc_id % 7 AS VARCHAR) AS url
      FROM documents
      UNION ALL
      SELECT source || '.net',
             'https://' || source || '.net/p/'
               || CAST(doc_id + 20 AS VARCHAR) || '.html'
      FROM documents
      UNION ALL
      SELECT source || '.net',
             'https://' || source || '.net/q/'
               || CAST(doc_id % 10 AS VARCHAR)
      FROM documents),
    hosted AS (
      SELECT url,
             CASE WHEN url LIKE 'https://hub.net/%' THEN 'hub.net'
                  ELSE split_part(substr(url, 9), '/', 1) END AS host
      FROM links),
    agg1 AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_links,
             CAST(COUNT(DISTINCT url) AS BIGINT) AS n_unique
      FROM hosted GROUP BY host),
    uniq AS (SELECT DISTINCT host, url FROM hosted),
    f AS (
      SELECT *, CASE WHEN host IN ('src2.net', 'src4.net') THEN 0
                ELSE 1 END AS kept
      FROM uniq),
    agg2 AS (
      SELECT host, CAST(SUM(1 - kept) AS BIGINT) AS n_blocked
      FROM f GROUP BY host),
    crawled AS (
      SELECT 'https://' || source || '.net/p/'
               || CAST(doc_id AS VARCHAR) || '.html' AS url
      FROM documents),
    u AS (
      SELECT f.host, f.url FROM f
      WHERE f.kept = 1
        AND NOT EXISTS (SELECT 1 FROM crawled c WHERE c.url = f.url)),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS rk
      FROM u)
    SELECT a1.host, a1.n_links, a1.n_unique,
           a2.n_blocked,
           COALESCE(CAST(COUNT(r.url) AS BIGINT), 0) AS n_unseen,
           CAST(COALESCE(SUM(CASE WHEN r.rk <= 12 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_selected
    FROM agg1 a1 JOIN agg2 a2 USING (host)
    LEFT JOIN r ON r.host = a1.host
    GROUP BY a1.host, a1.n_links, a1.n_unique, a2.n_blocked
    """,
    "link-based crawl discovery, per target host — the third frontier "
    "modality next to the CDX index (q_cdx_selection_pipeline) and "
    "sitemaps (q_frontier_pipeline): every crawled page's HTML yields "
    "anchors through html_links (double-quoted entity-escaped "
    "absolute, single-quoted relative with dot-segments, unquoted "
    "root-relative; mailto/fragment/name-only decoys dropped), hrefs "
    "resolve against the page URL via resolve_url (RFC 3986 merge + "
    "dot-segment collapse), the frontier dedups to unique URLs, runs "
    "the registered-domain blocklist, anti-joins already-crawled "
    "URLs, and domain_caps selects the first 12 per host in URL "
    "order — 5-stage per-host funnel, extraction and resolution "
    "pinned by operator tests and the funnel replayed in DuckDB on "
    "the pre-resolved expected URLs",
    "curation: link-discovery frontier funnel (html_links + "
    "resolve_url; third discovery modality)",
)
def q_link_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".net"))
    did = F.col("doc_id").cast("string")
    base = F.concat(
        F.lit("https://"), host, F.lit("/p/"), did, F.lit(".html")
    )
    # one HTML page per crawled doc: the three real link forms plus
    # decoys html_links must drop (fragment, mailto, name-only anchor)
    html = F.concat(
        F.lit('<html><body><a href="https://hub.net/h/'),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?a=1&amp;b="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">hub</a><a href=\'../p/'),
        (F.col("doc_id") + 20).cast("string"),
        F.lit(".html'>next</a><a href=/q/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit('>sec</a><a href="#top">top</a>'),
        F.lit('<a href="mailto:o@e.net">mail</a>'),
        F.lit('<a name="x">anchor</a></body></html>'),
    )
    pages = d.select(base.alias("base"), html.alias("html"))
    resolved = (
        pages.select(
            "base",
            F.explode(_text.html_links(F.col("html"))).alias("href"),
        )
        .select(
            _urls.resolve_url(F.col("base"), F.col("href")).alias("url")
        )
        .filter(F.col("url").isNotNull())
        .withColumn("host", _urls.url_host(F.col("url")))
    )
    # aggregate FIRST, then cut lineage: one (host, url) count is the
    # single consumer of the heavy extract+resolve expression, and the
    # checkpoint makes the three downstream consumers (n_links rollup,
    # blocklist funnel, unseen/cap funnel) read the materialized
    # host-cardinality aggregate instead of re-running the resolve
    # chain per plan branch (3 explode subtrees -> 1, measured 5.1 s
    # -> ~2 s warm at sf0.1)
    from sample_dms_s3_kinesis_spark.operators.dedup import _cut_lineage

    cnts = _cut_lineage(
        resolved.groupBy("host", "url").agg(
            F.count(F.lit(1)).alias("_n")
        )
    )
    agg1 = cnts.groupBy("host").agg(
        F.sum("_n").alias("n_links"),
        F.count(F.lit(1)).alias("n_unique"),
    )
    # frontier = unique URLs; then blocklist -> unseen -> per-host cap
    uniq = cnts.select("host", "url")
    flagged = _urls.domain_blocklist(
        uniq,
        spark.createDataFrame(
            [("src2.net",), ("www.src4.net",)], "domain string"
        ),
    )
    agg2 = flagged.groupBy("host").agg(
        F.sum((F.col("kept") == 0).cast("long")).alias("n_blocked")
    )
    crawled = d.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), did, F.lit(".html")
        ).alias("url")
    )
    unseen = (
        flagged.filter(F.col("kept") == 1)
        .select("host", "url")
        .join(crawled, "url", "left_anti")
    )
    capped = _urls.domain_caps(
        unseen,
        domain_col="host",
        max_per_domain=12,
        order_col="url",
        keep_col="selected",
    )
    agg3 = capped.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_unseen"),
        F.sum(F.col("selected").cast("long")).alias("n_selected"),
    )
    return (
        agg1.join(agg2, "host")
        .join(agg3, "host", "left")
        .select(
            "host",
            "n_links",
            "n_unique",
            "n_blocked",
            F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
            F.coalesce(F.col("n_selected"), F.lit(0)).alias("n_selected"),
        )
    )


@_register(
    "q_canonical_alias",
    """
    WITH b AS (SELECT doc_id AS d, doc_id % 4 AS v,
                      doc_id - (doc_id % 4) AS g
               FROM documents),
    ids AS (
      SELECT d,
             CASE WHEN v = 1
                    THEN 'https://h' || ((d - 1) % 5) || '.net/c/'
                         || (d - 1)
                  WHEN v = 2
                    THEN 'https://h' || (d % 5) || '.net/c/' || (d - 2)
                  ELSE 'https://h' || (d % 5) || '.net/c/' || d
             END AS canonical_url,
             'https://h' || (d % 5) || '.net/c/' || d AS page_url,
             CASE WHEN v IN (1, 2, 3) THEN 1 ELSE 0 END AS declared
      FROM b)
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(declared) AS BIGINT) AS n_declared,
           min(page_url) AS min_url
    FROM ids
    GROUP BY canonical_url
    """,
    "rel=canonical alias collapse — the ON-PAGE twin of the redirect "
    "alias channel: one synthesized page per doc with doc_id%4 "
    "selecting the declaration (none / absolute double-quoted / "
    "ROOT-RELATIVE href-before-rel / self-canonical unquoted), "
    "html_canonical extracts the first canonical link in any "
    "attribute order and quote form, resolve_url absolutizes it "
    "against the page URL, and pages group under "
    "coalesce(canonical, self) — the identity a dedup/frontier layer "
    "collapses BEFORE content hashing (group leaders absorb their "
    "v=1 declarers; the relative variant mints a cross-host identity "
    "exactly as RFC 3986 resolution dictates).  The oracle recomputes "
    "every identity from doc_id arithmetic, so a fault in the tag "
    "match, attribute-order handling, entity decode, or relative "
    "resolution hash-mismatches",
    "crawl curation: rel=canonical alias collapse (on-page identity "
    "declarations, the dedup alias source next to 3xx redirects)",
)
def q_canonical_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    v = F.col("doc_id") % 4
    g = (F.col("doc_id") - v).cast("string")

    def _curl(i):
        return F.concat(
            F.lit("https://h"),
            (i % 5).cast("string"),
            F.lit(".net/c/"),
            i.cast("string"),
        )

    page_url = _curl(F.col("doc_id"))
    link = (
        F.when(
            v == 1,
            F.concat(
                F.lit('<link rel="canonical" href="'),
                _curl(F.col("doc_id") - 1),
                F.lit('">'),
            ),
        )
        .when(
            v == 2,
            # href BEFORE rel, single quotes, root-relative value
            F.concat(
                F.lit("<link href='/c/"),
                g,
                F.lit("' rel='canonical'>"),
            ),
        )
        .when(
            v == 3,
            # unquoted attributes, self-canonical
            F.concat(
                F.lit("<link rel=canonical href="),
                _curl(F.col("doc_id")),
                F.lit(">"),
            ),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head>"),
        link,
        F.lit("</head><body><p>doc "),
        did,
        F.lit("</p></body></html>"),
    )
    pages = d.select(page_url.alias("page_url"), html.alias("html"))
    canon = _urls.resolve_url(
        F.col("page_url"), _text.html_canonical(F.col("html"))
    )
    return (
        pages.select(
            "page_url",
            F.coalesce(canon, F.col("page_url")).alias("canonical_url"),
            canon.isNotNull().cast("long").alias("declared"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("declared").alias("n_declared"),
            F.min("page_url").alias("min_url"),
        )
    )


@_register(
    "q_http_validators",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                  THEN '"e-' || doc_id || '"'
                WHEN doc_id % 3 = 1
                  THEN 'W/"e-' || doc_id || '"' END AS http_etag,
           CASE WHEN doc_id % 3 = 0
                  THEN 'Mon, 01 Jan 2024 00:00:'
                       || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
                       || ' GMT' END AS http_last_modified
    FROM documents
    """,
    "HTTP cache validators off the wire: the corpus framed into WARC "
    "with doc_id%3 selecting the header set (quoted ETag + "
    "Last-Modified / weak W/ ETag only / neither), read back through "
    "warc_responses — the raw http_etag / http_last_modified columns "
    "a conditional refetch sends back as If-None-Match / "
    "If-Modified-Since (RFC 7232 compares validators byte-wise, so "
    "quotes and the W/ prefix survive exactly).  The oracle "
    "recomputes every validator from doc_id arithmetic; pairs with "
    "q_recrawl_schedule to complete the refresh tier: WHEN to refetch "
    "(change-rate due score) and HOW to make it cheap (conditional "
    "request, 304 instead of a body)",
    "crawl scheduling: conditional-refetch validators (ETag / "
    "Last-Modified off warc_responses)",
)
def q_http_validators(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_val")
    resp = _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    return resp.select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        "http_etag",
        "http_last_modified",
    )


_META_ROBOTS_E2E_CACHE: dict[str, tuple[list, object]] = {}


def _meta_robots_e2e_results(spark: SparkSession):
    """Cached drive of the on-page-robots ingest mode: one WARC batch
    (plain page / meta-noindex / meta-nofollow / X-Robots-Tag: none)
    plus a replay through CorpusIngestTask(on_page_robots=True,
    discover_links=True) — noindex pages quarantine (their links
    still feed the frontier), nofollow pages admit but contribute no
    edges, 'none' does both; the replay changes nothing."""
    import os
    import shutil
    import tempfile

    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        CorpusIngestTask,
    )

    key = spark.sparkContext.applicationId
    if key not in _META_ROBOTS_E2E_CACHE:
        root = tempfile.mkdtemp(prefix="q_meta_robots_e2e_")
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        task = CorpusIngestTask(
            spark,
            drop,
            os.path.join(root, "corpus"),
            input_format="warc",
            extract_html=True,
            discover_links=True,
            on_page_robots=True,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

        def page(uri, body, extra_header=""):
            payload = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"{extra_header}\r\n<html><body>{body}</body></html>"
            )
            return (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(payload.encode())}\r\n\r\n"
                f"{payload}\r\n\r\n"
            )

        try:
            b1 = (
                page(
                    "https://a.com/plain",
                    "<p>plain page body</p>"
                    '<a href="https://x.com/from-plain">l</a>',
                )
                + page(
                    "https://a.com/noindex",
                    '<meta name="robots" content="noindex">'
                    "<p>noindex body</p>"
                    '<a href="https://x.com/from-noindex">l</a>',
                )
                + page(
                    "https://a.com/nofollow",
                    '<meta name="robots" content="nofollow">'
                    "<p>nofollow body</p>"
                    '<a href="https://x.com/from-nofollow">l</a>',
                )
                + page(
                    "https://a.com/none",
                    "<p>none body</p>"
                    '<a href="https://x.com/from-none">l</a>',
                    extra_header="X-Robots-Tag: none\r\n",
                )
            )
            with open(os.path.join(drop, "b1.warc"), "w") as f:
                f.write(b1)
            batch = task._source_frame(streaming=False)
            task._process_batch(batch, 0)
            task._process_batch(batch, 0)  # replay: changes nothing
            stats = task.ingest_stats()
            lits = [
                F.lit(int(stats[k])).alias(k)
                for k in (
                    "admitted",
                    "rejected_noindex",
                    "nofollow_pages",
                )
            ]
            noidx = task.noindex_quarantined().select(
                F.lit("noindex").alias("channel"),
                F.col("target_uri").alias("url"),
                *lits,
            )
            front = task.discovered_frontier().select(
                F.lit("frontier").alias("channel"),
                F.col("url"),
                *lits,
            )
            frame = noidx.unionByName(front)
            _META_ROBOTS_E2E_CACHE[key] = (
                frame.collect(),
                frame.schema,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return _META_ROBOTS_E2E_CACHE[key]


@_register(
    "q_meta_robots_e2e",
    """
    SELECT * FROM (VALUES
      ('frontier', 'https://x.com/from-noindex', 2, 2, 2),
      ('frontier', 'https://x.com/from-plain',   2, 2, 2),
      ('noindex',  'https://a.com/noindex',      2, 2, 2),
      ('noindex',  'https://a.com/none',         2, 2, 2)
    ) AS t(channel, url, admitted, rejected_noindex, nofollow_pages)
    ORDER BY channel, url
    """,
    "on-page robots E2E: CorpusIngestTask(on_page_robots=True, "
    "discover_links=True) drains a 4-page WARC batch (plain / meta "
    "noindex / meta nofollow / X-Robots-Tag: none) plus a replay — "
    "the noindex pages land in the _quarantine_noindex store (their "
    "links STILL feed the frontier: noindex opts out of the index, "
    "not the crawl graph), the nofollow pages admit but contribute "
    "no frontier edges, 'none' does both, and the replay changes "
    "nothing; oracle = the hand-derived disposition of every page "
    "and frontier URL plus the manifest counters",
    "CorpusIngestTask on-page-robots mode end-to-end (streaming twin "
    "of q_meta_robots_funnel)",
)
def q_meta_robots_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, schema = _meta_robots_e2e_results(spark)
    return spark.createDataFrame(rows, schema).orderBy("channel", "url")


@_register(
    "q_nofollow_links",
    """
    WITH s AS (SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS v
               FROM documents)
    SELECT doc_id,
           CAST(2 AS INTEGER) AS n_links,
           CAST(CASE WHEN v IN (0, 3) THEN 2
                     WHEN v IN (1, 4) THEN 1
                     ELSE 0 END AS INTEGER) AS n_followable,
           CASE WHEN v IN (0, 3)
                  THEN '/p/' || CAST(doc_id AS VARCHAR)
                WHEN v = 1
                  THEN '/keep/' || CAST(doc_id AS VARCHAR)
                WHEN v = 4
                  THEN '/q/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
           END AS first_followable
    FROM s
    """,
    "per-link on-page robots: doc_id%5 selects the anchor set (two "
    "plain / plain + rel=nofollow / double-nofollow incl. the "
    "multi-token 'external nofollow' and unquoted forms / a "
    "rel=dofollow decoy that must NOT drop / nofollow + an "
    "entity-encoded followable href), run through html_links (all) "
    "vs html_followable_links (rel=nofollow anchors contribute "
    "nothing — the per-LINK channel the ingest frontier uses under "
    "on_page_robots).  The oracle recomputes counts and the first "
    "followable href (entity-decoded) from doc_id arithmetic, so a "
    "rel-parse or quote-form fault hash-mismatches",
    "crawl ingestion: rel=nofollow link filtering (per-link on-page "
    "robots)",
)
def q_nofollow_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id")
    sid = (F.col("doc_id") % 5).cast("int")
    ds = F.col("doc_id").cast("string")

    def a(href, rel=None):
        mid = F.lit(f' rel="{rel}"') if rel else F.lit("")
        return F.concat(
            F.lit('<a href="'), href, F.lit('"'), mid, F.lit(">x</a>")
        )

    plain = F.concat(F.lit("/p/"), ds)
    keep = F.concat(F.lit("/keep/"), ds)
    enc = F.concat(F.lit("/q/"), ds, F.lit("?a=1&amp;b=2"))
    html = (
        F.when(sid == 0, F.concat(a(plain), a(F.concat(F.lit("/x/"), ds))))
        .when(sid == 1, F.concat(a(F.concat(F.lit("/nf/"), ds), "nofollow"), a(keep)))
        .when(
            sid == 2,
            F.concat(
                F.concat(
                    F.lit("<a href='/nf1/"), ds,
                    F.lit("' rel='external nofollow'>x</a>"),
                ),
                F.concat(
                    F.lit("<a href=/nf2/"), ds,
                    F.lit(" rel=nofollow>x</a>"),
                ),
            ),
        )
        .when(sid == 3, F.concat(a(plain, "dofollow"), a(F.concat(F.lit("/y/"), ds))))
        .otherwise(F.concat(a(F.concat(F.lit("/nf/"), ds), "nofollow"), a(enc)))
    )
    fix = d.select("doc_id", html.alias("html"))
    fol = _text.html_followable_links(F.col("html"))
    return fix.select(
        "doc_id",
        F.size(_text.html_links(F.col("html"))).alias("n_links"),
        F.size(fol).alias("n_followable"),
        # try_: the double-nofollow variant has NO followable links
        # and ANSI element_at throws on the empty array
        F.try_element_at(fol, F.lit(1)).alias("first_followable"),
    )


@_register(
    "q_fetch_schedule_backoff",
    """
    WITH s AS (SELECT doc_id, source, CAST(doc_id % 5 AS INTEGER) AS v,
                      'https://' || source || '.example.com/p/' || doc_id
                        AS url,
                      source || '.example.com' AS host
               FROM documents),
    p AS (SELECT host,
                 CASE WHEN v = 1
                        THEN CAST(60 + (doc_id % 7) * 10 AS DOUBLE)
                      WHEN v = 2
                        THEN CAST((2 + doc_id % 4) * 60 AS DOUBLE)
                      WHEN v = 3 THEN 45.0 END AS pen
          FROM s WHERE v IN (1, 2, 3)),
    bk AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_rate_limited,
                  MAX(pen) AS backoff_s
           FROM p GROUP BY host),
    fr AS (SELECT url, host FROM s WHERE v IN (0, 4)),
    wv AS (SELECT url, host,
                  CAST(ROW_NUMBER() OVER (PARTITION BY host
                                          ORDER BY url) AS INTEGER)
                    AS wave
           FROM fr)
    SELECT wv.url, wv.host, wv.wave,
           CAST((wv.wave - 1) * 2.0 + COALESCE(bk.backoff_s, 0)
                AS DOUBLE) AS fetch_offset_s,
           bk.backoff_s, bk.n_rate_limited
    FROM wv LEFT JOIN bk USING (host)
    """,
    "rate-limit backoff folded into the fetch schedule: the corpus "
    "framed into WARC with doc_id%5 selecting the response (200 page "
    "/ 429 with delta-seconds Retry-After / 503 with an IMF-fixdate "
    "Retry-After vs the pinned now / 429 with none -> default "
    "penalty), read back through warc_responses (NEW http_retry_after "
    "column) -> urls.host_backoff (per-host MAX penalty, both RFC "
    "9110 Retry-After forms + the default) -> urls.fetch_schedule"
    "(backoff=...) — a 429ing host's whole wave train shifts out by "
    "its penalty instead of being re-hit on the same cadence, clean "
    "hosts unaffected.  The oracle replays the parse, the per-host "
    "max, and the wave arithmetic from doc_id math, so a date-parse "
    "or fold fault hash-mismatches; closes the politeness loop "
    "Crawl-delay alone leaves open",
    "crawl scheduling: Retry-After / 429-503 backoff in the fetch "
    "waves",
)
def q_fetch_schedule_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_backoff")
    resp = _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    backoff = _urls.host_backoff(
        resp, now="2024-02-01 00:00:00", default_penalty_s=45.0
    )
    frontier = resp.filter(F.col("http_status") == 200).select(
        F.col("target_uri").alias("url"),
        _urls.url_host(F.col("target_uri")).alias("host"),
    )
    delays = frontier.select("host").distinct().withColumn(
        "crawl_delay", F.lit(2.0)
    )
    sched = _urls.fetch_schedule(
        frontier, delays, backoff=backoff, default_delay=2.0
    )
    return sched.join(F.broadcast(backoff), "host", "left").select(
        "url",
        "host",
        "wave",
        "fetch_offset_s",
        "backoff_s",
        "n_rate_limited",
    )


@_register(
    "q_meta_robots_funnel",
    """
    WITH s AS (SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS v
               FROM documents)
    SELECT doc_id,
           CASE WHEN v = 4 THEN 'noindex'
                WHEN v = 5 THEN 'none' END AS x_robots,
           v IN (1, 3, 4, 5) AS noindex,
           v IN (2, 3, 5) AS nofollow,
           CAST(CASE WHEN v IN (2, 3, 5) THEN 0 ELSE 1 END AS BIGINT)
             AS n_followable_links
    FROM s
    """,
    "on-page robots directives off the wire: the corpus framed into "
    "WARC with doc_id%6 selecting the channel (none / meta noindex / "
    "meta nofollow / meta 'noindex, nofollow' / X-Robots-Tag: noindex "
    "/ X-Robots-Tag: none), read back through warc_responses (NEW "
    "http_x_robots_tag column) + text.robots_directive_flags — the "
    "restrictive union of both channels, 'none' implying both, plus "
    "the page's followable-link count (0 for nofollow pages: exactly "
    "what the ingest frontier drops).  A page opting out of indexing "
    "or link-following opts out of exactly the use this pipeline puts "
    "it to; the oracle recomputes every flag from doc_id arithmetic, "
    "so a parsing or precedence fault hash-mismatches.  Ingest "
    "enforcement: CorpusIngestTask(on_page_robots=True) quarantines "
    "noindex pages (rejected_noindex) and cuts nofollow pages' "
    "frontier edges (nofollow_pages) — pytest-pinned "
    "(test_on_page_robots_gates)",
    "crawl ingestion: on-page robots directives (meta robots + "
    "X-Robots-Tag; noindex never admitted, nofollow feeds no edges)",
)
def q_meta_robots_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "warc_robots")
    resp = _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    flags = _text.robots_directive_flags(
        F.col("body"), F.col("http_x_robots_tag")
    )
    staged = resp.select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        F.col("http_x_robots_tag").alias("x_robots"),
        flags.alias("_f"),
        _text.html_links(F.col("body")).alias("_links"),
    )
    return staged.select(
        "doc_id",
        "x_robots",
        F.col("_f.noindex").alias("noindex"),
        F.col("_f.nofollow").alias("nofollow"),
        F.when(F.col("_f.nofollow"), F.lit(0))
        .otherwise(F.size("_links"))
        .cast("long")
        .alias("n_followable_links"),
    )


@_register(
    "q_recrawl_schedule",
    """
    WITH s AS (SELECT doc_id, source, text,
                      lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ss
               FROM documents),
    caps AS (
      SELECT 'com,' || source || ')/p/' || doc_id AS urlkey,
             '202401010000' || ss AS ts, md5(text || 'v1') AS digest
      FROM s
      UNION ALL
      SELECT 'com,' || source || ')/p/' || doc_id,
             '202403150000' || ss, md5(text) FROM s
      UNION ALL
      SELECT 'com,' || source || ')/p/' || doc_id,
             '202405200000' || ss,
             CASE WHEN doc_id % 3 = 0 THEN md5(text || 'v3')
                  ELSE md5(text) END
      FROM s),
    w AS (
      SELECT urlkey, digest, strptime(ts, '%Y%m%d%H%M%S') AS t,
             lag(digest) OVER (
               PARTITION BY urlkey
               ORDER BY strptime(ts, '%Y%m%d%H%M%S')) AS prev
      FROM caps),
    a AS (
      SELECT urlkey,
             CAST(count(*) AS BIGINT) AS n_captures,
             CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             min(t) AS first_t, max(t) AS last_t
      FROM w GROUP BY urlkey),
    b AS (
      SELECT urlkey, n_captures, n_changes,
             CAST(CASE WHEN n_changes > 0
                  THEN GREATEST(FLOOR((epoch(last_t) - epoch(first_t))
                                      / n_changes), 1)
                  ELSE 2592000 END AS BIGINT) AS interval_s,
             CAST(epoch(TIMESTAMP '2024-07-01 00:00:00')
                  - epoch(last_t) AS BIGINT) AS age_s
      FROM a)
    SELECT urlkey, n_captures, n_changes, interval_s, age_s,
           ROUND(CAST(age_s AS DOUBLE) / interval_s, 4) AS due
    FROM b
    """,
    "recrawl scheduling from CDX capture history — the refresh policy "
    "that closes the crawl loop in TIME: a three-capture CDXJ fixture "
    "per doc (Jan/Mar/May; a third of the keys change twice, the rest "
    "once) flows through read_cdx -> jsonl_records -> "
    "urls.recrawl_priority, which estimates each key's change interval "
    "(observation span over observed digest changes, one lag window + "
    "one groupBy) and scores due = age / interval against a pinned "
    "'now' — pages observed to change often come due sooner.  The "
    "oracle replays the lag/group arithmetic from the documents table, "
    "so a fault in capture ordering, change counting, or the interval "
    "estimate hash-mismatches",
    "crawl scheduling: change-rate recrawl priority (fetch -> ingest "
    "-> discover -> schedule -> REFETCH)",
)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _crawl_fixture(spark, sf_dir, "cdx_hist")
    df = _crawl.read_cdx(
        spark, path, "url string, status string, digest string"
    )
    recs = _crawl.jsonl_records(df)
    return _urls.recrawl_priority(
        recs, now="2024-07-01 00:00:00", ts_col="capture_ts"
    ).select(
        "urlkey", "n_captures", "n_changes", "interval_s", "age_s", "due"
    )


@_register(
    "q_refresh_pipeline",
    """
    WITH s AS (SELECT doc_id, source, text,
                      lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ss,
                      'https://' || source || '.example.com/p/' || doc_id
                        AS url
               FROM documents),
    caps AS (
      SELECT url, '202401010000' || ss AS ts, md5(text || 'v1') AS digest
      FROM s
      UNION ALL
      SELECT url, '202403150000' || ss, md5(text) FROM s
      UNION ALL
      SELECT url, '202405200000' || ss,
             CASE WHEN doc_id % 3 = 0 THEN md5(text || 'v3')
                  ELSE md5(text) END
      FROM s),
    w AS (
      SELECT url, digest, strptime(ts, '%Y%m%d%H%M%S') AS t,
             lag(digest) OVER (
               PARTITION BY url
               ORDER BY strptime(ts, '%Y%m%d%H%M%S')) AS prev
      FROM caps),
    a AS (
      SELECT url,
             CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             min(t) AS first_t, max(t) AS last_t
      FROM w GROUP BY url),
    b AS (
      SELECT url,
             CAST(CASE WHEN n_changes > 0
                  THEN GREATEST(FLOOR((epoch(last_t) - epoch(first_t))
                                      / n_changes), 1)
                  ELSE 2592000 END AS BIGINT) AS interval_s,
             CAST(epoch(TIMESTAMP '2025-01-01 00:00:00')
                  - epoch(last_t) AS BIGINT) AS age_s
      FROM a),
    sel AS (
      SELECT url, ROUND(CAST(age_s AS DOUBLE) / interval_s, 4) AS due
      FROM b
      WHERE ROUND(CAST(age_s AS DOUBLE) / interval_s, 4) >= 2.0),
    val AS (
      SELECT url,
             CASE WHEN doc_id % 3 = 0 THEN '"e-' || doc_id || '"'
                  WHEN doc_id % 3 = 1 THEN 'W/"e-' || doc_id || '"'
             END AS http_etag,
             CASE WHEN doc_id % 3 = 0
                    THEN 'Mon, 01 Jan 2024 00:00:' || ss || ' GMT'
             END AS http_last_modified
      FROM s),
    j AS (
      SELECT sel.url, sel.due, val.http_etag, val.http_last_modified,
             regexp_extract(sel.url, 'https://([^/]+)', 1) AS host
      FROM sel JOIN val ON sel.url = val.url),
    wv AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
               AS wave
      FROM j)
    SELECT url, due, http_etag, http_last_modified, wave,
           CAST((wave - 1) AS DOUBLE) AS fetch_offset_s
    FROM wv
    """,
    "the refresh-tier flagship composition — WHEN, WITH WHAT, and IN "
    "WHAT ORDER to refetch: 3-capture CDX history -> "
    "urls.recrawl_priority (change-rate due scores against a pinned "
    "now) -> due >= 2.0 selection (the twice-changed third of the "
    "keys; the once-changed rest sit at ~1.6 and wait) -> join the "
    "conditional-request "
    "validators (ETag / Last-Modified) parsed off the last responses "
    "by warc_responses -> urls.fetch_schedule politeness waves "
    "(per-host serialization at the default delay).  Every stage is "
    "the production operator and every stage replays in DuckDB — the "
    "refresh twin of q_frontier_pipeline (discovery) and "
    "q_cdx_selection_pipeline (index selection), closing the loop: "
    "fetch -> ingest -> discover -> schedule -> refresh",
    "crawl scheduling: refresh pipeline (due scores + validators + "
    "waves, north-star composition)",
)
def q_refresh_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdx_path = _crawl_fixture(spark, sf_dir, "cdx_hist")
    recs = _crawl.jsonl_records(
        _crawl.read_cdx(
            spark,
            cdx_path,
            "url string, status string, digest string",
        )
    )
    pri = _urls.recrawl_priority(
        recs, now="2025-01-01 00:00:00", key_col="url", ts_col="capture_ts"
    )
    sel = pri.filter(F.col("due") >= 2.0).select("url", "due")
    val_path = _crawl_fixture(spark, sf_dir, "warc_val")
    vals = _crawl.warc_responses(
        _crawl.read_warc_records(spark, val_path)
    ).select(
        F.col("target_uri").alias("url"),
        "http_etag",
        "http_last_modified",
    )
    joined = sel.join(vals, "url").withColumn(
        "host", _urls.url_host(F.col("url"))
    )
    sched = _urls.fetch_schedule(
        joined,
        spark.createDataFrame([], "host string, crawl_delay double"),
        order_col="url",
        default_delay=1.0,
    )
    return sched.select(
        "url",
        "due",
        "http_etag",
        "http_last_modified",
        "wave",
        "fetch_offset_s",
    )


@_register(
    "q_fetch_schedule",
    """
    WITH frontier AS (
      SELECT source || '.example.net' AS host,
             'https://' || source || '.example.net/f/'
               || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN length(source) = 4 THEN CAST(0.5 AS DOUBLE)
                  ELSE CAST(1.0 AS DOUBLE) END AS delay
      FROM documents),
    w AS (
      SELECT host, url, delay,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS wave
      FROM frontier)
    SELECT host, url, CAST(wave AS INT) AS wave,
           CAST((wave - 1) * delay AS DOUBLE) AS fetch_offset_s
    FROM w
    """,
    "politeness-aware fetch scheduling: the frontier joins per-host "
    "robots Crawl-delay (robots_crawl_delays — length-4 sources carry "
    "an exact-agent 0.5 s delay, the rest a non-numeric value that "
    "parses to NULL and falls back to the 1.0 s default) and "
    "fetch_schedule assigns each URL a per-host wave plus "
    "fetch_offset_s = (wave-1) * delay, serializing requests to one "
    "host while hosts proceed in parallel — the step between frontier "
    "construction and the fetch tier; offsets are multiples of 0.5 "
    "(exact doubles) so the cross-engine compare is bit-stable",
    "curation: politeness-aware fetch scheduling (Crawl-delay waves)",
)
def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.net"))
    frontier = d.select(
        host.alias("host"),
        F.concat(
            F.lit("https://"), host, F.lit("/f/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    files = (
        d.select("source")
        .distinct()
        .select(
            host.alias("host"),
            F.when(
                F.length("source") == 4,
                F.lit(
                    "User-agent: politebot\nCrawl-delay: 0.5\n"
                    "Disallow: /private\n"
                ),
            )
            .otherwise(F.lit("User-agent: *\nCrawl-delay: soon\n"))
            .alias("robots_txt"),
        )
    )
    delays = _robots.robots_crawl_delays(files, agent="politebot")
    return _urls.fetch_schedule(
        frontier, delays, default_delay=1.0
    ).select("host", "url", "wave", "fetch_offset_s")


@_register(
    "q_surt_keys",
    """
    SELECT 'net,' || source || ')/dir/' || CAST(doc_id AS VARCHAR)
             || '?a=' || CAST(doc_id % 5 AS VARCHAR) || '&b=2' AS urlkey,
           CAST(3 AS BIGINT) AS n_mirrors
    FROM documents
    """,
    "SURT urlkey canonicalization (the CDX index key convention "
    "read_cdx sorts on): three mirror spellings of every page — "
    "https + www + uppercase path + unsorted query, http + uppercase "
    "host + explicit port, https + www2 + fragment — collapse onto "
    "ONE canonical key (host lowercased/www-stripped/reversed, path "
    "lowercased, query params sorted, scheme/port/fragment dropped), "
    "so a frontier keyed on surt_urlkey dedups mirrors the index side "
    "would otherwise fetch three times; oracle constructs the "
    "expected key per doc and pins n_mirrors = 3",
    "curation: SURT urlkey canonicalization (mirror dedup key)",
)
def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    qa = (F.col("doc_id") % 5).cast("string")
    v1 = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".net/DIR/"),
        did, F.lit("?b=2&a="), qa,
    )
    v2 = F.concat(
        F.lit("http://"), F.upper(F.col("source")), F.lit(".NET:8080/dir/"),
        did, F.lit("?a="), qa, F.lit("&b=2"),
    )
    v3 = F.concat(
        F.lit("https://www2."), F.col("source"), F.lit(".net/dir/"),
        did, F.lit("?a="), qa, F.lit("&b=2#frag"),
    )
    mirrors = d.select(
        F.explode(F.array(v1, v2, v3)).alias("url")
    )
    return (
        mirrors.select(_urls.surt_urlkey(F.col("url")).alias("urlkey"))
        .groupBy("urlkey")
        .agg(F.count(F.lit(1)).alias("n_mirrors"))
    )


@_register(
    "q_mime_funnel",
    """
    WITH s AS (SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS v
               FROM documents)
    SELECT doc_id,
           CASE WHEN v IN (0, 1) THEN 'text/html'
                WHEN v = 2 THEN 'text/plain'
                WHEN v = 3 THEN 'application/pdf'
                WHEN v = 4 THEN 'application/json'
                ELSE 'image/png' END AS content_type,
           v IN (0, 1, 2) AS admitted
    FROM s
    """,
    "content-type admission funnel off the wire: the corpus framed "
    "into WARC with doc_id%6 selecting the DECLARED media type "
    "(text/html / TEXT/HTML + charset=UTF-8 — case and parameter must "
    "fold away / text/plain / application/pdf / application/json / "
    "image/png; every body is the same text page, so the header is "
    "the only discriminator — the exact hazard of declared binary "
    "whose bytes happen to decode), read back through warc_responses "
    "-> crawl.mime_admitted against the text allowlist.  The oracle "
    "recomputes the normalized type and the verdict from doc_id "
    "arithmetic, so a header-parse or normalization fault "
    "hash-mismatches.  Ingest enforcement: CorpusIngestTask("
    "mime_allowlist=...) quarantines off-list pages (rejected_mime) "
    "before extraction — pytest-pinned (test_mime_gate)",
    "crawl ingestion: MIME/content-type admission gate",
)
def q_mime_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
    )

    path = _crawl_fixture(spark, sf_dir, "warc_mime")
    resp = _crawl.warc_responses(_crawl.read_warc_records(spark, path))
    return resp.select(
        F.regexp_extract("target_uri", r"/p/([0-9]+)$", 1)
        .try_cast("long")
        .alias("doc_id"),
        F.lower(F.trim(F.col("http_content_type"))).alias("content_type"),
        _crawl.mime_admitted(
            F.col("http_content_type"), TEXT_MIME_ALLOWLIST
        ).alias("admitted"),
    )


_MIME_E2E_CACHE: dict[str, tuple[list, object]] = {}


def _mime_e2e_results(spark: SparkSession):
    """Cached drive of the mime_allowlist ingest mode: one WARC batch
    (html page / application/pdf / application/json / no Content-Type
    at all) through CorpusIngestTask(mime_allowlist=..., extract_html=
    True) plus a replay — the declared-binary pages quarantine
    (counted rejected_mime, never reaching html_extract), the
    undeclared page passes, and the replay changes nothing."""
    import os
    import shutil
    import tempfile

    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
        CorpusIngestTask,
    )

    key = spark.sparkContext.applicationId
    if key not in _MIME_E2E_CACHE:
        root = tempfile.mkdtemp(prefix="q_mime_e2e_")
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        task = CorpusIngestTask(
            spark,
            drop,
            os.path.join(root, "corpus"),
            input_format="warc",
            extract_html=True,
            mime_allowlist=TEXT_MIME_ALLOWLIST,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

        def page(uri, body, content_type=None):
            ct = (
                f"Content-Type: {content_type}\r\n" if content_type else ""
            )
            payload = f"HTTP/1.1 200 OK\r\n{ct}\r\n{body}"
            return (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(payload.encode())}\r\n\r\n"
                f"{payload}\r\n\r\n"
            )

        try:
            b1 = (
                page(
                    "https://m.com/html",
                    "<html><body><p>alpha page body</p></body></html>",
                    "text/html",
                )
                + page(
                    "https://m.com/pdf",
                    "%PDF-1.4 fake pdf body text",
                    "application/pdf",
                )
                + page(
                    "https://m.com/json",
                    '{"k": "api payload value"}',
                    "application/json",
                )
                + page(
                    "https://m.com/untyped",
                    "<html><body><p>beta page body</p></body></html>",
                )
            )
            with open(os.path.join(drop, "b1.warc"), "w") as f:
                f.write(b1)
            batch = task._source_frame(streaming=False)
            task._process_batch(batch, 0)
            task._process_batch(batch, 0)  # replay: changes nothing
            stats = task.ingest_stats()
            lits = [
                F.lit(int(stats[k])).alias(k)
                for k in ("admitted", "rejected_mime")
            ]
            quarantined = task.mime_quarantined().select(
                F.lit("mime").alias("channel"),
                F.col("target_uri").alias("info"),
                F.col("content_type"),
                *lits,
            )
            admitted = task.corpus().select(
                F.lit("admitted").alias("channel"),
                F.col("text").alias("info"),
                F.lit(None).cast("string").alias("content_type"),
                *lits,
            )
            frame = admitted.unionByName(quarantined)
            _MIME_E2E_CACHE[key] = (frame.collect(), frame.schema)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return _MIME_E2E_CACHE[key]


@_register(
    "q_mime_e2e_stats",
    """
    SELECT * FROM (VALUES
      ('admitted', 'alpha page body',     CAST(NULL AS VARCHAR), 2, 2),
      ('admitted', 'beta page body',      CAST(NULL AS VARCHAR), 2, 2),
      ('mime',     'https://m.com/json',  'application/json',    2, 2),
      ('mime',     'https://m.com/pdf',   'application/pdf',     2, 2)
    ) AS t(channel, info, content_type, admitted, rejected_mime)
    ORDER BY channel, info
    """,
    "MIME admission gate E2E: CorpusIngestTask(mime_allowlist=..., "
    "extract_html=True) drains a 4-page WARC batch (text/html / "
    "application/pdf / application/json / NO Content-Type header) "
    "plus a replay — the declared-binary pages land in the "
    "_quarantine_mime store with their media type (never reaching "
    "html_extract as garbage prose), the undeclared page admits, the "
    "counters read admitted=2 / rejected_mime=2, and the replay "
    "changes nothing; oracle = the hand-derived disposition of every "
    "page plus the manifest counters",
    "CorpusIngestTask mime_allowlist mode end-to-end (streaming twin "
    "of q_mime_funnel)",
)
def q_mime_e2e_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, schema = _mime_e2e_results(spark)
    return spark.createDataFrame(rows, schema).orderBy("channel", "info")


def _langid_fixture(spark: SparkSession):
    """The language-ID contract fixture: the 48 held-out Latin
    sentences (12 languages x 4, `langid_data.LANGID_TEST`, doc_id =
    sorted-lang index x 4 + k) plus the 8 non-Latin sentences
    (`NONLATIN_TEST`, doc_id 1000+).  None of these appear in the
    training seed — the model's accuracy on them is the contract the
    pytest (test_langid_nb) and the q_langid_latin oracle both pin."""
    from sample_dms_s3_kinesis_spark.operators.langid_data import (
        LANGID_TEST,
        NONLATIN_TEST,
    )

    rows, i = [], 0
    for lang in sorted(LANGID_TEST):
        for s in LANGID_TEST[lang]:
            rows.append((i, lang, s))
            i += 1
    j = 1000
    for lang in sorted(NONLATIN_TEST):
        for s in NONLATIN_TEST[lang]:
            rows.append((j, lang, s))
            j += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@_register(
    "q_langid_latin",
    """
    SELECT * FROM (VALUES
      (0, 'latin', 'de'),
      (1, 'latin', 'de'),
      (2, 'latin', 'de'),
      (3, 'latin', 'de'),
      (4, 'latin', 'en'),
      (5, 'latin', 'en'),
      (6, 'latin', 'en'),
      (7, 'latin', 'en'),
      (8, 'latin', 'es'),
      (9, 'latin', 'es'),
      (10, 'latin', 'es'),
      (11, 'latin', 'es'),
      (12, 'latin', 'fr'),
      (13, 'latin', 'fr'),
      (14, 'latin', 'fr'),
      (15, 'latin', 'fr'),
      (16, 'latin', 'id'),
      (17, 'latin', 'id'),
      (18, 'latin', 'id'),
      (19, 'latin', 'id'),
      (20, 'latin', 'it'),
      (21, 'latin', 'it'),
      (22, 'latin', 'it'),
      (23, 'latin', 'it'),
      (24, 'latin', 'nl'),
      (25, 'latin', 'nl'),
      (26, 'latin', 'nl'),
      (27, 'latin', 'nl'),
      (28, 'latin', 'pl'),
      (29, 'latin', 'pl'),
      (30, 'latin', 'pl'),
      (31, 'latin', 'pl'),
      (32, 'latin', 'pt'),
      (33, 'latin', 'pt'),
      (34, 'latin', 'pt'),
      (35, 'latin', 'pt'),
      (36, 'latin', 'ro'),
      (37, 'latin', 'ro'),
      (38, 'latin', 'ro'),
      (39, 'latin', 'ro'),
      (40, 'latin', 'sv'),
      (41, 'latin', 'sv'),
      (42, 'latin', 'sv'),
      (43, 'latin', 'sv'),
      (44, 'latin', 'tr'),
      (45, 'latin', 'tr'),
      (46, 'latin', 'tr'),
      (47, 'latin', 'tr'),
      (1000, 'arabic', 'ar'),
      (1001, 'arabic', 'ar'),
      (1002, 'kana', 'ja'),
      (1003, 'kana', 'ja'),
      (1004, 'cyrillic', 'ru'),
      (1005, 'cyrillic', 'ru'),
      (1006, 'han', 'zh'),
      (1007, 'han', 'zh')
    ) AS t(doc_id, script, predicted)
    """,
    "real Latin-script language ID (verdict r14 #2): the char-trigram "
    "Naive Bayes model trained on the in-repo 12-language seed corpus "
    "(22 sentences each), routed under the script layer "
    "(lang_id_router: non-Latin scripts read the language off the "
    "code points, Latin text through the broadcast NB model) over the "
    "56-sentence held-out fixture — the oracle is the hand-derived "
    "truth (every held-out sentence classified correctly, 48/48 Latin "
    "+ 8/8 script-routed), so ANY misclassification, script-detect "
    "drift, or router fault hash-mismatches; fixes the LANG_MARKERS "
    "gap where pt/it/nl/pl/tr/sv/ro/id all funneled into en/de/fr/es",
    "classify: char-n-gram NB language ID (script-routed)",
)
def q_langid_latin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import classify

    tm, lm = classify.langid_nb_model(spark)
    return classify.lang_id_router(_langid_fixture(spark), tm, lm)


@_register(
    "q_corpus_composition_nb",
    """
    SELECT * FROM (VALUES
      ('ar', 2, 0.035714), ('de', 4, 0.071429), ('en', 4, 0.071429),
      ('es', 4, 0.071429), ('fr', 4, 0.071429), ('id', 4, 0.071429),
      ('it', 4, 0.071429), ('ja', 2, 0.035714), ('nl', 4, 0.071429),
      ('pl', 4, 0.071429), ('pt', 4, 0.071429), ('ro', 4, 0.071429),
      ('ru', 2, 0.035714), ('sv', 4, 0.071429), ('tr', 4, 0.071429),
      ('zh', 2, 0.035714)
    ) AS t(lang, n_docs, doc_share)
    """,
    "corpus composition by MODEL-assigned language (not a trusted "
    "lang column): lang_id_router predictions over the 56-sentence "
    "multilingual fixture grouped into per-language doc counts and "
    "shares — the report the marker heuristic got wrong for every "
    "Latin-script language outside en/de/fr/es (pt/it/nl/... funneled "
    "into those four); the oracle pins all 16 languages at their true "
    "fixture counts, so any residual misrouting shifts a count and "
    "hash-mismatches",
    "sampling: corpus composition (model-labeled)",
)
def q_corpus_composition_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import classify
    from sample_dms_s3_kinesis_spark.operators.langid_data import (
        LANGID_TEST,
        NONLATIN_TEST,
    )

    tm, lm = classify.langid_nb_model(spark)
    pred = classify.lang_id_router(_langid_fixture(spark), tm, lm)
    total = sum(len(v) for v in LANGID_TEST.values()) + sum(
        len(v) for v in NONLATIN_TEST.values()
    )
    return (
        pred.groupBy(F.col("predicted").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang",
            F.col("n_docs").cast("int").alias("n_docs"),
            F.round(F.col("n_docs") / F.lit(float(total)), 6).alias(
                "doc_share"
            ),
        )
    )


@_register(
    "q_pdf_text_extract",
    """
    WITH s AS (
      SELECT doc_id, text, 1 + doc_id % 3 AS np FROM documents),
    p AS (
      SELECT doc_id, np,
             string_agg('p' || k || ': ' || text,
                        chr(10) || chr(10) ORDER BY k) AS full_text
      FROM s, UNNEST(range(1, np + 1)) AS t(k)
      GROUP BY doc_id, np)
    SELECT doc_id, CAST(np AS INTEGER) AS n_pages,
           md5(full_text) AS text_digest
    FROM p
    """,
    "PDF text-layer extraction roundtrip (verdict r14 Missing #3): "
    "every document framed into a REAL multi-page PDF (1 + doc_id%3 "
    "pages, FlateDecode content streams, page k text = 'p<k>: ' || "
    "text) by the from-scratch writer, read back through the "
    "from-scratch parser (object scan via /Length-aware stream "
    "skipping, zlib inflate, Tj/'/\\\"/TJ text-operator replay in "
    "page-tree order) — output is the page count and the md5 of the "
    "page-joined text, which the oracle recomputes straight from "
    "documents.text, so ANY parse/escape/page-order fault "
    "hash-mismatches; encrypted and non-Flate documents land on the "
    "error channel (pytest-pinned, test_pdf_ops)",
    "multimodal: PDF text extraction",
)
def q_pdf_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import pdf as _pdf

    from sample_dms_s3_kinesis_spark.operators.partitioning import spread

    # PDF encode+decode is per-row Python (mapInPandas); the single-file
    # scan would otherwise run the whole corpus in one task
    d = spread(t(spark, sf_dir, "documents"))
    np_col = (1 + F.col("doc_id") % 3).cast("int")
    pages = F.transform(
        F.sequence(F.lit(1), np_col),
        lambda k: F.concat(
            F.lit("p"), k.cast("string"), F.lit(": "), F.col("text")
        ),
    )
    fixture = d.select(F.col("doc_id"), pages.alias("pages"))
    blobs = _pdf.synthesize_pdf_column(fixture)
    out = _pdf.extract_pdf_text(blobs, content_col="content", id_col="doc_id")
    return out.select(
        "doc_id",
        "n_pages",
        F.md5(F.col("text")).alias("text_digest"),
    )


_PDF_E2E_CACHE: dict[str, tuple[list, object]] = {}


def _pdf_e2e_results(spark: SparkSession):
    """Cached drive of the pdf_text ingest mode: one WARC batch (html
    page / 2-page text PDF / encrypted PDF / LZW-filter PDF / JSON
    API payload) through CorpusIngestTask(mime_allowlist=...,
    pdf_text=True, extract_html=True) plus a replay — the text PDF is
    ADMITTED with its extracted text (counted pdf_extracted, never
    touching html_extract), the undecodable PDFs land in
    _quarantine_pdf with their capability-gap errors (counted
    rejected_pdf), the JSON page still rejects via the MIME gate, and
    the replay changes nothing."""
    import os
    import shutil
    import tempfile

    from sample_dms_s3_kinesis_spark.operators.pdf import encode_pdf
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
        CorpusIngestTask,
    )

    key = spark.sparkContext.applicationId
    if key not in _PDF_E2E_CACHE:
        root = tempfile.mkdtemp(prefix="q_pdf_e2e_")
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        task = CorpusIngestTask(
            spark,
            drop,
            os.path.join(root, "corpus"),
            input_format="warc",
            extract_html=True,
            mime_allowlist=TEXT_MIME_ALLOWLIST,
            pdf_text=True,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

        def page(uri, body, content_type):
            payload = (
                f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
                f"\r\n{body}"
            )
            return (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(payload.encode())}\r\n\r\n"
                f"{payload}\r\n\r\n"
            )

        try:
            good = encode_pdf(
                ["alpha pdf page one", "alpha pdf page two"],
                compress=False,
            ).decode("ascii")
            enc = encode_pdf(
                ["secret"], compress=False, encrypted=True
            ).decode("ascii")
            lzw = encode_pdf(
                ["zz"], compress=False, filter_name="DCTDecode"
            ).decode("ascii")
            b1 = (
                page(
                    "https://f.com/html",
                    "<html><body><p>gamma page body</p></body></html>",
                    "text/html",
                )
                + page("https://f.com/doc.pdf", good, "application/pdf")
                + page("https://f.com/enc.pdf", enc, "application/pdf")
                + page("https://f.com/lzw.pdf", lzw, "application/pdf")
                + page(
                    "https://f.com/api",
                    '{"k": "api payload value"}',
                    "application/json",
                )
            )
            with open(os.path.join(drop, "b1.warc"), "w") as f:
                f.write(b1)
            batch = task._source_frame(streaming=False)
            task._process_batch(batch, 0)
            task._process_batch(batch, 0)  # replay: changes nothing
            stats = task.ingest_stats()
            lits = [
                F.lit(int(stats[k])).alias(k)
                for k in ("admitted", "pdf_extracted", "rejected_pdf")
            ]
            admitted = task.corpus().select(
                F.lit("admitted").alias("channel"),
                F.col("text").alias("info"),
                F.lit(None).cast("string").alias("detail"),
                *lits,
            )
            pdfq = task.pdf_quarantined().select(
                F.lit("pdf").alias("channel"),
                F.col("target_uri").alias("info"),
                F.col("error").alias("detail"),
                *lits,
            )
            mimeq = task.mime_quarantined().select(
                F.lit("mime").alias("channel"),
                F.col("target_uri").alias("info"),
                F.col("content_type").alias("detail"),
                *lits,
            )
            frame = admitted.unionByName(pdfq).unionByName(mimeq)
            _PDF_E2E_CACHE[key] = (frame.collect(), frame.schema)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return _PDF_E2E_CACHE[key]


@_register(
    "q_pdf_funnel",
    """
    SELECT * FROM (VALUES
      ('admitted', 'alpha pdf page one' || chr(10) || chr(10) ||
                   'alpha pdf page two', CAST(NULL AS VARCHAR), 2, 1, 2),
      ('admitted', 'gamma page body',    CAST(NULL AS VARCHAR), 2, 1, 2),
      ('mime',     'https://f.com/api',  'application/json',    2, 1, 2),
      ('pdf',      'https://f.com/enc.pdf', 'encrypted',        2, 1, 2),
      ('pdf',      'https://f.com/lzw.pdf',
                   'unsupported stream filter: DCTDecode',      2, 1, 2)
    ) AS t(channel, info, detail, admitted, pdf_extracted, rejected_pdf)
    ORDER BY channel, info
    """,
    "PDF ingest funnel E2E: CorpusIngestTask(pdf_text=True) drains a "
    "5-page WARC batch (html / 2-page text PDF / encrypted PDF / "
    "DCT-filter PDF / JSON) plus a replay — the text PDF admits with "
    "its EXTRACTED page-joined text (the application/pdf carve-out of "
    "the MIME gate; html_extract never sees it), the undecodable PDFs "
    "land in _quarantine_pdf with their capability-gap error strings, "
    "the JSON page still rejects via the MIME gate, the counters read "
    "admitted=2 / pdf_extracted=1 / rejected_pdf=2, and the replay "
    "changes nothing; oracle = the hand-derived disposition of every "
    "page",
    "CorpusIngestTask pdf_text mode end-to-end (streaming twin of "
    "q_pdf_text_extract)",
)
def q_pdf_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, schema = _pdf_e2e_results(spark)
    return spark.createDataFrame(rows, schema).orderBy("channel", "info")


@_register(
    "q_idn_hosts",
    """
    WITH s AS (SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS v
               FROM documents),
    k AS (
      SELECT doc_id, v,
             CASE WHEN v IN (0, 1, 2) THEN 'xn--mnchen-3ya.de'
                  WHEN v = 3 THEN 'www.xn--caf-dma.co.uk'
                  WHEN v = 4 THEN 'xn--caf-dma.co.uk'
                  ELSE 'plain-host.com' END AS host_folded,
             CASE WHEN v IN (0, 1, 2) THEN 'xn--mnchen-3ya.de'
                  WHEN v IN (3, 4) THEN 'xn--caf-dma.co.uk'
                  ELSE 'plain-host.com' END AS domain,
             CASE WHEN v IN (0, 1, 2)
                    THEN 'de,xn--mnchen-3ya)/p/'
                  WHEN v IN (3, 4)
                    THEN 'uk,co,xn--caf-dma)/p/'
                  ELSE 'com,plain-host)/p/' END
               || CAST(doc_id AS VARCHAR) AS urlkey
      FROM s)
    SELECT doc_id, host_folded, domain, urlkey FROM k
    """,
    "IDN/punycode host identity (verdict r14 #4): doc_id%6 selects the "
    "URL spelling (Unicode münchen.de / its ACE form / UPPERCASE "
    "Unicode / www.café.co.uk / its ACE form / a plain ASCII host), "
    "folded through fold_idn_host (stdlib IDNA nameprep + RFC 3492 "
    "punycode, Arrow-batched and guarded so ASCII rows never leave "
    "Catalyst) into the canonical ACE host, the registered domain "
    "(second-level-suffix co.uk path included) and the idn=True SURT "
    "urlkey — every mirror spelling of one host lands on ONE key "
    "(blocklists, per-host caps, and frontier budgets hang off it); "
    "oracle recomputes all three from doc_id arithmetic",
    "curation: IDN host folding (mirror identity)",
)
def q_idn_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    v = (F.col("doc_id") % 6).cast("int")
    url = F.concat(
        F.when(v == 0, F.lit("https://münchen.de/p/"))
        .when(v == 1, F.lit("https://xn--mnchen-3ya.de/p/"))
        .when(v == 2, F.lit("https://MÜNCHEN.de/p/"))
        .when(v == 3, F.lit("https://www.café.co.uk/p/"))
        .when(v == 4, F.lit("https://xn--caf-dma.co.uk/p/"))
        .otherwise(F.lit("https://plain-host.com/p/")),
        did,
    )
    host = _urls.fold_idn_host(_urls.url_host(url))
    return d.select(
        "doc_id",
        host.alias("host_folded"),
        _urls.registered_domain(host).alias("domain"),
        _urls.surt_urlkey(url, idn=True).alias("urlkey"),
    )


@_register(
    "q_idn_domain_caps",
    """
    WITH s AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS v
               FROM documents),
    k AS (
      SELECT doc_id,
             CASE WHEN v < 3 THEN 'xn--mnchen-3ya.de'
                  ELSE 'other' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             END AS domain
      FROM s)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY domain ORDER BY doc_id
                ) <= 20 AS INTEGER) AS kept
    FROM k
    """,
    "IDN-aware per-domain frequency cap: three mirror spellings of one "
    "domain (Unicode / ACE / a Unicode SUBDOMAIN api.münchen.de) plus "
    "rotating ASCII domains, capped at 20 docs per registered domain "
    "with domain_caps(idn=True) — the mirror spellings share ONE "
    "budget (the evasion the fold closes: without it each spelling "
    "minted a fresh cap); oracle recomputes the shared-domain ranks "
    "from doc_id arithmetic",
    "curation: IDN-aware domain caps",
)
def q_idn_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    v = (F.col("doc_id") % 4).cast("int")
    url = F.concat(
        F.when(v == 0, F.lit("https://münchen.de/p/"))
        .when(v == 1, F.lit("https://xn--mnchen-3ya.de/p/"))
        .when(v == 2, F.lit("https://api.münchen.de/p/"))
        .otherwise(
            F.concat(
                F.lit("https://other"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".com/p/"),
            )
        ),
        did,
    )
    fixture = d.select("doc_id", url.alias("url"))
    return _urls.domain_caps(
        fixture, max_per_domain=20, order_col="doc_id", idn=True
    ).select("doc_id", "kept")


_LANGID_E2E_CACHE: dict[str, tuple[list, object]] = {}


def _langid_e2e_results(spark: SparkSession):
    """Cached drive of the lang_id ingest mode: five held-out fixture
    documents (pt/pl/en Latin + zh/ru non-Latin) through
    CorpusIngestTask(lang_id=True) plus a replay — every admitted doc
    carries the router's language label, and the replay changes
    nothing.  The expected labels are the fixture truth the 48/48 +
    8/8 contract already pins."""
    import json as _json
    import os
    import shutil
    import tempfile

    from sample_dms_s3_kinesis_spark.operators.langid_data import (
        LANGID_TEST,
        NONLATIN_TEST,
    )
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        CorpusIngestTask,
    )

    key = spark.sparkContext.applicationId
    if key not in _LANGID_E2E_CACHE:
        root = tempfile.mkdtemp(prefix="q_langid_e2e_")
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        docs = [
            (1, LANGID_TEST["pt"][0]),
            (2, LANGID_TEST["pl"][1]),
            (3, LANGID_TEST["en"][2]),
            (4, NONLATIN_TEST["zh"][0]),
            (5, NONLATIN_TEST["ru"][1]),
        ]
        with open(os.path.join(drop, "b1.jsonl"), "w") as f:
            f.write(
                "\n".join(
                    _json.dumps({"doc_id": i, "text": t})
                    for i, t in docs
                )
            )
        task = CorpusIngestTask(
            spark,
            drop,
            os.path.join(root, "corpus"),
            lang_id=True,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        try:
            batch = task._source_frame(streaming=False)
            task._process_batch(batch, 0)
            task._process_batch(batch, 0)  # replay: changes nothing
            frame = task.corpus().select("doc_id", "lang")
            _LANGID_E2E_CACHE[key] = (frame.collect(), frame.schema)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return _LANGID_E2E_CACHE[key]


@_register(
    "q_ingest_langid_e2e",
    """
    SELECT * FROM (VALUES
      (1, 'pt'), (2, 'pl'), (3, 'en'), (4, 'zh'), (5, 'ru')
    ) AS t(doc_id, lang)
    ORDER BY doc_id
    """,
    "language-labeled ingest E2E: CorpusIngestTask(lang_id=True) "
    "drains a 5-document multilingual batch (pt/pl/en held-out "
    "fixture sentences + zh/ru non-Latin) plus a replay — every "
    "admitted document carries the lang_id_router's label (Latin via "
    "the session-cached char-trigram NB model, non-Latin off the code "
    "points), the labels ride the corpus parquet, and the replay "
    "changes nothing; oracle = the fixture truth the 48/48 + 8/8 "
    "langid contract pins — any label drift hash-mismatches",
    "CorpusIngestTask lang_id mode end-to-end (streaming twin of "
    "q_langid_latin)",
)
def q_ingest_langid_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, schema = _langid_e2e_results(spark)
    return spark.createDataFrame(rows, schema).orderBy("doc_id")


@_register(
    "q_pdf_feature_matrix",
    """
    SELECT * FROM (VALUES
      ('plain',              1, 'plain alpha page'),
      ('multipage',          2, 'page one text' || chr(10) || chr(10)
                                || 'page two text'),
      ('unicode',            1, 'café 中文 页面'),
      ('uncompressed_ascii', 1, 'ascii body'),
      ('objstm',             1, 'objstm body text'),
      ('cmap_subset_font',   1, 'Map OK'),
      ('lzw',                1, 'matrix page text'),
      ('ascii85',            1, 'matrix page text'),
      ('hex_flate_chain',    1, 'matrix page text'),
      ('png_predictor',      1, 'matrix page text'),
      ('encrypted',          CAST(NULL AS INTEGER), 'encrypted'),
      ('unsupported_filter', CAST(NULL AS INTEGER),
                             'unsupported stream filter: DCTDecode'),
      ('image_only',         1, 'image_only'),
      ('not_a_pdf',          CAST(NULL AS INTEGER),
                             'ValueError: not a PDF (missing %PDF- header)')
    ) AS t(kind, n_pages, result)
    """,
    "the full PDF decoder feature matrix, driver-visible: one "
    "deterministic document per capability (multi-page / unicode "
    "UTF-16BE strings / pure-ASCII / PDF 1.5 ObjStm-packed page tree "
    "/ subset-font ToUnicode CMap with INHERITED /Pages resources / "
    "LZW / ASCII85 / a two-filter hex+Flate chain / PNG predictor) "
    "and per error channel (encrypted / DCT reject / image-only / "
    "not-a-PDF), extracted through the Arrow mapInPandas operator — "
    "oracle = the hand-derived truth of every cell, so ANY parser or "
    "filter regression hash-mismatches in the driver gate, not just "
    "in pytest",
    "multimodal: PDF decoder feature matrix",
)
def q_pdf_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_s3_kinesis_spark.operators import pdf as _pdf

    corpus = _pdf.synthetic_pdf_corpus(spark)
    out = _pdf.extract_pdf_text(
        corpus, content_col="content", id_col="asset_id"
    )
    return (
        out.join(corpus.select("asset_id", "kind"), "asset_id")
        .select(
            "kind",
            "n_pages",
            F.coalesce(F.col("text"), F.col("error")).alias("result"),
        )
    )
