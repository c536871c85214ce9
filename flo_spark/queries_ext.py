"""Extended query catalog — TPC-H-adapted relational coverage plus
window/statistical/set operators not in the core catalog.

Registered into the same ``REGISTRY`` as ``flo_spark.queries`` (this
module is imported by it at the bottom); every entry follows the same
conventions: identical aliases in Spark and oracle SQL, money rounded
2dp, ratios 4dp, every LIMIT ordered by a unique tie-break key.

The driver's testdata is a REDUCED TPC-H schema (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no phone/comment columns), so
the classic queries are adapted: the part↔supplier link goes through
lineitem, Q4/Q12's lateness predicates become returnflag/priority
predicates, and Q22's country code becomes c_nationkey.  Each
docstring notes the adaptation.

Scale notes (100 TB): every query shuffles the fact table at most
once on its aggregation key.  Broadcast HINTS are reserved for
fixed-cardinality sides (nation=25, region=5, single-row scalar
aggregates, static lookup sets); SF-scaling tables
(customer/supplier/part and frames derived from them) carry NO hint —
a hint is a command that overrides the size threshold and OOMs the
build side at 100 TB, while the size-based planner/AQE picks
broadcast at bench scale anyway (plan-tested) and degrades to a key
shuffle at cluster scale.  Window queries partition by a
high-cardinality key (custkey/partkey) so state per task stays
bounded; no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flo_spark.queries import (
    load,
    money_scaled,
    money_sum,
    money_sum_sql,
    query,
)


# --------------------------------------------------------------------------
# TPC-H adaptations
# --------------------------------------------------------------------------


@query(
    "q2_min_acctbal_supplier",
    """
    WITH ps AS (
      SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY p_partkey ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
      FROM ps
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM ranked WHERE rn = 1
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp: the part↔supplier relation is
    derived from lineitem shipments; min s_acctbal stands in for min
    ps_supplycost).  Fixed-cardinality dims (nation/region) are hinted
    broadcast; part/supplier scale with SF so their strategy is left
    to the size threshold/AQE (broadcast at bench scale, shuffle at
    100 TB).  The only other shuffle is the window's hash partition on
    p_partkey."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (no l_commitdate: 'late' orders become orders
    with a returned line).  EXISTS = left-semi join; the orders-side
    date filter is pushed to the scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    f"""
    SELECT {money_sum_sql("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate reaches
    the parquet reader (PushedFilters), zero shuffle beyond the final
    single-row combine."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue"
        )
    )


@query(
    "q7_volume_shipping",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation shipping volume (all nation pairs
    rather than one pair — the driver data uses synthetic nation
    names).  Nation joined twice under different aliases."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q8_market_share",
    """
    WITH all_sales AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA'
    )
    SELECT o_year,
           floor(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                 ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of supplier revenue into AMERICA's
    customer market, per order year.  Conditional aggregation over one
    fact shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == r["r_regionkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.floor(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", vol)
                        .otherwise(0.0)
                        .cast("decimal(18,4)")
                    ).cast("double")
                    / F.sum(vol.cast("decimal(18,4)")).cast("double")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    f"""
    SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
           {money_sum_sql("l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity")}
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp: cost proxied as half retail
    price; part filter by type instead of name-contains)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(money_sum(profit).alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal,
           n.n_name AS n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a
    quarter.  Top-k = TakeOrderedAndProject (no global sort
    materialization); tie-broken on c_custkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q11_important_parts",
    """
    WITH g AS (
      SELECT l.l_partkey AS partkey,
             sum(l.l_quantity) AS part_qty,
             CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))), 2) AS DOUBLE) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT partkey, part_qty, part_value
    FROM g
    WHERE part_qty * (SELECT count(*) FROM g) > 2 * (SELECT sum(part_qty) FROM g)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: per-part shipped value from one
    nation's suppliers stands in for stock value).  The HAVING-vs-global-
    total scalar subquery is a broadcast of a 1-row aggregate; the
    grouped frame is persisted so the fact shuffles exactly once even
    though it feeds both the total and the filtered output.  The
    classic fixed-fraction threshold empties as SF grows (share per
    part ~ 1/|parts|), so the cut is scale-FREE: parts with more than
    2x the mean share.  Pure integer-valued-double arithmetic
    (quantities integral, sums exact) — no float-boundary ambiguity
    between engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    g = (
        li.join(supp, li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum("l_quantity").alias("part_qty"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("part_value"),
        )
        .persist()
    )
    total = g.agg(
        F.sum("part_qty").alias("__total_qty"),
        F.count("*").alias("__n_parts"),
    )
    return (
        g.join(F.broadcast(total))
        .filter(
            F.col("part_qty") * F.col("__n_parts") > 2 * F.col("__total_qty")
        )
        .select("partkey", "part_qty", "part_value")
    )


@query(
    "q12_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode/commitdate: lines grouped by
    linestatus, split by order priority)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a LEFT OUTER join
    (customers with zero orders count as c_count = 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    """
    SELECT floor(100.0
                 * CAST(sum(CAST(floor((CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                       * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                       * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month.  part scales with
    SF — no forced broadcast; the size threshold/AQE picks broadcast
    at bench scale and a key shuffle at 100 TB."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # ratio of EXACT scaled-long sums (identical ints on both engines),
    # floor-rounded over the identical quotient double — the q7/q8
    # cross-engine boundary-flip class can't occur
    return li.join(p, li["l_partkey"] == p["p_partkey"]).agg(
        (
            F.floor(
                100.0
                * F.sum(
                    money_scaled(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
                    )
                ).cast("double")
                / F.sum(money_scaled(rev)).cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("promo_revenue")
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue.  The scalar
    max is a window over the tiny per-supplier aggregate (|suppliers|
    rows), not over the fact table, so the unpartitioned window is
    safe at any scale."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("total_revenue")
    )
    rev = rev.withColumn(
        "__max", F.max("total_revenue").over(Window.partitionBy())
    )
    return (
        rev.filter(F.col("total_revenue") == F.col("__max"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 30, 36)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp: supplier count per part group
    derived from shipment lines; no comment-based supplier exclusion)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 30, 36))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH part_avg AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0 * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5' AND l.l_quantity < a.half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-half-average-quantity lines for one
    brand.  The correlated subquery becomes an aggregate-then-join.
    Both join sides (filtered part, per-part averages) scale with SF,
    so neither carries a forced broadcast — the threshold/AQE decides
    (broadcast at bench scale; at 100 TB both joins hash on l_partkey
    and AQE can reuse the partitioning)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(part_avg, li["l_partkey"] == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                        "double"
                    )
                    / 7.0
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           {money_sum_sql("l.l_quantity")} AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING sum(CAST(floor(l.l_quantity * 10000 + 0.5) AS BIGINT)) > 2000000
    ORDER BY o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 200 (threshold
    scaled to the driver data's ~7-line orders), top-100 by price.

    Shape: pre-aggregate lineitem by orderkey FIRST and filter on the
    HAVING threshold, so the only big shuffle is the fact aggregation;
    the surviving set is tiny (HAVING is selective by design), so AQE
    broadcast-joins it to orders — versus the naive
    lineitem⋈orders⋈customer → 5-column regroup, which shuffles the
    fact twice and orders once.  o_orderkey is unique, so grouping by
    the customer columns adds nothing semantically."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money_scaled(F.col("l_quantity"))).alias("__qty"))
        .filter(F.col("__qty") > 200 * 10000)
    )
    return (
        o.join(qty, o["o_orderkey"] == qty["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            (
                F.floor((F.col("__qty") + F.lit(50)) / F.lit(100.0))
                / F.lit(100.0)
            ).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-predicate join filter (3 OR'd
    brand/size/quantity triples)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@query(
    "q20_promo_part_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE' AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small %'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50
    )
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp/availqty: 'has excess stock'
    becomes 'shipped >50 units of one small part in the window'; the
    nation filter widens to region so the result is non-trivial on the
    synthetic data).  IN-over-grouped-HAVING = distinct candidate set +
    left-semi join; the fact shuffles once on (suppkey, partkey);
    nation/region are hinted broadcast, while part and the candidate
    set scale with SF so their strategy is left to the threshold/AQE.
    Threshold compare is exact (integral quantities)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small %"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    # the candidate set is bounded by |suppliers|, which scales with SF:
    # no forced broadcast — AQE sees the post-HAVING size at runtime and
    # broadcasts exactly when it fits (it does at bench scale)
    return supp.join(
        cand, supp["s_suppkey"] == cand["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_5' AND l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no l_receiptdate: 'late delivery' becomes a
    returned line; finds the sole guilty supplier in multi-supplier
    orders).  The correlated EXISTS / NOT-EXISTS pair is decorrelated
    manually into ONE per-order aggregate — n_supp>1 <=> another
    supplier exists, n_ret_supp==1 <=> no OTHER supplier has a returned
    line (l1 itself is returned) — so lineitem shuffles once for the
    stats and once for the orderkey join, instead of the three
    semi/anti-join fact scans a literal translation would cost.  The
    oracle keeps the EXISTS formulation, making the two derivations
    independent."""
    li = load(spark, sf_dir, "lineitem")
    # two-level aggregate instead of countDistinct: a countDistinct pair
    # would plan as Expand (2x fact rows); pre-aggregating on
    # (orderkey, suppkey) gets map-side partials and feeds the per-order
    # rollup with one already-shrunk shuffle
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "__has_r"
        )
    )
    stats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("__n_supp"),
        F.sum("__has_r").alias("__n_ret_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "s_name"
    )
    return (
        l1.join(supp, l1["l_suppkey"] == F.col("s_suppkey"))
        .join(o, l1["l_orderkey"] == o["o_orderkey"], "left_semi")
        .join(stats, "l_orderkey")
        .filter((F.col("__n_supp") > 1) & (F.col("__n_ret_supp") == 1))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_prospective_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22_prospective_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone: grouped by c_nationkey instead of
    country code).  Scalar subquery = broadcast 1-row cross join; NOT
    EXISTS = left-anti join against order custkeys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# additional relational operators (window frames, stats, grouping sets,
# full outer join, quantiles)
# --------------------------------------------------------------------------


@query(
    "full_outer_nation_presence",
    """
    WITH cust AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_customers
      FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier WHERE s_acctbal > 5000.0 GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_customers, 0) AS n_customers,
           coalesce(s.n_suppliers, 0) AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    """,
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered per-nation aggregates; nations
    present on only one side surface with a zero count."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000.0)
    cust = c.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count("*").alias("n_customers")
    )
    supp = s.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count("*").alias("n_suppliers")
    )
    return (
        cust.join(supp, cust["c_nk"] == supp["s_nk"], "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_price, count(*) AS n_lines
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS with grouping() indicator columns —
    expressed through Spark SQL (Catalyst Expand operator; one pass
    over the fact, rows replicated once per matching set)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_price, count(*) AS n_lines
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "quantiles_by_returnflag",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90_price,
           round(quantile_cont(l_discount, 0.25), 4) AS p25_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantiles_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (median / p90 / p25) per group —
    Spark `median`/`percentile` match DuckDB `median`/`quantile_cont`
    (both linear-interpolating)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", 0.90), 4).alias("p90_price"),
        F.round(F.percentile("l_discount", 0.25), 4).alias("p25_disc"),
    )


@query(
    "stats_by_linestatus",
    """
    WITH s AS (
      SELECT l_linestatus,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,0))) AS DOUBLE) AS sq,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,0))
                      * CAST(l_quantity AS DECIMAL(19,0))) AS DOUBLE) AS sqq,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sp,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS spp,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,0))
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sqp,
             CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sd,
             CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS DECIMAL(19,0))
                      * CAST(floor(l_discount * 100 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sdd
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus,
           floor(sqrt((sqq - sq * sq / n) / (n - 1)) * 10000 + 0.5) / 10000
               AS sd_qty,
           floor((sdd - sd * sd / n) / (n - 1) / 10000 * 1000000 + 0.5) / 1000000
               AS var_disc,
           floor((sqp - sq * sp / n)
                 / sqrt((sqq - sq * sq / n) * (spp - sp * sp / n))
                 * 10000 + 0.5) / 10000 AS corr_qty_price,
           floor((sqp - sq * sp / n) / (n - 1) / 100 * 100 + 0.5) / 100
               AS cov_qty_price
    FROM s
    """,
)
def stats_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — sample stddev/variance, Pearson
    correlation, sample covariance — computed EXACTLY from decomposable
    scaled-integer power sums (n, Σx, Σx², Σy, Σy², Σxy as
    decimal(38,0) integers, identical on both engines), then derived
    in double from those identical inputs.  The builtin stddev/corr
    aggregates fold doubles in engine-specific orders, so their low
    bits differ cross-engine and a rounding boundary can flip — the
    same class as the r5 q7 failure, eliminated here at the source.
    The power sums are also the map-side-combinable form every
    distributed stats engine ships at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    qs = F.col("l_quantity").cast("decimal(19,0)")  # integral by data
    ps = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "decimal(19,0)"
    )
    ds = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("decimal(19,0)")
    s = li.groupBy("l_linestatus").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(qs).cast("double").alias("sq"),
        F.sum(qs * qs).cast("double").alias("sqq"),
        F.sum(ps).cast("double").alias("sp"),
        F.sum(ps * ps).cast("double").alias("spp"),
        F.sum(qs * ps).cast("double").alias("sqp"),
        F.sum(ds).cast("double").alias("sd"),
        F.sum(ds * ds).cast("double").alias("sdd"),
    )
    n, sq, sqq = F.col("n"), F.col("sq"), F.col("sqq")
    sp, spp, sqp = F.col("sp"), F.col("spp"), F.col("sqp")
    sd, sdd = F.col("sd"), F.col("sdd")
    return s.select(
        "l_linestatus",
        (
            F.floor(
                F.sqrt((sqq - sq * sq / n) / (n - 1)) * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("sd_qty"),
        (
            F.floor(
                (sdd - sd * sd / n) / (n - 1) / 10000 * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("var_disc"),
        (
            F.floor(
                (sqp - sq * sp / n)
                / F.sqrt((sqq - sq * sq / n) * (spp - sp * sp / n))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("corr_qty_price"),
        (
            F.floor((sqp - sq * sp / n) / (n - 1) / 100 * 100 + F.lit(0.5))
            / 100
        ).alias("cov_qty_price"),
    )


@query(
    "ntile_price_quartiles",
    """
    WITH t AS (
      SELECT o_totalprice,
             ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
      FROM orders
    )
    SELECT quartile, count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM t GROUP BY quartile
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile assignment over a global price order, then
    per-quartile bounds.  NOTE: the unpartitioned window is a
    deliberate single-sort demonstration; the quartile boundaries it
    yields are what `percentile` computes distributively — prefer that
    at 100 TB."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "rolling_30d_customer_spend",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def rolling_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window: per-customer rolling 30-day spend.
    Spark's rangeBetween needs a numeric order key, so the timestamp
    is ordered as epoch seconds with a 30-day offset — identical
    semantics to the oracle's INTERVAL frame (ties on o_orderdate
    share one frame in both engines)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("spend_30d"),
    )


def _register() -> None:  # imported for side effects by flo_spark.queries
    return None


# --------------------------------------------------------------------------
# LLM-pipeline: composite document quality score
# --------------------------------------------------------------------------


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


@query(
    "quality_score",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS words,
             length(text) AS n_chars_t,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                 AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             greatest(len(words), 1) AS n_words,
             len(list_filter(words,
                 x -> list_contains(['the','a','of','and','to','in','is','it','for','on'], x)))
                 AS n_stop,
             n_punct, n_chars_t
      FROM w
    )
    SELECT doc_id,
           round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stop_ratio,
           round(CAST(n_punct AS DOUBLE) / greatest(n_chars_t, 1), 4) AS punct_ratio,
           round(0.5 * least(CAST(n_words AS DOUBLE) / 50.0, 1.0)
                 + 0.3 * (CAST(n_stop AS DOUBLE) / n_words)
                 + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars_t, 1)),
                 4) AS quality
    FROM m
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (LLM-data curation heuristic):
    length saturation + stopword density (real-language signal) +
    low-punctuation-noise.  All JVM expressions — no UDF in the path;
    at 100 TB this is a pure map stage fused into the parquet scan."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    n_words = F.greatest(F.size(words), F.lit(1))
    n_stop = F.size(
        F.filter(words, lambda x: x.isin(*_STOPWORDS))
    )
    n_chars_t = F.length("text")
    n_punct = n_chars_t - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    stop_ratio = n_stop.cast("double") / n_words
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars_t, F.lit(1))
    return d.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(
            0.5 * F.least(n_words.cast("double") / 50.0, F.lit(1.0))
            + 0.3 * stop_ratio
            + 0.2 * (1.0 - punct_ratio),
            4,
        ).alias("quality"),
    )


# --------------------------------------------------------------------------
# streaming: stream-static join + custom stateful operator
# --------------------------------------------------------------------------


@query(
    "stream_static_join_tiers",
    """
    SELECT 'tier' || CAST(user_id % 5 AS VARCHAR) AS tier,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY tier
    """,
)
def stream_static_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming events feed joins a static
    (broadcast) dimension per micro-batch, then aggregates per tier.
    The static side is re-resolved every batch — Spark's analog of a
    slowly-changing broadcast dim at 100 TB."""
    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    tiers = spark.createDataFrame(
        [(i, f"tier{i}") for i in range(5)], ["tier_id", "tier"]
    )
    ev = _events_stream(spark, sf_dir).withColumn(
        "tier_id", (F.col("user_id") % 5).cast("long")
    )
    joined = ev.join(F.broadcast(tiers), "tier_id")
    agg = joined.groupBy("tier").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
    )
    return run_to_memory(agg, await_new=False, output_mode="complete", shuffle_partitions=8)


@query(
    "stream_stateful_user_stats",
    """
    SELECT user_id, count(*) AS n_events, round(max(value), 2) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, max) kept in explicit state — the
    Spark-native form of flo's per-consumer cursor state
    (consumer_stream/mod.rs:84-119).  State is partitioned by key
    across executors; each micro-batch updates and emits its keys.
    Deterministic here because the drained input is one file => one
    micro-batch; rounding happens Spark-side after the UDF."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("raw_max", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cnt", T.LongType()),
            T.StructField("mx", T.DoubleType()),
        ]
    )

    def update_user(key, pdf_iter, state):
        (user_id,) = key
        if state.exists:
            cnt, mx = state.get
        else:
            cnt, mx = 0, float("-inf")
        for pdf in pdf_iter:
            cnt += len(pdf)
            bmax = pdf["value"].max()
            if bmax == bmax:  # skip all-NaN batches
                mx = max(mx, float(bmax))
        state.update((cnt, mx))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [cnt], "raw_max": [mx]}
        )

    ev = _events_stream(spark, sf_dir)
    stats = ev.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    res = run_to_memory(stats, await_new=False, output_mode="update", shuffle_partitions=8)
    return res.select(
        "user_id", "n_events", F.round("raw_max", 2).alias("max_value")
    )


@query(
    "correlated_scalar_subquery",
    """
    SELECT o.o_orderkey, o.o_orderpriority,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (SELECT avg(i.o_totalprice) FROM orders i
                                  WHERE i.o_orderpriority = o.o_orderpriority)
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text interface: a correlated scalar subquery (orders priced
    >1.5× the average of their own priority class) submitted as-is —
    Catalyst decorrelates it into aggregate-then-join automatically
    (the rewrite q17 does by hand), so the 100 TB plan is one small
    per-priority aggregate broadcast against the fact scan, never a
    per-row subquery execution."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("flo_corr_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_orderpriority,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM flo_corr_orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(i.o_totalprice) FROM flo_corr_orders i
            WHERE i.o_orderpriority = o.o_orderpriority)
        """
    )


@query(
    "stream_stream_join_attribution",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: purchases attributed to
    a click by the same user within the preceding 30 minutes.  Both
    sides are streaming reads; the watermarks + the time-range join
    condition bound the join state Spark must retain (clicks older than
    watermark - 30 min are evicted), which is what makes a stream-stream
    join feasible at 100 TB — state is O(window), not O(stream).
    Deterministic under the drain trigger: inner-join matches emit in
    the micro-batch the match arrives, and one input file = one batch."""
    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts >= click_ts "
            "AND p_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
    ).select("user_id", "click_id", "purchase_id")
    return run_to_memory(joined, await_new=False, output_mode="append", shuffle_partitions=8)


@query(
    "rollup_daily_from_hourly",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           floor(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000
               AS avg_value
    FROM events GROUP BY 1, event_type
    """,
)
def rollup_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the raw events are rolled
    up ONCE into hourly buckets, and the daily answer is computed by
    RE-aggregating the hourly rollup (sum-of-sums, min-of-mins, avg
    derived as sum/count) — never rescanning raw data.  The oracle
    aggregates raw directly, so the hash-match proves the two-level
    rollup is lossless.  At 100 TB the hourly rollup is ~10^4× smaller
    than raw; every dashboard-style query downstream reads it instead
    (see flo_spark/operators/rollup.py for incremental maintenance)."""
    from flo_spark.operators.rollup import reaggregate, rollup_events

    ev = load(spark, sf_dir, "events")
    hourly = rollup_events(ev, "1 hour", ["event_type"])
    daily = reaggregate(hourly, "1 day", ["event_type"])
    return daily.select(
        "bucket",
        "event_type",
        "n_events",
        F.round("sum_value", 2).cast("double").alias("sum_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
        # derived average, rounded with a pure-IEEE floor formula on the
        # ROUNDED decimal sum cast to double: floor(x*1e4 + 0.5)/1e4
        # over identical doubles is bit-identical in both engines
        # (round() on a double is NOT: Spark rounds the shortest
        # decimal string, DuckDB the binary value).
        (
            F.floor(
                F.round("sum_value", 2).cast("double")
                / F.col("n_events")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("avg_value"),
    )


@query(
    "array_hof_vector_norms",
    """
    SELECT vec_id, len(embedding) AS dim,
           floor(sqrt(list_aggregate(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum')) * 10000 + 0.5) / 10000 AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def array_hof_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform / aggregate / filter)
    mirrored against DuckDB list lambdas: per-vector L2 norm and
    positive-component count.  Elements are cast to DOUBLE inside the
    lambda in BOTH engines so the sequential fold adds identical
    doubles (bit-identical), and the norm is rounded with the
    pure-IEEE floor formula.

    Scale note: HOF lambdas evaluate interpreted (~10 µs/step, never
    codegen'd — measured) — right for per-row array bookkeeping like
    this, wrong for bulk linear algebra, which lives in the Arrow
    mapInPandas matmul path (operators/similarity.py)."""
    e = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.floor(F.sqrt(sq_sum) * 10000 + F.lit(0.5)) / 10000).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "corpus_curation_filter",
    r"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
               AS n_tokens,
             CASE
               WHEN n_chars < 100 THEN 'too_short'
               WHEN NOT (text LIKE '% the %' OR text LIKE 'the %')
                 THEN 'non_english'
               WHEN len(list_distinct(string_split(text, ' '))) * 3
                    < len(string_split(text, ' ')) THEN 'low_diversity'
               ELSE 'none'
             END AS drop_reason
      FROM documents
    )
    SELECT doc_id, lang, n_chars, n_tokens, drop_reason,
           drop_reason = 'none' AS keep
    FROM scored
    """,
)
def corpus_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation decision: each document gets a
    keep/drop verdict with the FIRST failing rule as the reason
    (too-short, non-English marker, low lexical diversity — i.e.
    repetition spam) plus the token count that downstream budgeting
    needs.  Thresholds are integer arithmetic (distinct*3 < total
    instead of a float ratio) so the cross-engine hash has no rounding
    surface.  All JVM expressions —
    at 100 TB this is a single map stage fused into the parquet scan,
    and the verdict column is exactly what a curation pipeline
    partitions the corpus by before dedup/training-mix stages."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    is_en = F.col("text").like("% the %") | F.col("text").like("the %")
    reason = (
        F.when(F.col("n_chars") < 100, "too_short")
        .when(~is_en, "non_english")
        .when(
            F.size(F.array_distinct(words)) * 3 < F.size(words), "low_diversity"
        )
        .otherwise("none")
    )
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_tokens"),
        reason.alias("drop_reason"),
        (reason == "none").alias("keep"),
    )


@query(
    "null_semantics_audit",
    """
    WITH o AS (
      SELECT o_custkey % 100 AS grp,
             NULLIF(o_orderpriority, '1-URGENT') AS pri
      FROM orders
    )
    SELECT grp, count(*) AS n_rows, count(pri) AS n_nonnull,
           count(DISTINCT pri) AS n_distinct,
           CAST(sum(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM o GROUP BY grp
    """,
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics, cross-engine verified: nulls derived via
    NULLIF, then the aggregate forms that treat them differently —
    count(*) vs count(col) (null-skipping) vs count(DISTINCT col)
    (null-excluding) vs an explicit IS NULL tally.  The testdata ships
    no physical nulls, so deriving them keeps the audit deterministic."""
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 100).alias("grp"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri"),
    )
    return o.groupBy("grp").agg(
        F.count("*").alias("n_rows"),
        F.count("pri").alias("n_nonnull"),
        F.count_distinct("pri").alias("n_distinct"),
        F.sum(F.when(F.col("pri").isNull(), 1).otherwise(0)).alias("n_null"),
    )


@query(
    "window_rank_suite",
    """
    SELECT o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(o_orderkey) OVER w AS cheapest_key,
           last_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window completeness: percent_rank / cume_dist /
    first_value, plus last_value with an explicit unbounded-following
    frame (the default frame stops at the current row, a classic
    silent-wrong-answer).  percent_rank's (rank-1)/(n-1) divides the
    same integers in both engines, so no rounding is needed for the
    value hash.  Partitioned by o_orderpriority — bounded per-task
    state at any scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(wfull).alias("priciest_key"),
    )


@query(
    "merge_upsert_customers",
    """
    WITH updates AS (
      SELECT c_custkey AS key, round(c_acctbal + 100, 2) AS acctbal,
             c_name AS name
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS key, 0.0 AS acctbal,
             'NEW-' || c_name AS name
      FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT coalesce(u.key, c.c_custkey) AS c_custkey,
           coalesce(u.acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
           coalesce(u.name, c.c_name) AS c_name,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN u.key IS NULL THEN 'keep' ELSE 'update' END AS merge_op
    FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.key
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style MERGE/upsert: apply an updates batch to a base table —
    matched rows take the update, unmatched updates insert, untouched
    base rows pass through — expressed as a full-outer join + coalesce
    (the engine-level shape of ``MERGE INTO ... WHEN MATCHED``).  The
    updates here are derived deterministically from the base so the
    oracle states the identical transformation.

    Scale note: both sides shuffle on the merge key once; with a
    transactional table format the same plan narrows to the touched
    files via data skipping on key ranges.  The updates side is usually
    small — AQE converts the join to broadcast at runtime."""
    c = load(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("key"),
            F.round(F.col("c_acctbal") + 100, 2).alias("acctbal"),
            F.col("c_name").alias("name"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("key"),
                F.lit(0.0).alias("acctbal"),
                F.concat(F.lit("NEW-"), F.col("c_name")).alias("name"),
            )
        )
    )
    merged = c.join(updates, c["c_custkey"] == updates["key"], "full_outer")
    return merged.select(
        F.coalesce("key", "c_custkey").alias("c_custkey"),
        F.coalesce("acctbal", F.round("c_acctbal", 2)).alias("c_acctbal"),
        F.coalesce("name", "c_name").alias("c_name"),
        F.when(c["c_custkey"].isNull(), "insert")
        .when(updates["key"].isNull(), "keep")
        .otherwise("update")
        .alias("merge_op"),
    )


@query(
    "dedup_clusters_minhash",
    r"""
    WITH RECURSIVE g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS w
            FROM documents)
    ),
    edges AS (
      SELECT a.doc_id AS ea, b.doc_id AS eb
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.5
    ),
    sym AS (
      SELECT ea AS a, eb AS b FROM edges
      UNION SELECT eb, ea FROM edges
    ),
    nodes AS (SELECT DISTINCT a AS n FROM sym),
    reach(src, dst) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    labels AS (SELECT src AS node, min(dst) AS label FROM reach GROUP BY src)
    SELECT label AS canonical_doc_id,
           count(*) AS cluster_size,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members_csv
    FROM labels GROUP BY label HAVING count(*) >= 2
    """,
)
def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup pipeline: MinHash-LSH near-dup PAIRS →
    connected components → duplicate CLUSTERS with a canonical
    (min-id) representative.  This is the full production shape —
    transitive closure matters because A~B and B~C put A and C in one
    cluster even though LSH never compared them.

    Oracled via a recursive-CTE transitive closure over the exact
    all-pairs jaccard edge set (valid because LSH recall is 1 on this
    corpus — see ``dedup_minhash_lsh``).  Members are emitted as a
    comma-joined string, not an array: scalar columns canonicalize
    identically across engines."""
    from flo_spark.operators.dedup import minhash_lsh_pairs
    from flo_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return (
        comp.groupBy(F.col("label").alias("canonical_doc_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members_csv"),
        )
        .filter(F.col("cluster_size") >= 2)
    )


@query(
    "batch_sessionization",
    """
    WITH t AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), f AS (
      SELECT *, CASE WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), s AS (
      SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_idx
      FROM f
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           max(sec) - min(sec) AS duration_sec
    FROM s GROUP BY user_id, session_idx
    """,
)
def batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): events per user are cut
    into sessions at >30 min inactivity gaps via lag + running sum of
    boundary flags — the batch twin of the streaming
    ``session_windows_30m`` entry.  Both windows partition by user_id
    (high cardinality), so per-task state stays bounded and the whole
    query is two passes over one user-keyed shuffle at any scale."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # floor of epoch seconds via unix_micros: matches the oracle's
        # floor(epoch(ts)) exactly and is legal for TIMESTAMP (load()
        # normalizes); cast("long") crashes on TIMESTAMP_NTZ
        F.floor(F.expr("unix_micros(ts)") / F.lit(1_000_000))
        .cast("long")
        .alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(F.col("sec") - F.lag("sec").over(w) > 1800, 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("duration_sec"),
    )


@query(
    "udaf_geomean_price",
    """
    SELECT l_returnflag, l_linestatus,
           round(exp(avg(ln(l_extendedprice))), 2) AS geomean_price,
           count(*) AS n_items
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface: a GROUPED_AGG Arrow pandas_udf (numpy geometric
    mean) aggregating per (returnflag, linestatus), hash-verified
    against DuckDB's closed form exp(avg(ln(x))).

    Scale note: a grouped-agg pandas UDF ships EVERY value of a group
    to one Python worker — fine for bounded groups, wrong for skewed
    100 TB facts.  When the aggregate decomposes (geomean = exp of a
    partial-aggregable mean of logs), production code should prefer the
    JVM built-in form `exp(avg(ln(x)))` and keep map-side combine; this
    entry exists to exercise the custom-UDAF path against that exact
    oracle."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit eval type: this module uses `from __future__ import
    # annotations`, which turns hints into strings Spark can't resolve
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing pandas and JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def ucount(v):
        return len(v)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(geomean("l_extendedprice"), 2).alias("geomean_price"),
        ucount("l_extendedprice").alias("n_items"),
    )


@query(
    "udtf_char_shingles",
    """
    SELECT d.doc_id, CAST(g.i AS INT) AS pos,
           substring(d.text, CAST(g.i AS INT), 3) AS shingle
    FROM documents d CROSS JOIN generate_series(1, 4096) AS g(i)
    WHERE d.doc_id < 50 AND g.i <= length(d.text) - 2
    """,
)
def udtf_char_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface: a Python user-defined TABLE function expanding each
    document into its positional character 3-shingles via SQL LATERAL,
    hash-verified against a DuckDB generate_series lateral join.

    Scale note: Python UDTFs evaluate row-at-a-time — the right tool
    for API parity and modest fan-outs, not the 100 TB hot path; the
    production shingling in operators/dedup.py does the same expansion
    batch-wise inside Arrow mapInPandas."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, shingle: string")
    class Shingler:
        def eval(self, doc_id, text):
            if text is not None:
                for i in range(len(text) - 2):
                    yield doc_id, i + 1, text[i : i + 3]

    docs = load(spark, sf_dir, "documents").filter("doc_id < 50")
    docs.createOrReplaceTempView("udtf_docs_v")
    spark.udtf.register("char_shingler", Shingler)
    return spark.sql(
        "SELECT s.doc_id, s.pos, s.shingle "
        "FROM udtf_docs_v, LATERAL char_shingler(doc_id, text) s"
    )


@query(
    "dedup_connected_components",
    """
    SELECT doc_id, min(doc_id) OVER (PARTITION BY n_chars) AS component
    FROM documents
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: collapse a near-dup PAIR list
    into transitive CLUSTERS via distributed connected components
    (operators/graph.py — label propagation + pointer jumping, O(log n)
    iterations of two key-partitioned shuffles; no driver-side data).

    The edge list here is constructed so the answer has a closed form
    the oracle can state: within each ``n_chars`` class, docs are
    chained rank-adjacent into a PATH graph (worst-case diameter for
    the solver), so each class is one component whose canonical id is
    ``min(doc_id) OVER (PARTITION BY n_chars)``.  Singleton classes
    produce no edges and fall out of the left-join/coalesce-to-self,
    exercising the isolated-node path too."""
    from flo_spark.operators.graph import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    nxt = ranked.select(
        F.col("n_chars").alias("nc2"),
        (F.col("rn") - F.lit(1)).alias("rn2"),
        F.col("doc_id").alias("dst"),
    )
    edges = ranked.join(
        nxt, (ranked["n_chars"] == nxt["nc2"]) & (ranked["rn"] == nxt["rn2"])
    ).select(F.col("doc_id").alias("src"), "dst")
    comp = connected_components(edges)
    return docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("component")
    )


# --------------------------------------------------------------------------
# LLM training-data pipeline: decontamination / chunking / redaction / split
# --------------------------------------------------------------------------


@query(
    "decontamination_ngram_overlap",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 8
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 7),
                         i -> array_to_string(list_slice(w, i, i + 7), ' ')))
                  ELSE [array_to_string(w, ' ')] END AS ngrams
      FROM w
    ),
    bench AS (
      SELECT DISTINCT unnest(ngrams) AS ng, doc_id AS bench_id
      FROM g WHERE doc_id % 10 = 5
    ),
    corpus AS (
      SELECT doc_id, unnest(ngrams) AS ng FROM g WHERE doc_id % 10 <> 5
    )
    SELECT c.doc_id,
           count(DISTINCT c.ng) AS n_hit_ngrams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.ng = b.ng
    GROUP BY c.doc_id
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-8-gram with the held-out benchmark set (here: every 10th doc —
    eval sets are defined externally in production).  The standard
    pre-training hygiene step: n-gram collision against the eval suite
    means the doc leaks test data and must be dropped.

    Scale shape: the benchmark n-gram set is small by nature (eval
    suites are thousands of docs, not billions) — it BROADCASTS, so the
    corpus side never shuffles: explode n-grams, hash-join against the
    broadcast set in the map stage, partial-aggregate per doc.  At
    100 TB the only wide exchange is the final per-doc count combine."""
    d = load(spark, sf_dir, "documents")
    from flo_spark.operators.dedup import word_shingles

    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), k=8)).alias("ng")
    )
    bench = (
        grams.filter(F.col("doc_id") % 10 == 5)
        .select(F.col("ng"), F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 10 != 5)
    return (
        corpus.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("ng").alias("n_hit_ngrams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


@query(
    "doc_chunking",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, w,
             unnest(generate_series(0, CAST(floor((len(w) - 1) / 24) AS BIGINT)))
               AS chunk_idx
      FROM w
    )
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
                AS INT) AS n_tokens,
           array_to_string(list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32),
                           ' ') AS chunk_text
    FROM c
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking: split each document into 32-token
    chunks with stride 24 (8-token overlap) — the fixed-context-window
    preprocessing every pre-training pipeline runs.  Pure JVM
    expressions: tokenize once, `sequence` the chunk starts, explode,
    `slice` per chunk — no Python, no shuffle at all (embarrassingly
    parallel per document; output partitioning inherits the scan)."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    chunks = (
        d.select("doc_id", words.alias("w"))
        .withColumn(
            "chunk_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.floor((F.size("w") - 1) / 24).cast("long")
                )
            ),
        )
    )
    sliced = F.slice(
        F.col("w"), F.col("chunk_idx") * 24 + 1, F.lit(32)
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(sliced).alias("n_tokens"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    )


@query(
    "pii_redaction",
    r"""
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or call 555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(raw,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM salted
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email addresses and phone
    numbers via JVM regexp expressions.  The synthetic corpus contains
    no PII (lowercase word-soup), so the query PLANTS one deterministic
    email + phone per document first — the redaction rules then have
    real work, and the oracle checks both the match counts and the
    rewritten text.  DuckDB's regexp_replace needs the 'g' flag to
    match Spark's replace-all semantics."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"555-[0-9]{4}"
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(email_re)).alias("n_emails"),
        F.regexp_count(raw, F.lit(phone_re)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(raw, email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("redacted"),
    )


@query(
    "repetition_filter",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct_words,
             list_transform(generate_series(1, len(words) - 1),
                            i -> words[i] || ' ' || words[i + 1]) AS bigrams
      FROM w
    ),
    e AS (SELECT doc_id, n_words, n_distinct_words, unnest(bigrams) AS bigram
          FROM b),
    pb AS (SELECT doc_id, n_words, n_distinct_words, bigram, count(*) AS c
           FROM e GROUP BY doc_id, n_words, n_distinct_words, bigram)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
           CAST(max(c) AS BIGINT) AS top_bigram_n,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CASE WHEN max(c) * 25 <= CAST(sum(c) AS BIGINT)
                 AND n_distinct_words * 5 >= n_words
                THEN 1 ELSE 0 END AS keep
    FROM pb GROUP BY doc_id, n_words, n_distinct_words
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: drop documents whose
    most-frequent word bigram exceeds 4% of all bigrams or whose
    distinct-word ratio falls under 20%.  The bigram mode needs a
    per-doc frequency table, so the plan is explode -> two hash
    aggregations, both keyed on doc_id (+bigram) — high-cardinality
    keys, map-side partial aggregation, no join and no skew at any
    scale.  Verdict thresholds are pure integer arithmetic (counts
    only), so the keep/drop boundary is exact in both engines."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    # bigram construction via slice+arrays_zip: two NATIVE array ops per
    # document instead of a per-element interpreted HOF lambda (transform
    # lambdas never reach codegen — ~10x slower at corpus scale); the
    # per-bigram concat runs post-explode inside whole-stage codegen
    pair = F.explode(
        F.arrays_zip(
            F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        )
    )
    ex = d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        pair.alias("pair"),
    ).select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.concat_ws(" ", F.col("pair.0"), F.col("pair.1")).alias("bigram"),
    )
    per_bigram = ex.groupBy(
        "doc_id", "n_words", "n_distinct_words", "bigram"
    ).agg(F.count("*").alias("c"))
    return (
        per_bigram.groupBy("doc_id", "n_words", "n_distinct_words")
        .agg(
            F.max("c").alias("top_bigram_n"),
            F.sum("c").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "top_bigram_n",
            "n_bigrams",
            F.when(
                (F.col("top_bigram_n") * 25 <= F.col("n_bigrams"))
                & (F.col("n_distinct_words") * 5 >= F.col("n_words")),
                1,
            )
            .otherwise(0)
            .alias("keep"),
        )
    )


@query(
    "embedding_centroids",
    """
    SELECT e.label, i - 1 AS pos,
           floor(avg(CAST(e.embedding[i] AS DOUBLE)) * 1e4 + 0.5) / 1e4
               AS centroid
    FROM embeddings e
    CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
    GROUP BY e.label, i
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column (the k-means-update /
    class-prototype primitive).  posexplode -> hash aggregate on
    (label, pos): fully distributed with map-side partial sums — the
    centroid of 100 TB of vectors shuffles only |labels|*dim partial
    rows per task, never the vectors themselves.  Elements cast to
    DOUBLE before averaging in both engines and rounded via the
    IEEE-exact floor trick, keeping the hash comparable.  (The DuckDB
    side cross-joins a constant 1..64 series because its
    generate_series cannot take lateral column arguments; dim is fixed
    by the table schema.)"""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    )
    avg = F.avg(F.col("v").cast("double"))
    return ex.groupBy("label", "pos").agg(
        (F.floor(avg * 1e4 + F.lit(0.5)) / 1e4).alias("centroid")
    )


@query(
    "train_val_test_split",
    """
    SELECT doc_id,
           (doc_id * 2654435761) % 1000 AS bucket,
           CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
                WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 document split via a multiplicative hash
    on doc_id (Knuth's 2654435761) — reproducible across engines and
    runs, unlike random sampling, and stable under corpus growth:
    adding documents never reassigns existing ones.  Pure arithmetic,
    so it pushes into the scan and costs nothing at any scale."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 1000
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 800, "train")
        .when(bucket < 900, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "right_join_orders_nations",
    """
    SELECT n.n_name, count(o.o_orderkey) AS n_orders
    FROM (
      SELECT o_orderkey, c_nationkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ) o RIGHT JOIN nation n ON n.n_nationkey = o.c_nationkey
    GROUP BY n.n_name
    """,
)
def right_join_orders_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every nation appears even with zero orders
    (count(col) null-skips the unmatched side).  Spark plans the small
    preserved side broadcast-able by flipping build sides."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    oc = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        oc.join(n, oc["c_nationkey"] == n["n_nationkey"], "right")
        .groupBy("n_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "flo_tail_consume_ordered",
    """
    WITH b AS (
      SELECT doc_id,
             '/tail/' || source AS namespace,
             CAST(doc_id % 3 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 300
    ),
    cnt AS (
      SELECT partition, count(*) AS n FROM b GROUP BY partition
    ),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    )
    SELECT off.off
             + row_number() OVER (PARTITION BY b.partition ORDER BY b.doc_id)
             AS event_counter,
           b.partition AS actor,
           b.namespace
    FROM b JOIN off USING (partition)
    """,
)
def flo_tail_consume_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tail delivery, driver-verified (A9 + A6's merge order):
    produce 300 events into a fresh stream, then drain it through the
    STREAMING path — ``consume_tail_ordered`` (foreachBatch sink,
    Trigger.AvailableNow), which k-way-merges each micro-batch by
    (event_counter, actor) like the reference's live consumer
    (multi_partition_reader.rs:8-48).  The oracle reproduces the
    deterministic id assignment; within-batch ordering is additionally
    asserted here (the oracle's value compare is order-insensitive)."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.event_table import EventStream
    from flo_spark.streaming.consume_stream import consume_tail_ordered

    path = scratch_dir("flo_tail_") + "/stream"
    s = EventStream.create(spark, path, num_partitions=3)
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(300)
    batch = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("/tail/"), F.col("source")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("partition"),
    )
    s.produce(batch, order_by="doc_id")
    tail = consume_tail_ordered(spark, path, await_new=False, timeout_sec=120)
    rows = []
    for delivered in tail.batches():
        ids = [(r.event_counter, r.actor) for r in delivered]
        assert ids == sorted(ids), "micro-batch not in merge order"
        rows.extend(
            (r.event_counter, r.actor, r.namespace) for r in delivered
        )
    # bounded by the produce size (300) — evidence query, not a data path
    return spark.createDataFrame(
        rows, "event_counter long, actor int, namespace string"
    )


@query(
    "map_funcs_priority_profile",
    """
    SELECT o_custkey,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def map_funcs_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per customer, build a
    priority -> count MAP (``map_from_entries``), then read it back via
    ``element_at`` / ``map_keys`` / a ``map_values`` fold.  The oracle
    states the SEMANTICS relationally (conditional counts) — the map is
    the Spark-side representation under test, every lookup must agree
    with the flat aggregation.  Missing keys: element_at yields NULL,
    coalesced to 0, mirroring the CASE sum."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    m = counts.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderpriority", "n"))
        ).alias("m")
    )
    return m.select(
        "o_custkey",
        F.coalesce(F.element_at("m", F.lit("1-URGENT")), F.lit(0)).alias("n_urgent"),
        F.coalesce(F.element_at("m", F.lit("5-LOW")), F.lit(0)).alias("n_low"),
        F.size(F.map_keys("m")).alias("n_priorities"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_orders"),
    )


@query(
    "json_props_extract",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload projection: get_json_object over the
    events `props` JSON column (A17's codec idea applied to a JSON
    payload — codec/serde.rs:11-62), aggregated per type.  The JSON
    path evaluates JVM-side inside codegen."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "skew_salted_join_types",
    """
    SELECT upper(e.event_type) AS type_label,
           count(*) AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events) d
      ON d.event_type = e.event_type
    GROUP BY upper(e.event_type)
    """,
)
def skew_salted_join_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated dimension join through ``operators.skew.
    salted_join``: event_type has only a handful of values, so a plain
    shuffle join would send each type's full population to one reducer;
    salting spreads every key over 8 sub-keys (deterministic xxhash64
    salt — retries don't flap) while the small side replicates 8x.
    Salting is pure implementation strategy — the result is
    hash-identical to the unsalted join, which is exactly what the
    oracle checks."""
    from flo_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    j = salted_join(ev, dim, on="event_type", salt=8)
    return j.groupBy("type_label").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "dense_hourly_event_counts",
    """
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type
      FROM events
    ),
    b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-12-31 00:00:00',
                                    INTERVAL 1 HOUR)) AS hour
    ),
    spine AS (
      SELECT h.hour, t.event_type
      FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM e) t
      WHERE h.hour BETWEEN (SELECT h0 FROM b) AND (SELECT h1 FROM b)
    ),
    c AS (SELECT hour, event_type, count(*) AS n FROM e GROUP BY hour, event_type)
    SELECT s.hour, s.event_type, coalesce(c.n, 0) AS n_events
    FROM spine s
    LEFT JOIN c ON c.hour = s.hour AND c.event_type = s.event_type
    """,
)
def dense_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap fill): build an hour x event_type
    spine spanning the observed range and left-join the real counts, so
    missing combinations surface as explicit zeros — the shape every
    downstream window/forecast operator wants.  The spine is bounded by
    the TIME RANGE, not the data volume (hours x |types|), so the
    deliberate cross join stays dim-sized at any scale; the fact
    shuffles once for the count.  (DuckDB generate_series cannot take
    lateral column args, so the oracle filters a bounded constant
    range.)"""
    ev = load(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    counts = ev.groupBy("hour", "event_type").agg(
        F.count("*").alias("n")
    )
    bounds = ev.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(types)
    return (
        spine.join(counts, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "curation_pipeline_end2end",
    r"""
    WITH scored AS (
      SELECT doc_id,
             CASE
               WHEN n_chars < 100 THEN 'too_short'
               WHEN NOT (text LIKE '% the %' OR text LIKE 'the %')
                 THEN 'non_english'
               WHEN len(list_distinct(string_split(text, ' '))) * 3
                    < len(string_split(text, ' ')) THEN 'low_diversity'
               ELSE 'none'
             END AS rule_reason,
             text
      FROM documents
    ),
    surv AS (SELECT doc_id, text FROM scored WHERE rule_reason = 'none'),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS w
            FROM surv)
    ),
    dup AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(a.sh || b.sh)) >= 0.5
    ),
    final AS (
      SELECT s.doc_id,
             CASE WHEN s.rule_reason <> 'none' THEN s.rule_reason
                  WHEN d.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'none' END AS drop_reason
      FROM scored s LEFT JOIN dup d ON d.doc_id = s.doc_id
    )
    SELECT doc_id, drop_reason, drop_reason = 'none' AS keep,
           CASE WHEN drop_reason = 'none' THEN
             CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
                  WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
                  ELSE 'test' END
           END AS split
    FROM final
    """,
)
def curation_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one dataflow: per-doc quality
    rules (map stage) -> exact near-dup drop among the rule survivors
    (inverted-index jaccard, drop the higher id of each >=0.5 pair) ->
    deterministic train/val/test assignment for the keepers.  Every
    document comes out with its fate and the FIRST stage that sealed
    it — the shape a 100 TB curation run actually materializes
    (partition by verdict, feed 'train' downstream).  Composes the
    already-verified building blocks (`corpus_curation_filter` rules,
    `ngram_jaccard_pairs`, `train_val_test_split` hash); dedup runs
    AFTER rule filtering, so the expensive stage sees only surviving
    documents."""
    from flo_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    is_en = F.col("text").like("% the %") | F.col("text").like("the %")
    rule = (
        F.when(F.col("n_chars") < 100, "too_short")
        .when(~is_en, "non_english")
        .when(
            F.size(F.array_distinct(words)) * 3 < F.size(words), "low_diversity"
        )
        .otherwise("none")
    )
    scored = d.select("doc_id", "text", rule.alias("rule_reason"))
    surv = scored.filter(F.col("rule_reason") == "none").select("doc_id", "text")
    dups = (
        ngram_jaccard_pairs(surv, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    reason = (
        F.when(F.col("rule_reason") != "none", F.col("rule_reason"))
        .when(F.col("__dup") == 1, "near_dup")
        .otherwise("none")
    )
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 1000
    return (
        scored.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            reason.alias("drop_reason"),
            (reason == "none").alias("keep"),
            F.when(
                reason == "none",
                F.when(bucket < 800, "train")
                .when(bucket < 900, "val")
                .otherwise("test"),
            ).alias("split"),
        )
    )


@query(
    "sequence_packing",
    r"""
    WITH RECURSIVE t AS (
      SELECT doc_id, source, n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM (SELECT doc_id, source,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents)
    ),
    p AS (
      SELECT doc_id, source, n_tokens, rn,
             n_tokens AS fill, 0 AS seq_idx
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.source, t.n_tokens, t.rn,
             CASE WHEN p.fill + t.n_tokens > 2048
                  THEN t.n_tokens ELSE p.fill + t.n_tokens END,
             CASE WHEN p.fill + t.n_tokens > 2048
                  THEN p.seq_idx + 1 ELSE p.seq_idx END
      FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(seq_idx AS BIGINT) AS seq_idx
    FROM p
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (the step between chunking and batching
    in a training pipeline): fill 2048-token sequences with whole
    documents in doc_id order, starting a new sequence when the next
    document would overflow; oversized documents get their own
    sequence.  The greedy scan is inherently sequential PER GROUP, so
    it runs as ``applyInPandas`` keyed by source — groups pack in
    parallel, each group's scan is a linear pandas pass over (id,
    n_tokens) pairs only (token counting stays JVM-side; text never
    reaches Python).  The oracle replays the same scan as a recursive
    CTE — two independent formulations of the fold."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )

    from flo_spark.functions.packing import greedy_pack

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["seq_idx"] = greedy_pack(pdf["n_tokens"], 2048)
        return pdf

    return toks.groupBy("source").applyInPandas(
        pack, "doc_id long, source string, n_tokens long, seq_idx long"
    )


@query(
    "intersect_all_priorities",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — the multiset variant: each priority value
    survives min(count_F, count_O) times.  Complements the distinct
    set ops (`set_ops_custkeys`) and is a different Catalyst operator
    (left-semi-with-counters, not aggregate+join)."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(op)


@query(
    "except_all_priorities",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: a value occurring m times on
    the left and n on the right survives max(m-n, 0) times.  NOT the
    same as `subtract` (distinct difference, used by
    `except_custkeys`); registering both keeps the two semantics
    separately verified."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.exceptAll(op)


@query(
    "unpivot_measures",
    """
    WITH a AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                 AS DOUBLE) AS sum_price,
             CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 2)
                 AS DOUBLE) AS sum_disc,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
                 AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_qty', sum_qty FROM a
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide measures to (measure, value) rows, the
    inverse of `pivot_linestatus`.  Spark's native ``unpivot`` (an
    Expand under the hood, one pass, no join); the oracle spells it as
    the equivalent UNION ALL."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_disc"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_price", "sum_disc", "sum_qty"],
        "measure",
        "value",
    )


@query(
    "token_budget_mix",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             (doc_id * 2654435761) % 1000000007 AS ord
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           CASE WHEN cum_tokens <= 800 THEN 1 ELSE 0 END AS kept
    FROM c
    """,
)
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing to a per-source TOKEN budget: documents are
    ranked by a deterministic multiplicative hash (a reproducible
    shuffle — stable under corpus growth, unlike rand()), then each
    source keeps documents while its running token total stays within
    budget.  One window per source partition — high-cardinality key,
    bounded state, no driver involvement; this is the op that turns
    'use 30% web, 20% code' into an actual document list at 100 TB.
    Pure integer arithmetic end to end (counts, hash order, cumsum),
    so the keep/drop boundary is exact in both engines."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
        ((F.col("doc_id") * F.lit(2654435761)) % 1000000007).alias("__ord"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("__ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn(
        "kept", F.when(F.col("cum_tokens") <= 800, 1).otherwise(0)
    )


@query(
    "char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
      FROM documents
    ),
    f AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
    e AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_chars_t,
             sum(cnt * log2(cnt)) AS s
      FROM f GROUP BY doc_id
    )
    SELECT doc_id, n_chars_t,
           floor((log2(n_chars_t) - s / n_chars_t) * 1e4 + 0.5) / 1e4 AS entropy
    FROM e
    """,
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the
    information-theoretic quality signal (low entropy ~ repetitive /
    degenerate text, a compressibility proxy used alongside rule-based
    filters).  Computed as log2(n) - sum(c*log2(c))/n over the char
    histogram: explode -> two hash aggregates keyed by doc_id(+char),
    map-side partials, no joins.  The only cross-engine surface is
    log2 (transcendental, last-ulp), damped by the 4dp floor
    rounding."""
    d = load(spark, sf_dir, "documents")
    chars = F.explode(F.filter(F.split("text", ""), lambda x: x != ""))
    f = (
        d.select("doc_id", chars.alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("cnt"))
    )
    e = f.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_t"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("__s"),
    )
    ent = F.log2("n_chars_t") - F.col("__s") / F.col("n_chars_t")
    return e.select(
        "doc_id",
        "n_chars_t",
        (F.floor(ent * 1e4 + F.lit(0.5)) / 1e4).alias("entropy"),
    )


@query(
    "bigram_conditional_probs",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    b AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> [ws[i], ws[i + 1]])) AS bg
      FROM w WHERE len(ws) >= 2
    ),
    c2 AS (SELECT bg[1] AS w1, bg[2] AS w2, count(*) AS c FROM b GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS prefix_n FROM c2 GROUP BY w1)
    SELECT c2.w1 AS w1, c2.w2 AS w2, CAST(c2.c AS BIGINT) AS c,
           floor(CAST(c2.c AS DOUBLE) / c1.prefix_n * 1e4 + 0.5) / 1e4 AS p
    FROM c2 JOIN c1 ON c1.w1 = c2.w1
    ORDER BY c DESC, c2.w1, c2.w2 LIMIT 50
    """,
)
def bigram_conditional_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: P(w2 | w1) =
    c(w1,w2) / c(w1·) for the top-50 bigrams — the building block of
    statistical-LM quality filtering (score text by how probable its
    transitions are under the corpus model).  Two hash aggregates (the
    prefix totals re-aggregate the ALREADY-REDUCED bigram counts, not
    the corpus) + a join keyed on w1; top-50 compiles to
    TakeOrderedAndProject with a full (c, w1, w2) tie-break.  The
    probability is an exact int/int quotient under the IEEE floor
    trick — no cross-engine rounding surface."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    pair = F.explode(
        F.arrays_zip(
            F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        )
    )
    c2 = (
        d.select(pair.alias("pair"))
        .select(F.col("pair.0").alias("w1"), F.col("pair.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    c1 = c2.groupBy(F.col("w1").alias("__w1")).agg(
        F.sum("c").alias("prefix_n")
    )
    return (
        c2.join(c1, c2["w1"] == c1["__w1"])
        .select(
            "w1",
            "w2",
            "c",
            (
                F.floor(F.col("c") / F.col("prefix_n") * 1e4 + F.lit(0.5)) / 1e4
            ).alias("p"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(50)
    )


@query(
    "stream_rollup_hourly",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY bucket, event_type
    """,
)
def stream_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate maintained BY THE STREAM: the events stream
    drains through a foreachBatch sink that upserts an hourly rollup
    table (`operators.rollup.maintain_rollup` — only the buckets
    present in each micro-batch are rewritten), and the query returns
    the resulting rollup.  This is the hypertable story end-to-end:
    ingest keeps the aggregate fresh incrementally; dashboards read the
    GB-sized rollup, never the raw log.  The oracle is the plain batch
    aggregate — streaming-maintained partials must merge to exactly the
    batch answer (sum/count/min/max are decomposable; rounding happens
    only at read time, never inside the maintained partials)."""
    import os as _os

    from flo_spark.operators.rollup import maintain_rollup
    from flo_spark.queries import _events_stream, scratch_dir

    ev = _events_stream(spark, sf_dir)
    tmp = scratch_dir("flo_stream_rollup_")
    rollup_dir = _os.path.join(tmp, "rollup")
    q = (
        ev.writeStream.foreachBatch(
            lambda b, _eid: maintain_rollup(
                rollup_dir, b, bucket="1 hour", keys=["event_type"]
            )
        )
        .option("checkpointLocation", _os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("stream rollup drain did not finish within 120s")
    return spark.read.parquet(rollup_dir).select(
        "bucket",
        "event_type",
        "n_events",
        F.round("sum_value", 2).cast("double").alias("sum_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
    )


@query(
    "stratified_sample",
    """
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang, doc_id, n_chars FROM ranked WHERE rn <= 50
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(50, |stratum|)
    documents per language, selected by a multiplicative hash of doc_id
    (Knuth constant) so the sample is stable across runs and engines —
    no RNG, no seed plumbing, reproducible from the data alone.  The
    training-data use case is per-source/per-language quota sampling.

    Scale: one window shuffle partitioned by the stratum key.  Strata
    are low-cardinality (languages), so a hot stratum concentrates on
    one task; at 100 TB, pre-filter with an estimated hash threshold
    per stratum (keep ~2x the quota by key range, cheap scan-side
    predicate) before the exact window trims to the quota — same
    result, bounded task input."""
    docs = load(spark, sf_dir, "documents")
    key = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("lang", "doc_id", "n_chars")
    )


@query(
    "dedup_keep_best",
    """
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             md5(substring(text, 1, 80)) AS content_key
      FROM documents
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY content_key
               ORDER BY n_chars DESC, doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY content_key) AS n_dups
      FROM keyed
    )
    SELECT doc_id, lang, n_chars, content_key,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM ranked WHERE rn = 1 AND n_dups > 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best canonicalization: cluster documents by a content key
    (md5 of the first 80 chars — the testdata's near-duplicates share
    prefixes; exact-whole-text groups are all singletons) and keep the
    highest-quality member per cluster (longest, doc_id tiebreak),
    reporting cluster size.  This is the curation policy layered on
    dedup: not "drop duplicates" but "of each duplicate cluster, keep
    the best one".

    Scale: hash-partitioned window over the content key — the same
    shuffle shape as exact dedup; no pairwise comparison, no growth in
    intermediate size.  md5 is computed once per row scan-side."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.withColumn("content_key", F.md5(F.substring("text", 1, 80)))
    w = Window.partitionBy("content_key")
    ranked = keyed.withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())),
    ).withColumn("n_dups", F.count("*").over(w))
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("n_dups") > 1))
        .select("doc_id", "lang", "n_chars", "content_key", "n_dups")
    )


@query(
    "multimodal_wav_roundtrip",
    """
    WITH d AS (SELECT doc_id, least(n_chars, 64) AS n FROM documents),
    s AS (SELECT doc_id, unnest(range(1, n + 1)) AS i FROM d WHERE n > 0)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum((doc_id * i) % 256) AS BIGINT) AS sum_bytes
    FROM s GROUP BY doc_id
    """,
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, hash-checked: synthesize an 8-bit PCM WAV per
    document whose samples are the deterministic bytes (doc_id*i) % 256,
    encode it with the stdlib ``wave`` writer, decode it back through
    ``decode_audio`` (the engine's real WAV decoder), and reconstruct
    the byte values from the normalized float samples.  8-bit samples
    map to exact binary fractions ((b-128)/128), so the encode->decode
    round trip is lossless and the oracle can compute the same sums
    straight from the formula — any decoder defect (offset, scale,
    channel, width) breaks the hash.

    Scale shape: one mapInPandas over documents (codec work is
    per-row, embarrassingly parallel), partial-agg-free since the UDF
    already emits one row per doc."""
    import io
    import wave as wave_mod

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_audio

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.least(F.col("n_chars"), F.lit(64)).alias("n")
    ).filter(F.col("n") > 0)

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "sum_bytes": []}
            for doc_id, n in zip(pdf.doc_id, pdf.n):
                vals = (int(doc_id) * np.arange(1, int(n) + 1)) % 256
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(1)  # unsigned 8-bit PCM
                    wf.setframerate(8000)
                    wf.writeframes(vals.astype(np.uint8).tobytes())
                samples, rate = decode_audio(buf.getvalue())
                assert rate == 8000 and samples.shape[1] == 1
                rebuilt = np.rint(samples[:, 0] * 128.0 + 128.0).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(int(rebuilt.size))
                out["sum_bytes"].append(int(rebuilt.sum()))
            yield pd.DataFrame(out)

    schema = "doc_id long, n_samples long, sum_bytes long"
    return docs.mapInPandas(_roundtrip, schema=schema)


@query(
    "multimodal_bmp_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 96)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_channels,
           CAST(sum((doc_id + i) % 256) AS BIGINT) AS sum_pixels
    FROM s GROUP BY doc_id
    """,
)
def multimodal_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, hash-checked (the BMP twin of
    ``multimodal_wav_roundtrip``): per document build an 8x4 24-bit
    BI_RGB BMP whose RGB channel values are the deterministic bytes
    (doc_id + i) % 256 (i = row-major channel index), serialize it
    with the actual BMP container layout (bottom-up rows, BGR order,
    4-byte stride padding), decode through ``decode_image``, and sum
    the recovered channels.  The oracle computes the same sums from
    the formula — a decoder defect in row order, channel order, stride
    handling, or offset parsing breaks the value hash."""
    import struct

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image

    W, H = 8, 4

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        data_offset = 14 + 40
        stride = (W * 3 + 3) & ~3
        info = struct.pack(
            "<IiiHHIIiiII", 40, W, H, 1, 24, 0, stride * H, 0, 0, 0, 0
        )
        for pdf in it:
            out = {"doc_id": [], "n_channels": [], "sum_pixels": []}
            for doc_id in pdf.doc_id:
                rgb = (
                    (int(doc_id) + np.arange(W * H * 3)) % 256
                ).astype(np.uint8).reshape(H, W, 3)
                rows = b""
                for y in range(H - 1, -1, -1):  # bottom-up
                    row = rgb[y][:, ::-1].tobytes()  # RGB -> BGR
                    rows += row + b"\x00" * (stride - len(row))
                header = struct.pack(
                    "<2sIHHI", b"BM", data_offset + len(rows), 0, 0, data_offset
                )
                arr = decode_image(header + info + rows)
                assert arr.shape == (H, W, 3)
                out["doc_id"].append(int(doc_id))
                out["n_channels"].append(int(arr.size))
                out["sum_pixels"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_roundtrip, "doc_id long, n_channels long, sum_pixels long")


@query(
    "multimodal_png_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 120)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_channels,
           CAST(sum((doc_id * 7 + i) % 256) AS BIGINT) AS sum_pixels
    FROM s GROUP BY doc_id
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, hash-checked (the PNG sibling of
    ``multimodal_bmp_roundtrip``): per document build an 8x5 8-bit RGB
    PNG whose channel values are the deterministic bytes
    (doc_id*7 + i) % 256 (i = row-major channel index), encode it with
    the actual PNG container (IHDR/IDAT/IEND chunks, zlib deflate, and
    scanline filter y%5 so every filter type 0-4 — none/sub/up/
    average/paeth — is exercised in every image), decode through
    ``decode_image`` (the engine's pure-stdlib PNG decoder,
    operators/multimodal.py::_decode_png), and sum the recovered
    channels.  The oracle computes the same sums from the formula — a
    defect in chunk walking, inflate handling, or any of the five
    unfilter recurrences breaks the value hash."""
    import struct
    import zlib

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image

    W, H = 8, 5  # 5 rows => each filter type used exactly once

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
        bpp = 3
        for pdf in it:
            out = {"doc_id": [], "n_channels": [], "sum_pixels": []}
            for doc_id in pdf.doc_id:
                rgb = (
                    (int(doc_id) * 7 + np.arange(W * H * 3)) % 256
                ).astype(np.uint8).reshape(H, W, 3)
                raw = bytearray()
                prev = np.zeros(W * bpp, dtype=np.int32)
                for y in range(H):
                    cur = rgb[y].reshape(-1).astype(np.int32)
                    left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                    f = y % 5
                    if f == 0:
                        filt = cur
                    elif f == 1:  # sub
                        filt = (cur - left) & 0xFF
                    elif f == 2:  # up
                        filt = (cur - prev) & 0xFF
                    elif f == 3:  # average
                        filt = (cur - ((left + prev) >> 1)) & 0xFF
                    else:  # paeth
                        diag = np.concatenate(
                            [np.zeros(bpp, np.int32), prev[:-bpp]]
                        )
                        p = left + prev - diag
                        pa = abs(p - left)
                        pb = abs(p - prev)
                        pc = abs(p - diag)
                        pred = np.where(
                            (pa <= pb) & (pa <= pc),
                            left,
                            np.where(pb <= pc, prev, diag),
                        )
                        filt = (cur - pred) & 0xFF
                    raw += bytes([f]) + filt.astype(np.uint8).tobytes()
                    prev = cur
                png = (
                    b"\x89PNG\r\n\x1a\n"
                    + ihdr
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b"")
                )
                arr = decode_image(png)
                assert arr.shape == (H, W, 3)
                out["doc_id"].append(int(doc_id))
                out["n_channels"].append(int(arr.size))
                out["sum_pixels"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_roundtrip, "doc_id long, n_channels long, sum_pixels long")


# --------------------------------------------------------------------------
# hash-checkable contracts for the approximate operators
# (VERDICT r4 items 3-5: demote the rows-only set by oracling invariants
# the approximation provably satisfies on planted inputs)
# --------------------------------------------------------------------------


@query(
    "embedding_ann_recall",
    """
    SELECT 'lsh' AS method, vec_id AS q_id,
           CAST(1 AS INTEGER) AS found, CAST(1 AS INTEGER) AS expected
    FROM embeddings WHERE vec_id < 5
    UNION ALL
    SELECT 'ivf' AS method, vec_id AS q_id,
           CAST(1 AS INTEGER) AS found, CAST(1 AS INTEGER) AS expected
    FROM embeddings WHERE vec_id < 5
    """,
)
def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable recall contract for BOTH ANN paths (LSH and IVF).

    The ANN top-k entries (`embedding_ann_lsh` / `embedding_ann_ivf`)
    are rows-only by design — approximate output has no SQL oracle.
    This entry oracles the recall INVARIANT instead: plant a scaled
    copy (x2) of each query vector into the corpus under vec_id +
    100000 and count how many of each query's top-k hits are its
    planted copy.  Positive scaling by a power of two is bit-exact in
    IEEE float and preserves every hyperplane sign and every
    normalized-cosine value, so the planted copy provably (a) shares
    the query's LSH bucket, (b) quantizes to the query's nearest IVF
    cell, and (c) re-ranks at cosine ~1.0 > any natural pair (max
    natural cosine in this corpus is 0.513) — both paths MUST return
    it as top-1, making found=1 per (method, query) deterministic and
    DuckDB-computable from the planting formula alone.  A recall bug
    in bucketing, probing, cell assignment, or re-ranking yields
    found=0 (or a missing group) and breaks the hash."""
    from flo_spark.operators.similarity import ann_topk_ivf, ann_topk_lsh

    e = load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        # x2 is exact in float32 (exponent bump), so the planted copy's
        # normalized vector is BIT-IDENTICAL to the query's
        F.transform("embedding", lambda x: (x * 2).cast("float")).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    q = base.filter(F.col("vec_id") < 5)

    def recall(df: DataFrame, method: str) -> DataFrame:
        return (
            df.groupBy("q_id")
            .agg(
                F.sum(
                    (F.col("c_id") == F.col("q_id") + 100000).cast("int")
                ).cast("int").alias("found")
            )
            .select(
                F.lit(method).alias("method"),
                "q_id",
                "found",
                F.lit(1).alias("expected"),
            )
        )

    lsh = ann_topk_lsh(corpus, q, dim=64, k=10, num_planes=6)
    ivf = ann_topk_ivf(corpus, q, k=10, n_cells=16, n_probe=4)
    return recall(lsh, "lsh").unionByName(recall(ivf, "ivf"))


@query(
    "dedup_simhash_pairs",
    """
    SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
           CAST(0 AS INTEGER) AS hamming
    FROM documents WHERE doc_id < 40
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable contract for the SimHash pipeline.

    The raw `dedup_simhash` entry is rows-only — a 64-bit
    xxhash64-derived simhash cannot be recomputed in DuckDB.  The PAIR
    output on planted permutations can: SimHash is a bag-of-tokens bit
    vote, so a document whose token ORDER is reversed has a provably
    IDENTICAL simhash (hamming 0), which guarantees every band
    matches and the blocking join must surface the pair.  Plant the
    word-reversed copy of the first 40 documents under doc_id +
    1000000, run the real pipeline (tokenize -> xxhash64 -> bit vote
    -> 16-bit band blocking -> bit_count verify,
    operators/dedup.py::simhash_near_pairs), and keep exactly the
    planted (source, copy) pairs — their (id_a, id_b, hamming=0) is
    integer-exact from the planting formula.  A defect in
    tokenization, the vote fold, banding, or the hamming verify drops
    rows or yields hamming>0, breaking the hash."""
    from flo_spark.operators.dedup import simhash_near_pairs

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    planted = d.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.reverse(tokens), " ").alias("text"),
    )
    corpus = d.unionByName(planted)
    pairs = simhash_near_pairs(corpus)
    # keep only (source, planted-copy) pairs: the id offset is unique to
    # the planting, so id_b - id_a == 1000000 <=> id_a is the source
    return pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1000000) & (F.col("id_a") < 40)
    )


@query(
    "approx_distinct_bounded",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable error-bound contract for approx_count_distinct.

    The raw `approx_distinct_users` entry is rows-only — the HLL
    estimate has no SQL oracle.  The error BOUND does: emit
    |approx - exact| <= 0.05 * exact per group (exact side computable
    in both engines; 0.05 = 2.5x the requested rsd of 0.02, and the
    HLL estimate is deterministic for fixed data, verified within
    bound at sf0.001/0.01/0.1).  A sketch-merge defect that skews the
    estimate past the band flips within_bound and breaks the hash."""
    ev = load(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.02)
    return ev.groupBy("event_type").agg(
        exact.alias("n_exact"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_bound"),
    )


@query(
    "global_shuffle_shard",
    """
    WITH k AS (
      SELECT doc_id,
             (doc_id * 2654435761) % 1000000007 AS skey,
             CAST((doc_id * 2654435761) % 1000000007 % 64 AS INT) AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY skey, doc_id) AS BIGINT)
             AS pos
    FROM k
    """,
)
def global_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment — the
    last step of a training-data pipeline ("shuffle the corpus, write
    N shards for the data loader").  A multiplicative hash mod a large
    prime gives a reproducible pseudo-random permutation key; shard =
    key mod N; pos = each document's position within its shard.

    100 TB shape: NO global sort.  A total order over 100 TB needs a
    range-partitioned sort (sampling pass + skew risk); a sharded
    training order only needs hash-bucketing into N shards plus an
    in-shard sort, which is exactly ONE hash shuffle + local sort —
    the writer form is ``df.repartition(N, "shard")
    .sortWithinPartitions("skey").write.partitionBy("shard")``.  The
    window here computes the same per-shard positions declaratively
    (one shuffle on shard, in-partition sort, zero exchange after),
    and the hash is pure arithmetic so it pushes into the scan.
    Sizing contract: one shard = one task, so N is chosen to make a
    shard loader-sized (~1 GB) — at 100 TB that means tens of
    thousands of shards, keeping every sort task bounded by the shard
    size the data loader wants anyway (64 here only fits the test
    corpus)."""
    d = load(spark, sf_dir, "documents")
    skey = (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000007)
    shd = (skey % 64).cast("int")
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        d.select("doc_id", skey.alias("skey"), shd.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


@query(
    "duplicate_ngram_rate",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    t AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS tri
      FROM w WHERE len(ws) >= 3
    ),
    dup AS (
      SELECT tri, count(DISTINCT doc_id) AS nd FROM t GROUP BY tri
    )
    SELECT t.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           floor(CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
             AS dup_rate
    FROM t JOIN dup ON dup.tri = t.tri
    GROUP BY t.doc_id
    """,
)
def duplicate_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplicated n-gram rate per document (the C4/Gopher-style
    "fraction of this doc's 3-grams that also occur in other docs"
    diagnostic used to spot boilerplate and template text before
    near-dedup).  dup_rate is an exact int/int quotient under the IEEE
    floor trick, so it hash-matches across engines.

    100 TB shape: trigrams are reduced to 8-byte xxhash64 keys BEFORE
    the corpus-wide aggregate and join — the wide shuffles move fixed
    64-bit keys, never trigram strings (the same keyed-by-hash trick
    as the MinHash/inverted-index dedup paths; collision odds at
    ~1e12 trigrams are ~1e-7 and only perturb a count by 1).  The
    doc-side re-join is on the same key, so AQE can pick its strategy
    per stage; nothing in the plan is per-row Python."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    z = F.explode(
        F.arrays_zip(
            F.slice(words, 1, F.greatest(n - 2, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 2, F.lit(0))),
            F.slice(words, 3, F.greatest(n - 2, F.lit(0))),
        )
    )
    tri = (
        d.where(n >= 3)
        .select("doc_id", z.alias("t"))
        .select(
            "doc_id",
            F.xxhash64(
                F.concat_ws(" ", F.col("t.0"), F.col("t.1"), F.col("t.2"))
            ).alias("h"),
        )
    )
    dup = tri.groupBy("h").agg(
        (F.count_distinct("doc_id") > 1).alias("is_dup")
    )
    return (
        tri.join(dup, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(F.col("is_dup").cast("long")).alias("n_duplicated"),
        )
        .withColumn(
            "dup_rate",
            F.floor(
                F.col("n_duplicated") / F.col("n_trigrams") * 1e4 + F.lit(0.5)
            )
            / 1e4,
        )
    )


@query(
    "bm25_search_topk",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    dls AS (SELECT doc_id, len(ws) AS dl FROM toks),
    stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls
    ),
    tf AS (
      SELECT doc_id, w AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
      WHERE w IN ('hash', 'merge', 'window', 'dup')
      GROUP BY doc_id, w
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl
                               / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
               AS part_score
      FROM tf
      JOIN df USING (term)
      JOIN dls d ON d.doc_id = tf.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           floor(sum(part_score) * 1e4 + 0.5) / 1e4 AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the corpus: top-20 documents for the
    query {hash, merge, window, dup} under Okapi BM25 (k1=1.2, b=0.75):
    score(d) = SUM_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)) — the standard retrieval
    scorer behind corpus search / quality-by-query curation.

    Every model input is an exact integer (tf, df, dl, N, sum_dl), so
    both engines evaluate the same float expression over identical
    operands; avgdl is one exact integer quotient, and the final score
    is rounded 4dp before the (score, doc_id)-tie-broken top-k cut.

    100 TB shape: the exploded token stream is filtered to the query's
    terms BEFORE any shuffle (the IN-set predicate sits directly on the
    generator output), so the only corpus-wide exchange is the
    map-side-combinable (doc_id, term) tf aggregate over matching
    tokens; df re-aggregates the already-reduced tf relation and comes
    back as a |query|-row broadcast, the corpus stats are a single-row
    broadcast, and the top-k compiles to TakeOrderedAndProject — no
    global sort, no all-token join."""
    terms = ["hash", "merge", "window", "dup"]
    k1, b = 1.2, 0.75
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    toks = d.select("doc_id", words.alias("ws"))
    dls = toks.select("doc_id", F.size("ws").alias("dl"))
    stats = dls.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select(
            "doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("term")
        )
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    joined = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    part = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / avgdl))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            (F.floor(F.sum(part) * 1e4 + F.lit(0.5)) / 1e4).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "perplexity_bigram_filter",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    vocab AS (
      SELECT count(DISTINCT u) AS v FROM (SELECT unnest(ws) AS u FROM w)
    ),
    db AS (
      SELECT doc_id, bg[1] AS w1, bg[2] AS w2, count(*) AS m
      FROM (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                        i -> [ws[i], ws[i + 1]])) AS bg
        FROM w WHERE len(ws) >= 2
      ) GROUP BY doc_id, 2, 3
    ),
    c2 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c FROM db GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS prefix_n FROM c2 GROUP BY w1),
    scored AS (
      SELECT db.doc_id,
             CAST(sum(db.m) AS BIGINT) AS n_bigrams,
             floor(-sum(db.m * ln((c2.c + 1.0) / (c1.prefix_n + v.v)))
                   / sum(db.m) * 1e4 + 0.5) / 1e4 AS avg_nll
      FROM db JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab v
      GROUP BY db.doc_id
    )
    SELECT doc_id, n_bigrams, avg_nll, avg_nll <= 3.45 AS keep
    FROM scored
    """,
)
def perplexity_bigram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality filtering (the CCNet/KenLM recipe,
    statistical edition): score every document by its average negative
    log-likelihood under an add-one-smoothed bigram LM trained on the
    corpus itself — P(w2|w1) = (c(w1,w2)+1)/(c(w1.)+V) — and emit a
    keep verdict at a fixed nll threshold.  Template/boilerplate text
    scores low (predictable transitions), noise scores high.

    The LM counts (c, prefix_n, V, m) are exact integers; the only
    float surface is ln of identical rationals and the per-doc
    sum(m*ln p)/sum(m), rounded 4dp; the keep verdict compares the
    ROUNDED score so both engines cut identically.

    100 TB shape: the model IS a DataFrame — per-doc bigram
    multiplicities reduce map-side, the corpus model c2 re-aggregates
    the already-reduced db relation (never re-reads the corpus), c1
    re-aggregates c2, and scoring joins db->c2 on the 2-word key and
    ->c1 on w1, both AQE-planned shuffles keyed on model keys (a
    100 TB corpus LM does not broadcast); the vocabulary size is a
    single-row broadcast.  No Python anywhere in the path."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    pair = F.explode(
        F.arrays_zip(
            F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        )
    )
    db = (
        d.where(n >= 2)
        .select("doc_id", pair.alias("pair"))
        .select(
            "doc_id",
            F.col("pair.0").alias("w1"),
            F.col("pair.1").alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("m"))
    )
    c2 = db.groupBy("w1", "w2").agg(F.sum("m").alias("c"))
    c1 = c2.groupBy(F.col("w1").alias("__w1")).agg(
        F.sum("c").alias("prefix_n")
    )
    vocab = d.select(F.explode(words).alias("u")).agg(
        F.count_distinct("u").alias("v")
    )
    joined = (
        db.join(c2, ["w1", "w2"])
        .join(c1, db["w1"] == c1["__w1"])
        .crossJoin(F.broadcast(vocab))
    )
    nll = F.col("m") * F.log(
        (F.col("c") + F.lit(1.0)) / (F.col("prefix_n") + F.col("v"))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            (
                F.floor(-F.sum(nll) / F.sum("m") * 1e4 + F.lit(0.5)) / 1e4
            ).alias("avg_nll"),
        )
        .withColumn("keep", F.col("avg_nll") <= 3.45)
    )


@query(
    "corpus_jsonl_gz_roundtrip",
    """
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_text_bytes,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents GROUP BY source, lang
    """,
)
def corpus_jsonl_gz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzipped-JSONL corpus interchange — THE wire format of public
    text datasets (C4, RedPajama, CommonCrawl derivatives ship as
    .jsonl.gz shards).  Export the documents table as gzip JSONL
    shards, scan them back with an explicit schema, and aggregate
    per (source, lang); doc ids, counts, and exact UTF-8 byte lengths
    must survive the round trip, hash-checked against SQL computing
    the same from the source parquet.

    100 TB shape: gzip is NOT splittable — one .json.gz file is one
    scan task forever, so parallelism is set at WRITE time by the
    shard count (repartition(8) here; at scale, total_bytes/~1 GB
    shards).  The read side supplies the schema explicitly: schema
    inference over JSONL is a full extra pass over the corpus."""
    from flo_spark.queries import scratch_dir

    d = load(spark, sf_dir, "documents")
    tmp = scratch_dir("flo_jsonlgz_") + "/corpus"
    d.repartition(8).write.option("compression", "gzip").mode(
        "overwrite"
    ).json(tmp)
    schema = (
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    back = spark.read.schema(schema).json(tmp)
    return back.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("sum_text_bytes"),
        F.sum("doc_id").alias("sum_ids"),
    )


@query(
    "flo_orc_roundtrip",
    """
    WITH b AS (
      SELECT doc_id, text,
             '/docs/' || source AS namespace,
             CAST(doc_id % 3 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 300
    ),
    cnt AS (SELECT partition, count(*) AS n FROM b GROUP BY partition),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    ),
    env AS (
      SELECT b.namespace,
             off.off + row_number()
               OVER (PARTITION BY b.partition ORDER BY b.doc_id)
               AS event_counter,
             octet_length(encode(b.text)) AS nbytes
      FROM b JOIN off USING (partition)
    )
    SELECT namespace,
           count(*) AS n_events,
           CAST(sum(event_counter) AS BIGINT) AS sum_counters,
           CAST(sum(nbytes) AS BIGINT) AS sum_bytes
    FROM env GROUP BY namespace
    """,
)
def flo_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange: produce a 3-partition event stream, export it
    as ORC (Spark's second native columnar format; BINARY payloads
    carried natively, no text encoding), read it back through the
    schema-explicit scan path, and aggregate — counters, counts, and
    exact payload byte lengths must survive, hash-checked against SQL
    computing the same from the source table.  Complements the CSV+JSON
    text round trip (`flo_interchange_roundtrip`) so every interchange
    format the engine exposes (parquet/orc/csv/json + the native
    .events codec) has round-trip evidence."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.event_table import EventStream

    tmp = scratch_dir("flo_orc_")
    s = EventStream.create(spark, f"{tmp}/stream", num_partitions=3)
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(300)
    batch = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("/docs/"), F.col("source")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("partition"),
    )
    s.produce(batch, order_by="doc_id")
    s.export(f"{tmp}/orc", fmt="orc")
    o = EventStream.read_events(spark, f"{tmp}/orc", fmt="orc")
    return o.groupBy("namespace").agg(
        F.count("*").alias("n_events"),
        F.sum("event_counter").alias("sum_counters"),
        F.sum(F.octet_length("data")).alias("sum_bytes"),
    )


@query(
    "semantic_dedup_verdicts",
    """
    SELECT vec_id, TRUE AS keep, CAST(NULL AS BIGINT) AS dup_of
    FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, FALSE AS keep,
           CAST(vec_id AS BIGINT) AS dup_of
    FROM embeddings WHERE vec_id < 40
    """,
)
def semantic_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication with a hash-checkable
    planted contract: cluster the embedding space into spherical
    k-means cells (the IVF quantizer), compare each vector only
    against its own cell, and drop every vector with a lower-id
    neighbor at cosine >= 0.99 (min-id keep rule; transitive cluster
    canonicalization is `dedup_connected_components`' job).

    Contract: a x2-scaled copy of each of the first 40 vectors enters
    under vec_id + 100000.  Scaling by a power of two is bit-exact in
    IEEE float, so the copy's NORMALIZED vector is bit-identical to
    its original's — it provably quantizes to the same cell (recall 1,
    not 1-epsilon) and scores cosine ~1.0 > 0.99, while the strongest
    natural pair in this corpus is 0.513 (established by
    `embedding_neardup_cosine`'s all-pairs oracle).  The verdict set
    is therefore exact from the planting formula alone: every base
    vector keeps, every copy drops with dup_of = its original.  A
    defect in quantizer training, cell assignment, the blocked
    self-join, scoring, or the min-id rule changes a verdict and
    breaks the hash.  Scale shape documented on the operator
    (operators/similarity.py::semantic_dedup)."""
    from flo_spark.operators.similarity import semantic_dedup

    e = load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 2).cast("float")).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted)
    return semantic_dedup(corpus, threshold=0.99, n_cells=16)


@query(
    "flo_datasource_scan",
    """
    WITH b AS (
      SELECT event_id, event_type, props,
             CAST(event_id % 3 + 1 AS INT) AS part
      FROM events ORDER BY event_id LIMIT 400
    )
    SELECT '/events/' || event_type AS namespace,
           count(*) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS sum_counters,
           CAST(sum(octet_length(encode(coalesce(props, ''))))
                AS BIGINT) AS sum_bytes
    FROM b
    WHERE substr(event_type, 1, 1) IN ('c', 'p', 'v')
      AND ((part = 1 AND event_id > 100) OR (part = 2 AND event_id > 0))
    GROUP BY namespace
    """,
)
def flo_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``format("flo")`` end-to-end: encode 400 events into native
    ``.events`` segments (3 partition dirs, forced rotation), register
    the Spark 4 Python Data Source, and scan them back THROUGH the
    format with both reader options engaged — a namespace glob with a
    character class (``/events/[cpv]*``) and a version-vector
    ``startpositions`` cursor ({1: 100, 2: 0} — partition 3 absent, so
    never read; exclusive bounds).  The aggregate hash-checks that the
    DS-API scan path (one InputPartition per segment file) plus the
    Python-side option filters reproduce exactly the SQL formula on
    the source table.  The STREAMING half of the source — the
    per-event version-vector offset cursor — is exercised by
    tests/test_flo_datasource.py (mid-segment restart, torn-tail
    parking), which a SQL oracle cannot express."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.flo_datasource import register
    from flo_spark.sources.flo_segment import write_flo_segments

    ev = load(spark, sf_dir, "events").orderBy("event_id").limit(400)
    batch = ev.select(
        F.col("event_id").alias("event_counter"),
        (F.col("event_id") % 3 + 1).cast("int").alias("actor"),
        F.lit(None).cast("long").alias("parent_counter"),
        F.lit(None).cast("int").alias("parent_actor"),
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("/events/"), F.col("event_type")).alias("namespace"),
        F.encode(F.coalesce("props", F.lit("")), "utf-8").alias("data"),
        (F.col("event_id") % 3 + 1).cast("int").alias("partition"),
    )
    path = scratch_dir("flo_ds_") + "/native"
    write_flo_segments(batch, path, max_events_per_segment=60)
    register(spark)
    import json as _json

    df = (
        spark.read.format("flo")
        .option("namespace", "/events/[cpv]*")
        .option("startpositions", _json.dumps({1: 100, 2: 0}))
        .load(path)
    )
    return df.groupBy("namespace").agg(
        F.count("*").alias("n_events"),
        F.sum("event_counter").alias("sum_counters"),
        F.sum(F.octet_length("data")).alias("sum_bytes"),
    )


@query(
    "temperature_mix_sample",
    """
    WITH c AS (SELECT source, count(*) AS c_docs FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(sum(sqrt(CAST(c_docs AS DOUBLE))) AS DOUBLE) AS z FROM c
    ),
    quota AS (
      SELECT source,
             CAST(floor(200 * sqrt(CAST(c_docs AS DOUBLE)) / tot.z)
                  AS BIGINT) AS quota
      FROM c CROSS JOIN tot
    ),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY (d.doc_id * 2654435761) % 4294967296, d.doc_id
             ) AS rn
      FROM documents d
    )
    SELECT r.source, r.doc_id, q.quota
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rn <= q.quota
    """,
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/multi-source
    rebalancing recipe: sample source s proportional to c_s^alpha,
    alpha = 0.5, budget N = 200 docs): big sources are down-weighted,
    small sources up-weighted, quota_s = floor(N * sqrt(c_s) /
    SUM sqrt(c)).  Selection within a source is the deterministic
    multiplicative-hash order (seedless, engine-portable — the same
    Knuth-constant permutation as `stratified_sample`), so the whole
    mix is reproducible from the data alone.

    IEEE sqrt is correctly rounded in both engines and quotas divide
    sums of a few per-source terms, so the floor is stable; every
    other input is an exact integer.

    100 TB shape: one count aggregate (map-side combinable), a
    source-cardinality quota table that broadcasts by construction
    (it is an aggregate over the source key), and ONE window shuffle
    partitioned by source for the in-source ranking — same skew note
    as `stratified_sample`: pre-trim each source with a hash-threshold
    scan predicate at real scale before the exact window."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("c_docs"))
    tot = c.agg(
        F.sum(F.sqrt(F.col("c_docs").cast("double"))).alias("z")
    )
    quota = c.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.lit(200) * F.sqrt(F.col("c_docs").cast("double")) / F.col("z")
        )
        .cast("long")
        .alias("quota"),
    )
    key = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("source", "doc_id", "quota")
    )


@query(
    "embedding_int8_quantize",
    r"""
    WITH q AS (
      SELECT vec_id,
             len(embedding) AS n_dims,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    ),
    e AS (
      SELECT d.vec_id, q.n_dims, q.maxabs,
             CASE WHEN q.maxabs = 0 THEN list_transform(d.embedding, x -> 0)
                  ELSE list_transform(d.embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / (q.maxabs / 127)
                                       + 0.5) AS BIGINT))
             END AS qv,
             list_transform(d.embedding, x -> CAST(x AS DOUBLE)) AS xv
      FROM embeddings d JOIN q USING (vec_id)
    )
    SELECT vec_id, CAST(n_dims AS INT) AS n_dims,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
           CAST(list_aggregate(list_transform(qv, v -> abs(v)), 'max')
                AS BIGINT) AS max_abs_q,
           floor(list_aggregate(
                   list_transform(list_zip(xv, qv),
                     s -> (s[1] - s[2] * (maxabs / 127))
                          * (s[1] - s[2] * (maxabs / 127))),
                   'sum') * 1e6 + 0.5) / 1e6 AS sq_err
    FROM e
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the standard 4x memory
    cut for billion-vector ANN serving: per-vector scale = max|x|/127,
    q_i = round(x_i/scale), plus the exact squared reconstruction
    error.  Verifies the quantizer end to end: sum and max of the
    int8 codes are integer-exact, and the error fold is the
    sequential HOF sum, bit-identical across engines over identical
    IEEE operands (float32 widens exactly to double; /, *, floor are
    correctly rounded); zero vectors quantize to zeros by the guard
    rather than dividing by zero.

    100 TB shape: pure per-row JVM expressions (transform/aggregate
    HOFs) — no shuffle, no Python, no state; in production the int8
    codes replace the float column at ingest and every downstream
    ANN probe reads a quarter of the bytes."""
    e = load(spark, sf_dir, "embeddings")
    xv = F.transform("embedding", lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    d = e.select("vec_id", F.size("embedding").alias("n_dims"),
                 xv.alias("xv"), maxabs.alias("maxabs"))
    scale = F.col("maxabs") / 127
    qv = F.when(F.col("maxabs") == 0,
                F.transform("xv", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform("xv", lambda x: F.floor(x / scale + 0.5).cast("long"))
    )
    d = d.withColumn("qv", qv)
    err = F.aggregate(
        F.zip_with("xv", "qv",
                   lambda x, q: (x - q * scale) * (x - q * scale)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return d.select(
        "vec_id",
        F.col("n_dims").cast("int").alias("n_dims"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, v: a + v).alias("sum_q"),
        F.aggregate(F.transform("qv", F.abs), F.lit(0).cast("long"),
                    lambda a, v: F.greatest(a, v)).alias("max_abs_q"),
        (F.floor(err * 1e6 + F.lit(0.5)) / 1e6).alias("sq_err"),
    )


@query(
    "approx_quantile_bounded",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable rank-error contract for approx_percentile (the
    t-digest/GK sketch Spark uses for distributed quantiles — the
    sibling invariant to `approx_distinct_bounded`'s HLL band).

    percentile_approx(x, 0.5, accuracy=100) guarantees a rank within
    0.5 +- 1/100 of the true median; the contract brackets the sketch
    output between the EXACT 0.48 and 0.52 quantiles (double the
    guaranteed rank window, computable in both engines) and emits the
    boolean per group.  A sketch-merge defect that drifts the estimate
    past the band flips within_bound and breaks the hash; the exact
    side (count per returnflag group) pins the grouping itself."""
    li = load(spark, sf_dir, "lineitem")
    approx = F.expr("percentile_approx(l_extendedprice, 0.5, 100)")
    lo = F.expr("percentile(l_extendedprice, 0.48)")
    hi = F.expr("percentile(l_extendedprice, 0.52)")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        ((approx >= lo) & (approx <= hi)).alias("within_bound"),
    )


@query(
    "span_dedup_stats",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    c AS (
      SELECT doc_id, s['idx'] AS chunk_idx, s['chunk'] AS chunk
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT)),
                 i -> struct_pack(
                   idx := i,
                   chunk := array_to_string(
                     list_slice(ws, (i - 1) * 10 + 1,
                                least(i * 10, len(ws))), ' ')))) AS s
        FROM w WHERE len(ws) > 0
      )
    ),
    r AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM c
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY doc_id
    """,
)
def span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup, C4-style ("discard any repeated span,
    keep its first occurrence"): cut every document into
    non-overlapping 10-word chunks and drop each chunk whose exact
    text already occurred earlier in the corpus (first occurrence =
    smallest (doc_id, chunk_idx) — deterministic).  Per-doc keep/drop
    counts; the corpus plants real boilerplate so ~5% of spans drop.

    100 TB shape: the dedup window partitions by xxhash64(chunk) so
    the corpus-wide shuffle moves 8-byte keys + (doc_id, idx), never
    span text (the duplicate_ngram_rate trick; a 64-bit collision at
    ~1e12 spans merges two groups with odds ~1e-7 and moves one count
    by one).  Chunking itself is shuffle-free (sequence/slice HOFs in
    the scan stage); the only exchanges are the hash-keyed window and
    the per-doc re-aggregate."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    nchunks = F.ceil(n / F.lit(10.0))
    chunks = F.transform(
        F.sequence(F.lit(1).cast("long"), nchunks),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(
                " ", F.slice(words, (i - 1) * 10 + 1, F.lit(10))
            ).alias("chunk"),
        ),
    )
    c = (
        d.where(n > 0)
        .select("doc_id", F.explode(chunks).alias("s"))
        .select(
            "doc_id",
            F.col("s.idx").alias("chunk_idx"),
            F.xxhash64("s.chunk").alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
        )
    )


@query(
    "dataset_card",
    """
    WITH t AS (
      SELECT source, lang, n_chars,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
             AS avg_chars,
           floor(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
             AS en_fraction
    FROM t GROUP BY source
    """,
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics — the per-source summary table every
    corpus release ships (docs, token totals, language coverage,
    length distribution, English share).  One pass, one aggregate:
    everything is computed in a single map-side-combinable groupBy
    over the scan (token counts are a size() on the split array,
    evaluated in the scan stage project); the exact distinct-language
    count adds a second (source, lang)-keyed phase, so at 100 TB the
    report costs two reduced shuffles of per-source partials — still
    the cheapest full-corpus report the engine offers.  Ratios are
    exact int/int quotients under the IEEE floor trick."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    t = d.select(
        "source", "lang", "n_chars", F.size(words).alias("n_tokens")
    )
    return t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (
            F.floor(F.sum("n_chars") / F.count("*") * 1e4 + F.lit(0.5)) / 1e4
        ).alias("avg_chars"),
        (
            F.floor(
                F.sum((F.col("lang") == "en").cast("long"))
                / F.count("*")
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("en_fraction"),
    )


@query(
    "flo_native_retention",
    """
    WITH b AS (
      SELECT event_id, CAST(event_id % 3 + 1 AS INT) AS part
      FROM events ORDER BY event_id LIMIT 300
    ),
    r AS (
      SELECT event_id, part,
             CAST((row_number() OVER (PARTITION BY part ORDER BY event_id)
                   - 1) // 40 AS INT) + 1 AS seg
      FROM b
    ),
    s AS (
      SELECT part, seg, max(event_id * 1000) AS seg_end FROM r
      GROUP BY part, seg
    ),
    lim AS (
      SELECT CAST(min(event_id) * 1000
                  + 3 * (max(event_id) - min(event_id)) * 1000 // 5
                  AS BIGINT) AS cut
      FROM b
    ),
    s2 AS (
      SELECT part, seg,
             max(seg_end) OVER (PARTITION BY part ORDER BY seg
                                ROWS UNBOUNDED PRECEDING) AS cm,
             max(seg) OVER (PARTITION BY part) AS maxseg
      FROM s
    ),
    keep AS (
      SELECT part, seg FROM s2 CROSS JOIN lim
      WHERE NOT (cm < lim.cut AND seg < maxseg)
    )
    SELECT r.part AS partition,
           count(*) AS n_events,
           CAST(sum(r.event_id) AS BIGINT) AS sum_counters,
           CAST(max(r.event_id) AS BIGINT) AS head_counter,
           TRUE AS primary_flag
    FROM r JOIN keep USING (part, seg)
    GROUP BY r.part
    """,
)
def flo_native_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-dir TTL + head snapshot end to end (A11 + A13 on flo's
    own storage format): encode 300 events into 3 partition dirs
    (id-derived monotone timestamps, 40-event segments), run
    ``expire_native_segments`` at a cutoff 60% into the time range,
    then scan the SURVIVING segments and join the per-partition head
    from ``native_head_status``.  The oracle reproduces the whole
    pipeline in SQL — segment membership (rank // 40), content-derived
    header end-times (max id-ms per segment), the take_while
    drop-prefix rule via a running cummax, the never-expire-active
    rule, and the head (which expiry must NOT move).  A defect in
    segment assignment, header times, prefix-stop, active protection,
    or head recovery changes a count/sum and breaks the hash.

    The two driver-side pieces are O(1)/O(partitions) by construction
    (documented): the min/max collect that derives the cutoff, and
    the head-status list."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.flo_segment import (
        expire_native_segments,
        native_head_status,
        read_flo_segments,
        write_flo_segments,
    )

    ev = load(spark, sf_dir, "events").orderBy("event_id").limit(300)
    batch = ev.select(
        F.col("event_id").alias("event_counter"),
        (F.col("event_id") % 3 + 1).cast("int").alias("actor"),
        F.lit(None).cast("long").alias("parent_counter"),
        F.lit(None).cast("int").alias("parent_actor"),
        F.timestamp_seconds(F.col("event_id")).alias("timestamp"),
        F.concat(F.lit("/events/"), F.col("event_type")).alias("namespace"),
        F.encode(F.coalesce("props", F.lit("")), "utf-8").alias("data"),
        (F.col("event_id") % 3 + 1).cast("int").alias("partition"),
    )
    path = scratch_dir("flo_native_ttl_") + "/native"
    write_flo_segments(batch, path, max_events_per_segment=40)
    # O(1) driver collect: the cutoff bounds (min/max id of the subset)
    row = ev.agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx")
    ).collect()[0]
    cut = row["mn"] * 1000 + 3 * (row["mx"] - row["mn"]) * 1000 // 5
    expire_native_segments(path, retention_millis=0, now_millis=cut)
    heads = spark.createDataFrame(
        native_head_status(path),
        "partition int, head_counter long, primary_flag boolean",
    )
    back = read_flo_segments(spark, path)
    return (
        back.groupBy("partition")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_counter").alias("sum_counters"),
        )
        .join(F.broadcast(heads), "partition")
        .select(
            "partition",
            "n_events",
            "sum_counters",
            "head_counter",
            "primary_flag",
        )
    )


@query(
    "stream_profile",
    """
    WITH e AS (
      SELECT '/' || event_type || '/u' || CAST(user_id % 10 AS VARCHAR)
               AS namespace,
             event_type AS ns0,
             octet_length(encode(coalesce(props, ''))) AS nbytes
      FROM events
    )
    SELECT ns0,
           count(*) AS n_events,
           CAST(count(DISTINCT namespace) AS BIGINT) AS n_namespaces,
           CAST(sum(nbytes) AS BIGINT) AS sum_bytes,
           CAST(max(nbytes) AS BIGINT) AS max_bytes
    FROM e GROUP BY ns0
    """,
)
def stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational stream profile — the report a flo operator reads
    before sizing retention/segments: per top-level namespace segment
    (flo's convention is '/'-separated paths, README.md:103), event
    counts, distinct-namespace cardinality under the prefix, and
    payload byte totals/maxima.  Uses the engine's canonical
    events->envelope derivation (namespace = '/<type>/u<user mod
    10>'), so the numbers describe the same stream every flo-layer
    entry consumes.

    100 TB shape: one aggregate keyed on the (low-cardinality) first
    path segment; the distinct-namespace count adds the standard
    second (ns0, namespace) phase — both shuffles move reduced
    partials, and payload LENGTHS are computed in the scan stage, so
    payload bytes never cross an exchange."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.concat(
            F.lit("/"),
            F.col("event_type"),
            F.lit("/u"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("namespace"),
        F.col("event_type").alias("ns0"),
        F.octet_length(F.coalesce("props", F.lit(""))).alias("nbytes"),
    )
    return e.groupBy("ns0").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("namespace").alias("n_namespaces"),
        F.sum("nbytes").alias("sum_bytes"),
        F.max("nbytes").alias("max_bytes"),
    )


@query(
    "dedup_ngram_containment",
    r"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000,
             array_to_string(list_slice(
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> ''), 1, 12), ' ')
      FROM documents WHERE doc_id < 25
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS w
            FROM base)
    ),
    c AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / least(len(a.sh), len(b.sh)) AS cont
      FROM g a JOIN g b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, floor(cont * 10000 + 0.5) / 10000 AS containment
    FROM c WHERE cont >= 0.9
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (nested-duplicate) detection: |A(i)B| / min(|A|,|B|)
    over trigram shingle sets — the asymmetric metric that catches a
    document CONTAINED in another (quotes, truncations, article-plus-
    boilerplate) even when symmetric jaccard is low.  Planted
    contract: the first 25 documents re-enter truncated to their
    first 12 words under doc_id + 200000 — a truncation's shingle set
    is a strict subset of its source's, so the planted pair scores
    containment 1.0 by construction while its jaccard is far below
    any dedup threshold; the oracle computes brute-force all-pairs
    containment over the same corpus, so natural >=0.9 pairs (if any)
    must agree too.

    100 TB shape: identical to `dedup_ngram_jaccard` — the inverted
    index shuffles 8-byte shingle hashes and 16-byte id pairs, never
    shingle arrays; only the final quotient differs
    (operators/dedup.py::ngram_jaccard_pairs(metric="containment"))."""
    from flo_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(words, 1, 12), " ").alias("text"),
    )
    corpus = d.unionByName(planted)
    return ngram_jaccard_pairs(
        corpus, threshold=0.9, metric="containment"
    )


# --------------------------------------------------------------------------
# flo TCP wire protocol round trip
# --------------------------------------------------------------------------


@query(
    "flo_tcp_roundtrip",
    """
    WITH d AS (SELECT doc_id, lang, text FROM documents
               ORDER BY doc_id LIMIT 20)
    SELECT CAST(row_number() OVER (PARTITION BY doc_id % 2
                                   ORDER BY doc_id) AS BIGINT)
               AS event_counter,
           CAST(doc_id % 2 + 1 AS INT) AS actor,
           '/docs/' || lang AS namespace,
           substr(text, 1, 40) AS payload
    FROM d
    """,
)
def flo_tcp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The network surface end-to-end: a remote client produces the
    first 20 documents over the flo TCP WIRE PROTOCOL (announce
    handshake, ProduceEvent/AckEvent — flo-protocol/src/client.rs) to
    an embedded server persisting native ``.events`` segments; the
    engine then scans the server's data dir with
    ``spark.read.format("flo")``.  The oracle reconstructs the
    expected events from the documents table alone: the server's
    per-partition contiguous counter assignment over doc_id-ordered
    produces IS row_number() partitioned by doc_id % 2 — so the hash
    match proves id assignment, payload integrity, and the shared
    storage format across the TCP and Spark access paths.

    Driver-side work is the 20-row produce loop (bounded, documented);
    the read-back is the distributed flo scan.  Timestamps are
    server-assigned wall clock, hence excluded from the contract."""
    from flo_spark.protocol.client import FloClient
    from flo_spark.protocol.server import FloTcpServer
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.flo_datasource import register

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    root = scratch_dir("flo_tcp_")
    with FloTcpServer(root) as srv:
        with FloClient(srv.host, srv.port, client_name="roundtrip") as c:
            for r in docs:
                c.produce(
                    int(r["doc_id"]) % 2 + 1,
                    f"/docs/{r['lang']}",
                    r["text"][:40].encode("utf-8"),
                )
    register(spark)
    ev = spark.read.format("flo").load(f"{root}/default")
    return ev.select(
        "event_counter",
        "actor",
        "namespace",
        F.decode(F.col("data"), "UTF-8").alias("payload"),
    )


@query(
    "text_normalize_nfc",
    """
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 300000,
             'cafe' || chr(769) || '  na' || chr(771) || 'ive' || chr(9)
               || chr(160) || 'te' || chr(769) || 'xt' || chr(13)
               || chr(10) || ' tail' || chr(7) || chr(127)
               || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id,
           CAST(length(norm) AS BIGINT) AS clean_len,
           norm <> text AS changed,
           substr(norm, 1, 30) AS head
    FROM (
      SELECT doc_id, text,
             trim(regexp_replace(
               regexp_replace(
                 replace(nfc_normalize(text), chr(160), ' '),
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
               '[ \\t\\r\\n]+', ' ', 'g')) AS norm
      FROM base
    )
    """,
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization for training corpora: NFC
    composition (combining marks folded into precomposed forms), NBSP
    mapped to space, C0/DEL control characters stripped, whitespace
    runs collapsed to single spaces, ends trimmed.  The planted
    contract re-enters the first 10 docs wrapped in decomposed
    accents (e + U+0301), NBSP, tab/CRLF runs, BEL and DEL — each
    provably changes under normalization and the oracle applies the
    identical pipeline through DuckDB's utf8proc ``nfc_normalize``,
    so the hash match pins the two engines' Unicode tables against
    each other.

    NFC needs real Unicode data tables, which no JVM built-in
    expression exposes — this is a sanctioned Arrow-batched
    mapInPandas hop (one ``unicodedata.normalize`` pass per batch),
    NOT a row-at-a-time UDF.  100 TB shape: a narrow scan-stage map —
    zero shuffles, composes with any downstream partitioning; the
    whitespace/control steps use explicit character classes shared
    verbatim with the oracle so RE2-vs-Python ``\\s`` semantics can
    never diverge."""
    import re as _re
    import unicodedata

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400).select(
        "doc_id", "text"
    )
    planted = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(
                F.lit("cafe\u0301  na\u0303ive\t\u00a0te\u0301xt\r\n tail\x07\x7f"),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
    )
    ctrl = _re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ws = _re.compile("[ \t\r\n]+")

    def norm_batches(batches):
        for pdf in batches:
            norm = []
            for s in pdf["text"]:
                n = unicodedata.normalize("NFC", s).replace(" ", " ")
                n = ws.sub(" ", ctrl.sub("", n)).strip()
                norm.append(n)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "clean_len": [len(n) for n in norm],
                    "changed": [n != s for n, s in zip(norm, pdf["text"])],
                    "head": [n[:30] for n in norm],
                }
            )
            yield out

    return d.unionByName(planted).mapInPandas(
        norm_batches,
        "doc_id long, clean_len long, changed boolean, head string",
    )


@query(
    "stream_dedup_ingest",
    """
    SELECT DISTINCT md5(event_type || '|'
                        || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR))
               AS dedup_key
    FROM events
    """,
)
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with UNBOUNDED cross-batch exact
    dedup (streaming/dedup_ingest.py): every micro-batch's keys
    anti-join a persistent parquet seen-store and only first-seen keys
    are accepted — once seen, duplicate forever, the contract a
    watermarked dedup cannot express.  Batch shards are named by batch
    id so crash replays overwrite themselves (exactly-once accepts;
    replay/restart semantics pinned in tests/test_streaming.py).  The
    oracle is the batch ground truth: the accepted set must equal the
    distinct key set of the whole stream.  Key = md5 of a coarse
    (event_type, floor(value)) fingerprint so real duplicate pressure
    exists in the testdata."""
    from flo_spark.queries import _events_stream, scratch_dir
    from flo_spark.streaming.dedup_ingest import dedup_ingest

    tmp = scratch_dir("flo_dedup_ingest_")
    key = F.md5(
        F.concat_ws(
            "|",
            F.col("event_type"),
            F.floor(F.col("value")).cast("long").cast("string"),
        ).cast("binary")
    )
    return dedup_ingest(
        _events_stream(spark, sf_dir),
        store_dir=f"{tmp}/store",
        key=key,
        checkpoint_dir=f"{tmp}/ckpt",
    )


# --------------------------------------------------------------------------
# Z-order clustering (multi-dimensional data skipping)
# --------------------------------------------------------------------------


def _zorder_oracle_sql() -> str:
    from flo_spark.operators.zorder import zorder_value_sql

    z = zorder_value_sql(
        [("o_custkey", 0.0, 100000.0), ("o_totalprice", 0.0, 600000.0)]
    )
    return f"""
    SELECT o_orderkey, {z} AS zvalue
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """


@query("zorder_morton_key", _zorder_oracle_sql())
def zorder_morton_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key computation — the layout primitive behind
    multi-dimensional file skipping (operators/zorder.py): quantize
    each dimension onto a FIXED grid (layout constants, not batch
    statistics) and interleave the bits so a sort by the key keeps
    every participating column locally dense.  The oracle evaluates
    the bit-for-bit identical interleave in DuckDB, pinning the
    quantization arithmetic and bit layout across engines.  The
    actual skipping effect — a totalprice-only range predicate prunes
    files under the Z-order layout but cannot prune a
    custkey-sorted one — is measured from real parquet footers in
    tests/test_zorder.py.

    100 TB shape: pure JVM bit arithmetic in the scan stage; writing
    the layout costs one range shuffle, identical to any sorted
    write."""
    from flo_spark.operators.zorder import zorder_value

    o = load(spark, sf_dir, "orders")
    z = zorder_value(
        [
            (F.col("o_custkey"), 0.0, 100000.0),
            (F.col("o_totalprice"), 0.0, 600000.0),
        ]
    )
    return (
        o.select("o_orderkey", z.alias("zvalue"))
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "freq_items_heavy_hitters",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    """,
)
def freq_items_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through Spark's single-pass ``freqItems`` sketch
    (Karp-Schenker-Papadimitriou), verified exactly: the sketch
    guarantees a SUPERSET of all items with frequency > support, so
    exact-counting only the candidates and applying the threshold must
    reproduce the full-table answer — if the superset guarantee ever
    broke, a missing row fails the hash check.  The two driver-side
    collects (the 1-row candidate array and the total count) are O(1),
    documented.

    100 TB shape: this is THE pattern for heavy hitters at scale —
    one streaming-sketch pass over the corpus, then an exact count of
    the O(1/support) candidates only, instead of a full groupBy on an
    ultra-high-cardinality key."""
    docs = load(spark, sf_dir, "documents")
    total = docs.count()
    [row] = docs.freqItems(["lang"], support=0.05).collect()
    candidates = list(row[0])
    return (
        docs.filter(F.col("lang").isin(candidates))
        .groupBy("lang")
        .count()
        .filter(F.col("count") > 0.05 * total)
        .select("lang", F.col("count").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Round 6 additions: interval-join binning, CCNet-style boilerplate strip,
# exact linear quality classifier, fixed-point PageRank
# --------------------------------------------------------------------------

#: irregular, OVERLAPPING price bands — a point can match several, so the
#: join is a genuine interval join, not a disguised bucketing.
_PRICE_BANDS = [
    ("micro", 0, 25000),
    ("small", 20000, 60000),
    ("mid", 50000, 150000),
    ("large", 140000, 300000),
    ("jumbo", 280000, 500000),
    ("premium", 450000, 520000),
    ("vip_overlay", 100000, 400000),
    ("all_range", 0, 520000),
]
_BAND_W = 50000  # bin width for the equi-join rewrite

_BANDS_VALUES_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)


@query(
    "interval_join_binned",
    f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES_SQL})
    SELECT b.band AS band,
           count(*) AS n_orders,
           {money_sum_sql('o.o_totalprice')} AS sum_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join rewritten as an EQUI-join on bin ids.

    A pure interval predicate (no equality key) compiles to
    BroadcastNestedLoopJoin — O(|points| x |intervals|) compares and a
    mandatory broadcast, the classic 100 TB scale-killer for IP-range
    lookups, time-interval attribution, and genomic overlap joins.  The
    rewrite is the standard binning trick (DBR's range-join optimization,
    here hand-built from DataFrame ops): explode each interval into the
    fixed-width bins it overlaps, key each point by its bin, hash-join
    on the bin id, then re-check the exact predicate.  Each matching
    (point, interval) pair survives exactly once because the point lies
    in exactly one bin.  The plan becomes a shuffleable hash join that
    scales with both sides (plan-pinned: no BroadcastNestedLoopJoin, no
    CartesianProduct); bin width trades replication (wide intervals hit
    more bins) against join fan-in.

    Bands overlap deliberately (vip_overlay spans mid/large/jumbo) so
    multi-match semantics are exercised; money totals via the exact
    scaled-long path."""
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo long, hi long")
    binned = bands.withColumn(
        "bin",
        F.explode(F.sequence(F.expr(f"lo div {_BAND_W}"), F.expr(f"hi div {_BAND_W}"))),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_totalprice", F.floor(F.col("o_totalprice") / _BAND_W).alias("bin")
    )
    return (
        o.join(binned, "bin")
        .filter(
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi"))
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "boilerplate_chunk_strip",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tot AS (SELECT count(*) AS n_docs FROM documents),
    c AS (
      SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(ws[i*3+1 : i*3+3], ' ') AS chunk
      FROM d, UNNEST(range((len(ws) + 2) // 3)) AS t(i)
    ),
    dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM c GROUP BY chunk),
    kept AS (
      SELECT c.doc_id, c.idx, c.chunk
      FROM c JOIN dfreq USING (chunk), tot
      WHERE dfreq.df * 200 <= tot.n_docs
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY idx) AS cleaned
      FROM kept GROUP BY doc_id
    ),
    ntot AS (SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id)
    SELECT n.doc_id AS doc_id,
           n.n_chunks AS n_chunks,
           n.n_chunks - coalesce(a.n_kept, 0) AS n_removed,
           coalesce(a.cleaned, '') AS cleaned_text
    FROM ntot n LEFT JOIN agg a USING (doc_id)
    """,
)
def boilerplate_chunk_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal by CORPUS frequency:
    a text unit repeated across more than 0.5% of documents (nav menus,
    cookie banners, license headers) is stripped from every document
    that contains it, and the document is reassembled in original
    order.  Re-based on non-overlapping 3-word chunks because this
    corpus has no line structure; the unit is a parameter, not the
    semantics.  Distinct from span_dedup_stats (keep-FIRST exact span
    dedup): here removal is frequency-thresholded and hits every
    occurrence including the first.

    100 TB shape: chunking is shuffle-free in the scan stage; the
    document-frequency table shuffles (chunk -> count distinct) once;
    the verdict join is chunk-keyed; reassembly is one doc_id shuffle
    with an in-group sort.  The corpus-size scalar is a 1-row broadcast
    (no driver collect).  The frequency threshold is RELATIVE
    (df * 200 <= n_docs), so the operator's behavior is stable as the
    corpus grows."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    tot = d.agg(F.count("*").alias("n_docs"))
    c = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, (size(ws) + 2) div 3 - 1),"
                " i -> array_join(slice(ws, i*3 + 1, 3), ' '))"
            )
        ).alias("idx", "chunk"),
    ).select("doc_id", F.col("idx").cast("long").alias("idx"), "chunk")
    dfreq = c.groupBy("chunk").agg(F.countDistinct("doc_id").alias("df"))
    kept = (
        c.join(dfreq, "chunk")
        .join(F.broadcast(tot))
        .filter(F.col("df") * 200 <= F.col("n_docs"))
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("cleaned"),
    )
    ntot = c.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return ntot.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
    )


@query(
    "quality_classifier_score",
    """
    WITH f AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '),
                             w -> w = 'the' OR w = 'a')) AS n_stop,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           (1000 * n_distinct) // n_words AS r_distinct,
           (1000 * n_stop) // n_words AS r_stop,
           (10 * n_chars) // n_words AS r_wlen,
           3 * ((1000 * n_distinct) // n_words)
             - 20 * ((1000 * n_stop) // n_words)
             + 7 * ((10 * n_chars) // n_words) AS score,
           (3 * ((1000 * n_distinct) // n_words)
             - 20 * ((1000 * n_stop) // n_words)
             + 7 * ((10 * n_chars) // n_words)) >= 1500 AS keep
    FROM f
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier (the FineWeb-Edu /
    DCLM-style 'model-based quality filtering' stage, re-based on an
    interpretable linear model so the contract is EXACT): engineered
    features — lexical diversity, stopword rate, mean word length —
    combined with integer weights into a score and a keep verdict.

    Every feature is an integer-scaled ratio computed with integer
    division, so the score is bit-identical on any engine — no
    sigmoid/exp whose libm rounding could flip a verdict at a ulp
    boundary (the q7 lesson applied to ML scoring).  A real deployment
    swaps the weights for learned ones (the shape is a dot product
    either way); the Spark plan is a pure scan-stage projection —
    shuffle-free, whole-stage-codegen, zero Python — so it runs at
    scan speed over 100 TB."""
    d = load(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("n_words"),
        F.expr("size(array_distinct(split(text, ' ')))").alias("n_distinct"),
        F.expr(
            "size(filter(split(text, ' '), w -> w = 'the' OR w = 'a'))"
        ).alias("n_stop"),
        F.length("text").alias("n_chars"),
    )
    r_distinct = F.expr("(1000 * n_distinct) div n_words")
    r_stop = F.expr("(1000 * n_stop) div n_words")
    r_wlen = F.expr("(10 * n_chars) div n_words")
    score = 3 * r_distinct - 20 * r_stop + 7 * r_wlen
    return f.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        r_distinct.alias("r_distinct"),
        r_stop.alias("r_stop"),
        r_wlen.alias("r_wlen"),
        score.alias("score"),
        (score >= 1500).alias("keep"),
    )


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    """One unrolled fixed-point PageRank step for the DuckDB oracle."""
    return (
        f"{cur} AS (SELECT a.dst AS node,"
        f" 150000 + CAST((85 * sum(r.pr // a.outdeg)) // 100 AS BIGINT) AS pr"
        f" FROM adj a JOIN {prev} r ON r.node = a.src GROUP BY a.dst)"
    )


@query(
    "pagerank_customer_supplier",
    f"""
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    adj AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
    {_pagerank_iter_sql('r0', 'r1')},
    {_pagerank_iter_sql('r1', 'r2')},
    {_pagerank_iter_sql('r2', 'r3')}
    SELECT node, pr AS rank_scaled FROM r3
    ORDER BY rank_scaled DESC, node LIMIT 20
    """,
)
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the bipartite customer<->supplier
    trade graph (edges = distinct (customer, supplier) pairs through
    orders x lineitem, symmetrized) — the iterative-algorithm pattern
    (Pregel on DataFrames): per round, one edge->rank equi-join and one
    shuffle grouping messages by destination.

    Arithmetic is FIXED-POINT (1e-6 units, BIGINT): contribution =
    pr div outdeg, damping = 0.15 + 0.85x applied as integer ops — so
    three engines running three rounds land bit-identical ranks, where
    double summation would be order-sensitive (the q7 lesson applied to
    graph analytics).  The oracle unrolls the three rounds as chained
    CTEs — no recursion, aggregates allowed.

    100 TB shape: the adjacency (edges + out-degree) is built once and
    persisted; each round shuffles messages by dst — O(|E|) per round,
    no driver-side state.  Deep iteration adds localCheckpoint every
    few rounds to cut lineage (the operators/graph.py discipline);
    top-20 compiles to TakeOrderedAndProject, never a global sort."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(1000000).cast("long").alias("pr"))
    for _ in range(3):
        msgs = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.col("dst").alias("mnode"), F.expr("pr div outdeg").alias("contrib")
        )
        ranks = (
            msgs.groupBy("mnode")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("mnode").alias("node"),
                F.expr("150000 + (85 * s) div 100").alias("pr"),
            )
        )
    return (
        ranks.select("node", F.col("pr").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "node")
        .limit(20)
    )


@query(
    "cdc_chunk_dedup_stats",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT doc_id, i AS pos, ws[i] AS word
          FROM d, UNNEST(range(1, len(ws) + 1)) AS t(i)),
    h AS (SELECT doc_id, pos, word,
                 ascii(substr(word || '__', 1, 1)) * 4096
               + ascii(substr(word || '__', 2, 1)) * 64
               + length(word) AS wh
          FROM w),
    ck AS (SELECT doc_id, pos, word,
                  coalesce(sum(CASE WHEN wh % 5 = 0 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS chunk_id
           FROM h),
    chunks AS (SELECT doc_id, chunk_id,
                      string_agg(word, ' ' ORDER BY pos) AS ctext,
                      count(*) AS n_words
               FROM ck GROUP BY doc_id, chunk_id),
    ranked AS (SELECT doc_id, chunk_id, n_words,
                      row_number() OVER (PARTITION BY ctext
                                         ORDER BY doc_id, chunk_id) AS rn
               FROM chunks)
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN n_words ELSE 0 END) AS BIGINT)
               AS dup_words
    FROM ranked GROUP BY doc_id
    """,
)
def cdc_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync-style, re-based on
    words) + corpus-wide first-occurrence chunk dedup accounting.

    A word is a chunk BOUNDARY when a deterministic hash of the word
    satisfies h % 5 == 0, so chunk identity depends only on local
    content: inserting a word shifts at most the chunk it lands in,
    where fixed-width chunking (doc_chunking, span_dedup) reslices the
    whole tail — THE property that makes CDC the storage-dedup
    standard.  Chunks dedup corpus-wide by first occurrence
    ((doc_id, chunk_id) min per chunk text); per doc the entry reports
    total chunks, duplicate instances, and the words those duplicates
    would save — the dedupable-bytes estimate.

    The word hash is engine-portable arithmetic (ascii of padded first
    two chars + length — no engine hash function), so the oracle
    reproduces boundaries bit-exactly; all outputs are integers.

    100 TB shape: boundary detection and word explode are scan-stage;
    chunk assembly shuffles once on doc_id (window + group);
    first-occurrence ranking shuffles once on chunk text — at scale
    that key becomes xxhash64(ctext) so 8-byte keys move, not strings
    (the duplicate_ngram_rate discipline); per-doc rollup re-shuffles
    reduced rows only."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    w = d.select(
        "doc_id",
        (F.posexplode("ws")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    wh = (
        F.ascii(F.substring(F.concat(F.col("word"), F.lit("__")), 1, 1)) * 4096
        + F.ascii(F.substring(F.concat(F.col("word"), F.lit("__")), 2, 1)) * 64
        + F.length("word")
    )
    h = w.withColumn("wh", wh)
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ck = h.withColumn(
        "chunk_id",
        F.coalesce(
            F.sum(F.when(F.col("wh") % 5 == 0, 1).otherwise(0)).over(win),
            F.lit(0),
        ),
    )
    chunks = ck.groupBy("doc_id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("ctext"),
        F.count("*").alias("n_words"),
    )
    rnw = Window.partitionBy("ctext").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("rn", F.row_number().over(rnw))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_chunks"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("dup_words"),
    )


@query(
    "neardup_ingest_verdicts",
    """
    SELECT doc_id, TRUE AS accepted FROM documents WHERE doc_id < 200
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, FALSE AS accepted
    FROM documents WHERE doc_id < 60
    """,
)
def neardup_ingest_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup ingest contract (streaming/dedup_ingest.py
    ``fold_neardup_batch``): documents arriving over three batches are
    admitted iff none of their MinHash LSH band buckets collides with
    an already-accepted document — sequential admission, unbounded
    across batches, the near-dup analog of ``stream_dedup_ingest``.

    PLANTED so every verdict is provable: each base document's words
    are suffixed with its doc_id, so distinct documents share ZERO
    shingles (band collision probability ~2^-64 per pair — and the
    outcome is deterministic, re-verified at every SF); each planted
    copy (id + 100000) reuses its original's text VERBATIM, so its
    signature — hence every band bucket — is identical and rejection
    is guaranteed.  Copies of batch-0/1 originals land one batch later
    (cross-batch rejection through the persistent store); copies of
    batch-2 originals land in batch 2 itself (within-batch sequential
    rejection: the copy's higher id loses).  The oracle is the
    construction: originals accepted, copies rejected.

    Replay idempotency and the collides-only-with-rejected admission
    subtlety are pinned in tests/test_neardup_ingest.py."""
    from flo_spark.queries import scratch_dir
    from flo_spark.streaming.dedup_ingest import (
        _read_store,
        fold_neardup_batch,
    )

    tmp = scratch_dir("flo_neardup_ingest_")
    store = f"{tmp}/store"
    uniq = F.expr(
        "array_join(transform(split(text, ' '),"
        " w -> concat(w, '_', cast(doc_id as string))), ' ')"
    )
    base = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", uniq.alias("text"))
    )
    copies = base.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    all_docs = base.unionByName(copies)
    for b in range(3):
        orig_b = base.filter(F.col("doc_id") % 3 == b)
        # copies of batch-0/1 originals arrive one batch later;
        # copies of batch-2 originals arrive in batch 2 itself
        cpy_src = F.col("doc_id") - 100000
        cpy_b = copies.filter(
            ((cpy_src % 3 == b - 1) & F.lit(b in (1, 2)))
            | ((cpy_src % 3 == 2) & F.lit(b == 2))
        )
        fold_neardup_batch(
            orig_b.unionByName(cpy_b), b, store, fan_out=False
        )
    accepted = (
        _read_store(spark, store)
        .select("doc_id")
        .distinct()
        .withColumn("accepted", F.lit(True))
    )
    return all_docs.select("doc_id").join(accepted, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("accepted"), F.lit(False)).alias("accepted")
    )


@query(
    "funnel_conversion",
    """
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage, (SELECT count(*) FROM t1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM t2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM t3)
    ) ORDER BY ord
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): a user
    advances a stage only with an event STRICTLY AFTER their previous
    stage's completion time — the classic product-analytics query,
    here as three chained filtered aggregations (each stage = one
    pre-filtered scan + one user_id-keyed join + min-agg).

    100 TB shape: each stage's scan is filtered to ONE event type
    before any shuffle (predicate reaches the parquet scan); joins are
    user_id-keyed against already-reduced per-user frames that shrink
    monotonically down the funnel.  No windows over the raw event
    stream, no driver-side state."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    counts = [
        (1, "view", t1),
        (2, "click", t2),
        (3, "purchase", t3),
    ]
    parts = [
        t.agg(F.count("*").alias("n_users")).select(
            F.lit(ordn).alias("ord"), F.lit(stage).alias("stage"), "n_users"
        )
        for ordn, stage, t in counts
    ]
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.orderBy("ord").select("stage", "n_users")


@query(
    "cohort_retention",
    """
    WITH w AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
                 AS week
      FROM events
    ),
    first_w AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, week FROM w)
    SELECT f.cohort_week AS cohort_week,
           a.week - f.cohort_week AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first_w f USING (user_id)
    GROUP BY f.cohort_week, a.week - f.cohort_week
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each cohort and week offset, how many are still
    active — the standard retention triangle, all integer-week
    arithmetic so the contract is exact.

    100 TB shape: one user_id shuffle for first-week, one distinct on
    the already-narrow (user, week) projection, one keyed join of two
    reduced frames, one final small-key aggregate.  The raw event
    stream is scanned once, two columns wide."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    w = ev.select(
        "user_id",
        F.expr(
            "datediff(cast(ts as date), date '2024-01-01') div 7"
        ).alias("week"),
    )
    first_w = w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = w.distinct()
    return (
        active.join(first_w, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _bpe_step_sql(prev: str, k: int) -> str:
    """One unrolled BPE merge step for the DuckDB oracle: pair counts
    over the previous step's token sequences, deterministic top pair
    (count desc, then lexicographic; equal-halves pairs excluded so
    mark-based application is exact), merge application, corpus size."""
    return f"""
    pc{k} AS (
      SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM {prev}, UNNEST(range(1, len(toks))) AS t(i)
      GROUP BY toks[i], toks[i+1]
    ),
    m{k} AS (SELECT l, r, pcnt FROM pc{k} WHERE l <> r
             ORDER BY pcnt DESC, l, r LIMIT 1),
    s{k} AS (
      SELECT word, cnt,
             list_filter(
               list_transform(range(1, len(toks) + 1), i ->
                 CASE
                   WHEN i < len(toks) AND toks[i] = m{k}.l
                        AND toks[i+1] = m{k}.r
                     THEN toks[i] || toks[i+1]
                   WHEN i > 1 AND toks[i-1] = m{k}.l AND toks[i] = m{k}.r
                     THEN NULL
                   ELSE toks[i]
                 END),
               x -> x IS NOT NULL) AS toks
      FROM {prev}, m{k}
    ),
    ta{k} AS (SELECT CAST(sum(cnt * len(toks)) AS BIGINT) AS tokens_after
              FROM s{k})"""


@query(
    "bpe_merge_steps",
    f"""
    WITH wf AS (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    s0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS toks FROM wf),
    {_bpe_step_sql('s0', 1)},
    {_bpe_step_sql('s1', 2)},
    {_bpe_step_sql('s2', 3)}
    SELECT 1 AS step, m1.l AS left_tok, m1.r AS right_tok,
           m1.pcnt AS pair_count, ta1.tokens_after AS tokens_after
    FROM m1, ta1
    UNION ALL
    SELECT 2, m2.l, m2.r, m2.pcnt, ta2.tokens_after FROM m2, ta2
    UNION ALL
    SELECT 3, m3.l, m3.r, m3.pcnt, ta3.tokens_after FROM m3, ta3
    """,
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING as a DataFrame program: three merge
    steps learned from corpus word frequencies (Sennrich et al. 2016
    re-based on Spark), each step = count adjacent token pairs
    weighted by word frequency, pick the most frequent pair, merge
    every occurrence across the vocabulary.

    Exactness: the top pair is deterministic (count desc, then
    lexicographic), pairs with EQUAL halves are excluded from
    selection so mark-based merge application (absorb the right token
    of every (l,r) adjacency) is provably identical to greedy
    left-to-right — marks can never be adjacent when l != r.  Output
    per step: the learned merge, its count, and the corpus token count
    after applying it — the tokens_after column pins the APPLICATION,
    not just the selection.  The oracle unrolls the three steps as
    chained CTEs (the PageRank discipline).

    100 TB shape: this IS the real structure of BPE training — ONE
    corpus-scale shuffle builds the word-frequency table, which is
    vocabulary-sized (tiny) from then on; every merge iteration
    operates on that reduced table, and the only driver-bound data is
    the 1-row top-pair frame broadcast per step."""
    _seqs, steps = _bpe_train(spark, sf_dir)
    return steps[0].unionByName(steps[1]).unionByName(steps[2])


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run the 3-step BPE merge loop; returns (final word->tokens
    vocabulary frame, per-step merge summary frames).  Shared by the
    training entry (reports the steps) and the encode entry (applies
    the final vocabulary to the corpus)."""
    wf = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        # consecutive/leading/trailing spaces yield empty words whose
        # empty token array would crash ANSI element_at downstream
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    seqs = wf.select(
        "word", "cnt", F.expr("regexp_extract_all(word, '.', 0)").alias("toks")
    )
    merge_expr = """
      filter(
        transform(sequence(1, size(toks)), i ->
          CASE
            WHEN i < size(toks) AND element_at(toks, i) = ml
                 AND try_element_at(toks, i + 1) = mr
              THEN concat(element_at(toks, i), try_element_at(toks, i + 1))
            WHEN i > 1 AND try_element_at(toks, greatest(i - 1, 1)) = ml
                 AND element_at(toks, i) = mr
              THEN NULL
            ELSE element_at(toks, i)
          END),
        x -> x IS NOT NULL)"""
    steps = []
    for step in (1, 2, 3):
        pairs = (
            seqs.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, greatest(size(toks) - 1, 1)),"
                        " i -> struct(element_at(toks, i) AS l,"
                        " try_element_at(toks, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .select("cnt", "p.l", "p.r")
            .filter(F.col("r").isNotNull())
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("pcnt"))
            .filter(F.col("l") != F.col("r"))
            .orderBy(F.col("pcnt").desc(), "l", "r")
            .limit(1)
        )
        seqs = seqs.crossJoin(
            F.broadcast(
                top.select(F.col("l").alias("ml"), F.col("r").alias("mr"))
            )
        ).select("word", "cnt", F.expr(merge_expr).alias("toks"))
        # cut the per-step plan growth: the vocab table is tiny and the
        # next step re-reads it 3x (pairs, merge, corpus size)
        seqs = seqs.localCheckpoint()
        ta = seqs.agg(
            F.sum(F.col("cnt") * F.size("toks")).alias("tokens_after")
        )
        steps.append(
            top.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_tok"),
                F.col("r").alias("right_tok"),
                F.col("pcnt").alias("pair_count"),
            ).crossJoin(F.broadcast(ta))
        )
    return seqs, steps


@query(
    "bpe_encode_tokens",
    f"""
    WITH wf AS (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    s0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS toks FROM wf),
    {_bpe_step_sql('s0', 1)},
    {_bpe_step_sql('s1', 2)},
    {_bpe_step_sql('s2', 3)},
    w AS (SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents) WHERE word <> '')
    SELECT w.doc_id AS doc_id,
           count(*) AS n_words,
           CAST(sum(len(s3.toks)) AS BIGINT) AS n_tokens_bpe
    FROM w JOIN s3 ON s3.word = w.word
    GROUP BY w.doc_id
    """,
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ENCODING with the trained BPE vocabulary: every
    document's words join the word->tokens table learned by
    ``bpe_merge_steps``'s 3 merges, yielding the exact post-merge
    token count per document — the token accounting an LLM data
    pipeline runs before packing/budgeting, using a REAL trained
    tokenizer rather than a whitespace proxy.

    100 TB shape: the vocabulary is tiny relative to the corpus, so
    the encode join auto-broadcasts (no hint — at an extreme
    vocabulary scale it degrades to a word-keyed shuffle, still
    correct); the corpus is scanned once, exploded to words, and
    aggregated straight back to doc_id — two shuffles total, nothing
    driver-side but the per-step 1-row top-pair frames."""
    seqs, _steps = _bpe_train(spark, sf_dir)
    vocab = seqs.select("word", F.size("toks").alias("n_toks"))
    words = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_toks").alias("n_tokens_bpe"),
        )
    )


@query(
    "langid_trigram_confusion",
    """
    WITH tri AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, length(text) - 1),
                                   i -> substr(text, CAST(i AS INT), 3)))
                 AS tg
      FROM documents WHERE length(text) >= 3
    ),
    prof AS (
      SELECT lang AS p_lang, tg FROM (
        SELECT lang, tg, row_number() OVER (
                 PARTITION BY lang ORDER BY count(*) DESC, tg) AS rk
        FROM tri GROUP BY lang, tg
      ) WHERE rk <= 20
    ),
    dtg AS (SELECT DISTINCT doc_id, lang, tg FROM tri),
    overlap AS (
      SELECT d.doc_id, d.lang AS lang_actual, p.p_lang,
             count(*) AS n_hits
      FROM dtg d JOIN prof p USING (tg)
      GROUP BY d.doc_id, d.lang, p.p_lang
    ),
    pred AS (
      SELECT doc_id, lang_actual, p_lang AS lang_predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY n_hits DESC, p_lang) AS rk
        FROM overlap
      ) WHERE rk = 1
    ),
    all_docs AS (SELECT doc_id, lang AS lang_actual FROM documents)
    SELECT a.lang_actual,
           coalesce(p.lang_predicted, 'unk') AS lang_predicted,
           count(*) AS n_docs
    FROM all_docs a LEFT JOIN pred p USING (doc_id)
    GROUP BY a.lang_actual, coalesce(p.lang_predicted, 'unk')
    """,
)
def langid_trigram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language identification, TRAINED on the
    labeled corpus (the real n-gram recipe behind fastText-style
    lang-id, integer-exact edition): per language, the 20 most
    frequent trigrams form a profile; each document is classified to
    the profile sharing the most distinct trigrams (deterministic
    tie-breaks: count desc then trigram/lang asc); output is the
    actual x predicted confusion matrix.  On this synthetic corpus the
    labels are independent of the text, so the matrix REPORTS that
    honestly (near-uniform rows) — the operator contract is the
    training + classification pipeline, which is exact.

    100 TB shape: trigram explode is scan-stage; profile training is
    one (lang, trigram) shuffle cut to top-20 per language by a
    bounded window; the profile (n_langs x 20 rows) auto-broadcasts
    into the classification join; per-doc argmax is a doc-keyed
    window over <= n_langs rows."""
    d = load(spark, sf_dir, "documents")
    tri = d.filter(F.length("text") >= 3).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    )
    prof_w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("tg")
    )
    prof = (
        tri.groupBy("lang", "tg")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(prof_w))
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    dtg = tri.select("doc_id", "lang", "tg").distinct()
    overlap = (
        dtg.join(prof, "tg")
        .groupBy("doc_id", F.col("lang").alias("lang_actual"), "p_lang")
        .agg(F.count("*").alias("n_hits"))
    )
    pred_w = Window.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("p_lang")
    )
    pred = (
        overlap.withColumn("rk", F.row_number().over(pred_w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("p_lang").alias("lang_predicted"))
    )
    return (
        d.select("doc_id", F.col("lang").alias("lang_actual"))
        .join(pred, "doc_id", "left")
        .groupBy(
            "lang_actual",
            F.coalesce(F.col("lang_predicted"), F.lit("unk")).alias(
                "lang_predicted"
            ),
        )
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "doc_length_log2_histogram",
    """
    WITH n AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_words
      FROM documents
    )
    SELECT source,
           CAST(length(bin(n_words)) - 1 AS BIGINT) AS log2_bucket,
           count(*) AS n_docs,
           CAST(min(n_words) AS BIGINT) AS min_words,
           CAST(max(n_words) AS BIGINT) AS max_words
    FROM n
    GROUP BY source, length(bin(n_words)) - 1
    """,
)
def doc_length_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram per source — the
    long-tail diagnostic every corpus report carries (truncation
    thresholds, packing efficiency, outlier hunting).  The bucket is
    floor(log2(n)) computed EXACTLY as length(bin(n)) - 1 — binary
    digit count, pure integer arithmetic, no libm log whose rounding
    could flip a boundary value (1024 is always bucket 10).  One
    map-side-combinable aggregate; the bucketing runs in the scan
    stage."""
    d = load(spark, sf_dir, "documents")
    n = d.select(
        "source", F.expr("size(split(text, ' '))").alias("n_words")
    )
    return (
        n.withColumn(
            "log2_bucket",
            (F.length(F.expr("bin(n_words)")) - 1).cast("long"),
        )
        .groupBy("source", "log2_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_words").cast("long").alias("min_words"),
            F.max("n_words").cast("long").alias("max_words"),
        )
    )


@query(
    "federated_trimodal_join",
    """
    WITH tagged AS (
      SELECT doc_id, source,
             CASE WHEN doc_id < 100 THEN 'native'
                  WHEN doc_id < 200 THEN 'jsonl_gz'
                  ELSE 'parquet' END AS via,
             len(string_split(text, ' ')) AS n_words,
             n_chars
      FROM documents WHERE doc_id < 300
    )
    SELECT via, source,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY via, source
    """,
)
def federated_trimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated query over THREE storage systems in one logical plan:
    a slice of the corpus served from native flo ``.events`` segments
    (binary codec scan), a slice from gzipped JSONL shards (the
    public-dataset wire format), and a slice from parquet — unioned,
    joined back to the parquet catalog for per-doc metadata, and
    aggregated together.  The contract a lakehouse engine owes its
    users: where a record LIVES never changes what a query SAYS.

    100 TB shape: each source contributes its own scan parallelism
    (segment files / gzip shards / parquet splits); the union is
    plan-level (no materialization); the metadata join is doc_id-keyed
    against reduced frames.  The oracle reconstructs all three slices
    from the parquet catalog alone, so any codec/export drift in the
    native or JSONL paths breaks the hash."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.flo_segment import (
        read_flo_segments,
        write_flo_segments,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tmp = scratch_dir("flo_federated_")

    # slice A -> native flo segments (text as the event payload)
    native_path = f"{tmp}/native"
    a = d.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1).alias("event_counter"),
        (F.col("doc_id") % 2 + 1).cast("int").alias("actor"),
        F.lit(None).cast("long").alias("parent_counter"),
        F.lit(None).cast("int").alias("parent_actor"),
        F.timestamp_seconds(F.col("doc_id")).alias("timestamp"),
        F.concat(F.lit("/corpus/"), F.col("source")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 2 + 1).cast("int").alias("partition"),
    )
    write_flo_segments(a, native_path, max_events_per_segment=40)
    native = read_flo_segments(spark, native_path).select(
        (F.col("event_counter") - 1).alias("doc_id"),
        F.expr("substring(namespace, 9)").alias("source"),
        F.lit("native").alias("via"),
        F.expr("size(split(decode(data, 'utf-8'), ' '))").alias("n_words"),
    )

    # slice B -> gzipped JSONL shards
    jdir = f"{tmp}/jsonl"
    d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "source", "text"
    ).repartition(3).write.option("compression", "gzip").json(jdir)
    jsonl = (
        spark.read.schema("doc_id long, source string, text string")
        .json(jdir)
        .select(
            "doc_id",
            "source",
            F.lit("jsonl_gz").alias("via"),
            F.expr("size(split(text, ' '))").alias("n_words"),
        )
    )

    # slice C -> the parquet catalog itself
    parquet = d.filter(F.col("doc_id") >= 200).select(
        "doc_id",
        "source",
        F.lit("parquet").alias("via"),
        F.expr("size(split(text, ' '))").alias("n_words"),
    )

    unioned = native.unionByName(jsonl).unionByName(parquet)
    meta = d.select("doc_id", "n_chars")
    return (
        unioned.join(meta, "doc_id")
        .groupBy("via", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "hll_sketch_union_bounded",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS within_bound
    FROM events
    """,
)
def hll_sketch_union_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    Spark 3.5+ ``hll_sketch_agg``/``hll_union_agg``): per event type a
    sketch of the user set, then the per-type SKETCHES — not the raw
    data — union into the global estimate.  Re-aggregating sketches is
    THE pattern for distinct counts over 100 TB: per-partition/per-day
    sketches persist as bytes and roll up at query time without ever
    rescanning raw data (contrast approx_count_distinct, whose partial
    state lives only inside one query).

    The hash contract is the error bound, not the estimate: a merged
    union takes a different internal promotion path than a one-pass
    sketch, so estimates may legally differ by a few ulps of the rsd —
    and partition order can perturb them — but |estimate - exact| <=
    4*rsd*exact + 1 (rsd ~ 1.04/sqrt(2^12) for the default lgK=12)
    must hold for every sketch and for the union, under ANY execution
    order.  Exact counts come from the same scan; a sketch gone wrong
    flips a boolean and breaks the hash."""
    # HLL is duplicate-insensitive, so everything downstream can run on
    # the reduced distinct (type, user) frame: ONE corpus scan, persisted,
    # feeds the per-type sketches, the union, and the exact counts
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .persist()
    )
    rsd = 1.04 / (2 ** 12) ** 0.5
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n_exact"),
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    ).persist()
    per_checked = per.select(
        "event_type",
        "n_exact",
        (
            F.abs(
                F.expr("hll_sketch_estimate(sk)") - F.col("n_exact")
            )
            <= 4 * rsd * F.col("n_exact") + 1
        ).alias("within_bound"),
    )
    total = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    merged = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    global_row = (
        total.join(F.broadcast(merged))
        .select(
            F.lit("ALL").alias("event_type"),
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= 4 * rsd * F.col("n_exact") + 1
            ).alias("within_bound"),
        )
    )
    return per_checked.unionByName(global_row)


@query(
    "constraint_audit",
    """
    SELECT 'orders_pk_unique' AS constraint_name,
           (SELECT count(*) FROM
              (SELECT o_orderkey FROM orders GROUP BY o_orderkey
               HAVING count(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_qty_positive',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'lineitem_discount_domain',
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.1)
    UNION ALL
    SELECT 'orders_status_domain',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    UNION ALL
    SELECT 'customer_acctbal_not_null',
           (SELECT count(*) FROM customer WHERE c_acctbal IS NULL)
    UNION ALL
    SELECT 'orders_totalprice_cap_300k',
           (SELECT count(*) FROM orders WHERE o_totalprice > 300000)
    """,
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality audit in one program:
    primary-key uniqueness, two referential-integrity checks
    (orders->customer, lineitem->orders via anti-joins), domain and
    positivity constraints, and a completeness check — each reported
    as (constraint_name, n_violations), so the audit output doubles as
    the quality dashboard feed and any regression is an exact integer
    diff.

    100 TB shape: uniqueness is one key shuffle cut to dup groups;
    referential integrity is a LEFT ANTI join per FK (the dim side
    auto-broadcasts when small, degrades to a key shuffle at scale);
    the scalar domain checks are scan-stage conditional counts that
    collapse into one pass per table.  No driver-side data — the
    result is seven 1-row aggregates unioned at plan level."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def one(name: str, df) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_violations")).select(
            F.lit(name).alias("constraint_name"), "n_violations"
        )

    dup_pk = (
        o.groupBy("o_orderkey").count().filter(F.col("count") > 1)
    )
    fk_cust = o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_anti"
    )
    fk_ord = li.join(
        o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti"
    )
    checks = [
        one("orders_pk_unique", dup_pk),
        one("orders_fk_customer", fk_cust),
        one("lineitem_fk_orders", fk_ord),
        one("lineitem_qty_positive", li.filter(F.col("l_quantity") <= 0)),
        one(
            "lineitem_discount_domain",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
        one(
            "orders_status_domain",
            o.filter(~F.col("o_orderstatus").isin("O", "F", "P")),
        ),
        one("customer_acctbal_not_null", c.filter(F.col("c_acctbal").isNull())),
        # a soft expectation that HAS violations by design: with every
        # hard constraint at zero, a checker that always returned 0
        # would pass vacuously — this row proves the counting path
        one(
            "orders_totalprice_cap_300k",
            o.filter(F.col("o_totalprice") > 300000),
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@query(
    "triangle_count_copurchase",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.lo = e1.hi
      JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    stats AS (
      SELECT (SELECT count(*) FROM e) AS n_edges,
             (SELECT count(DISTINCT n) FROM
                (SELECT lo AS n FROM e UNION ALL SELECT hi FROM e)) AS n_nodes
    )
    SELECT s.n_nodes, s.n_edges, CAST(t.n_triangles AS BIGINT) AS n_triangles
    FROM stats s, tri t
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts sharing
    >= 2 orders), via DEGREE-ORDERED edge orientation — the
    compact-forward algorithm every distributed triangle counter uses:
    orient each edge from the (degree, id)-smaller endpoint to the
    larger, making a DAG whose max out-degree is O(sqrt(|E|)); then
    triangles = pairs of out-edges from one node whose far endpoints
    are themselves an oriented edge.  Each triangle is counted exactly
    once (its unique (deg,id)-minimal apex), and the candidate-pair
    join is bounded by sum(outdeg^2) = O(|E|^1.5) instead of the
    naive sum(deg^2), which on skewed co-occurrence graphs is the
    difference between feasible and not.

    The support >= 2 threshold makes the graph the MEANINGFUL
    co-purchase structure (one shared order is noise) and keeps it
    sparse at every SF.  The oracle counts the same triangles with
    the orientation-free a<b<c 3-way join — a different algorithm
    reaching the same exact integer."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi")
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("lo", "hi")
        .persist()
    )
    sym = e.select(F.col("lo").alias("n")).unionAll(
        e.select(F.col("hi").alias("n"))
    )
    deg = sym.groupBy("n").agg(F.count("*").alias("deg"))
    # orient lo->hi iff (deg,id) of lo < (deg,id) of hi, else hi->lo
    dl = deg.select(F.col("n").alias("lo"), F.col("deg").alias("dlo"))
    dh = deg.select(F.col("n").alias("hi"), F.col("deg").alias("dhi"))
    ori = (
        e.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("src"), F.col("hi").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("hi").alias("src"), F.col("lo").alias("dst"))
            )
            .alias("o")
        )
        .select("o.src", "o.dst")
        .persist()
    )
    x, y, z = ori.alias("x"), ori.alias("y"), ori.alias("z")
    tri = (
        x.join(
            y,
            (F.col("x.src") == F.col("y.src"))
            & (F.col("x.dst") != F.col("y.dst")),
        )
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    stats = e.agg(
        F.count("*").alias("n_edges"),
    ).crossJoin(sym.distinct().agg(F.count("*").alias("n_nodes")))
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )


@query(
    "variant_props_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           TRUE AS schema_ok
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured event properties through Spark 4's VARIANT type
    (the modern JSON-at-scale story): ``parse_json`` once in the scan
    stage into the binary variant encoding, typed ``variant_get``
    extraction, integer aggregation per event type — plus SCHEMA
    DISCOVERY: ``schema_of_variant_agg`` infers each group's shape
    from the data, and the entry asserts it equals the expected
    OBJECT<k: BIGINT> (a payload drift breaks the boolean, hence the
    hash).

    VARIANT beats string-JSON at 100 TB because the binary encoding
    parses once at ingest and every downstream ``variant_get`` is a
    direct offset lookup, not a re-parse; the plan stays one
    map-side-combinable aggregate over scan-stage expressions."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("parse_json(props)").alias("v")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("variant_get(v, '$.k', 'long')"))
        .cast("long")
        .alias("sum_k"),
        F.min(F.expr("variant_get(v, '$.k', 'long')"))
        .cast("long")
        .alias("min_k"),
        F.max(F.expr("variant_get(v, '$.k', 'long')"))
        .cast("long")
        .alias("max_k"),
        (
            F.expr("schema_of_variant_agg(v)") == F.lit("OBJECT<k: BIGINT>")
        ).alias("schema_ok"),
    )


@query(
    "regression_price_quantity",
    """
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS sx,
             sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS sy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
                 AS sxy,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                 AS sxx,
             sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)
                 * CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
                 AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5) / 10000.0
               AS slope,
           floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 1000.0 + 0.5) / 10.0
               AS intercept,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 1e4 + 0.5) / 1e4
               AS r2
    FROM s
    """,
)
def regression_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares regression of extended price on
    quantity per return flag — the ``regr_slope``/``regr_intercept``/
    ``regr_r2`` family, made ENGINE-EXACT: the builtins fold doubles
    in partition order (the q7 flip class applied to statistics), so
    instead every moment (n, Sx, Sy, Sxy, Sxx, Syy) accumulates as an
    exact integer (prices on the 1e4 money grid), the five moments
    combine by the textbook formulas in exact integer arithmetic, and
    the ONLY float steps are final IEEE divisions of exact integers —
    bit-identical on any engine — rounded on the fixed grid (slope
    4dp, intercept 1dp, r2 4dp).

    100 TB shape: one map-side-combinable aggregate, six integer
    partials per group, no second pass — the same single-shuffle shape
    as q1.  Spark sums in decimal(38,0) (the cross-products exceed
    long range at scale; ANSI raises rather than wraps), DuckDB in
    HUGEINT."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = money_scaled(F.col("l_extendedprice"))
    d = lambda c: c.cast("decimal(38,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(d(x)).alias("sx"),
        F.sum(d(y)).alias("sy"),
        F.sum(d(x * y)).alias("sxy"),
        F.sum(d(x * x)).alias("sxx"),
        F.sum(d(y * y)).alias("syy"),
    )
    n, sx, sy = d(F.col("n")), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    inum = (sy * sxx - sx * sxy).cast("double")
    deny = (n * syy - sy * sy).cast("double")
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.floor(num / den + F.lit(0.5)) / 10000.0).alias("slope"),
        (F.floor(inum / den / 1000.0 + F.lit(0.5)) / 10.0).alias("intercept"),
        (F.floor(num * num / (den * deny) * 1e4 + F.lit(0.5)) / 1e4).alias(
            "r2"
        ),
    )


@query(
    "multimodal_tiff_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 72)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_channels,
           CAST(sum((doc_id * 11 + i) % 256) AS BIGINT) AS sum_pixels
    FROM s GROUP BY doc_id
    """,
)
def multimodal_tiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode, hash-checked (the TIFF sibling of the
    BMP/PNG round trips): per document assemble a baseline
    uncompressed 6x4 RGB TIFF — little-endian for even doc ids,
    BIG-endian for odd, so both byte orders are exercised in every
    run — with 2-row strips (multi-strip assembly) and offset-stored
    multi-value tags (BitsPerSample, strip arrays), channel values
    (doc_id*11 + i) % 256; decode through ``decode_image`` (the
    engine's native IFD walker) and sum the recovered channels.  The
    oracle computes the same sums from the formula — a defect in tag
    parsing, endianness, strip concatenation, or geometry breaks the
    hash."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import (
        decode_image,
        encode_tiff_baseline,
    )

    W, H, C = 6, 4, 3

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_channels": [], "sum_pixels": []}
            for doc_id in pdf.doc_id:
                arr = (
                    (int(doc_id) * 11 + np.arange(W * H * C)) % 256
                ).astype(np.uint8).reshape(H, W, C)
                bo = "<" if doc_id % 2 == 0 else ">"
                got = decode_image(
                    encode_tiff_baseline(arr, bo, rows_per_strip=2)
                )
                out["doc_id"].append(int(doc_id))
                out["n_channels"].append(int(got.size))
                out["sum_pixels"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_channels long, sum_pixels long"
    )


@query(
    "multimodal_au_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 50)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum((doc_id * 13 + i * 31) % 65536 - 32768) AS BIGINT)
               AS sum_samples
    FROM s GROUP BY doc_id
    """,
)
def multimodal_au_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Sun AU decode, hash-checked: per document 50 deterministic
    16-bit samples ((doc_id*13 + i*31) % 65536 - 32768) encode into a
    big-endian .snd container (encoding 3), decode through
    ``decode_audio``, and the recovered floats multiply back to the
    exact integers (int16/32768 is exactly representable in float32).
    The oracle computes the same sums from the formula — a header,
    endianness, or normalization defect breaks the hash."""
    import struct

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_audio

    N = 50

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "sum_samples": []}
            for doc_id in pdf.doc_id:
                pcm = (
                    (int(doc_id) * 13 + np.arange(N) * 31) % 65536 - 32768
                ).astype(np.int16)
                body = pcm.astype(">i2").tobytes()
                au = (
                    struct.pack(
                        ">4sIIIII", b".snd", 24, len(body), 3, 8000, 1
                    )
                    + body
                )
                samples, _rate = decode_audio(au)
                ints = np.round(samples[:, 0] * 32768.0).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(int(len(ints)))
                out["sum_samples"].append(int(ints.sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_samples long, sum_samples long"
    )


@query(
    "copurchase_lift_topk",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lp),
    freq AS (SELECT l_partkey, count(*) AS c FROM lp GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_ab
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS c_ab,
           floor(CAST(n.n_orders * p.c_ab AS DOUBLE)
                 / CAST(fa.c * fb.c AS DOUBLE) * 1e4 + 0.5) / 1e4 AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b LIMIT 50
    """,
)
def copurchase_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift scoring on co-purchased parts (the
    'customers also bought' primitive): for part pairs sharing >= 2
    orders, lift = P(a,b) / (P(a) P(b)) computed as the exact integer
    ratio n_orders*c_ab / (c_a*c_b), IEEE-divided and rounded on the
    4dp grid — top-50 by lift with deterministic tie-breaks.

    100 TB shape: the pair generation is the market-basket self-join
    keyed by order (baskets are small, so the blow-up is sum of
    basket^2, not corpus^2); support >= 2 prunes the pair tail before
    the frequency joins; the scalar order count is a 1-row broadcast;
    top-50 compiles to TakeOrderedAndProject."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = lp.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = lp.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = lp.alias("a"), lp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            (
                F.floor(
                    (F.col("n_orders") * F.col("c_ab")).cast("double")
                    / (F.col("ca") * F.col("cb")).cast("double")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "quantile_sketch_mergeable",
    """
    SELECT CAST(q AS DOUBLE) AS q,
           (SELECT count(*) FROM orders) AS n_rows,
           TRUE AS within_bound, TRUE AS bound_ok
    FROM (VALUES (0.25), (0.5), (0.75), (0.9)) AS t(q)
    """,
)
def quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom MERGEABLE quantile sketch (operators/sketch.py, the KLL
    compactor family) run the way a 1000-executor cluster would: one
    partial sketch per input partition built in a single Arrow pass
    (mapInPandas), partials shipped as plain array<array<double>> rows
    — O(capacity * log n) doubles each, NOT the data — and reduced in
    one task (applyInPandas over a constant group; at cluster scale
    this becomes a tree of merges, which the property-tested
    associativity licenses).  Spark's own percentile_approx cannot do
    this: its sketch state is not exposed, so partials can't persist
    or re-aggregate across queries the way these (or HLL sketches)
    can.

    Contract: each estimated quantile must land between the EXACT
    q +- 0.02 percentiles (computed JVM-side), and the sketch's own
    tracked worst-case rank-error bound must stay under 2% of n —
    both emitted as booleans, deterministic because compaction is
    (capacity=1024, alternating-pick) deterministic."""
    from flo_spark.operators.sketch import (
        SKETCH_ROW_SCHEMA,
        merge_sketch_rows,
        sketch_partials_fn,
    )

    import pandas as pd

    QS = [0.25, 0.5, 0.75, 0.9]
    CAP, EPS = 1024, 0.02

    def merge_query(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = merge_sketch_rows(pdf, CAP)
        n = sk.total_weight()
        return pd.DataFrame(
            {
                "q": QS,
                "est": [sk.quantile(q) for q in QS],
                "bound_ok": [sk.rank_error_bound <= EPS * n] * len(QS),
            }
        )

    o = load(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("v"))
    parts = o.mapInPandas(sketch_partials_fn(CAP), SKETCH_ROW_SCHEMA)
    merged = (
        parts.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge_query, "q double, est double, bound_ok boolean")
    )
    brackets = o.agg(
        F.count("*").alias("n_rows"),
        *[
            F.expr(f"percentile(v, {max(q - EPS, 0.0)})").alias(f"lo_{i}")
            for i, q in enumerate(QS)
        ],
        *[
            F.expr(f"percentile(v, {min(q + EPS, 1.0)})").alias(f"hi_{i}")
            for i, q in enumerate(QS)
        ],
    )
    lo = F.array(*[F.col(f"lo_{i}") for i in range(len(QS))])
    hi = F.array(*[F.col(f"hi_{i}") for i in range(len(QS))])
    qpos = F.array_position(F.array(*[F.lit(q) for q in QS]), F.col("q"))
    return (
        merged.crossJoin(F.broadcast(brackets))
        .select(
            "q",
            "n_rows",
            (
                (F.col("est") >= F.element_at(lo, qpos.cast("int")))
                & (F.col("est") <= F.element_at(hi, qpos.cast("int")))
            ).alias("within_bound"),
            "bound_ok",
        )
    )


@query(
    "stream_quantile_monitor",
    """
    SELECT CAST(q AS DOUBLE) AS q,
           (SELECT count(*) FROM events WHERE value IS NOT NULL) AS n_rows,
           TRUE AS within_bound
    FROM (VALUES (0.25), (0.5), (0.9)) AS t(q)
    """,
)
def stream_quantile_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentile monitoring over a PERSISTENT sketch store
    (streaming/sketch_monitor.py): every micro-batch of the event
    stream reduces to one mergeable sketch row written as its own
    replay-safe shard; the all-time quantiles come from merging the
    shards — never rescanning raw history.  This is the operational
    'p50/p95 of a metric, maintained forever, restart-safe' monitor
    that percentile_approx cannot express because its sketch state
    never leaves the query.

    Contract: each monitored quantile of event.value must land
    between the exact q +- 0.02 percentiles of the same data
    (JVM-computed, boolean per q); replay idempotency is pinned in
    tests/test_sketch_monitor.py."""
    from flo_spark.queries import _events_stream, scratch_dir
    from flo_spark.streaming.sketch_monitor import sketch_monitor

    QS = [0.25, 0.5, 0.9]
    EPS = 0.02
    tmp = scratch_dir("flo_sketch_monitor_")
    sk = sketch_monitor(
        _events_stream(spark, sf_dir),
        store_dir=f"{tmp}/store",
        value=F.col("value"),
        checkpoint_dir=f"{tmp}/ckpt",
    )
    ests = [(q, sk.quantile(q)) for q in QS]
    est_df = spark.createDataFrame(ests, "q double, est double")
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    brackets = ev.agg(
        F.count("*").alias("n_rows"),
        *[
            F.expr(f"percentile(value, {max(q - EPS, 0.0)})").alias(f"lo_{i}")
            for i, q in enumerate(QS)
        ],
        *[
            F.expr(f"percentile(value, {min(q + EPS, 1.0)})").alias(f"hi_{i}")
            for i, q in enumerate(QS)
        ],
    )
    lo = F.array(*[F.col(f"lo_{i}") for i in range(len(QS))])
    hi = F.array(*[F.col(f"hi_{i}") for i in range(len(QS))])
    qpos = F.array_position(F.array(*[F.lit(q) for q in QS]), F.col("q"))
    return (
        est_df.crossJoin(F.broadcast(brackets))
        .select(
            "q",
            "n_rows",
            (
                (F.col("est") >= F.element_at(lo, qpos.cast("int")))
                & (F.col("est") <= F.element_at(hi, qpos.cast("int")))
            ).alias("within_bound"),
        )
    )


@query(
    "embedding_pq_adc",
    """
    SELECT vec_id AS q_id, vec_id AS top1_id, TRUE AS self_hit
    FROM embeddings WHERE vec_id < 10
    """,
)
def embedding_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization end to end (operators/similarity.py):
    train (m=8, k=16) codebooks on a bounded deterministic sample,
    compress every corpus vector to 8 codebook indices (a 32x memory
    cut for 64-dim float32 — THE compression that makes billion-vector
    ANN serving fit in RAM), then answer queries by ASYMMETRIC
    DISTANCE COMPUTATION: each query precomputes an (m, k) block
    lookup table once and every candidate scores as 8 table lookups,
    no vector arithmetic.

    Contract: self-retrieval — each of the 10 query vectors IS in the
    corpus, and its quantized distance (= its reconstruction error)
    must beat every other vector's, so ADC top-1 returns the query
    itself (ties break to the lower id, partitioning-independent;
    verified at sf0.001/0.01/0.1).  Batch-local argmin cuts shuffle
    traffic to one row per (query, batch)."""
    import numpy as np

    from flo_spark.operators.similarity import (
        pq_adc_top1,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load(spark, sf_dir, "embeddings")
    cb = train_pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    qrows = (
        emb.filter(F.col("vec_id") < 10)
        .orderBy("vec_id")
        .collect()  # 10 rows, documented bounded collect
    )
    queries = np.array([list(r.embedding) for r in qrows], dtype=np.float64)
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    top1 = pq_adc_top1(codes, queries, qids, cb)
    return top1.select(
        "q_id",
        "top1_id",
        (F.col("top1_id") == F.col("q_id")).alias("self_hit"),
    )


@query(
    "anomaly_zscore_hourly",
    """
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    b AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM b),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    w AS (
      SELECT hour, cnt,
             count(*) OVER tw AS n_prev,
             sum(cnt) OVER tw AS s1,
             sum(cnt * cnt) OVER tw AS s2
      FROM c
      WINDOW tw AS (ORDER BY hour
                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, CAST(cnt AS BIGINT) AS cnt,
           floor((CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / 24)
                 / sqrt((24 * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE)) / (24.0 * 24.0))
                 * 1e4 + 0.5) / 1e4 AS z,
           abs(floor((CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / 24)
                 / sqrt((24 * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE)) / (24.0 * 24.0))
                 * 1e4 + 0.5) / 1e4) >= 2.0 AS is_anomaly
    FROM w
    WHERE n_prev = 24
      AND 24 * s2 - s1 * s1 > 0
    """,
)
def anomaly_zscore_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the hourly event rate —
    the standard ops-monitoring primitive: each hour scores against
    the TRAILING 24 hours (current excluded), z = (x - mean)/stddev,
    flagged at |z| >= 2.  The spine densifies missing hours to zero so
    the trailing window is 24 real HOURS, not 24 non-empty rows.

    Exactness: the rolling mean/variance come from integer window
    sums (s1, s2) combined by the population-variance identity; the
    only float steps are IEEE divisions/sqrt of exact integers,
    rounded 4dp — cross-engine identical, unlike a windowed
    stddev_samp fold of doubles.

    100 TB shape: the hourly pre-aggregation is the only corpus-scale
    shuffle; the window runs over the tiny dense spine.  (A single
    unpartitioned time-ordered window is spine-sized here; at
    century-scale spines, partition by coarse time and overlap 24
    rows.)"""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )
    tw = Window.orderBy("hour").rowsBetween(-24, -1)
    w = (
        c.withColumn("n_prev", F.count("*").over(tw))
        .withColumn("s1", F.sum("cnt").over(tw))
        .withColumn("s2", F.sum(F.col("cnt") * F.col("cnt")).over(tw))
        .filter(
            (F.col("n_prev") == 24)
            & (24 * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        )
    )
    zraw = (
        F.col("cnt").cast("double") - F.col("s1").cast("double") / 24
    ) / F.sqrt(
        (
            24 * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / (24.0 * 24.0)
    )
    z = F.floor(zraw * 1e4 + F.lit(0.5)) / 1e4
    return w.select(
        "hour",
        F.col("cnt").cast("long").alias("cnt"),
        z.alias("z"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    )


@query(
    "ewma_hourly_trend",
    """
    WITH RECURSIVE e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    b AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM b),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt,
             row_number() OVER (ORDER BY h.hour) AS rn
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    r AS (
      SELECT rn, hour, cnt, CAST(cnt * 16 AS BIGINT) AS s
      FROM c WHERE rn = 1
      UNION ALL
      SELECT c.rn, c.hour, c.cnt,
             CAST(r.s + (c.cnt * 16 - r.s) // 4 AS BIGINT)
      FROM r JOIN c ON c.rn = r.rn + 1
    )
    SELECT hour, CAST(cnt AS BIGINT) AS cnt,
           s AS ewma_x16,
           CAST(cnt * 16 - s AS BIGINT) AS residual_x16
    FROM r
    """,
)
def ewma_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the hourly event rate
    (alpha = 1/4) in EXACT FIXED POINT: the recurrence
    s_t = s_{t-1} + (16*x_t - s_{t-1}) div 4 runs in scale-16
    integers with floor division, so every engine that replays it —
    here DuckDB via a RECURSIVE CTE stepping the same integers — lands
    bit-identical, where a float EWMA would drift by an ulp per step.
    The residual column is the trend-adjusted deviation the smoothing
    exists to expose.

    100 TB shape: the corpus-scale work is the hourly pre-aggregation
    (one shuffle); the recurrence itself runs over the tiny dense
    spine in a single applyInPandas task.  An exact integer EWMA is
    inherently sequential (truncating division breaks the linearity that
    would admit a parallel prefix scan); the float variant composes
    associatively and could segment-scan — the entry trades that for
    cross-engine exactness, and says so."""
    from collections.abc import Iterator  # noqa: F401

    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        s, out = None, []
        for cnt in pdf["cnt"]:
            x = int(cnt) * 16
            if s is None:
                s = x
            else:
                d = x - s
                # truncate toward zero, matching SQL integer division
                s = s + (d // 4 if d >= 0 else -((-d) // 4))
            out.append(s)
        pdf["ewma_x16"] = out
        pdf["residual_x16"] = pdf["cnt"] * 16 - pdf["ewma_x16"]
        return pdf[["hour", "cnt", "ewma_x16", "residual_x16"]]

    return (
        c.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold, "hour timestamp, cnt long, ewma_x16 long, residual_x16 long"
        )
    )


@query(
    "theta_sketch_audience_overlap",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_overlap
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(n_overlap AS BIGINT) AS n_exact_overlap,
           TRUE AS within_bound
    FROM p
    """,
)
def theta_sketch_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation via theta (KMV) sketches
    (operators/sketch.py::ThetaSketch) — the set-ALGEBRA sketch: HLL
    unions but cannot intersect, so 'users who did both X and Y'
    normally costs a distinct-join per pair; theta sketches answer it
    from per-segment sketches built ONCE.  Each event type's user set
    reduces to a k=256 minimum-hash sample (one applyInPandas task per
    type, groups parallel); all pairwise overlaps then come from the
    O(types) collected sketch rows — a documented, bounded driver
    step, never the user sets.

    Contract: the sketch state is provably independent of insertion
    order, chunking, and merge order (property-tested), so estimates
    are deterministic; each must land within 4/sqrt(k) of the exact
    overlap scaled by the pair's union (the theta error model), and
    below k distinct users the sketch — hence the estimate — is EXACT.
    The exact overlaps come from the same scan and pin the pairing."""
    import pandas as pd

    from flo_spark.operators.sketch import ThetaSketch

    K = 256
    du = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .persist()
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = ThetaSketch(K).add(pdf["user_id"].tolist())
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "hashes": [sk.to_row()]}
        )

    sk_rows = (
        du.groupBy("event_type")
        .applyInPandas(build, "event_type string, hashes array<long>")
        .collect()  # O(types) tiny rows, documented
    )
    sketches = {
        r.event_type: ThetaSketch.from_row(list(r.hashes), K) for r in sk_rows
    }
    sizes = {t: sk.estimate() for t, sk in sketches.items()}
    types = sorted(sketches)
    rel = 4 / K ** 0.5
    est_rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            est = sketches[ta].intersect_estimate(sketches[tb])
            union_est = sizes[ta] + sizes[tb] - est
            est_rows.append((ta, tb, float(est), float(union_est)))
    est_df = spark.createDataFrame(
        est_rows, "type_a string, type_b string, est double, union_est double"
    )
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_exact_overlap"))
    )
    return exact.join(est_df, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_exact_overlap",
        (
            F.abs(F.col("est") - F.col("n_exact_overlap"))
            <= rel * F.col("union_est") + F.lit(1e-9)
        ).alias("within_bound"),
    )


@query(
    "multimodal_gif_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 48)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum((doc_id * 5 + i) % 8) AS BIGINT) AS sum_indices
    FROM s GROUP BY doc_id
    """,
)
def multimodal_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, hash-checked: per document an 8x6 paletted
    image with indices (doc_id*5 + i) % 8 encodes through the actual
    GIF89a container — greedy LZW with dictionary growth and
    code-width changes — and decodes through ``decode_image``'s
    from-spec LZW implementation; the palette maps index k to
    (k, 2k, 3k) so the recovered index is R, and summing it per doc
    must reproduce the generating formula.  A defect anywhere in the
    LZW bit unpacking, dictionary maintenance (incl. the KwKwK case),
    sub-block reassembly, or palette application breaks the hash."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_gif

    W, H = 8, 6
    PALETTE = [(k, 2 * k, 3 * k) for k in range(8)]

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_indices": []}
            for doc_id in pdf.doc_id:
                idx = (
                    (int(doc_id) * 5 + np.arange(W * H)) % 8
                ).astype(np.uint8).reshape(H, W)
                got = decode_image(encode_gif(idx, PALETTE))
                out["doc_id"].append(int(doc_id))
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                # channel R IS the palette index by construction
                out["sum_indices"].append(int(got[:, :, 0].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_indices long"
    )


@query(
    "gini_revenue_concentration",
    """
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             sum(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT)) AS s
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nationkey, s,
             row_number() OVER (PARTITION BY nationkey
                                ORDER BY s, o_custkey) AS i,
             count(*) OVER (PARTITION BY nationkey) AS n
      FROM spend
    )
    SELECT n2.n_name AS nation,
           CAST(max(r.n) AS BIGINT) AS n_customers,
           floor(CAST(sum((2 * r.i - r.n - 1) * r.s) AS DOUBLE)
                 / CAST(max(r.n) * sum(r.s) AS DOUBLE) * 1e4 + 0.5) / 1e4
               AS gini
    FROM ranked r JOIN nation n2 ON n2.n_nationkey = r.nationkey
    GROUP BY n2.n_name
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Gini) per nation over customer spend —
    the inequality metric every marketplace dashboard carries, exact:
    spend accumulates as 1e4-scaled integers, the Gini numerator
    sum((2i - n - 1) * s_i) over the (spend, custkey)-ordered ranking
    is pure integer arithmetic (the tie-break makes the ranking — and
    thus the statistic — deterministic on any engine), and the only
    float step is one final IEEE division of exact integers, rounded
    4dp.

    100 TB shape: one fact shuffle to per-customer spend, one
    nation-partitioned window (state bounded per nation), one reduced
    aggregate; the dim join broadcasts (nation = 25 rows, hinted per
    the fixed-cardinality rule)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    spend = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(F.sum(money_scaled(F.col("o_totalprice"))).alias("s"))
    )
    w = Window.partitionBy("nationkey").orderBy("s", "o_custkey")
    wn = Window.partitionBy("nationkey")
    ranked = spend.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    return (
        ranked.join(F.broadcast(n), ranked["nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            (
                F.floor(
                    F.sum(
                        (2 * F.col("i") - F.col("n") - 1) * F.col("s")
                    ).cast("double")
                    / (F.max("n") * F.sum("s")).cast("double")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("gini"),
        )
    )


@query(
    "herfindahl_supplier_share",
    """
    WITH rev AS (
      SELECT r.r_name AS region, s.s_suppkey,
             sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000
                            + 0.5) AS BIGINT)) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT region,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           floor(CAST(sum(v * v) AS DOUBLE)
                 / (CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS hhi
    FROM rev GROUP BY region
    """,
)
def herfindahl_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per region over
    supplier revenue shares — the antitrust-dashboard companion to the
    Gini entry: HHI = sum(share_i^2) computed as
    sum(v_i^2) / (sum v_i)^2 over exact 1e4-scaled revenue integers,
    so both sums are exact (decimal(38,0)/HUGEINT — squares of
    per-supplier revenue exceed long range at scale) and the single
    IEEE division of exact integers rounds on the 6dp grid.

    100 TB shape: one fact shuffle to (region, supplier) partials
    (dims broadcast: region/nation fixed-cardinality, supplier rides
    AQE), then a 5-row aggregate of reduced rows."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    v = F.sum(
        money_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("s_suppkey"))
        .agg(v.alias("v"))
    )
    d = lambda c: c.cast("decimal(38,0)")
    return rev.groupBy("region").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        (
            F.floor(
                F.sum(d(F.col("v")) * d(F.col("v"))).cast("double")
                / (
                    F.sum(d(F.col("v"))).cast("double")
                    * F.sum(d(F.col("v"))).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("hhi"),
    )


@query(
    "winsorized_price_stats",
    """
    WITH v AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS p
      FROM lineitem
    ),
    rk AS (
      SELECT l_returnflag, p,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY p) AS i,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    ),
    cuts AS (
      SELECT l_returnflag,
             max(CASE WHEN i = CAST(ceil(0.05 * n) AS BIGINT) THEN p END) AS lo,
             max(CASE WHEN i = CAST(ceil(0.95 * n) AS BIGINT) THEN p END) AS hi,
             max(n) AS n
      FROM rk GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           CAST(c.n AS BIGINT) AS n_rows,
           c.lo / 10000.0 AS p05,
           c.hi / 10000.0 AS p95,
           floor(CAST(sum(least(greatest(r.p, c.lo), c.hi)) AS DOUBLE)
                 / c.n + 0.5) / 10000.0 AS winsorized_avg
    FROM rk r JOIN cuts c USING (l_returnflag)
    GROUP BY r.l_returnflag, c.n, c.lo, c.hi
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) price statistics per return flag —
    the robust-mean recipe feature pipelines apply before
    normalization: clamp every value to the EXACT 5th/95th order
    statistics (rank ceil(q*n) over the 1e4-scaled integers — a
    well-defined order statistic regardless of tie order) and average
    the clamped integers on the money grid.  Everything is integer
    arithmetic until the final exact division.

    100 TB shape: one group-partitioned rank window (state bounded per
    group), the 3-row cuts frame broadcasts back, and the clamped
    aggregate is map-side combinable.  At extreme group cardinality
    swap the rank window for approx_percentile bounds — the clamp
    stays exact either way."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag", money_scaled(F.col("l_extendedprice")).alias("p")
    )
    w = Window.partitionBy("l_returnflag").orderBy("p")
    wn = Window.partitionBy("l_returnflag")
    rk = v.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    cuts = rk.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("i") == F.ceil(0.05 * F.col("n")).cast("long"),
                F.col("p"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("i") == F.ceil(0.95 * F.col("n")).cast("long"),
                F.col("p"),
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    return (
        rk.drop("n", "i")
        .join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag", "n", "lo", "hi")
        .agg(
            F.floor(
                F.sum(
                    F.least(F.greatest(F.col("p"), F.col("lo")), F.col("hi"))
                ).cast("double")
                / F.col("n")
                + F.lit(0.5)
            ).alias("wsum")
        )
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n_rows"),
            (F.col("lo") / 10000.0).alias("p05"),
            (F.col("hi") / 10000.0).alias("p95"),
            (F.col("wsum") / 10000.0).alias("winsorized_avg"),
        )
    )


@query(
    "lorenz_revenue_deciles",
    """
    WITH spend AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS s
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT s, ntile(10) OVER (ORDER BY s, o_custkey) AS decile
      FROM spend
    ),
    d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(s) AS ds
      FROM rk GROUP BY decile
    ),
    t AS (SELECT sum(ds) AS total FROM d)
    SELECT decile, n_customers,
           floor(CAST(sum(ds) OVER (ORDER BY decile
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(t.total AS DOUBLE) * 1e4 + 0.5) / 1e4
               AS cum_revenue_share
    FROM d, t
    """,
)
def lorenz_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue by decile — the 'bottom 50%
    hold X% of revenue' chart behind the Gini entry: customers rank by
    exact scaled-integer spend (custkey tie-break, so ntile boundaries
    are deterministic), each decile's revenue sums exactly, and the
    cumulative share is one IEEE division of exact integers per row,
    4dp.

    100 TB shape: one fact shuffle to per-customer spend; the global
    ntile is the one unpartitioned window (customer-count sized, the
    smallest frame in the query — at extreme cardinality switch to
    range-partitioned rank + broadcast boundaries); the decile rollup
    and cumulative window run over 10 rows."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(money_scaled(F.col("o_totalprice"))).alias("s")
    )
    rk = spend.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("s", "o_custkey"))
    )
    d = rk.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("s").alias("ds"),
    )
    t = d.agg(F.sum("ds").alias("total"))
    cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn("cs", F.sum("ds").over(cum))
        .select(
            "decile",
            "n_customers",
            (
                F.floor(
                    F.col("cs").cast("double")
                    / F.col("total").cast("double")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("cum_revenue_share"),
        )
    )


@query(
    "dup_cluster_size_histogram",
    """
    WITH k AS (
      SELECT md5(text) AS key, count(*) AS sz FROM documents GROUP BY md5(text)
    )
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz - 1) AS BIGINT) AS n_removable
    FROM k GROUP BY sz
    """,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-multiplicity histogram over exact content keys — the
    corpus-duplication profile every dedup run reports first: for each
    cluster size, how many clusters, how many documents they hold, and
    how many a keep-one dedup would remove.  Two map-side-combinable
    aggregates (content-key shuffle, then size rollup of reduced
    rows); integer-exact."""
    d = load(spark, sf_dir, "documents")
    k = d.groupBy(F.md5(F.col("text").cast("binary")).alias("key")).agg(
        F.count("*").alias("sz")
    )
    return k.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.col("sz") - 1).cast("long").alias("n_removable"),
    )


@query(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS cur, next_type AS nxt, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT cur, sum(n) AS total FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n_transitions,
           floor(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) * 1e4 + 0.5)
               / 1e4 AS p
    FROM c JOIN t USING (cur)
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next | current) for every event-type pair, the
    product-analytics 'what do users do after X' primitive: order each
    user's events by (ts, event_id) (the id tie-break makes
    simultaneous events deterministic), pair each with its successor
    via lead(), count transitions, and normalize per source state.
    Counts are exact integers; probabilities are exact int/int
    quotients on the 4dp grid.

    100 TB shape: one user_id-partitioned window (state bounded per
    user), then two aggregates over reduced (cur, nxt) rows — 25 pairs
    here, event-type-squared in general."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = seq.groupBy(
        F.col("event_type").alias("cur"), F.col("next_type").alias("nxt")
    ).agg(F.count("*").alias("n"))
    t = c.groupBy("cur").agg(F.sum("n").alias("total"))
    return c.join(t, "cur").select(
        "cur",
        "nxt",
        F.col("n").cast("long").alias("n_transitions"),
        (
            F.floor(
                F.col("n").cast("double") / F.col("total").cast("double") * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("p"),
    )


@query(
    "cusum_changepoint_hourly",
    """
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    b AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM b),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    s AS (
      SELECT hour, cnt,
             row_number() OVER (ORDER BY hour) AS k,
             sum(cnt) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)
                 AS prefix,
             (SELECT count(*) FROM c) AS n,
             (SELECT sum(cnt) FROM c) AS total
      FROM c
    ),
    scored AS (
      SELECT hour, k, CAST(n * prefix - k * total AS BIGINT) AS cusum
      FROM s WHERE k < n
    )
    SELECT hour AS changepoint_hour,
           CAST(k AS BIGINT) AS k,
           cusum AS cusum_scaled
    FROM scored
    ORDER BY abs(cusum) DESC, hour LIMIT 1
    """,
)
def cusum_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the hourly event rate, EXACT:
    the classic statistic max_k |sum_{i<=k}(x_i - mean)| needs the
    fractional mean — multiplying through by n turns it into
    S_k = n*prefix_k - k*total, PURE INTEGER arithmetic with the same
    argmax, so the detected split point is bit-identical on every
    engine (no running float drift).  Reports the hour k maximizing
    |S_k| — the boundary where the rate regime most plausibly changed
    — with deterministic tie-breaks.

    100 TB shape: the corpus-scale work is the hourly
    pre-aggregation; the prefix window and argmax run over the tiny
    dense spine; top-1 is TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )
    tot = c.agg(
        F.count("*").alias("n"), F.sum("cnt").alias("total")
    )
    wp = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        c.withColumn("k", F.row_number().over(Window.orderBy("hour")))
        .withColumn("prefix", F.sum("cnt").over(wp))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("k") < F.col("n"))
        .select(
            F.col("hour").alias("changepoint_hour"),
            F.col("k").cast("long").alias("k"),
            (F.col("n") * F.col("prefix") - F.col("k") * F.col("total"))
            .cast("long")
            .alias("cusum_scaled"),
        )
    )
    return s.orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "changepoint_hour"
    ).limit(1)


@query(
    "stream_theta_audience_monitor",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def stream_theta_audience_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment distinct-audience monitoring over a PERSISTENT
    theta-sketch store (streaming/sketch_monitor.py): each micro-batch
    of the event stream reduces to one k-minimum-values sketch row per
    event type, written as a replay-safe shard; all-time distinct
    counts — and pairwise overlaps, the set algebra HLL lacks — come
    from merging shards, never rescanning history.  Theta state is a
    pure function of the user SET, so replays, reorderings, and
    partitionings all converge to the identical store (pinned exactly
    in tests/test_sketch_monitor.py).

    Contract: per type, |estimate - exact| <= 4/sqrt(k) * exact + 1
    under the KMV error model; below k distinct users the sketch is
    exact.  The exact counts come from the same data and pin the
    grouping."""
    from flo_spark.queries import _events_stream, scratch_dir
    from flo_spark.streaming.sketch_monitor import theta_monitor

    K = 256
    tmp = scratch_dir("flo_theta_monitor_")
    sketches = theta_monitor(
        _events_stream(spark, sf_dir),
        store_dir=f"{tmp}/store",
        segment=F.col("event_type"),
        item=F.col("user_id"),
        checkpoint_dir=f"{tmp}/ckpt",
        k=K,
    )
    rel = 4 / K ** 0.5
    est_df = spark.createDataFrame(
        [(t, float(sk.estimate())) for t, sk in sketches.items()],
        "event_type string, est double",
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return exact.join(est_df, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= rel * F.col("n_exact") + 1
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# round 7: native FLAC + the Adam7/16-bit image paths, hash-checked
# ---------------------------------------------------------------------------


@query(
    "multimodal_flac_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 200)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum((doc_id * 37 + i * i) % 4096 - 2048) AS BIGINT)
               AS sum_samples
    FROM s GROUP BY doc_id
    """,
)
def multimodal_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC encode+decode, hash-checked: FLAC is LOSSLESS, so the
    native codec (operators/flac.py — fixed predictors, Rice coding,
    CRC-8/16 + STREAMINFO MD5 verification) can be verified through
    exact integers, unlike lossy formats.  Per document 200
    deterministic 16-bit samples ((doc_id*37 + i*i) % 4096 - 2048, a
    quadratic residue pattern the order-2 fixed predictor compresses)
    encode to a framed FLAC stream (block_size=64 forces multiple
    frames + coded frame numbers per doc), decode back through
    ``decode_audio`` (sniffed by the fLaC marker), and the float32
    samples multiply back to the exact integers.  The oracle computes
    the same sums from the formula — a predictor, Rice, framing, CRC,
    or normalization defect breaks the value hash.

    100 TB shape: one mapInPandas pass, partition-preserving, no
    shuffle; codec work is per-row CPU inside the Arrow batch."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.flac import encode_flac
    from flo_spark.operators.multimodal import decode_audio

    N = 200

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(N, dtype=np.int64)
        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "sum_samples": []}
            for doc_id in pdf.doc_id:
                pcm = ((int(doc_id) * 37 + i * i) % 4096 - 2048).astype(
                    np.int16
                )
                buf = encode_flac(pcm, rate=16000, block_size=64)
                samples, rate = decode_audio(buf)
                assert rate == 16000
                ints = np.round(samples[:, 0] * 32768.0).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(int(len(ints)))
                out["sum_samples"].append(int(ints.sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_samples long, sum_samples long"
    )


@query(
    "multimodal_png_adam7_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 297)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_channels,
           CAST(sum((doc_id * 11 + i * 3) % 256) AS BIGINT) AS sum_pixels
    FROM s GROUP BY doc_id
    """,
)
def multimodal_png_adam7_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adam7-INTERLACED PNG decode, hash-checked through real container
    bytes (the non-interlaced sibling is ``multimodal_png_roundtrip``):
    per document an 11x9 RGB image — odd dimensions so every one of the
    seven passes has a ragged edge subimage — whose channel values are
    (doc_id*11 + i*3) % 256, encoded with a real Adam7 encoder (passes
    extracted on the 8x8 sampling grid, each pass filtered
    INDEPENDENTLY with filter type (pass + y) % 5 so all five filters
    hit interlaced data, zlib deflate over the concatenated passes),
    decoded through ``decode_image`` (operators/multimodal.py::
    _decode_png), and the recovered channels summed.  The oracle
    computes the same sums from the formula — a pass-geometry,
    scatter, or per-pass unfilter defect breaks the value hash.

    100 TB shape: one partition-preserving mapInPandas pass."""
    import struct
    import zlib

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import _ADAM7, decode_image

    W, H, C = 11, 9, 3

    def _filter_scanlines(img, f0):
        import numpy as np

        h, w, c = img.shape
        bpp = c
        raw = bytearray()
        prev = np.zeros(w * bpp, dtype=np.int32)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int32)
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            f = (f0 + y) % 5
            if f == 0:
                filt = cur
            elif f == 1:
                filt = (cur - left) & 0xFF
            elif f == 2:
                filt = (cur - prev) & 0xFF
            elif f == 3:
                filt = (cur - ((left + prev) >> 1)) & 0xFF
            else:
                diag = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
                p = left + prev - diag
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - diag)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, diag),
                )
                filt = (cur - pred) & 0xFF
            raw += bytes([f]) + filt.astype(np.uint8).tobytes()
            prev = cur
        return bytes(raw)

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 1))
        for pdf in it:
            out = {"doc_id": [], "n_channels": [], "sum_pixels": []}
            for doc_id in pdf.doc_id:
                rgb = (
                    (int(doc_id) * 11 + np.arange(W * H * C) * 3) % 256
                ).astype(np.uint8).reshape(H, W, C)
                raw = bytearray()
                for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
                    sub = rgb[y0::dy, x0::dx, :]
                    if sub.size == 0:
                        continue
                    raw += _filter_scanlines(sub, p)
                png = (
                    b"\x89PNG\r\n\x1a\n"
                    + ihdr
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b"")
                )
                arr = decode_image(png)
                assert arr.shape == (H, W, C)
                assert np.array_equal(arr, rgb)
                out["doc_id"].append(int(doc_id))
                out["n_channels"].append(int(arr.size))
                out["sum_pixels"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_channels long, sum_pixels long"
    )


@query(
    "multimodal_pnm16_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 48)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum((doc_id * 257 + i * 1021) % 65536) AS BIGINT)
               AS sum_samples
    FROM s GROUP BY doc_id
    """,
)
def multimodal_pnm16_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT netpbm decode, hash-checked: per document an 8x6 P5
    (binary graymap) with maxval 65535 — two-byte BIG-ENDIAN samples,
    the netpbm wide-raster rule — whose values are
    (doc_id*257 + i*1021) % 65536, plus a '# comment' line in the
    header so tokenizer comment handling is exercised on every image.
    Decoded through ``decode_image`` (operators/multimodal.py::
    _decode_ppm, the maxval > 255 branch) and summed as exact
    integers; the oracle recomputes the sums from the formula — an
    endianness or header-tokenizer defect breaks the hash.

    100 TB shape: one partition-preserving mapInPandas pass."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image

    W, H = 8, 6

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "sum_samples": []}
            for doc_id in pdf.doc_id:
                vals = (
                    (int(doc_id) * 257 + np.arange(W * H) * 1021) % 65536
                ).astype(np.uint16)
                header = b"P5\n# 16-bit fixture\n%d %d\n65535\n" % (W, H)
                pgm = header + vals.astype(">u2").tobytes()
                arr = decode_image(pgm)
                assert arr.shape == (H, W, 1) and arr.dtype == np.uint16
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(int(arr.size))
                out["sum_samples"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_samples long, sum_samples long"
    )


@query(
    "countmin_heavy_hitters",
    """
    WITH c AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, n_events,
             row_number() OVER (ORDER BY n_events DESC, user_id) AS rn
      FROM c
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n_events AS BIGINT) AS n_events,
           TRUE AS est_ge_exact
    FROM r WHERE rn <= 20
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a MERGEABLE Count-Min sketch
    (operators/sketch.py::CountMinSketch) — the frequency sibling of
    the HLL/theta/KLL entries: each partition folds its user_ids into
    one (depth x width) integer table row via mapInPandas, the rows
    merge by cell-wise sum (state is a pure function of the event
    multiset — partitioning and merge order provably cancel,
    tests/test_countmin.py), and the merged table answers point
    queries for the top-20 users.  freq_items_heavy_hitters covers the
    candidate-set sketch; this one covers mergeable COUNTS — the piece
    that persists per-day/per-shard and re-aggregates at 100 TB
    without rescanning raw events.

    Contract: CM collisions only ADD, so estimate >= exact is a
    deterministic invariant for every reported user (a boolean the
    hash checks); the eps*N upper bound is statistical and pinned in
    tests/test_countmin.py instead.  Exact counts and the top-20
    selection (deterministic ties: count desc, user_id asc) come from
    the same scan and pin the ranking.

    100 TB shape: one scan; partials are O(width*depth) per partition;
    the merged-table collect is one documented bounded row (64 KiB),
    never data-scale; the exact ranking is one key shuffle + top-k."""
    import pandas as pd

    from flo_spark.operators.sketch import CountMinSketch

    WIDTH, DEPTH = 2048, 4
    ROW = "cells array<long>, total long"

    def partials(it):
        sk = CountMinSketch(WIDTH, DEPTH)
        seen = False
        for pdf in it:
            ids = pdf["user_id"].dropna()
            if len(ids):
                seen = True
                sk.add(ids.astype("int64").tolist())
        if seen:
            cells, total = sk.to_row()
            yield pd.DataFrame({"cells": [cells], "total": [total]})

    def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = CountMinSketch(WIDTH, DEPTH)
        for cells, total in zip(pdf["cells"], pdf["total"]):
            sk.merge(CountMinSketch.from_row(list(cells), int(total), WIDTH, DEPTH))
        cells, total = sk.to_row()
        return pd.DataFrame({"cells": [cells], "total": [total]})

    ev = load(spark, sf_dir, "events").select("user_id")
    merged_row = (
        ev.mapInPandas(partials, ROW)
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge_rows, ROW)
        .collect()  # ONE row of width*depth cells (64 KiB), documented
    )
    sk = (
        CountMinSketch.from_row(
            list(merged_row[0].cells), int(merged_row[0].total), WIDTH, DEPTH
        )
        if merged_row
        else CountMinSketch(WIDTH, DEPTH)
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(20)  # TakeOrderedAndProject — no global sort
        .collect()  # 20 rows, documented bounded collect
    )
    ests = sk.estimate_many([int(r.user_id) for r in top])
    rows = [
        (int(r.user_id), int(r.n_events), bool(est >= r.n_events))
        for r, est in zip(top, ests)
    ]
    return spark.createDataFrame(
        rows, "user_id long, n_events long, est_ge_exact boolean"
    )


@query(
    "stream_sliding_topk_sketch",
    """
    WITH base AS (
      SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
               AS w0,
             user_id
      FROM events
    ),
    slides AS (
      SELECT w0 AS window_start, user_id FROM base
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start, user_id FROM base
    ),
    c AS (
      SELECT window_start, user_id, count(*) AS n_events
      FROM slides GROUP BY 1, 2
    ),
    r AS (
      SELECT window_start, user_id, n_events,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, user_id) AS rn
      FROM c
    )
    SELECT window_start, CAST(user_id AS BIGINT) AS user_id,
           CAST(n_events AS BIGINT) AS n_events, TRUE AS est_ge_exact
    FROM r WHERE rn <= 3
    """,
)
def stream_sliding_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window heavy hitters over a PERSISTENT Count-Min store
    (streaming/sketch_monitor.py): every micro-batch folds each 1h/30m
    sliding window it touches into one CM sketch row plus the batch's
    per-(window, user) counts, both written as replay-safe shards; the
    all-time per-window top-3 then comes from re-aggregating shards —
    never rescanning raw history — and every reported row is verified
    against the merged sketch DISTRIBUTED (one cogroup per window, no
    driver-side sketch collect).

    Contract: top-3 per window by exact count (deterministic ties:
    count desc, user_id asc) hash-matches the batch ground truth, and
    CM's one-sided invariant estimate >= exact holds for every row.
    The tested configuration keeps per-batch candidates complete so
    counts stay exact-checkable; at 100 TB the candidate shards prune
    to per-batch top-m and the CM estimates take over the ranking —
    the fold is identical either way (the honest trade is documented
    here, not hidden).

    100 TB shape: per batch, one slide-expansion + one (window, item)
    shuffle; the store grows by O(windows) sketch rows per batch
    (compactable by merging shards per window); final ranking is one
    window-partitioned top-k; verification joins sketch rows to the
    3-row-per-window candidates by window."""
    import pandas as pd

    from flo_spark.operators.sketch import CountMinSketch
    from flo_spark.queries import _events_stream, scratch_dir
    from flo_spark.streaming.sketch_monitor import (
        countmin_topk_monitor,
        sketch_rows_df,
    )

    WIDTH, DEPTH = 1024, 4
    tmp = scratch_dir("flo_cm_monitor_")
    exact = countmin_topk_monitor(
        _events_stream(spark, sf_dir),
        store_dir=f"{tmp}/store",
        ts=F.col("ts"),
        item=F.col("user_id"),
        checkpoint_dir=f"{tmp}/ckpt",
        width=WIDTH,
        depth=DEPTH,
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col("item")
    )
    top = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("window_start", "item", "cnt")
    )
    sk_rows = sketch_rows_df(spark, f"{tmp}/store")

    def verify(key, cand: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(
                columns=["window_start", "user_id", "n_events", "est_ge_exact"]
            )
        sk = CountMinSketch(WIDTH, DEPTH)
        for cells, total in zip(rows["cells"], rows["total"]):
            sk.merge(
                CountMinSketch.from_row(list(cells), int(total), WIDTH, DEPTH)
            )
        ests = sk.estimate_many(cand["item"].astype("int64").tolist())
        return pd.DataFrame(
            {
                "window_start": cand["window_start"],
                "user_id": cand["item"].astype("int64"),
                "n_events": cand["cnt"].astype("int64"),
                "est_ge_exact": ests >= cand["cnt"].to_numpy(),
            }
        )

    return (
        top.groupBy("window_start")
        .cogroup(sk_rows.groupBy("window_start"))
        .applyInPandas(
            verify,
            "window_start timestamp, user_id long, n_events long, "
            "est_ge_exact boolean",
        )
    )


from flo_spark.queries import REVENUE_SQL as _REVENUE_SQL  # noqa: E402


@query(
    "bloom_pruned_join",
    f"""
    SELECT l.l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           {_REVENUE_SQL} AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1
    """,
)
def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (Bloom) join pruning written as a DataFrame
    program — the pattern Spark's
    ``spark.sql.optimizer.runtime.bloomFilter`` injects, built
    explicitly so the mechanics are visible and testable: the FILTERED
    dim side (urgent orders in 1996-H1) folds its join keys into an
    m-bit Bloom bitmap with k=3 xxhash64 probes — entirely JVM-side
    aggregation (bit_or of shifted bits grouped by word) — the bitmap
    broadcasts as ONE array<long> row, and the fact scan drops
    non-matching lineitems BEFORE the join via pure JVM bit tests.
    False positives survive the filter and die in the real equi-join,
    so the result is bit-identical to the unpruned join (the oracle IS
    the unpruned join); false negatives are impossible.

    100 TB shape: the win is shuffle-volume — only lineitems passing
    the bitmap enter the join exchange (~dim-selectivity of the fact,
    vs 100% unpruned).  The bitmap is O(m) = 16 KiB regardless of
    data scale (m sizes off the EXPECTED dim count; saturated bitmaps
    degrade to no pruning, never to wrong results).  No driver
    collect: the bitmap rides a broadcast join.  Plan shape (bitmap
    build broadcast + fact-side filter before the shuffle) is pinned
    in tests/test_plans.py."""
    M_BITS, N_WORDS, K = 1 << 17, (1 << 17) // 64, 3

    o = load(spark, sf_dir, "orders")
    dim = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey")

    seeds = F.sequence(F.lit(0), F.lit(K - 1))
    bits = dim.select(
        F.explode(seeds).alias("seed"), "o_orderkey"
    ).select(
        F.pmod(F.xxhash64("o_orderkey", "seed"), F.lit(M_BITS)).alias("pos")
    ).select(
        (F.col("pos") / 64).cast("int").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
        ).alias("bit"),
    )
    bitmap = (
        bits.groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("wm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_WORDS - 1)),
                lambda w: F.coalesce(
                    F.element_at("wm", w.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("words")
        )
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    # hash once per seed: materialize the K bit positions, then test
    # each — the probe runs per fact row, so K hash evaluations, not 2K
    positions = F.transform(
        F.sequence(F.lit(0), F.lit(K - 1)),
        lambda s: F.pmod(F.xxhash64("l_orderkey", s), F.lit(M_BITS)),
    )
    probe_ok = F.forall(
        positions,
        lambda pos: (
            F.element_at("words", (pos / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (pos % 64).cast("int"),
                )
            )
            != 0
        ),
    )
    pruned = (
        li.join(F.broadcast(bitmap))  # ONE 16 KiB row
        .filter(probe_ok)
        .drop("words")
    )
    return (
        pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


@query(
    "holt_linear_trend",
    """
    WITH RECURSIVE e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    bnd AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM bnd),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt,
             row_number() OVER (ORDER BY h.hour) AS rn
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    r AS (
      SELECT rn, hour, cnt,
             CAST(cnt * 16 AS BIGINT) AS l,
             CAST(0 AS BIGINT) AS b
      FROM c WHERE rn = 1
      UNION ALL
      SELECT c.rn, c.hour, c.cnt,
             CAST(r.l + r.b + (c.cnt * 16 - (r.l + r.b)) // 4 AS BIGINT),
             CAST(r.b + ((r.l + r.b + (c.cnt * 16 - (r.l + r.b)) // 4
                          - r.l) - r.b) // 8 AS BIGINT)
      FROM r JOIN c ON c.rn = r.rn + 1
    )
    SELECT hour, CAST(cnt AS BIGINT) AS cnt,
           l AS level_x16, b AS trend_x16,
           CAST(l + b AS BIGINT) AS forecast_x16
    FROM r
    """,
)
def holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's LINEAR (double-exponential) smoothing of the hourly event
    rate — the trend-aware sibling of ``ewma_hourly_trend`` — in EXACT
    scale-16 fixed point (alpha = 1/4, beta = 1/8, truncating integer
    division):

        l_t = l' + b' + (16*y_t - (l' + b')) div 4
        b_t = b' + ((l_t - l') - b') div 8

    seeded l_1 = 16*y_1, b_1 = 0; forecast_x16 = l_t + b_t is the
    one-step-ahead prediction a float Holt drifts away from by an ulp
    per step.  The oracle replays the identical integer recurrence
    with a two-state RECURSIVE CTE, so every level/trend/forecast is
    bit-identical across engines.

    100 TB shape: corpus-scale work is the hourly pre-aggregation (one
    shuffle); the two-state recurrence is inherently sequential
    (truncating division breaks linearity, the documented trade for
    exactness) and runs over the tiny dense spine in one applyInPandas
    task."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )

    def tdiv(a: int, d: int) -> int:
        # truncate toward zero, matching SQL integer division
        return a // d if a >= 0 else -((-a) // d)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        level = trend = None
        ls, bs = [], []
        for cnt in pdf["cnt"]:
            y = int(cnt) * 16
            if level is None:
                level, trend = y, 0
            else:
                prior = level + trend
                new_level = prior + tdiv(y - prior, 4)
                trend = trend + tdiv((new_level - level) - trend, 8)
                level = new_level
            ls.append(level)
            bs.append(trend)
        pdf["level_x16"] = ls
        pdf["trend_x16"] = bs
        pdf["forecast_x16"] = pdf["level_x16"] + pdf["trend_x16"]
        return pdf[["hour", "cnt", "level_x16", "trend_x16", "forecast_x16"]]

    return (
        c.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "hour timestamp, cnt long, level_x16 long, trend_x16 long, "
            "forecast_x16 long",
        )
    )


@query(
    "line_dedup_corpus",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    c AS (
      SELECT doc_id, s['idx'] AS idx, s['line'] AS line
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, CAST(ceil(len(ws) / 8.0) AS BIGINT)),
                 i -> struct_pack(
                   idx := i,
                   line := array_to_string(
                     list_slice(ws, (i - 1) * 8 + 1,
                                least(i * 8, len(ws))), ' ')))) AS s
        FROM w WHERE len(ws) > 0
      )
    ),
    r AS (
      SELECT doc_id, idx, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, idx) AS rn
      FROM c
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' '
                               ORDER BY idx), '') AS cleaned_text
    FROM r GROUP BY doc_id
    """,
)
def line_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/MassiveText-style exact LINE dedup with document
    reassembly: every line that already occurred anywhere in the corpus
    (first occurrence = smallest (doc_id, idx), deterministic) is
    dropped from its document, and the document is rebuilt from its
    surviving lines in original order — the CLEANED TEXT is the
    output, where span_dedup_stats only counts and
    boilerplate_chunk_strip removes by frequency threshold (including
    first occurrences).  Re-based on non-overlapping 8-word lines
    because this corpus has no newline structure; the unit is a
    parameter, not the semantics.

    100 TB shape: chunking is shuffle-free (scan-stage HOFs); the
    dedup window partitions by the LINE ITSELF — exact, no collision
    caveat — which is affordable because the output IS text, so line
    text must shuffle once for the reassembly anyway; a stats-only
    variant would shuffle 8-byte xxhash64 keys instead (the
    span_dedup_stats shape, with its documented ~1e-7 collision odds).
    Reassembly is one doc_id shuffle with an in-group sort."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(words)
    nlines = F.ceil(n / F.lit(8.0))
    lines = F.transform(
        F.sequence(F.lit(1).cast("long"), nlines),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(" ", F.slice(words, (i - 1) * 8 + 1, F.lit(8)))
            .alias("line"),
        ),
    )
    c = (
        d.where(n > 0)
        .select("doc_id", F.explode(lines).alias("s"))
        .select("doc_id", F.col("s.idx").alias("idx"), F.col("s.line").alias("line"))
    )
    w = Window.partitionBy("line").orderBy("doc_id", "idx")
    r = c.withColumn("rn", F.row_number().over(w))
    return r.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("idx", "line")
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


@query(
    "reservoir_sample_per_group",
    """
    WITH k AS (
      SELECT o_orderpriority, o_orderkey,
             (o_orderkey * 2654435761) % 1000000007 AS skey
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, o_orderkey, skey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY skey, o_orderkey) AS pos
      FROM k
    )
    SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(pos AS BIGINT) AS pos
    FROM r WHERE pos <= 5
    """,
)
def reservoir_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir sampling — exactly k rows per
    group, selection invariant to row order, partitioning, and data
    arrival — via BOTTOM-K BY SEEDED HASH: a multiplicative hash mod a
    large prime gives each key a reproducible pseudo-random draw, and
    the k smallest draws per group ARE a uniform sample without
    replacement.  This is the distributed form of reservoir sampling:
    the classic algorithm is sequential state, but bottom-k is
    MERGEABLE (the bottom-k of a union is the bottom-k of each side's
    bottom-k), so per-partition top-k candidates combine without ever
    materializing the group.  The selection rule is pure arithmetic,
    so the oracle reproduces it exactly — the contract is the rule
    itself, not a statistical property.

    100 TB shape: one group-partitioned rank window over scan-computed
    keys (at extreme group size, per-partition bottom-k partials cut
    shuffle input to k rows per partition-group before the window).
    No driver collect, no global sort."""
    o = load(spark, sf_dir, "orders")
    skey = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(1000000007)
    w = Window.partitionBy("o_orderpriority").orderBy("skey", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_orderkey", skey.alias("skey"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= 5)
        .select("o_orderpriority", "o_orderkey", "pos")
    )


@query(
    "robust_scaler_features",
    """
    WITH rk AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars) AS i,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    cuts AS (
      SELECT source,
             max(CASE WHEN i = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN n_chars END) AS q1,
             max(CASE WHEN i = CAST(ceil(0.50 * n) AS BIGINT)
                      THEN n_chars END) AS med,
             max(CASE WHEN i = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN n_chars END) AS q3
      FROM rk GROUP BY source
    )
    SELECT r.doc_id AS doc_id, r.source AS source,
           CAST(r.n_chars AS BIGINT) AS n_chars,
           c.med AS median_chars,
           c.q3 - c.q1 AS iqr_chars,
           CASE WHEN c.q3 = c.q1 THEN 0.0
                ELSE floor(CAST(r.n_chars - c.med AS DOUBLE)
                           / (c.q3 - c.q1) * 1e4 + 0.5) / 1e4
           END AS scaled
    FROM rk r JOIN cuts c USING (source)
    """,
)
def robust_scaler_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/IQR) feature scaling of document lengths per
    source — sklearn's RobustScaler as a DataFrame program, the
    normalization step quality classifiers apply before thresholding:
    center on the EXACT median and scale by the EXACT interquartile
    range, both as rank-ceil(q*n) order statistics over integers (the
    winsorized_price_stats recipe), so outliers cannot drag the scale
    the way mean/stddev scaling allows.  The only float operation is
    one final IEEE division of exact integers, half-up on the 4dp grid
    on both engines; a zero IQR falls back to 0 by contract.

    100 TB shape: one source-partitioned rank window (state bounded
    per group), a groups-sized cuts frame broadcast back, and a
    scan-stage projection for the scaling itself."""
    d = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars")
    wn = Window.partitionBy("source")
    rk = d.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )

    def at(q):
        return F.max(
            F.when(
                F.col("i") == F.ceil(q * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        )

    cuts = rk.groupBy("source").agg(
        at(0.25).alias("q1"), at(0.50).alias("med"), at(0.75).alias("q3")
    )
    return (
        rk.drop("i", "n")
        .join(F.broadcast(cuts), "source")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("med").alias("median_chars"),
            (F.col("q3") - F.col("q1")).alias("iqr_chars"),
            F.when(F.col("q3") == F.col("q1"), F.lit(0.0))
            .otherwise(
                F.floor(
                    (F.col("n_chars") - F.col("med")).cast("double")
                    / (F.col("q3") - F.col("q1"))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            )
            .alias("scaled"),
        )
    )


@query(
    "recursive_cte_order_chains",
    """
    WITH r AS (
      SELECT o_orderkey, o_custkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders
    )
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(first_value(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY rk) AS BIGINT) AS chain_root,
           CAST(rk - 1 AS BIGINT) AS depth
    FROM r
    """,
)
def recursive_cte_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's RECURSIVE CTE (SPARK-24497), exercised on a real
    multi-level walk: each customer's orders form a chain in
    (o_orderdate, o_orderkey) succession; the recursive query seeds at
    every chain head (the customer's first order) and walks next-links
    one hop per recursion level, labeling each order with its chain
    root and depth — customers place ~10 orders, so the recursion
    genuinely iterates at every SF (cteRecursionLevelLimit raised to
    200 and the walk provably terminates: edges strictly advance the
    per-customer rank).  The ORACLE computes the same labels
    NON-recursively from rank arithmetic — two algorithms, one exact
    integer answer, so a drift in either engine's recursion or
    ordering semantics breaks the hash.

    100 TB shape: the edge list is one customer-partitioned window;
    each recursion level is an equi-join on o_orderkey (dst keyed by
    src) — Spark executes levels as iterative joins over the frontier,
    which shrinks as chains end; depth is bounded by max orders per
    customer (domain-bounded, not SF-bounded)."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "200")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte_v")
    return spark.sql(
        """
        WITH RECURSIVE
        r AS (
          SELECT o_orderkey, o_custkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rk
          FROM orders_rcte_v
        ),
        e AS (
          SELECT a.o_orderkey AS src, b.o_orderkey AS dst
          FROM r a JOIN r b
            ON a.o_custkey = b.o_custkey AND b.rk = a.rk + 1
        ),
        walk AS (
          SELECT o_custkey, o_orderkey AS chain_root,
                 o_orderkey, 0 AS depth
          FROM r WHERE rk = 1
          UNION ALL
          SELECT w.o_custkey, w.chain_root, e.dst, w.depth + 1
          FROM walk w JOIN e ON e.src = w.o_orderkey
        )
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(chain_root AS BIGINT) AS chain_root,
               CAST(depth AS BIGINT) AS depth
        FROM walk
        """
    )


@query(
    "lateral_topn_per_customer",
    """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(t.o_orderkey AS BIGINT) AS o_orderkey,
           t.o_totalprice AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    'top-N related rows for each outer row' idiom SQL users reach for
    before discovering window functions: each BUILDING-segment
    customer pulls its 2 highest-value orders (deterministic ties by
    orderkey).  Both engines run the textual LATERAL; DuckDB executes
    it as a correlated scan while Spark DECORRELATES it into a ranked
    join — same rows either way, which is exactly the semantics
    contract worth pinning.

    100 TB shape: Catalyst's decorrelation turns the per-row rescan
    into one key-partitioned window + equi-join (no O(customers)
    rescans of orders); prices pass through unaggregated so no
    rounding contract is needed."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
               CAST(t.o_orderkey AS BIGINT) AS o_orderkey,
               t.o_totalprice AS o_totalprice
        FROM cust_lat_v c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat_v o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@query(
    "multimodal_jpeg_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 6)) AS b FROM documents
    )
    SELECT doc_id,
           CAST(count(*) * 64 AS BIGINT) AS n_pixels,
           CAST(sum(64 * (128 + 2 * ((doc_id * 13 + b * 7) % 120 - 60)))
                AS BIGINT) AS sum_pixels
    FROM s GROUP BY doc_id
    """,
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG encode+decode, hash-checked through the one
    input class the format preserves EXACTLY: constant 8x8 blocks whose
    value offset from 128 is even, so the DC coefficient 8*(v - 128)
    is a multiple of the quality-50 luminance Q(0,0) = 16 and
    quantization is lossless (AC coefficients are identically zero;
    the IDCT of a DC-only block is flat).  Per document a 16x24
    grayscale image of six such blocks (v = 128 + 2*((doc_id*13 +
    b*7) % 120 - 60), spanning [8, 248] and forcing signed DC deltas
    between blocks) goes through the native codec
    (operators/jpeg.py — markers, Annex K tables, canonical Huffman
    with byte stuffing, DCT) and every pixel must come back
    bit-for-bit; the oracle computes the block sums from the formula.
    Lossy-path behavior (gradients, 4:2:0, restarts, progressive
    refusal) is pinned in tests/test_jpeg.py where tolerances belong.

    100 TB shape: one partition-preserving mapInPandas pass."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.jpeg import encode_jpeg_baseline
    from flo_spark.operators.multimodal import decode_image

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_pixels": []}
            for doc_id in pdf.doc_id:
                img = np.zeros((16, 24), dtype=np.uint8)
                for b in range(6):
                    v = 128 + 2 * ((int(doc_id) * 13 + b * 7) % 120 - 60)
                    by, bx = divmod(b, 3)
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
                arr = decode_image(encode_jpeg_baseline(img, quality=50))
                assert arr.shape == (16, 24, 1)
                assert np.array_equal(arr[:, :, 0], img), int(doc_id)
                out["doc_id"].append(int(doc_id))
                out["n_pixels"].append(int(arr.size))
                out["sum_pixels"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_pixels long"
    )


@query(
    "dedup_fuzzy_verify_levenshtein",
    """
    WITH w AS (
      SELECT doc_id, substr(text, 1, 120) AS head,
             string_split(text, ' ') AS ws
      FROM documents
    ),
    b AS (
      SELECT doc_id, head,
             concat_ws(' ', ws[1], ws[2], ws[3]) AS blk
      FROM w
    ),
    p AS (
      SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
             levenshtein(a.head, bb.head) AS edit_dist,
             greatest(length(a.head), length(bb.head), 1) AS denom
      FROM b a JOIN b bb ON a.blk = bb.blk AND a.doc_id < bb.doc_id
    )
    SELECT doc_a, doc_b, CAST(edit_dist AS BIGINT) AS edit_dist,
           floor((1.0 - CAST(edit_dist AS DOUBLE) / denom) * 1e4 + 0.5)
             / 1e4 AS head_similarity,
           edit_dist <= 25 AS near_dup
    FROM p
    """,
)
def dedup_fuzzy_verify_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup VERIFICATION by edit distance — the exact-verify
    stage fuzzy-dedup pipelines run after cheap blocking: candidate
    pairs come from a deterministic block key (first 3 words — in this
    corpus exactly the planted duplicate/variant families), and each
    pair is scored by Levenshtein distance over the 120-char document
    heads (capped operands keep the O(n*m) DP bounded per pair — the
    standard trick; MinHash/SimHash handle whole-document scale).
    Classic Levenshtein is an exact integer both engines implement
    identically, so distance, 4dp head similarity, and the verdict all
    hash-match.

    100 TB shape: blocking is a scan-stage key + one equi-join (never
    all-pairs); pair count is sum of block^2, bounded by block sizes
    (max 3 in this corpus); the DP cost is capped by the 120-char
    operand limit."""
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    b = d.select(
        "doc_id",
        F.substring("text", 1, 120).alias("head"),
        F.concat_ws(
            " ",
            F.element_at(ws, 1),
            F.element_at(ws, 2),
            F.element_at(ws, 3),
        ).alias("blk"),
    )
    a, bb = b.alias("a"), b.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    denom = F.greatest(
        F.length("a.head"), F.length("b.head"), F.lit(1)
    )
    return (
        a.join(
            bb,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_dist"),
            (
                F.floor(
                    (1.0 - dist.cast("double") / denom) * 1e4 + F.lit(0.5)
                )
                / 1e4
            ).alias("head_similarity"),
            (dist <= 25).alias("near_dup"),
        )
    )


@query(
    "modern_aggregates_suite",
    """
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_large_qty,
           bool_and(l_quantity > 0) AS all_qty_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_div_by_zero,
           CAST(NULL AS BIGINT) AS overflow_is_null
    FROM lineitem GROUP BY l_returnflag
    """,
)
def modern_aggregates_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern SQL aggregate/error-handling surface in one entry:
    ``count_if`` / ``bool_and`` / ``bool_or`` (Spark 3.x additions SQL
    users expect from Postgres/DuckDB), plus the ANSI-mode ``try_*``
    arithmetic family — this session runs ANSI, where a plain division
    by zero or a long overflow RAISES, so ``try_divide`` and
    ``try_add`` returning NULL is load-bearing semantics, pinned here
    against literal expectations the oracle mirrors: every
    try_divide(x, 0) row counts 0 non-nulls, and
    try_add(BIGINT_MAX, 1) is NULL per group.

    100 TB shape: one map-side-combinable aggregate, single shuffle of
    partials; the try_* expressions are scan-stage JVM codegen."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).cast("long").alias("n_large_qty"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_qty_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count("*").alias("n_rows"),
        F.count(
            F.try_divide(F.col("l_quantity"), F.col("l_tax") - F.col("l_tax"))
        )
        .cast("long")
        .alias("n_div_by_zero"),
        F.max(
            F.try_add(F.lit(9223372036854775807), F.lit(1).cast("long"))
        )
        .cast("long")
        .alias("overflow_is_null"),
    )


@query(
    "scd2_customer_versions",
    """
    WITH upd AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS eff_date,
             max(o_totalprice) AS attr_value
      FROM orders GROUP BY 1, 2
    ),
    v AS (
      SELECT custkey, eff_date, attr_value,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY eff_date) AS version,
             lead(eff_date) OVER (PARTITION BY custkey
                                  ORDER BY eff_date) AS valid_to
      FROM upd
    )
    SELECT CAST(custkey AS BIGINT) AS custkey,
           CAST(version AS BIGINT) AS version,
           eff_date AS valid_from, valid_to,
           valid_to IS NULL AS is_current,
           floor(attr_value * 1e2 + 0.5) / 1e2 AS attr_value
    FROM v
    """,
)
def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension TYPE 2 history build — the versioned
    dimension every warehouse keeps and flo's event log naturally
    feeds: each (customer, day) change event (here: per-day max order
    value as the tracked attribute, deduplicated to one update per
    effective date) becomes a dimension VERSION with
    [valid_from, valid_to) effectivity derived by ``lead`` over the
    customer's change sequence; the open-ended current row carries
    NULL valid_to and is_current.  This is the half-open-interval
    construction a point-in-time join consumes
    (``scd2_point_in_time_join``).

    100 TB shape: one key shuffle for the per-day change dedup, one
    customer-partitioned window for versioning (state bounded by a
    customer's change count); no joins, no driver data."""
    upd = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.date_trunc("day", "o_orderdate").alias("eff_date"),
        )
        .agg(F.max("o_totalprice").alias("attr_value"))
    )
    w = Window.partitionBy("custkey").orderBy("eff_date")
    return upd.select(
        "custkey",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("eff_date").alias("valid_from"),
        F.lead("eff_date").over(w).alias("valid_to"),
        "attr_value",
    ).select(
        "custkey",
        "version",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        (F.floor(F.col("attr_value") * 1e2 + F.lit(0.5)) / 1e2).alias(
            "attr_value"
        ),
    )


@query(
    "scd2_point_in_time_join",
    """
    WITH upd AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS eff_date,
             max(o_totalprice) AS attr_value
      FROM orders GROUP BY 1, 2
    ),
    v AS (
      SELECT custkey, eff_date AS valid_from, attr_value,
             lead(eff_date) OVER (PARTITION BY custkey
                                  ORDER BY eff_date) AS valid_to
      FROM upd
    ),
    j AS (
      SELECT o.o_orderkey, v.custkey, v.valid_from, v.attr_value
      FROM orders o JOIN v
        ON v.custkey = o.o_custkey
       AND o.o_orderdate >= v.valid_from
       AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders_matched,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           count(*) = (SELECT count(*) FROM orders) AS exactly_one_version
    FROM j
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension: every
    order joins the customer version VALID AT its order date — the
    lookup that makes Type-2 history useful and the classic
    training-data leak guard ("join features as of the label's
    timestamp, never the current row").  The half-open intervals from
    ``scd2_customer_versions`` guarantee each order matches EXACTLY
    one version (its own day's update at minimum); the entry proves it
    corpus-wide: matched count == order count == distinct matched
    orders, as a hashed boolean.

    100 TB shape: the interval predicate rides a customer-keyed
    equi-join (the non-equi part filters within the key group — never
    a BroadcastNestedLoopJoin, plan-pinned in tests/test_plans.py);
    versions-per-customer is domain-bounded, so the within-key scan is
    bounded.  At extreme version counts the bin-id rewrite
    (interval_join_binned) applies unchanged."""
    o = load(spark, sf_dir, "orders")
    upd = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("day", "o_orderdate").alias("eff_date"),
    ).agg(F.max("o_totalprice").alias("attr_value"))
    w = Window.partitionBy("custkey").orderBy("eff_date")
    v = upd.select(
        "custkey",
        F.col("eff_date").alias("valid_from"),
        F.lead("eff_date").over(w).alias("valid_to"),
    )
    j = o.join(
        v,
        (v["custkey"] == o["o_custkey"])
        & (o["o_orderdate"] >= v["valid_from"])
        & (v["valid_to"].isNull() | (o["o_orderdate"] < v["valid_to"])),
    )
    total = o.agg(F.count("*").alias("n_orders"))
    return (
        j.agg(
            F.count("*").alias("n_orders_matched"),
            F.countDistinct("o_orderkey").alias("n_distinct"),
        )
        .join(F.broadcast(total))
        .select(
            "n_orders_matched",
            "n_orders",
            "n_distinct",
            (F.col("n_orders_matched") == F.col("n_orders")).alias(
                "exactly_one_version"
            ),
        )
    )


@query(
    "approx_topk_verified",
    """
    WITH c AS (
      SELECT event_type, count(*) AS n_exact FROM events GROUP BY event_type
    ),
    k AS (
      SELECT n_exact AS kth FROM c ORDER BY n_exact DESC LIMIT 1 OFFSET 2
    )
    SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
           TRUE AS topk_consistent, TRUE AS est_matches_exact
    FROM c, k
    """,
)
def approx_topk_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``approx_top_k`` sketch with exact verification: the
    sketch tracks up to maxItemsTracked items (default 10000), so at
    this column's cardinality its counts are EXACT and its top-3
    membership must agree with the true ranking.  The contract is
    tie-proof: membership is consistent iff every sketched item counts
    >= the true 3rd-highest count and every unsketched item counts <=
    it (a boundary tie legally resolves either way), and every
    sketched item's estimate equals its exact count.  Both booleans
    hash against literal TRUE; the exact counts pin the grouping.

    100 TB shape: approx_top_k is a single map-side-combinable
    aggregate whose state is O(maxItemsTracked) — the heavy-hitter
    shape that replaces a full groupBy + sort when only the top of the
    distribution matters; the exact verification side is one key
    shuffle."""
    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    kth = (
        exact.orderBy(F.col("n_exact").desc())
        .limit(3)
        .agg(F.min("n_exact").alias("kth"))
    )
    sk = ev.agg(
        F.expr("approx_top_k(event_type, 3)").alias("top")
    ).select(F.explode("top").alias("t")).select(
        F.col("t.item").alias("event_type"),
        F.col("t.count").alias("est"),
    )
    return (
        exact.join(sk, "event_type", "left")
        .join(F.broadcast(kth))
        .select(
            "event_type",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.when(F.col("est").isNotNull(), F.col("n_exact") >= F.col("kth"))
            .otherwise(F.col("n_exact") <= F.col("kth"))
            .alias("topk_consistent"),
            F.coalesce(F.col("est") == F.col("n_exact"), F.lit(True)).alias(
                "est_matches_exact"
            ),
        )
    )


@query(
    "listagg_order_manifest",
    """
    WITH r AS (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_sampled,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderkey) AS first_keys
    FROM r WHERE rn <= 5 GROUP BY o_orderpriority
    """,
)
def listagg_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ``LISTAGG ... WITHIN GROUP (ORDER BY ...)`` — new in
    Spark 4 — building a deterministic per-group manifest string (the
    5 lowest order keys per priority, comma-joined in key order);
    DuckDB spells the same aggregate ``string_agg(... ORDER BY ...)``.
    An unordered listagg would be partition-order-dependent; the
    WITHIN GROUP ordering is what makes the result hashable at all —
    which is exactly the semantics worth pinning.

    100 TB shape: the rank window bounds each group's contribution to
    5 rows before the aggregate, so the manifest string is O(k) per
    group regardless of data scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    r = o.select("o_orderpriority", "o_orderkey").withColumn(
        "rn", F.row_number().over(w)
    ).filter(F.col("rn") <= 5)
    r.createOrReplaceTempView("listagg_sample_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_sampled,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY o_orderkey) AS first_keys
        FROM listagg_sample_v GROUP BY o_orderpriority
        """
    )


@query(
    "bucketed_colocated_join",
    f"""
    SELECT l.l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           {_REVENUE_SQL} AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level BUCKETING — the shuffle you pay once at write time
    instead of on every join: both fact tables save bucketed (and
    sorted) by the join key into 8 buckets, and the subsequent join
    reads co-located buckets with NO exchange on either side (Spark 4
    no longer propagates bucket-file sort order, so cheap IN-PARTITION
    sorts remain — the eliminated shuffle is the payoff) — at 100 TB
    this is THE lever for a fact-fact join that runs daily (a nightly bucketed rewrite amortizes across every
    downstream join/aggregation on the key).  The result is
    bit-identical to the plain join (the oracle IS the plain join);
    the zero-exchange plan shape is pinned in tests/test_plans.py.

    100 TB shape: bucket count scales with data (8 here fits the test
    corpus; a cluster uses thousands so bucket files stay
    task-sized); bucket pruning and sorted-merge reads follow free.
    The write inside this entry is the one-time cost being
    demonstrated, not a per-query cost."""
    from flo_spark.queries import scratch_dir

    scratch = scratch_dir("flo_bucketed_")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    spark.sql("DROP TABLE IF EXISTS flo_bucketed_orders")
    spark.sql("DROP TABLE IF EXISTS flo_bucketed_lineitem")
    # repartition onto the bucket key first: each task then writes
    # exactly one file per bucket (without this every task emits a
    # file for every bucket — a small-file explosion — AND Spark can
    # no longer trust per-bucket sortedness, so the join re-sorts)
    (
        o.repartition(8, "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{scratch}/orders")
        .mode("overwrite")
        .saveAsTable("flo_bucketed_orders")
    )
    (
        li.repartition(8, "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{scratch}/lineitem")
        .mode("overwrite")
        .saveAsTable("flo_bucketed_lineitem")
    )
    bo = spark.table("flo_bucketed_orders").filter(
        F.col("o_orderstatus") == "F"
    )
    bl = spark.table("flo_bucketed_lineitem")
    return (
        bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


@query(
    "stream_scd2_maintenance",
    """
    WITH chg AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS valid_from,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY valid_from) AS BIGINT)
             AS version,
           valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) IS NULL AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM chg
    """,
)
def stream_scd2_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 maintained FROM A STREAM: the change feed (per-user
    per-day activity) arrives in micro-batches; each batch reduces to
    its partial (user, day, count) change rows written as the batch's
    own replay-safe shard (overwrite-own-shard — the monitor-store
    idempotency recipe), and the versioned dimension DERIVES at read
    time: merge shards additively, then the same lead-window
    construction as ``scd2_customer_versions``.  Keeping the STORE as
    an idempotent change log and deriving versions on read is what
    makes streaming SCD2 replay-safe — a stored materialized
    [valid_from, valid_to) row would need in-place rewrites on every
    late or replayed batch.

    Contract: the streamed store's derived versions hash-match the
    batch ground truth computed straight from the events table.

    100 TB shape: per batch one (user, day) partial aggregation; the
    store grows by batch-partial rows (compactable additively, same
    scheme as compact_countmin_store); the read-side merge is one key
    shuffle + a user-partitioned window."""
    from flo_spark.queries import _events_stream, scratch_dir

    tmp = scratch_dir("flo_scd2_stream_")
    store = f"{tmp}/store"

    def fold(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy(
                "user_id", F.date_trunc("day", "ts").alias("valid_from")
            )
            .agg(F.count("*").alias("n_events"))
            .write.mode("overwrite")
            .parquet(f"{store}/batch={batch_id}")
        )

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("scd2 maintenance stream did not drain")
    chg = (
        spark.read.parquet(f"{store}/batch=*")
        .groupBy("user_id", "valid_from")
        .agg(F.sum("n_events").alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy("valid_from")
    return chg.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@query(
    "flo_xml_roundtrip",
    """
    WITH b AS (
      SELECT doc_id, text,
             '/xml/' || lang AS namespace,
             CAST(doc_id % 4 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 250
    ),
    cnt AS (SELECT partition, count(*) AS n FROM b GROUP BY partition),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    ),
    env AS (
      SELECT b.namespace,
             off.off + row_number()
               OVER (PARTITION BY b.partition ORDER BY b.doc_id)
               AS event_counter,
             octet_length(encode(b.text)) AS nbytes
      FROM b JOIN off USING (partition)
    )
    SELECT namespace,
           count(*) AS n_events,
           CAST(sum(event_counter) AS BIGINT) AS sum_counters,
           CAST(sum(nbytes) AS BIGINT) AS sum_bytes,
           count(*) AS n_null_parents
    FROM env GROUP BY namespace
    """,
)
def flo_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML interchange: produce a 4-partition event stream, export it
    through Spark 4's NATIVE XML source (the spark-xml package folded
    into core — new public surface in this Spark generation), read it
    back with the explicit envelope schema, and aggregate.  Payloads
    travel base64 (XML is text, same rule as CSV/JSON); null parent
    ids become OMITTED elements on write and must come back as real
    NULLs under the explicit read schema — ``n_null_parents`` pins
    exactly that omitted-element round trip (every produced event has
    no parent, so the count must equal ``n_events``).

    Completes the interchange matrix: parquet / orc / csv / json /
    gzip-jsonl / xml / native ``.events`` all have hash-checked
    round-trip evidence.

    100 TB shape: XML records span physical lines, so a shard is
    parallel at FILE granularity only (like the gzip JSONL shards) —
    export partitioning decides scan parallelism; the aggregation is
    one map-side-combinable shuffle of per-namespace partials.
    Reference: flo's wire form is length-prefixed bytes
    (flo-protocol/src/client.rs:106-122); base64 is the text-safe
    analog, identical to the CSV/JSON rule."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.event_table import EventStream

    tmp = scratch_dir("flo_xml_")
    s = EventStream.create(spark, f"{tmp}/stream", num_partitions=4)
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(250)
    batch = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("/xml/"), F.col("lang")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 4 + 1).cast("int").alias("partition"),
    )
    s.produce(batch, order_by="doc_id")
    s.export(f"{tmp}/xml", fmt="xml")
    x = EventStream.read_events(spark, f"{tmp}/xml", fmt="xml")
    return x.groupBy("namespace").agg(
        F.count("*").alias("n_events"),
        F.sum("event_counter").alias("sum_counters"),
        F.sum(F.octet_length("data")).alias("sum_bytes"),
        F.count(F.when(F.col("parent_counter").isNull(), 1)).alias(
            "n_null_parents"
        ),
    )


@query(
    "sql_scripting_threshold_report",
    """
    WITH t AS (
      SELECT CAST(floor(count(*) / 200) AS BIGINT) AS min_n FROM orders
    ),
    cap AS (
      SELECT CASE WHEN min_n <= 1 THEN CAST(1 AS BIGINT)
                  ELSE CAST(power(2, length(bin(min_n - 1))) AS BIGINT)
             END AS pow2_cap, min_n
      FROM t
    )
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           CAST(floor((sum(CAST(floor((o.o_totalprice) * 10000 + 0.5)
                                AS BIGINT)) + 50) / 100.0) / 100.0
                AS DOUBLE) AS sum_price,
           cap.min_n AS min_n,
           cap.pow2_cap AS pow2_cap
    FROM orders o CROSS JOIN cap
    GROUP BY o.o_orderpriority, cap.min_n, cap.pow2_cap
    HAVING count(*) >= cap.min_n
    """,
)
def sql_scripting_threshold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN..END compound statements, local
    DECLARE variables, SET VAR from a scalar subquery, and a WHILE
    loop) driving a real report: the script derives a dynamic count
    threshold (|orders|/200) into a variable, raises a second variable
    to the smallest power of two >= that threshold by LOOPING
    (``cap = cap * 2`` until it clears), then returns the per-priority
    money report filtered by the computed threshold.  The oracle has
    no procedural engine, so it derives the loop's fixed point in
    closed form (2^bitlength(n-1)) — two algorithms, one exact integer,
    which is precisely what makes a control-flow feature
    hash-checkable.

    Money uses the exact scaled-long spelling (queries.money_sum_sql)
    written inline in BOTH engines' SQL with a final CAST AS DOUBLE —
    SQL-text literals like 100.0 parse as DECIMAL (unlike the
    DataFrame API's lit(100.0)), and the two engines format decimals
    differently.  The threshold is CAST(floor(count/200) AS BIGINT):
    an explicit floor because double->int CASTs disagree across
    engines (Spark truncates, DuckDB rounds — 7.5 became 7 vs 8).

    100 TB shape: scripting is driver-side control flow around
    ordinary Catalyst statements — the scalar-subquery SET VAR is a
    1-row aggregate, the loop is O(log n) driver arithmetic touching
    no data, and the report is one map-side-combinable aggregate of
    the orders scan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE min_n BIGINT DEFAULT 0;
          DECLARE cap BIGINT DEFAULT 1;
          SET min_n =
            (SELECT CAST(floor(count(*) / 200) AS BIGINT)
             FROM orders_script_v);
          WHILE cap < min_n DO
            SET cap = cap * 2;
          END WHILE;
          SELECT o_orderpriority,
                 count(*) AS n_orders,
                 CAST(floor((sum(CAST(floor((o_totalprice) * 10000 + 0.5)
                                      AS BIGINT)) + 50) / 100.0) / 100.0
                      AS DOUBLE) AS sum_price,
                 min_n AS min_n,
                 cap AS pow2_cap
          FROM orders_script_v
          GROUP BY o_orderpriority
          HAVING count(*) >= min_n;
        END
        """
    )


@query(
    "dpp_month_partition_prune",
    """
    WITH m AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
      FROM orders
      WHERE year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'
    )
    SELECT l.ship_month,
           count(*) AS n_items,
           floor((sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount))
                                 * 10000 + 0.5) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
    FROM (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             l_extendedprice, l_discount
      FROM lineitem
    ) l JOIN m USING (ship_month)
    GROUP BY l.ship_month
    """,
)
def dpp_month_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING end to end: the fact table is laid out
    hive-partitioned by ship month (``ship_month=YYYY-MM/`` dirs — the
    canonical 100 TB fact layout), the dim side is the set of months
    that saw an URGENT order in 1996, and Catalyst injects the dim's
    month set into the fact scan's PartitionFilters AT RUNTIME
    (``dynamicpruning#`` subquery, reusing the join's broadcast) — so
    the ~12 matching month directories are the only ones whose files
    open, out of the full date range.  Static pruning can't do this:
    the month list is data, known only after the dim filter runs.
    tests/test_plans.py pins the ``dynamicpruning`` PartitionFilter
    and the broadcast reuse in the physical plan.

    100 TB shape: THE mechanism that makes date-partitioned fact joins
    affordable — scan cost scales with the dim's selectivity, not the
    fact's history length.  The scratch layout writes one file per
    month (repartition by the partition column before partitionBy) —
    the small-files discipline a real table needs.

    Correctness: revenue per selected month hash-matches the oracle
    computed from the unpartitioned parquet; the scaled-long money sum
    keeps both engines exact."""
    from flo_spark.queries import money_sum, scratch_dir

    tmp = scratch_dir("flo_dpp_")
    li = load(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        "l_extendedprice",
        "l_discount",
    )
    (
        li.repartition("ship_month")
        .write.partitionBy("ship_month")
        .mode("overwrite")
        .parquet(f"{tmp}/fact")
    )
    fact = spark.read.parquet(f"{tmp}/fact")
    dim = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.year("o_orderdate") == 1996)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


@query(
    "community_label_propagation",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT lo AS src, hi AS dst FROM e
      UNION ALL
      SELECT hi AS src, lo AS dst FROM e
    ),
    l0 AS (SELECT DISTINCT src AS n, src AS lbl FROM sym),
    v1 AS (
      SELECT s.src AS n, l.lbl, count(*) AS c
      FROM sym s JOIN l0 l ON l.n = s.dst
      GROUP BY 1, 2
    ),
    l1 AS (
      SELECT n, lbl FROM (
        SELECT n, lbl,
               row_number() OVER (PARTITION BY n ORDER BY c DESC, lbl ASC)
                 AS rk
        FROM v1) t WHERE rk = 1
    ),
    v2 AS (
      SELECT s.src AS n, l.lbl, count(*) AS c
      FROM sym s JOIN l1 l ON l.n = s.dst
      GROUP BY 1, 2
    ),
    l2 AS (
      SELECT n, lbl FROM (
        SELECT n, lbl,
               row_number() OVER (PARTITION BY n ORDER BY c DESC, lbl ASC)
                 AS rk
        FROM v2) t WHERE rk = 1
    )
    SELECT CAST(lbl AS BIGINT) AS community,
           count(*) AS n_members,
           CAST(min(n) AS BIGINT) AS min_member,
           CAST(max(n) AS BIGINT) AS max_member
    FROM l2 GROUP BY lbl
    """,
)
def community_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation on the
    part co-purchase graph (the `triangle_count_copurchase` edge set):
    every node starts labeled with its own id; each round it adopts
    the most frequent label among its NEIGHBORS, ties broken toward
    the smallest label — the deterministic variant of
    Raghavan et al. 2007 (classic async LPA is run-order dependent,
    useless under a hash oracle; the sync+min-tie form is the one
    Pregel systems implement).  Two rounds, then communities report
    (label, size, min/max member).

    The oracle replays both rounds as chained CTEs — same algorithm,
    independently evaluated, exact integer labels.

    100 TB shape: per round ONE keyed join (symmetric edges x current
    labels on dst) + one (node,label) count shuffle + one per-node
    window cut — all partitioned by node id; the label frame is
    |V|-sized and never collected.  Deep iteration would add
    localCheckpoint lineage cuts every few rounds (operators/graph.py
    discipline); two rounds stay well inside plan-size limits.
    Reference scope: flo has no graph surface — north-star extension
    (SURVEY §2 Part B)."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi")
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("lo", "hi")
    )
    sym = (
        e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        .unionAll(e.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
        .persist()
    )
    labels = sym.select(F.col("src").alias("n")).distinct().select(
        "n", F.col("n").alias("lbl")
    )
    w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("lbl").asc())
    for _ in range(2):
        votes = (
            sym.join(
                labels.select(F.col("n").alias("dst"), "lbl"), "dst"
            )
            .groupBy(F.col("src").alias("n"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("n", "lbl")
        )
    return labels.groupBy(F.col("lbl").cast("long").alias("community")).agg(
        F.count("*").alias("n_members"),
        F.min("n").cast("long").alias("min_member"),
        F.max("n").cast("long").alias("max_member"),
    )


@query(
    "dsir_importance_resample",
    """
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    words AS (
      SELECT doc_id, lang, unnest(ws) AS w FROM toks
    ),
    ct AS (
      SELECT w, count(*) AS ct FROM words WHERE lang = 'en' GROUP BY w
    ),
    cr AS (
      SELECT w, count(*) AS cr FROM words WHERE lang <> 'en' GROUP BY w
    ),
    ratio AS (
      SELECT cr.w,
             CAST(floor((10000 * (COALESCE(ct.ct, 0) + 1))
                        / (cr.cr + 1)) AS BIGINT) AS r
      FROM cr LEFT JOIN ct ON ct.w = cr.w
    ),
    doc_scores AS (
      SELECT wd.doc_id,
             count(*) AS n_toks,
             CAST(floor(CAST(sum(ratio.r) AS DOUBLE) / count(*)) AS BIGINT)
               AS dsir_score
      FROM words wd JOIN ratio ON ratio.w = wd.w
      WHERE wd.lang <> 'en'
      GROUP BY wd.doc_id
    )
    SELECT d.doc_id, t.lang, t.source,
           CAST(d.n_toks AS BIGINT) AS n_toks, d.dsir_score
    FROM doc_scores d JOIN toks t ON t.doc_id = d.doc_id
    ORDER BY d.dsir_score DESC, d.doc_id LIMIT 100
    """,
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023) re-based on exact integers: score every raw-pool document
    (lang != 'en') by its unigram importance under the TARGET
    distribution (the English slice), then take the top-100 — the
    deterministic analog of sampling proportionally to the importance
    weight.  Per word, importance = floor(1e4*(ct+1)/(cr+1)) — the
    add-one target/raw likelihood ratio on a fixed integer grid; per
    doc, the floor-mean of its words' ratios.  All inputs are exact
    integers and every division is a correctly-rounded IEEE op whose
    distance from the nearest integer (>= 1/n) dwarfs the ulp, so the
    scores are bit-identical cross-engine (the q7 discipline applied
    to likelihood ratios).

    Paper mapping: DSIR hashes n-grams into 2^k buckets so the
    importance model fits one machine's memory.  Here the model IS a
    DataFrame keyed by word — vocabulary-sized, joined not broadcast —
    so the hashing trick becomes an optional constant-memory
    refinement rather than a requirement; the estimator is otherwise
    the paper's (add-one smoothed unigram ratio, resample top-k).

    100 TB shape: two corpus-scale word aggregations (one shuffle
    each, map-side combinable), a vocab-sized ratio join on the word
    key (AQE picks broadcast only if it fits), one per-doc score
    shuffle, TakeOrderedAndProject for the cut — no driver-side
    state."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.filter(F.split("text", " "), lambda x: x != "").alias("ws"),
    )
    words = toks.select("doc_id", "lang", F.explode("ws").alias("w"))
    ct = (
        words.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count("*").alias("ct"))
    )
    cr = (
        words.filter(F.col("lang") != "en")
        .groupBy("w")
        .agg(F.count("*").alias("cr"))
    )
    ratio = cr.join(ct, "w", "left").select(
        "w",
        F.floor(
            (10000 * (F.coalesce(F.col("ct"), F.lit(0)) + 1))
            / (F.col("cr") + 1)
        )
        .cast("long")
        .alias("r"),
    )
    doc_scores = (
        words.filter(F.col("lang") != "en")
        .join(ratio, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.floor(F.sum("r").cast("double") / F.count("*"))
            .cast("long")
            .alias("dsir_score"),
        )
    )
    return (
        doc_scores.join(toks.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_toks").cast("long").alias("n_toks"),
            "dsir_score",
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )


@query(
    "image_dhash_neardup",
    """
    SELECT doc_id AS orig_id,
           doc_id + 100000 AS dup_id,
           CAST(doc_id AS BIGINT) AS dhash
    FROM documents WHERE doc_id < 40
    """,
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image deduplication (dHash, the
    difference-hash behind every photo-dedup pipeline) with a planted,
    PROVABLE contract — the image sibling of ``dedup_simhash_pairs``:

    Per document, build a REAL 9x8 grayscale PGM whose horizontal
    gradient SIGNS encode the bits of doc_id (pixel walks +3 for a set
    bit, -3 for clear, from 128), so by construction
    dHash(image) == doc_id — and dHash is distinct across documents
    because doc_id is.  For doc_id < 40 a brightness-shifted copy
    (+15 on every pixel, a new asset id) is planted: dHash compares
    ADJACENT pixels, so a global brightness change preserves every
    bit — exactly the invariance that makes dHash a near-dup hash
    rather than a checksum.  The pipeline encodes real P5 container
    bytes, decodes them back through ``decode_image`` (the engine's
    actual netpbm decoder), computes the 64-bit dHash from the decoded
    pixels with numpy, and self-joins on the hash — so the planted
    pair set (each base with its copy, nothing else) is the only
    possible correct answer, and a defect in the container encode, the
    decoder, the bit packing, or the join breaks the hash.

    Hamming-tolerant matching (t > 0) composes with the simhash
    band-join (operators/dedup.py): dhash here IS a 64-bit simhash-
    shaped key.  100 TB shape: decode + hash is one Arrow-batched
    mapInPandas over the asset scan (no shuffle); the dedup join is
    one hash shuffle on an 8-byte key — identical to exact dedup."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, dhash64

    W, H = 9, 8

    def _hash_assets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def render(v: int, bright: int) -> bytes:
            px = np.empty((H, W), dtype=np.uint8)
            for y in range(H):
                p = 128 + bright
                px[y, 0] = p
                for x in range(W - 1):
                    bit = (v >> (y * 8 + x)) & 1
                    p += 3 if bit else -3
                    px[y, x + 1] = p
            return b"P5\n%d %d\n255\n" % (W, H) + px.tobytes()

        def dhash(payload: bytes) -> int:
            return dhash64(decode_image(payload))

        for pdf in it:
            out = {"asset_id": [], "dhash": []}
            for doc_id in pdf.doc_id:
                did = int(doc_id)
                out["asset_id"].append(did)
                out["dhash"].append(dhash(render(did, 0)))
                if did < 40:  # planted brightness-shifted copy
                    out["asset_id"].append(did + 100000)
                    out["dhash"].append(dhash(render(did, 15)))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    hashed = docs.mapInPandas(_hash_assets, "asset_id long, dhash long")
    a, b = hashed.alias("a"), hashed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("orig_id"),
            F.col("b.asset_id").alias("dup_id"),
            F.col("a.dhash").alias("dhash"),
        )
    )


@query(
    "theta_sketch_audience_diff",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_overlap
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(sa.n - p.n_overlap AS BIGINT) AS n_a_not_b,
           CAST(sb.n - p.n_overlap AS BIGINT) AS n_b_not_a,
           TRUE AS within_bound_ab,
           TRUE AS within_bound_ba
    FROM p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def theta_sketch_audience_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience DIFFERENCE via theta sketches — A-not-B, the third
    set-algebra operation (DataSketches' AnotB), completing the
    union / intersection / difference triple over the same per-type
    sketch rows `theta_sketch_audience_overlap` builds: 'users who did
    X but never Y' answered from O(types) sketches, no distinct-join
    per pair.  Retention/churn asks exactly this shape (bought-then-
    left, saw-but-never-clicked).

    Contract: per ordered pair both directions' estimates land within
    4/sqrt(k) of the exact difference scaled by the pair's union (the
    cut-sample error model, property-tested with the exact partition
    identity intersect+diff == cut cardinality in
    tests/test_sketch.py); below k distinct users the sketch is exact.
    Exact differences derive from the same scan (|A| - |A∩B|) and pin
    the pairing.

    100 TB shape: identical to the overlap entry — one distinct
    shuffle, one applyInPandas sketch task per type, O(types) rows
    collected (documented), pairwise algebra on sketch state only."""
    import pandas as pd

    from flo_spark.operators.sketch import ThetaSketch

    K = 256
    du = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .persist()
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = ThetaSketch(K).add(pdf["user_id"].tolist())
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "hashes": [sk.to_row()]}
        )

    sk_rows = (
        du.groupBy("event_type")
        .applyInPandas(build, "event_type string, hashes array<long>")
        .collect()  # O(types) tiny rows, documented
    )
    sketches = {
        r.event_type: ThetaSketch.from_row(list(r.hashes), K) for r in sk_rows
    }
    sizes = {t: sk.estimate() for t, sk in sketches.items()}
    types = sorted(sketches)
    rel = 4 / K ** 0.5
    est_rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = sketches[ta].intersect_estimate(sketches[tb])
            union_est = sizes[ta] + sizes[tb] - inter
            est_rows.append(
                (
                    ta,
                    tb,
                    float(sketches[ta].difference_estimate(sketches[tb])),
                    float(sketches[tb].difference_estimate(sketches[ta])),
                    float(union_est),
                )
            )
    est_df = spark.createDataFrame(
        est_rows,
        "type_a string, type_b string, est_ab double, est_ba double,"
        " union_est double",
    )
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    overlap = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_overlap"))
    )
    szs = du.groupBy(F.col("event_type")).agg(F.count("*").alias("n"))
    exact = (
        overlap.join(
            szs.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")),
            "type_a",
        )
        .join(
            szs.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            (F.col("na") - F.col("n_overlap")).cast("long").alias("n_a_not_b"),
            (F.col("nb") - F.col("n_overlap")).cast("long").alias("n_b_not_a"),
        )
    )
    return exact.join(est_df, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_a_not_b",
        "n_b_not_a",
        (
            F.abs(F.col("est_ab") - F.col("n_a_not_b"))
            <= rel * F.col("union_est") + F.lit(1e-9)
        ).alias("within_bound_ab"),
        (
            F.abs(F.col("est_ba") - F.col("n_b_not_a"))
            <= rel * F.col("union_est") + F.lit(1e-9)
        ).alias("within_bound_ba"),
    )


@query(
    "audio_fingerprint_neardup",
    """
    SELECT doc_id AS orig_id,
           doc_id + 100000 AS dup_id,
           CAST(doc_id AS BIGINT) AS fp
    FROM documents WHERE doc_id < 40
    """,
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint deduplication with a planted, PROVABLE
    contract — the audio sibling of ``image_dhash_neardup``: the
    fingerprint is the SIGN CONTOUR of successive sample amplitudes
    (the 1-bit energy-delta scheme that band-energy fingerprints like
    Shazam's reduce to per band), which is invariant under GAIN — a
    louder copy of the same recording fingerprints identically.

    Per document, synthesize a real RIFF/WAVE PCM16 mono container
    whose 65 samples walk +3/-3 around 1000 following the bits of
    doc_id, so fingerprint(audio) == doc_id by construction and is
    distinct across documents.  For doc_id < 40 a gain-doubled copy
    (x2 every sample — exact in int16 and in the decoder's /32768
    float32 normalization) is planted under a new asset id.  The
    pipeline writes actual WAV bytes, decodes them back through
    ``decode_audio`` (the engine's stdlib WAV path), computes the
    64-bit contour with numpy, and self-joins on it: the planted
    (base, copy) pairs are the only possible answer; a defect in the
    container encode, the decoder's width/normalization handling, the
    bit packing, or the join breaks the hash.

    100 TB shape: decode + fingerprint is one Arrow-batched
    mapInPandas over the asset scan; the dedup join is one hash
    shuffle on an 8-byte key.  Hamming-tolerant matching composes
    with the simhash band-join exactly as for dHash."""
    import struct

    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_audio, sign_contour64

    N = 65  # 64 sign bits

    def _fingerprint(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def render(v: int, gain: int) -> bytes:
            s = np.empty(N, dtype=np.int16)
            p = 1000
            s[0] = p * gain
            for k in range(N - 1):
                p += 3 if (v >> k) & 1 else -3
                s[k + 1] = p * gain
            pcm = s.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(pcm))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data"
                + struct.pack("<I", len(pcm))
            )
            return hdr + pcm

        def fp(payload: bytes) -> int:
            samples, _rate = decode_audio(payload)
            return sign_contour64(samples)

        for pdf in it:
            out = {"asset_id": [], "fp": []}
            for doc_id in pdf.doc_id:
                did = int(doc_id)
                out["asset_id"].append(did)
                out["fp"].append(fp(render(did, 1)))
                if did < 40:  # planted gain-doubled copy
                    out["asset_id"].append(did + 100000)
                    out["fp"].append(fp(render(did, 2)))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    hashed = docs.mapInPandas(_fingerprint, "asset_id long, fp long")
    a, b = hashed.alias("a"), hashed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("orig_id"),
            F.col("b.asset_id").alias("dup_id"),
            F.col("a.fp").alias("fp"),
        )
    )


@query(
    "group_leakage_safe_split",
    """
    WITH u AS (
      SELECT user_id,
             CASE WHEN (user_id * 2654435761) % 1000 < 800 THEN 'train'
                  WHEN (user_id * 2654435761) % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT u.split,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           TRUE AS no_leakage
    FROM events e JOIN u ON u.user_id = e.user_id
    GROUP BY u.split
    """,
)
def group_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split — the leakage guard
    ``train_val_test_split`` (row-hash) cannot give: the split key is
    the multiplicative hash of the GROUP (user_id), so every event of
    a user lands in the same split and no user's behavior leaks from
    train into eval — sklearn's GroupShuffleSplit as a deterministic
    DataFrame program.  Same Knuth hash, same 80/10/10 bands, same
    stability contract (new users never reassign existing ones).

    ``no_leakage`` is PROVEN inside the query, not assumed: the max
    over users of their distinct-split count must be 1, checked as a
    1-row aggregate and broadcast onto every output row — a split
    function accidentally keyed on a row attribute breaks the hash.

    100 TB shape: the split is scan-stage arithmetic on the group
    key — no distinct-users table needed at assignment time (the hash
    IS the assignment); the audit aggregate is one extra
    map-side-combinable pass."""
    ev = load(spark, sf_dir, "events")
    split = (
        F.when((F.col("user_id") * 2654435761) % 1000 < 800, "train")
        .when((F.col("user_id") * 2654435761) % 1000 < 900, "val")
        .otherwise("test")
    )
    tagged = ev.select("user_id", split.alias("split"))
    audit = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .agg((F.max("k") == 1).alias("no_leakage"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .crossJoin(F.broadcast(audit))
    )


@query(
    "auc_quality_classifier",
    """
    WITH labeled AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    by_score AS (
      SELECT score, sum(pos) AS p, sum(1 - pos) AS n
      FROM labeled GROUP BY score
    ),
    cum AS (
      SELECT score, p, n,
             COALESCE(sum(n) OVER (ORDER BY score
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS neg_below
      FROM by_score
    ),
    agg AS (
      SELECT CAST(sum(p) AS BIGINT) AS n_pos,
             CAST(sum(n) AS BIGINT) AS n_neg,
             CAST(sum(2 * p * neg_below) + sum(p * n) AS BIGINT) AS auc2
      FROM cum
    )
    SELECT n_pos, n_neg, auc2,
           floor(auc2 * 1000000.0 / (2 * n_pos * n_neg) + 0.5)
             / 1000000.0 AS auc
    FROM agg
    """,
)
def auc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC — the evaluation metric every curation classifier
    needs — computed distributed WITHOUT materializing pairs: AUC is
    the Mann-Whitney statistic P(score_pos > score_neg) + 0.5 *
    P(tie), so with counts grouped BY SCORE it reduces to one sorted
    cumulative sum: auc2 = 2*sum_s(p_s * neg_below(s)) + sum_s(p_s *
    n_s), all integers, then ONE final IEEE division onto the 1e-6
    grid.  Ties (documents sharing a length) are handled exactly —
    the 0.5 credit is the integer p_s*n_s term — where a naive
    rank-based AUC silently miscounts them.

    Here the 'classifier' is document length (n_chars) predicting the
    English label: a weak but deterministic signal, which is the
    point — the metric machinery is the operator under test.

    100 TB shape: one aggregation to the |distinct scores| table, one
    window over it ordered by score (tiny — scores, not documents),
    one 1-row aggregate.  The O(P*N) pair space is never formed."""
    d = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    by_score = d.groupBy("score").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("n")
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        (F.sum(2 * F.col("p") * F.col("neg_below")) + F.sum(F.col("p") * F.col("n")))
        .cast("long")
        .alias("auc2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "auc2",
        (
            F.floor(
                F.col("auc2") * 1000000.0 / (2 * F.col("n_pos") * F.col("n_neg"))
                + 0.5
            )
            / 1000000.0
        ).alias("auc"),
    )


@query(
    "hard_negative_mining",
    """
    WITH q AS (
      SELECT vec_id AS q_id, label AS q_label,
             CAST(embedding AS DOUBLE[]) AS q_emb
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (
      SELECT vec_id AS neg_id, label AS neg_label,
             CAST(embedding AS DOUBLE[]) AS c_emb
      FROM embeddings
    ),
    scored AS (
      SELECT q.q_id, q.q_label, c.neg_id, c.neg_label,
             round(list_cosine_similarity(q.q_emb, c.c_emb), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY list_cosine_similarity(q.q_emb, c.c_emb) DESC,
                        c.neg_id) AS rn
      FROM q JOIN c ON c.neg_label <> q.q_label
    )
    SELECT q_id, q_label, neg_id, neg_label, cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive embedding training: for
    each anchor (first 20 vectors), the 3 most-cosine-similar vectors
    with a DIFFERENT label — the near-miss negatives that make
    InfoNCE/triplet training converge, and the standard curation step
    before a retrieval fine-tune.  The similarity is computed entirely
    in JVM higher-order functions (transform-to-double, zip_with
    product, sequential aggregate fold, one sqrt) — no Python in the
    scoring path — and rounded on the module's 4dp ratio grid.

    100 TB shape: the anchor side is a bounded mining batch, hinted
    broadcast, so the 'cross' join is one pass over the corpus with
    batch-local scoring and a per-anchor TakeOrdered-style window cut;
    swapping the corpus scan for `ann_topk_ivf_indexed`'s cell-pruned
    scan gives the sublinear variant with the same output contract.
    Label filtering happens in the join condition, BEFORE any score is
    computed."""
    e = load(spark, sf_dir, "embeddings")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        to_d("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        to_d("embedding").alias("c_emb"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neg_label") != F.col("q_label"))
        .withColumn(
            "cos_raw",
            dot(F.col("q_emb"), F.col("c_emb"))
            / F.sqrt(
                dot(F.col("q_emb"), F.col("q_emb"))
                * dot(F.col("c_emb"), F.col("c_emb"))
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "q_id",
            "q_label",
            "neg_id",
            "neg_label",
            F.round("cos_raw", 4).alias("cos_sim"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@query(
    "bitmap_exact_distinct",
    """
    SELECT event_type AS scope,
           count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS scope, count(DISTINCT user_id) AS n_exact
    FROM events
    """,
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count — Spark's
    roaring-bitmap-style surface): ids partition into 32k-bit buckets,
    each (group, bucket) folds to one bitmap, and distinct = SUM over
    buckets of the bitmap popcount.  Where HLL/theta sketches trade
    error for size, bitmaps are exact AND still re-aggregable: the
    'ALL' row is NOT a second scan — it ORs the per-type bucket
    bitmaps (users in several types collapse through bitmap_or_agg),
    proving the same partial-state re-aggregation the sketch monitors
    use, with zero error.

    Contract: both scopes must equal count(DISTINCT user_id) computed
    directly by the oracle.

    100 TB shape: one shuffle to (group, bucket) — the bucket number
    splits even a billion-id space into bounded 4 KiB bitmaps so no
    single reduce key is hot; per-type and global counts share the
    same partials; persisting the bucket bitmaps gives exact
    incremental distinct (the Count-Min/theta store recipe, error
    -free for integer keys)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("ev_bitmap_v")
    return spark.sql(
        """
        WITH b AS (
          SELECT event_type,
                 bitmap_bucket_number(user_id) AS bk,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM ev_bitmap_v GROUP BY 1, 2
        ),
        per_type AS (
          SELECT event_type AS scope,
                 CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_exact
          FROM b GROUP BY event_type
        ),
        global_buckets AS (
          SELECT bk, bitmap_or_agg(bm) AS bm FROM b GROUP BY bk
        ),
        global_row AS (
          SELECT 'ALL' AS scope,
                 CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_exact
          FROM global_buckets
        )
        SELECT scope, n_exact FROM per_type
        UNION ALL
        SELECT scope, n_exact FROM global_row
        """
    )


@query(
    "map_hof_suite",
    """
    WITH per AS (
      SELECT source, lang, count(*) AS docs, sum(n_chars) AS chars
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, sum(docs) AS total FROM per GROUP BY source)
    SELECT p.source, p.lang,
           CAST(floor(p.chars / p.docs) AS BIGINT) AS avg_chars,
           CAST(floor(1000 * p.docs / t.total) AS BIGINT) AS docs_permille
    FROM per p JOIN tot t USING (source)
    WHERE p.docs >= 2
    """,
)
def map_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map higher-order-function surface completed —
    ``map_zip_with``, ``transform_values``, ``map_filter``,
    ``map_contains_key`` (complementing `map_funcs_priority_profile`'s
    construct/element_at/keys/values row): per source, a lang->docs
    map and a lang->chars map are zipped into avg-chars-per-doc,
    doc counts transform into per-mille shares of the source total,
    and map_filter keeps langs with >= 2 docs — then everything
    EXPLODES back to plain rows so the oracle (which has no map
    types in common with Spark's hash) verifies pure integers.
    Divisions are floor() over exact integers with >= 1/500 integer
    distance, engine-identical.

    100 TB shape: one (source, lang) aggregation, one source-level
    fold to maps (bounded: |langs| entries per source), HOFs evaluate
    JVM-side inside codegen, explode restores row parallelism —
    maps never hold high-cardinality state."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count("*").alias("docs"), F.sum("n_chars").alias("chars")
    )
    folded = per.groupBy("source").agg(
        F.map_from_entries(
            F.collect_list(F.struct("lang", "docs"))
        ).alias("m_docs"),
        F.map_from_entries(
            F.collect_list(F.struct("lang", "chars"))
        ).alias("m_chars"),
        F.sum("docs").alias("total"),
    )
    z = folded.select(
        "source",
        "total",
        F.map_zip_with(
            "m_docs", "m_chars", lambda k, d_, c: F.floor(c / d_)
        ).alias("m_avg"),
        F.transform_values(
            "m_docs", lambda k, v: F.floor(1000 * v / F.col("total"))
        ).alias("m_permille"),
        F.map_filter("m_docs", lambda k, v: v >= 2).alias("m_kept"),
    )
    return (
        z.select(
            "source",
            "m_permille",
            "m_kept",
            F.explode("m_avg").alias("lang", "avg_chars"),
        )
        .filter(F.map_contains_key("m_kept", F.col("lang")))
        .select(
            "source",
            "lang",
            F.col("avg_chars").cast("long").alias("avg_chars"),
            F.element_at("m_permille", F.col("lang"))
            .cast("long")
            .alias("docs_permille"),
        )
    )


@query(
    "stream_bitmap_distinct_monitor",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def stream_bitmap_distinct_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT streaming distinct-count monitoring — the zero-error
    sibling of `stream_theta_audience_monitor`: each micro-batch folds
    to per-(type, bucket) BITMAPS (bitmap_construct_agg over
    bitmap_bit_position) written as the batch's own replay-safe shard;
    all-time distincts come from bitmap_or_agg over shards + popcount,
    never rescanning history.  Bitmap OR is IDEMPOTENT — a replayed
    batch's shard ORs in with no effect even if the shard scheme
    failed — so this store is replay-safe by algebra, not just by
    overwrite discipline (stronger than the additive Count-Min/theta
    stores).  The price vs sketches: state scales with the true id
    range (32k ids per 4 KiB bucket), the right trade for integer
    keys below ~10^10.

    Contract: the folded store's counts hash-match exact
    count(DISTINCT) from the batch table — no error bound needed.

    100 TB shape: per batch one (type, bucket) aggregation; the store
    grows by bucket rows per batch and compacts by the same OR
    (idempotent, crash-safe to re-run); the read-side merge is one
    key shuffle of 4 KiB values."""
    from flo_spark.queries import _events_stream, scratch_dir

    tmp = scratch_dir("flo_bitmap_monitor_")
    store = f"{tmp}/store"

    def fold(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy(
                "event_type",
                F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            )
            .agg(
                F.expr(
                    "bitmap_construct_agg(bitmap_bit_position(user_id))"
                ).alias("bm")
            )
            .write.mode("overwrite")
            .parquet(f"{store}/batch={batch_id}")
        )

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("bitmap monitor stream did not drain")
    shards = spark.read.parquet(f"{store}/batch=*")
    return (
        shards.groupBy("event_type", "bk")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct")
        )
    )


@query(
    "collation_case_insensitive_stats",
    """
    WITH mixed AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
               AS lang_mixed,
             n_chars
      FROM documents
    )
    SELECT lower(lang_mixed) AS lang,
           CASE lower(lang_mixed)
             WHEN 'en' THEN 'english' WHEN 'de' THEN 'german'
             WHEN 'fr' THEN 'french' WHEN 'es' THEN 'spanish'
             WHEN 'zh' THEN 'chinese' ELSE 'other' END AS lang_name,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM mixed
    GROUP BY lower(lang_mixed)
    """,
)
def collation_case_insensitive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATIONS: comparison semantics carried by the TYPE
    (``COLLATE UTF8_LCASE``) instead of smeared through lower() calls
    — grouping AND joining match case-insensitively while the planner
    still hashes/broadcasts normally.  A mixed-case language code
    (upper-cased on even doc_ids) groups under the collated column,
    and a 5-row UPPERCASE lookup dim joins onto it across case — both
    would silently fragment under binary collation.

    The group representative under a case-insensitive collation is
    whichever casing the engine saw first — nondeterministic — so the
    output key is normalized (lower + cast back to binary collation)
    before hashing; the oracle replays with lower() grouping, which is
    the semantic the collation subsumes.

    100 TB shape: collation is scan/shuffle-neutral (hash of the
    collation key), so this costs exactly what binary grouping costs —
    versus the lower()-everywhere rewrite which re-derives the
    expression per use site and blocks stats-based pruning on the
    original column."""
    d = load(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed"),
        "n_chars",
    )
    dim = spark.createDataFrame(
        [
            ("EN", "english"),
            ("DE", "german"),
            ("FR", "french"),
            ("ES", "spanish"),
            ("ZH", "chinese"),
        ],
        "code string, lang_name string",
    )
    grouped = (
        mixed.groupBy(F.collate("lang_mixed", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    joined = grouped.join(
        F.broadcast(dim),
        F.col("k") == F.collate("code", "UTF8_LCASE"),
        "left",
    )
    return joined.select(
        F.collate(F.lower("k"), "UTF8_BINARY").alias("lang"),
        F.coalesce("lang_name", F.lit("other")).alias("lang_name"),
        "n_docs",
        "sum_chars",
    )

@query(
    "multimodal_qoi_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 128)) AS i FROM documents
    ),
    p AS (
      SELECT doc_id, i,
             (doc_id * 3 + i // 4) % 256 AS v,
             (i % 32 = 31) AS mark
      FROM s
    ),
    rgb AS (
      SELECT doc_id,
             CASE WHEN mark THEN 250 ELSE v END AS r,
             CASE WHEN mark THEN 13
                  WHEN i < 64 THEN v ELSE (v * 7) % 256 END AS g,
             CASE WHEN mark THEN 77
                  WHEN i < 64 THEN v ELSE (v * 13) % 256 END AS b
      FROM p
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r + g + b) AS BIGINT) AS sum_rgb
    FROM rgb GROUP BY doc_id
    """,
)
def multimodal_qoi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL QOI round trip, hash-checked: per document a 16x8 RGB
    image encodes through the actual QOI container (qoiformat.org
    public spec) and decodes back through ``decode_image``; summing
    the recovered channels must reproduce the generating formula.

    The image is built to hit every QOI op: a gray first half in
    width-4 plateaus (RUN inside a plateau, wrapped +-1 DIFF at each
    step), a color-separated second half with per-step channel deltas
    of +1/+7/+13 (LUMA), fixed marker pixels every 32 px (large jumps
    = RGB ops; their recurrence = INDEX hits on the 64-entry running
    palette).  A defect anywhere in run folding, the wraparound diff
    arithmetic, the luma pack, or the index hash breaks the hash.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle (the groupBy is
    batch-local by construction: each doc's pixels never leave its
    batch), binary payloads opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_qoi

    W, H = 16, 8

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_rgb": []}
            for doc_id in pdf.doc_id:
                v = (int(doc_id) * 3 + i // 4) % 256
                r = v.copy()
                g = np.where(i < 64, v, (v * 7) % 256)
                b = np.where(i < 64, v, (v * 13) % 256)
                mark = i % 32 == 31
                r[mark], g[mark], b[mark] = 250, 13, 77
                img = np.stack([r, g, b], axis=1).astype(np.uint8)
                got = decode_image(encode_qoi(img.reshape(H, W, 3)))
                out["doc_id"].append(int(doc_id))
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_rgb"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_rgb long"
    )

@query(
    "kcore_copurchase_peel",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT lo AS src, hi AS dst FROM e
      UNION ALL
      SELECT hi AS src, lo AS dst FROM e
    ),
    d1 AS (SELECT src AS n, count(*) AS deg FROM sym GROUP BY src),
    a1 AS (SELECT n FROM d1 WHERE deg >= 3),
    d2 AS (
      SELECT s.src AS n, count(*) AS deg
      FROM sym s
      JOIN a1 x ON x.n = s.src
      JOIN a1 y ON y.n = s.dst
      GROUP BY s.src
    ),
    a2 AS (SELECT n FROM d2 WHERE deg >= 3),
    d3 AS (
      SELECT s.src AS n, count(*) AS deg
      FROM sym s
      JOIN a2 x ON x.n = s.src
      JOIN a2 y ON y.n = s.dst
      GROUP BY s.src
    ),
    a3 AS (SELECT n, deg FROM d3 WHERE deg >= 3)
    SELECT CAST(n AS BIGINT) AS part_id, CAST(deg AS BIGINT) AS degree
    FROM a3
    """,
)
def kcore_copurchase_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core peeling on the part co-purchase graph (the
    ``triangle_count_copurchase`` / ``community_label_propagation``
    edge set): three synchronous peel rounds — recompute every
    surviving node's degree over the survivor-induced subgraph, drop
    nodes with degree < 3 — the Matula-Beck / Batagelj-Zaversnik
    k-core algorithm truncated to a fixed round count so the result
    is a deterministic integer relation (full convergence is
    data-dependent; 3 rounds is the contract, and each extra round is
    the same plan shape).  Output: the nodes still alive after round
    3 with their round-3 degree.

    The oracle replays the identical peel as chained CTEs — two
    independent evaluations of one exact integer algorithm.

    100 TB shape: per round TWO semi-join-shaped hash joins (edges x
    alive on src, x alive on dst — both keyed shuffles on node id, no
    broadcast of anything corpus-scale) + one degree count; the edge
    frame is persisted once and reused across rounds; deep peeling
    would add localCheckpoint lineage cuts (operators/graph.py
    discipline).  Reference scope: flo has no graph surface —
    north-star extension (SURVEY §2 Part B)."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi")
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("lo", "hi")
    )
    sym = (
        e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        .unionAll(e.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
        .persist()
    )
    deg = sym.groupBy(F.col("src").alias("n")).agg(F.count("*").alias("deg"))
    alive = deg.filter(F.col("deg") >= 3).select("n")
    for _ in range(2):
        deg = (
            sym.join(alive.withColumnRenamed("n", "src"), "src")
            .join(alive.withColumnRenamed("n", "dst"), "dst")
            .groupBy(F.col("src").alias("n"))
            .agg(F.count("*").alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= 3).select("n")
    return deg.join(alive, "n").select(
        F.col("n").cast("long").alias("part_id"),
        F.col("deg").cast("long").alias("degree"),
    )

@query(
    "target_encoding_loo_nation",
    """
    WITH oc AS (
      SELECT o.o_orderkey, c.c_nationkey AS nation,
             CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    w AS (
      SELECT o_orderkey, nation, x,
             sum(x) OVER (PARTITION BY nation) AS s,
             count(*) OVER (PARTITION BY nation) AS n
      FROM oc
    )
    SELECT o_orderkey, CAST(nation AS INT) AS nation,
           CASE WHEN n > 1
                THEN floor(CAST(s - x AS DOUBLE) / (n - 1) + 0.5) / 10000.0
           END AS loo_enc
    FROM w
    """,
)
def target_encoding_loo_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of the customer nation by order
    value — the categorical-feature encoder that does NOT leak the
    row's own label: each order's encoding is the mean o_totalprice
    of every OTHER order in its nation, (S_nation - x_i)/(n-1).
    Computed on the exact scaled-long grid (the ``money_avg``
    discipline): integer window sums, one IEEE division of exact
    integers per row, half-up to 4dp — identical on both engines
    where a double-sum fold would drift.  Single-member groups encode
    NULL (no peers, no estimate) rather than a leaked self-mean.

    100 TB shape: one keyed join (orders x customer on custkey — both
    scale with SF, so NO broadcast hint; AQE picks the strategy) and
    one window shuffle on the 25-value nation key; nothing collects.
    At real scale the nation window is skew-prone (25 groups), so the
    production variant would compute (S, n) per nation with a
    groupBy (map-side combinable, 25-row result) and broadcast-join
    it back — same integers, same result; the window form is used
    here because the per-row subtraction IS the LOO point.
    Reference scope: flo has no relational surface — north-star
    extension (SURVEY §2 Part B)."""
    oc = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            F.col("c_nationkey").cast("int").alias("nation"),
            money_scaled(F.col("o_totalprice")).alias("x"),
        )
    )
    w = Window.partitionBy("nation")
    s = F.sum("x").over(w)
    n = F.count(F.lit(1)).over(w)
    return oc.select(
        "o_orderkey",
        "nation",
        F.when(
            n > 1,
            F.floor((s - F.col("x")).cast("double") / (n - 1) + F.lit(0.5))
            / F.lit(10000.0),
        ).alias("loo_enc"),
    )

@query(
    "pmi_collocations_topk",
    """
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    uni AS (SELECT unnest(ws) AS w FROM toks),
    cu AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM uni),
    big AS (
      SELECT s['w1'] AS w1, s['w2'] AS w2
      FROM (
        SELECT unnest(list_transform(
                 generate_series(1, len(ws) - 1),
                 i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS s
        FROM toks WHERE len(ws) > 1
      )
    ),
    nb AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM big),
    cb AS (
      SELECT w1, w2, count(*) AS cxy FROM big
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT cb.w1, cb.w2, CAST(cb.cxy AS BIGINT) AS n_pair,
           CAST((CAST(10000 AS HUGEINT) * cb.cxy * nu.n * nu.n)
                // (nb.n * c1.c * c2.c) AS BIGINT) AS lift_x1e4
    FROM cb
    JOIN cu c1 ON c1.w = cb.w1
    JOIN cu c2 ON c2.w = cb.w2
    CROSS JOIN nu CROSS JOIN nb
    ORDER BY lift_x1e4 DESC, w1, w2 LIMIT 50
    """,
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information over the
    corpus — the classic Church-Hanks association measure, kept EXACT
    by reporting the PMI's argument (the lift) on the 1e-4 integer
    grid instead of its log: lift = P(xy) / (P(x)P(y)) =
    c_xy*N_uni^2 / (N_bi*c_x*c_y), computed in decimal(38,0)/HUGEINT
    (the products pass 2^63) with truncating integral division — log
    is monotone, so the top-k and ordering are PMI's own.  Support
    pruning (c_xy >= 5) kills the hapax pairs that dominate raw PMI.

    100 TB shape: bigram formation is shuffle-free scan-stage
    arithmetic (slice+zip on the token array — pairs never travel as
    a self-join); then one (w1,w2) count shuffle with map-side
    combine, support-pruned BEFORE the two vocabulary joins; the two
    corpus totals are 1-row frames (broadcast by construction); final
    top-50 compiles to TakeOrderedAndProject, never a global sort.
    Reference scope: flo has no text surface — north-star extension
    (LLM-pipeline family, SURVEY §2 Part B)."""
    toks = load(spark, sf_dir, "documents").select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("ws")
    )
    uni = toks.select(F.explode("ws").alias("w"))
    cu = uni.groupBy("w").agg(F.count("*").alias("c"))
    nu = uni.agg(F.count("*").cast("decimal(38,0)").alias("nu"))
    big = (
        toks.filter(F.size("ws") > 1)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                    F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    nb = big.agg(F.count("*").cast("decimal(38,0)").alias("nb"))
    cb = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= 5)
    )
    c1 = cu.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = cu.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    joined = (
        cb.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
    )
    out = joined.select(
        "w1",
        "w2",
        F.col("cxy").cast("long").alias("n_pair"),
        F.expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * CAST(cxy AS DECIMAL(38,0))"
            " * nu * nu) DIV (nb * CAST(c1 AS DECIMAL(38,0))"
            " * CAST(c2 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("lift_x1e4"),
    )
    return out.orderBy(
        F.col("lift_x1e4").desc(), "w1", "w2"
    ).limit(50)

@query(
    "transpose_quantity_buckets",
    """
    WITH b AS (
      SELECT CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity <= 30 THEN 'mid'
                  ELSE 'high' END AS bucket,
             CAST(l_quantity AS BIGINT) AS qty, l_partkey
      FROM lineitem
    ),
    a AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(qty) AS BIGINT) AS sum_qty,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
      FROM b GROUP BY bucket
    )
    SELECT 'n_items' AS key,
           max(CASE WHEN bucket = 'high' THEN n_items END) AS high,
           max(CASE WHEN bucket = 'low' THEN n_items END) AS low,
           max(CASE WHEN bucket = 'mid' THEN n_items END) AS mid
    FROM a
    UNION ALL
    SELECT 'sum_qty',
           max(CASE WHEN bucket = 'high' THEN sum_qty END),
           max(CASE WHEN bucket = 'low' THEN sum_qty END),
           max(CASE WHEN bucket = 'mid' THEN sum_qty END)
    FROM a
    UNION ALL
    SELECT 'n_parts',
           max(CASE WHEN bucket = 'high' THEN n_parts END),
           max(CASE WHEN bucket = 'low' THEN n_parts END),
           max(CASE WHEN bucket = 'mid' THEN n_parts END)
    FROM a
    """,
)
def transpose_quantity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``DataFrame.transpose`` — the measures-as-rows pivot
    of a summary frame (index values become columns, lexically
    ordered; the original column names land in ``key``).  Quantity
    buckets are derived (low/mid/high over the uniform 1..50 domain),
    so every column exists at every SF and the transposed schema is
    stable; all measures share LONG, the least-common-type rule
    transpose enforces.  The oracle writes the transpose out longhand
    as a conditional-aggregation UNION — same relation, no transpose
    primitive needed.

    100 TB shape: the corpus-scale work is the 3-group aggregate
    (map-side combinable, one shuffle of partials); transpose itself
    runs on the 3x4 summary — a driver-sized frame by construction
    (transpose collects the index column internally, which is why it
    must only ever see pre-aggregated inputs; pinning that discipline
    is the point of this entry)."""
    b = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") <= 30, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_partkey",
    )
    a = b.groupBy("bucket").agg(
        F.count("*").alias("n_items"),
        F.sum("qty").alias("sum_qty"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return a.transpose("bucket")

@query(
    "holt_winters_seasonal",
    """
    WITH RECURSIVE e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    bnd AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM bnd),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt,
             row_number() OVER (ORDER BY h.hour) AS rn
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    r AS (
      SELECT rn, hour, cnt,
             CAST(cnt * 16 AS BIGINT) AS l,
             CAST(0 AS BIGINT) AS b,
             [CAST(0 AS BIGINT)] AS seas
      FROM c WHERE rn = 1
      UNION ALL
      SELECT c.rn, c.hour, c.cnt,
        CASE WHEN r.rn < 24 THEN CAST(c.cnt * 16 AS BIGINT)
             ELSE CAST(r.l + r.b
                       + (c.cnt * 16 - r.seas[1] - (r.l + r.b)) // 4
                  AS BIGINT) END,
        CASE WHEN r.rn < 24 THEN CAST(0 AS BIGINT)
             ELSE CAST(r.b + ((r.l + r.b
                       + (c.cnt * 16 - r.seas[1] - (r.l + r.b)) // 4
                       - r.l) - r.b) // 8 AS BIGINT) END,
        CASE WHEN r.rn < 24 THEN list_append(r.seas, CAST(0 AS BIGINT))
             ELSE list_append(list_slice(r.seas, 2, 24),
                  CAST(r.seas[1]
                       + (c.cnt * 16
                          - (r.l + r.b
                             + (c.cnt * 16 - r.seas[1] - (r.l + r.b)) // 4)
                          - r.seas[1]) // 16 AS BIGINT)) END
      FROM r JOIN c ON c.rn = r.rn + 1
    )
    SELECT hour, CAST(cnt AS BIGINT) AS cnt,
           l AS level_x16, b AS trend_x16,
           seas[len(seas)] AS season_x16,
           CASE WHEN len(seas) = 24
                THEN CAST(l + b + seas[1] AS BIGINT) END AS forecast_x16
    FROM r
    """,
)
def holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE Holt-Winters (triple-exponential) smoothing of the
    hourly event rate with a 24-hour season — the seasonal completion
    of ``holt_linear_trend`` — in EXACT scale-16 fixed point
    (alpha = 1/4, beta = 1/8, gamma = 1/16, truncating division):

        l_t = l' + b' + (16*y_t - s_{t-24} - (l' + b')) div 4
        b_t = b' + ((l_t - l') - b') div 8
        s_t = s_{t-24} + (16*y_t - l_t - s_{t-24}) div 16

    seeded for t <= 24 with l_t = 16*y_t, b_t = 0, s_t = 0; the
    one-step forecast l_t + b_t + s_{t+1-24} exists once a full
    season is buffered.  The oracle replays the identical integers
    with a RECURSIVE CTE whose state carries the 24-slot seasonal
    ring as a LIST column — bit-identical across engines where a
    float Holt-Winters drifts per step.

    100 TB shape: as holt_linear_trend — corpus-scale work is the
    hourly pre-aggregation (one shuffle); the recurrence is
    inherently sequential (truncating division breaks linearity, the
    documented trade for exactness) and folds the tiny dense spine
    in one applyInPandas task."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )

    def tdiv(a: int, d: int) -> int:
        # truncate toward zero, matching SQL integer division
        return a // d if a >= 0 else -((-a) // d)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        pdf = pdf.sort_values("hour").reset_index(drop=True)
        level = trend = 0
        seas: deque[int] = deque()
        ls, bs, ss, fs = [], [], [], []
        for t, cnt in enumerate(pdf["cnt"], 1):
            y = int(cnt) * 16
            if t <= 24:
                level, trend, s = y, 0, 0
                seas.append(0)
            else:
                sa = seas[0]
                prior = level + trend
                new_level = prior + tdiv(y - sa - prior, 4)
                trend = trend + tdiv((new_level - level) - trend, 8)
                s = sa + tdiv(y - new_level - sa, 16)
                level = new_level
                seas.popleft()
                seas.append(s)
            ls.append(level)
            bs.append(trend)
            ss.append(s)
            fs.append(level + trend + seas[0] if len(seas) == 24 else None)
        pdf["level_x16"] = ls
        pdf["trend_x16"] = bs
        pdf["season_x16"] = ss
        pdf["forecast_x16"] = pd.array(fs, dtype="Int64")
        return pdf[
            ["hour", "cnt", "level_x16", "trend_x16", "season_x16",
             "forecast_x16"]
        ]

    return (
        c.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "hour timestamp, cnt long, level_x16 long, trend_x16 long, "
            "season_x16 long, forecast_x16 long",
        )
    )

@query(
    "stream_stream_left_outer_attribution",
    """
    WITH m AS (
      SELECT least(max(CASE WHEN event_type = 'click' THEN ts END),
                   max(CASE WHEN event_type = 'purchase' THEN ts END))
               AS mx
      FROM events
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.user_id, c.click_id, p.purchase_id, c.cts
      FROM c LEFT JOIN p
        ON p.user_id = c.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 30 MINUTE
    )
    SELECT j.user_id, j.click_id, j.purchase_id
    FROM j, m WHERE j.cts < m.mx - INTERVAL 95 MINUTE
    """,
)
def stream_stream_left_outer_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the semantic the
    inner-join entry can't show: clicks with NO purchase within 30
    minutes must still emit, null-padded, and they can only do so
    once the watermark PROVES no match can still arrive (state
    eviction time, watermark - 30 min past the click).  Inner matches
    emit in the batch the match arrives; the null pads emit in the
    post-watermark flush batch.

    The drained result is then restricted — identically on both
    engines — to clicks older than the GLOBAL watermark's final
    position minus margin: Spark's multi-input watermark is the MIN
    over both sides' per-column watermarks (least(max click_ts,
    max purchase_ts) - 1h), so the cutoff is least(...) - 95 min —
    the region where the final watermark provably passed every
    click's +30 min match window and pad emission is deterministic.
    Clicks in the stream's trailing watermark window are NOT
    comparable (the stream hasn't decided them yet — that's watermark
    semantics, not a defect) and are excluded by the same cutoff in
    the oracle.

    100 TB shape: join state is O(watermark window), not O(stream) —
    clicks evict 90 min after their event time, purchases after 60 —
    which is the property that makes an unbounded stream-stream outer
    join runnable at all; the cutoff frame is 1-row (broadcast by
    construction)."""
    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts >= click_ts "
            "AND p_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select("user_id", "click_id", "purchase_id", "click_ts")
    res = run_to_memory(
        joined, await_new=False, output_mode="append", shuffle_partitions=8
    )
    mx = load(spark, sf_dir, "events").agg(
        F.least(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        ).alias("mx")
    )
    return (
        res.crossJoin(F.broadcast(mx))
        .filter(F.col("click_ts") < F.col("mx") - F.expr("INTERVAL 95 MINUTES"))
        .select("user_id", "click_id", "purchase_id")
    )

@query(
    "proximity_join_grid_2d",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           a.user_id AS a_user, b.user_id AS b_user
    FROM p a JOIN p b
      ON a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 7200000000
     AND abs(a.value - b.value) <= 20.0
    """,
)
def proximity_join_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D proximity self-join — purchases within 2 hours AND within
    20.0 in value of each other — rewritten as an EQUI-join on a 2-D
    grid cell (time bin x value bin, bin width = threshold in each
    dimension): the right side sits in its home cell, the left side
    probes the 3x3 neighborhood, and the exact predicate filters the
    candidates.  Each qualifying pair matches EXACTLY once (the
    right row's home cell is unique, so only one of the left row's 9
    probes can land on it) — no distinct pass needed.  Time is
    compared in exact integer microseconds (epoch_us // bin on both
    engines; Spark's unix_timestamp would FLOOR to seconds and
    disagree at boundaries), value in IEEE doubles both engines
    evaluate identically.  The oracle runs the plain theta join.

    100 TB shape: this is the spatial-join pattern — the theta join
    is a nested loop (the 100 TB killer, what interval_join_binned
    fixes in 1-D); the grid rewrite is a keyed shuffle on cell id
    with 9x left amplification, candidate count bounded by cell
    occupancy instead of |L|x|R|.  Plan-pinned: no
    BroadcastNestedLoopJoin/CartesianProduct."""
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts)").alias("us"),
            "value",
        )
    )
    TB = 7200000000  # 2 h in microseconds == the time threshold
    VB = 20.0
    right = p.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        F.col("value").alias("b_value"),
        F.expr(f"us div {TB}").alias("tcell"),
        F.floor(F.col("value") / VB).alias("vcell"),
    )
    left = (
        p.select(
            F.col("event_id").alias("a_id"),
            F.col("user_id").alias("a_user"),
            F.col("us").alias("a_us"),
            F.col("value").alias("a_value"),
            F.explode(
                F.expr(f"array(us div {TB} - 1, us div {TB}, us div {TB} + 1)")
            ).alias("tcell"),
        )
        .withColumn(
            "vcell",
            F.explode(
                F.array(
                    F.floor(F.col("a_value") / VB) - 1,
                    F.floor(F.col("a_value") / VB),
                    F.floor(F.col("a_value") / VB) + 1,
                )
            ),
        )
    )
    return (
        left.join(right, ["tcell", "vcell"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= TB)
            & (F.abs(F.col("a_value") - F.col("b_value")) <= VB)
        )
        .select("a_id", "b_id", "a_user", "b_user")
    )

@query(
    "chi_square_crosstab_audit",
    """
    WITH base AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) % 7 AS dowi
      FROM events
    ),
    o AS (
      SELECT event_type, dowi, CAST(count(*) AS HUGEINT) AS obs
      FROM base GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS rt FROM base GROUP BY 1),
    c AS (SELECT dowi, CAST(count(*) AS HUGEINT) AS ct FROM base GROUP BY 1),
    n AS (SELECT CAST(count(*) AS HUGEINT) AS nt FROM base)
    SELECT o.event_type, CAST(o.dowi AS BIGINT) AS dowi,
           CAST(o.obs AS BIGINT) AS observed,
           CAST((10000 * r.rt * c.ct) // n.nt AS BIGINT) AS expected_x1e4,
           CAST((1000000 * (o.obs * n.nt - r.rt * c.ct)
                         * (o.obs * n.nt - r.rt * c.ct))
                // (r.rt * c.ct * n.nt) AS BIGINT) AS contrib_x1e6
    FROM o JOIN r USING (event_type) JOIN c USING (dowi) CROSS JOIN n
    """,
)
def chi_square_crosstab_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the event_type x day-of-week
    contingency table — 'is traffic mix stable across the week?', the
    classic data-drift check — with every statistic EXACT on an
    integer grid: expected counts as (r*c*1e4) div N and per-cell
    chi-square contributions as (O*N - r*c)^2 * 1e6 div (r*c*N),
    computed in decimal(38,0)/HUGEINT (the squared numerators pass
    2^63 at scale; the q7 lesson applied to hypothesis testing — no
    float expected-count folds).  Day-of-week is derived portably as
    epoch-days mod 7 (0 = Thursday): Spark and DuckDB disagree on
    dayofweek() numbering, integer arithmetic can't.

    100 TB shape: three map-side-combinable aggregates over ONE scan
    lineage (cells, row totals, col totals — each one shuffle of
    partials); the totals frames are 5/7/1 rows, broadcast by AQE;
    contributions are scan-free arithmetic on the joined cells."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(unix_micros(ts) div 86400000000) % 7").alias("dowi"),
    )
    D = "decimal(38,0)"
    o = base.groupBy("event_type", "dowi").agg(
        F.count("*").cast(D).alias("obs")
    )
    r = base.groupBy("event_type").agg(F.count("*").cast(D).alias("rt"))
    c = base.groupBy("dowi").agg(F.count("*").cast(D).alias("ct"))
    n = base.agg(F.count("*").cast(D).alias("nt"))
    return (
        o.join(r, "event_type")
        .join(c, "dowi")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dowi").cast("long").alias("dowi"),
            F.col("obs").cast("long").alias("observed"),
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * rt * ct) DIV nt"
                " AS BIGINT)"
            ).alias("expected_x1e4"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (obs * nt - rt * ct) * (obs * nt - rt * ct))"
                " DIV (rt * ct * nt) AS BIGINT)"
            ).alias("contrib_x1e6"),
        )
    )

@query(
    "tfidf_cosine_pairs_topk",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS HUGEINT) AS tf
      FROM (SELECT doc_id, unnest(ws) AS w FROM toks) GROUP BY 1, 2
    ),
    df AS (SELECT w, CAST(count(*) AS HUGEINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
    wt AS (
      SELECT tf.doc_id, tf.w, tf.tf * ((1000000 * n.n) // df.df) AS wt
      FROM tf JOIN df USING (w) CROSS JOIN n
    ),
    nrm AS (SELECT doc_id, sum(wt * wt) AS nrm FROM wt GROUP BY doc_id),
    rare AS (SELECT w FROM df WHERE df BETWEEN 2 AND 10),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id
      JOIN rare r ON r.w = a.w
    ),
    dots AS (
      SELECT c.da, c.db, sum(x.wt * y.wt) AS dot
      FROM cand c
      JOIN wt x ON x.doc_id = c.da
      JOIN wt y ON y.doc_id = c.db AND y.w = x.w
      GROUP BY 1, 2
    )
    SELECT d.da AS doc_a, d.db AS doc_b,
           CAST(floor(10000 * CAST(d.dot AS DOUBLE)
                      / (sqrt(CAST(na.nrm AS DOUBLE))
                         * sqrt(CAST(nb.nrm AS DOUBLE))) + 0.5)
                AS BIGINT) AS cos_x1e4
    FROM dots d
    JOIN nrm na ON na.doc_id = d.da
    JOIN nrm nb ON nb.doc_id = d.db
    ORDER BY cos_x1e4 DESC, doc_a, doc_b LIMIT 50
    """,
)
def tfidf_cosine_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-space document similarity: top-50 TF-IDF cosine pairs —
    the sparse-retrieval complement of BM25 search and the embedding
    cosine entries.  Kept EXACT until the last step: integer idf on
    the 1e-6 grid ((1e6*N) div df — a libm-free monotone inverse
    frequency, so no ln() ulp skew across engines), exact
    decimal(38,0)/HUGEINT dot products and norms (weights square past
    2^63), and one final IEEE sqrt+divide — both correctly rounded
    per IEEE 754, hence bit-identical — onto the 1e-4 grid.

    Candidate pairs come from an inverted index restricted to RARE
    words (2 <= df <= 10): the prefix-filter trick — frequent words
    generate quadratic candidate blowup and contribute least to
    cosine ranking; rare co-occurrence is the similarity signal.

    100 TB shape: tf/df/norms are map-side-combinable aggregates; the
    candidate generator shuffles 8-byte-hashable word keys with
    df-bounded fanout (a df<=10 word yields <=45 pairs); the exact
    verify join ships weight vectors only to CANDIDATE pairs (the
    minhash-verify discipline — bounded by candidate count, never
    all-pairs); final top-50 is TakeOrderedAndProject."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("ws")
    )
    D = "decimal(38,0)"
    tf = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast(D).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast(D).alias("df"))
    n = load(spark, sf_dir, "documents").agg(
        F.count("*").cast(D).alias("n")
    )
    wt = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            F.expr(
                "tf * ((CAST(1000000 AS DECIMAL(38,0)) * n) DIV df)"
            ).alias("wt"),
        )
    )
    nrm = wt.groupBy("doc_id").agg(F.expr("sum(wt * wt)").alias("nrm"))
    rare = df.filter((F.col("df") >= 2) & (F.col("df") <= 10)).select("w")
    rtf = tf.join(rare, "w").select("w", "doc_id")
    a, b = rtf.alias("a"), rtf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    x = wt.select(
        F.col("doc_id").alias("da"), F.col("w").alias("w"),
        F.col("wt").alias("wx"),
    )
    y = wt.select(
        F.col("doc_id").alias("db"), F.col("w").alias("w"),
        F.col("wt").alias("wy"),
    )
    dots = (
        cand.join(x, "da")
        .join(y, ["db", "w"])
        .groupBy("da", "db")
        .agg(F.expr("sum(wx * wy)").alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.expr(
                "CAST(floor(10000 * CAST(dot AS DOUBLE)"
                " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"
                " + 0.5) AS BIGINT)"
            ).alias("cos_x1e4"),
        )
    )
    return out.orderBy(F.col("cos_x1e4").desc(), "doc_a", "doc_b").limit(50)

@query(
    "stream_ivm_signed_deltas",
    """
    SELECT user_id,
           CAST(sum(CASE event_type WHEN 'purchase' THEN 1
                                    WHEN 'error' THEN -1 END) AS BIGINT)
             AS net_rows,
           CAST(sum(CASE event_type WHEN 'purchase' THEN 1 ELSE -1 END
                    * CAST(floor(value * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS net_value_x1e4
    FROM events
    WHERE event_type IN ('purchase', 'error')
    GROUP BY user_id
    """,
)
def stream_ivm_signed_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with RETRACTIONS — the
    differential-dataflow/DBSP pattern: the change stream carries
    SIGNED deltas (purchase = insert +value, error = retraction
    -value), each micro-batch folds to per-user partial sums (which
    can be NEGATIVE — the property an append-only monitor never
    exercises), partials persist as replay-safe per-batch shards, and
    the live view derives by merging shards additively.  The view can
    go DOWN; correctness rests on the aggregate being a commutative
    GROUP (sum/count — invertible), which is precisely the class IVM
    can maintain without rescanning: MIN/MAX are deliberately absent
    (a retraction of the current min forces a rescan — the documented
    boundary of delta maintenance).

    Contract: the shard-merged view hash-matches the batch signed
    aggregate over the same events.  Value deltas ride the exact
    scaled-long grid (money discipline), so retraction is exact
    cancellation, not float residue.

    100 TB shape: per batch one map-side-combinable signed partial
    aggregation (shuffle of per-user partials); the store grows by
    batch-partial rows and compacts additively (same scheme as
    compact_countmin_store); the read-side merge is one key shuffle.
    Reference scope: flo consumers rebuild views by replaying the
    log (README.md:8-19); signed-delta folding is the engine-side
    shortcut — north-star extension."""
    from flo_spark.queries import _events_stream, scratch_dir

    tmp = scratch_dir("flo_ivm_")
    store = f"{tmp}/store"

    def fold(batch: DataFrame, batch_id: int) -> None:
        (
            batch.filter(F.col("event_type").isin("purchase", "error"))
            .select(
                "user_id",
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(-1)
                .alias("sgn"),
                money_scaled(F.col("value")).alias("v"),
            )
            .groupBy("user_id")
            .agg(
                F.sum("sgn").alias("d_rows"),
                F.sum(F.col("sgn") * F.col("v")).alias("d_value"),
            )
            .write.mode("overwrite")
            .parquet(f"{store}/batch={batch_id}")
        )

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("ivm stream did not drain")
    return (
        spark.read.parquet(f"{store}/batch=*")
        .groupBy("user_id")
        .agg(
            F.sum("d_rows").cast("long").alias("net_rows"),
            F.sum("d_value").cast("long").alias("net_value_x1e4"),
        )
    )

@query(
    "gdpr_forget_compaction",
    """
    WITH b AS (
      SELECT doc_id, text,
             CAST(doc_id % 20 AS BIGINT) AS uid,
             CAST(doc_id % 2 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 300
    ),
    cnt AS (SELECT partition, count(*) AS n FROM b GROUP BY partition),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    ),
    env AS (
      SELECT b.uid, b.text,
             off.off + row_number() OVER (PARTITION BY b.partition
                                          ORDER BY b.doc_id) AS counter
      FROM b JOIN off USING (partition)
    )
    SELECT uid,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(min(counter) AS BIGINT) AS min_counter,
           CAST(max(counter) AS BIGINT) AS max_counter
    FROM env WHERE uid % 7 <> 3
    GROUP BY uid
    """,
)
def gdpr_forget_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the append-only native segment store —
    the deletion primitive an immutable log needs: subjects are
    forgotten by appending TOMBSTONE events
    (``/system/tombstones/<uid>``, the log's own mechanism — flo has
    no in-place mutation, segment/mod.rs append-only contract), and a
    COMPACTION pass rewrites the segment files dropping both the
    subject's events and the applied tombstones — physical erasure,
    not a read-side mask.  Retained events keep their ORIGINAL ids
    (erasure leaves counter gaps; ids are immutable, so gaps are the
    correct observable).  The entry round-trips documents -> native
    ``.events`` segments (+ trailing tombstone batch) -> compaction ->
    native segments -> scan, and aggregates per subject; the oracle
    reproduces the id assignment arithmetic and the forget-set filter
    from the raw table.  Physical erasure (no forgotten payload bytes
    anywhere in the compacted files) is pinned in
    tests/test_flo_segment.py.

    100 TB shape: compaction is read-filter-write over sealed
    segments — distributed at segment granularity by
    write_flo_segments' range-partitioned id ranking (no
    whole-partition task); the tombstone set is an anti-join key
    frame that scales with the forget batch, not the corpus."""
    from flo_spark.operators.produce import assign_event_ids
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.flo_segment import (
        read_flo_segments,
        write_flo_segments,
    )

    tmp = scratch_dir("flo_gdpr_")
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(300)
    users = docs.select(
        F.col("doc_id").alias("ord"),
        (F.col("doc_id") % 20).alias("uid"),
        (F.col("doc_id") % 2 + 1).cast("int").alias("partition"),
        F.concat(
            F.lit("/users/"), (F.col("doc_id") % 20), F.lit("/docs")
        ).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
    )
    tombs = (
        users.filter(F.col("uid") % 7 == 3)
        .select("uid")
        .distinct()
        .select(
            (F.col("uid") + 100000).alias("ord"),
            "uid",
            F.lit(2).cast("int").alias("partition"),
            F.concat(F.lit("/system/tombstones/"), F.col("uid")).alias(
                "namespace"
            ),
            F.lit(None).cast("binary").alias("data"),
        )
    )
    batch = users.unionByName(tombs).select(
        "ord",
        "partition",
        "namespace",
        "data",
        F.lit(None).cast("long").alias("parent_counter"),
        F.lit(None).cast("int").alias("parent_actor"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("ord"))
        ).alias("timestamp"),
    )
    env = assign_event_ids(batch, 0, order_by="ord").drop("ord")
    write_flo_segments(env, f"{tmp}/raw", max_events_per_segment=40)

    ev = read_flo_segments(spark, f"{tmp}/raw")
    forgotten = (
        ev.filter(F.col("namespace").startswith("/system/tombstones/"))
        .select(
            F.element_at(F.split("namespace", "/"), 4).alias("uid")
        )
        .distinct()
    )
    keep = (
        ev.filter(~F.col("namespace").startswith("/system/tombstones/"))
        .withColumn("uid", F.element_at(F.split("namespace", "/"), 3))
        .join(forgotten, "uid", "left_anti")
    )
    write_flo_segments(
        keep.drop("uid"), f"{tmp}/compacted", max_events_per_segment=40
    )
    out = read_flo_segments(spark, f"{tmp}/compacted")
    return (
        out.withColumn(
            "uid", F.element_at(F.split("namespace", "/"), 3).cast("long")
        )
        .groupBy("uid")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(F.decode("data", "utf-8"))).alias("n_chars"),
            F.min("event_counter").alias("min_counter"),
            F.max("event_counter").alias("max_counter"),
        )
    )

@query(
    "schema_evolution_merge_read",
    """
    WITH b AS (
      SELECT doc_id, text, lang, n_chars
      FROM documents ORDER BY doc_id LIMIT 400
    ),
    g AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 0 THEN lang END AS lang,
             CASE WHEN doc_id % 3 = 0 THEN n_chars END AS nc
      FROM b
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(sum(nc) AS BIGINT) AS sum_chars_meta
    FROM g GROUP BY lang
    """,
)
def schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across table generations — the lake-format
    reality that columns ARRIVE over time: generation 1 files carry
    (doc_id, text), generation 2 adds (lang, n_chars), and ONE
    ``mergeSchema`` scan reads both — old files surface the new
    columns as NULL, no rewrite of historical data.  The aggregate
    groups by the evolved column, so the NULL group IS the
    pre-evolution history — visible, not silently dropped.  The
    oracle reproduces the generation split from the raw table.

    100 TB shape: mergeSchema reconciles STRUCTURE from file footers
    (schema union at planning time, not a data pass); per-file reads
    project only the columns that exist — old files pay nothing for
    new columns.  The footer-schema union does scale with file count,
    which is why production tables checkpoint the merged schema in a
    catalog/metastore rather than re-deriving it per query
    (documented trade; the scan itself is unchanged)."""
    from flo_spark.queries import scratch_dir

    tmp = scratch_dir("flo_schemaevo_")
    b = load(spark, sf_dir, "documents").orderBy("doc_id").limit(400)
    gen1 = b.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    gen2 = b.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "text", "lang", "n_chars"
    )
    gen1.write.mode("overwrite").parquet(f"{tmp}/tbl/gen=1")
    gen2.write.mode("overwrite").parquet(f"{tmp}/tbl/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/tbl")
    return merged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum("n_chars").alias("sum_chars_meta"),
    )

@query(
    "vocab_index_encode",
    """
    WITH vocab AS (
      SELECT lang,
             CAST(row_number() OVER (ORDER BY count(*) DESC, lang) - 1
                  AS BIGINT) AS lang_index
      FROM documents GROUP BY lang
    )
    SELECT d.source, v.lang_index, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN vocab v ON v.lang = d.lang
    GROUP BY d.source, v.lang_index
    """,
)
def vocab_index_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical vocabulary indexing — MLlib StringIndexer's
    ``frequencyDesc`` contract as a pure DataFrame program: categories
    rank by (count DESC, value ASC) into dense 0-based ids, and the
    corpus re-encodes by joining the mapping back.  The deterministic
    tie-break is the point — hash-based id assignment would be
    partition-order-dependent and untestable cross-engine.

    100 TB shape: the vocabulary is one map-side-combinable count +
    one window over a |vocab|-sized frame (vocab cardinality, not
    corpus); the encode join auto-broadcasts the mapping.  Fit once,
    apply everywhere — the mapping frame IS the model artifact
    (persist it; re-fitting per query would re-shuffle the corpus)."""
    d = load(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("cnt").desc(), F.col("lang").asc())
    vocab = (
        d.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .select(
            "lang", (F.row_number().over(w) - 1).cast("long").alias("lang_index")
        )
    )
    return (
        d.join(F.broadcast(vocab), "lang")
        .groupBy("source", "lang_index")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "interval_union_sweepline",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM m
    ),
    agg AS (
      SELECT user_id, island, max(e) - min(s) AS covered
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(covered) AS BIGINT) AS covered_us,
           CAST(max(covered) AS BIGINT) AS longest_us
    FROM agg GROUP BY user_id
    """,
)
def interval_union_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals per user — total ONLINE time when every
    event opens a 30-minute presence window and overlaps must not
    double-count — by the sweep-line-as-window construction: running
    max of interval ends over the time-ordered prefix marks island
    starts (start > max end so far = a gap), a running sum of the
    flags numbers the islands, and each island contributes
    max(end) - min(start).  All arithmetic in exact integer
    microseconds (epoch_us) — no float time.

    100 TB shape: ONE hash shuffle on user_id feeding two
    user-partitioned window passes and a two-level aggregation —
    the sort is per-user inside partitions, never global; interval
    count per user bounds window state.  This is the scan-friendly
    form of interval union; an interval tree would be a driver-side
    structure with no distributed analog."""
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("s"),
        (F.expr("unix_micros(ts)") + 1800000000).alias("e"),
    )
    wp = Window.partitionBy("user_id").orderBy("s", "e")
    m = iv.withColumn(
        "pmax", F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    )
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1)
            .otherwise(0)
        ).over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agg = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return agg.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_us"),
        F.max("covered").cast("long").alias("longest_us"),
    )


@query(
    "gaps_islands_event_runs",
    """
    WITH o AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, rn - rnt AS grp, count(*) AS run_len
      FROM o GROUP BY user_id, event_type, rn - rnt
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run_len,
           CAST(sum(run_len) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, event_type
    """,
)
def gaps_islands_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — maximal runs of consecutive same-type
    events per user — via the classic rn-difference construction:
    two row_numbers (one over the user's full sequence, one per
    (user, type)) differ by a constant exactly within a consecutive
    run, so the difference IS the run id.  Deterministic total order
    (ts, event_id) makes run boundaries engine-independent.  Output:
    per (user, type) run count, longest run, event count — the
    session-behavior shape (e.g. N consecutive errors) that plain
    aggregation can't see.

    100 TB shape: one hash shuffle on user_id; both window passes
    and the two aggregations reuse that partitioning (the per-type
    row_number only sub-sorts inside it) — no second corpus
    shuffle."""
    o = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "event_type").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rnt"),
    )
    runs = o.groupBy(
        "user_id", "event_type", (F.col("rn") - F.col("rnt")).alias("grp")
    ).agg(F.count("*").alias("run_len"))
    return runs.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").cast("long").alias("max_run_len"),
        F.sum("run_len").cast("long").alias("n_events"),
    )


@query(
    "benford_leading_digit_audit",
    """
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 10000 + 0.5)
                                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    o AS (SELECT digit, count(*) AS n_obs FROM c GROUP BY digit),
    n AS (SELECT count(*) AS nt FROM c),
    p(digit, p_x1e6) AS (
      VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
             (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)
    )
    SELECT p.digit, CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(p.p_x1e6 AS BIGINT) AS benford_p_x1e6,
           CAST((n.nt * p.p_x1e6) // 10000 AS BIGINT) AS expected_x1e2
    FROM p LEFT JOIN o ON o.digit = p.digit CROSS JOIN n
    """,
)
def benford_leading_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the
    fraud/data-fabrication screen: observed leading-digit counts vs
    the Benford expectation log10(1+1/d).  The leading digit is
    extracted ARITHMETICALLY from the exact scaled-long cents
    (integer-to-string is exact and engine-identical; a double's
    leading digit via log10/formatting is neither), and the
    irrational Benford probabilities enter as shared 1e-6-grid
    literals, so expected counts are exact integer floor products —
    no libm anywhere.  All nine digits emit (LEFT join from the
    probability table), absent digits as zero — an absent digit IS
    the anomaly.

    100 TB shape: one map-side-combinable 9-group count over a
    single pruned column scan; the probability table and the total
    are broadcast by construction."""
    c = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(money_scaled(F.col("o_totalprice")).cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )
    o = c.groupBy("digit").agg(F.count("*").alias("n_obs"))
    n = c.agg(F.count("*").alias("nt"))
    p = spark.createDataFrame(
        [(1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
         (6, 66947), (7, 57992), (8, 51153), (9, 45757)],
        "digit long, p_x1e6 long",
    )
    return (
        p.join(o, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.col("p_x1e6").alias("benford_p_x1e6"),
            F.expr("CAST((nt * p_x1e6) DIV 10000 AS BIGINT)").alias(
                "expected_x1e2"
            ),
        )
    )

@query(
    "pandas_api_on_spark_stats",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(floor((sum(CAST(floor(o_totalprice * 10000 + 0.5)
                                AS BIGINT)) + 50) / 100.0) / 100.0
                AS DOUBLE) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def pandas_api_on_spark_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``) — the third query
    surface after DataFrame and SQL: a pandas-shaped program
    (``groupby`` + ``agg`` + ``nunique`` on a ``ps.DataFrame``) that
    compiles to the SAME distributed plans, proven by hash-matching
    the SQL oracle.  Money stays exact by scaling to cents BEFORE the
    pandas-API fold (the money_sum discipline survives the API
    change — sums run on longs, the rounding happens once at the
    end on the Spark DataFrame).

    100 TB shape: ps operations lower to Catalyst — this groupby is
    the same map-side-combinable aggregate the DataFrame API emits
    (one shuffle of partials; nunique = count distinct expansion).
    The caveat pinned here: ps defaults that pull data to the driver
    (``to_pandas``, implicit default-index attachment) are avoided —
    the frame converts back via ``to_spark()``, never the driver."""
    import pyspark.pandas as ps

    odf = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_custkey",
        money_scaled(F.col("o_totalprice")).alias("cents"),
    )
    pdf = odf.pandas_api()
    g = pdf.groupby("o_orderpriority").agg(
        n_orders=("o_custkey", "count"),
        n_customers=("o_custkey", "nunique"),
        cents=("cents", "sum"),
    )
    out = g.reset_index().to_spark()
    return out.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_customers").cast("long").alias("n_customers"),
        (
            F.floor((F.col("cents") + F.lit(50)) / F.lit(100.0))
            / F.lit(100.0)
        ).alias("sum_price"),
    )

@query(
    "asof_forward_nearest_click",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             CASE WHEN event_type = 'click' THEN event_id END AS cid,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS cus,
             event_type
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT user_id, event_id, us, event_type,
             first_value(cid IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nid,
             first_value(cus IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nus,
             last_value(cid IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
             last_value(cus IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus
      FROM seq
    )
    SELECT user_id, event_id AS purchase_id,
           CASE WHEN nus - us <= 3600000000 THEN nid END AS next_click_id,
           CASE
             WHEN pid IS NULL AND nid IS NULL THEN NULL
             WHEN nid IS NULL THEN pid
             WHEN pid IS NULL THEN nid
             WHEN us - pus <= nus - us THEN pid
             ELSE nid
           END AS nearest_click_id
    FROM w WHERE event_type = 'purchase'
    """,
)
def asof_forward_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD and NEAREST as-of joins — the two directions
    ``asof_last_click_before_purchase`` (backward) doesn't cover:
    for every purchase, the next click strictly after it (capped at
    1 hour — pandas merge_asof direction='forward' + tolerance) and
    the nearest click in either direction (ties break to the earlier
    side, merge_asof direction='nearest' semantics).  Implemented as
    the union-sort construction: one per-user time-ordered sequence,
    forward = first_value IGNORE NULLS over the strict-following
    frame, backward = last_value over the strict-preceding frame —
    no join at all, which also makes 'strictly after' exact (a
    same-instant click is ordered by (ts, event_id) deterministically
    on both engines).  Gaps compare in exact integer microseconds.

    100 TB shape: ONE hash shuffle on user_id; both as-of directions
    and the nearest arbitration ride the same partitioning — versus
    the range-join formulation which shuffles twice and explodes
    candidates.  This is how the engine's as-of family scales: sort
    once per key, answer every direction from the frames."""
    seq = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.expr("unix_micros(ts)").alias("us"),
            "event_type",
            F.when(
                F.col("event_type") == "click", F.col("event_id")
            ).alias("cid"),
            F.when(
                F.col("event_type") == "click", F.expr("unix_micros(ts)")
            ).alias("cus"),
        )
    )
    wp = Window.partitionBy("user_id").orderBy("us", "event_id")
    fol = wp.rowsBetween(1, Window.unboundedFollowing)
    pre = wp.rowsBetween(Window.unboundedPreceding, -1)
    w = seq.select(
        "user_id",
        "event_id",
        "us",
        "event_type",
        F.first("cid", ignorenulls=True).over(fol).alias("nid"),
        F.first("cus", ignorenulls=True).over(fol).alias("nus"),
        F.last("cid", ignorenulls=True).over(pre).alias("pid"),
        F.last("cus", ignorenulls=True).over(pre).alias("pus"),
    )
    return w.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.when(
            F.col("nus") - F.col("us") <= 3600000000, F.col("nid")
        ).alias("next_click_id"),
        F.when(
            F.col("pid").isNull() & F.col("nid").isNull(), F.lit(None)
        )
        .when(F.col("nid").isNull(), F.col("pid"))
        .when(F.col("pid").isNull(), F.col("nid"))
        .when(
            F.col("us") - F.col("pus") <= F.col("nus") - F.col("us"),
            F.col("pid"),
        )
        .otherwise(F.col("nid"))
        .cast("long")
        .alias("nearest_click_id"),
    )


@query(
    "gapfill_locf_interpolate",
    """
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(floor(value * 10000 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    obs AS (SELECT hour, sum(cents) AS v FROM e GROUP BY hour),
    bnd AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM obs),
    spine AS (
      SELECT unnest(generate_series((SELECT h0 FROM bnd),
                                    (SELECT h1 FROM bnd),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    j AS (
      SELECT s.hour, obs.v,
             row_number() OVER (ORDER BY s.hour) AS rn
      FROM spine s LEFT JOIN obs ON obs.hour = s.hour
    ),
    w AS (
      SELECT hour, v, rn,
             last_value(v IGNORE NULLS) OVER
               (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS locf,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS prn,
             first_value(v IGNORE NULLS) OVER
               (ORDER BY rn ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER (ORDER BY rn ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS nrn
      FROM j
    )
    SELECT hour,
           CAST(v AS BIGINT) AS observed_cents,
           CAST(locf AS BIGINT) AS locf_cents,
           CAST(CASE
             WHEN v IS NOT NULL THEN v * 10000
             WHEN locf IS NULL OR nv IS NULL THEN NULL
             ELSE locf * 10000
                  + ((nv - locf) * 10000 * (rn - prn)) // (nrn - prn)
           END AS BIGINT) AS interp_x1e4
    FROM w
    """,
)
def gapfill_locf_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filling of a SPARSE hourly series (hours
    with no purchases are MISSING, not zero) with both standard
    policies: LOCF (last observation carried forward) and LINEAR
    interpolation between the surrounding observations — TimescaleDB
    time_bucket_gapfill + locf()/interpolate() semantics.  All
    arithmetic exact: the metric rides the scaled-long cents grid,
    the interpolation is integer ((v2-v1)*1e4*dt) div span on the
    hour-rank axis, and leading/trailing unbounded regions are NULL
    (no invented data).  IGNORE-NULLS window frames find the
    surrounding observations — no self-join against the observed
    set.

    100 TB shape: corpus-scale work is one hourly pre-aggregation
    shuffle; the spine is bounded by the time range, and all four
    IGNORE-NULLS lookups share one ordered pass.  The global-ordered
    window is the documented trade at the spine's (tiny) scale; a
    sharded deployment would partition the spine by coarse time
    range and stitch boundaries."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("hour", "ts").alias("hour"),
            money_scaled(F.col("value")).alias("cents"),
        )
    )
    obs = e.groupBy("hour").agg(F.sum("cents").alias("v"))
    bnd = obs.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine = bnd.select(
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("hour")
    )
    j = (
        spine.join(obs, "hour", "left")
        .withColumn("rn", F.row_number().over(Window.orderBy("hour")))
    )
    wo = Window.orderBy("rn")
    pre = wo.rowsBetween(Window.unboundedPreceding, 0)
    fol = wo.rowsBetween(0, Window.unboundedFollowing)
    vrn = F.when(F.col("v").isNotNull(), F.col("rn"))
    w = j.select(
        "hour",
        "v",
        "rn",
        F.last("v", ignorenulls=True).over(pre).alias("locf"),
        F.last(vrn, ignorenulls=True).over(pre).alias("prn"),
        F.first("v", ignorenulls=True).over(fol).alias("nv"),
        F.first(vrn, ignorenulls=True).over(fol).alias("nrn"),
    )
    return w.select(
        "hour",
        F.col("v").cast("long").alias("observed_cents"),
        F.col("locf").cast("long").alias("locf_cents"),
        F.when(F.col("v").isNotNull(), F.col("v") * 10000)
        .when(F.col("locf").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("locf") * 10000
            + F.expr(
                "((nv - locf) * 10000 * (rn - prn)) DIV (nrn - prn)"
            )
        )
        .cast("long")
        .alias("interp_x1e4"),
    )

@query(
    "seasonal_decompose_hourly",
    """
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour FROM events
    ),
    bnd AS (SELECT max(hour) AS h1 FROM e),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    (SELECT h1 FROM bnd),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt
      FROM hours h LEFT JOIN e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    t AS (
      SELECT hour, cnt,
             CASE WHEN count(*) OVER w1 = 24 AND count(*) OVER w2 = 24
                  THEN sum(cnt) OVER w1 + sum(cnt) OVER w2 END AS trend_x48
      FROM c
      WINDOW w1 AS (ORDER BY hour ROWS BETWEEN 12 PRECEDING
                    AND 11 FOLLOWING),
             w2 AS (ORDER BY hour ROWS BETWEEN 11 PRECEDING
                    AND 12 FOLLOWING)
    ),
    d AS (
      SELECT hour, cnt, trend_x48,
             CASE WHEN trend_x48 IS NOT NULL
                  THEN 48 * cnt - trend_x48 END AS detr_x48,
             hour(hour) AS hod
      FROM t
    ),
    s AS (
      SELECT hod, sum(detr_x48) // count(detr_x48) AS seas_x48
      FROM d WHERE detr_x48 IS NOT NULL GROUP BY hod
    )
    SELECT d.hour, CAST(d.cnt AS BIGINT) AS cnt,
           CAST(d.trend_x48 AS BIGINT) AS trend_x48,
           CAST(s.seas_x48 AS BIGINT) AS seasonal_x48,
           CAST(d.detr_x48 - s.seas_x48 AS BIGINT) AS remainder_x48
    FROM d LEFT JOIN s ON s.hod = d.hod AND d.detr_x48 IS NOT NULL
    """,
)
def seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL additive seasonal decomposition of the hourly event
    rate (trend + seasonal + remainder, period 24) in EXACT x48 fixed
    point: the even-period centered moving average is the sum of the
    two straddling 24-hour window sums (the [1,2,...,2,1]/48 kernel
    with the /48 NEVER performed — the x48 numerator is the exact
    integer), detrended values are 48*y - trend, the seasonal index
    is the truncating per-hour-of-day mean of detrended values, and
    the remainder closes the identity detr = seasonal + remainder
    exactly.  Hours whose +-12 neighborhood leaves the observed range
    have NULL trend/seasonal/remainder — no invented edge data.

    100 TB shape: one hourly pre-aggregation shuffle; the two sliding
    sums share one ordered pass over the (tiny, time-bounded) spine;
    the seasonal index is a 24-row aggregate joined back broadcast.
    The spine window is globally ordered — the documented trade at
    spine scale (cf. gapfill_locf_interpolate)."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )
    w1 = Window.orderBy("hour").rowsBetween(-12, 11)
    w2 = Window.orderBy("hour").rowsBetween(-11, 12)
    t = c.select(
        "hour",
        "cnt",
        F.when(
            (F.count("*").over(w1) == 24) & (F.count("*").over(w2) == 24),
            F.sum("cnt").over(w1) + F.sum("cnt").over(w2),
        ).alias("trend_x48"),
    )
    d = t.select(
        "hour",
        "cnt",
        "trend_x48",
        F.when(
            F.col("trend_x48").isNotNull(),
            48 * F.col("cnt") - F.col("trend_x48"),
        ).alias("detr_x48"),
        F.hour("hour").alias("hod"),
    )
    s = (
        d.filter(F.col("detr_x48").isNotNull())
        .groupBy("hod")
        .agg(
            F.expr("sum(detr_x48) DIV count(detr_x48)").alias("seas_x48")
        )
    )
    return (
        d.join(
            F.broadcast(s),
            (d["hod"] == s["hod"]) & d["detr_x48"].isNotNull(),
            "left",
        )
        .select(
            "hour",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("trend_x48").cast("long").alias("trend_x48"),
            F.col("seas_x48").cast("long").alias("seasonal_x48"),
            (F.col("detr_x48") - F.col("seas_x48"))
            .cast("long")
            .alias("remainder_x48"),
        )
    )

@query(
    "k_anonymity_audit",
    """
    WITH q AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             c_custkey
      FROM customer
    ),
    g AS (
      SELECT nation, segment, bal_bucket, count(*) AS grp_size,
             count(DISTINCT c_custkey % 97) AS sens_diversity
      FROM q GROUP BY 1, 2, 3
    )
    SELECT CAST(nation AS INT) AS nation, segment, bal_bucket,
           CAST(grp_size AS BIGINT) AS grp_size,
           grp_size >= 5 AS k5_anonymous,
           CAST(sens_diversity AS BIGINT) AS sens_diversity,
           sens_diversity >= 3 AS l3_diverse
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a dataset
    passes BEFORE release: group by the quasi-identifier tuple
    (nation, market segment, coarse balance bucket), flag equivalence
    classes smaller than k=5 (re-identifiable) and classes whose
    sensitive attribute (here a derived 97-class proxy) shows fewer
    than l=3 distinct values (attribute-disclosable even at k).
    Both checks are exact integer aggregates — Sweeney's k-anonymity
    and Machanavajjhala's l-diversity as one pass.  The generalization
    lattice step (coarsen buckets until every class passes) is the
    caller's loop over this audit; each step is the same single
    aggregate.

    100 TB shape: ONE map-side-combinable aggregate over the
    quasi-identifier key (count + distinct partials in the same
    shuffle); output is |equivalence classes|, not |rows|.  Pairs
    with gdpr_forget_compaction as the governance family."""
    q = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        "c_custkey",
    )
    g = q.groupBy("nation", "segment", "bal_bucket").agg(
        F.count("*").alias("grp_size"),
        F.countDistinct(F.col("c_custkey") % 97).alias("sens_diversity"),
    )
    return g.select(
        "nation",
        "segment",
        "bal_bucket",
        F.col("grp_size").cast("long").alias("grp_size"),
        (F.col("grp_size") >= 5).alias("k5_anonymous"),
        F.col("sens_diversity").cast("long").alias("sens_diversity"),
        (F.col("sens_diversity") >= 3).alias("l3_diverse"),
    )


@query(
    "grid_density_outliers",
    """
    WITH p AS (
      SELECT event_id, user_id,
             epoch_us(ts) // 7200000000 AS tc,
             CAST(floor(value / 20.0) AS BIGINT) AS vc
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (SELECT tc, vc, count(*) AS n FROM p GROUP BY tc, vc),
    nb AS (
      SELECT c.tc, c.vc, sum(o.n) AS neigh
      FROM cells c JOIN cells o
        ON o.tc BETWEEN c.tc - 1 AND c.tc + 1
       AND o.vc BETWEEN c.vc - 1 AND c.vc + 1
      GROUP BY c.tc, c.vc
    )
    SELECT p.event_id, p.user_id,
           CAST(nb.neigh AS BIGINT) AS neighborhood_n,
           nb.neigh < 3 AS is_outlier
    FROM p JOIN nb ON nb.tc = p.tc AND nb.vc = p.vc
    """,
)
def grid_density_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based outlier detection on the (time x value) plane —
    DBSCAN's core-point rule without the clustering: a purchase is an
    outlier when its 3x3 grid neighborhood (cell = the epsilon box:
    2 h x 20.0, the proximity_join_grid_2d geometry) holds fewer than
    minPts = 3 points.  The neighborhood count aggregates CELLS first
    (|cells| << |points|), so the 9-cell stencil join runs on the
    cell table and points just look their cell up — density per point
    without any point-point join.  Grid counts approximate the true
    epsilon-ball (standard grid-DBSCAN bound: the 3x3 stencil covers
    every true epsilon neighbor); the rule as stated IS the contract,
    reproduced exactly by the oracle.

    100 TB shape: one cell-count shuffle, one |cells|-sized stencil
    self-join (9x fanout on cell keys, never on points), one keyed
    lookup join for points; identical integer cell arithmetic to the
    proximity join (epoch_us, floor-division value buckets)."""
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts) div 7200000000").alias("tc"),
            F.floor(F.col("value") / 20.0).cast("long").alias("vc"),
        )
    )
    cells = p.groupBy("tc", "vc").agg(F.count("*").alias("n"))
    # scatter each cell's count to its 9 neighbors IN THE SCAN STAGE
    # (explode of a literal stencil — no join at all), then gather
    # per target cell; the stencil never becomes a nested loop over
    # cells the way a BETWEEN-condition join would
    stencil = ", ".join(
        f"struct(tc + {dt} AS tc, vc + {dv} AS vc)"
        for dt in (-1, 0, 1)
        for dv in (-1, 0, 1)
    )
    nb = (
        cells.select(
            F.explode(F.expr(f"array({stencil})")).alias("s"), "n"
        )
        .select(F.col("s.tc").alias("tc"), F.col("s.vc").alias("vc"), "n")
        .groupBy("tc", "vc")
        .agg(F.sum("n").alias("neigh"))
        .join(cells.select("tc", "vc"), ["tc", "vc"])
    )
    return p.join(nb, ["tc", "vc"]).select(
        "event_id",
        "user_id",
        F.col("neigh").cast("long").alias("neighborhood_n"),
        (F.col("neigh") < 3).alias("is_outlier"),
    )


@query(
    "acf_hourly_lags",
    """
    WITH ev AS (
      SELECT date_trunc('hour', ts) AS hour FROM events
    ),
    h1 AS (SELECT max(hour) AS h1 FROM ev),
    hours AS (
      SELECT unnest(generate_series(
        TIMESTAMP '2024-01-01 00:00:00', (SELECT h1 FROM h1),
        INTERVAL 1 HOUR)) AS hour
    ),
    c AS (
      SELECT h.hour, count(e.hour) AS cnt
      FROM hours h LEFT JOIN ev e ON e.hour = h.hour
      GROUP BY h.hour
    ),
    tot AS (SELECT count(*) AS n, sum(cnt) AS s FROM c),
    dev AS (
      SELECT hour, CAST(n * cnt - s AS HUGEINT) AS dev
      FROM c, tot
    ),
    den AS (SELECT sum(dev * dev) AS den FROM dev),
    lags AS (SELECT unnest(generate_series(1, 24)) AS lag),
    num AS (
      SELECT l.lag, sum(a.dev * b.dev) AS num, count(*) AS n_pairs
      FROM dev a
      JOIN lags l ON TRUE
      JOIN dev b ON b.hour = a.hour + INTERVAL 1 HOUR * l.lag
      GROUP BY l.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(CASE WHEN num >= 0 THEN (num * 10000) // den
                     ELSE -((-num * 10000) // den) END AS BIGINT)
             AS acf_x1e4
    FROM num, den
    """,
)
def acf_hourly_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event rate at lags
    1..24, in EXACT integer arithmetic: deviations are scaled by the
    series length (dev_t = n*x_t - S, so the /n mean is never
    performed), the lag-k numerator is sum(dev_t * dev_{t+k}) over
    observed pairs, the denominator is sum(dev^2), and the reported
    coefficient is the toward-zero-truncated 1e4-scaled quotient —
    the n^2 factors cancel, so this IS the textbook ACF on a 1e-4
    grid, bit-identical on both engines (doubles would drift in the
    sum fold).  Accumulation runs in decimal(38,0)/HUGEINT; ANSI mode
    raises on overflow rather than wrapping.

    100 TB shape: one hourly pre-aggregation shuffle collapses the
    corpus to a time-bounded spine; the 24 lags are a single explode
    (24x fanout on the SPINE, never on events) + one keyed self-join
    on hour; the denominator is a 1-row broadcast.  Completes the
    time-series family (EWMA/Holt/Holt-Winters/CUSUM/seasonal
    decomposition) with the diagnostic that picks their lag/period
    parameters.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B)."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    h1 = ev.agg(F.max("hour").alias("h1"))
    hours = h1.select(
        F.explode(
            F.expr(
                "sequence(timestamp '2024-01-01 00:00:00', h1,"
                " interval 1 hour)"
            )
        ).alias("hour")
    )
    c = (
        hours.join(ev.withColumn("one", F.lit(1)), "hour", "left")
        .groupBy("hour")
        .agg(F.count("one").alias("cnt"))
    )
    tot = c.agg(
        F.count("*").alias("n"), F.sum("cnt").alias("s")
    )
    dev = c.crossJoin(F.broadcast(tot)).select(
        "hour",
        (F.col("n") * F.col("cnt") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("dev"),
    )
    den = dev.agg(F.sum(F.col("dev") * F.col("dev")).alias("den"))
    pairs = dev.select(
        "hour", F.col("dev").alias("dev_a"), F.explode(F.expr("sequence(1, 24)")).alias("lag")
    ).withColumn("hour", F.expr("hour + make_interval(0, 0, 0, 0, lag)"))
    num = (
        pairs.join(
            dev.select(F.col("hour").alias("hour"), F.col("dev").alias("dev_b")),
            "hour",
        )
        .groupBy("lag")
        .agg(
            F.sum(F.col("dev_a") * F.col("dev_b")).alias("num"),
            F.count("*").alias("n_pairs"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when(
            F.col("num") >= 0,
            F.expr("(num * 10000) div den"),
        )
        .otherwise(-F.expr("((-num) * 10000) div den"))
        .cast("long")
        .alias("acf_x1e4"),
    )


@query(
    "copurchase_hop_distance",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT lo AS src, hi AS dst FROM e
      UNION ALL
      SELECT hi AS src, lo AS dst FROM e
    ),
    d0 AS (
      SELECT p_partkey AS n, 0 AS d FROM part WHERE p_size = 1
    ),
    d1 AS (
      SELECT n, min(d) AS d FROM (
        SELECT n, d FROM d0
        UNION ALL
        SELECT s.dst AS n, x.d + 1 AS d FROM d0 x JOIN sym s ON s.src = x.n
      ) GROUP BY n
    ),
    d2 AS (
      SELECT n, min(d) AS d FROM (
        SELECT n, d FROM d1
        UNION ALL
        SELECT s.dst AS n, x.d + 1 AS d FROM d1 x JOIN sym s ON s.src = x.n
      ) GROUP BY n
    ),
    d3 AS (
      SELECT n, min(d) AS d FROM (
        SELECT n, d FROM d2
        UNION ALL
        SELECT s.dst AS n, x.d + 1 AS d FROM d2 x JOIN sym s ON s.src = x.n
      ) GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS part_id, CAST(d AS INT) AS hops
    FROM d3
    """,
)
def copurchase_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance on the part co-purchase graph
    (the triangle/k-core/label-propagation edge set): seeds are the
    p_size=1 parts at distance 0; three synchronous relaxation rounds
    (dist' = min(dist, min over in-edges of dist+1)) — unweighted
    single-source-shortest-path truncated to a fixed round count so
    the result is a deterministic integer relation (full convergence
    is diameter-dependent; 3 rounds is the contract and each extra
    round is the same plan shape).  Output: every part within 3 hops
    of a seed, with its exact hop count.  The oracle replays the
    identical rounds as chained CTEs — two independent evaluations of
    one exact integer algorithm.

    100 TB shape: per round ONE keyed join (frontier x edges on node
    id) + one min-combine — both map-side-combinable hash shuffles;
    the edge frame is persisted once and reused across rounds; deep
    traversals add localCheckpoint lineage cuts every ~5 rounds
    (operators/graph.py discipline).  This is the Pregel/BSP shortest
    path written as DataFrame rounds.  Completes the graph family
    (CC, PageRank, triangles, k-core, LPA) with reachability.
    Reference scope: flo has no graph surface — north-star extension
    (SURVEY §2 Part B)."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi")
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("lo", "hi")
    )
    sym = (
        e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        .unionAll(e.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
        .persist()
    )
    dist = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select(F.col("p_partkey").alias("n"), F.lit(0).alias("d"))
    )
    for _ in range(3):
        hop = (
            dist.join(sym, dist["n"] == sym["src"])
            .select(F.col("dst").alias("n"), (F.col("d") + 1).alias("d"))
        )
        dist = dist.unionAll(hop).groupBy("n").agg(F.min("d").alias("d"))
    out = dist.select(
        F.col("n").cast("long").alias("part_id"),
        F.col("d").cast("int").alias("hops"),
    )
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    return out


@query(
    "pareto_frontier_orders",
    """
    WITH pts AS (
      SELECT CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
               AS price_scaled,
             max(o_orderdate) AS best_date,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    sky AS (
      SELECT price_scaled, best_date, n_orders,
             max(best_date) OVER (
               ORDER BY price_scaled DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_above
      FROM pts
    )
    SELECT price_scaled, best_date, CAST(n_orders AS BIGINT) AS n_orders
    FROM sky
    WHERE best_above IS NULL OR best_date > best_above
    """,
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the orders not dominated in
    the (total price, order date) plane — maximize both.  Classic
    Borzsony-Kossmann skyline reduced to one sorted pass: collapse to
    distinct price points first (only the max date per price can
    survive), then a price-descending running max of dates marks a
    point dominated iff some strictly-higher-price point already
    reached its date (ties on price collapse by construction; equal
    date under strictly higher price IS dominated — the standard
    one-strict-coordinate rule).  Money on the exact 1e4-scaled
    integer grid; dates compare exactly.

    100 TB shape: the pre-aggregation shrinks the corpus to
    |distinct prices| before the only ordered pass; the window's
    global sort runs on that bounded frontier-candidate set, never on
    orders (same documented spine-scale trade as the sweepline
    entries).  A 2-dim skyline is one window; higher dims re-run the
    pass per added dimension.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B)."""
    pts = (
        load(spark, sf_dir, "orders")
        .groupBy(money_scaled(F.col("o_totalprice")).alias("price_scaled"))
        .agg(
            F.max("o_orderdate").alias("best_date"),
            F.count("*").alias("n_orders"),
        )
    )
    w = (
        Window.orderBy(F.col("price_scaled").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = pts.withColumn("best_above", F.max("best_date").over(w))
    return sky.filter(
        F.col("best_above").isNull()
        | (F.col("best_date") > F.col("best_above"))
    ).select(
        "price_scaled",
        "best_date",
        F.col("n_orders").cast("long").alias("n_orders"),
    )


# Discount weights for DCG@10: floor(1e6 / log2(rank+1)) for rank 1..10.
# Precomputed to EXACT integer literals embedded in both engines' query
# text, so the transcendental log never runs inside either engine and
# the whole metric stays on an integer grid.
_DCG_W = [1000000, 630929, 500000, 430676, 386852, 356207,
          333333, 315464, 301029, 289064]
_DCG_W_SQL = ", ".join(str(w) for w in _DCG_W)


@query(
    "ndcg_search_eval",
    f"""
    WITH terms AS (
      SELECT unnest(['join', 'scan', 'merge']) AS term
    ),
    tf AS (
      SELECT t.term, d.doc_id,
             len(list_filter(string_split(d.text, ' '), x -> x = t.term))
               AS tf
      FROM documents d JOIN terms t ON TRUE
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (
               PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
      FROM tf
    ),
    top AS (
      SELECT term, doc_id, rn,
             CAST((1 << (doc_id % 4)) - 1 AS BIGINT) AS gain
      FROM ranked WHERE rn <= 10
    ),
    ideal AS (
      SELECT term, gain, rn,
             row_number() OVER (
               PARTITION BY term ORDER BY gain DESC, doc_id ASC) AS irn
      FROM top
    ),
    agg AS (
      SELECT term,
             sum(gain * ([{_DCG_W_SQL}])[rn]) AS dcg_x1e6,
             sum(gain * ([{_DCG_W_SQL}])[irn]) AS idcg_x1e6
      FROM ideal GROUP BY term
    )
    SELECT term,
           CAST(dcg_x1e6 AS BIGINT) AS dcg_x1e6,
           CAST(idcg_x1e6 AS BIGINT) AS idcg_x1e6,
           CAST(CASE WHEN idcg_x1e6 = 0 THEN NULL
                     ELSE (dcg_x1e6 * 10000) // idcg_x1e6 END AS BIGINT)
             AS ndcg_x1e4
    FROM agg
    """,
)
def ndcg_search_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 ranking evaluation on an exact integer grid: rank
    documents per query term by exact term frequency (space-token
    match, doc_id tie-break), grade each hit with a synthetic
    deterministic relevance label rel = doc_id % 4, gain = 2^rel - 1,
    and score DCG with the 1e6-scaled 1/log2(rank+1) discount table
    precomputed OUTSIDE both engines (the one transcendental reduced
    to ten shared integer literals).  IDCG re-ranks the same
    retrieved set by gain (the retrieved-set nDCG variant — stated
    contract), and nDCG is the toward-zero-truncated 1e4-scaled
    quotient — bit-identical across engines where float DCG drifts.

    100 TB shape: term frequencies are one scan-stage lambda over the
    token array (3x literal-term fanout, no join against a term
    table); per-term top-10 is a bounded window (k rows per term
    survive); the two rank passes run on the 30-row retrieved frame.
    Completes the search family (BM25 retrieval, TF-IDF pairs) with
    the evaluation metric that grades them; pairs with
    auc_quality_classifier as the eval-metric family.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B)."""
    d = load(spark, sf_dir, "documents")
    tf = d.select(
        F.explode(F.array(F.lit("join"), F.lit("scan"), F.lit("merge"))).alias(
            "term"
        ),
        "doc_id",
        F.split("text", " ").alias("ws"),
    ).select(
        "term",
        "doc_id",
        F.expr("size(filter(ws, x -> x = term))").cast("long").alias("tf"),
    )
    wr = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    top = (
        tf.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 10)
        .withColumn(
            "gain",
            F.expr("shiftleft(1, cast(doc_id % 4 as int)) - 1").cast("long"),
        )
    )
    wi = Window.partitionBy("term").orderBy(
        F.col("gain").desc(), F.col("doc_id").asc()
    )
    warr = F.array(*[F.lit(w) for w in _DCG_W])
    ideal = top.withColumn("irn", F.row_number().over(wi))
    agg = ideal.groupBy("term").agg(
        F.sum(F.col("gain") * F.element_at(warr, F.col("rn"))).alias(
            "dcg_x1e6"
        ),
        F.sum(F.col("gain") * F.element_at(warr, F.col("irn"))).alias(
            "idcg_x1e6"
        ),
    )
    return agg.select(
        "term",
        F.col("dcg_x1e6").cast("long").alias("dcg_x1e6"),
        F.col("idcg_x1e6").cast("long").alias("idcg_x1e6"),
        F.when(F.col("idcg_x1e6") == 0, F.lit(None))
        .otherwise(F.expr("(dcg_x1e6 * 10000) div idcg_x1e6"))
        .cast("long")
        .alias("ndcg_x1e4"),
    )


@query(
    "dp_randomized_response",
    """
    WITH priv AS (
      SELECT c_nationkey,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS b,
             (c_custkey * 2654435761) % 1000 < 750 AS keep,
             (c_custkey * 2246822519) % 2 AS coin
      FROM customer
    ),
    rep AS (
      SELECT c_nationkey, b,
             CASE WHEN keep THEN b ELSE coin END AS reported
      FROM priv
    ),
    g AS (
      SELECT c_nationkey AS nation,
             count(*) AS n,
             sum(reported) AS reported_yes,
             sum(b) AS true_yes
      FROM rep GROUP BY 1
    )
    SELECT CAST(nation AS INT) AS nation,
           CAST(n AS BIGINT) AS n,
           CAST(reported_yes AS BIGINT) AS reported_yes,
           CAST(true_yes AS BIGINT) AS true_yes,
           CAST(((8 * reported_yes - n) * 10000) // 6 AS BIGINT)
             AS est_yes_x1e4
    FROM g
    """,
)
def dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response — the local-DP mechanism shape: each
    row reports its sensitive bit (segment = BUILDING) truthfully with
    p = 3/4 and a fair coin otherwise, and the per-nation true count
    is recovered by the unbiased estimator (Y - n/8)/(3/4), carried
    as the exact integer (8Y - n)*1e4 div 6.  The coins here are
    DETERMINISTIC multiplicative hashes of the key (the
    train_val_test_split discipline) so the whole mechanism is
    reproducible and hash-checkable — real deployments draw true
    randomness per report; the mechanism arithmetic, estimator
    included, is what this entry pins.  epsilon = ln(((3/4)+(1/8)) /
    (1/8)) = ln 7 per report under the standard RR analysis.

    100 TB shape: privatization is pure scan-stage arithmetic (no
    shuffle), aggregation is one map-side-combinable count/sum per
    nation; key*multiplier stays in int64 for keys < 2^33.  Completes
    the privacy/governance family (k-anonymity, PII redaction, GDPR
    forget) with the statistical-disclosure mechanism.  Reference
    scope: flo has no privacy surface — north-star extension (SURVEY
    §2 Part B)."""
    c = load(spark, sf_dir, "customer")
    priv = c.select(
        "c_nationkey",
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("b"),
        ((F.col("c_custkey") * 2654435761) % 1000 < 750).alias("keep"),
        ((F.col("c_custkey") * 2246822519) % 2).alias("coin"),
    )
    rep = priv.select(
        "c_nationkey",
        "b",
        F.when(F.col("keep"), F.col("b")).otherwise(F.col("coin")).alias(
            "reported"
        ),
    )
    g = rep.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").alias("n"),
        F.sum("reported").alias("reported_yes"),
        F.sum("b").alias("true_yes"),
    )
    return g.select(
        F.col("nation").cast("int").alias("nation"),
        F.col("n").cast("long").alias("n"),
        F.col("reported_yes").cast("long").alias("reported_yes"),
        F.col("true_yes").cast("long").alias("true_yes"),
        F.expr("((8 * reported_yes - n) * 10000) div 6")
        .cast("long")
        .alias("est_yes_x1e4"),
    )


@query(
    "stream_observe_metrics",
    """
    WITH t AS (
      SELECT count(*) AS n_rows,
             sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS sum_value,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchase
      FROM events
    )
    SELECT metric, observed, direct, observed = direct AS consistent
    FROM (
      SELECT 'n_rows' AS metric, CAST(n_rows AS BIGINT) AS observed,
             CAST(n_rows AS BIGINT) AS direct FROM t
      UNION ALL
      SELECT 'sum_value_x1e4', CAST(sum_value AS BIGINT),
             CAST(sum_value AS BIGINT) FROM t
      UNION ALL
      SELECT 'n_purchase', CAST(n_purchase AS BIGINT),
             CAST(n_purchase AS BIGINT) FROM t
    )
    """,
)
def stream_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Dataset.observe`` on a STREAMING query — Spark's built-in
    pipeline-observability hook: named aggregate metrics ride each
    micro-batch's ``StreamingQueryProgress.observedMetrics`` without a
    second pass over the data.  The stream observes row count, exact
    scaled-long value sum, and purchase count while draining to a
    foreachBatch sink; per-batch observations are folded driver-side
    from ``recentProgress`` (O(batches) metadata — documented) and the
    contract is that the folded totals EQUAL the direct batch
    aggregate over the same events — exact because count/sum are
    batch-split-invariant and values ride the money grid.

    100 TB shape: observe() is a zero-extra-shuffle side aggregate
    computed inside the existing micro-batch plan (partial aggregation
    on the scan, one metrics row per batch to the driver); this is the
    production pattern for row-count/quality SLO monitoring of a
    streaming ingest (cf. constraint_audit for the batch analog).
    Reference scope: flo exposes per-partition head counters as its
    only ingest telemetry (SURVEY §2 A13); named metric observation is
    engine-side — north-star extension."""
    import time

    from flo_spark.queries import _events_stream, scratch_dir

    tmp = scratch_dir("flo_observe_")
    store = f"{tmp}/store"
    n_batches = {"n": 0}

    def sink(batch: DataFrame, batch_id: int) -> None:
        n_batches["n"] += 1
        batch.write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

    src = _events_stream(spark, sf_dir).withColumn(
        "value_x1e4", money_scaled(F.col("value"))
    )
    q = (
        src.observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value_x1e4").alias("sum_value_x1e4"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("observe stream did not drain")
    # progress events are delivered asynchronously after termination;
    # wait (bounded) until every data batch's observation has landed
    deadline = time.monotonic() + 30
    obs = []
    while time.monotonic() < deadline:
        obs = [
            p["observedMetrics"]["ingest"]
            for p in (q.recentProgress or [])
            if p.get("observedMetrics", {}).get("ingest") is not None
            and p["observedMetrics"]["ingest"]["n_rows"] > 0
        ]
        if len(obs) >= n_batches["n"] or sum(
            m["n_rows"] for m in obs
        ) >= spark.read.parquet(f"{store}/batch=*").count():
            break
        time.sleep(0.5)
    folded = {
        "n_rows": sum(m["n_rows"] for m in obs),
        "sum_value_x1e4": sum(m["sum_value_x1e4"] for m in obs),
        "n_purchase": sum(m["n_purchase"] for m in obs),
    }
    direct = (
        spark.read.parquet(f"{store}/batch=*")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value_x1e4").alias("sum_value_x1e4"),
            F.count_if(F.col("event_type") == "purchase").alias(
                "n_purchase"
            ),
        )
        .collect()[0]  # 1-row ground-truth aggregate (documented)
    )
    rows = [
        ("n_rows", int(folded["n_rows"]), int(direct["n_rows"])),
        (
            "sum_value_x1e4",
            int(folded["sum_value_x1e4"]),
            int(direct["sum_value_x1e4"]),
        ),
        ("n_purchase", int(folded["n_purchase"]), int(direct["n_purchase"])),
    ]
    return spark.createDataFrame(
        rows, "metric string, observed long, direct long"
    ).select(
        "metric",
        "observed",
        "direct",
        (F.col("observed") == F.col("direct")).alias("consistent"),
    )


@query(
    "exact_percentile_suite",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           median(CAST(l_quantity AS BIGINT)) AS median_qty,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25_qty,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75_qty,
           max_by(l_orderkey,
                  CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)
                    * 100000000 + l_orderkey) AS top_price_order,
           min_by(l_orderkey,
                  CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)
                    * 100000000 + l_orderkey) AS bottom_price_order
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def exact_percentile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ordered-set aggregates (vs the approx_percentile/KLL
    sketch family): ``median`` and ``percentile`` (R-7 linear
    interpolation) over integer quantities — every interpolated value
    is dyadic (k + {0,.25,.5,.75}), so the doubles are exact and
    engine-identical with no rounding step — plus ``max_by``/``min_by``
    with a COMPOSITE scaled (price, key) ordering scalar
    (price_x1e4 * 1e8 + orderkey — exact for orderkeys < 1e8, every
    driver SF; wider keys move the composite to decimal(38,0)), which
    makes the argmax deterministic under price ties (bare max_by on a
    tied ordering column is nondeterministic — the composite is the
    documented discipline).  DuckDB's quantile_cont/max_by implement
    the same interpolation and ordering — two engines, one exact
    answer.

    100 TB shape: exact percentiles are rank-based and need a sort of
    each group (Spark plans a single shuffle + per-group sort here —
    the honest cost of EXACT order statistics; the mergeable-sketch
    path for cluster-scale monitoring is quantile_sketch_mergeable /
    approx_quantile_bounded); max_by/min_by stay map-side-combinable.
    Six groups bound the output.  Reference scope: flo has no
    aggregate surface — north-star extension (SURVEY §2 Part B)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        money_scaled(F.col("l_extendedprice")).alias("price_x1e4"),
    )
    ordkey = F.col("price_x1e4") * 100000000 + F.col("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.median("qty").alias("median_qty"),
        F.percentile("qty", F.lit(0.25)).alias("p25_qty"),
        F.percentile("qty", F.lit(0.75)).alias("p75_qty"),
        F.max_by(F.col("l_orderkey"), ordkey).alias("top_price_order"),
        F.min_by(F.col("l_orderkey"), ordkey).alias("bottom_price_order"),
    )


@query(
    "small_file_compaction",
    """
    WITH b AS (
      SELECT doc_id, text, source FROM documents ORDER BY doc_id LIMIT 300
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(64 AS INT) AS files_before,
           CAST(4 AS INT) AS files_after
    FROM b GROUP BY source
    """,
)
def small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lakehouse maintenance op that keeps
    a streaming-ingested table scannable: a deliberately fragmented
    layout (64 round-robin files for 300 docs — the many-tiny-files
    state every micro-batch sink converges to) is rewritten into
    size-targeted files (4 here; production derives the count as
    ceil(total_bytes / target_file_size) from the source listing),
    and the contract is CONTENT IDENTITY — the per-source aggregate
    over the compacted table hash-matches the source rows, with the
    before/after file counts pinned.  File counts come from a
    filesystem listing (O(files) driver metadata — documented).

    100 TB shape: compaction is one round-robin repartition (pure
    width change, no key shuffle) executed per partition-directory in
    production so rewrite units stay independent and incremental;
    pairs with flo segment compaction (A12) which does the same for
    the native event log, and with gdpr_forget_compaction which
    rewrites for deletion rather than size.  Reference:
    segment/mod.rs rotation bounds file count at write time; parquet
    sinks need it as a separate maintenance pass."""
    import glob as _glob

    from flo_spark.queries import scratch_dir

    tmp = scratch_dir("flo_compact_")
    b = (
        load(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(300)
        .select("doc_id", "text", "source")
    )
    b.repartition(64).write.mode("overwrite").parquet(f"{tmp}/small")
    small = spark.read.parquet(f"{tmp}/small")
    files_before = len(_glob.glob(f"{tmp}/small/part-*.parquet"))
    small.repartition(4).write.mode("overwrite").parquet(f"{tmp}/compact")
    files_after = len(_glob.glob(f"{tmp}/compact/part-*.parquet"))
    assert files_before == 64 and files_after == 4, (
        files_before,
        files_after,
    )
    return (
        spark.read.parquet(f"{tmp}/compact")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
        )
        .withColumn("files_before", F.lit(files_before).cast("int"))
        .withColumn("files_after", F.lit(files_after).cast("int"))
        .select(
            "source",
            "n_docs",
            "sum_doc_id",
            "sum_chars",
            "files_before",
            "files_after",
        )
    )


@query(
    "sorted_neighborhood_pairs",
    """
    WITH r AS (
      SELECT c_custkey,
             c_mktsegment || '|' ||
               lpad(CAST(CAST(floor(c_acctbal) AS BIGINT) + 100000
                         AS VARCHAR), 7, '0') AS sort_key,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_x100
      FROM customer
    ),
    o AS (
      SELECT c_custkey, sort_key, bal_x100,
             row_number() OVER (ORDER BY sort_key, c_custkey) AS rn
      FROM r
    )
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           CAST(b.rn - a.rn AS INT) AS gap,
           CAST(abs(a.bal_x100 - b.bal_x100) AS BIGINT) AS bal_diff_x100,
           abs(a.bal_x100 - b.bal_x100) <= 500 AS candidate_match
    FROM o a JOIN o b ON b.rn - a.rn BETWEEN 1 AND 2
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo) — the third
    entity-resolution candidate generator next to LSH banding and
    prefix blocking: sort records by a domain key (segment +
    zero-padded balance bucket, shifted to be sign-free), slide a
    window of w = 3 over the sorted order, and emit every in-window
    pair with its exact cent-grid balance distance and a <= $5.00
    match verdict.  Candidate count is exactly (w-1) * n - O(w^2) —
    LINEAR in the corpus where all-pairs is quadratic; the oracle
    replays the identical window rule.

    100 TB shape: one global sort (range partition) of the KEYS, then
    the pairing is shuffle-free lead() arithmetic within the sorted
    run — Spark plans lead(1)/lead(2) in a single window pass; the
    multi-pass variant re-sorts on a second key to catch fuzzier
    matches, same shape per pass.  The sort is on (key, id) pairs —
    bytes-per-row bounded, never payloads.  Reference scope: flo has
    no ER surface — north-star extension (SURVEY §2 Part B,
    dedup family)."""
    r = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_mktsegment"),
            F.lit("|"),
            F.lpad(
                (F.floor("c_acctbal").cast("long") + 100000).cast("string"),
                7,
                "0",
            ),
        ).alias("sort_key"),
        money_scaled(F.col("c_acctbal")).alias("bal_x10000"),
    ).withColumn("bal_x100", F.expr("bal_x10000 div 100")).drop("bal_x10000")
    w = Window.orderBy("sort_key", "c_custkey")
    o = r.select(
        "c_custkey",
        "bal_x100",
        *[
            F.lead("c_custkey", k).over(w).alias(f"k{k}")
            for k in (1, 2)
        ],
        *[
            F.lead("bal_x100", k).over(w).alias(f"b{k}")
            for k in (1, 2)
        ],
    )
    pairs = None
    for k in (1, 2):
        p = o.filter(F.col(f"k{k}").isNotNull()).select(
            F.col("c_custkey").alias("a_key"),
            F.col(f"k{k}").alias("b_key"),
            F.lit(k).cast("int").alias("gap"),
            F.abs(F.col("bal_x100") - F.col(f"b{k}")).alias("bal_diff_x100"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    return pairs.select(
        "a_key",
        "b_key",
        "gap",
        F.col("bal_diff_x100").cast("long").alias("bal_diff_x100"),
        (F.col("bal_diff_x100") <= 500).alias("candidate_match"),
    )


@query(
    "inverted_index_build",
    """
    WITH tok AS (
      SELECT d.doc_id, t.term
      FROM documents d,
           unnest(list_filter(string_split(d.text, ' '), x -> x <> ''))
             AS t(term)
    ),
    tf AS (
      SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (
               PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
      FROM tf
    ),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY term
    ),
    post AS (
      SELECT term, list(doc_id ORDER BY doc_id) AS top_postings
      FROM ranked WHERE rn <= 5 GROUP BY term
    )
    SELECT s.term, s.df, s.total_tf, p.top_postings
    FROM stats s JOIN post p USING (term)
    """,
)
def inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the batch artifact BM25 retrieval
    presupposes, built as a relation: per term, document frequency,
    total term frequency, and a CAPPED posting list (the top-5 docs by
    tf, stored id-sorted so the array is order-canonical across
    engines).  The cap is the impact-ordered / WAND-style index-time
    pruning rule: high-impact postings stay hot, the full list is the
    same relation uncapped.

    100 TB shape: tokenize in the scan stage (one explode, no joins),
    ONE (term, doc) hash aggregation, then per-term stats and the
    bounded top-k window — all shuffles keyed on the term; posting
    arrays are k-bounded so no group blows task memory (the uncapped
    variant would stream postings as rows, never as one array).
    Pairs with bm25_search_topk (query side) and vocab_index_encode
    (the dictionary side).  Reference scope: flo has no text surface —
    north-star extension (SURVEY §2 Part B)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), x -> x <> '')")
        ).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    wr = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    post = (
        tf.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .groupBy("term")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("top_postings"))
    )
    return stats.join(post, "term").select(
        "term", "df", "total_tf", "top_postings"
    )


@query(
    "context_window_pairs",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id % 50 = 0
    ),
    pos AS (
      SELECT doc_id, ws, unnest(generate_series(5, 12)) AS pos
      FROM d
    )
    SELECT doc_id, CAST(pos AS INT) AS pos,
           array_to_string(list_slice(ws, pos - 4, pos - 1), ' ')
             AS context,
           ws[pos] AS target
    FROM pos WHERE pos <= len(ws)
    """,
)
def context_window_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-token training-pair construction — the map from documents
    to (context, target) supervision the LM data pipeline ends with:
    for each sampled document (1-in-50 by key, the deterministic
    split discipline) and each position 5..12, the 4-token context
    window and the token it predicts.  Pure array arithmetic on the
    token list; the position range bounds output fanout explicitly
    (production uses stride = context length for disjoint windows —
    same expression, different sequence bounds).

    100 TB shape: entirely scan-stage (split + bounded explode +
    slice — NO shuffle, no join); output rows = |docs| x windows,
    written shard-parallel.  The sequence_packing entry handles the
    batch-assembly half; this is the supervision-extraction half.
    Reference scope: flo has no text surface — north-star extension
    (SURVEY §2 Part B)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.split("text", " ").alias("ws"))
    )
    pos = d.select(
        "doc_id", "ws", F.explode(F.expr("sequence(5, 12)")).alias("pos")
    ).filter(F.col("pos") <= F.size("ws"))
    return pos.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(
            F.expr("slice(ws, pos - 4, 4)"), " "
        ).alias("context"),
        F.element_at("ws", F.col("pos")).alias("target"),
    )


@query(
    "welch_t2_ab_test",
    """
    WITH g AS (
      SELECT l_returnflag AS grp,
             count(*) AS n,
             sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS s,
             sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS HUGEINT)
                 * CAST(floor(l_extendedprice * 10000 + 0.5) AS HUGEINT))
                 AS q
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY l_returnflag
    ),
    w AS (
      SELECT
        max(CASE WHEN grp = 'A' THEN n END) AS na,
        max(CASE WHEN grp = 'R' THEN n END) AS nr,
        max(CASE WHEN grp = 'A' THEN s END) AS sa,
        max(CASE WHEN grp = 'R' THEN s END) AS sr,
        max(CASE WHEN grp = 'A' THEN q END) AS qa,
        max(CASE WHEN grp = 'R' THEN q END) AS qr
      FROM g
    ),
    m AS (
      SELECT na, nr,
             sa // na AS ma, sr // nr AS mr,
             (na * qa - CAST(sa AS HUGEINT) * sa) // (na * (na - 1)) AS va,
             (nr * qr - CAST(sr AS HUGEINT) * sr) // (nr * (nr - 1)) AS vr
      FROM w
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
           CAST(ma AS BIGINT) AS mean_a_x1e4,
           CAST(mr AS BIGINT) AS mean_r_x1e4,
           CAST(va // 10000 AS BIGINT) AS var_a_x1e4,
           CAST(vr // 10000 AS BIGINT) AS var_r_x1e4,
           CAST(ma - mr AS BIGINT) AS diff_x1e4,
           CAST(CAST(ma - mr AS HUGEINT) * (ma - mr) * 10000
                // (va // na + vr // nr) AS BIGINT) AS t2_x1e4
    FROM m
    """,
)
def welch_t2_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample test statistic (the A/B-testing primitive)
    between return-flag groups A and R on extended price, ENGINE-EXACT:
    per group the moments (n, sum, sum-of-squares) accumulate as exact
    integers on the 1e4 money grid, then mean, sample variance
    (n*Q - S^2 over n(n-1)), the mean difference, and
    t^2 = diff^2 / (var_a/n_a + var_r/n_r) evaluate as a SPECIFIED
    chain of truncating integer divisions (every operand nonnegative,
    so DuckDB's floor // and Spark's truncating DIV agree) — the
    Mann-Whitney/AUC and regression entries' q7 lesson applied to
    hypothesis testing.  t^2 (squared) avoids the square root; the
    caller compares against (t_crit)^2.  Squares run in
    decimal(38,0)/HUGEINT (S^2 passes 2^63 at bench SF; ANSI raises
    rather than wraps on overflow).

    100 TB shape: ONE map-side-combinable conditional aggregate over
    the fact scan (three integer partials per group), a single-row
    combine — the same shape as q6; no second pass, nothing
    broadcast.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B statistics)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    y = money_scaled(F.col("l_extendedprice"))
    d = lambda c: c.cast("decimal(38,0)")
    g = li.select(
        F.col("l_returnflag").alias("grp"), y.alias("y")
    ).groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("q"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "R", F.col("n"))).alias("nr"),
        F.max(F.when(F.col("grp") == "A", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("grp") == "R", F.col("s"))).alias("sr"),
        F.max(F.when(F.col("grp") == "A", F.col("q"))).alias("qa"),
        F.max(F.when(F.col("grp") == "R", F.col("q"))).alias("qr"),
    )
    m = w.selectExpr(
        "na",
        "nr",
        "sa div na AS ma",
        "sr div nr AS mr",
        "(CAST(na AS DECIMAL(38,0)) * qa - CAST(sa AS DECIMAL(38,0))"
        " * CAST(sa AS DECIMAL(38,0))) div (na * (na - 1)) AS va",
        "(CAST(nr AS DECIMAL(38,0)) * qr - CAST(sr AS DECIMAL(38,0))"
        " * CAST(sr AS DECIMAL(38,0))) div (nr * (nr - 1)) AS vr",
    )
    return m.selectExpr(
        "CAST(na AS BIGINT) AS n_a",
        "CAST(nr AS BIGINT) AS n_r",
        "CAST(ma AS BIGINT) AS mean_a_x1e4",
        "CAST(mr AS BIGINT) AS mean_r_x1e4",
        "CAST(va div 10000 AS BIGINT) AS var_a_x1e4",
        "CAST(vr div 10000 AS BIGINT) AS var_r_x1e4",
        "CAST(ma - mr AS BIGINT) AS diff_x1e4",
        "CAST((CAST(ma - mr AS DECIMAL(38,0)) * CAST(ma - mr AS"
        " DECIMAL(38,0)) * 10000) div (va div na + vr div nr) AS BIGINT)"
        " AS t2_x1e4",
    )


@query(
    "linkpred_resource_allocation",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT lo AS src, dst FROM (
        SELECT lo, hi AS dst FROM e
        UNION ALL
        SELECT hi AS lo, lo AS dst FROM e
      )
    ),
    deg AS (
      SELECT src AS z, count(*) AS d FROM sym GROUP BY src
    ),
    zok AS (SELECT z, d FROM deg WHERE d <= 32),
    wedge AS (
      SELECT s1.dst AS a, s2.dst AS b, 1000000 // k.d AS w
      FROM sym s1
      JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
      JOIN zok k ON k.z = s1.src
    ),
    cand AS (
      SELECT a, b, count(*) AS cn, sum(w) AS ra
      FROM wedge
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.lo = a AND e.hi = b)
      GROUP BY a, b
    )
    SELECT CAST(a AS BIGINT) AS part_a, CAST(b AS BIGINT) AS part_b,
           CAST(cn AS BIGINT) AS common_neighbors,
           CAST(ra AS BIGINT) AS ra_x1e6
    FROM cand
    ORDER BY ra_x1e6 DESC, part_a, part_b
    LIMIT 50
    """,
)
def linkpred_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph by the
    Resource-Allocation index (Zhou/Lu/Zhang 2009 — Adamic-Adar's
    1/deg sibling, chosen because 1/deg is a RATIONAL damping, so
    RA = sum over common neighbors z of 1e6//deg(z) stays on an exact
    integer grid where AA's 1/log(deg) would need a transcendental):
    candidate (a,b) pairs are the wedges a-z-b that are NOT already
    edges, scored by common-neighbor count and RA, top-50 by
    (RA desc, pair) — fully deterministic.

    Intermediate nodes are restricted to deg(z) <= 32: wedge fanout is
    sum over z of deg(z)^2, so hub suppression bounds the candidate
    blowup (same candidate-generator discipline as LSH banding), and
    it is PRINCIPLED here — a hub's 1/deg weight contributes least by
    construction.  The cap is part of the stated contract.

    100 TB shape: edge list persists once; the wedge join is keyed on
    z (one shuffle), the existing-edge exclusion is a keyed ANTI join,
    the score is one hash aggregate on (a,b), and top-50 compiles to
    TakeOrderedAndProject — no global sort, no cartesian (same plan
    family as triangle_count_copurchase, which documents the
    orientation variant for counting).  Reference scope: flo has no
    graph surface — north-star extension (SURVEY §2 Part B)."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("lo", "hi")
        .persist()
    )
    sym = e.selectExpr("lo AS src", "hi AS dst").unionAll(
        e.selectExpr("hi AS src", "lo AS dst")
    )
    zok = (
        sym.groupBy(F.col("src").alias("z"))
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") <= 32)
    )
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    wedge = (
        s1.join(
            s2,
            (F.col("s1.src") == F.col("s2.src"))
            & (F.col("s1.dst") < F.col("s2.dst")),
        )
        .join(zok, F.col("s1.src") == F.col("z"))
        .select(
            F.col("s1.dst").alias("wa"),
            F.col("s2.dst").alias("wb"),
            F.expr("1000000 div d").alias("w"),
        )
    )
    cand = (
        wedge.join(
            e,
            (F.col("wa") == F.col("lo")) & (F.col("wb") == F.col("hi")),
            "left_anti",
        )
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("cn"), F.sum("w").alias("ra"))
    )
    return (
        cand.select(
            F.col("wa").cast("long").alias("part_a"),
            F.col("wb").cast("long").alias("part_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.col("ra").cast("long").alias("ra_x1e6"),
        )
        .orderBy(F.col("ra_x1e6").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "lakehouse_time_travel",
    """
    WITH v AS (SELECT unnest([1, 2, 3]) AS version),
    snap AS (
      SELECT v.version, d.doc_id, d.n_chars, d.lang
      FROM v JOIN documents d ON
           (v.version = 1 AND d.doc_id % 4 IN (0, 1))
        OR (v.version = 2 AND d.doc_id % 4 IN (0, 1, 2))
        OR (v.version = 3 AND d.doc_id % 4 IN (0, 1, 2)
            AND d.doc_id % 8 <> 0)
    )
    SELECT CAST(version AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM snap GROUP BY version
    """,
)
def lakehouse_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel on a manifest-versioned
    parquet table (``sources/manifest_table.py`` — the minimal
    correct core of the Iceberg/Delta commit protocol): commit 1
    writes a base fragment (doc_id % 4 in (0,1)), commit 2 APPENDS a
    fragment (% 4 = 2) by manifest reference, commit 3 is a
    COPY-ON-WRITE DELETE (doc_id % 8 = 0) that rewrites only the one
    fragment containing matches — the appended fragment carries over
    untouched by reference.  The query then reads ALL THREE versions
    AFTER the final commit and aggregates each snapshot: matching the
    oracle's per-version reconstruction from the raw table proves
    that v1 and v2 still read their exact original snapshots after
    v3's rewrite (time travel), and that the delete physically
    removed its rows from v3 (copy-on-write correctness).

    Commits are atomic put-if-absent (hard-link claim) with
    optimistic retry — no reader ever sees a partial manifest; the
    conflict path is unit-tested in tests/test_manifest_table.py.

    100 TB shape: manifests are O(fragments) driver-side metadata
    (exactly what table formats ship); data fragments scan fully
    distributed, the COW delete rewrites only fragments with matches
    (here 1 of 2; at scale, file-level stats prune the rewrite set).
    Reference scope: flo's append-only segment store
    (flo-server persistent_event.rs) has no snapshots — north-star
    extension (SURVEY §2 Part B sources/sinks)."""
    from flo_spark.queries import scratch_dir
    from flo_spark.sources.manifest_table import ManifestTable

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    t = ManifestTable(scratch_dir("lakehouse_tt_"))
    t.append(docs.filter(F.col("doc_id") % 4 < 2).coalesce(4), "base")
    t.append(docs.filter(F.col("doc_id") % 4 == 2).coalesce(4), "more")
    t.delete_where(spark, "doc_id % 8 = 0")
    outs = []
    for v in (1, 2, 3):
        outs.append(
            t.read(spark, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_total"),
                F.countDistinct("lang").cast("long").alias("n_langs"),
                F.min("doc_id").cast("long").alias("min_doc"),
                F.max("doc_id").cast("long").alias("max_doc"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@query(
    "golden_record_survivorship",
    """
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             md5(substring(text, 1, 80)) AS cluster_key
      FROM documents
    ),
    big AS (
      SELECT cluster_key FROM keyed
      GROUP BY cluster_key HAVING count(*) > 1
    ),
    members AS (
      SELECT k.* FROM keyed k JOIN big USING (cluster_key)
    ),
    canon AS (
      SELECT cluster_key, doc_id AS canonical_doc_id,
             n_chars AS canonical_len
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY cluster_key
          ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM members
      ) WHERE rn = 1
    ),
    langmode AS (
      SELECT cluster_key, lang AS lang_mode
      FROM (
        SELECT cluster_key, lang, count(*) AS c,
               row_number() OVER (
                 PARTITION BY cluster_key
                 ORDER BY count(*) DESC, lang ASC) AS rn
        FROM members GROUP BY cluster_key, lang
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT cluster_key,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(min(doc_id) AS BIGINT) AS golden_doc_id,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             string_agg(DISTINCT source, ',' ORDER BY source) AS sources
      FROM members GROUP BY cluster_key
    )
    SELECT a.cluster_key, a.n_members, a.golden_doc_id,
           CAST(c.canonical_doc_id AS BIGINT) AS canonical_doc_id,
           CAST(c.canonical_len AS BIGINT) AS canonical_len,
           m.lang_mode, a.sources, a.total_chars
    FROM agg a
    JOIN canon c USING (cluster_key)
    JOIN langmode m USING (cluster_key)
    """,
)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record construction — the SURVIVORSHIP step of entity
    resolution that follows blocking (sorted_neighborhood_pairs /
    LSH) and clustering (dedup_connected_components): each duplicate
    cluster (content-key, same 80-char-prefix rule as
    dedup_keep_best) merges into ONE synthetic master record with
    FIELD-LEVEL rules — most-complete field wins for the canonical
    text (longest member, doc_id tiebreak), majority vote with a
    deterministic tiebreak for language, earliest id as the golden
    key, and a provenance column (sorted distinct sources) so the
    merge is auditable.  This differs from dedup_keep_best (which
    keeps one whole RECORD): the golden record mixes fields from
    different members, the standard MDM semantics.

    100 TB shape: every stage is keyed on cluster_key — one hash
    shuffle for membership, windows and the lang-vote aggregate
    re-use the same partitioning, and the three per-cluster frames
    join on the same key (AQE coalesces to broadcast at small scale);
    documents shuffle once, field payloads never fan out.  Reference
    scope: flo has no curation surface — north-star extension
    (SURVEY §2 Part B dedup family)."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "cluster_key", F.md5(F.substring("text", 1, 80))
    )
    wk = Window.partitionBy("cluster_key")
    members = docs.withColumn("n_members", F.count("*").over(wk)).filter(
        F.col("n_members") > 1
    )
    canon = (
        members.withColumn(
            "rn",
            F.row_number().over(
                wk.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_key",
            F.col("doc_id").cast("long").alias("canonical_doc_id"),
            F.col("n_chars").cast("long").alias("canonical_len"),
        )
    )
    langmode = (
        members.groupBy("cluster_key", "lang")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_key").orderBy(
                    F.col("c").desc(), F.col("lang").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cluster_key", F.col("lang").alias("lang_mode"))
    )
    agg = members.groupBy("cluster_key").agg(
        F.count("*").cast("long").alias("n_members"),
        F.min("doc_id").cast("long").alias("golden_doc_id"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources"
        ),
    )
    return (
        agg.join(canon, "cluster_key")
        .join(langmode, "cluster_key")
        .select(
            "cluster_key",
            "n_members",
            "golden_doc_id",
            "canonical_doc_id",
            "canonical_len",
            "lang_mode",
            "sources",
            "total_chars",
        )
    )


@query(
    "multimodal_y4m_roundtrip",
    """
    WITH fr AS (
      SELECT doc_id, unnest([0, 1, 2]) AS frame_idx FROM documents
    ),
    y AS (
      SELECT doc_id, frame_idx,
             sum((doc_id * 7 + frame_idx * 13 + i) % 256) AS sum_y
      FROM (SELECT doc_id, frame_idx, unnest(range(0, 48)) AS i FROM fr)
      GROUP BY doc_id, frame_idx
    ),
    uv AS (
      SELECT doc_id, frame_idx,
             sum((doc_id * 3 + frame_idx * 5 + 2 * i) % 256) AS sum_u,
             sum((doc_id * 5 + frame_idx * 7 + 3 * i) % 256) AS sum_v
      FROM (SELECT doc_id, frame_idx, unnest(range(0, 12)) AS i FROM fr)
      GROUP BY doc_id, frame_idx
    )
    SELECT y.doc_id, CAST(y.frame_idx AS INT) AS frame_idx,
           CAST(sum_y AS BIGINT) AS sum_y,
           CAST(sum_u AS BIGINT) AS sum_u,
           CAST(sum_v AS BIGINT) AS sum_v
    FROM y JOIN uv ON y.doc_id = uv.doc_id AND y.frame_idx = uv.frame_idx
    """,
)
def multimodal_y4m_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL VIDEO decode, hash-checked — the first moving-picture
    container in the multimodal matrix: per document a 3-frame 8x6
    YUV4MPEG2 (Y4M — ffmpeg/mjpegtools' standard raw-video
    interchange format) stream is assembled with deterministic planar
    C420 content (Y[i] = (doc*7 + frame*13 + i) % 256, U/V from
    sibling formulas on the quarter-size chroma planes), encoded into
    actual container bytes (stream header + per-frame FRAME markers),
    decoded back through ``decode_video``'s header/plane-geometry
    parser, and reduced to per-frame plane sums.  The oracle computes
    the same sums from the generating formula — a header-parse,
    chroma-subsampling-geometry, or frame-boundary defect breaks the
    hash.  Codec formats (H.264/VP9) refuse loudly behind
    ``decode_video``; frame-rate/interlace/aspect tokens are parsed
    and carried (tests/test_media_decode.py).

    100 TB shape: one Arrow-batched mapInPandas stage, frame fan-out
    inside the batch (no shuffle, no skew amplification — the
    sample_frames discipline); real codec work would slot into the
    same batch loop.  Reference scope: flo stores opaque binary
    payloads (flo-event/src/lib.rs:185-204); decode is a north-star
    extension (SURVEY §2 Part B multimodal)."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_video, encode_y4m

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "sum_y": [],
                "sum_u": [],
                "sum_v": [],
            }
            iy = np.arange(48, dtype=np.int64)
            ic = np.arange(12, dtype=np.int64)
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                frames = []
                for f in range(3):
                    yp = ((d * 7 + f * 13 + iy) % 256).astype(
                        np.uint8
                    ).reshape(6, 8)
                    up = ((d * 3 + f * 5 + 2 * ic) % 256).astype(
                        np.uint8
                    ).reshape(3, 4)
                    vp = ((d * 5 + f * 7 + 3 * ic) % 256).astype(
                        np.uint8
                    ).reshape(3, 4)
                    frames.append((yp, up, vp))
                payload = encode_y4m(frames, colorspace="420")
                decoded, meta = decode_video(payload)
                assert meta["n_frames"] == 3 and meta["width"] == 8
                for f, (yp, up, vp) in enumerate(decoded):
                    out["doc_id"].append(d)
                    out["frame_idx"].append(f)
                    out["sum_y"].append(int(yp.astype(np.int64).sum()))
                    out["sum_u"].append(int(up.astype(np.int64).sum()))
                    out["sum_v"].append(int(vp.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip,
        "doc_id long, frame_idx int, sum_y long, sum_u long, sum_v long",
    )


@query(
    "sql_syntax_surface_suite",
    """
    WITH tier(seg, tier) AS (
      VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'b2b'),
             ('FURNITURE', 'retail'), ('MACHINERY', 'b2b'),
             ('HOUSEHOLD', 'retail')
    ),
    agg AS (
      SELECT t.tier, c.c_mktsegment AS segment,
             count(*) AS n_customers,
             sum(CAST(floor(c.c_acctbal * 10000 + 0.5) AS BIGINT))
                 AS bal_x1e4
      FROM customer c JOIN tier t ON t.seg = c.c_mktsegment
      GROUP BY t.tier, c.c_mktsegment
    )
    SELECT tier, segment, 'n_customers' AS metric,
           CAST(n_customers AS BIGINT) AS value
    FROM agg
    UNION ALL
    SELECT tier, segment, 'bal_x1e4' AS metric,
           CAST(bal_x1e4 AS BIGINT) AS value
    FROM agg
    """,
)
def sql_syntax_surface_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL syntax surface in ONE hash-checked query:
    ``VALUES`` inline tables (the lookup join every ad-hoc analysis
    starts with), ``GROUP BY ALL`` (grouping keys inferred from the
    non-aggregate select list — Spark 3.4+/SQL:2023 idiom), the
    ``stack()`` generator as the inline row-wise unpivot, and
    ``ORDER BY ALL`` — all evaluated against a longhand oracle
    (explicit GROUP BY + UNION ALL), so the syntax sugar is proven to
    MEAN its longhand form, not just parse.  Account balances ride
    the exact 1e4 integer grid (they can be negative; floor(x*1e4+.5)
    is applied identically on both engines).

    100 TB shape: the VALUES table is a literal LocalRelation
    (broadcast by construction); one hash aggregate on the inferred
    keys; stack() is a scan-stage generator with fixed fanout 2 — the
    sugar compiles to exactly the longhand plan.  Reference scope:
    flo has no SQL surface — north-star extension (SURVEY §2 Part B
    scalar/SQL)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_syn_v"
    )
    return spark.sql(
        """
        WITH tier(seg, tier) AS (
          VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'b2b'),
                 ('FURNITURE', 'retail'), ('MACHINERY', 'b2b'),
                 ('HOUSEHOLD', 'retail')
        ),
        agg AS (
          SELECT t.tier, c.c_mktsegment AS segment,
                 count(*) AS n_customers,
                 sum(CAST(floor(c.c_acctbal * 10000 + 0.5) AS BIGINT))
                     AS bal_x1e4
          FROM customer_syn_v c JOIN tier t ON t.seg = c.c_mktsegment
          GROUP BY ALL
        )
        SELECT tier, segment,
               stack(2, 'n_customers', n_customers,
                        'bal_x1e4', bal_x1e4) AS (metric, value)
        FROM agg
        ORDER BY ALL
        """
    )


@query(
    "shuffle_skew_profile",
    """
    WITH k AS (
      SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT count(*) AS n_keys, sum(cnt) AS total, max(cnt) AS max_cnt
      FROM k
    ),
    r AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt, o_custkey) AS rn
      FROM k
    ),
    q AS (
      SELECT
        max(CASE WHEN rn = CAST(ceil(0.50 * s.n_keys) AS BIGINT)
            THEN cnt END) AS p50_cnt,
        max(CASE WHEN rn = CAST(ceil(0.90 * s.n_keys) AS BIGINT)
            THEN cnt END) AS p90_cnt,
        max(CASE WHEN rn = CAST(ceil(0.99 * s.n_keys) AS BIGINT)
            THEN cnt END) AS p99_cnt
      FROM r, s
    )
    SELECT CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(s.total AS BIGINT) AS total_rows,
           CAST(s.max_cnt AS BIGINT) AS max_cnt,
           CAST(s.max_cnt * 1000000 // s.total AS BIGINT)
               AS top1_share_x1e6,
           CAST(s.max_cnt * s.n_keys * 10000 // s.total AS BIGINT)
               AS skew_factor_x1e4,
           CAST(q.p50_cnt AS BIGINT) AS p50_cnt,
           CAST(q.p90_cnt AS BIGINT) AS p90_cnt,
           CAST(q.p99_cnt AS BIGINT) AS p99_cnt
    FROM s, q
    """,
)
def shuffle_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostics — the profile you run BEFORE
    choosing a salting factor or enabling AQE skew handling: per-key
    cardinalities of a prospective shuffle key (o_custkey), reduced to
    the decision numbers — key count, hottest-key share (x1e6),
    skew factor max/mean (x1e4, = 1.0 when perfectly uniform), and
    exact p50/p90/p99 per-key counts by rank order statistic
    (ceil(q*n), the winsorized/robust-scaler discipline; the
    deterministic (cnt, key) rank makes ties engine-identical).  The
    skew_salted_join_types entry MITIGATES skew; this entry MEASURES
    it — together they are the operational loop.

    100 TB shape: one hash aggregate collapses the fact table to
    per-key counts (map-side combine, 16-byte rows); the stats over
    the KEY-cardinality frame (scalar aggregate + one rank window)
    run on |keys| rows, not |fact| rows.  The windowed rank is a
    single-partition sort of per-key counts — bounded by key
    cardinality; for billion-key profiles swap in the mergeable
    quantile sketch (quantile_sketch_mergeable) at a stated rank
    error.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B statistics)."""
    k = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    s = k.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    r = k.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("cnt").asc(), F.col("o_custkey").asc())
        ),
    )
    q = r.crossJoin(F.broadcast(s)).agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.50 * F.col("n_keys")), F.col("cnt")
            )
        ).alias("p50_cnt"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.90 * F.col("n_keys")), F.col("cnt")
            )
        ).alias("p90_cnt"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.99 * F.col("n_keys")), F.col("cnt")
            )
        ).alias("p99_cnt"),
    )
    return s.crossJoin(F.broadcast(q)).selectExpr(
        "CAST(n_keys AS BIGINT) AS n_keys",
        "CAST(total AS BIGINT) AS total_rows",
        "CAST(max_cnt AS BIGINT) AS max_cnt",
        "CAST(max_cnt * 1000000 div total AS BIGINT) AS top1_share_x1e6",
        "CAST(max_cnt * n_keys * 10000 div total AS BIGINT)"
        " AS skew_factor_x1e4",
        "CAST(p50_cnt AS BIGINT) AS p50_cnt",
        "CAST(p90_cnt AS BIGINT) AS p90_cnt",
        "CAST(p99_cnt AS BIGINT) AS p99_cnt",
    )


@query(
    "stream_late_data_drop_audit",
    """
    WITH b AS (SELECT max(ts) AS tmax FROM events),
    ok AS (
      SELECT e.ts, e.event_type FROM events e, b
      WHERE NOT (e.ts > b.tmax - INTERVAL 48 HOUR
                 AND e.ts <= b.tmax - INTERVAL 24 HOUR)
    )
    SELECT CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP)
               AS window_start,
           event_type, count(*) AS n_events
    FROM ok GROUP BY 1, 2
    """,
)
def stream_late_data_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics made deterministic and
    hash-checkable: the event stream arrives in two waves against ONE
    checkpoint — wave 1 is everything except a 24-hour "late slice"
    (tmax-48h, tmax-24h], wave 2 is that slice, delivered only AFTER
    the first drain has committed an event-time watermark of
    max(wave1.ts) - 1h.  Every wave-2 row's hourly window closed >= 23
    hours before that watermark, so the stateful aggregation MUST drop
    all of them (the append/update-mode late-row rule: window.end <=
    watermark); the final per-(window, type) counts therefore equal
    the batch aggregate over wave 1 alone, which is exactly what the
    oracle computes.  Batch boundaries are deterministic because each
    wave is one parquet file and each run drains with
    Trigger.AvailableNow; the watermark survives the restart in the
    checkpoint (the contract that makes the construction sound).  The
    dropped-row COUNT is additionally pinned via the progress metrics
    (numRowsDroppedByWatermark) in tests/test_streaming.py.

    Update-mode emissions fold into per-batch shards keyed by
    (window, type) with last-writer-wins by batch id — the replay-safe
    upsert store the SCD2/rollup entries use.  The single-row tmax
    lookup is O(1) driver metadata (documented).

    100 TB shape: the windowed aggregation carries O(open windows x
    types) state, late rows are filtered BEFORE the state store (no
    state churn from stragglers), and the shard store grows by
    changed-keys-per-batch, compactable like the sketch stores.
    Reference scope: flo delivers events in id order with no
    event-time semantics (SURVEY §1.4); watermarks are the Spark-side
    extension (SURVEY §2 Part B streaming)."""
    import datetime
    import os

    from flo_spark.queries import scratch_dir

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    # single-row metadata collect: the horizon anchor (documented —
    # O(1), same discipline as the head/status entries)
    tmax = ev.agg(F.max("ts")).collect()[0][0]
    late_lo = tmax - datetime.timedelta(hours=48)
    late_hi = tmax - datetime.timedelta(hours=24)
    in_slice = (F.col("ts") > F.lit(late_lo)) & (F.col("ts") <= F.lit(late_hi))

    tmp = scratch_dir("flo_late_audit_")
    feed, ckpt, store = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/store"
    ev.filter(~in_slice).coalesce(1).write.parquet(feed)

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

    def drain() -> None:
        src = spark.readStream.schema(ev.schema).parquet(feed)
        agg = (
            src.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        q = (
            agg.writeStream.foreachBatch(fold)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("late-audit stream did not drain")

    drain()  # wave 1: establishes watermark = max(wave1.ts) - 1h
    ev.filter(in_slice).coalesce(1).write.mode("append").parquet(feed)
    drain()  # wave 2: every row late -> dropped before the state store

    shards = [
        f"{store}/{d}"
        for d in sorted(os.listdir(store))
        if d.startswith("batch=")
    ]
    merged = None
    for s in shards:
        part = spark.read.parquet(s).withColumn(
            "bid", F.lit(int(s.rsplit("=", 1)[1]))
        )
        merged = part if merged is None else merged.unionByName(part)
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("bid").desc()
    )
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start", "event_type", "n_events")
    )


@query(
    "ams_f2_selfjoin_size",
    """
    WITH c AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM events GROUP BY event_type, user_id
    ),
    est AS (
      SELECT event_type,
             count(*) AS n_users,
             sum(cnt) AS n_rows,
             sum(CAST(cnt AS HUGEINT) * cnt) AS f2,
             sum(CASE WHEN (user_id * 48271 + 11) % 1000003 % 2 = 0
                 THEN cnt ELSE -cnt END) AS z1,
             sum(CASE WHEN (user_id * 69621 + 23) % 1000003 % 2 = 0
                 THEN cnt ELSE -cnt END) AS z2,
             sum(CASE WHEN (user_id * 40692 + 37) % 1000003 % 2 = 0
                 THEN cnt ELSE -cnt END) AS z3,
             sum(CASE WHEN (user_id * 16807 + 53) % 1000003 % 2 = 0
                 THEN cnt ELSE -cnt END) AS z4
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(f2 AS BIGINT) AS f2_exact,
           CAST((CAST(z1 AS HUGEINT) * z1 + CAST(z2 AS HUGEINT) * z2
                 + CAST(z3 AS HUGEINT) * z3 + CAST(z4 AS HUGEINT) * z4)
                // 4 AS BIGINT) AS ams_estimate
    FROM est
    """,
)
def ams_f2_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second frequency moment F2 = sum of per-key count squares — the
    SELF-JOIN SIZE of each event type on user_id, the statistic query
    optimizers need for join-cardinality estimation — computed EXACTLY
    from one count aggregate, alongside the classic AMS tug-of-war
    sketch estimate (Alon-Matias-Szegedy 1996): four +/-1 sign hashes,
    Z_k = sum of s_k(u)*c_u, estimate = mean of Z_k^2.  The sign hashes
    are DETERMINISTIC multiplicative hashes (Lehmer multipliers mod a
    prime, then parity) so the whole mechanism — sketch included — is
    reproducible and hash-checkable on both engines; real deployments
    draw the hash seeds randomly, and the estimator arithmetic (which
    is what this entry pins) is identical.  Same
    deterministic-mechanism discipline as dp_randomized_response.

    100 TB shape: the only corpus-scale shuffle is the (type, user)
    count aggregate (map-side combinable); the F2/AMS reduction runs
    on per-key counts.  The AMS path matters at scale because Z_k
    partials are MERGEABLE (a sum) without materializing per-key
    counts at all — the streaming form folds s(u) per row.  Squares
    accumulate in decimal(38,0)/HUGEINT.  Reference scope: flo has no
    analytics surface — north-star extension (SURVEY §2 Part B
    distinct/approx)."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))

    def z(mult: int, add: int, alias: str):
        sgn = (
            (F.col("user_id") * mult + add) % 1000003 % 2 == 0
        )
        return F.sum(
            F.when(sgn, F.col("cnt")).otherwise(-F.col("cnt"))
        ).alias(alias)

    est = c.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("cnt").alias("n_rows"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt")
        ).alias("f2"),
        z(48271, 11, "z1"),
        z(69621, 23, "z2"),
        z(40692, 37, "z3"),
        z(16807, 53, "z4"),
    )
    return est.selectExpr(
        "event_type",
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(f2 AS BIGINT) AS f2_exact",
        "CAST((CAST(z1 AS DECIMAL(38,0)) * z1 + CAST(z2 AS DECIMAL(38,0))"
        " * z2 + CAST(z3 AS DECIMAL(38,0)) * z3 + CAST(z4 AS"
        " DECIMAL(38,0)) * z4) div 4 AS BIGINT) AS ams_estimate",
    )


@query(
    "quantile_discretizer_encode",
    """
    WITH p AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS px
      FROM orders
    ),
    r AS (
      SELECT px, row_number() OVER (ORDER BY px, o_orderkey) AS rn FROM p
    ),
    n AS (SELECT count(*) AS n FROM p),
    b AS (
      SELECT
        max(CASE WHEN rn = CAST(ceil(0.25 * n.n) AS BIGINT)
            THEN px END) AS b1,
        max(CASE WHEN rn = CAST(ceil(0.50 * n.n) AS BIGINT)
            THEN px END) AS b2,
        max(CASE WHEN rn = CAST(ceil(0.75 * n.n) AS BIGINT)
            THEN px END) AS b3
      FROM r, n
    )
    SELECT CAST(CASE WHEN px > b3 THEN 3 WHEN px > b2 THEN 2
                     WHEN px > b1 THEN 1 ELSE 0 END AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(px) AS BIGINT) AS min_px,
           CAST(max(px) AS BIGINT) AS max_px
    FROM p, b
    GROUP BY 1
    """,
)
def quantile_discretizer_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ``QuantileDiscretizer`` semantics as a deterministic
    DataFrame program (the feature-engineering sibling of
    vocab_index_encode's StringIndexer and robust_scaler_features'
    RobustScaler): 4 equal-frequency buckets of order totals with
    split points taken as EXACT rank order statistics
    (ceil(q*n), the winsorized discipline) on the 1e4 money grid —
    where MLlib would call approxQuantile with a relativeError, this
    pins the exact-rank contract so both engines agree bit-for-bit;
    bucket(x) = number of splits strictly below x (half-open
    [s_i, s_{i+1}) intervals, MLlib's rule).  Output: per-bucket
    cardinality and the realized [min, max] scaled-price range —
    near-equal counts by construction (ties land left).

    100 TB shape: the split points come from one ranked pass (swap in
    quantile_sketch_mergeable at a stated rank error to avoid the
    sort, same trade as shuffle_skew_profile documents); the splits
    broadcast as ONE row and encoding is a scan-stage CASE — the
    encode path adds zero shuffles.  Reference scope: flo has no ML
    surface — north-star extension (SURVEY §2 Part B pipeline
    hygiene)."""
    p = load(spark, sf_dir, "orders").select(
        "o_orderkey", money_scaled(F.col("o_totalprice")).alias("px")
    )
    r = p.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("px").asc(), F.col("o_orderkey").asc())
        ),
    )
    n = p.agg(F.count("*").alias("n"))
    b = r.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.25 * F.col("n")), F.col("px"))
        ).alias("b1"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.50 * F.col("n")), F.col("px"))
        ).alias("b2"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.75 * F.col("n")), F.col("px"))
        ).alias("b3"),
    )
    return (
        p.crossJoin(F.broadcast(b))
        .withColumn(
            "bucket",
            F.when(F.col("px") > F.col("b3"), 3)
            .when(F.col("px") > F.col("b2"), 2)
            .when(F.col("px") > F.col("b1"), 1)
            .otherwise(0)
            .cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("px").cast("long").alias("min_px"),
            F.max("px").cast("long").alias("max_px"),
        )
    )


@query(
    "source_overlap_matrix",
    r"""
    WITH toks AS (
      SELECT source, doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT source,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM toks, unnest(range(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 3
    ),
    sizes AS (
      SELECT source, count(*) AS n_sh FROM sh GROUP BY source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n_sh AS BIGINT) AS shingles_a,
           CAST(sb.n_sh AS BIGINT) AS shingles_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(sa.n_sh + sb.n_sh - i.n_inter AS BIGINT) AS n_union,
           CAST(i.n_inter * 10000
                // (sa.n_sh + sb.n_sh - i.n_inter) AS BIGINT)
               AS jaccard_x1e4
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET-level overlap accounting — the contamination/provenance
    matrix run before mixing corpora: for every ordered pair of
    sources, the exact Jaccard overlap of their distinct 3-word
    shingle sets (set sizes, intersection, union, 1e-4-grid
    similarity).  The per-DOC near-dup entries ask "is this document a
    copy"; this asks "how much does corpus A repeat corpus B" — the
    number that decides whether two feeds are the same crawl.

    100 TB shape: shingles collapse to (source, shingle-hash) DISTINCT
    rows in the scan+one-shuffle stage — per-source shingle VOCABULARY
    size, not corpus size; the intersection self-join keys on the
    8-byte xxhash64 shingle hash (Spark side; the oracle joins the
    shingle strings themselves — the standard hash-vs-string
    equivalence of the n-gram entries, collision odds ~2^-64); output
    is |sources|^2 rows.  At pair-heavy scale swap exact intersection
    for theta-sketch A-and-B (theta_sketch_audience_overlap) at a
    stated error.  Reference scope: flo has no corpus surface —
    north-star extension (SURVEY §2 Part B dedup/mixing)."""
    toks = load(spark, sf_dir, "documents").select(
        "source",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias(
            "ws"
        ),
    )
    sh = (
        toks.filter(F.size("ws") >= 3)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3),"
                    " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                )
            ).alias("shingle"),
        )
        .select("source", F.xxhash64("shingle").alias("sh"))
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.selectExpr("source AS source_a", "n_sh AS na")
    sb = sizes.selectExpr("source AS source_b", "n_sh AS nb")
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .selectExpr(
            "source_a",
            "source_b",
            "CAST(na AS BIGINT) AS shingles_a",
            "CAST(nb AS BIGINT) AS shingles_b",
            "CAST(n_inter AS BIGINT) AS n_inter",
            "CAST(na + nb - n_inter AS BIGINT) AS n_union",
            "CAST(n_inter * 10000 div (na + nb - n_inter) AS BIGINT)"
            " AS jaccard_x1e4",
        )
    )


@query(
    "embedding_jl_projection",
    """
    WITH q AS (
      SELECT vec_id, i - 1 AS i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS qv
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    j AS (SELECT unnest(range(0, 16)) AS dim)
    SELECT q.vec_id, CAST(j.dim AS INT) AS dim,
           CAST(sum(CASE WHEN (q.i * 1103515245 + j.dim * 12345)
                              % 97 % 2 = 0
                    THEN qv ELSE -qv END) AS BIGINT) AS proj_x1e4
    FROM q, j
    GROUP BY q.vec_id, j.dim
    """,
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims — the
    dimensionality-reduction front end for ANN/clustering at scale
    (Achlioptas 2001: +/-1 sign matrices satisfy the JL lemma; the
    sign matrix here is a DETERMINISTIC multiplicative hash of
    (input_dim, output_dim), the dp_randomized_response discipline,
    so the projection is reproducible and hash-checkable — production
    draws the seed once and broadcasts nothing either way, the matrix
    never materializes).  Components quantize to the exact 1e4 grid
    first, so every projected coordinate is an exact integer on both
    engines — no float fold order anywhere.

    100 TB shape: entirely scan-stage JVM higher-order functions
    (transform over output dims, aggregate over the zipped input) —
    NO shuffle, no UDF, no materialized projection matrix; output is
    16/64 the input width, which is the point (the int8/PQ entries
    compress per-component precision; this compresses dimensionality
    — composable).  Reference scope: flo has no vector surface —
    north-star extension (SURVEY §2 Part B embedding analytics)."""
    e = load(spark, sf_dir, "embeddings")
    q = F.expr(
        "transform(embedding,"
        " e -> CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT))"
    )
    proj = F.expr(
        "transform(sequence(0, 15), j -> aggregate("
        " zip_with(q, sequence(0, size(q) - 1),"
        "          (qv, i) -> CASE WHEN (CAST(i AS BIGINT) * 1103515245"
        "                                + CAST(j AS BIGINT) * 12345)"
        "                               % 97 % 2 = 0"
        "                     THEN qv ELSE -qv END),"
        " 0L, (acc, x) -> acc + x))"
    )
    return (
        e.select("vec_id", q.alias("q"))
        .select("vec_id", F.posexplode(proj).alias("dim", "proj_x1e4"))
        .select(
            "vec_id",
            F.col("dim").cast("int").alias("dim"),
            F.col("proj_x1e4").cast("long").alias("proj_x1e4"),
        )
    )


@query(
    "theil_sen_hourly_trend",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    h0 AS (SELECT min(h) AS h0 FROM c),
    p AS (
      SELECT ((b.cnt - a.cnt) * 1000000
              + 1000000000000 * (b.h - a.h)) // (b.h - a.h)
             - 1000000000000 AS s
      FROM c a JOIN c b ON b.h > a.h
    ),
    m AS (SELECT count(*) AS n_pairs FROM p),
    r AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM p),
    sen AS (
      SELECT r.s AS sen FROM r, m WHERE r.rn = (m.n_pairs + 1) // 2
    ),
    ic AS (
      SELECT c.cnt * 1000000 - sen.sen * (c.h - h0.h0) AS b
      FROM c, sen, h0
    ),
    icn AS (SELECT count(*) AS n_hours FROM ic),
    ir AS (SELECT b, row_number() OVER (ORDER BY b) AS rn FROM ic),
    icb AS (
      SELECT ir.b AS icpt FROM ir, icn WHERE ir.rn = (icn.n_hours + 1) // 2
    )
    SELECT CAST(icn.n_hours AS BIGINT) AS n_hours,
           CAST(m.n_pairs AS BIGINT) AS n_pairs,
           CAST(sen.sen AS BIGINT) AS sen_slope_x1e6,
           CAST(icb.icpt AS BIGINT) AS intercept_x1e6
    FROM icn, m, sen, icb
    """,
)
def theil_sen_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the hourly event rate: the (lower)
    median of all pairwise slopes (c_j - c_i)/(h_j - h_i) over the
    hourly-count series, ENGINE-EXACT on the 1e-6 grid.  Each slope is
    floored onto the grid by a nonnegative-operand division — the
    numerator is offset by 1e12*(h_j - h_i) so DuckDB's floor ``//``
    and Spark's truncating ``div`` agree (valid while hourly counts
    stay below 1e6; see welch_t2_ab_test for the discipline) — and the
    median of the gridded integers is an exact rank pick, so the
    breakdown-point-0.29 estimator that outlier hours cannot drag
    (unlike the OLS slope) hash-matches across engines.  The intercept
    is the lower median of cnt_i*1e6 - sen*(h_i - h0): the robust
    level at the window start on the same grid.

    100 TB shape: one map-side-combinable hourly count collapses the
    corpus to a calendar-bounded spine (720 rows/month at ANY SF); the
    O(spine^2) pair join and the rank medians run on that spine —
    ~260k pairs, one broadcast nested loop + one single-partition
    sort, all driver-free.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B statistics,
    robust counterpart to holt_linear_trend's least-squares fit)."""
    OFF = 1_000_000_000_000
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        # the spine feeds FOUR branches (pair sides, h0, intercepts);
        # without a persist each branch re-scans the corpus —
        # plan-pinned in tests/test_plans.py
        .persist()
    )
    h0 = c.agg(F.min("h").alias("h0"))
    a = c.select(F.col("h").alias("ha"), F.col("cnt").alias("ca"))
    b = c.select(F.col("h").alias("hb"), F.col("cnt").alias("cb"))
    p = a.join(b, F.col("hb") > F.col("ha")).select(
        (
            F.expr(
                f"((cb - ca) * 1000000 + {OFF} * (hb - ha))"
                " div (hb - ha)"
            )
            - F.lit(OFF)
        ).alias("s")
    )
    m = p.agg(F.count("*").alias("n_pairs"))
    r = p.select(
        "s", F.row_number().over(Window.orderBy("s")).alias("rn")
    )
    sen = (
        r.crossJoin(F.broadcast(m))
        .filter(F.expr("rn = (n_pairs + 1) div 2"))
        .select(F.col("s").alias("sen"), "n_pairs")
    )
    ic = c.crossJoin(F.broadcast(sen)).crossJoin(F.broadcast(h0)).select(
        (F.col("cnt") * 1_000_000 - F.col("sen") * (F.col("h") - F.col("h0"))).alias("b"),
        "sen",
        "n_pairs",
    )
    icn = ic.groupBy("sen", "n_pairs").agg(F.count("*").alias("n_hours"))
    ir = ic.select(
        "b", "sen", "n_pairs",
        F.row_number().over(Window.orderBy("b")).alias("rn"),
    )
    return (
        ir.crossJoin(F.broadcast(icn.select("n_hours")))
        .filter(F.expr("rn = (n_hours + 1) div 2"))
        .select(
            F.col("n_hours").cast("long").alias("n_hours"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("sen").cast("long").alias("sen_slope_x1e6"),
            F.col("b").cast("long").alias("intercept_x1e6"),
        )
    )


@query(
    "ks_drift_priority",
    """
    WITH s AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS px,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS i1,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS i2
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    n AS (SELECT sum(i1) AS n1, sum(i2) AS n2 FROM s),
    g AS (SELECT px, sum(i1) AS c1, sum(i2) AS c2 FROM s GROUP BY px),
    cum AS (
      SELECT px,
             sum(c1) OVER (ORDER BY px) AS cc1,
             sum(c2) OVER (ORDER BY px) AS cc2
      FROM g
    ),
    d AS (
      SELECT px, abs(cc1 * n.n2 - cc2 * n.n1) AS dn FROM cum, n
    ),
    best AS (SELECT px, dn FROM d ORDER BY dn DESC, px LIMIT 1)
    SELECT CAST(n.n1 AS BIGINT) AS n_1,
           CAST(n.n2 AS BIGINT) AS n_2,
           CAST(best.dn AS BIGINT) AS ks_num,
           CAST((best.dn * 1000000) // (n.n1 * n.n2) AS BIGINT)
             AS ks_x1e6,
           CAST(best.px AS BIGINT) AS ks_at_cents,
           CAST(best.dn AS HUGEINT) * best.dn * 1000000
             > CAST(1844164 AS HUGEINT) * (n.n1 + n.n2) * n.n1 * n.n2
             AS ks_reject_005
    FROM best, n
    """,
)
def ks_drift_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the total-price
    distributions of '1-URGENT' and '5-LOW' orders, ENGINE-EXACT: on
    the cents grid D = max_x |F1(x) - F2(x)| has the exact integer
    numerator max|C1(x)*n2 - C2(x)*n1| over the merged support (the
    max always lands on an observed point), so the statistic, its
    location (smallest cents value attaining the max), and even the
    alpha=0.05 REJECTION VERDICT — dn^2*1e6 > 1.358^2*1e6*(n1+n2)*n1*n2
    cross-multiplied into decimal(38,0)/HUGEINT, no square root —
    hash-match across engines.  This is the distribution-drift gate a
    training pipeline runs between data refreshes; the chi-square
    entry (chi_square_crosstab_audit) covers categorical drift, this
    covers continuous drift.

    100 TB shape: one map-side-combinable (cents, side) count shuffle
    collapses the corpus to its distinct price points; the cumulative
    ECDF walk is a single-partition window over that spine (swap in
    the mergeable quantile sketch when the DOMAIN itself is corpus-
    scale), and the verdict is a 1-row reduce.  Reference scope: flo
    has no analytics surface — north-star extension (SURVEY §2 Part B
    statistics)."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    s = o.select(
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("px"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("i1"),
        F.when(F.col("o_orderpriority") == "5-LOW", 1)
        .otherwise(0)
        .alias("i2"),
    )
    s = s.persist()  # totals + per-cents counts share one scan
    n = s.agg(F.sum("i1").alias("n1"), F.sum("i2").alias("n2"))
    g = s.groupBy("px").agg(
        F.sum("i1").alias("c1"), F.sum("i2").alias("c2")
    )
    w = Window.orderBy("px")
    cum = g.select(
        "px",
        F.sum("c1").over(w).alias("cc1"),
        F.sum("c2").over(w).alias("cc2"),
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "px",
        "n1",
        "n2",
        F.abs(F.col("cc1") * F.col("n2") - F.col("cc2") * F.col("n1")).alias("dn"),
    )
    best = d.orderBy(F.col("dn").desc(), F.col("px")).limit(1)
    return best.selectExpr(
        "CAST(n1 AS BIGINT) AS n_1",
        "CAST(n2 AS BIGINT) AS n_2",
        "CAST(dn AS BIGINT) AS ks_num",
        "CAST((dn * 1000000) div (n1 * n2) AS BIGINT) AS ks_x1e6",
        "CAST(px AS BIGINT) AS ks_at_cents",
        "CAST(dn AS DECIMAL(38,0)) * dn * 1000000"
        " > CAST(1844164 AS DECIMAL(38,0)) * (n1 + n2) * n1 * n2"
        " AS ks_reject_005",
    )


@query(
    "decision_stump_status",
    """
    WITH o AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 1000000
               AS t,
             o_orderstatus AS s
      FROM orders
    ),
    cls AS (SELECT t, s, count(*) AS c FROM o GROUP BY t, s),
    ts AS (SELECT DISTINCT t FROM o),
    ss AS (SELECT DISTINCT s FROM o),
    grid AS (SELECT ts.t, ss.s FROM ts, ss),
    cum AS (
      SELECT g.t, g.s,
             sum(coalesce(cls.c, 0))
               OVER (PARTITION BY g.s ORDER BY g.t) AS lc
      FROM grid g LEFT JOIN cls ON cls.t = g.t AND cls.s = g.s
    ),
    tot AS (SELECT s, count(*) AS tc FROM o GROUP BY s),
    per AS (
      SELECT cum.t,
             sum(lc) AS nl, max(lc) AS maxl,
             sum(tc - lc) AS nr, max(tc - lc) AS maxr
      FROM cum JOIN tot ON tot.s = cum.s
      GROUP BY cum.t
    ),
    scored AS (
      SELECT t, nl, nr, maxl, maxr,
             (nl - maxl) + (nr - maxr) AS mis
      FROM per WHERE nr > 0
    ),
    best AS (SELECT * FROM scored ORDER BY mis, t LIMIT 1),
    base AS (
      SELECT (SELECT count(*) FROM o) - max(tc) AS base_mis FROM tot
    )
    SELECT CAST((best.t + 1) * 10000 AS BIGINT) AS threshold_usd,
           CAST(best.nl AS BIGINT) AS n_left,
           CAST(best.nr AS BIGINT) AS n_right,
           (SELECT min(cum.s) FROM cum, best b2
             WHERE cum.t = b2.t AND cum.lc = b2.maxl) AS left_label,
           (SELECT min(cum.s) FROM cum JOIN tot ON tot.s = cum.s, best b3
             WHERE cum.t = b3.t AND tot.tc - cum.lc = b3.maxr)
             AS right_label,
           CAST(best.mis AS BIGINT) AS misclass,
           CAST(base.base_mis AS BIGINT) AS baseline_misclass
    FROM best, base
    """,
)
def decision_stump_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-split decision stump predicting o_orderstatus from
    o_totalprice, ENGINE-EXACT: candidate thresholds are the $10,000
    bucket boundaries, the split criterion is the MISCLASSIFICATION
    impurity sum_{side}(n_side - max_c n_{c,side}) — a pure integer, so
    the exact argmin (tie-break: lowest threshold) and the majority
    labels (tie-break: lexicographically smallest among argmax classes)
    hash-match across engines where a Gini/entropy stump's per-split
    rational denominators could not be totally ordered in SQL without
    floats.  The full CART recursion is this primitive applied per
    node; one level is what a feature-importance triage needs.

    100 TB shape: one map-side-combinable (bucket, class) count
    collapses the corpus to a |buckets| x |classes| grid (~150 rows at
    ANY SF); cumulative left-counts, per-threshold scoring, and the
    argmin all run on that grid — the same aggregate-then-spine shape
    as the histogram entries; nothing corpus-scale moves twice.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B, the supervised counterpart to
    quantile_discretizer_encode's unsupervised binning)."""
    o = load(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            " div 1000000"
        ).alias("t"),
        F.col("o_orderstatus").alias("s"),
        # the bucket/class/total/label branches all re-derive this
        # projection; persist or the fact re-scans 20x (plan-pinned)
    ).persist()
    cls = o.groupBy("t", "s").agg(F.count("*").alias("c")).persist()
    ts = o.select("t").distinct()
    ss = o.select("s").distinct()
    grid = ts.crossJoin(ss)
    cum = grid.join(cls, ["t", "s"], "left").select(
        "t",
        "s",
        F.sum(F.coalesce(F.col("c"), F.lit(0)))
        .over(Window.partitionBy("s").orderBy("t"))
        .alias("lc"),
    )
    tot = o.groupBy("s").agg(F.count("*").alias("tc"))
    joined = cum.join(tot, "s")
    per = joined.groupBy("t").agg(
        F.sum("lc").alias("nl"),
        F.max("lc").alias("maxl"),
        F.sum(F.col("tc") - F.col("lc")).alias("nr"),
        F.max(F.col("tc") - F.col("lc")).alias("maxr"),
    )
    scored = per.filter(F.col("nr") > 0).select(
        "t", "nl", "nr", "maxl", "maxr",
        ((F.col("nl") - F.col("maxl")) + (F.col("nr") - F.col("maxr"))).alias("mis"),
    )
    best = scored.orderBy("mis", "t").limit(1)
    left_lab = (
        best.select("t", "maxl")
        .join(cum, ["t"])
        .filter(F.col("lc") == F.col("maxl"))
        .agg(F.min("s").alias("left_label"))
    )
    right_lab = (
        best.select("t", "maxr")
        .join(joined, ["t"])
        .filter(F.col("tc") - F.col("lc") == F.col("maxr"))
        .agg(F.min("s").alias("right_label"))
    )
    base = (
        tot.agg(
            F.sum("tc").alias("n_all"), F.max("tc").alias("max_tc")
        ).select((F.col("n_all") - F.col("max_tc")).alias("base_mis"))
    )
    return (
        best.crossJoin(F.broadcast(left_lab))
        .crossJoin(F.broadcast(right_lab))
        .crossJoin(F.broadcast(base))
        .select(
            ((F.col("t") + 1) * 10000).cast("long").alias("threshold_usd"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            "left_label",
            "right_label",
            F.col("mis").cast("long").alias("misclass"),
            F.col("base_mis").cast("long").alias("baseline_misclass"),
        )
    )


@query(
    "ols_two_feature_cramer",
    """
    WITH v AS (
      SELECT CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x1,
             CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) AS x2,
             CAST(floor(l_extendedprice * 10000 + 0.5) AS HUGEINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
             sum(x1 * x2) AS s12,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM v
    ),
    det AS (
      SELECT n, s1, s2,
        n * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2) AS dm,
        sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y) AS d0,
        n * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2) AS d1,
        n * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2) AS d2
      FROM s
    ),
    c AS (
      SELECT n, dm,
        (d0 + 1000000000000 * dm) // dm AS q0,
        (d0 + 1000000000000 * dm) % dm AS r0,
        (d1 + 1000000000000 * dm) // dm AS q1,
        (d1 + 1000000000000 * dm) % dm AS r1,
        (d2 + 1000000000000 * dm) // dm AS q2,
        (d2 + 1000000000000 * dm) % dm AS r2
      FROM det
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(q0 * 1000000 + (r0 * 1000000) // dm
                - 1000000000000000000 AS BIGINT) AS b0_x1e6,
           CAST(q1 * 1000000 + (r1 * 1000000) // dm
                - 1000000000000000000 AS BIGINT) AS b1_x1e6,
           CAST(q2 * 1000000 + (r2 * 1000000) // dm
                - 1000000000000000000 AS BIGINT) AS b2_x1e6
    FROM c
    """,
)
def ols_two_feature_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression — extended price (1e4 money grid) on
    quantity and discount-percent — solved in closed form by CRAMER'S
    RULE over the 3x3 normal equations, ENGINE-EXACT: the nine power
    sums accumulate as exact integers in decimal(38,0)/HUGEINT, the
    four determinants are integer polynomials of those sums, and each
    coefficient det_k/det(M) lands on the 1e-6 grid through a
    nonnegative-operand floor-division chain (offset by 1e12*det(M),
    i.e. coefficients must stay within ±1e12 grid units — they are
    ~1e9 here; two-step q*1e6 + (r*1e6)//dm keeps every intermediate
    under 38 digits where the naive det*1e6 would overflow).  Extends
    regression_price_quantity (one regressor) to the genuinely
    multivariate case where collinearity between regressors matters;
    det(M) > 0 is Gram positive-definiteness.

    100 TB shape: identical to q6 — ONE map-side-combinable aggregate
    over the fact scan producing nine integer partials, a single-row
    combine, then O(1) driver-free arithmetic; adding regressors grows
    the partial vector quadratically but never adds a pass or a
    shuffle.  This is the textbook reason normal-equation OLS beats
    gradient descent on Spark for small feature counts.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B statistics)."""
    li = load(spark, sf_dir, "lineitem")
    d = lambda c: c.cast("decimal(38,0)")
    v = li.select(
        d(F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).alias("x1"),
        d(F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")).alias("x2"),
        d(money_scaled(F.col("l_extendedprice"))).alias("y"),
    )
    s = v.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    det = s.selectExpr(
        "n",
        "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2) AS dm",
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y) AS d0",
        "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2) AS d1",
        "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2) AS d2",
    )
    c = det.selectExpr(
        "n",
        "dm",
        "(d0 + 1000000000000 * dm) div dm AS q0",
        "(d0 + 1000000000000 * dm) % dm AS r0",
        "(d1 + 1000000000000 * dm) div dm AS q1",
        "(d1 + 1000000000000 * dm) % dm AS r1",
        "(d2 + 1000000000000 * dm) div dm AS q2",
        "(d2 + 1000000000000 * dm) % dm AS r2",
    )
    return c.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(q0 * 1000000 + (r0 * 1000000) div dm"
        " - 1000000000000000000 AS BIGINT) AS b0_x1e6",
        "CAST(q1 * 1000000 + (r1 * 1000000) div dm"
        " - 1000000000000000000 AS BIGINT) AS b1_x1e6",
        "CAST(q2 * 1000000 + (r2 * 1000000) div dm"
        " - 1000000000000000000 AS BIGINT) AS b2_x1e6",
    )


@query(
    "multimodal_tga_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 128)) AS i FROM documents
    ),
    rgb AS (
      SELECT doc_id,
             CASE WHEN i % 16 < 6 THEN (doc_id * 5) % 256
                  ELSE (doc_id + i * 11) % 256 END AS r,
             CASE WHEN i % 16 < 6 THEN (doc_id * 5 + 1) % 256
                  ELSE (i * 29 + 3) % 256 END AS g,
             CASE WHEN i % 16 < 6 THEN (doc_id * 5 + 2) % 256
                  ELSE (doc_id * 7 + i * 53) % 256 END AS b
      FROM s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r + g + b) AS BIGINT) AS sum_rgb
    FROM rgb GROUP BY doc_id
    """,
)
def multimodal_tga_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Truevision TGA round trip, hash-checked: per document a
    16x8 RGB image encodes through an actual RLE true-color TGA 2.0
    container (type 10, BGR storage, top-left origin, footer
    signature) and decodes back through ``decode_image``; summing the
    recovered channels must reproduce the generating formula.  Each
    scanline's first 6 pixels are a constant color (folded into RLE
    run packets) and the rest vary per pixel (raw packets), so both
    packet kinds, the 128-pixel cap logic, and the BGR<->RGB swap are
    on the hash path.  The decoder's color-mapped/16-bit/bottom-up
    variants are unit-tested in tests/test_media_decode.py.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle (the groupBy is
    batch-local by construction), binary payloads opaque to the
    scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_tga

    W, H = 16, 8

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        run = i % 16 < 6
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_rgb": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                r = np.where(run, (d * 5) % 256, (d + i * 11) % 256)
                g = np.where(run, (d * 5 + 1) % 256, (i * 29 + 3) % 256)
                b = np.where(run, (d * 5 + 2) % 256, (d * 7 + i * 53) % 256)
                img = (
                    np.stack([r, g, b], axis=1)
                    .astype(np.uint8)
                    .reshape(H, W, 3)
                )
                got = decode_image(encode_tga(img, rle=True))
                out["doc_id"].append(d)
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_rgb"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_rgb long"
    )


@query(
    "stream_stream_full_outer_attribution",
    """
    WITH m AS (
      SELECT least(max(CASE WHEN event_type = 'click' THEN ts END),
                   max(CASE WHEN event_type = 'purchase' THEN ts END))
               AS mx
      FROM events
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT coalesce(c.user_id, p.user_id) AS user_id,
             c.click_id, p.purchase_id, c.cts, p.pts
      FROM c FULL JOIN p
        ON p.user_id = c.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 30 MINUTE
    )
    SELECT j.user_id, j.click_id, j.purchase_id
    FROM j, m
    WHERE coalesce(j.cts < m.mx - INTERVAL 95 MINUTE, TRUE)
      AND coalesce(j.pts < m.mx - INTERVAL 95 MINUTE, TRUE)
    """,
)
def stream_stream_full_outer_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join — the set-complete
    attribution relation: matched click->purchase pairs, clicks with
    no purchase in their 30-minute window (purchase_id null), AND
    purchases with no preceding click (click_id null).  Pads on each
    side can only emit once the watermark proves no match can still
    arrive, so the decidable-region contract from the left-outer
    entry now applies to BOTH sides: a drained row is comparable iff
    every non-null event time sits below the final global watermark
    position minus margin (coalesce(ts < cutoff, TRUE) per side,
    cutoff = least(max click ts, max purchase ts) - 95 min > the 60
    min state retention + 30 min window).  Matched pairs emit when the
    match arrives and pass the same filter on both engines, so the
    three row populations stay consistent under one predicate.

    100 TB shape: state on each side is O(watermark window), never
    O(stream) — the eviction property that makes an unbounded
    full-outer stream join runnable; the cutoff frame is 1 row.
    Reference scope: flo's consume surface feeds Spark streams
    (SURVEY §2 Part B stream-stream joins); the outer-join semantics
    are Structured Streaming's, pinned here against a batch oracle."""
    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts >= click_ts "
            "AND p_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
        "fullOuter",
    ).select(
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("u"),
        "click_id",
        "purchase_id",
        "click_ts",
        "p_ts",
    )
    res = run_to_memory(
        joined, await_new=False, output_mode="append", shuffle_partitions=8
    )
    mx = load(spark, sf_dir, "events").agg(
        F.least(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        ).alias("mx")
    )
    cut = F.col("mx") - F.expr("INTERVAL 95 MINUTES")
    return (
        res.crossJoin(F.broadcast(mx))
        .filter(
            F.coalesce(F.col("click_ts") < cut, F.lit(True))
            & F.coalesce(F.col("p_ts") < cut, F.lit(True))
        )
        .select(
            F.col("u").alias("user_id"), "click_id", "purchase_id"
        )
    )


@query(
    "degree_assortativity_copurchase",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT lo AS src, hi AS dst FROM e
      UNION ALL
      SELECT hi AS src, lo AS dst FROM e
    ),
    deg AS (SELECT src AS n, count(*) AS d FROM sym GROUP BY src),
    ends AS (
      SELECT CAST(dj.d AS HUGEINT) AS j, CAST(dk.d AS HUGEINT) AS k
      FROM sym s
      JOIN deg dj ON dj.n = s.src
      JOIN deg dk ON dk.n = s.dst
    ),
    s AS (
      SELECT count(*) AS m, sum(j) AS sj, sum(j * k) AS sjk,
             sum(j * j) AS sjj
      FROM ends
    )
    SELECT CAST(m AS BIGINT) AS m_ends,
           CAST(m * sjk - sj * sj AS BIGINT) AS num,
           CAST(m * sjj - sj * sj AS BIGINT) AS den,
           CAST(CASE WHEN m * sjk - sj * sj >= 0
                THEN ((m * sjk - sj * sj) * 1000000)
                     // (m * sjj - sj * sj)
                ELSE -(((sj * sj - m * sjk) * 1000000)
                       // (m * sjj - sj * sj)) END AS BIGINT)
             AS assortativity_x1e6
    FROM s
    """,
)
def degree_assortativity_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity (Newman 2002) of the part co-purchase
    graph, ENGINE-EXACT: over the symmetric directed edge list every
    edge contributes its endpoint degrees (j, k), and because each
    undirected edge appears in both orientations the j- and k-marginals
    are IDENTICAL — so Pearson's r = (M*Sjk - Sj*Sk) /
    sqrt((M*Sjj - Sj^2)(M*Skk - Sk^2)) collapses to the square-root-
    free exact rational (M*Sjk - Sj^2) / (M*Sjj - Sj^2), reported on
    the 1e-6 grid with the toward-zero signed-division idiom (negative
    assortativity = hubs attach to leaves, the usual shape of
    co-occurrence graphs).  All moments accumulate in
    decimal(38,0)/HUGEINT.

    100 TB shape: degrees are one count shuffle over the symmetric
    edges; the (j, k) pairing is two keyed joins of the edge list
    against the degree table (src then dst — the same
    join-degree-then-reduce shape as linkpred_resource_allocation);
    the moment reduce is map-side combinable into a single row.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B graph analytics: the global mixing
    diagnostic next to the local triangle/k-core/LPA structure)."""
    li = load(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a = lp.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = lp.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select(F.col("pa").alias("lo"), F.col("pb").alias("hi"))
        .persist()
    )
    # the symmetric edge frame feeds the degree count AND both sides
    # of the (j, k) pairing; the degree table joins twice — persist
    # both or the lineitem fact re-scans once per branch (12 scans
    # unpersisted; plan-pinned to ONE in tests/test_plans.py)
    sym = e.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).unionAll(
        e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
    ).persist()
    deg = (
        sym.groupBy("src")
        .agg(F.count("*").alias("d"))
        .withColumnRenamed("src", "n")
        .persist()
    )
    dd = lambda c: F.col(c).cast("decimal(38,0)")
    ends = (
        sym.join(deg.select(F.col("n").alias("src"), F.col("d").alias("dj")), "src")
        .join(deg.select(F.col("n").alias("dst"), F.col("d").alias("dk")), "dst")
        .select(dd("dj").alias("j"), dd("dk").alias("k"))
    )
    s = ends.agg(
        F.count("*").cast("decimal(38,0)").alias("m"),
        F.sum("j").alias("sj"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum(F.col("j") * F.col("j")).alias("sjj"),
    )
    return s.selectExpr(
        "CAST(m AS BIGINT) AS m_ends",
        "CAST(m * sjk - sj * sj AS BIGINT) AS num",
        "CAST(m * sjj - sj * sj AS BIGINT) AS den",
        "CAST(CASE WHEN m * sjk - sj * sj >= 0"
        " THEN ((m * sjk - sj * sj) * 1000000) div (m * sjj - sj * sj)"
        " ELSE -(((sj * sj - m * sjk) * 1000000)"
        " div (m * sjj - sj * sj)) END AS BIGINT)"
        " AS assortativity_x1e6",
    )


@query(
    "stream_chained_window_rollup",
    """
    WITH h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT CAST(date_trunc('day', hour) AS TIMESTAMP) AS day_start,
             event_type,
             max(n_events) AS peak_hourly,
             count(*) AS n_hours
      FROM h GROUP BY 1, 2
    ),
    m AS (SELECT max(ts) AS mx FROM events)
    SELECT d.day_start, d.event_type,
           CAST(d.peak_hourly AS BIGINT) AS peak_hourly,
           CAST(d.n_hours AS BIGINT) AS n_hours
    FROM d, m
    WHERE d.day_start + INTERVAL 1 DAY <= m.mx - INTERVAL 2 HOUR
    """,
)
def stream_chained_window_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHAINED stateful aggregations in one streaming query (Spark 4
    multiple-stateful-operator support): a watermarked 1-hour tumbling
    count per event type feeds a SECOND windowed aggregation —
    window(w, '1 day') over the inner window column — producing each
    day's peak hourly rate and hour coverage without ever leaving the
    stream.  Chaining REQUIRES append mode (complete mode cannot
    propagate watermarks through the first aggregate), so the drained
    result is restricted — identically in the oracle — to days whose
    end sits at or below the final watermark (max ts - 2h): the region
    where the outer windows provably closed and emitted.  The
    single-aggregation entries (stream_tumbling_counts,
    stream_rollup_hourly) drain in complete mode and dodge this; the
    chained form is the one that needs the discipline.

    100 TB shape: two stateful operators, each keyed by (window,
    type) — state is O(open windows x types) per operator, not
    O(stream); the day rollup consumes the hourly aggregate's already
    tiny output, so the second shuffle moves spine-sized data.
    Reference scope: flo's consume surface feeds Spark streams; the
    chained-operator semantics are Structured Streaming's, pinned
    against a batch oracle."""
    from flo_spark.queries import _events_stream
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    hourly = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.col("w"), "1 day").alias("day"), "event_type"
        )
        .agg(
            F.max("n_events").alias("peak_hourly"),
            F.count("*").alias("n_hours"),
        )
        .select(
            F.col("day.start").alias("day_start"),
            F.col("day.end").alias("day_end"),
            "event_type",
            "peak_hourly",
            "n_hours",
        )
    )
    res = run_to_memory(
        daily, await_new=False, output_mode="append", shuffle_partitions=8
    )
    mx = load(spark, sf_dir, "events").agg(F.max("ts").alias("mx"))
    return (
        res.crossJoin(F.broadcast(mx))
        .filter(F.col("day_end") <= F.col("mx") - F.expr("INTERVAL 2 HOURS"))
        .select(
            "day_start",
            "event_type",
            F.col("peak_hourly").cast("long").alias("peak_hourly"),
            F.col("n_hours").cast("long").alias("n_hours"),
        )
    )


@query(
    "multimodal_avi_roundtrip",
    """
    WITH fr AS (
      SELECT doc_id, unnest([0, 1, 2]) AS frame_idx FROM documents
    ),
    px AS (
      SELECT doc_id, frame_idx, unnest(range(0, 48)) AS i FROM fr
    ),
    s AS (
      SELECT doc_id, frame_idx,
             sum((doc_id * 11 + frame_idx * 17 + i) % 256
                 + (doc_id * 13 + frame_idx * 19 + 2 * i) % 256
                 + (doc_id * 17 + frame_idx * 23 + 3 * i) % 256)
               AS sum_rgb
      FROM px GROUP BY doc_id, frame_idx
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(48 AS BIGINT) AS n_pixels,
           CAST(sum_rgb AS BIGINT) AS sum_rgb
    FROM s
    """,
)
def multimodal_avi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI round trip, hash-checked — the second moving-picture
    container after Y4M, this one a structured RIFF chunk tree rather
    than a byte stream: per document a 3-frame 8x6 RGB video
    (R = (doc*11 + frame*17 + i) % 256, G/B from sibling formulas)
    encodes through an actual AVI file — MainAVIHeader,
    AVIStreamHeader, BITMAPINFOHEADER, 'movi' LIST of 00db DIB chunks
    (bottom-up BGR rows padded to 4-byte stride; width 6 forces real
    padding), idx1 keyframe index — and decodes back through
    ``decode_video``'s RIFF walker.  Per-frame pixel sums must
    reproduce the generating formula: a chunk-size, stride-padding,
    row-order, or BGR-swap defect breaks the hash.  Top-down DIBs,
    32-bit BGRX frames, and compressed-stream refusal are unit-tested
    in tests/test_media_decode.py.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle (each doc's frames
    never leave its batch), binary payloads opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_video, encode_avi

    W, H, NF = 6, 8, 3

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        for pdf in it:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "n_pixels": [],
                "sum_rgb": [],
            }
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                frames = []
                for f in range(NF):
                    r = (d * 11 + f * 17 + i) % 256
                    g = (d * 13 + f * 19 + 2 * i) % 256
                    b = (d * 17 + f * 23 + 3 * i) % 256
                    frames.append(
                        np.stack([r, g, b], axis=1)
                        .astype(np.uint8)
                        .reshape(H, W, 3)
                    )
                got, meta = decode_video(encode_avi(frames))
                for f, fr in enumerate(got):
                    out["doc_id"].append(d)
                    out["frame_idx"].append(f)
                    out["n_pixels"].append(
                        int(fr.shape[0] * fr.shape[1])
                    )
                    out["sum_rgb"].append(int(fr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip,
        "doc_id long, frame_idx int, n_pixels long, sum_rgb long",
    )


@query(
    "kmeans_lloyd_rounds",
    """
    WITH p AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
                  AS BIGINT) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    seed AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
    ),
    c0 AS (
      SELECT s.cid, p.dim, p.x AS c
      FROM seed s JOIN p ON p.vec_id = s.vec_id
    ),
    d1 AS (
      SELECT p.vec_id, c.cid,
             sum((p.x - c.c) * (p.x - c.c)) AS dist
      FROM p JOIN c0 c ON c.dim = p.dim
      GROUP BY p.vec_id, c.cid
    ),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1
    ),
    c1 AS (
      SELECT a.cid, p.dim,
             (sum(p.x) + 100000 * count(*)) // count(*) - 100000 AS c
      FROM a1 a JOIN p ON p.vec_id = a.vec_id
      GROUP BY a.cid, p.dim
    ),
    d2 AS (
      SELECT p.vec_id, c.cid,
             sum((p.x - c.c) * (p.x - c.c)) AS dist
      FROM p JOIN c1 c ON c.dim = p.dim
      GROUP BY p.vec_id, c.cid
    ),
    a2 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1
    ),
    c2 AS (
      SELECT a.cid, p.dim,
             (sum(p.x) + 100000 * count(*)) // count(*) - 100000 AS c
      FROM a2 a JOIN p ON p.vec_id = a.vec_id
      GROUP BY a.cid, p.dim
    ),
    d3 AS (
      SELECT p.vec_id, c.cid,
             sum((p.x - c.c) * (p.x - c.c)) AS dist
      FROM p JOIN c2 c ON c.dim = p.dim
      GROUP BY p.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d3) WHERE rn = 1
    ),
    stats AS (
      SELECT cid, count(*) AS n_members, sum(vec_id) AS sum_vec_ids,
             sum(dist) AS wcss
      FROM a3 GROUP BY cid
    ),
    cstat AS (
      SELECT cid, sum(c * c) AS sumsq,
             max(CASE WHEN dim = 0 THEN c END) AS c_dim0
      FROM c2 GROUP BY cid
    )
    SELECT CAST(stats.cid AS INT) AS cid,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(sum_vec_ids AS BIGINT) AS sum_vec_ids,
           CAST(wcss AS BIGINT) AS wcss,
           CAST(sumsq AS BIGINT) AS centroid_sumsq,
           CAST(c_dim0 AS BIGINT) AS centroid_dim0_x1e4
    FROM stats JOIN cstat ON cstat.cid = stats.cid
    """,
)
def kmeans_lloyd_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 rounds) over the embeddings table in
    EXACT fixed point — the canonical iterative-ML loop made
    engine-exact: components quantize to the 1e4 grid, squared
    distances are exact BIGINT sums, argmin assignment tie-breaks
    (dist, cid) deterministically, and re-centering is the truncated
    integer mean on the same grid ((S + 1e5*n) div n - 1e5, operands
    kept nonnegative so floor and truncating division agree).  Seeds
    are the 4 smallest vec_ids; a fixed round count makes the result
    a deterministic relation (data-dependent convergence isn't).  The
    oracle unrolls the identical assign/recenter/assign chain as CTEs
    — two independent evaluations of one exact algorithm.  Output per
    cluster: size, member checksum, within-cluster sum of squares,
    and the round-2 centroid's exact norm/first component.

    100 TB shape: per round ONE broadcast of the k x dim centroid
    table against the scanned corpus (distances via zip_with/aggregate
    JVM HOFs — no explode on the corpus side, no shuffle for scoring),
    one keyed (cid, dim) partial-sum shuffle to re-center (posexplode
    of ASSIGNED rows ships dim-level partials, combiner-friendly);
    rounds scale linearly and nothing corpus-sized ever sits in
    driver memory — the same Pregel-on-DataFrames discipline as
    pagerank_customer_supplier.  The semantic-dedup IVF quantizer
    (operators/similarity.py) uses a bounded SAMPLE for speed; this
    entry is the full-corpus exact form.  Reference scope: flo has no
    analytics surface — north-star extension (SURVEY §2 Part B)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5)"
            " AS BIGINT))"
        ).alias("qv"),
        # three assignment passes + per-round recenter explodes all
        # reuse the quantized corpus; persist or each branch re-scans
        # it (7 scans unpersisted — plan-pinned)
    ).persist()
    seeds = (
        q.orderBy("vec_id")
        .limit(4)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "cid"
            ),
            F.col("qv").alias("cv"),
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        j = q.crossJoin(F.broadcast(cents)).withColumn(
            "dist",
            F.expr(
                "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ),
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "qv", "cid", "dist")
        )

    def recenter(assigned: DataFrame) -> DataFrame:
        ex = assigned.select(
            "cid", F.posexplode("qv").alias("dim", "x")
        )
        cd = (
            ex.groupBy("cid", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .selectExpr(
                "cid", "dim", "(s + 100000 * n) div n - 100000 AS c"
            )
        )
        return cd.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, c))),"
                " t -> t.c)"
            ).alias("cv")
        )

    c1 = recenter(assign(seeds))
    c2 = recenter(assign(c1))
    a3 = assign(c2)
    stats = a3.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("sum_vec_ids"),
        F.sum("dist").alias("wcss"),
    )
    cstat = c2.select(
        "cid",
        F.expr("aggregate(cv, 0L, (acc, x) -> acc + x * x)").alias(
            "sumsq"
        ),
        F.element_at("cv", 1).alias("c_dim0"),
    )
    return stats.join(cstat, "cid").select(
        F.col("cid").cast("int").alias("cid"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("sum_vec_ids").cast("long").alias("sum_vec_ids"),
        F.col("wcss").cast("long").alias("wcss"),
        F.col("sumsq").cast("long").alias("centroid_sumsq"),
        F.col("c_dim0").cast("long").alias("centroid_dim0_x1e4"),
    )


@query(
    "calibration_curve_quality",
    """
    WITH labeled AS (
      SELECT doc_id, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    n AS (SELECT count(*) AS n FROM labeled),
    ranked AS (
      SELECT score, pos,
             row_number() OVER (ORDER BY score, doc_id) AS rn
      FROM labeled
    ),
    b AS (
      SELECT ((rn - 1) * 10) // n.n AS bucket, score, pos
      FROM ranked, n
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(score) AS BIGINT) AS score_lo,
           CAST(max(score) AS BIGINT) AS score_hi,
           CAST((sum(score) * 10000 + 0) // count(*) AS BIGINT)
             AS mean_score_x1e4,
           CAST((sum(pos) * 1000000) // count(*) AS BIGINT)
             AS pos_rate_x1e6
    FROM b GROUP BY bucket
    """,
)
def calibration_curve_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram (calibration curve) for the length-predicts-
    English classifier that auc_quality_classifier scores: documents
    sort into EXACT rank deciles (bucket = (rank-1)*10 div n with a
    deterministic (score, doc_id) order, so bucket boundaries are
    reproducible even through score ties), and each decile reports its
    exact score range, the truncated 1e4-grid mean score, and the
    1e-6-grid positive rate — all integer arithmetic, engine-exact.
    AUC measures ranking; calibration measures whether the score's
    LEVEL tracks the outcome rate — the pair is the standard
    classifier-evaluation kit before a curation threshold is picked.

    100 TB shape: one global rank (single-partition window over the
    corpus — swap in the mergeable quantile sketch's decile splits,
    quantile_discretizer_encode's shape, when the corpus outgrows
    one task's sort) then one 10-group aggregate.  Reference scope:
    flo has no analytics surface — north-star extension (SURVEY §2
    Part B statistics)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    docs = docs.persist()  # count + rank branches share one scan
    n = docs.agg(F.count("*").alias("n"))
    ranked = docs.select(
        "score",
        "pos",
        F.row_number()
        .over(Window.orderBy("score", "doc_id"))
        .alias("rn"),
    )
    b = ranked.crossJoin(F.broadcast(n)).selectExpr(
        "((rn - 1) * 10) div n AS bucket", "score", "pos"
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("cnt"),
        F.min("score").alias("score_lo"),
        F.max("score").alias("score_hi"),
        F.sum("score").alias("ssum"),
        F.sum("pos").alias("psum"),
    ).selectExpr(
        "CAST(bucket AS INT) AS bucket",
        "CAST(cnt AS BIGINT) AS n_docs",
        "CAST(score_lo AS BIGINT) AS score_lo",
        "CAST(score_hi AS BIGINT) AS score_hi",
        "CAST((ssum * 10000) div cnt AS BIGINT) AS mean_score_x1e4",
        "CAST((psum * 1000000) div cnt AS BIGINT) AS pos_rate_x1e6",
    )


@query(
    "session_path_topk",
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             concat_ws('>',
               max(CASE WHEN rn = 1 THEN event_type END),
               max(CASE WHEN rn = 2 THEN event_type END),
               max(CASE WHEN rn = 3 THEN event_type END)) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 opening event paths — each user's first three events in
    deterministic (ts, event_id) order joined into an 'a>b>c' journey
    string, counted across users (concat_ws drops the NULL slots of
    short histories identically on both engines, so 1- and 2-event
    users fold into their natural prefixes).  The product-analytics
    path query next to funnel_conversion (fixed target sequence) and
    markov_event_transitions (memoryless step model): this one ranks
    the actual observed journeys.

    100 TB shape: one user-keyed shuffle for the per-user window, a
    conditional-aggregate collapse to one row per user (no arrays
    shipped), one path-keyed count, TakeOrderedAndProject for the
    top-k — no global sort.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B)."""
    ev = load(spark, sf_dir, "events")
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = r.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(10)
        .select("path", F.col("n_users").cast("long").alias("n_users"))
    )


@query(
    "stratified_kfold_assignment",
    """
    WITH r AS (
      SELECT lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id)
               AS rn
      FROM documents
    ),
    f AS (SELECT lang, (rn - 1) % 5 AS fold FROM r),
    c AS (
      SELECT lang, fold, count(*) AS n_docs
      FROM f GROUP BY lang, fold
    )
    SELECT lang, CAST(fold AS INT) AS fold,
           CAST(n_docs AS BIGINT) AS n_docs,
           max(n_docs) OVER (PARTITION BY lang)
             - min(n_docs) OVER (PARTITION BY lang) <= 1 AS balanced
    FROM c
    """,
)
def stratified_kfold_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified k-fold cross-validation assignment (k=5, strata =
    language): within each stratum documents take a deterministic
    rank order (doc_id) and fold = (rank-1) mod 5, so every stratum
    splits as evenly as arithmetic allows — the audit column PROVES
    it in-query (max-min fold size <= 1 per stratum), the
    group_leakage_safe_split discipline applied to CV.  Unlike the
    hash-based train/val/test split (whose fold sizes are only
    binomially balanced), rank-mod assignment is exactly balanced —
    the right tool when strata are small and a 60/40 wobble would
    bias the validation score.

    100 TB shape: one stratum-keyed window rank (per-stratum sort,
    parallel across strata) + one (stratum, fold) count; the audit
    window runs on the k*|strata| spine.  Reference scope: flo has no
    analytics surface — north-star extension (SURVEY §2 Part B
    pipeline hygiene)."""
    docs = load(spark, sf_dir, "documents")
    r = docs.select(
        "lang",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("doc_id"))
        .alias("rn"),
    )
    c = (
        r.selectExpr("lang", "(rn - 1) % 5 AS fold")
        .groupBy("lang", "fold")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return c.select(
        "lang",
        F.col("fold").cast("int").alias("fold"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (
            F.max("n_docs").over(w) - F.min("n_docs").over(w) <= 1
        ).alias("balanced"),
    )


@query(
    "time_weighted_value_per_user",
    """
    WITH s AS (
      SELECT user_id,
             CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v,
             epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    seg AS (
      SELECT user_id, v, nxt - us AS dt
      FROM s WHERE nxt IS NOT NULL AND nxt > us
    ),
    agg AS (
      SELECT user_id, count(*) AS n_segments,
             sum(dt) AS total_us,
             sum(CAST(v AS HUGEINT) * dt) AS wsum
      FROM seg GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_segments AS BIGINT) AS n_segments,
           CAST(total_us AS BIGINT) AS total_us,
           CAST(wsum // total_us AS BIGINT) AS twap_x1e4
    FROM agg
    """,
)
def time_weighted_value_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-weighted average value per user (the TWAP/ops-metrics
    primitive): each event's value holds from its timestamp until the
    user's next event (lead over a deterministic (ts, event_id)
    order), segments weight by their exact microsecond duration, and
    the average is one truncating division of exact integer sums —
    Σ(v_1e4 · Δt_us) accumulates in decimal(38,0)/HUGEINT because a
    month of microseconds times a 1e4-scaled value overflows BIGINT.
    Arithmetic-mean aggregates overweight bursts; TWAP is what a
    billing/utilization pipeline actually wants.  Zero-length
    segments (same-timestamp events) and each user's open last
    segment are excluded by construction on both engines.

    100 TB shape: one user-keyed shuffle for the lead window, then a
    map-side-combinable per-user aggregate — the asof/gap-fill plan
    shape with an integer-exact reduction.  Reference scope: flo has
    no analytics surface — north-star extension (SURVEY §2 Part B)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("v"),
        F.expr("unix_micros(ts)").alias("us"),
        F.lead(F.expr("unix_micros(ts)")).over(w).alias("nxt"),
    )
    seg = s.filter(
        F.col("nxt").isNotNull() & (F.col("nxt") > F.col("us"))
    ).select("user_id", "v", (F.col("nxt") - F.col("us")).alias("dt"))
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum("dt").alias("total_us"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("dt")).alias(
            "wsum"
        ),
    )
    return agg.selectExpr(
        "user_id",
        "CAST(n_segments AS BIGINT) AS n_segments",
        "CAST(total_us AS BIGINT) AS total_us",
        "CAST(wsum div total_us AS BIGINT) AS twap_x1e4",
    )


@query(
    "multimodal_pcx_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 128)) AS i FROM documents
    ),
    rgb AS (
      SELECT doc_id,
             CASE WHEN i % 16 < 5 THEN (doc_id * 3 + 200) % 256
                  ELSE (doc_id * 19 + i * 7) % 256 END AS r,
             CASE WHEN i % 16 < 5 THEN (doc_id * 3 + 201) % 256
                  ELSE (i * 31 + 5) % 256 END AS g,
             CASE WHEN i % 16 < 5 THEN (doc_id * 3 + 202) % 256
                  ELSE (doc_id * 23 + i * 43) % 256 END AS b
      FROM s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r + g + b) AS BIGINT) AS sum_rgb
    FROM rgb GROUP BY doc_id
    """,
)
def multimodal_pcx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCX round trip, hash-checked: per document a 16x8 RGB
    image encodes through an actual ZSoft PCX container (version 5,
    8-bit 3-plane, per-plane-row 0xC0 run-length encoding) and decodes
    back through ``decode_image``; channel sums must reproduce the
    generating formula.  Each scanline's first 5 pixels are constant
    (RLE runs) and the rest vary (literals, including values >= 0xC0
    that MUST be escaped as 1-runs — the classic PCX trap); palette
    trailers, even bytes-per-line padding, and refusal paths are
    unit-tested in tests/test_media_decode.py.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle, binary payloads
    opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_pcx

    W, H = 16, 8

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        run = i % 16 < 5
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_rgb": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                r = np.where(run, (d * 3 + 200) % 256, (d * 19 + i * 7) % 256)
                g = np.where(run, (d * 3 + 201) % 256, (i * 31 + 5) % 256)
                b = np.where(run, (d * 3 + 202) % 256, (d * 23 + i * 43) % 256)
                img = (
                    np.stack([r, g, b], axis=1)
                    .astype(np.uint8)
                    .reshape(H, W, 3)
                )
                got = decode_image(encode_pcx(img))
                out["doc_id"].append(d)
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_rgb"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_rgb long"
    )


@query(
    "multimodal_ras_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 105)) AS i FROM documents
    ),
    px AS (
      SELECT doc_id,
             CASE WHEN i % 15 < 4 THEN 128
                  ELSE (doc_id * 29 + i * 61) % 256 END AS v
      FROM s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(v) AS BIGINT) AS sum_gray
    FROM px GROUP BY doc_id
    """,
)
def multimodal_ras_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Sun Raster round trip, hash-checked: per document a 15x7
    grayscale image (ODD width — forces the spec's 16-bit row
    padding) encodes through an actual type-2 byte-RLE rasterfile and
    decodes back through ``decode_image``; pixel sums must reproduce
    the generating formula.  The run plateau is 0x80 — the RLE escape
    byte itself — so the encoder's 0x80 0x00 literal escape and
    0x80 n v run form are both on the hash path; colormapped and raw
    variants are unit-tested in tests/test_media_decode.py.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle, binary payloads
    opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_ras

    W, H = 15, 7

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_gray": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                v = np.where(i % 15 < 4, 128, (d * 29 + i * 61) % 256)
                img = v.astype(np.uint8).reshape(H, W)
                got = decode_image(encode_ras(img, rle=True))
                out["doc_id"].append(d)
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_gray"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_gray long"
    )


@query(
    "isotonic_calibration_minimax",
    """
    WITH b AS (
      SELECT n_chars // 10 AS x,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
             count(*) AS n
      FROM documents GROUP BY 1
    ),
    r AS (
      SELECT x, p, n,
             row_number() OVER (ORDER BY x) AS r,
             sum(p) OVER (ORDER BY x) AS cp,
             sum(n) OVER (ORDER BY x) AS cn
      FROM b
    ),
    pairs AS (
      SELECT lo.r AS i, hi.r AS j,
             ((hi.cp - lo.cp + lo.p) * 1000000)
               // (hi.cn - lo.cn + lo.n) AS v
      FROM r lo JOIN r hi ON hi.r >= lo.r
    ),
    suff AS (
      SELECT i, j AS k,
             min(v) OVER (PARTITION BY i ORDER BY j DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS a
      FROM pairs
    ),
    fit AS (SELECT k, max(a) AS iso FROM suff GROUP BY k)
    SELECT CAST(r.x * 10 AS BIGINT) AS chars_lo,
           CAST(r.n AS BIGINT) AS n_docs,
           CAST((r.p * 1000000) // r.n AS BIGINT) AS raw_rate_x1e6,
           CAST(fit.iso AS BIGINT) AS iso_rate_x1e6,
           coalesce(fit.iso >= lag(fit.iso) OVER (ORDER BY r.r),
                    TRUE) AS monotone
    FROM r JOIN fit ON fit.k = r.r
    """,
)
def isotonic_calibration_minimax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic regression — the standard monotone calibrator for
    classifier scores — computed EXACTLY via its minimax
    characterization instead of the sequential PAVA loop:
    fitted[k] = max_{i<=k} min_{j>=k} mean(y_i..y_j).  Length buckets
    (tens of characters) are the score, the English rate the target.
    Because floor-to-grid is monotone it COMMUTES with min and max,
    so evaluating the formula on 1e-6-grid bucket-range means yields
    exactly the floor of the true rational isotonic fit — an exact
    answer from a declarative plan where textbook PAVA is an
    inherently sequential pooling loop.  Prefix sums make every range
    mean O(1); a self-join builds the O(K^2) (i, j) means, one
    descending window takes the inner min, one group-by the outer
    max.  The in-query `monotone` column proves the output is a valid
    isotonic function.

    100 TB shape: the corpus collapses to a K-bucket spine in one
    map-side-combinable aggregate; the K^2 minimax (K ~ tens) runs on
    spine-sized data — same aggregate-then-spine shape as the ACF and
    Theil-Sen entries.  Completes the calibration kit: AUC (ranking),
    calibration_curve (level), isotonic (the fix).  Reference scope:
    flo has no analytics surface — north-star extension (SURVEY §2
    Part B statistics)."""
    docs = load(spark, sf_dir, "documents")
    b = docs.selectExpr(
        "n_chars div 10 AS x",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
    ).groupBy("x").agg(
        F.sum("y").alias("p"), F.count("*").alias("n")
    )
    wx = Window.orderBy("x")
    r = b.select(
        "x",
        "p",
        "n",
        F.row_number().over(wx).alias("r"),
        F.sum("p").over(wx).alias("cp"),
        F.sum("n").over(wx).alias("cn"),
        # both pair sides and the final join reuse the spine; persist
        # or the corpus re-aggregates per branch (plan-pinned)
    ).persist()
    lo = r.select(
        F.col("r").alias("i"),
        F.col("p").alias("lp"),
        F.col("n").alias("ln"),
        F.col("cp").alias("lcp"),
        F.col("cn").alias("lcn"),
    )
    hi = r.select(
        F.col("r").alias("j"),
        F.col("cp").alias("hcp"),
        F.col("cn").alias("hcn"),
    )
    pairs = lo.join(hi, F.col("j") >= F.col("i")).selectExpr(
        "i",
        "j",
        "((hcp - lcp + lp) * 1000000) div (hcn - lcn + ln) AS v",
    )
    ws = (
        Window.partitionBy("i")
        .orderBy(F.col("j").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suff = pairs.select(
        "i", F.col("j").alias("k"), F.min("v").over(ws).alias("a")
    )
    fit = suff.groupBy("k").agg(F.max("a").alias("iso"))
    out = r.join(fit, r["r"] == fit["k"]).select(
        (F.col("x") * 10).cast("long").alias("chars_lo"),
        F.col("n").cast("long").alias("n_docs"),
        F.expr("(p * 1000000) div n").cast("long").alias("raw_rate_x1e6"),
        F.col("iso").cast("long").alias("iso_rate_x1e6"),
        F.col("r").alias("rr"),
    )
    wl = Window.orderBy("rr")
    return out.select(
        "chars_lo",
        "n_docs",
        "raw_rate_x1e6",
        "iso_rate_x1e6",
        F.coalesce(
            F.col("iso_rate_x1e6") >= F.lag("iso_rate_x1e6").over(wl),
            F.lit(True),
        ).alias("monotone"),
    )


@query(
    "diff_in_diff_revenue",
    """
    WITH base AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treated,
             CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
               THEN 1 ELSE 0 END AS post,
             CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (
      SELECT treated, post, count(*) AS n, sum(y) AS s,
             sum(y) // count(*) AS mean_x1e4
      FROM base GROUP BY treated, post
    ),
    w AS (
      SELECT
        max(CASE WHEN treated = 0 AND post = 0 THEN mean_x1e4 END) AS m00,
        max(CASE WHEN treated = 0 AND post = 1 THEN mean_x1e4 END) AS m01,
        max(CASE WHEN treated = 1 AND post = 0 THEN mean_x1e4 END) AS m10,
        max(CASE WHEN treated = 1 AND post = 1 THEN mean_x1e4 END) AS m11,
        max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
        max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
        max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
        max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11
      FROM cells
    )
    SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           CAST(m00 AS BIGINT) AS mean_ctrl_pre_x1e4,
           CAST(m01 AS BIGINT) AS mean_ctrl_post_x1e4,
           CAST(m10 AS BIGINT) AS mean_treat_pre_x1e4,
           CAST(m11 AS BIGINT) AS mean_treat_post_x1e4,
           CAST((m11 - m10) - (m01 - m00) AS BIGINT) AS did_x1e4
    FROM w
    """,
)
def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal-inference
    estimator — ENGINE-EXACT: the four (treated x pre/post) cell means
    of order value compute as truncated 1e4-grid integer divisions
    (sums are nonnegative, so DuckDB floor // = Spark div), and the
    DiD effect is the integer double difference
    (m11 - m10) - (m01 - m00) of those gridded means.  'Treatment' is
    the BUILDING market segment, the 'policy date' 1996-01-01 — the
    mechanism, not the story, is what the entry pins (the same
    deterministic-mechanism discipline as welch_t2_ab_test, which
    supplies the significance test for the effect).

    100 TB shape: ONE customer-keyed fact join (dim side broadcast-
    eligible) feeding one map-side-combinable 4-cell conditional
    aggregate — q6's shape with a join; no second pass.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B statistics)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        money_scaled(F.col("o_totalprice")).alias("y"),
    )
    cells = base.groupBy("treated", "post").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    ).selectExpr("treated", "post", "n", "s div n AS mean_x1e4")
    w = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col(col),
                )
            ).alias(f"{name}{t}{p}")
            for col, name in (("mean_x1e4", "m"), ("n", "n"))
            for t in (0, 1)
            for p in (0, 1)
        ]
    )
    return w.selectExpr(
        "CAST(n00 AS BIGINT) AS n00",
        "CAST(n01 AS BIGINT) AS n01",
        "CAST(n10 AS BIGINT) AS n10",
        "CAST(n11 AS BIGINT) AS n11",
        "CAST(m00 AS BIGINT) AS mean_ctrl_pre_x1e4",
        "CAST(m01 AS BIGINT) AS mean_ctrl_post_x1e4",
        "CAST(m10 AS BIGINT) AS mean_treat_pre_x1e4",
        "CAST(m11 AS BIGINT) AS mean_treat_post_x1e4",
        "CAST((m11 - m10) - (m01 - m00) AS BIGINT) AS did_x1e4",
    )


@query(
    "mad_robust_outliers",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 10000 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    med AS (
      SELECT event_type, x AS med FROM (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY x)
                 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v) WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT v.event_type, abs(v.x - med.med) AS d, med.med
      FROM v JOIN med ON med.event_type = v.event_type
    ),
    mad AS (
      SELECT event_type, med, d AS mad FROM (
        SELECT event_type, med, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d)
                 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) WHERE rn = (n + 1) // 2
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(mad.med) AS BIGINT) AS median_x1e4,
           CAST(max(mad.mad) AS BIGINT) AS mad_x1e4,
           CAST(sum(CASE WHEN dev.d * 6745 > mad.mad * 30000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    GROUP BY dev.event_type
    """,
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type —
    the robust counterpart to anomaly_zscore_hourly's moment-based
    z-score (one wild value corrupts a mean/stddev; the median and
    MAD have breakdown point 0.5) — ENGINE-EXACT: values on the 1e4
    grid, the (lower) median and MAD are exact rank picks, and the
    '|x - med| > 3 sigma-hat' rule cross-multiplies the 0.6745
    normal-consistency constant into integers
    (d * 6745 > mad * 30000, i.e. d * 0.6745 > 3 * mad), so the
    outlier count needs no division at all.

    100 TB shape: two rank picks per group (per-type window sorts,
    parallel across types — swap in the mergeable quantile sketch
    when a single type outgrows one task) + one broadcast-sized
    (type, med, mad) table joined back for the counting pass.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B statistics)."""
    v = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("x"),
        # median pick + deviation join both consume this; persist or
        # the fact re-scans per branch (plan-pinned)
    ).persist()
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("x")
    med = (
        v.select(
            "event_type",
            "x",
            F.row_number().over(wo).alias("rn"),
            F.count("*").over(wt).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("x").alias("med"))
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("med")).alias("d"), "med"
    ).persist()
    wd = Window.partitionBy("event_type").orderBy("d")
    mad = (
        dev.select(
            "event_type",
            "med",
            "d",
            F.row_number().over(wd).alias("rn"),
            F.count("*").over(wt).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("med").cast("long").alias("median_x1e4"),
            F.max("mad").cast("long").alias("mad_x1e4"),
            F.sum(
                F.when(
                    F.col("d") * 6745 > F.col("mad") * 30000, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "mann_kendall_trend_test",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT sum(CASE WHEN b.cnt > a.cnt THEN 1
                      WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS s,
             count(*) AS n_pairs
      FROM c a JOIN c b ON b.h > a.h
    ),
    n AS (SELECT count(*) AS n FROM c),
    ties AS (
      SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                      0) AS tie_term
      FROM (SELECT count(*) AS t FROM c GROUP BY cnt HAVING count(*) > 1)
    ),
    v AS (
      SELECT s.s, s.n_pairs, n.n,
             CAST(n.n AS HUGEINT) * (n.n - 1) * (2 * n.n + 5)
               - ties.tie_term AS vs18
      FROM s, n, ties
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(s AS BIGINT) AS s_stat,
           CAST(vs18 AS BIGINT) AS var_s_x18,
           CAST(CASE WHEN s = 0 THEN 0
                ELSE (CAST(abs(s) - 1 AS HUGEINT) * (abs(s) - 1)
                      * 18000000) // vs18 END AS BIGINT) AS z2_x1e6,
           CASE WHEN s = 0 THEN FALSE
                ELSE (CAST(abs(s) - 1 AS HUGEINT) * (abs(s) - 1) * 18)
                     * 1000000
                     > CAST(3841459 AS HUGEINT) * vs18 END
             AS reject_005
    FROM v
    """,
)
def mann_kendall_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the hourly event rate — the
    nonparametric significance test that PAIRS with the Theil-Sen
    slope (same pair space, same spine) — ENGINE-EXACT end to end:
    S = sum of sign(x_j - x_i) is a pure integer, the tie-corrected
    variance times 18 (n(n-1)(2n+5) - sum t(t-1)(2t+5)) stays an
    integer, the continuity-corrected squared statistic
    z^2 = (|S|-1)^2 / Var(S) lands on the 1e-6 grid, and the
    alpha=0.05 verdict cross-multiplies against 1.96^2 = 3.841459
    (z^2*18*1e6 > 3841459*VS18) in decimal(38,0)/HUGEINT — no square
    root, no float anywhere.

    100 TB shape: one map-side-combinable hourly count collapses the
    corpus to the calendar-bounded spine; the O(spine^2) sign pairs,
    tie census, and 1-row verdict all run on that spine — the
    Theil-Sen shape with a single-row reduce instead of a rank pick.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B statistics)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        # pairs (both sides), n, and the tie census share the spine
        .persist()
    )
    a = c.select(F.col("h").alias("ha"), F.col("cnt").alias("ca"))
    b = c.select(F.col("h").alias("hb"), F.col("cnt").alias("cb"))
    s = a.join(b, F.col("hb") > F.col("ha")).agg(
        F.sum(
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1)
            .otherwise(0)
        ).alias("s"),
        F.count("*").alias("n_pairs"),
    )
    n = c.agg(F.count("*").alias("n"))
    d = lambda e: F.expr(e).cast("decimal(38,0)")
    ties = (
        c.groupBy("cnt")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(d("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("tie_term")
        )
    )
    v = (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "s",
            "n_pairs",
            "n",
            "CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5)"
            " - tie_term AS vs18",
        )
    )
    return v.selectExpr(
        "CAST(n AS BIGINT) AS n_hours",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        "CAST(s AS BIGINT) AS s_stat",
        "CAST(vs18 AS BIGINT) AS var_s_x18",
        "CAST(CASE WHEN s = 0 THEN 0"
        " ELSE (CAST(abs(s) - 1 AS DECIMAL(38,0)) * (abs(s) - 1)"
        " * 18000000) div vs18 END AS BIGINT) AS z2_x1e6",
        "CASE WHEN s = 0 THEN FALSE"
        " ELSE (CAST(abs(s) - 1 AS DECIMAL(38,0)) * (abs(s) - 1) * 18)"
        " * 1000000 > CAST(3841459 AS DECIMAL(38,0)) * vs18 END"
        " AS reject_005",
    )


@query(
    "mcnemar_paired_proportions",
    """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicked,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT sum(clicked * purchased) AS a,
             sum(clicked * (1 - purchased)) AS b,
             sum((1 - clicked) * purchased) AS c,
             sum((1 - clicked) * (1 - purchased)) AS d
      FROM u
    )
    SELECT CAST(a AS BIGINT) AS both_yes,
           CAST(b AS BIGINT) AS click_only,
           CAST(c AS BIGINT) AS purchase_only,
           CAST(d AS BIGINT) AS both_no,
           CAST(CASE WHEN b + c = 0 THEN 0
                ELSE ((b - c) * (b - c) * 1000000) // (b + c) END
                AS BIGINT) AS chi2_x1e6,
           CASE WHEN b + c = 0 THEN FALSE
                ELSE (b - c) * (b - c) * 1000000
                     > 3841459 * (b + c) END AS reject_005
    FROM cells
    """,
)
def mcnemar_paired_proportions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """McNemar's test for paired binary outcomes — does the same
    population click and purchase at different rates? — ENGINE-EXACT:
    users collapse to a (clicked, purchased) pair, the 2x2 paired
    table fills from one conditional aggregate, and the discordant
    cells give chi^2 = (b-c)^2/(b+c) as an exact 1e-6-grid quotient
    with the alpha=0.05 verdict cross-multiplied against
    1.96^2 = 3.841459 — integers throughout (the marginal-homogeneity
    counterpart to chi_square_crosstab_audit's independence test,
    which is WRONG for paired data).

    100 TB shape: one user-keyed map-side-combinable collapse, one
    4-cell reduce to a single row — nothing else moves.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B statistics)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicked"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(
                    0
                )
            ).alias("purchased"),
        )
    )
    cells = u.agg(
        F.sum(F.col("clicked") * F.col("purchased")).alias("a"),
        F.sum(F.col("clicked") * (1 - F.col("purchased"))).alias("b"),
        F.sum((1 - F.col("clicked")) * F.col("purchased")).alias("c"),
        F.sum(
            (1 - F.col("clicked")) * (1 - F.col("purchased"))
        ).alias("d"),
    )
    return cells.selectExpr(
        "CAST(a AS BIGINT) AS both_yes",
        "CAST(b AS BIGINT) AS click_only",
        "CAST(c AS BIGINT) AS purchase_only",
        "CAST(d AS BIGINT) AS both_no",
        "CAST(CASE WHEN b + c = 0 THEN 0"
        " ELSE ((b - c) * (b - c) * 1000000) div (b + c) END"
        " AS BIGINT) AS chi2_x1e6",
        "CASE WHEN b + c = 0 THEN FALSE"
        " ELSE (b - c) * (b - c) * 1000000 > 3841459 * (b + c) END"
        " AS reject_005",
    )


@query(
    "sql_pipe_syntax_report",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_x1e4
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE SYNTAX (SQL has problems; pipes fix them —
    the |> operator chain adopted from GoogleSQL): the classic
    scan |> WHERE |> AGGREGATE ... GROUP BY |> WHERE (post-aggregate
    filter, pipe's HAVING) |> ORDER BY flow, hash-checked against the
    identical query in standard SQL — proving the pipe form MEANS its
    longhand (same rows, same exact 1e4-grid sums), not just parses.
    Alongside sql_scripting_threshold_report (procedural) and
    sql_syntax_surface_suite (SQL:2023 sugar), this pins the third
    modern SQL entry surface.

    100 TB shape: pipes are pure syntax — Catalyst compiles this to
    exactly the longhand plan (pushed filter, one map-side-combinable
    aggregate, TakeOrderedAndProject-eligible sort), which is the
    point being certified.  Reference scope: flo has no SQL surface —
    north-star extension (SURVEY §2 Part B SQL text)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_pipe_v"
    )
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus <> 'P'
        |> EXTEND CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
             AS px
        |> AGGREGATE count(*) AS n_orders, sum(px) AS revenue_x1e4
             GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
             CAST(revenue_x1e4 AS BIGINT) AS revenue_x1e4
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "flo_fixedwidth_roundtrip",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents GROUP BY lang
    """,
)
def flo_fixedwidth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH text interchange — the mainframe/feed format every
    real ETL stack still meets: documents serialize to 37-byte records
    (doc_id right-aligned in 12, lang left-padded to 5, n_chars in 8,
    source in 12 — lpad/rpad, pure JVM), write through the text sink,
    read back as raw lines, and parse by SUBSTRING offsets (no
    delimiter anywhere); per-language aggregates of the PARSED columns
    must hash-match SQL over the source table, so a one-byte offset
    error in either direction breaks the round trip.  Completes the
    interchange matrix (parquet/orc/csv/json/jsonl.gz/xml/native
    .events) with the only format defined purely by column positions.

    100 TB shape: scan-stage string formatting, a parallel text write
    (one file per partition), a parallel text scan, scan-stage
    substring parsing — no shuffle until the final aggregate;
    fixed-width is the cheapest possible parse (constant offsets, no
    quoting state machine).  Reference scope: interchange extension
    of SURVEY §2 Part B sources/sinks."""
    from flo_spark.queries import scratch_dir

    tmp = scratch_dir("flo_fixedwidth_")
    docs = load(spark, sf_dir, "documents")
    lines = docs.select(
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 12, " "),
            F.rpad(F.col("lang"), 5, " "),
            F.lpad(F.col("n_chars").cast("string"), 8, " "),
            F.rpad(F.col("source"), 12, " "),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(f"{tmp}/fw")
    back = spark.read.text(f"{tmp}/fw").select(
        F.expr("CAST(trim(substring(value, 1, 12)) AS BIGINT)").alias(
            "doc_id"
        ),
        F.expr("trim(substring(value, 13, 5))").alias("lang"),
        F.expr("CAST(trim(substring(value, 18, 8)) AS BIGINT)").alias(
            "n_chars"
        ),
        F.expr("trim(substring(value, 26, 12))").alias("source"),
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


@query(
    "discrete_hazard_lifetable",
    """
    WITH life AS (
      SELECT user_id,
             (epoch_us(max(ts)) - epoch_us(min(ts)))
               // 604800000000 AS wk
      FROM events GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n_users FROM life),
    ev AS (SELECT wk, count(*) AS events FROM life GROUP BY wk),
    tab AS (
      SELECT ev.wk, ev.events,
             n.n_users
               - coalesce(sum(ev2.events), 0) AS at_risk
      FROM ev
      LEFT JOIN ev ev2 ON ev2.wk < ev.wk
      CROSS JOIN n
      GROUP BY ev.wk, ev.events, n.n_users
    )
    SELECT CAST(wk AS INT) AS week,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(events AS BIGINT) AS events,
           CAST((events * 1000000) // at_risk AS BIGINT)
             AS hazard_x1e6
    FROM tab
    """,
)
def discrete_hazard_lifetable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discrete-time life table of user activity spans — the
    churn-analytics primitive: each user's observed lifetime (first
    to last event) buckets into whole weeks, and for every week k the
    risk set (users whose lifetime reached week k), the exits, and
    the exact 1e-6-grid hazard h_k = exits_k / at_risk_k are reported
    — all integers until the one truncating division per row.  The
    Kaplan-Meier survival curve is the running product of (1 - h_k);
    products of rationals leave any fixed grid, so the entry pins the
    hazard table (the estimator's sufficient statistic) and leaves
    the product to the caller's presentation layer.

    100 TB shape: one user-keyed span aggregate (map-side
    combinable), then everything runs on the |weeks| spine; the
    at-risk set is a spine-sized cumulative complement, not a rescan.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B event analytics, next to
    cohort_retention's calendar triangle)."""
    ev = load(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts)))"
            " div 604800000000"
        ).alias("wk")
    )
    n = life.agg(F.count("*").alias("n_users"))
    evt = life.groupBy("wk").agg(F.count("*").alias("events"))
    w = Window.orderBy("wk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tab = evt.crossJoin(F.broadcast(n)).select(
        "wk",
        "events",
        (
            F.col("n_users")
            - F.coalesce(F.sum("events").over(w), F.lit(0))
        ).alias("at_risk"),
    )
    return tab.selectExpr(
        "CAST(wk AS INT) AS week",
        "CAST(at_risk AS BIGINT) AS at_risk",
        "CAST(events AS BIGINT) AS events",
        "CAST((events * 1000000) div at_risk AS BIGINT)"
        " AS hazard_x1e6",
    )


@query(
    "hits_hubs_authorities",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, li.l_suppkey AS s
      FROM orders o JOIN lineitem li ON li.l_orderkey = o.o_orderkey
    ),
    a1 AS (
      SELECT s, sum(CAST(1000000 AS HUGEINT)) AS a FROM e GROUP BY s
    ),
    am1 AS (SELECT max(a) AS m FROM a1),
    a1n AS (SELECT s, (a * 1000000) // am1.m AS a FROM a1, am1),
    h1 AS (
      SELECT e.c, sum(a1n.a) AS h
      FROM e JOIN a1n ON a1n.s = e.s GROUP BY e.c
    ),
    hm1 AS (SELECT max(h) AS m FROM h1),
    h1n AS (SELECT c, (h * 1000000) // hm1.m AS h FROM h1, hm1),
    a2 AS (
      SELECT e.s, sum(h1n.h) AS a
      FROM e JOIN h1n ON h1n.c = e.c GROUP BY e.s
    ),
    am2 AS (SELECT max(a) AS m FROM a2),
    a2n AS (SELECT s, (a * 1000000) // am2.m AS a FROM a2, am2),
    deg AS (SELECT s, count(*) AS degree FROM e GROUP BY s)
    SELECT CAST(a2n.s AS BIGINT) AS s_suppkey,
           CAST(a2n.a AS BIGINT) AS authority_x1e6,
           CAST(deg.degree AS BIGINT) AS degree
    FROM a2n JOIN deg ON deg.s = a2n.s
    ORDER BY authority_x1e6 DESC, s_suppkey
    LIMIT 20
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's HITS on the bipartite customer->supplier trade
    graph — the hub/authority counterpart to
    pagerank_customer_supplier's random-walk ranking — in EXACT fixed
    point: authority(s) = sum of hub scores over in-edges, hub(c) =
    sum of authorities over out-edges, and each round's max-
    normalization (score * 1e6 div max) is a truncating integer
    division (nonnegative operands), so 1.5 mutual-reinforcement
    rounds land bit-identical on both engines where float
    normalization would drift.  Top-20 authorities with degrees; a
    high-degree supplier serving LOW-hub customers ranks below a
    lower-degree supplier serving high-hub ones — the signal HITS
    adds over a plain degree count.

    100 TB shape: the distinct edge list builds once (one shuffle);
    each half-round is one edge->score equi-join plus one dst-keyed
    partial-sum shuffle, max-normalization is a 1-row broadcast —
    O(|E|) per round, the Pregel-on-DataFrames discipline; top-20 is
    TakeOrderedAndProject.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B graph
    analytics)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        # the edge list drives both half-rounds and the degree count
        .persist()
    )
    d = lambda c: c.cast("decimal(38,0)")

    def normalize(scores: DataFrame, key: str, col: str) -> DataFrame:
        m = scores.agg(F.max(col).alias("m"))
        return scores.crossJoin(F.broadcast(m)).selectExpr(
            key, f"({col} * 1000000) div m AS {col}"
        )

    a1 = e.groupBy("s").agg(
        F.sum(d(F.lit(1_000_000))).alias("a")
    )
    a1n = normalize(a1, "s", "a")
    h1 = (
        e.join(a1n, "s")
        .groupBy("c")
        .agg(F.sum("a").alias("h"))
    )
    h1n = normalize(h1, "c", "h")
    a2 = (
        e.join(h1n, "c")
        .groupBy("s")
        .agg(F.sum("h").alias("a"))
    )
    a2n = normalize(a2, "s", "a")
    deg = e.groupBy("s").agg(F.count("*").alias("degree"))
    return (
        a2n.join(deg, "s")
        .orderBy(F.col("a").desc(), F.col("s"))
        .limit(20)
        .select(
            F.col("s").cast("long").alias("s_suppkey"),
            F.col("a").cast("long").alias("authority_x1e6"),
            F.col("degree").cast("long").alias("degree"),
        )
    )


@query(
    "cep_sequence_pattern_detect",
    """
    WITH r AS (
      SELECT user_id, ts, event_type,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, ts FROM r
      WHERE event_type = 'click' AND e1 = 'click' AND e2 = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(ts) AS TIMESTAMP) AS first_match_ts
    FROM m GROUP BY user_id
    """,
)
def cep_sequence_pattern_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Complex-event-processing pattern detection — the
    MATCH_RECOGNIZE workload SQL engines bolt on — as a lead-chain
    window: find every user whose event stream contains the
    CONSECUTIVE pattern click -> click -> purchase (double-tap
    purchase intent) in deterministic (ts, event_id) order, reporting
    match counts and the first match time.  Overlapping occurrences
    count (each position starts its own match) — the textbook NFA
    semantics for unanchored patterns; funnel_conversion covers the
    non-consecutive ordered variant, markov_event_transitions the
    memoryless model; this pins strict adjacency.

    100 TB shape: one user-keyed window shuffle, scan-stage lead
    projections, then a per-user count — CEP without a stateful
    engine; the streaming form is applyInPandasWithState
    (stream_stateful_user_stats' shape) with this predicate inside.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B event analytics)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    m = r.filter(
        (F.col("event_type") == "click")
        & (F.col("e1") == "click")
        & (F.col("e2") == "purchase")
    )
    return m.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )


@query(
    "simpson_diversity_by_source",
    """
    WITH c AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    ),
    t AS (
      SELECT source, sum(n) AS total,
             sum(CAST(n AS HUGEINT) * (n - 1)) AS same_pairs,
             count(*) AS n_langs
      FROM c GROUP BY source
    )
    SELECT source,
           CAST(total AS BIGINT) AS n_docs,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(same_pairs AS BIGINT) AS same_lang_pairs,
           CAST(1000000 - (same_pairs * 1000000)
                // (CAST(total AS HUGEINT) * (total - 1)) AS BIGINT)
             AS simpson_diversity_x1e6
    FROM t WHERE total > 1
    """,
)
def simpson_diversity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's diversity index per corpus source — the probability
    that two documents drawn without replacement differ in language,
    1 - sum n_l(n_l-1) / (N(N-1)) — ENGINE-EXACT because unlike
    Shannon entropy (logarithms) Simpson's index is a pure rational:
    integer pair counts, one truncating division onto the 1e-6 grid.
    The dataset-composition diagnostic a mixing pipeline reads before
    setting per-source temperatures (temperature_mix_sample); the
    language-ID entries supply the lang column upstream.

    100 TB shape: one (source, lang) map-side-combinable count, one
    source-level re-aggregation of the reduced table — nothing
    corpus-scale moves twice.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B statistics)."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    d = lambda col: F.col(col).cast("decimal(38,0)")
    t = c.groupBy("source").agg(
        F.sum("n").alias("total"),
        F.sum(d("n") * (F.col("n") - 1)).alias("same_pairs"),
        F.count("*").alias("n_langs"),
    )
    return t.filter(F.col("total") > 1).selectExpr(
        "source",
        "CAST(total AS BIGINT) AS n_docs",
        "CAST(n_langs AS BIGINT) AS n_langs",
        "CAST(same_pairs AS BIGINT) AS same_lang_pairs",
        "CAST(1000000 - (same_pairs * 1000000)"
        " div (CAST(total AS DECIMAL(38,0)) * (total - 1)) AS BIGINT)"
        " AS simpson_diversity_x1e6",
    )


@query(
    "stream_cep_pattern_monitor",
    """
    WITH r AS (
      SELECT user_id, ts, event_type,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM r
    WHERE event_type = 'click' AND e1 = 'click' AND e2 = 'purchase'
    GROUP BY user_id
    """,
)
def stream_cep_pattern_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STATEFUL streaming CEP: the click -> click -> purchase
    strict-adjacency pattern of cep_sequence_pattern_detect detected
    ACROSS micro-batch boundaries — the event stream replays as three
    time-ordered waves against one checkpoint, and
    applyInPandasWithState carries each user's last two event types
    in keyed state, so a pattern whose three events straddle a wave
    boundary still counts (drop the carried prefix and those matches
    vanish — exactly what the batch oracle would catch).  Update-mode
    emissions fold into per-batch shards; the final count per user is
    the last writer (max batch id).  Within a user, event-time order
    equals arrival order because the waves are time-range slices —
    the in-order delivery contract flo's consume surface provides
    (SURVEY §2 A6).

    100 TB shape: state is O(2 event types + a counter) per user —
    constant per key, the smallest possible NFA state for this
    pattern; rows stream through one user-keyed shuffle per batch;
    the shard store grows by changed keys per batch and compacts like
    the sketch stores.  Reference scope: flo consume + Spark stateful
    streaming (SURVEY §2 Part B applyInPandasWithState), the CEP form
    of stream_stateful_user_stats."""
    import datetime

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flo_spark.queries import scratch_dir

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # single-row metadata collect: wave horizon anchors (documented —
    # O(1), the stream_late_data_drop_audit discipline)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    cut1, cut2 = lo + span, lo + span * 2

    tmp = scratch_dir("flo_cep_")
    feed, ckpt, store = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/store"

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_matches", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("p2", T.StringType()),
            T.StructField("p1", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def update_user(key, pdf_iter, state):
        (user_id,) = key
        p2, p1, cnt = state.get if state.exists else ("", "", 0)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        seq = [p2, p1] + list(pdf["event_type"])
        for i in range(len(seq) - 2):
            if (
                seq[i] == "click"
                and seq[i + 1] == "click"
                and seq[i + 2] == "purchase"
            ):
                cnt += 1
        state.update((seq[-2], seq[-1], cnt))
        yield pd.DataFrame({"user_id": [user_id], "n_matches": [cnt]})

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(
            f"{store}/batch={batch_id}"
        )

    def drain() -> None:
        src = spark.readStream.schema(ev.schema).parquet(feed)
        stats = src.groupBy("user_id").applyInPandasWithState(
            update_user,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            stats.writeStream.foreachBatch(fold)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("CEP stream did not drain")

    waves = [
        F.col("ts") <= F.lit(cut1),
        (F.col("ts") > F.lit(cut1)) & (F.col("ts") <= F.lit(cut2)),
        F.col("ts") > F.lit(cut2),
    ]
    for i, w in enumerate(waves):
        ev.filter(w).coalesce(1).write.parquet(f"{feed}/wave={i}")
        drain()

    final = spark.read.option("basePath", store).parquet(store)
    wlast = Window.partitionBy("user_id").orderBy(F.col("batch").desc())
    return (
        final.withColumn("rn", F.row_number().over(wlast))
        .filter((F.col("rn") == 1) & (F.col("n_matches") > 0))
        .select("user_id", F.col("n_matches").cast("long").alias("n_matches"))
    )


@query(
    "keyset_pagination_page",
    """
    WITH p AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderpriority
      FROM orders
    ),
    pg1 AS (
      SELECT * FROM p ORDER BY cents DESC, o_orderkey LIMIT 25
    ),
    cursor AS (
      SELECT cents AS c_cents, o_orderkey AS c_key FROM pg1
      ORDER BY cents, o_orderkey DESC LIMIT 1
    ),
    pg2 AS (
      SELECT p.* FROM p, cursor
      WHERE p.cents < c_cents
         OR (p.cents = c_cents AND p.o_orderkey > c_key)
      ORDER BY p.cents DESC, p.o_orderkey LIMIT 25
    )
    SELECT o_orderkey, cents, o_orderpriority FROM pg2
    """,
)
def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek) pagination — page 2 of orders by (price DESC,
    orderkey) fetched via the cursor predicate
    (cents, key) `<` last-seen, NOT via OFFSET: the row-value
    comparison keeps the predicate sargable, so every page is a
    TakeOrderedAndProject over a filtered scan — O(page) work —
    where OFFSET n forces the engine to materialize and discard n
    rows (O(pages-so-far) per page, quadratic over a full sweep).
    The composite tie-break column makes the cursor total, so pages
    never skip or repeat rows under duplicate prices — the bug
    naive last-price cursors have.  Prices ride the exact cents grid.

    100 TB shape: the page-2 plan is filter (pushable to the scan) +
    top-k (no global sort, plan-pinned); the page-1 cursor row is a
    1-row frame.  This is THE pattern for paging an API over a
    warehouse table.  Reference scope: flo's consume cursor (version
    vector) IS keyset pagination over the event log (SURVEY §2 A3);
    this entry is the relational form."""
    p = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        "o_orderpriority",
    )
    pg1 = p.orderBy(F.col("cents").desc(), F.col("o_orderkey")).limit(25)
    cursor = (
        pg1.orderBy(F.col("cents"), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("cents").alias("c_cents"),
            F.col("o_orderkey").alias("c_key"),
        )
    )
    pg2 = (
        p.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("cents") < F.col("c_cents"))
            | (
                (F.col("cents") == F.col("c_cents"))
                & (F.col("o_orderkey") > F.col("c_key"))
            )
        )
        .orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .limit(25)
    )
    return pg2.select("o_orderkey", "cents", "o_orderpriority")


@query(
    "funnel_time_to_convert",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p0
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id,
             (epoch_us(p0) - epoch_us(c0)) // 1000000 AS sec
      FROM f WHERE c0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= c0
    ),
    r AS (
      SELECT sec, row_number() OVER (ORDER BY sec, user_id) AS rn,
             count(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converters,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN sec END)
                AS BIGINT) AS p50_seconds,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN sec END)
                AS BIGINT) AS p90_seconds,
           CAST(min(sec) AS BIGINT) AS min_seconds,
           CAST(max(sec) AS BIGINT) AS max_seconds
    FROM r
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the click -> purchase funnel:
    per user the whole-second gap from FIRST click to FIRST purchase
    (exact integer microseconds floored to seconds), then exact
    lower-rank p50/p90 picks over the converter population — the
    latency lens funnel_conversion (who converts) and
    cohort_retention (when they return) don't give.  Rank indices
    ceil(q*n) are pure integers, so the percentiles are exact order
    statistics, deterministic under ties via the (sec, user_id)
    order.

    100 TB shape: one user-keyed conditional min aggregate (map-side
    combinable), then ranks over the CONVERTER subset — single-
    partition window on a population already cut by the funnel (swap
    in the mergeable quantile sketch when converters alone outgrow a
    task).  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B event analytics)."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("c0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("p0"),
    )
    conv = f.filter(
        F.col("c0").isNotNull()
        & F.col("p0").isNotNull()
        & (F.col("p0") >= F.col("c0"))
    ).select(
        "user_id",
        F.expr(
            "(unix_micros(p0) - unix_micros(c0)) div 1000000"
        ).alias("sec"),
    )
    r = conv.select(
        "sec",
        F.row_number()
        .over(Window.orderBy("sec", "user_id"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_converters"),
        F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("sec")))
        .cast("long")
        .alias("p50_seconds"),
        F.max(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("sec")))
        .cast("long")
        .alias("p90_seconds"),
        F.min("sec").cast("long").alias("min_seconds"),
        F.max("sec").cast("long").alias("max_seconds"),
    )


@query(
    "multimodal_webp_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 96)) AS i FROM documents
    ),
    rgb AS (
      SELECT doc_id,
             CASE WHEN i < 32 THEN (doc_id * 2) % 256
                  ELSE (doc_id * 31 + i * 11) % 256 END AS r,
             CASE WHEN i < 32 THEN (doc_id * 2 + 1) % 256
                  ELSE (i * 37 + 7) % 256 END AS g,
             CASE WHEN i < 32 THEN (doc_id * 2 + 2) % 256
                  ELSE (doc_id * 41 + i * 59) % 256 END AS b
      FROM s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r + g + b) AS BIGINT) AS sum_rgb
    FROM rgb GROUP BY doc_id
    """,
)
def multimodal_webp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless round trip, hash-checked: per document a
    12x8 RGB image encodes through an actual RIFF/VP8L container
    (operators/webp.py — LSB-first bit packing, canonical prefix
    codes; channels with >2 distinct values go through the general
    code-length-code machinery with 16-repeat chains and the
    max-symbol shortcut for the 280-symbol green alphabet) and
    decodes back through ``decode_image``; channel sums must
    reproduce the generating formula.  The decoder's LZ77-backref and
    color-cache paths are pinned by HAND-BUILT feature streams in
    tests/test_media_decode.py (the literal-only encoder cannot emit
    them); VP8L transforms and lossy VP8 refuse loudly by name.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle, binary payloads
    opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.webp import encode_webp_lossless
    from flo_spark.operators.multimodal import decode_image

    W, H = 12, 8

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        flat = i < 32
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_rgb": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                r = np.where(flat, (d * 2) % 256, (d * 31 + i * 11) % 256)
                g = np.where(flat, (d * 2 + 1) % 256, (i * 37 + 7) % 256)
                b = np.where(flat, (d * 2 + 2) % 256, (d * 41 + i * 59) % 256)
                img = (
                    np.stack([r, g, b], axis=1)
                    .astype(np.uint8)
                    .reshape(H, W, 3)
                )
                got = decode_image(encode_webp_lossless(img))
                out["doc_id"].append(d)
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_rgb"].append(
                    int(got[..., :3].astype(np.int64).sum())
                )
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_rgb long"
    )


@query(
    "kendall_tau_user_metrics",
    """
    WITH u AS (
      SELECT user_id, count(*) AS x,
             sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS y
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END
               AS disc
      FROM u a JOIN u b ON a.user_id < b.user_id
    ),
    s AS (
      SELECT sum(conc) AS c, sum(disc) AS d, count(*) AS n_pairs
      FROM p
    )
    SELECT CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(CASE WHEN c >= d
                THEN ((c - d) * 1000000) // n_pairs
                ELSE -(((d - c) * 1000000) // n_pairs) END AS BIGINT)
             AS tau_a_x1e6
    FROM s
    """,
)
def kendall_tau_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a rank correlation between per-user activity
    (event count) and per-user spend (exact 1e4-grid value sum) —
    ENGINE-EXACT because tau-a is a pure rational: concordant minus
    discordant pairs over all pairs, one signed truncating division
    onto the 1e-6 grid (Pearson and Spearman both need square roots;
    Kendall is the correlation you can do in exact integers, and the
    one whose interpretation — probability a random pair agrees in
    order — survives any monotone transform of either metric).  Ties
    count in n_pairs but neither C nor D (the tau-a convention,
    stated so the oracle can't drift to tau-b).

    100 TB shape: the corpus collapses to a per-user metrics table in
    one map-side-combinable aggregate; the O(U^2) pair join runs on
    that REDUCED relation (1.1M pairs at bench SF) — when U itself is
    corpus-scale, Knight's O(n log n) merge-sort inversion count over
    a range-partitioned sort is the documented upgrade path, same
    answer.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B statistics)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("x"),
            F.sum(money_scaled(F.col("value"))).alias("y"),
        )
    )
    a = u.select(
        F.col("user_id").alias("ka"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = u.select(
        F.col("user_id").alias("kb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    p = a.join(b, F.col("ka") < F.col("kb")).select(
        F.when(
            (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0, 1
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0, 1
        )
        .otherwise(0)
        .alias("disc"),
    )
    s = p.agg(
        F.sum("conc").alias("c"),
        F.sum("disc").alias("d"),
        F.count("*").alias("n_pairs"),
    )
    return s.selectExpr(
        "CAST(c AS BIGINT) AS concordant",
        "CAST(d AS BIGINT) AS discordant",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        "CAST(CASE WHEN c >= d THEN ((c - d) * 1000000) div n_pairs"
        " ELSE -(((d - c) * 1000000) div n_pairs) END AS BIGINT)"
        " AS tau_a_x1e6",
    )


@query(
    "roc_youden_threshold",
    """
    WITH labeled AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    n AS (SELECT sum(pos) AS np, sum(1 - pos) AS nn FROM labeled),
    by_score AS (
      SELECT score, sum(pos) AS p, sum(1 - pos) AS neg
      FROM labeled GROUP BY score
    ),
    cum AS (
      SELECT score,
             sum(p) OVER (ORDER BY score DESC) AS tp,
             sum(neg) OVER (ORDER BY score DESC) AS fp
      FROM by_score
    ),
    scored AS (
      SELECT score AS threshold, tp, fp,
             n.nn * tp - n.np * fp AS j_num, n.np, n.nn
      FROM cum, n
    ),
    best AS (
      SELECT * FROM scored ORDER BY j_num DESC, threshold LIMIT 1
    )
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(np - tp AS BIGINT) AS fn,
           CAST(j_num AS BIGINT) AS youden_num,
           CAST((j_num * 1000000) // (CAST(np AS HUGEINT) * nn)
                AS BIGINT) AS youden_x1e6,
           CAST((tp * 1000000) // (tp + fp) AS BIGINT)
             AS precision_x1e6,
           CAST((tp * 1000000) // np AS BIGINT) AS recall_x1e6,
           CAST((2 * tp * 1000000) // (2 * tp + fp + (np - tp))
                AS BIGINT) AS f1_x1e6
    FROM best
    """,
)
def roc_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPERATING POINT for the length-predicts-English classifier:
    the threshold maximizing Youden's J = TPR - FPR, chosen by the
    exact integer criterion n_neg*TP - n_pos*FP (cross-multiplied so
    no two candidate thresholds compare through floats; tie-break
    lowest threshold), with exact 1e-6-grid precision / recall / F1
    at that threshold — F1's 2TP/(2TP+FP+FN) is a pure rational, so
    the whole confusion row is engine-exact.  Completes the evaluation
    kit: AUC ranks, the calibration entries check levels, this picks
    where to cut (predict positive when score >= threshold).

    100 TB shape: one by-score aggregate collapses the corpus, one
    descending cumulative window over distinct scores builds every
    confusion matrix simultaneously (the same single-pass trick as
    the exact AUC), one TakeOrderedAndProject picks the argmax.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B pipeline hygiene)."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    ).persist()  # totals + by-score branches share one scan
    n = docs.agg(
        F.sum("pos").alias("np"), F.sum(1 - F.col("pos")).alias("nn")
    )
    by_score = docs.groupBy("score").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("neg")
    )
    w = Window.orderBy(F.col("score").desc())
    cum = by_score.select(
        "score",
        F.sum("p").over(w).alias("tp"),
        F.sum("neg").over(w).alias("fp"),
    )
    scored = cum.crossJoin(F.broadcast(n)).select(
        F.col("score").alias("threshold"),
        "tp",
        "fp",
        (F.col("nn") * F.col("tp") - F.col("np") * F.col("fp")).alias(
            "j_num"
        ),
        "np",
        "nn",
    )
    best = scored.orderBy(
        F.col("j_num").desc(), F.col("threshold")
    ).limit(1)
    return best.selectExpr(
        "CAST(threshold AS BIGINT) AS threshold",
        "CAST(tp AS BIGINT) AS tp",
        "CAST(fp AS BIGINT) AS fp",
        "CAST(np - tp AS BIGINT) AS fn",
        "CAST(j_num AS BIGINT) AS youden_num",
        "CAST((j_num * 1000000) div (CAST(np AS DECIMAL(38,0)) * nn)"
        " AS BIGINT) AS youden_x1e6",
        "CAST((tp * 1000000) div (tp + fp) AS BIGINT)"
        " AS precision_x1e6",
        "CAST((tp * 1000000) div np AS BIGINT) AS recall_x1e6",
        "CAST((2 * tp * 1000000) div (2 * tp + fp + (np - tp))"
        " AS BIGINT) AS f1_x1e6",
    )


@query(
    "cohens_kappa_langid",
    """
    WITH r AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
             CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN truth = pred THEN 1 ELSE 0 END) AS agree,
             sum(truth) AS t1, sum(pred) AS p1
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(agree AS BIGINT) AS n_agree,
           CAST(t1 AS BIGINT) AS truth_pos,
           CAST(p1 AS BIGINT) AS pred_pos,
           CAST(CASE
             WHEN CAST(n AS HUGEINT) * n
                  = t1 * CAST(p1 AS HUGEINT)
                    + (n - t1) * CAST(n - p1 AS HUGEINT) THEN 0
             WHEN CAST(n AS HUGEINT) * agree
                  >= t1 * CAST(p1 AS HUGEINT)
                     + (n - t1) * CAST(n - p1 AS HUGEINT)
             THEN ((CAST(n AS HUGEINT) * agree
                    - (t1 * CAST(p1 AS HUGEINT)
                       + (n - t1) * CAST(n - p1 AS HUGEINT)))
                   * 1000000)
                  // (CAST(n AS HUGEINT) * n
                      - (t1 * CAST(p1 AS HUGEINT)
                         + (n - t1) * CAST(n - p1 AS HUGEINT)))
             ELSE -((((t1 * CAST(p1 AS HUGEINT)
                       + (n - t1) * CAST(n - p1 AS HUGEINT))
                      - CAST(n AS HUGEINT) * agree) * 1000000)
                    // (CAST(n AS HUGEINT) * n
                        - (t1 * CAST(p1 AS HUGEINT)
                           + (n - t1) * CAST(n - p1 AS HUGEINT))))
           END AS BIGINT) AS kappa_x1e6
    FROM s
    """,
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between the lang
    column and the cheapest possible English detector (contains
    ' the ') — ENGINE-EXACT: kappa = (p_o - p_e)/(1 - p_e) clears its
    denominators to (N*agree - E) / (N^2 - E) with
    E = t1*p1 + t0*p0, all integers, one signed truncating division
    onto the 1e-6 grid (accuracy alone overstates agreement when both
    raters skew negative — kappa is the honest inter-annotator /
    weak-labeler metric, and this is it without a single float).

    100 TB shape: one map-side-combinable 4-counter aggregate over
    the scan; the kappa arithmetic is a 1-row projection.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B statistics)."""
    r = load(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        F.when(F.col("text").like("% the %"), 1)
        .otherwise(0)
        .alias("pred"),
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("truth") == F.col("pred"), 1).otherwise(0)
        ).alias("agree"),
        F.sum("truth").alias("t1"),
        F.sum("pred").alias("p1"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    e = (
        f"(t1 * {d.format('p1')} + (n - t1) * {d.format('(n - p1)')})"
    )
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_docs",
        "CAST(agree AS BIGINT) AS n_agree",
        "CAST(t1 AS BIGINT) AS truth_pos",
        "CAST(p1 AS BIGINT) AS pred_pos",
        f"CAST(CASE"
        f" WHEN {d.format('n')} * n = {e} THEN 0"
        f" WHEN {d.format('n')} * agree >= {e}"
        f" THEN (({d.format('n')} * agree - {e}) * 1000000)"
        f" div ({d.format('n')} * n - {e})"
        f" ELSE -((({e} - {d.format('n')} * agree) * 1000000)"
        f" div ({d.format('n')} * n - {e}))"
        f" END AS BIGINT) AS kappa_x1e6",
    )


@query(
    "stream_drift_monitor",
    """
    WITH s AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vx,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    n AS (SELECT sum(i1) AS n1, sum(i2) AS n2 FROM s),
    g AS (SELECT vx, sum(i1) AS c1, sum(i2) AS c2 FROM s GROUP BY vx),
    cum AS (
      SELECT vx,
             sum(c1) OVER (ORDER BY vx) AS cc1,
             sum(c2) OVER (ORDER BY vx) AS cc2
      FROM g
    ),
    d AS (
      SELECT vx, abs(cc1 * n.n2 - cc2 * n.n1) AS dn FROM cum, n
    ),
    best AS (SELECT vx, dn FROM d ORDER BY dn DESC, vx LIMIT 1)
    SELECT CAST(n.n1 AS BIGINT) AS n_1,
           CAST(n.n2 AS BIGINT) AS n_2,
           CAST(best.dn AS BIGINT) AS ks_num,
           CAST((best.dn * 1000000) // (n.n1 * n.n2) AS BIGINT)
             AS ks_x1e6,
           CAST(best.vx AS BIGINT) AS ks_at_vx
    FROM best, n
    """,
)
def stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING data-drift monitor: the exact two-sample KS statistic
    between click and purchase value distributions, maintained from a
    replay-safe shard store that NEVER rescans history — the event
    stream arrives in three time waves against one checkpoint, each
    micro-batch folds its (value-cents, side) counts into an
    append-only per-batch parquet shard (idempotent on retry: the
    batch id names the shard), and the KS evaluation re-aggregates
    the reduced shards exactly as ks_drift_priority evaluates its
    one-shot counts.  Counts are mergeable integers, so the folded
    store provably equals the direct batch aggregate — the same
    monitor discipline as the quantile/theta/Count-Min stores, here
    powering a distribution-drift gate between dataset refreshes.

    100 TB shape: per batch one map-side-combinable (bucket, side)
    count of ONLY that batch's rows; store growth is
    distinct-buckets-per-batch, compactable by re-aggregation; the
    final ECDF walk runs on the distinct-bucket spine.  Reference
    scope: flo consume + Spark streaming (SURVEY §2 Part B streaming
    monitors)."""
    from flo_spark.queries import scratch_dir

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    # single-row metadata collect: wave horizon anchors (documented)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    cut1, cut2 = lo + span, lo + span * 2

    tmp = scratch_dir("flo_drift_")
    feed, ckpt, store = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/store"

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.filter(F.col("event_type").isin("click", "purchase"))
            .select(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vx"),
                F.when(F.col("event_type") == "click", 1)
                .otherwise(0)
                .alias("i1"),
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
                .alias("i2"),
            )
            .groupBy("vx")
            .agg(F.sum("i1").alias("c1"), F.sum("i2").alias("c2"))
            .write.mode("overwrite")
            .parquet(f"{store}/batch={batch_id}")
        )

    def drain() -> None:
        src = spark.readStream.schema(ev.schema).parquet(feed)
        q = (
            src.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("drift stream did not drain")

    waves = [
        F.col("ts") <= F.lit(cut1),
        (F.col("ts") > F.lit(cut1)) & (F.col("ts") <= F.lit(cut2)),
        F.col("ts") > F.lit(cut2),
    ]
    for i, w in enumerate(waves):
        ev.filter(w).coalesce(1).write.parquet(f"{feed}/wave={i}")
        drain()

    g = (
        spark.read.option("basePath", store)
        .parquet(store)
        .groupBy("vx")
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
        .persist()  # totals + ECDF walk share the folded store scan
    )
    n = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    wv = Window.orderBy("vx")
    cum = g.select(
        "vx",
        F.sum("c1").over(wv).alias("cc1"),
        F.sum("c2").over(wv).alias("cc2"),
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "vx",
        "n1",
        "n2",
        F.abs(
            F.col("cc1") * F.col("n2") - F.col("cc2") * F.col("n1")
        ).alias("dn"),
    )
    best = d.orderBy(F.col("dn").desc(), F.col("vx")).limit(1)
    return best.selectExpr(
        "CAST(n1 AS BIGINT) AS n_1",
        "CAST(n2 AS BIGINT) AS n_2",
        "CAST(dn AS BIGINT) AS ks_num",
        "CAST((dn * 1000000) div (n1 * n2) AS BIGINT) AS ks_x1e6",
        "CAST(vx AS BIGINT) AS ks_at_vx",
    )


@query(
    "dtw_daily_profiles",
    """
    WITH hours AS (SELECT unnest(range(0, 24)) AS h),
    a AS (
      SELECT hours.h, count(e.ts) AS v
      FROM hours LEFT JOIN events e
        ON date_trunc('day', e.ts) = TIMESTAMP '2024-01-02'
       AND CAST(extract(hour FROM e.ts) AS BIGINT) = hours.h
      GROUP BY hours.h
    ),
    b AS (
      SELECT hours.h, count(e.ts) AS v
      FROM hours LEFT JOIN events e
        ON date_trunc('day', e.ts) = TIMESTAMP '2024-01-29'
       AND CAST(extract(hour FROM e.ts) AS BIGINT) = hours.h
      GROUP BY hours.h
    ),
    c AS (
      SELECT a.h + 1 AS i, b.h + 1 AS j, abs(a.v - b.v) AS cost
      FROM a, b
    ),
    dp AS (
      -- DTW as a WAVEFRONT RECURSION: the working set holds the
      -- current anti-diagonal (is_new=1) and the one before
      -- (is_new=0); each step emits diag d+1 cells as the grouped
      -- min over orthogonal preds (from is_new=1 rows) and diagonal
      -- preds (from is_new=0 rows), and re-emits diag d once.
      WITH RECURSIVE t(i, j, acc, is_new) AS (
        SELECT 1, 1, (SELECT cost FROM c WHERE i = 1 AND j = 1), 1
        UNION ALL
        SELECT tgt.i, tgt.j,
               min(tgt.base + coalesce(c.cost, 0)),
               max(tgt.flag)
        FROM (
          SELECT u.ti AS i, u.tj AS j, t.acc AS base, u.flag
          FROM t, unnest(CASE WHEN t.is_new = 1 THEN [
                   struct_pack(ti := t.i + 1, tj := t.j, flag := 1),
                   struct_pack(ti := t.i, tj := t.j + 1, flag := 1),
                   struct_pack(ti := t.i, tj := t.j, flag := 0)
                 ] ELSE [
                   struct_pack(ti := t.i + 1, tj := t.j + 1, flag := 1)
                 ] END) AS x(u)
          WHERE u.ti <= 24 AND u.tj <= 24
        ) tgt
        LEFT JOIN c ON c.i = tgt.i AND c.j = tgt.j AND tgt.flag = 1
        GROUP BY tgt.i, tgt.j
      )
      SELECT min(acc) AS dtw FROM t WHERE i = 24 AND j = 24
    )
    SELECT CAST((SELECT sum(v) FROM a) AS BIGINT) AS n_events_a,
           CAST((SELECT sum(v) FROM b) AS BIGINT) AS n_events_b,
           CAST((SELECT sum(abs(a.v - b.v)) FROM a JOIN b
                 ON b.h = a.h) AS BIGINT) AS l1_aligned,
           CAST(dp.dtw AS BIGINT) AS dtw_cost
    FROM dp
    """,
)
def dtw_daily_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Time Warping between two daily activity profiles (the
    24 hourly counts of Jan 2 vs Jan 29) — the shape-similarity
    measure that tolerates phase shift where the aligned L1 distance
    (also reported) cannot — in EXACT integer arithmetic: |a_i - b_j|
    costs, the classic dp[i][j] = cost + min(left, up, diag)
    recurrence, and a total warp cost that hash-matches across two
    COMPLETELY DIFFERENT evaluations: Spark folds the DP in a
    spine-sized applyInPandas (the holt_winters/sequence_packing
    sequential-fold discipline), while the DuckDB oracle replays it
    as a WAVEFRONT RECURSION — a recursive CTE whose working set is
    one anti-diagonal plus its predecessor, advancing with a grouped
    min per cell (aggregation inside recursion, which DuckDB permits
    and Spark's recursive CTEs do not — the reason the two sides use
    different formulations of the same exact algorithm).

    100 TB shape: the corpus collapses to two 24-point profiles in
    one map-side-combinable conditional aggregate; the O(24^2) DP is
    driver-free spine work inside a single Arrow batch.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B time series)."""
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    hr = F.expr("CAST(extract(hour FROM ts) AS BIGINT)")
    prof = (
        ev.filter(
            day.isin(
                F.lit("2024-01-02").cast("timestamp"),
                F.lit("2024-01-29").cast("timestamp"),
            )
        )
        .select(
            F.when(day == F.lit("2024-01-02").cast("timestamp"), "a")
            .otherwise("b")
            .alias("side"),
            hr.alias("h"),
        )
        .groupBy("side", "h")
        .agg(F.count("*").alias("v"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        va = [0] * 24
        vb = [0] * 24
        for _, row in pdf.iterrows():
            (va if row["side"] == "a" else vb)[int(row["h"])] = int(
                row["v"]
            )
        big = 1 << 60
        dp = [[big] * 25 for _ in range(25)]
        for i in range(1, 25):
            for j in range(1, 25):
                cost = abs(va[i - 1] - vb[j - 1])
                if i == 1 and j == 1:
                    dp[i][j] = cost
                else:
                    dp[i][j] = cost + min(
                        dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
                    )
        return pd.DataFrame(
            {
                "n_events_a": [sum(va)],
                "n_events_b": [sum(vb)],
                "l1_aligned": [
                    sum(abs(x - y) for x, y in zip(va, vb))
                ],
                "dtw_cost": [dp[24][24]],
            }
        )

    return (
        prof.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "n_events_a long, n_events_b long, l1_aligned long,"
            " dtw_cost long",
        )
    )


@query(
    "binaryfile_asset_scan",
    """
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id < 20
    ),
    s AS (
      SELECT doc_id, unnest(range(0, 64)) AS i FROM d
    ),
    px AS (
      SELECT doc_id, (doc_id * 7 + i * 3) % 256 AS v FROM s
    )
    SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum_gray
    FROM px GROUP BY doc_id
    """,
)
def binaryfile_asset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's ``binaryFile`` source as the multimodal ingestion path:
    per low-id document an 8x8 grayscale TGA file (formula pixels)
    lands on disk, the directory is scanned with
    format('binaryFile') + pathGlobFilter — path, length, and raw
    CONTENT columns, the canonical way image/audio corpora enter
    Spark — and the content bytes decode back through the native TGA
    codec in an Arrow-batched mapInPandas; per-file pixel sums must
    reproduce the formula.  The asset id travels IN the filename and
    is recovered by path parsing (regexp_extract), as real asset
    lakes do.

    100 TB shape: binaryFile scans parallelize per file and prune by
    glob before any read; decode is scan-stage Python over Arrow
    batches, no shuffle until the final aggregate; the one
    anti-pattern (tiny files) is exactly what small_file_compaction
    addresses upstream.  Reference scope: source extension (SURVEY §2
    Part B sources/sinks + multimodal)."""
    import os
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_tga
    from flo_spark.queries import scratch_dir

    tmp = scratch_dir("flo_binfile_")
    assets = f"{tmp}/assets"
    os.makedirs(assets, exist_ok=True)
    ids = [
        r[0]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id")
        .collect()  # O(20) metadata collect: the asset id list
    ]
    i = np.arange(64)
    for d in ids:
        img = ((d * 7 + i * 3) % 256).astype(np.uint8).reshape(8, 8)
        with open(f"{assets}/doc_{d}.tga", "wb") as f:
            f.write(encode_tga(img))

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tga")
        .load(assets)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.tga", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "sum_gray": []}
            for d, blob in zip(pdf.doc_id, pdf.content):
                arr = decode_image(bytes(blob))
                out["doc_id"].append(int(d))
                out["sum_gray"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return files.mapInPandas(_decode, "doc_id long, sum_gray long")


@query(
    "dynamic_partition_overwrite",
    """
    WITH base AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS px
      FROM orders
    ),
    kept AS (
      SELECT * FROM base
      WHERE o_orderpriority <> '1-URGENT' OR px > 2000000000
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(px) AS BIGINT) AS revenue_x1e4
    FROM kept GROUP BY o_orderpriority
    """,
)
def dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition overwrite — the lakehouse daily-refresh
    primitive: orders land in a hive-partitioned table (partition =
    priority), then ONE partition ('1-URGENT', rewritten to keep only
    orders above $200k) is replaced via
    partitionOverwriteMode=dynamic — the writer only touches
    partitions present in the incoming frame, so the other four
    survive byte-identical where STATIC overwrite mode would have
    truncated the whole table (the classic data-loss footgun this
    entry pins).  The final per-priority aggregate hash-matches the
    oracle's expected combined state: four untouched partitions plus
    the filtered fifth.

    100 TB shape: the refresh writes O(changed partition), never
    O(table); readers see partition pruning on the rewritten layout
    (same hive layout as dpp_month_partition_prune).  Reference
    scope: flo's segment-granular rewrite (A12 compaction) is the
    event-log analog; this is the relational form (SURVEY §2 Part B
    sources/sinks)."""
    from flo_spark.queries import scratch_dir

    tmp = scratch_dir("flo_dpo_")
    tbl = f"{tmp}/orders_by_priority"
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        money_scaled(F.col("o_totalprice")).alias("px"),
    )
    base.write.partitionBy("prio").parquet(tbl)
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    try:
        (
            base.filter(
                (F.col("prio") == "1-URGENT")
                & (F.col("px") > 2_000_000_000)
            )
            .write.mode("overwrite")
            .partitionBy("prio")
            .parquet(tbl)
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
    return (
        spark.read.parquet(tbl)
        .groupBy("prio")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("px").cast("long").alias("revenue_x1e4"),
        )
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n_orders",
            "revenue_x1e4",
        )
    )


@query(
    "anova_f_returnflag",
    """
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    g AS (
      SELECT grp, count(*) AS n, sum(CAST(y AS HUGEINT)) AS s,
             sum(CAST(y AS HUGEINT) * y) AS q
      FROM v GROUP BY grp
    ),
    t AS (
      SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq,
             sum((s * s) // n) AS sb
      FROM g
    ),
    parts AS (
      -- n-scaled exact sums of squares: SSB and SSW both inherit the
      -- per-group floor from (s^2 div n); SST = their recombination
      SELECT k, nn,
             sb - (ss * ss) // nn AS ssb,
             qq - sb AS ssw
      FROM t
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n_rows,
           CAST(ssb // 100000000 AS BIGINT) AS ssb_x1e8_units,
           CAST(ssw // 100000000 AS BIGINT) AS ssw_x1e8_units,
           CAST((ssb * (nn - k) * 1000000) // (ssw * (k - 1))
                AS BIGINT) AS f_x1e6
    FROM parts
    """,
)
def anova_f_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic — does mean extended price differ
    across the three return-flag groups? — ENGINE-EXACT: per-group
    integer moments give the between-group sum of squares as
    sum(S_g^2 div n_g) - S^2 div N and the within-group SS as
    Q - sum(S_g^2 div n_g) (each term floored identically on both
    engines, the welch_t2 discipline generalized from 2 groups to k),
    and F = (SSB/(k-1)) / (SSW/(N-k)) cross-multiplies into one
    truncating division on the 1e-6 grid — no float fold anywhere.
    welch_t2_ab_test is the k=2 special case with unpooled variances;
    this is the k-group screening test run before pairwise
    comparisons.

    100 TB shape: ONE map-side-combinable aggregate producing three
    integer partials per group, a k-row combine, O(1) arithmetic —
    q6's shape.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B statistics)."""
    li = load(spark, sf_dir, "lineitem")
    d = lambda c: c.cast("decimal(38,0)")
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        money_scaled(F.col("l_extendedprice")).alias("y"),
    )
    g = v.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(d(F.col("y"))).alias("s"),
        F.sum(d(F.col("y")) * F.col("y")).alias("q"),
    )
    t = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        # Spark's div lowers to a LONG result and overflows on s^2/n;
        # subtracting the remainder first makes the decimal division
        # exact (floor for nonnegative operands, matching DuckDB //)
        F.sum(
            F.expr(
                "CAST((s * s - (s * s) % n) / n AS DECIMAL(38,0))"
            )
        ).alias("sb"),
    )
    parts = t.selectExpr(
        "k",
        "nn",
        "sb - CAST((ss * ss - (ss * ss) % nn) / nn AS DECIMAL(38,0))"
        " AS ssb",
        "qq - sb AS ssw",
    )
    return parts.selectExpr(
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(nn AS BIGINT) AS n_rows",
        "CAST(ssb div 100000000 AS BIGINT) AS ssb_x1e8_units",
        "CAST(ssw div 100000000 AS BIGINT) AS ssw_x1e8_units",
        "CAST((ssb * (nn - k) * 1000000) div (ssw * (k - 1))"
        " AS BIGINT) AS f_x1e6",
    )


@query(
    "friedman_rank_test",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    full_days AS (
      SELECT day FROM daily GROUP BY day
      HAVING count(*) = (SELECT count(DISTINCT event_type) FROM daily)
    ),
    ranked AS (
      SELECT d.day, d.event_type,
             row_number() OVER (PARTITION BY d.day
                                ORDER BY d.cnt, d.event_type) AS r
      FROM daily d JOIN full_days f ON f.day = d.day
    ),
    sums AS (
      SELECT event_type, sum(r) AS rj, count(*) AS n
      FROM ranked GROUP BY event_type
    ),
    agg AS (
      SELECT count(*) AS k, max(n) AS n,
             sum(CAST(rj AS HUGEINT) * rj) AS rj2
      FROM sums
    )
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST(n AS BIGINT) AS n_blocks,
           CAST(rj2 AS BIGINT) AS sum_rank_sq,
           CAST((12 * rj2 * 1000000)
                  // (CAST(n AS HUGEINT) * k * (k + 1))
                - 3 * CAST(n AS HUGEINT) * (k + 1) * 1000000
                AS BIGINT) AS chi2_x1e6
    FROM agg
    """,
)
def friedman_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's rank test — do the event types keep the same
    activity ORDERING day after day, or does some type systematically
    dominate? — blocks are the complete days, treatments the event
    types, each day ranking its types by count with a deterministic
    (count, type) tie-break (documented: textbook Friedman uses
    average ranks under ties; the deterministic variant keeps every
    quantity an exact integer, and ties between daily counts are the
    measure-zero case here).  chi^2_F = 12*sum(R_j^2)/(n*k*(k+1)) -
    3n(k+1) evaluates as one truncating division on the 1e-6 grid —
    the nonparametric repeated-measures ANOVA, exact end to end.

    100 TB shape: one (day, type) map-side-combinable count collapses
    the corpus to a calendar-bounded grid; per-day ranking windows
    parallelize across days; the treatment reduce is k rows.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B statistics)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("cnt"))
        .persist()  # full-day filter + ranking share the grid
    )
    n_types = daily.select("event_type").distinct().count()
    full_days = (
        daily.groupBy("day")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == n_types)
        .select("day")
    )
    ranked = daily.join(full_days, "day").select(
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("day").orderBy("cnt", "event_type")
        )
        .alias("r"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rj"), F.count("*").alias("n")
    )
    d = lambda e: F.expr(e).cast("decimal(38,0)")
    agg = sums.agg(
        F.count("*").alias("k"),
        F.max("n").alias("n"),
        F.sum(d("rj") * F.col("rj")).alias("rj2"),
    )
    return agg.selectExpr(
        "CAST(k AS BIGINT) AS k_treatments",
        "CAST(n AS BIGINT) AS n_blocks",
        "CAST(rj2 AS BIGINT) AS sum_rank_sq",
        "CAST((12 * rj2 * 1000000)"
        " div (CAST(n AS DECIMAL(38,0)) * k * (k + 1))"
        " - 3 * CAST(n AS DECIMAL(38,0)) * (k + 1) * 1000000"
        " AS BIGINT) AS chi2_x1e6",
    )


@query(
    "forecast_eval_mase_pinball",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    lagd AS (
      SELECT h, cnt,
             lag(cnt, 24) OVER (ORDER BY h) AS snaive,
             lag(cnt, 1) OVER (ORDER BY h) AS naive
      FROM c
    ),
    err AS (
      SELECT count(*) AS n,
             sum(abs(cnt - snaive)) AS sae_seasonal,
             sum(abs(cnt - naive)) AS sae_naive
      FROM lagd WHERE snaive IS NOT NULL AND naive IS NOT NULL
    ),
    q AS (
      SELECT cnt AS q90 FROM (
        SELECT cnt, row_number() OVER (ORDER BY cnt, h) AS rn,
               count(*) OVER () AS n
        FROM c) WHERE rn = (9 * n + 9) // 10
    ),
    pin AS (
      SELECT sum(CASE WHEN cnt >= q.q90
                 THEN 9 * (cnt - q.q90)
                 ELSE 1 * (q.q90 - cnt) END) AS pinball10_x10,
             count(*) AS n_hours
      FROM c, q
    )
    SELECT CAST(err.n AS BIGINT) AS n_scored,
           CAST(sae_seasonal AS BIGINT) AS sae_seasonal,
           CAST(sae_naive AS BIGINT) AS sae_naive,
           CAST((sae_seasonal * 1000000) // sae_naive AS BIGINT)
             AS mase_x1e6,
           CAST(q.q90 AS BIGINT) AS q90_forecast,
           CAST(pin.pinball10_x10 AS BIGINT) AS pinball90_sum_x10
    FROM err, q, pin
    """,
)
def forecast_eval_mase_pinball(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast EVALUATION metrics for the time-series family
    (EWMA/Holt/Holt-Winters/Theil-Sen produce forecasts; something
    must score them) — ENGINE-EXACT: MASE's numerator and denominator
    are integer sums of absolute errors (seasonal-naive lag-24
    forecast vs the naive lag-1 scale), their ratio one truncating
    division on the 1e-6 grid; the pinball (quantile) loss of the
    constant p90 forecast — the metric that makes quantile forecasts
    honest — is 10x-scaled so the 0.9/0.1 asymmetric weights stay
    integers (9 and 1), with the p90 itself an exact rank pick.
    MASE < 1e6 means the seasonal model beats the naive scale — the
    standard scale-free verdict.

    100 TB shape: one map-side-combinable hourly count collapses the
    corpus to the calendar spine; lags are one ordered window over
    it, the quantile an exact rank pick, both reducers single-row.
    Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B time series)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        # lags, rank pick, and pinball scan share the spine
        .persist()
    )
    w = Window.orderBy("h")
    lagd = c.select(
        "cnt",
        F.lag("cnt", 24).over(w).alias("snaive"),
        F.lag("cnt", 1).over(w).alias("naive"),
    )
    err = lagd.filter(
        F.col("snaive").isNotNull() & F.col("naive").isNotNull()
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.abs(F.col("cnt") - F.col("snaive"))).alias(
            "sae_seasonal"
        ),
        F.sum(F.abs(F.col("cnt") - F.col("naive"))).alias("sae_naive"),
    )
    ranked = c.select(
        "cnt",
        F.row_number().over(Window.orderBy("cnt", "h")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    q = ranked.filter(F.expr("rn = (9 * n + 9) div 10")).select(
        F.col("cnt").alias("q90")
    )
    pin = c.crossJoin(F.broadcast(q)).agg(
        F.sum(
            F.when(
                F.col("cnt") >= F.col("q90"),
                9 * (F.col("cnt") - F.col("q90")),
            ).otherwise(F.col("q90") - F.col("cnt"))
        ).alias("pinball10_x10"),
        F.max("q90").alias("q90"),
    )
    return (
        err.crossJoin(F.broadcast(pin)).selectExpr(
            "CAST(n AS BIGINT) AS n_scored",
            "CAST(sae_seasonal AS BIGINT) AS sae_seasonal",
            "CAST(sae_naive AS BIGINT) AS sae_naive",
            "CAST((sae_seasonal * 1000000) div sae_naive AS BIGINT)"
            " AS mase_x1e6",
            "CAST(q90 AS BIGINT) AS q90_forecast",
            "CAST(pinball10_x10 AS BIGINT) AS pinball90_sum_x10",
        )
    )


@query(
    "hodges_lehmann_location",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT a.cnt + b.cnt AS w2
      FROM c a JOIN c b ON b.h >= a.h
    ),
    m AS (SELECT count(*) AS n_walsh FROM w),
    r AS (SELECT w2, row_number() OVER (ORDER BY w2) AS rn FROM w)
    SELECT CAST(m.n_walsh AS BIGINT) AS n_walsh,
           CAST(r.w2 AS BIGINT) AS hl_x2,
           CAST((SELECT min(w2) FROM w) AS BIGINT) AS min_x2,
           CAST((SELECT max(w2) FROM w) AS BIGINT) AS max_x2
    FROM r, m WHERE r.rn = (m.n_walsh + 1) // 2
    """,
)
def hodges_lehmann_location(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hodges-Lehmann location estimate of the hourly event rate —
    the median of all Walsh averages (x_i + x_j)/2 over pairs i <= j,
    the estimator dual to the Wilcoxon signed-rank test: ~2x more
    statistically efficient than the plain median under normality yet
    still breakdown-robust at 0.29.  ENGINE-EXACT by carrying the
    DOUBLED averages (x_i + x_j stays an integer; the /2 is the
    caller's presentation), with the lower-median rank pick —
    completing the robust-location toolkit next to theil_sen (robust
    slope) and mad_robust_outliers (robust scale).

    100 TB shape: one map-side-combinable hourly count collapses the
    corpus to the calendar-bounded spine; the O(spine^2) Walsh pairs
    and the rank pick run on spine-sized data — the Theil-Sen shape
    applied to location.  Reference scope: flo has no analytics
    surface — north-star extension (SURVEY §2 Part B statistics)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        # both pair sides share the spine
        .persist()
    )
    a = c.select(F.col("h").alias("ha"), F.col("cnt").alias("ca"))
    b = c.select(F.col("h").alias("hb"), F.col("cnt").alias("cb"))
    w = a.join(b, F.col("hb") >= F.col("ha")).select(
        (F.col("ca") + F.col("cb")).alias("w2")
    ).persist()  # count, rank, and min/max share the pair table
    m = w.agg(F.count("*").alias("n_walsh"))
    mm = w.agg(
        F.min("w2").alias("min_x2"), F.max("w2").alias("max_x2")
    )
    r = w.select(
        "w2", F.row_number().over(Window.orderBy("w2")).alias("rn")
    )
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.expr("rn = (n_walsh + 1) div 2"))
        .crossJoin(F.broadcast(mm))
        .select(
            F.col("n_walsh").cast("long").alias("n_walsh"),
            F.col("w2").cast("long").alias("hl_x2"),
            F.col("min_x2").cast("long").alias("min_x2"),
            F.col("max_x2").cast("long").alias("max_x2"),
        )
    )


@query(
    "wilcoxon_signed_rank",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    h0 AS (SELECT min(h) AS h0 FROM c),
    pair AS (
      SELECT a.cnt - b.cnt AS d
      FROM c a JOIN c b ON b.h = a.h + 168
      JOIN h0 ON a.h - h0.h0 < 168
      WHERE a.cnt <> b.cnt
    ),
    r AS (
      SELECT d, row_number() OVER (ORDER BY abs(d), d) AS rnk
      FROM pair
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN d > 0 THEN rnk ELSE 0 END) AS w_plus
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(w_plus AS BIGINT) AS w_plus,
           CAST(CAST(n AS HUGEINT) * (n + 1) // 2 - w_plus AS BIGINT)
             AS w_minus,
           CAST(CASE
             WHEN 4 * w_plus >= CAST(n AS HUGEINT) * (n + 1)
             THEN ((4 * w_plus - CAST(n AS HUGEINT) * (n + 1))
                   * (4 * w_plus - CAST(n AS HUGEINT) * (n + 1))
                   * 1000000)
                  // (CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) * 2 // 3)
             ELSE ((CAST(n AS HUGEINT) * (n + 1) - 4 * w_plus)
                   * (CAST(n AS HUGEINT) * (n + 1) - 4 * w_plus)
                   * 1000000)
                  // (CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) * 2 // 3)
           END AS BIGINT) AS z2_x1e6
    FROM s
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test — did hourly activity CHANGE between
    the same hours one week apart? — the paired nonparametric
    counterpart to welch_t2 (two independent samples) and
    mcnemar (paired binary): zero differences drop per the textbook
    procedure, |differences| rank with a deterministic (abs, signed)
    tie-break (documented: average ranks under ties are the classical
    variant; the deterministic variant keeps every quantity integer),
    W+ sums positive-difference ranks, and
    z^2 = (W+ - n(n+1)/4)^2 / (n(n+1)(2n+1)/24) clears denominators
    to (4W+ - n(n+1))^2 * 1e6 // (n(n+1)(2n+1)*2//3) — the 16/24
    factor reduced to 2/3, all integer (n(n+1)(2n+1) is divisible
    by 3... floor-composed identically on both engines either way).

    100 TB shape: hourly spine aggregate, one lag-168 self-join on
    the spine, one single-partition rank over the surviving pairs,
    1-row reduce.  Reference scope: flo has no analytics surface —
    north-star extension (SURVEY §2 Part B statistics)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .persist()  # both join sides + the h0 anchor share the spine
    )
    h0 = c.agg(F.min("h").alias("h0"))
    a = c.select(F.col("h").alias("ha"), F.col("cnt").alias("ca"))
    b = c.select(F.col("h").alias("hb"), F.col("cnt").alias("cb"))
    pair = (
        a.join(b, F.col("hb") == F.col("ha") + 168)
        .crossJoin(F.broadcast(h0))
        .filter(
            (F.col("ha") - F.col("h0") < 168)
            & (F.col("ca") != F.col("cb"))
        )
        .select((F.col("ca") - F.col("cb")).alias("d"))
    )
    r = pair.select(
        "d",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("d")), F.col("d")))
        .alias("rnk"),
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rnk")).otherwise(0)).alias(
            "w_plus"
        ),
    )
    D = "CAST(n AS DECIMAL(38,0))"
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_pairs",
        "CAST(w_plus AS BIGINT) AS w_plus",
        f"CAST({D} * (n + 1) div 2 - w_plus AS BIGINT) AS w_minus",
        f"CAST(CASE WHEN 4 * w_plus >= {D} * (n + 1)"
        f" THEN ((4 * w_plus - {D} * (n + 1))"
        f" * (4 * w_plus - {D} * (n + 1)) * 1000000)"
        f" div ({D} * (n + 1) * (2 * n + 1) * 2 div 3)"
        f" ELSE (({D} * (n + 1) - 4 * w_plus)"
        f" * ({D} * (n + 1) - 4 * w_plus) * 1000000)"
        f" div ({D} * (n + 1) * (2 * n + 1) * 2 div 3)"
        " END AS BIGINT) AS z2_x1e6",
    )


@query(
    "runs_test_daily",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT cnt AS m FROM (
        SELECT cnt, row_number() OVER (ORDER BY cnt, day) AS rn,
               count(*) OVER () AS n
        FROM d) WHERE rn = (n + 1) // 2
    ),
    lab AS (
      SELECT day, CASE WHEN cnt > med.m THEN 1 ELSE 0 END AS above
      FROM d, med WHERE cnt <> med.m
    ),
    seq AS (
      SELECT above,
             lag(above) OVER (ORDER BY day) AS prev
      FROM lab
    ),
    s AS (
      SELECT count(*) AS n,
             sum(above) AS n1,
             sum(1 - above) AS n2,
             sum(CASE WHEN prev IS NULL OR above <> prev
                 THEN 1 ELSE 0 END) AS runs
      FROM seq
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           CAST(1000000 + (2 * CAST(n1 AS HUGEINT) * n2 * 1000000)
                // (n1 + n2) AS BIGINT) AS expected_runs_x1e6
    FROM s
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test setup on the daily event counts: days
    label above/below the exact lower-median (ties to the median drop,
    textbook), maximal same-label runs count via one lag window, and
    the null expectation E[R] = 1 + 2*n1*n2/(n1+n2) lands on the
    1e-6 grid exactly — the randomness diagnostic that catches
    autocorrelated or regime-switching series where per-point tests
    can't (a trending month has FEWER runs than chance).  Observed
    vs expected comparison is the caller's; both are exact.

    100 TB shape: one day-keyed count collapses the corpus to a
    calendar spine; the median is an exact rank pick and the run
    count one ordered window over the spine.  Reference scope: flo
    has no analytics surface — north-star extension (SURVEY §2
    Part B statistics)."""
    d = (
        load(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("cnt"))
        .persist()  # median pick + labeling share the spine
    )
    med = (
        d.select(
            "cnt",
            F.row_number()
            .over(Window.orderBy("cnt", "day"))
            .alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select(F.col("cnt").alias("m"))
    )
    lab = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("cnt") != F.col("m"))
        .select(
            "day",
            F.when(F.col("cnt") > F.col("m"), 1).otherwise(0).alias(
                "above"
            ),
        )
    )
    seq = lab.select(
        "above", F.lag("above").over(Window.orderBy("day")).alias("prev")
    )
    s = seq.agg(
        F.count("*").alias("n"),
        F.sum("above").alias("n1"),
        F.sum(1 - F.col("above")).alias("n2"),
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("above") != F.col("prev")),
                1,
            ).otherwise(0)
        ).alias("runs"),
    )
    return s.selectExpr(
        "CAST(n1 AS BIGINT) AS n_above",
        "CAST(n2 AS BIGINT) AS n_below",
        "CAST(runs AS BIGINT) AS n_runs",
        "CAST(1000000 + (2 * CAST(n1 AS DECIMAL(38,0)) * n2 * 1000000)"
        " div (n1 + n2) AS BIGINT) AS expected_runs_x1e6",
    )


@query(
    "multimodal_ico_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 64)) AS i FROM documents
    ),
    rgba AS (
      SELECT doc_id,
             (doc_id * 37 + i * 5) % 256 AS r,
             (i * 41 + 11) % 256 AS g,
             (doc_id * 43 + i * 67) % 256 AS b,
             CASE WHEN i % 8 = 7 THEN 0
                  ELSE (doc_id + i * 13) % 256 END AS a
      FROM s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r + g + b + a) AS BIGINT) AS sum_rgba
    FROM rgba GROUP BY doc_id
    """,
)
def multimodal_ico_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ICO round trip, hash-checked, alternating the container's
    two entry formats: even doc_ids encode as headerless DIB entries
    (doubled-height BITMAPINFOHEADER, bottom-up 32-bit BGRA XOR
    pixels, 1-bit AND mask), odd doc_ids as PNG-format entries
    (Vista+), both decoding through ``decode_image``'s ICONDIR
    parser — the DIB path exercises the doubled-height/mask
    arithmetic, the PNG path proves container COMPOSITION with the
    native PNG decoder.  Per-doc RGBA sums (alpha carries real data,
    with a planted transparent column) must reproduce the formula.
    Mask-driven transparency and refusals are unit-tested in
    tests/test_media_decode.py.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle, binary payloads
    opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import decode_image, encode_ico

    W, H = 8, 8

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        for pdf in it:
            out = {"doc_id": [], "n_pixels": [], "sum_rgba": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                r = (d * 37 + i * 5) % 256
                g = (i * 41 + 11) % 256
                b = (d * 43 + i * 67) % 256
                a = np.where(i % 8 == 7, 0, (d + i * 13) % 256)
                img = (
                    np.stack([r, g, b, a], axis=1)
                    .astype(np.uint8)
                    .reshape(H, W, 4)
                )
                got = decode_image(encode_ico(img, as_png=bool(d % 2)))
                out["doc_id"].append(d)
                out["n_pixels"].append(int(got.shape[0] * got.shape[1]))
                out["sum_rgba"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip, "doc_id long, n_pixels long, sum_rgba long"
    )


@query(
    "prefix_filter_jaccard_pairs",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(
               regexp_split_to_array(lower(text), '\s+'),
               x -> x <> ''))) AS token
      FROM documents
    ),
    sets AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    j AS (
      SELECT id_a, id_b, i, sa.n + sb.n - i AS u
      FROM inter
      JOIN sets sa ON sa.doc_id = id_a
      JOIN sets sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b,
           floor(CAST(i AS DOUBLE) / u * 10000 + 0.5) / 10000
             AS jaccard
    FROM j WHERE 2 * i >= u
    """,
)
def prefix_filter_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set-similarity join by PREFIX FILTERING (PPJoin's candidate
    rule): for Jaccard >= 0.5, two token sets MUST share a token
    among each one's first |T| - ceil(0.5|T|) + 1 tokens in a global
    rarity order (document frequency asc, token asc — rare tokens
    first makes prefixes maximally selective), so candidates come
    from a self-join restricted to PREFIX tokens only, then verify
    with the exact integer predicate 2|A∩B| >= |A∪B| — lossless by
    the prefix-filter theorem, which the oracle PROVES by computing
    the unfiltered all-pairs join.  The third blocking family in the
    catalog next to LSH banding (probabilistic) and sorted
    neighborhood (order-based): prefix filtering is the exact one.

    100 TB shape: the df table is one token-keyed count; prefix
    selection is a per-doc window over rarity rank; the candidate
    join moves ONLY prefix postings (the rarest slice of each
    posting list) instead of whole documents; verification joins are
    bounded by candidate count.  Reported jaccard is one IEEE
    division of exact integers, identical on both engines.
    Reference scope: flo has no similarity surface — north-star
    extension (SURVEY §2 Part B dedup/blocking)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    r"filter(split(lower(text), '\\s+'), x -> x <> '')"
                )
            )
        ).alias("token"),
    ).persist()  # df, prefix ranking, and verify all reuse this
    sets = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    df_tbl = tok.groupBy("token").agg(F.count("*").alias("df"))
    prefix = (
        tok.join(df_tbl, "token")
        .select(
            "doc_id",
            "token",
            F.row_number()
            .over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            )
            .alias("rnk"),
        )
        .join(sets, "doc_id")
        .filter(F.expr("rnk <= n - (n + 1) div 2 + 1"))
        .select("doc_id", "token")
    )
    a = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("token").alias("t")
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("token").alias("t")
    )
    cand = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tok.select(
        F.col("doc_id").alias("id_a"), F.col("token").alias("t")
    )
    tb = tok.select(
        F.col("doc_id").alias("id_b"), F.col("token").alias("t")
    )
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    j = (
        inter.join(
            sets.select(
                F.col("doc_id").alias("id_a"), F.col("n").alias("na")
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("id_b"), F.col("n").alias("nb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "i",
            (F.col("na") + F.col("nb") - F.col("i")).alias("u"),
        )
    )
    return j.filter(2 * F.col("i") >= F.col("u")).selectExpr(
        "id_a",
        "id_b",
        "floor(CAST(i AS DOUBLE) / u * 10000 + 0.5) / 10000 AS jaccard",
    )


@query(
    "cochrans_q_event_types",
    """
    WITH m AS (
      SELECT user_id, event_type, 1 AS hit
      FROM events GROUP BY user_id, event_type
    ),
    k AS (SELECT count(DISTINCT event_type) AS k FROM m),
    rows_ AS (
      SELECT user_id, count(*) AS r FROM m GROUP BY user_id
    ),
    keep AS (
      SELECT rows_.user_id, rows_.r FROM rows_, k
      WHERE rows_.r > 0 AND rows_.r < k.k
    ),
    cols AS (
      SELECT m.event_type, count(*) AS c
      FROM m JOIN keep ON keep.user_id = m.user_id
      GROUP BY m.event_type
    ),
    s AS (
      SELECT (SELECT max(k) FROM k) AS k,
             (SELECT count(*) FROM keep) AS n_kept,
             (SELECT sum(CAST(c AS HUGEINT) * c) FROM cols) AS c2,
             (SELECT sum(c) FROM cols) AS cs,
             (SELECT sum(r) FROM keep) AS rs,
             (SELECT sum(CAST(r AS HUGEINT) * r) FROM keep) AS r2
    )
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST(n_kept AS BIGINT) AS n_informative_users,
           CAST((k - 1) * (k * c2 - CAST(cs AS HUGEINT) * cs)
                  * 1000000 // (k * CAST(rs AS HUGEINT) - r2)
                AS BIGINT) AS q_x1e6
    FROM s
    """,
)
def cochrans_q_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran's Q — do the event types differ in REACH (the fraction
    of users who perform them at least once)? — the k-treatment
    generalization of McNemar on matched binary outcomes,
    ENGINE-EXACT: users are blocks, each type a binary treatment,
    uninformative all-0/all-k rows drop per the textbook (they cannot
    discriminate), and Q = (k-1)[k*sum(C_j^2) - (sum C_j)^2] /
    [k*sum(R_i) - sum(R_i^2)] is a pure rational of integer row/
    column sums — one truncating division onto the 1e-6 grid, no
    float anywhere (compare against chi^2_{k-1}).

    100 TB shape: one (user, type) distinct collapse, one row-sum and
    one column-sum aggregate over the reduced matrix, a 1-row reduce
    — nothing corpus-scale moves twice.  Reference scope: flo has no
    analytics surface — north-star extension (SURVEY §2 Part B
    statistics)."""
    m = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .persist()  # k, row sums, and column sums share the matrix
    )
    k = m.select("event_type").distinct().count()  # O(types) metadata
    rows = m.groupBy("user_id").agg(F.count("*").alias("r"))
    keep = rows.filter((F.col("r") > 0) & (F.col("r") < k)).persist()
    cols = (
        m.join(keep.select("user_id"), "user_id")
        .groupBy("event_type")
        .agg(F.count("*").alias("c"))
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    cagg = cols.agg(
        F.sum(d("c") * F.col("c")).alias("c2"),
        F.sum("c").alias("cs"),
    )
    ragg = keep.agg(
        F.count("*").alias("n_kept"),
        F.sum("r").alias("rs"),
        F.sum(d("r") * F.col("r")).alias("r2"),
    )
    return (
        cagg.crossJoin(ragg)
        .selectExpr(
            f"CAST({k} AS BIGINT) AS k_treatments",
            "CAST(n_kept AS BIGINT) AS n_informative_users",
            f"CAST(({k} - 1) * ({k} * c2 - CAST(cs AS DECIMAL(38,0))"
            f" * cs) * 1000000 div ({k} * CAST(rs AS DECIMAL(38,0))"
            " - r2) AS BIGINT) AS q_x1e6",
        )
    )


@query(
    "dispersion_fano_by_type",
    """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(cnt) AS sm,
             sum(CAST(cnt AS HUGEINT) * cnt) AS q
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(sm AS BIGINT) AS n_events,
           CAST((n * q - CAST(sm AS HUGEINT) * sm) * 1000000
                // ((n - 1) * CAST(sm AS HUGEINT)) AS BIGINT)
             AS fano_x1e6,
           CAST((n * q - CAST(sm AS HUGEINT) * sm) * 1000000
                // (CAST(sm AS HUGEINT) * sm) AS BIGINT)
             AS cv2_x1e6
    FROM s
    """,
)
def dispersion_fano_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Burstiness diagnostics per event type, ENGINE-EXACT: the Fano
    factor (index of dispersion, sample variance over mean =
    (nQ - S^2)/((n-1)S)) and the squared coefficient of variation
    ((nQ - S^2)/S^2, the n/(n-1) factor left to the caller) of the
    hourly arrival counts — both pure rationals of integer moments,
    one truncating division each onto the 1e-6 grid.  Fano = 1e6 is
    the Poisson baseline: above means bursty arrivals (provision for
    peaks, batch the ingestion), below means regular (smaller
    buffers) — the capacity-planning statistic for an event store.

    100 TB shape: one (type, hour) map-side-combinable count, one
    per-type moment reduce of the spine — nothing corpus-scale moves
    twice.  Reference scope: flo ingests exactly these arrival
    streams; the diagnostic is the north-star analytics extension
    (SURVEY §2 Part B statistics)."""
    c = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("cnt"))
    )
    d = lambda col: F.col(col).cast("decimal(38,0)")
    s = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("sm"),
        F.sum(d("cnt") * F.col("cnt")).alias("q"),
    )
    return s.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_hours",
        "CAST(sm AS BIGINT) AS n_events",
        "CAST((n * q - CAST(sm AS DECIMAL(38,0)) * sm) * 1000000"
        " div ((n - 1) * CAST(sm AS DECIMAL(38,0))) AS BIGINT)"
        " AS fano_x1e6",
        "CAST((n * q - CAST(sm AS DECIMAL(38,0)) * sm) * 1000000"
        " div (CAST(sm AS DECIMAL(38,0)) * sm) AS BIGINT)"
        " AS cv2_x1e6",
    )


@query(
    "peak_detection_hourly",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    nb AS (
      SELECT h, cnt,
             lag(cnt) OVER (ORDER BY h) AS prv,
             lead(cnt) OVER (ORDER BY h) AS nxt
      FROM c
    ),
    peaks AS (
      SELECT h, cnt FROM nb
      WHERE prv IS NOT NULL AND nxt IS NOT NULL
        AND cnt > prv AND cnt >= nxt
    )
    SELECT CAST(h AS BIGINT) AS epoch_hour,
           CAST(cnt AS BIGINT) AS height
    FROM peaks ORDER BY cnt DESC, h LIMIT 10
    """,
)
def peak_detection_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 local maxima of the hourly event rate — the
    peak-detection primitive behind alerting and seasonality
    eyeballing: an interior hour is a peak iff strictly above its
    left neighbor and at-or-above its right (the deterministic
    half-open plateau rule: a flat plateau yields exactly its FIRST
    hour, no double counting), ranked by height with the epoch-hour
    tie-break.  Pure integer comparisons; complements
    cusum_changepoint (level shifts) and anomaly_zscore (global
    outliers) with LOCAL structure.

    100 TB shape: hourly spine aggregate, one ordered window for the
    neighbor lags, TakeOrderedAndProject for the top-k — no global
    sort.  Reference scope: flo has no analytics surface — north-star
    extension (SURVEY §2 Part B time series)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy("h")
    nb = c.select(
        "h",
        "cnt",
        F.lag("cnt").over(w).alias("prv"),
        F.lead("cnt").over(w).alias("nxt"),
    )
    peaks = nb.filter(
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("cnt") > F.col("prv"))
        & (F.col("cnt") >= F.col("nxt"))
    )
    return (
        peaks.orderBy(F.col("cnt").desc(), F.col("h"))
        .limit(10)
        .select(
            F.col("h").cast("long").alias("epoch_hour"),
            F.col("cnt").cast("long").alias("height"),
        )
    )


@query(
    "durbin_watson_trend_residuals",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    x AS (
      SELECT row_number() OVER (ORDER BY h) AS t, cnt,
             count(*) OVER () AS n
      FROM c
    ),
    s AS (
      SELECT max(n) AS n, sum(t) AS sx, sum(cnt) AS sy,
             sum(CAST(t AS HUGEINT) * t) AS sxx,
             sum(CAST(t AS HUGEINT) * cnt) AS sxy
      FROM x
    ),
    fit AS (
      SELECT n, sx, sy,
             n * sxx - CAST(sx AS HUGEINT) * sx AS det,
             n * sxy - CAST(sx AS HUGEINT) * sy AS bnum
      FROM s
    ),
    e AS (
      -- det-scaled residual: e'_t = det*y_t - bnum*t - anum, with
      -- anum = (det*Sy - bnum*Sx)/n folded in as n*e'_t to stay
      -- integer: en_t = n*det*y_t - n*bnum*t - (det*Sy - bnum*Sx)
      SELECT x.t,
             fit.n * fit.det * x.cnt - fit.n * fit.bnum * x.t
               - (fit.det * fit.sy - fit.bnum * fit.sx) AS en
      FROM x, fit
    ),
    dw AS (
      SELECT sum(en * en) AS sse,
             sum(CASE WHEN prev IS NULL THEN 0
                 ELSE (en - prev) * (en - prev) END) AS sdd
      FROM (SELECT en, lag(en) OVER (ORDER BY t) AS prev FROM e)
    )
    SELECT CAST((SELECT max(n) FROM s) AS BIGINT) AS n_hours,
           CAST((sdd * 1000000) // sse AS BIGINT) AS dw_x1e6
    FROM dw
    """,
)
def durbin_watson_trend_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Durbin-Watson autocorrelation statistic of the residuals from
    the OLS hourly trend — the regression DIAGNOSTIC that says
    whether the trend entries' error terms are independent (DW ~ 2)
    or positively autocorrelated (DW -> 0, the usual traffic case
    that invalidates naive confidence intervals) — ENGINE-EXACT: the
    residuals are scaled by n*det (det = n*Sxx - Sx^2), making
    en_t = n*det*y_t - n*bnum*t - (det*Sy - bnum*Sx) an exact
    integer, and DW = sum(diff^2)/sum(e^2) is scale-invariant so the
    n*det factor cancels — one truncating division onto the 1e-6
    grid, decimal(38,0)/HUGEINT throughout.

    100 TB shape: hourly spine aggregate, one single-row moment
    reduce, one broadcast of the fit back over the spine, one lag
    window — all spine-sized after the first aggregate.  Reference
    scope: flo has no analytics surface — north-star extension
    (SURVEY §2 Part B statistics, the diagnostic for
    regression_price_quantity / holt_linear_trend)."""
    c = (
        load(spark, sf_dir, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
    )
    x = c.select(
        F.row_number().over(Window.orderBy("h")).alias("t"),
        "cnt",
        F.count("*").over(Window.partitionBy()).alias("n"),
    ).persist()  # moment reduce + residual pass share the spine
    d = lambda col: F.col(col).cast("decimal(38,0)")
    s = x.agg(
        F.max("n").alias("n"),
        F.sum("t").alias("sx"),
        F.sum("cnt").alias("sy"),
        F.sum(d("t") * F.col("t")).alias("sxx"),
        F.sum(d("t") * F.col("cnt")).alias("sxy"),
    )
    fit = s.selectExpr(
        "n",
        "sx",
        "sy",
        "n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS det",
        "n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS bnum",
    )
    e = (
        x.select("t", "cnt")
        .crossJoin(F.broadcast(fit))
        .selectExpr(
            "t",
            "n * det * cnt - n * bnum * t - (det * sy - bnum * sx)"
            " AS en",
        )
    )
    lagw = Window.orderBy("t")
    dw = e.select(
        "en", F.lag("en").over(lagw).alias("prev")
    ).agg(
        F.sum(F.col("en") * F.col("en")).alias("sse"),
        F.sum(
            F.when(F.col("prev").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise((F.col("en") - F.col("prev")) * (F.col("en") - F.col("prev")))
        ).alias("sdd"),
    )
    n_row = x.agg(F.max("n").alias("n_hours"))
    return dw.crossJoin(F.broadcast(n_row)).selectExpr(
        "CAST(n_hours AS BIGINT) AS n_hours",
        "CAST((sdd * 1000000) div sse AS BIGINT) AS dw_x1e6",
    )


@query(
    "multimodal_gif_anim_roundtrip",
    """
    WITH s AS (
      SELECT doc_id, unnest(range(0, 48)) AS i FROM documents
    ),
    f0 AS (SELECT doc_id, i, (doc_id + i) % 4 AS v FROM s),
    f1r AS (SELECT doc_id, i, (doc_id * 2 + i * 3) % 4 AS v FROM s),
    f2r AS (SELECT doc_id, i, (doc_id * 5 + i * 7) % 4 AS v FROM s),
    f1 AS (
      SELECT f1r.doc_id, f1r.i,
             CASE WHEN f1r.v = 3 THEN f0.v ELSE f1r.v END AS v
      FROM f1r JOIN f0 ON f0.doc_id = f1r.doc_id AND f0.i = f1r.i
    ),
    f2 AS (
      SELECT f2r.doc_id, f2r.i,
             CASE WHEN f2r.v = 3 THEN f1.v ELSE f2r.v END AS v
      FROM f2r JOIN f1 ON f1.doc_id = f2r.doc_id AND f1.i = f2r.i
    ),
    allf AS (
      SELECT doc_id, 0 AS frame_idx, v FROM f0
      UNION ALL SELECT doc_id, 1, v FROM f1
      UNION ALL SELECT doc_id, 2, v FROM f2
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(sum(CASE v WHEN 0 THEN 10 WHEN 1 THEN 20
                    WHEN 2 THEN 30 ELSE 120 END) AS BIGINT) AS sum_rgb
    FROM allf GROUP BY doc_id, frame_idx
    """,
)
def multimodal_gif_anim_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANIMATED GIF round trip, hash-checked through the GIF89a
    rendering model: per document three 8x6 indexed frames encode
    with per-frame Graphics Control Extensions (delays 10/20/30 cs,
    transparent index 3 on frames 1-2, disposal 1) and a NETSCAPE2.0
    loop block; ``decode_gif_frames`` COMPOSES each frame onto the
    canvas — a transparent pixel must show the prior frame — and the
    oracle replays the same compositing as chained CTEs (frame k's
    value = previous frame's where the raw index is 3).  A defect in
    GCE parsing, transparency masking, or canvas carry breaks the
    hash; the third moving-picture format after Y4M and AVI, and the
    only one with inter-frame state.

    100 TB shape: identical to the other media round trips — one
    Arrow-batched mapInPandas stage, no shuffle, binary payloads
    opaque to the scan."""
    from collections.abc import Iterator

    import pandas as pd

    from flo_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    W, H = 8, 6
    PAL = [(1, 2, 7), (4, 6, 10), (9, 10, 11), (40, 40, 40)]
    CH = [10, 20, 30, 120]  # channel sums per palette entry

    def _roundtrip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(W * H)
        pal_sum = {tuple(PAL[k]): CH[k] for k in range(4)}
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "sum_rgb": []}
            for doc_id in pdf.doc_id:
                d = int(doc_id)
                f0 = ((d + i) % 4).reshape(H, W)
                f1 = ((d * 2 + i * 3) % 4).reshape(H, W)
                f2 = ((d * 5 + i * 7) % 4).reshape(H, W)
                enc = encode_gif_animation(
                    [f0, f1, f2],
                    PAL,
                    delays_cs=[10, 20, 30],
                    transparent_index=3,
                )
                frames, meta = decode_gif_frames(enc)
                assert meta["delays_cs"] == [10, 20, 30]
                for k, fr in enumerate(frames):
                    total = int(fr.astype(np.int64).sum())
                    out["doc_id"].append(d)
                    out["frame_idx"].append(k)
                    out["sum_rgb"].append(total)
            yield pd.DataFrame(out)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _roundtrip, "doc_id long, frame_idx int, sum_rgb long"
    )


@query(
    "weighted_median_price",
    """
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             1 + CAST(o_orderkey % 5 AS BIGINT) AS wt
      FROM orders
    ),
    cum AS (
      SELECT prio, cents, wt,
             sum(wt) OVER (PARTITION BY prio
                           ORDER BY cents, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cw,
             sum(wt) OVER (PARTITION BY prio) AS tw
      FROM v
    ),
    pick AS (
      SELECT prio, cents, tw,
             row_number() OVER (PARTITION BY prio
                                ORDER BY cents, wt) AS rn
      FROM cum WHERE 2 * cw >= tw
    )
    SELECT prio AS o_orderpriority,
           CAST(tw AS BIGINT) AS total_weight,
           CAST(cents AS BIGINT) AS weighted_median_cents
    FROM pick WHERE rn = 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median order price per priority (weights = a
    deterministic 1..5 units-per-order proxy): the lower weighted
    median is the first value, in (cents, weight) order, whose
    cumulative weight reaches half the total — the exact integer
    predicate 2*cumw >= totw needs no division at all, and the
    deterministic secondary sort makes the pick reproducible through
    ties.  Plain medians (exact_percentile_suite) treat every row
    equally; revenue-weighted cuts are what pricing dashboards
    actually want, and the same cumsum shape generalizes to any
    weighted quantile.

    100 TB shape: one per-group ordered window over the fact (the
    quantile_discretizer shape with a weight column); swap in a
    weighted variant of the mergeable quantile sketch when one group
    outgrows a task.  Reference scope: flo has no analytics surface
    — north-star extension (SURVEY §2 Part B statistics)."""
    v = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        (1 + (F.col("o_orderkey") % 5)).cast("long").alias("wt"),
    )
    wo = (
        Window.partitionBy("prio")
        .orderBy("cents", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("prio")
    cum = v.select(
        "prio",
        "cents",
        "wt",
        F.sum("wt").over(wo).alias("cw"),
        F.sum("wt").over(wp).alias("tw"),
    )
    pick = cum.filter(2 * F.col("cw") >= F.col("tw")).select(
        "prio",
        "cents",
        "tw",
        F.row_number()
        .over(Window.partitionBy("prio").orderBy("cents", "wt"))
        .alias("rn"),
    )
    return pick.filter(F.col("rn") == 1).select(
        F.col("prio").alias("o_orderpriority"),
        F.col("tw").cast("long").alias("total_weight"),
        F.col("cents").cast("long").alias("weighted_median_cents"),
    )


@query(
    "srm_guardrail_check",
    """
    WITH assign AS (
      SELECT CASE WHEN (o_orderkey * 2654435761) % 4294967296
                       % 100 < 50 THEN 'A' ELSE 'B' END AS arm
      FROM orders
    ),
    s AS (
      SELECT sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb
      FROM assign
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(((na - nb) * (na - nb) * 1000000) // (na + nb)
                AS BIGINT) AS chi2_x1e6,
           (na - nb) * (na - nb) * 1000000
             > 3841459 * (na + nb) AS srm_alarm_005
    FROM s
    """,
)
def srm_guardrail_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-Ratio Mismatch guardrail — the first thing every A/B
    platform checks before reading any metric: orders assign to arms
    A/B by the deterministic multiplicative (Knuth/Fibonacci) hash at
    a 50/50 target, and the one-degree chi-square against the target
    split, chi^2 = (n_a - n_b)^2 / (n_a + n_b), evaluates as exact
    integers with the alpha=0.05 alarm cross-multiplied against
    1.96^2 — an alarm here means the assignment or logging pipeline
    is broken and every downstream test (welch_t2, diff_in_diff,
    mcnemar) is void.  The same deterministic-hash discipline as
    train_val_test_split, here with its statistical acceptance test
    attached.

    100 TB shape: one map-side-combinable 2-counter aggregate over
    the scan; the verdict is a 1-row projection.  Reference scope:
    flo has no analytics surface — north-star extension (SURVEY §2
    Part B pipeline hygiene)."""
    assign = load(spark, sf_dir, "orders").select(
        F.when(
            F.expr(
                "(o_orderkey * 2654435761) % 4294967296 % 100 < 50"
            ),
            "A",
        )
        .otherwise("B")
        .alias("arm")
    )
    s = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
    )
    return s.selectExpr(
        "CAST(na AS BIGINT) AS n_a",
        "CAST(nb AS BIGINT) AS n_b",
        "CAST(((na - nb) * (na - nb) * 1000000) div (na + nb)"
        " AS BIGINT) AS chi2_x1e6",
        "(na - nb) * (na - nb) * 1000000 > 3841459 * (na + nb)"
        " AS srm_alarm_005",
    )
