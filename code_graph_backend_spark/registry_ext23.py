"""Round-5q extension queries — the classic OLAP star-join shapes over
the driver's dimension tables (the TPC-H Q7/Q3/Q22 families,
re-expressed with the repo's exactness discipline):

- trade_flow_matrix: customer-nation × supplier-nation revenue flows
  (Q7 shape) — two broadcast dimension joins on each side of the fact
  join, revenue through dec_sum DECIMAL accumulation;
- market_segment_share: market segment × order-year revenue cube with
  integer micro-share of segment orders within the year;
- customers_prospects: Q22 shape — positive-balance customers above
  their nation's average balance with NO orders; the average gate is
  CROSS-MULTIPLIED in DECIMAL (bal·n > Σbal), so no float division
  ever decides a row;
- part_hierarchy_rollup: the p_type string parsed into its 3-level
  hierarchy and ROLLUP'd — counts and retail value per prefix level
  (GROUPING SETS over a parsed dimension).

A DuckDB oracle per entry, BIGINT/dec_sum outputs, deterministic
ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .operators.aggregates import dec_sum
from .registry import register
from .session import read_table


@register(
    "trade_flow_matrix",
    """
    SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    ORDER BY cust_nation, supp_nation
    """,
)
def trade_flow_matrix_q(spark, sf_dir):
    """Customer-nation × supplier-nation trade flows (the TPC-H Q7
    family): the fact-fact join (lineitem⋈orders) shuffles on the
    order key; every dimension (customer, supplier, nation×2) is
    broadcast — at 100 TB exactly these five stay broadcast and the
    single shuffle is the orderkey co-location. Revenue accumulates in
    DECIMAL (dec_sum), so the hash is partitioning-independent."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation")
    nc = n.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    return (
        li.join(o, "l_orderkey")
        .join(broadcast(c), "o_custkey")
        .join(broadcast(nc), "c_nationkey")
        .join(broadcast(s), "l_suppkey")
        .join(broadcast(ns), "s_nationkey")
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            dec_sum(F.col("rev")).alias("revenue"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


@register(
    "market_segment_share",
    """
    WITH cube_ AS (
        SELECT c.c_mktsegment AS segment, year(o.o_orderdate) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT yr, CAST(SUM(n_orders) AS BIGINT) AS yr_total FROM cube_ GROUP BY yr)
    SELECT cube_.segment, CAST(cube_.yr AS BIGINT) AS yr, cube_.n_orders,
           cube_.revenue,
           CAST((cube_.n_orders::HUGEINT * 1000000) // tot.yr_total AS BIGINT)
               AS share_micro
    FROM cube_ JOIN tot ON tot.yr = cube_.yr
    ORDER BY segment, yr
    """,
)
def market_segment_share_q(spark, sf_dir):
    """Market-segment × order-year cube with each segment's integer
    micro-share of the year's orders — the Q3-family drill-down a BI
    layer issues constantly. One fact pass with a broadcast customer
    dimension, year totals on the cube (dimension-sized), share by
    integer floor division."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr"), "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    cube = (
        o.join(broadcast(c), "o_custkey")
        .groupBy("segment", "yr")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    from .scratch import scratch_persist

    cube = scratch_persist(cube)
    tot = cube.groupBy("yr").agg(F.sum("n_orders").cast("long").alias("yr_total"))
    return (
        cube.join(tot, "yr")
        .select(
            "segment", F.col("yr").cast("long").alias("yr"), "n_orders", "revenue",
            F.expr("(CAST(n_orders AS DECIMAL(38,0)) * 1000000) div yr_total")
            .cast("long").alias("share_micro"),
        )
        .orderBy("segment", "yr")
    )


@register(
    "customers_prospects",
    """
    WITH nav AS (
        SELECT c_nationkey,
               SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS bal_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0 GROUP BY 1
    ),
    pros AS (
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        FROM customer c
        JOIN nav ON nav.c_nationkey = c.c_nationkey
        WHERE c.c_acctbal > 0
          AND CAST(c.c_acctbal AS DECIMAL(30,4)) * nav.n > nav.bal_sum
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          )
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_prospects,
           CAST(SUM(CAST(p.c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_bal
    FROM pros p JOIN nation n ON n.n_nationkey = p.c_nationkey
    GROUP BY 1 ORDER BY nation
    """,
)
def customers_prospects_q(spark, sf_dir):
    """Q22 shape: positive-balance customers ABOVE their nation's
    average balance who have never ordered. The average gate is
    cross-multiplied in DECIMAL — bal·n > Σbal — so no float division
    decides membership (a customer 1 ulp from the mean hashes the same
    on both engines). The no-orders quantifier is one left-anti join
    against the fact keys; nation totals broadcast."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.col("c_acctbal").cast("decimal(30,4)").alias("bal"),
    ).filter(F.col("bal") > 0)
    from .scratch import scratch_persist

    c = scratch_persist(c)
    nav = c.groupBy("c_nationkey").agg(
        F.sum("bal").alias("bal_sum"), F.count("*").cast("long").alias("n")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    nat = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    pros = (
        c.join(broadcast(nav), "c_nationkey")
        .filter(F.col("bal") * F.col("n") > F.col("bal_sum"))
        .join(orders, "c_custkey", "left_anti")
    )
    return (
        pros.join(broadcast(nat), "c_nationkey")
        .groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_prospects"),
            F.sum("bal").cast("double").alias("total_bal"),
        )
        .orderBy("nation")
    )


@register(
    "part_hierarchy_rollup",
    """
    WITH p AS (
        SELECT string_split(p_type, ' ')[1] AS t1,
               string_split(p_type, ' ')[2] AS t2,
               string_split(p_type, ' ')[3] AS t3,
               p_retailprice
        FROM part
    )
    SELECT COALESCE(t1, '(none)') AS t1,
           CASE WHEN GROUPING(t2) = 1 THEN '(all)' ELSE COALESCE(t2, '(none)') END AS t2,
           CASE WHEN GROUPING(t3) = 1 THEN '(all)' ELSE COALESCE(t3, '(none)') END AS t3,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,4))) AS DOUBLE)
               AS retail_value
    FROM p
    GROUP BY ROLLUP (t1, t2, t3)
    HAVING GROUPING(t1) = 0
    ORDER BY t1, t2, t3
    """,
)
def part_hierarchy_rollup_q(spark, sf_dir):
    """The p_type string parsed into its 3-token hierarchy and
    ROLLUP'd: counts and retail value at every prefix level — the
    parsed-dimension GROUPING SETS idiom (one Expand + one hash-agg,
    no self-union of aggregates). The grand-total row is excluded
    (GROUPING(t1)=0) so every output row names a real level-1
    category."""
    # F.get is the null-tolerant subscript (ANSI mode errors on
    # out-of-bounds getItem; short p_type values have <3 tokens, and
    # DuckDB's list[i] yields NULL there too)
    toks = F.split("p_type", " ")
    p = read_table(spark, sf_dir, "part").select(
        F.get(toks, 0).alias("t1"),
        F.get(toks, 1).alias("t2"),
        F.get(toks, 2).alias("t3"),
        "p_retailprice",
    )
    return (
        p.rollup("t1", "t2", "t3")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            dec_sum(F.col("p_retailprice")).alias("retail_value"),
            F.grouping("t1").alias("g1"),
            F.grouping("t2").alias("g2"),
            F.grouping("t3").alias("g3"),
        )
        .filter(F.col("g1") == 0)
        .select(
            # '(all)' marks a ROLLUP subtotal; '(none)' a NULL source
            # value at the leaf — the two must not share a label or the
            # subtotal row collides with the null-leaf row
            F.coalesce("t1", F.lit("(none)")).alias("t1"),
            F.when(F.col("g2") == 1, "(all)")
            .otherwise(F.coalesce("t2", F.lit("(none)"))).alias("t2"),
            F.when(F.col("g3") == 1, "(all)")
            .otherwise(F.coalesce("t3", F.lit("(none)"))).alias("t3"),
            "n_parts", "retail_value",
        )
        .orderBy("t1", "t2", "t3")
    )
