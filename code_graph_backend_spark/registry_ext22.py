"""Round-5p extension queries:

- events_forecast_backtest: naive vs seasonal-naive forecasting
  backtest on the daily event-count series — per type, the integer
  absolute-error sums over the 7-day holdout (the MASE ingredients,
  reported as exact BIGINTs; the ratio is one division away);
- orders_sla_division: relational DIVISION — orders where EVERY
  lineitem shipped within 30 days of the order date, per priority;
  the ALL-quantified join idiom (max-delay ≤ bound) that naive NOT
  EXISTS formulations get wrong on empty groups;
- orders_ltv_triangle: the customer-lifetime-value cohort triangle —
  first-order month × months-since-first-order, with order counts and
  revenue through exact DECIMAL accumulation (the dec_sum discipline:
  float money never sums in float).

Same discipline: integer/decimal-exact decisions, a DuckDB oracle per
entry, BIGINT casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.aggregates import dec_sum
from .registry import register
from .session import read_table


@register(
    "events_forecast_backtest",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, MAX(d) AS dmax FROM daily GROUP BY 1),
    test AS (
        SELECT a.event_type, a.d, a.x, l1.x AS x1, l7.x AS x7
        FROM daily a
        JOIN mx ON mx.event_type = a.event_type
        JOIN daily l1 ON l1.event_type = a.event_type AND l1.d = a.d - 1
        JOIN daily l7 ON l7.event_type = a.event_type AND l7.d = a.d - 7
        WHERE a.d > mx.dmax - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_test_days,
           CAST(SUM(ABS(x - x1)) AS BIGINT) AS ae_naive,
           CAST(SUM(ABS(x - x7)) AS BIGINT) AS ae_seasonal,
           CAST(SUM(x) AS BIGINT) AS actual_total
    FROM test GROUP BY event_type ORDER BY event_type
    """,
)
def events_forecast_backtest_q(spark, sf_dir):
    """Forecasting backtest on the daily event-count series: over the
    last 7 days per type, the absolute-error sums of the naive
    (yesterday) and seasonal-naive (same weekday last week) forecasts
    — the exact-integer MASE ingredients every capacity-planning
    pipeline starts from. Shape: ONE corpus pass to the day-count
    table, then all lag joins happen on the |days|-row dimension
    (broadcast-sized at any corpus scale)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("datediff(to_date(ts), to_date('2024-01-01'))").alias("d"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("long").alias("x")
    )
    from .scratch import scratch_persist

    daily = scratch_persist(daily)
    mx = daily.groupBy("event_type").agg(F.max("d").alias("dmax"))
    l1 = daily.select(
        F.col("event_type").alias("e1"), F.col("d").alias("d1"),
        F.col("x").alias("x1"),
    )
    l7 = daily.select(
        F.col("event_type").alias("e7"), F.col("d").alias("d7"),
        F.col("x").alias("x7"),
    )
    test = (
        daily.join(mx, "event_type")
        .filter(F.col("d") > F.col("dmax") - 7)
        .join(l1, (F.col("e1") == F.col("event_type")) & (F.col("d1") == F.col("d") - 1))
        .join(l7, (F.col("e7") == F.col("event_type")) & (F.col("d7") == F.col("d") - 7))
    )
    return (
        test.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_test_days"),
            F.sum(F.abs(F.col("x") - F.col("x1"))).cast("long").alias("ae_naive"),
            F.sum(F.abs(F.col("x") - F.col("x7"))).cast("long").alias("ae_seasonal"),
            F.sum("x").cast("long").alias("actual_total"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_sla_division",
    """
    WITH d AS (
        SELECT l.l_orderkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay,
               o.o_orderpriority AS pri
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per_order AS (
        SELECT l_orderkey, pri, MAX(delay) AS max_delay,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM d GROUP BY 1, 2
    )
    SELECT pri AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN max_delay <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_sla,
           CAST(SUM(n_items) AS BIGINT) AS n_items
    FROM per_order GROUP BY pri ORDER BY priority
    """,
)
def orders_sla_division_q(spark, sf_dir):
    """Relational division: orders where EVERY lineitem shipped within
    30 days of the order date, counted per priority — the
    ALL-quantifier answered with one max-agg per group (max_delay <=
    bound ⟺ ∀ items within bound), the shape that scales where
    NOT EXISTS correlated subqueries do not. One join + one hash-agg
    per order + one priority rollup; integer day arithmetic on both
    engines."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("odate"),
        F.col("o_orderpriority").alias("pri"),
    )
    per_order = (
        li.join(o, "l_orderkey")
        .select(
            "l_orderkey", "pri", F.datediff("ship", "odate").alias("delay")
        )
        .groupBy("l_orderkey", "pri")
        .agg(
            F.max("delay").alias("max_delay"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
    return (
        per_order.groupBy(F.col("pri").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.when(F.col("max_delay") <= 30, 1).otherwise(0))
            .cast("long").alias("n_within_sla"),
            F.sum("n_items").cast("long").alias("n_items"),
        )
        .orderBy("priority")
    )


@register(
    "orders_ltv_triangle",
    """
    WITH o AS (
        SELECT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
               o_totalprice
        FROM orders
    ),
    first AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
    cell AS (
        SELECT f.m0, o.m - f.m0 AS since,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                   AS revenue
        FROM o JOIN first f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(m0 AS BIGINT) AS cohort_month,
           CAST(since AS BIGINT) AS months_since,
           n_orders, revenue
    FROM cell ORDER BY cohort_month, months_since
    """,
)
def orders_ltv_triangle_q(spark, sf_dir):
    """The customer-LTV cohort triangle: cohort = absolute month index
    of the customer's first order, cells = (cohort, months since
    first) with order counts and revenue — revenue accumulated in
    exact DECIMAL (dec_sum: float money never sums in float, so
    partitioning cannot change the hash). Shape: one per-customer
    min-agg, one broadcast-joinable first-order table, one cell
    hash-agg — the retention-triangle plan that survives any fan-out
    of the orders table."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
        "o_totalprice",
    )
    from .scratch import scratch_persist

    o = scratch_persist(o)
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.col("m0").cast("long").alias("cohort_month"),
            (F.col("m") - F.col("m0")).cast("long").alias("months_since"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("cohort_month", "months_since")
    )
