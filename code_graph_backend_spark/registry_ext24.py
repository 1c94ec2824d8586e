"""Round-5r extension queries:

- events_scd2_dimension: the slowly-changing-dimension type-2 build —
  consecutive same-value runs per user compressed into
  (valid_from, valid_to) intervals via the gaps-and-islands window
  idiom (LAG change flag → cumulative island id → per-island agg);
- dq_referential_checks: the Deequ/dbt-style data-quality assertion
  suite as ONE query — orphan facts, childless orders, duplicate keys,
  domain violations, each an exact violation count;
- orders_benford_firstdigit: first-digit profile of order totals vs
  Benford's law — expected probabilities are PINNED integer micro
  constants (log10(1+1/d) pre-quantized once, identically in both
  engines), so the fraud-screening chi-square ingredients stay integer.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table


@register(
    "events_scd2_dimension",
    """
    WITH e AS (
        SELECT user_id, event_type,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_type, es, event_id,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ),
    islands AS (
        SELECT user_id, event_type, es,
               SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS island
        FROM flagged
    )
    SELECT user_id, event_type,
           CAST(island AS BIGINT) AS version,
           CAST(MIN(es) AS BIGINT) AS valid_from,
           CAST(MAX(es) AS BIGINT) AS valid_to,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, event_type, island
    ORDER BY user_id, version
    """,
)
def events_scd2_dimension_q(spark, sf_dir):
    """SCD type-2 dimension build from the event stream: per user,
    consecutive runs of the same event_type collapse into one
    versioned validity interval — the gaps-and-islands idiom (LAG
    change flag, running-sum island id, per-island min/max/count).
    Two windows + one hash-agg, all partitioned by user — the exact
    plan a warehouse CDC merge runs at any scale; epoch-second
    integers keep both engines bit-equal."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").alias("es"), "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("es").cast("long").alias("valid_from"),
            F.max("es").cast("long").alias("valid_to"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "user_id", "event_type",
            F.col("island").cast("long").alias("version"),
            "valid_from", "valid_to", "n_events",
        )
        .orderBy("user_id", "version")
    )


@register(
    "dq_referential_checks",
    """
    WITH checks AS (
        SELECT 'orphan_lineitems' AS check_name,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (
                    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
                )) AS violations,
               (SELECT COUNT(*) FROM lineitem) AS total
        UNION ALL
        SELECT 'childless_orders',
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (
                    SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                )),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'dup_order_keys',
               (SELECT COALESCE(SUM(c - 1), 0) FROM (
                   SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
               ) WHERE c > 1),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'nonpositive_prices',
               (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0),
               (SELECT COUNT(*) FROM lineitem)
        UNION ALL
        SELECT 'bad_discounts',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_discount < 0 OR l_discount > 1),
               (SELECT COUNT(*) FROM lineitem)
        UNION ALL
        SELECT 'ship_before_order',
               (SELECT COUNT(*) FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_shipdate < o.o_orderdate),
               (SELECT COUNT(*) FROM lineitem)
    )
    SELECT check_name, CAST(violations AS BIGINT) AS violations,
           CAST(total AS BIGINT) AS total
    FROM checks ORDER BY check_name
    """,
)
def dq_referential_checks_q(spark, sf_dir):
    """The data-quality assertion suite (Deequ/dbt-test shape) as one
    query: referential integrity both ways (anti-joins, never
    correlated subqueries), key uniqueness (groupBy-count surplus),
    domain checks (non-positive price, out-of-range discount), and the
    cross-table ordering invariant ship >= order date. Each check is
    one scan or one equi-join; at 100 TB the anti-joins ride the same
    orderkey co-location as every fact join."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    # one scan of each table + ONE full-outer key join cover all six
    # checks; the join multiplicities under duplicate keys match the
    # oracle's NOT EXISTS / JOIN formulations exactly
    li_agg = li.agg(
        F.count("*").alias("n_li"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("nonpos"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        ).alias("baddisc"),
    ).collect()[0]
    o_agg = o.groupBy("o_orderkey").agg(F.count("*").alias("c")).agg(
        F.sum("c").alias("n_o"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
        ).alias("dup"),
    ).collect()[0]
    j = (
        li.select("l_orderkey", "l_shipdate")
        .join(
            o.select(
                F.col("o_orderkey").alias("l_orderkey"),
                "o_orderdate",
                F.lit(1).alias("is_o"),
            ),
            "l_orderkey",
            "full_outer",
        )
        .agg(
            F.sum(F.when(F.col("is_o").isNull(), 1).otherwise(0)).alias("orphan"),
            F.sum(
                F.when(
                    F.col("l_shipdate").isNull() & F.col("is_o").isNotNull(), 1
                ).otherwise(0)
            ).alias("childless"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("shipb"),
        )
        .collect()[0]
    )
    n_li, n_o = int(li_agg["n_li"]), int(o_agg["n_o"])
    rows = [
        ("bad_discounts", int(li_agg["baddisc"]), n_li),
        ("childless_orders", int(j["childless"]), n_o),
        ("dup_order_keys", int(o_agg["dup"]), n_o),
        ("nonpositive_prices", int(li_agg["nonpos"]), n_li),
        ("orphan_lineitems", int(j["orphan"]), n_li),
        ("ship_before_order", int(j["shipb"]), n_li),
    ]
    return spark.createDataFrame(
        rows, "check_name string, violations long, total long"
    ).orderBy("check_name")


# Benford expected first-digit probabilities, pre-quantized to micro
# units (floor(log10(1+1/d) * 1e6)) — pinned LITERALS, identical in
# both engines, so no transcendental function is in the decision path.
_BENFORD_MICRO = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def _benford_sql() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_MICRO.items()
    )
    return f"""
    WITH d AS (
        -- FLOOR before the BIGINT cast: DuckDB's double->int cast
        -- ROUNDS while Spark's truncates; floor pins both to truncation
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    cnt AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt)
    SELECT digit, n,
           CAST((total::HUGEINT * (CASE digit {cases} END)) // 1000000
               AS BIGINT) AS expected_n,
           CAST(total AS BIGINT) AS total
    FROM cnt CROSS JOIN tot
    ORDER BY digit
    """


@register("orders_benford_firstdigit", _benford_sql())
def orders_benford_firstdigit_q(spark, sf_dir):
    """Benford's-law first-digit screen over order totals — the
    classic fraud/materialization-error detector. The digit comes from
    integer truncation (no float formatting), and the expected count
    is total × a PINNED micro-quantized probability literal
    (floor-divided), so both engines emit identical integers; the
    chi-square is one float step away for the caller. One scan, one
    9-row agg."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("long").alias("digit")
    )
    cnt = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    from .scratch import scratch_persist

    cnt = scratch_persist(cnt)
    tot = cnt.agg(F.sum("n").cast("long").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            F.expr(
                "(CAST(total AS DECIMAL(38,0)) * ("
                + "CASE digit "
                + " ".join(f"WHEN {dd} THEN {pp}" for dd, pp in _BENFORD_MICRO.items())
                + " END)) div 1000000"
            ).cast("long").alias("expected_n"),
            "total",
        )
        .orderBy("digit")
    )
