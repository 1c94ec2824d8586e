"""Round-5s extension queries:

- graph_topological_layers: bounded Kahn layering of the directed
  graph twin — per round every zero-in-degree node gets the round's
  layer id and leaves; the scheduling/DAG-shape probe (nodes still
  cyclic after the budget are reported as layer −1, the explicit
  residual of the bounded contract);
- events_concurrency_profile: peak concurrent 30-minute sessions per
  day — the interval-stacking sweep (+1 at session start, −1 after
  session end, running max of the prefix sum), the capacity question
  every serving team asks of an event log;
- orders_purchase_intervals: distribution of days between consecutive
  orders per customer, rolled to an integer histogram (the loyalty /
  replenishment-cycle probe next to RFM).

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table

_TOPO_ROUNDS = 4


def _topo_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES

    parts = [
        f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),",
        """e0 AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM edges WHERE src <> dst
        ),
        n0 AS MATERIALIZED (SELECT id AS v FROM nodes)""",
    ]
    for t in range(1, _TOPO_ROUNDS + 1):
        parts.append(f""",
        z{t} AS MATERIALIZED (
            SELECT v FROM n{t-1}
            WHERE v NOT IN (SELECT dst FROM e{t-1})
        ),
        n{t} AS MATERIALIZED (
            SELECT v FROM n{t-1} WHERE v NOT IN (SELECT v FROM z{t})
        ),
        e{t} AS MATERIALIZED (
            SELECT e.src, e.dst FROM e{t-1} e
            JOIN n{t} a ON a.v = e.src JOIN n{t} b ON b.v = e.dst
        )""")
    layer_union = "\nUNION ALL ".join(
        f"SELECT v, {t - 1} AS layer FROM z{t}" for t in range(1, _TOPO_ROUNDS + 1)
    )
    parts.append(f""",
    layered AS ({layer_union})
    SELECT CAST(v AS BIGINT) AS node, CAST(layer AS BIGINT) AS layer
    FROM layered
    UNION ALL
    SELECT CAST(v AS BIGINT), -1 FROM n{_TOPO_ROUNDS}
    ORDER BY node""")
    return "\n".join(parts)


@register("graph_topological_layers", _topo_sql())
def graph_topological_layers_q(spark, sf_dir):
    """Bounded Kahn layering over the directed twin: layer t = the
    nodes whose every remaining predecessor was already peeled; after
    {rounds} rounds the still-cyclic (or deeper) residual is reported
    as layer −1 — the explicit bounded-semantics contract shared with
    wcc/sssp/kcore. Runs driver-local below the measured caps on the
    shared dir_arrays cache (in-degrees are one bincount per round);
    the distributed form is one anti-semi-join pair per round."""
    from .graph.tpch import build_graph
    from .operators.toposort import kahn_layers

    g = build_graph(spark, sf_dir)
    return kahn_layers(spark, g.nodes, g.edges, rounds=_TOPO_ROUNDS)


@register(
    "events_concurrency_profile",
    """
    WITH e AS (
        SELECT user_id,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es
        FROM events
    ),
    flagged AS (
        SELECT user_id, es,
               CASE WHEN es - LAG(es) OVER w > 1800 OR LAG(es) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
    ),
    sess AS (
        SELECT user_id,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY es
                   ROWS UNBOUNDED PRECEDING
               ) AS sid,
               es
        FROM flagged
    ),
    iv AS (
        SELECT MIN(es) AS s_start, MAX(es) AS s_end
        FROM sess GROUP BY user_id, sid
    ),
    pts AS (
        SELECT s_start AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT s_end + 1 AS t, -1 AS delta FROM iv
    ),
    sweep AS (
        SELECT t, SUM(SUM(delta)) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS live
        FROM pts GROUP BY t
    )
    SELECT CAST(t // 86400 AS BIGINT) AS day,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM sweep GROUP BY 1 ORDER BY day
    """,
)
def events_concurrency_profile_q(spark, sf_dir):
    """Peak concurrent 30-minute sessions per epoch-day: sessionize
    (gap > 1800s starts a session), then the classic interval-stacking
    sweep — +1 at each session start, −1 one second after its end,
    running prefix sum, max per day. Three windows total; the sweep's
    global ordered window becomes a per-shard prefix sum + boundary
    carry at open-web scale (the lateness-profile contract). Integer
    epoch seconds end to end."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("es").over(w).isNull()
            | (F.col("es") - F.lag("es").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("es").alias("s_start"), F.max("es").alias("s_end")
    )
    pts = iv.select(F.col("s_start").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select((F.col("s_end") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = (
        pts.groupBy("t")
        .agg(F.sum("delta").alias("d"))
        .withColumn(
            "live",
            F.sum("d").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    return (
        sweep.groupBy(F.expr("t div 86400").cast("long").alias("day"))
        .agg(F.max("live").cast("long").alias("peak_concurrent"))
        .orderBy("day")
    )


@register(
    "orders_purchase_intervals",
    """
    WITH o AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS d
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey, d - LAG(d) OVER (
                   PARTITION BY o_custkey ORDER BY d
               ) AS gap
        FROM o
    ),
    g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
    b AS (
        SELECT CASE
            WHEN gap = 0 THEN 0 WHEN gap <= 7 THEN 1 WHEN gap <= 30 THEN 2
            WHEN gap <= 90 THEN 3 WHEN gap <= 365 THEN 4 ELSE 5 END AS bucket,
            gap
        FROM g
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(MIN(gap) AS BIGINT) AS min_days,
           CAST(MAX(gap) AS BIGINT) AS max_days,
           CAST(SUM(gap) AS BIGINT) AS total_days
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def orders_purchase_intervals_q(spark, sf_dir):
    """Days between consecutive orders per customer, rolled into the
    replenishment-cycle histogram (same-day / week / month / quarter /
    year / longer) with exact integer min/max/sum per bucket — the
    loyalty probe read next to RFM. One per-customer LAG window over
    epoch-day integers, then a 6-row rollup."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    gaps = o.select(
        (F.col("d") - F.lag("d").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    b = gaps.select(
        F.when(F.col("gap") == 0, 0)
        .when(F.col("gap") <= 7, 1)
        .when(F.col("gap") <= 30, 2)
        .when(F.col("gap") <= 90, 3)
        .when(F.col("gap") <= 365, 4)
        .otherwise(5)
        .alias("bucket"),
        "gap",
    )
    return (
        b.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.min("gap").cast("long").alias("min_days"),
            F.max("gap").cast("long").alias("max_days"),
            F.sum("gap").cast("long").alias("total_days"),
        )
        .orderBy("bucket")
    )
