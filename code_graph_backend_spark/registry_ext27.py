"""Round-5u extension queries:

- events_window_funnel: windowed funnel depth (the ClickHouse
  windowFunnel shape, declaratively): per user the deepest
  view → click → purchase chain whose later steps all land within
  3600 s of the chain's first view, counted per depth — the
  conversion question "how many users completed step k WITHIN the
  window" (the EXISTS formulation: any qualifying chain counts, a
  well-defined declarative variant of ClickHouse's sequential scan);
- events_slo_burn: the SRE error-budget burn table — per hour, error
  counts vs a 1% SLO with the multiwindow burn-rate flags (14.4× fast
  burn, 6× slow burn, Google SRE workbook ch.5) decided by integer
  cross-multiplication, never a float rate.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table

_FUNNEL_W = 3600


@register(
    "events_window_funnel",
    f"""
    WITH e AS (
        SELECT user_id, event_type,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (SELECT user_id, es FROM e WHERE event_type = 'view'),
    c AS (SELECT user_id, es FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, es FROM e WHERE event_type = 'purchase'),
    d1 AS (SELECT DISTINCT user_id FROM v),
    d2 AS (
        SELECT DISTINCT v.user_id
        FROM v JOIN c ON c.user_id = v.user_id
         AND c.es > v.es AND c.es <= v.es + {_FUNNEL_W}
    ),
    d3 AS (
        SELECT DISTINCT v.user_id
        FROM v
        JOIN c ON c.user_id = v.user_id
         AND c.es > v.es AND c.es <= v.es + {_FUNNEL_W}
        JOIN p ON p.user_id = v.user_id
         AND p.es > c.es AND p.es <= v.es + {_FUNNEL_W}
    ),
    depth AS (
        SELECT d1.user_id,
               CASE WHEN d3.user_id IS NOT NULL THEN 3
                    WHEN d2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS depth
        FROM d1
        LEFT JOIN d2 ON d2.user_id = d1.user_id
        LEFT JOIN d3 ON d3.user_id = d1.user_id
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth GROUP BY depth ORDER BY depth
    """,
)
def events_window_funnel_q(spark, sf_dir):
    """Windowed funnel: users whose deepest strictly-ordered
    view→click→purchase chain fits inside {_FUNNEL_W} s of the chain's
    first view, bucketed by depth. Declarative EXISTS shape: three
    per-type projections of one scan, two windowed range joins per
    user key, distinct user sets — per-user type counts are bounded,
    so the range joins stay user-local; a mega-user would be capped by
    the same (degree, id) split as the basket ops. Integer epoch
    seconds end to end."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_timestamp("ts").alias("es"))
    from .scratch import scratch_persist

    ev = scratch_persist(ev)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("es").alias("ves")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("es").alias("ces")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("es").alias("pes")
    )
    d1 = v.select("user_id").distinct()
    vc = v.join(c, "user_id").filter(
        (F.col("ces") > F.col("ves"))
        & (F.col("ces") <= F.col("ves") + _FUNNEL_W)
    )
    d2 = vc.select("user_id").distinct().withColumn("r2", F.lit(1))
    d3 = (
        vc.join(p, "user_id")
        .filter(
            (F.col("pes") > F.col("ces"))
            & (F.col("pes") <= F.col("ves") + _FUNNEL_W)
        )
        .select("user_id")
        .distinct()
        .withColumn("r3", F.lit(1))
    )
    depth = (
        d1.join(d2, "user_id", "left")
        .join(d3, "user_id", "left")
        .select(
            F.when(F.col("r3").isNotNull(), 3)
            .when(F.col("r2").isNotNull(), 2)
            .otherwise(1)
            .alias("depth")
        )
    )
    return (
        depth.groupBy(F.col("depth").cast("long").alias("depth"))
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("depth")
    )


@register(
    "events_slo_burn",
    """
    WITH e AS (
        SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 3600 AS hr,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ),
    h AS (
        SELECT hr, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(is_err) AS BIGINT) AS n_errors
        FROM e GROUP BY hr
    )
    SELECT CAST(hr AS BIGINT) AS hr, n_total, n_errors,
           CAST(CASE WHEN n_errors * 1000 > n_total * 144 THEN 1 ELSE 0 END
               AS BIGINT) AS fast_burn,
           CAST(CASE WHEN n_errors * 1000 > n_total * 60 THEN 1 ELSE 0 END
               AS BIGINT) AS slow_burn
    FROM h ORDER BY hr
    """,
)
def events_slo_burn_q(spark, sf_dir):
    """Error-budget burn table vs a 1% SLO: per hour, totals, error
    counts, and the two multiwindow burn flags (fast 14.4×, slow 6× —
    the Google SRE workbook alert pair), each decided by integer
    cross-multiplication (errors·1000 > total·144 ⟺ rate > 14.4%, no
    float division). ONE corpus pass to hour cells, then flag
    arithmetic on the hour dimension."""
    ev = read_table(spark, sf_dir, "events").select(
        F.expr("unix_timestamp(ts) div 3600").alias("hr"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    h = ev.groupBy("hr").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("is_err").cast("long").alias("n_errors"),
    )
    return (
        h.select(
            F.col("hr").cast("long").alias("hr"), "n_total", "n_errors",
            F.when(F.col("n_errors") * 1000 > F.col("n_total") * 144, 1)
            .otherwise(0).cast("long").alias("fast_burn"),
            F.when(F.col("n_errors") * 1000 > F.col("n_total") * 60, 1)
            .otherwise(0).cast("long").alias("slow_burn"),
        )
        .orderBy("hr")
    )
