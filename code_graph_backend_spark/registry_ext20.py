"""Round-5n extension queries:

- orders_basket_rules: association-rule mining (support / confidence /
  lift) over order baskets — the Agrawal-Srikant market-basket classic,
  with confidence and lift ranked in EXACT integer micro-units
  (DECIMAL(38) / HUGEINT floor division, the PMI discipline);
- events_gini_engagement: per-event-type Gini coefficient of events
  per user as an exact integer ratio pair — the engagement-
  concentration (Lorenz) probe; Σ(2i−n−1)·x over the sorted per-user
  counts is tie-order invariant, so one window pass is deterministic;
- events_seasonality: day-of-week × hour-of-day traffic profile with a
  per-type chi-square-vs-uniform numerator in exact integers; dow/hour
  come from pure epoch arithmetic ((d+4) % 7, h % 24) so neither
  engine's calendar functions are in the loop;
- events_markov_mixing: bounded power iteration of the event-type
  transition chain from the uniform start, probabilities carried as
  integer micro-units with per-term floor division — the mixing-time
  probe on the verified transition-matrix machinery.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
output casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table

_BR_MIN_SUP = 3
_BR_TOPK = 40


@register(
    "orders_basket_rules",
    f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM op),
    item AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM op GROUP BY p),
    pair AS (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS m
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= {_BR_MIN_SUP}
    ),
    rules AS (
        SELECT p1 AS antecedent, p2 AS consequent, m FROM pair
        UNION ALL
        SELECT p2 AS antecedent, p1 AS consequent, m FROM pair
    )
    SELECT antecedent, consequent, m AS support,
           CAST((m::HUGEINT * 1000000) // ia.n_p AS BIGINT) AS conf_micro,
           CAST((m::HUGEINT * n_orders * 1000000) // (ia.n_p::HUGEINT * ic.n_p)
               AS BIGINT) AS lift_micro
    FROM rules
    JOIN item ia ON ia.p = antecedent
    JOIN item ic ON ic.p = consequent
    CROSS JOIN n
    ORDER BY lift_micro DESC, antecedent, consequent
    LIMIT {_BR_TOPK}
    """,
)
def orders_basket_rules_q(spark, sf_dir):
    """Association rules over order baskets: support m (co-occurring
    orders), confidence m/n(A), lift m·N/(n(A)·n(B)) — both ratios
    floor-divided to micro-units in exact integer arithmetic so the
    ranking never touches a float. Shape: one distinct + one
    bounded-basket self-join (the butterfly/cooc substrate shape), a
    vocabulary-sized item-count join on each side of the rule, a 1-row
    scalar cross join for N, top-k under a total order. The min-support
    gate prunes the pair tail BEFORE the joins — at 100 TB that gate is
    what keeps the rule table bounded (Agrawal & Srikant, VLDB'94)."""
    li = read_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    from .scratch import scratch_persist

    op = scratch_persist(op)
    n = op.select(F.countDistinct("o").cast("long").alias("n_orders"))
    item = op.groupBy("p").agg(F.count("*").cast("long").alias("n_p"))
    # basket self-join removed (r11, guide §2.4): a⋈b on o shuffled the
    # (o, p) table twice and pushed |basket|² join rows through the wire;
    # baskets are bounded (order lines), so one groupBy(o) collecting the
    # sorted item array and an in-array combination expansion emits the
    # IDENTICAL (p1 < p2) pair multiset with a single |op| exchange —
    # the map-side expansion is the same |basket|² rows the join made,
    # but they now feed the (p1, p2) partial agg without an extra
    # shuffle hop. The min-support gate is unchanged.
    baskets = (
        op.groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (a, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " b -> struct(a AS p1, b AS p2))))"
                )
            ).alias("pp")
        )
        .select("pp.p1", "pp.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("m"))
        .filter(F.col("m") >= _BR_MIN_SUP)
    )
    rules = pair.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"), "m"
    ).unionByName(
        pair.select(
            F.col("p2").alias("antecedent"), F.col("p1").alias("consequent"), "m"
        )
    )
    ia = item.select(F.col("p").alias("antecedent"), F.col("n_p").alias("na"))
    ic = item.select(F.col("p").alias("consequent"), F.col("n_p").alias("nc"))
    return (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent", "consequent", F.col("m").alias("support"),
            F.expr("(CAST(m AS DECIMAL(38,0)) * 1000000) div na")
            .cast("long").alias("conf_micro"),
            F.expr(
                "(CAST(m AS DECIMAL(38,0)) * n_orders * 1000000)"
                " div (CAST(na AS DECIMAL(38,0)) * nc)"
            ).cast("long").alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "antecedent", "consequent")
        .limit(_BR_TOPK)
    )


@register(
    "events_gini_engagement",
    """
    WITH ux AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY x, user_id
               ) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS nu
        FROM ux
    )
    SELECT event_type,
           CAST(MAX(nu) AS BIGINT) AS n_users,
           CAST(SUM(x) AS BIGINT) AS total_events,
           CAST(SUM((2 * i - nu - 1) * x) AS BIGINT) AS gini_num,
           CAST(MAX(nu) * SUM(x) AS BIGINT) AS gini_den
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def events_gini_engagement_q(spark, sf_dir):
    """Per-type Gini coefficient of events-per-user as the exact
    integer pair (Σ(2i−n−1)·x, n·Σx) over users sorted by count — the
    Lorenz/engagement-concentration probe a growth analyst reads next
    to DAU/MAU stickiness. The sum is tie-order invariant (equal x
    values contribute the same regardless of their rank order), so the
    one per-type window pass is deterministic across engines. Shape:
    one corpus hash-agg to user-count rows, then a users-sized window —
    at open-web scale the window becomes per-type range-partitioned
    rank, same plan class as quality_percentile."""
    ev = read_table(spark, sf_dir, "events")
    ux = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    r = ux.select(
        "event_type", "x",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("event_type")).alias("nu"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.max("nu").cast("long").alias("n_users"),
            F.sum("x").cast("long").alias("total_events"),
            F.sum((2 * F.col("i") - F.col("nu") - 1) * F.col("x"))
            .cast("long").alias("gini_num"),
            (F.max("nu") * F.sum("x")).cast("long").alias("gini_den"),
        )
        .orderBy("event_type")
    )


@register(
    "events_seasonality",
    """
    WITH e AS (
        SELECT event_type,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es
        FROM events
    ),
    cell AS (
        SELECT event_type,
               ((es // 86400) + 4) % 7 AS dow,
               (es // 3600) % 24 AS hod,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM cell GROUP BY event_type
    ),
    chi AS (
        SELECT c.event_type,
               SUM((168 * c.n::HUGEINT - t.n_events)
                   * (168 * c.n::HUGEINT - t.n_events)) AS obs
        FROM cell c JOIN tot t USING (event_type) GROUP BY c.event_type
    )
    SELECT t.event_type, t.n_events, t.k AS n_cells_nonzero,
           CAST(chi.obs + (168 - t.k)
                * (t.n_events::HUGEINT * t.n_events) AS BIGINT) AS chi2_num,
           CAST(168 * t.n_events AS BIGINT) AS chi2_den
    FROM tot t JOIN chi USING (event_type) ORDER BY t.event_type
    """,
)
def events_seasonality_q(spark, sf_dir):
    """Day-of-week × hour-of-day uniformity probe per event type: the
    chi-square-vs-uniform numerator Σ_cells (168·n_c − N)² over all 168
    calendar cells (empty cells contribute N²), reported with the
    168·N denominator as exact integers — χ² itself is one double
    division away. dow/hour come from pure epoch-second arithmetic
    ((day+4) % 7 pins Thursday=epoch-0; h = (es//3600) % 24), so no
    engine calendar function is in the decision path. Shape: ONE
    corpus pass to ≤168 cells per type, then type-cardinality
    arithmetic. BIGINT-safe to ~5e8 events/type; past that the square
    moves to DECIMAL(38) like the sigma gate."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("es")
    )
    cell = ev.groupBy(
        "event_type",
        F.expr("(es div 86400 + 4) % 7").alias("dow"),
        F.expr("(es div 3600) % 24").alias("hod"),
    ).agg(F.count("*").cast("long").alias("n"))
    from .scratch import scratch_persist

    cell = scratch_persist(cell)
    tot = cell.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("k"),
    )
    chi = (
        cell.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(
                    (168 * F.col("n").cast("decimal(38,0)") - F.col("n_events"))
                    * (168 * F.col("n").cast("decimal(38,0)") - F.col("n_events"))
                )
                + F.max(
                    (168 - F.col("k"))
                    * F.col("n_events").cast("decimal(38,0)")
                    * F.col("n_events")
                )
            ).cast("long").alias("chi2_num"),
            F.max("n_events").cast("long").alias("n_events"),
            F.max("k").cast("long").alias("n_cells_nonzero"),
            (168 * F.max("n_events")).cast("long").alias("chi2_den"),
        )
    )
    return chi.select(
        "event_type", "n_events", "n_cells_nonzero", "chi2_num", "chi2_den"
    ).orderBy("event_type")


_MIX_STEPS = 3


def _mix_sql() -> str:
    parts = [
        """
    WITH e AS (
        SELECT event_type, user_id, ts, event_id FROM events
    ),
    tr AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM e
    ),
    c AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    rowsum AS (SELECT src, CAST(SUM(n) AS BIGINT) AS r FROM c GROUP BY src),
    states AS (SELECT DISTINCT src AS s FROM c),
    p0 AS (
        SELECT s, CAST(1000000 // (SELECT COUNT(*) FROM states) AS BIGINT)
               AS p
        FROM states
    )""",
    ]
    for t in range(1, _MIX_STEPS + 1):
        parts.append(f""",
    p{t} AS (
        SELECT c.dst AS s,
               CAST(SUM((p.p * c.n) // r.r) AS BIGINT) AS p
        FROM p{t-1} p
        JOIN c ON c.src = p.s
        JOIN rowsum r ON r.src = p.s
        GROUP BY c.dst
    )""")
    union = "\nUNION ALL ".join(
        f"SELECT {t} AS step, s, p FROM p{t}" for t in range(_MIX_STEPS + 1)
    )
    parts.append(f"""
    SELECT CAST(step AS BIGINT) AS step, s AS event_type,
           CAST(p AS BIGINT) AS prob_micro
    FROM ({union})
    ORDER BY step, event_type""")
    return "\n".join(parts)


@register("events_markov_mixing", _mix_sql())
def events_markov_mixing_q(spark, sf_dir):
    """Bounded mixing of the event-type Markov chain: start uniform
    (micro-units, floor-divided), apply the transition matrix 3 times
    with PER-TERM floor division p'_j = Σ_i (p_i·n_ij) // r_i — both
    engines run the identical integer recurrence, so the (tiny) mass
    lost to flooring is deterministic and the rows hash-match. The
    transition counts reuse the verified LEAD-window machinery of
    events_transition_matrix; everything after the one corpus window
    is |states|²-sized arithmetic."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = tr.groupBy("src", "dst").agg(F.count("*").cast("long").alias("n"))
    from .scratch import scratch_persist

    c = scratch_persist(c)  # feeds rowsum, the joined table, and states
    rowsum = c.groupBy("src").agg(F.sum("n").cast("long").alias("r"))
    # transition counts with their row sums attached ONCE — the loop
    # then needs a single |states|²-row join per step
    cr = scratch_persist(c.join(rowsum, "src"))
    states = c.select(F.col("src").alias("s")).distinct()
    n_states = states.count()
    p = states.select(
        "s", F.lit(1_000_000 // n_states).cast("long").alias("p")
    )
    outs = [p.select(F.lit(0).cast("long").alias("step"), "s", "p")]
    for t in range(1, _MIX_STEPS + 1):
        p = (
            p.join(cr, p["s"] == cr["src"])
            .select(
                F.col("dst").alias("s"),
                F.expr("(p * n) div r").alias("term"),
            )
            .groupBy("s")
            .agg(F.sum("term").cast("long").alias("p"))
        )
        outs.append(p.select(F.lit(t).cast("long").alias("step"), "s", "p"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "step", F.col("s").alias("event_type"),
        F.col("p").cast("long").alias("prob_micro"),
    ).orderBy("step", "event_type")
