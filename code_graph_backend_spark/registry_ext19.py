"""Round-5m extension queries:

- graph_butterfly_count: bipartite 4-cycle (butterfly) census over the
  order–part incidence graph — the bipartite analog of triangle
  counting (Wang et al., "Vertex Priority Based Butterfly Counting for
  Large-scale Bipartite Networks", VLDB'19): wedges are generated from
  the BOUNDED-degree side, so the quadratic blow-up of hub vertices
  never materializes;
- graph_luby_mis: bounded Luby maximal independent set — the classic
  distributed symmetry-breaking primitive (operators/mis.py),
  unrolled-CTE oracle;
- shard_zonemap_prune: zone-map (min/max per shard) skipping rates for
  range predicates under two physical layouts — the measured version
  of the "does the filter reach the scan" discipline every 100 TB
  table layout decision rests on;
- events_lateness_profile: watermark-lateness histogram + would-drop
  counts per allowed-delay under a deterministic arrival permutation
  (the driver's events are exactly time-ordered, so real arrival skew
  is simulated with a fixed LCG permutation — the op grades the
  machinery: running-max window, late-event classification, watermark
  drop accounting);
- corpus_pmi_collocations: top bigram collocations ranked by PMI with
  the ranking done in EXACT integer arithmetic — PMI is monotone in
  n_ab·N/(n_a·n_b), so the rank key is the floor-divided micro-ratio
  (DECIMAL(38) / HUGEINT), never a float log.

Same discipline as every extension wave: integer decisions, a DuckDB
oracle per entry, BIGINT output casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table


# ---------------------------------------------------------------- butterflies


@register(
    "graph_butterfly_count",
    """
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    w AS (
        SELECT a.p AS p1, b.p AS p2
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ),
    g AS (
        SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM w GROUP BY 1, 2
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2, n_orders,
           CAST(n_orders * (n_orders - 1) / 2 AS BIGINT) AS butterflies
    FROM g WHERE n_orders >= 2
    ORDER BY butterflies DESC, p1, p2
    """,
)
def graph_butterfly_count_q(spark, sf_dir):
    """Butterfly (bipartite 4-cycle) census over order–part incidence:
    a butterfly is two orders sharing two parts — THE cohesion motif of
    bipartite graphs, the analog of the triangle. Exact count per
    co-occurring part pair: m orders share the pair => C(m,2)
    butterflies. Shape: wedges are generated from the ORDER side
    because its degree is bounded (baskets are small) while parts are
    the potential hubs — the Wang et al. VLDB'19 vertex-priority rule
    instantiated at the side level; per-order pair generation is
    C(basket,2), then ONE hash-agg on (p1,p2). No all-pairs stage
    anywhere; at 100 TB a pathological mega-basket would be split by
    the same (degree,id) orientation used in triangle_count."""
    li = read_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("p1"))
    b = op.select("o", F.col("p").alias("p2"))
    g = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    return g.select(
        F.col("p1").cast("long").alias("p1"),
        F.col("p2").cast("long").alias("p2"),
        "n_orders",
        (F.col("n_orders") * (F.col("n_orders") - 1) / 2)
        .cast("long")
        .alias("butterflies"),
    ).orderBy(F.desc("butterflies"), "p1", "p2")


# ------------------------------------------------------------------ luby MIS


def _mis_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES
    from .operators.mis import luby_mis_sql

    return luby_mis_sql(SQL_NODES, SQL_EDGES, rounds=3)


@register("graph_luby_mis", _mis_sql())
def graph_luby_mis_q(spark, sf_dir):
    """3-round Luby maximal independent set over the graph twin
    (operators/mis.py): deterministic LCG priorities widened by node id
    (strict total order, no tie channel), winners beat every live
    neighbor's key, winners+neighborhoods contract out. Per round the
    only edge-sized stage is one symmetrize + hash-agg min; the live
    graph shrinks geometrically — the textbook distributed
    symmetry-breaking shape."""
    from .graph.tpch import build_graph
    from .operators.mis import luby_mis

    g = build_graph(spark, sf_dir)
    return luby_mis(spark, g.nodes, g.edges, rounds=3)


# ------------------------------------------------------------ zone-map prune

_ZM_THRESHOLDS = (100, 200, 300, 400, 500)
_ZM_SHARDS = 64


@register(
    "shard_zonemap_prune",
    f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    d AS (
        SELECT n_chars,
               CAST((doc_id * {_ZM_SHARDS}) // (m + 1) AS BIGINT) AS sh_ingest,
               CAST(NTILE({_ZM_SHARDS}) OVER (ORDER BY n_chars, doc_id) - 1
                    AS BIGINT) AS sh_len
        FROM documents, mx
    ),
    longf AS (
        SELECT 'ingest' AS layout, sh_ingest AS shard, n_chars FROM d
        UNION ALL
        SELECT 'by_length' AS layout, sh_len AS shard, n_chars FROM d
    ),
    zm AS (
        SELECT layout, shard, CAST(COUNT(*) AS BIGINT) AS rows_,
               MAX(n_chars) AS zmax
        FROM longf GROUP BY 1, 2
    ),
    thr AS (SELECT UNNEST(ARRAY{list(_ZM_THRESHOLDS)}) AS c),
    pruned AS (
        SELECT t.c, z.layout,
               CAST(COUNT(*) AS BIGINT) AS n_shards,
               CAST(SUM(CASE WHEN z.zmax < t.c THEN 1 ELSE 0 END) AS BIGINT)
                   AS shards_pruned,
               CAST(SUM(CASE WHEN z.zmax < t.c THEN z.rows_ ELSE 0 END)
                   AS BIGINT) AS rows_avoided
        FROM zm z CROSS JOIN thr t GROUP BY 1, 2
    ),
    matched AS (
        SELECT t.c,
               CAST(SUM(CASE WHEN d.n_chars >= t.c THEN 1 ELSE 0 END)
                   AS BIGINT) AS rows_matched
        FROM d CROSS JOIN thr t GROUP BY 1
    )
    SELECT p.layout, CAST(p.c AS BIGINT) AS threshold, p.n_shards,
           p.shards_pruned, p.rows_avoided, m.rows_matched
    FROM pruned p JOIN matched m ON m.c = p.c
    ORDER BY layout, threshold
    """,
)
def shard_zonemap_prune_q(spark, sf_dir):
    """Zone-map skipping rates under two physical layouts: `ingest`
    (shards = contiguous doc_id ranges — the arrival order) vs
    `by_length` (shards = NTILE over the filter column). For the
    predicate n_chars >= c a shard is skippable iff its zone-map max is
    below c; the query reports shards pruned and rows avoided per
    layout — the measured argument for re-clustering a 100 TB table on
    its hot filter column (ingest order prunes ~nothing, the clustered
    layout prunes almost everything below the selectivity knee).
    Shape: ONE corpus pass to 64-row zone maps per layout, then all
    decisions on the 128-row dimension against a broadcast threshold
    list; rows_matched is a conditional one-pass agg (no corpus
    replication). The by_length layout is cut with exact_ntile
    (functions/packing.py: two-level prefix rank, no single-partition
    sort — the r10 recursive window tripwire flagged the previous
    global NTILE, whose broadcast-side max() Aggregate had masked it
    from the flat subtree scan); the oracle keeps the flat NTILE, so
    equality is the decomposition proof, and the shard cut is exactly
    the repartitionByRange-at-write that produces the clustered layout
    at scale."""
    from .functions.packing import exact_ntile

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mx = docs.agg(
        F.max("doc_id").alias("m"), F.count("*").cast("long").alias("_n")
    )
    d = exact_ntile(
        docs.crossJoin(F.broadcast(mx)), "n_chars", "_n", "doc_id",
        "_lt", n_tiles=_ZM_SHARDS, width=64,
    )
    d = d.withColumn(
        "sh_ingest", F.expr(f"(doc_id * {_ZM_SHARDS}) div (m + 1)").cast("long")
    ).withColumn("sh_len", (F.col("_lt") - 1).cast("long"))
    longf = d.select(
        F.expr(
            "stack(2, 'ingest', sh_ingest, 'by_length', sh_len)"
        ).alias("layout", "shard"),
        "n_chars",
    )
    zm = longf.groupBy("layout", "shard").agg(
        F.count("*").cast("long").alias("rows_"),
        F.max("n_chars").alias("zmax"),
    )
    thr = spark.createDataFrame([(c,) for c in _ZM_THRESHOLDS], "c long")
    pruned = (
        zm.crossJoin(F.broadcast(thr))
        .groupBy("c", "layout")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum(F.when(F.col("zmax") < F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("shards_pruned"),
            F.sum(F.when(F.col("zmax") < F.col("c"), F.col("rows_")).otherwise(0))
            .cast("long")
            .alias("rows_avoided"),
        )
    )
    matched = (
        docs.crossJoin(F.broadcast(thr))
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("n_chars") >= F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("rows_matched")
        )
    )
    return (
        pruned.join(matched, "c")
        .select(
            "layout",
            F.col("c").cast("long").alias("threshold"),
            "n_shards",
            "shards_pruned",
            "rows_avoided",
            "rows_matched",
        )
        .orderBy("layout", "threshold")
    )


# ------------------------------------------------------- lateness profile

_ARR_A, _ARR_M = 48271, 2147483647  # MINSTD permutation for arrival order


@register(
    "events_lateness_profile",
    f"""
    WITH e AS (
        SELECT event_type,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es,
               (event_id * {_ARR_A}) % {_ARR_M} AS arr
        FROM events
    ),
    r AS (
        SELECT event_type, es,
               MAX(es) OVER (ORDER BY arr, es ROWS UNBOUNDED PRECEDING) - es
                   AS late
        FROM e
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(MAX(late) AS BIGINT) AS max_lateness_sec,
           CAST(SUM(CASE WHEN late > 60 THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_1m,
           CAST(SUM(CASE WHEN late > 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_5m,
           CAST(SUM(CASE WHEN late > 3600 THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_1h
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def events_lateness_profile_q(spark, sf_dir):
    """Watermark-lateness profile: per event type, how many events
    arrive after a later-timestamped event has already been seen, the
    worst lateness, and how many a watermark of 1m/5m/1h allowed delay
    would DROP — the sizing study run before picking
    `withWatermark(delay)` on a production stream. Arrival order is a
    deterministic MINSTD permutation of event_id (the driver's events
    are exactly time-ordered — corr(event_id, ts) ≈ 1 — so real
    arrival skew must be simulated; the permutation is pinned so both
    engines see the identical arrival sequence). lateness(e) =
    running-max(event_time over arrival order) − event_time, computed
    on floor-second integers end-to-end. Shape: the running max is the
    two-level prefix-MAX (functions/packing.py:two_level_prefix_max —
    64 arrival-range buckets, shard-local running max + prefix-max of
    bucket boundary maxima broadcast back; no global sort, the plan
    tripwire in test_plans.py enforces it) then one per-type hash-agg;
    the oracle replays one flat running-max window — equality is the
    decomposition proof."""
    from .functions.packing import two_level_prefix_max

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        ((F.col("event_id") * _ARR_A) % _ARR_M).alias("arr"),
    )
    r = two_level_prefix_max(
        ev.withColumn("_bkt", F.expr(f"arr DIV {_ARR_M // 64 + 1}")),
        "es",
        "_bkt",
        [F.col("arr").asc(), F.col("es").asc()],
        out_col="_rmax",
    ).withColumn("late", F.col("_rmax") - F.col("es"))
    return (
        r.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("late") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.max("late").cast("long").alias("max_lateness_sec"),
            F.sum(F.when(F.col("late") > 60, 1).otherwise(0))
            .cast("long")
            .alias("dropped_1m"),
            F.sum(F.when(F.col("late") > 300, 1).otherwise(0))
            .cast("long")
            .alias("dropped_5m"),
            F.sum(F.when(F.col("late") > 3600, 1).otherwise(0))
            .cast("long")
            .alias("dropped_1h"),
        )
        .orderBy("event_type")
    )


# -------------------------------------------------------- PMI collocations

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "corpus_pmi_collocations",
    f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT t[i] AS a, t[i + 1] AS b
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) u(i)
    ),
    uni AS (
        SELECT t[i] AS tok FROM toks, UNNEST(generate_series(1, len(t))) u(i)
    ),
    nu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY tok),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM uni),
    nb AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM bg GROUP BY a, b HAVING COUNT(*) >= {_PMI_MIN_COUNT}
    )
    SELECT a, b, n_ab, na.n AS n_a, nbu.n AS n_b,
           CAST((n_ab::HUGEINT * total * 1000000)
                // (na.n::HUGEINT * nbu.n) AS BIGINT) AS ratio_micro
    FROM nb JOIN nu na ON na.tok = nb.a JOIN nu nbu ON nbu.tok = nb.b
    CROSS JOIN nn
    ORDER BY ratio_micro DESC, a, b
    LIMIT {_PMI_TOPK}
    """,
)
def corpus_pmi_collocations_q(spark, sf_dir):
    """Top bigram collocations by PMI — the classic collocation-mining
    statistic (Church & Hanks 1990), the curator's probe for boilerplate
    phrases and multi-word entities. PMI = log(n_ab·N / (n_a·n_b)) is
    MONOTONE in the rational n_ab·N/(n_a·n_b), so the rank key is that
    ratio floor-divided to micro-units in exact integer arithmetic
    (DECIMAL(38) on Spark, HUGEINT in DuckDB) — no float log anywhere
    near a decision. Shape: one explode to bigram counts (hash-agg with
    map-side combine, min-count gate n_ab >= {_PMI_MIN_COUNT} prunes
    the tail BEFORE the joins), two vocabulary-sized equi-joins for the
    unigram marginals, a 1-row scalar cross join for N, and a top-k
    under a total order."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    from .scratch import scratch_persist

    toks = scratch_persist(docs)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS a, t[i + 1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    uni = toks.select(F.explode("t").alias("tok"))
    nu = uni.groupBy("tok").agg(F.count("*").cast("long").alias("n"))
    nn = uni.agg(F.count("*").cast("long").alias("total"))
    nb = (
        bg.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_COUNT)
    )
    joined = (
        nb.join(nu.select(F.col("tok").alias("a"), F.col("n").alias("n_a")), "a")
        .join(nu.select(F.col("tok").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(F.broadcast(nn))
    )
    return (
        joined.select(
            "a", "b", "n_ab", "n_a", "n_b",
            F.expr(
                "(CAST(n_ab AS DECIMAL(38,0)) * total * 1000000)"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            ).cast("long").alias("ratio_micro"),
        )
        .orderBy(F.desc("ratio_micro"), "a", "b")
        .limit(_PMI_TOPK)
    )
