"""Round-5l extension queries:

- graph_mst_boruvka: bounded Borůvka minimum-spanning-forest over the
  graph twin — the distributed-MST classic (per-component lightest
  outgoing edge + geometric contraction), unrolled-CTE oracle;
- events_autocorrelation: lag-1..7 autocorrelation of the daily event
  count series in EXACT integer moments — the numerator/denominator of
  Pearson r reported as raw BIGINTs (n·Σxy − Σx·Σy etc.), so nothing
  engine-dependent (no sqrt, no division) touches the output;
- corpus_simpson_diversity: per-source vocabulary concentration — the
  Simpson/Herfindahl index over token frequencies as an exact integer
  ratio pair (Σn(n−1), N(N−1)), the corpus-mix diversity probe a data
  curator reads next to the Zipf spectrum.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
output casts, deterministic final ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table


def _mst_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES
    from .operators.mst import boruvka_msf_sql

    return boruvka_msf_sql(SQL_NODES, SQL_EDGES, rounds=3, jumps=4)


@register("graph_mst_boruvka", _mst_sql())
def graph_mst_boruvka_q(spark, sf_dir):
    """3-round Borůvka MSF over the graph twin (operators/mst.py):
    deterministic integer edge weights, strict (w,u,v) total order, a
    fixed 4-doubling pointer-jump contraction per round. Per round the
    corpus-sized work is two endpoint-labeling hash joins over the edge
    list + one per-component min-agg; the pointer table is
    component-cardinality and shrinks geometrically — the textbook
    at-scale MST shape."""
    from .graph.tpch import build_graph
    from .operators.mst import boruvka_msf

    g = build_graph(spark, sf_dir)
    return boruvka_msf(spark, g.nodes, g.edges, rounds=3, jumps=4)


@register(
    "events_autocorrelation",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    lags AS (SELECT u.k FROM UNNEST(generate_series(1, 7)) u(k)),
    pairs AS (
        SELECT l.k, a.x AS x0, b.x AS x1
        FROM lags l
        CROSS JOIN daily a
        JOIN daily b ON b.d = a.d + l.k
    ),
    s AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x0 * x1) AS sxy, SUM(x0) AS sx, SUM(x1) AS sy,
               SUM(x0 * x0) AS sxx, SUM(x1 * x1) AS syy
        FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y
    FROM s ORDER BY lag
    """,
)
def events_autocorrelation_q(spark, sf_dir):
    """Lag-k (k=1..7) autocorrelation of the daily event-count series in
    exact integer moments: per lag, Pearson's numerator n·Σxy − Σx·Σy
    and the two variance terms n·Σx² − (Σx)² — no sqrt/division in the
    output, so both engines agree bit-for-bit (r itself is one double
    op away for the caller). Shape: ONE corpus pass to the day-count
    table (groupBy day), then all window arithmetic happens on the
    |days|-row dimension — broadcast-joined against its own shifted
    self per lag. BIGINT-safe to ~1e9 events/day; past that the same
    moments move to DECIMAL(38) like the sigma gate."""
    ev = read_table(spark, sf_dir, "events").select(
        F.expr("datediff(to_date(ts), to_date('2024-01-01'))").alias("d")
    )
    daily = ev.groupBy("d").agg(F.count("*").cast("long").alias("x"))
    from .scratch import scratch_persist

    daily = scratch_persist(daily)
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("x0"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("x1"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
    )
    s = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x0") * F.col("x1")).alias("sxy"),
        F.sum("x0").alias("sx"),
        F.sum("x1").alias("sy"),
        F.sum(F.col("x0") * F.col("x0")).alias("sxx"),
        F.sum(F.col("x1") * F.col("x1")).alias("syy"),
    )
    return (
        s.select(
            F.col("k").cast("long").alias("lag"),
            "n",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long").alias("num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("long").alias("den_x"),
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            .cast("long").alias("den_y"),
        )
        .orderBy("lag")
    )


@register(
    "corpus_simpson_diversity",
    """
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    tok AS (
        SELECT source, t[i] AS tok
        FROM toks, UNNEST(generate_series(1, len(t))) u(i)
    ),
    cnt AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(n * (n - 1)) AS BIGINT) AS simpson_num,
           CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS simpson_den
    FROM cnt GROUP BY source ORDER BY source
    """,
)
def corpus_simpson_diversity_q(spark, sf_dir):
    """Per-source Simpson/Herfindahl vocabulary concentration as an
    exact integer ratio: simpson_num/simpson_den = Σ n_i(n_i−1) /
    N(N−1), the probability two sampled tokens coincide — 1−λ is the
    diversity a curator reads next to vocab_zipf_spectrum. Shape: one
    explode → (source, token) hash-agg with map-side combine (the
    vocabulary-sized table), then a source-cardinality rollup — the
    same two-level agg contract as corpus_vocab_stats."""
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    N = F.sum("n")
    return (
        cnt.groupBy("source")
        .agg(
            N.cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("simpson_num"),
            (N * (N - 1)).cast("long").alias("simpson_den"),
        )
        .orderBy("source")
    )
