"""Round-5h/5i extension queries:

- events_outliers_mad: robust median/MAD outlier gate — the
  breakdown-resistant twin of events_outliers' mean/sigma gate (one
  extreme value drags μ and σ; it cannot drag a median), with the
  decision boundary still pure BIGINT arithmetic
  (streaming/gates.event_mad_stats + mad_outlier_gate);
- quality_calibration_bins: classifier-calibration audit — the
  fastText-shape linear scorer (quality_linear_score) binned into
  score deciles against the rule-based Gopher gates as reference
  labels, the reliability-table every learned quality filter gets
  checked with before it gates a corpus. Composes two already-verified
  operators; the oracle nests both their CTE chains verbatim.

Same discipline as every prior wave: integer decisions (half-integer
medians doubled back into BIGINT, NTILE over a total order), a DuckDB
oracle per entry, BIGINT output casts, deterministic final ordering."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import ORACLE, register
from .session import read_table

# the calibration oracle embeds these entries' oracle SQL verbatim, so
# make sure they are registered even under a direct module import
from . import registry_ext9  # noqa: F401
from . import registry_ext10  # noqa: F401


@register(
    "events_outliers_mad",
    """
    WITH q AS (
        SELECT event_id, event_type,
               CAST(round(value * 1000) AS BIGINT) AS x
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(quantile_cont(x, 0.5) * 2 AS BIGINT) AS med2
        FROM q GROUP BY 1
    ),
    d AS (
        SELECT q.event_id, q.event_type, q.x,
               abs(2 * q.x - m.med2) AS dev2, m.med2
        FROM q JOIN m USING (event_type)
    ),
    s AS (
        SELECT event_type, med2,
               CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        FROM d GROUP BY 1, 2
    )
    SELECT d.event_id, d.event_type, ROUND(d.x / 1000.0, 3) AS value,
           d.dev2
    FROM d JOIN s USING (event_type)
    WHERE 20000 * d.dev2 > 3 * 14826 * s.mad4
    ORDER BY event_id
    """,
)
def events_outliers_mad_q(spark, sf_dir):
    """Per-type robust outliers: |x − median| > 3·1.4826·MAD with the
    boundary evaluated as 20000·dev2 > 44478·mad4 (dev2 = 2|x−med|,
    mad4 = 4·MAD, so 2·dev2 > 3·1.4826·mad4) — half-integer medians
    doubled into BIGINT so the comparison is exact in both engines
    (streaming/gates.py event_mad_stats / mad_outlier_gate). Shape: two
    per-type hash-aggs (median, then MAD of the deviations — inherently
    two passes), then the gate itself is a stateless broadcast join +
    filter that composes onto a stream exactly like the sigma gate."""
    from .streaming.gates import (
        event_mad_stats, mad_outlier_gate, quantize_events,
    )

    ev = quantize_events(read_table(spark, sf_dir, "events"))
    return mad_outlier_gate(ev, event_mad_stats(ev), k=3).orderBy("event_id")


def _calibration_sql() -> str:
    q = ORACLE["quality_linear_score"]
    g = ORACLE["gopher_quality_gates"]
    return f"""
    WITH j AS (
        SELECT q.doc_id, q.logit_milli,
               CASE WHEN g.passes THEN 1 ELSE 0 END AS pass
        FROM ({q}) q JOIN ({g}) g USING (doc_id)
    ),
    b AS (
        SELECT doc_id, logit_milli, pass,
               NTILE(10) OVER (ORDER BY logit_milli, doc_id) AS bin
        FROM j
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pass) AS BIGINT) AS n_pass,
           CAST(MIN(logit_milli) AS BIGINT) AS min_logit,
           CAST(MAX(logit_milli) AS BIGINT) AS max_logit
    FROM b GROUP BY bin
    ORDER BY bin"""


@register("quality_calibration_bins", _calibration_sql())
def quality_calibration_bins_q(spark, sf_dir):
    """Reliability table for the learned quality scorer: documents
    NTILE(10)-binned by (logit_milli, doc_id) — a deterministic total
    order, so both engines cut identical deciles — with the Gopher
    rule gates as the reference label per bin. A calibrated scorer
    shows n_pass/n rising monotonically with the bin. Scale shape: the
    two component plans are one corpus pass each (verified separately
    as quality_linear_score / gopher_quality_gates); the calibration
    itself is a doc-id equi-join + exact_ntile deciles (functions/
    packing.py: two-level prefix rank over score-range buckets + the
    closed-form NTILE law — hash-exact vs the oracle's flat NTILE, no
    single-partition sort; the r10 window tripwire's recursive
    boundedness rule flagged the previous global NTILE here) + a
    10-row agg."""
    from .functions.packing import exact_ntile
    from .functions.text import gopher_quality_gates, linear_quality_score

    docs = read_table(spark, sf_dir, "documents")
    q = linear_quality_score(docs).select("doc_id", "logit_milli")
    g = gopher_quality_gates(docs).select(
        "doc_id", F.when(F.col("passes"), 1).otherwise(0).alias("pass")
    )
    j = q.join(g, "doc_id")
    nrow = j.agg(F.count("*").cast("long").alias("_n"))
    b = exact_ntile(
        j.crossJoin(F.broadcast(nrow)), "logit_milli", "_n", "doc_id",
        "bin", n_tiles=10, width=2048,
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pass").cast("long").alias("n_pass"),
            F.min("logit_milli").cast("long").alias("min_logit"),
            F.max("logit_milli").cast("long").alias("max_logit"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n", "n_pass",
                "min_logit", "max_logit")
        .orderBy("bin")
    )


@register(
    "events_changepoint",
    """
    WITH q AS (
        SELECT event_id, ts, event_type,
               CAST(round(value * 1000) AS BIGINT) AS x
        FROM events
    ),
    c AS (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER w AS k,
               SUM(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS s
        FROM q
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    t AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS tot
        FROM q GROUP BY 1
    ),
    cu AS (
        SELECT c.event_type, c.k,
               CAST(t.n AS HUGEINT) * c.s - CAST(c.k AS HUGEINT) * t.tot
                   AS cval,
               t.n
        FROM c JOIN t USING (event_type)
    ),
    mx AS (
        SELECT event_type, MAX(abs(cval)) AS m FROM cu GROUP BY 1
    ),
    flt AS (
        SELECT cu.* FROM cu JOIN mx USING (event_type)
        WHERE abs(cu.cval) = mx.m
    ),
    pick AS (SELECT event_type, MIN(k) AS k FROM flt GROUP BY 1)
    SELECT f.event_type, CAST(f.k AS BIGINT) AS k_at_max,
           CAST(f.cval AS BIGINT) AS cusum_at_max, f.n
    FROM flt f JOIN pick p ON p.event_type = f.event_type AND p.k = f.k
    ORDER BY f.event_type
    """,
)
def events_changepoint_q(spark, sf_dir):
    """Single-changepoint location per event type by exact integer
    CUSUM: the classic mean-shift statistic C_k = Σ_{i≤k}x_i − k·μ,
    scaled by n to stay rational-free — C'_k = n·S_k − k·T (S_k the
    ordered prefix sum, T the type total) — and the reported point is
    argmax |C'_k| with smallest-k ties. Every value is integer; the
    accumulator runs in DECIMAL(38)/HUGEINT (n·S_k crosses int64 around
    10⁶ events of |value|≈10³ — the sigma-gate overflow lesson applied
    up front) with the argmax location and the statistic cast back to
    BIGINT for output. Shape: one per-type ordered window (the only
    corpus-sized shuffle), a type-cardinality stats agg broadcast back,
    then max/min-k reductions — the two-stage portable argmax (packed
    composite arg_max keys are not cross-engine, labelprop.py
    rationale)."""
    from pyspark.sql import Window as W

    from .streaming.gates import quantize_events

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type",
        F.round(F.col("value") * 1000).cast("long").alias("x"),
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    c = ev.select(
        "event_type",
        F.row_number().over(w).alias("k"),
        F.sum("x").over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ).alias("s"),
    )
    t = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    d38 = "decimal(38,0)"
    cu = c.join(F.broadcast(t), "event_type").select(
        "event_type", "k", "n",
        (
            F.col("n").cast(d38) * F.col("s").cast(d38)
            - F.col("k").cast(d38) * F.col("tot").cast(d38)
        ).alias("cval"),
    )
    from .scratch import scratch_persist

    cu = scratch_persist(cu)
    mx = cu.groupBy("event_type").agg(F.max(F.abs(F.col("cval"))).alias("m"))
    flt = cu.join(F.broadcast(mx), "event_type").filter(
        F.abs(F.col("cval")) == F.col("m")
    )
    flt = scratch_persist(flt)
    pick = flt.groupBy("event_type").agg(F.min("k").alias("k"))
    return (
        flt.join(F.broadcast(pick), ["event_type", "k"])
        .select(
            "event_type",
            F.col("k").cast("long").alias("k_at_max"),
            F.col("cval").cast("long").alias("cusum_at_max"),
            F.col("n"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_edge_embeddedness",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    und AS (
        SELECT a.pk AS a, b.pk AS b
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    com AS (
        SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM und e
        JOIN sym s1 ON s1.a = e.a
        JOIN sym s2 ON s2.a = e.b AND s2.b = s1.b
        GROUP BY 1, 2
    )
    SELECT e.a, e.b, CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           da.d AS deg_a, db.d AS deg_b
    FROM und e
    LEFT JOIN com c ON c.a = e.a AND c.b = e.b
    JOIN deg da ON da.v = e.a
    JOIN deg db ON db.v = e.b
    ORDER BY e.a, e.b
    """,
)
def graph_edge_embeddedness_q(spark, sf_dir):
    """Edge embeddedness (common-neighbor count per edge) over the
    support-pruned co-occurrence graph — the Easley–Kleinberg tie-
    strength profile whose zero rows are exactly Granovetter's LOCAL
    BRIDGES (edges whose endpoints share no neighbor, i.e. span > 2):
    the links that connect otherwise-separate co-purchase communities.
    Shape: one wedge equi-join per edge side (the triangle kernel's
    join pattern, skew-bounded by the support prune), a degree hash-agg
    broadcast back, no cartesian anywhere. Integer counts only."""
    from .operators.undirected import und_ab
    from .registry_ext5 import _cooc_edges
    from .scratch import scratch_persist

    # session-memoized und-of-cooc (VERDICT r8 item 3): shared with the
    # triangle/jaccard/ktruss family, so this query's cost no longer
    # depends on where the rotation placed it relative to them
    und = und_ab(spark, _cooc_edges(spark, sf_dir))
    sym = scratch_persist(
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count("*").cast("long").alias("d")
    )
    s1 = sym.select(F.col("a"), F.col("b").alias("w"))
    s2 = sym.select(F.col("a").alias("b"), F.col("b").alias("w"))
    com = (
        und.join(s1, "a")
        .join(s2, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("deg_b"))
    return (
        und.join(com, ["a", "b"], "left")
        .select(
            "a", "b",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        )
        .join(da, "a")
        .join(db, "b")
        .select("a", "b", "n_common", "deg_a", "deg_b")
        .orderBy("a", "b")
    )
