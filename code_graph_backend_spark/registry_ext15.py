"""Round-5h extension queries:

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
    WHERE 40000 * d.dev2 > 3 * 14826 * s.mad4
    ORDER BY event_id
    """,
)
def events_outliers_mad_q(spark, sf_dir):
    """Per-type robust outliers: |x − median| > 3·1.4826·MAD with the
    boundary evaluated as 40000·dev2 > 44478·mad4 — half-integer medians
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
    itself is a doc-id equi-join + one global 10-bucket window over the
    per-doc score table + a 10-row agg. The global NTILE is a single
    ordered pass over DOC-sized rows — at open-web scale you swap it
    for percentile-derived bin boundaries (one hash-agg, the
    corpus_length_deciles machinery) and a broadcast range join; the
    10-row output is identical whenever scores are distinct at the
    cuts."""
    from .functions.text import gopher_quality_gates, linear_quality_score

    docs = read_table(spark, sf_dir, "documents")
    q = linear_quality_score(docs).select("doc_id", "logit_milli")
    g = gopher_quality_gates(docs).select(
        "doc_id", F.when(F.col("passes"), 1).otherwise(0).alias("pass")
    )
    j = q.join(g, "doc_id")
    b = j.withColumn(
        "bin", F.ntile(10).over(Window.orderBy("logit_milli", "doc_id"))
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
