"""Round-5z extension queries:

- events_latency_percentiles: exact p50/p90/p99 order statistics of
  the event value per type (micro-quantized) — the observability
  dashboard's headline row, computed as rank gates over one per-type
  sort (rk·100 ≥ n·q, all integer);
- emb_silhouette_proxy: per-label cluster-quality table — summed
  squared distance of members to their OWN centroid vs the minimum
  squared distance to any OTHER centroid, everything on the
  established round(x·1e6) integer quantization with floor-div
  centroids, so the silhouette-style ratio is exact integer pairs.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table


@register(
    "events_latency_percentiles",
    """
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        FROM events
    ),
    r AS (
        SELECT event_type, vm,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vm) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN rk * 100 >= n * 50 THEN vm END) AS BIGINT)
               AS p50_micro,
           CAST(MIN(CASE WHEN rk * 100 >= n * 90 THEN vm END) AS BIGINT)
               AS p90_micro,
           CAST(MIN(CASE WHEN rk * 100 >= n * 99 THEN vm END) AS BIGINT)
               AS p99_micro
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def events_latency_percentiles_q(spark, sf_dir):
    """Exact type-1 order statistics (smallest value whose rank covers
    the quantile: rk·100 ≥ n·q, pure integers) of the micro-quantized
    event value, per type — p50/p90/p99 as one per-type sort window +
    one agg. At open-web scale the per-type sort becomes the two-level
    count/offset percentile (corpus_length_deciles' documented swap);
    the rank-gate arithmetic is unchanged."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy("vm")
    r = ev.select(
        "event_type", "vm",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    def pick(q):
        return F.min(
            F.when(F.col("rk") * 100 >= F.col("n") * q, F.col("vm"))
        ).cast("long").alias(f"p{q}_micro")

    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            pick(50), pick(90), pick(99),
        )
        .orderBy("event_type")
    )


@register(
    "emb_silhouette_proxy",
    """
    WITH q AS (
        SELECT vec_id, label, u.i - 1 AS dim,
               CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) u(i)
    ),
    cent AS (
        -- truncate toward ZERO like Spark's `div` (DuckDB's // floors,
        -- which differs on the negative sums embeddings produce)
        SELECT label, dim,
               CAST(CASE WHEN SUM(qv) >= 0 THEN SUM(qv) // COUNT(*)
                    ELSE -((-SUM(qv)) // COUNT(*)) END AS BIGINT) AS cq
        FROM q GROUP BY 1, 2
    ),
    intra AS (
        SELECT q.vec_id, q.label,
               SUM((q.qv - c.cq)::HUGEINT * (q.qv - c.cq)) AS d2
        FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
        GROUP BY 1, 2
    ),
    per_label AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(d2) AS BIGINT) AS sum_intra_sq
        FROM intra GROUP BY label
    ),
    cpair AS (
        SELECT a.label AS la, b.label AS lb,
               SUM((a.cq - b.cq)::HUGEINT * (a.cq - b.cq)) AS d2
        FROM cent a JOIN cent b ON b.dim = a.dim AND b.label <> a.label
        GROUP BY 1, 2
    ),
    nearest AS (
        SELECT la AS label, CAST(MIN(d2) AS BIGINT) AS min_inter_sq
        FROM cpair GROUP BY la
    )
    SELECT p.label, p.n_members, p.sum_intra_sq,
           CAST(p.sum_intra_sq // p.n_members AS BIGINT) AS avg_intra_sq,
           n.min_inter_sq
    FROM per_label p JOIN nearest n USING (label)
    ORDER BY p.label
    """,
)
def emb_silhouette_proxy_q(spark, sf_dir):
    """Cluster-quality table per label: average squared distance of
    members to their OWN centroid vs the squared distance to the
    NEAREST other centroid — the silhouette question as exact integer
    pairs (tight clusters: avg_intra_sq ≪ min_inter_sq). Components
    quantize to round(x·1e6) BEFORE any arithmetic (the
    label_centroids discipline) and centroids are floor-div means, so
    both engines agree bit-for-bit. One posexplode hash-agg for
    centroids, one member join on (label, dim), one label-pair join on
    the tiny centroid table."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id", "label", "dim",
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("qv"),
    )
    from .scratch import scratch_persist

    q = scratch_persist(q)
    cent = q.groupBy("label", "dim").agg(
        F.expr("SUM(qv) div COUNT(*)").cast("long").alias("cq")
    )
    cent = scratch_persist(cent)
    intra = (
        q.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("qv") - F.col("cq")).cast("decimal(38,0)")
                * (F.col("qv") - F.col("cq"))
            ).alias("d2")
        )
    )
    per_label = intra.groupBy("label").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("d2").cast("long").alias("sum_intra_sq"),
    )
    a = cent.select(F.col("label").alias("la"), "dim", F.col("cq").alias("ca"))
    b = cent.select(F.col("label").alias("lb"), "dim", F.col("cq").alias("cb"))
    cpair = (
        a.join(b, "dim")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(
                (F.col("ca") - F.col("cb")).cast("decimal(38,0)")
                * (F.col("ca") - F.col("cb"))
            ).alias("d2")
        )
    )
    nearest = cpair.groupBy(F.col("la").alias("label")).agg(
        F.min("d2").cast("long").alias("min_inter_sq")
    )
    return (
        per_label.join(nearest, "label")
        .select(
            "label", "n_members", "sum_intra_sq",
            F.expr("sum_intra_sq div n_members").cast("long")
            .alias("avg_intra_sq"),
            "min_inter_sq",
        )
        .orderBy("label")
    )
