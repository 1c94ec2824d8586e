"""Round-5j extension queries:

- corpus_cross_entropy_shift: per-source unigram cross-entropy against
  the corpus-wide distribution — the domain-shift audit behind mixture
  rebalancing (a source whose H(P_s, P) runs hot is lexically far from
  the blend it is diluted into). Per-term logs are quantized to integer
  micro-bits BEFORE the sum, so the per-source totals are exact integer
  arithmetic — no float summation-order channel (the ADVICE r4 lesson);
- emb_norm_outliers: corrupt-embedding detection — per-label median/MAD
  gate (the events_outliers_mad machinery) over exact integer squared
  norms of the quantized vectors: truncated, zeroed, or unnormalized
  vectors are norm outliers long before any ANN query notices them;
- source_template_overlap: cross-source template matrix — md5 of each
  document's opening 8-token fingerprint shared between source pairs,
  the exact-tier complement of corpus_source_overlap's 5-gram matrix
  (mirror-feed / shared-boilerplate detection).

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
output casts, deterministic final ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table


@register(
    "corpus_cross_entropy_shift",
    """
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cw),
    lq AS (
        SELECT cw.w,
               CAST(round(log2(CAST(nn.n AS DOUBLE) / cw.c) * 1000000)
                    AS BIGINT) AS lq
        FROM cw CROSS JOIN nn
    ),
    sw AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY 1, 2
    )
    SELECT sw.source, CAST(SUM(sw.f) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(sw.f AS HUGEINT) * lq.lq) // SUM(sw.f) AS BIGINT)
               AS cross_entropy_micro
    FROM sw JOIN lq USING (w)
    GROUP BY sw.source
    ORDER BY sw.source
    """,
)
def corpus_cross_entropy_shift_q(spark, sf_dir):
    """Per-source cross-entropy vs the corpus unigram model:
    H(P_s, P) = Σ_w f_sw/n_s · log2(N/c_w), with each per-term log
    quantized to integer MICRO-BITS before summation — the sum is then
    pure integer (DECIMAL(38)/HUGEINT accumulator; f·lq crosses int64
    near 10¹² tokens) and one floor-divide yields the per-source mean.
    Quantize-then-sum is the discipline that keeps float summation
    order out of the decision path entirely (same reason the cosine
    families gate on quantized dots). Shape: one corpus token pass
    feeds both the vocab counts and the per-(source, word) counts; the
    log table is vocabulary-sized and broadcast."""
    from .scratch import scratch_persist
    from .session import fan_out

    docs = read_table(spark, sf_dir, "documents")
    tok = fan_out(docs).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    tok = scratch_persist(tok)
    cw = tok.groupBy("w").agg(F.count("*").alias("c"))
    nn = cw.agg(F.sum("c").alias("n"))
    lq = cw.crossJoin(F.broadcast(nn)).select(
        "w",
        F.round(
            F.log2(F.col("n").cast("double") / F.col("c")) * 1000000
        ).cast("long").alias("lq"),
    )
    sw = tok.groupBy("source", "w").agg(F.count("*").alias("f"))
    d38 = "decimal(38,0)"
    return (
        sw.join(F.broadcast(lq), "w")
        .groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.floor(
                F.sum(F.col("f").cast(d38) * F.col("lq").cast(d38))
                / F.sum("f").cast(d38)
            ).cast("long").alias("cross_entropy_micro"),
        )
        .orderBy("source")
    )


@register(
    "emb_norm_outliers",
    """
    WITH q AS (
        SELECT vec_id, label,
               (SELECT CAST(SUM(
                    CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                AS BIGINT)
                FROM UNNEST(embedding) AS u(x)) AS nq
        FROM embeddings
    ),
    m AS (
        SELECT label, CAST(quantile_cont(nq, 0.5) * 2 AS BIGINT) AS med2
        FROM q GROUP BY 1
    ),
    d AS (
        SELECT q.vec_id, q.label, q.nq,
               abs(2 * q.nq - m.med2) AS dev2, m.med2
        FROM q JOIN m USING (label)
    ),
    s AS (
        SELECT label, med2,
               CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        FROM d GROUP BY 1, 2
    )
    SELECT d.vec_id, d.label, d.nq AS norm2_q, d.dev2
    FROM d JOIN s USING (label)
    WHERE 20000 * d.dev2 > 3 * 14826 * s.mad4
    ORDER BY d.vec_id
    """,
)
def emb_norm_outliers_q(spark, sf_dir):
    """Corrupt-embedding detection: per-label robust outliers on EXACT
    integer squared norms (Σ round(x·1000)² — the kmeans quantization
    domain), gated by the same 20000·dev2 > 44478·mad4 MAD boundary as
    events_outliers_mad. A truncated, zeroed, or double-scaled vector
    shifts its norm far outside its label's MAD band while means/sigmas
    would be dragged by the very rows being hunted. Shape: one JVM-side
    aggregate per row (no UDF, no shuffle), two label-cardinality
    hash-aggs, broadcast gate."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        ).alias("nq"),
    )
    from .scratch import scratch_persist

    q = scratch_persist(q)
    m = q.groupBy("label").agg(
        (F.percentile(F.col("nq"), F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    d = q.join(F.broadcast(m), "label").select(
        "vec_id", "label", "nq",
        F.abs(F.lit(2) * F.col("nq") - F.col("med2")).alias("dev2"),
        "med2",
    )
    d = scratch_persist(d)
    s = d.groupBy("label", "med2").agg(
        (F.percentile(F.col("dev2"), F.lit(0.5)) * 2).cast("long").alias("mad4")
    )
    return (
        d.join(F.broadcast(s.select("label", "mad4")), "label")
        .filter(F.lit(20000) * F.col("dev2") > F.lit(3 * 14826) * F.col("mad4"))
        .select("vec_id", "label", F.col("nq").alias("norm2_q"), "dev2")
        .orderBy("vec_id")
    )


@register(
    "source_template_overlap",
    """
    WITH h AS (
        SELECT source,
               md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_prefixes,
           CAST(SUM(a.n) AS BIGINT) AS rows_a,
           CAST(SUM(b.n) AS BIGINT) AS rows_b
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
)
def source_template_overlap_q(spark, sf_dir):
    """Cross-source TEMPLATE matrix: md5 of each document's opening
    8-token fingerprint, shared between source pairs — the mirror-feed
    and shared-boilerplate detector (two feeds that syndicate the same
    wire copy or stamp the same header collide on opening prefixes long
    before whole-document md5 would, which on this corpus is empty
    below sf0.1). Exact-tier complement of corpus_source_overlap's
    5-gram matrix. Shape: one (source, prefix-hash) hash-agg — the
    dictionary the join runs on — then a self-equi-join on the hash
    key; never touches the full text payload twice. Output is
    |sources|² bounded."""
    docs = read_table(spark, sf_dir, "documents")
    h = docs.groupBy(
        "source",
        F.md5(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
        ).alias("h"),
    ).agg(F.count("*").alias("n"))
    from .scratch import scratch_persist

    h = scratch_persist(h)
    a = h.select(
        F.col("source").alias("source_a"), "h", F.col("n").alias("na")
    )
    b = h.select(
        F.col("source").alias("source_b"), "h", F.col("n").alias("nb")
    )
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_prefixes"),
            F.sum("na").cast("long").alias("rows_a"),
            F.sum("nb").cast("long").alias("rows_b"),
        )
        .orderBy("source_a", "source_b")
    )
