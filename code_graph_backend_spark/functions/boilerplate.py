"""Cross-document repetition analysis — the two curation passes that sit
between exact dedup and near-dup dedup in a production pretraining
pipeline:

- boilerplate detection (CCNet / RefinedWeb style): content that repeats
  across MANY documents of the same source (headers, footers, nav chrome,
  license blurbs) is boilerplate even when the documents are not
  near-duplicates of each other. Flag it per-document as the fraction of
  the document's shingles that are source-common.

- duplicated-substring spans (the span-level view of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): find the
  contiguous regions a document shares verbatim with ANY other document,
  via fixed-width n-gram anchors merged into maximal runs. Unlike
  doc-level near-dup pairs this localizes WHERE the duplication is, which
  is what a span-removal pass consumes.

Scale shapes (both oracle-replicable, no UDFs):
- boilerplate: per-doc DISTINCT shingles -> one (source, shingle)
  hash-agg for document frequency -> join back -> per-doc rollup. The df
  agg is shingle-vocabulary-sized; the join back is shingle-keyed
  equi-join. The >= 25% commonality gate is the INTEGER comparison
  4*df >= n_docs so the threshold cannot drift between engines.
- spans: positions are carried through the anchor df-filter, then maximal
  runs come from the classic islands trick (pos - row_number() per doc) —
  one window over the surviving anchor positions only (duplicated
  positions are a tiny fraction of the corpus), never over the full token
  stream. Anchor grouping keys are md5(gram), so the shuffle carries
  32-byte keys, not 13-token strings.

Reference has no text-curation surface at all (SURVEY.md 2.12 is entirely
beyond-parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import fan_out


def _gram_positions(
    docs: DataFrame, n: int, id_col: str, text_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, [extra_cols...,] pos, gram) for every n-token shingle,
    pos 1-based — JVM-side: split -> transform over a position sequence ->
    posexplode keeps everything in whole-stage codegen. fan_out first: the
    corpus arrives as a coarse single-file scan and the gram explode is
    the CPU-heavy stage — without the repartition it runs on one core.
    `extra_cols` ride along map-side so callers never need a join back to
    the corpus for per-doc attributes."""
    docs = fan_out(docs)
    toks = F.split(F.col(text_col), " ")
    # sequence(1, 0) DESCENDS in Spark (implicit step -1), so docs shorter
    # than n must short-circuit to an empty position list explicitly
    positions = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(
        positions, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(grams).alias("p0", "gram"),
    ).select(
        "doc_id", *extra_cols, (F.col("p0") + 1).alias("pos"), "gram"
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_frac) — boiler_frac is the
    share of the doc's distinct n-gram shingles that occur in >= 25% of
    the documents of the SAME source (integer gate: 4*df >= n_docs)."""
    from ..scratch import scratch_persist

    # sh feeds BOTH the df aggregation and the join back — persist or the
    # explode+distinct runs twice
    sh = scratch_persist(
        _gram_positions(docs, n, id_col, text_col, extra_cols=(source_col,))
        .select(
            "doc_id", F.col(source_col).alias("source"), F.md5("gram").alias("g")
        )
        .distinct()
    )
    ndocs = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    df_tbl = sh.groupBy("source", "g").agg(F.count("*").alias("df"))
    flagged = (
        sh.join(df_tbl, ["source", "g"])
        .join(F.broadcast(ndocs), "source")
        .select(
            "doc_id",
            (F.col("df") * 4 >= F.col("n_docs")).cast("int").alias("is_b"),
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("is_b").cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id", "n_shingles", "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias("boiler_frac"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (doc_id, span_start, span_end, span_tokens, n_anchors).

    An anchor is an n-gram occurring in >= 2 DISTINCT documents; runs of
    consecutive anchor positions merge into one span covering tokens
    [span_start, span_end] (1-based, inclusive; span_end = last anchor
    pos + n - 1). n_anchors counts the anchor positions merged in."""
    from ..scratch import scratch_persist

    # gp feeds the anchor-df aggregation AND the join back — persist so
    # the gram explode runs once
    gp = scratch_persist(
        _gram_positions(docs, n, id_col, text_col).select(
            "doc_id", "pos", F.md5("gram").alias("g")
        )
    )
    dup = (
        gp.select("g", "doc_id").distinct()
        .groupBy("g").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    anchors = gp.join(dup, "g").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = anchors.select(
        "doc_id", "pos", (F.col("pos") - F.row_number().over(w)).alias("run")
    )
    return (
        runs.groupBy("doc_id", "run")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_anchors"),
        )
        .select(
            "doc_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_anchors",
        )
    )


def boilerplate_sql(n: int = 5) -> str:
    """DuckDB twin of boilerplate_stats over the `documents` view."""
    return f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source,
               md5(list_aggregate(t[u.i:u.i+{n - 1}], 'string_agg', ' ')) AS g
        FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) u(i)
    ),
    nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM documents GROUP BY 1),
    dfq AS (SELECT source, g, COUNT(*) AS df FROM sh GROUP BY 1, 2)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN dfq.df * 4 >= nd.n_docs THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler,
           ROUND(SUM(CASE WHEN dfq.df * 4 >= nd.n_docs THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
    FROM sh JOIN dfq USING (source, g) JOIN nd USING (source)
    GROUP BY sh.doc_id
    """


def duplicated_spans_sql(n: int = 13) -> str:
    """DuckDB twin of duplicated_spans over the `documents` view."""
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    gp AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               md5(list_aggregate(t[u.i:u.i+{n - 1}], 'string_agg', ' ')) AS g
        FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) u(i)
    ),
    dup AS (
        SELECT g FROM (SELECT DISTINCT g, doc_id FROM gp)
        GROUP BY g HAVING COUNT(*) >= 2
    ),
    anchors AS (SELECT doc_id, pos FROM gp JOIN dup USING (g)),
    runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS run
        FROM anchors
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {n - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) + {n - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM runs GROUP BY doc_id, run
    """
