"""Round-5d extension queries: RAG/packing document chunking, per-doc
n-gram novelty (marginal-new-content diagnostics), and a one-pass corpus
data-quality profile — the serving-prep and audit operators a 100 TB
training-data pipeline runs beside the curation DAG.

All three follow the repo's exact-oracle discipline (BIGINT casts,
deterministic final ordering, DuckDB replays the same arithmetic); no
reference analogue (the reference's surface is graph templates,
SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table


@register(
    "chunk_documents",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
        SELECT doc_id, i AS chunk_id, w[i*24+1 : i*24+32] AS cw
        FROM t, UNNEST(generate_series(0, (len(w) - 1) // 24)) u(i)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 24 AS BIGINT) AS start_word,
           CAST(len(cw) AS BIGINT) AS n_words,
           md5(array_to_string(cw, ' ')) AS chunk_md5
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def chunk_documents_q(spark, sf_dir):
    """Fixed-size overlapping word-window chunker (functions/text.py
    chunk_documents): size 32 / stride 24, the RAG-indexer split.
    Map-only sequence+explode inside the scan stage — zero shuffles at
    any corpus size; md5 content keys for downstream chunk linkage."""
    from .functions.text import chunk_documents

    return chunk_documents(read_table(spark, sf_dir, "documents"))


@register(
    "token_ngram_novelty",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    dsh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+12], ' ')) AS h
        FROM toks, UNNEST(generate_series(1, len(t) - 12)) u(i)
        WHERE len(t) >= 13
    ),
    fs AS (SELECT h, MIN(doc_id) AS first_doc FROM dsh GROUP BY h),
    pd AS (
        SELECT d.doc_id, COUNT(*) AS n_shingles,
               SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS n_novel
        FROM dsh d JOIN fs f USING (h)
        GROUP BY 1
    )
    SELECT CAST(dd.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           CAST(COALESCE((1000 * n_novel) // n_shingles, 0) AS BIGINT)
               AS novelty_milli
    FROM (SELECT doc_id FROM documents) dd
    LEFT JOIN pd ON dd.doc_id = pd.doc_id
    ORDER BY doc_id
    """,
)
def token_ngram_novelty_q(spark, sf_dir):
    """Per-doc 13-gram novelty (functions/dedup.py ngram_novelty): the
    fraction of a doc's distinct shingles first seen (min doc_id) in
    that doc — the marginal-new-content curve for ingestion-order and
    crawl-dedup diagnostics. md5-keyed explode + one min-agg + one
    rollup; two bounded-width shuffles, no self-join."""
    from .functions.dedup import ngram_novelty

    return ngram_novelty(read_table(spark, sf_dir, "documents"))


@register(
    "corpus_profile",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inconsistent,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST((1000 * SUM(n_chars)) // COUNT(*) AS BIGINT) AS avg_chars_milli
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_profile_q(spark, sf_dir):
    """One-pass per-source data-quality profile: row counts, empty-text
    and n_chars-vs-length(text) consistency audits, lang/id distinct
    cardinalities, and integer-milli length stats. ONE hash-agg over the
    scan (count-distincts expand map-side, still one shuffle on the
    source key); the profile every ingest lands before curation runs."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("text").isNull() | (F.col("text") == "")).cast("long")
            ).alias("n_empty"),
            F.sum(
                (F.col("n_chars") != F.length("text")).cast("long")
            ).alias("n_inconsistent"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("doc_id").alias("n_ids"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.expr("(1000 * sum(n_chars)) DIV count(*)").alias("avg_chars_milli"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long"),
            F.col("n_empty").cast("long"),
            F.col("n_inconsistent").cast("long"),
            F.col("n_langs").cast("long"),
            F.col("n_ids").cast("long"),
            F.col("total_chars").cast("long"),
            F.col("min_chars").cast("long"),
            F.col("max_chars").cast("long"),
            F.col("avg_chars_milli").cast("long"),
        )
        .orderBy("source")
    )


def _kcenter_sql() -> str:
    from .functions.similarity import kcenter_select_exact_sql

    return kcenter_select_exact_sql(k=8)


@register("emb_kcenter_select", _kcenter_sql())
def emb_kcenter_select_q(spark, sf_dir):
    """Greedy k-center coreset selection (functions/similarity.py
    kcenter_select_exact): pick the 8 mutually-farthest embeddings —
    the diversity-subsampling primitive for coreset pruning. Integer-
    quantized squared-L2, MIN(id) seed, incremental min-dist carry:
    one broadcast center join + one argmax agg per round, linear in
    k·n·d, no all-pairs."""
    from .functions.similarity import kcenter_select_exact

    return kcenter_select_exact(read_table(spark, sf_dir, "embeddings"), k=8)


_EWMA_TAPS = 16
_EWMA_SQL_TERMS = " + ".join(
    f"COALESCE(lag(v_milli, {j}) OVER w, 0) * {1 << (15 - j)}"
    for j in range(_EWMA_TAPS)
)


@register(
    "events_user_ewma",
    f"""
    WITH e AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 1000) AS BIGINT) AS v_milli
        FROM events
    ),
    scored AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events,
               {_EWMA_SQL_TERMS} AS ewma_fp
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(event_id AS BIGINT) AS last_event_id,
           CAST(ewma_fp AS BIGINT) AS ewma_fp
    FROM scored WHERE rn = n_events
    ORDER BY user_id
    """,
)
def events_user_ewma_q(spark, sf_dir):
    """Per-user exponentially-decayed engagement score at the user's
    latest event — the recency-weighted activity feature behind churn
    and engagement models. FIXED-POINT decay: 16 lag taps weighted
    2^(15-lag) over milli-quantized values, all BIGINT (no float decay
    drift channel between engines). ONE window per user partition
    (shuffles once on user_id, every tap shares the frame); output is
    user-cardinality."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ewma = None
    for j in range(_EWMA_TAPS):
        term = F.coalesce(F.lag("v_milli", j).over(w), F.lit(0)) * F.lit(
            1 << (15 - j)
        )
        ewma = term if ewma is None else ewma + term
    scored = e.select(
        "user_id", "event_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_events"),
        ewma.alias("ewma_fp"),
    )
    return (
        scored.filter(F.col("rn") == F.col("n_events"))
        .select(
            F.col("user_id").cast("long"),
            F.col("n_events").cast("long"),
            F.col("event_id").cast("long").alias("last_event_id"),
            F.col("ewma_fp").cast("long"),
        )
        .orderBy("user_id")
    )


from .graph.tpch import SQL_EDGES  # noqa: E402


@register(
    "graph_assortativity",
    f"""
    WITH edges AS ({SQL_EDGES}),
    od AS (SELECT type, src, CAST(COUNT(*) AS BIGINT) AS xd
           FROM edges GROUP BY 1, 2),
    idg AS (SELECT type, dst, CAST(COUNT(*) AS BIGINT) AS yd
            FROM edges GROUP BY 1, 2),
    xy AS (
        SELECT e.type, o.xd AS x, i.yd AS y
        FROM edges e
        JOIN od o ON o.type = e.type AND o.src = e.src
        JOIN idg i ON i.type = e.type AND i.dst = e.dst
    ),
    s AS (
        SELECT type, CAST(COUNT(*) AS HUGEINT) AS m,
               CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM xy GROUP BY type
    )
    SELECT type, CAST(m AS BIGINT) AS m,
           CASE WHEN (m * sxx - sx * sx) = 0 OR (m * syy - sy * sy) = 0
                THEN NULL
                ELSE ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
           END AS assortativity
    FROM s
    ORDER BY type
    """,
)
def graph_assortativity_q(spark, sf_dir):
    """Directed degree assortativity per edge type (Newman 2002): the
    Pearson correlation of (out-degree of src, in-degree of dst) over
    edges — do hubs link to hubs? Shape: two node-sized degree aggs,
    two equi-joins back onto the edge list, ONE moments agg; closed
    form from EXACT integer sums (the length_regression discipline),
    cross products in DECIMAL(38)/HUGEINT — the events_outliers sf0.1
    overflow lesson applied up front — then two correctly-rounded
    divides. NULL where a degree variance is zero (constant-degree
    types: a correlation does not exist, and both engines must agree
    it does not)."""
    from .graph.tpch import build_graph

    g = build_graph(spark, sf_dir)
    e = g.edges.select("type", "src", "dst")
    od = e.groupBy("type", "src").agg(F.count("*").alias("xd"))
    idg = e.groupBy("type", "dst").agg(F.count("*").alias("yd"))
    xy = (
        e.join(od, ["type", "src"])
        .join(idg, ["type", "dst"])
        .select("type", F.col("xd").alias("x"), F.col("yd").alias("y"))
    )
    dec = "decimal(38,0)"
    s = xy.groupBy("type").agg(
        F.count("*").cast(dec).alias("m"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
    )
    varx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = F.round(
        cov.cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
        6,
    )
    return s.select(
        "type",
        F.col("m").cast("long").alias("m"),
        F.when((varx == 0) | (vary == 0), F.lit(None).cast("double"))
        .otherwise(r)
        .alias("assortativity"),
    ).orderBy("type")


@register(
    "emb_int8_calibration",
    """
    WITH d AS (
        SELECT CAST(u.dim AS BIGINT) AS dim,
               CAST(round(CAST(embedding[u.dim] AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) u(dim)
    ),
    sc AS (SELECT dim, MAX(ABS(q)) AS scale FROM d GROUP BY dim),
    coded AS (
        SELECT d.dim, d.q, sc.scale,
               CASE WHEN sc.scale = 0 THEN 0
                    ELSE CAST(round(CAST(d.q AS DOUBLE) * 127 / sc.scale)
                              AS BIGINT)
               END AS c
        FROM d JOIN sc USING (dim)
    )
    SELECT dim, CAST(scale AS BIGINT) AS scale,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ABS(c) = 127 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_saturated,
           CAST(CAST(SUM(CAST((127 * q - c * scale) * (127 * q - c * scale)
                    AS HUGEINT)) AS HUGEINT) AS VARCHAR) AS sum_sq_err,
           CAST(MAX(ABS(127 * q - c * scale)) AS BIGINT) AS max_abs_err
    FROM coded
    GROUP BY dim, scale
    ORDER BY dim
    """,
)
def emb_int8_calibration_q(spark, sf_dir):
    """Per-dimension symmetric int8 quantization calibration
    (functions/similarity.py int8_calibration): maxabs scales,
    saturation counts, and EXACT integer reconstruction error in
    (127*milli)^2 units (DECIMAL(38)/HUGEINT sums, stringified for the
    cross-engine hash). Two dim-keyed aggs + one broadcast — output is
    dim-cardinality at any corpus size."""
    from .functions.similarity import int8_calibration

    return int8_calibration(read_table(spark, sf_dir, "embeddings"))


from .graph.tpch import SQL_NODES  # noqa: E402


def _ppr_sql(seed_mod: int = 101, iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled personalized-PageRank recurrence (the _pagerank_sql
    shape, registry_ext4.py, with seed-restricted teleport mass)."""
    k = f"(SELECT COUNT(*) FROM nodes WHERE id % {seed_mod} = 0)"
    ctes = [
        f"WITH nodes AS ({SQL_NODES}),",
        f"edges AS ({SQL_EDGES}),",
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),",
        f"pr0 AS (SELECT id AS node, CASE WHEN id % {seed_mod} = 0 "
        f"THEN 1.0/{k} ELSE 0.0 END AS rank FROM nodes),",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"pr{t} AS (SELECT n.id AS node, "
            f"CASE WHEN n.id % {seed_mod} = 0 THEN {1.0 - damping!r}/{k} "
            f"ELSE 0.0 END "
            f"+ {damping!r} * COALESCE(SUM(p.rank / dg.d), 0) AS rank "
            f"FROM nodes n LEFT JOIN edges e ON e.dst = n.id "
            f"LEFT JOIN pr{t - 1} p ON p.node = e.src "
            f"LEFT JOIN deg dg ON dg.src = e.src GROUP BY n.id),"
        )
    body = "\n".join(ctes).rstrip(",")
    return f"{body}\nSELECT node, ROUND(rank, 6) AS rank FROM pr{iters}"


@register("graph_ppr", _ppr_sql())
def graph_ppr_q(spark, sf_dir):
    """Personalized PageRank from the deterministic id%101 seed set
    (operators/pagerank.py personalized_pagerank): seed-biased
    relevance — the "entities related to THESE" walk. Same recurrence,
    duality, and unrolled-CTE oracle discipline as graph_pagerank;
    teleport mass restricted to the seeds."""
    from .graph.tpch import build_graph
    from .operators.pagerank import personalized_pagerank

    g = build_graph(spark, sf_dir)
    return personalized_pagerank(spark, g.nodes, g.edges)


@register(
    "chunk_dedup_stats",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
        SELECT doc_id,
               md5(array_to_string(w[i*24+1 : i*24+32], ' ')) AS chunk_md5
        FROM t, UNNEST(generate_series(0, (len(w) - 1) // 24)) u(i)
    ),
    df AS (
        SELECT chunk_md5, COUNT(DISTINCT doc_id) AS n_docs
        FROM c GROUP BY chunk_md5
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_chunks,
           CAST((1000 * SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS shared_milli
    FROM c JOIN df USING (chunk_md5)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def chunk_dedup_stats_q(spark, sf_dir):
    """Chunk-level cross-document duplication: how much of each doc's
    RAG-chunk inventory (chunk_documents's md5 keys) appears in OTHER
    documents too — the chunk-store dedup planning stat (shared chunks
    are stored once, embedded once). Shape: the map-only chunker, one
    chunk-keyed distinct-doc agg, one doc rollup; the md5 join key
    bounds shuffle width at 32 bytes however long the chunks."""
    from .functions.text import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    c = chunk_documents(docs).select("doc_id", "chunk_md5")
    df = c.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        c.join(df, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared_chunks"),
        )
        .select(
            F.col("doc_id").cast("long"),
            F.col("n_chunks").cast("long"),
            F.col("n_shared_chunks").cast("long"),
            F.expr("(1000 * n_shared_chunks) DIV n_chunks")
            .cast("long")
            .alias("shared_milli"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_lang_confusion",
    """
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    pred AS (
        SELECT lang,
               CASE WHEN list_contains(toks, 'spark') OR list_contains(toks, 'query')
                         OR list_contains(toks, 'vector') THEN 'tech'
                    WHEN len(list_filter(toks, x -> x IN ('a', 'the'))) / len(toks) > 0.10
                         THEN 'stop-heavy'
                    ELSE 'plain' END AS lang_pred
        FROM t
    )
    SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
)
def corpus_lang_confusion_q(spark, sf_dir):
    """Label-vs-heuristic language confusion matrix: the eval table for
    the lang_pred classifier against the corpus's lang column — where
    the n-gram heuristic disagrees with ground truth is exactly where
    a lang-ID model needs training data. ONE hash-agg after the
    map-only prediction; output bounded by |langs| x |classes|."""
    from .functions import text

    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", text.lang_pred().alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .select("lang", "lang_pred", F.col("n").cast("long"))
        .orderBy("lang", "lang_pred")
    )


@register(
    "vocab_zipf_spectrum",
    """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    freq AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
    oct AS (
        SELECT CAST(floor(log2(f)) AS BIGINT) AS octave, f FROM freq
    )
    SELECT octave,
           CAST(POW(2, octave) AS BIGINT) AS freq_lo,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(f) AS BIGINT) AS n_tokens
    FROM oct GROUP BY octave
    ORDER BY octave
    """,
)
def vocab_zipf_spectrum_q(spark, sf_dir):
    """Token frequency spectrum by power-of-two octave (the Zipf-curve
    histogram tokenizer design reads: how many types occur [2^k, 2^k+1)
    times, and how much token mass each band carries). Two vocabulary-
    sized hash-aggs — the octave index is floor(log2(f)) on an INTEGER
    count, exact in both engines (log2 of an exact power is exact IEEE;
    floor cannot straddle)."""
    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("f"))
    )
    return (
        freq.select(F.floor(F.log2("f")).cast("long").alias("octave"), "f")
        .groupBy("octave")
        .agg(F.count("*").alias("n_types"), F.sum("f").alias("n_tokens"))
        .select(
            "octave",
            F.pow(F.lit(2.0), F.col("octave")).cast("long").alias("freq_lo"),
            F.col("n_types").cast("long"),
            F.col("n_tokens").cast("long"),
        )
        .orderBy("octave")
    )


@register(
    "mm_ppm_features",
    """
    WITH b AS (
        SELECT doc_id, text, CAST(length(text) // 12 AS INT) AS h FROM documents
    ), s AS (
        SELECT doc_id, CAST(SUM(ascii(substring(text, u.i, 1))) AS BIGINT) AS px_sum
        FROM b, UNNEST(generate_series(1, h * 12)) u(i) GROUP BY doc_id
    )
    SELECT CAST(b.doc_id AS VARCHAR) AS media_id, 'image' AS kind,
           CAST(14 + length(CAST(h AS VARCHAR)) + 12 * h AS INT) AS n_bytes,
           CAST(4 AS INT) AS width, h AS height,
           s.px_sum, md5(substring(text, 1, 12 * h)) AS feature_hash
    FROM b JOIN s ON b.doc_id = s.doc_id
    """,
)
def mm_ppm_features_q(spark, sf_dir):
    """REAL netpbm P6 decode (functions/codecs.py decode_ppm): fourth
    uncompressed container beside BMP/TGA/WAV/AVI — and the first with
    an ASCII header, so the decoder runs a real whitespace/comment
    tokenizer rather than fixed offsets. Same synthesize-from-text
    scheme; n_bytes checks the parsed variable-length header exactly
    (14 fixed bytes + digits of the height). Map-only Arrow pass."""
    from .functions import multimodal

    docs = read_table(spark, sf_dir, "documents")
    media = multimodal.ppm_media_from_text(docs)
    return multimodal.extract_features(media, fake=False)
