"""Round-4b extension queries: corpus-selection and analytics operators a
100 TB training-data pipeline runs daily — token-budget corpus cuts,
multi-granularity event rollups, vocabulary profiling, incremental-ingest
LSH dedup, HITS centrality, a product-quantization ANN tier (plus its
exact-twin encode oracle), similarity-threshold calibration histograms,
real uncompressed-AVI frame decode, integer-exact anomaly gating, and
per-source regression drift checks.

Every SQL-expressible entry carries a DuckDB oracle; ann_pq_topk is the
one approximate family here (recall pytest-asserted, rows-only in the
driver, same contract as ann_lsh/ivf; its encode machinery is
hash-checked by ann_pq_exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table


@register(
    "token_budget_select",
    """
    WITH t AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_chars, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY n_chars DESC, doc_id ASC ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_chars, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 20000
    ORDER BY cum_tokens ASC, doc_id ASC
    """,
)
def token_budget_select_q(spark, sf_dir):
    """Greedy best-first token-budget corpus cut (functions/packing.py
    token_budget_select): the "best N tokens" selection every pretraining
    run starts with — cumsum gate over the (score desc, id) order, one
    ordering window, no iteration."""
    from .functions.packing import token_budget_select

    return token_budget_select(
        read_table(spark, sf_dir, "documents"), budget=20000
    )


@register(
    "events_rollup",
    """
    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(GROUPING(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
    FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
    """,
)
def events_rollup_q(spark, sf_dir):
    """Multi-granularity event rollup in ONE pass: (type, day), (type),
    and grand-total rows via ROLLUP — Spark expands the grouping sets
    map-side (one Expand + one hash-agg, map-side combined), never
    scanning the input once per granularity. `value` is quantized to
    integer millis before summing so the cross-engine sum is exact
    (the emb_label_centroids trick); grouping_id disambiguates rollup
    NULLs, and both engines share its bit-vector encoding."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 1000).cast("long").alias("q"),
    )
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_events"),
            F.sum("q").alias("value_milli"),
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("gid").cast("long").alias("gid"),
            "n_events",
            "value_milli",
        )
    )


def _hits_sql(rounds: int = 2) -> str:
    """Unrolled unnormalized HITS: a_t from h_{t-1}, h_t from a_t — all
    BIGINT-exact (see operators/hits.py docstring)."""
    from .graph.tpch import SQL_EDGES, SQL_NODES

    parts = [
        f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),",
        """e AS (SELECT DISTINCT src, dst FROM edges),
        h0 AS (SELECT id AS node, CAST(1 AS BIGINT) AS h FROM nodes)""",
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
        ar{t} AS (
            SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS a
            FROM e JOIN h{t-1} h ON e.src = h.node GROUP BY e.dst
        ),
        a{t} AS (
            SELECT n.id AS node, COALESCE(ar.a, 0) AS a
            FROM nodes n LEFT JOIN ar{t} ar ON ar.node = n.id
        ),
        hr{t} AS (
            SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS h
            FROM e JOIN a{t} a ON e.dst = a.node GROUP BY e.src
        ),
        h{t} AS (
            SELECT n.id AS node, COALESCE(hr.h, 0) AS h
            FROM nodes n LEFT JOIN hr{t} hr ON hr.node = n.id
        )""")
    parts.append(
        f"SELECT h.node, h.h AS hub, a.a AS auth "
        f"FROM h{rounds} h JOIN a{rounds} a USING (node)"
    )
    return "\n".join(parts)


@register("graph_hits", _hits_sql(2))
def graph_hits_q(spark, sf_dir):
    """2-round unnormalized HITS over the graph twin (operators/hits.py):
    per round one join + one hash-agg per direction; fixed rounds from
    hub=1 keep every score BIGINT-exact, so the unrolled SQL oracle
    hash-checks an iterative centrality — same trick as the pagerank /
    sssp / label-propagation oracles."""
    from .graph.tpch import build_graph
    from .operators.hits import hits_bounded

    g = build_graph(spark, sf_dir)
    return hits_bounded(spark, g.nodes, g.edges, rounds=2)


@register(
    "corpus_vocab_stats",
    """
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    tc AS (SELECT lang, t, COUNT(*) AS n FROM tok GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
           ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM tc GROUP BY lang
    """,
)
def corpus_vocab_stats_q(spark, sf_dir):
    """Per-language vocabulary profile (functions/text.py vocab_stats):
    total/vocab/hapax counts via explode → token-count hash-agg →
    per-group rollup; the pre-aggregation keeps the shuffle
    vocabulary-sized, never COUNT(DISTINCT) over raw occurrences."""
    from .functions.text import vocab_stats

    return vocab_stats(read_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_incremental",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) u(i)
    ),
    m AS (
        SELECT doc_id, u.seed,
               MIN(md5(CAST(u.seed AS VARCHAR) || ':' || s)) AS mh
        FROM sh, UNNEST(generate_series(0, 15)) u(seed)
        GROUP BY doc_id, u.seed
    ),
    b AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS bh
        FROM m GROUP BY doc_id, seed // 4
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
        FROM b a JOIN b c ON a.band = c.band AND a.bh = c.bh
                          AND a.doc_id < c.doc_id
    )
    SELECT i, j FROM pairs WHERE i % 5 = 0 OR j % 5 = 0
    """,
)
def dedup_minhash_incremental_q(spark, sf_dir):
    """Incremental-ingest LSH dedup (functions/dedup.py
    minhash_incremental_candidates): docs with doc_id % 5 = 0 play the
    arriving batch, the rest the standing index — batch-vs-index +
    batch-vs-batch probes only, index side never re-shingled. The oracle
    recomputes the FULL corpus pipeline and filters to new-involving
    pairs, proving the incremental path emits exactly the full-recompute
    answer."""
    from .functions.dedup import minhash_incremental_candidates

    docs = read_table(spark, sf_dir, "documents")
    return minhash_incremental_candidates(
        docs, is_new=F.col("doc_id") % 5 == 0, k=16, bands=4
    )


@register("ann_pq_topk", oracle_twin="ann_pq_exact")
def ann_pq_topk_q(spark, sf_dir):
    """Product-quantization ANN (functions/similarity.py pq_topk): codes
    compress vectors 32× and the ADC scan reads only the code table —
    the memory-bound 100 TB tier beside IVF's partition-pruning tier.
    Approximate: recall pytest-asserted vs brute_force_topk, rows-only
    in the driver like the other approximate families."""
    from .functions.similarity import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return pq_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)


@register(
    "emb_similarity_histogram",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    nv AS (
        SELECT vec_id,
               list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS n
        FROM v
    ),
    p AS (
        SELECT round(list_sum(list_transform(list_zip(a.n, b.n),
                                             x -> x[1] * x[2])), 6) AS sim
        FROM nv a JOIN nv b ON a.vec_id < b.vec_id
    ),
    bx AS (
        SELECT LEAST(GREATEST(CAST(floor((sim + 1.0) * 10) AS BIGINT), 0), 19) AS bin
        FROM p
    )
    SELECT bin, ROUND(bin * 0.1 - 1.0, 6) AS lo,
           ROUND((bin + 1) * 0.1 - 1.0, 6) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM bx GROUP BY bin
    """,
)
def emb_similarity_histogram_q(spark, sf_dir):
    """All-pairs cosine histogram (functions/similarity.py
    cosine_similarity_histogram): the threshold-calibration diagnostic —
    block-pair GEMM whose kernels emit per-bin COUNTS (bins rows per
    block pair on the wire, never a pair list); binning on round(sim, 6)
    keeps both engines on identical values."""
    from .functions.similarity import cosine_similarity_histogram

    return cosine_similarity_histogram(read_table(spark, sf_dir, "embeddings"))


@register(
    "mm_avi_frames",
    """
    WITH v AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_id, text,
               CAST(length(text) // 24 AS INT) AS nf
        FROM documents WHERE doc_id % 3 = 0
    ),
    f AS (
        SELECT media_id, CAST(u.i AS INT) AS frame_idx,
               substring(text, u.i * 24 + 1, 24) AS fb
        FROM v, UNNEST(generate_series(0, nf - 1, 2)) u(i)
        WHERE nf > 0
    ),
    s AS (
        SELECT media_id, frame_idx,
               CAST(SUM(ascii(substring(fb, u.j, 1))) AS BIGINT) AS px_sum
        FROM f, UNNEST(generate_series(1, 24)) u(j)
        GROUP BY 1, 2
    )
    SELECT f.media_id, f.frame_idx, CAST(4 AS INT) AS width,
           CAST(2 AS INT) AS height, s.px_sum, md5(f.fb) AS frame_hash
    FROM f JOIN s USING (media_id, frame_idx)
    """,
)
def mm_avi_frames_q(spark, sf_dir):
    """REAL video decode (closes the last fake multimodal kernel for an
    uncompressed format): documents' text bytes become genuine RIFF/AVI
    files with 24bpp DIB frames (functions/multimodal.avi_media_from_text),
    and extract_video_features walks the LIST/strf/movi structure with the
    pure-numpy parser in functions/codecs.py — dimensions from the parsed
    BITMAPINFOHEADER, px_sum over decoded frames, frame_hash over stored
    frame bytes. ASCII corpus + no-padding geometry keep every decoded
    feature SQL-expressible, so the oracle hash-checks the real chunk walk
    end-to-end. Compressed fourccs stay stubbed (no ffmpeg in env)."""
    from .functions import multimodal

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = multimodal.avi_media_from_text(docs)
    return multimodal.extract_video_features(media, every_n=2)


@register(
    "events_outliers",
    """
    WITH q AS (
        SELECT event_id, event_type,
               CAST(round(value * 1000) AS BIGINT) AS x
        FROM events
    ),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM q GROUP BY event_type
    )
    SELECT q.event_id, q.event_type, ROUND(q.x / 1000.0, 3) AS value
    FROM q JOIN s USING (event_type)
    WHERE (CAST(s.n AS HUGEINT) * q.x - s.sx) * (CAST(s.n AS HUGEINT) * q.x - s.sx)
          > 9 * (CAST(s.n AS HUGEINT) * s.sxx - CAST(s.sx AS HUGEINT) * s.sx)
    """,
)
def events_outliers_q(spark, sf_dir):
    """Per-type 3-sigma outlier flagging with an EXACT decision boundary:
    |x − μ| > 3σ rewritten as (n·x − Σx)² > 9·(n·Σx² − (Σx)²) over
    integer-quantized values — every comparison is BIGINT arithmetic, so
    the boundary cannot flip between engines the way float μ/σ could.
    Shape: one per-type hash-agg (7-row stats table) broadcast back onto
    the scan — map-only second pass. The gate itself is stateless and
    runs unchanged over readStream (streaming/gates.py, stream parity in
    tests/test_streaming_windows.py)."""
    from .streaming.gates import (
        event_sigma_stats, quantize_events, sigma_outlier_gate,
    )

    ev = quantize_events(read_table(spark, sf_dir, "events"))
    return sigma_outlier_gate(ev, event_sigma_stats(ev), k=3)


@register(
    "corpus_length_regression",
    """
    WITH q AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
    ),
    s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM q GROUP BY source
    )
    SELECT source, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                       / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
    FROM s
    """,
)
def corpus_length_regression_q(spark, sf_dir):
    """Per-source least-squares fit of chars-vs-tokens (the corpus-drift
    check: a source whose slope shifts is changing tokenization profile).
    Closed-form slope from EXACT integer sums — one hash-agg, then two
    correctly-rounded divisions — so the cross-engine hash can't drift
    the way covariance-accumulation float paths (regr_slope) could."""
    d = read_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return s.select(
        "source", "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    )


@register(
    "ann_pq_exact",
    """
    WITH d AS (
        SELECT vec_id, (u.dim - 1) // 8 AS j, u.dim,
               CAST(round(CAST(embedding[u.dim] AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) u(dim)
    ),
    dc AS (
        SELECT vec_id, j, dim, q, c.c,
               CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || ':'
                    || CAST(c.c AS VARCHAR) || ':'
                    || CAST(dim AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000 AS w
        FROM d, UNNEST(generate_series(0, 7)) c(c)
    ),
    costs AS (
        SELECT vec_id, j, c, SUM((q - w) * (q - w)) AS cost
        FROM dc GROUP BY 1, 2, 3
    )
    SELECT vec_id, CAST(j AS INT) AS subspace,
           CAST(arg_min(c, cost * 10 + c) AS INT) AS code
    FROM costs GROUP BY vec_id, j
    """,
)
def ann_pq_exact_q(spark, sf_dir):
    """Exact twin of the PQ encode machinery (functions/similarity.py
    pq_codes_exact): same argmin-over-codebook assignment as pq_topk's
    encode kernel, md5-derived integer codebook + quantized dims make
    every distance BIGINT-exact — shrinks the never-oracled machinery to
    just the trained-codebook variants, like ann_lsh_exact did for LSH."""
    from .functions.similarity import pq_codes_exact

    return pq_codes_exact(read_table(spark, sf_dir, "embeddings"), m=8, ks=8)


@register(
    "pack_sequences_sharded",
    """
    WITH t AS (
        SELECT doc_id, doc_id % 16 AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM t
    )
    SELECT CAST(shard * 1099511627776 + (cum - n_tokens) // 256 AS BIGINT) AS seq_id,
           doc_id, n_tokens,
           CAST((cum - n_tokens) % 256 AS BIGINT) AS tok_offset
    FROM c
    """,
)
def pack_sequences_sharded_q(spark, sf_dir):
    """Partition-parallel sequence packing (functions/packing.py
    pack_sequences_sharded): the scale path pack_sequences' docstring
    promises — per-shard cumsum windows instead of one global ordering,
    globally-unique seq_id via shard·2⁴⁰ + local window."""
    from .functions.packing import pack_sequences_sharded

    return pack_sequences_sharded(
        read_table(spark, sf_dir, "documents"), budget=256, n_shards=16
    )
