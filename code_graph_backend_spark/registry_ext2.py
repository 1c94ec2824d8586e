"""Registry batch 3: the remaining SURVEY.md §2 line items as explicit
(query, oracle) pairs — J9/J11/J13, A5-A7, P6/P7, F2/F3/F5, M2/M6 — plus
two more training-pipeline operators (as-of join, TF-IDF).

Same conventions as registry.py (aliases match the oracle, total orders
before LIMIT, exact decimal accumulation for float sums).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .graph.tpch import SQL_EDGES, SQL_NODES
from .mutations.merge import merge_edges
from .operators.asof import asof_prior_event
from .operators.neighbors import out_neighbors
from .operators.traversal import find_paths
from .registry import _graph, _label, register
from .session import read_table

_GRAPH_CTE = f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES})"


# ---------------------------------------------------------------------------
# J9 — 1-hop fixed direction on the commit chain
# (reference git_graph.py:87-97: (c:Commit{hash})-[:CHILD]->(child))
# ---------------------------------------------------------------------------

@register(
    "j9_chain_successor",
    f"""
    {_GRAPH_CTE}
    SELECT n.id, n.name FROM edges e JOIN nodes n ON n.id = e.dst
    WHERE e.type = 'NEXT' AND e.src = 40000005
    """,
)
def j9_chain_successor(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return (
        edges.filter((F.col("type") == "NEXT") & (F.col("src") == 40000005))
        .join(nodes, F.col("dst") == nodes["id"])
        .select("id", "name")
    )


# ---------------------------------------------------------------------------
# J11 — ID-pair join validating edge endpoints before creation
# (reference api/graph.py:491-495: MATCH (src),(dest) WHERE ID(...)=...)
# ---------------------------------------------------------------------------

@register(
    "j11_edge_endpoint_validation",
    f"""
    {_GRAPH_CTE}
    , batch AS (
        SELECT 40000000 + i AS src, 50000000 + (i % 5) AS dst
        FROM generate_series(0, 39) t(i)
    )
    SELECT b.src, b.dst FROM batch b
    JOIN nodes s ON s.id = b.src
    JOIN nodes d ON d.id = b.dst
    """,
)
def j11_edge_endpoint_validation(spark, sf_dir):
    """FK validation of a new-edge batch: both endpoints must exist. The
    batch (request-sized) broadcasts; nodes never move."""
    nodes, _ = _graph(spark, sf_dir)
    batch = spark.range(0, 40).select(
        (F.col("id") + 40000000).alias("src"),
        (F.col("id") % 5 + 50000000).alias("dst"),
    )
    ids = nodes.select("id")
    return (
        F.broadcast(batch)
        .join(ids, batch["src"] == ids["id"])
        .drop("id")
        .join(ids, batch["dst"] == ids["id"])
        .select("src", "dst")
    )


# ---------------------------------------------------------------------------
# J13 — def-site resolution join: unresolved references ⋈ definitions on the
# symbol key (reference api/analyzers/analyzer.py:49-54 resolves call sites
# via LSP; our engine replaces the LSP round-trip with an equi-join)
# ---------------------------------------------------------------------------

@register(
    "j13_symbol_resolution",
    """
    SELECT l_orderkey AS ref_site, l_linenumber AS ref_pos, p_name AS resolved
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_orderkey < 200
    """,
)
def j13_symbol_resolution(spark, sf_dir):
    refs = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    defs = read_table(spark, sf_dir, "part")
    return refs.join(defs, refs["l_partkey"] == defs["p_partkey"]).select(
        F.col("l_orderkey").alias("ref_site"),
        F.col("l_linenumber").alias("ref_pos"),
        F.col("p_name").alias("resolved"),
    )


# ---------------------------------------------------------------------------
# A5/A6 — coverage-ratio arithmetic: hits / span per record
# (reference lcov.py:148-151, 197-205)
# ---------------------------------------------------------------------------

@register(
    "a5_a6_coverage_ratio",
    """
    SELECT o_orderkey,
           CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS hit,
           CAST(COUNT(*) AS BIGINT) AS lines,
           ROUND(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) * 1.0 / COUNT(*), 6) AS cov
    FROM lineitem WHERE l_orderkey < 500 GROUP BY o_orderkey
    """.replace("FROM lineitem", "FROM lineitem JOIN orders ON o_orderkey = l_orderkey"),
)
def a5_a6_coverage_ratio(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("hit"),
            F.count("*").alias("lines"),
        )
        .withColumn(
            "cov", F.round(F.col("hit") * 1.0 / F.col("lines"), 6)
        )
    )


# ---------------------------------------------------------------------------
# A7 — the `WITH f, count(1) AS usage_count` idiom (reference api/prompts.py:24)
# ---------------------------------------------------------------------------

@register(
    "a7_usage_count",
    f"""
    {_GRAPH_CTE}
    SELECT n.id, n.name, CAST(COUNT(*) AS BIGINT) AS usage_count
    FROM edges e JOIN nodes n ON n.id = e.dst
    WHERE e.type = 'CONTAINS' AND n.id < 20000100
    GROUP BY n.id, n.name
    """,
)
def a7_usage_count(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return (
        edges.filter(F.col("type") == "CONTAINS")
        .join(nodes.filter(F.col("id") < 20000100), F.col("dst") == nodes["id"])
        .groupBy("id", "name")
        .agg(F.count("*").alias("usage_count"))
    )


# ---------------------------------------------------------------------------
# P6 — dynamic label/type predicates: optional :REL / :LBL interpolation
# (reference api/graph.py:214-223) — both filters engaged at once
# ---------------------------------------------------------------------------

@register(
    "p6_dynamic_filters",
    f"""
    {_GRAPH_CTE}
    SELECT e.src AS src_id, e.type AS edge_type, n.id, n.name
    FROM edges e JOIN nodes n ON n.id = e.dst
    WHERE e.src IN (1, 2, 3) AND e.type = 'IN_NATION' AND n.label = 'Nation'
    """,
)
def p6_dynamic_filters(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return out_neighbors(
        spark, nodes, edges, [1, 2, 3], edge_type="IN_NATION", dest_label="Nation"
    ).select("src_id", "edge_type", "id", "name")


# ---------------------------------------------------------------------------
# P7 — fixed-dict projection of a commit node (reference git_graph.py:35-43)
# ---------------------------------------------------------------------------

@register(
    "p7_fixed_projection",
    """
    SELECT o_orderkey AS hash, o_orderdate AS date, o_orderstatus AS author,
           o_totalprice AS message
    FROM orders WHERE o_orderkey IN (1, 2, 3, 4, 5, 6, 7)
    """,
)
def p7_fixed_projection(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey").isin([1, 2, 3, 4, 5, 6, 7])).select(
        F.col("o_orderkey").alias("hash"),
        F.col("o_orderdate").alias("date"),
        F.col("o_orderstatus").alias("author"),
        F.col("o_totalprice").alias("message"),
    )


# ---------------------------------------------------------------------------
# F2/F5 — size()/length() and CONTAINS (reference api/prompts.py:16-17,23)
# ---------------------------------------------------------------------------

@register(
    "f2_f5_size_contains",
    f"""
    {_GRAPH_CTE}
    SELECT id, name, CAST(length(name) AS INT) AS name_len
    FROM nodes
    WHERE label = 'Supplier' AND name LIKE '%1%'
    """,
)
def f2_f5_size_contains(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return nodes.filter(
        F.array_contains("labels", "Supplier") & F.col("name").contains("1")
    ).select("id", "name", F.length("name").cast("int").alias("name_len"))


# ---------------------------------------------------------------------------
# F3 — nodes(path) / relationships(path): positional explode of a traversal
# result (reference api/prompts.py:15, git_graph.py:151,169)
# ---------------------------------------------------------------------------

@register(
    "f3_path_functions",
    f"""
    WITH RECURSIVE edges AS ({SQL_EDGES}),
    p(head, path_str, depth) AS (
        SELECT CAST(40000002 AS BIGINT), '40000002', 0
        UNION ALL
        SELECT e.dst, p.path_str || '->' || e.dst, p.depth + 1
        FROM p JOIN edges e ON e.src = p.head AND e.type = 'NEXT'
        WHERE p.head <> 40000009
    ),
    final AS (SELECT string_split(path_str, '->') AS parts FROM p WHERE head = 40000009)
    SELECT CAST(i - 1 AS INT) AS pos, CAST(parts[i] AS BIGINT) AS node_id
    FROM final, UNNEST(generate_series(1, len(parts))) u(i)
    """,
)
def f3_path_functions(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    paths = find_paths(spark, edges, 40000002, 40000009, edge_type="NEXT", max_depth=12)
    return paths.select(F.posexplode("path").alias("pos", "node_id"))


# ---------------------------------------------------------------------------
# M2 — MERGE edge upsert on (src, dst, type) (reference api/graph.py:482-498)
# ---------------------------------------------------------------------------

@register(
    "m2_merge_edges",
    f"""
    {_GRAPH_CTE}
    , batch AS (
        SELECT 40000000 + i AS src, 40000001 + i AS dst, 'NEXT' AS type
        FROM generate_series(0, 9) t(i)        -- 10 existing NEXT edges
        UNION ALL
        SELECT 40000000 + i, 50000000 + (i % 5), 'TAGGED'
        FROM generate_series(0, 19) t(i)       -- 20 brand-new edges
    ),
    merged AS (
        SELECT DISTINCT src, dst, type FROM (
            SELECT src, dst, type FROM edges WHERE type IN ('NEXT', 'TAGGED')
            UNION ALL SELECT src, dst, type FROM batch
        )
    )
    SELECT type, CAST(COUNT(*) AS BIGINT) AS n FROM merged GROUP BY type
    """,
)
def m2_merge_edges(spark, sf_dir):
    # restricted to the touched edge types: CONTAINS legitimately holds
    # duplicate (src,dst,type) keys (same part twice in one order, different
    # pos) which a SQL DISTINCT would collapse but MERGE leaves alone
    _, edges = _graph(spark, sf_dir)
    edges = edges.filter(F.col("type").isin(["NEXT", "TAGGED"]))
    exist = spark.range(0, 10).select(
        (F.col("id") + 40000000).alias("src"),
        (F.col("id") + 40000001).alias("dst"),
        F.lit("NEXT").alias("type"),
        F.lit(None).cast("map<string,string>").alias("props"),
    )
    new = spark.range(0, 20).select(
        (F.col("id") + 40000000).alias("src"),
        (F.col("id") % 5 + 50000000).alias("dst"),
        F.lit("TAGGED").alias("type"),
        F.lit(None).cast("map<string,string>").alias("props"),
    )
    merged = merge_edges(edges, exist.unionByName(new))
    return merged.groupBy("type").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# M6 — edge property update on a matched pattern
# (reference git_graph.py:116-141: SET queries/params on the PARENT edge)
# ---------------------------------------------------------------------------

@register(
    "m6_edge_prop_update",
    f"""
    {_GRAPH_CTE}
    SELECT src, dst,
           CASE WHEN src = 40000003 THEN 'logged' END AS q
    FROM edges WHERE type = 'NEXT'
    """,
)
def m6_edge_prop_update(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    nxt = edges.filter(F.col("type") == "NEXT")
    updated = nxt.withColumn(
        "props",
        F.when(
            F.col("src") == 40000003,
            F.map_concat(
                F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
                F.create_map(F.lit("q"), F.lit("logged")),
            ),
        ).otherwise(F.col("props")),
    )
    return updated.select("src", "dst", F.col("props").getItem("q").alias("q"))


# ---------------------------------------------------------------------------
# P8 — extension + ignore filters (reference source_analyzer.py:87,93-100:
# suffix ∈ supported set, substring-ignore list)
# ---------------------------------------------------------------------------

@register(
    "p8_ext_ignore_filters",
    """
    SELECT doc_id, source, lang FROM documents
    WHERE lang IN ('en', 'fr') AND source NOT LIKE '%1%'
    """,
)
def p8_ext_ignore_filters(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(
        F.col("lang").isin(["en", "fr"]) & ~F.col("source").contains("1")
    ).select("doc_id", "source", "lang")


# ---------------------------------------------------------------------------
# Skew-aware aggregation (beyond-parity scale pattern): 5 event types over
# 10k+ rows = every row funnels into 5 reducers; the salted two-phase agg
# restores parallelism. Values accumulate as exact decimals so the salted
# result is bit-identical to the plain GROUP BY oracle.
# ---------------------------------------------------------------------------

@register(
    "skew_salted_agg",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark, sf_dir):
    from .operators.skew import salted_agg

    events = read_table(spark, sf_dir, "events").withColumn(
        "_v", F.col("value").cast("decimal(30,2)")
    )
    out = salted_agg(
        events,
        ["event_type"],
        {"n": ("event_type", "count"), "value_sum": ("_v", "sum")},
        salt=16,
    )
    return out.select(
        "event_type", "n", F.col("value_sum").cast("double").alias("value_sum")
    )


# ---------------------------------------------------------------------------
# Text analysis batch 2: BPE-ish subword estimate + rolling-hash fingerprint
# ---------------------------------------------------------------------------

@register(
    "text_bpe_tokens",
    """
    SELECT doc_id,
           CAST(token_count AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9 ]')) AS INT)
               AS bpe_tokens
    FROM (SELECT doc_id, text, len(string_split(text, ' ')) AS token_count
          FROM documents)
    """,
)
def text_bpe_tokens(spark, sf_dir):
    from .functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count().alias("ws_tokens"),
        T.bpe_token_estimate().alias("bpe_tokens"),
    )


@register(
    "text_rolling_fingerprint",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(toks, x -> CAST(length(x) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 2147483647
           ) AS rfp
    FROM t
    """,
)
def text_rolling_fingerprint(spark, sf_dir):
    from .functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.rolling_fingerprint().alias("rfp"))


# ---------------------------------------------------------------------------
# IVF ANN (beyond-parity): inverted-file index — k-means cells + probe join.
# Approximate ⇒ rows-only check; pytest asserts recall vs brute force.
# ---------------------------------------------------------------------------

@register("ann_ivf_topk", oracle_twin="ann_ivf_exact")
def ann_ivf_topk(spark, sf_dir):
    from .functions import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)


# ---------------------------------------------------------------------------
# As-of join (beyond-parity): purchase → most recent strictly-prior click
# ---------------------------------------------------------------------------

@register(
    "asof_prior_click",
    """
    SELECT event_id, user_id, prior_id FROM (
        SELECT event_id, user_id, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_id
        FROM events WHERE event_type IN ('purchase', 'click')
    ) WHERE event_type = 'purchase'
    """,
)
def asof_prior_click(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    return asof_prior_event(events, "purchase", "click")


# ---------------------------------------------------------------------------
# TF-IDF top terms (beyond-parity text analysis)
# ---------------------------------------------------------------------------

@register(
    "text_tfidf_topterms",
    """
    WITH toks AS (
        SELECT doc_id, u.t AS term
        FROM documents, UNNEST(string_split(text, ' ')) u(t)
        WHERE u.t <> ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS d FROM toks GROUP BY term),
    nd AS (SELECT COUNT(*) AS nn FROM documents),
    s AS (
        SELECT tf.doc_id, tf.term, tf.n * ln(nd.nn / df.d) AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd
    )
    SELECT doc_id, term, ROUND(score, 6) AS score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM s
    ) WHERE rn <= 3
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """TF-IDF per (doc, term), top-3 terms per doc.

    Shape: explode tokens (narrow) → two hash aggs (tf on (doc,term), df on
    term) → broadcast df + the scalar N onto tf → per-doc top-k window.
    The df table is vocabulary-sized (≪ corpus), so the join broadcasts;
    the only big shuffles are the two aggs, both map-side combined.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("d"))
    nd = docs.agg(F.count("*").alias("nn"))
    s = tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(nd)).select(
        "doc_id", "term", (F.col("n") * F.log(F.col("nn") / F.col("d"))).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("score", 6).alias("score"))
    )
