"""Query registry: every SURVEY.md §2 operator as a (Spark callable, DuckDB
oracle SQL) pair, exercised on the driver's TPC-H-ish tables via the graph
twin (graph/tpch.py). `__spark_entry__.py` re-exports these.

Conventions for oracle comparability (the driver hashes values with columns
sorted by name, order-insensitive rows):
- every computed column is aliased identically on both sides;
- LIMIT always follows a total ORDER BY on a unique key;
- float sums go through exact DECIMAL accumulation (aggregates.dec_sum) —
  order-independent, so partitioning cannot change the result;
- counts are BIGINT on both sides (DuckDB SUM(int) is HUGEINT → cast).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from .graph.tpch import SQL_EDGES, SQL_NODES, build_graph
from .mutations.delete import cascade_delete
from .mutations.merge import merge_nodes, set_props_by_id
from .operators.aggregates import dec_sum
from .operators.lookups import by_ids, by_label, point_by_name
from .operators.neighbors import in_neighbors, out_neighbors, sub_graph, two_hop, unreachable
from .operators.rangejoin import range_join_binned
from .operators.search import auto_complete, build_prefix_table
from .operators.traversal import chain_payloads, find_paths, reachable
from .session import read_table
from .sources.lcov import propagate_full_coverage

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
# approximate-by-design queries (no SQL oracle; driver records rows-only)
# -> the registered EXACT query that replays the same machinery with the
# approximation disabled and IS hash-graded (VERDICT r7 item 7: the
# waiver is machine-readable, not prose)
ORACLE_TWIN: dict[str, str] = {}


def register(name: str, oracle: str | None = None, oracle_twin: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if oracle_twin is not None:
            ORACLE_TWIN[name] = oracle_twin
            fn.oracle_twin = oracle_twin
        return fn

    return deco


def _graph(spark, sf_dir):
    g = build_graph(spark, sf_dir)
    return g.nodes, g.edges


def _label(col="labels"):
    return F.element_at(F.col(col), 1).alias("label")


_GRAPH_CTE = f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES})"


# ---------------------------------------------------------------------------
# Flagship (entry): revenue rollup across the full star join — broadcast dims
# feeding one shuffle agg; the "repo stats dashboard" of the twin graph.
# ---------------------------------------------------------------------------

@register(
    "flagship_region_revenue",
    f"""
    SELECT r_name AS region, CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def flagship_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    dims = broadcast(
        customer.join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2 — graph stats (reference api/graph.py:603-607)
# ---------------------------------------------------------------------------

@register(
    "a1_a2_graph_stats",
    f"""
    {_GRAPH_CTE}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS node_count,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS edge_count
    """,
)
def a1_a2_graph_stats(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return nodes.agg(F.count("*").alias("node_count")).crossJoin(
        edges.agg(F.count("*").alias("edge_count"))
    )


# ---------------------------------------------------------------------------
# P1-P4 — point lookups (reference api/graph.py:269-288,428-466,219-223)
# ---------------------------------------------------------------------------

@register(
    "p1_point_lookup_by_name",
    f"""
    {_GRAPH_CTE}
    SELECT id, name, path FROM nodes
    WHERE label = 'Customer' AND name = 'Customer#000000042'
    ORDER BY id LIMIT 1
    """,
)
def p1_point_lookup_by_name(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return point_by_name(nodes, "Customer", "Customer#000000042").select("id", "name", "path")


@register(
    "p2_point_lookup_by_id",
    f"{_GRAPH_CTE} SELECT id, label, name FROM nodes WHERE id = 20000042",
)
def p2_point_lookup_by_id(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return nodes.filter(F.col("id") == 20000042).select("id", _label(), "name")


@register(
    "p3_composite_key_lookup",
    f"""
    {_GRAPH_CTE}
    SELECT id, name, path FROM nodes
    WHERE label = 'Part' AND path = 'Brand#17' AND name = 'red widget'
    """,
)
def p3_composite_key_lookup(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return (
        by_label(nodes, "Part")
        .filter((F.col("path") == "Brand#17") & (F.col("name") == "red widget"))
        .select("id", "name", "path")
    )


@register(
    "p4_in_list_lookup",
    f"""
    {_GRAPH_CTE}
    SELECT id, label, name FROM nodes
    WHERE id IN (1, 30000005, 20000007, 40000003)
    """,
)
def p4_in_list_lookup(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return by_ids(nodes, [1, 30000005, 20000007, 40000003]).select("id", _label(), "name")


# ---------------------------------------------------------------------------
# J1-J5 — hop joins (reference api/graph.py:197-241,382-390,173-194,307-313)
# ---------------------------------------------------------------------------

@register(
    "j1_out_neighbors",
    f"""
    {_GRAPH_CTE}
    SELECT e.src AS src_id, e.type AS edge_type, n.id, n.name
    FROM edges e JOIN nodes n ON e.dst = n.id
    WHERE e.src IN (1, 2, 3) AND e.type = 'PLACED'
    """,
)
def j1_out_neighbors(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return out_neighbors(spark, nodes, edges, [1, 2, 3], edge_type="PLACED").select(
        "src_id", "edge_type", "id", "name"
    )


@register(
    "j2_in_neighbors",
    f"""
    {_GRAPH_CTE}
    SELECT e.dst AS dst_id, e.type AS edge_type, n.id, n.name
    FROM edges e JOIN nodes n ON e.src = n.id
    WHERE e.dst = 20000005 AND e.type = 'SUPPLIES'
    """,
)
def j2_in_neighbors(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return in_neighbors(spark, nodes, edges, [20000005], edge_type="SUPPLIES").select(
        "dst_id", "edge_type", "id", "name"
    )


@register(
    "j4_subgraph_sample",
    f"""
    {_GRAPH_CTE}
    , s AS (SELECT * FROM nodes ORDER BY id LIMIT 20)
    SELECT s.id AS src_id, s.name AS src_name, e.type AS edge_type,
           d.id AS dst_id, d.name AS dst_name
    FROM s LEFT JOIN edges e ON s.id = e.src LEFT JOIN nodes d ON e.dst = d.id
    """,
)
def j4_subgraph_sample(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return sub_graph(nodes, edges, limit=20)


@register(
    "j5_two_hop_pattern",
    f"""
    SELECT o_custkey AS a_id,
           o_orderkey + 10000000 AS b_id,
           l_partkey + 20000000 AS c_id
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey IN (1, 2, 3)
    """,
)
def j5_two_hop_pattern(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    return two_hop(None, edges, "PLACED", "CONTAINS").filter(F.col("a_id").isin([1, 2, 3]))


# ---------------------------------------------------------------------------
# J6/J7 — variable-length traversal (reference api/graph.py:547-591,408-426)
# Oracle: genuine recursive CTEs in DuckDB.
# ---------------------------------------------------------------------------

@register(
    "j6_find_paths",
    f"""
    WITH RECURSIVE edges AS ({SQL_EDGES}),
    p(head, path_str, depth) AS (
        SELECT CAST(40000002 AS BIGINT), '40000002', 0
        UNION ALL
        SELECT e.dst, p.path_str || '->' || e.dst, p.depth + 1
        FROM p JOIN edges e ON e.src = p.head AND e.type = 'NEXT'
        WHERE p.head <> 40000009
    )
    SELECT path_str, CAST(depth AS INT) AS depth FROM p WHERE head = 40000009
    """,
)
def j6_find_paths(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    paths = find_paths(spark, edges, 40000002, 40000009, edge_type="NEXT", max_depth=12)
    return paths.select(
        F.concat_ws("->", F.transform("path", lambda x: x.cast("string"))).alias("path_str"),
        F.col("depth").cast("int").alias("depth"),
    )


@register(
    "j7_reachable_closure",
    f"""
    WITH RECURSIVE edges AS ({SQL_EDGES}),
    r(id) AS (
        SELECT CAST(7 AS BIGINT)
        UNION
        SELECT e.dst FROM r JOIN edges e ON e.src = r.id
    )
    SELECT id FROM r
    """,
)
def j7_reachable_closure(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    return reachable(spark, edges, [7], edge_type=None)


# ---------------------------------------------------------------------------
# J10 — anti-join: unreachable entities (reference api/graph.py:612-628)
# ---------------------------------------------------------------------------

@register(
    "j10_unreachable_parts",
    """
    SELECT p_partkey + 20000000 AS id, p_name AS name
    FROM part ANTI JOIN lineitem ON p_partkey = l_partkey
    """,
)
def j10_unreachable_parts(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return unreachable(nodes, edges, label="Part", edge_type="CONTAINS").select("id", "name")


# ---------------------------------------------------------------------------
# J12/A6 — binned range join + coverage ratio (reference lcov.py:175-209)
# ---------------------------------------------------------------------------

@register(
    "j12_range_join_coverage",
    """
    WITH pts AS (SELECT CAST(l_quantity AS INT) AS line FROM lineitem WHERE l_orderkey <= 500),
         iv AS (SELECT p_partkey, p_size AS lo, p_size + 4 AS hi FROM part WHERE p_partkey < 100)
    SELECT p_partkey, CAST(COUNT(*) AS BIGINT) AS hits,
           CAST(COUNT(*) AS DOUBLE) / 5.0 AS cov
    FROM pts JOIN iv ON line BETWEEN lo AND hi
    GROUP BY p_partkey
    """,
)
def j12_range_join_coverage(spark, sf_dir):
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    pts = lineitem.filter(F.col("l_orderkey") <= 500).select(
        F.col("l_quantity").cast("int").alias("line")
    )
    iv = part.filter(F.col("p_partkey") < 100).select(
        "p_partkey", F.col("p_size").alias("lo"), (F.col("p_size") + 4).alias("hi")
    )
    return (
        range_join_binned(pts, "line", iv, "lo", "hi", bin_width=8)
        .groupBy("p_partkey")
        .agg(
            F.count("*").alias("hits"),
            (F.count("*").cast("double") / 5.0).alias("cov"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — collect per group (reference api/graph.py:310,376,386)
# ---------------------------------------------------------------------------

@register(
    "a3_collect_parts_per_order",
    """
    SELECT o_orderkey,
           array_to_string(list_sort(list(CAST(l_partkey AS VARCHAR))), ',') AS part_list
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey IN (1, 2, 3, 4, 5)
    GROUP BY o_orderkey
    """,
)
def a3_collect_parts_per_order(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        orders.filter(F.col("o_custkey").isin([1, 2, 3, 4, 5]))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_partkey").cast("string"))), ","
            ).alias("part_list")
        )
    )


# ---------------------------------------------------------------------------
# O1/O4 — sorts & top-k (reference git_graph.py:64, api/graph.py:344-350)
# ---------------------------------------------------------------------------

@register(
    "o1_commit_list_ordering",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS INT) AS rank
    FROM orders WHERE o_custkey = 7
    """,
)
def o1_commit_list_ordering(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") == 7)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )


@register(
    "o4_topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o4_topk_orders(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# X3 — prefix search (reference api/graph.py:324-357)
# ---------------------------------------------------------------------------

@register(
    "x3_auto_complete",
    f"""
    {_GRAPH_CTE}
    SELECT id, name FROM nodes
    WHERE name LIKE 'Supplier#00000000%'
    ORDER BY name, id LIMIT 10
    """,
)
def x3_auto_complete(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    return auto_complete(nodes, "Supplier#00000000", limit=10).select("id", "name")


# ---------------------------------------------------------------------------
# F6/F7 — scalar string/JSON functions (reference api/graph.py:402, git_utils.py:166)
# ---------------------------------------------------------------------------

@register(
    "f6_string_parsing",
    """
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS adjective,
           string_split(p_name, ' ')[-1] AS noun,
           CAST(regexp_extract(p_brand, '[0-9]+') AS INT) AS brand_num
    FROM part WHERE p_partkey < 50
    """,
)
def f6_string_parsing(spark, sf_dir):
    part = read_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") < 50).select(
        "p_partkey",
        F.substring_index("p_name", " ", 1).alias("adjective"),
        F.substring_index("p_name", " ", -1).alias("noun"),
        F.regexp_extract("p_brand", "[0-9]+", 0).cast("int").alias("brand_num"),
    )


@register(
    "f7_json_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
    FROM events GROUP BY event_type
    """,
)
def f7_json_props(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("k_sum")
    )


# ---------------------------------------------------------------------------
# M1 — MERGE upsert semantics (reference api/graph.py:243-267)
# ---------------------------------------------------------------------------

@register(
    "m1_merge_upsert",
    f"""
    WITH nodes AS ({SQL_NODES}),
    batch AS (
        SELECT c_custkey AS id, 'Customer#upd-' || c_custkey AS name
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT 60000000 + i, 'New#' || i FROM generate_series(0, 99) t(i)
    ),
    merged AS (
        SELECT COALESCE(b.id, n.id) AS id, COALESCE(b.name, n.name) AS name
        FROM nodes n FULL OUTER JOIN batch b ON n.id = b.id
    )
    SELECT id, name FROM merged WHERE id < 50 OR id >= 60000000
    """,
)
def m1_merge_upsert(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    updates = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            F.concat(F.lit("Customer#upd-"), F.col("c_custkey")).alias("name"),
        )
    )
    inserts = spark.range(0, 100).select(
        (F.col("id") + 60000000).alias("id"),
        F.concat(F.lit("New#"), F.col("id")).alias("name"),
    )
    batch = updates.unionByName(inserts)
    # widen batch to node schema (absent fields null → keep existing on match)
    batch_full = batch.select(
        "id",
        F.lit(None).cast("array<string>").alias("labels"),
        "name",
        *[F.lit(None).cast(t).alias(c) for c, t in [
            ("path", "string"), ("ext", "string"), ("src_start", "int"),
            ("src_end", "int"), ("doc", "string"),
            ("props", "map<string,string>"), ("coverage", "double"),
        ]],
    )
    merged = merge_nodes(nodes, batch_full, key=("id",))
    return merged.filter((F.col("id") < 50) | (F.col("id") >= 60000000)).select("id", "name")


# ---------------------------------------------------------------------------
# M5/J7 — cascade delete (reference api/graph.py:408-426)
# ---------------------------------------------------------------------------

@register(
    "m5_cascade_delete",
    f"""
    WITH RECURSIVE nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),
    r(id) AS (
        SELECT CAST(3 AS BIGINT)
        UNION
        SELECT e.dst FROM r JOIN edges e ON e.src = r.id
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS remaining
    FROM nodes WHERE id NOT IN (SELECT id FROM r)
    GROUP BY label
    """,
)
def m5_cascade_delete(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    nodes2, _ = cascade_delete(spark, nodes, edges, [3], edge_type=None)
    return nodes2.groupBy(_label()).agg(F.count("*").alias("remaining"))


# ---------------------------------------------------------------------------
# J3 — 1-hop out, fixed type: callees twin (reference api/graph.py:372-380)
# ---------------------------------------------------------------------------

@register(
    "j3_callees",
    f"""
    {_GRAPH_CTE}
    SELECT n.id, n.name FROM edges e JOIN nodes n ON n.id = e.dst
    WHERE e.src = 10000001 AND e.type = 'CONTAINS'
    """,
)
def j3_callees(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    return out_neighbors(spark, nodes, edges, [10000001], edge_type="CONTAINS").select(
        "id", "name"
    )


# ---------------------------------------------------------------------------
# J8/A4 — linear chain walk collecting hops in path order
# (reference git_graph.py:144-177)
# ---------------------------------------------------------------------------

@register(
    "j8_chain_payloads",
    f"""
    WITH RECURSIVE edges AS ({SQL_EDGES}),
    walk(hop, src, dst) AS (
        SELECT 0, e.src, e.dst FROM edges e
        WHERE e.src = 40000003 AND e.type = 'NEXT'
        UNION ALL
        SELECT w.hop + 1, e.src, e.dst
        FROM walk w JOIN edges e ON e.src = w.dst AND e.type = 'NEXT'
        WHERE w.dst <> 40000015
    )
    SELECT CAST(hop AS INT) AS hop, src, dst FROM walk
    """,
)
def j8_chain_payloads(spark, sf_dir):
    _, edges = _graph(spark, sf_dir)
    return chain_payloads(
        spark, edges, 40000003, 40000015, "NEXT", payload_cols=[], max_depth=32
    )


# ---------------------------------------------------------------------------
# P5 — null predicate on edge properties (reference git_graph.py:152-171)
# ---------------------------------------------------------------------------

@register(
    "p5_null_predicate",
    """
    SELECT 'CONTAINS' AS type, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
    """,
)
def p5_null_predicate(spark, sf_dir):
    # only CONTAINS edges carry props (pos) in the twin graph, so filtering
    # `props IS NOT NULL` must yield exactly the lineitem count
    _, edges = _graph(spark, sf_dir)
    return (
        edges.filter(F.col("props").isNotNull())
        .groupBy("type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# F4 — UNWIND range(0,size) + list indexing (reference api/graph.py:295-297)
# ---------------------------------------------------------------------------

@register(
    "f4_unwind_indexed",
    """
    WITH t AS (
        SELECT p_partkey, string_split(p_name, ' ') AS toks
        FROM part WHERE p_partkey < 10
    )
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos, toks[i] AS token
    FROM t, UNNEST(generate_series(1, len(toks))) u(i)
    """,
)
def f4_unwind_indexed(spark, sf_dir):
    part = read_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") < 10)
        .select("p_partkey", F.posexplode(F.split("p_name", " ")))
        .select("p_partkey", F.col("pos").cast("int").alias("pos"), F.col("col").alias("token"))
    )


# ---------------------------------------------------------------------------
# A4 — ORDER-PRESERVING collect (reference git_graph.py:154,172: payloads
# gathered along the path in hop order)
# ---------------------------------------------------------------------------

@register(
    "a4_ordered_collect",
    """
    SELECT o_orderkey,
           array_to_string(list(CAST(l_partkey AS VARCHAR) ORDER BY l_linenumber, l_partkey), ',')
               AS parts_in_order
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey IN (1, 2, 3)
    GROUP BY o_orderkey
    """,
)
def a4_ordered_collect(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        orders.filter(F.col("o_custkey").isin([1, 2, 3]))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("l_linenumber", "l_partkey"))
                    ),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("parts_in_order")
        )
    )


# ---------------------------------------------------------------------------
# X2 — explicit prefix-index table (reference api/graph.py:59-62 full-text
# index; our derived search table variant)
# ---------------------------------------------------------------------------

@register(
    "x2_prefix_table",
    f"""
    {_GRAPH_CTE}
    , s AS (SELECT id, name FROM nodes WHERE label = 'Supplier' AND id <= 30000005)
    SELECT substring(name, 1, i) AS prefix, id, name
    FROM s, UNNEST(generate_series(1, LEAST(length(name), 8))) u(i)
    """,
)
def x2_prefix_table(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    subset = nodes.filter(
        F.array_contains("labels", "Supplier") & (F.col("id") <= 30000005)
    )
    return build_prefix_table(subset, max_len=8)


# ---------------------------------------------------------------------------
# M3 — bulk `SET n += props` by id list (reference api/graph.py:291-304)
# ---------------------------------------------------------------------------

@register(
    "m3_bulk_props",
    f"""
    {_GRAPH_CTE}
    SELECT id, name, CASE WHEN id IN (1, 2, 3) THEN 'gold' END AS tier
    FROM nodes WHERE id <= 10
    """,
)
def m3_bulk_props(spark, sf_dir):
    nodes, _ = _graph(spark, sf_dir)
    updates = spark.createDataFrame(
        [(i, {"tier": "gold"}) for i in (1, 2, 3)], "id long, props map<string,string>"
    )
    return (
        set_props_by_id(nodes, updates)
        .filter(F.col("id") <= 10)
        .select("id", "name", F.col("props").getItem("tier").alias("tier"))
    )


# ---------------------------------------------------------------------------
# M4 — conditional propagating update (reference api/graph.py:470-480)
# ---------------------------------------------------------------------------

@register(
    "m4_propagate_coverage",
    """
    SELECT DISTINCT l_partkey + 20000000 AS id, 1.0 AS coverage
    FROM lineitem WHERE l_orderkey IN (1, 2, 3)
    """,
)
def m4_propagate_coverage(spark, sf_dir):
    nodes, edges = _graph(spark, sf_dir)
    seeded = nodes.withColumn(
        "coverage",
        F.when(F.col("id").isin([10000001, 10000002, 10000003]), 1.0).otherwise(
            F.col("coverage")
        ),
    )
    out = propagate_full_coverage(seeded, edges, label="Order", edge_type="CONTAINS")
    return (
        out.filter(F.array_contains("labels", "Part") & (F.col("coverage") == 1.0))
        .select("id", "coverage")
    )


# ---------------------------------------------------------------------------
# M7 — op-log replay (reference api/graph.py:540-545, git_utils.py:260-333)
# ---------------------------------------------------------------------------

@register(
    "m7_oplog_replay",
    f"""
    WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),
    after_nodes AS (
        SELECT id, label FROM nodes WHERE id NOT BETWEEN 40000020 AND 40000024
        UNION ALL SELECT 70000000 + i, 'Tag' FROM generate_series(0, 9) t(i)
    ),
    after_edges AS (
        SELECT * FROM edges
        WHERE NOT (src BETWEEN 40000020 AND 40000024 OR dst BETWEEN 40000020 AND 40000024)
          AND NOT (src = 40000010 AND dst = 40000011 AND type = 'NEXT')
    )
    SELECT kind, n FROM (
        SELECT label AS kind, CAST(COUNT(*) AS BIGINT) AS n
        FROM after_nodes GROUP BY label
        UNION ALL
        SELECT '_edges', CAST(COUNT(*) AS BIGINT) FROM after_edges
    ) t
    """,
)
def m7_oplog_replay(spark, sf_dir):
    from .graph.model import PropertyGraph
    from .mutations.oplog import OpLog

    nodes, edges = _graph(spark, sf_dir)
    olog = OpLog()
    olog.record(
        "c0", "c1", "merge_nodes",
        {"rows": [
            {"id": 70000000 + i, "labels": ["Tag", "Searchable"], "name": f"tag-{i}"}
            for i in range(10)
        ]},
    )
    olog.record(
        "c0", "c1", "delete_edges",
        {"rows": [{"src": 40000010, "dst": 40000011, "type": "NEXT"}]},
    )
    olog.record("c0", "c1", "delete_cascade", {"ids": [40000020], "edge_type": "NEXT"})
    g = olog.replay_path(PropertyGraph(spark, "m7_tmp", nodes, edges), ["c0", "c1"])
    return (
        g.nodes.groupBy(_label("labels")).agg(F.count("*").alias("n"))
        .select(F.col("label").alias("kind"), "n")
        .unionByName(
            g.edges.agg(F.count("*").alias("n")).select(F.lit("_edges").alias("kind"), "n")
        )
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)


def oracle_twins() -> dict[str, str]:
    """For each no-oracle (approximate-by-design) query: the registered
    exact twin whose green hash-graded row vouches for the shared
    machinery. Also set as `.oracle_twin` on the query callables."""
    return dict(ORACLE_TWIN)
