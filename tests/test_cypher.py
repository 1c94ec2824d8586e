"""Cypher front-end: the reference's template SHAPES run verbatim against
a PropertyGraph and agree with the typed operators (each test names the
reference template it mirrors, file:line)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.cypher import CypherError, run_cypher
from code_graph_backend_spark.graph.tpch import build_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def g(spark):
    return build_graph(spark, SF)


def test_point_lookup_by_prop(g):
    # api/graph.py:269-276 — MATCH (c:Class) WHERE c.name = $name RETURN c LIMIT 1
    out = run_cypher(
        g, "MATCH (c:Nation) WHERE c.name = $name RETURN c LIMIT 1",
        {"name": "NATION_3"},
    ).collect()
    assert len(out) == 1 and out[0]["c_name"] == "NATION_3"


def test_point_lookup_by_id(g):
    # api/graph.py:278-288 — WHERE ID(c) = $id
    out = run_cypher(
        g, "MATCH (c) WHERE ID(c) = $id RETURN c", {"id": 40000003}
    ).collect()
    assert len(out) == 1 and out[0]["c_id"] == 40000003


def test_map_pattern_lookup(g):
    # api/graph.py:428-466 — MATCH (f:File {path: $path, name: $name, ...})
    out = run_cypher(
        g, "MATCH (n:Nation {name: $name}) RETURN n", {"name": "NATION_7"}
    ).collect()
    assert len(out) == 1 and "Nation" in out[0]["n_labels"]


def test_neighbors_in_list(g, spark):
    # api/graph.py:197-241 — MATCH (n)-[e:R]->(dest) WHERE ID(n) IN $ids
    out = run_cypher(
        g,
        "MATCH (n)-[e:PLACED]->(dest) WHERE ID(n) IN $node_ids RETURN e, dest",
        {"node_ids": [1, 2, 3]},
    )
    rows = out.collect()
    assert rows and all(r["e_type"] == "PLACED" for r in rows)
    from code_graph_backend_spark.operators.neighbors import out_neighbors

    typed = out_neighbors(spark, g.nodes, g.edges, [1, 2, 3], edge_type="PLACED")
    assert sorted(r["dest_id"] for r in rows) == sorted(
        r["id"] for r in typed.collect())


def test_callers_reverse_hop(g):
    # api/graph.py:382-390 — MATCH (caller)-[:CALLS]->(f) WHERE ID(f)=$id
    target = 20000005
    rows = run_cypher(
        g,
        "MATCH (caller)-[:SUPPLIES]->(f) WHERE ID(f) = $id RETURN caller",
        {"id": target},
    ).collect()
    direct = {r["src"] for r in g.edges.filter(
        (F.col("type") == "SUPPLIES") & (F.col("dst") == target)).collect()}
    assert {r["caller_id"] for r in rows} == direct


def test_optional_match_subgraph(g):
    # api/graph.py:173-194 — MATCH (src) OPTIONAL MATCH (src)-[e]->(dest) LIMIT $l
    rows = run_cypher(
        g,
        "MATCH (src) OPTIONAL MATCH (src)-[e]->(dest) RETURN src, e, dest LIMIT $limit",
        {"limit": 50},
    ).collect()
    assert len(rows) == 50


def test_counts(g):
    # api/graph.py:603-607
    n = run_cypher(g, "MATCH (n) RETURN count(n)").collect()[0][0]
    e = run_cypher(g, "MATCH ()-[e]->() RETURN count(e)").collect()[0][0]
    assert n == g.nodes.count() and e == g.edges.count()


def test_anti_join_unreachable(g):
    # api/graph.py:612-628 — MATCH (n:L) WHERE not ()-[:R]->(n) RETURN n
    rows = run_cypher(
        g, "MATCH (n:Part) WHERE NOT ()-[:CONTAINS]->(n) RETURN n"
    ).collect()
    from code_graph_backend_spark.operators.neighbors import unreachable

    typed = unreachable(g.nodes, g.edges, label="Part", edge_type="CONTAINS")
    assert sorted(r["n_id"] for r in rows) == sorted(r["id"] for r in typed.collect())


def test_order_and_prefix(g):
    # git_graph.py:64 ORDER BY; api/graph.py:339 prefix
    rows = run_cypher(
        g,
        "MATCH (n:Region) WHERE n.name STARTS WITH $p RETURN n.name ORDER BY n.name",
        {"p": "A"},
    ).collect()
    names = [r["n_name"] for r in rows]
    assert names == sorted(names) and all(x.startswith("A") for x in names)
    assert names  # AFRICA, AMERICA, ASIA


def test_collect_group(g):
    # api/graph.py:307-313 — (f)-[:DEFINES]->(func) RETURN collect(func)
    rows = run_cypher(
        g,
        "MATCH (o)-[:IN_REGION]->(r:Region) RETURN r.name, collect(o)",
    ).collect()
    by_region = {r["r_name"]: len(r["collect_o"]) for r in rows}
    assert sum(by_region.values()) == 25  # every nation collected once


def test_find_paths_var_length(g, spark):
    # api/graph.py:547-591 — MATCH (src),(dest) WHERE ID(src)=$a AND
    # ID(dest)=$b WITH src, dest MATCH p=(src)-[:CALLS*]->(dest) RETURN p
    out = run_cypher(
        g,
        "MATCH (src), (dest) WHERE ID(src) = $src AND ID(dest) = $dest "
        "WITH src, dest MATCH p=(src)-[:NEXT*]->(dest) RETURN p",
        {"src": 40000002, "dest": 40000009},
    ).collect()
    assert len(out) == 1
    assert out[0]["p_nodes"][0] == 40000002 and out[0]["p_nodes"][-1] == 40000009
    assert out[0]["p_depth"] == 7


def test_param_missing_raises(g):
    with pytest.raises(CypherError, match="missing parameter"):
        run_cypher(g, "MATCH (c) WHERE ID(c) = $id RETURN c").collect()


def test_mutations_rejected(g):
    with pytest.raises(CypherError):
        run_cypher(g, "MERGE (n:File {path: 'x'}) RETURN n")


def test_commit_hash_alias(spark):
    # git_graph.py:87-97 — MATCH (c:Commit {hash: $hash})-[:CHILD]->(child)
    # SURVEY §1.2 maps Commit.hash onto our `name` column; the front-end
    # applies that alias so git templates run verbatim.
    from code_graph_backend_spark.graph.model import (
        EDGES_SCHEMA, NODES_SCHEMA, PropertyGraph,
    )

    nodes = spark.createDataFrame(
        [(i, ["Commit"], f"h{i}", "", None, None, None, None, None, None)
         for i in range(3)],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [(0, 1, "CHILD", None), (1, 2, "CHILD", None)], EDGES_SCHEMA
    )
    gg = PropertyGraph(spark, "cygit", nodes, edges)
    out = gg.cypher(
        "MATCH (c:Commit {hash: $hash})-[:CHILD]->(child) RETURN child",
        {"hash": "h1"},
    ).collect()
    assert len(out) == 1 and out[0]["child_name"] == "h2"
    # and in WHERE position too
    out = gg.cypher(
        "MATCH (c:Commit) WHERE c.hash = $hash RETURN ID(c)", {"hash": "h0"}
    ).collect()
    assert out[0][0] == 0


def test_reverse_direction_edge(g):
    # (child)<-[:IN_REGION]-(n): same rows as the forward form
    fwd = run_cypher(g, "MATCH (n)-[:IN_REGION]->(r:Region) RETURN ID(n), ID(r)")
    rev = run_cypher(g, "MATCH (r:Region)<-[:IN_REGION]-(n) RETURN ID(n), ID(r)")
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


def test_return_distinct(g):
    rows = run_cypher(
        g, "MATCH (n)-[:IN_NATION]->(m) RETURN DISTINCT m.name"
    ).collect()
    names = [r["m_name"] for r in rows]
    assert len(names) == len(set(names)) == 25


def test_parser_never_crashes_on_grammar_samples(g):
    """Generated template variations either compile or raise CypherError —
    never an unhandled exception (the front-end faces user input via
    /chat passthrough)."""
    import itertools

    labels = ["", ":Nation", ":Region:Searchable"]
    props = ["", " {name: 'X'}", " {name: $p}"]
    edges = ["", "-[:IN_REGION]->(m)", "<-[e:IN_NATION]-(m)", "-[e]->(m)"]
    wheres = ["", " WHERE ID(n) = 1", " WHERE n.name STARTS WITH 'A' AND ID(n) IN $ids",
              " WHERE NOT ()-[:PLACED]->(n)",
              " WHERE n.name = 'X' OR n.name <> 'Y'",
              " WHERE (n.name < 'M' OR n.name >= 'T') AND ID(n) IN $ids"]
    rets = ["n", "count(n)", "count(DISTINCT n)", "DISTINCT n.name", "ID(n)"]
    tails = ["", " ORDER BY n.name DESC", " LIMIT 3", " ORDER BY n.name LIMIT 2",
             " ORDER BY n.name SKIP 1 LIMIT 2"]
    params = {"p": "X", "ids": [1, 2]}
    n_ok = 0
    for lbl, pr, ed, wh, re_, tl in itertools.islice(
        itertools.product(labels, props, edges, wheres, rets, tails), 0, None, 19
    ):
        q = f"MATCH (n{lbl}{pr}){ed}{wh} RETURN {re_}{tl}"
        try:
            run_cypher(g, q, params).limit(1).collect()
            n_ok += 1
        except CypherError:
            pass
    assert n_ok >= 25  # most combinations are valid and execute


def test_or_predicate(g):
    out = run_cypher(
        g,
        "MATCH (n:Nation) WHERE n.name = $a OR n.name = $b RETURN n.name"
        " ORDER BY n.name",
        {"a": "NATION_3", "b": "NATION_7"},
    ).collect()
    assert [r[0] for r in out] == ["NATION_3", "NATION_7"]


def test_and_binds_tighter_than_or(g):
    # (name=N3 AND name=N7) OR name=N5  ->  just N5; the wrong grouping
    # N3 AND (N7 OR N5) would return nothing
    out = run_cypher(
        g,
        "MATCH (n:Nation) WHERE n.name = 'NATION_3' AND n.name = 'NATION_7'"
        " OR n.name = 'NATION_5' RETURN n.name",
    ).collect()
    assert [r[0] for r in out] == ["NATION_5"]


def test_comparison_predicates(g):
    ne = run_cypher(
        g, "MATCH (n:Region) WHERE n.name <> 'REGION_0' RETURN n.name"
    ).collect()
    assert "REGION_0" not in {r[0] for r in ne} and len(ne) >= 4
    lt = run_cypher(
        g, "MATCH (n:Nation) WHERE ID(n) IN $ids AND n.name < 'NATION_2'"
           " RETURN n.name ORDER BY n.name",
        {"ids": [40000000 + i for i in range(10)]},
    ).collect()
    assert all(r[0] < "NATION_2" for r in lt) and lt


def test_numeric_comparison_on_edge_prop(g):
    # ad-hoc props live in the props map as strings (CONTAINS pos, the
    # reference's call-site position); a numeric literal forces numeric
    # comparison — '10' < 2 must be false numerically, true as strings
    lo = run_cypher(
        g, "MATCH (o:Order)-[e:CONTAINS]->(p) WHERE e.pos < 3"
           " RETURN count(e) AS n"
    ).collect()[0]["n"]
    hi = run_cypher(
        g, "MATCH (o:Order)-[e:CONTAINS]->(p) WHERE e.pos >= 3"
           " RETURN count(e) AS n"
    ).collect()[0]["n"]
    both = run_cypher(
        g, "MATCH (o:Order)-[e:CONTAINS]->(p) RETURN count(e) AS n"
    ).collect()[0]["n"]
    assert lo > 0 and hi > 0 and lo + hi == both


def test_not_pattern_inside_or_rejected(g):
    with pytest.raises(CypherError):
        run_cypher(
            g,
            "MATCH (n:Part) WHERE NOT ()-[:CONTAINS]->(n) OR n.name = 'x'"
            " RETURN n",
        )


def test_parenthesized_where_groups(g):
    # (A OR B) AND C — without parens, AND-tighter would group differently
    out = run_cypher(
        g,
        "MATCH (n:Nation) WHERE (n.name = 'NATION_3' OR n.name = 'NATION_7')"
        " AND n.name <> 'NATION_7' RETURN n.name",
    ).collect()
    assert [r[0] for r in out] == ["NATION_3"]
    # nested grouping
    out2 = run_cypher(
        g,
        "MATCH (n:Nation) WHERE ((n.name = 'NATION_1')) OR (n.name = 'NATION_2'"
        " AND n.name <> 'NATION_2') RETURN n.name",
    ).collect()
    assert [r[0] for r in out2] == ["NATION_1"]


def test_skip_pagination(g):
    base = run_cypher(
        g, "MATCH (n:Nation) RETURN n.name ORDER BY n.name LIMIT 5"
    ).collect()
    page2 = run_cypher(
        g, "MATCH (n:Nation) RETURN n.name ORDER BY n.name SKIP 2 LIMIT 3"
    ).collect()
    assert [r[0] for r in page2] == [r[0] for r in base[2:5]]


def test_count_distinct(g):
    # many CONTAINS edges, few distinct source orders
    plain = run_cypher(
        g, "MATCH (o:Order)-[e:CONTAINS]->(p) RETURN count(o) AS n"
    ).collect()[0]["n"]
    dist = run_cypher(
        g, "MATCH (o:Order)-[e:CONTAINS]->(p) RETURN count(DISTINCT o) AS n"
    ).collect()[0]["n"]
    assert dist < plain
    from pyspark.sql import functions as FF
    orders_with_edges = (
        g.edges.filter(FF.col("type") == "CONTAINS")
        .select("src").distinct().join(
            g.nodes.filter(FF.array_contains("labels", "Order")).select(
                FF.col("id").alias("src")), "src", "semi")
        .count()
    )
    assert dist == orders_with_edges


def test_numeric_and_ordering_aggregates(g):
    """sum/min/max/avg in RETURN — grouped and global — lower onto one
    hash-agg like count/collect."""
    row = run_cypher(
        g, "MATCH (n:Region) RETURN min(n.name) AS mn, max(n.name) AS mx"
    ).collect()[0]
    names = sorted(r["name"] for r in g.nodes.collect()
                   if "Region" in r["labels"])
    assert (row["mn"], row["mx"]) == (names[0], names[-1])

    rows = run_cypher(
        g,
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name, count(n) AS n_nations, min(n.name) AS first_nation",
    ).collect()
    assert all(r["n_nations"] == 5 for r in rows) and len(rows) == 5

    tot = run_cypher(
        g, "MATCH (r:Region) RETURN sum(r.id) AS s, avg(r.id) AS a"
    ).collect()[0]
    ids = [r["id"] for r in g.nodes.collect() if "Region" in r["labels"]]
    assert tot["s"] == float(sum(ids)) and tot["a"] == sum(ids) / len(ids)


def test_call_fulltext_querynodes_verbatim(g):
    # api/graph.py:342-350 — the auto-complete template VERBATIM,
    # including the wildcard suffix and the WITH re-scope
    out = run_cypher(
        g,
        """
        CALL db.idx.fulltext.queryNodes('Searchable', $prefix)
        YIELD node
        WITH node
        RETURN node
        LIMIT 10
        """,
        {"prefix": "Customer#*"},
    ).collect()
    assert len(out) == 10
    assert all(r["node_name"].startswith("Customer#") for r in out)
    # deterministic: ordered by (name, id) like the typed X3 operator
    names = [r["node_name"] for r in out]
    assert names == sorted(names)


def test_call_algo_pagerank(g):
    # FalkorDB's algo.pageRank procedure shape — lowered onto the same
    # verified kernel as graph_pagerank, restricted to the
    # (label, relationship) subgraph like the real procedure
    out = run_cypher(
        g,
        "CALL algo.pageRank('Nation', 'IN_REGION') YIELD node, score "
        "RETURN node.name, score ORDER BY score DESC LIMIT 5",
    ).collect()
    assert len(out) == 5
    assert all(r["score"] >= 0 for r in out)
    # the label argument must actually restrict the node set
    assert all(r["node_name"].startswith("NATION") for r in out)


def test_call_algo_pagerank_label_restricts(g):
    out = run_cypher(
        g,
        "CALL algo.pageRank('Nation', 'IN_REGION') YIELD node, score "
        "RETURN count(node) AS n",
    ).collect()
    all_nodes = run_cypher(
        g, "CALL algo.pageRank() YIELD node, score RETURN count(node) AS n"
    ).collect()
    assert 0 < out[0]["n"] < all_nodes[0]["n"]


def test_call_after_match_rejected(g):
    with pytest.raises(CypherError):
        run_cypher(
            g,
            "MATCH (n:Nation) CALL algo.wcc() YIELD node, comp RETURN comp",
        )


def test_call_algo_wcc_component_count(g):
    out = run_cypher(
        g,
        "CALL algo.wcc() YIELD node, componentId "
        "RETURN count(DISTINCT componentId) AS n_comp",
    ).collect()
    assert out[0]["n_comp"] >= 1


def test_call_unknown_procedure_rejected(g):
    with pytest.raises(CypherError):
        run_cypher(g, "CALL algo.betweenness() YIELD node, score RETURN score")


def test_with_count_usage_idiom(g):
    # prompts.py:24 — "For counting the usage of a function f use the
    # `WITH f, count(1) AS usage_count` function in your cypher": the
    # LLM-prompt idiom VERBATIM, one WITH-aggregation stage
    rows = run_cypher(
        g,
        "MATCH (f:Part)<-[:SUPPLIES]-(caller) "
        "WITH f, count(1) AS usage_count "
        "RETURN f.name, usage_count ORDER BY usage_count DESC LIMIT 5",
    ).collect()
    assert len(rows) == 5
    counts = [r["usage_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # agrees with the typed computation
    typed = (
        g.edges.filter(F.col("type") == "SUPPLIES")
        .groupBy("dst").count()
        .orderBy(F.col("count").desc())
        .limit(1).collect()
    )
    assert counts[0] == typed[0]["count"]


def test_with_aggregate_then_where_on_alias(g):
    # WHERE after WITH filters the aggregated stage, not the match rows
    rows = run_cypher(
        g,
        "MATCH (f:Part)<-[:SUPPLIES]-(s) "
        "WITH f, count(1) AS uc WHERE uc >= 2 "
        "RETURN f.name, uc",
    ).collect()
    assert rows and all(r["uc"] >= 2 for r in rows)
    expected = (
        g.edges.filter(F.col("type") == "SUPPLIES")
        .groupBy("dst").count().filter(F.col("count") >= 2).count()
    )
    assert len(rows) == expected


def test_with_sum_aggregate_on_edge_prop(g):
    # WITH also carries numeric aggs over properties (props-map coercion)
    rows = run_cypher(
        g,
        "MATCH (c:Customer)-[e:PLACED]->(o) "
        "WITH c, count(e) AS n_orders "
        "RETURN c.name, n_orders ORDER BY n_orders DESC LIMIT 3",
    ).collect()
    assert len(rows) == 3 and rows[0]["n_orders"] >= rows[2]["n_orders"]


def test_keyword_shaped_identifiers_parse(g):
    # a variable named `call` and an alias named `yield` are identifiers,
    # not clause keywords, outside clause-head position
    rows = run_cypher(
        g,
        "MATCH (call:Nation) WHERE call.name = $n RETURN call.name AS yield",
        {"n": "NATION_3"},
    ).collect()
    assert len(rows) == 1 and rows[0]["yield"] == "NATION_3"


def test_keyword_shaped_property_access(g):
    # n.contains — property named like the CONTAINS operator resolves via
    # the props map instead of erroring at parse time
    rows = run_cypher(
        g,
        "MATCH (n:Nation {name: $n}) WHERE n.contains IS NOT NULL RETURN n",
        {"n": "NATION_3"},
    ).collect()
    assert rows == []  # tpch nodes carry no such prop; parse must succeed


def test_call_fulltext_yield_score(g):
    # YIELD node, score — procedure-signature parity; score is the
    # documented nominal length-closeness, monotone-decreasing in the
    # completion length
    rows = run_cypher(
        g,
        "CALL db.idx.fulltext.queryNodes('Searchable', $p) YIELD node, score "
        "RETURN node.name, score LIMIT 10",
        {"p": "Customer#*"},
    ).collect()
    assert rows and all(0 < r["score"] <= 1.0 for r in rows)
    for r in rows:
        assert r["score"] == 1.0 / (1.0 + len(r["node_name"]) - len("Customer#"))


def test_unwind_nodes_of_path(g):
    # prompts.py — "Use UNWIND to expand a list into individual rows when
    # you need to return individual node properties from a path" +
    # "Use nodes(path) to get the list of nodes along a path": the
    # LLM-generated shape over the find_paths template (api/graph.py:564)
    rows = run_cypher(
        g,
        "MATCH (src), (dest) WHERE ID(src) = $a AND ID(dest) = $b "
        "WITH src, dest MATCH p=(src)-[:NEXT*]->(dest) "
        "UNWIND nodes(p) AS n RETURN n.name",
        {"a": 40000002, "b": 40000009},
    ).collect()
    # the single NEXT chain 40000002..40000009 has 8 nodes
    assert len(rows) == 8
    names = {r["n_name"] for r in rows}
    assert {"NATION_2", "NATION_9"} <= names


def test_unwind_nodes_with_count(g):
    rows = run_cypher(
        g,
        "MATCH (src), (dest) WHERE ID(src) = $a AND ID(dest) = $b "
        "WITH src, dest MATCH p=(src)-[:NEXT*]->(dest) "
        "UNWIND nodes(p) AS n RETURN count(n) AS path_len",
        {"a": 40000002, "b": 40000009},
    ).collect()
    assert rows[0]["path_len"] == 8


def test_unwind_without_path_rejected(g):
    with pytest.raises(CypherError):
        run_cypher(g, "MATCH (n:Nation) UNWIND nodes(p) AS x RETURN x")


def test_order_by_with_alias_not_in_return(g):
    # the reference-shaped most-called idiom: ORDER BY a WITH alias that
    # is NOT projected by RETURN — the sort key is carried through the
    # projection and dropped after the sort
    rows = run_cypher(
        g,
        "MATCH ()-[:SUPPLIES]->(f) WITH f, count(1) AS usage_count "
        "RETURN f ORDER BY usage_count DESC LIMIT 10",
    ).collect()
    assert len(rows) == 10
    assert "usage_count" not in rows[0].asDict()
    # ordering agrees with the typed computation
    top = (
        g.edges.filter(F.col("type") == "SUPPLIES").groupBy("dst").count()
        .orderBy(F.col("count").desc()).limit(1).collect()[0]
    )
    assert rows[0]["f_id"] in {
        r["dst"] for r in g.edges.filter(F.col("type") == "SUPPLIES")
        .groupBy("dst").count()
        .filter(F.col("count") == top["count"]).collect()
    }


def test_parser_never_crashes_on_with_unwind_samples(g):
    """Fuzz the round-5 surface: WITH stages (re-scope + aggregation +
    post-WHERE), UNWIND, and keyword-shaped identifiers — compile or
    CypherError, never an unhandled exception."""
    import itertools

    withs = ["", " WITH n", " WITH n, count(1) AS c", " WITH n, count(m) AS c",
             " WITH n, sum(e.pos) AS c", " WITH n, count(1) AS c WHERE c >= 1",
             " WITH call, count(1) AS yield"]
    edges = ["", "-[:IN_REGION]->(m)", "-[e]->(m)"]
    rets = ["n", "count(n)", "n.name, c", "c", "n ORDER BY c DESC LIMIT 2"]
    params = {}
    n_ok = 0
    for wh, ed, re_ in itertools.product(withs, edges, rets):
        q = f"MATCH (n:Nation){ed}{wh} RETURN {re_}"
        try:
            run_cypher(g, q, params).limit(1).collect()
            n_ok += 1
        except CypherError:
            pass
    # UNWIND shapes
    for q in [
        "MATCH (src), (dest) WHERE ID(src) = 40000002 AND ID(dest) = 40000009 "
        "WITH src, dest MATCH p=(src)-[:NEXT*]->(dest) "
        "UNWIND nodes(p) AS n RETURN DISTINCT n.name",
        "MATCH (n) UNWIND nodes(q) AS x RETURN x",
        "UNWIND nodes(p) AS x RETURN x",
    ]:
        try:
            run_cypher(g, q, params).limit(1).collect()
            n_ok += 1
        except CypherError:
            pass
    assert n_ok >= 30


def test_call_fulltext_token_level_prefix(g):
    """RediSearch parity: the query prefix matches ANY whitespace token
    of the name — Part names are multi-token, so a prefix taken from a
    SECOND token of some part name must surface that part."""
    # find a part whose name's second token is unique enough to probe
    parts = [
        r for r in g.nodes.collect()
        if "Part" in r["labels"] and " " in r["name"]
    ]
    target = parts[0]
    second_tok = target["name"].split(" ")[1]
    out = run_cypher(
        g,
        "CALL db.idx.fulltext.queryNodes('Part', $p) YIELD node "
        "RETURN node",
        {"p": second_tok + "*"},
    ).collect()
    names = [r["node_name"] for r in out]
    assert target["name"] in names
    # every hit has SOME token with the prefix (not necessarily the first)
    assert all(
        any(t.startswith(second_tok) for t in n.split(" ")) for n in names
    )


def test_call_algo_scc_chain_has_no_false_merges(g):
    """The Nation NEXT chain is acyclic: algo.scc must never assign two
    nodes one positive sccId — every yield is own-id (provable
    singleton) or -1 (round-budget residual)."""
    out = run_cypher(
        g,
        "CALL algo.scc('Nation', 'NEXT') YIELD node, sccId "
        "RETURN node, sccId",
    ).collect()
    assert len(out) == 25
    pos = {}
    for r in out:
        sid = r["sccId"]
        assert sid == -1 or sid == r["node_id"]
        if sid != -1:
            assert sid not in pos
            pos[sid] = r["node_id"]
