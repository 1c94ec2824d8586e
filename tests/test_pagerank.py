"""PageRank operator (operators/pagerank.py): local-vs-distributed path
parity and semantics on a hand-built graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.operators import traversal as tr
from code_graph_backend_spark.operators.pagerank import pagerank


def _star_graph(spark):
    # hub 1 <- {2,3,4}; 4 -> 5 chain
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (4, 5)], "src long, dst long"
    ).select("src", "dst", F.lit("T").alias("type"),
             F.lit(None).cast("map<string,string>").alias("props"))
    return nodes, edges


def test_pagerank_hub_ranks_highest(spark):
    nodes, edges = _star_graph(spark)
    r = {row["node"]: row["rank"] for row in pagerank(spark, nodes, edges).collect()}
    assert len(r) == 5
    assert r[1] == max(r.values())          # the hub
    assert r[2] == r[3]                     # symmetric leaves
    assert r[5] < r[1]


def test_pagerank_distributed_path_matches_local(spark, monkeypatch):
    nodes, edges = _star_graph(spark)
    local = sorted(map(tuple, pagerank(spark, nodes, edges).collect()))
    # fresh DataFrame object => fresh memo entry; force the distributed loop
    nodes2, edges2 = _star_graph(spark)
    monkeypatch.setattr(tr, "_LOCAL_EDGE_ROWS", 0)
    dist = sorted(map(tuple, pagerank(spark, nodes2, edges2).collect()))
    assert [n for n, _ in local] == [n for n, _ in dist]
    for (_, a), (_, b) in zip(local, dist):
        assert a == pytest.approx(b, abs=1e-6)


def test_sssp_semantics_and_distributed_parity(spark, monkeypatch):
    """min-plus relaxation on a weighted diamond; distributed loop ==
    local numpy scatter-min."""
    from code_graph_backend_spark.operators.sssp import sssp_bounded

    def edges_df():
        #     1 -2-> 2 -1-> 4 ;  1 -1-> 3 -1-> 4 (cheaper);  4 -1-> 5
        return spark.createDataFrame(
            [(1, 2, 2), (2, 4, 1), (1, 3, 1), (3, 4, 1), (4, 5, 1)],
            "src long, dst long, w long",
        ).select("src", "dst", F.lit("T").alias("type"),
                 F.lit(None).cast("map<string,string>").alias("props"),
                 "w")

    e = edges_df()
    local = {r["node"]: r["dist"] for r in
             sssp_bounded(spark, e, 1, weight=F.col("w"), hops=4).collect()}
    assert local == {1: 0, 2: 2, 3: 1, 4: 2, 5: 3}

    import code_graph_backend_spark.operators.sssp as sssp_mod
    import code_graph_backend_spark.operators.traversal as tr
    monkeypatch.setattr(tr, "_LOCAL_EDGE_ROWS", 0)
    # fresh DF => fresh memo entry; also force the distributed branch
    e2 = edges_df()
    orig = sssp_mod._typed_edges
    monkeypatch.setattr(sssp_mod, "_typed_edges",
                        lambda edges, t: {**orig(edges, t), "n": 10_000_001})
    dist = {r["node"]: r["dist"] for r in
            sssp_bounded(spark, e2, 1, weight=F.col("w"), hops=4).collect()}
    assert dist == local


def test_pagerank_many_nodes_few_edges_goes_distributed(spark, monkeypatch):
    """Few edges but a node count above the local cap must take the
    distributed loop — the local path collects EVERY node id, so its gate
    is the node count, not just the edge count (r3 verdict #3)."""
    import code_graph_backend_spark.operators.pagerank as pr

    nodes, edges = _star_graph(spark)
    monkeypatch.setattr(pr, "_LOCAL_NODE_ROWS", 3)  # 5 nodes > cap: the
    # local branch requires n_total <= cap, so it cannot run; parity with
    # the un-capped run proves the distributed loop computes the same ranks.
    got = {row["node"]: row["rank"] for row in pagerank(spark, nodes, edges).collect()}
    nodes2, edges2 = _star_graph(spark)
    ref = {row["node"]: row["rank"] for row in pagerank(spark, nodes2, edges2).collect()}
    assert set(got) == set(ref) == {1, 2, 3, 4, 5}
    for k in got:
        assert got[k] == pytest.approx(ref[k], abs=1e-6)


def test_triangle_count_k4_and_orientation(spark):
    """K4 has 4 triangles, every node in 3; a dangling pendant node is in
    none. The degree-oriented wedge join must count each triangle exactly
    once per corner (no x2/x6 overcount from the undirected view)."""
    from code_graph_backend_spark.operators.triangles import (
        triangle_count_per_node,
        triangle_count_total,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(4, 9)], "src long, dst long"
    )
    per = {r["node"]: r["n_triangles"] for r in
           triangle_count_per_node(edges).collect()}
    assert per == {1: 3, 2: 3, 3: 3, 4: 3}
    assert triangle_count_total(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_direction_and_dupes_ignored(spark):
    """Reversed/duplicated directed edges collapse into one undirected
    edge; a pure path graph has zero triangles."""
    from code_graph_backend_spark.operators.triangles import (
        triangle_count_per_node,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4)], "src long, dst long"
    )
    assert triangle_count_per_node(edges).count() == 0


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: after 2 synchronous
    rounds each triangle converges to its min node id; determinism under
    re-run."""
    from code_graph_backend_spark.operators.labelprop import label_propagation

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 12]], "id long"
    )
    edges = spark.createDataFrame(
        [(a, b, "T", None) for a, b in tri1 + tri2],
        "src long, dst long, type string, props map<string,string>",
    )
    out = {r["node"]: r["label"] for r in
           label_propagation(spark, nodes, edges, iters=2).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # with a bridge the SYNCHRONOUS update is still exactly defined (it
    # has not settled after 2 rounds — that is the semantics, and the
    # unrolled oracle computes the identical state); pin it
    edges_b = spark.createDataFrame(
        [(a, b, "T", None) for a, b in tri1 + tri2 + [(3, 10)]],
        "src long, dst long, type string, props map<string,string>",
    )
    out_b = {r["node"]: r["label"] for r in
             label_propagation(spark, nodes, edges_b, iters=2).collect()}
    assert out_b == {1: 1, 2: 1, 3: 1, 10: 10, 11: 3, 12: 3}
    again = {r["node"]: r["label"] for r in
             label_propagation(spark, nodes, edges_b, iters=2).collect()}
    assert out_b == again


def test_jaccard_neighbors_exact_small(spark):
    from code_graph_backend_spark.operators.triangles import jaccard_neighbors

    # path 1-2-3 plus 1-3: N(1)={2,3}, N(2)={1,3}, N(3)={1,2}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    out = {(r["i"], r["j"]): r["jac"] for r in jaccard_neighbors(edges).collect()}
    # each pair shares exactly 1 neighbor; |union| = 3
    assert out == {(1, 2): round(1 / 3, 6), (1, 3): round(1 / 3, 6),
                   (2, 3): round(1 / 3, 6)}


def test_funnel_greedy_order_semantics(spark):
    from datetime import datetime

    from code_graph_backend_spark.operators.funnel import funnel_counts

    def ev(u, t, typ):
        return (u, datetime(2024, 1, 1, 0, t), typ)

    rows = [
        # u1 completes in order
        ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase"),
        # u2: purchase BEFORE click -> reaches click only
        ev(2, 1, "view"), ev(2, 2, "purchase"), ev(2, 3, "click"),
        # u3: no view -> not even stage 1
        ev(3, 1, "click"), ev(3, 2, "purchase"),
        # u4: view only
        ev(4, 5, "view"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["stage"]: r["n_users"] for r in
           funnel_counts(events, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_kcore_peels_tails(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle (the
    chain peels over successive rounds)."""
    from code_graph_backend_spark.operators.labelprop import kcore_bounded

    edges = spark.createDataFrame(
        [(1, 2, "T", None), (2, 3, "T", None), (1, 3, "T", None),
         (3, 4, "T", None), (4, 5, "T", None)],
        "src long, dst long, type string, props map<string,string>",
    )
    out = {r["node"]: r["degree"] for r in
           kcore_bounded(spark, edges, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
