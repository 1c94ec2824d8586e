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
