"""Path-enumeration correctness vs a hand-rolled in-memory oracle
(SURVEY §7 phase 2: 'path-set equality vs NetworkX oracle on small graphs')."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.operators.traversal import chain_payloads, find_paths, reachable


def _edges_df(spark, pairs, edge_type="CALLS"):
    return spark.createDataFrame(
        [(a, b, edge_type, None) for a, b in pairs],
        "src long, dst long, type string, props map<string,string>",
    )


def _all_simple_paths(pairs, src, dst, max_depth):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    out = []

    def dfs(node, path):
        if len(path) - 1 > max_depth:
            return
        if node == dst and len(path) > 1:
            out.append(tuple(path))
            return
        for nxt in adj.get(node, []):
            if nxt not in path:
                dfs(nxt, path + [nxt])

    dfs(src, [src])
    return sorted(out)


DIAMOND = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5), (5, 6)]
CYCLIC = [(1, 2), (2, 3), (3, 1), (2, 4), (3, 4), (4, 2)]


@pytest.mark.parametrize(
    "pairs,src,dst",
    [(DIAMOND, 1, 5), (DIAMOND, 1, 6), (CYCLIC, 1, 4), (CYCLIC, 2, 2)],
)
def test_find_paths_matches_oracle(spark, pairs, src, dst):
    got = find_paths(spark, _edges_df(spark, pairs), src, dst, max_depth=8).collect()
    got_paths = sorted(tuple(r["path"]) for r in got)
    assert got_paths == _all_simple_paths(pairs, src, dst, 8)


def test_find_paths_depth_matches_len(spark):
    got = find_paths(spark, _edges_df(spark, DIAMOND), 1, 5, max_depth=8).collect()
    for r in got:
        assert r["depth"] == len(r["path"]) - 1


def test_reachable_closure(spark):
    got = reachable(spark, _edges_df(spark, CYCLIC), [1], edge_type="CALLS")
    assert {r["id"] for r in got.collect()} == {1, 2, 3, 4}


def test_reachable_terminates_on_cycles(spark):
    ring = [(i, (i + 1) % 50) for i in range(50)]
    got = reachable(spark, _edges_df(spark, ring), [0], edge_type="CALLS")
    assert got.count() == 50


def test_chain_payloads_order(spark):
    chain = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        [(a, b, "PARENT", {"q": f"q{a}"}) for a, b in chain],
        "src long, dst long, type string, props map<string,string>",
    )
    rows = chain_payloads(spark, edges, 0, 6, "PARENT", ["props"]).collect()
    assert [r["hop"] for r in rows] == list(range(6))
    assert [r["props"]["q"] for r in rows] == [f"q{i}" for i in range(6)]
