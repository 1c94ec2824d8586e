"""Round-7 consolidation tests: the ADVICE r6 fixes.

- triangles: the wedge expansion now STREAMS over oriented-edge blocks
  (operators/triangles.py _WEDGE_CHUNK) so a skewed graph under the
  edge-count gate cannot materialize O(m^1.5) wedge arrays at once —
  the chunked path must agree exactly with brute force, including with
  a chunk size far below the wedge count (every block boundary hit).
- ANF memo: the kernel-array memo key must include BOTH g.nodes and
  g.edges — same nodes object + different edges must not serve stale
  edge arrays (registry_ext30._anf_static).
- streaming upsert: the one-row-per-key precondition raises ValueError
  (not a stripped-under-`-O` assert).
"""

from __future__ import annotations

from itertools import combinations
import random

import pytest


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, "rel") for a, b in pairs], "src long, dst long, type string"
    )


def _brute_triangles(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    expect: dict[int, int] = {}
    nodes = {v for e in und for v in e}
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (y, z), (x, z)} <= und:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    return expect


def test_triangles_local_chunked_expansion_matches_brute(spark, monkeypatch):
    """Force _WEDGE_CHUNK far below the graph's wedge count: a hub star
    plus a random ring gives many wedges per oriented block, so every
    chunk boundary (mid-block split avoided by edge-granular chunking,
    accumulation across chunks, empty trailing chunk) is exercised."""
    from code_graph_backend_spark.operators import triangles as T

    rng = random.Random(7)
    n = 40
    pairs = [(0, i) for i in range(1, n)]  # hub: worst-case wedge blowup
    pairs += [(i, (i + 1) % n) for i in range(n)]
    pairs += [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]

    monkeypatch.setattr(T, "_WEDGE_CHUNK", 5)
    got = {
        r["node"]: r["n_triangles"]
        for r in T._triangles_local(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs)


def test_triangles_local_chunk_one_edge_block(spark, monkeypatch):
    """Chunk size 1 — every edge is its own chunk, including edges whose
    own block exceeds the chunk (the max(end, start+1) fallback)."""
    from code_graph_backend_spark.operators import triangles as T

    pairs = [(1, 2), (2, 3), (1, 3), (1, 4), (3, 4), (2, 4), (5, 6)]
    monkeypatch.setattr(T, "_WEDGE_CHUNK", 1)
    got = {
        r["node"]: r["n_triangles"]
        for r in T._triangles_local(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs)


def test_ktruss_full_local_matches_distributed(spark):
    """Measured-size duality for the WHOLE k-truss peel (round 1
    included): the full-local path (cap high) must equal the
    distributed round-1 plan (cap 0) on a random graph, for several
    (k, rounds) settings."""
    from code_graph_backend_spark.operators.ktruss import ktruss_edges

    rng = random.Random(11)
    n = 25
    pairs = list({(a, b) for a, b in (
        (rng.randrange(n), rng.randrange(n)) for _ in range(160)
    ) if a != b})
    e = _edges_df(spark, pairs)
    for k, rounds in [(3, 1), (3, 2), (4, 2), (5, 3)]:
        local = [tuple(r) for r in
                 ktruss_edges(e, k=k, rounds=rounds).collect()]
        dist = [tuple(r) for r in
                ktruss_edges(e, k=k, rounds=rounds, local_caps=0,
                             local_max=0).collect()]
        assert local == dist, (k, rounds)
        mixed = [tuple(r) for r in
                 ktruss_edges(e, k=k, rounds=rounds, local_caps=0).collect()]
        assert local == mixed, (k, rounds)


def test_jaccard_local_matches_distributed_bitwise(spark, monkeypatch):
    """Measured-size duality for neighborhood Jaccard: the local path
    must match the distributed wedge join BIT-EXACTLY, including the
    F.round HALF_UP double semantics (Decimal(repr(x)) is the Python
    twin of BigDecimal.valueOf), across random graphs, min_common
    settings and forced chunk boundaries."""
    from code_graph_backend_spark.operators import triangles as T

    monkeypatch.setattr(T, "_WEDGE_CHUNK", 4)
    rng = random.Random(13)
    for trial in range(3):
        n = 18
        pairs = list({(a, b) for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        ) if a != b})
        e = _edges_df(spark, pairs)
        for mc in (1, 2):
            loc = sorted(
                tuple(r) for r in
                T.jaccard_neighbors(e, min_common=mc).collect()
            )
            dist = sorted(
                tuple(r) for r in
                T.jaccard_neighbors(e, min_common=mc, local_caps=0).collect()
            )
            assert loc == dist, (trial, mc)


def test_anf_memo_distinguishes_edge_sets(spark):
    """Same g.nodes object + DIFFERENT g.edges must produce different ANF
    states (the r6 memo keyed on nodes only and would serve stale edge
    arrays)."""
    from code_graph_backend_spark.graph.model import PropertyGraph
    from code_graph_backend_spark.registry_ext30 import _anf_static

    nodes = spark.createDataFrame(
        [(i, "N", "n%d" % i) for i in range(6)], "id long, label string, name string"
    )
    e1 = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    e2 = _edges_df(spark, [(0, 5), (4, 5)])
    g1 = PropertyGraph(spark, "g1", nodes=nodes, edges=e1)
    g2 = PropertyGraph(spark, "g2", nodes=nodes, edges=e2)
    s1 = _anf_static(spark, g1)
    s2 = _anf_static(spark, g2)
    assert len(s1["snd_s"]) == 6  # 3 und edges, both directions
    assert len(s2["snd_s"]) == 4
    # and the memo hit path returns the SAME object per (nodes, edges)
    assert _anf_static(spark, g1) is s1
    assert _anf_static(spark, g2) is s2


def test_triangles_chunked_property(spark, monkeypatch):
    """Hypothesis sweep: arbitrary small graphs × a forced 3-wedge chunk
    must equal brute force — every chunk-boundary interaction (partial
    blocks, accumulation, single-edge fallback) on random shapes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from code_graph_backend_spark.operators import triangles as T

    monkeypatch.setattr(T, "_WEDGE_CHUNK", 3)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(pairs=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=0, max_size=20, unique=True,
    ))
    def run(pairs):
        pairs = [(a, b) for a, b in pairs if a != b]
        got = {
            r["node"]: r["n_triangles"]
            for r in T._triangles_local(
                spark, _edges_df(spark, pairs)
            ).collect()
        }
        assert got == _brute_triangles(pairs)

    run()


def test_resource_allocation_wedge_cap_guard(spark):
    """The RA kernel enforces its support-pruned-substrate precondition:
    sum(deg^2) above the cap raises instead of silently emitting a
    quadratic wedge join (VERDICT r6 'What's wrong' #3)."""
    from code_graph_backend_spark.registry_ext21 import resource_allocation

    # hub star: deg(hub)=30 -> sum(deg^2) = 900 + 30 = 930
    cooc = spark.createDataFrame(
        [(0, i) for i in range(1, 31)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="support-pruned"):
        resource_allocation(cooc, topk=10, wedge_cap=100)
    # under the cap the same graph computes exact RA: all leaf pairs are
    # non-adjacent with the single common neighbor hub (deg 30)
    rows = resource_allocation(cooc, topk=1000, wedge_cap=10_000).collect()
    assert len(rows) == 30 * 29 // 2
    assert all(r["n_common"] == 1 and r["ra_nano"] == 10**9 // 30 for r in rows)


def test_resource_allocation_matches_brute(spark):
    """Exact parity against a python brute force on a small graph with
    triangles (adjacent pairs excluded) and varied degrees."""
    from code_graph_backend_spark.registry_ext21 import resource_allocation

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5), (5, 6), (1, 6)]
    cooc = spark.createDataFrame(pairs, "src long, dst long")
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if common:
                expect[(x, y)] = (
                    len(common),
                    sum(10**9 // len(adj[z]) for z in common),
                )
    got = {
        (r["x"], r["y"]): (r["n_common"], r["ra_nano"])
        for r in resource_allocation(cooc, topk=1000).collect()
    }
    assert got == expect


def test_streaming_upsert_duplicate_key_raises_valueerror(spark, tmp_path):
    """Without order_col, a multi-row-per-key batch must raise ValueError
    (an explicit raise — survives python -O, unlike assert)."""
    from code_graph_backend_spark.streaming.upsert import StreamingUpsert

    init = spark.createDataFrame([(1, "a")], "id long, name string")
    ups = StreamingUpsert(init, key=("id",))
    batch = spark.createDataFrame([(2, "x"), (2, "y")], "id long, name string")
    with pytest.raises(ValueError, match="multiple rows per key"):
        ups.apply_batch(batch)
    # with order_col the same batch resolves last-writer-wins
    ups2 = StreamingUpsert(init, key=("id",), order_col="name")
    ups2.apply_batch(batch)
    rows = {r["id"]: r["name"] for r in ups2.state.collect()}
    assert rows == {1: "a", 2: "y"}
