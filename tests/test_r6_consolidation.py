"""Round-6 consolidation: force-execute the distributed branches of the
three kernels whose at-scale path had never run (landmarks / stress /
walks — VERDICT r5 item 4), pin the landmark zero-edge degenerate input
(ADVICE r5), and cover StreamingUpsert's intra-batch duplicate-key
handling (ADVICE r5). Pattern follows test_ext18_ops.TestBoruvkaMSF:
local_caps=(0, 0) / monkeypatched gate constant, assert distributed
rows == local rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _graph(spark):
    """12-node directed graph with a cycle, a branch, and an isolate."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 13)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 6), (6, 7), (3, 7),
         (7, 8), (8, 9), (9, 10), (10, 11)],
        "src long, dst long",
    )
    return nodes, edges


class TestLandmarkDistancesDistributed:
    def test_local_and_distributed_paths_agree(self, spark):
        from code_graph_backend_spark.operators.landmarks import (
            landmark_distances,
        )

        nodes, edges = _graph(spark)
        loc = sorted(
            tuple(r) for r in landmark_distances(
                nodes, edges, n_landmarks=3, hops=3
            ).collect()
        )
        dist = sorted(
            tuple(r) for r in landmark_distances(
                nodes, edges, n_landmarks=3, hops=3, local_caps=(0, 0)
            ).collect()
        )
        assert loc == dist and len(loc) > 0

    def test_zero_edge_graph_self_rows(self, spark):
        """Nodes but NO edges: the local path must not IndexError on the
        empty endpoint domain (ADVICE r5) and must emit exactly the
        (landmark, landmark, 0) self rows, same as the distributed
        branch."""
        from code_graph_backend_spark.operators.landmarks import (
            landmark_distances,
        )

        nodes = spark.createDataFrame([(i,) for i in [3, 1, 7, 5]], "id long")
        edges = spark.createDataFrame([], "src long, dst long")
        loc = sorted(
            tuple(r) for r in landmark_distances(
                nodes, edges, n_landmarks=3, hops=2
            ).collect()
        )
        assert loc == [(1, 1, 0), (3, 3, 0), (5, 5, 0)]
        dist = sorted(
            tuple(r) for r in landmark_distances(
                nodes, edges, n_landmarks=3, hops=2, local_caps=(0, 0)
            ).collect()
        )
        assert dist == loc


class TestLandmarkStressDistributed:
    @pytest.mark.parametrize("by", ["degree", "id"])
    def test_local_and_distributed_paths_agree(self, spark, by):
        from code_graph_backend_spark.operators.stress import landmark_stress

        nodes, edges = _graph(spark)
        loc = sorted(
            tuple(r) for r in landmark_stress(
                nodes, edges, n_landmarks=4, hops=3, landmark_by=by
            ).collect()
        )
        dist = sorted(
            tuple(r) for r in landmark_stress(
                nodes, edges, n_landmarks=4, hops=3, landmark_by=by,
                local_caps=(0, 0),
            ).collect()
        )
        assert loc == dist and len(loc) > 0


class TestRandomWalksDistributed:
    def test_broadcast_and_shuffle_branches_agree(self, spark, monkeypatch):
        """Forcing _BROADCAST_FRONTIER_CAP=0 routes every step through
        the shuffle-join branch; md5 choice is engine-deterministic so
        the walk corpus must be row-identical."""
        from code_graph_backend_spark.operators import walks as walks_mod

        nodes, edges = _graph(spark)
        base = sorted(
            tuple(r) for r in walks_mod.random_walks(
                nodes, edges, walk_len=5, seed_mod=3
            ).collect()
        )
        monkeypatch.setattr(walks_mod, "_BROADCAST_FRONTIER_CAP", 0)
        forced = sorted(
            tuple(r) for r in walks_mod.random_walks(
                nodes, edges, walk_len=5, seed_mod=3
            ).collect()
        )
        assert base == forced and len(base) > 0


SCHEMA = "id long, name string, props map<string,string>"


class TestStreamingUpsertBatchDedupe:
    def test_order_col_last_writer_wins(self, spark):
        """A micro-batch with two updates to the same id keeps only the
        highest-seq row — the state a sequential row-at-a-time MERGE
        replay would settle on."""
        from code_graph_backend_spark.streaming.upsert import StreamingUpsert

        seq_schema = SCHEMA + ", seq long"
        initial = spark.createDataFrame([(1, "old", {"a": "0"}, 0)], seq_schema)
        ups = StreamingUpsert(initial, key=("id",), order_col="seq")
        batch = spark.createDataFrame(
            [(1, "mid", {"b": "1"}, 1), (1, "new", {"c": "2"}, 2),
             (2, "x", None, 1)],
            seq_schema,
        )
        ups.apply_batch(batch)
        got = {r["id"]: r for r in ups.state.collect()}
        assert set(got) == {1, 2}
        assert got[1]["name"] == "new" and got[1]["seq"] == 2
        # props map-merge is vs the prior STATE, not across batch dupes
        assert got[1]["props"] == {"a": "0", "c": "2"}

    def test_duplicate_keys_without_order_col_assert(self, spark):
        from code_graph_backend_spark.streaming.upsert import StreamingUpsert

        initial = spark.createDataFrame([], SCHEMA)
        ups = StreamingUpsert(initial, key=("id",))
        dup = spark.createDataFrame(
            [(1, "a", None), (1, "b", None)], SCHEMA
        )
        # r7: ValueError, not assert — the check must survive python -O
        with pytest.raises(ValueError, match="multiple rows per key"):
            ups.apply_batch(dup)

    def test_unique_keys_without_order_col_pass(self, spark):
        from code_graph_backend_spark.streaming.upsert import StreamingUpsert

        initial = spark.createDataFrame([], SCHEMA)
        ups = StreamingUpsert(initial, key=("id",))
        ups.apply_batch(
            spark.createDataFrame([(1, "a", None), (2, "b", None)], SCHEMA)
        )
        assert ups.state.count() == 2


class TestKcoreWccDistributed:
    """The kcore_bounded / wcc_bounded / core-decomposition gates were
    inline literals — the same never-executed-at-scale-branch class as
    landmarks/stress/walks. Caps are now module constants; cap 0 forces
    the distributed recurrences and pins them to the local kernels."""

    def test_kcore_distributed_matches_local(self, spark, monkeypatch):
        import code_graph_backend_spark.operators.labelprop as lp

        nodes, edges = _graph(spark)
        loc = sorted(
            tuple(r) for r in lp.kcore_bounded(spark, edges, k=2).collect()
        )
        monkeypatch.setattr(lp, "_LOCAL_E_CAP", 0)
        dist = sorted(
            tuple(r) for r in lp.kcore_bounded(spark, edges, k=2).collect()
        )
        assert loc == dist and len(loc) > 0

    def test_wcc_distributed_matches_local(self, spark, monkeypatch):
        import code_graph_backend_spark.operators.labelprop as lp

        nodes, edges = _graph(spark)
        loc = sorted(
            tuple(r) for r in lp.wcc_bounded(spark, nodes, edges).collect()
        )
        monkeypatch.setattr(lp, "_LOCAL_N_CAP", 0)
        monkeypatch.setattr(lp, "_LOCAL_E_CAP", 0)
        dist = sorted(
            tuple(r) for r in lp.wcc_bounded(spark, nodes, edges).collect()
        )
        assert loc == dist and len(loc) > 0

    def test_core_decomposition_distributed_matches_local(
        self, spark, monkeypatch
    ):
        import code_graph_backend_spark.registry_ext26 as ext26

        sf = "/root/testdata/sf0.001"
        loc = sorted(
            tuple(r)
            for r in ext26.graph_core_decomposition_q(spark, sf).collect()
        )
        monkeypatch.setattr(ext26, "_CORE_LOCAL_E_CAP", 0)
        dist = sorted(
            tuple(r)
            for r in ext26.graph_core_decomposition_q(spark, sf).collect()
        )
        assert loc == dist and len(loc) > 0


class TestTrianglesDistributed:
    def test_local_and_distributed_paths_agree(self, spark):
        from code_graph_backend_spark.operators.triangles import (
            triangle_count_per_node,
        )

        nodes, edges = _graph(spark)
        # add closing edges so triangles exist: 1-3 closes (1,2,3);
        # 5-7 closes (5,6,7)
        extra = spark.createDataFrame(
            [(3, 1), (5, 7)], "src long, dst long"
        )
        e = edges.unionByName(extra)
        loc = sorted(
            tuple(r) for r in triangle_count_per_node(e).collect()
        )
        dist = sorted(
            tuple(r)
            for r in triangle_count_per_node(e, local_caps=0).collect()
        )
        assert loc == dist and len(loc) > 0

    def test_zero_and_no_triangle_graphs(self, spark):
        from code_graph_backend_spark.operators.triangles import (
            triangle_count_per_node,
        )

        nodes, edges = _graph(spark)  # the base graph has no triangle
        for e in (edges, spark.createDataFrame([], "src long, dst long")):
            loc = triangle_count_per_node(e).collect()
            dist = triangle_count_per_node(e, local_caps=0).collect()
            assert loc == [] and dist == []


class TestTrianglesProperty:
    def test_random_graphs_match_bruteforce(self, spark):
        """Property pin: on random small graphs both paths equal the
        O(n^3) brute-force per-node triangle count."""
        import itertools
        import random

        from code_graph_backend_spark.operators.triangles import (
            triangle_count_per_node,
        )

        rng = random.Random(20260816)
        for trial in range(5):
            n = rng.randint(3, 14)
            ids = rng.sample(range(1, 500), n)
            m = rng.randint(0, n * (n - 1) // 2)
            pairs = set()
            for _ in range(m):
                u, v = rng.sample(ids, 2)
                pairs.add((u, v))
            und = {frozenset(p) for p in pairs}
            want = {}
            for a, b, c in itertools.combinations(sorted(ids), 3):
                if (
                    frozenset((a, b)) in und
                    and frozenset((b, c)) in und
                    and frozenset((a, c)) in und
                ):
                    for v in (a, b, c):
                        want[v] = want.get(v, 0) + 1
            edf = spark.createDataFrame(
                list(pairs) or [], "src long, dst long"
            )
            for caps in (None, 0):
                got = {
                    r["node"]: r["n_triangles"]
                    for r in triangle_count_per_node(
                        edf, local_caps=caps
                    ).collect()
                }
                assert got == want, (
                    f"trial {trial} caps={caps}: edges={sorted(und)}"
                )
