"""Round-5o operators: clustering coefficient, rich club, KS lengths,
resource allocation — semantics pinned on tiny hand-computable inputs
(the driver oracle hash-checks the full corpus at three scales)."""

from __future__ import annotations

import os
import tempfile

import code_graph_backend_spark.registry_ext21 as ext21  # noqa: F401


def _write_lineitem(spark, td, baskets):
    rows = [(o, p) for o, parts in baskets.items() for p in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        os.path.join(td, "lineitem.parquet")
    )


# Baskets engineered so the support-pruned cooc graph (pairs sharing
# >=2 orders) is the triangle {1,2,3} plus the pendant edge 3-4:
#   orders 10,11: {1,2,3}  -> pairs (1,2),(1,3),(2,3) with sup 2
#   orders 12,13: {3,4}    -> pair (3,4) with sup 2
_BASKETS = {10: [1, 2, 3], 11: [1, 2, 3], 12: [3, 4], 13: [3, 4]}


class TestClusteringCoeff:
    def test_triangle_with_pendant(self, spark):
        with tempfile.TemporaryDirectory() as td:
            _write_lineitem(spark, td, _BASKETS)
            out = {
                r["node"]: r
                for r in ext21.graph_clustering_coeff_q(spark, td).collect()
            }
        # node 1: degree 2, in 1 triangle -> (2*1, 2*1) = fully clustered
        assert (out[1]["n_triangles"], out[1]["coeff_num"], out[1]["coeff_den"]) == (
            1, 2, 2
        )
        # node 3: degree 3 (1,2,4), 1 triangle -> 2/6
        assert (out[3]["degree"], out[3]["coeff_num"], out[3]["coeff_den"]) == (
            3, 2, 6
        )
        # node 4: degree 1 -> excluded by the d >= 2 gate
        assert 4 not in out


class TestRichClub:
    def test_profile(self, spark):
        with tempfile.TemporaryDirectory() as td:
            _write_lineitem(spark, td, _BASKETS)
            out = {
                r["k"]: r for r in ext21.graph_rich_club_q(spark, td).collect()
            }
        # degrees: 1->2, 2->2, 3->3, 4->1
        # k=1: nodes {1,2,3} (deg>1), edges among them: (1,2),(1,3),(2,3)
        assert (out[1]["n_nodes"], out[1]["n_edges"], out[1]["possible"]) == (3, 3, 3)
        # k=2: nodes {3} only -> 0 edges, 0 possible
        assert (out[2]["n_nodes"], out[2]["n_edges"], out[2]["possible"]) == (1, 0, 0)
        # k=3..6: no nodes -> absent rows (rn is built from survivors)
        assert 3 not in out


class TestKsLengths:
    def test_hand_ecdf(self, spark):
        """src a lengths {1,2}, src b lengths {2,4}: at v=1 the gap is
        |1*2-0*2|=2; at v=2 |2*2-1*2|=2; at v=4 0 -> ks_num=2, den=4."""
        docs = spark.createDataFrame(
            [(1, "a", 1), (2, "a", 2), (3, "b", 2), (4, "b", 4)],
            "doc_id long, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = ext21.corpus_ks_lengths_q(spark, td).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["src_a"], r["src_b"], r["n_a"], r["n_b"]) == ("a", "b", 2, 2)
        assert (r["ks_num"], r["ks_den"]) == (2, 4)

    def test_identical_distributions_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "a", 5), (2, "a", 9), (3, "b", 5), (4, "b", 9)],
            "doc_id long, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = ext21.corpus_ks_lengths_q(spark, td).collect()
        assert out[0]["ks_num"] == 0


class TestResourceAllocation:
    def test_pendant_prediction(self, spark):
        """Cooc graph = triangle {1,2,3} + edge 3-4. Non-adjacent pairs
        with a common neighbor: (1,4) via 3, (2,4) via 3. deg(3)=3 ->
        ra_nano = 10^9 // 3 = 333333333 for both."""
        with tempfile.TemporaryDirectory() as td:
            _write_lineitem(spark, td, _BASKETS)
            out = {
                (r["x"], r["y"]): r
                for r in ext21.graph_resource_allocation_q(spark, td).collect()
            }
        assert set(out) == {(1, 4), (2, 4)}
        for r in out.values():
            assert (r["n_common"], r["ra_nano"]) == (1, 1_000_000_000 // 3)
