"""Round-5t operators: k-anonymity, eccentricity bounds, core
decomposition."""

from __future__ import annotations

import os
import tempfile

import code_graph_backend_spark.registry_ext26 as ext26  # noqa: F401


class TestKAnonymity:
    def test_class_sizes(self, spark):
        """Classes: (en,a,0)x3, (en,b,0)x1 -> k=2: 1 class below, 1 row
        at risk; k=5: both classes below, 4 rows at risk."""
        docs = spark.createDataFrame(
            [
                (1, "en", "a", 10), (2, "en", "a", 20), (3, "en", "a", 30),
                (4, "en", "b", 10),
            ],
            "doc_id long, lang string, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = {r["k"]: r for r in ext26.dq_k_anonymity_q(spark, td).collect()}
        assert (out[2]["n_classes"], out[2]["classes_below_k"], out[2]["rows_at_risk"]) == (2, 1, 1)
        assert (out[5]["classes_below_k"], out[5]["rows_at_risk"]) == (2, 4)
        assert out[10]["total_rows"] == 4


class TestCoreDecomposition:
    def test_against_composed_kernel(self, spark):
        """The fused local decomposition must equal the composed
        per-k kcore_bounded runs on the real twin graph."""
        from pyspark.sql import functions as F

        from code_graph_backend_spark.graph.tpch import build_graph
        from code_graph_backend_spark.operators.labelprop import kcore_bounded
        from code_graph_backend_spark.registry_ext26 import (
            _CORE_KS, _CORE_ROUNDS,
        )

        sf = "/root/testdata/sf0.001"
        got = {
            r["node"]: r["core_number"]
            for r in ext26.graph_core_decomposition_q(spark, sf).collect()
        }
        g = build_graph(spark, sf)
        want = {}
        for k in _CORE_KS:
            for r in kcore_bounded(spark, g.edges, k=k, rounds=_CORE_ROUNDS).collect():
                want[r["node"]] = max(want.get(r["node"], 0), k)
        assert got == want


class TestEccentricityBounds:
    def test_max_over_landmarks(self, spark):
        """ecc_lb is the max landmark distance and landmarks count
        only reached pairs — checked against the landmark kernel."""
        from code_graph_backend_spark.graph.tpch import build_graph
        from code_graph_backend_spark.operators.landmarks import landmark_distances

        sf = "/root/testdata/sf0.001"
        got = {
            r["node"]: (r["ecc_lb"], r["n_landmarks_reached"])
            for r in ext26.graph_eccentricity_bounds_q(spark, sf).collect()
        }
        g = build_graph(spark, sf)
        lm = landmark_distances(g.nodes, g.edges, n_landmarks=8, hops=3).collect()
        want = {}
        for r in lm:
            e, c = want.get(r["node"], (-1, 0))
            want[r["node"]] = (max(e, r["dist"]), c + 1)
        assert got == want
