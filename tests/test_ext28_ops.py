"""Round-5v operators: gate ablation, cluster sizes."""

from __future__ import annotations

import code_graph_backend_spark.registry_ext28 as ext28  # noqa: F401


class TestGateAblation:
    def test_consistency_with_pipeline(self, spark):
        """Total survivors of the four shared gates (canonical ∧ quality
        ∧ boilerplate ∧ ¬contamination) must equal docs minus the union
        of kill sets; n_unique_kills <= n_killed per gate."""
        from code_graph_backend_spark.session import read_table

        sf = "/root/testdata/sf0.001"
        rows = ext28.curation_gate_ablation_q(spark, sf).collect()
        assert {r["gate"] for r in rows} <= {
            "canonical", "quality", "boilerplate", "contamination"
        }
        for r in rows:
            assert 0 <= r["n_unique_kills"] <= r["n_killed"]
        n_docs = read_table(spark, sf, "documents").count()
        for r in rows:
            assert r["n_killed"] <= n_docs


class TestClusterSizes:
    def test_mass_conservation(self, spark):
        """Σ n_docs over the histogram equals the corpus size, and the
        removable mass is docs minus clusters."""
        from code_graph_backend_spark.session import read_table

        sf = "/root/testdata/sf0.001"
        rows = ext28.dedup_cluster_sizes_q(spark, sf).collect()
        n_docs = read_table(spark, sf, "documents").count()
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert sum(r["n_removable"] for r in rows) == n_docs - sum(
            r["n_clusters"] for r in rows
        )
        assert rows[0]["size"] == 1  # solitary docs dominate
