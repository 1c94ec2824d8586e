"""Round-5g operators: landmark stress centrality, event trigram
patterns, RAKE keywords — semantics pinned on tiny hand-computable
inputs (the driver oracle hash-checks the full corpus at three
scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext14  # noqa: F401  (registers queries)


class TestLandmarkStress:
    def _run(self, spark, nodes, edges, n_landmarks, hops):
        from code_graph_backend_spark.operators.stress import landmark_stress

        ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: r["stress"]
            for r in landmark_stress(
                ndf, edf, n_landmarks=n_landmarks, hops=hops, landmark_by="id"
            ).collect()
        }

    def test_path_graph_middle_nodes(self, spark):
        """Path 1-3-4-5-2 with landmarks {1,2}: the single geodesic
        passes through 3, 4, 5 — each gets stress 1."""
        out = self._run(
            spark, [1, 2, 3, 4, 5], [(1, 3), (3, 4), (4, 5), (5, 2)], 2, 4
        )
        assert out == {3: 1, 4: 1, 5: 1}

    def test_sigma_multiplication_and_summation(self, spark):
        """Double diamond 1-{3,4}-5-2: σ_1(5)=2, σ_2(5)=1 ⇒ stress(5)=2;
        each of 3,4 carries one of the two geodesics ⇒ stress 1."""
        out = self._run(
            spark, [1, 2, 3, 4, 5], [(1, 3), (1, 4), (3, 5), (4, 5), (5, 2)], 2, 4
        )
        assert out == {3: 1, 4: 1, 5: 2}

    def test_hop_bound_drops_far_pairs(self, spark):
        """With hops=2 the d=3 landmark pair 1-2 is never settled, so no
        middle node scores; only pairs within the bound contribute."""
        out = self._run(
            spark, [1, 2, 3, 4, 5], [(1, 3), (3, 4), (4, 5), (5, 2)], 2, 2
        )
        assert out == {}

    def test_non_landmark_endpoints_excluded(self, spark):
        """With landmark_by="id" the pivots are the smallest ids; v ∈
        {s, t} never counts itself even when it lies on another pair's
        geodesic."""
        # triangle of landmarks 1,2,3 plus pendant 9: all pairwise d=1,
        # no middles anywhere
        out = self._run(
            spark, [1, 2, 3, 9], [(1, 2), (2, 3), (1, 3), (3, 9)], 3, 3
        )
        assert out == {}

    def test_degree_heuristic_picks_hubs(self, spark):
        """Default landmark_by="degree": two degree-4 hubs (10, 20)
        bridged through 15 out-rank every leaf, and the bridge carries
        their single geodesic."""
        from code_graph_backend_spark.operators.stress import landmark_stress

        edges = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5), (20, 6),
                 (10, 15), (15, 20)]
        ndf = spark.createDataFrame(
            [(n,) for n in (1, 2, 3, 4, 5, 6, 10, 15, 20)], "id long"
        )
        edf = spark.createDataFrame(edges, "src long, dst long")
        out = {
            r["node"]: r["stress"]
            for r in landmark_stress(ndf, edf, n_landmarks=2, hops=3).collect()
        }
        assert out == {15: 1}


class TestTrigramPatterns:
    def test_hand_counts(self, spark):
        from code_graph_backend_spark.registry import QUERIES

        base = datetime.datetime(2024, 1, 1)
        rows = []
        # user 1: A B C A B C  -> ABC x2, BCA x1, CAB x1
        for i, et in enumerate(["A", "B", "C", "A", "B", "C"]):
            rows.append((i, base + datetime.timedelta(minutes=i), 1, et, 1.0, "{}"))
        # user 2: A B C       -> ABC x1
        for i, et in enumerate(["A", "B", "C"]):
            rows.append(
                (100 + i, base + datetime.timedelta(minutes=i), 2, et, 1.0, "{}")
            )
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                (r["e1"], r["e2"], r["e3"]): r["n"]
                for r in QUERIES["events_trigram_patterns"](spark, td).collect()
            }
        assert out == {
            ("A", "B", "C"): 3,
            ("B", "C", "A"): 1,
            ("C", "A", "B"): 1,
        }


class TestRakeKeywords:
    def test_hand_scores(self, spark):
        """doc: 'big data the big data pipeline a x' →
        phrases: 'big data' x2, 'big data pipeline'? no — the second run
        is 'big data pipeline', then 'x'. freq(big)=2, deg(big)=2+3=5;
        freq(data)=2, deg=5; freq(pipeline)=1, deg=3; freq(x)=1, deg=1.
        score_micro: big=2500000, data=2500000, pipeline=3000000, x=1000000.
        'big data pipeline'=8000000, 'big data'=5000000, 'x'=1000000."""
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.createDataFrame(
            [(1, "big data the big data pipeline a x")],
            "doc_id long, text string",
        ).selectExpr(
            "doc_id", "text", "'xx' AS lang", "'s' AS source",
            "CAST(length(text) AS LONG) AS n_chars",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            rows = QUERIES["text_rake_keywords"](spark, td).collect()
        got = {r["phrase"]: (r["n_occurrences"], r["score_micro"]) for r in rows}
        assert got == {
            "big data pipeline": (1, 8000000),
            "big data": (1, 5000000),
            "x": (1, 1000000),
        }
        # ranking: highest score first
        assert rows[0]["phrase"] == "big data pipeline"

    def test_phrase_cap(self, spark):
        """Runs longer than 4 tokens are dropped entirely (standard RAKE
        cap), leaving shorter runs untouched."""
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.createDataFrame(
            [(1, "one two three four five the ok go")],
            "doc_id long, text string",
        ).selectExpr(
            "doc_id", "text", "'xx' AS lang", "'s' AS source",
            "CAST(length(text) AS LONG) AS n_chars",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            phrases = {
                r["phrase"]
                for r in QUERIES["text_rake_keywords"](spark, td).collect()
            }
        assert phrases == {"ok go"}
