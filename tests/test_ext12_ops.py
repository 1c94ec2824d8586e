"""Round-5e operators: retention cohorts, readability, k-truss peeling,
matryoshka overlap — semantics pinned on tiny hand-computable inputs
(the driver oracle hash-checks the full corpus at three scales)."""

from __future__ import annotations

import code_graph_backend_spark.registry_ext12  # noqa: F401  (registers queries)


class TestKtruss:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "src long, dst long"
        )

    def test_k4_plus_pendant_triangle(self, spark):
        """K4 (nodes 1-4) edges sit in 2 triangles each; a pendant
        triangle (3,4,5) adds edges of support 1. k=3 keeps everything,
        k=4 keeps only K4."""
        from code_graph_backend_spark.operators.ktruss import ktruss_edges

        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        pend = [(3, 5), (4, 5)]
        edges = self._edges(spark, k4 + pend)
        k3 = {(r["a"], r["b"]) for r in ktruss_edges(edges, k=3, rounds=2).collect()}
        assert k3 == set(k4) | set(pend)
        k4_out = {
            (r["a"], r["b"], r["support"])
            for r in ktruss_edges(edges, k=4, rounds=2).collect()
        }
        assert k4_out == {(a, b, 2) for a, b in k4}

    def test_peeling_cascade_recomputes_support(self, spark):
        """The shared edge (3,4) starts at support 3 (two K4 triangles +
        the pendant); after round 1 peels the pendant's outer edges its
        support must be RE-derived as 2 — a stale round-1 support would
        report 3."""
        from code_graph_backend_spark.operators.ktruss import ktruss_edges

        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        edges = self._edges(spark, k4 + [(3, 5), (4, 5)])
        out = {
            (r["a"], r["b"]): r["support"]
            for r in ktruss_edges(edges, k=4, rounds=2).collect()
        }
        assert out[(3, 4)] == 2

    def test_local_matches_distributed(self, spark):
        """The measured-size local fast path for rounds >= 2 must produce
        exactly the distributed loop's rows (local_max=0 forces the
        distributed path)."""
        from code_graph_backend_spark.operators.ktruss import ktruss_edges

        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 5),
                 (4, 5), (5, 6), (6, 7), (5, 7), (2, 6)]
        edges = self._edges(spark, pairs)
        loc = ktruss_edges(edges, k=4, rounds=3).collect()
        dist = ktruss_edges(edges, k=4, rounds=3, local_max=0).collect()
        key = lambda r: (r["a"], r["b"], r["support"])
        assert sorted(map(key, loc)) == sorted(map(key, dist))


class TestRetentionCohorts:
    def test_week_arithmetic(self, spark, tmp_path):
        """Users cohorted by first-activity week; offsets are integer
        epoch-day // 7 — day 6 is still week 0, day 7 opens week 1."""
        from pyspark.sql import functions as F

        rows = [
            (1, "2024-01-01 10:00:00"),  # u1 week 0
            (1, "2024-01-06 10:00:00"),  # still week 0 (day 5)
            (1, "2024-01-08 10:00:00"),  # week 1 -> offset 1
            (2, "2024-01-09 10:00:00"),  # u2 cohort week 1
            (2, "2024-01-23 10:00:00"),  # week 3 -> offset 2
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        )
        p = str(tmp_path / "events.parquet")
        ev.write.parquet(p)
        from code_graph_backend_spark.registry import QUERIES

        res = {
            (r["cohort_week"], r["week_offset"]): r["n_users"]
            for r in QUERIES["events_retention_cohorts"](
                spark, str(tmp_path)
            ).collect()
        }
        assert res == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}


class TestReadability:
    def test_formula_hand_computed(self, spark, tmp_path):
        """'go on. it is ok!' -> 5 words, 2 sentences, 3 vowel groups
        (o, o-then... hand count: 'go on. it is ok!' vowel runs:
        o / o / i / i / o = 5), score floor-divided exactly."""
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.createDataFrame(
            [(1, "go on. it is ok!")], "doc_id long, text string"
        )
        p = str(tmp_path / "documents.parquet")
        docs.write.parquet(p)
        row = QUERIES["text_readability"](spark, str(tmp_path)).collect()[0]
        assert row["n_words"] == 5
        assert row["n_sentences"] == 2
        assert row["n_syllables"] == 5
        expected = 206835000 - (1015000 * 5) // 2 - (84600000 * 5) // 5
        assert row["flesch_micro"] == expected

    def test_no_terminal_punctuation_counts_one_sentence(self, spark, tmp_path):
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.createDataFrame(
            [(1, "xyz pqr")], "doc_id long, text string"
        )
        docs.write.parquet(str(tmp_path / "documents.parquet"))
        row = QUERIES["text_readability"](spark, str(tmp_path)).collect()[0]
        assert row["n_sentences"] == 1 and row["n_syllables"] == 0


class TestMatryoshkaOverlap:
    def test_truncation_changes_ranking(self, spark, tmp_path):
        """Probe 0 against three candidates: candidate 30 wins on the
        full dot, candidate 40 wins on the first-16-dim dot — top-1
        differs, but both sit in each other's top-10 so overlap counts
        every candidate."""
        from code_graph_backend_spark.registry import QUERIES

        def vec(head, tail):
            return [float(head)] * 16 + [float(tail)] * 48

        rows = [
            (0, vec(1, 1), 0),
            (30, vec(1, 2), 0),   # full dot highest
            (40, vec(2, 0), 0),   # 16-dim dot highest
            (50, vec(0, 0), 0),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        emb.write.parquet(str(tmp_path / "embeddings.parquet"))
        out = {
            r["probe_id"]: (r["n_overlap"], r["top1_same"])
            for r in QUERIES["emb_matryoshka_overlap"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out[0] == (3, 0)
