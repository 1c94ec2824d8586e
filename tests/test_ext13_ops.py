"""Round-5f operators: SemDeDup pruning, modularity numerators, fuzzy ER
pairs, Kneser–Ney bigram scoring — semantics pinned on tiny
hand-computable inputs (the driver oracle hash-checks the full corpus at
three scales)."""

from __future__ import annotations

import math

import code_graph_backend_spark.registry_ext13  # noqa: F401  (registers queries)


class TestSemDeDup:
    def test_prunes_within_cell_only(self, spark):
        """Two tight groups far apart plus one singleton: k=2 k-means
        separates the groups; within each, every lower-id twin prunes
        its higher-id near-copies; nothing is compared ACROSS cells."""
        from code_graph_backend_spark.functions.similarity import semdedup_prune

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.001, 0.0, 0.0]),   # near-copy of 0
            (2, [0.998, -0.002, 0.0, 0.0]),  # near-copy of 0 and 1
            (10, [0.0, 0.0, 1.0, 0.0]),
            (11, [0.0, 0.0, 0.999, 0.001]),  # near-copy of 10
            (12, [0.0, 0.0, 0.0, 1.0]),      # same cell, NOT a dup (cos=0)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r for r in semdedup_prune(emb, k=2, rounds=2).collect()}
        assert out[0]["kept"] == 1 and out[0]["n_dups_below"] == 0
        assert out[1]["kept"] == 0 and out[1]["n_dups_below"] == 1
        assert out[2]["kept"] == 0 and out[2]["n_dups_below"] == 2
        assert out[10]["kept"] == 1
        assert out[11]["kept"] == 0 and out[11]["n_dups_below"] == 1
        assert out[12]["kept"] == 1 and out[12]["n_dups_below"] == 0
        # the two groups landed in different cells
        assert out[0]["cell"] != out[10]["cell"]
        assert out[11]["cell"] == out[10]["cell"] == out[12]["cell"]

    def test_matches_bruteforce_gate(self, spark):
        """On the real sf0.001 embeddings, every (kept, n_dups_below)
        must equal a brute-force numpy replay of the integer gate over
        the same cell assignment."""
        import numpy as np

        from code_graph_backend_spark.functions.similarity import (
            kmeans_assign_exact, semdedup_prune,
        )
        from code_graph_backend_spark.session import read_table

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = semdedup_prune(emb, k=4, rounds=2).toPandas()
        asg = {
            r["vec_id"]: r["cell"]
            for r in kmeans_assign_exact(emb, k=4, rounds=2).collect()
        }
        raw = emb.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in raw])
        order = np.argsort(ids)
        ids = ids[order]
        Q = np.round(
            np.array([list(r["embedding"]) for r in raw], dtype=np.float64) * 1000
        ).astype(np.int64)[order]
        cells = np.array([asg[int(i)] for i in ids])
        expect_below = np.zeros(len(ids), dtype=np.int64)
        for c in np.unique(cells):
            idx = np.nonzero(cells == c)[0]
            G = Q[idx] @ Q[idx].T
            nn = np.diag(G).copy()
            gate = (G > 0) & (100 * G * G >= 81 * np.outer(nn, nn))
            expect_below[idx] = np.triu(gate, k=1).sum(axis=0)
        got = out.set_index("vec_id").loc[ids]
        assert (got["n_dups_below"].to_numpy() == expect_below).all()
        assert (got["kept"].to_numpy() == (expect_below == 0)).all()


class TestModularity:
    def test_two_clique_numerators(self, spark):
        """Two triangles joined by one bridge, labeled by their triangle:
        m = 7, each community has m_in = 3, deg_sum = 7 (2+2+3), so
        q_num = 4·3·7 − 49 = 35 and Q = 2·35/(4·49) ≈ 0.357."""
        from code_graph_backend_spark.operators.labelprop import (
            modularity_by_label,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
            "src long, dst long",
        )
        labels = spark.createDataFrame(
            [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 200)],
            "node long, label long",
        )
        rows = {r["label"]: r for r in modularity_by_label(labels, edges).collect()}
        for lab in (100, 200):
            assert rows[lab]["n_nodes"] == 3
            assert rows[lab]["m_in"] == 3
            assert rows[lab]["deg_sum"] == 7
            assert rows[lab]["q_num"] == 4 * 3 * 7 - 49
        q = sum(r["q_num"] for r in rows.values()) / (4 * 7 * 7)
        assert abs(q - (6 / 7 - 2 * (7 / 14) ** 2)) < 1e-12

    def test_everything_one_community_is_zero(self, spark):
        """A single all-nodes community has m_in = m and deg_sum = 2m,
        so q_num = 4m² − 4m² = 0 — the classic Q = 0 identity."""
        from code_graph_backend_spark.operators.labelprop import (
            modularity_by_label,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long"
        )
        labels = spark.createDataFrame(
            [(n, 7) for n in (1, 2, 3, 4)], "node long, label long"
        )
        (row,) = modularity_by_label(labels, edges).collect()
        assert row["q_num"] == 0 and row["m_in"] == 5 and row["deg_sum"] == 10


class TestFuzzyER:
    def test_levenshtein_parity_with_duckdb(self, spark):
        """Spark's levenshtein must agree with DuckDB's on every blocked
        candidate pair of the real dictionary — the exactness the oracle
        hash rides on."""
        import duckdb

        from code_graph_backend_spark.session import read_table

        names = sorted(
            r["p_name"]
            for r in read_table(spark, "/root/testdata/sf0.001", "part")
            .select("p_name").distinct().collect()
        )
        pairs = [
            (a, b)
            for i, a in enumerate(names)
            for b in names[i + 1:]
            if set(a.split()) & set(b.split())
        ]
        df = spark.createDataFrame(pairs, "a string, b string")
        from pyspark.sql import functions as F

        got = {
            (r["a"], r["b"]): r["lev"]
            for r in df.withColumn("lev", F.levenshtein("a", "b")).collect()
        }
        con = duckdb.connect()
        for a, b in pairs:
            want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert got[(a, b)] == want, (a, b)

    def test_blocking_and_gate(self, spark):
        """er_fuzzy_name_pairs only emits token-sharing pairs with
        lev <= 3, with correct row support."""
        from code_graph_backend_spark.registry import QUERIES

        rows = QUERIES["er_fuzzy_name_pairs"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows, "expected at least one fuzzy match in the dictionary"
        for r in rows:
            assert r["name_a"] < r["name_b"]
            assert 1 <= r["lev"] <= 3
            assert set(r["name_a"].split()) & set(r["name_b"].split())
            assert r["n_a"] >= 1 and r["n_b"] >= 1


class TestKneserNey:
    def test_hand_model(self, spark):
        """Two tiny docs; every bigram probability hand-derived from the
        KN formula with D = 0.75."""
        from code_graph_backend_spark.registry import QUERIES
        import os
        import tempfile

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")],
            "doc_id long, text string",
        )
        # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1
        # c1: a->n1=3,fw=1 ; b->n1=2,fw=2
        # cb: b->bw=1 ; a->bw=1 ; c->bw=1 ; B=3
        def p(n2, n1, fw, bw, bb=3):
            return ((n2 - 0.75) / n1) + ((0.75 * fw) / n1) * (bw / bb)

        p_ab = p(3, 3, 1, 1)
        p_ba = p(1, 2, 2, 1)
        p_bc = p(1, 2, 2, 1)
        want1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
        want2 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
        with tempfile.TemporaryDirectory() as td:
            docs_full = docs.selectExpr(
                "doc_id", "text", "'xx' AS lang", "'s' AS source",
                "CAST(length(text) AS LONG) AS n_chars",
            )
            docs_full.write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                r["doc_id"]: r
                for r in QUERIES["text_kn_bigram_logprob"](spark, td).collect()
            }
        assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
        assert abs(out[1]["avg_kn_nll_bits"] - round(want1, 6)) < 2e-6
        assert abs(out[2]["avg_kn_nll_bits"] - round(want2, 6)) < 2e-6
