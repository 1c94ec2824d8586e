"""Round-5l operators: Borůvka MSF, integer autocorrelation moments,
Simpson diversity — semantics pinned on tiny hand-computable inputs
(the driver oracle hash-checks the full corpus at three scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext18  # noqa: F401  (registers queries)


class TestBoruvkaMSF:
    def test_local_and_distributed_paths_agree(self, spark):
        """The vectorized local path and the distributed rounds are the
        same bounded recurrence — identical rows on a fixture."""
        from code_graph_backend_spark.operators.mst import boruvka_msf

        nodes = spark.createDataFrame([(i,) for i in range(1, 13)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)] + [(1, 7), (3, 11), (2, 9)],
            "src long, dst long",
        )
        loc = boruvka_msf(spark, nodes, edges).collect()
        dist = boruvka_msf(spark, nodes, edges, local_caps=(0, 0)).collect()
        assert [tuple(r) for r in loc] == [tuple(r) for r in dist]

    def test_path_graph_full_tree(self, spark):
        """A 4-node path 1-2-3-4: the MSF must contain exactly the 3
        path edges (they are the only edges), regardless of weights."""
        from code_graph_backend_spark.operators.mst import boruvka_msf

        nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4]], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        out = boruvka_msf(spark, nodes, edges, rounds=3, jumps=4).collect()
        got = {(r["u"], r["v"]) for r in out}
        assert got == {(1, 2), (2, 3), (3, 4)}

    def test_cycle_drops_heaviest(self, spark):
        """A triangle keeps the two lightest edges under the
        deterministic weight function — exactly n-1 edges, no cycle."""
        from code_graph_backend_spark.operators.mst import (
            _W_A, _W_B, _W_MOD, boruvka_msf,
        )

        nodes = spark.createDataFrame([(i,) for i in [1, 2, 3]], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "src long, dst long"
        )
        out = boruvka_msf(spark, nodes, edges).collect()
        assert len(out) == 2
        w = lambda u, v: (u * _W_A + v * _W_B) % _W_MOD
        heaviest = max([(1, 2), (2, 3), (1, 3)], key=lambda e: w(*e))
        assert heaviest not in {(r["u"], r["v"]) for r in out}

    def test_two_components_stay_separate(self, spark):
        """A forest input yields one tree per component and never
        invents a bridge."""
        from code_graph_backend_spark.operators.mst import boruvka_msf

        nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5), (5, 6)], "src long, dst long"
        )
        out = boruvka_msf(spark, nodes, edges).collect()
        assert {(r["u"], r["v"]) for r in out} == {(1, 2), (2, 3), (4, 5), (5, 6)}

    def test_weights_match_formula_and_order(self, spark):
        """Output is ordered by (round, w, u, v) with w from the pinned
        integer formula."""
        from code_graph_backend_spark.operators.mst import (
            _W_A, _W_B, _W_MOD, boruvka_msf,
        )

        nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "src long, dst long"
        )
        rows = boruvka_msf(spark, nodes, edges).collect()
        for r in rows:
            assert r["w"] == (r["u"] * _W_A + r["v"] * _W_B) % _W_MOD
        keys = [(r["round"], r["w"], r["u"], r["v"]) for r in rows]
        assert keys == sorted(keys)


class TestAutocorrelation:
    def test_constant_series_zero_variance(self, spark):
        """Equal daily counts: num = den_x = den_y = 0 at every lag."""
        from code_graph_backend_spark.registry import QUERIES

        base = datetime.datetime(2024, 1, 1, 12, 0)
        rows = [
            (d * 10 + i, base + datetime.timedelta(days=d), 1, "A", 1.0, "{}")
            for d in range(10)
            for i in range(3)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = QUERIES["events_autocorrelation"](spark, td).collect()
        assert [r["lag"] for r in out] == list(range(1, 8))
        for r in out:
            assert (r["num"], r["den_x"], r["den_y"]) == (0, 0, 0)
            assert r["n"] == 10 - r["lag"]

    def test_alternating_series_hand_moments(self, spark):
        """Counts 1,2,1,2 at lag 1: pairs (1,2),(2,1),(1,2) → n=3,
        Σxy=6, Σx=4, Σy=5 → num = 3·6−20 = −2; den_x = 3·6−16 = 2,
        den_y = 3·9−25 = 2 (perfect negative r = −1)."""
        from code_graph_backend_spark.registry import QUERIES

        base = datetime.datetime(2024, 1, 1, 12, 0)
        counts = [1, 2, 1, 2]
        rows = []
        eid = 0
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid, base + datetime.timedelta(days=d), 1, "A", 1.0, "{}")
                )
                eid += 1
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {r["lag"]: r for r in QUERIES["events_autocorrelation"](spark, td).collect()}
        r1 = out[1]
        assert (r1["n"], r1["num"], r1["den_x"], r1["den_y"]) == (3, -2, 2, 2)


class TestSimpsonDiversity:
    def test_hand_counts(self, spark):
        """Source s1: 'a a b' → N=3, counts {a:2, b:1} → num = 2·1 = 2,
        den = 3·2 = 6 (λ = 1/3); s2 all-distinct → num 0."""
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.createDataFrame(
            [
                (1, "a a b", "en", "s1", 5),
                (2, "x y z", "en", "s2", 5),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = {r["source"]: r for r in QUERIES["corpus_simpson_diversity"](spark, td).collect()}
        s1, s2 = out["s1"], out["s2"]
        assert (s1["n_tokens"], s1["n_types"], s1["simpson_num"], s1["simpson_den"]) == (3, 2, 2, 6)
        assert (s2["n_tokens"], s2["n_types"], s2["simpson_num"], s2["simpson_den"]) == (3, 3, 0, 6)
