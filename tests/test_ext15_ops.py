"""Round-5h operators: MAD robust outliers and classifier calibration
bins — semantics pinned on tiny hand-computable inputs (the driver
oracle hash-checks the full corpus at three scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext15  # noqa: F401  (registers queries)


def _events_df(spark, vals):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, t, v, "{}")
        for i, (t, v) in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


class TestMadGate:
    def _run(self, spark, vals, k=3):
        from code_graph_backend_spark.streaming.gates import (
            event_mad_stats, mad_outlier_gate, quantize_events,
        )

        q = quantize_events(_events_df(spark, vals))
        return {
            r["event_id"]: r["value"]
            for r in mad_outlier_gate(q, event_mad_stats(q), k=k).collect()
        }

    def test_hand_boundary(self, spark):
        """Values 1..7 plus 100: med=4.25? no — med of {1..7,100} is 4.5;
        MAD of deviations {3.5,2.5,1.5,.5,.5,1.5,2.5,95.5} → sorted
        deviations (x1000, doubled): med2=9000; dev2 = |2x-9|·1000 →
        {7000,5000,3000,1000,1000,3000,5000,191000}; median = 4000 ⇒
        mad4 = 8000. Gate: 20000·dev2 > 44478·8000 → dev2 > 17791.2 ⇒
        only the 100 flags. A 3-sigma MEAN gate on the same data flags
        nothing extra — but crucially the robust med stays at 4.5 while
        the mean was dragged to 15.4."""
        vals = [("A", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]]
        out = self._run(spark, vals)
        assert out == {7: 100.0}

    def test_extreme_value_does_not_mask(self, spark):
        """Masking check: with TWO extremes {1000, 1001} among 1..8 the
        sigma gate's σ explodes (σ≈387: nothing beyond the extremes can
        ever flag), while the MAD boundary stays tight and still flags
        both — the breakdown-point property that motivates the gate."""
        vals = [("A", float(v)) for v in list(range(1, 9)) + [1000, 1001]]
        out = self._run(spark, vals)
        assert set(out.values()) == {1000.0, 1001.0}

    def test_per_type_independence(self, spark):
        """Types gate on their own med/MAD: the same value can be an
        outlier in one type and inlier in another."""
        vals = [("A", float(v)) for v in [1, 2, 3, 4, 50]] + [
            ("B", float(v)) for v in [48, 49, 50, 51, 52]
        ]
        out = self._run(spark, vals)
        assert out == {4: 50.0}


class TestCalibrationBins:
    def test_bin_invariants(self, spark):
        from code_graph_backend_spark.registry import QUERIES

        rows = QUERIES["quality_calibration_bins"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert [r["bin"] for r in rows] == list(range(1, 11))
        total = sum(r["n"] for r in rows)
        assert total == 500  # every sf0.001 document lands in a bin
        sizes = [r["n"] for r in rows]
        assert max(sizes) - min(sizes) <= 1  # NTILE balance
        for r in rows:
            assert 0 <= r["n_pass"] <= r["n"]
            assert r["min_logit"] <= r["max_logit"]
        # deciles partition the score axis in order
        for a, b in zip(rows, rows[1:]):
            assert a["max_logit"] <= b["min_logit"]

    def test_ntile_matches_duckdb_on_ties(self, spark):
        """NTILE over the (logit, id) total order must cut identical
        deciles in both engines even when logits tie — pin Spark's
        bucket boundaries against DuckDB on a tie-heavy frame."""
        import duckdb
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        data = [(i, i % 3) for i in range(17)]  # heavy ties
        df = spark.createDataFrame(data, "doc_id long, s long")
        got = {
            r["doc_id"]: r["bin"]
            for r in df.withColumn(
                "bin", F.ntile(10).over(Window.orderBy("s", "doc_id"))
            ).collect()
        }
        con = duckdb.connect()
        want = dict(
            con.execute(
                """SELECT doc_id, NTILE(10) OVER (ORDER BY s, doc_id)
                   FROM (SELECT UNNEST(range(17)) doc_id,
                                UNNEST(range(17)) % 3 s)"""
            ).fetchall()
        )
        assert got == want


class TestChangepoint:
    def test_step_function_found_at_step(self, spark):
        """Values 0,0,0,0,10,10,10,10: the CUSUM |n·S_k − k·T| peaks at
        k=4 (the last pre-shift point): C'_4 = 8·0 − 4·40000 = −160000."""
        from code_graph_backend_spark.registry import QUERIES

        vals = [("A", 0.0)] * 4 + [("A", 10.0)] * 4
        ev = _events_df(spark, vals)
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            (row,) = QUERIES["events_changepoint"](spark, td).collect()
        assert row["k_at_max"] == 4
        assert row["cusum_at_max"] == -160000
        assert row["n"] == 8

    def test_tie_takes_smallest_k(self, spark):
        """Symmetric 0,10 pattern ties |C'| at several k — the smallest
        wins (deterministic argmax)."""
        from code_graph_backend_spark.registry import QUERIES

        vals = [("A", 0.0), ("A", 10.0), ("A", 0.0), ("A", 10.0)]
        ev = _events_df(spark, vals)
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            (row,) = QUERIES["events_changepoint"](spark, td).collect()
        # S = 0,10000,10000,20000; T=20000; C' = 4S-k*20000 =
        # -20000, 0, -20000, 0 → max |C'| = 20000 at k ∈ {1, 3} → 1
        assert row["k_at_max"] == 1
        assert row["cusum_at_max"] == -20000


class TestEdgeEmbeddedness:
    def test_triangle_plus_bridge(self, spark):
        """Triangle 1-2-3 plus bridge 3-9: triangle edges have exactly
        one common neighbor; the bridge has none (a local bridge)."""
        from code_graph_backend_spark.operators.triangles import (
            undirected_edges,
        )
        from pyspark.sql import functions as F

        # replicate the registered plan body on a hand graph
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 9)], "src long, dst long"
        )
        und = undirected_edges(edges)
        sym = und.unionAll(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        s1 = sym.select(F.col("a"), F.col("b").alias("w"))
        s2 = sym.select(F.col("a").alias("b"), F.col("b").alias("w"))
        com = (
            und.join(s1, "a").join(s2, ["b", "w"])
            .groupBy("a", "b").agg(F.count("*").alias("n_common"))
        )
        out = {
            (r["a"], r["b"]): r["n_common"]
            for r in und.join(com, ["a", "b"], "left")
            .fillna(0, subset=["n_common"]).collect()
        }
        assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 9): 0}
