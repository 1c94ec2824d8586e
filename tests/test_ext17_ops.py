"""Round-5k operators: stickiness, RFM segmentation, centroid drift —
semantics pinned on tiny hand-computable inputs (the driver oracle
hash-checks the full corpus at three scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext17  # noqa: F401  (registers queries)


def _events(spark, rows):
    """rows: (user_id, day_offset, value)"""
    base = datetime.datetime(2024, 1, 1, 12, 0)
    data = [
        (i, base + datetime.timedelta(days=d), u, "A", v, "{}")
        for i, (u, d, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


class TestStickiness:
    def test_hand_counts(self, spark):
        """u1 active days 0 and 8; u2 active day 8 only. day 0: DAU=1,
        WAU=1, MAU=1. day 8: DAU=2, WAU=2 (day 0 is outside [2,8]),
        MAU=2; stickiness 1000."""
        from code_graph_backend_spark.registry import QUERIES

        ev = _events(spark, [(1, 0, 1.0), (1, 8, 1.0), (2, 8, 1.0)])
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["day"]: (r["dau"], r["wau"], r["mau"], r["stickiness_milli"])
                for r in QUERIES["events_stickiness"](spark, td).collect()
            }
        assert out == {0: (1, 1, 1, 1000), 8: (2, 2, 2, 1000)}

    def test_windows_include_trailing_days(self, spark):
        """u1 day 0, u2 day 3: at day 3 WAU counts both (0 ∈ [−3, 3])."""
        from code_graph_backend_spark.registry import QUERIES

        ev = _events(spark, [(1, 0, 1.0), (2, 3, 1.0)])
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["day"]: (r["dau"], r["wau"])
                for r in QUERIES["events_stickiness"](spark, td).collect()
            }
        assert out[3] == (1, 2)


class TestRfm:
    def test_hand_bins(self, spark):
        """Five users with strictly increasing recency/frequency/value:
        each metric's quintiles are singletons and bin 5 is the best
        (most recent, most frequent, highest value)."""
        from code_graph_backend_spark.registry import QUERIES

        rows = []
        # user u has (u) events on day u with value u (u = 1..5)
        for u in range(1, 6):
            for _ in range(u):
                rows.append((u, u, float(u)))
        ev = _events(spark, rows)
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["user_id"]: r
                for r in QUERIES["events_rfm"](spark, td).collect()
            }
        for u in range(1, 6):
            r = out[u]
            assert r["recency_days"] == 5 - u
            assert r["frequency"] == u
            assert r["monetary_milli"] == u * u * 1000
            assert r["r_bin"] == r["f_bin"] == r["m_bin"] == u


class TestCentroidDrift:
    def test_identical_halves_zero_drift(self, spark):
        """Even/odd vectors identical per label → drift2_q = 0."""
        from code_graph_backend_spark.registry import QUERIES

        rows = [(i, [0.5, -0.25], 7) for i in range(6)]
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ).write.parquet(os.path.join(td, "embeddings.parquet"))
            (r,) = QUERIES["emb_centroid_drift"](spark, td).collect()
        assert r["drift2_q"] == 0 and r["n_even"] == 3 and r["n_odd"] == 3

    def test_displaced_half_measures_squared_l2(self, spark):
        """Even half at (1000, 0)q, odd half at (0, 1000)q →
        drift2_q = 1000² + 1000² = 2_000_000."""
        from code_graph_backend_spark.registry import QUERIES

        rows = [
            (0, [1.0, 0.0], 7), (2, [1.0, 0.0], 7),
            (1, [0.0, 1.0], 7), (3, [0.0, 1.0], 7),
        ]
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ).write.parquet(os.path.join(td, "embeddings.parquet"))
            (r,) = QUERIES["emb_centroid_drift"](spark, td).collect()
        assert r["drift2_q"] == 2_000_000
