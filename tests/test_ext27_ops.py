"""Round-5u operators: windowed funnel, SLO burn flags."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext27 as ext27  # noqa: F401

_EPOCH = datetime.datetime(1970, 1, 1)


def _ev(eid, uid, sec, typ):
    return (eid, uid, _EPOCH + datetime.timedelta(seconds=sec), typ)


class TestWindowFunnel:
    def test_depths_respect_window(self, spark):
        """u1 converts fully inside the hour; u2's purchase misses the
        window (view at 0, purchase at 4000 > 3600); u3 only views."""
        rows = [
            _ev(1, 1, 0, "view"), _ev(2, 1, 100, "click"), _ev(3, 1, 200, "purchase"),
            _ev(4, 2, 0, "view"), _ev(5, 2, 100, "click"), _ev(6, 2, 4000, "purchase"),
            _ev(7, 3, 0, "view"),
            _ev(8, 4, 0, "click"),  # no view: depth 0, excluded
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["depth"]: r["n_users"]
                for r in ext27.events_window_funnel_q(spark, td).collect()
            }
        assert out == {1: 1, 2: 1, 3: 1}

    def test_order_matters(self, spark):
        """purchase BEFORE click stays depth 2 — the chain must be
        strictly ordered."""
        rows = [
            _ev(1, 1, 0, "view"), _ev(2, 1, 300, "purchase"), _ev(3, 1, 500, "click"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["depth"]: r["n_users"]
                for r in ext27.events_window_funnel_q(spark, td).collect()
            }
        assert out == {2: 1}


class TestSloBurn:
    def test_burn_thresholds(self, spark):
        """Hour 0: 2/10 errors (20% > 14.4% -> both flags); hour 1:
        1/10 (10% -> slow only); hour 2: 0/10 -> neither."""
        rows = []
        eid = 0
        for hr, n_err in ((0, 2), (1, 1), (2, 0)):
            for i in range(10):
                eid += 1
                typ = "error" if i < n_err else "view"
                rows.append(_ev(eid, 1, hr * 3600 + i, typ))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["hr"]: (r["fast_burn"], r["slow_burn"])
                for r in ext27.events_slo_burn_q(spark, td).collect()
            }
        assert out == {0: (1, 1), 1: (0, 1), 2: (0, 0)}
