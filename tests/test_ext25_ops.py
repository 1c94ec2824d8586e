"""Round-5s operators: Kahn layers, concurrency profile, purchase
intervals."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext25 as ext25  # noqa: F401

_EPOCH = datetime.datetime(1970, 1, 1)


def _ts(sec):
    return _EPOCH + datetime.timedelta(seconds=sec)


class TestKahnLayers:
    def test_dag_and_cycle(self, spark):
        """DAG 1->2->3 (and 1->3) layers 0,1,2; cycle {4,5} stays -1."""
        from code_graph_backend_spark.operators.toposort import kahn_layers

        nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 4)], "src long, dst long"
        )
        out = {r["node"]: r["layer"] for r in kahn_layers(spark, nodes, edges).collect()}
        assert out == {1: 0, 2: 1, 3: 2, 4: -1, 5: -1}

    def test_local_and_distributed_agree(self, spark):
        from code_graph_backend_spark.operators.toposort import (
            _LOCAL_E_CAP, kahn_layers,
        )
        import code_graph_backend_spark.operators.toposort as topo

        nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3), (6, 7)],
            "src long, dst long",
        )
        loc = kahn_layers(spark, nodes, edges).collect()
        old = topo._LOCAL_N_CAP
        try:
            topo._LOCAL_N_CAP = 0
            dist = kahn_layers(spark, nodes, edges).collect()
        finally:
            topo._LOCAL_N_CAP = old
        assert sorted(map(tuple, loc)) == sorted(map(tuple, dist))


class TestConcurrencyProfile:
    def test_overlapping_sessions(self, spark):
        """Two overlapping sessions on day 0 (peak 2), one on day 1."""
        rows = [
            (1, 1, _ts(0), "a"), (2, 1, _ts(100), "a"),      # u1: [0,100]
            (3, 2, _ts(50), "a"),                            # u2: [50,50]
            (4, 1, _ts(86400 + 10), "a"),                    # day 1
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["day"]: r["peak_concurrent"]
                for r in ext25.events_concurrency_profile_q(spark, td).collect()
            }
        assert out[0] == 2
        assert out[1] == 1


class TestPurchaseIntervals:
    def test_gap_buckets(self, spark):
        """Orders on days 0, 5, 40: gaps 5 (week bucket) and 35
        (quarter bucket)."""
        rows = [
            (1, 7, _EPOCH), (2, 7, _EPOCH + datetime.timedelta(days=5)),
            (3, 7, _EPOCH + datetime.timedelta(days=40)),
        ]
        o = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
        )
        with tempfile.TemporaryDirectory() as td:
            o.write.parquet(os.path.join(td, "orders.parquet"))
            out = {
                r["bucket"]: r
                for r in ext25.orders_purchase_intervals_q(spark, td).collect()
            }
        assert set(out) == {1, 3}
        assert (out[1]["n_intervals"], out[1]["total_days"]) == (1, 5)
        assert (out[3]["min_days"], out[3]["max_days"]) == (35, 35)
