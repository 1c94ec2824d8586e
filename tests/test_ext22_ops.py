"""Round-5p operators: forecast backtest, SLA relational division,
LTV cohort triangle — semantics pinned on tiny hand-computable inputs."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext22 as ext22  # noqa: F401

_BASE = datetime.datetime(2024, 1, 1)


class TestForecastBacktest:
    def test_linear_series(self, spark):
        """x_d = d+1 for d=0..9: test days with both lags are 7,8,9 ->
        ae_naive = 3*1, ae_seasonal = 3*7, actual = 8+9+10."""
        rows = []
        eid = 0
        for d in range(10):
            for i in range(d + 1):
                eid += 1
                rows.append(
                    (eid, 1, _BASE + datetime.timedelta(days=d, seconds=i), "a")
                )
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext22.events_forecast_backtest_q(spark, td).collect()
        r = out[0]
        assert (r["n_test_days"], r["ae_naive"], r["ae_seasonal"], r["actual_total"]) == (
            3, 3, 21, 27
        )


class TestSlaDivision:
    def test_all_quantifier(self, spark):
        """Order 1 has a 40-day item (out), order 2 ships in 5 days
        (in): P1 -> 2 orders, 1 within SLA, 3 items."""
        orders = spark.createDataFrame(
            [(1, 10, "P1", _BASE), (2, 11, "P1", _BASE)],
            "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate timestamp",
        )
        li = spark.createDataFrame(
            [
                (1, _BASE + datetime.timedelta(days=10)),
                (1, _BASE + datetime.timedelta(days=40)),
                (2, _BASE + datetime.timedelta(days=5)),
            ],
            "l_orderkey long, l_shipdate timestamp",
        )
        with tempfile.TemporaryDirectory() as td:
            orders.write.parquet(os.path.join(td, "orders.parquet"))
            li.write.parquet(os.path.join(td, "lineitem.parquet"))
            out = ext22.orders_sla_division_q(spark, td).collect()
        r = out[0]
        assert (r["priority"], r["n_orders"], r["n_within_sla"], r["n_items"]) == (
            "P1", 2, 1, 3
        )


class TestLtvTriangle:
    def test_two_order_customer(self, spark):
        """Customer with orders in 2024-01 (100.0) and 2024-03 (50.0):
        cohort month index 24288, cells at months_since 0 and 2."""
        orders = spark.createDataFrame(
            [
                (1, 7, "P1", 100.0, _BASE),
                (2, 7, "P1", 50.0, datetime.datetime(2024, 3, 5)),
            ],
            "o_orderkey long, o_custkey long, o_orderpriority string,"
            " o_totalprice double, o_orderdate timestamp",
        )
        with tempfile.TemporaryDirectory() as td:
            orders.write.parquet(os.path.join(td, "orders.parquet"))
            out = {
                (r["cohort_month"], r["months_since"]): r
                for r in ext22.orders_ltv_triangle_q(spark, td).collect()
            }
        m0 = 2024 * 12 + 1 - 1
        assert set(out) == {(m0, 0), (m0, 2)}
        assert out[(m0, 0)]["revenue"] == 100.0
        assert out[(m0, 2)]["n_orders"] == 1
