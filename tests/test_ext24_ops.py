"""Round-5r operators: SCD2 gaps-and-islands, DQ checks, Benford."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext24 as ext24  # noqa: F401

_BASE = datetime.datetime(1970, 1, 1)


def _ts(sec):
    return _BASE + datetime.timedelta(seconds=sec)


class TestScd2:
    def test_islands_compress_runs(self, spark):
        """User 1: A A B A -> three versions (A[10,20], B[30,30],
        A[40,40]) — the same value reappearing starts a NEW version."""
        rows = [
            (1, 1, _ts(10), "A"), (2, 1, _ts(20), "A"),
            (3, 1, _ts(30), "B"), (4, 1, _ts(40), "A"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = [
                (r["version"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
                for r in ext24.events_scd2_dimension_q(spark, td).collect()
            ]
        # the first row flags a change vs the NULL lag, so versions
        # start at 1 (identical on both engines)
        assert out == [(1, "A", 10, 20, 2), (2, "B", 30, 30, 1), (3, "A", 40, 40, 1)]


class TestDqChecks:
    def test_engineered_violations(self, spark):
        orders = spark.createDataFrame(
            [(1, _ts(0)), (1, _ts(0)), (2, _ts(100))],  # dup key 1
            "o_orderkey long, o_orderdate timestamp",
        )
        li = spark.createDataFrame(
            [
                (1, 10.0, 0.1, _ts(50)),     # fine
                (9, 10.0, 0.1, _ts(50)),     # orphan (no order 9)
                (2, -5.0, 1.5, _ts(0)),      # nonpositive price + bad discount
                (2, 10.0, 0.2, _ts(10)),     # ship before order (10 < 100)
            ],
            "l_orderkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
        )
        with tempfile.TemporaryDirectory() as td:
            orders.write.parquet(os.path.join(td, "orders.parquet"))
            li.write.parquet(os.path.join(td, "lineitem.parquet"))
            out = {
                r["check_name"]: r["violations"]
                for r in ext24.dq_referential_checks_q(spark, td).collect()
            }
        assert out["orphan_lineitems"] == 1
        assert out["childless_orders"] == 0
        assert out["dup_order_keys"] == 1
        assert out["nonpositive_prices"] == 1
        assert out["bad_discounts"] == 1
        assert out["ship_before_order"] == 2  # both order-2 items precede ts 100


class TestBenford:
    def test_first_digit_truncates(self, spark):
        """999.7 must count as digit 9 (floor), never 1 (round)."""
        orders = spark.createDataFrame(
            [(1, 999.7), (2, 123.4), (3, 100.0), (4, 0.5)],
            "o_orderkey long, o_totalprice double",
        )
        with tempfile.TemporaryDirectory() as td:
            orders.write.parquet(os.path.join(td, "orders.parquet"))
            out = {
                r["digit"]: r for r in
                ext24.orders_benford_firstdigit_q(spark, td).collect()
            }
        assert out[9]["n"] == 1
        assert out[1]["n"] == 2  # 123.4 and 100.0; 0.5 filtered
        # expected_n for digit 1: floor(3 * 301029 / 1e6) = 0 at n=3
        assert out[1]["expected_n"] == 3 * 301029 // 1_000_000
