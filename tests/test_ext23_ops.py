"""Round-5q operators: star-join OLAP shapes (trade flows, segment
share, Q22 prospects, hierarchy rollup)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext23 as ext23  # noqa: F401

_BASE = datetime.datetime(2024, 1, 1)


class TestCustomersProspects:
    def test_cross_multiplied_average_gate(self, spark):
        """Nation 1 balances: 10, 20, 30 (avg 20). Only 30 is strictly
        above; customer 3 (bal 30) has no orders -> 1 prospect.
        Customer 2 (bal 20) is AT the mean and must be excluded."""
        cust = spark.createDataFrame(
            [(1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0)],
            "c_custkey long, c_nationkey long, c_acctbal double",
        )
        orders = spark.createDataFrame(
            [(100, 1, _BASE)], "o_orderkey long, o_custkey long, o_orderdate timestamp"
        )
        nation = spark.createDataFrame(
            [(1, "ALPHA")], "n_nationkey long, n_name string"
        )
        with tempfile.TemporaryDirectory() as td:
            cust.write.parquet(os.path.join(td, "customer.parquet"))
            orders.write.parquet(os.path.join(td, "orders.parquet"))
            nation.write.parquet(os.path.join(td, "nation.parquet"))
            out = ext23.customers_prospects_q(spark, td).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["nation"], r["n_prospects"], r["total_bal"]) == ("ALPHA", 1, 30.0)


class TestPartHierarchyRollup:
    def test_short_type_and_levels(self, spark):
        """Types 'A B C', 'A B D', 'A' -> level rows for (A,*,*),
        (A,B,*), leaves; the 1-token part lands in (A,(all)-null
        leaves) without erroring under ANSI subscripts."""
        part = spark.createDataFrame(
            [(1, "A B C", 10.0), (2, "A B D", 20.0), (3, "A", 5.0)],
            "p_partkey long, p_type string, p_retailprice double",
        )
        with tempfile.TemporaryDirectory() as td:
            part.write.parquet(os.path.join(td, "part.parquet"))
            rows = {
                (r["t1"], r["t2"], r["t3"]): r
                for r in ext23.part_hierarchy_rollup_q(spark, td).collect()
            }
        assert rows[("A", "(all)", "(all)")]["n_parts"] == 3
        assert rows[("A", "(all)", "(all)")]["retail_value"] == 35.0
        assert rows[("A", "B", "(all)")]["n_parts"] == 2
        assert rows[("A", "B", "C")]["n_parts"] == 1
        # the 1-token part is a NULL leaf, not the subtotal
        assert rows[("A", "(none)", "(all)")]["n_parts"] == 1


class TestTradeFlowPlan:
    def test_dimensions_broadcast(self, spark):
        """The Q7 plan must broadcast every dimension: no SortMergeJoin
        against nation/customer/supplier, and the only shuffled join
        key is the order key."""
        plan = ext23.trade_flow_matrix_q(
            spark, "/root/testdata/sf0.001"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan