"""Round-5w operators: Z-order layout pruning, single-source risk."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext29 as ext29  # noqa: F401


class TestMorton:
    def test_interleave_formula(self, spark):
        """morton(un=0b11, tn=0b01) = u bits at odd positions, t bits
        at even: 0b1011 = 11."""
        from code_graph_backend_spark.registry_ext29 import _morton_sql

        row = spark.sql(
            f"SELECT ({_morton_sql('3', '1')}) AS z"
        ).collect()[0]
        assert row["z"] == 0b1011

    def test_zorder_prunes_both_dimensions(self, spark):
        """On the real corpus the Morton layout must prune BOTH
        single-dimension predicates, while each linear layout prunes
        exactly one."""
        out = {
            (r["layout"], r["predicate"]): r["shards_pruned"]
            for r in ext29.shard_zorder_prune_q(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        # tiny shards at sf0.001 can prune a few foreign-dimension
        # shards by luck — assert the ORDERING, not absolute zeros
        assert out[("by_time", "time_day0")] > out[("by_time", "user_low16")]
        assert out[("by_user", "user_low16")] > out[("by_user", "time_day0")]
        assert out[("zorder", "time_day0")] > 0
        assert out[("zorder", "user_low16")] > 0
        assert out[("zorder", "both")] >= max(
            out[("zorder", "time_day0")], out[("zorder", "user_low16")]
        )


class TestSingleSourceRisk:
    def test_hand_counts(self, spark):
        """Part 1 has one supplier (risk), part 2 has two (safe)."""
        li = spark.createDataFrame(
            [(1, 10, 100.0, 0.0), (1, 10, 50.0, 0.5), (2, 10, 30.0, 0.0),
             (2, 11, 30.0, 0.0)],
            "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
        )
        su = spark.createDataFrame(
            [(10, 5), (11, 5)], "s_suppkey long, s_nationkey long"
        )
        na = spark.createDataFrame([(5, "N5")], "n_nationkey long, n_name string")
        with tempfile.TemporaryDirectory() as td:
            li.write.parquet(os.path.join(td, "lineitem.parquet"))
            su.write.parquet(os.path.join(td, "supplier.parquet"))
            na.write.parquet(os.path.join(td, "nation.parquet"))
            out = ext29.supply_risk_single_source_q(spark, td).collect()
        r = out[0]
        assert (r["nation"], r["n_single_source_parts"], r["n_items"]) == ("N5", 1, 2)
        assert r["exposed_revenue"] == 100.0 + 25.0
