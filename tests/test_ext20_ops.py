"""Round-5n operators: basket rules, Gini engagement, seasonality
chi-square, Markov mixing — semantics pinned on tiny hand-computable
inputs (the driver oracle hash-checks the full corpus at three
scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext20 as ext20  # noqa: F401

_EPOCH = datetime.datetime(1970, 1, 1)


def _ts(sec: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=sec)


class TestBasketRules:
    def test_hand_counted_rules(self, spark):
        """Baskets {1:[10,20], 2:[10,20], 3:[10,20], 4:[10,30]}:
        pair (10,20) has support 3 (kept), (10,30) support 1 (gated).
        N=4, n(10)=4, n(20)=3."""
        rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 10), (4, 30)]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        with tempfile.TemporaryDirectory() as td:
            li.write.parquet(os.path.join(td, "lineitem.parquet"))
            out = {
                (r["antecedent"], r["consequent"]): r
                for r in ext20.orders_basket_rules_q(spark, td).collect()
            }
        assert set(out) == {(10, 20), (20, 10)}
        r = out[(10, 20)]
        assert (r["support"], r["conf_micro"], r["lift_micro"]) == (
            3, 3_000_000 // 4, 3 * 4 * 1_000_000 // (4 * 3)
        )
        assert out[(20, 10)]["conf_micro"] == 1_000_000


class TestGiniEngagement:
    def test_two_user_gini(self, spark):
        """Counts {u1:1, u2:3}: sorted i=1,2; num = (2-3)*1 + (4-3)*3
        = 2, den = 2*4 = 8 -> G = 0.25."""
        rows = [(1, 1, _ts(10), "a"), (2, 2, _ts(20), "a"),
                (3, 2, _ts(30), "a"), (4, 2, _ts(40), "a")]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext20.events_gini_engagement_q(spark, td).collect()
        r = out[0]
        assert (r["n_users"], r["total_events"], r["gini_num"], r["gini_den"]) == (
            2, 4, 2, 8
        )

    def test_uniform_counts_zero_gini(self, spark):
        """Equal per-user counts -> gini_num = 0 exactly."""
        rows = [(i, i % 3, _ts(i), "b") for i in range(6)]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext20.events_gini_engagement_q(spark, td).collect()
        assert out[0]["gini_num"] == 0


class TestSeasonality:
    def test_hand_chi_square(self, spark):
        """Cells: (dow=4,h=0) n=2 (epoch day 0 is a Thursday) and
        (dow=5,h=1) n=1; N=3, k=2 ->
        chi2_num = (336-3)^2 + (168-3)^2 + 166*9 = 139608."""
        rows = [(1, 1, _ts(0), "a"), (2, 1, _ts(1800), "a"),
                (3, 1, _ts(25 * 3600), "a")]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext20.events_seasonality_q(spark, td).collect()
        r = out[0]
        assert (r["n_events"], r["n_cells_nonzero"]) == (3, 2)
        assert r["chi2_num"] == 333**2 + 165**2 + 166 * 9
        assert r["chi2_den"] == 504


class TestMarkovMixing:
    def test_absorbing_free_chain(self, spark):
        """One user, events A,A,B: transitions A->A, A->B (rowsum 2).
        states = {A}; p0(A) = 1e6; each step halves and splits:
        step1 A=B=500000, step2 A=B=250000 (B's mass exits the chain —
        B never occurs as a source), step3 A=B=125000."""
        rows = [(1, 1, _ts(10), "A"), (2, 1, _ts(20), "A"), (3, 1, _ts(30), "B")]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                (r["step"], r["event_type"]): r["prob_micro"]
                for r in ext20.events_markov_mixing_q(spark, td).collect()
            }
        assert out[(0, "A")] == 1_000_000
        assert out[(1, "A")] == 500_000 and out[(1, "B")] == 500_000
        assert out[(2, "A")] == 250_000 and out[(2, "B")] == 250_000
        assert out[(3, "A")] == 125_000 and out[(3, "B")] == 125_000
