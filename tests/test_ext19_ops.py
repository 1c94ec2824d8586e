"""Round-5m operators: butterfly census, Luby MIS, zone-map pruning,
lateness profile, PMI collocations — semantics pinned on tiny
hand-computable inputs (the driver oracle hash-checks the full corpus
at three scales)."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext19 as ext19  # noqa: F401


class TestLubyMIS:
    def test_independence_and_coverage(self, spark):
        """On a 5-cycle the selected set is independent and every
        unselected node has a selected neighbor within 3 rounds."""
        from code_graph_backend_spark.operators.mis import luby_mis

        nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)], "src long, dst long"
        )
        sel = {r["node"] for r in luby_mis(spark, nodes, edges, rounds=3).collect()}
        adj = {1: {2, 5}, 2: {1, 3}, 3: {2, 4}, 4: {3, 5}, 5: {4, 1}}
        for v in sel:
            assert not (adj[v] & sel), "two adjacent nodes selected"
        for v in set(adj) - sel:
            assert adj[v] & sel, f"unselected node {v} has no selected neighbor"

    def test_triangle_selects_exactly_one(self, spark):
        """A triangle admits exactly one MIS member; the neighbors are
        removed the same round, so one round suffices."""
        from code_graph_backend_spark.operators.mis import luby_mis

        nodes = spark.createDataFrame([(i,) for i in [1, 2, 3]], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "src long, dst long"
        )
        out = luby_mis(spark, nodes, edges).collect()
        assert len(out) == 1
        assert out[0]["round"] == 1

    def test_isolated_node_wins_round_one(self, spark):
        """A node with no edges has no competitor: selected in round 1."""
        from code_graph_backend_spark.operators.mis import luby_mis

        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        rows = {r["node"]: r["round"] for r in luby_mis(spark, nodes, edges).collect()}
        assert rows[3] == 1
        # exactly one of the edge pair joins, and node 3 besides
        assert len(rows) == 2

    def test_local_and_distributed_paths_agree(self, spark):
        """The measured-size local path and the distributed rounds are
        the same bounded recurrence — identical rows on a fixture."""
        from code_graph_backend_spark.operators.mis import luby_mis

        nodes = spark.createDataFrame([(i,) for i in range(1, 13)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)] + [(1, 7), (3, 11), (2, 9)],
            "src long, dst long",
        )
        loc = luby_mis(spark, nodes, edges, rounds=3).collect()
        dist = luby_mis(
            spark, nodes, edges, rounds=3, local_caps=(0, 0)
        ).collect()
        assert [tuple(r) for r in loc] == [tuple(r) for r in dist]

    def test_matches_sql_twin_on_fixture(self, spark):
        """Spark kernel and the unrolled DuckDB twin agree row-for-row
        on a fixture graph (the same contract the driver grades)."""
        import duckdb

        from code_graph_backend_spark.operators.mis import luby_mis, luby_mis_sql

        node_rows = [(i,) for i in range(1, 11)]
        edge_rows = [(i, i + 1) for i in range(1, 10)] + [(1, 5), (2, 8)]
        nodes = spark.createDataFrame(node_rows, "id long")
        edges = spark.createDataFrame(edge_rows, "src long, dst long")
        got = [
            (r["round"], r["node"])
            for r in luby_mis(spark, nodes, edges, rounds=3).collect()
        ]
        nsql = " UNION ALL ".join(f"SELECT {i} AS id" for (i,) in node_rows)
        esql = " UNION ALL ".join(
            f"SELECT {s} AS src, {d} AS dst" for s, d in edge_rows
        )
        want = duckdb.sql(luby_mis_sql(nsql, esql, rounds=3)).fetchall()
        assert got == [(int(a), int(b)) for a, b in want]


class TestButterflyCount:
    def test_hand_counted_butterflies(self, spark):
        """Orders {10:[1,2,3], 20:[1,2], 30:[1,2]}: part pair (1,2)
        co-occurs in 3 orders -> C(3,2)=3 butterflies; every other pair
        co-occurs once and is gated out."""
        rows = [
            (10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (30, 1), (30, 2),
            (10, 1),  # duplicate lineitem must not double-count
        ]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        with tempfile.TemporaryDirectory() as td:
            li.write.parquet(os.path.join(td, "lineitem.parquet"))
            out = ext19.graph_butterfly_count_q(spark, td).collect()
        assert [(r["p1"], r["p2"], r["n_orders"], r["butterflies"]) for r in out] == [
            (1, 2, 3, 3)
        ]


class TestZonemapPrune:
    def test_clustered_layout_prunes_ingest_does_not(self, spark):
        """doc_id uncorrelated with n_chars: the by_length layout
        prunes every shard whose max is below the threshold; the
        ingest layout (id ranges) prunes nothing because every range
        mixes lengths."""
        import random

        rng = random.Random(7)
        lens = list(range(1, 513))
        rng.shuffle(lens)
        docs = spark.createDataFrame(
            [(i, lens[i - 1]) for i in range(1, 513)], "doc_id long, n_chars long"
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                (r["layout"], r["threshold"]): r
                for r in ext19.shard_zonemap_prune_q(spark, td).collect()
            }
        # by_length: 512 docs over 64 shards = 8 per shard, shard k holds
        # lengths 8k+1..8k+8; threshold 300 prunes shards with max < 300,
        # i.e. shards 0..36 (max 296) -> 37 shards, 296 rows avoided
        r = out[("by_length", 300)]
        assert (r["shards_pruned"], r["rows_avoided"]) == (37, 296)
        assert r["rows_matched"] == 512 - 299  # lengths 300..512
        # a random 8-doc id-range shard is occasionally all-short, so the
        # ingest layout may prune a stray shard — but never remotely as
        # many as the clustered layout
        assert out[("ingest", 300)]["shards_pruned"] <= 5

    def test_prune_never_lies(self, spark):
        """Invariant at the real corpus scale: rows_avoided never
        exceeds total rows minus rows_matched (a zone map may keep a
        shard with no matches, but must never drop a match)."""
        from code_graph_backend_spark.session import read_table

        sf = "/root/testdata/sf0.001"
        total = read_table(spark, sf, "documents").count()
        out = ext19.shard_zonemap_prune_q(spark, sf).collect()
        assert len(out) == 10
        for r in out:
            assert r["n_shards"] == 64
            assert r["rows_avoided"] <= total - r["rows_matched"]


class TestLatenessProfile:
    def test_hand_lateness(self, spark):
        """ids 1..3 keep arrival order under the MINSTD permutation;
        ts 100, 50, 200 -> event 2 arrives 50s late, others on time."""
        base = datetime.datetime(1970, 1, 1)
        rows = [
            (1, base + datetime.timedelta(seconds=100), "a"),
            (2, base + datetime.timedelta(seconds=50), "a"),
            (3, base + datetime.timedelta(seconds=200), "a"),
        ]
        ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext19.events_lateness_profile_q(spark, td).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_events"], r["n_late"], r["max_lateness_sec"]) == (3, 1, 50)
        assert (r["dropped_1m"], r["dropped_5m"], r["dropped_1h"]) == (0, 0, 0)


class TestPmiCollocations:
    def test_ratio_is_exact_integer_arithmetic(self, spark):
        """One doc 'x y x y x y x y x y z': n_xy=5, n_x=5, n_y=5, N=11
        -> ratio_micro = floor(5*11*1e6 / 25) = 2_200_000."""
        docs = spark.createDataFrame(
            [(1, "x y x y x y x y x y z")], "doc_id long, text string"
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                (r["a"], r["b"]): r
                for r in ext19.corpus_pmi_collocations_q(spark, td).collect()
            }
        r = out[("x", "y")]
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (5, 5, 5)
        assert r["ratio_micro"] == 5 * 11 * 1_000_000 // 25
        # (y,x) occurs only 4 times: gated by the min-count
        assert ("y", "x") not in out
