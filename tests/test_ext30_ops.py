"""Round-5x operator: ANF sketch — parity with a pure-Python replica
of the register/estimator arithmetic on a hand graph."""

from __future__ import annotations

import hashlib

import code_graph_backend_spark.registry_ext30 as ext30  # noqa: F401
from code_graph_backend_spark.registry_ext30 import _K, _LC_MICRO, _RAW_GATE, _SCALE


def _reg(x: int):
    h = hashlib.md5(str(x).encode()).hexdigest()
    bucket = int(h[:2], 16)
    bits = int(h[2:14], 16)
    rho = 49 if bits == 0 else (48 - bits.bit_length()) + 1
    return bucket, rho


def _est_micro(members):
    regs = {}
    for x in members:
        b, r = _reg(x)
        regs[b] = max(regs.get(b, 0), r)
    s_int = sum(1 << (49 - m) for m in regs.values()) + (256 - len(regs)) * _SCALE
    zv = 256 - len(regs)
    raw = _K // s_int
    if zv > 0 and raw <= _RAW_GATE:
        return _LC_MICRO[zv]
    return raw


class TestAnfSketch:
    def test_path_graph_matches_python_replica(self, spark):
        """Path 1-2-3: hop-0 balls are singletons, hop-1 balls are the
        closed neighborhoods, hop-2 balls are the full component — the
        engine totals must equal the pure-Python register replica."""
        from pyspark.sql import functions as F

        from code_graph_backend_spark.functions.sketches import (
            hll_register_table,
        )

        nodes = [1, 2, 3]
        balls = {
            0: {1: {1}, 2: {2}, 3: {3}},
            1: {1: {1, 2}, 2: {1, 2, 3}, 3: {2, 3}},
            2: {1: {1, 2, 3}, 2: {1, 2, 3}, 3: {1, 2, 3}},
        }
        want = {
            h: sum(_est_micro(balls[h][v]) for v in nodes) for h in balls
        }
        ndf = spark.createDataFrame([(i,) for i in nodes], "id long")
        edf = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        # run the registered query's machinery directly on the fixture
        sym = edf.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
            edf.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        items = ndf.select(F.col("id").alias("grp"), F.col("id").alias("it"))
        r = hll_register_table(items, "grp", "it")
        got = {}
        for h in range(3):
            if h > 0:
                nbr = sym.join(r.withColumnRenamed("grp", "b"), "b").select(
                    F.col("a").alias("grp"), "bucket", "m"
                )
                r = r.unionByName(nbr).groupBy("grp", "bucket").agg(
                    F.max("m").alias("m")
                )
            agged = r.groupBy("grp").agg(
                (
                    F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - m)"))
                    + (F.lit(256) - F.count("*")) * F.lit(_SCALE)
                ).alias("s_int"),
                (F.lit(256) - F.count("*")).cast("long").alias("zv"),
            )
            rows = agged.collect()
            tot = 0
            for row in rows:
                raw = _K // row["s_int"]
                if row["zv"] > 0 and raw <= _RAW_GATE:
                    tot += _LC_MICRO[row["zv"]]
                else:
                    tot += raw
            got[h] = tot
        assert got == want


class TestAnfDuality:
    """Round-6 physical rework: the registered query routes through a
    driver-local sparse scatter kernel below the measured-size caps and
    a packed-BINARY mapInPandas twin above them. Both must equal the
    pure-Python register replica, and each other."""

    def _fixture(self, spark):
        from types import SimpleNamespace

        ndf = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5]], "id long")
        # path 1-2-3 plus a 4-5 pair: two components, exercises both
        # propagation and the isolated-ish small component
        edf = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "src long, dst long"
        )
        return SimpleNamespace(nodes=ndf, edges=edf)

    def _want(self):
        balls = {
            0: {1: {1}, 2: {2}, 3: {3}, 4: {4}, 5: {5}},
            1: {1: {1, 2}, 2: {1, 2, 3}, 3: {2, 3}, 4: {4, 5}, 5: {4, 5}},
            2: {
                1: {1, 2, 3}, 2: {1, 2, 3}, 3: {1, 2, 3},
                4: {4, 5}, 5: {4, 5},
            },
        }
        return {
            h: sum(_est_micro(balls[h][v]) for v in balls[h])
            for h in balls
        }

    def test_local_kernel_matches_replica(self, spark):
        from code_graph_backend_spark.operators.undirected import und_cached

        g = self._fixture(spark)
        got = {
            r["hop"]: r["sum_ball_micro"]
            for r in ext30._anf_local(
                spark, g, und_cached(spark, g.edges)
            ).collect()
        }
        assert got == self._want()

    def test_distributed_twin_matches_local_and_replica(self, spark):
        from code_graph_backend_spark.operators.undirected import und_cached

        g = self._fixture(spark)
        got = {
            r["hop"]: r["sum_ball_micro"]
            for r in ext30._anf_distributed(
                spark, g, und_cached(spark, g.edges)
            ).collect()
        }
        assert got == self._want()

    def test_caps_route_to_distributed(self, spark, monkeypatch):
        """cap=0 forces the registered query itself down the at-scale
        branch (landmarks/stress/mst convention) — the distributed twin
        is never first-executed in production."""
        monkeypatch.setattr(ext30, "_LOCAL_N_CAP", 0)
        monkeypatch.setattr(ext30, "_LOCAL_E_CAP", 0)
        df = ext30.graph_anf_sketch_q(spark, "/root/testdata/sf0.001")
        rows = {r["hop"]: r["sum_ball_micro"] for r in df.collect()}
        monkeypatch.undo()
        df2 = ext30.graph_anf_sketch_q(spark, "/root/testdata/sf0.001")
        rows2 = {r["hop"]: r["sum_ball_micro"] for r in df2.collect()}
        assert rows == rows2 and len(rows) == 3

    def test_zero_edge_graph(self, spark):
        from types import SimpleNamespace

        from code_graph_backend_spark.operators.undirected import und_cached

        ndf = spark.createDataFrame([(7,), (9,)], "id long")
        edf = spark.createDataFrame([], "src long, dst long")
        g = SimpleNamespace(nodes=ndf, edges=edf)
        want = _est_micro({7}) + _est_micro({9})
        for fn in (ext30._anf_local, ext30._anf_distributed):
            got = {
                r["hop"]: r["sum_ball_micro"]
                for r in fn(spark, g, und_cached(spark, g.edges)).collect()
            }
            assert got == {0: want, 1: want, 2: want}, fn.__name__


class TestAnfProperty:
    def test_random_graphs_match_exact_ball_replica(self, spark):
        """Property pin: on random small graphs, the kernel's per-hop
        totals equal the pure-Python estimator applied to EXACT ball
        memberships (registers of a ball are derivable from its member
        set, so the sketch total is a deterministic function of the
        true balls — approximate estimate, exact arithmetic)."""
        import random

        from types import SimpleNamespace

        from code_graph_backend_spark.operators.undirected import und_cached

        rng = random.Random(20260815)
        for trial in range(6):
            n = rng.randint(1, 22)
            ids = rng.sample(range(1, 1000), n)
            m = rng.randint(0, min(40, n * (n - 1) // 2 + 2))
            pairs = {
                tuple(rng.sample(ids, 2)) for _ in range(m) if n >= 2
            }
            adj = {v: set() for v in ids}
            for u, v in pairs:
                adj[u].add(v)
                adj[v].add(u)
            balls = {v: {v} for v in ids}
            want = {}
            for hop in range(3):
                if hop:
                    balls = {
                        v: b | set().union(*(balls_prev[u] for u in adj[v]))
                        if adj[v] else set(b)
                        for v, b in balls.items()
                    }
                balls_prev = {v: set(b) for v, b in balls.items()}
                want[hop] = sum(_est_micro(b) for b in balls.values())
            ndf = spark.createDataFrame([(i,) for i in ids], "id long")
            edf = spark.createDataFrame(
                [(u, v) for u, v in pairs] or [], "src long, dst long"
            )
            g = SimpleNamespace(nodes=ndf, edges=edf)
            got = {
                r["hop"]: r["sum_ball_micro"]
                for r in ext30._anf_local(
                    spark, g, und_cached(spark, g.edges)
                ).collect()
            }
            assert got == want, f"trial {trial}: n={n} edges={sorted(pairs)}"


class TestAnfNativeKernel:
    """r11 optimization pin: the C scatter-max (functions/native.py) must
    be bit-equal to the numpy fallback on a graph big enough to exercise
    the CSR hop-2 expansion and the receiver-range threading (the
    element-wise max is order-free, so any divergence is a real bug)."""

    def test_native_and_numpy_paths_equal(self, spark, monkeypatch):
        import random
        from types import SimpleNamespace

        import pytest

        from code_graph_backend_spark.functions import native
        from code_graph_backend_spark.operators.undirected import und_cached

        if native.load_kernels() is None:
            pytest.skip("no C compiler on this box")

        rng = random.Random(20260817)
        ids = rng.sample(range(1, 100_000), 400)
        pairs = sorted({tuple(rng.sample(ids, 2)) for _ in range(2500)})
        ndf = spark.createDataFrame([(i,) for i in ids], "id long")
        edf = spark.createDataFrame(pairs, "src long, dst long")
        g = SimpleNamespace(nodes=ndf, edges=edf)
        und = und_cached(spark, g.edges)
        got_native = {
            r["hop"]: (r["n_nodes"], r["sum_ball_micro"])
            for r in ext30._anf_local(spark, g, und).collect()
        }
        monkeypatch.setattr(native, "_TRIED", True)
        monkeypatch.setattr(native, "_LIB", None)
        got_numpy = {
            r["hop"]: (r["n_nodes"], r["sum_ball_micro"])
            for r in ext30._anf_local(spark, g, und).collect()
        }
        assert got_native == got_numpy and len(got_native) == 3
