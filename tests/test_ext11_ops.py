"""Round-5d operators: document chunking, n-gram novelty, corpus profile —
semantics pinned on tiny hand-computable inputs (the driver oracle
hash-checks the full corpus)."""

from __future__ import annotations

import code_graph_backend_spark.registry_ext11  # noqa: F401  (registers queries)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from code_graph_backend_spark.functions.text import chunk_documents

        docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(50)))])
        rows = chunk_documents(docs).collect()
        # starts 0, 24, 48 (< 50); sizes clamp at the end
        assert [(r["chunk_id"], r["start_word"], r["n_words"]) for r in rows] == [
            (0, 0, 32),
            (1, 24, 26),
            (2, 48, 2),
        ]

    def test_short_doc_single_chunk(self, spark):
        from code_graph_backend_spark.functions.text import chunk_documents

        docs = _docs(spark, [(7, "a b c")])
        rows = chunk_documents(docs).collect()
        assert len(rows) == 1
        assert rows[0]["n_words"] == 3 and rows[0]["start_word"] == 0

    def test_overlap_words_shared(self, spark):
        """Consecutive chunks share exactly size-stride=8 words: the md5
        of chunk 1's first 8 words equals the md5 over chunk 0's last 8."""
        from code_graph_backend_spark.functions.text import chunk_documents

        words = [f"w{i}" for i in range(40)]
        docs = _docs(spark, [(1, " ".join(words))])
        rows = {r["chunk_id"]: r for r in chunk_documents(docs).collect()}
        import hashlib

        assert rows[0]["chunk_md5"] == hashlib.md5(
            " ".join(words[0:32]).encode()
        ).hexdigest()
        assert rows[1]["chunk_md5"] == hashlib.md5(
            " ".join(words[24:40]).encode()
        ).hexdigest()

    def test_map_only_plan(self, spark):
        """Chunking must not shuffle: no Exchange below the final sort."""
        from code_graph_backend_spark.functions.text import chunk_documents

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
        # the only exchange allowed is the rangepartitioning for orderBy
        body = [
            ln for ln in plan.splitlines()
            if "Exchange" in ln and "rangepartitioning" not in ln
        ]
        assert body == [], body


class TestNgramNovelty:
    def test_first_seen_attribution(self, spark):
        from code_graph_backend_spark.functions.dedup import ngram_novelty

        base = " ".join(f"w{i}" for i in range(20))  # 8 distinct 13-grams
        docs = _docs(
            spark,
            [
                (1, base),
                (2, base + " x0 x1 x2 x3 x4 x5 x6 x7"),  # 8 old + 8 new
                (3, "too short"),
            ],
        )
        rows = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
        assert rows[1]["novelty_milli"] == 1000
        assert rows[2]["n_shingles"] == 16 and rows[2]["n_novel"] == 8
        assert rows[2]["novelty_milli"] == 500
        assert rows[3]["n_shingles"] == 0 and rows[3]["novelty_milli"] == 0

    def test_every_doc_reported(self, spark):
        from code_graph_backend_spark.functions.dedup import ngram_novelty

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert ngram_novelty(docs).count() == docs.count()


class TestCorpusProfile:
    def test_audit_columns(self, spark):
        from code_graph_backend_spark.registry import QUERIES

        rows = QUERIES["corpus_profile"](spark, "/root/testdata/sf0.001").collect()
        assert rows, "profile must emit one row per source"
        for r in rows:
            assert r["n_empty"] == 0 and r["n_inconsistent"] == 0
            assert r["n_ids"] == r["n_docs"]  # ids unique within source
            assert r["min_chars"] <= r["max_chars"]
            assert r["avg_chars_milli"] * r["n_docs"] <= 1000 * r["total_chars"]


class TestKCenterSelect:
    def test_greedy_invariants(self, spark):
        """Selection dists are non-increasing; seed is MIN(id); every
        selected point is at its reported min-distance from the
        earlier-chosen set."""
        from code_graph_backend_spark.functions.similarity import (
            kcenter_select_exact,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = kcenter_select_exact(emb, k=6).collect()
        assert rows[0]["sel_order"] == 0 and rows[0]["dist"] == 0
        assert rows[0]["vec_id"] == emb.agg({"vec_id": "min"}).first()[0]
        dists = [r["dist"] for r in rows[1:]]
        assert dists == sorted(dists, reverse=True)

        import numpy as np

        pdf = emb.toPandas().set_index("vec_id")
        q = {
            i: np.round(np.array(v, dtype=np.float64) * 1000).astype(np.int64)
            for i, v in pdf["embedding"].items()
        }
        chosen = [rows[0]["vec_id"]]
        for r in rows[1:]:
            d = min(int(((q[r["vec_id"]] - q[c]) ** 2).sum()) for c in chosen)
            assert d == r["dist"]
            chosen.append(r["vec_id"])

    def test_local_equals_distributed(self, spark):
        """The numpy fast path and the broadcast-join loop are the same
        algorithm: force the distributed path and compare exactly."""
        import code_graph_backend_spark.functions.similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        loc = [tuple(r) for r in sim.kcenter_select_exact(emb, k=5).collect()]
        old = sim._KCENTER_LOCAL_CELLS
        try:
            sim._KCENTER_LOCAL_CELLS = 0
            dist = [tuple(r) for r in sim.kcenter_select_exact(emb, k=5).collect()]
        finally:
            sim._KCENTER_LOCAL_CELLS = old
        assert loc == dist


class TestEventsUserEwma:
    def test_hand_computed_decay(self, spark):
        """Three events for one user: ewma_fp = v3*2^15 + v2*2^14 + v1*2^13
        in (ts, event_id) order."""
        from code_graph_backend_spark.registry import QUERIES
        import datetime as dt

        rows = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 10), 7, "c", 1.0, "{}"),
                (2, dt.datetime(2024, 1, 1, 11), 7, "c", 2.0, "{}"),
                (3, dt.datetime(2024, 1, 1, 12), 7, "c", 4.0, "{}"),
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        # drive the registered callable through a temp parquet dir
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            rows.write.parquet(os.path.join(td, "events.parquet"))
            got = {r["user_id"]: r for r in QUERIES["events_user_ewma"](spark, td).collect()}
        r = got[7]
        assert r["n_events"] == 3 and r["last_event_id"] == 3
        assert r["ewma_fp"] == 4000 * 2**15 + 2000 * 2**14 + 1000 * 2**13

    def test_one_row_per_user(self, spark):
        from code_graph_backend_spark.registry import QUERIES

        out = QUERIES["events_user_ewma"](spark, "/root/testdata/sf0.001")
        users = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        assert out.count() == users.select("user_id").distinct().count()


class TestAssortativity:
    def test_hand_computed_star_vs_chain(self, spark):
        """A 4-chain has src-outdeg/dst-indeg all 1 -> zero variance ->
        NULL; a graph where hubs point at leaves and leaves at hubs is
        disassortative (r < 0)."""
        from code_graph_backend_spark.registry import QUERIES
        import math

        rows = {
            r["type"]: r
            for r in QUERIES["graph_assortativity"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        # NEXT is the nation chain: every src outdeg=1, every dst indeg=1
        assert rows["NEXT"]["assortativity"] is None
        # IN_REGION: many nations -> few regions, constant outdeg 1 -> NULL
        assert rows["IN_REGION"]["assortativity"] is None
        # PLACED: customers -> unique orders (indeg const 1) -> NULL
        assert rows["PLACED"]["assortativity"] is None
        # CONTAINS has real degree variance on both ends
        r = rows["CONTAINS"]["assortativity"]
        assert r is not None and -1.0 <= r <= 1.0 and math.isfinite(r)

    def test_matches_numpy_pearson(self, spark):
        from code_graph_backend_spark.graph.tpch import build_graph
        from code_graph_backend_spark.registry import QUERIES
        import numpy as np

        g = build_graph(spark, "/root/testdata/sf0.001")
        e = g.edges.filter("type = 'CONTAINS'").select("src", "dst").toPandas()
        od = e.groupby("src").size()
        idg = e.groupby("dst").size()
        x = e["src"].map(od).to_numpy(float)
        y = e["dst"].map(idg).to_numpy(float)
        want = round(float(np.corrcoef(x, y)[0, 1]), 6)
        got = {
            r["type"]: r["assortativity"]
            for r in QUERIES["graph_assortativity"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }["CONTAINS"]
        assert abs(got - want) < 2e-6


class TestInt8Calibration:
    def test_roundtrip_error_bound(self, spark):
        """|127*q - c*scale| <= scale/2 by construction (nearest-code
        rounding): the max_abs_err column must respect it; saturation
        only at |q| = scale."""
        from code_graph_backend_spark.registry import QUERIES

        rows = QUERIES["emb_int8_calibration"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(rows) == 64
        for r in rows:
            assert r["max_abs_err"] <= (r["scale"] + 1) // 2 + 1
            assert 0 <= r["n_saturated"] <= r["n"]
            assert int(r["sum_sq_err"]) >= r["max_abs_err"] ** 2

    def test_hand_computed(self, spark):
        """Two 1-dim vectors 0.5 and -1.0: scale=1000, codes 64 and -127,
        errors |127*500-64*1000|=500 and 0."""
        from code_graph_backend_spark.functions.similarity import int8_calibration

        emb = spark.createDataFrame(
            [(1, [0.5]), (2, [-1.0])], "vec_id long, embedding array<double>"
        )
        r = int8_calibration(emb).collect()[0]
        assert r["scale"] == 1000 and r["n"] == 2
        assert r["n_saturated"] == 1
        assert r["max_abs_err"] == 500 and int(r["sum_sq_err"]) == 250000


class TestPersonalizedPagerank:
    def test_seed_floor_and_mass(self, spark):
        """Non-seed sinks only receive flowed mass; every seed holds at
        least the restart floor (1-d)/|S|; total mass <= 1 (dangling
        mass drops, same as the uniform variant)."""
        from code_graph_backend_spark.graph.tpch import build_graph
        from code_graph_backend_spark.operators.pagerank import (
            personalized_pagerank,
        )

        g = build_graph(spark, "/root/testdata/sf0.001")
        rows = personalized_pagerank(spark, g.nodes, g.edges).collect()
        n_seed = g.nodes.filter("id % 101 = 0").count()
        floor = round(0.15 / n_seed, 6)
        seeds = {r["node"]: r["rank"] for r in rows if r["node"] % 101 == 0}
        assert len(seeds) == n_seed
        assert all(v >= floor - 1e-9 for v in seeds.values())
        assert sum(r["rank"] for r in rows) <= 1.0 + 1e-6

    def test_local_equals_distributed(self, spark):
        import code_graph_backend_spark.operators.pagerank as pr
        from code_graph_backend_spark.graph.tpch import build_graph

        g = build_graph(spark, "/root/testdata/sf0.001")
        loc = {
            r["node"]: r["rank"]
            for r in pr.personalized_pagerank(spark, g.nodes, g.edges).collect()
        }
        old = pr._LOCAL_NODE_ROWS
        try:
            pr._LOCAL_NODE_ROWS = 0
            dist = {
                r["node"]: r["rank"]
                for r in pr.personalized_pagerank(spark, g.nodes, g.edges).collect()
            }
        finally:
            pr._LOCAL_NODE_ROWS = old
        assert loc.keys() == dist.keys()
        assert all(abs(loc[k] - dist[k]) < 2e-6 for k in loc)


class TestChunkDedupStats:
    def test_identical_docs_fully_shared(self, spark):
        from code_graph_backend_spark.registry import QUERIES
        import tempfile, os

        body = " ".join(f"w{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(1, body, "en", "a", len(body)),
             (2, body, "en", "a", len(body)),
             (3, "totally different words here", "en", "a", 28)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            rows = {r["doc_id"]: r for r in QUERIES["chunk_dedup_stats"](spark, td).collect()}
        assert rows[1]["shared_milli"] == 1000 and rows[2]["shared_milli"] == 1000
        assert rows[3]["n_shared_chunks"] == 0


class TestLangConfusionAndZipf:
    def test_confusion_marginals(self, spark):
        from code_graph_backend_spark.registry import QUERIES

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = QUERIES["corpus_lang_confusion"](spark, "/root/testdata/sf0.001").collect()
        assert sum(r["n"] for r in rows) == docs.count()

    def test_zipf_bands(self, spark):
        from code_graph_backend_spark.registry import QUERIES
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        total = docs.select(
            F.sum(F.size(F.split("text", " "))).alias("n")
        ).first()["n"]
        rows = QUERIES["vocab_zipf_spectrum"](spark, "/root/testdata/sf0.001").collect()
        assert sum(r["n_tokens"] for r in rows) == total
        for r in rows:
            assert r["freq_lo"] == 2 ** r["octave"]
