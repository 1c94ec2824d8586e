"""Round-4c operator tests: boilerplate detection, duplicated-substring
spans, the md5-HLL sketch, landmark BFS distances, exact bounded k-means.
Oracle parity is driver-checked; these tests pin the SEMANTICS on
hand-built inputs where the expected answer is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestBoilerplate:
    def test_header_flagged(self, spark):
        from code_graph_backend_spark.functions.boilerplate import boilerplate_stats

        header = "site nav home about contact terms"
        rows = [
            (i, f"{header} unique body {i} alpha beta gamma delta", "en", "web", 0)
            for i in range(8)
        ] + [(100, "totally different text here with many words indeed", "en", "web", 0)]
        out = boilerplate_stats(_docs(spark, rows), n=5).collect()
        by_id = {r.doc_id: r for r in out}
        # header shingles occur in 8/9 docs of the source -> >= 25% gate
        assert by_id[0].n_boiler > 0
        assert by_id[0].boiler_frac > 0.2
        # the singleton doc shares no shingle with anything
        assert by_id[100].n_boiler == 0

    def test_short_doc_no_crash(self, spark):
        # regression: sequence(1, 0) descends in Spark; a doc shorter than
        # n must yield zero shingles, not a slice(start=0) error
        from code_graph_backend_spark.functions.boilerplate import boilerplate_stats

        rows = [(1, "a b", "en", "s", 0), (2, "one two three four five six", "en", "s", 0)]
        out = boilerplate_stats(_docs(spark, rows), n=5).collect()
        assert {r.doc_id for r in out} == {2}


class TestSpans:
    def test_shared_run_merges_to_one_span(self, spark):
        from code_graph_backend_spark.functions.boilerplate import duplicated_spans

        shared = " ".join(f"s{i}" for i in range(20))  # 20 shared tokens
        rows = [
            (1, f"x1 x2 x3 {shared} y1 y2", "en", "s", 0),
            (2, f"z1 {shared} w1 w2 w3 w4", "en", "s", 0),
            (3, "completely unrelated text " + " ".join(f"u{i}" for i in range(20)), "en", "s", 0),
        ]
        out = duplicated_spans(_docs(spark, rows), n=13).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == {1, 2}
        (s1,) = by_doc[1]
        # doc 1: shared run covers tokens 4..23 (1-based); anchors at
        # positions 4..11 (8 x 13-grams), span_end = 11 + 12 = 23
        assert (s1.span_start, s1.span_end, s1.span_tokens, s1.n_anchors) == (4, 23, 20, 8)
        (s2,) = by_doc[2]
        assert (s2.span_start, s2.span_end, s2.span_tokens, s2.n_anchors) == (2, 21, 20, 8)

    def test_internal_repeat_not_cross_doc(self, spark):
        # a doc repeating its own 13-gram twice is NOT duplicated unless
        # another doc has it (df counts DISTINCT docs)
        from code_graph_backend_spark.functions.boilerplate import duplicated_spans

        run = " ".join(f"r{i}" for i in range(13))
        rows = [(1, f"{run} mid {run}", "en", "s", 0),
                (2, "other words " + " ".join(f"o{i}" for i in range(15)), "en", "s", 0)]
        out = duplicated_spans(_docs(spark, rows), n=13).collect()
        assert out == []


class TestHll:
    def test_estimate_close_and_exact_side(self, spark):
        from code_graph_backend_spark.functions.sketches import hll_distinct

        items = spark.range(0, 5000).select(
            F.lit("g").alias("grp"), F.concat(F.lit("item-"), F.col("id")).alias("i")
        )
        (row,) = hll_distinct(items, "grp", "i").collect()
        assert row.exact_distinct == 5000
        assert abs(row.rel_err) < 0.15  # ~6.5% std error at m=256

    def test_duplicates_do_not_move_registers(self, spark):
        from code_graph_backend_spark.functions.sketches import hll_distinct

        base = spark.range(0, 1000).select(
            F.lit("g").alias("grp"), F.concat(F.lit("x"), F.col("id")).alias("i")
        )
        dup = base.unionAll(base).unionAll(base)
        (a,) = hll_distinct(base, "grp", "i").collect()
        (b,) = hll_distinct(dup, "grp", "i").collect()
        assert a.hll_est == b.hll_est and a.exact_distinct == b.exact_distinct


class TestLandmarks:
    def test_chain_distances(self, spark):
        from code_graph_backend_spark.operators.landmarks import landmark_distances

        nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        out = landmark_distances(nodes, edges, n_landmarks=2, hops=3).collect()
        d = {(r.landmark, r.node): r.dist for r in out}
        assert d[(0, 0)] == 0 and d[(0, 3)] == 3 and (0, 4) not in d
        assert d[(1, 4)] == 3
        # direction matters: nothing reaches a landmark upstream
        assert (1, 0) not in d


class TestKmeansExact:
    def test_separated_clusters_recovered(self, spark):
        from code_graph_backend_spark.functions.similarity import kmeans_assign_exact

        import numpy as np

        rng = np.random.RandomState(7)
        rows = []
        for i in range(60):
            center = (i % 2) * 10.0  # two far-apart blobs on every dim
            vec = (center + rng.rand(8) * 0.5).tolist()
            rows.append((i, vec))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = kmeans_assign_exact(emb, k=2, rounds=2).collect()
        cells = {r.vec_id: r.cell for r in out}
        g0 = {cells[i] for i in range(0, 60, 2)}
        g1 = {cells[i] for i in range(1, 60, 2)}
        assert len(g0) == 1 and len(g1) == 1 and g0 != g1

    def test_deterministic(self, spark):
        from code_graph_backend_spark.functions.similarity import kmeans_assign_exact

        rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(30)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, kmeans_assign_exact(emb, k=3, rounds=2).collect()))
        b = sorted(map(tuple, kmeans_assign_exact(emb, k=3, rounds=2).collect()))
        assert a == b


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python Sennrich-style reference: word-frequency table, argmax
    pair (count desc, lhs, rhs), greedy-left merge per word."""
    tbl = {w: list(w) for w in words}
    rules = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for w, syms in tbl.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + words[w]
        if not counts:
            break
        (a, b), total = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((r, a, b, a + b, total))
        for w, syms in tbl.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            tbl[w] = out
    return rules


class TestBpeTrain:
    def test_matches_reference_implementation(self, spark):
        from code_graph_backend_spark.functions.bpe import bpe_train_merges

        import random

        rng = random.Random(42)
        alpha = "abcde"
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            for _ in range(120)
        ]
        text = " ".join(words)
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = [
            (r.merge_round, r.lhs, r.rhs, r.new_symbol, r.pair_count)
            for r in bpe_train_merges(docs, n_merges=5).orderBy("merge_round").collect()
        ]
        freq: dict[str, int] = {}
        for w in words:
            freq[w] = freq.get(w, 0) + 1
        assert got == _ref_bpe(freq, 5)

    def test_overlapping_run_greedy_left(self, spark):
        # 'aaaa' with top pair (a,a): greedy-left merges positions 1 and 3
        # -> 'aa aa'; round 2 then merges (aa, aa)
        from code_graph_backend_spark.functions.bpe import bpe_train_merges

        docs = spark.createDataFrame(
            [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
        )
        rules = bpe_train_merges(docs, n_merges=2).orderBy("merge_round").collect()
        assert (rules[0].lhs, rules[0].rhs, rules[0].pair_count) == ("a", "a", 9)
        assert (rules[1].lhs, rules[1].rhs, rules[1].pair_count) == ("aa", "aa", 3)


class TestHardNegatives:
    def test_same_label_never_returned(self, spark):
        from code_graph_backend_spark.functions.similarity import hard_negatives

        rows = [(i, [float(i % 3 + 1), float((i * 2) % 5 + 1)], i % 2) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        out = hard_negatives(emb.filter("vec_id < 4"), emb, k=3).collect()
        labels = {r[0]: r[2] for r in rows}
        assert len(out) == 12  # 4 anchors x 3
        for r in out:
            assert labels[r.qid] != labels[r.cid]

    def test_topk_is_most_similar_cross_label(self, spark):
        from code_graph_backend_spark.functions.similarity import hard_negatives

        import numpy as np

        # anchor 0 (label 0); candidates: near-parallel label-1 vector must
        # outrank an orthogonal label-1 vector
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),
                (1, [0.99, 0.1], 1),   # nearly parallel, other label
                (2, [0.0, 1.0], 1),    # orthogonal, other label
                (3, [1.0, 0.01], 0),   # same label — excluded even though closest
            ],
            "vec_id long, embedding array<double>, label int",
        )
        out = hard_negatives(emb.filter("vec_id = 0"), emb, k=1).collect()
        assert len(out) == 1 and out[0].cid == 1


class TestBpeApply:
    def test_counts_match_trained_table(self, spark):
        from code_graph_backend_spark.functions.bpe import (
            bpe_apply_token_counts, bpe_train,
        )

        docs = spark.createDataFrame(
            [(1, "low low lower lowest"), (2, "low lowest")],
            "doc_id long, text string",
        )
        _, wt = bpe_train(docs, n_merges=3)
        wlen = {r.word: len(r.w.split(" ")) for r in wt.collect()}
        out = {r.doc_id: r for r in bpe_apply_token_counts(docs, n_merges=3).collect()}
        assert out[1].n_words == 4
        assert out[1].n_bpe_tokens == 2 * wlen["low"] + wlen["lower"] + wlen["lowest"]
        assert out[2].n_bpe_tokens == wlen["low"] + wlen["lowest"]
        # merges strictly shrink symbol counts vs characters
        assert out[1].n_bpe_tokens < sum(len(w) for w in "low low lower lowest".split())


class TestHllMerge:
    def test_merged_equals_global(self, spark):
        from code_graph_backend_spark.functions.sketches import (
            hll_distinct, hll_merge_distinct,
        )

        items = spark.range(0, 3000).select(
            (F.col("id") % 7).cast("string").alias("shard"),
            F.concat(F.lit("t"), (F.col("id") % 1100)).alias("i"),
        )
        (m,) = hll_merge_distinct(items, "shard", "i").collect()
        # single-sketch estimate over the same items, one global group
        one = items.select(F.lit("g").alias("g"), "i")
        (g,) = hll_distinct(one, "g", "i").collect()
        assert m.hll_est == g.hll_est  # merge == global, bit-identical
        assert m.exact_distinct == 1100
        assert m.n_shards == 7


class TestTrending:
    def test_rank_and_ties(self, spark):
        from code_graph_backend_spark.streaming.windows import trending

        import datetime as dt

        base = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = (
            [(base, "b", 0.0)] * 3
            + [(base, "a", 0.0)] * 3
            + [(base, "c", 0.0)] * 1
            + [(base + dt.timedelta(hours=1), "c", 0.0)] * 2
        )
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        out = trending(ev, "1 hour", k=2).orderBy("window_start", "rnk").collect()
        # hour 10: a and b tie at 3 -> 'a' first lexicographically
        assert [(r.event_type, r.n_events, r.rnk) for r in out[:2]] == [
            ("a", 3, 1), ("b", 3, 2),
        ]
        assert (out[2].event_type, out[2].n_events, out[2].rnk) == ("c", 2, 1)


class TestWccBounded:
    def test_two_components(self, spark):
        from code_graph_backend_spark.operators.labelprop import wcc_bounded

        nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
        # component {0,1,2,3} as a chain, component {5,6}, isolated 4
        edges = spark.createDataFrame(
            [(1, 0), (2, 1), (3, 2), (6, 5)], "src long, dst long"
        )
        out = wcc_bounded(spark, nodes, edges, rounds=4).collect()
        comp = {r.node: r.comp for r in out}
        assert comp[0] == comp[1] == comp[2] == comp[3] == 0
        assert comp[5] == comp[6] == 5
        assert comp[4] == 4

    def test_bounded_rounds_limit_propagation(self, spark):
        from code_graph_backend_spark.operators.labelprop import wcc_bounded

        # a 6-chain: min label 0 reaches distance <= rounds only
        nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(5)], "src long, dst long"
        )
        out = wcc_bounded(spark, nodes, edges, rounds=2).collect()
        comp = {r.node: r.comp for r in out}
        assert comp[2] == 0 and comp[5] == 3  # label 0 traveled 2 hops only


class TestPowerIteration:
    def test_exact_against_bigint_reference(self, spark):
        from code_graph_backend_spark.functions.similarity import power_iteration_exact

        import numpy as np

        rng = np.random.RandomState(3)
        spike = rng.rand(6)
        rows = []
        for i in range(40):
            vec = spike * (i % 5 + 1) + rng.rand(6) * 0.1
            rows.append((i, vec.tolist()))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.dim: int(r.w) for r in power_iteration_exact(emb, rounds=2).collect()}

        # exact python-int reference of v = (X^T X)^2 * 1 over quantized dims
        Q = [[int(round(x * 1000)) for x in vec] for _, vec in rows]
        v = [1] * 6
        for _ in range(2):
            u = [sum(q * w for q, w in zip(row, v)) for row in Q]
            v = [sum(Q[i][j] * u[i] for i in range(len(Q))) for j in range(6)]
        assert out == {j + 1: v[j] for j in range(6)}

        # and the direction matches numpy's dominant eigenvector
        A = np.array(Q, dtype=np.float64)
        w_np = np.linalg.eigh(A.T @ A)[1][:, -1]
        got = np.array([out[j + 1] for j in range(6)], dtype=np.float64)
        cos = abs(got @ w_np) / (np.linalg.norm(got) * np.linalg.norm(w_np))
        assert cos > 0.99
