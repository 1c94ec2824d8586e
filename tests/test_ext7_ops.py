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
