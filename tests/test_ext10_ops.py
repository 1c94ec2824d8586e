"""Round-5b sketch operators: Bloom-filter decontamination and Count-Min
heavy hitters — semantics pinned on tiny hand-computable corpora plus the
merge properties that make each sketch the at-scale structure (the driver
oracle hash-checks the full corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import code_graph_backend_spark.registry_ext10  # noqa: F401  (registers queries)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContaminationBloom:
    def test_supersets_exact_join(self, spark):
        """Bloom has zero false negatives: every doc the exact shingle
        join flags, the filter flags."""
        from code_graph_backend_spark.functions.sampling import (
            contamination_bloom, contamination_ngram,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        probes = docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("probe_id"), F.col("text").alias("probe_text")
        )
        exact = {
            r["doc_id"]
            for r in contamination_ngram(docs, probes).select("doc_id").collect()
        }
        bloom = {
            r["doc_id"]: r["n_flagged"]
            for r in contamination_bloom(
                docs, probes.select("probe_text")
            ).collect()
        }
        assert exact <= {d for d, n in bloom.items() if n > 0}
        # and the filter emits a row for EVERY document
        assert len(bloom) == docs.count()

    def test_hand_computed(self, spark):
        """A doc sharing a 13-gram with the probe is flagged; a disjoint
        doc with enough tokens is (modulo the documented fp rate,
        checked exactly here) not."""
        from code_graph_backend_spark.functions.sampling import (
            contamination_bloom,
        )

        shared = " ".join(f"w{i}" for i in range(13))
        docs = _docs(
            spark,
            [
                (1, shared + " tail1 tail2"),
                (2, " ".join(f"z{i}" for i in range(15))),
                (3, "short doc"),  # < 13 tokens: zero shingles
            ],
        )
        probes = spark.createDataFrame(
            [(shared + " other",)], "probe_text string"
        )
        rows = {r["doc_id"]: r for r in contamination_bloom(docs, probes).collect()}
        assert rows[1]["flagged"] and rows[1]["n_flagged"] >= 1
        assert not rows[2]["flagged"]
        assert rows[3]["n_flagged"] == 0 and not rows[3]["flagged"]

    def test_merge_is_union(self, spark):
        """Bitwise-OR mergeability: the filter built from probes A∪B
        flags exactly what max(filter A, filter B) flags — benchmark
        suites can be indexed independently."""
        from code_graph_backend_spark.functions.sampling import (
            contamination_bloom,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
        pa = docs.filter(F.col("doc_id") % 7 == 0).select(
            F.col("text").alias("probe_text")
        )
        pb = docs.filter(F.col("doc_id") % 11 == 0).select(
            F.col("text").alias("probe_text")
        )
        both = contamination_bloom(docs, pa.union(pb))
        fa = {r["doc_id"]: r["flagged"] for r in contamination_bloom(docs, pa).collect()}
        fb = {r["doc_id"]: r["flagged"] for r in contamination_bloom(docs, pb).collect()}
        for r in both.collect():
            assert r["flagged"] == (fa[r["doc_id"]] or fb[r["doc_id"]])


class TestCmsHeavyHitters:
    def test_hand_computed_overcount_bound(self, spark):
        """CMS never undercounts, and the true top token surfaces with
        est >= exact."""
        from code_graph_backend_spark.functions.sketches import (
            cms_heavy_hitters,
        )

        docs = _docs(
            spark,
            [(i, "alpha beta " + ("alpha " * 5).strip()) for i in range(20)],
        )
        rows = {r["token"]: r for r in cms_heavy_hitters(docs, top_k=5).collect()}
        assert rows["alpha"]["exact_count"] == 120
        assert rows["beta"]["exact_count"] == 20
        for r in rows.values():
            assert r["overcount"] >= 0
            assert r["est_count"] == r["exact_count"] + r["overcount"]

    def test_counters_merge_by_addition(self, spark):
        """The property that makes CMS the 100 TB answer: the counter
        table over A∪B equals the per-shard counter tables summed
        register-wise — sketches from independent ingest jobs combine
        without re-reading tokens."""
        from code_graph_backend_spark.functions.sketches import (
            _cms_pos, _j_array,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
        half_a = docs.filter(F.col("doc_id") % 2 == 0)
        half_b = docs.filter(F.col("doc_id") % 2 == 1)

        def counters(d):
            toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
            return (
                toks.select(F.explode(_j_array()).alias("j"), "tok")
                .select("j", _cms_pos(F.col("tok"), F.col("j")).alias("pos"))
                .groupBy("j", "pos")
                .agg(F.count("*").alias("cnt"))
            )

        merged = (
            counters(half_a)
            .unionByName(counters(half_b))
            .groupBy("j", "pos")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = counters(docs)
        m = {(r["j"], r["pos"]): r["cnt"] for r in merged.collect()}
        w = {(r["j"], r["pos"]): r["cnt"] for r in whole.collect()}
        assert m == w

    def test_heavy_hitter_rank_matches_exact(self, spark):
        """On the real corpus the CMS top-20 ordering must track the
        exact counts closely: every reported token's relative overcount
        stays under the 2N/w theory bound."""
        from code_graph_backend_spark.functions.sketches import (
            cms_heavy_hitters, _CMS_W,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_tokens = docs.select(
            F.sum(F.size(F.split("text", " "))).alias("n")
        ).collect()[0]["n"]
        for r in cms_heavy_hitters(docs).collect():
            assert 0 <= r["overcount"] <= 2 * n_tokens / _CMS_W


class TestSccBounded:
    def _run(self, spark, edge_rows, **kw):
        from code_graph_backend_spark.operators.scc import scc_bounded

        e = spark.createDataFrame(edge_rows, "src long, dst long")
        return {
            r["node"]: (r["scc_id"], r["status"])
            for r in scc_bounded(spark, e, **kw).collect()
        }

    def test_two_cycles_bridge_tendril(self, spark):
        """1->2->3->1 and 10->11->10, bridged 3->10, tendril 10->20:
        two confirmed SCCs, tendril + nothing else merged. The
        downstream cycle sees b=1 via the bridge, so it needs the second
        peel (Multistep) to agree."""
        out = self._run(
            spark,
            [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10), (20, 21)],
            trim_rounds=2, hops=4, peels=2,
        )
        assert out[1] == (1, "core") and out[2] == (1, "core")
        assert out[3] == (1, "core")
        assert out[10] == (10, "core") and out[11] == (10, "core")
        # 20/21 are on no cycle: trimmed as provable singletons
        assert out[20] == (20, "singleton")
        assert out[21] == (21, "singleton")

    def test_trim_is_exact_never_on_cycle(self, spark):
        """A chain into a cycle: chain nodes trim (singletons), cycle
        confirms — and no trimmed node ever gets a shared scc_id."""
        out = self._run(
            spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3)],
            trim_rounds=2, hops=4,
        )
        assert out[1] == (1, "singleton") and out[2] == (2, "singleton")
        assert out[3] == (3, "core") and out[4] == (3, "core")
        assert out[5] == (3, "core")

    def test_hop_budget_residual_is_unresolved(self, spark):
        """A 6-cycle with hops=2: the min anchor can't round-trip within
        the budget for far nodes — they must be 'unresolved', NEVER
        wrongly confirmed."""
        ring = [(i, (i % 6) + 1) for i in range(1, 7)]
        out = self._run(spark, ring, trim_rounds=1, hops=2)
        for v, (sid, st) in out.items():
            if st == "core":
                assert sid == 1
            else:
                assert (sid, st) == (-1, "unresolved")
        # f(1)=b(1)=1 within any budget; every other ring node has
        # f=own-side min but b=1 (or vice versa) -> unresolved
        assert out[1] == (1, "core")
        assert out[2] == (-1, "unresolved")
        assert out[4] == (-1, "unresolved")

    def test_matches_tarjan_on_random_graph(self, spark):
        """Every 'core'/'singleton' claim agrees with an in-process
        Tarjan ground truth on a deterministic pseudo-random graph."""
        import hashlib

        edges = []
        for i in range(300):
            h = hashlib.md5(f"scc{i}".encode()).hexdigest()
            a, b = int(h[:4], 16) % 60, int(h[4:8], 16) % 60
            if a != b:
                edges.append((a, b))
        out = self._run(spark, edges, trim_rounds=2, hops=10)

        from collections import defaultdict

        g = defaultdict(list)
        for s, d in set(edges):
            g[s].append(d)
        index, low, onstk, stk, sccs = {}, {}, set(), [], {}
        counter = [0]

        def strongconnect(v0):
            work = [(v0, 0)]
            while work:
                v, pi = work[-1]
                if pi == 0:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stk.append(v)
                    onstk.add(v)
                recurse = False
                for i in range(pi, len(g[v])):
                    w = g[v][i]
                    if w not in index:
                        work[-1] = (v, i + 1)
                        work.append((w, 0))
                        recurse = True
                        break
                    if w in onstk:
                        low[v] = min(low[v], index[w])
                if recurse:
                    continue
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stk.pop()
                        onstk.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        sccs[w] = (m, len(comp))
                work.pop()
                if work:
                    u, _ = work[-1]
                    low[u] = min(low[u], low[v])

        nodes = {v for e in edges for v in e}
        for v in nodes:
            if v not in index:
                strongconnect(v)
        for v, (sid, st) in out.items():
            truth_id, truth_size = sccs[v]
            if st == "core":
                assert sid == truth_id, (v, sid, truth_id)
            elif st == "singleton":
                assert truth_size == 1, (v, truth_size)

    def test_local_and_distributed_paths_agree(self, spark, monkeypatch):
        """The numpy fast path and the shuffle loop are the same
        recurrence — their outputs must be identical row-for-row."""
        import hashlib

        import code_graph_backend_spark.operators.scc as scc_mod

        edges = []
        for i in range(200):
            h = hashlib.md5(f"par{i}".encode()).hexdigest()
            a, b = int(h[:4], 16) % 40, int(h[4:8], 16) % 40
            if a != b:
                edges.append((a, b))
        local = self._run(spark, edges, trim_rounds=2, hops=6, peels=2)
        monkeypatch.setattr(scc_mod, "_LOCAL_EDGE_ROWS", 0)
        dist = self._run(spark, edges, trim_rounds=2, hops=6, peels=2)
        assert local == dist


class TestContainmentPairs:
    def test_short_inside_long_directional(self, spark):
        """A short doc pasted verbatim into a long one: Jaccard tiny
        (union huge) but containment 1.0 short->long — and only in that
        direction."""
        from code_graph_backend_spark.functions.dedup import (
            containment_pairs, ngram_jaccard_pairs,
        )

        short = " ".join(f"s{i}" for i in range(10))
        long_ = short + " " + " ".join(f"l{i}" for i in range(200))
        docs = _docs(spark, [(1, short), (2, long_), (3, "x y z w v u")])
        cont = {
            (r["i"], r["j"]): r["cont_milli"]
            for r in containment_pairs(docs).collect()
        }
        assert cont == {(1, 2): 1000}
        jac = ngram_jaccard_pairs(docs, threshold=0.8).collect()
        assert jac == []  # symmetric similarity misses it

    def test_integer_milli_floor(self, spark):
        """Score is floor((c*1000)/n_i): 7 of 8 shingles shared -> 875."""
        from code_graph_backend_spark.functions.dedup import containment_pairs

        a = " ".join(f"w{i}" for i in range(10))          # 8 shingles
        b = " ".join(f"w{i}" for i in range(9)) + " zz"   # shares 7
        docs = _docs(spark, [(1, a), (2, b)])
        rows = {
            (r["i"], r["j"]): r["cont_milli"]
            for r in containment_pairs(docs, threshold_milli=800).collect()
        }
        assert rows[(1, 2)] == 875 and rows[(2, 1)] == 875


class TestShardManifest:
    def test_matches_flat_cumsum_reference(self, spark):
        """Two-level prefix sum == flat Python cumsum, including sparse
        ids, empty buckets, and a doc bigger than the whole target."""
        import hashlib

        rows = []
        for i in range(150):
            h = int(hashlib.md5(f"sm{i}".encode()).hexdigest()[:6], 16)
            doc_id = i * 7 + (h % 5) * 97          # sparse, gappy ids
            ntok = 1 + h % 40
            if i == 50:
                ntok = 5000                         # oversized doc
            rows.append((doc_id, " ".join("t" * 1 for _ in range(ntok))))
        rows = {r[0]: r for r in rows}.values()     # unique ids
        from code_graph_backend_spark.functions.packing import shard_manifest

        docs = _docs(spark, list(rows))
        out = {
            r["shard"]: (r["n_docs"], r["total_tokens"], r["min_id"], r["max_id"])
            for r in shard_manifest(
                docs, target_tokens=200, bucket_width=64
            ).collect()
        }
        # flat reference
        from collections import defaultdict

        ref = defaultdict(lambda: [0, 0, None, None])
        cum = 0
        for doc_id, text in sorted(rows):
            ntok = text.count(" ") + 1
            sh = cum // 200
            cum += ntok
            e = ref[sh]
            e[0] += 1
            e[1] += ntok
            e[2] = doc_id if e[2] is None else min(e[2], doc_id)
            e[3] = doc_id if e[3] is None else max(e[3], doc_id)
        assert out == {k: tuple(v) for k, v in ref.items()}

    def test_shards_are_contiguous_id_ranges(self, spark):
        """min/max id ranges of consecutive shards never overlap."""
        from code_graph_backend_spark.functions.packing import shard_manifest

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = sorted(
            shard_manifest(docs, target_tokens=500).collect(),
            key=lambda r: r["shard"],
        )
        assert len(rows) > 5
        for a, b in zip(rows, rows[1:]):
            assert a["max_id"] < b["min_id"]


class TestLinearQualityScore:
    def test_hand_computed_with_injected_weights(self, spark):
        """Features are unigrams + bigrams; score is the integer-milli
        mean of their bucket weights under a caller-supplied model."""
        from code_graph_backend_spark.functions.text import (
            _QLS_BUCKETS, linear_quality_score,
        )

        # weight 7 for every bucket: logit == 7000 regardless of text
        w = spark.range(_QLS_BUCKETS).selectExpr(
            "id AS bucket", "CAST(7 AS BIGINT) AS w"
        )
        docs = _docs(spark, [(1, "a b c"), (2, "solo")])
        rows = {r["doc_id"]: r for r in linear_quality_score(docs, w).collect()}
        # 'a b c': 3 unigrams + 2 bigrams = 5 features
        assert rows[1]["n_features"] == 5
        assert rows[1]["logit_milli"] == 7000 and rows[1]["keep"]
        # single token: no bigrams
        assert rows[2]["n_features"] == 1

    def test_negative_mean_floor_division(self, spark):
        """Floor semantics on a negative mean: weights -3 over 2 feats
        of one doc -> logit exactly -3000; keep False."""
        from code_graph_backend_spark.functions.text import (
            _QLS_BUCKETS, linear_quality_score,
        )

        w = spark.range(_QLS_BUCKETS).selectExpr(
            "id AS bucket", "CAST(-3 AS BIGINT) AS w"
        )
        docs = _docs(spark, [(1, "x y")])
        r = linear_quality_score(docs, w).collect()[0]
        assert r["n_features"] == 3  # x, y, 'x y'
        assert r["logit_milli"] == -3000 and not r["keep"]

    def test_default_model_deterministic(self, spark):
        """The md5 stand-in model gives identical scores across runs."""
        from code_graph_backend_spark.functions.text import linear_quality_score

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        a = sorted(map(tuple, linear_quality_score(docs).collect()))
        b = sorted(map(tuple, linear_quality_score(docs).collect()))
        assert a == b and len(a) == 50


class TestRandomWalks:
    def _graph(self, spark, edge_rows):
        e = spark.createDataFrame(edge_rows, "src long, dst long")
        n = e.selectExpr("src AS id").union(e.selectExpr("dst AS id")).distinct()
        return n, e

    def test_walks_follow_edges_and_truncate(self, spark):
        """Every consecutive pair is an edge; a dead end ends the walk."""
        from code_graph_backend_spark.operators.walks import random_walks

        # ring 0->7->14->21->0 (ids divisible by 7 so all are seeds)
        # plus a tendril 28->35->42 (42 dead-ends)
        ring = [(0, 7), (7, 14), (14, 21), (21, 0), (28, 35), (35, 42)]
        n, e = self._graph(spark, ring)
        rows = random_walks(n, e, walk_len=5, seed_mod=7).collect()
        eset = set(ring)
        walks = {}
        for r in rows:
            walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
        for wid, steps in walks.items():
            assert steps[0] == wid
            for s in range(1, max(steps) + 1):
                assert (steps[s - 1], steps[s]) in eset
        # ring walks run the full 5 steps; 42's walk stops at step 0
        assert max(walks[0]) == 5
        assert max(walks[42]) == 0
        assert max(walks[28]) == 2  # 28 -> 35 -> 42, then dead end
        # out-degree 1 everywhere: the md5 pick has no choice
        assert walks[0] == {0: 0, 1: 7, 2: 14, 3: 21, 4: 0, 5: 7}

    def test_deterministic_across_runs(self, spark):
        from code_graph_backend_spark.operators.walks import random_walks

        import hashlib

        edges = []
        for i in range(400):
            h = hashlib.md5(f"rw{i}".encode()).hexdigest()
            a, b = int(h[:4], 16) % 70, int(h[4:8], 16) % 70
            edges.append((a, b))
        n, e = self._graph(spark, edges)
        r1 = sorted(map(tuple, random_walks(n, e, walk_len=6).collect()))
        r2 = sorted(map(tuple, random_walks(n, e, walk_len=6).collect()))
        assert r1 == r2
        # branching exists: some walk must actually branch from the
        # lexicographically-smallest successor at least once
        from collections import defaultdict

        out = defaultdict(set)
        for a, b in edges:
            out[a].add(b)
        steps = defaultdict(dict)
        for wid, st, node in r1:
            steps[wid][st] = node
        diverged = False
        for wid, st in steps.items():
            for s in range(1, max(st) + 1):
                assert st[s] in out[st[s - 1]]
                if st[s] != min(out[st[s - 1]]):
                    diverged = True
        assert diverged

    def test_skipgram_pairs_hand_computed(self, spark):
        """Window ±2 over a single 0->7->14->21 walk (plus singleton
        walks for 7,14,21 if seeded): counts match the by-hand table."""
        from code_graph_backend_spark.operators.walks import (
            random_walks, skipgram_pairs,
        )

        # chain, no cycles: walk from 0 is 0,7,14,21 then dead end;
        # walks from 7/14/21 are suffixes
        edges = [(0, 7), (7, 14), (14, 21)]
        n, e = self._graph(spark, edges)
        walks = random_walks(n, e, walk_len=5, seed_mod=7)
        pairs = {
            (r["center"], r["context"]): r["n"]
            for r in skipgram_pairs(walks, window=2).collect()
        }
        # walk 0: [0,7,14,21]; walk 7: [7,14,21]; walk 14: [14,21]; walk 21: [21]
        # count (7,14): walk0 (adjacent) + walk7 = 2
        assert pairs[(7, 14)] == 2 and pairs[(14, 7)] == 2
        # (0,14): dist 2 in walk0 only
        assert pairs[(0, 14)] == 1
        # (0,21): dist 3 -> outside window
        assert (0, 21) not in pairs
        # (14,21): walk0 + walk7 + walk14 = 3
        assert pairs[(14, 21)] == 3
        # symmetry of the band predicate
        assert all(pairs[(b, a)] == n_ for (a, b), n_ in pairs.items())


class TestShardManifestIncremental:
    def test_incremental_equals_full_recompute(self, spark):
        """Batch assignment from one scalar of state == the full
        recompute's assignment of the same docs, boundary shard
        included."""
        from code_graph_backend_spark.functions.packing import (
            shard_manifest_incremental,
        )

        import hashlib

        rows = []
        for i in range(120):
            h = int(hashlib.md5(f"smi{i}".encode()).hexdigest()[:6], 16)
            rows.append((i * 3 + h % 2, "t " * (1 + h % 50)))
        rows = list({r[0]: (r[0], r[1].strip()) for r in rows}.values())
        docs = _docs(spark, rows)
        wm = max(r[0] for r in rows) * 4 // 5
        inc = {
            r["shard"]: (r["n_docs"], r["total_tokens"], r["min_id"], r["max_id"])
            for r in shard_manifest_incremental(
                docs, watermark_id=wm, target_tokens=150
            ).collect()
        }
        # flat reference over the WHOLE corpus, restricted to batch docs
        from collections import defaultdict

        ref = defaultdict(lambda: [0, 0, None, None])
        cum = 0
        for doc_id, text in sorted(rows):
            ntok = text.count(" ") + 1
            sh = cum // 150
            cum += ntok
            if doc_id > wm:
                e = ref[sh]
                e[0] += 1
                e[1] += ntok
                e[2] = doc_id if e[2] is None else min(e[2], doc_id)
                e[3] = doc_id if e[3] is None else max(e[3], doc_id)
        assert inc == {k: tuple(v) for k, v in ref.items()}


class TestFflMotifs:
    def test_hand_computed(self, spark):
        """Graph with exactly one FFL (1->2, 2->3, 1->3) plus a
        non-closing wedge (3->4, 4->5): wedges are (1,2,3) and (3,4,5);
        only the first closes."""
        from code_graph_backend_spark.operators.triangles import (
            ffl_motif_stats,
        )

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        r = ffl_motif_stats(e).collect()[0]
        # wedges: 1->2->3, 2->3->4, 1->3->4, 3->4->5
        assert r["n_wedges"] == 4
        assert r["n_ffl"] == 1
        assert r["ffl_per_wedge_milli"] == 250

    def test_two_cycle_is_not_a_wedge(self, spark):
        """a->b, b->a produces no wedge (x == z is excluded) and no
        FFL."""
        from code_graph_backend_spark.operators.triangles import (
            ffl_motif_stats,
        )

        e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        r = ffl_motif_stats(e).collect()[0]
        assert r["n_wedges"] == 0 and r["n_ffl"] == 0
