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
