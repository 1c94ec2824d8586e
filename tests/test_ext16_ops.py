"""Round-5j operators: cross-entropy shift, embedding-norm outliers,
template overlap — semantics pinned on tiny hand-computable inputs (the
driver oracle hash-checks the full corpus at three scales)."""

from __future__ import annotations

import math
import os
import tempfile

import code_graph_backend_spark.registry_ext16  # noqa: F401  (registers queries)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).selectExpr(
        "doc_id", "text", "'xx' AS lang", "source",
        "CAST(length(text) AS LONG) AS n_chars",
    )


class TestCrossEntropyShift:
    def test_hand_model(self, spark):
        """Corpus: s1='a a b', s2='b'. Counts: a=2, b=2, N=4.
        lq(a)=lq(b)=round(log2(2)·1e6)=1000000.
        H(s1) = (2·1e6 + 1·1e6)//3 = 1000000; H(s2) = 1000000."""
        from code_graph_backend_spark.registry import QUERIES

        with tempfile.TemporaryDirectory() as td:
            _docs(spark, [(1, "a a b", "s1"), (2, "b", "s2")]).write.parquet(
                os.path.join(td, "documents.parquet")
            )
            out = {
                r["source"]: (r["n_tokens"], r["cross_entropy_micro"])
                for r in QUERIES["corpus_cross_entropy_shift"](spark, td).collect()
            }
        assert out == {"s1": (3, 1000000), "s2": (1, 1000000)}

    def test_skewed_source_runs_hot(self, spark):
        """A source concentrated on the corpus-rare word has strictly
        higher cross-entropy than one on the common word."""
        from code_graph_backend_spark.registry import QUERIES

        rows = [(1, "x x x x x x x", "common"), (2, "y", "rare")]
        with tempfile.TemporaryDirectory() as td:
            _docs(spark, rows).write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                r["source"]: r["cross_entropy_micro"]
                for r in QUERIES["corpus_cross_entropy_shift"](spark, td).collect()
            }
        # lq(x)=log2(8/7), lq(y)=log2(8)=3 bits
        assert out["rare"] == 3000000
        assert out["common"] == math.floor(round(math.log2(8 / 7) * 1e6))
        assert out["rare"] > out["common"]


class TestEmbNormOutliers:
    def test_zeroed_and_scaled_vectors_flag(self, spark):
        """Ten unit-ish vectors per label, one zeroed and one 10x-scaled:
        exactly those two flag; healthy vectors stay inside the MAD
        band."""
        from code_graph_backend_spark.registry import QUERIES

        rows = []
        for i in range(10):
            v = [0.1] * 8
            rows.append((i, v, 0))
        rows.append((100, [0.0] * 8, 0))        # zeroed
        rows.append((101, [1.0] * 8, 0))        # 10x scale
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ).write.parquet(os.path.join(td, "embeddings.parquet"))
            out = {
                r["vec_id"]: r["norm2_q"]
                for r in QUERIES["emb_norm_outliers"](spark, td).collect()
            }
        assert set(out) == {100, 101}
        assert out[100] == 0 and out[101] == 8 * 1000 * 1000


class TestTemplateOverlap:
    def test_shared_prefix_detected(self, spark):
        """Two sources share a doc whose first 8 tokens are identical
        (tails differ); a third source shares nothing."""
        from code_graph_backend_spark.registry import QUERIES

        head = "w1 w2 w3 w4 w5 w6 w7 w8"
        rows = [
            (1, head + " tail one", "sa"),
            (2, head + " other tail", "sb"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 q", "sc"),
        ]
        with tempfile.TemporaryDirectory() as td:
            _docs(spark, rows).write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                (r["source_a"], r["source_b"]): r["n_shared_prefixes"]
                for r in QUERIES["source_template_overlap"](spark, td).collect()
            }
        assert out == {("sa", "sb"): 1}

    def test_short_docs_compare_whole_text(self, spark):
        """Docs under 8 tokens fingerprint their full text — identical
        short docs across sources still collide."""
        from code_graph_backend_spark.registry import QUERIES

        rows = [(1, "hello world", "sa"), (2, "hello world", "sb")]
        with tempfile.TemporaryDirectory() as td:
            _docs(spark, rows).write.parquet(os.path.join(td, "documents.parquet"))
            out = {
                (r["source_a"], r["source_b"]): r["n_shared_prefixes"]
                for r in QUERIES["source_template_overlap"](spark, td).collect()
            }
        assert out == {("sa", "sb"): 1}
