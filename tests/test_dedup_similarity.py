"""Dedup + similarity: exact families are oracle-checked by the driver; here
we assert the approximate families (MinHash-LSH, SimHash, hyperplane-LSH)
against their exact counterparts — recall on planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.functions import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_keeps_min_id(spark):
    d = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "other")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in dedup.exact_dedup(d).collect()}
    assert kept == {1, 3}


def test_minhash_lsh_recall(docs):
    exact = {
        (r["i"], r["j"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    if not exact:
        pytest.skip("no planted near-dups at this sf")
    cand = {
        (r["i"], r["j"]) for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} on {len(exact)} true pairs"


def test_simhash_flags_near_dups(docs):
    exact = {
        (r["i"], r["j"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    if not exact:
        pytest.skip("no planted near-dups at this sf")
    sim = {
        (r["i"], r["j"])
        for r in dedup.simhash_near_dup_pairs(docs).collect()
        if r["hamming"] <= 10
    }
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.5, f"simhash recall {recall} on {len(exact)} true pairs"


def test_lsh_topk_recall_at_10(emb):
    q = emb.filter(F.col("vec_id") < 3)
    exact = {}
    for r in similarity.brute_force_topk(q, emb, k=10).collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    approx = {}
    for r in similarity.lsh_topk(q, emb, k=10).collect():
        approx.setdefault(r["qid"], set()).add(r["cid"])
    # random corpus = weak neighbors (θ≈70°): multi-table LSH should still
    # recover a solid fraction of the true top-10
    recalls = [len(exact[k] & approx.get(k, set())) / 10 for k in exact]
    assert sum(recalls) / len(recalls) >= 0.5, f"mean recall@10 {recalls}"


def test_cosine_self_similarity(emb):
    a = emb.limit(1).select(F.col("embedding").alias("v"))
    sim = a.select(similarity.cosine(F.col("v"), F.col("v")).alias("s")).collect()[0]["s"]
    assert sim == pytest.approx(1.0, abs=1e-9)


def test_embedding_cosine_near_dup_exact(spark):
    # hand-built corpus: v0≈v1 (near-dup), v2 orthogonal
    d = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["i"], r["j"]): r["sim"]
        for r in similarity.cosine_near_dup_pairs(d, threshold=0.9).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] > 0.999


def test_embedding_cosine_threshold_filters(emb):
    out = similarity.cosine_near_dup_pairs(emb, threshold=0.42).collect()
    assert all(r["sim"] >= 0.42 and r["i"] < r["j"] for r in out)


def test_ivf_topk_recall_at_10(emb):
    q = emb.filter(F.col("vec_id") < 3)
    exact = {}
    for r in similarity.brute_force_topk(q, emb, k=10).collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    approx = {}
    for r in similarity.ivf_topk(q, emb, k=10, n_probe=6).collect():
        approx.setdefault(r["qid"], set()).add(r["cid"])
    hits = sum(len(exact[q_] & approx.get(q_, set())) for q_ in exact)
    total = sum(len(v) for v in exact.values())
    # probing 6/16 cells: recall well above the ~37% probe fraction because
    # true neighbors concentrate in the query's nearest cells
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"
