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


def test_shingles_short_and_empty_docs(spark):
    """Docs with fewer than n tokens must yield empty shingle sets, not
    crash (sequence(0, size-n) counts downward for short docs)."""
    d = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "a b c d e f g h"), (4, "only one two")],
        "doc_id long, text string",
    )
    out = dedup.ngram_jaccard_pairs(d, threshold=0.0).collect()
    # short/empty docs produce no shingles => appear in no pair; no crash
    ids = {x for r in out for x in (r["i"], r["j"])}
    assert ids <= {3, 4}
    sigs = dedup.minhash_signatures(d).collect()
    assert {r["doc_id"] for r in sigs} == {3, 4}  # shingle-less docs drop out
    lsh = dedup.minhash_lsh_candidates(d).collect()
    assert all(r["i"] in (3, 4) and r["j"] in (3, 4) for r in lsh)


def test_simhash_signature_stable_across_batch_layout(spark):
    """A doc's simhash must not depend on whether empty docs follow it in
    the same Arrow batch (reduceat offset bug regression)."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    solo = spark.createDataFrame([(1, text)], "doc_id long, text string")
    trailing_empties = spark.createDataFrame(
        [(1, text), (2, ""), (3, "x")], "doc_id long, text string"
    ).coalesce(1)  # force one batch so 1 is followed by shingle-less docs
    sig_solo = dedup.simhash_signatures(solo).collect()[0]["sh"]
    sigs = {r["doc_id"]: r["sh"] for r in dedup.simhash_signatures(trailing_empties).collect()}
    assert sigs[1] == sig_solo
    assert sigs[2] == 0 and sigs[3] == 0


def test_ngram_jaccard_max_df_bounds_hot_shingle(spark):
    """A boilerplate shingle shared by every doc must not blow up the pair
    space when max_df caps it."""
    boiler = "this is standard header text"
    rows = [(i, f"{boiler} unique words {i} payload {i * 7} tail {i * 13}") for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # without the cap: the boilerplate shingles pair everything with everything
    uncapped = dedup.ngram_jaccard_pairs(d, threshold=0.01).count()
    capped = dedup.ngram_jaccard_pairs(d, threshold=0.01, max_df=5).count()
    assert capped < uncapped
    assert capped == 0  # unique remainders share no rare shingle


def test_cosine_near_dup_block_pair_matches_single_block(emb):
    """The distributed block-pair GEMM must produce exactly the same pairs
    regardless of block count (block_size small enough to force many
    blocks exercises the cross-block and diagonal kernels)."""
    one = {
        (r["i"], r["j"]): r["sim"]
        for r in similarity.cosine_near_dup_pairs(emb, threshold=0.42).collect()
    }
    many = {
        (r["i"], r["j"]): r["sim"]
        for r in similarity.cosine_near_dup_pairs(emb, threshold=0.42, block_size=64).collect()
    }
    assert one == many
    assert len(one) > 0


def test_cosine_near_dup_no_driver_collect():
    """Scale guard: the production near-dup path must never collect the
    corpus to the driver (VERDICT r1: driver OOM at 100 TB)."""
    import inspect

    src = inspect.getsource(similarity.cosine_near_dup_pairs)
    assert ".collect()" not in src


def test_ivf_indexed_matches_inflight_ivf(emb, spark):
    """The persisted cell-partitioned index returns the SAME results as
    the in-flight ivf_topk (same training, same probes), and its probe
    scan is storage-pruned: the partitioned read carries a dynamic
    partition pruning filter on cell."""
    q = emb.filter(F.col("vec_id") < 3)
    name, cent = similarity.build_ivf_index(emb, "ivf_test_idx")
    indexed = similarity.ivf_topk_indexed(spark, q, name, cent, k=10, n_probe=6)
    inflight = similarity.ivf_topk(q, emb, k=10, n_probe=6)
    assert sorted(map(tuple, indexed.collect())) == sorted(map(tuple, inflight.collect()))

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_minhash_exact_twin_recall(docs):
    """The md5-family exact twin (driver-oracled, functions/dedup.py
    minhash_lsh_candidates_exact) must behave like a real minhash LSH:
    high recall on planted near-dups, i.e. the twin verifies the SAME
    machinery the production xxhash64 variant runs."""
    exact = {
        (r["i"], r["j"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    if not exact:
        pytest.skip("no planted near-dups at this sf")
    cand = {
        (r["i"], r["j"])
        for r in dedup.minhash_lsh_candidates_exact(docs).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"twin recall {recall} on {len(exact)} true pairs"


def test_simhash_exact_twin_separates_near_dups(docs):
    """Near-dup doc pairs must land closer in twin-signature Hamming space
    than random pairs, on average — the majority-vote semantics are the
    same as the production 64-bit kernel."""
    near = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    if near.count() == 0:
        pytest.skip("no planted near-dups at this sf")
    sig = {r["doc_id"]: r["sig"] for r in
           dedup.simhash_signatures_exact(docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    near_pairs = [(r["i"], r["j"]) for r in near.collect()
                  if r["i"] in sig and r["j"] in sig]
    ids = sorted(sig)
    rand_pairs = list(zip(ids[: len(near_pairs) * 2: 2],
                          ids[1: len(near_pairs) * 2: 2]))
    near_h = sum(ham(sig[i], sig[j]) for i, j in near_pairs) / len(near_pairs)
    rand_h = sum(ham(sig[i], sig[j]) for i, j in rand_pairs) / len(rand_pairs)
    assert near_h < rand_h, (near_h, rand_h)


def test_hyperplane_buckets_exact_group_similars(emb):
    """Identical vectors must share a bucket; the bucket distribution must
    actually split the corpus (not all-one-bucket)."""
    buckets = {r["vec_id"]: r["bucket"] for r in
               similarity.hyperplane_buckets_exact(emb).collect()}
    assert len(set(buckets.values())) > 4  # 8 planes split 500 vectors
    assert all(len(b) == 8 for b in buckets.values())


def test_pq_topk_recall_at_10(emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in similarity.brute_force_topk(q, emb, k=10).collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    approx = {}
    for r in similarity.pq_topk(q, emb, k=10).collect():
        approx.setdefault(r["qid"], set()).add(r["cid"])
    hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
    total = sum(len(v) for v in exact.values())
    # 16x compression + exact rerank of a 4k shortlist: measured 0.82 on
    # these unstructured gaussian embeddings (clustered real corpora do
    # far better — this is PQ's adversarial case)
    assert hits / total >= 0.7, f"PQ recall {hits}/{total}"


def test_minhash_incremental_matches_full(docs):
    """The incremental (batch-vs-index + batch-vs-batch) candidate set
    must equal the full-recompute candidates restricted to pairs that
    involve at least one new doc — no pair lost, none invented."""
    is_new = F.col("doc_id") % 5 == 0
    full = {
        (r["i"], r["j"])
        for r in dedup.minhash_lsh_candidates_exact(docs, k=16, bands=4).collect()
    }
    want = {(i, j) for (i, j) in full if i % 5 == 0 or j % 5 == 0}
    got = {
        (r["i"], r["j"])
        for r in dedup.minhash_incremental_candidates(
            docs, is_new, k=16, bands=4
        ).collect()
    }
    assert got == want


def test_ivf_exact_full_probe_equals_quantized_brute_force(emb):
    """With n_probe = n_cells the IVF probe pipeline degenerates to the
    full quantized brute-force ranking — the candidate pruning is the ONLY
    approximation in the twin, so this pins the probe/join/re-rank
    machinery end-to-end."""
    full = similarity.ivf_topk_exact(
        emb, n_cells=4, rounds=2, n_probe=4, k=5, query_max_id=3
    ).collect()
    got = {(r["qid"], r["cid"]): r["dotq"] for r in full}
    # brute force in python over the same quantization
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    Q = {r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1000)
         for r in rows}
    for qid in range(3):
        dots = sorted(
            ((int(Q[qid] @ v), cid) for cid, v in Q.items() if cid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        expect = {(qid, cid): d for d, cid in dots}
        assert {kv: got[kv] for kv in expect} == expect


def test_ivf_exact_partial_probe_subset_and_deterministic(emb):
    a = similarity.ivf_topk_exact(emb, n_cells=8, rounds=2, n_probe=2, k=10)
    b = similarity.ivf_topk_exact(emb, n_cells=8, rounds=2, n_probe=2, k=10)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and ra
    qids = {t[0] for t in ra}
    assert qids <= {0, 1, 2, 3, 4}
