"""Connected components, dedup clustering, stratified sampling,
contamination scan (operators/components.py, functions/sampling.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.functions.sampling import (
    contamination_ngram,
    stratified_sample,
)
from code_graph_backend_spark.operators import components as comp


def _brute_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: repeated relabel-to-min until fixpoint."""
    label = {}
    for i, j in pairs:
        label[i] = i
        label[j] = j
    changed = True
    while changed:
        changed = False
        for i, j in pairs:
            m = min(label[i], label[j])
            if label[i] != m or label[j] != m:
                label[i] = label[j] = m
                changed = True
        # propagate through chains: relabel to label of label
        for n in label:
            if label[label[n]] < label[n]:
                label[n] = label[label[n]]
                changed = True
    return label


def _random_pairs(rng: random.Random, n_nodes: int, n_edges: int):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


def test_local_components_match_bruteforce(spark):
    rng = random.Random(7)
    pairs = [(i, j) for i, j in _random_pairs(rng, 40, 60) if i != j]
    df = spark.createDataFrame(pairs, "i long, j long")
    got = {
        r["node"]: r["component"]
        for r in comp.connected_components(spark, df).collect()
    }
    assert got == _brute_components(pairs)


def test_distributed_stars_match_local(spark, monkeypatch):
    """Force the alternating large-star/small-star path and compare against
    the union-find result on graphs with chains (worst case for label
    propagation, routine for the star algorithm)."""
    rng = random.Random(21)
    # chain of 30 + random noise edges + isolated pair
    pairs = [(i, i + 1) for i in range(30)]
    pairs += [(p, q) for p, q in _random_pairs(rng, 50, 25) if p != q]
    pairs += [(100, 101)]
    df = spark.createDataFrame(pairs, "i long, j long")
    expected = {
        r["node"]: r["component"]
        for r in comp.connected_components(spark, df).collect()
    }
    monkeypatch.setattr(comp, "_LOCAL_PAIR_ROWS", 0)
    got = {
        r["node"]: r["component"]
        for r in comp.connected_components(spark, df).collect()
    }
    assert got == expected
    assert got == _brute_components(pairs)


def test_dedup_clusters_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "i long, j long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in comp.dedup_clusters(spark, docs, pairs).collect()
    }
    assert rows[1] == (1, True)
    assert rows[3] == (1, False)
    assert rows[5] == (1, False)
    assert rows[2] == (2, True)
    assert rows[6] == (2, False)
    for solo in (0, 4, 7):
        assert rows[solo] == (solo, True)
    # dedup semantics: canonical survivors = one per cluster
    assert sorted(d for d, (c, k) in rows.items() if k) == [0, 1, 2, 4, 7]


def test_stratified_sample_quota_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(200)],
        "doc_id long, lang string",
    )
    s1 = stratified_sample(df, "lang", 5, "doc_id")
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 5, "de": 5, "fr": 5}
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(7), "lang", 5, "doc_id").collect()
    )
    assert ids1 == ids2  # same sample regardless of partitioning


def test_stratified_sample_small_stratum_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "rare")], "doc_id long, lang string"
    )
    got = stratified_sample(df, "lang", 2, "doc_id")
    assert got.filter(F.col("lang") == "rare").count() == 1


def test_contamination_ngram_planted(spark):
    probe_text = " ".join(f"p{k}" for k in range(13))
    clean = " ".join(f"c{k}" for k in range(30))
    # contaminated doc embeds the probe verbatim mid-text
    dirty = "x y z " + probe_text + " tail tokens here"
    docs = spark.createDataFrame(
        [(1, clean), (2, dirty), (3, "short doc")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, probe_text)], "probe_id long, probe_text string"
    )
    got = contamination_ngram(docs, probes).collect()
    assert len(got) == 1
    assert (got[0]["doc_id"], got[0]["probe_id"], got[0]["n_hits"]) == (2, 100, 1)


def test_contamination_ngram_multi_hit_counts_shared_shingles(spark):
    # probe of 15 tokens has 3 distinct 13-shingles; doc contains all of them
    toks = [f"t{k}" for k in range(15)]
    probe_text = " ".join(toks)
    docs = spark.createDataFrame(
        [(7, "lead in " + probe_text + " out")], "doc_id long, text string"
    )
    probes = spark.createDataFrame(
        [(9, probe_text)], "probe_id long, probe_text string"
    )
    got = contamination_ngram(docs, probes).collect()
    assert len(got) == 1
    assert got[0]["n_hits"] == 3


def test_char_entropy_known_values(spark):
    from code_graph_backend_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aabb"), (2, ""), (3, "abcd"), (4, "aaaa"), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["entropy"] for r in char_entropy(docs).collect()}
    assert got[1] == 1.0   # two symbols, uniform
    assert got[2] == 0.0
    assert got[3] == 2.0   # four symbols, uniform
    assert got[4] == 0.0   # single symbol
    assert got[5] == 0.0
