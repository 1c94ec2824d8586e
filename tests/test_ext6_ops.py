"""Unit semantics for the round-4b operators: token-budget selection,
vocabulary stats, and bounded HITS (their cross-engine hashes are
oracle-checked by the driver; here the hand-computable semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_graph_backend_spark.functions.packing import token_budget_select
from code_graph_backend_spark.functions.text import vocab_stats
from code_graph_backend_spark.operators.hits import hits_bounded


def test_token_budget_greedy_prefix(spark):
    # scores: doc 3 (9) > doc 1 (5) > doc 2 (4); tokens: 3, 2, 4
    d = spark.createDataFrame(
        [(1, "a b", 5), (2, "a b c d", 4), (3, "a b c", 9)],
        "doc_id long, text string, n_chars long",
    )
    out = {r["doc_id"]: r for r in token_budget_select(d, budget=5).collect()}
    # greedy best-first: doc3 (cum 3) fits, doc1 (cum 5) fits, doc2 (cum 9) not
    assert set(out) == {3, 1}
    assert out[3]["cum_tokens"] == 3 and out[1]["cum_tokens"] == 5


def test_token_budget_no_backfill(spark):
    """A doc that overflows is dropped and later smaller docs are NOT
    backfilled — prefix-cut semantics, not knapsack."""
    d = spark.createDataFrame(
        [(1, "a b c d e", 9), (2, "a", 8)],
        "doc_id long, text string, n_chars long",
    )
    out = token_budget_select(d, budget=4).collect()
    assert out == []  # doc1 (5 tokens) overflows; doc2 is after the cut


def test_vocab_stats_counts(spark):
    d = spark.createDataFrame(
        [(1, "a b a", "en"), (2, "b c", "en"), (3, "x x", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in vocab_stats(d).collect()}
    en = out["en"]
    assert en["total_tokens"] == 5
    assert en["vocab_size"] == 3  # a, b, c
    assert en["hapax_count"] == 1  # c
    fr = out["fr"]
    assert (fr["total_tokens"], fr["vocab_size"], fr["hapax_count"]) == (2, 1, 0)


def test_hits_two_rounds_hand_computed(spark):
    # 1->3, 2->3, 3->4 : node 3 is the authority fed by two hubs
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: (r["hub"], r["auth"]) for r in
           hits_bounded(spark, nodes, edges, rounds=1).collect()}
    # round 1: auth = indegree (3:2, 4:1); hub = sum auth over out-edges
    assert out[3] == (1, 2)   # hub: edge 3->4 picks auth(4)=1
    assert out[1] == (2, 0) and out[2] == (2, 0)
    assert out[4] == (0, 1)
    out2 = {r["node"]: (r["hub"], r["auth"]) for r in
            hits_bounded(spark, nodes, edges, rounds=2).collect()}
    # round 2: auth2(3) = hub1(1)+hub1(2) = 4; auth2(4) = hub1(3) = 1
    # hub2(1) = auth2(3) = 4 = hub2(2); hub2(3) = auth2(4) = 1
    assert out2[3] == (1, 4)
    assert out2[1] == (4, 0) and out2[2] == (4, 0)
    assert out2[4] == (0, 1)


def test_hits_isolated_nodes_score_zero(spark):
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r["node"]: (r["hub"], r["auth"]) for r in
           hits_bounded(spark, nodes, edges, rounds=2).collect()}
    assert out[9] == (0, 0)


def test_sharded_packing_matches_global_within_shard(spark):
    """Within one shard the sharded packer must equal the global packer
    run on that shard's docs alone (shard offset removed)."""
    from code_graph_backend_spark.functions.packing import (
        pack_sequences, pack_sequences_sharded,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sharded = {
        r["doc_id"]: (r["seq_id"], r["tok_offset"])
        for r in pack_sequences_sharded(docs, budget=64, n_shards=4).collect()
    }
    for s in range(4):
        sub = docs.filter((F.col("doc_id") % 4) == s)
        for r in pack_sequences(sub, budget=64).collect():
            got = sharded[r["doc_id"]]
            assert got == (s * (1 << 40) + r["seq_id"], r["tok_offset"])
