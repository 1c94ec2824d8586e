"""Round-4c extension queries: the repetition-analysis curation tier
(source-level boilerplate detection, duplicated-substring span maps), a
deterministic HyperLogLog cardinality sketch with an exact-twin estimator
oracle, landmark BFS distance vectors (the at-scale APSP substitute), and
hash-exact bounded k-means — corpus clustering as a verified operator.

Every entry is DuckDB-oracled; the HLL oracle replays the entire sketch
(md5 register table + harmonic estimator), not just a bound — see
functions/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.boilerplate import (
    boilerplate_sql, boilerplate_stats, duplicated_spans, duplicated_spans_sql,
)
from .functions.sketches import hll_distinct, hll_sql
from .registry import register
from .session import read_table


@register("boilerplate_stats", boilerplate_sql(n=5))
def boilerplate_stats_q(spark, sf_dir):
    """Per-document boilerplate share (functions/boilerplate.py): distinct
    5-gram shingles -> per-(source, shingle) document frequency -> 25%
    integer commonality gate -> per-doc rollup. The curation pass that
    catches repeated chrome across documents that are NOT near-dups."""
    return boilerplate_stats(read_table(spark, sf_dir, "documents"), n=5)


@register("dedup_substring_spans", duplicated_spans_sql(n=13))
def dedup_substring_spans_q(spark, sf_dir):
    """Maximal cross-document duplicated token spans via 13-gram anchors
    merged with the islands trick (functions/boilerplate.py
    duplicated_spans) — the span-level dedup view (Lee et al. 2022) that
    localizes WHERE documents overlap; the window runs over surviving
    anchor positions only, never the full token stream."""
    return duplicated_spans(read_table(spark, sf_dir, "documents"), n=13)


@register(
    "corpus_distinct_hll",
    hll_sql(
        "(SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)",
        "lang", "tok",
    ),
)
def corpus_distinct_hll_q(spark, sf_dir):
    """Per-language distinct-token cardinality: the md5-deterministic
    HyperLogLog estimate beside the exact count and relative error
    (functions/sketches.py). The sketch's shuffle is 256 registers per
    language regardless of corpus size; the oracle hash-checks the
    ESTIMATE itself because every register is a deterministic function
    of the token multiset."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    return hll_distinct(toks, "lang", "tok")


def _landmark_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES
    from .operators.landmarks import landmark_distances_sql

    return landmark_distances_sql(SQL_NODES, SQL_EDGES, n_landmarks=8, hops=3)


@register("graph_landmark_distances", _landmark_sql())
def graph_landmark_distances_q(spark, sf_dir):
    """Batched multi-source BFS from the 8 smallest node ids, 3 hops
    (operators/landmarks.py): per-node landmark distance vectors — the
    standard at-scale substitute for all-pairs shortest paths. One edge
    join + one min-agg per round for ALL landmarks at once; unrolled-CTE
    oracle, integer-exact."""
    from .graph.tpch import build_graph
    from .operators.landmarks import landmark_distances

    g = build_graph(spark, sf_dir)
    return landmark_distances(g.nodes, g.edges, n_landmarks=8, hops=3)


def _kmeans_sql() -> str:
    from .functions.similarity import kmeans_assign_exact_sql

    return kmeans_assign_exact_sql(k=8, rounds=2)


@register("emb_kmeans_assign", _kmeans_sql())
def emb_kmeans_assign_q(spark, sf_dir):
    """Bounded Lloyd's k-means with hash-exact integer arithmetic
    (functions/similarity.py kmeans_assign_exact): deterministic
    smallest-id init, quantized dims, floor-divide centroid updates —
    corpus clustering / IVF coarse-quantizer training as a VERIFIED
    operator (assignment + cost hash-checked by the unrolled oracle)."""
    from .functions.similarity import kmeans_assign_exact

    return kmeans_assign_exact(
        read_table(spark, sf_dir, "embeddings"), k=8, rounds=2
    )


def _bpe_sql() -> str:
    from .functions.bpe import bpe_train_merges_sql

    return bpe_train_merges_sql(n_merges=4)


@register("bpe_train_merges", _bpe_sql())
def bpe_train_merges_q(spark, sf_dir):
    """BPE tokenizer training, first 4 merge rules (functions/bpe.py):
    the Sennrich et al. loop over the word-frequency table — per round
    one vocabulary-sized pair count, a 1-row argmax collect (the merge
    table IS the output), and a greedy-left parity merge done with two
    windows over matched positions only. Unrolled-rounds DuckDB oracle
    hash-checks the merge table exactly."""
    from .functions.bpe import bpe_train_merges

    return bpe_train_merges(read_table(spark, sf_dir, "documents"), n_merges=4)


@register(
    "trending_events",
    """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY window_start ORDER BY n_events DESC, event_type
        ) AS rnk FROM c
    ) WHERE rnk <= 3
    """,
)
def trending_events_q(spark, sf_dir):
    """Top-3 event types per tumbling hour (streaming/windows.py
    trending): the count stage is the mode-agnostic window agg (streams
    under a watermark like w_tumbling_1h); the per-window rank runs over
    the type-cardinality-sized counts — the standard serving-side split
    for rank-over-aggregate."""
    from .streaming import windows

    return windows.trending(read_table(spark, sf_dir, "events"), "1 hour", k=3)


@register(
    "emb_hard_negatives",
    """
    WITH q AS (
        SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
    p AS (
        SELECT qid, cid,
               list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2])) AS dot,
               list_sum(list_transform(qv, x -> x * x)) AS nq,
               list_sum(list_transform(cv, x -> x * x)) AS nc
        FROM q, c WHERE ql <> cl
    ),
    s AS (SELECT qid, cid, dot / (sqrt(nq) * sqrt(nc)) AS sim_raw FROM p)
    SELECT qid, cid, sim
    FROM (SELECT qid, cid, ROUND(sim_raw, 6) AS sim,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(sim_raw, 6) DESC, cid) AS rn
          FROM s)
    WHERE rn <= 5
    """,
)
def emb_hard_negatives_q(spark, sf_dir):
    """Hard-negative mining (functions/similarity.py hard_negatives):
    per anchor the top-5 most cosine-similar DIFFERENT-label vectors —
    the batch-mining step of dual-encoder training. Anchor matrix
    broadcast, per-partition GEMM with the label filter inside the
    kernel, global rank over the tiny partial set."""
    from .functions.similarity import hard_negatives

    emb = read_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb.filter(F.col("vec_id") < 5), emb, k=5)


def _bpe_apply_sql() -> str:
    from .functions.bpe import bpe_apply_token_counts_sql

    return bpe_apply_token_counts_sql(n_merges=4)


@register("bpe_apply_token_counts", _bpe_apply_sql())
def bpe_apply_token_counts_q(spark, sf_dir):
    """Trained-tokenizer application (functions/bpe.py
    bpe_apply_token_counts): per-document token counts under the 4-rule
    BPE tokenizer — merges are applied once per DISTINCT word (training
    ends with the vocabulary tokenized), corpus application is one
    vocabulary-sized equi-join + per-doc sum, never a re-run of the
    merge loop over the token stream."""
    from .functions.bpe import bpe_apply_token_counts

    return bpe_apply_token_counts(
        read_table(spark, sf_dir, "documents"), n_merges=4
    )


def _hll_merge_oracle() -> str:
    from .functions.sketches import hll_merge_sql

    return hll_merge_sql(
        "(SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)",
        "source", "tok",
    )


@register("corpus_hll_merge", _hll_merge_oracle())
def corpus_hll_merge_q(spark, sf_dir):
    """Sketch MERGEABILITY end-to-end (functions/sketches.py
    hll_merge_distinct): one HLL per source shard, register-wise max
    merge, global distinct-token estimate from the merged registers —
    the union-without-re-reading property that makes sketches the 100 TB
    answer. The oracle replays shard sketches + merge + estimator."""
    from .functions.sketches import hll_merge_distinct

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    return hll_merge_distinct(toks, "source", "tok")
