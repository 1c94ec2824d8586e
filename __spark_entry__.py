"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` maps every
implemented SURVEY.md §2 operator (and the pipeline extensions) to a
callable; `oracle_sql()` gives the DuckDB twin for each SQL-expressible one.
Implementations live in `code_graph_backend_spark.registry` /
`registry_ext`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from code_graph_backend_spark import registry
from code_graph_backend_spark import registry_ext  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext2  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext3  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext4  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext5  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext6  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext7  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext8  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext9  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext10  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext11  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext12  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext13  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext14  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext15  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext16  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext17  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext18  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext19  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext20  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext21  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext22  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext23  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext24  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext25  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext26  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext27  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext28  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext29  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext30  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext31  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext32  # noqa: F401  (registers on import)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is curation_pipeline_v3: the eight-gate FineWeb-
    generation DAG (near-dup canonicals -> repetition quality -> Gopher
    rules -> bigram-LM perplexity -> boilerplate -> span coverage ->
    decontamination -> greedy token-budget cut) composed as ONE Catalyst
    plan — the end-to-end corpus-curation path this engine exists for."""
    return registry.QUERIES["curation_pipeline_v3"](spark, "/root/testdata/sf0.001")


# Grading-order rotation (the driver caps correctness rows per round,
# ~50). Round 7 spends the ENTIRE budget on the evidence debt (VERDICT
# r6 item 1) and is GENERATED from the mechanized audit
# (`python tools/staleness.py`; gate: tests/test_rotation_staleness.py).
# The registry stays FROZEN at 234. Order:
# (A) the 13 never-graded tail (the r6 rotation's declared sacrifice);
# (B) queries whose implementing code changed THIS round and so must
#     meet the driver again: graph_anf_sketch (memo-key fix),
#     graph_resource_allocation + its registry_ext21 file-mates
#     (wedge-cap guard commit touches their module),
#     triangle-kernel consumers (chunked wedge expansion),
#     s2_cfamily_analyzer (C# generic/explicit-interface methods),
#     j13_symbol_resolution (binding tie-break);
# (C) the r5-green rows predating the r6 caps-hoist commit d05e23e;
# (D) the 33 r2-stale rows — §2 parity rows first, then the pipeline
#     rows, then the property-test-heaviest 8 as the declared spill
#     (w_*/text_* have dedicated pytest suites) if the ~50-row cap
#     lands mid-block;
# (E) the r3/r4 rows whose own registry module changed after their
#     grade (r5 function-file edits), oldest evidence first — next
#     round's backlog, ordered so the driver overflow starts here.
_PRIORITY = [
    # (A) never graded
    "dq_k_anonymity", "graph_eccentricity_bounds", "graph_core_decomposition",
    "events_window_funnel", "events_slo_burn",
    "curation_gate_ablation", "dedup_cluster_sizes",
    "shard_zorder_prune", "supply_risk_single_source",
    "shard_hash_ring", "events_bot_regularity",
    "events_latency_percentiles", "emb_silhouette_proxy",
    # (B) changed this round
    "graph_anf_sketch", "graph_resource_allocation",
    "graph_clustering_coeff", "graph_rich_club", "corpus_ks_lengths",
    "graph_triangle_count", "graph_ktruss", "graph_jaccard_neighbors",
    "s2_cfamily_analyzer", "j13_symbol_resolution",
    # (C) r5-green rows predating the r6 kernel hardening (d05e23e)
    "graph_landmark_distances", "graph_stress_centrality",
    "graph_random_walks", "walk_skipgram_pairs",
    # (D) r2-stale (four rounds old at the r7 close)
    "m1_merge_upsert", "m2_merge_edges", "m5_cascade_delete",
    "m6_edge_prop_update", "m8_switch_commit_derived",
    "j3_callees", "j8_chain_payloads",
    "p5_null_predicate", "p6_dynamic_filters", "p7_fixed_projection",
    "p8_ext_ignore_filters",
    "o1_commit_list_ordering", "o4_topk_orders",
    "f2_f5_size_contains", "f3_path_functions", "f6_string_parsing",
    "f7_json_props", "x3_auto_complete",
    "asof_prior_click", "contamination_ngram", "corpus_stats",
    "dedup_clusters", "sample_stratified", "skew_salted_agg",
    # (D-spill: pytest-property-covered, graded first in r8 if capped)
    "text_bpe_tokens", "text_char_entropy", "text_rolling_fingerprint",
    "text_tfidf_topterms", "value_histogram",
    "w_session_30m", "w_sliding_1h_30m", "w_tumbling_1h",
    # (E) own-module changed after freshest grade, oldest first — r3
    "graph_pagerank", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "ann_lsh_topk",
    "mm_media_features", "mm_frame_features",
    "text_token_stats", "text_quality_score", "text_lang_pred",
    "text_fingerprint", "text_repetition", "text_unigram_logprob",
    "cypher_frontend_hop", "pii_redact", "stream_click_attribution",
    "cohort_retention", "graph_sssp_bounded", "graph_degree_histogram",
    "ann_ivf_indexed_topk", "sample_weighted",
    # (E) — r4
    "graph_label_propagation", "dedup_minhash_exact", "dedup_simhash_exact",
    "dedup_minhash_incremental", "dedup_minhash_clusters",
    "dedup_substring_spans", "ann_lsh_exact", "ann_pq_exact",
    "pack_sequences", "pack_sequences_sharded", "sample_temperature",
    "bpe_pair_stats", "bpe_train_merges", "bpe_apply_token_counts",
    "corpus_distinct_hll", "corpus_hll_merge",
    "emb_kmeans_assign", "emb_power_iteration", "emb_label_centroids",
    "emb_similarity_histogram", "mm_wav_features", "mm_avi_frames",
    "boilerplate_stats", "ann_pq_topk", "quality_percentile",
    "stream_event_dedup", "corpus_length_deciles", "funnel_conversion",
    "events_rollup", "graph_hits", "corpus_vocab_stats",
    "events_outliers", "corpus_length_regression", "trending_events",
    "corpus_lang_pivot", "graph_closeness_approx", "corpus_train_val_split",
    "skew_salted_join", "events_transition_matrix",
    # (E) — r5
    "graph_edge_embeddedness",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = registry.queries()
    ordered = {k: qs[k] for k in _PRIORITY if k in qs}
    ordered.update({k: v for k, v in qs.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
