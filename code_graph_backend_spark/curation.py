"""Shared curation-gate builders on top of the session memo.

The near-dup CLUSTERING (3-gram Jaccard pairs → connected components →
canonical flags) feeds four consumers: the three pipeline variants'
canonical gate, the gate-ablation report, and the cluster-size
histogram. Memoizing only the filtered canonical set (the original
('curation_canon', sf) key) made the histogram recompute the whole
clustering; the full assignment is what gets persisted now, and every
consumer derives from it (a filter over a persisted table is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .memo import memo_df


def curation_clusters(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Memoized full near-dup assignment (doc_id, cluster_id,
    is_canonical) at threshold 0.5 — the pipelines' clustering."""
    from .functions.dedup import ngram_jaccard_pairs
    from .operators.components import dedup_clusters

    return memo_df(
        spark, ("curation_clusters", sf_dir),
        lambda: dedup_clusters(
            spark, docs, ngram_jaccard_pairs(docs, threshold=0.5)
        ),
    )


def curation_canon(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Canonical-survivor doc_ids — a filter over the memoized
    assignment."""
    return (
        curation_clusters(spark, sf_dir, docs)
        .filter(F.col("is_canonical"))
        .select("doc_id")
    )
