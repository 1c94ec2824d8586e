"""Session-scoped memo for the undirected-distinct edge table.

Deriving the undirected edge list (least/greatest + DISTINCT) is a full
shuffle over the typed edge list and dominates every graph kernel that
consumes it (measured: ~4s of graph_mst_boruvka's 6s at sf0.1 was this
one distinct). The resident graph (graph/tpch.py `_GRAPH_CACHE`) already
memoizes nodes/edges per (session, sf_dir); this extends the same
discipline one derivation deeper, exactly like the BPE trained-model
memo (functions/bpe.py `_TRAIN_MEMO`): keyed by the identity of the
resident edges DataFrame, bounded, and unpersisted on eviction (the
ADVICE.md r4 lesson — eviction must release the executor blocks, not
just drop the Python reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# key -> (edges_ref, und); edges_ref pins the source DataFrame so its
# id() cannot be recycled while the memo entry lives
_UND_MEMO: dict[tuple[int, int], tuple[DataFrame, DataFrame]] = {}
_MEMO_CAP = 4


def und_cached(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs (u < v) of `edges`, persisted once per
    (session, edges-object) and shared by every kernel in the session."""
    key = (id(spark), id(edges))
    hit = _UND_MEMO.get(key)
    if hit is not None:
        return hit[1]
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    while len(_UND_MEMO) >= _MEMO_CAP:
        _, (_, old) = _UND_MEMO.popitem()
        try:
            old.unpersist()
        except Exception:
            pass
    _UND_MEMO[key] = (edges, und)
    return und


_DIR_MEMO: dict[tuple[int, int], tuple[DataFrame, DataFrame]] = {}


def dir_cached(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Distinct DIRECTED pairs (src, dst), self-loops dropped — the
    orientation-preserving sibling of und_cached for kernels whose
    oracle spells out the directed-distinct formulation (k-core degree
    counts, SCC reachability)."""
    key = (id(spark), id(edges))
    hit = _DIR_MEMO.get(key)
    if hit is not None:
        return hit[1]
    d = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    while len(_DIR_MEMO) >= _MEMO_CAP:
        _, (_, old) = _DIR_MEMO.popitem()
        try:
            old.unpersist()
        except Exception:
            pass
    _DIR_MEMO[key] = (edges, d)
    return d
