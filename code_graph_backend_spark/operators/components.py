"""Connected components over an undirected pair graph.

The dedup pipeline's final step: near-dup candidate PAIRS (from
ngram-Jaccard / MinHash-LSH / SimHash banding) must become GROUPS —
transitively-closed clusters with one canonical survivor per cluster.
That is connected components. The reference has no analogue (FalkorDB
leaves grouping to the caller); this is a first-class training-pipeline
operator in our engine.

Two physical strategies, picked from the measured pair count (same
adaptive philosophy as operators/traversal.py):

- small (≤ _LOCAL_PAIR_ROWS): one Arrow collect + driver union-find.
  A few million pairs is tens of MB; path-compressed union-find is
  O(α·n) and replaces 5-15 tiny Spark jobs of pure scheduling overhead.

- large: the alternating large-star / small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) — O(log²·n) rounds of groupBy over the edge list, each a
  single shuffle on node id, no driver state. This is the published
  billion-edge MapReduce design; unlike min-label propagation its round
  count is independent of component diameter (a 100 TB near-dup chain
  of length 10⁶ converges in ~20 rounds, not 10⁶).

Output: (node, component) for every node appearing in a pair, where
component = min node id of the cluster (stable canonical choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOCAL_PAIR_ROWS = 5_000_000


def _parts_for(n_rows: int, cap: int = 2000) -> int:
    return max(1, min(cap, n_rows // 100_000 + 1))


def _local_components(spark: SparkSession, pairs) -> DataFrame:
    """Driver-side union-find (path compression + union by attaching the
    larger root under the smaller, so roots are always component minima)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for i, j in pairs:
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            lo, hi = (ri, rj) if ri < rj else (rj, ri)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    if not rows:
        return spark.createDataFrame([], "node long, component long")
    return spark.createDataFrame(rows, "node long, component long")


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(Γ(u) ∪ {u})."""
    nbrs = e.groupBy("u").agg(F.min("v").alias("mn"), F.collect_list("v").alias("vs"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        nbrs.select(
            F.explode(F.filter("vs", lambda v: v > F.col("u"))).alias("a"),
            m.alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor ≤ u (plus u itself) to min(Γ(u) ∪ {u})."""
    le = e.filter(F.col("v") <= F.col("u"))  # orient edges high→low first
    nbrs = le.groupBy("u").agg(F.min("v").alias("mn"), F.collect_list("v").alias("vs"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        nbrs.select(
            F.explode(F.array_union("vs", F.array("u"))).alias("a"), m.alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    spark: SparkSession,
    pairs: DataFrame,
    src_col: str = "i",
    dst_col: str = "j",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = cluster min.

    Distributed path: alternate large-star/small-star until the edge set is
    a fixpoint (checksum: count + sum of hash(a,b) — exact equality of edge
    sets is not needed, both stars are monotone toward the star fixpoint).
    Each round is two groupBy shuffles on node id; localCheckpoint per round
    cuts the iterative lineage chain.
    """
    e = (
        pairs.select(F.col(src_col).cast("long").alias("u"), F.col(dst_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .cache()
    )
    n = e.count()
    if n <= _LOCAL_PAIR_ROWS:
        pdf = e.toPandas()
        e.unpersist()
        return _local_components(spark, zip(pdf["u"], pdf["v"]))

    # symmetrize once; stars keep orientation themselves afterwards
    cur = (
        e.select("u", "v")
        .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(_parts_for(2 * n), "u")
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    prev_sig = None
    for _ in range(max_rounds):
        ls = _large_star(cur.select(F.col("u"), F.col("v")).union(cur.select(F.col("v").alias("u"), F.col("u").alias("v"))))
        ss = _small_star(ls.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            ls.select(F.col("b").alias("u"), F.col("a").alias("v"))
        ))
        cur = ss.select(F.col("a").alias("u"), F.col("b").alias("v")).localCheckpoint(eager=True)
        sig = cur.agg(
            F.count("*").alias("n"), F.sum(F.hash("u", "v").cast("long")).alias("h")
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # fixpoint: edges are (member, root) stars; roots map to themselves
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn("component", F.col("node"))
    return members.unionByName(roots).groupBy("node").agg(F.min("component").alias("component"))


def dedup_clusters(
    spark: SparkSession,
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "i",
    dst_col: str = "j",
) -> DataFrame:
    """Assign every document a cluster id (= min doc id of its near-dup
    cluster; solitary docs are their own cluster) and mark the canonical
    survivor. `SELECT ... WHERE is_canonical` is the deduplicated corpus.

    Plan: components over the (tiny relative to corpus) pair graph, then one
    left join back to the corpus — the full corpus is touched exactly once;
    AQE broadcasts the cluster map when it is small (the common case: only
    docs that appear in a near-dup pair are in it).
    """
    cc = connected_components(spark, pairs, src_col, dst_col)
    out = (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.withColumn(
        "is_canonical", (F.col(id_col) == F.col("cluster_id"))
    )
