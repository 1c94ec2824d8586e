"""Bounded-hop weighted shortest paths (single source) — min-plus
iteration (Bellman-Ford relaxation), the second iterative-graph kernel
beside PageRank (operators/pagerank.py) and the same design:

- fixed iteration count ⇒ deterministic AND exactly expressible as an
  UNROLLED chain of SQL CTEs (min-aggregate per level), so an iterative
  algorithm gets a true hash-checked oracle;
- physical strategy from MEASURED sizes via the typed-edge memo: small
  edge sets relax in-process with numpy scatter-min (np.minimum.at),
  large ones run one shuffle per round (contributions grouped on dst)
  with localCheckpoint lineage cuts.

Weights are integers (edge prop or default 1) so min-plus arithmetic is
exact — no float-drift concern in the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .traversal import _typed_edges


def sssp_bounded(
    spark: SparkSession,
    edges: DataFrame,
    source_id: int,
    weight: Column | None = None,
    hops: int = 4,
) -> DataFrame:
    """Returns (node long, dist long) for every node reachable from
    `source_id` within `hops` relaxation rounds; dist = min total weight.
    `weight` defaults to 1 per edge (hop count)."""
    w = weight if weight is not None else F.lit(1)
    wedges = edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d"),
        w.cast("long").alias("_w"),
    )
    ent = _typed_edges(edges, None)  # membership/size probe (memoized)

    if ent["n"] <= 5_000_000:
        import numpy as np
        import pandas as pd

        # the weighted edge arrays are a pure function of (edges, weight
        # expr); stash them in the typed-edge memo's derived dict so a
        # second sssp over the same graph skips the corpus-sized
        # toPandas + index build (the und_arrays discipline). source_id
        # is appended to the domain at lookup time, so one cache entry
        # serves every source.
        wkey = ("sssp_w", str(w))
        hit = ent["derived"].get(wkey)
        if hit is None:
            pdf = wedges.toPandas()
            src = pdf["_s"].to_numpy(np.int64)
            dst = pdf["_d"].to_numpy(np.int64)
            wts = pdf["_w"].to_numpy(np.int64)
            base_ids = np.unique(np.concatenate([src, dst]))
            hit = (
                wts,
                base_ids,
                np.searchsorted(base_ids, src),
                np.searchsorted(base_ids, dst),
                src,
                dst,
            )
            ent["derived"][wkey] = hit
        wts, base_ids, si, di, src, dst = hit
        pos = int(np.searchsorted(base_ids, source_id))
        if pos < len(base_ids) and base_ids[pos] == source_id:
            ids = base_ids
        else:  # isolated source extends the domain — rebuild indices
            ids = np.union1d(base_ids, [source_id])
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
        n = len(ids)
        INF = np.iinfo(np.int64).max // 4
        dist = np.full(n, INF, dtype=np.int64)
        dist[np.searchsorted(ids, source_id)] = 0
        for _ in range(hops):
            cand = dist[si] + wts
            nxt = dist.copy()
            np.minimum.at(nxt, di, cand)
            if np.array_equal(nxt, dist):
                break
            dist = nxt
        m = dist < INF
        return spark.createDataFrame(
            pd.DataFrame({"node": ids[m], "dist": dist[m]})
        )

    dist = spark.createDataFrame([(int(source_id), 0)], "node long, dist long")
    for _ in range(hops):
        relaxed = (
            wedges.join(dist, wedges["_s"] == F.col("node"))
            .select(F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)  # cut per-round lineage
        )
    return dist
