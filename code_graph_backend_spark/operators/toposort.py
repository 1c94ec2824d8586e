"""Bounded Kahn layering (topological levels) of a directed graph.

Layer t = the nodes whose every remaining predecessor was peeled in an
earlier round; nodes still cyclic (or deeper than the budget) after
`rounds` rounds are reported as layer −1 — the explicit residual of
the bounded-semantics contract shared with wcc_bounded / sssp_bounded /
kcore_bounded. Kahn's algorithm is THE scheduling/DAG-shape primitive
(build orders, lineage planning), and each round maps onto one
in-degree aggregation + two semi-join contractions.

Measured-size duality (the pagerank/mst discipline): below the caps
the rounds run driver-local on the shared dir_arrays cache (in-degree
is one bincount per round); above them, the distributed form is one
anti-join + two semi-joins per round at measured width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import _parts_for
from .undirected import dir_arrays, dir_cached, ids_array

_LOCAL_N_CAP = 2_000_000
_LOCAL_E_CAP = 5_000_000


def kahn_layers(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """(node, layer) for every node; layer −1 marks the residual."""
    e = dir_cached(spark, edges)
    n_nodes = nodes.count()
    if n_nodes <= _LOCAL_N_CAP and e.count() <= _LOCAL_E_CAP:
        return _kahn_local(spark, nodes, edges, rounds)
    nset = nodes.select(F.col("id").alias("v"))
    live = e
    out = []
    for t in range(rounds):
        w = _parts_for(n_nodes)
        z = nset.join(
            live.select(F.col("dst").alias("v")).distinct(), "v", "left_anti"
        )
        from ..scratch import scratch_persist

        z = scratch_persist(z)
        out.append(z.select("v", F.lit(t).cast("long").alias("layer")))
        nset = nset.join(z, "v", "left_anti").repartition(w, "v").localCheckpoint(
            eager=True
        )
        live = (
            live.join(nset.select(F.col("v").alias("src")), "src", "left_semi")
            .join(nset.select(F.col("v").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    res = out[0]
    for m in out[1:]:
        res = res.unionByName(m)
    res = res.unionByName(nset.select("v", F.lit(-1).cast("long").alias("layer")))
    return res.select(
        F.col("v").cast("long").alias("node"), "layer"
    ).orderBy("node")


def _kahn_local(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame, rounds: int
) -> DataFrame:
    """Vectorized driver-local twin: in-degrees over the live edge mask
    are one bincount per round — bit-equal to the distributed rounds
    and the unrolled oracle."""
    import numpy as np
    import pandas as pd

    arr = dir_arrays(spark, edges)
    nid = ids_array(spark, nodes)
    if np.isin(nid, arr["ids"]).all() and len(arr["ids"]) == len(nid):
        ids, si, di = arr["ids"], arr["si"], arr["di"]
    else:
        ids = np.union1d(arr["ids"], nid)
        si = np.searchsorted(ids, arr["s"])
        di = np.searchsorted(ids, arr["d"])
    n = len(ids)
    member = np.isin(ids, nid)
    # mirror the distributed/oracle rounds exactly: round 0 counts
    # in-degrees over ALL edges (a non-member src still blocks its dst),
    # then the contraction semi-joins drop every edge not inside the
    # remaining node set — non-members never peel and lose their edges
    # at the first contraction
    live_n = member.copy()
    live_e = np.ones(len(si), dtype=bool)
    layer = np.full(n, -1, dtype=np.int64)
    for t in range(rounds):
        indeg = np.zeros(n, dtype=np.int64)
        if live_e.any():
            np.add.at(indeg, di[live_e], 1)
        z = live_n & (indeg == 0)
        if not z.any():
            break
        layer[z] = t
        live_n &= ~z
        live_e &= live_n[si] & live_n[di]
    keep = member
    res = pd.DataFrame(
        {"node": ids[keep], "layer": layer[keep]}, dtype="int64"
    ).sort_values("node")
    if not len(res):
        return spark.createDataFrame([], "node long, layer long")
    return spark.createDataFrame(res)