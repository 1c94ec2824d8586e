"""Landmark (pivot) BFS distances — the standard at-scale substitute for
all-pairs shortest paths: pick a small deterministic landmark set, run a
bounded multi-source BFS, and keep per-node distance vectors to the
landmarks (Potamias et al. 2009, "Fast Shortest Path Distance Estimation
in Large Networks"). Downstream, dist(u,v) is estimated by
min_l d(u,l)+d(l,v) without ever materializing n² pairs — the same reason
a 100 TB graph never runs exact APSP.

Design mirrors the other bounded-iteration kernels (pagerank / sssp /
hits / k-core):

- landmarks are the L smallest node ids — deterministic and
  SQL-expressible, so the oracle picks the identical set;
- a FIXED number of BFS rounds, all-integer hop distances ⇒ the DuckDB
  oracle unrolls the rounds as CTEs and the result hash-checks exactly;
- one frontier is kept for ALL landmarks at once, keyed (landmark, node):
  each round is ONE edge join + ONE min-agg regardless of L — multi-source
  BFS costs the same shuffle count as single-source, which is the whole
  point of batching the landmarks;
- localCheckpoint per round cuts the iterative lineage (same rationale as
  pagerank.py).

No driver collect: the landmark set stays a DataFrame and is
broadcast-joined (L rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def landmark_distances(
    nodes: DataFrame,
    edges: DataFrame,
    n_landmarks: int = 8,
    hops: int = 3,
) -> DataFrame:
    """(landmark, node, dist) for every node within `hops` of a landmark,
    following edge direction (src -> dst). dist = exact hop count
    (min over paths), landmarks = the `n_landmarks` smallest node ids."""
    from ..scratch import scratch_persist

    lms = nodes.select(F.col("id").alias("landmark")).orderBy("landmark").limit(
        n_landmarks
    )
    # e feeds one frontier join per round — persist once or the caller's
    # edge derivation re-runs per hop
    e = scratch_persist(edges.select("src", "dst").distinct())
    dist = lms.select(
        "landmark", F.col("landmark").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    from .components import _parts_for

    for _ in range(hops):
        nxt = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select("landmark", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        merged = dist.unionByName(nxt).groupBy("landmark", "node").agg(
            F.min("dist").alias("dist")
        )
        # frontier is bounded by L x reached-nodes: checkpoint at a
        # measured width, not the session shuffle width
        dist = merged.repartition(
            _parts_for(dist.count() * 4), "landmark", "node"
        ).localCheckpoint(eager=True)
    return dist


def landmark_distances_sql(
    sql_nodes: str, sql_edges: str, n_landmarks: int = 8, hops: int = 3
) -> str:
    """Unrolled-rounds DuckDB twin over the graph-twin node/edge SQL."""
    parts = [
        f"WITH nodes AS ({sql_nodes}), edges AS ({sql_edges}),",
        f"""lms AS (SELECT id AS landmark FROM nodes ORDER BY id LIMIT {n_landmarks}),
        e AS (SELECT DISTINCT src, dst FROM edges),
        d0 AS (SELECT landmark, landmark AS node, CAST(0 AS BIGINT) AS dist FROM lms)""",
    ]
    for t in range(1, hops + 1):
        parts.append(f""",
        d{t} AS (
            SELECT landmark, node, MIN(dist) AS dist FROM (
                SELECT landmark, node, dist FROM d{t-1}
                UNION ALL
                SELECT d.landmark, e.dst AS node, d.dist + 1 AS dist
                FROM e JOIN d{t-1} d ON e.src = d.node
            ) GROUP BY landmark, node
        )""")
    parts.append(f"SELECT landmark, node, dist FROM d{hops}")
    return "\n".join(parts)
