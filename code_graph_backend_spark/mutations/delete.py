"""Cascade delete (SURVEY.md M5 / J7).

Reference (api/graph.py:408-426): deleting files removes every entity
transitively reachable over DEFINES plus all incident edges (Cypher DELETE
cascades edges implicitly).

Spark design: compute the closure with the iterative reachable() kernel,
then anti-join it out of nodes and edges — two shuffle-free-ish scans (the
closure set is request-sized → broadcast anti-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.traversal import reachable


def cascade_delete(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    seed_ids: list[int],
    edge_type: str | None = "DEFINES",
) -> tuple[DataFrame, DataFrame]:
    """Delete seeds + everything reachable over `edge_type`, and all edges
    touching a deleted node. Returns (nodes', edges')."""
    doomed = broadcast(reachable(spark, edges, seed_ids, edge_type))
    nodes2 = nodes.join(doomed, "id", "left_anti")
    edges2 = (
        edges.join(doomed.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(doomed.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst", "type", *[c for c in edges.columns if c not in ("src", "dst", "type")])
    )
    return nodes2, edges2
