"""Point lookups and predicate operators (SURVEY.md §2.2, P1-P8).

All are plain Catalyst filters — predicate pushdown and parquet min/max
file-skipping make these index-like at scale (the reference creates FalkorDB
range indexes for the same purpose, api/graph.py:53-57).

Determinism note: the reference's `LIMIT 1` point lookups
(api/graph.py:269-276) are nondeterministic under ties; we order by id before
limiting so results are stable (and oracle-comparable).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def by_label(nodes: DataFrame, label: str) -> DataFrame:
    """P6: dynamic label predicate (reference api/graph.py:214-216)."""
    return nodes.filter(F.array_contains("labels", label))


def point_by_name(nodes: DataFrame, label: str, name: str) -> DataFrame:
    """P1: `MATCH (c:L) WHERE c.name=$name RETURN c LIMIT 1`
    (reference api/graph.py:269-276)."""
    return by_label(nodes, label).filter(F.col("name") == name).orderBy("id").limit(1)


def point_by_id(nodes: DataFrame, node_id: int) -> DataFrame:
    """P2: `WHERE ID(c)=$id` (reference api/graph.py:278-288)."""
    return nodes.filter(F.col("id") == node_id)


def file_by_key(nodes: DataFrame, path: str, name: str, ext: str) -> DataFrame:
    """P3: composite-key File lookup (reference api/graph.py:428-466)."""
    return by_label(nodes, "File").filter(
        (F.col("path") == path) & (F.col("name") == name) & (F.col("ext") == ext)
    )


def by_ids(nodes: DataFrame, ids: Iterable[int]) -> DataFrame:
    """P4: `WHERE ID(n) IN $node_ids` (reference api/graph.py:219-223).

    For small id-lists an `isin` literal compiles to an In predicate that
    pushes to the scan; for large lists callers should join against a
    broadcast DataFrame instead (see neighbors.out_neighbors).
    """
    return nodes.filter(F.col("id").isin(list(ids)))
