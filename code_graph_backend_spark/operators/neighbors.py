"""Hop operators — every graph traversal step is an edges⋈nodes join
(SURVEY.md §2.3, J1-J5, J9-J11).

Scale notes:
- seed id-sets are broadcast (they are request-sized, ≤500 ids);
- the big side (edges) is filtered by partition column `type` BEFORE the join
  so partition pruning cuts the scan;
- all joins are equi-joins on long keys → Catalyst picks broadcast-hash or
  sort-merge under AQE as sizes dictate.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _ids_df(spark: SparkSession, ids: Iterable[int]) -> DataFrame:
    return spark.createDataFrame([(int(i),) for i in ids], "seed_id long")


def out_neighbors(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    ids: Iterable[int],
    edge_type: str | None = None,
    dest_label: str | None = None,
) -> DataFrame:
    """J1: 1-hop out-neighbors with optional type/label filters
    (reference api/graph.py:197-241).

    Returns (src_id, type, dst node columns).
    """
    e = edges if edge_type is None else edges.filter(F.col("type") == edge_type)
    n = nodes if dest_label is None else nodes.filter(F.array_contains("labels", dest_label))
    seeds = broadcast(_ids_df(spark, ids))
    return (
        e.join(seeds, e.src == seeds.seed_id)
        .join(n, e.dst == n.id)
        .select(e.src.alias("src_id"), e.type.alias("edge_type"), *[n[c] for c in n.columns])
    )


def in_neighbors(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    ids: Iterable[int],
    edge_type: str | None = None,
) -> DataFrame:
    """J2: 1-hop in-neighbors, e.g. callers of a function
    (reference api/graph.py:382-390)."""
    e = edges if edge_type is None else edges.filter(F.col("type") == edge_type)
    seeds = broadcast(_ids_df(spark, ids))
    return (
        e.join(seeds, e.dst == seeds.seed_id)
        .join(nodes, e.src == nodes.id)
        .select(e.dst.alias("dst_id"), e.type.alias("edge_type"), *[nodes[c] for c in nodes.columns])
    )


def sub_graph(nodes: DataFrame, edges: DataFrame, limit: int = 500) -> DataFrame:
    """J4: optional 1-hop (left outer) capped sample of the graph
    (reference api/graph.py:173-194, cap api/index.py:82).

    `LIMIT` without order is nondeterministic; we take the lowest-id sources
    first so repeated calls agree (contract-compatible: the reference only
    promises *some* ≤limit subgraph).

    Join shape: the only HINTED broadcast is the seed set, which is bounded
    by `limit`. A naive `seeds left-join edges left-join nodes` forces
    Spark to build the hash side from the graph (left-outer preserves the
    left stream), i.e. broadcast/shuffle ALL edges and ALL nodes for a
    ≤500-row request — at 100 TB that is the whole graph moving per call.
    Instead: inner-join edges against the broadcast seed set (one pruned
    edge scan), semi-join nodes down to the touched dst ids (one pruned
    node scan), then run the left-outers between the resulting sets. The
    hit/dst sets are usually request-sized but NOT bounded — a hub seed can
    fan out arbitrarily — so they carry no broadcast hint: AQE broadcasts
    them when their measured size allows and falls back to a shuffle join
    when it doesn't, instead of dying on a broadcast-size limit.
    """
    src = nodes.orderBy("id").limit(limit).select("id", "name").alias("s")
    hits = (
        edges.join(F.broadcast(src.select(F.col("id").alias("_sid"))),
                   edges.src == F.col("_sid"))
        .select(F.col("src").alias("_es"), F.col("dst").alias("_ed"),
                F.col("type").alias("_et"))
    )
    d = (
        nodes.join(hits.select(F.col("_ed").alias("id")), "id", "semi")
        .select(F.col("id").alias("_did"), F.col("name").alias("_dname"))
    )
    return (
        src.join(hits, F.col("s.id") == F.col("_es"), "left_outer")
        .join(d, F.col("_ed") == F.col("_did"), "left_outer")
        .select(
            F.col("s.id").alias("src_id"),
            F.col("s.name").alias("src_name"),
            F.col("_et").alias("edge_type"),
            F.col("_did").alias("dst_id"),
            F.col("_dname").alias("dst_name"),
        )
    )


def two_hop(
    nodes: DataFrame,
    edges: DataFrame,
    first_type: str,
    second_type: str,
) -> DataFrame:
    """J5-shaped 2-hop pattern join: (a)-[:T1]->(b)-[:T2]->(c)
    (reference api/graph.py:307-313 is File-DEFINES->Function).

    Returns (a_id, b_id, c_id). Both hops are equi-joins on long keys;
    partition pruning applies via the `type` filters.
    """
    e1 = edges.filter(F.col("type") == first_type).select(
        F.col("src").alias("a_id"), F.col("dst").alias("b_id")
    )
    e2 = edges.filter(F.col("type") == second_type).select(
        F.col("src").alias("b2"), F.col("dst").alias("c_id")
    )
    return e1.join(e2, e1.b_id == e2.b2).select("a_id", "b_id", "c_id")


def unreachable(nodes: DataFrame, edges: DataFrame, label: str | None = None,
                edge_type: str | None = None) -> DataFrame:
    """J10: anti-join — nodes with no inbound edge
    (reference api/graph.py:612-628, `unreachable_entities`)."""
    n = nodes if label is None else nodes.filter(F.array_contains("labels", label))
    e = edges if edge_type is None else edges.filter(F.col("type") == edge_type)
    return n.join(e.select(F.col("dst").alias("id")), on="id", how="left_anti")
