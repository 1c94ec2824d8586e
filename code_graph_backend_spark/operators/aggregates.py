"""Aggregation operators (SURVEY.md §2.4, A1-A7).

All are Catalyst hash aggregates (partial map-side combine + final) — nothing
custom. The one care point for oracle comparability: floating sums are
order-dependent, so money-like sums go through exact DECIMAL accumulation
(`dec_sum`) and only then cast to double — bit-identical regardless of
partitioning, and equal to any other engine using the same rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dec_sum(col, scale: int = 4) -> Column:
    """Order-independent sum of a double column: exact decimal accumulation,
    result cast back to double. Safe for 100 TB aggregation trees (decimal
    sum is associative/commutative, unlike float)."""
    return F.sum(_c(col).cast(f"decimal(30,{scale})")).cast("double")


def dec_avg(col, scale: int = 4) -> Column:
    return (F.sum(_c(col).cast(f"decimal(30,{scale})")) / F.count(_c(col))).cast("double")


def counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A1+A2: graph stats (reference api/graph.py:603-607) as one row."""
    n = nodes.agg(F.count("*").alias("node_count"))
    e = edges.agg(F.count("*").alias("edge_count"))
    return n.crossJoin(e)


def collect_per_group(df: DataFrame, group: str, value: str, alias: str = "items") -> DataFrame:
    """A3: `RETURN collect(x)` per group (reference api/graph.py:310,376,386).

    Emitted sorted (`sort_array`) — collect_list order is partition-dependent
    in Spark, and the reference's Cypher collect() is likewise unordered, so
    a canonical order is the only comparable form.
    """
    return df.groupBy(group).agg(F.sort_array(F.collect_list(value)).alias(alias))
