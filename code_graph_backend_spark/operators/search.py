"""Search / index operators (SURVEY.md §2.8, X1-X4).

The reference creates FalkorDB range + full-text indexes
(api/graph.py:53-62) and serves prefix auto-complete via
`CALL db.idx.fulltext.queryNodes(..., $prefix*) LIMIT 10`
(api/graph.py:324-357). Contract verified by its tests: every result name
starts with the prefix (tests/endpoints/test_auto_complete.py:49-50).

Spark design: a `startswith` predicate compiles to a parquet
StringStartsWith pushed filter — with the nodes table written sorted/bucketed
by name, min/max file stats skip non-matching files, which IS a range index
in columnar clothing (X1/X4 are therefore `write_sorted_by_name`, not a
separate structure). A dedicated prefix table only pays off when prefixes are
hot and the graph cold; we keep the optional builder for that case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_complete(nodes: DataFrame, prefix: str, limit: int = 10) -> DataFrame:
    """X3: top-`limit` Searchable nodes whose name starts with `prefix`,
    deterministic under ties (ordered by name, id)."""
    return (
        nodes.filter(F.array_contains("labels", "Searchable"))
        .filter(F.col("name").startswith(prefix))
        .orderBy("name", "id")
        .limit(limit)
    )


def write_sorted_by_name(nodes: DataFrame, path: str, buckets: int = 32) -> None:
    """X1/X2/X4: materialize the 'index' — nodes sorted by (name) within
    files so parquet min/max stats give prefix/range file-skipping."""
    nodes.repartitionByRange(buckets, "name").sortWithinPartitions("name").write.mode(
        "overwrite"
    ).parquet(path)


def build_prefix_table(nodes: DataFrame, max_len: int = 8) -> DataFrame:
    """Optional explicit prefix index: (prefix, id, name) for prefixes up to
    `max_len`. Equi-join/point-filter on `prefix` replaces the scan when the
    name table is too large to scan per request."""
    n = nodes.filter(F.array_contains("labels", "Searchable")).select("id", "name")
    return n.select(
        F.explode(
            F.expr(f"transform(sequence(1, least(length(name), {max_len})), i -> substring(name, 1, i))")
        ).alias("prefix"),
        "id",
        "name",
    )
