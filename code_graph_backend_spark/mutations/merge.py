"""MERGE-style upserts on DataFrames (SURVEY.md §2.9, M1-M3).

Reference semantics (api/graph.py:243-267, 392-406, 482-516):
- MERGE node on business key; on match SET doc / `props += map`; return id.
- MERGE edge on (src, dst, type[, pos]); on match SET props.
- Result-set counters (nodes_created, properties_set, relationships_created)
  gate op-log capture (api/graph.py:152-169) — so our merges report metrics.

Spark design: one batch MERGE per ingest stage (the reference does one
round-trip per entity — a deliberate architecture change, SURVEY §1.6).
Implemented as a key-join rewrite:

    updated  = existing ⟕ batch  (batch wins per column, props map-merged)
    inserted = batch ⟖ existing  (anti)
    result   = updated ∪ inserted

which is exactly Delta's `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
MATCHED INSERT` — on a Delta-enabled cluster swap this for the native MERGE
and keep the same call sites. IDs are deterministic hashes of the business
key (graph.model.node_id_expr): "id return" needs no post-read, callers can
recompute ids from keys — the property that makes batch upsert scale without
a driver round-trip per row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MergeMetrics:
    """Mirrors the reference's change-detection counters
    (api/graph.py:152-169) used to decide whether to op-log."""

    rows_matched: int
    rows_inserted: int

    @property
    def changed(self) -> bool:
        return self.rows_inserted > 0 or self.rows_matched > 0


def _merged_props(existing_col, batch_col):
    """`SET n += $props` (reference api/graph.py:253): map-merge, batch keys
    win. map_concat keeps the LAST occurrence of a duplicate key in Spark
    (spark.sql.mapKeyDedupPolicy=LAST_WIN), matching `+=` semantics."""
    return F.when(
        existing_col.isNull(), batch_col
    ).when(batch_col.isNull(), existing_col).otherwise(
        F.map_concat(
            F.map_filter(existing_col, lambda k, _: ~F.array_contains(F.map_keys(batch_col), k)),
            batch_col,
        )
    )


def merge_nodes(
    existing: DataFrame,
    batch: DataFrame,
    key: tuple[str, ...] = ("id",),
    with_metrics: bool = False,
):
    """M1: upsert `batch` into `existing` on `key`.

    Batch columns override matched rows (null batch column keeps existing);
    `props` maps are merged. Returns the new nodes DataFrame (and metrics if
    requested). Both inputs must share the same schema.
    """
    cols = existing.columns
    assert set(batch.columns) == set(cols), "merge requires identical schemas"
    b = batch.select(*[F.col(c).alias(f"_b_{c}") for c in cols])
    # eqNullSafe: a null key column (e.g. edges without props['pos'] when
    # merging with_pos) must MATCH a null on the other side — plain equality
    # never matches null=null, which would duplicate such rows on re-merge.
    cond = [F.col(c).eqNullSafe(F.col(f"_b_{c}")) for c in key]

    joined = existing.join(b, cond, "full_outer")
    out_cols = []
    for c in cols:
        e, n = F.col(c), F.col(f"_b_{c}")
        if c in key:
            out_cols.append(F.coalesce(e, n).alias(c))
        elif c == "props":
            out_cols.append(_merged_props(e, n).alias(c))
        else:
            out_cols.append(F.coalesce(n, e).alias(c))
    result = joined.select(*out_cols)

    if not with_metrics:
        return result
    bk = batch.select(*[F.col(c).alias(f"_k_{c}") for c in key]).distinct()
    ek = existing.select(*[F.col(c).alias(f"_k_{c}") for c in key]).distinct()
    kcond = [F.col(c).eqNullSafe(F.col(f"_k_{c}")) for c in key]
    matched = existing.join(bk, kcond, "left_semi").count()
    inserted = batch.join(ek, kcond, "left_anti").count()
    return result, MergeMetrics(matched, inserted)


def merge_edges(
    existing: DataFrame,
    batch: DataFrame,
    with_pos: bool = False,
    with_metrics: bool = False,
):
    """M2: upsert edges on (src, dst, type) — plus props['pos'] for CALLS
    edges, where the call site position is part of the identity
    (reference api/graph.py:500-516)."""
    key = ["src", "dst", "type"]
    if with_pos:
        e = existing.withColumn("_pos", F.col("props").getItem("pos"))
        b = batch.withColumn("_pos", F.col("props").getItem("pos"))
        merged = merge_nodes(e, b, key=(*key, "_pos"), with_metrics=with_metrics)
        if with_metrics:
            df, m = merged
            return df.drop("_pos"), m
        return merged.drop("_pos")
    return merge_nodes(existing, batch, key=tuple(key), with_metrics=with_metrics)


def set_props_by_id(nodes: DataFrame, updates: DataFrame) -> DataFrame:
    """M3: bulk `UNWIND $ids MATCH SET n += v` (reference api/graph.py:291-304).

    `updates` = (id long, props map<string,string>). Rows absent from
    `updates` pass through unchanged.
    """
    u = updates.select(F.col("id"), F.col("props").alias("_new_props"))
    return (
        nodes.join(u, "id", "left_outer")
        .withColumn("props", _merged_props(F.col("props"), F.col("_new_props")))
        .drop("_new_props")
    )
