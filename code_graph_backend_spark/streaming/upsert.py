"""Streaming MERGE upsert — the continuous-ingest twin of the batch
node/edge sinks (S7/S9, mutations/merge.py).

The reference applies MERGE statements per analyzed batch
(/root/reference/api/graph.py:253 `SET n += $props`); a live deployment
feeds the same upserts from a WATCHED source (commit webhooks landing as
JSONL drops) rather than a one-shot scan. Structured Streaming's
`foreachBatch` is the canonical way to lift an arbitrary batch writer
into a stream: micro-batches arrive in order, each is merged into the
accumulated state with the SAME merge_nodes/merge_edges kernels the
batch path uses (verbatim — no second upsert implementation to drift),
and the state is localCheckpoint-ed per epoch so lineage never grows
with stream length (the iterative-kernel rationale, pagerank.py).

At scale the accumulated frame becomes a storage-backed table (Delta
/ Iceberg MERGE INTO, or the bucketed-parquet layout of
PropertyGraph.save_bucketed) and `foreachBatch` runs the same logical
merge against it; the in-memory checkpointed frame here is the
storage-free equivalent with identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..mutations.merge import merge_edges, merge_nodes


class StreamingUpsert:
    """Accumulates a stream of node (or edge) batches into a merged
    frame. `state` is always a valid, fully-merged snapshot — readable
    between or after micro-batches.

    merge_nodes' full-outer key join assumes ONE row per key per side,
    but a micro-batch may carry several updates to the same key (two
    webhook drops for one file; availableNow coalescing multiple JSONL
    files into one batch). Pass `order_col` (a per-row sequence /
    ingest-timestamp column, unique per key within a batch) and the
    batch is reduced to the LAST row per key before the merge — the
    same last-writer-wins a sequential row-at-a-time MERGE replay would
    settle on. Without `order_col` the one-row-per-key precondition is
    ASSERTED per batch (an extra key-cardinality agg), never silently
    violated."""

    def __init__(
        self,
        initial: DataFrame,
        key=("id",),
        edges: bool = False,
        order_col: str | None = None,
    ):
        self.state = initial.localCheckpoint(eager=True)
        self._key = tuple(key)
        self._edges = edges
        self._order_col = order_col
        self.epochs = 0

    def _dedupe(self, batch: DataFrame) -> DataFrame:
        key = ["src", "dst", "type"] if self._edges else list(self._key)
        if self._order_col is None:
            dup = (
                batch.groupBy(*key).count().filter(F.col("count") > 1).limit(1)
            )
            # explicit raise, not assert: the precondition must survive
            # `python -O` or merge_nodes' one-row-per-key full-outer
            # join silently produces wrong merged state
            if dup.take(1):
                raise ValueError(
                    f"micro-batch has multiple rows per key {key}; pass "
                    "order_col= to StreamingUpsert for last-writer-wins"
                )
            return batch
        w = Window.partitionBy(*key).orderBy(F.col(self._order_col).desc())
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def apply_batch(self, batch: DataFrame, epoch_id: int | None = None):
        batch = self._dedupe(batch)
        if self._edges:
            merged = merge_edges(self.state, batch)
        else:
            merged = merge_nodes(self.state, batch, key=self._key)
        self.state = merged.localCheckpoint(eager=True)
        self.epochs += 1

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        """Start an availableNow foreachBatch query applying every
        pending micro-batch through the merge kernel; returns the
        StreamingQuery (caller awaits termination)."""
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
