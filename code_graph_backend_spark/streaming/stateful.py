"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.10 extensions — the reference has no streaming surface; this
is the driver-mandated beyond-parity path for stream processing that
`window()`/`session_window()` can't express).

Design notes for scale: state lives in Spark's per-key state store (RocksDB
on a real cluster — set spark.sql.streaming.stateStore.providerClass), so
state size is bounded by distinct keys, not events. The kernel sees one
group per call with all that micro-batch's rows as Arrow batches — keep
per-key state small (scalars/fixed vectors), never accumulate raw rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_oplog_apply(spark, oplog_stream: DataFrame, graph) -> tuple:
    """§2.10's incremental-pipeline mapping: the op-log as an append stream,
    the graph as the materialized state (SURVEY.md §2.10; the batch twin is
    OpLog.replay_path / reference git_utils.py:114-244).

    `foreachBatch` applies each micro-batch's ops in (commit, seq) order
    through the same mutation layer the batch path uses — M1-M6 semantics
    are shared, streaming only changes the arrival schedule. Returns
    (query, state) where state["graph"] is the live PropertyGraph; callers
    stop the query then read the graph.

    At scale: each micro-batch's MERGE is one bounded Delta-style commit;
    the state store is the graph tables themselves, so stream restarts
    recover from the last materialized version (checkpointLocation tracks
    the source offsets).
    """
    from ..mutations.oplog import OpLog, OpLogEntry

    state = {"graph": graph}

    def apply_batch(batch_df, batch_id: int) -> None:
        log = OpLog()
        rows = batch_df.orderBy("commit_from", "commit_to", "seq").collect()
        if not rows:
            return
        g = state["graph"]
        for r in rows:
            entry = OpLogEntry(
                r["commit_from"], r["commit_to"], r["seq"], r["op"], r["params_json"]
            )
            g = log.apply(g, entry)
        g.nodes = g.nodes.localCheckpoint(eager=True)
        g.edges = g.edges.localCheckpoint(eager=True)
        state["graph"] = g

    query = oplog_stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    return query, state


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, value_sum), emitted once per micro-batch.

    The stateful twin of `windows.session`-style accumulation: totals
    survive across micro-batches in the state store, so the last emitted row
    per user equals the full-history batch aggregate (tested for parity).
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, value_sum double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_first_seen(events: DataFrame, fp_col: str = "event_type") -> DataFrame:
    """Streaming exact dedup: emit each (user_id, fingerprint) only the
    FIRST time it appears in the stream — the stateful core of an online
    training-data dedup (state = set of fingerprints per key, here hashes).
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        fresh: list[str] = []
        for pdf in pdfs:
            for v in pdf[fp_col]:
                if v not in seen_set:
                    seen_set.add(v)
                    fresh.append(v)
        state.update((sorted(seen_set),))
        yield pd.DataFrame({"user_id": [key[0]] * len(fresh), "fp": fresh})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, fp string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Batch twin of watermark stream dedup: one row per key with the
    earliest event time and the duplicate count. The streaming side is
    Spark's BUILT-IN `dropDuplicatesWithinWatermark` (state auto-evicted
    past the watermark — the property that bounds memory on an infinite
    stream); this aggregate is what its kept-rows reduce to when arrivals
    are time-ordered, and what the DuckDB oracle checks."""
    from pyspark.sql import functions as F

    keys = keys or ["user_id", "event_type"]
    return events.groupBy(*keys).agg(
        F.min("ts").alias("first_ts"),
        F.count("*").cast("long").alias("n_events"),
    )


def stream_dedup_within_watermark(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming side: keep the first arrival per key, dropping duplicates
    while their key is within the watermark window. Built-in operator —
    per-key state lives in the state store and is evicted once the
    watermark passes, so state is O(active keys), not O(stream)."""
    keys = keys or ["user_id", "event_type"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def streaming_user_ewma(events: DataFrame, taps: int = 16) -> DataFrame:
    """Streaming twin of the batch `events_user_ewma` operator
    (registry_ext11): per-user fixed-point exponential-decay engagement,
    emitted once per micro-batch with the decay re-anchored at the
    user's newest event.

    State is BOUNDED by construction: the running event count plus the
    last `taps`-1 (ts, event_id, v_milli) triples — the only history a
    16-tap kernel can ever touch — so an infinite stream holds O(taps)
    per key, no watermark needed for the state bound. Arithmetic is the
    batch op's exactly: v_milli = round(value*1000), weights 2^(15-j),
    all-integer; the last emission per user equals the batch operator's
    row when arrivals are (ts, event_id)-ordered across micro-batches
    (the dedup_events contract; a tap that has already slid past the
    kept horizon cannot be revived by a late event, which is the
    documented approximation every bounded-state stream op makes)."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, ts, eid, vm = (
            state.get if state.exists else (0, [], [], [])
        )
        rows = list(zip(ts, eid, vm))
        for pdf in pdfs:
            n += len(pdf)
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            rows.extend(
                zip(ts_us, pdf["event_id"].tolist(),
                    (pdf["value"] * 1000).round().astype("int64").tolist())
            )
        rows.sort()
        rows = rows[-taps:]
        ewma = sum(
            v * (1 << (taps - 1 - j))
            for j, (_, _, v) in enumerate(reversed(rows))
        )
        keep = rows[-(taps - 1):]
        state.update((
            n,
            [r[0] for r in keep],
            [r[1] for r in keep],
            [r[2] for r in keep],
        ))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "last_event_id": [rows[-1][1] if rows else None],
                "ewma_fp": [ewma],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, last_event_id long, ewma_fp long"
        ),
        stateStructType=(
            "n long, ts array<long>, eid array<long>, vm array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
