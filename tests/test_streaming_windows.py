"""Windowed analytics + streaming/batch parity (SURVEY §2.10 extensions)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.streaming import windows


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_tumbling(spark):
    ev = _events(
        spark,
        [(_t(5), 1, "click", 1.0), (_t(59), 1, "click", 2.0), (_t(65), 1, "click", 4.0)],
    )
    rows = {r["window_start"]: (r["n_events"], r["value_sum"])
            for r in windows.tumbling(ev, "1 hour").collect()}
    assert rows[T0] == (2, 3.0)
    assert rows[T0 + dt.timedelta(hours=1)] == (1, 4.0)


def test_sliding_fanout(spark):
    ev = _events(spark, [(_t(40), 1, "click", 1.0)])
    rows = sorted(r["window_start"] for r in windows.sliding(ev, "1 hour", "30 minutes").collect())
    # event at :40 belongs to windows starting at :00 and :30
    assert rows == [T0, T0 + dt.timedelta(minutes=30)]


def test_session_gap_semantics(spark):
    ev = _events(
        spark,
        [
            (_t(0), 1, "a", 1.0),
            (_t(10), 1, "a", 1.0),   # same session (gap 10m < 30m)
            (_t(55), 1, "a", 1.0),   # new session (gap 45m)
            (_t(0), 2, "a", 1.0),    # separate user
        ],
    )
    rows = windows.session(ev, "30 minutes").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_streaming_batch_parity(spark, tmp_path):
    """The same tumbling expression over readStream == over read (mode
    parity — the point of sharing the agg between both)."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # events.ts may arrive as nanos-long or TIMESTAMP_NTZ; normalize
    src = windows.normalize_event_time(src)
    data_dir = str(tmp_path / "ev")
    src.limit(500).write.parquet(data_dir)

    batch = windows.tumbling(
        windows.normalize_event_time(spark.read.parquet(data_dir)), "1 hour"
    ).collect()

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(data_dir).schema
    stream = windows.normalize_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    ).withWatermark("ts", "10 hours")
    q = (
        windows.tumbling(stream, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    stream_rows = spark.sql("select * from tumbling_test").collect()
    q.stop()

    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert {key(r): (r["n_events"], r["value_sum"]) for r in batch} == {
        key(r): (r["n_events"], r["value_sum"]) for r in stream_rows
    }


def test_stateful_running_stats_parity(spark, tmp_path):
    """applyInPandasWithState totals across micro-batches == batch groupBy."""
    import datetime as dt

    from code_graph_backend_spark.streaming import stateful

    rows = [
        (T0 + dt.timedelta(minutes=m), uid, "e", float(m + uid))
        for m in range(0, 60, 5)
        for uid in (1, 2, 3)
    ]
    ev = _events(spark, rows).repartition(4)
    src = str(tmp_path / "ev")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # last emission per user == full-history totals
    got = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in spark.sql(
            """SELECT user_id, n_events, value_sum FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM running_stats) WHERE rn = 1"""
        ).collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expect


def test_stateful_first_seen_dedup(spark, tmp_path):
    import datetime as dt

    from code_graph_backend_spark.streaming import stateful

    rows = [
        (T0 + dt.timedelta(minutes=i), 1, t, 0.0)
        for i, t in enumerate(["a", "b", "a", "c", "b", "a"])
    ]
    ev = _events(spark, rows).repartition(3)
    src = str(tmp_path / "ev2")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.streaming_first_seen(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [(r["user_id"], r["fp"]) for r in spark.sql("SELECT * FROM first_seen").collect()]
    assert sorted(got) == [(1, "a"), (1, "b"), (1, "c")]


def test_streaming_oplog_apply_matches_batch_replay(spark, tmp_path):
    """§2.10: op-log as an append stream + foreachBatch MERGE == batch
    replay of the same log (shared M1-M6 mutation layer)."""
    import json

    from code_graph_backend_spark.graph.model import (
        EDGES_SCHEMA, NODES_SCHEMA, PropertyGraph,
    )
    from code_graph_backend_spark.mutations.oplog import OpLog
    from code_graph_backend_spark.streaming import stateful

    def fresh_graph(name):
        nodes = spark.createDataFrame(
            [(1, ["File", "Searchable"], "a.py", "a.py", None, None, None, None, None, None)],
            NODES_SCHEMA,
        )
        edges = spark.createDataFrame([], EDGES_SCHEMA)
        return PropertyGraph(spark, name, nodes, edges)

    log = OpLog()
    log.record("c0", "c1", "merge_nodes", {"rows": [
        {"id": 2, "labels": ["Function", "Searchable"], "name": "f", "path": "a.py"}]})
    log.record("c0", "c1", "merge_edges", {"rows": [
        {"src": 1, "dst": 2, "type": "DEFINES"}]})
    log.record("c1", "c2", "merge_nodes", {"rows": [
        {"id": 3, "labels": ["Class", "Searchable"], "name": "C", "path": "a.py"}]})

    # batch replay
    g_batch = log.replay_path(fresh_graph("b"), ["c0", "c1", "c2"])
    expect_nodes = sorted((r["id"], r["name"]) for r in g_batch.nodes.collect())
    expect_edges = sorted((r["src"], r["dst"], r["type"]) for r in g_batch.edges.collect())

    # streamed replay: one parquet file per commit hop → maxFilesPerTrigger=1
    src = str(tmp_path / "oplog")
    df = log.to_df(spark)
    df.filter(F.col("commit_to") == "c1").coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("commit_to") == "c2").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    writer, state = stateful.streaming_oplog_apply(spark, stream, fresh_graph("s"))
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    g_stream = state["graph"]
    assert sorted((r["id"], r["name"]) for r in g_stream.nodes.collect()) == expect_nodes
    assert sorted((r["src"], r["dst"], r["type"]) for r in g_stream.edges.collect()) == expect_edges


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode + watermark: a row arriving after the watermark passed
    its window's end is DROPPED from the finalized result (late-data
    semantics batch mode does not have — batch counts every row)."""
    import datetime as dt

    data_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")

    def t(h, m):
        return dt.datetime(2026, 1, 1, h, m, 0)

    def append(rows):
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double, user_id long"
        ).coalesce(1).write.mode("append").parquet(data_dir)

    # window 9:00-10:00 gets two on-time rows
    append([(t(9, 5), "click", 1.0, 1), (t(9, 40), "click", 1.0, 2)])

    schema = spark.read.parquet(data_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        windows.tumbling(stream, "1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # advance event time to 10:30 → watermark 10:20 > 10:00 closes the
    # 9:00 window at the next trigger
    append([(t(10, 30), "click", 1.0, 3)])
    q.processAllAvailable()
    # LATE row for the already-closed 9:00 window: must be dropped
    append([(t(9, 50), "click", 100.0, 4)])
    q.processAllAvailable()
    # advance further so every open window finalizes before we read
    append([(t(12, 0), "click", 1.0, 5)])
    q.processAllAvailable()
    rows = {r["window_start"]: r for r in spark.sql("select * from late_test").collect()}
    q.stop()

    nine = rows[t(9, 0)]
    assert nine["n_events"] == 2  # late 9:50 row excluded
    assert float(nine["value_sum"]) == 2.0

    # batch mode has no watermark: the same files count the late row
    batch = {
        r["window_start"]: r
        for r in windows.tumbling(spark.read.parquet(data_dir), "1 hour").collect()
    }
    assert batch[t(9, 0)]["n_events"] == 3


def test_stream_stream_join_parity(spark, tmp_path):
    """The attribution join over two readStream sides with watermarks ==
    the batch join over the same files (streaming/joins.py). Stream-stream
    inner join state is bounded by watermark + interval."""
    from code_graph_backend_spark.streaming.joins import click_purchase_join

    rows = []
    eid = 0
    for m in range(0, 240, 7):          # clicks every 7 min over 4h
        rows.append((_t(m), 1 + m % 3, "click", float(m), eid)); eid += 1
    for m in range(5, 240, 30):         # purchases every 30 min
        rows.append((_t(m), 1 + m % 3, "purchase", float(m), eid)); eid += 1
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double, event_id long"
    )
    src = str(tmp_path / "ev")
    ev.repartition(4).write.parquet(src)

    batch_df = spark.read.parquet(src)
    expect = sorted(
        map(tuple, click_purchase_join(
            batch_df.filter(F.col("event_type") == "click"),
            batch_df.filter(F.col("event_type") == "purchase"),
        ).collect())
    )
    assert expect, "fixture must produce at least one attributed pair"

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermark covers the fixture's whole span: parquet files arrive in
    # arbitrary order, so a tight watermark would drop genuinely-early
    # rows as late (the same reason test_streaming_batch_parity uses 10h)
    clicks = stream.filter(F.col("event_type") == "click").withWatermark("ts", "10 hours")
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark("ts", "10 hours")
    q = (
        click_purchase_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM attrib_test").collect())
    )
    assert got == expect


def test_stream_dedup_within_watermark_parity(spark, tmp_path):
    """Built-in dropDuplicatesWithinWatermark keeps exactly one row per
    key; over a TIME-ORDERED feed the kept row is the earliest, matching
    the batch twin's min(ts) per key (streaming/stateful.dedup_events)."""
    from code_graph_backend_spark.streaming import stateful

    src = windows.normalize_event_time(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ).limit(400)
    data_dir = str(tmp_path / "ev")
    # time-ordered single file => arrival order == event-time order
    src.orderBy("ts").coalesce(1).write.parquet(data_dir)

    batch = {
        (r["user_id"], r["event_type"]): r["first_ts"]
        for r in stateful.dedup_events(
            windows.normalize_event_time(spark.read.parquet(data_dir))
        ).collect()
    }

    schema = spark.read.parquet(data_dir).schema
    stream = windows.normalize_event_time(
        spark.readStream.schema(schema).parquet(data_dir)
    )
    q = (
        stateful.stream_dedup_within_watermark(stream, watermark="10 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    kept = spark.sql("select * from dedup_test").collect()
    q.stop()

    assert len(kept) == len(batch)  # one survivor per key
    for r in kept:
        assert r["ts"] == batch[(r["user_id"], r["event_type"])]


def test_sigma_gate_stream_batch_parity(spark, tmp_path):
    """The integer-exact 3-sigma gate is stateless: the same gate over a
    stream-static broadcast join must emit exactly the batch outliers, in
    append mode, with zero streaming state."""
    from code_graph_backend_spark.streaming.gates import (
        event_sigma_stats, quantize_events, sigma_outlier_gate,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = windows.normalize_event_time(src)
    data_dir = str(tmp_path / "ev")
    src.write.parquet(data_dir)

    hist = quantize_events(spark.read.parquet(data_dir))
    stats = event_sigma_stats(hist)
    batch = {r["event_id"] for r in sigma_outlier_gate(hist, stats).collect()}
    assert batch  # the gate must actually fire on this data

    stream = quantize_events(
        spark.readStream.schema(spark.read.parquet(data_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    q = (
        sigma_outlier_gate(stream, stats)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sigma_gate_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    stream_ids = {r["event_id"] for r in spark.sql(
        "select * from sigma_gate_test").collect()}
    q.stop()
    assert stream_ids == batch


def test_stream_gopher_gates_parity(spark, tmp_path):
    """Quality gating on the INGEST stream: gopher_quality_gates is a
    map-only Arrow kernel, so the identical function runs over
    readStream (append mode, no state) — the shape a 100 TB pipeline
    uses to gate documents as they land rather than in a second pass."""
    from code_graph_backend_spark.functions.text import gopher_quality_gates

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    data_dir = str(tmp_path / "docs")
    src.limit(200).write.parquet(data_dir)

    batch = {r["doc_id"]: r for r in gopher_quality_gates(
        spark.read.parquet(data_dir)).collect()}

    schema = spark.read.parquet(data_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    q = (
        gopher_quality_gates(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("gopher_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    stream_rows = {r["doc_id"]: r for r in
                   spark.sql("select * from gopher_stream_test").collect()}
    q.stop()
    assert set(stream_rows) == set(batch)
    for d, r in batch.items():
        s = stream_rows[d]
        assert (s["n_tokens"], s["mean_len_milli"], s["stop_hits"],
                s["top_frac_milli"], s["passes"]) == (
            r["n_tokens"], r["mean_len_milli"], r["stop_hits"],
            r["top_frac_milli"], r["passes"])


def test_windowed_hll_registers_stream_parity(spark, tmp_path):
    """The HLL register stage streams: same (window, bucket, m) table
    from readStream as from read — bounded state (<=256 registers per
    window) is the whole reason the stream counts distincts this way."""
    src = windows.normalize_event_time(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    data_dir = str(tmp_path / "ev")
    src.limit(500).write.parquet(data_dir)

    batch = windows.distinct_hll_registers(
        windows.normalize_event_time(spark.read.parquet(data_dir)), "1 hour"
    ).collect()

    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(data_dir).schema
    stream = windows.normalize_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    ).withWatermark("ts", "10 hours")
    q = (
        windows.distinct_hll_registers(stream, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    stream_rows = spark.sql("select * from hll_regs_test").collect()
    q.stop()

    key = lambda r: (r["w"]["start"], r["bucket"])  # noqa: E731
    assert {key(r): r["m"] for r in batch} == {
        key(r): r["m"] for r in stream_rows
    }
    # bounded state: never more than 256 registers per window
    from collections import Counter

    per_window = Counter(r["w"]["start"] for r in stream_rows)
    assert max(per_window.values()) <= 256


def test_stateful_user_ewma_parity(spark, tmp_path):
    """Streaming 16-tap EWMA's last emission per user == the batch
    events_user_ewma operator over the same history."""
    import datetime as dt
    import os

    import code_graph_backend_spark.registry_ext11  # noqa: F401  (registers)
    from code_graph_backend_spark.registry import QUERIES
    from code_graph_backend_spark.streaming import stateful

    rows = [
        (T0 + dt.timedelta(minutes=m), uid, "e", float((m * 7 + uid) % 97))
        for m in range(0, 120, 5)
        for uid in (1, 2, 3)
    ]
    ev = _events(spark, rows)
    # the batch op reads table files; give both sides the same parquet
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    ev.selectExpr(
        "monotonically_increasing_id() AS event_id", "ts", "user_id",
        "event_type", "value", "cast(null as string) AS props",
    ).write.parquet(os.path.join(sf_dir, "events.parquet"))

    batch = {
        r["user_id"]: (r["n_events"], r["last_event_id"], r["ewma_fp"])
        for r in QUERIES["events_user_ewma"](spark, sf_dir).collect()
    }

    src_df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # ordered file stream: one file per (ts-ordered) slice
    src = str(tmp_path / "stream_src")
    src_df.orderBy("ts", "event_id").coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.streaming_user_ewma(stream)
        .writeStream.format("memory")
        .queryName("user_ewma")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {}
    for r in spark.sql(
        "select * from user_ewma"
    ).collect():
        got[r["user_id"]] = (r["n_events"], r["last_event_id"], r["ewma_fp"])
    assert got == batch
