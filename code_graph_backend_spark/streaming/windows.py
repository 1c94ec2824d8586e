"""Windowed analytics over the `events` table (SURVEY.md §2.10 extensions).

The reference has no streaming operators; these are the driver-mandated
beyond-parity surface. Each aggregation is written once and runs in BOTH
modes: batch (DataFrame in, DataFrame out — what the oracle checks) and
Structured Streaming (readStream + watermark; see `streamify`), because
`window()`/`session_window()` are mode-agnostic expressions.

Float sums use exact decimal accumulation (order-independent — in streaming
this also makes state-merge associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import dec_sum


def tumbling(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling windows per event_type: count + exact value sum."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dec_sum("value", 2).alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding windows (width/slide) per event_type. Each event lands in
    width/slide windows — Spark's window() does the fan-out internally."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dec_sum("value", 2).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )


def session(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence.
    (Streaming mode: identical expression + watermark; state is merged by
    Spark's session-window state store.)"""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dec_sum("value", 2).alias("value_sum"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce the event-time column to TIMESTAMP.

    Parquet round-trips in this environment can surface `ts` as
    TIMESTAMP_NTZ (isAdjustedToUTC=false) or as raw nanos (bigint);
    `withWatermark` requires TIMESTAMP and raises
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise. Cheap cast, no-op when
    already TIMESTAMP.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":  # epoch nanos
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype is not None and dtype != "timestamp":  # e.g. timestamp_ntz
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def streamify(spark, parquet_path: str, agg, watermark: str = "2 hours"):
    """Run one of the window aggs as a genuine Structured Streaming query
    over a file source; returns the DataStreamWriter (caller starts it).

    Used by tests to prove mode parity: `agg(stream_df)` with a watermark
    produces, after the stream drains, the same rows as `agg(batch_df)`.
    """
    schema = spark.read.parquet(parquet_path).schema
    stream = normalize_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    ).withWatermark("ts", watermark)
    return agg(stream).writeStream.outputMode("append")


def trending(events: DataFrame, width: str = "1 hour", k: int = 3) -> DataFrame:
    """Top-k event types per tumbling window by count (ties: type asc) —
    the "what's trending this hour" rollup. The COUNT stage is the
    mode-agnostic window aggregation (streams under a watermark exactly
    like `tumbling`); the rank is a per-window top-k over the
    type-cardinality-sized counts — in a streaming deployment that view
    sits on the append sink (or foreachBatch), the standard split for
    rank-over-aggregate, which no engine can emit incrementally."""
    from pyspark.sql.window import Window

    counts = (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    rank_w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= k)
        .select("window_start", "event_type", "n_events", F.col("rnk").cast("long").alias("rnk"))
    )


def distinct_hll_registers(
    events: DataFrame, width: str = "1 hour", item_col: str = "user_id"
) -> DataFrame:
    """The MODE-AGNOSTIC stage of windowed distinct-count sketching:
    (window w, bucket, m) HLL register table per tumbling window — a
    plain event-time window aggregation, so it streams under a watermark
    exactly like `tumbling` (max() over rho is the same
    multiset-insensitive accumulator that makes HLL mergeable; state per
    window is bounded at 256 registers however many events arrive —
    THE reason a 100 TB stream counts distincts with a sketch, not a
    distinct())."""
    from ..functions.sketches import _rho_sql

    h = F.md5(F.col(item_col).cast("string"))
    return (
        events.select(
            F.window("ts", width).alias("w"),
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            F.expr(
                _rho_sql(f"substring(md5(cast({item_col} as string)), 3, 12)")
            ).cast("int").alias("rho"),
        )
        .groupBy("w", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def distinct_hll(
    events: DataFrame, width: str = "1 hour", item_col: str = "user_id"
) -> DataFrame:
    """Per-window HLL distinct estimate beside the exact count (the
    calibration view, hll_distinct's contract keyed by window_start):
    (window_start, hll_est, exact_distinct, rel_err). The register stage
    is `distinct_hll_registers` (streams); the estimator + exact twin
    run serving-side over the 256-rows-per-window register table."""
    from ..functions.sketches import _estimate

    regs = distinct_hll_registers(events, width, item_col)
    est = _estimate(
        regs.select(F.col("w.start").alias("window_start"), "bucket", "m"),
        ["window_start"],
    )
    exact = (
        events.select(
            F.window("ts", width).alias("w"), F.col(item_col).alias("i")
        )
        .select(F.col("w.start").alias("window_start"), "i")
        .distinct()
        .groupBy("window_start")
        .agg(F.count("*").alias("exact_distinct"))
    )
    return est.join(exact, "window_start").select(
        "window_start",
        F.round("est", 4).alias("hll_est"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(
            (F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )
