"""Stateless quality/anomaly gates shared verbatim between batch and
Structured Streaming plans.

The 3-sigma outlier gate decides |x − μ| > kσ in EXACT integer arithmetic
— (n·x − Σx)² > k²·(n·Σx² − (Σx)²) over values quantized to integer
millis — so the decision boundary cannot flip between engines, runs, or
modes. Because the gate is a stream-static broadcast join + filter (no
aggregation, no state), it runs unchanged under `readStream` in append
mode: the canonical serving layout is stats refreshed from history on a
schedule, streamed events gated row-by-row with zero streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_events(events: DataFrame) -> DataFrame:
    """(event_id, event_type, x) with x = round(value·1000) as BIGINT —
    the exact-arithmetic domain both the stats and the gate share."""
    return events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 1000).cast("long").alias("x"),
    )


def event_sigma_stats(quantized: DataFrame) -> DataFrame:
    """Per-type (n, Σx, Σx²) — one hash-agg over history; output is
    type-cardinality sized (broadcastable by construction).

    Accumulation runs in DECIMAL(38,0), not int64: Σx² wraps silently in
    a non-ANSI long sum once n·x² crosses ~9·10¹⁸ (a single |value| >
    ~3×10⁶ already overflows the per-row x·x), and a wrapped sum would
    launder a wrong value into the (exact) gate comparison. Decimal sums
    stay exact to ~10³⁸, matching the DuckDB twin's HUGEINT."""
    xd = F.col("x").cast("decimal(38,0)")
    return quantized.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(xd * xd).alias("sxx"),
    )


def sigma_outlier_gate(quantized: DataFrame, stats: DataFrame, k: int = 3) -> DataFrame:
    """Rows with |x − μ| > kσ under the exact integer boundary. `quantized`
    may be a batch OR streaming DataFrame; `stats` must be batch (the
    stream-static join broadcasts it).

    The squared terms leave int64 once n·Σx² crosses ~10¹⁸ (hit at sf0.1:
    100k events × Σx² ≈ 10¹³), so the comparison runs in DECIMAL(38,0) —
    still exact integer arithmetic, 128-bit backed, and the DuckDB twin
    mirrors it with HUGEINT casts. Same decision boundary, no overflow at
    any realistic scale (bound ~10³⁸)."""
    d38 = "decimal(38,0)"
    n, sx, sxx, x = (
        F.col("n").cast(d38), F.col("sx").cast(d38),
        F.col("sxx").cast(d38), F.col("x").cast(d38),
    )
    dev = n * x - sx
    return (
        quantized.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > F.lit(k * k).cast(d38) * (n * sxx - sx * sx))
        .select(
            "event_id", "event_type",
            F.round(F.col("x") / 1000.0, 3).alias("value"),
        )
    )


def event_mad_stats(quantized: DataFrame) -> DataFrame:
    """Per-type (med2, mad4): the ROBUST location/scale twin of
    event_sigma_stats — median and median-absolute-deviation instead of
    mean/stddev, so a single extreme value cannot drag the boundary the
    way it drags μ and σ (the standard robust-outlier objection to the
    3-sigma gate).

    Exactness: both engines interpolate percentile(0.5) linearly, so on
    integer inputs every median is a HALF-integer — exact in double.
    Doubling before the cast back to BIGINT loses nothing: med2 = 2·med
    of x, mad4 = 2·median of dev2 where dev2 = |2·x − med2| (itself
    integer, already in 2x units). Two hash-aggs (the MAD needs the
    median first — inherently two passes, so unlike the sigma gate this
    is a batch-side stats builder; the GATE below is still stateless and
    stream-composable against these stats)."""
    med2 = (
        quantized.groupBy("event_type")
        .agg((F.percentile(F.col("x"), F.lit(0.5)) * 2).cast("long").alias("med2"))
    )
    dev = quantized.join(F.broadcast(med2), "event_type").select(
        "event_type",
        F.abs(F.lit(2) * F.col("x") - F.col("med2")).alias("dev2"),
        "med2",
    )
    return (
        dev.groupBy("event_type", "med2")
        .agg((F.percentile(F.col("dev2"), F.lit(0.5)) * 2).cast("long").alias("mad4"))
        .select("event_type", "med2", "mad4")
    )


def mad_outlier_gate(
    quantized: DataFrame, stats: DataFrame, k: int = 3
) -> DataFrame:
    """Rows with |x − med| > k·1.4826·MAD (1.4826 ≈ the normal-
    consistency constant) under an EXACT integer boundary: with
    dev2 = |2x − med2| (2x units) and mad4 (4x units), the gate
    |x−med| > k·(14826/10000)·MAD becomes (dev2 = 2|x−med|, mad4 = 4·MAD,
    so dev2/2 > k·1.4826·mad4/4 ⟺ 2·dev2 > k·1.4826·mad4 ⟺)

        20000·dev2 > k·14826·mad4

    — pure BIGINT products (bounded by 4·10⁴·|2x|, far inside int64 for
    milli-quantized values). Stateless: broadcast stats join + filter,
    so it composes onto a stream exactly like sigma_outlier_gate."""
    return (
        quantized.join(F.broadcast(stats), "event_type")
        .withColumn(
            "dev2", F.abs(F.lit(2) * F.col("x") - F.col("med2"))
        )
        .filter(
            F.lit(20000) * F.col("dev2") > F.lit(k * 14826) * F.col("mad4")
        )
        .select(
            "event_id", "event_type",
            F.round(F.col("x") / 1000.0, 3).alias("value"),
            "dev2",
        )
    )
