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
