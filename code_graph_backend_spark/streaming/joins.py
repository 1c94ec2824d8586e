"""Stream-stream event-time join (SURVEY §2.10 extension).

The classic attribution join — each purchase matched to the same user's
clicks in the preceding hour — written once and run in BOTH modes:

- batch: an equi-join on user_id with the time-range as a residual
  predicate (hash join, NOT a range/nested-loop join — the equi key does
  the heavy lifting, the interval only filters matched pairs);
- streaming: the same expression over readStream sides with watermarks;
  Spark's stream-stream inner join buffers each side's state only within
  the watermark + interval bound, so state is O(events per hour), not
  O(stream) — the property that makes this run forever on a real stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Pairs (user_id, click_id, purchase_id): purchase strictly after the
    click and within `within`. Mode-agnostic — callers pass batch or
    streaming DataFrames."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}")),
        )
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    )
