"""Ordered funnel analysis over the events stream — the product-analytics
staple (signup → view → click → purchase): how many users completed each
prefix of the step sequence IN ORDER.

Semantics (the standard greedy funnel): a user reaches stage k iff there
exist events t1 < t2 < ... < tk with event i of type steps[i]. The greedy
earliest-chain construction (e1 = first step-1 event; e_i = first step-i
event AFTER e_{i-1}) decides this exactly: if any ordered chain exists,
the greedy one does.

Scale shape: one min-aggregate per stage over a user-keyed join — k-1
equi-joins on user_id, each map-side combinable, no windows and no
per-user event sorting. All stages share the user-hash partitioning, so
AQE coalesces the chain into one effective shuffle of the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, t1..tk): each user's greedy completion time per reached
    stage (null once a stage is unreached)."""
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_ts"))
            .join(cur, "user")
            .filter(F.col("_ts") > F.col(f"t{i - 1}"))
            .groupBy("user", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(
            nxt.select("user", f"t{i}"), "user", "left_outer"
        )
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage_idx, stage, n_users): users completing each ordered prefix.
    Fully declarative — the one-row aggregate unpivots via stack(), no
    driver round-trip."""
    times = funnel_stage_times(events, steps, user_col, ts_col, type_col)
    aggs = [
        F.count(F.col(f"t{i}")).cast("long").alias(f"n{i}")
        for i in range(1, len(steps) + 1)
    ]
    stack_args = ", ".join(
        f"{i}, '{steps[i - 1]}', n{i}" for i in range(1, len(steps) + 1)
    )
    return times.agg(*aggs).selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (stage_idx, stage, n_users)"
    ).selectExpr(
        "CAST(stage_idx AS INT) AS stage_idx", "stage",
        "CAST(n_users AS BIGINT) AS n_users",
    )
