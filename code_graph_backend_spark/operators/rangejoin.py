"""Interval (range) join (SURVEY.md J12) — the lcov hit-line ⋈ function-span
matching (reference api/code_coverage/lcov/lcov.py:175-209, a two-pointer
merge over sorted lists).

A naive `a.join(b, (a.x >= b.lo) & (a.x <= b.hi))` becomes a broadcast
nested-loop join — O(n·m) and a scale killer. The classic fix is *binning*:
quantize both sides to fixed-width buckets, equi-join on the bucket id, then
re-check the exact predicate. An interval spanning k buckets is replicated k
times (bounded by max interval width / bin width), so the join is hash-based
and shuffle-friendly; the residual predicate restores exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: int = 64,
) -> DataFrame:
    """Equi-join-backed range join: rows of `points` matched to rows of
    `intervals` with lo <= point <= hi.

    Returns the cross of matching rows (all columns from both inputs).
    """
    p = points.withColumn("_bin", (F.col(point_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        "_bins",
        F.sequence(
            (F.col(lo_col) / bin_width).cast("long"),
            (F.col(hi_col) / bin_width).cast("long"),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    return (
        p.join(i, "_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bin")
    )
