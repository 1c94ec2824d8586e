"""As-of join over an event stream — a training-pipeline staple Spark lacks
as a built-in (SURVEY.md §2.3 notes the reference has no as-of joins either;
this is a beyond-parity operator).

Implementation: the classic single-shuffle formulation — union both sides,
sort within each key by (ts, tiebreak), and carry the right side forward
with `last(..., ignorenulls=True)` over ROWS UNBOUNDED PRECEDING .. 1
PRECEDING. One exchange on the key, no range join, no per-key loop: at
100 TB this shuffles each event exactly once and the window is a streaming
pass within each partition's sort order (Tungsten external sort handles
keys that don't fit memory). The strictly-prior semantics (`1 PRECEDING`)
make the result deterministic under the (ts, event_id) total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_prior_event(
    events: DataFrame,
    left_type: str,
    right_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """For each `left_type` event, the id of the most recent strictly-prior
    `right_type` event with the same key (null if none yet).

    Returns (event_id, user_id, prior_id).
    """
    both = events.filter(F.col("event_type").isin([left_type, right_type]))
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = both.withColumn(
        "_r", F.when(F.col("event_type") == right_type, F.col(id_col))
    )
    return (
        marked.withColumn("prior_id", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("event_type") == left_type)
        .select(id_col, key_col, "prior_id")
    )
