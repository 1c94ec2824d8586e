"""Round-5y extension queries:

- shard_hash_ring: consistent-hashing assignment study — docs placed
  on an md5 ring against 8 workers × 16 vnodes, then again with a 9th
  worker; per-worker loads under both rings and how many docs MOVE
  (the 1/n guarantee that makes consistent hashing THE cache/shard
  rebalancing scheme; a modulo ring would move ~8/9 of everything).
  The clockwise successor is found with JVM-side higher-order array
  functions over a broadcast sorted ring — map-only, no join;
- events_bot_regularity: users whose inter-event gaps are TOO regular
  (integer variance numerator below a threshold per event count) —
  the trust-and-safety screen for scripted traffic, in exact integer
  moments (n·Σg² − (Σg)², the sigma-gate discipline).

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table

_RING_WORKERS = 8
_RING_VNODES = 16


def _ring_points(n_workers: int) -> list[tuple[int, int]]:
    """(point, worker) — the md5 ring, 48-bit points, computed ONCE at
    generation time so both engines read identical literals."""
    pts = []
    for w in range(n_workers):
        for v in range(_RING_VNODES):
            h = hashlib.md5(f"w{w}:v{v}".encode()).hexdigest()
            pts.append((int(h[:12], 16), w))
    pts.sort()
    return pts


def _assign_expr(pts: list[tuple[int, int]], hcol: str) -> str:
    """SQL expression (Spark + DuckDB): worker owning `hcol` = worker of
    the first ring point clockwise (>= h, else the smallest point).
    Emitted as a sorted literal array + higher-order filter, map-only."""
    arr = ", ".join(f"{p * 16 + w}" for p, w in pts)  # point*16+worker packs both
    # first element >= h*16 (h strictly below 2^48 so h*16+15 bounds all
    # workers of the same point; list is sorted by the packed value)
    return (
        f"COALESCE(array_min(filter(array({arr}), x -> x >= {hcol} * 16)),"
        f" {pts[0][0] * 16 + pts[0][1]}) % 16"
    )


def _ring_sql() -> str:
    p8 = _ring_points(_RING_WORKERS)
    p9 = _ring_points(_RING_WORKERS + 1)

    # DuckDB spelling: [..] literal list, list_min/list_filter
    def duck(pts):
        arr = ", ".join(f"{p * 16 + w}" for p, w in pts)
        return (
            f"COALESCE(list_min(list_filter([{arr}], x -> x >= h * 16)),"
            f" {pts[0][0] * 16 + pts[0][1]}) % 16"
        )

    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                    AS BIGINT) AS h
        FROM documents
    ),
    asg AS (
        SELECT doc_id, ({duck(p8)}) AS w8, ({duck(p9)}) AS w9 FROM d
    )
    SELECT CAST(w8 AS BIGINT) AS worker,
           CAST(COUNT(*) AS BIGINT) AS n_docs_8,
           CAST(SUM(CASE WHEN w9 = w8 THEN 1 ELSE 0 END) AS BIGINT) AS n_stay,
           CAST(SUM(CASE WHEN w9 <> w8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
    FROM asg GROUP BY w8 ORDER BY worker
    """


@register("shard_hash_ring", _ring_sql())
def shard_hash_ring_q(spark, sf_dir):
    """Consistent-hashing rebalance study: md5 ring with 8 workers × 16
    vnodes vs the same ring plus a 9th worker. Per original worker: the
    load, how many docs stay, how many move — the measured 1/n
    guarantee (only the arcs claimed by the new worker's vnodes move;
    a modulo scheme would reshuffle ~8/9 of the corpus). Ring points
    are generation-time literals; the clockwise-successor lookup is a
    JVM-side higher-order filter over the broadcast sorted array
    (map-only — the plan a 100 TB router runs per record)."""
    p8 = _ring_points(_RING_WORKERS)
    p9 = _ring_points(_RING_WORKERS + 1)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        ).cast("long").alias("h"),
    )
    asg = docs.select(
        "doc_id",
        F.expr(_assign_expr(p8, "h")).cast("long").alias("w8"),
        F.expr(_assign_expr(p9, "h")).cast("long").alias("w9"),
    )
    return (
        asg.groupBy(F.col("w8").alias("worker"))
        .agg(
            F.count("*").cast("long").alias("n_docs_8"),
            F.sum(F.when(F.col("w9") == F.col("w8"), 1).otherwise(0))
            .cast("long").alias("n_stay"),
            F.sum(F.when(F.col("w9") != F.col("w8"), 1).otherwise(0))
            .cast("long").alias("n_moved"),
        )
        .orderBy("worker")
    )


_BOT_MIN_EVENTS = 5
_BOT_CV_MILLI = 10  # flag when n*var_num <= threshold * (sum_g)^2 / 1000


@register(
    "events_bot_regularity",
    f"""
    WITH e AS (
        SELECT user_id,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es,
               event_id
        FROM events
    ),
    g AS (
        SELECT user_id,
               es - LAG(es) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
               ) AS gap
        FROM e
    ),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS sg,
               SUM(gap::HUGEINT * gap) AS sgg
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
        HAVING COUNT(*) >= {_BOT_MIN_EVENTS}
    )
    SELECT user_id, n, sg,
           CAST(n * sgg - sg::HUGEINT * sg AS BIGINT) AS var_num,
           CAST(CASE WHEN (n * sgg - sg::HUGEINT * sg) * 1000000
                      <= {_BOT_CV_MILLI} * (sg::HUGEINT * sg)
                THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
    FROM s ORDER BY user_id
    """,
)
def events_bot_regularity_q(spark, sf_dir):
    """Scripted-traffic screen: per user with ≥{_BOT_MIN_EVENTS}
    inter-event gaps, the exact integer variance numerator
    n·Σg² − (Σg)² and a flag when the squared coefficient of variation
    is below 10^-5 (cross-multiplied — var_num·10^6 ≤ 10·(Σg)², no
    float division). A human's gaps are bursty; a cron job's are
    metronomic. One LAG window + one per-user agg; DECIMAL(38)/HUGEINT
    keeps the squares exact at any event volume."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = ev.select(
        "user_id", (F.col("es") - F.lag("es").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("gap").cast("long").alias("sg"),
            F.sum(
                F.col("gap").cast("decimal(38,0)") * F.col("gap")
            ).alias("sgg"),
        )
        .filter(F.col("n") >= _BOT_MIN_EVENTS)
    )
    var_num = F.col("n") * F.col("sgg") - F.col("sg").cast("decimal(38,0)") * F.col("sg")
    return (
        s.select(
            "user_id", "n", "sg",
            var_num.cast("long").alias("var_num"),
            F.when(
                var_num * 1_000_000
                <= F.lit(_BOT_CV_MILLI)
                * F.col("sg").cast("decimal(38,0)") * F.col("sg"),
                1,
            ).otherwise(0).cast("long").alias("bot_flag"),
        )
        .orderBy("user_id")
    )
