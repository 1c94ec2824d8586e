"""Round-5w extension queries:

- shard_zorder_prune: the lakehouse Z-ORDER study — zone-map skipping
  rates for single- and two-dimensional predicates under three
  physical layouts of the events table (time-clustered, user-
  clustered, Morton-interleaved). THE measured argument behind Delta/
  Iceberg `ZORDER BY (a, b)`: linear clustering prunes one dimension
  perfectly and the other not at all; the space-filling curve prunes
  both well. Morton codes are exact integer bit-interleaves computed
  by the SAME generated expression in both engines;
- supply_risk_single_source: parts supplied by exactly one supplier
  and the revenue exposed to that single source, per nation — the
  supply-chain concentration screen (counts integer, revenue via
  dec_sum DECIMAL).

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.aggregates import dec_sum
from .registry import register
from .session import read_table

_Z_BITS = 16
_Z_SHARDS = 64


def _morton_sql(ucol: str, tcol: str) -> str:
    """Bit-interleave expression string valid in BOTH Spark SQL and
    DuckDB: operators >>, &, * (shift-left via multiply by power of
    two, since DuckDB lacks a shiftleft FUNCTION and Spark lacks <<
    in all dialect modes — multiplication is unambiguous in both)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({ucol} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({tcol} >> {i}) & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    morton = _morton_sql("un", "tn")
    return f"""
    WITH e AS (
        SELECT user_id,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS es
        FROM events
    ),
    mx AS (
        SELECT MAX(user_id) AS mu, MIN(es) AS t0, MAX(es) AS t1 FROM e
    ),
    nrm AS (
        SELECT user_id, es,
               (user_id * {1 << _Z_BITS}) // (mu + 1) AS un,
               ((es - t0) * {1 << _Z_BITS}) // (t1 - t0 + 1) AS tn
        FROM e, mx
    ),
    keyed AS (
        SELECT user_id, es, ({morton}) AS z FROM nrm
    ),
    laid AS (
        SELECT user_id, es,
               CAST(NTILE({_Z_SHARDS}) OVER (ORDER BY es, user_id) - 1
                    AS BIGINT) AS sh_time,
               CAST(NTILE({_Z_SHARDS}) OVER (ORDER BY user_id, es) - 1
                    AS BIGINT) AS sh_user,
               CAST(NTILE({_Z_SHARDS}) OVER (ORDER BY z, user_id, es) - 1
                    AS BIGINT) AS sh_z
        FROM keyed
    ),
    longf AS (
        SELECT 'by_time' AS layout, sh_time AS shard, user_id, es FROM laid
        UNION ALL
        SELECT 'by_user', sh_user, user_id, es FROM laid
        UNION ALL
        SELECT 'zorder', sh_z, user_id, es FROM laid
    ),
    zm AS (
        SELECT layout, shard, CAST(COUNT(*) AS BIGINT) AS rows_,
               MIN(user_id) AS u_min, MAX(user_id) AS u_max,
               MIN(es) AS t_min, MAX(es) AS t_max
        FROM longf GROUP BY 1, 2
    ),
    pred AS (
        SELECT p.pname, p.u_lo, p.u_hi, p.t_lo, p.t_hi
        FROM (
            SELECT 'time_day0' AS pname,
                   CAST(0 AS BIGINT) AS u_lo,
                   CAST(9223372036854775807 AS BIGINT) AS u_hi,
                   t0 AS t_lo, t0 + 86400 AS t_hi
            FROM mx
            UNION ALL
            SELECT 'user_low16', 0, (mu + 15) // 16,
                   CAST(-9223372036854775808 AS BIGINT),
                   CAST(9223372036854775807 AS BIGINT)
            FROM mx
            UNION ALL
            SELECT 'both', 0, (mu + 15) // 16, t0, t0 + 86400 FROM mx
        ) p
    ),
    prune AS (
        SELECT zm.layout, pred.pname,
               CAST(COUNT(*) AS BIGINT) AS n_shards,
               CAST(SUM(CASE WHEN zm.u_max < pred.u_lo OR zm.u_min > pred.u_hi
                         OR zm.t_max < pred.t_lo OR zm.t_min > pred.t_hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS shards_pruned,
               CAST(SUM(CASE WHEN zm.u_max < pred.u_lo OR zm.u_min > pred.u_hi
                         OR zm.t_max < pred.t_lo OR zm.t_min > pred.t_hi
                    THEN zm.rows_ ELSE 0 END) AS BIGINT) AS rows_avoided
        FROM zm CROSS JOIN pred GROUP BY 1, 2
    )
    SELECT layout, pname AS predicate, n_shards, shards_pruned, rows_avoided
    FROM prune ORDER BY layout, predicate
    """


@register("shard_zorder_prune", _zorder_oracle())
def shard_zorder_prune_q(spark, sf_dir):
    """Z-ORDER layout study on (user_id, event_time): three 64-shard
    layouts — time-clustered, user-clustered, Morton-interleaved — and
    three predicates (one day of time, 1/16 of the user range, both).
    Zone maps keep per-shard min/max of BOTH columns; a shard is
    pruned when either dimension's range misses the predicate box.
    Expected shape (and what the driver's data shows): by_time prunes
    time_day0 almost fully and user_low16 not at all; by_user the
    reverse; zorder prunes BOTH at ~sqrt efficiency — the Delta/Iceberg
    ZORDER argument as a measured table. The Morton code is one
    generated integer bit-interleave expression, identical text in
    both engines; each 64-shard cut is an exact_ntile (functions/
    packing.py: two-level prefix rank over order-aligned buckets + the
    closed-form NTILE law — the oracle keeps the flat NTILEs, so
    equality is the decomposition proof), i.e. exactly the
    repartitionByRange-at-write that produces each layout at scale,
    with no single-partition sort. Rows tied on a full (metric, ties)
    order carry identical (user_id, es) and are exchangeable across a
    shard boundary — zone maps are tie-invariant."""
    from .functions.packing import exact_ntile

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es")
    )
    mx = ev.agg(
        F.max("user_id").alias("mu"), F.min("es").alias("t0"),
        F.max("es").alias("t1"), F.count("*").cast("long").alias("_n"),
    )
    nrm = ev.crossJoin(F.broadcast(mx)).select(
        "user_id", "es", "mu", "t0", "t1", "_n",
        F.expr(f"(user_id * {1 << _Z_BITS}) div (mu + 1)").alias("un"),
        F.expr(f"((es - t0) * {1 << _Z_BITS}) div (t1 - t0 + 1)").alias("tn"),
    )
    keyed = nrm.withColumn("z", F.expr(_morton_sql("un", "tn")))
    keyed = exact_ntile(keyed, "es", "_n", ["user_id"], "_tt",
                        n_tiles=_Z_SHARDS, width=86400)
    keyed = exact_ntile(keyed, "user_id", "_n", ["es"], "_tu",
                        n_tiles=_Z_SHARDS, width=64)
    keyed = exact_ntile(keyed, "z", "_n", ["user_id", "es"], "_tz",
                        n_tiles=_Z_SHARDS, width=1 << _Z_BITS)
    laid = keyed.select(
        "user_id", "es", "t0", "t1", "mu",
        (F.col("_tt") - 1).cast("long").alias("sh_time"),
        (F.col("_tu") - 1).cast("long").alias("sh_user"),
        (F.col("_tz") - 1).cast("long").alias("sh_z"),
    )
    longf = laid.select(
        F.expr(
            "stack(3, 'by_time', sh_time, 'by_user', sh_user, 'zorder', sh_z)"
        ).alias("layout", "shard"),
        "user_id", "es", "t0", "mu",
    )
    zm = longf.groupBy("layout", "shard").agg(
        F.count("*").cast("long").alias("rows_"),
        F.min("user_id").alias("u_min"), F.max("user_id").alias("u_max"),
        F.min("es").alias("t_min"), F.max("es").alias("t_max"),
        F.max("t0").alias("t0"), F.max("mu").alias("mu"),
    )
    big = (1 << 63) - 1
    preds = (
        zm.select(
            "*", F.lit("time_day0").alias("pname"),
            F.lit(0).alias("u_lo"), F.lit(big).alias("u_hi"),
            F.col("t0").alias("t_lo"), (F.col("t0") + 86400).alias("t_hi"),
        )
        .unionByName(
            zm.select(
                "*", F.lit("user_low16").alias("pname"),
                F.lit(0).alias("u_lo"),
                F.expr("(mu + 15) div 16").alias("u_hi"),
                F.lit(-big - 1).alias("t_lo"), F.lit(big).alias("t_hi"),
            )
        )
        .unionByName(
            zm.select(
                "*", F.lit("both").alias("pname"),
                F.lit(0).alias("u_lo"),
                F.expr("(mu + 15) div 16").alias("u_hi"),
                F.col("t0").alias("t_lo"), (F.col("t0") + 86400).alias("t_hi"),
            )
        )
    )
    pruned_flag = (
        (F.col("u_max") < F.col("u_lo")) | (F.col("u_min") > F.col("u_hi"))
        | (F.col("t_max") < F.col("t_lo")) | (F.col("t_min") > F.col("t_hi"))
    )
    return (
        preds.groupBy("layout", F.col("pname").alias("predicate"))
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum(F.when(pruned_flag, 1).otherwise(0))
            .cast("long").alias("shards_pruned"),
            F.sum(F.when(pruned_flag, F.col("rows_")).otherwise(0))
            .cast("long").alias("rows_avoided"),
        )
        .orderBy("layout", "predicate")
    )


@register(
    "supply_risk_single_source",
    """
    WITH ps AS (
        SELECT l_partkey AS pk, COUNT(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY 1
    ),
    single AS (SELECT pk FROM ps WHERE n_supp = 1),
    exposed AS (
        SELECT l.l_partkey AS pk, l.l_suppkey,
               l.l_extendedprice * (1 - l.l_discount) AS rev
        FROM lineitem l JOIN single s ON s.pk = l.l_partkey
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT e.pk) AS BIGINT) AS n_single_source_parts,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(e.rev AS DECIMAL(30,4))) AS DOUBLE) AS exposed_revenue
    FROM exposed e
    JOIN supplier su ON su.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = su.s_nationkey
    GROUP BY 1 ORDER BY nation
    """,
)
def supply_risk_single_source_q(spark, sf_dir):
    """Supply-chain concentration screen: parts bought from exactly ONE
    supplier and the revenue exposed to that source, rolled up to the
    supplier's nation. One distinct-count agg gates the fact table via
    a semi-join-shaped inner join, dimensions broadcast, money through
    dec_sum DECIMAL."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"), "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    from .scratch import scratch_persist

    li = scratch_persist(li)
    single = (
        li.groupBy("pk")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") == 1)
        .select("pk")
    )
    su = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    na = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    return (
        li.join(single, "pk")
        .join(F.broadcast(su), "l_suppkey")
        .join(F.broadcast(na), "s_nationkey")
        .groupBy("nation")
        .agg(
            F.countDistinct("pk").cast("long").alias("n_single_source_parts"),
            F.count("*").cast("long").alias("n_items"),
            dec_sum(F.col("rev")).alias("exposed_revenue"),
        )
        .orderBy("nation")
    )
