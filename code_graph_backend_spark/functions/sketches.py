"""Deterministic cardinality sketches — the "approximate counting" tier a
100 TB pipeline uses where COUNT(DISTINCT) would shuffle the raw token
stream (vocabulary profiling across shards, per-source reach counts,
join-cardinality estimation before planning a backfill).

HyperLogLog here is built on the md5 hash family — the same ANSI-replicable
trick as the exact-twin LSH/PQ oracles (functions/dedup.py:290): every
register value is a deterministic function of the input multiset, so the
DuckDB oracle replays the WHOLE sketch (bucket split, leading-zero rank,
harmonic sum, linear-counting correction) and hash-checks the estimate
itself, not just a recall bound. An approximate operator with an exact
oracle: the estimator is approximate w.r.t. the true cardinality, but the
computation is a pure deterministic function.

Scale shape: explode -> map-side project (bucket, rho) -> ONE hash-agg to
m registers per group -> per-group rollup over <=m rows. The shuffle
carries at most |groups| * m rows regardless of input size — that is the
entire point of the sketch. No UDFs anywhere; leading-zero rank is the
hex-string trim trick, JVM-side.

No reference analogue (the reference's only aggregation surface is
count/collect, SURVEY.md 2.4); this is a beyond-parity extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# m = 2^8 registers; alpha_m for m >= 128 per Flajolet et al. 2007 —
# written as the literal expression (not a pre-rounded constant) so both
# engines evaluate the identical IEEE double.
_M = 256
_ALPHA_EXPR = f"0.7213 / (1.0 + 1.079 / {_M}.0)"


def _rho_sql(hex12: str) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB) for the
    leading-zero rank (+1) of the 48-bit value encoded by the 12 hex
    chars of `hex12` — computed without conv() (whose 64-bit overflow
    semantics differ across engines): count leading '0' hex digits, then
    the first non-zero digit contributes its remaining high zero bits via
    a CASE. All-zero input maps to 49 = 48 bits + 1."""
    stripped = f"trim(LEADING '0' FROM {hex12})"
    add = (
        f"CASE substring({stripped}, 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END"
    )
    return (
        f"CASE WHEN {stripped} = '' THEN 49 "
        f"ELSE (12 - length({stripped})) * 4 + {add} + 1 END"
    )


def _estimator_sql_ctes(src: str, grouped: bool) -> str:
    """The SQL-twin home of the estimator arithmetic — shared by the
    per-group and shard-merge oracles exactly like `_estimate` is on the
    Spark side, so a constant tweak cannot desynchronize the four
    copies. Emits `est`/`raw`/`fin` CTEs over register table `src`
    (columns [grp,] m); `fin` exposes [grp,] est."""
    g = "grp," if grouped else ""
    gb = "GROUP BY grp" if grouped else ""
    return f"""est AS (
        SELECT {g}
               SUM(power(2.0, -m)) + ({_M} - COUNT(*)) AS s,
               CAST({_M} - COUNT(*) AS DOUBLE) AS v
        FROM {src} {gb}
    ),
    raw AS (
        SELECT {g} ({_ALPHA_EXPR}) * {_M}.0 * {_M}.0 / s AS raw, v FROM est
    ),
    fin AS (
        SELECT {g}
               CASE WHEN raw <= {2.5 * _M} AND v > 0
                    THEN {_M}.0 * ln({_M}.0 / v) ELSE raw END AS est
        FROM raw
    )"""


def hll_register_table(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """(group, bucket, m) register table: bucket = first byte of
    md5(item), m = max leading-zero rank of the next 48 bits. Duplicate
    items need no pre-dedup — max() over a multiset equals max() over its
    set, which is what makes HLL mergeable and one-pass."""
    h = F.md5(F.col(item_col).cast("string"))
    with_h = items.select(
        F.col(group_col).alias("grp"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr(_rho_sql("substring(md5(cast(" + item_col + " as string)), 3, 12)"))
        .cast("int").alias("rho"),
    )
    return with_h.groupBy("grp", "bucket").agg(F.max("rho").alias("m"))


def _estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., est) from a register table — the ONE home of the
    estimator arithmetic (harmonic sum + linear-counting correction);
    both the per-group sketch and the shard-merge path call it, so the
    formula cannot drift between them."""
    agged = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (F.lit(_M) - F.count("*"))
        ).alias("s"),
        (F.lit(_M) - F.count("*")).cast("double").alias("v"),
    )
    return agged.select(
        *group_cols,
        F.expr(f"({_ALPHA_EXPR}) * {_M}.0 * {_M}.0 / s").alias("raw"),
        "v",
    ).select(
        *group_cols,
        F.when(
            (F.col("raw") <= F.lit(2.5 * _M)) & (F.col("v") > 0),
            F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("v")),
        ).otherwise(F.col("raw")).alias("est"),
    )


def hll_distinct(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Per-group HLL cardinality estimate next to the exact count and the
    relative error — the calibration view. Columns:
    (group_col, hll_est double, exact_distinct long, rel_err double).

    The exact side is the oracle-twin convenience for test scales; at
    100 TB you run the sketch alone (drop the exact join) and the plan is
    explode -> one m-register agg -> rollup, with a shuffle bounded by
    |groups| * 256 rows."""
    regs = hll_register_table(items, group_col, item_col)
    est = _estimate(regs, ["grp"])
    exact = (
        items.select(F.col(group_col).alias("grp"), F.col(item_col).alias("i"))
        .distinct()
        .groupBy("grp")
        .agg(F.count("*").alias("exact_distinct"))
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.round("est", 4).alias("hll_est"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                (F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 6,
            ).alias("rel_err"),
        )
    )


def hll_sql(table_expr: str, group_col: str, item_expr: str) -> str:
    """DuckDB replica of the full sketch: identical md5 family, identical
    register table, identical estimator arithmetic — used by the driver
    oracle so the ESTIMATE hash-checks."""
    # inside the `h` CTE the item is already aliased to `i`
    rho = _rho_sql("substring(md5(CAST(i AS VARCHAR)), 3, 12)")
    return f"""
    WITH it AS (
        SELECT {group_col} AS grp, {item_expr} AS i FROM {table_expr}
    ),
    h AS (
        SELECT grp,
               CAST(('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) AS bucket,
               {rho} AS rho
        FROM it
    ),
    regs AS (SELECT grp, bucket, MAX(rho) AS m FROM h GROUP BY 1, 2),
    {_estimator_sql_ctes("regs", grouped=True)},
    ex AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact_distinct
        FROM (SELECT DISTINCT grp, i FROM it) GROUP BY grp
    )
    SELECT fin.grp AS {group_col}, ROUND(fin.est, 4) AS hll_est,
           ex.exact_distinct,
           ROUND((fin.est - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
    FROM fin JOIN ex USING (grp)
    """


def hll_merge_distinct(
    items: DataFrame, shard_col: str, item_col: str
) -> DataFrame:
    """The property that makes HLL the 100 TB answer: MERGEABILITY.
    Build one sketch per shard (as independent ingest jobs would), then
    combine them by register-wise max — never re-reading the items — and
    estimate the GLOBAL cardinality from the merged registers. Because
    max is associative/commutative/idempotent, the merged sketch is
    bit-identical to a single global sketch, so the estimate is too.

    Returns one row: (n_shards, hll_est, exact_distinct, rel_err) — the
    exact side is the test-scale calibration twin."""
    from ..scratch import scratch_persist

    # the register table feeds the shard count AND the merge — persist or
    # the explode+md5 pipeline runs once per consumer
    per_shard = scratch_persist(hll_register_table(items, shard_col, item_col))
    # count_distinct (ignores a NULL shard) — matches the SQL twin's
    # COUNT(DISTINCT grp), unlike distinct().count() which counts NULL
    n_shards = per_shard.agg(F.count_distinct("grp")).collect()[0][0]
    merged = per_shard.groupBy("bucket").agg(F.max("m").alias("m"))
    est = _estimate(merged.withColumn("_g", F.lit(1)), ["_g"]).drop("_g")
    exact = (
        items.select(F.col(item_col).alias("i")).distinct()
        .agg(F.count("*").alias("exact_distinct"))
    )
    return (
        est.crossJoin(exact)
        .select(
            F.lit(n_shards).cast("long").alias("n_shards"),
            F.round("est", 4).alias("hll_est"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                (F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 6,
            ).alias("rel_err"),
        )
    )


def hll_merge_sql(table_expr: str, shard_col: str, item_expr: str) -> str:
    """DuckDB replica of the shard-and-merge pipeline."""
    rho = _rho_sql("substring(md5(CAST(i AS VARCHAR)), 3, 12)")
    return f"""
    WITH it AS (
        SELECT {shard_col} AS grp, {item_expr} AS i FROM {table_expr}
    ),
    h AS (
        SELECT grp,
               CAST(('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) AS bucket,
               {rho} AS rho
        FROM it
    ),
    regs AS (SELECT grp, bucket, MAX(rho) AS m FROM h GROUP BY 1, 2),
    merged AS (SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket),
    {_estimator_sql_ctes("merged", grouped=False)}
    SELECT CAST((SELECT COUNT(DISTINCT grp) FROM it) AS BIGINT) AS n_shards,
           ROUND(fin.est, 4) AS hll_est,
           CAST((SELECT COUNT(DISTINCT i) FROM it) AS BIGINT) AS exact_distinct,
           ROUND((fin.est - (SELECT COUNT(DISTINCT i) FROM it))
                 / (SELECT COUNT(DISTINCT i) FROM it), 6) AS rel_err
    FROM fin
    """


def quantile_summary(
    docs: DataFrame,
    k: int = 32,
    n_shards: int = 8,
    pcts: tuple = (10, 25, 50, 75, 90),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mergeable rank-based quantile summary (the GK/KLL family's
    deterministic exact-twin): per shard keep every ⌈n_s/k⌉-th order
    statistic of the doc token counts WITH the row span it represents,
    merge the fixed-size summaries, and answer percentiles from the
    merged cumulative weights. Also reports the EXACT rank statistic and
    the absolute error — bounded by the per-shard step, the classic
    summary guarantee.

    The at-scale story mirrors corpus_hll_merge: each shard ships k rows
    regardless of shard size (a 100 TB shard contributes 32 rows to the
    merge), while the oracle's global sort is exactly the plan the
    summary exists to avoid. Everything is integers + deterministic
    (value, id) ordering, so the DuckDB twin replays construction, merge,
    and error bit-exactly.

    Returns (pct, est, exact, abs_err), one row per requested percentile.
    """
    from pyspark.sql.window import Window

    from ..session import fan_out

    toks = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), " ", ""))
        + F.lit(1)
    )
    vals = fan_out(docs).select(
        F.col(id_col).alias("i"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        toks.cast("long").alias("v"),
    )
    w_s = Window.partitionBy("shard").orderBy("v", "i")
    ranked = vals.select(
        "shard", "v", "i",
        F.row_number().over(w_s).alias("rn"),
        F.count("*").over(Window.partitionBy("shard")).alias("n_s"),
    )
    step = F.expr(f"(n_s + {k - 1}) div {k}")
    kept = ranked.filter(((F.col("rn") - 1) % step == 0) | (F.col("rn") == F.col("n_s")))
    w_k = Window.partitionBy("shard").orderBy("rn")
    kept = kept.select(
        "shard", "v", "rn", "n_s",
        (F.coalesce(F.lead("rn").over(w_k), F.col("n_s") + 1) - F.col("rn")).alias("w"),
    )
    w_g = Window.orderBy("v", "shard", "rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = kept.select(
        "v", "shard", "rn", F.sum("w").over(w_g).alias("cumw")
    )
    n_total = vals.agg(F.count("*").alias("n")).collect()[0][0]
    # exact rank statistics from the full data (the oracle-side plan the
    # summary avoids at scale — here it doubles as the error report)
    w_all = Window.orderBy("v", "i")
    exact_ranked = vals.select("v", F.row_number().over(w_all).alias("rg"))
    spark = docs.sparkSession
    pct_df = spark.createDataFrame([(int(p),) for p in pcts], "pct long").select(
        "pct", ((F.col("pct") * n_total + 99) / 100).cast("long").alias("target")
    )
    est = (
        merged.crossJoin(F.broadcast(pct_df))
        .filter(F.col("cumw") >= F.col("target"))
        .groupBy("pct")
        .agg(F.min(F.struct("cumw", "v")).alias("first"))
        .select("pct", F.col("first.v").alias("est"))
    )
    exact = (
        exact_ranked.crossJoin(F.broadcast(pct_df))
        .filter(F.col("rg") == F.col("target"))
        .select("pct", F.col("v").alias("exact"))
    )
    return (
        est.join(exact, "pct")
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("est").cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            F.abs(F.col("est") - F.col("exact")).cast("long").alias("abs_err"),
        )
        .orderBy("pct")
    )


def quantile_summary_sql(
    k: int = 32, n_shards: int = 8, pcts: tuple = (10, 25, 50, 75, 90)
) -> str:
    """DuckDB twin of quantile_summary over the `documents` view."""
    pct_rows = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
    WITH vals AS (
        SELECT doc_id AS i, doc_id % {n_shards} AS shard,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS v
        FROM documents
    ),
    ranked AS (
        SELECT shard, v, i,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v, i) AS rn,
               COUNT(*) OVER (PARTITION BY shard) AS n_s
        FROM vals
    ),
    kept0 AS (
        SELECT shard, v, rn, n_s FROM ranked
        WHERE (rn - 1) % ((n_s + {k - 1}) // {k}) = 0 OR rn = n_s
    ),
    kept AS (
        SELECT shard, v, rn,
               COALESCE(LEAD(rn) OVER (PARTITION BY shard ORDER BY rn), n_s + 1)
                   - rn AS w
        FROM kept0
    ),
    merged AS (
        SELECT v, shard, rn,
               SUM(w) OVER (ORDER BY v, shard, rn ROWS UNBOUNDED PRECEDING) AS cumw
        FROM kept
    ),
    n AS (SELECT COUNT(*) AS n_total FROM vals),
    pctt AS (
        SELECT pct, (pct * (SELECT n_total FROM n) + 99) // 100 AS target
        FROM (VALUES {pct_rows}) p(pct)
    ),
    est AS (
        SELECT pct, arg_min(v, cumw) AS est
        FROM merged CROSS JOIN pctt WHERE cumw >= target GROUP BY pct
    ),
    exact_ranked AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v, i) AS rg FROM vals
    ),
    ex AS (
        SELECT pct, v AS exact FROM exact_ranked JOIN pctt ON rg = target
    )
    SELECT CAST(est.pct AS BIGINT) AS pct, CAST(est AS BIGINT) AS est,
           CAST(exact AS BIGINT) AS exact,
           CAST(ABS(est - exact) AS BIGINT) AS abs_err
    FROM est JOIN ex USING (pct)
    ORDER BY pct
    """


# Count-Min sketch constants: d = 4 hash rows x w = 1024 counters. For a
# token stream of N occurrences the overcount per probe is <= 2N/w with
# probability 1 - (1/2)^d (Cormode & Muthukrishnan 2005); both constants
# appear in the DuckDB oracle via cms_pos_sql below.
_CMS_D = 4
_CMS_W = 1024


def _cms_pos(tok_col, j_col):
    """Counter column for token/row pair: first 32 bits of
    md5('cm' || j || ':' || tok) mod w — engine-identical like the HLL
    register family above."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cm"), j_col, F.lit(":"), tok_col)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )


def cms_pos_sql(tok_expr: str, j_expr: str) -> str:
    """DuckDB twin of _cms_pos, kept adjacent so the layout cannot
    drift."""
    return (
        f"(('0x' || substring(md5('cm' || {j_expr} || ':' || {tok_expr}),"
        f" 1, 8))::BIGINT % {_CMS_W})"
    )


def _j_array():
    return F.array(*[F.lit(str(j)) for j in range(_CMS_D)])


def cms_heavy_hitters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    per_shard: int = 16,
    top_k: int = 20,
) -> DataFrame:
    """Corpus heavy hitters from a Count-Min sketch, with the exact-count
    calibration twin: top_k tokens ranked by their CMS estimate, each
    beside its true count and overcount.

    Pipeline (all deterministic, all replayable in ANSI SQL):
      1. counters: token stream -> (j, pos, +1) -> ONE hash-agg to at
         most d*w = 4096 rows, whatever the corpus size. Map-side
         partial aggregation means the shuffle carries <= 4096 rows per
         map partition — this bounded table IS the sketch, and it merges
         across ingest shards by plain addition.
      2. candidates: per ingest shard (doc_id mod n_shards), the exact
         local top-`per_shard` tokens (count desc, token asc — packed
         deterministic tie-break). Bounded at n_shards*per_shard rows; a
         global heavy hitter is necessarily a local one in some shard.
      3. estimate: candidates x d probes -> broadcast-join the counter
         table -> min over the d rows (the CMS upper-bound estimate).
      4. report: top_k by (estimate desc, token), beside the exact count
         (test-scale calibration; at 100 TB you drop the exact join and
         keep sketch + shard-local candidates only).

    No reference analogue (beyond-parity, SURVEY.md §2.12); sibling of
    the HLL family above — HLL answers "how many distinct", CMS answers
    "how often is THIS one" under the same bounded-state contract.
    """
    from ..session import fan_out
    from ..scratch import scratch_persist

    toks = fan_out(docs).select(
        (F.col(id_col) % n_shards).alias("shard"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    # vocabulary-sized exact counts per shard drive BOTH the candidate
    # top-k and (summed) the calibration twin — one scan, one agg
    shard_counts = scratch_persist(
        toks.groupBy("shard", "tok").agg(F.count("*").alias("c"))
    )

    counters = (
        toks.select(
            F.explode(_j_array()).alias("j"),
            F.col("tok"),
        )
        .select("j", _cms_pos(F.col("tok"), F.col("j")).alias("pos"))
        .groupBy("j", "pos")
        .agg(F.count("*").alias("cnt"))
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("tok"))
    candidates = (
        shard_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_shard)
        .select("tok")
        .distinct()
    )

    probes = candidates.select(
        "tok", F.explode(_j_array()).alias("j")
    ).select("tok", "j", _cms_pos(F.col("tok"), F.col("j")).alias("pos"))
    est = (
        probes.join(F.broadcast(counters), ["j", "pos"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
    )

    exact = shard_counts.groupBy("tok").agg(F.sum("c").alias("exact_count"))
    ranked = (
        est.join(exact, "tok")
        .orderBy(F.desc("est_count"), F.asc("tok"))
        .limit(top_k)
    )
    return ranked.select(
        F.col("tok").alias("token"),
        F.col("est_count").cast("bigint").alias("est_count"),
        F.col("exact_count").cast("bigint").alias("exact_count"),
        (F.col("est_count") - F.col("exact_count"))
        .cast("bigint")
        .alias("overcount"),
    )
