"""Skew-aware aggregation: salted two-phase groupBy.

A groupBy on a low-cardinality or hot-keyed column sends every row of a hot
key to one reducer — the classic straggler at 100 TB (five event types ⇒
five reducers do all the work no matter how many executors exist). Salting
splits each hot key into `salt` sub-keys for the first (parallel) partial
aggregation, then a second tiny aggregation over `keys × salt` rows merges
the partials. Works for any algebraic aggregate (sum/count/min/max, and
avg via sum+count).

AQE's skew-join splitting handles skewed *joins*; skewed *aggregations*
still need this explicit pattern (or enough map-side partial aggregation,
which Spark already does per-partition — salting matters when even one
reducer per key is too little for the FINAL merge of huge partial states,
e.g. count-distinct style aggregates with big intermediate sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: `aggs` maps output column → (input column,
    fn) with fn ∈ {sum, count, min, max}.

    Phase 1 groups by (keys, random-salt) — `salt`× the reducers per hot
    key; phase 2 re-aggregates the partials (counts re-merge with sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def col_fn(fn: str, c: str) -> Column:
        return getattr(F, fn)(c)

    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[col_fn(fn, c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            col_fn(merge_fn[fn], out).alias(out)
            for out, (c, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the FACT side's hot keys are split across
    `salt` sub-keys (deterministic md5 salt from a per-row id-free hash
    of the whole fact row would not be stable; a hash of a monotonically
    assigned salt via pmod(xxhash64(all fact cols), salt) is — but any
    fact-side spray works because the DIM side is REPLICATED to every
    sub-key), then the join runs on (key, salt). A hot key's rows land
    on `salt` reducers instead of one; the dim side grows by exactly
    `salt`×, which is the explicit, bounded price.

    This is the manual form of what AQE skew-join splitting does at
    runtime; the explicit operator exists for engines/pipelines where
    the skew is KNOWN up front (a `null`/default key, a celebrity
    entity) and for pre-AQE plan stability. Join semantics are identical
    to fact.join(dim, key) — verified by the oracle, which runs the
    plain join."""
    fact_cols = [c for c in fact.columns]
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt)).cast("int"),
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")
