"""Round-5t extension queries:

- dq_k_anonymity: the privacy-audit classic — equivalence classes over
  a quasi-identifier tuple (lang, source, length band); for each k in
  {2, 5, 10}, how many classes and rows fall below k (Sweeney 2002,
  the governance gate run before any data release);
- graph_eccentricity_bounds: per-node eccentricity LOWER bounds from
  the landmark BFS (ecc(v) ≥ max_l d(l,v) — Magnien et al. 2009), plus
  the implied diameter lower bound, composed from the verified
  landmark kernel;
- graph_core_decomposition: bounded core numbers — the largest k in
  {1..4} whose k-core (bounded peeling) still contains the node;
  completes the k-core family from the single-k membership test to the
  per-node decomposition.

Same discipline: integer decisions, a DuckDB oracle per entry, BIGINT
casts, deterministic final ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .session import read_table

_KA_BAND = 50
_KA_KS = (2, 5, 10)


@register(
    "dq_k_anonymity",
    f"""
    WITH q AS (
        SELECT lang, source, n_chars // {_KA_BAND} AS band,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM documents GROUP BY 1, 2, 3
    ),
    ks AS (SELECT UNNEST(ARRAY{list(_KA_KS)}) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN q.class_size < ks.k THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
           CAST(SUM(CASE WHEN q.class_size < ks.k THEN q.class_size ELSE 0 END)
               AS BIGINT) AS rows_at_risk,
           CAST(SUM(q.class_size) AS BIGINT) AS total_rows
    FROM q CROSS JOIN ks GROUP BY ks.k ORDER BY k
    """,
)
def dq_k_anonymity_q(spark, sf_dir):
    """k-anonymity audit over the (lang, source, length-band)
    quasi-identifier: per k, the classes smaller than k and the rows
    they expose — the release gate a governance pipeline runs before
    any share-out. ONE corpus hash-agg to class sizes (map-side
    combined), then all decisions on the class-count dimension against
    a broadcast k list."""
    docs = read_table(spark, sf_dir, "documents")
    q = docs.groupBy(
        "lang", "source", F.expr(f"n_chars div {_KA_BAND}").alias("band")
    ).agg(F.count("*").cast("long").alias("class_size"))
    from .scratch import scratch_persist

    q = scratch_persist(q)
    ks = spark.createDataFrame([(k,) for k in _KA_KS], "k long")
    return (
        q.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0))
            .cast("long").alias("classes_below_k"),
            F.sum(
                F.when(F.col("class_size") < F.col("k"), F.col("class_size"))
                .otherwise(0)
            ).cast("long").alias("rows_at_risk"),
            F.sum("class_size").cast("long").alias("total_rows"),
        )
        .orderBy("k")
    )


def _ecc_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES
    from .operators.landmarks import landmark_distances_sql

    inner = landmark_distances_sql(SQL_NODES, SQL_EDGES, n_landmarks=8, hops=3)
    return f"""
    WITH lm AS ({inner})
    SELECT CAST(node AS BIGINT) AS node,
           CAST(MAX(dist) AS BIGINT) AS ecc_lb,
           CAST(COUNT(*) AS BIGINT) AS n_landmarks_reached
    FROM lm GROUP BY node ORDER BY node
    """


@register("graph_eccentricity_bounds", _ecc_sql())
def graph_eccentricity_bounds_q(spark, sf_dir):
    """Per-node eccentricity lower bounds from the verified landmark
    BFS: ecc(v) ≥ max over landmarks of d(l, v) (Magnien et al. 2009
    — landmarks double as diameter witnesses: the global max of
    ecc_lb lower-bounds the diameter). Pure composition: the landmark
    kernel (driver-local below caps) plus one node-sized max-agg."""
    from .graph.tpch import build_graph
    from .operators.landmarks import landmark_distances

    g = build_graph(spark, sf_dir)
    lm = landmark_distances(g.nodes, g.edges, n_landmarks=8, hops=3)
    return (
        lm.groupBy("node")
        .agg(
            F.max("dist").cast("long").alias("ecc_lb"),
            F.count("*").cast("long").alias("n_landmarks_reached"),
        )
        .select(F.col("node").cast("long").alias("node"), "ecc_lb",
                "n_landmarks_reached")
        .orderBy("node")
    )


_CORE_KS = (1, 2, 3, 4)
_CORE_ROUNDS = 3
# measured-size gate for the fused local decomposition; module constant
# so tests can force the distributed 4-peel composition with cap 0
_CORE_LOCAL_E_CAP = 5_000_000


def _core_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES

    parts = [
        f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),",
        """base AS MATERIALIZED (
            SELECT DISTINCT src AS a, dst AS b FROM edges WHERE src <> dst
        )""",
    ]
    per_k_survivor = []
    for k in _CORE_KS:
        parts.append(f", e{k}_0 AS MATERIALIZED (SELECT a, b FROM base)")
        for r in range(1, _CORE_ROUNDS + 1):
            parts.append(f""",
        d{k}_{r} AS MATERIALIZED (
            SELECT v FROM (
                SELECT a AS v FROM e{k}_{r-1}
                UNION ALL SELECT b FROM e{k}_{r-1}
            ) GROUP BY v HAVING COUNT(*) >= {k}
        ),
        e{k}_{r} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{k}_{r-1} e
            JOIN d{k}_{r} x ON x.v = e.a JOIN d{k}_{r} y ON y.v = e.b
        )""")
        per_k_survivor.append(f"""
        s{k} AS (
            SELECT v, {k} AS k FROM (
                SELECT a AS v FROM e{k}_{_CORE_ROUNDS}
                UNION ALL SELECT b FROM e{k}_{_CORE_ROUNDS}
            ) GROUP BY v HAVING COUNT(*) >= {k}
        )""")
    parts.append("," + ",".join(per_k_survivor))
    union = " UNION ALL ".join(f"SELECT v, k FROM s{k}" for k in _CORE_KS)
    parts.append(f"""
    SELECT CAST(v AS BIGINT) AS node, CAST(MAX(k) AS BIGINT) AS core_number
    FROM ({union}) GROUP BY v ORDER BY node
    """)
    return "\n".join(parts)


@register("graph_core_decomposition", _core_sql())
def graph_core_decomposition_q(spark, sf_dir):
    """Bounded core numbers over the graph twin: for each k in
    {1..4}, run the verified bounded k-core peel; core_number(v) =
    the largest k whose surviving core still contains v. The four
    peels all ride the shared dir_arrays cache (each is a handful of
    bincounts driver-local below caps), so the decomposition costs
    barely more than one membership test — the same completion step
    core-periphery analyses run after a single-k probe."""
    from .graph.tpch import build_graph
    from .operators.undirected import dir_arrays, dir_cached

    g = build_graph(spark, sf_dir)
    if dir_cached(spark, g.edges).count() <= _CORE_LOCAL_E_CAP:
        # fused local decomposition: all four peels on the shared
        # arrays in one pass, one output DataFrame (running the
        # single-k kernel four times re-paid the per-call Spark
        # overhead — measured 4.4s -> ~1s)
        import numpy as np
        import pandas as pd

        arr = dir_arrays(spark, g.edges)
        ids, ai, bi = arr["ids"], arr["si"], arr["di"]
        n = len(ids)
        core = np.zeros(n, dtype=np.int64)
        for k in _CORE_KS:
            live = np.ones(len(ai), dtype=bool)
            for _ in range(_CORE_ROUNDS):
                deg = np.bincount(
                    np.concatenate([ai[live], bi[live]]), minlength=n
                )
                keep = deg >= k
                live &= keep[ai] & keep[bi]
            deg = np.bincount(np.concatenate([ai[live], bi[live]]), minlength=n)
            core[deg >= k] = k
        sel = core > 0
        res = pd.DataFrame(
            {"node": ids[sel], "core_number": core[sel]}, dtype="int64"
        ).sort_values("node")
        return spark.createDataFrame(res)
    # distributed composition above the caps: one verified peel per k
    from .operators.labelprop import kcore_bounded

    out = None
    for k in _CORE_KS:
        s = kcore_bounded(spark, g.edges, k=k, rounds=_CORE_ROUNDS).select(
            "node", F.lit(k).cast("long").alias("k")
        )
        out = s if out is None else out.unionByName(s)
    return (
        out.groupBy("node")
        .agg(F.max("k").cast("long").alias("core_number"))
        .select(F.col("node").cast("long").alias("node"), "core_number")
        .orderBy("node")
    )
