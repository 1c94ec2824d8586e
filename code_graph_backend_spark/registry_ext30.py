"""Round-5x extension query:

- graph_anf_sketch: the Approximate Neighborhood Function (Palmer,
  Gibbons & Faloutsos, KDD'02) — per hop h, the summed estimated ball
  sizes Σ_v |B_h(v)| over the graph twin, computed by propagating
  MERGEABLE md5-deterministic HLL register tables along edges (the
  corpus sketch machinery pointed at a graph: register-wise max IS the
  set union, so one hop = one join + one max-agg — the at-scale
  replacement for all-pairs BFS when you need the N(h) curve of a
  100 TB web graph).

Determinism design (stricter than the corpus HLL family, which rounds
its per-GROUP estimates to 4 decimals): per-NODE estimates feed a
global sum, so even one ulp of float drift flips a floor somewhere in
200k nodes — measured: Spark and DuckDB disagree on the last ulp of
`alpha*m²*2^49 / s_int` for EVERY node. So no runtime float touches
the output at all: the harmonic denominator is the exact integer
s_int = Σ 2^(49−m) + (256−cnt)·2^49, the raw estimate is the integer
floor division K // s_int with K = floor(α·m²·2^49·10^6) precomputed
ONCE in the generator, and the linear-counting branch reads a 255-row
lookup table of pre-floored 256·ln(256/v) micro values emitted as the
same literals into both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .functions.sketches import _M, _rho_sql, hll_register_table
from .registry import register

_ANF_HOPS = 2
_SCALE = 1 << 49
# K = floor(alpha_256 * 256^2 * 2^49 * 1e6): the whole raw-estimator
# constant folded into one integer, rounded exactly once, here.
_K = int((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * _SCALE * 1_000_000)
# linear-counting micro values for every possible zero-register count
_LC_MICRO = {
    v: int(math.floor(256.0 * math.log(256.0 / v) * 1_000_000))
    for v in range(1, _M)
}
_RAW_GATE = 640 * 1_000_000  # 2.5 * m, in micro units


def _anf_sql() -> str:
    from .graph.tpch import SQL_EDGES, SQL_NODES

    rho = _rho_sql("substring(md5(CAST(id AS VARCHAR)), 3, 12)")
    lc_rows = ", ".join(f"({v}, {mic})" for v, mic in _LC_MICRO.items())
    parts = [
        f"WITH nodes AS ({SQL_NODES}), edges AS ({SQL_EDGES}),",
        f"""lc(zv, mic) AS (VALUES {lc_rows}),
        und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM edges WHERE src <> dst
        ),
        sym AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
        h0 AS (
            SELECT id AS grp,
                   CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 2))
                        AS BIGINT) AS bucket,
                   {rho} AS rho
            FROM nodes
        ),
        r0 AS MATERIALIZED (
            SELECT grp, bucket, MAX(rho) AS m FROM h0 GROUP BY 1, 2
        )""",
    ]
    sums = []
    for h in range(_ANF_HOPS + 1):
        if h > 0:
            parts.append(f""",
        n{h} AS (
            SELECT s.a AS grp, r.bucket, r.m
            FROM sym s JOIN r{h-1} r ON r.grp = s.b
        ),
        r{h} AS MATERIALIZED (
            SELECT grp, bucket, MAX(m) AS m FROM (
                SELECT * FROM r{h-1} UNION ALL SELECT * FROM n{h}
            ) GROUP BY 1, 2
        )""")
        parts.append(f""",
        agg{h} AS (
            SELECT grp,
                   SUM((1::BIGINT << (49 - m)))
                       + ({_M} - COUNT(*)) * {_SCALE}::BIGINT AS s_int,
                   {_M} - COUNT(*) AS zv
            FROM r{h} GROUP BY grp
        ),
        fin{h} AS (
            SELECT a.grp,
                   CASE WHEN a.zv > 0
                             AND ({_K}::HUGEINT // a.s_int) <= {_RAW_GATE}
                        THEN lc.mic
                        ELSE CAST({_K}::HUGEINT // a.s_int AS BIGINT) END
                       AS est_micro
            FROM agg{h} a LEFT JOIN lc ON lc.zv = a.zv
        )""")
        sums.append(f"""
        SELECT {h} AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(est_micro) AS BIGINT) AS sum_ball_micro
        FROM fin{h}""")
    parts.append(
        "\nSELECT CAST(hop AS BIGINT) AS hop, n_nodes, sum_ball_micro FROM ("
        + " UNION ALL ".join(sums)
        + ") ORDER BY hop"
    )
    return "\n".join(parts)


@register("graph_anf_sketch", _anf_sql())
def graph_anf_sketch_q(spark, sf_dir):
    """ANF over the graph twin: N(h) = Σ_v est|B_h(v)| for h = 0..2,
    via register-table propagation (one edge join + one register
    max-agg per hop; the register table is ≤ nodes × min(ball, 256)
    rows — the point of sketching balls instead of enumerating them).
    The estimate is a pure INTEGER function of the registers (module
    docstring), so this approximate-by-design sketch hash-matches the
    oracle exactly."""
    from .graph.tpch import build_graph
    from .operators.undirected import und_cached
    from .scratch import scratch_persist

    g = build_graph(spark, sf_dir)
    und = und_cached(spark, g.edges)
    sym = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    nodes_items = g.nodes.select(F.col("id").alias("grp"), F.col("id").alias("it"))
    regs = scratch_persist(hll_register_table(nodes_items, "grp", "it"))
    lc = F.broadcast(
        spark.createDataFrame(list(_LC_MICRO.items()), "zv long, mic long")
    )

    def _hop_sum(r, h):
        agged = r.groupBy("grp").agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - m)"))
                + (F.lit(_M) - F.count("*")) * F.lit(_SCALE)
            ).alias("s_int"),
            (F.lit(_M) - F.count("*")).cast("long").alias("zv"),
        )
        fin = agged.join(lc, "zv", "left").select(
            F.when(
                (F.col("zv") > 0)
                & (
                    F.expr(f"CAST({_K} AS DECIMAL(38,0)) div s_int")
                    <= F.lit(_RAW_GATE)
                ),
                F.col("mic"),
            )
            .otherwise(F.expr(f"CAST({_K} AS DECIMAL(38,0)) div s_int"))
            .cast("long")
            .alias("est_micro")
        )
        return (
            fin.agg(
                F.count("*").cast("long").alias("n_nodes"),
                F.sum("est_micro").cast("long").alias("sum_ball_micro"),
            )
            .select(
                F.lit(h).cast("long").alias("hop"), "n_nodes", "sum_ball_micro"
            )
        )

    outs = [_hop_sum(regs, 0)]
    r = regs
    for h in range(1, _ANF_HOPS + 1):
        nbr = sym.join(r.withColumnRenamed("grp", "b"), "b").select(
            F.col("a").alias("grp"), "bucket", "m"
        )
        r = scratch_persist(
            r.unionByName(nbr).groupBy("grp", "bucket").agg(F.max("m").alias("m"))
        )
        outs.append(_hop_sum(r, h))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("hop")
