"""Bounded Luby maximal-independent-set over the graph twin.

Luby's algorithm (Luby 1986, "A Simple Parallel Algorithm for the
Maximal Independent Set Problem") is THE distributed symmetry-breaking
primitive: each round every active node draws a priority, joins the MIS
if its priority beats every active neighbor's, and winners plus their
neighborhoods leave the graph — expected O(log n) rounds, and each
round is exactly one neighbor-min aggregation over the live edge list.
It maps 1:1 onto DataFrame ops: symmetrize the live edges, one hash-agg
min per node, one left join + filter to pick winners, two semi/anti
joins to contract. The live edge set shrinks geometrically, so at
100 TB the total cost is a small constant times one pass over the
original edge list.

Determinism contract (what makes this hash-checkable against DuckDB):
- the per-round priority is a pure integer function of (node, round):
  key_t(v) = ((v*1103515245 + t*12345) % 2147483647) * 10^8 + v —
  an LCG step widened by the node id so the total order is strict
  (no ties, hence no tie-break ambiguity across engines); all
  arithmetic stays under 2^63 for ids < 10^8;
- a FIXED number of rounds (`rounds`) is run; nodes still live after
  the last round are simply not reported — the same bounded-semantics
  contract as wcc_bounded / sssp_bounded / boruvka_msf. Within the
  reported rounds the result IS a valid independent set, and it is
  maximal over the removed subgraph.

Reference parity: the reference exposes no MIS (FalkorDB algo.* has
BFS/pagerank/wcc); this extends the analytics kernel family exactly the
way hits/kcore/mst did, with the same unrolled-CTE oracle discipline
(operators/labelprop.py:173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import scratch_persist
from .components import _parts_for
from .undirected import und_cached

_LCG_A, _LCG_B, _LCG_M = 1103515245, 12345, 2147483647
_KEY_W = 100_000_000
# measured-size duality (the pagerank/mst discipline): below these the
# whole bounded recurrence runs driver-local on collected adjacency —
# identical semantics, one collect instead of ~8 jobs per round
_LOCAL_N_CAP = 2_000_000
_LOCAL_E_CAP = 5_000_000


def _key(col, t: int):
    return ((col * _LCG_A + F.lit(t) * _LCG_B) % _LCG_M) * _KEY_W + col


def luby_mis(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    local_caps: tuple[int, int] = (_LOCAL_N_CAP, _LOCAL_E_CAP),
) -> DataFrame:
    """(round, node) for every node selected into the MIS within
    `rounds` Luby rounds, ordered by node (each node appears once).

    Per-round cost: one symmetrize + hash-agg min over the LIVE edge
    list (the only edge-sized stage), one node-sized left join for the
    winner test, and two anti/semi joins for the contraction — every
    stage repartitioned at a width measured from its own (shrinking)
    input, the boruvka_msf discipline."""
    und = und_cached(spark, edges).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    active_n = nodes.select(F.col("id").alias("v"))
    n_live = active_n.count()
    n_edges = und.count()
    if n_live <= local_caps[0] and n_edges <= local_caps[1]:
        return _luby_local(spark, nodes, edges, rounds)
    active_e = und
    picked = []
    for t in range(1, rounds + 1):
        w = _parts_for(n_live)
        sym = active_e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
            active_e.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        nbr = (
            sym.repartition(w, "v")
            .groupBy("v")
            .agg(F.min(_key(F.col("u"), t)).alias("nk"))
        )
        sel = scratch_persist(
            active_n.join(nbr, "v", "left")
            .filter(F.col("nk").isNull() | (_key(F.col("v"), t) < F.col("nk")))
            .select("v")
        )
        picked.append(sel.select(F.lit(t).cast("long").alias("round"), "v"))
        if t == rounds:
            break
        removed = sel.unionAll(
            sym.join(sel, "v").select(F.col("u").alias("v"))
        ).distinct()
        active_n = (
            active_n.join(removed, "v", "left_anti")
            .repartition(w, "v")
            .localCheckpoint(eager=True)
        )
        n_live = active_n.count()
        if n_live == 0:
            break
        an_a = active_n.select(F.col("v").alias("a"))
        an_b = active_n.select(F.col("v").alias("b"))
        active_e = (
            active_e.join(an_a, "a", "left_semi")
            .join(an_b, "b", "left_semi")
            .repartition(_parts_for(n_live), "a")
            .localCheckpoint(eager=True)
        )
    out = picked[0]
    for m in picked[1:]:
        out = out.unionByName(m)
    return out.select(
        "round", F.col("v").cast("long").alias("node")
    ).orderBy("node")


def _luby_local(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame, rounds: int
) -> DataFrame:
    """Vectorized driver-local twin of the distributed rounds (the
    measured-size duality): the shared array cache (und_arrays) holds
    the collected edge list, then each round is numpy mask/groupby
    arithmetic on the IDENTICAL bounded recurrence — bit-equal output,
    zero shuffles."""
    import numpy as np
    import pandas as pd

    from .undirected import ids_array, und_arrays

    arr = und_arrays(spark, edges)
    nid = ids_array(spark, nodes)
    if np.isin(nid, arr["ids"]).all():
        ids, ai, bi = arr["ids"], arr["ai"], arr["bi"]
    else:  # isolated nodes extend the id domain — remap
        ids = np.union1d(arr["ids"], nid)
        ai = np.searchsorted(ids, arr["a"])
        bi = np.searchsorted(ids, arr["b"])
    n = len(ids)
    # mirror the distributed rounds exactly: endpoints outside `nodes`
    # compete in round 1 (their keys reach nbrmin — active_e starts as
    # the FULL und list) but are never selectable, and their edges drop
    # at the first contraction (active_e is semi-joined on the node set)
    member = np.isin(ids, nid)
    active = member.copy()
    e_live = np.ones(len(ai), dtype=bool)
    out_rounds = np.zeros(n, dtype=np.int64)  # 0 = never selected
    for t in range(1, rounds + 1):
        keys = ((ids * _LCG_A + t * _LCG_B) % _LCG_M) * _KEY_W + ids
        # neighbor-min over the live symmetric edges (pandas hash agg)
        vsym = np.concatenate([ai[e_live], bi[e_live]])
        usym = np.concatenate([bi[e_live], ai[e_live]])
        nbrmin = np.full(n, np.iinfo(np.int64).max)
        if len(vsym):
            gm = pd.Series(keys[usym]).groupby(vsym).min()
            nbrmin[gm.index.to_numpy()] = gm.to_numpy()
        sel = active & (keys < nbrmin)
        out_rounds[sel] = t
        if t == rounds:
            break
        # winners and their neighborhoods leave the graph
        removed = sel.copy()
        if len(vsym):
            hit = sel[usym]
            removed[vsym[hit]] = True
        active &= ~removed
        if not active.any():
            break
        e_live &= active[ai] & active[bi]
    chosen = out_rounds > 0
    res = pd.DataFrame(
        {"round": out_rounds[chosen], "node": ids[chosen]}, dtype="int64"
    ).sort_values("node")
    if not len(res):
        return spark.createDataFrame([], "round long, node long")
    return spark.createDataFrame(res)


def luby_mis_sql(sql_nodes: str, sql_edges: str, rounds: int = 3) -> str:
    """Unrolled-rounds DuckDB twin of luby_mis (AS MATERIALIZED on every
    multiply-referenced CTE — the boruvka_msf_sql lesson)."""
    # CAST keeps the LCG in BIGINT even when the node source yields
    # INT32 literals (fixture SQL); parquet ids are already BIGINT
    key = (
        lambda c, t: f"((CAST({c} AS BIGINT) * {_LCG_A} + {t} * {_LCG_B})"
        f" % {_LCG_M}) * {_KEY_W} + {c}"
    )
    parts = [
        f"WITH nodes AS ({sql_nodes}), edges AS ({sql_edges}),",
        """e0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges WHERE src <> dst
        ),
        n0 AS MATERIALIZED (SELECT id AS v FROM nodes)""",
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
        sym{t} AS MATERIALIZED (
            SELECT a AS v, b AS u FROM e{t-1}
            UNION ALL SELECT b AS v, a AS u FROM e{t-1}
        ),
        nbr{t} AS MATERIALIZED (
            SELECT v, MIN({key('u', t)}) AS nk FROM sym{t} GROUP BY v
        ),
        sel{t} AS MATERIALIZED (
            SELECT n.v FROM n{t-1} n LEFT JOIN nbr{t} nb ON nb.v = n.v
            WHERE nb.nk IS NULL OR {key('n.v', t)} < nb.nk
        )""")
        if t < rounds:
            parts.append(f""",
        rem{t} AS MATERIALIZED (
            SELECT v FROM sel{t}
            UNION SELECT s.u AS v FROM sym{t} s JOIN sel{t} x ON x.v = s.v
        ),
        n{t} AS MATERIALIZED (
            SELECT v FROM n{t-1} WHERE v NOT IN (SELECT v FROM rem{t})
        ),
        e{t} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{t-1} e
            JOIN n{t} x ON x.v = e.a JOIN n{t} y ON y.v = e.b
        )""")
    union = "\nUNION ALL ".join(
        f"SELECT {t} AS round, v FROM sel{t}" for t in range(1, rounds + 1)
    )
    parts.append(f"""
        SELECT CAST(round AS BIGINT) AS round, CAST(v AS BIGINT) AS node
        FROM ({union})
        ORDER BY node""")
    return "\n".join(parts)
