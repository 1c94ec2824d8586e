"""Landmark stress centrality — shortest-path COUNTING through each
vertex, the integer-exact member of the betweenness family (stress
centrality, Shimbel 1953; betweenness replaces the count with a ratio).

Why this shape: exact betweenness needs Brandes' dependency accumulation,
whose δ values are sums of rationals — float summation order then differs
between engines, which is exactly the hash-parity channel this repo
refuses. Path COUNTS are integers: σ_s(v)·σ_t(v) is the number of
s→t geodesics through v whenever d_s(v) + d_t(v) = d(s,t), so a
landmark-pair-restricted stress score is bit-reproducible while keeping
the estimator structure of sampled betweenness (Brandes/Pich 2007 pivot
sampling — landmarks ARE the pivots).

Algorithm (all bounded, all deterministic):
- landmarks = the L highest-DEGREE nodes, ties by smallest id (the
  Potamias et al. 2009 landmark heuristic — high-degree pivots sit in
  the dense core, so landmark pairs actually connect within the hop
  bound; integer degree + id tie-break keeps the set engine-exact);
- one level-synchronous BFS over the SYMMETRIZED simple graph for ALL
  landmarks at once, keyed (landmark, node), `hops` rounds; each round
  is one frontier join + one σ-summing hash-agg + one anti-join against
  the settled set (frontier stays (L·new-nodes)-sized — multi-source
  batching costs the same shuffle count as one source);
- stress(v) = Σ over landmark pairs (s<t, reached within `hops`) of
  σ_s(v)·σ_t(v) · [d_s(v)+d_t(v) = d(s,t)], v ∉ {s,t}.

σ products are BIGINT-safe while per-landmark geodesic counts stay
< ~3e9 (far above anything a hop-bounded BFS on a real graph yields);
a pathological lattice would move the product to DECIMAL(38) like the
sigma gate. localCheckpoint per round cuts the iterative lineage
(pagerank.py rationale)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measured-size duality gate; overridable per call (local_caps=(0, 0)
# forces the distributed branch in tests — mst.py / mis.py convention)
_LOCAL_N_CAP = 2_000_000
_LOCAL_E_CAP = 5_000_000


def landmark_stress(
    nodes: DataFrame,
    edges: DataFrame,
    n_landmarks: int = 8,
    hops: int = 3,
    landmark_by: str = "degree",
    local_caps: tuple[int, int] | None = None,
) -> DataFrame:
    """(node, stress) over the undirected simple graph, stress summed
    over all landmark pairs whose distance is within `hops`; only nodes
    with stress > 0 are emitted, ordered by node. landmark_by="degree"
    (default, the Potamias heuristic) or "id" (smallest ids — the
    hand-computable convention the unit tests pin)."""
    from ..scratch import scratch_persist
    from .components import _parts_for
    from .undirected import und_cached

    spark = nodes.sparkSession
    if local_caps is None:
        local_caps = (_LOCAL_N_CAP, _LOCAL_E_CAP)
    und = und_cached(spark, edges).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    if nodes.count() <= local_caps[0] and und.count() <= local_caps[1]:
        # measured-size duality: identical σ-counting BFS, vectorized
        return _stress_local(nodes, edges, n_landmarks, hops, landmark_by)
    sym = scratch_persist(
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    if landmark_by == "degree":
        lms = (
            sym.groupBy(F.col("a").alias("l"))
            .agg(F.count("*").alias("_d"))
            .orderBy(F.col("_d").desc(), "l")
            .limit(n_landmarks)
            .select("l")
        )
    else:
        lms = nodes.select(F.col("id").alias("l")).orderBy("l").limit(n_landmarks)
    settled = lms.select(
        "l", F.col("l").alias("node"),
        F.lit(0).cast("long").alias("dist"), F.lit(1).cast("long").alias("sig"),
    ).localCheckpoint(eager=True)
    frontier = settled
    for t in range(1, hops + 1):
        cand = (
            sym.join(frontier.withColumnRenamed("node", "a"), "a")
            .groupBy("l", F.col("b").alias("node"))
            .agg(F.sum("sig").alias("sig"))
        )
        new = (
            cand.join(settled.select("l", "node"), ["l", "node"], "left_anti")
            .select("l", "node", F.lit(t).cast("long").alias("dist"), "sig")
        )
        new = new.repartition(_parts_for(settled.count()), "l", "node")
        new = new.localCheckpoint(eager=True)
        settled = settled.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    # landmark-pair distances (and their geodesic counts are not needed:
    # only d(s,t) gates the middle condition)
    lpair = (
        settled.join(lms.withColumnRenamed("l", "node"), "node")
        .select(F.col("l").alias("ls"), F.col("node").alias("lt"), F.col("dist").alias("dst"))
        .filter(F.col("ls") < F.col("lt"))
    )
    s_side = settled.select(
        F.col("l").alias("ls"), "node",
        F.col("dist").alias("d1"), F.col("sig").alias("sig1"),
    )
    t_side = settled.select(
        F.col("l").alias("lt"), "node",
        F.col("dist").alias("d2"), F.col("sig").alias("sig2"),
    )
    return (
        F.broadcast(lpair)
        .join(s_side, "ls")
        .join(t_side, ["lt", "node"])
        .filter(
            (F.col("d1") + F.col("d2") == F.col("dst"))
            & (F.col("node") != F.col("ls"))
            & (F.col("node") != F.col("lt"))
        )
        .groupBy("node")
        .agg(F.sum(F.col("sig1") * F.col("sig2")).cast("long").alias("stress"))
        .orderBy("node")
    )


def _stress_local(
    nodes: DataFrame,
    edges: DataFrame,
    n_landmarks: int,
    hops: int,
    landmark_by: str,
) -> DataFrame:
    """Vectorized driver-local twin of the batched σ-counting BFS:
    (L × domain) dist/σ matrices, one segmented-sum pass per hop over
    the dst-sorted symmetric edges — bit-equal to the distributed
    rounds and the unrolled oracle (σ and dist are integers; the pair
    gate d_s(v)+d_t(v)=d(s,t) is integer equality)."""
    import numpy as np
    import pandas as pd

    from .undirected import ids_array, und_arrays

    spark = nodes.sparkSession
    arr = und_arrays(spark, edges)
    if landmark_by == "degree":
        deg = np.bincount(
            np.concatenate([arr["ai"], arr["bi"]]), minlength=len(arr["ids"])
        )
        order = np.lexsort((arr["ids"], -deg))
        lm_ids = np.sort(arr["ids"][order[:n_landmarks]])
    else:
        lm_ids = ids_array(spark, nodes)[:n_landmarks]
    # id domain = endpoints ∪ landmarks (an 'id'-mode landmark can be
    # isolated; it still owns its settled (l, l, 0, 1) row)
    extra = lm_ids[~np.isin(lm_ids, arr["ids"])]
    if len(extra):
        ids = np.union1d(arr["ids"], lm_ids)
        ai = np.searchsorted(ids, arr["a"])
        bi = np.searchsorted(ids, arr["b"])
    else:
        ids, ai, bi = arr["ids"], arr["ai"], arr["bi"]
    n = len(ids)
    L = len(lm_ids)
    vsym = np.concatenate([bi, ai])  # destination of each directed copy
    usym = np.concatenate([ai, bi])
    order = np.argsort(vsym, kind="stable")
    vs, us = vsym[order], usym[order]
    if len(vs):
        seg = np.flatnonzero(np.r_[True, vs[1:] != vs[:-1]])
        tgt = vs[seg]
    inf = np.int64(1) << 40
    dist = np.full((L, n), inf, dtype=np.int64)
    sig = np.zeros((L, n), dtype=np.int64)
    lpos = np.searchsorted(ids, lm_ids)
    dist[np.arange(L), lpos] = 0
    sig[np.arange(L), lpos] = 1
    for t in range(1, hops + 1):
        if not len(vs):
            break
        frontier = dist == t - 1
        contrib = np.where(frontier, sig, 0)[:, us]
        cand = np.add.reduceat(contrib, seg, axis=1)
        sub_d = dist[:, tgt]
        sub_s = sig[:, tgt]
        m = (cand > 0) & (sub_d == inf)
        sub_d[m] = t
        sub_s[m] = cand[m]
        dist[:, tgt] = sub_d
        sig[:, tgt] = sub_s
    stress = np.zeros(n, dtype=np.int64)
    for si in range(L):
        for ti in range(si + 1, L):
            dst = dist[si, lpos[ti]]
            if dst >= inf:
                continue
            on_path = (
                (dist[si] + dist[ti] == dst)
                & (dist[si] < inf) & (dist[ti] < inf)
            )
            on_path[lpos[si]] = False
            on_path[lpos[ti]] = False
            stress[on_path] += sig[si, on_path] * sig[ti, on_path]
    selm = stress > 0
    res = pd.DataFrame(
        {"node": ids[selm], "stress": stress[selm]}, dtype="int64"
    ).sort_values("node")
    if not len(res):
        return spark.createDataFrame([], "node long, stress long")
    return spark.createDataFrame(res)


def landmark_stress_sql(
    sql_nodes: str,
    sql_edges: str,
    n_landmarks: int = 8,
    hops: int = 3,
    landmark_by: str = "degree",
) -> str:
    """Unrolled-rounds DuckDB twin: identical landmark set, identical
    level-synchronous σ accumulation (settled/new per round via
    NOT EXISTS), identical pair gate and integer products."""
    if landmark_by == "degree":
        lms_sql = (
            "SELECT a AS l FROM sym GROUP BY a "
            f"ORDER BY COUNT(*) DESC, a LIMIT {n_landmarks}"
        )
    else:
        lms_sql = f"SELECT id AS l FROM nodes ORDER BY id LIMIT {n_landmarks}"
    parts = [
        f"WITH nodes AS ({sql_nodes}), edges AS ({sql_edges}),",
        f"""und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst
        ),
        sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        lms AS ({lms_sql}),
        s0 AS (
            SELECT l, l AS node, CAST(0 AS BIGINT) AS dist,
                   CAST(1 AS BIGINT) AS sig
            FROM lms
        ),
        f0 AS (SELECT * FROM s0)""",
    ]
    for t in range(1, hops + 1):
        parts.append(f""",
        c{t} AS (
            SELECT f.l, sym.b AS node, SUM(f.sig) AS sig
            FROM sym JOIN f{t-1} f ON sym.a = f.node GROUP BY 1, 2
        ),
        f{t} AS (
            SELECT c.l, c.node, CAST({t} AS BIGINT) AS dist, c.sig
            FROM c{t} c
            WHERE NOT EXISTS (
                SELECT 1 FROM s{t-1} s WHERE s.l = c.l AND s.node = c.node
            )
        ),
        s{t} AS (SELECT * FROM s{t-1} UNION ALL SELECT * FROM f{t})""")
    parts.append(f""",
    lpair AS (
        SELECT s.l AS ls, s.node AS lt, s.dist AS dst
        FROM s{hops} s JOIN lms ON lms.l = s.node
        WHERE s.l < s.node
    )
    SELECT a.node, CAST(SUM(a.sig * b.sig) AS BIGINT) AS stress
    FROM lpair p
    JOIN s{hops} a ON a.l = p.ls
    JOIN s{hops} b ON b.l = p.lt AND b.node = a.node
    WHERE a.dist + b.dist = p.dst AND a.node <> p.ls AND a.node <> p.lt
    GROUP BY a.node
    ORDER BY a.node""")
    return "\n".join(parts)
