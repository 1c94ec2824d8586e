"""Bounded strongly-connected components over a DIRECTED edge set —
the mutual-recursion detector a code graph needs (cycles in CALLS /
IMPORTS edges) and the directed sibling of wcc_bounded, with the same
verification contract: FIXED rounds + integer labels make the whole
algorithm exactly unrollable as chained SQL CTEs, so the oracle
hash-checks every assignment instead of eyeballing.

Algorithm (the trim + coloring shape of at-scale SCC systems — Slota et
al.'s Multistep / Hong et al.'s FW-BW-Trim, both published):

1. TRIM (`trim_rounds` passes): drop every node with no live out-edge
   or no live in-edge. A trimmed node cannot sit on a cycle, so it is an
   EXACT singleton SCC — not an approximation.
2. AGREEMENT (`hops` synchronous rounds on the surviving core): two
   min-label propagations at once, f(v) = min id reachable FORWARD
   within `hops` hops, b(v) = min id reachable BACKWARD. Where
   f(v) = b(v) = m, v both reaches m and is reached by m, hence v is in
   SCC(m) — again exact, never a false merge. Nodes with f <> b after
   the round budget are honestly `unresolved` (at 100 TB you peel the
   confirmed SCCs and repeat; one peel suffices on graphs whose
   min-anchored SCC diameter fits the budget).

Scale shape: trim is two distinct-projections + two semi-joins per pass
(kcore_bounded's budget); each agreement round is two edge⋈state joins
+ two min-aggs + one state rebuild — state is node-sized, broadcast
while it fits and checkpointed at a width measured from its OWN row
count (the wcc lesson: inheriting the session shuffle width makes
near-empty checkpoint partitions dominate).

The reference has no SCC (FalkorDB's algo.* surface there is
pageRank/WCC only, /root/reference/api/graph.py); this is §2.12
beyond-parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import _parts_for

# Max edge count for the in-process path (which collects the edge list).
_LOCAL_EDGE_ROWS = 5_000_000


def _scc_local(
    spark: SparkSession,
    edges: DataFrame,
    trim_rounds: int,
    hops: int,
    peels: int,
) -> DataFrame:
    """In-process twin of the distributed loop: same trim / joint-min
    propagation / peel recurrence over numpy arrays (shared array
    cache — one Arrow collect per session/edges object)."""
    import numpy as np
    import pandas as pd

    from .undirected import dir_arrays

    arr = dir_arrays(spark, edges)
    if len(arr["s"]) == 0:
        return spark.createDataFrame([], "node long, scc_id long, status string")
    ids = arr["ids"]
    n = len(ids)
    s, d = arr["si"], arr["di"]

    live = np.ones(n, dtype=bool)
    scc_id = np.full(n, -1, dtype=np.int64)
    status = np.full(n, "unresolved", dtype=object)
    f = b = None
    for _ in range(peels):
        for _ in range(trim_rounds):
            em = live[s] & live[d]
            has_out = np.zeros(n, dtype=bool)
            has_in = np.zeros(n, dtype=bool)
            has_out[s[em]] = True
            has_in[d[em]] = True
            drop = live & ~(has_out & has_in)
            scc_id[drop] = ids[drop]
            status[drop] = "singleton"
            live &= ~drop
        em = live[s] & live[d]
        se, de = s[em], d[em]
        # sort each propagation direction ONCE; every hop is then a
        # single segmented-min pass (minimum.reduceat) instead of the
        # scatter-min ufunc.at (measured ~10x slower at 1M+ edges)
        of = np.argsort(se, kind="stable")
        se_s, de_f = se[of], de[of]
        if len(se_s):
            segf = np.flatnonzero(np.r_[True, se_s[1:] != se_s[:-1]])
            tgtf = se_s[segf]
        ob = np.argsort(de, kind="stable")
        de_s, se_b = de[ob], se[ob]
        if len(de_s):
            segb = np.flatnonzero(np.r_[True, de_s[1:] != de_s[:-1]])
            tgtb = de_s[segb]
        f = ids.copy()
        b = ids.copy()
        for _ in range(hops):
            nf = f.copy()
            if len(se_s):
                mins = np.minimum.reduceat(f[de_f], segf)
                nf[tgtf] = np.minimum(nf[tgtf], mins)
            nb = b.copy()
            if len(de_s):
                mins = np.minimum.reduceat(b[se_b], segb)
                nb[tgtb] = np.minimum(nb[tgtb], mins)
            f, b = nf, nb
        core = live & (f == b)
        scc_id[core] = f[core]
        status[core] = "core"
        live &= ~core
    return spark.createDataFrame(
        pd.DataFrame({"node": ids, "scc_id": scc_id, "status": status})
    )


def scc_bounded(
    spark: SparkSession,
    edges: DataFrame,
    trim_rounds: int = 2,
    hops: int = 10,
    peels: int = 1,
) -> DataFrame:
    """Returns (node long, scc_id long, status string) for every distinct
    endpoint of `edges` (src, dst):

    - status='singleton': trimmed — provably a one-node SCC, scc_id=node
    - status='core': f=b agreement — provably in SCC(scc_id)
    - status='unresolved': round budget exhausted, scc_id=-1

    Each peel runs `trim_rounds` trims then `hops` agreement rounds on
    whatever the previous peel could not resolve (Multistep's loop: an
    SCC downstream of smaller ids only agrees once the smaller-anchored
    SCCs are peeled away). peels=1 suffices when every SCC's min
    dominates its downstream — true of the registered test graph."""
    from .undirected import dir_cached

    # directed-distinct pairs from the session memo (shared with k-core)
    e = dir_cached(spark, edges)
    # Measured-size duality (the pagerank/sssp discipline): every node
    # here is an edge endpoint, so ONE count gates both collects. The
    # local path replays the identical trim/propagate/peel recurrence in
    # numpy — pure integer mins, so the two paths are bit-identical and
    # the distributed loop stays the 100 TB answer.
    n_edges = e.count()
    if n_edges <= _LOCAL_EDGE_ROWS:
        return _scc_local(spark, edges, trim_rounds, hops, peels)
    # Every node-sized map and the pruned edge list get checkpoint widths
    # measured from their OWN sizes — the width rehearsal showed session
    # shuffle width (512) turning each of the ~36 checkpoints into
    # near-empty-partition overhead (the wcc lesson, 10.8s -> 51s).
    parts_e = _parts_for(n_edges)
    parts_n = _parts_for(n_edges)  # nodes <= 2*edges; same scale
    small = n_edges <= 2_000_000  # broadcast / width-trim gate
    # repartition-on-key BEFORE distinct/groupBy: the explicit hash
    # partitioning satisfies the aggregate's required distribution, so
    # no second exchange at session width appears (localCheckpoint
    # materializes via the RDD path, where AQE never coalesces).
    live_n = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    if small:
        live_n = live_n.repartition(parts_n, "node")
    live_n = live_n.distinct().localCheckpoint(eager=True)
    live_e = e
    resolved: list[DataFrame] = []
    state = None
    for peel in range(peels):
        for _ in range(trim_rounds):
            # Small graphs (the only ones where session width >> data):
            # hash-partition both sides on node at the measured width —
            # the distincts reuse it and the join is zero-Exchange.
            # Large graphs keep the plain plan: distinct's map-side
            # partial combine at session width is worth more than the
            # width trim there.
            ho = live_e.select(F.col("src").alias("node"))
            hi = live_e.select(F.col("dst").alias("node"))
            if small:
                ho = ho.repartition(parts_n, "node")
                hi = hi.repartition(parts_n, "node")
            core = ho.distinct().join(hi.distinct(), "node").localCheckpoint(
                eager=True
            )
            resolved.append(
                live_n.join(core, "node", "left_anti").select(
                    "node", F.col("node").alias("scc_id"),
                    F.lit("singleton").alias("status"),
                )
            )
            live_n = core
            live_e = (
                live_e.join(core.select(F.col("node").alias("src")), "src", "semi")
                .join(core.select(F.col("node").alias("dst")), "dst", "semi")
                .select("src", "dst")
                .repartition(parts_e)
                .localCheckpoint(eager=True)
            )

        n_core = live_n.count()
        parts = _parts_for(n_core)
        state = live_n.select(
            "node", F.col("node").alias("f"), F.col("node").alias("b")
        ).localCheckpoint(eager=True)
        for _ in range(hops):
            st = F.broadcast(state) if n_core <= 2_000_000 else state
            # f flows AGAINST edge direction (v inherits the min its
            # successors reach), b flows WITH it — one edge scan each.
            fwd = live_e.join(st, live_e["dst"] == st["node"]).select(
                F.col("src").alias("node"), "f"
            )
            bwd = live_e.join(st, live_e["src"] == st["node"]).select(
                F.col("dst").alias("node"), "b"
            )
            if small:
                # pre-partition on the grouping key at the measured
                # width so the agg adds no session-width exchange
                # (checkpoint materialization is an RDD job — AQE never
                # coalesces it); at scale keep groupBy's map-side
                # partial combine instead.
                fwd = fwd.repartition(parts, "node")
                bwd = bwd.repartition(parts, "node")
            fwd = fwd.groupBy("node").agg(F.min("f").alias("fm"))
            bwd = bwd.groupBy("node").agg(F.min("b").alias("bm"))
            # fwd/bwd are node-sized agg outputs: broadcast them under
            # the same gate as the state so the two left joins keep the
            # state's measured partitioning instead of re-shuffling the
            # node map at session width every round
            if small:
                fwd, bwd = F.broadcast(fwd), F.broadcast(bwd)
            state = (
                state.join(fwd, "node", "left_outer")
                .join(bwd, "node", "left_outer")
                .select(
                    "node",
                    F.least(F.col("f"), F.coalesce("fm", F.col("f"))).alias("f"),
                    F.least(F.col("b"), F.coalesce("bm", F.col("b"))).alias("b"),
                )
                # node-sized map: width from its own measured size
                .repartition(parts, "node")
                .localCheckpoint(eager=True)
            )

        resolved.append(
            state.filter(F.col("f") == F.col("b")).select(
                "node", F.col("f").alias("scc_id"),
                F.lit("core").alias("status"),
            )
        )
        if peel < peels - 1:
            live_n = (
                state.filter(F.col("f") != F.col("b"))
                .select("node")
                .repartition(parts, "node")
                .localCheckpoint(eager=True)
            )
            live_e = (
                live_e.join(live_n.select(F.col("node").alias("src")), "src", "semi")
                .join(live_n.select(F.col("node").alias("dst")), "dst", "semi")
                .select("src", "dst")
                .repartition(parts_e)
                .localCheckpoint(eager=True)
            )

    out = resolved[0]
    for p in resolved[1:]:
        out = out.unionByName(p)
    return out.unionByName(
        state.filter(F.col("f") != F.col("b")).select(
            "node", F.lit(-1).cast("long").alias("scc_id"),
            F.lit("unresolved").alias("status"),
        )
    )


def scc_bounded_sql(sql_edges: str, trim_rounds: int = 2, hops: int = 10) -> str:
    """Unrolled-rounds DuckDB twin of scc_bounded. `sql_edges` must
    produce columns (src, dst).

    Every chained CTE is AS MATERIALIZED: each round references the
    previous one 2-3 times, so DuckDB's default inlining would expand
    the plan (and the parquet scan count) EXPONENTIALLY in the round
    count — at 12 rounds that exhausts the fd limit before it exhausts
    the optimizer. Materialization makes the oracle linear in rounds,
    which is also exactly how the Spark side executes (localCheckpoint
    per round)."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({sql_edges}) WHERE src <> dst),",
        """n0 AS (
            SELECT src AS node FROM e0 UNION SELECT dst FROM e0
        )""",
    ]
    for t in range(1, trim_rounds + 1):
        parts.append(f""",
        c{t} AS MATERIALIZED (
            SELECT src AS node FROM e{t-1}
            INTERSECT SELECT dst FROM e{t-1}
        ),
        d{t} AS (SELECT node FROM n{t-1} EXCEPT SELECT node FROM c{t}),
        n{t} AS MATERIALIZED (SELECT node FROM c{t}),
        e{t} AS MATERIALIZED (
            SELECT e.src, e.dst FROM e{t-1} e
            JOIN c{t} a ON e.src = a.node JOIN c{t} b ON e.dst = b.node
        )""")
    tr = trim_rounds
    parts.append(f""",
        s0 AS MATERIALIZED (SELECT node, node AS f, node AS b FROM n{tr})""")
    for t in range(1, hops + 1):
        parts.append(f""",
        fm{t} AS (
            SELECT e.src AS node, MIN(s.f) AS m
            FROM e{tr} e JOIN s{t-1} s ON e.dst = s.node GROUP BY 1
        ),
        bm{t} AS (
            SELECT e.dst AS node, MIN(s.b) AS m
            FROM e{tr} e JOIN s{t-1} s ON e.src = s.node GROUP BY 1
        ),
        s{t} AS MATERIALIZED (
            SELECT s.node,
                   LEAST(s.f, COALESCE(f.m, s.f)) AS f,
                   LEAST(s.b, COALESCE(b.m, s.b)) AS b
            FROM s{t-1} s
            LEFT JOIN fm{t} f USING (node) LEFT JOIN bm{t} b USING (node)
        )""")
    singles = "\nUNION ALL\n".join(
        f"SELECT node, node AS scc_id, 'singleton' AS status FROM d{t}"
        for t in range(1, trim_rounds + 1)
    )
    parts.append(f"""
        SELECT CAST(node AS BIGINT) AS node, CAST(f AS BIGINT) AS scc_id,
               'core' AS status FROM s{hops} WHERE f = b
        UNION ALL
        SELECT CAST(node AS BIGINT), CAST(-1 AS BIGINT), 'unresolved'
        FROM s{hops} WHERE f <> b
        UNION ALL
        SELECT CAST(node AS BIGINT), CAST(node AS BIGINT), status FROM (
            {singles}
        )""")
    return "\n".join(parts)
