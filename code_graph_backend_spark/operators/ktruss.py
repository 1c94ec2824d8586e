"""Bounded k-truss peeling — the fourth graph-analytics kernel beside
triangles (operators/triangles.py), k-core (operators/kcore.py) and the
label/component family. A k-truss is the maximal subgraph where every
edge participates in >= k-2 triangles; it is the standard
community-core extractor one rung stronger than k-core (Cohen 2008,
"Trusses: cohesive subgraphs for social network analysis").

Scalable shape — support-then-peel, bounded rounds:

1. enumerate triangles with the SAME degree-oriented wedge join as
   triangle counting (skew-capped per Suri & Vassilvitskii WWW'11);
2. attribute each triangle to its THREE edges (sorted-endpoint
   normalization, one explode) and hash-agg per-edge support;
3. drop edges with support < k-2; repeat on the survivor subgraph.

Like wcc_bounded/label_propagation the round count is FIXED (not
run-to-convergence): each round is one wedge join + one hash-agg, the
edge list shrinks monotonically, and a fixed unroll is exactly
expressible as a chained-CTE oracle — full convergence would be the
same loop run until a round removes nothing. No reference analogue
(FalkorDB exposes no truss decomposition; SURVEY.md §2's analytics
surface stops at algo.pageRank/wcc), so this extends the analytics
tier the way triangles/k-core already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scratch import scratch_persist


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support) for every undirected edge (a < b) of `und` that
    closes at least one triangle. Degree-oriented wedge join (the
    triangle-count plan), then each triangle is normalized to sorted
    endpoints and exploded into its three edges — one extra map-only
    stage plus the support hash-agg on top of the counting plan."""
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    oriented = scratch_persist(oriented)
    w1 = oriented.select("s", F.col("t").alias("t1"))
    w2 = oriented.select("s", F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").filter(F.col("t1") < F.col("t2"))
    closing = (
        oriented.select(F.col("s").alias("c1"), F.col("t").alias("c2"))
        .unionAll(oriented.select(F.col("t").alias("c1"), F.col("s").alias("c2")))
        .distinct()
    )
    tris = wedges.join(
        closing,
        (F.col("t1") == F.col("c1")) & (F.col("t2") == F.col("c2")),
        "semi",
    )
    srt = F.array_sort(F.array("s", "t1", "t2"))
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(srt[0].alias("a"), srt[1].alias("b")),
                F.struct(srt[0].alias("a"), srt[2].alias("b")),
                F.struct(srt[1].alias("a"), srt[2].alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return tri_edges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("support")
    )


def _local_rounds(spark, surv, need: int, rounds_left: int):
    """Driver-local twin of the remaining peel rounds: after round 1 the
    survivor set is support-filtered TRIANGLE edges — a tiny fraction of
    the graph (edges outside any triangle are already gone) — so the
    remaining rounds run as set arithmetic on the driver instead of ~10
    more scheduled stages per round. Exact same semantics as
    `_edge_support` + filter (pinned local==distributed in pytest)."""
    cur = {(int(a), int(b)) for a, b in surv}
    sup: dict = {}
    for _ in range(rounds_left):
        adj: dict = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {}
        for a, b in cur:
            c = len(adj[a] & adj[b])
            if c:
                sup[(a, b)] = c
        cur = {e for e, c in sup.items() if c >= need}
    rows = sorted((a, b, c) for (a, b), c in sup.items() if c >= need)
    return spark.createDataFrame(rows, "a long, b long, support long").orderBy(
        "a", "b"
    )


# Survivor sets below this run the remaining rounds driver-local; above it
# the distributed loop continues. Same measured-size duality as
# operators/pagerank.py — the gate is on the OBSERVED round-1 survivor
# count, not the input size.
LOCAL_MAX_EDGES = 200_000


def ktruss_edges(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 2,
    local_max: int = LOCAL_MAX_EDGES,
    local_caps: int | None = None,
) -> DataFrame:
    """Edges surviving `rounds` peels at truss level `k`, with their
    final-round support: each round recomputes triangle support on the
    current survivor subgraph and drops edges below k-2 (peeling an edge
    erases the triangles it closed, which can push its neighbors below
    the threshold next round — support must be re-derived, never reused).

    Measured-size duality, the same convention as triangles/landmarks/
    mst: at or below `local_caps` undirected edges (default
    LOCAL_MAX_EDGES; tests force the distributed branch with 0) ALL
    rounds run driver-local on the shared edge-array cache. Above it,
    round 1 runs the distributed wedge-join plan and the remaining
    rounds go local only once the measured survivor count fits
    `local_max`. Deterministic output ordering (a, b) so the row
    stream is bit-stable."""
    need = k - 2
    spark = edges.sparkSession
    cap = LOCAL_MAX_EDGES if local_caps is None else local_caps
    from .undirected import und_arrays, und_cached

    if und_cached(spark, edges).count() <= cap:
        arr = und_arrays(spark, edges)
        return _local_rounds(spark, zip(arr["a"], arr["b"]), need, rounds)
    from .undirected import und_ab

    # the session-memoized und table (materialized by the gate count)
    # is round 1's survivor set — later rounds re-persist their own
    # shrinking survivor tables below
    cur = und_ab(spark, edges)
    sup = scratch_persist(_edge_support(cur).filter(F.col("support") >= need))
    if rounds > 1:
        n = sup.count()
        if n <= local_max:
            return _local_rounds(
                spark, sup.select("a", "b").collect(), need, rounds - 1
            )
        for _ in range(rounds - 1):
            # localCheckpoint, not persist: _edge_support references its
            # input ~15x (deg twice, oriented four times, each embedding
            # the input subtree), so chaining rounds on a merely-persisted
            # DataFrame grows the LOGICAL plan ~15^rounds — the driver
            # then spends minutes (and gigabytes) serializing SparkPlanInfo
            # for every job event until it OOMs. Truncating lineage per
            # round keeps the plan one round deep, same discipline as
            # pagerank/scc/labelprop (guide: materialize intermediates to
            # cut enormous plans).
            cur = sup.select("a", "b").localCheckpoint(eager=True)
            sup = _edge_support(cur).filter(F.col("support") >= need)
    return (
        sup.select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("support").cast("long").alias("support"),
        ).orderBy("a", "b")
    )
