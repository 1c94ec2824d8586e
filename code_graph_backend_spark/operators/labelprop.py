"""Synchronous label propagation (community detection) — fourth graph
kernel beside pagerank/sssp/triangles, same verification philosophy:
FIXED iteration count + DETERMINISTIC tie-breaking make an iterative
algorithm exactly expressible as unrolled SQL, so the oracle hash-checks
it rather than eyeballing modularity.

Semantics per round (synchronous, undirected):
    label_{t+1}(v) = the label most frequent among v's neighbors at t,
                     ties broken by SMALLEST label id; isolated or
                     tie-free-at-zero vertices keep their label.
Initial labels are the node ids. Fixed `iters` rounds ⇒ deterministic.

Scale shape: each round is one equi-join (labels ⋈ undirected edges,
shuffled on the neighbor key) + one hash-agg on (vertex, label) + one
max_by reduction per vertex — two shuffles per round, no driver state;
localCheckpoint cuts the per-round lineage exactly like pagerank's loop.
At 100 TB this is the standard Pregel-on-DataFrames community pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measured-size duality gates for kcore_bounded / wcc_bounded — module
# constants (landmarks/stress/mst convention) so tests can force the
# distributed branches with cap 0; the at-scale path must never be
# first-executed in production
_LOCAL_N_CAP = 2_000_000
_LOCAL_E_CAP = 5_000_000


def _propagation_setup(nodes: DataFrame, edges: DataFrame, value_col: str):
    """Shared preamble of the synchronous propagation loops (LPA votes,
    WCC min-labels): persisted symmetric edge set, the per-node map
    initialized to the node id, plus the two measured gates — broadcast
    the map while it fits (~32 MB at 2M nodes; measured sf0.1: 2.7x
    faster than shuffling the 2|E| edge side each round) and checkpoint
    it at a width sized from its OWN row count, not the session shuffle
    width (a 512-wide rehearsal showed near-empty checkpoint partitions
    dominating runtime). One home so a gate tweak applies to every loop.

    Returns (sym, state, bcast, parts)."""
    from ..scratch import scratch_persist

    from .components import _parts_for

    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # sym feeds one join EVERY round — persist once or the caller's edge
    # derivation (graph build + distinct) re-runs per iteration
    sym = scratch_persist(
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    state = nodes.select(
        F.col("id").alias("node"), F.col("id").alias(value_col)
    ).localCheckpoint(eager=True)
    n_nodes = state.count()
    return sym, state, n_nodes <= 2_000_000, _parts_for(n_nodes)


def label_propagation(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 2,
) -> DataFrame:
    """Returns (node long, label long) after `iters` synchronous rounds."""
    sym, labels, bcast_labels, parts = _propagation_setup(nodes, edges, "label")
    for _ in range(iters):
        lab = F.broadcast(labels) if bcast_labels else labels
        votes = (
            sym.join(lab, sym["b"] == F.col("node"))
            .groupBy(F.col("a").alias("v"), "label")
            .agg(F.count("*").alias("n"))
        )
        # most frequent neighbor label; ties -> smallest label. max_by on
        # the packed integer key (count*C - label, C > any label id) does
        # both in ONE aggregate — a window row_number would shuffle the
        # votes a second time — and the packed key is plain BIGINT math
        # every SQL engine orders identically (composite arg_max keys are
        # not portable).
        best = votes.groupBy(F.col("v").alias("node")).agg(
            F.max_by(
                "label", F.col("n") * F.lit(100000000) - F.col("label")
            ).alias("_new")
        )
        labels = (
            labels.join(best, "node", "left_outer")
            .select("node", F.coalesce("_new", "label").alias("label"))
            # node-sized map: measured width, not the session shuffle width
            .repartition(parts, "node")
            .localCheckpoint(eager=True)
        )
    return labels


def kcore_bounded(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """Bounded-round k-core peeling: iteratively drop vertices of
    undirected degree < k; after `rounds` passes return the surviving
    (node, degree) pairs. Fixed rounds keep it deterministic and exactly
    unrollable in SQL (the full k-core is this run to fixpoint; peeling
    converges geometrically, so a handful of rounds is the practical
    answer and the residual is explicit in the round count).

    Per round: one degree hash-agg + two semi-joins pruning the edge
    list — same two-shuffle budget as a label-propagation round."""
    from .undirected import dir_cached

    und = dir_cached(spark, edges).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    if und.count() <= _LOCAL_E_CAP:
        # measured-size duality: identical peel recurrence, vectorized
        return _kcore_local(spark, edges, k, rounds)
    live = und.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            live.select(F.col("a").alias("v"))
            .unionAll(live.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        live = (
            live.join(keep.select(F.col("v").alias("a")), "a", "semi")
            .join(keep.select(F.col("v").alias("b")), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    deg = (
        live.select(F.col("a").alias("node"))
        .unionAll(live.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return deg.filter(F.col("degree") >= k)


def _kcore_local(
    spark: SparkSession, edges: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Vectorized driver-local twin of the peel rounds: degrees are one
    bincount over the live directed-distinct pairs, the prune is two
    mask gathers — bit-equal to the distributed path and the oracle."""
    import numpy as np
    import pandas as pd

    from .undirected import dir_arrays

    arr = dir_arrays(spark, edges)
    ids, ai, bi = arr["ids"], arr["si"], arr["di"]
    if not len(ai):
        return spark.createDataFrame([], "node long, degree long")
    n = len(ids)
    live = np.ones(len(ai), dtype=bool)
    for _ in range(rounds):
        deg = np.bincount(
            np.concatenate([ai[live], bi[live]]), minlength=n
        )
        keep = deg >= k
        live &= keep[ai] & keep[bi]
    deg = np.bincount(np.concatenate([ai[live], bi[live]]), minlength=n)
    sel = deg >= k
    res = pd.DataFrame(
        {"node": ids[sel], "degree": deg[sel].astype(np.int64)}, dtype="int64"
    )
    if not len(res):
        return spark.createDataFrame([], "node long, degree long")
    return spark.createDataFrame(res)


def wcc_bounded(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """Bounded weakly-connected-components over the property graph:
    (node, comp) where comp = the minimum node id reachable within
    `rounds` undirected hops — the fixed-round variant of min-label
    propagation, completing the analytics suite beside pagerank / sssp /
    hits / k-core / LPA with the same contract: fixed rounds + integer
    labels ⇒ an exactly unrolled SQL oracle. (The open-ended fixpoint
    variant lives in operators/components.py as alternating large/small
    star; this bounded form is the one a 100 TB job runs when diameter
    is known small or an approximation suffices.)

    Per round: one edge join + one min-agg; broadcast/width gates shared
    with label_propagation via _propagation_setup."""
    from .undirected import und_cached

    # min-propagation depends only on neighbor SETS, so the canonical
    # shared und table (least/greatest distinct, session-memoized) is
    # interchangeable with the directed-distinct multiset the oracle
    # spells out — unlike LPA's vote COUNTS, which must not switch
    und = und_cached(spark, edges).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    n_nodes = nodes.count()
    if n_nodes <= _LOCAL_N_CAP and und.count() <= _LOCAL_E_CAP:
        # measured-size duality (the pagerank/mst/mis discipline): the
        # identical bounded min-label recurrence, vectorized driver-local
        # — one Arrow collect replaces 4×(edge join + min-agg + checkpoint)
        return _wcc_local(spark, nodes, edges, rounds)
    sym, comp, bcast, parts = _propagation_setup(nodes, edges, "comp")
    for _ in range(rounds):
        c = F.broadcast(comp) if bcast else comp
        nbr = (
            sym.join(c, sym["b"] == F.col("node"))
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("m"))
        )
        comp = (
            comp.join(nbr, "node", "left_outer")
            .select("node", F.least(F.col("comp"), F.coalesce("m", F.col("comp"))).alias("comp"))
            .repartition(parts, "node")
            .localCheckpoint(eager=True)
        )
    return comp


def _wcc_local(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame, rounds: int
) -> DataFrame:
    """Vectorized driver-local twin of the bounded min-label rounds:
    bit-equal to the distributed path and the unrolled SQL oracle (min
    is idempotent, so the directed-distinct symmetric multiset matches
    exactly)."""
    import numpy as np
    import pandas as pd

    from .undirected import ids_array, und_arrays

    arr = und_arrays(spark, edges)
    a, b = arr["a"], arr["b"]
    ids = ids_array(spark, nodes)
    # an edge endpoint outside the node set never contributes in the
    # distributed rounds (it has no comp row to join) — drop it here too
    m = np.isin(a, ids) & np.isin(b, ids)
    ai = np.searchsorted(ids, a[m])
    bi = np.searchsorted(ids, b[m])
    vsym = np.concatenate([ai, bi])
    usym = np.concatenate([bi, ai])
    # sort the static adjacency ONCE; each round is then a single
    # segmented-min pass (minimum.reduceat) over the sorted neighbors
    order = np.argsort(vsym, kind="stable")
    vs = vsym[order]
    us = usym[order]
    if len(vs):
        seg = np.flatnonzero(np.r_[True, vs[1:] != vs[:-1]])
        vseg = vs[seg]
    comp = ids.copy()
    for _ in range(rounds):
        if not len(vs):
            break
        mins = np.minimum.reduceat(comp[us], seg)
        comp = comp.copy()
        comp[vseg] = np.minimum(comp[vseg], mins)
    res = pd.DataFrame({"node": ids, "comp": comp}, dtype="int64")
    return spark.createDataFrame(res)


def wcc_bounded_sql(sql_nodes: str, sql_edges: str, rounds: int = 4) -> str:
    """Unrolled-rounds DuckDB twin of wcc_bounded."""
    parts = [
        f"WITH nodes AS ({sql_nodes}), edges AS ({sql_edges}),",
        """und AS (
            SELECT DISTINCT src AS a, dst AS b FROM edges WHERE src <> dst
        ),
        sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        c0 AS (SELECT id AS node, id AS comp FROM nodes)""",
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
        n{t} AS (
            SELECT s.a AS node, MIN(c.comp) AS m
            FROM sym s JOIN c{t-1} c ON s.b = c.node GROUP BY s.a
        ),
        c{t} AS (
            SELECT c.node, LEAST(c.comp, COALESCE(n.m, c.comp)) AS comp
            FROM c{t-1} c LEFT JOIN n{t} n USING (node)
        )""")
    parts.append(f"SELECT node, comp FROM c{rounds}")
    return "\n".join(parts)


def modularity_by_label(
    labels: DataFrame, edges: DataFrame
) -> DataFrame:
    """Newman modularity of a labeling, per community, in EXACT integer
    arithmetic: Q = Σ_c [ m_c/m − (d_c/2m)² ] over the simple undirected
    graph. Floats would make the score engine-dependent, so each
    community row carries the integer NUMERATOR of its contribution on
    the common denominator 4m²:  q_num = 4·m_c·m − d_c²  (so
    Q = Σ q_num / (4m²)). Every term is BIGINT-safe up to ~1.5e9 edges
    (4m² ≤ 9e18); past that the same expression moves to DECIMAL(38)
    like the sigma gate.

    Inputs: labels (node, label) — any community assignment (here the
    verified 2-round LPA); edges (src, dst, …) — canonicalized inside to
    DISTINCT (least, greatest) with self-loops dropped.

    Scale shape: one distinct on the canonical edge pair, one count for
    the scalar m (a driver-side 1-value action, same as the block
    counter in cosine_near_dup_pairs), a degree hash-agg, and two
    label-map joins (node-count-sized — broadcast under the session
    threshold) + per-label aggs. No all-pairs anywhere; community count
    bounds the output."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    from ..scratch import scratch_persist

    e = scratch_persist(e)
    m = e.count()
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    m_in = (
        e.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").alias("m_in"))
    )
    ds = (
        labels.join(deg, labels["node"] == deg["v"], "left")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("deg_sum"),
        )
    )
    return (
        ds.join(m_in, "label", "left")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_nodes",
            F.coalesce(F.col("m_in"), F.lit(0)).cast("long").alias("m_in"),
            "deg_sum",
            (
                F.lit(4) * F.coalesce(F.col("m_in"), F.lit(0)) * F.lit(int(m))
                - F.col("deg_sum") * F.col("deg_sum")
            ).cast("long").alias("q_num"),
        )
        .orderBy("label")
    )
