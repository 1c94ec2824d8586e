"""Triangle counting over the property graph — the third graph-analytics
kernel beside PageRank (operators/pagerank.py) and bounded SSSP
(operators/sssp.py), and like them absent from the reference's fixed
query surface (FalkorDB exposes algo.triangleCount server-side; our
engine expresses it in plain DataFrame algebra).

Scalable shape — DEGREE-ORIENTED wedge join (the MapReduce-standard
design, cf. Suri & Vassilvitskii "Counting Triangles and the Curse of
the Last Reducer", WWW'11):

1. undirect + dedupe the edge list;
2. orient every edge from the endpoint with SMALLER (degree, id) to the
   larger — each triangle now has exactly one source vertex with two
   out-edges (counted once, no ×6 overcount), and crucially a hub of
   degree d contributes wedges bounded by the count of its LOWER-degree
   neighbors, not d² — the skew cap that makes the self-join feasible on
   power-law graphs;
3. wedge self-join on the source, close each wedge with a semi-join
   against the oriented edge list.

Three shuffles total (degree agg, wedge join, closing join); every join
is an equi-join — no cartesian anywhere. The oracle unrolls the same
orientation in SQL, so the count is hash-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scratch import scratch_persist


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs (a < b) from the typed edge list,
    self-loops dropped."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") < F.col("b"))
    return e.distinct()


# measured-size duality gate (landmarks/stress/mst convention): at or
# below this undirected-edge count the wedge enumeration runs
# driver-local on the shared edge-array cache; tests force the
# distributed branch with cap 0
_LOCAL_E_CAP = 5_000_000

# wedge-expansion chunk for the local path (same rationale as
# registry_ext30's _ANF_CHUNK): degree orientation bounds TOTAL wedges
# by sum C(outdeg,2) = O(m^1.5), which on a skewed 5M-edge graph can
# reach ~1e10 — far past driver memory if materialized at once. The
# expansion therefore streams over oriented-edge blocks whose wedge
# count stays <= this, so peak extra memory is ~7 int64 arrays of
# chunk length regardless of skew.
_WEDGE_CHUNK = 16_000_000


def _triangles_local(spark, edges: DataFrame) -> DataFrame:
    """Driver-local twin of the degree-oriented wedge join: identical
    orientation (smaller (degree, id) → larger), wedge pairs enumerated
    per oriented out-block, closed by binary search against the sorted
    undirected key set. Degree orientation caps the expansion exactly
    as in the distributed plan — at sf0.1 the 1.36M-edge twin yields
    10.5M wedges with max out-degree 52."""
    import numpy as np
    import pandas as pd

    from .undirected import und_arrays

    schema = "node long, n_triangles long"
    arr = und_arrays(spark, edges)
    ai, bi, ids = arr["ai"], arr["bi"], arr["ids"]
    n = len(ids)
    if not len(ai):
        return spark.createDataFrame([], schema)
    deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
    # ids is sorted ascending, so position order IS id order — the
    # (degree, id) tie-break is exact on positions
    a_first = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
    s = np.where(a_first, ai, bi)
    t = np.where(a_first, bi, ai)
    order = np.argsort(s, kind="stable")
    s, t = s[order], t[order]
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(s, minlength=n), out=starts[1:])
    # wedge pairs: edge j pairs with every LATER edge of its block
    cnt = starts[s + 1] - np.arange(len(s), dtype=np.int64) - 1
    if not int(cnt.sum()):
        return spark.createDataFrame([], schema)
    # close the wedge: {t1, t2} must be an undirected pair (ai < bi by
    # construction, so the sorted key set is exactly the a<b pairs)
    und_keys = np.sort(ai.astype(np.int64) * n + bi)
    # streamed expansion: edge blocks sized so per-chunk wedge count
    # stays <= _WEDGE_CHUNK (one block of a single oriented source is
    # itself bounded by C(max_outdeg, 2) <= C(~sqrt(2m), 2) <= the cap's
    # own edge bound, so max(end, start+1) never over-allocates badly)
    edge_csum = np.concatenate([[0], np.cumsum(cnt)])
    cnts = np.zeros(n, dtype=np.int64)
    start_e = 0
    while start_e < len(s):
        end_e = int(np.searchsorted(
            edge_csum, edge_csum[start_e] + _WEDGE_CHUNK, side="right"
        )) - 1
        end_e = max(end_e, start_e + 1)
        c = cnt[start_e:end_e]
        tot = int(c.sum())
        start_prev, start_e = start_e, end_e
        if not tot:
            continue
        fi = np.repeat(np.arange(start_prev, end_e, dtype=np.int64), c)
        local_csum = np.cumsum(c)
        si = fi + 1 + np.arange(tot, dtype=np.int64) \
            - np.repeat(local_csum - c, c)
        u1, u2 = t[fi], t[si]
        lo = np.minimum(u1, u2).astype(np.int64)
        hi = np.maximum(u1, u2).astype(np.int64)
        keys = lo * n + hi
        pos = np.searchsorted(und_keys, keys)
        hit = (pos < len(und_keys)) & (
            und_keys[pos.clip(max=len(und_keys) - 1)] == keys
        )
        cnts += np.bincount(s[fi][hit], minlength=n)
        cnts += np.bincount(lo[hit], minlength=n)
        cnts += np.bincount(hi[hit], minlength=n)
    sel = cnts > 0
    if not sel.any():
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        pd.DataFrame({"node": ids[sel], "n_triangles": cnts[sel]}), schema
    )


def triangle_count_per_node(
    edges: DataFrame, local_caps: int | None = None
) -> DataFrame:
    """(node, n_triangles) for every node in at least one triangle."""
    cap = _LOCAL_E_CAP if local_caps is None else local_caps
    from .undirected import und_cached

    spark = edges.sparkSession
    if und_cached(spark, edges).count() <= cap:
        return _triangles_local(spark, edges)
    # und feeds the degree agg (twice) and the orientation join; the
    # session-memoized und_cached table (already materialized by the
    # gate count above) backs it, so every kernel sharing this edges
    # object shares ONE distinct — oriented below still needs its own
    # persist (both wedge sides + the closing list)
    from .undirected import und_ab

    und = und_ab(spark, edges)
    # degree per endpoint
    deg = (
        und.select(F.col("a").alias("v")).unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    # orient: lower (degree, id) -> higher (degree, id)
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            ).otherwise(
                F.struct(F.col("b").alias("s"), F.col("a").alias("t"))
            ).alias("e")
        )
        .select("e.s", "e.t")
    )
    oriented = scratch_persist(oriented)
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").filter(F.col("t1") < F.col("t2"))
    closing = oriented.select(
        F.col("s").alias("c1"), F.col("t").alias("c2")
    ).unionAll(
        oriented.select(F.col("t").alias("c1"), F.col("s").alias("c2"))
    ).distinct()
    tris = wedges.join(
        closing,
        (F.col("t1") == F.col("c1")) & (F.col("t2") == F.col("c2")),
        "semi",
    ).select("s", "t1", "t2")
    # per-node attribution: each triangle counts once for each corner
    corners = (
        tris.select(F.col("s").alias("node"))
        .unionAll(tris.select(F.col("t1").alias("node")))
        .unionAll(tris.select(F.col("t2").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def triangle_count_total(edges: DataFrame) -> DataFrame:
    """Single-row (n_triangles) global count."""
    per = triangle_count_per_node(edges)
    return per.agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3).cast("long").alias("n_triangles")
    )


def _jaccard_local(spark, edges: DataFrame, min_common: int) -> DataFrame:
    """Driver-local twin of the jaccard wedge join: symmetric adjacency
    blocks sorted by center, pair expansion streamed in _WEDGE_CHUNK
    blocks (identical CSR-repeat trick as _triangles_local), pair counts
    via per-chunk np.unique merged in one final aggregate. Rounding
    replicates Spark's F.round on double EXACTLY: BigDecimal.valueOf
    (i.e. the shortest decimal repr) quantized HALF_UP to 6 places —
    Decimal(repr(x)) is the Python twin of that path, so local and
    distributed emit bit-identical doubles."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from .undirected import und_arrays

    schema = "i long, j long, jac double"
    arr = und_arrays(spark, edges)
    ai, bi, ids = arr["ai"], arr["bi"], arr["ids"]
    n = len(ids)
    if not len(ai):
        return spark.createDataFrame([], schema)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    deg = np.bincount(src, minlength=n)
    order = np.argsort(src, kind="stable")
    s, t = src[order], dst[order]
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(s, minlength=n), out=starts[1:])
    cnt = starts[s + 1] - np.arange(len(s), dtype=np.int64) - 1
    if not int(cnt.sum()):
        return spark.createDataFrame([], schema)
    edge_csum = np.concatenate([[0], np.cumsum(cnt)])
    uniq_parts, cnt_parts = [], []
    start_e = 0
    while start_e < len(s):
        end_e = int(np.searchsorted(
            edge_csum, edge_csum[start_e] + _WEDGE_CHUNK, side="right"
        )) - 1
        end_e = max(end_e, start_e + 1)
        c = cnt[start_e:end_e]
        tot = int(c.sum())
        start_prev, start_e = start_e, end_e
        if not tot:
            continue
        fi = np.repeat(np.arange(start_prev, end_e, dtype=np.int64), c)
        local_csum = np.cumsum(c)
        si = fi + 1 + np.arange(tot, dtype=np.int64) \
            - np.repeat(local_csum - c, c)
        u1, u2 = t[fi], t[si]
        keys = np.minimum(u1, u2).astype(np.int64) * n + np.maximum(u1, u2)
        uq, ct = np.unique(keys, return_counts=True)
        uniq_parts.append(uq)
        cnt_parts.append(ct)
    all_keys = np.concatenate(uniq_parts)
    all_cnts = np.concatenate(cnt_parts)
    uq, inv = np.unique(all_keys, return_inverse=True)
    totals = np.zeros(len(uq), dtype=np.int64)
    np.add.at(totals, inv, all_cnts)
    sel = totals >= min_common
    if not sel.any():
        return spark.createDataFrame([], schema)
    uq, totals = uq[sel], totals[sel]
    li, lj = uq // n, uq % n
    di, dj = deg[li], deg[lj]
    jac = [
        float(Decimal(repr(c / (a + b - c))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        ))
        for c, a, b in zip(totals.tolist(), di.tolist(), dj.tolist())
    ]
    return spark.createDataFrame(
        pd.DataFrame({"i": ids[li], "j": ids[lj], "jac": jac}), schema
    )


def jaccard_neighbors(
    edges: DataFrame, min_common: int = 1, local_caps: int | None = None
) -> DataFrame:
    """Link-prediction primitive: neighborhood Jaccard similarity for every
    node pair sharing ≥ `min_common` neighbors — |N(a)∩N(b)| / |N(a)∪N(b)|
    over the undirected graph.

    Scale shape: the SAME inverted-index trick as n-gram Jaccard dedup
    (functions/dedup.py) transplanted to graphs — common-neighbor pairs
    come from a self-join keyed on the SHARED NEIGHBOR (wedge join), never
    from the O(n²) pair space; degrees join in for the union size. Hub
    neighbors fan out quadratically (same "curse of the last reducer" as
    triangles); production would cap/sample hub wedge lists — at our SF
    the cap is unnecessary and omitted so the oracle stays exact.
    Measured-size duality (triangles/ktruss convention): at or below
    `local_caps` undirected edges (default _LOCAL_E_CAP; tests force the
    distributed branch with 0) the wedge enumeration runs driver-local
    on the shared edge-array cache with chunked expansion."""
    from .undirected import und_cached

    spark = edges.sparkSession
    cap = _LOCAL_E_CAP if local_caps is None else local_caps
    if und_cached(spark, edges).count() <= cap:
        return _jaccard_local(spark, edges, min_common)
    from .undirected import und_ab

    und = und_ab(spark, edges)
    # adj feeds the degree agg and BOTH wedge sides — persist or the
    # caller's edge derivation re-runs once per consumer
    adj = scratch_persist(und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ))  # (a=node, b=neighbor), both directions
    deg = adj.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("d"))
    w1 = adj.select(F.col("b").alias("n"), F.col("a").alias("i"))
    w2 = adj.select(F.col("b").alias("n"), F.col("a").alias("j"))
    common = (
        w1.join(w2, "n")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_common)
    )
    di = deg.select(F.col("v").alias("i"), F.col("d").alias("di"))
    dj = deg.select(F.col("v").alias("j"), F.col("d").alias("dj"))
    return (
        common.join(di, "i").join(dj, "j")
        .select(
            "i", "j",
            F.round(
                F.col("c") / (F.col("di") + F.col("dj") - F.col("c")), 6
            ).alias("jac"),
        )
    )


def ffl_motif_stats(edges: DataFrame) -> DataFrame:
    """Feed-forward-loop census over a DIRECTED edge set — the directed
    sibling of triangle counting (the FFL a→b, b→c, a→c is THE
    overrepresented motif in regulatory / dependency / call graphs,
    Milo et al. 2002): one row (n_wedges, n_ffl, ffl_per_wedge_milli).

    Plan: distinct self-loop-free edges; directed wedges via ONE
    equi-join on the middle vertex (wedge count per b is
    in(b)·out(b) — on skewed graphs that hub blow-up is handled the
    same way the salted-join family does, by splitting hot b's; the
    call/succession graphs here have bounded degrees); wedges closed
    against the edge list with one more equi-join ((a,c) is unique in
    the distinct edge set, so inner == semi and both engines count
    identically). No cartesian anywhere; integer-milli ratio."""
    e = scratch_persist(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    a = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    b = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    w = scratch_persist(
        a.join(b, "y").filter(F.col("x") != F.col("z"))
    )
    nw = w.agg(F.count("*").alias("n_wedges"))
    nf = w.join(
        e.select(F.col("src").alias("x"), F.col("dst").alias("z")),
        ["x", "z"],
    ).agg(F.count("*").alias("n_ffl"))
    return (
        nw.crossJoin(nf)  # two 1-row sides
        .select(
            F.col("n_wedges").cast("long"),
            F.col("n_ffl").cast("long"),
            F.expr(
                "CAST(CASE WHEN n_wedges = 0 THEN 0 "
                "ELSE (n_ffl * 1000) DIV n_wedges END AS BIGINT)"
            ).alias("ffl_per_wedge_milli"),
        )
    )
