"""Deterministic random walks — the DeepWalk / node2vec CORPUS
GENERATOR (Perozzi et al. 2014): fixed-length truncated walks from a
seed set, whose node sequences feed skip-gram embedding training. This
is where the graph side of the engine meets the training-data side: at
scale the walk corpus IS a training dataset, produced with the same
bounded-round, oracle-exact discipline as the other graph kernels.

"Random" is md5-derived: at each step the walker at `cur` moves to the
out-neighbor minimizing md5(walk_id:step:dst) — i.i.d.-uniform-like
choice per (walk, step) yet bit-reproducible in any engine, so the
DuckDB oracle unrolls the steps and hash-checks every emitted position
(the same determinism trick as the sampling/LSH families; a seeded PRNG
would be engine-local state).

Scale shape: one (frontier ⋈ out-edges) join + one per-walk arg-min agg
per step — shuffle count is per STEP, not per walk; the frontier is
walk-set-sized and broadcast while small. Dead ends retire their walk
(truncated output, standard DeepWalk behavior). Walk count is bounded
by the seed sample, never all-nodes-times-restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _parts_for

# frontier-broadcast gate: at or below this the per-step frontier is
# broadcast into the edge join. Module-level so tests can monkeypatch it
# to 0 and execute the at-scale (shuffle-join) branch — it must never be
# first-executed in production (mst.py / mis.py convention).
_BROADCAST_FRONTIER_CAP = 2_000_000


def random_walks(
    nodes: DataFrame,
    edges: DataFrame,
    walk_len: int = 8,
    seed_mod: int = 7,
) -> DataFrame:
    """(walk_id, step, node): one walk per seed (node ids where
    id % seed_mod == 0), `walk_len` md5-chosen hops along src->dst
    edges, truncated at dead ends. step 0 is the seed itself."""
    from ..scratch import scratch_persist

    e = scratch_persist(edges.select("src", "dst").distinct())
    seeds = nodes.select(F.col("id").alias("walk_id")).filter(
        F.col("id") % seed_mod == 0
    )
    frontier = seeds.select(
        "walk_id", F.col("walk_id").alias("node")
    ).localCheckpoint(eager=True)
    n_front = frontier.count()
    parts = _parts_for(n_front)
    out = frontier.select("walk_id", F.lit(0).cast("long").alias("step"), "node")
    for step in range(1, walk_len + 1):
        small = n_front <= _BROADCAST_FRONTIER_CAP
        f = F.broadcast(frontier) if small else frontier
        hop = e.join(f, e["src"] == f["node"]).select(
            "walk_id",
            "dst",
            F.md5(
                F.concat(
                    F.col("walk_id").cast("string"),
                    F.lit(f":{step}:"),
                    F.col("dst").cast("string"),
                )
            ).alias("h"),
        )
        if small:
            # pre-partition on the grouping key at the measured width:
            # the arg-min agg reuses it instead of adding a session-
            # width exchange (checkpointing goes through the RDD path,
            # where AQE never coalesces — the scc.py lesson)
            hop = hop.repartition(parts, "walk_id")
        hop = hop.groupBy("walk_id").agg(F.min_by("dst", "h").alias("node"))
        frontier = hop.localCheckpoint(eager=True)
        n_front = frontier.count()
        out = out.unionByName(
            frontier.select(
                "walk_id", F.lit(step).cast("long").alias("step"), "node"
            )
        )
        if n_front == 0:
            break
    return out.select(
        F.col("walk_id").cast("long"),
        F.col("step").cast("long"),
        F.col("node").cast("long"),
    )


def random_walks_sql(
    sql_nodes: str, sql_edges: str, walk_len: int = 8, seed_mod: int = 7
) -> str:
    """Unrolled-steps DuckDB twin of random_walks. `sql_nodes` yields
    (id), `sql_edges` yields (src, dst). MATERIALIZED per step — each
    frontier is referenced twice (next hop + output union)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({sql_edges})),",
        f"""f0 AS MATERIALIZED (
            SELECT id AS walk_id, id AS node FROM ({sql_nodes})
            WHERE id % {seed_mod} = 0
        )""",
    ]
    for s in range(1, walk_len + 1):
        parts.append(f""",
        f{s} AS MATERIALIZED (
            SELECT walk_id,
                   arg_min(dst, md5(walk_id || ':{s}:' || dst)) AS node
            FROM e JOIN f{s-1} ON e.src = f{s-1}.node
            GROUP BY walk_id
        )""")
    selects = "\nUNION ALL\n".join(
        f"SELECT walk_id, {s} AS step, node FROM f{s}"
        for s in range(walk_len + 1)
    )
    parts.append(f"""
        SELECT CAST(walk_id AS BIGINT) AS walk_id,
               CAST(step AS BIGINT) AS step,
               CAST(node AS BIGINT) AS node
        FROM ({selects})""")
    return "\n".join(parts)


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n) skip-gram co-occurrence counts from a walk
    corpus — the step between DeepWalk's walks and word2vec training:
    every ordered pair of nodes within `window` positions on the same
    walk, counted. Self-join on walk_id with a |step gap| <= window
    band predicate (walks are length-bounded, so the band join is
    per-walk constant work, never quadratic in the corpus), then ONE
    hash-agg on the pair key."""
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("sb"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.col("center").cast("long"), F.col("context").cast("long"), "n"
        )
    )
