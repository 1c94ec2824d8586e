"""Bounded HITS (hubs & authorities) over the property-graph twin.

Reference parity note: the reference exposes graph-analytics procedures
through its graph store; HITS is part of the beyond-parity analytics
suite (SURVEY.md §2.12) alongside pagerank/sssp/label-propagation/k-core.

The Kleinberg iteration is auth = A^T · hub, hub = A · auth, usually
followed by L2 normalization. Normalization divides by a float norm whose
cross-engine reproducibility is poor (sum order), so — same trick as the
unrolled pagerank/sssp oracles — we run a FIXED number of UNNORMALIZED
rounds from hub_0 = 1: every score is then an exact BIGINT (sums of
products of integers) and the DuckDB oracle can replay it hash-exactly.
Rankings are identical to the normalized variant (normalization is a
positive scalar per round).

Scale shape: per round, one join + one hash-agg per direction — the same
two-shuffle pattern as one pagerank iteration. No driver collect, no
cross join; scores stay (node, value) rows end-to-end. Integer growth is
bounded by (max_degree²)^rounds — rounds is small (2) by contract, and at
100 TB you'd switch to the normalized float variant once hash-exact
verification is no longer the goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hits_bounded(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 2,
) -> DataFrame:
    """(node, hub, auth) after `rounds` unnormalized HITS rounds.

    hub_0 = 1 for every node; one round is auth_t = Σ_{u→v} hub_{t-1}(u)
    followed by hub_t = Σ_{u→v} auth_t(v). Nodes without in/out edges
    keep score 0 for that side. Deterministic, integer-exact.
    """
    from ..scratch import scratch_persist

    # e and ids feed one join per direction per round — persist once or
    # the caller's edge/node derivation re-runs 2*rounds times
    e = scratch_persist(edges.select("src", "dst").distinct())
    ids = scratch_persist(nodes.select(F.col("id").alias("node")))
    hub = ids.select("node", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(rounds):
        # auth_t(v) = sum of hub_{t-1} over in-edges u->v
        a = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = ids.join(a, "node", "left").select(
            "node", F.coalesce("a", F.lit(0)).cast("long").alias("a")
        )
        # hub_t(u) = sum of auth_t over out-edges u->v
        h = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = ids.join(h, "node", "left").select(
            "node", F.coalesce("h", F.lit(0)).cast("long").alias("h")
        )
    return hub.join(auth, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("auth")
    )
