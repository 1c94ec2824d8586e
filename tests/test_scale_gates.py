"""Pressure-test the measured-size local/distributed gates ABOVE their
real caps (VERDICT r7 item 8).

Every cap-forced parity test in the suite shrinks a cap so small data
exercises the distributed branch. This test does the opposite at REAL
sizes: it synthesizes a graph that exceeds the production caps
(2M nodes / 5M undirected edges), so the three largest kernels — ANF,
MST (Borůvka), SCC — choose their DISTRIBUTED branch naturally, then
asserts bit-parity against the driver-local twin run on the same data.
Any gate that flips at the wrong size, or any local/distributed
semantic drift that only appears past the caps, fails here.

OPT-IN: ~3-8 min and several GB of executor memory. Run alone:

    SPARK_GRAFT_SCALE_TEST=1 SPARK_GRAFT_CPUS=32 \
        python -m pytest tests/test_scale_gates.py -q -s

Measured crossover costs are printed per kernel and recorded in
BENCH_NOTES.md ("Round 8: gate pressure-test above sf0.1").
"""

from __future__ import annotations

import json
import os
import time
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_TEST"),
    reason="scale pressure-test is opt-in (SPARK_GRAFT_SCALE_TEST=1); "
    "it synthesizes a >5M-edge graph and runs the distributed kernels",
)

# just past the production caps (registry_ext30._LOCAL_N_CAP = 2M,
# operators/scc._LOCAL_EDGE_ROWS = 5M, mst local_caps = (2M, 5M))
N_NODES = 2_200_000


@pytest.fixture(scope="module")
def big_graph():
    from code_graph_backend_spark.session import get_spark

    spark = get_spark(app_name="scale-gates")
    spark.sparkContext.setLogLevel("ERROR")
    n = F.lit(N_NODES)
    ids = spark.range(N_NODES).select(F.col("id"))
    # 2-cycles (i <-> i+1 for even i) give SCC real multi-node components
    # to resolve; two chord families push the undirected-distinct count
    # past the 5M cap and keep degree bounded (no skew pathology — skew
    # is covered by the salted-join family, this test is about the caps)
    ev = ids.select(F.col("id").alias("src"),
                    ((F.col("id") + 1) % n).alias("dst"))
    back = ids.filter(F.col("id") % 2 == 1).select(
        F.col("id").alias("src"), ((F.col("id") - 1) % n).alias("dst"))
    chord1 = ids.select(F.col("id").alias("src"),
                        ((F.col("id") * 3 + 7) % n).alias("dst"))
    chord2 = ids.select(F.col("id").alias("src"),
                        ((F.col("id") + 1009) % n).alias("dst"))
    edges = ev.unionByName(back).unionByName(chord1).unionByName(chord2) \
        .filter(F.col("src") != F.col("dst"))
    nodes = ids
    g = SimpleNamespace(nodes=nodes, edges=edges)
    yield spark, g


def _checksum(df):
    """Order-insensitive content fingerprint computed IN Spark — the
    result tables here are millions of rows; parity must not collect."""
    cols = sorted(df.columns)
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    # DECIMAL(38) accumulation: summing millions of full-range int64
    # hashes overflows BIGINT under ANSI mode
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.sum(F.abs(h) % 1_000_003).alias("m"),
    ).collect()[0]
    return (row["n"], row["s"], row["m"])


def test_graph_exceeds_every_production_cap(big_graph):
    from code_graph_backend_spark.operators.undirected import und_cached
    from code_graph_backend_spark import registry_ext30 as A

    spark, g = big_graph
    und_n = und_cached(spark, g.edges).count()
    n_n = g.nodes.count()
    assert n_n > A._LOCAL_N_CAP, (n_n, A._LOCAL_N_CAP)
    assert und_n > A._LOCAL_E_CAP, (und_n, A._LOCAL_E_CAP)
    print(f"\n[scale] nodes={n_n:,} und_edges={und_n:,}")


def test_anf_distributed_is_chosen_and_matches_local(big_graph):
    from code_graph_backend_spark.operators.undirected import und_cached
    from code_graph_backend_spark import registry_ext30 as A

    spark, g = big_graph
    und = und_cached(spark, g.edges)
    # the natural branch above the caps is the distributed one — run it
    # exactly as graph_anf_sketch_q's gate would pick it
    assert g.nodes.count() > A._LOCAL_N_CAP
    t0 = time.time()
    dist = {(r["hop"], r["n_nodes"], r["sum_ball_micro"])
            for r in A._anf_distributed(spark, g, und).collect()}
    t_dist = time.time() - t0
    t0 = time.time()
    loc = {(r["hop"], r["n_nodes"], r["sum_ball_micro"])
           for r in A._anf_local(spark, g, und).collect()}
    t_loc = time.time() - t0
    print(f"\n[scale] anf distributed={t_dist:.1f}s local-twin={t_loc:.1f}s")
    assert dist == loc


def test_mst_distributed_is_chosen_and_matches_local(big_graph):
    from code_graph_backend_spark.operators.mst import boruvka_msf

    spark, g = big_graph
    t0 = time.time()
    # default caps: 2.2M nodes exceeds local_caps[0] -> distributed loop
    dist = _checksum(boruvka_msf(spark, g.nodes, g.edges, rounds=2))
    t_dist = time.time() - t0
    t0 = time.time()
    loc = _checksum(
        boruvka_msf(spark, g.nodes, g.edges, rounds=2,
                    local_caps=(10**9, 10**9))
    )
    t_loc = time.time() - t0
    print(f"\n[scale] mst distributed={t_dist:.1f}s local-twin={t_loc:.1f}s")
    assert dist == loc


def test_scc_distributed_is_chosen_and_matches_local(big_graph):
    from code_graph_backend_spark.operators import scc as S
    from code_graph_backend_spark.operators.undirected import dir_cached

    spark, g = big_graph
    assert dir_cached(spark, g.edges).count() > S._LOCAL_EDGE_ROWS
    t0 = time.time()
    dist = _checksum(S.scc_bounded(spark, g.edges))  # natural: distributed
    t_dist = time.time() - t0
    t0 = time.time()
    loc = _checksum(S._scc_local(spark, g.edges, trim_rounds=2, hops=10, peels=1))
    t_loc = time.time() - t0
    print(f"\n[scale] scc distributed={t_dist:.1f}s local-twin={t_loc:.1f}s")
    assert dist == loc


def test_landmarks_distributed_is_chosen_and_matches_local(big_graph):
    """VERDICT r8 item 6: the landmark/eccentricity family was the one
    remaining measured-size local path never flipped at REAL sizes. At
    2.2M nodes the default caps (landmarks._LOCAL_N_CAP = 2M) choose
    the distributed batched BFS naturally; the driver-local matrix twin
    must be bit-equal on the same data. graph_closeness_approx and
    graph_eccentricity_bounds both sit on this kernel."""
    from code_graph_backend_spark.operators import landmarks as L

    spark, g = big_graph
    assert g.nodes.count() > L._LOCAL_N_CAP
    t0 = time.time()
    # default caps: natural distributed branch
    dist = _checksum(L.landmark_distances(g.nodes, g.edges,
                                          n_landmarks=8, hops=3))
    t_dist = time.time() - t0
    t0 = time.time()
    loc = _checksum(L._landmarks_local(g.nodes, g.edges,
                                       n_landmarks=8, hops=3))
    t_loc = time.time() - t0
    print(f"\n[scale] landmarks distributed={t_dist:.1f}s "
          f"local-twin={t_loc:.1f}s")
    assert dist == loc


def test_stress_distributed_is_chosen_and_matches_local(big_graph):
    """landmark_stress (graph_stress_centrality's kernel) is the fifth
    and last measured-size family: at 2.2M nodes the default caps
    (stress._LOCAL_N_CAP = 2M) choose the distributed sigma-counting
    BFS naturally; the vectorized local twin must be bit-equal."""
    from code_graph_backend_spark.operators import stress as S

    spark, g = big_graph
    assert g.nodes.count() > S._LOCAL_N_CAP
    t0 = time.time()
    dist = _checksum(S.landmark_stress(g.nodes, g.edges,
                                       n_landmarks=8, hops=2,
                                       landmark_by="id"))
    t_dist = time.time() - t0
    t0 = time.time()
    loc = _checksum(S._stress_local(g.nodes, g.edges,
                                    n_landmarks=8, hops=2,
                                    landmark_by="id"))
    t_loc = time.time() - t0
    print(f"\n[scale] stress distributed={t_dist:.1f}s "
          f"local-twin={t_loc:.1f}s")
    assert dist == loc


def test_dedup_lsh_components_at_500k_docs():
    """Pressure the DEDUP path at real above-cap size (the r9 extension
    of the graph-kernel recipe to the pipeline side): 100 one-token-
    perturbed replicas of every sf0.1 document = 500k docs. The minhash
    LSH plan (explode -> one hash-agg -> banded equi-join, never
    all-pairs) must produce ~C(100,2) candidates per replica family
    (~24.7M pairs), which exceeds components._LOCAL_PAIR_ROWS = 5M, so
    connected_components chooses its DISTRIBUTED alternating-star
    branch naturally. Structural ground truth: families of base docs
    that are LSH-isolated at the 5k base level must each land in
    EXACTLY one component, unmixed."""
    from code_graph_backend_spark.functions.dedup import minhash_lsh_candidates
    from code_graph_backend_spark.operators import components as C
    from code_graph_backend_spark.session import get_spark, read_table

    spark = get_spark(app_name="scale-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")

    # base-level LSH: which docs are isolated (no candidate partner)?
    base_cand = minhash_lsh_candidates(docs).collect()
    paired = {r["i"] for r in base_cand} | {r["j"] for r in base_cand}
    iso = docs.filter(~F.col("doc_id").isin(list(paired)) if paired
                      else F.lit(True))
    # longest isolated docs: one appended token cannot break their
    # within-family band agreement
    iso_ids = [r["doc_id"] for r in
               iso.orderBy(F.desc("n_chars"), "doc_id").limit(100).collect()]

    reps = spark.range(100).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        F.concat_ws(
            " ", F.col("text"), F.concat(F.lit("zq"), F.col("rep"))
        ).alias("text"),
    )
    n_docs = big.count()
    assert n_docs == 100 * docs.count()

    t0 = time.time()
    cand = minhash_lsh_candidates(big)
    n_cand = cand.count()
    t_cand = time.time() - t0
    # families are ~100-cliques: candidates scale linearly in docs
    # (#families x C(100,2)), NOT quadratically in the corpus
    assert n_cand > 1_000_000
    assert n_cand < 40_000_000
    assert n_cand > C._LOCAL_PAIR_ROWS  # natural distributed branch

    t0 = time.time()
    comp = C.connected_components(spark, cand)
    t_comp = time.time() - t0
    fam = comp.withColumn("base", (F.col("node") / 100).cast("long")) \
        .filter(F.col("base").isin(iso_ids))
    per_fam = fam.groupBy("base").agg(
        F.countDistinct("component").alias("n_comp"),
        F.count("*").alias("n_members"),
    ).collect()
    assert per_fam, "no isolated families found"
    for r in per_fam:
        assert r["n_comp"] == 1, (r["base"], r["n_comp"])
        assert r["n_members"] == 100, (r["base"], r["n_members"])
    # no component mixes two isolated families
    mix = fam.groupBy("component").agg(
        F.countDistinct("base").alias("nb")).filter(F.col("nb") > 1).count()
    assert mix == 0
    print(f"\n[scale] dedup 500k docs: candidates={n_cand:,} in "
          f"{t_cand:.1f}s, components(distributed)={t_comp:.1f}s")


def test_ann_exact_and_ivf_at_200k_vectors():
    """ANN pillar at 100x corpus: every sf0.1 embedding replicated 100x
    with a tiny SCALE perturbation (cosine is scale-invariant, so each
    replica keeps sim 1.0 to its base — an exact structural ground
    truth). brute_force_topk must return exactly the 100-replica family
    for each unambiguous query (one GEMM pass per Arrow batch, local
    top-k, window over nbatches x |Q| x k partials — never a crossJoin);
    ivf_topk (64 cells, probe 8) must reach >= 0.9 recall against it,
    since near-identical replicas land in the same inverted list."""
    from code_graph_backend_spark.functions.similarity import (
        brute_force_topk, ivf_topk)
    from code_graph_backend_spark.session import get_spark, read_table

    spark = get_spark(app_name="scale-ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = emb.count()

    # unambiguous queries: bases whose nearest OTHER base is not a
    # rounding-level tie at sim ~1.0
    cand_q = emb.orderBy("vec_id").limit(20).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    # k=2: rank 1 is the query's own base at sim 1.0; the nearest OTHER
    # base decides ambiguity
    base_top = brute_force_topk(cand_q, emb, k=2).collect()
    good = sorted({
        r["qid"] - 10_000_000 for r in base_top
        if r["cid"] != r["qid"] - 10_000_000 and r["sim"] < 0.999999
    } - {
        r["qid"] - 10_000_000 for r in base_top
        if r["cid"] != r["qid"] - 10_000_000 and r["sim"] >= 0.999999
    })[:10]
    assert len(good) >= 5, "synthetic embeddings too degenerate"

    reps = spark.range(100).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") * 1000 + F.col("rep")).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(x * (1.0d + rep * 1e-7d) AS FLOAT))"
        ).alias("embedding"),
    )
    assert big.count() == 100 * n_base

    qs = emb.filter(F.col("vec_id").isin(good)).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")

    t0 = time.time()
    exact = brute_force_topk(qs, big, k=100).collect()
    t_exact = time.time() - t0
    by_q = {}
    for r in exact:
        by_q.setdefault(r["qid"] - 10_000_000, set()).add(r["cid"])
    for b in good:
        want = {b * 1000 + r for r in range(100)}
        assert by_q[b] == want, (b, len(by_q[b] & want))

    t0 = time.time()
    approx = ivf_topk(qs, big, k=100, n_centroids=64, n_probe=8,
                      train_sample=10_000)
    arows = approx.collect()
    t_ivf = time.time() - t0
    hits = sum(1 for r in arows
               if r["cid"] in by_q.get(r["qid"] - 10_000_000, set()))
    recall = hits / max(1, len(good) * 100)
    print(f"\n[scale] ann 200k vectors: exact top-100 {t_exact:.1f}s, "
          f"ivf(64c, probe 8) {t_ivf:.1f}s, recall@100={recall:.3f}")
    assert recall >= 0.9, recall


def test_packing_sharded_at_500k_docs():
    """Packing pillar at 100x corpus: pack_sequences_sharded (the 100 TB
    partition-parallel variant — per-shard cumsum windows instead of the
    one serial global window) over 500k docs. Invariants checked IN
    Spark (no driver materialization of the result): exact token
    conservation, every doc exactly once, every tok_offset within
    [0, budget). Duality: for one arbitrary shard, the sharded result
    must equal the GLOBAL packer run on that shard's sub-corpus with
    seq_ids re-based — the sharded variant is exactly 64 independent
    global packs."""
    from code_graph_backend_spark.functions.packing import (
        pack_sequences, pack_sequences_sharded)
    from code_graph_backend_spark.session import get_spark, read_table

    spark = get_spark(app_name="scale-pack")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    reps = spark.range(100).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", F.col("text"),
                    F.concat(F.lit("zq"), F.col("rep"))).alias("text"),
    )
    n_docs = big.count()
    budget, n_shards = 2048, 64

    t0 = time.time()
    packed = pack_sequences_sharded(
        big, budget=budget, n_shards=n_shards).persist()
    row = packed.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.sum("n_tokens").alias("tok"),
        F.max("tok_offset").alias("maxoff"),
        F.min("tok_offset").alias("minoff"),
    ).collect()[0]
    t_pack = time.time() - t0
    in_tok = big.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    assert row["n"] == row["nd"] == n_docs
    assert row["tok"] == in_tok
    assert 0 <= row["minoff"] and row["maxoff"] < budget

    # exact duality on one shard: sharded == global pack of the shard
    sh = 7
    sub = big.filter(F.pmod(F.col("doc_id"), F.lit(n_shards)) == sh)
    glob = pack_sequences(sub, budget=budget).select(
        (F.lit(sh) * F.lit(1 << 40) + F.col("seq_id")).alias("seq_id"),
        "doc_id", "n_tokens", "tok_offset")
    shard_rows = packed.filter(
        F.pmod(F.col("doc_id"), F.lit(n_shards)) == sh)
    diff = shard_rows.exceptAll(glob).count() + glob.exceptAll(
        shard_rows).count()
    assert diff == 0
    packed.unpersist()
    print(f"\n[scale] packing 500k docs: sharded cumsum+checks "
          f"{t_pack:.1f}s over {in_tok:,} tokens, shard-7 duality exact")


def test_streaming_state_bounded_by_watermark_at_2m_events():
    """Streaming pillar: 'watermark-bounded state' is the standing 100 TB
    claim for the windowed family — prove it empirically. 2M events
    spanning 200 hours of event time (20 event types) flow through the
    tumbling 1h aggregation under a 2h watermark in 20 time-ordered
    micro-batches. Total distinct (window, type) groups ~4000; if the
    watermark evicts, the state store's numRowsTotal stays at the
    open-window working set (~tens), never growing with the stream."""
    import datetime as dt
    import tempfile

    from code_graph_backend_spark.session import get_spark
    from code_graph_backend_spark.streaming import windows as W

    spark = get_spark(app_name="scale-stream")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_stream_")
    data_dir, ckpt = tmp + "/ev", tmp + "/ckpt"

    n, hours, types = 2_000_000, 200, 20
    per_chunk = n // 40
    base = int(dt.datetime(2026, 1, 1).timestamp())
    ev = spark.range(n).select(
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") * (hours * 3600) / n).cast("long")
        ).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % types)).alias("event_type"),
        F.lit(1.0).alias("value"),
        (F.col("id") % 1000).alias("user_id"),
    )
    t0 = time.time()
    for c in range(40):  # sequential appends => modTime-ordered files
        ev.filter(
            (F.col("user_id") >= 0)  # keep the plan trivially valid
            & (F.col("ts") >= F.timestamp_seconds(
                F.lit(base + c * per_chunk * hours * 3600 // n)))
            & (F.col("ts") < F.timestamp_seconds(
                F.lit(base + (c + 1) * per_chunk * hours * 3600 // n)))
        ).coalesce(1).write.mode("append").parquet(data_dir)
    t_write = time.time() - t0

    schema = spark.read.parquet(data_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(data_dir)
        .withWatermark("ts", "2 hours")
    )
    q = (
        W.tumbling(stream, "1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scale_state")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.time()
    q.processAllAvailable()
    t_stream = time.time() - t0
    max_state = max(
        (p["stateOperators"][0]["numRowsTotal"]
         for p in (json.loads(x.json) for x in q.recentProgress)
         if p.get("stateOperators")),
        default=0,
    )
    closed = spark.sql(
        "select count(*) n, sum(n_events) s from scale_state").collect()[0]
    q.stop()
    # eviction: the state never approaches the ~4000 total groups
    assert 0 < max_state < 1500, max_state
    # ~all windows finalized (the last watermark-open hours may be held)
    assert closed["n"] > 3800, closed["n"]
    assert closed["s"] > 1_900_000
    print(f"\n[scale] streaming 2M events/200h: write {t_write:.1f}s, "
          f"stream {t_stream:.1f}s over ~20 micro-batches, "
          f"max state rows={max_state} (total groups ~4000), "
          f"finalized windows={closed['n']}")


def test_two_level_prefix_kernels_at_2m_rows():
    """The r10 two-level prefix kernels at ~100x test scale: on a 2M-row
    input, two_level_prefix_sum, two_level_prefix_max and exact_ntile
    must each BIT-MATCH the flat single-window twin computed on the same
    data — the twin IS the semantics (and the oracle), and at this size
    it is the one-partition anti-plan the kernels exist to avoid, so
    equality here is the decomposition proof above every test-scale
    input. Skewed ties included: the metric collides heavily (v % 911)
    so tie groups span bucket-width boundaries."""
    from pyspark.sql.window import Window

    from code_graph_backend_spark.functions.packing import (
        exact_ntile, two_level_prefix_max, two_level_prefix_sum)
    from code_graph_backend_spark.session import get_spark

    spark = get_spark(app_name="scale-prefix")
    spark.sparkContext.setLogLevel("ERROR")
    n = 2_000_000
    d = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 1_000_003).alias("score"),
        ((F.col("id") % 97) + 1).alias("w"),
        ((F.col("id") * 48271) % 911).alias("v"),  # heavy ties
    ).persist()
    d.count()

    # --- prefix SUM over (score desc, id) ------------------------------
    t0 = time.time()
    two = two_level_prefix_sum(
        d.withColumn("_bkt", F.expr("-(score DIV 4096)")),
        "w", "_bkt", [F.col("score").desc(), F.col("id").asc()],
        out_col="cum",
    ).select("id", "cum")
    flat_w = Window.orderBy(F.col("score").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0)
    flat = d.withColumn("cum", F.sum("w").over(flat_w).cast("long")).select("id", "cum")
    diff_sum = two.exceptAll(flat).count() + flat.exceptAll(two).count()
    t_sum = time.time() - t0
    assert diff_sum == 0

    # --- prefix MAX over (v asc, id) — running max of score ------------
    t0 = time.time()
    twom = two_level_prefix_max(
        d.withColumn("_bkt", F.expr("v DIV 16")),
        "score", "_bkt", [F.col("v").asc(), F.col("id").asc()],
        out_col="rm",
    ).select("id", "rm")
    flatm_w = Window.orderBy(F.col("v").asc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0)
    flatm = d.withColumn("rm", F.max("score").over(flatm_w).cast("long")).select("id", "rm")
    diff_max = twom.exceptAll(flatm).count() + flatm.exceptAll(twom).count()
    t_max = time.time() - t0
    assert diff_max == 0

    # --- exact NTILE(5) over (v asc, id) vs flat ntile ------------------
    t0 = time.time()
    base = d.crossJoin(F.broadcast(d.agg(F.count("*").cast("long").alias("_n"))))
    tile = exact_ntile(base, "v", "_n", "id", "tile",
                       n_tiles=5, descending=False, width=16).select("id", "tile")
    flat_t = d.withColumn(
        "tile",
        F.ntile(5).over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
        .cast("long"),
    ).select("id", "tile")
    diff_tile = tile.exceptAll(flat_t).count() + flat_t.exceptAll(tile).count()
    t_tile = time.time() - t0
    assert diff_tile == 0

    # --- exact NTILE(64) over (v, score, id) — composite ties ----------
    # the shard_zorder_prune shape: heavy metric collisions resolved by
    # TWO tie columns; (v, score, id) is a total order because id is
    t0 = time.time()
    tile2 = exact_ntile(base, "v", "_n", ["score", "id"], "tile",
                        n_tiles=64, descending=False, width=16).select("id", "tile")
    flat_t2 = d.withColumn(
        "tile",
        F.ntile(64).over(
            Window.orderBy(F.col("v").asc(), F.col("score").asc(),
                           F.col("id").asc())
        ).cast("long"),
    ).select("id", "tile")
    diff_tile2 = tile2.exceptAll(flat_t2).count() + flat_t2.exceptAll(tile2).count()
    t_tile2 = time.time() - t0
    assert diff_tile2 == 0

    d.unpersist()
    print(f"\n[scale] two-level prefix kernels at {n:,} rows: "
          f"sum {t_sum:.1f}s, max {t_max:.1f}s, ntile {t_tile:.1f}s, "
          f"multi-tie ntile64 {t_tile2:.1f}s — "
          f"all bit-equal to the flat single-partition twins")
