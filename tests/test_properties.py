"""Property-based tests (hypothesis) — beyond the reference's example-only
test strategy (SURVEY.md §5): traversal kernels against a pure-Python graph
oracle on arbitrary small graphs, and MERGE-layer algebraic laws.

Graphs stay ≤8 nodes so every example runs through the engine's local fast
path (3 Spark jobs); examples are capped to keep the suite fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from code_graph_backend_spark.operators.traversal import find_paths, reachable

edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0,
    max_size=20,
    unique=True,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(s, d, "T", None) for s, d in pairs],
        "src long, dst long, type string, props map<string,string>",
    )


def _py_closure(pairs, seeds):
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    visited = set(seeds)
    frontier = set(seeds)
    while frontier:
        frontier = {
            d for s in frontier for d in adj.get(s, ()) if d not in visited
        }
        visited |= frontier
    return visited


def _py_simple_paths(pairs, src, dst, max_depth):
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    out = []
    stack = [(src, (src,))]
    while stack:
        head, path = stack.pop()
        if len(path) - 1 >= max_depth:
            continue
        for d in adj.get(head, ()):
            if d in path:
                continue
            p2 = path + (d,)
            if d == dst:
                out.append(p2)
            else:
                stack.append((d, p2))
    return sorted(out)


@SETTINGS
@given(pairs=edges_strategy, seed=st.integers(0, 7))
def test_reachable_matches_python_oracle(spark, pairs, seed):
    got = {
        r["id"]
        for r in reachable(spark, _edges_df(spark, pairs), [seed], edge_type="T").collect()
    }
    assert got == _py_closure(pairs, [seed])


@SETTINGS
@given(pairs=edges_strategy, src=st.integers(0, 7), dst=st.integers(0, 7))
def test_find_paths_matches_python_oracle(spark, pairs, src, dst):
    if src == dst:
        return  # reference semantics for self-paths are not exercised
    got = sorted(
        tuple(r["path"])
        for r in find_paths(
            spark, _edges_df(spark, pairs), src, dst, edge_type="T", max_depth=8
        ).collect()
    )
    assert got == _py_simple_paths(pairs, src, dst, 8)


@SETTINGS
@given(
    batch=st.lists(
        st.tuples(st.integers(0, 5), st.text("ab", min_size=1, max_size=3)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_merge_nodes_idempotent(spark, batch):
    """merge(merge(g, b), b) == merge(g, b) — MERGE is an upsert, not append."""
    from code_graph_backend_spark.graph.model import NODES_SCHEMA
    from code_graph_backend_spark.mutations.merge import merge_nodes

    base = spark.createDataFrame(
        [(0, ["X"], "orig", None, None, None, None, None, None, None)], NODES_SCHEMA
    )
    b = spark.createDataFrame(
        [(i, ["X"], name, None, None, None, None, None, None, None) for i, name in batch],
        NODES_SCHEMA,
    )
    once = merge_nodes(base, b).localCheckpoint(eager=True)
    twice = merge_nodes(once, b)
    got_once = sorted((r["id"], r["name"]) for r in once.collect())
    got_twice = sorted((r["id"], r["name"]) for r in twice.collect())
    assert got_once == got_twice
    # every batched id present exactly once
    ids = [r[0] for r in got_once]
    assert len(ids) == len(set(ids))


# -- round-3 curation operators ---------------------------------------------

text_strategy = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=120,
)


@given(st.lists(text_strategy, min_size=1, max_size=8))
@SETTINGS
def test_pii_redaction_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): replacement tokens never re-match
    any PII pattern, so the operator is a projection."""
    from code_graph_backend_spark.functions.pii import redact_pii

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = redact_pii(docs).select(
        "doc_id", F.col("clean_text").alias("text"))
    twice = redact_pii(once)
    rows = {r["doc_id"]: r for r in twice.collect()}
    first = {r["doc_id"]: r["text"] for r in once.collect()}
    for i, r in rows.items():
        assert r["clean_text"] == first[i]
        assert r["n_pii"] == 0


@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40),
    st.floats(min_value=0.0, max_value=1.0),
)
@SETTINGS
def test_weighted_sample_quota_law(spark, strata, w):
    """For every stratum: kept == min(size, ceil(w * size)), and kept rows
    are a subset of the input."""
    import math

    from code_graph_backend_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strata)], "doc_id long, source string"
    )
    out = weighted_sample(df, "source", {"a": w, "b": w}, "doc_id",
                          default_weight=w).collect()
    sizes = {}
    for s in strata:
        sizes[s] = sizes.get(s, 0) + 1
    kept = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    for s, n in sizes.items():
        assert kept.get(s, 0) == min(n, math.ceil(w * n) if w > 0 else 0)


@given(st.lists(text_strategy, min_size=1, max_size=6))
@SETTINGS
def test_token_repetition_bounds(spark, texts):
    """0 <= dup_bigram_ratio < 1; n_distinct <= n_tokens; top_freq <= n_tokens."""
    from code_graph_backend_spark.functions.text import token_repetition

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for r in token_repetition(docs).collect():
        assert 0.0 <= r["dup_bigram_ratio"] < 1.0 or (
            r["dup_bigram_ratio"] == 0.0 and r["n_tokens"] <= 1
        )
        assert r["n_distinct"] <= r["n_tokens"]
        assert r["top_freq"] <= r["n_tokens"]


# -- r4 kernels -------------------------------------------------------------

import numpy as np


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 9), w=st.integers(1, 9),
    topdown=st.booleans(), seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, topdown, seed):
    """decode(encode(px)) == px for arbitrary sizes (row padding, both
    row orders) — pure functions, no Spark."""
    from code_graph_backend_spark.functions.codecs import decode_bmp, encode_bmp

    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    ww, hh, out = decode_bmp(encode_bmp(px, topdown=topdown))
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 64), rate=st.sampled_from([8000, 16000, 44100]),
    junk=st.binary(min_size=0, max_size=9), seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, junk, seed):
    from code_graph_backend_spark.functions.codecs import decode_wav, encode_wav

    samples = np.random.RandomState(seed).randint(
        -32768, 32768, n, dtype=np.int64
    ).astype(np.int16)
    payload = encode_wav(samples, rate, extra_chunks=[(b"LIST", junk)])
    r, ch, bits, out = decode_wav(payload)
    assert (r, ch, bits) == (rate, 1, 16)
    assert np.array_equal(out, samples)


@settings(**{**{k: v for k, v in SETTINGS.__dict__.items() if False}}, max_examples=8,
          deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(1, 4), st.text("ab", min_size=1, max_size=3)),
            min_size=1, max_size=3,
        ),
        min_size=1, max_size=4,
    )
)
def test_oplog_coalesce_equals_sequential_replay(spark, batches):
    """Replaying N consecutive merge_nodes batches coalesced into one must
    equal replaying them one by one — including duplicate ids ACROSS
    batches (the advisor-flagged case: field-wise last-write-wins with
    props map-merge)."""
    from code_graph_backend_spark.graph.model import NODES_SCHEMA, PropertyGraph
    from code_graph_backend_spark.mutations.oplog import OpLog

    def row(i, name):
        return {"id": i, "labels": ["X"], "name": name,
                "props": {name: str(i)}}

    log = OpLog()
    for batch in batches:
        log.record("a", "b", "merge_nodes",
                   {"rows": [row(i, nm) for i, nm in batch]})

    def fresh():
        g = PropertyGraph(spark, "r")
        g.nodes = spark.createDataFrame([], NODES_SCHEMA)
        return g

    # sequential: apply each entry unchanged
    g_seq = fresh()
    for e in log.transitions("a", "b"):
        g_seq = log.apply(g_seq, e)
    # coalesced path (what replay_path uses)
    g_co = fresh()
    for e in log._coalesced(log.transitions("a", "b")):
        g_co = log.apply(g_co, e)

    def snap(g):
        return sorted(
            (r["id"], r["name"], tuple(sorted((r["props"] or {}).items())))
            for r in g.nodes.collect()
        )

    assert snap(g_seq) == snap(g_co)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lens=st.lists(st.integers(1, 12), min_size=1, max_size=8),
       budget=st.integers(2, 10))
def test_pack_sequences_invariants(spark, lens, budget):
    """Offsets < budget; the (seq_id, tok_offset) stream position equals
    the running token count; seq ids are nondecreasing in doc order."""
    from code_graph_backend_spark.functions.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = sorted(pack_sequences(docs, budget=budget).collect(),
                  key=lambda r: r["doc_id"])
    run = 0
    prev_seq = 0
    for r in rows:
        assert 0 <= r["tok_offset"] < budget
        assert r["seq_id"] * budget + r["tok_offset"] == run
        assert r["seq_id"] >= prev_seq
        prev_seq = r["seq_id"]
        run += r["n_tokens"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=edges_strategy)
def test_triangle_count_matches_python_oracle(spark, pairs):
    from itertools import combinations

    from code_graph_backend_spark.operators.triangles import (
        triangle_count_per_node,
    )

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    expect: dict[int, int] = {}
    nodes = {v for e in und for v in e}
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (y, z), (x, z)} <= und:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    got = {r["node"]: r["n_triangles"] for r in
           triangle_count_per_node(_edges_df(spark, pairs)).collect()}
    assert got == expect


# -- round-4c kernels --------------------------------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc_strategy = st.lists(_word, min_size=1, max_size=30).map(" ".join)


def _py_spans(texts: dict[int, str], n: int):
    """Brute-force reference of duplicated_spans: anchor positions whose
    n-gram occurs in >=2 distinct docs, merged into maximal runs."""
    grams: dict[str, set[int]] = {}
    pos: dict[int, list[tuple[int, str]]] = {}
    for d, t in texts.items():
        toks = t.split(" ")
        pos[d] = []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            grams.setdefault(g, set()).add(d)
            pos[d].append((i + 1, g))
    out = set()
    for d, plist in pos.items():
        anchors = sorted(p for p, g in plist if len(grams[g]) >= 2)
        run: list[int] = []
        for p in anchors:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.add((d, run[0], run[-1] + n - 1, run[-1] + n - 1 - run[0] + 1, len(run)))
                run = [p]
        if run:
            out.add((d, run[0], run[-1] + n - 1, run[-1] + n - 1 - run[0] + 1, len(run)))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc_strategy, min_size=2, max_size=6))
def test_duplicated_spans_matches_python_oracle(spark, docs):
    from code_graph_backend_spark.functions.boilerplate import duplicated_spans

    n = 3
    texts = dict(enumerate(docs))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_anchors)
        for r in duplicated_spans(df, n=n).collect()
    }
    assert got == _py_spans(texts, n)


def _py_hll(items: list[str]):
    """Pure-python replica of the md5 HLL estimator (m=256)."""
    import hashlib
    import math

    regs = [0] * 256
    for it in items:
        h = hashlib.md5(it.encode()).hexdigest()
        bucket = int(h[:2], 16)
        v = int(h[2:14], 16)
        rho = 49 if v == 0 else (48 - v.bit_length() + 1)
        regs[bucket] = max(regs[bucket], rho)
    s = sum(2.0 ** -m for m in regs)
    v0 = regs.count(0)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 / s
    if raw <= 2.5 * 256 and v0 > 0:
        raw = 256.0 * math.log(256.0 / v0)
    return round(raw, 4)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_items=st.integers(1, 400), seed=st.integers(0, 5))
def test_hll_matches_python_reference(spark, n_items, seed):
    from code_graph_backend_spark.functions.sketches import hll_distinct

    items = [f"it-{seed}-{i % max(1, n_items // 2)}" for i in range(n_items)]
    df = spark.createDataFrame(
        [("g", it) for it in items], "grp string, i string"
    )
    (row,) = hll_distinct(df, "grp", "i").collect()
    assert row.hll_est == _py_hll(items)
    assert row.exact_distinct == len(set(items))


def _py_containment(texts, n=3, thr=800):
    """Brute-force directional containment over n-token shingle sets."""
    sh = {}
    for i, t in texts:
        toks = t.split(" ")
        sh[i] = {
            " ".join(toks[k:k + n]) for k in range(len(toks) - n + 1)
        } if len(toks) >= n else set()
    out = {}
    for i, si in sh.items():
        if not si:
            continue
        for j, sj in sh.items():
            if i == j:
                continue
            c = len(si & sj)
            if c * 1000 >= thr * len(si):
                out[(i, j)] = (c * 1000) // len(si)
    return out


@SETTINGS
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "x"]),
        min_size=0, max_size=12,
    ).map(" ".join),
    st.lists(
        st.sampled_from(["a", "b", "c", "y"]),
        min_size=0, max_size=12,
    ).map(" ".join),
    st.integers(300, 1000),
)
def test_containment_matches_python_oracle(spark, t1, t2, thr):
    from code_graph_backend_spark.functions.dedup import containment_pairs

    texts = [(1, t1), (2, t2), (3, t1 + " " + t2)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["i"], r["j"]): r["cont_milli"]
        for r in containment_pairs(docs, threshold_milli=thr).collect()
    }
    assert got == _py_containment(texts, thr=thr)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 9), w=st.integers(1, 9),
    topdown=st.booleans(), seed=st.integers(0, 2**31 - 1),
)
def test_tga_roundtrip_property(h, w, topdown, seed):
    """decode(encode(px)) == px for arbitrary sizes, both origins."""
    from code_graph_backend_spark.functions.codecs import decode_tga, encode_tga

    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    ww, hh, out = decode_tga(encode_tga(px, topdown=topdown))
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, px)
