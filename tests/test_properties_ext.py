"""Property-based tests for the round-5 text/selection operators:
Kneser–Ney scoring, RAKE keyword extraction, and the token-budget cut,
each checked against an independent pure-Python model on
hypothesis-generated corpora (the containment-pairs precedent —
two implementations, one answer)."""

from __future__ import annotations

import math
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import code_graph_backend_spark.registry_ext13  # noqa: F401
import code_graph_backend_spark.registry_ext14  # noqa: F401

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word = st.sampled_from(["a", "the", "cat", "dog", "runs", "big"])
doc = st.lists(word, min_size=2, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def _docs_parquet(spark, td, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).selectExpr(
        "doc_id", "text", "'xx' AS lang", "'s' AS source",
        "CAST(length(text) AS LONG) AS n_chars",
    )
    path = os.path.join(td, "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return td


def _py_kn(texts):
    """Independent KN bigram model: returns {doc_id: (n_bigrams, avg)}"""
    bigrams = []
    per_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bg = list(zip(toks, toks[1:]))
        per_doc[i] = bg
        bigrams.extend(bg)
    if not bigrams:
        return {}
    from collections import Counter

    c2 = Counter(bigrams)
    c1 = Counter()
    fw = Counter()
    bw = Counter()
    for (w1, w2), n in c2.items():
        c1[w1] += n
        fw[w1] += 1
        bw[w2] += 1
    B = len(c2)
    out = {}
    for i, bg in per_doc.items():
        if not bg:
            continue
        nll = [
            -math.log2(
                ((c2[p] - 0.75) / c1[p[0]])
                + ((0.75 * fw[p[0]]) / c1[p[0]]) * (bw[p[1]] / B)
            )
            for p in bg
        ]
        out[i] = (len(bg), round(sum(nll) / len(nll), 6))
    return out


@given(corpus)
@SETTINGS
def test_kn_matches_pure_python(spark, texts):
    from code_graph_backend_spark.registry import QUERIES

    want = _py_kn(texts)
    with tempfile.TemporaryDirectory() as td:
        _docs_parquet(spark, td, texts)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_kn_nll_bits"])
            for r in QUERIES["text_kn_bigram_logprob"](spark, td).collect()
        }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 2e-6, (k, got[k], want[k])


def _py_rake(texts, cap=4, stops=("the", "a")):
    from collections import Counter

    phrases = []
    for t in texts:
        run = []
        for w in t.split(" ") + ["the"]:  # sentinel flushes the last run
            if w in stops:
                if run and len(run) <= cap:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: (deg[w] * 1000000) // freq[w] for w in freq}
    out = {}
    for p in set(phrases):
        out[" ".join(p)] = (
            sum(1 for q in phrases if q == p),
            sum(score[w] for w in p),
        )
    top = sorted(out.items(), key=lambda kv: (-kv[1][1], kv[0]))[:50]
    return dict(top)


@given(corpus)
@SETTINGS
def test_rake_matches_pure_python(spark, texts):
    from code_graph_backend_spark.registry import QUERIES

    want = _py_rake(texts)
    with tempfile.TemporaryDirectory() as td:
        _docs_parquet(spark, td, texts)
        got = {
            r["phrase"]: (r["n_occurrences"], r["score_micro"])
            for r in QUERIES["text_rake_keywords"](spark, td).collect()
        }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 200)),  # (n_words, n_chars)
        min_size=1,
        max_size=20,
    ),
    st.integers(10, 400),
)
@SETTINGS
def test_token_budget_prefix_invariants(spark, docs, budget):
    """Greedy prefix-budget semantics: the kept set is exactly the
    maximal prefix of the (score desc, id) order whose token sum fits,
    computed independently in pure Python."""
    from code_graph_backend_spark.functions.packing import token_budget_select

    rows = [
        (i, " ".join(["w"] * nw), nc) for i, (nw, nc) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = [
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_select(df, budget=budget).collect()
    ]
    order = sorted(range(len(docs)), key=lambda i: (-docs[i][1], i))
    want, cum = [], 0
    for i in order:
        cum += docs[i][0]
        if cum > budget:
            break
        want.append((i, docs[i][0], cum))
    assert got == want
