"""_LD_MEMO eviction semantics (ADVICE r10 / VERDICT r10 item 4): an
eviction must NOT unpersist a table a just-returned consumer may still
be reading — retirees park one generation in _LD_RETIRED and are only
unpersisted on the NEXT eviction cycle."""

from __future__ import annotations

import pytest

from code_graph_backend_spark.operators import landmarks as lm


@pytest.fixture()
def tiny_graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    return nodes, edges


@pytest.fixture()
def clean_memo():
    saved_memo = dict(lm._LD_MEMO)
    saved_retired = list(lm._LD_RETIRED)
    saved_cap = lm._LD_CAP
    lm._LD_MEMO.clear()
    lm._LD_RETIRED.clear()
    yield
    for old in lm._LD_RETIRED:
        try:
            old.unpersist()
        except Exception:
            pass
    for _, _, old in lm._LD_MEMO.values():
        try:
            old.unpersist()
        except Exception:
            pass
    lm._LD_MEMO.clear()
    lm._LD_MEMO.update(saved_memo)
    lm._LD_RETIRED.clear()
    lm._LD_RETIRED.extend(saved_retired)
    lm._LD_CAP = saved_cap


def test_third_caller_does_not_unpersist_inflight_table(
    spark, tiny_graph, clean_memo, monkeypatch
):
    """With the cap at 2, a third distinct-params call evicts the first
    entry — the evicted DataFrame must stay persisted (parked in
    _LD_RETIRED), because the first caller may still be consuming it."""
    monkeypatch.setattr(lm, "_LD_CAP", 2)
    nodes, edges = tiny_graph

    first = lm.landmark_distances(nodes, edges, n_landmarks=1, hops=1)
    lm.landmark_distances(nodes, edges, n_landmarks=2, hops=1)
    assert len(lm._LD_MEMO) == 2

    third = lm.landmark_distances(nodes, edges, n_landmarks=3, hops=1)
    # first was evicted from the memo ...
    assert len(lm._LD_MEMO) == 2
    assert lm._LD_MEMO and all(
        out is not first for _, _, out in lm._LD_MEMO.values()
    )
    # ... but NOT unpersisted: it is parked for one generation
    assert first in lm._LD_RETIRED
    assert first.storageLevel.useMemory, (
        "evicted landmark table was unpersisted while a consumer could "
        "still be in flight"
    )
    # the evicted table is still fully consumable
    assert first.count() > 0
    assert third.count() > 0


def test_retirees_drain_on_next_eviction_cycle(
    spark, tiny_graph, clean_memo, monkeypatch
):
    """The deferral is one generation, not a leak: the next eviction
    cycle unpersists the parked retiree before parking the new one."""
    monkeypatch.setattr(lm, "_LD_CAP", 2)
    nodes, edges = tiny_graph

    first = lm.landmark_distances(nodes, edges, n_landmarks=1, hops=1)
    lm.landmark_distances(nodes, edges, n_landmarks=2, hops=1)
    lm.landmark_distances(nodes, edges, n_landmarks=3, hops=1)
    assert first in lm._LD_RETIRED

    lm.landmark_distances(nodes, edges, n_landmarks=4, hops=1)
    # second eviction cycle drained the previous generation
    assert first not in lm._LD_RETIRED
    assert not first.storageLevel.useMemory
    assert len(lm._LD_RETIRED) == 1  # the newly-evicted entry is parked


def test_memo_hit_does_not_touch_retirees(
    spark, tiny_graph, clean_memo, monkeypatch
):
    """A memo HIT never triggers eviction bookkeeping — repeated calls
    with cached params leave both the memo and the parked list alone."""
    monkeypatch.setattr(lm, "_LD_CAP", 2)
    nodes, edges = tiny_graph

    a = lm.landmark_distances(nodes, edges, n_landmarks=1, hops=1)
    b = lm.landmark_distances(nodes, edges, n_landmarks=1, hops=1)
    assert a is b
    assert len(lm._LD_MEMO) == 1
    assert lm._LD_RETIRED == []
