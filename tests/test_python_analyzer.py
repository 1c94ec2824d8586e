"""Tier-1 analyzer tests, modeled on the reference's
tests/test_py_analyzer.py:8-60 (golden entities/edges from a tiny fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _names(nodes, label):
    return {
        r["name"]
        for r in nodes.filter(F.array_contains("labels", label)).collect()
    }


def test_entities(fixture_graph):
    nodes, _ = fixture_graph
    assert "Task" in _names(nodes, "Class")
    funcs = _names(nodes, "Function")
    assert {"log", "__init__", "abort"} <= funcs
    # builtins referenced become callable nodes (reference test_py_analyzer.py:55-59)
    assert "print" in funcs


def test_entity_spans_and_doc(fixture_graph):
    nodes, _ = fixture_graph
    task = nodes.filter(F.col("name") == "Task").collect()[0]
    assert task["src_start"] == 5  # 0-based rows, FIXTURES.md
    assert task["doc"] == "A unit of work."


def test_defines_edges(fixture_graph):
    nodes, edges = fixture_graph
    id2name = {r["id"]: r["name"] for r in nodes.collect()}
    defines = {
        (id2name[r["src"]], id2name[r["dst"]])
        for r in edges.filter(F.col("type") == "DEFINES").collect()
    }
    assert ("src.py", "log") in defines
    assert ("src.py", "Task") in defines
    assert ("Task", "__init__") in defines
    assert ("Task", "abort") in defines


def test_calls_edges_with_props(fixture_graph):
    nodes, edges = fixture_graph
    id2name = {r["id"]: r["name"] for r in nodes.collect()}
    calls = {
        (id2name[r["src"]], id2name[r["dst"]]): r["props"]
        for r in edges.filter(F.col("type") == "CALLS").collect()
    }
    assert ("abort", "log") in calls
    assert ("log", "print") in calls
    assert ("__init__", "print") in calls
    props = calls[("abort", "log")]
    assert props["line"] == "13" and "log(" in props["text"]


def test_param_return_edges(fixture_graph):
    nodes, edges = fixture_graph
    id2name = {r["id"]: r["name"] for r in nodes.collect()}
    params = {
        (id2name[r["src"]], id2name[r["dst"]])
        for r in edges.filter(F.col("type") == "PARAMETERS").collect()
    }
    returns = {
        (id2name[r["src"]], id2name[r["dst"]])
        for r in edges.filter(F.col("type") == "RETURNS").collect()
    }
    assert ("log", "str") in params
    assert ("abort", "float") in params
    assert ("abort", "Task") in returns  # resolved to the Class entity
    assert ("log", "None") in returns
