"""MERGE semantics, cascade delete, op-log time travel (SURVEY §2.9, §1.5).

The op-log test reproduces the reference's 4-commit fixture contract
(FIXTURES.md §2): replaying HEAD→X→HEAD yields the exact file set of each
commit, both directions, multi-hop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.graph.model import NODES_SCHEMA, PropertyGraph
from code_graph_backend_spark.mutations import OpLog, cascade_delete, merge_nodes
from code_graph_backend_spark.mutations.merge import set_props_by_id


def _nodes(spark, rows):
    return spark.createDataFrame(
        [
            (i, ["File", "Searchable"], n, p, None, None, None, None, pr, None)
            for (i, n, p, pr) in rows
        ],
        NODES_SCHEMA,
    )


def test_merge_update_insert_and_metrics(spark):
    existing = _nodes(spark, [(1, "a.py", "/r", {"k": "1"}), (2, "b.py", "/r", None)])
    batch = _nodes(spark, [(2, "b2.py", "/r", {"x": "9"}), (3, "c.py", "/r", None)])
    merged, m = merge_nodes(existing, batch, key=("id",), with_metrics=True)
    rows = {r["id"]: r for r in merged.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["name"] == "b2.py" and rows[2]["props"] == {"x": "9"}
    assert rows[1]["props"] == {"k": "1"}
    assert (m.rows_matched, m.rows_inserted) == (1, 1)


def test_merge_props_map_merge(spark):
    existing = _nodes(spark, [(1, "a.py", "/r", {"k": "1", "keep": "y"})])
    batch = _nodes(spark, [(1, "a.py", "/r", {"k": "2", "new": "n"})])
    merged = merge_nodes(existing, batch, key=("id",))
    props = merged.collect()[0]["props"]
    assert props == {"k": "2", "keep": "y", "new": "n"}  # += semantics


def test_set_props_by_id(spark):
    nodes = _nodes(spark, [(1, "a.py", "/r", {"k": "1"}), (2, "b.py", "/r", None)])
    updates = spark.createDataFrame(
        [(1, {"cov": "0.5"})], "id long, props map<string,string>"
    )
    out = {r["id"]: r["props"] for r in set_props_by_id(nodes, updates).collect()}
    assert out[1] == {"k": "1", "cov": "0.5"}
    assert out[2] is None


def test_cascade_delete(spark):
    nodes = _nodes(
        spark,
        [(i, f"n{i}", "/r", None) for i in range(1, 7)],
    )
    edges = spark.createDataFrame(
        [(1, 2, "DEFINES", None), (2, 3, "DEFINES", None), (4, 5, "DEFINES", None),
         (6, 2, "CALLS", None)],
        "src long, dst long, type string, props map<string,string>",
    )
    nodes2, edges2 = cascade_delete(spark, nodes, edges, [1], edge_type="DEFINES")
    assert {r["id"] for r in nodes2.collect()} == {4, 5, 6}
    # edges touching deleted nodes are gone, incl. the incoming CALLS
    assert {(r["src"], r["dst"]) for r in edges2.collect()} == {(4, 5)}


# ---------------------------------------------------------------------------
# op-log time travel over the golden 4-commit chain (FIXTURES.md §2)
# ---------------------------------------------------------------------------

COMMITS = ["fac1698", "c4332d0", "5ec6b14", "df8d021"]
# file sets per commit: a.py | a.py | a.py b.py c.py | a.py c.py
EXPECT = {
    "fac1698": {"a.py"},
    "c4332d0": {"a.py"},
    "5ec6b14": {"a.py", "b.py", "c.py"},
    "df8d021": {"a.py", "c.py"},
}


def _file_row(name, ver=""):
    return {
        "id": hash(name) % 10_000,
        "labels": ["File", "Searchable"],
        "name": name,
        "path": "/r",
        "props": {"ver": ver} if ver else None,
    }


@pytest.fixture()
def oplog_world(spark):
    """Build the op-log for the golden chain in both directions."""
    log = OpLog()
    # forward transitions (CHILD direction)
    log.record("fac1698", "c4332d0", "merge_nodes", {"rows": [_file_row("a.py", "v2")]})
    log.record("c4332d0", "5ec6b14", "merge_nodes",
               {"rows": [_file_row("b.py"), _file_row("c.py")]})
    log.record("5ec6b14", "df8d021", "delete_cascade",
               {"ids": [_file_row("b.py")["id"]], "edge_type": "DEFINES"})
    # backward transitions (PARENT direction)
    log.record("df8d021", "5ec6b14", "merge_nodes", {"rows": [_file_row("b.py")]})
    log.record("5ec6b14", "c4332d0", "delete_cascade",
               {"ids": [_file_row("b.py")["id"], _file_row("c.py")["id"]],
                "edge_type": "DEFINES"})
    log.record("c4332d0", "fac1698", "merge_nodes", {"rows": [_file_row("a.py", "v1")]})

    head = PropertyGraph(spark, "repo")
    head.nodes = spark.createDataFrame(
        [(hash(n) % 10_000, ["File", "Searchable"], n, "/r", None, None, None, None, None, None)
         for n in EXPECT["df8d021"]],
        NODES_SCHEMA,
    )
    return log, head


def _files(g):
    return {r["name"] for r in g.nodes.collect()}


def test_replay_backward_single_hop(spark, oplog_world):
    log, head = oplog_world
    g = log.replay_path(head, ["df8d021", "5ec6b14"])
    assert _files(g) == EXPECT["5ec6b14"]


def test_replay_backward_multi_hop_and_return(spark, oplog_world):
    log, head = oplog_world
    g = log.replay_path(head, ["df8d021", "5ec6b14", "c4332d0", "fac1698"])
    assert _files(g) == EXPECT["fac1698"]
    g = log.replay_path(g, ["fac1698", "c4332d0", "5ec6b14", "df8d021"])
    assert _files(g) == EXPECT["df8d021"]


def test_replay_is_change_gated(spark, oplog_world):
    """Mirrors the reference's counter-gated backlog: merge metrics expose
    whether anything changed (api/graph.py:152-169)."""
    log, head = oplog_world
    batch = head.nodes.limit(0)
    merged, m = merge_nodes(head.nodes, batch, key=("id",), with_metrics=True)
    assert not m.changed


def test_merge_edges_null_pos_idempotent(spark):
    """Edges whose props lack 'pos' have null _pos on both sides of the
    with_pos merge key; eqNullSafe must match them so re-merging the same
    batch is idempotent (no duplicates)."""
    from code_graph_backend_spark.mutations.merge import merge_edges

    schema = "src long, dst long, type string, props map<string,string>"
    existing = spark.createDataFrame(
        [(1, 2, "CALLS", {"pos": "7"}), (1, 3, "DEFINES", {})], schema
    )
    batch = spark.createDataFrame(
        [(1, 2, "CALLS", {"pos": "7"}), (1, 3, "DEFINES", {"x": "1"})], schema
    )
    once = merge_edges(existing, batch, with_pos=True)
    assert once.count() == 2
    twice = merge_edges(once, batch, with_pos=True)
    assert twice.count() == 2  # re-merge upserts, never duplicates
    props = {(r["src"], r["dst"]): r["props"] for r in twice.collect()}
    assert props[(1, 3)].get("x") == "1"


def test_oplog_coalesces_consecutive_merges(spark):
    """Consecutive same-op merge entries within a hop replay as ONE batch
    (cost per hop, not per logged batch); interleaved deletes keep their
    position so ordering semantics are unchanged."""
    from code_graph_backend_spark.mutations.oplog import OpLog

    log = OpLog()
    log.record("a", "b", "merge_nodes", {"rows": [{"id": 1, "labels": ["X"]}]})
    log.record("a", "b", "merge_nodes", {"rows": [{"id": 2, "labels": ["X"]}]})
    log.record("a", "b", "delete_edges", {"rows": []})
    log.record("a", "b", "merge_nodes", {"rows": [{"id": 3, "labels": ["X"]}]})
    out = log._coalesced(log.transitions("a", "b"))
    assert [e.op for e in out] == ["merge_nodes", "delete_edges", "merge_nodes"]
    import json as _json
    assert [r["id"] for r in _json.loads(out[0].params_json)["rows"]] == [1, 2]


def test_oplog_coalesce_dedups_shared_keys(spark):
    """Two coalesced per-file batches touching the SAME node id (e.g. a
    shared external-symbol node) must fold into one row per key with
    sequential-replay semantics: later non-null field wins, props maps
    merge with later keys winning (ADVICE r3: the full_outer MERGE emits
    one output row per duplicate batch key, so un-deduped coalescing
    duplicates nodes and loses last-write-wins)."""
    import json as _json

    from code_graph_backend_spark.mutations.oplog import OpLog

    log = OpLog()
    log.record("a", "b", "merge_nodes",
               {"rows": [{"id": 1, "labels": ["X"], "name": "old",
                          "props": {"k": "1", "keep": "y"}},
                         {"id": 2, "labels": ["X"], "name": "two"}]})
    log.record("a", "b", "merge_nodes",
               {"rows": [{"id": 1, "labels": ["X"], "name": "new",
                          "props": {"k": "2"}}]})
    out = log._coalesced(log.transitions("a", "b"))
    assert len(out) == 1
    rows = {r["id"]: r for r in _json.loads(out[0].params_json)["rows"]}
    assert set(rows) == {1, 2}
    assert rows[1]["name"] == "new"                      # last write wins
    assert rows[1]["props"] == {"k": "2", "keep": "y"}   # map-merged
    # end-to-end: replaying the coalesced batch yields ONE node row for id 1
    from code_graph_backend_spark.graph.model import NODES_SCHEMA, PropertyGraph

    g = PropertyGraph(spark, "repo")
    g.nodes = spark.createDataFrame([], NODES_SCHEMA)
    g = log.replay_path(g, ["a", "b"])
    got = g.nodes.filter("id = 1").collect()
    assert len(got) == 1
    assert got[0]["name"] == "new"


def test_oplog_coalesce_dedups_edge_keys(spark):
    """Edge coalescing folds duplicate (src, dst, type) keys the same way."""
    import json as _json

    from code_graph_backend_spark.mutations.oplog import OpLog

    log = OpLog()
    log.record("a", "b", "merge_edges",
               {"rows": [{"src": 1, "dst": 2, "type": "CALLS", "props": {"pos": "3"}}]})
    log.record("a", "b", "merge_edges",
               {"rows": [{"src": 1, "dst": 2, "type": "CALLS", "props": {"pos": "9"}},
                         {"src": 1, "dst": 3, "type": "CALLS", "props": None}]})
    out = log._coalesced(log.transitions("a", "b"))
    assert len(out) == 1
    rows = _json.loads(out[0].params_json)["rows"]
    keyed = {(r["src"], r["dst"], r["type"]): r for r in rows}
    assert len(rows) == 2
    assert keyed[(1, 2, "CALLS")]["props"] == {"pos": "9"}
