"""Tier-4 endpoint tests (reference tests/endpoints/*), on a local fixture
repo instead of a live GitHub clone. Invariant-style assertions mirror the
reference: path odd-length/endpoints (test_find_paths.py:76-80), prefix
property (test_auto_complete.py:49-50), exact repo lists
(test_list_repos.py:29-54)."""

from __future__ import annotations

import subprocess

import pytest

from code_graph_backend_spark.service import CodeGraphService

SRC = '''\
def low(x: int) -> int:
    return x + 1

def mid(x: int) -> int:
    return low(x) * 2

def top(x: int) -> int:
    return mid(low(x))

class Helper:
    def run(self):
        return top(1)
'''


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("graphs")
    repo = tmp_path_factory.mktemp("repo")
    (repo / "main.py").write_text(SRC)
    for cmd in (
        ["git", "init", "-q"],
        ["git", "add", "."],
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "init"],
    ):
        subprocess.run(cmd, cwd=repo, check=True)
    s = CodeGraphService(spark, str(root))
    s.analyze_repo(str(repo), "fixture")
    return s


def test_list_repos_hides_git_graphs(svc):
    assert svc.list_repos() == ["fixture"]


def test_repo_info_counts(svc):
    info = svc.repo_info("fixture")
    assert info["node_count"] > 0 and info["edge_count"] > 0
    assert "commit" in info


def test_graph_entities_capped(svc):
    sub = svc.graph_entities("fixture", limit=3)
    assert 0 < len(sub["nodes"]) and len(sub["edges"]) >= 0


def test_auto_complete_prefix_contract(svc):
    res = svc.auto_complete("fixture", "lo")
    assert res and all(r["name"].startswith("lo") for r in res)
    assert len(res) <= 10


def test_get_neighbors(svc, spark):
    from code_graph_backend_spark.graph.model import PropertyGraph
    from pyspark.sql import functions as F

    g = PropertyGraph.load(spark, svc.root, "fixture")
    mid_id = g.nodes.filter(F.col("name") == "mid").collect()[0]["id"]
    names = {n["name"] for n in svc.get_neighbors("fixture", [mid_id], edge_type="CALLS")}
    assert "low" in names


def test_find_paths_invariants(svc, spark):
    from code_graph_backend_spark.graph.model import PropertyGraph
    from pyspark.sql import functions as F

    g = PropertyGraph.load(spark, svc.root, "fixture")
    ids = {r["name"]: r["id"] for r in g.nodes.collect()}
    paths = svc.find_paths("fixture", ids["top"], ids["low"])
    assert paths, "top -> low is reachable via mid and directly"
    for p in paths:
        assert len(p) % 2 == 1  # interleaved node/edge/node...
        assert p[0]["id"] == ids["top"] and p[-1]["id"] == ids["low"]
    # two distinct call paths: top->low and top->mid->low
    assert {len(p) for p in paths} == {3, 5}


def test_list_commits(svc):
    commits = svc.list_commits("fixture")
    assert len(commits) == 1
    assert commits[0]["doc"] == "init"  # message


def test_chat_templates(svc):
    n = svc.chat("fixture", "how many functions are there?")["answer"]
    assert n >= 4
    unreachable = svc.chat("fixture", "which functions are unreachable?")["answer"]
    assert isinstance(unreachable, list)


def test_switch_commit_forward_and_back(svc, spark):
    """POST /switch_commit both directions (reference api/index.py:419-451 +
    git_utils.py:260-333): redo-log forward, logged inverse ops backward."""
    from code_graph_backend_spark.mutations.oplog import OpLog

    before = svc.repo_info("fixture")
    log = OpLog()
    log.record("c0", "c1", "merge_nodes", {"rows": [
        {"id": 999_001, "labels": ["Function", "Searchable"],
         "name": "added_in_c1", "path": "new.py"}]})
    log.record("c1", "c0", "delete_cascade", {"ids": [999_001], "edge_type": "DEFINES"})

    fwd = svc.switch_commit("fixture", "c1", log, ["c0", "c1"])
    assert fwd["nodes"] == before["node_count"] + 1
    assert svc.repo_info("fixture")["commit"] == "c1"

    back = svc.switch_commit("fixture", "c0", log, ["c1", "c0"])
    assert back["nodes"] == before["node_count"]
    assert svc.repo_info("fixture")["commit"] == "c0"


def test_delete_repo(svc, spark, tmp_path):
    (tmp_path / "solo.py").write_text("def f():\n    return 1\n")
    svc.analyze_folder(str(tmp_path), "doomed")
    assert "doomed" in svc.list_repos()
    svc.delete_repo("doomed")
    assert "doomed" not in svc.list_repos()


def test_encode_node_coverage_wire_name():
    """Wire parity: coverage serializes under the reference's (misspelled)
    property name coverage_precentage (api/graph.py:470-476)."""
    from pyspark.sql import Row

    from code_graph_backend_spark.service.api import _encode_node

    out = _encode_node(Row(id=1, labels=["File", "Searchable"], name="a.py",
                           coverage=0.5))
    assert out["coverage_precentage"] == 0.5
    assert "coverage" not in out
    assert out["labels"] == ["File"]
