"""End-to-end git time travel over a 4-commit fixture repo — parity with
the reference's tests/test_git_history.py:73-226: analyze at HEAD, then
switch_commit walks backward/forward/multi-hop with DERIVED direction and
path, asserting the file/entity set at every stop."""

from __future__ import annotations

import subprocess

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.graph.model import PropertyGraph
from code_graph_backend_spark.service import CodeGraphService


def _commit(repo, msg, env_date):
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", msg],
        cwd=repo, check=True,
        env={"GIT_AUTHOR_DATE": env_date, "GIT_COMMITTER_DATE": env_date,
             "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, check=True,
        capture_output=True, text=True,
    ).stdout.strip()


@pytest.fixture(scope="module")
def history_svc(spark, tmp_path_factory):
    """4-commit chain:
    c0: a.py {f1}
    c1: a.py {f1, f2}            (modified)
    c2: + b.py {g}, c.py {h→g}   (added)
    c3: - b.py, c.py {h→f1}      (deleted + modified)
    """
    root = tmp_path_factory.mktemp("graphs")
    repo = tmp_path_factory.mktemp("repo4")
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)

    (repo / "a.py").write_text("def f1():\n    return 1\n")
    c0 = _commit(repo, "c0", "2024-01-01T10:00:00")
    (repo / "a.py").write_text("def f1():\n    return 1\n\ndef f2():\n    return f1()\n")
    c1 = _commit(repo, "c1", "2024-01-02T10:00:00")
    (repo / "b.py").write_text("def g():\n    return 2\n")
    (repo / "c.py").write_text("def h():\n    return g()\n")
    c2 = _commit(repo, "c2", "2024-01-03T10:00:00")
    (repo / "b.py").unlink()
    (repo / "c.py").write_text("def h():\n    return f1()\n")
    c3 = _commit(repo, "c3", "2024-01-04T10:00:00")

    svc = CodeGraphService(spark, str(root))
    svc.analyze_repo(str(repo), "hist")
    return svc, [c0, c1, c2, c3]


def _files(svc):
    g = PropertyGraph.load(svc.spark, svc.root, "hist")
    return {
        r["name"]
        for r in g.nodes.filter(F.array_contains("labels", "File")).collect()
    }


def _functions(svc):
    g = PropertyGraph.load(svc.spark, svc.root, "hist")
    return {
        r["name"]
        for r in g.nodes.filter(
            F.array_contains("labels", "Function") & (F.col("path") != "")
        ).collect()
    }


EXPECT_FILES = [
    {"a.py"},
    {"a.py"},
    {"a.py", "b.py", "c.py"},
    {"a.py", "c.py"},
]
EXPECT_FUNCS = [
    {"f1"},
    {"f1", "f2"},
    {"f1", "f2", "g", "h"},
    {"f1", "f2", "h"},
]


def test_head_state(history_svc):
    svc, c = history_svc
    assert svc.repo_info("hist")["commit"] == c[3]
    assert _files(svc) == EXPECT_FILES[3]
    assert _functions(svc) == EXPECT_FUNCS[3]


def test_commit_graph_edges(history_svc):
    """PARENT/CHILD chain persisted on the _git graph (reference
    git_graph.py:99-141)."""
    svc, c = history_svc
    gg = PropertyGraph.load(svc.spark, svc.root, "hist_git")
    assert gg.nodes.filter(F.array_contains("labels", "Commit")).count() == 4
    by_type = {r["type"]: r["cnt"] for r in
               gg.edges.groupBy("type").agg(F.count("*").alias("cnt")).collect()}
    assert by_type == {"PARENT": 3, "CHILD": 3}


def test_switch_backward_multi_hop_and_forward(history_svc):
    """HEAD → c0 (3 hops back), then c0 → c2 (2 hops forward), then back
    to HEAD — every stop matches the commit's file/function set, with
    direction and path derived from commit dates (git_utils.py:309-320)."""
    svc, c = history_svc

    out = svc.switch_commit("hist", c[0])
    assert out["commit"] == c[0]
    assert svc.repo_info("hist")["commit"] == c[0]
    assert _files(svc) == EXPECT_FILES[0]
    assert _functions(svc) == EXPECT_FUNCS[0]

    svc.switch_commit("hist", c[2])
    assert _files(svc) == EXPECT_FILES[2]
    assert _functions(svc) == EXPECT_FUNCS[2]
    # the CALLS edge h→g from c2's analysis exists after replay
    g = PropertyGraph.load(svc.spark, svc.root, "hist")
    ids = {r["name"]: r["id"] for r in g.nodes.filter(F.col("path") != "").collect()}
    calls = {(r["src"], r["dst"]) for r in
             g.edges.filter(F.col("type") == "CALLS").collect()}
    assert (ids["h"], ids["g"]) in calls

    svc.switch_commit("hist", c[3])
    assert _files(svc) == EXPECT_FILES[3]
    assert _functions(svc) == EXPECT_FUNCS[3]


def test_switch_noop_same_commit(history_svc):
    svc, c = history_svc
    cur = svc.repo_info("hist")["commit"]
    out = svc.switch_commit("hist", cur)
    assert out["commit"] == cur


def test_info_store_survives_service_restart(history_svc):
    """The side store is parquet under the root, not process memory
    (reference keeps it in Redis, api/info.py:9-88)."""
    svc, c = history_svc
    fresh = CodeGraphService(svc.spark, svc.root)
    assert fresh.repo_info("hist")["commit"] == svc.repo_info("hist")["commit"]
    assert fresh.repo_info("hist")["repo_url"]


def test_switch_commit_unknown_hash_rejected(history_svc):
    """X4 read path: the hash-range point probe rejects unknown commits
    before any replay work (reference git_graph.py:69-85)."""
    svc, _ = history_svc
    with pytest.raises(ValueError, match="unknown commit"):
        svc.switch_commit("hist", "f" * 40)
