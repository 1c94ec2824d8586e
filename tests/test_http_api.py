"""HTTP-shell tests: all 11 reference routes through the Flask test client
(reference tests/endpoints/* run against a live server; same shapes here
against the local fixture repo). Auth parity: Authorization header must
match $SECRET_TOKEN; mutating routes also need $CODE_GRAPH_PUBLIC=1
(reference api/index.py:26-51)."""

from __future__ import annotations

import subprocess

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.graph.model import PropertyGraph
from code_graph_backend_spark.service import CodeGraphService
from code_graph_backend_spark.service.http import create_app

SRC = '''\
def low(x: int) -> int:
    return x + 1

def mid(x: int) -> int:
    return low(x) * 2

def top(x: int) -> int:
    return mid(low(x))
'''


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("graphs")
    repo = tmp_path_factory.mktemp("httprepo")
    (repo / "main.py").write_text(SRC)
    for cmd in (
        ["git", "init", "-q"],
        ["git", "add", "."],
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "init"],
    ):
        subprocess.run(cmd, cwd=repo, check=True)
    svc = CodeGraphService(spark, str(root))
    svc.analyze_repo(str(repo), "httpfix")
    app = create_app(svc)
    app.config["TESTING"] = True
    return app.test_client(), svc, str(repo)


@pytest.fixture(autouse=True)
def _public(monkeypatch):
    monkeypatch.setenv("CODE_GRAPH_PUBLIC", "1")
    monkeypatch.delenv("SECRET_TOKEN", raising=False)


def test_list_repos(ctx):
    client, _, _ = ctx
    r = client.get("/list_repos")
    assert r.status_code == 200
    assert r.get_json() == {"status": "success", "repositories": ["httpfix"]}


def test_repo_info(ctx):
    client, _, _ = ctx
    r = client.post("/repo_info", json={"repo": "httpfix"})
    info = r.get_json()["info"]
    assert r.status_code == 200 and info["node_count"] > 0 and "commit" in info
    assert client.post("/repo_info", json={}).status_code == 400
    assert client.post("/repo_info", json={"repo": "nope"}).status_code == 400


def test_graph_entities(ctx):
    client, _, _ = ctx
    r = client.get("/graph_entities", query_string={"repo": "httpfix"})
    ents = r.get_json()["entities"]
    assert r.status_code == 200 and len(ents["nodes"]) > 0
    assert client.get("/graph_entities").status_code == 400


def test_get_neighbors(ctx):
    client, svc, _ = ctx
    g = PropertyGraph.load(svc.spark, svc.root, "httpfix")
    mid_id = g.nodes.filter(F.col("name") == "mid").collect()[0]["id"]
    r = client.post("/get_neighbors", json={"repo": "httpfix", "node_ids": [mid_id]})
    assert r.status_code == 200
    assert "low" in {n["name"] for n in r.get_json()["neighbors"]}
    assert client.post("/get_neighbors", json={"repo": "httpfix"}).status_code == 400


def test_auto_complete(ctx):
    client, _, _ = ctx
    r = client.post("/auto_complete", json={"repo": "httpfix", "prefix": "lo"})
    comps = r.get_json()["completions"]
    assert r.status_code == 200 and comps
    assert all(c["name"].startswith("lo") for c in comps)


def test_find_paths(ctx):
    client, svc, _ = ctx
    g = PropertyGraph.load(svc.spark, svc.root, "httpfix")
    ids = {r["name"]: r["id"] for r in g.nodes.filter(
        F.col("name").isin(["top", "low"])).collect()}
    r = client.post("/find_paths",
                    json={"repo": "httpfix", "src": ids["top"], "dest": ids["low"]})
    paths = r.get_json()["paths"]
    assert r.status_code == 200 and paths
    for p in paths:  # reference invariants: odd length, endpoints match
        assert len(p) % 2 == 1
        assert p[0]["id"] == ids["top"] and p[-1]["id"] == ids["low"]
    assert client.post(
        "/find_paths", json={"repo": "httpfix", "src": "x", "dest": 1}
    ).status_code == 400


def test_chat(ctx):
    client, _, _ = ctx
    r = client.post("/chat", json={"repo": "httpfix", "msg": "how many files are there"})
    assert r.status_code == 200
    assert r.get_json()["response"]["answer"] == 1


def test_list_commits(ctx):
    client, _, _ = ctx
    r = client.post("/list_commits", json={"repo": "httpfix"})
    commits = r.get_json()["commits"]
    assert r.status_code == 200 and len(commits) == 1


def test_analyze_folder_and_repo(ctx, tmp_path):
    client, _, repo_path = ctx
    d = tmp_path / "af"
    d.mkdir()
    (d / "x.py").write_text("def solo():\n    return 0\n")
    r = client.post("/analyze_folder", json={"path": str(d)})
    assert r.status_code == 200 and r.get_json()["project"] == "af"
    assert client.post("/analyze_folder", json={"path": "/nope"}).status_code == 400
    # re-analyze the fixture repo via the public route
    r = client.post("/analyze_repo", json={"repo_url": repo_path})
    assert r.status_code == 200 and r.get_json() == {"status": "success"}


def test_switch_commit_roundtrip(ctx):
    client, svc, _ = ctx
    head = svc._info.get("httpfix")["commit"]
    r = client.post("/switch_commit", json={"repo": "httpfix", "commit": head})
    assert r.status_code == 200


def test_token_auth(ctx, monkeypatch):
    client, _, _ = ctx
    monkeypatch.setenv("SECRET_TOKEN", "sekrit")
    assert client.get("/list_repos").status_code == 401
    assert client.get("/list_repos", headers={"Authorization": "wrong"}).status_code == 401
    assert client.get("/list_repos", headers={"Authorization": "sekrit"}).status_code == 200


def test_public_gate(ctx, monkeypatch):
    client, _, _ = ctx
    monkeypatch.setenv("CODE_GRAPH_PUBLIC", "0")
    assert client.post("/list_commits", json={"repo": "httpfix"}).status_code == 401


def test_analyze_folder_threads_ignore(ctx, tmp_path):
    """/analyze_folder must pass the caller's ignore list through to the
    scan (reference analyzer.analyze_local_folder(path, g, ignore)) —
    previously validated but dropped (ADVICE r3)."""
    client, svc, _ = ctx
    d = tmp_path / "ign"
    (d / "keep").mkdir(parents=True)
    (d / "skipme").mkdir()
    (d / "keep" / "a.py").write_text("def kept():\n    return 1\n")
    (d / "skipme" / "b.py").write_text("def dropped():\n    return 2\n")
    r = client.post("/analyze_folder",
                    json={"path": str(d), "ignore": ["/skipme/"]})
    assert r.status_code == 200
    g = PropertyGraph.load(svc.spark, svc.root, "ign")
    paths = {row["path"] for row in
             g.nodes.filter(F.array_contains("labels", "File")).collect()}
    assert any("a.py" in p for p in paths)
    assert not any("b.py" in p for p in paths)


def test_analyze_repo_file_url_and_bare(ctx, tmp_path):
    """/analyze_repo accepts file:// URLs and local bare repos by cloning
    first (reference api/project.py:19-61 clones every URL; network is the
    one divergence this sandbox can't exercise)."""
    client, svc, _ = ctx
    src = tmp_path / "urlrepo"
    src.mkdir()
    (src / "m.py").write_text("def fn():\n    return 1\n")
    for cmd in (
        ["git", "init", "-q"],
        ["git", "add", "."],
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "i"],
    ):
        subprocess.run(cmd, cwd=src, check=True)
    # file:// URL
    r = client.post("/analyze_repo", json={"repo_url": f"file://{src}"})
    assert r.status_code == 200 and r.get_json() == {"status": "success"}
    g = PropertyGraph.load(svc.spark, svc.root, "urlrepo")
    assert g.nodes.filter(F.col("name") == "fn").count() == 1
    # bare repo (name derives by stripping .git)
    bare = tmp_path / "barerepo.git"
    subprocess.run(["git", "clone", "-q", "--bare", str(src), str(bare)],
                   check=True)
    r = client.post("/analyze_repo", json={"repo_url": str(bare)})
    assert r.status_code == 200
    g2 = PropertyGraph.load(svc.spark, svc.root, "barerepo")
    assert g2.nodes.filter(F.col("name") == "fn").count() == 1
