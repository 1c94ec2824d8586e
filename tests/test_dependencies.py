"""S3 dependency-injection scan (reference python/analyzer.py:21-37,
java/analyzer.py:22-38, csharp/analyzer.py:26-30): declared-deps discovery,
maven sources-jar extraction, dotnet gating, and the analyze_folder wiring
(dependency entities land in the graph; undeclared venv content does not)."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.sources.dependencies import (
    add_dependency_sources,
    dotnet_restore,
    java_dependency_roots,
    python_dependency_roots,
)


@pytest.fixture()
def py_repo(tmp_path):
    repo = tmp_path / "repo"
    sp = repo / "venv" / "lib" / "python3.11" / "site-packages"
    (sp / "declared_pkg").mkdir(parents=True)
    (sp / "declared_pkg" / "mod.py").write_text("def dep_fn():\n    return 7\n")
    (sp / "undeclared_pkg").mkdir(parents=True)
    (sp / "undeclared_pkg" / "x.py").write_text("def sneaky():\n    pass\n")
    (repo / "requirements.txt").write_text("declared-pkg==1.0\n# comment\n")
    (repo / "app.py").write_text("def app():\n    return dep_fn()\n")
    return repo


def test_python_declared_deps_only(py_repo):
    roots = python_dependency_roots(str(py_repo))
    assert len(roots) == 1 and roots[0].endswith("site-packages/declared_pkg")


def test_python_no_manifest_no_roots(tmp_path):
    assert python_dependency_roots(str(tmp_path)) == []


def test_java_sources_jar_extraction(tmp_path):
    repo = tmp_path / "jrepo"
    repo.mkdir()
    (repo / "pom.xml").write_text("""<?xml version="1.0"?>
<project xmlns="http://maven.apache.org/POM/4.0.0">
  <dependencies>
    <dependency>
      <groupId>com.example</groupId>
      <artifactId>dep-lib</artifactId>
      <version>1.2</version>
    </dependency>
  </dependencies>
</project>""")
    m2 = tmp_path / "m2"
    jar_dir = m2 / "com" / "example" / "dep-lib" / "1.2"
    jar_dir.mkdir(parents=True)
    with zipfile.ZipFile(jar_dir / "dep-lib-1.2-sources.jar", "w") as zf:
        zf.writestr("com/example/DepUtil.java",
                    "public class DepUtil {\n    public void util() {\n    }\n}\n")
    roots = java_dependency_roots(str(repo), m2_root=str(m2))
    assert len(roots) == 1 and roots[0].endswith("temp_deps/dep-lib-1.2")
    assert (repo / "temp_deps" / "dep-lib-1.2" / "com" / "example" / "DepUtil.java").is_file()
    # idempotent: second call reuses the extraction
    assert java_dependency_roots(str(repo), m2_root=str(m2)) == roots


def test_java_missing_jar_is_skipped(tmp_path):
    repo = tmp_path / "jrepo2"
    repo.mkdir()
    (repo / "pom.xml").write_text("""<?xml version="1.0"?>
<project xmlns="http://maven.apache.org/POM/4.0.0">
  <dependencies><dependency>
    <groupId>a</groupId><artifactId>b</artifactId><version>9</version>
  </dependency></dependencies>
</project>""")
    assert java_dependency_roots(str(repo), m2_root=str(tmp_path / "empty_m2")) == []


def test_dotnet_gated_on_availability(tmp_path):
    (tmp_path / "App.csproj").write_text("<Project/>")
    ran = dotnet_restore(str(tmp_path))
    import shutil
    assert ran == (shutil.which("dotnet") is not None)


def test_analyze_folder_includes_declared_deps(spark, py_repo, tmp_path):
    from code_graph_backend_spark.service import CodeGraphService

    svc = CodeGraphService(spark, str(tmp_path / "groot"))
    svc.analyze_folder(str(py_repo), "withdeps")
    from code_graph_backend_spark.graph.model import PropertyGraph

    g = PropertyGraph.load(spark, svc.root, "withdeps")
    names = {r["name"] for r in g.nodes.filter(F.col("path") != "").collect()}
    assert "dep_fn" in names       # declared dependency analyzed
    assert "app" in names          # repo tree analyzed
    assert "sneaky" not in names   # undeclared venv content ignored
    # the call app() -> dep_fn() resolves across the dependency boundary
    ids = {r["name"]: r["id"] for r in g.nodes.filter(F.col("path") != "").collect()}
    calls = {(r["src"], r["dst"]) for r in g.edges.filter(F.col("type") == "CALLS").collect()}
    assert (ids["app"], ids["dep_fn"]) in calls


def test_add_dependency_sources_dispatch(py_repo):
    roots = add_dependency_sources(str(py_repo))
    assert any(r.endswith("declared_pkg") for r in roots)
