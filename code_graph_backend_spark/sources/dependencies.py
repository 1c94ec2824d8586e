"""S3: dependency-injection scan — extra source roots per language.

Reference behavior:
- Python (api/analyzers/python/analyzer.py:21-37): create a venv, pip/
  poetry-install, then rglob `site-packages/<declared-package>/*.py` for
  every dependency declared in requirements.txt / pyproject.toml.
- Java (api/analyzers/java/analyzer.py:22-38): parse pom.xml dependencies,
  copy the `-sources.jar` from the local ~/.m2 repository, unzip it under
  `{repo}/temp_deps/`, and add the extracted `*.java` files.
- C# (api/analyzers/csharp/analyzer.py:26-30): `dotnet restore` when a
  csproj/sln exists.

This implementation separates DISCOVERY (pure: read manifests, locate
already-materialized artifacts, extract jars with zipfile) from
INSTALLATION (subprocess `pip install` / `dotnet restore` — network-bound,
gated behind `install=True` and tool availability, off by default so the
pipeline is hermetic). The returned roots feed the same S1 binaryFile scan
as the repo tree itself — dependency sources are just more files.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import zipfile
from pathlib import Path


def _declared_python_packages(repo: Path) -> list[str]:
    """Dependency names from requirements.txt and/or pyproject.toml
    ([tool.poetry.dependencies] + [project] dependencies)."""
    pkgs: list[str] = []
    req = repo / "requirements.txt"
    if req.is_file():
        for line in req.read_text().splitlines():
            line = line.strip()
            if line and not line.startswith(("#", "-")):
                pkgs.append(re.split(r"[=<>!~\[; ]", line, 1)[0])
    pyproject = repo / "pyproject.toml"
    if pyproject.is_file():
        try:
            import tomllib

            data = tomllib.loads(pyproject.read_text())
        except Exception:
            data = {}
        poetry = data.get("tool", {}).get("poetry", {}).get("dependencies", {})
        pkgs.extend(k for k in poetry if k.lower() != "python")
        for spec in data.get("project", {}).get("dependencies", []):
            pkgs.append(re.split(r"[=<>!~\[; ]", spec, 1)[0])
    return sorted({p.replace("-", "_") for p in pkgs if p})


def python_dependency_roots(repo_path: str, install: bool = False) -> list[str]:
    """Site-packages directories of the repo's DECLARED dependencies.

    With install=True (and network), creates `{repo}/venv` and pip-installs
    first — the reference's flow; by default only discovers packages already
    materialized in an existing venv."""
    repo = Path(repo_path)
    pkgs = _declared_python_packages(repo)
    if not pkgs:
        return []
    if install and not (repo / "venv").is_dir() and shutil.which("pip"):
        subprocess.run(["python3", "-m", "venv", "venv"], cwd=repo_path, check=False)
        req = repo / "requirements.txt"
        if req.is_file():
            subprocess.run(
                ["pip", "install", "-r", "requirements.txt"],
                cwd=repo_path, check=False,
                env={**os.environ, "VIRTUAL_ENV": f"{repo_path}/venv",
                     "PATH": f"{repo_path}/venv/bin:{os.environ['PATH']}"},
            )
    roots = []
    for pkg in pkgs:
        roots.extend(
            str(d) for d in (repo / "venv").glob(f"lib/**/site-packages/{pkg}")
            if d.is_dir()
        )
    return sorted(roots)


def java_dependency_roots(repo_path: str, m2_root: str | None = None) -> list[str]:
    """Extract `-sources.jar` of every pom.xml dependency found in the local
    maven repository into `{repo}/temp_deps/`, returning the extraction
    dirs (reference java/analyzer.py:22-38, zipfile instead of subprocess
    unzip)."""
    repo = Path(repo_path)
    pom = repo / "pom.xml"
    if not pom.is_file():
        return []
    from xml.etree import ElementTree

    m2 = Path(m2_root or Path.home() / ".m2" / "repository")
    ns = "{http://maven.apache.org/POM/4.0.0}"
    try:
        tree = ElementTree.parse(str(pom))
    except ElementTree.ParseError:
        return []
    roots = []
    for dep in tree.findall(f".//{ns}dependency"):
        gid = dep.find(f"{ns}groupId")
        aid = dep.find(f"{ns}artifactId")
        ver = dep.find(f"{ns}version")
        if gid is None or aid is None or ver is None:
            continue
        g, a, v = gid.text.replace(".", "/"), aid.text, ver.text
        jar = m2 / g / a / v / f"{a}-{v}-sources.jar"
        if not jar.is_file():
            continue
        out = repo / "temp_deps" / f"{a}-{v}"
        if not out.is_dir():
            out.mkdir(parents=True, exist_ok=True)
            with zipfile.ZipFile(jar) as zf:
                zf.extractall(out)
        roots.append(str(out))
    return sorted(roots)


def dotnet_restore(repo_path: str) -> bool:
    """`dotnet restore` when a csproj/sln exists AND the CLI is available
    (reference csharp/analyzer.py:26-30). Returns whether it ran."""
    repo = Path(repo_path)
    has_proj = any(repo.glob("*.csproj")) or any(repo.glob("*.sln"))
    if not has_proj or shutil.which("dotnet") is None:
        return False
    subprocess.run(["dotnet", "restore"], cwd=repo_path, check=False)
    return True


def add_dependency_sources(repo_path: str, install: bool = False) -> list[str]:
    """All extra source roots for a repo — the per-language S3 dispatch
    (reference source_analyzer.py first-pass add_dependencies call)."""
    roots = python_dependency_roots(repo_path, install=install)
    roots += java_dependency_roots(repo_path)
    dotnet_restore(repo_path)
    return roots
