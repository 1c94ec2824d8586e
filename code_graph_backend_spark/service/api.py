"""Service surface: the reference's 11 HTTP endpoints as typed methods
(SURVEY.md §3). Flask/HTTP is a thin shell the reference keeps outside its
query layer too — what matters for parity is request → operator → JSON-able
result, which these methods reproduce 1:1.

Result encoding mirrors api/entities/entity_encoder.py:3-24: nodes/edges as
dicts, `Searchable` stripped from labels.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

from ..graph.model import PropertyGraph
from ..operators import lookups, neighbors, search, traversal
from ..operators.aggregates import counts


class RepoInfoStore:
    """Persistent per-repo key-value side store (commit, repo_url, ...) —
    the Spark twin of the reference's Redis `{repo}_info` hash
    (api/info.py:9-88): a tiny single-file parquet table under the storage
    root (SURVEY §1.6), surviving process restarts. Rows are per-repo and
    request-sized; writes go through temp+rename so a crash never corrupts
    the table."""

    _SCHEMA = "repo string, info string"  # info = JSON dict

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "_repo_info.parquet")

    def _read_all(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        df = self.spark.read.schema(self._SCHEMA).parquet(self.path)
        return {r["repo"]: json.loads(r["info"]) for r in df.collect()}

    def _write_all(self, data: dict[str, dict]) -> None:
        rows = [(k, json.dumps(v, sort_keys=True)) for k, v in sorted(data.items())]
        df = self.spark.createDataFrame(rows, self._SCHEMA)
        tmp = self.path + "__tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def get(self, repo: str) -> dict:
        return self._read_all().get(repo, {})

    def set(self, repo: str, **kv) -> None:
        data = self._read_all()
        data.setdefault(repo, {}).update(kv)
        self._write_all(data)

    def delete(self, repo: str) -> None:
        data = self._read_all()
        if data.pop(repo, None) is not None:
            self._write_all(data)


def _encode_node(row: Row) -> dict:
    d = row.asDict(recursive=True)
    labels = [l for l in (d.get("labels") or []) if l != "Searchable"]
    out = {"id": d.get("id"), "labels": labels,
           **{k: v for k, v in d.items() if k not in ("id", "labels") and v is not None}}
    # wire-format parity: the reference exposes coverage under its
    # (misspelled) property name (api/graph.py:470-476 coverage_precentage)
    if "coverage" in out:
        out["coverage_precentage"] = out.pop("coverage")
    return out


class CodeGraphService:
    """One instance per storage root; graphs addressed by repo name
    (reference keeps one FalkorDB graph per repo, api/graph.py:35-45)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._info = RepoInfoStore(spark, root)  # persistent side-store

    # -- read endpoints ---------------------------------------------------

    def list_repos(self) -> list[str]:
        """GET /list_repos (reference api/index.py:184-203, S13)."""
        return PropertyGraph.list_graphs(self.root)

    def repo_info(self, repo: str) -> dict:
        """POST /repo_info (reference api/index.py:205-248, A1+A2+side-store)."""
        g = PropertyGraph.load(self.spark, self.root, repo)
        row = counts(g.nodes, g.edges).collect()[0]
        info = self._info.get(repo)
        return {
            "repo": repo,
            "node_count": row["node_count"],
            "edge_count": row["edge_count"],
            **info,
        }

    def graph_entities(self, repo: str, limit: int = 500) -> dict:
        """POST /graph_entities (reference api/index.py:53-94, J4+O3)."""
        g = PropertyGraph.load(self.spark, self.root, repo)
        rows = neighbors.sub_graph(g.nodes, g.edges, limit).collect()
        nodes, edges = {}, []
        for r in rows:
            nodes[r["src_id"]] = {"id": r["src_id"], "name": r["src_name"]}
            if r["edge_type"] is not None:
                nodes[r["dst_id"]] = {"id": r["dst_id"], "name": r["dst_name"]}
                edges.append({"src": r["src_id"], "dst": r["dst_id"], "type": r["edge_type"]})
        return {"nodes": list(nodes.values()), "edges": edges}

    def get_neighbors(self, repo: str, node_ids: list[int],
                      edge_type: str | None = None, label: str | None = None) -> list[dict]:
        """POST /get_neighbors (reference api/index.py:97-144, J1)."""
        g = PropertyGraph.load(self.spark, self.root, repo)
        rows = neighbors.out_neighbors(
            self.spark, g.nodes, g.edges, node_ids, edge_type, label
        ).collect()
        return [_encode_node(r) for r in rows]

    def auto_complete(self, repo: str, prefix: str) -> list[dict]:
        """POST /auto_complete (reference api/index.py:146-182, X3)."""
        g = PropertyGraph.load(self.spark, self.root, repo)
        return [_encode_node(r) for r in search.auto_complete(g.nodes, prefix).collect()]

    def find_paths(self, repo: str, src: int, dest: int, max_depth: int = 12) -> list[list]:
        """POST /find_paths (reference api/index.py:250-303, J6).

        Returns interleaved [node, edge, node, ...] dicts per path
        (reference api/graph.py:577-591); invariant: odd length, endpoints
        match src/dest (tests/endpoints/test_find_paths.py:76-80).
        """
        g = PropertyGraph.load(self.spark, self.root, repo)
        paths = traversal.find_paths(
            self.spark, g.edges, src, dest, edge_type="CALLS", max_depth=max_depth
        ).collect()
        # Collect ONLY the nodes appearing on the returned paths (bounded by
        # path count × depth), never the whole nodes table — at 100 TB the
        # full collect is a driver OOM. The IN-list filter pushes to the
        # parquet scan; result size == len(path_ids).
        path_ids = sorted({nid for p in paths for nid in p["path"]})
        node_rows = {
            r["id"]: _encode_node(r)
            for r in g.nodes.filter(F.col("id").isin(path_ids)).collect()
        } if path_ids else {}
        out = []
        for p in paths:
            ids = p["path"]
            seq: list = []
            for i, nid in enumerate(ids):
                seq.append(node_rows.get(nid, {"id": nid}))
                if i < len(ids) - 1:
                    seq.append({"src": nid, "dst": ids[i + 1], "type": "CALLS"})
            out.append(seq)
        return out

    def list_commits(self, repo: str) -> list[dict]:
        """POST /list_commits (reference api/index.py:453-489, O1)."""
        g = PropertyGraph.load(self.spark, self.root, f"{repo}_git")
        rows = (
            g.nodes.filter(F.array_contains("labels", "Commit"))
            .orderBy(F.col("props").getItem("date").cast("long"))
            .collect()
        )
        return [_encode_node(r) for r in rows]

    def chat(self, repo: str, question: str) -> dict:
        """POST /chat (reference api/index.py:305-328): text → query.

        The reference ships the ontology to an LLM that emits Cypher and
        executes it (api/llm.py:237-267). Here the GENERATION step is the
        deterministic compiler in service/chat.py (same ontology, a
        ChatPlan instead of Cypher text); execution dispatches onto the
        same public operators every endpoint uses. The returned `query` is
        the Cypher-equivalent statement, mirroring the reference's
        response shape."""
        from .chat import compile_question

        # Raw Cypher passes straight through the read front-end — the
        # reference's chat ultimately executes generated Cypher, so a user
        # pasting a template gets it run verbatim (cypher.py subset).
        stripped = question.strip()
        if stripped.upper().startswith(("MATCH", "OPTIONAL MATCH")):
            from ..cypher import CypherError

            g = PropertyGraph.load(self.spark, self.root, repo)
            try:
                rows = [r.asDict(recursive=True) for r in
                        g.cypher(stripped).limit(500).collect()]
                return {"answer": rows, "query": stripped}
            except CypherError:
                # Not (subset-)valid Cypher after all — e.g. a natural-
                # language question that happens to start with "match
                # functions defined in ...". Fall through to the
                # deterministic compiler instead of surfacing a parse
                # error for what was never meant as Cypher.
                pass

        plan = compile_question(question)
        if plan is None:
            return {"answer": None, "query": None, "error": "could not compile question"}
        g = PropertyGraph.load(self.spark, self.root, repo)
        i, a = plan.intent, plan.args

        if i == "count_label":
            ans = lookups.by_label(g.nodes, a["label"]).count()
        elif i == "count_nodes":
            ans = g.nodes.count()
        elif i == "count_edges":
            ans = g.edges.count()
        elif i == "count_commits":
            gg = PropertyGraph.load(self.spark, self.root, f"{repo}_git")
            ans = gg.nodes.filter(F.array_contains("labels", "Commit")).count()
        elif i == "unreachable":
            rows = neighbors.unreachable(
                g.nodes, g.edges, edge_type="CALLS", label=a.get("label")
            ).collect()
            ans = [_encode_node(r) for r in rows]
        elif i == "most_called":
            rows = (
                g.edges.filter(F.col("type") == "CALLS")
                .groupBy("dst").agg(F.count("*").alias("usage_count"))
                .join(g.nodes, F.col("dst") == g.nodes["id"])
                .orderBy(F.desc("usage_count"), "name")
                .limit(a["k"])
                .select("name", "usage_count")
                .collect()
            )
            ans = [{"name": r["name"], "usage_count": r["usage_count"]} for r in rows]
        elif i == "paths":
            ids = {r["name"]: r["id"] for r in g.nodes.filter(
                F.col("name").isin([a["src"], a["dest"]])).collect()}
            if a["src"] not in ids or a["dest"] not in ids:
                return {"answer": [], "query": plan.query}
            ans = self.find_paths(repo, ids[a["src"]], ids[a["dest"]])
        elif i == "callers":
            target = g.nodes.filter(F.col("name") == a["name"]).select("id")
            rows = (
                g.edges.filter(F.col("type") == "CALLS")
                .join(target, g.edges["dst"] == target["id"]).drop(target["id"])
                .join(g.nodes, F.col("src") == g.nodes["id"])
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        elif i == "callees":
            src = g.nodes.filter(F.col("name") == a["name"]).select("id")
            rows = (
                g.edges.filter(F.col("type") == "CALLS")
                .join(src, g.edges["src"] == src["id"]).drop(src["id"])
                .join(g.nodes, F.col("dst") == g.nodes["id"])
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        elif i == "defined_in":
            ent = g.nodes.filter(F.col("name") == a["name"]).select(F.col("id").alias("eid"))
            rows = (
                g.edges.filter(F.col("type") == "DEFINES")
                .join(ent, F.col("dst") == F.col("eid"))
                .join(g.nodes.filter(F.array_contains("labels", "File")),
                      F.col("src") == g.nodes["id"])
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        elif i == "prefix_search":
            ans = [_encode_node(r) for r in
                   search.auto_complete(g.nodes, a["prefix"]).collect()]
        elif i == "name_contains":
            rows = (
                lookups.by_label(g.nodes, a["label"])
                .filter(F.col("name").contains(a["text"]))
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        elif i == "list_commits":
            ans = self.list_commits(repo)
        elif i == "list_label":
            rows = lookups.by_label(g.nodes, a["label"]).limit(a["k"]).collect()
            ans = [_encode_node(r) for r in rows]
        elif i in ("extends", "implements"):
            et = "EXTENDS" if i == "extends" else "IMPLEMENTS"
            target = g.nodes.filter(F.col("name") == a["name"]).select(
                F.col("id").alias("tid"))
            rows = (
                g.edges.filter(F.col("type") == et)
                .join(target, F.col("dst") == F.col("tid")).drop("tid")
                .join(g.nodes, F.col("src") == g.nodes["id"])
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        elif i == "least_covered":
            rows = (
                g.nodes.filter(F.array_contains("labels", "File"))
                .filter(F.col("coverage").isNotNull())
                .orderBy(F.col("coverage").asc(), "name")
                .limit(a.get("k", 10))
                .select("name", "coverage")
                .collect()
            )
            ans = [{"name": r["name"], "coverage": r["coverage"]} for r in rows]
        elif i == "entities_in_file":
            fnode = g.nodes.filter(
                F.array_contains("labels", "File") & (F.col("name") == a["file"])
            ).select(F.col("id").alias("fid"))
            ents = g.nodes.filter(
                F.array_contains("labels", a.get("label", "Function")))
            rows = (
                g.edges.filter(F.col("type") == "DEFINES")
                .join(fnode, F.col("src") == F.col("fid")).drop("fid")
                .join(ents, F.col("dst") == ents["id"])
                .collect()
            )
            ans = [_encode_node(r) for r in rows]
        else:  # pragma: no cover - compiler and dispatcher enumerate together
            return {"answer": None, "query": plan.query, "error": "unknown intent"}
        return {"answer": ans, "query": plan.query}

    # -- ingest endpoints ---------------------------------------------------

    def analyze_folder(
        self, path: str, name: str | None = None, ignore: tuple | list = ()
    ) -> dict:
        """POST /analyze_folder (reference api/index.py:330-381, §3.1 pass 1-2).

        `ignore` is the caller's exclude list (reference
        analyzer.analyze_local_folder(path, g, ignore)) — path substrings
        filtered out of the scan alongside the built-in dep containers."""
        from ..sources.python_analyzer import analyze_python_files
        from ..sources.source_scan import scan_source_tree

        from ..sources.dependencies import add_dependency_sources

        name = name or path.rstrip("/").rsplit("/", 1)[-1]
        # S3: dependency sources (declared site-packages, extracted maven
        # sources-jars) join the same scan; the main tree scan ignores the
        # venv/temp_deps containers so only DECLARED deps are analyzed.
        dep_roots = add_dependency_sources(path)
        files = scan_source_tree(
            self.spark, [path], exts=(".py", ".java", ".cs", ".c"),
            ignore=("/venv/", "/temp_deps/", *ignore),
        )
        if dep_roots:
            files = files.unionByName(
                scan_source_tree(self.spark, dep_roots, exts=(".py", ".java", ".cs"))
            )
        # binaryFile paths are file: URIs; store REPO-RELATIVE paths so the
        # graph matches git-diff paths (time travel deletes/re-adds by the
        # same key) and is portable across clones.
        prefix = "file:" + os.path.abspath(path).rstrip("/") + "/"
        files = files.withColumn(
            "path", F.replace(F.col("path"), F.lit(prefix), F.lit(""))
        )
        nodes, edges = analyze_python_files(self.spark, files)
        g = PropertyGraph(self.spark, name, nodes, edges, root=self.root)
        g.save()
        n, e = g.counts()
        return {"repo": name, "nodes": n, "edges": e}

    def _materialize_repo(self, url_or_path: str, name: str | None) -> tuple[str, str]:
        """Reference parity for the URL contract (api/project.py:19-61,
        from_git_repository → _clone_source): `file://` URLs and local BARE
        repositories are cloned into <root>/_clones/<name> via `git clone`
        (re-cloned fresh each call, like the reference's rmtree+clone); a
        plain working-tree path passes through unchanged. Network URLs
        (https/ssh) would take the same clone path — this sandbox has no
        network, which is the one documented divergence."""
        import shutil
        import subprocess

        src = url_or_path
        if src.startswith("file://"):
            src = src[len("file://"):]
        is_bare = (
            os.path.isdir(src)
            and os.path.exists(os.path.join(src, "HEAD"))
            and os.path.isdir(os.path.join(src, "objects"))
            and not os.path.isdir(os.path.join(src, ".git"))
        )
        needs_clone = url_or_path.startswith("file://") or is_bare
        name = name or re.sub(
            r"\.git$", "", src.rstrip("/").rsplit("/", 1)[-1]
        )
        if not needs_clone:
            return src, name
        dest = os.path.join(self.root, "_clones", name)
        if os.path.exists(dest):
            shutil.rmtree(dest)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        subprocess.run(
            ["git", "clone", "--quiet", src, dest],
            check=True, capture_output=True, text=True,
        )
        return dest, name

    def analyze_repo(self, repo_path: str, name: str | None = None) -> dict:
        """POST /analyze_repo (reference api/index.py:383-417): sources +
        full commit graph (PARENT/CHILD edges + per-transition op-logs,
        reference git_utils.py:73-258) + side-store HEAD. Accepts a
        working-tree path, a `file://` URL, or a local bare repository
        (cloned first — see _materialize_repo)."""
        from ..sources.git_history import build_commit_graph

        repo_path, name = self._materialize_repo(repo_path, name)
        result = self.analyze_folder(repo_path, name)
        gg, log = build_commit_graph(self.spark, repo_path, name)
        gg.root = self.root
        gg.save()
        # X4: commit point-lookups (switch_commit) hit the hash-range
        # layout — each parquet file covers a disjoint hash range, so the
        # pushed hash predicate prunes to one file.
        gg.save_range_indexed("name")
        self._save_oplog(name, log)
        head = _git_head(repo_path)
        self._info.set(name, commit=head, repo_url=repo_path,
                       analyzed_at=int(time.time()))
        return {**result, "head": head}

    def _oplog_path(self, repo: str) -> str:
        return f"{self.root}/{repo}_git/oplog"

    def _save_oplog(self, repo: str, log) -> None:
        df = log.to_df(self.spark)
        df.coalesce(1).write.mode("overwrite").parquet(self._oplog_path(repo))

    def _load_oplog(self, repo: str):
        from ..mutations.oplog import OPLOG_SCHEMA, OpLog

        # explicit schema: an empty op-log writes no parquet part files
        return OpLog.from_df(
            self.spark.read.schema(OPLOG_SCHEMA).parquet(self._oplog_path(repo))
        )

    def switch_commit(self, repo: str, target_commit: str,
                      oplog=None, commit_path: list[str] | None = None) -> dict:
        """POST /switch_commit (reference api/index.py:419-451 +
        git_utils.py:260-333, M7 replay).

        With no explicit oplog/path, both are DERIVED: the current commit
        from the side store, the direction by comparing commit dates, the
        hop sequence from the stored commit chain, and the op-log from the
        `{repo}_git` storage — exactly the reference's flow."""
        from ..sources.git_history import derive_commit_path

        if oplog is None or commit_path is None:
            current = self._info.get(repo).get("commit")
            if current is None:
                raise ValueError(f"no recorded commit for {repo!r}")
            if current == target_commit:
                g = PropertyGraph.load(self.spark, self.root, repo)
                n, e = g.counts()
                return {"repo": repo, "commit": current, "nodes": n, "edges": e}
            gg = PropertyGraph.load(self.spark, self.root, f"{repo}_git")
            # X4 read path (reference git_graph.py:69-85 get_commit): point
            # probe through the hash-range layout — the pushed equality
            # prunes to one parquet file, so validation cost is O(1) in
            # history length, not a full commit scan.
            probe = gg.range_indexed_nodes("name").filter(
                F.col("name") == target_commit)
            if probe.limit(1).count() == 0:
                raise ValueError(f"unknown commit {target_commit!r}")
            commit_path = derive_commit_path(gg, current, target_commit)
            oplog = self._load_oplog(repo)
        g = PropertyGraph.load(self.spark, self.root, repo)
        g = oplog.replay_path(g, commit_path)
        g.save()
        self._info.set(repo, commit=target_commit)
        n, e = g.counts()
        return {"repo": repo, "commit": target_commit, "nodes": n, "edges": e}

    def delete_repo(self, repo: str) -> dict:
        g = PropertyGraph.load(self.spark, self.root, repo)
        g.drop()
        self._info.delete(repo)
        return {"deleted": repo}


def _git_head(repo_path: str) -> str:
    from ..sources.git_ingest import _git

    return _git(repo_path, "rev-parse", "HEAD").strip()


def to_json(obj) -> str:
    return json.dumps(obj, default=str)
