"""End-to-end git time travel: build the commit graph WITH transition
op-logs, and derive switch paths from commit dates.

Reference (api/git_utils/git_utils.py:73-258 build_commit_graph): walk
history backward from HEAD — per hop, git-diff classify changes, delete
removed files from the graph, re-analyze added/modified files, and drain
the captured mutation backlog onto the PARENT edge; then walk forward
symmetrically onto CHILD edges. switch_commit (git_utils.py:260-333) picks
the replay direction by comparing commit DATES and replays the logged
transitions hop by hop.

Spark shape: the git subprocess steps (log/diff/show) are driver-side like
the reference's pygit2 calls; each hop's changed-file set is request-sized
(a commit diff), so per-hop re-analysis runs through the SAME distributed
pipeline as full ingest (`parse_files` → `graph_from_parsed`) and its
result rows are collected into the op-log as logical-op params. At fleet
scale the unit of parallelism is the REPO (thousands of repos × mapInPandas
over a repo list), not the commits of one repo — history replay is
inherently sequential per repo, exactly as in the reference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..graph.model import PropertyGraph
from ..mutations.oplog import OpLog
from .git_ingest import _git, commit_edges_df, commits_df, file_at_commit

SUPPORTED_EXTS = (".py", ".java", ".cs")


def _classify(repo_path: str, a: str, b: str, exts, ignore) -> tuple[list, list, list]:
    """git diff a→b → (added, deleted, modified) paths, ext/ignore filtered
    (reference git_utils.py:35-70 classify_changes)."""
    out = _git(repo_path, "diff", "--name-status", a, b)
    added, deleted, modified = [], [], []
    for line in out.splitlines():
        parts = line.split("\t")
        if len(parts) < 2:
            continue
        status, path = parts[0][0], parts[-1]
        if not path.endswith(tuple(exts)):
            continue
        if any(pat in path for pat in ignore):
            continue
        if status == "A":
            added.append(path)
        elif status == "D":
            deleted.append(path)
        elif status in ("M", "R"):
            modified.append(path)
    return added, deleted, modified


def _analyze_at(spark: SparkSession, repo_path: str, commit: str, paths: list[str]):
    """Parse `paths` as of `commit` through the real distributed pipeline,
    returning JSON-able node/edge row dicts for the op-log."""
    from .python_analyzer import graph_from_parsed, parse_files

    rows = []
    for p in paths:
        try:
            rows.append((p, file_at_commit(repo_path, commit, p)))
        except Exception:
            continue  # path absent at that commit (e.g. rename source)
    if not rows:
        return [], []
    files = spark.createDataFrame(rows, "path string, content binary")
    nodes, edges = graph_from_parsed(spark, parse_files(files))
    node_rows = [r.asDict(recursive=True) for r in nodes.collect()]
    edge_rows = [r.asDict(recursive=True) for r in edges.collect()]
    return node_rows, edge_rows


def _record_hop(log: OpLog, spark, repo_path, src_hash, dst_hash,
                added, deleted, modified) -> None:
    """One transition src→dst: delete (deleted+modified), re-analyze
    (added+modified) at dst — reference git_utils.py:151-157/215-221."""
    if deleted or modified:
        log.record(src_hash, dst_hash, "delete_files",
                   {"paths": sorted(deleted + modified)})
    reanalyze = sorted(added + modified)
    if reanalyze:
        node_rows, edge_rows = _analyze_at(spark, repo_path, dst_hash, reanalyze)
        if node_rows:
            log.record(src_hash, dst_hash, "merge_nodes", {"rows": node_rows})
        if edge_rows:
            log.record(src_hash, dst_hash, "merge_edges", {"rows": edge_rows})


def build_commit_graph(
    spark: SparkSession,
    repo_path: str,
    name: str,
    exts=SUPPORTED_EXTS,
    ignore: tuple[str, ...] = (),
) -> tuple[PropertyGraph, OpLog]:
    """Commit graph (nodes + PARENT/CHILD edges) and the transition op-log,
    both directions (reference git_utils.py:73-258)."""
    cdf = commits_df(spark, repo_path)
    commits = cdf.collect()  # `git log --reverse`: oldest → newest; the
    # per-repo commit list is bounded (a driver resource like the clone)
    hashes = [r["hash"] for r in commits]

    log = OpLog()
    # backward: HEAD → root, transitions keyed (child, parent) [PARENT edges]
    for child, parent in zip(reversed(hashes), list(reversed(hashes))[1:]):
        added, deleted, modified = _classify(repo_path, child, parent, exts, ignore)
        _record_hop(log, spark, repo_path, child, parent, added, deleted, modified)
    # forward: root → HEAD, transitions keyed (parent, child) [CHILD edges]
    for parent, child in zip(hashes, hashes[1:]):
        added, deleted, modified = _classify(repo_path, parent, child, exts, ignore)
        _record_hop(log, spark, repo_path, parent, child, added, deleted, modified)

    # commit nodes: props carry date + seq (log order) so path derivation
    # can break same-second date ties deterministically
    commit_nodes = cdf.select(
        F.xxhash64("hash").alias("id"),
        F.array(F.lit("Commit")).alias("labels"),
        F.col("hash").alias("name"),
        F.lit("").alias("path"),
        F.lit(None).cast("string").alias("ext"),
        F.lit(None).cast("int").alias("src_start"),
        F.lit(None).cast("int").alias("src_end"),
        F.col("message").alias("doc"),
        F.map_from_arrays(
            F.array(F.lit("author"), F.lit("date"), F.lit("seq")),
            F.array(
                F.col("author"),
                F.col("date").cast("string"),
                F.col("ord").cast("string"),
            ),
        ).alias("props"),
        F.lit(None).cast("double").alias("coverage"),
    )
    edges = commit_edges_df(spark, repo_path)
    commit_edges = edges.select(
        F.xxhash64("src_hash").alias("src"),
        F.xxhash64("dst_hash").alias("dst"),
        "type",
        F.lit(None).cast("map<string,string>").alias("props"),
    )
    gg = PropertyGraph(spark, f"{name}_git", commit_nodes, commit_edges)
    return gg, log


def derive_commit_path(
    git_graph: PropertyGraph, current: str, target: str
) -> list[str]:
    """Ordered hash path current → target, direction chosen by commit DATE
    (reference git_utils.py:309-320: backward iff current.date > target.date;
    the chain itself is date-ordered, git_graph.py:64)."""
    rows = (
        git_graph.nodes.filter(F.array_contains("labels", "Commit"))
        .select(
            "name",
            F.col("props").getItem("date").cast("long").alias("date"),
            F.coalesce(F.col("props").getItem("seq").cast("long"), F.lit(0)).alias("seq"),
        )
        .collect()
    )
    by_hash = {r["name"]: (r["date"], r["seq"]) for r in rows}
    if current not in by_hash or target not in by_hash:
        raise ValueError("Commits not found")
    ordered = sorted(by_hash, key=lambda h: by_hash[h])
    ci, ti = ordered.index(current), ordered.index(target)
    if ci == ti:
        return [current]
    if ti > ci:
        return ordered[ci : ti + 1]
    # backward: slice ascending then reverse (a `: ti-1 : -1` slice would
    # read "last element" when ti == 0)
    return ordered[ti : ci + 1][::-1]
