"""X1/X4 — the sorted/bucketed 'range index' layout: writing nodes range-
partitioned + sorted by name must (a) push the StartsWith predicate to the
parquet scan and (b) actually skip non-matching files via min/max stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.operators.search import (
    auto_complete,
    build_prefix_table,
    write_sorted_by_name,
)


@pytest.fixture(scope="module")
def indexed_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "nodes_by_name")
    nodes = spark.range(0, 10_000).select(
        F.col("id"),
        F.array(F.lit("Function"), F.lit("Searchable")).alias("labels"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(c) for c in "abcdefghijklmnop"]),
                (F.col("id") % 16 + 1).cast("int"),
            ),
            F.lit("_fn_"),
            F.col("id").cast("string"),
        ).alias("name"),
    )
    write_sorted_by_name(nodes, out, buckets=16)
    return out


def test_startswith_pushed_to_scan(spark, indexed_dir):
    df = spark.read.parquet(indexed_dir).filter(F.col("name").startswith("c_"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith(name,c_" in plan, plan


def test_row_group_skipping_via_minmax_stats(spark, indexed_dir):
    """The range-partitioned sorted layout clusters each initial letter into
    few row groups; the pushed StartsWith must make the parquet reader skip
    most row groups — observable as scan-level numOutputRows far below the
    table size (the post-scan Filter then exactifies)."""
    pruned = spark.read.parquet(indexed_dir).filter(F.col("name").startswith("c_"))
    rows = pruned.collect()
    assert len(rows) == 10_000 // 16  # correctness: exactly the c_ names

    scan = pruned._jdf.queryExecution().executedPlan().collectLeaves().head()
    assert "FileSourceScan" in scan.getClass().getSimpleName()
    metrics = scan.metrics()
    scanned = metrics.apply("numOutputRows").value()
    assert metrics.apply("numFiles").value() >= 8  # layout has many files
    # without stats skipping the scan surfaces all 10k rows; with the
    # sorted layout only the straddling row groups survive
    assert scanned <= 3_000, f"scan surfaced {scanned}/10000 rows - no skipping"


def test_auto_complete_on_indexed_layout(spark, indexed_dir):
    nodes = spark.read.parquet(indexed_dir).withColumns(
        {
            "path": F.lit(""), "ext": F.lit(None).cast("string"),
            "src_start": F.lit(None).cast("int"),
            "src_end": F.lit(None).cast("int"),
            "doc": F.lit(None).cast("string"),
            "props": F.lit(None).cast("map<string,string>"),
            "coverage": F.lit(None).cast("double"),
        }
    )
    res = auto_complete(nodes, "d_fn_1")
    rows = res.collect()
    assert rows and all(r["name"].startswith("d_fn_1") for r in rows)
    assert len(rows) <= 10


def test_prefix_table_equijoin_path(spark):
    nodes = spark.createDataFrame(
        [(1, ["Function", "Searchable"], "alpha"), (2, ["Class", "Searchable"], "alps"),
         (3, ["Function", "Searchable"], "beta")],
        "id long, labels array<string>, name string",
    )
    pt = build_prefix_table(nodes)
    hits = {r["name"] for r in pt.filter(F.col("prefix") == "alp").collect()}
    assert hits == {"alpha", "alps"}
