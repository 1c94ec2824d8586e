"""LCOV parse + coverage assignment (S6/J12/A5/A6/M4), per FIXTURES.md §3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.graph.model import NODES_SCHEMA
from code_graph_backend_spark.sources.lcov import (
    file_coverage,
    function_coverage,
    parse_lcov,
    propagate_full_coverage,
)

LCOV = """\
TN:
SF:/src/a.py
FN:2,foo
FNDA:3,foo
DA:2,3
DA:3,3
DA:4,0
DA:10,1
LF:4
LH:3
end_of_record
SF:/src/b.py
DA:2,1
DA:3,1
LF:2
LH:2
end_of_record
"""


@pytest.fixture()
def lcov_tables(spark, tmp_path):
    p = tmp_path / "cov.lcov"
    p.write_text(LCOV)
    return parse_lcov(spark, str(p))


def test_parse_records(lcov_tables):
    files = {r["file_path"]: (r["lines_found"], r["lines_hit"])
             for r in lcov_tables["files"].collect()}
    assert files == {"/src/a.py": (4, 3), "/src/b.py": (2, 2)}
    assert lcov_tables["lines"].count() == 6


def test_file_coverage(lcov_tables):
    cov = {r["file_path"]: r["coverage"]
           for r in file_coverage(lcov_tables["files"]).collect()}
    assert cov["/src/a.py"] == 0.75
    assert cov["/src/b.py"] == 1.0


def test_function_coverage_range_join(spark, lcov_tables):
    funcs = spark.createDataFrame(
        [(100, "/src/a.py", 2, 6), (200, "/src/b.py", 1, 3)],
        "id long, path string, src_start int, src_end int",
    )
    cov = {r["id"]: r["coverage"]
           for r in function_coverage(lcov_tables["lines"], funcs).collect()}
    # foo spans [2,6]: hit lines 2,3 inside (4 had hit=0, 10 outside) → 2/(6-2)
    assert cov[100] == pytest.approx(0.5)
    assert cov[200] == pytest.approx(1.0)


def test_full_coverage_propagation(spark):
    nodes = spark.createDataFrame(
        [
            (1, ["File"], "b.py", "/src/b.py", None, None, None, None, None, 1.0),
            (2, ["Function"], "g", "/src/b.py", None, 1, 3, None, None, 0.5),
            (3, ["Function"], "h", "/src/a.py", None, 1, 3, None, None, 0.5),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [(1, 2, "DEFINES", None)],
        "src long, dst long, type string, props map<string,string>",
    )
    out = {r["id"]: r["coverage"] for r in propagate_full_coverage(nodes, edges).collect()}
    assert out == {1: 1.0, 2: 1.0, 3: 0.5}
