"""PropertyGraph storage/catalog + multimodal plumbing + search operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_backend_spark.functions import multimodal
from code_graph_backend_spark.graph.model import NODES_SCHEMA, PropertyGraph
from code_graph_backend_spark.operators.search import auto_complete, build_prefix_table


@pytest.fixture()
def small_graph(spark, tmp_path):
    nodes = spark.createDataFrame(
        [
            (1, ["Class", "Searchable"], "TaskRunner", "/a.py", None, 1, 9, None, None, None),
            (2, ["Function", "Searchable"], "TaskQueue", "/a.py", None, 11, 19, None, None, None),
            (3, ["Function"], "hidden", "/a.py", None, 21, 22, None, None, None),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [(1, 2, "DEFINES", None)], "src long, dst long, type string, props map<string,string>"
    )
    return PropertyGraph(spark, "g1", nodes, edges, root=str(tmp_path))


def test_save_load_roundtrip(small_graph, spark):
    small_graph.save()
    g = PropertyGraph.load(spark, small_graph.root, "g1")
    assert g.counts() == (3, 1)


def test_catalog_list_exists_clone_drop(small_graph, spark):
    small_graph.save()
    root = small_graph.root
    # internal graphs are hidden (reference api/graph.py:31)
    PropertyGraph(spark, "g1_git", small_graph.nodes, small_graph.edges, root=root).save()
    assert PropertyGraph.list_graphs(root) == ["g1"]
    assert PropertyGraph.exists(root, "g1") and not PropertyGraph.exists(root, "nope")
    c = small_graph.clone("g2")
    assert c.counts() == (3, 1)
    c.drop()
    assert not PropertyGraph.exists(root, "g2")


def test_auto_complete_only_searchable(small_graph):
    names = [r["name"] for r in auto_complete(small_graph.nodes, "Task").collect()]
    assert names == ["TaskQueue", "TaskRunner"]  # sorted, 'hidden' not Searchable
    assert [r["name"] for r in auto_complete(small_graph.nodes, "hid").collect()] == []


def test_prefix_table(small_graph):
    pt = build_prefix_table(small_graph.nodes, max_len=4)
    got = {r["prefix"] for r in pt.filter(F.col("id") == 1).collect()}
    assert got == {"T", "Ta", "Tas", "Task"}


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m0001"]["n_bytes"] == 101
    assert all(r["width"] > 0 and r["height"] > 0 for r in feats)


def test_multimodal_decode_stubbed(spark):
    # compressed formats stay stubbed; uncompressed BMP decodes for real
    # (tests/test_codecs.py) — synthetic_media payloads are neither, so the
    # real path rejects them at decode time.
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    media = multimodal.synthetic_media(spark, n=2)
    with pytest.raises(Exception):
        multimodal.extract_features(media, fake=False).collect()


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, n=9)
    plan = multimodal.frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert {r["media_id"] for r in rows} <= {f"m{i:04d}" for i in range(9) if i % 3 == 2}
    assert all(r["frame_idx"] % 10 == 0 for r in rows)


def test_edge_scan_partition_pruned(small_graph, spark, tmp_path):
    """X1/X4 (range-index analogue): edges persisted partitioned by type,
    so a type-filtered hop prunes non-matching partitions at the scan."""
    from code_graph_backend_spark.graph.model import PropertyGraph

    g = PropertyGraph(spark, "pruned", small_graph.nodes, small_graph.edges,
                      root=str(tmp_path))
    g.save()
    loaded = PropertyGraph.load(spark, str(tmp_path), "pruned")
    one_type = loaded.edges.filter(F.col("type") == "DEFINES")
    plan = one_type._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "DEFINES" in plan, plan[:2000]
    # and the pruned scan returns exactly the DEFINES edges
    assert one_type.count() == small_graph.edges.filter(F.col("type") == "DEFINES").count()


def test_register_views_sql_face(spark):
    from code_graph_backend_spark.graph.model import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, ["Function"], "f", "a.py", None, None, None, None, None, None),
         (2, ["Function"], "g", "a.py", None, None, None, None, None, None)],
        PropertyGraph(spark, "x").nodes.schema,
    )
    edges = spark.createDataFrame(
        [(1, 2, "CALLS", None)], PropertyGraph(spark, "x").edges.schema
    )
    g = PropertyGraph(spark, "viewtest", nodes, edges)
    nv, ev = g.register_views()
    rows = spark.sql(
        f"SELECT n.name FROM {ev} e JOIN {nv} n ON n.id = e.dst WHERE e.type = 'CALLS'"
    ).collect()
    assert [r["name"] for r in rows] == ["g"]
