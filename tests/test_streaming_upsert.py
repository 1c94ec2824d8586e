"""Streaming MERGE upsert (streaming/upsert.py): a stream of JSONL node
drops merged with the SAME kernels as the batch sink — final state must
equal the batch path applied in drop order."""

from __future__ import annotations

import json
import os


def _write_drop(data_dir, name, rows):
    with open(os.path.join(data_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


SCHEMA = "id long, name string, props map<string,string>"


def test_stream_merge_matches_batch_merge(spark, tmp_path):
    from code_graph_backend_spark.mutations.merge import merge_nodes
    from code_graph_backend_spark.streaming.upsert import StreamingUpsert

    data_dir = os.path.join(str(tmp_path), "drops")
    os.makedirs(data_dir)
    drop1 = [
        {"id": 1, "name": "a", "props": {"x": "1"}},
        {"id": 2, "name": "b", "props": {"y": "2"}},
    ]
    _write_drop(data_dir, "d1.jsonl", drop1)

    initial = spark.createDataFrame([], SCHEMA)
    ups = StreamingUpsert(initial, key=("id",))
    stream = spark.readStream.schema(SCHEMA).json(data_dir)
    q = ups.attach(stream, os.path.join(str(tmp_path), "ckpt1"))
    q.awaitTermination(120)

    got1 = {r["id"]: r for r in ups.state.collect()}
    assert set(got1) == {1, 2} and got1[1]["name"] == "a"

    # second drop: update node 1 (props merge, name override), insert 3
    drop2 = [
        {"id": 1, "name": "a2", "props": {"z": "9"}},
        {"id": 3, "name": "c", "props": None},
    ]
    _write_drop(data_dir, "d2.jsonl", drop2)
    q = ups.attach(
        spark.readStream.schema(SCHEMA).json(data_dir),
        os.path.join(str(tmp_path), "ckpt1"),  # same checkpoint: only d2 is new
    )
    q.awaitTermination(120)

    got = {r["id"]: r for r in ups.state.collect()}
    want_df = merge_nodes(
        merge_nodes(initial, spark.createDataFrame(
            [(1, "a", {"x": "1"}), (2, "b", {"y": "2"})], SCHEMA)),
        spark.createDataFrame([(1, "a2", {"z": "9"}), (3, "c", None)], SCHEMA),
    )
    want = {r["id"]: r for r in want_df.collect()}
    assert set(got) == set(want) == {1, 2, 3}
    for k in want:
        assert got[k]["name"] == want[k]["name"]
        assert (got[k]["props"] or {}) == (want[k]["props"] or {})
    # the += semantics actually merged: node 1 carries BOTH x and z
    assert got[1]["props"] == {"x": "1", "z": "9"}
    assert got[1]["name"] == "a2"
