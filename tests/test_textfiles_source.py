"""JSONL / CSV / text-directory corpus ingestion: every reader lands on
the canonical documents schema and feeds the documents operators
unchanged (the parquet tables are the driver's fixture, not the only
door into the engine)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from code_graph_backend_spark.sources.textfiles import (
    DOCUMENTS_SCHEMA, read_documents_csv, read_documents_jsonl,
    read_documents_textdir,
)


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = os.path.join(str(tmp_path), "docs.jsonl")
    with open(p, "w") as f:
        for r in src.collect():
            f.write(json.dumps({
                "doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"],
                "source": r["source"], "n_chars": r["n_chars"],
            }) + "\n")
    got = read_documents_jsonl(spark, p)
    # name+type identical (nullability flags differ between a parquet
    # scan and a coalesce projection — immaterial to consumers)
    assert got.dtypes == src.select(*[f.name for f in DOCUMENTS_SCHEMA]).dtypes
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_missing_fields_are_derived(spark, tmp_path):
    p = os.path.join(str(tmp_path), "bare.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"text": "hello spark world"}) + "\n")
        f.write(json.dumps({"text": "another doc"}) + "\n")
    got = read_documents_jsonl(spark, p).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_chars"] == len(r["text"])
        assert r["lang"] == "und" and r["source"] == "jsonl"
        assert r["doc_id"] is not None
    # content-stable id: re-reading yields identical ids
    again = {r["text"]: r["doc_id"] for r in read_documents_jsonl(spark, p).collect()}
    assert all(again[r["text"]] == r["doc_id"] for r in got)


def test_csv_reader_quoted_text(spark, tmp_path):
    p = os.path.join(str(tmp_path), "docs.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('1,"a b c",en,s0,5\n')
        f.write('2,"with, comma",de,s1,11\n')
    got = {r["doc_id"]: r for r in read_documents_csv(spark, p).collect()}
    assert got[2]["text"] == "with, comma" and got[2]["lang"] == "de"


def test_textdir_reader_and_operator_compat(spark, tmp_path):
    d = os.path.join(str(tmp_path), "corpus")
    os.makedirs(d)
    for i, body in enumerate(["the cat sat", "a dog ran far"]):
        with open(os.path.join(d, f"doc{i}.txt"), "w") as f:
            f.write(body)
    docs = read_documents_textdir(spark, d)
    rows = docs.collect()
    assert {r["source"] for r in rows} == {"doc0.txt", "doc1.txt"}
    # the ingested frame feeds a documents operator unchanged
    from code_graph_backend_spark.functions.text import gopher_quality_gates

    gates = gopher_quality_gates(docs).collect()
    assert {g["n_tokens"] for g in gates} == {3, 4}


def test_stream_jsonl_incremental_drops(spark, tmp_path):
    """The streaming reader picks up JSONL files as they land and a
    map-only documents operator (gopher gates) composes onto the stream
    unchanged — drained output == the batch reader over the same files."""
    from code_graph_backend_spark.functions.text import gopher_quality_gates
    from code_graph_backend_spark.sources.textfiles import (
        stream_documents_jsonl,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = src.limit(60).collect()
    data_dir = os.path.join(str(tmp_path), "drops")
    os.makedirs(data_dir)
    # two separate "drops"
    for i, chunk in enumerate((rows[:30], rows[30:])):
        with open(os.path.join(data_dir, f"drop{i}.jsonl"), "w") as f:
            for r in chunk:
                f.write(json.dumps({
                    "doc_id": r["doc_id"], "text": r["text"],
                    "lang": r["lang"], "source": r["source"],
                }) + "\n")

    stream = stream_documents_jsonl(spark, data_dir)
    assert stream.isStreaming
    q = (
        gopher_quality_gates(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ingest_test")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_tokens"], r["passes"])
        for r in spark.sql("select * from stream_ingest_test").collect()
    }
    from code_graph_backend_spark.sources.textfiles import read_documents_jsonl

    want = {
        r["doc_id"]: (r["n_tokens"], r["passes"])
        for r in gopher_quality_gates(
            read_documents_jsonl(spark, data_dir)
        ).collect()
    }
    assert got == want and len(got) == 60


def test_orc_roundtrip_matches_parquet_read(spark, tmp_path):
    """Write the real sf0.001 documents out as lang-partitioned ORC,
    read them back through read_documents_orc: every row identical to
    the parquet original, and a lang-filtered read prunes to the
    partition (PartitionFilters in the scan plan)."""
    import os

    from code_graph_backend_spark.session import read_table
    from code_graph_backend_spark.sources.textfiles import (
        read_documents_orc, write_documents_orc,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    p = os.path.join(str(tmp_path), "docs_orc")
    write_documents_orc(docs, p, partition_by="lang")
    back = read_documents_orc(spark, p)
    want = {r["doc_id"]: r for r in docs.collect()}
    got = {r["doc_id"]: r for r in back.collect()}
    assert len(got) == len(want)
    for k, r in want.items():
        g = got[k]
        assert (g["text"], g["lang"], g["source"], g["n_chars"]) == (
            r["text"], r["lang"], r["source"], r["n_chars"]
        )
    one_lang = back.filter(back["lang"] == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    # the lang predicate must reach the scan as a PARTITION filter
    # (directory pruning), not a post-scan row filter
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan[:800]


def test_orc_reader_synthesizes_missing_fields(spark, tmp_path):
    """An ORC corpus with only a text column still normalizes: md5
    surrogate ids, 'und' lang, 'orc' source, derived n_chars."""
    import os

    from code_graph_backend_spark.sources.textfiles import read_documents_orc

    p = os.path.join(str(tmp_path), "bare_orc")
    spark.createDataFrame(
        [("hello world",), ("spark orc",)], "text string"
    ).write.orc(p)
    rows = {r["text"]: r for r in read_documents_orc(spark, p).collect()}
    assert rows["hello world"]["n_chars"] == 11
    assert rows["hello world"]["lang"] == "und"
    assert rows["hello world"]["source"] == "orc"
    assert rows["hello world"]["doc_id"] == rows["spark orc"]["doc_id"] is None or True
    ids = {r["doc_id"] for r in rows.values()}
    assert len(ids) == 2 and all(i is not None for i in ids)
