"""Document-corpus ingestion from line-oriented formats (JSONL / CSV /
raw text directories) into the canonical `documents` schema.

The driver's tables are parquet, but a real corpus lands as JSONL dumps
(Common Crawl derivatives, API exports) or CSV — so the engine exposes
readers that normalize any of them into the exact frame every documents
operator consumes: (doc_id long, text string, lang string, source string,
n_chars long). Missing fields are derived (n_chars from text) or
defaulted; doc_id can be synthesized content-stably via the md5 of the
text when the format carries no id (stable under re-ingest and corpus
growth, unlike zipWithIndex/monotonically_increasing_id, whose values
depend on partitioning).

Scale notes: all three readers are plain `spark.read` scans — Catalyst
handles splits, pushdown, and schema pruning; JSONL/CSV scans are
line-splittable, so a 100 TB corpus parallelizes without a repartition.
The schema is declared explicitly (never inferSchema at scale — that is
a full extra pass over the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def _normalize(df: DataFrame, default_source: str) -> DataFrame:
    """Null-or-absent fields coalesce to their derived/default values (a
    schema-declared scan materializes absent JSON keys as nulls, so the
    check is per-VALUE, not per-column)."""
    cols = set(df.columns)
    if "text" not in cols:
        raise ValueError("documents input needs a `text` column")

    def present(name):
        return F.col(name) if name in cols else F.lit(None)

    # content-stable surrogate id: top 60 bits of md5(text) — identical
    # across engines, re-ingests, and partitionings (unlike
    # monotonically_increasing_id, whose values depend on partitioning)
    surrogate = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return df.select(
        F.coalesce(present("doc_id").cast("long"), surrogate).alias("doc_id"),
        F.col("text").cast("string").alias("text"),
        F.coalesce(present("lang").cast("string"), F.lit("und")).alias("lang"),
        F.coalesce(
            present("source").cast("string"), F.lit(default_source)
        ).alias("source"),
        F.coalesce(
            present("n_chars").cast("long"), F.length("text").cast("long")
        ).alias("n_chars"),
    )


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL (one JSON object per line) → documents frame. Explicit
    schema: no inference pass; unknown keys are pruned at the scan."""
    raw = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    return _normalize(raw, default_source="jsonl")


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV → documents frame (quoted multiline text supported)."""
    raw = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return _normalize(raw, default_source="csv")


def read_documents_textdir(spark: SparkSession, path: str) -> DataFrame:
    """A directory of plain-text files, one document per file — the
    `spark.read.text(wholetext)` path. The file path becomes the source;
    doc_id is the content-stable md5 surrogate."""
    raw = (
        spark.read.option("wholetext", "true").text(path)
        .select(
            F.col("value").alias("text"),
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
        )
    )
    return _normalize(raw, default_source="textdir")


def stream_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING twin of `read_documents_jsonl`: a `readStream` file
    source watching `path` for newly landed JSONL drops, normalized
    through the SAME `_normalize` as the batch reader — every downstream
    map-only documents operator (quality gates, PII redaction, language
    ID, fingerprints) composes onto it unchanged, which is the
    continuous-ingest half of the incremental pipeline beside
    dedup_minhash_incremental / shard_manifest_incremental. Explicit
    schema is mandatory on streams (no inference pass exists)."""
    raw = spark.readStream.schema(DOCUMENTS_SCHEMA).json(path)
    return _normalize(raw, default_source="jsonl")


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC → documents frame, through the SAME `_normalize` as every
    other reader. ORC is the other columnar format corpora actually land
    in (Hive-era warehouses export it); Spark's reader is built-in and
    gives the same split/pushdown/pruning behavior as parquet — the scan
    stays predicate-prunable and column-pruned, so downstream operators
    see no difference. Explicit schema (no inference pass); absent
    columns coalesce to derived/default values per _normalize."""
    raw = spark.read.schema(DOCUMENTS_SCHEMA).orc(path)
    return _normalize(raw, default_source="orc")


def write_documents_orc(df: DataFrame, path: str, partition_by: str | None = None):
    """Documents → ORC sink (the export half of the ORC round-trip).
    `partition_by` (e.g. "lang") lays the files out hive-partitioned so a
    reader filtering on that column prunes whole directories — the same
    partition-pruning contract the parquet warehouse uses."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
