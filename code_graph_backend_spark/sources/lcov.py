"""S6/J12/A5/A6/M4: LCOV coverage ingest + graph coverage propagation.

Reference (api/code_coverage/lcov/lcov.py): a line-oriented text parser for
TN/SF/DA/FN/FNDA/BRDA/LF/LH records; per-file coverage = LH/LF; per-function
coverage assigns DA hit-lines to function spans with a two-pointer merge;
file coverage 1.0 propagates 1.0 to its functions (api/graph.py:470-480).

Spark design: `spark.read.text` → split/filter into typed record tables —
the parser IS a DataFrame pipeline (record type = prefix before ':', payload
split on ','). Line→span assignment is the binned range join (J12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rangejoin import range_join_binned


def parse_lcov(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Parse an LCOV tracefile into record DataFrames.

    Returns {"files": (file_path, lines_found, lines_hit),
             "lines": (file_path, line, hit)}.

    LCOV is stateful text (records belong to the preceding SF) — the
    classic Spark trick is a running `last(SF)` over an ordered window, but
    coverage files are small config-like inputs, so we keep per-file order
    with a monotonic id within one read (no shuffle before the window).
    """
    raw = (
        spark.read.text(path)
        .withColumn("seq", F.monotonically_increasing_id())
        .withColumn("rec", F.split(F.col("value"), ":", 2))
        .select(
            "seq",
            F.get(F.col("rec"), 0).alias("tag"),
            F.get(F.col("rec"), 1).alias("payload"),  # null for tag-only lines
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    tagged = raw.withColumn(
        "file_path", F.last(F.when(F.col("tag") == "SF", F.col("payload")), True).over(w)
    )

    lines = (
        tagged.filter(F.col("tag") == "DA")
        .withColumn("p", F.split("payload", ","))
        .select(
            "file_path",
            F.col("p")[0].cast("int").alias("line"),
            F.col("p")[1].cast("int").alias("hit"),
        )
    )
    lf = tagged.filter(F.col("tag") == "LF").select(
        "file_path", F.col("payload").cast("int").alias("lines_found")
    )
    lh = tagged.filter(F.col("tag") == "LH").select(
        "file_path", F.col("payload").cast("int").alias("lines_hit")
    )
    files = lf.join(lh, "file_path")
    return {"files": files, "lines": lines}


def file_coverage(files: DataFrame) -> DataFrame:
    """A5: per-file ratio (reference lcov.py:148-151)."""
    return files.select(
        "file_path",
        (F.col("lines_hit") / F.col("lines_found")).alias("coverage"),
    )


def function_coverage(lines: DataFrame, functions: DataFrame) -> DataFrame:
    """A6 via J12: hit-lines assigned to [src_start, src_end] spans.

    `functions` needs (id, path, src_start, src_end). Coverage =
    hit_line_count / max(1, src_end - src_start), per reference
    lcov.py:197-205.
    """
    hit = lines.filter(F.col("hit") > 0).select(F.col("file_path").alias("hpath"), "line")
    spans = functions.select("id", "path", "src_start", "src_end")
    joined = range_join_binned(hit, "line", spans, "src_start", "src_end", bin_width=64).filter(
        F.col("hpath") == F.col("path")  # same line numbers in different files
    )
    return (
        joined.groupBy("id")
        .agg(F.count("*").alias("hits"), F.first(F.col("src_end") - F.col("src_start")).alias("span"))
        .select(
            "id",
            (F.col("hits") / F.greatest(F.col("span"), F.lit(1))).alias("coverage"),
        )
    )


def propagate_full_coverage(
    nodes: DataFrame,
    edges: DataFrame,
    label: str = "File",
    edge_type: str = "DEFINES",
) -> DataFrame:
    """M4: files with coverage 1.0 push 1.0 to their DEFINES children
    (reference api/graph.py:470-480). label/edge_type are parameterized so
    the same conditional-propagation operator runs on any parent→child
    relation."""
    full_files = nodes.filter(
        F.array_contains("labels", label) & (F.col("coverage") == 1.0)
    ).select(F.col("id").alias("fid"))
    children = (
        edges.filter(F.col("type") == edge_type)
        .join(full_files, F.col("src") == F.col("fid"))
        .select(F.col("dst").alias("id"))
        .distinct()
        .withColumn("_full", F.lit(1.0))
    )
    return (
        nodes.join(children, "id", "left_outer")
        .withColumn("coverage", F.coalesce("_full", "coverage"))
        .drop("_full")
    )
