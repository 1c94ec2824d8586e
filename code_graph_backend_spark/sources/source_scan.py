"""S1: source-tree scan as a DataFrame source.

Reference (api/analyzers/source_analyzer.py:86-100,177): rglob for
supported extensions, substring ignore-list filter.

Spark design: `binaryFile` data source + declarative filters — the listing,
the extension filter, and the ignore filter all stay in the scan node
(pathGlobFilter / pushed predicates), so a 100 TB source tree never
materializes unmatched files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_EXTS = (".py", ".java", ".cs", ".c")  # reference source_analyzer.py:24-29 (+.c, disabled there)


def scan_source_tree(
    spark: SparkSession,
    root: str | list[str],
    exts: tuple[str, ...] = SUPPORTED_EXTS,
    ignore: tuple[str, ...] = (),
) -> DataFrame:
    """Returns (path string, content binary, length long, ext string).

    `root` may be a list — e.g. the repo tree plus S3 dependency roots
    (sources/dependencies.py); all roots land in ONE scan node.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content", "length")
    )
    ext_pred = None
    for e in exts:
        p = F.col("path").endswith(e)
        ext_pred = p if ext_pred is None else (ext_pred | p)
    df = df.filter(ext_pred)
    for sub in ignore:
        df = df.filter(~F.col("path").contains(sub))
    return df.withColumn("ext", F.concat(F.lit("."), F.element_at(F.split("path", "\\."), -1)))
