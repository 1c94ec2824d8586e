"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` maps every
implemented SURVEY.md §2 operator (and the pipeline extensions) to a
callable; `oracle_sql()` gives the DuckDB twin for each SQL-expressible one.
Implementations live in `code_graph_backend_spark.registry` /
`registry_ext`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from code_graph_backend_spark import registry
from code_graph_backend_spark import registry_ext  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext2  # noqa: F401  (registers on import)
from code_graph_backend_spark import registry_ext3  # noqa: F401  (registers on import)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["flagship_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
