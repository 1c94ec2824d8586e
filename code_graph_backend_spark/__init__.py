"""code_graph_backend_spark — a PySpark-native property-graph analytics engine.

Re-implements the query and data-processing capabilities of
FalkorDB/code-graph-backend (reference at /root/reference, read-only) as an
idiomatic Spark DataFrame library:

- ``graph``      : property-graph data model (nodes/edges DataFrames), storage,
                   catalog, and the TPC-H "graph twin" used by the oracle tests.
- ``operators``  : read-side operators (lookups, hops, traversal, anti-join,
                   range join, aggregates, prefix search) — SURVEY.md §2.
- ``mutations``  : MERGE-style upserts with id return, cascade delete,
                   coverage propagation, and the op-log (time travel).
- ``sources``    : ingest (source-tree scan, Python analyzer, lcov, git log).
- ``functions``  : LLM-data-pipeline extensions (dedup, similarity search,
                   text analysis, multimodal plumbing).
- ``streaming``  : windowed analytics and the op-log-as-stream refinement.
- ``service``    : thin functions mirroring the reference's 11 HTTP endpoints.

Everything is DataFrame-first: Catalyst plans the physical execution; custom
code exists only where Spark lacks the primitive (iterative var-length
traversal, upsert-with-id-return, op-log replay).
"""

__version__ = "0.1.0"
