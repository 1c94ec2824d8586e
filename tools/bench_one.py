"""Isolated-warm single-query benchmark: replicates bench.py's environment
(same session config, same table/graph warm-up, same untimed warm pass) for
ONE OR MORE named queries, then times N samples each. This is the
"isolated-warm x2" method from BENCH_NOTES that separates a query's true
warm latency from suite-position effects and external load waves.

Usage: python tools/bench_one.py [-n SAMPLES] query_name [query_name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = max(1, int(args[1]))  # at least one timed sample
        args = args[2:]
    if not args:
        print(__doc__)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from code_graph_backend_spark.session import get_spark, read_table

    spark = get_spark(app_name="bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        try:
            read_table(spark, sf_dir, t).limit(1).count()
        except Exception:
            pass
    spark.range(0, 1000).selectExpr("id % 7 k", "id v").groupBy("k").count().count()
    try:
        spark.range(0, 64).toPandas()
        spark.range(0, 64).select("id").mapInPandas(lambda it: it, "id long").count()
    except Exception:
        pass
    from code_graph_backend_spark.graph.tpch import build_graph

    g = build_graph(spark, sf_dir)
    g.nodes.count(), g.edges.count()

    qs = e.queries()
    from code_graph_backend_spark.scratch import release_scratch

    for name in args:
        fn = qs[name]
        cnt = fn(spark, sf_dir).count()  # untimed warm pass (codegen, broadcasts)
        release_scratch()
        ts, las = [], []
        for _ in range(n):
            try:
                las.append(round(os.getloadavg()[0], 1))
            except OSError:
                las.append(-1.0)
            t0 = time.perf_counter()
            cnt = fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
            release_scratch()
        print(f"{name}: rows={cnt} samples={[round(t, 3) for t in ts]} "
              f"min={min(ts):.3f}s load1m={las}")


if __name__ == "__main__":
    main()
