"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Replicates bench.py's session environment (same config, warm graph) so the
captured plan is the one the bench executes, then writes
plans/<tag>/<query>_<suffix>.txt for each named query.

Usage: python tools/explain_dump.py --tag r11 --suffix before q1 [q2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    args = sys.argv[1:]
    tag, suffix = "r11", "before"
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)
    if not names:
        print(__doc__)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from code_graph_backend_spark.session import get_spark

    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    from code_graph_backend_spark.graph.tpch import build_graph

    g = build_graph(spark, sf_dir)
    g.nodes.count(), g.edges.count()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange nodes)")


if __name__ == "__main__":
    main()
