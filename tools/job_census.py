"""Per-query Spark-job census (VERDICT r11 item 3).

The r11 close showed ~200 queries sitting at 0.3-1.7 s each — over half
the suite total — dominated not by data work but by fixed per-action
cost (job scheduling, stage setup, driver round-trips). To cut that
tail we must first know, per query, HOW MANY Spark jobs a single warm
invocation launches and where the wall time goes.

Method: warm everything exactly like bench.py (resident graph, memo
layers), then run each query once more inside its own job group and ask
the status tracker how many job ids the group accumulated. Driver-only
time (numpy kernels, plan analysis) is wall minus the jobs' task time —
not separated here; the job COUNT is the actionable number (each job on
this box costs ~30-80 ms of fixed overhead even when its stages are
trivial).

Output: job_census.json {name: {"sec": wall, "jobs": n}} sorted by job
count, plus a stdout table of the worst offenders.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from code_graph_backend_spark.session import get_spark, read_table

    spark = get_spark(app_name="job_census")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        try:
            read_table(spark, sf_dir, t).limit(1).count()
        except Exception:
            pass
    try:
        from code_graph_backend_spark.graph.tpch import build_graph

        g = build_graph(spark, sf_dir)
        g.nodes.count(), g.edges.count()
    except Exception:
        pass

    qs = e.queries()
    only = sys.argv[1:]
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # untimed warm pass (same as bench.py pass 0)
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).count()
        except Exception:
            pass
    try:
        from code_graph_backend_spark.scratch import release_scratch

        release_scratch()
    except Exception:
        pass

    out: dict[str, dict] = {}
    tracker = sc.statusTracker()
    for name, fn in qs.items():
        group = f"census:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
        except Exception as ex:
            print(f"census: {name} failed: {ex}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        out[name] = {"sec": round(dt, 3), "jobs": len(jobs)}

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(os.path.dirname(here), "job_census.json")
    ranked = dict(
        sorted(out.items(), key=lambda kv: (-kv[1]["jobs"], -kv[1]["sec"]))
    )
    with open(path, "w") as fh:
        json.dump(ranked, fh, indent=1)
    total_jobs = sum(v["jobs"] for v in out.values())
    total_sec = sum(v["sec"] for v in out.values())
    print(f"\n{len(out)} queries, {total_jobs} jobs, {total_sec:.1f}s warm")
    print(f"{'query':40s} {'jobs':>5s} {'sec':>7s}")
    for name, v in list(ranked.items())[:40]:
        print(f"{name:40s} {v['jobs']:5d} {v['sec']:7.3f}")


if __name__ == "__main__":
    main()
