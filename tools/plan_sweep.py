"""One-shot plan-quality sweep over every registered query (r10).

Walks the optimized logical plan of all registry queries at
$SPARK_GRAFT_SF_DIR (default sf0.001 — plan shape is SF-independent)
and reports, per query:

- ``cross``      — Join nodes with no join condition whose BOTH child
                   subtrees are unbounded (no Aggregate/Limit/
                   WindowGroupLimit below): a corpus x corpus cartesian.
                   One-row broadcast stat joins (Aggregate-bounded side)
                   are fine and not counted.
- ``rowpython``  — row-at-a-time Python UDF eval nodes (BatchEvalPython
                   / PythonUDF in a Project without Arrow): the 10-100x
                   slow path vs ArrowEvalPython / mapInPandas.
- ``exchanges``  — Exchange count in the physical plan (context stat,
                   not a failure).

Findings graduate into tests/test_plans.py tripwires (the VERDICT r9
item 5 pattern: sweep once by hand, then pin forever).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


_BOUNDED = {"Aggregate", "WindowGroupLimit", "GlobalLimit", "LocalLimit"}
_SMALL_LEAVES = {"LocalRelation", "Range", "OneRowRelation"}


def _bounded(node) -> bool:
    """Row count flowing OUT of `node` is small at any corpus scale.

    The r10 window tripwire's flat subtree scan has a hole: a 1-row
    Aggregate on the BROADCAST side of a cross join makes the whole
    subtree 'contain an Aggregate' while the streamed side still flows
    corpus-proportional rows into the Window above. Boundedness must be
    computed recursively along the dataflow: an agg/limit bounds its
    output; a join's output is bounded only if BOTH inputs are (1-row x
    corpus = corpus); literal leaves are bounded; corpus scans are not;
    unary nodes pass through; Union needs all children bounded."""
    cls = node.getClass().getSimpleName()
    if cls in _BOUNDED or cls in _SMALL_LEAVES:
        return True
    ch = node.children()
    if ch.size() == 0:
        return False
    return all(_bounded(ch.apply(i)) for i in range(ch.size()))


def _unbounded(node) -> bool:
    return not _bounded(node)


def sweep(spark, sf_dir):
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan()
        except Exception as ex:
            out[name] = {"error": str(ex)[:200]}
            continue
        cross = 0
        rowpython = 0
        gwindow = 0
        for n in _walk(plan):
            cls = n.getClass().getSimpleName()
            if (
                cls == "Join"
                and n.condition().isEmpty()
                and "broadcast" not in n.hint().toString().lower()
            ):
                ch = n.children()
                if _unbounded(ch.apply(0)) and _unbounded(ch.apply(1)):
                    cross += 1
            if cls == "BatchEvalPython":
                rowpython += 1
            if cls == "Window" and n.partitionSpec().isEmpty():
                if _unbounded(n.children().apply(0)):
                    gwindow += 1
        rec = {}
        if cross:
            rec["cross"] = cross
        if rowpython:
            rec["rowpython"] = rowpython
        if gwindow:
            rec["global_window"] = gwindow
        if rec:
            out[name] = rec
    return out


def shuffle_exchanges(df) -> int:
    """Shuffle-boundary count in the physical plan (hash / range /
    single-partition Exchange). BroadcastExchange is excluded — it is
    the cheap strategy this repo reaches for on purpose, and a
    broadcast-to-shuffle strategy regression surfaces as +1 here
    anyway. Counted on the pre-execution plan (AQE initial), so it is
    the STATIC worst case and deterministic for a cold session — which
    is why the suite gate (test_shuffle_count_never_regresses) asserts
    strict EQUALITY against the committed cold-session baseline: an
    increase is a regression, and a decrease (a silent improvement)
    must refresh the baseline in the same commit."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def sweep_exchanges(spark, sf_dir) -> dict[str, int]:
    # Iterate in SORTED-NAME order, not the grading rotation: building a
    # query's DataFrame can run guard jobs and materialize shared
    # substrate memos, so a later query's static plan (broadcast vs
    # sort-merge once in-memory stats exist) depends on what was built
    # before it. The rotation is re-emitted every round; sorting pins
    # the census's materialization order so a rotation regen can never
    # move the counts (r11: the r10-rotation baseline tripped on 6
    # substrate-sharing queries after the r11 rotation regen).
    import __spark_entry__ as entry

    out = {}
    qs = entry.queries()
    for name in sorted(qs):
        try:
            out[name] = shuffle_exchanges(qs[name](spark, sf_dir))
        except Exception:
            out[name] = -1
    return out


def main():
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        if "--exchanges" in sys.argv:
            print(json.dumps(sweep_exchanges(spark, sf_dir), indent=1,
                             sort_keys=True))
        else:
            print(json.dumps(sweep(spark, sf_dir), indent=1, sort_keys=True))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
