"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

# Override to cross-check at another scale (catches constants that only
# exist at one sf): CHECK_SF_DIR=/root/testdata/sf0.001 python tools/...
SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame, sort_rows: bool = True) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        out[c] = s.map(_canon_val)
    cdf = pd.DataFrame(out)
    if not sort_rows:
        return cdf.reset_index(drop=True)
    return cdf.sort_values(by=list(cdf.columns)).reset_index(drop=True)


def _canon_val(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    return str(v)


def main(names: list[str] | None = None) -> int:
    import __spark_entry__ as e
    from code_graph_backend_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    selected = names or list(qs)
    failed = []
    for name in selected:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failed.append(name)
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
            failed.append(name)
        else:
            # Order-sensitive second pass: the driver's hash MAY fold in the
            # raw row stream, so also flag queries whose values only agree
            # after sorting (CHECK_ORDER_STRICT=1 turns the flag fatal).
            ra, rb = canon(sdf, sort_rows=False), canon(odf, sort_rows=False)
            if ra.equals(rb):
                print(f"PASS  {name} ({len(a)} rows, row-order exact)")
            elif os.environ.get("CHECK_ORDER_STRICT"):
                print(f"FAIL  {name}: values match only after row sort")
                failed.append(name)
            else:
                print(f"PASS~ {name} ({len(a)} rows; row ORDER differs)")
    print(f"\n{len(selected) - len(failed)}/{len(selected)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
