"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` in DuckDB at
a given scale factor and compares row count, sorted column names, and
canonicalized cell values (order-insensitive).  Stricter than a hash:
reports the first differing rows on mismatch.

Usage:
    python3 tests/oracle_harness.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_frame(pdf):
    """pandas frame -> (sorted column names, sorted list of row tuples)."""
    import numpy as np
    import pandas as pd
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("NULL")
            elif isinstance(v, pd.Timestamp):
                out.append(v.isoformat())
            elif isinstance(v, np.floating):
                out.append(repr(float(v)))
            elif isinstance(v, np.integer):
                out.append(str(int(v)))
            elif isinstance(v, np.ndarray):
                out.append(canon_cell(list(v)))
            else:
                out.append(canon_cell(v))
        rows.append(tuple(out))
    rows.sort()
    return cols, rows


def run(sf_dir: str, only: set[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from padawan_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"WARNING: unknown query names ignored: {sorted(unknown)}")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        scols, srows = canon_frame(sdf)
        ocols, orows = canon_frame(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns differ\n  spark : {scols}\n  oracle: {ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"  spark : {a}\n  oracle: {b}")
            failures += 1
            continue
        print(f"OK   {name}: {len(srows)} rows")
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    n = run(args.sf, only)
    print(f"{'ALL OK' if n == 0 else f'{n} FAILURES'}")
    sys.exit(1 if n else 0)
