#!/usr/bin/env python3
"""Pandas-faithful simulation of the driver's correctness gate.

The driver (round-1 evidence) loads the Spark parquet dump and the
DuckDB oracle result into *pandas*, sorts columns by name, sorts rows
(`DataFrame.sort_values` — which is where array cells blow up), and
hash-compares values. That makes the comparison DTYPE-SENSITIVE:
a Spark decimal128 column arrives as `object` of `decimal.Decimal`
while DuckDB's `.df()` hands back `float64`, so equal values still
hash-mismatch. tools/local_verify.py (DuckDB fetchall on both sides)
misses that whole class.

This gate therefore requires, per query:
  - same sorted column names,
  - same row count,
  - same pandas dtype KIND per column (f/i/u/O/b/M...),
  - identical canonical stringification of every cell after a full
    row sort — full-precision repr for floats, str() otherwise.

Usage:  python3 tools/driver_sim.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def canonical(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(list(df.columns), kind="mergesort")
    except TypeError as e:
        raise RuntimeError(f"unsortable result (driver would error): {e}")
    cells = [tuple(canon_cell(v) for v in row)
             for row in df.itertuples(index=False, name=None)]
    cells.sort()  # None/NaN placement differences don't matter, values do
    return list(df.columns), [str(df[c].dtype.kind) for c in df.columns], cells


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(glob.glob(f"{out_dir}/q*")):
        qname = name.split("/")[-1]
        files = glob.glob(f"{name}/*.parquet")
        if not files:
            print(f"FAIL {qname}: no parquet output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            sc, sk, sv = canonical(spark_df)
        except Exception as e:
            print(f"FAIL {qname}: spark side unloadable/unsortable: {e}")
            n_fail += 1
            continue
        if qname not in oracle:
            print(f"okay {qname}: rows-only ({len(sv)} rows, loadable+sortable)")
            n_pass += 1
            continue
        try:
            oracle_df = con.execute(oracle[qname]).df()
            oc, ok, ov = canonical(oracle_df)
        except Exception as e:
            print(f"FAIL {qname}: oracle error: {e}")
            n_fail += 1
            continue
        if sc != oc:
            print(f"FAIL {qname}: columns {sc} != {oc}")
        elif sk != ok:
            print(f"FAIL {qname}: dtype kinds {dict(zip(sc, sk))} != "
                  f"{dict(zip(oc, ok))}")
        elif len(sv) != len(ov):
            print(f"FAIL {qname}: rows {len(sv)} != {len(ov)}")
        elif sv != ov:
            bad = next(i for i in range(len(sv)) if sv[i] != ov[i])
            print(f"FAIL {qname}: first diff at sorted row {bad}:")
            print(f"  spark:  {sv[bad]}")
            print(f"  duckdb: {ov[bad]}")
        else:
            print(f"PASS {qname} ({len(sv)} rows)")
            n_pass += 1
            continue
        n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
