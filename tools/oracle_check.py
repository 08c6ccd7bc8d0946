#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB views over the
parquet tables in <sfDir>, and compares (column names sorted, rows
canonicalized) against the Spark-written parquet in <verifyOutDir>/<name>/.
Dev-only tool; the shipped Scala library does not depend on it.
"""
import sys, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        # normalize fp noise, then stringify for a stable row sort
        if col.dtype.kind == "f":
            col = col.round(9)
        df[c] = col.astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    failures = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
            exp = con.execute(oracle[name]).df()
            g, e = canon(got), canon(exp)
            dt_g = got.reindex(sorted(got.columns), axis=1).dtypes
            dt_e = exp.reindex(sorted(exp.columns), axis=1).dtypes
            # parquet DATE → pandas object(datetime.date) while DuckDB emits
            # datetime64 — a representation artifact, not a schema mismatch
            def date_repr(a, b):
                return a == "object" and b.startswith("datetime64")
            dtype_diff = [(c, str(dt_g[c]), str(dt_e[c]))
                          for c in dt_g.index if c in dt_e.index
                          and str(dt_g[c]) != str(dt_e[c])
                          and not date_repr(str(dt_g[c]), str(dt_e[c]))]
            if dtype_diff:
                print(f"FAIL {name}: dtype mismatch {dtype_diff}")
                failures += 1
            elif list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(e.columns)}")
                failures += 1
            elif not g.equals(e):
                failures += 1
                print(f"FAIL {name}: values differ (rows {len(g)} vs {len(e)})")
                diff = g.compare(e) if len(g) == len(e) else None
                if diff is not None and len(diff):
                    print(diff.head(5))
                else:
                    print("  got  head:", g.head(2).to_dict("records"))
                    print("  want head:", e.head(2).to_dict("records"))
            else:
                print(f"OK   {name}: {len(g)} rows")
        except Exception as ex:
            failures += 1
            print(f"ERROR {name}: {ex}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
