#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<outDir>/<name> parquet result, runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB over the same sf dir, and compares
schema + row values exactly (columns sorted by name, rows sorted by all
columns). Exact comparison on purpose — if we pass exact, we pass any
tolerance the driver applies.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [name...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    # normalize dtypes that differ only in physical representation
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("int32", "int8", "int16", "uint32"):
            df[c] = df[c].astype("int64")
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            failures += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype != b.dtype:
                bad_cols.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                continue
            eq = (a == b) | (a.isna() & b.isna())
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                bad_cols.append(f"{c}: row {i}: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
        if bad_cols:
            print(f"FAIL {name}: " + "; ".join(bad_cols[:4]))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
