#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run Verify's output
against DuckDB oracles and compare (dev tool only — not shipped code).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("Int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="last")
    return df


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        path = f"{out}/{name}"
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.read_parquet(path))
            duck_df = norm(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        sdt, ddt = list(map(str, spark_df.dtypes)), list(map(str, duck_df.dtypes))
        if sdt != ddt:
            print(f"WARN {name}: dtypes spark={sdt} duck={ddt}")
        eq = spark_df.equals(duck_df)
        if not eq:
            # locate first differing cell for diagnostics
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                bad = ~((a == b) | (a.isna() & b.isna()))
                if bad.any():
                    i = int(np.argmax(bad.values))
                    print(f"FAIL {name}: col {c} row {i}: "
                          f"spark={a.iloc[i]!r} duck={b.iloc[i]!r} "
                          f"({int(bad.sum())} diffs)")
                    break
            else:
                print(f"FAIL {name}: frames differ (dtype-level)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
