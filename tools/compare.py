#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py [sfDir] [verifyOutDir]

Runs each oracle_sql.json query in DuckDB over the fixture parquet tables,
loads the corresponding Spark-written parquet, sorts columns by name and
rows by all columns (the driver's normalization), and compares values.
"""
import sys, json, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            dk = normalize(con.sql(sql).df())
            sp = normalize(duckdb.sql(
                f"SELECT * FROM '{out}/{name}/*.parquet'").df())
            if list(dk.columns) != list(sp.columns):
                bad.append((name, f"schema: oracle={list(dk.columns)} spark={list(sp.columns)}"))
                continue
            if len(dk) != len(sp):
                bad.append((name, f"rows: oracle={len(dk)} spark={len(sp)}"))
                continue
            mism = None
            for c in dk.columns:
                dv, sv = dk[c].tolist(), sp[c].tolist()
                for i, (x, y) in enumerate(zip(dv, sv)):
                    if not cells_equal(x, y):
                        mism = f"col {c} row {i}: oracle={x!r} spark={y!r}"
                        break
                if mism:
                    break
            if mism:
                bad.append((name, mism))
            else:
                ok.append((name, len(dk)))
        except Exception as e:
            bad.append((name, f"error: {e}"))
    for name, n in ok:
        print(f"PASS {name} ({n} rows)")
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(oracle)} queries match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
