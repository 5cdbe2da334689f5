#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py [sfDir] [verifyOutDir]

Runs each oracle_sql.json query in DuckDB over the fixture parquet tables,
loads the corresponding Spark-written parquet, sorts columns by name and
rows by all columns (the driver's normalization), and compares CANONICAL
SERIALIZATIONS, not loose values. The driver hash-matches serialized
output, so this gate must be serialization-strict too: an int64 Spark
column vs a HUGEINT (-> float64 in pandas) DuckDB column is a FAIL here
even when the numeric values coincide.
"""
import sys, json, math
from datetime import datetime, date

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def dtype_class(dt):
    """Collapse dtypes into classes the driver's serialization preserves.

    datetime64[ns] vs [us] serialize identically (micros precision in both
    engines here), so they share a class; int64 vs float64 vs object do NOT.
    """
    k = dt.kind
    if k == "M":
        return "timestamp"
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "object"  # strings, decimals, arrays, ...


def canon(v):
    """Type-tagged canonical serialization of one cell (recursive)."""
    if v is None:
        return "@null"
    if isinstance(v, float):
        if math.isnan(v):
            return "@nan"
        return "f:%r" % v
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "b:%s" % bool(v)
    if isinstance(v, (int, np.integer)):
        return "i:%d" % int(v)
    if isinstance(v, np.floating):
        return canon(float(v))
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            "%s=%s" % (k, canon(v[k])) for k in sorted(v)) + "}"
    if isinstance(v, datetime):
        if v != v:  # pandas NaT
            return "@null"
        return "t:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return "d:" + v.isoformat()
    try:  # pandas NaT / NA
        import pandas as pd
        if v is pd.NaT or v is pd.NA:
            return "@null"
    except Exception:
        pass
    return "o:%s:%r" % (type(v).__name__, v)


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
                dc, sc = dtype_class(dk[c].dtype), dtype_class(sp[c].dtype)
                if dc != sc:
                    mism = (f"col {c} dtype: oracle={dk[c].dtype}({dc}) "
                            f"spark={sp[c].dtype}({sc})")
                    break
                dv, sv = dk[c].tolist(), sp[c].tolist()
                for i, (x, y) in enumerate(zip(dv, sv)):
                    cx, cy = canon(x), canon(y)
                    if cx != cy:
                        mism = f"col {c} row {i}: oracle={cx} spark={cy}"
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
