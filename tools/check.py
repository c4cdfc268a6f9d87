#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (driver-side tooling,
NOT part of the library). Usage: check.py <sfDir> <verifyOutDir>.

Reads each <outDir>/<name>/ parquet (Spark result) and runs
<outDir>/oracle_sql.json[name] in DuckDB over the sfDir tables; sorts
columns by name, rows by all columns, and diffs values exactly,
reporting max float deviation when not exact.
"""
import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            odf = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        sdf = canon(con.execute(f"SELECT * FROM '{spark_glob}'").fetchdf())
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
            n_fail += 1; continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1; continue
        bad = []
        for c in odf.columns:
            a, b = odf[c], sdf[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    d = np.nanmax(np.abs(av - bv))
                    bad.append(f"{c}: max|Δ|={d:.3e} n_bad={int((~eq).sum())}")
            else:
                if not a.astype(object).where(pd.notna(a), None)\
                        .equals(b.astype(object).where(pd.notna(b), None)):
                    n_bad = int((a.astype(str) != b.astype(str)).sum())
                    bad.append(f"{c}: n_bad={n_bad} e.g. oracle={a[a.astype(str)!=b.astype(str)].head(2).tolist()} spark={b[a.astype(str)!=b.astype(str)].head(2).tolist()}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
