#!/usr/bin/env python3
"""Parallel, per-query-timeout variant of check.py for big self-run SFs
(driver-side tooling, NOT part of the library). Each query compare runs
in its own worker process with a wall-clock limit, so one pathological
DuckDB oracle (recursive CTEs at sf1) cannot stall the whole suite.
Prints one line per query, unbuffered.

Usage: check_parallel.py <sfDir> <verifyOutDir> [timeoutSec] [workers] [only...]
"""
import json, sys, glob, os
from concurrent.futures import ProcessPoolExecutor, as_completed

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def check_one(args):
    sfdir, outdir, name, sql, timeout = args
    import duckdb, numpy as np
    try:
        con = duckdb.connect()
        con.execute(f"SET threads TO 4")
        # best-effort per-query wall limit via the progress handler
        import threading
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
            spark_glob = f"{outdir}/{name}/*.parquet"
            if not glob.glob(spark_glob):
                return (name, "FAIL", "no spark output")
            odf = canon(con.execute(sql).fetchdf())
            sdf = canon(con.execute(f"SELECT * FROM '{spark_glob}'").fetchdf())
        finally:
            timer.cancel()
        if list(odf.columns) != list(sdf.columns):
            return (name, "FAIL", f"cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        if len(odf) != len(sdf):
            return (name, "FAIL", f"rows oracle={len(odf)} spark={len(sdf)}")
        for c in odf.columns:
            a, b = odf[c], sdf[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    dev = float(np.nanmax(np.abs(av - bv)))
                    return (name, "FAIL", f"col {c} max|dev|={dev:.3e}")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    return (name, "FAIL", f"col {c} values differ")
        return (name, "PASS", f"{len(odf)} rows")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        if "INTERRUPT" in msg.upper():
            return (name, "TIMEOUT", f">{timeout}s in DuckDB oracle")
        return (name, "FAIL", f"oracle error {msg}")


def main(sfdir, outdir, timeout=900, workers=6, only=()):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = [(sfdir, outdir, n, s, timeout) for n, s in sorted(oracle.items())
             if not only or n in only]
    n_pass = n_fail = n_to = 0
    with ProcessPoolExecutor(max_workers=workers) as ex:
        futs = {ex.submit(check_one, it): it[2] for it in items}
        for f in as_completed(futs):
            name, st, msg = f.result()
            print(f"{st} {name}: {msg}", flush=True)
            if st == "PASS":
                n_pass += 1
            elif st == "TIMEOUT":
                n_to += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_to} oracle-timeout", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 900,
         int(sys.argv[4]) if len(sys.argv) > 4 else 6,
         tuple(sys.argv[5:]))
