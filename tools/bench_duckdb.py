#!/usr/bin/env python3
"""Times the oracle SQL suite in DuckDB for comparison with graft.Bench
(driver-side tooling, NOT part of the library).
Usage: bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    times, total = {}, 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
            total += times[name]
        except Exception as e:
            times[name] = None
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "queries": times, "sf": sfdir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
