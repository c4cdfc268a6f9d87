#!/usr/bin/env python3
"""bench_duckdb.py with a per-query wall-clock cap (driver-side tooling) —
for big self-run SFs where a few recursive-CTE oracles run for hours.
Timed-out queries report null and are EXCLUDED from the total; compare
Spark over the same completed subset.

Usage: bench_duckdb_timeout.py <sfDir> <outDir-with-oracle_sql.json> [timeoutSec]
"""
import duckdb, json, sys, time, threading

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir, timeout=120):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    times, total, n_to = {}, 0.0, 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
            total += times[name]
        except Exception:
            times[name] = None
            n_to += 1
        finally:
            timer.cancel()
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "n_completed": len(times) - n_to, "n_timeout": n_to,
                      "timed_out": [k for k, v in times.items() if v is None],
                      "queries": times, "sf": sfdir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 120)
