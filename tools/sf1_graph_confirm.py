#!/usr/bin/env python3
"""Independent sf1 confirmation of the three graph queries whose naive
DuckDB oracles do not complete at sf1 (driver-side tooling, NOT part of
the library; VERDICT r11 ask #3).

The per-SF driver gate (sf0.01/sf0.1) already hash-matches these three
against the NAIVE formulations (id-oriented 3-way self-join; recursive-
CTE BFS). At sf1 those oracles exceed hours/disk (the recursive reach
CTE spilled >60 GB before running the box out of disk), so this script
re-derives each result through a DIFFERENT affordable independent path
and compares against the Spark Verify dump:

  q142  degree-ordered triangle census IN DUCKDB — same counts through a
        different engine and execution (plus exact n_nodes/n_edges/
        clustering re-derivation); ~840M bounded wedge probes vs the
        naive join's unbounded hub blowup.
  q144  SAMPLED-NODE exact local clustering in DuckDB (the q227
        sampled-oracle pattern): every 40th node's neighbor pairs are
        probed against the edge table — the naive per-node formulation,
        affordable because only the sample pays the deg² cost.
  q184  pair-graph edges built by the oracle's own non-recursive
        shingle/jaccard CTEs in DuckDB, then components + BFS hops in
        plain Python (independent implementation of the recursive part),
        full-table compare.

Usage: sf1_graph_confirm.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, time
from collections import deque

def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute("SET memory_limit='24GB'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sfdir}/lineitem.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0

    # ---- shared co-purchase edge table (q142/q144) ------------------
    t0 = time.time()
    con.execute("""CREATE TEMP TABLE e AS
      SELECT a.l_partkey AS u, b2.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b2
        ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
      GROUP BY 1, 2""")
    con.execute("""CREATE TEMP TABLE deg AS
      SELECT x AS v, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1""")
    print(f"[edges] {con.execute('SELECT count(*) FROM e').fetchone()[0]} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- q142: degree-ordered census --------------------------------
    t0 = time.time()
    got = con.execute("""
      WITH o AS (SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS s,
                        CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS t
                 FROM e JOIN deg da ON da.v = e.u JOIN deg db ON db.v = e.v),
      tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
              FROM o o1 JOIN o o2 ON o1.t = o2.s
                        JOIN o o3 ON o3.s = o1.s AND o3.t = o2.t),
      w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS wedges,
                   CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
      ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
      SELECT n_nodes, n_edges, n_triangles,
             round(3.0 * n_triangles / wedges, 6) AS global_clustering
      FROM w CROSS JOIN ne CROSS JOIN tri""").fetchone()
    want = con.execute(
        f"SELECT n_nodes, n_edges, n_triangles, global_clustering "
        f"FROM '{outdir}/q142_triangle_count/*.parquet'").fetchone()
    ok = tuple(got) == tuple(want)
    n_fail += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} q142_triangle_count: degree-ordered "
          f"{tuple(got)} vs spark {tuple(want)} ({time.time()-t0:.0f}s)", flush=True)

    # ---- q144: sampled-node naive local clustering ------------------
    t0 = time.time()
    bad = con.execute(f"""
      WITH adj AS (SELECT u AS v, v AS w FROM e UNION ALL SELECT v, u FROM e),
      s AS (SELECT v FROM deg WHERE v % 40 = 0),
      pairs AS (SELECT a.v, a.w AS x, b.w AS y
                FROM adj a JOIN adj b ON a.v = b.v AND a.w < b.w
                WHERE a.v % 40 = 0),
      t AS (SELECT pairs.v AS v, CAST(count(*) AS BIGINT) AS n_triangles
            FROM pairs JOIN e ON e.u = pairs.x AND e.v = pairs.y GROUP BY 1),
      mine AS (SELECT deg.v, deg.d AS deg, COALESCE(t.n_triangles, 0) AS n_triangles,
                      CASE WHEN deg.d > 1
                           THEN round(2.0 * COALESCE(t.n_triangles, 0)
                                      / (deg.d * (deg.d - 1)), 6) END AS local_cc
               FROM deg LEFT JOIN t ON t.v = deg.v WHERE deg.v % 40 = 0),
      spark AS (SELECT * FROM '{outdir}/q144_local_clustering/*.parquet'
                WHERE v % 40 = 0)
      SELECT count(*) FROM mine FULL OUTER JOIN spark USING (v)
      WHERE mine.deg IS DISTINCT FROM spark.deg
         OR mine.n_triangles IS DISTINCT FROM spark.n_triangles
         OR mine.local_cc IS DISTINCT FROM spark.local_cc""").fetchone()[0]
    n_samp = con.execute("SELECT count(*) FROM deg WHERE v % 40 = 0").fetchone()[0]
    ok = bad == 0 and n_samp > 0
    n_fail += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} q144_local_clustering: sampled "
          f"{n_samp} nodes, {bad} mismatches ({time.time()-t0:.0f}s)", flush=True)

    # ---- q184: oracle's own edge CTEs + Python BFS ------------------
    t0 = time.time()
    sql = oracle["q184_dedup_hops"]
    cut = sql.index(", e AS (")
    edges_sql = sql[:cut] + " SELECT id_a, id_b FROM p"
    pe = con.execute(edges_sql).fetchall()
    print(f"[q184] {len(pe)} pair edges ({time.time()-t0:.0f}s)", flush=True)
    adj = {}
    for a, b in pe:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    # components -> min-label rep (the reach CTE's MIN(lbl))
    rep, hops = {}, {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, q = [], deque([start])
        seen.add(start)
        while q:
            x = q.popleft(); comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y); q.append(y)
        r = min(comp)
        for x in comp:
            rep[x] = r
        # BFS distances from the rep (unique source per component)
        hops[r] = 0
        q = deque([r])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in hops:
                    hops[y] = hops[x] + 1; q.append(y)
    mine = {(x, rep[x], hops[x]) for x in adj}
    spark = set(map(tuple, con.execute(
        f"SELECT doc_id, group_rep, hops FROM "
        f"'{outdir}/q184_dedup_hops/*.parquet'").fetchall()))
    ok = mine == spark
    n_fail += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} q184_dedup_hops: {len(mine)} rows python-BFS"
          f"{'' if ok else f' ({len(mine - spark)} only-mine, {len(spark - mine)} only-spark)'}"
          f" ({time.time()-t0:.0f}s)", flush=True)

    print(f"\n{3 - n_fail} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
