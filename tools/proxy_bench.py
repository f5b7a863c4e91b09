#!/usr/bin/env python3
"""DuckDB proxy bench: time every oracle SQL from a Verify output dir
against a fixture dir (the denominator the judge compares graft.Bench
to). Usage:
  python3 tools/proxy_bench.py <sfdir> <verify_outdir> [reps]
Prints per-rep totals and the slowest queries of the last rep.
"""
import sys, json, glob, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
oracles = json.load(open(f"{outdir}/oracle_sql.json"))

for r in range(reps):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    per = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        per[name] = time.time() - t0
    total = sum(per.values())
    print(f"rep {r}: total={total:.2f}s n={len(per)}")
    if r == reps - 1:
        for name, dt in sorted(per.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {name}: {dt:.2f}s")
