#!/usr/bin/env python3
"""Determinism probe comparator: given two graft.Verify output dirs,
assert every query's parquet result is VALUE-IDENTICAL (sorted rows,
exact compare — accumulation-order nondeterminism shows up here).
Usage: python3 tools/det_compare.py <outA> <outB>
"""
import sys, glob, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
qs = sorted(d for d in os.listdir(a)
            if os.path.isdir(os.path.join(a, d)))
bad = []
for q in qs:
    fa = glob.glob(f"{a}/{q}/*.parquet")
    fb = glob.glob(f"{b}/{q}/*.parquet")
    if not fa or not fb:
        bad.append((q, "missing parquet")); continue
    n = con.execute(
        f"SELECT count(*) FROM ((SELECT * FROM read_parquet({fa!r}) "
        f"EXCEPT ALL SELECT * FROM read_parquet({fb!r})) UNION ALL "
        f"(SELECT * FROM read_parquet({fb!r}) "
        f"EXCEPT ALL SELECT * FROM read_parquet({fa!r})))").fetchone()[0]
    if n:
        bad.append((q, f"{n} differing rows"))
print(f"{len(qs)} queries compared; {len(bad)} diffs")
for q, why in bad:
    print(f"DIFF {q}: {why}")
sys.exit(1 if bad else 0)
