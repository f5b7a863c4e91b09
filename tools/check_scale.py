#!/usr/bin/env python3
"""Scale-gate wrapper around tools/check.py: runs each oracle comparison
in its OWN subprocess with a wall-clock timeout, so one pathological
DuckDB oracle (densified-block SQL at 10x) cannot wedge the whole gate.
Reports per-query seconds and an explicit exclusions list — the
round-16 verdict's contract: any query excluded is listed BY NAME with
the reason. Usage:
  python3 tools/check_scale.py <sfdir> <verify_outdir> [timeout_sec] [out.json]
"""
import sys, json, subprocess, time, os

sfdir, outdir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 900
report_path = sys.argv[4] if len(sys.argv) > 4 else None

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
here = os.path.dirname(os.path.abspath(__file__))
results, n_ok, n_fail, n_timeout = {}, 0, 0, 0
for name in sorted(oracles):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check.py"), sfdir, outdir, name],
            capture_output=True, text=True, timeout=timeout)
        dt = round(time.time() - t0, 2)
        ok = p.returncode == 0
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith(("OK", "FAIL"))), "").strip()
        results[name] = {"status": "ok" if ok else "fail", "sec": dt,
                         "detail": line[:400]}
        if ok:
            n_ok += 1
        else:
            n_fail += 1
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {dt}s  {line[:160]}",
              flush=True)
    except subprocess.TimeoutExpired:
        dt = round(time.time() - t0, 2)
        n_timeout += 1
        results[name] = {"status": "timeout", "sec": dt,
                         "detail": f"oracle exceeded {timeout}s wall clock"}
        print(f"TIME {name}: excluded after {dt}s", flush=True)

summary = {
    "sfdir": sfdir, "n_queries": len(oracles), "n_ok": n_ok,
    "n_fail": n_fail, "n_timeout": n_timeout,
    "excluded": [n for n, r in results.items() if r["status"] == "timeout"],
    "failed": [n for n, r in results.items() if r["status"] == "fail"],
    "slowest": sorted(((r["sec"], n) for n, r in results.items()),
                      reverse=True)[:15],
    "results": results,
}
if report_path:
    json.dump(summary, open(report_path, "w"), indent=1)
print(f"\n{n_ok} OK / {n_fail} FAIL / {n_timeout} TIMEOUT "
      f"of {len(oracles)} queries")
sys.exit(1 if (n_fail or n_timeout) else 0)
