#!/usr/bin/env python3
"""Peak-scratch monitor for the bounded-scratch q173 certification:
samples the byte size of Spark's local scratch dirs (blockmgr-* shuffle
files, spark-* temp) and DuckDB temp while a gate runs, and records the
peak plus a coarse timeline. The bounded-scratch contract is a DISK
claim ("peak shuffle scratch is bounded by the configured step budget,
not by the data"), so the certification artifact must carry a measured
figure, not an argued one.

Usage: python3 tools/scratch_monitor.py <out.json> [interval_sec]
Runs until SIGTERM/SIGINT; writes the report on every sample so a kill
at any point leaves a complete artifact.
"""
import sys, os, glob, json, time, signal

out = sys.argv[1]
interval = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0

PATTERNS = ["/tmp/blockmgr-*", "/tmp/spark-*", "/tmp/.tmp", "/tmp/duckdb_temp*"]

def du(path):
    total = 0
    for root, _, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.lstat(os.path.join(root, f)).st_size
            except OSError:
                pass
    return total

peak = 0
peak_at = None
timeline = []
t0 = time.time()
stop = False

def _halt(sig, frame):
    global stop
    stop = True

signal.signal(signal.SIGTERM, _halt)
signal.signal(signal.SIGINT, _halt)

while not stop:
    cur = sum(du(p) for pat in PATTERNS for p in glob.glob(pat))
    t = round(time.time() - t0, 1)
    if cur > peak:
        peak, peak_at = cur, t
    timeline.append([t, cur])
    # keep the timeline bounded: decimate to every other sample at 2k
    if len(timeline) > 2000:
        timeline = timeline[::2]
    with open(out, "w") as f:
        json.dump({
            "patterns": PATTERNS,
            "interval_sec": interval,
            "elapsed_sec": t,
            "peak_scratch_bytes": peak,
            "peak_scratch_gb": round(peak / 1e9, 2),
            "peak_at_sec": peak_at,
            "samples": len(timeline),
            "timeline_tail": timeline[-20:],
        }, f, indent=1)
    time.sleep(interval)
