#!/usr/bin/env python3
"""Per-query bench regression table across rounds.

Round-19 rewrite (round-18 verdict item 2): the driver's BENCH_r*.json
files keep only a ~2 KB output TAIL, which usually truncates the
per-query maps — parsing them "best effort" produced EMPTY baseline
columns and a vacuous "0 movers" conclusion in round 18. Sources are
now, in order of preference:

  git:<rev>      the COMMITTED BENCH_SUMMARY.json at that revision
                 (``git show <rev>:BENCH_SUMMARY.json``) — complete by
                 construction, the canonical cross-round baseline
  <path>.json    a BENCH_SUMMARY.json / Bench stdout capture on disk;
                 driver BENCH_r*.json tails are still accepted but only
                 if the full per-query map survived in the tail

and a column that yields NO per-query medians is a fatal error — this
tool REFUSES to emit a table with an empty baseline column.

Usage:
  python3 tools/bench_diff.py git:1e13370 git:1318bcc BENCH_SUMMARY.json \
      [BENCH_DIFF.md] [--labels r17,r18,r19] [--flag 1.3]
"""
import json
import re
import statistics
import subprocess
import sys


def _per_query(d):
    """Extract {query: median} from one parsed JSON object."""
    if "iterations" in d:
        return {q: statistics.median(v) for q, v in d["iterations"].items()
                if isinstance(v, list) and v}
    if "queries" in d and isinstance(d["queries"], dict):
        return {q: float(v) for q, v in d["queries"].items()
                if isinstance(v, (int, float)) and v >= 0}
    return {}


def _from_text(text):
    """Parse Bench JSONL output (or a driver tail holding it): prefer the
    iterations line (median over raw samples), fall back to the medians
    line."""
    best = {}
    for line in text.splitlines():
        line = line.strip()
        # driver tails prefix sbt's "[info] " — strip any log prefix
        m = re.search(r'\{.*\}$', line)
        if not m:
            continue
        try:
            d = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        got = _per_query(d)
        if "iterations" in d and got:
            return got          # authoritative
        if got and len(got) > len(best):
            best = got
    return best


def medians(spec):
    if spec.startswith("git:"):
        rev = spec[4:]
        text = subprocess.run(
            ["git", "show", f"{rev}:BENCH_SUMMARY.json"],
            capture_output=True, text=True, check=True).stdout
        return _from_text(text)
    with open(spec) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d:   # driver BENCH_r*.json
            return _from_text(d["tail"])
    except json.JSONDecodeError:
        pass
    return _from_text(text)


def main():
    argv = sys.argv[1:]
    flag = 1.3
    labels = None
    if "--flag" in argv:
        i = argv.index("--flag")
        flag = float(argv[i + 1]); del argv[i:i + 2]
    if "--labels" in argv:
        i = argv.index("--labels")
        labels = argv[i + 1].split(","); del argv[i:i + 2]
    outp = next((p for p in argv if p.endswith(".md")), None)
    specs = [p for p in argv if not p.endswith(".md")]
    if len(specs) < 2:
        sys.exit("need at least two sources (git:<rev> or path)")
    if labels is None:
        labels = [s.replace("git:", "").split("/")[-1].replace(".json", "")
                  for s in specs]
    cols = []
    for lab, s in zip(labels, specs):
        m = medians(s)
        if not m:
            sys.exit(f"REFUSING to diff: source '{s}' yielded no per-query "
                     "medians — an empty baseline column makes every mover "
                     "claim vacuous. Use git:<round-close-rev> for a "
                     "committed BENCH_SUMMARY.json.")
        cols.append((lab, m))
    last, prev = cols[-1][1], cols[-2][1]
    names = sorted(set().union(*[set(c[1]) for c in cols]))
    lines = ["| query | " + " | ".join(n for n, _ in cols) + " | last/prev |",
             "|---|" + "---|" * (len(cols) + 1)]
    movers = []
    for q in names:
        vals = [c.get(q) for _, c in cols]
        ratio = (last[q] / prev[q]) if q in last and q in prev and prev[q] > 0 else None
        flagged = ratio is not None and (ratio > flag or ratio < 1 / flag)
        if flagged:
            movers.append((ratio, q))
        lines.append("| " + q + " | " +
                     " | ".join("" if v is None else f"{v:.3f}" for v in vals) +
                     " | " + ("" if ratio is None else
                              f"{ratio:.2f}x" + (" ⚠" if flagged else "")) + " |")
    totals = [f"{sum(c.values()):.1f}" for _, c in cols]
    lines.append("| **total** | " + " | ".join(totals) + " |  |")
    regress = sorted([m for m in movers if m[0] > 1], reverse=True)
    improve = sorted([m for m in movers if m[0] < 1])
    hdr = [f"# Bench diff — {' vs '.join(labels)}", "",
           f"Totals (sum of per-query medians): "
           + " / ".join(f"{l} {t}s" for (l, _), t in zip(cols, totals)) + ".",
           f"Movers (last vs prev, >{flag}x either way): "
           f"**{len(regress)} slower, {len(improve)} faster**.", ""]
    if regress:
        hdr.append("Slower: " + ", ".join(
            f"{q} {r:.2f}x" for r, q in regress[:15]) + ".")
    if improve:
        hdr.append("Faster: " + ", ".join(
            f"{q} {1/r:.2f}x" for r, q in improve[:15]) + ".")
    hdr.append("")
    out = "\n".join(hdr + lines) + "\n"
    if outp:
        with open(outp, "w") as f:
            f.write(out)
        print(f"wrote {outp}: {len(names)} queries, "
              f"{len(regress)} slower / {len(improve)} faster movers")
    else:
        print(out)


if __name__ == "__main__":
    main()
