#!/usr/bin/env python3
"""Per-query bench regression table across rounds (round-16 verdict item
3): parse the driver tails of BENCH_r{A}.json / BENCH_r{B}.json plus an
optional fresh BENCH_SUMMARY.json, take each query's MEDIAN over its
iteration array, and emit a markdown table flagging every query whose
median moved more than `flag` (default 1.3x) between the last two
columns. Usage:
  python3 tools/bench_diff.py BENCH_r15.json BENCH_r16.json [BENCH_SUMMARY.json] [out.md]
"""
import json, re, statistics, sys


def medians(path):
    first = open(path).readline()
    try:
        d = json.loads(first)  # Bench's own JSONL: line 1 = median map
    except json.JSONDecodeError:
        d = json.load(open(path))
    if "tail" in d:  # driver capture: find the per-query iteration arrays
        m = re.search(r'"queries"\s*:\s*\{', d["tail"])
        if not m:
            return {}
        # the tail may hold a {"metric":"iterations","queries":{q:[...]}}
        # line; balance braces from the match
        s = d["tail"][m.end() - 1:]
        depth, end = 0, None
        for i, c in enumerate(s):
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        qs = json.loads(s[:end])
    else:  # Bench's own BENCH_SUMMARY.json: {"queries": {q: median}}
        qs = d.get("queries", d)
    out = {}
    for q, v in qs.items():
        out[q] = statistics.median(v) if isinstance(v, list) else float(v)
    return out


def main():
    paths = [p for p in sys.argv[1:] if p.endswith(".json")]
    outp = next((p for p in sys.argv[1:] if p.endswith(".md")), None)
    cols = [(p.split("/")[-1].replace(".json", ""), medians(p)) for p in paths]
    last, prev = cols[-1][1], cols[-2][1]
    names = sorted(set().union(*[set(c[1]) for c in cols]))
    lines = ["| query | " + " | ".join(n for n, _ in cols) +
             " | last/prev |", "|---|" + "---|" * (len(cols) + 1)]
    movers = []
    for q in names:
        vals = [c.get(q) for _, c in cols]
        ratio = (last[q] / prev[q]) if q in last and q in prev and prev[q] > 0 else None
        flag = ratio is not None and (ratio > 1.3 or ratio < 1 / 1.3)
        if flag:
            movers.append((ratio, q))
        lines.append("| " + q + " | " +
                     " | ".join("" if v is None else f"{v:.3f}" for v in vals) +
                     " | " + ("" if ratio is None else
                              f"{ratio:.2f}" + (" ⚠" if flag else "")) + " |")
    tot = ["**total**"] + [f"{sum(c.values()):.1f}" for _, c in cols]
    lines.append("| " + " | ".join(tot) + " | |")
    hdr = [f"# Bench medians: {' vs '.join(n for n, _ in cols)}", ""]
    if movers:
        hdr += ["Movers (>1.3x either way, last vs prev): " +
                ", ".join(f"{q} ({r:.2f}x)" for r, q in
                          sorted(movers, reverse=True)), ""]
    else:
        hdr += ["No query moved more than 1.3x between the last two columns.", ""]
    text = "\n".join(hdr + lines) + "\n"
    if outp:
        open(outp, "w").write(text)
        print(f"wrote {outp}: {len(names)} queries, {len(movers)} movers")
    else:
        print(text)


if __name__ == "__main__":
    main()
