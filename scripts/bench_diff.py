#!/usr/bin/env python3
"""Per-query bench regression table between two rounds.

Usage: python3 scripts/bench_diff.py OLD NEW [--top N]

OLD/NEW are bench artifacts, each either
  - a full Bench.scala output line (bench/BENCH_LOCAL_r<K>.json), or
  - a driver wrapper BENCH_r<K>.json whose "tail" field holds the
    (possibly truncated) end of that line — only the per-query pairs
    that survived truncation are recovered.

Emits a markdown table of the worst regressions and best improvements
on the queries common to both, plus totals. Exit code 0 always — this
is a report, not a gate.
"""
import json
import re
import sys


def load(path):
    """-> (per_query: dict name->sec, meta: dict)"""
    with open(path) as f:
        raw = f.read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "tail" in obj and "queries" not in obj:
        # driver wrapper: recover whatever per-query pairs survived in the
        # tail plus the headline fields (always at the line's end by design)
        tail = obj["tail"]
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
              if m.group(1) not in ("warmup_total", "value")}
        meta = {}
        for k in ("warmup_total", "value", "n_queries"):
            m = re.search(r'"%s":([0-9.]+)' % k, tail)
            if m:
                meta[k] = float(m.group(1))
        m = re.search(r'"pass_totals":\[([0-9.,]+)\]', tail)
        if m:
            meta["pass_totals"] = [float(x) for x in m.group(1).split(",")]
        meta["truncated"] = True
        return qs, meta
    if isinstance(obj, dict) and "queries" in obj:
        meta = {k: obj[k] for k in
                ("warmup_total", "value", "n_queries", "pass_totals", "sf")
                if k in obj}
        meta["truncated"] = False
        return obj["queries"], meta
    raise SystemExit(f"{path}: not a recognizable bench artifact")


def main():
    argv = sys.argv[1:]
    args, top, i = [], 10, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--top"):
            if "=" in a:
                top = int(a.split("=")[1])
            else:
                top = int(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    old_q, old_m = load(args[0])
    new_q, new_m = load(args[1])
    common = sorted(set(old_q) & set(new_q))
    print(f"old: {args[0]} ({len(old_q)} queries"
          f"{', TRUNCATED capture' if old_m.get('truncated') else ''})")
    print(f"new: {args[1]} ({len(new_q)} queries"
          f"{', TRUNCATED capture' if new_m.get('truncated') else ''})")
    print(f"common: {len(common)} | new-only: {len(set(new_q) - set(old_q))}"
          f" | old-only: {len(set(old_q) - set(new_q))}")
    if "value" in old_m and "value" in new_m:
        print(f"headline total: {old_m['value']:.1f} -> {new_m['value']:.1f} s")
    ct_old = sum(old_q[q] for q in common)
    ct_new = sum(new_q[q] for q in common)
    if common:
        print(f"common-row total: {ct_old:.1f} -> {ct_new:.1f} s "
              f"({ct_new / ct_old:.2f}x)")
    # ratio table; sub-50ms rows are noise-dominated, skip them
    rows = [(new_q[q] / max(old_q[q], 1e-9), old_q[q], new_q[q], q)
            for q in common if max(old_q[q], new_q[q]) >= 0.05]
    rows.sort(reverse=True)
    print("\n| query | old s | new s | ratio |\n|---|---|---|---|")
    shown = (rows if len(rows) <= 2 * top
             else rows[:top] + [("...",)] + rows[-top:])
    for r in shown:
        if r[0] == "...":
            print("| ... | | | |")
        else:
            ratio, o, n, q = r
            print(f"| {q} | {o:.3f} | {n:.3f} | {ratio:.2f}x |")


if __name__ == "__main__":
    main()
