#!/usr/bin/env python3
"""Cross-round bench accounting, the honest way (VERDICT r14 wrong #2).

Compares two committed bench records PER-ROW over their COMMON TIMED
rows (lifecycle_once rows excluded on both sides), printing the sums,
the ratio, and the worst per-row regressions. Cross-round performance
claims in STATUS must come from this script's output, with BOTH sides
cut under the fresh-JVM-per-pass protocol.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [sf1]

The positional files are bench_out.json-format records; the optional
third arg selects the "sf1" section instead of the top level.
"""
import json
import sys


def load(path, section):
    rec = json.load(open(path))
    if section:
        rec = rec[section]
    once = set(rec.get("lifecycle_once", []))
    qs = {k: v for k, v in rec["queries"].items() if k not in once}
    passes = rec.get("passes") or {}
    best = {k: min(v) for k, v in passes.items() if k in qs and v}
    return qs, best


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    section = sys.argv[3] if len(sys.argv) > 3 else None
    old_q, old_b = load(old_p, section)
    new_q, new_b = load(new_p, section)
    common = sorted(set(old_q) & set(new_q))
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    so = sum(old_q[k] for k in common)
    sn = sum(new_q[k] for k in common)
    print(f"common timed rows: {len(common)}")
    print(f"  median-sum old {so:.1f}s -> new {sn:.1f}s  ratio {sn/so:.3f}x")
    if old_b and new_b:
        cb = sorted(set(old_b) & set(new_b))
        bo = sum(old_b[k] for k in cb)
        bn = sum(new_b[k] for k in cb)
        print(f"  best-pass sum over {len(cb)} rows: "
              f"{bo:.1f}s -> {bn:.1f}s  ratio {bn/bo:.3f}x")
    if only_old:
        print(f"rows only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"rows only in new ({len(only_new)}): {', '.join(only_new)}")
    regs = sorted(((new_q[k] / old_q[k], k) for k in common
                   if old_q[k] > 0.05 and new_q[k] / old_q[k] > 1.5),
                  reverse=True)
    print(f"rows regressing >1.5x on medians: {len(regs)}")
    for r, k in regs[:15]:
        print(f"  {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
