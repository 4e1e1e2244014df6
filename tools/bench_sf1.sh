#!/bin/bash
# Committed-artifact sf1 protocol (VERDICT r12 #3): one FRESH JVM per
# sf1 pass — in-JVM back-to-back passes accumulated JVM/fixture state
# and inflated committed medians 1.3-4x for memory-heavy rows. Each
# solo invocation pays its own (untimed) warmups and times exactly one
# pass from identical cold state; merge_sf1.py folds the single-pass
# records into bench_out.json's "sf1" section with per-row medians.
#
# Usage: tools/bench_sf1.sh [sf1_dir] [n_passes]
# Requires: target/scala-2.13/classes compiled; bench_out.json present
# (the sf0.1 committed-artifact run writes it first).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1_DIR="${1:-${SPARK_GRAFT_SF1_DIR:-/root/repo/benchdata/sf1}}"
N="${2:-3}"
outs=()
for i in $(seq 1 "$N"); do
  echo "[bench-sf1] pass $i/$N (fresh JVM)" >&2
  out="/tmp/bench_sf1_pass$i.json"
  SPARK_GRAFT_SF1_SOLO="$i" SPARK_GRAFT_SF1_DIR="$SF1_DIR" \
    SPARK_GRAFT_BENCH_OUT="$out" tools/run_class.sh graft.Bench \
    > /dev/null
  outs+=("$out")
done
python3 tools/merge_sf1.py bench_out.json "${outs[@]}"
