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
# Fail fast on missing preconditions (ADVICE r13) — merge_sf1.py runs
# LAST, so a missing bench_out.json used to surface only after all N
# expensive fresh-JVM passes had already burned their wall-clock.
[[ -f bench_out.json ]] || {
  echo "[bench-sf1] ERROR: bench_out.json missing — run the sf0.1" \
    "committed-artifact bench first (it writes the file merge_sf1.py" \
    "folds the sf1 section into)" >&2
  exit 1
}
[[ -d target/scala-2.13/classes ]] || {
  echo "[bench-sf1] ERROR: target/scala-2.13/classes missing — run" \
    "'sbt compile' first" >&2
  exit 1
}
[[ -d "$SF1_DIR" ]] || {
  echo "[bench-sf1] ERROR: sf1 data dir '$SF1_DIR' missing — run" \
    "graft.MakeSf1 first" >&2
  exit 1
}
# Same inter-pass hygiene as bench_sf01.sh (the r14 sf0.1 record's
# lesson): refuse to start a pass on residual load, settle between
# passes so the prior JVM's decaying loadavg/writeback drains.
LOAD_MAX="${LOAD_MAX:-1.5}"
LOAD_WAIT_S="${LOAD_WAIT_S:-600}"
SETTLE_S="${SETTLE_S:-120}"
wait_for_quiet() {
  local waited=0
  while :; do
    local load
    load="$(cut -d' ' -f1 /proc/loadavg)"
    if awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{exit !(l<=m)}'; then
      return 0
    fi
    if (( waited >= LOAD_WAIT_S )); then
      echo "[bench-sf1] WARNING: loadavg $load still > $LOAD_MAX after" \
        "${LOAD_WAIT_S}s — pass proceeds" >&2
      return 0
    fi
    echo "[bench-sf1] loadavg $load > $LOAD_MAX — waiting 30s" >&2
    sleep 30
    waited=$((waited + 30))
  done
}
outs=()
for i in $(seq 1 "$N"); do
  if (( i > 1 )); then sleep "$SETTLE_S"; fi
  wait_for_quiet
  echo "[bench-sf1] pass $i/$N (fresh JVM)" >&2
  out="/tmp/bench_sf1_pass$i.json"
  SPARK_GRAFT_SF1_SOLO="$i" SPARK_GRAFT_SF1_DIR="$SF1_DIR" \
    SPARK_GRAFT_BENCH_OUT="$out" tools/run_class.sh graft.Bench \
    > /dev/null
  outs+=("$out")
done
python3 tools/merge_sf1.py bench_out.json "${outs[@]}"
