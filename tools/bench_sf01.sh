#!/bin/bash
# Committed-artifact sf0.1 protocol (VERDICT r13 #1): one FRESH JVM per
# sf0.1 pass — the in-JVM 3-pass protocol recorded whatever the machine
# was doing (r13's record was ~13% ambient-inflated with 35 phantom
# regressions). Each solo invocation pays its own (untimed) warmups and
# times exactly one pass from identical cold state, recording
# /proc/loadavg at pass start/end; a pass REFUSES to start while the
# 1-minute load average exceeds LOAD_MAX (default 1.5), waiting up to
# LOAD_WAIT_S (default 600 s) for the machine to quiet down first.
# merge_sf01.py folds the single-pass records into bench_out.json's
# top-level section with per-row medians.
#
# Usage: tools/bench_sf01.sh [sf_dir] [n_passes]
# Requires: target/scala-2.13/classes compiled.
#
# KEEP_SF1=1 preserves an existing bench_out.json "sf1" section across
# the re-record (merge_sf01.py drops it by default, because the normal
# workflow re-records sf1 right after sf0.1). Set it for an
# sf0.1-ONLY re-record so the committed sf1 medians survive.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
N="${2:-3}"
LOAD_MAX="${LOAD_MAX:-1.5}"
LOAD_WAIT_S="${LOAD_WAIT_S:-600}"
# Fixed settle between passes: the prior JVM's exit leaves decaying
# 1-min loadavg and async page-cache writeback that the load guard
# alone under-detects (the r14 record's pass 2 started at loadavg 2.9
# and ran 30% hot; pass 1 from a cold-quiet machine matched the r12
# total within 3.5%).
SETTLE_S="${SETTLE_S:-120}"
[[ -d target/scala-2.13/classes ]] || {
  echo "[bench-sf01] ERROR: target/scala-2.13/classes missing — run" \
    "'sbt compile' first" >&2
  exit 1
}
[[ -d "$SF_DIR" ]] || {
  echo "[bench-sf01] ERROR: sf dir '$SF_DIR' missing" >&2
  exit 1
}

wait_for_quiet() {
  local waited=0
  while :; do
    local load
    load="$(cut -d' ' -f1 /proc/loadavg)"
    if awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{exit !(l<=m)}'; then
      return 0
    fi
    if (( waited >= LOAD_WAIT_S )); then
      echo "[bench-sf01] WARNING: loadavg $load still > $LOAD_MAX after" \
        "${LOAD_WAIT_S}s — pass proceeds, load is recorded in the" \
        "artifact" >&2
      return 0
    fi
    echo "[bench-sf01] loadavg $load > $LOAD_MAX — waiting 30s" >&2
    sleep 30
    waited=$((waited + 30))
  done
}

outs=()
for i in $(seq 1 "$N"); do
  if (( i > 1 )); then sleep "$SETTLE_S"; fi
  wait_for_quiet
  echo "[bench-sf01] pass $i/$N (fresh JVM)" >&2
  out="/tmp/bench_sf01_pass$i.json"
  SPARK_GRAFT_SF01_SOLO="$i" SPARK_GRAFT_SF_DIR="$SF_DIR" \
    SPARK_GRAFT_BENCH_OUT="$out" tools/run_class.sh graft.Bench \
    > /dev/null
  outs+=("$out")
done
python3 tools/merge_sf01.py bench_out.json "${outs[@]}"
