#!/bin/bash
# Round-15 follow-on #2: focused fresh-JVM load-gated passes for the
# two video rows (landed after both the full record AND the audio
# focus run). Same per-pass protocol as the committed record
# (SPARK_GRAFT_*_SOLO + BENCH_ONLY scope, LOAD_MAX gate, settle);
# merge_focus_rows.py folds ONLY these rows in with the
# "focused_rows" disclosure.
#
# Usage: tools/bench_focus_video.sh
set -euo pipefail
cd "$(dirname "$0")/.."
ROWS="q_video_features,q_video_dedup"
LOAD_MAX="${LOAD_MAX:-1.5}"
LOAD_WAIT_S="${LOAD_WAIT_S:-600}"
SETTLE_S="${SETTLE_S:-60}"

wait_for_quiet() {
  local waited=0
  while :; do
    local load
    load="$(cut -d' ' -f1 /proc/loadavg)"
    if awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{exit !(l<=m)}'; then
      return 0
    fi
    if (( waited >= LOAD_WAIT_S )); then
      echo "[bench-focus-video] WARNING: loadavg $load still > $LOAD_MAX" >&2
      return 0
    fi
    echo "[bench-focus-video] loadavg $load > $LOAD_MAX — waiting 30s" >&2
    sleep 30
    waited=$((waited + 30))
  done
}

sf01_outs=()
for i in 1 2 3; do
  if (( i > 1 )); then sleep "$SETTLE_S"; fi
  wait_for_quiet
  echo "[bench-focus-video] sf0.1 pass $i/3 (fresh JVM)" >&2
  out="/tmp/bench_video_sf01_pass$i.json"
  SPARK_GRAFT_SF01_SOLO="$i" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_ONLY="$ROWS" SPARK_GRAFT_BENCH_OUT="$out" \
    tools/run_class.sh graft.Bench > /dev/null
  sf01_outs+=("$out")
done
python3 tools/merge_focus_rows.py bench_out.json top "$ROWS" "${sf01_outs[@]}"

sf1_outs=()
for i in 1 2 3; do
  sleep "$SETTLE_S"
  wait_for_quiet
  echo "[bench-focus-video] sf1 pass $i/3 (fresh JVM)" >&2
  out="/tmp/bench_video_sf1_pass$i.json"
  SPARK_GRAFT_SF1_SOLO="$i" SPARK_GRAFT_SF1_DIR=/root/repo/benchdata/sf1 \
    SPARK_GRAFT_BENCH_ONLY="$ROWS" SPARK_GRAFT_BENCH_OUT="$out" \
    tools/run_class.sh graft.Bench > /dev/null
  sf1_outs+=("$out")
done
python3 tools/merge_focus_rows.py bench_out.json sf1 "$ROWS" "${sf1_outs[@]}"
echo BENCH_FOCUS_VIDEO_DONE
