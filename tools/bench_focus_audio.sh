#!/bin/bash
# Round-15 follow-on: focused fresh-JVM load-gated passes for the four
# audio rows, which landed while the full two-section r15 record was
# already running (the record's sf0.1 section predates them entirely;
# its sf1 section carries them in pass 3 only). Protocol per pass is
# identical to the committed record's (SPARK_GRAFT_*_SOLO: fresh JVM,
# own untimed warmups, ONE timed pass, loadavg recorded, LOAD_MAX gate
# + settle between passes); SPARK_GRAFT_BENCH_ONLY scopes the surface
# to the audio rows. merge_focus_rows.py folds ONLY these rows into
# bench_out.json with a "focused_rows" disclosure.
#
# Usage: tools/bench_focus_audio.sh
set -euo pipefail
cd "$(dirname "$0")/.."
ROWS="q_audio_features,q_audio_dedup,q_audio_index,q_audio_refresh"
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
      echo "[bench-focus-audio] WARNING: loadavg $load still > $LOAD_MAX" >&2
      return 0
    fi
    echo "[bench-focus-audio] loadavg $load > $LOAD_MAX — waiting 30s" >&2
    sleep 30
    waited=$((waited + 30))
  done
}

sf01_outs=()
for i in 1 2 3; do
  if (( i > 1 )); then sleep "$SETTLE_S"; fi
  wait_for_quiet
  echo "[bench-focus-audio] sf0.1 pass $i/3 (fresh JVM)" >&2
  out="/tmp/bench_audio_sf01_pass$i.json"
  SPARK_GRAFT_SF01_SOLO="$i" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_ONLY="$ROWS" SPARK_GRAFT_BENCH_OUT="$out" \
    tools/run_class.sh graft.Bench > /dev/null
  sf01_outs+=("$out")
done
python3 tools/merge_focus_rows.py bench_out.json top "$ROWS" "${sf01_outs[@]}"

# sf1: the committed record's pass 3 already carries the audio rows
# (one sample each, final classes); two more focused passes give every
# row 3 fresh-JVM samples.
sf1_outs=(/tmp/bench_sf1_pass3.json)
for i in 4 5; do
  sleep "$SETTLE_S"
  wait_for_quiet
  echo "[bench-focus-audio] sf1 pass $i (fresh JVM)" >&2
  out="/tmp/bench_audio_sf1_pass$i.json"
  SPARK_GRAFT_SF1_SOLO="$i" SPARK_GRAFT_SF1_DIR=/root/repo/benchdata/sf1 \
    SPARK_GRAFT_BENCH_ONLY="$ROWS" SPARK_GRAFT_BENCH_OUT="$out" \
    tools/run_class.sh graft.Bench > /dev/null
  sf1_outs+=("$out")
done
python3 tools/merge_focus_rows.py bench_out.json sf1 "$ROWS" "${sf1_outs[@]}"
echo BENCH_FOCUS_AUDIO_DONE
