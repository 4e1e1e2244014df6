#!/bin/bash
# One-shot driver for the round-15 committed bench re-record (VERDICT
# r14 next #1): full sf0.1 section (3 fresh-JVM passes under the
# LOAD_MAX=1.5 + SETTLE_S=120 gates) followed by the full sf1 section
# (3 passes, same gates). Exists so the whole record cuts in ONE
# detached invocation with nothing else running on the machine.
set -euo pipefail
cd "$(dirname "$0")/.."
tools/bench_sf01.sh /root/testdata/sf0.1 3
tools/bench_sf1.sh /root/repo/benchdata/sf1 3
echo BENCH_RECORD_DONE
