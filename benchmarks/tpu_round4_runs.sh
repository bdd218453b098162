#!/bin/bash
# One-shot TPU measurement pass for round 4 (run ALONE — never while pytest
# occupies this 1-core host).  Order matters: bench.py first (refreshes
# benchmarks/LASTGOOD.json so a later crash still leaves a good record),
# then the int8 family decision legs, then the optional probes.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_round4_runs.log
: > "$LOG"

run() {
  echo "=== $* at $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

run 1500 python bench.py
run 2400 python benchmarks/int8_bench.py
run 900 python benchmarks/probe_epilogue_bf16.py
run 600 python benchmarks/probe_nested_int8.py
run 600 python benchmarks/probe3d_int8.py
run 900 python benchmarks/probe_trunk_int8.py
echo "done at $(date -u +%H:%M:%S)" | tee -a "$LOG"
tail -5 "$LOG"
# NB: re-running regenerates the PINNED artifacts this log and
# INT8_r04.json/PROBE_*.json represent — doc quotes (README/PARITY/NOTES)
# must be re-synced to the fresh numbers afterward (artifact-quoting rule).
