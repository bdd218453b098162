#!/bin/bash
# Round-5 close: one command that either produces the full driver-shaped
# artifact set or exits non-zero BEFORE touching any artifact.
#
# Order (VERDICT r4 item 4): correctness gates FIRST — `pytest -m quick`,
# then the real multichip gate `dryrun_multichip(8)` — aborting loudly on
# any red; only then the TPU measurement passes (bench.py refreshes
# benchmarks/LASTGOOD.json first so a later crash still leaves a good
# record, then the per-family legs).
#
# The pinned log benchmarks/tpu_round5_runs.log is itself a quoted
# artifact (CLAUDE.md artifact-quoting rule), so the run writes to a
# scratch file and only replaces the pinned log after every step has
# finished — an aborted run leaves the committed record untouched
# (scratch kept at $LOG.inprogress for debugging).
#
# Run ALONE on this 1-core host — never while pytest occupies the core or
# the tunnel timings become garbage (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_round5_runs.log
TMPLOG=$LOG.inprogress
: > "$TMPLOG"

gate() {
  echo "=== GATE $* at $(date -u +%H:%M:%S) ===" | tee -a "$TMPLOG"
  timeout "$1" "${@:2}" >> "$TMPLOG" 2>&1
  rc=$?
  echo "--- rc=$rc ---" | tee -a "$TMPLOG"
  if [ "$rc" -ne 0 ]; then
    echo "ABORT: gate '${*:2}' failed (rc=$rc) — no artifacts refreshed" \
      | tee -a "$TMPLOG"
    tail -30 "$TMPLOG"
    exit "$rc"
  fi
}

run() {
  echo "=== $* at $(date -u +%H:%M:%S) ===" | tee -a "$TMPLOG"
  timeout "$1" "${@:2}" >> "$TMPLOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$TMPLOG"
}

# 1) correctness gates (CPU; abort on red)
gate 900 python -m pytest tests/ -m quick -q
gate 1800 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# 2) TPU measurement passes (logged; bench.py first for LASTGOOD)
run 1500 python bench.py
run 2400 python benchmarks/family_bench.py
run 2400 python benchmarks/int8_bench.py

echo "done at $(date -u +%H:%M:%S)" | tee -a "$TMPLOG"
mv "$TMPLOG" "$LOG"
tail -5 "$LOG"
# NB: completing this run regenerates the PINNED artifacts this log
# represents — doc quotes (README/PARITY/NOTES) must be re-synced to the
# fresh numbers afterward (artifact-quoting rule).
