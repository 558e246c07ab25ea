#!/bin/bash
# Fast-tier runner: one pytest PROCESS PER TEST FILE.
#
# Why: jaxlib's CPU compiler on this host SIGSEGVs nondeterministically on
# whichever LARGE compile lands ~350 compiles into a single process (two
# full-tier runs died at 97% on two DIFFERENT tests — test_tune_nuts_runs,
# then test_sequential_tune_grahmc_contract after the first was subprocess-
# isolated; each passes solo). Per-file processes bound the compile count
# per process, which removes the crash without dropping any coverage.
# Costs ~10s of re-import per file (~3 min over the tier) — the price of a
# suite that finishes. Details: tests/conftest.py.
#
# Usage: bash tests/run_fast_tier.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
FAIL=0
TOTAL_PASS=0
for f in tests/test_*.py; do
  out=$(python -m pytest "$f" -q -m "not slow" "$@" 2>&1)
  rc=$?
  line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
  echo "$f: $line (rc=$rc)"
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then    # 5 = no tests collected
    FAIL=1
    echo "$out" | tail -30
  fi
done
exit $FAIL
