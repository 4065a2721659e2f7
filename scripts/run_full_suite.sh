#!/bin/bash
# Full test suite, split across two fresh interpreters.
#
# Why: jaxlib's CPU client segfaults inside backend_compile after ~155
# tests' worth of compiles in ONE process — deterministically, and on
# whichever heavy compile lands at that depth (observed 2026-08-21 on
# test_profiling's per-step jit twice, then on test_quantize's export
# after the former was subprocess-isolated — the trigger is cumulative
# process state, not any single test).  Both halves pass every time in
# fresh processes; the quick tier (193 tests) stays under the threshold.
#
#   bash scripts/run_full_suite.sh [extra pytest args...]
set -e
cd "$(dirname "$0")/.."
echo "=== tier 1/2: quick (not slow) ==="
python -m pytest tests/ -q -m "not slow" "$@"
echo "=== tier 2/2: slow ==="
python -m pytest tests/ -q -m "slow" "$@"
echo "=== full suite green (two fresh processes) ==="
