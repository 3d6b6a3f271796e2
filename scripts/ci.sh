#!/usr/bin/env bash
# CI split mirroring the reference's .github/workflows/ci.yml (SURVEY.md §4.4):
# the fast job skips crypto-heavy suites (reference: --skip aggregator_tests
# --skip circuit_data_tests ...); the slow job runs only those, intended for
# the main branch / nightly.
#
# Usage: scripts/ci.sh fast|slow|all
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-fast}"
case "$mode" in
  fast)
    # Unit + integration pyramid minus recursion/aggregation/compat heavies.
    python -m pytest tests/ -q -m "not slow" \
      --ignore=tests/test_recursion.py
    ;;
  slow)
    # The crypto-heavy suites (reference ci.yml slow-tests job).
    python -m pytest tests/test_recursion.py -q
    python -m pytest tests/ -q -m slow
    ;;
  all)
    python -m pytest tests/ -q
    ;;
  *)
    echo "usage: scripts/ci.sh fast|slow|all" >&2
    exit 2
    ;;
esac
