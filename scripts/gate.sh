#!/usr/bin/env bash
# Full local gate: compile, specs, differential correctness, bench.
# Usage: scripts/gate.sh [sf-dir (default /root/testdata/sf0.01)]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d)/verify"

echo "== compile + test =="
sbt -batch compile test 2>&1 | grep -E "^\[error\]|Tests:|All tests passed|TESTS FAILED" | tail -3

echo "== verify @ $SF =="
sbt -batch "runMain graft.Verify $SF $OUT" 2>/dev/null | grep "\[verify\]" || true
python3 scripts/check.py "$SF" "$OUT" | tail -3

echo "== bench @ sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
