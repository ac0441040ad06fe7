#!/bin/sh
# Pre-snapshot parity gate: run EVERY registered query through the local
# DuckDB-oracle mirror (tools/check_parity.py) and append a dated result
# line to COVERAGE.md. The driver's own correctness harness caps at 50
# of the registered queries — this is the automatic net for the rest.
#
#   sh tools/parity_gate.sh            # sf0.01 (the driver's SF)
#   sh tools/parity_gate.sh /root/testdata/sf0.001   # faster smoke
#
# Must run from the repo root: Spark executors import the package by
# cwd-relative path (running from elsewhere produces a spurious
# ModuleNotFoundError on the workers).
set -e
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp)"
if python tools/check_parity.py "$SF_DIR" >"$OUT" 2>/dev/null; then
    STATUS=ok
else
    STATUS=FAIL
fi
SUMMARY="$(tail -2 "$OUT" | grep -E '[0-9]+ passed' || echo 'no summary')"
# Bench-regression guard (round-4 verdict item 1): diff the most recent
# local bench run (bench_detail.json) against the newest recorded round
# artifact. Exit 1 = real >1.25x regression; advisory-only when the
# session calibration says the numbers are weather-inflated.
BENCHCMP="$(python tools/bench_compare.py >/dev/null 2>&1 && echo 'bench ok' || echo 'bench REGRESSION')"
printf -- '- %s parity gate (%s): %s [%s] [%s]\n' \
    "$(date -u +%Y-%m-%d)" "$SF_DIR" "$SUMMARY" "$STATUS" "$BENCHCMP" >> COVERAGE.md
grep -E '^FAIL' "$OUT" || true
echo "parity gate: $SUMMARY [$STATUS]"
rm -f "$OUT"
test "$STATUS" = ok
