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
printf -- '- %s parity gate (%s): %s [%s]\n' \
    "$(date -u +%Y-%m-%d)" "$SF_DIR" "$SUMMARY" "$STATUS" >> COVERAGE.md
grep -E '^FAIL' "$OUT" || true
echo "parity gate: $SUMMARY [$STATUS]"
rm -f "$OUT"
test "$STATUS" = ok
