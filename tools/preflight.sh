#!/bin/sh
# GATE-RUNS-LAST (VERDICT r7 item 2): the final commit of every round
# must be preceded by this script SUCCEEDING — it runs, in order:
#
#   1. tools/plan_audit.py        -> PLANS.md row count == registry count
#   2. full pytest tests/         -> suite green at the snapshot
#   3. full tools/check_parity.py -> dated "N passed" line in COVERAGE.md
#      (via parity_gate.sh, which also stamps the bench-regression verdict)
#
# Run the sf0.1 bench (python bench.py) separately BEFORE this script if
# queries changed — parity_gate's bench_compare reads bench_detail.json.
#
#   sh tools/preflight.sh            # full gate (slow: ~30+ min)
set -e
cd "$(dirname "$0")/.."

echo "== 1/3 plan audit =="
python tools/plan_audit.py
REG=$(python -c "from tvbigdataproject_spark.queries import REGISTRY; print(len(REGISTRY))")
ROWS=$(grep -c '^| ' PLANS.md || true)
# PLANS.md has one header-separator row plus one row per query
if [ "$ROWS" -lt "$REG" ]; then
    echo "FAIL: PLANS.md has $ROWS rows < $REG registered queries" >&2
    exit 1
fi

echo "== 2/3 full pytest =="
python -m pytest tests/ -q

echo "== 3/3 full parity gate (appends dated line to COVERAGE.md) =="
sh tools/parity_gate.sh

echo "preflight: ALL GATES GREEN — snapshot-ready"
