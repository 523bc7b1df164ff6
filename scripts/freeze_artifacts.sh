#!/usr/bin/env bash
# End-of-round frozen-HEAD artifact set (VERDICT r14 directive 1).
#
# Produces, in order, the six graded artifacts for round $1 (default:
# the ROUND env var) and VALIDATES each log's summary line before
# moving on — a truncated log without its summary line is treated as a
# FAILED run and the script exits non-zero so the failure is loud, not
# silently committed:
#
#   artifacts/pytest_r{N}.log              "N passed" line required
#   artifacts/pytest_r{N}_run2.log         "N passed" line required
#   artifacts/check_contract_r{N}.log      "N/N queries pass" required
#   artifacts/check_contract_cluster_r{N}.log  same, under multi-JVM
#   artifacts/bench_r{N}_local.json        last line must parse as JSON
#
# Run this at the snapshot commit (frozen HEAD) and commit everything
# it writes. Usage: scripts/freeze_artifacts.sh 15
set -uo pipefail
cd "$(dirname "$0")/.."
N="${1:?round number required (e.g. 15)}"
mkdir -p artifacts

fail() { echo "FREEZE FAILED: $1" >&2; exit 1; }

require_line() {  # file, grep-pattern, description
    grep -Eq "$2" "$1" || fail "$3 ($1 lacks '$2')"
}

echo "== pytest run 1 =="
python -m pytest tests/ -q > "artifacts/pytest_r${N}.log" 2>&1
require_line "artifacts/pytest_r${N}.log" '^[0-9]+ passed' \
    "pytest run 1 has no result line"
grep -Eq ' failed| error' "artifacts/pytest_r${N}.log" \
    && fail "pytest run 1 has failures"

echo "== pytest run 2 =="
python -m pytest tests/ -q > "artifacts/pytest_r${N}_run2.log" 2>&1
require_line "artifacts/pytest_r${N}_run2.log" '^[0-9]+ passed' \
    "pytest run 2 has no result line"
grep -Eq ' failed| error' "artifacts/pytest_r${N}_run2.log" \
    && fail "pytest run 2 has failures"

echo "== contract (local) =="
python scripts/check_contract.py /root/testdata/sf0.01 \
    > "artifacts/check_contract_r${N}.log" 2>&1
require_line "artifacts/check_contract_r${N}.log" \
    '^[0-9]+/[0-9]+ queries pass' "local contract has no summary line"

echo "== contract (multi-JVM local-cluster) =="
bash scripts/check_contract_cluster.sh /root/testdata/sf0.01 \
    > "artifacts/check_contract_cluster_r${N}.log" 2>&1
require_line "artifacts/check_contract_cluster_r${N}.log" \
    '^[0-9]+/[0-9]+ queries pass' "cluster contract has no summary line"

for f in "artifacts/check_contract_r${N}.log" \
         "artifacts/check_contract_cluster_r${N}.log"; do
    summary=$(grep -E '^[0-9]+/[0-9]+ queries pass' "$f" | tail -1)
    passed=${summary%%/*}
    total=$(echo "$summary" | sed -E 's|^[0-9]+/([0-9]+) .*|\1|')
    [ "$passed" = "$total" ] || fail "$f: only $passed/$total pass"
done

echo "== plan audit (anti-pattern sweep over the driver window) =="
python scripts/plan_audit.py /root/testdata/sf0.01 \
    "artifacts/plan_audit_r${N}.json" \
    > "artifacts/plan_audit_r${N}.log" 2>&1 \
    || fail "plan audit found violations (see artifacts/plan_audit_r${N}.log)"
require_line "artifacts/plan_audit_r${N}.log" \
    'plans clean \(0 violations\)' "plan audit has no clean summary"

echo "== bench (quiet host, final HEAD) =="
python bench.py > "artifacts/bench_r${N}_local.json" \
    2> "artifacts/bench_r${N}_local.err" || fail "bench.py exited non-zero"
tail -1 "artifacts/bench_r${N}_local.json" | python -c \
    "import json,sys; json.loads(sys.stdin.read())" \
    || fail "bench last line is not valid JSON"

echo "FREEZE OK: all r${N} artifacts written with summary lines"
