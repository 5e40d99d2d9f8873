#!/usr/bin/env bash
# Round-close gate (SURVEY §7): the hard correctness signal MUST exist
# in the repo at every round close — the driver's CORRECTNESS_r{N}.json
# arrived empty in rounds 9 and 10, so the round's exactness evidence
# lives in CORRECTNESS_local.json, produced and committed HERE.
#
#   tools/roundclose.sh [sfDir] [verifyOutDir]
#
# Runs graft.Verify over the full registry, compares every query to its
# DuckDB oracle via tools/check.py (writing CORRECTNESS_local.json),
# REFUSES to exit 0 if the artifact is absent/small/non-exact, then
# stages and commits the artifact. Run it as the LAST step of a round.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_roundclose}
MIN_ENTRIES=${MIN_ENTRIES:-235}

rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | { grep -E '\[verify\].*failed' || true; } | tee /tmp/roundclose_verify_failures.txt
if [ -s /tmp/roundclose_verify_failures.txt ]; then
  echo "roundclose: queries THREW during Verify (above)" >&2
  exit 1
fi

python3 tools/check.py "$SF" "$OUT" CORRECTNESS_local.json | tail -3

python3 - <<'EOF'
import json, sys
try:
    d = json.load(open("CORRECTNESS_local.json"))
except Exception as e:
    sys.exit(f"roundclose: artifact unreadable: {e}")
import os
need = int(os.environ.get("MIN_ENTRIES", "219"))
if len(d) < need:
    sys.exit(f"roundclose: artifact too small: {len(d)} entries < {need}")
bad = {k: v.get("err") for k, v in d.items()
       if v.get("err") not in (None, "no_oracle")}
if bad:
    sys.exit(f"roundclose: non-exact queries: {bad}")
oracled = sum(1 for v in d.values() if v.get("err") is None)
# an all-"no_oracle" artifact (e.g. Verify ran against a stale
# oracle_sql.json) carries no correctness signal — refuse it
if oracled < need * 0.8:
    sys.exit(f"roundclose: only {oracled} oracle-exact entries of {len(d)} "
             f"— the artifact carries no real correctness signal")
print(f"roundclose OK: {len(d)} entries, {oracled} oracle-exact, "
      f"{len(d) - oracled} declared rows-only")
EOF

git add CORRECTNESS_local.json
if ! git diff --cached --quiet -- CORRECTNESS_local.json; then
  git commit -m "round close: refresh CORRECTNESS_local.json" -- CORRECTNESS_local.json
else
  echo "roundclose: CORRECTNESS_local.json unchanged (already committed)"
fi
