#!/usr/bin/env bash
# Mechanical end-of-round evidence flow (VERDICT r7 #2: "commit the
# round's evidence mechanically" — the r7 snapshot claimed a
# CORRECTNESS_FULL artifact that was never committed; VERDICT r8 #5:
# enforce the BENCH_FLOORS.json regression gate mechanically).
#
# Usage: scripts/end_of_round.sh <round-number> [bench-json]
# 1. Runs the full strict driver-sim -> CORRECTNESS_FULL_r{N}.txt;
#    any mismatch = nonzero exit, nothing staged.
# 2. Runs scripts/bench_gate.py (fresh bench.py run, or against the
#    given recorded bench JSON): tier caps + 2x-per-cell floors. A
#    breach refuses to stage; a documented semantics trade overrides
#    via SPARK_GRAFT_GATE_OVERRIDE="reason".
set -euo pipefail
N="${1:?usage: end_of_round.sh <round-number> [bench-json]}"
BENCH_JSON="${2:-}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUT="CORRECTNESS_FULL_r$(printf '%02d' "$N").txt"
python scripts/verify_driver_sim.py /root/testdata/sf0.01 "$ROOT/$OUT"
tail -1 "$OUT" | grep -q "TOTAL FAILS: 0" || {
  echo "FAILURES in $OUT — fix before snapshotting" >&2
  exit 1
}
GATE_ARGS=()
if [ -n "${SPARK_GRAFT_GATE_OVERRIDE:-}" ]; then
  GATE_ARGS+=(--override "$SPARK_GRAFT_GATE_OVERRIDE")
fi
if [ -n "$BENCH_JSON" ]; then
  GATE_ARGS+=("$BENCH_JSON")
fi
python scripts/bench_gate.py "${GATE_ARGS[@]}" || {
  echo "BENCH GATE BREACH — fix the regression or document the trade" >&2
  echo "via SPARK_GRAFT_GATE_OVERRIDE=\"reason\"; nothing staged." >&2
  exit 1
}
git add "$OUT"
echo "Staged $OUT ($(grep -c '^OK' "$OUT") OK queries)."
echo "REMINDER: append this round's idle-floor section to BASELINE.md"
echo "and update STATUS.md before the snapshot commit."
