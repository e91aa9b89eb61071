#!/usr/bin/env bash
# Mechanical end-of-round evidence flow (VERDICT r7 #2: "commit the
# round's evidence mechanically" — the r7 snapshot claimed a
# CORRECTNESS_FULL artifact that was never committed).
#
# Usage: scripts/end_of_round.sh <round-number>
# Runs the full strict driver-sim, writes CORRECTNESS_FULL_r{N}.txt at
# the repo root, and fails loudly (nonzero exit, nothing staged) if
# any query mismatches. BASELINE.md floors still need a manual round
# section — this script prints the reminder.
set -euo pipefail
N="${1:?usage: end_of_round.sh <round-number>}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUT="CORRECTNESS_FULL_r$(printf '%02d' "$N").txt"
python scripts/verify_driver_sim.py /root/testdata/sf0.01 "$ROOT/$OUT"
tail -1 "$OUT" | grep -q "TOTAL FAILS: 0" || {
  echo "FAILURES in $OUT — fix before snapshotting" >&2
  exit 1
}
git add "$OUT"
echo "Staged $OUT ($(grep -c '^OK' "$OUT") OK queries)."
echo "REMINDER: append this round's idle-floor section to BASELINE.md"
echo "and update STATUS.md before the snapshot commit."
