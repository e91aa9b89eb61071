"""Merge a partial verify run into the round's CORRECTNESS_FULL
artifact.

Closes the round-9 gate bypass: queries declared AFTER the full sweep
had no committed evidence, and nothing refused the commit. The new
rule (pinned by tests/test_plans.py::
test_correctness_artifact_covers_registry) is that the LATEST
committed CORRECTNESS_FULL_r*.txt must contain an OK line for every
registered query — so adding a query mid-round requires either a full
re-sweep or this incremental merge:

    python scripts/verify_driver_sim.py /root/testdata/sf0.01 \
        /tmp/partial.txt new_query_a,new_query_b
    python scripts/merge_correctness.py CORRECTNESS_FULL_r10.txt \
        /tmp/partial.txt

The merge replaces/adds the named queries' lines, keeps everything
else, recomputes TOTAL FAILS, and refuses to merge a partial run that
contains a MISMATCH (evidence of a failing query must never
silently overwrite a green line).
"""

from __future__ import annotations

import re
import sys

_LINE = re.compile(r"^(OK|MISMATCH|ROWSONLY) (\S+)")


def parse(path: str) -> tuple[list[str], dict[str, str]]:
    """(header lines, {query name: full line}) — TOTAL FAILS dropped."""
    header: list[str] = []
    rows: dict[str, str] = {}
    for line in open(path).read().splitlines():
        m = _LINE.match(line)
        if m:
            rows[m.group(2)] = line
        elif not line.startswith("TOTAL FAILS:"):
            header.append(line)
    return header, rows


def main(artifact: str, partial: str) -> int:
    _, new_rows = parse(partial)
    if not new_rows:
        print(f"no query lines in {partial}")
        return 2
    bad = [l for l in new_rows.values() if l.startswith("MISMATCH")]
    if bad:
        print("refusing to merge MISMATCH lines:\n" + "\n".join(bad))
        return 1
    header, rows = parse(artifact)
    rows.update(new_rows)
    fails = sum(1 for l in rows.values() if not l.startswith(("OK", "ROWSONLY")))
    with open(artifact, "w") as f:
        for h in header:
            f.write(h + "\n")
        for name in sorted(rows):
            f.write(rows[name] + "\n")
        f.write(f"TOTAL FAILS: {fails}\n")
    print(f"merged {len(new_rows)} lines into {artifact} ({len(rows)} total)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
