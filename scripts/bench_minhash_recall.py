"""Measured MinHash-LSH recall at the Jaccard threshold — the
minhash_plan "done" cell (VERDICT r6 #2): the old fixture constants
(16, 4, 4) give a true pair AT the 0.5 threshold a model candidate
probability of 1-(1-0.5^4)^4 ~ 23 %; the derived (54, 18, 3) plan
holds >= 90 %. This harness measures both empirically against
CONSTRUCTED exact-Jaccard pairs, end to end through the real
minhash_lsh_neardup pipeline (banding miss = pair absent from the
verified output, since verification is exact and every constructed
pair sits at or above the threshold).

Corpus construction (word-3-shingle arithmetic): a pair shares a
contiguous block of m pair-unique words and each side appends s
fresh words -> |A∩B| = m-2 interior shingles, |A| = |B| = m+s-2, so
J = (m-2)/(m+2s-2) exactly. s is solved per target j; only (m, s)
with an integer solution are used. Background docs are all-unique
words (zero cross-pair shingles), so ground truth is exactly the
constructed pairs.

Prints ONE JSON line; recorded as MINHASH_RECALL_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_via_flink_spark.operators.dedup import minhash_lsh_neardup, minhash_plan
from cdc_via_flink_spark.session import get_spark

THRESHOLD = 0.5
N_PAIRS = 400          # constructed true pairs per similarity point
N_BACKGROUND = 2000    # all-unique-word decoys
OLD = (16, 4, 4)       # the round-1..6 fixture constants

# (target_j, m, s): J = (m-2)/(m+2s-2); all exact in binary
POINTS = [
    (0.50, 42, 20),    # at the threshold — the cell that matters
    (0.60, 32, 10),    # 30/50
    (0.75, 26, 4),     # 24/32
]


def build_docs() -> tuple[list[tuple[int, str]], dict[float, set[tuple[int, int]]]]:
    docs: list[tuple[int, str]] = []
    truth: dict[float, set[tuple[int, int]]] = {}
    uid = 0

    def words(n: int) -> list[str]:
        nonlocal uid
        out = [f"w{uid + i:07d}" for i in range(n)]
        uid += n
        return out

    doc_id = 0
    for j, m, s in POINTS:
        truth[j] = set()
        for _ in range(N_PAIRS):
            block = words(m)
            a = block + words(s)
            b = block + words(s)
            docs.append((doc_id, " ".join(a)))
            docs.append((doc_id + 1, " ".join(b)))
            truth[j].add((doc_id, doc_id + 1))
            doc_id += 2
    for _ in range(N_BACKGROUND):
        docs.append((doc_id, " ".join(words(40))))
        doc_id += 1
    return docs, truth


def main() -> None:
    spark = get_spark("minhash-recall")
    docs, truth = build_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(32)
    df = df.localCheckpoint(eager=True)

    derived = minhash_plan(THRESHOLD)
    out: dict = {
        "metric": "minhash_boundary_recall",
        "threshold": THRESHOLD,
        "n_pairs_per_point": N_PAIRS,
        "plans": {},
    }
    for label, (k, b, r) in (("old_fixture", OLD), ("derived", derived)):
        t0 = time.time()
        got = {
            (p.id_a, p.id_b)
            for p in minhash_lsh_neardup(df, "text", "doc_id", k, b, r, THRESHOLD)
            .select("id_a", "id_b")
            .collect()
        }
        sec = round(time.time() - t0, 2)
        cells = {}
        for j, pairs in sorted(truth.items()):
            found = len(pairs & got)
            cells[f"j={j}"] = {
                "recall": round(found / len(pairs), 4),
                "found": found,
                "true": len(pairs),
            }
        spurious = len(got - set().union(*truth.values()))
        out["plans"][label] = {
            "num_hashes": k,
            "bands": b,
            "rows": r,
            "model_p_at_threshold": round(
                1 - (1 - THRESHOLD**r) ** b, 4
            ),
            "cells": cells,
            "spurious_pairs": spurious,
            "sec": sec,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
