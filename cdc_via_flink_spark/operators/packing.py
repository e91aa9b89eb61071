"""Sequence packing for LLM training-data pipelines (extension surface,
SURVEY.md §2.7 family — driver north-star "LLM-data-pipeline operators").

Packs documents into fixed token-budget bins ("sequences") the way a
pre-training loader packs samples before batching. Two strategies:

- **Chunked packing** (``plans/pipeline_queries.py::q_pack_chunks``):
  bin = floor(preceding-cumulative-tokens / budget) over a per-group
  ordered window. Pure built-in window expression — stays entirely in
  whole-stage codegen, one shuffle on the group key.
- **Greedy first-fit-in-order** (this module): close a bin exactly when
  the next document would overflow it. The bin boundary depends on the
  *previous* boundary — a sequential scan with reset that plain SQL
  windows cannot express — so it runs as ``applyInPandas`` over
  ``(group, shard)`` with an O(n) NumPy loop per group. Exactly
  verified against a DuckDB recursive-CTE oracle (``q_pack_greedy``).

Scale design (100 TB): packing is embarrassingly parallel across
shards. Sharding each group by ``order_col % n_shards`` bounds every
pandas group to |group|/n_shards rows and spreads the Arrow exchange
across the cluster; a cross-shard greedy pack would serialize on one
task per group (5 langs → 5 busy cores out of 1000). Per-bin budget
invariants are unaffected by sharding; only bin *numbering* is
shard-local. Only the columns the packer needs cross the Arrow
boundary — project before calling.

The reference has no packing operator (its surface is CDC assembly,
DebeziumTransactionReconstructor.java:131-170); this extends the
engine per BASELINE.json's north star.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructType

__all__ = ["greedy_bins", "pack_greedy"]


def greedy_bins(sizes: np.ndarray, budget: int) -> np.ndarray:
    """Greedy first-fit-in-order bin ids for ``sizes`` (the sequential
    scan core; property-tested directly in tests/test_packing.py)."""
    bins = np.zeros(len(sizes), dtype=np.int64)
    b = 0
    fill = 0
    for i, s in enumerate(sizes):
        if i > 0 and fill + s > budget:
            b += 1
            fill = 0
        fill += int(s)
        bins[i] = b
    return bins


def pack_greedy(
    df: DataFrame,
    size_col: str,
    budget: int,
    group_cols: tuple[str, ...] = ("lang", "shard"),
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``bin`` id by greedy first-fit in ``order_col``
    order within each ``group_cols`` group.

    Invariants (property-tested in tests/test_packing.py):
    - a bin's total ``size_col`` is <= budget unless the bin holds a
      single row whose own size exceeds the budget;
    - bin ids are dense per group, starting at 0, nondecreasing in
      ``order_col`` order;
    - every input row appears exactly once in the output.
    """
    # copy the field list — StructType keeps the passed list by
    # reference and .add() would otherwise mutate df.schema too
    out_schema = StructType(list(df.schema.fields)).add("bin", LongType(), False)
    cols = [f.name for f in df.schema.fields]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        out = pdf[cols].copy()
        out["bin"] = greedy_bins(pdf[size_col].to_numpy(), budget)
        return out

    return df.groupBy(*group_cols).applyInPandas(pack, schema=out_schema)
