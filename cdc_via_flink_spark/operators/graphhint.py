"""Scale-guarded join-side hinting for the iterative graph queries
(q_pagerank3 / q_kcore_peel) — VERDICT r12 #3.

The per-iteration state frames of those loops (rank table, alive
sets, contribution aggregates) are NODE-sized: distinct l_partkey,
which grows linearly with the corpus. At bench SF that is ~2e4 rows
and broadcasting them into the edge joins is the measured win
(plans/r12: 78 -> 34 exchanges, -42 % on the kcore driver cell); at
the 100 TB design point it is billions of rows, and a forced
``F.broadcast`` OVERRIDES the planner's size checks — the join would
die on the 8 GB / 512M-row broadcast cap (or the driver) instead of
degrading to a shuffle.

``node_join_strategy`` makes the decision explicit and bounded: ONE
count of the (localCheckpointed, node-sized) probe frame — cheap, the
blocks are already materialized — picks either ``F.broadcast`` or a
``shuffle_hash`` hint for every node-sized join side the loop builds.
Past the bound the loop degrades to partitioned hash joins (the
edge-sized probe side never builds the hash table), which is exactly
the scale-out behaviour a cluster wants; the count itself is a
sanctioned model-sized driver action (operators/ policy — declared
query BODIES stay action-free, they only call this helper).

The row bound is deliberately conservative and deployment-tunable:
``SPARK_GRAFT_GRAPH_BCAST_MAX_ROWS`` (default 4e6 — ~200 MB of
(long, long, double) broadcast rows, far under the 8 GB cap, and two
orders of magnitude above any bench fixture so local plans are
unchanged). A production 100 TB run leaves the default and gets
shuffle-hash loops; a cluster with a fat driver can raise it.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, functions as F


def _bcast_max_rows() -> int:
    return int(os.environ.get("SPARK_GRAFT_GRAPH_BCAST_MAX_ROWS", "4000000"))


def node_join_strategy(
    node_probe: DataFrame, max_rows: int | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Return the join-side wrapper for node-sized loop frames:
    ``F.broadcast`` when ``node_probe`` (a materialized node-sized
    frame — count it once, the iteration state can only shrink) is
    under the bound, else a ``shuffle_hash`` hint so the join degrades
    to a partitioned hash join with the node side as build side."""
    limit = _bcast_max_rows() if max_rows is None else max_rows
    if node_probe.count() <= limit:
        return F.broadcast
    return lambda df: df.hint("shuffle_hash")
