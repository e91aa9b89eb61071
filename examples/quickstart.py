"""Quickstart: the engine's public API end-to-end on the bundled
fixture data. Run: `python examples/quickstart.py [sf_dir]`."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import cdc_via_flink_spark as eng


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = eng.get_spark("quickstart")

    # --- CDC: reconstruct transactions from change + END streams -----
    from cdc_via_flink_spark.operators.reconstruct import (
        derive_change_stream,
        derive_txn_stream,
    )

    events = eng.load_table(spark, sf_dir, "events")
    changes, ends = derive_change_stream(events), derive_txn_stream(events)
    txns = eng.reconstruct_transactions(changes, ends, emit_on="end")
    print("reconstructed transactions:")
    txns.show(5, truncate=False)

    # --- CDC: latest row state per key -------------------------------
    eng.latest_state(changes).show(5, truncate=False)

    # --- Dedup: exact + near-dup clusters ----------------------------
    docs = eng.load_table(spark, sf_dir, "documents")
    eng.exact_dedup(docs, "text", "doc_id").orderBy(F.desc("n_copies")).show(3)
    pairs = eng.minhash_lsh_neardup(docs, "text", "doc_id")
    from cdc_via_flink_spark.operators.components import connected_components

    connected_components(pairs.select("id_a", "id_b")).show(5)

    # --- Similarity: exact top-k over embeddings ---------------------
    emb = eng.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    eng.brute_force_topk(emb, queries, k=3).show(9)

    # --- Multimodal: binary payload plumbing -------------------------
    eng.decode_meta(eng.attach_payload(docs.limit(100))).show(3)

    # --- Write path: partitioned + bucketed --------------------------
    out = tempfile.mkdtemp(prefix="quickstart_")
    eng.write_partitioned(
        eng.load_table(spark, sf_dir, "orders"), f"{out}/orders", ["o_orderstatus"]
    )
    print(f"partitioned write at {out}/orders:", os.listdir(f"{out}/orders"))

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
