"""cdc_via_flink_spark — a PySpark-native analytics/CDC engine.

Re-implements, Spark-first, the capabilities of the reference
``pdebuitlear/cdc-via-flink`` (a Flink CDC transaction reconstructor;
see SURVEY.md): Debezium envelope parsing, per-transaction stateful
reconstruction (batch twin + Structured Streaming), a full relational
operator surface (joins, aggregations, windows, set ops, scalar/JSON
functions), and large-scale LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal column plumbing).

Design: DataFrame/SQL declarative plans so Catalyst handles pushdown,
pruning, join selection, and AQE; Python touches data only through
Arrow-batched Pandas UDFs in the few operators Spark can't express.
"""

__version__ = "0.1.0"

# Public API — everything a user of the reference needs, importable
# flat. Streaming builders live in cdc_via_flink_spark.streaming.*
# (they need a streaming DataFrame; see jobs/reconstructor.py for the
# assembled end-to-end job).
from cdc_via_flink_spark.operators.asof import asof_join  # noqa: F401
from cdc_via_flink_spark.operators.debezium import (  # noqa: F401
    parse_debezium,
    render_change_envelope,
    render_txn_envelope,
)
from cdc_via_flink_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_components,
    minhash_lsh_neardup,
    simhash64,
)
from cdc_via_flink_spark.operators.multimodal import (  # noqa: F401
    attach_payload,
    decode_meta,
    sample_frames,
)
from cdc_via_flink_spark.operators.reconstruct import (  # noqa: F401
    latest_state,
    reconstruct_transactions,
)
from cdc_via_flink_spark.operators.packing import pack_greedy  # noqa: F401
from cdc_via_flink_spark.operators.sampling import (  # noqa: F401
    hash_bucket,
    hash_split,
    stratified_sample,
)
from cdc_via_flink_spark.operators.similarity import brute_force_topk  # noqa: F401
from cdc_via_flink_spark.operators.winnow import (  # noqa: F401
    incremental_winnow_pairs,
    save_winnow_index,
    winnow_fingerprints,
)
from cdc_via_flink_spark.operators.ivf import ivf_topk  # noqa: F401
from cdc_via_flink_spark.session import get_spark  # noqa: F401
from cdc_via_flink_spark.sources.tables import load_table, load_tables  # noqa: F401
from cdc_via_flink_spark.sources.writers import (  # noqa: F401
    write_bucketed,
    write_partitioned,
    write_sorted,
    write_zordered,
    zorder_key,
)

__all__ = [
    "asof_join",
    "attach_payload",
    "brute_force_topk",
    "decode_meta",
    "exact_dedup",
    "get_spark",
    "hash_bucket",
    "hash_split",
    "incremental_winnow_pairs",
    "ivf_topk",
    "latest_state",
    "load_table",
    "load_tables",
    "minhash_lsh_components",
    "minhash_lsh_neardup",
    "pack_greedy",
    "parse_debezium",
    "reconstruct_transactions",
    "render_change_envelope",
    "render_txn_envelope",
    "sample_frames",
    "save_winnow_index",
    "simhash64",
    "stratified_sample",
    "winnow_fingerprints",
    "write_bucketed",
    "write_partitioned",
    "write_sorted",
    "write_zordered",
    "zorder_key",
]
