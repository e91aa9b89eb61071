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

from cdc_via_flink_spark.session import get_spark  # noqa: F401
