from cdc_via_flink_spark.plans.registry import QUERIES, QuerySpec, query  # noqa: F401
