"""Declared-query registry: the engine's public query surface.

Every operator from SURVEY.md §2 is exposed as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (where ANSI-SQL can express
the semantics) a DuckDB oracle SQL string producing the identical
result — same column names, same values. Non-SQL-expressible
operators (stateful streaming) register ``oracle=None`` and get the
driver's rows-only check.

Numeric parity policy (Spark vs DuckDB must hash-equal):
- sums over doubles are computed on DECIMAL(18,2)-cast inputs in BOTH
  engines (exact, association-order independent), then CAST AS DOUBLE;
- averages are exact-sum / count in double (one identical fp divide);
- similarity scores are rounded to a fixed scale before use as output
  or ordering keys, with unique-id tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set (tier 1)
    bench2: bool = False  # heavy tier: expensive new-surface queries
    bench3: bool = False  # r11 gate tier: heavy r10f/g families
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    bench2: bool = False,
    bench3: bool = False,
):
    """Decorator registering a query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tags,
            bench=bench,
            bench2=bench2,
            bench3=bench3,
            doc=fn.__doc__ or "",
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration)."""
    import cdc_via_flink_spark.plans.collections_queries  # noqa: F401
    import cdc_via_flink_spark.plans.scale_queries  # noqa: F401
    import cdc_via_flink_spark.plans.relational  # noqa: F401
    import cdc_via_flink_spark.plans.subquery_queries  # noqa: F401
    import cdc_via_flink_spark.plans.cdc_queries  # noqa: F401
    import cdc_via_flink_spark.plans.windows_queries  # noqa: F401
    import cdc_via_flink_spark.plans.dedup_queries  # noqa: F401
    import cdc_via_flink_spark.plans.similarity_queries  # noqa: F401
    import cdc_via_flink_spark.plans.text_queries  # noqa: F401
    import cdc_via_flink_spark.plans.multimodal_queries  # noqa: F401
    import cdc_via_flink_spark.plans.streaming_queries  # noqa: F401
    import cdc_via_flink_spark.plans.pipeline_queries  # noqa: F401
    import cdc_via_flink_spark.plans.graph_queries  # noqa: F401
    import cdc_via_flink_spark.plans.stats_queries  # noqa: F401
    import cdc_via_flink_spark.plans.sequence_queries  # noqa: F401

    return QUERIES
