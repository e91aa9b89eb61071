"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``cdc_via_flink_spark`` package; this file
only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_via_flink_spark.plans.registry import load_all  # noqa: E402
from cdc_via_flink_spark.session import tune_for_session  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full Debezium
    envelope codec + emit-on-END transaction reconstruction."""
    tune_for_session(spark)
    specs = load_all()
    return specs["cdc_reconstruct_end"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    specs = load_all()

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    operators (stateful streaming) → driver records rows-only checks."""
    specs = load_all()
    return {name: spec.oracle for name, spec in specs.items() if spec.oracle is not None}
