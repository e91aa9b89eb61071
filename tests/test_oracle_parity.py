"""Differential tests: every declared query with an oracle must match
DuckDB exactly at sf0.001 (the driver does the same at sf0.01)."""

from __future__ import annotations

import pytest

from cdc_via_flink_spark.oracle import compare_query
from cdc_via_flink_spark.plans.registry import load_all
from tests.conftest import SF0001

SPECS = load_all()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    diff = compare_query(spark, SF0001, name, spec.fn, spec.oracle)
    assert diff.ok, f"{name}: {diff.detail}"


def test_all_queries_return_rows(spark):
    for name, spec in SPECS.items():
        df = spec.fn(spark, SF0001)
        assert df.count() >= 0, name
