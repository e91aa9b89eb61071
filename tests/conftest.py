from __future__ import annotations

import pytest

from cdc_via_flink_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc_via_flink_spark-tests", cpus=8)
    yield s
    s.stop()
