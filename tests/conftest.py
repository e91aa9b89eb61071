from __future__ import annotations

import pytest

from cdc_via_flink_spark.session import get_spark
from cdc_via_flink_spark.vendor.proto_compat import ensure_protobuf

# Activate the protobuf fallback shim (no-op with a real install)
# before test collection: test_assembler_tws gates on this import, and
# PYTHONPATH must carry it before the gateway JVM starts.
ensure_protobuf()

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc_via_flink_spark-tests", cpus=8)
    yield s
    s.stop()
