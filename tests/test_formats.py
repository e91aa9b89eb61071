"""Multi-format source round-trips (SURVEY.md S1 generalization):
parquet fixture -> csv/json/orc -> read back with explicit schema ->
identical contents. Plus JSON dead-letter routing via _corrupt_record.
"""

from __future__ import annotations

import pytest

from cdc_via_flink_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_json,
    read_orc,
    read_xml,
    write_format,
)
from cdc_via_flink_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "xml"])
def test_roundtrip_nation(spark, tmp_path, fmt):
    src = load_table(spark, SF0001, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_format(src, path, fmt)
    if fmt == "csv":
        back = read_csv(spark, path, src.schema)
    elif fmt == "json":
        back = read_json(spark, path, src.schema)
    elif fmt == "xml":
        back = read_xml(spark, path, src.schema)
    else:
        back = read_orc(spark, path)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_json_dead_letter_routing(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"n_nationkey": 1, "n_name": "A", "n_regionkey": 0}\n{broken\n')
    schema = load_table(spark, SF0001, "nation").schema
    df = read_json(spark, str(p), schema, dead_letter=True)
    rows = df.collect()
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(good) == 1 and good[0].n_name == "A"
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("{broken")


def test_xml_dead_letter_routing(spark, tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text(
        "<rows>"
        "<row><n_nationkey>1</n_nationkey><n_name>A</n_name>"
        "<n_regionkey>0</n_regionkey></row>"
        "<row><n_nationkey>not_a_number</n_nationkey><n_name>B</n_name>"
        "<n_regionkey>0</n_regionkey></row>"
        "</rows>"
    )
    schema = load_table(spark, SF0001, "nation").schema
    df = read_xml(spark, str(p), schema, dead_letter=True)
    rows = df.collect()
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(good) == 1 and good[0].n_name == "A"
    assert len(bad) == 1 and "not_a_number" in bad[0][CORRUPT_COL]
