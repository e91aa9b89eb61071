"""Property-based envelope-codec tests: the Debezium parser is TOTAL
(any byte junk classifies as change / txn / NULL, never throws — the
reference's null-and-log path, DebeziumTransactionReconstructor.java:
104-107,124-127) and render→parse is an exact ROUND TRIP for arbitrary
field values, including txn ids full of quotes, backslashes, and
unicode (the JSON-escaping cases hand-rolled codecs get wrong)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_via_flink_spark.operators.debezium import (
    parse_debezium,
    render_change_envelope,
    render_txn_envelope,
)

junk_strategy = st.lists(
    st.one_of(
        st.text(max_size=60),
        st.just("{"),
        st.just('{"payload":'),
        st.just('{"payload": 7}'),
        st.just('{"payload": {"op": 3}}'),
        st.just('{"payload": {"status": null, "op": null}}'),
        st.builds(lambda s: '{"payload":{"op":"c","ts_ms":' + s + "}}", st.text(max_size=8)),
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=junk_strategy)
def test_parser_total_on_junk(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "seq long, value string"
    )
    rows = parse_debezium(df).collect()
    assert len(rows) == len(values)  # nothing dropped, nothing raised
    for r in rows:
        assert r.kind in ("change", "txn", None)


field_text = st.text(max_size=40)  # includes quotes, backslashes, unicode


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["c", "u", "r", "d"]),
            st.integers(min_value=0, max_value=2**52),
            field_text,
            st.none() | field_text,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_change_envelope_round_trip(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, op, ts, txn, after) for i, (op, ts, txn, after) in enumerate(rows)],
        "seq long, op string, ts_ms long, txn_id string, after string",
    )
    env = df.select(
        "seq",
        render_change_envelope(
            F.col("op"), F.col("ts_ms"), F.col("txn_id"), F.lit(None), F.col("after")
        ).alias("value"),
    )
    got = {r.seq: r for r in parse_debezium(env).collect()}
    for i, (op, ts, txn, after) in enumerate(rows):
        r = got[i]
        assert r.kind == "change"
        assert (r.op, r.ts_ms, r.txn_id, r.after) == (op, ts, txn, after)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["BEGIN", "END"]),
            field_text,
            st.integers(min_value=0, max_value=2**31),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_txn_envelope_round_trip(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s, t, c) for i, (s, t, c) in enumerate(rows)],
        "seq long, status string, txn_id string, event_count long",
    )
    env = df.select(
        "seq",
        render_txn_envelope(F.col("status"), F.col("txn_id"), F.col("event_count")).alias(
            "value"
        ),
    )
    got = {r.seq: r for r in parse_debezium(env).collect()}
    for i, (status, txn, cnt) in enumerate(rows):
        r = got[i]
        assert r.kind == "txn"
        assert (r.status, r.txn_id, r.event_count) == (status, txn, cnt)
