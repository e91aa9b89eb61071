"""Property-based reconstruction tests (SURVEY.md §5.2-3): random
interleavings of changes/ENDs across transactions; invariants checked
against a trivial Python reference model of the V1 semantics.

The Spark round-trips are expensive, so hypothesis drives a modest
number of examples with a deadline disabled; the model is the spec:
replay rows in seq order, buffer per txn, emit on END if buffer
non-empty."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_via_flink_spark.operators.reconstruct import reconstruct_transactions

# a scenario: list of (txn 0..2, is_end, op 'c'|'u'|'d')
event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.booleans(),
        st.sampled_from(["c", "u", "d"]),
    ),
    min_size=1,
    max_size=24,
)


def model(events):
    """Python reference model of V1 emit-on-END."""
    buf: dict[int, list[tuple[int, str]]] = {}
    out = []
    for seq, (txn, is_end, op) in enumerate(events):
        if is_end:
            if buf.get(txn):
                ops = ",".join(o for _, o in buf[txn])
                out.append((f"t{txn}", seq, len(buf[txn]), ops))
                buf[txn] = []
        else:
            buf.setdefault(txn, []).append((seq, op))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_strategy)
def test_reconstruction_matches_model(spark, events):
    changes = [
        (f"t{txn}", seq, op, 1000 + seq)
        for seq, (txn, is_end, op) in enumerate(events)
        if not is_end
    ]
    ends = [
        (f"t{txn}", seq, 1)
        for seq, (txn, is_end, _) in enumerate(events)
        if is_end
    ]
    if not changes or not ends:
        return
    c = spark.createDataFrame(changes, "txn_id string, seq long, op string, ts_ms long")
    e = spark.createDataFrame(ends, "txn_id string, seq long, event_count long")
    got = sorted(
        (r.txn_id, r.end_seq, r.n_events, r.ops_concat)
        for r in reconstruct_transactions(c, e).collect()
    )
    assert got == model(events)
