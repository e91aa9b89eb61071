"""Vendored protobuf shim (vendor/protoshim): wire-format round-trips
over the REAL pyspark-generated StateMessage module, plus the edge
cases the generated clients rely on. Skipped entirely when a real
protobuf install is present (then the shim never loads and there is
nothing to test)."""

from __future__ import annotations

import pytest

from cdc_via_flink_spark.vendor.proto_compat import ensure_protobuf

if ensure_protobuf() != "shim":
    pytest.skip(
        "real protobuf present — shim inactive", allow_module_level=True
    )

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def roundtrip(msg, cls):
    out = cls()
    out.ParseFromString(msg.SerializeToString())
    return out


def test_nested_oneof_roundtrip_and_canonical_bytes():
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    # canonical encoding, verifiable by hand against the public spec:
    # 08 02           field 1 (version) varint 2
    # 12 04           field 2 (statefulProcessorCall) LEN 4
    #   0a 02         field 1 (setHandleState) LEN 2
    #     08 01       field 1 (state) varint 1 (CREATED)
    assert req.SerializeToString().hex() == "080212040a020801"
    back = roundtrip(req, sm.StateRequest)
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_oneof_last_set_wins():
    req = sm.StateRequest(version=1)
    req.timerRequest = sm.TimerRequest(
        timerValueRequest=sm.TimerValueRequest(getWatermark=sm.GetWatermark())
    )
    req.stateVariableRequest = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="s", get=sm.Get())
    )
    back = roundtrip(req, sm.StateRequest)
    assert back.WhichOneof("method") == "stateVariableRequest"
    assert not back.HasField("timerRequest")


def test_empty_oneof_submessage_still_serialized():
    """A oneof member set to an empty message must hit the wire (the
    JVM dispatches on which member is present)."""
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    assert req.SerializeToString() != b""
    assert roundtrip(req, sm.ImplicitGroupingKeyRequest).WhichOneof(
        "method"
    ) == "removeImplicitKey"


def test_negative_int64_ten_byte_varint():
    lv = sm.StateResponseWithLongTypeVal(value=-1)
    blob = lv.SerializeToString()
    # -1 as two's-complement 64-bit varint = 10 bytes of payload
    assert blob.hex() == "18" + "ff" * 9 + "01"
    assert roundtrip(lv, sm.StateResponseWithLongTypeVal).value == -1


def test_repeated_bytes_and_bool():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    back = roundtrip(resp, sm.StateResponseWithListGet)
    assert back.value == [b"a", b"bb", b""]
    assert back.requireNextFetch is True
    assert back.statusCode == 0
    assert back.errorMessage == ""


def test_repeated_message_field():
    resp = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2"),
        ],
        requireNextFetch=False,
    )
    back = roundtrip(resp, sm.StateResponseWithMapIterator)
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b""),
    ]


def test_proto3_optional_presence():
    with_key = sm.TimerInfo(key=b"k", timestampMs=5)
    without = sm.TimerInfo(timestampMs=5)
    assert roundtrip(with_key, sm.TimerInfo).HasField("key")
    assert not roundtrip(without, sm.TimerInfo).HasField("key")


def test_unknown_fields_skipped():
    """Wire data from a NEWER schema (extra fields) must parse: the
    unknown record is skipped, known fields land."""
    from cdc_via_flink_spark.vendor.protoshim_testhooks import append_unknown

    blob = sm.StateResponse(statusCode=7, value=b"x").SerializeToString()
    blob = append_unknown(blob)
    out = sm.StateResponse()
    out.ParseFromString(blob)
    assert out.statusCode == 7
    assert out.value == b"x"


def test_default_scalars_not_serialized():
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""


def test_utf8_string_roundtrip():
    r = sm.StateResponseWithStringTypeVal(value="héllo ∆ 事务")
    assert roundtrip(r, sm.StateResponseWithStringTypeVal).value == "héllo ∆ 事务"


def test_varint_overflow_bits_masked_to_64():
    """A 10-byte varint whose final byte carries bits past 2^64 must
    be truncated to 64 bits (the real runtime's behavior), so
    to_signed64 still maps it to the correct sign-extended int64."""
    from google.protobuf import _wire

    # -1 encoded canonically ends with a 0x01 final byte; 0x7f there
    # sets bits 63..69 — everything past bit 63 must vanish
    buf = bytes([0xFF] * 9 + [0x7F])
    v, pos = _wire.decode_varint(buf, 0)
    assert pos == 10
    assert v == _wire.MASK64
    assert _wire.to_signed64(v) == -1


def test_truncated_packed_fixed_payload_raises_decode_error():
    """A packed fixed32/64 payload whose length is not a multiple of
    the element width must surface as DecodeError (not a raw
    struct.error escaping the parser)."""
    from google.protobuf import _wire
    from google.protobuf import message as M

    class FD32:
        type = M.FD.TYPE_FLOAT
        full_name = "t.f32"

    class FD64:
        type = M.FD.TYPE_DOUBLE
        full_name = "t.f64"

    with pytest.raises(_wire.WireError):
        M._decode_packed(FD32, b"\x00" * 6)  # 6 % 4 != 0
    with pytest.raises(_wire.WireError):
        M._decode_packed(FD64, b"\x00" * 12)  # 12 % 8 != 0
