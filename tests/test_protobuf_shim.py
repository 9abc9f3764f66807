"""Vendored protobuf wire shim: hand-verified wire bytes, round-trips
over every field shape the state protocol uses, and the generated-
module contract (pyspark's real StateMessage_pb2 built by the shim).

The end-to-end proof — the JVM's real protobuf parsing the shim's
bytes during transformWithStateInPandas — lives in
tests/test_stateful_streaming.py; these tests pin the codec itself.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

VENDOR = str(Path(__file__).resolve().parent.parent / "vendor")
# Use the session helper, never a local sys.path hack: the helper also
# exports PYTHONPATH so python workers spawned by a later JVM can see
# the shim (a collection-time sys.path.append here once left PYTHONPATH
# unset and broke the v2 driver worker mid-suite).
from pyanamo_spark.session import _activate_protobuf_shim  # noqa: E402

_activate_protobuf_shim()


@pytest.fixture(scope="module")
def sm():
    return pytest.importorskip(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )


def test_varint_codec_edges():
    from google.protobuf._runtime import decode_varint, encode_varint

    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, -1, -2**31):
        enc = encode_varint(v)
        dec, pos = decode_varint(enc, 0)
        assert pos == len(enc)
        if v < 0:
            assert dec == v + (1 << 64)  # two's complement on the wire
        else:
            assert dec == v
    assert encode_varint(1) == b"\x01"
    assert encode_varint(300) == b"\xac\x02"  # classic spec example
    assert len(encode_varint(-1)) == 10


def test_hand_verified_wire_bytes(sm):
    """Field-by-field hex check against the public wire format."""
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="s1",
                schema="x INT",
                ttl=sm.TTLConfig(durationMs=5000),
            )
        ),
    )
    # 08 02            field 1 (version) varint 2
    # 12 12            field 2 (statefulProcessorCall) len 18
    #   12 10          field 2 (getValueState) len 16
    #     0a 02 "s1"   field 1 stateName
    #     12 05 "x INT" field 2 schema
    #     22 03        field 4 ttl len 3
    #       08 88 27   field 1 durationMs = 5000
    assert req.SerializeToString().hex() == (
        "0802121212100a02733112057820494e542203088827"
    )


def test_roundtrip_every_field_shape(sm):
    # oneof + nested message
    r = sm.StateRequest(
        version=2,
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="v", valueStateUpdate=sm.ValueStateUpdate(value=b"\x00\xff")
            )
        ),
    )
    back = sm.StateRequest()
    back.ParseFromString(r.SerializeToString())
    call = back.stateVariableRequest.valueStateCall
    assert (call.stateName, call.valueStateUpdate.value) == ("v", b"\x00\xff")

    # repeated message + bool
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    b2 = sm.StateResponseWithMapIterator()
    b2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in b2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert b2.requireNextFetch is True

    # negative int32, repeated bytes, empty string default
    r3 = sm.StateResponseWithListGet(statusCode=-1, value=[b"a", b"bb"])
    b3 = sm.StateResponseWithListGet()
    b3.ParseFromString(r3.SerializeToString())
    assert (b3.statusCode, list(b3.value)) == (-1, [b"a", b"bb"])
    assert b3.errorMessage == ""  # absent -> proto3 default

    # int64 + string
    r4 = sm.ExpiryTimerRequest(iteratorId="it-1", expiryTimestampMs=-7)
    b4 = sm.ExpiryTimerRequest()
    b4.ParseFromString(r4.SerializeToString())
    assert (b4.iteratorId, b4.expiryTimestampMs) == ("it-1", -7)

    # enum hoisted to module level + enum field
    sh = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    b5 = sm.SetHandleState()
    b5.ParseFromString(sh.SerializeToString())
    assert b5.state == sm.TIMER_PROCESSED == 4


def test_empty_oneof_message_still_emits_field(sm):
    """Exists() carries no fields, but the oneof arm must hit the wire
    (tag + zero length) so the JVM sees which method was called."""
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    data = call.SerializeToString()
    back = sm.ValueStateCall()
    back.ParseFromString(data)
    assert "exists" in back._values  # arm present after round-trip
    assert b"\x12\x00" in data  # field 2, len 0


def test_unknown_fields_are_skipped(sm):
    """Forward compat: bytes containing a field the schema lacks must
    parse cleanly (varint, fixed64, fixed32 and len-delimited skips)."""
    known = sm.TTLConfig(durationMs=9).SerializeToString()
    unknown = (
        bytes([0xF8, 0x06, 0x2A])        # field 111 varint
        + bytes([0xF9, 0x06]) + b"\x00" * 8   # field 111 fixed64
        + bytes([0xFD, 0x06]) + b"\x00" * 4   # field 111 fixed32
        + bytes([0xFA, 0x06, 0x03]) + b"abc"  # field 111 len-delim
    )
    msg = sm.TTLConfig()
    msg.ParseFromString(known + unknown)
    assert msg.durationMs == 9


def test_real_protobuf_wins_when_installed():
    """The shim only joins sys.path when google.protobuf is missing —
    assert the activation helper is a no-op once importable."""
    import google.protobuf  # importable (shim or real)

    from pyanamo_spark.session import _activate_protobuf_shim

    before = list(sys.path)
    _activate_protobuf_shim()
    assert sys.path.count(VENDOR) <= 1
    assert [p for p in sys.path if p != VENDOR] == [
        p for p in before if p != VENDOR
    ]


def test_nested_message_inplace_mutation_persists(sm):
    """Real protobuf semantics: mutating an unset singular nested
    message through attribute access (msg.inner.x = 1) materializes
    the nested message and the mutation reaches the wire. The shim
    once returned a throwaway default here, silently discarding the
    write."""
    r = sm.StateRequest()
    r.stateVariableRequest.valueStateCall.stateName = "mutated"
    assert r.stateVariableRequest.valueStateCall.stateName == "mutated"
    back = sm.StateRequest()
    back.ParseFromString(r.SerializeToString())
    assert back.stateVariableRequest.valueStateCall.stateName == "mutated"


def test_pure_read_does_not_mark_presence(sm):
    """Real protobuf marks presence only on mutation: a pure read of a
    singular nested message (e.g. ``if msg.inner.x:``) must not make
    the field present — the shim once cached the default into _values
    on __getattr__, emitting an empty submessage on the wire and
    breaking __eq__/repr between otherwise-identical messages."""
    a = sm.StateRequest(version=2)
    b = sm.StateRequest(version=2)
    # pure reads, no mutation
    assert a.stateVariableRequest.valueStateCall.stateName == ""
    _ = a.statefulProcessorCall
    assert a == b
    assert a.SerializeToString() == b.SerializeToString()
    assert repr(a) == repr(b)
    # the lazily-vivified child keeps identity for later mutation
    a.stateVariableRequest.valueStateCall.stateName = "now set"
    assert a != b
    assert b"now set" in a.SerializeToString()
