"""Unit tests for the vendored mini-protobuf runtime (vendor/google/).

The authoritative conformance check is the Spark JVM state server
(tests/test_streaming.py::test_transform_with_state_*); these tests pin
the wire-format edge cases and the proto3 presence semantics the E2E
path may not hit every run.
"""

from __future__ import annotations

import pytest

from dask_felleskomponenter_spark.vendorshim import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="vendored protobuf unavailable"
)


def _pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# -- wire primitives ----------------------------------------------------


def test_varint_roundtrip_boundaries():
    from google.protobuf.internal import wire

    for value in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, 2**64 - 1):
        out = bytearray()
        wire.encode_varint(value, out)
        decoded, pos = wire.decode_varint(bytes(out), 0)
        assert decoded == value and pos == len(out)


def test_varint_negative_is_ten_bytes_twos_complement():
    from google.protobuf.internal import wire

    out = bytearray()
    wire.encode_varint(-1, out)
    assert len(out) == 10
    decoded, _ = wire.decode_varint(bytes(out), 0)
    assert wire.to_signed64(decoded) == -1


def test_truncated_varint_raises():
    from google.protobuf.internal import wire

    with pytest.raises(wire.WireError):
        wire.decode_varint(b"\xff\xff", 0)


def test_overlong_varint_raises():
    from google.protobuf.internal import wire

    with pytest.raises(wire.WireError):
        wire.decode_varint(b"\xff" * 11, 0)


# -- message semantics --------------------------------------------------


def test_implicit_presence_scalar_default_not_serialized():
    sm = _pb2()
    resp = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert resp.SerializeToString() == b""


def test_oneof_assignment_clears_siblings():
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    # Building a new request with a different member must not leak the old.
    req2 = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert req2.WhichOneof("method") == "implicitGroupingKeyRequest"
    parsed = sm.StateRequest()
    parsed.ParseFromString(req2.SerializeToString())
    assert parsed.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not parsed.HasField("statefulProcessorCall")


def test_lazy_nested_message_read_does_not_attach():
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    _ = cmd.ttl.durationMs  # read-only traversal
    assert b"\x22" not in cmd.SerializeToString()[:1]  # no ttl tag emitted
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 7  # write-through attaches
    assert cmd.HasField("ttl")
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(cmd.SerializeToString())
    assert parsed.ttl.durationMs == 7


def test_empty_submessage_set_via_constructor_is_emitted():
    """Oneof members carrying empty messages (Exists, Clear, Get) must
    appear on the wire even though their payload is zero-length —
    that's how the JVM dispatches the method."""
    sm = _pb2()
    call = sm.ValueStateCall(stateName="v", exists=sm.Exists())
    data = call.SerializeToString()
    parsed = sm.ValueStateCall()
    parsed.ParseFromString(data)
    assert parsed.WhichOneof("method") == "exists"


def test_repeated_bytes_and_requireNextFetch():
    sm = _pb2()
    resp = sm.StateResponseWithListGet(value=[b"a", b"bb"], requireNextFetch=True)
    parsed = sm.StateResponseWithListGet()
    parsed.ParseFromString(resp.SerializeToString())
    assert list(parsed.value) == [b"a", b"bb"]
    assert parsed.requireNextFetch is True


def test_repeated_message_roundtrip_and_add():
    sm = _pb2()
    resp = sm.StateResponseWithMapIterator()
    pair = resp.kvPair.add(key=b"k", value=b"v")
    assert pair.key == b"k"
    parsed = sm.StateResponseWithMapIterator()
    parsed.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in parsed.kvPair] == [(b"k", b"v")]


def test_negative_int32_int64_roundtrip():
    sm = _pb2()
    resp = sm.StateResponseWithLongTypeVal(statusCode=-7, value=-(2**40))
    parsed = sm.StateResponseWithLongTypeVal()
    parsed.ParseFromString(resp.SerializeToString())
    assert parsed.statusCode == -7
    assert parsed.value == -(2**40)


def test_unknown_fields_are_skipped():
    sm = _pb2()
    # field 15 varint + field 14 length-delimited, neither in StateResponse.
    payload = b"\x78\x2a" + b"\x72\x03abc" + b"\x08\x05"
    resp = sm.StateResponse()
    resp.ParseFromString(payload)
    assert resp.statusCode == 5


def test_unicode_string_field_roundtrip():
    sm = _pb2()
    schema = sm.ParseStringSchema(schema="navn STRING, blåbær DOUBLE")
    parsed = sm.ParseStringSchema()
    parsed.ParseFromString(schema.SerializeToString())
    assert parsed.schema == "navn STRING, blåbær DOUBLE"


def test_proto3_optional_bytes_presence():
    sm = _pb2()
    ti = sm.TimerInfo(timestampMs=9)
    assert not ti.HasField("key")
    ti2 = sm.TimerInfo(key=b"", timestampMs=9)
    # Explicit presence: empty bytes still serializes when set.
    parsed = sm.TimerInfo()
    parsed.ParseFromString(ti2.SerializeToString())
    assert parsed.HasField("key")
    assert parsed.key == b""


def test_copyfrom_empty_message_sets_presence():
    """parent.child.CopyFrom(empty) must mark child present (real-
    runtime explicit attach), emitting a zero-length submessage."""
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.ttl.CopyFrom(sm.TTLConfig())
    assert cmd.HasField("ttl")
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(cmd.SerializeToString())
    assert parsed.HasField("ttl")
    assert parsed.ttl.durationMs == 0


def test_copyfrom_is_deep():
    sm = _pb2()
    original = sm.StateCallCommand(stateName="a")
    original.ttl.durationMs = 1
    clone = sm.StateCallCommand()
    clone.CopyFrom(original)
    clone.ttl.durationMs = 2
    assert original.ttl.durationMs == 1


def test_decode_error_on_garbage():
    from google.protobuf.message import DecodeError

    sm = _pb2()
    resp = sm.StateResponse()
    with pytest.raises(DecodeError):
        resp.ParseFromString(b"\x0a\xff")  # length 255 but no payload


def test_enum_wrapper_and_module_constants():
    sm = _pb2()
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4


def test_out_of_range_int32_rejected():
    """An int32 field refusing 2**40 protects against silent JVM
    truncation (protobuf-java reads only the low 32 bits)."""
    sm = _pb2()
    with pytest.raises(ValueError, match="outside"):
        sm.StateResponse(statusCode=2**40)
    with pytest.raises(ValueError, match="outside"):
        sm.StateResponseWithLongTypeVal(value=2**63)  # int64 max is 2**63-1


def test_bool_field_rejects_non_bool():
    sm = _pb2()
    with pytest.raises(TypeError):
        sm.StateResponseWithListGet(requireNextFetch="abc")
    resp = sm.StateResponseWithListGet(requireNextFetch=1)  # 0/1 ints ok
    assert resp.requireNextFetch is True


def test_cleared_child_does_not_reattach():
    """A stale reference to a cleared nested message must stay detached
    (real-runtime semantics); silent re-attach could resurrect a
    cleared oneof member and change which RPC the JVM dispatches."""
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 5
    stale = cmd.ttl
    cmd.ClearField("ttl")
    stale.durationMs = 9
    assert not cmd.HasField("ttl")
    # Same through Clear() and for oneof members:
    call = sm.StatefulProcessorCall()
    lazy = call.getValueState  # lazy, never attached
    call.ParseFromString(
        sm.StatefulProcessorCall(
            deleteIfExists=sm.StateCallCommand(stateName="x")
        ).SerializeToString()
    )
    lazy.stateName = "hijack"
    assert call.WhichOneof("method") == "deleteIfExists"


def test_invalid_utf8_raises_decode_error():
    from google.protobuf.message import DecodeError

    sm = _pb2()
    resp = sm.StateResponseWithStringTypeVal()
    with pytest.raises(DecodeError, match="UTF-8"):
        resp.ParseFromString(b"\x12\x02\xff\xfe")  # errorMessage field


def test_packageless_file_descriptor_loads():
    """FileDescriptorProto with no package: nested type registration and
    field type_name resolution must agree on the (dotless) full name."""
    from google.protobuf import descriptor_pool

    # Hand-built FileDescriptorProto: file 'x.proto', message Outer
    # { Inner inner = 1; message Inner { int32 n = 1; } }
    def ld(tag, payload):
        return bytes([tag, len(payload)]) + payload

    inner = ld(0x0A, b"Inner") + ld(
        0x12, ld(0x0A, b"n") + b"\x18\x01\x20\x01\x28\x05"
    )
    field = (
        ld(0x0A, b"inner")
        + b"\x18\x01\x20\x01\x28\x0b"
        + ld(0x32, b".Outer.Inner")
    )
    outer = ld(0x0A, b"Outer") + ld(0x12, field) + ld(0x1A, inner)
    # syntax (field 12) spelled explicitly: an ABSENT syntax field means
    # proto2 per descriptor.proto, which the mini-runtime now rejects
    # loudly instead of silently modeling with proto3 presence rules
    fdp = (
        ld(0x0A, b"packageless_test.proto")
        + ld(0x22, outer)
        + ld(0x62, b"proto3")
    )
    pool = descriptor_pool.DescriptorPool()
    file = pool.AddSerializedFile(fdp)
    desc = file.message_types_by_name["Outer"]
    assert desc.full_name == "Outer"
    assert desc.fields_by_name["inner"].message_type.full_name == "Outer.Inner"


def test_field_number_order_canonical():
    """Serialization emits ascending field numbers regardless of
    assignment order (stable bytes for equality checks)."""
    sm = _pb2()
    a = sm.StateCallCommand()
    a.schema = "s"
    a.stateName = "n"
    b = sm.StateCallCommand()
    b.stateName = "n"
    b.schema = "s"
    assert a.SerializeToString() == b.SerializeToString()


# -- property-based round-trip fuzz -------------------------------------


def _random_value(field, rnd, depth):
    from google.protobuf.descriptor import FieldDescriptor as FD

    if field.type == FD.TYPE_STRING:
        n = rnd.randrange(0, 12)
        return "".join(
            rnd.choice("abcæøå日本é \t\n\U0001f600") for _ in range(n)
        )
    if field.type == FD.TYPE_BYTES:
        return bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 16)))
    if field.type == FD.TYPE_BOOL:
        return rnd.random() < 0.5
    if field.type == FD.TYPE_ENUM:
        return rnd.choice(list(field.enum_type.values_by_number))
    if field.type in (FD.TYPE_INT32, FD.TYPE_SINT32):
        return rnd.choice([0, 1, -1, 127, -128, 2**31 - 1, -(2**31)])
    if field.type in (FD.TYPE_UINT32,):
        return rnd.choice([0, 1, 2**32 - 1])
    if field.type in (FD.TYPE_INT64, FD.TYPE_SINT64):
        return rnd.choice([0, 1, -1, 2**63 - 1, -(2**63), 10**12, -(10**12)])
    if field.type in (FD.TYPE_UINT64,):
        return rnd.choice([0, 1, 2**64 - 1])
    if field.type == FD.TYPE_MESSAGE:
        return _random_message(field.message_type._concrete_class, rnd, depth + 1)
    raise AssertionError(f"unexpected type {field.type}")


def _random_message(cls, rnd, depth=0):
    from google.protobuf.descriptor import FieldDescriptor as FD

    msg = cls()
    if depth > 4:
        return msg
    chosen_oneofs = set()
    for field in cls.DESCRIPTOR.fields:
        if rnd.random() < 0.45:
            continue
        oneof = field.containing_oneof
        if oneof is not None:
            if oneof.name in chosen_oneofs:
                continue
            chosen_oneofs.add(oneof.name)
        if field.is_repeated:
            container = getattr(msg, field.name)
            for _ in range(rnd.randrange(0, 4)):
                if field.type == FD.TYPE_MESSAGE:
                    container.append(_random_value(field, rnd, depth))
                else:
                    container.append(_random_value(field, rnd, depth))
        elif field.type == FD.TYPE_MESSAGE:
            getattr(msg, field.name).CopyFrom(_random_value(field, rnd, depth))
        else:
            setattr(msg, field.name, _random_value(field, rnd, depth))
    return msg


def test_fuzz_roundtrip_all_message_types():
    """Random message trees over every StateMessage type must round-trip
    SerializeToString → ParseFromString to an equal message, and
    re-serialize to identical bytes (canonical form is a fixpoint)."""
    import random

    sm = _pb2()
    classes = [
        getattr(sm, name)
        for name in sm.DESCRIPTOR.message_types_by_name
        if hasattr(sm, name)
    ]
    rnd = random.Random(0x5EED)
    for _ in range(300):
        cls = rnd.choice(classes)
        original = _random_message(cls, rnd)
        data = original.SerializeToString()
        parsed = cls()
        parsed.ParseFromString(data)
        assert parsed == original, (cls.__name__, original, parsed)
        assert parsed.SerializeToString() == data


def test_fuzz_parser_never_desyncs_on_concatenation():
    """Protobuf concatenation semantics: parsing A+B equals merging B
    into A (last-wins scalars, appended repeated fields)."""
    import random

    sm = _pb2()
    rnd = random.Random(0xC0FFEE)
    for _ in range(100):
        a = _random_message(sm.StateResponseWithListGet, rnd)
        b = _random_message(sm.StateResponseWithListGet, rnd)
        combined = sm.StateResponseWithListGet()
        combined.ParseFromString(a.SerializeToString() + b.SerializeToString())
        expected = sm.StateResponseWithListGet()
        expected.MergeFromString(a.SerializeToString())
        expected.MergeFromString(b.SerializeToString())
        assert combined == expected


def test_parse_repeated_into_lazy_child_attaches_to_parent():
    """Repeated-only content parsed into a lazily-obtained child must
    attach the child to its parent: an unmarked store serialized the
    parent as EMPTY, silently dropping e.g. a ListStatePut payload on
    the wire to the JVM state server."""
    sm = _pb2()
    parent = sm.ListStateCall()
    put = sm.ListStatePut()
    put.value.append(b"abc")
    payload = put.SerializeToString()
    assert payload  # repeated content really is on the wire

    parent.listStatePut.ParseFromString(payload)
    assert parent.HasField("listStatePut")
    assert list(parent.listStatePut.value) == [b"abc"]
    assert parent.SerializeToString() != b""
    rt = sm.ListStateCall()
    rt.ParseFromString(parent.SerializeToString())
    assert list(rt.listStatePut.value) == [b"abc"]


def test_stale_lazy_reference_cannot_clobber_parsed_content():
    """A reference obtained BEFORE a parse must not wholesale replace
    content merged later: the real runtime keeps references valid, so
    either the parse promotes the referenced object (same-field case)
    or the stale object is detached (different-value case)."""
    sm = _pb2()
    src = sm.StateRequest()
    src.statefulProcessorCall.setHandleState.state = 2
    data = src.SerializeToString()

    dst = sm.StateRequest()
    ref = dst.statefulProcessorCall  # lazy child cached pre-parse
    dst.MergeFromString(data)
    # the parse merged INTO the referenced child (promotion), so the
    # held reference sees the parsed content...
    assert dst.statefulProcessorCall.setHandleState.state == 2
    assert ref.setHandleState.state == 2
    # ...and mutating through it composes instead of clobbering
    ref.setHandleState.state = 3
    rt = sm.StateRequest()
    rt.ParseFromString(dst.SerializeToString())
    assert rt.statefulProcessorCall.setHandleState.state == 3

def test_proto2_descriptor_rejected_loudly():
    """An absent syntax field means proto2; the proto3-only runtime must
    refuse it rather than silently flip presence semantics."""
    import pytest as _pytest

    from google.protobuf import descriptor_pool

    def ld(tag, payload):
        return bytes([tag, len(payload)]) + payload

    fdp = ld(0x0A, b"proto2_test.proto")  # no syntax field = proto2
    with _pytest.raises(NotImplementedError, match="proto3 only"):
        descriptor_pool.DescriptorPool().AddSerializedFile(fdp)


def test_int32_fields_truncate_like_java_on_parse():
    """Round-8 finding: the parse path stored int32/uint32/enum varints
    at full 64-bit width, silently reading DIFFERENT values than
    protobuf-java (which truncates to the declared width) from the same
    bytes — and re-serializing them out of range."""
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import wire

    def ld(tag, payload):
        return bytes([tag, len(payload)]) + payload

    # message Scalars { int32 i32 = 1; uint32 u32 = 2; }
    f_i32 = ld(0x0A, b"i32") + b"\x18\x01\x20\x01\x28\x05"
    f_u32 = ld(0x0A, b"u32") + b"\x18\x02\x20\x01\x28\x0d"
    msg = ld(0x0A, b"Scalars") + ld(0x12, f_i32) + ld(0x12, f_u32)
    fdp = (
        ld(0x0A, b"scalars_trunc_test.proto")
        + ld(0x22, msg)
        + ld(0x62, b"proto3")
    )
    from google.protobuf.internal.python_message import make_message_class

    pool = descriptor_pool.DescriptorPool()
    file = pool.AddSerializedFile(fdp)
    msg_cls = make_message_class(file.message_types_by_name["Scalars"])

    def roundtrip(field_number: int, raw_value: int):
        out = bytearray()
        wire.encode_tag(field_number, wire.WIRETYPE_VARINT, out)
        wire.encode_varint(raw_value, out)
        m = msg_cls()
        m.ParseFromString(bytes(out))
        return m

    # int32 field: 2**31 wraps to INT32_MIN, like readRawVarint32
    assert roundtrip(1, 2**31).i32 == -(2**31)
    # uint32 field: 2**35 masks to 0
    assert roundtrip(2, 2**35).u32 == 0
    # in-range values unchanged
    assert roundtrip(1, 7).i32 == 7
    # the stored value re-serializes legally (assignment-range check
    # would reject an untruncated 2**31)
    m = roundtrip(1, 2**31)
    m2 = msg_cls(); m2.ParseFromString(m.SerializeToString())
    assert m2.i32 == -(2**31)


def test_varint_bits_above_64_discarded_like_java():
    from google.protobuf.internal import wire

    # 10-byte varint whose 10th byte carries bits above 64: java masks
    buf = b"\xff" * 9 + b"\x7f"
    decoded, pos = wire.decode_varint(buf, 0)
    assert pos == 10
    assert decoded == (1 << 64) - 1  # masked to 64 bits
