"""Wire-format codec tests — reference vectors from the published protobuf
encoding spec, protojson conventions, and the Spark decode path."""

from __future__ import annotations

import base64
import json
import math
import struct

import pytest

from caterpillar_spark.sources.protowire import (
    PField,
    decode_message,
    decode_protobuf_rows,
    encode_message,
    protojson_string,
    to_protojson,
)

INT_SPEC = {1: PField("a", "int64")}


def test_spec_canonical_varint_vector():
    # the spec's worked example: field 1 varint 150 == 08 96 01
    assert encode_message({"a": 150}, INT_SPEC) == bytes([0x08, 0x96, 0x01])
    assert decode_message(bytes([0x08, 0x96, 0x01]), INT_SPEC) == {"a": 150}


def test_spec_canonical_string_vector():
    # field 2 string "testing" == 12 07 74 65 73 74 69 6e 67
    spec = {2: PField("b", "string")}
    wire = bytes([0x12, 0x07]) + b"testing"
    assert encode_message({"b": "testing"}, spec) == wire
    assert decode_message(wire, spec) == {"b": "testing"}


def test_negative_int64_is_ten_byte_varint():
    wire = encode_message({"a": -2}, INT_SPEC)
    assert len(wire) == 1 + 10  # tag + 10-byte two's-complement varint
    assert decode_message(wire, INT_SPEC) == {"a": -2}


def test_zigzag_sint_vectors():
    # spec table: 0→0, -1→1, 1→2, -2→3, max/min 64-bit
    spec = {1: PField("s", "sint64")}
    for val, zz in [(0, 0), (-1, 1), (1, 2), (-2, 3)]:
        wire = encode_message({"s": val}, spec)
        body = wire[1:]
        n, shift = 0, 0
        for byte in body:
            n |= (byte & 0x7F) << shift
            shift += 7
        assert n == zz
        assert decode_message(wire, spec) == {"s": val}
    for extreme in (2**63 - 1, -(2**63)):
        assert decode_message(encode_message({"s": extreme}, spec), spec) == {
            "s": extreme
        }


def test_fixed_and_float_widths():
    spec = {
        1: PField("d", "double"),
        2: PField("f", "float"),
        3: PField("x", "fixed32"),
        4: PField("y", "sfixed64"),
    }
    vals = {"d": -1.5, "f": 2.0, "x": 7, "y": -9}
    wire = encode_message(vals, spec)
    assert decode_message(wire, spec) == vals
    # double survives bit-exact
    weird = struct.unpack("<d", struct.pack("<d", 0.1))[0]
    assert decode_message(encode_message({"d": weird}, spec), spec)["d"] == weird


def test_packed_repeated_roundtrip_and_unpacked_decode():
    spec = {1: PField("v", "int64", repeated=True)}
    wire = encode_message({"v": [3, 270, 86942]}, spec)
    # packed: single LEN record (tag 0x0A)
    assert wire[0] == 0x0A
    assert decode_message(wire, spec) == {"v": [3, 270, 86942]}
    # decoder also accepts the unpacked form (one varint record each)
    unpacked = b"".join(bytes([0x08]) + encode_message({"a": n}, INT_SPEC)[1:] for n in (3, 270))
    assert decode_message(unpacked, spec) == {"v": [3, 270]}


def test_nested_message_and_merge_semantics():
    inner = {1: PField("id", "int64"), 2: PField("tag", "string")}
    spec = {1: PField("m", "message", fields=inner)}
    wire = encode_message({"m": {"id": 5, "tag": "x"}}, spec)
    assert decode_message(wire, spec) == {"m": {"id": 5, "tag": "x"}}
    # duplicate singular message occurrences merge field-wise
    wire2 = encode_message({"m": {"id": 9}}, spec)
    assert decode_message(wire + wire2, spec) == {"m": {"id": 9, "tag": "x"}}


def test_repeated_message():
    inner = {1: PField("id", "int64")}
    spec = {1: PField("ms", "message", repeated=True, fields=inner)}
    wire = encode_message({"ms": [{"id": 1}, {"id": 2}]}, spec)
    assert decode_message(wire, spec) == {"ms": [{"id": 1}, {"id": 2}]}


def test_unknown_fields_skipped_or_strict():
    # encode with a two-field spec, decode with a one-field spec
    big = {1: PField("a", "int64"), 2: PField("b", "string"), 3: PField("c", "double")}
    wire = encode_message({"a": 1, "b": "zz", "c": 2.5}, big)
    assert decode_message(wire, INT_SPEC) == {"a": 1}
    with pytest.raises(ValueError, match="unknown field"):
        decode_message(wire, INT_SPEC, strict=True)


def test_scalar_duplicate_last_one_wins():
    wire = encode_message({"a": 1}, INT_SPEC) + encode_message({"a": 7}, INT_SPEC)
    assert decode_message(wire, INT_SPEC) == {"a": 7}


def test_truncation_errors():
    spec = {2: PField("b", "string")}
    wire = encode_message({"b": "testing"}, spec)
    with pytest.raises(ValueError):
        decode_message(wire[:-1], spec)
    with pytest.raises(ValueError):
        decode_message(bytes([0x08, 0x96]), INT_SPEC)  # truncated varint


def test_protojson_conventions():
    spec = {
        1: PField("event_id", "int64"),
        2: PField("payload", "bytes"),
        3: PField("score", "double"),
        4: PField("kind", "enum", names={1: "CREATE"}),
    }
    decoded = {"event_id": 2**40, "payload": b"\x00\x01", "score": 1.25, "kind": 1}
    j = to_protojson(decoded, spec)
    assert j["eventId"] == str(2**40)  # camelCase + int64-as-string
    assert j["payload"] == base64.b64encode(b"\x00\x01").decode()
    assert j["score"] == 1.25
    assert j["kind"] == "CREATE"
    j2 = to_protojson(decoded, spec, use_proto_names=True)
    assert "event_id" in j2 and "eventId" not in j2


def test_protojson_emit_unpopulated_and_specials():
    spec = {1: PField("a", "int64"), 2: PField("b", "string"), 3: PField("d", "double")}
    assert to_protojson({}, spec) == {}
    full = to_protojson({}, spec, emit_unpopulated=True)
    assert full == {"a": "0", "b": "", "d": 0.0}
    assert to_protojson({"d": math.nan}, spec)["d"] == "NaN"
    assert to_protojson({"d": math.inf}, spec)["d"] == "Infinity"


def test_protojson_string_field_number_order():
    spec = {2: PField("later", "int64"), 1: PField("first", "string")}
    s = protojson_string(encode_message({"later": 1, "first": "x"}, spec), spec)
    assert list(json.loads(s)) == ["first", "later"]


EVENT_SPEC = {
    1: PField("event_id", "int64"),
    2: PField("user_id", "int64"),
    3: PField("event_type", "string"),
    4: PField("value", "double"),
    5: PField("props", "string"),
    6: PField("ts_us", "sint64"),
}


def test_decode_protobuf_rows_spark(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows = [
        {"event_id": 1, "user_id": 10, "event_type": "click", "value": 0.5,
         "props": '{"k":1}', "ts_us": 1_700_000_000_000_000},
        {"event_id": 2, "user_id": -3, "event_type": "view", "value": -2.25,
         "props": "", "ts_us": -1},
    ]
    blobs = [(encode_message(r, EVENT_SPEC),) for r in rows]
    df = spark.createDataFrame(blobs, T.StructType([T.StructField("data", T.BinaryType())]))
    out = decode_protobuf_rows(df, "data", EVENT_SPEC, drop_input=True)
    got = [json.loads(r.record) for r in out.orderBy(F.col("record")).collect()]
    got.sort(key=lambda d: d["eventId"])
    assert got[0]["eventId"] == "1" and got[0]["eventType"] == "click"
    assert got[1]["userId"] == "-3" and got[1]["value"] == -2.25
    assert got[1]["tsUs"] == "-1"
    # null payloads stay null, no crash
    dfn = spark.createDataFrame(
        [(None,)], T.StructType([T.StructField("data", T.BinaryType())])
    )
    assert decode_protobuf_rows(dfn, "data", EVENT_SPEC).collect()[0].record is None


def test_len_field_wire_type_mismatch_raises():
    """A VARINT-typed record for a declared LEN field (string/bytes/message)
    must error like _decode_scalar's mismatch, not misread the varint value
    as a byte length (silent garbage decode on schema drift)."""
    varint_rec = encode_message({"a": 150}, INT_SPEC)  # field 1, wtype VARINT
    with pytest.raises(ValueError, match="wire type"):
        decode_message(varint_rec, {1: PField("s", "string")})
    with pytest.raises(ValueError, match="wire type"):
        decode_message(varint_rec, {1: PField("b", "bytes")})
    with pytest.raises(ValueError, match="wire type"):
        decode_message(varint_rec, {1: PField("m", "message", fields=INT_SPEC)})


def test_protojson_float32_shortest_repr():
    """protojson emits the shortest decimal that round-trips at float32
    precision: 0.1f renders as 0.1, not 0.10000000149011612."""
    spec = {1: PField("f", "float")}
    for orig in (0.1, 1.0 / 3.0, 2.5, -7.25e-3, 3.4e38):
        f32 = struct.unpack("<f", struct.pack("<f", orig))[0]
        dec = decode_message(encode_message({"f": orig}, spec), spec)
        assert dec["f"] == f32  # decode stays bit-exact (double widening)
        j = to_protojson(dec, spec)["f"]
        # shortest: re-narrowing the emitted decimal recovers the same bits
        assert struct.pack("<f", j) == struct.pack("<f", f32)
        assert len(repr(j)) <= len(repr(f32))
    assert to_protojson(decode_message(encode_message({"f": 0.1}, spec), spec), spec)["f"] == 0.1


def test_encode_rows_null_cells_encode_absent(spark):
    """Arrow->pandas hands null long/double cells to the encode UDF as
    float64 NaN, not None: they must encode as absent fields (proto3
    implicit presence), not crash int(NaN) or emit a NaN double."""
    from pyspark.sql import types as T

    from caterpillar_spark.sources.protowire import encode_protobuf_rows

    spec = {
        1: PField("a", "int64"),
        2: PField("s", "sint64"),
        3: PField("d", "double"),
        4: PField("t", "string"),
    }
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("s", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("t", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, -2, 0.5, "x"), (None, None, None, None), (3, None, 1.5, None)],
        schema,
    )
    blobs = [r.data for r in encode_protobuf_rows(df, spec).collect()]
    got = sorted(
        (decode_message(b, spec) for b in blobs),
        key=lambda d: d.get("a", -1),
    )
    assert got[0] == {}  # all-null row -> empty message
    assert got[1] == {"a": 1, "s": -2, "d": 0.5, "t": "x"}
    assert got[2] == {"a": 3, "d": 1.5}
