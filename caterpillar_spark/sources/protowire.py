"""Pure-Python protobuf wire-format codec — un-gates the reference's
``converter: protobuf`` (``task/converter/protobuf.go:39-131``) in
environments without the spark-protobuf jar or ``google.protobuf``.

The reference loads a ``FileDescriptorSet``, unmarshals each binary record
into a dynamic message, and emits protojson (``protobuf.go:110-131``,
honoring ``use_proto_names`` and ``emit_unpopulated``). This module's
:class:`PField` spec plays the descriptor's role for the supported subset:
all four wire types, varint/zigzag/fixed scalars, strings, bytes, packed
and unpacked repeated fields, and (recursively) nested messages. Unknown
fields are skipped exactly as protojson drops them.

Two layers:

- pure codec (:func:`decode_message` / :func:`encode_message` /
  :func:`to_protojson`) — no Spark imports, unit-testable against the
  published wire-format vectors (e.g. ``08 96 01`` = field 1, varint 150);
- Spark integration (:func:`decode_protobuf_rows`) — an Arrow-batched
  pandas UDF mapping a binary column to protojson strings, the same
  record shape the reference's converter emits. Per-row independent →
  embarrassingly parallel, no shuffle, scale-bounded only by the scan.

The JVM ``from_protobuf`` path (``proto.decode_protobuf``) stays the
preferred form on clusters that ship the jar; this is the dependency-free
twin that makes the converter executable (and hash-verifiable — see
``__spark_entry__.q_protobuf_roundtrip``) in this sandbox.

protojson conventions implemented (deviations documented inline):
- field names emit as lowerCamelCase ``json_name`` unless
  ``use_proto_names=True``;
- 64-bit integer types emit as JSON strings;
- ``bytes`` emit as padded standard base64;
- proto3 scalar duplicates are last-one-wins; duplicate singular nested
  messages merge field-wise (shallow — nested repeated concatenation is
  approximated by the recursive decode's own append);
- enums emit as ints unless the spec carries a ``names`` map (a raw wire
  stream has no enum names without a descriptor).
"""

from __future__ import annotations

import base64
import json
import math
import struct
from dataclasses import dataclass, field

# Module-level on purpose: pandas_udf resolves the stringized (PEP 563)
# `pd.Series` type hints of the UDFs below against THIS module's globals —
# a function-local import leaves them unresolvable. The codec functions
# above the Spark section stay pandas-free.
import pandas as pd

_WIRE_VARINT, _WIRE_FIXED64, _WIRE_LEN, _WIRE_FIXED32 = 0, 1, 2, 5

# ptype -> (wire type, struct fmt for fixed widths)
_SCALARS = {
    "int32": (_WIRE_VARINT, None),
    "int64": (_WIRE_VARINT, None),
    "uint32": (_WIRE_VARINT, None),
    "uint64": (_WIRE_VARINT, None),
    "sint32": (_WIRE_VARINT, None),
    "sint64": (_WIRE_VARINT, None),
    "bool": (_WIRE_VARINT, None),
    "enum": (_WIRE_VARINT, None),
    "fixed64": (_WIRE_FIXED64, "<Q"),
    "sfixed64": (_WIRE_FIXED64, "<q"),
    "double": (_WIRE_FIXED64, "<d"),
    "fixed32": (_WIRE_FIXED32, "<I"),
    "sfixed32": (_WIRE_FIXED32, "<i"),
    "float": (_WIRE_FIXED32, "<f"),
    "string": (_WIRE_LEN, None),
    "bytes": (_WIRE_LEN, None),
}
_SIGNED_VARINT = {"int32", "int64"}  # two's-complement 64-bit on the wire
_ZIGZAG = {"sint32", "sint64"}
_INT64_AS_STRING = {"int64", "uint64", "sint64", "fixed64", "sfixed64"}


@dataclass(frozen=True)
class PField:
    """One descriptor row: proto field ``name`` + scalar ``ptype`` (a key
    of ``_SCALARS``) or ``"message"`` with ``fields`` as the nested spec
    (``{field_number: PField}``). ``names`` optionally maps enum ints to
    their protojson names."""

    name: str
    ptype: str
    repeated: bool = False
    fields: dict | None = None
    names: dict | None = field(default=None, hash=False)

    def __post_init__(self):
        if self.ptype == "message":
            if not self.fields:
                raise ValueError(f"{self.name}: message field needs a spec")
        elif self.ptype not in _SCALARS:
            raise ValueError(f"{self.name}: unknown ptype {self.ptype!r}")


# -- varint ------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint exceeds 10 bytes")


def _write_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint encodes non-negative ints only")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _twos_dec(n: int) -> int:
    """64-bit two's-complement varint -> signed (int32/int64 wire rule)."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _twos_enc(n: int) -> int:
    return n + (1 << 64) if n < 0 else n


# -- decode ------------------------------------------------------------


def _skip(data: bytes, pos: int, wtype: int) -> int:
    if wtype == _WIRE_VARINT:
        _, pos = _read_varint(data, pos)
    elif wtype == _WIRE_FIXED64:
        pos += 8
    elif wtype == _WIRE_LEN:
        n, pos = _read_varint(data, pos)
        pos += n
    elif wtype == _WIRE_FIXED32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wtype}")
    if pos > len(data):
        raise ValueError("truncated field")
    return pos


def _decode_scalar(f: PField, wtype: int, data: bytes, pos: int):
    want_wire, fmt = _SCALARS[f.ptype]
    if wtype != want_wire:
        raise ValueError(f"{f.name}: wire type {wtype}, spec says {want_wire}")
    if wtype == _WIRE_VARINT:
        raw, pos = _read_varint(data, pos)
        if f.ptype in _ZIGZAG:
            return _zigzag_dec(raw), pos
        if f.ptype in _SIGNED_VARINT:
            return _twos_dec(raw), pos
        if f.ptype == "bool":
            return bool(raw), pos
        return raw, pos
    width = 8 if wtype == _WIRE_FIXED64 else 4
    if pos + width > len(data):
        raise ValueError(f"{f.name}: truncated fixed{width * 8}")
    (val,) = struct.unpack_from(fmt, data, pos)
    return val, pos + width


def decode_message(data: bytes, spec: dict[int, PField], *, strict: bool = False) -> dict:
    """Binary message -> ``{name: python value}``. Unknown field numbers
    are wire-skipped (``strict=True`` raises instead). Packed repeated
    numerics (a LEN record holding consecutive scalars) and unpacked
    occurrences both accumulate into the same list."""
    out: dict = {}
    pos, n = 0, len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        fnum, wtype = tag >> 3, tag & 7
        if fnum == 0:
            raise ValueError("field number 0 is reserved")
        f = spec.get(fnum)
        if f is None:
            if strict:
                raise ValueError(f"unknown field number {fnum}")
            pos = _skip(data, pos, wtype)
            continue
        if f.ptype == "message":
            if wtype != _WIRE_LEN:
                # mirror _decode_scalar's mismatch error: a VARINT-typed
                # record for a declared-LEN field must not be misread as a
                # byte length (silent garbage on schema drift)
                raise ValueError(
                    f"{f.name}: wire type {wtype} for message field (want LEN)"
                )
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise ValueError(f"{f.name}: truncated message")
            val = decode_message(data[pos : pos + ln], f.fields, strict=strict)
            pos += ln
            if f.repeated:
                out.setdefault(f.name, []).append(val)
            elif f.name in out:
                out[f.name].update(val)  # proto merge: field-wise overwrite
            else:
                out[f.name] = val
            continue
        if f.ptype in ("string", "bytes"):
            if wtype != _WIRE_LEN:
                raise ValueError(
                    f"{f.name}: wire type {wtype} for {f.ptype} field (want LEN)"
                )
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise ValueError(f"{f.name}: truncated {f.ptype}")
            raw = data[pos : pos + ln]
            pos += ln
            val = raw.decode("utf-8") if f.ptype == "string" else bytes(raw)
        elif f.repeated and wtype == _WIRE_LEN:
            # packed encoding: one LEN record, consecutive scalars
            ln, pos = _read_varint(data, pos)
            end = pos + ln
            if end > n:
                raise ValueError(f"{f.name}: truncated packed run")
            vals = []
            while pos < end:
                v, pos = _decode_scalar(f, _SCALARS[f.ptype][0], data, pos)
                vals.append(v)
            out.setdefault(f.name, []).extend(vals)
            continue
        else:
            val, pos = _decode_scalar(f, wtype, data, pos)
        if f.repeated:
            out.setdefault(f.name, []).append(val)
        else:
            out[f.name] = val  # proto3 scalar duplicate: last one wins
    return out


# -- encode ------------------------------------------------------------


def _encode_scalar(f: PField, val) -> bytes:
    wire, fmt = _SCALARS[f.ptype]
    if wire == _WIRE_VARINT:
        if f.ptype in _ZIGZAG:
            return _write_varint(_zigzag_enc(int(val)))
        if f.ptype == "bool":
            return _write_varint(1 if val else 0)
        return _write_varint(_twos_enc(int(val)))
    return struct.pack(fmt, val)


def encode_message(values: dict, spec: dict[int, PField]) -> bytes:
    """Deterministic encoder: ascending field number, repeated fields in
    list order, repeated numerics packed (the proto3 default). ``None``
    values and absent keys encode nothing (proto3 implicit presence)."""
    out = bytearray()
    for fnum in sorted(spec):
        f = spec[fnum]
        val = values.get(f.name)
        if val is None:
            continue
        wire = _WIRE_LEN if f.ptype in ("message", "string", "bytes") else _SCALARS[f.ptype][0]
        if f.repeated:
            items = list(val)
            if not items:
                continue
            if f.ptype == "message":
                for item in items:
                    body = encode_message(item, f.fields)
                    out += _write_varint(fnum << 3 | _WIRE_LEN)
                    out += _write_varint(len(body)) + body
            elif f.ptype in ("string", "bytes"):
                for item in items:
                    raw = item.encode("utf-8") if f.ptype == "string" else bytes(item)
                    out += _write_varint(fnum << 3 | _WIRE_LEN)
                    out += _write_varint(len(raw)) + raw
            else:  # packed
                body = b"".join(_encode_scalar(f, v) for v in items)
                out += _write_varint(fnum << 3 | _WIRE_LEN)
                out += _write_varint(len(body)) + body
            continue
        if f.ptype == "message":
            body = encode_message(val, f.fields)
            out += _write_varint(fnum << 3 | _WIRE_LEN)
            out += _write_varint(len(body)) + body
        elif f.ptype in ("string", "bytes"):
            raw = val.encode("utf-8") if f.ptype == "string" else bytes(val)
            out += _write_varint(fnum << 3 | _WIRE_LEN)
            out += _write_varint(len(raw)) + raw
        else:
            out += _write_varint(fnum << 3 | wire)
            out += _encode_scalar(f, val)
    return bytes(out)


# -- protojson ---------------------------------------------------------


def _json_name(snake: str) -> str:
    head, *rest = snake.split("_")
    return head + "".join(w.capitalize() for w in rest)


def _scalar_default(f: PField):
    if f.ptype in ("string",):
        return ""
    if f.ptype == "bytes":
        return b""
    if f.ptype == "bool":
        return False
    if f.ptype in ("double", "float"):
        return 0.0
    return 0


def _shortest_float32(v: float) -> float:
    """Shortest decimal that round-trips to the same float32 bit pattern —
    protojson emits 0.1f as 0.1, not the double repr of its bit pattern
    (0.10000000149011612)."""
    bits = struct.pack("<f", v)
    for p in range(1, 10):
        cand = float(f"{v:.{p}g}")
        if struct.pack("<f", cand) == bits:
            return cand
    return v


def _json_value(f: PField, val, use_proto_names: bool, emit_unpopulated: bool):
    if f.ptype == "message":
        return to_protojson(
            val, f.fields, use_proto_names=use_proto_names, emit_unpopulated=emit_unpopulated
        )
    if f.ptype == "bytes":
        return base64.b64encode(val).decode("ascii")
    if f.ptype in _INT64_AS_STRING:
        return str(int(val))
    if f.ptype in ("double", "float"):
        v = float(val)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return _shortest_float32(v) if f.ptype == "float" else v
    if f.ptype == "enum" and f.names:
        return f.names.get(int(val), int(val))
    return val


def to_protojson(
    decoded: dict,
    spec: dict[int, PField],
    *,
    use_proto_names: bool = False,
    emit_unpopulated: bool = False,
) -> dict:
    """Decoded dict -> protojson-shaped dict, fields in field-number order
    (what ``protojson.MarshalOptions`` emits for the reference's two
    exposed knobs, ``protobuf.go:120-123``)."""
    out = {}
    for fnum in sorted(spec):
        f = spec[fnum]
        key = f.name if use_proto_names else _json_name(f.name)
        if f.name in decoded:
            val = decoded[f.name]
            if f.repeated:
                out[key] = [
                    _json_value(f, v, use_proto_names, emit_unpopulated) for v in val
                ]
            else:
                out[key] = _json_value(f, val, use_proto_names, emit_unpopulated)
        elif emit_unpopulated:
            if f.repeated:
                out[key] = []
            elif f.ptype == "message":
                out[key] = None
            else:
                out[key] = _json_value(f, _scalar_default(f), use_proto_names, emit_unpopulated)
    return out


def protojson_string(
    data: bytes,
    spec: dict[int, PField],
    *,
    use_proto_names: bool = False,
    emit_unpopulated: bool = False,
) -> str:
    return json.dumps(
        to_protojson(
            decode_message(data, spec),
            spec,
            use_proto_names=use_proto_names,
            emit_unpopulated=emit_unpopulated,
        ),
        separators=(",", ":"),
        ensure_ascii=False,
    )


# -- Spark integration --------------------------------------------------


def decode_protobuf_rows(
    df,
    data_col: str,
    spec: dict[int, PField],
    *,
    out_col: str = "record",
    use_proto_names: bool = False,
    emit_unpopulated: bool = False,
    drop_input: bool = False,
):
    """Binary column -> protojson string column, the reference converter's
    record shape (one JSON record per message, ``protobuf.go:130``).
    Arrow-batched pandas UDF: per-row independent, zero shuffle; at 100 TB
    the cost is the scan plus linear Python decode, spread over every
    executor. Downstream ``json_project`` / ``from_json`` pulls typed
    columns out."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _dec(col: pd.Series) -> pd.Series:
        return col.map(
            lambda b: None
            if b is None
            else protojson_string(
                bytes(b),
                spec,
                use_proto_names=use_proto_names,
                emit_unpopulated=emit_unpopulated,
            )
        )

    out = df.withColumn(out_col, _dec(F.col(data_col)))
    return out.drop(data_col) if drop_input else out


def encode_protobuf_rows(
    df,
    spec: dict[int, PField],
    *,
    out_col: str = "data",
    keep: tuple = (),
):
    """Inverse of :func:`decode_protobuf_rows`: the spec's named columns ->
    one wire-format binary column (plus any ``keep`` passthrough columns).
    Same scale shape as the decoder: Arrow-batched, per-row independent,
    zero shuffle. ``None`` cells encode as absent fields (proto3 implicit
    presence). Arrow->pandas represents a null long/double cell as float64
    NaN, not None, so NaN cells also encode as absent — which makes a
    *genuine* NaN double unrepresentable via this path (it would otherwise
    either crash ``int(NaN)`` for varint fields or silently break the
    None-is-absent contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    names = [spec[k].name for k in sorted(spec)]

    def _absent(v) -> bool:
        return v is None or (isinstance(v, float) and math.isnan(v))

    @F.pandas_udf(T.BinaryType())
    def _enc(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            rec = {n: v for n, v in zip(names, vals) if not _absent(v)}
            out.append(encode_message(rec, spec))
        return pd.Series(out, dtype=object)

    return df.select(
        *keep, _enc(*[F.col(n) for n in names]).alias(out_col)
    )
