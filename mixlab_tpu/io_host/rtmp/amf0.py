"""AMF0 encoding/decoding (the RTMP command-message payload format).

The reference gets AMF0 from the rml_rtmp crate; here it is implemented
directly (Adobe AMF0 spec): number, boolean, string, object, null,
undefined, ECMA array, strict array, long string.
"""

from __future__ import annotations

import struct
from typing import Any, List, Tuple

NUMBER = 0x00
BOOLEAN = 0x01
STRING = 0x02
OBJECT = 0x03
NULL = 0x05
UNDEFINED = 0x06
ECMA_ARRAY = 0x08
OBJECT_END = 0x09
STRICT_ARRAY = 0x0A
LONG_STRING = 0x0C


class Amf0Error(Exception):
    pass


def encode(value: Any) -> bytes:
    if value is None:
        return bytes([NULL])
    if isinstance(value, bool):
        return bytes([BOOLEAN, 1 if value else 0])
    if isinstance(value, (int, float)):
        return bytes([NUMBER]) + struct.pack(">d", float(value))
    if isinstance(value, str):
        data = value.encode("utf-8")
        if len(data) < 0x10000:
            return bytes([STRING]) + struct.pack(">H", len(data)) + data
        return bytes([LONG_STRING]) + struct.pack(">I", len(data)) + data
    if isinstance(value, dict):
        out = bytearray([OBJECT])
        for k, v in value.items():
            kb = str(k).encode("utf-8")
            out += struct.pack(">H", len(kb)) + kb
            out += encode(v)
        out += struct.pack(">H", 0) + bytes([OBJECT_END])
        return bytes(out)
    if isinstance(value, (list, tuple)):
        out = bytearray([STRICT_ARRAY]) + struct.pack(">I", len(value))
        for v in value:
            out += encode(v)
        return bytes(out)
    raise Amf0Error(f"cannot encode {type(value)!r}")


def encode_all(*values: Any) -> bytes:
    return b"".join(encode(v) for v in values)


def _decode_one(data: bytes, pos: int) -> Tuple[Any, int]:
    marker = data[pos]
    pos += 1
    if marker == NUMBER:
        (v,) = struct.unpack_from(">d", data, pos)
        return v, pos + 8
    if marker == BOOLEAN:
        return bool(data[pos]), pos + 1
    if marker == STRING:
        (n,) = struct.unpack_from(">H", data, pos)
        pos += 2
        return data[pos : pos + n].decode("utf-8"), pos + n
    if marker == LONG_STRING:
        (n,) = struct.unpack_from(">I", data, pos)
        pos += 4
        return data[pos : pos + n].decode("utf-8"), pos + n
    if marker in (NULL, UNDEFINED):
        return None, pos
    if marker in (OBJECT, ECMA_ARRAY):
        if marker == ECMA_ARRAY:
            pos += 4  # approximate count, ignore
        obj = {}
        while True:
            (n,) = struct.unpack_from(">H", data, pos)
            pos += 2
            if n == 0 and data[pos] == OBJECT_END:
                return obj, pos + 1
            key = data[pos : pos + n].decode("utf-8")
            pos += n
            val, pos = _decode_one(data, pos)
            obj[key] = val
    if marker == STRICT_ARRAY:
        (n,) = struct.unpack_from(">I", data, pos)
        pos += 4
        arr = []
        for _ in range(n):
            v, pos = _decode_one(data, pos)
            arr.append(v)
        return arr, pos
    raise Amf0Error(f"unknown AMF0 marker 0x{marker:02x} at {pos - 1}")


def decode_all(data: bytes) -> List[Any]:
    values = []
    pos = 0
    while pos < len(data):
        v, pos = _decode_one(data, pos)
        values.append(v)
    return values
