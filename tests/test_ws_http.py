"""WebSocket framing + HTTP parser edge cases."""

import asyncio
import struct

import pytest

from mixlab_tpu.server import ws as ws_mod
from mixlab_tpu.server.http import HttpError, read_request


class PipeReader:
    def __init__(self, data=b""):
        self.buf = bytearray(data)

    async def readexactly(self, n):
        if len(self.buf) < n:
            raise asyncio.IncompleteReadError(bytes(self.buf), n)
        out = bytes(self.buf[:n])
        del self.buf[:n]
        return out

    async def readuntil(self, sep):
        idx = bytes(self.buf).find(sep)
        if idx < 0:
            raise asyncio.IncompleteReadError(bytes(self.buf), None)
        out = bytes(self.buf[: idx + len(sep)])
        del self.buf[: idx + len(sep)]
        return out


class PipeWriter:
    def __init__(self):
        self.sent = bytearray()
        self.closed = False

    def write(self, data):
        self.sent += data

    async def drain(self):
        pass

    def close(self):
        self.closed = True


def mask(payload: bytes, key=b"\x01\x02\x03\x04") -> bytes:
    return bytes(b ^ key[i % 4] for i, b in enumerate(payload))


def client_frame(opcode, payload, fin=True, key=b"\x01\x02\x03\x04"):
    head = bytearray([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head.append(0x80 | n)
    elif n < 65536:
        head.append(0x80 | 126)
        head += struct.pack(">H", n)
    else:
        head.append(0x80 | 127)
        head += struct.pack(">Q", n)
    return bytes(head) + key + mask(payload, key)


def test_accept_key_rfc_vector():
    # RFC 6455 §1.3 example
    assert ws_mod.accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_fragmented_message_reassembly():
    data = client_frame(ws_mod.OP_TEXT, b"hello ", fin=False) + client_frame(
        ws_mod.OP_CONT, b"world"
    )
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter())
    op, payload = asyncio.run(sock.recv())
    assert (op, payload) == (ws_mod.OP_TEXT, b"hello world")


def test_ping_gets_ponged_and_skipped():
    data = client_frame(ws_mod.OP_PING, b"?") + client_frame(ws_mod.OP_TEXT, b"msg")
    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(data), w)
    op, payload = asyncio.run(sock.recv())
    assert payload == b"msg"
    # pong frame written: opcode 0xA, unmasked, payload b"?"
    assert bytes(w.sent[:2]) == bytes([0x80 | ws_mod.OP_PONG, 1])
    assert bytes(w.sent[2:3]) == b"?"


def test_close_frame_returns_none():
    data = client_frame(ws_mod.OP_CLOSE, struct.pack(">H", 1000))
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter())
    assert asyncio.run(sock.recv()) is None
    assert sock.closed


def test_large_frame_lengths():
    payload = bytes(range(256)) * 300  # 76800 bytes -> 64-bit... no, 16-bit ext
    data = client_frame(ws_mod.OP_BINARY, payload)
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter())
    op, got = asyncio.run(sock.recv())
    assert got == payload


def test_http_parse_ok_and_errors():
    req = asyncio.run(read_request(PipeReader(
        b"GET /x?y=1 HTTP/1.1\r\nHost: h\r\nX-Thing: v\r\n\r\n")))
    assert req.method == "GET" and req.path == "/x?y=1"
    assert req.header("x-thing") == "v"

    with pytest.raises(HttpError):
        asyncio.run(read_request(PipeReader(b"GARBAGE\r\n\r\n")))
    with pytest.raises(HttpError):
        asyncio.run(read_request(PipeReader(b"GET / HTTP/1.1\r\nbadheader\r\n\r\n")))
