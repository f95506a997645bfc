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


# ---------------------------------------------------------------------------
# permessage-deflate (RFC 7692)
# ---------------------------------------------------------------------------


def client_deflate(payload: bytes, wbits=15) -> bytes:
    import zlib

    co = zlib.compressobj(wbits=-wbits)
    data = co.compress(payload) + co.flush(zlib.Z_SYNC_FLUSH)
    assert data.endswith(b"\x00\x00\xff\xff")
    return data[:-4]


def client_frame_rsv1(opcode, payload, key=b"\x01\x02\x03\x04"):
    frame = bytearray(client_frame(opcode, payload, key=key))
    frame[0] |= 0x40
    return bytes(frame)


def test_negotiate_deflate_offers():
    nd = ws_mod.negotiate_deflate
    assert nd(None) is None
    assert nd("x-webkit-deflate-frame") is None
    hdr, bits = nd("permessage-deflate")
    assert "permessage-deflate" in hdr
    assert "server_no_context_takeover" in hdr
    assert "client_no_context_takeover" in hdr
    assert bits == 15
    # browser-style offer
    hdr, bits = nd("permessage-deflate; client_max_window_bits")
    assert bits == 15
    # an explicit server window cap is honored and echoed
    hdr, bits = nd("permessage-deflate; server_max_window_bits=10")
    assert bits == 10 and "server_max_window_bits=10" in hdr
    # unknown parameter declines that offer; later offer still accepted
    assert nd("permessage-deflate; foo=bar") is None
    hdr, bits = nd("permessage-deflate; foo=bar, permessage-deflate")
    assert bits == 15
    # out-of-range window bits decline
    assert nd("permessage-deflate; server_max_window_bits=4") is None
    # zlib cannot produce a raw stream with 8 window bits: decline too
    assert nd("permessage-deflate; server_max_window_bits=8") is None


def test_deflate_recv_roundtrip():
    body = b'{"kind":"Workspace","m":{}}' * 20
    data = client_frame_rsv1(ws_mod.OP_TEXT, client_deflate(body))
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter(), deflate=True)
    op, payload = asyncio.run(sock.recv())
    assert (op, payload) == (ws_mod.OP_TEXT, body)


def test_deflate_recv_small_window_client():
    body = bytes(range(256)) * 64
    data = client_frame_rsv1(ws_mod.OP_TEXT, client_deflate(body, wbits=9))
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter(), deflate=True)
    op, payload = asyncio.run(sock.recv())
    assert payload == body


def test_deflate_send_sets_rsv1_and_roundtrips():
    import zlib

    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(), w, deflate=True)
    body = b"A" * 500  # compressible, above DEFLATE_MIN_SIZE
    asyncio.run(sock.send_text(body.decode()))
    frame = bytes(w.sent)
    assert frame[0] & 0x40, "RSV1 not set on compressed frame"
    n = frame[1] & 0x7F
    payload = frame[2:]
    if n == 126:
        payload = frame[4:]
    assert len(payload) < len(body)  # actually compressed
    do = zlib.decompressobj(wbits=-15)
    assert do.decompress(payload + b"\x00\x00\xff\xff") == body


def test_deflate_send_skips_tiny_frames():
    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(), w, deflate=True)
    asyncio.run(sock.send_text("hi"))
    assert not (w.sent[0] & 0x40)
    assert bytes(w.sent[2:4]) == b"hi"


def test_deflate_uncompressed_frames_still_pass():
    data = client_frame(ws_mod.OP_TEXT, b"plain")
    sock = ws_mod.WebSocket(PipeReader(data), PipeWriter(), deflate=True)
    op, payload = asyncio.run(sock.recv())
    assert payload == b"plain"


def test_deflate_corrupt_stream_closes_1002():
    data = client_frame_rsv1(ws_mod.OP_TEXT, b"\xff\xff\xff\xff\xff")
    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(data), w, deflate=True)
    assert asyncio.run(sock.recv()) is None
    assert sock.closed
    assert struct.unpack(">H", bytes(w.sent[2:4]))[0] == 1002


def test_handshake_response_includes_extensions():
    resp = ws_mod.handshake_response("dGhlIHNhbXBsZSBub25jZQ==",
                                     "permessage-deflate")
    assert b"Sec-WebSocket-Extensions: permessage-deflate\r\n" in resp
    resp = ws_mod.handshake_response("dGhlIHNhbXBsZSBub25jZQ==")
    assert b"Extensions" not in resp


def test_rsv1_without_negotiated_deflate_fails_connection():
    # RFC 6455 5.2: RSV bits MUST be 0 unless an extension negotiated them.
    # Without permessage-deflate, an RSV1 frame must fail the connection
    # (close 1002), not deliver raw deflate bytes as payload.
    data = client_frame_rsv1(ws_mod.OP_TEXT, client_deflate(b"sneaky"))
    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(data), w)
    assert sock.deflate is None or sock.deflate is False or not sock.deflate
    assert asyncio.run(sock.recv()) is None
    assert sock.closed
    # close frame carries status 1002 (protocol error)
    assert bytes(w.sent[:2]) == bytes([0x80 | ws_mod.OP_CLOSE, 2])
    assert w.sent[2:4] == struct.pack(">H", 1002)


def test_oversize_frame_claim_closes_1009():
    """A frame header claiming 2^40 bytes must close the connection
    (1009 Message Too Big) without ever trying to buffer the payload —
    uncompressed frames had no size cap before round 4 (the zip-bomb
    guard only covered the deflate path)."""
    head = bytearray([0x80 | ws_mod.OP_BINARY, 0x80 | 127])
    head += struct.pack(">Q", 1 << 40)
    head += b"\x01\x02\x03\x04"  # mask key; no payload follows
    w = PipeWriter()
    sock = ws_mod.WebSocket(PipeReader(bytes(head)), w)
    assert asyncio.run(sock.recv()) is None
    assert sock.closed
    assert struct.unpack(">H", bytes(w.sent)[-2:])[0] == 1009


def test_fragment_flood_closes_1009():
    """Unbounded OP_CONT accumulation must stop at MAX_MESSAGE_SIZE."""
    old = ws_mod.MAX_MESSAGE_SIZE
    ws_mod.MAX_MESSAGE_SIZE = 4096
    try:
        chunk = bytes(1024)
        data = client_frame(ws_mod.OP_BINARY, chunk, fin=False)
        for _ in range(8):
            data += client_frame(ws_mod.OP_CONT, chunk, fin=False)
        w = PipeWriter()
        sock = ws_mod.WebSocket(PipeReader(data), w)
        assert asyncio.run(sock.recv()) is None
        assert sock.closed
        assert struct.unpack(">H", bytes(w.sent)[-2:])[0] == 1009
    finally:
        ws_mod.MAX_MESSAGE_SIZE = old
