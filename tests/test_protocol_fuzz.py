"""Network-protocol parser fuzz: AMF0, RTMP chunk stream, FLV tags, and
WebSocket frames all consume raw attacker-controlled bytes — garbage and
truncations must surface as typed errors / clean EOF, never hangs or
unexpected exception classes escaping the connection handler."""

import asyncio

import numpy as np
import pytest

from mixlab_tpu.av import flv
from mixlab_tpu.io_host.rtmp import amf0
from mixlab_tpu.io_host.rtmp.chunk import ChunkReader
from mixlab_tpu.server import ws as ws_mod

RNG = np.random.default_rng(0xBEEF)


def _blobs(n, size):
    return [RNG.integers(0, 256, size, dtype=np.uint8).tobytes()
            for _ in range(n)]


def test_amf0_garbage():
    # strictly Amf0Error — struct.error / IndexError / UnicodeDecodeError
    # leaked from the unchecked parser before round 4 (tools/deepfuzz.py)
    for blob in _blobs(40, 256):
        try:
            amf0.decode_all(blob)
        except amf0.Amf0Error:
            pass
    # round-trip sanity stays intact
    vals = ["connect", 1.0, {"app": "x", "flashVer": "y"}, None, True]
    assert amf0.decode_all(amf0.encode_all(*vals)) == vals


def test_amf0_typed_errors_pinned():
    """Each leak class deepfuzz found, pinned to Amf0Error."""
    cases = [
        b"\x00\x3f\xf0",                   # truncated NUMBER (struct.error)
        b"\x02\x00\x05ab",                 # truncated STRING body
        b"\x02\x00\x02\xe3\x28",           # invalid utf-8 (UnicodeDecodeError)
        b"\x03\x00\x01k",                  # OBJECT key then EOF (IndexError)
        b"\x0a\xff\xff\xff\xff",           # STRICT_ARRAY count 4G, no data
        b"\x01",                           # BOOLEAN with no payload byte
        b"\x03\x00\x00",                   # object end marker missing
    ]
    for blob in cases:
        with pytest.raises(amf0.Amf0Error):
            amf0.decode_all(blob)
    # deep nesting must be a typed error, not RecursionError
    deep = b"\x03\x00\x01k" * 600
    with pytest.raises(amf0.Amf0Error):
        amf0.decode_all(deep)


def test_wire_envelope_typed_errors():
    """parse_envelope raises ValueError (the server's skip class) on any
    shape violation — KeyError leaked on valid JSON missing fields."""
    from mixlab_tpu.protocol import wire

    for bad in (b"123", b"[1,2]", b'"x"',
                b'{"v":1}', b'{"v":1,"kind":"Workspace"}',
                b'{"v":1,"m":{}}', b'{"v":99,"kind":"x","m":{}}'):
        with pytest.raises(ValueError):
            wire.parse_envelope(bad)


def test_y4m_zero_denominator_rate():
    """F30:0 in the stream header divided by zero before round 4."""
    import io

    from mixlab_tpu.av.y4m import Y4mError, Y4mReader

    for hdr in (b"YUV4MPEG2 W16 H8 F30:0 C420\n",
                b"YUV4MPEG2 W16 H8 F0:1 C420\n"):
        with pytest.raises(Y4mError):
            Y4mReader(io.BytesIO(hdr + b"FRAME\n" + bytes(192)))


def test_flv_tags_garbage():
    for blob in _blobs(40, 64):
        try:
            flv.parse_audio_tag(blob)
        except (flv.FlvError, ValueError):
            pass
        try:
            flv.VideoPacket.parse(blob)
        except (flv.FlvError, ValueError):
            pass


class _FeedReader:
    """asyncio-Reader-shaped wrapper over a byte blob (EOF at the end)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    async def readexactly(self, n):
        if self.pos + n > len(self.data):
            raise asyncio.IncompleteReadError(self.data[self.pos:], n)
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    async def read(self, n):
        out = self.data[self.pos : self.pos + n]
        self.pos += len(out)
        return out


def test_rtmp_chunk_reader_garbage():
    async def drain(blob):
        cr = ChunkReader(_FeedReader(blob))
        for _ in range(64):  # bounded: garbage must not loop forever
            try:
                msg = await asyncio.wait_for(cr.read_message(), 2.0)
            except (asyncio.IncompleteReadError, ConnectionError,
                    ValueError, asyncio.TimeoutError):
                return
            if msg is None:
                return

    for blob in _blobs(30, 512):
        asyncio.run(drain(blob))


def test_websocket_garbage_frames():
    class _R(_FeedReader):
        pass

    class _W:
        def __init__(self):
            self.closed = False

        def write(self, data):
            pass

        async def drain(self):
            pass

        def close(self):
            self.closed = True

    for blob in _blobs(30, 256):
        sock = ws_mod.WebSocket(_R(blob), _W(), deflate=True)

        async def drain():
            for _ in range(32):
                try:
                    msg = await asyncio.wait_for(sock.recv(), 2.0)
                except (ConnectionError, asyncio.TimeoutError, ValueError):
                    return
                if msg is None:
                    return

        asyncio.run(drain())


def _capture_rtmp_session() -> bytes:
    """A valid client->server RTMP byte stream: handshake + connect/
    createStream/publish + AAC+H.264 tags (tools/deepfuzz.py mirror)."""
    from mixlab_tpu.io_host.rtmp.chunk import (
        MSG_AUDIO,
        MSG_COMMAND_AMF0,
        MSG_VIDEO,
        ChunkWriter,
        Message,
    )
    from mixlab_tpu.io_host.rtmp.handshake import HANDSHAKE_LEN

    buf = bytearray()

    class _W:
        def write(self, data):
            buf.extend(data)

    cw = ChunkWriter(_W())
    buf += b"\x03" + bytes(HANDSHAKE_LEN) + bytes(HANDSHAKE_LEN)  # C0+C1+C2
    cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
        "connect", 1.0, {"app": "fuzzmount", "flashVer": "x"})))
    cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
        "createStream", 2.0, None)))
    cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
        "publish", 3.0, None, "key", "live")))
    cw.write_message(Message(0, MSG_AUDIO, 1, b"\xaf\x00\x12\x10"))
    cw.write_message(Message(10, MSG_AUDIO, 1, b"\xaf\x01" + bytes(64)))
    cw.write_message(Message(0, MSG_VIDEO, 1, flv.VideoPacket(
        flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.SEQUENCE_HEADER,
        0, bytes(24)).to_bytes()))
    cw.write_message(Message(40, MSG_VIDEO, 1, flv.VideoPacket(
        flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.NALU,
        0, bytes(128)).to_bytes()))
    return bytes(buf)


def test_rtmp_accept_mutated_sessions():
    """Byte-mutated full sessions through rtmp.server.accept(): the only
    exception classes allowed out are the ones listen.py's connection
    wrapper catches (ConnectionError / IncompleteReadError) — an
    Amf0Error or AttributeError here is an unhandled-task traceback in
    production (found unguarded before round 4: non-dict connect props,
    Amf0Error from command payloads)."""
    from mixlab_tpu.io_host import source as source_mod
    from mixlab_tpu.io_host.rtmp import server as rtmp_server

    class _W:
        def write(self, data):
            pass

        async def drain(self):
            pass

    seed = _capture_rtmp_session()
    rng = np.random.default_rng(0xF00D)
    old = rtmp_server.DECODER_FACTORY
    rtmp_server.DECODER_FACTORY = rtmp_server.NullDecoder
    try:
        for i in range(60):
            buf = bytearray(seed)
            for _m in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            recv = source_mod.RTMP_MOUNTPOINTS.listen("fuzzmount")
            try:
                asyncio.run(asyncio.wait_for(
                    rtmp_server.accept(_FeedReader(bytes(buf)), _W()), 5.0))
            except (ConnectionError, asyncio.IncompleteReadError,
                    asyncio.TimeoutError):
                pass
            finally:
                recv.close()
    finally:
        rtmp_server.DECODER_FACTORY = old
