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
    for blob in _blobs(40, 256):
        try:
            amf0.decode_all(blob)
        except (amf0.Amf0Error, ValueError, IndexError, UnicodeDecodeError):
            pass
    # round-trip sanity stays intact
    vals = ["connect", 1.0, {"app": "x", "flashVer": "y"}, None, True]
    assert amf0.decode_all(amf0.encode_all(*vals)) == vals


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
