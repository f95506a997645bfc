"""Minimal RFC 6455 WebSocket server implementation (asyncio, stdlib-only).

The reference gets WebSockets from warp (``src/server.rs:96-116``); this
environment has no websocket package, so the protocol is implemented
directly: handshake (Sec-WebSocket-Accept = b64(sha1(key + GUID))), frame
parsing with client masking, text/binary/ping/pong/close opcodes, and
fragmented-message reassembly.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import struct
from typing import Optional, Tuple

GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def handshake_response(client_key: str) -> bytes:
    return (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(client_key)}\r\n"
        "\r\n"
    ).encode()


def encode_frame(opcode: int, payload: bytes, fin: bool = True) -> bytes:
    head = bytearray()
    head.append((0x80 if fin else 0) | opcode)
    n = len(payload)
    if n < 126:
        head.append(n)  # server frames are unmasked
    elif n < 0x10000:
        head.append(126)
        head += struct.pack(">H", n)
    else:
        head.append(127)
        head += struct.pack(">Q", n)
    return bytes(head) + payload


class WebSocket:
    """Server-side websocket over asyncio streams (post-handshake)."""

    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self.reader = reader
        self.writer = writer
        self.closed = False

    async def send_text(self, text: str):
        await self._send(OP_TEXT, text.encode())

    async def send_binary(self, data: bytes):
        await self._send(OP_BINARY, data)

    async def _send(self, opcode: int, payload: bytes):
        if self.closed:
            raise ConnectionError("websocket closed")
        self.writer.write(encode_frame(opcode, payload))
        await self.writer.drain()

    async def close(self, code: int = 1000):
        if not self.closed:
            self.closed = True
            try:
                self.writer.write(encode_frame(OP_CLOSE, struct.pack(">H", code)))
                await self.writer.drain()
            except Exception:
                pass
            self.writer.close()

    async def recv(self) -> Optional[Tuple[int, bytes]]:
        """Receive one message: (opcode, payload) or None on close/EOF.
        Handles fragmentation and replies to pings."""
        message_op = None
        buffer = bytearray()
        while True:
            frame = await self._read_frame()
            if frame is None:
                return None
            fin, opcode, payload = frame
            if opcode == OP_CLOSE:
                await self.close()
                return None
            if opcode == OP_PING:
                await self._send(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode in (OP_TEXT, OP_BINARY):
                message_op = opcode
                buffer = bytearray(payload)
            elif opcode == OP_CONT:
                if message_op is None:
                    return None  # protocol error
                buffer += payload
            if fin and message_op is not None:
                return message_op, bytes(buffer)

    async def _read_frame(self):
        try:
            head = await self.reader.readexactly(2)
        except (asyncio.IncompleteReadError, ConnectionError):
            return None
        fin = bool(head[0] & 0x80)
        opcode = head[0] & 0x0F
        masked = bool(head[1] & 0x80)
        n = head[1] & 0x7F
        try:
            if n == 126:
                (n,) = struct.unpack(">H", await self.reader.readexactly(2))
            elif n == 127:
                (n,) = struct.unpack(">Q", await self.reader.readexactly(8))
            mask = await self.reader.readexactly(4) if masked else None
            payload = await self.reader.readexactly(n) if n else b""
        except (asyncio.IncompleteReadError, ConnectionError):
            return None
        if mask:
            from mixlab_tpu import native

            payload = native.ws_unmask(payload, mask)
        return fin, opcode, payload
