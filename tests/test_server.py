"""Server stack tests: listen disambiguation, HTTP, WebSocket session,
monitor socket, upload — all over real localhost sockets."""

import asyncio
import json
import os
import struct

import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.project import open_or_create
from mixlab_tpu.io_host import listen
from mixlab_tpu.protocol import wire
from mixlab_tpu.server import ws as ws_mod
from mixlab_tpu.server.app import Server, run_server
from tests.loophelp import drain_and_close

CFG = EngineConfig(sample_rate=44_100)


# --- test websocket client helpers -----------------------------------------


def mask_frame(opcode: int, payload: bytes) -> bytes:
    mask = os.urandom(4)
    head = bytearray([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head.append(0x80 | n)
    elif n < 0x10000:
        head.append(0x80 | 126)
        head += struct.pack(">H", n)
    else:
        head.append(0x80 | 127)
        head += struct.pack(">Q", n)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return bytes(head) + mask + masked


async def ws_connect(host, port, path):
    reader, writer = await asyncio.open_connection(host, port)
    writer.write(
        f"GET {path} HTTP/1.1\r\nHost: {host}\r\nUpgrade: websocket\r\n"
        f"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
        f"Sec-WebSocket-Version: 13\r\n\r\n".encode()
    )
    await writer.drain()
    head = await reader.readuntil(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n")[0]
    return reader, writer


async def ws_recv(reader):
    head = await reader.readexactly(2)
    opcode = head[0] & 0x0F
    n = head[1] & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", await reader.readexactly(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", await reader.readexactly(8))
    payload = await reader.readexactly(n)
    return opcode, payload


@pytest.fixture()
def server_port(tmp_path):
    """Running server on an ephemeral port; yields (port, project)."""
    result = {}

    async def setup():
        project = open_or_create(tmp_path / "srv.mixlab", CFG)
        tcp, server = await run_server(project, "127.0.0.1", 0)
        port = tcp.sockets[0].getsockname()[1]
        return project, tcp, server, port

    loop = asyncio.new_event_loop()
    project, tcp, server, port = loop.run_until_complete(setup())
    result["loop"] = loop
    yield loop, port, project
    project.engine.stop()
    tcp.close()
    drain_and_close(loop)
    project.close()


def test_http_index_and_404(server_port):
    loop, port, _ = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        data = await reader.read(-1)
        assert b"200 OK" in data and b"mixlab" in data
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET /nope HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        data = await reader.read(-1)
        assert b"404" in data

    loop.run_until_complete(go())


def test_session_ws_state_update_sync(server_port):
    loop, port, project = server_port

    async def go():
        reader, writer = await ws_connect("127.0.0.1", port, "/session")
        # first message: WorkspaceState
        op, payload = await ws_recv(reader)
        kind, state = wire.parse_envelope(payload)
        assert kind == "WorkspaceState"
        # second: MediaLibrary
        op, payload = await ws_recv(reader)
        kind, _ = wire.parse_envelope(payload)
        assert kind == "MediaLibrary"

        # send CreateModule op
        msg = p.WorkspaceMessage(
            1,
            p.CreateModule(
                p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
                p.WindowGeometry(),
            ),
        )
        env = json.dumps({"v": 1, "kind": "Workspace", "m": wire.encode(msg)})
        writer.write(mask_frame(ws_mod.OP_TEXT, env.encode()))
        await writer.drain()

        # expect Update (CreateModule) and Sync(1)
        got = {}
        for _ in range(4):
            op, payload = await asyncio.wait_for(ws_recv(reader), 5.0)
            kind, body = wire.parse_envelope(payload)
            got[kind] = body
            if "Update" in got and "Sync" in got:
                break
        assert got["Sync"] == 1
        assert got["Update"]["t"] == "SUCreateModule"
        writer.close()

    loop.run_until_complete(go())


def test_monitor_ws_streams_audio(server_port):
    loop, port, project = server_port
    eng = project.engine

    async def go():
        # create osc -> monitor via engine directly
        sid, _, _ = await asyncio.get_running_loop().run_in_executor(
            None, eng.connect_session
        )
        eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        eng.update(sid, p.WorkspaceMessage(2, p.CreateModule(
            p.ModuleParams("Monitor", None), p.WindowGeometry())))
        eng.update(sid, p.WorkspaceMessage(3, p.CreateConnection(
            p.InputId(p.ModuleId(2), 1), p.OutputId(p.ModuleId(1), 1))))
        # poll: the indication appears once the engine thread has ticked and
        # the monitor pipeline (codec init) is up — fixed sleeps are flaky
        deadline0 = asyncio.get_event_loop().time() + 15.0
        while asyncio.get_event_loop().time() < deadline0:
            ind = eng.ws.indications.get(p.ModuleId(2))
            if ind is not None and ind.value is not None:
                break
            await asyncio.sleep(0.05)
        socket_id = ind.value.socket_id

        reader, writer = await ws_connect("127.0.0.1", port, f"/_monitor/{socket_id}")
        op, payload = await asyncio.wait_for(ws_recv(reader), 5.0)
        header, _, _ = payload.partition(b"\n")
        init = json.loads(header)
        assert init["t"] == "init"
        fmp4 = init["mode"] == "fmp4"
        if fmp4:
            # audio codec depends on the backend tier: AAC (shim/ffmpeg)
            # or FLAC (pure zero-dep tier)
            assert "avc1." in init["mime"]
            assert "mp4a.40.2" in init["mime"] or "flac" in init["mime"]
        else:
            assert init["sample_rate"] == 44_100

        # packets follow; the first few may be the pre-edit program's
        # silence while the async compile-and-swap warms the new program
        deadline = asyncio.get_event_loop().time() + 20.0
        loud = False
        segments = 0
        while asyncio.get_event_loop().time() < deadline:
            op, payload = await asyncio.wait_for(ws_recv(reader), 5.0)
            header, _, pcm = payload.partition(b"\n")
            pkt = json.loads(header)
            if fmp4:
                if pkt["t"] != "segment":
                    continue
                assert pcm[4:8] == b"moof"
                segments += 1
                if segments >= 10:
                    loud = True  # real AAC+AVC fMP4 flowing over the WS
                    break
                continue
            if pkt["t"] != "audio":
                continue
            samples = np.frombuffer(pcm, dtype="<i2")
            assert len(samples) == CFG.samples_per_tick * 2
            if np.abs(samples).max() > 10000:  # sine at full scale
                loud = True
                break
        assert loud, "monitor stream never became live"
        writer.close()

    loop.run_until_complete(go())


def test_upload_media(server_port):
    loop, port, project = server_port

    async def go():
        body = b"RIFFxxxxWAVE-not-really"
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            f"POST /_upload/test.wav HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: audio/wav\r\nContent-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        await writer.drain()
        data = await reader.read(-1)
        assert b"200 OK" in data

    loop.run_until_complete(go())
    lib = project.base.media_library()
    assert lib.items[0].name == "test.wav"
    assert lib.items[0].size == 23


def test_disambiguation_classify():
    assert listen.classify(b"SOURCE ") == listen.Protocol.ICECAST
    assert listen.classify(b"\x03abcdef") == listen.Protocol.RTMP
    assert listen.classify(b"GET / H") == listen.Protocol.HTTP


def test_static_frontend_assets_served(server_port):
    """index.html loads session_core.js before app.js; both assets serve."""
    loop, port, _ = server_port

    async def fetch(path):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n".encode())
        await writer.drain()
        data = await reader.read(-1)
        writer.close()
        return data

    async def go():
        index = await fetch("/")
        assert b"200 OK" in index
        body = index.decode(errors="replace")
        assert "session_core.js" in body and "app.js" in body
        assert body.index("session_core.js") < body.index("app.js")
        core = await fetch("/static/session_core.js")
        assert b"makeSessionCore" in core
        app = await fetch("/static/app.js")
        assert b"session.core" in app

    loop.run_until_complete(go())


def test_http_keep_alive_serves_multiple_requests(server_port):
    loop, port, _ = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)

        async def get(path):
            writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
            await writer.drain()
            head = await reader.readuntil(b"\r\n\r\n")
            n = int([l for l in head.split(b"\r\n")
                     if l.lower().startswith(b"content-length")][0].split(b":")[1])
            body = await reader.readexactly(n)
            return head, body

        # three requests on ONE connection
        head, body = await get("/")
        assert b"200 OK" in head and b"keep-alive" in head.lower()
        head2, body2 = await get("/static/app.js")
        assert b"200 OK" in head2 and b"connectFlow" in body2
        head3, _ = await get("/nope")
        assert b"404" in head3 and b"keep-alive" in head3.lower()

        # Connection: close is honored
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        head4 = await reader.readuntil(b"\r\n\r\n")
        assert b"close" in head4.lower()
        n = int([l for l in head4.split(b"\r\n")
                 if l.lower().startswith(b"content-length")][0].split(b":")[1])
        await reader.readexactly(n)
        assert await reader.read(64) == b""  # server closed
        writer.close()

    loop.run_until_complete(go())


def test_session_ws_permessage_deflate(server_port):
    """Full compressed session: handshake negotiates RFC 7692, the server's
    WorkspaceState arrives RSV1-compressed, and a client-compressed
    CreateModule op round-trips through the engine."""
    import zlib

    loop, port, project = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            b"GET /session HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            b"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            b"Sec-WebSocket-Version: 13\r\n"
            b"Sec-WebSocket-Extensions: permessage-deflate; "
            b"client_max_window_bits\r\n\r\n")
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        assert b"101" in head.split(b"\r\n")[0]
        assert b"permessage-deflate" in head

        async def recv():
            h = await reader.readexactly(2)
            rsv1 = bool(h[0] & 0x40)
            n = h[1] & 0x7F
            if n == 126:
                (n,) = struct.unpack(">H", await reader.readexactly(2))
            elif n == 127:
                (n,) = struct.unpack(">Q", await reader.readexactly(8))
            payload = await reader.readexactly(n)
            if rsv1:
                do = zlib.decompressobj(wbits=-15)
                payload = do.decompress(payload + b"\x00\x00\xff\xff")
            return rsv1, payload

        rsv1, payload = await asyncio.wait_for(recv(), 5.0)
        kind, _ = wire.parse_envelope(payload)
        assert kind == "WorkspaceState"
        assert rsv1, "WorkspaceState should arrive compressed"

        # send a compressed client op
        msg = p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(220.0, p.Waveform.SINE)),
            p.WindowGeometry()))
        env = json.dumps({"v": 1, "kind": "Workspace", "m": wire.encode(msg)}).encode()
        co = zlib.compressobj(wbits=-15)
        data = co.compress(env) + co.flush(zlib.Z_SYNC_FLUSH)
        assert data.endswith(b"\x00\x00\xff\xff")
        frame = bytearray(mask_frame(ws_mod.OP_TEXT, data[:-4]))
        frame[0] |= 0x40  # RSV1
        writer.write(bytes(frame))
        await writer.drain()

        got = {}
        for _ in range(6):
            _, payload = await asyncio.wait_for(recv(), 5.0)
            kind, body = wire.parse_envelope(payload)
            got[kind] = body
            if "Update" in got and "Sync" in got:
                break
        assert got["Sync"] == 1
        assert got["Update"]["t"] == "SUCreateModule"
        writer.close()

    loop.run_until_complete(go())


def test_keep_alive_drains_unread_post_body(server_port):
    """A kept-alive POST to a route that ignores bodies must not
    desynchronize the connection (the body is drained server-side)."""
    loop, port, _ = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = b"x" * 64
        writer.write(
            (f"POST /nope HTTP/1.1\r\nHost: x\r\n"
             f"Content-Length: {len(body)}\r\n\r\n").encode() + body)
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        assert b"404" in head
        n = int([l for l in head.split(b"\r\n")
                 if l.lower().startswith(b"content-length")][0].split(b":")[1])
        await reader.readexactly(n)
        # the SAME connection serves a clean second request
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        head2 = await reader.readuntil(b"\r\n\r\n")
        assert b"200 OK" in head2
        writer.close()

    loop.run_until_complete(go())


def test_sigterm_graceful_shutdown_flushes_persistence(tmp_path):
    """Fleet agents stop workers with SIGTERM (server/fleet.py); the worker
    must flush its coalescing persist writer and exit cleanly so the
    project file carries every acknowledged edit."""
    import signal
    import subprocess
    import sys
    import time as time_mod

    ws_path = tmp_path / "term.mixlab"
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    proc = subprocess.Popen(
        [sys.executable, "-m", "mixlab_tpu", "--listen",
         f"127.0.0.1:{port}", str(ws_path)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time_mod.time() + 60
        while time_mod.time() < deadline:
            try:
                c = socket.create_connection(("127.0.0.1", port), 1)
                c.close()
                break
            except OSError:
                assert proc.poll() is None, "worker died on startup"
                time_mod.sleep(0.25)

        async def drive():
            reader, writer = await ws_connect("127.0.0.1", port, "/session")
            await asyncio.wait_for(ws_recv(reader), 15)  # WorkspaceState
            await asyncio.wait_for(ws_recv(reader), 15)  # MediaLibrary
            msg = p.WorkspaceMessage(1, p.CreateModule(
                p.ModuleParams("Oscillator",
                               p.OscillatorParams(440.0, p.Waveform.SINE)),
                p.WindowGeometry()))
            env = json.dumps({"v": 1, "kind": "Workspace",
                              "m": wire.encode(msg)})
            writer.write(mask_frame(ws_mod.OP_TEXT, env.encode()))
            await writer.drain()
            for _ in range(6):
                _, payload = await asyncio.wait_for(ws_recv(reader), 15)
                kind, _b = wire.parse_envelope(payload)
                if kind == "Sync":
                    break
            writer.close()

        asyncio.new_event_loop().run_until_complete(drive())
        # SIGTERM immediately after the acknowledged edit
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(30)
        assert rc == 0, f"worker exited {rc} on SIGTERM"
    finally:
        if proc.poll() is None:
            proc.kill()

    # the edit survived in the project file
    from mixlab_tpu.engine.project import ProjectBase

    base = ProjectBase(ws_path)
    snap = base.read_workspace()
    base.close()
    assert snap is not None
    blob = json.dumps(snap)
    assert "Oscillator" in blob


def test_metrics_endpoint(server_port):
    loop, port, project = server_port
    eng = project.engine

    async def go():
        # add a module so the workspace metrics are non-trivial
        sid, _, _ = await asyncio.get_running_loop().run_in_executor(
            None, eng.connect_session)
        eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(330.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        await asyncio.sleep(0.8)  # let the engine tick + publish perf

        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET /_metrics HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        raw = await reader.read(-1)
        head, _, body = raw.partition(b"\r\n\r\n")
        assert b"200 OK" in head
        text = body.decode()
        assert "mixlab_engine_tick " in text
        assert "mixlab_engine_modules 1" in text
        assert "mixlab_engine_realtime" in text
        assert "mixlab_engine_tick_rate 60" in text
        writer.close()

    loop.run_until_complete(go())


def test_two_concurrent_sessions_op_broadcast_and_sync_filtering(server_port):
    """Reference multi-session semantics (server.rs:259-270,
    engine.rs:269-275): an op from session A is rebroadcast to EVERY
    session as a ServerUpdate, while the Sync echo is filtered to the
    originating session only; B's later op reaches A symmetrically."""
    loop, port, project = server_port

    async def boot_session():
        reader, writer = await ws_connect("127.0.0.1", port, "/session")
        for expected in ("WorkspaceState", "MediaLibrary"):
            _, payload = await ws_recv(reader)
            kind, _ = wire.parse_envelope(payload)
            assert kind == expected
        return reader, writer

    def create_op(seq, freq):
        msg = p.WorkspaceMessage(
            seq,
            p.CreateModule(
                p.ModuleParams("Oscillator",
                               p.OscillatorParams(freq, p.Waveform.SINE)),
                p.WindowGeometry(),
            ),
        )
        env = json.dumps({"v": 1, "kind": "Workspace", "m": wire.encode(msg)})
        return mask_frame(ws_mod.OP_TEXT, env.encode())

    async def collect(reader, want_update, want_sync, budget=8):
        got = {"Update": [], "Sync": []}
        for _ in range(budget):
            op, payload = await asyncio.wait_for(ws_recv(reader), 5.0)
            kind, body = wire.parse_envelope(payload)
            if kind in got:
                got[kind].append(body)
            if len(got["Update"]) >= want_update and len(got["Sync"]) >= want_sync:
                break
        return got

    async def go():
        ra, wa = await boot_session()
        rb, wb = await boot_session()

        wa.write(create_op(1, 440.0))
        await wa.drain()
        a_got = await collect(ra, want_update=1, want_sync=1)
        b_got = await collect(rb, want_update=1, want_sync=0, budget=3)
        # both sessions observe A's op...
        assert a_got["Update"][0]["t"] == "SUCreateModule"
        assert b_got["Update"][0]["t"] == "SUCreateModule"
        assert b_got["Update"][0] == a_got["Update"][0]
        # ...but only A gets the Sync echo for A's sequence
        assert a_got["Sync"] == [1]
        assert b_got["Sync"] == []

        # symmetric: B's op reaches A; B gets its own Sync
        wb.write(create_op(1, 220.0))
        await wb.drain()
        b2 = await collect(rb, want_update=1, want_sync=1)
        a2 = await collect(ra, want_update=1, want_sync=0, budget=3)
        assert b2["Sync"] == [1]
        assert a2["Sync"] == []
        assert a2["Update"][0] == b2["Update"][0]
        assert a2["Update"][0]["t"] == "SUCreateModule"
        # the two creates got distinct module ids on the shared workspace
        ids = {a_got["Update"][0]["id"], a2["Update"][0]["id"]}
        assert len(ids) == 2
        wa.close()
        wb.close()

    loop.run_until_complete(go())


def test_monitor_ws_pure_tier_full_server(tmp_path, monkeypatch):
    """The whole server on the zero-dependency codec tier
    (MIXLAB_CODEC_TIER=pure): monitor fMP4 over the live WS advertises
    CAVLC H.264 + FLAC and ships real moof segments — the codec-less-image
    deployment story end to end, not just the pipeline unit."""
    monkeypatch.setenv("MIXLAB_CODEC_TIER", "pure")

    async def setup():
        project = open_or_create(tmp_path / "pure.mixlab", CFG)
        tcp, server = await run_server(project, "127.0.0.1", 0)
        return project, tcp, server, tcp.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    project, tcp, server, port = loop.run_until_complete(setup())
    try:
        eng = project.engine

        async def go():
            sid, _, _ = await asyncio.get_running_loop().run_in_executor(
                None, eng.connect_session)
            eng.update(sid, p.WorkspaceMessage(1, p.CreateModule(
                p.ModuleParams("Oscillator",
                               p.OscillatorParams(440.0, p.Waveform.SINE)),
                p.WindowGeometry())))
            eng.update(sid, p.WorkspaceMessage(2, p.CreateModule(
                p.ModuleParams("Monitor", None), p.WindowGeometry())))
            eng.update(sid, p.WorkspaceMessage(3, p.CreateConnection(
                p.InputId(p.ModuleId(2), 1), p.OutputId(p.ModuleId(1), 1))))
            deadline0 = asyncio.get_event_loop().time() + 20.0
            ind = None
            while asyncio.get_event_loop().time() < deadline0:
                ind = eng.ws.indications.get(p.ModuleId(2))
                if ind is not None and ind.value is not None:
                    break
                await asyncio.sleep(0.05)
            assert ind is not None and ind.value is not None
            reader, writer = await ws_connect(
                "127.0.0.1", port, f"/_monitor/{ind.value.socket_id}")
            op, payload = await asyncio.wait_for(ws_recv(reader), 10.0)
            init = json.loads(payload.partition(b"\n")[0])
            assert init["t"] == "init" and init["mode"] == "fmp4"
            assert "avc1." in init["mime"] and "mp4a.40.2" in init["mime"]
            segments = 0
            deadline = asyncio.get_event_loop().time() + 20.0
            while (segments < 6
                   and asyncio.get_event_loop().time() < deadline):
                op, payload = await asyncio.wait_for(ws_recv(reader), 10.0)
                header, _, body = payload.partition(b"\n")
                if json.loads(header)["t"] == "segment":
                    assert body[4:8] == b"moof"
                    segments += 1
            assert segments >= 6, "pure-tier segments never flowed"
            writer.close()

        loop.run_until_complete(go())
    finally:
        project.engine.stop()
        tcp.close()
        drain_and_close(loop)
        project.close()
