"""Fleet controller (server/fleet.py): spawn / route / migrate / recover
with REAL worker processes over real sockets.

Covers the scale-out story end to end: two host agents register with a
controller; workspaces are placed least-loaded; a live workspace (with an
edit and runtime DSP state) migrates between hosts carrying both the
project file and the engine checkpoint; a crashed worker is respawned on
route resolution."""

import asyncio
import json

import numpy as np
import pytest

from mixlab_tpu.server.fleet import (
    FleetController,
    HostAgent,
    decode_checkpoint,
    encode_checkpoint,
    http_call,
)


def test_checkpoint_blob_roundtrip():
    ckpt = {
        "tick": 1234,
        "dsp_state": [np.arange(8, dtype=np.float32),
                      np.ones((2, 3), dtype=np.int32)],
    }
    blob = encode_checkpoint(ckpt)
    back = decode_checkpoint(blob)
    assert back["tick"] == 1234
    assert len(back["dsp_state"]) == 2
    assert np.array_equal(back["dsp_state"][0], ckpt["dsp_state"][0])
    assert np.array_equal(back["dsp_state"][1], ckpt["dsp_state"][1])


def test_fleet_spawn_route_migrate_recover(tmp_path):
    from mixlab_tpu import protocol as p
    from mixlab_tpu.protocol import wire
    from test_server import mask_frame, ws_connect, ws_recv

    async def go():
        ctl = FleetController()
        ctl_server = await ctl.serve()
        agents = []
        servers = [ctl_server]
        for host_id in ("host-a", "host-b"):
            agent = HostAgent(host_id, tmp_path / host_id)
            servers.append(await agent.serve())
            agents.append(agent)
            await http_call(ctl.url + "/register", "POST", json.dumps(
                {"host_id": host_id, "url": agent.url}).encode())

        # ---- placement balances load across live agents ----
        status, body = await http_call(ctl.url + "/workspaces/alpha", "POST",
                                       timeout=90.0)
        assert status == 200, body
        alpha = json.loads(body)
        status, body = await http_call(ctl.url + "/workspaces/beta", "POST",
                                       timeout=90.0)
        assert status == 200, body
        beta = json.loads(body)
        assert {alpha["host"], beta["host"]} == {"host-a", "host-b"}

        status, body = await http_call(ctl.url + "/fleet")
        fleet = json.loads(body)
        assert fleet["assignments"] == {"alpha": alpha["host"],
                                        "beta": beta["host"]}
        assert all(a["live"] for a in fleet["agents"].values())

        # ---- routing resolves to a serving worker ----
        status, body = await http_call(ctl.url + "/route/alpha")
        assert status == 200
        route = json.loads(body)
        status, page = await http_call(route["url"] + "/")
        assert status == 200 and b"mixlab" in page
        status, _ = await http_call(ctl.url + "/route/nope")
        assert status == 404

        # ---- drive a session on alpha: create an oscillator ----
        port = int(route["url"].rsplit(":", 1)[1])
        reader, writer = await ws_connect("127.0.0.1", port, "/session")
        await asyncio.wait_for(ws_recv(reader), 15)  # WorkspaceState
        await asyncio.wait_for(ws_recv(reader), 15)  # MediaLibrary
        msg = p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator",
                           p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry()))
        env = json.dumps({"v": 1, "kind": "Workspace", "m": wire.encode(msg)})
        writer.write(mask_frame(1, env.encode()))
        await writer.drain()
        # wait for the Sync echo so the edit is persisted
        for _ in range(6):
            _, payload = await asyncio.wait_for(ws_recv(reader), 15)
            kind, body_ = wire.parse_envelope(payload)
            if kind == "Sync":
                break
        writer.close()
        # let the engine tick so the checkpoint has a non-zero tick and
        # the async compile adopts the oscillator patch
        await asyncio.sleep(2.0)

        # the worker exposes a live checkpoint
        status, ckpt_blob = await http_call(route["url"] + "/_checkpoint")
        assert status == 200
        ckpt = decode_checkpoint(ckpt_blob)
        assert ckpt["tick"] > 0

        # ---- live migration to the other host ----
        other = "host-b" if alpha["host"] == "host-a" else "host-a"
        status, body = await http_call(
            ctl.url + "/migrate/alpha", "POST",
            json.dumps({"to": other}).encode(), timeout=90.0)
        assert status == 200, body
        moved = json.loads(body)
        assert moved["host"] == other
        # the runtime DSP state traveled too: the target engine adopted the
        # checkpoint (resumes from the same tick, not from zero)
        assert moved.get("restored") is True
        status, ck2 = await http_call(moved["url"] + "/_checkpoint")
        assert status == 200
        assert decode_checkpoint(ck2)["tick"] >= ckpt["tick"]

        status, body = await http_call(ctl.url + "/route/alpha")
        route2 = json.loads(body)
        assert route2["host"] == other and route2["url"] != route["url"]

        # the migrated worker carries the workspace: oscillator is there
        port2 = int(route2["url"].rsplit(":", 1)[1])
        reader, writer = await ws_connect("127.0.0.1", port2, "/session")
        _, payload = await asyncio.wait_for(ws_recv(reader), 15)
        kind, state = wire.parse_envelope(payload)
        assert kind == "WorkspaceState"
        kinds = [params["kind"] for _, params in state["modules"]]
        assert "Oscillator" in kinds
        writer.close()

        # ---- failure recovery: kill beta's worker, route respawns it ----
        beta_agent = next(a for a in agents if a.host_id == beta["host"])
        beta_proc = beta_agent.procs["beta"]["proc"]
        beta_proc.kill()
        beta_proc.wait(10)
        status, body = await http_call(ctl.url + "/route/beta", timeout=90.0)
        assert status == 200
        recovered = json.loads(body)
        assert recovered.get("respawned")
        status, page = await http_call(recovered["url"] + "/")
        assert status == 200

        # ---- teardown ----
        for agent in agents:
            await agent.shutdown()
        for server in servers:
            server.close()

    asyncio.run(asyncio.wait_for(go(), 420))
