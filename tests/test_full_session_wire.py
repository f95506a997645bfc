"""Full-session integration: every module kind created, patched, edited and
deleted over the live WebSocket wire protocol."""

import asyncio
import json
import os
import struct

import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.project import open_or_create
from mixlab_tpu.server.app import run_server
from test_server import mask_frame, ws_connect, ws_recv

CFG = EngineConfig(sample_rate=44_100)


def test_every_module_kind_over_the_wire(tmp_path):
    from mixlab_tpu.protocol import wire

    async def go():
        project = open_or_create(tmp_path / "full.mixlab", CFG)
        tcp, server = await run_server(project, "127.0.0.1", 0)
        port = tcp.sockets[0].getsockname()[1]
        try:
            reader, writer = await ws_connect("127.0.0.1", port, "/session")
            await ws_recv(reader)  # state
            await ws_recv(reader)  # library

            defaults = {
                "Amplifier": p.AmplifierParams(),
                "Envelope": p.EnvelopeParams(),
                "EqThree": p.EqThreeParams(),
                "FmSine": p.FmSineParams(),
                "MediaSource": p.MediaSourceParams(),
                "Mixer": p.MixerParams.with_channels(4),
                "Monitor": None,
                "Oscillator": p.OscillatorParams(),
                "OutputDevice": p.OutputDeviceParams(),
                "Plotter": None,
                "StereoPanner": None,
                "StereoSplitter": None,
                "StreamInput": p.StreamInputParams(),
                "StreamOutput": p.StreamOutputParams(),
                "Trigger": p.GateState.OPEN,
                "VideoMixer": p.VideoMixerParams(),
            }
            seq = 0
            for kind, params in defaults.items():
                seq += 1
                msg = p.WorkspaceMessage(seq, p.CreateModule(
                    p.ModuleParams(kind, params), p.WindowGeometry()))
                writer.write(mask_frame(1, wire.dumps(msg).replace(
                    '{"v":1', '{"v":1,"kind":"Workspace"', 1).encode()))
            await writer.drain()

            # collect until all Syncs observed
            created = {}
            synced = 0
            for _ in range(200):
                opcode, payload = await asyncio.wait_for(ws_recv(reader), 10)
                kind, body = wire.parse_envelope(payload)
                if kind == "Sync":
                    synced = max(synced, body)
                elif kind == "Update" and body.get("t") == "SUCreateModule":
                    created[body["id"]] = body["params"]["kind"]
                if synced >= seq and len(created) == len(defaults):
                    break
            assert len(created) == 16, created
            assert set(created.values()) == set(defaults)

            # OutputDevice indication advertises the file audio backend
            _, state_dump, _ = await asyncio.get_running_loop().run_in_executor(
                None, project.engine.connect_session
            )
            od = [i for m, i in state_dump.indications if i.kind == "OutputDevice"]
            assert od and od[0].value.devices == (("wav-file", 2),)

            # edit + delete one module over the wire
            osc_id = [mid for mid, k in created.items() if k == "Oscillator"][0]
            seq += 1
            msg = p.WorkspaceMessage(seq, p.UpdateModuleParams(
                p.ModuleId(osc_id),
                p.ModuleParams("Oscillator", p.OscillatorParams(999.0, p.Waveform.SAW))))
            writer.write(mask_frame(1, wire.dumps(msg).replace(
                '{"v":1', '{"v":1,"kind":"Workspace"', 1).encode()))
            seq += 1
            msg = p.WorkspaceMessage(seq, p.DeleteModule(p.ModuleId(osc_id)))
            writer.write(mask_frame(1, wire.dumps(msg).replace(
                '{"v":1', '{"v":1,"kind":"Workspace"', 1).encode()))
            await writer.drain()
            saw_update = saw_delete = False
            for _ in range(100):
                opcode, payload = await asyncio.wait_for(ws_recv(reader), 10)
                kind, body = wire.parse_envelope(payload)
                if kind == "Update" and body.get("t") == "SUUpdateModuleParams":
                    assert body["params"]["params"]["freq"] == 999.0
                    saw_update = True
                if kind == "Update" and body.get("t") == "SUDeleteModule":
                    saw_delete = True
                    break
            assert saw_update and saw_delete
            writer.close()
        finally:
            project.engine.stop()
            tcp.close()
            project.close()

    asyncio.run(go())
