"""Frontend JavaScript: syntax-validate every shipped asset and EXECUTE the
session-mirror logic (server/static/session_core.js) under the jsmini
interpreter — render gating must match frontend/src/session.rs:83-108.

The reference frontend ran in real browsers; this image has no JS runtime,
so mixlab_tpu.utils.jsmini (pure-Python parser + interpreter) is the
execution vehicle."""

import json
import pathlib

import numpy as np
import pytest

from mixlab_tpu.utils.jsmini import (
    Interpreter,
    JSObject,
    JsSyntaxError,
    UNDEFINED,
    _from_python,
    _to_python,
    evaluate,
    lint_undeclared,
    parse,
)

STATIC = pathlib.Path(__file__).parent.parent / "mixlab_tpu" / "server" / "static"
JS_FILES = sorted(STATIC.glob("*.js"))


def test_static_assets_exist():
    names = {f.name for f in JS_FILES}
    assert "app.js" in names and "session_core.js" in names


@pytest.mark.parametrize("js", JS_FILES, ids=lambda f: f.name)
def test_js_asset_parses(js):
    parse(js.read_text())


@pytest.mark.parametrize("js", JS_FILES, ids=lambda f: f.name)
def test_js_asset_no_undeclared_identifiers(js):
    extra = ("makeSessionCore", "makeConnectFlow", "sessionKey") if js.name == "app.js" else ()
    assert lint_undeclared(js.read_text(), extra) == []


# ---------------------------------------------------------------------------
# executing session_core.js
# ---------------------------------------------------------------------------


class Hooks:
    """Python-side hook object handed into makeSessionCore."""

    def __init__(self):
        self.renders = 0
        self.indications = []
        self.perf = None
        self.media = None
        self.held = set()
        self.deleted = []

    def as_js(self):
        return JSObject({
            "render": lambda: self._render(),
            "onIndication": lambda mid, ind: self.indications.append((mid, _to_python(ind))),
            "onPerformance": lambda perf: setattr(self, "perf", _to_python(perf)),
            "onMediaLibrary": lambda items: setattr(self, "media", _to_python(items)),
            "geometryHeld": lambda mid: _to_python(mid) in self.held,
            "onDeleteModule": lambda mid: self.deleted.append(_to_python(mid)),
        })

    def _render(self):
        self.renders += 1


def make_core():
    interp = Interpreter()
    interp.globals.declare("module", JSObject({"exports": JSObject({})}))
    interp.run((STATIC / "session_core.js").read_text())
    hooks = Hooks()
    factory = interp.globals.get("makeSessionCore")
    core = interp.call_any(factory, [hooks.as_js()])
    return interp, core, hooks


def send(interp, core, msg: dict):
    on_message = interp.get_member(core, "onMessage")
    interp.call_any(on_message, [_from_python(msg)], this=core)


def mirror(interp, core):
    """Dump the JS mirror to plain Python dicts."""
    state = interp.get_member(core, "state")
    if state is UNDEFINED or state is None:
        return None
    out = {}
    for field in ("modules", "geometry", "indications", "connections",
                  "inputs", "outputs"):
        m = interp.get_member(state, field)
        out[field] = {(_to_python(k) if not isinstance(k, str) else k): _to_python(v)
                      for k, v in m.d.items()}
    return out


WS_STATE = {
    "kind": "WorkspaceState",
    "m": {
        "t": "WorkspaceState",
        "modules": [[1, {"kind": "Oscillator", "params": {"freq": 440.0}}]],
        "geometry": [[1, {"x": 10, "y": 20, "z": 1}]],
        "indications": [[1, None]],
        "connections": [[[2, 0], [1, 1]]],
        "inputs": [[1, []]],
        "outputs": [[1, [{"line_type": "mono"}, {"line_type": "stereo"}]]],
    },
}


def test_workspace_state_builds_mirror_and_renders():
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    assert hooks.renders == 1
    m = mirror(interp, core)
    assert m["modules"][1.0]["kind"] == "Oscillator"
    assert m["connections"]["2:0"] == [1, 1]


def test_update_applies_and_renders_when_caught_up():
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUCreateModule", "id": 2,
        "params": {"kind": "Monitor", "params": None},
        "geometry": {"x": 0, "y": 0, "z": 2}, "indication": None,
        "inputs": [{"line_type": "stereo"}], "outputs": [],
    }})
    assert hooks.renders == 2  # no local edits pending -> immediate render
    assert mirror(interp, core)["modules"][2.0]["kind"] == "Monitor"


def test_render_gating_matches_reference_session_rs():
    """session.rs:83-108: while a local edit is un-acked, server updates
    apply to the mirror but do NOT render; the Sync that catches us up
    fires ONE deferred render."""
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    assert hooks.renders == 1

    # client sends two ops (seq 1, 2)
    interp.set_member(core, "pendingSeq", 2.0)
    assert not interp.call_any(interp.get_member(core, "caughtUp"), [])

    # echoes of our own ops arrive before their Syncs: apply, don't render
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUUpdateModuleParams", "module_id": 1,
        "params": {"kind": "Oscillator", "params": {"freq": 880.0}},
    }})
    assert hooks.renders == 1, "rendered while server was behind"
    assert mirror(interp, core)["modules"][1.0]["params"]["freq"] == 880

    # first Sync: still behind (1 < 2) -> no render
    send(interp, core, {"kind": "Sync", "m": 1})
    assert hooks.renders == 1
    # second Sync catches up -> the deferred render fires exactly once
    send(interp, core, {"kind": "Sync", "m": 2})
    assert hooks.renders == 2
    # further caught-up updates render immediately again
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUDeleteConnection", "input_id": [2, 0]}})
    assert hooks.renders == 3
    assert mirror(interp, core)["connections"] == {}


def test_indications_dispatch_without_full_render():
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUUpdateModuleIndication", "module_id": 1,
        "indication": {"kind": "Plotter", "value": [1, 2]},
    }})
    assert hooks.renders == 1  # targeted dispatch only (app behavior)
    assert hooks.indications == [(1, {"kind": "Plotter", "value": [1, 2]})]


def test_geometry_update_suppressed_while_dragging():
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    hooks.held.add(1)
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUUpdateWindowGeometry", "module_id": 1,
        "geometry": {"x": 99, "y": 99, "z": 1}}})
    assert mirror(interp, core)["geometry"][1.0]["x"] == 10  # kept local
    hooks.held.clear()
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUUpdateWindowGeometry", "module_id": 1,
        "geometry": {"x": 99, "y": 99, "z": 1}}})
    assert mirror(interp, core)["geometry"][1.0]["x"] == 99


def test_delete_module_clears_all_maps_and_notifies():
    interp, core, hooks = make_core()
    send(interp, core, WS_STATE)
    send(interp, core, {"kind": "Update", "m": {
        "t": "SUDeleteModule", "module_id": 1}})
    m = mirror(interp, core)
    assert m["modules"] == {} and m["geometry"] == {} and m["outputs"] == {}
    assert hooks.deleted == [1]


def test_can_connect_checks_line_types():
    interp, core, hooks = make_core()
    st = json.loads(json.dumps(WS_STATE))
    st["m"]["modules"].append([2, {"kind": "Monitor", "params": None}])
    st["m"]["inputs"].append([2, [{"line_type": "video"}, {"line_type": "stereo"}]])
    st["m"]["outputs"].append([2, []])
    send(interp, core, st)
    can = interp.get_member(core, "canConnect")
    assert interp.call_any(can, [1.0, 1.0, 2.0, 1.0])  # stereo -> stereo
    assert not interp.call_any(can, [1.0, 0.0, 2.0, 1.0])  # mono -> stereo
    assert not interp.call_any(can, [1.0, 1.0, 2.0, 0.0])  # stereo -> video
    assert not interp.call_any(can, [9.0, 0.0, 2.0, 0.0])  # unknown module


def test_can_connect_with_real_wire_terminal_arrays():
    """Terminals arrive on the wire as [label, lineType] PAIRS
    (protocol/wire.py:79-80), not objects — the regression this guards:
    `.line_type` on a pair is undefined and undefined === undefined
    silently accepted every mismatched wire."""
    interp, core, hooks = make_core()
    st = json.loads(json.dumps(WS_STATE))
    st["m"]["outputs"] = [[1, [["L", "mono"], [None, "stereo"]]]]
    st["m"]["modules"].append([2, {"kind": "Monitor", "params": None}])
    st["m"]["inputs"].append([2, [["cam", "video"], [None, "stereo"]]])
    st["m"]["outputs"].append([2, []])
    send(interp, core, st)
    can = interp.get_member(core, "canConnect")
    assert interp.call_any(can, [1.0, 1.0, 2.0, 1.0])  # stereo -> stereo
    assert not interp.call_any(can, [1.0, 0.0, 2.0, 1.0])  # mono -> stereo
    assert not interp.call_any(can, [1.0, 1.0, 2.0, 0.0])  # stereo -> video


# ---------------------------------------------------------------------------
# connect-flow state machine (drag/click-to-connect, workspace.rs:185-252)
# ---------------------------------------------------------------------------


def _flow_state(tmp_connections=()):
    interp, core, hooks = make_core()
    st = json.loads(json.dumps(WS_STATE))
    st["m"]["modules"].append([2, {"kind": "Monitor", "params": None}])
    st["m"]["inputs"].append([2, [["in0", "stereo"], ["in1", "stereo"]]])
    st["m"]["outputs"].append([2, []])
    st["m"]["connections"] = list(tmp_connections)
    send(interp, core, st)
    sent = []
    factory = interp.globals.get("makeConnectFlow")
    flow = interp.call_any(
        factory, [core, lambda m: sent.append(_to_python(m))]
    )
    down = interp.get_member(flow, "down")
    return interp, flow, down, sent


def test_connect_flow_output_then_input():
    interp, flow, down, sent = _flow_state()
    assert interp.call_any(down, [1.0, 1.0, "out", "stereo", 1.0]) == "pending"
    assert interp.call_any(down, [2.0, 0.0, "in", "stereo", 1.0]) == "connected"
    assert sent == [{"t": "CreateConnection",
                     "input_id": [2, 0], "output_id": [1, 1]}]
    assert interp.get_member(flow, "pending") in (None, UNDEFINED)


def test_connect_flow_input_first_also_works():
    interp, flow, down, sent = _flow_state()
    assert interp.call_any(down, [2.0, 1.0, "in", "stereo", 1.0]) == "pending"
    assert interp.call_any(down, [1.0, 1.0, "out", "stereo", 1.0]) == "connected"
    assert sent == [{"t": "CreateConnection",
                     "input_id": [2, 1], "output_id": [1, 1]}]


def test_connect_flow_mismatch_and_same_direction_keep_pending():
    # reference stays in Connect mode on both (workspace.rs:208-215)
    interp, flow, down, sent = _flow_state()
    assert interp.call_any(down, [1.0, 1.0, "out", "stereo", 1.0]) == "pending"
    assert interp.call_any(down, [1.0, 0.0, "out", "mono", 1.0]) == "invalid"
    assert interp.call_any(down, [2.0, 0.0, "in", "video", 1.0]) == "mismatch"
    assert sent == []
    # still pending: a valid pick completes
    assert interp.call_any(down, [2.0, 0.0, "in", "stereo", 1.0]) == "connected"
    assert len(sent) == 1


def test_connect_flow_right_click_clears_input_and_output():
    conns = [[[2, 0], [1, 1]], [[2, 1], [1, 1]]]
    interp, flow, down, sent = _flow_state(conns)
    # right-click an input clears just that connection (workspace.rs:224-231)
    assert interp.call_any(down, [2.0, 0.0, "in", "stereo", 2.0]) == "cleared:1"
    assert sent == [{"t": "DeleteConnection", "input_id": [2, 0]}]
    sent.clear()
    # right-click an output clears EVERY connection from it
    # (workspace.rs:233-248)
    assert interp.call_any(down, [1.0, 1.0, "out", "stereo", 2.0]) == "cleared:2"
    assert sorted(m["input_id"] for m in sent) == [[2, 0], [2, 1]]
    assert all(m["t"] == "DeleteConnection" for m in sent)
    sent.clear()
    # unconnected input clears nothing
    interp2, flow2, down2, sent2 = _flow_state()
    assert interp2.call_any(down2, [2.0, 0.0, "in", "stereo", 2.0]) == "cleared:0"
    assert sent2 == []


def test_connect_flow_cursor_tracking_and_cancel():
    interp, flow, down, sent = _flow_state()
    move = interp.get_member(flow, "move")
    cancel = interp.get_member(flow, "cancel")
    interp.call_any(move, [5.0, 6.0])  # no pending -> ignored
    assert interp.get_member(flow, "cursor") in (None, UNDEFINED)
    interp.call_any(down, [1.0, 1.0, "out", "stereo", 1.0])
    interp.call_any(move, [40.0, 50.0])
    cur = _to_python(interp.get_member(flow, "cursor"))
    assert cur == {"x": 40, "y": 50}
    interp.call_any(cancel, [])
    assert interp.get_member(flow, "pending") in (None, UNDEFINED)
    assert interp.get_member(flow, "cursor") in (None, UNDEFINED)
    assert sent == []


def test_js_mirror_tracks_real_server_wire_messages():
    """Integration: feed ACTUAL wire messages produced by the engine/server
    serialization into the JS client core and assert the JS mirror equals
    the engine's workspace."""
    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.engine import Engine, SyncEvent, UpdateEvent
    from mixlab_tpu.protocol import InputId, OutputId, wire

    eng = Engine(cfg=EngineConfig(sample_rate=44_100))
    sid, state, events = eng.connect_session()

    interp, core, hooks = make_core()
    send(interp, core, json.loads(wire.server_message("WorkspaceState", state)))

    ops = [
        p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry(p.Coords(5, 6)),
        ),
        p.CreateModule(p.ModuleParams("Monitor", None), p.WindowGeometry()),
        p.CreateConnection(InputId(p.ModuleId(2), 1), OutputId(p.ModuleId(1), 1)),
        p.UpdateModuleParams(
            p.ModuleId(1),
            p.ModuleParams("Oscillator", p.OscillatorParams(880.0, p.Waveform.SAW)),
        ),
    ]
    for i, op in enumerate(ops, start=1):
        interp.set_member(core, "pendingSeq", float(i))
        eng.client_update(sid, p.WorkspaceMessage(i, op))

    # relay the engine's event stream through the real serializer
    import queue

    while True:
        try:
            ev = events.get_nowait()
        except queue.Empty:
            break
        if isinstance(ev, UpdateEvent):
            send(interp, core, json.loads(wire.server_message("Update", ev.update)))
        elif isinstance(ev, SyncEvent):
            send(interp, core, {"kind": "Sync", "m": ev.clock.sequence})

    m = mirror(interp, core)
    assert set(m["modules"]) == {1.0, 2.0}
    assert m["modules"][1.0]["params"]["freq"] == 880
    assert m["modules"][1.0]["params"]["waveform"] == "saw"
    assert m["connections"] == {"2:1": [1, 1]}
    # all four ops synced -> caught up, renders flowed
    assert interp.call_any(interp.get_member(core, "caughtUp"), [])
    assert hooks.renders >= 2
