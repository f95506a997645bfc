"""Execute the FULL web client (app.js) under jsmini against a REAL engine.

Round 2's gap: only session_core.js (the pure mirror) had ever executed;
the DOM / canvas / MSE / WebMIDI halves of app.js (860 lines) were
lint-only.  This suite boots the whole client inside the jsmini
interpreter on top of a browser-environment stub (tests/browser_env.js —
DOM tree, selector engine, recording canvas-2D contexts, MediaSource
recorder, fake WebSocket/WebMIDI/localStorage/fetch), wires its session
WebSocket to a REAL Engine (CPU backend) through the same wire-envelope
code the server uses (server/app.py:258-333), and drives the reference's
interaction flows end to end:

  * boot + workspace render from a real WorkspaceState
    (frontend/src/lib.rs:27-106, session.rs:38-223)
  * right-click create menu -> CreateModule -> SUCreateModule -> window DOM
    (frontend/src/workspace.rs:96-330)
  * titlebar drag -> UpdateWindowGeometry (workspace.rs drag handling)
  * terminal click-to-connect incl. type-mismatch rejection
    (workspace.rs:185-252)
  * slider/param edits -> UpdateModuleParams round trip
  * canvas fader/rotary drawing + drag (frontend/src/control/fader.rs:19-99)
  * MIDI learn -> CC mapping -> param updates (frontend/src/service/midi.rs:216-287)
  * monitor MSE player fed REAL fMP4 init + segments from the engine's own
    MonitorPipeline (frontend/src/module/monitor.rs:164-248)
  * plotter scope drawing from real PlotterIndications
  * performance sidebar (frontend/src/sidebar.rs:10-60)
  * media library render + upload fetch (frontend/src/library.rs)
  * delete module -> window removal
"""

import json
import pathlib
import queue
import time
import urllib.parse

import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine, SyncEvent, UpdateEvent
from mixlab_tpu.engine.graph import Workspace
from mixlab_tpu.protocol import wire
from mixlab_tpu.utils.jsmini import (
    Interpreter,
    JSObject,
    UNDEFINED,
    _from_python,
    _to_python,
)

STATIC = pathlib.Path(__file__).parent.parent / "mixlab_tpu" / "server" / "static"
HERE = pathlib.Path(__file__).parent

CFG = EngineConfig(sample_rate=44_100)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


class App:
    """The client app running under jsmini, bridged to a real Engine."""

    def __init__(self):
        self.interp = Interpreter()
        g = self.interp.globals
        g.declare("module", JSObject({"exports": JSObject({})}))
        g.declare("__bytesToStr", self._bytes_to_str)
        g.declare("encodeURIComponent",
                  lambda s="": urllib.parse.quote(str(s), safe=""))
        self.interp.run((HERE / "browser_env.js").read_text())
        self.interp.run((STATIC / "session_core.js").read_text())
        self.interp.run((STATIC / "app.js").read_text())
        self.envjs = g.get("__env")

        # real page skeleton: the body of the shipped index.html
        html = (STATIC / "index.html").read_text()
        body = html.split("<body>", 1)[1].split("</body>", 1)[0]
        body = "\n".join(
            line for line in body.splitlines() if "<script" not in line
        )
        self.jscall(self.envjs, "loadHTML", body)
        self.jscall(self.envjs, "fireDOMContentLoaded")

        # the client's session WebSocket is sockets[0]
        self.ws = self.sockets()[0]
        self._sent_seen = 0

        # real engine (CPU) + the same session plumbing app.py uses
        self.eng = Engine(workspace=Workspace(), cfg=CFG)
        self.eng.start()
        self.sid, state, self.events = self.eng.connect_session()
        self.deliver("WorkspaceState", state)
        self.deliver("MediaLibrary", p.MediaLibrary(items=[]))

    def close(self):
        self.eng.stop()

    # -- js plumbing -------------------------------------------------------

    def _bytes_to_str(self, u8):
        data = u8.props["buffer"]
        off = int(u8.props["byteOffset"])
        n = int(u8.props["byteLength"])
        return bytes(int(x) for x in data[off : off + n]).decode("utf-8")

    def jscall(self, obj, name, *args):
        fn = self.interp.get_member(obj, name)
        return self.interp.call_any(
            fn, [_from_python(a) if isinstance(a, (dict, list)) else a
                 for a in args], this=obj)

    def get(self, obj, name):
        return self.interp.get_member(obj, name)

    def sockets(self):
        return list(self.get(self.envjs, "state").props["sockets"])

    def q(self, sel):
        el = self.jscall(self.envjs, "q", sel)
        return None if el in (None, UNDEFINED) else el

    def qa(self, sel):
        return list(self.jscall(self.envjs, "qa", sel))

    def by_id(self, id_):
        el = self.jscall(self.envjs, "byId", id_)
        return None if el in (None, UNDEFINED) else el

    def fire(self, el, type_, **props):
        return self.jscall(self.envjs, "fire", el, type_, _from_python(props))

    def text(self, el):
        return _to_python(self.get(el, "textContent"))

    # -- server bridge (mirrors server/app.py:258-333) ---------------------

    def deliver(self, kind, payload):
        msg = wire.server_message(kind, payload)
        onmessage = self.get(self.ws, "onmessage")
        self.interp.call_any(onmessage, [JSObject({"data": msg})])

    def pump_engine(self, budget=2.0):
        """Deliver pending engine events to the client (Update/Sync)."""
        deadline = time.time() + budget
        delivered = 0
        while time.time() < deadline:
            try:
                ev = self.events.get(timeout=0.05)
            except queue.Empty:
                break
            if isinstance(ev, UpdateEvent):
                self.deliver("Update", ev.update)
                delivered += 1
            elif isinstance(ev, SyncEvent):
                if ev.clock.session_id == self.sid:
                    self.deliver("Sync", ev.clock.sequence)
                    delivered += 1
        return delivered

    def flush_client(self, budget=5.0):
        """Parse the client's outgoing ws messages exactly like the server
        session loop and apply them to the engine."""
        sent = list(self.get(self.ws, "sent"))
        new = sent[self._sent_seen :]
        self._sent_seen = len(sent)
        for payload in new:
            kind, body = wire.parse_envelope(payload)
            assert kind == "Workspace"
            wsmsg = wire._decode_typed(body, p.WorkspaceMessage)
            self.eng.update(self.sid, wsmsg)
        if new:
            # wait for the engine thread to process + broadcast
            deadline = time.time() + budget
            while time.time() < deadline:
                if self.pump_engine(budget=0.3):
                    # drain any trailing events of the same batch
                    time.sleep(0.05)
                    self.pump_engine(budget=0.2)
                    return
                time.sleep(0.02)
        return

    def roundtrip(self, budget=5.0):
        self.flush_client(budget)
        self.pump_engine(0.3)

    # -- UI actions --------------------------------------------------------

    def create_module(self, label, x=300, y=200):
        ws_el = self.by_id("workspace")
        self.fire(ws_el, "contextmenu", clientX=x, clientY=y)
        menu = self.by_id("ctxmenu")
        assert _to_python(self.get(self.get(menu, "style"), "display")) == "block"
        item = next(
            el for el in self.qa(".ctxitem") if self.text(el) == label
        )
        self.fire(item, "click")
        self.roundtrip()
        return self.latest_module_id()

    def latest_module_id(self):
        mods = sorted(m.value for m in self.eng.ws.modules)
        return mods[-1] if mods else None

    def window_el(self, mid):
        return self.q(f'.module[data-mid="{mid}"]')


@pytest.fixture()
def app():
    a = App()
    yield a
    a.close()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_boot_connects_and_renders_empty_workspace(app):
    assert _to_python(app.get(app.ws, "url")) == "ws://testhost/session"
    # empty state: no module windows
    assert app.qa(".module") == []
    # context menu exists and is hidden
    menu = app.by_id("ctxmenu")
    assert menu is not None


def test_create_module_via_context_menu(app):
    mid = app.create_module("Oscillator")
    assert mid is not None
    # the engine really created it
    entry = app.eng.ws.modules[p.ModuleId(mid)]
    assert entry.params.kind == "Oscillator"
    # geometry from the click position (menu at 300,200; workspace at 0,0)
    geom = app.eng.ws.geometry[p.ModuleId(mid)]
    assert geom.position.x == 300 and geom.position.y == 200
    # ... and the DOM rendered a window for it
    win = app.window_el(mid)
    assert win is not None
    title = app.interp.call_any(
        app.get(win, "querySelector"), [".title"], this=win)
    assert app.text(title) == f"Oscillator #{mid}"
    # terminals: oscillator has 0 inputs, 2 outputs (mono + stereo)
    outs = app.qa(f'.module[data-mid="{mid}"] .term.out')
    ins = app.qa(f'.module[data-mid="{mid}"] .term.in')
    assert len(outs) == 2 and len(ins) == 0


def test_titlebar_drag_sends_geometry(app):
    mid = app.create_module("Oscillator", x=100, y=100)
    win = app.window_el(mid)
    bar = app.interp.call_any(app.get(win, "querySelector"), [".titlebar"], this=win)
    # drag from (105,105) to (255,305)
    app.fire(bar, "pointerdown", clientX=105, clientY=105)
    app.fire(bar, "pointermove", clientX=255, clientY=305)
    # live position applied to the DOM during the drag
    assert _to_python(app.get(app.get(win, "style"), "left")) == "250px"
    app.fire(bar, "pointerup")
    app.roundtrip()
    geom = app.eng.ws.geometry[p.ModuleId(mid)]
    assert (geom.position.x, geom.position.y) == (250, 300)


def test_click_to_connect_and_mismatch(app):
    osc = app.create_module("Oscillator", x=60, y=60)
    amp = app.create_module("Amplifier", x=500, y=60)
    # oscillator stereo out (idx 1) -> amplifier stereo in (idx 0)
    out_dot = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="1"]')
    in_dot = app.q(f'.module[data-mid="{amp}"] .term.in[data-idx="0"]')
    assert out_dot is not None and in_dot is not None
    app.fire(out_dot, "pointerdown", buttons=1)
    status = app.by_id("status")
    assert "connecting" in app.text(status)
    app.fire(in_dot, "pointerdown", buttons=1)
    app.roundtrip()
    # engine really connected them
    got = app.eng.ws.connections.get(p.InputId(p.ModuleId(amp), 0))
    assert got == p.OutputId(p.ModuleId(osc), 1)
    # the wire is drawn in the svg layer
    wires = app.by_id("wires")
    paths = [c for c in app.get(wires, "children")
             if not isinstance(c, str)]
    assert len(paths) == 1
    # type mismatch: mono out (idx 0) -> amplifier CONTROL input is mono...
    # use amplifier stereo in vs oscillator mono out: mono != stereo
    mono_out = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="0"]')
    app.fire(mono_out, "pointerdown", buttons=1)
    app.fire(in_dot, "pointerdown", buttons=1)
    assert "mismatch" in app.text(status)
    app.flush_client()
    # no second connection was created
    assert len(app.eng.ws.connections) == 1


def test_slider_param_roundtrip(app):
    mid = app.create_module("Oscillator")
    win = app.window_el(mid)
    slider = app.q(f'.module[data-mid="{mid}"] input[type="range"]')
    assert slider is not None
    app.interp.set_member(slider, "value", 880.0)
    app.fire(slider, "input")
    app.roundtrip()
    params = app.eng.ws.modules[p.ModuleId(mid)].params.params
    assert params.freq == 880.0


def test_canvas_fader_drag_and_drawing(app):
    mid = app.create_module("Mixer (4ch)")
    faders = app.qa(f'.module[data-mid="{mid}"] canvas.fader')
    rotaries = app.qa(f'.module[data-mid="{mid}"] canvas.rotary')
    assert len(faders) == 4 and len(rotaries) == 4
    fader = faders[0]
    ops = [op[0] for op in _to_python(app.get(fader, "_ops"))]
    assert "fillRect" in ops  # it drew itself at build time
    # canvas rect is (200,200,28,84); drag the handle to the top -> 1.0,
    # then to the bottom -> 0.0
    app.fire(fader, "pointerdown", clientX=210, clientY=206)
    app.fire(fader, "pointerup")
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == 1.0
    app.fire(fader, "pointerdown", clientX=210, clientY=200 + 84)
    app.fire(fader, "pointerup")
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == 0.0


def test_midi_learn_maps_cc_to_fader(app):
    mid = app.create_module("Mixer (4ch)")
    fader = app.qa(f'.module[data-mid="{mid}"] canvas.fader')[0]
    # right-click the fader: MIDI learn mode
    app.fire(fader, "contextmenu")
    status = app.by_id("status")
    assert "MIDI learn" in app.text(status)
    # a CC message on the fake WebMIDI input completes the mapping
    midi_inputs = list(app.get(app.envjs, "state").props["midiInputs"])
    assert midi_inputs, "midi.init did not subscribe the fake input"
    onmsg = app.get(midi_inputs[0], "onmidimessage")
    app.interp.call_any(onmsg, [_from_python({"data": [0xB0, 7, 127]})])
    assert "mapped CC 7" in app.text(status)
    # mapping persisted to localStorage
    stored = app.interp.call_any(
        app.get(app.interp.globals.get("localStorage"), "getItem"),
        ["midi-map"])
    assert "cc7" in json.loads(stored)
    # subsequent CC messages drive the fader -> engine param
    app.interp.call_any(onmsg, [_from_python({"data": [0xB0, 7, 0]})])
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == 0.0
    app.interp.call_any(onmsg, [_from_python({"data": [0xB0, 7, 127]})])
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == 1.0


def test_monitor_mse_player_real_fmp4(app):
    from mixlab_tpu.server import monitor as monitor_mod

    mid = app.create_module("Monitor")
    # the engine spawned a real MonitorPipeline; its indication carries the
    # socket id (engine.py:345, monitor.rs:24-66)
    ind = app.eng.ws.indications[p.ModuleId(mid)]
    socket_id = ind.value.socket_id
    bc = monitor_mod.get_socket(socket_id)
    assert bc is not None
    sub = bc.subscribe()

    # click "listen": the client opens the monitor WebSocket
    btn = next(el for el in app.qa(f'.module[data-mid="{mid}"] button')
               if app.text(el) == "▶ listen")
    app.fire(btn, "click")
    mon_ws = app.sockets()[-1]
    assert _to_python(app.get(mon_ws, "url")) == f"ws://testhost/_monitor/{socket_id}"

    # wait for the real pipeline to produce its init + some segments
    ready = getattr(bc, "ready", None)
    if ready is not None:
        assert ready.wait(10)
    init_packet = bc.init_packet
    header = json.loads(init_packet.split(b"\n", 1)[0])
    assert header["t"] == "init" and header["mode"] == "fmp4"

    onmessage = app.get(mon_ws, "onmessage")

    def feed(packet: bytes):
        app.interp.call_any(
            onmessage, [JSObject({"data": _from_python(list(packet))})])

    feed(init_packet)
    # the MSE pipeline was set up with the advertised mime; the init
    # segment got appended
    sbs = list(app.get(app.envjs, "state").props["sourceBuffers"])
    assert len(sbs) == 1
    sb = sbs[0]
    assert header["mime"] == _to_python(app.get(sb, "mime"))
    appended = list(app.get(sb, "appended"))
    assert len(appended) == 1
    # the appended view is exactly the init segment (ftyp box after length)
    init_payload = init_packet.split(b"\n", 1)[1]
    view = appended[0]  # Uint8Array fake: buffer + byteOffset + byteLength
    buf = list(app.get(view, "buffer"))
    off = int(_to_python(app.get(view, "byteOffset")))
    ln = int(_to_python(app.get(view, "byteLength")))
    got = bytes(int(b) for b in buf[off : off + ln])
    assert got == init_payload
    assert got[4:8] == b"ftyp"

    segments = 0
    deadline = time.time() + 15
    while segments < 3 and time.time() < deadline:
        try:
            pkt = sub.get(timeout=1.0)
        except queue.Empty:
            continue
        if json.loads(pkt.split(b"\n", 1)[0]).get("t") == "segment":
            feed(pkt)
            segments += 1
    assert segments >= 3
    appended = list(app.get(sb, "appended"))
    assert len(appended) == 1 + segments
    # and a <video> element replaced the placeholder image
    assert app.q(f'.module[data-mid="{mid}"] video') is not None
    bc.unsubscribe(sub)


def test_plotter_scope_draws_from_real_indication(app):
    osc = app.create_module("Oscillator", x=50, y=50)
    plot = app.create_module("Plotter", x=400, y=50)
    out_dot = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="1"]')
    in_dot = app.q(f'.module[data-mid="{plot}"] .term.in[data-idx="0"]')
    app.fire(out_dot, "pointerdown", buttons=1)
    app.fire(in_dot, "pointerdown", buttons=1)
    app.roundtrip()
    canvas = app.q(f'.module[data-mid="{plot}"] canvas')
    assert canvas is not None
    # the engine emits a PlotterIndication every 6th tick; pump until the
    # scope draws
    deadline = time.time() + 15
    drew = False
    while time.time() < deadline and not drew:
        time.sleep(0.2)
        app.pump_engine(0.5)
        ops = [op[0] for op in _to_python(app.get(canvas, "_ops"))]
        drew = "stroke" in ops and "lineTo" in ops
    assert drew, "plotter canvas never drew a trace"


def test_performance_sidebar_renders_real_info(app):
    app.create_module("Oscillator")
    deadline = time.time() + 10
    info = None
    while time.time() < deadline and info is None:
        info = app.eng.performance_info()
        time.sleep(0.1)
    assert info is not None
    app.deliver("Performance", info)
    perf = app.by_id("perf")
    kids = [c for c in app.get(perf, "children") if not isinstance(c, str)]
    assert kids, "sidebar did not render"
    # realtime flag + per-account table rendered from the real PerformanceInfo
    flag = app.q("#perf b")
    assert app.text(flag) in ("true", "false")
    rows = app.qa("#perf table tr")
    assert len(rows) >= 1  # at least the engine-overhead account


def test_library_render_and_upload(app):
    app.deliver("MediaLibrary", p.MediaLibrary(items=[
        p.MediaItem(p.MediaId(1), "loop.wav", "audio/wav", 1234),
    ]))
    listing = app.by_id("library-list")
    items = [c for c in app.get(listing, "children") if not isinstance(c, str)]
    assert len(items) == 1
    # upload: change event on the file input fires a fetch to /_upload/<name>
    upload = app.by_id("upload")
    fake_file = {"name": "my song.flac", "type": "audio/flac"}
    app.interp.set_member(upload, "files", _from_python([fake_file]))
    app.fire(upload, "change")
    fetches = list(app.get(app.envjs, "state").props["fetches"])
    assert fetches, "upload did not fetch"
    url = _to_python(app.interp.get_index(fetches[-1], 0.0))
    assert url == "/_upload/my%20song.flac"


def test_delete_module_removes_window(app):
    mid = app.create_module("Oscillator")
    win = app.window_el(mid)
    close = app.interp.call_any(app.get(win, "querySelector"), [".close"], this=win)
    app.fire(close, "click")
    app.roundtrip()
    assert p.ModuleId(mid) not in app.eng.ws.modules
    assert app.window_el(mid) is None


def test_tab_switching(app):
    tabs = app.qa(".tab")
    assert len(tabs) == 2
    lib_tab = next(t for t in tabs
                   if _to_python(app.get(app.get(t, "dataset"), "view")) == "library")
    app.fire(lib_tab, "click")
    wv = app.by_id("workspace-view")
    lv = app.by_id("library-view")
    assert _to_python(app.get(app.get(wv, "style"), "display")) == "none"
    assert _to_python(app.get(app.get(lv, "style"), "display")) == "block"


def test_trigger_gate_button(app):
    mid = app.create_module("Trigger")
    btn = app.q(f'.module[data-mid="{mid}"] button.gate')
    assert btn is not None
    assert app.text(btn) == "OFF"  # created closed
    app.fire(btn, "click")
    app.roundtrip()
    assert app.eng.ws.modules[p.ModuleId(mid)].params.params == p.GateState.OPEN
    assert app.text(btn) == "ON"


def test_stream_output_ui_go_live_and_badge(app):
    mid = app.create_module("StreamOutput")
    win = app.window_el(mid)
    inputs = app.qa(f'.module[data-mid="{mid}"] input')
    url_in, key_in = inputs[0], inputs[1]
    app.interp.set_member(url_in, "value", "rtmp://example/live")
    app.interp.set_member(key_in, "value", "s3cret")
    go = next(el for el in app.qa(f'.module[data-mid="{mid}"] button')
              if app.text(el) == "go live")
    app.fire(go, "click")
    app.flush_client()
    params = app.eng.ws.modules[p.ModuleId(mid)].params.params
    # the impulse-encoded connect fired (stream_output.rs:62-80 semantics)
    assert params.connect_seq == params.seq == 2
    assert params.rtmp_url == "rtmp://example/live"
    assert params.rtmp_stream_key == "s3cret"
    # a live-status indication drives the badge
    app.deliver("Update", p.SUUpdateModuleIndication(
        p.ModuleId(mid),
        p.Indication("StreamOutput", p.StreamOutputIndication(
            live=p.StreamOutputLiveStatus.LIVE, error=False))))
    badge = app.q(f'.module[data-mid="{mid}"] span.badge')
    assert "live" in app.text(badge)


def test_video_mixer_ui_select_and_fade(app):
    mid = app.create_module("VideoMixer")
    sels = app.qa(f'.module[data-mid="{mid}"] select')
    assert len(sels) == 2
    app.interp.set_member(sels[0], "value", "1")
    app.fire(sels[0], "change")
    app.roundtrip()
    assert app.eng.ws.modules[p.ModuleId(mid)].params.params.a == 1
    slider = app.q(f'.module[data-mid="{mid}"] input[type="range"]')
    app.interp.set_member(slider, "value", 0.25)
    app.fire(slider, "input")
    app.roundtrip()
    params = app.eng.ws.modules[p.ModuleId(mid)].params.params
    assert params.fader == 0.25 and params.a == 1


def test_media_source_ui_dropdown(app):
    app.deliver("MediaLibrary", p.MediaLibrary(items=[
        p.MediaItem(p.MediaId(7), "beat.wav", "audio/wav", 99),
    ]))
    mid = app.create_module("MediaSource")
    sel = app.q(f'.module[data-mid="{mid}"] select')
    # options: (none) + the library item
    opts = [c for c in app.get(sel, "children") if not isinstance(c, str)]
    assert len(opts) == 2
    app.interp.set_member(sel, "value", "7")
    app.fire(sel, "change")
    app.roundtrip()
    params = app.eng.ws.modules[p.ModuleId(mid)].params.params
    assert params.media_id == p.MediaId(7)


def test_oscillator_waveform_select(app):
    mid = app.create_module("Oscillator")
    sel = app.q(f'.module[data-mid="{mid}"] select')
    app.interp.set_member(sel, "value", "square")
    app.fire(sel, "change")
    app.roundtrip()
    params = app.eng.ws.modules[p.ModuleId(mid)].params.params
    assert params.waveform == p.Waveform.SQUARE
    assert params.freq == 220.0  # other fields preserved through the spread


def test_connect_live_wire_follows_cursor_and_cancels(app):
    """While a connect is pending, pointermove draws the live dashed wire
    to the cursor and pressing empty workspace cancels it
    (workspace.rs:173-178 + cancel semantics)."""
    osc = app.create_module("Oscillator", x=60, y=60)
    out_dot = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="1"]')
    app.fire(out_dot, "pointerdown", buttons=1)
    ws_el = app.by_id("workspace")
    app.fire(ws_el, "pointermove", clientX=400, clientY=300)
    svg = app.by_id("wires")
    live = [c for c in app.get(svg, "children")
            if not isinstance(c, str)
            and "live" in str(_to_python(app.get(c, "attrs").props.get("class", "")))]
    assert live, "no live wire drawn while connecting"
    # pressing empty workspace cancels the pending connect
    app.fire(ws_el, "pointerdown")
    app.fire(ws_el, "pointermove", clientX=500, clientY=300)
    live2 = [c for c in app.get(svg, "children")
             if not isinstance(c, str)
             and "live" in str(_to_python(app.get(c, "attrs").props.get("class", "")))]
    assert not live2, "live wire survived cancellation"
    app.flush_client()
    assert len(app.eng.ws.connections) == 0


def test_context_menu_hides_on_workspace_click(app):
    ws_el = app.by_id("workspace")
    app.fire(ws_el, "contextmenu", clientX=100, clientY=100)
    menu = app.by_id("ctxmenu")
    assert _to_python(app.get(app.get(menu, "style"), "display")) == "block"
    app.fire(ws_el, "click")
    assert _to_python(app.get(app.get(menu, "style"), "display")) == "none"


def test_delete_connection_by_clicking_wire(app):
    osc = app.create_module("Oscillator", x=60, y=60)
    amp = app.create_module("Amplifier", x=420, y=60)
    out_dot = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="1"]')
    in_dot = app.q(f'.module[data-mid="{amp}"] .term.in[data-idx="0"]')
    app.fire(out_dot, "pointerdown", buttons=1)
    app.fire(in_dot, "pointerdown", buttons=1)
    app.roundtrip()
    assert len(app.eng.ws.connections) == 1
    svg = app.by_id("wires")
    wirepath = next(c for c in app.get(svg, "children")
                    if not isinstance(c, str))
    app.fire(wirepath, "click")
    app.roundtrip()
    assert len(app.eng.ws.connections) == 0


def test_right_press_clears_connections(app):
    """Right-pressing a terminal clears its connections (workspace.rs
    right-click semantics via connectFlow.clear)."""
    osc = app.create_module("Oscillator", x=60, y=60)
    amp = app.create_module("Amplifier", x=420, y=60)
    out_dot = app.q(f'.module[data-mid="{osc}"] .term.out[data-idx="1"]')
    in_dot = app.q(f'.module[data-mid="{amp}"] .term.in[data-idx="0"]')
    app.fire(out_dot, "pointerdown", buttons=1)
    app.fire(in_dot, "pointerdown", buttons=1)
    app.roundtrip()
    assert len(app.eng.ws.connections) == 1
    # right-press (buttons bit 2) the input terminal clears it
    app.fire(in_dot, "pointerdown", buttons=2)
    app.roundtrip()
    assert len(app.eng.ws.connections) == 0


def test_fader_wheel_adjusts_value(app):
    mid = app.create_module("Mixer (4ch)")
    fader = app.qa(f'.module[data-mid="{mid}"] canvas.fader')[0]
    # wheel down decreases by range/50 from the initial 1.0
    app.fire(fader, "wheel", deltaY=120)
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == pytest.approx(1.0 - 1.0 / 50)
    app.fire(fader, "wheel", deltaY=-120)
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.fader == pytest.approx(1.0)


def test_rotary_drag_adjusts_gain(app):
    mid = app.create_module("Mixer (4ch)")
    rot = app.qa(f'.module[data-mid="{mid}"] canvas.rotary')[0]
    # drag up 50 px: gain += 50/100 * (12 - -24) = +18 from 0 -> clamps 12
    app.fire(rot, "pointerdown", clientY=200)
    app.fire(rot, "pointermove", clientY=150)
    app.fire(rot, "pointerup")
    app.roundtrip()
    ch0 = app.eng.ws.modules[p.ModuleId(mid)].params.params.channels[0]
    assert ch0.gain.db == pytest.approx(12.0)
    ops = [op[0] for op in _to_python(app.get(rot, "_ops"))]
    assert "arc" in ops and "stroke" in ops  # rotary redrew itself
