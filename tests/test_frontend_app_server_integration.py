"""The executed JS client against the REAL server over REAL sockets.

tests/test_frontend_app_dom.py bridges the jsmini-executed client straight
to an Engine; this suite closes the remaining gap by relaying the client's
fake WebSockets through genuine TCP connections to a running
mixlab_tpu server — the full stack on the wire: HTTP upgrade, RFC 6455
framing, the session loop's envelope encoding, Sync filtering, monitor
socket registration, and real fMP4 segments produced by the engine's own
MonitorPipeline, all consumed by app.js's DOM/MSE logic."""

import asyncio
import json
import pathlib
import time
import urllib.parse

import pytest

from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.project import open_or_create
from mixlab_tpu.server.app import run_server
from mixlab_tpu.utils.jsmini import Interpreter, JSObject, UNDEFINED, _from_python, _to_python

from test_server import mask_frame, ws_connect, ws_recv
from tests.loophelp import drain_and_close

STATIC = pathlib.Path(__file__).parent.parent / "mixlab_tpu" / "server" / "static"
HERE = pathlib.Path(__file__).parent

CFG = EngineConfig(sample_rate=44_100)


class WireApp:
    """jsmini client whose WebSockets relay over real TCP to the server."""

    def __init__(self, loop, port):
        self.loop = loop
        self.port = port
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
        html = (STATIC / "index.html").read_text()
        body = html.split("<body>", 1)[1].split("</body>", 1)[0]
        body = "\n".join(l for l in body.splitlines() if "<script" not in l)
        self.jscall(self.envjs, "loadHTML", body)
        self.jscall(self.envjs, "fireDOMContentLoaded")
        self.bridges = {}  # fake ws object id -> (reader, writer)
        self._sent_seen = {}
        self.connect_fake_ws(self.sockets()[0])

    # -- plumbing ----------------------------------------------------------

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

    def sockets(self):
        return list(self.interp.get_member(self.envjs, "state").props["sockets"])

    def connect_fake_ws(self, ws_js):
        """Open a REAL TCP websocket for a fake client socket (path from
        its url) and register the relay."""
        url = _to_python(self.interp.get_member(ws_js, "url"))
        path = url.split("testhost", 1)[1]
        reader, writer = self.loop.run_until_complete(
            ws_connect("127.0.0.1", self.port, path))
        self.bridges[id(ws_js)] = (ws_js, reader, writer)
        self._sent_seen[id(ws_js)] = 0

    def relay(self, budget=3.0):
        """Pump both directions for up to ``budget`` seconds."""
        deadline = time.time() + budget

        async def pump_once():
            moved = 0
            for key, (ws_js, reader, writer) in list(self.bridges.items()):
                # client -> server
                sent = list(self.interp.get_member(ws_js, "sent"))
                for payload in sent[self._sent_seen[key]:]:
                    writer.write(mask_frame(0x1, str(payload).encode()))
                    await writer.drain()
                    moved += 1
                self._sent_seen[key] = len(sent)
                # server -> client.  Bounded by the relay deadline: a
                # monitor socket can produce segments faster than the
                # interpreted MSE handler consumes them, so an unbounded
                # drain-until-gap loop would never see a 0.10 s gap.
                try:
                    while time.time() < deadline:
                        op, payload = await asyncio.wait_for(
                            ws_recv(reader), 0.10)
                        onmessage = self.interp.get_member(ws_js, "onmessage")
                        if onmessage in (None, UNDEFINED):
                            continue
                        if op == 0x1:  # text
                            data = payload.decode()
                        else:  # binary -> byte array for the JS side
                            data = _from_python(list(payload))
                        self.interp.call_any(
                            onmessage, [JSObject({"data": data})])
                        moved += 1
                except (asyncio.TimeoutError, asyncio.IncompleteReadError):
                    pass
            return moved

        while time.time() < deadline:
            if self.loop.run_until_complete(pump_once()):
                # keep pumping briefly to drain the burst
                self.loop.run_until_complete(pump_once())
            # new fake sockets created by the client (monitor player)
            for ws_js in self.sockets():
                if id(ws_js) not in self.bridges:
                    self.connect_fake_ws(ws_js)
            time.sleep(0.05)

    # -- queries -----------------------------------------------------------

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
        return _to_python(self.interp.get_member(el, "textContent"))


@pytest.fixture()
def wire_server(tmp_path):
    async def setup():
        project = open_or_create(tmp_path / "wired.mixlab", CFG)
        tcp, server = await run_server(project, "127.0.0.1", 0)
        return project, tcp, tcp.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    project, tcp, port = loop.run_until_complete(setup())
    yield loop, port, project
    project.engine.stop()
    tcp.close()
    drain_and_close(loop)
    project.close()


def test_client_full_stack_over_real_sockets(wire_server):
    loop, port, project = wire_server
    app = WireApp(loop, port)

    # initial WorkspaceState + MediaLibrary arrive over the real wire
    app.relay(1.0)
    assert app.qa(".module") == []

    # create an Oscillator and a Monitor through the real session
    ws_el = app.by_id("workspace")
    app.fire(ws_el, "contextmenu", clientX=200, clientY=150)
    item = next(el for el in app.qa(".ctxitem") if app.text(el) == "Oscillator")
    app.fire(item, "click")
    app.relay(2.5)
    wins = app.qa(".module")
    assert len(wins) == 1, "oscillator window did not render via the wire"

    app.fire(ws_el, "contextmenu", clientX=500, clientY=150)
    item = next(el for el in app.qa(".ctxitem") if app.text(el) == "Monitor")
    app.fire(item, "click")
    app.relay(2.5)
    assert len(app.qa(".module")) == 2

    # connect osc stereo out -> monitor audio in over the wire
    import mixlab_tpu.protocol as p

    mids = sorted(m.value for m in project.engine.ws.modules)
    osc_mid, mon_mid = mids[0], mids[1]
    out_dot = app.q(f'.module[data-mid="{osc_mid}"] .term.out[data-idx="1"]')
    in_dot = app.q(f'.module[data-mid="{mon_mid}"] .term.in[data-idx="1"]')
    app.fire(out_dot, "pointerdown", buttons=1)
    app.fire(in_dot, "pointerdown", buttons=1)
    app.relay(2.5)
    assert len(project.engine.ws.connections) == 1

    # the monitor indication carried a socket id; click listen -> the
    # client opens a REAL /_monitor websocket and the MSE recorder fills
    # with genuine fMP4 from the engine's codec thread
    btn = next(el for el in app.qa(f'.module[data-mid="{mon_mid}"] button')
               if app.text(el) == "▶ listen")
    app.fire(btn, "click")
    deadline = time.time() + 30
    sbs = []
    while time.time() < deadline:
        app.relay(1.0)
        sbs = list(app.interp.get_member(app.envjs, "state").props["sourceBuffers"])
        if sbs and len(list(app.interp.get_member(sbs[0], "appended"))) >= 3:
            break
    assert sbs, "MSE source buffer never created over the real wire"
    appended = list(app.interp.get_member(sbs[0], "appended"))
    assert len(appended) >= 3, "no fMP4 segments through the real stack"
    mime = _to_python(app.interp.get_member(sbs[0], "mime"))
    assert "avc1." in mime
    # video element replaced the placeholder
    assert app.q(f'.module[data-mid="{mon_mid}"] video') is not None

    # close the real sockets before the fixture tears the loop down
    async def close_all():
        for _ws_js, _r, w in app.bridges.values():
            w.close()
        await asyncio.sleep(0.05)

    loop.run_until_complete(close_all())
