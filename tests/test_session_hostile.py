"""Hostile client-message handling: strict wire decode + engine-thread survival.

The reference's wire is bincode into Rust types (src/server.rs:240): a
malformed payload fails deserialization and the type system makes
type-confused values unrepresentable, so the engine thread can never see
them.  Our self-describing JSON wire must enforce the same contract
explicitly:

1. ``wire.decode`` raises ``WireDecodeError`` (a ``ValueError``) — and
   nothing else — for EVERY shape/leaf-type violation, so the session loop's
   skip-malformed guard (server/app.py) catches it.
2. Even if a poisoned op reached the engine thread, ``client_update`` is
   transactional: the workspace rolls back to the pre-op snapshot, the
   engine keeps ticking for every session, and Sync is still emitted so the
   owning client's optimistic UI un-gates (frontend/src/session.rs:93-108).

Found by the round-4 session-dispatch fuzz: pre-fix, one valid-JSON
WebSocket message with a string ``freq`` killed the engine thread for the
whole server (TypeError inside module prepare during graph rebuild).
"""

import json
import queue
import time

import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine, SyncEvent, UpdateEvent
from mixlab_tpu.protocol import wire

CFG = EngineConfig(sample_rate=44_100)


def _ws_body(seq, op):
    return {"t": "WorkspaceMessage", "sequence": seq, "op": op}


HOSTILE_BODIES = [
    # string where float belongs — the original engine-thread killer
    _ws_body(1, {"t": "CreateModule",
                 "params": {"kind": "Oscillator",
                            "params": {"freq": "evil", "waveform": "sine"}},
                 "geometry": {}}),
    # unknown module kind (KeyError leak pre-fix)
    _ws_body(2, {"t": "CreateModule", "params": {"kind": "Nope", "params": {}},
                 "geometry": {}}),
    # scalar where a terminal-id pair belongs (TypeError leak pre-fix)
    _ws_body(3, {"t": "CreateConnection", "input_id": 5, "output_id": [1, 1]}),
    # wrong arity pair
    _ws_body(4, {"t": "CreateConnection", "input_id": [1, 1, 9],
                 "output_id": [1, 1]}),
    # int too large for a float field (OverflowError leak pre-fix)
    _ws_body(5, {"t": "CreateModule",
                 "params": {"kind": "Oscillator",
                            "params": {"freq": 10 ** 400, "waveform": "sine"}},
                 "geometry": {}}),
    # unknown op tag (KeyError leak pre-fix)
    _ws_body(6, {"t": "Bogus"}),
    # wrong type in a scalar field of the envelope itself
    _ws_body([], None),
    # top-level non-dict
    "just a string",
    # dict where a ModuleId int belongs
    _ws_body(7, {"t": "UpdateModuleParams", "module_id": {"evil": 1},
                 "params": {"kind": "Trigger", "params": "held"}}),
    # bad enum value
    _ws_body(8, {"t": "CreateModule",
                 "params": {"kind": "Oscillator",
                            "params": {"freq": 440.0, "waveform": "sawtooth?"}},
                 "geometry": {}}),
    # string where a list-typed field belongs (iterating a str would
    # silently type-confuse char-by-char)
    _ws_body(9, {"t": "CreateModule",
                 "params": {"kind": "Mixer", "params": {"channels": "abcd"}},
                 "geometry": {}}),
    # absurd container length (allocation/compile-time DoS guard)
    _ws_body(11, {"t": "CreateModule",
                  "params": {"kind": "Mixer",
                             "params": {"channels": [{}] * 5000}},
                  "geometry": {}}),
    # bool where int belongs is tolerated nowhere it matters, but bool
    # where float belongs must be rejected (bool is an int subclass)
    _ws_body(12, {"t": "CreateModule",
                  "params": {"kind": "Oscillator",
                             "params": {"freq": True, "waveform": "sine"}},
                  "geometry": {}}),
]


@pytest.mark.parametrize("body", HOSTILE_BODIES,
                         ids=[f"h{i}" for i in range(len(HOSTILE_BODIES))])
def test_hostile_bodies_raise_typed_decode_error(body):
    with pytest.raises(wire.WireDecodeError):
        wire.decode(body, p.WorkspaceMessage)


def test_decode_error_is_a_value_error():
    # the session loop's skip-malformed guard catches ValueError; the typed
    # error must stay inside that class
    assert issubclass(wire.WireDecodeError, ValueError)


def test_good_message_decodes_and_round_trips():
    msg = p.WorkspaceMessage(9, p.CreateConnection(
        p.InputId(p.ModuleId(2), 1), p.OutputId(p.ModuleId(1), 0)))
    rt = wire.decode(json.loads(json.dumps(wire.encode(msg))),
                     p.WorkspaceMessage)
    assert rt == msg


def test_integral_float_accepted_for_int_field():
    # a JS client has one number type; 3.0 must decode as int 3
    body = _ws_body(1.0, {"t": "DeleteModule", "module_id": 3.0})
    msg = wire.decode(body, p.WorkspaceMessage)
    assert msg.sequence == 1 and msg.op.module_id == p.ModuleId(3)


def test_deeply_nested_payload_is_a_value_error():
    deep = '{"v":1,"kind":"Workspace","m":' + "[" * 100_000 + "]" * 100_000 + "}"
    with pytest.raises(ValueError):
        wire.parse_envelope(deep)
    with pytest.raises(ValueError):
        wire.loads("[" * 100_000 + "]" * 100_000)


def _drain_syncs(events):
    seqs = []
    while True:
        try:
            ev = events.get_nowait()
        except queue.Empty:
            return seqs
        if isinstance(ev, SyncEvent):
            seqs.append(ev.clock.sequence)


def test_engine_thread_survives_poisoned_op_with_rollback():
    """Defense-in-depth behind the decode layer: a semantically-poisoned op
    (here: constructed directly, bypassing wire decode) must not kill the
    engine thread; the workspace rolls back and Sync still goes out."""
    eng = Engine(cfg=CFG)
    eng.start()
    try:
        sid, state, events = eng.connect_session()
        evil = p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator",
                           p.OscillatorParams("evil", p.Waveform.SINE)),
            p.WindowGeometry()))
        eng.update(sid, evil)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and _drain_syncs(events) != [1]:
            time.sleep(0.05)
        assert eng._thread.is_alive()
        # rollback: the poisoned module is gone AND module_seq rolled back,
        # so the next create gets a clean id
        assert list(eng.ws.modules) == []

        good = p.WorkspaceMessage(2, p.CreateModule(
            p.ModuleParams("Oscillator",
                           p.OscillatorParams(440.0, p.Waveform.SINE)),
            p.WindowGeometry()))
        eng.update(sid, good)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and not eng.ws.modules:
            time.sleep(0.05)
        assert eng._thread.is_alive()
        assert list(eng.ws.modules) == [p.ModuleId(1)]
    finally:
        eng.stop()


def test_update_params_poison_rolls_back_to_previous_params():
    """A failed UpdateModuleParams leaves the previous good params live."""
    eng = Engine(cfg=CFG)  # direct-drive mode: commands run synchronously
    sid, state, events = eng.connect_session()
    eng.client_update(sid, p.WorkspaceMessage(1, p.CreateModule(
        p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
        p.WindowGeometry())))
    mid = p.ModuleId(1)
    eng.client_update(sid, p.WorkspaceMessage(2, p.UpdateModuleParams(
        mid, p.ModuleParams("Oscillator",
                            p.OscillatorParams("evil", p.Waveform.SINE)))))
    assert eng.ws.modules[mid].params.params.freq == 440.0
    # engine still renders after the rollback
    eng.client_update(sid, p.WorkspaceMessage(3, p.UpdateModuleParams(
        mid, p.ModuleParams("Oscillator",
                            p.OscillatorParams(880.0, p.Waveform.SINE)))))
    assert eng.ws.modules[mid].params.params.freq == 880.0


def _drain_updates(events):
    ups = []
    while True:
        try:
            ev = events.get_nowait()
        except queue.Empty:
            return ups
        if isinstance(ev, UpdateEvent):
            ups.append(ev.update)


@pytest.mark.parametrize("opname", ["DeleteModule", "CreateConnection",
                                    "DeleteConnection"])
def test_failed_rebuild_broadcasts_no_su_ops(opname, monkeypatch):
    """If _rebuild throws mid-op, the server rolls back — so NO ServerUpdate
    may have been broadcast for that op, or every connected client's mirror
    would desync from the restored server state until reconnect (round-4
    advisor finding: DeleteModule/Create/DeleteConnection logged SU* ops
    before _rebuild)."""
    eng = Engine(cfg=CFG)  # direct-drive: commands run synchronously
    sid, state, events = eng.connect_session()
    eng.client_update(sid, p.WorkspaceMessage(1, p.CreateModule(
        p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
        p.WindowGeometry())))
    eng.client_update(sid, p.WorkspaceMessage(2, p.CreateModule(
        p.ModuleParams("Amplifier", p.AmplifierParams()),
        p.WindowGeometry())))
    osc, amp = p.ModuleId(1), p.ModuleId(2)
    inp = p.InputId(amp, 0)
    out = p.OutputId(osc, 1)  # stereo out -> stereo in
    eng.client_update(sid, p.WorkspaceMessage(3, p.CreateConnection(inp, out)))
    _drain_updates(events)  # discard setup broadcasts

    if opname == "DeleteModule":
        op = p.DeleteModule(osc)
    elif opname == "CreateConnection":
        # reconnect the same input from a fresh output (replaces existing)
        eng.client_update(sid, p.WorkspaceMessage(4, p.CreateModule(
            p.ModuleParams("Oscillator",
                           p.OscillatorParams(220.0, p.Waveform.SINE)),
            p.WindowGeometry())))
        _drain_updates(events)
        op = p.CreateConnection(inp, p.OutputId(p.ModuleId(3), 1))
    else:
        op = p.DeleteConnection(inp)

    pre_modules = dict(eng.ws.modules)
    pre_conns = dict(eng.ws.connections)

    def boom(full=False):
        raise RuntimeError("injected rebuild failure")

    monkeypatch.setattr(eng, "_rebuild", boom)
    eng.client_update(sid, p.WorkspaceMessage(9, op))
    monkeypatch.undo()

    assert _drain_updates(events) == []  # nothing broadcast for the failed op
    assert dict(eng.ws.modules).keys() == pre_modules.keys()
    assert dict(eng.ws.connections) == pre_conns
