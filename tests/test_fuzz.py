"""Property-based tests (hypothesis): kernels vs f64 oracle, wire roundtrip."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import oracle
from util import run_module
from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import wire

CFG = EngineConfig(sample_rate=44_100)
BLOCK = BlockSpec(2)
S = BLOCK.n_samples(CFG)


# time params are either exactly 0 or >= 0.01 ms: device params are f32, and
# sub-f32-denormal values (e.g. 1e-111 ms) flip the attack-phase comparison
# relative to the f64 oracle — a quantization artifact, not a logic bug
_ms = st.one_of(st.just(0.0), st.floats(0.01, 50.0))


@settings(max_examples=15, deadline=None)
@given(
    attack=_ms,
    decay=st.floats(0.1, 100.0),
    sustain=st.floats(0.0, 1.0),
    release=st.floats(0.1, 50.0),
    gates=st.lists(
        st.tuples(st.integers(0, S - 1), st.sampled_from([0.0, 1.0, 0.5])),
        min_size=0,
        max_size=8,
    ),
)
def test_envelope_random_gates_match_oracle(attack, decay, sustain, release, gates):
    x = np.full(S, 0.25, dtype=np.float32)
    for pos, val in sorted(gates):
        x[pos:] = val
    params = p.EnvelopeParams(attack, decay, sustain, release)
    _, (got,), _ = run_module("Envelope", params, [x], cfg=CFG, block=BLOCK)
    want, _ = oracle.envelope(0, x, attack, decay, sustain, release, CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=3e-4)


@settings(max_examples=10, deadline=None)
@given(
    amplitude=st.floats(0.0, 2.0),
    mod_depth=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_amplifier_random_match_oracle(amplitude, mod_depth, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (S, 2)).astype(np.float32)
    m = rng.uniform(0, 1, S).astype(np.float32)
    params = p.AmplifierParams(amplitude=amplitude, mod_depth=mod_depth)
    _, (got,), _ = run_module("Amplifier", params, [x, m], cfg=CFG, block=BLOCK)
    want = oracle.amplifier(x, m, amplitude, mod_depth)
    np.testing.assert_allclose(got, want, atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(
    gain_lo=st.floats(-24.0, 24.0),
    gain_mid=st.floats(-24.0, 24.0),
    gain_hi=st.floats(-24.0, 24.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_eq_three_random_gains_match_oracle(gain_lo, gain_mid, gain_hi, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, S).astype(np.float32)
    params = p.EqThreeParams(p.Decibel(gain_lo), p.Decibel(gain_mid), p.Decibel(gain_hi))
    _, (got,), _ = run_module("EqThree", params, [x], cfg=CFG, block=BLOCK)
    want, _ = oracle.eq_three(x, gain_lo, gain_mid, gain_hi, CFG.sample_rate)
    # absolute tolerance scales with total gain
    scale = max(10 ** (g / 20) for g in (gain_lo, gain_mid, gain_hi))
    np.testing.assert_allclose(got, want, atol=3e-4 * max(scale, 1.0))


_waveforms = st.sampled_from(list(p.Waveform))
_gate = st.sampled_from(list(p.GateState))


@st.composite
def module_params(draw):
    kind = draw(st.sampled_from(sorted(p.ModuleParams.KINDS)))
    if kind == "Oscillator":
        params = p.OscillatorParams(draw(st.floats(1, 20000)), draw(_waveforms))
    elif kind == "Amplifier":
        params = p.AmplifierParams(draw(st.floats(0, 4)), draw(st.floats(0, 1)))
    elif kind == "Envelope":
        params = p.EnvelopeParams(
            draw(st.floats(0, 1000)), draw(st.floats(0, 1000)),
            draw(st.floats(0, 1)), draw(st.floats(0, 1000)),
        )
    elif kind == "EqThree":
        params = p.EqThreeParams(
            p.Decibel(draw(st.floats(-24, 24))),
            p.Decibel(draw(st.floats(-24, 24))),
            p.Decibel(draw(st.floats(-24, 24))),
        )
    elif kind == "FmSine":
        params = p.FmSineParams(draw(st.floats(1, 1000)), draw(st.floats(1, 1000)))
    elif kind == "Mixer":
        params = p.MixerParams(
            tuple(
                p.MixerChannelParams(
                    p.Decibel(draw(st.floats(-24, 12))),
                    draw(st.floats(0, 1)),
                    draw(st.booleans()),
                )
                for _ in range(draw(st.integers(0, 8)))
            )
        )
    elif kind == "Trigger":
        params = draw(_gate)
    elif kind == "StreamInput":
        params = p.StreamInputParams(
            draw(st.sampled_from([None, p.StreamProtocol.RTMP, p.StreamProtocol.ICECAST])),
            draw(st.one_of(st.none(), st.text(max_size=20))),
        )
    elif kind == "StreamOutput":
        params = p.StreamOutputParams(
            draw(st.integers(1, 100)), draw(st.integers(0, 100)),
            draw(st.integers(0, 100)), draw(st.text(max_size=30)),
            draw(st.text(max_size=30)),
        )
    elif kind == "VideoMixer":
        params = p.VideoMixerParams(
            draw(st.one_of(st.none(), st.integers(0, 3))),
            draw(st.one_of(st.none(), st.integers(0, 3))),
            draw(st.floats(0, 1)),
        )
    elif kind == "MediaSource":
        params = p.MediaSourceParams(
            draw(st.one_of(st.none(), st.builds(p.MediaId, st.integers(1, 1000))))
        )
    elif kind == "OutputDevice":
        params = p.OutputDeviceParams(
            draw(st.one_of(st.none(), st.text(max_size=10))),
            draw(st.one_of(st.none(), st.integers(0, 8))),
            draw(st.one_of(st.none(), st.integers(0, 8))),
        )
    else:
        params = None
    return p.ModuleParams(kind, params)


@settings(max_examples=50, deadline=None)
@given(mp=module_params(), seq=st.integers(1, 2**31), x=st.integers(-10000, 10000), y=st.integers(-10000, 10000))
def test_wire_roundtrip_fuzz(mp, seq, x, y):
    msg = p.WorkspaceMessage(
        sequence=seq,
        op=p.CreateModule(mp, p.WindowGeometry(p.Coords(x, y), abs(x) % 100)),
    )
    assert wire.loads(wire.dumps(msg)) == msg
