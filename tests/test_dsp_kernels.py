"""Per-kernel tests vs the float64 oracle (reference semantics)."""

import numpy as np
import pytest

import oracle
from util import run_module as _run_module
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.protocol import (
    AmplifierParams,
    Decibel,
    EqThreeParams,
    FmSineParams,
    GateState,
    MixerChannelParams,
    MixerParams,
    OscillatorParams,
    Waveform,
)

CFG = EngineConfig(sample_rate=44_100)
BLOCK = BlockSpec(n_ticks=4)
S = BLOCK.n_samples(CFG)


def run_module(kind, params, inputs, t0=0, cfg=CFG, block=BLOCK, state=None):
    return _run_module(kind, params, inputs, t0=t0, cfg=cfg, block=block, state=state)


@pytest.mark.parametrize(
    "waveform,name",
    [
        (Waveform.SINE, "sine"),
        (Waveform.SQUARE, "square"),
        (Waveform.SAW, "saw"),
        (Waveform.TRIANGLE, "triangle"),
        (Waveform.ON, "on"),
        (Waveform.OFF, "off"),
    ],
)
def test_oscillator_waveforms(waveform, name):
    freq = 440.0
    params = OscillatorParams(freq=freq, waveform=waveform)
    _, (mono, stereo), _ = run_module("Oscillator", params, [])
    want = oracle.oscillator(0, S, freq, name, CFG.sample_rate)
    tol = 5e-5 if name in ("sine", "saw", "triangle") else 0.0
    if name == "square":
        # f32 phase rounding can flip the sign at zero crossings; allow a
        # tiny fraction of flipped samples
        assert np.mean(mono != want) < 2e-3
    else:
        np.testing.assert_allclose(mono, want, atol=tol)
    np.testing.assert_array_equal(stereo[:, 0], mono)
    np.testing.assert_array_equal(stereo[:, 1], mono)


def test_oscillator_large_t_precision():
    # 1 hour in: host-side f64 tick bases keep the phase exact
    freq = 440.0
    t0 = CFG.sample_rate * 3600
    t0 -= t0 % CFG.samples_per_tick
    params = OscillatorParams(freq=freq, waveform=Waveform.SINE)
    _, (mono, _), _ = run_module("Oscillator", params, [], t0=t0)
    want = oracle.oscillator(t0, S, freq, "sine", CFG.sample_rate)
    np.testing.assert_allclose(mono, want, atol=2e-4)


def test_fm_sine():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, S).astype(np.float32)
    params = FmSineParams(freq_lo=90.0, freq_hi=110.0)
    _, (stereo,), _ = run_module("FmSine", params, [x])
    want = oracle.fm_sine(0, x, 90.0, 110.0, CFG.sample_rate)
    np.testing.assert_allclose(stereo[:, 0], want, atol=2e-3)


def test_amplifier_with_mod():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (S, 2)).astype(np.float32)
    m = rng.uniform(0, 1, S).astype(np.float32)
    params = AmplifierParams(amplitude=0.7, mod_depth=0.5)
    _, (out,), _ = run_module("Amplifier", params, [x, m])
    want = oracle.amplifier(x, m, 0.7, 0.5)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_amplifier_unconnected_mod_is_unity_depth():
    x = np.ones((S, 2), dtype=np.float32)
    params = AmplifierParams(amplitude=1.0, mod_depth=0.9)
    _, (out,), _ = run_module("Amplifier", params, [x, None])
    np.testing.assert_array_equal(out, x)


def test_mixer():
    rng = np.random.default_rng(2)
    xs = [rng.uniform(-1, 1, (S, 2)).astype(np.float32) for _ in range(4)]
    xs[2] = None  # unconnected channel reads zeros
    params = MixerParams(
        (
            MixerChannelParams(Decibel(3.0), 0.8, True),
            MixerChannelParams(Decibel(-6.0), 1.0, False),
            MixerChannelParams(Decibel(0.0), 0.5, True),
            MixerChannelParams(Decibel(0.0), 0.0, False),
        )
    )
    _, (master, cue), _ = run_module("Mixer", params, xs)
    want_master, want_cue = oracle.mixer(
        xs, [3.0, -6.0, 0.0, 0.0], [0.8, 1.0, 0.5, 0.0], [True, False, True, False]
    )
    np.testing.assert_allclose(master, want_master, atol=1e-5)
    np.testing.assert_allclose(cue, want_cue, atol=1e-6)


def test_panner_splitter_roundtrip():
    rng = np.random.default_rng(3)
    left = rng.uniform(-1, 1, S).astype(np.float32)
    right = rng.uniform(-1, 1, S).astype(np.float32)
    _, (stereo,), _ = run_module("StereoPanner", None, [left, right])
    np.testing.assert_array_equal(stereo[:, 0], left)
    np.testing.assert_array_equal(stereo[:, 1], right)
    _, (l2, r2), _ = run_module("StereoSplitter", None, [stereo])
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)


def test_trigger():
    _, (out,), _ = run_module("Trigger", GateState.OPEN, [])
    np.testing.assert_array_equal(out, np.ones(S, dtype=np.float32))
    _, (out,), _ = run_module("Trigger", GateState.CLOSED, [])
    np.testing.assert_array_equal(out, np.zeros(S, dtype=np.float32))


def test_eq_three_vs_oracle_multiblock():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, 3 * S).astype(np.float32)
    params = EqThreeParams(Decibel(4.0), Decibel(-2.0), Decibel(4.0))
    state = None
    outs = []
    for b in range(3):
        state, (o,), _ = run_module(
            "EqThree", params, [x[b * S : (b + 1) * S]], state=state
        )
        outs.append(o)
    got = np.concatenate(outs)
    want, _ = oracle.eq_three(x, 4.0, -2.0, 4.0, CFG.sample_rate)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_resampler_tone():
    from mixlab_tpu.dsp.resampler import context_len, resample_block

    src, dst = 44100, 48000
    freq = 1000.0
    n_in = 735 * 40  # 40 ticks
    t = np.arange(n_in) / src
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    ctx = np.zeros(context_len(src, dst), dtype=np.float32)
    y, _ = resample_block(x, ctx, src, dst)
    assert y.shape[0] == 800 * 40
    # compare against the ideal resampled tone away from edges, modulo the
    # filter group delay ((N-1)/2 upsampled taps = (J-1)/2 / src seconds)
    J = 32
    delay = (J * (dst // math_gcd(src, dst)) - 1) / 2 / (src * (dst // math_gcd(src, dst)))
    ty = np.arange(y.shape[0]) / dst - delay
    want = np.sin(2 * np.pi * freq * ty)
    seg = slice(2000, y.shape[0] - 2000)
    err = np.abs(y[seg] - want[seg]).max()
    assert err < 1e-3, err


def math_gcd(a, b):
    import math

    return math.gcd(a, b)


def test_linrec_blocked_matches_scan():
    import jax.numpy as jnp

    from mixlab_tpu.dsp.eq_three import _linrec_blocked, _linrec_scan

    rng = np.random.default_rng(11)
    for S in (735 * 2, 256 * 6, 735 * 60):
        b = jnp.asarray(rng.uniform(-1, 1, (S, 2)).astype(np.float32))
        y0 = jnp.asarray([0.3, -0.2], dtype=jnp.float32)
        a = (0.94, 0.66)
        ys = np.asarray(_linrec_scan(jnp.asarray(a, jnp.float32), b, y0))
        yb = np.asarray(_linrec_blocked(a, b, y0))
        np.testing.assert_allclose(ys, yb, atol=3e-5), S
