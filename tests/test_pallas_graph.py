"""Whole-graph Pallas lowering (engine/pallas_graph.py) equivalence tests.

The mega program must be a drop-in replacement for the regular compiled
patch: identical tap/state pytree STRUCTURE and matching values over
multi-block renders, including the scalar state that threads across the
kernel's sequential VMEM launches (eq poles + delay history).

Runs in Pallas interpret mode on the CPU test mesh; the on-chip validation
of the same program is part of the verify recipe (tools/smoke_mega.py).
"""

import jax
import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine import pallas_graph
from mixlab_tpu.engine.compiler import compile_patch
from mixlab_tpu.engine.config import BlockSpec, EngineConfig
from mixlab_tpu.engine.graph import Workspace
from mixlab_tpu.protocol import InputId, OutputId

CFG = EngineConfig(sample_rate=48_000)


def _flagship():
    import bench

    return bench.build_16_module_graph()[0]


def _sink_zoo():
    """eq-seeded graph exercising every sink kind + external feeds."""
    ws = Workspace()
    osc = ws.create_module(
        p.ModuleParams("Oscillator", p.OscillatorParams(220.0, p.Waveform.SAW)))
    si = ws.create_module(
        p.ModuleParams("StreamInput", p.StreamInputParams()))
    eq = ws.create_module(
        p.ModuleParams("EqThree",
                       p.EqThreeParams(p.Decibel(3.0), p.Decibel(-2.0),
                                       p.Decibel(1.0))))
    mix = ws.create_module(
        p.ModuleParams("Mixer", p.MixerParams.with_channels(2)))
    out = ws.create_module(p.ModuleParams("OutputDevice", None))
    plot = ws.create_module(p.ModuleParams("Plotter", None))
    so = ws.create_module(
        p.ModuleParams("StreamOutput", p.StreamOutputParams()))
    ws.connect(InputId(eq, 0), OutputId(osc, 0))
    ws.connect(InputId(mix, 0), OutputId(si, 1))
    # mono eq out -> stereo mixer input is not wireable; pan it
    pan = ws.create_module(p.ModuleParams("StereoPanner", None))
    ws.connect(InputId(pan, 0), OutputId(eq, 0))
    ws.connect(InputId(pan, 1), OutputId(eq, 0))
    ws.connect(InputId(mix, 1), OutputId(pan, 0))
    ws.connect(InputId(out, 0), OutputId(mix, 0))
    ws.connect(InputId(plot, 0), OutputId(mix, 0))
    ws.connect(InputId(so, 1), OutputId(mix, 1))
    return ws, si


def _run(patch, ws, n_blocks, ext_feeds=None):
    aux = patch.prepare_aux(ws)
    state = patch.init_state(ws)
    spb = patch.block.n_samples(patch.cfg)
    taps_out = []
    for i in range(n_blocks):
        ha = patch.host_aux(i * spb, ext_feeds=(ext_feeds or {}).get(i))
        state, taps = patch.run(aux, ha, state)
        taps_out.append(taps)
    return state, taps_out


def _assert_tree_close(a, b, atol, what):
    la = jax.tree.leaves_with_path(a)
    lb = jax.tree.leaves_with_path(b)
    assert [str(k) for k, _ in la] == [str(k) for k, _ in lb], what
    for (k, va), (_, vb) in zip(la, lb):
        assert np.asarray(va).dtype == np.asarray(vb).dtype, (what, k)
        np.testing.assert_allclose(
            np.asarray(va, np.float64), np.asarray(vb, np.float64),
            rtol=0, atol=atol, err_msg=f"{what} {k}")


def _compare(ws, block_ticks, n_blocks=3, atol=2e-5, ext_feeds=None):
    block = BlockSpec(block_ticks)
    pr = compile_patch(ws, CFG, block, mega=False)
    pm = compile_patch(ws, CFG, block, mega=True)
    assert pm._mega and not pr._mega
    sr, tr = _run(pr, ws, n_blocks, ext_feeds)
    sm, tm = _run(pm, ws, n_blocks, ext_feeds)
    _assert_tree_close(sr, sm, atol, "state")
    for i, (a, b) in enumerate(zip(tr, tm)):
        _assert_tree_close(a, b, atol, f"taps[{i}]")


def test_flagship_single_launch():
    _compare(_flagship(), block_ticks=64)  # 51200 samples, one launch


def test_flagship_multi_launch_state_threading(monkeypatch):
    monkeypatch.setattr(pallas_graph, "MAX_LAUNCH_S", 16384)
    _compare(_flagship(), block_ticks=64)  # 4 sequential launches


def test_sink_zoo_with_external_feeds():
    ws, si = _sink_zoo()
    rng = np.random.default_rng(7)
    spb = BlockSpec(64).n_samples(CFG)
    feeds = {
        i: {str(si.value): {
            "pcm": (rng.integers(-32768, 32767, (2, spb))
                    .astype(np.int16))}}
        for i in range(3)
    }
    _compare(ws, block_ticks=64, ext_feeds=feeds)


def test_clip_tap_is_bool():
    ws, _ = _sink_zoo()
    block = BlockSpec(64)
    pm = compile_patch(ws, CFG, block, mega=True)
    _, taps = _run(pm, ws, 1)
    clips = [v["clip"] for v in taps[0].values() if "clip" in v]
    assert clips and np.asarray(clips[0]).dtype == np.bool_


def test_disengages_without_eq():
    import bench

    ws, _ = bench.build_config2_graph()
    assert pallas_graph.build_mega_program(ws, CFG, BlockSpec(64)) is None


def test_disengages_on_small_or_unaligned_block():
    ws = _flagship()
    # 4 ticks * 800 spt = 3200 samples < MIN_S -> realtime blocks keep the
    # proven per-block path
    assert pallas_graph.build_mega_program(ws, CFG, BlockSpec(4)) is None
    # 13 ticks = 10400 samples >= MIN_S but not a whole chunk count
    assert pallas_graph.build_mega_program(ws, CFG, BlockSpec(13)) is None
    # 60 ticks = 48000 samples = 375 chunks: engages
    assert pallas_graph.build_mega_program(ws, CFG, BlockSpec(60)) is not None


def test_forced_mega_raises_when_unqualified():
    import bench

    ws, _ = bench.build_config2_graph()
    with pytest.raises(ValueError):
        compile_patch(ws, CFG, BlockSpec(64), mega=True)


def test_region_covers_expected_modules():
    """On the flagship: prelude = trigger + envelope + oscillators + fm,
    region = everything else (amps absorbed, sources not)."""
    ws = _flagship()
    order = ws.run_order()
    entries = {m: ws.modules[m] for m in order}
    sel = pallas_graph._select_region(
        order, entries, dict(ws.connections), CFG, BlockSpec(64))
    assert sel is not None
    region, _ = sel
    kinds_in = sorted(entries[m].params.kind for m in region)
    assert "EqThree" in kinds_in and "Mixer" in kinds_in
    kinds_out = sorted(
        entries[m].params.kind for m in order if m not in region)
    assert kinds_out == ["Envelope", "FmSine", "Oscillator", "Oscillator",
                         "Oscillator", "Oscillator", "Trigger"]
    # amplifiers were absorbed
    assert kinds_in.count("Amplifier") == 4
