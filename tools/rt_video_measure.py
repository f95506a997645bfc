"""Realtime engine WITH VIDEO on the real TPU: flagship audio graph plus a
two-source video_mixer composite, paced at 60 Hz."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("backend:", jax.default_backend(), flush=True)

import jax.numpy as jnp
import bench
from mixlab_tpu import protocol as p
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine
from mixlab_tpu.video.frame import Picture, PictureSettings, VideoFrame
from mixlab_tpu.utils.mtime import MediaDuration

CFG = EngineConfig(sample_rate=44_100)
rng = np.random.default_rng(0)

ws, mon = bench.build_16_module_graph()
# add a video mixer fed by two synthetic sources via stream-input feeds? The
# engine's video inputs come from StreamInput/MediaSource feeds; emulate the
# realtime video load by injecting frames into a video mixer every tick via
# the host pass: create VideoMixer + Monitor video connection.
vm = ws.create_module(p.ModuleParams("VideoMixer", p.VideoMixerParams(a=0, b=1, fader=0.5)))
ws.connect(p.InputId(mon, 0), p.OutputId(vm, 0))

def mkframe(w, h):
    return VideoFrame(picture=Picture(PictureSettings(w, h), {
        "y": jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8)),
        "u": jnp.asarray(rng.integers(0, 256, (h//2, w//2), dtype=np.uint8)),
        "v": jnp.asarray(rng.integers(0, 256, (h//2, w//2), dtype=np.uint8))}),
        duration_hint=MediaDuration.new(1, 30))

f720 = mkframe(1280, 720)
f540 = mkframe(960, 540)

for bt in (4, 15):
    eng = Engine(workspace=ws, cfg=CFG, block_ticks=bt, pipeline_depth=0)
    # monkeypatch the video input resolution: feed synthetic frames into the
    # mixer inputs each tick (stands in for two live StreamInput sources)
    orig = eng._video_input
    def vin(mid, idx, buffers, _orig=orig):
        if mid == vm and idx in (0, 1):
            return f720 if idx == 0 else f540
        return _orig(mid, idx, buffers)
    eng._video_input = vin

    for _ in range(3):
        eng.tick_once()
    # flat-out
    n_blocks = max(30, 240 // bt)
    t0 = time.time()
    for _ in range(n_blocks):
        eng.tick_once()
    dt = time.time() - t0
    print(f"bt={bt}: flat-out {dt/n_blocks*1e3:.1f} ms/block -> {n_blocks*bt/dt:.0f} ticks/s", flush=True)

    # paced 12 s
    eng.tick = 0
    eng.start()
    time.sleep(12.0)
    ticks = eng.tick
    perf = eng.performance_info()
    eng.stop()
    print(f"bt={bt}: paced {ticks/12.0:.1f} ticks/s realtime={perf.realtime if perf else None}", flush=True)
