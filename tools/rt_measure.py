"""Realtime engine on the real TPU: achieved tick rate at several block
sizes, sequential vs pipelined dispatch."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("backend:", jax.default_backend(), flush=True)

import bench
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import Engine

CFG = EngineConfig(sample_rate=44_100)
results = []

for bt in (1, 4, 15, 60):
    ws, mon = bench.build_16_module_graph()
    eng = Engine(workspace=ws, cfg=CFG, block_ticks=bt, pipeline_depth=0)
    t0 = time.time()
    for _ in range(3):
        eng.tick_once()
    compile_s = time.time() - t0
    print(f"bt={bt}: warm in {compile_s:.1f}s", flush=True)

    # flat-out throughput (no pacing): upper bound on dispatch cadence
    for depth in (0, 1):
        eng.pipeline_depth = depth
        eng._inflight.clear()
        n_blocks = max(30, 120 // bt)
        t0 = time.time()
        for _ in range(n_blocks):
            eng.tick_once()
        eng.flush_inflight()
        dt = time.time() - t0
        per_block_ms = dt / n_blocks * 1000
        max_tps = n_blocks * bt / dt
        print(f"  flat-out depth={depth}: {per_block_ms:.2f} ms/block -> {max_tps:.0f} ticks/s", flush=True)
        results.append({"block_ticks": bt, "mode": "flatout", "depth": depth,
                        "ms_per_block": round(per_block_ms, 2),
                        "max_ticks_per_s": round(max_tps, 1)})

    # paced realtime loop for 12 s at the best depth
    for depth in (0, 1):
        eng.pipeline_depth = depth
        eng._inflight.clear()
        eng.tick = 0
        eng.start()
        time.sleep(12.0)
        ticks = eng.tick
        perf = eng.performance_info()
        eng.stop()
        eng._thread = None
        eng._stop.clear()
        rate = ticks / 12.0
        rt = perf.realtime if perf else None
        tick_us = perf.tick_time.value if perf and hasattr(perf, "tick_time") else None
        print(f"  realtime depth={depth}: {rate:.1f} ticks/s (target 60), realtime_flag={rt}", flush=True)
        results.append({"block_ticks": bt, "mode": "paced12s", "depth": depth,
                        "ticks_per_s": round(rate, 1), "realtime_flag": bool(rt)})
    # tear down codec threads
    for pl in eng._monitor_pipelines.values():
        pl.stop()

print(json.dumps(results))
