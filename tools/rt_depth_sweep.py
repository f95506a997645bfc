"""Issue-ahead depth sweep for live latency (VERDICT r2 item 10).

Question: can block_ticks 2-3 sustain 60 ticks/s through the ~45 ms
tunnel RTT when the engine issues ahead (pipeline_depth > 1), cutting
live latency from 67 ms (block 4) toward 33 ms?  Dispatch N+k is issued
while block N's fetch is still in flight, so the fetch RTT amortizes
across the pipeline depth.

Writes REALTIME_TPU_r03.json-style rows: paced tick rate for every
(block_ticks, pipeline_depth) pair.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

import bench  # noqa: E402
from mixlab_tpu.engine.config import EngineConfig  # noqa: E402
from mixlab_tpu.engine.engine import Engine  # noqa: E402

CFG = EngineConfig(sample_rate=44_100)
SECONDS = 12.0
results = []

for bt in (1, 2, 3, 4):
    ws, _mon = bench.build_16_module_graph()
    eng = Engine(workspace=ws, cfg=CFG, block_ticks=bt, pipeline_depth=0)
    t0 = time.time()
    for _ in range(3):
        eng.tick_once()  # compile + warm on this (main) thread
    eng.flush_inflight()
    print(f"bt={bt}: warm in {time.time() - t0:.1f}s", flush=True)

    for depth in (0, 1, 2, 3):
        eng.pipeline_depth = depth
        eng._inflight.clear()
        eng.tick = 0
        eng.start()
        time.sleep(SECONDS)
        ticks = eng.tick
        perf = eng.performance_info()
        eng.stop()
        eng._thread = None
        eng._stop.clear()
        rate = ticks / SECONDS
        rt = bool(perf.realtime) if perf else None
        latency_ms = round(bt * 1000.0 / 60.0 * (1 + depth), 1)
        print(
            f"  bt={bt} depth={depth}: {rate:.1f} ticks/s "
            f"(target 60), realtime={rt}, issue-ahead latency "
            f"~{latency_ms} ms",
            flush=True,
        )
        results.append({
            "block_ticks": bt,
            "depth": depth,
            "ticks_per_s": round(rate, 1),
            "realtime_flag": rt,
            "nominal_latency_ms": latency_ms,
        })
    for pl in eng._monitor_pipelines.values():
        pl.stop()

print(json.dumps(results))
with open("/root/repo/REALTIME_TPU_r03.json", "w") as f:
    json.dump({"sweep": results, "note": (
        "paced Engine.start() tick rates on the real chip across "
        "(block_ticks, pipeline_depth); nominal latency = block duration x "
        "(1 + depth) — issue-ahead hides the tunnel RTT at the cost of "
        "depth blocks of output latency"
    )}, f, indent=1)
print("wrote REALTIME_TPU_r03.json", flush=True)
