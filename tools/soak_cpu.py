#!/usr/bin/env python
"""CPU soak: sustained engine run under an edit storm with a live monitor.

Creates/deletes/reconnects modules every ~100 ms for the requested duration
while ticking the engine and draining the monitor pipe — catching compile
churn leaks, thread leaks, and unbounded queue growth that short tests
miss.  Prints RSS and thread-count samples; exits nonzero on failure.

Run: JAX_PLATFORMS=cpu python tools/soak_cpu.py [seconds]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mixlab_tpu import protocol as p
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.engine import Engine

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    cfg = EngineConfig(sample_rate=44_100)
    eng = Engine(cfg=cfg)
    sid, _, _ = eng.connect_session()
    seq = 0

    def nxt():
        nonlocal seq
        seq += 1
        return seq

    # stable core: osc -> monitor
    eng.update(sid, p.WorkspaceMessage(nxt(), p.CreateModule(
        p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SINE)),
        p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(nxt(), p.CreateModule(
        p.ModuleParams("Monitor", None), p.WindowGeometry())))
    eng.update(sid, p.WorkspaceMessage(nxt(), p.CreateConnection(
        p.InputId(p.ModuleId(2), 1), p.OutputId(p.ModuleId(1), 1))))

    churn_ids: list = []
    rng = np.random.default_rng(0)
    stop = threading.Event()
    errors: list = []

    def storm():
        from mixlab_tpu.engine.engine import Busy

        # ids are assigned sequentially by the engine's module_seq; the
        # storm is the only creator after the 2-module core, so it can
        # track its own counter instead of reading the live (engine-owned)
        # workspace — and deletes are FIFO-ordered behind their creates
        next_id = 2
        try:
            while not stop.is_set():
                try:
                    if len(churn_ids) < 6 or (len(churn_ids) < 12
                                              and rng.random() < 0.5):
                        eng.update(sid, p.WorkspaceMessage(
                            nxt(), p.CreateModule(
                                p.ModuleParams("Amplifier",
                                               p.AmplifierParams(0.5, 1.0)),
                                p.WindowGeometry())))
                        next_id += 1
                        churn_ids.append(next_id)
                    elif churn_ids:
                        victim = churn_ids.pop(
                            rng.integers(0, len(churn_ids)))
                        eng.update(sid, p.WorkspaceMessage(
                            nxt(), p.DeleteModule(p.ModuleId(victim))))
                except Busy:
                    time.sleep(0.2)  # queue full: expected backpressure
                time.sleep(0.1)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    # PRODUCTION mode: the engine thread owns the workspace; update()
    # only enqueues (direct-drive mode would process edits on the storm
    # thread, racing the tick — a harness error, not a supported mode)
    eng.start()
    t = threading.Thread(target=storm, daemon=True)
    t.start()

    t0 = time.time()
    rss0 = None
    sample = 0
    last_tick = -1
    stalls = 0
    while time.time() - t0 < seconds:
        time.sleep(5.0)
        sample += 1
        # a frozen tick counter = dead/stuck engine thread: that is THE
        # failure this soak exists to catch (round 4: an adopt-patch
        # KeyError killed the thread and the soak still said OK)
        if eng.tick == last_tick:
            stalls += 1
            if stalls >= 3 or not any(
                th.name == "engine" and th.is_alive()
                for th in threading.enumerate()
            ):
                raise SystemExit(
                    f"engine stalled at tick {eng.tick} "
                    f"(thread alive: {any(th.name == 'engine' and th.is_alive() for th in threading.enumerate())})"
                )
        else:
            stalls = 0
        last_tick = eng.tick
        pipe = eng.monitor_pipe(p.ModuleId(2))
        if pipe is not None:
            while True:
                try:
                    pipe.q.get_nowait()
                except Exception:
                    break
        if rss0 is None:
            rss0 = rss_mb()
        perf = eng.performance_info()
        print(f"t={time.time()-t0:6.1f}s tick={eng.tick} "
              f"rss={rss_mb():.1f} MB threads={threading.active_count()} "
              f"modules={len(eng.ws.modules)} "
              f"realtime={perf.realtime if perf else None}", flush=True)
    stop.set()
    t.join(timeout=5)
    ticks = eng.tick
    eng.stop()
    rss1 = rss_mb()
    print(f"done: {ticks} ticks, rss {rss0:.1f} -> {rss1:.1f} MB, "
          f"threads={threading.active_count()}, errors={len(errors)}")
    if errors:
        raise SystemExit(f"storm errors: {errors[:3]}")
    # growth bound: compile caches legitimately grow early; runaway leaks
    # blow far past this
    if rss0 and rss1 > rss0 * 1.8 + 500:
        raise SystemExit(f"RSS grew suspiciously: {rss0} -> {rss1} MB")
    print("SOAK OK")


if __name__ == "__main__":
    main()
