"""Offline render CLI.

``python -m mixlab_tpu.render_cli project.mixlab out.wav --seconds 10``

Loads the workspace from a project file, renders the patch offline with the
scanned (single-dispatch) renderer, and writes the first Monitor module's
audio to a WAV file.  A capability the reference lacks entirely — it can
only run in realtime.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(prog="mixlab_tpu.render_cli")
    parser.add_argument("project", help="project file (.mixlab)")
    parser.add_argument("output", help="output WAV path")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--sample-rate", type=int, default=None,
                        help="override engine sample rate")
    parser.add_argument("--block-ticks", type=int, default=60)
    args = parser.parse_args()

    from mixlab_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.graph import Workspace
    from mixlab_tpu.engine.project import ProjectBase
    from mixlab_tpu.engine.scan_render import render_scanned
    from mixlab_tpu.io_host.wav import write_wav

    base = ProjectBase(args.project)
    saved = base.read_workspace()
    if saved is None:
        raise SystemExit("project has no workspace")
    ws = Workspace.from_persist(saved)

    monitors = [
        mid for mid, e in ws.modules.items() if e.params.kind == "Monitor"
    ]
    if not monitors:
        raise SystemExit("no Monitor module in the patch")
    mon = monitors[0]

    cfg = EngineConfig(sample_rate=args.sample_rate or 44_100)
    tps = cfg.ticks_per_second
    n_ticks = int(args.seconds * tps)
    n_ticks -= n_ticks % args.block_ticks
    if n_ticks == 0:
        n_ticks = args.block_ticks

    print(f"rendering {n_ticks} ticks ({n_ticks / tps:.1f}s) at {cfg.sample_rate} Hz ...")
    patch, (state, taps) = render_scanned(
        ws, n_ticks, cfg, block_ticks=args.block_ticks
    )
    from mixlab_tpu.dsp.base import interleave_tap

    audio = interleave_tap(taps[str(mon.value)]["audio"]).reshape(-1, 2)
    write_wav(args.output, cfg.sample_rate, audio)
    peak = float(np.abs(audio).max())
    print(f"wrote {args.output}: {audio.shape[0]} frames, peak {peak:.3f}")


if __name__ == "__main__":
    main()
