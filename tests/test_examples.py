"""The shipped examples stay runnable (they double as API documentation)."""

import sys
from pathlib import Path

import numpy as np

EXAMPLES = Path(__file__).parent.parent / "examples"


def test_synth_patch_example(tmp_path):
    sys.path.insert(0, str(EXAMPLES))
    try:
        import synth_patch
    finally:
        sys.path.pop(0)
    out = tmp_path / "demo.wav"
    assert synth_patch.main([str(out), "--seconds", "0.5"]) == 0
    from mixlab_tpu.io_host.wav import decode_frames, parse_header

    blob = out.read_bytes()
    fmt, off, size = parse_header(blob[:64])
    assert fmt.sample_rate == 48_000 and fmt.channels == 2
    frames = decode_frames(fmt, blob[off : off + size])
    assert len(frames) == 24_000
    assert np.abs(frames).max() > 1000  # audible, not silence


def test_fleet_demo_example_importable():
    sys.path.insert(0, str(EXAMPLES))
    try:
        import fleet_demo  # noqa: F401  (full run covered by test_fleet_controller)
    finally:
        sys.path.pop(0)
    assert callable(fleet_demo.main)
