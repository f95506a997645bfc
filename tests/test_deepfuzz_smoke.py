"""Continuously-enforced fuzz contract (VERDICT r4 ask #8).

tools/deepfuzz.py runs the typed-error contract at campaign scale (2,000
trials x ~20 targets, fresh seed per run); between campaigns the contract
could silently rot.  This smoke runs the SAME targets and mutation engine
at a bounded, fixed-seed budget inside the normal suite, so every
``pytest tests/`` re-proves: mutated/garbage/truncated bytes either parse
cleanly or raise that parser's typed error — never any other exception
class.

Budget: ~200 trials per target, one fixed master seed (deterministic CI;
the campaign tool keeps exploring fresh space).  Whole module target:
well under 60 s.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import deepfuzz  # noqa: E402  (tools/deepfuzz.py)

SMOKE_TRIALS = 200
MASTER_SEED = 0x5EED_F00D  # fixed: suite runs are reproducible

# target names pinned statically so collection stays cheap (build_targets
# encodes seed streams — x264, FLAC, MP4 — which must not run at import
# time for unrelated test selections); the fixture asserts the list is in
# sync with the tool
TARGET_NAMES = [
    "aac_raw", "aac_adts", "h264_pure_avcc", "h264_x264_annexb",
    "h264_annexb_cold", "h264_p_cavlc", "h264_p_cabac",
    "h264_b_cavlc", "h264_b_cabac", "h264_dcr",
    "flac_frame", "flac_streaminfo",
    "vorbis_stream", "mp3_splitter", "jpeg", "y4m", "wav_header",
    "mp4_reader", "amf0", "flv_packets", "wire_envelope", "http_request",
    "ws_frames", "rtmp_session", "session_dispatch",
]


@pytest.fixture(scope="module")
def targets():
    built = {t[0]: t for t in deepfuzz.build_targets()}
    assert sorted(built) == sorted(TARGET_NAMES), (
        "tools/deepfuzz.py targets changed; update TARGET_NAMES so the "
        "smoke keeps covering every target")
    return built


@pytest.mark.parametrize("name", TARGET_NAMES)
def test_typed_error_contract(name, targets):
    name, seeds, feed, allowed = targets[name]
    rng = np.random.default_rng((MASTER_SEED, hash(name) & 0xFFFFFFFF))
    findings = []
    for i in range(SMOKE_TRIALS):
        if seeds and rng.integers(0, 8) > 0:
            blob = deepfuzz._mutate(rng, seeds[int(rng.integers(0, len(seeds)))])
        else:
            blob = deepfuzz._mutate(rng, b"")
        try:
            feed(blob, rng)
        except allowed:
            pass
        except Exception as e:  # noqa: BLE001 - the contract under test
            path = f"/tmp/deepfuzz_smoke_{name}_{i}.bin"
            with open(path, "wb") as f:
                f.write(blob)
            findings.append(f"{name}[{i}]: {type(e).__name__}: "
                            f"{str(e)[:200]} (blob: {path})")
    assert not findings, "\n".join(findings)
