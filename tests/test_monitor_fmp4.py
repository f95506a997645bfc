"""Monitor fmp4 pipeline with injected mock encoders (no ffmpeg needed)."""

import queue
import struct

import numpy as np

from mixlab_tpu.av import aac, avc
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.engine import _MonitorPipe
from mixlab_tpu.server.monitor import MonitorPipeline
from mixlab_tpu.video.frame import Picture

CFG = EngineConfig(sample_rate=44_100)


class MockAac:
    def __init__(self):
        self.fed = 0
        self.asc = aac.AudioSpecificConfiguration.lc_stereo(44100)

    def feed(self, pcm):
        self.fed += len(pcm)

    def poll_frames(self):
        # one synthetic ADTS frame per poll once fed
        if self.fed >= 2048:
            self.fed -= 2048
            return [aac.adts_frame(b"\xde\xad", self.asc)]
        return []


class MockH264:
    def __init__(self):
        self.dcr = avc.DecoderConfigurationRecord(
            1, 0x64, 0, 0x1F, 4,
            [avc.NalUnit(3, avc.UnitType.SEQUENCE_PARAMETER_SET, b"\x64\x00\x1f")],
            [avc.NalUnit(3, avc.UnitType.PICTURE_PARAMETER_SET, b"\xee")],
        ).to_bytes()
        self._pending = []

    def feed(self, pic):
        idr = avc.NalUnit(3, avc.UnitType.IDR_PICTURE, b"\x88" * 8)
        self._pending.append((True, avc.write_nal_units([idr])))

    def poll_access_units(self):
        out, self._pending = self._pending, []
        return out


def test_fmp4_monitor_emits_init_then_segments():
    pipe = _MonitorPipe()
    pipeline = MonitorPipeline(pipe, CFG, mode="fmp4", encoders=(MockAac(), MockH264()))
    sub = pipeline.broadcast.subscribe()

    spt = CFG.samples_per_tick
    audio = np.zeros((spt, 2), dtype=np.float32)
    packets = []
    for k in range(12):
        pipeline._encode_tick_fmp4(k * spt, audio, None)
    while True:
        try:
            packets.append(sub.get_nowait())
        except queue.Empty:
            break
    pipeline.stop()

    assert packets, "no packets emitted"
    header, _, init_payload = packets[0].partition(b"\n")
    assert b'"fmp4"' in header
    assert init_payload[4:8] == b"ftyp"
    # subsequent packets are moof/mdat media segments
    segs = [p for p in packets[1:] if b'"segment"' in p.partition(b"\n")[0]]
    assert segs, "no media segments"
    for s in segs:
        _, _, payload = s.partition(b"\n")
        assert payload[4:8] == b"moof"
        (moof_size,) = struct.unpack_from(">I", payload, 0)
        assert payload[moof_size + 4 : moof_size + 8] == b"mdat"
