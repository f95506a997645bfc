"""MediaSource decode thread.

Rebuild of ``src/module/media_source.rs:140-292``: a decode thread opens the
media blob stream from the project database, decodes ahead of the engine
through a bounded queue (sync_channel(2) analogue), is realtime-throttled,
and loops by seeking back to the start on EOF (epoch accumulation,
media_source.rs:246-292).

Codec note (documented): the reference decodes any ffmpeg-supported media;
this build natively decodes WAV (io_host/wav.py) and Ogg/Vorbis
(av/vorbis.py, the pure decoder), resampling to the engine rate on the
decode thread, with other formats gated on the ffmpeg backend.
The reference's media_source emits only video (media_source.rs:52-55); this
build adds an audio output — WAV playback would otherwise be silent — as a
documented extension.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

import numpy as np

from mixlab_tpu.dsp.resampler import context_len, design, resample_block_np
from mixlab_tpu.engine.config import EngineConfig
from mixlab_tpu.engine.feeds import MediaSourceFeed
from mixlab_tpu.io_host.throttle import AudioThrottle
from mixlab_tpu.io_host.wav import WavError, decode_frames, parse_header

log = logging.getLogger(__name__)

DECODE_CHUNK_FRAMES = 4096


class MediaPlayer(threading.Thread):
    """Decode thread feeding a MediaSourceFeed."""

    def __init__(self, stream, feed: MediaSourceFeed, cfg: EngineConfig):
        super().__init__(daemon=True, name="media-decode")
        self.stream = stream  # seekable reader (project ReadStream)
        self.feed = feed
        self.cfg = cfg
        self._stop = threading.Event()

    def stop(self):
        self._stop.set()

    def run(self):
        header = self.stream.read(64 * 1024)
        if header[:4] == b"OggS":
            self._run_ogg()
            return
        try:
            fmt, data_off, data_size = parse_header(header)
        except WavError as e:
            log.warning("media_source: cannot decode media: %s", e)
            return

        throttle = AudioThrottle(fmt.sample_rate)
        resample_ctx = None
        bpf = fmt.bytes_per_frame
        L, M, _ = design(fmt.sample_rate, self.cfg.sample_rate)

        while not self._stop.is_set():
            # (re)start from the beginning of the data chunk: loop semantics
            self.stream.seek(data_off)
            remaining = data_size
            carry = np.zeros((0, 2), dtype=np.int16)
            while remaining > 0 and not self._stop.is_set():
                n = min(DECODE_CHUNK_FRAMES * bpf, remaining)
                raw = self.stream.read(n - (n % bpf) or bpf)
                if not raw:
                    break
                remaining -= len(raw)
                frames = decode_frames(fmt, raw)
                throttle.send_samples(len(frames))
                if fmt.sample_rate != self.cfg.sample_rate:
                    buf = np.concatenate([carry, frames])
                    usable = len(buf) - (len(buf) % M)
                    carry = buf[usable:]
                    if usable == 0:
                        continue
                    if resample_ctx is None:
                        resample_ctx = np.zeros(
                            (context_len(fmt.sample_rate, self.cfg.sample_rate), 2),
                            dtype=np.float32,
                        )
                    out, resample_ctx = resample_block_np(
                        buf[:usable].astype(np.float32) / 32768.0,
                        resample_ctx,
                        fmt.sample_rate,
                        self.cfg.sample_rate,
                    )
                else:
                    out = frames.astype(np.float32) / 32768.0
                # bounded put paces decode against engine consumption
                while not self._stop.is_set():
                    if self.feed.push_block(out, block=True, timeout=0.25):
                        break

    def _run_ogg(self):
        """Ogg/Vorbis playback loop via the pure decoder (av/vorbis.py)."""
        from mixlab_tpu.av.vorbis import OggVorbisStream

        while not self._stop.is_set():
            self.stream.seek(0)
            dec = OggVorbisStream()
            throttle = None
            resample_ctx = None
            carry = np.zeros((0, 2), dtype=np.float32)
            got_any = False
            while not self._stop.is_set():
                raw = self.stream.read(16384)
                if not raw:
                    break
                try:
                    pcm = dec.feed(raw)
                except Exception as e:
                    log.warning("media_source: vorbis decode failed: %s", e)
                    return
                info = dec.info
                if info is None or len(pcm) == 0:
                    continue
                got_any = True
                if throttle is None:
                    throttle = AudioThrottle(info.sample_rate)
                    _, M, _ = design(info.sample_rate, self.cfg.sample_rate)
                if pcm.shape[1] == 1:
                    pcm = np.repeat(pcm, 2, axis=1)
                pcm = pcm[:, :2]
                throttle.send_samples(len(pcm))
                if info.sample_rate != self.cfg.sample_rate:
                    buf = np.concatenate([carry, pcm])
                    usable = len(buf) - (len(buf) % M)
                    carry = buf[usable:]
                    if usable == 0:
                        continue
                    if resample_ctx is None:
                        resample_ctx = np.zeros(
                            (context_len(info.sample_rate, self.cfg.sample_rate), 2),
                            dtype=np.float32,
                        )
                    out, resample_ctx = resample_block_np(
                        buf[:usable],
                        resample_ctx,
                        info.sample_rate,
                        self.cfg.sample_rate,
                    )
                else:
                    out = pcm
                while not self._stop.is_set():
                    if self.feed.push_block(out, block=True, timeout=0.25):
                        break
            if not got_any:
                return  # undecodable: don't loop forever
