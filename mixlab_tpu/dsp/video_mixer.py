"""VideoMixer graph definition.

Reference: ``src/module/video_mixer.rs`` — a 4-input video crossfader with
A/B channel select and a fader.  Pixel work (crossfade blend, rescale,
picture unification) runs on device via :mod:`mixlab_tpu.video` kernels; the
Option-valued per-tick frame plumbing (stored-frame expiry, channel select)
is host control flow in :mod:`mixlab_tpu.video.engine`, matching the
reference split between control logic and the SIMD inner loop
(video_mixer.rs:94-148 vs 210-235).

This class only contributes graph structure (terminals) and param lowering;
it has no audio ``run_block``.
"""

from __future__ import annotations

from mixlab_tpu.dsp.base import ModuleDef
from mixlab_tpu.protocol import VIDEO_MIXER_CHANNELS, LineType, VideoMixerParams


class VideoMixerDef(ModuleDef):
    kind = "VideoMixer"

    def terminals(self, params: VideoMixerParams):
        ins = [
            LineType.VIDEO.labeled(str(i + 1)) for i in range(VIDEO_MIXER_CHANNELS)
        ]
        outs = [
            LineType.VIDEO.labeled("Output"),
            LineType.VIDEO.labeled("A"),
            LineType.VIDEO.labeled("B"),
        ]
        return ins, outs

    def run_block(self, params, aux, host_aux, state, inputs, cfg, block):
        # no audio terminals; nothing to do device-side in the audio program
        return state, [None, None, None], {}
