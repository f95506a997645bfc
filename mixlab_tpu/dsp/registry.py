"""Module registry: kind tag -> ModuleDef singleton.

Mirror of the reference's ``enumerate_modules!`` registry
(``src/module/mod.rs:28-49``), minus the macro machinery: a plain dict.
"""

from __future__ import annotations

from typing import Dict

from mixlab_tpu.dsp.audio import (
    AmplifierDef,
    FmSineDef,
    MixerDef,
    OscillatorDef,
    StereoPannerDef,
    StereoSplitterDef,
    TriggerDef,
)
from mixlab_tpu.dsp.base import ModuleDef
from mixlab_tpu.dsp.envelope import EnvelopeDef
from mixlab_tpu.dsp.eq_three import EqThreeDef
from mixlab_tpu.dsp.sinks import (
    MediaSourceDef,
    MonitorDef,
    OutputDeviceDef,
    PlotterDef,
    StreamInputDef,
    StreamOutputDef,
)
from mixlab_tpu.dsp.video_mixer import VideoMixerDef

_REGISTRY: Dict[str, ModuleDef] = {}


def register(d: ModuleDef):
    _REGISTRY[d.kind] = d
    return d


for _d in (
    AmplifierDef(),
    EnvelopeDef(),
    EqThreeDef(),
    FmSineDef(),
    MediaSourceDef(),
    MixerDef(),
    MonitorDef(),
    OscillatorDef(),
    OutputDeviceDef(),
    PlotterDef(),
    StereoPannerDef(),
    StereoSplitterDef(),
    StreamInputDef(),
    StreamOutputDef(),
    TriggerDef(),
    VideoMixerDef(),
):
    register(_d)


def get_def(kind: str) -> ModuleDef:
    return _REGISTRY[kind]


def all_kinds():
    return sorted(_REGISTRY)
