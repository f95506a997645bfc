"""Tests for time algebra and protocol wire round-trips."""

from fractions import Fraction

from mixlab_tpu import protocol as p
from mixlab_tpu.protocol import wire
from mixlab_tpu.utils.mtime import MediaDuration, MediaTime, TimeBase


def test_media_time_algebra():
    t = MediaTime.new(1, 3)
    d = MediaDuration.new(1, 6)
    assert (t + d).as_fraction() == Fraction(1, 2)
    assert (t - MediaTime.new(1, 6)).as_fraction() == Fraction(1, 6)
    assert isinstance(t - MediaTime.new(1, 6), MediaDuration)
    assert (t - d).as_fraction() == Fraction(1, 6)
    assert isinstance(t - d, MediaTime)


def test_round_to_base_truncates():
    # Rational64::to_integer truncates toward zero
    assert MediaTime.new(7, 3).round_to_base(1) == 2
    assert MediaTime.new(-7, 3).round_to_base(1) == -2
    assert MediaDuration.new(1024, 44100).round_to_base(1000) == 23


def test_time_base():
    tb = TimeBase.new(1, 1000)  # RTMP 1kHz
    t = tb.scale_timestamp(1500)
    assert t.as_fraction() == Fraction(3, 2)
    assert tb.unscale_timestamp(t) == 1500


def test_decibel():
    assert abs(p.Decibel(6.0).to_linear() - 1.9952623) < 1e-6
    assert abs(p.Decibel.from_linear(2.0).db - 6.0206) < 1e-3
    assert p.Decibel(0.0).to_linear() == 1.0


def test_wire_roundtrip_workspace_message():
    msg = p.WorkspaceMessage(
        sequence=7,
        op=p.CreateModule(
            params=p.ModuleParams("Oscillator", p.OscillatorParams(440.0, p.Waveform.SAW)),
            geometry=p.WindowGeometry(p.Coords(10, -5), 3),
        ),
    )
    out = wire.loads(wire.dumps(msg))
    assert out == msg


def test_wire_roundtrip_all_param_kinds():
    defaults = {
        "Amplifier": p.AmplifierParams(),
        "Envelope": p.EnvelopeParams(),
        "EqThree": p.EqThreeParams(),
        "FmSine": p.FmSineParams(),
        "MediaSource": p.MediaSourceParams(media_id=p.MediaId(3)),
        "Mixer": p.MixerParams.with_channels(4),
        "Monitor": None,
        "Oscillator": p.OscillatorParams(),
        "OutputDevice": p.OutputDeviceParams(device="x", left=0, right=1),
        "Plotter": None,
        "StereoPanner": None,
        "StereoSplitter": None,
        "StreamInput": p.StreamInputParams(p.StreamProtocol.RTMP, "mount"),
        "StreamOutput": p.StreamOutputParams(),
        "Trigger": p.GateState.OPEN,
        "VideoMixer": p.VideoMixerParams(a=0, b=2, fader=0.5),
    }
    assert set(defaults) == set(p.ModuleParams.KINDS)
    for kind, params in defaults.items():
        mp = p.ModuleParams(kind, params)
        enc = wire.encode(mp)
        dec = wire.decode_module_params(enc)
        assert dec == mp, kind


def test_wire_roundtrip_server_update():
    su = p.SUCreateConnection(
        p.InputId(p.ModuleId(2), 0), p.OutputId(p.ModuleId(1), 1)
    )
    assert wire.loads(wire.dumps(su)) == su


def test_wire_roundtrip_performance_info():
    info = p.PerformanceInfo(
        realtime=True,
        lag=p.TemporalWarningStatus.RECENT,
        tick_rate=60,
        tick_budget=p.Microseconds(16666),
        accounts=[
            (p.PerformanceAccount("engine"), p.PerformanceMetric(p.Microseconds(12))),
            (
                p.PerformanceAccount("module", p.ModuleId(4)),
                p.PerformanceMetric(p.Microseconds(3)),
            ),
        ],
    )
    out = wire.loads(wire.dumps(info))
    assert out == info
