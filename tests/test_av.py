"""AV byte-layer tests: ADTS/ASC, AVC DCR/NAL, FLV, fMP4 mux, EncodeStream."""

import struct

import numpy as np
import pytest

from mixlab_tpu.av import aac, avc, flv, mp4
from mixlab_tpu.av.encode_stream import (
    SAMPLES_PER_CHANNEL_PER_FRAGMENT,
    AudioPipe,
    AudioSegment,
    EncodeStream,
    VideoSegment,
    f32_to_i16,
)
from mixlab_tpu.utils.mtime import MediaDuration, MediaTime
from mixlab_tpu.video.frame import Picture, PictureSettings


def test_adts_reference_vector():
    """The exact unit-test vector from the reference
    (codec/src/aac/adts.rs:113-141)."""
    asc = aac.AudioSpecificConfiguration(
        object_type=aac.AudioObjectType.LOW_COMPLEXITY,
        sampling_frequency_index=2,
        channel_configuration=2,
        frame_length_flag=True,
        depends_on_core_coder=True,
        extension_flag=True,
    )
    payload = bytes([0b0100_1110, 0b0010_1111, 0b1001_0011, 0b1111_0010])
    expected = bytes(
        [
            0b1111_1111, 0b1111_0001, 0b0100_1000, 0b1000_0000,
            0b0000_0001, 0b0111_1111, 0b1111_1100,
            0b0100_1110, 0b0010_1111, 0b1001_0011, 0b1111_0010,
        ]
    )
    assert aac.adts_frame(payload, asc) == expected


def test_asc_roundtrip():
    asc = aac.AudioSpecificConfiguration.lc_stereo(44100)
    assert asc.sampling_frequency_index == 4
    parsed = aac.AudioSpecificConfiguration.parse(asc.to_bytes())
    assert parsed == asc


def test_adts_parse_and_strip():
    asc = aac.AudioSpecificConfiguration.lc_stereo(48000)
    frame = aac.adts_frame(b"\x01\x02\x03", asc)
    hdr = aac.parse_adts_header(frame)
    assert hdr["frame_length"] == 10
    assert hdr["sampling_frequency_index"] == 3
    assert hdr["channel_configuration"] == 2
    assert aac.strip_adts_header(frame) == b"\x01\x02\x03"


def test_nal_unit_roundtrip():
    u = avc.NalUnit(ref_idc=3, kind=avc.UnitType.SEQUENCE_PARAMETER_SET, data=b"\x42\x00\x1f")
    assert avc.NalUnit.parse(u.to_bytes()) == u


def test_dcr_roundtrip():
    sps = avc.NalUnit(3, avc.UnitType.SEQUENCE_PARAMETER_SET, b"\x64\x00\x29\xff")
    pps = avc.NalUnit(3, avc.UnitType.PICTURE_PARAMETER_SET, b"\xee\x38\x80")
    dcr = avc.DecoderConfigurationRecord(
        version=1,
        profile_indication=0x64,
        profile_compatibility=0,
        level_indication=0x29,
        nalu_size=4,
        sps=[sps],
        pps=[pps],
    )
    data = dcr.to_bytes()
    back = avc.DecoderConfigurationRecord.parse(data)
    assert back.sps == [sps] and back.pps == [pps]
    assert back.nalu_size == 4
    assert back.to_bytes() == data


def test_nal_length_prefixed_iteration():
    units = [
        avc.NalUnit(2, avc.UnitType.IDR_PICTURE, b"payload-one"),
        avc.NalUnit(0, avc.UnitType.SEI, b"x"),
    ]
    data = avc.write_nal_units(units, nalu_size=4)
    assert list(avc.iter_nal_units(data, 4)) == units


def test_flv_audio_roundtrip():
    pkt = flv.AudioPacket(is_sequence_header=False, data=b"\xaa\xbb")
    assert flv.AudioPacket.parse(pkt.to_bytes()) == pkt
    seq = flv.AudioPacket(is_sequence_header=True, data=b"\x12\x10")
    assert flv.AudioPacket.parse(seq.to_bytes()) == seq
    with pytest.raises(flv.FlvError):
        flv.AudioPacket.parse(b"\x2f\x00mp3?")


def test_flv_video_roundtrip():
    pkt = flv.VideoPacket(
        frame_type=flv.VideoFrameType.KEY_FRAME,
        packet_type=flv.VideoPacketType.NALU,
        composition_time=0x123456,
        data=b"\x00\x00\x00\x02\x65\x88",
    )
    back = flv.VideoPacket.parse(pkt.to_bytes())
    assert back == pkt


# ---------------------------------------------------------------------------
# fMP4
# ---------------------------------------------------------------------------


def walk_boxes(data: bytes):
    pos = 0
    while pos < len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4 : pos + 8]
        yield kind, data[pos + 8 : pos + size]
        pos += size


def box_types(data):
    return [k for k, _ in walk_boxes(data)]


def find_box(data, *path):
    for kind, body in walk_boxes(data):
        if kind == path[0]:
            if len(path) == 1:
                return body
            return find_box(body[4:] if kind in (b"stsd",) else body, *path[1:])
    return None


def _params():
    dcr = avc.DecoderConfigurationRecord(
        1, 0x64, 0, 0x29, 4,
        [avc.NalUnit(3, avc.UnitType.SEQUENCE_PARAMETER_SET, b"\x64")],
        [avc.NalUnit(3, avc.UnitType.PICTURE_PARAMETER_SET, b"\xee")],
    ).to_bytes()
    return mp4.Mp4Params(timescale=44100, width=560, height=350, dcr=dcr)


def test_init_segment_structure():
    mux, init = mp4.Mp4Mux.create(_params())
    kinds = box_types(init)
    assert kinds == [b"ftyp", b"moov"]
    moov = find_box(init, b"moov")
    moov_kinds = box_types(moov)
    assert moov_kinds == [b"mvhd", b"trak", b"trak", b"mvex"]
    mvex = find_box(moov, b"mvex")
    assert box_types(mvex) == [b"trex", b"trex"]


def test_media_segment_audio_strips_adts_and_patches_offset():
    mux, _ = mp4.Mp4Mux.create(_params())
    asc = aac.AudioSpecificConfiguration.lc_stereo(44100)
    raw = b"\x21\x42" * 64
    adts = aac.adts_frame(raw, asc)
    seg = mux.write_track(
        MediaDuration.new(1024, 44100), mp4.AdtsFrame(adts)
    )
    kinds = box_types(seg)
    assert kinds == [b"moof", b"mdat"]
    moof = find_box(seg, b"moof")
    mdat = find_box(seg, b"mdat")
    assert mdat == raw  # ADTS header stripped
    # data_offset in trun must point just past moof+mdat header
    moof_size = len(moof) + 8
    traf = find_box(moof, b"traf")
    trun = find_box(traf, b"trun")
    _, sample_count, data_offset = struct.unpack_from(">IIi", trun, 0)
    assert sample_count == 1
    assert data_offset == moof_size + 8


def test_media_segment_rounding_carries_remainder():
    # 1024-sample durations at timescale 1000: exact rational accumulation
    # must not drift (mp4.rs:238-242)
    params = mp4.Mp4Params(timescale=1000, width=16, height=16, dcr=b"\x01")
    mux, _ = mp4.Mp4Mux.create(params)
    asc = aac.AudioSpecificConfiguration.lc_stereo(44100)
    total = 0
    for i in range(100):
        seg = mux.write_track(
            MediaDuration.new(1024, 44100), mp4.AdtsFrame(aac.adts_frame(b"\x00", asc))
        )
    # after 100 granules: exact time = 102400/44100 s = 2322.0ms (trunc)
    assert mux.audio_time == MediaTime.new(102400, 44100)
    assert mux.audio_time.round_to_base(1000) == 2321  # trunc of 2321.99


def test_video_segment_key_flags():
    mux, _ = mp4.Mp4Mux.create(_params())
    seg = mux.write_track(
        MediaDuration.new(1, 60),
        mp4.AvcFrame(is_key_frame=False, composition_time=MediaDuration.zero(), data=b"\x00\x01"),
    )
    moof = find_box(seg, b"moof")
    traf = find_box(moof, b"traf")
    trun = find_box(traf, b"trun")
    _, count, off, dur, size, flags, cts = struct.unpack_from(">IIiIIIi", trun, 0)
    assert flags == (1 << 24) | (1 << 16)  # depends_on=1, non-sync
    seg2 = mux.write_track(
        MediaDuration.new(1, 60),
        mp4.AvcFrame(is_key_frame=True, composition_time=MediaDuration.zero(), data=b"\x00\x01"),
    )
    trun2 = find_box(find_box(find_box(seg2, b"moof"), b"traf"), b"trun")
    _, _, _, _, _, flags2, _ = struct.unpack_from(">IIiIIIi", trun2, 0)
    assert flags2 == (1 << 24)  # key frame: sync sample


# ---------------------------------------------------------------------------
# EncodeStream with mock encoders
# ---------------------------------------------------------------------------


class MockAudioEnc:
    def encode(self, granule):
        return bytes([len(granule) % 251])


class MockVideoPkt:
    def __init__(self, dts, pts, key, data):
        self.dts, self.pts, self.is_key, self.data = dts, pts, key, data


class MockVideoEnc:
    def __init__(self):
        self.count = 0
        self.settings = PictureSettings(16, 16)

    def blank_picture(self):
        return Picture.blank(self.settings)

    def encode(self, picture, pts):
        self.count += 1
        return [MockVideoPkt(pts, pts, True, b"frame")]


def test_f32_to_i16_clamps():
    out = f32_to_i16(np.array([-2.0, -1.0, 0.0, 1.0, 2.0], dtype=np.float32))
    assert list(out) == [-32767, -32767, 0, 32767, 32767]


def test_audio_granule_quirk_strictly_greater():
    """encode.rs:201 emits a granule only once the buffer EXCEEDS 2048."""
    pipe = AudioPipe(MockAudioEnc(), 44100)
    out = pipe.send_audio(np.zeros(2048, dtype=np.float32))
    assert out == []  # exactly 2048: nothing yet
    out = pipe.send_audio(np.zeros(2, dtype=np.float32))
    assert len(out) == 1
    dur, _ = out[0]
    assert dur == MediaDuration.new(1024, 44100)


def test_encode_stream_interleave_and_barrier():
    es = EncodeStream(AudioPipe(MockAudioEnc(), 44100), MockVideoEnc(), time_base=60)
    # no segments until both sides have >1
    for _ in range(8):
        es.send_audio(np.zeros((735, 2), dtype=np.float32))
    assert es.recv_segment() is None
    # video barrier generates blank frames gap-free
    es.barrier(MediaTime.new(1, 60))
    es.barrier(MediaTime.new(2, 60))
    es.barrier(MediaTime.new(2, 60))  # no-op: not past current timestamp
    es.barrier(MediaTime.new(3, 60))
    segs = []
    while (s := es.recv_segment()) is not None:
        segs.append(s)
    assert any(isinstance(s, AudioSegment) for s in segs)
    assert any(isinstance(s, VideoSegment) for s in segs)
    # DTS ordering
    dts = [s.decode_timestamp for s in segs]
    assert dts == sorted(dts)


def test_encode_stream_drops_stale_video():
    enc = MockVideoEnc()
    es = EncodeStream(AudioPipe(MockAudioEnc(), 44100), enc, time_base=60)
    es.barrier(MediaTime.new(10, 60))
    n = enc.count
    # a frame entirely before the current video timestamp is dropped
    es.send_video(MediaTime.new(1, 60), MediaDuration.new(1, 60), enc.blank_picture())
    assert enc.count == n


def test_annexb_avcc_roundtrip():
    from mixlab_tpu.av import avc

    sps = avc.NalUnit(3, avc.UnitType.SEQUENCE_PARAMETER_SET, b"\x64\x00\x1f")
    pps = avc.NalUnit(3, avc.UnitType.PICTURE_PARAMETER_SET, b"\xee\x3c")
    idr = avc.NalUnit(3, avc.UnitType.IDR_PICTURE, b"\x88" * 20)
    sei = avc.NalUnit(0, avc.UnitType.SEI, b"\x05\x01\x80")
    annexb = (
        b"\x00\x00\x00\x01" + sps.to_bytes()
        + b"\x00\x00\x00\x01" + pps.to_bytes()
        + b"\x00\x00\x01" + sei.to_bytes()
        + b"\x00\x00\x01" + idr.to_bytes()
    )
    payload, params = avc.annexb_to_avcc(annexb)
    assert params == [sps, pps]
    units = list(avc.iter_nal_units(payload, 4))
    assert units == [sei, idr]


def test_split_annexb_trailing_zeros():
    from mixlab_tpu.av import avc

    u1 = avc.NalUnit(1, avc.UnitType.NON_IDR_PICTURE, b"\x42\x43")
    # 4-byte start code before second unit means u1's raw bytes are followed
    # by a zero that belongs to the next start code
    data = b"\x00\x00\x01" + u1.to_bytes() + b"\x00\x00\x00\x01" + u1.to_bytes()
    units = avc.split_annexb(data)
    assert units == [u1.to_bytes(), u1.to_bytes()]
