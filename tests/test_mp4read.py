"""Pure MP4 demuxer (av/mp4read.py): fragmented round-trip of our own
muxer's output through the zero-dependency decode tiers, and progressive
sample-table parsing.

The reference demuxes via libavformat FFI (codec/src/ffmpeg/format.rs);
this closes the same capability codec-free: MP4 media demuxes here and
decodes through the pure CAVLC H.264 + FLAC decoders — the whole
mux -> demux -> decode chain has zero native/codec dependencies.
"""

import struct

import numpy as np
import pytest

from mixlab_tpu.av import mp4
from mixlab_tpu.av.mp4read import Mp4Error, Mp4Reader, Sample
from mixlab_tpu.utils.mtime import MediaDuration
from mixlab_tpu.video.frame import Picture, PictureSettings


def _pic(w, h, seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + seed * 40) % 256).astype(np.uint8)
    u = ((xx[::2, ::2] + seed * 10) % 256).astype(np.uint8)
    v = rng.integers(100, 156, (h // 2, w // 2)).astype(np.uint8)
    return Picture(PictureSettings(w, h),
                   {"y": jnp.asarray(y), "u": jnp.asarray(u),
                    "v": jnp.asarray(v)})


def test_fragmented_roundtrip_pure_tiers():
    """Our fMP4 (init + one-sample fragments) demuxes back to the exact
    payload bytes, the video decodes via the pure H.264 decoder to the
    encoder's own spec-8.5 reconstruction, and the FLAC audio decodes
    losslessly — no codec library anywhere in the loop."""
    from mixlab_tpu.av.flacdec import FlacDecoder
    from mixlab_tpu.av.flacenc import PureFlacStream
    from mixlab_tpu.av.h264dec import PureH264Decoder
    from mixlab_tpu.av.h264enc import PureH264Stream

    W, H = 112, 64
    SR = 48000
    vstream = PureH264Stream(PictureSettings(W, H), mode="cavlc", qp=26)
    astream = PureFlacStream(SR, 2, block_size=1024)

    params = mp4.Mp4Params(
        timescale=SR, width=W, height=H, dcr=vstream.dcr,
        sample_rate=SR, channels=2, audio_codec="flac",
        flac_streaminfo_block=astream.streaminfo_block(),
    )
    mux, init_seg = mp4.Mp4Mux.create(params)

    rng = np.random.default_rng(0)
    pcm = (np.sin(np.arange(3 * 1024 * 2).reshape(-1, 2) * 0.01)
           * 12000).astype(np.int16)
    astream.feed(pcm)
    flac_frames = astream.poll_frames()
    assert len(flac_frames) == 3

    recons = []
    video_payloads = []
    blob = init_seg
    for k, fr in enumerate(flac_frames):
        blob += mux.write_track(MediaDuration.new(1024, SR),
                                mp4.FlacFrame(fr))
    for k in range(2):
        vstream.feed(_pic(W, H, k))
        ((is_key, avcc),) = vstream.poll_access_units()
        assert is_key
        video_payloads.append(avcc)
        recons.append(vstream._cavlc.last_recon)
        blob += mux.write_track(MediaDuration.new(1, 10),
                                mp4.AvcFrame(True, MediaDuration.new(0, 1),
                                             avcc))

    r = Mp4Reader(blob)
    vt = r.video_track()
    at = r.audio_track()
    assert vt is not None and at is not None
    assert vt.codec == "h264" and vt.dcr == vstream.dcr
    assert vt.width == W and vt.height == H
    assert at.codec == "flac" and len(at.streaminfo) == 34
    assert at.sample_rate == SR and at.channels == 2

    # exact payload bytes back out
    assert [r.sample_data(s) for s in vt.samples] == video_payloads
    assert [r.sample_data(s) for s in at.samples] == flac_frames
    # fragment timing: audio dts advances by the granule, video by 1/10 s
    assert [s.dts for s in at.samples] == [0, 1024, 2048]
    assert [s.dts for s in vt.samples] == [0, SR // 10]
    assert all(s.key for s in vt.samples)

    # pure decode: video lands bit-exactly on the encoder's reconstruction
    dec = PureH264Decoder(vt.dcr)
    for s, (ry, ru, rv) in zip(vt.samples, recons):
        ((_, y, u, v),) = dec.decode(r.sample_data(s))
        assert np.array_equal(y, ry[:H, :W])
        assert np.array_equal(u, ru[: H // 2, : W // 2])
        assert np.array_equal(v, rv[: H // 2, : W // 2])

    # pure decode: FLAC is lossless
    fdec = FlacDecoder(at.streaminfo)
    got = np.concatenate([fdec.decode_frame(r.sample_data(s))[0]
                          for s in at.samples])
    assert np.array_equal(got.astype(np.int16), pcm)


def test_progressive_sample_tables():
    """Hand-built progressive MP4 (stts/ctts/stsc/stsz/stco/stss over two
    interleaved chunks) parses to the right offsets, times, and keyframes."""
    from mixlab_tpu.av.mp4 import box, full_box

    # 4 video samples: chunk 1 holds 3, chunk 2 holds 1
    sizes = [10, 20, 30, 40]
    payload = bytes(range(1, 101))
    stsd = full_box(
        b"stsd", 0, 0, struct.pack(">I", 1),
        box(b"avc1",
            b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HH", 0, 0) + b"\x00" * 12
            + struct.pack(">HH", 64, 48)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + struct.pack(">I", 0) + struct.pack(">H", 1) + b"\x00" * 32
            + struct.pack(">Hh", 0x0018, -1)
            + box(b"avcC", b"\x01\x42\xc0\x28\xff")))
    stts = full_box(b"stts", 0, 0, struct.pack(">IIIII", 2, 2, 100, 2, 50))
    ctts = full_box(b"ctts", 1, 0,
                    struct.pack(">I", 2)
                    + struct.pack(">Ii", 1, 5)   # first sample: +5
                    + struct.pack(">Ii", 3, 0))  # rest: 0
    stsc = full_box(b"stsc", 0, 0,
                    struct.pack(">I", 2)
                    + struct.pack(">III", 1, 3, 1)
                    + struct.pack(">III", 2, 1, 1))
    stsz = full_box(b"stsz", 0, 0,
                    struct.pack(">II", 0, 4) + struct.pack(">4I", *sizes))
    # chunk offsets point into `payload` appended after moov (absolute)
    stss = full_box(b"stss", 0, 0, struct.pack(">I", 2)
                    + struct.pack(">II", 1, 3))

    def build(chunk1_off, chunk2_off):
        stco = full_box(b"stco", 0, 0,
                        struct.pack(">III", 2, chunk1_off, chunk2_off))
        stbl = box(b"stbl", stsd + stts + ctts + stsc + stsz + stco + stss)
        minf = box(b"minf", stbl)
        mdhd = full_box(b"mdhd", 0, 0,
                        struct.pack(">IIII", 0, 0, 1000, 0)
                        + struct.pack(">HH", 0x55C4, 0))
        hdlr = full_box(b"hdlr", 0, 0,
                        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full_box(b"tkhd", 0, 7,
                        struct.pack(">IIII", 0, 0, 1, 0) + b"\x00" * 52)
        trak = box(b"trak", tkhd + mdia)
        mvhd = full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0)
                        + b"\x00" * 80)
        return box(b"moov", mvhd + trak)

    probe = build(0, 0)
    head = len(probe) + 8  # + mdat box header
    from mixlab_tpu.av.mp4 import box as mkbox

    data = build(head, head + 60) + mkbox(b"mdat", payload)

    r = Mp4Reader(data)
    t = r.tracks[1]
    assert t.codec == "h264" and t.dcr == b"\x01\x42\xc0\x28\xff"
    assert [(s.offset, s.size) for s in t.samples] == [
        (head, 10), (head + 10, 20), (head + 30, 30), (head + 60, 40)]
    # stts: 2 samples of 100, then 2 of 50
    assert [s.dts for s in t.samples] == [0, 100, 200, 250]
    # ctts v1: first sample has +5 composition offset
    assert t.samples[0].cts == 5 and t.samples[1].cts == 100
    # stss: samples 1 and 3 are sync
    assert [s.key for s in t.samples] == [True, False, True, False]
    assert [r.sample_data(s)[0] for s in t.samples] == [
        payload[0], payload[10], payload[30], payload[60]]


def test_errors_are_typed():
    with pytest.raises(Mp4Error):
        Mp4Reader(b"\x00\x00\x00\x10free" + b"\x00" * 8)  # no moov
    with pytest.raises(Mp4Error):
        Mp4Reader(b"\x00\x00\x00\xffmoov")  # bad box size
    r_ok = None
    with pytest.raises(Mp4Error):
        # sample pointing outside the file
        from mixlab_tpu.av.mp4read import Sample as S

        r_ok = Mp4Reader(
            bytes(mp4.box(b"moov", mp4.full_box(
                b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0)
                + b"\x00" * 80))))
        r_ok.sample_data(S(offset=10_000, size=10, dts=0))


def test_media_player_plays_mp4_codec_free(tmp_path, monkeypatch):
    """End to end with zero codec libraries: an fMP4 upload (pure CAVLC
    H.264 + FLAC, our own mux) plays through MediaPlayer's pure-demux path
    — audio blocks carry the tone, the video frame is the encoder's exact
    reconstruction.  avshim is forced unavailable to pin the pure path."""
    import time

    from mixlab_tpu.av.flacenc import PureFlacStream
    from mixlab_tpu.av.h264enc import PureH264Stream
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create
    from mixlab_tpu.native import avshim

    monkeypatch.setattr(avshim, "available", lambda: False)

    W, H, SR = 112, 64, 48000
    vstream = PureH264Stream(PictureSettings(W, H), mode="cavlc", qp=26)
    astream = PureFlacStream(SR, 2, block_size=1024)
    params = mp4.Mp4Params(
        timescale=SR, width=W, height=H, dcr=vstream.dcr,
        sample_rate=SR, channels=2, audio_codec="flac",
        flac_streaminfo_block=astream.streaminfo_block(),
    )
    mux, blob = mp4.Mp4Mux.create(params)
    blob = bytearray(blob)
    t = np.arange(SR) / SR
    tone = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000
            ).astype(np.int16)
    astream.feed(tone)
    for fr in astream.poll_frames():
        blob += mux.write_track(MediaDuration.new(1024, SR),
                                mp4.FlacFrame(fr))
    vstream.feed(_pic(W, H, 0))
    ((_, avcc),) = vstream.poll_access_units()
    recon = vstream._cavlc.last_recon
    blob += mux.write_track(MediaDuration.new(1, 10),
                            mp4.AvcFrame(True, MediaDuration.new(0, 1), avcc))

    cfg = EngineConfig(sample_rate=SR)
    proj = open_or_create(tmp_path / "clip.mixlab", cfg)
    media_id = proj.upload_media("clip.mp4", "video/mp4", [bytes(blob)])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        pts, frame = feed.video_q.get(timeout=15)
        yp = np.asarray(frame.picture.planes["y"])
        assert np.array_equal(yp, recon[0][:H, :W])
        blocks = []
        deadline = time.time() + 10
        while time.time() < deadline and sum(map(len, blocks)) < 8192:
            try:
                blocks.append(feed.queue.get(timeout=1.0))
            except Exception:
                pass
        pcm = np.concatenate(blocks)
        assert len(pcm) >= 8192
        body = pcm[1024:, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
        peak_hz = np.argmax(spec) * SR / len(body)
        assert abs(peak_hz - 440.0) < 10.0, peak_hz
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()


def _min_moov_video(timescale=1000):
    """Minimal fragmented-capable moov with one video track + trex."""
    from mixlab_tpu.av.mp4 import box, full_box

    stsd = full_box(
        b"stsd", 0, 0, struct.pack(">I", 1),
        box(b"avc1",
            b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HH", 0, 0) + b"\x00" * 12
            + struct.pack(">HH", 64, 48)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + struct.pack(">I", 0) + struct.pack(">H", 1) + b"\x00" * 32
            + struct.pack(">Hh", 0x0018, -1)
            + box(b"avcC", b"\x01\x42\xc0\x28\xff")))
    stbl = box(b"stbl", stsd
               + full_box(b"stts", 0, 0, struct.pack(">I", 0))
               + full_box(b"stsc", 0, 0, struct.pack(">I", 0))
               + full_box(b"stsz", 0, 0, struct.pack(">II", 0, 0))
               + full_box(b"stco", 0, 0, struct.pack(">I", 0)))
    mdhd = full_box(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, 0)
                    + struct.pack(">HH", 0x55C4, 0))
    hdlr = full_box(b"hdlr", 0, 0,
                    struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    tkhd = full_box(b"tkhd", 0, 7,
                    struct.pack(">IIII", 0, 0, 1, 0) + b"\x00" * 52)
    trex = full_box(b"trex", 0, 0, struct.pack(">5I", 1, 1, 0, 0, 0))
    mvhd = full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, 0)
                    + b"\x00" * 80)
    return box(b"moov", mvhd + box(b"trak", tkhd + mdia) + box(b"mvex", trex))


def test_multi_trun_without_data_offset_continues():
    """A traf with two truns where the second omits data_offset: the second
    run's samples follow the first run's data (ISO 14496-12 8.8.8), not the
    moof anchor."""
    from mixlab_tpu.av.mp4 import box, full_box

    init = _min_moov_video()
    # trun 1: data-offset + sizes for 2 samples; trun 2: sizes only
    tfhd = full_box(b"tfhd", 0, 0x020008,
                    struct.pack(">II", 1, 10))  # default duration 10
    trun1 = full_box(b"trun", 0, 0x000201,
                     struct.pack(">Ii", 2, 0) + struct.pack(">II", 5, 7))
    trun2 = full_box(b"trun", 0, 0x000200,
                     struct.pack(">I", 1) + struct.pack(">I", 3))
    moof_body = full_box(b"mfhd", 0, 0, struct.pack(">I", 1)) + box(
        b"traf", tfhd + trun1 + trun2)
    moof = box(b"moof", moof_body)
    # patch trun1's data_offset to point at the mdat payload
    doff = len(moof) + 8
    trun1 = full_box(b"trun", 0, 0x000201,
                     struct.pack(">Ii", 2, doff) + struct.pack(">II", 5, 7))
    moof = box(b"moof", full_box(b"mfhd", 0, 0, struct.pack(">I", 1))
               + box(b"traf", tfhd + trun1 + trun2))
    payload = bytes(range(1, 16))  # 5 + 7 + 3 bytes
    data = init + moof + box(b"mdat", payload)

    r = Mp4Reader(data)
    t = r.tracks[1]
    assert [s.size for s in t.samples] == [5, 7, 3]
    assert r.sample_data(t.samples[0]) == payload[:5]
    assert r.sample_data(t.samples[1]) == payload[5:12]
    # the fix: trun 2 continues after trun 1's data
    assert r.sample_data(t.samples[2]) == payload[12:15]
    assert [s.dts for s in t.samples] == [0, 10, 20]


def test_largesize_moof_anchor():
    """A moof written with the 64-bit largesize header still anchors
    default-base-is-moof offsets at the true box start."""
    from mixlab_tpu.av.mp4 import box, full_box

    init = _min_moov_video()
    tfhd = full_box(b"tfhd", 0, 0x020008, struct.pack(">II", 1, 10))
    mfhd = full_box(b"mfhd", 0, 0, struct.pack(">I", 1))

    def make_moof(doff):
        trun = full_box(b"trun", 0, 0x000201,
                        struct.pack(">Ii", 1, doff) + struct.pack(">I", 4))
        body = mfhd + box(b"traf", tfhd + trun)
        # largesize encoding: size field 1 + 64-bit size after the fourcc
        return (struct.pack(">I", 1) + b"moof"
                + struct.pack(">Q", 16 + len(body)) + body)

    moof = make_moof(0)
    moof = make_moof(len(moof) + 8)
    payload = b"ABCD"
    data = init + moof + box(b"mdat", payload)
    r = Mp4Reader(data)
    assert r.sample_data(r.tracks[1].samples[0]) == payload


def test_negative_sample_offset_rejected():
    s = Sample(offset=-50, size=10, dts=0)
    r = Mp4Reader(_min_moov_video() + b"")
    with pytest.raises(Mp4Error):
        r.sample_data(s)


def test_media_player_mp4_garbage_aac_skipped_video_plays(tmp_path, monkeypatch):
    """A corrupt AAC granule in an MP4 must not kill the video track: the
    pure tier (av/aacdec.py since round 4) raises the typed
    AacDecodeError, the player skips the granule, and the CAVLC video
    still plays codec-free.  Garbage is never mis-decoded into PCM."""
    from mixlab_tpu.av.aac import AudioSpecificConfiguration, adts_frame
    from mixlab_tpu.av.h264enc import PureH264Stream
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create
    from mixlab_tpu.native import avshim

    monkeypatch.setattr(avshim, "available", lambda: False)

    W, H, SR = 96, 64, 44100
    vstream = PureH264Stream(PictureSettings(W, H), mode="cavlc", qp=28)
    params = mp4.Mp4Params(
        timescale=SR, width=W, height=H, dcr=vstream.dcr,
        sample_rate=SR, channels=2, audio_codec="aac",
    )
    mux, blob = mp4.Mp4Mux.create(params)
    blob = bytearray(blob)
    # a fake AAC granule (the player must never try to decode it)
    asc = AudioSpecificConfiguration.lc_stereo(SR)
    adts = adts_frame(b"\x55" * 57, asc)
    blob += mux.write_track(MediaDuration.new(1024, SR), mp4.AdtsFrame(adts))
    vstream.feed(_pic(W, H, 1))
    ((_, avcc),) = vstream.poll_access_units()
    recon = vstream._cavlc.last_recon
    blob += mux.write_track(MediaDuration.new(1, 10),
                            mp4.AvcFrame(True, MediaDuration.new(0, 1), avcc))

    cfg = EngineConfig(sample_rate=SR)
    proj = open_or_create(tmp_path / "aacclip.mixlab", cfg)
    media_id = proj.upload_media("clip.mp4", "video/mp4", [bytes(blob)])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        pts, frame = feed.video_q.get(timeout=15)
        yp = np.asarray(frame.picture.planes["y"])
        assert np.array_equal(yp, recon[0][:H, :W])
        assert feed.queue.empty()  # no (mis-)decoded audio blocks
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()


def test_elst_media_time_parsed():
    """A single-entry edit list's media_time (the leading-media skip most
    muxers emit) lands on TrackInfo.edit_media_time; an initial empty edit
    (-1) is skipped to the first real entry."""
    from mixlab_tpu.av.mp4 import box, full_box

    moov = _min_moov_video()
    # splice an edts (empty edit then media_time=500) into the trak
    elst = full_box(b"elst", 0, 0,
                    struct.pack(">I", 2)
                    + struct.pack(">Ii", 100, -1) + struct.pack(">HH", 1, 0)
                    + struct.pack(">Ii", 0, 500) + struct.pack(">HH", 1, 0))
    edts = box(b"edts", elst)
    # rebuild: unwrap moov, find trak payload, append edts inside it
    from mixlab_tpu.av.mp4read import _boxes

    inner = {k: (s, e) for k, s, e in _boxes(moov, 8, len(moov))}
    trak_s, trak_e = inner[b"trak"]
    new_trak = box(b"trak", moov[trak_s:trak_e] + edts)
    new_moov = box(b"moov", moov[8:trak_s - 8] + new_trak + moov[trak_e:])
    r = Mp4Reader(new_moov)
    assert r.tracks[1].edit_media_time == 500


def test_media_player_plays_bframe_mp4_codec_free(tmp_path, monkeypatch):
    """A B-frame MP4 (x264 main profile, bframes + CABAC — the default
    GOP structure of real-world files) plays through MediaPlayer's pure
    path in DISPLAY order: samples are fed in decode (dts) order, the
    pure decoder reorders by POC, and every emitted frame matches
    libavcodec's display-order output.  The encode side uses the shim
    (third-party bytes); the playback side runs with avshim forced
    unavailable."""
    import time

    from mixlab_tpu.av.avc import (
        DecoderConfigurationRecord, UnitType, annexb_to_avcc)
    from mixlab_tpu.av.sps import parse_sps
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.project import open_or_create
    from mixlab_tpu.native import avshim
    from mixlab_tpu.utils.mtime import MediaDuration

    if not avshim.available():
        import pytest

        pytest.skip("avshim needed to ENCODE the third-party B stream")

    W, H, FPS, N = 112, 64, 30, 12
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (H * 2, W * 2), dtype=np.uint8)
    frames = []
    for i in range(N):
        y = base[3 * i:3 * i + H, 2 * i:2 * i + W].copy()
        frames.append((y, np.full((H // 2, W // 2), 100, np.uint8),
                       np.full((H // 2, W // 2), 140, np.uint8)))
    enc = avshim.VideoEncoder(
        W, H, fps=FPS,
        opts="preset=veryfast,profile=main,g=250,threads=1,qp=22,"
             "x264-params=scenecut=0:bframes=3:b-adapt=0")
    for i, (y, u, v) in enumerate(frames):
        enc.send(y, u, v, i)
    enc.flush()
    pk = enc.receive()
    ed = enc.extradata()
    enc.close()

    # libavcodec's display-order ground truth
    ref = avshim.VideoDecoder("h264")
    truth = []
    for i, (pts, _dts, _key, data) in enumerate(pk):
        truth.extend(ref.decode((ed if i == 0 else b"") + data, pts))
    truth.extend(ref.flush())
    ref.close()
    assert len(truth) == N

    _, psets = annexb_to_avcc(ed)
    sps = next(u for u in psets
               if u.kind == UnitType.SEQUENCE_PARAMETER_SET)
    pps = next(u for u in psets
               if u.kind == UnitType.PICTURE_PARAMETER_SET)
    info = parse_sps(sps.data)
    dcr = DecoderConfigurationRecord(
        1, info.profile_idc, 0, info.level_idc, 4, [sps], [pps]).to_bytes()
    params = mp4.Mp4Params(timescale=FPS, width=W, height=H, dcr=dcr)
    mux, blob = mp4.Mp4Mux.create(params)
    blob = bytearray(blob)
    for pts, dts, key, data in pk:  # decode (dts) order, cts offsets
        blob += mux.write_track(
            MediaDuration.new(1, FPS),
            mp4.AvcFrame(key, MediaDuration.new(int(pts - dts), FPS),
                         annexb_to_avcc(data)[0]))

    monkeypatch.setattr(avshim, "available", lambda: False)
    cfg = EngineConfig(sample_rate=48000)
    proj = open_or_create(tmp_path / "bclip.mixlab", cfg)
    media_id = proj.upload_media("bclip.mp4", "video/mp4", [bytes(blob)])
    stream = proj.base.open_media(media_id)
    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(stream, feed, cfg)
    player.start()
    try:
        got = []
        deadline = time.time() + 20
        while len(got) < N and time.time() < deadline:
            try:
                got.append(feed.video_q.get(timeout=1.0))
            except Exception:
                pass
        assert len(got) >= N, f"only {len(got)} frames played"
        for i in range(N):
            yp = np.asarray(got[i][1].picture.planes["y"])
            assert np.array_equal(yp, truth[i][1]), f"frame {i} differs"
        # display timestamps strictly increase (reorder worked)
        ts = [float(t.frac) for t, _ in got[:N]]
        assert ts == sorted(ts)
    finally:
        player.stop()
        player.join(timeout=5)
        proj.engine.stop()
        proj.close()
