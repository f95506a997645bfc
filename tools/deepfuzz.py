"""High-N fuzz campaign over every pure parser/decoder that touches
untrusted bytes (RTMP publish payloads, Icecast socket bytes, media
library uploads, WS/AMF0 wire data).

The per-format fuzz tests in tests/test_codec_fuzz.py and the per-codec
suites run a few hundred trials as CI; this tool runs the same typed-error
contract at campaign scale (default 2,000 trials x ~14 targets) with a
fresh master seed per run, so every invocation explores new input space.

Contract per target: feeding mutated/garbage/truncated bytes either
returns cleanly or raises that decoder's *typed* error.  Any other
exception class is a finding: the failing blob is written to
/tmp/deepfuzz_<target>_<n>.bin with the traceback, and the campaign exits
nonzero after finishing all targets.

Usage:  python tools/deepfuzz.py [N_per_target] [master_seed]

Reference discipline this mirrors: the reference leans on lewton/ffmpeg
for panic-free decode (codec/src/ffmpeg/codec.rs:14-248); from-scratch
decoders have to earn the same property continuously.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def _make_picture(w, h, seed=0):
    from mixlab_tpu.video.frame import Picture, PictureSettings

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 255 // max(w - 1, 1)) // 2 + (yy * 100 // max(h - 1, 1))
         + rng.integers(0, 24, (h, w))).astype(np.uint8)
    u = (128 + (xx[:h // 2 * 2:2, :w // 2 * 2:2] * 60 // max(w, 1))
         ).astype(np.uint8)
    v = (128 - (yy[:h // 2 * 2:2, :w // 2 * 2:2] * 60 // max(h, 1))
         ).astype(np.uint8)
    return Picture(PictureSettings(w, h), {"y": y, "u": u, "v": v})


def _seed_h264_pure():
    """Our own CAVLC encoder's stream (exercises the fast tier)."""
    from mixlab_tpu.av.h264enc import PureH264Stream
    from mixlab_tpu.video.frame import PictureSettings

    st = PureH264Stream(PictureSettings(64, 48), mode="cavlc", qp=30)
    samples = []
    for i in range(3):
        st.feed(_make_picture(64, 48, seed=i))
        samples += [au for _k, au in st.poll_access_units()]
    dcr = st.dcr
    return (dcr if isinstance(dcr, bytes) else dcr.to_bytes()), samples


def _seed_h264_x264():
    """Shim-encoded x264 annexb stream (exercises the full-intra
    scalar/native tier: I_4x4, plane modes, deblocking, aq)."""
    from mixlab_tpu.native import avshim

    if not avshim.available():
        return None
    enc = avshim.VideoEncoder(
        64, 48, fps=10,
        opts="preset=veryfast,profile=baseline,g=1,crf=28,threads=1,"
             "x264-params=aq-mode=2",
    )
    for i in range(3):
        pic = _make_picture(64, 48, seed=10 + i)
        enc.send(pic.planes["y"], pic.planes["u"], pic.planes["v"], i)
    enc.flush()
    pk = [data for _pts, _dts, _key, data in enc.receive()]
    ed = enc.extradata()
    enc.close()
    return ed, pk


def _seed_h264_inter(profile):
    """Shim-encoded x264 INTER stream (round 5): returns (extradata,
    idr_packet, p_packets) so the fuzz target can warm the DPB with the
    real IDR and mutate only P slices."""
    from mixlab_tpu.native import avshim

    if not avshim.available():
        return None
    enc = avshim.VideoEncoder(
        64, 48, fps=10,
        opts=f"preset=veryfast,{profile},tune=zerolatency,g=250,qp=24,"
             "threads=1,x264-params=ref=3",
    )
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    for i in range(5):
        y = base[2 * i:2 * i + 48, i:i + 64].copy()
        u = np.full((24, 32), 90 + i, np.uint8)
        v = np.full((24, 32), 150, np.uint8)
        enc.send(y, u, v, i)
    enc.flush()
    pk = [data for _pts, _dts, _key, data in enc.receive()]
    ed = enc.extradata()
    enc.close()
    return ed, pk[0], pk[1:]


def _seed_h264_bframes(xparams):
    """Shim-encoded x264 B-frame stream (round 5): returns (extradata,
    warm_packets, b_packets) — the target warms the DPB with the IDR and
    first P (decode order), then mutates packets from the B region so the
    direct-mode / two-list / reorder surface sees hostile bytes."""
    from mixlab_tpu.native import avshim

    if not avshim.available():
        return None
    enc = avshim.VideoEncoder(
        64, 48, fps=10,
        opts="preset=veryfast,profile=main,g=250,qp=24,threads=1,"
             f"x264-params=scenecut=0:{xparams}",
    )
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    for i in range(8):
        y = base[2 * i:2 * i + 48, i:i + 64].copy()
        u = np.full((24, 32), 90 + i, np.uint8)
        v = np.full((24, 32), 150, np.uint8)
        enc.send(y, u, v, i)
    enc.flush()
    pk = [data for _pts, _dts, _key, data in enc.receive()]
    ed = enc.extradata()
    enc.close()
    return ed, pk[:2], pk[2:]


def _seed_aac():
    """Our pure AAC encoder's ADTS frames."""
    from mixlab_tpu.av.aac import adts_frame
    from mixlab_tpu.av.aacenc import AacLcEncoder

    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal((8192, 2)) * 8000).astype(np.int16)
    enc = AacLcEncoder(44100, 2)
    frames = []
    for off in range(0, 8192 - 1024, 1024):
        payload = enc.encode_granule(pcm[off:off + 1024])
        frames.append(adts_frame(payload, enc.asc))
    return frames


def _seed_flac():
    from mixlab_tpu.av.flacenc import FlacEncoder

    rng = np.random.default_rng(8)
    pcm = (rng.standard_normal((8192, 2)) * 8000).astype(np.int16)
    enc = FlacEncoder(44100, 2)
    frames = []
    streaminfo = enc.streaminfo_block()
    for off in range(0, 8192, 4096):
        frames.append(enc.encode_frame(pcm[off:off + 4096]))
    return streaminfo, frames


def _mutate(rng, seed: bytes) -> bytes:
    mode = rng.integers(0, 5)
    if mode == 0 or not seed:  # pure garbage
        n = int(rng.integers(1, 4096))
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    buf = bytearray(seed)
    if mode == 1:  # byte mutations
        for _ in range(int(rng.integers(1, 9))):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        return bytes(buf)
    if mode == 2:  # bit flips
        for _ in range(int(rng.integers(1, 5))):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        return bytes(buf)
    if mode == 3:  # truncate / skip-head
        if rng.integers(0, 2):
            return bytes(buf[: rng.integers(0, len(buf) + 1)])
        return bytes(buf[rng.integers(0, len(buf)):])
    # splice: duplicate or delete an internal chunk
    a = int(rng.integers(0, len(buf)))
    b = int(rng.integers(a, min(a + 64, len(buf)) + 1))
    if rng.integers(0, 2):
        return bytes(buf[:a] + buf[a:b] + buf[a:])  # duplicate
    return bytes(buf[:a] + buf[b:])  # delete


def build_targets():
    """-> list of (name, seeds, feed(blob), allowed_exceptions)."""
    targets = []

    # --- AAC (RTMP audio payloads / MP4 samples) ---
    from mixlab_tpu.av.aac import AacError
    from mixlab_tpu.av.aacdec import AacLcDecoder

    adts = _seed_aac()
    raw = [f[7:] for f in adts]

    def aac_raw(blob, _rng):
        AacLcDecoder().decode_raw(blob, int(_rng.integers(0, 12)))

    def aac_adts(blob, _rng):
        AacLcDecoder().decode_adts(blob)

    targets.append(("aac_raw", raw, aac_raw, (AacError,)))
    targets.append(("aac_adts", adts, aac_adts, (AacError,)))

    # --- H.264 (RTMP video payloads / MP4 samples) ---
    from mixlab_tpu.av.avc import AvcError
    from mixlab_tpu.av.h264dec import H264DecodeError, PureH264Decoder

    dcr_pure, pure_samples = _seed_h264_pure()
    h264_allowed = (H264DecodeError, AvcError)

    def h264_pure(blob, _rng):
        d = PureH264Decoder(dcr_pure)
        d.decode(blob)

    targets.append(("h264_pure_avcc", pure_samples, h264_pure, h264_allowed))

    x264 = _seed_h264_x264()
    if x264 is not None:
        ed_x, x_samples = x264

        def h264_x264(blob, _rng):
            d = PureH264Decoder()
            d.decode_annexb(ed_x)
            d.decode_annexb(blob)

        def h264_annexb_cold(blob, _rng):
            # parameter sets themselves fuzzed
            PureH264Decoder().decode_annexb(blob)

        targets.append(("h264_x264_annexb", x_samples, h264_x264,
                        h264_allowed))
        targets.append(("h264_annexb_cold", [ed_x + x_samples[0]],
                        h264_annexb_cold, h264_allowed))

    # --- inter (P-slice) surface, round 5: fuzzed P packets hit the MV
    # prediction / MC / ref-list / marking paths of a WARM decoder whose
    # DPB holds real reference pictures (CAVLC and CABAC variants) ---
    for label, prof in (("h264_p_cavlc", "profile=baseline"),
                        ("h264_p_cabac", "profile=main")):
        inter = _seed_h264_inter(prof)
        if inter is None:
            continue
        ed_i, idr_i, p_samples = inter

        def h264_p(blob, _rng, _ed=ed_i, _idr=idr_i):
            d = PureH264Decoder()
            d.decode_annexb(_ed + _idr)  # warm DPB with the real IDR
            d.decode_annexb(blob)

        targets.append((label, p_samples, h264_p, h264_allowed))

    # B-slice surface: warm DPB (IDR + P with exported motion), mutate
    # the B packets — direct modes, two-list MV prediction, implicit
    # weights, POC reordering (CAVLC and CABAC variants)
    for label, xparams in (("h264_b_cavlc", "cabac=0:bframes=3:b-adapt=0"),
                           ("h264_b_cabac", "bframes=3:b-adapt=0")):
        binter = _seed_h264_bframes(xparams)
        if binter is None:
            continue
        ed_b, warm_b, b_samples = binter

        def h264_b(blob, _rng, _ed=ed_b, _warm=tuple(warm_b)):
            d = PureH264Decoder()
            d.decode_annexb(_ed)
            for wpk in _warm:
                d.decode_annexb(wpk)
            d.decode_annexb(blob)
            d.flush()

        targets.append((label, b_samples, h264_b, h264_allowed))

    def h264_dcr(blob, _rng):
        PureH264Decoder(blob)

    targets.append(("h264_dcr", [dcr_pure], h264_dcr, h264_allowed))

    # --- FLAC (MP4 audio samples / media uploads) ---
    from mixlab_tpu.av.flacdec import FlacDecoder, FlacError

    streaminfo, flac_frames = _seed_flac()

    def flac_frame(blob, _rng):
        FlacDecoder(streaminfo).decode_frame(blob)

    def flac_streaminfo(blob, _rng):
        FlacDecoder(blob)

    targets.append(("flac_frame", flac_frames, flac_frame, (FlacError,)))
    targets.append(("flac_streaminfo", [streaminfo], flac_streaminfo,
                    (FlacError,)))

    # --- Ogg/Vorbis (Icecast socket bytes) ---
    # seed with a REAL Ogg/Vorbis stream so mutations reach the Vorbis
    # header/packet decode, not just the capture-pattern scan (an
    # unseeded run reports 100% "decoded" because garbage silently
    # buffers while the splitter waits for OggS)
    from mixlab_tpu.av.ogg import OggError
    from mixlab_tpu.av.vorbis import OggVorbisStream

    ogg_seeds = []
    _ogg_fixture = ("/opt/venv/lib/python3.12/site-packages/pygame/"
                    "examples/data/house_lo.ogg")
    try:
        with open(_ogg_fixture, "rb") as f:
            ogg_seeds.append(f.read(48 * 1024))
    except OSError:
        pass

    def vorbis(blob, _rng):
        st = OggVorbisStream()
        # random chunking exercises the incremental reassembly too
        pos = 0
        while pos < len(blob):
            take = int(_rng.integers(1, 4097))
            st.feed(blob[pos:pos + take])
            pos += take

    targets.append(("vorbis_stream", ogg_seeds, vorbis,
                    (OggError, ValueError, EOFError)))

    # --- MP3 (Icecast socket bytes) ---
    from mixlab_tpu.av.mp3 import Mp3Error, Mp3FrameSplitter

    mp3_seeds = []
    try:
        with open(_ogg_fixture[:-4] + ".mp3", "rb") as f:
            mp3_seeds.append(f.read(32 * 1024))
    except OSError:
        pass

    def mp3(blob, _rng):
        Mp3FrameSplitter().feed(blob)

    targets.append(("mp3_splitter", mp3_seeds, mp3, (Mp3Error,)))

    # --- JPEG / Y4M / WAV (media library uploads) ---
    from mixlab_tpu.av.jpeg import JpegError, decode_jpeg
    from mixlab_tpu.av.y4m import Y4mError, Y4mReader
    from mixlab_tpu.io_host.wav import WavError, parse_header

    # tiny baseline JPEG seed via PIL if available
    jpeg_seeds = []
    try:
        import io as _io

        from PIL import Image

        rng0 = np.random.default_rng(9)
        img = Image.fromarray(
            rng0.integers(0, 256, (32, 48, 3), dtype=np.uint8))
        for q in (20, 85):
            b = _io.BytesIO()
            img.save(b, "JPEG", quality=q)
            jpeg_seeds.append(b.getvalue())
    except ImportError:
        pass

    def jpeg(blob, _rng):
        decode_jpeg(blob)

    def y4m(blob, _rng):
        import io as _io

        r = Y4mReader(_io.BytesIO(blob))
        for _ in range(4):
            if r.read_frame() is None:
                break

    def wav(blob, _rng):
        parse_header(blob)

    targets.append(("jpeg", jpeg_seeds, jpeg, (JpegError,)))
    targets.append(("y4m", [b"YUV4MPEG2 W16 H8 F30:1 C420\nFRAME\n" + bytes(192)],
                    y4m, (Y4mError, ValueError)))
    targets.append(("wav_header", [], wav, (WavError,)))

    # --- MP4 (media library uploads / blob streams) ---
    from mixlab_tpu.av import mp4
    from mixlab_tpu.av.mp4read import Mp4Error, Mp4Reader
    from mixlab_tpu.utils.mtime import MediaDuration

    params = mp4.Mp4Params(
        timescale=48000, width=64, height=48,
        dcr=dcr_pure, sample_rate=48000, channels=2, audio_codec="flac",
        flac_streaminfo_block=bytes(34),
    )
    mux, seed_mp4 = mp4.Mp4Mux.create(params)
    for k in range(3):
        seed_mp4 += mux.write_track(
            MediaDuration.new(1024, 48000),
            mp4.FlacFrame(b"\xffhello" + bytes([k]) * 20))
    seed_mp4 = bytes(seed_mp4)

    def mp4_read(blob, _rng):
        r = Mp4Reader(blob)
        for t in r.tracks.values():
            for s in t.samples[:8]:
                r.sample_data(s)

    targets.append(("mp4_reader", [seed_mp4], mp4_read, (Mp4Error,)))

    # --- AMF0 (RTMP command messages, raw network bytes) ---
    from mixlab_tpu.io_host.rtmp import amf0

    seed_amf = amf0.encode_all(
        ["connect", 1.0, {"app": "live", "flashVer": "x"}, None, True])

    def amf(blob, _rng):
        amf0.decode_all(blob)

    targets.append(("amf0", [seed_amf], amf, (amf0.Amf0Error,)))

    # --- FLV tag bodies (RTMP publish payloads) ---
    from mixlab_tpu.av import flv

    def flv_tags(blob, _rng):
        try:
            flv.AudioPacket.parse(blob)
        except flv.FlvError:
            pass
        flv.VideoPacket.parse(blob)

    targets.append(("flv_packets", [], flv_tags, (flv.FlvError,)))

    # --- protocol wire envelope (WebSocket JSON; the server treats
    # ValueError/JSONDecodeError as skip-message, anything past
    # parse_envelope disconnects the one session — server/app.py:319) ---
    import json

    from mixlab_tpu.protocol import wire

    def wire_envelope(blob, _rng):
        wire.parse_envelope(blob)

    targets.append(("wire_envelope",
                    [b'{"v":1,"kind":"Workspace","body":{}}'],
                    wire_envelope, (ValueError, json.JSONDecodeError)))

    # --- HTTP request head (every server port speaks this first) ---
    import asyncio

    from mixlab_tpu.server.http import HttpError, read_request

    def http_head(blob, _rng):
        async def go():
            r = asyncio.StreamReader()
            r.feed_data(blob)
            r.feed_eof()
            while await read_request(r) is not None:
                pass

        asyncio.run(go())

    http_seed = (b"GET /session HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                 b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                 b"Sec-WebSocket-Extensions: permessage-deflate\r\n\r\n")
    targets.append(("http_request", [http_seed], http_head, (HttpError,)))

    # --- WebSocket frames post-handshake (session + monitor sockets) ---
    from mixlab_tpu.server import ws as ws_mod

    class _FuzzReader:
        def __init__(self, data):
            self.buf = bytearray(data)

        async def readexactly(self, n):
            if n > len(self.buf):
                raise asyncio.IncompleteReadError(bytes(self.buf), n)
            out = bytes(self.buf[:n])
            del self.buf[:n]
            return out

    class _FuzzWriter:
        def write(self, data):
            pass

        async def drain(self):
            pass

        def close(self):
            pass

    def _mask_frame(op, payload, fin=True, rsv1=False):
        import struct as _s
        head = bytearray([(0x80 if fin else 0) | (0x40 if rsv1 else 0) | op])
        n = len(payload)
        if n < 126:
            head.append(0x80 | n)
        elif n < 65536:
            head.append(0x80 | 126)
            head += _s.pack(">H", n)
        else:
            head.append(0x80 | 127)
            head += _s.pack(">Q", n)
        key = b"\x01\x02\x03\x04"
        return bytes(head) + key + bytes(
            b ^ key[i % 4] for i, b in enumerate(payload))

    ws_seed = (_mask_frame(1, b'{"v":1,"kind":"Workspace","m":{}}')
               + _mask_frame(9, b"ping")
               + _mask_frame(2, bytes(300), fin=False)
               + _mask_frame(0, bytes(300))
               + _mask_frame(8, b"\x03\xe8"))

    def ws_frames(blob, _rng):
        async def go():
            sock = ws_mod.WebSocket(
                _FuzzReader(blob), _FuzzWriter(),
                deflate=bool(_rng.integers(0, 2)))
            for _ in range(32):
                if await sock.recv() is None:
                    break

        asyncio.run(go())

    # contract: recv returns messages or None — never raises
    targets.append(("ws_frames", [ws_seed], ws_frames, ()))

    # --- full RTMP session (handshake + chunk stream + AMF0 commands +
    # AV tag dispatch into the pure-tier decoder) ---
    from mixlab_tpu.av import flv
    from mixlab_tpu.io_host import source as source_mod
    from mixlab_tpu.io_host.rtmp import server as rtmp_server
    from mixlab_tpu.io_host.rtmp.chunk import (
        MSG_AUDIO,
        MSG_COMMAND_AMF0,
        MSG_VIDEO,
        ChunkWriter,
        Message,
    )
    from mixlab_tpu.io_host.rtmp.handshake import HANDSHAKE_LEN

    class _Sink:
        def write(self, data):
            pass

    def _capture_session() -> bytes:
        buf = bytearray()

        class _W:
            def write(self, data):
                buf.extend(data)

        cw = ChunkWriter(_W())
        buf += b"\x03" + bytes(HANDSHAKE_LEN)          # C0+C1
        buf += bytes(HANDSHAKE_LEN)                     # C2
        cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
            "connect", 1.0, {"app": "deepfuzz", "flashVer": "x"})))
        cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
            "createStream", 2.0, None)))
        cw.write_message(Message(0, MSG_COMMAND_AMF0, 0, amf0.encode_all(
            "publish", 3.0, None, "key", "live")))
        asc_frames = _seed_aac()
        asc_body = b"\xaf\x00" + bytes([0x12, 0x10])    # AAC-LC 44.1k stereo
        cw.write_message(Message(0, MSG_AUDIO, 1, asc_body))
        for i, fr in enumerate(asc_frames[:2]):
            cw.write_message(Message(10 * i, MSG_AUDIO, 1,
                                     b"\xaf\x01" + fr[7:]))
        dcr_b, samples = dcr_pure, pure_samples
        cw.write_message(Message(0, MSG_VIDEO, 1, flv.VideoPacket(
            flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.SEQUENCE_HEADER,
            0, dcr_b).to_bytes()))
        for i, s in enumerate(samples[:2]):
            cw.write_message(Message(40 * i, MSG_VIDEO, 1, flv.VideoPacket(
                flv.VideoFrameType.KEY_FRAME, flv.VideoPacketType.NALU,
                0, s).to_bytes()))
        return bytes(buf)

    rtmp_seed = _capture_session()

    def rtmp_session(blob, _rng):
        recv = source_mod.RTMP_MOUNTPOINTS.listen("deepfuzz")
        try:
            async def go():
                r = _FuzzReader(blob)
                w = _FuzzWriter()
                old = rtmp_server.DECODER_FACTORY
                rtmp_server.DECODER_FACTORY = rtmp_server.PureTierDecoder
                try:
                    await rtmp_server.accept(r, w)
                finally:
                    rtmp_server.DECODER_FACTORY = old

            asyncio.run(go())
        finally:
            recv.close()

    targets.append(("rtmp_session", [rtmp_seed], rtmp_session,
                    (ConnectionError, asyncio.IncompleteReadError)))

    # --- session dispatch: /session envelopes through the EXACT server
    # decode path, plus decoded messages into a live engine ---
    # Structural JSON mutation (not just byte noise): valid JSON with
    # type-confused leaves is the class that killed the engine thread
    # pre-round-4 (a string freq detonated inside module prepare during
    # graph rebuild — see tests/test_session_hostile.py).
    import json as _json

    from mixlab_tpu import protocol as proto
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.engine import Engine
    from mixlab_tpu.protocol import wire

    _LEAF_POOL = [
        None, True, False, 0, 1, -1, 2 ** 63, 10 ** 400, 0.5, -1e308,
        float("nan"), float("inf"), "", "evil", "sine", "Oscillator",
        [], {}, [1, 1], {"t": "DeleteModule"}, "0" * 300,
    ]

    def _mutate_json(rng, node, depth=0):
        if depth < 6 and rng.integers(0, 4) == 0:
            return _LEAF_POOL[int(rng.integers(0, len(_LEAF_POOL)))]
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                r = rng.integers(0, 12)
                if r == 0:
                    continue  # drop key
                out[k] = _mutate_json(rng, v, depth + 1)
            if rng.integers(0, 6) == 0:
                out["x" * int(rng.integers(1, 4))] = _LEAF_POOL[
                    int(rng.integers(0, len(_LEAF_POOL)))]
            return out
        if isinstance(node, list):
            out = [_mutate_json(rng, v, depth + 1) for v in node
                   if rng.integers(0, 12) > 0]
            if rng.integers(0, 8) == 0:
                out = out * int(rng.integers(2, 5))
            return out
        if isinstance(node, bool) or node is None:
            return node
        if isinstance(node, (int, float)) and rng.integers(0, 3) == 0:
            return node * int(rng.integers(-3, 4)) + int(rng.integers(0, 9))
        return node

    _session_seeds = [
        _json.dumps({"v": 1, "kind": "Workspace", "m": m}).encode()
        for m in (
            {"t": "WorkspaceMessage", "sequence": 1, "op": {
                "t": "CreateModule",
                "params": {"kind": "Oscillator",
                           "params": {"freq": 440.0, "waveform": "sine"}},
                "geometry": {"position": {"x": 1, "y": 2}, "z_index": 3}}},
            {"t": "WorkspaceMessage", "sequence": 2, "op": {
                "t": "CreateModule",
                "params": {"kind": "Mixer",
                           "params": {"channels": [
                               {"gain": -6.0, "fader": 0.7, "cue": False}] * 2}},
                "geometry": {}}},
            {"t": "WorkspaceMessage", "sequence": 3, "op": {
                "t": "CreateConnection", "input_id": [2, 0],
                "output_id": [1, 1]}},
            {"t": "WorkspaceMessage", "sequence": 4, "op": {
                "t": "UpdateModuleParams", "module_id": 1,
                "params": {"kind": "Oscillator",
                           "params": {"freq": 880.0, "waveform": "square"}}}},
            {"t": "WorkspaceMessage", "sequence": 5, "op": {
                "t": "DeleteModule", "module_id": 1}},
        )
    ]

    # one long-lived direct-drive engine (commands run synchronously);
    # client_update's transactional guard means it must NEVER raise
    _eng = Engine(cfg=EngineConfig(sample_rate=44_100))
    _sid, _, _ = _eng.connect_session()

    def session_dispatch(blob, _rng):
        if _rng.integers(0, 2):
            payload = blob  # byte-mutated envelope
        else:  # structural mutation of a valid envelope
            seed = _session_seeds[int(_rng.integers(0, len(_session_seeds)))]
            payload = _json.dumps(
                _mutate_json(_rng, _json.loads(seed))).encode()
        # exact server path (server/app.py session loop)
        try:
            kind, body = wire.parse_envelope(payload)
            wsmsg = (wire.decode(body, proto.WorkspaceMessage)
                     if kind == "Workspace" else None)
        except ValueError:
            return
        if wsmsg is None:
            return
        # subsample engine application: each decodable op can trigger a
        # graph rebuild (jit compile) — full-rate would dominate runtime
        if _rng.integers(0, 12) != 0:
            return
        if len(_eng.ws.modules) > 6:
            for mid in list(_eng.ws.modules):
                _eng.client_update(_sid, proto.WorkspaceMessage(
                    0, proto.DeleteModule(mid)))
        _eng.client_update(_sid, wsmsg)  # contract: never raises

    targets.append(("session_dispatch", _session_seeds, session_dispatch, ()))

    return targets


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    master = int(sys.argv[2]) if len(sys.argv) > 2 else int.from_bytes(
        __import__("os").urandom(8), "little")
    print(f"deepfuzz: N={n} per target, master_seed={master}")
    findings = []
    for name, seeds, feed, allowed in build_targets():
        rng = np.random.default_rng((master, hash(name) & 0xFFFFFFFF))
        ok = caught = 0
        for i in range(n):
            if seeds and rng.integers(0, 8) > 0:
                blob = _mutate(rng, seeds[int(rng.integers(0, len(seeds)))])
            else:
                blob = _mutate(rng, b"")
            try:
                feed(blob, rng)
                ok += 1
            except allowed:
                caught += 1
            except Exception as e:  # noqa: BLE001 - the whole point
                path = f"/tmp/deepfuzz_{name}_{i}.bin"
                with open(path, "wb") as f:
                    f.write(blob)
                findings.append((name, i, type(e).__name__, str(e)[:200],
                                 path))
                print(f"FINDING {name}[{i}]: {type(e).__name__}: "
                      f"{str(e)[:200]} -> {path}")
                traceback.print_exc(limit=6)
        print(f"  {name}: {n} trials, {ok} decoded/parsed, {caught} typed "
              f"errors, {n - ok - caught} FINDINGS")
    if findings:
        print(f"\n{len(findings)} finding(s); repro blobs in /tmp")
        return 1
    print("\ndeepfuzz: all targets clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
