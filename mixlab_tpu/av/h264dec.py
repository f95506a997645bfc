"""Pure-Python CAVLC intra H.264 decoder (zero dependencies).

The inverse of the zero-dep encoder tier (av/h264cavlc.py + av/h264enc.py):
IDR I-slices, CAVLC entropy coding, Intra_16x16 macroblocks with DC
prediction, plus I_PCM — exactly the stream shapes the pure encoders emit
(and the monitor/stream profiles use: all-key-frames,
``src/module/monitor.rs:21-22``).  Two jobs:

  * an in-tree round-trip oracle for the pure encoder that is independent
    of libavcodec (tests decode our own streams and compare against the
    encoder's decoder-exact reconstruction, spec 8.5), and
  * zero-dependency RTMP video ingest: ``PureH264Decoder`` is duck-type
    compatible with ``native/avshim.VideoDecoder`` (rtmp/mod.rs:260-338
    uses ffmpeg here; this build falls back to the pure tier on images
    with no codec libraries).

Out of scope (rejected with a typed error, never mis-decoded): CABAC,
inter prediction, I_4x4/I_8x8 macroblocks, non-DC Intra_16x16 prediction
modes, fields, and slices with deblocking enabled — the general case is
what the libavcodec shim is for.

Spec references: ITU-T H.264 §7.3 (syntax), §8.3 (intra prediction),
§8.5 (transform/dequant), §9.1/9.2 (Exp-Golomb, CAVLC).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from mixlab_tpu.av.h264cavlc import (
    CHROMA_DC_COEFF_TOKEN_BITS,
    CHROMA_DC_COEFF_TOKEN_LEN,
    CHROMA_DC_TOTAL_ZEROS_BITS,
    CHROMA_DC_TOTAL_ZEROS_LEN,
    COEFF_TOKEN_BITS,
    COEFF_TOKEN_LEN,
    RUN_BITS,
    RUN_LEN,
    TOTAL_ZEROS_BITS,
    TOTAL_ZEROS_LEN,
    ZIGZAG,
    _BLK_POS,
    _H2,
    _H4,
    _QPC,
    _V_A,
    dequant4x4,
    idct4x4,
)
from mixlab_tpu.av.sps import SpsInfo, _BitReader, parse_sps


class H264DecodeError(Exception):
    pass


# ---------------------------------------------------------------------------
# bit reading
# ---------------------------------------------------------------------------


class BitReader(_BitReader):
    """sps.py's un-escaping reader plus the extras slice decoding needs."""

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7

    def _stop_bit(self) -> int:
        """Position of the rbsp_stop_one_bit (the last set bit), cached —
        a per-macroblock rescan would be O(stream^2)."""
        cached = getattr(self, "_stop_bit_pos", None)
        if cached is not None:
            return cached
        last = len(self.data) * 8 - 1
        while last >= 0:
            byte = self.data[last >> 3]
            if (byte >> (7 - (last & 7))) & 1:
                break
            last -= 1
        self._stop_bit_pos = last
        return last

    def more_rbsp_data(self) -> bool:
        """True while bits other than the rbsp_stop_one_bit + padding
        remain (spec 7.2)."""
        return self.pos < self._stop_bit()


# ---------------------------------------------------------------------------
# inverted CAVLC tables (prefix-code decode maps keyed (length, bits))
# ---------------------------------------------------------------------------


def _invert(len_tab, bits_tab, value_of):
    m: Dict[Tuple[int, int], int] = {}
    for idx, (ln, bits) in enumerate(zip(len_tab, bits_tab)):
        if ln == 0 and idx != 0:
            continue  # unused entry
        if ln == 0:
            continue
        m[(ln, bits)] = value_of(idx)
    return m


_COEFF_TOKEN_DEC = tuple(
    _invert(COEFF_TOKEN_LEN[cls], COEFF_TOKEN_BITS[cls], lambda i: i)
    for cls in range(4)
)
_CHROMA_DC_TOKEN_DEC = _invert(
    CHROMA_DC_COEFF_TOKEN_LEN[0], CHROMA_DC_COEFF_TOKEN_BITS[0], lambda i: i
)
_TOTAL_ZEROS_DEC = tuple(
    _invert(TOTAL_ZEROS_LEN[t], TOTAL_ZEROS_BITS[t], lambda i: i)
    for t in range(16)
)
_CHROMA_DC_TZ_DEC = tuple(
    _invert(CHROMA_DC_TOTAL_ZEROS_LEN[t], CHROMA_DC_TOTAL_ZEROS_BITS[t],
            lambda i: i)
    for t in range(3)
)
_RUN_DEC = tuple(
    _invert(RUN_LEN[t], RUN_BITS[t], lambda i: i) for t in range(7)
)


def _read_prefix(r: BitReader, table: Dict[Tuple[int, int], int],
                 max_len: int = 16) -> int:
    bits = 0
    for ln in range(1, max_len + 1):
        bits = (bits << 1) | r.bit()
        v = table.get((ln, bits))
        if v is not None:
            return v
    raise H264DecodeError("bad prefix code")


def read_cavlc_block(r: BitReader, nC: int, max_coeff: int) -> List[int]:
    """Inverse of h264cavlc.write_cavlc_block: -> scan-order coefficient
    list of length ``max_coeff``."""
    if nC == -1:
        idx = _read_prefix(r, _CHROMA_DC_TOKEN_DEC, 8)
    else:
        cls = 0 if nC < 2 else 1 if nC < 4 else 2 if nC < 8 else 3
        idx = _read_prefix(r, _COEFF_TOKEN_DEC[cls], 16)
    total, t1s = idx // 4, idx % 4
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs

    levels: List[int] = []  # highest-frequency first
    for _ in range(t1s):
        levels.append(-1 if r.bit() else 1)

    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    first = True
    for _ in range(total - t1s):
        prefix = 0
        while r.bit() == 0:
            prefix += 1
            if prefix > 15:
                raise H264DecodeError("level prefix overflow")
        if suffix_len == 0:
            if prefix < 14:
                level_code = prefix
            elif prefix == 14:
                level_code = 14 + r.bits(4)
            else:
                level_code = 30 + r.bits(12)
        else:
            if prefix < 14:
                level_code = (prefix << suffix_len) + r.bits(suffix_len)
            elif prefix == 14:
                level_code = (14 << suffix_len) + r.bits(suffix_len)
            else:
                level_code = (15 << suffix_len) + r.bits(12)
        if first and t1s < 3:
            level_code += 2
        first = False
        lev = (level_code >> 1) + 1
        if level_code & 1:
            lev = -lev
        levels.append(lev)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lev) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    if total < max_coeff:
        if max_coeff == 4:  # chroma DC
            tz = _read_prefix(r, _CHROMA_DC_TZ_DEC[total - 1], 8)
        else:
            tz = _read_prefix(r, _TOTAL_ZEROS_DEC[total - 1], 16)
    else:
        tz = 0

    # positions, highest-frequency coefficient first
    pos = [0] * total
    zeros_left = tz
    pos[total - 1] = total - 1 + tz
    for k in range(total - 1, 0, -1):
        if zeros_left > 0:
            run = _read_prefix(r, _RUN_DEC[min(zeros_left, 7) - 1], 16)
        else:
            run = 0
        pos[k - 1] = pos[k] - run - 1
        zeros_left -= run

    # levels[0] belongs to the highest position
    for i, lev in enumerate(levels):
        coeffs[pos[total - 1 - i]] = lev
    return coeffs


# ---------------------------------------------------------------------------
# parameter sets / slice header
# ---------------------------------------------------------------------------


class _Pps:
    def __init__(self, rbsp: bytes):
        r = BitReader(rbsp)
        self.id = r.ue()
        self.sps_id = r.ue()
        if r.bit():
            raise H264DecodeError("CABAC streams unsupported (pure tier)")
        self.bottom_field_poc = r.bit()
        if r.ue() != 0:
            raise H264DecodeError("slice groups unsupported")
        r.ue()  # num_ref_idx_l0
        r.ue()  # num_ref_idx_l1
        r.bit()  # weighted_pred
        r.bits(2)  # weighted_bipred
        self.pic_init_qp = 26 + r.se()
        r.se()  # pic_init_qs
        self.chroma_qp_offset = r.se()
        self.deblocking_control = r.bit()
        r.bit()  # constrained_intra_pred
        r.bit()  # redundant_pic_cnt_present


class _SpsExt:
    """SPS fields the slice header consumes beyond SpsInfo."""

    def __init__(self, rbsp: bytes):
        self.info: SpsInfo = parse_sps(rbsp)
        # re-parse the few position-dependent fields we need
        r = BitReader(rbsp)
        profile_idc = r.bits(8)
        r.bits(8)
        r.bits(8)
        r.ue()
        if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                           139, 134, 135):
            cf = r.ue()
            if cf == 3:
                r.bit()
            r.ue()
            r.ue()
            r.bit()
            if r.bit():
                raise H264DecodeError("scaling matrices unsupported")
        self.log2_max_frame_num = r.ue() + 4
        self.poc_type = r.ue()
        self.log2_max_poc_lsb = 0
        if self.poc_type == 0:
            self.log2_max_poc_lsb = r.ue() + 4
        elif self.poc_type == 1:
            r.bit()
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()
        r.bit()
        self.mb_width = r.ue() + 1
        self.mb_height = r.ue() + 1
        if not r.bit():
            raise H264DecodeError("interlaced streams unsupported")


# ---------------------------------------------------------------------------
# macroblock reconstruction (mirrors the encoder's decoder-exact recon)
# ---------------------------------------------------------------------------


def _dc_pred16(recon, y0, x0, has_top, has_left) -> int:
    if has_top and has_left:
        return (int(recon[y0 - 1, x0 : x0 + 16].sum())
                + int(recon[y0 : y0 + 16, x0 - 1].sum()) + 16) >> 5
    if has_top:
        return (int(recon[y0 - 1, x0 : x0 + 16].sum()) + 8) >> 4
    if has_left:
        return (int(recon[y0 : y0 + 16, x0 - 1].sum()) + 8) >> 4
    return 128


def _dc_pred_chroma(recon, y0, x0, has_top, has_left) -> np.ndarray:
    pred = np.empty((8, 8), np.int64)
    for sy in (0, 4):
        for sx in (0, 4):
            top = recon[y0 - 1, x0 + sx : x0 + sx + 4] if has_top else None
            left = recon[y0 + sy : y0 + sy + 4, x0 - 1] if has_left else None
            corner = (sx == 0 and sy == 0) or (sx == 4 and sy == 4)
            if corner and has_top and has_left:
                v = (int(top.sum()) + int(left.sum()) + 4) >> 3
            elif sx == 4 and sy == 0:
                if has_top:
                    v = (int(top.sum()) + 2) >> 2
                elif has_left:
                    v = (int(left.sum()) + 2) >> 2
                else:
                    v = 128
            elif sx == 0 and sy == 4:
                if has_left:
                    v = (int(left.sum()) + 2) >> 2
                elif has_top:
                    v = (int(top.sum()) + 2) >> 2
                else:
                    v = 128
            else:
                if has_top and has_left:
                    v = (int(top.sum()) + int(left.sum()) + 4) >> 3
                elif has_top:
                    v = (int(top.sum()) + 2) >> 2
                elif has_left:
                    v = (int(left.sum()) + 2) >> 2
                else:
                    v = 128
            pred[sy : sy + 4, sx : sx + 4] = v
    return pred


class _SliceDecoder:
    def __init__(self, sps: _SpsExt, pps: _Pps):
        self.sps = sps
        self.pps = pps
        mbw, mbh = sps.mb_width, sps.mb_height
        self.mbw, self.mbh = mbw, mbh
        self.ry = np.zeros((mbh * 16, mbw * 16), np.int64)
        self.ru = np.zeros((mbh * 8, mbw * 8), np.int64)
        self.rv = np.zeros((mbh * 8, mbw * 8), np.int64)
        self.nnz_y = np.zeros((mbh * 4, mbw * 4), np.int16)
        self.nnz_u = np.zeros((mbh * 2, mbw * 2), np.int16)
        self.nnz_v = np.zeros((mbh * 2, mbw * 2), np.int16)

    def _nC(self, nnz, mx, my, bx, by, grid) -> int:
        def lookup(tx, ty):
            mx2, my2 = mx, my
            if tx < 0:
                mx2 -= 1
                tx += grid
            if ty < 0:
                my2 -= 1
                ty += grid
            if mx2 < 0 or my2 < 0:
                return None
            return nnz[my2 * grid + ty, mx2 * grid + tx]

        nA = lookup(bx - 1, by)
        nB = lookup(bx, by - 1)
        if nA is not None and nB is not None:
            return (int(nA) + int(nB) + 1) >> 1
        if nA is not None:
            return int(nA)
        if nB is not None:
            return int(nB)
        return 0

    def decode_slice(self, r: BitReader, nal_unit_type: int):
        sps, pps = self.sps, self.pps
        first_mb = r.ue()
        slice_type = r.ue()
        if slice_type % 5 != 2:
            raise H264DecodeError(f"non-I slice {slice_type} unsupported")
        r.ue()  # pps id (single-PPS streams)
        r.bits(sps.log2_max_frame_num)  # frame_num
        if nal_unit_type == 5:
            r.ue()  # idr_pic_id
        if sps.poc_type == 0:
            r.bits(sps.log2_max_poc_lsb)
        if nal_unit_type == 5:
            r.bit()  # no_output_of_prior_pics
            r.bit()  # long_term_reference
        qp = pps.pic_init_qp + r.se()
        if pps.deblocking_control:
            if r.ue() != 1:
                # the pure recon path has no deblocking filter; decoding a
                # filtered stream would silently drift
                raise H264DecodeError("deblocking-enabled slice unsupported")

        mb_addr = first_mb
        n_mbs = self.mbw * self.mbh
        while mb_addr < n_mbs and r.more_rbsp_data():
            self._decode_mb(r, mb_addr % self.mbw, mb_addr // self.mbw, qp)
            mb_addr += 1
        if mb_addr != n_mbs:
            raise H264DecodeError(
                f"slice ended after {mb_addr}/{n_mbs} macroblocks"
            )

    def _decode_mb(self, r: BitReader, mx: int, my: int, qp: int):
        mb_type = r.ue()
        y0, x0 = my * 16, mx * 16
        cy0, cx0 = my * 8, mx * 8
        if mb_type == 25:  # I_PCM (§7.3.5, §8.3.5)
            r.byte_align()
            for yy in range(16):
                for xx in range(16):
                    self.ry[y0 + yy, x0 + xx] = r.bits(8)
            for plane in (self.ru, self.rv):
                for yy in range(8):
                    for xx in range(8):
                        plane[cy0 + yy, cx0 + xx] = r.bits(8)
            # I_PCM sets nnz to 16 for prediction context (spec 9.2.1)
            self.nnz_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
            self.nnz_u[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
            self.nnz_v[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
            return
        if not 1 <= mb_type <= 24:
            raise H264DecodeError(
                f"mb_type {mb_type} unsupported (Intra_16x16/I_PCM only)"
            )
        code = mb_type - 1
        pred_mode = code % 4
        cbp_chroma = (code // 4) % 3
        cbp_luma = 15 if code >= 12 else 0
        if pred_mode != 2:
            raise H264DecodeError(
                f"Intra_16x16 prediction mode {pred_mode} unsupported (DC only)"
            )
        if r.ue() != 0:
            raise H264DecodeError("chroma prediction mode != DC unsupported")
        qp = qp + r.se()  # mb_qp_delta (per-MB scope is fine intra-only)
        qpc_i = int(np.clip(qp + self.pps.chroma_qp_offset, 0, 51))
        qpc = qpc_i if qpc_i < 30 else _QPC[qpc_i - 30]
        has_top, has_left = my > 0, mx > 0

        # ---- luma DC coefficients ----------------------------------------
        nC = self._nC(self.nnz_y, mx, my, 0, 0, 4)
        dc_scan = read_cavlc_block(r, nC, 16)
        ZD = np.zeros(16, np.int64)
        for i, z in enumerate(ZIGZAG):
            ZD[z] = dc_scan[i]
        ZD = ZD.reshape(4, 4)

        # ---- luma AC ------------------------------------------------------
        self.nnz_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
        ZA = np.zeros((16, 4, 4), np.int64)
        if cbp_luma:
            for i, (bx, by) in enumerate(_BLK_POS):
                nC = self._nC(self.nnz_y, mx, my, bx, by, 4)
                scan = read_cavlc_block(r, nC, 15)
                flat = np.zeros(16, np.int64)
                for k, z in enumerate(ZIGZAG[1:]):
                    flat[z] = scan[k]
                ZA[i] = flat.reshape(4, 4)
                self.nnz_y[my * 4 + by, mx * 4 + bx] = int(
                    np.count_nonzero(scan)
                )

        # ---- chroma coefficients -----------------------------------------
        CZD = [np.zeros((2, 2), np.int64), np.zeros((2, 2), np.int64)]
        CZA = [np.zeros((4, 4, 4), np.int64), np.zeros((4, 4, 4), np.int64)]
        if cbp_chroma:
            for comp in range(2):
                scan = read_cavlc_block(r, -1, 4)
                CZD[comp] = np.array(
                    [[scan[0], scan[1]], [scan[2], scan[3]]], np.int64
                )
        for comp in range(2):
            nnz_c = self.nnz_u if comp == 0 else self.nnz_v
            nnz_c[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
            if cbp_chroma == 2:
                for i in range(4):
                    nC = self._nC(nnz_c, mx, my, i % 2, i // 2, 2)
                    scan = read_cavlc_block(r, nC, 15)
                    flat = np.zeros(16, np.int64)
                    for k, z in enumerate(ZIGZAG[1:]):
                        flat[z] = scan[k]
                    CZA[comp][i] = flat.reshape(4, 4)
                    nnz_c[my * 2 + i // 2, mx * 2 + i % 2] = int(
                        np.count_nonzero(scan)
                    )

        # ---- reconstruction (identical math to the encoder's recon) ------
        qp6, rem = divmod(qp, 6)
        FD = _H4 @ ZD @ _H4
        if qp >= 12:
            dcY = (FD * _V_A[rem]) << (qp6 - 2)
        else:
            dcY = (FD * _V_A[rem] + (1 << (1 - qp6))) >> (2 - qp6)
        DQ = dequant4x4(ZA, qp)
        for i, (bx, by) in enumerate(_BLK_POS):
            DQ[i, 0, 0] = dcY[by, bx]
        pred = _dc_pred16(self.ry, y0, x0, has_top, has_left)
        res = (idct4x4(DQ) + 32) >> 6
        mb = np.empty((16, 16), np.int64)
        for i, (bx, by) in enumerate(_BLK_POS):
            mb[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] = res[i]
        self.ry[y0 : y0 + 16, x0 : x0 + 16] = np.clip(mb + pred, 0, 255)

        cqp6, crem = divmod(qpc, 6)
        for comp in range(2):
            recon = self.ru if comp == 0 else self.rv
            cpred = _dc_pred_chroma(recon, cy0, cx0, has_top, has_left)
            CF2 = _H2 @ CZD[comp] @ _H2
            dcC = ((CF2 * _V_A[crem]) << cqp6) >> 1
            CDQ = dequant4x4(CZA[comp], qpc)
            for i in range(4):
                CDQ[i, 0, 0] = dcC[i // 2, i % 2]
            cres = (idct4x4(CDQ) + 32) >> 6
            cmb = np.empty((8, 8), np.int64)
            for i in range(4):
                sy, sx = 4 * (i // 2), 4 * (i % 2)
                cmb[sy : sy + 4, sx : sx + 4] = cres[i]
            recon[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(
                cmb + cpred, 0, 255
            )


# ---------------------------------------------------------------------------
# frame-level API
# ---------------------------------------------------------------------------


def split_annexb(data: bytes) -> List[bytes]:
    """Annex-B start-code split -> raw NAL units (with header byte)."""
    out = []
    i = 0
    n = len(data)
    while i < n:
        # find next start code
        sc = data.find(b"\x00\x00\x01", i)
        if sc < 0:
            break
        start = sc + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = n if nxt < 0 else (nxt - 1 if nxt > 0 and data[nxt - 1] == 0 else nxt)
        unit = data[start:end]
        while unit and unit[-1] == 0:
            unit = unit[:-1]
        if unit:
            out.append(unit)
        i = start if nxt < 0 else nxt
        if nxt < 0:
            break
    return out


def split_avcc(data: bytes, length_size: int = 4) -> List[bytes]:
    out = []
    i = 0
    while i + length_size <= len(data):
        ln = int.from_bytes(data[i : i + length_size], "big")
        i += length_size
        out.append(data[i : i + ln])
        i += ln
    return out


class PureH264Decoder:
    """Stateful decoder, duck-type compatible with avshim.VideoDecoder:
    feed DCR extradata at construction, then ``decode(avcc_payload)`` ->
    [(pts, y, u, v)]."""

    def __init__(self, extradata: bytes = b""):
        self.sps: Optional[_SpsExt] = None
        self.pps: Optional[_Pps] = None
        self.length_size = 4
        if extradata:
            from mixlab_tpu.av.avc import DecoderConfigurationRecord

            dcr = DecoderConfigurationRecord.parse(extradata)
            self.length_size = dcr.nalu_size
            for nu in list(dcr.sps) + list(dcr.pps):
                kind = int(getattr(nu.kind, "value", nu.kind))
                self._feed_nal(bytes([(nu.ref_idc << 5) | kind]) + nu.data)

    def _feed_nal(self, unit: bytes) -> Optional[Tuple[np.ndarray, ...]]:
        if not unit:
            return None
        nal_type = unit[0] & 0x1F
        rbsp = unit[1:]
        if nal_type == 7:
            self.sps = _SpsExt(rbsp)
            return None
        if nal_type == 8:
            self.pps = _Pps(rbsp)
            return None
        if nal_type in (1, 5):
            if self.sps is None or self.pps is None:
                raise H264DecodeError("slice before SPS/PPS")
            import os

            if os.environ.get("MIXLAB_PURE_H264_SCALAR", "0") == "1":
                dec = _SliceDecoder(self.sps, self.pps)
            else:
                # vectorized two-pass decoder (bit-exact vs this scalar
                # oracle; tests/test_h264dec_fast.py)
                from mixlab_tpu.av.h264dec_fast import FastSliceDecoder

                dec = FastSliceDecoder(self.sps, self.pps)
            dec.decode_slice(BitReader(rbsp), nal_type)
            w, h = self.sps.info.width, self.sps.info.height
            y = np.clip(dec.ry, 0, 255).astype(np.uint8)[:h, :w]
            u = np.clip(dec.ru, 0, 255).astype(np.uint8)[: h // 2, : w // 2]
            v = np.clip(dec.rv, 0, 255).astype(np.uint8)[: h // 2, : w // 2]
            return y, u, v
        return None  # SEI/AUD/filler: ignored

    def decode(self, packet: bytes, pts: int = 0):
        out = []
        for unit in split_avcc(packet, self.length_size):
            planes = self._feed_nal(unit)
            if planes is not None:
                out.append((pts, *planes))
        return out

    def decode_annexb(self, data: bytes, pts: int = 0):
        out = []
        for unit in split_annexb(data):
            planes = self._feed_nal(unit)
            if planes is not None:
                out.append((pts, *planes))
        return out

    def close(self):
        pass


def decode_annexb_frame(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-shot: decode an Annex-B access unit containing SPS+PPS+IDR."""
    dec = PureH264Decoder()
    frames = dec.decode_annexb(data)
    if not frames:
        raise H264DecodeError("no decodable slice in stream")
    _, y, u, v = frames[-1]
    return y, u, v
