"""Pure-Python Vorbis I decoder (no ffmpeg, no system codecs).

Capability-parity layer for the reference's pure-Rust Vorbis path
(``/root/reference/codec/src/ogg.rs:55-130``, lewton): the reference ingests
Icecast Ogg/Vorbis mounts with zero system dependencies, so this build must
too.  The Ogg container layer lives in ``av/ogg.py``; this module owns the
Vorbis DSP: codebook entropy/VQ decode, floor type 0 and 1 curve synthesis,
residue types 0/1/2, square-polar channel coupling, IMDCT and windowed
overlap-add (Vorbis I specification sections 3-7).

Decode split, TPU-first: packet entropy decode is inherently serial
byte-twiddling and stays on host (as the reference keeps lewton on a blocking
decode thread, ``src/icecast/mod.rs:101-138``); the numeric back half — floor
curve multiply, IMDCT, windowing — is vectorized numpy here, with a batched
matmul IMDCT (``imdct_batch_jax``) that rides the MXU for offline/bulk
synthesis.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from mixlab_tpu.av.ogg import OggError


class EndOfPacket(Exception):
    """Running out of packet data mid-decode is a defined, non-fatal
    condition in Vorbis (spec 1.1.4): decode keeps what it has."""


class BitReader:
    """LSB-first bit unpacker (Vorbis I spec section 2)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        acc, nbits, pos = self.acc, self.nbits, self.pos
        data = self.data
        while nbits < n:
            if pos >= len(data):
                self.acc, self.nbits, self.pos = acc, nbits, pos
                raise EndOfPacket()
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        val = acc & ((1 << n) - 1)
        self.acc = acc >> n
        self.nbits = nbits - n
        self.pos = pos
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v & (1 << (n - 1)):
            v -= 1 << n
        return v


def ilog(x: int) -> int:
    """Position of the highest set bit; ilog(0)=0 (spec 9.2.1)."""
    return x.bit_length() if x > 0 else 0


def float32_unpack(x: int) -> float:
    """Vorbis' packed float format (spec 9.2.2)."""
    mantissa = x & 0x1FFFFF
    exponent = (x & 0x7FE00000) >> 21
    if x & 0x80000000:
        mantissa = -mantissa
    return mantissa * (2.0 ** (exponent - 788))


def lookup1_values(entries: int, dim: int) -> int:
    """Largest v with v**dim <= entries (spec 9.2.3)."""
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v**dim > entries:
        v -= 1
    return v


# ---------------------------------------------------------------------------
# codebooks
# ---------------------------------------------------------------------------


class Codebook:
    """One codebook: canonical Huffman scalar decode + optional VQ lookup
    (spec 3.2).  Decode tables: an 8-bit accelerator table for short codes,
    falling back to a per-bit prefix map."""

    def __init__(self, br: BitReader):
        if br.read(24) != 0x564342:
            raise OggError("codebook sync lost")
        self.dimensions = br.read(16)
        self.entries = br.read(24)
        lengths: List[int] = [0] * self.entries  # 0 = unused
        if br.read(1):  # ordered
            current_entry = 0
            current_length = br.read(5) + 1
            while current_entry < self.entries:
                number = br.read(ilog(self.entries - current_entry))
                if current_entry + number > self.entries:
                    raise OggError("ordered codebook overflow")
                for i in range(current_entry, current_entry + number):
                    lengths[i] = current_length
                current_entry += number
                current_length += 1
        else:
            sparse = br.read(1)
            for i in range(self.entries):
                if sparse and not br.read(1):
                    continue
                lengths[i] = br.read(5) + 1
        self.lengths = lengths
        self._assign_codewords()

        # VQ lookup (spec 3.2 "vector lookup table")
        self.lookup_type = br.read(4)
        self.vq: Optional[np.ndarray] = None
        if self.lookup_type in (1, 2):
            minimum = float32_unpack(br.read(32))
            delta = float32_unpack(br.read(32))
            value_bits = br.read(4) + 1
            sequence_p = br.read(1)
            if self.lookup_type == 1:
                lv = lookup1_values(self.entries, self.dimensions)
                n_mult = lv
            else:
                n_mult = self.entries * self.dimensions
            mults = np.array([br.read(value_bits) for _ in range(n_mult)], dtype=np.float64)
            dim = self.dimensions
            vq = np.zeros((self.entries, dim), dtype=np.float64)
            if self.lookup_type == 1:
                idx = np.arange(self.entries)
                for j in range(dim):
                    vq[:, j] = mults[(idx // (lv**j)) % lv] * delta + minimum
            else:
                vq = mults.reshape(self.entries, dim) * delta + minimum
            if sequence_p:
                vq = np.cumsum(vq, axis=1)
            self.vq = vq.astype(np.float32)
        elif self.lookup_type != 0:
            raise OggError(f"reserved codebook lookup type {self.lookup_type}")

    def _assign_codewords(self):
        """Canonical Vorbis codeword assignment (spec 3.2.1): each used
        entry, in order, takes the lowest available codeword of its length."""
        self.dec_map = {}
        self.fast_table = [None] * 256  # keyed on next 8 bits (LSB-first)
        self.max_len = 0
        used = [i for i, l in enumerate(self.lengths) if l > 0]
        if not used:
            return
        if len(used) == 1:
            # single-entry codebook: decodes by reading `length` bits (the
            # spec marks single-entry books a special case)
            e = used[0]
            self._add_code(e, 0, self.lengths[e])
            return
        available = [0] * 33
        first = used[0]
        self._add_code(first, 0, self.lengths[first])
        for i in range(1, self.lengths[first] + 1):
            available[i] = 1 << (32 - i)
        for e in used[1:]:
            length = self.lengths[e]
            z = length
            while z > 0 and not available[z]:
                z -= 1
            if z == 0:
                raise OggError("over-subscribed huffman tree")
            res = available[z]
            available[z] = 0
            self._add_code(e, res >> (32 - length), length)
            for y in range(length, z, -1):
                available[y] = res + (1 << (32 - y))

    def _add_code(self, entry: int, code: int, length: int):
        # `code` is MSB-first within its length (first bit read = MSB)
        self.max_len = max(self.max_len, length)
        self.dec_map[(1 << length) | code] = entry
        if length <= 8:
            # preload all 8-bit windows whose prefix (LSB-first stream
            # order) matches this code
            rev = 0
            for b in range(length):
                rev |= ((code >> (length - 1 - b)) & 1) << b
            for fill in range(1 << (8 - length)):
                self.fast_table[rev | (fill << length)] = (entry, length)

    def decode_scalar(self, br: BitReader) -> int:
        # fast path: peek 8 bits
        if br.nbits < 8:
            while br.nbits < 8 and br.pos < len(br.data):
                br.acc |= br.data[br.pos] << br.nbits
                br.pos += 1
                br.nbits += 8
        if br.nbits >= 8:
            hit = self.fast_table[br.acc & 0xFF]
            if hit is not None:
                entry, length = hit
                br.acc >>= length
                br.nbits -= length
                return entry
        code = 0
        length = 0
        dec_map = self.dec_map
        while length < self.max_len:
            code = (code << 1) | br.read(1)
            length += 1
            e = dec_map.get((1 << length) | code)
            if e is not None:
                return e
        raise OggError("invalid huffman code")

    def decode_vq(self, br: BitReader) -> np.ndarray:
        e = self.decode_scalar(br)
        if self.vq is None:
            raise OggError("scalar codebook used in VQ context")
        return self.vq[e]


# ---------------------------------------------------------------------------
# floors
# ---------------------------------------------------------------------------

# floor1 dB amplitude table (spec 10.1): geometric from 1.0649863e-07 up to
# 1.0 over 256 steps
_FLOOR1_INVERSE_DB = (1.0649863e-07 * np.exp(
    (np.log(1.0 / 1.0649863e-07) / 255.0) * np.arange(256)
)).astype(np.float32)


def _bark(x: float) -> float:
    return 13.1 * math.atan(0.00074 * x) + 2.24 * math.atan(1.85e-8 * x * x) + 1e-4 * x


class Floor0:
    """Floor type 0: LSP curve (spec 6). Rare in the wild; implemented for
    parity with lewton's coverage."""

    floor_type = 0

    def __init__(self, br: BitReader, codebooks: List[Codebook]):
        self.order = br.read(8)
        self.rate = br.read(16)
        self.bark_map_size = br.read(16)
        self.amplitude_bits = br.read(6)
        self.amplitude_offset = br.read(8)
        n_books = br.read(4) + 1
        self.book_list = [br.read(8) for _ in range(n_books)]
        for b in self.book_list:
            if b >= len(codebooks) or codebooks[b].vq is None:
                raise OggError("floor0 references invalid codebook")
        self._map_cache = {}

    def decode(self, br: BitReader, codebooks: List[Codebook]):
        amplitude = self.read_amplitude(br)
        if amplitude <= 0:
            return None
        booknumber = br.read(ilog(len(self.book_list)))
        if booknumber >= len(self.book_list):
            return None  # undecodable: channel unused (spec 6.2.2)
        book = codebooks[self.book_list[booknumber]]
        coefficients: List[float] = []
        last = 0.0
        while len(coefficients) < self.order:
            vec = book.decode_vq(br) + last
            last = float(vec[-1])
            coefficients.extend(float(v) for v in vec)
        return (amplitude, coefficients[: self.order])

    def read_amplitude(self, br: BitReader) -> int:
        return br.read(self.amplitude_bits)

    def _bark_map(self, n: int) -> np.ndarray:
        cached = self._map_cache.get(n)
        if cached is not None:
            return cached
        scale = self.bark_map_size / _bark(0.5 * self.rate)
        idx = np.arange(n)
        m = np.minimum(
            self.bark_map_size - 1,
            np.floor(
                np.array([_bark((self.rate / (2.0 * n)) * i) for i in idx]) * scale
            ).astype(np.int64),
        )
        self._map_cache[n] = m
        return m

    def synthesize(self, data, n: int) -> np.ndarray:
        amplitude, coefficients = data
        m = self._bark_map(n)
        cos_c = np.cos(np.asarray(coefficients, dtype=np.float64))
        omega = np.pi * m.astype(np.float64) / self.bark_map_size
        cos_omega = np.cos(omega)
        order = self.order
        odd_c = cos_c[1::2]
        even_c = cos_c[0::2]
        if order % 2:
            p = (1.0 - cos_omega**2) * np.prod(
                [4.0 * (c - cos_omega) ** 2 for c in odd_c[: (order - 1) // 2]], axis=0
            )
            q = 0.25 * np.prod(
                [4.0 * (c - cos_omega) ** 2 for c in even_c[: (order + 1) // 2]], axis=0
            )
        else:
            p = (1.0 - cos_omega) / 2.0 * np.prod(
                [4.0 * (c - cos_omega) ** 2 for c in odd_c[: order // 2]], axis=0
            )
            q = (1.0 + cos_omega) / 2.0 * np.prod(
                [4.0 * (c - cos_omega) ** 2 for c in even_c[: order // 2]], axis=0
            )
        denom = np.sqrt(np.maximum(p + q, 1e-30))
        linear = np.exp(
            0.11512925
            * (
                amplitude
                * self.amplitude_offset
                / ((2**self.amplitude_bits - 1) * denom)
                - self.amplitude_offset
            )
        )
        return linear.astype(np.float32)


class Floor1:
    """Floor type 1: piecewise-linear dB curve (spec 7)."""

    floor_type = 1

    def __init__(self, br: BitReader, codebooks: List[Codebook]):
        partitions = br.read(5)
        self.partition_class = [br.read(4) for _ in range(partitions)]
        max_class = max(self.partition_class, default=-1)
        self.class_dim = []
        self.class_subclasses = []
        self.class_masterbooks = []
        self.subclass_books = []
        for _ in range(max_class + 1):
            self.class_dim.append(br.read(3) + 1)
            sub = br.read(2)
            self.class_subclasses.append(sub)
            self.class_masterbooks.append(br.read(8) if sub else -1)
            books = []
            for _ in range(1 << sub):
                books.append(br.read(8) - 1)  # -1 = no book (zero value)
            self.subclass_books.append(books)
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for p in self.partition_class:
            for _ in range(self.class_dim[p]):
                xs.append(br.read(rangebits))
        self.x_list = xs
        # precompute low/high neighbors + sort order (static per floor)
        self.neighbors = []
        for i in range(2, len(xs)):
            lo = max((j for j in range(i) if xs[j] < xs[i]), key=lambda j: xs[j])
            hi = min((j for j in range(i) if xs[j] > xs[i]), key=lambda j: xs[j])
            self.neighbors.append((lo, hi))
        self.sort_order = sorted(range(len(xs)), key=lambda i: xs[i])
        self.range = [256, 128, 86, 64][self.multiplier - 1]

    def decode(self, br: BitReader, codebooks: List[Codebook]):
        if not br.read(1):
            return None
        rbits = ilog(self.range - 1)
        y = [br.read(rbits), br.read(rbits)]
        for p in self.partition_class:
            cls = p
            cdim = self.class_dim[cls]
            cbits = self.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = codebooks[self.class_masterbooks[cls]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                if book >= 0:
                    y.append(codebooks[book].decode_scalar(br))
                else:
                    y.append(0)
        return y

    def synthesize(self, y: List[int], n: int) -> np.ndarray:
        """Amplitude curve of length n (spec 7.2.3-7.2.4)."""
        rng = self.range
        xs = self.x_list
        final_y = [0] * len(xs)
        step2 = [False] * len(xs)
        final_y[0], final_y[1] = y[0], y[1]
        step2[0] = step2[1] = True
        for i in range(2, len(xs)):
            lo, hi = self.neighbors[i - 2]
            predicted = _render_point(xs[lo], final_y[lo], xs[hi], final_y[hi], xs[i])
            val = y[i] if i < len(y) else 0
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * min(highroom, lowroom)
            if val:
                step2[lo] = step2[hi] = step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final_y[i] = val - lowroom + predicted
                    else:
                        final_y[i] = predicted - (val - highroom) - 1
                else:
                    if val & 1:
                        final_y[i] = predicted - ((val + 1) >> 1)
                    else:
                        final_y[i] = predicted + (val >> 1)
            else:
                step2[i] = False
                final_y[i] = predicted
        # curve synthesis
        floor_y = np.zeros(n, dtype=np.int32)
        mult = self.multiplier
        hx = 0
        hy = 0
        lx = 0
        ly = final_y[self.sort_order[0]] * mult
        for i in self.sort_order:
            if not step2[i]:
                continue
            hx = xs[i]
            hy = final_y[i] * mult
            if hx > lx:
                _render_line(lx, ly, hx, hy, floor_y, n)
            elif hx == 0:
                if hx < n:
                    floor_y[hx] = min(hy, 255)
            lx, ly = hx, hy
        if hx < n:
            _render_line(hx, hy, n, hy, floor_y, n)
        np.clip(floor_y, 0, 255, out=floor_y)
        return _FLOOR1_INVERSE_DB[floor_y]


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, v: np.ndarray, n: int):
    """Integer Bresenham used by floor1 (spec 7.2.4); vectorized: the
    integer line y(x) = y0 + floor((x-x0)*dy/adx) with the spec's truncation
    (base toward zero plus error stepping) equals floor division for dy>=0
    and the sy-stepping for dy<0 reproduced by ceil-like division."""
    dy = y1 - y0
    adx = x1 - x0
    x_end = min(x1, n)
    if x_end <= x0:
        return
    xs = np.arange(x0, x_end) - x0
    # The spec's algorithm produces y0 + sign-aware truncated (xs*dy)/adx:
    # base = trunc(dy/adx); err accumulates |dy| - |base|*adx. Net effect is
    # floor for positive dy and -floor(-..) (ceil) for negative dy.
    if dy >= 0:
        ys = y0 + (xs * dy) // adx
    else:
        ys = y0 - ((xs * (-dy)) // adx)
    v[x0:x_end] = np.clip(ys, 0, 255)


# ---------------------------------------------------------------------------
# residues
# ---------------------------------------------------------------------------


class Residue:
    """Residue types 0/1/2 (spec 8)."""

    def __init__(self, residue_type: int, br: BitReader, codebooks: List[Codebook]):
        self.residue_type = residue_type
        self.begin = br.read(24)
        self.end = br.read(24)
        self.partition_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        if self.classbook >= len(codebooks):
            raise OggError("residue classbook out of range")
        cascades = []
        for _ in range(self.classifications):
            high_bits = 0
            low_bits = br.read(3)
            if br.read(1):
                high_bits = br.read(5)
            cascades.append((high_bits << 3) | low_bits)
        self.books: List[List[int]] = []
        for c in cascades:
            row = []
            for pas in range(8):
                if c & (1 << pas):
                    b = br.read(8)
                    if b >= len(codebooks) or codebooks[b].vq is None:
                        raise OggError("residue book invalid")
                    row.append(b)
                else:
                    row.append(-1)
            self.books.append(row)

    def decode(
        self,
        br: BitReader,
        n_half: int,
        do_not_decode: Sequence[bool],
        codebooks: List[Codebook],
    ) -> np.ndarray:
        """Returns (channels, n_half) float32 residue vectors.

        For type 2 the channels are interleaved into one vector internally
        and deinterleaved on return (spec 8.6.5)."""
        ch = len(do_not_decode)
        if self.residue_type == 2:
            vec_len = n_half * ch
            if all(do_not_decode):
                return np.zeros((ch, n_half), dtype=np.float32)
            vecs = np.zeros((1, vec_len), dtype=np.float32)
            decode_ch = [False]
        else:
            vec_len = n_half
            vecs = np.zeros((ch, vec_len), dtype=np.float32)
            decode_ch = list(do_not_decode)

        limit_begin = min(self.begin, vec_len)
        limit_end = min(self.end, vec_len)
        n_to_read = limit_end - limit_begin
        if n_to_read <= 0:
            out = vecs
        else:
            classbook = codebooks[self.classbook]
            classwords = classbook.dimensions
            partitions_to_read = n_to_read // self.partition_size
            actual_ch = len(decode_ch)
            classifs = np.zeros((actual_ch, partitions_to_read + classwords), dtype=np.int64)
            try:
                for pas in range(8):
                    partition_count = 0
                    while partition_count < partitions_to_read:
                        if pas == 0:
                            for j in range(actual_ch):
                                if decode_ch[j]:
                                    continue
                                temp = classbook.decode_scalar(br)
                                for i in range(classwords - 1, -1, -1):
                                    classifs[j][partition_count + i] = (
                                        temp % self.classifications
                                    )
                                    temp //= self.classifications
                        i = 0
                        while i < classwords and partition_count < partitions_to_read:
                            for j in range(actual_ch):
                                if decode_ch[j]:
                                    continue
                                vq = classifs[j][partition_count]
                                book_idx = self.books[vq][pas]
                                if book_idx < 0:
                                    continue
                                book = codebooks[book_idx]
                                offset = limit_begin + partition_count * self.partition_size
                                self._decode_partition(br, book, vecs[j], offset)
                            i += 1
                            partition_count += 1
            except EndOfPacket:
                pass  # partial decode is defined behavior (spec 1.1.4)
            out = vecs

        if self.residue_type == 2:
            return out.reshape(n_half, ch).T.astype(np.float32, copy=False)
        return out

    def _decode_partition(self, br, book: Codebook, v: np.ndarray, offset: int):
        dim = book.dimensions
        psize = self.partition_size
        if self.residue_type == 0:
            step = psize // dim
            for j in range(step):
                entry = book.decode_scalar(br)
                v[offset + j : offset + j + dim * step : step] += book.vq[entry]
        else:  # types 1 and 2 decode identically over their vector
            i = 0
            while i < psize:
                entry = book.decode_scalar(br)
                v[offset + i : offset + i + dim] += book.vq[entry]
                i += dim


# ---------------------------------------------------------------------------
# mappings and modes
# ---------------------------------------------------------------------------


@dataclass
class Mapping:
    submaps: int
    coupling: List  # (magnitude_ch, angle_ch)
    mux: List[int]
    submap_floor: List[int]
    submap_residue: List[int]


@dataclass
class Mode:
    blockflag: int
    mapping: int


def _parse_mapping(br: BitReader, channels: int, n_floors: int, n_residues: int) -> Mapping:
    if br.read(16) != 0:
        raise OggError("nonzero mapping type")
    submaps = br.read(4) + 1 if br.read(1) else 1
    coupling = []
    if br.read(1):
        steps = br.read(8) + 1
        bits = ilog(channels - 1)
        for _ in range(steps):
            mag = br.read(bits)
            ang = br.read(bits)
            if mag == ang or mag >= channels or ang >= channels:
                raise OggError("invalid coupling channels")
            coupling.append((mag, ang))
    if br.read(2) != 0:
        raise OggError("mapping reserved bits nonzero")
    if submaps > 1:
        mux = [br.read(4) for _ in range(channels)]
        if any(m >= submaps for m in mux):
            raise OggError("mux out of range")
    else:
        mux = [0] * channels
    floors, residues = [], []
    for _ in range(submaps):
        br.read(8)  # unused time config
        f = br.read(8)
        r = br.read(8)
        if f >= n_floors or r >= n_residues:
            raise OggError("submap references out of range")
        floors.append(f)
        residues.append(r)
    return Mapping(submaps, coupling, mux, floors, residues)


# ---------------------------------------------------------------------------
# IMDCT + windows
# ---------------------------------------------------------------------------


def imdct_direct(spec: np.ndarray) -> np.ndarray:
    """O(n^2) reference IMDCT (spec 4.3.6 right transform):
    y[j] = sum_k X[k] cos(pi/(2n) (2j+1+n/2)(2k+1)), n = 2*len(X)."""
    M = len(spec)
    n = 2 * M
    j = np.arange(n)[:, None]
    k = np.arange(M)[None, :]
    basis = np.cos(np.pi / (2 * n) * (2 * j + 1 + M) * (2 * k + 1))
    return basis @ np.asarray(spec, dtype=np.float64)


def imdct(spec: np.ndarray) -> np.ndarray:
    """Fast IMDCT via DCT-IV (scipy), with the segment/sign symmetry
    y = [d[M/2:], -d reversed, -d[:M/2]] verified against imdct_direct in
    tests."""
    from scipy.fft import dct

    M = len(spec)
    d = 0.5 * dct(np.asarray(spec, dtype=np.float64), type=4)
    return np.concatenate([d[M // 2 :], -d[::-1], -d[: M // 2]])


def imdct_batch(specs: np.ndarray) -> np.ndarray:
    """Batched fast IMDCT over axis -1: (B, M) -> (B, 2M)."""
    from scipy.fft import dct

    M = specs.shape[-1]
    d = 0.5 * dct(np.asarray(specs, dtype=np.float64), type=4, axis=-1)
    return np.concatenate(
        [d[..., M // 2 :], -d[..., ::-1], -d[..., : M // 2]], axis=-1
    )


def imdct_matrix(n: int) -> np.ndarray:
    """Dense IMDCT basis (n x n/2) for the MXU matmul path."""
    M = n // 2
    j = np.arange(n)[:, None]
    k = np.arange(M)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * j + 1 + M) * (2 * k + 1)).astype(np.float32)


def imdct_batch_jax(specs, basis=None):
    """TPU path: IMDCT of a batch of spectra as ONE matmul on the MXU.

    specs: (B, M) array; returns (B, 2M).  The dense-basis matmul beats
    gather/FFT formulations on this chip (see BENCH_NOTES round 1: prefer
    dense matmul even at FLOP redundancy)."""
    import jax
    import jax.numpy as jnp

    M = specs.shape[-1]
    if basis is None:
        basis = jnp.asarray(imdct_matrix(2 * M))
    # audio synthesis needs f32 mantissas: force full-precision MXU passes
    # (TPU matmul default is bf16 inputs)
    return jnp.dot(
        jnp.asarray(specs, jnp.float32), basis.T, precision=jax.lax.Precision.HIGHEST
    )


def vorbis_window(n: int) -> np.ndarray:
    """Full slope of length n: w(i) = sin(pi/2 sin^2(pi/n (i+0.5)))."""
    i = np.arange(n, dtype=np.float64)
    return np.sin(0.5 * np.pi * np.sin(np.pi / n * (i + 0.5)) ** 2)


# ---------------------------------------------------------------------------
# the decoder
# ---------------------------------------------------------------------------


@dataclass
class VorbisInfo:
    channels: int
    sample_rate: int
    blocksize0: int
    blocksize1: int


class VorbisDecoder:
    """Stateful Vorbis I decoder: feed the three header packets, then audio
    packets; emits float32 PCM (samples, channels) per packet."""

    def __init__(self, ident_packet: bytes, setup_packet: bytes):
        self.info = self._parse_ident(ident_packet)
        self._parse_setup(setup_packet)
        self._prev: Optional[np.ndarray] = None  # (ch, prev_n/2) windowed tail
        self._prev_n = 0
        self._window_cache = {}
        self.total_emitted = 0

    # -- headers -----------------------------------------------------------

    @staticmethod
    def _parse_ident(packet: bytes) -> VorbisInfo:
        if packet[0] != 1 or packet[1:7] != b"vorbis":
            raise OggError("not a Vorbis identification header")
        br = BitReader(packet[7:])
        version = br.read(32)
        if version != 0:
            raise OggError(f"unsupported Vorbis version {version}")
        channels = br.read(8)
        rate = br.read(32)
        br.read(32), br.read(32), br.read(32)  # bitrates
        bs0 = 1 << br.read(4)
        bs1 = 1 << br.read(4)
        if not br.read(1):
            raise OggError("ident framing bit unset")
        if channels == 0 or rate == 0 or bs0 > bs1 or not (64 <= bs0 <= 8192):
            raise OggError("invalid identification header")
        return VorbisInfo(channels, rate, bs0, bs1)

    def _parse_setup(self, packet: bytes):
        if packet[0] != 5 or packet[1:7] != b"vorbis":
            raise OggError("not a Vorbis setup header")
        br = BitReader(packet[7:])
        self.codebooks = [Codebook(br) for _ in range(br.read(8) + 1)]
        for _ in range(br.read(6) + 1):  # time domain transforms (placeholders)
            if br.read(16) != 0:
                raise OggError("nonzero time transform")
        self.floors = []
        for _ in range(br.read(6) + 1):
            ftype = br.read(16)
            if ftype == 0:
                self.floors.append(Floor0(br, self.codebooks))
            elif ftype == 1:
                self.floors.append(Floor1(br, self.codebooks))
            else:
                raise OggError(f"reserved floor type {ftype}")
        self.residues = []
        for _ in range(br.read(6) + 1):
            rtype = br.read(16)
            if rtype > 2:
                raise OggError(f"reserved residue type {rtype}")
            self.residues.append(Residue(rtype, br, self.codebooks))
        self.mappings = []
        for _ in range(br.read(6) + 1):
            self.mappings.append(
                _parse_mapping(br, self.info.channels, len(self.floors), len(self.residues))
            )
        self.modes = []
        for _ in range(br.read(6) + 1):
            blockflag = br.read(1)
            if br.read(16) != 0 or br.read(16) != 0:
                raise OggError("nonzero mode window/transform type")
            mapping = br.read(8)
            if mapping >= len(self.mappings):
                raise OggError("mode mapping out of range")
            self.modes.append(Mode(blockflag, mapping))
        if not br.read(1):
            raise OggError("setup framing bit unset")

    # -- audio packets -------------------------------------------------------

    def _window(self, n: int, prev_flag: int, next_flag: int, blockflag: int) -> np.ndarray:
        key = (n, prev_flag, next_flag, blockflag)
        w = self._window_cache.get(key)
        if w is not None:
            return w
        bs0 = self.info.blocksize0
        w = np.zeros(n, dtype=np.float64)
        if blockflag and not prev_flag:
            left_start = n // 4 - bs0 // 4
            left_n = bs0 // 2
        else:
            left_start = 0
            left_n = n // 2
        if blockflag and not next_flag:
            right_start = 3 * n // 4 - bs0 // 4
            right_n = bs0 // 2
        else:
            right_start = n // 2
            right_n = n // 2
        slope = vorbis_window(2 * left_n)
        w[left_start : left_start + left_n] = slope[:left_n]
        w[left_start + left_n : right_start] = 1.0
        slope_r = vorbis_window(2 * right_n)
        w[right_start : right_start + right_n] = slope_r[right_n:]
        self._window_cache[key] = w
        return w

    def decode_packet(self, packet: bytes) -> np.ndarray:
        """Decode one audio packet; returns (samples, channels) float32
        (possibly zero-length for the first packet)."""
        info = self.info
        ch = info.channels
        br = BitReader(packet)
        if br.read(1) != 0:
            raise OggError("header packet passed to audio decode")
        mode = self.modes[br.read(ilog(len(self.modes) - 1))] if len(self.modes) > 1 else self.modes[0]
        blockflag = mode.blockflag
        n = info.blocksize1 if blockflag else info.blocksize0
        prev_flag = next_flag = 1
        if blockflag:
            prev_flag = br.read(1)
            next_flag = br.read(1)
        mapping = self.mappings[mode.mapping]
        half = n // 2

        # floor decode per channel
        floor_data: List = [None] * ch
        no_residue = [True] * ch
        try:
            for c in range(ch):
                floor = self.floors[mapping.submap_floor[mapping.mux[c]]]
                fd = floor.decode(br, self.codebooks)
                floor_data[c] = fd
                no_residue[c] = fd is None
        except EndOfPacket:
            pass
        # nonzero propagation through coupling (spec 4.3.3)
        for mag, ang in mapping.coupling:
            if not no_residue[mag] or not no_residue[ang]:
                no_residue[mag] = no_residue[ang] = False

        # residue decode per submap
        residue_vecs = np.zeros((ch, half), dtype=np.float32)
        for s in range(mapping.submaps):
            ch_list = [c for c in range(ch) if mapping.mux[c] == s]
            if not ch_list:
                continue
            dnd = [no_residue[c] for c in ch_list]
            residue = self.residues[mapping.submap_residue[s]]
            try:
                out = residue.decode(br, half, dnd, self.codebooks)
            except EndOfPacket:
                out = np.zeros((len(ch_list), half), dtype=np.float32)
            for i, c in enumerate(ch_list):
                residue_vecs[c] = out[i]

        # inverse coupling, reverse order (spec 4.3.5)
        for mag, ang in reversed(mapping.coupling):
            M = residue_vecs[mag].copy()
            A = residue_vecs[ang].copy()
            new_m = M.copy()
            new_a = A.copy()
            pos_m = M > 0
            pos_a = A > 0
            #  M>0, A>0: A' = M - A      |  M>0, A<=0: M' = M + A, A' = M
            #  M<=0,A>0: A' = M + A      |  M<=0,A<=0: M' = M - A, A' = M
            new_a[pos_m & pos_a] = (M - A)[pos_m & pos_a]
            sel = pos_m & ~pos_a
            new_m[sel] = (M + A)[sel]
            new_a[sel] = M[sel]
            sel = ~pos_m & pos_a
            new_a[sel] = (M + A)[sel]
            sel = ~pos_m & ~pos_a
            new_m[sel] = (M - A)[sel]
            new_a[sel] = M[sel]
            residue_vecs[mag] = new_m
            residue_vecs[ang] = new_a

        # floor curve multiply + IMDCT + window
        window = self._window(n, prev_flag, next_flag, blockflag)
        pcm = np.zeros((ch, n), dtype=np.float64)
        for c in range(ch):
            if floor_data[c] is None:
                continue
            floor = self.floors[mapping.submap_floor[mapping.mux[c]]]
            curve = floor.synthesize(floor_data[c], half)
            spectrum = curve * residue_vecs[c]
            pcm[c] = imdct(spectrum) * window

        # overlap-add across frames (spec 4.8); consecutive window centers
        # are (prev_n + n)/4 apart, so cur[0] lands at offset
        # prev_n/4 - n/4 into the saved tail
        out = self._overlap_add(pcm, n)
        return out

    def _overlap_add(self, pcm: np.ndarray, n: int) -> np.ndarray:
        ch = pcm.shape[0]
        center = n // 2
        if self._prev is None:
            self._prev = pcm[:, center:].copy()
            self._prev_n = n
            return np.zeros((0, ch), dtype=np.float32)
        prev_n = self._prev_n
        off = prev_n // 4 - n // 4
        emit_len = prev_n // 4 + n // 4
        out = np.zeros((ch, emit_len), dtype=np.float64)
        prev_part = self._prev[:, :emit_len]
        out[:, : prev_part.shape[1]] += prev_part
        if off >= 0:
            out[:, off:] += pcm[:, : emit_len - off]
        else:
            out[:, :] += pcm[:, -off : -off + emit_len]
        self._prev = pcm[:, center:].copy()
        self._prev_n = n
        self.total_emitted += emit_len
        return out.T.astype(np.float32)


class OggVorbisStream:
    """Ogg + Vorbis glue: feed raw Ogg bytes, get PCM out.

    Mirrors the reference's ``codec::ogg::AudioStream`` over a non-seekable
    reader (codec/src/ogg.rs:55-130): incremental, container-checked,
    granule-truncated at EOS."""

    def __init__(self):
        from mixlab_tpu.av.ogg import PacketReader

        self.packets = PacketReader()
        self.decoder: Optional[VorbisDecoder] = None
        self._headers: List[bytes] = []
        self._serial: Optional[int] = None
        self._eos_granule: Optional[int] = None
        self._emitted = 0

    @property
    def info(self) -> Optional[VorbisInfo]:
        return self.decoder.info if self.decoder else None

    def feed(self, data: bytes) -> np.ndarray:
        """Returns decoded PCM float32 (samples, channels) for this chunk."""
        out: List[np.ndarray] = []
        for serial, packet, granule, eos in self.packets.feed_ex(data):
            if self._serial is None:
                self._serial = serial
            if serial != self._serial:
                continue  # single logical stream supported (like icecast path)
            if self.decoder is None:
                self._headers.append(packet)
                if len(self._headers) == 3:
                    ident, comments, setup = self._headers
                    if ident[:7] != b"\x01vorbis":
                        raise OggError("stream is not Vorbis")
                    self.decoder = VorbisDecoder(ident, setup)
                continue
            pcm = self.decoder.decode_packet(packet)
            if len(pcm):
                self._emitted += len(pcm)
                out.append(pcm)
            if eos and granule >= 0:
                # sample-exact end of stream (Vorbis-over-Ogg spec: the EOS
                # page granule is the stream's total length; a final partial
                # frame must be truncated to it — lewton/ogg.rs do the same)
                excess = self._emitted - granule
                self._eos_granule = granule
                while excess > 0 and out:
                    tail = out[-1]
                    cut = min(excess, len(tail))
                    out[-1] = tail[: len(tail) - cut]
                    self._emitted -= cut
                    excess -= cut
                    if not len(out[-1]):
                        out.pop()
        if out:
            return np.concatenate(out)
        chn = self.decoder.info.channels if self.decoder else 1
        return np.zeros((0, chn), dtype=np.float32)

    def feed_i16(self, data: bytes) -> np.ndarray:
        """PCM as interleaved i16, stereo-upmixed mono like the reference
        icecast path (src/icecast/mod.rs:110-123)."""
        pcm = self.feed(data)
        if pcm.shape[1] == 1:
            pcm = np.repeat(pcm, 2, axis=1)
        return np.clip(pcm * 32768.0, -32768, 32767).astype(np.int16)
