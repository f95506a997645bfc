// mixlab-tpu native runtime primitives.
//
// The reference implements its runtime in Rust with FFI'd C libraries; the
// TPU build keeps the device path in XLA/Pallas and implements the host-side
// hot paths here in C++ (exposed via ctypes, see __init__.py):
//
//   * lock-free SPSC byte ring buffer — the ingest fabric, equivalent of the
//     reference's `ringbuf` SPSC rings (src/source.rs:97-98, 65536 slots)
//   * PCM sample conversion f32<->i16 (clamp+scale semantics of
//     video/encode.rs:186-199 and stream_input.rs:167-173)
//   * WebSocket XOR unmasking (RFC 6455 §5.3) — per-byte in Python, word-wide
//     here
//   * u8 crossfade with exact (a*f + b*(255-f))/255 semantics
//     (video_mixer.rs:210-235) as a host-side fallback/reference
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmixlab_native.so mixlab_native.cpp

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer (byte-oriented, power-of-two capacity)
// ---------------------------------------------------------------------------

struct SpscRing {
    uint8_t* data;
    uint64_t capacity;  // power of two
    std::atomic<uint64_t> head;  // written by producer
    std::atomic<uint64_t> tail;  // written by consumer
};

SpscRing* ring_create(uint64_t capacity_pow2) {
    if (capacity_pow2 == 0 || (capacity_pow2 & (capacity_pow2 - 1)) != 0) {
        return nullptr;
    }
    auto* r = new SpscRing();
    r->data = static_cast<uint8_t*>(std::malloc(capacity_pow2));
    if (!r->data) { delete r; return nullptr; }
    r->capacity = capacity_pow2;
    r->head.store(0, std::memory_order_relaxed);
    r->tail.store(0, std::memory_order_relaxed);
    return r;
}

void ring_destroy(SpscRing* r) {
    if (r) { std::free(r->data); delete r; }
}

uint64_t ring_size(const SpscRing* r) {
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_acquire);
}

uint64_t ring_capacity(const SpscRing* r) { return r->capacity; }

// returns bytes written (0 if insufficient space: all-or-nothing)
uint64_t ring_push(SpscRing* r, const uint8_t* src, uint64_t n) {
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (r->capacity - (head - tail) < n) return 0;
    uint64_t mask = r->capacity - 1;
    uint64_t off = head & mask;
    uint64_t first = off + n <= r->capacity ? n : r->capacity - off;
    std::memcpy(r->data + off, src, first);
    if (first < n) std::memcpy(r->data, src + first, n - first);
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// returns bytes read (<= n)
uint64_t ring_pop(SpscRing* r, uint8_t* dst, uint64_t n) {
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    if (n == 0) return 0;
    uint64_t mask = r->capacity - 1;
    uint64_t off = tail & mask;
    uint64_t first = off + n <= r->capacity ? n : r->capacity - off;
    std::memcpy(dst, r->data + off, first);
    if (first < n) std::memcpy(dst + first, r->data, n - first);
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

// ---------------------------------------------------------------------------
// PCM conversion
// ---------------------------------------------------------------------------

void pcm_f32_to_i16(const float* src, int16_t* dst, uint64_t n) {
    for (uint64_t i = 0; i < n; i++) {
        float s = src[i];
        if (s > 1.0f) s = 1.0f;
        if (s < -1.0f) s = -1.0f;
        dst[i] = static_cast<int16_t>(s * 32767.0f);
    }
}

void pcm_i16_to_f32(const int16_t* src, float* dst, uint64_t n) {
    const float k = 1.0f / 32768.0f;
    for (uint64_t i = 0; i < n; i++) dst[i] = src[i] * k;
}

// ---------------------------------------------------------------------------
// WebSocket unmask (RFC 6455 §5.3): payload[i] ^= mask[i % 4]
// ---------------------------------------------------------------------------

void ws_unmask(uint8_t* payload, uint64_t n, const uint8_t mask[4]) {
    uint64_t m8;
    uint8_t m[8] = {mask[0], mask[1], mask[2], mask[3],
                    mask[0], mask[1], mask[2], mask[3]};
    std::memcpy(&m8, m, 8);
    uint64_t i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t w;
        std::memcpy(&w, payload + i, 8);
        w ^= m8;
        std::memcpy(payload + i, &w, 8);
    }
    for (; i < n; i++) payload[i] ^= mask[i & 3];
}

// ---------------------------------------------------------------------------
// crossfade: out = (a*fade + b*(255-fade)) / 255, truncating
// ---------------------------------------------------------------------------

void crossfade_u8(const uint8_t* a, const uint8_t* b, uint8_t* out,
                  uint64_t n, uint8_t fade) {
    uint32_t fa = fade, fb = 255 - fade;
    for (uint64_t i = 0; i < n; i++) {
        uint32_t acc = a[i] * fa + b[i] * fb;
        out[i] = static_cast<uint8_t>((acc * 32897u) >> 23);
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// H.264 CAVLC slice parse (pass 1 of av/h264dec_fast.py)
//
// The fast pure decoder's entropy decode is inherently serial (every prefix
// code's length depends on the previous symbol), so it cannot vectorize; this
// is its C++ twin, bit-identical by construction: the SAME flattened 64Ki
// lookup tables are passed in from Python (packed by av/h264dec_fast.py), and
// the control flow mirrors _read_block_fast / the MB loop statement for
// statement.  Python keeps the slice-header parse and all batched transform
// math (pass 2); this fills the same preallocated coefficient arrays.
// Reference scope as in av/h264dec.py (the reference delegates H.264 decode
// to FFI'd libavcodec entirely: src/rtmp/mod.rs:260-338).
// ---------------------------------------------------------------------------

#include <vector>

namespace h264 {

// packed table layout (each entry: 65536 value bytes + 65536 length bytes):
// coeff_token classes 0-3, chroma-DC token, total_zeros 1-15,
// chroma-DC total_zeros 1-3, run_before 1-7  => 30 tables
constexpr int kCT0 = 0, kCDC = 4, kTZ0 = 5, kCTZ0 = 20, kRUN0 = 23;
constexpr size_t kTabStride = 2u * 65536u;

struct ParseErr {
    int64_t code;
    int64_t detail;
};

inline const uint8_t* tab_val(const uint8_t* t, int i) {
    return t + static_cast<size_t>(i) * kTabStride;
}
inline const uint8_t* tab_len(const uint8_t* t, int i) {
    return t + static_cast<size_t>(i) * kTabStride + 65536;
}

inline int clz16(uint32_t w) {
    return w ? __builtin_clz(w) - 16 : 16;
}

struct Bits {
    const uint8_t* d;  // padded with >= 8 zero bytes past nbits
    int64_t nbits;
    int64_t pos;

    // bits pos..pos+15, zero-padded past the end (same as the Python
    // window array); reading past the stream is a typed error
    inline uint32_t peek16() const {
        if (pos > nbits) throw ParseErr{-8, 0};
        int64_t b = pos >> 3;
        uint32_t v = (static_cast<uint32_t>(d[b]) << 16) |
                     (static_cast<uint32_t>(d[b + 1]) << 8) | d[b + 2];
        return (v >> (8 - (pos & 7))) & 0xFFFF;
    }

    inline int64_t read(int k) {
        int64_t v = peek16() >> (16 - k);
        pos += k;
        return v;
    }

    inline int64_t ue() {
        uint32_t w = peek16();
        int lz = clz16(w);
        if (lz > 15) throw ParseErr{-7, 0};
        int length = 2 * lz + 1;
        if (length <= 16) {
            pos += length;
            return (w >> (16 - length)) - 1;
        }
        pos += lz + 1;
        return (static_cast<int64_t>(1) << lz) - 1 + read(lz);
    }

    inline int64_t se() {
        int64_t k = ue();
        return (k % 2) ? (k + 1) / 2 : -(k / 2);
    }
};

// mirrors _read_block_fast (h264dec_fast.py): scan-order coeffs into out
// (length max_coeff, pre-zeroed), returns TotalCoeff
static int read_block(Bits& r, int nC, int max_coeff, int64_t* out,
                      const uint8_t* tables) {
    const uint8_t *val_t, *len_t;
    if (nC == -1) {
        val_t = tab_val(tables, kCDC);
        len_t = tab_len(tables, kCDC);
    } else {
        int cls = nC < 2 ? 0 : nC < 4 ? 1 : nC < 8 ? 2 : 3;
        val_t = tab_val(tables, kCT0 + cls);
        len_t = tab_len(tables, kCT0 + cls);
    }
    uint32_t w = r.peek16();
    int k = len_t[w];
    if (k == 0) throw ParseErr{-1, 0};
    int idx = val_t[w];
    r.pos += k;
    int total = idx >> 2;
    int t1s = idx & 3;
    if (total == 0) return 0;

    int64_t levels[16];
    int nl = 0;
    for (int i = 0; i < t1s; i++) {
        levels[nl++] = (r.peek16() >> 15) ? -1 : 1;
        r.pos += 1;
    }

    int suffix_len = (total > 10 && t1s < 3) ? 1 : 0;
    bool first = true;
    for (int i = 0; i < total - t1s; i++) {
        int prefix = clz16(r.peek16());
        if (prefix > 15) throw ParseErr{-2, 0};
        r.pos += prefix + 1;
        int64_t level_code;
        if (suffix_len == 0) {
            if (prefix < 14) {
                level_code = prefix;
            } else if (prefix == 14) {
                level_code = 14 + (r.peek16() >> 12);
                r.pos += 4;
            } else {
                level_code = 30 + (r.peek16() >> 4);
                r.pos += 12;
            }
        } else {
            if (prefix < 14) {
                level_code = (static_cast<int64_t>(prefix) << suffix_len) +
                             (r.peek16() >> (16 - suffix_len));
                r.pos += suffix_len;
            } else if (prefix == 14) {
                level_code = (static_cast<int64_t>(14) << suffix_len) +
                             (r.peek16() >> (16 - suffix_len));
                r.pos += suffix_len;
            } else {
                level_code = (static_cast<int64_t>(15) << suffix_len) +
                             (r.peek16() >> 4);
                r.pos += 12;
            }
        }
        if (first && t1s < 3) level_code += 2;
        first = false;
        int64_t lev = (level_code >> 1) + 1;
        if (level_code & 1) lev = -lev;
        levels[nl++] = lev;
        if (suffix_len == 0) suffix_len = 1;
        if ((lev > 0 ? lev : -lev) >
                (static_cast<int64_t>(3) << (suffix_len - 1)) &&
            suffix_len < 6) {
            suffix_len++;
        }
    }

    int tz = 0;
    if (total < max_coeff) {
        int ti = (max_coeff == 4) ? kCTZ0 + total - 1 : kTZ0 + total - 1;
        uint32_t w2 = r.peek16();
        int k2 = tab_len(tables, ti)[w2];
        if (k2 == 0) throw ParseErr{-1, 0};
        tz = tab_val(tables, ti)[w2];
        r.pos += k2;
    }

    int p = total - 1 + tz;
    if (p >= max_coeff) throw ParseErr{-1, 0};
    int zeros_left = tz;
    out[p] = levels[0];
    for (int k2 = total - 1; k2 > 0; k2--) {
        int run = 0;
        if (zeros_left > 0) {
            int ti = kRUN0 + (zeros_left < 7 ? zeros_left : 7) - 1;
            uint32_t w3 = r.peek16();
            int kk = tab_len(tables, ti)[w3];
            if (kk == 0) throw ParseErr{-1, 0};
            run = tab_val(tables, ti)[w3];
            r.pos += kk;
        }
        p = p - run - 1;
        if (p < 0) throw ParseErr{-1, 0};  // corrupt run_before codes
        out[p] = levels[total - k2];
        zeros_left -= run;
    }
    return total;
}

struct NnzGrid {
    std::vector<int16_t> v;  // -1 = unknown (frame edge / not yet decoded)
    int w;
    NnzGrid(int h_, int w_) : v(static_cast<size_t>(h_) * w_, -1), w(w_) {}
    inline int16_t& at(int y, int x) { return v[static_cast<size_t>(y) * w + x]; }
};

static int nc_of(NnzGrid& nnz, int mx, int my, int bx, int by, int grid) {
    int tx = mx * grid + bx, ty = my * grid + by;
    int nA = tx > 0 ? nnz.at(ty, tx - 1) : -1;
    int nB = ty > 0 ? nnz.at(ty - 1, tx) : -1;
    if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
    if (nA >= 0) return nA;
    if (nB >= 0) return nB;
    return 0;
}

// 4x4 block order inside a macroblock (h264cavlc._BLK_POS)
constexpr int kBlkX[16] = {0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3};
constexpr int kBlkY[16] = {0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3};

}  // namespace h264

extern "C" {

// Parse all macroblocks of one I-slice.  data: unescaped RBSP padded with
// >= 8 zero bytes (n_bytes excludes padding); start_pos: bit position after
// the slice header; qp_init: slice qp after the header.  Output arrays are
// preallocated, zeroed by the caller: kinds [N] u8 (0 I16 / 1 I_PCM),
// qps [N] i64, l_dc [N,16], l_ac [N,16,15], c_dc [N,2,4], c_ac [N,2,4,15]
// (all i64, scan order), pcm [N,384] u8.  out_state: {end_pos, mb_addr,
// err_detail}.  Returns 0 or a negative error code (see _NATIVE_ERRORS in
// av/h264dec_fast.py).
int64_t h264_parse_slice(const uint8_t* data, int64_t n_bytes,
                         int64_t start_pos, int64_t first_mb, int64_t mbw,
                         int64_t mbh, int64_t qp_init, const uint8_t* tables,
                         uint8_t* kinds, int64_t* qps, int64_t* l_dc,
                         int64_t* l_ac, int64_t* c_dc, int64_t* c_ac,
                         uint8_t* pcm, int64_t* out_state) {
    using h264::Bits;
    using h264::NnzGrid;
    using h264::ParseErr;

    Bits r{data, n_bytes * 8, start_pos};
    // rbsp_stop_one_bit: position of the last set bit in the stream
    int64_t stop = -1;
    for (int64_t b = n_bytes - 1; b >= 0; b--) {
        if (data[b]) {
            stop = b * 8 + (7 - __builtin_ctz(data[b]));
            break;
        }
    }

    const int64_t n_total = mbw * mbh;
    NnzGrid nnz_y(mbh * 4, mbw * 4);
    NnzGrid nnz_u(mbh * 2, mbw * 2);
    NnzGrid nnz_v(mbh * 2, mbw * 2);

    int64_t qp = qp_init;
    int64_t mb_addr = first_mb;
    try {
        while (mb_addr < n_total && r.pos < stop) {
            const int64_t i = mb_addr - first_mb;
            const int mx = static_cast<int>(mb_addr % mbw);
            const int my = static_cast<int>(mb_addr / mbw);
            int64_t mb_type = r.ue();
            if (mb_type == 25) {  // I_PCM
                r.pos = (r.pos + 7) & ~static_cast<int64_t>(7);
                int64_t at = r.pos >> 3;
                if (at + 384 > n_bytes) throw ParseErr{-3, 0};
                std::memcpy(pcm + i * 384, data + at, 384);
                r.pos += 384 * 8;
                kinds[i] = 1;
                for (int ty = my * 4; ty < my * 4 + 4; ty++)
                    for (int tx = mx * 4; tx < mx * 4 + 4; tx++)
                        nnz_y.at(ty, tx) = 16;
                for (int ty = my * 2; ty < my * 2 + 2; ty++)
                    for (int tx = mx * 2; tx < mx * 2 + 2; tx++) {
                        nnz_u.at(ty, tx) = 16;
                        nnz_v.at(ty, tx) = 16;
                    }
                mb_addr++;
                continue;
            }
            if (mb_type < 1 || mb_type > 24) throw ParseErr{-4, mb_type};
            int64_t code = mb_type - 1;
            int pred_mode = static_cast<int>(code % 4);
            int cbp_chroma = static_cast<int>((code / 4) % 3);
            int cbp_luma = code >= 12 ? 15 : 0;
            if (pred_mode != 2) throw ParseErr{-5, pred_mode};
            if (r.ue() != 0) throw ParseErr{-6, 0};
            qp = qp + r.se();
            qps[i] = qp;

            // luma DC
            int nC = h264::nc_of(nnz_y, mx, my, 0, 0, 4);
            h264::read_block(r, nC, 16, l_dc + i * 16, tables);

            // luma AC
            if (cbp_luma) {
                for (int bi = 0; bi < 16; bi++) {
                    int bx = h264::kBlkX[bi], by = h264::kBlkY[bi];
                    nC = h264::nc_of(nnz_y, mx, my, bx, by, 4);
                    int t = h264::read_block(r, nC, 15,
                                             l_ac + (i * 16 + bi) * 15, tables);
                    nnz_y.at(my * 4 + by, mx * 4 + bx) =
                        static_cast<int16_t>(t);
                }
            } else {
                for (int ty = my * 4; ty < my * 4 + 4; ty++)
                    for (int tx = mx * 4; tx < mx * 4 + 4; tx++)
                        nnz_y.at(ty, tx) = 0;
            }

            // chroma DC
            if (cbp_chroma) {
                h264::read_block(r, -1, 4, c_dc + (i * 2 + 0) * 4, tables);
                h264::read_block(r, -1, 4, c_dc + (i * 2 + 1) * 4, tables);
            }
            // chroma AC
            for (int comp = 0; comp < 2; comp++) {
                NnzGrid& nnz_c = comp == 0 ? nnz_u : nnz_v;
                if (cbp_chroma == 2) {
                    for (int bi = 0; bi < 4; bi++) {
                        int bx = bi % 2, by = bi / 2;
                        nC = h264::nc_of(nnz_c, mx, my, bx, by, 2);
                        int t = h264::read_block(
                            r, nC, 15, c_ac + ((i * 2 + comp) * 4 + bi) * 15,
                            tables);
                        nnz_c.at(my * 2 + by, mx * 2 + bx) =
                            static_cast<int16_t>(t);
                    }
                } else {
                    for (int ty = my * 2; ty < my * 2 + 2; ty++)
                        for (int tx = mx * 2; tx < mx * 2 + 2; tx++)
                            nnz_c.at(ty, tx) = 0;
                }
            }
            mb_addr++;
        }
    } catch (const ParseErr& e) {
        out_state[0] = r.pos;
        out_state[1] = mb_addr;
        out_state[2] = e.detail;
        return e.code;
    }
    out_state[0] = r.pos;
    out_state[1] = mb_addr;
    out_state[2] = 0;
    return 0;
}

// DC-prediction reconstruction (pass 2b of av/h264dec_fast.py), sequential
// raster order — mirrors the scalar oracle's _dc_pred16/_dc_pred_chroma
// (av/h264dec.py:288-330) exactly.  mb_y: [N,16,16] i64 residuals
// (already (idct+32)>>6), mb_c: [N,2,8,8] i64, kinds: [N] u8 (1 = I_PCM,
// raw samples in pcm [N,384]).  ry/ru/rv are the decoder's full planes
// ([mbh*16, mbw*16] / [mbh*8, mbw*8] i64); neighbor predictions read
// previously-written plane content, so slices with first_mb != 0 work
// against whatever the planes already hold (same as the scalar path).
void h264_dc_recon(const int64_t* mb_y, const int64_t* mb_c,
                   const uint8_t* kinds, const uint8_t* pcm, int64_t N,
                   int64_t first_mb, int64_t mbw, int64_t mbh, int64_t* ry,
                   int64_t* ru, int64_t* rv) {
    (void)mbh;
    const int64_t W = mbw * 16, CW = mbw * 8;
    for (int64_t i = 0; i < N; i++) {
        const int64_t addr = first_mb + i;
        const int64_t mx = addr % mbw, my = addr / mbw;
        const int64_t y0 = my * 16, x0 = mx * 16;
        const int64_t cy0 = my * 8, cx0 = mx * 8;
        if (kinds[i]) {
            const uint8_t* p = pcm + i * 384;
            for (int y = 0; y < 16; y++)
                for (int x = 0; x < 16; x++)
                    ry[(y0 + y) * W + x0 + x] = p[y * 16 + x];
            for (int y = 0; y < 8; y++)
                for (int x = 0; x < 8; x++) {
                    ru[(cy0 + y) * CW + cx0 + x] = p[256 + y * 8 + x];
                    rv[(cy0 + y) * CW + cx0 + x] = p[256 + 64 + y * 8 + x];
                }
            continue;
        }
        const bool ht = my > 0, hl = mx > 0;

        // luma (spec 8.3.3 DC mode)
        int64_t pred;
        if (ht || hl) {
            int64_t ts = 0, ls = 0;
            if (ht)
                for (int x = 0; x < 16; x++) ts += ry[(y0 - 1) * W + x0 + x];
            if (hl)
                for (int y = 0; y < 16; y++) ls += ry[(y0 + y) * W + x0 - 1];
            pred = (ht && hl) ? (ts + ls + 16) >> 5
                              : (ht ? (ts + 8) >> 4 : (ls + 8) >> 4);
        } else {
            pred = 128;
        }
        const int64_t* mb = mb_y + i * 256;
        for (int y = 0; y < 16; y++)
            for (int x = 0; x < 16; x++) {
                int64_t v = mb[y * 16 + x] + pred;
                ry[(y0 + y) * W + x0 + x] = v < 0 ? 0 : v > 255 ? 255 : v;
            }

        // chroma per 4x4 quadrant (spec 8.3.4 / _dc_pred_chroma)
        for (int comp = 0; comp < 2; comp++) {
            int64_t* plane = comp == 0 ? ru : rv;
            const int64_t* mbc = mb_c + (i * 2 + comp) * 64;
            for (int sy = 0; sy < 8; sy += 4)
                for (int sx = 0; sx < 8; sx += 4) {
                    int64_t ts = 0, ls = 0;
                    if (ht)
                        for (int x = 0; x < 4; x++)
                            ts += plane[(cy0 - 1) * CW + cx0 + sx + x];
                    if (hl)
                        for (int y = 0; y < 4; y++)
                            ls += plane[(cy0 + sy + y) * CW + cx0 - 1];
                    int64_t v;
                    const bool corner = (sx == 0 && sy == 0) ||
                                        (sx == 4 && sy == 4);
                    if (corner && ht && hl) {
                        v = (ts + ls + 4) >> 3;
                    } else if (sx == 4 && sy == 0) {
                        v = ht ? (ts + 2) >> 2 : hl ? (ls + 2) >> 2 : 128;
                    } else if (sx == 0 && sy == 4) {
                        v = hl ? (ls + 2) >> 2 : ht ? (ts + 2) >> 2 : 128;
                    } else {
                        v = (ht && hl) ? (ts + ls + 4) >> 3
                            : ht       ? (ts + 2) >> 2
                            : hl       ? (ls + 2) >> 2
                                       : 128;
                    }
                    for (int y = 0; y < 4; y++)
                        for (int x = 0; x < 4; x++) {
                            int64_t o = mbc[(sy + y) * 8 + sx + x] + v;
                            plane[(cy0 + sy + y) * CW + cx0 + sx + x] =
                                o < 0 ? 0 : o > 255 ? 255 : o;
                        }
                }
        }
    }
}

}  // extern "C"
