// Native GGML K-quant block codec.
//
// C++ fast path for the bit-exact block codecs in
// gptq_gguf_tpu/formats/ggml.py (the TPU framework's replacement for
// llama.cpp's quant codecs). Used by the splitter/stitcher/packer and the
// serving loader where multi-GB GGUF tensors are (de)coded on the host; the
// numpy implementation remains the always-available reference.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Layouts follow llama.cpp's block structs exactly; see formats/ggml.py for
// the field maps and the round-trip test oracle.

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---- fp16 helpers ---------------------------------------------------------

static inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

static inline uint16_t fp32_to_fp16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t man = bits & 0x7FFFFF;
    if (exp >= 31) return (uint16_t)(sign | 0x7C00);  // inf/overflow
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = man >> shift;
        // round to nearest even
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (man >> 13);
    uint32_t rem = man & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

static inline void get_scale_min_k4(int j, const uint8_t *q, uint8_t *d, uint8_t *m) {
    if (j < 4) {
        *d = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

// ---- dequantizers: blocks -> f32[256] per block ---------------------------

void dequant_q2_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t *blk = blocks + b * 84;
        const uint8_t *scales = blk;
        const uint8_t *qs = blk + 16;
        float d = fp16_to_fp32(*(const uint16_t *)(blk + 80));
        float dmin = fp16_to_fp32(*(const uint16_t *)(blk + 82));
        float *y = out + b * 256;
        int is = 0, qi = 0;
        for (int n = 0; n < 256; n += 128) {
            for (int shift_half = 0; shift_half < 4; ++shift_half) {
                int shift = shift_half * 2;
                for (int sub = 0; sub < 2; ++sub) {
                    uint8_t sc = scales[is++];
                    float dl = d * (sc & 0xF), ml = dmin * (sc >> 4);
                    for (int l = 0; l < 16; ++l) {
                        int q = (qs[qi + sub * 16 + l] >> shift) & 3;
                        *y++ = dl * q - ml;
                    }
                }
            }
            qi += 32;
        }
    }
}

void dequant_q3_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t *blk = blocks + b * 110;
        const uint8_t *hm = blk;
        const uint8_t *qs = blk + 32;
        const uint8_t *s12 = blk + 96;
        float d = fp16_to_fp32(*(const uint16_t *)(blk + 108));
        int8_t sc[16];
        for (int j = 0; j < 16; ++j) {
            int lo = (j < 8) ? (s12[j] & 0xF) : (s12[j - 8] >> 4);
            int hi = (s12[8 + (j % 4)] >> (2 * (j / 4))) & 3;
            sc[j] = (int8_t)((lo | (hi << 4)) - 32);
        }
        float *y = out + b * 256;
        for (int p = 0; p < 256; ++p) {
            int chunk = p / 128, r = p % 128;
            int sub = r / 32, l = r % 32;
            int q2 = (qs[chunk * 32 + l] >> (2 * sub)) & 3;
            int hbit = (hm[p % 32] >> (p / 32)) & 1;
            int q = q2 - (hbit ? 0 : 4);
            y[p] = d * sc[p / 16] * q;
        }
    }
}

void dequant_q4_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t *blk = blocks + b * 144;
        float d = fp16_to_fp32(*(const uint16_t *)(blk + 0));
        float dmin = fp16_to_fp32(*(const uint16_t *)(blk + 2));
        const uint8_t *scales = blk + 4;
        const uint8_t *qs = blk + 16;
        float *y = out + b * 256;
        int is = 0, qi = 0;
        for (int j = 0; j < 256; j += 64) {
            uint8_t sc1, m1, sc2, m2;
            get_scale_min_k4(is + 0, scales, &sc1, &m1);
            get_scale_min_k4(is + 1, scales, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l) y[j + l] = d1 * (qs[qi + l] & 0xF) - mm1;
            for (int l = 0; l < 32; ++l) y[j + 32 + l] = d2 * (qs[qi + l] >> 4) - mm2;
            qi += 32;
            is += 2;
        }
    }
}

void dequant_q5_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t *blk = blocks + b * 176;
        float d = fp16_to_fp32(*(const uint16_t *)(blk + 0));
        float dmin = fp16_to_fp32(*(const uint16_t *)(blk + 2));
        const uint8_t *scales = blk + 4;
        const uint8_t *qh = blk + 16;
        const uint8_t *ql = blk + 48;
        float *y = out + b * 256;
        int is = 0, qi = 0;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < 256; j += 64) {
            uint8_t sc1, m1, sc2, m2;
            get_scale_min_k4(is + 0, scales, &sc1, &m1);
            get_scale_min_k4(is + 1, scales, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l)
                y[j + l] = d1 * ((ql[qi + l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - mm1;
            for (int l = 0; l < 32; ++l)
                y[j + 32 + l] = d2 * ((ql[qi + l] >> 4) + ((qh[l] & u2) ? 16 : 0)) - mm2;
            qi += 32;
            is += 2;
            u1 <<= 2;
            u2 <<= 2;
        }
    }
}

void dequant_q6_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t *blk = blocks + b * 210;
        const uint8_t *ql = blk;
        const uint8_t *qh = blk + 128;
        const int8_t *sc = (const int8_t *)(blk + 192);
        float d = fp16_to_fp32(*(const uint16_t *)(blk + 208));
        float *y = out + b * 256;
        for (int n = 0; n < 256; n += 128) {
            const uint8_t *qlc = ql + (n / 128) * 64;
            const uint8_t *qhc = qh + (n / 128) * 32;
            const int8_t *scc = sc + (n / 128) * 8;
            for (int l = 0; l < 32; ++l) {
                int is = l / 16;
                int q1 = (int)((qlc[l] & 0xF) | (((qhc[l] >> 0) & 3) << 4)) - 32;
                int q2 = (int)((qlc[l + 32] & 0xF) | (((qhc[l] >> 2) & 3) << 4)) - 32;
                int q3 = (int)((qlc[l] >> 4) | (((qhc[l] >> 4) & 3) << 4)) - 32;
                int q4 = (int)((qlc[l + 32] >> 4) | (((qhc[l] >> 6) & 3) << 4)) - 32;
                y[n + l] = d * scc[is + 0] * q1;
                y[n + l + 32] = d * scc[is + 2] * q2;
                y[n + l + 64] = d * scc[is + 4] * q3;
                y[n + l + 96] = d * scc[is + 6] * q4;
            }
        }
    }
}

// ---- packers: codes + params -> blocks ------------------------------------

static inline void pack_2bit_lanes(const uint8_t *q, uint8_t *out) {
    // q[256] values<4 -> out[64]
    for (int chunk = 0; chunk < 2; ++chunk)
        for (int l = 0; l < 32; ++l) {
            const uint8_t *v = q + chunk * 128 + l;
            out[chunk * 32 + l] =
                (uint8_t)(v[0] | (v[32] << 2) | (v[64] << 4) | (v[96] << 6));
        }
}

static inline void pack_scale_min_k4(const uint8_t *sc, const uint8_t *mn, uint8_t *out) {
    for (int j = 0; j < 4; ++j) {
        out[j] = (uint8_t)((sc[j] & 63) | ((sc[j + 4] >> 4) << 6));
        out[j + 4] = (uint8_t)((mn[j] & 63) | ((mn[j + 4] >> 4) << 6));
        out[j + 8] = (uint8_t)((sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4));
    }
}

// q: int8 codes (may be signed for Q3/Q6), d/dmin: f32 per block,
// sc/mn: per-group quantized scales.
void pack_q2_k(const uint8_t *q, const float *d, const uint8_t *sc,
               const float *dmin, const uint8_t *mn, uint8_t *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint8_t *blk = out + b * 84;
        for (int g = 0; g < 16; ++g)
            blk[g] = (uint8_t)((sc[b * 16 + g] & 0xF) | ((mn[b * 16 + g] & 0xF) << 4));
        pack_2bit_lanes(q + b * 256, blk + 16);
        *(uint16_t *)(blk + 80) = fp32_to_fp16(d[b]);
        *(uint16_t *)(blk + 82) = fp32_to_fp16(dmin[b]);
    }
}

void pack_q3_k(const int8_t *q, const float *d, const int8_t *sc,
               uint8_t *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint8_t *blk = out + b * 110;
        std::memset(blk, 0, 110);
        uint8_t low[256];
        for (int p = 0; p < 256; ++p) {
            int L = q[b * 256 + p] + 4;  // 0..7
            if (L > 3) {
                blk[p % 32] |= (uint8_t)(1 << (p / 32));
                L -= 4;
            }
            low[p] = (uint8_t)L;
        }
        pack_2bit_lanes(low, blk + 32);
        for (int j = 0; j < 16; ++j) {
            uint8_t v = (uint8_t)(sc[b * 16 + j] + 32);
            uint8_t lo4 = v & 0xF, hi2 = (v >> 4) & 3;
            if (j < 8) blk[96 + j] |= lo4;
            else blk[96 + j - 8] |= (uint8_t)(lo4 << 4);
            blk[96 + 8 + (j % 4)] |= (uint8_t)(hi2 << (2 * (j / 4)));
        }
        *(uint16_t *)(blk + 108) = fp32_to_fp16(d[b]);
    }
}

void pack_q4_k(const uint8_t *q, const float *d, const uint8_t *sc,
               const float *dmin, const uint8_t *mn, uint8_t *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint8_t *blk = out + b * 144;
        *(uint16_t *)(blk + 0) = fp32_to_fp16(d[b]);
        *(uint16_t *)(blk + 2) = fp32_to_fp16(dmin[b]);
        pack_scale_min_k4(sc + b * 8, mn + b * 8, blk + 4);
        const uint8_t *qq = q + b * 256;
        for (int base = 0; base < 256; base += 64)
            for (int l = 0; l < 32; ++l)
                blk[16 + base / 2 + l] = (uint8_t)(qq[base + l] | (qq[base + 32 + l] << 4));
    }
}

void pack_q5_k(const uint8_t *q, const float *d, const uint8_t *sc,
               const float *dmin, const uint8_t *mn, uint8_t *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint8_t *blk = out + b * 176;
        *(uint16_t *)(blk + 0) = fp32_to_fp16(d[b]);
        *(uint16_t *)(blk + 2) = fp32_to_fp16(dmin[b]);
        pack_scale_min_k4(sc + b * 8, mn + b * 8, blk + 4);
        uint8_t *qh = blk + 16;
        uint8_t *ql = blk + 48;
        std::memset(qh, 0, 32);
        const uint8_t *qq = q + b * 256;
        for (int chunk = 0; chunk < 4; ++chunk) {
            int base = chunk * 64;
            for (int l = 0; l < 32; ++l) {
                uint8_t v1 = qq[base + l], v2 = qq[base + l + 32];
                if (v1 > 15) { qh[l] |= (uint8_t)(1 << (2 * chunk)); v1 -= 16; }
                if (v2 > 15) { qh[l] |= (uint8_t)(2 << (2 * chunk)); v2 -= 16; }
                ql[base / 2 + l] = (uint8_t)(v1 | (v2 << 4));
            }
        }
    }
}

void pack_q6_k(const int8_t *q, const float *d, const int8_t *sc,
               uint8_t *out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint8_t *blk = out + b * 210;
        uint8_t *ql = blk;
        uint8_t *qh = blk + 128;
        for (int chunk = 0; chunk < 2; ++chunk) {
            const int8_t *qq = q + b * 256 + chunk * 128;
            for (int l = 0; l < 32; ++l) {
                uint8_t v0 = (uint8_t)(qq[l] + 32);
                uint8_t v1 = (uint8_t)(qq[l + 32] + 32);
                uint8_t v2 = (uint8_t)(qq[l + 64] + 32);
                uint8_t v3 = (uint8_t)(qq[l + 96] + 32);
                ql[chunk * 64 + l] = (uint8_t)((v0 & 0xF) | ((v2 & 0xF) << 4));
                ql[chunk * 64 + 32 + l] = (uint8_t)((v1 & 0xF) | ((v3 & 0xF) << 4));
                qh[chunk * 32 + l] = (uint8_t)((v0 >> 4) | ((v1 >> 4) << 2) |
                                               ((v2 >> 4) << 4) | ((v3 >> 4) << 6));
            }
        }
        std::memcpy(blk + 192, sc + b * 16, 16);
        *(uint16_t *)(blk + 208) = fp32_to_fp16(d[b]);
    }
}

// ---- Q8_K / IQ4_NL / IQ4_XS dequant (round 2) -----------------------------

void dequant_q8_k(const uint8_t *blocks, float *out, int64_t n_blocks) {
    // 292 B: f32 d | int8 qs[256] | int16 bsums[16]
    for (int64_t nb = 0; nb < n_blocks; nb++) {
        const uint8_t *b = blocks + nb * 292;
        float d;
        std::memcpy(&d, b, 4);
        const int8_t *qs = (const int8_t *)(b + 4);
        float *o = out + nb * 256;
        for (int i = 0; i < 256; i++) o[i] = d * qs[i];
    }
}

static const int8_t kvalues_iq4nl[16] = {
    -127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113,
};

void dequant_iq4_nl(const uint8_t *blocks, float *out, int64_t n_blocks) {
    // 18 B: f16 d | u8 qs[16] (low nibbles = elems 0..15, high = 16..31)
    for (int64_t nb = 0; nb < n_blocks; nb++) {
        const uint8_t *b = blocks + nb * 18;
        uint16_t h;
        std::memcpy(&h, b, 2);
        float d = fp16_to_fp32(h);
        const uint8_t *qs = b + 2;
        float *o = out + nb * 32;
        for (int j = 0; j < 16; j++) {
            o[j] = d * kvalues_iq4nl[qs[j] & 0x0F];
            o[j + 16] = d * kvalues_iq4nl[qs[j] >> 4];
        }
    }
}

void dequant_iq4_xs(const uint8_t *blocks, float *out, int64_t n_blocks) {
    // 136 B: f16 d | u16 scales_h | u8 scales_l[4] | u8 qs[128]
    for (int64_t nb = 0; nb < n_blocks; nb++) {
        const uint8_t *b = blocks + nb * 136;
        uint16_t h;
        std::memcpy(&h, b, 2);
        float d = fp16_to_fp32(h);
        uint16_t sh;
        std::memcpy(&sh, b + 2, 2);
        const uint8_t *sl = b + 4;
        const uint8_t *qs = b + 8;
        float *o = out + nb * 256;
        for (int ib = 0; ib < 8; ib++) {
            int ls = ((sl[ib / 2] >> (4 * (ib % 2))) & 0x0F)
                     | (((sh >> (2 * ib)) & 3) << 4);
            float dl = d * (ls - 32);
            for (int j = 0; j < 16; j++) {
                o[j] = dl * kvalues_iq4nl[qs[j] & 0x0F];
                o[j + 16] = dl * kvalues_iq4nl[qs[j] >> 4];
            }
            o += 32;
            qs += 16;
        }
    }
}

}  // extern "C"
