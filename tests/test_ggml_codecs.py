"""Bit-exactness tests for the GGML block codecs.

Oracle strategy (SURVEY.md §4): gguf-py is unavailable in this environment,
so we verify via (a) pack -> unpack round trips over the full value space,
(b) independent scalar re-implementations of the llama.cpp dequant loops
(written here element-by-element, deliberately NOT sharing code with the
vectorized codecs), (c) byte-layout invariants (struct sizes, field offsets).
"""

import numpy as np
import pytest

from gptq_gguf_tpu.formats import ggml
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T

RNG = np.random.default_rng(0)


def scalar_get_scale_min_k4(j, q):
    """llama.cpp get_scale_min_k4, scalar."""
    if j < 4:
        d = q[j] & 63
        m = q[j + 4] & 63
    else:
        d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4)
        m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4)
    return d, m


def scalar_dequant_q4_k(block):
    """Scalar port of llama.cpp dequantize_row_q4_K for one 144B block."""
    d = np.frombuffer(bytes(block[0:2]), dtype=np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(bytes(block[2:4]), dtype=np.float16)[0].astype(np.float32)
    scales = block[4:16]
    qs = block[16:144]
    y = np.zeros(256, dtype=np.float32)
    is_ = 0
    qi = 0
    for j in range(0, 256, 64):
        sc1, m1 = scalar_get_scale_min_k4(is_, scales)
        sc2, m2 = scalar_get_scale_min_k4(is_ + 1, scales)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            y[j + l] = d1 * (qs[qi + l] & 0xF) - mm1
        for l in range(32):
            y[j + 32 + l] = d2 * (qs[qi + l] >> 4) - mm2
        qi += 32
        is_ += 2
    return y


def scalar_dequant_q5_k(block):
    d = np.frombuffer(bytes(block[0:2]), dtype=np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(bytes(block[2:4]), dtype=np.float16)[0].astype(np.float32)
    scales = block[4:16]
    qh = block[16:48]
    ql = block[48:176]
    y = np.zeros(256, dtype=np.float32)
    is_ = 0
    qli = 0
    u1, u2 = 1, 2
    for j in range(0, 256, 64):
        sc1, m1 = scalar_get_scale_min_k4(is_, scales)
        sc2, m2 = scalar_get_scale_min_k4(is_ + 1, scales)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            q = (ql[qli + l] & 0xF) + (16 if (qh[l] & u1) else 0)
            y[j + l] = d1 * q - mm1
        for l in range(32):
            q = (ql[qli + l] >> 4) + (16 if (qh[l] & u2) else 0)
            y[j + 32 + l] = d2 * q - mm2
        qli += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return y


def scalar_dequant_q2_k(block):
    scales = block[0:16]
    qs = block[16:80]
    d = np.frombuffer(bytes(block[80:82]), dtype=np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(bytes(block[82:84]), dtype=np.float16)[0].astype(np.float32)
    y = np.zeros(256, dtype=np.float32)
    pos = 0
    qi = 0
    is_ = 0
    for n in range(0, 256, 128):
        for shift_half in range(4):
            shift = shift_half * 2
            for sub16 in range(2):
                sc = scales[is_]
                is_ += 1
                dl = d * (sc & 0xF)
                ml = dmin * (sc >> 4)
                for l in range(16):
                    q = (qs[qi + sub16 * 16 + l] >> shift) & 3
                    y[pos] = dl * q - ml
                    pos += 1
        qi += 32
    return y


def scalar_dequant_q3_k(block):
    hm = block[0:32]
    qs = block[32:96]
    scales12 = block[96:108]
    d = np.frombuffer(bytes(block[108:110]), dtype=np.float16)[0].astype(np.float32)
    # unpack 16 6-bit scales (llama.cpp kmask trickery, scalar form)
    sc = np.zeros(16, dtype=np.int32)
    for j in range(16):
        if j < 8:
            lo = scales12[j] & 0xF
        else:
            lo = scales12[j - 8] >> 4
        hi = (scales12[8 + (j % 4)] >> (2 * (j // 4))) & 3
        sc[j] = (lo | (hi << 4)) - 32
    y = np.zeros(256, dtype=np.float32)
    for p in range(256):
        chunk, r = divmod(p, 128)
        sub, l = divmod(r, 32)
        q2 = int((qs[chunk * 32 + l] >> (2 * sub)) & 3)
        grp = p // 32
        hbit = (hm[p % 32] >> grp) & 1
        q = q2 - (0 if hbit else 4)
        y[p] = d * sc[p // 16] * q
    return y


def scalar_dequant_q6_k(block):
    ql = block[0:128]
    qh = block[128:192]
    sc = np.frombuffer(bytes(block[192:208]), dtype=np.int8)
    d = np.frombuffer(bytes(block[208:210]), dtype=np.float16)[0].astype(np.float32)
    y = np.zeros(256, dtype=np.float32)
    for n in range(0, 256, 128):
        qli = (n // 128) * 64
        qhi = (n // 128) * 32
        for l in range(32):
            is_ = l // 16
            q1 = int(ql[qli + l] & 0xF) | ((int(qh[qhi + l] >> 0) & 3) << 4)
            q2 = int(ql[qli + l + 32] & 0xF) | ((int(qh[qhi + l] >> 2) & 3) << 4)
            q3 = int(ql[qli + l] >> 4) | ((int(qh[qhi + l] >> 4) & 3) << 4)
            q4 = int(ql[qli + l + 32] >> 4) | ((int(qh[qhi + l] >> 6) & 3) << 4)
            base = n // 16
            y[n + l] = d * sc[base + is_] * (q1 - 32)
            y[n + l + 32] = d * sc[base + 2 + is_] * (q2 - 32)
            y[n + l + 64] = d * sc[base + 4 + is_] * (q3 - 32)
            y[n + l + 96] = d * sc[base + 6 + is_] * (q4 - 32)
    return y


def test_block_sizes():
    assert ggml.type_size(T.Q2_K) == 84
    assert ggml.type_size(T.Q3_K) == 110
    assert ggml.type_size(T.Q4_K) == 144
    assert ggml.type_size(T.Q5_K) == 176
    assert ggml.type_size(T.Q6_K) == 210
    assert abs(ggml.NOMINAL_BITS["Q2_K"] - 2.5625) < 1e-9
    assert abs(ggml.NOMINAL_BITS["Q3_K"] - 3.4375) < 1e-9
    assert abs(ggml.NOMINAL_BITS["Q4_K"] - 4.5) < 1e-9
    assert abs(ggml.NOMINAL_BITS["Q5_K"] - 5.5) < 1e-9
    assert abs(ggml.NOMINAL_BITS["Q6_K"] - 6.5625) < 1e-9
    assert abs(ggml.BITS_PER_WEIGHT[T.Q4_K] - 4.5) < 1e-9
    assert abs(ggml.BITS_PER_WEIGHT[T.Q6_K] - 6.5625) < 1e-9


def test_scale_min_k4_roundtrip():
    sc = RNG.integers(0, 64, size=(64, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(64, 8)).astype(np.uint8)
    packed = ggml.pack_scale_min_k4(sc, mn)
    sc2, mn2 = ggml.unpack_scale_min_k4(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


def test_q2_k_roundtrip_and_scalar_oracle():
    n = 16
    q = RNG.integers(0, 4, size=(n, 256)).astype(np.uint8)
    sc = RNG.integers(0, 16, size=(n, 16)).astype(np.uint8)
    mn = RNG.integers(0, 16, size=(n, 16)).astype(np.uint8)
    d = RNG.normal(size=n).astype(np.float32) * 0.01
    dmin = RNG.normal(size=n).astype(np.float32) * 0.01
    blocks = ggml.pack_q2_k(q, d, sc, dmin, mn)
    assert blocks.shape == (n, 84)
    q2, d2, sc2, dmin2, mn2 = ggml.unpack_q2_k(blocks)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)
    np.testing.assert_allclose(d.astype(np.float16).astype(np.float32), d2)
    vec = ggml.dequant_q2_k(blocks)
    for i in range(4):
        np.testing.assert_allclose(vec[i], scalar_dequant_q2_k(blocks[i]), rtol=1e-6)


def test_q3_k_roundtrip_and_scalar_oracle():
    n = 16
    q = RNG.integers(-4, 4, size=(n, 256)).astype(np.int8)
    sc = RNG.integers(0, 32, size=(n, 16)).astype(np.int8)
    d = RNG.normal(size=n).astype(np.float32) * 0.01
    blocks = ggml.pack_q3_k(q, d, sc)
    assert blocks.shape == (n, 110)
    q2, d2, sc2 = ggml.unpack_q3_k(blocks)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(sc.astype(np.int16), sc2.astype(np.int16))
    vec = ggml.dequant_q3_k(blocks)
    for i in range(4):
        np.testing.assert_allclose(vec[i], scalar_dequant_q3_k(blocks[i]), rtol=1e-6)


def test_q4_k_roundtrip_and_scalar_oracle():
    n = 16
    q = RNG.integers(0, 16, size=(n, 256)).astype(np.uint8)
    sc = RNG.integers(0, 64, size=(n, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(n, 8)).astype(np.uint8)
    d = RNG.normal(size=n).astype(np.float32) * 0.01
    dmin = RNG.normal(size=n).astype(np.float32) * 0.01
    blocks = ggml.pack_q4_k(q, d, sc, dmin, mn)
    assert blocks.shape == (n, 144)
    q2, d2, sc2, dmin2, mn2 = ggml.unpack_q4_k(blocks)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)
    vec = ggml.dequant_q4_k(blocks)
    for i in range(4):
        np.testing.assert_allclose(vec[i], scalar_dequant_q4_k(blocks[i]), rtol=1e-6)


def test_q5_k_roundtrip_and_scalar_oracle():
    n = 16
    q = RNG.integers(0, 32, size=(n, 256)).astype(np.uint8)
    sc = RNG.integers(0, 64, size=(n, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(n, 8)).astype(np.uint8)
    d = RNG.normal(size=n).astype(np.float32) * 0.01
    dmin = RNG.normal(size=n).astype(np.float32) * 0.01
    blocks = ggml.pack_q5_k(q, d, sc, dmin, mn)
    assert blocks.shape == (n, 176)
    q2, *_ = ggml.unpack_q5_k(blocks)
    np.testing.assert_array_equal(q, q2)
    vec = ggml.dequant_q5_k(blocks)
    for i in range(4):
        np.testing.assert_allclose(vec[i], scalar_dequant_q5_k(blocks[i]), rtol=1e-6)


def test_q6_k_roundtrip_and_scalar_oracle():
    n = 16
    q = RNG.integers(-32, 32, size=(n, 256)).astype(np.int8)
    sc = RNG.integers(-128, 128, size=(n, 16)).astype(np.int8)
    d = RNG.normal(size=n).astype(np.float32) * 0.01
    blocks = ggml.pack_q6_k(q, d, sc)
    assert blocks.shape == (n, 210)
    q2, d2, sc2 = ggml.unpack_q6_k(blocks)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(sc, sc2)
    vec = ggml.dequant_q6_k(blocks)
    for i in range(4):
        np.testing.assert_allclose(vec[i], scalar_dequant_q6_k(blocks[i]), rtol=1e-6)


def test_q8_0_roundtrip():
    x = RNG.normal(size=(8, 32)).astype(np.float32)
    blocks = ggml.quantize_q8_0(x)
    assert blocks.shape == (8, 34)
    y = ggml.dequant_q8_0(blocks)
    assert np.abs(y - x).max() < np.abs(x).max() / 100  # 8-bit accuracy


def test_q4_0_roundtrip():
    x = RNG.normal(size=(8, 32)).astype(np.float32)
    blocks = ggml.quantize_q4_0(x)
    assert blocks.shape == (8, 18)
    y = ggml.dequant_q4_0(blocks)
    assert np.abs(y - x).max() < np.abs(x).max() / 4


def test_generic_dequantize_dispatch():
    q = RNG.integers(0, 16, size=(8, 256)).astype(np.uint8)
    sc = RNG.integers(0, 64, size=(8, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(8, 8)).astype(np.uint8)
    d = np.abs(RNG.normal(size=8)).astype(np.float32) * 0.01
    dmin = np.abs(RNG.normal(size=8)).astype(np.float32) * 0.01
    blocks = ggml.pack_q4_k(q, d, sc, dmin, mn)
    out = ggml.dequantize(blocks.reshape(-1), T.Q4_K, (4, 512))
    assert out.shape == (4, 512)
    np.testing.assert_allclose(out.reshape(8, 256), ggml.dequant_q4_k(blocks))


def test_f16_f32_bf16_dequantize():
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    np.testing.assert_array_equal(ggml.dequantize(x.view(np.uint8).reshape(-1), T.F32, (4, 8)), x)
    h = x.astype(np.float16)
    np.testing.assert_allclose(ggml.dequantize(h.view(np.uint8).reshape(-1), T.F16, (4, 8)), h.astype(np.float32))
    bf_bits = (x.view(np.uint32) >> 16).astype(np.uint16)
    np.testing.assert_allclose(
        ggml.dequantize(bf_bits.view(np.uint8).reshape(-1), T.BF16, (4, 8)),
        (bf_bits.astype(np.uint32) << 16).view(np.float32).reshape(4, 8),
    )


# ---------------------------------------------------------------------------
# Q8_K / IQ4_NL / IQ4_XS (round 2)
# ---------------------------------------------------------------------------


def test_q8_k_roundtrip_and_bsums():
    x = RNG.normal(size=(6, 256)).astype(np.float32)
    blocks = ggml.quantize_q8_k(x)
    assert blocks.shape == (6, 292)
    q, d, bsums = ggml.unpack_q8_k(blocks)
    # bsums must equal group-of-16 sums of the quants
    np.testing.assert_array_equal(
        bsums, q.reshape(6, 16, 16).astype(np.int32).sum(axis=2).astype(np.int16)
    )
    # the max-|x| element quantizes to exactly -127 * sign convention
    y = ggml.dequant_q8_k(blocks)
    assert np.abs(y - x).max() <= np.abs(x).max() / 127 * 0.51 + 1e-7
    # zero block
    z = ggml.quantize_q8_k(np.zeros((1, 256), np.float32))
    qz, dz, _ = ggml.unpack_q8_k(z)
    assert dz[0] == 0.0 and not qz.any()


def test_iq4_nl_roundtrip():
    x = RNG.normal(size=(16, 32)).astype(np.float32) * 0.3
    blocks = ggml.quantize_iq4_nl(x)
    assert blocks.shape == (16, 18)
    y = ggml.dequant_iq4_nl(blocks)
    # nonlinear grid: error bounded by half the widest codebook gap * scale
    scale = np.abs(x).max(axis=1, keepdims=True)
    assert np.abs(y - x).max() < 0.15 * scale.max()
    # must beat or track Q4_0 on gaussian data (that's the point of the grid)
    y40 = ggml.dequant_q4_0(ggml.quantize_q4_0(x))
    assert np.square(y - x).mean() < np.square(y40 - x).mean() * 1.1


def test_iq4_nl_exact_codebook_recovery():
    """Data lying exactly on d * codebook must round-trip losslessly."""
    d = 0.125
    idx = RNG.integers(0, 16, size=(2, 32))
    idx[:, 0] = 0  # anchor each block's extremum on the -127 codepoint so the
    # scale search can land exactly (llama.cpp's grid anchors d on values[0])
    x = d * ggml.IQ4NL_VALUES[idx].astype(np.float32)
    y = ggml.dequant_iq4_nl(ggml.quantize_iq4_nl(x))
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-3)


def test_iq4_xs_roundtrip():
    x = RNG.normal(size=(4, 256)).astype(np.float32) * 0.2
    blocks = ggml.quantize_iq4_xs(x)
    assert blocks.shape == (4, 136)
    L, d, ls = ggml.unpack_iq4_xs(blocks)
    assert L.max() <= 15 and ls.min() >= -32 and ls.max() <= 31
    y = ggml.dequant_iq4_xs(blocks)
    scale = np.abs(x).max()
    assert np.abs(y - x).max() < 0.2 * scale
    # generic dispatch path
    out = ggml.dequantize(blocks.reshape(-1), T.IQ4_XS, (2, 512))
    np.testing.assert_allclose(out.reshape(4, 256), y)


def test_iq4_xs_scale_packing_roundtrip():
    """6-bit block scales survive the scales_h/scales_l packing."""
    x = (RNG.normal(size=(8, 256)) * np.exp(RNG.normal(size=(8, 1)))).astype(np.float32)
    blocks = ggml.quantize_iq4_xs(x)
    _, d, ls = ggml.unpack_iq4_xs(blocks)
    # reconstruct what the quantizer stored and check consistency: the
    # largest-|scale| block must be near -32 or the clamp boundary
    assert (np.abs(ls) == np.abs(ls).max(axis=1, keepdims=True)).any(axis=1).all()


def test_iq4_with_imatrix_changes_fit():
    x = RNG.normal(size=(2, 256)).astype(np.float32)
    qw = np.ones((2, 256), np.float32)
    qw[:, :32] = 100.0  # heavily weight the first block's elements
    b0 = ggml.quantize_iq4_xs(x)
    b1 = ggml.quantize_iq4_xs(x, qw)
    assert b0.shape == b1.shape
    # weighting must actually influence the fit
    assert (b0 != b1).any()
