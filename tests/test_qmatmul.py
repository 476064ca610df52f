"""Runtime quantized-matmul tests (XLA path + Pallas kernel in interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.ops import kquant, qmatmul

RNG = np.random.default_rng(14)
ALL_K = [T.Q2_K, T.Q3_K, T.Q4_K, T.Q5_K, T.Q6_K]


@pytest.mark.parametrize("qtype", ALL_K)
def test_runtime_format_exact(qtype):
    """dequantize_runtime must equal the canonical dequantize bit-for-bit."""
    x = RNG.normal(size=(8, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
    w_ref = np.asarray(kquant.dequantize(q, params, qtype))
    rql = qmatmul.pack_runtime(np.asarray(q), params, qtype)
    w_rt = np.asarray(qmatmul.dequantize_runtime(rql))
    np.testing.assert_array_equal(w_rt, w_ref)


@pytest.mark.parametrize("qtype", [T.Q4_K, T.Q6_K])
def test_dequant_matmul_xla(qtype):
    wx = RNG.normal(size=(256, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime(np.asarray(q), params, qtype)
    x = RNG.normal(size=(4, 512)).astype(np.float32)
    y = np.asarray(qmatmul.dequant_matmul_xla(jnp.asarray(x), rql))
    w = np.asarray(kquant.dequantize(q, params, qtype))
    np.testing.assert_allclose(y, x @ w.T, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("qtype", [T.Q2_K, T.Q4_K, T.Q6_K])
def test_pallas_kernel_interpret_matches_xla(qtype):
    wx = RNG.normal(size=(512, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime(np.asarray(q), params, qtype)
    x = jnp.asarray(RNG.normal(size=(8, 512)).astype(np.float32))
    y_ref = np.asarray(qmatmul.dequant_matmul_xla(x, rql))
    y_pal = np.asarray(
        qmatmul.dequant_matmul_pallas(x, rql, tile_out=256, tile_in=256, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-4)


def test_packed_size_is_compact():
    wx = RNG.normal(size=(512, 4096)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
    rql = qmatmul.pack_runtime(np.asarray(q), params, T.Q4_K)
    assert rql.packed_bits_per_weight < 6.5  # 4 bits codes + f32 scales/32
    assert rql.qs.dtype == jnp.uint8


@pytest.mark.parametrize(
    "d_in,d_out,expect",
    [
        (4096, 4096, (1024, 512)),
        (3584, 3584, (512, 512)),   # qwen2-7b/gemma2-9b hidden
        (11008, 4096, (256, 512)),  # 11008 = 256*43, 43 prime
        (4096, 11008, (1024, 256)),
        (2304, 2304, (768, 256)),   # gemma2-2b hidden: 2304 = 256*9
        (512, 512, (512, 512)),
        (300, 512, None),           # not a QK_K multiple
        (512, 100, None),
    ],
)
def test_select_tiles(d_in, d_out, expect):
    got = qmatmul.select_tiles(d_in, d_out)
    assert got == expect
    if got is not None:
        ti, to = got
        assert d_in % ti == 0 and ti % 256 == 0 and ti <= 1024
        assert d_out % to == 0 and to % 256 == 0 and to <= 512


def test_pallas_interpret_odd_shapes():
    """Shapes that previously crashed the dispatch (ADVICE: 3584 etc.)."""
    wx = RNG.normal(size=(768, 1280)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
    rql = qmatmul.pack_runtime(np.asarray(q), params, T.Q4_K)
    ti, to = qmatmul.select_tiles(1280, 768)
    x = jnp.asarray(RNG.normal(size=(4, 1280)).astype(np.float32))
    y_ref = np.asarray(qmatmul.dequant_matmul_xla(x, rql))
    y_pal = np.asarray(
        qmatmul.dequant_matmul_pallas(x, rql, tile_in=ti, tile_out=to, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# V2 compact-scale format + Q8 integer path (round 2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qtype", ALL_K)
def test_runtime_v2_format_exact(qtype):
    """dequantize_runtime_v2 must equal the canonical dequantize bit-for-bit."""
    x = RNG.normal(size=(8, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
    w_ref = np.asarray(kquant.dequantize(q, params, qtype))
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, qtype)
    w_rt = np.asarray(qmatmul.dequantize_runtime_v2(rql))
    np.testing.assert_array_equal(w_rt, w_ref)


@pytest.mark.parametrize("qtype", [T.Q2_K, T.Q3_K, T.Q4_K, T.Q6_K])
def test_pallas_v2_interpret_matches_xla(qtype):
    wx = RNG.normal(size=(512, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, qtype)
    x = jnp.asarray(RNG.normal(size=(8, 512)).astype(np.float32))
    y_ref = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y_pal = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True, mxu_dtype=jnp.float32
    ))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-4)
    # bf16 MXU operands: small relative error vs f32 path
    y_bf = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True, mxu_dtype=jnp.bfloat16
    ))
    ref_scale = np.abs(y_ref).max()
    assert np.abs(y_bf - y_ref).max() < 0.02 * ref_scale


@pytest.mark.parametrize("qtype", [T.Q2_K, T.Q3_K, T.Q4_K, T.Q6_K])
def test_pallas_v3_offset_fold_matches_xla(qtype):
    """v3 kernel (offset folded into an xsum dot, raw-code scale multiply in
    mxu_dtype) must match the canonical dequant matmul: exactly at f32, to
    bf16 rounding otherwise."""
    wx = RNG.normal(size=(512, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, qtype)
    x = jnp.asarray(RNG.normal(size=(8, 512)).astype(np.float32))
    y_ref = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y_pal = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True,
        mxu_dtype=jnp.float32, variant="v3",
    ))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-4)
    y_bf = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True,
        mxu_dtype=jnp.bfloat16, variant="v3",
    ))
    ref_scale = np.abs(y_ref).max()
    assert np.abs(y_bf - y_ref).max() < 0.03 * ref_scale


@pytest.mark.parametrize("variant", ["v2f", "v2h", "v2g", "v2s", "v2m",
                                     "v2t", "v2p"])
@pytest.mark.parametrize("qtype", [T.Q2_K, T.Q3_K, T.Q4_K, T.Q5_K, T.Q6_K])
def test_pallas_v2fh_group_fold_matches_xla(qtype, variant):
    """v2f folds the signed-code shift into the group offset plane (f32
    affine, no correction dot); v2h additionally does the per-weight affine
    in mxu_dtype. Both must match the canonical dequant matmul: v2f to f32
    association (exact at mxu_dtype=f32), v2h to bf16 rounding.

    The dispatcher substitutes variants per format (ADVICE r4: assert which
    kernel actually runs, don't vacuously re-test v2g): v2m/v2p at gs=16 ->
    v2p pair-group kernel; v2t at gs=16 and v2s on byte-wide codes -> v2g.
    Q5_K pins v2m's per_byte==1 branch; Q2/Q3/Q6_K pin v2p's three shapes
    (has_min, signed-shift, 6-bit codes)."""
    spec = kquant.KQUANT_SPECS[qtype]
    eff = qmatmul._effective_v2_variant(
        variant, gs=spec.group_size,
        per_byte=2 if spec.bits <= 4 else 1, tile_in=256, B=8)
    if variant in ("v2m", "v2p") and spec.group_size == 16:
        assert eff == "v2p"
    if variant == "v2t" and spec.group_size == 16:
        assert eff == "v2g"
    if variant == "v2s" and spec.bits > 4:
        assert eff == "v2g"
    wx = RNG.normal(size=(512, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, qtype)
    x = jnp.asarray(RNG.normal(size=(8, 512)).astype(np.float32))
    y_ref = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y_pal = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True,
        mxu_dtype=jnp.float32, variant=variant,
    ))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-4)
    y_bf = np.asarray(qmatmul.dequant_matmul_pallas_v2(
        x, rql, tile_out=256, tile_in=256, interpret=True,
        mxu_dtype=jnp.bfloat16, variant=variant,
    ))
    ref_scale = np.abs(y_ref).max()
    assert np.abs(y_bf - y_ref).max() < 0.03 * ref_scale


def test_v2_bits_per_weight_compact():
    wx = RNG.normal(size=(512, 4096)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
    v1 = qmatmul.pack_runtime(np.asarray(q), params, T.Q4_K)
    v2 = qmatmul.pack_runtime_v2(np.asarray(q), params, T.Q4_K)
    assert abs(v1.packed_bits_per_weight - 6.0) < 0.01
    assert abs(v2.packed_bits_per_weight - 5.0) < 0.01  # x2-replicated super-scales
    # signed type: no min planes at all
    q6, p6 = kquant.quantize_rtn(jnp.asarray(wx), T.Q6_K)
    v26 = qmatmul.pack_runtime_v2(np.asarray(q6), p6, T.Q6_K)
    assert not v26.has_min
    assert abs(v26.packed_bits_per_weight - 8.75) < 0.01


@pytest.mark.parametrize("qtype", [T.Q4_K, T.Q6_K])
def test_q8_matmul_semantics(qtype):
    """Integer-dot path must track the float path within Q8 activation error
    (llama.cpp vec_dot_q4_K_q8_K semantics)."""
    wx = RNG.normal(size=(256, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(wx), qtype)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, qtype)
    x = jnp.asarray(RNG.normal(size=(4, 512)).astype(np.float32))
    y_f = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y_i = np.asarray(qmatmul.q8_matmul_xla(x, rql))
    scale = np.abs(y_f).max()
    assert np.abs(y_i - y_f).max() < 0.02 * scale


def test_q8_activation_quantization():
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    q, d = qmatmul.quantize_activations_q8(x)
    assert q.dtype == jnp.int8 and d.shape == (2, 2)
    xr = np.asarray(x).reshape(2, 2, 256)
    np.testing.assert_allclose(np.asarray(d), np.abs(xr).max(-1) / 127.0, rtol=1e-6)
    recon = np.asarray(q, np.float32).reshape(2, 2, 256) * np.asarray(d)[:, :, None]
    assert np.abs(recon - xr).max() <= np.asarray(d).max() * 0.51


@pytest.mark.parametrize("d_in,d_out,expect", [
    (4096, 4096, (4096, 512)),    # 8192 cap: docs/KERNELS_r04.md sweep
    (14336, 4096, (7168, 512)),
    (11008, 4096, (11008, 256)),  # 256*43: no 1024 divisor -> full depth
    (2304, 2304, (2304, 256)),
    (512, 512, (512, 512)),       # full depth (d_in <= 16384)
    (300, 512, None),
])
def test_select_tiles_v2(d_in, d_out, expect):
    assert qmatmul.select_tiles_v2(d_in, d_out) == expect


def test_pad_dout_v2_exact():
    """pad_dout_v2: padded rows dequantize to 0 and the matmul's first
    d_out columns are unchanged (lm_head vocab padding, round 4)."""
    wx = RNG.normal(size=(320, 512)).astype(np.float32) * 0.1  # 320 % 512 != 0
    q, params = kquant.quantize_rtn(jnp.asarray(wx), T.Q6_K)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, T.Q6_K)
    padded = qmatmul.pad_dout_v2(rql, multiple=512)
    assert padded.d_out == 512 and rql.d_out == 320
    x = jnp.asarray(RNG.normal(size=(4, 512)).astype(np.float32))
    y0 = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y1 = np.asarray(qmatmul.dequant_matmul_xla_v2(x, padded))
    # different dot shapes -> different f32 reduction order (1e-5 drift)
    np.testing.assert_allclose(y1[:, :320], y0, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(y1[:, 320:], 0.0)
    # aligned input is returned untouched
    assert qmatmul.pad_dout_v2(padded, multiple=512) is padded
    # Q4_K (has mins) too
    q, params = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
    rql = qmatmul.pack_runtime_v2(np.asarray(q), params, T.Q4_K)
    padded = qmatmul.pad_dout_v2(rql, multiple=512)
    y0 = np.asarray(qmatmul.dequant_matmul_xla_v2(x, rql))
    y1 = np.asarray(qmatmul.dequant_matmul_xla_v2(x, padded))
    np.testing.assert_allclose(y1[:, :320], y0, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(y1[:, 320:], 0.0)
