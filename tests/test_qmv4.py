"""V4 runtime format tests: plane-split kernel + folded offsets.

The v4 kernel (ops/qmv4.py) is the round-3 serving matmul: no sublane
concat, offset folded into an exact f32 correction dot. These tests pin
(a) bit-exact dequantization vs the canonical v2 reference, (b) the fused
kernel (interpret mode) vs the XLA path at f32, (c) the bf16 MXU path
within quantization-noise tolerance, (d) qkv/gateup fusion, and (e) the
serving dispatch routing v4 through _q_linear.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.ops import kquant, qmatmul, qmv4

RNG = np.random.default_rng(42)


def _fit(d_out, d_in, qtype, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.normal(size=(d_out, d_in)) * 0.04).astype(np.float32)
    q, p = kquant.quantize_rtn(jnp.asarray(w), qtype)
    return np.asarray(q), p


@pytest.mark.parametrize("qtype", [T.Q4_K, T.Q5_K, T.Q6_K, T.Q3_K, T.Q2_K])
def test_dequant_matches_v2(qtype):
    q, p = _fit(256, 512, qtype)
    r2 = qmatmul.pack_runtime_v2(q, p, qtype)
    r4 = qmv4.pack_runtime_v4(q, p, qtype)
    w2 = np.asarray(qmatmul.dequantize_runtime_v2(r2))
    w4 = np.asarray(qmv4.dequantize_runtime_v4(r4))
    np.testing.assert_array_equal(w2, w4)
    # v2 -> v4 conversion shares qs bytes and reproduces the same planes
    r4c = qmv4.v4_from_v2(r2)
    np.testing.assert_array_equal(
        np.asarray(qmv4.dequantize_runtime_v4(r4c)), w4)
    np.testing.assert_array_equal(np.asarray(r4c.qs), np.asarray(r4.qs))


@pytest.mark.parametrize("qtype", [T.Q4_K, T.Q5_K, T.Q6_K, T.Q3_K])
def test_kernel_interpret_matches_xla_f32(qtype):
    """f32 MXU path is exact vs the XLA reference (highest precision)."""
    q, p = _fit(512, 1024, qtype, seed=1)
    r4 = qmv4.pack_runtime_v4(q, p, qtype)
    x = jnp.asarray(RNG.normal(size=(8, 1024)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(qmv4.dequant_matmul_xla_v4(x, r4))
        y = np.asarray(qmv4.dequant_matmul_v4(
            x, r4, tile_in=512, tile_out=256, interpret=True,
            mxu_dtype=jnp.float32))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_kernel_bf16_within_quant_noise():
    q, p = _fit(512, 1024, T.Q4_K, seed=2)
    r4 = qmv4.pack_runtime_v4(q, p, T.Q4_K)
    x = jnp.asarray(RNG.normal(size=(8, 1024)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(qmv4.dequant_matmul_xla_v4(x, r4))
        y = np.asarray(qmv4.dequant_matmul_v4(
            x, r4, tile_in=512, tile_out=256, interpret=True))
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    assert np.max(np.abs(y - ref) / denom) < 0.06  # two bf16 roundings


def test_kernel_multi_chunk_accumulation():
    """Grid accumulation over input chunks == single full-depth tile."""
    q, p = _fit(256, 2048, T.Q4_K, seed=3)
    r4 = qmv4.pack_runtime_v4(q, p, T.Q4_K)
    x = jnp.asarray(RNG.normal(size=(8, 2048)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        y1 = np.asarray(qmv4.dequant_matmul_v4(
            x, r4, tile_in=512, tile_out=256, interpret=True,
            mxu_dtype=jnp.float32))
        y2 = np.asarray(qmv4.dequant_matmul_v4(
            x, r4, tile_in=2048, tile_out=256, interpret=True,
            mxu_dtype=jnp.float32))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-4)


def test_fuse_v4():
    parts = []
    for i, d_out in enumerate((256, 128, 128)):
        q, p = _fit(d_out, 512, T.Q4_K, seed=10 + i)
        parts.append(qmv4.pack_runtime_v4(q, p, T.Q4_K))
    fused = qmv4.fuse_rql_v4(parts)
    assert fused is not None and fused.d_out == 512
    x = jnp.asarray(RNG.normal(size=(4, 512)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        y = np.asarray(qmv4.dequant_matmul_xla_v4(x, fused))
        ys = [np.asarray(qmv4.dequant_matmul_xla_v4(x, r)) for r in parts]
    np.testing.assert_allclose(y, np.concatenate(ys, axis=1), rtol=1e-6)
    # mixed formats refuse to fuse
    q, p = _fit(128, 512, T.Q4_K, seed=20)
    assert qmv4.fuse_rql_v4([parts[0], qmatmul.pack_runtime_v2(q, p, T.Q4_K)]) is None


def test_dispatch_routes_v4(monkeypatch):
    """dequant_matmul + _q_linear route v4 weights through the kernel in
    interpret mode (the CPU stand-in for the TPU path) and the XLA
    fallback otherwise."""
    from gptq_gguf_tpu.serving import model as qmodel

    q, p = _fit(256, 512, T.Q4_K, seed=4)
    r4 = qmv4.pack_runtime_v4(q, p, T.Q4_K)
    x = jnp.asarray(RNG.normal(size=(2, 3, 512)).astype(np.float32))
    y_xla = np.asarray(qmodel._q_linear(x, r4))
    assert y_xla.shape == (2, 3, 256)
    monkeypatch.setattr(qmatmul, "FORCE_PALLAS_INTERPRET", True)
    y_pal = np.asarray(qmodel._q_linear(x, r4))
    denom = np.maximum(np.abs(y_xla), np.abs(y_xla).mean())
    assert np.max(np.abs(y_pal - y_xla) / denom) < 0.06


def test_pack_runtime_auto_v4():
    q, p = _fit(256, 512, T.Q4_K, seed=5)
    r = qmatmul.pack_runtime_auto(q, p, T.Q4_K, fmt="v4")
    assert isinstance(r, qmv4.RuntimeQuantLinearV4)
    assert r.packed_bits_per_weight < 6.5


def test_select_tiles_v4():
    assert qmv4.select_tiles_v4(4096, 4096) == (2048, 512)
    assert qmv4.select_tiles_v4(14336, 4096) == (2048, 512)
    # odd multiples of 256 fall back to full-depth tiles
    ti, to = qmv4.select_tiles_v4(2816, 1024)
    assert ti == 2816
    assert qmv4.select_tiles_v4(100, 4096) is None


def test_serving_fusion_with_v4():
    """fuse_layer_projections fuses uniformly-v4 layers."""
    from gptq_gguf_tpu.serving import model as qmodel

    layer = {}
    for name, d_out in (("q_proj", 256), ("k_proj", 128), ("v_proj", 128),
                        ("gate_proj", 512), ("up_proj", 512)):
        q, p = _fit(d_out, 512, T.Q4_K, seed=hash(name) % 100)
        layer[name] = qmv4.pack_runtime_v4(q, p, T.Q4_K)
    fused = qmodel.fuse_layer_projections(layer)
    assert isinstance(fused["qkv_proj"], qmv4.RuntimeQuantLinearV4)
    assert fused["qkv_proj"].d_out == 512
    assert fused["gateup_proj"].d_out == 1024
