"""Tests for JAX K-quant codebook fitting.

Includes a direct numerical parity test against the reference implementation
itself (imported from /root/reference with a stub ``gguf`` module), which is
the strongest available oracle in this environment.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_gguf_tpu.formats import convert, ggml
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.ops import kquant

RNG = np.random.default_rng(2)
ALL_K = [T.Q2_K, T.Q3_K, T.Q4_K, T.Q5_K, T.Q6_K]


@pytest.mark.parametrize("qtype", ALL_K)
def test_fit_quantize_dequantize_accuracy(qtype):
    x = RNG.normal(size=(8, 512)).astype(np.float32) * 0.05
    params = kquant.fit_supergroups(jnp.asarray(x), qtype)
    q = kquant.quantize(jnp.asarray(x), params, qtype)
    y = np.asarray(kquant.dequantize(q, params, qtype))
    spec = ggml.KQUANT_SPECS[qtype]
    rel = np.abs(y - x).mean() / np.abs(x).mean()
    # error must shrink as bits grow; loose per-type bounds
    bound = {2: 0.45, 3: 0.25, 4: 0.12, 5: 0.06, 6: 0.035}[spec.bits]
    assert rel < bound, f"{qtype.name}: rel err {rel:.4f}"


@pytest.mark.parametrize("qtype", ALL_K)
def test_pack_roundtrip_matches_jax_dequant(qtype):
    """GGML block bytes must dequantize (via the independent numpy codec) to
    exactly what the JAX dequantizer produces."""
    x = RNG.normal(size=(4, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
    y_jax = np.asarray(kquant.dequantize(q, params, qtype))

    blocks = convert.pack_layer(
        np.asarray(q),
        np.asarray(params.super_scale),
        np.asarray(params.scale_q),
        np.asarray(params.super_zero),
        np.asarray(params.zero_q),
        qtype,
    )
    y_ggml = ggml.dequantize(blocks.reshape(-1), qtype, (4, 512))
    np.testing.assert_allclose(y_ggml, y_jax, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("qtype", ALL_K)
def test_unpack_layer_roundtrip(qtype):
    x = RNG.normal(size=(2, 512)).astype(np.float32) * 0.1
    q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
    blocks = convert.pack_layer(
        np.asarray(q), np.asarray(params.super_scale), np.asarray(params.scale_q),
        np.asarray(params.super_zero), np.asarray(params.zero_q), qtype,
    )
    q2, ss2, sc2, sz2, zq2 = convert.unpack_layer(blocks, qtype, (2, 512))
    np.testing.assert_array_equal(np.asarray(q).astype(np.int16), q2.astype(np.int16))
    np.testing.assert_array_equal(np.asarray(params.super_scale), ss2)
    np.testing.assert_array_equal(
        np.asarray(params.scale_q).astype(np.int16), sc2.astype(np.int16)
    )


def test_degenerate_groups():
    """All-constant and all-zero groups must not produce NaNs."""
    x = np.zeros((2, 512), np.float32)
    x[1, :] = 3.14
    for qtype in ALL_K:
        q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
        y = np.asarray(kquant.dequantize(q, params, qtype))
        assert np.all(np.isfinite(y)), qtype


def test_more_bits_monotone():
    x = RNG.normal(size=(8, 1024)).astype(np.float32)
    errs = []
    for qtype in [T.Q2_K, T.Q3_K, T.Q4_K, T.Q5_K, T.Q6_K]:
        y = np.asarray(kquant.dequantize_rtn(jnp.asarray(x), qtype))
        errs.append(float(np.square(y - x).mean()))
    assert errs == sorted(errs, reverse=True), errs


# ---------------------------------------------------------------------------
# Reference parity oracle
# ---------------------------------------------------------------------------


def _load_reference_quant_utils():
    """Import the reference quant_utils with a stub gguf module (the real
    gguf package is not installed here)."""
    import importlib.util

    if "gguf" not in sys.modules:
        import importlib.machinery

        gguf_stub = types.ModuleType("gguf")
        constants = types.ModuleType("gguf.constants")
        constants.QK_K = 256
        gguf_stub.constants = constants
        # a real ModuleSpec so importlib.util.find_spec("gguf") (used by
        # transformers) doesn't choke on the stub
        gguf_stub.__spec__ = importlib.machinery.ModuleSpec("gguf", loader=None)
        constants.__spec__ = importlib.machinery.ModuleSpec("gguf.constants", loader=None)
        sys.modules["gguf"] = gguf_stub
        sys.modules["gguf.constants"] = constants
    spec = importlib.util.spec_from_file_location(
        "ref_quant_utils", "/root/reference/quant/gptq/src/quant_utils.py"
    )
    if spec is None:
        return None
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_qu = None
try:
    ref_qu = _load_reference_quant_utils()
except Exception:
    ref_qu = None


@pytest.mark.skipif(ref_qu is None, reason="reference not importable")
@pytest.mark.parametrize("qtype_name", ["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
def test_parity_with_reference_get_scale_and_zero(qtype_name):
    """fit_supergroups must reproduce the reference Quantizer.get_scale_and_zero
    bit-for-bit at default hyperparameters (absmax, rmin=-1, rdelta=0.1, nstep=20)."""
    import torch

    qtype = T[qtype_name]
    ref_type = ref_qu.GGMLQuantizationType[qtype_name]
    bits, clamp, scale_maxq, gs, sgs, sz_dtype, qw_dtype = ref_qu.GGML_QUANT_SIZES[ref_type]

    x = RNG.normal(size=(16, 256)).astype(np.float32) * 0.08

    quantizer = ref_qu.Quantizer()
    quantizer.configure(
        bits=bits, scale_maxq=scale_maxq, group_size=gs, group_type=sz_dtype,
        super_group_size=sgs,
    )
    r_ss, r_scq, r_sz, r_zq = quantizer.get_scale_and_zero(torch.from_numpy(x), ref_type)

    params = kquant.fit_supergroups(jnp.asarray(x), qtype)

    # reference returns (d_row,) for the single supergroup; ours is (d_row, 1)
    np.testing.assert_array_equal(
        np.asarray(params.super_scale).astype(np.float32).ravel(),
        r_ss.numpy().astype(np.float32).ravel(),
    )
    np.testing.assert_array_equal(
        np.asarray(params.scale_q).astype(np.int32), r_scq.numpy().astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(params.super_zero).astype(np.float32).ravel(),
        r_sz.numpy().astype(np.float32).ravel(),
    )
    np.testing.assert_array_equal(
        np.asarray(params.zero_q).astype(np.int32), r_zq.numpy().astype(np.int32)
    )


@pytest.mark.skipif(ref_qu is None, reason="reference not importable")
@pytest.mark.parametrize("qtype_name", ["Q2_K", "Q4_K", "Q6_K"])
def test_parity_with_reference_quantize_dequantize(qtype_name):
    import torch

    qtype = T[qtype_name]
    ref_type = ref_qu.GGMLQuantizationType[qtype_name]
    bits, clamp, scale_maxq, gs, sgs, sz_dtype, qw_dtype = ref_qu.GGML_QUANT_SIZES[ref_type]

    x = RNG.normal(size=(8, 512)).astype(np.float32) * 0.05
    q, params = kquant.quantize_rtn(jnp.asarray(x), qtype)
    y = kquant.dequantize(q, params, qtype)

    r_w = ref_qu.dequantize_linear_weight(
        ref_type,
        torch.from_numpy(np.asarray(q).astype(np.float32)),
        torch.from_numpy(np.asarray(params.super_scale)),
        torch.from_numpy(np.asarray(params.scale_q).astype(np.float32)),
        torch.from_numpy(np.asarray(params.super_zero)),
        torch.from_numpy(np.asarray(params.zero_q).astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(y), r_w.numpy(), rtol=1e-6, atol=1e-8)
