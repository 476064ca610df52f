"""K-quant codebook fitting as batched JAX ops.

TPU-native re-design of the reference's per-supergroup Python loops
(quant/gptq/src/quant_utils.py:90-274): every routine here is vectorized over
*all* supergroups of a weight matrix at once, so scale fitting for an entire
layer is one XLA program on the MXU/VPU instead of ``d_col/256`` sequential
torch calls. Numerics follow the reference exactly (fp32 compute, fp16
super-scale rounding, identical refinement schedule) so quantized outputs
match at matched hyperparameters.

Shapes convention: a weight matrix is (d_row, d_col); supergroups are
consecutive runs of 256 columns; groups are consecutive runs of 16 or 32
columns inside a supergroup.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.ggml import KQUANT_SPECS, GGMLQuantizationType, KQuantSpec, QK_K

DEFAULT_EPS = 1e-9


class ScaleSearchConfig(NamedTuple):
    """Hyperparameters of the scale search (reference quant_utils.py:54-88 and
    run_quant.sh:23-33 defaults)."""

    quant_scale: str = "absmax"  # "absmax" | "mse"
    grid: int = 100
    maxshrink: float = 0.80
    norm: float = 2.0
    rmin: float = -1.0
    rdelta: float = 0.1
    nstep: int = 20
    eps: float = DEFAULT_EPS
    # Replicate the reference's uint8 overflow in ``new_q**2``
    # (quant_utils.py:246: uint8 squares wrap mod 256, which corrupts sum_l2
    # for Q5_K where maxq=31). The published reference models were produced
    # with this behavior; set False for the mathematically clean path.
    compat_uint8_overflow: bool = True


class SuperGroupParams(NamedTuple):
    """Quantization parameters of a weight matrix.

    Matches the on-disk layer artifact of the reference
    (quant/gptq/src/quantizer.py:267-275):
      super_scale: (d_row, n_sg) fp16 — per-supergroup scale of scales
      super_zero:  (d_row, n_sg) fp16 — per-supergroup scale of mins
      scale_q:     (d_row, n_groups) int — quantized group scales
      zero_q:      (d_row, n_groups) int — quantized group mins
    """

    super_scale: jax.Array
    super_zero: jax.Array
    scale_q: jax.Array
    zero_q: jax.Array


# ---------------------------------------------------------------------------
# Group-level scale fitting
# ---------------------------------------------------------------------------


def make_quants(
    x: jax.Array, maxq: int, cfg: ScaleSearchConfig = ScaleSearchConfig()
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric min/max grid fit for signed K-quants (Q3_K / Q6_K).

    Re-expression of reference quant_utils.py:147-197. ``x``: (..., gs);
    returns (scale, zero) with shape (...,), zero always 0 (signed formats
    encode around 0).

    The reference's MSE branch contains an evident typo (it rounds the
    clamped scale instead of the quotient, quant_utils.py:179-181); we
    implement the mathematically intended shrink search (round the quotient)
    — published numbers all use the default "absmax" path where the two
    coincide.
    """
    xmin0 = x.min(axis=-1)
    xmax0 = x.max(axis=-1)
    xmax = jnp.maximum(jnp.abs(xmin0), xmax0)
    xmin = jnp.where(xmin0 < 0, -xmax, xmin0)
    degenerate = xmin == xmax
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq

    if cfg.quant_scale == "mse":
        zero_val = (maxq + 1) / 2.0
        steps = int(cfg.maxshrink * cfg.grid) + 1

        def body(i, carry):
            best_scale, min_loss = carry
            alpha = 1.0 - i / (cfg.maxshrink * cfg.grid)
            cand_max = jnp.maximum(xmax, jnp.abs(xmin)) * alpha
            xmax1 = jnp.minimum(xmax, cand_max)
            xmin1 = jnp.maximum(xmin, -cand_max)
            scale1 = (xmax1 - xmin1) / maxq
            q = jnp.clip(
                jnp.round((x - zero_val) / jnp.maximum(scale1, 1e-9)[..., None]),
                0,
                maxq,
            )
            y = q * scale1[..., None] + zero_val
            loss = jnp.sum(jnp.abs(y - x) ** cfg.norm, axis=-1)
            better = loss < min_loss
            return (
                jnp.where(better, scale1, best_scale),
                jnp.where(better, loss, min_loss),
            )

        scale, _ = jax.lax.fori_loop(
            0, steps, body, (scale, jnp.full_like(scale, jnp.inf))
        )

    return scale, jnp.zeros_like(scale)


def make_k_quants(
    x: jax.Array, maxq: int, cfg: ScaleSearchConfig = ScaleSearchConfig(),
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Weighted least-squares scale/min refinement for unsigned K-quants
    (Q2_K / Q4_K / Q5_K) — llama.cpp's ``make_qkx2_quants`` scheme.

    Re-expression of reference quant_utils.py:199-274. ``x``: (..., gs);
    returns (scale, zero) of shape (...,) with zero = -best_min >= 0.
    ``weights``: optional importance weights (importance-matrix path,
    llama.cpp's quant_weights); defaults to the reference's av_x + |x|.
    """
    eps = cfg.eps
    gs = x.shape[-1]
    sum_x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    av_x = jnp.sqrt(sum_x2 / gs)
    if weights is None:
        weights = av_x + jnp.abs(x)  # (..., gs)

    x_min = jnp.minimum(x.min(axis=-1, keepdims=True), 0.0)
    x_max = x.max(axis=-1, keepdims=True)
    const_mask = x_max == x_min  # (..., 1)

    sum_w = jnp.sum(weights, axis=-1, keepdims=True)
    sum_x = jnp.sum(weights * x, axis=-1, keepdims=True)

    scale0 = jnp.where(const_mask, 0.0, (x_max - x_min) / maxq)
    iscale0 = 1.0 / jnp.maximum(scale0, eps)
    q0 = jnp.clip(jnp.round((x - x_min) * iscale0), 0, maxq)
    q0 = jnp.where(const_mask, 0.0, q0)

    diff0 = scale0 * q0 + x_min - x
    best_err0 = jnp.sum(weights * diff0 * diff0, axis=-1, keepdims=True)

    if cfg.nstep < 1:
        return scale0.squeeze(-1), (-x_min).squeeze(-1)

    # Candidate numerators are computed in float64 on host and cast once to
    # f32, matching the reference's python-scalar arithmetic
    # (quant_utils.py:241) bit-for-bit; doing `rmin + rdelta*i` in traced f32
    # shifts the iscale by ~1 ulp, which flips round() at knife-edge products
    # and changes the selected codebook.
    numerators = jnp.asarray(
        (np.float64(cfg.rmin) + np.float64(cfg.rdelta) * np.arange(cfg.nstep + 1) + maxq
         ).astype(np.float32)
    )

    def body(i, carry):
        best_scale, best_min, best_err = carry
        # NOTE: the candidate grid is anchored at the *current best min*, not
        # the data min: the reference aliases ``best_min = x_min`` and then
        # updates it in place (quant_utils.py:228,269-271), so accepted steps
        # feed back into later candidates. We reproduce that semantics —
        # it measurably changes which codebooks are selected.
        cand_iscale = numerators[i] / jnp.maximum(x_max - best_min, eps)
        new_q = jnp.clip(jnp.round((x - best_min) * cand_iscale), 0, maxq)
        new_q = jnp.where(const_mask, 0.0, new_q)

        sum_l = jnp.sum(weights * new_q, axis=-1, keepdims=True)
        if cfg.compat_uint8_overflow:
            nq_sq = (new_q.astype(jnp.uint8) * new_q.astype(jnp.uint8)).astype(jnp.float32)
        else:
            nq_sq = new_q * new_q
        sum_l2 = jnp.sum(weights * nq_sq, axis=-1, keepdims=True)
        sum_xl = jnp.sum(weights * x * new_q, axis=-1, keepdims=True)

        D = sum_w * sum_l2 - sum_l * sum_l
        valid = D > eps
        Dsafe = jnp.where(valid, D, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / Dsafe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / Dsafe
        pos = this_min > 0
        this_scale = jnp.where(pos, sum_xl / jnp.maximum(sum_l2, eps), this_scale)
        this_min = jnp.where(pos, 0.0, this_min)

        diff = this_scale * new_q + this_min - x
        cand_err = jnp.sum(weights * diff * diff, axis=-1, keepdims=True)
        better = valid & (cand_err < best_err)
        return (
            jnp.where(better, this_scale, best_scale),
            jnp.where(better, this_min, best_min),
            jnp.where(better, cand_err, best_err),
        )

    best_scale, best_min, _ = jax.lax.fori_loop(
        0, cfg.nstep + 1, body, (scale0, x_min, best_err0)
    )
    return best_scale.squeeze(-1), (-best_min).squeeze(-1)


# ---------------------------------------------------------------------------
# Supergroup double quantization
# ---------------------------------------------------------------------------


_MAKE_FN = {
    GGMLQuantizationType.Q2_K: make_k_quants,
    GGMLQuantizationType.Q3_K: make_quants,
    GGMLQuantizationType.Q4_K: make_k_quants,
    GGMLQuantizationType.Q5_K: make_k_quants,
    GGMLQuantizationType.Q6_K: make_quants,
}


@functools.partial(jax.jit, static_argnames=("qtype", "cfg"))
def fit_supergroups(
    x: jax.Array,
    qtype: GGMLQuantizationType,
    cfg: ScaleSearchConfig = ScaleSearchConfig(),
    imatrix: Optional[jax.Array] = None,
) -> SuperGroupParams:
    """Fit quantization parameters for all supergroups of a weight matrix.

    Re-expression of reference quant_utils.py:90-145 (``get_scale_and_zero``),
    batched over every supergroup at once instead of one 256-column slice per
    call. ``x``: (d_row, d_col) float; d_col % 256 == 0.

    ``imatrix``: optional (d_col,) importance weights (mean squared
    activations, i.e. diag(H)/2) enabling the llama-quantize ``--imatrix``
    path: group weights become ``im * sqrt(sigma2 + x^2)`` (llama.cpp
    make_qkx3_quants) for the weighted-LSQ types.
    """
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = x.shape
    n_sg = d_col // spec.super_group_size
    gpsg = spec.num_groups  # groups per supergroup
    x = x.astype(jnp.float32).reshape(d_row, n_sg, gpsg, spec.group_size)

    maxq = 2**spec.bits - 1
    if imatrix is not None and _MAKE_FN[qtype] is make_k_quants:
        im = imatrix.astype(jnp.float32).reshape(1, n_sg, gpsg, spec.group_size)
        sigma2 = jnp.mean(x * x, axis=(-2, -1), keepdims=True)
        w = im * jnp.sqrt(sigma2 + x * x)
        scale, zero = make_k_quants(x, maxq, cfg, weights=w)
    else:
        scale, zero = _MAKE_FN[qtype](x, maxq, cfg)  # (d_row, n_sg, gpsg)

    max_scale = scale.max(axis=-1)  # (d_row, n_sg)
    max_zero = zero.max(axis=-1)

    super_scale = (max_scale / spec.scale_maxq).astype(jnp.float16)
    super_zero = (max_zero / spec.scale_maxq).astype(jnp.float16)

    inv_scale = jnp.where(max_scale > 0, spec.scale_maxq / jnp.where(max_scale > 0, max_scale, 1.0), 0.0)
    inv_zero = jnp.where(max_zero > 0, spec.scale_maxq / jnp.where(max_zero > 0, max_zero, 1.0), 0.0)

    int_dtype = jnp.int8 if spec.signed else jnp.uint8
    scale_q = jnp.clip(jnp.round(inv_scale[..., None] * scale), 0, spec.scale_maxq).astype(int_dtype)
    zero_q = jnp.clip(jnp.round(inv_zero[..., None] * zero), 0, spec.scale_maxq).astype(int_dtype)

    return SuperGroupParams(
        super_scale,
        super_zero,
        scale_q.reshape(d_row, n_sg * gpsg),
        zero_q.reshape(d_row, n_sg * gpsg),
    )


def _expanded_scales(
    params: SuperGroupParams, spec: KQuantSpec, d_col: int
) -> Tuple[jax.Array, jax.Array]:
    """Reconstructed per-element (scale, offset) of shape (d_row, d_col)."""
    gs, sgs = spec.group_size, spec.super_group_size
    ss = jnp.repeat(params.super_scale.astype(jnp.float32), sgs, axis=1)
    sz = jnp.repeat(params.super_zero.astype(jnp.float32), sgs, axis=1)
    sq = jnp.repeat(params.scale_q.astype(jnp.float32), gs, axis=1)
    zq = jnp.repeat(params.zero_q.astype(jnp.float32), gs, axis=1)
    return ss * sq, sz * zq


@functools.partial(jax.jit, static_argnames=("qtype", "eps"))
def quantize(
    x: jax.Array,
    params: SuperGroupParams,
    qtype: GGMLQuantizationType,
    eps: float = DEFAULT_EPS,
) -> jax.Array:
    """Elementwise quantize a (d_row, d_col) matrix to integer codes
    (reference quant_utils.py:34-40)."""
    spec = KQUANT_SPECS[qtype]
    scale, offset = _expanded_scales(params, spec, x.shape[1])
    q = jnp.round((x.astype(jnp.float32) + offset) / jnp.maximum(scale, eps))
    q = jnp.clip(q, spec.qmin, spec.qmax)
    return q.astype(jnp.int8 if spec.signed else jnp.uint8)


@functools.partial(jax.jit, static_argnames=("qtype",))
def dequantize(
    q: jax.Array, params: SuperGroupParams, qtype: GGMLQuantizationType
) -> jax.Array:
    """Elementwise dequantize integer codes back to float32
    (reference quant_utils.py:43-46, 277-310)."""
    spec = KQUANT_SPECS[qtype]
    scale, offset = _expanded_scales(params, spec, q.shape[1])
    return scale * q.astype(jnp.float32) - offset


def quantize_column_slice(
    w_col: jax.Array,
    params: SuperGroupParams,
    qtype: GGMLQuantizationType,
    sg_idx,
    g_idx,
    eps: float = DEFAULT_EPS,
) -> Tuple[jax.Array, jax.Array]:
    """Quantize+dequantize one column: (d_row,) -> (q, w_q).

    Used by the GPTQ column loop; sg_idx / g_idx select the (super)group.
    """
    spec = KQUANT_SPECS[qtype]
    s = params.super_scale[:, sg_idx].astype(jnp.float32) * params.scale_q[:, g_idx].astype(jnp.float32)
    z = params.super_zero[:, sg_idx].astype(jnp.float32) * params.zero_q[:, g_idx].astype(jnp.float32)
    q = jnp.clip(jnp.round((w_col + z) / jnp.maximum(s, eps)), spec.qmin, spec.qmax)
    return q, s * q - z


def quantize_rtn(
    x: jax.Array,
    qtype: GGMLQuantizationType,
    cfg: ScaleSearchConfig = ScaleSearchConfig(),
    imatrix: Optional[jax.Array] = None,
) -> Tuple[jax.Array, SuperGroupParams]:
    """Round-to-nearest K-quant of a full matrix (no Hessian solve).

    Equivalent of the reference's ``_quant_non_block_module``
    (quantizer.py:278-330) and — with ``imatrix`` — of the llama-quantize
    path the reference shells out to (quant/gguf/run_quant.sh:130-133).
    """
    params = fit_supergroups(x, qtype, cfg, imatrix)
    q = quantize(x, params, qtype)
    return q, params


def dequantize_rtn(x, qtype, cfg=ScaleSearchConfig()):
    q, params = quantize_rtn(x, qtype, cfg)
    return dequantize(q, params, qtype)
