"""FastOBQ / FastOBC / OWL primitives: the EvoPress database generators
beyond K-quants.

TPU re-expressions of:
* evopress/src/fast_obq.py:20-231 — GPTQ with a flat (sym/asym, per-channel
  or per-group) quantizer producing a *ladder* of integer bitwidths from a
  single Hessian factorization;
* evopress/src/quant_utils.py:32-136 — the simple Quantizer (find_params);
* evopress/src/fast_obc.py:17-185 — OBC sparsification: per-block scores
  ``w^2 / diag(U)^2``, kth-value threshold, error propagation, multiple
  sparsity levels from one factorization;
* evopress/src/owl_pruner.py:63-79,205-221 — outlier-weighed layerwise
  sparsity metric and distribution.

All solvers are blocked lax.scan programs sharing the structure of
ops/gptq.py; everything is row-parallel on the VPU/MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gptq import prepare_hessian_inverse


class FlatQuantParams(NamedTuple):
    scale: jax.Array  # (d_row, n_groups)
    zero: jax.Array  # (d_row, n_groups)


def simple_find_params(x: jax.Array, bits: int, sym: bool) -> FlatQuantParams:
    """Flat min/max quantizer fit over the last axis
    (reference quant_utils.py:57-115, weight=True, perchannel)."""
    maxq = 2**bits - 1
    xmin = x.min(axis=-1)
    xmax = x.max(axis=-1)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = xmin == xmax
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return FlatQuantParams(scale, zero)


def _flat_quantize(col, scale, zero, maxq, eps=1e-9):
    q = jnp.clip(jnp.round(col / jnp.maximum(scale, eps) + zero), 0, maxq)
    return q, scale * (q - zero)


@functools.partial(
    jax.jit, static_argnames=("bits", "sym", "group_size", "block_size")
)
def _fast_obq_single(
    W: jax.Array,
    U: jax.Array,
    bits: int,
    sym: bool,
    group_size: int,
    block_size: int,
):
    """One bitwidth of the FastOBQ ladder (reference fast_obq.py:146-199)."""
    d_row, d_col = W.shape
    gs = group_size or d_col
    ng = d_col // gs
    bs = min(block_size or d_col, gs)
    maxq = 2**bits - 1
    n_blocks = d_col // bs
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0).squeeze(-1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (d_col, 1), 0).squeeze(-1)

    if ng == 1:
        p0 = simple_find_params(W, bits, sym)
        scale0 = p0.scale[:, None]
        zero0 = p0.zero[:, None]
    else:
        scale0 = jnp.zeros((d_row, ng), jnp.float32)
        zero0 = jnp.zeros((d_row, ng), jnp.float32)

    def block_body(carry, b):
        w, scale, zero = carry
        c1 = b * bs

        if ng > 1:
            def refit(args):
                c1, w, scale, zero = args
                g = c1 // gs
                x = jax.lax.dynamic_slice(w, (0, c1), (d_row, gs))
                p = simple_find_params(x, bits, sym)
                return (
                    jax.lax.dynamic_update_slice(scale, p.scale[:, None], (0, g)),
                    jax.lax.dynamic_update_slice(zero, p.zero[:, None], (0, g)),
                )

            scale, zero = jax.lax.cond(
                c1 % gs == 0, refit, lambda a: (a[2], a[3]), (c1, w, scale, zero)
            )

        w_blk = jax.lax.dynamic_slice(w, (0, c1), (d_row, bs))
        u_blk = jax.lax.dynamic_slice(U, (c1, c1), (bs, bs))

        def col_body(wb, i):
            col = jax.lax.dynamic_slice(wb, (0, i), (d_row, 1))[:, 0]
            d = u_blk[i, i]
            g = (c1 + i) // gs
            s = scale[:, g]
            z = zero[:, g]
            q, wq = _flat_quantize(col, s, z, maxq)
            err = (col - wq) / d
            u_row = u_blk[i, :] * (blk_ids >= i)
            wb = wb - err[:, None] * u_row[None, :]
            return wb, (q, err)

        w_blk, (q_cols, err_cols) = jax.lax.scan(
            col_body, w_blk, jnp.arange(bs, dtype=jnp.int32)
        )
        w = jax.lax.dynamic_update_slice(w, w_blk, (0, c1))
        u_rows = jax.lax.dynamic_slice(U, (c1, 0), (bs, d_col))
        u_rows = u_rows * (col_ids >= c1 + bs)[None, :]
        w = w - jnp.dot(err_cols.T, u_rows, preferred_element_type=jnp.float32)
        return (w, scale, zero), q_cols

    (w_final, scale, zero), qblks = jax.lax.scan(
        block_body, (W, scale0, zero0), jnp.arange(n_blocks, dtype=jnp.int32)
    )
    qweight = jnp.swapaxes(qblks, 0, 1).reshape(d_row, d_col)
    # dequantized weight = final state of w on the quantized columns
    w_hat = w_final
    return qweight.astype(jnp.uint8), FlatQuantParams(scale, zero), w_hat


def fast_obq_quantize(
    W: jax.Array,
    H: jax.Array,
    bitwidths: Sequence[int],
    *,
    sym: bool = False,
    group_size: Optional[int] = None,
    block_size: int = 128,
    rel_damp: float = 1e-2,
) -> Dict[int, Tuple[jax.Array, FlatQuantParams, jax.Array]]:
    """Multi-bitwidth GPTQ from one Hessian (fast_obq.py:108-199).

    Returns {bits: (qweight u8, params, dequantized weight)}.
    """
    W32, U, _ = prepare_hessian_inverse(H, W, rel_damp)
    gs = group_size or W.shape[1]
    out = {}
    for bits in bitwidths:
        out[bits] = _fast_obq_single(W32, U, int(bits), sym, gs, block_size)
    return out


# ---------------------------------------------------------------------------
# FastOBC sparsification
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_size",))
def _fast_obc_single(W: jax.Array, U: jax.Array, sparsity: jax.Array, block_size: int):
    """One sparsity level (reference fast_obc.py:119-155)."""
    d_row, d_col = W.shape
    bs = block_size or d_col
    n_blocks = d_col // bs
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0).squeeze(-1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (d_col, 1), 0).squeeze(-1)
    numel_blk = d_row * bs

    def block_body(w, b):
        c1 = b * bs
        w_blk = jax.lax.dynamic_slice(w, (0, c1), (d_row, bs))
        u_blk = jax.lax.dynamic_slice(U, (c1, c1), (bs, bs))
        diag = jnp.diagonal(u_blk)
        scores = w_blk**2 / (diag[None, :] ** 2)
        k = jnp.clip(jnp.round(numel_blk * sparsity).astype(jnp.int32), 1, numel_blk)
        flat = jnp.sort(scores.reshape(-1))
        thr = flat[k - 1]
        mask = scores > thr

        def col_body(carry, i):
            wb = carry
            col = jax.lax.dynamic_slice(wb, (0, i), (d_row, 1))[:, 0]
            d = u_blk[i, i]
            keep = mask[:, i]
            q = jnp.where(keep, col, 0.0)
            err = (col - q) / d
            u_row = u_blk[i, :] * (blk_ids >= i)
            wb = wb - err[:, None] * u_row[None, :]
            return wb, (q, err)

        w_blk2, (q_cols, err_cols) = jax.lax.scan(
            col_body, w_blk, jnp.arange(bs, dtype=jnp.int32)
        )
        # pruned values (NOT the error-updated block) are written back
        # (fast_obc.py:152: w[:, c1:c2] = res)
        w = jax.lax.dynamic_update_slice(w, q_cols.T, (0, c1))
        u_rows = jax.lax.dynamic_slice(U, (c1, 0), (bs, d_col))
        u_rows = u_rows * (col_ids >= c1 + bs)[None, :]
        w = w - jnp.dot(err_cols.T, u_rows, preferred_element_type=jnp.float32)
        return w, None

    w_final, _ = jax.lax.scan(block_body, W, jnp.arange(n_blocks, dtype=jnp.int32))
    return w_final


def fast_obc_prune(
    W: jax.Array,
    H: jax.Array,
    sparsities: Sequence[float],
    *,
    block_size: int = 128,
    rel_damp: float = 1e-2,
) -> List[jax.Array]:
    """Multi-sparsity OBC pruning from one Hessian (fast_obc.py:108-172)."""
    W32, U, _ = prepare_hessian_inverse(H, W, rel_damp)
    return [
        _fast_obc_single(W32, U, jnp.float32(s), block_size) for s in sparsities
    ]


# ---------------------------------------------------------------------------
# OWL (outlier-weighed layerwise sparsity)
# ---------------------------------------------------------------------------


def owl_metric(W: jax.Array, H_diag: jax.Array) -> jax.Array:
    """|W| * sqrt(diag H) (owl_pruner.py:63-68)."""
    return jnp.abs(W) * jnp.sqrt(H_diag)[None, :]


def owl_outlier_ratio(metric: jax.Array, m: float) -> float:
    """Fraction of entries above m * mean (owl_pruner.py:77-79)."""
    return float((metric > m * metric.mean()).mean())


def owl_sparsity_distribution(
    outlier_ratios: Sequence[float], sparsity: float, owl_lambda: float
) -> np.ndarray:
    """Lambda-scaled nonuniform sparsity across layers (owl_pruner.py:205-221)."""
    lor = np.asarray(outlier_ratios, dtype=np.float64)
    rng = lor.max() - lor.min()
    if rng == 0:
        return np.full_like(lor, sparsity)
    lor = 2 * owl_lambda * (lor - lor.min()) / rng
    return sparsity - lor + lor.mean()


# ---------------------------------------------------------------------------
# Error estimation
# ---------------------------------------------------------------------------


@jax.jit
def relative_layer_error(W: jax.Array, W_hat: jax.Array, H: jax.Array) -> jax.Array:
    """Normalized proxy loss (dW H dW^T) / (W H W^T)
    (error_estimator.py:95-103)."""
    dW = (W - W_hat).astype(jnp.float32)
    num = jnp.sum(dW * (dW @ H))
    den = jnp.sum(W * (W @ H))
    return num / jnp.maximum(den, 1e-30)
