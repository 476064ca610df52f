"""Fused K-quant dequant + matmul for serving.

This is the TPU replacement for llama.cpp's quantized GEMV/GEMM kernels
(the reference's deployment target, SURVEY.md §2.2): weights stay in HBM in
a compact integer runtime format and are dequantized *inside* the Pallas
kernel, in VMEM, right before hitting the MXU — so decode throughput is
bound by ~5 bits/weight of HBM traffic instead of 16 (bf16).

Runtime weight format (``RuntimeQuantLinear``): every K-quant type maps
exactly onto one affine form

    w[r, c] = scale[r, g] * codes[r, c] - offset[r, g],   g = c // group_size

Layout choices are driven by Mosaic's vector-layout rules: everything is
stored **transposed** (input-dim major) so that quant groups run along
*sublanes* and all in-kernel unpack/expand steps are leading-dim reshapes
and broadcasts (lane-dim reshapes don't lower):

* ``qs``: (d_in / per_byte, d_out) uint8. For <=4-bit types two codes share
  a byte along the input dim — byte k of a 256-row supergroup holds rows k
  (low nibble) and k+128 (high nibble); unpacking is a sublane-axis concat.
  Q5/Q6_K use one byte per code. (This runtime layout is unrelated to the
  GGML disk layout, which formats/ggml.py implements bit-exactly.)
* ``scale_t``/``offset_t``: (n_groups, d_out) f32,
  scale = f32(super_scale_f16) * scale_q — exact in f32 (17-bit product);
  offset folds the signed code shift of Q3_K/Q6_K:
  offset = f32(super_zero_f16) * zero_q + scale * shift.

Per-group f32 scale/offset costs ~2 extra bits/weight vs GGML's 6-bit
double quantization; a 6-bit-scale variant is planned follow-up work.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.ggml import KQUANT_SPECS, QK_K, GGMLQuantizationType
from .kquant import SuperGroupParams

_HALF = QK_K // 2  # 128


@jax.tree_util.register_pytree_node_class
class RuntimeQuantLinear:
    """Packed quantized weight for the serving path (input-dim-major)."""

    def __init__(self, qs, scale_t, offset_t, d_in: int, group_size: int, per_byte: int):
        self.qs = qs  # (d_in // per_byte, d_out) uint8
        self.scale_t = scale_t  # (n_groups, d_out) f32
        self.offset_t = offset_t  # (n_groups, d_out) f32
        self.d_in = int(d_in)
        self.group_size = int(group_size)
        self.per_byte = int(per_byte)

    @property
    def d_out(self) -> int:
        return self.qs.shape[1]

    @property
    def packed_bits_per_weight(self) -> float:
        return (self.qs.shape[0] + 8 * self.scale_t.shape[0]) * 8 / self.d_in

    def tree_flatten(self):
        return (self.qs, self.scale_t, self.offset_t), (
            self.d_in,
            self.group_size,
            self.per_byte,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def pack_runtime(
    qweight: np.ndarray,
    params: SuperGroupParams,
    qtype: GGMLQuantizationType,
) -> RuntimeQuantLinear:
    """Build the runtime format from a layer artifact (host-side numpy)."""
    spec = KQUANT_SPECS[qtype]
    d_out, d_in = qweight.shape
    gs = spec.group_size
    shift = -spec.qmin  # 0 for unsigned types, 4 / 32 for Q3_K / Q6_K

    ss = np.asarray(params.super_scale, np.float16).astype(np.float32)
    sz = np.asarray(params.super_zero, np.float16).astype(np.float32)
    sq = np.asarray(params.scale_q).astype(np.float32)
    zq = np.asarray(params.zero_q).astype(np.float32)
    gpsg = spec.num_groups
    scale = np.repeat(ss, gpsg, axis=1) * sq  # (d_out, ng), exact in f32
    off = np.repeat(sz, gpsg, axis=1) * zq + scale * shift

    codes = np.asarray(qweight).astype(np.int16) + shift  # unsigned
    assert codes.min() >= 0
    codes_t = np.ascontiguousarray(codes.T).astype(np.uint8)  # (d_in, d_out)
    if spec.bits <= 4:
        per_byte = 2
        c = codes_t.reshape(d_in // QK_K, QK_K, d_out)
        qs = (c[:, :_HALF, :] | (c[:, _HALF:, :] << 4)).reshape(d_in // 2, d_out)
    else:
        per_byte = 1
        qs = codes_t
    return RuntimeQuantLinear(
        jnp.asarray(qs),
        jnp.asarray(np.ascontiguousarray(scale.T)),
        jnp.asarray(np.ascontiguousarray(off.T)),
        d_in,
        gs,
        per_byte,
    )


def _unpack_codes_jnp(qs: jax.Array, per_byte: int, d_in: int) -> jax.Array:
    """(d_in/per_byte, d_out) u8 -> (d_in, d_out) codes."""
    if per_byte == 1:
        return qs
    d_out = qs.shape[1]
    b = qs.reshape(d_in // QK_K, _HALF, d_out)
    return jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(d_in, d_out)


def dequantize_runtime(rql: RuntimeQuantLinear) -> jax.Array:
    """Reference dequantization (XLA): returns (d_out, d_in) f32."""
    q = _unpack_codes_jnp(rql.qs, rql.per_byte, rql.d_in).astype(jnp.float32)
    ng = rql.scale_t.shape[0]
    q = q.reshape(ng, rql.group_size, rql.d_out)
    w_t = q * rql.scale_t[:, None, :] - rql.offset_t[:, None, :]
    return w_t.reshape(rql.d_in, rql.d_out).T


@jax.jit
def dequant_matmul_xla(x: jax.Array, rql: RuntimeQuantLinear):
    """y = x @ dequant(W)^T via plain XLA (correctness reference / CPU path)."""
    w = dequantize_runtime(rql)
    return jnp.dot(x.astype(jnp.float32), w.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(x_ref, qs_ref, scale_ref, off_ref, out_ref, *, gs, per_byte, tile_in):
    """One (out-tile, in-chunk) step: dequantize W^T chunk in VMEM, then
    accumulate x_chunk @ w_chunk into the output tile."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    # Mosaic supports neither unsigned->float casts nor sub-32-bit vector
    # shifts, so widen to int32 before the bit ops. All reshapes split
    # leading (sublane/major) dims only.
    qs = qs_ref[:].astype(jnp.int32)  # (tile_in/per_byte, T)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    qf = q.astype(jnp.float32).reshape(ng, gs, T)
    w = qf * scale_ref[:].reshape(ng, 1, T) - off_ref[:].reshape(ng, 1, T)
    w = w.reshape(tile_in, T)

    acc = jnp.dot(
        x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("tile_out", "tile_in", "interpret"))
def dequant_matmul_pallas(
    x: jax.Array,
    rql: RuntimeQuantLinear,
    *,
    tile_out: int = 512,
    tile_in: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused y = x @ dequant(W)^T.

    x: (B, d_in). Requires 256-aligned shapes; use :func:`dequant_matmul`
    for automatic fallback.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, d_in = x.shape
    d_out = rql.d_out
    gs = rql.group_size
    per_byte = rql.per_byte
    tile_in = min(tile_in, d_in)
    tile_out = min(tile_out, d_out)
    assert d_in % tile_in == 0 and d_out % tile_out == 0
    assert tile_in % QK_K == 0
    n_i = d_out // tile_out
    n_j = d_in // tile_in
    ng_tile = tile_in // gs

    kernel = functools.partial(_kernel, gs=gs, per_byte=per_byte, tile_in=tile_in)
    grid_spec = pl.GridSpec(
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((B, tile_in), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_in // per_byte, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((ng_tile, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_tile, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_out), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d_in * d_out,
            bytes_accessed=d_out * d_in // per_byte
            + 8 * d_out * (d_in // gs)
            + 4 * B * (d_in + d_out),
            transcendentals=0,
        ),
    )(x, rql.qs, rql.scale_t, rql.offset_t)


@functools.lru_cache(maxsize=None)
def _best_tile(dim: int, cap: int, quantum: int) -> Optional[int]:
    """Largest divisor of ``dim`` that is a multiple of ``quantum`` and <= cap."""
    start = (min(cap, dim) // quantum) * quantum
    for t in range(start, quantum - 1, -quantum):
        if dim % t == 0:
            return t
    return None


def select_tiles(d_in: int, d_out: int) -> Optional[Tuple[int, int]]:
    """Pick (tile_in, tile_out) for the Pallas kernel, or None if the shape
    cannot be tiled (tile_in must be a QK_K multiple, tile_out a lane-width
    multiple). Handles non-power-of-two shapes like 3584/11008."""
    tile_in = _best_tile(d_in, 1024, QK_K)
    tile_out = _best_tile(d_out, 512, 256)
    if tile_in is None or tile_out is None:
        return None
    return tile_in, tile_out


def dequant_matmul(x: jax.Array, rql: RuntimeQuantLinear, force_xla: bool = False) -> jax.Array:
    """Dispatch: Pallas on TPU when shapes tile cleanly, XLA otherwise."""
    on_tpu = jax.devices()[0].platform == "tpu"
    tiles = select_tiles(rql.d_in, rql.d_out)
    if force_xla or not on_tpu or tiles is None:
        return dequant_matmul_xla(x, rql)
    return dequant_matmul_pallas(x, rql, tile_in=tiles[0], tile_out=tiles[1])
