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
import os
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
    def d_in_local(self) -> int:
        """Input dim of the *materialized* planes — differs from the static
        d_in inside shard_map, where planes are per-device shards."""
        return self.qs.shape[0] * self.per_byte

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
    d_in = rql.d_in_local
    q = _unpack_codes_jnp(rql.qs, rql.per_byte, d_in).astype(jnp.float32)
    ng = rql.scale_t.shape[0]
    q = q.reshape(ng, rql.group_size, rql.d_out)
    w_t = q * rql.scale_t[:, None, :] - rql.offset_t[:, None, :]
    return w_t.reshape(d_in, rql.d_out).T


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


# ---------------------------------------------------------------------------
# V2 runtime format: compact two-level scales (round 2, VERDICT #1)
#
# V1 carries one f32 (scale, offset) pair per group of 32 = 2.0 extra
# bits/weight at Q4_K. V2 keeps GGML's two-level structure in HBM instead:
# per-supergroup f32 super-scale/min (0.125 b/w each) + per-group uint8
# quantized scale/min codes (0.25 b/w each at gs=32) — 4.75 b/w total for
# Q4_K vs 6.0 in V1, and the fixup math inside the kernel reproduces the
# canonical dequantization bit-for-bit (same f32 op order as ops.kquant).
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class RuntimeQuantLinearV2:
    """Packed quantized weight, compact-scale layout (input-dim-major)."""

    def __init__(self, qs, d_sg, dmin_sg, sc_q, mn_q, d_in: int, group_size: int,
                 per_byte: int, shift: int, d_rep: int = 1):
        self.qs = qs            # (d_in // per_byte, d_out) uint8
        self.d_sg = d_sg        # (d_rep * n_sg, d_out) f32 super-scale
        self.dmin_sg = dmin_sg  # (d_rep * n_sg, d_out) f32 super-min (None if signed)
        self.sc_q = sc_q        # (n_groups, d_out) uint8 quantized scales
        self.mn_q = mn_q        # (n_groups, d_out) uint8 mins (None if signed)
        self.d_in = int(d_in)
        self.group_size = int(group_size)
        self.per_byte = int(per_byte)
        self.shift = int(shift)
        # super-scale rows are replicated d_rep x so kernel tiles keep >= 8
        # sublanes (Mosaic tiling rule) at tile_in = 1024
        self.d_rep = int(d_rep)

    @property
    def d_out(self) -> int:
        return self.qs.shape[1]

    @property
    def d_in_local(self) -> int:
        return self.qs.shape[0] * self.per_byte

    @property
    def has_min(self) -> bool:
        return self.dmin_sg is not None

    @property
    def packed_bits_per_weight(self) -> float:
        n = self.qs.shape[0] + 4 * self.d_sg.shape[0] + self.sc_q.shape[0]
        if self.has_min:
            n += 4 * self.dmin_sg.shape[0] + self.mn_q.shape[0]
        return n * 8 / self.d_in

    def tree_flatten(self):
        return (self.qs, self.d_sg, self.dmin_sg, self.sc_q, self.mn_q), (
            self.d_in, self.group_size, self.per_byte, self.shift, self.d_rep,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def pack_runtime_v2(
    qweight: np.ndarray,
    params: SuperGroupParams,
    qtype: GGMLQuantizationType,
) -> RuntimeQuantLinearV2:
    """Build the compact-scale runtime format from a layer artifact."""
    spec = KQUANT_SPECS[qtype]
    d_out, d_in = qweight.shape
    gs = spec.group_size
    shift = -spec.qmin

    ss = np.asarray(params.super_scale, np.float16).astype(np.float32)  # (d_out, n_sg)
    sq = np.asarray(params.scale_q)
    codes = np.asarray(qweight).astype(np.int16) + shift
    assert codes.min() >= 0
    codes_t = np.ascontiguousarray(codes.T).astype(np.uint8)
    if spec.bits <= 4:
        per_byte = 2
        c = codes_t.reshape(d_in // QK_K, QK_K, d_out)
        qs = (c[:, :_HALF, :] | (c[:, _HALF:, :] << 4)).reshape(d_in // 2, d_out)
    else:
        per_byte = 1
        qs = codes_t

    d_rep = 2
    d_sg = jnp.asarray(np.repeat(np.ascontiguousarray(ss.T), d_rep, axis=0))
    sc_dtype = np.int8 if spec.signed else np.uint8
    sc_q = jnp.asarray(np.ascontiguousarray(sq.astype(sc_dtype).T))
    if spec.signed:
        dmin_sg = mn_q = None
    else:
        sz = np.asarray(params.super_zero, np.float16).astype(np.float32)
        zq = np.asarray(params.zero_q)
        dmin_sg = jnp.asarray(np.repeat(np.ascontiguousarray(sz.T), d_rep, axis=0))
        mn_q = jnp.asarray(np.ascontiguousarray(zq.astype(np.uint8).T))
    return RuntimeQuantLinearV2(
        jnp.asarray(qs), d_sg, dmin_sg, sc_q, mn_q, d_in, gs, per_byte, shift,
        d_rep,
    )


def _group_scales_v2(rql: RuntimeQuantLinearV2):
    """(scale, off) per (n_groups, d_out) in the canonical f32 op order."""
    gpsg = QK_K // rql.group_size
    d = jnp.repeat(rql.d_sg[:: rql.d_rep], gpsg, axis=0)
    scale = d * rql.sc_q.astype(jnp.float32)  # exact: 17-bit product
    if rql.has_min:
        off = jnp.repeat(rql.dmin_sg[:: rql.d_rep], gpsg, axis=0) * rql.mn_q.astype(jnp.float32)
    else:
        off = jnp.zeros_like(scale)
    return scale, off


def dequantize_runtime_v2(rql: RuntimeQuantLinearV2) -> jax.Array:
    """Bit-exact reference dequantization (XLA): (d_out, d_in) f32."""
    return _wt_v2_fields(
        rql.qs, rql.d_sg, rql.dmin_sg, rql.sc_q, rql.mn_q,
        gs=rql.group_size, per_byte=rql.per_byte, shift=rql.shift,
        d_rep=rql.d_rep,
    ).T


@jax.jit
def dequant_matmul_xla_v2(x: jax.Array, rql: RuntimeQuantLinearV2):
    w = dequantize_runtime_v2(rql)
    return jnp.dot(x.astype(jnp.float32), w.T, preferred_element_type=jnp.float32)


def _kernel_v2(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype, d_rep):
    """Dequantize a W^T chunk in VMEM from compact two-level scales.

    The super-scale planes are stored with rows replicated d_rep x so every
    operand tiles regularly per input chunk (Mosaic needs block sublane
    counts divisible by 8); de-replication is a static leading-dim slice.
    """
    import jax.experimental.pallas as pl

    if has_min:
        x_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, out_ref = refs
    else:
        x_ref, qs_ref, d_ref, sc_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    # Mosaic has no u8->f32 cast: widen through int32 first
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    qf = (q - shift).astype(jnp.float32).reshape(ng, gs, T)
    w = scale.reshape(ng, 1, T) * qf
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        w = w - off.reshape(ng, 1, T)
    w = w.reshape(tile_in, T).astype(mxu_dtype)

    acc = jnp.dot(
        x_ref[:].astype(mxu_dtype), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v3(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype, d_rep):
    """Offset-folded variant of _kernel_v2: the per-weight VPU chain is cut
    to unpack + one scale multiply in mxu_dtype, and the whole affine offset
    (group min + signed-code shift) moves to a second small MXU dot against
    per-group activation sums:

        y = x @ (scale * q)  -  xsum @ (off + scale*shift)

    with q the *raw unsigned* stored codes. Exact for the offset term
    (linearity); the weight product rounds scale and q to mxu_dtype before
    multiplying (one extra bf16 rounding vs _kernel_v2's f32 build)."""
    import jax.experimental.pallas as pl

    if has_min:
        x_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, out_ref = refs
    else:
        x_ref, qs_ref, d_ref, sc_ref, out_ref = refs
    j = pl.program_id(1)

    T = qs_ref.shape[1]
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    # group-level planes (ng, T): 1/gs of the tile — cheap VPU work
    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off

    qs = qs_ref[:].astype(jnp.int32)
    if per_byte == 2:
        b = qs.reshape(sg_t, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    w = (
        q.astype(mxu_dtype).reshape(ng, gs, T)
        * scale.astype(mxu_dtype).reshape(ng, 1, T)
    ).reshape(tile_in, T)

    x = x_ref[:]
    acc = jnp.dot(x.astype(mxu_dtype), w, preferred_element_type=jnp.float32)
    if off2 is not None:
        # per-group x sums via a 0/1 aggregation dot — Mosaic can't split the
        # lane dim with a reshape, and the (tile_in, ng) matmul is tiny
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_in, ng), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_in, ng), 1)
        gmat = (rows // gs == cols).astype(jnp.float32)
        xsum = jnp.dot(x.astype(jnp.float32), gmat,
                       preferred_element_type=jnp.float32)
        acc = acc - jnp.dot(xsum, off2, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2f(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """_kernel_v2 with the signed-code shift folded into the group offset
    plane: w = scale*q - (scale*shift + dmin*mn), computed per GROUP (ng, T)
    instead of per weight — saves the per-weight `q - shift` subtract while
    keeping everything else f32 and avoiding v3's correction-dot machinery
    (whose tiny gmat/xsum MXU dots measured slower than the op they saved,
    docs/KERNELS_r04.md)."""
    import jax.experimental.pallas as pl

    if has_min:
        x_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, out_ref = refs
    else:
        x_ref, qs_ref, d_ref, sc_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off
    qf = q.astype(jnp.float32).reshape(ng, gs, T)
    w = scale.reshape(ng, 1, T) * qf
    if off2 is not None:
        w = w - off2.reshape(ng, 1, T)
    w = w.reshape(tile_in, T).astype(mxu_dtype)

    acc = jnp.dot(
        x_ref[:].astype(mxu_dtype), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2h(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """_kernel_v2f with the per-weight affine done in mxu_dtype (bf16):
    w = bf16(scale)*bf16(q) - bf16(off2). Cuts the chain to cast + mul +
    sub in 16-bit — one extra bf16 rounding on the weight product vs the
    f32 build (same rounding budget as v3's product; llama.cpp's own
    vec_dot runs lower precision still)."""
    import jax.experimental.pallas as pl

    if has_min:
        x_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, out_ref = refs
    else:
        x_ref, qs_ref, d_ref, sc_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off
    qh = q.astype(mxu_dtype).reshape(ng, gs, T)
    w = scale.astype(mxu_dtype).reshape(ng, 1, T) * qh
    if off2 is not None:
        w = w - off2.astype(mxu_dtype).reshape(ng, 1, T)
    w = w.reshape(tile_in, T)

    acc = jnp.dot(
        x_ref[:].astype(mxu_dtype), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2g(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """_kernel_v2f minus the per-weight offset subtract: the whole affine
    offset is applied as ONE small MXU dot against per-group activation
    sums PRECOMPUTED outside the kernel (extra (B, ng) operand) — v3 lost
    the round-4 race building that operand in-kernel via a gmat dot; this
    variant only pays the (B,ng)x(ng,T) correction dot. Per-weight chain:
    widen, nibble, i2f, scale-mul, bf16 cast."""
    import jax.experimental.pallas as pl

    if has_min:
        x_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, xs_ref, out_ref = refs
    else:
        x_ref, qs_ref, d_ref, sc_ref, xs_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off
    w = (scale.reshape(ng, 1, T) * q.astype(jnp.float32).reshape(ng, gs, T)
         ).reshape(tile_in, T).astype(mxu_dtype)

    acc = jnp.dot(
        x_ref[:].astype(mxu_dtype), w, preferred_element_type=jnp.float32
    )
    if off2 is not None:
        acc = acc - jnp.dot(xs_ref[:].T, off2,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2s(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """_kernel_v2g with the nibble planes kept SPLIT: instead of
    concatenating lo/hi nibbles back into (tile_in, T) (a sublane-relayout
    Mosaic pays for on every byte), the dot is computed as two half-depth
    matmuls against pre-split activations —

        acc = x_lo @ (s_lo * lo) + x_hi @ (s_hi * hi) - xsum @ off2

    where x_lo/x_hi hold each 256-superblock's first/second 128 features
    (sliced in XLA, cheap on the x side). v4f tried the split but paid f32
    scale bytes + an in-kernel offset dot; this keeps v2's compact scales
    and v2g's precomputed xsum. per_byte==2 formats only (the dispatcher
    falls back to v2g for byte-wide codes)."""
    import jax.experimental.pallas as pl

    if has_min:
        (xl_ref, xh_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, xs_ref,
         out_ref) = refs
    else:
        xl_ref, xh_ref, qs_ref, d_ref, sc_ref, xs_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)       # (tile_in/2, T)
    T = qs.shape[1]
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs
    half_g = ng // 2

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off

    # groups 0..gpsg/2 of each superblock cover its first 128 features
    sc3 = scale.reshape(sg_t, gpsg, T)
    s_lo = sc3[:, : gpsg // 2].reshape(half_g, 1, T)
    s_hi = sc3[:, gpsg // 2:].reshape(half_g, 1, T)

    def plane(bits, s):
        qf = bits.astype(jnp.float32).reshape(half_g, gs, T)
        return (s * qf).reshape(tile_in // 2, T).astype(mxu_dtype)

    w_lo = plane(qs & 0x0F, s_lo)
    w_hi = plane(qs >> 4, s_hi)

    acc = jnp.dot(xl_ref[:].astype(mxu_dtype), w_lo,
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xh_ref[:].astype(mxu_dtype), w_hi,
                        preferred_element_type=jnp.float32)
    if off2 is not None:
        acc = acc - jnp.dot(xs_ref[:].T, off2,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2m(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """Group-dot variant: codes are cast straight to mxu_dtype with NO
    per-weight scale multiply — the contraction is decomposed into ng
    per-group k=gs MXU dots whose (B, T) partial sums are scale-FMA'd on
    the VPU (B*ng*T ops, gs-fold fewer than per-weight muls). The affine
    offset rides v2g's precomputed-xsum correction dot. Per-weight VPU
    chain: widen, nibble, int->mxu_dtype cast (exact: |code| < 64 fits
    bf16's mantissa). Activations arrive pre-gathered as (ng*B, gs) so the
    per-group operand slice is a cheap sublane slice, not a 32-lane slice."""
    import jax.experimental.pallas as pl

    if has_min:
        xg_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, xs_ref, out_ref = refs
    else:
        xg_ref, qs_ref, d_ref, sc_ref, xs_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off

    qb = q.astype(mxu_dtype).reshape(ng, gs, T)
    B = xg_ref.shape[0] // ng
    xg = xg_ref[:].astype(mxu_dtype).reshape(ng, B, gs)
    acc = None
    for g in range(ng):
        part = jnp.dot(xg[g], qb[g], preferred_element_type=jnp.float32)
        contrib = part * scale[g].reshape(1, T)
        acc = contrib if acc is None else acc + contrib
    if off2 is not None:
        acc = acc - jnp.dot(xs_ref[:].T, off2,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2t(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """_kernel_v2m with the ng per-group dots expressed as ONE batched
    dot_general (batch dim = group) followed by a scale-weighted reduction
    over groups. Same per-weight chain as v2m; tests whether Mosaic
    schedules a batched MXU dot better than an unrolled loop."""
    import jax.experimental.pallas as pl

    if has_min:
        xg_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, xs_ref, out_ref = refs
    else:
        xg_ref, qs_ref, d_ref, sc_ref, xs_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off

    qb = q.astype(mxu_dtype).reshape(ng, gs, T)
    B = xg_ref.shape[0] // ng
    xg = xg_ref[:].astype(mxu_dtype).reshape(ng, B, gs)
    parts = jax.lax.dot_general(
        xg, qb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (ng, B, T)
    acc = jnp.sum(parts * scale.reshape(ng, 1, T), axis=0)
    if off2 is not None:
        acc = acc - jnp.dot(xs_ref[:].T, off2,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v2p(refs, *, gs, per_byte, tile_in, shift, has_min, mxu_dtype,
                d_rep):
    """gs=16 sibling of _kernel_v2m (pair-group dot). Naive v2m at gs=16
    needs tile_in/16 unrolled k=16 dots — giant unrolls that compile for
    minutes (docs/KERNELS_r04.md session 3). Instead each PAIR of adjacent
    groups becomes ONE k=32 MXU dot over a lane-doubled code plane: the
    even group's codes sit in output columns 0..T-1 (upper 16 rows zeroed),
    the odd group's in columns T..2T-1 (lower 16 rows zeroed), so
    part[:, :T] / part[:, T:] are the two per-group partial sums. Dot count
    equals v2m at gs=32; the zero half-planes waste MXU flops the
    memory-bound kernel has to spare. Scales apply to partial sums on the
    VPU exactly as v2m; offsets ride the precomputed-xsum correction dot.
    Activations arrive pre-gathered at PAIR granularity: (npair*B, 32)."""
    import jax.experimental.pallas as pl

    if has_min:
        xg_ref, qs_ref, d_ref, sc_ref, dmin_ref, mn_ref, xs_ref, out_ref = refs
    else:
        xg_ref, qs_ref, d_ref, sc_ref, xs_ref, out_ref = refs
    j = pl.program_id(1)

    qs = qs_ref[:].astype(jnp.int32)
    T = qs.shape[1]
    if per_byte == 2:
        b = qs.reshape(tile_in // QK_K, _HALF, T)
        q = jnp.concatenate([b & 0x0F, b >> 4], axis=1).reshape(tile_in, T)
    else:
        q = qs
    ng = tile_in // gs  # gs == 16
    npair = tile_in // 32
    sg_t = tile_in // QK_K
    gpsg = QK_K // gs

    d = d_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale = jnp.broadcast_to(d, (sg_t, gpsg, T)).reshape(ng, T) * sc
    off2 = scale * float(shift) if shift else None
    if has_min:
        dmin = dmin_ref[:].reshape(sg_t, d_rep, T)[:, 0].reshape(sg_t, 1, T)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        off = jnp.broadcast_to(dmin, (sg_t, gpsg, T)).reshape(ng, T) * mn
        off2 = off if off2 is None else off2 + off

    q4 = q.astype(mxu_dtype).reshape(npair, 2, gs, T)
    zeros = jnp.zeros((npair, gs, T), mxu_dtype)
    qe = jnp.concatenate([q4[:, 0], zeros], axis=1)  # (npair, 32, T)
    qo = jnp.concatenate([zeros, q4[:, 1]], axis=1)
    qpair = jnp.concatenate([qe, qo], axis=2)  # (npair, 32, 2T)
    s2 = scale.reshape(npair, 2, T)
    B = xg_ref.shape[0] // npair
    xg = xg_ref[:].astype(mxu_dtype).reshape(npair, B, 32)
    acc = None
    for p in range(npair):
        part = jnp.dot(xg[p], qpair[p], preferred_element_type=jnp.float32)
        contrib = (part[:, :T] * s2[p, 0].reshape(1, T)
                   + part[:, T:] * s2[p, 1].reshape(1, T))
        acc = contrib if acc is None else acc + contrib
    if off2 is not None:
        acc = acc - jnp.dot(xs_ref[:].T, off2,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


_V2_KERNELS = {"v2": _kernel_v2, "v3": _kernel_v3, "v2f": _kernel_v2f,
               "v2h": _kernel_v2h, "v2g": _kernel_v2g, "v2s": _kernel_v2s,
               "v2m": _kernel_v2m, "v2t": _kernel_v2t, "v2p": _kernel_v2p}

# Which in-kernel dequant variant the dispatcher uses for v2-format weights.
# Round-5 ENGINE A/B on the real chip (scripts/engine_ab.py, the repo's
# GO/NO-GO rule — docs/KERNELS_r04.md: kernel ship decisions use the
# engine number, not the ±30% microbench): v2g 742.5 tok/s > v2m 698.3.
# v2m's 717 GB/s microbench win (docs/KERNELS_r04.md session 3) does not
# survive the engine: its XLA-side per-group activation gather + changed
# dispatch shape cost more than the per-weight scale-mul it deletes.
# Round-4's v2m default is therefore REVERTED per the rule it violated
# (VERDICT r4 #2). Microbench ordering for reference: v2m 717 > v2g 658 >
# v2f 490-498 > v2 470-486 > v2t 464 > v2h 439 > v3 329 GB/s effective.
# GG_PALLAS_V2_VARIANT=v2 restores the bit-matched-to-f32-build kernel.
PALLAS_V2_VARIANT = os.environ.get("GG_PALLAS_V2_VARIANT", "v2g")

# Separate default for gs=16 formats (Q2/Q3/Q6_K — incl. the Q6_K lm_head):
# empty = follow PALLAS_V2_VARIANT. Set after the round-5 lm_head-shape race
# (scripts/lmhead_race.py, docs/KERNELS_r05.md).
PALLAS_V2_VARIANT_GS16 = os.environ.get("GG_PALLAS_V2_VARIANT_GS16", "")


def _effective_v2_variant(variant: str, *, gs: int, per_byte: int,
                          tile_in: int, B: int) -> str:
    """Resolve the REQUESTED kernel variant to the one that actually runs
    for this format/shape. Public so kernel_lab / tests / benches can label
    results by the effective kernel instead of the requested name (ADVICE
    r4: 'v2m' results on gs=16 packs silently measured v2g):

    * v2s needs nibble planes -> v2g for byte-wide codes;
    * v2m/v2t at gs=16 (Q2/Q3/Q6_K) -> v2p, the pair-group kernel (naive
      k=16 dots double the unroll and compile for minutes); explicit v2p
      at gs=32 -> v2m (pairing is a gs=16 construction);
    * group/pair-gathered x must tile on 8 sublanes, else -> v2g.
    """
    if variant == "v2s" and per_byte != 2:
        return "v2g"
    if variant == "v2p" and gs != 16:
        variant = "v2m"
    if variant in ("v2m", "v2t") and gs == 16:
        variant = "v2p" if variant == "v2m" else "v2g"
    if variant == "v2p":
        if gs != 16 or ((tile_in // 32) * B) % 8 or tile_in % 32:
            return "v2g"
        return "v2p"
    if variant in ("v2m", "v2t") and (((tile_in // gs) * B) % 8 or gs < 32):
        return "v2g"
    return variant


def effective_v2_variant_for(rql, B: int = 8,
                             variant: Optional[str] = None) -> str:
    """Which kernel a dequant_matmul dispatch of `rql` actually runs at row
    count B (None variant = the current PALLAS_V2_VARIANT default)."""
    tiles = select_tiles_v2(rql.d_in_local, rql.d_out, n_rows=B)
    if tiles is None:
        return "xla"
    if variant is None:
        variant = (PALLAS_V2_VARIANT_GS16
                   if rql.group_size == 16 and PALLAS_V2_VARIANT_GS16
                   else PALLAS_V2_VARIANT)
    return _effective_v2_variant(
        variant, gs=rql.group_size,
        per_byte=rql.per_byte, tile_in=min(tiles[0], rql.d_in_local), B=B)


@functools.partial(
    jax.jit,
    static_argnames=("tile_out", "tile_in", "interpret", "mxu_dtype", "variant"),
)
def dequant_matmul_pallas_v2(
    x: jax.Array,
    rql: RuntimeQuantLinearV2,
    *,
    tile_out: int = 512,
    tile_in: int = 1024,
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,
    variant: str = "v2",
) -> jax.Array:
    """Fused y = x @ dequant(W)^T over the compact-scale format.

    mxu_dtype=bfloat16 feeds the MXU at full rate (the dequantized operand's
    4-6 significant bits survive bf16's 8-bit mantissa; accumulation stays
    f32); pass float32 for the bit-matched slow path.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, d_in = x.shape
    d_out = rql.d_out
    gs = rql.group_size
    per_byte = rql.per_byte
    d_rep = rql.d_rep
    tile_in = min(tile_in, d_in)
    tile_out = min(tile_out, d_out)
    assert d_in % tile_in == 0 and d_out % tile_out == 0
    assert tile_in % QK_K == 0
    n_i = d_out // tile_out
    n_j = d_in // tile_in
    ng_t = tile_in // gs
    sg_t = tile_in // QK_K
    has_min = rql.has_min
    variant = _effective_v2_variant(variant, gs=gs, per_byte=per_byte,
                                    tile_in=tile_in, B=B)

    kernel = functools.partial(
        _V2_KERNELS[variant], gs=gs, per_byte=per_byte, tile_in=tile_in,
        shift=rql.shift, has_min=has_min, mxu_dtype=mxu_dtype, d_rep=d_rep,
    )

    def wrapped(*refs):
        kernel(refs)

    if variant == "v2s":
        # split activations by superblock half OUTSIDE the kernel: the
        # kernel then never concatenates nibble planes across sublanes
        x3 = x.reshape(B, d_in // QK_K, QK_K)
        x_parts = [x3[:, :, : QK_K // 2].reshape(B, d_in // 2),
                   x3[:, :, QK_K // 2:].reshape(B, d_in // 2)]
        in_specs = [
            pl.BlockSpec((B, tile_in // 2), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tile_in // 2), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
    elif variant in ("v2m", "v2t", "v2p"):
        # gather activations by group OUTSIDE the kernel: (ng_total*B, gg)
        # row-major (g, b) so the per-group operand is a sublane slice.
        # v2p gathers at PAIR granularity (32 = two gs=16 groups).
        gg = 32 if variant == "v2p" else gs
        ng_total = d_in // gg
        xg = x.reshape(B, ng_total, gg).swapaxes(0, 1).reshape(
            ng_total * B, gg)
        x_parts = [xg]
        in_specs = [
            pl.BlockSpec((tile_in // gg * B, gg), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        x_parts = None
        in_specs = []
    in_specs += [
        pl.BlockSpec((B, tile_in), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_in // per_byte, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_rep * sg_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    ]
    operands = [x, rql.qs, rql.d_sg, rql.sc_q]
    if x_parts is not None:
        # the pre-split/pre-gathered activation operands replace the x spec
        np_ = len(x_parts)
        in_specs = in_specs[:np_] + in_specs[np_ + 1:]
        operands = x_parts + operands[1:]
    if has_min:
        in_specs += [
            pl.BlockSpec((d_rep * sg_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ]
        operands += [rql.dmin_sg, rql.mn_q]
    if variant in ("v2g", "v2s", "v2m", "v2t", "v2p"):
        # per-group activation sums for the offset-correction dot,
        # precomputed here (XLA) rather than in-kernel (v3's mistake).
        # Stored transposed (ng, B) so the lane dim equals the full array
        # dim (Mosaic block rule: last dim divisible by 128 or full).
        xsum = jnp.sum(x.reshape(B, d_in // gs, gs), axis=-1,
                       dtype=jnp.float32).T
        in_specs += [pl.BlockSpec((ng_t, B), lambda i, j: (j, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [xsum]

    bytes_scales = 4 * d_rep * d_out * (d_in // QK_K) + d_out * (d_in // gs)
    if has_min:
        bytes_scales *= 2
    return pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct((B, d_out), jnp.float32),
        grid=(n_i, n_j),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tile_out), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d_in * d_out,
            bytes_accessed=d_out * d_in // per_byte + bytes_scales + 4 * B * (d_in + d_out),
            transcendentals=0,
        ),
    )(*operands)


# ---------------------------------------------------------------------------
# Q8 activation-quantized path (llama.cpp vec_dot_q4_K_q8_K semantics)
# ---------------------------------------------------------------------------


def quantize_activations_q8(x: jax.Array, sg: int = QK_K):
    """Symmetric int8 per-supergroup activation quantization.

    Returns (q (B, d_in) int8, d (B, n_sg) f32) with q = round(x/d),
    d = amax/127 — the Q8_K scheme llama.cpp quantizes activations with
    before its integer dot kernels.
    """
    B, d_in = x.shape
    xr = x.reshape(B, d_in // sg, sg).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xr), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.clip(jnp.round(xr * inv[:, :, None]), -127, 127).astype(jnp.int8)
    return q.reshape(B, d_in), d


@jax.jit
def q8_matmul_xla(x: jax.Array, rql: RuntimeQuantLinearV2) -> jax.Array:
    """Integer-dot reference: quantize activations to Q8 per supergroup, do
    int32 group dots, apply two-level scale fixups (mirrors llama.cpp's
    vec_dot_q4_K_q8_K: sumf += d*d8*Σ(sc*idot) - dmin*d8*Σ(mn*bsum))."""
    B, d_in = x.shape
    gs = rql.group_size
    ng = d_in // gs
    n_sg = d_in // QK_K
    gpsg = QK_K // gs
    xq, d_x = quantize_activations_q8(x)

    codes = _unpack_codes_jnp(rql.qs, rql.per_byte, rql.d_in_local).astype(jnp.int32) - rql.shift
    wg = codes.reshape(ng, gs, rql.d_out)
    xg = xq.reshape(B, ng, gs).astype(jnp.int32)
    idot = jnp.einsum(
        "bgc,gct->bgt", xg, wg, preferred_element_type=jnp.int32
    ).astype(jnp.float32)

    scale, off = _group_scales_v2(rql)  # (ng, T)
    dx_g = jnp.repeat(d_x, gpsg, axis=1)  # (B, ng)
    main = jnp.einsum("bgt,gt,bg->bt", idot, scale, dx_g)
    if rql.has_min:
        bsums = xg.sum(axis=2).astype(jnp.float32)  # (B, ng)
        sx = bsums * dx_g
        main = main - jnp.einsum("bg,gt->bt", sx, off)
    return main


@functools.lru_cache(maxsize=None)
def pad_dout_v2(rql: "RuntimeQuantLinearV2",
                multiple: int = 512) -> "RuntimeQuantLinearV2":
    """Zero-pad a v2-format weight's OUTPUT dim to a multiple (zero codes +
    zero scales dequantize to exactly 0). A d_out like the 128256 vocab
    forces tile_out=256, which the round-4 on-chip sweep measured ~25%
    slower than 512-wide tiles (docs/KERNELS_r04.md); padding the lm_head
    to 512 rows costs 0.2% extra bytes and the consumer slices logits back
    to vocab_size. Contiguous row chunks keep TP vocab sharding valid (the
    pad lives wholly in the last shard)."""
    d_out = rql.d_out
    pad = (-d_out) % multiple
    if pad == 0:
        return rql
    p = lambda a: (None if a is None else
                   jnp.pad(a, ((0, 0), (0, pad))))
    return RuntimeQuantLinearV2(
        p(rql.qs), p(rql.d_sg), p(rql.dmin_sg), p(rql.sc_q), p(rql.mn_q),
        rql.d_in, rql.group_size, rql.per_byte, rql.shift, rql.d_rep)


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


_VMEM_BUDGET = 15 * 2 ** 20  # scoped-vmem stack limit is 16M; leave margin


def _tile_fits_vmem(tile_in: int, tile_out: int, n_rows: int) -> bool:
    """Scoped-vmem estimate for one grid step of the v2 kernel: the f32
    dequant intermediate (tile_in x tile_out) dominates, plus the x block
    and the accumulator (n_rows is the x row count — 8 at decode, up to
    the padded prompt length at prefill, where the old fixed cap OOM'd)."""
    return (4 * tile_in * tile_out + 2 * n_rows * tile_in
            + 4 * n_rows * tile_out) <= _VMEM_BUDGET


def select_tiles_v2(d_in: int, d_out: int,
                    n_rows: int = 8) -> Optional[Tuple[int, int]]:
    """Tiles for the compact-scale kernel: tile_in must be a multiple of
    1024 (so the x2-replicated super-scale rows give >= 8 sublanes per
    block), or the whole input dim (full-dim blocks are always legal).
    tile_in caps at 8192 subject to the vmem budget: the round-4 on-chip
    sweep (docs/KERNELS_r04.md) measured 0.207 ms/layer at the (8192, 512)
    cap vs 0.249 at the old 2048 cap — deeper input tiles amortize the
    per-grid-step dequant prologue; (4096, 1024) overflows VMEM and
    full-14336 regresses to 0.244, so 8192/512 is the sweet spot at 8B
    decode shapes. Prefill (hundreds of x rows) gets shallower tiles from
    the same budget."""
    tile_out = _best_tile(d_out, 512, 256)
    if tile_out is None or d_in % QK_K != 0:
        return None
    cap = 8192
    while cap >= 1024:
        tile_in = _best_tile(d_in, cap, 1024)
        if tile_in is None:
            break
        if _tile_fits_vmem(tile_in, tile_out, n_rows):
            return tile_in, tile_out
        cap = tile_in - 1024
    if d_in <= 16384:
        to = min(tile_out, 256) if d_in > 8192 else tile_out
        while to >= 256:
            if _tile_fits_vmem(d_in, to, n_rows):
                return d_in, to
            to -= 256
    return None


# Test/dryrun hook: when True, dispatch runs the Pallas kernels in interpret
# mode on CPU instead of the XLA fallback — this is how the multichip dryrun
# exercises Pallas-under-shard_map without TPU hardware.
FORCE_PALLAS_INTERPRET = False


def dequant_matmul(x: jax.Array, rql, force_xla: bool = False) -> jax.Array:
    """Dispatch (v1/v2/v4 format): Pallas on TPU when shapes tile cleanly,
    XLA otherwise."""
    from . import qmv4

    on_tpu = jax.devices()[0].platform == "tpu"
    interpret = FORCE_PALLAS_INTERPRET and not on_tpu
    if isinstance(rql, qmv4.RuntimeQuantLinearV4):
        tiles = qmv4.select_tiles_v4(rql.d_in_local, rql.d_out)
        if force_xla or tiles is None or (not on_tpu and not interpret):
            return qmv4.dequant_matmul_xla_v4(x, rql)
        return qmv4.dequant_matmul_v4(
            x, rql, tile_in=tiles[0], tile_out=tiles[1], interpret=interpret
        )
    v2 = isinstance(rql, RuntimeQuantLinearV2)
    tiles = (select_tiles_v2(rql.d_in_local, rql.d_out, n_rows=x.shape[0])
             if v2 else select_tiles(rql.d_in_local, rql.d_out))
    if force_xla or tiles is None or (not on_tpu and not interpret):
        return dequant_matmul_xla_v2(x, rql) if v2 else dequant_matmul_xla(x, rql)
    if v2:
        variant = (PALLAS_V2_VARIANT_GS16
                   if rql.group_size == 16 and PALLAS_V2_VARIANT_GS16
                   else PALLAS_V2_VARIANT)
        return dequant_matmul_pallas_v2(
            x, rql, tile_in=tiles[0], tile_out=tiles[1], interpret=interpret,
            variant=variant,
        )
    return dequant_matmul_pallas(
        x, rql, tile_in=tiles[0], tile_out=tiles[1], interpret=interpret
    )


def fuse_rql_v2(parts) -> Optional[RuntimeQuantLinearV2]:
    """Concatenate v2 packed weights along the output dim (same d_in): one
    kernel launch for q/k/v or gate/up instead of three/two. Exact — every
    plane is per-output-column. Returns None if the parts don't share a
    layout (mixed qtypes/group sizes or non-v2)."""
    if not all(isinstance(p, RuntimeQuantLinearV2) for p in parts):
        return None
    p0 = parts[0]
    if not all(
        (p.group_size, p.per_byte, p.shift, p.d_rep, p.has_min, p.d_in)
        == (p0.group_size, p0.per_byte, p0.shift, p0.d_rep, p0.has_min, p0.d_in)
        for p in parts
    ):
        return None
    cat = lambda attr: jnp.concatenate([getattr(p, attr) for p in parts], axis=1)
    return RuntimeQuantLinearV2(
        cat("qs"), cat("d_sg"),
        cat("dmin_sg") if p0.has_min else None,
        cat("sc_q"), cat("mn_q") if p0.has_min else None,
        p0.d_in, p0.group_size, p0.per_byte, p0.shift, p0.d_rep,
    )


@jax.tree_util.register_pytree_node_class
class StackedQuantLinearV2:
    """E per-expert v2 packed weights with identical layout, stacked on a
    leading expert axis.

    Serving-side MoE representation: expert weights stay packed in HBM
    (4-6 bpw instead of 16 for dense float stacks) and are either scanned
    (prefill: every expert read once through the fused kernel) or gathered
    per token (decode: only the routed experts' planes leave HBM). The
    reference has no quantized-expert serving at all (llama.cpp dequantizes
    per tile on CPU); this is the TPU equivalent."""

    def __init__(self, qs, d_sg, dmin_sg, sc_q, mn_q, d_in: int,
                 group_size: int, per_byte: int, shift: int, d_rep: int = 1):
        self.qs = qs            # (E, d_in // per_byte, d_out) uint8
        self.d_sg = d_sg        # (E, d_rep * n_sg, d_out) f32
        self.dmin_sg = dmin_sg  # (E, d_rep * n_sg, d_out) f32 | None
        self.sc_q = sc_q        # (E, n_groups, d_out) u8/i8
        self.mn_q = mn_q        # (E, n_groups, d_out) u8 | None
        self.d_in = int(d_in)
        self.group_size = int(group_size)
        self.per_byte = int(per_byte)
        self.shift = int(shift)
        self.d_rep = int(d_rep)

    @property
    def n_experts(self) -> int:
        return self.qs.shape[0]

    @property
    def d_out(self) -> int:
        return self.qs.shape[2]

    @property
    def has_min(self) -> bool:
        return self.dmin_sg is not None

    def expert_aux(self):
        return dict(gs=self.group_size, per_byte=self.per_byte,
                    shift=self.shift, d_rep=self.d_rep)

    def fields(self):
        """Per-expert leaf tuple (None-free) for lax.scan / vmap."""
        if self.has_min:
            return (self.qs, self.d_sg, self.dmin_sg, self.sc_q, self.mn_q)
        return (self.qs, self.d_sg, self.sc_q)

    def make_expert(self, leaves) -> "RuntimeQuantLinearV2":
        """Rebuild one expert's RuntimeQuantLinearV2 from a fields() slice."""
        if self.has_min:
            qs, d_sg, dmin_sg, sc_q, mn_q = leaves
        else:
            (qs, d_sg, sc_q), dmin_sg, mn_q = leaves, None, None
        return RuntimeQuantLinearV2(
            qs, d_sg, dmin_sg, sc_q, mn_q, self.d_in, self.group_size,
            self.per_byte, self.shift, self.d_rep,
        )

    def tree_flatten(self):
        return (self.qs, self.d_sg, self.dmin_sg, self.sc_q, self.mn_q), (
            self.d_in, self.group_size, self.per_byte, self.shift, self.d_rep,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def stack_runtime_v2(rqls) -> StackedQuantLinearV2:
    """Stack per-expert RuntimeQuantLinearV2 (identical layouts required)."""
    p0 = rqls[0]
    for p in rqls[1:]:
        assert (p.group_size, p.per_byte, p.shift, p.d_rep, p.has_min,
                p.d_in, p.d_out) == (p0.group_size, p0.per_byte, p0.shift,
                                     p0.d_rep, p0.has_min, p0.d_in, p0.d_out)
    st = lambda attr: jnp.stack([getattr(p, attr) for p in rqls])
    return StackedQuantLinearV2(
        st("qs"), st("d_sg"), st("dmin_sg") if p0.has_min else None,
        st("sc_q"), st("mn_q") if p0.has_min else None,
        p0.d_in, p0.group_size, p0.per_byte, p0.shift, p0.d_rep,
    )


def _wt_v2_fields(qs, d_sg, dmin_sg, sc_q, mn_q, *, gs, per_byte, shift,
                  d_rep) -> jax.Array:
    """(d_in, d_out) f32 W^T from one expert's v2 fields — bit-exact
    canonical op order (same math as dequantize_runtime_v2)."""
    d_in = qs.shape[0] * per_byte
    d_out = qs.shape[1]
    q = _unpack_codes_jnp(qs, per_byte, d_in).astype(jnp.int32) - shift
    gpsg = QK_K // gs
    scale = jnp.repeat(d_sg[::d_rep], gpsg, axis=0) * sc_q.astype(jnp.float32)
    if dmin_sg is not None:
        off = jnp.repeat(dmin_sg[::d_rep], gpsg, axis=0) * mn_q.astype(jnp.float32)
    else:
        off = jnp.zeros_like(scale)
    ng = scale.shape[0]
    qf = q.reshape(ng, gs, d_out).astype(jnp.float32)
    w_t = scale[:, None, :] * qf - off[:, None, :]
    return w_t.reshape(d_in, d_out)


def gathered_expert_matmul(x: jax.Array, stacked: StackedQuantLinearV2,
                           idx: jax.Array) -> jax.Array:
    """Per-token expert matmul: x (T, d_in), idx (T,) expert ids -> (T, d_out).

    Gathers only the routed experts' packed planes from HBM (decode-path MoE:
    HBM traffic ∝ tokens × top_k instead of the full expert stack), then
    dequantizes and applies each as a matvec. vmapped over tokens so XLA
    fuses the gather + dequant + dot per token."""
    aux = stacked.expert_aux()

    def one(x1, *leaves):
        if stacked.has_min:
            qs, d_sg, dmin_sg, sc_q, mn_q = leaves
        else:
            (qs, d_sg, sc_q), dmin_sg, mn_q = leaves, None, None
        w_t = _wt_v2_fields(qs, d_sg, dmin_sg, sc_q, mn_q, **aux)
        return jnp.dot(x1.astype(jnp.float32), w_t,
                       preferred_element_type=jnp.float32)

    gathered = tuple(jnp.take(f, idx, axis=0) for f in stacked.fields())
    return jax.vmap(one)(x, *gathered)


# default runtime weight format for new packs ("v2" = compact scales,
# "v4" = plane-split + folded offsets, see ops/qmv4.py)
RUNTIME_FORMAT = "v2"


def pack_runtime_auto(qweight, params, qtype, fmt: Optional[str] = None):
    fmt = fmt or RUNTIME_FORMAT
    if fmt == "v4":
        from . import qmv4

        return qmv4.pack_runtime_v4(qweight, params, qtype)
    if fmt == "v2":
        return pack_runtime_v2(qweight, params, qtype)
    return pack_runtime(qweight, params, qtype)
