"""V4 fused dequant-matmul: split-plane nibble layout + folded offsets.

Why v4 (round-3 kernel work): the v1/v2 kernels are VPU-bound, not
HBM-bound — BENCH_r02 measured them at 85-101 GB/s against 267 GB/s of
streaming bandwidth on the same chip. Their per-weight dequant chain costs
~8 VPU ops (u8->i32 widen, mask, shift, sublane *concat*, i32->f32 convert,
scale mul, offset sub, f32->bf16 convert), all in 32-bit lanes. v4 cuts the
chain to ~3-4 ops/weight:

* **No concat.** The v2 byte layout already packs low nibbles at supergroup
  rows [0, 128) and high nibbles at [128, 256). Instead of re-interleaving
  the two nibble planes inside the kernel (a sublane-axis concat that copies
  every weight), v4 splits the *activation* vector into the matching plane
  order outside the kernel — O(B*d_in) work instead of O(d_in*d_out) — and
  accumulates two half-depth dots: ``x_lo @ w_lo + x_hi @ w_hi``. Because
  the plane boundary (row 128) is a group boundary (128 = 4 * gs), the
  per-group scale planes stay in natural order; each kernel step slices the
  lo/hi scale rows with a free leading-dim reshape.

* **No per-weight offset subtraction.** The affine offset (group min +
  signed-code shift) is linear in x, so it folds into a per-group
  correction applied *after* the kernel: ``y -= xsum @ offc`` with
  ``xsum[b, g] = sum of x over group g`` (computed once per call, O(B*d_in))
  and ``offc[g, c] = dmin*mn + scale*shift``. The correction matmul is
  (B, ng) @ (ng, d_out) — MXU work at 1/gs of the main dot, exact in f32.

* **One convert, one mul.** Codes (<= 6 bits) are exact in bfloat16, so the
  kernel converts i32 codes straight to the MXU dtype and multiplies by the
  (sublane-broadcast) scale in bf16; accumulation stays f32 via
  ``preferred_element_type``.

Numerics: |w_kernel - w_canonical| <= ~2^-8 relative (two bf16 roundings:
the stored bf16 scale and the scale*code product), the same order as the
v2 kernel's bf16 MXU path; the offset term is exact (f32 correction dot).

Storage (Q4_K, gs=32): 4 b/w codes + 0.5 b/w bf16 scale + 1 b/w f32 offc
= 5.5 b/w (v1: 8 b/w of f32 scale+offset on top of codes; v2: 4.75 b/w).
Scale dtype is configurable; f32 scales (6 b/w) are bit-closer to canonical
and still beat v2's reconstruction cost.

Reference parity: this replaces llama.cpp's quantized GEMV kernels
(ggml vec_dot_q4_K_q8_K etc.), the reference's deployment target
(SURVEY.md §2.2); the math is the canonical K-quant affine form of
/root/reference/quant/gptq/src/quant_utils.py.
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
class RuntimeQuantLinearV4:
    """Packed quantized weight, plane-split layout (input-dim-major).

    qs      (d_in // per_byte, d_out) u8 — byte k of a 256-row supergroup
            holds rows k (low nibble) and k + 128 (high nibble) for 4-bit
            types; one byte per code for 5/6-bit types.
    scale   (n_groups, d_out) bf16/f32 per-group scale, natural group order.
    offc    (n_groups, d_out) f32 folded offset: dmin*mn + scale*shift.
            None when the type has neither a min nor a shift.
    layout  "i32": qs bytes identical to the v2 format, kernel unpacks with
            i32 masks + shifts.
            "i8": shift-free layout (round 3) — measured i32 bitwise VPU ops
            run ~10x slower than i8 ops on this target, so the kernel
            bitcasts bytes to int8 and extracts both nibbles with two AND
            masks: the hi nibble is stored BIASED by -8 in two's-complement
            (byte = lo | ((hi - 8) & 0xF) << 4), so the signed value of
            (byte & 0xF0) is exactly 16*(hi - 8); the x16 folds into the
            stored hi-group scale (s/16) and the -8 bias into the exact
            offc correction (offc_hi -= 8*s). 5/6-bit codes are stored
            bias-shifted into int8 range with the same scale-side folds.
    """

    def __init__(self, qs, scale, offc, d_in: int, group_size: int,
                 per_byte: int, layout: str = "i32"):
        self.qs = qs
        self.scale = scale
        self.offc = offc
        self.d_in = int(d_in)
        self.group_size = int(group_size)
        self.per_byte = int(per_byte)
        self.layout = str(layout)

    @property
    def d_out(self) -> int:
        return self.qs.shape[1]

    @property
    def d_in_local(self) -> int:
        """Input dim of the materialized planes (shard-local under TP)."""
        return self.qs.shape[0] * self.per_byte

    @property
    def has_off(self) -> bool:
        return self.offc is not None

    @property
    def packed_bits_per_weight(self) -> float:
        n = self.qs.shape[0] + self.scale.dtype.itemsize * self.scale.shape[0]
        if self.offc is not None:
            n += self.offc.dtype.itemsize * self.offc.shape[0]
        return n * 8 / self.d_in_local

    def tree_flatten(self):
        return (self.qs, self.scale, self.offc), (
            self.d_in, self.group_size, self.per_byte, self.layout,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def pack_runtime_v4(
    qweight: np.ndarray,
    params: SuperGroupParams,
    qtype: GGMLQuantizationType,
    scale_dtype=jnp.float32,
    layout: str = "i32",
) -> RuntimeQuantLinearV4:
    """Build the v4 runtime format from a layer artifact (host-side numpy)."""
    spec = KQUANT_SPECS[qtype]
    d_out, d_in = qweight.shape
    gs = spec.group_size
    shift = -spec.qmin  # 0 for unsigned types, 4 / 32 for Q3_K / Q6_K

    ss = np.asarray(params.super_scale, np.float16).astype(np.float32)
    sq = np.asarray(params.scale_q).astype(np.float32)
    gpsg = spec.num_groups
    scale = np.repeat(ss, gpsg, axis=1) * sq  # (d_out, ng), exact in f32
    offc = scale * shift if shift else None
    if not spec.signed:
        sz = np.asarray(params.super_zero, np.float16).astype(np.float32)
        zq = np.asarray(params.zero_q).astype(np.float32)
        off_min = np.repeat(sz, gpsg, axis=1) * zq
        offc = off_min if offc is None else offc + off_min

    codes = np.asarray(qweight).astype(np.int16) + shift  # unsigned
    assert codes.min() >= 0
    codes_t = np.ascontiguousarray(codes.T).astype(np.uint8)  # (d_in, d_out)
    scale_t = np.ascontiguousarray(scale.T)  # (ng, d_out)
    offc_t = None if offc is None else np.ascontiguousarray(offc.T)
    if spec.bits <= 4:
        per_byte = 2
        c = codes_t.reshape(d_in // QK_K, QK_K, d_out)
        lo, hi = c[:, :_HALF, :], c[:, _HALF:, :]
        if layout == "i8":
            # hi nibble stored biased by -8 (two's complement in the high
            # nibble): signed(byte & 0xF0) == 16*(hi - 8). Fold the x16
            # into the hi-group scales and the +8 into the offsets:
            #   w = s*hi = (s/16)*(16*(hi-8)) + 8*s
            qs = (lo | (((hi.astype(np.int16) - 8) & 0xF) << 4).astype(
                np.uint8)).reshape(d_in // 2, d_out)
            gh = gpsg // 2  # groups per half-supergroup
            sc3 = scale_t.reshape(d_in // QK_K, gpsg, d_out)
            hi_s = sc3[:, gh:, :]
            if offc_t is None:
                offc_t = np.zeros_like(scale_t)
            of3 = offc_t.reshape(d_in // QK_K, gpsg, d_out)
            of3[:, gh:, :] -= 8.0 * hi_s
            sc3 = np.concatenate([sc3[:, :gh], hi_s / 16.0], axis=1)
            scale_t = sc3.reshape(d_in // gs, d_out)
            offc_t = of3.reshape(d_in // gs, d_out)
        else:
            qs = (lo | (hi << 4)).reshape(d_in // 2, d_out)
    else:
        per_byte = 1
        qs = codes_t  # 5/6-bit codes are < 128: int8-safe as stored
    return RuntimeQuantLinearV4(
        jnp.asarray(qs),
        jnp.asarray(scale_t, dtype=scale_dtype),
        None if offc_t is None else jnp.asarray(offc_t),
        d_in,
        gs,
        per_byte,
        layout,
    )


def v4_from_v2(rql2, scale_dtype=jnp.float32) -> RuntimeQuantLinearV4:
    """Convert a RuntimeQuantLinearV2 (compact two-level scales) to v4.

    The qs bytes are shared (same layout); only the scale planes are
    expanded to per-group scale/offc in the canonical f32 op order."""
    gpsg = QK_K // rql2.group_size
    d = jnp.repeat(rql2.d_sg[:: rql2.d_rep], gpsg, axis=0)
    scale = d * rql2.sc_q.astype(jnp.float32)
    offc = scale * rql2.shift if rql2.shift else None
    if rql2.has_min:
        off_min = (
            jnp.repeat(rql2.dmin_sg[:: rql2.d_rep], gpsg, axis=0)
            * rql2.mn_q.astype(jnp.float32)
        )
        offc = off_min if offc is None else offc + off_min
    return RuntimeQuantLinearV4(
        rql2.qs, scale.astype(scale_dtype), offc,
        rql2.d_in, rql2.group_size, rql2.per_byte,
    )


def dequantize_runtime_v4(rql: RuntimeQuantLinearV4) -> jax.Array:
    """Reference dequantization (XLA): returns (d_out, d_in) f32.

    Reproduces the kernel-visible code values per layout: for "i8" the hi
    plane decodes as the signed value of (byte & 0xF0) = 16*(hi - 8), with
    the x16 / -8 folds already in the stored scale/offc planes."""
    d_in = rql.d_in_local
    d_out = rql.d_out
    if rql.per_byte == 2:
        if rql.layout == "i8":
            s8 = rql.qs.astype(jnp.int8)
            lo = (s8 & jnp.int8(0x0F)).astype(jnp.int32)
            hi = (s8 & jnp.int8(-16)).astype(jnp.int32)
        else:
            b = rql.qs.astype(jnp.int32)
            lo, hi = b & 0x0F, b >> 4
        lo = lo.reshape(d_in // QK_K, _HALF, d_out)
        hi = hi.reshape(d_in // QK_K, _HALF, d_out)
        q = jnp.concatenate([lo, hi], axis=1).reshape(d_in, d_out)
    else:
        q = rql.qs.astype(jnp.int32)
    ng = rql.scale.shape[0]
    qf = q.astype(jnp.float32).reshape(ng, rql.group_size, d_out)
    w_t = qf * rql.scale.astype(jnp.float32)[:, None, :]
    if rql.offc is not None:
        w_t = w_t - rql.offc[:, None, :]
    return w_t.reshape(d_in, d_out).T


@jax.jit
def dequant_matmul_xla_v4(x: jax.Array, rql: RuntimeQuantLinearV4) -> jax.Array:
    w = dequantize_runtime_v4(rql)
    return jnp.dot(x.astype(jnp.float32), w.T, preferred_element_type=jnp.float32)


def _split_planes(x: jax.Array, d_in: int):
    """(B, d_in) -> x_lo, x_hi (B, d_in/2) in packed plane order: plane lo
    holds supergroup rows [0, 128), plane hi rows [128, 256)."""
    B = x.shape[0]
    xr = x.reshape(B, d_in // QK_K, 2, _HALF)
    return (
        xr[:, :, 0, :].reshape(B, d_in // 2),
        xr[:, :, 1, :].reshape(B, d_in // 2),
    )


def _group_sums(x: jax.Array, gs: int) -> jax.Array:
    """(B, d_in) -> (B, n_groups) f32 per-group activation sums."""
    B, d_in = x.shape
    return x.astype(jnp.float32).reshape(B, d_in // gs, gs).sum(axis=-1)


def _kernel_v4_pb2(x_lo_ref, x_hi_ref, qs_ref, scale_ref, out_ref, *,
                   gs, tile_in, mxu_dtype, acc_steps):
    """One (out-tile, in-chunk) step, 4-bit plane-split path.

    tile_in counts *logical* input rows; the qs block carries tile_in/2
    packed bytes whose nibbles are the lo/hi planes. The scale block is in
    natural group order: reshaped (sg, 2, gh, T), [:, 0] rows scale the lo
    plane and [:, 1] the hi plane (128 rows = 4 groups per half-supergroup).
    """
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    b = qs_ref[:].astype(jnp.int32)  # (tile_in/2, T)
    T = b.shape[1]
    tc = tile_in // 2
    sg_t = tile_in // QK_K
    gh = _HALF // gs  # groups per half-supergroup
    ng_h = sg_t * gh

    s = scale_ref[:].astype(mxu_dtype).reshape(sg_t, 2, gh, 1, T)
    lo = (b & 0x0F).astype(mxu_dtype).reshape(ng_h, gs, T)
    hi = (b >> 4).astype(mxu_dtype).reshape(ng_h, gs, T)
    w_lo = (lo * s[:, 0].reshape(ng_h, 1, T)).reshape(tc, T)
    w_hi = (hi * s[:, 1].reshape(ng_h, 1, T)).reshape(tc, T)

    acc = jnp.dot(
        x_lo_ref[:].astype(mxu_dtype), w_lo, preferred_element_type=jnp.float32
    )
    acc = acc + jnp.dot(
        x_hi_ref[:].astype(mxu_dtype), w_hi, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v4_pb2_i8(x_lo_ref, x_hi_ref, qs_ref, scale_ref, out_ref, *,
                      gs, tile_in, mxu_dtype, acc_steps):
    """Shift-free 4-bit plane-split step (the round-3 hot kernel).

    Measured on this target: i32 bitwise VPU ops run ~10x slower than i8
    ops, so the whole unpack is two int8 AND masks on the bitcast bytes —
    the hi nibble's x16 and -8 bias live in the stored scale/offc planes
    (see RuntimeQuantLinearV4.layout)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(1)
    s8 = pltpu.bitcast(qs_ref[:], jnp.int8)  # (tile_in/2, T)
    T = s8.shape[1]
    tc = tile_in // 2
    sg_t = tile_in // QK_K
    gh = _HALF // gs
    ng_h = sg_t * gh

    s = scale_ref[:].astype(mxu_dtype).reshape(sg_t, 2, gh, 1, T)
    lo = (s8 & jnp.int8(0x0F)).astype(mxu_dtype).reshape(ng_h, gs, T)
    hi = (s8 & jnp.int8(-16)).astype(mxu_dtype).reshape(ng_h, gs, T)
    w_lo = (lo * s[:, 0].reshape(ng_h, 1, T)).reshape(tc, T)
    w_hi = (hi * s[:, 1].reshape(ng_h, 1, T)).reshape(tc, T)

    acc = jnp.dot(
        x_lo_ref[:].astype(mxu_dtype), w_lo, preferred_element_type=jnp.float32
    )
    acc = acc + jnp.dot(
        x_hi_ref[:].astype(mxu_dtype), w_hi, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_v4_pb1(x_ref, qs_ref, scale_ref, out_ref, *,
                   gs, tile_in, mxu_dtype, acc_steps, layout="i32"):
    """5/6-bit path: one byte per code, no planes. Codes are < 128, so the
    i8 layout converts the bitcast bytes directly (no i32 widen)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(1)
    if layout == "i8":
        q = pltpu.bitcast(qs_ref[:], jnp.int8).astype(mxu_dtype)
    else:
        q = qs_ref[:].astype(jnp.int32).astype(mxu_dtype)
    T = q.shape[1]
    ng = tile_in // gs
    w = (
        q.reshape(ng, gs, T)
        * scale_ref[:].astype(mxu_dtype).reshape(ng, 1, T)
    ).reshape(tile_in, T)
    acc = jnp.dot(
        x_ref[:].astype(mxu_dtype), w, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(
    jax.jit, static_argnames=("tile_out", "tile_in", "interpret", "mxu_dtype")
)
def _main_dot_v4(
    x: jax.Array,
    rql: RuntimeQuantLinearV4,
    *,
    tile_out: int,
    tile_in: int,
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,
) -> jax.Array:
    """y = x @ (scale * codes)^T — the offset-free part of the product."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, d_in = x.shape
    d_out = rql.d_out
    gs = rql.group_size
    per_byte = rql.per_byte
    assert d_in % tile_in == 0 and d_out % tile_out == 0
    assert tile_in % QK_K == 0
    n_i = d_out // tile_out
    n_j = d_in // tile_in
    ng_t = tile_in // gs

    common = dict(gs=gs, tile_in=tile_in, mxu_dtype=mxu_dtype, acc_steps=n_j)
    if per_byte == 2:
        kfn = _kernel_v4_pb2_i8 if rql.layout == "i8" else _kernel_v4_pb2
        kernel = functools.partial(kfn, **common)
        x_lo, x_hi = _split_planes(x, d_in)
        operands = [x_lo, x_hi, rql.qs, rql.scale]
        in_specs = [
            pl.BlockSpec((B, tile_in // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tile_in // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_in // 2, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_kernel_v4_pb1, layout=rql.layout, **common)
        operands = [x, rql.qs, rql.scale]
        in_specs = [
            pl.BlockSpec((B, tile_in), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_in, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_t, tile_out), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d_out), jnp.float32),
        grid=(n_i, n_j),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tile_out), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d_in * d_out,
            bytes_accessed=d_out * d_in // per_byte
            + rql.scale.dtype.itemsize * d_out * (d_in // gs)
            + 4 * B * (d_in + d_out),
            transcendentals=0,
        ),
    )(*operands)


def dequant_matmul_v4(
    x: jax.Array,
    rql: RuntimeQuantLinearV4,
    *,
    tile_out: int = 512,
    tile_in: int = 2048,
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,
) -> jax.Array:
    """Fused y = x @ dequant(W)^T over the v4 format.

    The main dot runs in the Pallas kernel; the affine offset is applied as
    an exact f32 correction ``y -= xsum @ offc`` outside (XLA fuses the
    per-group sums and the small matmul around the kernel call).
    """
    d_in = rql.d_in_local
    tile_in = min(tile_in, d_in)
    tile_out = min(tile_out, rql.d_out)
    y = _main_dot_v4(
        x, rql, tile_out=tile_out, tile_in=tile_in, interpret=interpret,
        mxu_dtype=mxu_dtype,
    )
    if rql.offc is not None:
        xsum = _group_sums(x, rql.group_size)
        y = y - jnp.dot(xsum, rql.offc, preferred_element_type=jnp.float32)
    return y


def fuse_rql_v4(parts) -> Optional["RuntimeQuantLinearV4"]:
    """Concatenate v4 packed weights along the output dim (same d_in): one
    kernel launch for q/k/v or gate/up. Exact — every plane is per-output-
    column. Returns None if the parts don't share a layout."""
    if not all(isinstance(p, RuntimeQuantLinearV4) for p in parts):
        return None
    p0 = parts[0]
    if not all(
        (p.group_size, p.per_byte, p.d_in, p.has_off, p.scale.dtype, p.layout)
        == (p0.group_size, p0.per_byte, p0.d_in, p0.has_off, p0.scale.dtype,
            p0.layout)
        for p in parts
    ):
        return None
    cat = lambda attr: jnp.concatenate([getattr(p, attr) for p in parts], axis=1)
    return RuntimeQuantLinearV4(
        cat("qs"), cat("scale"), cat("offc") if p0.has_off else None,
        p0.d_in, p0.group_size, p0.per_byte, p0.layout,
    )


@functools.lru_cache(maxsize=None)
def _best_tile_v4(dim: int, cap: int, quantum: int) -> Optional[int]:
    start = (min(cap, dim) // quantum) * quantum
    for t in range(start, quantum - 1, -quantum):
        if dim % t == 0:
            return t
    return None


def select_tiles_v4(d_in: int, d_out: int) -> Optional[Tuple[int, int]]:
    """(tile_in, tile_out) for the v4 kernel, or None if untileable.

    tile_in must be a QK_K multiple with >= 8 sublanes in every operand
    block (512 logical rows -> 256 packed bytes, 16 scale rows); tile_out a
    lane-width multiple."""
    tile_out = _best_tile_v4(d_out, 512, 256)
    if tile_out is None or d_in % QK_K != 0:
        return None
    tile_in = _best_tile_v4(d_in, 2048, 512)
    if tile_in is not None:
        return tile_in, tile_out
    if d_in <= 16384:  # odd multiples of 256: take the whole input dim
        return d_in, (min(tile_out, 256) if d_in > 4096 else tile_out)
    return None
