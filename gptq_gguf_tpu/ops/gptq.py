"""GPTQ solver as a single jitted XLA program.

TPU-native re-design of the reference GPTQ class (quant/gptq/src/gptq.py):

* Hessian accumulation (gptq.py:80-114) is a jitted EMA of X^T X on the MXU.
* The Cholesky pipeline (gptq.py:304-324: damp -> inv_sym -> upper Cholesky)
  uses jax.scipy.linalg with a NaN-detecting identity fallback replacing the
  reference's try/except (gptq.py:321-323).
* The sequential column loop (gptq.py:222-270) becomes a ``lax.scan`` over
  column blocks with an inner ``lax.scan`` over the 128 columns of a block;
  rank-1 error feedback stays inside the block (registers/VMEM), and the
  cross-block update is one masked MXU matmul per block — the same
  "lazy batch" structure as the reference but compiled as one XLA program
  per layer instead of ~10^4 Python-dispatched torch calls.
* Dynamic per-supergroup scale refits (gptq.py:240-245) run at supergroup
  boundaries; activation ordering (gptq.py:211-216) and the Q3_K special
  case (gptq.py:204-206) are reproduced exactly.

The whole solve is row-parallel (every row quantizes independently given the
shared Cholesky), which is what makes it map well to TPU vector units — and
what lets multi-chip runs shard the solve by rows instead of the reference's
rank-0-solve-then-broadcast (gptq.py:278-293).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.ggml import KQUANT_SPECS, GGMLQuantizationType
from . import kquant
from .kquant import ScaleSearchConfig, SuperGroupParams


class GPTQConfig(NamedTuple):
    """GPTQ hyperparameters (reference gptq.py:28-62, defaults from
    quant/gptq/run_quant.sh:23-33)."""

    rel_damp: float = 1e-2
    block_size: int = 128
    act_order: bool = False
    static_groups: bool = False
    scale_cfg: ScaleSearchConfig = ScaleSearchConfig()


class GPTQResult(NamedTuple):
    qweight: jax.Array  # (d_row, d_col) integer codes
    params: SuperGroupParams
    issue_non_invertible: jax.Array  # scalar bool


# ---------------------------------------------------------------------------
# Hessian accumulation
# ---------------------------------------------------------------------------


@jax.jit
def accumulate_hessian(
    H: jax.Array, num_samples: jax.Array, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """EMA Hessian update ``H <- beta H + alpha X^T X`` (gptq.py:107-114).

    ``x``: (batch, ..., d_col) layer inputs; batch counts *sequences* like the
    reference (gptq.py:88). fp32 accumulation (the reference disables TF32,
    gptq.py:24-25; we force f32 on the MXU via preferred_element_type).
    """
    batch = x.shape[0]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    beta = num_samples / (num_samples + batch)
    alpha = 2.0 / (num_samples + batch)
    H = beta * H + alpha * jnp.dot(
        x2.T, x2, preferred_element_type=jnp.float32
    )
    return H, num_samples + batch


def init_hessian(d_col: int) -> Tuple[jax.Array, jax.Array]:
    return jnp.zeros((d_col, d_col), jnp.float32), jnp.zeros((), jnp.float32)


# ---------------------------------------------------------------------------
# Cholesky pipeline
# ---------------------------------------------------------------------------


@jax.jit
def _mask_and_damp(H: jax.Array, W: jax.Array, rel_damp: float):
    """Pruned-channel / dead-column masking + damping (gptq.py:122-143,
    304-317). Returns (W_masked, H_damped)."""
    d_col = H.shape[0]
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    diag = jnp.diagonal(H)
    pruned = diag == 0
    H = jnp.where(pruned[:, None] & pruned[None, :] & jnp.eye(d_col, dtype=bool), 1.0, H)
    W = jnp.where(pruned[None, :], 0.0, W)

    zero_cols = jnp.all(W == 0, axis=0)
    H = jnp.where(zero_cols[:, None] | zero_cols[None, :], 0.0, H)
    H = jnp.where(jnp.eye(d_col, dtype=bool) & zero_cols[None, :], 1.0, H)

    damp = rel_damp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(d_col, dtype=jnp.float32)
    return W, H


# panel width for the blocked triangular inverse; columns above this size
# switch from one monolithic triangular_solve to panel back-substitution.
# Round-5 status: the panels path probes fast standalone (0.11 s at
# n=14336, scripts/factorize_probe.py) but the calibration walk stalled
# twice with it live on the relay chip (futex-wait, no progress) while
# the monolithic path completes reliably — so it ships DISABLED by
# default until the interaction is understood; enable with
# GG_GPTQ_TRINV_PANELS_ABOVE=8192.
_TRINV_PANEL = 512
_TRINV_BLOCKED_ABOVE = int(os.environ.get(
    "GG_GPTQ_TRINV_PANELS_ABOVE", 1 << 30))


def _trinv_panels(Ur: jax.Array, p: int = _TRINV_PANEL) -> jax.Array:
    """U = Ur^{-1} for upper-triangular Ur via blocked back-substitution.

    XLA:TPU's monolithic triangular_solve against the identity runs
    sequential panels internally and measured tens of seconds at n=14336
    (the GPTQ down-proj factorize — round-5 walk breakdown). Blocked form:
    for row-panel i (last to first), X[i] = D_i^{-1}(E_i - Ur[i, i+p:] X
    [i+p:]) — one (p x p) triangular solve plus one wide MXU GEMM per
    panel, n/p sequential steps instead of n. Same mathematical
    back-substitution; summation order inside the GEMM differs from the
    monolithic solve only in float rounding."""
    n = Ur.shape[0]
    while n % p:
        p //= 2
    npan = n // p
    X = jnp.zeros((n, n), jnp.float32)
    for i in reversed(range(npan)):
        r0 = i * p
        D = Ur[r0:r0 + p, r0:r0 + p]
        rhs = jnp.zeros((p, n), jnp.float32)
        rhs = jax.lax.dynamic_update_slice(rhs, jnp.eye(p, dtype=jnp.float32),
                                           (0, r0))
        if i < npan - 1:
            rhs = rhs - jnp.dot(Ur[r0:r0 + p, r0 + p:], X[r0 + p:, :],
                                preferred_element_type=jnp.float32)
        Xi = jax.lax.linalg.triangular_solve(D, rhs, left_side=True,
                                             lower=False)
        X = jax.lax.dynamic_update_slice(X, Xi, (r0, 0))
    return X


@jax.jit
def _factorize_device(H: jax.Array):
    """Upper U with H^{-1} = U^T U via the reversed-Cholesky identity.

    With J the exchange (flip) matrix and J H J = Lr Lr^T one Cholesky gives
    H = Ur Ur^T for Ur = J Lr J (upper); then U = Ur^{-1} (one triangular
    solve). This replaces the reference's chol -> cholesky_inverse -> chol
    chain (linalg_utils.py:9-13, gptq.py:318-320): same U (unique SPD
    factorization with positive diagonal), one factorization instead of two,
    and no explicit H^{-1} buffer — which keeps XLA:TPU peak memory at O(n^2)
    where the naive chain OOMs for n=14336. Large n uses the blocked
    inverse (_trinv_panels); small n keeps the monolithic solve (bit-stable
    with rounds 1-4 artifacts).
    """
    d_col = H.shape[0]
    Hr = H[::-1, ::-1]
    Lr = jnp.linalg.cholesky(Hr)
    Ur = Lr[::-1, ::-1]
    if d_col > _TRINV_BLOCKED_ABOVE:
        return _trinv_panels(Ur)
    eye = jnp.eye(d_col, dtype=jnp.float32)
    U = jax.lax.linalg.triangular_solve(Ur, eye, left_side=True, lower=False)
    return U


def _factorize_host(H: jax.Array):
    """Same factorization via host LAPACK (for very large d_col where the
    XLA:TPU Cholesky lowering is impractical)."""
    import scipy.linalg as sla

    Hn = np.asarray(H)
    n = Hn.shape[0]
    try:
        Lr = sla.cholesky(Hn[::-1, ::-1], lower=True, check_finite=False)
        Ur = np.ascontiguousarray(Lr[::-1, ::-1])
        U = sla.solve_triangular(
            Ur, np.eye(n, dtype=np.float32), lower=False, check_finite=False
        )
    except Exception:
        U = np.full((n, n), np.nan, dtype=np.float32)
    return jnp.asarray(U)


# d_col above which factorization runs on host LAPACK
HOST_FACTORIZE_THRESHOLD = int(os.environ.get("GGT_GPTQ_HOST_FACTORIZE_ABOVE", 16384))


def factorize_hinv_cholesky(H: jax.Array, method: str = "auto"):
    """Returns (U, issue_flag): upper-triangular U with H^{-1} = U^T U, or
    identity + flag on failure (reference gptq.py:318-324)."""
    d_col = H.shape[0]
    if method == "auto":
        method = "host" if d_col > HOST_FACTORIZE_THRESHOLD else "device"
    U = _factorize_host(H) if method == "host" else _factorize_device(H)
    bad = ~jnp.all(jnp.isfinite(U))
    U = jnp.where(bad, jnp.eye(d_col, dtype=jnp.float32), U)
    return U, bad


def prepare_hessian_inverse(
    H: jax.Array, W: jax.Array, rel_damp: float, method: str = "auto"
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Regularize H, zero dead columns, factorize: (W_masked, U, issue)."""
    W, H = _mask_and_damp(H, W, rel_damp)
    U, bad = factorize_hinv_cholesky(H, method)
    return W, U, bad


# ---------------------------------------------------------------------------
# Blocked column loop
# ---------------------------------------------------------------------------

# Round-5 (VERDICT r4 #5 / ROADMAP #3): the inner 128-column loop as ONE
# Pallas kernel per block. The XLA lax.scan formulation launches ~30 tiny
# device ops per column — at 26K columns/layer that device-launch overhead,
# not FLOPs or HBM, dominated the measured solve (PIPELINE_8B_r05 stage
# breakdown). The kernel holds the (row-tile x bs) block in VMEM and runs
# the column recurrence as a fori_loop of masked lane/sublane reduces —
# no dynamic slicing, no per-column launches. Rows are independent given
# the shared Cholesky, so the grid tiles d_row.
SOLVE_ROW_TILE = 512


def _solve_block_kernel(w_ref, u_ref, ud_ref, s_ref, z_ref, q_ref, e_ref,
                        *, bs, qmin, qmax, eps):
    """One GPTQ block solve for a row tile.

    w_ref: (R, bs) residual weights; u_ref: (bs, bs) the block's Cholesky
    slice; ud_ref: (1, bs) its diagonal; s_ref/z_ref: (R, bs) per-column
    effective scale/zero (super * group quant, pre-gathered in XLA).
    Writes q_ref (codes) and e_ref (err = (w - wq)/d, consumed by the
    cross-block MXU update). Column i's math selects lane i via masked
    reduces — exact, and Mosaic-friendly (no lane dynamic slices)."""
    w = w_ref[...]
    u = u_ref[...]
    ud = ud_ref[...]                      # (1, bs)
    s = s_ref[...]
    z = z_ref[...]
    R = w.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, bs), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    row_u = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)

    def body(i, carry):
        w, qacc, eacc = carry
        onecol = lane == i
        col = jnp.sum(jnp.where(onecol, w, 0.0), axis=1, keepdims=True)
        si = jnp.sum(jnp.where(onecol, s, 0.0), axis=1, keepdims=True)
        zi = jnp.sum(jnp.where(onecol, z, 0.0), axis=1, keepdims=True)
        di = jnp.sum(jnp.where(lane1 == i, ud, 0.0), axis=1, keepdims=True)
        q = jnp.clip(jnp.round((col + zi) / jnp.maximum(si, eps)),
                     qmin, qmax)
        wq = si * q - zi
        err = (col - wq) / di             # (R, 1)
        u_i = jnp.sum(jnp.where(row_u == i, u, 0.0), axis=0,
                      keepdims=True)      # (1, bs) row i of U
        u_i = jnp.where(lane1 >= i, u_i, 0.0)
        w = w - err * u_i
        qacc = jnp.where(onecol, q, qacc)
        eacc = jnp.where(onecol, err, eacc)
        return w, qacc, eacc

    _, qacc, eacc = jax.lax.fori_loop(
        0, bs, body, (w, jnp.zeros_like(w), jnp.zeros_like(w)))
    q_ref[...] = qacc
    e_ref[...] = eacc


def _solve_block_pallas(w_blk, u_blk, s_blk, z_blk, *, qmin, qmax, eps,
                        interpret=False):
    """(q_blk, err_blk) for one column block via the Pallas kernel, row
    tiles on the grid."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_row, bs = w_blk.shape
    R = SOLVE_ROW_TILE
    while d_row % R:
        R //= 2
    kernel = functools.partial(_solve_block_kernel, bs=bs, qmin=float(qmin),
                               qmax=float(qmax), eps=float(eps))

    def wrapped(*refs):
        kernel(*refs)

    ud = jnp.diagonal(u_blk).reshape(1, bs)
    row_spec = pl.BlockSpec((R, bs), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((bs, bs), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec((1, bs), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    q_blk, e_blk = pl.pallas_call(
        wrapped,
        out_shape=(jax.ShapeDtypeStruct((d_row, bs), jnp.float32),
                   jax.ShapeDtypeStruct((d_row, bs), jnp.float32)),
        grid=(d_row // R,),
        in_specs=[row_spec, full_spec, diag_spec, row_spec, row_spec],
        out_specs=(row_spec, row_spec),
        interpret=interpret,
    )(w_blk, u_blk, ud, s_blk, z_blk)
    return q_blk, e_blk


def _use_solve_kernel(d_row: int, bs: int) -> bool:
    """Pallas solve path gate: real TPU (or forced interpret for tests),
    lane-aligned block, sublane-tileable rows."""
    from . import qmatmul

    on_tpu = jax.devices()[0].platform == "tpu"
    ok_shapes = bs % 128 == 0 and d_row % 8 == 0
    if os.environ.get("GG_GPTQ_SOLVE_KERNEL", "") == "off":
        return False
    return ok_shapes and (on_tpu or qmatmul.FORCE_PALLAS_INTERPRET)


def _params_f32(p: SuperGroupParams) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    return (
        p.super_scale.astype(jnp.float32),
        p.super_zero.astype(jnp.float32),
        p.scale_q.astype(jnp.float32),
        p.zero_q.astype(jnp.float32),
    )


def _solve_core(
    W: jax.Array,
    U: jax.Array,
    col_group: jax.Array,
    col_sg: jax.Array,
    init_params,
    qtype: GGMLQuantizationType,
    cfg: GPTQConfig,
):
    """Blocked GPTQ loop. W pre-permuted if act_order; returns
    (qweight f32 codes in permuted order, params)."""
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = W.shape
    bs = cfg.block_size or d_col
    sgs = spec.super_group_size
    gpsg = spec.num_groups
    dynamic = not cfg.static_groups
    if dynamic:
        bs = min(bs, sgs)
        if sgs % bs != 0:
            raise ValueError(
                f"block_size {bs} must divide the supergroup size {sgs} for "
                "dynamic group fitting (default configuration uses 128)"
            )
    if d_col % bs != 0:
        raise ValueError(f"d_col {d_col} must be divisible by block_size {bs}")
    n_blocks = d_col // bs
    eps = cfg.scale_cfg.eps

    ss0, sz0, sq0, zq0 = init_params
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (d_col, 1), 0).squeeze(-1)
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0).squeeze(-1)

    def refit(c1, w, params):
        """Dynamic supergroup refit at column c1 (gptq.py:240-245), reading
        the current state of w for the next 256 columns."""
        ss, sz, sq, zq = params
        sg = c1 // sgs
        x = jax.lax.dynamic_slice(w, (0, c1), (d_row, sgs))
        p = kquant.fit_supergroups(x, qtype, cfg.scale_cfg)
        ss = jax.lax.dynamic_update_slice(ss, p.super_scale.astype(jnp.float32), (0, sg))
        sz = jax.lax.dynamic_update_slice(sz, p.super_zero.astype(jnp.float32), (0, sg))
        sq = jax.lax.dynamic_update_slice(sq, p.scale_q.astype(jnp.float32), (0, sg * gpsg))
        zq = jax.lax.dynamic_update_slice(zq, p.zero_q.astype(jnp.float32), (0, sg * gpsg))
        return ss, sz, sq, zq

    def block_body(carry, b):
        w, params = carry
        c1 = b * bs

        if dynamic:
            params = jax.lax.cond(
                c1 % sgs == 0,
                lambda args: refit(*args),
                lambda args: args[2],
                (c1, w, params),
            )
        ss, sz, sq, zq = params

        w_blk = jax.lax.dynamic_slice(w, (0, c1), (d_row, bs))
        u_blk = jax.lax.dynamic_slice(U, (c1, c1), (bs, bs))

        if _use_solve_kernel(d_row, bs):
            # Pallas block solve: per-column scale/zero planes pre-gathered
            # here (one gather per block instead of two per column), the
            # 128-column recurrence in ONE kernel (see _solve_block_kernel)
            idx_g = jax.lax.dynamic_slice(col_group, (c1,), (bs,))
            idx_sg = jax.lax.dynamic_slice(col_sg, (c1,), (bs,))
            s_blk = ss[:, idx_sg] * sq[:, idx_g]
            z_blk = sz[:, idx_sg] * zq[:, idx_g]
            on_tpu = jax.devices()[0].platform == "tpu"
            qblk, errs = _solve_block_pallas(
                w_blk, u_blk, s_blk, z_blk, qmin=spec.qmin, qmax=spec.qmax,
                eps=eps, interpret=not on_tpu)
            # NB: solved columns of ``w`` are never read again (the refit
            # window and the trailing update both look strictly ahead), so
            # the in-block residual w_blk needs no write-back.
        else:
            def col_body(wb, i):
                col = jax.lax.dynamic_slice(wb, (0, i), (d_row, 1))[:, 0]
                d = u_blk[i, i]
                g = col_group[c1 + i]
                sg = col_sg[c1 + i]
                s = ss[:, sg] * sq[:, g]
                z = sz[:, sg] * zq[:, g]
                q = jnp.clip(jnp.round((col + z) / jnp.maximum(s, eps)), spec.qmin, spec.qmax)
                wq = s * q - z
                err = (col - wq) / d
                u_row = u_blk[i, :] * (blk_ids >= i)
                wb = wb - err[:, None] * u_row[None, :]
                return wb, (q, err)

            w_blk, (q_cols, err_cols) = jax.lax.scan(
                col_body, w_blk, jnp.arange(bs, dtype=jnp.int32)
            )
            errs = err_cols.T  # (d_row, bs)
            qblk = q_cols.T
            w = jax.lax.dynamic_update_slice(w, w_blk, (0, c1))

        # masked MXU update of trailing columns (gptq.py:266,270)
        u_rows = jax.lax.dynamic_slice(U, (c1, 0), (bs, d_col))
        u_rows = u_rows * (col_ids >= c1 + bs)[None, :]
        w = w - jnp.dot(errs, u_rows, preferred_element_type=jnp.float32)
        return (w, params), qblk

    (w_final, params), qblks = jax.lax.scan(
        block_body, (W, (ss0, sz0, sq0, zq0)), jnp.arange(n_blocks, dtype=jnp.int32)
    )
    # qblks: (n_blocks, d_row, bs) -> (d_row, d_col)
    qweight = jnp.swapaxes(qblks, 0, 1).reshape(d_row, d_col)
    return qweight, params


@functools.partial(jax.jit, static_argnames=("qtype", "cfg"))
def _solve_with_init(
    W32: jax.Array,
    U: jax.Array,
    col_group: jax.Array,
    col_sg: jax.Array,
    qtype: GGMLQuantizationType,
    cfg: GPTQConfig,
):
    """Jitted: static group init (when enabled) + blocked solve + output cast."""
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = W32.shape
    n_sg = d_col // spec.super_group_size
    ng = d_col // spec.group_size
    if cfg.static_groups:
        p0 = kquant.fit_supergroups(W32, qtype, cfg.scale_cfg)
        init_params = _params_f32(p0)
    else:
        init_params = (
            jnp.zeros((d_row, n_sg), jnp.float32),
            jnp.zeros((d_row, n_sg), jnp.float32),
            jnp.zeros((d_row, ng), jnp.float32),
            jnp.zeros((d_row, ng), jnp.float32),
        )
    qweight, params = _solve_core(W32, U, col_group, col_sg, init_params, qtype, cfg)
    ss, sz, sq, zq = params
    int_dtype = jnp.int8 if spec.signed else jnp.uint8
    return qweight.astype(int_dtype), SuperGroupParams(
        ss.astype(jnp.float16), sz.astype(jnp.float16),
        sq.astype(int_dtype), zq.astype(int_dtype),
    )


def gptq_quantize_matrix(
    W: jax.Array,
    H: jax.Array,
    qtype: GGMLQuantizationType,
    cfg: GPTQConfig = GPTQConfig(),
    factorize: str = "auto",
) -> GPTQResult:
    """Quantize one weight matrix with GPTQ error correction.

    Equivalent of reference GPTQ.quantize (gptq.py:146-302). The Cholesky
    factorization runs on device or host LAPACK (``factorize``: auto |
    device | host — auto switches to host above HOST_FACTORIZE_THRESHOLD
    columns); everything else is one jitted XLA program. W: (d_row, d_col)
    float; H: (d_col, d_col) accumulated Hessian (already averaged across
    data-parallel shards by the caller).
    """
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = W.shape
    sgs = spec.super_group_size

    # Q3_K: act_order / static_groups forced off (gptq.py:204-206)
    if qtype == GGMLQuantizationType.Q3_K:
        cfg = cfg._replace(act_order=False, static_groups=False)
    if cfg.act_order and not cfg.static_groups:
        raise ValueError("act_order requires static_groups (gptq.py:45-46)")

    group_of_col = jnp.arange(d_col, dtype=jnp.int32) // spec.group_size
    sg_of_col = jnp.arange(d_col, dtype=jnp.int32) // sgs

    if cfg.act_order:
        # permute columns by descending Hessian diagonal (gptq.py:211-216);
        # the static scale init below still sees the permuted weights only
        # through per-column group ids, matching the reference (which fits
        # static scales pre-permutation, gptq.py:184-196): we therefore fit
        # on the unpermuted masked weights first.
        W_masked, _ = _mask_and_damp(H, W, cfg.rel_damp)
        perm = jnp.argsort(-jnp.diagonal(H), stable=True)
        Wp = W_masked[:, perm]
        Hp = H[perm][:, perm]
        W32, Hd = _mask_and_damp(Hp, Wp, cfg.rel_damp)
        U, issue = factorize_hinv_cholesky(Hd, factorize)
        col_group = group_of_col[perm]
        col_sg = sg_of_col[perm]
        if cfg.static_groups:
            # fit on unpermuted weights, exactly like the reference
            p0 = kquant.fit_supergroups(W_masked, qtype, cfg.scale_cfg)
            init_params = _params_f32(p0)
            qweight, params = _solve_core(W32, U, col_group, col_sg, init_params, qtype, cfg)
            ss, sz, sq, zq = params
            int_dtype = jnp.int8 if spec.signed else jnp.uint8
            qweight = qweight.astype(int_dtype)
            result_params = SuperGroupParams(
                ss.astype(jnp.float16), sz.astype(jnp.float16),
                sq.astype(int_dtype), zq.astype(int_dtype),
            )
        else:
            qweight, result_params = _solve_with_init(W32, U, col_group, col_sg, qtype, cfg)
        invperm = jnp.argsort(perm)
        qweight = qweight[:, invperm]
        return GPTQResult(qweight, result_params, issue)

    W32, Hd = _mask_and_damp(H, W, cfg.rel_damp)
    U, issue = factorize_hinv_cholesky(Hd, factorize)
    qweight, result_params = _solve_with_init(
        W32, U, group_of_col, sg_of_col, qtype, cfg
    )
    return GPTQResult(qweight, result_params, issue)
