"""Pallas flash-decode over a paged KV cache.

The XLA paged path (serving/paged.py) gathers EVERY page a slot owns into a
contiguous (B, nKV, max_len, hd) buffer each layer — HBM traffic scales with
the provisioned maximum, not the live context. This kernel walks the block
table directly: for each (slot, kv-head) it DMAs only the live pages from
the shared pools into a double-buffered VMEM scratch and folds them into an
online-softmax accumulator, so decode KV traffic is exactly
``ceil((len+1)/page)`` pages per head.

The reference has no paged serving at all (it hands GGUFs to llama.cpp,
whose CPU path reads a contiguous cache); this is the TPU-native analogue of
vLLM's paged attention, shaped for Mosaic:

  * grid (B, nKV, pages_per_slot), page index innermost so the accumulator
    lives in VMEM scratch across grid steps;
  * block tables + lengths ride scalar prefetch, page ids index manual
    HBM->VMEM ``make_async_copy`` calls (dead pages are never fetched);
  * scores keep heads-per-group on the sublane axis and page positions on
    the lane axis, so every reduction is a lane reduction.

Decode only (one query token per slot); prefill keeps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The sliding-window / attention-sink kernel variants are exact in interpret
# mode; flip this after a real-TPU smoke run of those variants (the plain
# variant is TPU-validated at 7e-7 max err).
EXTENDED_ON_TPU = False


def _kernel(table_ref, len_ref, q_ref, sinks_ref, kp_ref, vp_ref, out_ref,
            kbuf, vbuf, acc, m_sc, l_sc, ksem, vsem, *, page, pps, scale,
            window, has_sinks, softcap):
    b = pl.program_id(0)
    kv = pl.program_id(1)
    p = pl.program_id(2)
    G = q_ref.shape[2]
    length = len_ref[b]  # query position; cache holds positions [0, length]
    n_live = length // page + 1
    # sliding window: positions in (length - window, length]; pages wholly
    # below the window never leave HBM
    p_start = (jnp.maximum(length - window + 1, 0) // page) if window else 0

    def start_copy(i, slot):
        pid = jnp.maximum(table_ref[b * pps + i], 0)
        pltpu.make_async_copy(
            kp_ref.at[pid, :, kv, :], kbuf.at[slot], ksem.at[slot]
        ).start()
        pltpu.make_async_copy(
            vp_ref.at[pid, :, kv, :], vbuf.at[slot], vsem.at[slot]
        ).start()

    @pl.when(p == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, -1e30)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc[...] = jnp.zeros_like(acc)

    @pl.when(p == p_start)
    def _():
        start_copy(p, jax.lax.rem(p, 2))

    @pl.when((p >= p_start) & (p < n_live))
    def _():
        slot = jax.lax.rem(p, 2)
        pltpu.make_async_copy(
            kp_ref.at[0, :, kv, :], kbuf.at[slot], ksem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            vp_ref.at[0, :, kv, :], vbuf.at[slot], vsem.at[slot]
        ).wait()

        @pl.when(p + 1 < n_live)
        def _():
            start_copy(p + 1, jax.lax.rem(p + 1, 2))

        qv = q_ref[0, 0].astype(jnp.float32) * scale            # (G, hd)
        k = kbuf[slot].astype(jnp.float32)                      # (page, hd)
        v = vbuf[slot].astype(jnp.float32)
        # (G, page): heads on sublanes, positions on lanes
        s = jax.lax.dot_general(
            qv, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if softcap:  # gemma2 logit softcapping, before masking (HF order)
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        pos = p * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = pos <= length
        if window:
            valid = valid & (pos > length - window)
        s = jnp.where(valid, s, -1e30)

        m_old = m_sc[0:G, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        probs = jnp.exp(s - m_new)                              # (G, page)
        l_sc[0:G, 0:1] = l_sc[0:G, 0:1] * corr + jnp.sum(
            probs, axis=1, keepdims=True
        )
        acc[0:G, :] = acc[0:G, :] * corr + jnp.dot(
            probs, v, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_sc[0:G, 0:1] = m_new

    @pl.when(p == pps - 1)
    def _():
        l = l_sc[0:G, 0:1]
        if has_sinks:  # gpt-oss: per-head sink mass joins the denominator
            sk = sinks_ref[0, 0:G].astype(jnp.float32)[:, None]
            l = l + jnp.exp(sk - m_sc[0:G, 0:1])
        out_ref[0, 0] = acc[0:G, :] / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "window", "softcap")
)
def paged_flash_decode(q, k_pages, v_pages, table, lengths, *,
                       scale: float, interpret: bool = False,
                       window: int = 0, sinks=None, softcap: float = 0.0):
    """Decode attention straight off the page pools.

    q: (B, nKV, G, hd) single query token per slot (pre-norm, un-scaled).
    k_pages/v_pages: (n_pages, page, nKV, hd) shared pools.
    table: (B, pages_per_slot) int32 page ids (-1 = unassigned).
    lengths: (B,) int32 query positions (cache holds [0, lengths[b]]).
    window: sliding-window size (0 = full attention) — pages wholly below
    the window are never fetched. sinks: optional (nH,) gpt-oss sink logits.
    softcap: gemma2 attn logit softcapping (0 = off).
    Returns (B, nKV, G, hd) f32.
    """
    B, nKV, G, hd = q.shape
    n_pages, page, _, _ = k_pages.shape
    pps = table.shape[1]
    rows = max(8, G)
    has_sinks = sinks is not None
    sk = (jnp.asarray(sinks, jnp.float32).reshape(nKV, G) if has_sinks
          else jnp.zeros((nKV, G), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nKV, pps),
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), lambda b, kv, p, *_: (b, kv, 0, 0)),
            pl.BlockSpec((1, G), lambda b, kv, p, *_: (kv, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, hd), lambda b, kv, p, *_: (b, kv, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, page, hd), k_pages.dtype),
            pltpu.VMEM((2, page, hd), v_pages.dtype),
            pltpu.VMEM((rows, hd), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, page=page, pps=pps, scale=scale,
                               window=int(window or 0), has_sinks=has_sinks,
                               softcap=float(softcap or 0.0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nKV, G, hd), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(table.reshape(-1), lengths, q, sk, k_pages, v_pages)
