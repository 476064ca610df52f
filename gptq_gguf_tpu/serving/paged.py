"""Paged KV cache: block-table attention for long-context serving.

Round-1 served from a contiguous per-slot ring (B, nKV, max_len, hd), which
preallocates worst-case memory for every slot. Here K/V live in shared page
pools and each slot owns a list of pages (vLLM-style block tables), so
memory scales with *actual* context and freed pages recycle across requests
— the serving north star the reference outsources to llama.cpp.

Functional core (this module) + a host-side page allocator
(engine.PagedContinuousBatchingEngine). The attention itself gathers the
slot's pages into the same masked-softmax primitive the contiguous path
uses, so numerics are identical; a Pallas flash-decode kernel over pages is
the perf follow-up.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.llama import LlamaConfig
from ..ops import paged_attention
from . import model as qmodel
from .model import _q_linear, _QUANT_TYPES, _dequant_any


class PagedKVCache(NamedTuple):
    """bf16 caches: k_pages/v_pages hold (n_pages, nKV, page_size, hd)
    K / V pages; k_s_pages/v_s_pages are None.

    int4 caches (round 5 COMBINED layout — every Pallas DMA slice must be
    tile-aligned on real TPU, ops/paged_attention module docstring):
    ``k_pages`` holds the combined packed codes (n_pages, nKV, page, hd)
    u8 — k's codes in lanes [0, hd/2), v's in [hd/2, hd) — and
    ``v_pages`` holds the combined group scales
    (n_pages, nKV, 2*hd/KV_Q4_GROUP, page) f32 — k groups on the sublane
    axis first, POSITIONS ON LANES. k_s_pages/v_s_pages stay None; int4
    is detected by the uint8 code dtype (`q4` property). Generic
    field-forwarding code (engine slot masking, TP sharding specs) works
    unchanged: both pools keep n_pages/nKV as leading axes."""

    k_pages: List[jax.Array]
    v_pages: List[jax.Array]
    page_table: jax.Array     # (B, pages_per_slot) int32, -1 = unassigned
    lengths: jax.Array        # (B,) int32
    k_s_pages: Optional[List[jax.Array]] = None
    v_s_pages: Optional[List[jax.Array]] = None

    @property
    def q4(self) -> bool:
        return self.k_pages[0].dtype == jnp.uint8

    @property
    def page_size(self) -> int:
        return self.k_pages[0].shape[2]

    @property
    def max_len(self) -> int:
        return self.page_table.shape[1] * self.page_size


def init_paged_cache(
    cfg: LlamaConfig,
    batch: int,
    max_len: int,
    page_size: int = 64,
    n_pages: Optional[int] = None,
    dtype=jnp.bfloat16,
    kv_dtype: Optional[str] = None,
) -> PagedKVCache:
    """n_pages defaults to full provisioning (batch * max_len / page_size);
    pass less to oversubscribe — the engine then admits only what fits.
    kv_dtype="int4": packed-code pools + group-scale pools (3.2x less page
    memory; the paged analogue of serving/model.KVCacheQ4)."""
    assert max_len % page_size == 0
    pages_per_slot = max_len // page_size
    if n_pages is None:
        n_pages = batch * pages_per_slot
    hd = cfg.head_dim_
    n = cfg.num_hidden_layers
    if kv_dtype == "int4":
        from ..models.llama import KV_Q4_GROUP

        if hd % (2 * KV_Q4_GROUP):
            raise NotImplementedError(
                f"int4 paged KV needs head_dim divisible by "
                f"{2 * KV_Q4_GROUP}, got {hd}")
        # combined layout (PagedKVCache docstring): one code pool + one
        # transposed scale pool per layer
        shape_c = (n_pages, cfg.num_key_value_heads, page_size, hd)
        shape_s = (n_pages, cfg.num_key_value_heads,
                   2 * hd // KV_Q4_GROUP, page_size)
        return PagedKVCache(
            [jnp.zeros(shape_c, jnp.uint8) for _ in range(n)],
            [jnp.zeros(shape_s, jnp.float32) for _ in range(n)],
            jnp.full((batch, pages_per_slot), -1, jnp.int32),
            jnp.zeros((batch,), jnp.int32),
        )
    elif kv_dtype not in (None, "bf16"):
        raise ValueError(f"unsupported paged kv_dtype {kv_dtype!r}")
    shape = (n_pages, cfg.num_key_value_heads, page_size, hd)
    return PagedKVCache(
        [jnp.zeros(shape, dtype) for _ in range(n)],
        [jnp.zeros(shape, dtype) for _ in range(n)],
        jnp.full((batch, pages_per_slot), -1, jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


def _write_paged(pool: jax.Array, table: jax.Array, positions: jax.Array,
                 vals: jax.Array) -> jax.Array:
    """Scatter (B, S, nKV, hd) vals at absolute positions into the pools.

    positions: (B, S). Unassigned pages (-1) scatter to a dropped index.
    """
    page_size = pool.shape[2]
    page_idx = positions // page_size                      # (B, S)
    page_ids = jnp.take_along_axis(table, page_idx, axis=1)  # (B, S)
    offs = positions % page_size
    page_ids = jnp.where(page_ids < 0, pool.shape[0], page_ids)  # drop
    return pool.at[page_ids, :, offs, :].set(
        vals.astype(pool.dtype), mode="drop"
    )


def _write_paged_t(pool: jax.Array, table: jax.Array, positions: jax.Array,
                   vals: jax.Array) -> jax.Array:
    """_write_paged for the TRANSPOSED scale pools: pool
    (n_pages, nKV, ng2, page) with positions on the LAST axis; vals
    (B, S, nKV, ng2)."""
    page_size = pool.shape[3]
    page_idx = positions // page_size
    page_ids = jnp.take_along_axis(table, page_idx, axis=1)  # (B, S)
    offs = positions % page_size
    page_ids = jnp.where(page_ids < 0, pool.shape[0], page_ids)
    return pool.at[page_ids, :, :, offs].set(
        vals.astype(pool.dtype), mode="drop"
    )


def _gather_slot_scales_t(pool: jax.Array, table: jax.Array) -> jax.Array:
    """(n_pages, nKV, ng2, page) + (B, pps) -> (B, nKV, pps*page, ng2)."""
    safe = jnp.maximum(table, 0)
    g = pool[safe]  # (B, pps, nKV, ng2, page)
    B, pps, nKV, ng2, page = g.shape
    return g.transpose(0, 2, 1, 4, 3).reshape(B, nKV, pps * page, ng2)


def _gather_slot_kv(pool: jax.Array, table: jax.Array) -> jax.Array:
    """(n_pages, nKV, page, hd) + (B, pps) -> (B, nKV, pps*page, hd)."""
    safe = jnp.maximum(table, 0)
    g = pool[safe]  # (B, pps, nKV, page, hd)
    B, pps, nKV, page, hd = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, nKV, pps * page, hd)


def forward_paged(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    input_ids: jax.Array,
    cache: PagedKVCache,
    n_valid: Optional[jax.Array] = None,
    psum_axis: Optional[str] = None,
) -> Tuple[jax.Array, PagedKVCache]:
    """forward_cached over a paged cache — same numerics, block-table K/V.

    Mirrors serving/model.forward_cached; see that docstring for n_valid
    semantics. psum_axis: set inside a shard_map over a tensor-parallel
    mesh axis (parallel/tp_serving.tp_paged_decode_step) — page pools are
    sharded over the kv-head axis, projections Megatron-style.
    """
    B, S = input_ids.shape
    hd = cfg.head_dim_
    lengths = cache.lengths
    positions = lengths[:, None] + jnp.arange(S)[None, :]
    cos, sin = llama.rope_cos_sin_all(cfg, positions, seq_len=cache.max_len)

    x = params["embed_tokens"]
    if psum_axis is not None and not isinstance(x, _QUANT_TYPES):
        # vocab-row-sharded table: offset gather + psum
        v_local = x.shape[0]
        idx = input_ids - jax.lax.axis_index(psum_axis) * v_local
        valid = (idx >= 0) & (idx < v_local)
        x = jnp.where(valid[..., None], x[jnp.clip(idx, 0, v_local - 1)], 0)
        x = jax.lax.psum(x, psum_axis).astype(cfg.dtype)
    else:
        x = (x[input_ids] if not isinstance(x, _QUANT_TYPES)
             else _dequant_any(x)[input_ids]).astype(cfg.dtype)
    if cfg.embed_scale:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), dtype=cfg.dtype)
    au = cfg.rms_add_unit

    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        sliding = cfg.sliding_window if llama.is_sliding_layer(cfg, li) else None
        h = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps, au)
        q = _q_linear(h, layer["q_proj"])
        k = _q_linear(h, layer["k_proj"])
        v = _q_linear(h, layer["v_proj"])
        if layer.get("q_bias") is not None:
            q = q + layer["q_bias"]
            k = k + layer["k_bias"]
            v = v + layer["v_bias"]
        nH = q.shape[-1] // hd
        nKV = k.shape[-1] // hd
        q = q.reshape(B, S, nH, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nKV, hd)
        v = v.reshape(B, S, nKV, hd)
        if cfg.qk_norm:
            q = llama.rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
            k = llama.rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
        cos_l, sin_l = llama.select_rope(cos, sin, cfg, li)
        qr, kr = llama.apply_rope(q, k.transpose(0, 2, 1, 3), cos_l, sin_l)
        k = kr.transpose(0, 2, 1, 3)

        q4 = cache.q4
        if q4:
            kq, ks = qmodel._quantize_kv_q4(k)
            vq, vs = qmodel._quantize_kv_q4(v)
            # combined layout: codes concat on lanes, scales concat on the
            # group axis and scattered with positions-on-lanes
            c_pool = _write_paged(cache.k_pages[li], cache.page_table,
                                  positions,
                                  jnp.concatenate([kq, vq], axis=-1))
            s_pool = _write_paged_t(cache.v_pages[li], cache.page_table,
                                    positions,
                                    jnp.concatenate([ks, vs], axis=-1))
            k_pool, v_pool = c_pool, s_pool
        else:
            k_pool = _write_paged(cache.k_pages[li], cache.page_table, positions, k)
            v_pool = _write_paged(cache.v_pages[li], cache.page_table, positions, v)
        new_k.append(k_pool)
        new_v.append(v_pool)

        att_scale = (
            cfg.query_pre_attn_scalar ** -0.5
            if cfg.query_pre_attn_scalar is not None
            else None
        )
        on_tpu = jax.devices()[0].platform == "tpu"
        interpret = qmodel.qmatmul.FORCE_PALLAS_INTERPRET and not on_tpu
        # every kernel variant (window/sinks/softcap) is TPU-validated
        # (scripts/paged_smoke_tpu.py, docs/PAGED_SMOKE_r04.json), so
        # gemma2/gpt-oss-style paged decode takes the Pallas path on TPU;
        # the gate stays as an escape hatch for new variants
        ext_ok = interpret or paged_attention.EXTENDED_ON_TPU
        plain = (sliding is None and "sinks" not in layer
                 and not cfg.attn_logit_softcap)
        # int4 pools: the combined-layout kernel needs tile-aligned DMA
        # slices on real TPU (hd % 128, page % 128); other shapes (or a
        # flipped Q4_KERNEL_ON_TPU escape hatch) take the XLA gather path
        q4_ok = not q4 or (
            (interpret and hd % 64 == 0)  # interpret: no tiling rules
            or (paged_attention.Q4_KERNEL_ON_TPU
                and paged_attention.q4_kernel_supported(cache.page_size, hd)))
        if S == 1 and (on_tpu or interpret) and (plain or ext_ok) and q4_ok:
            # Pallas flash-decode walks the block table: only live pages
            # leave HBM (the gather path below copies the full provisioned
            # cache every layer); sliding windows skip out-of-window pages
            qk = qr[:, :, 0].reshape(B, nKV, nH // nKV, hd)
            fd_kw = dict(
                scale=float(att_scale if att_scale is not None
                            else 1.0 / math.sqrt(hd)),
                interpret=interpret, window=int(sliding or 0),
                sinks=layer.get("sinks"),
                softcap=float(cfg.attn_logit_softcap or 0.0),
            )
            if q4:
                attn = paged_attention.paged_flash_decode_q4(
                    qk, k_pool, v_pool, cache.page_table, lengths, **fd_kw)
            else:
                attn = paged_attention.paged_flash_decode(
                    qk, k_pool, v_pool, cache.page_table, lengths, **fd_kw)
            attn = attn.reshape(B, nH, S, hd).astype(qr.dtype)
        else:
            if q4:
                codes = _gather_slot_kv(k_pool, cache.page_table)
                scales = _gather_slot_scales_t(v_pool, cache.page_table)
                ngk = hd // llama.KV_Q4_GROUP
                k_all = llama.dequant_kv_q4(
                    codes[..., : hd // 2], scales[..., :ngk])
                v_all = llama.dequant_kv_q4(
                    codes[..., hd // 2:], scales[..., ngk:])
            else:
                k_all = _gather_slot_kv(k_pool, cache.page_table)
                v_all = _gather_slot_kv(v_pool, cache.page_table)
            attn = qmodel._cached_attention(
                qr, k_all, v_all, lengths, att_scale, cfg.attn_logit_softcap,
                sliding, sinks=layer.get("sinks"),
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nH * hd)
        attn_out = _q_linear(attn, layer["o_proj"])
        if psum_axis is not None:
            attn_out = jax.lax.psum(attn_out, psum_axis)
        gemma2_norms = "pre_feedforward_layernorm" in layer
        if gemma2_norms:
            attn_out = llama.rms_norm(attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps, au)
        x = x + attn_out

        norm_key = "pre_feedforward_layernorm" if gemma2_norms else "post_attention_layernorm"
        h = llama.rms_norm(x, layer[norm_key], cfg.rms_norm_eps, au)
        if "gate_inp" in layer:  # sparse MoE FFN (dense float experts)
            mlp_out, _ = llama.moe_ffn(h, layer, cfg)
        else:
            gate = _q_linear(h, layer["gate_proj"])
            up = _q_linear(h, layer["up_proj"])
            act = llama._mlp_act(gate, up, cfg)
            mlp_out = _q_linear(act, layer["down_proj"])
        if psum_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, psum_axis)
        if gemma2_norms:
            mlp_out = llama.rms_norm(mlp_out, layer["post_feedforward_layernorm"], cfg.rms_norm_eps, au)
        x = x + mlp_out

    if n_valid is None:
        last = x[:, -1, :]
        advance = S
    else:
        last = x[jnp.arange(B), n_valid - 1, :]
        advance = n_valid
    h = llama.rms_norm(last, params["norm"], cfg.rms_norm_eps, au)
    head = params.get("lm_head", params["embed_tokens"])
    if isinstance(head, _QUANT_TYPES):
        logits = qmodel.qmatmul.dequant_matmul(h, head)
        if psum_axis is None and logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]  # drop pad_dout_v2 rows
    else:
        logits = jnp.einsum("bi,oi->bo", h, head, preferred_element_type=jnp.float32)
    if psum_axis is not None:
        # vocab-sharded logits: tiled all_gather back to the full vocab
        logits = jax.lax.all_gather(logits, psum_axis, axis=1, tiled=True)
        if logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]  # pad lives in last shard
    if cfg.final_logit_softcap:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits, PagedKVCache(new_k, new_v, cache.page_table,
                                lengths + advance,
                                new_ks or None, new_vs or None)


class PageAllocator:
    """Host-side free-list over the shared page pools."""

    def __init__(self, n_pages: int):
        self.free: List[int] = list(range(n_pages - 1, -1, -1))

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, pages) -> None:
        for p in pages:
            if p >= 0:
                self.free.append(int(p))

    @property
    def available(self) -> int:
        return len(self.free)
