"""Quantized serving model: KV-cached decoder over runtime-packed weights.

The reference's serving story is "hand the .gguf to llama.cpp"
(README.md:325); this module is the TPU-native engine replacing it. Weights
stay packed (ops/qmatmul.RuntimeQuantLinear) and are dequantized inside the
fused matmul kernel; the KV cache is a preallocated per-layer ring of
(B, n_kv, max_len, hd) arrays updated functionally under jit.

A quantized model can be built from three sources:
  * an HF checkpoint + calibration artifacts dir (our pipeline output)
  * a .gguf file directly (bit-exact unpack via formats/) — anything
    llama.cpp can serve, we can serve
  * float params (debug; packs nothing)
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import convert
from ..formats.ggml import KQUANT_SPECS, K_QUANT_TYPES
from ..models import llama
from ..models.llama import LlamaConfig
from ..ops import qmatmul, qmv4
from ..ops.kquant import SuperGroupParams


_QUANT_TYPES = (qmatmul.RuntimeQuantLinear, qmatmul.RuntimeQuantLinearV2,
                qmv4.RuntimeQuantLinearV4)


def _dequant_any(w) -> jax.Array:
    if isinstance(w, qmv4.RuntimeQuantLinearV4):
        return qmv4.dequantize_runtime_v4(w)
    if isinstance(w, qmatmul.RuntimeQuantLinearV2):
        return qmatmul.dequantize_runtime_v2(w)
    return qmatmul.dequantize_runtime(w)


def _q_linear(x: jax.Array, w) -> jax.Array:
    """Apply either a packed quantized weight (v1/v2) or a dense matrix."""
    if isinstance(w, _QUANT_TYPES):
        shape = x.shape[:-1]
        y = qmatmul.dequant_matmul(x.reshape(-1, x.shape[-1]), w)
        return y.reshape(*shape, w.d_out).astype(x.dtype)
    return jnp.einsum(
        "...i,oi->...o", x, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _moe_q_ffn(h: jax.Array, layer: Dict[str, Any], cfg: LlamaConfig) -> jax.Array:
    """Sparse-MoE FFN over packed (quantized) expert stacks.

    Two regimes, chosen statically from the token count:
      * decode (few tokens): gather only the routed experts' packed planes
        from HBM per token — traffic ∝ T x top_k expert reads instead of E.
      * prefill (many tokens): lax.scan over experts, each through the fused
        dequant-matmul (every expert read exactly once).
    Falls back to llama.moe_ffn for dense float expert stacks."""
    eg = layer["experts_gate"]
    if not isinstance(eg, qmatmul.StackedQuantLinearV2):
        return llama.moe_ffn(h, layer, cfg)[0]
    eu, ed = layer["experts_up"], layer["experts_down"]
    B, S, H = h.shape
    E, k = eg.n_experts, cfg.moe_top_k
    wmap, topw, topi = llama.moe_route(h, layer, cfg, E)
    T = B * S
    bg, bu, bd = (layer.get("experts_gate_bias"), layer.get("experts_up_bias"),
                  layer.get("experts_down_bias"))  # gpt-oss per-expert biases
    if T * k < E:  # decode: strictly fewer expert-plane reads than a sweep
        xt = h.reshape(T, H)
        ti = topi.reshape(T, k)
        tw = topw.reshape(T, k)
        out = jnp.zeros((T, ed.d_out), jnp.float32)
        for j in range(k):
            g = qmatmul.gathered_expert_matmul(xt, eg, ti[:, j])
            u = qmatmul.gathered_expert_matmul(xt, eu, ti[:, j])
            if bg is not None:
                g = g + bg[ti[:, j]]
                u = u + bu[ti[:, j]]
            act = llama._mlp_act(g.astype(h.dtype), u.astype(h.dtype), cfg)
            d = qmatmul.gathered_expert_matmul(act, ed, ti[:, j])
            if bd is not None:
                d = d + bd[ti[:, j]]
            out = out + tw[:, j, None] * d
        out = out.reshape(B, S, ed.d_out).astype(h.dtype)
    else:
        def body(acc, leaves):
            if bg is not None:
                lg, lu, ld, lbg, lbu, lbd, we_w = leaves
            else:
                lg, lu, ld, we_w = leaves
                lbg = lbu = lbd = 0.0
            g = _q_linear(h, eg.make_expert(lg)) + lbg
            u = _q_linear(h, eu.make_expert(lu)) + lbu
            act = llama._mlp_act(g, u, cfg)
            d = _q_linear(act, ed.make_expert(ld)) + lbd
            return acc + we_w[..., None].astype(d.dtype) * d, None

        acc0 = jnp.zeros((B, S, ed.d_out), h.dtype)
        xs = (eg.fields(), eu.fields(), ed.fields()) + (
            (bg, bu, bd) if bg is not None else ()
        ) + (wmap.transpose(2, 0, 1),)
        out, _ = jax.lax.scan(body, acc0, xs)
    if "shared_gate" in layer:
        g = _q_linear(h, layer["shared_gate"])
        u = _q_linear(h, layer["shared_up"])
        act = llama._mlp_act(g, u, cfg)
        shared = _q_linear(act, layer["shared_down"])
        if "shared_gate_inp" in layer:
            gate = jax.nn.sigmoid(
                jnp.einsum("bsh,oh->bso", h.astype(jnp.float32),
                           layer["shared_gate_inp"].astype(jnp.float32))
            )
            shared = shared * gate.astype(shared.dtype)
        out = out + shared
    return out


class KVCache(NamedTuple):
    k: List[jax.Array]  # per layer (B, n_kv, max_len, hd)
    v: List[jax.Array]
    lengths: jax.Array  # (B,) int32: tokens already cached per slot


class KVCacheQ8(NamedTuple):
    """int8 KV cache: per-(slot, head, position) symmetric scales.

    Halves KV memory and HBM decode traffic vs bf16 (hd + 4 bytes per entry
    instead of 2*hd); the llama.cpp analogue is --cache-type-k/v q8_0."""

    k: List[jax.Array]    # per layer (B, n_kv, max_len, hd) int8
    v: List[jax.Array]
    k_s: List[jax.Array]  # per layer (B, n_kv, max_len) f32
    v_s: List[jax.Array]
    lengths: jax.Array


# int4 KV group size: one symmetric f32 scale per KV_Q4_GROUP consecutive
# head-dim features (per slot, head, position)
KV_Q4_GROUP = llama.KV_Q4_GROUP


class KVCacheQ4(NamedTuple):
    """int4 KV cache: two codes per byte, per-group symmetric scales.

    80 bytes per 128-dim entry (64 code bytes + 4 f32 group scales) vs 256
    bf16 — 3.2x less KV memory and decode HBM traffic. Group scales (not
    the int8 cache's per-entry scale) keep the 15-level grid usable: the
    llama.cpp analogue is --cache-type-k/v q4_0 (gs=32 there too).
    Layout: feature j < hd/2 sits in byte j's low nibble, feature
    j >= hd/2 in byte (j - hd/2)'s high nibble (split, not interleaved —
    unpack is two shifts + one concat, no lane shuffles)."""

    k: List[jax.Array]    # per layer (B, n_kv, max_len, hd // 2) uint8
    v: List[jax.Array]
    k_s: List[jax.Array]  # per layer (B, n_kv, max_len, hd // 32) f32
    v_s: List[jax.Array]
    lengths: jax.Array


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               quantized: bool = False, kv_dtype: Optional[str] = None):
    """kv_dtype: None/"bf16" (use ``dtype``), "int8", or "int4";
    ``quantized=True`` is the legacy spelling of kv_dtype="int8"."""
    if kv_dtype in (None, "bf16"):
        quantized = quantized
    elif kv_dtype == "int8":
        quantized = True
    elif kv_dtype == "int4":
        if cfg.kv_lora_rank:
            raise NotImplementedError(
                "int4 KV is unsupported for MLA caches (compressed entries "
                "are precision-critical); use int8")
        hd = cfg.head_dim_
        if hd % (2 * KV_Q4_GROUP):
            raise NotImplementedError(
                f"int4 KV needs head_dim divisible by {2 * KV_Q4_GROUP}, "
                f"got {hd}")
        shape_q = (batch, cfg.num_key_value_heads, max_len, hd // 2)
        shape_s = (batch, cfg.num_key_value_heads, max_len, hd // KV_Q4_GROUP)
        n4 = cfg.num_hidden_layers
        return KVCacheQ4(
            [jnp.zeros(shape_q, jnp.uint8) for _ in range(n4)],
            [jnp.zeros(shape_q, jnp.uint8) for _ in range(n4)],
            [jnp.zeros(shape_s, jnp.float32) for _ in range(n4)],
            [jnp.zeros(shape_s, jnp.float32) for _ in range(n4)],
            jnp.zeros((batch,), jnp.int32),
        )
    else:
        raise ValueError(f"unknown kv_dtype {kv_dtype!r}")
    n = cfg.num_hidden_layers
    if cfg.kv_lora_rank:
        # MLA (deepseek2): cache ONE compressed entry per token — the rope'd
        # shared k_pe concatenated onto c_kv. V is the c_kv prefix of the same
        # entry, so no separate V storage (llama.cpp's MQA conversion stores
        # both; this halves MLA cache memory vs that).
        shape = (batch, 1, max_len, cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        if quantized:
            # int8 compressed entries with one scale per (slot, position);
            # V is a prefix view of K so it shares codes and scales
            return KVCacheQ8(
                [jnp.zeros(shape, jnp.int8) for _ in range(n)],
                [jnp.zeros((0,), jnp.int8) for _ in range(n)],
                [jnp.zeros(shape[:3], jnp.float32) for _ in range(n)],
                [jnp.zeros((0,), jnp.float32) for _ in range(n)],
                jnp.zeros((batch,), jnp.int32),
            )
        return KVCache(
            [jnp.zeros(shape, dtype) for _ in range(n)],
            [jnp.zeros((0,), dtype) for _ in range(n)],  # unused placeholder
            jnp.zeros((batch,), jnp.int32),
        )
    hd = cfg.head_dim_
    shape = (batch, cfg.num_key_value_heads, max_len, hd)
    if quantized:
        return KVCacheQ8(
            [jnp.zeros(shape, jnp.int8) for _ in range(n)],
            [jnp.zeros(shape, jnp.int8) for _ in range(n)],
            [jnp.zeros(shape[:3], jnp.float32) for _ in range(n)],
            [jnp.zeros(shape[:3], jnp.float32) for _ in range(n)],
            jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        [jnp.zeros(shape, dtype) for _ in range(n)],
        [jnp.zeros(shape, dtype) for _ in range(n)],
        jnp.zeros((batch,), jnp.int32),
    )


def _quantize_kv(x: jax.Array):
    """(B, S, nKV, hd) -> (int8 codes, (B, S, nKV) f32 scales), symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = amax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]), -127, 127)
    return q.astype(jnp.int8), s


def _quantize_kv_q4(x: jax.Array):
    """(..., hd) -> (uint8 packed codes (..., hd//2), f32 group scales
    (..., hd//KV_Q4_GROUP)), symmetric per group of KV_Q4_GROUP features.

    Packing is split-layout (KVCacheQ4 docstring): low nibbles hold the
    first hd/2 features, high nibbles the rest."""
    gs = KV_Q4_GROUP
    hd = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], hd // gs, gs)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = amax / 7.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -7, 7).astype(jnp.int32)
    q = (q + 8).reshape(*x.shape[:-1], hd).astype(jnp.uint8)
    lo, hi = q[..., : hd // 2], q[..., hd // 2 :]
    return (lo | (hi << 4)), s


# inverse of _quantize_kv_q4 (lives next to flash_attention, which
# dequantizes chunks in-register)
_dequant_kv_q4 = llama.dequant_kv_q4


def _cached_attention(q, k_cache, v_cache, lengths, scale=None, logit_softcap=None,
                      sliding_window=None, k_scale=None, v_scale=None,
                      sinks=None, alibi=None, bidir_spans=None):
    """q: (B, nH, S, hd); caches (B, nKV, L, hd); slot b's queries sit at
    positions lengths[b] + [0, S).

    Long contexts stream through the online-softmax (flash) path instead of
    materializing (B, nKV, G, S, L) scores (round-1 weak spot #5).
    k_scale/v_scale: per-entry scales of an int8 KV cache (B, nKV, L), or
    per-group scales of an int4 cache (B, nKV, L, hd//KV_Q4_GROUP)."""
    B, nH, S, hd = q.shape
    nKV = k_cache.shape[1]
    L = k_cache.shape[2]
    if L >= 2 * llama.FLASH_CHUNK and bidir_spans is None:
        qpos = lengths[:, None] + jnp.arange(S)[None, :]
        # decode (S == 1): only read KV chunks up to the live fill level
        return llama.flash_attention(
            q, k_cache, v_cache, qpos, scale, logit_softcap, sinks,
            sliding_window, dynamic_length=(S == 1), k_scale=k_scale,
            v_scale=v_scale,
        ).astype(q.dtype)
    if k_scale is not None and k_scale.ndim == 4:  # int4 packed cache
        k_cache = _dequant_kv_q4(k_cache, k_scale)
        v_cache = _dequant_kv_q4(v_cache, v_scale)
    elif k_scale is not None:
        k_cache = k_cache.astype(jnp.float32) * k_scale[..., None]
        v_cache = v_cache.astype(jnp.float32) * v_scale[..., None]
    groups = nH // nKV
    qg = q.reshape(B, nKV, groups, S, hd)
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    scores = jnp.einsum(
        "bkgsh,bkth->bkgst", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale
    if alibi is not None:  # bloom/mpt: per-key-position bias m_h * kpos
        scores = scores + (
            alibi.reshape(nKV, groups)[None, :, :, None, None]
            * jnp.arange(L, dtype=jnp.float32)[None, None, None, None, :]
        )
    if logit_softcap:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    pos = jnp.arange(L)[None, None, :]
    qpos = lengths[:, None, None] + jnp.arange(S)[None, :, None]
    mask = pos <= qpos  # (B, S, L) causal per slot
    if sliding_window:
        mask = mask & ((qpos - pos) < sliding_window)
    if bidir_spans is not None:
        # multimodal image blocks attend bidirectionally within their span
        # (gemma3 token_type_ids semantics); overrides causal AND sliding
        span_k = jnp.zeros((bidir_spans.shape[0], L), bidir_spans.dtype
                           ).at[:, :bidir_spans.shape[1]].set(bidir_spans)
        bm = (bidir_spans[:, :, None] > 0) & (
            bidir_spans[:, :, None] == span_k[:, None, :])
        mask = mask | bm
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    if sinks is not None:  # gpt-oss: sink logit joins the denominator
        sk = sinks.astype(jnp.float32).reshape(nKV, groups)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1), sk)
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(-1) + jnp.exp(sk - m)
        probs = (e / denom[..., None]).astype(v_cache.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum(
        "bkgst,bkth->bkgsh", probs, v_cache, preferred_element_type=jnp.float32
    )
    return out.reshape(B, nH, S, v_cache.shape[-1])


def _mla_cached_attn(layer, cfg, h, k_cache_in, lengths, positions, cos, sin,
                     B, S, bidx, ks_cache_in=None):
    """MLA attention with the absorbed-MQA cache (deepseek2 serving).

    Scores are computed in the compressed space: q_nope is projected through
    k_b (the transposed half of kv_b_proj) so each cached token needs only
    its (kv_lora + rope) entry; the attention output in compressed space is
    decompressed through v_b. Numerically identical scores/outputs to the
    decompressed MHA form (llama.cpp's MLA graph does the same).

    Returns (attn (B, S, nH*v_head_dim), updated k cache)."""
    L_r, dr, dn = cfg.kv_lora_rank, cfg.qk_rope_head_dim, cfg.qk_nope_head_dim
    dv = cfg.v_head_dim
    k_b, v_b = layer["k_b"], layer["v_b"]  # (nH, L_r, dn), (nH, dv, L_r)
    nH = k_b.shape[0]
    if "q_b_proj" in layer:
        qa = _q_linear(h, layer["q_a_proj"])
        qa = llama.rms_norm(qa, layer["q_a_norm"], cfg.rms_norm_eps)
        qf = _q_linear(qa, layer["q_b_proj"])
    else:
        qf = _q_linear(h, layer["q_proj"])
    q = qf.reshape(B, S, nH, dn + dr).transpose(0, 2, 1, 3)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = _q_linear(h, layer["kv_a_proj"])
    c, k_pe = ckv[..., :L_r], ckv[..., L_r:]
    c = llama.rms_norm(c, layer["kv_a_norm"], cfg.rms_norm_eps)
    q_pe, k_pe = llama.apply_rope(
        q_pe, k_pe[:, None], cos, sin, cfg.rope_interleaved
    )
    # absorb q_nope into the compressed space: scores q.k_nope == q_abs.c_kv
    q_abs = jnp.einsum(
        "bhsd,hld->bhsl", q_nope.astype(jnp.float32), k_b.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    q_mqa = jnp.concatenate([q_abs, q_pe.astype(h.dtype)], axis=-1)
    entry = jnp.concatenate(
        [c, k_pe[:, 0].astype(c.dtype)], axis=-1
    )[:, :, None, :]  # (B, S, 1, L_r + dr)
    ks_cache = None
    if ks_cache_in is not None:  # int8 cache: quantize the compressed entry
        eq, es = _quantize_kv(entry)
        k_cache = k_cache_in.at[bidx, :, positions, :].set(eq, mode="drop")
        ks_cache = ks_cache_in.at[bidx, :, positions].set(es, mode="drop")
    else:
        k_cache = k_cache_in.at[bidx, :, positions, :].set(
            entry.astype(k_cache_in.dtype), mode="drop"
        )
    scale = cfg.attention_scale or (dn + dr) ** -0.5
    attn_c = _cached_attention(
        q_mqa, k_cache, k_cache[..., :L_r], lengths, scale,
        k_scale=ks_cache, v_scale=ks_cache,
    )  # (B, nH, S, L_r)
    out = jnp.einsum(
        "bhsl,hdl->bhsd", attn_c.astype(jnp.float32), v_b.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, S, nH * dv), k_cache, ks_cache


def forward_cached(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    input_ids: jax.Array,
    cache: KVCache,
    n_valid: Optional[jax.Array] = None,
    psum_axis: Optional[str] = None,
    all_logits: bool = False,
    embeds_override: Optional[jax.Array] = None,
    override_mask: Optional[jax.Array] = None,
    rope_positions: Optional[jax.Array] = None,
    bidir_spans: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Run S new tokens through the model with the KV cache.

    input_ids: (B, S) — prefill uses S>1, decode S=1. Slot b's new tokens
    land at positions cache.lengths[b] + [0, S). Returns (logits of the
    final position (B, vocab), updated cache).

    n_valid (B,) supports right-padded prefill buckets: only the first
    n_valid[b] tokens are real — logits come from position n_valid[b]-1 and
    lengths advance by n_valid. K/V written at padded positions sit beyond
    the causal mask and are overwritten by subsequent decode steps.

    psum_axis: set inside a shard_map over a tensor-parallel mesh axis; head
    counts are then derived from the *local* projection shapes, partial
    o_proj/down_proj outputs are psum-reduced, and vocab-sharded
    embeddings/lm_head are handled with offset gathers + collectives
    (parallel/tp_serving.py drives this).
    """
    B, S = input_ids.shape
    hd = cfg.head_dim_
    lengths = cache.lengths

    positions = lengths[:, None] + jnp.arange(S)[None, :]
    # longrope models switch factors on the live context length; the cache
    # capacity is the static upper bound of any position used here.
    # rope_positions decouples the rotary position from the cache index:
    # (B, S) plain override, or (3, B, S) qwen2-vl mrope t/h/w streams
    if rope_positions is not None and rope_positions.ndim == 3:
        cos, sin = llama.mrope_cos_sin(cfg, rope_positions)
    else:
        cos, sin = llama.rope_cos_sin_all(
            cfg, positions if rope_positions is None else rope_positions,
            seq_len=cache.k[0].shape[2])

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
    if cfg.pos_type == "learned":  # gpt2 wpe
        x = x + params["pos_embed"][positions].astype(x.dtype)
    if "embed_norm" in params:  # bloom word_embeddings_layernorm
        x = llama.apply_norm(x, cfg, params["embed_norm"],
                             params.get("embed_norm_bias"))
    if cfg.embed_scale:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), dtype=cfg.dtype)
    if cfg.embedding_multiplier is not None:
        x = x * jnp.asarray(cfg.embedding_multiplier, dtype=cfg.dtype)
    if embeds_override is not None:
        # multimodal soft tokens replace the (scaled) text embeddings at the
        # image-token positions (HF masked_scatter semantics: features are
        # NOT embed-scaled)
        x = jnp.where(override_mask[..., None],
                      embeds_override.astype(x.dtype), x)
    au = cfg.rms_add_unit
    alibi = (jnp.asarray(llama.alibi_slopes(cfg.num_attention_heads))
             if cfg.pos_type == "alibi" else None)
    rm = cfg.residual_multiplier

    is_q8 = isinstance(cache, KVCacheQ8)
    is_q4 = isinstance(cache, KVCacheQ4)
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        sliding = cfg.sliding_window if llama.is_sliding_layer(cfg, li) else None
        post_norm = "input_layernorm" not in layer  # olmo2
        h = x if post_norm else llama.apply_norm(
            x, cfg, layer["input_layernorm"], layer.get("input_layernorm_bias")
        )
        bidx = jnp.arange(B)[:, None]
        if "kv_a_proj" in layer:  # MLA (deepseek2): absorbed-MQA cache
            cos_l, sin_l = llama.select_rope(cos, sin, cfg, li)
            attn, k_cache, ks_cache = _mla_cached_attn(
                layer, cfg, h, cache.k[li], lengths, positions, cos_l, sin_l,
                B, S, bidx, cache.k_s[li] if is_q8 else None,
            )
            new_k.append(k_cache)
            new_v.append(cache.v[li])
            if is_q8:
                new_ks.append(ks_cache)
                new_vs.append(cache.v_s[li])
        else:
            if "qkv_proj" in layer:
                # fused q/k/v: one kernel launch (serving-time fusion)
                qkv = _q_linear(h, layer["qkv_proj"])
                kv_dim = cfg.num_key_value_heads * hd
                d_q = qkv.shape[-1] - 2 * kv_dim
                q = qkv[..., :d_q]
                k = qkv[..., d_q : d_q + kv_dim]
                v = qkv[..., d_q + kv_dim :]
            else:
                q = _q_linear(h, layer["q_proj"])
                k = _q_linear(h, layer["k_proj"])
                v = _q_linear(h, layer["v_proj"])
            if layer.get("q_bias") is not None:
                q = q + layer["q_bias"]
                k = k + layer["k_bias"]
                v = v + layer["v_bias"]
            if cfg.clip_qkv:  # olmo v1
                q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
                k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
                v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
            # head counts from local shapes (== cfg counts unless TP-sharded)
            nH = q.shape[-1] // hd
            nKV = k.shape[-1] // hd
            if cfg.qk_norm and layer["q_norm"].shape[0] != hd:  # flat olmo2-style
                q = llama.rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
                k = llama.rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
            q = q.reshape(B, S, nH, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, S, nKV, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, S, nKV, hd).transpose(0, 2, 1, 3)
            if cfg.qk_norm and not cfg.qk_norm_after_rope \
                    and layer["q_norm"].shape[0] == hd:
                q = llama.rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
                k = llama.rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
            if cfg.pos_type == "rope":
                cos_l, sin_l = llama.select_rope(cos, sin, cfg, li)
                q, k = llama.apply_rope(q, k, cos_l, sin_l, cfg.rope_interleaved)
            if cfg.qk_norm and cfg.qk_norm_after_rope:  # hunyuan
                q = llama.rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
                k = llama.rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)

            ks_cache = vs_cache = None
            if is_q8:
                kq, ks = _quantize_kv(k.transpose(0, 2, 1, 3))
                vq, vs = _quantize_kv(v.transpose(0, 2, 1, 3))
                k_cache = cache.k[li].at[bidx, :, positions, :].set(kq, mode="drop")
                v_cache = cache.v[li].at[bidx, :, positions, :].set(vq, mode="drop")
                ks_cache = cache.k_s[li].at[bidx, :, positions].set(ks, mode="drop")
                vs_cache = cache.v_s[li].at[bidx, :, positions].set(vs, mode="drop")
                new_ks.append(ks_cache)
                new_vs.append(vs_cache)
            elif is_q4:
                kq, ks = _quantize_kv_q4(k.transpose(0, 2, 1, 3))
                vq, vs = _quantize_kv_q4(v.transpose(0, 2, 1, 3))
                k_cache = cache.k[li].at[bidx, :, positions, :].set(kq, mode="drop")
                v_cache = cache.v[li].at[bidx, :, positions, :].set(vq, mode="drop")
                ks_cache = cache.k_s[li].at[bidx, :, positions, :].set(ks, mode="drop")
                vs_cache = cache.v_s[li].at[bidx, :, positions, :].set(vs, mode="drop")
                new_ks.append(ks_cache)
                new_vs.append(vs_cache)
            else:
                k_cache = cache.k[li].at[bidx, :, positions, :].set(
                    k.transpose(0, 2, 1, 3).astype(cache.k[li].dtype), mode="drop"
                )
                v_cache = cache.v[li].at[bidx, :, positions, :].set(
                    v.transpose(0, 2, 1, 3).astype(cache.v[li].dtype), mode="drop"
                )
            new_k.append(k_cache)
            new_v.append(v_cache)

            if cfg.attention_scale is not None:  # granite: direct score multiplier
                att_scale = cfg.attention_scale
            elif cfg.query_pre_attn_scalar is not None:
                att_scale = cfg.query_pre_attn_scalar ** -0.5
            else:
                att_scale = None
            attn = _cached_attention(
                q, k_cache, v_cache, lengths, att_scale, cfg.attn_logit_softcap, sliding,
                k_scale=ks_cache, v_scale=vs_cache, sinks=layer.get("sinks"),
                alibi=alibi, bidir_spans=bidir_spans,
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nH * hd)
        attn_out = _q_linear(attn, layer["o_proj"])
        if layer.get("o_bias") is not None:
            attn_out = attn_out + layer["o_bias"]
        if psum_axis is not None:
            attn_out = jax.lax.psum(attn_out, psum_axis)
        gemma2_norms = "pre_feedforward_layernorm" in layer
        if gemma2_norms or post_norm:
            attn_out = llama.rms_norm(attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps, au)
        if rm is not None:
            attn_out = attn_out * jnp.asarray(rm, dtype=attn_out.dtype)

        if cfg.parallel_blocks:
            # cohere/phi: mlp branches from the same normed input h;
            # falcon new-decoder normalizes the mlp branch separately
            if "mlp_layernorm" in layer:
                h = llama.apply_norm(x, cfg, layer["mlp_layernorm"],
                                     layer.get("mlp_layernorm_bias"))
        else:
            x = x + attn_out
            if post_norm:
                h = x
            elif gemma2_norms:
                h = llama.rms_norm(x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps, au)
            else:
                h = llama.apply_norm(
                    x, cfg, layer["post_attention_layernorm"],
                    layer.get("post_attention_layernorm_bias"),
                )
        if "gate_inp" in layer:  # sparse MoE FFN (packed or dense experts)
            mlp_out = _moe_q_ffn(h, layer, cfg)
        elif "gate_proj" not in layer and "gateup_proj" not in layer:
            # gateless MLP (starcoder2/phi/nemotron)
            up = _q_linear(h, layer["up_proj"])
            if layer.get("up_bias") is not None:
                up = up + layer["up_bias"]
            mlp_out = _q_linear(llama._act_only(up, cfg), layer["down_proj"])
        else:
            if "gateup_proj" in layer:
                gu = _q_linear(h, layer["gateup_proj"])
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = _q_linear(h, layer["gate_proj"])
                up = _q_linear(h, layer["up_proj"])
            if layer.get("gate_bias") is not None:
                gate = gate + layer["gate_bias"]
                up = up + layer["up_bias"]
            act = llama._mlp_act(gate, up, cfg)
            mlp_out = _q_linear(act, layer["down_proj"])
        if layer.get("down_bias") is not None:
            mlp_out = mlp_out + layer["down_bias"]
        if psum_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, psum_axis)
        if gemma2_norms or post_norm:
            mlp_out = llama.rms_norm(mlp_out, layer["post_feedforward_layernorm"], cfg.rms_norm_eps, au)
        if rm is not None:
            mlp_out = mlp_out * jnp.asarray(rm, dtype=mlp_out.dtype)
        x = x + mlp_out + (attn_out if cfg.parallel_blocks else 0)

    if all_logits:
        # speculative-decode verification needs the logits of every fed
        # position (B, S, vocab), not just the final one
        assert n_valid is None and psum_axis is None
        last = x
        advance = S
    elif n_valid is None:
        last = x[:, -1, :]
        advance = S
    else:
        last = x[jnp.arange(B), n_valid - 1, :]
        advance = n_valid
    h = llama.apply_norm(last, cfg, params["norm"], params.get("norm_bias"))
    head = params.get("lm_head", params["embed_tokens"])
    if isinstance(head, _QUANT_TYPES):
        if h.ndim == 3:  # all_logits: flatten (B, S) for the fused kernel
            logits = qmatmul.dequant_matmul(
                h.reshape(-1, h.shape[-1]), head
            ).reshape(h.shape[0], h.shape[1], -1)
        else:
            logits = qmatmul.dequant_matmul(h, head)
        if psum_axis is None and logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]  # drop pad_dout_v2 rows
    elif all_logits:
        logits = jnp.einsum("bsi,oi->bso", h, head,
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("bi,oi->bo", h, head, preferred_element_type=jnp.float32)
    if params.get("lm_head_bias") is not None:  # phi
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    if psum_axis is not None:
        # vocab-sharded head: concatenate shard logits in device order
        logits = jax.lax.all_gather(logits, psum_axis, axis=1, tiled=True)
        if logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]  # pad lives in last shard
    if cfg.logits_multiplier is not None:
        logits = logits * cfg.logits_multiplier
    if cfg.final_logit_softcap:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    if is_q8:
        return logits, KVCacheQ8(new_k, new_v, new_ks, new_vs, lengths + advance)
    if is_q4:
        return logits, KVCacheQ4(new_k, new_v, new_ks, new_vs, lengths + advance)
    return logits, KVCache(new_k, new_v, lengths + advance)


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def prepare_mla_layer(layer: Dict[str, Any], cfg: LlamaConfig) -> Dict[str, Any]:
    """Derive the dense MLA decompression tensors k_b (nH, kv_lora, dn) and
    v_b (nH, dv, kv_lora) from a kv_b_proj weight (dense or packed). The
    absorbed-MQA attention path consumes k_b/v_b; kv_b_proj itself is never
    applied as a single linear at serve time."""
    if "kv_b_proj" not in layer or "k_b" in layer:
        return layer
    w = layer["kv_b_proj"]
    if isinstance(w, _QUANT_TYPES):
        w = _dequant_any(w)
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    w = w.reshape(-1, dn + dv, cfg.kv_lora_rank)
    out = dict(layer)
    out.pop("kv_b_proj")
    out["k_b"] = jnp.transpose(w[:, :dn], (0, 2, 1)).astype(cfg.dtype)
    out["v_b"] = w[:, dn:].astype(cfg.dtype)
    return out


def fuse_layer_projections(layer: Dict[str, Any], cfg: Optional[LlamaConfig] = None) -> Dict[str, Any]:
    """Fuse q/k/v and gate/up packed weights into single kernel launches
    (exact: concatenation along output columns). No-op when the parts are
    not uniformly v2-packed or biases are present (bias split ambiguity)."""
    out = dict(layer)
    if cfg is not None and cfg.kv_lora_rank:
        out = prepare_mla_layer(out, cfg)
    def _fuse(parts):
        fused = qmatmul.fuse_rql_v2(parts)
        return fused if fused is not None else qmv4.fuse_rql_v4(parts)

    if ("q_proj" in out and out.get("q_bias") is None
            and "qkv_proj" not in out):
        fused = _fuse([out.get("q_proj"), out.get("k_proj"), out.get("v_proj")])
        if fused is not None:
            out["qkv_proj"] = fused
            for k in ("q_proj", "k_proj", "v_proj"):
                del out[k]
    if "gate_proj" in out and "gateup_proj" not in out:
        fused = _fuse([out.get("gate_proj"), out.get("up_proj")])
        if fused is not None:
            out["gateup_proj"] = fused
            del out["gate_proj"]
            del out["up_proj"]
    return out


def fuse_params_for_serving(params: Dict[str, Any], cfg: LlamaConfig) -> Dict[str, Any]:
    return {**params,
            "layers": [fuse_layer_projections(l, cfg) for l in params["layers"]]}


def quantize_params_for_serving(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    artifacts_dir: Union[str, Path],
) -> Dict[str, Any]:
    """Replace block linears with RuntimeQuantLinear from a calibration
    artifacts tree; norms/embeddings stay dense."""
    from ..quant import artifacts as art_mod

    available = art_mod.list_layers(artifacts_dir)
    out = dict(params)
    layers = []
    mla_keys = (("q_a_proj", "q_a_proj"), ("q_b_proj", "q_b_proj"),
                ("kv_a_proj", "kv_a_proj_with_mqa"), ("kv_b_proj", "kv_b_proj"))
    for li, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for key, hf_key in (mla_keys if "kv_a_proj" in layer else ()):
            name = f"model.layers.{li}.self_attn.{hf_key}"
            if key in layer and name in available:
                art = art_mod.load_layer(artifacts_dir, name)
                new_layer[key] = qmatmul.pack_runtime_auto(
                    art.qweight, art.params(), art.q_type
                )
        for key in llama.BLOCK_LINEAR_KEYS:
            mod = "self_attn" if key[0] in "qkvo" else "mlp"
            name = f"model.layers.{li}.{mod}.{key}"
            if key in layer and name in available:
                art = art_mod.load_layer(artifacts_dir, name)
                new_layer[key] = qmatmul.pack_runtime_auto(
                    art.qweight, art.params(), art.q_type
                )
        # per-expert artifacts -> packed expert stacks (all-or-nothing per
        # projection so the stacked layout stays uniform)
        if "experts_gate" in layer:
            E = layer["experts_gate"].shape[0]
            stacks = {}
            for key, proj in (("experts_gate", "gate_proj"),
                              ("experts_up", "up_proj"),
                              ("experts_down", "down_proj")):
                names = [f"model.layers.{li}.mlp.experts.{e}.{proj}"
                         for e in range(E)]
                if all(n in available for n in names):
                    arts = [art_mod.load_layer(artifacts_dir, n) for n in names]
                    if len({a.q_type for a in arts}) == 1:
                        stacks[key] = qmatmul.stack_runtime_v2([
                            qmatmul.pack_runtime_v2(a.qweight, a.params(), a.q_type)
                            for a in arts
                        ])
            if len(stacks) == 3:  # all three or none: keep the layout uniform
                new_layer.update(stacks)
            for key, sub in (("shared_gate", "shared_expert.gate_proj"),
                             ("shared_up", "shared_expert.up_proj"),
                             ("shared_down", "shared_expert.down_proj")):
                name = f"model.layers.{li}.mlp.{sub}"
                if key in layer and name in available:
                    art = art_mod.load_layer(artifacts_dir, name)
                    new_layer[key] = qmatmul.pack_runtime_auto(
                        art.qweight, art.params(), art.q_type
                    )
        layers.append(new_layer)
    out["layers"] = layers
    return out


# arch families the GGUF-direct loader understands; anything else errors
# loudly instead of silently running with llama semantics (round-1 bug).
_GGUF_SERVING_ARCHES = (
    "llama", "mistral", "qwen2", "qwen3", "gemma", "gemma2", "gemma3", "phi3",
    "olmo2", "qwen2moe", "qwen3moe", "granite", "minicpm", "exaone",
    "internlm2", "baichuan", "deepseek", "olmoe", "stablelm", "starcoder2",
    "nemotron", "command-r", "phi2", "deepseek2", "glm4", "cohere2", "olmo",
    "arcee", "seed_oss", "ernie4_5", "exaone4", "granitemoe", "glm4moe",
    "ernie4_5-moe", "dots1", "gpt-oss", "falcon", "hunyuan-dense",
    "hunyuan-moe", "gptneox", "gptj", "gpt2", "bloom", "mpt", "smollm3",
    "chatglm", "starcoder", "dbrx",
    # llama/qwen2 twins: xverse is llama semantics under its own arch tag;
    # qwen2vl's mrope reduces exactly to NeoX rope for text-only decoding
    # (all position streams equal)
    "xverse", "qwen2vl",
    # phimoe: mixtral-style experts + LayerNorms + longrope factor tensors
    # (llama.cpp top-k softmax routing semantics, not HF's sparsemixer)
    "phimoe",
)

# mean-subtracting-LayerNorm GGUF arches (nemotron norms arrive pre-folded
# (1+w) from the converter, so no add_unit at serve time)
_LAYERNORM_ARCHES = ("stablelm", "starcoder2", "nemotron", "command-r",
                     "phi2", "cohere2", "olmo", "falcon", "gptneox", "gptj",
                     "gpt2", "bloom", "mpt", "starcoder", "dbrx", "phimoe")

def _layer_exps_quant(r, li: int) -> bool:
    """Are this layer's stacked expert tensors K-quant (servable packed)?"""
    for proj in ("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"):
        info = r.tensors.get(f"blk.{li}.{proj}.weight")
        if info is None or info.ggml_type not in K_QUANT_TYPES \
                or info.shape[-1] % 256 != 0:
            return False
    return True


# stacked K-quant MoE tensors load packed (StackedQuantLinearV2, served by
# _moe_q_ffn); anything else loads as dense float for llama.moe_ffn
_MOE_NAME_MAP = {
    "ffn_gate_inp": "gate_inp",
    "ffn_gate_exps": "experts_gate",
    "ffn_up_exps": "experts_up",
    "ffn_down_exps": "experts_down",
    "ffn_gate_inp_shexp": "shared_gate_inp",
    "ffn_gate_shexp": "shared_gate",
    "ffn_up_shexp": "shared_up",
    "ffn_down_shexp": "shared_down",
}

# GGUF blk.* component -> param key, per family. gemma2's GGUF names are
# shifted relative to HF: ffn_norm is the *pre*-feedforward norm and
# post_attention_norm is HF's post_attention_layernorm (export/packer.py
# Gemma2Arch mirrors this on the write side).
_BASE_NAME_MAP = {
    "attn_norm": "input_layernorm",
    "ffn_norm": "post_attention_layernorm",
    "attn_q": "q_proj",
    "attn_k": "k_proj",
    "attn_v": "v_proj",
    "attn_output": "o_proj",
    "attn_q_norm": "q_norm",
    "attn_k_norm": "k_norm",
    "attn_sinks": "sinks",
    "attn_norm_2": "mlp_layernorm",
    "ffn_gate": "gate_proj",
    "ffn_up": "up_proj",
    "ffn_down": "down_proj",
}
_GEMMA2_NAME_MAP = {
    **_BASE_NAME_MAP,
    "ffn_norm": "pre_feedforward_layernorm",
    "post_attention_norm": "post_attention_layernorm",
    "post_ffw_norm": "post_feedforward_layernorm",
}


def _config_from_gguf(r, arch: str, dtype) -> LlamaConfig:
    """Arch-aware LlamaConfig from GGUF metadata keys."""
    n_head = r.get(f"{arch}.attention.head_count")
    n_kv = r.get(f"{arch}.attention.head_count_kv", n_head)
    hidden = r.get(f"{arch}.embedding_length")
    n_layers = r.get(f"{arch}.block_count")
    head_dim = r.get(
        f"{arch}.attention.key_length",
        r.get(f"{arch}.rope.dimension_count", hidden // n_head),
    )
    vocab = r.get(f"{arch}.vocab_size") or len(r.get("tokenizer.ggml.tokens", []))
    gemma = arch in ("gemma", "gemma2", "gemma3")
    qpas = None
    if arch == "gemma3":
        qpas = r.get(f"{arch}.attention.query_pre_attn_scalar", head_dim)
    if arch == "gemma2":
        # llama.cpp keys attention scale off the model size (27B = 46 blocks
        # uses hidden/n_head); honor an explicit key when present (our packer
        # writes one).
        qpas = r.get(
            f"{arch}.attention.query_pre_attn_scalar",
            hidden / n_head if n_layers == 46 else head_dim,
        )
    rope_scaling = None
    if "rope_factors_long.weight" in r.tensors \
            and "rope_factors_short.weight" in r.tensors:
        # phi3/phimoe/minicpm3 longrope: per-dim factor tensors; the model
        # switches long/short on the live context length (models/llama
        # _rope_params "longrope")
        rope_scaling = (
            ("rope_type", "longrope"),
            ("long_factor", tuple(
                float(x) for x in r.tensor_float("rope_factors_long.weight"))),
            ("short_factor", tuple(
                float(x) for x in r.tensor_float("rope_factors_short.weight"))),
            ("original_max_position_embeddings",
             int(r.get(f"{arch}.rope.scaling.original_context_length", 4096))),
        )
        if r.get(f"{arch}.rope.scaling.attn_factor") is not None:
            rope_scaling += (
                ("attention_factor",
                 float(r.get(f"{arch}.rope.scaling.attn_factor"))),
            )
    elif "rope_freqs.weight" in r.tensors:
        # llama.cpp stores per-dim frequency factors (e.g. the llama3 rope
        # correction) as a tensor; theta_i = base_theta_i / factor_i
        rope_scaling = (
            ("factors", tuple(float(x) for x in r.tensor_float("rope_freqs.weight"))),
            ("rope_type", "gguf_factors"),
        )
    elif r.get(f"{arch}.rope.scaling.type") == "linear":
        rope_scaling = (
            ("factor", float(r.get(f"{arch}.rope.scaling.factor", 1.0))),
            ("rope_type", "linear"),
        )
    elif r.get(f"{arch}.rope.scaling.type") == "yarn":
        rope_scaling = (
            ("factor", float(r.get(f"{arch}.rope.scaling.factor", 1.0))),
            ("original_max_position_embeddings",
             int(r.get(f"{arch}.rope.scaling.original_context_length", 4096))),
            ("rope_type", "yarn"),
        )
        if r.get(f"{arch}.rope.scaling.yarn_truncate") is not None:
            rope_scaling = rope_scaling + (
                ("truncate", bool(r.get(f"{arch}.rope.scaling.yarn_truncate"))),
            )
    elif r.get(f"{arch}.rope.dimension_sections") is not None:
        # qwen2vl mrope: 4-padded t/h/w frequency sections (strip the pad);
        # text decoding reduces to NeoX, image prompts drive mrope_cos_sin
        sec = [int(x) for x in r.get(f"{arch}.rope.dimension_sections")]
        while sec and sec[-1] == 0:
            sec.pop()
        rope_scaling = (
            ("rope_type", "mrope"),
            ("mrope_section", tuple(sec)),
        )
    moe_experts = r.get(f"{arch}.expert_count")
    # scalar multipliers: granite/minicpm store logit_scale as a divisor;
    # command-r stores a multiplier (llama.cpp semantics differ per arch)
    emb_mult = r.get(f"{arch}.embedding_scale")
    res_mult = r.get(f"{arch}.residual_scale")
    attn_scale = r.get(f"{arch}.attention.scale")
    logit_scale = r.get(f"{arch}.logit_scale")
    if not logit_scale:
        logits_mult = None
    elif arch in ("command-r", "cohere2"):
        logits_mult = logit_scale
    else:
        logits_mult = 1.0 / logit_scale
    ln = arch in _LAYERNORM_ARCHES
    rope_dims = r.get(f"{arch}.rope.dimension_count", head_dim)
    act = "silu"
    if gemma or arch in ("starcoder2", "phi2"):
        act = "gelu_tanh"
    elif arch in ("nemotron", "arcee"):
        act = "relu2"
    elif arch == "gpt-oss":
        act = "swiglu_oai"
    elif arch == "falcon":
        act = "gelu"
    elif arch in ("gpt2", "gptj", "bloom", "starcoder"):
        act = "gelu_tanh"  # gelu_new / BloomGelu / gelu_pytorch_tanh
    elif arch in ("gptneox", "mpt"):
        act = "gelu"
    parallel = arch in ("command-r", "phi2", "cohere2", "falcon", "gptj") or bool(
        r.get(f"{arch}.use_parallel_residual", False)
    )
    sliding_layers = None
    rope_local = None
    if arch in ("cohere2", "exaone4", "gpt-oss"):
        pat = r.get(f"{arch}.attention.sliding_window_pattern")
        if pat is not None:
            sliding_layers = tuple(bool(x) for x in pat)
        elif arch == "cohere2":
            # llama.cpp hardcodes cohere2's 3-sliding:1-global pattern
            sliding_layers = tuple(bool((i + 1) % 4) for i in range(n_layers))
        elif arch == "gpt-oss":
            # llama.cpp hardcodes gpt-oss's alternating pattern (even sliding)
            sliding_layers = tuple(i % 2 == 0 for i in range(n_layers))
    if arch == "gemma3":
        # llama.cpp hardcodes the 5-local:1-global pattern for gemma3
        sliding_layers = tuple(bool((i + 1) % 6) for i in range(n_layers))
        rope_local = r.get(f"{arch}.rope.local.freq_base", 10000.0)
    mla = {}
    if arch in ("glm4moe", "dots1"):
        mla = dict(
            moe_scoring="sigmoid",
            moe_group_method="top2sum",
            moe_routed_scale=r.get(f"{arch}.expert_weights_scale"),
        )
        if r.get(f"{arch}.expert_group_count"):
            mla.update(
                moe_n_group=r.get(f"{arch}.expert_group_count"),
                moe_topk_group=r.get(f"{arch}.expert_group_used_count", 1),
            )
    if arch == "deepseek2":
        dr = r.get(f"{arch}.rope.dimension_count")
        key_mla = r.get(f"{arch}.attention.key_length_mla")
        mla = dict(
            q_lora_rank=r.get(f"{arch}.attention.q_lora_rank"),
            kv_lora_rank=r.get(f"{arch}.attention.kv_lora_rank"),
            qk_rope_head_dim=dr,
            qk_nope_head_dim=key_mla - dr,
            v_head_dim=r.get(f"{arch}.attention.value_length_mla"),
            moe_scoring=("sigmoid" if r.get(f"{arch}.expert_gating_func") == 2
                         else "softmax"),
            moe_routed_scale=r.get(f"{arch}.expert_weights_scale"),
            moe_n_group=r.get(f"{arch}.expert_group_count"),
            moe_topk_group=r.get(f"{arch}.expert_group_used_count"),
            # group score follows the scoring function: v3 noaux-tc sums the
            # top-2 sigmoid scores per group, v2 takes the group max
            moe_group_method=("top2sum"
                              if r.get(f"{arch}.expert_gating_func") == 2
                              else "max"),
        )
        rope_dims = head_dim  # neutralize partial_rotary (rope_dim property wins)
        if attn_scale is None:
            attn_scale = key_mla ** -0.5  # packer normally writes the key
        # group-limited routing metadata is not in GGUF (llama.cpp reads the
        # groups from nowhere either: it routes without group limiting); we
        # match llama.cpp's runtime behavior for GGUF-loaded models.
    return LlamaConfig(
        **mla,
        arch="gemma2" if arch == "gemma2" else "llama",
        rope_scaling=rope_scaling,
        embedding_multiplier=emb_mult,
        attention_scale=attn_scale,
        residual_multiplier=res_mult,
        logits_multiplier=logits_mult,
        moe_num_experts=moe_experts,
        moe_top_k=r.get(f"{arch}.expert_used_count", 2),
        # our packer writes the norm flag (llama.cpp hardcodes it per arch:
        # mixtral-as-llama/qwen3moe renormalize; qwen2moe/olmoe/deepseek not)
        moe_norm_topk=bool(r.get(
            f"{arch}.expert_norm_topk_prob",
            r.get(f"{arch}.expert_weights_norm",
                  arch in ("llama", "mistral", "qwen3moe")),
        )),
        moe_intermediate_size=r.get(f"{arch}.expert_feed_forward_length"),
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=r.get(f"{arch}.feed_forward_length"),
        num_hidden_layers=n_layers,
        num_attention_heads=n_head,
        num_key_value_heads=n_kv,
        head_dim=head_dim,
        norm_type="layernorm" if ln else "rmsnorm",
        partial_rotary_factor=rope_dims / head_dim,
        rope_interleaved=arch in ("command-r", "deepseek2", "glm4",
                                  "cohere2", "ernie4_5", "ernie4_5-moe",
                                  "gptj", "chatglm"),
        parallel_blocks=parallel,
        rms_norm_eps=r.get(
            f"{arch}.attention.layer_norm_rms_epsilon",
            r.get(f"{arch}.attention.layer_norm_epsilon", 1e-5),
        ),
        rope_theta=r.get(f"{arch}.rope.freq_base", 10000.0),
        max_position_embeddings=r.get(f"{arch}.context_length", 4096),
        qk_norm="blk.0.attn_q_norm.weight" in r.tensors,
        qk_norm_after_rope=arch in ("hunyuan-dense", "hunyuan-moe"),
        pos_type=("learned" if arch in ("gpt2", "starcoder")
                  else "alibi" if arch in ("bloom", "mpt") else "rope"),
        rope_layers=(
            tuple(bool(x) for x in r.get(f"{arch}.rope_layers"))
            if arch == "smollm3" and r.get(f"{arch}.rope_layers") is not None
            else tuple((i + 1) % 4 != 0 for i in range(n_layers))
            if arch == "smollm3" else None
        ),
        # GGUF gemma norms arrive with the +1 already folded (the converter
        # stores 1+w, llama.cpp convention; export/packer.py does the same),
        # so serve them as plain RMSNorm weights
        rms_add_unit=False,
        embed_scale=gemma,
        act_fn=act,
        attn_logit_softcap=r.get(f"{arch}.attn_logit_softcapping") if arch == "gemma2" else None,
        final_logit_softcap=r.get(f"{arch}.final_logit_softcapping") if arch == "gemma2" else None,
        sliding_window=(
            r.get(f"{arch}.attention.sliding_window")
            if arch in ("gemma2", "gemma3", "cohere2", "exaone4",
                        "gpt-oss", "phi3", "phimoe") else None
        ) or None,  # phi3/phimoe write 0 to mark "no window" (Phi-4 tag)
        sliding_layers=sliding_layers,
        rope_sliding_only=arch in ("cohere2", "exaone4"),
        clip_qkv=r.get(f"{arch}.attention.clamp_kqv"),
        rope_local_theta=rope_local,
        query_pre_attn_scalar=qpas,
        dtype=dtype,
    )


def load_gguf_for_serving(
    gguf_path: Union[str, Path], dtype=jnp.bfloat16, dense: bool = False
) -> Tuple[Dict[str, Any], LlamaConfig]:
    """Build a serving model directly from a .gguf file.

    Quantized K-quant tensors are unpacked bit-exactly to codes+params and
    repacked into the runtime kernel format; everything llama.cpp could load
    from this file, we serve natively. Raises on architectures or tensor
    names this loader does not understand — a silently dropped tensor means
    silently wrong logits.

    dense=True dequantizes every tensor to plain arrays instead — the
    resulting pytree runs through models.llama.forward (full-sequence
    logits), which is how ``ppl --gguf-file`` evaluates a GGUF directly
    (the reference's llama-perplexity flow).
    """
    from ..export.packer import gqa_permute_rows
    from ..formats import convert
    from ..formats.ggml import K_QUANT_TYPES
    from ..mapper.shards import open_gguf

    r = open_gguf(gguf_path)  # plain file or -NNNNN-of-NNNNN shard set
    arch = r.get("general.architecture", "llama")
    if arch not in _GGUF_SERVING_ARCHES:
        raise NotImplementedError(
            f"GGUF architecture {arch!r} is not supported by the serving "
            f"loader (supported: {', '.join(_GGUF_SERVING_ARCHES)})"
        )
    cfg = _config_from_gguf(r, arch, dtype)
    n_head, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = cfg.head_dim_
    # archs whose GGUF q/k rows are in llama.cpp's interleaved-rope layout
    # (mirrors the write-side ArchSpec.permute_qk flags)
    permute_qk = arch in (
        "llama", "mistral", "granite", "minicpm", "internlm2", "baichuan",
        "deepseek", "olmo", "arcee", "granitemoe", "smollm3", "xverse",
    )
    # olmo2 shares the gemma2-style post-norm tensor names
    name_map = (
        _GEMMA2_NAME_MAP if arch in ("gemma2", "gemma3", "olmo2", "glm4",
                                     "exaone4")
        else _BASE_NAME_MAP
    )
    if arch == "gptneox" and cfg.parallel_blocks:
        # ln2 normalizes the MLP branch of the SAME input in parallel mode
        name_map = {**_BASE_NAME_MAP, "ffn_norm": "mlp_layernorm"}
    if arch == "deepseek2":
        name_map = {
            **_BASE_NAME_MAP,
            "attn_q_a": "q_a_proj",
            "attn_q_a_norm": "q_a_norm",
            "attn_q_b": "q_b_proj",
            "attn_kv_a_mqa": "kv_a_proj",
            "attn_kv_a_norm": "kv_a_norm",
        }

    def unpack(name: str, inv: Optional[np.ndarray]):
        """Returns ('quant', codes, np-params, qtype) or ('float', array)."""
        info = r.tensors[name]
        if not dense and info.ggml_type in K_QUANT_TYPES \
                and info.shape[-1] % 256 == 0:
            q, ss, sc, sz, zq = convert.unpack_layer(
                np.asarray(r.tensor_bytes(name)), info.ggml_type, info.shape
            )
            if inv is not None:
                q, ss, sc, sz, zq = q[inv], ss[inv], sc[inv], sz[inv], zq[inv]
            spec = KQUANT_SPECS[info.ggml_type]
            q = q.astype(np.int8 if spec.signed else np.uint8)
            return ("quant", q, (ss, sz, sc, zq), info.ggml_type)
        w = r.tensor_float(name)
        if inv is not None:
            w = w[inv]
        return ("float", w)

    def to_param(t):
        if t[0] == "quant":
            _, q, (ss, sz, sc, zq), qtype = t
            params_ = SuperGroupParams(
                jnp.asarray(ss), jnp.asarray(sz), jnp.asarray(sc), jnp.asarray(zq)
            )
            return qmatmul.pack_runtime_auto(q, params_, qtype)
        w = t[1]
        return jnp.asarray(w, dtype=dtype if w.ndim > 1 else jnp.float32)

    def row_split(t, row_counts):
        """Split a loaded tensor along output rows (phi3 fused qkv/gate_up);
        exact for K-quants since rows are independent."""
        offs = np.cumsum([0] + list(row_counts))
        out = []
        for a, b in zip(offs[:-1], offs[1:]):
            if t[0] == "quant":
                _, q, (ss, sz, sc, zq), qtype = t
                out.append(("quant", q[a:b], (ss[a:b], sz[a:b], sc[a:b], zq[a:b]), qtype))
            else:
                out.append(("float", t[1][a:b]))
        return out

    def load_tensor(name: str):
        info = r.tensors[name]
        inv = None
        if permute_qk and (".attn_q." in name or ".attn_k." in name) and "norm" not in name:
            heads = n_head if ".attn_q." in name else n_kv
            inv = np.argsort(gqa_permute_rows(info.shape[0], heads))
        return unpack(name, inv)

    params: Dict[str, Any] = {"layers": []}
    layers: List[Dict[str, Any]] = [dict() for _ in range(cfg.num_hidden_layers)]
    bias_keys = {
        "q_proj": "q_bias", "k_proj": "k_bias", "v_proj": "v_bias",
        "o_proj": "o_bias", "gate_proj": "gate_bias", "up_proj": "up_bias",
        "down_proj": "down_bias",
        "input_layernorm": "input_layernorm_bias",
        "post_attention_layernorm": "post_attention_layernorm_bias",
        "pre_feedforward_layernorm": "pre_feedforward_layernorm_bias",
        "mlp_layernorm": "mlp_layernorm_bias",
    }
    for name in r.tensor_order:
        if name == "token_embd.weight":
            # embeddings are gathered, keep dense
            params["embed_tokens"] = jnp.asarray(r.tensor_float(name), dtype=dtype)
        elif name == "output.weight":
            head = to_param(load_tensor(name))
            if isinstance(head, qmatmul.RuntimeQuantLinearV2):
                # pad vocab rows to a 512 multiple: unlocks 512-wide kernel
                # tiles (~25% faster lm_head, docs/KERNELS_r04.md); the
                # forward slices logits back to vocab_size
                head = qmatmul.pad_dout_v2(head)
            params["lm_head"] = head
        elif name == "output.bias":
            params["lm_head_bias"] = jnp.asarray(r.tensor_float(name))
        elif name == "output_norm.weight":
            params["norm"] = jnp.asarray(r.tensor_float(name))
        elif name == "output_norm.bias":
            params["norm_bias"] = jnp.asarray(r.tensor_float(name))
        elif name in ("rope_freqs.weight", "rope_factors_long.weight",
                      "rope_factors_short.weight"):
            continue  # folded into cfg.rope_scaling
        elif name == "position_embd.weight":  # gpt2 learned positions
            params["pos_embed"] = jnp.asarray(r.tensor_float(name), dtype=dtype)
        elif name == "token_embd_norm.weight":  # bloom embedding LayerNorm
            params["embed_norm"] = jnp.asarray(r.tensor_float(name))
        elif name == "token_embd_norm.bias":
            params["embed_norm_bias"] = jnp.asarray(r.tensor_float(name))
        elif name.startswith("blk."):
            parts = name.split(".")
            li = int(parts[1])
            comp = parts[2]
            suffix = parts[3] if len(parts) > 3 else "weight"
            if comp == "attn_qkv":  # phi3 fused
                qkv = row_split(load_tensor(name), [n_head * hd, n_kv * hd, n_kv * hd])
                for key, t in zip(("q_proj", "k_proj", "v_proj"), qkv):
                    layers[li][bias_keys[key] if suffix == "bias" else key] = to_param(t)
            elif comp == "ffn_up" and f"blk.{li}.ffn_gate.weight" not in r.tensors \
                    and r.tensors[name].shape[0] == 2 * cfg.intermediate_size:
                gate, up = row_split(load_tensor(name), [cfg.intermediate_size] * 2)
                layers[li]["gate_proj"] = to_param(gate)
                layers[li]["up_proj"] = to_param(up)
            elif comp in ("attn_k_b", "attn_v_b", "attn_kv_b"):
                # MLA decompression projections: keep dense (they run as
                # per-head einsums, not fused-kernel matmuls)
                key = {"attn_k_b": "k_b", "attn_v_b": "v_b",
                       "attn_kv_b": "kv_b_proj"}[comp]
                layers[li][key] = jnp.asarray(r.tensor_float(name), dtype=dtype)
            elif comp == "exp_probs_b":
                layers[li]["gate_corr_bias"] = jnp.asarray(r.tensor_float(name))
            elif comp in _MOE_NAME_MAP:
                key = _MOE_NAME_MAP[comp]
                info = r.tensors[name]
                if suffix == "bias":  # gpt-oss router / per-expert biases
                    bkey = "gate_inp_bias" if key == "gate_inp" else key + "_bias"
                    layers[li][bkey] = jnp.asarray(r.tensor_float(name))
                    continue
                exps_quant = not dense and _layer_exps_quant(r, li)
                if key.startswith("experts_") and exps_quant:
                    # stacked K-quant expert tensor (E, d_out, d_in): keep
                    # packed — unpack codes/scales once, repack per expert
                    # into the v2 runtime layout, stack on a leading E axis
                    E, d_out_e, d_in_e = info.shape
                    q, ss, sc, sz, zq = convert.unpack_layer(
                        np.asarray(r.tensor_bytes(name)), info.ggml_type,
                        (E * d_out_e, d_in_e),
                    )
                    spec = KQUANT_SPECS[info.ggml_type]
                    q = q.astype(np.int8 if spec.signed else np.uint8)
                    per_exp = []
                    for e in range(E):
                        sl = slice(e * d_out_e, (e + 1) * d_out_e)
                        params_ = SuperGroupParams(
                            jnp.asarray(ss[sl]), jnp.asarray(sz[sl]),
                            jnp.asarray(sc[sl]), jnp.asarray(zq[sl]),
                        )
                        per_exp.append(qmatmul.pack_runtime_v2(
                            q[sl], params_, info.ggml_type
                        ))
                    layers[li][key] = qmatmul.stack_runtime_v2(per_exp)
                elif key.startswith("shared_") and key != "shared_gate_inp" \
                        and exps_quant:
                    # shared experts follow the routed experts' representation
                    # so the serving MoE path is uniform per layer
                    layers[li][key] = to_param(load_tensor(name))
                else:
                    layers[li][key] = jnp.asarray(
                        r.tensor_float(name), dtype=dtype
                    )
            elif comp in name_map:
                key = name_map[comp]
                if suffix == "bias":
                    key = bias_keys.get(key, key)
                    layers[li][key] = jnp.asarray(r.tensor_float(name))
                else:
                    layers[li][key] = to_param(load_tensor(name))
            else:
                raise NotImplementedError(
                    f"GGUF tensor {name!r} has no mapping for arch {arch!r}; "
                    "refusing to drop it silently"
                )
        else:
            raise NotImplementedError(
                f"unrecognized GGUF tensor {name!r}; refusing to drop it silently"
            )
    if arch == "olmo":
        # non-parametric LayerNorms: no norm tensors in the GGUF
        ones = jnp.ones((cfg.hidden_size,), jnp.float32)
        params.setdefault("norm", ones)
        for layer in layers:
            layer.setdefault("input_layernorm", ones)
            layer.setdefault("post_attention_layernorm", ones)
    params["layers"] = layers
    if "lm_head" not in params:
        cfg = dataclasses.replace(cfg, tie_word_embeddings=True)
    return params, cfg
