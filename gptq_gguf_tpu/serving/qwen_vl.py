"""qwen2-vl image serving: ViT tower + mrope position bookkeeping.

qwen2-vl decouples rope positions from sequence indices: text tokens get
sequential (t==h==w) positions, image soft tokens get a (t, h, w) grid
anchored at the running position, and the text after an image resumes at
max(position)+1 — so the decoder is driven through forward_cached's
``rope_positions`` override ((3, B, S) streams -> models.llama.
mrope_cos_sin) while the KV cache keeps plain sequence indexing. The
tower is the Qwen2VL ViT: Conv3D patch embed over (2, p, p) patches
(flattened-patch input + grid_thw, the HF processor's layout), 2D rotary
over the merge-block-permuted patch grid, full attention, QuickGELU MLP,
and the ln_q + 2-layer GELU merger — plus the qwen2.5-vl variant (RMS
norms, gated silu MLP, window attention in get_window_index order with
full-attention blocks at fullatt_block_indexes). Oracles: transformers
Qwen2VLForConditionalGeneration / Qwen2_5_VL (tests/test_qwen_vl.py).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from . import model as qmodel

__all__ = ["QwenVisionConfig", "load_hf_qwen_vision", "load_mmproj_qwen_gguf",
           "encode_patches", "qwen2vl_positions", "generate_with_images"]


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    embed_dim: int            # tower width
    intermediate_size: int    # VisionMlp hidden (mlp_ratio * embed_dim)
    num_hidden_layers: int
    num_attention_heads: int
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    text_hidden: int = 0
    # qwen2.5-vl window attention: RMS norms + gated silu MLP, full
    # attention only at fullatt_block_indexes, windows of window_size px
    v25: bool = False
    window_size: int = 112
    fullatt: Tuple[int, ...] = ()


def _ln(x, w, b, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def _vision_rope(vcfg: QwenVisionConfig, grid_h: int, grid_w: int):
    """(seq, head_dim) cos/sin from the merge-block-permuted (h, w) ids."""
    hd = vcfg.embed_dim // vcfg.num_attention_heads
    s = vcfg.spatial_merge_size
    inv = 1.0 / (10000.0 ** (
        np.arange(0, hd // 2, 2, dtype=np.float64) / (hd // 2)))

    def perm(ids):  # (h, w) -> merge-block order
        return (ids.reshape(grid_h // s, s, grid_w // s, s)
                .transpose(0, 2, 1, 3).reshape(-1))

    hpos = perm(np.broadcast_to(np.arange(grid_h)[:, None],
                                (grid_h, grid_w)))
    wpos = perm(np.broadcast_to(np.arange(grid_w)[None, :],
                                (grid_h, grid_w)))
    freqs = np.stack([hpos, wpos], -1)[..., None] * inv  # (seq, 2, hd/4)
    emb = freqs.reshape(len(hpos), -1)                   # (seq, hd/2)
    emb = np.concatenate([emb, emb], axis=-1)            # (seq, hd)
    return jnp.asarray(np.cos(emb), jnp.float32), \
        jnp.asarray(np.sin(emb), jnp.float32)


def _rms(x, w, eps=1e-6):
    return x / jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2, axis=-1,
                                 keepdims=True) + eps) * w


def _window_order(vcfg: QwenVisionConfig, gh: int, gw: int):
    """qwen2.5-vl get_window_index for one image: merged-token permutation
    into window order + each reordered token's window id."""
    s = vcfg.spatial_merge_size
    wsz = vcfg.window_size // s // vcfg.patch_size
    lh, lw = gh // s, gw // s
    idx = np.arange(lh * lw).reshape(lh, lw)
    ph, pw = (-lh) % wsz, (-lw) % wsz
    pad = np.full((lh + ph, lw + pw), -100, np.int64)
    pad[:lh, :lw] = idx
    nh, nw = (lh + ph) // wsz, (lw + pw) // wsz
    blocks = pad.reshape(nh, wsz, nw, wsz).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(nh * nw, wsz, wsz)
    seqlens = (blocks != -100).sum((1, 2))
    flat = blocks.reshape(-1)
    win_index = flat[flat != -100]
    window_ids = np.repeat(np.arange(nh * nw), seqlens)
    return win_index, window_ids


def encode_patches(vp: Dict[str, Any], vcfg: QwenVisionConfig,
                   patches: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
    """HF-layout flattened patches (seq, C*T*p*p) for ONE image (t=1) ->
    (seq // merge^2, text_hidden) soft tokens. Handles both qwen2-vl
    (LayerNorm, QuickGELU, full attention) and qwen2.5-vl (RMSNorm, gated
    silu, window attention with full-attn blocks at fullatt indexes)."""
    gh, gw = grid_hw
    D = vcfg.embed_dim
    unit = vcfg.spatial_merge_size ** 2
    x = patches @ vp["patch_w"].reshape(D, -1).T  # Conv3d, bias-free
    cos, sin = _vision_rope(vcfg, gh, gw)
    attn_bias = None
    reverse = None
    if vcfg.v25:
        win_index, window_ids = _window_order(vcfg, gh, gw)
        perm = jnp.asarray(
            (win_index[:, None] * unit + np.arange(unit)).reshape(-1))
        x, cos, sin = x[perm], cos[perm], sin[perm]
        tok_win = jnp.asarray(np.repeat(window_ids, unit))
        neg = jnp.finfo(jnp.float32).min
        attn_bias = jnp.where(tok_win[:, None] == tok_win[None, :], 0.0, neg)
        reverse = np.argsort(win_index)
    nh = vcfg.num_attention_heads
    hd = D // nh

    def rope(t):  # (seq, nh, hd)
        t1, t2 = t[..., : hd // 2], t[..., hd // 2:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return t * cos[:, None, :] + rot * sin[:, None, :]

    for li, layer in enumerate(vp["layers"]):
        if vcfg.v25:
            h = _rms(x, layer["ln1_w"])
        else:
            h = _ln(x, layer["ln1_w"], layer["ln1_b"])
        qkv = h @ layer["qkv_w"].T + layer["qkv_b"]
        q, k, v = [a.reshape(-1, nh, hd)
                   for a in jnp.split(qkv, 3, axis=-1)]
        q, k = rope(q), rope(k)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(hd)
        if attn_bias is not None and li not in vcfg.fullatt:
            scores = scores + attn_bias
        att = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, D)
        x = x + ctx @ layer["o_w"].T + layer["o_b"]
        if vcfg.v25:
            h = _rms(x, layer["ln2_w"])
            h = jax.nn.silu(h @ layer["gate_w"].T) * (h @ layer["up_w"].T)
            x = x + h @ layer["down_w"].T
        else:
            h = _ln(x, layer["ln2_w"], layer["ln2_b"])
            h = h @ layer["up_w"].T + layer["up_b"]
            h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
            x = x + h @ layer["down_w"].T + layer["down_b"]
    # merger: per-token norm, then group merge^2 tokens, 2-layer GELU MLP
    if vcfg.v25:
        x = _rms(x, vp["post_ln_w"])
    else:
        x = _ln(x, vp["post_ln_w"], vp["post_ln_b"])
    x = x.reshape(-1, D * unit)
    x = jax.nn.gelu(x @ vp["mm0_w"].T + vp["mm0_b"], approximate=False)
    x = x @ vp["mm2_w"].T + vp["mm2_b"]
    if reverse is not None:
        x = x[jnp.asarray(reverse)]
    return x


def qwen2vl_positions(ids: np.ndarray, image_token_id: int,
                      grids: List[Tuple[int, int]]
                      ) -> Tuple[np.ndarray, int]:
    """HF get_rope_index for image-bearing prompts (t=1 per image): text
    tokens advance all three streams together; an image block anchors its
    (h, w) grid at the running position and the next text token resumes at
    max(position) + 1. grids are AFTER spatial merge. Returns ((3, S)
    positions, next decode position)."""
    ids = np.asarray(ids).reshape(-1)
    pos = np.zeros((3, len(ids)), np.int64)
    g = iter(grids)
    st = 0
    i = 0
    while i < len(ids):
        if ids[i] == image_token_id:
            h, w = next(g)
            n = h * w
            if not (ids[i:i + n] == image_token_id).all():
                raise ValueError("image-token run shorter than its grid")
            pos[0, i:i + n] = st
            pos[1, i:i + n] = np.repeat(np.arange(h), w) + st
            pos[2, i:i + n] = np.tile(np.arange(w), h) + st
            st += max(h, w)
            i += n
        else:
            pos[:, i] = st
            st += 1
            i += 1
    return pos, st


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def load_hf_qwen_vision(model_dir: Union[str, Path]
                        ) -> Tuple[Dict[str, Any], QwenVisionConfig]:
    import json

    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        cfg = json.load(f)
    v = cfg["vision_config"]
    v25 = v.get("model_type") == "qwen2_5_vl" or "fullatt_block_indexes" in v
    text = {**cfg, **(cfg.get("text_config") or {})}
    if v25:  # qwen2.5 key scheme: hidden_size is the tower width
        width = v["hidden_size"]
        inter = v["intermediate_size"]
    else:
        width = v["embed_dim"]
        inter = int(v["embed_dim"] * v.get("mlp_ratio", 4))
    vcfg = QwenVisionConfig(
        embed_dim=width, intermediate_size=inter,
        num_hidden_layers=v["depth"],
        num_attention_heads=v["num_heads"],
        patch_size=v.get("patch_size", 14),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        in_channels=v.get("in_channels", 3),
        text_hidden=text.get("hidden_size", 0),
        v25=v25, window_size=v.get("window_size", 112),
        fullatt=tuple(v.get("fullatt_block_indexes", ())),
    )
    flat = {}
    for name, arr in _iter_safetensors(model_dir):
        if name.startswith("model."):
            name = name[len("model."):]
        flat[name] = jnp.asarray(_to_f32(np.asarray(arr)))
    pre = "visual."
    vp: Dict[str, Any] = {
        "patch_w": flat[pre + "patch_embed.proj.weight"],
        "post_ln_w": flat[pre + "merger.ln_q.weight"],
        "post_ln_b": flat.get(pre + "merger.ln_q.bias"),  # v25: RMS, no bias
        "mm0_w": flat[pre + "merger.mlp.0.weight"],
        "mm0_b": flat[pre + "merger.mlp.0.bias"],
        "mm2_w": flat[pre + "merger.mlp.2.weight"],
        "mm2_b": flat[pre + "merger.mlp.2.bias"],
        "layers": [],
    }
    for i in range(vcfg.num_hidden_layers):
        p = f"{pre}blocks.{i}."
        layer = {
            "qkv_w": flat[p + "attn.qkv.weight"],
            "qkv_b": flat[p + "attn.qkv.bias"],
            "o_w": flat[p + "attn.proj.weight"],
            "o_b": flat[p + "attn.proj.bias"],
            "ln1_w": flat[p + "norm1.weight"],
            "ln2_w": flat[p + "norm2.weight"],
        }
        if vcfg.v25:  # RMS norms + gated silu MLP (all bias-free)
            layer.update({
                "gate_w": flat[p + "mlp.gate_proj.weight"],
                "up_w": flat[p + "mlp.up_proj.weight"],
                "down_w": flat[p + "mlp.down_proj.weight"],
            })
        else:
            layer.update({
                "ln1_b": flat[p + "norm1.bias"],
                "ln2_b": flat[p + "norm2.bias"],
                "up_w": flat[p + "mlp.fc1.weight"],
                "up_b": flat[p + "mlp.fc1.bias"],
                "down_w": flat[p + "mlp.fc2.weight"],
                "down_b": flat[p + "mlp.fc2.bias"],
            })
        vp["layers"].append(layer)
    return vp, vcfg


def load_mmproj_qwen_gguf(path: Union[str, Path]
                          ) -> Tuple[Dict[str, Any], QwenVisionConfig]:
    """Tower from an mmproj GGUF (Qwen2VLMmproj output: split q/k/v, the
    two temporal Conv3D planes as patch_embd.weight/.1)."""
    from ..formats.gguf import GGUFReader

    r = GGUFReader(path)
    proj = r.get("clip.projector_type")
    if proj not in ("qwen2vl_merger", "qwen2.5vl_merger"):
        raise NotImplementedError(
            "qwen2-vl serving needs a qwen2vl_merger / qwen2.5vl_merger "
            f"mmproj, got {proj!r}")
    v25 = proj == "qwen2.5vl_merger"

    def t(name):
        return jnp.asarray(r.tensor_float(name))

    D = int(r.get("clip.vision.embedding_length"))
    depth = int(r.get("clip.vision.block_count"))
    fullatt: Tuple[int, ...] = ()
    if v25:
        # llama.cpp records the window pattern: full attention every
        # n_wa_pattern blocks (the fullatt indexes are n_wa-1, 2*n_wa-1, ..)
        n_wa = int(r.get("clip.vision.n_wa_pattern", depth))
        fullatt = tuple(range(n_wa - 1, depth, n_wa))
    vcfg = QwenVisionConfig(
        embed_dim=D,
        intermediate_size=int(r.get("clip.vision.feed_forward_length")),
        num_hidden_layers=depth,
        num_attention_heads=int(r.get("clip.vision.attention.head_count")),
        patch_size=int(r.get("clip.vision.patch_size")),
        text_hidden=int(r.get("clip.vision.projection_dim")),
        v25=v25, fullatt=fullatt,
        window_size=int(r.get("clip.vision.window_size", 112)),
    )
    p0 = t("v.patch_embd.weight")      # (D, C, p, p) temporal plane 0
    p1 = t("v.patch_embd.weight.1")
    vp: Dict[str, Any] = {
        "patch_w": jnp.stack([p0, p1], axis=2),  # (D, C, 2, p, p)
        "post_ln_w": t("v.post_ln.weight"),
        "post_ln_b": (t("v.post_ln.bias")
                      if "v.post_ln.bias" in r.tensors else None),
        "mm0_w": t("mm.0.weight"), "mm0_b": t("mm.0.bias"),
        "mm2_w": t("mm.2.weight"), "mm2_b": t("mm.2.bias"),
        "layers": [],
    }
    for i in range(vcfg.num_hidden_layers):
        p = f"v.blk.{i}."
        layer = {
            "qkv_w": jnp.concatenate([t(p + "attn_q.weight"),
                                      t(p + "attn_k.weight"),
                                      t(p + "attn_v.weight")]),
            "qkv_b": jnp.concatenate([t(p + "attn_q.bias"),
                                      t(p + "attn_k.bias"),
                                      t(p + "attn_v.bias")]),
            "o_w": t(p + "attn_out.weight"), "o_b": t(p + "attn_out.bias"),
            "ln1_w": t(p + "ln1.weight"), "ln2_w": t(p + "ln2.weight"),
        }
        if v25:
            layer.update({
                "gate_w": t(p + "ffn_gate.weight"),
                "up_w": t(p + "ffn_up.weight"),
                "down_w": t(p + "ffn_down.weight"),
            })
        else:
            layer.update({
                "ln1_b": t(p + "ln1.bias"), "ln2_b": t(p + "ln2.bias"),
                "up_w": t(p + "ffn_up.weight"),
                "up_b": t(p + "ffn_up.bias"),
                "down_w": t(p + "ffn_down.weight"),
                "down_b": t(p + "ffn_down.bias"),
            })
        vp["layers"].append(layer)
    return vp, vcfg


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill_mrope(params, cfg: LlamaConfig, ids, cache, soft, mask, pos3):
    logits, cache = qmodel.forward_cached(
        params, cfg, ids, cache, embeds_override=soft, override_mask=mask,
        rope_positions=pos3)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_mrope(params, cfg: LlamaConfig, tokens, cache, pos):
    pos3 = jnp.broadcast_to(pos.reshape(1, 1, 1), (3, tokens.shape[0], 1))
    logits, cache = qmodel.forward_cached(
        params, cfg, tokens[:, None], cache, rope_positions=pos3)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def generate_with_images(
    params, cfg: LlamaConfig, vp, vcfg: QwenVisionConfig,
    input_ids: np.ndarray, patches: np.ndarray, grid_hw: Tuple[int, int],
    image_token_id: int, max_new_tokens: int = 32,
    eos_token_id: Optional[int] = None, max_len: Optional[int] = None,
) -> List[int]:
    """Greedy qwen2-vl generation for one image: patches (seq, C*T*p*p) in
    the HF processor layout with grid_hw = (grid_h, grid_w) BEFORE merge;
    input_ids contains (grid_h*grid_w)/merge^2 image tokens."""
    ids = np.asarray(input_ids).reshape(1, -1)
    S = ids.shape[1]
    max_len = max_len or (S + max_new_tokens)
    s = vcfg.spatial_merge_size
    soft = encode_patches(vp, vcfg, jnp.asarray(patches), grid_hw)
    mask = ids[0] == image_token_id
    if int(mask.sum()) != soft.shape[0]:
        raise ValueError(
            f"prompt has {int(mask.sum())} image tokens, tower made "
            f"{soft.shape[0]}")
    pos3, nxt = qwen2vl_positions(
        ids[0], image_token_id, [(grid_hw[0] // s, grid_hw[1] // s)])
    over = np.zeros((1, S, cfg.hidden_size), np.float32)
    over[0, mask] = np.asarray(soft, np.float32)
    cache = qmodel.init_cache(cfg, 1, max_len, dtype=jnp.bfloat16)
    tok, cache = _prefill_mrope(
        params, cfg, jnp.asarray(ids), cache, jnp.asarray(over),
        jnp.asarray(mask)[None, :], jnp.asarray(pos3[:, None, :]))
    out = [int(tok[0])]
    tokens = tok
    for step in range(max_new_tokens - 1):
        if eos_token_id is not None and out[-1] == eos_token_id:
            break
        tokens, cache = _decode_mrope(
            params, cfg, tokens, cache, jnp.asarray(nxt + step, jnp.int32))
        out.append(int(tokens[0]))
    return out
