"""Multimodal (vision-language) serving: SigLIP tower + soft-token splice.

The reference packs mmproj GGUFs and delegates running them to llama.cpp's
mtmd runtime; this module is the TPU-native equivalent for SigLIP-towered
families — gemma3 (pixel-pool + zero-centered-RMS projector) and
idefics3/SmolVLM (pixel-shuffle + linear projector): encode an image to
mm_tokens_per_image soft tokens and splice them into the decoder prompt at
the image-token positions (forward_cached's embeds_override). Loads the
tower from either the HF checkpoint or an mmproj GGUF produced by
export/mmproj.py (v.*/mm.* names). Oracles: transformers
Gemma3ForConditionalGeneration / Idefics3 logits parity (tests/test_vlm.py).
Masking is causal-only (HF's no-token_type_ids mode; no bidirectional
image blocks).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from . import engine as eng_mod
from . import model as qmodel

__all__ = ["VisionConfig", "load_hf_vision", "load_mmproj_gguf",
           "siglip_encode", "image_soft_tokens", "generate_with_images",
           "preprocess_image"]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int
    patch_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    layer_norm_eps: float = 1e-6
    mm_tokens_per_image: int = 256
    image_mean: Tuple[float, ...] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, ...] = (0.5, 0.5, 0.5)
    projector: str = "gemma3"   # "gemma3" | "idefics3" | "mistral3"
    scale_factor: int = 2       # idefics3 shuffle / mistral3 merge factor
    rope_theta: float = 10000.0  # pixtral 2D rope base


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def siglip_encode(vp: Dict[str, Any], vcfg: VisionConfig,
                  pixels: jax.Array) -> jax.Array:
    """SigLIP vision encoder. pixels: (B, 3, H, W) normalized. -> (B, N, D)."""
    B = pixels.shape[0]
    D = vcfg.hidden_size
    # patch conv == unfold + matmul (stride = kernel = patch)
    p = vcfg.patch_size
    n_side = vcfg.image_size // p
    x = pixels.reshape(B, 3, n_side, p, n_side, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, n_side * n_side, 3 * p * p)
    w = vp["patch_w"].reshape(D, 3 * p * p)  # (D, 3, p, p) conv kernel
    x = x @ w.T + vp["patch_b"]
    if "pos_ids" in vp:  # idefics3 bucketized ids (see _idefics3_pos_ids)
        x = x + vp["pos_embd"][vp["pos_ids"]]
    else:
        x = x + vp["pos_embd"][: x.shape[1]]
    nh = vcfg.num_attention_heads
    hd = D // nh
    for layer in vp["layers"]:
        h = _ln(x, layer["ln1_w"], layer["ln1_b"], vcfg.layer_norm_eps)
        q = (h @ layer["q_w"].T + layer["q_b"]).reshape(B, -1, nh, hd)
        k = (h @ layer["k_w"].T + layer["k_b"]).reshape(B, -1, nh, hd)
        v = (h @ layer["v_w"].T + layer["v_b"]).reshape(B, -1, nh, hd)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, -1, D)
        x = x + ctx @ layer["o_w"].T + layer["o_b"]
        h = _ln(x, layer["ln2_w"], layer["ln2_b"], vcfg.layer_norm_eps)
        h = jax.nn.gelu(h @ layer["up_w"].T + layer["up_b"], approximate=True)
        x = x + h @ layer["down_w"].T + layer["down_b"]
    return _ln(x, vp["post_ln_w"], vp["post_ln_b"], vcfg.layer_norm_eps)


def _rms(x, w, eps):
    return x / jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2, axis=-1,
                                 keepdims=True) + eps) * w


def pixtral_encode(vp: Dict[str, Any], vcfg: VisionConfig,
                   pixels: jax.Array) -> jax.Array:
    """Pixtral ViT: RMS pre-norm blocks, 2D rope over the patch grid, silu
    gated MLP, no position table and no post norm. -> (B, N, D)."""
    B = pixels.shape[0]
    D = vcfg.hidden_size
    p = vcfg.patch_size
    n_side = vcfg.image_size // p
    x = pixels.reshape(B, 3, n_side, p, n_side, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, n_side * n_side, 3 * p * p)
    x = x @ vp["patch_w"].reshape(D, 3 * p * p).T
    if "patch_b" in vp and vp["patch_b"] is not None:
        x = x + vp["patch_b"]
    x = _rms(x, vp["pre_ln_w"], 1e-5)
    nh = vcfg.num_attention_heads
    hd = D // nh
    # 2D rope (PixtralRotaryEmbedding): even inv-freqs take the row index,
    # odd ones the column index; table then duplicated for rotate_half
    freqs = 1.0 / (vcfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    pos = jnp.arange(n_side, dtype=jnp.float32)
    fh = jnp.einsum("h,f->hf", pos, freqs[::2])
    fw = jnp.einsum("w,f->wf", pos, freqs[1::2])
    grid = jnp.concatenate([
        jnp.broadcast_to(fh[:, None, :], (n_side, n_side, fh.shape[-1])),
        jnp.broadcast_to(fw[None, :, :], (n_side, n_side, fw.shape[-1])),
    ], axis=-1).reshape(n_side * n_side, hd // 2)
    ang = jnp.concatenate([grid, grid], axis=-1)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope(t):  # (B, S, nh, hd) rotate_half convention
        t1, t2 = t[..., : hd // 2], t[..., hd // 2:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return t * cos[None, :, None, :] + rot * sin[None, :, None, :]

    for layer in vp["layers"]:
        h = _rms(x, layer["ln1_w"], 1e-5)
        q = (h @ layer["q_w"].T).reshape(B, -1, nh, hd)
        k = (h @ layer["k_w"].T).reshape(B, -1, nh, hd)
        v = (h @ layer["v_w"].T).reshape(B, -1, nh, hd)
        q, k = rope(q), rope(k)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, -1, D)
        x = x + ctx @ layer["o_w"].T
        h = _rms(x, layer["ln2_w"], 1e-5)
        h = jax.nn.silu(h @ layer["gate_w"].T) * (h @ layer["up_w"].T)
        x = x + h @ layer["down_w"].T
    return x


def image_soft_tokens(vp: Dict[str, Any], vcfg: VisionConfig,
                      pixels: jax.Array) -> jax.Array:
    """(B, 3, H, W) -> (B, mm_tokens_per_image, text_hidden).

    gemma3: SigLIP encode, average-pool the patch grid to the soft-token
    grid, zero-centered RMS norm (weights stored (1+w)-folded, the GGUF
    convention), project. idefics3/smolvlm: SigLIP encode, pixel shuffle
    (space-to-depth by scale_factor), single linear projection."""
    if vcfg.projector == "mistral3":
        feats = pixtral_encode(vp, vcfg, pixels)
    else:
        feats = siglip_encode(vp, vcfg, pixels)  # (B, N, D)
    B, N, D = feats.shape
    p_side = vcfg.image_size // vcfg.patch_size
    if vcfg.projector == "mistral3":
        s = vcfg.scale_factor
        g = _rms(feats, vp["input_norm_w"], 1e-5)
        # PatchMerger: s x s unfold, CHANNEL-major feature order (torch
        # unfold semantics), then merging_layer
        g = g.reshape(B, p_side // s, s, p_side // s, s, D)
        g = g.transpose(0, 1, 3, 5, 2, 4).reshape(
            B, (p_side // s) ** 2, D * s * s)
        g = g @ vp["patch_merger_w"].T
        g = jax.nn.gelu(g @ vp["mm1_w"].T + vp.get("mm1_b", 0.0),
                        approximate=False)
        return g @ vp["mm2_w"].T + vp.get("mm2_b", 0.0)
    if vcfg.projector == "idefics3":
        s = vcfg.scale_factor
        g = feats.reshape(B, p_side, p_side, D)
        g = g.reshape(B, p_side, p_side // s, D * s).transpose(0, 2, 1, 3)
        g = g.reshape(B, p_side // s, p_side // s, D * s * s)
        g = g.transpose(0, 2, 1, 3).reshape(B, N // (s * s), D * s * s)
        return g @ vp["input_projection"].T  # Linear (text_h, D*s^2)
    t_side = int(round(vcfg.mm_tokens_per_image ** 0.5))
    k = p_side // t_side
    g = feats.reshape(B, p_side, p_side, D)
    g = g.reshape(B, t_side, k, t_side, k, D).mean(axis=(2, 4))
    g = g.reshape(B, t_side * t_side, D)
    rms = jnp.sqrt(jnp.mean(g.astype(jnp.float32) ** 2, axis=-1,
                            keepdims=True) + vcfg.layer_norm_eps)
    g = g / rms * vp["soft_emb_norm_w"]  # folded (1+w)
    return g @ vp["input_projection"]  # (D, text_hidden)


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def _idefics3_pos_ids(n_side: int) -> np.ndarray:
    """Idefics3VisionEmbeddings bucketizes fractional patch coordinates
    scaled by (1 - 1e-6); for a full square image the per-axis buckets come
    out [0, 0, 1, ..., n-2] (the last position row is never used) — an HF
    quirk we replicate for parity."""
    axis = np.floor(np.arange(n_side) * (1 - 1e-6)).astype(np.int64)
    return (axis[:, None] * n_side + axis[None, :]).reshape(-1)


def load_hf_vision(model_dir: Union[str, Path]
                   ) -> Tuple[Dict[str, Any], VisionConfig]:
    """Vision tower + projector from a gemma3- or idefics3/smolvlm-family
    HF checkpoint."""
    import json

    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        cfg = json.load(f)
    v = cfg["vision_config"]
    mt = cfg.get("model_type", "gemma3")
    if mt in ("idefics3", "smolvlm"):
        projector = "idefics3"
    elif mt in ("mistral3", "pixtral"):
        projector = "mistral3"
    else:
        projector = "gemma3"
    scale = int(cfg.get("scale_factor", cfg.get("spatial_merge_size", 2)))
    p_side = v["image_size"] // v["patch_size"]
    vcfg = VisionConfig(
        image_size=v["image_size"], patch_size=v["patch_size"],
        hidden_size=v["hidden_size"], intermediate_size=v["intermediate_size"],
        num_hidden_layers=v["num_hidden_layers"],
        num_attention_heads=v["num_attention_heads"],
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        mm_tokens_per_image=(
            (p_side // scale) ** 2 if projector in ("idefics3", "mistral3")
            else cfg.get("mm_tokens_per_image", 256)),
        projector=projector, scale_factor=scale,
        rope_theta=float(v.get("rope_theta", 10000.0)),
    )
    flat = {}
    for name, arr in _iter_safetensors(model_dir):
        if name.startswith("model."):
            name = name[len("model."):]
        flat[name] = jnp.asarray(_to_f32(np.asarray(arr)))
    if projector == "mistral3":
        return _load_hf_pixtral(flat, vcfg), vcfg
    pre = ("vision_model." if projector == "idefics3"
           else "vision_tower.vision_model.")
    vp: Dict[str, Any] = {
        "patch_w": flat[pre + "embeddings.patch_embedding.weight"],
        "patch_b": flat[pre + "embeddings.patch_embedding.bias"],
        "pos_embd": flat[pre + "embeddings.position_embedding.weight"],
        "post_ln_w": flat[pre + "post_layernorm.weight"],
        "post_ln_b": flat[pre + "post_layernorm.bias"],
        "layers": [],
    }
    if projector == "idefics3":
        vp["input_projection"] = flat["connector.modality_projection.proj.weight"]
        vp["pos_ids"] = jnp.asarray(_idefics3_pos_ids(p_side))
    else:
        vp["soft_emb_norm_w"] = \
            flat["multi_modal_projector.mm_soft_emb_norm.weight"] + 1.0
        vp["input_projection"] = \
            flat["multi_modal_projector.mm_input_projection_weight"]
    for i in range(vcfg.num_hidden_layers):
        p = f"{pre}encoder.layers.{i}."
        vp["layers"].append({
            "q_w": flat[p + "self_attn.q_proj.weight"],
            "q_b": flat[p + "self_attn.q_proj.bias"],
            "k_w": flat[p + "self_attn.k_proj.weight"],
            "k_b": flat[p + "self_attn.k_proj.bias"],
            "v_w": flat[p + "self_attn.v_proj.weight"],
            "v_b": flat[p + "self_attn.v_proj.bias"],
            "o_w": flat[p + "self_attn.out_proj.weight"],
            "o_b": flat[p + "self_attn.out_proj.bias"],
            "ln1_w": flat[p + "layer_norm1.weight"],
            "ln1_b": flat[p + "layer_norm1.bias"],
            "ln2_w": flat[p + "layer_norm2.weight"],
            "ln2_b": flat[p + "layer_norm2.bias"],
            "up_w": flat[p + "mlp.fc1.weight"],
            "up_b": flat[p + "mlp.fc1.bias"],
            "down_w": flat[p + "mlp.fc2.weight"],
            "down_b": flat[p + "mlp.fc2.bias"],
        })
    return vp, vcfg


def _load_hf_pixtral(flat: Dict[str, Any], vcfg: VisionConfig
                     ) -> Dict[str, Any]:
    pre = "vision_tower."
    vp: Dict[str, Any] = {
        "patch_w": flat[pre + "patch_conv.weight"],
        "patch_b": flat.get(pre + "patch_conv.bias"),
        "pre_ln_w": flat[pre + "ln_pre.weight"],
        "input_norm_w": flat["multi_modal_projector.norm.weight"],
        "patch_merger_w":
            flat["multi_modal_projector.patch_merger.merging_layer.weight"],
        "mm1_w": flat["multi_modal_projector.linear_1.weight"],
        "mm2_w": flat["multi_modal_projector.linear_2.weight"],
        "layers": [],
    }
    for opt, key in (("mm1_b", "multi_modal_projector.linear_1.bias"),
                     ("mm2_b", "multi_modal_projector.linear_2.bias")):
        if key in flat:
            vp[opt] = flat[key]
    for i in range(vcfg.num_hidden_layers):
        p = f"{pre}transformer.layers.{i}."
        vp["layers"].append({
            "q_w": flat[p + "attention.q_proj.weight"],
            "k_w": flat[p + "attention.k_proj.weight"],
            "v_w": flat[p + "attention.v_proj.weight"],
            "o_w": flat[p + "attention.o_proj.weight"],
            "ln1_w": flat[p + "attention_norm.weight"],
            "ln2_w": flat[p + "ffn_norm.weight"],
            "gate_w": flat[p + "feed_forward.gate_proj.weight"],
            "up_w": flat[p + "feed_forward.up_proj.weight"],
            "down_w": flat[p + "feed_forward.down_proj.weight"],
        })
    return vp


def load_mmproj_gguf(path: Union[str, Path]
                     ) -> Tuple[Dict[str, Any], VisionConfig]:
    """Vision tower + projector from an mmproj GGUF (export/mmproj.py)."""
    from ..formats.gguf import GGUFReader

    r = GGUFReader(path)
    proj = r.get("clip.projector_type")
    if proj not in ("gemma3", "idefics3", "pixtral"):
        raise NotImplementedError(
            "vision serving supports the gemma3/idefics3/pixtral "
            f"projectors, got {proj!r}")
    n_side2 = (r.get("clip.vision.image_size")
               // r.get("clip.vision.patch_size"))
    if proj == "pixtral":
        scale = r.get("clip.vision.spatial_merge_size", 2)
    else:
        scale = r.get("clip.vision.projector.scale_factor",
                      4 if proj == "gemma3" else 2)
    vcfg = VisionConfig(
        image_size=int(r.get("clip.vision.image_size")),
        patch_size=int(r.get("clip.vision.patch_size")),
        hidden_size=int(r.get("clip.vision.embedding_length")),
        intermediate_size=int(r.get("clip.vision.feed_forward_length")),
        num_hidden_layers=int(r.get("clip.vision.block_count")),
        num_attention_heads=int(r.get("clip.vision.attention.head_count")),
        layer_norm_eps=float(
            r.get("clip.vision.attention.layer_norm_epsilon", 1e-6)),
        mm_tokens_per_image=(n_side2 // scale) ** 2,
        image_mean=tuple(r.get("clip.vision.image_mean", [0.5] * 3)),
        image_std=tuple(r.get("clip.vision.image_std", [0.5] * 3)),
        projector="mistral3" if proj == "pixtral" else proj,
        scale_factor=int(scale),
        rope_theta=float(r.get("clip.vision.rope.freq_base", 10000.0)),
    )

    def t(name):
        return jnp.asarray(r.tensor_float(name))

    if proj == "pixtral":
        vp: Dict[str, Any] = {
            "patch_w": t("v.patch_embd.weight"),
            "pre_ln_w": t("v.pre_ln.weight"),
            "input_norm_w": t("mm.input_norm.weight"),
            "patch_merger_w": t("mm.patch_merger.weight"),
            "mm1_w": t("mm.1.weight"),
            "mm2_w": t("mm.2.weight"),
            "layers": [],
        }
        for opt, key in (("mm1_b", "mm.1.bias"), ("mm2_b", "mm.2.bias")):
            if key in r.tensors:
                vp[opt] = t(key)
        for i in range(vcfg.num_hidden_layers):
            p = f"v.blk.{i}."
            vp["layers"].append({
                "q_w": t(p + "attn_q.weight"), "k_w": t(p + "attn_k.weight"),
                "v_w": t(p + "attn_v.weight"), "o_w": t(p + "attn_out.weight"),
                "ln1_w": t(p + "ln1.weight"), "ln2_w": t(p + "ln2.weight"),
                "gate_w": t(p + "ffn_gate.weight"),
                "up_w": t(p + "ffn_up.weight"),
                "down_w": t(p + "ffn_down.weight"),
            })
        return vp, vcfg

    vp: Dict[str, Any] = {
        "patch_w": t("v.patch_embd.weight"),
        "patch_b": t("v.patch_embd.bias"),
        "pos_embd": t("v.position_embd.weight"),
        "post_ln_w": t("v.post_ln.weight"),
        "post_ln_b": t("v.post_ln.bias"),
        "layers": [],
    }
    if proj == "idefics3":
        vp["input_projection"] = t("mm.model.fc.weight")
        vp["pos_ids"] = jnp.asarray(_idefics3_pos_ids(n_side2))
    else:
        vp["soft_emb_norm_w"] = t("mm.soft_emb_norm.weight")  # folded
        vp["input_projection"] = t("mm.input_projection.weight")
    for i in range(vcfg.num_hidden_layers):
        p = f"v.blk.{i}."
        vp["layers"].append({
            "q_w": t(p + "attn_q.weight"), "q_b": t(p + "attn_q.bias"),
            "k_w": t(p + "attn_k.weight"), "k_b": t(p + "attn_k.bias"),
            "v_w": t(p + "attn_v.weight"), "v_b": t(p + "attn_v.bias"),
            "o_w": t(p + "attn_out.weight"), "o_b": t(p + "attn_out.bias"),
            "ln1_w": t(p + "ln1.weight"), "ln1_b": t(p + "ln1.bias"),
            "ln2_w": t(p + "ln2.weight"), "ln2_b": t(p + "ln2.bias"),
            "up_w": t(p + "ffn_up.weight"), "up_b": t(p + "ffn_up.bias"),
            "down_w": t(p + "ffn_down.weight"),
            "down_b": t(p + "ffn_down.bias"),
        })
    return vp, vcfg


def preprocess_image(path: Union[str, Path], vcfg: VisionConfig) -> np.ndarray:
    """Image file -> (1, 3, S, S) normalized pixels (bilinear resize,
    rescale 1/255, mean/std normalize — the gemma3 processor recipe)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize(
        (vcfg.image_size, vcfg.image_size), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    x = (x - np.asarray(vcfg.image_mean)) / np.asarray(vcfg.image_std)
    return x.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vlm_prefill(params, cfg: LlamaConfig, ids, cache, soft, mask,
                 spans=None):
    logits, cache = qmodel.forward_cached(
        params, cfg, ids, cache, embeds_override=soft, override_mask=mask,
        bidir_spans=spans)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def _image_spans(mask: np.ndarray) -> np.ndarray:
    """1-based span ids for contiguous image-token runs, 0 for text."""
    spans = np.zeros(mask.shape, np.int32)
    run = 0
    prev = False
    for i, m in enumerate(mask):
        if m:
            if not prev:
                run += 1
            spans[i] = run
        prev = bool(m)
    return spans


def generate_with_soft_tokens(
    params, cfg: LlamaConfig, input_ids: np.ndarray, soft: jax.Array,
    token_id: int, max_new_tokens: int = 32,
    eos_token_id: Optional[int] = None, max_len: Optional[int] = None,
    bidirectional_images: bool = False,
) -> List[int]:
    """Greedy generation with (n_soft, H) soft embeddings spliced at the
    positions where input_ids == token_id. bidirectional_images lets each
    contiguous image run attend bidirectionally within itself (gemma3
    token_type_ids semantics)."""
    ids = np.asarray(input_ids).reshape(1, -1)
    S = ids.shape[1]
    max_len = max_len or (S + max_new_tokens)
    soft = soft.reshape(-1, soft.shape[-1])
    mask = ids[0] == token_id
    if int(mask.sum()) != soft.shape[0]:
        raise ValueError(
            f"prompt has {int(mask.sum())} soft-token slots but the encoder "
            f"supplied {soft.shape[0]} soft tokens")
    # scatter soft tokens into a (1, S, H) override buffer
    over = np.zeros((1, S, soft.shape[-1]), np.float32)
    over[0, mask] = np.asarray(soft, np.float32)
    spans = (jnp.asarray(_image_spans(mask))[None, :]
             if bidirectional_images else None)
    cache = qmodel.init_cache(cfg, 1, max_len, dtype=jnp.bfloat16)
    tok, cache = _vlm_prefill(params, cfg, jnp.asarray(ids), cache,
                              jnp.asarray(over), jnp.asarray(mask)[None, :],
                              spans)
    out = [int(tok[0])]
    tokens = tok
    for _ in range(max_new_tokens - 1):
        if eos_token_id is not None and out[-1] == eos_token_id:
            break
        tokens, _, cache = eng_mod._decode_step(params, cfg, tokens, cache)
        out.append(int(tokens[0]))
    return out


def generate_with_images(
    params, cfg: LlamaConfig, vp, vcfg: VisionConfig,
    input_ids: np.ndarray, pixel_values: np.ndarray,
    image_token_id: int, max_new_tokens: int = 32,
    eos_token_id: Optional[int] = None, max_len: Optional[int] = None,
    bidirectional_images: Optional[bool] = None,
) -> List[int]:
    """Greedy generation with images spliced at the image-token positions.

    input_ids: (S,) containing n_images * mm_tokens_per_image occurrences of
    image_token_id; pixel_values: (n_images, 3, S, S) normalized.
    bidirectional_images defaults on for gemma3 (trained with token_type_ids
    image blocks attending bidirectionally).
    """
    if bidirectional_images is None:
        bidirectional_images = vcfg.projector == "gemma3"
    soft = image_soft_tokens(vp, vcfg, jnp.asarray(pixel_values))
    return generate_with_soft_tokens(
        params, cfg, input_ids, soft, image_token_id,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        max_len=max_len, bidirectional_images=bidirectional_images)
