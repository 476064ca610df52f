"""BERT-family encoder forward + embeddings (TPU-native, jitted).

The reference only *packs* encoder checkpoints into GGUFs (BertModel and
friends, pack_gptq_into_gguf.py:4518-4594) and leaves running them to
llama.cpp's embedding server. This repo's serving engine replaces
llama.cpp, so the encoder forward lives here: a functional pytree model
(token/type/position embeddings, post-LN bidirectional attention, GELU
FFN) with CLS/MEAN pooling, loadable from either an HF checkpoint dir or
a bert-arch GGUF produced by export/packer.py (tensor names follow
llama.cpp's bert graph: token_embd/token_types/position_embd/
token_embd_norm, blk.N.attn_{q,k,v,output}, attn_output_norm, ffn_up,
ffn_down, layer_output_norm).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BertConfig", "load_gguf_encoder", "load_hf_encoder",
           "encode", "pooled_embedding", "rank_score", "apply_lora_gguf"]

# llama.cpp PoolingType values
POOL_NONE, POOL_MEAN, POOL_CLS, POOL_LAST = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pooling_type: int = POOL_CLS
    rope_theta: Optional[float] = None  # jina-bert-v3: NeoX rope, no table
    dtype: Any = jnp.float32


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def encode(params: Dict[str, Any], cfg: BertConfig, ids: jax.Array,
           mask: Optional[jax.Array] = None) -> jax.Array:
    """Bidirectional encoder forward. ids/mask: (B, S). Returns (B, S, H)."""
    B, S = ids.shape
    if mask is None:
        mask = jnp.ones((B, S), jnp.float32)
    mask = mask.astype(jnp.float32)
    h = params["token_embd"][ids]
    if params.get("token_types") is not None:
        h = h + params["token_types"][0]  # all-zero segment ids
    if params.get("position_embd") is not None:
        h = h + params["position_embd"][:S]
    h = _ln(h, params["embd_norm_w"], params["embd_norm_b"],
            cfg.layer_norm_eps)
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    neg = jnp.finfo(jnp.float32).min
    attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)
    rope = None
    if cfg.rope_theta:  # jina-bert-v3: NeoX rotary instead of a table
        inv = 1.0 / (cfg.rope_theta ** (
            jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
        ang = jnp.arange(S, dtype=jnp.float32)[:, None] * inv
        ang = jnp.concatenate([ang, ang], axis=-1)
        cos_r, sin_r = jnp.cos(ang), jnp.sin(ang)

        def rope(t):  # (B, nh, S, hd)
            t1, t2 = t[..., : hd // 2], t[..., hd // 2:]
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return t * cos_r[None, None] + rot * sin_r[None, None]

    for layer in params["layers"]:
        q = h @ layer["q_w"].T + layer["q_b"]
        k = h @ layer["k_w"].T + layer["k_b"]
        v = h @ layer["v_w"].T + layer["v_b"]
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        if rope is not None:
            q, k = rope(q), rope(k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        att = jax.nn.softmax(scores + attn_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)
        h = _ln(h + ctx @ layer["o_w"].T + layer["o_b"],
                layer["attn_norm_w"], layer["attn_norm_b"],
                cfg.layer_norm_eps)
        ff = jax.nn.gelu(h @ layer["up_w"].T + layer["up_b"],
                         approximate=False)
        h = _ln(h + ff @ layer["down_w"].T + layer["down_b"],
                layer["out_norm_w"], layer["out_norm_b"],
                cfg.layer_norm_eps)
    return h


def pooled_embedding(params: Dict[str, Any], cfg: BertConfig, ids: jax.Array,
                     mask: Optional[jax.Array] = None,
                     normalize: bool = True) -> jax.Array:
    """(B, S) token ids -> (B, H) sentence embeddings (CLS or masked mean,
    L2-normalized like llama.cpp's --embd-normalize default)."""
    B, S = ids.shape
    if mask is None:
        mask = jnp.ones((B, S), jnp.float32)
    mask = mask.astype(jnp.float32)
    h = encode(params, cfg, ids, mask)
    if cfg.pooling_type == POOL_MEAN:
        out = jnp.sum(h * mask[..., None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1.0)
    elif cfg.pooling_type == POOL_LAST:
        last = jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
        out = jnp.take_along_axis(h, last[:, None, None], axis=1)[:, 0]
    else:  # CLS (also the fallback for NONE)
        out = h[:, 0]
    if normalize:
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out


def rank_score(params: Dict[str, Any], cfg: BertConfig, ids: jax.Array,
               mask: Optional[jax.Array] = None) -> jax.Array:
    """Relevance score for rerankers: CLS token through the packed
    classification head (Roberta-style dense+tanh then out_proj — the
    llama.cpp RANK pooling path). Returns (B,) logits."""
    h = encode(params, cfg, ids, mask)
    x = h[:, 0]
    if params.get("cls_w") is not None:
        x = jnp.tanh(x @ params["cls_w"].T + params["cls_b"])
    if params.get("cls_out_w") is not None:
        x = x @ params["cls_out_w"].T + params["cls_out_b"]
    return x[..., 0]


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def _cfg_from_gguf(r) -> BertConfig:
    a = r.get("general.architecture")
    pool = r.get(f"{a}.pooling_type")
    return BertConfig(
        vocab_size=int(r.get(f"{a}.vocab_size")),
        hidden_size=int(r.get(f"{a}.embedding_length")),
        intermediate_size=int(r.get(f"{a}.feed_forward_length")),
        num_hidden_layers=int(r.get(f"{a}.block_count")),
        num_attention_heads=int(r.get(f"{a}.attention.head_count")),
        max_position_embeddings=int(r.get(f"{a}.context_length", 512)),
        type_vocab_size=int(r.get("tokenizer.ggml.token_type_count", 1)),
        layer_norm_eps=float(r.get(f"{a}.attention.layer_norm_epsilon",
                                   1e-12)),
        pooling_type=int(pool) if pool is not None else POOL_CLS,
    )


def load_gguf_encoder(path: Union[str, Path]
                      ) -> Tuple[Dict[str, Any], BertConfig]:
    """Load a bert-arch GGUF (this repo's packer output / llama.cpp
    convention) into the encoder pytree."""
    from ..formats.gguf import GGUFReader

    r = GGUFReader(path)
    arch = r.get("general.architecture")
    if arch not in ("bert", "jina-bert-v3"):
        raise NotImplementedError(
            f"encoder loading supports bert/jina-bert-v3, got {arch!r}")
    cfg = _cfg_from_gguf(r)
    if arch == "jina-bert-v3":
        cfg = dataclasses.replace(
            cfg, rope_theta=float(r.get(f"{arch}.rope.freq_base", 10000.0)),
            pooling_type=int(r.get(f"{arch}.pooling_type", POOL_MEAN)))

    def t(name, required=True):
        if name not in r.tensors:
            if required:
                raise KeyError(f"{path}: missing tensor {name}")
            return None
        return jnp.asarray(r.tensor_float(name))

    params: Dict[str, Any] = {
        "token_embd": t("token_embd.weight"),
        "token_types": t("token_types.weight", required=False),
        "position_embd": t("position_embd.weight", required=False),
        "embd_norm_w": t("token_embd_norm.weight"),
        "embd_norm_b": t("token_embd_norm.bias"),
        "layers": [],
    }
    # sequence-classifier head (rerankers): cls (+tanh) then cls.output
    for k, name in (("cls_w", "cls.weight"), ("cls_b", "cls.bias"),
                    ("cls_out_w", "cls.output.weight"),
                    ("cls_out_b", "cls.output.bias")):
        params[k] = t(name, required=False)
    for i in range(cfg.num_hidden_layers):
        p = f"blk.{i}."
        params["layers"].append({
            "q_w": t(p + "attn_q.weight"), "q_b": t(p + "attn_q.bias"),
            "k_w": t(p + "attn_k.weight"), "k_b": t(p + "attn_k.bias"),
            "v_w": t(p + "attn_v.weight"), "v_b": t(p + "attn_v.bias"),
            "o_w": t(p + "attn_output.weight"),
            "o_b": t(p + "attn_output.bias"),
            "attn_norm_w": t(p + "attn_output_norm.weight"),
            "attn_norm_b": t(p + "attn_output_norm.bias"),
            "up_w": t(p + "ffn_up.weight"), "up_b": t(p + "ffn_up.bias"),
            "down_w": t(p + "ffn_down.weight"),
            "down_b": t(p + "ffn_down.bias"),
            "out_norm_w": t(p + "layer_output_norm.weight"),
            "out_norm_b": t(p + "layer_output_norm.bias"),
        })
    return params, cfg


def apply_lora_gguf(params: Dict[str, Any], cfg: BertConfig,
                    adapter_path: Union[str, Path]) -> Dict[str, Any]:
    """Merge a LoRA adapter GGUF (general.type=adapter, llama.cpp layout:
    <base>.lora_a (r, in) / <base>.lora_b (out, r)) into the encoder
    pytree: W' = W + (alpha / r) * B @ A. The jina-v3 embedding adapters
    store token_embd's b transposed; orientation is resolved against the
    target shape. Returns a new params dict."""
    from ..formats.gguf import GGUFReader

    r = GGUFReader(adapter_path)
    if r.get("general.type") != "adapter" or r.get("adapter.type") != "lora":
        raise ValueError(f"{adapter_path} is not a LoRA adapter GGUF")
    alpha = float(r.get("adapter.lora.alpha", 1.0))

    key_map = {"token_embd.weight": ("token_embd",),
               "token_types.weight": ("token_types",),
               "position_embd.weight": ("position_embd",)}
    blk = {"attn_q": "q", "attn_k": "k", "attn_v": "v",
           "attn_output": "o", "ffn_up": "up", "ffn_down": "down"}

    def locate(base):
        if base in key_map:
            return key_map[base]
        parts = base.split(".")  # blk.N.attn_q.weight
        if parts[0] == "blk" and parts[2] in blk:
            return ("layers", int(parts[1]), blk[parts[2]] + "_w")
        return None

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    params["layers"] = [dict(l) for l in params["layers"]]
    n_applied = 0
    for name in list(r.tensors):
        if not name.endswith(".lora_a"):
            continue
        base = name[: -len(".lora_a")]
        where = locate(base)
        if where is None:
            continue
        a = np.asarray(r.tensor_float(name), np.float32)
        b = np.asarray(r.tensor_float(base + ".lora_b"), np.float32)
        target = params
        for k in where[:-1]:
            target = target[k] if not isinstance(k, int) else target[k]
        w = np.asarray(target[where[-1]], np.float32)
        rank = min(a.shape + b.shape)
        scale = alpha / rank
        for delta in (lambda: b @ a, lambda: a @ b.T,
                      lambda: a @ b, lambda: b.T @ a.T):
            try:
                d = delta()
            except ValueError:
                continue
            if d.shape == w.shape:
                target[where[-1]] = jnp.asarray(w + scale * d)
                n_applied += 1
                break
        else:
            raise ValueError(f"{base}: lora shapes {a.shape}/{b.shape} do "
                             f"not compose to {w.shape}")
    if n_applied == 0:
        raise ValueError(f"{adapter_path}: no applicable LoRA tensors")
    return params


def load_hf_encoder(model_dir: Union[str, Path]
                    ) -> Tuple[Dict[str, Any], BertConfig]:
    """Load an HF BERT checkpoint dir (safetensors) into the pytree."""
    import json

    from .loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        c = json.load(f)
    cfg = BertConfig(
        vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_hidden_layers=c["num_hidden_layers"],
        num_attention_heads=c["num_attention_heads"],
        max_position_embeddings=c.get("max_position_embeddings", 512),
        type_vocab_size=c.get("type_vocab_size", 2),
        layer_norm_eps=c.get("layer_norm_eps", 1e-12),
    )
    flat = {}
    for name, arr in _iter_safetensors(model_dir):
        for pre in ("bert.", "roberta."):
            if name.startswith(pre):
                name = name[len(pre):]
        flat[name] = jnp.asarray(_to_f32(np.asarray(arr)))

    def g(n):
        return flat[n]

    params: Dict[str, Any] = {
        "token_embd": g("embeddings.word_embeddings.weight"),
        "token_types": flat.get("embeddings.token_type_embeddings.weight"),
        "position_embd": flat.get("embeddings.position_embeddings.weight"),
        "embd_norm_w": g("embeddings.LayerNorm.weight"),
        "embd_norm_b": g("embeddings.LayerNorm.bias"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        params["layers"].append({
            "q_w": g(p + "attention.self.query.weight"),
            "q_b": g(p + "attention.self.query.bias"),
            "k_w": g(p + "attention.self.key.weight"),
            "k_b": g(p + "attention.self.key.bias"),
            "v_w": g(p + "attention.self.value.weight"),
            "v_b": g(p + "attention.self.value.bias"),
            "o_w": g(p + "attention.output.dense.weight"),
            "o_b": g(p + "attention.output.dense.bias"),
            "attn_norm_w": g(p + "attention.output.LayerNorm.weight"),
            "attn_norm_b": g(p + "attention.output.LayerNorm.bias"),
            "up_w": g(p + "intermediate.dense.weight"),
            "up_b": g(p + "intermediate.dense.bias"),
            "down_w": g(p + "output.dense.weight"),
            "down_b": g(p + "output.dense.bias"),
            "out_norm_w": g(p + "output.LayerNorm.weight"),
            "out_norm_b": g(p + "output.LayerNorm.bias"),
        })
    return params, cfg
