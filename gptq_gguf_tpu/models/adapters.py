"""HF checkpoint-name canonicalization per model family.

The reference inherits per-architecture tensor handling from its vendored
llama.cpp converter (quant/gptq/pack_gptq_into_gguf.py ModelBase.register
subclasses, :513-536): each family's ``modify_tensors`` renames and splits
raw checkpoint tensors. Here that logic is a single shared pre-pass used by
*both* the pytree loader (models/loader.py) and the GGUF packer
(export/packer.py): every raw ``(name, array)`` pair is translated into the
canonical llama-style names (``model.layers.N.self_attn.q_proj.weight`` ...)
that the functional model, the calibration artifacts, and the ArchSpec
registry all speak. Fused projections (internlm2 ``wqkv``, baichuan
``W_pack``) are split here so downstream code never sees them.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["canonicalize", "iter_canonical_tensors"]


def _exaone(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """EXAONE (LG) ``transformer.h.N.attn.attention.*`` scheme -> canonical."""
    fixed = {
        "transformer.wte.weight": "model.embed_tokens.weight",
        "transformer.ln_f.weight": "model.norm.weight",
        "lm_head.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("transformer.h."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    m = {
        "ln_1.weight": "input_layernorm.weight",
        "ln_2.weight": "post_attention_layernorm.weight",
        "attn.attention.q_proj.weight": "self_attn.q_proj.weight",
        "attn.attention.k_proj.weight": "self_attn.k_proj.weight",
        "attn.attention.v_proj.weight": "self_attn.v_proj.weight",
        "attn.attention.out_proj.weight": "self_attn.o_proj.weight",
        "mlp.c_fc_0.weight": "mlp.gate_proj.weight",
        "mlp.c_fc_1.weight": "mlp.up_proj.weight",
        "mlp.c_proj.weight": "mlp.down_proj.weight",
    }
    if rest not in m:
        return [(name, arr)]
    return [(f"model.layers.{i}.{m[rest]}", arr)]


def _internlm2(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """InternLM2 ``attention.wqkv`` (grouped-interleaved) + w1/w2/w3 scheme.

    wqkv rows are laid out per KV group: [g q-heads, 1 k-head, 1 v-head]
    (modeling_internlm2 rearranges ``(nKV, g+2, hd)``); the split must
    de-interleave, not slice contiguously.
    """
    fixed = {
        "model.tok_embeddings.weight": "model.embed_tokens.weight",
        "model.norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("model.layers."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    if rest == "attention.wqkv.weight":
        g = n_head // n_kv
        r = np.ascontiguousarray(arr).reshape(n_kv, g + 2, head_dim, arr.shape[-1])
        q = r[:, :g].reshape(n_head * head_dim, -1)
        k = r[:, g].reshape(n_kv * head_dim, -1)
        v = r[:, g + 1].reshape(n_kv * head_dim, -1)
        base = f"model.layers.{i}.self_attn"
        return [(f"{base}.q_proj.weight", q), (f"{base}.k_proj.weight", k),
                (f"{base}.v_proj.weight", v)]
    m = {
        "attention_norm.weight": "input_layernorm.weight",
        "ffn_norm.weight": "post_attention_layernorm.weight",
        "attention.wo.weight": "self_attn.o_proj.weight",
        "feed_forward.w1.weight": "mlp.gate_proj.weight",
        "feed_forward.w3.weight": "mlp.up_proj.weight",
        "feed_forward.w2.weight": "mlp.down_proj.weight",
    }
    if rest not in m:
        return [(name, arr)]
    return [(f"model.layers.{i}.{m[rest]}", arr)]


def _baichuan(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """Baichuan ``self_attn.W_pack`` = [q; k; v] row-concat (7B rope models)."""
    if name.startswith("model.layers.") and name.endswith("self_attn.W_pack.weight"):
        i = name.split(".")[2]
        qr = n_head * head_dim
        kr = n_kv * head_dim
        base = f"model.layers.{i}.self_attn"
        return [(f"{base}.q_proj.weight", arr[:qr]),
                (f"{base}.k_proj.weight", arr[qr:qr + kr]),
                (f"{base}.v_proj.weight", arr[qr + kr:qr + 2 * kr])]
    return [(name, arr)]


def _deepseek(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """DeepSeek v1: canonical names except the fused shared-expert MLP is
    plural (``mlp.shared_experts.*``); map it to the qwen2moe-style singular
    the calibrator/packer/loader use."""
    if ".mlp.shared_experts." in name:
        return [(name.replace(".mlp.shared_experts.", ".mlp.shared_expert."), arr)]
    return [(name, arr)]


def _starcoder2(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """starcoder2: gateless MLP named c_fc/c_proj (weights and biases)."""
    for old, new in (("mlp.c_fc.", "mlp.up_proj."), ("mlp.c_proj.", "mlp.down_proj.")):
        if f".{old}" in name:
            return [(name.replace(f".{old}", f".{new}"), arr)]
    return [(name, arr)]


def _phi(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """phi (phi-1/1.5/2): o_proj named dense, gateless fc1/fc2 MLP, final
    norm named final_layernorm."""
    if name.startswith("model.final_layernorm."):
        return [(name.replace("model.final_layernorm.", "model.norm."), arr)]
    for old, new in (
        ("self_attn.dense.", "self_attn.o_proj."),
        ("mlp.fc1.", "mlp.up_proj."),
        ("mlp.fc2.", "mlp.down_proj."),
    ):
        if f".{old}" in name:
            return [(name.replace(f".{old}", f".{new}"), arr)]
    return [(name, arr)]


_CANONICALIZERS = {
    "exaone": _exaone,
    "internlm2": _internlm2,
    "baichuan": _baichuan,
    "deepseek": _deepseek,
    # v2/v3 share v1's plural shared_experts naming
    "deepseek_v2": _deepseek,
    "deepseek_v3": _deepseek,
    "starcoder2": _starcoder2,
    "phi": _phi,
}


def canonicalize(
    model_type: str, name: str, arr, *, n_head: int, n_kv: int, head_dim: int
) -> List[Tuple[str, Any]]:
    """Translate one raw checkpoint tensor into canonical-named tensors."""
    fn = _CANONICALIZERS.get(model_type)
    if fn is None:
        return [(name, arr)]
    return fn(name, arr, n_head, n_kv, head_dim)


def iter_canonical_tensors(tensors, hf_cfg: Dict[str, Any]) -> Iterator[Tuple[str, Any]]:
    """Wrap a raw (name, array) iterator with canonicalization, driven by an
    HF config.json dict."""
    mt = hf_cfg.get("model_type", "llama")
    n_head = hf_cfg["num_attention_heads"]
    n_kv = hf_cfg.get("num_key_value_heads", n_head)
    head_dim = hf_cfg.get("head_dim") or hf_cfg["hidden_size"] // n_head
    for name, arr in tensors:
        yield from canonicalize(mt, name, arr, n_head=n_head, n_kv=n_kv,
                                head_dim=head_dim)
