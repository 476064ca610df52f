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


def _glm4(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """glm4 (GLM-4-0414): gemma2-style sandwich norms under different names.
    HF post_self_attn_layernorm scales the attention output (gemma2's
    post_attention_layernorm slot), HF post_attention_layernorm is the
    pre-MLP norm (gemma2's pre_feedforward slot), post_mlp_layernorm the
    MLP-output norm. gate_up_proj stays fused (loader splits it)."""
    for old, new in (
        ("post_self_attn_layernorm.", "post_attention_layernorm."),
        ("post_attention_layernorm.", "pre_feedforward_layernorm."),
        ("post_mlp_layernorm.", "post_feedforward_layernorm."),
    ):
        if f".{old}" in name:
            return [(name.replace(f".{old}", f".{new}"), arr)]
    return [(name, arr)]


def _granitemoe(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """GraniteMoE (JetMoe-style parallel experts): 3-D fused expert params.
    input_linear (E, 2*I_e, H) holds [gate|up] per expert; output_linear
    (E, H, I_e) is down; router.layer is the gate. Split to the canonical
    per-expert names (reference GraniteMoeModel modify_tensors,
    pack_gptq_into_gguf.py:7523-7538 splits the same way)."""
    if name.endswith("block_sparse_moe.router.layer.weight"):
        return [(name.replace("block_sparse_moe.router.layer.", "mlp.gate."), arr)]
    base = name.rsplit(".block_sparse_moe.", 1)[0]
    if name.endswith("block_sparse_moe.input_linear.weight"):
        E, two_i, H = arr.shape
        i_e = two_i // 2
        out = []
        for e in range(E):
            out.append((f"{base}.mlp.experts.{e}.gate_proj.weight", arr[e, :i_e]))
            out.append((f"{base}.mlp.experts.{e}.up_proj.weight", arr[e, i_e:]))
        return out
    if name.endswith("block_sparse_moe.output_linear.weight"):
        return [(f"{base}.mlp.experts.{e}.down_proj.weight", arr[e])
                for e in range(arr.shape[0])]
    return [(name, arr)]


def _ernie45_moe(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """ERNIE-4.5-MoE: plural fused shared_experts (deepseek-style) and the
    gating correction bias under mlp.moe_statics (shape (1, E))."""
    if name.endswith("mlp.moe_statics.e_score_correction_bias"):
        return [(name.replace("mlp.moe_statics.e_score_correction_bias",
                              "mlp.gate.e_score_correction_bias"),
                 np.asarray(arr).reshape(-1))]
    return _deepseek(name, arr, n_head, n_kv, head_dim)


def _granitemoeshared(name, arr, n_head, n_kv, head_dim):
    """GraniteMoeShared = granitemoe + a fused shared MLP
    (shared_mlp.input_linear holds [gate|up])."""
    base = name.rsplit(".shared_mlp.", 1)[0]
    if name.endswith("shared_mlp.input_linear.weight"):
        i_s = arr.shape[0] // 2
        return [(f"{base}.mlp.shared_expert.gate_proj.weight", arr[:i_s]),
                (f"{base}.mlp.shared_expert.up_proj.weight", arr[i_s:])]
    if name.endswith("shared_mlp.output_linear.weight"):
        return [(f"{base}.mlp.shared_expert.down_proj.weight", arr)]
    return _granitemoe(name, arr, n_head, n_kv, head_dim)


def _gpt_bigcode(name, arr, n_head, n_kv, head_dim):
    """GPTBigCode / starcoder v1: gpt2-style naming with nn.Linear weights
    (NOT transposed) and an MQA-fused c_attn [q | k | v]."""
    if name.endswith(".attn.bias") or name.endswith(".attn.masked_bias"):
        return []
    base = name[len("transformer."):] if name.startswith("transformer.") else name
    fixed = {
        "wte.weight": "model.embed_tokens.weight",
        "wpe.weight": "model.pos_embed.weight",
        "ln_f.weight": "model.norm.weight",
        "ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
    }
    if base in fixed:
        return [(fixed[base], arr)]
    if not base.startswith("h."):
        return [(name, arr)]
    parts = base.split(".")
    i = parts[1]
    rest = ".".join(parts[2:])
    head, _, kind = rest.rpartition(".")
    m = {
        "ln_1": "input_layernorm",
        "attn.c_attn": "self_attn.qkv_proj",
        "attn.c_proj": "self_attn.o_proj",
        "ln_2": "post_attention_layernorm",
        "mlp.c_fc": "mlp.up_proj",
        "mlp.c_proj": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _dbrx(name, arr, n_head, n_kv, head_dim, cfg):
    """DBRX (reference DbrxModel :2781): norm_attn_norm nesting, fused
    contiguous Wqkv, router at ffn.router.layer, experts stored FLAT
    without a .weight suffix (w1/v1 (E*ffn, d), w2 likewise; down is the
    per-expert transpose)."""
    fixed = {
        "transformer.wte.weight": "model.embed_tokens.weight",
        "transformer.norm_f.weight": "model.norm.weight",
        "lm_head.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("transformer.blocks."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    if rest == "ffn.router.layer.weight":
        return [(f"model.layers.{i}.mlp.gate.weight", arr)]
    for proj, canon, transpose in (("w1", "gate_proj", False),
                                   ("v1", "up_proj", False),
                                   ("w2", "down_proj", True)):
        if rest == f"ffn.experts.mlp.{proj}":
            a = np.asarray(arr)
            E = (cfg.get("ffn_config") or {}).get("moe_num_experts")
            w = a.reshape(E, a.shape[0] // E, a.shape[1])  # (E, ffn, d)
            out = []
            for e in range(E):
                we = np.ascontiguousarray(w[e].T) if transpose else w[e]
                out.append(
                    (f"model.layers.{i}.mlp.experts.{e}.{canon}.weight", we)
                )
            return out
    m = {
        "norm_attn_norm.norm_1": "input_layernorm",
        "norm_attn_norm.norm_2": "post_attention_layernorm",
        "norm_attn_norm.attn.Wqkv": "self_attn.qkv_proj",
        "norm_attn_norm.attn.out_proj": "self_attn.o_proj",
    }
    head, _, kind = rest.rpartition(".")
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _gpt_oss(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """gpt-oss: stacked fused expert params with an interleaved gate/up last
    dim and input-major layout. gate_up_proj (E, H, 2I) -> per-expert
    gate/up (I, H); down_proj (E, I, H) -> per-expert down (H, I); biases
    split the same way; the biased router is mlp.router (reference
    GptOssModel modify_tensors, pack_gptq_into_gguf.py:8374-8416 splits the
    MXFP4/BF16 checkpoints identically)."""
    if name.endswith("mlp.router.weight") or name.endswith("mlp.router.bias"):
        return [(name.replace(".mlp.router.", ".mlp.gate."), arr)]
    base = name.rsplit(".mlp.", 1)[0]
    if name.endswith("mlp.experts.gate_up_proj"):
        w = np.asarray(arr).transpose(0, 2, 1)  # (E, 2I, H)
        return [item for e in range(w.shape[0]) for item in (
            (f"{base}.mlp.experts.{e}.gate_proj.weight", w[e, 0::2]),
            (f"{base}.mlp.experts.{e}.up_proj.weight", w[e, 1::2]),
        )]
    if name.endswith("mlp.experts.gate_up_proj_bias"):
        b = np.asarray(arr)  # (E, 2I)
        return [item for e in range(b.shape[0]) for item in (
            (f"{base}.mlp.experts.{e}.gate_proj.bias", b[e, 0::2]),
            (f"{base}.mlp.experts.{e}.up_proj.bias", b[e, 1::2]),
        )]
    if name.endswith("mlp.experts.down_proj"):
        w = np.asarray(arr)  # (E, I, H)
        return [(f"{base}.mlp.experts.{e}.down_proj.weight",
                 np.ascontiguousarray(w[e].T)) for e in range(w.shape[0])]
    if name.endswith("mlp.experts.down_proj_bias"):
        b = np.asarray(arr)  # (E, H)
        return [(f"{base}.mlp.experts.{e}.down_proj.bias", b[e])
                for e in range(b.shape[0])]
    return [(name, arr)]


def _falcon(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """Falcon: transformer.h.N naming, fused query_key_value in kv-group
    layout [g q-heads | k | v] per group (reference FalconModel
    modify_tensors, pack_gptq_into_gguf.py:1845-1865 re-arranges the same
    way), gateless gelu MLP, ln_attn/ln_mlp dual norms on the new decoder."""
    fixed = {
        "transformer.word_embeddings.weight": "model.embed_tokens.weight",
        "transformer.ln_f.weight": "model.norm.weight",
        "transformer.ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("transformer.h."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    if rest.startswith("self_attention.query_key_value."):
        # rearrange kv-group layout -> contiguous [q; k; v], kept fused as
        # the canonical qkv_proj (the loader splits it, the packer re-fuses
        # the quantized parts into llama.cpp's attn_qkv)
        kind = rest.rsplit(".", 1)[1]  # weight | bias
        g = n_head // n_kv
        r = np.ascontiguousarray(arr).reshape(
            (n_kv, g + 2, head_dim) + arr.shape[1:]
        )
        q = r[:, :g].reshape((n_head * head_dim,) + arr.shape[1:])
        k = r[:, g].reshape((n_kv * head_dim,) + arr.shape[1:])
        v = r[:, g + 1].reshape((n_kv * head_dim,) + arr.shape[1:])
        return [(f"model.layers.{i}.self_attn.qkv_proj.{kind}",
                 np.concatenate([q, k, v], axis=0))]
    m = {
        "ln_attn": "input_layernorm",
        "ln_mlp": "mlp_layernorm",
        "input_layernorm": "input_layernorm",
        "post_attention_layernorm": "post_attention_layernorm",
    }
    head, _, kind = rest.rpartition(".")
    if head in m and kind in ("weight", "bias"):
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    proj = {
        "self_attention.dense": "self_attn.o_proj",
        "mlp.dense_h_to_4h": "mlp.up_proj",
        "mlp.dense_4h_to_h": "mlp.down_proj",
    }
    if head in proj:
        return [(f"model.layers.{i}.{proj[head]}.{kind}", arr)]
    return [(name, arr)]


def _hunyuan_moe(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """HunYuan MoE: router lives at mlp.gate.wg, shared expert at
    mlp.shared_mlp, q/k norms named query/key_layernorm."""
    if name.endswith("mlp.gate.wg.weight"):
        return [(name.replace(".mlp.gate.wg.", ".mlp.gate."), arr)]
    if ".mlp.shared_mlp." in name:
        return [(name.replace(".mlp.shared_mlp.", ".mlp.shared_expert."), arr)]
    return _hunyuan_dense(name, arr, n_head, n_kv, head_dim)


def _hunyuan_dense(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    for old, new in (("self_attn.query_layernorm.", "self_attn.q_norm."),
                     ("self_attn.key_layernorm.", "self_attn.k_norm.")):
        if f".{old}" in name:
            return [(name.replace(f".{old}", f".{new}"), arr)]
    return [(name, arr)]




def _rearrange_headwise_qkv(arr, n_head: int, head_dim: int):
    """(n_head, [q|k|v], hd, ...) fused rows -> contiguous [q; k; v] (the
    reference's GPTNeoX/Bloom modify_tensors re-format,
    pack_gptq_into_gguf.py:1464-1489 / :1521-1546)."""
    a = np.ascontiguousarray(arr)
    r = a.reshape((n_head, 3, head_dim) + a.shape[1:])
    return np.concatenate(
        [r[:, j].reshape((n_head * head_dim,) + a.shape[1:]) for j in range(3)],
        axis=0,
    )


def _gpt_neox(name, arr, n_head, n_kv, head_dim, cfg):
    """GPT-NeoX / pythia: gpt_neox.layers.N naming, per-head-fused qkv,
    parallel residual uses ln2 (post_attention_layernorm) for the MLP branch
    of the SAME input."""
    fixed = {
        "gpt_neox.embed_in.weight": "model.embed_tokens.weight",
        "gpt_neox.final_layer_norm.weight": "model.norm.weight",
        "gpt_neox.final_layer_norm.bias": "model.norm.bias",
        "embed_out.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("gpt_neox.layers."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    head, _, kind = rest.rpartition(".")
    if head == "attention.query_key_value":
        qkv = _rearrange_headwise_qkv(arr, n_head, head_dim)
        return [(f"model.layers.{i}.self_attn.qkv_proj.{kind}", qkv)]
    parallel = cfg.get("use_parallel_residual", True)
    m = {
        "input_layernorm": "input_layernorm",
        "post_attention_layernorm": (
            "mlp_layernorm" if parallel else "post_attention_layernorm"
        ),
        "attention.dense": "self_attn.o_proj",
        "mlp.dense_h_to_4h": "mlp.up_proj",
        "mlp.dense_4h_to_h": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _gptj(name, arr, n_head, n_kv, head_dim):
    fixed = {
        "transformer.wte.weight": "model.embed_tokens.weight",
        "transformer.ln_f.weight": "model.norm.weight",
        "transformer.ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
        "lm_head.bias": "lm_head.bias",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("transformer.h."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    head, _, kind = rest.rpartition(".")
    m = {
        "ln_1": "input_layernorm",
        "attn.q_proj": "self_attn.q_proj",
        "attn.k_proj": "self_attn.k_proj",
        "attn.v_proj": "self_attn.v_proj",
        "attn.out_proj": "self_attn.o_proj",
        "mlp.fc_in": "mlp.up_proj",
        "mlp.fc_out": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _gpt2(name, arr, n_head, n_kv, head_dim):
    """gpt2: Conv1D weights stored transposed; fused c_attn is already
    contiguous [q|k|v] (reference GPT2Model :3728 transposes the same)."""
    if name.endswith(".attn.bias") or name.endswith(".attn.masked_bias"):
        return []
    fixed = {
        "wte.weight": "model.embed_tokens.weight",
        "wpe.weight": "model.pos_embed.weight",
        "ln_f.weight": "model.norm.weight",
        "ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
    }
    base = name[len("transformer."):] if name.startswith("transformer.") else name
    if base in fixed:
        return [(fixed[base], arr)]
    if not base.startswith("h."):
        return [(name, arr)]
    parts = base.split(".")
    i = parts[1]
    rest = ".".join(parts[2:])
    head, _, kind = rest.rpartition(".")
    if kind == "weight" and head in ("attn.c_attn", "attn.c_proj",
                                     "mlp.c_fc", "mlp.c_proj"):
        arr = np.ascontiguousarray(np.asarray(arr).T)
    m = {
        "ln_1": "input_layernorm",
        "attn.c_attn": "self_attn.qkv_proj",
        "attn.c_proj": "self_attn.o_proj",
        "ln_2": "post_attention_layernorm",
        "mlp.c_fc": "mlp.up_proj",
        "mlp.c_proj": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _bloom(name, arr, n_head, n_kv, head_dim):
    base = name[len("transformer."):] if name.startswith("transformer.") else name
    fixed = {
        "word_embeddings.weight": "model.embed_tokens.weight",
        "word_embeddings_layernorm.weight": "model.embed_norm.weight",
        "word_embeddings_layernorm.bias": "model.embed_norm.bias",
        "ln_f.weight": "model.norm.weight",
        "ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
    }
    if base in fixed:
        return [(fixed[base], arr)]
    if not base.startswith("h."):
        return [(name, arr)]
    parts = base.split(".")
    i = parts[1]
    rest = ".".join(parts[2:])
    head, _, kind = rest.rpartition(".")
    if head == "self_attention.query_key_value":
        qkv = _rearrange_headwise_qkv(arr, n_head, head_dim)
        return [(f"model.layers.{i}.self_attn.qkv_proj.{kind}", qkv)]
    m = {
        "input_layernorm": "input_layernorm",
        "post_attention_layernorm": "post_attention_layernorm",
        "self_attention.dense": "self_attn.o_proj",
        "mlp.dense_h_to_4h": "mlp.up_proj",
        "mlp.dense_4h_to_h": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _mpt(name, arr, n_head, n_kv, head_dim):
    fixed = {
        "transformer.wte.weight": "model.embed_tokens.weight",
        "transformer.norm_f.weight": "model.norm.weight",
        "transformer.norm_f.bias": "model.norm.bias",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("transformer.blocks."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    head, _, kind = rest.rpartition(".")
    m = {
        "norm_1": "input_layernorm",
        "attn.Wqkv": "self_attn.qkv_proj",  # contiguous [q; k; v]
        "attn.out_proj": "self_attn.o_proj",
        "norm_2": "post_attention_layernorm",
        "ffn.up_proj": "mlp.up_proj",
        "ffn.down_proj": "mlp.down_proj",
    }
    if head in m:
        return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]
    return [(name, arr)]


def _bailing_moe(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """Bailing/Ling MoE (reference BailingMoeModel :7775-7795): split the
    fused query_key_value, rename attention.dense -> o_proj and the plural
    shared_experts -> canonical singular; word_embeddings -> embed_tokens."""
    fixed = {
        "model.word_embeddings.weight": "model.embed_tokens.weight",
        "model.norm.weight": "model.norm.weight",
        "lm_head.weight": "lm_head.weight",
    }
    if name in fixed:
        return [(fixed[name], arr)]
    if not name.startswith("model.layers."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    if rest == "attention.query_key_value.weight":
        q_rows = n_head * head_dim
        kv_rows = n_kv * head_dim
        base = f"model.layers.{i}.self_attn"
        return [(f"{base}.q_proj.weight", arr[:q_rows]),
                (f"{base}.k_proj.weight", arr[q_rows:q_rows + kv_rows]),
                (f"{base}.v_proj.weight", arr[q_rows + kv_rows:])]
    if rest == "attention.dense.weight":
        return [(f"model.layers.{i}.self_attn.o_proj.weight", arr)]
    if ".shared_experts." in rest:
        return [(f"model.layers.{i}.{rest.replace('.shared_experts.', '.shared_expert.')}", arr)]
    return [(name, arr)]


def _jais(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """JAIS (reference JaisModel :6929-6950): gpt2 Conv1D transposes plus
    the swiglu second projection c_fc2 -> gate; the precomputed ALiBi
    slopes tensor passes through for the arch spec to convert to metadata."""
    if name.endswith(".attn.bias") or name.endswith(".attn.masked_bias"):
        return []
    if name.endswith("relative_pe.slopes"):
        return [(name, arr)]
    base = name[len("transformer."):] if name.startswith("transformer.") else name
    fixed = {
        "wte.weight": "model.embed_tokens.weight",
        "ln_f.weight": "model.norm.weight",
        "ln_f.bias": "model.norm.bias",
        "lm_head.weight": "lm_head.weight",
    }
    if base in fixed:
        return [(fixed[base], arr)]
    if not base.startswith("h."):
        return [(name, arr)]
    parts = base.split(".")
    i = parts[1]
    rest = ".".join(parts[2:])
    head, _, kind = rest.rpartition(".")
    if kind == "weight" and head in ("attn.c_attn", "attn.c_proj",
                                     "mlp.c_fc", "mlp.c_fc2", "mlp.c_proj"):
        arr = np.ascontiguousarray(np.asarray(arr).T)
    m = {
        "ln_1": "input_layernorm",
        "attn.c_attn": "self_attn.qkv_proj",
        "attn.c_proj": "self_attn.o_proj",
        "ln_2": "post_attention_layernorm",
        "mlp.c_fc": "mlp.up_proj",
        "mlp.c_fc2": "mlp.gate_proj",
        "mlp.c_proj": "mlp.down_proj",
    }
    if head not in m:
        return [(name, arr)]
    return [(f"model.layers.{i}.{m[head]}.{kind}", arr)]


def _llama4(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """Llama-4 (reference Llama4Model.modify_tensors :2451-2472): strip the
    multimodal wrapper prefix, drop vision tensors, rename feed_forward ->
    mlp, split the fused 3-D expert params into per-expert 2-D tensors
    (gate_up transposed halves; down transposed)."""
    if name.startswith("language_model."):
        name = name[len("language_model."):]
    if "vision_model" in name or "multi_modal_projector" in name:
        return []
    if not name.startswith("model.layers."):
        return [(name, arr)]
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    if rest == "feed_forward.experts.gate_up_proj":
        e, h, two_f = arr.shape
        f = two_f // 2
        out = []
        for x in range(e):
            out.append((f"model.layers.{i}.mlp.experts.{x}.gate_proj.weight",
                        np.ascontiguousarray(arr[x, :, :f].T)))
            out.append((f"model.layers.{i}.mlp.experts.{x}.up_proj.weight",
                        np.ascontiguousarray(arr[x, :, f:].T)))
        return out
    if rest == "feed_forward.experts.down_proj":
        return [(f"model.layers.{i}.mlp.experts.{x}.down_proj.weight",
                 np.ascontiguousarray(arr[x].T)) for x in range(arr.shape[0])]
    if rest == "feed_forward.router.weight":
        return [(f"model.layers.{i}.mlp.gate.weight", arr)]
    if rest.startswith("feed_forward."):
        return [(f"model.layers.{i}.mlp.{rest[len('feed_forward.'):]}", arr)]
    return [(name, arr)]


def _lfm2(name: str, arr, n_head: int, n_kv: int, head_dim: int):
    """LFM2: strip any multimodal prefix, drop vision tensors, squeeze the
    depthwise conv kernel to 2-D (reference LFM2Model.modify_tensors)."""
    if name.startswith("language_model."):
        name = name[len("language_model."):]
    if "vision_tower" in name or "multi_modal_projector" in name:
        return []
    if name.endswith("conv.conv.weight") and getattr(arr, "ndim", 2) == 3:
        arr = np.asarray(arr)[:, 0, :]
    return [(name, arr)]


_CANONICALIZERS = {
    "exaone": _exaone,
    "falcon": _falcon,
    "hunyuan_v1_dense": _hunyuan_dense,
    "hunyuan_v1_moe": _hunyuan_moe,
    "gpt_oss": _gpt_oss,
    "gpt_neox": _gpt_neox,
    "gptj": _gptj,
    "gpt2": _gpt2,
    "bloom": _bloom,
    "mpt": _mpt,
    "glm4": _glm4,
    "glm4_moe": _deepseek,  # plural shared_experts naming
    "dots1": _deepseek,
    "ernie4_5_moe": _ernie45_moe,
    "granitemoe": _granitemoe,
    "granitemoeshared": _granitemoeshared,
    "granitemoehybrid": _granitemoeshared,
    "gpt_bigcode": _gpt_bigcode,
    "dbrx": _dbrx,
    "internlm2": _internlm2,
    "baichuan": _baichuan,
    "deepseek": _deepseek,
    # v2/v3 share v1's plural shared_experts naming
    "deepseek_v2": _deepseek,
    "deepseek_v3": _deepseek,
    "starcoder2": _starcoder2,
    "phi": _phi,
    "llama4": _llama4,
    "llama4_text": _llama4,
    "lfm2": _lfm2,
    "jais": _jais,
    "codeshell": _gpt_bigcode,
    "bailing_moe": _bailing_moe,
}


def canonicalize(
    model_type: str, name: str, arr, *, n_head: int, n_kv: int, head_dim: int,
    hf_cfg: Optional[Dict[str, Any]] = None,
) -> List[Tuple[str, Any]]:
    """Translate one raw checkpoint tensor into canonical-named tensors."""
    fn = _CANONICALIZERS.get(model_type)
    if fn is None:
        return [(name, arr)]
    if fn in _CFG_AWARE:
        return fn(name, arr, n_head, n_kv, head_dim, hf_cfg or {})
    return fn(name, arr, n_head, n_kv, head_dim)


def iter_canonical_tensors(tensors, hf_cfg: Dict[str, Any]) -> Iterator[Tuple[str, Any]]:
    """Wrap a raw (name, array) iterator with canonicalization, driven by an
    HF config.json dict."""
    mt = hf_cfg.get("model_type", "llama")
    n_head = hf_cfg.get("num_attention_heads", hf_cfg.get(
        "n_head", hf_cfg.get("n_heads")))
    if mt == "falcon":  # kv heads: new-decoder key, else multi-query
        n_kv = (hf_cfg.get("num_kv_heads")
                if hf_cfg.get("new_decoder_architecture")
                else (1 if hf_cfg.get("multi_query", True) else n_head))
    else:
        n_kv = hf_cfg.get("num_key_value_heads", n_head)
    hidden = hf_cfg.get("hidden_size", hf_cfg.get("n_embd", hf_cfg.get(
        "n_embed", hf_cfg.get("d_model"))))
    head_dim = hf_cfg.get("head_dim") or (
        # attention-free archs (mamba) / alias-keyed ones (distilbert "dim")
        hidden // n_head if (n_head and hidden) else 0
    )
    for name, arr in tensors:
        # multimodal wrappers: text weights live under a language_model
        # prefix; vision/audio towers are not packed into the text GGUF
        if name.startswith(("vision_tower.", "vision_model.",
                            "multi_modal_projector.", "visual.",
                            "audio_tower.", "talker.", "token2wav.",
                            "model.vision_tower.", "model.visual.",
                            "model.multi_modal_projector.",
                            "model.audio_tower.")):
            continue
        if name.startswith("model.language_model."):
            name = "model." + name[len("model.language_model."):]
        elif name.startswith("language_model."):
            name = name[len("language_model."):]
        elif name.startswith("thinker."):  # Qwen-Omni
            name = name[len("thinker."):]
        yield from canonicalize(mt, name, arr, n_head=n_head, n_kv=n_kv,
                                head_dim=head_dim, hf_cfg=hf_cfg)


_CFG_AWARE = {_gpt_neox, _dbrx}
