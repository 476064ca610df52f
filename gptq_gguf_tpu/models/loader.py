"""HF checkpoint -> JAX param pytree loader.

Replaces the reference's ``AutoModelForCausalLM.from_pretrained``
(quant/gptq/quant.py:158-164) for the supported decoder families. Reads
``config.json`` + ``*.safetensors`` directly (no torch in the load path) and
produces the pytree consumed by ``models.llama``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from . import adapters
from .llama import LlamaConfig

SUPPORTED_MODEL_TYPES = ("llama", "mistral", "qwen2", "qwen3", "phi3", "gemma",
                         "gemma2", "gemma3_text", "olmo2", "qwen2_moe", "qwen3_moe",
                         "mixtral", "granite", "minicpm", "exaone", "internlm2",
                         "baichuan", "deepseek", "olmoe", "stablelm",
                         "starcoder2", "nemotron", "cohere", "phi",
                         "deepseek_v2", "deepseek_v3", "glm", "glm4",
                         "cohere2", "olmo", "arcee", "seed_oss", "ernie4_5",
                         "exaone4", "glm4_moe", "ernie4_5_moe", "granitemoe", "dots1", "gpt_oss",
                         "falcon", "hunyuan_v1_dense", "hunyuan_v1_moe",
                         "gpt_neox", "gptj", "gpt2", "bloom", "mpt",
                         "granitemoeshared", "smollm3", "glm",
                         "gpt_bigcode", "dbrx",
                         # qwen2/qwen3 twins (text side; mrope reduces to
                         # NeoX for text, full streams via mrope_cos_sin)
                         "qwen2_vl", "qwen2_5_vl", "qwen2_vl_text",
                         "qwen2_5_vl_text")


def load_config(model_dir: Union[str, Path], dtype=jnp.float32) -> LlamaConfig:
    with open(Path(model_dir) / "config.json") as f:
        d = json.load(f)
    if d.get("model_type") not in SUPPORTED_MODEL_TYPES:
        raise NotImplementedError(
            f"model_type {d.get('model_type')!r}; supported: {SUPPORTED_MODEL_TYPES}"
        )
    return LlamaConfig.from_hf_dict(d, dtype=dtype)


def _iter_safetensors(model_dir: Path):
    from safetensors import safe_open

    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _to_f32(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == np.uint16 or str(arr.dtype) == "bfloat16":
        return (arr.view(np.uint16).astype(np.uint32) << 16).view(np.float32)
    return arr.astype(np.float32)


def load_params(
    model_dir: Union[str, Path],
    cfg: Optional[LlamaConfig] = None,
    dtype=jnp.float32,
    host: bool = False,
) -> Dict[str, Any]:
    """Load HF safetensors into the models.llama pytree.

    host=True keeps every weight as a NUMPY array (no device transfer):
    an 8B checkpoint at f32 is 32 GB — more than a v5e's HBM — so the
    calibration walk stages one block onto the device at a time
    (quant/calibrate.py) instead of loading the whole model."""
    model_dir = Path(model_dir)
    cfg = cfg or load_config(model_dir, dtype=dtype)
    layers: list = [dict() for _ in range(cfg.num_hidden_layers)]
    params: Dict[str, Any] = {"layers": layers}
    # per-layer {canonical_proj: {expert_idx: array}} accumulators, stacked
    # into (E, out, in) tensors at the end
    expert_acc: Dict[int, Dict[str, Dict[int, Any]]] = {}

    with open(Path(model_dir) / "config.json") as f:
        hf_raw = json.load(f)

    def put(layer_idx, key, value):
        layers[layer_idx][key] = value

    canonical = (
        (cname, carr)
        for raw_name, raw_arr in _iter_safetensors(model_dir)
        for cname, carr in adapters.canonicalize(
            cfg.model_type, raw_name, raw_arr,
            n_head=cfg.num_attention_heads,
            n_kv=cfg.num_key_value_heads,
            head_dim=cfg.head_dim_,
            hf_cfg=hf_raw,
        )
    )
    for name, arr in canonical:
        # host staging keeps fp16 checkpoints at fp16: the calibration walk
        # casts to f32 ON DEVICE after upload, halving the per-block
        # host->device transfer (round-5: stage_in measured 15 s/layer of
        # pure relay upload at 8B f32). bf16 still widens here (numpy-side
        # view trick; values identical either way).
        val = ((arr if arr.dtype == np.float16 else _to_f32(arr)) if host
               else jnp.asarray(_to_f32(arr), dtype=dtype))
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = val
        elif name == "model.norm.weight":
            params["norm"] = val
        elif name == "model.norm.bias":
            params["norm_bias"] = val
        elif name == "model.pos_embed.weight":
            params["pos_embed"] = val
        elif name == "model.embed_norm.weight":
            params["embed_norm"] = val
        elif name == "model.embed_norm.bias":
            params["embed_norm_bias"] = val
        elif name == "lm_head.weight":
            params["lm_head"] = val
        elif name == "lm_head.bias":
            params["lm_head_bias"] = val
        elif name.startswith("model.layers."):
            parts = name.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            # phi3 fuses qkv and gate_up; split them into the canonical tree
            if rest in ("self_attn.qkv_proj.weight", "self_attn.qkv_proj.bias"):
                n_head = cfg.num_attention_heads
                n_kv = cfg.num_key_value_heads
                hd = cfg.head_dim_
                sfx = "_bias" if rest.endswith(".bias") else "_proj"
                put(i, "q" + sfx, val[: n_head * hd])
                put(i, "k" + sfx, val[n_head * hd : (n_head + n_kv) * hd])
                put(i, "v" + sfx, val[(n_head + n_kv) * hd :])
                continue
            if rest == "mlp.gate_up_proj.weight":
                inter = cfg.intermediate_size
                put(i, "gate_proj", val[:inter])
                put(i, "up_proj", val[inter:])
                continue
            # MoE: per-expert tensors (qwen2moe/qwen3moe "mlp.experts.N",
            # mixtral "block_sparse_moe.experts.N" with w1/w3/w2)
            moe_prefixes = (
                ("mlp.experts.", {"gate_proj": "experts_gate", "up_proj": "experts_up",
                                  "down_proj": "experts_down"}),
                ("block_sparse_moe.experts.", {"w1": "experts_gate", "w3": "experts_up",
                                               "w2": "experts_down"}),
            )
            handled = False
            for prefix, proj_map in moe_prefixes:
                for suffix, bias in ((".weight", ""), (".bias", "_bias")):
                    if rest.startswith(prefix) and rest.endswith(suffix):
                        sub = rest[len(prefix):-len(suffix)].split(".")
                        if len(sub) == 2 and sub[1] in proj_map:
                            expert_acc.setdefault(i, {}).setdefault(
                                proj_map[sub[1]] + bias, {}
                            )[int(sub[0])] = val
                            handled = True
                        break
                if handled or rest.startswith(prefix):
                    break
            if handled:
                continue
            moe_direct = {
                "mlp.gate.weight": "gate_inp",
                "block_sparse_moe.gate.weight": "gate_inp",
                "mlp.gate.e_score_correction_bias": "gate_corr_bias",  # deepseek-v3
                "mlp.gate.bias": "gate_inp_bias",  # gpt-oss biased router
                "mlp.shared_expert_gate.weight": "shared_gate_inp",
                "mlp.shared_expert.gate_proj.weight": "shared_gate",
                "mlp.shared_expert.up_proj.weight": "shared_up",
                "mlp.shared_expert.down_proj.weight": "shared_down",
            }
            if rest in moe_direct:
                put(i, moe_direct[rest], val)
                continue
            mapping = {
                "input_layernorm.weight": "input_layernorm",
                "post_attention_layernorm.weight": "post_attention_layernorm",
                "self_attn.q_proj.weight": "q_proj",
                "self_attn.k_proj.weight": "k_proj",
                "self_attn.v_proj.weight": "v_proj",
                "self_attn.o_proj.weight": "o_proj",
                "self_attn.q_proj.bias": "q_bias",
                "self_attn.k_proj.bias": "k_bias",
                "self_attn.v_proj.bias": "v_bias",
                "self_attn.o_proj.bias": "o_bias",
                "mlp.gate_proj.bias": "gate_bias",
                "mlp.up_proj.bias": "up_bias",
                "mlp.down_proj.bias": "down_bias",
                "input_layernorm.bias": "input_layernorm_bias",
                "mlp_layernorm.weight": "mlp_layernorm",  # falcon ln_mlp
                "mlp_layernorm.bias": "mlp_layernorm_bias",
                "post_attention_layernorm.bias": "post_attention_layernorm_bias",
                "self_attn.q_norm.weight": "q_norm",
                "self_attn.k_norm.weight": "k_norm",
                "pre_feedforward_layernorm.weight": "pre_feedforward_layernorm",
                "post_feedforward_layernorm.weight": "post_feedforward_layernorm",
                "mlp.gate_proj.weight": "gate_proj",
                "mlp.up_proj.weight": "up_proj",
                "mlp.down_proj.weight": "down_proj",
                # MLA (deepseek_v2/v3)
                "self_attn.q_a_proj.weight": "q_a_proj",
                "self_attn.q_a_proj.bias": "q_a_bias",
                "self_attn.q_a_layernorm.weight": "q_a_norm",
                "self_attn.q_b_proj.weight": "q_b_proj",
                "self_attn.kv_a_proj_with_mqa.weight": "kv_a_proj",
                "self_attn.kv_a_proj_with_mqa.bias": "kv_a_bias",
                "self_attn.kv_a_layernorm.weight": "kv_a_norm",
                "self_attn.kv_b_proj.weight": "kv_b_proj",
                "self_attn.sinks": "sinks",  # gpt-oss attention sinks
            }
            key = mapping.get(rest)
            if key is None:
                # rotary inv_freq buffers etc. are derived, skip
                continue
            put(i, key, val)
        # else: skip (e.g. rotary embeddings)

    for i, projs in expert_acc.items():
        for key, by_e in projs.items():
            n_e = max(by_e) + 1
            layers[i][key] = jnp.stack([by_e[e] for e in range(n_e)])

    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    if cfg.model_type == "olmo":
        # olmo v1 LayerNorms are non-parametric (elementwise_affine=False):
        # synthesize unit weights so apply_norm sees a standard layer
        ones = jnp.ones((cfg.hidden_size,), jnp.float32)
        params.setdefault("norm", ones)
        for layer in layers:
            layer.setdefault("input_layernorm", ones)
            layer.setdefault("post_attention_layernorm", ones)
    return params
