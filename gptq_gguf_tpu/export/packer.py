"""Pack a quantized model (HF checkpoint + per-layer artifacts) into GGUF.

TPU-framework equivalent of the reference's adapted llama.cpp converter
(quant/gptq/pack_gptq_into_gguf.py): walks the HF checkpoint, and for each
tensor either (a) packs the GPTQ artifact from the layer directory into exact
GGML blocks (reference prepare_tensors delta, :282-349), or (b) passes the
float tensor through (F32/F16 rules, :351-432). The critical GQA q/k head
permutation is applied to the integer codes *and* every per-row scale array
(reference :320-324) — row-granular metadata permutes with the rows.

Architecture support follows a registry (reference ModelBase.register
pattern, :513-536): llama / mistral / qwen2 / qwen3 here, extendable.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..formats import convert, ggml
from ..formats.ggml import GGMLQuantizationType
from ..formats.gguf import GGUFWriter
from ..quant import artifacts

# llama.cpp LLAMA_FTYPE ids for general.file_type
FILE_TYPE_IDS = {
    GGMLQuantizationType.Q2_K: 10,
    GGMLQuantizationType.Q3_K: 12,  # MOSTLY_Q3_K_M
    GGMLQuantizationType.Q4_K: 15,  # MOSTLY_Q4_K_M
    GGMLQuantizationType.Q5_K: 17,  # MOSTLY_Q5_K_M
    GGMLQuantizationType.Q6_K: 18,
    GGMLQuantizationType.F16: 1,
    GGMLQuantizationType.F32: 0,
    GGMLQuantizationType.BF16: 32,
    GGMLQuantizationType.Q8_0: 7,
}


# ---------------------------------------------------------------------------
# HF -> GGUF tensor name mapping (llama-family)
# ---------------------------------------------------------------------------


def hf_to_gguf_name(name: str) -> Optional[str]:
    """Map an HF module/tensor name to the GGUF tensor name."""
    fixed = {
        "model.embed_tokens.weight": "token_embd.weight",
        "model.norm.weight": "output_norm.weight",
        "model.norm.bias": "output_norm.bias",
        "lm_head.weight": "output.weight",
        "lm_head.bias": "output.bias",
    }
    if name in fixed:
        return fixed[name]
    if not name.startswith("model.layers."):
        return None
    parts = name.split(".")
    i = parts[2]
    rest = ".".join(parts[3:])
    m = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "self_attn.q_proj.bias": "attn_q.bias",
        "self_attn.k_proj.bias": "attn_k.bias",
        "self_attn.v_proj.bias": "attn_v.bias",
        "self_attn.o_proj.bias": "attn_output.bias",
        "mlp.gate_proj.bias": "ffn_gate.bias",
        "mlp.up_proj.bias": "ffn_up.bias",
        "mlp.down_proj.bias": "ffn_down.bias",
        "input_layernorm.bias": "attn_norm.bias",
        "post_attention_layernorm.bias": "ffn_norm.bias",
        "self_attn.q_norm.weight": "attn_q_norm.weight",
        "self_attn.k_norm.weight": "attn_k_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    if rest not in m:
        return None
    return f"blk.{i}.{m[rest]}"


def gqa_permute_rows(n_rows: int, n_head: int) -> np.ndarray:
    """Row permutation converting HF rotate-half RoPE layout to GGML's
    interleaved layout (llama.cpp LlamaModel.permute; reference applies it to
    qweight and scales alike, pack_gptq_into_gguf.py:320-324).

    Returns an index array ``perm`` such that ``w_gguf = w_hf[perm]``.
    """
    idx = np.arange(n_rows)
    return (
        idx.reshape(n_head, 2, n_rows // n_head // 2)
        .swapaxes(1, 2)
        .reshape(n_rows)
    )


# ---------------------------------------------------------------------------
# Architecture registry
# ---------------------------------------------------------------------------

_ARCH_REGISTRY: Dict[str, "ArchSpec"] = {}


class ArchSpec:
    """Per-architecture conversion rules (llama.cpp-compatible)."""

    gguf_arch = "llama"
    permute_qk = True  # llama/mistral permute q/k; qwen2 does not

    def __init__(self, hf_config: Dict[str, Any]):
        self.hf = hf_config

    # -- metadata ----------------------------------------------------------

    def metadata(self) -> Dict[str, Any]:
        c = self.hf
        a = self.gguf_arch
        # legacy-GPT key aliases (gpt2/gptj n_embd/n_head/n_layer,
        # bloom n_embed, mpt d_model/n_heads/n_layers)
        hidden = c.get("hidden_size", c.get("n_embd", c.get(
            "n_embed", c.get("d_model"))))
        n_head = c.get("num_attention_heads", c.get("n_head", c.get("n_heads")))
        n_kv = c.get("num_key_value_heads", n_head)
        head_dim = c.get("head_dim") or hidden // n_head
        md = {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            # key aliases: exaone num_layers/layer_norm_epsilon, baichuan
            # model_max_length (same set models/llama.from_hf_dict accepts)
            f"{a}.context_length": c.get(
                "max_position_embeddings", c.get("model_max_length", 4096)
            ),
            f"{a}.embedding_length": hidden,
            f"{a}.block_count": c.get("num_hidden_layers", c.get(
                "num_layers", c.get("n_layer", c.get("n_layers")))),
            # falcon/legacy-gpt have no intermediate_size key: ffn = 4*hidden
            f"{a}.feed_forward_length": c.get(
                "intermediate_size", c.get("n_inner") or 4 * hidden
            ),
            f"{a}.attention.head_count": n_head,
            f"{a}.attention.head_count_kv": n_kv,
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("rms_norm_eps", c.get("layer_norm_epsilon", 1e-5))
            ),
            f"{a}.rope.freq_base": float(c.get("rope_theta", 10000.0)),
            f"{a}.rope.dimension_count": head_dim,
            f"{a}.vocab_size": c["vocab_size"],
        }
        rs = dict(c.get("rope_scaling") or {})
        rt = rs.get("rope_type", rs.get("type"))
        if rt == "linear":
            md[f"{a}.rope.scaling.type"] = "linear"
            md[f"{a}.rope.scaling.factor"] = float(rs["factor"])
        elif rt == "yarn":
            md[f"{a}.rope.scaling.type"] = "yarn"
            md[f"{a}.rope.scaling.factor"] = float(rs["factor"])
            md[f"{a}.rope.scaling.original_context_length"] = int(
                rs.get("original_max_position_embeddings", 4096)
            )
        elif rt == "llama3":
            # llama.cpp reads these keys AND applies the actual correction via
            # the rope_freqs.weight tensor (emitted in pack_model; the
            # converter's LlamaModel.generate_extra_tensors does the same)
            md[f"{a}.rope.scaling.type"] = "linear"
            md[f"{a}.rope.scaling.factor"] = float(rs.get("factor", 8.0))
            md[f"{a}.rope.scaling.original_context_length"] = int(
                rs.get("original_max_position_embeddings", 8192)
            )
        return md

    # -- tensor hooks ------------------------------------------------------

    def tensor_name(self, hf_name: str) -> Optional[str]:
        return hf_to_gguf_name(hf_name)

    def row_permutation(self, hf_name: str, n_rows: int) -> Optional[np.ndarray]:
        if not self.permute_qk:
            return None
        c = self.hf
        n_head = c["num_attention_heads"]
        n_kv = c.get("num_key_value_heads", n_head)
        if ".self_attn.q_proj." in hf_name:
            return gqa_permute_rows(n_rows, n_head)
        if ".self_attn.k_proj." in hf_name:
            return gqa_permute_rows(n_rows, n_kv)
        return None

    def transform_float(self, gguf_name: str, arr: np.ndarray) -> np.ndarray:
        """Hook for float-tensor value rewrites (nemotron folds (1+w) norms)."""
        return arr

    def special_tensors(self, hf_name: str, arr: np.ndarray, get_artifact):
        """Hook for one-HF-tensor -> many-GGUF-tensors rewrites (deepseek2
        splits kv_b into attn_k_b/attn_v_b). Returns None when the tensor is
        not special, else a list of
        ("quant", gguf_name, LayerArtifact, raw_shape) /
        ("float", gguf_name, np.ndarray) instructions."""
        return None

    def extra_tensors(self) -> List[Tuple[str, np.ndarray]]:
        """Hook for tensors generated from the config alone (reference
        generate_extra_tensors: phi3 longrope factor tensors)."""
        return []

    def final_metadata(self) -> Dict[str, Any]:
        """Hook for metadata that depends on tensor values seen during the
        pack walk (reference prepare_tensors: jais max_alibi_bias)."""
        return {}


class LlamaArch(ArchSpec):
    gguf_arch = "llama"
    permute_qk = True


class MistralArch(LlamaArch):
    pass


class Qwen2Arch(ArchSpec):
    gguf_arch = "qwen2"
    permute_qk = False


class Qwen3Arch(ArchSpec):
    gguf_arch = "qwen3"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c = self.hf
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{self.gguf_arch}.attention.key_length"] = head_dim
        md[f"{self.gguf_arch}.attention.value_length"] = head_dim
        return md


class GemmaArch(ArchSpec):
    """gemma (v1): llama structure + (1+w) norms, embed scaling, gelu; all
    models have head_dim 256 so key/value_length must be explicit. The +1
    of the gemma RMSNorm is folded into the stored norm weights (reference
    GemmaModel/Gemma2Model/Gemma3Model modify_tensors `data + 1`; llama.cpp
    expects the folded form)."""

    gguf_arch = "gemma"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c = self.hf
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{self.gguf_arch}.attention.key_length"] = head_dim
        md[f"{self.gguf_arch}.attention.value_length"] = head_dim
        return md

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith("norm.weight"):
            return arr + 1.0
        return arr


class Gemma2Arch(ArchSpec):
    """gemma2: post-attn/post-ffw norms, softcapping, sliding window.

    GGUF name quirk: gemma2's ffn_norm is the *pre-feedforward* norm and
    post_attention_norm holds HF's post_attention_layernorm. Norm weights
    are stored with the gemma +1 folded in (reference Gemma2Model
    `data + 1`, llama.cpp convention)."""

    gguf_arch = "gemma2"
    permute_qk = False

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith("norm.weight"):
            return arr + 1.0
        return arr

    def tensor_name(self, hf_name: str) -> Optional[str]:
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "post_attention_layernorm.weight":
                return f"blk.{i}.post_attention_norm.weight"
            if rest == "pre_feedforward_layernorm.weight":
                return f"blk.{i}.ffn_norm.weight"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c = self.hf
        a = self.gguf_arch
        md[f"{a}.attn_logit_softcapping"] = float(c.get("attn_logit_softcapping", 50.0))
        md[f"{a}.final_logit_softcapping"] = float(c.get("final_logit_softcapping", 30.0))
        md[f"{a}.attention.sliding_window"] = int(c.get("sliding_window", 4096))
        # all gemma2 models have head_dim != hidden/n_head (e.g. 2304/8 heads,
        # head_dim 256); llama.cpp needs key/value_length to derive it
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        if c.get("query_pre_attn_scalar") is not None:
            # non-standard key (llama.cpp infers this from block_count); our
            # serving loader prefers it, llama.cpp ignores unknown keys
            md[f"{a}.attention.query_pre_attn_scalar"] = float(c["query_pre_attn_scalar"])
        return md


class Gemma3Arch(Gemma2Arch):
    """gemma3 (text): dual norms like gemma2, per-head q/k norms, dual rope
    bases (local sliding layers at rope_local_base_freq), no softcaps."""

    gguf_arch = "gemma3"

    def metadata(self):
        c = self.hf
        a = self.gguf_arch
        md = ArchSpec.metadata(self)
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.attention.sliding_window"] = int(c.get("sliding_window", 1024))
        md[f"{a}.rope.local.freq_base"] = float(c.get("rope_local_base_freq", 10000.0))
        if c.get("query_pre_attn_scalar") is not None:
            md[f"{a}.attention.query_pre_attn_scalar"] = float(c["query_pre_attn_scalar"])
        return md


class Gemma3nArch(Gemma3Arch):
    """Gemma-3n (reference Gemma3NModel :5157-5243): altup projections
    stacked 3-deep, laurel low-rank branch, per-layer input embeddings and
    gates, activation-sparsity std multipliers, shared trailing KV layers.
    Unlike gemma/gemma2/gemma3 the norms are NOT shifted (+0 scale_shift,
    reference norm_shift = 0.0)."""

    gguf_arch = "gemma3n"

    _extra_layer = {
        "altup.correction_coefs.weight": "altup_correct_coef.weight",
        "altup.correct_output_scale": "altup_correct_scale.weight",
        "altup.prediction_coefs.weight": "altup_predict_coef.weight",
        "altup.modality_router.weight": "altup_router.weight",
        "altup.router_norm.weight": "altup_router_norm.weight",
        "laurel.linear_left.weight": "laurel_l.weight",
        "laurel.linear_right.weight": "laurel_r.weight",
        "laurel.post_laurel_norm.weight": "laurel_post_norm.weight",
        "per_layer_input_gate.weight": "inp_gate.weight",
        "per_layer_projection.weight": "proj.weight",
        "post_per_layer_input_norm.weight": "post_norm.weight",
    }
    _fixed = {
        "model.embed_tokens_per_layer.weight": "per_layer_token_embd.weight",
        "model.per_layer_model_projection.weight": "per_layer_model_proj.weight",
        # transformers' save path rewrites "model." mid-name via the
        # gemma3n checkpoint-conversion mapping, mangling this key
        "model.per_layer_model.language_model_projection.weight":
            "per_layer_model_proj.weight",
        "model.per_layer_projection_norm.weight": "per_layer_proj_norm.weight",
    }

    def __init__(self, hf_config):
        super().__init__(hf_config)
        if int(hf_config.get("altup_num_inputs", 4)) != 4:
            raise NotImplementedError(
                "gemma3n conversion supports altup_num_inputs == 4 only "
                "(reference :5166)")
        self._altup_acc: Dict[str, Dict[int, np.ndarray]] = {}

    def transform_float(self, gguf_name, arr):
        return arr  # no (1+w) fold: Gemma3nRMSNorm stores w directly

    def tensor_name(self, hf_name):
        if hf_name in self._fixed:
            return self._fixed[hf_name]
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._extra_layer:
                return f"blk.{parts[2]}.{self._extra_layer[rest]}"
        return super().tensor_name(hf_name)

    def special_tensors(self, hf_name, arr, get_artifact):
        for prefix, gname in (("model.altup_projections.", "altup_proj.weight"),
                              ("model.altup_unembed_projections.",
                               "altup_unembd_proj.weight")):
            if not hf_name.startswith(prefix):
                continue
            idx = int(hf_name[len(prefix):].split(".")[0])
            acc = self._altup_acc.setdefault(gname, {})
            acc[idx] = np.asarray(arr, dtype=np.float32)
            if len(acc) < 3:
                return []
            stacked = np.stack([acc[i] for i in range(3)])
            del self._altup_acc[gname]
            return [("float", gname, stacked.astype(np.float16))]
        return None

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.altup.active_idx"] = int(c["altup_active_idx"])
        md[f"{a}.altup.num_inputs"] = int(c["altup_num_inputs"])
        md[f"{a}.embedding_length_per_layer_input"] = int(
            c["hidden_size_per_layer_input"])
        md[f"{a}.attention.shared_kv_layers"] = int(
            c.get("num_kv_shared_layers", 0))
        # activation sparsity -> std multipliers via the normal icdf
        # (reference :5189-5194)
        import torch as _torch

        nd = _torch.distributions.normal.Normal(0, 1)
        md[f"{a}.activation_sparsity_scale"] = [
            float(nd.icdf(_torch.tensor(s, dtype=_torch.float32)))
            for s in c["activation_sparsity_pattern"]
        ]
        md[f"{a}.attention.sliding_window_pattern"] = [
            t == "sliding_attention" for t in c["layer_types"]
        ]
        return md


class Olmo2Arch(ArchSpec):
    """olmo2: post-norm blocks — post_attention_layernorm maps to
    post_attention_norm (NOT ffn_norm), q/k norms are full-projection."""

    gguf_arch = "olmo2"
    permute_qk = False  # llama.cpp olmo2 uses NeoX rope = HF layout

    def tensor_name(self, hf_name: str) -> Optional[str]:
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "post_attention_layernorm.weight":
                return f"blk.{i}.post_attention_norm.weight"
        return hf_to_gguf_name(hf_name)


class _LongRopeMixin(ArchSpec):
    """phi3-family longrope/su metadata + rope factor tensors (reference
    Phi3MiniModel.set_gguf_parameters/generate_extra_tensors :3893-3962):
    emits rope.scaling.original_context_length, attention.sliding_window
    (0 marks Phi-4), attn_factor, and the rope_factors_long/short tensors."""

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        orig = int(c.get("original_max_position_embeddings",
                         c.get("max_position_embeddings", 4096)))
        md[f"{a}.rope.scaling.original_context_length"] = orig
        md[f"{a}.attention.sliding_window"] = int(c.get("sliding_window") or 0)
        rs = dict(c.get("rope_scaling") or {})
        rt = (rs.get("rope_type", rs.get("type")) or "").lower()
        if rt in ("su", "longrope", "yarn"):
            scale = c["max_position_embeddings"] / orig
            if rt == "yarn":
                attn = 0.1 * math.log(scale) + 1.0 if scale > 1.0 else 1.0
            else:
                attn = (math.sqrt(1 + math.log(scale) / math.log(orig))
                        if scale > 1.0 else 1.0)
            md[f"{a}.rope.scaling.attn_factor"] = float(attn)
            # base ArchSpec only knows linear/yarn/llama3; longrope models
            # carry the correction in the factor tensors, no scaling.type key
        return md

    def extra_tensors(self):
        rs = dict(self.hf.get("rope_scaling") or {})
        long_f, short_f = rs.get("long_factor"), rs.get("short_factor")
        if long_f is None or short_f is None:
            return []
        return [
            ("rope_factors_long.weight", np.asarray(long_f, dtype=np.float32)),
            ("rope_factors_short.weight", np.asarray(short_f, dtype=np.float32)),
        ]


class Phi3Arch(_LongRopeMixin):
    """phi3: llama.cpp expects fused attn_qkv / ffn_up tensors. Row-concat of
    per-projection K-quant artifacts is exact (rows are independent)."""

    gguf_arch = "phi3"
    permute_qk = False
    fused = {
        "attn_qkv.weight": ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
        "ffn_up.weight": ("mlp.gate_proj", "mlp.up_proj"),
    }


# -- MoE architectures -------------------------------------------------------
#
# GGUF consolidates per-expert HF tensors into stacked 3-D *_exps tensors
# (reference gguf_splitter.py:148-282 maps them back). expert_tensor()
# identifies an HF expert tensor; pack_model stacks all experts of one
# projection into a (n_expert, rows, cols) tensor. K-quant packing stacks
# exactly (rows are independent across experts).


class MoEArchSpec(ArchSpec):
    n_expert_key = "num_experts"
    # HF component -> GGUF component for expert/router tensors
    moe_direct = {
        "mlp.gate.weight": "ffn_gate_inp.weight",
        "mlp.shared_expert_gate.weight": "ffn_gate_inp_shexp.weight",
        "mlp.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
        "mlp.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
        "mlp.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    }
    expert_prefix = "mlp.experts."
    expert_proj = {"gate_proj": "ffn_gate_exps", "up_proj": "ffn_up_exps",
                   "down_proj": "ffn_down_exps"}

    @property
    def n_expert(self) -> int:
        return int(self.hf[self.n_expert_key])

    def tensor_name(self, hf_name: str) -> Optional[str]:
        base = hf_to_gguf_name(hf_name)
        if base is not None:
            return base
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self.moe_direct:
                return f"blk.{i}.{self.moe_direct[rest]}"
        return None

    def expert_tensor(self, hf_name: str) -> Optional[Tuple[str, int, str]]:
        """(gguf_name, expert_idx, artifact_name_template) for an HF
        per-expert tensor, else None."""
        if not hf_name.startswith("model.layers."):
            return None
        parts = hf_name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        if not rest.startswith(self.expert_prefix):
            return None
        suffix = ".weight" if rest.endswith(".weight") else (
            ".bias" if rest.endswith(".bias") else None)
        if suffix is None:
            return None
        sub = rest[len(self.expert_prefix):-len(suffix)].split(".")
        if len(sub) != 2:
            return None
        e, proj = sub
        if proj not in self.expert_proj:
            return None
        if suffix == ".bias":  # per-expert biases stack as float (gpt-oss)
            return (f"blk.{i}.{self.expert_proj[proj]}.bias", int(e), None)
        # calibration artifacts use the canonical per-expert names
        # (mlp.experts.N.gate_proj) regardless of the HF naming scheme
        canon = {"ffn_gate_exps": "gate_proj", "ffn_up_exps": "up_proj",
                 "ffn_down_exps": "down_proj"}[self.expert_proj[proj]]
        return (f"blk.{i}.{self.expert_proj[proj]}.weight", int(e),
                f"model.layers.{i}.mlp.experts.{{e}}.{canon}")

    def metadata(self):
        md = super().metadata()
        c = self.hf
        a = self.gguf_arch
        md[f"{a}.expert_count"] = self.n_expert
        md[f"{a}.expert_used_count"] = int(
            c.get("num_experts_per_tok", c.get("experts_per_token", 2))
        )
        if c.get("moe_intermediate_size"):
            md[f"{a}.expert_feed_forward_length"] = int(c["moe_intermediate_size"])
        if c.get("shared_expert_intermediate_size"):
            md[f"{a}.expert_shared_feed_forward_length"] = int(
                c["shared_expert_intermediate_size"]
            )
        # non-standard key (llama.cpp hardcodes this per arch and ignores
        # unknown keys); our serving loader prefers it over arch defaults
        md[f"{a}.expert_norm_topk_prob"] = bool(
            c.get("norm_topk_prob", self.gguf_arch == "llama")
        )
        return md


class Qwen2MoeArch(MoEArchSpec):
    gguf_arch = "qwen2moe"
    permute_qk = False


class Qwen3MoeArch(MoEArchSpec):
    gguf_arch = "qwen3moe"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c = self.hf
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{self.gguf_arch}.attention.key_length"] = head_dim
        md[f"{self.gguf_arch}.attention.value_length"] = head_dim
        return md


class MixtralArch(MoEArchSpec):
    """Mixtral maps to GGUF arch 'llama' with expert tensors (llama.cpp
    LlamaModel handles block_sparse_moe)."""

    gguf_arch = "llama"
    permute_qk = True
    n_expert_key = "num_local_experts"
    expert_prefix = "block_sparse_moe.experts."
    expert_proj = {"w1": "ffn_gate_exps", "w3": "ffn_up_exps", "w2": "ffn_down_exps"}
    moe_direct = {"block_sparse_moe.gate.weight": "ffn_gate_inp.weight"}


class GraniteArch(ArchSpec):
    """IBM Granite: llama structure + four mup-style scalar multipliers.
    GGUF logit_scale carries the *divisor* (llama.cpp granite divides)."""

    gguf_arch = "granite"
    permute_qk = True

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.embedding_scale"] = float(c.get("embedding_multiplier", 1.0))
        md[f"{a}.residual_scale"] = float(c.get("residual_multiplier", 1.0))
        md[f"{a}.attention.scale"] = float(
            c.get("attention_multiplier")
            or (c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]) ** -0.5
        )
        md[f"{a}.logit_scale"] = float(c.get("logits_scaling", 1.0))
        return md


class MiniCPMArch(ArchSpec):
    """MiniCPM: llama structure + depth/width scaling knobs. Emits the same
    derived scales llama.cpp's converter computes (embedding_scale=scale_emb,
    residual_scale=scale_depth/sqrt(L), logit_scale=hidden/dim_model_base as
    a divisor)."""

    gguf_arch = "minicpm"
    permute_qk = True

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        if c.get("scale_emb"):
            md[f"{a}.embedding_scale"] = float(c["scale_emb"])
        if c.get("scale_depth"):
            md[f"{a}.residual_scale"] = float(
                c["scale_depth"] / math.sqrt(c["num_hidden_layers"])
            )
        if c.get("dim_model_base"):
            md[f"{a}.logit_scale"] = float(c["hidden_size"] / c["dim_model_base"])
        return md


class ExaoneArch(ArchSpec):
    """EXAONE (LG): llama semantics under transformer.h.* names (handled by
    models/adapters.py); NeoX rope layout -> no q/k permute."""

    gguf_arch = "exaone"
    permute_qk = False


class InternLM2Arch(ArchSpec):
    """InternLM2: fused wqkv split by the adapter; llama-style rope."""

    gguf_arch = "internlm2"
    permute_qk = True


class BaichuanArch(ArchSpec):
    """Baichuan 7B (rope): W_pack split by the adapter. (13B alibi variants
    are not supported — no rope_theta in config means alibi.)"""

    gguf_arch = "baichuan"
    permute_qk = True


class _LayerNormArch(ArchSpec):
    """Shared metadata for mean-subtracting-LayerNorm families: emit the
    LayerNorm eps key, explicit head dims, and the partial-rotary dim count
    (rope.dimension_count = rotated dims, as llama.cpp expects)."""

    permute_qk = False  # all are NeoX/interleaved layouts: no permute
    partial_rotary_default = 1.0

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        eps = c.get("layer_norm_eps", c.get(
            "norm_epsilon", c.get("norm_eps", c.get("layer_norm_epsilon", 1e-5))))
        md[f"{a}.attention.layer_norm_epsilon"] = float(eps)
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        partial = c.get("partial_rotary_factor", self.partial_rotary_default)
        md[f"{a}.rope.dimension_count"] = int(head_dim * partial)
        return md


class StableLmArch(_LayerNormArch):
    gguf_arch = "stablelm"
    partial_rotary_default = 0.25

    def metadata(self):
        md = super().metadata()
        if self.hf.get("use_parallel_residual"):
            md[f"{self.gguf_arch}.use_parallel_residual"] = True
        return md


class Starcoder2Arch(_LayerNormArch):
    gguf_arch = "starcoder2"


class NemotronArch(_LayerNormArch):
    """Nemotron: layernorm1p. llama.cpp's converter folds the +1 into the
    stored norm weights; do the same so our GGUFs and llama.cpp's agree."""

    gguf_arch = "nemotron"
    partial_rotary_default = 0.5

    def transform_float(self, gguf_name: str, arr: np.ndarray) -> np.ndarray:
        if gguf_name.endswith("norm.weight"):
            return arr + 1.0
        return arr


class CohereArch(_LayerNormArch):
    """Cohere Command-R: parallel residual blocks, interleaved rope, no norm
    biases, logit_scale is a *multiplier* (llama.cpp command-r multiplies)."""

    gguf_arch = "command-r"

    def metadata(self):
        md = super().metadata()
        md[f"{self.gguf_arch}.logit_scale"] = float(self.hf.get("logit_scale", 1.0))
        return md


class PhiArch(_LayerNormArch):
    """phi-1/1.5/2 (model_type "phi"): parallel blocks, partial rotary 0.5,
    gateless fc1/fc2 MLP, biases everywhere incl. the lm head. Emits separate
    attn_q/k/v (llama.cpp's phi2 graph accepts both fused and split)."""

    gguf_arch = "phi2"
    partial_rotary_default = 0.5


class Glm4Arch(ArchSpec):
    """GLM-4-0414 (model_type glm4): gemma2-style sandwich norms (canonical
    names arrive pre-renamed by models/adapters._glm4), fused ffn_up
    (gate|up), interleaved partial rope — no q/k permutation."""

    gguf_arch = "glm4"
    permute_qk = False
    fused = {"ffn_up.weight": ("mlp.gate_proj", "mlp.up_proj")}

    def tensor_name(self, hf_name: str) -> Optional[str]:
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "post_attention_layernorm.weight":
                return f"blk.{i}.post_attention_norm.weight"
            if rest == "pre_feedforward_layernorm.weight":
                return f"blk.{i}.ffn_norm.weight"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.rope.dimension_count"] = int(
            head_dim * c.get("partial_rotary_factor", 0.5)
        )
        return md


class Cohere2Arch(CohereArch):
    """Cohere2 (command-r7b): hybrid attention — sliding layers with rope,
    global NoPE layers (reference Cohere2Model, pack_gptq_into_gguf.py:5920)."""

    gguf_arch = "cohere2"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.sliding_window"] = int(c.get("sliding_window", 4096))
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.rope.dimension_count"] = int(
            c.get("rotary_pct", 1.0) * head_dim
        )
        if c.get("layer_types"):
            # explicit per-layer flags (llama.cpp hardcodes the 3:1 pattern;
            # our serving loader prefers the key when present)
            md[f"{a}.attention.sliding_window_pattern"] = [
                t == "sliding_attention" for t in c["layer_types"]
            ]
        return md


class OlmoArch(ArchSpec):
    """OLMo v1: llama-permuted q/k, NON-parametric LayerNorm (no norm
    tensors exist), optional clamp_kqv (reference OlmoModel :5941)."""

    gguf_arch = "olmo"
    permute_qk = True

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        md[f"{a}.attention.layer_norm_epsilon"] = 1e-5
        if self.hf.get("clip_qkv") is not None:
            md[f"{a}.attention.clamp_kqv"] = float(self.hf["clip_qkv"])
        return md


class ArceeArch(LlamaArch):
    """Arcee AFM: llama structure with a gateless relu^2 MLP."""

    gguf_arch = "arcee"


class SeedOssArch(ArchSpec):
    """Seed-OSS: llama-like with q/k/v biases, explicit head_dim, NeoX
    layout (no permutation; reference SeedOssModel :5966)."""

    gguf_arch = "seed_oss"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        return md


class Ernie45Arch(SeedOssArch):
    """ERNIE 4.5 dense (reference Ernie4_5Model :3201): llama-like, NeoX
    layout, explicit head_dim (128 regardless of hidden/heads)."""

    gguf_arch = "ernie4_5"


class Exaone4Arch(ArchSpec):
    """EXAONE-4: post-norm blocks (olmo2-style), per-head qk norms, hybrid
    sliding attention with NoPE global layers (reference Exaone4Model
    :7406-7440 incl. the sliding_window_pattern array)."""

    gguf_arch = "exaone4"
    permute_qk = False

    def tensor_name(self, hf_name: str) -> Optional[str]:
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "post_attention_layernorm.weight":
                return f"blk.{i}.post_attention_norm.weight"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.vocab_size"] = c["vocab_size"]
        if c.get("sliding_window") is not None:
            md[f"{a}.attention.sliding_window"] = int(c["sliding_window"])
            pattern = None
            if c.get("layer_types"):
                pattern = [t == "sliding_attention" for t in c["layer_types"]]
            elif isinstance(c.get("sliding_window_pattern"), str):
                p = c["sliding_window_pattern"]
                pattern = [p[i % len(p)] == "L"
                           for i in range(c["num_hidden_layers"])]
            elif isinstance(c.get("sliding_window_pattern"), int):
                p = c["sliding_window_pattern"]
                pattern = [(i + 1) % p != 0
                           for i in range(c["num_hidden_layers"])]
            if pattern is not None:
                md[f"{a}.attention.sliding_window_pattern"] = pattern
        return md


class GraniteMoeArch(MoEArchSpec):
    """GraniteMoE: granite's mup scalars + mixtral-layout experts. The
    canonical per-expert names arrive pre-split by adapters._granitemoe
    (reference GraniteMoeModel splits the fused input_linear the same way,
    pack_gptq_into_gguf.py:7523-7538)."""

    gguf_arch = "granitemoe"
    permute_qk = True
    n_expert_key = "num_local_experts"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.embedding_scale"] = float(c.get("embedding_multiplier", 1.0))
        md[f"{a}.residual_scale"] = float(c.get("residual_multiplier", 1.0))
        md[f"{a}.attention.scale"] = float(
            c.get("attention_multiplier")
            or (c["hidden_size"] / c["num_attention_heads"]) ** -0.5
        )
        md[f"{a}.logit_scale"] = float(c.get("logits_scaling", 1.0))
        md[f"{a}.expert_norm_topk_prob"] = True  # softmax-over-topk-logits
        # experts use the dense intermediate_size (no moe_intermediate_size)
        md[f"{a}.expert_feed_forward_length"] = int(c["intermediate_size"])
        if c.get("shared_intermediate_size"):
            md[f"{a}.expert_shared_feed_forward_length"] = int(
                c["shared_intermediate_size"]
            )
        return md


class Glm4MoeArch(MoEArchSpec):
    """GLM-4.5/4.6 MoE (reference Glm4MoeModel :7007-7130): glm partial
    rope, deepseek-v3-style sigmoid router with correction bias, shared
    experts, leading dense blocks; NextN/MTP layer count carried in
    metadata."""

    gguf_arch = "glm4moe"
    permute_qk = False
    n_expert_key = "n_routed_experts"
    moe_direct = {
        **MoEArchSpec.moe_direct,
        "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    }

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.rope.dimension_count"] = int(
            head_dim * c.get("partial_rotary_factor", 0.5)
        )
        md[f"{a}.expert_shared_count"] = int(c.get("n_shared_experts", 0))
        md[f"{a}.leading_dense_block_count"] = int(
            c.get("first_k_dense_replace", 0)
        )
        md[f"{a}.expert_gating_func"] = 2  # sigmoid
        md[f"{a}.expert_weights_scale"] = float(
            c.get("routed_scaling_factor", 1.0)
        )
        md[f"{a}.expert_weights_norm"] = bool(c.get("norm_topk_prob", True))
        if c.get("n_group", 1) > 1:
            md[f"{a}.expert_group_count"] = int(c["n_group"])
            md[f"{a}.expert_group_used_count"] = int(c.get("topk_group", 1))
        if c.get("num_nextn_predict_layers") is not None:
            md[f"{a}.nextn_predict_layers"] = int(c["num_nextn_predict_layers"])
        return md


class Ernie45MoeArch(MoEArchSpec):
    """ERNIE-4.5 MoE (reference Ernie4_5MoeModel :3248-3330): leading dense
    blocks via moe_layer_start_index, MoE layer interval, fused shared
    experts, gating correction bias (moe_statics, canonicalized to the
    deepseek-style mlp.gate.e_score_correction_bias)."""

    gguf_arch = "ernie4_5-moe"
    permute_qk = False
    n_expert_key = "moe_num_experts"
    moe_direct = {
        **MoEArchSpec.moe_direct,
        "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    }

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.expert_used_count"] = int(c.get("moe_k", 2))
        md[f"{a}.interleave_moe_layer_step"] = int(c.get("moe_layer_interval", 1))
        md[f"{a}.expert_norm_topk_prob"] = True  # clamp-renormalized top-k
        md[f"{a}.leading_dense_block_count"] = int(c.get("moe_layer_start_index", 0))
        if c.get("moe_num_shared_experts"):
            md[f"{a}.expert_shared_count"] = int(c["moe_num_shared_experts"])
            md[f"{a}.expert_shared_feed_forward_length"] = int(
                c["moe_intermediate_size"] * c["moe_num_shared_experts"]
            )
        return md


class _LegacyGptArch(ArchSpec):
    """Shared plumbing for the classic GPT family: LayerNorm metadata, fused
    attn_qkv bias passthrough, no GQA permutation."""

    permute_qk = False
    fused = {
        "attn_qkv.weight": ("self_attn.q_proj", "self_attn.k_proj",
                            "self_attn.v_proj"),
    }

    def tensor_name(self, hf_name):
        if hf_name == "model.pos_embed.weight":
            return "position_embd.weight"
        if hf_name == "model.embed_norm.weight":
            return "token_embd_norm.weight"
        if hf_name == "model.embed_norm.bias":
            return "token_embd_norm.bias"
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "self_attn.qkv_proj.bias":
                return f"blk.{i}.attn_qkv.bias"
            if rest == "mlp_layernorm.weight":
                return f"blk.{i}.ffn_norm.weight"
            if rest == "mlp_layernorm.bias":
                return f"blk.{i}.ffn_norm.bias"
        return super().tensor_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.layer_norm_epsilon"] = float(
            c.get("layer_norm_epsilon", c.get("layer_norm_eps", 1e-5))
        )
        hidden = c.get("hidden_size", c.get("n_embd", c.get(
            "n_embed", c.get("d_model"))))
        n_head = c.get("num_attention_heads", c.get("n_head", c.get("n_heads")))
        # explicit head dims: partial-rotary archs write a smaller
        # rope.dimension_count, which must not be mistaken for head_dim
        md[f"{a}.attention.key_length"] = hidden // n_head
        md[f"{a}.attention.value_length"] = hidden // n_head
        return md


class GptNeoxArch(_LegacyGptArch):
    """GPT-NeoX / pythia (reference GPTNeoXModel :1438): per-head-fused qkv
    rearranged to [q;k;v] in the canonical pre-pass, parallel-residual flag."""

    gguf_arch = "gptneox"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.rope.dimension_count"] = int(
            c.get("rotary_pct", 1.0) * head_dim
        )
        md[f"{a}.use_parallel_residual"] = bool(
            c.get("use_parallel_residual", True)
        )
        return md


class GptJArch(_LegacyGptArch):
    """GPT-J (split q/k/v, interleaved partial rope, biased lm head)."""

    gguf_arch = "gptj"
    fused = {}

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        md = super().metadata()
        md[f"{a}.context_length"] = c.get("n_positions", 2048)
        md[f"{a}.embedding_length"] = c["n_embd"]
        md[f"{a}.block_count"] = c["n_layer"]
        md[f"{a}.feed_forward_length"] = c.get("n_inner") or 4 * c["n_embd"]
        md[f"{a}.attention.head_count"] = c["n_head"]
        md[f"{a}.attention.head_count_kv"] = c["n_head"]
        md[f"{a}.rope.dimension_count"] = int(
            c.get("rotary_dim") or c["n_embd"] // c["n_head"]
        )
        md[f"{a}.vocab_size"] = c["vocab_size"]
        return md


class Gpt2Arch(_LegacyGptArch):
    """GPT-2 (reference GPT2Model :3728): learned positions, Conv1D weights
    transposed in the canonical pre-pass, fused contiguous attn_qkv."""

    gguf_arch = "gpt2"

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        md = super().metadata()
        md[f"{a}.context_length"] = c.get("n_positions", c.get("n_ctx", 1024))
        md[f"{a}.embedding_length"] = c["n_embd"]
        md[f"{a}.block_count"] = c["n_layer"]
        md[f"{a}.feed_forward_length"] = c.get("n_inner") or 4 * c["n_embd"]
        md[f"{a}.attention.head_count"] = c["n_head"]
        md[f"{a}.attention.head_count_kv"] = c["n_head"]
        md[f"{a}.vocab_size"] = c["vocab_size"]
        return md


class BloomArch(_LegacyGptArch):
    """Bloom (reference BloomModel :1495): ALiBi, embedding LayerNorm
    (token_embd_norm), per-head-fused qkv rearranged in the pre-pass."""

    gguf_arch = "bloom"

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        md = super().metadata()
        n_embed = c.get("hidden_size", c.get("n_embed"))
        md[f"{a}.context_length"] = c.get("seq_length", 2048)
        md[f"{a}.embedding_length"] = n_embed
        md[f"{a}.block_count"] = c.get("num_hidden_layers", c.get("n_layer"))
        md[f"{a}.feed_forward_length"] = 4 * n_embed
        n_head = c.get("num_attention_heads", c.get("n_head"))
        md[f"{a}.attention.head_count"] = n_head
        md[f"{a}.attention.head_count_kv"] = n_head
        md[f"{a}.vocab_size"] = c["vocab_size"]
        return md


class MptArch(_LegacyGptArch):
    """MPT (reference MPTModel :1552): ALiBi with max_alibi_bias, optional
    clamp_kqv, bias-free everything."""

    gguf_arch = "mpt"

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        md = super().metadata()
        md[f"{a}.context_length"] = c.get("max_seq_len", 2048)
        md[f"{a}.embedding_length"] = c["d_model"]
        md[f"{a}.block_count"] = c["n_layers"]
        md[f"{a}.feed_forward_length"] = c.get("expansion_ratio", 4) * c["d_model"]
        md[f"{a}.attention.head_count"] = c["n_heads"]
        md[f"{a}.attention.head_count_kv"] = c["n_heads"]
        md[f"{a}.vocab_size"] = c["vocab_size"]
        attn = c.get("attn_config") or {}
        md[f"{a}.attention.max_alibi_bias"] = float(
            attn.get("alibi_bias_max", 8.0)
        )
        if attn.get("clip_qkv"):
            md[f"{a}.attention.clamp_kqv"] = float(attn["clip_qkv"])
        return md


class SmolLM3Arch(LlamaArch):
    """SmolLM3 (reference SmolLM3Model :8295): llama layout (GQA-permuted)
    with NoPE every no_rope_layer_interval-th layer (llama.cpp hardcodes
    the 4-interval; the explicit array key is ours, for the serving
    loader)."""

    gguf_arch = "smollm3"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        layers = c.get("no_rope_layers") or [
            int((i + 1) % c.get("no_rope_layer_interval", 4) != 0)
            for i in range(c["num_hidden_layers"])
        ]
        md[f"{a}.rope_layers"] = [bool(x) for x in layers]
        return md


class GlmArch(ArchSpec):
    """GLM-edge (GlmForCausalLM -> llama.cpp CHATGLM arch, reference
    ChatGLMModel :7140): split q/k/v with bias, fused gate_up ffn_up,
    interleaved partial rope."""

    gguf_arch = "chatglm"
    permute_qk = False
    fused = {"ffn_up.weight": ("mlp.gate_proj", "mlp.up_proj")}

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.rope.dimension_count"] = int(
            head_dim * c.get("partial_rotary_factor", 0.5)
        )
        return md


class StarCoderArch(_LegacyGptArch):
    """GPTBigCode / StarCoder v1 (reference StarCoderModel :1872): MQA fused
    c_attn, learned positions, gpt2-ish naming with Linear (untransposed)
    weights."""

    gguf_arch = "starcoder"

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        md = super().metadata()
        md[f"{a}.context_length"] = c.get("n_positions", 1024)
        md[f"{a}.attention.head_count_kv"] = (
            1 if c.get("multi_query", True) else c["n_head"]
        )
        return md


class DbrxArch(MoEArchSpec):
    """DBRX (reference DbrxModel :2781): fused contiguous Wqkv with
    clamp_kqv, norm_attn_norm nesting, flat expert stacks split to the
    canonical per-expert names in the pre-pass."""

    gguf_arch = "dbrx"
    permute_qk = False
    fused = {
        "attn_qkv.weight": ("self_attn.q_proj", "self_attn.k_proj",
                            "self_attn.v_proj"),
    }

    @property
    def n_expert(self) -> int:
        return int((self.hf.get("ffn_config") or {})["moe_num_experts"])

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        attn_c = c.get("attn_config") or {}
        ffn_c = c.get("ffn_config") or {}
        md[f"{a}.context_length"] = c.get("max_seq_len", 2048)
        md[f"{a}.feed_forward_length"] = int(ffn_c["ffn_hidden_size"])
        md[f"{a}.expert_feed_forward_length"] = int(ffn_c["ffn_hidden_size"])
        md[f"{a}.expert_used_count"] = int(ffn_c.get("moe_top_k", 2))
        md[f"{a}.expert_norm_topk_prob"] = True
        md[f"{a}.attention.head_count_kv"] = int(
            attn_c.get("kv_n_heads", c["n_heads"])
        )
        md[f"{a}.rope.freq_base"] = float(attn_c.get("rope_theta", 10000.0))
        if attn_c.get("clip_qkv"):
            md[f"{a}.attention.clamp_kqv"] = float(attn_c["clip_qkv"])
        md[f"{a}.attention.layer_norm_epsilon"] = 1e-5
        hd = c["d_model"] // c["n_heads"]
        md[f"{a}.attention.key_length"] = hd
        md[f"{a}.attention.value_length"] = hd
        return md


class MambaArch(ArchSpec):
    """Mamba SSM (reference MambaModel :5606): pack-only support — the
    reference likewise only CONVERTS SSM checkpoints (its GPTQ quantizer
    targets transformer blocks), so quantize/serve reject mamba while the
    packer emits llama.cpp-loadable F16/F32 GGUFs. A_log is stored as
    A = -exp(A_log); the depthwise conv kernel is squeezed."""

    gguf_arch = "mamba"
    permute_qk = False

    _direct = {
        "backbone.embeddings.weight": "token_embd.weight",
        "backbone.norm_f.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    _layer = {
        "norm.weight": "attn_norm.weight",
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.conv1d.weight": "ssm_conv1d.weight",
        "mixer.conv1d.bias": "ssm_conv1d.bias",
        "mixer.x_proj.weight": "ssm_x.weight",
        "mixer.dt_proj.weight": "ssm_dt.weight",
        "mixer.dt_proj.bias": "ssm_dt.bias",
        "mixer.A_log": "ssm_a",  # no .weight suffix (llama.cpp SSM names)
        "mixer.D": "ssm_d",
        "mixer.out_proj.weight": "ssm_out.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name in self._direct:
            return self._direct[hf_name]
        if hf_name.startswith("backbone.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{i}.{self._layer[rest]}"
        return None

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)  # A_log -> A (reference :5670)
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)  # (d_inner, 1, k) -> (d_inner, k)
        return arr

    def metadata(self):
        c = self.hf
        a = self.gguf_arch
        d_model = c.get("hidden_size", c.get("d_model"))
        d_inner = c.get("intermediate_size", c.get("d_inner")) or 2 * d_model
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 2 ** 20,  # reference :5652 (arbitrary)
            f"{a}.embedding_length": d_model,
            f"{a}.block_count": c.get("num_hidden_layers", c.get("n_layer")),
            f"{a}.feed_forward_length": 0,   # unused, required at load
            f"{a}.attention.head_count": 0,  # unused, required at load
            f"{a}.ssm.conv_kernel": c.get("conv_kernel", c.get("d_conv", 4)),
            f"{a}.ssm.inner_size": d_inner,
            f"{a}.ssm.state_size": c.get("state_size", c.get("d_state", 16)),
            f"{a}.ssm.time_step_rank": c.get(
                "time_step_rank", c.get("dt_rank")
            ) or -(d_model // -16),
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("layer_norm_epsilon", c.get("rms_norm_eps", 1e-5))
            ),
            f"{a}.ssm.dt_b_c_rms": c.get("model_type") == "falcon_mamba",
            f"{a}.vocab_size": c["vocab_size"],
        }


class Mamba2Arch(MambaArch):
    """Mamba-2 (reference Mamba2Model :5693): grouped SSD heads — A/D are
    per-head scalars stored with a trailing unit dim, the gated RMSNorm is
    reshaped per group, dt_bias maps to ssm_dt.bias."""

    gguf_arch = "mamba2"

    _layer = {
        "norm.weight": "attn_norm.weight",
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.conv1d.weight": "ssm_conv1d.weight",
        "mixer.conv1d.bias": "ssm_conv1d.bias",
        "mixer.dt_bias": "ssm_dt.bias",
        "mixer.A_log": "ssm_a",
        "mixer.D": "ssm_d",
        "mixer.norm.weight": "ssm_norm.weight",
        "mixer.out_proj.weight": "ssm_out.weight",
    }

    @property
    def _d_inner(self):
        c = self.hf
        d_model = c.get("hidden_size", c.get("d_model"))
        return c.get("intermediate_size", c.get("d_inner")) or int(
            c.get("expand", 2) * d_model
        )

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)[..., None]
        if gguf_name.endswith(".ssm_d"):
            return arr[..., None]
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)
        if gguf_name.endswith("ssm_norm.weight"):
            ng = self.hf.get("n_groups", 1)
            return arr.reshape(ng, self._d_inner // ng)
        return arr

    def metadata(self):
        c = self.hf
        a = self.gguf_arch
        d_model = c.get("hidden_size", c.get("d_model"))
        d_inner = self._d_inner
        head_dim = c.get("mamba_d_head", c.get("head_dim", 64))
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 2 ** 20,
            f"{a}.embedding_length": d_model,
            f"{a}.block_count": c.get("num_hidden_layers", c.get("n_layer")),
            f"{a}.feed_forward_length": 0,
            f"{a}.attention.head_count": 0,
            f"{a}.ssm.conv_kernel": c.get("conv_kernel", c.get("d_conv", 4)),
            f"{a}.ssm.inner_size": d_inner,
            f"{a}.ssm.state_size": c.get("state_size", c.get("d_state", 128)),
            f"{a}.ssm.time_step_rank": d_inner // head_dim,
            f"{a}.ssm.group_count": c.get("n_groups", 1),
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("layer_norm_epsilon", c.get("rms_norm_eps", 1e-5))
            ),
            f"{a}.vocab_size": c["vocab_size"],
        }


class JambaArch(MoEArchSpec):
    """Jamba hybrid (reference JambaModel :5745): interleaved attention and
    mamba layers (per-layer head_count_kv VECTOR — 0 on SSM layers), MoE on
    every expert_layer_period-th layer, SSM dt/B/C RMSNorms. Pack-only like
    the other SSM archs."""

    gguf_arch = "jamba"
    permute_qk = False
    expert_prefix = "feed_forward.experts."
    moe_direct = {"feed_forward.router.weight": "ffn_gate_inp.weight"}

    _fixed = {
        "model.final_layernorm.weight": "output_norm.weight",
    }
    _layer = {
        "input_layernorm.weight": "attn_norm.weight",
        "pre_ff_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "feed_forward.gate_proj.weight": "ffn_gate.weight",
        "feed_forward.up_proj.weight": "ffn_up.weight",
        "feed_forward.down_proj.weight": "ffn_down.weight",
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.x_proj.weight": "ssm_x.weight",
        "mamba.dt_proj.weight": "ssm_dt.weight",
        "mamba.dt_proj.bias": "ssm_dt.bias",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.out_proj.weight": "ssm_out.weight",
        "mamba.dt_layernorm.weight": "ssm_dt_norm.weight",
        "mamba.b_layernorm.weight": "ssm_b_norm.weight",
        "mamba.c_layernorm.weight": "ssm_c_norm.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name in self._fixed:
            return self._fixed[hf_name]
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{i}.{self._layer[rest]}"
        return hf_to_gguf_name(hf_name)

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)
        return arr

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        d_model = c["hidden_size"]
        n_layers = c["num_hidden_layers"]
        n_kv = c["num_key_value_heads"]
        off, per = c["attn_layer_offset"], c["attn_layer_period"]
        md[f"{a}.attention.head_count_kv"] = [
            (n_kv if i >= off and (i - off) % per == 0 else 0)
            for i in range(n_layers)
        ]
        md[f"{a}.ssm.conv_kernel"] = c.get("mamba_d_conv", 4)
        md[f"{a}.ssm.inner_size"] = c.get("mamba_expand", 2) * d_model
        md[f"{a}.ssm.state_size"] = c.get("mamba_d_state", 16)
        md[f"{a}.ssm.time_step_rank"] = c.get("mamba_dt_rank") or -(
            d_model // -16
        )
        md[f"{a}.expert_feed_forward_length"] = c["intermediate_size"]
        return md


class GraniteHybridArch(MoEArchSpec):
    """granitemoehybrid / bamba (reference GraniteHybridModel :7563):
    mamba2 SSM layers interleaved with llama-permuted GQA attention layers
    (per-layer head_count_kv vector), optional granite mup scalars, optional
    MoE + fused shared MLP (canonicalized by adapters). Pack-only like the
    other SSM archs."""

    gguf_arch = "granitehybrid"
    permute_qk = True  # attention layers follow the llama permute
    n_expert_key = "num_local_experts"

    _layer_ssm = {
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.dt_bias": "ssm_dt.bias",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.norm.weight": "ssm_norm.weight",
        "mamba.out_proj.weight": "ssm_out.weight",
        "feed_forward.gate_proj.weight": "ffn_gate.weight",
        "feed_forward.up_proj.weight": "ffn_up.weight",
        "feed_forward.down_proj.weight": "ffn_down.weight",
        "pre_ff_layernorm.weight": "ffn_norm.weight",
    }

    @property
    def _d_inner(self):
        c = self.hf
        if c.get("mamba_n_heads") and c.get("mamba_d_head"):
            return int(c["mamba_n_heads"] * c["mamba_d_head"])
        return int(c.get("mamba_expand", 2) * c["hidden_size"])

    def tensor_name(self, hf_name):
        if hf_name == "model.final_layernorm.weight":  # bamba final norm
            return "output_norm.weight"
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self._layer_ssm:
                return f"blk.{i}.{self._layer_ssm[rest]}"
        return super().tensor_name(hf_name)

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)[..., None]
        if gguf_name.endswith(".ssm_d"):
            return arr[..., None]
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)
        if gguf_name.endswith("ssm_norm.weight"):
            ng = self.hf.get("mamba_n_groups", self.hf.get("n_groups", 1))
            return arr.reshape(ng, self._d_inner // ng)
        return arr

    def _attn_layers(self):
        c = self.hf
        n = c["num_hidden_layers"]
        if c.get("layer_types"):
            return [i for i, t in enumerate(c["layer_types"])
                    if t == "attention"]
        if c.get("attn_layer_indices"):
            return list(c["attn_layer_indices"])
        per, off = c["attn_layer_period"], c.get("attn_layer_offset", 0)
        return [i for i in range(n) if i % per == off]

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        has_moe = bool(c.get(self.n_expert_key))
        md = super().metadata() if has_moe else ArchSpec.metadata(self)
        if not has_moe:
            for k in list(md):
                if "expert" in k:
                    md.pop(k)
        n = c["num_hidden_layers"]
        attn = set(self._attn_layers())
        n_kv = c.get("num_key_value_heads", c["num_attention_heads"])
        md[f"{a}.attention.head_count_kv"] = [
            (n_kv if i in attn else 0) for i in range(n)
        ]
        md[f"{a}.ssm.conv_kernel"] = c.get("mamba_d_conv", 4)
        md[f"{a}.ssm.state_size"] = c.get("mamba_d_state", 128)
        md[f"{a}.ssm.group_count"] = c.get(
            "mamba_n_groups", c.get("n_groups", 1))
        md[f"{a}.ssm.inner_size"] = self._d_inner
        md[f"{a}.ssm.time_step_rank"] = c.get("mamba_n_heads", 128)
        if c.get("attn_rotary_emb"):
            md[f"{a}.rope.dimension_count"] = int(c["attn_rotary_emb"])
        use_rope = "BambaForCausalLM" in (c.get("architectures") or [])
        md[f"{a}.rope.scaling.finetuned"] = use_rope
        for key, mk in (("embedding_multiplier", "embedding_scale"),
                        ("residual_multiplier", "residual_scale"),
                        ("attention_multiplier", "attention.scale")):
            if c.get(key):
                md[f"{a}.{mk}"] = float(c[key])
        if c.get("logits_scaling"):
            md[f"{a}.logit_scale"] = float(c["logits_scaling"])
        if c.get("shared_intermediate_size"):
            md[f"{a}.expert_shared_feed_forward_length"] = int(
                c["shared_intermediate_size"])
        return md


class FalconH1Arch(ArchSpec):
    """Falcon-H1 (reference FalconH1Model :7955): parallel attention + mamba2
    in EVERY layer, with the channel multipliers FOLDED INTO the tensors at
    conversion time (q/v x attention_in, k additionally x key, o x
    attention_out, gate/down x mlp_multipliers, in_proj piecewise x
    ssm_multipliers over [z|x|B|C|dt], out_proj x ssm_out, embeddings and
    lm head x their multipliers) so llama.cpp needs no extra keys.
    Pack-only like the other SSM archs."""

    gguf_arch = "falcon-h1"
    permute_qk = False

    _layer = {
        "input_layernorm.weight": "attn_norm.weight",
        "pre_ff_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "feed_forward.gate_proj.weight": "ffn_gate.weight",
        "feed_forward.up_proj.weight": "ffn_up.weight",
        "feed_forward.down_proj.weight": "ffn_down.weight",
        "mamba.in_proj.weight": "ssm_in.weight",
        "mamba.conv1d.weight": "ssm_conv1d.weight",
        "mamba.conv1d.bias": "ssm_conv1d.bias",
        "mamba.dt_bias": "ssm_dt.bias",
        "mamba.A_log": "ssm_a",
        "mamba.D": "ssm_d",
        "mamba.norm.weight": "ssm_norm.weight",
        "mamba.out_proj.weight": "ssm_out.weight",
    }

    @property
    def _d_inner(self):
        c = self.hf
        return int(c.get("mamba_d_ssm")
                   or c.get("mamba_expand", 2) * c["hidden_size"])

    def tensor_name(self, hf_name):
        if hf_name == "model.final_layernorm.weight":
            return "output_norm.weight"
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{i}.{self._layer[rest]}"
        return hf_to_gguf_name(hf_name)

    def transform_float(self, gguf_name, arr):
        c = self.hf
        mlp = c.get("mlp_multipliers") or [1.0, 1.0]
        mult = {
            "attn_q.weight": c.get("attention_in_multiplier", 1.0),
            "attn_v.weight": c.get("attention_in_multiplier", 1.0),
            "attn_k.weight": (c.get("attention_in_multiplier", 1.0)
                              * c.get("key_multiplier", 1.0)),
            "attn_output.weight": c.get("attention_out_multiplier", 1.0),
            "ffn_gate.weight": mlp[0],
            "ffn_down.weight": mlp[1],
            "ssm_out.weight": c.get("ssm_out_multiplier", 1.0),
        }
        for suffix, m in mult.items():
            if gguf_name.endswith(suffix):
                return arr * m
        if gguf_name == "token_embd.weight":
            return arr * c.get("embedding_multiplier", 1.0)
        if gguf_name == "output.weight":
            return arr * c.get("lm_head_multiplier", 1.0)
        if gguf_name.endswith("ssm_in.weight"):
            arr = arr * c.get("ssm_in_multiplier", 1.0)
            zx = c.get("ssm_multipliers")
            if zx is not None:
                d = self._d_inner
                gts = c.get("mamba_n_groups", 1) * c.get("mamba_d_state", 128)
                arr = arr.copy()
                arr[:d] *= zx[0]
                arr[d:2 * d] *= zx[1]
                arr[2 * d:2 * d + gts] *= zx[2]
                arr[2 * d + gts:2 * d + 2 * gts] *= zx[3]
                arr[2 * d + 2 * gts:] *= zx[4]
            return arr
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)[..., None]
        if gguf_name.endswith(".ssm_d"):
            return arr[..., None]
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)
        if gguf_name.endswith("ssm_norm.weight"):
            ng = c.get("mamba_n_groups", 1)
            return arr.reshape(ng, self._d_inner // ng)
        return arr

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.ssm.conv_kernel"] = c.get("mamba_d_conv", 4)
        md[f"{a}.ssm.state_size"] = c.get("mamba_d_state", 128)
        md[f"{a}.ssm.group_count"] = c.get("mamba_n_groups", 1)
        md[f"{a}.ssm.inner_size"] = self._d_inner
        md[f"{a}.ssm.time_step_rank"] = c.get("mamba_n_heads", 128)
        return md


class FalconArch(ArchSpec):
    """Falcon (reference FalconModel :1818): fused attn_qkv in the
    rearranged [q; k; v] layout (the canonical pre-pass applies the same
    jploski transform the converter does), LayerNorm(+bias), parallel
    residual, gateless exact-gelu MLP, ln_attn/ln_mlp dual norms on the
    new-decoder variants."""

    gguf_arch = "falcon"
    permute_qk = False
    fused = {
        "attn_qkv.weight": ("self_attn.q_proj", "self_attn.k_proj",
                            "self_attn.v_proj"),
    }

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest == "mlp_layernorm.weight":
                return f"blk.{i}.attn_norm_2.weight"
            if rest == "mlp_layernorm.bias":
                return f"blk.{i}.attn_norm_2.bias"
        return super().tensor_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.feed_forward_length"] = 4 * c["hidden_size"]
        md[f"{a}.attention.layer_norm_epsilon"] = float(
            c.get("layer_norm_epsilon", 1e-5)
        )
        n_kv = (c.get("num_kv_heads") if c.get("new_decoder_architecture")
                else (1 if c.get("multi_query", True)
                      else c["num_attention_heads"]))
        md[f"{a}.attention.head_count_kv"] = int(n_kv)
        md["general.tensor_data_layout"] = "jploski"
        return md


class HunYuanDenseArch(ArchSpec):
    """HunYuan dense (reference HunYuanModel :8203): per-head q/k norms
    applied after rope, NTK-alpha dynamic rope folded into freq_base."""

    gguf_arch = "hunyuan-dense"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        rs = dict(c.get("rope_scaling") or {})
        if rs.get("type") == "dynamic" and rs.get("alpha"):
            # NTK-aware alpha scaling folds into the base frequency
            # (reference :8266-8280)
            base = float(c.get("rope_theta", 10000.0))
            md[f"{a}.rope.freq_base"] = base * (
                float(rs["alpha"]) ** (head_dim / (head_dim - 2))
            )
            md.pop(f"{a}.rope.scaling.type", None)
        return md


class HunYuanMoeArch(MoEArchSpec):
    """HunYuan MoE (reference HunYuanMoEV1ForCausalLM :8062): softmax
    top-k router (mlp.gate.wg, canonicalized), unconditional shared MLP."""

    gguf_arch = "hunyuan-moe"
    permute_qk = False
    n_expert_key = "num_experts"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        topk = c.get("moe_topk", 2)
        md[f"{a}.expert_used_count"] = int(
            topk[0] if isinstance(topk, list) else topk
        )
        md[f"{a}.expert_norm_topk_prob"] = True
        md[f"{a}.expert_shared_feed_forward_length"] = int(c["intermediate_size"])
        shared = c.get("num_shared_expert", 1)
        md[f"{a}.expert_shared_count"] = int(
            shared[0] if isinstance(shared, list) else shared
        )
        mi = c.get("moe_intermediate_size")
        if mi is not None:
            md[f"{a}.expert_feed_forward_length"] = int(
                mi[0] if isinstance(mi, list) else mi
            )
        return md

    @property
    def n_expert(self) -> int:
        n = self.hf[self.n_expert_key]
        return int(n[0] if isinstance(n, list) else n)


class GptOssArch(MoEArchSpec):
    """gpt-oss (reference GptOssModel :8310): biased router, per-expert
    biases, attention sinks, alternating sliding layers, yarn rope with
    truncate=False. Canonical per-expert names arrive pre-split (adapters
    _gpt_oss mirrors the reference's gate_up/down transposed splits)."""

    gguf_arch = "gpt-oss"
    permute_qk = False
    n_expert_key = "num_local_experts"
    moe_direct = {
        "mlp.gate.weight": "ffn_gate_inp.weight",
        "mlp.gate.bias": "ffn_gate_inp.bias",
    }

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers.") and                 hf_name.endswith("self_attn.sinks"):
            return f"blk.{hf_name.split('.')[2]}.attn_sinks.weight"
        return super().tensor_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.attention.sliding_window"] = int(c.get("sliding_window", 128))
        md[f"{a}.expert_feed_forward_length"] = int(c["intermediate_size"])
        md[f"{a}.expert_norm_topk_prob"] = True  # softmax over top-k logits
        if c.get("layer_types"):
            md[f"{a}.attention.sliding_window_pattern"] = [
                t == "sliding_attention" for t in c["layer_types"]
            ]
        rs = dict(c.get("rope_scaling") or {})
        if rs.get("truncate") is not None:
            # non-standard: carries HF yarn truncate=False through the GGUF
            md[f"{a}.rope.scaling.yarn_truncate"] = bool(rs["truncate"])
        return md


class Dots1Arch(MoEArchSpec):
    """dots.llm1 (reference Dots1Model :6558): deepseek-v3-style sigmoid
    router with correction bias over a qwen3-ish dense stack (per-head qk
    norms, explicit head_dim)."""

    gguf_arch = "dots1"
    permute_qk = False
    n_expert_key = "n_routed_experts"
    moe_direct = {
        **MoEArchSpec.moe_direct,
        "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    }

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        md[f"{a}.leading_dense_block_count"] = int(c.get("first_k_dense_replace", 0))
        md[f"{a}.expert_shared_count"] = int(c.get("n_shared_experts", 0))
        md[f"{a}.expert_weights_scale"] = float(c.get("routed_scaling_factor", 1.0))
        md[f"{a}.expert_weights_norm"] = bool(c.get("norm_topk_prob", False))
        md[f"{a}.expert_gating_func"] = 2  # noaux_tc sigmoid
        if c.get("n_group", 1) > 1:
            md[f"{a}.expert_group_count"] = int(c["n_group"])
            md[f"{a}.expert_group_used_count"] = int(c.get("topk_group", 1))
        return md


class Deepseek2Arch(MoEArchSpec):
    """deepseek_v2 / deepseek_v3 (MLA + deepseek-MoE).

    Mirrors the reference DeepseekV2Model (pack_gptq_into_gguf.py:6369-6556):
    llama.cpp stores MLA as MQA with one kv head (key_length = kv_lora_rank +
    qk_rope_head_dim, value_length = kv_lora_rank) plus the decompression
    projections attn_k_b / attn_v_b split from HF's kv_b_proj — k_b with the
    last two axes transposed for the score-side absorption."""

    gguf_arch = "deepseek2"
    permute_qk = False
    n_expert_key = "n_routed_experts"

    _direct = {
        "self_attn.q_a_proj.weight": "attn_q_a.weight",
        "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
        "self_attn.q_b_proj.weight": "attn_q_b.weight",
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    }

    def tensor_name(self, hf_name: str) -> Optional[str]:
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest in self._direct:
                return f"blk.{i}.{self._direct[rest]}"
            if rest == "self_attn.kv_b_proj.weight":
                return None  # handled by special_tensors
        return super().tensor_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        dn, dr = c["qk_nope_head_dim"], c["qk_rope_head_dim"]
        dv, L = c["v_head_dim"], c["kv_lora_rank"]
        # MLA loads as MQA with 1 kv head of the compressed dims
        md[f"{a}.attention.head_count_kv"] = 1
        md[f"{a}.attention.key_length"] = L + dr
        md[f"{a}.attention.value_length"] = L
        md[f"{a}.attention.key_length_mla"] = dn + dr
        md[f"{a}.attention.value_length_mla"] = dv
        md[f"{a}.leading_dense_block_count"] = int(c.get("first_k_dense_replace", 0))
        if c.get("q_lora_rank"):
            md[f"{a}.attention.q_lora_rank"] = int(c["q_lora_rank"])
        md[f"{a}.attention.kv_lora_rank"] = int(L)
        md[f"{a}.expert_shared_count"] = int(c.get("n_shared_experts", 0))
        md[f"{a}.expert_weights_scale"] = float(c.get("routed_scaling_factor", 1.0))
        md[f"{a}.expert_weights_norm"] = bool(c.get("norm_topk_prob", False))
        # group-limited routing (v2 group_limited_greedy / v3 noaux-tc)
        group_limited = c.get("model_type") == "deepseek_v3" or \
            c.get("topk_method") == "group_limited_greedy"
        if group_limited and c.get("n_group", 1) >= 1:
            md[f"{a}.expert_group_count"] = int(c.get("n_group", 1))
            md[f"{a}.expert_group_used_count"] = int(c.get("topk_group", 1))
        # ExpertGatingFuncType: 1 = softmax, 2 = sigmoid
        md[f"{a}.expert_gating_func"] = (
            2 if c.get("scoring_func") == "sigmoid" else 1
        )
        md[f"{a}.rope.dimension_count"] = int(dr)
        rs = dict(c.get("rope_scaling") or {})
        if rs.get("rope_type", rs.get("type")) == "yarn" and rs.get("mscale_all_dim"):
            md[f"{a}.rope.scaling.yarn_log_multiplier"] = 0.1 * float(
                rs["mscale_all_dim"]
            )
        # resolved softmax scale (HF: qk_head_dim^-0.5, x mscale^2 on v3 with
        # yarn mscale_all_dim) so the serving loader needs no arch heuristics
        scale = (dn + dr) ** -0.5
        if c.get("model_type") == "deepseek_v3" and rs.get("mscale_all_dim") \
                and rs.get("factor", 1.0) > 1:
            import math as _math

            m = 0.1 * rs["mscale_all_dim"] * _math.log(rs["factor"]) + 1.0
            scale *= m * m
        md[f"{a}.attention.scale"] = float(scale)
        return md

    def special_tensors(self, hf_name: str, arr: np.ndarray, get_artifact):
        if not (hf_name.startswith("model.layers.")
                and hf_name.endswith("self_attn.kv_b_proj.weight")):
            return None
        c = self.hf
        i = hf_name.split(".")[2]
        nH = c["num_attention_heads"]
        dn, dv, L = c["qk_nope_head_dim"], c["v_head_dim"], c["kv_lora_rank"]
        out = []
        art = get_artifact(f"model.layers.{i}.self_attn.kv_b_proj")
        rows = np.arange(nH * (dn + dv)).reshape(nH, dn + dv)
        v_rows = rows[:, dn:].reshape(-1)
        if art is not None:
            # v_b is a pure row selection of the quantized tensor (each row
            # keeps its kv_lora extent) — stays K-quant
            out.append(("quant", f"blk.{i}.attn_v_b.weight",
                        _permute_artifact(art, v_rows), (nH, dv, L)))
            # k_b needs a transpose of the last two axes, which cannot be
            # expressed on row-quantized codes; carry the quantization error
            # by dequantizing (the reference's QuantError -> F16 fallback)
            w = np.asarray(art.dequantize()).astype(np.float32)
        else:
            w = arr.astype(np.float32)
            v_b = w.reshape(nH, dn + dv, L)[:, dn:]
            out.append(("float", f"blk.{i}.attn_v_b.weight",
                        v_b.astype(np.float16)))
        k_b = w.reshape(nH, dn + dv, L)[:, :dn].transpose(0, 2, 1)  # (nH, L, dn)
        out.append(("float", f"blk.{i}.attn_k_b.weight",
                    np.ascontiguousarray(k_b).astype(np.float16)))
        return out


class OlmoeArch(MoEArchSpec):
    gguf_arch = "olmoe"
    permute_qk = False  # olmo family uses NeoX rope = HF layout


class DeepseekArch(MoEArchSpec):
    """DeepSeek v1 (dense leading layers + routed/shared experts)."""

    gguf_arch = "deepseek"
    permute_qk = True
    n_expert_key = "n_routed_experts"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.leading_dense_block_count"] = int(c.get("first_k_dense_replace", 0))
        md[f"{a}.expert_shared_count"] = int(c.get("n_shared_experts", 0))
        md[f"{a}.expert_weights_scale"] = float(c.get("routed_scaling_factor", 1.0))
        return md


class Qwen2VLArch(ArchSpec):
    """Qwen2-VL / Qwen2.5-VL text stack (reference Qwen2VLModel :2957 region
    :5129+): qwen2 weights + the 4-padded mrope dimension sections; vision
    tensors are dropped in the shared pre-pass."""

    gguf_arch = "qwen2vl"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        sec = list((self.hf.get("rope_scaling") or {}).get("mrope_section")
                   or [16, 24, 24])
        sec += [0] * max(0, 4 - len(sec))
        md[f"{a}.rope.dimension_sections"] = [int(x) for x in sec]
        md.pop(f"{a}.rope.scaling.type", None)
        md.pop(f"{a}.rope.scaling.factor", None)
        return md


class Rwkv6Arch(ArchSpec):
    """RWKV-6 Finch (reference Rwkv6Model :5318-5390): time-mix lora
    transposes, lerp weights squeezed and fused into a single
    time_mix_lerp_fused stack, layer-rescale division every
    rescale_every layers, unbounded context."""

    gguf_arch = "rwkv6"
    permute_qk = False
    _lerp_keys = ("w", "k", "v", "r", "g")

    def __init__(self, hf_config):
        super().__init__(hf_config)
        self._lerp: Dict[str, Dict[str, np.ndarray]] = {}

    @staticmethod
    def _normalize(name: str) -> str:
        if name.startswith("rwkv."):
            name = "model." + name[len("rwkv."):]
        name = name.replace(".blocks.", ".layers.")
        name = name.replace(".self_attn.", ".attention.")
        name = name.replace(".attn.", ".attention.")
        name = name.replace(".ffn.", ".feed_forward.")
        name = name.replace(".mlp.", ".feed_forward.")
        return name

    _attn_map = {
        "time_maa_x": "time_mix_lerp_x.weight",
        "time_maa_w1": "time_mix_w1.weight",
        "time_maa_w2": "time_mix_w2.weight",
        "time_decay": "time_mix_decay.weight",
        "time_decay_w1": "time_mix_decay_w1.weight",
        "time_decay_w2": "time_mix_decay_w2.weight",
        "time_faaaa": "time_mix_first.weight",
        "receptance.weight": "time_mix_receptance.weight",
        "key.weight": "time_mix_key.weight",
        "value.weight": "time_mix_value.weight",
        "gate.weight": "time_mix_gate.weight",
        "output.weight": "time_mix_output.weight",
        "q_proj.weight": "time_mix_receptance.weight",
        "k_proj.weight": "time_mix_key.weight",
        "v_proj.weight": "time_mix_value.weight",
        "o_proj.weight": "time_mix_output.weight",
        "ln_x.weight": "time_mix_ln.weight",
        "ln_x.bias": "time_mix_ln.bias",
    }
    _ffn_map = {
        "time_maa_k": "channel_mix_lerp_k.weight",
        "time_maa_r": "channel_mix_lerp_r.weight",
        "key.weight": "channel_mix_key.weight",
        "receptance.weight": "channel_mix_receptance.weight",
        "value.weight": "channel_mix_value.weight",
    }
    _norm_map = {
        "ln1.weight": "attn_norm.weight", "ln1.bias": "attn_norm.bias",
        "ln2.weight": "attn_norm_2.weight", "ln2.bias": "attn_norm_2.bias",
    }

    def tensor_name(self, hf_name):
        name = self._normalize(hf_name)
        fixed = {"model.embeddings.weight": "token_embd.weight",
                 "model.embed_tokens.weight": "token_embd.weight",
                 "model.layers.0.pre_ln.weight": "token_embd_norm.weight",
                 "model.layers.0.pre_ln.bias": "token_embd_norm.bias",
                 "model.ln_out.weight": "output_norm.weight",
                 "model.ln_out.bias": "output_norm.bias",
                 "model.norm.weight": "output_norm.weight",
                 "head.weight": "output.weight",
                 "lm_head.weight": "output.weight"}
        if name in fixed:
            return fixed[name]
        if not name.startswith("model.layers."):
            return None
        parts = name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        if rest in self._norm_map:
            return f"blk.{i}.{self._norm_map[rest]}"
        if rest.startswith("attention."):
            sub = rest[len("attention."):]
            if sub in self._attn_map:
                return f"blk.{i}.{self._attn_map[sub]}"
        if rest.startswith("feed_forward."):
            sub = rest[len("feed_forward."):]
            if sub in self._ffn_map:
                return f"blk.{i}.{self._ffn_map[sub]}"
        return None

    def special_tensors(self, hf_name, arr, get_artifact):
        name = self._normalize(hf_name)
        if ".attention.time_maa_" not in name:
            return None
        key = name.rsplit("time_maa_", 1)[1]
        if key not in self._lerp_keys:
            return None  # x / w1 / w2 handled by tensor_name
        i = name.split(".")[2]
        acc = self._lerp.setdefault(i, {})
        acc[key] = np.asarray(arr, dtype=np.float32).reshape(-1)
        if len(acc) < len(self._lerp_keys):
            return []
        fused = np.stack([acc[k] for k in self._lerp_keys])  # (5, hidden)
        fused = fused.reshape(len(self._lerp_keys), 1, 1, -1)
        del self._lerp[i]
        return [("float", f"blk.{i}.time_mix_lerp_fused.weight",
                 fused.astype(np.float32))]

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(("time_mix_w1.weight", "time_mix_decay_w1.weight",
                               "time_mix_decay_w2.weight")):
            return np.ascontiguousarray(arr.T)
        if gguf_name.endswith("time_mix_w2.weight"):
            return np.ascontiguousarray(arr.transpose(0, 2, 1))
        if gguf_name.endswith("time_mix_decay.weight") or "lerp" in gguf_name:
            arr = np.squeeze(arr)
        re_n = self.hf.get("rescale_every", 0)
        if re_n and gguf_name.endswith(("time_mix_output.weight",
                                        "channel_mix_value.weight")):
            bid = int(gguf_name.split(".")[1])
            arr = arr / (2 ** (bid // re_n))
        return arr

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        hidden = c["hidden_size"]
        ff = c.get("intermediate_size") or int((hidden * 3.5) // 32 * 32)
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 1048576,  # RWKV is not context limited
            f"{a}.embedding_length": int(hidden),
            f"{a}.block_count": int(c["num_hidden_layers"]),
            f"{a}.attention.layer_norm_epsilon": float(
                c.get("layer_norm_epsilon", 1e-5)),
            f"{a}.rescale_every_n_layers": int(c.get("rescale_every", 6)),
            f"{a}.wkv.head_size": int(c["head_size"]),
            f"{a}.time_mix_extra_dim": 64 if hidden == 4096 else 32,
            f"{a}.time_decay_extra_dim": 128 if hidden == 4096 else 64,
            f"{a}.feed_forward_length": int(ff),
            f"{a}.attention.head_count": 0,  # required by llama.cpp, unused
            f"{a}.vocab_size": int(c["vocab_size"]),
        }


class Rwkv6Qwen2Arch(Rwkv6Arch):
    """RWKV6-in-Qwen2 hybrid (reference RWKV6Qwen2Model :5393-5442): qwen2
    MLP/norm naming, GQA kv heads, single token shift, and the rkvwg->wkvrg
    reorder of the fused time-mix loras."""

    gguf_arch = "rwkv6qwen2"

    _ffn_map = {
        "gate_proj.weight": "ffn_gate.weight",
        "up_proj.weight": "ffn_up.weight",
        "down_proj.weight": "ffn_down.weight",
    }
    _norm_map = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
    }

    def transform_float(self, gguf_name, arr):
        arr = super().transform_float(gguf_name, arr)
        if gguf_name.endswith(("time_mix_w1.weight", "time_mix_w2.weight")):
            # reorder rkvwg -> wkvrg (reference :5434-5440)
            data = arr.reshape(5, -1, arr.shape[-1])
            data = np.stack([data[3], data[1], data[2], data[0], data[4]])
            if gguf_name.endswith("w2.weight"):
                return data
            return data.reshape(-1, arr.shape[-1])
        return arr

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        hidden = c["hidden_size"]
        head_size = hidden // c["num_attention_heads"]
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 1048576,
            f"{a}.embedding_length": int(hidden),
            f"{a}.block_count": int(c["num_hidden_layers"]),
            f"{a}.wkv.head_size": int(head_size),
            f"{a}.time_mix_extra_dim": int(c.get(
                "lora_rank_tokenshift", 64 if hidden >= 4096 else 32)),
            f"{a}.time_decay_extra_dim": int(c.get(
                "lora_rank_decay", 128 if hidden >= 4096 else 64)),
            f"{a}.feed_forward_length": int(c["intermediate_size"]),
            f"{a}.attention.layer_norm_rms_epsilon": float(c["rms_norm_eps"]),
            f"{a}.token_shift_count": 1,
            f"{a}.attention.head_count_kv": int(c["num_key_value_heads"]),
            f"{a}.attention.head_count": 0,
            f"{a}.vocab_size": int(c["vocab_size"]),
        }


class Rwkv7Arch(Rwkv6Arch):
    """RWKV-7 Goose (reference Rwkv7Model :5445-5560): w/a/v/g low-rank
    branches with computed default ranks, fused x_* lerps, r_k flattened,
    dummy v0/v1/v2 duplicated from the a-branch on layer 0."""

    gguf_arch = "rwkv7"
    _lora_transpose = ("time_mix_w1.weight", "time_mix_w2.weight",
                       "time_mix_a1.weight", "time_mix_a2.weight",
                       "time_mix_v1.weight", "time_mix_v2.weight",
                       "time_mix_g1.weight", "time_mix_g2.weight")

    _attn_map = {
        "w0": "time_mix_w0.weight", "w1": "time_mix_w1.weight",
        "w2": "time_mix_w2.weight",
        "a0": "time_mix_a0.weight", "a1": "time_mix_a1.weight",
        "a2": "time_mix_a2.weight",
        "v0": "time_mix_v0.weight", "v1": "time_mix_v1.weight",
        "v2": "time_mix_v2.weight",
        "g1": "time_mix_g1.weight", "g2": "time_mix_g2.weight",
        "k_k": "time_mix_k_k.weight", "k_a": "time_mix_k_a.weight",
        "r_k": "time_mix_r_k.weight",
        "receptance.weight": "time_mix_receptance.weight",
        "key.weight": "time_mix_key.weight",
        "value.weight": "time_mix_value.weight",
        "output.weight": "time_mix_output.weight",
        "r_proj.weight": "time_mix_receptance.weight",
        "k_proj.weight": "time_mix_key.weight",
        "v_proj.weight": "time_mix_value.weight",
        "o_proj.weight": "time_mix_output.weight",
        "ln_x.weight": "time_mix_ln.weight",
        "ln_x.bias": "time_mix_ln.bias",
        "g_norm.weight": "time_mix_ln.weight",
        "g_norm.bias": "time_mix_ln.bias",
    }
    _ffn_map = {
        "x_k": "channel_mix_lerp_k.weight",
        "key.weight": "channel_mix_key.weight",
        "value.weight": "channel_mix_value.weight",
    }
    _norm_map = dict(Rwkv6Arch._norm_map)
    _norm_map.update({
        "feed_forward_norm.weight": "attn_norm_2.weight",
        "feed_forward_norm.bias": "attn_norm_2.bias",
    })

    @property
    def _lerp_keys(self):
        return (("r", "w", "k", "v", "a", "g")
                if self.hf.get("wkv_has_gate", True)
                else ("r", "w", "k", "v", "a"))

    def tensor_name(self, hf_name):
        name = self._normalize(hf_name)
        if name == "model.layers.0.pre_norm.weight":
            return "token_embd_norm.weight"
        if name == "model.layers.0.pre_norm.bias":
            return "token_embd_norm.bias"
        if name.startswith("model.layers.") and ".pre_norm." in name:
            return None
        return super().tensor_name(hf_name)

    @staticmethod
    def _calc_lora_rank(hidden, exponent, multiplier):
        return max(1, round(hidden ** exponent * multiplier / 32)) * 32

    def special_tensors(self, hf_name, arr, get_artifact):
        name = self._normalize(hf_name)
        if ".attention.x_" not in name:
            # dummy-v duplication: layer 0 has no real v0/v1/v2 — mirror the
            # a-branch as the converter does (reference :5555-5558)
            g = self.tensor_name(hf_name)
            if g and g.startswith("blk.0.time_mix_a"):
                out = [("float", g, self.transform_float(
                    g, np.squeeze(np.asarray(arr, dtype=np.float32))))]
                gv = g.replace("time_mix_a", "time_mix_v")
                out.append(("float", gv, self.transform_float(
                    gv, np.squeeze(np.asarray(arr, dtype=np.float32)))))
                return out
            return None
        i = name.split(".")[2]
        keys = self._lerp_keys
        if name.endswith(".x_x"):  # already concatenated
            fused = np.asarray(arr, dtype=np.float32).reshape(
                len(keys), 1, 1, -1)
            return [("float", f"blk.{i}.time_mix_lerp_fused.weight", fused)]
        key = name.rsplit("x_", 1)[1]
        if key not in keys:
            return None
        acc = self._lerp.setdefault(i, {})
        acc[key] = np.asarray(arr, dtype=np.float32).reshape(-1)
        if len(acc) < len(keys):
            return []
        fused = np.stack([acc[k] for k in keys]).reshape(len(keys), 1, 1, -1)
        del self._lerp[i]
        return [("float", f"blk.{i}.time_mix_lerp_fused.weight",
                 fused.astype(np.float32))]

    def transform_float(self, gguf_name, arr):
        arr = np.squeeze(arr)
        if gguf_name.endswith(self._lora_transpose) and arr.ndim == 2:
            arr = np.ascontiguousarray(arr.T)
        if gguf_name.endswith("time_mix_r_k.weight"):
            arr = arr.reshape(-1)
        return arr

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        hidden = c["hidden_size"]
        head_size = c.get("head_size", c.get("head_dim"))
        eps = c.get("layer_norm_epsilon", c.get("norm_eps", 1e-5))
        ff = c.get("intermediate_size") or hidden * 4
        ranks = {
            "decay": c.get("lora_rank_decay", c.get("decay_low_rank_dim"))
            or self._calc_lora_rank(hidden, 0.5, 1.8),
            "iclr": c.get("lora_rank_iclr", c.get("a_low_rank_dim"))
            or self._calc_lora_rank(hidden, 0.5, 1.8),
            "value_residual_mix": c.get("lora_rank_value_residual_mix",
                                        c.get("v_low_rank_dim"))
            or self._calc_lora_rank(hidden, 0.5, 1.3),
            "gate": c.get("lora_rank_gate", c.get("gate_low_rank_dim"))
            or self._calc_lora_rank(hidden, 0.8, 0.6),
        }
        md = {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 1048576,
            f"{a}.embedding_length": int(hidden),
            f"{a}.block_count": int(c["num_hidden_layers"]),
            f"{a}.attention.layer_norm_epsilon": float(eps),
            f"{a}.wkv.head_size": int(head_size),
            f"{a}.feed_forward_length": int(ff),
            f"{a}.attention.head_count": 0,
            f"{a}.vocab_size": int(c["vocab_size"]),
        }
        for k, v in ranks.items():
            md[f"{a}.attention.{k}_lora_rank"] = int(v)
        return md


class ARwkv7Arch(Rwkv7Arch):
    """ARWKV-7 qwen hybrid (reference ARwkv7Model :5563-5605): rwkv7 time
    mix inside a qwen2 block — RMS norms, qwen MLP, fixed lora ranks,
    token_shift_count 1."""

    gguf_arch = "arwkv7"

    _ffn_map = {
        "gate_proj.weight": "ffn_gate.weight",
        "up_proj.weight": "ffn_up.weight",
        "down_proj.weight": "ffn_down.weight",
    }
    _norm_map = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
    }

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        gate = bool(c.get("wkv_has_gate", True))
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": 1048576,
            f"{a}.embedding_length": int(c["hidden_size"]),
            f"{a}.block_count": int(c["num_hidden_layers"]),
            f"{a}.attention.layer_norm_rms_epsilon": float(c["rms_norm_eps"]),
            f"{a}.wkv.head_size": int(c["head_size"]),
            f"{a}.attention.decay_lora_rank": 64,
            f"{a}.attention.iclr_lora_rank": 64,
            f"{a}.attention.value_residual_mix_lora_rank": 32,
            f"{a}.attention.gate_lora_rank": 128 if gate else 0,
            f"{a}.feed_forward_length": int(c["intermediate_size"]),
            f"{a}.token_shift_count": 1,
            f"{a}.attention.head_count": 0,
            f"{a}.vocab_size": int(c["vocab_size"]),
        }


class PlamoArch(ArchSpec):
    """PLaMo-13B (reference PlamoModel :4020-4066): parallel attn+MLP with a
    single per-layer norm under model.layers.layers, grouped-query shuffles
    on attn_q/attn_output (8 interleaved groups), context/kv quirks stamped
    exactly as the converter does (ctx 4096, kv = heads/8)."""

    gguf_arch = "plamo"
    permute_qk = False

    _layer = {
        "norm.weight": "attn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }

    def tensor_name(self, hf_name):
        fixed = {"model.embed_tokens.weight": "token_embd.weight",
                 "model.norm.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("model.layers.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[4:])
            if rest in self._layer:
                return f"blk.{parts[3]}.{self._layer[rest]}"
        return None

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.context_length"] = 4096  # not in config.json (reference :4030)
        md[f"{a}.attention.head_count_kv"] = c["num_attention_heads"] // 8
        return md

    def transform_float(self, gguf_name, arr):
        c = self.hf
        h = c["hidden_size"]
        n_head = c["num_attention_heads"]
        hd = h // n_head
        g = n_head // 8
        if gguf_name.endswith("attn_q.weight"):
            return (arr.reshape(8, g, hd, h).transpose(1, 0, 2, 3)
                    .reshape(h, h))
        if gguf_name.endswith("attn_output.weight"):
            return (arr.reshape(h, 8, g, hd).transpose(0, 2, 1, 3)
                    .reshape(h, h))
        return arr


class Plamo2Arch(ArchSpec):
    """PLaMo-2 hybrid mamba/attention (reference Plamo2Model :4068-4235):
    model.layers.layers naming, per-layer kv heads zeroed on mamba layers
    (mamba_step pattern), dt_bias/dt_norm/B_norm/C_norm renames, conv
    squeeze, A_log -> -exp(A_log), and the +1 / +1/5 / +1/5^1.5 norm
    shifts the converter folds in."""

    gguf_arch = "plamo2"
    permute_qk = False

    _layer = {
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.conv1d.weight": "ssm_conv1d.weight",
        "mixer.bcdt_proj.weight": "ssm_x.weight",
        "mixer.dt_proj.weight": "ssm_dt.weight",
        "mixer.dt_bias": "ssm_dt.bias",
        "mixer.dt_norm_weight": "ssm_dt_norm.weight",
        "mixer.B_norm_weight": "ssm_b_norm.weight",
        "mixer.C_norm_weight": "ssm_c_norm.weight",
        "mixer.A_log": "ssm_a",
        "mixer.D": "ssm_d",
        "mixer.out_proj.weight": "ssm_out.weight",
        "mixer.qkv_proj.weight": "attn_qkv.weight",
        "mixer.q_weight": "attn_q_norm.weight",
        "mixer.k_weight": "attn_k_norm.weight",
        "mixer.o_proj.weight": "attn_output.weight",
        "pre_mixer_norm.weight": "attn_norm.weight",
        "post_mixer_norm.weight": "post_attention_norm.weight",
        "pre_mlp_norm.weight": "ffn_norm.weight",
        "post_mlp_norm.weight": "post_ffw_norm.weight",
        "mlp.gate_up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }

    def tensor_name(self, hf_name):
        fixed = {"model.embed_tokens.weight": "token_embd.weight",
                 "model.norm.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("model.layers.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[4:])
            if rest in self._layer:
                return f"blk.{parts[3]}.{self._layer[rest]}"
        return None

    def transform_float(self, gguf_name, arr):
        if gguf_name.endswith(".ssm_a"):
            return -np.exp(arr)
        if gguf_name.endswith("ssm_conv1d.weight"):
            return np.squeeze(arr)
        # converter norm shifts (reference :4216-4229)
        if gguf_name.endswith(("attn_norm.weight", "ffn_norm.weight",
                               "output_norm.weight")):
            return arr + 1.0
        if gguf_name.endswith("post_attention_norm.weight"):
            return arr + 1.0 / 5
        if gguf_name.endswith("post_ffw_norm.weight"):
            return arr + 1.0 / (5 ** 1.5)
        return arr

    def _mamba_layers(self):
        c = self.hf
        n = c["num_hidden_layers"]
        step = c.get("mamba_step", 2)
        if not c.get("mamba_enabled", True):
            return [False] * n
        if n <= step // 2:
            return [i != n - 1 for i in range(n)]
        return [(i % step) != (step // 2) for i in range(n)]

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        n_kv = c.get("num_key_value_heads", 4)
        md = {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c.get("max_position_embeddings", 2048)),
            f"{a}.embedding_length": int(c.get("hidden_size", 4096)),
            f"{a}.block_count": int(c["num_hidden_layers"]),
            f"{a}.attention.head_count": int(c.get("num_attention_heads", 32)),
            f"{a}.attention.head_count_kv": [
                0 if m else n_kv for m in self._mamba_layers()],
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("rms_norm_eps", 1e-6)),
            f"{a}.rope.freq_base": float(c.get("rope_theta", 10000)),
            f"{a}.ssm.state_size": int(c.get("mamba_d_state", 64)),
            f"{a}.ssm.conv_kernel": int(c.get("mamba_d_conv", 4)),
            f"{a}.ssm.time_step_rank": int(c.get("mamba_num_heads", 64)),
            f"{a}.ssm.inner_size": int(
                c.get("mamba_num_heads", 64) * c.get("hidden_size_per_head", 128)),
            f"{a}.ssm.group_count": 0,
            f"{a}.feed_forward_length": int(c.get("intermediate_size", 13312)),
            f"{a}.vocab_size": int(c["vocab_size"]),
        }
        return md


class GrokArch(MoEArchSpec):
    """Grok-1 (reference GrokModel :2727-2777): decoder_layer/rms_norm_N
    naming with four per-layer norms, linear/linear_v/linear_1 expert
    stacks (gate/up/down)."""

    gguf_arch = "grok"
    permute_qk = False
    n_expert_key = "num_local_experts"
    expert_prefix = "moe."
    expert_proj = {"linear": "ffn_gate_exps", "linear_v": "ffn_up_exps",
                   "linear_1": "ffn_down_exps"}

    _layer = {
        "rms_norm.weight": "attn_norm.weight",
        "rms_norm_1.weight": "attn_output_norm.weight",
        "rms_norm_2.weight": "ffn_norm.weight",
        "rms_norm_3.weight": "layer_output_norm.weight",
        "multi_head_attention.query.weight": "attn_q.weight",
        "multi_head_attention.key.weight": "attn_k.weight",
        "multi_head_attention.value.weight": "attn_v.weight",
        "multi_head_attention.linear.weight": "attn_output.weight",
        "router.weight": "ffn_gate_inp.weight",
    }

    def tensor_name(self, hf_name):
        fixed = {"transformer.in_out_embed.weight": "token_embd.weight",
                 "transformer.rms_norm.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("transformer.decoder_layer."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{parts[2]}.{self._layer[rest]}"
        return None

    def expert_tensor(self, hf_name):
        if not hf_name.startswith("transformer.decoder_layer."):
            return None
        parts = hf_name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        if not (rest.startswith("moe.") and rest.endswith(".weight")):
            return None
        sub = rest[len("moe."):-len(".weight")].split(".")
        if len(sub) != 2:
            return None
        e, proj = sub
        if proj not in self.expert_proj:
            return None
        canon = {"ffn_gate_exps": "gate_proj", "ffn_up_exps": "up_proj",
                 "ffn_down_exps": "down_proj"}[self.expert_proj[proj]]
        return (f"blk.{i}.{self.expert_proj[proj]}.weight", int(e),
                f"model.layers.{i}.mlp.experts.{{e}}.{canon}")


class DreamArch(ArchSpec):
    """Dream 7B diffusion LM (reference DreamModel :3031-3095): qwen2-style
    weights with non-causal attention and a mask token id."""

    gguf_arch = "dream"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.causal"] = False
        if c.get("mask_token_id") is not None:
            md["tokenizer.ggml.mask_token_id"] = int(c["mask_token_id"])
        return md


class LladaArch(ArchSpec):
    """LLaDA diffusion LM (reference LLaDAModel :3101-3200): OLMo-style
    config keys (d_model/n_heads/mlp_hidden_size), transformer.blocks
    naming, llama permute, non-causal attention, unshifted logits."""

    gguf_arch = "llada"
    permute_qk = True

    def __init__(self, hf_config):
        c = dict(hf_config)
        c.setdefault("hidden_size", c.get("d_model"))
        c.setdefault("num_attention_heads", c.get("n_heads"))
        if c.get("n_kv_heads") is not None:
            c.setdefault("num_key_value_heads", c["n_kv_heads"])
        c.setdefault("intermediate_size", c.get("mlp_hidden_size"))
        c.setdefault("num_hidden_layers", c.get("n_layers"))
        c.setdefault("max_position_embeddings",
                     c.get("max_sequence_length", 4096))
        super().__init__(c)

    _layer = {
        "q_proj.weight": "attn_q.weight",
        "k_proj.weight": "attn_k.weight",
        "v_proj.weight": "attn_v.weight",
        "attn_out.weight": "attn_output.weight",
        "attn_norm.weight": "attn_norm.weight",
        "ff_proj.weight": "ffn_gate.weight",
        "up_proj.weight": "ffn_up.weight",
        "ff_out.weight": "ffn_down.weight",
        "ff_norm.weight": "ffn_norm.weight",
    }

    def tensor_name(self, hf_name):
        fixed = {"model.transformer.wte.weight": "token_embd.weight",
                 "model.transformer.ln_f.weight": "output_norm.weight",
                 "model.transformer.ff_out.weight": "output.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("model.transformer.blocks."):
            parts = hf_name.split(".")
            rest = ".".join(parts[4:])
            if rest in self._layer:
                return f"blk.{parts[3]}.{self._layer[rest]}"
        return None

    def row_permutation(self, hf_name, n_rows):
        c = self.hf
        n_head = c["num_attention_heads"]
        n_kv = c.get("num_key_value_heads", n_head)
        if ".q_proj." in hf_name:
            return gqa_permute_rows(n_rows, n_head)
        if ".k_proj." in hf_name:
            return gqa_permute_rows(n_rows, n_kv)
        return None

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        md[f"{a}.attention.causal"] = False
        md[f"{a}.diffusion.shift_logits"] = False
        return md


class NemotronHArch(GraniteHybridArch):
    """Nemotron-H hybrid mamba2/attention/MLP (reference NemotronHModel
    :7686-7732): backbone/mixer naming, layer roles from the
    hybrid_override_pattern string (M=mamba, *=attention, -=MLP),
    per-layer FF array zeroed on non-MLP layers, relu2 MLP without gate."""

    gguf_arch = "nemotron_h"
    permute_qk = True

    _mixer_ssm = {
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.conv1d.weight": "ssm_conv1d.weight",
        "mixer.conv1d.bias": "ssm_conv1d.bias",
        "mixer.dt_bias": "ssm_dt.bias",
        "mixer.A_log": "ssm_a",
        "mixer.D": "ssm_d",
        "mixer.norm.weight": "ssm_norm.weight",
        "mixer.out_proj.weight": "ssm_out.weight",
        "mixer.q_proj.weight": "attn_q.weight",
        "mixer.k_proj.weight": "attn_k.weight",
        "mixer.v_proj.weight": "attn_v.weight",
        "mixer.o_proj.weight": "attn_output.weight",
        "mixer.up_proj.weight": "ffn_up.weight",
        "mixer.down_proj.weight": "ffn_down.weight",
        "norm.weight": "attn_norm.weight",
    }

    @property
    def _d_inner(self):
        c = self.hf
        if c.get("mamba_num_heads") and c.get("mamba_head_dim"):
            return int(c["mamba_num_heads"] * c["mamba_head_dim"])
        return int(c.get("mamba_expand", 2) * c["hidden_size"])

    def _pattern(self) -> str:
        return self.hf["hybrid_override_pattern"]

    def _attn_layers(self):
        return [i for i, v in enumerate(self._pattern()) if v == "*"]

    def tensor_name(self, hf_name):
        fixed = {"backbone.embeddings.weight": "token_embd.weight",
                 "backbone.norm_f.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("backbone.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._mixer_ssm:
                return f"blk.{parts[2]}.{self._mixer_ssm[rest]}"
        return None

    def row_permutation(self, hf_name, n_rows):
        c = self.hf
        if ".mixer.q_proj." in hf_name:
            return gqa_permute_rows(n_rows, c["num_attention_heads"])
        if ".mixer.k_proj." in hf_name:
            return gqa_permute_rows(
                n_rows, c.get("num_key_value_heads", c["num_attention_heads"]))
        return None

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim", c.get("attention_head_dim")) or (
            c["hidden_size"] // c["num_attention_heads"])
        md[f"{a}.attention.key_length"] = int(head_dim)
        md[f"{a}.attention.value_length"] = int(head_dim)
        n_ff = int(c["intermediate_size"])
        md[f"{a}.feed_forward_length"] = [
            n_ff if v == "-" else 0 for v in self._pattern()
        ]
        md[f"{a}.ssm.time_step_rank"] = int(c.get("mamba_num_heads", 128))
        # nemotron-h config key aliases for the ssm geometry
        md[f"{a}.ssm.conv_kernel"] = int(
            c.get("conv_kernel", c.get("mamba_d_conv", 4)))
        md[f"{a}.ssm.state_size"] = int(
            c.get("ssm_state_size", c.get("mamba_d_state", 128)))
        md.pop(f"{a}.rope.scaling.finetuned", None)
        md["tokenizer.ggml.add_bos_token"] = True
        return md


class T5Arch(ArchSpec):
    """T5 / mT5 / UMT5 encoder-decoder (reference T5Model :6612-6746,
    T5EncoderModel :6750): enc./dec. tensor prefixes, relative attention
    buckets, shared embeddings deduped to token_embd, both LN-eps keys
    written from layer_norm_epsilon as upstream does. A checkpoint whose
    architectures say T5EncoderModel packs as arch 't5encoder'."""

    permute_qk = False

    def __init__(self, hf_config):
        super().__init__(hf_config)
        archs = hf_config.get("architectures") or []
        self.gguf_arch = ("t5encoder" if archs == ["T5EncoderModel"]
                          else "t5")
        self._shared_seen = False

    _attn = {"q": "attn_q", "k": "attn_k", "v": "attn_v", "o": "attn_output",
             "relative_attention_bias": "attn_rel_b"}
    _cross = {"q": "cross_attn_q", "k": "cross_attn_k", "v": "cross_attn_v",
              "o": "cross_attn_o", "relative_attention_bias": "cross_attn_rel_b"}
    _ffn = {"wi": "ffn_up", "wi_0": "ffn_gate", "wi_1": "ffn_up",
            "wo": "ffn_down"}

    def tensor_name(self, hf_name):
        name = hf_name
        if name in ("shared.weight", "encoder.embed_tokens.weight",
                    "decoder.embed_tokens.weight"):
            if self._shared_seen:
                return None  # duplicated shared embeddings (reference :6738)
            self._shared_seen = True
            return "token_embd.weight"
        if name == "lm_head.weight":
            return "output.weight"
        if name == "encoder.final_layer_norm.weight":
            return "enc.output_norm.weight"
        if name == "decoder.final_layer_norm.weight":
            return "dec.output_norm.weight"
        for side, pre in (("encoder", "enc"), ("decoder", "dec")):
            if not name.startswith(f"{side}.block."):
                continue
            parts = name.split(".")
            i, li = parts[2], int(parts[4])
            rest = parts[5:]
            mod = rest[0] if rest else ""
            if mod == "layer_norm":
                if side == "encoder":
                    norm = "attn_norm" if li == 0 else "ffn_norm"
                else:
                    norm = ("attn_norm", "cross_attn_norm", "ffn_norm")[li]
                return f"{pre}.blk.{i}.{norm}.weight"
            if mod == "SelfAttention" and len(rest) == 3:
                sub = self._attn.get(rest[1])
                if sub:
                    return f"{pre}.blk.{i}.{sub}.weight"
            if mod == "EncDecAttention" and len(rest) == 3:
                sub = self._cross.get(rest[1])
                if sub:
                    return f"{pre}.blk.{i}.{sub}.weight"
            if mod == "DenseReluDense" and len(rest) == 3:
                sub = self._ffn.get(rest[1])
                if sub:
                    return f"{pre}.blk.{i}.{sub}.weight"
        return None

    def metadata(self):
        c = self.hf
        a = self.gguf_arch
        eps = float(c.get("layer_norm_epsilon", 1e-6))
        md = {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c.get("n_positions", 512)),
            f"{a}.embedding_length": int(c["d_model"]),
            f"{a}.feed_forward_length": int(c["d_ff"]),
            f"{a}.block_count": int(c["num_layers"]),
            f"{a}.attention.head_count": int(c["num_heads"]),
            f"{a}.attention.key_length": int(c["d_kv"]),
            f"{a}.attention.value_length": int(c["d_kv"]),
            f"{a}.attention.layer_norm_epsilon": eps,
            f"{a}.attention.layer_norm_rms_epsilon": eps,
            f"{a}.attention.relative_buckets_count": int(
                c.get("relative_attention_num_buckets", 32)),
            f"{a}.vocab_size": int(c["vocab_size"]),
        }
        if a == "t5" and c.get("decoder_start_token_id") is not None:
            md[f"{a}.decoder_start_token_id"] = int(c["decoder_start_token_id"])
        return md


class BertArch(ArchSpec):
    """BERT-family embedding/classifier encoders (reference BertModel
    :4518-4594): non-causal attention flag, token-type embeddings, pooling
    type from the sentence-transformers config, classifier head mapping;
    vocab handled by the WordPiece branch of tokenizer_metadata."""

    gguf_arch = "bert"
    permute_qk = False
    model_dir: Optional[Path] = None  # set by pack_model for pooling lookup

    _fixed = {
        "embeddings.word_embeddings.weight": "token_embd.weight",
        "embeddings.token_type_embeddings.weight": "token_types.weight",
        "embeddings.position_embeddings.weight": "position_embd.weight",
        "embeddings.LayerNorm.weight": "token_embd_norm.weight",
        "embeddings.LayerNorm.bias": "token_embd_norm.bias",
        "classifier.dense.weight": "cls.weight",
        "classifier.dense.bias": "cls.bias",
        "classifier.out_proj.weight": "cls.output.weight",
        "classifier.out_proj.bias": "cls.output.bias",
    }
    _layer = {
        "attention.self.query": "attn_q",
        "attention.self.key": "attn_k",
        "attention.self.value": "attn_v",
        "attention.output.dense": "attn_output",
        "attention.output.LayerNorm": "attn_output_norm",
        "intermediate.dense": "ffn_up",
        "output.dense": "ffn_down",
        "output.LayerNorm": "layer_output_norm",
    }
    _strip_prefixes = ("bert.", "roberta.", "camembert.")
    _layer_prefix = "encoder.layer."

    def _labels(self) -> Optional[List[str]]:
        labels = self.hf.get("id2label")
        if not labels:
            return None
        items = sorted(labels.items(), key=lambda kv: int(kv[0]))
        vals = [v for _, v in items]
        if vals == ["LABEL_0", "LABEL_1"]:
            return None  # AutoConfig dummy labels
        return vals

    def tensor_name(self, hf_name):
        name = hf_name
        for p in self._strip_prefixes:
            if name.startswith(p):
                name = name[len(p):]
        if name.endswith(".gamma"):
            name = name[:-6] + ".weight"
        elif name.endswith(".beta"):
            name = name[:-5] + ".bias"
        if (name == "embeddings.position_ids" or name.startswith("pooler.")
                or name.startswith("cls.predictions")
                or name.startswith("cls.seq_relationship")):
            return None
        if self._labels() and name in ("classifier.weight", "classifier.bias"):
            name = name.replace("classifier.", "classifier.out_proj.")
        if name in self._fixed:
            return self._fixed[name]
        if name.startswith(self._layer_prefix):
            parts = name[len(self._layer_prefix):].split(".")
            i = parts[0]
            head, kind = ".".join(parts[1:-1]), parts[-1]
            if head in self._layer:
                return f"blk.{i}.{self._layer[head]}.{kind}"
        return None

    def _pooling_type(self) -> Optional[int]:
        """sentence-transformers pooling config -> llama.cpp PoolingType."""
        if self.model_dir is None:
            return None
        pool_dir = None
        modules = Path(self.model_dir) / "modules.json"
        if modules.exists():
            try:
                for mod in json.load(open(modules)):
                    if mod.get("type", "").endswith("Pooling"):
                        pool_dir = mod["path"]
                        break
            except Exception:
                return None
        if pool_dir is None:
            pool_dir = "1_Pooling"
        cfg_path = Path(self.model_dir) / pool_dir / "config.json"
        if not cfg_path.exists():
            return None
        pc = json.load(open(cfg_path))
        if pc.get("pooling_mode_cls_token"):
            return 2  # CLS
        if pc.get("pooling_mode_mean_tokens"):
            return 1  # MEAN
        if pc.get("pooling_mode_lasttoken"):
            return 3  # LAST
        return 0

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        md[f"{a}.attention.causal"] = False
        md[f"{a}.attention.layer_norm_epsilon"] = float(
            self.hf.get("layer_norm_eps", 1e-12))
        md["tokenizer.ggml.token_type_count"] = int(
            self.hf.get("type_vocab_size") or 1)
        labels = self._labels()
        if labels:
            md[f"{a}.classifier.output_labels"] = labels
        return md

    def final_metadata(self):
        pt = self._pooling_type()
        if pt is None:
            return {}
        return {f"{self.gguf_arch}.pooling_type": pt}


class RobertaArch(BertArch):
    """RoBERTa / XLM-R (reference RobertaModel :4758, XLMRobertaModel
    :4911): position embeddings start at pad_token_id+1, so the matrix is
    chopped and the context shortened by the same offset. With
    lora_adaptations in the config (jina-embeddings-v3) the arch becomes
    jina-bert-v3 and each LoRA task is written to its own sibling adapter
    GGUF (reference :4996-5006; general.type=adapter + adapter.lora.*
    keys; the stacked lora_A/lora_B tensors are split per task,
    token_embd's lora_b transposed and token_types' a/b swapped —
    reference quirks :4973-4977)."""

    def __init__(self, hf_config):
        super().__init__(hf_config)
        self.lora_names = list(hf_config.get("lora_adaptations") or [])
        if self.lora_names:
            self.gguf_arch = "jina-bert-v3"

    @property
    def _offset(self) -> int:
        pad = self.hf.get("pad_token_id")
        return 1 + pad if pad is not None else 0

    def metadata(self):
        md = super().metadata()
        if self._offset:
            md[f"{self.gguf_arch}.context_length"] = int(
                self.hf["max_position_embeddings"]) - self._offset
        if self.hf.get("rotary_emb_base"):  # jina-v3 is rope-based
            md[f"{self.gguf_arch}.rope.freq_base"] = float(
                self.hf["rotary_emb_base"])
        return md

    def tensor_name(self, hf_name):
        name = hf_name
        if ".parametrizations." in name:  # jina-v3 LoRA parametrization
            if name.endswith((".0.lora_A", ".0.lora_B")):
                return None  # routed to the adapter sidecars
            name = name.replace(".parametrizations.", ".")
            if name.endswith(".original"):
                name = name[:-9]
        return super().tensor_name(name)

    def sidecars(self):
        """{key: (filename prefix, metadata)} for per-task LoRA GGUFs."""
        alpha = float(self.hf.get("lora_alpha") or 1.0)
        prefixes = self.hf.get("task_instructions") or {}
        out = {}
        for name in self.lora_names:
            md = {
                "general.architecture": self.gguf_arch,
                "general.type": "adapter",
                "adapter.type": "lora",
                "adapter.lora.alpha": alpha,
                "adapter.lora.task_name": name,
            }
            if name in prefixes:
                md["adapter.lora.prompt_prefix"] = prefixes[name]
            out[name] = (f"lora-{name}-", md)
        return out

    def sidecar_tensors(self, hf_name, arr):
        """Split the stacked (n_tasks, ...) lora_A/lora_B tensors."""
        name = hf_name
        for p in self._strip_prefixes:
            if name.startswith(p):
                name = name[len(p):]
        if ".parametrizations." in name:
            name = name.replace(".parametrizations.", ".")
        if not name.endswith((".0.lora_A", ".0.lora_B")):
            return []
        if name.startswith("pooler.dense"):
            return []
        base = super().tensor_name(name[:-9])
        if base is None:
            return []
        gname = base + name[-7:].lower()  # .lora_a / .lora_b
        out = []
        for i, task in enumerate(self.lora_names):
            data = np.asarray(arr[i], np.float32)
            n = gname
            if n == "token_embd.weight.lora_b":
                data = data.T
            elif n.startswith("token_types.weight."):
                n = n[:-1] + ("a" if n[-1] == "b" else "b")
            out.append((task, n, data))
        return out

    def special_tensors(self, hf_name, arr, get_artifact):
        name = hf_name
        for p in self._strip_prefixes:
            if name.startswith(p):
                name = name[len(p):]
        if name == "embeddings.position_embeddings.weight" and self._offset:
            return [("float", "position_embd.weight",
                     arr[self._offset:].astype(np.float32))]
        return None


class DistilBertArch(BertArch):
    """DistilBERT (reference DistilBertModel :4738): flat layer naming
    (q_lin/out_lin/ffn.lin1...), hardcoded 1e-12 eps, MLM head dropped."""

    _strip_prefixes = ("distilbert.",)
    _layer_prefix = "transformer.layer."
    _layer = {
        "attention.q_lin": "attn_q",
        "attention.k_lin": "attn_k",
        "attention.v_lin": "attn_v",
        "attention.out_lin": "attn_output",
        "sa_layer_norm": "attn_output_norm",
        "ffn.lin1": "ffn_up",
        "ffn.lin2": "ffn_down",
        "output_layer_norm": "layer_output_norm",
    }

    def __init__(self, hf_config):
        c = dict(hf_config)  # alias distilbert's dim/n_heads/... keys
        if "dim" in c:
            c.setdefault("hidden_size", c["dim"])
            c.setdefault("num_attention_heads", c["n_heads"])
            c.setdefault("num_hidden_layers", c["n_layers"])
            c.setdefault("intermediate_size", c["hidden_dim"])
        super().__init__(c)

    def tensor_name(self, hf_name):
        name = hf_name
        if name.startswith("distilbert."):
            name = name[len("distilbert."):]
        if name.startswith("vocab_"):  # MLM head
            return None
        return super().tensor_name(name)

    def metadata(self):
        md = super().metadata()
        md[f"{self.gguf_arch}.attention.layer_norm_epsilon"] = 1e-12
        return md


class NomicBertArch(BertArch):
    """nomic-embed-text v1/v1.5/v2-moe (reference NomicBertModel
    :4801-4881): fused Wqkv, swiglu fc11/fc12 (gelu + expert stacks on the
    MoE variant), rope base, and the trained-context trimming quirk."""

    permute_qk = False

    def __init__(self, hf_config):
        c = dict(hf_config)
        c.setdefault("hidden_size", c.get("n_embd"))
        c.setdefault("num_attention_heads", c.get("n_head"))
        c.setdefault("num_hidden_layers", c.get("n_layer"))
        c.setdefault("intermediate_size", c.get("n_inner"))
        super().__init__(c)
        self.is_moe = bool(c.get("moe_every_n_layers"))
        self.gguf_arch = "nomic-bert-moe" if self.is_moe else "nomic-bert"

    _layer = {
        "attn.Wqkv": "attn_qkv",
        "attn.out_proj": "attn_output",
        "norm1": "attn_output_norm",
        "norm2": "layer_output_norm",
        "mlp.fc11": "ffn_up",
        "mlp.fc12": "ffn_gate",
        "mlp.fc1": "ffn_up",
        "mlp.fc2": "ffn_down",
        "mlp.router.layer": "ffn_gate_inp",
    }
    _layer_prefix = "encoder.layers."
    _strip_prefixes = ()

    def tensor_name(self, hf_name):
        name = hf_name
        fixed = {
            "embeddings.word_embeddings.weight": "token_embd.weight",
            "embeddings.token_type_embeddings.weight": "token_types.weight",
            "emb_ln.weight": "token_embd_norm.weight",
            "emb_ln.bias": "token_embd_norm.bias",
        }
        if name in fixed:
            return fixed[name]
        if "mlp.experts" in name:
            return None  # handled in special_tensors
        if name.startswith(self._layer_prefix):
            parts = name[len(self._layer_prefix):].split(".")
            i = parts[0]
            head, kind = ".".join(parts[1:-1]), parts[-1]
            if head in self._layer:
                return f"blk.{i}.{self._layer[head]}.{kind}"
        return None

    def special_tensors(self, hf_name, arr, get_artifact):
        if "mlp.experts" not in hf_name:
            return None
        if hf_name.endswith("experts.bias"):
            return []  # unused expert bias (reference :4850)
        c = self.hf
        i = hf_name.split(".")[2]
        ne, n_in, h = c["num_experts"], c["n_inner"], c["hidden_size"]
        if hf_name.endswith("experts.mlp.w1"):
            return [("float", f"blk.{i}.ffn_up_exps.weight",
                     arr.reshape(ne, n_in, h).astype(np.float16))]
        if hf_name.endswith("experts.mlp.w2"):
            w = arr.reshape(ne, n_in, h).transpose(0, 2, 1)
            return [("float", f"blk.{i}.ffn_down_exps.weight",
                     np.ascontiguousarray(w).astype(np.float16))]
        return None

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.layer_norm_epsilon"] = float(
            c.get("layer_norm_epsilon", 1e-12))
        md[f"{a}.rope.freq_base"] = float(c.get("rotary_emb_base", 10000.0))
        npos = int(c.get("n_positions", 2048))
        mtp = int(c.get("max_trained_positions", 2048))
        if npos == 8192 and mtp == 2048:
            npos = 2048  # nomic v1/v1.5 trained at 2048 (reference :4820)
        elif npos == 2048 and mtp == 2048:
            npos = 512  # v2-moe trained at 512
        md[f"{a}.context_length"] = npos
        if self.is_moe:
            md[f"{a}.moe_every_n_layers"] = int(c["moe_every_n_layers"])
            md[f"{a}.expert_count"] = int(c["num_experts"])
            md[f"{a}.expert_used_count"] = int(c["moe_top_k"])
        return md


class NeoBertArch(BertArch):
    """NeoBERT (reference NeoBert pack_gptq_into_gguf.py:4882-4908):
    RMS-norm pre-norm encoder with fused qkv and fused SwiGLU w12;
    feed_forward_length is 2/3 of intermediate_size, rope base 10000,
    CLS pooling; the decoder.* LM head is dropped and "model." stripped."""

    gguf_arch = "neo-bert"

    _fixed = {
        "encoder.weight": "token_embd.weight",  # the embedding is "encoder"
        "layer_norm.weight": "enc.output_norm.weight",
        "dense.weight": "cls.weight",
        "dense.bias": "cls.bias",
        "classifier.weight": "cls.output.weight",
        "classifier.bias": "cls.output.bias",
    }
    _layer = {
        "attention_norm": "attn_norm",
        "qkv": "attn_qkv",
        "wo": "attn_output",
        "ffn_norm": "ffn_norm",
        "ffn.w12": "ffn_up",   # fused gate|up; llama.cpp splits via SWIGLU
        "ffn.w3": "ffn_down",
    }
    _layer_prefix = "transformer_encoder."
    _strip_prefixes = ("model.",)

    def tensor_name(self, hf_name):
        name = hf_name
        for p in self._strip_prefixes:
            if name.startswith(p):
                name = name[len(p):]
        if name.startswith("decoder."):
            return None  # LM head (reference :4901-4902)
        if name in self._fixed:
            return self._fixed[name]
        if name.startswith(self._layer_prefix):
            parts = name[len(self._layer_prefix):].split(".")
            i = parts[0]
            head, kind = ".".join(parts[1:-1]), parts[-1]
            if head in self._layer:
                return f"blk.{i}.{self._layer[head]}.{kind}"
        return None

    def metadata(self):
        md = super().metadata()
        a, c = self.gguf_arch, self.hf
        md[f"{a}.feed_forward_length"] = int(2 * c["intermediate_size"] / 3)
        md[f"{a}.rope.freq_base"] = 10000.0
        md[f"{a}.attention.layer_norm_rms_epsilon"] = float(
            c.get("norm_eps", 1e-6))
        del md[f"{a}.attention.layer_norm_epsilon"]
        if "max_length" in c:  # NeoBERTConfig's context key
            md[f"{a}.context_length"] = int(c["max_length"])
        md[f"{a}.pooling_type"] = 2  # CLS (reference :4899)
        return md

    def final_metadata(self):
        return {}  # pooling fixed at CLS; ignore sentence-transformers dirs


class JinaBertV2Arch(BertArch):
    """jina-embeddings-v2 (reference JinaBertV2Model
    pack_gptq_into_gguf.py:6036-6052): ALiBi BERT with a GLU MLP — the
    fused mlp.gated_layers tensor splits into ffn_gate|ffn_up at
    intermediate_size (the -code variant ships up_gated_layer with the
    halves swapped); mlp.wo/mlp.layernorm map to ffn_down /
    layer_output_norm. Vocab: BertTokenizer -> WordPiece, RobertaTokenizer
    -> BPE (tokenizer_metadata dispatches on tokenizer.json)."""

    gguf_arch = "jina-bert-v2"

    _layer = dict(BertArch._layer)
    _layer.update({
        "mlp.wo": "ffn_down",
        "mlp.layernorm": "layer_output_norm",
    })

    def tensor_name(self, hf_name):
        if "gated_layer" in hf_name:
            return None  # split in special_tensors
        return super().tensor_name(hf_name)

    def special_tensors(self, hf_name, arr, get_artifact):
        if "gated_layer" not in hf_name:
            return None
        i = hf_name.split(".")[2]
        ff = int(self.hf["intermediate_size"])
        first, second = arr[:ff], arr[ff:]
        if "up_gated_layer" in hf_name:  # jina-v2-code ships up|gate
            up, gate = first, second
        else:  # gated_layers ships gate|up
            gate, up = first, second
        return [("float", f"blk.{i}.ffn_gate.weight", gate.astype(np.float16)),
                ("float", f"blk.{i}.ffn_up.weight", up.astype(np.float16))]


class WavTokenizerArch(ArchSpec):
    """WavTokenizer audio-codec decoder (reference WavTokenizerDecModel
    pack_gptq_into_gguf.py:3580-3616): codebook embedding + Vocos-style
    backbone (Conv1d embed, ConvNeXt stack, PosNet resnet/attention
    blocks) + ISTFT head. Metadata keys replicate the reference's
    set_gguf_parameters; the HF-side tensor names are RECONSTRUCTED from
    the Vocos/WavTokenizer module structure (the reference delegates them
    to gguf-py's TensorNameMap, which is not vendored and not installable
    in this environment) — codebook bookkeeping tensors (cluster_size/
    embed_avg/inited) are skipped exactly like the reference :3586-3592."""

    gguf_arch = "wavtokenizer-dec"
    permute_qk = False

    _convnext = {"dwconv": "dw", "norm": "norm", "pwconv1": "pw1",
                 "pwconv2": "pw2", "gamma": "gamma"}
    _posnet = {"conv1": "conv1", "conv2": "conv2", "norm": "norm",
               "norm1": "norm1", "norm2": "norm2", "q": "attn_q",
               "k": "attn_k", "v": "attn_v", "proj_out": "attn_output",
               "gamma": "gamma"}

    def tensor_name(self, hf_name):
        name = hf_name
        if name.endswith((".cluster_size", ".embed_avg", ".inited")):
            return None  # codebook EMA bookkeeping (reference :3586-3592)
        if "_codebook.embed" in name or name.endswith("codebook.embed"):
            return "token_embd.weight"
        fixed = {
            "backbone.embed.weight": "conv1d.weight",
            "backbone.embed.bias": "conv1d.bias",
            "backbone.norm.weight": "token_embd_norm.weight",
            "backbone.norm.bias": "token_embd_norm.bias",
            "backbone.final_layer_norm.weight": "output_norm.weight",
            "backbone.final_layer_norm.bias": "output_norm.bias",
            "head.out.weight": "output.weight",
            "head.out.bias": "output.bias",
        }
        if name in fixed:
            return fixed[name]
        for pre, table, g in (("backbone.convnext.", self._convnext, "convnext"),
                              ("backbone.pos_net.", self._posnet, "posnet"),
                              ("backbone.posnet.", self._posnet, "posnet")):
            if name.startswith(pre):
                parts = name[len(pre):].split(".")
                i = parts[0]
                head, kind = ".".join(parts[1:-1]), parts[-1]
                if kind == "gamma":  # bare parameter; llama.cpp loads .weight
                    head, kind = "gamma", "weight"
                if head in table:
                    return f"{g}.{i}.{table[head]}.{kind}"
        if name.startswith("head.istft"):
            return None  # window buffer, no parameters
        return None

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        # the reference writes standard text keys via TextModel plus the
        # audio-specific ones (:3601-3616); the converted checkpoint's
        # config carries n_embd/posnet/convnext sections
        pos = c.get("posnet") or {}
        cnx = c.get("convnext") or {}
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c.get("max_position_embeddings", 8192)),
            f"{a}.embedding_length": int(c.get("n_embd", 1282)),
            f"{a}.block_count": int(c.get("n_layer", 12)),
            f"{a}.vocab_size": int(c["vocab_size"]),
            f"{a}.features_length": int(c.get("n_embd_features", 512)),
            f"{a}.feed_forward_length": int(c.get("n_ff", 2304)),
            f"{a}.attention.group_norm_epsilon": float(
                c.get("group_norm_epsilon", 1e-6)),
            f"{a}.attention.group_norm_groups": int(
                c.get("group_norm_groups", 32)),
            f"{a}.posnet.embedding_length": int(pos.get("n_embd", 768)),
            f"{a}.posnet.block_count": int(pos.get("n_layer", 6)),
            f"{a}.convnext.embedding_length": int(cnx.get("n_embd", 768)),
            f"{a}.convnext.block_count": int(cnx.get("n_layer", 12)),
            f"{a}.attention.causal": False,
            f"{a}.attention.layer_norm_epsilon": float(
                c.get("layer_norm_epsilon", 1e-6)),
            "tokenizer.ggml.model": "none",  # reference _set_vocab_none
        }


class ArcticArch(MoEArchSpec):
    """Snowflake Arctic (reference ArcticModel :6130-6279): llama GQA
    permute, mixtral-style w1/w3/w2 expert stacks, plus the parallel
    residual MLP (residual_layernorm/residual_mlp -> dense ffn slots;
    post_attention_layernorm becomes ffn_norm_exps)."""

    gguf_arch = "arctic"
    permute_qk = True
    n_expert_key = "num_local_experts"
    expert_prefix = "block_sparse_moe.experts."
    expert_proj = {"w1": "ffn_gate_exps", "w3": "ffn_up_exps", "w2": "ffn_down_exps"}
    moe_direct = {"block_sparse_moe.gate.weight": "ffn_gate_inp.weight"}

    _residual = {
        "residual_layernorm.weight": "ffn_norm.weight",
        "residual_mlp.w1.weight": "ffn_gate.weight",
        "residual_mlp.w2.weight": "ffn_down.weight",
        "residual_mlp.w3.weight": "ffn_up.weight",
        "post_attention_layernorm.weight": "ffn_norm_exps.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._residual:
                return f"blk.{parts[2]}.{self._residual[rest]}"
        return super().tensor_name(hf_name)


class SmallThinkerArch(MoEArchSpec):
    """SmallThinker (reference SmallThinkerModel :8519-8597): primary_router
    gate, gate/up/down expert stacks, FF written from moe_ffn_hidden_size,
    softmax-vs-sigmoid gating flag, sliding window from the layout list."""

    gguf_arch = "smallthinker"
    permute_qk = False
    expert_prefix = "block_sparse_moe.experts."
    expert_proj = {"gate": "ffn_gate_exps", "up": "ffn_up_exps",
                   "down": "ffn_down_exps"}
    moe_direct = {
        "block_sparse_moe.primary_router.weight": "ffn_gate_inp.weight"}

    @property
    def n_expert(self):
        c = self.hf
        return int(c.get("num_experts", c.get("moe_num_primary_experts")))

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.expert_count"] = self.n_expert
        md[f"{a}.expert_used_count"] = int(c.get(
            "num_experts_per_tok", c.get("moe_num_active_primary_experts", 2)))
        if c.get("moe_ffn_hidden_size") is not None:
            md[f"{a}.expert_feed_forward_length"] = int(c["moe_ffn_hidden_size"])
            md[f"{a}.feed_forward_length"] = int(c["moe_ffn_hidden_size"])
        md[f"{a}.expert_gating_func"] = (
            1 if c.get("moe_primary_router_apply_softmax") else 2)
        layout = c.get("sliding_window_layout") or []
        if any(layout) and c.get("sliding_window_size"):
            md[f"{a}.attention.sliding_window"] = int(c["sliding_window_size"])
        return md


class BailingMoeArch(MoEArchSpec):
    """Bailing/Ling MoE (reference BailingMoeModel :7735-7836): fused
    query_key_value split + llama permute in the pre-pass, leading dense
    blocks, norm_head output normalization folded at pack time."""

    gguf_arch = "bailingmoe"
    permute_qk = True
    n_expert_key = "num_experts"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.rope.dimension_count"] = int(head_dim)
        md[f"{a}.leading_dense_block_count"] = int(c.get("first_k_dense_replace", 0))
        md[f"{a}.expert_feed_forward_length"] = int(c["moe_intermediate_size"])
        md[f"{a}.expert_weights_scale"] = 1.0
        md[f"{a}.expert_shared_count"] = int(c.get("num_shared_experts", 0))
        md[f"{a}.expert_weights_norm"] = bool(c.get("norm_topk_prob", False))
        return md

    def transform_float(self, gguf_name, arr):
        if gguf_name == "output.weight" and self.hf.get("norm_head"):
            arr = arr.astype(np.float32)
            return arr / (np.linalg.norm(arr, axis=0, keepdims=True) + 1e-7)
        return arr


class PlmArch(ArchSpec):
    """PLM-1.8B (reference PLMModel :6587-6605): kv-lora MLA-lite — plain
    q_proj with compressed kv (attn_kv_a_mqa/attn_kv_b kept whole)."""

    gguf_arch = "plm"
    permute_qk = False

    _direct = {
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._direct:
                return f"blk.{parts[2]}.{self._direct[rest]}"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.kv_lora_rank"] = int(c["kv_lora_rank"])
        md[f"{a}.attention.key_length"] = int(
            c["qk_nope_head_dim"] + c["qk_rope_head_dim"])
        md[f"{a}.attention.value_length"] = int(c["v_head_dim"])
        md[f"{a}.rope.dimension_count"] = int(c["qk_rope_head_dim"])
        return md


class QwenArch(ArchSpec):
    """Qwen v1 (reference QwenModel :2957-2996): fused MHA c_attn kept as
    attn_qkv, swiglu w2/w1 = gate/up, rope base from rotary_emb_base, n_ff
    written as the doubled intermediate_size (llama.cpp halves it)."""

    gguf_arch = "qwen"
    permute_qk = False

    _layer = {
        "ln_1.weight": "attn_norm.weight",
        "attn.c_attn.weight": "attn_qkv.weight",
        "attn.c_attn.bias": "attn_qkv.bias",
        "attn.c_proj.weight": "attn_output.weight",
        "ln_2.weight": "ffn_norm.weight",
        "mlp.w1.weight": "ffn_up.weight",
        "mlp.w2.weight": "ffn_gate.weight",
        "mlp.c_proj.weight": "ffn_down.weight",
    }

    def tensor_name(self, hf_name):
        fixed = {"transformer.wte.weight": "token_embd.weight",
                 "transformer.ln_f.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("transformer.h."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{parts[2]}.{self._layer[rest]}"
        return None

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        md[f"{a}.rope.freq_base"] = float(self.hf.get("rotary_emb_base", 10000.0))
        return md


class ChatGlmArch(ArchSpec):
    """ChatGLM3/GLM4 legacy format (reference ChatGLMModel :7141-7295):
    fused MQA query_key_value + fused dense_h_to_4h (llama.cpp splits in
    the graph), partial rotary defaulting to 0.5, rope_ratio base scale."""

    gguf_arch = "chatglm"
    permute_qk = False

    _layer = {
        "input_layernorm.weight": "attn_norm.weight",
        "self_attention.query_key_value.weight": "attn_qkv.weight",
        "self_attention.query_key_value.bias": "attn_qkv.bias",
        "self_attention.dense.weight": "attn_output.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.dense_h_to_4h.weight": "ffn_up.weight",
        "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    }

    def tensor_name(self, hf_name):
        name = hf_name
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        fixed = {"embedding.word_embeddings.weight": "token_embd.weight",
                 "encoder.final_layernorm.weight": "output_norm.weight",
                 "output_layer.weight": "output.weight"}
        if name in fixed:
            return fixed[name]
        if name.endswith("rotary_pos_emb.inv_freq") or name.startswith("model.vision."):
            return None
        if name.startswith("encoder.layers."):
            parts = name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{parts[2]}.{self._layer[rest]}"
        return None

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        hidden = c.get("hidden_size", c.get("n_embed"))
        n_head = c.get("n_head", c.get("num_attention_heads"))
        n_kv = c.get("multi_query_group_num",
                     c.get("num_key_value_heads", n_head))
        head_dim = c.get("attention_dim") or hidden // n_head
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c.get("seq_length", hidden)),
            f"{a}.embedding_length": int(hidden),
            f"{a}.feed_forward_length": int(c.get(
                "ffn_hidden_size", c.get("intermediate_size", 4 * hidden))),
            f"{a}.block_count": int(c.get("num_layers",
                                          c.get("num_hidden_layers"))),
            f"{a}.attention.head_count": int(n_head),
            f"{a}.attention.head_count_kv": int(n_kv),
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("layernorm_epsilon", 1e-5)),
            f"{a}.rope.dimension_count": int(
                head_dim * c.get("partial_rotary_factor", 0.5)),
            f"{a}.rope.freq_base": 10000.0 * float(c.get("rope_ratio", 1.0)),
            f"{a}.vocab_size": int(c.get("padded_vocab_size",
                                         c.get("vocab_size"))),
            "tokenizer.ggml.add_bos_token": False,
        }


class CodeShellArch(StarCoderArch):
    """CodeShell (reference CodeShellModel :4237-4276): gpt_bigcode naming
    with grouped-query c_attn, rope at base 10000 with the converter's
    linear-1.0 scaling quirk."""

    gguf_arch = "codeshell"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.attention.head_count_kv"] = int(c["num_query_groups"])
        md[f"{a}.rope.freq_base"] = 10000.0
        md[f"{a}.rope.scaling.type"] = "linear"
        md[f"{a}.rope.scaling.factor"] = 1.0
        return md


class RefactArch(ArchSpec):
    """Refact-1.6B (reference RefactModel :1890-1955): MQA (kv fused, split
    at one head), fused gate_up split at the llama-style computed FF width,
    ALiBi positions (no rope keys)."""

    gguf_arch = "refact"
    permute_qk = False

    @property
    def _ff_dim(self) -> int:
        inner = 4 * self.hf["n_embd"]
        hidden = int(2 * inner / 3)
        return 256 * ((hidden + 255) // 256)

    def tensor_name(self, hf_name):
        fixed = {"transformer.wte.weight": "token_embd.weight",
                 "transformer.ln_f.weight": "output_norm.weight",
                 "lm_head.weight": "output.weight"}
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("transformer.h."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            m = {"ln_1.weight": "attn_norm.weight",
                 "ln_2.weight": "ffn_norm.weight",
                 "attn.q.weight": "attn_q.weight",
                 "attn.c_proj.weight": "attn_output.weight",
                 "mlp.c_proj.weight": "ffn_down.weight"}
            if rest in m:
                return f"blk.{parts[2]}.{m[rest]}"
        return None

    def special_tensors(self, hf_name, arr, get_artifact):
        if not hf_name.startswith("transformer.h."):
            return None
        i = hf_name.split(".")[2]
        rest = ".".join(hf_name.split(".")[3:])
        if rest == "attn.kv.weight":
            hd = self.hf["n_embd"] // self.hf["n_head"]
            return [("float", f"blk.{i}.attn_k.weight",
                     arr[:hd].astype(np.float16)),
                    ("float", f"blk.{i}.attn_v.weight",
                     arr[hd:].astype(np.float16))]
        if rest == "mlp.gate_up_proj.weight":
            ff = self._ff_dim
            return [("float", f"blk.{i}.ffn_gate.weight",
                     arr[:ff].astype(np.float16)),
                    ("float", f"blk.{i}.ffn_up.weight",
                     arr[ff:].astype(np.float16))]
        return None

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c["n_positions"]),
            f"{a}.embedding_length": int(c["n_embd"]),
            f"{a}.feed_forward_length": self._ff_dim,
            f"{a}.block_count": int(c["n_layer"]),
            f"{a}.attention.head_count": int(c["n_head"]),
            f"{a}.attention.head_count_kv": 1,
            f"{a}.attention.layer_norm_rms_epsilon": float(
                c.get("layer_norm_epsilon", 1e-5)),
            f"{a}.vocab_size": int(c["vocab_size"]),
        }


class JaisArch(_LegacyGptArch):
    """JAIS (reference JaisModel :6886-6962): gpt2 Conv1D weights transposed
    in the pre-pass, muP embedding/output scales folded into the tensors,
    ALiBi max bias recovered from the precomputed slopes tensor."""

    gguf_arch = "jais"

    def __init__(self, hf_config):
        super().__init__(hf_config)
        c = hf_config
        self._emb_scale = float(c.get("mup_embeddings_scale",
                                      c.get("embeddings_scale", 1.0)))
        if "mup_output_alpha" in c:
            self._width_scale = float(c["mup_output_alpha"]) * float(
                c["mup_width_scale"])
        else:
            self._width_scale = float(c.get("width_scale", 1.0))
        self._max_alibi_bias = 8.0

    def transform_float(self, gguf_name, arr):
        if gguf_name == "token_embd.weight":
            return arr * self._emb_scale
        if gguf_name == "output.weight":
            return arr * self._width_scale
        return arr

    def special_tensors(self, hf_name, arr, get_artifact):
        if hf_name.endswith("relative_pe.slopes"):
            n_closest_log2 = 2 ** math.floor(math.log2(self.hf["n_head"]))
            self._max_alibi_bias = float(
                -round(math.log2(float(arr.reshape(-1)[0])) * n_closest_log2))
            return []  # metadata only, tensor dropped
        return None

    def final_metadata(self):
        return {f"{self.gguf_arch}.attention.max_alibi_bias":
                self._max_alibi_bias}


class DeciArch(ArchSpec):
    """DeciLM / Nemotron-51B NAS models (reference DeciModel :2509-2683):
    per-layer head/kv/FFN arrays from block_configs (0-entries mark linear
    or dummy layers), per-layer GQA permute, own llama3 rope_freqs tensor."""

    gguf_arch = "deci"
    permute_qk = True

    def _per_layer(self):
        c = self.hf
        if "block_configs" in c:
            heads, kvs, ffs = [], [], []
            for bc in c["block_configs"]:
                g = bc["attention"]["n_heads_in_group"]
                if g is None:
                    kvs.append(0)
                    heads.append(c["num_attention_heads"]
                                 if bc["attention"].get("replace_with_linear")
                                 else 0)
                else:
                    kvs.append(c["num_attention_heads"] // g)
                    heads.append(c["num_attention_heads"])
                mult = bc["ffn"]["ffn_mult"]
                if mult is None:
                    ffs.append(0)
                else:
                    size = int(2 * mult * c["hidden_size"] / 3)
                    ffs.append(size if size % 256 == 0
                               else size + 256 - size % 256)
            return heads, kvs, ffs
        if "num_key_value_heads_per_layer" in c:
            n = len(c["num_key_value_heads_per_layer"])
            return ([c["num_attention_heads"]] * n,
                    list(c["num_key_value_heads_per_layer"]), None)
        return None, None, None

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        heads, kvs, ffs = self._per_layer()
        if heads is not None:
            md[f"{a}.attention.head_count_kv"] = [int(x) for x in kvs]
        if "block_configs" in c:
            md[f"{a}.attention.head_count"] = [int(x) for x in heads]
            md[f"{a}.feed_forward_length"] = [int(x) for x in ffs]
            hd = c["hidden_size"] // c["num_attention_heads"]
            md[f"{a}.attention.key_length"] = hd
            md[f"{a}.attention.value_length"] = hd
        return md

    def row_permutation(self, hf_name, n_rows):
        c = self.hf
        n_head = c["num_attention_heads"]
        heads, kvs, _ = self._per_layer()
        if ".self_attn.q_proj." in hf_name or ".self_attn.k_proj." in hf_name:
            i = int(hf_name.split(".")[2])
            if ".q_proj." in hf_name:
                n = heads[i] if heads is not None else n_head
            else:
                n = (kvs[i] if kvs is not None
                     else c.get("num_key_value_heads", n_head))
            if n == 0:
                return None
            return gqa_permute_rows(n_rows, n)
        return None

    def extra_tensors(self):
        c = self.hf
        rs = dict(c.get("rope_scaling") or {})
        if (rs.get("rope_type", rs.get("type")) or "").lower() != "llama3":
            return []
        base = float(c.get("rope_theta", 10000.0))
        dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        freqs = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
        factor = rs.get("factor", 8.0)
        lo_f = rs.get("low_freq_factor", 1.0)
        hi_f = rs.get("high_freq_factor", 4.0)
        old_ctx = c.get("original_max_position_embeddings", 8192)
        lo_wl, hi_wl = old_ctx / lo_f, old_ctx / hi_f
        out = []
        for f in freqs:
            wl = 2 * math.pi / float(f)
            if wl < hi_wl:
                out.append(1.0)
            elif wl > lo_wl:
                out.append(float(factor))
            else:
                smooth = (old_ctx / wl - lo_f) / (hi_f - lo_f)
                out.append(1 / ((1 - smooth) / factor + smooth))
        return [("rope_freqs.weight", np.asarray(out, dtype=np.float32))]


class XverseArch(ArchSpec):
    """XVERSE (reference XverseModel :1712-1806): llama-style GQA permute,
    context length may come from max_sequence_length, pth data layout tag."""

    gguf_arch = "xverse"
    permute_qk = True

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        if "max_sequence_length" in c:
            md[f"{a}.context_length"] = int(c["max_sequence_length"])
        md["general.tensor_data_layout"] = "Meta AI original pth"
        return md


class OrionArch(ArchSpec):
    """Orion (reference OrionModel :1597-1630): config says rms_norm_eps but
    the model uses mean-subtracting LayerNorm — the converter stamps the
    value into attention.layer_norm_epsilon (the quirk llama.cpp relies on)."""

    gguf_arch = "orion"
    permute_qk = False

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        if "max_sequence_length" in c:
            md[f"{a}.context_length"] = int(c["max_sequence_length"])
        md[f"{a}.attention.layer_norm_epsilon"] = float(c["rms_norm_eps"])
        md["general.tensor_data_layout"] = "Meta AI original pth"
        return md


class InternLM3Arch(LlamaArch):
    """InternLM3 maps onto GGUF arch 'llama' verbatim — llama GQA permute,
    vocab_size key (reference InternLM3Model :4456-4512)."""


class MiniCPM3Arch(ArchSpec):
    """MiniCPM3 (reference MiniCPM3Model :2904-2954): MLA projections kept
    whole (attn_kv_b is NOT split, unlike deepseek2), q/kv lora ranks +
    longrope factor tensors without the phi3 attn_factor key."""

    gguf_arch = "minicpm3"
    permute_qk = False

    _direct = {
        "self_attn.q_a_proj.weight": "attn_q_a.weight",
        "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
        "self_attn.q_b_proj.weight": "attn_q_b.weight",
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._direct:
                return f"blk.{parts[2]}.{self._direct[rest]}"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        if c.get("q_lora_rank") is not None:
            md[f"{a}.attention.q_lora_rank"] = int(c["q_lora_rank"])
        md[f"{a}.attention.kv_lora_rank"] = int(c["kv_lora_rank"])
        md[f"{a}.attention.key_length"] = int(
            c["qk_nope_head_dim"] + c["qk_rope_head_dim"])
        md[f"{a}.rope.dimension_count"] = int(c["qk_rope_head_dim"])
        return md

    def extra_tensors(self):
        rs = dict(self.hf.get("rope_scaling") or {})
        long_f, short_f = rs.get("long_factor"), rs.get("short_factor")
        if long_f is None or short_f is None:
            return []
        return [
            ("rope_factors_long.weight", np.asarray(long_f, dtype=np.float32)),
            ("rope_factors_short.weight", np.asarray(short_f, dtype=np.float32)),
        ]


class OpenElmArch(ArchSpec):
    """OpenELM (reference OpenELMModel :6055-6127): per-layer query/kv head
    and FFN-width arrays, fused qkv kept fused, fused ffn proj_1 split into
    gate/up at the per-layer width; rms eps hardcoded to 1e-6 upstream."""

    gguf_arch = "openelm"
    permute_qk = False

    _layer = {
        "attn_norm.weight": "attn_norm.weight",
        "attn.qkv_proj.weight": "attn_qkv.weight",
        "attn.q_norm.weight": "attn_q_norm.weight",
        "attn.k_norm.weight": "attn_k_norm.weight",
        "attn.out_proj.weight": "attn_output.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "ffn.proj_2.weight": "ffn_down.weight",
    }

    @staticmethod
    def _make_divisible(v, divisor: int) -> int:
        new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    def _ffn_dims(self) -> List[int]:
        c = self.hf
        return [self._make_divisible(m * c["model_dim"], c["ffn_dim_divisor"])
                for m in c["ffn_multipliers"]]

    def tensor_name(self, hf_name):
        fixed = {
            "transformer.token_embeddings.weight": "token_embd.weight",
            "transformer.norm.weight": "output_norm.weight",
        }
        if hf_name in fixed:
            return fixed[hf_name]
        if hf_name.startswith("transformer.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{parts[2]}.{self._layer[rest]}"
        return None

    def special_tensors(self, hf_name, arr, get_artifact):
        if not (hf_name.startswith("transformer.layers.")
                and hf_name.endswith(".ffn.proj_1.weight")):
            return None
        i = int(hf_name.split(".")[2])
        ff = self._ffn_dims()[i]
        return [("float", f"blk.{i}.ffn_gate.weight",
                 arr[:ff].astype(np.float16)),
                ("float", f"blk.{i}.ffn_up.weight",
                 arr[ff:].astype(np.float16))]

    def metadata(self):
        c, a = self.hf, self.gguf_arch
        head_dim = int(c["head_dim"])
        return {
            "general.architecture": a,
            "general.name": c.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            f"{a}.context_length": int(c["max_context_length"]),
            f"{a}.embedding_length": int(c["model_dim"]),
            f"{a}.block_count": int(c["num_transformer_layers"]),
            f"{a}.feed_forward_length": self._ffn_dims(),
            f"{a}.attention.head_count": [int(x) for x in c["num_query_heads"]],
            f"{a}.attention.head_count_kv": [int(x) for x in c["num_kv_heads"]],
            f"{a}.rope.freq_base": float(c["rope_freq_constant"]),
            f"{a}.attention.layer_norm_rms_epsilon": 1e-6,
            f"{a}.rope.dimension_count": head_dim,
            f"{a}.attention.key_length": head_dim,
            f"{a}.attention.value_length": head_dim,
            f"{a}.vocab_size": int(c["vocab_size"]),
        }


class PhiMoeArch(_LongRopeMixin, MoEArchSpec):
    """Phi-3.5-MoE (reference PhiMoeModel :3963-4016): phi3 longrope metadata
    + mixtral-style w1/w3/w2 expert stacks; LayerNorms carry biases (mapped
    by the shared name table)."""

    gguf_arch = "phimoe"
    permute_qk = False
    n_expert_key = "num_local_experts"
    expert_prefix = "block_sparse_moe.experts."
    expert_proj = {"w1": "ffn_gate_exps", "w3": "ffn_up_exps", "w2": "ffn_down_exps"}
    moe_direct = {"block_sparse_moe.gate.weight": "ffn_gate_inp.weight"}


class Lfm2Arch(ArchSpec):
    """LFM2 hybrid shortconv/attention stack (reference LFM2Model :8435-8481):
    per-layer head_count_kv array (0 on conv layers), shortconv.l_cache, and
    the auto-adjusted feed-forward width."""

    gguf_arch = "lfm2"
    permute_qk = False

    _layer = {
        "operator_norm.weight": "attn_norm.weight",
        "ffn_norm.weight": "ffn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.out_proj.weight": "attn_output.weight",
        "self_attn.q_layernorm.weight": "attn_q_norm.weight",
        "self_attn.k_layernorm.weight": "attn_k_norm.weight",
        "feed_forward.w1.weight": "ffn_gate.weight",
        "feed_forward.w2.weight": "ffn_down.weight",
        "feed_forward.w3.weight": "ffn_up.weight",
        "conv.conv.weight": "shortconv.conv.weight",
        "conv.in_proj.weight": "shortconv.in_proj.weight",
        "conv.out_proj.weight": "shortconv.out_proj.weight",
    }

    def tensor_name(self, hf_name):
        if hf_name == "model.embedding_norm.weight":
            return "token_embd_norm.weight"
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest in self._layer:
                return f"blk.{parts[2]}.{self._layer[rest]}"
            return None
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        n_kv = c.get("num_key_value_heads", c["num_attention_heads"])
        md[f"{a}.attention.head_count_kv"] = [
            n_kv if lt == "full_attention" else 0 for lt in c["layer_types"]
        ]
        md[f"{a}.attention.layer_norm_rms_epsilon"] = float(
            c.get("norm_eps", 1e-5))
        md[f"{a}.shortconv.l_cache"] = int(c.get("conv_L_cache", 3))
        ff = int(c.get("block_ff_dim", c.get("intermediate_size")))
        if c.get("block_auto_adjust_ff_dim"):
            ff = int(2 * ff / 3)
            if c.get("block_ffn_dim_multiplier") is not None:
                ff = int(c["block_ffn_dim_multiplier"] * ff)
            mo = int(c.get("block_multiple_of", 256))
            ff = mo * ((ff + mo - 1) // mo)
        md[f"{a}.feed_forward_length"] = ff
        return md


class BitnetArch(ArchSpec):
    """BitNet b1.58 (reference BitnetModel :2686-2724): linear weights are
    re-ternarized at pack time with the abs-mean scale (upstream stores the
    latent fp weights); sub-norms map to attn_sub_norm/ffn_sub_norm."""

    gguf_arch = "bitnet"
    permute_qk = False

    _TERNARY_SUFFIXES = ("attn_q.weight", "attn_k.weight", "attn_v.weight",
                         "attn_output.weight", "ffn_gate.weight",
                         "ffn_up.weight", "ffn_down.weight")

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.layers."):
            parts = hf_name.split(".")
            rest = ".".join(parts[3:])
            if rest == "self_attn.attn_sub_norm.weight":
                return f"blk.{parts[2]}.attn_sub_norm.weight"
            if rest == "mlp.ffn_sub_norm.weight":
                return f"blk.{parts[2]}.ffn_sub_norm.weight"
        return hf_to_gguf_name(hf_name)

    def metadata(self):
        md = super().metadata()
        a = self.gguf_arch
        # reference quirk: always stamps linear rope scaling at factor 1.0
        md[f"{a}.rope.scaling.type"] = "linear"
        md[f"{a}.rope.scaling.factor"] = 1.0
        return md

    def transform_float(self, gguf_name, arr):
        if not gguf_name.endswith(self._TERNARY_SUFFIXES):
            return arr
        w = arr.astype(np.float32)
        scale = max(float(np.abs(w).mean()), 1e-5)
        return np.clip(np.round(w / scale), -1, 1) * scale


class ChameleonArch(ArchSpec):
    """Chameleon (reference ChameleonModel :7843-7880): llama-style GQA
    permute on q/k, per-head q/k norms collapsed to head 0 and re-laid-out
    interleaved (the converter's _reverse_hf_permute), vqmodel dropped,
    swin_norm flag."""

    gguf_arch = "chameleon"
    permute_qk = True

    def metadata(self):
        md = super().metadata()
        md[f"{self.gguf_arch}.swin_norm"] = bool(self.hf.get("swin_norm", False))
        return md

    def tensor_name(self, hf_name):
        if hf_name.startswith("model.vqmodel"):
            return None
        return hf_to_gguf_name(hf_name)

    def _qk_norm(self, arr: np.ndarray, n_heads: int) -> np.ndarray:
        hd = arr.shape[-1]
        head0 = arr.reshape(-1, hd)[0]
        inter = head0.reshape(2, hd // 2).T.reshape(-1)
        return np.tile(inter, (n_heads, 1))

    def special_tensors(self, hf_name, arr, get_artifact):
        if not (hf_name.startswith("model.layers.")
                and (".self_attn.q_norm." in hf_name
                     or ".self_attn.k_norm." in hf_name)):
            return None
        c = self.hf
        n = (c["num_attention_heads"] if ".q_norm." in hf_name
             else c.get("num_key_value_heads", c["num_attention_heads"]))
        parts = hf_name.split(".")
        which = "attn_q_norm" if ".q_norm." in hf_name else "attn_k_norm"
        kind = "weight" if hf_name.endswith(".weight") else "bias"
        return [("float", f"blk.{parts[2]}.{which}.{kind}",
                 self._qk_norm(arr, n).astype(np.float32))]


class Llama4Arch(MoEArchSpec):
    """Llama-4 (reference Llama4Model :2432-2472): interleaved MoE layers
    (fused gate_up/transposed down experts are split in models/adapters),
    feed_forward_length from intermediate_size_mlp, expert FF from the MoE
    intermediate_size; no q/k permute (undo_permute=False upstream)."""

    gguf_arch = "llama4"
    permute_qk = False
    n_expert_key = "num_local_experts"

    def metadata(self):
        md = super().metadata()
        c, a = self.hf, self.gguf_arch
        md[f"{a}.feed_forward_length"] = int(
            c.get("intermediate_size_mlp", c["intermediate_size"]))
        md[f"{a}.expert_feed_forward_length"] = int(c["intermediate_size"])
        md[f"{a}.interleave_moe_layer_step"] = int(
            c.get("interleave_moe_layer_step", 1))
        head_dim = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
        md[f"{a}.attention.key_length"] = head_dim
        md[f"{a}.attention.value_length"] = head_dim
        return md


_ARCH_REGISTRY.update(
    {"llama": LlamaArch, "mistral": MistralArch, "qwen2": Qwen2Arch,
     "qwen3": Qwen3Arch, "phi3": Phi3Arch, "gemma": GemmaArch,
     "gemma2": Gemma2Arch, "gemma3_text": Gemma3Arch, "olmo2": Olmo2Arch,
     "qwen2_moe": Qwen2MoeArch,
     "qwen3_moe": Qwen3MoeArch, "mixtral": MixtralArch,
     "granite": GraniteArch, "minicpm": MiniCPMArch, "exaone": ExaoneArch,
     "internlm2": InternLM2Arch, "baichuan": BaichuanArch,
     "olmoe": OlmoeArch, "deepseek": DeepseekArch,
     "stablelm": StableLmArch, "starcoder2": Starcoder2Arch,
     "nemotron": NemotronArch, "cohere": CohereArch, "phi": PhiArch,
     "deepseek_v2": Deepseek2Arch, "deepseek_v3": Deepseek2Arch,
     "glm4": Glm4Arch, "cohere2": Cohere2Arch, "olmo": OlmoArch,
     "arcee": ArceeArch, "seed_oss": SeedOssArch, "ernie4_5": Ernie45Arch,
     "exaone4": Exaone4Arch, "granitemoe": GraniteMoeArch,
     "glm4_moe": Glm4MoeArch, "ernie4_5_moe": Ernie45MoeArch,
     "dots1": Dots1Arch, "gpt_oss": GptOssArch, "falcon": FalconArch,
     "hunyuan_v1_dense": HunYuanDenseArch, "hunyuan_v1_moe": HunYuanMoeArch,
     "gpt_neox": GptNeoxArch, "gptj": GptJArch, "gpt2": Gpt2Arch,
     "bloom": BloomArch, "mpt": MptArch, "granitemoeshared": GraniteMoeArch,
     "smollm3": SmolLM3Arch, "glm": GlmArch, "gpt_bigcode": StarCoderArch,
     "dbrx": DbrxArch, "mamba": MambaArch, "falcon_mamba": MambaArch,
     "mamba2": Mamba2Arch, "jamba": JambaArch,
     "granitemoehybrid": GraniteHybridArch, "bamba": GraniteHybridArch,
     "falcon_h1": FalconH1Arch, "phimoe": PhiMoeArch, "lfm2": Lfm2Arch,
     "bitnet": BitnetArch, "chameleon": ChameleonArch,
     "llama4": Llama4Arch, "llama4_text": Llama4Arch,
     "xverse": XverseArch, "orion": OrionArch, "internlm3": InternLM3Arch,
     "minicpm3": MiniCPM3Arch, "openelm": OpenElmArch,
     "qwen": QwenArch, "chatglm": ChatGlmArch, "codeshell": CodeShellArch,
     "gpt_refact": RefactArch, "jais": JaisArch,
     "deci": DeciArch, "nemotron-nas": DeciArch,
     "arctic": ArcticArch, "smallthinker": SmallThinkerArch,
     "bailing_moe": BailingMoeArch, "plm": PlmArch,
     "bert": BertArch, "camembert": BertArch, "roberta": RobertaArch,
     "xlm-roberta": RobertaArch, "distilbert": DistilBertArch,
     "t5": T5Arch, "mt5": T5Arch, "umt5": T5Arch,
     "dream": DreamArch, "llada": LladaArch, "nemotron_h": NemotronHArch,
     "plamo": PlamoArch, "grok": GrokArch, "grok-1": GrokArch,
     "rwkv6": Rwkv6Arch, "rwkv6qwen2": Rwkv6Qwen2Arch,
     "rwkv7": Rwkv7Arch, "rwkv_hybrid": ARwkv7Arch,
     "qwen2_vl": Qwen2VLArch, "qwen2_5_vl": Qwen2VLArch,
     "qwen2_5_vl_text": Qwen2VLArch, "nomic_bert": NomicBertArch,
     "mistral3": MistralArch,
     "gemma3n": Gemma3nArch, "gemma3n_text": Gemma3nArch,
     "plamo2": Plamo2Arch,
     "glm4v": Glm4Arch, "glm4v_text": Glm4Arch,
     "qwen2_5_omni": Qwen2VLArch, "qwen2_5_omni_text": Qwen2VLArch,
     "neobert": NeoBertArch, "jina_bert": JinaBertV2Arch,
     "wavtokenizer-dec": WavTokenizerArch, "wavtokenizer": WavTokenizerArch}
)


def register_arch(model_type: str, spec_cls) -> None:
    _ARCH_REGISTRY[model_type] = spec_cls


# Some checkpoints reuse a generic model_type ("bert") but need their own
# spec; the reference dispatches on config architectures[0] (ModelBase
# registry keyed on HF class names, pack_gptq_into_gguf.py:513-536).
_ARCH_CLASS_OVERRIDES: Dict[str, type] = {
    "JinaBertModel": JinaBertV2Arch,
    "JinaBertForMaskedLM": JinaBertV2Arch,
    "NeoBERT": NeoBertArch,
    "NeoBERTLMHead": NeoBertArch,
    "NeoBERTForSequenceClassification": NeoBertArch,
}


# ---------------------------------------------------------------------------
# Tokenizer metadata
# ---------------------------------------------------------------------------


# llama.cpp selects its pretokenizer regex from tokenizer.ggml.pre
# (convert_hf_to_gguf.get_vocab_base_pre keys). Derived from model_type here
# since the checksum-of-tokenizer trick needs the real tokenizer at hand.
PRE_TOKENIZER_BY_MODEL_TYPE = {
    "llama": "llama-bpe",
    "mistral": "llama-bpe",
    "mixtral": "llama-bpe",
    "qwen2": "qwen2",
    "qwen2_moe": "qwen2",
    "qwen3": "qwen2",
    "qwen3_moe": "qwen2",
    "phi3": "llama-bpe",
    "gpt2": "gpt-2",
    "starcoder2": "starcoder",
    "olmo2": "olmo",
    "deepseek": "deepseek-llm",
    "deepseek_v2": "deepseek-llm",
    "deepseek_v3": "deepseek-v3",
    "exaone": "exaone",
    "glm4": "chatglm-bpe",
    "smollm3": "llama-bpe",
    "olmoe": "olmo",
    "llama4": "llama4",
    "llama4_text": "llama4",
    "chameleon": "chameleon",
    "lfm2": "lfm2",
    "bitnet": "llama-bpe",
    "gpt_refact": "refact",
    "jais": "jais",
    "deci": "llama-bpe",
    "nemotron-nas": "llama-bpe",
}

_BYTE_PIECE = 6  # GGUF token types (== sentencepiece piece types)
_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED = 1, 2, 3, 4, 5


def _chat_template_metadata(model_dir: Path) -> Dict[str, Any]:
    """tokenizer.chat_template keys from tokenizer_config.json (reference
    SpecialVocab.chat_template handling: plain string, or a named list that
    becomes tokenizer.chat_templates + per-name keys with "default"
    promoted)."""
    p = model_dir / "tokenizer_config.json"
    if not p.exists():
        return {}
    with open(p) as f:
        tc = json.load(f)
    tmpl = tc.get("chat_template")
    if tmpl is None:
        return {}
    if isinstance(tmpl, str):
        return {"tokenizer.chat_template": tmpl}
    md: Dict[str, Any] = {}
    names = []
    for entry in tmpl:
        name, text = entry.get("name"), entry.get("template")
        if not name or not isinstance(text, str):
            continue
        if name == "default":
            md["tokenizer.chat_template"] = text
        else:
            names.append(name)
            md[f"tokenizer.chat_template.{name}"] = text
    if names:
        md["tokenizer.chat_templates"] = names
    return md


def _special_token_ids(model_dir: Path) -> Dict[str, Any]:
    """bos/eos ids + add_bos/add_eos flags from the HF config files."""
    md: Dict[str, Any] = {}
    ids: Dict[str, int] = {}
    for p in (model_dir / "generation_config.json", model_dir / "config.json",
              model_dir / "tokenizer_config.json"):
        if p.exists():
            with open(p) as f:
                d = json.load(f)
            for key in ("bos_token_id", "eos_token_id", "pad_token_id"):
                v = d.get(key)
                if isinstance(v, list):
                    v = v[0]
                if isinstance(v, int) and key not in ids:
                    ids[key] = v
            for key in ("add_bos_token", "add_eos_token"):
                flag = d.get(key)
                gk = f"tokenizer.ggml.{key}"
                if isinstance(flag, bool) and gk not in md:
                    md[gk] = flag
    for key, gk in (("bos_token_id", "tokenizer.ggml.bos_token_id"),
                    ("eos_token_id", "tokenizer.ggml.eos_token_id"),
                    ("pad_token_id", "tokenizer.ggml.padding_token_id")):
        if key in ids:
            md[gk] = ids[key]
    return md


def _bpe_tokenizer_metadata(tok: Dict[str, Any], model_type: str) -> Dict[str, Any]:
    model = tok["model"]
    vocab: Dict[str, int] = model["vocab"]
    merges = model.get("merges", [])
    merges = [" ".join(m) if isinstance(m, (list, tuple)) else m for m in merges]
    size = max(vocab.values()) + 1
    tokens = [""] * size
    for t, i in vocab.items():
        tokens[i] = t
    toktypes = [_NORMAL] * size
    added = {t["id"]: t for t in tok.get("added_tokens", [])}
    for i, t in added.items():
        if i >= size:
            tokens.extend([""] * (i + 1 - size))
            toktypes.extend([_NORMAL] * (i + 1 - size))
            size = i + 1
        tokens[i] = t["content"]
        toktypes[i] = _CONTROL if t.get("special") else _USER_DEFINED
    return {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": PRE_TOKENIZER_BY_MODEL_TYPE.get(model_type, "llama-bpe"),
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": toktypes,
        "tokenizer.ggml.merges": merges,
    }


def _wordpiece_tokenizer_metadata(tok: Dict[str, Any]) -> Dict[str, Any]:
    """WordPiece (BERT) fast tokenizer -> GGUF 'bert' vocab with the
    phantom-space convention (reference BertModel.set_vocab :4546-4556:
    '##x' -> 'x', plain words get a U+2581 prefix, [SPECIAL] kept)."""
    model = tok["model"]
    vocab: Dict[str, int] = model["vocab"]
    size = max(vocab.values()) + 1
    tokens = [f"[PAD{i}]" for i in range(size)]
    toktypes = [_UNUSED] * size
    for t, i in vocab.items():
        tokens[i] = t
        toktypes[i] = _NORMAL
    for t in tok.get("added_tokens", []):
        i = t["id"]
        if i >= size:
            tokens.extend([f"[PAD{j}]" for j in range(size, i + 1)])
            toktypes.extend([_UNUSED] * (i + 1 - size))
            size = i + 1
        tokens[i] = t["content"]
        toktypes[i] = _CONTROL if t.get("special") else _USER_DEFINED

    def phantom(t: str) -> str:
        if t.startswith("[") and t.endswith("]"):
            return t
        if t.startswith("##"):
            return t[2:]
        return "▁" + t

    return {
        "tokenizer.ggml.model": "bert",
        "tokenizer.ggml.pre": "default",
        "tokenizer.ggml.tokens": [phantom(t) for t in tokens],
        "tokenizer.ggml.token_type": toktypes,
    }


def _unigram_tokenizer_metadata(tok: Dict[str, Any],
                                ggml_model: str = "llama") -> Dict[str, Any]:
    """Fast-tokenizer Unigram model (SPM re-export): [piece, score] pairs."""
    model = tok["model"]
    entries = model["vocab"]
    unk_id = model.get("unk_id")
    tokens = [e[0] for e in entries]
    scores = [float(e[1]) for e in entries]
    toktypes = []
    for i, t in enumerate(tokens):
        if i == unk_id:
            toktypes.append(_UNKNOWN)
        elif len(t) == 6 and t.startswith("<0x") and t.endswith(">"):
            toktypes.append(_BYTE_PIECE)
        else:
            toktypes.append(_NORMAL)
    for t in tok.get("added_tokens", []):
        i = t["id"]
        if i >= len(tokens):
            tokens.extend([""] * (i + 1 - len(tokens)))
            scores.extend([-1000.0] * (i + 1 - len(scores)))
            toktypes.extend([_UNUSED] * (i + 1 - len(toktypes)))
        tokens[i] = t["content"]
        scores[i] = -1000.0
        toktypes[i] = _CONTROL if t.get("special") else _USER_DEFINED
    return {
        "tokenizer.ggml.model": ggml_model,
        "tokenizer.ggml.pre": "default",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": toktypes,
    }


# archs whose Unigram vocab llama.cpp loads with the UGM ("t5") tokenizer
# (reference _xlmroberta_set_vocab / T5Model.set_vocab write "t5")
_UGM_MODEL_TYPES = {"roberta", "xlm-roberta", "camembert", "nomic_bert",
                    "t5", "mt5", "umt5"}


def _spm_tokenizer_metadata(model_dir: Path) -> Dict[str, Any]:
    """SentencePiece tokenizer.model → GGUF llama-vocab keys (reference:
    SentencePieceVocab in pack_gptq_into_gguf.py; parsed without the
    sentencepiece package via export/spm.py)."""
    from . import spm

    model = spm.parse_model((model_dir / "tokenizer.model").read_bytes())
    tokens = [p.piece for p in model.pieces]
    scores = [p.score for p in model.pieces]
    toktypes = [p.type for p in model.pieces]
    # added tokens beyond the SPM vocab (added_tokens.json / tokenizer_config)
    added: Dict[int, Tuple[str, bool]] = {}
    at_path = model_dir / "added_tokens.json"
    if at_path.exists():
        with open(at_path) as f:
            for content, i in json.load(f).items():
                added[int(i)] = (content, True)
    cfg_path = model_dir / "tokenizer_config.json"
    if cfg_path.exists():
        with open(cfg_path) as f:
            dec = json.load(f).get("added_tokens_decoder", {})
        for i, t in dec.items():
            added.setdefault(int(i), (t["content"], bool(t.get("special", True))))
    for i, (content, special) in sorted(added.items()):
        if i >= len(tokens):
            tokens.extend([f"[PAD{j}]" for j in range(len(tokens), i + 1)])
            scores.extend([-1000.0] * (i + 1 - len(scores)))
            toktypes.extend([_UNUSED] * (i + 1 - len(toktypes)))
        if tokens[i] != content:
            tokens[i] = content
            scores[i] = -1000.0
            toktypes[i] = _CONTROL if special else _USER_DEFINED
    md: Dict[str, Any] = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.pre": "default",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": toktypes,
    }
    for attr, key in (("unk_id", "tokenizer.ggml.unknown_token_id"),
                      ("bos_id", "tokenizer.ggml.bos_token_id"),
                      ("eos_id", "tokenizer.ggml.eos_token_id"),
                      ("pad_id", "tokenizer.ggml.padding_token_id")):
        v = getattr(model, attr)
        if v is not None and v >= 0:
            md[key] = v
    return md


def _rwkv_world_tokenizer_metadata(model_dir: Path,
                                   vocab_size: int) -> Dict[str, Any]:
    """RWKV 'world' vocab from rwkv_vocab_v20230424.txt (reference
    _set_vocab_rwkv_world, pack_gptq_into_gguf.py:1142-1185). Real RWKV
    checkpoints ship this text file instead of a tokenizer.json; each line
    is ``<id> <python-literal token> <byte length>``. Token text is stored
    as the byte-repr body (``repr(b)[2:-1]``), padded to vocab_size with
    [PADi] UNUSED entries; bos = eos = 0 (<s>) and eot = 261 ('\\n\\n'),
    matching the reference's post-fix of SpecialVocab."""
    import ast

    tokens: List[str] = ["<s>"]
    toktypes: List[int] = [_CONTROL]
    with open(model_dir / "rwkv_vocab_v20230424.txt", encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) < 3:
                continue
            token = ast.literal_eval(" ".join(parts[1:-1]))
            blen = int(parts[-1])
            b = token.encode("utf-8") if isinstance(token, str) else bytes(token)
            assert len(b) == blen, f"vocab line length mismatch: {line!r}"
            tokens.append(repr(b)[2:-1])
            toktypes.append(_NORMAL)
    assert vocab_size >= len(tokens), "vocab_size below world-vocab entries"
    for i in range(len(tokens), vocab_size):
        tokens.append(f"[PAD{i}]")
        toktypes.append(_UNUSED)
    return {
        "tokenizer.ggml.model": "rwkv",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": toktypes,
    }


def tokenizer_metadata(model_dir: Path, model_type: str = "llama") -> Dict[str, Any]:
    """Extract GGUF tokenizer keys from an HF checkpoint.

    Handles SentencePiece (`tokenizer.model`: gemma/phi3/mistral lineage),
    fast tokenizers (`tokenizer.json`, BPE or Unigram), and the RWKV world
    vocab text file. Raises on a tokenizer that cannot be represented — a
    GGUF without vocab is unloadable by llama.cpp, so silence would
    mis-serve downstream.
    """
    md: Dict[str, Any] = {}
    if (model_dir / "rwkv_vocab_v20230424.txt").exists():
        vocab_size = 65536
        cfg_path = model_dir / "config.json"
        if cfg_path.exists():
            with open(cfg_path) as f:
                vocab_size = json.load(f).get("vocab_size", 65536)
        md = _rwkv_world_tokenizer_metadata(model_dir, vocab_size)
        md.update(_chat_template_metadata(model_dir))
        # reference post-fix: bos/eos pinned to <s>, eot to '\n\n' (261),
        # fallback chat template name when the checkpoint ships none
        md.setdefault("tokenizer.chat_template", "rwkv-world")
        md["tokenizer.ggml.bos_token_id"] = 0
        md["tokenizer.ggml.eos_token_id"] = 0
        md["tokenizer.ggml.eot_token_id"] = 261
        return md
    if (model_dir / "tokenizer.model").exists():
        md = _spm_tokenizer_metadata(model_dir)
    elif (model_dir / "tokenizer.json").exists():
        with open(model_dir / "tokenizer.json") as f:
            tok = json.load(f)
        mtype = tok.get("model", {}).get("type")
        if mtype == "BPE":
            md = _bpe_tokenizer_metadata(tok, model_type)
        elif mtype == "Unigram":
            md = _unigram_tokenizer_metadata(
                tok, "t5" if model_type in _UGM_MODEL_TYPES else "llama")
        elif mtype == "WordPiece":
            md = _wordpiece_tokenizer_metadata(tok)
        else:
            raise NotImplementedError(
                f"tokenizer.json model type {mtype!r} cannot be packed into GGUF"
            )
    else:
        return {}  # no tokenizer shipped (synthetic test checkpoints)
    md.update(_special_token_ids(model_dir))
    md.update(_chat_template_metadata(model_dir))
    return md


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def concat_artifacts(arts) -> artifacts.LayerArtifact:
    """Row-concatenate split artifacts into one fused tensor (phi3 attn_qkv /
    ffn_up). Exact: K-quant rows are independent."""
    assert len({a.q_type for a in arts}) == 1, "fused parts must share a quant type"
    return artifacts.LayerArtifact(
        q_type=arts[0].q_type,
        qweight=np.concatenate([a.qweight for a in arts], axis=0),
        super_group_scale=np.concatenate([a.super_group_scale for a in arts], axis=0),
        super_group_zero=np.concatenate([a.super_group_zero for a in arts], axis=0),
        group_scale_quant=np.concatenate([a.group_scale_quant for a in arts], axis=0),
        group_zero_quant=np.concatenate([a.group_zero_quant for a in arts], axis=0),
    )


def _permute_artifact(art: artifacts.LayerArtifact, perm: np.ndarray) -> artifacts.LayerArtifact:
    return artifacts.LayerArtifact(
        q_type=art.q_type,
        qweight=art.qweight[perm],
        super_group_scale=art.super_group_scale[perm],
        super_group_zero=art.super_group_zero[perm],
        group_scale_quant=art.group_scale_quant[perm],
        group_zero_quant=art.group_zero_quant[perm],
    )


def pack_model(
    model_dir: Union[str, Path],
    quant_dir: Union[str, Path],
    out_path: Union[str, Path],
    *,
    default_float: GGMLQuantizationType = GGMLQuantizationType.F16,
    extra_metadata: Optional[Dict[str, Any]] = None,
    vocab_only: bool = False,
) -> Path:
    """Produce a llama.cpp-loadable .gguf from an HF checkpoint + artifacts.

    model_dir: HF checkpoint (config.json + safetensors + tokenizer.json).
    quant_dir: per-layer artifact tree from the calibration walk.
    """
    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    quant_dir = Path(quant_dir)
    with open(model_dir / "config.json") as f:
        hf_cfg = json.load(f)
    # multimodal wrappers: flatten the text config into the top level,
    # keeping the wrapper's model_type (reference load_hparams :504-510 +
    # TextModel text_config merge)
    if "llm_config" in hf_cfg:  # InternVL naming
        hf_cfg["text_config"] = hf_cfg["llm_config"]
    if "thinker_config" in hf_cfg:  # Qwen-Omni naming
        hf_cfg["text_config"] = hf_cfg["thinker_config"]["text_config"]
    text_mt = None
    if isinstance(hf_cfg.get("text_config"), dict):
        text_mt = hf_cfg["text_config"].get("model_type")
        mt = hf_cfg.get("model_type") or text_mt
        hf_cfg = {**hf_cfg, **hf_cfg["text_config"], "model_type": mt}
    model_type = hf_cfg.get("model_type", "llama")
    spec_cls = None
    for arch_cls in hf_cfg.get("architectures") or []:
        if arch_cls in _ARCH_CLASS_OVERRIDES:
            spec_cls = _ARCH_CLASS_OVERRIDES[arch_cls]
            break
    if spec_cls is None:
        spec_cls = _ARCH_REGISTRY.get(model_type)
    if spec_cls is None and text_mt is not None:
        # multimodal wrappers (llava/mistral3/idefics3/smolvlm/kimi_vl/...)
        # pack their text model; vision tensors are dropped in the pre-pass
        spec_cls = _ARCH_REGISTRY.get(text_mt)
        if spec_cls is not None:
            model_type = text_mt
            hf_cfg = {**hf_cfg, "model_type": text_mt}
    if spec_cls is None:
        raise NotImplementedError(f"unsupported model_type {model_type!r}")
    spec = spec_cls(hf_cfg)
    spec.model_dir = model_dir  # pooling/tokenizer sidecar lookups (bert)

    quant_layers = artifacts.list_layers(quant_dir)

    writer = GGUFWriter(out_path)
    for k, v in spec.metadata().items():
        writer.add_kv(k, v)
    for k, v in tokenizer_metadata(model_dir, model_type).items():
        writer.add_kv(k, v)
    for k, v in (extra_metadata or {}).items():
        writer.add_kv(k, v)

    if vocab_only:
        # metadata + vocab, zero tensors (reference --vocab-only flag)
        writer.add_kv("general.file_type", FILE_TYPE_IDS.get(default_float, 1))
        writer.write()
        return Path(out_path)

    spec_extras = list(spec.extra_tensors())

    # llama3-rope models need the per-dim frequency-factor tensor (unless
    # the arch spec generates its own, e.g. deci's per-layer variant)
    rs = dict(hf_cfg.get("rope_scaling") or {})
    if rs.get("rope_type", rs.get("type")) == "llama3" and not any(
            n == "rope_freqs.weight" for n, _ in spec_extras):
        from ..models import llama as llama_mod

        cfg_ = llama_mod.LlamaConfig.from_hf_dict(hf_cfg)
        hd = cfg_.head_dim_
        base_inv = 1.0 / (cfg_.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
        corrected, _ = llama_mod._rope_params(cfg_)
        writer.add_tensor(
            "rope_freqs.weight", (base_inv / corrected).astype(np.float32)
        )

    for ename, earr in spec_extras:
        writer.add_tensor(ename, earr)

    type_counts: Dict[GGMLQuantizationType, int] = {}
    seen_embed: Optional[np.ndarray] = None
    has_lm_head = False

    def add_quantized(gguf_name: str, hf_name: str, art: artifacts.LayerArtifact):
        perm = spec.row_permutation(hf_name, art.qweight.shape[0])
        if perm is not None:
            art = _permute_artifact(art, perm)
        blocks = convert.pack_layer(
            art.qweight,
            art.super_group_scale,
            art.group_scale_quant,
            art.super_group_zero,
            art.group_zero_quant,
            art.q_type,
        )
        writer.add_tensor(
            gguf_name, blocks, raw_dtype=art.q_type, raw_shape=art.qweight.shape
        )
        type_counts[art.q_type] = type_counts.get(art.q_type, 0) + 1

    def add_float(gguf_name: str, hf_name: str, arr: np.ndarray):
        arr = spec.transform_float(gguf_name, _to_f32(arr))
        perm = spec.row_permutation(hf_name, arr.shape[0])
        if perm is not None:
            arr = arr[perm]
        is_norm = (gguf_name.endswith("_norm.weight") or arr.ndim == 1
                   or ".ssm_a" in gguf_name or ".ssm_d" in gguf_name
                   or ".ssm_conv1d" in gguf_name or ".ssm_dt" in gguf_name
                   or ".ssm_norm" in gguf_name)
        if is_norm or default_float == GGMLQuantizationType.F32:
            writer.add_tensor(gguf_name, arr.astype(np.float32))
        elif default_float == GGMLQuantizationType.BF16:
            import ml_dtypes

            writer.add_tensor(gguf_name, arr.astype(ml_dtypes.bfloat16))
        elif (default_float == GGMLQuantizationType.Q8_0
              and arr.ndim == 2 and arr.shape[-1] % 32 == 0):
            blocks = ggml.quantize_q8_0(
                arr.astype(np.float32).reshape(-1, 32))
            writer.add_tensor(gguf_name, blocks,
                              raw_dtype=GGMLQuantizationType.Q8_0,
                              raw_shape=arr.shape)
        else:
            writer.add_tensor(gguf_name, arr.astype(np.float16))

    fused_map = getattr(spec, "fused", {})

    # MoE expert stacking: collect per-expert HF tensors, emit one stacked
    # (n_expert, rows, cols) GGUF tensor once all experts arrived.
    expert_acc: Dict[str, Dict[int, np.ndarray]] = {}

    def flush_experts(gguf_name: str, art_tpl) -> None:
        n_e = spec.n_expert
        acc = expert_acc.pop(gguf_name)
        assert len(acc) == n_e, f"{gguf_name}: {len(acc)}/{n_e} experts seen"
        if art_tpl is None:  # per-expert biases: always float32
            writer.add_tensor(
                gguf_name,
                np.stack([_to_f32(acc[e]) for e in range(n_e)]).astype(np.float32),
            )
            return
        art_names = [art_tpl.format(e=e) for e in range(n_e)]
        if all(a in quant_layers for a in art_names):
            arts = [artifacts.load_layer(quant_dir, a) for a in art_names]
            art = concat_artifacts(arts)
            rows, cols = arts[0].qweight.shape
            blocks = convert.pack_layer(
                art.qweight, art.super_group_scale, art.group_scale_quant,
                art.super_group_zero, art.group_zero_quant, art.q_type,
            )
            writer.add_tensor(gguf_name, blocks, raw_dtype=art.q_type,
                              raw_shape=(n_e, rows, cols))
            type_counts[art.q_type] = type_counts.get(art.q_type, 0) + 1
        else:
            stacked = np.stack([_to_f32(acc[e]) for e in range(n_e)])
            dt = np.float32 if default_float == GGMLQuantizationType.F32 else np.float16
            writer.add_tensor(gguf_name, stacked.astype(dt))

    from ..models.adapters import iter_canonical_tensors

    # sibling adapter GGUFs (jina-v3 LoRA tasks, reference :4996-5006)
    sidecar_writers: Dict[str, GGUFWriter] = {}
    sidecar_paths: Dict[str, Path] = {}
    for key, (prefix, md) in (getattr(spec, "sidecars", dict)() or {}).items():
        out_p = Path(out_path)
        sp = out_p.with_name(prefix + out_p.name)
        sidecar_paths[key] = sp
        w = GGUFWriter(sp)
        for k, v in md.items():
            w.add_kv(k, v)
        sidecar_writers[key] = w

    for name, arr in iter_canonical_tensors(_iter_safetensors(model_dir), hf_cfg):
        if sidecar_writers:
            routed = spec.sidecar_tensors(name, _to_f32(arr))
            if routed:
                for key, gname, data in routed:
                    sidecar_writers[key].add_tensor(
                        gname, data.astype(np.float32))
                continue
        exp = spec.expert_tensor(name) if isinstance(spec, MoEArchSpec) else None
        if exp is not None:
            gguf_exps, e_idx, art_tpl = exp
            acc = expert_acc.setdefault(gguf_exps, {})
            acc[e_idx] = arr
            if len(acc) == spec.n_expert:
                flush_experts(gguf_exps, art_tpl)
            continue
        special = spec.special_tensors(
            name, _to_f32(arr),
            lambda b: artifacts.load_layer(quant_dir, b) if b in quant_layers else None,
        )
        if special is not None:
            for item in special:
                if item[0] == "quant":
                    _, gname, art, shape = item
                    blocks = convert.pack_layer(
                        art.qweight, art.super_group_scale, art.group_scale_quant,
                        art.super_group_zero, art.group_zero_quant, art.q_type,
                    )
                    writer.add_tensor(gname, blocks, raw_dtype=art.q_type,
                                      raw_shape=shape)
                    type_counts[art.q_type] = type_counts.get(art.q_type, 0) + 1
                else:
                    _, gname, payload = item
                    writer.add_tensor(gname, payload)
            continue
        gguf_name = spec.tensor_name(name)
        # fused architectures (phi3): HF holds qkv_proj/gate_up_proj fused,
        # artifacts hold the split projections; reassemble quantized parts.
        if gguf_name is None and name.startswith("model.layers.") and fused_map:
            parts = name.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            fused_src = {"self_attn.qkv_proj.weight": "attn_qkv.weight",
                         "mlp.gate_up_proj.weight": "ffn_up.weight"}
            if rest in fused_src and fused_src[rest] in fused_map:
                gguf_fused = f"blk.{i}.{fused_src[rest]}"
                sub_names = [f"model.layers.{i}.{s}" for s in fused_map[fused_src[rest]]]
                if all(s in quant_layers for s in sub_names):
                    art = concat_artifacts(
                        [artifacts.load_layer(quant_dir, s) for s in sub_names]
                    )
                    add_quantized(gguf_fused, name, art)
                else:
                    add_float(gguf_fused, name, arr)
                continue
        if gguf_name is None:
            continue
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        if name == "model.embed_tokens.weight":
            seen_embed = arr
        if name == "lm_head.weight":
            has_lm_head = True
        if name.endswith(".weight") and base in quant_layers:
            add_quantized(gguf_name, name, artifacts.load_layer(quant_dir, base))
        else:
            add_float(gguf_name, name, arr)

    if expert_acc:
        missing = {k: len(v) for k, v in expert_acc.items()}
        raise ValueError(f"incomplete MoE expert sets at end of checkpoint: {missing}")

    # tied embeddings: llama.cpp needs output.weight; reuse token_embd
    if not has_lm_head and hf_cfg.get("tie_word_embeddings") and seen_embed is not None:
        if "lm_head" in quant_layers:
            add_quantized("output.weight", "lm_head.weight", artifacts.load_layer(quant_dir, "lm_head"))
        else:
            add_float("output.weight", "lm_head.weight", seen_embed)

    for k, v in spec.final_metadata().items():
        writer.add_kv(k, v)
    dominant = max(type_counts, key=type_counts.get) if type_counts else default_float
    writer.add_kv("general.file_type", FILE_TYPE_IDS.get(dominant, 1))
    writer.write()
    for key, w in sidecar_writers.items():
        w.write()
        print(f"wrote adapter {sidecar_paths[key]}")
    return Path(out_path)
