"""Functional JAX decoder model (Llama family).

The reference drives HF transformers modules with forward hooks and in-place
weight surgery (quant/gptq/src/quantizer.py, evopress/src/model_utils.py).
The TPU-native design replaces that with a *pure-function* model over a param
pytree: calibration captures activations by calling the block function
explicitly (no hooks), weight swaps are functional pytree updates (donated
buffers under jit), and the same block function is reused by the quantizer
walk, perplexity eval, EvoPress fitness, and serving.

One parameterized implementation covers the Llama lineage the reference's
search/eval stack supports (llama/mistral/qwen2/qwen3/phi3-style: RMSNorm +
RoPE GQA attention + SwiGLU, optional attention bias, optional q/k norms,
tied embeddings) plus the gemma2 family (dual norms, softcaps, sliding
window). GGUF-export name mapping per architecture lives in the
``export/packer.py`` ArchSpec registry.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _freeze_value(v):
    """Nested dict/list -> hashable item-tuples (LlamaConfig is a jit static
    argument, so every field must hash)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze_value(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze_value(x) for x in v)
    return v


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False  # qwen3-style per-head q/k RMSNorm
    rope_scaling: Optional[Dict[str, Any]] = None
    # gemma2-family knobs
    arch: str = "llama"
    rms_add_unit: bool = False  # RMSNorm uses (1 + w) (gemma)
    embed_scale: bool = False  # scale embeddings by sqrt(hidden)
    act_fn: str = "silu"  # silu | gelu_tanh
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    # scalar multipliers (granite mup knobs / minicpm depth-and-width scaling)
    embedding_multiplier: Optional[float] = None  # x *= m after embedding
    attention_scale: Optional[float] = None  # direct score scale (not 1/sqrt(hd))
    residual_multiplier: Optional[float] = None  # branch *= m before residual add
    logits_multiplier: Optional[float] = None  # logits *= m before softcap
    # HF model_type (drives per-family checkpoint-name canonicalization)
    model_type: str = "llama"
    # layernorm-family archs (stablelm/starcoder2/nemotron/cohere/phi):
    # mean-subtracting LayerNorm (biases live in the param dict as
    # *_bias keys); rms_add_unit doubles as nemotron's layernorm1p (1+w)
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    # rotate only the first partial_rotary_factor*head_dim dims (stablelm
    # 0.25, phi/nemotron 0.5); 1.0 = full rotary
    partial_rotary_factor: float = 1.0
    # GPT-J/cohere-style interleaved rope pairing (x[::2], x[1::2])
    rope_interleaved: bool = False
    # cohere/phi parallel residual: x + attn(norm(x)) + mlp(norm(x))
    parallel_blocks: bool = False
    sliding_window: Optional[int] = None
    sliding_pattern: int = 2  # every Nth layer is global (gemma2: odd layers)
    # explicit per-layer sliding flags (gemma3 layer_types); overrides the
    # modulo pattern when set
    sliding_layers: Optional[Tuple[bool, ...]] = None
    # gemma3: local (sliding) layers use a different rope base, no scaling
    rope_local_theta: Optional[float] = None
    # cohere2/exaone4 hybrid attention: rope ONLY on sliding layers (global
    # layers are NoPE)
    rope_sliding_only: bool = False
    # smollm3: explicit per-layer rope flags (False = NoPE layer)
    rope_layers: Optional[Tuple[bool, ...]] = None
    # olmo (v1): clamp q/k/v projections to [-clip, clip]
    clip_qkv: Optional[float] = None
    # hunyuan: per-head q/k RMSNorm applied AFTER rope
    qk_norm_after_rope: bool = False
    # positional encoding: "rope" | "learned" (gpt2 wpe) | "alibi" (bloom/mpt)
    pos_type: str = "rope"
    # MoE (qwen2moe/qwen3moe/mixtral); a layer is sparse iff its param dict
    # has "gate_inp" (mixed dense/sparse stacks are shape-driven)
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_norm_topk: bool = True
    moe_intermediate_size: Optional[int] = None
    # deepseek-family routing: sigmoid scoring (v3 noaux-tc), group-limited
    # expert choice over n_group groups keeping topk_group, and a scalar
    # weight multiplier (routed_scaling_factor)
    moe_scoring: str = "softmax"  # "softmax" | "sigmoid"
    moe_n_group: Optional[int] = None
    moe_topk_group: Optional[int] = None
    moe_group_method: str = "max"  # per-group score: "max" (v2) | "top2sum" (v3)
    moe_routed_scale: Optional[float] = None
    # MLA (deepseek_v2/v3): low-rank q/kv compression. Attention runs as MHA
    # with qk head dim = qk_nope + qk_rope and separate v_head_dim values;
    # kv_lora_rank set <=> MLA layers
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    dtype: Any = jnp.float32

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rope_dim(self) -> int:
        """Rotated dims per head (HF rotary_ndims)."""
        if self.kv_lora_rank:  # MLA: rope hits only the qk_rope split
            return self.qk_rope_head_dim
        return int(self.head_dim_ * self.partial_rotary_factor)

    @staticmethod
    def from_hf_dict(d: Dict[str, Any], dtype=jnp.float32) -> "LlamaConfig":
        """Build from a HF transformers config.json dict."""
        rs_raw = d.get("rope_scaling")
        if rs_raw and "original_max_position_embeddings" not in rs_raw and \
                d.get("original_max_position_embeddings"):
            # phi3 keeps the pre-extension length at config top level
            rs_raw = {**rs_raw,
                      "original_max_position_embeddings": d["original_max_position_embeddings"]}
        rope_scaling = _freeze_value(rs_raw)
        mt = d.get("model_type", "llama")
        # legacy GPT-family key normalization (reference converter key
        # aliases: n_embd/n_layer/n_head/n_positions, bloom n_embed/n_layer,
        # mpt d_model/n_layers/n_heads/max_seq_len)
        if mt in ("gpt2", "gptj"):
            d = {**d, "hidden_size": d["n_embd"],
                 "num_hidden_layers": d["n_layer"],
                 "num_attention_heads": d["n_head"],
                 "max_position_embeddings": d.get(
                     "n_positions", d.get("n_ctx", 1024)),
                 "intermediate_size": d.get("n_inner") or 4 * d["n_embd"],
                 "rms_norm_eps": d.get("layer_norm_epsilon", 1e-5)}
        elif mt == "bloom":
            hid = d.get("hidden_size", d.get("n_embed"))
            d = {**d, "hidden_size": hid,
                 "num_hidden_layers": d.get("num_hidden_layers", d.get("n_layer")),
                 "num_attention_heads": d.get(
                     "num_attention_heads", d.get("n_head")),
                 "max_position_embeddings": d.get("seq_length", 2048),
                 "intermediate_size": 4 * hid,
                 "rms_norm_eps": d.get("layer_norm_epsilon", 1e-5)}
        elif mt == "gpt_bigcode":
            d = {**d, "hidden_size": d["n_embd"],
                 "num_hidden_layers": d["n_layer"],
                 "num_attention_heads": d["n_head"],
                 "num_key_value_heads": 1 if d.get("multi_query", True)
                 else d["n_head"],
                 "max_position_embeddings": d.get("n_positions", 1024),
                 "intermediate_size": d.get("n_inner") or 4 * d["n_embd"],
                 "rms_norm_eps": d.get("layer_norm_epsilon", 1e-5)}
        elif mt == "dbrx":
            attn_c = d.get("attn_config") or {}
            ffn_c = d.get("ffn_config") or {}
            d = {**d, "hidden_size": d["d_model"],
                 "num_hidden_layers": d["n_layers"],
                 "num_attention_heads": d["n_heads"],
                 "num_key_value_heads": attn_c.get("kv_n_heads", d["n_heads"]),
                 "max_position_embeddings": d.get("max_seq_len", 2048),
                 "intermediate_size": ffn_c.get("ffn_hidden_size"),
                 "moe_intermediate_size": ffn_c.get("ffn_hidden_size"),
                 "rope_theta": attn_c.get("rope_theta", 10000.0),
                 "clip_qkv_": attn_c.get("clip_qkv"),
                 "num_experts": ffn_c.get("moe_num_experts"),
                 "num_experts_per_tok": ffn_c.get("moe_top_k", 2),
                 "rms_norm_eps": 1e-5}
        elif mt == "mpt":
            d = {**d, "hidden_size": d["d_model"],
                 "num_hidden_layers": d["n_layers"],
                 "num_attention_heads": d["n_heads"],
                 "max_position_embeddings": d.get("max_seq_len", 2048),
                 "intermediate_size": d.get("expansion_ratio", 4) * d["d_model"],
                 "rms_norm_eps": d.get("layer_norm_epsilon", 1e-5)}
        gemma_like = mt in ("gemma", "gemma2", "gemma3_text")
        sliding_layers = None
        if d.get("layer_types"):
            sliding_layers = tuple(
                t == "sliding_attention" for t in d["layer_types"]
            )
        elif mt == "gemma3_text":
            pat = d.get("sliding_window_pattern", 6)
            sliding_layers = tuple(
                bool((i + 1) % pat) for i in range(d["num_hidden_layers"])
            )
        elif mt == "exaone4" and d.get("sliding_window_pattern") is not None:
            pat = d["sliding_window_pattern"]
            if isinstance(pat, str):  # e.g. "LLLG"
                sliding_layers = tuple(
                    pat[i % len(pat)] == "L" for i in range(d["num_hidden_layers"])
                )
            else:
                sliding_layers = tuple(
                    (i + 1) % pat != 0 for i in range(d["num_hidden_layers"])
                )
        moe_experts = d.get(
            "num_experts", d.get("num_local_experts", d.get(
                "n_routed_experts", d.get("moe_num_experts")))
        )
        n_layers = d.get("num_hidden_layers", d.get("num_layers"))
        norm_type = "rmsnorm"
        add_unit = gemma_like
        partial_rotary = 1.0
        rope_interleaved = False
        parallel_blocks = False
        act = "gelu_tanh" if gemma_like else "silu"
        if mt == "stablelm":
            norm_type = "layernorm"
            partial_rotary = d.get("partial_rotary_factor", 0.25)
            parallel_blocks = bool(d.get("use_parallel_residual", False))
            if d.get("qk_layernorm"):
                raise NotImplementedError("stablelm qk_layernorm")
        elif mt == "starcoder2":
            norm_type = "layernorm"
            act = "gelu_tanh"
        elif mt == "nemotron":
            norm_type = "layernorm"
            add_unit = True  # layernorm1p: (1 + w)
            act = "relu2"
            partial_rotary = d.get("partial_rotary_factor", 0.5)
        elif mt == "cohere":
            norm_type = "layernorm"  # no bias
            parallel_blocks = True
            rope_interleaved = True
            if d.get("use_qk_norm"):
                raise NotImplementedError("cohere use_qk_norm")
        elif mt == "phi":
            norm_type = "layernorm"
            parallel_blocks = True
            act = "gelu_tanh"  # gelu_new == tanh approximation
            partial_rotary = d.get("partial_rotary_factor", 0.5)
            if d.get("qk_layernorm"):
                raise NotImplementedError("phi qk_layernorm")
        elif mt in ("glm", "glm4"):
            # GLM-4-0414 family: interleaved partial rope (0.5 of head_dim),
            # q/k/v bias, fused gate_up MLP (split at load); glm4 adds
            # gemma2-style sandwich norms (canonicalized to the gemma2 keys)
            partial_rotary = d.get("partial_rotary_factor", 0.5)
            rope_interleaved = True
        elif mt == "cohere2":
            # command-r7b: cohere parallel-LayerNorm blocks + hybrid sliding
            # attention where only sliding layers get rope (NoPE global)
            norm_type = "layernorm"
            parallel_blocks = True
            rope_interleaved = True
        elif mt == "olmo":
            # olmo (v1): NON-parametric LayerNorm (loader synthesizes unit
            # weights), optional clip_qkv clamp
            norm_type = "layernorm"
        elif mt == "arcee":
            act = "relu2"  # AFM: gateless relu^2 MLP
        elif mt == "ernie4_5":
            rope_interleaved = True  # glm-style interleaved rope, full dim
        elif mt == "gpt_oss":
            act = "swiglu_oai"  # clamped glu with (up + 1) carry
        elif mt == "falcon":
            if d.get("alibi"):
                raise NotImplementedError("falcon alibi positional encoding")
            norm_type = "layernorm"
            act = "gelu"  # exact erf gelu
            parallel_blocks = bool(d.get("parallel_attn", True)) or bool(
                d.get("new_decoder_architecture", False)
            )
        elif mt in ("hunyuan_v1_dense", "hunyuan_v1_moe"):
            if not isinstance(d.get("num_experts", 1), int) or \
                    not isinstance(d.get("moe_topk", 1), int):
                raise NotImplementedError("hunyuan per-layer expert lists")
        elif mt == "gpt_neox":
            norm_type = "layernorm"
            act = "gelu_tanh" if "new" in d.get("hidden_act", "gelu") else "gelu"
            partial_rotary = d.get("rotary_pct", 1.0)
            parallel_blocks = bool(d.get("use_parallel_residual", True))
        elif mt == "gptj":
            norm_type = "layernorm"
            act = "gelu_tanh"  # gelu_new
            parallel_blocks = True  # single ln_1 feeds both branches
            rope_interleaved = True  # rotate_every_two
            hd_ = d["hidden_size"] // d["num_attention_heads"]
            partial_rotary = (d.get("rotary_dim") or hd_) / hd_
        elif mt == "gpt2":
            norm_type = "layernorm"
            act = "gelu_tanh"  # gelu_new
        elif mt == "bloom":
            norm_type = "layernorm"
            act = "gelu_tanh"  # BloomGelu is the tanh approximation
        elif mt == "mpt":
            norm_type = "layernorm"
            act = "gelu"
            if not (d.get("attn_config") or {}).get("alibi", True):
                raise NotImplementedError("mpt without alibi (learned pos)")
        elif mt == "gpt_bigcode":
            norm_type = "layernorm"
            act = "gelu_tanh"  # gelu_pytorch_tanh
        elif mt == "dbrx":
            norm_type = "layernorm"
        mla = {}
        moe_ds = {}
        if mt in ("glm4_moe", "dots1"):
            # GLM-4.5/4.6 MoE and dots.llm1: half-split rope (partial for
            # glm4_moe, full for dots1) + deepseek-v3-style sigmoid router
            # with correction bias and (optionally) group-limited choice
            if mt == "glm4_moe":
                partial_rotary = d.get("partial_rotary_factor", 0.5)
            moe_ds = dict(
                moe_scoring="sigmoid",
                moe_routed_scale=d.get("routed_scaling_factor"),
                moe_group_method="top2sum",
            )
            if d.get("n_group", 1) > 1:
                moe_ds.update(moe_n_group=d["n_group"],
                              moe_topk_group=d.get("topk_group", 1))
        elif mt == "ernie4_5_moe":
            rope_interleaved = True  # glm-style rope (same as ernie4_5 dense)
        if mt in ("deepseek_v2", "deepseek_v3"):
            rope_interleaved = True  # HF v2 complex rope / v3 rope_interleave
            mla = dict(
                q_lora_rank=d.get("q_lora_rank"),
                kv_lora_rank=d["kv_lora_rank"],
                qk_rope_head_dim=d["qk_rope_head_dim"],
                qk_nope_head_dim=d["qk_nope_head_dim"],
                v_head_dim=d["v_head_dim"],
            )
            # v3 always routes group-limited over sigmoid scores with the
            # e_score_correction bias; v2 uses softmax with greedy or
            # group-limited-greedy (group score = max) and IGNORES
            # norm_topk_prob (HF modeling_deepseek_v2.DeepseekV2MoEGate)
            if mt == "deepseek_v3":
                moe_ds = dict(
                    moe_scoring="sigmoid",
                    moe_n_group=d.get("n_group", 1),
                    moe_topk_group=d.get("topk_group", 1),
                    moe_group_method="top2sum",
                    moe_routed_scale=d.get("routed_scaling_factor"),
                )
            else:
                moe_ds = dict(
                    moe_routed_scale=d.get("routed_scaling_factor"),
                )
                if d.get("topk_method") == "group_limited_greedy":
                    moe_ds.update(
                        moe_n_group=d.get("n_group", 1),
                        moe_topk_group=d.get("topk_group", 1),
                        moe_group_method="max",
                    )
        emb_mult = attn_scale = res_mult = logit_mult = None
        if mt in ("granite", "granitemoe", "granitemoeshared"):
            emb_mult = d.get("embedding_multiplier")
            attn_scale = d.get("attention_multiplier")
            res_mult = d.get("residual_multiplier")
            if d.get("logits_scaling"):
                logit_mult = 1.0 / float(d["logits_scaling"])
        elif mt in ("cohere", "cohere2"):
            logit_mult = d.get("logit_scale")  # multiplier semantics
        elif mt == "minicpm":
            emb_mult = d.get("scale_emb")
            if d.get("scale_depth"):
                res_mult = float(d["scale_depth"]) / math.sqrt(n_layers)
            if d.get("dim_model_base"):
                logit_mult = float(d["dim_model_base"]) / d["hidden_size"]
        if mla:
            # MLA softmax scale: qk_head_dim^-0.5; v3 additionally folds the
            # yarn mscale^2 (HF DeepseekV3Attention.__init__)
            qk_hd = mla["qk_nope_head_dim"] + mla["qk_rope_head_dim"]
            attn_scale = qk_hd ** -0.5
            rsd = dict(rs_raw or {})
            if mt == "deepseek_v3" and rsd.get("mscale_all_dim") and \
                    rsd.get("factor", 1.0) > 1:
                m = 0.1 * rsd["mscale_all_dim"] * math.log(rsd["factor"]) + 1.0
                attn_scale = attn_scale * m * m
        return LlamaConfig(
            **mla,
            **moe_ds,
            model_type=mt,
            embedding_multiplier=emb_mult,
            attention_scale=attn_scale,
            residual_multiplier=res_mult,
            logits_multiplier=logit_mult,
            moe_num_experts=moe_experts,
            moe_top_k=d.get("num_experts_per_tok", d.get(
                "moe_k", d.get("moe_topk", 2))),
            # HF qwen2moe/qwen3moe expose norm_topk_prob; mixtral/granitemoe
            # always renormalize (granitemoe's softmax-over-topk-logits is
            # mathematically the same); ernie renormalizes with a clamp;
            # HF deepseek_v2's gate ignores the flag entirely
            moe_norm_topk=bool(d.get(
                "norm_topk_prob",
                mt in ("mixtral", "granitemoe", "granitemoeshared",
                       "ernie4_5_moe", "gpt_oss", "hunyuan_v1_moe", "dbrx"),
            )) and mt != "deepseek_v2",
            moe_intermediate_size=d.get("moe_intermediate_size"),
            arch="gemma2" if mt == "gemma2" else "llama",
            rms_add_unit=add_unit,
            embed_scale=gemma_like,
            act_fn=act,
            norm_type=norm_type,
            partial_rotary_factor=partial_rotary,
            rope_interleaved=rope_interleaved,
            parallel_blocks=parallel_blocks,
            attn_logit_softcap=d.get("attn_logit_softcapping"),
            final_logit_softcap=d.get("final_logit_softcapping"),
            query_pre_attn_scalar=d.get("query_pre_attn_scalar"),
            sliding_window=(
                d.get("sliding_window")
                if mt in ("gemma2", "gemma3_text", "cohere2", "exaone4",
                          "gpt_oss") else None
            ),
            sliding_layers=(
                sliding_layers
                if mt in ("gemma2", "gemma3_text", "cohere2", "exaone4",
                          "gpt_oss") else None
            ),
            rope_sliding_only=mt in ("cohere2", "exaone4"),
            clip_qkv=d.get("clip_qkv") if mt == "olmo" else (
                (d.get("attn_config") or {}).get("clip_qkv")
                if mt == "mpt" else d.get("clip_qkv_") if mt == "dbrx"
                else None
            ),
            pos_type=("learned" if mt in ("gpt2", "gpt_bigcode")
                      else "alibi" if mt in ("bloom", "mpt") else "rope"),
            rope_layers=(
                tuple(bool(x) for x in (
                    d.get("no_rope_layers")
                    or [int((i + 1) % d.get("no_rope_layer_interval", 4) != 0)
                        for i in range(n_layers)]
                )) if mt == "smollm3" else None
            ),
            rope_local_theta=(
                d.get("rope_local_base_freq") if mt == "gemma3_text" else None
            ),
            qk_norm=mt in ("qwen3", "qwen3_moe", "gemma3_text", "olmo2",
                           "olmoe", "exaone4")
            or mt in ("dots1", "hunyuan_v1_dense", "hunyuan_v1_moe")
            or (mt == "glm4_moe" and bool(d.get("use_qk_norm"))),
            qk_norm_after_rope=mt in ("hunyuan_v1_dense", "hunyuan_v1_moe"),
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            # falcon has no intermediate_size key: ffn = 4*hidden
            intermediate_size=d.get("intermediate_size", 4 * d["hidden_size"]),
            num_hidden_layers=n_layers,
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=(
                (d.get("num_kv_heads") if d.get("new_decoder_architecture")
                 else (1 if d.get("multi_query", True) else d["num_attention_heads"]))
                if mt == "falcon"
                else d.get("num_key_value_heads", d["num_attention_heads"])
            ),
            head_dim=d.get("head_dim"),
            # norm-eps key aliases: exaone layer_norm_epsilon, stablelm/
            # cohere/phi layer_norm_eps, starcoder2 norm_epsilon, nemotron
            # norm_eps
            rms_norm_eps=d.get("rms_norm_eps", d.get(
                "layer_norm_epsilon", d.get("layer_norm_eps", d.get(
                    "norm_epsilon", d.get("norm_eps", 1e-5))))),
            rope_theta=d.get("rope_theta", 10000.0),
            # baichuan uses model_max_length
            max_position_embeddings=d.get(
                "max_position_embeddings", d.get("model_max_length", 4096)
            ),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            # bias-flag aliases: internlm2 "bias", starcoder2 "use_bias",
            # stablelm "use_qkv_bias"; phi always has qkv bias
            attention_bias=d.get("attention_bias", d.get("bias", d.get(
                "use_bias", d.get("use_qkv_bias", mt == "phi")))),
            mlp_bias=d.get("mlp_bias", False),
            rope_scaling=rope_scaling,
            dtype=dtype,
        )


# ---------------------------------------------------------------------------
# Parameter pytree
# ---------------------------------------------------------------------------

# Params structure (HF weight names in comments):
# {
#   "embed_tokens": (V, H)                  model.embed_tokens.weight
#   "layers": [ {
#       "input_layernorm": (H,),
#       "q_proj": (nH*hd, H), "k_proj": (nKV*hd, H), "v_proj": (nKV*hd, H),
#       "o_proj": (H, nH*hd),
#       ["q_bias"/"k_bias"/"v_bias"], ["q_norm"/"k_norm"],
#       "post_attention_layernorm": (H,),
#       "gate_proj": (I, H), "up_proj": (I, H), "down_proj": (H, I),
#   } ... ]
#   "norm": (H,), "lm_head": (V, H)  (absent if tied)
# }


def init_params(cfg: LlamaConfig, seed: int = 0) -> Dict[str, Any]:
    """Random init (for tests/benchmarks; real models come from the loader)."""
    rng = np.random.default_rng(seed)
    hd = cfg.head_dim_
    H = cfg.hidden_size

    def mat(rows, cols, scale=None):
        scale = scale or 1.0 / math.sqrt(cols)
        return jnp.asarray(
            (rng.standard_normal((rows, cols)) * scale).astype(np.float32),
            dtype=cfg.dtype,
        )

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layer = {
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "q_proj": mat(cfg.num_attention_heads * hd, H),
            "k_proj": mat(cfg.num_key_value_heads * hd, H),
            "v_proj": mat(cfg.num_key_value_heads * hd, H),
            "o_proj": mat(H, cfg.num_attention_heads * hd),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
            "gate_proj": mat(cfg.intermediate_size, H),
            "up_proj": mat(cfg.intermediate_size, H),
            "down_proj": mat(H, cfg.intermediate_size),
        }
        if cfg.attention_bias:
            layer["q_bias"] = jnp.zeros((cfg.num_attention_heads * hd,), cfg.dtype)
            layer["k_bias"] = jnp.zeros((cfg.num_key_value_heads * hd,), cfg.dtype)
            layer["v_bias"] = jnp.zeros((cfg.num_key_value_heads * hd,), cfg.dtype)
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((hd,), cfg.dtype)
            layer["k_norm"] = jnp.ones((hd,), cfg.dtype)
        layers.append(layer)

    params = {
        "embed_tokens": mat(cfg.vocab_size, H, scale=0.02),
        "layers": layers,
        "norm": jnp.ones((H,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = mat(cfg.vocab_size, H, scale=0.02)
    return params


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, add_unit: bool = False) -> jax.Array:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if add_unit:
        w = 1.0 + w  # gemma convention
    return (normed * w).astype(dt)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    eps: float,
    add_unit: bool = False,
) -> jax.Array:
    """Mean-subtracting LayerNorm; add_unit = nemotron layernorm1p (1+w)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if add_unit:
        w = 1.0 + w
    y = normed * w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


def apply_norm(
    x: jax.Array,
    cfg: LlamaConfig,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Config-selected norm (RMSNorm or LayerNorm with optional bias)."""
    if cfg.norm_type == "layernorm":
        return layer_norm(x, weight, bias, cfg.rms_norm_eps, cfg.rms_add_unit)
    return rms_norm(x, weight, cfg.rms_norm_eps, cfg.rms_add_unit)


def _rope_params(cfg: LlamaConfig, seq_len: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """(inv_freq, attention_scaling) following HF transformers'
    modeling_rope_utils for default/linear/llama3/yarn/longrope.

    seq_len selects longrope short vs long factors (HF switches at
    original_max_position_embeddings based on the live sequence length).

    Partial-rotary models (stablelm/phi/nemotron) build the tables over
    rope_dim = partial_rotary_factor * head_dim, exactly as HF's
    rotary_ndims."""
    hd = cfg.rope_dim
    base = cfg.rope_theta
    inv_freq = 1.0 / (base ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    rs = cfg.rope_scaling
    # configs store rope_scaling as a frozen item-tuple so LlamaConfig stays
    # hashable (jit static arg); accept plain dicts too
    rs = dict(rs) if rs is not None and not isinstance(rs, dict) else (rs or {})
    rope_type = rs.get("rope_type", rs.get("type"))
    scaling = 1.0
    if rope_type == "llama3":
        # HF Llama-3.1 rope scaling (transformers modeling_rope_utils)
        factor = rs["factor"]
        low_factor = rs["low_freq_factor"]
        high_factor = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_mid = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        inv_freq = np.where(is_mid, smoothed, scaled)
    elif rope_type in (None, "default", "mrope"):
        # mrope's frequency table is plain NeoX; the t/h/w position streams
        # are applied in mrope_cos_sin (text-only decoding uses equal
        # streams, which reduces exactly to NeoX rope)
        pass
    elif rope_type == "linear":
        inv_freq = inv_freq / rs["factor"]
    elif rope_type == "yarn":
        # HF _compute_yarn_parameters
        factor = rs["factor"]
        old_len = rs.get("original_max_position_embeddings",
                         cfg.max_position_embeddings)
        beta_fast = rs.get("beta_fast", 32.0)
        beta_slow = rs.get("beta_slow", 1.0)
        scaling = rs.get("attention_factor")
        if scaling is None:
            # deepseek-style mscale pair (HF _compute_yarn_parameters)
            def _get_mscale(scale, m=1.0):
                return 0.1 * m * math.log(scale) + 1.0 if scale > 1 else 1.0

            if rs.get("mscale") and rs.get("mscale_all_dim"):
                scaling = _get_mscale(factor, rs["mscale"]) / _get_mscale(
                    factor, rs["mscale_all_dim"]
                )
            else:
                scaling = _get_mscale(factor)

        def corr_dim(num_rot):
            return (hd * math.log(old_len / (num_rot * 2 * math.pi))) / (
                2 * math.log(base)
            )

        if rs.get("truncate", True):
            low = max(math.floor(corr_dim(beta_fast)), 0)
            high = min(math.ceil(corr_dim(beta_slow)), hd - 1)
        else:  # gpt-oss: fractional correction range (truncate=False)
            low = max(corr_dim(beta_fast), 0)
            high = min(corr_dim(beta_slow), hd - 1)
        if low == high:
            high += 0.001
        ramp = np.clip((np.arange(hd // 2, dtype=np.float64) - low) / (high - low), 0, 1)
        mask = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1 - mask) + inv_freq * mask
    elif rope_type == "longrope":
        # HF _compute_longrope_parameters (phi3 long/short factors)
        old_len = rs.get("original_max_position_embeddings",
                         cfg.max_position_embeddings)
        use_long = seq_len is not None and seq_len > old_len
        ext = np.asarray(
            rs["long_factor"] if use_long else rs["short_factor"], dtype=np.float64
        )
        factor = cfg.max_position_embeddings / old_len
        if rs.get("attention_factor") is not None:
            scaling = rs["attention_factor"]
        elif factor <= 1.0:
            scaling = 1.0
        else:
            scaling = math.sqrt(1 + math.log(factor) / math.log(old_len))
        inv_freq = 1.0 / (ext * base ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    elif rope_type == "gguf_factors":
        # frequency-factor tensor from a GGUF (rope_freqs.weight — llama.cpp
        # applies theta/freq_factor; the llama3 converter stores the
        # correction there, LlamaModel.generate_extra_tensors)
        inv_freq = inv_freq / np.asarray(rs["factors"], dtype=np.float64)
    else:
        raise NotImplementedError(f"rope_type {rope_type!r}")
    return inv_freq.astype(np.float32), float(scaling)


def _rope_inv_freq(cfg: LlamaConfig) -> np.ndarray:
    return _rope_params(cfg)[0]


def rope_cos_sin(
    cfg: LlamaConfig, positions: jax.Array, seq_len: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: (..., seq, head_dim)."""
    inv_freq_np, scaling = _rope_params(cfg, seq_len)
    inv_freq = jnp.asarray(inv_freq_np)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., rd/2)
    if cfg.rope_interleaved:
        emb = jnp.repeat(freqs, 2, axis=-1)  # cohere pairing (x0,x1),(x2,x3)..
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """GPT-J/cohere pairing: (x0,x1) -> (-x1,x0) per adjacent pair."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(q, k, cos, sin, interleaved: bool = False):
    """HF-convention RoPE. q/k: (B, n_heads, S, hd); cos/sin: (B, S, rd).

    rd < hd (partial rotary) rotates only the leading rd dims and passes the
    rest through, matching HF's rotary_ndims split."""
    rd = cos.shape[-1]
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    rot = _rotate_half_interleaved if interleaved else _rotate_half

    def one(x):
        if rd == x.shape[-1]:
            return x * cos + rot(x) * sin
        xr, xp = x[..., :rd], x[..., rd:]
        return jnp.concatenate([xr * cos + rot(xr) * sin, xp], axis=-1)

    return one(q).astype(q.dtype), one(k).astype(k.dtype)


def _linear(x, w, b=None):
    y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# KV-chunk size for the online-softmax attention; attention over contexts
# >= this length streams chunks instead of materializing (S, L) scores
FLASH_CHUNK = 512

# int4 KV group size: one symmetric f32 scale per KV_Q4_GROUP consecutive
# head-dim features (serving/model.KVCacheQ4)
KV_Q4_GROUP = 32


def dequant_kv_q4(codes: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Unpack a split-layout int4 KV chunk: (..., hd//2) u8 codes (low
    nibbles = first hd/2 features) + (..., hd//KV_Q4_GROUP) f32 group
    scales -> (..., hd) f32."""
    lo = (codes & 0xF).astype(jnp.int32) - 8
    hi = (codes >> 4).astype(jnp.int32) - 8
    w = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return w * jnp.repeat(scales, KV_Q4_GROUP, axis=-1)


def flash_attention(q, k, v, qpos, scale=None, logit_softcap=None, sinks=None,
                    sliding_window=None, chunk: int = FLASH_CHUNK,
                    dynamic_length: bool = False,
                    k_scale=None, v_scale=None):
    """Online-softmax (flash) attention over KV chunks.

    q: (B, nH, S, hd); k/v: (B, nKV, L, hd); qpos: (B, S) absolute position
    of each query (keys live at positions 0..L). Causal + optional sliding
    window masking; GQA via head grouping. Never materializes an (S, L)
    score tensor — peak memory is (S, chunk).

    dynamic_length=True iterates a while_loop up to the *live* maximum
    position instead of scanning the whole ring: HBM reads only the valid
    KV chunks (decode at fill f pays f, not capacity — the dominant KV
    saving for partially full caches).

    k_scale/v_scale: (B, nKV, L) per-entry dequantization scales for int8
    KV caches, or (B, nKV, L, hd // KV_Q4_GROUP) group scales for packed
    int4 caches (k/v then hold two codes per byte); chunks are dequantized
    in-register.
    """
    B, nH, S, hd = q.shape
    nKV, L = k.shape[1], k.shape[2]
    q4 = k_scale is not None and k_scale.ndim == 4
    # packed int4 stores hd/2 bytes; MLA's value head dim may differ from qk
    vd = v.shape[-1] * (2 if q4 else 1)
    G = nH // nKV
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    qg = (q.reshape(B, nKV, G, S, hd).astype(jnp.float32)) * scale

    n_chunks = -(-L // chunk)
    pad = n_chunks * chunk - L
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if k_scale is not None:
            spad = (((0, 0), (0, 0), (0, pad), (0, 0)) if q4
                    else ((0, 0), (0, 0), (0, pad)))
            k_scale = jnp.pad(k_scale, spad)
            v_scale = jnp.pad(v_scale, spad)

    m0 = jnp.full((B, nKV, G, S), -1e30, jnp.float32)
    l0 = jnp.zeros((B, nKV, G, S), jnp.float32)
    a0 = jnp.zeros((B, nKV, G, S, vd), jnp.float32)

    def step(carry_mla, kc, vc, kp, ksc=None, vsc=None):
        m, l, acc = carry_mla
        if q4:
            kc = dequant_kv_q4(kc, ksc)
            vc = dequant_kv_q4(vc, vsc)
        else:
            kc = kc.astype(jnp.float32)
            vc = vc.astype(jnp.float32)
            if ksc is not None:
                kc = kc * ksc[..., None]
                vc = vc * vsc[..., None]
        s = jnp.einsum("bkgsh,bkth->bkgst", qg, kc,
                       preferred_element_type=jnp.float32)
        if logit_softcap:
            s = logit_softcap * jnp.tanh(s / logit_softcap)
        valid = (kp[None, None, :] <= qpos[:, :, None]) & (kp[None, None, :] < L)
        if sliding_window:
            valid = valid & ((qpos[:, :, None] - kp[None, None, :]) < sliding_window)
        vmask = valid[:, None, None, :, :]  # (B,1,1,S,chunk)
        s = jnp.where(vmask, s, -1e30)
        m2 = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m2)
        p = jnp.where(vmask, jnp.exp(s - m2[..., None]), 0.0)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bkgst,bkth->bkgsh", p, vc,
            preferred_element_type=jnp.float32,
        )
        return m2, l, acc

    if dynamic_length:
        # read only chunks that hold a position <= max live qpos
        n_live = jnp.max(qpos) // chunk + 1

        def cond(state):
            return state[0] < n_live

        def body(state):
            c, m, l, acc = state
            kc = jax.lax.dynamic_slice_in_dim(k, c * chunk, chunk, axis=2)
            vc = jax.lax.dynamic_slice_in_dim(v, c * chunk, chunk, axis=2)
            kp = c * chunk + jnp.arange(chunk)
            ksc = vsc = None
            if k_scale is not None:
                ksc = jax.lax.dynamic_slice_in_dim(k_scale, c * chunk, chunk, axis=2)
                vsc = jax.lax.dynamic_slice_in_dim(v_scale, c * chunk, chunk, axis=2)
            m, l, acc = step((m, l, acc), kc, vc, kp, ksc, vsc)
            return c + 1, m, l, acc

        _, m, l, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), m0, l0, a0))
    else:
        ks = k.reshape(B, nKV, n_chunks, chunk, k.shape[-1]).transpose(2, 0, 1, 3, 4)
        vs = v.reshape(B, nKV, n_chunks, chunk, v.shape[-1]).transpose(2, 0, 1, 3, 4)
        kpos = jnp.arange(n_chunks * chunk).reshape(n_chunks, chunk)
        xs = (ks, vs, kpos)
        if k_scale is not None and q4:
            xs = xs + (
                k_scale.reshape(B, nKV, n_chunks, chunk, k_scale.shape[-1]
                                ).transpose(2, 0, 1, 3, 4),
                v_scale.reshape(B, nKV, n_chunks, chunk, v_scale.shape[-1]
                                ).transpose(2, 0, 1, 3, 4),
            )
        elif k_scale is not None:
            xs = xs + (
                k_scale.reshape(B, nKV, n_chunks, chunk).transpose(2, 0, 1, 3),
                v_scale.reshape(B, nKV, n_chunks, chunk).transpose(2, 0, 1, 3),
            )

        def body(carry, inp):
            return step(carry, *inp), None

        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), xs)
    if sinks is not None:  # gpt-oss attention sinks: extra softmax mass
        sk = sinks.astype(jnp.float32).reshape(nKV, G)[None, :, :, None]
        l = l + jnp.exp(sk - m)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out_dtype = v.dtype if k_scale is None else jnp.float32
    return out.reshape(B, nH, S, vd).astype(out_dtype)


def alibi_slopes(n_head: int) -> np.ndarray:
    """Standard ALiBi slope schedule (power-of-two geometric; non-power-of-2
    head counts interleave the doubled schedule, as in the ALiBi paper and
    HF bloom/mpt)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    n2 = 2 ** math.floor(math.log2(n_head))
    slopes = pow2_slopes(n2)
    if n2 != n_head:
        extra = pow2_slopes(2 * n2)
        slopes += extra[0::2][: n_head - n2]
    return np.asarray(slopes, np.float32)


def attention_scores(q, k, v, mask, scale=None, logit_softcap=None, sinks=None,
                     alibi=None, kpos=None):
    """Plain XLA attention; q (B,nH,S,hd), k/v (B,nKV,S,hd)."""
    B, nH, S, hd = q.shape
    nKV = k.shape[1]
    groups = nH // nKV
    q = q.reshape(B, nKV, groups, S, hd)
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    scores = jnp.einsum(
        "bkgsh,bkth->bkgst", q, k, preferred_element_type=jnp.float32
    ) * scale
    if alibi is not None:
        # per-key-position bias m_h * kpos (the per-query constant the
        # absolute form drops vs the relative form cancels in softmax)
        kp = kpos if kpos is not None else jnp.arange(k.shape[2])
        scores = scores + (
            alibi.reshape(nKV, groups)[None, :, :, None, None]
            * kp[None, None, None, None, :]
        )
    if logit_softcap:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    if sinks is None:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    else:  # gpt-oss: per-head sink logit joins the softmax denominator
        sk = sinks.astype(jnp.float32).reshape(nKV, groups)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1), sk)
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(-1) + jnp.exp(sk - m)
        probs = (e / denom[..., None]).astype(v.dtype)
    out = jnp.einsum("bkgst,bkth->bkgsh", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(B, nH, S, v.shape[-1])


def _act_only(x: jax.Array, cfg: LlamaConfig) -> jax.Array:
    x32 = x.astype(jnp.float32)
    if cfg.act_fn == "gelu_tanh":
        a = jax.nn.gelu(x32, approximate=True)
    elif cfg.act_fn == "gelu":  # falcon: exact erf gelu
        a = jax.nn.gelu(x32, approximate=False)
    elif cfg.act_fn == "relu2":  # nemotron squared ReLU
        r = jax.nn.relu(x32)
        a = r * r
    else:
        a = jax.nn.silu(x32)
    return a.astype(x.dtype)


def _mlp_act(gate: jax.Array, up: jax.Array, cfg: LlamaConfig) -> jax.Array:
    if cfg.act_fn == "swiglu_oai":  # gpt-oss clamped glu: (up+1)*g*sigmoid(a*g)
        g = jnp.clip(gate.astype(jnp.float32), None, 7.0)
        u = jnp.clip(up.astype(jnp.float32), -7.0, 7.0)
        glu = g * jax.nn.sigmoid(g * 1.702)
        return ((u + 1.0) * glu).astype(gate.dtype)
    return _act_only(gate, cfg) * up


def moe_route(h: jax.Array, layer: Dict[str, jax.Array], cfg: LlamaConfig,
              n_experts: int):
    """Router: (wmap (B,S,E) dense routing-weight map, topw, topi).

    Softmax (qwen/mixtral) or sigmoid (deepseek-v3) scoring; expert *choice*
    runs on bias-corrected / group-masked scores while the routing *weights*
    are gathered from the raw scores (HF deepseek_v3 TopkRouter; for softmax
    routers choice == scores so this is the ordinary top-k)."""
    B, S, _ = h.shape
    E = n_experts
    logits = jnp.einsum(
        "bsh,eh->bse", h.astype(jnp.float32), layer["gate_inp"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if "gate_inp_bias" in layer:  # gpt-oss biased router
        logits = logits + layer["gate_inp_bias"].astype(jnp.float32)
    if cfg.moe_scoring == "sigmoid":  # deepseek-v3 noaux-tc router
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    choice = scores
    if "gate_corr_bias" in layer:
        choice = scores + layer["gate_corr_bias"].astype(jnp.float32)
    if cfg.moe_n_group and cfg.moe_n_group > 1:
        ng = cfg.moe_n_group
        gsc = choice.reshape(B, S, ng, E // ng)
        if cfg.moe_group_method == "top2sum":  # v3: sum of top-2 per group
            gscore = jax.lax.top_k(gsc, 2)[0].sum(-1)
        else:  # v2 group_limited_greedy: max per group
            gscore = gsc.max(-1)
        gidx = jax.lax.top_k(gscore, cfg.moe_topk_group)[1]
        gmask = jax.nn.one_hot(gidx, ng, dtype=jnp.float32).sum(-2)  # (B,S,ng)
        choice = jnp.where(
            jnp.repeat(gmask, E // ng, axis=-1) > 0, choice, 0.0
        )
    topw, topi = jax.lax.top_k(choice, cfg.moe_top_k)
    topw = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.moe_norm_topk:
        eps = 1e-20 if cfg.moe_scoring == "sigmoid" else 0.0
        topw = topw / (topw.sum(-1, keepdims=True) + eps)
    if cfg.moe_routed_scale is not None:
        topw = topw * cfg.moe_routed_scale
    wmap = (jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None]).sum(-2)
    return wmap, topw, topi


def moe_ffn(
    h: jax.Array,
    layer: Dict[str, jax.Array],
    cfg: LlamaConfig,
    with_capture: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """Sparse-MoE FFN (qwen2moe/qwen3moe/mixtral routing semantics).

    h: (B, S, H). Router: softmax over all experts, top-k, optional
    renormalization (all three HF implementations share this order). Experts
    are evaluated with a lax.scan (dense math, sparse weighting) — exact and
    compiler-friendly; token-dropping dispatch is a serving optimization,
    not a numerics choice.

    with_capture additionally returns per-expert GPTQ Hessian contributions
    (the functional equivalent of the reference's per-expert forward hooks,
    quantizer.py:222-240 on an HF MoE model): Σ m_e h h^T over tokens routed
    to expert e, for the gate/up inputs and for the down inputs.
    """
    B, S, H = h.shape
    wg, wu, wd = layer["experts_gate"], layer["experts_up"], layer["experts_down"]
    E = wg.shape[0]
    wmap, _, _ = moe_route(h, layer, cfg, E)

    biased = "experts_gate_bias" in layer  # gpt-oss per-expert biases

    def body(acc, inputs):
        if biased:
            we_g, we_u, we_d, bg, bu, bd, we_w = inputs
        else:
            we_g, we_u, we_d, we_w = inputs
            bg = bu = bd = 0.0
        g = _linear(h, we_g) + bg
        u = _linear(h, we_u) + bu
        act = _mlp_act(g, u, cfg)
        d = _linear(act, we_d) + bd
        acc = acc + we_w[..., None].astype(d.dtype) * d
        if with_capture:
            m = (we_w > 0).astype(jnp.float32)  # routed mask (hook semantics)
            hm = h.astype(jnp.float32) * m[..., None]
            am = act.astype(jnp.float32) * m[..., None]
            xtx_in = jnp.einsum("bsh,bsi->hi", hm, hm,
                                preferred_element_type=jnp.float32)
            xtx_dn = jnp.einsum("bsh,bsi->hi", am, am,
                                preferred_element_type=jnp.float32)
            return acc, (xtx_in, xtx_dn, m.sum())
        return acc, None

    acc0 = jnp.zeros_like(h)
    xs = (wg, wu, wd) + (
        (layer["experts_gate_bias"], layer["experts_up_bias"],
         layer["experts_down_bias"]) if biased else ()
    ) + (wmap.transpose(2, 0, 1),)
    out, ys = jax.lax.scan(body, acc0, xs)

    caps: Optional[Dict[str, jax.Array]] = None
    if with_capture:
        caps = {
            "experts_in_xtx": ys[0],   # (E, H, H)
            "experts_down_xtx": ys[1],  # (E, I_e, I_e)
            "experts_tokens": ys[2],    # (E,)
        }

    if "shared_gate" in layer:
        g = _linear(h, layer["shared_gate"])
        u = _linear(h, layer["shared_up"])
        act = _mlp_act(g, u, cfg)
        shared = _linear(act, layer["shared_down"])
        if "shared_gate_inp" in layer:
            gate = jax.nn.sigmoid(
                jnp.einsum("bsh,oh->bso", h.astype(jnp.float32),
                           layer["shared_gate_inp"].astype(jnp.float32))
            )
            shared = shared * gate.astype(shared.dtype)
        out = out + shared
        if with_capture:
            caps["shared_down_in"] = act
    return out, caps


def is_sliding_layer(cfg: LlamaConfig, layer_idx: int) -> bool:
    """Does this layer use sliding-window attention?"""
    if not cfg.sliding_window:
        return False
    if cfg.sliding_layers is not None:
        return bool(cfg.sliding_layers[layer_idx])
    return layer_idx % cfg.sliding_pattern == 0


def select_rope(cos, sin, cfg: LlamaConfig, layer_idx: int):
    """Pick the (global, local) rope tables for a layer; cos/sin are either
    plain arrays or (global, local) pairs (gemma3 dual rope bases). For
    hybrid NoPE models (cohere2/exaone4) global layers get identity tables."""
    if isinstance(cos, tuple):
        if is_sliding_layer(cfg, layer_idx):
            return cos[1], sin[1]
        return cos[0], sin[0]
    if cfg.rope_sliding_only and cfg.sliding_window \
            and not is_sliding_layer(cfg, layer_idx):
        return jnp.ones_like(cos), jnp.zeros_like(sin)
    if cfg.rope_layers is not None and not cfg.rope_layers[layer_idx]:
        return jnp.ones_like(cos), jnp.zeros_like(sin)  # smollm3 NoPE layer
    return cos, sin


def rope_cos_sin_all(cfg: LlamaConfig, positions: jax.Array, seq_len=None):
    """cos/sin for the forward pass: a (global, local) pair when the config
    has a separate local rope base (gemma3), else plain arrays."""
    cos_g, sin_g = rope_cos_sin(cfg, positions, seq_len)
    if cfg.rope_local_theta is None:
        return cos_g, sin_g
    local_cfg = dataclasses.replace(
        cfg, rope_theta=cfg.rope_local_theta, rope_scaling=None
    )
    cos_l, sin_l = rope_cos_sin(local_cfg, positions, seq_len)
    return (cos_g, cos_l), (sin_g, sin_l)


def mrope_cos_sin(cfg: LlamaConfig, positions3: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """qwen2-vl multimodal rope: positions3 (3, B, S) carries the temporal/
    height/width position streams; each frequency dim takes the stream its
    mrope_section assigns it (HF apply_multimodal_rotary_pos_emb — the
    section list splits the rd/2 frequency dims, repeated for the
    duplicated half)."""
    inv_freq_np, scaling = _rope_params(cfg)
    rs = cfg.rope_scaling
    rs = dict(rs) if rs is not None and not isinstance(rs, dict) else (rs or {})
    sec = [int(s) for s in rs["mrope_section"]]
    idx_half = np.concatenate(
        [np.full(s, k, np.int32) for k, s in enumerate(sec)])
    assert idx_half.shape[0] == inv_freq_np.shape[0], \
        (idx_half.shape, inv_freq_np.shape)
    idx = jnp.asarray(np.concatenate([idx_half, idx_half]))  # (rd,)
    inv = jnp.asarray(inv_freq_np)
    freqs = positions3[..., None].astype(jnp.float32) * inv  # (3, B, S, rd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)           # (3, B, S, rd)
    sel = sum(emb[k] * (idx == k) for k in range(3))  # (B, S, rd)
    return jnp.cos(sel) * scaling, jnp.sin(sel) * scaling


def _sliding_mask(mask: jax.Array, window: int) -> jax.Array:
    S = mask.shape[-1]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return mask & ((qpos - kpos) < window)[None, :, :]


def block_capture(
    layer: Dict[str, jax.Array],
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cfg: LlamaConfig,
    layer_idx: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One transformer block, also returning the inputs of each quantizable
    linear (the functional replacement for the reference's forward hooks,
    quantizer.py:222-240). Returns (out, {"qkv": ..., "o": ..., "gateup":
    ..., "down": ...}); unused captures are DCE'd under jit.

    Covers llama/mistral/qwen2/qwen3 and gemma2 (extra pre/post norms,
    logit softcapping, sliding-window attention on even layers)."""
    B, S, H = x.shape
    hd = cfg.head_dim_
    nH, nKV = cfg.num_attention_heads, cfg.num_key_value_heads
    au = cfg.rms_add_unit

    sliding = is_sliding_layer(cfg, layer_idx)
    attn_mask = mask
    if sliding:
        attn_mask = _sliding_mask(mask, cfg.sliding_window)
    cos, sin = select_rope(cos, sin, cfg, layer_idx)

    # olmo2 is a post-norm variant: no input norms, q/k RMSNorm over the
    # whole projection, norms applied to sublayer outputs before the
    # residual adds (all shape-driven from the param dict)
    post_norm = "input_layernorm" not in layer
    h1 = x if post_norm else apply_norm(
        x, cfg, layer["input_layernorm"], layer.get("input_layernorm_bias")
    )
    if cfg.kv_lora_rank:
        return _mla_block(layer, x, h1, cos, sin, attn_mask, cfg)
    q = _linear(h1, layer["q_proj"], layer.get("q_bias"))
    k = _linear(h1, layer["k_proj"], layer.get("k_bias"))
    v = _linear(h1, layer["v_proj"], layer.get("v_bias"))
    if cfg.clip_qkv:  # olmo v1
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
    if cfg.qk_norm and layer["q_norm"].shape[0] != hd:  # flat olmo2-style
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
    q = q.reshape(B, S, nH, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, nKV, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, nKV, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm and not cfg.qk_norm_after_rope \
            and layer["q_norm"].shape[0] == hd:  # per-head
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
    if cfg.pos_type == "rope":
        q, k = apply_rope(q, k, cos, sin, cfg.rope_interleaved)
    if cfg.qk_norm and cfg.qk_norm_after_rope:  # hunyuan: norm AFTER rope
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, au)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, au)
    if cfg.attention_scale is not None:  # granite: direct score multiplier
        scale = cfg.attention_scale
    elif cfg.query_pre_attn_scalar is not None:
        scale = cfg.query_pre_attn_scalar ** -0.5
    else:
        scale = None
    alibi = (jnp.asarray(alibi_slopes(nH)) if cfg.pos_type == "alibi"
             else None)
    if S >= 2 * FLASH_CHUNK and alibi is None:
        # long-sequence path: stream KV chunks (standard causal semantics —
        # the explicit mask argument always encodes exactly this for the
        # calibration/eval callers)
        win = cfg.sliding_window if sliding else None
        qpos = jnp.broadcast_to(jnp.arange(S), (B, S))
        attn = flash_attention(q, k, v, qpos, scale, cfg.attn_logit_softcap,
                               layer.get("sinks"), win)
    else:
        attn = attention_scores(q, k, v, attn_mask, scale,
                                cfg.attn_logit_softcap, layer.get("sinks"),
                                alibi)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nH * hd)
    attn_out = _linear(attn, layer["o_proj"], layer.get("o_bias"))
    gemma2_norms = "pre_feedforward_layernorm" in layer
    if gemma2_norms or post_norm:
        # gemma2/olmo2: HF's post_attention_layernorm normalizes the
        # attention *output* before the residual add
        attn_out = rms_norm(attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps, au)
    rm = cfg.residual_multiplier
    if rm is not None:
        attn_out = attn_out * jnp.asarray(rm, dtype=attn_out.dtype)

    if cfg.parallel_blocks:
        # cohere/phi: attn and mlp branch from the same normed input, one
        # residual add at the end; falcon new-decoder uses a separate ln_mlp
        h2 = h1 if "mlp_layernorm" not in layer else apply_norm(
            x, cfg, layer["mlp_layernorm"], layer.get("mlp_layernorm_bias")
        )
    else:
        x = x + attn_out
        if gemma2_norms:
            h2 = rms_norm(x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps, au)
        elif post_norm:
            h2 = x
        else:
            h2 = apply_norm(
                x, cfg, layer["post_attention_layernorm"],
                layer.get("post_attention_layernorm_bias"),
            )
    if "gate_inp" in layer:  # sparse MoE FFN
        mlp_out, moe_caps = moe_ffn(h2, layer, cfg, with_capture=True)
        if rm is not None:
            mlp_out = mlp_out * jnp.asarray(rm, dtype=mlp_out.dtype)
        x = x + mlp_out + (attn_out if cfg.parallel_blocks else 0)
        captures = {"qkv": h1, "o": attn, "moe_router": h2}
        captures.update(moe_caps or {})
        return x, captures
    if "gate_proj" in layer:
        gate = _linear(h2, layer["gate_proj"], layer.get("gate_bias"))
        up = _linear(h2, layer["up_proj"], layer.get("up_bias"))
        down_in = _mlp_act(gate, up, cfg)
    else:
        # gateless MLP (starcoder2 c_fc/c_proj, phi fc1/fc2, nemotron):
        # act(up(x)) @ down
        up = _linear(h2, layer["up_proj"], layer.get("up_bias"))
        down_in = _act_only(up, cfg)
    mlp_out = _linear(down_in, layer["down_proj"], layer.get("down_bias"))
    if "post_feedforward_layernorm" in layer:  # gemma2 / olmo2
        mlp_out = rms_norm(mlp_out, layer["post_feedforward_layernorm"], cfg.rms_norm_eps, au)
    if rm is not None:
        mlp_out = mlp_out * jnp.asarray(rm, dtype=mlp_out.dtype)
    x = x + mlp_out + (attn_out if cfg.parallel_blocks else 0)
    captures = {"qkv": h1, "o": attn, "gateup": h2, "down": down_in}
    return x, captures


def _mla_block(layer, x, h1, cos, sin, attn_mask, cfg: LlamaConfig):
    """Deepseek-v2/v3 MLA attention + (dense | MoE) FFN block.

    HF modeling_deepseek_v2/v3 semantics: q via optional low-rank path
    (q_a_proj -> RMSNorm -> q_b_proj), kv via joint compression
    (kv_a_proj_with_mqa -> split c_kv | k_pe; RMSNorm(c_kv) -> kv_b_proj ->
    split k_nope | v). Rope rotates only the qk_rope split; k_pe is a single
    shared head broadcast across all query heads. The softmax scale
    (qk_head_dim^-0.5, x mscale^2 for v3 yarn) arrives pre-resolved in
    cfg.attention_scale.

    Captures: "qkv" feeds q_a/q_proj + kv_a (same input), "q_b"/"kv_b" the
    low-rank second stages, "o" the output projection, then the standard
    dense-MLP or MoE captures."""
    B, S, H = x.shape
    nH = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    qk_hd = dn + dr
    captures: Dict[str, jax.Array] = {"qkv": h1}
    if "q_b_proj" in layer:
        qa = _linear(h1, layer["q_a_proj"], layer.get("q_a_bias"))
        qa_n = rms_norm(qa, layer["q_a_norm"], cfg.rms_norm_eps)
        q = _linear(qa_n, layer["q_b_proj"])
        captures["q_b"] = qa_n
    else:  # deepseek-v2-lite: no q compression
        q = _linear(h1, layer["q_proj"])
    q = q.reshape(B, S, nH, qk_hd).transpose(0, 2, 1, 3)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = _linear(h1, layer["kv_a_proj"], layer.get("kv_a_bias"))
    c_kv, k_pe = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank :]
    ckv_n = rms_norm(c_kv, layer["kv_a_norm"], cfg.rms_norm_eps)
    captures["kv_b"] = ckv_n
    kv = _linear(ckv_n, layer["kv_b_proj"])
    kv = kv.reshape(B, S, nH, dn + dv).transpose(0, 2, 1, 3)
    k_nope, v = kv[..., :dn], kv[..., dn:]

    k_pe = k_pe[:, None]  # (B, 1, S, dr)
    q_pe, k_pe = apply_rope(q_pe, k_pe, cos, sin, cfg.rope_interleaved)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, nH, S, dr))], axis=-1
    )
    scale = cfg.attention_scale or qk_hd ** -0.5
    if S >= 2 * FLASH_CHUNK:
        qpos = jnp.broadcast_to(jnp.arange(S), (B, S))
        attn = flash_attention(q, k, v, qpos, scale)
    else:
        attn = attention_scores(q, k, v, attn_mask, scale)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nH * dv)
    captures["o"] = attn
    attn_out = _linear(attn, layer["o_proj"], layer.get("o_bias"))
    x = x + attn_out

    h2 = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
    if "gate_inp" in layer:
        mlp_out, moe_caps = moe_ffn(h2, layer, cfg, with_capture=True)
        captures["moe_router"] = h2
        captures.update(moe_caps or {})
    else:
        gate = _linear(h2, layer["gate_proj"])
        up = _linear(h2, layer["up_proj"])
        down_in = _mlp_act(gate, up, cfg)
        mlp_out = _linear(down_in, layer["down_proj"])
        captures.update({"gateup": h2, "down": down_in})
    return x + mlp_out, captures


def block_forward(
    layer: Dict[str, jax.Array],
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cfg: LlamaConfig,
    layer_idx: int = 0,
) -> jax.Array:
    """One transformer block: (B, S, H) -> (B, S, H)."""
    out, _ = block_capture(layer, x, cos, sin, mask, cfg, layer_idx)
    return out


def embed_forward(params, input_ids: jax.Array, cfg: LlamaConfig,
                  positions: Optional[jax.Array] = None) -> jax.Array:
    x = params["embed_tokens"][input_ids].astype(cfg.dtype)
    if cfg.pos_type == "learned":  # gpt2 wpe
        if positions is None:
            positions = jnp.arange(input_ids.shape[1])[None, :]
        x = x + params["pos_embed"][positions].astype(cfg.dtype)
    if "embed_norm" in params:  # bloom word_embeddings_layernorm
        x = apply_norm(x, cfg, params["embed_norm"], params.get("embed_norm_bias"))
    if cfg.embed_scale:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), dtype=cfg.dtype)
    if cfg.embedding_multiplier is not None:
        x = x * jnp.asarray(cfg.embedding_multiplier, dtype=cfg.dtype)
    return x


def head_forward(params, x: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Final norm + lm head -> logits (B, S, V) in float32."""
    h = apply_norm(x, cfg, params["norm"], params.get("norm_bias"))
    w = params.get("lm_head", params["embed_tokens"])
    logits = jnp.einsum("...i,oi->...o", h, w, preferred_element_type=jnp.float32)
    if params.get("lm_head_bias") is not None:  # phi
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    if cfg.logits_multiplier is not None:
        logits = logits * cfg.logits_multiplier
    if cfg.final_logit_softcap:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits


def causal_mask(B: int, S: int) -> jax.Array:
    m = jnp.tril(jnp.ones((S, S), bool))
    return jnp.broadcast_to(m, (B, S, S))


def forward(
    params,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Full forward pass -> logits (B, S, V) float32."""
    B, S = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    cos, sin = rope_cos_sin_all(cfg, positions, seq_len=S)
    mask = causal_mask(B, S)
    x = embed_forward(params, input_ids, cfg, positions)
    for li, layer in enumerate(params["layers"]):
        x = block_forward(layer, x, cos, sin, mask, cfg, li)
    return head_forward(params, x, cfg)


# ---------------------------------------------------------------------------
# Quantizable-layer accounting (mirrors the reference's HF module names so
# artifact directories are drop-in compatible, quantizer.py:267-275)
# ---------------------------------------------------------------------------

BLOCK_LINEAR_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)


def linear_layer_names(cfg: LlamaConfig, include_non_block: bool = False) -> List[str]:
    names = []
    if include_non_block:
        names.append("model.embed_tokens")
    for i in range(cfg.num_hidden_layers):
        for key in BLOCK_LINEAR_KEYS:
            mod = "self_attn" if key.endswith("_proj") and key[0] in "qkvo" else "mlp"
            names.append(f"model.layers.{i}.{mod}.{key}")
    if include_non_block and not cfg.tie_word_embeddings:
        names.append("lm_head")
    return names


# HF module name -> param-dict key where they differ
_LINEAR_KEY_ALIASES = {"kv_a_proj_with_mqa": "kv_a_proj"}


def get_linear(params, name: str) -> jax.Array:
    """Fetch a weight matrix by HF module name."""
    if name == "model.embed_tokens":
        return params["embed_tokens"]
    if name == "lm_head":
        return params.get("lm_head", params["embed_tokens"])
    parts = name.split(".")
    idx = int(parts[2])
    key = _LINEAR_KEY_ALIASES.get(parts[4], parts[4])
    return params["layers"][idx][key]


def set_linear(params, name: str, value: jax.Array):
    """Functionally replace a weight matrix by HF module name."""
    if name == "model.embed_tokens":
        return {**params, "embed_tokens": value}
    if name == "lm_head":
        return {**params, "lm_head": value}
    parts = name.split(".")
    idx = int(parts[2])
    key = _LINEAR_KEY_ALIASES.get(parts[4], parts[4])
    layers = list(params["layers"])
    layers[idx] = {**layers[idx], key: value}
    return {**params, "layers": layers}
