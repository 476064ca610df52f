"""Pack-only arch batch: dream / llada diffusion LMs + nemotron-h hybrid
(reference converter entries: DreamModel :3031, LLaDAModel :3101,
NemotronHModel :7686)."""

import json
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(49)


def _save(path: Path, cfg, tensors):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              str(path / "model.safetensors"))


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_dream_pack(tmp_path):
    """Dream: qwen2 naming, non-causal flag, mask token id."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    cfg = {"model_type": "dream", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128,
           "mask_token_id": 63}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.self_attn.q_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.layers.0.self_attn.q_proj.bias": RNG.normal(size=(nh * hd,)),
         "model.layers.0.self_attn.k_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.layers.0.self_attn.v_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, nh * hd)),
         "model.layers.0.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.down_proj.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "dream"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "dream")
    assert r.get("general.architecture") == "dream"
    assert r.get("dream.attention.causal") is False
    assert r.get("tokenizer.ggml.mask_token_id") == 63
    # qwen2-style: no permute, bias kept
    q = r.tensor_float("blk.0.attn_q.weight")
    np.testing.assert_allclose(
        q, t["model.layers.0.self_attn.q_proj.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    assert "blk.0.attn_q.bias" in r.tensors


def test_llada_pack(tmp_path):
    """LLaDA: OLMo-style keys and transformer.blocks naming, llama permute,
    non-causal + unshifted-logits flags."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    cfg = {"model_type": "llada", "vocab_size": v, "d_model": h,
           "mlp_hidden_size": ff, "n_layers": 1, "n_heads": nh,
           "n_kv_heads": nkv, "rms_norm_eps": 1e-6,
           "max_sequence_length": 4096}
    t = {"model.transformer.wte.weight": RNG.normal(size=(v, h)),
         "model.transformer.ln_f.weight": RNG.normal(size=(h,)),
         "model.transformer.ff_out.weight": RNG.normal(size=(v, h)),
         "model.transformer.blocks.0.attn_norm.weight": RNG.normal(size=(h,)),
         "model.transformer.blocks.0.ff_norm.weight": RNG.normal(size=(h,)),
         "model.transformer.blocks.0.q_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.transformer.blocks.0.k_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.transformer.blocks.0.v_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.transformer.blocks.0.attn_out.weight": RNG.normal(size=(h, nh * hd)),
         "model.transformer.blocks.0.ff_proj.weight": RNG.normal(size=(ff, h)),
         "model.transformer.blocks.0.up_proj.weight": RNG.normal(size=(ff, h)),
         "model.transformer.blocks.0.ff_out.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "llada"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "llada")
    assert r.get("general.architecture") == "llada"
    assert r.get("llada.context_length") == 4096
    assert r.get("llada.embedding_length") == h
    assert r.get("llada.feed_forward_length") == ff
    assert r.get("llada.attention.causal") is False
    assert r.get("llada.diffusion.shift_logits") is False
    # permuted q
    q = r.tensor_float("blk.0.attn_q.weight")
    perm = packer.gqa_permute_rows(nh * hd, nh)
    np.testing.assert_allclose(
        q, t["model.transformer.blocks.0.q_proj.weight"][perm]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # per-block ff_out -> ffn_down; top-level ff_out -> output
    assert "blk.0.ffn_down.weight" in r.tensors
    out = r.tensor_float("output.weight")
    assert out.shape == (v, h)


def test_nemotron_h_pack(tmp_path):
    """Nemotron-H: backbone/mixer naming, M/*/- hybrid pattern, per-layer
    kv + FF arrays, relu2 MLP without gate, mamba2 ssm transforms."""
    h, nh, nkv, hd, v, ff = 32, 4, 2, 8, 64, 48
    n_mh, mhd, d_state, ng, d_conv = 4, 16, 16, 1, 4
    d_inner = n_mh * mhd  # 64
    cfg = {"model_type": "nemotron_h", "vocab_size": v, "hidden_size": h,
           "num_hidden_layers": 3, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "attention_head_dim": hd,
           "intermediate_size": ff, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128,
           "hybrid_override_pattern": "M*-",
           "mamba_num_heads": n_mh, "mamba_head_dim": mhd,
           "ssm_state_size": d_state, "n_groups": ng, "conv_kernel": d_conv}
    conv_dim = d_inner + 2 * ng * d_state
    t = {"backbone.embeddings.weight": RNG.normal(size=(v, h)),
         "backbone.norm_f.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    # layer 0: mamba2
    t.update({
        "backbone.layers.0.norm.weight": RNG.normal(size=(h,)),
        "backbone.layers.0.mixer.in_proj.weight":
            RNG.normal(size=(2 * d_inner + 2 * ng * d_state + n_mh, h)),
        "backbone.layers.0.mixer.conv1d.weight": RNG.normal(size=(conv_dim, 1, d_conv)),
        "backbone.layers.0.mixer.conv1d.bias": RNG.normal(size=(conv_dim,)),
        "backbone.layers.0.mixer.dt_bias": RNG.normal(size=(n_mh,)),
        "backbone.layers.0.mixer.A_log": np.abs(RNG.normal(size=(n_mh,))) + 0.1,
        "backbone.layers.0.mixer.D": RNG.normal(size=(n_mh,)),
        "backbone.layers.0.mixer.norm.weight": RNG.normal(size=(d_inner,)),
        "backbone.layers.0.mixer.out_proj.weight": RNG.normal(size=(h, d_inner)),
    })
    # layer 1: attention
    t.update({
        "backbone.layers.1.norm.weight": RNG.normal(size=(h,)),
        "backbone.layers.1.mixer.q_proj.weight": RNG.normal(size=(nh * hd, h)),
        "backbone.layers.1.mixer.k_proj.weight": RNG.normal(size=(nkv * hd, h)),
        "backbone.layers.1.mixer.v_proj.weight": RNG.normal(size=(nkv * hd, h)),
        "backbone.layers.1.mixer.o_proj.weight": RNG.normal(size=(h, nh * hd)),
    })
    # layer 2: relu2 MLP
    t.update({
        "backbone.layers.2.norm.weight": RNG.normal(size=(h,)),
        "backbone.layers.2.mixer.up_proj.weight": RNG.normal(size=(ff, h)),
        "backbone.layers.2.mixer.down_proj.weight": RNG.normal(size=(h, ff)),
    })
    d = tmp_path / "nemotron_h"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "nemotron_h")
    assert r.get("general.architecture") == "nemotron_h"
    assert r.get("nemotron_h.attention.head_count_kv") == [0, nkv, 0]
    assert r.get("nemotron_h.feed_forward_length") == [0, 0, ff]
    assert r.get("nemotron_h.ssm.inner_size") == d_inner
    assert r.get("nemotron_h.ssm.state_size") == d_state
    assert r.get("nemotron_h.ssm.conv_kernel") == d_conv
    assert r.get("nemotron_h.ssm.time_step_rank") == n_mh
    assert r.get("nemotron_h.attention.key_length") == hd
    for n in ("blk.0.ssm_in.weight", "blk.0.ssm_norm.weight",
              "blk.1.attn_q.weight", "blk.2.ffn_up.weight",
              "blk.2.ffn_down.weight"):
        assert n in r.tensors, n
    assert "blk.2.ffn_gate.weight" not in r.tensors  # relu2: no gate
    # ssm_a = -exp(A_log), broadcast column
    a = r.tensor_float("blk.0.ssm_a")
    np.testing.assert_allclose(
        a[:, 0], -np.exp(t["backbone.layers.0.mixer.A_log"].astype(np.float32)),
        rtol=1e-6)
    # attention layer q permuted (llama layout)
    q = r.tensor_float("blk.1.attn_q.weight")
    perm = packer.gqa_permute_rows(nh * hd, nh)
    np.testing.assert_allclose(
        q, t["backbone.layers.1.mixer.q_proj.weight"][perm]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
