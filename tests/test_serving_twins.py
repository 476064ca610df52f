"""GGUF serving for twin architectures: xverse (== llama semantics) and
qwen2vl text (== qwen2: text-only mrope reduces to NeoX rope)."""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.serving import model as qmodel

RNG = np.random.default_rng(53)


def _save(path: Path, cfg, tensors):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              str(path / "model.safetensors"))


def _llama_weights(h, ff, nh, nkv, hd, v):
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)) * 0.1,
         "model.norm.weight": 1 + RNG.normal(size=(h,)) * 0.05,
         "lm_head.weight": RNG.normal(size=(v, h)) * 0.1}
    for i in range(2):
        p = f"model.layers.{i}"
        t.update({
            f"{p}.input_layernorm.weight": 1 + RNG.normal(size=(h,)) * 0.05,
            f"{p}.post_attention_layernorm.weight": 1 + RNG.normal(size=(h,)) * 0.05,
            f"{p}.self_attn.q_proj.weight": RNG.normal(size=(nh * hd, h)) * 0.1,
            f"{p}.self_attn.k_proj.weight": RNG.normal(size=(nkv * hd, h)) * 0.1,
            f"{p}.self_attn.v_proj.weight": RNG.normal(size=(nkv * hd, h)) * 0.1,
            f"{p}.self_attn.o_proj.weight": RNG.normal(size=(h, nh * hd)) * 0.1,
            f"{p}.mlp.gate_proj.weight": RNG.normal(size=(ff, h)) * 0.1,
            f"{p}.mlp.up_proj.weight": RNG.normal(size=(ff, h)) * 0.1,
            f"{p}.mlp.down_proj.weight": RNG.normal(size=(h, ff)) * 0.1,
        })
    return t


def _serve_logits(gguf_path, ids):
    params, cfg = qmodel.load_gguf_for_serving(gguf_path, dtype=jnp.float32)
    cache = qmodel.init_cache(cfg, 1, ids.shape[1] + 4, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache)
    return np.asarray(logits)


def test_xverse_serves_as_llama_twin(tmp_path):
    """The same weights packed as xverse and as llama must serve identical
    logits (xverse is llama semantics under its own arch tag)."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    t = _llama_weights(h, ff, nh, nkv, hd, v)
    base = {"vocab_size": v, "hidden_size": h, "intermediate_size": ff,
            "num_hidden_layers": 2, "num_attention_heads": nh,
            "num_key_value_heads": nkv, "rms_norm_eps": 1e-6,
            "max_position_embeddings": 128}
    dx = tmp_path / "xverse"
    _save(dx, {**base, "model_type": "xverse", "max_sequence_length": 128}, t)
    dl = tmp_path / "llama"
    _save(dl, {**base, "model_type": "llama"}, t)
    gx = tmp_path / "x.gguf"
    gl = tmp_path / "l.gguf"
    packer.pack_model(dx, tmp_path / "none", gx)
    packer.pack_model(dl, tmp_path / "none", gl)
    ids = RNG.integers(0, v, size=(1, 9))
    np.testing.assert_allclose(_serve_logits(gx, ids), _serve_logits(gl, ids),
                               rtol=1e-5, atol=1e-5)


def test_qwen2vl_text_serves_as_qwen2_twin(tmp_path):
    """qwen2vl text GGUF must serve logits identical to the same weights
    packed as qwen2 (text-only mrope == NeoX rope)."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    t = _llama_weights(h, ff, nh, nkv, hd, v)
    for i in range(2):  # qwen2-style attention biases
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.q_proj.bias"] = RNG.normal(size=(nh * hd,)) * 0.05
        t[f"{p}.self_attn.k_proj.bias"] = RNG.normal(size=(nkv * hd,)) * 0.05
        t[f"{p}.self_attn.v_proj.bias"] = RNG.normal(size=(nkv * hd,)) * 0.05
    base = {"vocab_size": v, "hidden_size": h, "intermediate_size": ff,
            "num_hidden_layers": 2, "num_attention_heads": nh,
            "num_key_value_heads": nkv, "rms_norm_eps": 1e-6,
            "max_position_embeddings": 128}
    dv = tmp_path / "qwen2vl"
    _save(dv, {**base, "model_type": "qwen2_vl",
               "rope_scaling": {"type": "mrope", "mrope_section": [2, 1, 1]}}, t)
    dq = tmp_path / "qwen2"
    _save(dq, {**base, "model_type": "qwen2"}, t)
    gv = tmp_path / "v.gguf"
    gq = tmp_path / "q.gguf"
    packer.pack_model(dv, tmp_path / "none", gv)
    packer.pack_model(dq, tmp_path / "none", gq)
    ids = RNG.integers(0, v, size=(1, 9))
    np.testing.assert_allclose(_serve_logits(gv, ids), _serve_logits(gq, ids),
                               rtol=1e-5, atol=1e-5)


def test_phi3_longrope_gguf_serving(tmp_path):
    """phi3 longrope GGUFs: rope_factors_long/short tensors fold back into
    cfg.rope_scaling and serving logits match the HF model (short branch)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        model_type="phi3", vocab_size=64, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rms_norm_eps=1e-6,
        max_position_embeddings=256,
        original_max_position_embeddings=64,
        rope_scaling={"type": "longrope",
                      "long_factor": [4.0, 3.0, 2.0, 1.5],
                      "short_factor": [1.25, 1.5, 1.75, 2.0]},
        sliding_window=None, pad_token_id=0, torch_dtype="float32",
        use_cache=False)
    torch.manual_seed(25)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "phi3lr"
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp_path / "phi3lr.gguf"
    packer.pack_model(d, tmp_path / "none", gguf)

    params, cfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    rs = dict(cfg.rope_scaling)
    assert rs["rope_type"] == "longrope"
    assert rs["short_factor"] == (1.25, 1.5, 1.75, 2.0)
    assert rs["long_factor"] == (4.0, 3.0, 2.0, 1.5)
    assert rs["original_max_position_embeddings"] == 64

    ids = RNG.integers(0, 64, size=(1, 12))
    # short branch: cache length below the original context
    cache = qmodel.init_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()[:, -1, :]
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=5e-3, atol=5e-3)
    # long branch must actually change the rope tables
    cache_l = qmodel.init_cache(cfg, 1, 128, dtype=jnp.float32)
    logits_l, _ = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache_l)
    assert not np.allclose(np.asarray(logits_l), np.asarray(logits))


def test_phimoe_gguf_serving_smoke(tmp_path):
    """phimoe GGUFs load and serve (llama.cpp top-k routing semantics):
    LayerNorm + mixtral expert stacks + longrope factors wired through."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        model_type="phimoe", vocab_size=64, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2,
        rms_norm_eps=1e-5, max_position_embeddings=128,
        original_max_position_embeddings=128, attention_bias=True,
        lm_head_bias=True, torch_dtype="float32", use_cache=False)
    torch.manual_seed(26)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "phimoe"
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp_path / "phimoe.gguf"
    packer.pack_model(d, tmp_path / "none", gguf)

    params, cfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    assert cfg.norm_type == "layernorm"
    assert cfg.moe_num_experts == 4 and cfg.moe_top_k == 2
    assert "gate_inp" in params["layers"][0]
    ids = RNG.integers(0, 64, size=(2, 8))
    cache = qmodel.init_cache(cfg, 2, 16, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache)
    out = np.asarray(logits)
    assert out.shape == (2, 64) and np.isfinite(out).all()
