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
