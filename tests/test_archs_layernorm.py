"""LayerNorm-family architectures (round-2 batch): stablelm / starcoder2 /
nemotron / cohere (command-r) / phi — HF-torch logits parity plus GGUF
serving round-trips covering partial rotary, interleaved rope, parallel
residual blocks, gateless MLPs, and norm/linear biases."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(23)


def _make(tmp_path, cfg_d, seed=5):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(seed)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / cfg_d["model_type"]
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _check_parity(model_dir, m, n_vocab=128, rtol=3e-4, atol=3e-4):
    import torch

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, n_vocab, size=(2, 18))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)
    return cfg, params


def _check_gguf_serving(tmp_path, model_dir, arch, dtype=jnp.float32,
                        rtol=2e-3, atol=2e-3):
    from gptq_gguf_tpu.serving import model as qmodel

    gguf = tmp_path / f"{arch}.gguf"
    packer.pack_model(model_dir, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == arch
    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=dtype)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, cfg.vocab_size, size=(1, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))[:, -1, :]
    cache = qmodel.init_cache(gcfg, 1, 16, dtype=dtype)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=rtol, atol=atol)
    return gcfg


COMMON = {
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "max_position_embeddings": 256, "torch_dtype": "float32",
}


def test_stablelm_forward_matches_hf(tmp_path):
    d, m = _make(tmp_path, {
        "model_type": "stablelm", "architectures": ["StableLmForCausalLM"],
        **COMMON, "num_key_value_heads": 2, "partial_rotary_factor": 0.25,
        "layer_norm_eps": 1e-5, "use_qkv_bias": True,
        "use_parallel_residual": False, "tie_word_embeddings": False,
    })
    cfg, params = _check_parity(d, m)
    assert cfg.norm_type == "layernorm" and cfg.rope_dim == 4
    assert "input_layernorm_bias" in params["layers"][0]
    _check_gguf_serving(tmp_path, d, "stablelm")


def test_starcoder2_forward_matches_hf(tmp_path):
    d, m = _make(tmp_path, {
        "model_type": "starcoder2", "architectures": ["Starcoder2ForCausalLM"],
        **COMMON, "num_key_value_heads": 2, "hidden_act": "gelu_pytorch_tanh",
        "norm_epsilon": 1e-5, "use_bias": True, "tie_word_embeddings": False,
        "sliding_window": None, "residual_dropout": 0.0,
        "embedding_dropout": 0.0, "attention_dropout": 0.0,
    })
    cfg, params = _check_parity(d, m)
    assert "gate_proj" not in params["layers"][0]  # gateless c_fc/c_proj
    assert "up_bias" in params["layers"][0]
    _check_gguf_serving(tmp_path, d, "starcoder2")


def test_nemotron_forward_matches_hf(tmp_path):
    d, m = _make(tmp_path, {
        "model_type": "nemotron", "architectures": ["NemotronForCausalLM"],
        **COMMON, "num_key_value_heads": 2, "norm_eps": 1e-5,
        "partial_rotary_factor": 0.5, "hidden_act": "relu2",
        "tie_word_embeddings": False,
    })
    cfg, params = _check_parity(d, m)
    assert cfg.act_fn == "relu2" and cfg.rms_add_unit
    assert "gate_proj" not in params["layers"][0]
    # GGUF side: (1+w) folded into stored norm weights (llama.cpp convention)
    gcfg = _check_gguf_serving(tmp_path, d, "nemotron")
    assert not gcfg.rms_add_unit


def test_cohere_forward_matches_hf(tmp_path):
    d, m = _make(tmp_path, {
        "model_type": "cohere", "architectures": ["CohereForCausalLM"],
        **COMMON, "num_key_value_heads": 4, "layer_norm_eps": 1e-5,
        "logit_scale": 0.25, "use_qk_norm": False,
        "tie_word_embeddings": True,
    })
    cfg, params = _check_parity(d, m)
    assert cfg.parallel_blocks and cfg.rope_interleaved
    assert cfg.logits_multiplier == 0.25
    gcfg = _check_gguf_serving(tmp_path, d, "command-r")
    assert gcfg.logits_multiplier == pytest.approx(0.25)


def test_phi_forward_matches_hf(tmp_path):
    d, m = _make(tmp_path, {
        "model_type": "phi", "architectures": ["PhiForCausalLM"],
        **COMMON, "num_key_value_heads": 4, "layer_norm_eps": 1e-5,
        "partial_rotary_factor": 0.5, "hidden_act": "gelu_new",
        "tie_word_embeddings": False, "qk_layernorm": False,
    })
    cfg, params = _check_parity(d, m)
    assert cfg.parallel_blocks and cfg.rope_dim == 8
    assert "lm_head_bias" in params
    assert "o_bias" in params["layers"][0]
    _check_gguf_serving(tmp_path, d, "phi2")
