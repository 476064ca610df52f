"""Round-2 arch batch 3: glm4 / cohere2 / olmo / arcee / seed_oss /
ernie4_5 / exaone4 — HF-torch logits parity plus GGUF serving round-trips
covering sandwich norms, hybrid NoPE sliding attention, non-parametric
LayerNorm + clip_qkv, gateless relu^2 MLPs, and post-norm blocks with
per-head qk norms (reference converter entries: pack_gptq_into_gguf.py
Glm4Model :6968, Cohere2Model :5920, OlmoModel :5941, ArceeModel :2299,
SeedOssModel :5966, Ernie4_5Model :3201, Exaone4Model :7406)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(29)


def _make(tmp_path, cfg_d, seed=7):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(seed)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / cfg_d["model_type"]
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _check_parity(model_dir, m, n_vocab=128, rtol=4e-4, atol=4e-4):
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
                        rtol=2e-3, atol=2e-3, max_len=32):
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
    cache = qmodel.init_cache(gcfg, 1, max_len, dtype=dtype)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=rtol, atol=atol)
    return r, gcfg


BASE = dict(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, torch_dtype="float32", pad_token_id=0,
)


def test_glm4(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="glm4", architectures=["Glm4ForCausalLM"], **BASE,
        head_dim=32, partial_rotary_factor=0.5, attention_bias=True,
        rms_norm_eps=1e-6, tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _check_parity(d, m)
    assert cfg.rope_interleaved and cfg.partial_rotary_factor == 0.5
    # sandwich norms landed in the gemma2-style slots
    l0 = params["layers"][0]
    assert "pre_feedforward_layernorm" in l0 and "post_feedforward_layernorm" in l0
    r, gcfg = _check_gguf_serving(tmp_path, d, "glm4")
    assert "blk.0.post_attention_norm.weight" in r.tensors
    assert "blk.0.ffn_up.weight" in r.tensors  # fused gate|up
    assert "blk.0.ffn_gate.weight" not in r.tensors
    assert r.get("glm4.rope.dimension_count") == 16


def test_cohere2(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="cohere2", architectures=["Cohere2ForCausalLM"], **BASE,
        logit_scale=0.25, layer_norm_eps=1e-5, sliding_window=8,
        sliding_window_pattern=4, rope_theta=10000.0,
        tie_word_embeddings=True,
    ))
    cfg, params = _check_parity(d, m)
    assert cfg.parallel_blocks and cfg.norm_type == "layernorm"
    assert cfg.rope_sliding_only and cfg.sliding_window == 8
    assert cfg.sliding_layers is not None and not cfg.sliding_layers[3]
    r, gcfg = _check_gguf_serving(tmp_path, d, "cohere2")
    assert gcfg.rope_sliding_only and gcfg.sliding_window == 8
    assert gcfg.logits_multiplier == pytest.approx(0.25)


def test_olmo(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="olmo", architectures=["OlmoForCausalLM"], **BASE,
        clip_qkv=0.2, tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _check_parity(d, m)
    assert cfg.norm_type == "layernorm" and cfg.clip_qkv == pytest.approx(0.2)
    # synthesized unit norms
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["input_layernorm"]), 1.0
    )
    r, gcfg = _check_gguf_serving(tmp_path, d, "olmo")
    assert gcfg.clip_qkv == pytest.approx(0.2)
    assert "blk.0.attn_norm.weight" not in r.tensors  # non-parametric


def test_arcee(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="arcee", architectures=["ArceeForCausalLM"], **BASE,
        hidden_act="relu2", rms_norm_eps=1e-6, tie_word_embeddings=False,
        mlp_bias=False, attention_bias=False, rope_theta=10000.0,
    ))
    cfg, params = _check_parity(d, m)
    assert cfg.act_fn == "relu2"
    assert "gate_proj" not in params["layers"][0]  # gateless
    _check_gguf_serving(tmp_path, d, "arcee")


def test_seed_oss(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="seed_oss", architectures=["SeedOssForCausalLM"], **BASE,
        head_dim=32, attention_bias=True, attention_out_bias=False,
        attention_dropout=0.0, residual_dropout=0.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _check_parity(d, m)
    assert params["layers"][0].get("q_bias") is not None
    r, _ = _check_gguf_serving(tmp_path, d, "seed_oss")
    assert "blk.0.attn_q.bias" in r.tensors


def test_ernie4_5(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="ernie4_5", architectures=["Ernie4_5ForCausalLM"], **BASE,
        head_dim=32, use_bias=False, rms_norm_eps=1e-5,
        tie_word_embeddings=True, rope_theta=10000.0,
    ))
    _check_parity(d, m)
    r, _ = _check_gguf_serving(tmp_path, d, "ernie4_5")
    assert r.get("ernie4_5.attention.key_length") == 32


def test_exaone4(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="exaone4", architectures=["Exaone4ForCausalLM"], **BASE,
        head_dim=32, sliding_window=8, sliding_window_pattern=4,
        rms_norm_eps=1e-6, tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _check_parity(d, m)
    assert cfg.qk_norm and cfg.rope_sliding_only
    assert cfg.sliding_layers == (True, True, True, False)
    # post-norm block: no input norm key
    assert "input_layernorm" not in params["layers"][0]
    r, gcfg = _check_gguf_serving(tmp_path, d, "exaone4")
    assert gcfg.sliding_layers == (True, True, True, False)
    assert "blk.0.post_attention_norm.weight" in r.tensors
