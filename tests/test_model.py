"""Model correctness tests: logits parity with HF transformers on tiny
random-weight checkpoints (built offline)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(4)

TINY_LLAMA_HF = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 256,
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
    "torch_dtype": "float32",
}


def make_tiny_hf_model(tmp_path, config_dict=TINY_LLAMA_HF, seed=0):
    """Create a tiny HF model with random weights on disk; returns (dir, hf_model)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(**config_dict)
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(cfg)
    model = model.eval().float()
    out = tmp_path / "tiny_model"
    model.save_pretrained(out, safe_serialization=True)
    return out, model


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("m")
    return make_tiny_hf_model(tmp)


def test_logits_match_hf(tiny_model):
    import torch

    model_dir, hf_model = tiny_model
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)

    ids = RNG.integers(0, cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    j_logits = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))

    assert j_logits.shape == hf_logits.shape
    np.testing.assert_allclose(j_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_logits_match_hf_llama3_rope(tmp_path):
    import torch

    cfg_dict = dict(TINY_LLAMA_HF)
    cfg_dict["rope_scaling"] = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 128,
    }
    model_dir, hf_model = make_tiny_hf_model(tmp_path, cfg_dict, seed=1)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, cfg.vocab_size, size=(1, 160))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    j_logits = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(j_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_logits_match_hf_qwen2_bias(tmp_path):
    import torch

    cfg_dict = dict(TINY_LLAMA_HF)
    cfg_dict["architectures"] = ["Qwen2ForCausalLM"]
    cfg_dict["model_type"] = "qwen2"
    cfg_dict["attention_bias"] = True
    model_dir, hf_model = make_tiny_hf_model(tmp_path, cfg_dict, seed=2)
    cfg = loader.load_config(model_dir)
    assert cfg.attention_bias
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, cfg.vocab_size, size=(1, 32))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    j_logits = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(j_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_get_set_linear_roundtrip(tiny_model):
    model_dir, _ = tiny_model
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    names = llama.linear_layer_names(cfg, include_non_block=True)
    assert "model.layers.0.self_attn.q_proj" in names
    assert "model.layers.1.mlp.down_proj" in names
    w = llama.get_linear(params, "model.layers.0.self_attn.q_proj")
    params2 = llama.set_linear(params, "model.layers.0.self_attn.q_proj", w * 2)
    w2 = llama.get_linear(params2, "model.layers.0.self_attn.q_proj")
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w) * 2)
    # original untouched (functional update)
    np.testing.assert_allclose(
        np.asarray(llama.get_linear(params, "model.layers.0.self_attn.q_proj")),
        np.asarray(w),
    )


def test_logits_match_hf_gemma2(tmp_path):
    import torch

    cfg_dict = {
        "model_type": "gemma2",
        "architectures": ["Gemma2ForCausalLM"],
        "vocab_size": 256,
        "hidden_size": 256,
        "intermediate_size": 512,
        "num_hidden_layers": 2,  # layer 0 sliding, layer 1 global
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 64,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "max_position_embeddings": 512,
        "attn_logit_softcapping": 50.0,
        "final_logit_softcapping": 30.0,
        "query_pre_attn_scalar": 64,
        "sliding_window": 16,  # small so the test exercises it
        "tie_word_embeddings": True,
        "hidden_activation": "gelu_pytorch_tanh",
        "torch_dtype": "float32",
        "pad_token_id": 0,
    }
    model_dir, hf_model = make_tiny_hf_model(tmp_path, cfg_dict, seed=6)
    cfg = loader.load_config(model_dir)
    assert cfg.arch == "gemma2" and cfg.sliding_window == 16
    params = loader.load_params(model_dir, cfg)
    assert "pre_feedforward_layernorm" in params["layers"][0]
    ids = RNG.integers(0, cfg.vocab_size, size=(1, 48))  # > sliding window
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    j_logits = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(j_logits, hf_logits, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# RoPE breadth (round 2): yarn / longrope vs HF transformers rope utils
# ---------------------------------------------------------------------------


def test_yarn_rope_matches_transformers():
    import torch
    from transformers import AutoConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from gptq_gguf_tpu.models.llama import LlamaConfig, _rope_params

    d = {
        "model_type": "llama", "vocab_size": 128, "hidden_size": 256,
        "intermediate_size": 512, "num_hidden_layers": 1,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "rope_theta": 10000.0, "max_position_embeddings": 32768,
        "rope_scaling": {
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    }
    hf_cfg = AutoConfig.for_model(**d)
    inv_hf, att_hf = ROPE_INIT_FUNCTIONS["yarn"](hf_cfg, device="cpu")
    cfg = LlamaConfig.from_hf_dict(d)
    inv, att = _rope_params(cfg)
    np.testing.assert_allclose(inv, inv_hf.float().numpy(), rtol=1e-6)
    assert abs(att - att_hf) < 1e-6


def test_longrope_matches_transformers():
    import torch
    from transformers import AutoConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from gptq_gguf_tpu.models.llama import LlamaConfig, _rope_params

    hd = 64
    short = (1.0 + np.abs(np.random.default_rng(5).normal(size=hd // 2)) * 0.2).tolist()
    long = (2.0 + np.abs(np.random.default_rng(6).normal(size=hd // 2)) * 2.0).tolist()
    d = {
        "model_type": "phi3", "vocab_size": 128, "hidden_size": 256,
        "intermediate_size": 512, "num_hidden_layers": 1,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "rope_theta": 10000.0, "max_position_embeddings": 131072,
        "original_max_position_embeddings": 4096,
        "rope_scaling": {
            "type": "longrope", "short_factor": short, "long_factor": long,
        },
    }
    hf_cfg = AutoConfig.for_model(**d)
    cfg = LlamaConfig.from_hf_dict(d)

    # short path (seq <= original)
    inv_hf, att_hf = ROPE_INIT_FUNCTIONS["longrope"](hf_cfg, device="cpu", seq_len=2048)
    inv, att = _rope_params(cfg, seq_len=2048)
    np.testing.assert_allclose(inv, inv_hf.float().numpy(), rtol=1e-6)
    assert abs(att - att_hf) < 1e-6

    # long path
    inv_hf, att_hf = ROPE_INIT_FUNCTIONS["longrope"](hf_cfg, device="cpu", seq_len=32768)
    inv, att = _rope_params(cfg, seq_len=32768)
    np.testing.assert_allclose(inv, inv_hf.float().numpy(), rtol=1e-6)
    assert abs(att - att_hf) < 1e-6


def test_llama_config_hashable_with_rope_scaling():
    from gptq_gguf_tpu.models.llama import LlamaConfig

    d = {
        "model_type": "llama", "vocab_size": 64, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 2,
        "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                         "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                         "original_max_position_embeddings": 8192},
    }
    cfg = LlamaConfig.from_hf_dict(d)
    hash(cfg)  # must not raise (jit static arg)


def test_gemma1_forward_matches_hf(tmp_path):
    """gemma v1: (1+w) RMSNorm, sqrt(H) embed scale, gelu MLP, head_dim 256-style."""
    import torch

    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama as llama_mod, loader

    cfg_d = {
        "model_type": "gemma", "architectures": ["GemmaForCausalLM"],
        "vocab_size": 256, "hidden_size": 128, "intermediate_size": 256,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 1, "head_dim": 64, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 512, "hidden_act": "gelu_pytorch_tanh",
        "hidden_activation": "gelu_pytorch_tanh",
        "tie_word_embeddings": True, "torch_dtype": "float32", "pad_token_id": 0,
    }
    model_dir, m = make_tiny_hf_model(tmp_path, cfg_d, seed=15)
    cfg = loader.load_config(model_dir)
    assert cfg.rms_add_unit and cfg.embed_scale and cfg.act_fn == "gelu_tanh"
    params = loader.load_params(model_dir, cfg)
    ids = np.random.default_rng(2).integers(0, 256, size=(1, 20))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_mod.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_gemma3_forward_matches_hf(tmp_path):
    """gemma3: dual rope bases (local/global), layer_types sliding pattern,
    per-head q/k (1+w) norms, query_pre_attn_scalar."""
    import torch

    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama as llama_mod, loader

    cfg_d = {
        "model_type": "gemma3_text", "architectures": ["Gemma3ForCausalLM"],
        "vocab_size": 256, "hidden_size": 128, "intermediate_size": 256,
        "num_hidden_layers": 7, "num_attention_heads": 2,
        "num_key_value_heads": 1, "head_dim": 64, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 512, "query_pre_attn_scalar": 64,
        "sliding_window": 8, "rope_theta": 1000000.0,
        "rope_local_base_freq": 10000.0,
        "hidden_activation": "gelu_pytorch_tanh",
        "tie_word_embeddings": True, "torch_dtype": "float32", "pad_token_id": 0,
    }
    model_dir, m = make_tiny_hf_model(tmp_path, cfg_d, seed=19)
    cfg = loader.load_config(model_dir)
    assert cfg.rope_local_theta == 10000.0
    assert cfg.sliding_layers is not None
    assert cfg.sliding_layers[5] is False and cfg.sliding_layers[0] is True
    assert cfg.qk_norm and cfg.rms_add_unit
    params = loader.load_params(model_dir, cfg)
    assert "pre_feedforward_layernorm" in params["layers"][0]

    ids = np.random.default_rng(4).integers(0, 256, size=(1, 24))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_mod.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_olmo2_forward_matches_hf(tmp_path):
    """olmo2: post-norm blocks (no input norms), flat q/k RMSNorm over the
    whole projection, norms on sublayer outputs."""
    import torch

    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama as llama_mod, loader

    cfg_d = {
        "model_type": "olmo2", "architectures": ["Olmo2ForCausalLM"],
        "vocab_size": 256, "hidden_size": 128, "intermediate_size": 256,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 512, "rope_theta": 500000.0,
        "tie_word_embeddings": False, "torch_dtype": "float32", "pad_token_id": 0,
    }
    model_dir, m = make_tiny_hf_model(tmp_path, cfg_d, seed=27)
    cfg = loader.load_config(model_dir)
    assert cfg.qk_norm
    params = loader.load_params(model_dir, cfg)
    l0 = params["layers"][0]
    assert "input_layernorm" not in l0
    assert l0["q_norm"].shape == (128,)  # flat, not per-head

    ids = np.random.default_rng(6).integers(0, 256, size=(1, 20))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_mod.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
