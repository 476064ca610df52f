"""Architecture-breadth tests (round-2 batch): granite / minicpm / exaone /
internlm2 / baichuan / deepseek-v1 / olmoe.

HF-torch parity where transformers ships the family (granite, olmoe);
handcrafted-checkpoint equivalence for remote-code families (exaone,
internlm2, baichuan, deepseek): the foreign naming scheme must load to the
same pytree/logits as the canonical llama naming. Mirrors the reference's
per-arch converter registry coverage (pack_gptq_into_gguf.py ModelBase
subclasses)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(11)


def _save_st(path: Path, tensors):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(path / "model.safetensors"))


def _write_cfg(path: Path, cfg):
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)


def _hf_tensors(model_dir: Path):
    from safetensors import safe_open

    out = {}
    for file in sorted(Path(model_dir).glob("*.safetensors")):
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
    return out


# ---------------------------------------------------------------------------
# granite: HF parity exercises all four scalar multipliers at once
# ---------------------------------------------------------------------------

GRANITE_CFG = {
    "model_type": "granite", "architectures": ["GraniteForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "max_position_embeddings": 256, "tie_word_embeddings": False,
    "embedding_multiplier": 12.0, "attention_multiplier": 0.03125,
    "residual_multiplier": 0.22, "logits_scaling": 8.0,
    "attention_bias": False, "torch_dtype": "float32",
}


@pytest.fixture(scope="module")
def granite_model(tmp_path_factory):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("granite")
    hf_cfg = AutoConfig.for_model(**GRANITE_CFG)
    torch.manual_seed(7)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp / "hf"
    m.save_pretrained(model_dir, safe_serialization=True)
    return tmp, model_dir, m


def test_granite_forward_matches_hf(granite_model):
    import torch

    _, model_dir, m = granite_model
    cfg = loader.load_config(model_dir)
    assert cfg.embedding_multiplier == 12.0
    assert cfg.attention_scale == 0.03125
    assert cfg.residual_multiplier == 0.22
    assert cfg.logits_multiplier == 1.0 / 8.0
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, 128, size=(2, 20))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_granite_gguf_serving_roundtrip(granite_model):
    from gptq_gguf_tpu.serving import model as qmodel

    tmp, model_dir, _ = granite_model
    gguf = tmp / "granite.gguf"
    packer.pack_model(model_dir, tmp / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "granite"
    assert r.get("granite.logit_scale") == 8.0
    assert r.get("granite.attention.scale") == 0.03125

    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    assert gcfg.logits_multiplier == pytest.approx(1.0 / 8.0)
    assert gcfg.residual_multiplier == pytest.approx(0.22)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, 128, size=(1, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))[:, -1, :]
    cache = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# olmoe: MoE + flat q/k norms, no top-k renormalization
# ---------------------------------------------------------------------------


def test_olmoe_forward_matches_hf(tmp_path):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg_d = {
        "model_type": "olmoe", "architectures": ["OlmoeForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 64,
        "num_experts": 4, "num_experts_per_tok": 2, "norm_topk_prob": False,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "torch_dtype": "float32",
    }
    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(9)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp_path / "olmoe"
    m.save_pretrained(model_dir, safe_serialization=True)

    cfg = loader.load_config(model_dir)
    assert cfg.qk_norm and not cfg.moe_norm_topk
    params = loader.load_params(model_dir, cfg)
    assert params["layers"][0]["q_norm"].shape == (64,)  # flat, not per-head
    ids = RNG.integers(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    # pack + GGUF metadata carries arch + norm flag
    gguf = tmp_path / "olmoe.gguf"
    packer.pack_model(model_dir, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "olmoe"
    assert r.get("olmoe.expert_count") == 4
    assert r.get("olmoe.expert_norm_topk_prob") is False


# ---------------------------------------------------------------------------
# foreign naming schemes: rebuild a canonical tiny llama checkpoint under the
# family's names; loading both must give identical logits
# ---------------------------------------------------------------------------

BASE_CFG = {
    "model_type": "llama", "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "max_position_embeddings": 256, "tie_word_embeddings": False,
    "torch_dtype": "float32",
}


@pytest.fixture(scope="module")
def base_llama(tmp_path_factory):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("base")
    hf_cfg = AutoConfig.for_model(**BASE_CFG)
    torch.manual_seed(13)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp / "hf"
    m.save_pretrained(model_dir, safe_serialization=True)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, 128, size=(1, 16))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    return model_dir, ids, ref


def _renamed_logits(tmp_path, base_dir, cfg_dict, rename_fn, ids):
    t = _hf_tensors(base_dir)
    out = {}
    for name, arr in t.items():
        for new_name, new_arr in rename_fn(name, arr):
            out[new_name] = np.ascontiguousarray(new_arr)
    d = tmp_path / cfg_dict["model_type"]
    _save_st(d, out)
    _write_cfg(d, cfg_dict)
    cfg = loader.load_config(d)
    params = loader.load_params(d, cfg)
    return d, np.asarray(llama.forward(params, jnp.asarray(ids), cfg))


def test_exaone_names_load(base_llama, tmp_path):
    base_dir, ids, ref = base_llama
    cfg_d = {
        "model_type": "exaone", "architectures": ["ExaoneForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "activation_function": "silu",
        "tie_word_embeddings": False, "torch_dtype": "float32",
    }

    def rename(name, arr):
        m = {
            "model.embed_tokens.weight": "transformer.wte.weight",
            "model.norm.weight": "transformer.ln_f.weight",
            "lm_head.weight": "lm_head.weight",
        }
        if name in m:
            return [(m[name], arr)]
        parts = name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        r = {
            "input_layernorm.weight": "ln_1.weight",
            "post_attention_layernorm.weight": "ln_2.weight",
            "self_attn.q_proj.weight": "attn.attention.q_proj.weight",
            "self_attn.k_proj.weight": "attn.attention.k_proj.weight",
            "self_attn.v_proj.weight": "attn.attention.v_proj.weight",
            "self_attn.o_proj.weight": "attn.attention.out_proj.weight",
            "mlp.gate_proj.weight": "mlp.c_fc_0.weight",
            "mlp.up_proj.weight": "mlp.c_fc_1.weight",
            "mlp.down_proj.weight": "mlp.c_proj.weight",
        }
        return [(f"transformer.h.{i}.{r[rest]}", arr)]

    d, got = _renamed_logits(tmp_path, base_dir, cfg_d, rename, ids)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    gguf = tmp_path / "exaone.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    assert GGUFReader(gguf).get("general.architecture") == "exaone"


def test_internlm2_wqkv_split(base_llama, tmp_path):
    base_dir, ids, ref = base_llama
    nH, nKV, hd = 4, 2, 16
    g = nH // nKV
    cfg_d = {
        "model_type": "internlm2", "architectures": ["InternLM2ForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-5, "bias": False,
        "rope_theta": 10000.0, "max_position_embeddings": 256,
        "tie_word_embeddings": False, "torch_dtype": "float32",
    }
    t = _hf_tensors(base_dir)

    def rename(name, arr):
        m = {
            "model.embed_tokens.weight": "model.tok_embeddings.weight",
            "model.norm.weight": "model.norm.weight",
            "lm_head.weight": "output.weight",
        }
        if name in m:
            return [(m[name], arr)]
        parts = name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        if rest == "self_attn.q_proj.weight":
            # emit the fused, group-interleaved wqkv once per layer
            q = arr.reshape(nKV, g, hd, -1)
            k = t[f"model.layers.{i}.self_attn.k_proj.weight"].reshape(nKV, 1, hd, -1)
            v = t[f"model.layers.{i}.self_attn.v_proj.weight"].reshape(nKV, 1, hd, -1)
            wqkv = np.concatenate([q, k, v], axis=1).reshape(nKV * (g + 2) * hd, -1)
            return [(f"model.layers.{i}.attention.wqkv.weight", wqkv)]
        if rest in ("self_attn.k_proj.weight", "self_attn.v_proj.weight"):
            return []
        r = {
            "input_layernorm.weight": "attention_norm.weight",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "self_attn.o_proj.weight": "attention.wo.weight",
            "mlp.gate_proj.weight": "feed_forward.w1.weight",
            "mlp.up_proj.weight": "feed_forward.w3.weight",
            "mlp.down_proj.weight": "feed_forward.w2.weight",
        }
        return [(f"model.layers.{i}.{r[rest]}", arr)]

    d, got = _renamed_logits(tmp_path, base_dir, cfg_d, rename, ids)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_baichuan_w_pack_split(base_llama, tmp_path):
    base_dir, ids, ref = base_llama
    cfg_d = {
        "model_type": "baichuan", "architectures": ["BaichuanForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "model_max_length": 256,
        "tie_word_embeddings": False, "torch_dtype": "float32",
    }
    t = _hf_tensors(base_dir)

    def rename(name, arr):
        parts = name.split(".")
        if name.endswith("self_attn.q_proj.weight"):
            i = parts[2]
            k = t[f"model.layers.{i}.self_attn.k_proj.weight"]
            v = t[f"model.layers.{i}.self_attn.v_proj.weight"]
            return [(f"model.layers.{i}.self_attn.W_pack.weight",
                     np.concatenate([arr, k, v], axis=0))]
        if name.endswith("self_attn.k_proj.weight") or \
                name.endswith("self_attn.v_proj.weight"):
            return []
        return [(name, arr)]

    d, got = _renamed_logits(tmp_path, base_dir, cfg_d, rename, ids)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert loader.load_config(d).max_position_embeddings == 256


# ---------------------------------------------------------------------------
# minicpm: derived multipliers
# ---------------------------------------------------------------------------


def test_minicpm_config_multipliers():
    d = {
        "model_type": "minicpm", "vocab_size": 128, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32,
    }
    cfg = llama.LlamaConfig.from_hf_dict(d)
    assert cfg.embedding_multiplier == 12.0
    assert cfg.residual_multiplier == pytest.approx(1.4 / 2.0)
    assert cfg.logits_multiplier == pytest.approx(0.5)

    spec = packer.MiniCPMArch(d)
    md = spec.metadata()
    assert md["minicpm.embedding_scale"] == 12.0
    assert md["minicpm.residual_scale"] == pytest.approx(0.7)
    assert md["minicpm.logit_scale"] == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# deepseek v1: leading dense layer + routed/shared experts, full GGUF
# round-trip through the serving loader
# ---------------------------------------------------------------------------


def test_deepseek_v1_moe_roundtrip(tmp_path):
    from gptq_gguf_tpu.serving import model as qmodel

    H, I_dense, I_moe, V = 64, 128, 64, 128
    cfg_d = {
        "model_type": "deepseek", "architectures": ["DeepseekForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I_dense,
        "moe_intermediate_size": I_moe, "n_routed_experts": 4,
        "num_experts_per_tok": 2, "n_shared_experts": 2,
        "first_k_dense_replace": 1, "moe_layer_freq": 1,
        "norm_topk_prob": False, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "torch_dtype": "float32",
    }

    def mat(*shape):
        return (RNG.standard_normal(shape) * 0.05).astype(np.float32)

    t = {
        "model.embed_tokens.weight": mat(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": mat(V, H),
    }
    for i in range(2):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(H, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[f"{p}.self_attn.{proj}.weight"] = mat(H, H)
    # layer 0 dense
    t["model.layers.0.mlp.gate_proj.weight"] = mat(I_dense, H)
    t["model.layers.0.mlp.up_proj.weight"] = mat(I_dense, H)
    t["model.layers.0.mlp.down_proj.weight"] = mat(H, I_dense)
    # layer 1 MoE: router + 4 experts + fused shared expert (2x width)
    t["model.layers.1.mlp.gate.weight"] = mat(4, H)
    for e in range(4):
        t[f"model.layers.1.mlp.experts.{e}.gate_proj.weight"] = mat(I_moe, H)
        t[f"model.layers.1.mlp.experts.{e}.up_proj.weight"] = mat(I_moe, H)
        t[f"model.layers.1.mlp.experts.{e}.down_proj.weight"] = mat(H, I_moe)
    t["model.layers.1.mlp.shared_experts.gate_proj.weight"] = mat(2 * I_moe, H)
    t["model.layers.1.mlp.shared_experts.up_proj.weight"] = mat(2 * I_moe, H)
    t["model.layers.1.mlp.shared_experts.down_proj.weight"] = mat(H, 2 * I_moe)

    d = tmp_path / "deepseek"
    _save_st(d, t)
    _write_cfg(d, cfg_d)

    cfg = loader.load_config(d)
    assert cfg.moe_num_experts == 4 and not cfg.moe_norm_topk
    params = loader.load_params(d, cfg)
    assert "gate_inp" not in params["layers"][0]  # leading dense layer
    assert params["layers"][1]["shared_gate"].shape == (2 * I_moe, H)
    ids = RNG.integers(0, V, size=(1, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))

    gguf = tmp_path / "deepseek.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "deepseek"
    assert r.get("deepseek.leading_dense_block_count") == 1
    assert r.get("deepseek.expert_shared_count") == 2
    assert "blk.1.ffn_gate_exps.weight" in r.tensors
    assert "blk.1.ffn_gate_shexp.weight" in r.tensors
    assert "blk.0.ffn_gate.weight" in r.tensors

    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    cache = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(
        np.asarray(logits), ref[:, -1, :], rtol=2e-3, atol=2e-3
    )
