"""GGUF export tests: quantize tiny model -> pack -> read back & verify."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.models import loader
from gptq_gguf_tpu.quant import artifacts, calibrate

RNG = np.random.default_rng(8)


def write_tiny_tokenizer(model_dir):
    vocab = {f"<t{i}>": i for i in range(256)}
    tok = {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [
            {"id": 0, "content": "<t0>", "special": True},
        ],
    }
    with open(model_dir / "tokenizer.json", "w") as f:
        json.dump(tok, f)
    with open(model_dir / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token_id": 0, "eos_token_id": 1}, f)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    from tests.test_model import make_tiny_hf_model

    tmp = tmp_path_factory.mktemp("pack")
    model_dir, _ = make_tiny_hf_model(tmp, seed=5)
    write_tiny_tokenizer(model_dir)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    calib = [RNG.integers(0, cfg.vocab_size, size=(1, 64)) for _ in range(4)]
    quant_dir = tmp / "layers"
    calibrate.quantize_model(params, cfg, calib, save_dir=quant_dir)
    out = tmp / "model-Q4_K.gguf"
    packer.pack_model(model_dir, quant_dir, out)
    return model_dir, quant_dir, out, cfg


def test_gguf_structure(packed):
    model_dir, quant_dir, out, cfg = packed
    r = GGUFReader(out)
    assert r.get("general.architecture") == "llama"
    assert r.get("llama.block_count") == cfg.num_hidden_layers
    assert r.get("llama.embedding_length") == cfg.hidden_size
    assert r.get("llama.attention.head_count") == cfg.num_attention_heads
    assert r.get("llama.attention.head_count_kv") == cfg.num_key_value_heads
    assert r.get("general.file_type") == 15  # MOSTLY_Q4_K_M
    assert len(r.get("tokenizer.ggml.tokens")) == 256
    assert r.get("tokenizer.ggml.model") == "gpt2"

    # all expected tensors present
    for i in range(cfg.num_hidden_layers):
        for t in ("attn_q", "attn_k", "attn_v", "attn_output", "ffn_gate", "ffn_up", "ffn_down"):
            assert f"blk.{i}.{t}.weight" in r.tensors
        assert r.tensors[f"blk.{i}.attn_norm.weight"].ggml_type == T.F32
    assert "token_embd.weight" in r.tensors
    assert "output.weight" in r.tensors
    assert "output_norm.weight" in r.tensors
    # quantized tensors have the right type + shape (numpy order)
    qinfo = r.tensors["blk.0.attn_q.weight"]
    assert qinfo.ggml_type == T.Q4_K
    assert qinfo.shape == (cfg.hidden_size, cfg.hidden_size)


def test_q_k_gqa_permutation_applied(packed):
    """Dequantized GGUF q/k tensors must equal the row-permuted dequantized
    artifacts (permutation must hit codes AND scales coherently)."""
    model_dir, quant_dir, out, cfg = packed
    r = GGUFReader(out)
    for mod, gguf_name, n_head in (
        ("model.layers.0.self_attn.q_proj", "blk.0.attn_q.weight", cfg.num_attention_heads),
        ("model.layers.0.self_attn.k_proj", "blk.0.attn_k.weight", cfg.num_key_value_heads),
    ):
        art = artifacts.load_layer(quant_dir, mod)
        w_art = art.dequantize()
        perm = packer.gqa_permute_rows(w_art.shape[0], n_head)
        w_gguf = r.tensor_float(gguf_name)
        np.testing.assert_allclose(w_gguf, w_art[perm], rtol=1e-6, atol=1e-7)


def test_unpermuted_tensors_match(packed):
    model_dir, quant_dir, out, cfg = packed
    r = GGUFReader(out)
    for mod, gguf_name in (
        ("model.layers.1.self_attn.v_proj", "blk.1.attn_v.weight"),
        ("model.layers.1.mlp.down_proj", "blk.1.ffn_down.weight"),
    ):
        art = artifacts.load_layer(quant_dir, mod)
        np.testing.assert_allclose(r.tensor_float(gguf_name), art.dequantize(), rtol=1e-6, atol=1e-7)


def test_permutation_is_bijection():
    perm = packer.gqa_permute_rows(64, 4)
    assert sorted(perm.tolist()) == list(range(64))
