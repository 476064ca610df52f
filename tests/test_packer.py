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


def test_phi3_fused_pack(tmp_path):
    """phi3: split-at-load, quantize, re-fuse at pack; GGUF holds attn_qkv."""
    import json as _json
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptq_gguf_tpu.quant import calibrate

    cfg_d = {
        "model_type": "phi3",
        "architectures": ["Phi3ForCausalLM"],
        "vocab_size": 256, "hidden_size": 256, "intermediate_size": 512,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 512, "torch_dtype": "float32",
        "pad_token_id": 0,
    }
    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(11)
    model = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp_path / "phi3"
    model.save_pretrained(model_dir, safe_serialization=True)

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    # loader split fused projections
    assert params["layers"][0]["q_proj"].shape == (256, 256)
    assert params["layers"][0]["k_proj"].shape == (128, 256)
    assert params["layers"][0]["gate_proj"].shape == (512, 256)

    # logits parity with HF
    import jax.numpy as jnp
    from gptq_gguf_tpu.models import llama as llama_mod

    ids = RNG.integers(0, 256, size=(1, 24))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_mod.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    calib = [RNG.integers(0, 256, size=(1, 32)) for _ in range(2)]
    qdir = tmp_path / "layers"
    calibrate.quantize_model(params, cfg, calib, save_dir=qdir)
    out = tmp_path / "phi3.gguf"
    packer.pack_model(model_dir, qdir, out)

    r = GGUFReader(out)
    assert r.get("general.architecture") == "phi3"
    info = r.tensors["blk.0.attn_qkv.weight"]
    assert info.ggml_type == T.Q4_K
    assert info.shape == (512, 256)  # 256 q + 128 k + 128 v rows
    assert r.tensors["blk.0.ffn_up.weight"].shape == (1024, 256)  # gate+up
    # fused dequant equals concat of split artifacts
    q_art = artifacts.load_layer(qdir, "model.layers.0.self_attn.q_proj").dequantize()
    k_art = artifacts.load_layer(qdir, "model.layers.0.self_attn.k_proj").dequantize()
    v_art = artifacts.load_layer(qdir, "model.layers.0.self_attn.v_proj").dequantize()
    np.testing.assert_allclose(
        r.tensor_float("blk.0.attn_qkv.weight"),
        np.concatenate([q_art, k_art, v_art], axis=0), rtol=1e-6, atol=1e-7,
    )


# ---------------------------------------------------------------------------
# Tokenizer metadata (SPM / BPE / Unigram)
# ---------------------------------------------------------------------------


def test_spm_tokenizer_metadata(tmp_path):
    from gptq_gguf_tpu.export import spm

    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [(f"tok{i}", -float(i), 1) for i in range(10)]
    pieces += [("<0x0A>", 0.0, 6)]
    (tmp_path / "tokenizer.model").write_bytes(
        spm.build_model(pieces, unk_id=0, bos_id=1, eos_id=2, pad_id=-1)
    )
    with open(tmp_path / "added_tokens.json", "w") as f:
        json.dump({"<extra>": 14}, f)
    md = packer.tokenizer_metadata(tmp_path, "gemma2")
    assert md["tokenizer.ggml.model"] == "llama"
    assert md["tokenizer.ggml.tokens"][:3] == ["<unk>", "<s>", "</s>"]
    assert md["tokenizer.ggml.token_type"][0] == 2  # UNKNOWN
    assert md["tokenizer.ggml.token_type"][13] == 6  # BYTE
    assert md["tokenizer.ggml.tokens"][14] == "<extra>"
    assert md["tokenizer.ggml.token_type"][14] == 3  # CONTROL
    assert md["tokenizer.ggml.scores"][5] == -2.0
    assert md["tokenizer.ggml.bos_token_id"] == 1
    assert md["tokenizer.ggml.eos_token_id"] == 2
    assert md["tokenizer.ggml.unknown_token_id"] == 0
    assert "tokenizer.ggml.padding_token_id" not in md


def test_unigram_tokenizer_metadata(tmp_path):
    tok = {
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [["<unk>", 0.0], ["a", -1.5], ["b", -2.5], ["<0xFF>", 0.0]],
        },
        "added_tokens": [{"id": 4, "content": "<sp>", "special": True}],
    }
    with open(tmp_path / "tokenizer.json", "w") as f:
        json.dump(tok, f)
    md = packer.tokenizer_metadata(tmp_path, "llama")
    assert md["tokenizer.ggml.model"] == "llama"
    assert md["tokenizer.ggml.token_type"] == [2, 1, 1, 6, 3]
    assert md["tokenizer.ggml.scores"][1] == -1.5


def test_bpe_pre_tokenizer_tag(tmp_path):
    tok = {"model": {"type": "BPE", "vocab": {"a": 0, "b": 1}, "merges": []}}
    with open(tmp_path / "tokenizer.json", "w") as f:
        json.dump(tok, f)
    assert packer.tokenizer_metadata(tmp_path, "qwen2")["tokenizer.ggml.pre"] == "qwen2"
    assert packer.tokenizer_metadata(tmp_path, "llama")["tokenizer.ggml.pre"] == "llama-bpe"


def test_unsupported_tokenizer_raises(tmp_path):
    with open(tmp_path / "tokenizer.json", "w") as f:
        json.dump({"model": {"type": "WordLevel", "vocab": {}}}, f)
    with pytest.raises(NotImplementedError):
        packer.tokenizer_metadata(tmp_path, "llama")


def test_gemma2_metadata_key_length():
    cfg = {
        "model_type": "gemma2", "vocab_size": 1024, "hidden_size": 2304,
        "intermediate_size": 9216, "num_hidden_layers": 26,
        "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 256,
    }
    md = packer.Gemma2Arch(cfg).metadata()
    assert md["gemma2.attention.key_length"] == 256
    assert md["gemma2.attention.value_length"] == 256
    assert md["gemma2.attn_logit_softcapping"] == 50.0


def test_pack_outtype_bf16_q8_and_vocab_only(tmp_path):
    """Reference --outtype/--vocab-only parity: bf16 + q8_0 fallbacks and a
    tensor-free vocab GGUF."""
    import ml_dtypes
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T

    cfg = {
        "model_type": "llama", "architectures": ["LlamaForCausalLM"],
        "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 128,
    }
    rng = np.random.default_rng(9)
    t = {"model.embed_tokens.weight": rng.normal(size=(64, 32)).astype(np.float32),
         "model.norm.weight": rng.normal(size=(32,)).astype(np.float32),
         "lm_head.weight": rng.normal(size=(64, 32)).astype(np.float32),
         "model.layers.0.input_layernorm.weight": rng.normal(size=(32,)).astype(np.float32),
         "model.layers.0.post_attention_layernorm.weight": rng.normal(size=(32,)).astype(np.float32),
         "model.layers.0.self_attn.q_proj.weight": rng.normal(size=(32, 32)).astype(np.float32),
         "model.layers.0.self_attn.k_proj.weight": rng.normal(size=(16, 32)).astype(np.float32),
         "model.layers.0.self_attn.v_proj.weight": rng.normal(size=(16, 32)).astype(np.float32),
         "model.layers.0.self_attn.o_proj.weight": rng.normal(size=(32, 32)).astype(np.float32),
         "model.layers.0.mlp.gate_proj.weight": rng.normal(size=(64, 32)).astype(np.float32),
         "model.layers.0.mlp.up_proj.weight": rng.normal(size=(64, 32)).astype(np.float32),
         "model.layers.0.mlp.down_proj.weight": rng.normal(size=(32, 64)).astype(np.float32)}
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    from safetensors.numpy import save_file
    save_file(t, str(d / "model.safetensors"))
    json.dump({"model": {"type": "BPE", "vocab": {f"<t{i}>": i for i in range(64)},
                         "merges": []}, "added_tokens": []},
              open(d / "tokenizer.json", "w"))

    # bf16
    out = tmp_path / "bf16.gguf"
    packer.pack_model(d, tmp_path / "none", out, default_float=T.BF16)
    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == T.BF16
    assert r.get("general.file_type") == 32
    got = r.tensor_float("blk.0.ffn_up.weight")  # unpermuted tensor
    want = t["model.layers.0.mlp.up_proj.weight"].astype(
        ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # q8_0: 32-divisible rows quantize, norms stay f32
    out = tmp_path / "q8.gguf"
    packer.pack_model(d, tmp_path / "none", out, default_float=T.Q8_0)
    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == T.Q8_0
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == T.F32
    assert r.get("general.file_type") == 7
    got = r.tensor_float("blk.0.ffn_up.weight")
    np.testing.assert_allclose(got, t["model.layers.0.mlp.up_proj.weight"],
                               rtol=2e-2, atol=2e-2)

    # vocab-only: metadata + tokenizer, zero tensors
    out = tmp_path / "vocab.gguf"
    packer.pack_model(d, tmp_path / "none", out, vocab_only=True)
    r = GGUFReader(out)
    assert len(r.tensors) == 0
    assert r.get("tokenizer.ggml.model") == "gpt2"
    assert r.get("llama.block_count") == 1
