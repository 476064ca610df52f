"""MoE packer/splitter tests: stacked ffn_*_exps tensors (reference
gguf_splitter.py:148-282, pack via convert_hf_to_gguf MoE stacking)."""

import json

import numpy as np
import pytest

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.mapper import splitter

RNG = np.random.default_rng(37)

MOE_CFG = {
    "model_type": "qwen3_moe", "architectures": ["Qwen3MoeForCausalLM"],
    "vocab_size": 128, "hidden_size": 256, "intermediate_size": 256,
    "moe_intermediate_size": 256, "num_experts": 4, "num_experts_per_tok": 2,
    "num_hidden_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
    "head_dim": 64, "rms_norm_eps": 1e-6, "max_position_embeddings": 256,
    "decoder_sparse_step": 1, "mlp_only_layers": [], "norm_topk_prob": True,
    "torch_dtype": "float32", "pad_token_id": 0, "tie_word_embeddings": False,
}


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("moe")
    cfg = AutoConfig.for_model(**MOE_CFG)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    model_dir = tmp / "hf"
    m.save_pretrained(model_dir, safe_serialization=True)
    return tmp, model_dir, m


def test_moe_pack_float(moe_model):
    tmp, model_dir, m = moe_model
    out = tmp / "moe-f16.gguf"
    packer.pack_model(model_dir, tmp / "no-artifacts", out)
    r = GGUFReader(out)
    assert r.get("general.architecture") == "qwen3moe"
    assert r.get("qwen3moe.expert_count") == 4
    assert r.get("qwen3moe.expert_used_count") == 2
    assert r.get("qwen3moe.expert_feed_forward_length") == 256
    info = r.tensors["blk.0.ffn_gate_exps.weight"]
    assert info.shape == (4, 256, 256)
    assert "blk.0.ffn_gate_inp.weight" in r.tensors
    # stacked expert data matches the HF per-expert weights
    w = r.tensor_float("blk.0.ffn_gate_exps.weight")
    sd = m.state_dict()
    for e in range(4):
        ref = sd[f"model.layers.0.mlp.experts.{e}.gate_proj.weight"].numpy()
        np.testing.assert_allclose(w[e], ref.astype(np.float16).astype(np.float32))


def test_moe_pack_quantized_experts(moe_model):
    """Per-expert K-quant artifacts stack into one quantized 3-D tensor."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.ops import kquant
    from gptq_gguf_tpu.quant import artifacts

    tmp, model_dir, m = moe_model
    qdir = tmp / "layers"
    sd = m.state_dict()
    for li in range(2):
        for e in range(4):
            for proj in ("gate_proj", "up_proj", "down_proj"):
                name = f"model.layers.{li}.mlp.experts.{e}.{proj}"
                wt = sd[name + ".weight"].numpy()
                q, p = kquant.quantize_rtn(jnp.asarray(wt), T.Q4_K)
                artifacts.save_layer(
                    qdir, name,
                    artifacts.LayerArtifact.from_result(T.Q4_K, q.astype(jnp.uint8), p),
                )
    out = tmp / "moe-q4k.gguf"
    packer.pack_model(model_dir, qdir, out)
    r = GGUFReader(out)
    info = r.tensors["blk.1.ffn_down_exps.weight"]
    assert info.ggml_type == T.Q4_K
    assert info.shape == (4, 256, 256)
    # expert 2's slab dequantizes to its artifact's dequantization
    art = artifacts.load_layer(qdir, "model.layers.1.mlp.experts.2.down_proj")
    w = r.tensor_float("blk.1.ffn_down_exps.weight")
    np.testing.assert_allclose(w[2], art.dequantize(), rtol=1e-6, atol=1e-7)


def test_moe_split_roundtrip(moe_model):
    tmp, model_dir, m = moe_model
    gguf = tmp / "moe-f16.gguf"
    if not gguf.exists():
        packer.pack_model(model_dir, tmp / "no-artifacts", gguf)
    # raw split keeps the stacked tensor as one DB entry
    db1 = tmp / "db-gguf"
    splitter.split_gguf(gguf, db1)
    assert (db1 / "blk.0.ffn_gate_exps.weight").is_dir()
    # HF split fans experts out to per-expert torch tensors
    import torch

    db2 = tmp / "db-hf"
    splitter.split_hf(gguf, db2)
    d = db2 / "model.layers.0.mlp.experts.3.up_proj"
    assert d.is_dir(), sorted(p.name for p in db2.iterdir())[:10]
    t = torch.load(next(d.glob("*.pth")), weights_only=True)
    ref = m.state_dict()["model.layers.0.mlp.experts.3.up_proj.weight"].numpy()
    np.testing.assert_allclose(
        t.float().numpy(), ref.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-3
    )
    with open(db2 / "hf_to_gguf_mapping.json") as f:
        mapping = json.load(f)
    assert mapping["model.layers.0.mlp.experts.3.up_proj.weight"] == "blk.0.ffn_up_exps.weight"


def test_gguf_to_hf_name_moe():
    assert splitter.gguf_to_hf_name("blk.3.ffn_down_exps.weight") == \
        "model.layers.3.mlp.experts.{e}.down_proj.weight"
    assert splitter.gguf_to_hf_name("blk.0.ffn_gate_inp.weight") == \
        "model.layers.0.mlp.gate.weight"
