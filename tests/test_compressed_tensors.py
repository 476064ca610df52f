"""compressed-tensors importer tests (export/compressed_tensors.py).

Oracle: our own unpack_from_int32 must invert a straight pack, and the
packed Q4_0 GGUF must dequantize to scale * signed-code exactly
(reference pack_Q4_0 semantics, pack_compressed_tensors_into_gguf.py:8717-8741).
"""

import json

import numpy as np
import pytest

from gptq_gguf_tpu.export import compressed_tensors as ct
from gptq_gguf_tpu.export.packer import gqa_permute_rows
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T

RNG = np.random.default_rng(41)


def pack_to_int32(q_signed: np.ndarray, num_bits: int = 4) -> np.ndarray:
    """compressed-tensors' forward packing (for the test fixture)."""
    offset = 1 << (num_bits - 1)
    u = (q_signed.astype(np.int32) + offset).astype(np.uint32)
    pf = 32 // num_bits
    rows, cols = u.shape
    padded = np.zeros((rows, -(-cols // pf) * pf), np.uint32)
    padded[:, :cols] = u
    out = np.zeros((rows, padded.shape[1] // pf), np.uint32)
    for j in range(pf):
        out |= padded[:, j::pf] << (num_bits * j)
    return out.view(np.int32)


def test_unpack_from_int32_roundtrip():
    q = RNG.integers(-8, 8, size=(16, 96)).astype(np.int8)
    packed = pack_to_int32(q)
    out = ct.unpack_from_int32(packed, 4, (16, 96))
    np.testing.assert_array_equal(out, q)


def test_pack_q4_0_from_codes_dequant():
    q = RNG.integers(-8, 8, size=(8, 128)).astype(np.int8)
    scales = (np.abs(RNG.normal(size=(8, 1))) * 0.1 + 0.01).astype(np.float32)  # G=128
    blocks = ct.pack_q4_0_from_codes(q, scales)
    from gptq_gguf_tpu.formats import ggml

    w = ggml.dequant_q4_0(blocks).reshape(8, 128)
    expect = scales.astype(np.float16).astype(np.float32) * q.astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def ct_checkpoint(tmp_path_factory):
    """Tiny llama checkpoint in compressed-tensors layout (group-64 sym W4)."""
    from safetensors.numpy import save_file

    tmp = tmp_path_factory.mktemp("ct")
    H, I, V, L = 128, 192, 64, 2
    G = 64
    cfg = {
        "model_type": "llama", "vocab_size": V, "hidden_size": H,
        "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 256,
        "tie_word_embeddings": False,
        "quantization_config": {
            "quant_method": "compressed-tensors",
            "format": "pack-quantized",
            "config_groups": {"group_0": {"weights": {
                "num_bits": 4, "symmetric": True, "strategy": "group",
                "group_size": G,
            }}},
        },
    }
    with open(tmp / "config.json", "w") as f:
        json.dump(cfg, f)

    shapes = {
        "self_attn.q_proj": (H, H), "self_attn.k_proj": (64, H),
        "self_attn.v_proj": (64, H), "self_attn.o_proj": (H, H),
        "mlp.gate_proj": (I, H), "mlp.up_proj": (I, H), "mlp.down_proj": (H, I),
    }
    tensors = {}
    raw = {}
    for li in range(L):
        for mod, (r, c) in shapes.items():
            base = f"model.layers.{li}.{mod}"
            q = RNG.integers(-8, 8, size=(r, c)).astype(np.int8)
            s = (np.abs(RNG.normal(size=(r, c // G))) * 0.1 + 0.01).astype(np.float16)
            raw[base] = (q, s)
            tensors[base + ".weight_packed"] = pack_to_int32(q)
            tensors[base + ".weight_shape"] = np.array([r, c], np.int64)
            tensors[base + ".weight_scale"] = s
            tensors[base + ".weight"] = (
                s.astype(np.float32).repeat(G, axis=1) * q
            ).astype(np.float32)
        for norm in ("input_layernorm", "post_attention_layernorm"):
            tensors[f"model.layers.{li}.{norm}.weight"] = np.ones(H, np.float32)
    tensors["model.embed_tokens.weight"] = RNG.normal(size=(V, H)).astype(np.float32)
    tensors["model.norm.weight"] = np.ones(H, np.float32)
    tensors["lm_head.weight"] = RNG.normal(size=(V, H)).astype(np.float32)
    save_file(tensors, tmp / "model.safetensors")
    return tmp, raw, cfg


def test_pack_compressed_tensors_model(ct_checkpoint):
    tmp, raw, cfg = ct_checkpoint
    out = tmp / "ct.gguf"
    ct.pack_compressed_tensors_model(tmp, out)
    r = GGUFReader(out)
    assert r.get("general.file_type") == 2  # MOSTLY_Q4_0
    info = r.tensors["blk.0.ffn_gate.weight"]
    assert info.ggml_type == T.Q4_0

    # unpermuted tensor: dequant == scale * code (f16 scale rounding only)
    q, s = raw["model.layers.0.mlp.gate_proj"]
    expect = s.astype(np.float32).repeat(64, axis=1) * q
    np.testing.assert_allclose(r.tensor_float("blk.0.ffn_gate.weight"), expect,
                               rtol=1e-6, atol=1e-7)

    # q_proj: GQA permutation must hit codes and scales coherently
    q, s = raw["model.layers.0.self_attn.q_proj"]
    perm = gqa_permute_rows(q.shape[0], cfg["num_attention_heads"])
    expect = (s.astype(np.float32).repeat(64, axis=1) * q)[perm]
    np.testing.assert_allclose(r.tensor_float("blk.0.attn_q.weight"), expect,
                               rtol=1e-6, atol=1e-7)


def test_pack_compressed_rejects_act_order(ct_checkpoint, tmp_path):
    from safetensors.numpy import save_file

    tmp, raw, cfg = ct_checkpoint
    import shutil

    dst = tmp_path / "ao"
    shutil.copytree(tmp, dst, ignore=shutil.ignore_patterns("*.gguf"))
    q, s = raw["model.layers.0.mlp.gate_proj"]
    extra = {"model.layers.0.mlp.gate_proj.weight_g_idx":
             RNG.permutation(q.shape[1]).astype(np.int32) // 64}
    from safetensors import safe_open

    with safe_open(dst / "model.safetensors", framework="numpy") as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    tensors.update(extra)
    save_file(tensors, dst / "model.safetensors")
    with pytest.raises(NotImplementedError, match="g_idx"):
        ct.pack_compressed_tensors_model(dst, dst / "x.gguf")
