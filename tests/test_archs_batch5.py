"""Pack-only arch batch (trust-remote-code families, hand-crafted
checkpoints): xverse / orion / internlm3 / minicpm3 / openelm
(reference converter entries: XverseModel :1712, OrionModel :1597,
InternLM3Model :4456, MiniCPM3Model :2904, OpenELMModel :6055)."""

import json
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(45)


def _save(path: Path, cfg, tensors):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              str(path / "model.safetensors"))


def _llama_layer(i, h, ff, n_head, n_kv, head_dim, bias=False, prefix="model.layers"):
    t = {
        f"{prefix}.{i}.input_layernorm.weight": RNG.normal(size=(h,)),
        f"{prefix}.{i}.post_attention_layernorm.weight": RNG.normal(size=(h,)),
        f"{prefix}.{i}.self_attn.q_proj.weight": RNG.normal(size=(n_head * head_dim, h)),
        f"{prefix}.{i}.self_attn.k_proj.weight": RNG.normal(size=(n_kv * head_dim, h)),
        f"{prefix}.{i}.self_attn.v_proj.weight": RNG.normal(size=(n_kv * head_dim, h)),
        f"{prefix}.{i}.self_attn.o_proj.weight": RNG.normal(size=(h, n_head * head_dim)),
        f"{prefix}.{i}.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
        f"{prefix}.{i}.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
        f"{prefix}.{i}.mlp.down_proj.weight": RNG.normal(size=(h, ff)),
    }
    if bias:
        t[f"{prefix}.{i}.input_layernorm.bias"] = RNG.normal(size=(h,))
        t[f"{prefix}.{i}.post_attention_layernorm.bias"] = RNG.normal(size=(h,))
    return t


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_xverse_pack(tmp_path):
    """XVERSE: GQA permute + max_sequence_length context (XverseModel)."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    cfg = {"model_type": "xverse", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "rms_norm_eps": 1e-6,
           "max_sequence_length": 999, "max_position_embeddings": 4}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    t.update(_llama_layer(0, h, ff, nh, nh, hd))
    d = tmp_path / "xverse"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "xverse")
    assert r.get("general.architecture") == "xverse"
    assert r.get("xverse.context_length") == 999
    assert r.get("general.tensor_data_layout") == "Meta AI original pth"
    q = r.tensor_float("blk.0.attn_q.weight")
    perm = packer.gqa_permute_rows(nh * hd, nh)
    raw = t["model.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(
        q, raw[perm].astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_orion_pack(tmp_path):
    """Orion: rms_norm_eps stamped into layer_norm_epsilon (the converter
    quirk), LayerNorm biases mapped, no q/k permute (OrionModel :1627)."""
    h, ff, nh, hd, v = 32, 48, 4, 8, 64
    cfg = {"model_type": "orion", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "rms_norm_eps": 2e-5,
           "max_position_embeddings": 128}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "model.norm.bias": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    t.update(_llama_layer(0, h, ff, nh, nh, hd, bias=True))
    d = tmp_path / "orion"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "orion")
    assert r.get("general.architecture") == "orion"
    assert abs(r.get("orion.attention.layer_norm_epsilon") - 2e-5) < 1e-12
    assert "blk.0.attn_norm.bias" in r.tensors
    assert "output_norm.bias" in r.tensors
    q = r.tensor_float("blk.0.attn_q.weight")
    np.testing.assert_allclose(
        q, t["model.layers.0.self_attn.q_proj.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_internlm3_pack(tmp_path):
    """InternLM3 packs as GGUF arch 'llama' with llama permute."""
    h, ff, nh, nkv, hd, v = 32, 48, 4, 2, 8, 64
    cfg = {"model_type": "internlm3", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    t.update(_llama_layer(0, h, ff, nh, nkv, hd))
    d = tmp_path / "internlm3"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "internlm3")
    assert r.get("general.architecture") == "llama"
    assert r.get("llama.vocab_size") == v
    k = r.tensor_float("blk.0.attn_k.weight")
    perm = packer.gqa_permute_rows(nkv * hd, nkv)
    np.testing.assert_allclose(
        k, t["model.layers.0.self_attn.k_proj.weight"][perm]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_minicpm3_pack(tmp_path):
    """MiniCPM3 MLA: whole attn_kv_b (no deepseek2-style split), lora-rank
    keys, longrope factor tensors (MiniCPM3Model :2904-2954)."""
    h, ff, nh, v = 32, 48, 2, 64
    qk_nope, qk_rope, dv, q_rank, kv_rank = 8, 4, 8, 16, 12
    cfg = {"model_type": "minicpm3", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nh,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128,
           "qk_nope_head_dim": qk_nope, "qk_rope_head_dim": qk_rope,
           "v_head_dim": dv, "q_lora_rank": q_rank, "kv_lora_rank": kv_rank,
           "rope_scaling": {"type": "longrope",
                            "long_factor": [2.0, 2.0], "short_factor": [1.0, 1.0]}}
    qk = qk_nope + qk_rope
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.self_attn.q_a_proj.weight": RNG.normal(size=(q_rank, h)),
         "model.layers.0.self_attn.q_a_layernorm.weight": RNG.normal(size=(q_rank,)),
         "model.layers.0.self_attn.q_b_proj.weight": RNG.normal(size=(nh * qk, q_rank)),
         "model.layers.0.self_attn.kv_a_proj_with_mqa.weight":
             RNG.normal(size=(kv_rank + qk_rope, h)),
         "model.layers.0.self_attn.kv_a_layernorm.weight": RNG.normal(size=(kv_rank,)),
         "model.layers.0.self_attn.kv_b_proj.weight":
             RNG.normal(size=(nh * (qk_nope + dv), kv_rank)),
         "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, nh * dv)),
         "model.layers.0.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.down_proj.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "minicpm3"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "minicpm3")
    assert r.get("general.architecture") == "minicpm3"
    assert r.get("minicpm3.attention.q_lora_rank") == q_rank
    assert r.get("minicpm3.attention.kv_lora_rank") == kv_rank
    assert r.get("minicpm3.attention.key_length") == qk
    assert r.get("minicpm3.rope.dimension_count") == qk_rope
    # kv_b kept whole
    kvb = r.tensor_float("blk.0.attn_kv_b.weight")
    assert kvb.shape == (nh * (qk_nope + dv), kv_rank)
    assert "blk.0.attn_k_b.weight" not in r.tensors
    np.testing.assert_allclose(r.tensor_float("rope_factors_long.weight"), [2.0, 2.0])
    for n in ("blk.0.attn_q_a.weight", "blk.0.attn_q_a_norm.weight",
              "blk.0.attn_kv_a_mqa.weight", "blk.0.attn_kv_a_norm.weight"):
        assert n in r.tensors, n


def test_openelm_pack(tmp_path):
    """OpenELM: per-layer head/FFN arrays, fused qkv kept, proj_1 split at
    the per-layer width (OpenELMModel :6055-6127)."""
    dm, hd, v = 32, 8, 64
    nq, nkv = [4, 2], [2, 1]
    mult, div = [0.5, 1.0], 16
    from gptq_gguf_tpu.export.packer import OpenElmArch
    cfg = {"model_type": "openelm", "vocab_size": v, "model_dim": dm,
           "num_transformer_layers": 2, "head_dim": hd,
           "num_query_heads": nq, "num_kv_heads": nkv,
           "ffn_multipliers": mult, "ffn_dim_divisor": div,
           "max_context_length": 256, "rope_freq_constant": 10000}
    ffn = OpenElmArch(cfg)._ffn_dims()
    t = {"transformer.token_embeddings.weight": RNG.normal(size=(v, dm)),
         "transformer.norm.weight": RNG.normal(size=(dm,))}
    for i in range(2):
        qkv_rows = (nq[i] + 2 * nkv[i]) * hd
        t.update({
            f"transformer.layers.{i}.attn_norm.weight": RNG.normal(size=(dm,)),
            f"transformer.layers.{i}.attn.qkv_proj.weight": RNG.normal(size=(qkv_rows, dm)),
            f"transformer.layers.{i}.attn.q_norm.weight": RNG.normal(size=(hd,)),
            f"transformer.layers.{i}.attn.k_norm.weight": RNG.normal(size=(hd,)),
            f"transformer.layers.{i}.attn.out_proj.weight": RNG.normal(size=(dm, nq[i] * hd)),
            f"transformer.layers.{i}.ffn_norm.weight": RNG.normal(size=(dm,)),
            f"transformer.layers.{i}.ffn.proj_1.weight": RNG.normal(size=(2 * ffn[i], dm)),
            f"transformer.layers.{i}.ffn.proj_2.weight": RNG.normal(size=(dm, ffn[i])),
        })
    d = tmp_path / "openelm"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "openelm")
    assert r.get("general.architecture") == "openelm"
    assert r.get("openelm.attention.head_count") == nq
    assert r.get("openelm.attention.head_count_kv") == nkv
    assert r.get("openelm.feed_forward_length") == ffn
    assert abs(r.get("openelm.attention.layer_norm_rms_epsilon") - 1e-6) < 1e-12
    # fused qkv kept fused; proj_1 split at per-layer width
    assert "blk.1.attn_qkv.weight" in r.tensors
    g = r.tensor_float("blk.0.ffn_gate.weight")
    u = r.tensor_float("blk.0.ffn_up.weight")
    assert g.shape == (ffn[0], dm) and u.shape == (ffn[0], dm)
    raw = t["transformer.layers.0.ffn.proj_1.weight"]
    np.testing.assert_allclose(
        g, raw[:ffn[0]].astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        u, raw[ffn[0]:].astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # tied output not emitted (llama.cpp reuses token_embd)
    assert "output.weight" not in r.tensors
