"""Pack-only MoE/MLA arch batch: arctic / smallthinker / bailing_moe / plm
(reference converter entries: ArcticModel :6130, SmallThinkerModel :8519,
BailingMoeModel :7735, PLMModel :6587)."""

import json
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(47)


def _save(path: Path, cfg, tensors):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              str(path / "model.safetensors"))


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_arctic_pack(tmp_path):
    """Arctic: residual MLP -> dense ffn slots, post_attention_layernorm ->
    ffn_norm_exps, w1/w3/w2 expert stacks, llama permute."""
    h, ff, nh, nkv, hd, v, ne = 32, 48, 4, 2, 8, 64, 4
    cfg = {"model_type": "arctic", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
           "num_local_experts": ne, "num_experts_per_tok": 2}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.residual_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.residual_mlp.w1.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.residual_mlp.w2.weight": RNG.normal(size=(h, ff)),
         "model.layers.0.residual_mlp.w3.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.self_attn.q_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.layers.0.self_attn.k_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.layers.0.self_attn.v_proj.weight": RNG.normal(size=(nkv * hd, h)),
         "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, nh * hd)),
         "model.layers.0.block_sparse_moe.gate.weight": RNG.normal(size=(ne, h))}
    for e in range(ne):
        t[f"model.layers.0.block_sparse_moe.experts.{e}.w1.weight"] = RNG.normal(size=(ff, h))
        t[f"model.layers.0.block_sparse_moe.experts.{e}.w2.weight"] = RNG.normal(size=(h, ff))
        t[f"model.layers.0.block_sparse_moe.experts.{e}.w3.weight"] = RNG.normal(size=(ff, h))
    d = tmp_path / "arctic"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "arctic")
    assert r.get("general.architecture") == "arctic"
    assert r.get("arctic.expert_count") == ne
    for n in ("blk.0.ffn_norm.weight", "blk.0.ffn_norm_exps.weight",
              "blk.0.ffn_gate.weight", "blk.0.ffn_gate_exps.weight",
              "blk.0.ffn_gate_inp.weight"):
        assert n in r.tensors, n
    # residual ffn_norm comes from residual_layernorm
    np.testing.assert_allclose(
        r.tensor_float("blk.0.ffn_norm.weight"),
        t["model.layers.0.residual_layernorm.weight"].astype(np.float32))
    # expert stack w2 -> down, expert-major
    de = r.tensor_float("blk.0.ffn_down_exps.weight")
    np.testing.assert_allclose(
        de[3], t["model.layers.0.block_sparse_moe.experts.3.w2.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # q permuted
    q = r.tensor_float("blk.0.attn_q.weight")
    perm = packer.gqa_permute_rows(nh * hd, nh)
    np.testing.assert_allclose(
        q, t["model.layers.0.self_attn.q_proj.weight"][perm]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_smallthinker_pack(tmp_path):
    """SmallThinker: primary_router gate, moe_ffn_hidden_size doubles as
    FF length, sigmoid gating flag, sliding window from layout."""
    h, nh, hd, v, ne, mff = 32, 4, 8, 64, 4, 48
    cfg = {"model_type": "smallthinker", "vocab_size": v, "hidden_size": h,
           "num_hidden_layers": 1, "num_attention_heads": nh,
           "num_key_value_heads": nh, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128,
           "moe_num_primary_experts": ne, "moe_num_active_primary_experts": 2,
           "moe_ffn_hidden_size": mff,
           "moe_primary_router_apply_softmax": False,
           "sliding_window_layout": [0, 1], "sliding_window_size": 512}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.self_attn.q_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.layers.0.self_attn.k_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.layers.0.self_attn.v_proj.weight": RNG.normal(size=(nh * hd, h)),
         "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, nh * hd)),
         "model.layers.0.block_sparse_moe.primary_router.weight":
             RNG.normal(size=(ne, h))}
    for e in range(ne):
        t[f"model.layers.0.block_sparse_moe.experts.{e}.gate.weight"] = RNG.normal(size=(mff, h))
        t[f"model.layers.0.block_sparse_moe.experts.{e}.up.weight"] = RNG.normal(size=(mff, h))
        t[f"model.layers.0.block_sparse_moe.experts.{e}.down.weight"] = RNG.normal(size=(h, mff))
    d = tmp_path / "smallthinker"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "smallthinker")
    assert r.get("general.architecture") == "smallthinker"
    assert r.get("smallthinker.expert_count") == ne
    assert r.get("smallthinker.expert_used_count") == 2
    assert r.get("smallthinker.feed_forward_length") == mff
    assert r.get("smallthinker.expert_feed_forward_length") == mff
    assert r.get("smallthinker.expert_gating_func") == 2  # sigmoid
    assert r.get("smallthinker.attention.sliding_window") == 512
    assert "blk.0.ffn_gate_inp.weight" in r.tensors
    ue = r.tensor_float("blk.0.ffn_up_exps.weight")
    assert ue.shape == (ne, mff, h)


def test_bailing_moe_pack(tmp_path):
    """BailingMoe: fused qkv split + permute, shared_experts singularized,
    norm_head output normalization, leading dense count."""
    h, nh, nkv, hd, v, ne, mff = 32, 4, 2, 8, 64, 4, 24
    cfg = {"model_type": "bailing_moe", "vocab_size": v, "hidden_size": h,
           "intermediate_size": 48, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
           "num_experts": ne, "num_experts_per_tok": 2,
           "moe_intermediate_size": mff, "num_shared_experts": 1,
           "first_k_dense_replace": 0, "norm_topk_prob": True,
           "norm_head": True, "head_dim": hd}
    qkv = RNG.normal(size=((nh + 2 * nkv) * hd, h))
    t = {"model.word_embeddings.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.attention.query_key_value.weight": qkv,
         "model.layers.0.attention.dense.weight": RNG.normal(size=(h, nh * hd)),
         "model.layers.0.mlp.gate.weight": RNG.normal(size=(ne, h)),
         "model.layers.0.mlp.shared_experts.gate_proj.weight": RNG.normal(size=(mff, h)),
         "model.layers.0.mlp.shared_experts.up_proj.weight": RNG.normal(size=(mff, h)),
         "model.layers.0.mlp.shared_experts.down_proj.weight": RNG.normal(size=(h, mff))}
    for e in range(ne):
        t[f"model.layers.0.mlp.experts.{e}.gate_proj.weight"] = RNG.normal(size=(mff, h))
        t[f"model.layers.0.mlp.experts.{e}.up_proj.weight"] = RNG.normal(size=(mff, h))
        t[f"model.layers.0.mlp.experts.{e}.down_proj.weight"] = RNG.normal(size=(h, mff))
    d = tmp_path / "bailing"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "bailing")
    assert r.get("general.architecture") == "bailingmoe"
    assert r.get("bailingmoe.expert_shared_count") == 1
    assert r.get("bailingmoe.expert_weights_scale") == 1.0
    assert r.get("bailingmoe.expert_weights_norm") is True
    # qkv split + permute
    q = r.tensor_float("blk.0.attn_q.weight")
    perm = packer.gqa_permute_rows(nh * hd, nh)
    np.testing.assert_allclose(
        q, qkv[:nh * hd][perm].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    vv = r.tensor_float("blk.0.attn_v.weight")
    np.testing.assert_allclose(
        vv, qkv[(nh + nkv) * hd:].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    # shared expert singular names
    assert "blk.0.ffn_gate_shexp.weight" in r.tensors
    # norm_head: output columns L2-normalized
    out = r.tensor_float("output.weight")
    raw = t["lm_head.weight"].astype(np.float32)
    want = raw / (np.linalg.norm(raw, axis=0, keepdims=True) + 1e-7)
    np.testing.assert_allclose(
        out, want.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_plm_pack(tmp_path):
    """PLM: kv-lora MLA-lite with plain q_proj and whole attn_kv_b."""
    h, ff, nh, v = 32, 48, 2, 64
    qk_nope, qk_rope, dv, kv_rank = 8, 4, 8, 12
    qk = qk_nope + qk_rope
    cfg = {"model_type": "plm", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nh,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
           "qk_nope_head_dim": qk_nope, "qk_rope_head_dim": qk_rope,
           "v_head_dim": dv, "kv_lora_rank": kv_rank}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         "model.layers.0.self_attn.q_proj.weight": RNG.normal(size=(nh * qk, h)),
         "model.layers.0.self_attn.kv_a_proj_with_mqa.weight":
             RNG.normal(size=(kv_rank + qk_rope, h)),
         "model.layers.0.self_attn.kv_a_layernorm.weight": RNG.normal(size=(kv_rank,)),
         "model.layers.0.self_attn.kv_b_proj.weight":
             RNG.normal(size=(nh * (qk_nope + dv), kv_rank)),
         "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, nh * dv)),
         "model.layers.0.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.0.mlp.down_proj.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "plm"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "plm")
    assert r.get("general.architecture") == "plm"
    assert r.get("plm.attention.kv_lora_rank") == kv_rank
    assert r.get("plm.attention.key_length") == qk
    assert r.get("plm.attention.value_length") == dv
    assert r.get("plm.rope.dimension_count") == qk_rope
    assert "blk.0.attn_q.weight" in r.tensors
    assert "blk.0.attn_kv_b.weight" in r.tensors
    assert "blk.0.attn_kv_a_mqa.weight" in r.tensors
