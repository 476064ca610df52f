"""Deepseek-v2/v3 (MLA + deepseek-MoE): HF-torch logits parity, GPTQ
calibration walk over MLA/MoE layers, and GGUF export structure.

Covers (vs HF modeling_deepseek_v2 / _v3): low-rank q (q_a/q_b) and joint kv
compression (kv_a_proj_with_mqa/kv_b), partial rope on the qk_rope split with
the shared k_pe head, group-limited routing (v2 max / v3 top-2-sum), sigmoid
scoring with e_score_correction bias, routed_scaling_factor, shared experts,
first_k_dense_replace, and yarn mscale attention scaling.

Reference packer parity: pack_gptq_into_gguf.py DeepseekV2Model (metadata
set at :6433-6470, kv_b -> k_b/v_b split at :6530-6550)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(11)

SMALL = dict(vocab_size=96, hidden_size=64, intermediate_size=128,
             num_hidden_layers=3, num_attention_heads=4,
             num_key_value_heads=4, max_position_embeddings=128,
             torch_dtype="float32",
             kv_lora_rank=32, qk_rope_head_dim=8, qk_nope_head_dim=16,
             v_head_dim=16, first_k_dense_replace=1,
             n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
             moe_intermediate_size=48, moe_layer_freq=1)


def _make(tmp_path, cfg_d, seed=3):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(seed)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / cfg_d["model_type"]
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _check_parity(model_dir, m, n_vocab=96, atol=5e-4):
    import torch

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, n_vocab, size=(2, 14))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=atol, atol=atol)
    return cfg, params


def test_deepseek_v2_group_limited_matches_hf(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="deepseek_v2", architectures=["DeepseekV2ForCausalLM"],
        **SMALL, q_lora_rank=24, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=True))
    cfg, params = _check_parity(d, m)
    assert cfg.kv_lora_rank == 32 and cfg.rope_dim == 8
    assert cfg.moe_group_method == "max" and cfg.moe_routed_scale == 1.5
    l0 = params["layers"][0]
    assert "q_a_proj" in l0 and "kv_a_proj" in l0 and "gate_inp" not in l0
    assert "gate_inp" in params["layers"][1]  # first_k_dense_replace=1


def test_deepseek_v2_lite_greedy_matches_hf(tmp_path):
    # v2-lite: no q compression, greedy routing; HF ignores norm_topk_prob
    d, m = _make(tmp_path, dict(
        model_type="deepseek_v2", architectures=["DeepseekV2ForCausalLM"],
        **SMALL, q_lora_rank=None, topk_method="greedy", n_group=1,
        topk_group=1, routed_scaling_factor=1.0, norm_topk_prob=True,
        scoring_func="softmax", aux_loss_alpha=0.0, seq_aux=True))
    cfg, params = _check_parity(d, m)
    assert not cfg.moe_norm_topk  # forced off for v2
    assert "q_proj" in params["layers"][0]
    assert "q_a_proj" not in params["layers"][0]


def test_deepseek_v3_sigmoid_yarn_matches_hf(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="deepseek_v3", architectures=["DeepseekV3ForCausalLM"],
        **SMALL, q_lora_rank=24, n_group=4, topk_group=2,
        routed_scaling_factor=2.0, norm_topk_prob=True,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32, "beta_slow": 1,
                      "mscale": 1.0, "mscale_all_dim": 1.0}))
    cfg, params = _check_parity(d, m)
    assert cfg.moe_scoring == "sigmoid"
    assert cfg.moe_group_method == "top2sum"
    assert "gate_corr_bias" in params["layers"][1]
    # v3 folds mscale^2 into the softmax scale
    qk_hd = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    m_ = 0.1 * 1.0 * np.log(4.0) + 1.0
    assert cfg.attention_scale == pytest.approx(qk_hd ** -0.5 * m_ * m_)


@pytest.fixture(scope="module")
def calibrated_v2(tmp_path_factory):
    """Tiny deepseek_v2 with 256-divisible dims (K-quant supergroup), GPTQ
    calibrated over the MLA/MoE walk."""
    from gptq_gguf_tpu.quant import calibrate

    tmp = tmp_path_factory.mktemp("ds2")
    d, m = _make(tmp, dict(
        model_type="deepseek_v2", architectures=["DeepseekV2ForCausalLM"],
        vocab_size=96, hidden_size=256, intermediate_size=512,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, torch_dtype="float32",
        kv_lora_rank=256, qk_rope_head_dim=16, qk_nope_head_dim=64,
        v_head_dim=64, first_k_dense_replace=1,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=256, moe_layer_freq=1,
        q_lora_rank=256, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=True))
    cfg = loader.load_config(d)
    params = loader.load_params(d, cfg)
    ids = [RNG.integers(0, 96, size=(2, 16)) for _ in range(2)]
    save_dir = tmp / "layers"
    qp = calibrate.quantize_model(params, cfg, ids, save_dir=save_dir)
    return d, save_dir, cfg, params, qp


def test_deepseek2_calibration_walk(calibrated_v2):
    d, save_dir, cfg, params, qp = calibrated_v2
    names = {p.name for p in save_dir.iterdir()}
    # MLA attention artifacts on the dense block
    for suffix in ("q_a_proj", "q_b_proj", "kv_a_proj_with_mqa", "kv_b_proj",
                   "o_proj"):
        assert f"model.layers.0.self_attn.{suffix}" in names
    # per-expert + shared-expert artifacts on the MoE blocks
    assert "model.layers.1.mlp.experts.0.gate_proj" in names
    assert "model.layers.1.mlp.shared_expert.down_proj" in names
    ids = RNG.integers(0, 96, size=(1, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    out = np.asarray(llama.forward(qp, jnp.asarray(ids), cfg))
    assert np.isfinite(out).all()
    # quantized logits track float logits (tiny random model: loose bound)
    assert np.abs(out - ref).max() < 5.0


def test_deepseek2_gguf_export(calibrated_v2, tmp_path):
    d, save_dir, cfg, params, qp = calibrated_v2
    out = packer.pack_model(d, save_dir, tmp_path / "ds2.gguf")
    r = GGUFReader(out)
    a = "deepseek2"
    assert r.get("general.architecture") == a
    # MQA conversion metadata (reference :6433-6445)
    assert r.get(f"{a}.attention.head_count_kv") == 1
    assert r.get(f"{a}.attention.key_length") == 256 + 16
    assert r.get(f"{a}.attention.value_length") == 256
    assert r.get(f"{a}.attention.key_length_mla") == 64 + 16
    assert r.get(f"{a}.attention.value_length_mla") == 64
    assert r.get(f"{a}.attention.q_lora_rank") == 256
    assert r.get(f"{a}.attention.kv_lora_rank") == 256
    assert r.get(f"{a}.leading_dense_block_count") == 1
    assert r.get(f"{a}.rope.dimension_count") == 16
    assert r.get(f"{a}.expert_gating_func") == 1
    assert r.get(f"{a}.expert_weights_scale") == pytest.approx(1.5)
    # MLA tensors present; kv_b split into k_b (f16, transposed) + v_b (Q4_K)
    kb = r.tensors["blk.0.attn_k_b.weight"]
    vb = r.tensors["blk.0.attn_v_b.weight"]
    assert kb.shape == (4, 256, 64) and kb.ggml_type == T.F16
    assert vb.shape == (4, 64, 256) and vb.ggml_type == T.Q4_K
    assert "blk.0.attn_kv_b.weight" not in r.tensors
    # v_b raw blocks byte-match a direct row-selected repack
    from gptq_gguf_tpu.quant import artifacts as arts_mod
    from gptq_gguf_tpu.formats import convert

    art = arts_mod.load_layer(save_dir, "model.layers.0.self_attn.kv_b_proj")
    rows = np.arange(4 * 128).reshape(4, 128)[:, 64:].reshape(-1)
    sel = packer._permute_artifact(art, rows)
    blocks = convert.pack_layer(sel.qweight, sel.super_group_scale,
                                sel.group_scale_quant, sel.super_group_zero,
                                sel.group_zero_quant, sel.q_type)
    assert bytes(r.tensor_bytes("blk.0.attn_v_b.weight")) == bytes(blocks.ravel())
    # k_b value parity: f16 of the dequantized, transposed artifact
    w = art.dequantize().reshape(4, 128, 256)[:, :64].transpose(0, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(kb_f := r.tensor_float("blk.0.attn_k_b.weight")),
        np.ascontiguousarray(w).astype(np.float16).astype(np.float32))
    # MoE + shared-expert tensors
    assert r.tensors["blk.1.ffn_gate_exps.weight"].shape == (8, 256, 256)
    assert "blk.1.ffn_gate_shexp.weight" in r.tensors


def _gguf_serving_logits(gguf, model_dir, ids, max_len=32):
    from gptq_gguf_tpu.serving import model as qmodel

    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    qparams = qmodel.fuse_params_for_serving(qparams, gcfg)
    cache = qmodel.init_cache(gcfg, ids.shape[0], max_len, dtype=jnp.float32)
    logits, cache = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    return np.asarray(logits), qparams, gcfg, cache


def test_deepseek2_gguf_serving_matches_forward(tmp_path):
    """F16 GGUF -> absorbed-MQA serving must reproduce llama.forward logits
    (prefill + a decode step), including group-limited routing metadata."""
    d, m = _make(tmp_path, dict(
        model_type="deepseek_v2", architectures=["DeepseekV2ForCausalLM"],
        **SMALL, q_lora_rank=24, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=True))
    gguf = tmp_path / "ds2-f16.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("deepseek2.expert_group_count") == 4
    assert r.get("deepseek2.expert_group_used_count") == 2
    cfg = loader.load_config(d)
    params = loader.load_params(d, cfg)
    ids = RNG.integers(0, 96, size=(2, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))[:, -1, :]
    logits, qparams, gcfg, cache = _gguf_serving_logits(gguf, d, ids)
    assert gcfg.moe_n_group == 4 and gcfg.moe_group_method == "max"
    assert gcfg.moe_routed_scale == pytest.approx(1.5)
    np.testing.assert_allclose(logits, ref, rtol=2e-2, atol=2e-3)
    # decode step continues correctly from the MLA compressed cache
    from gptq_gguf_tpu.serving import model as qmodel
    tok = np.argmax(logits, axis=-1)[:, None]
    logits2, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(tok), cache)
    full = np.concatenate([ids, tok], axis=1)
    ref2 = np.asarray(llama.forward(params, jnp.asarray(full), cfg))[:, -1, :]
    np.testing.assert_allclose(np.asarray(logits2), ref2, rtol=2e-2, atol=2e-3)
    # MLA cache is compressed: one kv head of (kv_lora + rope) per token
    assert cache.k[0].shape == (2, 1, 32, SMALL["kv_lora_rank"] + 8)


def test_deepseek2_quantized_gguf_serving(calibrated_v2, tmp_path):
    """Q4_K deepseek2 GGUF (from our packer) serves finitely and tracks the
    dequantized-forward logits."""
    d, save_dir, cfg, params, qp = calibrated_v2
    gguf = tmp_path / "ds2-q4.gguf"
    packer.pack_model(d, save_dir, gguf)
    ids = RNG.integers(0, 96, size=(1, 10))
    ref = np.asarray(llama.forward(qp, jnp.asarray(ids), cfg))[:, -1, :]
    logits, *_ = _gguf_serving_logits(gguf, d, ids)
    assert np.isfinite(logits).all()
    # attn_k_b goes through an f16 round-trip; everything else is bit-carried
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(logits - ref).max() < 0.05 * scale


def test_deepseek2_mapper_names():
    from gptq_gguf_tpu.mapper.splitter import gguf_to_hf_name
    from gptq_gguf_tpu.mapper import config_converter as cc

    assert gguf_to_hf_name("blk.3.attn_kv_a_mqa.weight") == \
        "model.layers.3.self_attn.kv_a_proj_with_mqa.weight"
    assert gguf_to_hf_name("blk.0.attn_q_b.weight") == \
        "model.layers.0.self_attn.q_b_proj.weight"
    assert cc.MOE_MAPPING["self_attn.kv_b_proj"] == "attn_kv_b.weight"


def test_deepseek2_int8_kv_cache(tmp_path):
    """MLA + int8 compressed KV cache: one int8 entry + f32 scale per token;
    logits track the bf16-cache path through prefill + decode."""
    from gptq_gguf_tpu.serving import model as qmodel

    d, m = _make(tmp_path, dict(
        model_type="deepseek_v2", architectures=["DeepseekV2ForCausalLM"],
        **SMALL, q_lora_rank=24, topk_method="greedy",
        norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=True))
    cfg = loader.load_config(d)
    params = loader.load_params(d, cfg)
    params = qmodel.fuse_params_for_serving(params, cfg)  # derives k_b/v_b
    ids = RNG.integers(0, 96, size=(2, 12))

    cache_f = qmodel.init_cache(cfg, 2, 32, dtype=jnp.float32)
    cache_q = qmodel.init_cache(cfg, 2, 32, quantized=True)
    assert isinstance(cache_q, qmodel.KVCacheQ8)
    assert cache_q.k[0].shape == (2, 1, 32, SMALL["kv_lora_rank"] + 8)
    assert cache_q.k[0].dtype == jnp.int8

    lf, cache_f = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache_f)
    lq, cache_q = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache_q)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lf), rtol=5e-2, atol=5e-2)
    tok = np.argmax(np.asarray(lf), axis=-1)[:, None]
    lf2, _ = qmodel.forward_cached(params, cfg, jnp.asarray(tok), cache_f)
    lq2, _ = qmodel.forward_cached(params, cfg, jnp.asarray(tok), cache_q)
    np.testing.assert_allclose(np.asarray(lq2), np.asarray(lf2), rtol=5e-2, atol=5e-2)
