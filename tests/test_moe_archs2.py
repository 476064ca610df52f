"""MoE arch batch: granitemoe / glm4_moe / ernie4_5_moe — HF logits parity
and GGUF round-trips (reference converter entries: GraniteMoeModel :7512,
Glm4MoeModel :7007, Ernie4_5MoeModel :3248)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.models import llama, loader

RNG = np.random.default_rng(41)


def _make(tmp_path, cfg_d, seed=11):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(seed)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / cfg_d["model_type"]
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _parity(model_dir, m, n_vocab=128, rtol=5e-4, atol=5e-4):
    import torch

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, n_vocab, size=(2, 14))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)
    return cfg, params


def _gguf_serving(tmp_path, model_dir, arch, rtol=2e-3, atol=2e-3):
    from gptq_gguf_tpu.serving import model as qmodel

    gguf = tmp_path / f"{arch}.gguf"
    packer.pack_model(model_dir, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == arch
    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, cfg.vocab_size, size=(1, 10))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))[:, -1, :]
    cache = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=rtol, atol=atol)
    return r, gcfg


BASE = dict(
    vocab_size=128, hidden_size=128, intermediate_size=192,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, torch_dtype="float32", pad_token_id=0,
)


def test_granitemoe(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="granitemoe", architectures=["GraniteMoeForCausalLM"],
        **BASE, num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, attention_multiplier=0.03,
        residual_multiplier=0.5, logits_scaling=4.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    # fused input_linear split into canonical per-expert stacks
    assert params["layers"][0]["experts_gate"].shape == (4, 192, 128)
    assert cfg.moe_norm_topk and cfg.embedding_multiplier == 2.0
    r, gcfg = _gguf_serving(tmp_path, d, "granitemoe")
    assert r.get("granitemoe.expert_count") == 4
    assert gcfg.logits_multiplier == pytest.approx(0.25)
    w = r.tensor_float("blk.0.ffn_gate_exps.weight")
    sd = m.state_dict()
    ref = sd["model.layers.0.block_sparse_moe.input_linear.weight"][:, :192].numpy()
    np.testing.assert_allclose(w, ref.astype(np.float16).astype(np.float32))


def test_glm4_moe(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="glm4_moe", architectures=["Glm4MoeForCausalLM"], **BASE,
        head_dim=32, partial_rotary_factor=0.5, moe_intermediate_size=96,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        routed_scaling_factor=1.5, n_group=2, topk_group=1,
        first_k_dense_replace=1, norm_topk_prob=True, use_qk_norm=False,
        rms_norm_eps=1e-5, tie_word_embeddings=False, rope_theta=10000.0,
        num_nextn_predict_layers=0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.moe_scoring == "sigmoid" and cfg.moe_routed_scale == 1.5
    assert cfg.moe_n_group == 2 and cfg.moe_group_method == "top2sum"
    assert "gate_inp" not in params["layers"][0]  # leading dense block
    assert "gate_corr_bias" in params["layers"][1]
    assert "shared_gate" in params["layers"][1]
    r, gcfg = _gguf_serving(tmp_path, d, "glm4moe")
    assert r.get("glm4moe.expert_gating_func") == 2
    assert r.get("glm4moe.leading_dense_block_count") == 1
    assert "blk.1.exp_probs_b.bias" in r.tensors
    assert gcfg.moe_scoring == "sigmoid"


def test_ernie4_5_moe(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="ernie4_5_moe", architectures=["Ernie4_5_MoeForCausalLM"],
        **BASE, head_dim=32, use_bias=False, moe_intermediate_size=96,
        moe_num_experts=4, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, moe_layer_interval=1, moe_norm_min=1e-12,
        rms_norm_eps=1e-5, tie_word_embeddings=True, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.moe_top_k == 2 and cfg.moe_norm_topk
    assert "gate_inp" not in params["layers"][0]  # leading dense block
    assert "gate_corr_bias" in params["layers"][1]
    r, gcfg = _gguf_serving(tmp_path, d, "ernie4_5-moe")
    assert r.get("ernie4_5-moe.expert_used_count") == 2
    assert r.get("ernie4_5-moe.leading_dense_block_count") == 1
    assert "blk.1.exp_probs_b.bias" in r.tensors


def test_dots1(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="dots1", architectures=["Dots1ForCausalLM"], **BASE,
        head_dim=32, moe_intermediate_size=96, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, routed_scaling_factor=2.0,
        n_group=2, topk_group=1, first_k_dense_replace=1,
        norm_topk_prob=True, scoring_func="noaux_tc", rms_norm_eps=1e-5,
        tie_word_embeddings=False, rope_theta=10000.0, attention_bias=False,
    ))
    cfg, params = _parity(d, m)
    assert cfg.moe_scoring == "sigmoid" and cfg.qk_norm
    assert cfg.partial_rotary_factor == 1.0 and not cfg.rope_interleaved
    r, gcfg = _gguf_serving(tmp_path, d, "dots1")
    assert r.get("dots1.expert_gating_func") == 2
    assert gcfg.moe_scoring == "sigmoid" and gcfg.qk_norm


def test_gpt_oss(tmp_path):
    """gpt-oss: attention sinks, biased router, per-expert biases, clamped
    swiglu with (up+1) carry, alternating sliding layers, yarn truncate=False
    (reference GptOssModel :8310)."""
    d, m = _make(tmp_path, dict(
        model_type="gpt_oss", architectures=["GptOssForCausalLM"], **BASE,
        head_dim=32, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, rms_norm_eps=1e-5, tie_word_embeddings=False,
        rope_theta=150000.0, rope_scaling={
            "rope_type": "yarn", "factor": 2.0, "beta_fast": 32.0,
            "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": 64,
        },
    ))
    cfg, params = _parity(d, m, rtol=1e-3, atol=1e-3)
    assert cfg.act_fn == "swiglu_oai" and cfg.moe_norm_topk
    assert cfg.sliding_window == 8 and cfg.sliding_layers is not None
    l0 = params["layers"][0]
    assert "sinks" in l0 and "gate_inp_bias" in l0
    assert "experts_gate_bias" in l0 and l0["experts_gate"].shape == (4, 192, 128)
    r, gcfg = _gguf_serving(tmp_path, d, "gpt-oss", rtol=4e-3, atol=4e-3)
    assert "blk.0.attn_sinks.weight" in r.tensors
    assert "blk.0.ffn_gate_exps.bias" in r.tensors
    assert "blk.0.ffn_gate_inp.bias" in r.tensors
    assert gcfg.act_fn == "swiglu_oai"
    assert dict(gcfg.rope_scaling)["truncate"] is False


def test_falcon_new_decoder(tmp_path):
    """Falcon new-decoder (40B-style): fused rearranged qkv, dual
    ln_attn/ln_mlp parallel residual, gateless exact-gelu MLP."""
    d, m = _make(tmp_path, dict(
        model_type="falcon", architectures=["FalconForCausalLM"],
        vocab_size=128, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=True, num_kv_heads=2,
        multi_query=False, parallel_attn=True, bias=False, alibi=False,
        layer_norm_epsilon=1e-5, torch_dtype="float32",
        tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.parallel_blocks and cfg.norm_type == "layernorm"
    assert cfg.act_fn == "gelu" and cfg.num_key_value_heads == 2
    assert "mlp_layernorm" in params["layers"][0]
    r, gcfg = _gguf_serving(tmp_path, d, "falcon")
    assert "blk.0.attn_qkv.weight" in r.tensors  # stays fused
    assert "blk.0.attn_norm_2.weight" in r.tensors
    assert gcfg.parallel_blocks and gcfg.act_fn == "gelu"


def test_falcon_7b_style(tmp_path):
    """Falcon classic (7B-style): multi-query (1 kv head), single input
    norm, parallel attn."""
    d, m = _make(tmp_path, dict(
        model_type="falcon", architectures=["FalconForCausalLM"],
        vocab_size=128, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, parallel_attn=True, bias=False, alibi=False,
        layer_norm_epsilon=1e-5, torch_dtype="float32",
        tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.num_key_value_heads == 1 and cfg.parallel_blocks
    assert "mlp_layernorm" not in params["layers"][0]
    _gguf_serving(tmp_path, d, "falcon")


def test_hunyuan_dense(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="hunyuan_v1_dense",
        architectures=["HunYuanDenseV1ForCausalLM"], **BASE, head_dim=32,
        rms_norm_eps=1e-5, tie_word_embeddings=False, rope_theta=10000.0,
        attention_bias=False,
    ))
    cfg, params = _parity(d, m)
    assert cfg.qk_norm and cfg.qk_norm_after_rope
    r, gcfg = _gguf_serving(tmp_path, d, "hunyuan-dense")
    assert gcfg.qk_norm_after_rope
    assert "blk.0.attn_q_norm.weight" in r.tensors


def test_hunyuan_moe(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="hunyuan_v1_moe", architectures=["HunYuanMoEV1ForCausalLM"],
        **BASE, head_dim=32, num_experts=4, moe_topk=2,
        moe_intermediate_size=96, num_shared_expert=1, rms_norm_eps=1e-5,
        tie_word_embeddings=False, rope_theta=10000.0, attention_bias=False,
    ))
    cfg, params = _parity(d, m)
    assert cfg.moe_top_k == 2 and cfg.moe_norm_topk and cfg.qk_norm_after_rope
    assert "shared_gate" in params["layers"][0]
    r, gcfg = _gguf_serving(tmp_path, d, "hunyuan-moe")
    assert r.get("hunyuan-moe.expert_used_count") == 2
    assert r.get("hunyuan-moe.expert_shared_count") == 1


LEGACY_NOTE = """Legacy GPT family (reference entries: GPTNeoXModel :1438,
BloomModel :1495, MPTModel :1552, GPT2Model :3728, GPTJ)"""


def test_gpt_neox(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="gpt_neox", architectures=["GPTNeoXForCausalLM"],
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        use_parallel_residual=True, layer_norm_eps=1e-5, hidden_act="gelu",
        max_position_embeddings=128, torch_dtype="float32",
        tie_word_embeddings=False, rope_theta=10000.0, attention_bias=True,
    ))
    cfg, params = _parity(d, m)
    assert cfg.parallel_blocks and cfg.partial_rotary_factor == 0.5
    assert "mlp_layernorm" in params["layers"][0]
    assert params["layers"][0].get("q_bias") is not None
    r, gcfg = _gguf_serving(tmp_path, d, "gptneox")
    assert "blk.0.attn_qkv.weight" in r.tensors
    assert r.get("gptneox.use_parallel_residual") is True
    assert gcfg.parallel_blocks


def test_gpt_neox_sequential(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="gpt_neox", architectures=["GPTNeoXForCausalLM"],
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=False, layer_norm_eps=1e-5, hidden_act="gelu",
        max_position_embeddings=128, torch_dtype="float32",
        tie_word_embeddings=False, rope_theta=10000.0, attention_bias=True,
    ))
    cfg, params = _parity(d, m)
    assert not cfg.parallel_blocks
    assert "post_attention_layernorm" in params["layers"][0]
    _gguf_serving(tmp_path, d, "gptneox")


def test_gptj(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="gptj", architectures=["GPTJForCausalLM"],
        vocab_size=128, n_embd=128, n_layer=2, n_head=4, rotary_dim=16,
        n_positions=128, layer_norm_epsilon=1e-5, activation_function="gelu_new",
        torch_dtype="float32", tie_word_embeddings=False,
    ))
    cfg, params = _parity(d, m)
    assert cfg.parallel_blocks and cfg.rope_interleaved
    assert cfg.partial_rotary_factor == pytest.approx(0.5)
    assert params.get("lm_head_bias") is not None
    _gguf_serving(tmp_path, d, "gptj")


def test_gpt2(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="gpt2", architectures=["GPT2LMHeadModel"],
        vocab_size=128, n_embd=128, n_layer=2, n_head=4, n_positions=128,
        n_ctx=128, layer_norm_epsilon=1e-5, activation_function="gelu_new",
        torch_dtype="float32",
    ))
    cfg, params = _parity(d, m)
    assert cfg.pos_type == "learned" and "pos_embed" in params
    r, gcfg = _gguf_serving(tmp_path, d, "gpt2")
    assert "position_embd.weight" in r.tensors
    assert gcfg.pos_type == "learned"


def test_bloom(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="bloom", architectures=["BloomForCausalLM"],
        vocab_size=128, hidden_size=128, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, torch_dtype="float32",
    ))
    cfg, params = _parity(d, m)
    assert cfg.pos_type == "alibi" and "embed_norm" in params
    r, gcfg = _gguf_serving(tmp_path, d, "bloom")
    assert "token_embd_norm.weight" in r.tensors
    assert gcfg.pos_type == "alibi"


def test_mpt(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="mpt", architectures=["MPTForCausalLM"],
        vocab_size=128, d_model=128, n_layers=2, n_heads=4, max_seq_len=128,
        attn_config={"alibi": True, "alibi_bias_max": 8, "clip_qkv": None},
        no_bias=True, torch_dtype="float32",
    ))
    cfg, params = _parity(d, m)
    assert cfg.pos_type == "alibi" and cfg.intermediate_size == 512
    r, gcfg = _gguf_serving(tmp_path, d, "mpt")
    assert r.get("mpt.attention.max_alibi_bias") == pytest.approx(8.0)


def test_granitemoeshared(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="granitemoeshared", architectures=["GraniteMoeSharedForCausalLM"],
        **BASE, num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=96, embedding_multiplier=1.0,
        attention_multiplier=0.05, residual_multiplier=1.0, logits_scaling=1.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert "shared_gate" in params["layers"][0]
    r, _ = _gguf_serving(tmp_path, d, "granitemoe")
    assert "blk.0.ffn_gate_shexp.weight" in r.tensors


def test_smollm3(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="smollm3", architectures=["SmolLM3ForCausalLM"], **BASE,
        no_rope_layer_interval=2, rms_norm_eps=1e-6,
        tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.rope_layers == (True, False)  # BASE has 2 layers
    r, gcfg = _gguf_serving(tmp_path, d, "smollm3")
    assert gcfg.rope_layers == (True, False)


def test_glm_edge(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="glm", architectures=["GlmForCausalLM"], **BASE,
        head_dim=32, partial_rotary_factor=0.5, attention_bias=True,
        rms_norm_eps=1e-6, tie_word_embeddings=False, rope_theta=10000.0,
    ))
    cfg, params = _parity(d, m)
    assert cfg.rope_interleaved and cfg.partial_rotary_factor == 0.5
    r, gcfg = _gguf_serving(tmp_path, d, "chatglm")
    assert "blk.0.ffn_up.weight" in r.tensors  # fused gate|up
    assert gcfg.rope_interleaved


def test_gpt_bigcode(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="gpt_bigcode", architectures=["GPTBigCodeForCausalLM"],
        vocab_size=128, n_embd=128, n_layer=2, n_head=4, n_positions=128,
        multi_query=True, layer_norm_epsilon=1e-5,
        activation_function="gelu_pytorch_tanh", torch_dtype="float32",
    ))
    cfg, params = _parity(d, m)
    assert cfg.pos_type == "learned" and cfg.num_key_value_heads == 1
    r, gcfg = _gguf_serving(tmp_path, d, "starcoder")
    assert r.get("starcoder.attention.head_count_kv") == 1


def test_dbrx(tmp_path):
    d, m = _make(tmp_path, dict(
        model_type="dbrx", architectures=["DbrxForCausalLM"],
        vocab_size=128, d_model=128, n_layers=2, n_heads=4, max_seq_len=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 192, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0,
                    "ffn_act_fn": {"name": "silu"}},
        torch_dtype="float32", tie_word_embeddings=False,
    ))
    cfg, params = _parity(d, m)
    assert cfg.clip_qkv == 8.0 and cfg.moe_num_experts == 4
    assert params["layers"][0]["experts_gate"].shape == (4, 192, 128)
    r, gcfg = _gguf_serving(tmp_path, d, "dbrx")
    assert r.get("dbrx.attention.clamp_kqv") == pytest.approx(8.0)
    assert gcfg.clip_qkv == 8.0


def test_mamba_pack_only(tmp_path):
    """Mamba SSM packs to a llama.cpp-loadable GGUF (A = -exp(A_log),
    squeezed conv kernel, ssm.* metadata); the quantize/serve paths reject
    it like the reference (which only converts SSM checkpoints)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        model_type="mamba", vocab_size=128, hidden_size=64, state_size=8,
        num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=4,
        torch_dtype="float32", use_cache=False)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "mamba"
    m.save_pretrained(d, safe_serialization=True)

    gguf = tmp_path / "mamba.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "mamba"
    assert r.get("mamba.ssm.inner_size") == 128
    assert r.get("mamba.ssm.state_size") == 8
    assert r.get("mamba.ssm.conv_kernel") == 4
    assert r.get("mamba.ssm.dt_b_c_rms") is False
    sd = m.state_dict()
    a = r.tensor_float("blk.0.ssm_a")
    np.testing.assert_allclose(
        a, -np.exp(sd["backbone.layers.0.mixer.A_log"].numpy()),
        rtol=1e-6, atol=1e-7)
    assert "blk.0.ssm_d" in r.tensors
    conv = r.tensor_float("blk.0.ssm_conv1d.weight")
    assert conv.ndim == 2 and conv.shape == (128, 4)
    assert "blk.1.ssm_out.weight" in r.tensors

    from gptq_gguf_tpu.models import loader as _loader
    with pytest.raises(NotImplementedError):
        _loader.load_config(d)
    from gptq_gguf_tpu.serving import model as qmodel
    with pytest.raises(NotImplementedError):
        qmodel.load_gguf_for_serving(gguf)


def test_mamba2_pack_only(tmp_path):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        model_type="mamba2", vocab_size=128, hidden_size=64, state_size=16,
        num_hidden_layers=1, conv_kernel=4, expand=2, n_groups=2, num_heads=4,
        head_dim=32, torch_dtype="float32", use_cache=False)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "mamba2"
    m.save_pretrained(d, safe_serialization=True)

    gguf = tmp_path / "mamba2.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "mamba2"
    assert r.get("mamba2.ssm.group_count") == 2
    assert r.get("mamba2.ssm.time_step_rank") == 4  # d_inner/head_dim
    sd = m.state_dict()
    a = r.tensor_float("blk.0.ssm_a")
    np.testing.assert_allclose(
        a, -np.exp(sd["backbone.layers.0.mixer.A_log"].numpy())[..., None],
        rtol=1e-6, atol=1e-7)
    assert r.tensor_float("blk.0.ssm_norm.weight").shape == (2, 64)
    assert "blk.0.ssm_dt.bias" in r.tensors


def test_jamba_pack_only(tmp_path):
    """Jamba hybrid packs: per-layer head_count_kv vector (0 on SSM
    layers), interleaved attention/mamba tensors, stacked MoE experts,
    SSM dt/B/C norms (reference JambaModel :5745)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(
        model_type="jamba", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, attn_layer_offset=1, attn_layer_period=2,
        expert_layer_offset=0, expert_layer_period=2, num_experts=2,
        num_experts_per_tok=2, mamba_d_state=8, mamba_d_conv=4,
        mamba_expand=2, mamba_dt_rank=4, use_mamba_kernels=False,
        torch_dtype="float32", use_cache=False)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "jamba"
    m.save_pretrained(d, safe_serialization=True)

    gguf = tmp_path / "jamba.gguf"
    packer.pack_model(d, tmp_path / "no-artifacts", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "jamba"
    assert list(r.get("jamba.attention.head_count_kv")) == [0, 2, 0, 2]
    assert r.get("jamba.ssm.inner_size") == 128
    assert "blk.0.ssm_dt_norm.weight" in r.tensors
    assert "blk.0.ffn_gate_exps.weight" in r.tensors  # layer 0 is MoE+SSM
    assert "blk.1.attn_q.weight" in r.tensors          # layer 1 is attention
    assert "blk.1.ffn_gate.weight" in r.tensors        # dense ffn
    sd = m.state_dict()
    a = r.tensor_float("blk.0.ssm_a")
    np.testing.assert_allclose(
        a, -np.exp(sd["model.layers.0.mamba.A_log"].numpy()),
        rtol=1e-6, atol=1e-7)


def test_bamba_and_granitemoehybrid_pack_only(tmp_path):
    """mamba2+attention hybrids (reference GraniteHybridModel :7563):
    per-layer kv vector, mamba2 reshapes on SSM layers, llama q/k permute
    on attention layers, fused MoE + shared MLP on the granite variant."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    common = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, mamba_n_heads=4, mamba_d_head=32,
                  mamba_n_groups=1, mamba_d_state=16, mamba_d_conv=4,
                  mamba_expand=2, torch_dtype="float32", use_cache=False)

    # bamba: dense ffn, attn layer via indices
    cfg = AutoConfig.for_model(model_type="bamba", attn_layer_indices=[1],
                               **common)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp_path / "bamba"
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp_path / "bamba.gguf"
    packer.pack_model(d, tmp_path / "none", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "granitehybrid"
    assert list(r.get("granitehybrid.attention.head_count_kv")) == [0, 2]
    assert r.get("granitehybrid.ssm.inner_size") == 128
    assert r.get("granitehybrid.rope.scaling.finetuned") is True
    assert "blk.0.ssm_norm.weight" in r.tensors
    assert r.tensor_float("blk.0.ssm_norm.weight").shape == (1, 128)
    assert "blk.1.attn_q.weight" in r.tensors
    assert "blk.0.ffn_gate.weight" in r.tensors
    sd = m.state_dict()
    np.testing.assert_allclose(
        r.tensor_float("blk.0.ssm_a"),
        -np.exp(sd["model.layers.0.mamba.A_log"].numpy())[..., None],
        rtol=1e-6, atol=1e-7)

    # granitemoehybrid: MoE + shared mlp, layer types explicit
    cfg = AutoConfig.for_model(
        model_type="granitemoehybrid", layer_types=["mamba", "attention"],
        num_local_experts=2, num_experts_per_tok=2,
        shared_intermediate_size=64, embedding_multiplier=2.0,
        logits_scaling=4.0, **common)
    torch.manual_seed(4)
    m2 = AutoModelForCausalLM.from_config(cfg).eval().float()
    d2 = tmp_path / "gmh"
    m2.save_pretrained(d2, safe_serialization=True)
    gguf2 = tmp_path / "gmh.gguf"
    packer.pack_model(d2, tmp_path / "none", gguf2)
    r2 = GGUFReader(gguf2)
    assert r2.get("general.architecture") == "granitehybrid"
    assert r2.get("granitehybrid.expert_count") == 2
    assert r2.get("granitehybrid.embedding_scale") == pytest.approx(2.0)
    assert r2.get("granitehybrid.rope.scaling.finetuned") is False
    assert "blk.0.ffn_gate_exps.weight" in r2.tensors
    assert "blk.0.ffn_gate_shexp.weight" in r2.tensors
    assert "blk.0.ssm_in.weight" in r2.tensors


def test_falcon_h1_pack_only(tmp_path):
    """Falcon-H1 parallel attention+mamba2 layers with channel multipliers
    folded into the tensors (reference FalconH1Model :7955)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(
        model_type="falcon_h1", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, mamba_n_heads=4, mamba_d_head=16,
        mamba_d_ssm=64, mamba_n_groups=1, mamba_d_state=16, mamba_d_conv=4,
        mamba_expand=2, key_multiplier=0.5, attention_in_multiplier=2.0,
        mlp_multipliers=[2.0, 0.25], lm_head_multiplier=0.125,
        embedding_multiplier=4.0, ssm_multipliers=[1.0, 2.0, 1.0, 1.0, 0.5],
        torch_dtype="float32", use_cache=False, tie_word_embeddings=False)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp_path / "h1"
    m.save_pretrained(d, safe_serialization=True)

    gguf = tmp_path / "h1.gguf"
    packer.pack_model(d, tmp_path / "none", gguf)
    r = GGUFReader(gguf)
    assert r.get("general.architecture") == "falcon-h1"
    assert r.get("falcon-h1.ssm.inner_size") == 64
    sd = m.state_dict()
    # k folded with key * attention_in multipliers
    k = r.tensor_float("blk.0.attn_k.weight")
    ref = sd["model.layers.0.self_attn.k_proj.weight"].numpy() * 0.5 * 2.0
    np.testing.assert_allclose(k, ref.astype(np.float16).astype(np.float32),
                               rtol=1e-3, atol=1e-4)
    # ssm_in piecewise multipliers: x block (rows d..2d) scaled by 2.0
    si = r.tensor_float("blk.0.ssm_in.weight")
    raw = sd["model.layers.0.mamba.in_proj.weight"].numpy()
    np.testing.assert_allclose(
        si[64:128], (raw[64:128] * 2.0).astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    # embeddings folded
    emb = r.tensor_float("token_embd.weight")
    np.testing.assert_allclose(
        emb, (sd["model.embed_tokens.weight"].numpy() * 4.0).astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    assert "blk.1.attn_q.weight" in r.tensors and "blk.1.ssm_in.weight" in r.tensors
