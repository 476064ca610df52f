"""Pack-only arch batch: phimoe / lfm2 / bitnet / chameleon / llama4
(reference converter entries: PhiMoeModel :3963, LFM2Model :8435,
BitnetModel :2686, ChameleonModel :7843, Llama4Model :2432)."""

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(44)


def _make(tmp_path, cfg_d, seed=11, cls=None):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(seed)
    if cls is None:
        m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    else:
        m = cls(hf_cfg).eval().float()
    d = tmp_path / cfg_d["model_type"]
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_phimoe_pack(tmp_path):
    """PhiMoE: longrope factor tensors + mixtral-style expert stacks +
    LayerNorm biases (reference PhiMoeModel :3963-4016)."""
    d, m = _make(tmp_path, dict(
        model_type="phimoe", vocab_size=64, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2,
        attention_bias=True, lm_head_bias=True,
        max_position_embeddings=256, original_max_position_embeddings=64,
        rope_scaling={"type": "longrope", "long_factor": [1.5] * 4,
                      "short_factor": [1.0] * 4,
                      "long_mscale": 1.2, "short_mscale": 1.1},
        torch_dtype="float32", use_cache=False))
    r = _pack(tmp_path, d, "phimoe")
    assert r.get("general.architecture") == "phimoe"
    assert r.get("phimoe.expert_count") == 4
    assert r.get("phimoe.expert_used_count") == 2
    assert r.get("phimoe.rope.scaling.original_context_length") == 64
    # longrope factor tensors present
    np.testing.assert_allclose(r.tensor_float("rope_factors_long.weight"),
                               [1.5] * 4)
    np.testing.assert_allclose(r.tensor_float("rope_factors_short.weight"),
                               [1.0] * 4)
    # attn_factor = sqrt(1 + log(4)/log(64))
    assert abs(r.get("phimoe.rope.scaling.attn_factor")
               - float(np.sqrt(1 + np.log(4) / np.log(64)))) < 1e-6
    sd = m.state_dict()
    # expert stack: w1 -> ffn_gate_exps, expert-major
    g = r.tensor_float("blk.0.ffn_gate_exps.weight")
    assert g.shape == (4, 48, 32)
    np.testing.assert_allclose(
        g[2], sd["model.layers.0.block_sparse_moe.experts.2.w1.weight"]
        .numpy().astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # LN bias + attn bias + lm_head bias mapped
    for t in ("blk.0.attn_norm.bias", "blk.1.ffn_norm.bias",
              "blk.0.attn_q.bias", "output.bias", "output_norm.bias"):
        assert t in r.tensors, t
    # no q/k permute (phi family)
    q = r.tensor_float("blk.0.attn_q.weight")
    np.testing.assert_allclose(
        q, sd["model.layers.0.self_attn.q_proj.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_lfm2_pack(tmp_path):
    """LFM2 hybrid conv/attention: per-layer kv-head array, shortconv
    tensors squeezed 2-D, auto-adjusted FF length (reference LFM2Model)."""
    d, m = _make(tmp_path, dict(
        model_type="lfm2", vocab_size=64, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention", "conv"],
        block_ff_dim=96, block_auto_adjust_ff_dim=True,
        block_ffn_dim_multiplier=1.0, block_multiple_of=32, conv_L_cache=3,
        norm_eps=1e-5, torch_dtype="float32", use_cache=False))
    r = _pack(tmp_path, d, "lfm2")
    assert r.get("general.architecture") == "lfm2"
    assert r.get("lfm2.attention.head_count_kv") == [0, 2, 0]
    assert r.get("lfm2.shortconv.l_cache") == 3
    # ff = multiple_of ceil(2/3 * 96) = 64
    assert r.get("lfm2.feed_forward_length") == 64
    assert r.get("lfm2.vocab_size") == 64
    sd = m.state_dict()
    cv = r.tensor_float("blk.0.shortconv.conv.weight")
    assert cv.shape == (32, 3)
    np.testing.assert_allclose(
        cv, sd["model.layers.0.conv.conv.weight"].numpy()[:, 0, :]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    for t in ("token_embd_norm.weight", "blk.1.attn_q.weight",
              "blk.1.attn_q_norm.weight", "blk.0.shortconv.in_proj.weight",
              "blk.0.ffn_gate.weight", "blk.0.ffn_down.weight"):
        assert t in r.tensors, t
    # w2 -> ffn_down (not ffn_up)
    dn = r.tensor_float("blk.1.ffn_down.weight")
    np.testing.assert_allclose(
        dn, sd["model.layers.1.feed_forward.w2.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_bitnet_pack(tmp_path):
    """BitNet: linear weights re-ternarized with the abs-mean scale at pack
    time; sub-norms mapped (reference BitnetModel.weight_quant :2697)."""
    d, m = _make(tmp_path, dict(
        model_type="bitnet", vocab_size=64, hidden_size=32,
        intermediate_size=48, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, torch_dtype="float32", use_cache=False))
    r = _pack(tmp_path, d, "bitnet")
    assert r.get("general.architecture") == "bitnet"
    assert r.get("bitnet.rope.scaling.type") == "linear"
    assert r.get("bitnet.rope.scaling.factor") == 1.0
    assert "blk.0.attn_sub_norm.weight" in r.tensors
    assert "blk.0.ffn_sub_norm.weight" in r.tensors
    w = m.state_dict()["model.layers.0.mlp.down_proj.weight"].numpy()
    scale = max(float(np.abs(w.astype(np.float32)).mean()), 1e-5)
    want = np.clip(np.round(w / scale), -1, 1) * scale
    got = r.tensor_float("blk.0.ffn_down.weight")
    np.testing.assert_allclose(
        got, want.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # exactly ternary levels
    lv = np.unique(np.round(got.astype(np.float64) / scale).astype(int))
    assert set(lv).issubset({-1, 0, 1})


def test_chameleon_pack(tmp_path):
    """Chameleon: GQA q/k permute + head-0 interleaved q/k norms, vqmodel
    dropped, swin_norm flag (reference ChameleonModel :7843-7880)."""
    import torch
    from transformers import ChameleonForConditionalGeneration

    d, m = _make(tmp_path, dict(
        model_type="chameleon", vocab_size=64, hidden_size=32,
        intermediate_size=48, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, swin_norm=True, vocabulary_map={"<image>": 1},
        vq_config=dict(embed_dim=32, num_embeddings=16, latent_channels=32,
                       resolution=32, base_channels=32,
                       channel_multiplier=[1, 2], num_res_blocks=1),
        torch_dtype="float32", use_cache=False),
        cls=ChameleonForConditionalGeneration)
    r = _pack(tmp_path, d, "chameleon")
    assert r.get("general.architecture") == "chameleon"
    assert r.get("chameleon.swin_norm") is True
    assert not any(t.startswith("model.vqmodel") or "vqmodel" in t
                   for t in r.tensors)
    sd = m.state_dict()
    # q permuted rotate-half -> interleaved
    q = r.tensor_float("blk.0.attn_q.weight")
    raw = sd["model.layers.0.self_attn.q_proj.weight"].numpy()
    perm = packer.gqa_permute_rows(32, 4)
    np.testing.assert_allclose(
        q, raw[perm].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    # q_norm: head 0 transformed + tiled (reference _reverse_hf_permute)
    qn = r.tensor_float("blk.0.attn_q_norm.weight")
    h0 = sd["model.layers.0.self_attn.q_norm.weight"].numpy()[0]
    want = h0.reshape(2, 4).T.reshape(-1)
    assert qn.shape == (4, 8)
    for h in range(4):
        np.testing.assert_allclose(qn[h], want, rtol=1e-6, atol=0)
    assert "blk.0.attn_k_norm.bias" in r.tensors


def test_llama4_pack(tmp_path):
    """Llama-4: fused 3-D experts split/transposed into *_exps stacks,
    interleaved MoE metadata, dense-layer feed_forward mapping
    (reference Llama4Model :2432-2472)."""
    import torch
    from transformers import Llama4ForCausalLM
    from transformers.models.llama4 import Llama4TextConfig

    cfg = Llama4TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=16,
        intermediate_size_mlp=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, num_local_experts=4,
        num_experts_per_tok=1, interleave_moe_layer_step=2,
        torch_dtype="float32", use_cache=False)
    torch.manual_seed(7)
    m = Llama4ForCausalLM(cfg).eval().float()
    d = tmp_path / "llama4"
    m.save_pretrained(d, safe_serialization=True)
    r = _pack(tmp_path, d, "llama4")
    assert r.get("general.architecture") == "llama4"
    assert r.get("llama4.feed_forward_length") == 64
    assert r.get("llama4.expert_feed_forward_length") == 16
    assert r.get("llama4.interleave_moe_layer_step") == 2
    assert r.get("llama4.expert_count") == 4
    sd = m.state_dict()
    # layer 0 dense: feed_forward.* -> ffn_*
    g0 = r.tensor_float("blk.0.ffn_gate.weight")
    np.testing.assert_allclose(
        g0, sd["model.layers.0.feed_forward.gate_proj.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # layer 1 MoE: gate_up split + transpose, expert-major stacks
    fused = sd["model.layers.1.feed_forward.experts.gate_up_proj"].numpy()
    ge = r.tensor_float("blk.1.ffn_gate_exps.weight")
    ue = r.tensor_float("blk.1.ffn_up_exps.weight")
    de = r.tensor_float("blk.1.ffn_down_exps.weight")
    assert ge.shape == (4, 16, 32) and de.shape == (4, 32, 16)
    np.testing.assert_allclose(
        ge[1], fused[1, :, :16].T.astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        ue[3], fused[3, :, 16:].T.astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        de[2],
        sd["model.layers.1.feed_forward.experts.down_proj"].numpy()[2].T
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # router + shared expert
    assert "blk.1.ffn_gate_inp.weight" in r.tensors
    assert "blk.1.ffn_gate_shexp.weight" in r.tensors
    # no q/k permute
    q = r.tensor_float("blk.0.attn_q.weight")
    np.testing.assert_allclose(
        q, sd["model.layers.0.self_attn.q_proj.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
