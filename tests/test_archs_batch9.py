"""Pack-only arch batch: plamo-v1 / grok-1 (reference converter entries:
PlamoModel :4020, GrokModel :2727)."""

import json
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(50)


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


def test_plamo_pack(tmp_path):
    """PLaMo-13B: layers.layers naming, single per-layer norm, grouped
    q/output shuffles, hardcoded ctx 4096 + kv=heads/8 quirks."""
    h, ff, nh, v = 64, 96, 16, 64  # 16 heads -> 8 groups of 2, head_dim 4
    hd = h // nh
    g = nh // 8
    cfg = {"model_type": "plamo", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "rms_norm_eps": 1e-6}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "model.layers.layers.0.norm.weight": RNG.normal(size=(h,)),
         "model.layers.layers.0.self_attn.q_proj.weight": RNG.normal(size=(h, h)),
         "model.layers.layers.0.self_attn.k_proj.weight": RNG.normal(size=(h, h)),
         "model.layers.layers.0.self_attn.v_proj.weight": RNG.normal(size=(h, h)),
         "model.layers.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, h)),
         "model.layers.layers.0.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.layers.0.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
         "model.layers.layers.0.mlp.down_proj.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "plamo"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "plamo")
    assert r.get("general.architecture") == "plamo"
    assert r.get("plamo.context_length") == 4096
    assert r.get("plamo.attention.head_count_kv") == 2  # heads/8
    # q shuffle: reshape(8, g, hd, h) -> transpose groups
    q = r.tensor_float("blk.0.attn_q.weight")
    raw = t["model.layers.layers.0.self_attn.q_proj.weight"]
    want = raw.reshape(8, g, hd, h).transpose(1, 0, 2, 3).reshape(h, h)
    np.testing.assert_allclose(
        q, want.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    o = r.tensor_float("blk.0.attn_output.weight")
    rawo = t["model.layers.layers.0.self_attn.o_proj.weight"]
    wanto = rawo.reshape(h, 8, g, hd).transpose(0, 2, 1, 3).reshape(h, h)
    np.testing.assert_allclose(
        o, wanto.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    assert "blk.0.attn_norm.weight" in r.tensors


def test_grok_pack(tmp_path):
    """Grok-1: four per-layer norms, linear/linear_v/linear_1 expert stacks
    mapped to gate/up/down, router gate, tied in_out_embed."""
    h, nh, hd, v, ne, mff = 32, 4, 8, 64, 4, 48
    cfg = {"model_type": "grok-1", "vocab_size": v, "hidden_size": h,
           "intermediate_size": mff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "num_key_value_heads": nh,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
           "num_local_experts": ne, "num_experts_per_tok": 2,
           "tie_word_embeddings": False}
    t = {"transformer.in_out_embed.weight": RNG.normal(size=(v, h)),
         "transformer.rms_norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "transformer.decoder_layer.0.rms_norm.weight": RNG.normal(size=(h,)),
         "transformer.decoder_layer.0.rms_norm_1.weight": RNG.normal(size=(h,)),
         "transformer.decoder_layer.0.rms_norm_2.weight": RNG.normal(size=(h,)),
         "transformer.decoder_layer.0.rms_norm_3.weight": RNG.normal(size=(h,)),
         "transformer.decoder_layer.0.multi_head_attention.query.weight":
             RNG.normal(size=(nh * hd, h)),
         "transformer.decoder_layer.0.multi_head_attention.key.weight":
             RNG.normal(size=(nh * hd, h)),
         "transformer.decoder_layer.0.multi_head_attention.value.weight":
             RNG.normal(size=(nh * hd, h)),
         "transformer.decoder_layer.0.multi_head_attention.linear.weight":
             RNG.normal(size=(h, nh * hd)),
         "transformer.decoder_layer.0.router.weight": RNG.normal(size=(ne, h))}
    for e in range(ne):
        t[f"transformer.decoder_layer.0.moe.{e}.linear.weight"] = RNG.normal(size=(mff, h))
        t[f"transformer.decoder_layer.0.moe.{e}.linear_v.weight"] = RNG.normal(size=(mff, h))
        t[f"transformer.decoder_layer.0.moe.{e}.linear_1.weight"] = RNG.normal(size=(h, mff))
    d = tmp_path / "grok"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "grok")
    assert r.get("general.architecture") == "grok"
    assert r.get("grok.expert_count") == ne
    for n in ("blk.0.attn_norm.weight", "blk.0.attn_output_norm.weight",
              "blk.0.ffn_norm.weight", "blk.0.layer_output_norm.weight",
              "blk.0.ffn_gate_inp.weight", "token_embd.weight"):
        assert n in r.tensors, n
    ge = r.tensor_float("blk.0.ffn_gate_exps.weight")
    ue = r.tensor_float("blk.0.ffn_up_exps.weight")
    de = r.tensor_float("blk.0.ffn_down_exps.weight")
    assert ge.shape == (ne, mff, h) and ue.shape == (ne, mff, h)
    assert de.shape == (ne, h, mff)
    np.testing.assert_allclose(
        ue[2], t["transformer.decoder_layer.0.moe.2.linear_v.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_plamo2_pack(tmp_path):
    """PLaMo-2: layers.layers hybrid naming, dt/B/C norm renames, A_log ->
    -exp, mamba_step kv-head zeroing, converter norm shifts
    (Plamo2Model :4068-4235)."""
    h, nh, nkv, v = 32, 4, 4, 64
    m_heads, hph, d_state, d_conv = 4, 8, 16, 4
    d_inner = m_heads * hph
    cfg = {"model_type": "plamo2", "vocab_size": v, "hidden_size": h,
           "intermediate_size": 96, "num_hidden_layers": 2,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128,
           "mamba_step": 2, "mamba_enabled": True, "mamba_num_heads": m_heads,
           "hidden_size_per_head": hph, "mamba_d_state": d_state,
           "mamba_d_conv": d_conv}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    # layer 0: mamba (i%2 != 1)
    p = "model.layers.layers.0"
    t.update({
        f"{p}.pre_mixer_norm.weight": RNG.normal(size=(h,)),
        f"{p}.post_mixer_norm.weight": RNG.normal(size=(h,)),
        f"{p}.pre_mlp_norm.weight": RNG.normal(size=(h,)),
        f"{p}.post_mlp_norm.weight": RNG.normal(size=(h,)),
        f"{p}.mixer.in_proj.weight": RNG.normal(size=(2 * d_inner, h)),
        f"{p}.mixer.conv1d.weight": RNG.normal(size=(d_inner, 1, d_conv)),
        f"{p}.mixer.bcdt_proj.weight": RNG.normal(size=(2 * d_state + m_heads, d_inner)),
        f"{p}.mixer.dt_proj.weight": RNG.normal(size=(m_heads, m_heads)),
        f"{p}.mixer.dt_bias": RNG.normal(size=(m_heads,)),
        f"{p}.mixer.dt_norm_weight": RNG.normal(size=(m_heads,)),
        f"{p}.mixer.B_norm_weight": RNG.normal(size=(d_state,)),
        f"{p}.mixer.C_norm_weight": RNG.normal(size=(d_state,)),
        f"{p}.mixer.A_log": np.abs(RNG.normal(size=(m_heads,))) + 0.1,
        f"{p}.mixer.D": RNG.normal(size=(m_heads,)),
        f"{p}.mixer.out_proj.weight": RNG.normal(size=(h, d_inner)),
        f"{p}.mlp.gate_up_proj.weight": RNG.normal(size=(2 * 96, h)),
        f"{p}.mlp.down_proj.weight": RNG.normal(size=(h, 96)),
    })
    # layer 1: attention
    p = "model.layers.layers.1"
    t.update({
        f"{p}.pre_mixer_norm.weight": RNG.normal(size=(h,)),
        f"{p}.post_mixer_norm.weight": RNG.normal(size=(h,)),
        f"{p}.pre_mlp_norm.weight": RNG.normal(size=(h,)),
        f"{p}.post_mlp_norm.weight": RNG.normal(size=(h,)),
        f"{p}.mixer.qkv_proj.weight": RNG.normal(size=(3 * h, h)),
        f"{p}.mixer.q_weight": RNG.normal(size=(nh, h // nh)),
        f"{p}.mixer.k_weight": RNG.normal(size=(nkv, h // nh)),
        f"{p}.mixer.o_proj.weight": RNG.normal(size=(h, h)),
        f"{p}.mlp.gate_up_proj.weight": RNG.normal(size=(2 * 96, h)),
        f"{p}.mlp.down_proj.weight": RNG.normal(size=(h, 96)),
    })
    d = tmp_path / "plamo2"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "plamo2")
    assert r.get("general.architecture") == "plamo2"
    assert r.get("plamo2.attention.head_count_kv") == [0, nkv]
    assert r.get("plamo2.ssm.inner_size") == d_inner
    assert r.get("plamo2.ssm.group_count") == 0
    assert r.get("plamo2.ssm.time_step_rank") == m_heads
    for n in ("blk.0.ssm_in.weight", "blk.0.ssm_x.weight",
              "blk.0.ssm_dt.weight", "blk.0.ssm_dt.bias",
              "blk.0.ssm_dt_norm.weight", "blk.0.ssm_b_norm.weight",
              "blk.0.ssm_c_norm.weight", "blk.1.attn_qkv.weight",
              "blk.1.attn_q_norm.weight", "blk.0.post_attention_norm.weight",
              "blk.1.post_ffw_norm.weight"):
        assert n in r.tensors, n
    # A_log -> -exp
    a = r.tensor_float("blk.0.ssm_a")
    np.testing.assert_allclose(
        a, -np.exp(t["model.layers.layers.0.mixer.A_log"].astype(np.float32)),
        rtol=1e-6)
    # conv squeezed 2D
    assert r.tensor_float("blk.0.ssm_conv1d.weight").shape == (d_inner, d_conv)
    # norm shifts: pre +1, post-mixer +1/5, post-mlp +1/5^1.5
    np.testing.assert_allclose(
        r.tensor_float("blk.0.attn_norm.weight"),
        t["model.layers.layers.0.pre_mixer_norm.weight"].astype(np.float32) + 1.0,
        rtol=1e-6)
    np.testing.assert_allclose(
        r.tensor_float("blk.0.post_attention_norm.weight"),
        t["model.layers.layers.0.post_mixer_norm.weight"].astype(np.float32) + 0.2,
        rtol=1e-6)
    np.testing.assert_allclose(
        r.tensor_float("blk.1.post_ffw_norm.weight"),
        t["model.layers.layers.1.post_mlp_norm.weight"].astype(np.float32)
        + 1.0 / 5 ** 1.5, rtol=1e-6)
    # fused gate_up kept whole in ffn_up
    assert r.tensor_float("blk.0.ffn_up.weight").shape == (192, h)
