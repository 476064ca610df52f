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
