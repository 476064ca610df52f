"""RWKV family pack support: rwkv6 / rwkv6qwen2 / rwkv7 / arwkv7
(reference converter entries: Rwkv6Model :5318, RWKV6Qwen2Model :5393,
Rwkv7Model :5445, ARwkv7Model :5563)."""

import json
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(51)


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


def _rwkv6_layer(i, h, ff, n_head, hs, extra=8, dextra=16):
    p = f"rwkv.blocks.{i}"
    t = {
        f"{p}.ln1.weight": RNG.normal(size=(h,)),
        f"{p}.ln1.bias": RNG.normal(size=(h,)),
        f"{p}.ln2.weight": RNG.normal(size=(h,)),
        f"{p}.ln2.bias": RNG.normal(size=(h,)),
        f"{p}.attention.time_maa_x": RNG.normal(size=(1, 1, h)),
        f"{p}.attention.time_maa_w1": RNG.normal(size=(h, 5 * extra)),
        f"{p}.attention.time_maa_w2": RNG.normal(size=(5, extra, h)),
        f"{p}.attention.time_decay": RNG.normal(size=(1, 1, h)),
        f"{p}.attention.time_decay_w1": RNG.normal(size=(h, dextra)),
        f"{p}.attention.time_decay_w2": RNG.normal(size=(dextra, h)),
        f"{p}.attention.time_faaaa": RNG.normal(size=(n_head, hs)),
        f"{p}.attention.receptance.weight": RNG.normal(size=(h, h)),
        f"{p}.attention.key.weight": RNG.normal(size=(h, h)),
        f"{p}.attention.value.weight": RNG.normal(size=(h, h)),
        f"{p}.attention.gate.weight": RNG.normal(size=(h, h)),
        f"{p}.attention.output.weight": RNG.normal(size=(h, h)),
        f"{p}.attention.ln_x.weight": RNG.normal(size=(h,)),
        f"{p}.attention.ln_x.bias": RNG.normal(size=(h,)),
        f"{p}.feed_forward.time_maa_k": RNG.normal(size=(1, 1, h)),
        f"{p}.feed_forward.time_maa_r": RNG.normal(size=(1, 1, h)),
        f"{p}.feed_forward.key.weight": RNG.normal(size=(ff, h)),
        f"{p}.feed_forward.receptance.weight": RNG.normal(size=(h, h)),
        f"{p}.feed_forward.value.weight": RNG.normal(size=(h, ff)),
    }
    for k in "wkvrg":
        t[f"{p}.attention.time_maa_{k}"] = RNG.normal(size=(1, 1, h))
    return t


def _write_world_vocab(d: Path, entries):
    """Write a tiny rwkv_vocab_v20230424.txt (id <literal> len per line)."""
    lines = []
    for i, tok in enumerate(entries, start=1):
        b = tok.encode("utf-8") if isinstance(tok, str) else tok
        lit = repr(tok)
        lines.append(f"{i} {lit} {len(b)}")
    (d / "rwkv_vocab_v20230424.txt").write_text("\n".join(lines))


def test_rwkv6_pack(tmp_path):
    h, ff, n_head, hs, v = 32, 64, 4, 8, 64
    cfg = {"model_type": "rwkv6", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 2,
           "num_attention_heads": 0, "head_size": hs,
           "layer_norm_epsilon": 1e-5, "rescale_every": 2}
    t = {"rwkv.embeddings.weight": RNG.normal(size=(v, h)),
         "rwkv.blocks.0.pre_ln.weight": RNG.normal(size=(h,)),
         "rwkv.blocks.0.pre_ln.bias": RNG.normal(size=(h,)),
         "rwkv.ln_out.weight": RNG.normal(size=(h,)),
         "rwkv.ln_out.bias": RNG.normal(size=(h,)),
         "head.weight": RNG.normal(size=(v, h))}
    t.update(_rwkv6_layer(0, h, ff, n_head, hs))
    t.update(_rwkv6_layer(1, h, ff, n_head, hs))
    d = tmp_path / "rwkv6"
    _save(d, cfg, t)
    # real RWKV checkpoints ship the world-vocab text file, no tokenizer.json
    _write_world_vocab(d, ["a", " b", b"\xff\xfe", "hello"])
    r = _pack(tmp_path, d, "rwkv6")
    assert r.get("general.architecture") == "rwkv6"
    # world vocab (reference _set_vocab_rwkv_world :1142-1185): <s> first,
    # byte-repr token texts, [PADi] fill, bos=eos=0, eot=261
    assert r.get("tokenizer.ggml.model") == "rwkv"
    toks = r.get("tokenizer.ggml.tokens")
    assert len(toks) == v
    assert toks[0] == "<s>"
    assert toks[1] == "a" and toks[2] == " b"
    assert toks[3] == "\\xff\\xfe"  # repr(b'\xff\xfe')[2:-1]
    assert toks[4] == "hello"
    assert toks[5].startswith("[PAD")
    types = r.get("tokenizer.ggml.token_type")
    assert types[0] == 3 and types[1] == 1 and types[5] == 5
    assert r.get("tokenizer.ggml.bos_token_id") == 0
    assert r.get("tokenizer.ggml.eos_token_id") == 0
    assert r.get("tokenizer.ggml.eot_token_id") == 261
    assert r.get("tokenizer.chat_template") == "rwkv-world"
    assert r.get("rwkv6.context_length") == 1048576
    assert r.get("rwkv6.wkv.head_size") == hs
    assert r.get("rwkv6.rescale_every_n_layers") == 2
    assert r.get("rwkv6.attention.head_count") == 0
    for n in ("token_embd.weight", "token_embd_norm.weight",
              "output_norm.weight", "output.weight",
              "blk.0.attn_norm.weight", "blk.0.attn_norm_2.weight",
              "blk.0.time_mix_lerp_x.weight", "blk.0.time_mix_first.weight",
              "blk.0.time_mix_ln.weight", "blk.0.channel_mix_lerp_k.weight",
              "blk.0.channel_mix_key.weight",
              "blk.0.channel_mix_receptance.weight"):
        assert n in r.tensors, n
    # fused lerp: (5, 1, 1, h), order w k v r g
    fl = r.tensor_float("blk.0.time_mix_lerp_fused.weight")
    assert fl.shape == (5, 1, 1, h)
    np.testing.assert_allclose(
        fl[0, 0, 0], t["rwkv.blocks.0.attention.time_maa_w"].reshape(-1),
        rtol=1e-6)
    np.testing.assert_allclose(
        fl[3, 0, 0], t["rwkv.blocks.0.attention.time_maa_r"].reshape(-1),
        rtol=1e-6)
    # w1 transposed
    w1 = r.tensor_float("blk.0.time_mix_w1.weight")
    np.testing.assert_allclose(
        w1, t["rwkv.blocks.0.attention.time_maa_w1"].T
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # w2 axes permuted (0,2,1)
    w2 = r.tensor_float("blk.0.time_mix_w2.weight")
    assert w2.shape == (5, h, 8)
    # rescale: layer-1 output halved (2 ** (1 // 2) == 2 ** 0 for bid 1 -> 1;
    # use bid 1 with rescale 2 -> divide by 2^0=1; layer index 1//2=0) so
    # check layer 1 equals raw, and verify the divide on a fake 2-layer
    # stride by checking time_mix_output of layer 0 is untouched
    o0 = r.tensor_float("blk.0.time_mix_output.weight")
    np.testing.assert_allclose(
        o0, t["rwkv.blocks.0.attention.output.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_rwkv6_rescale_division(tmp_path):
    """Layers at bid >= rescale_every get divided by 2^(bid//n)."""
    h, ff, n_head, hs, v = 32, 64, 4, 8, 64
    cfg = {"model_type": "rwkv6", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 3,
           "head_size": hs, "layer_norm_epsilon": 1e-5, "rescale_every": 2}
    t = {"rwkv.embeddings.weight": RNG.normal(size=(v, h)),
         "rwkv.ln_out.weight": RNG.normal(size=(h,)),
         "head.weight": RNG.normal(size=(v, h))}
    for i in range(3):
        t.update(_rwkv6_layer(i, h, ff, n_head, hs))
    d = tmp_path / "rwkv6b"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "rwkv6b")
    o2 = r.tensor_float("blk.2.time_mix_output.weight")
    np.testing.assert_allclose(
        o2, (t["rwkv.blocks.2.attention.output.weight"] / 2.0)
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    cv2 = r.tensor_float("blk.2.channel_mix_value.weight")
    np.testing.assert_allclose(
        cv2, (t["rwkv.blocks.2.feed_forward.value.weight"] / 2.0)
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_rwkv7_pack(tmp_path):
    h, ff, n_head, hs, v = 32, 64, 4, 8, 64
    dr = 16
    cfg = {"model_type": "rwkv7", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 2,
           "head_size": hs, "layer_norm_epsilon": 1e-5,
           "lora_rank_decay": dr, "lora_rank_iclr": dr,
           "lora_rank_value_residual_mix": dr, "lora_rank_gate": dr,
           "wkv_has_gate": True}
    t = {"model.embeddings.weight": RNG.normal(size=(v, h)),
         "model.layers.0.pre_norm.weight": RNG.normal(size=(h,)),
         "model.layers.0.pre_norm.bias": RNG.normal(size=(h,)),
         "model.ln_out.weight": RNG.normal(size=(h,)),
         "model.ln_out.bias": RNG.normal(size=(h,)),
         "head.weight": RNG.normal(size=(v, h))}
    for i in range(2):
        p = f"model.layers.{i}"
        t.update({
            f"{p}.ln1.weight": RNG.normal(size=(h,)),
            f"{p}.ln1.bias": RNG.normal(size=(h,)),
            f"{p}.ln2.weight": RNG.normal(size=(h,)),
            f"{p}.ln2.bias": RNG.normal(size=(h,)),
            f"{p}.attention.w0": RNG.normal(size=(1, 1, h)),
            f"{p}.attention.w1": RNG.normal(size=(h, dr)),
            f"{p}.attention.w2": RNG.normal(size=(dr, h)),
            f"{p}.attention.a0": RNG.normal(size=(1, 1, h)),
            f"{p}.attention.a1": RNG.normal(size=(h, dr)),
            f"{p}.attention.a2": RNG.normal(size=(dr, h)),
            f"{p}.attention.g1": RNG.normal(size=(h, dr)),
            f"{p}.attention.g2": RNG.normal(size=(dr, h)),
            f"{p}.attention.k_k": RNG.normal(size=(1, 1, h)),
            f"{p}.attention.k_a": RNG.normal(size=(1, 1, h)),
            f"{p}.attention.r_k": RNG.normal(size=(n_head, hs)),
            f"{p}.attention.receptance.weight": RNG.normal(size=(h, h)),
            f"{p}.attention.key.weight": RNG.normal(size=(h, h)),
            f"{p}.attention.value.weight": RNG.normal(size=(h, h)),
            f"{p}.attention.output.weight": RNG.normal(size=(h, h)),
            f"{p}.attention.ln_x.weight": RNG.normal(size=(h,)),
            f"{p}.attention.ln_x.bias": RNG.normal(size=(h,)),
            f"{p}.feed_forward.x_k": RNG.normal(size=(1, 1, h)),
            f"{p}.feed_forward.key.weight": RNG.normal(size=(ff, h)),
            f"{p}.feed_forward.value.weight": RNG.normal(size=(h, ff)),
        })
        for k in "rwkvag":
            t[f"{p}.attention.x_{k}"] = RNG.normal(size=(1, 1, h))
        if i > 0:  # layer 0 v0/v1/v2 are dummies mirrored from the a-branch
            t.update({
                f"{p}.attention.v0": RNG.normal(size=(1, 1, h)),
                f"{p}.attention.v1": RNG.normal(size=(h, dr)),
                f"{p}.attention.v2": RNG.normal(size=(dr, h)),
            })
    d = tmp_path / "rwkv7"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "rwkv7")
    assert r.get("general.architecture") == "rwkv7"
    assert r.get("rwkv7.attention.decay_lora_rank") == dr
    assert r.get("rwkv7.attention.gate_lora_rank") == dr
    for n in ("blk.0.time_mix_w0.weight", "blk.1.time_mix_v1.weight",
              "blk.0.time_mix_k_k.weight", "blk.0.time_mix_r_k.weight",
              "blk.0.channel_mix_lerp_k.weight", "blk.1.time_mix_ln.weight"):
        assert n in r.tensors, n
    # fused lerps, order r w k v a g
    fl = r.tensor_float("blk.1.time_mix_lerp_fused.weight")
    assert fl.shape == (6, 1, 1, h)
    np.testing.assert_allclose(
        fl[4, 0, 0], t["model.layers.1.attention.x_a"].reshape(-1), rtol=1e-6)
    # r_k flattened
    rk = r.tensor_float("blk.0.time_mix_r_k.weight")
    assert rk.shape == (h,)
    # loras transposed
    w1 = r.tensor_float("blk.0.time_mix_w1.weight")
    assert w1.shape == (dr, h)
    # layer-0 dummy v branch mirrored from a
    v1 = r.tensor_float("blk.0.time_mix_v1.weight")
    np.testing.assert_allclose(
        v1, t["model.layers.0.attention.a1"].T.astype(np.float32), rtol=1e-6)


def test_arwkv7_pack(tmp_path):
    """ARWKV-7: qwen2 MLP + RMS norms around the rwkv7 time mix."""
    h, ff, hs, v, dr = 32, 64, 8, 64, 16
    cfg = {"model_type": "rwkv_hybrid", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "head_size": hs, "rms_norm_eps": 1e-6, "wkv_has_gate": True,
           "wkv_version": 7}
    p = "model.layers.0"
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         f"{p}.input_layernorm.weight": RNG.normal(size=(h,)),
         f"{p}.post_attention_layernorm.weight": RNG.normal(size=(h,)),
         f"{p}.self_attn.w0": RNG.normal(size=(1, 1, h)),
         f"{p}.self_attn.w1": RNG.normal(size=(h, dr)),
         f"{p}.self_attn.w2": RNG.normal(size=(dr, h)),
         f"{p}.self_attn.a0": RNG.normal(size=(1, 1, h)),
         f"{p}.self_attn.a1": RNG.normal(size=(h, dr)),
         f"{p}.self_attn.a2": RNG.normal(size=(dr, h)),
         f"{p}.self_attn.g1": RNG.normal(size=(h, dr)),
         f"{p}.self_attn.g2": RNG.normal(size=(dr, h)),
         f"{p}.self_attn.k_k": RNG.normal(size=(1, 1, h)),
         f"{p}.self_attn.k_a": RNG.normal(size=(1, 1, h)),
         f"{p}.self_attn.r_k": RNG.normal(size=(4, hs)),
         f"{p}.self_attn.receptance.weight": RNG.normal(size=(h, h)),
         f"{p}.self_attn.key.weight": RNG.normal(size=(h, h)),
         f"{p}.self_attn.value.weight": RNG.normal(size=(h, h)),
         f"{p}.self_attn.output.weight": RNG.normal(size=(h, h)),
         f"{p}.self_attn.g_norm.weight": RNG.normal(size=(h,)),
         f"{p}.self_attn.g_norm.bias": RNG.normal(size=(h,)),
         f"{p}.mlp.gate_proj.weight": RNG.normal(size=(ff, h)),
         f"{p}.mlp.up_proj.weight": RNG.normal(size=(ff, h)),
         f"{p}.mlp.down_proj.weight": RNG.normal(size=(h, ff))}
    for k in "rwkvag":
        t[f"{p}.self_attn.x_{k}"] = RNG.normal(size=(1, 1, h))
    d = tmp_path / "arwkv7"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "arwkv7")
    assert r.get("general.architecture") == "arwkv7"
    assert r.get("arwkv7.token_shift_count") == 1
    assert r.get("arwkv7.attention.gate_lora_rank") == 128
    for n in ("blk.0.attn_norm.weight", "blk.0.ffn_norm.weight",
              "blk.0.ffn_gate.weight", "blk.0.time_mix_w0.weight",
              "blk.0.time_mix_ln.weight", "blk.0.time_mix_lerp_fused.weight"):
        assert n in r.tensors, n
