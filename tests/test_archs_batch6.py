"""Pack-only arch batch: qwen-v1 / chatglm / codeshell / refact / jais /
deci (reference converter entries: QwenModel :2957, ChatGLMModel :7141,
CodeShellModel :4237, RefactModel :1890, JaisModel :6886, DeciModel :2509)."""

import json
import math
from pathlib import Path

import numpy as np

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(46)


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


def test_qwen1_pack(tmp_path):
    """Qwen v1: fused c_attn kept, w2/w1 -> gate/up, rotary_emb_base."""
    h, ff, nh, v = 32, 96, 4, 64
    cfg = {"model_type": "qwen", "vocab_size": v, "hidden_size": h,
           "intermediate_size": ff, "num_hidden_layers": 1,
           "num_attention_heads": nh, "layer_norm_epsilon": 1e-6,
           "rotary_emb_base": 12345.0, "max_position_embeddings": 128}
    t = {"transformer.wte.weight": RNG.normal(size=(v, h)),
         "transformer.ln_f.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "transformer.h.0.ln_1.weight": RNG.normal(size=(h,)),
         "transformer.h.0.attn.c_attn.weight": RNG.normal(size=(3 * h, h)),
         "transformer.h.0.attn.c_attn.bias": RNG.normal(size=(3 * h,)),
         "transformer.h.0.attn.c_proj.weight": RNG.normal(size=(h, h)),
         "transformer.h.0.ln_2.weight": RNG.normal(size=(h,)),
         "transformer.h.0.mlp.w1.weight": RNG.normal(size=(ff // 2, h)),
         "transformer.h.0.mlp.w2.weight": RNG.normal(size=(ff // 2, h)),
         "transformer.h.0.mlp.c_proj.weight": RNG.normal(size=(h, ff // 2))}
    d = tmp_path / "qwen"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "qwen")
    assert r.get("general.architecture") == "qwen"
    assert r.get("qwen.rope.freq_base") == 12345.0
    assert r.get("qwen.feed_forward_length") == ff  # doubled-FF quirk kept
    assert abs(r.get("qwen.attention.layer_norm_rms_epsilon") - 1e-6) < 1e-12
    assert "blk.0.attn_qkv.weight" in r.tensors
    assert "blk.0.attn_qkv.bias" in r.tensors
    # w2 -> gate, w1 -> up
    g = r.tensor_float("blk.0.ffn_gate.weight")
    np.testing.assert_allclose(
        g, t["transformer.h.0.mlp.w2.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_chatglm_pack(tmp_path):
    """ChatGLM: fused MQA query_key_value, fused h_to_4h stays in ffn_up,
    partial rotary 0.5 + rope_ratio, add_bos false."""
    h, ff, nh, nkv, v = 32, 64, 4, 2, 64
    hd = h // nh
    cfg = {"model_type": "chatglm", "padded_vocab_size": v, "hidden_size": h,
           "ffn_hidden_size": ff, "num_layers": 2, "num_attention_heads": nh,
           "multi_query_group_num": nkv, "layernorm_epsilon": 1e-5,
           "seq_length": 512, "rope_ratio": 50.0, "vocab_size": v}
    qkv_rows = h + 2 * nkv * hd
    t = {"transformer.embedding.word_embeddings.weight": RNG.normal(size=(v, h)),
         "transformer.encoder.final_layernorm.weight": RNG.normal(size=(h,)),
         "transformer.output_layer.weight": RNG.normal(size=(v, h)),
         "transformer.rotary_pos_emb.inv_freq": RNG.normal(size=(hd // 2,))}
    for i in range(2):
        t.update({
            f"transformer.encoder.layers.{i}.input_layernorm.weight": RNG.normal(size=(h,)),
            f"transformer.encoder.layers.{i}.self_attention.query_key_value.weight":
                RNG.normal(size=(qkv_rows, h)),
            f"transformer.encoder.layers.{i}.self_attention.query_key_value.bias":
                RNG.normal(size=(qkv_rows,)),
            f"transformer.encoder.layers.{i}.self_attention.dense.weight":
                RNG.normal(size=(h, h)),
            f"transformer.encoder.layers.{i}.post_attention_layernorm.weight":
                RNG.normal(size=(h,)),
            f"transformer.encoder.layers.{i}.mlp.dense_h_to_4h.weight":
                RNG.normal(size=(2 * ff, h)),
            f"transformer.encoder.layers.{i}.mlp.dense_4h_to_h.weight":
                RNG.normal(size=(h, ff)),
        })
    d = tmp_path / "chatglm"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "chatglm")
    assert r.get("general.architecture") == "chatglm"
    assert r.get("chatglm.context_length") == 512
    assert r.get("chatglm.attention.head_count_kv") == nkv
    assert r.get("chatglm.rope.dimension_count") == hd // 2
    assert r.get("chatglm.rope.freq_base") == 10000.0 * 50.0
    assert r.get("tokenizer.ggml.add_bos_token") is False
    assert "blk.1.attn_qkv.weight" in r.tensors
    assert "blk.1.attn_qkv.bias" in r.tensors
    u = r.tensor_float("blk.0.ffn_up.weight")
    assert u.shape == (2 * ff, h)  # fused gate+up kept whole
    assert not any("inv_freq" in n for n in r.tensors)


def test_codeshell_pack(tmp_path):
    """CodeShell: gpt_bigcode naming with query groups + the converter's
    rope linear-1.0 scaling quirk."""
    h, nh, ng, v = 32, 4, 2, 64
    hd = h // nh
    cfg = {"model_type": "codeshell", "vocab_size": v, "n_embd": h,
           "n_layer": 1, "n_head": nh, "num_query_groups": ng,
           "layer_norm_epsilon": 1e-5, "n_positions": 256,
           "tie_word_embeddings": True}
    qkv_rows = h + 2 * ng * hd
    t = {"transformer.wte.weight": RNG.normal(size=(v, h)),
         "transformer.ln_f.weight": RNG.normal(size=(h,)),
         "transformer.ln_f.bias": RNG.normal(size=(h,)),
         "transformer.h.0.ln_1.weight": RNG.normal(size=(h,)),
         "transformer.h.0.ln_1.bias": RNG.normal(size=(h,)),
         "transformer.h.0.attn.c_attn.weight": RNG.normal(size=(qkv_rows, h)),
         "transformer.h.0.attn.c_attn.bias": RNG.normal(size=(qkv_rows,)),
         "transformer.h.0.attn.c_proj.weight": RNG.normal(size=(h, h)),
         "transformer.h.0.ln_2.weight": RNG.normal(size=(h,)),
         "transformer.h.0.ln_2.bias": RNG.normal(size=(h,)),
         "transformer.h.0.mlp.c_fc.weight": RNG.normal(size=(4 * h, h)),
         "transformer.h.0.mlp.c_proj.weight": RNG.normal(size=(h, 4 * h))}
    d = tmp_path / "codeshell"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "codeshell")
    assert r.get("general.architecture") == "codeshell"
    assert r.get("codeshell.attention.head_count_kv") == ng
    assert r.get("codeshell.rope.freq_base") == 10000.0
    assert r.get("codeshell.rope.scaling.type") == "linear"
    assert r.get("codeshell.rope.scaling.factor") == 1.0
    assert r.get("codeshell.feed_forward_length") == 4 * h
    assert "blk.0.attn_qkv.weight" in r.tensors
    assert "output.weight" in r.tensors  # tied


def test_refact_pack(tmp_path):
    """Refact: MQA kv split at one head, fused gate_up split at the
    computed llama-style width, ALiBi (no rope keys)."""
    h, nh, v = 32, 4, 64
    hd = h // nh
    inner = 4 * h
    ff = 256 * ((int(2 * inner / 3) + 255) // 256)
    cfg = {"model_type": "gpt_refact", "vocab_size": v, "n_embd": h,
           "n_layer": 1, "n_head": nh, "layer_norm_epsilon": 1e-5,
           "n_positions": 256}
    t = {"transformer.wte.weight": RNG.normal(size=(v, h)),
         "transformer.ln_f.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h)),
         "transformer.h.0.ln_1.weight": RNG.normal(size=(h,)),
         "transformer.h.0.ln_2.weight": RNG.normal(size=(h,)),
         "transformer.h.0.attn.q.weight": RNG.normal(size=(h, h)),
         "transformer.h.0.attn.kv.weight": RNG.normal(size=(2 * hd, h)),
         "transformer.h.0.attn.c_proj.weight": RNG.normal(size=(h, h)),
         "transformer.h.0.mlp.gate_up_proj.weight": RNG.normal(size=(2 * ff, h)),
         "transformer.h.0.mlp.c_proj.weight": RNG.normal(size=(h, ff))}
    d = tmp_path / "refact"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "refact")
    assert r.get("general.architecture") == "refact"
    assert r.get("refact.attention.head_count_kv") == 1
    assert r.get("refact.feed_forward_length") == ff
    assert r.get("refact.rope.freq_base") is None
    k = r.tensor_float("blk.0.attn_k.weight")
    vv = r.tensor_float("blk.0.attn_v.weight")
    raw = t["transformer.h.0.attn.kv.weight"]
    np.testing.assert_allclose(
        k, raw[:hd].astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        vv, raw[hd:].astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    g = r.tensor_float("blk.0.ffn_gate.weight")
    assert g.shape == (ff, h)


def test_jais_pack(tmp_path):
    """JAIS: Conv1D transposes, muP scales folded into embd/output, ALiBi
    max bias recovered from the slopes tensor."""
    h, ff, nh, v = 32, 64, 4, 64
    slopes = 2.0 ** (-8.0 / nh * np.arange(1, nh + 1))
    cfg = {"model_type": "jais", "vocab_size": v, "n_embd": h,
           "n_inner": ff, "n_layer": 1, "n_head": nh,
           "layer_norm_epsilon": 1e-5, "n_positions": 256,
           "activation_function": "swiglu", "position_embedding_type": "alibi",
           "mup_embeddings_scale": 2.0, "mup_output_alpha": 0.5,
           "mup_width_scale": 0.25, "tie_word_embeddings": True}
    t = {"transformer.wte.weight": RNG.normal(size=(v, h)),
         "transformer.ln_f.weight": RNG.normal(size=(h,)),
         "transformer.ln_f.bias": RNG.normal(size=(h,)),
         "transformer.relative_pe.slopes": slopes,
         "transformer.h.0.ln_1.weight": RNG.normal(size=(h,)),
         "transformer.h.0.ln_1.bias": RNG.normal(size=(h,)),
         "transformer.h.0.attn.c_attn.weight": RNG.normal(size=(h, 3 * h)),
         "transformer.h.0.attn.c_attn.bias": RNG.normal(size=(3 * h,)),
         "transformer.h.0.attn.c_proj.weight": RNG.normal(size=(h, h)),
         "transformer.h.0.ln_2.weight": RNG.normal(size=(h,)),
         "transformer.h.0.ln_2.bias": RNG.normal(size=(h,)),
         "transformer.h.0.mlp.c_fc.weight": RNG.normal(size=(h, ff)),
         "transformer.h.0.mlp.c_fc2.weight": RNG.normal(size=(h, ff)),
         "transformer.h.0.mlp.c_proj.weight": RNG.normal(size=(ff, h))}
    d = tmp_path / "jais"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "jais")
    assert r.get("general.architecture") == "jais"
    # max_alibi_bias = -round(log2(first_slope) * 4); first slope 2^-2 -> 8
    assert r.get("jais.attention.max_alibi_bias") == 8.0
    assert "relative_pe" not in " ".join(r.tensors)
    # embeddings scaled by mup_embeddings_scale
    emb = r.tensor_float("token_embd.weight")
    np.testing.assert_allclose(
        emb, (t["transformer.wte.weight"] * 2.0)
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # tied output scaled by output_alpha * width_scale
    out = r.tensor_float("output.weight")
    np.testing.assert_allclose(
        out, (t["transformer.wte.weight"] * 0.125)
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # Conv1D transposed: ffn_gate from c_fc2.T
    g = r.tensor_float("blk.0.ffn_gate.weight")
    np.testing.assert_allclose(
        g, t["transformer.h.0.mlp.c_fc2.weight"].T
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_deci_pack(tmp_path):
    """Deci NAS: per-layer head/kv/ffn arrays from block_configs with
    attention-free and dummy layers, per-layer GQA permute, own llama3
    rope_freqs tensor."""
    h, nh, v = 32, 4, 64
    hd = h // nh
    block_configs = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": False},
         "ffn": {"ffn_mult": 2.0}},
    ]
    ffs = []
    for mult in (1.0, 2.0):
        size = int(2 * mult * h / 3)
        ffs.append(size if size % 256 == 0 else size + 256 - size % 256)
    cfg = {"model_type": "nemotron-nas", "vocab_size": v, "hidden_size": h,
           "num_hidden_layers": 2, "num_attention_heads": nh,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 1024,
           "rope_theta": 500000.0, "block_configs": block_configs,
           "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                            "original_max_position_embeddings": 8192}}
    t = {"model.embed_tokens.weight": RNG.normal(size=(v, h)),
         "model.norm.weight": RNG.normal(size=(h,)),
         "lm_head.weight": RNG.normal(size=(v, h))}
    # layer 0: attention + ffn
    t.update({
        "model.layers.0.input_layernorm.weight": RNG.normal(size=(h,)),
        "model.layers.0.post_attention_layernorm.weight": RNG.normal(size=(h,)),
        "model.layers.0.self_attn.q_proj.weight": RNG.normal(size=(h, h)),
        "model.layers.0.self_attn.k_proj.weight": RNG.normal(size=(2 * hd, h)),
        "model.layers.0.self_attn.v_proj.weight": RNG.normal(size=(2 * hd, h)),
        "model.layers.0.self_attn.o_proj.weight": RNG.normal(size=(h, h)),
        "model.layers.0.mlp.gate_proj.weight": RNG.normal(size=(ffs[0], h)),
        "model.layers.0.mlp.up_proj.weight": RNG.normal(size=(ffs[0], h)),
        "model.layers.0.mlp.down_proj.weight": RNG.normal(size=(h, ffs[0])),
    })
    # layer 1: attention-free (ffn only)
    t.update({
        "model.layers.1.post_attention_layernorm.weight": RNG.normal(size=(h,)),
        "model.layers.1.mlp.gate_proj.weight": RNG.normal(size=(ffs[1], h)),
        "model.layers.1.mlp.up_proj.weight": RNG.normal(size=(ffs[1], h)),
        "model.layers.1.mlp.down_proj.weight": RNG.normal(size=(h, ffs[1])),
    })
    d = tmp_path / "deci"
    _save(d, cfg, t)
    r = _pack(tmp_path, d, "deci")
    assert r.get("general.architecture") == "deci"
    assert r.get("deci.attention.head_count") == [nh, 0]
    assert r.get("deci.attention.head_count_kv") == [2, 0]
    assert r.get("deci.feed_forward_length") == ffs
    # per-layer GQA permute on k (2 kv heads)
    k = r.tensor_float("blk.0.attn_k.weight")
    perm = packer.gqa_permute_rows(2 * hd, 2)
    np.testing.assert_allclose(
        k, t["model.layers.0.self_attn.k_proj.weight"][perm]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # llama3 rope factors emitted by the arch spec
    rf = r.tensor_float("rope_freqs.weight")
    assert rf.shape == (hd // 2,)
    assert rf.max() <= 8.0 and rf.min() >= 1.0
