"""Multimodal text-side pack support: qwen2-vl mrope, llava wrapper
fallback, nomic-bert (reference converter entries: Qwen2VLModel :5129,
LlamaModel register incl. LlavaForConditionalGeneration :2048,
NomicBertModel :4801)."""

import json
from pathlib import Path

import numpy as np
import torch

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(52)


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_qwen2_vl_pack(tmp_path):
    """Qwen2-VL: text packs as arch qwen2vl with 4-padded mrope sections;
    vision tower dropped."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 1, 1]}),
        vision_config=dict(embed_dim=32, hidden_size=32, depth=1, num_heads=4,
                           in_channels=3, patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2))
    torch.manual_seed(13)
    m = Qwen2VLForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "qwen2vl"
    m.save_pretrained(d, safe_serialization=True)
    r = _pack(tmp_path, d, "qwen2vl")
    assert r.get("general.architecture") == "qwen2vl"
    assert r.get("qwen2vl.rope.dimension_sections") == [2, 1, 1, 0]
    assert "blk.0.attn_q.weight" in r.tensors
    assert not any("visual" in n or "patch_embed" in n for n in r.tensors)
    sd = m.state_dict()
    text_q = [k for k in sd if k.endswith("self_attn.q_proj.weight")
              and "visual" not in k][0]
    np.testing.assert_allclose(
        r.tensor_float("blk.0.attn_q.weight"),
        sd[text_q].numpy().astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)


def test_llava_wrapper_fallback(tmp_path):
    """LlavaForConditionalGeneration: wrapper model_type resolves to the
    text_config arch; language_model prefix stripped, vision dropped."""
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    cfg = LlavaConfig(
        text_config=dict(model_type="llama", vocab_size=64, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=1, num_attention_heads=4,
                           image_size=28, patch_size=14),
        image_token_index=1)
    torch.manual_seed(14)
    m = LlavaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "llava"
    m.save_pretrained(d, safe_serialization=True)
    r = _pack(tmp_path, d, "llava")
    assert r.get("general.architecture") == "llama"
    assert "blk.0.attn_q.weight" in r.tensors
    assert "token_embd.weight" in r.tensors
    assert not any("vision" in n or "projector" in n for n in r.tensors)


def test_nomic_bert_pack(tmp_path):
    """nomic-bert: fused Wqkv, fc11/fc12 swiglu mapping, rope base, the
    trained-context trim; MoE variant stacks the fused expert views."""
    from safetensors.numpy import save_file

    h, nh, n_in, v, ne = 32, 4, 48, 64, 4
    cfg = {"model_type": "nomic_bert", "vocab_size": v, "n_embd": h,
           "n_head": nh, "n_layer": 2, "n_inner": n_in, "n_positions": 8192,
           "max_trained_positions": 2048, "rotary_emb_base": 1000.0,
           "type_vocab_size": 2, "layer_norm_epsilon": 1e-12,
           "moe_every_n_layers": 2, "num_experts": ne, "moe_top_k": 2}
    t = {"embeddings.word_embeddings.weight": RNG.normal(size=(v, h)),
         "embeddings.token_type_embeddings.weight": RNG.normal(size=(2, h)),
         "emb_ln.weight": RNG.normal(size=(h,)),
         "emb_ln.bias": RNG.normal(size=(h,))}
    for i in range(2):
        p = f"encoder.layers.{i}"
        t.update({
            f"{p}.attn.Wqkv.weight": RNG.normal(size=(3 * h, h)),
            f"{p}.attn.Wqkv.bias": RNG.normal(size=(3 * h,)),
            f"{p}.attn.out_proj.weight": RNG.normal(size=(h, h)),
            f"{p}.attn.out_proj.bias": RNG.normal(size=(h,)),
            f"{p}.norm1.weight": RNG.normal(size=(h,)),
            f"{p}.norm1.bias": RNG.normal(size=(h,)),
            f"{p}.norm2.weight": RNG.normal(size=(h,)),
            f"{p}.norm2.bias": RNG.normal(size=(h,)),
        })
    # layer 0: dense swiglu; layer 1: MoE (moe_every_n_layers=2 -> odd)
    t.update({
        "encoder.layers.0.mlp.fc11.weight": RNG.normal(size=(n_in, h)),
        "encoder.layers.0.mlp.fc12.weight": RNG.normal(size=(n_in, h)),
        "encoder.layers.0.mlp.fc2.weight": RNG.normal(size=(h, n_in)),
        "encoder.layers.1.mlp.router.layer.weight": RNG.normal(size=(ne, h)),
        "encoder.layers.1.mlp.experts.mlp.w1": RNG.normal(size=(ne * n_in, h)),
        "encoder.layers.1.mlp.experts.mlp.w2": RNG.normal(size=(ne * n_in, h)),
        "encoder.layers.1.mlp.experts.bias": RNG.normal(size=(ne,)),
    })
    d = tmp_path / "nomic"
    d.mkdir()
    json.dump(cfg, open(d / "config.json", "w"))
    save_file({k: vv.astype(np.float32) for k, vv in t.items()},
              str(d / "model.safetensors"))
    r = _pack(tmp_path, d, "nomic")
    assert r.get("general.architecture") == "nomic-bert-moe"
    assert r.get("nomic-bert-moe.context_length") == 2048  # trimmed
    assert r.get("nomic-bert-moe.rope.freq_base") == 1000.0
    assert r.get("nomic-bert-moe.moe_every_n_layers") == 2
    assert r.get("nomic-bert-moe.expert_count") == ne
    assert r.get("nomic-bert-moe.attention.causal") is False
    for n in ("blk.0.attn_qkv.weight", "blk.0.attn_qkv.bias",
              "blk.0.ffn_up.weight", "blk.0.ffn_gate.weight",
              "blk.1.ffn_gate_inp.weight", "blk.0.attn_output_norm.weight",
              "blk.1.layer_output_norm.bias", "token_types.weight"):
        assert n in r.tensors, n
    # fc12 -> gate
    g = r.tensor_float("blk.0.ffn_gate.weight")
    np.testing.assert_allclose(
        g, t["encoder.layers.0.mlp.fc12.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # expert views: w1 -> up (ne, n_in, h); w2 -> down transposed
    ue = r.tensor_float("blk.1.ffn_up_exps.weight")
    de = r.tensor_float("blk.1.ffn_down_exps.weight")
    assert ue.shape == (ne, n_in, h) and de.shape == (ne, h, n_in)
    np.testing.assert_allclose(
        ue[1], t["encoder.layers.1.mlp.experts.mlp.w1"]
        .reshape(ne, n_in, h)[1].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    # unused expert bias dropped
    assert not any(n.endswith("exps.bias") for n in r.tensors)


def test_gemma3n_pack(tmp_path):
    """Gemma-3n: altup stacks, laurel branch, per-layer inputs, sparsity
    std multipliers, unshifted norms (reference Gemma3NModel :5157)."""
    from transformers import Gemma3nTextConfig, Gemma3nForCausalLM

    cfg = Gemma3nTextConfig(
        vocab_size=64, vocab_size_per_layer_input=32, hidden_size=32,
        hidden_size_per_layer_input=8, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, altup_num_inputs=4, altup_active_idx=0,
        num_kv_shared_layers=1, laurel_rank=4,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention"],
        sliding_window=16, activation_sparsity_pattern=[0.95, 0.0, 0.0],
        torch_dtype="float32", use_cache=False)
    torch.manual_seed(21)
    m = Gemma3nForCausalLM(cfg).eval().float()
    d = tmp_path / "g3n"
    m.save_pretrained(d, safe_serialization=True)
    r = _pack(tmp_path, d, "g3n")
    assert r.get("general.architecture") == "gemma3n"
    assert r.get("gemma3n.altup.num_inputs") == 4
    assert r.get("gemma3n.altup.active_idx") == 0
    assert r.get("gemma3n.embedding_length_per_layer_input") == 8
    assert r.get("gemma3n.attention.shared_kv_layers") == 1
    assert r.get("gemma3n.attention.sliding_window_pattern") == [True, False, True]
    scale = r.get("gemma3n.activation_sparsity_scale")
    # icdf(0.95) std multiplier; icdf(0.0) = -inf marks non-sparse layers
    # (the reference writes exactly this)
    assert abs(scale[0] - 1.6448536) < 1e-4
    assert scale[1] == float("-inf")
    sd = m.state_dict()
    for n in ("per_layer_token_embd.weight", "per_layer_model_proj.weight",
              "per_layer_proj_norm.weight", "altup_proj.weight",
              "altup_unembd_proj.weight", "blk.0.altup_correct_coef.weight",
              "blk.0.altup_correct_scale.weight", "blk.0.altup_router.weight",
              "blk.1.laurel_l.weight", "blk.1.laurel_r.weight",
              "blk.2.laurel_post_norm.weight", "blk.0.inp_gate.weight",
              "blk.0.proj.weight", "blk.0.post_norm.weight",
              "blk.0.post_attention_norm.weight", "blk.0.ffn_norm.weight",
              "blk.0.post_ffw_norm.weight"):
        assert n in r.tensors, n
    ap = r.tensor_float("altup_proj.weight")
    assert ap.shape == (3, 32, 32)
    np.testing.assert_allclose(
        ap[2], sd["model.altup_projections.2.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    # norms NOT shifted (+0), unlike gemma3
    np.testing.assert_allclose(
        r.tensor_float("blk.0.attn_norm.weight"),
        sd["model.layers.0.input_layernorm.weight"].numpy().astype(np.float32),
        rtol=1e-6)
