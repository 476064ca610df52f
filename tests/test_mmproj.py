"""mmproj (vision encoder) GGUF packer: gemma3 / qwen2-vl / qwen2.5-vl /
pixtral (reference MmprojModel :1308, Gemma3VisionModel, Qwen2VLVisionModel
:5155, LlavaVisionModel pixtral branch)."""

import json

import numpy as np
import torch

from gptq_gguf_tpu.export import mmproj
from gptq_gguf_tpu.formats.gguf import GGUFReader


def test_gemma3_mmproj(tmp_path):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=1, head_dim=12),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14,
                           num_channels=3),
        mm_tokens_per_image=4)
    torch.manual_seed(15)
    m = Gemma3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "g3"
    m.save_pretrained(d, safe_serialization=True)
    json.dump({"image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
               "image_seq_length": 4},
              open(d / "preprocessor_config.json", "w"))
    out = mmproj.pack_mmproj(d, tmp_path / "g3-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("general.architecture") == "clip"
    assert r.get("general.type") == "mmproj"
    assert r.get("clip.projector_type") == "gemma3"
    assert r.get("clip.has_vision_encoder") is True
    assert r.get("clip.use_gelu") is True
    assert r.get("clip.vision.image_size") == 56
    assert r.get("clip.vision.patch_size") == 14
    assert r.get("clip.vision.embedding_length") == 32
    assert r.get("clip.vision.projection_dim") == 48
    assert r.get("clip.vision.block_count") == 2
    assert r.get("clip.vision.image_mean") == [0.5, 0.5, 0.5]
    # scale factor written for non-default test geometry: (56/14)//2 = 2
    assert r.get("clip.vision.projector.scale_factor") == 2
    sd = m.state_dict()
    for n in ("v.patch_embd.weight", "v.position_embd.weight",
              "v.blk.0.attn_q.weight", "v.blk.1.ffn_up.weight",
              "v.blk.0.ln1.weight", "v.post_ln.weight",
              "mm.input_projection.weight", "mm.soft_emb_norm.weight"):
        assert n in r.tensors, n
    # soft_emb_norm gets the (1+w) gemma correction
    key = [k for k in sd if "soft_emb_norm" in k][0]
    np.testing.assert_allclose(
        r.tensor_float("mm.soft_emb_norm.weight"),
        sd[key].numpy().astype(np.float32) + 1.0, rtol=1e-6)
    # no text tensors leak in
    assert not any(n.startswith("blk.") or n == "token_embd.weight"
                   for n in r.tensors)


def test_qwen2_vl_mmproj(tmp_path):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2,
                         rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]}),
        vision_config=dict(embed_dim=32, hidden_size=64, depth=2, num_heads=4,
                           in_channels=3, patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2))
    torch.manual_seed(16)
    m = Qwen2VLForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "qvl"
    m.save_pretrained(d, safe_serialization=True)
    json.dump({"image_mean": [0.48, 0.46, 0.41], "image_std": [0.27, 0.26, 0.28]},
              open(d / "preprocessor_config.json", "w"))
    out = mmproj.pack_mmproj(d, tmp_path / "qvl-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "qwen2vl_merger"
    # qwen2vl key scheme: embedding_length = embed_dim, ff = hidden_size
    assert r.get("clip.vision.embedding_length") == 32
    assert r.get("clip.vision.feed_forward_length") == 64
    assert r.get("clip.vision.block_count") == 2
    sd = m.state_dict()
    # Conv3D split into two planes
    assert "v.patch_embd.weight" in r.tensors
    assert "v.patch_embd.weight.1" in r.tensors
    pe = [k for k in sd if k.endswith("patch_embed.proj.weight")][0]
    raw = sd[pe].numpy()
    np.testing.assert_allclose(
        r.tensor_float("v.patch_embd.weight.1"),
        raw[:, :, 1].astype(np.float32), rtol=1e-6)
    # fused qkv split
    qkv = [k for k in sd if k.endswith("blocks.0.attn.qkv.weight")][0]
    c = sd[qkv].shape[0] // 3
    np.testing.assert_allclose(
        r.tensor_float("v.blk.0.attn_k.weight"),
        sd[qkv].numpy()[c:2 * c].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    # merger
    assert "v.post_ln.weight" in r.tensors  # merger.ln_q
    assert "mm.0.weight" in r.tensors and "mm.2.weight" in r.tensors


def test_qwen2_5_vl_mmproj(tmp_path):
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    cfg = Qwen2_5_VLConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2,
                         rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]}),
        vision_config=dict(hidden_size=32, intermediate_size=48, depth=4,
                           num_heads=4, in_channels=3, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           fullatt_block_indexes=[1, 3], out_hidden_size=32,
                           window_size=28))
    torch.manual_seed(17)
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "q25vl"
    m.save_pretrained(d, safe_serialization=True)
    out = mmproj.pack_mmproj(d, tmp_path / "q25-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "qwen2.5vl_merger"
    assert r.get("clip.use_silu") is True
    assert r.get("clip.vision.n_wa_pattern") == 2
    # 2.5 uses gated MLP names
    assert "v.blk.0.ffn_gate.weight" in r.tensors
    assert "v.blk.0.ffn_down.weight" in r.tensors


def test_mmproj_cli(tmp_path):
    """pack --mmproj end to end through the CLI."""
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration
    from gptq_gguf_tpu.__main__ import main

    cfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=1, head_dim=12),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=1, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3),
        mm_tokens_per_image=4)
    torch.manual_seed(18)
    m = Gemma3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "g3cli"
    m.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "g3cli-mmproj.gguf"
    rc = main(["pack", "--model_dir", str(d), "--outfile", str(out), "--mmproj"])
    assert not rc
    assert GGUFReader(out).get("general.type") == "mmproj"


def test_idefics3_mmproj(tmp_path):
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration

    cfg = Idefics3Config(
        text_config=dict(model_type="llama", vocab_size=64, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3),
        scale_factor=3, image_token_id=1)
    torch.manual_seed(19)
    m = Idefics3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "idefics3"
    m.save_pretrained(d, safe_serialization=True)
    out = mmproj.pack_mmproj(d, tmp_path / "i3-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "idefics3"
    assert r.get("clip.vision.projector.scale_factor") == 3
    assert "mm.model.fc.weight" in r.tensors
    assert "v.blk.1.attn_q.weight" in r.tensors
    assert "v.patch_embd.weight" in r.tensors


def test_qwen2_audio_mmproj(tmp_path):
    from transformers import (Qwen2AudioConfig,
                              Qwen2AudioForConditionalGeneration)

    cfg = Qwen2AudioConfig(
        text_config=dict(model_type="qwen2", vocab_size=64, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2),
        audio_config=dict(d_model=32, encoder_ffn_dim=48, encoder_layers=2,
                          encoder_attention_heads=4, num_mel_bins=16,
                          max_source_positions=100))
    torch.manual_seed(20)
    m = Qwen2AudioForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "q2a"
    m.save_pretrained(d, safe_serialization=True)
    out = mmproj.pack_mmproj(d, tmp_path / "q2a-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.has_audio_encoder") is True
    assert r.get("clip.projector_type") == "qwen2a"
    assert r.get("clip.audio.num_mel_bins") == 16
    assert r.get("clip.audio.embedding_length") == 32
    assert r.get("clip.audio.block_count") == 2
    sd = m.state_dict()
    for n in ("a.conv1d.1.weight", "a.conv1d.2.bias", "a.position_embd.weight",
              "a.blk.0.attn_q.weight", "a.blk.1.ffn_up.weight",
              "a.post_ln.weight", "mm.a.fc.weight"):
        assert n in r.tensors, n
    # conv bias gains a trailing axis
    cb = r.tensor_float("a.conv1d.1.bias")
    assert cb.ndim == 2 and cb.shape[1] == 1
    assert not any(n.startswith("blk.") for n in r.tensors)


def test_lfm2_vl_mmproj_and_text(tmp_path):
    """LFM2-VL: text packs as lfm2 via the wrapper fallback; the vision
    tower + pixel-unshuffle projector pack as an lfm2 mmproj."""
    from transformers import Lfm2VlConfig, Lfm2VlForConditionalGeneration
    from gptq_gguf_tpu.export import packer as _packer

    cfg = Lfm2VlConfig(
        text_config=dict(model_type="lfm2", vocab_size=64, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, block_ff_dim=64,
                         block_auto_adjust_ff_dim=False, conv_L_cache=3,
                         layer_types=["conv", "full_attention"]),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           patch_size=14, num_channels=3, image_size=56),
        downsample_factor=2, vision_feature_layer=-1)
    torch.manual_seed(24)
    m = Lfm2VlForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "lfm2vl"
    m.save_pretrained(d, safe_serialization=True)
    # text side
    tg = tmp_path / "lfm2vl-text.gguf"
    _packer.pack_model(d, tmp_path / "none", tg)
    rt = GGUFReader(tg)
    assert rt.get("general.architecture") == "lfm2"
    assert "blk.0.shortconv.conv.weight" in rt.tensors
    # mmproj side
    out = mmproj.pack_mmproj(d, tmp_path / "lfm2vl-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "lfm2"
    assert r.get("clip.vision.projector.scale_factor") == 2
    assert r.get("clip.vision.block_count") == 2
    assert "mm.1.weight" in r.tensors and "mm.2.weight" in r.tensors
    assert "mm.input_norm.weight" in r.tensors
    assert any(n.startswith("v.blk.") for n in r.tensors)


def test_qwen2_5_omni_mmproj(tmp_path):
    """Qwen2.5-Omni thinker: dual vision+audio mmproj with a generated
    sinusoid audio position embedding."""
    import json as _json
    from safetensors.numpy import save_file

    rng = np.random.default_rng(54)
    h, dm, ff, nl, nh, mel = 32, 32, 48, 2, 4, 16
    cfg = {"model_type": "qwen2_5_omni",
           "thinker_config": {
               "text_config": {"model_type": "qwen2_5_omni_text",
                               "vocab_size": 64, "hidden_size": h,
                               "intermediate_size": ff,
                               "num_hidden_layers": 1,
                               "num_attention_heads": nh,
                               "num_key_value_heads": 2},
               "vision_config": {"hidden_size": h, "intermediate_size": ff,
                                 "depth": 2, "num_heads": nh,
                                 "patch_size": 14, "temporal_patch_size": 2,
                                 "spatial_merge_size": 2,
                                 "fullatt_block_indexes": [1],
                                 "image_size": 56},
               "audio_config": {"d_model": dm, "encoder_ffn_dim": ff,
                                "encoder_layers": nl,
                                "encoder_attention_heads": nh,
                                "num_mel_bins": mel}}}
    t = {}
    # vision tower (qwen2.5 gated mlp naming)
    t["thinker.visual.patch_embed.proj.weight"] = rng.normal(
        size=(h, 3, 2, 14, 14)).astype(np.float32)
    for i in range(2):
        p = f"thinker.visual.blocks.{i}"
        t.update({
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * h, h)).astype(np.float32),
            f"{p}.attn.proj.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.norm1.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.norm2.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.mlp.gate_proj.weight": rng.normal(size=(ff, h)).astype(np.float32),
            f"{p}.mlp.up_proj.weight": rng.normal(size=(ff, h)).astype(np.float32),
            f"{p}.mlp.down_proj.weight": rng.normal(size=(h, ff)).astype(np.float32),
        })
    t["thinker.visual.merger.ln_q.weight"] = rng.normal(size=(h,)).astype(np.float32)
    t["thinker.visual.merger.mlp.0.weight"] = rng.normal(size=(h, 4 * h)).astype(np.float32)
    t["thinker.visual.merger.mlp.2.weight"] = rng.normal(size=(h, h)).astype(np.float32)
    # audio tower
    t["thinker.audio_tower.conv1.weight"] = rng.normal(size=(dm, mel, 3)).astype(np.float32)
    t["thinker.audio_tower.conv1.bias"] = rng.normal(size=(dm,)).astype(np.float32)
    t["thinker.audio_tower.conv2.weight"] = rng.normal(size=(dm, dm, 3)).astype(np.float32)
    t["thinker.audio_tower.conv2.bias"] = rng.normal(size=(dm,)).astype(np.float32)
    t["thinker.audio_tower.audio_bos_eos_token.weight"] = rng.normal(size=(2, dm)).astype(np.float32)
    for i in range(nl):
        p = f"thinker.audio_tower.layers.{i}"
        t.update({
            f"{p}.self_attn.q_proj.weight": rng.normal(size=(dm, dm)).astype(np.float32),
            f"{p}.self_attn.k_proj.weight": rng.normal(size=(dm, dm)).astype(np.float32),
            f"{p}.self_attn.v_proj.weight": rng.normal(size=(dm, dm)).astype(np.float32),
            f"{p}.self_attn.out_proj.weight": rng.normal(size=(dm, dm)).astype(np.float32),
            f"{p}.self_attn_layer_norm.weight": rng.normal(size=(dm,)).astype(np.float32),
            f"{p}.final_layer_norm.weight": rng.normal(size=(dm,)).astype(np.float32),
            f"{p}.fc1.weight": rng.normal(size=(ff, dm)).astype(np.float32),
            f"{p}.fc2.weight": rng.normal(size=(dm, ff)).astype(np.float32),
        })
    t["thinker.audio_tower.ln_post.weight"] = rng.normal(size=(dm,)).astype(np.float32)
    t["thinker.audio_tower.proj.weight"] = rng.normal(size=(h, dm)).astype(np.float32)
    d = tmp_path / "omni"
    d.mkdir()
    _json.dump(cfg, open(d / "config.json", "w"))
    save_file(t, str(d / "model.safetensors"))
    out = mmproj.pack_mmproj(d, tmp_path / "omni-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "qwen2.5o"
    assert r.get("clip.has_vision_encoder") is True
    assert r.get("clip.has_audio_encoder") is True
    assert r.get("clip.audio.num_mel_bins") == mel
    assert r.get("clip.vision.n_wa_pattern") == 2
    for n in ("v.patch_embd.weight", "v.patch_embd.weight.1",
              "v.blk.0.attn_q.weight", "v.blk.1.ffn_gate.weight",
              "mm.0.weight", "a.conv1d.1.weight", "a.blk.1.ffn_up.weight",
              "a.post_ln.weight", "mm.a.fc.weight", "a.position_embd.weight"):
        assert n in r.tensors, n
    # generated sinusoid embedding: (1500, d_model), first row sin(0)=0/cos=1
    pe = r.tensor_float("a.position_embd.weight")
    assert pe.shape == (1500, dm)
    np.testing.assert_allclose(pe[0, :dm // 2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, dm // 2:], 1.0, atol=1e-7)
    # bos/eos token dropped
    assert not any("bos_eos" in n for n in r.tensors)


def test_internvl_mmproj(tmp_path):
    """InternViT tower (reference InternVisionModel :3505-3578): fused qkv
    split, ls1/ls2 layer scales, class/position embeddings reshaped, mlp1
    projector -> mm.model.mlp.{0,1,3}."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(55)
    h, ff, nh, th = 32, 48, 4, 24
    cfg = {"model_type": "internvl_chat", "downsample_ratio": 0.5,
           "llm_config": {"hidden_size": th},
           "text_config": {"hidden_size": th},
           "vision_config": {"hidden_size": h, "intermediate_size": ff,
                             "num_hidden_layers": 2, "num_attention_heads": nh,
                             "image_size": [56, 56], "patch_size": [14, 14],
                             "hidden_act": "gelu", "layer_norm_eps": 1e-6}}
    t = {
        "vision_model.embeddings.class_embedding":
            rng.normal(size=(1, 1, h)).astype(np.float32),
        "vision_model.embeddings.patch_embedding.weight":
            rng.normal(size=(h, 3, 14, 14)).astype(np.float32),
        "vision_model.embeddings.patch_embedding.bias":
            rng.normal(size=(h,)).astype(np.float32),
        "vision_model.embeddings.position_embedding":
            rng.normal(size=(1, 17, h)).astype(np.float32),
        "mlp1.0.weight": rng.normal(size=(4 * h,)).astype(np.float32),
        "mlp1.0.bias": rng.normal(size=(4 * h,)).astype(np.float32),
        "mlp1.1.weight": rng.normal(size=(th, 4 * h)).astype(np.float32),
        "mlp1.1.bias": rng.normal(size=(th,)).astype(np.float32),
        "mlp1.3.weight": rng.normal(size=(th, th)).astype(np.float32),
        "mlp1.3.bias": rng.normal(size=(th,)).astype(np.float32),
    }
    for i in range(2):
        p = f"vision_model.encoder.layers.{i}"
        t.update({
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * h, h)).astype(np.float32),
            f"{p}.attn.qkv.bias": rng.normal(size=(3 * h,)).astype(np.float32),
            f"{p}.attn.proj.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.attn.proj.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.norm1.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.norm2.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.ls1": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.ls2": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.mlp.fc1.weight": rng.normal(size=(ff, h)).astype(np.float32),
            f"{p}.mlp.fc1.bias": rng.normal(size=(ff,)).astype(np.float32),
            f"{p}.mlp.fc2.weight": rng.normal(size=(h, ff)).astype(np.float32),
            f"{p}.mlp.fc2.bias": rng.normal(size=(h,)).astype(np.float32),
        })
    d = tmp_path / "ivl"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    out = mmproj.pack_mmproj(d, tmp_path / "ivl-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "internvl"
    assert r.get("clip.use_gelu") is True
    assert r.get("clip.vision.image_size") == 56
    assert r.get("clip.vision.patch_size") == 14
    assert r.get("clip.vision.projector.scale_factor") == 2
    for n in ("v.class_embd", "v.patch_embd.weight", "v.position_embd.weight",
              "v.blk.0.attn_q.weight", "v.blk.0.attn_q.bias",
              "v.blk.1.attn_out.weight", "v.blk.0.ln1.weight",
              "v.blk.1.ls1.weight", "v.blk.0.ls2.weight",
              "v.blk.1.ffn_up.weight", "v.blk.0.ffn_down.bias",
              "mm.model.mlp.0.weight", "mm.model.mlp.1.weight",
              "mm.model.mlp.3.bias"):
        assert n in r.tensors, n
    # class/position embeddings reshaped, qkv second third is K
    assert r.tensor_float("v.class_embd").shape == (h,)
    assert r.tensor_float("v.position_embd.weight").shape == (17, h)
    np.testing.assert_allclose(
        r.tensor_float("v.blk.0.attn_k.weight"),
        t["vision_model.encoder.layers.0.attn.qkv.weight"][h:2 * h]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_llama4_mmproj(tmp_path):
    """Llama-4 vision tower (reference Llama4VisionModel :2475-2494):
    unfold-linear patch embed, positional_embedding_vlm, vision_adapter
    MLP, the numbered-but-single mm.model.fc projector."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(56)
    h, ff, th = 32, 48, 24
    cfg = {"model_type": "llama4",
           "text_config": {"hidden_size": th},
           "vision_config": {"hidden_size": h, "intermediate_size": ff,
                             "num_hidden_layers": 1, "num_attention_heads": 4,
                             "image_size": 56, "patch_size": 14,
                             "pixel_shuffle_ratio": 0.5, "norm_eps": 1e-5,
                             "hidden_act": "gelu"}}
    t = {
        "vision_model.class_embedding": rng.normal(size=(h,)).astype(np.float32),
        "vision_model.patch_embedding.linear.weight":
            rng.normal(size=(h, 3 * 14 * 14)).astype(np.float32),
        "vision_model.positional_embedding_vlm":
            rng.normal(size=(17, h)).astype(np.float32),
        "vision_model.layernorm_pre.weight": rng.normal(size=(h,)).astype(np.float32),
        "vision_model.layernorm_pre.bias": rng.normal(size=(h,)).astype(np.float32),
        "vision_model.layernorm_post.weight": rng.normal(size=(h,)).astype(np.float32),
        "vision_model.layernorm_post.bias": rng.normal(size=(h,)).astype(np.float32),
        "vision_model.vision_adapter.mlp.fc1.weight":
            rng.normal(size=(ff, h)).astype(np.float32),
        "vision_model.vision_adapter.mlp.fc2.weight":
            rng.normal(size=(h, ff)).astype(np.float32),
        "multi_modal_projector.linear_1.weight":
            rng.normal(size=(th, h)).astype(np.float32),
    }
    p = "vision_model.model.layers.0"
    for nm, shp in (("self_attn.q_proj", (h, h)), ("self_attn.k_proj", (h, h)),
                    ("self_attn.v_proj", (h, h)), ("self_attn.o_proj", (h, h)),
                    ("mlp.fc1", (ff, h)), ("mlp.fc2", (h, ff))):
        t[f"{p}.{nm}.weight"] = rng.normal(size=shp).astype(np.float32)
        t[f"{p}.{nm}.bias"] = rng.normal(size=(shp[0],)).astype(np.float32)
    for nm in ("input_layernorm", "post_attention_layernorm"):
        t[f"{p}.{nm}.weight"] = rng.normal(size=(h,)).astype(np.float32)
        t[f"{p}.{nm}.bias"] = rng.normal(size=(h,)).astype(np.float32)
    d = tmp_path / "l4"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    out = mmproj.pack_mmproj(d, tmp_path / "l4-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "llama4"
    assert r.get("clip.vision.projector.scale_factor") == 2
    assert r.get("clip.use_gelu") is True
    for n in ("v.class_embd", "v.patch_embd.weight", "v.position_embd.weight",
              "v.pre_ln.weight", "v.post_ln.bias",
              "v.blk.0.attn_q.weight", "v.blk.0.attn_out.bias",
              "v.blk.0.ln1.weight", "v.blk.0.ln2.bias",
              "v.blk.0.ffn_up.weight", "v.blk.0.ffn_down.weight",
              "mm.model.mlp.1.weight", "mm.model.mlp.2.weight",
              "mm.model.fc.weight"):
        assert n in r.tensors, n


def test_kimi_vl_mmproj(tmp_path):
    """Kimi-VL MoonViT tower (reference KimiVLModel :8678-8713): wqkv
    chunk, 2D pos_emb flattened, image_size pinned to 896."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(57)
    h, ff, th = 32, 48, 24
    cfg = {"model_type": "kimi_vl",
           "text_config": {"hidden_size": th},
           "vision_config": {"hidden_size": h, "intermediate_size": ff,
                             "num_hidden_layers": 1, "num_attention_heads": 4,
                             "patch_size": 14}}
    t = {
        "vision_tower.patch_embed.proj.weight":
            rng.normal(size=(h, 3, 14, 14)).astype(np.float32),
        "vision_tower.patch_embed.proj.bias": rng.normal(size=(h,)).astype(np.float32),
        "vision_tower.patch_embed.pos_emb.weight":
            rng.normal(size=(4, 4, h)).astype(np.float32),
        "vision_tower.encoder.final_layernorm.weight":
            rng.normal(size=(h,)).astype(np.float32),
        "vision_tower.encoder.final_layernorm.bias":
            rng.normal(size=(h,)).astype(np.float32),
        "multi_modal_projector.pre_norm.weight": rng.normal(size=(h,)).astype(np.float32),
        "multi_modal_projector.pre_norm.bias": rng.normal(size=(h,)).astype(np.float32),
        "multi_modal_projector.linear_1.weight":
            rng.normal(size=(th, 4 * h)).astype(np.float32),
        "multi_modal_projector.linear_1.bias": rng.normal(size=(th,)).astype(np.float32),
        "multi_modal_projector.linear_2.weight":
            rng.normal(size=(th, th)).astype(np.float32),
        "multi_modal_projector.linear_2.bias": rng.normal(size=(th,)).astype(np.float32),
    }
    p = "vision_tower.encoder.blocks.0"
    t.update({
        f"{p}.wqkv.weight": rng.normal(size=(3 * h, h)).astype(np.float32),
        f"{p}.wqkv.bias": rng.normal(size=(3 * h,)).astype(np.float32),
        f"{p}.wo.weight": rng.normal(size=(h, h)).astype(np.float32),
        f"{p}.wo.bias": rng.normal(size=(h,)).astype(np.float32),
        f"{p}.norm0.weight": rng.normal(size=(h,)).astype(np.float32),
        f"{p}.norm0.bias": rng.normal(size=(h,)).astype(np.float32),
        f"{p}.norm1.weight": rng.normal(size=(h,)).astype(np.float32),
        f"{p}.norm1.bias": rng.normal(size=(h,)).astype(np.float32),
        f"{p}.mlp.fc0.weight": rng.normal(size=(ff, h)).astype(np.float32),
        f"{p}.mlp.fc0.bias": rng.normal(size=(ff,)).astype(np.float32),
        f"{p}.mlp.fc1.weight": rng.normal(size=(h, ff)).astype(np.float32),
        f"{p}.mlp.fc1.bias": rng.normal(size=(h,)).astype(np.float32),
    })
    d = tmp_path / "kvl"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    out = mmproj.pack_mmproj(d, tmp_path / "kvl-mmproj.gguf")
    r = GGUFReader(out)
    assert r.get("clip.projector_type") == "kimivl"
    assert r.get("clip.vision.image_size") == 896
    assert r.get("clip.vision.projector.scale_factor") == 2
    for n in ("v.patch_embd.weight", "v.position_embd.weight",
              "v.post_ln.weight", "v.blk.0.attn_q.weight",
              "v.blk.0.attn_out.weight", "v.blk.0.ln1.weight",
              "v.blk.0.ln2.bias", "v.blk.0.ffn_up.weight",
              "v.blk.0.ffn_down.weight", "mm.input_norm.weight",
              "mm.1.weight", "mm.2.bias"):
        assert n in r.tensors, n
    assert r.tensor_float("v.position_embd.weight").shape == (16, h)
    np.testing.assert_allclose(
        r.tensor_float("v.blk.0.attn_v.weight"),
        t[f"{p}.wqkv.weight"][2 * h:].astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
