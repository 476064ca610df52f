"""qwen2-vl image serving (serving/qwen_vl.py): ViT tower + mrope.

Oracle: transformers Qwen2VLForConditionalGeneration (tower outputs,
full-sequence logits through the mrope position streams, greedy
generation).
"""

import json

import numpy as np
import pytest
import torch

from gptq_gguf_tpu.serving import qwen_vl

RNG = np.random.default_rng(99)

IMG_TOK = 60
VSTART = 57


@pytest.fixture(scope="module")
def tiny_qwen2vl(tmp_path_factory):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rms_norm_eps=1e-6,
                         max_position_embeddings=128, rope_theta=10000.0,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 2, 2]}),
        vision_config=dict(embed_dim=32, hidden_size=48, depth=2,
                           num_heads=4, mlp_ratio=2, in_channels=3,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=IMG_TOK, vision_start_token_id=VSTART,
        vision_end_token_id=58)
    torch.manual_seed(41)
    m = Qwen2VLForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("q2vl") / "hf"
    m.save_pretrained(d, safe_serialization=True)

    # text-only sibling for the decoder loader (canonical llama names)
    from safetensors.numpy import save_file

    td = tmp_path_factory.mktemp("q2vl") / "text"
    td.mkdir()
    sd = {("model." + k): v.numpy()
          for k, v in m.model.language_model.state_dict().items()}
    sd["lm_head.weight"] = m.lm_head.weight.detach().numpy()
    save_file(sd, td / "model.safetensors")
    tc = m.config.text_config.to_dict()
    tc["model_type"] = "qwen2_vl"
    json.dump(tc, open(td / "config.json", "w"))
    return d, td, m


def _patches(gh=4, gw=4):
    return RNG.normal(size=(gh * gw, 3 * 2 * 14 * 14)).astype(np.float32)


def test_tower_matches_hf(tiny_qwen2vl):
    d, td, m = tiny_qwen2vl
    vp, vcfg = qwen_vl.load_hf_qwen_vision(d)
    assert vcfg.embed_dim == 32 and vcfg.intermediate_size == 64
    patches = _patches()
    ours = np.asarray(qwen_vl.encode_patches(vp, vcfg, patches, (4, 4)))
    with torch.no_grad():
        ref = m.model.visual(torch.from_numpy(patches),
                             grid_thw=torch.tensor([[1, 4, 4]])).numpy()
    assert ours.shape == ref.shape == (4, 48)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)


def test_positions_match_hf(tiny_qwen2vl):
    d, td, m = tiny_qwen2vl
    base = RNG.integers(0, 56, size=(7,)).tolist()
    ids = np.asarray(base[:3] + [VSTART] + [IMG_TOK] * 4 + [58] + base[3:],
                     np.int64)
    pos, nxt = qwen_vl.qwen2vl_positions(ids, IMG_TOK, [(2, 2)])
    ref_pos, ref_delta = m.model.get_rope_index(
        torch.from_numpy(ids[None]),
        image_grid_thw=torch.tensor([[1, 4, 4]]))
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert nxt == int(ref_pos.max()) + 1


def test_vlm_logits_and_generate_match_hf(tiny_qwen2vl):
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import model as qmodel

    d, td, m = tiny_qwen2vl
    vp, vcfg = qwen_vl.load_hf_qwen_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    base = RNG.integers(0, 56, size=(7,)).tolist()
    ids = np.asarray(base[:3] + [VSTART] + [IMG_TOK] * 4 + [58] + base[3:],
                     np.int64)
    patches = _patches()
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids[None]),
                pixel_values=torch.from_numpy(patches),
                image_grid_thw=torch.tensor([[1, 4, 4]])).logits.numpy()
    soft = np.asarray(qwen_vl.encode_patches(vp, vcfg, patches, (4, 4)))
    mask = ids == IMG_TOK
    over = np.zeros((1, len(ids), 48), np.float32)
    over[0, mask] = soft
    pos3, _ = qwen_vl.qwen2vl_positions(ids, IMG_TOK, [(2, 2)])
    cache = qmodel.init_cache(cfg, 1, len(ids) + 8, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(
        params, cfg, jnp.asarray(ids[None]), cache,
        embeds_override=jnp.asarray(over),
        override_mask=jnp.asarray(mask)[None, :],
        rope_positions=jnp.asarray(pos3[:, None, :]), all_logits=True)
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0],
                               rtol=2e-3, atol=2e-3)

    with torch.no_grad():
        gen = m.generate(input_ids=torch.from_numpy(ids[None]),
                         pixel_values=torch.from_numpy(patches),
                         image_grid_thw=torch.tensor([[1, 4, 4]]),
                         max_new_tokens=6, do_sample=False).numpy()[0]
    got = qwen_vl.generate_with_images(params, cfg, vp, vcfg, ids, patches,
                                       (4, 4), IMG_TOK, max_new_tokens=6)
    assert got == gen[len(ids):].tolist()


def test_mmproj_gguf_roundtrip(tiny_qwen2vl):
    from gptq_gguf_tpu.export import mmproj

    d, td, m = tiny_qwen2vl
    out = mmproj.pack_mmproj(d, d.parent / "q2vl-mm.gguf")
    vp_h, vc_h = qwen_vl.load_hf_qwen_vision(d)
    vp_g, vc_g = qwen_vl.load_mmproj_qwen_gguf(out)
    assert vc_g.embed_dim == vc_h.embed_dim
    patches = _patches()
    a = np.asarray(qwen_vl.encode_patches(vp_h, vc_h, patches, (4, 4)))
    b = np.asarray(qwen_vl.encode_patches(vp_g, vc_g, patches, (4, 4)))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)  # f16 pack


def test_serve_image_cli_qwen2vl(tiny_qwen2vl, tmp_path):
    """serve --mmproj --image dispatches to the qwen2-vl path (GGUF decoder
    + qwen2vl_merger mmproj + PNG through Qwen2VLImageProcessor)."""
    from PIL import Image

    from gptq_gguf_tpu.__main__ import main
    from gptq_gguf_tpu.export import mmproj, packer

    d, td, m = tiny_qwen2vl
    gguf = tmp_path / "text.gguf"
    packer.pack_model(td, tmp_path / "none", gguf)
    mm = tmp_path / "mm.gguf"
    mmproj.pack_mmproj(d, mm)
    img = tmp_path / "x.png"
    Image.fromarray(
        (RNG.random((56, 56, 3)) * 255).astype(np.uint8)).save(img)
    rc = main(["serve", "--gguf-file", str(gguf), "--mmproj", str(mm),
               "--image", str(img), "--image-token-id", str(IMG_TOK),
               "--prompt-tokens", "1", "2", "3", "--max-new-tokens", "4"])
    assert not rc


@pytest.fixture(scope="module")
def tiny_qwen25vl(tmp_path_factory):
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    cfg = Qwen2_5_VLConfig(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rms_norm_eps=1e-6,
                         max_position_embeddings=128, rope_theta=10000.0,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 2, 2]}),
        vision_config=dict(hidden_size=32, intermediate_size=48, depth=2,
                           num_heads=4, in_channels=3, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           window_size=56, fullatt_block_indexes=[1],
                           out_hidden_size=48, hidden_act="silu"),
        image_token_id=IMG_TOK, vision_start_token_id=VSTART,
        vision_end_token_id=58)
    torch.manual_seed(43)
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("q25vl") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_qwen25_tower_matches_hf(tiny_qwen25vl):
    """8x8 patch grid with window_size 56 -> 2x2-merged-token windows, four
    windows, full attention only at block 1."""
    d, m = tiny_qwen25vl
    vp, vcfg = qwen_vl.load_hf_qwen_vision(d)
    assert vcfg.v25 and vcfg.fullatt == (1,)
    assert vcfg.window_size == 56
    patches = _patches(8, 8)
    ours = np.asarray(qwen_vl.encode_patches(vp, vcfg, patches, (8, 8)))
    with torch.no_grad():
        ref = m.model.visual(torch.from_numpy(patches),
                             grid_thw=torch.tensor([[1, 8, 8]])).numpy()
    assert ours.shape == ref.shape == (16, 48)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)


def test_qwen25_generate_matches_hf(tiny_qwen25vl, tmp_path):
    from safetensors.numpy import save_file

    from gptq_gguf_tpu.models import loader

    d, m = tiny_qwen25vl
    vp, vcfg = qwen_vl.load_hf_qwen_vision(d)
    td = tmp_path / "text"
    td.mkdir()
    sd = {("model." + k): v.numpy()
          for k, v in m.model.language_model.state_dict().items()}
    sd["lm_head.weight"] = m.lm_head.weight.detach().numpy()
    save_file(sd, td / "model.safetensors")
    tc = m.config.text_config.to_dict()
    tc["model_type"] = "qwen2_5_vl"
    json.dump(tc, open(td / "config.json", "w"))
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    base = RNG.integers(0, 56, size=(6,)).tolist()
    ids = np.asarray(base[:2] + [VSTART] + [IMG_TOK] * 16 + [58] + base[2:],
                     np.int64)
    patches = _patches(8, 8)
    with torch.no_grad():
        gen = m.generate(input_ids=torch.from_numpy(ids[None]),
                         pixel_values=torch.from_numpy(patches),
                         image_grid_thw=torch.tensor([[1, 8, 8]]),
                         max_new_tokens=6, do_sample=False).numpy()[0]
    got = qwen_vl.generate_with_images(params, cfg, vp, vcfg, ids, patches,
                                       (8, 8), IMG_TOK, max_new_tokens=6)
    assert got == gen[len(ids):].tolist()


def test_qwen25_mmproj_gguf_roundtrip(tiny_qwen25vl):
    from gptq_gguf_tpu.export import mmproj

    d, m = tiny_qwen25vl
    out = mmproj.pack_mmproj(d, d.parent / "q25-mm.gguf")
    vp_h, vc_h = qwen_vl.load_hf_qwen_vision(d)
    vp_g, vc_g = qwen_vl.load_mmproj_qwen_gguf(out)
    assert vc_g.v25 and vc_g.fullatt == (1,)
    assert vc_g.window_size == 56
    patches = _patches(8, 8)
    a = np.asarray(qwen_vl.encode_patches(vp_h, vc_h, patches, (8, 8)))
    b = np.asarray(qwen_vl.encode_patches(vp_g, vc_g, patches, (8, 8)))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


def test_engine_mrope_request(tiny_qwen2vl):
    """A qwen2-vl image request through the continuous-batching engine
    (rope_positions + rope_delta) is token-identical to the standalone
    generate path, alongside a plain text request in the same batch."""
    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import engine as eng_mod

    d, td, m = tiny_qwen2vl
    vp, vcfg = qwen_vl.load_hf_qwen_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    base = RNG.integers(0, 56, size=(7,)).tolist()
    ids = np.asarray(base[:3] + [VSTART] + [IMG_TOK] * 4 + [58] + base[3:],
                     np.int64)
    patches = _patches()
    ref = qwen_vl.generate_with_images(params, cfg, vp, vcfg, ids, patches,
                                       (4, 4), IMG_TOK, max_new_tokens=6)
    text_prompt = np.asarray(base, np.int64)
    text_ref = eng_mod.generate(params, cfg, [text_prompt],
                                max_new_tokens=6)[0]

    soft = np.asarray(qwen_vl.encode_patches(vp, vcfg, patches, (4, 4)))
    pos3, nxt = qwen_vl.qwen2vl_positions(ids, IMG_TOK, [(2, 2)])
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2,
                                           max_len=64)
    u_img = eng.submit(ids, 6, soft_embeds=soft, soft_token_id=IMG_TOK,
                       rope_positions=pos3, rope_next=nxt)
    u_txt = eng.submit(text_prompt, 6)
    done = {r.uid: r for r in eng.run_until_done()}
    assert done[u_img].output == ref
    assert done[u_txt].output == text_ref
