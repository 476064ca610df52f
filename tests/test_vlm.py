"""VLM serving (serving/vlm.py): SigLIP tower + gemma3 soft-token splice.

Oracle: transformers Gemma3ForConditionalGeneration (no token_type_ids,
i.e. fully causal masking — the mode this module implements).
"""

import json

import numpy as np
import pytest
import torch

from gptq_gguf_tpu.serving import vlm

RNG = np.random.default_rng(95)

IMG_TOK = 60  # image_token_index in the tiny config


@pytest.fixture(scope="module")
def tiny_vlm(tmp_path_factory):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=1, head_dim=12,
                         hidden_activation="gelu_pytorch_tanh",
                         sliding_window=8, rope_theta=1000000.0,
                         rope_local_base_freq=10000.0,
                         max_position_embeddings=128),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3),
        mm_tokens_per_image=4, image_token_index=IMG_TOK,
        boi_token_index=58, eoi_token_index=59)
    torch.manual_seed(21)
    m = Gemma3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("vlm") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    json.dump({"image_mean": [0.5] * 3, "image_std": [0.5] * 3,
               "image_seq_length": 4},
              open(d / "preprocessor_config.json", "w"))

    # text-only sibling checkpoint for the decoder loader
    from transformers import Gemma3ForCausalLM

    tm = Gemma3ForCausalLM(cfg.text_config).eval().float()
    tm.model.load_state_dict(m.model.language_model.state_dict())
    tm.lm_head.load_state_dict(m.lm_head.state_dict())
    td = tmp_path_factory.mktemp("vlm") / "text"
    tm.save_pretrained(td, safe_serialization=True)
    return d, td, m


def _prompt(n_img_tokens=4):
    ids = RNG.integers(0, 56, size=(10,)).tolist()
    return np.asarray(ids[:3] + [58] + [IMG_TOK] * n_img_tokens + [59]
                      + ids[3:], np.int64)


def test_soft_tokens_match_hf(tiny_vlm):
    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    assert vcfg.mm_tokens_per_image == 4
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ours = np.asarray(vlm.image_soft_tokens(vp, vcfg, pixels))
    with torch.no_grad():
        ref = m.get_image_features(torch.from_numpy(pixels)).numpy()
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               rtol=2e-3, atol=2e-4)


def test_vlm_logits_match_hf(tiny_vlm):
    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import model as qmodel

    import jax.numpy as jnp

    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    ids = _prompt()
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids[None]),
                pixel_values=torch.from_numpy(pixels)).logits.numpy()
    soft = vlm.image_soft_tokens(vp, vcfg, jnp.asarray(pixels))
    soft = np.asarray(soft).reshape(-1, cfg.hidden_size)
    mask = ids == IMG_TOK
    over = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
    over[0, mask] = soft
    cache = qmodel.init_cache(cfg, 1, len(ids) + 4, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(
        params, cfg, jnp.asarray(ids[None]), cache,
        embeds_override=jnp.asarray(over),
        override_mask=jnp.asarray(mask)[None, :], all_logits=True)
    got = np.asarray(logits)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-3, atol=2e-3)


def test_vlm_generate_matches_hf(tiny_vlm):
    from gptq_gguf_tpu.models import loader

    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    ids = _prompt()
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ttids = (ids == IMG_TOK).astype(np.int64)
    with torch.no_grad():
        ref = m.generate(input_ids=torch.from_numpy(ids[None]),
                         pixel_values=torch.from_numpy(pixels),
                         token_type_ids=torch.from_numpy(ttids[None]),
                         max_new_tokens=6, do_sample=False).numpy()[0]
    got = vlm.generate_with_images(params, cfg, vp, vcfg, ids, pixels,
                                   IMG_TOK, max_new_tokens=6)
    assert got == ref[len(ids):].tolist()


def test_mmproj_gguf_roundtrip(tiny_vlm):
    from gptq_gguf_tpu.export import mmproj

    d, td, m = tiny_vlm
    out = mmproj.pack_mmproj(d, d.parent / "mm.gguf")
    vp_h, vc_h = vlm.load_hf_vision(d)
    vp_g, vc_g = vlm.load_mmproj_gguf(out)
    assert vc_g.mm_tokens_per_image == vc_h.mm_tokens_per_image == 4
    assert vc_g.image_size == 56 and vc_g.patch_size == 14
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    a = np.asarray(vlm.image_soft_tokens(vp_h, vc_h, pixels))
    b = np.asarray(vlm.image_soft_tokens(vp_g, vc_g, pixels))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)  # f16 pack


def test_serve_image_cli(tiny_vlm, tmp_path):
    """serve --mmproj --image end-to-end through the CLI (GGUF decoder +
    mmproj GGUF + a PNG), matching the in-process generate path."""
    from PIL import Image

    from gptq_gguf_tpu.__main__ import main
    from gptq_gguf_tpu.export import mmproj, packer

    d, td, m = tiny_vlm
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
def tiny_idefics(tmp_path_factory):
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration

    cfg = Idefics3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rms_norm_eps=1e-6,
                         max_position_embeddings=128, rope_theta=10000.0),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3),
        scale_factor=2, image_token_id=61)
    torch.manual_seed(23)
    m = Idefics3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("idef") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_idefics3_soft_tokens_match_hf(tiny_idefics):
    d, m = tiny_idefics
    vp, vcfg = vlm.load_hf_vision(d)
    assert vcfg.projector == "idefics3"
    assert vcfg.mm_tokens_per_image == 4  # (56/14/2)^2
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ours = np.asarray(vlm.image_soft_tokens(vp, vcfg, pixels))
    with torch.no_grad():
        vis = m.model.vision_model(
            torch.from_numpy(pixels)).last_hidden_state
        ref = m.model.connector(vis).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_idefics3_generate_matches_hf(tiny_idefics):
    from gptq_gguf_tpu.models import loader

    d, m = tiny_idefics
    vp, vcfg = vlm.load_hf_vision(d)
    # text-only sibling (idefics3's decoder is a plain llama)
    import tempfile

    from transformers import LlamaConfig as HFLlamaCfg, LlamaForCausalLM

    tm = LlamaForCausalLM(m.config.text_config).eval().float()
    tm.model.load_state_dict(m.model.text_model.state_dict())
    tm.lm_head.load_state_dict(m.lm_head.state_dict())
    with tempfile.TemporaryDirectory() as td:
        tm.save_pretrained(td, safe_serialization=True)
        cfg = loader.load_config(td)
        params = loader.load_params(td, cfg)
    img_tok = 61
    base = RNG.integers(0, 56, size=(8,)).tolist()
    ids = np.asarray(base[:2] + [img_tok] * 4 + base[2:], np.int64)
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = m.generate(input_ids=torch.from_numpy(ids[None]),
                         pixel_values=torch.from_numpy(pixels[None]),
                         max_new_tokens=5, do_sample=False).numpy()[0]
    got = vlm.generate_with_images(params, cfg, vp, vcfg, ids, pixels,
                                   img_tok, max_new_tokens=5)
    assert got == ref[len(ids):].tolist()


def test_idefics3_mmproj_gguf_roundtrip(tiny_idefics):
    from gptq_gguf_tpu.export import mmproj

    d, m = tiny_idefics
    out = mmproj.pack_mmproj(d, d.parent / "idef-mm.gguf")
    vp_h, vc_h = vlm.load_hf_vision(d)
    vp_g, vc_g = vlm.load_mmproj_gguf(out)
    assert vc_g.projector == "idefics3"
    assert vc_g.scale_factor == 2
    assert vc_g.mm_tokens_per_image == 4
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    a = np.asarray(vlm.image_soft_tokens(vp_h, vc_h, pixels))
    b = np.asarray(vlm.image_soft_tokens(vp_g, vc_g, pixels))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


@pytest.fixture(scope="module")
def tiny_mistral3(tmp_path_factory):
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration

    cfg = Mistral3Config(
        text_config=dict(model_type="mistral", vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rms_norm_eps=1e-6, max_position_embeddings=128,
                         rope_theta=10000.0),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3,
                           rope_theta=10000.0, head_dim=8),
        spatial_merge_size=2, image_token_index=62,
        multimodal_projector_bias=False)
    torch.manual_seed(29)
    m = Mistral3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("m3") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_mistral3_soft_tokens_match_hf(tiny_mistral3):
    d, m = tiny_mistral3
    vp, vcfg = vlm.load_hf_vision(d)
    assert vcfg.projector == "mistral3"
    assert vcfg.mm_tokens_per_image == 4
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ours = np.asarray(vlm.image_soft_tokens(vp, vcfg, pixels))
    with torch.no_grad():
        vis = m.model.vision_tower(torch.from_numpy(pixels)).last_hidden_state
        ref = m.model.multi_modal_projector(
            vis.squeeze(0), torch.tensor([[56, 56]])).numpy()
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=3e-4)


def test_mistral3_generate_matches_hf(tiny_mistral3):
    import tempfile

    from transformers import MistralForCausalLM

    from gptq_gguf_tpu.models import loader

    d, m = tiny_mistral3
    vp, vcfg = vlm.load_hf_vision(d)
    tm = MistralForCausalLM(m.config.text_config).eval().float()
    tm.model.load_state_dict(m.model.language_model.state_dict())
    tm.lm_head.load_state_dict(m.lm_head.state_dict())
    with tempfile.TemporaryDirectory() as td:
        tm.save_pretrained(td, safe_serialization=True)
        cfg = loader.load_config(td)
        params = loader.load_params(td, cfg)
    img_tok = 62
    base = RNG.integers(0, 56, size=(8,)).tolist()
    ids = np.asarray(base[:2] + [img_tok] * 4 + base[2:], np.int64)
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = m.generate(input_ids=torch.from_numpy(ids[None]),
                         pixel_values=torch.from_numpy(pixels),
                         image_sizes=torch.tensor([[56, 56]]),
                         max_new_tokens=5, do_sample=False).numpy()[0]
    got = vlm.generate_with_images(params, cfg, vp, vcfg, ids, pixels,
                                   img_tok, max_new_tokens=5)
    assert got == ref[len(ids):].tolist()


def test_mistral3_mmproj_gguf_roundtrip(tiny_mistral3):
    from gptq_gguf_tpu.export import mmproj

    d, m = tiny_mistral3
    out = mmproj.pack_mmproj(d, d.parent / "m3-mm.gguf")
    vp_h, vc_h = vlm.load_hf_vision(d)
    vp_g, vc_g = vlm.load_mmproj_gguf(out)
    assert vc_g.projector == "mistral3"
    assert vc_g.scale_factor == 2
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    a = np.asarray(vlm.image_soft_tokens(vp_h, vc_h, pixels))
    b = np.asarray(vlm.image_soft_tokens(vp_g, vc_g, pixels))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


def test_vlm_http_chat(tiny_vlm, tmp_path):
    """VLM over HTTP: chat messages with a data-URI image splice the soft
    tokens through the continuous-batching engine (token parity with the
    in-process path)."""
    import base64
    import io
    import urllib.request

    import jax.numpy as jnp
    from PIL import Image

    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import engine as eng_mod
    from gptq_gguf_tpu.serving import server as server_mod
    from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer

    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)

    alphabet = [chr(ord("A") + i) for i in range(64)]
    tmpl = "{% for m in messages %}{{ m.content }}{% endfor %}"
    gg = GGUFTokenizer("gpt2", alphabet, merges=[], chat_template=tmpl)

    class _Wrap:
        def __call__(self, text):
            return {"input_ids": gg.encode(text)}

        def decode(self, ids):
            return gg.decode(ids)

        apply_chat_template = staticmethod(gg.apply_chat_template)

    img_file = io.BytesIO()
    Image.fromarray((RNG.random((56, 56, 3)) * 255).astype(np.uint8)).save(
        img_file, format="PNG")
    blob = img_file.getvalue()

    def imager(blobs):
        pix = []
        for b in blobs:
            im = Image.open(io.BytesIO(b)).convert("RGB").resize(
                (56, 56), Image.BILINEAR)
            x = (np.asarray(im, np.float32) / 255.0 - 0.5) / 0.5
            pix.append(x.transpose(2, 0, 1))
        soft = vlm.image_soft_tokens(vp, vcfg, jnp.asarray(np.stack(pix)))
        return np.asarray(soft).reshape(-1, soft.shape[-1]), IMG_TOK

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2,
                                           max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, tokenizer=_Wrap(),
                                           block=False, imager=imager)
    try:
        addr = server.server_address
        payload = {"messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "data:image/png;base64,"
                           + base64.b64encode(blob).decode()}},
            {"type": "text", "text": "BCD"},
        ]}], "max_tokens": 5}
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/v1/chat/completions",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        # reference: the in-process path on the same pixels + prompt
        soft, _ = imager([blob])
        ids = np.concatenate([np.full((4,), IMG_TOK, np.int64),
                              np.asarray(gg.encode("BCD"), np.int64)])
        pix = ((np.asarray(Image.open(io.BytesIO(blob)).convert("RGB")
                           .resize((56, 56), Image.BILINEAR), np.float32)
                / 255.0 - 0.5) / 0.5).transpose(2, 0, 1)[None]
        ref = vlm.generate_with_images(params, cfg, vp, vcfg, ids, pix,
                                       IMG_TOK, max_new_tokens=5)
        assert out["choices"][0]["message"]["content"] == gg.decode(ref)
    finally:
        server.shutdown()
        runner.stop()


def test_vlm_bidirectional_image_attention(tiny_vlm):
    """Image spans attend bidirectionally (gemma3 token_type_ids mode):
    full-sequence logits match HF WITH token_type_ids, and the mask
    genuinely differs from causal at image positions."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import model as qmodel
    from gptq_gguf_tpu.serving.vlm import _image_spans

    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    ids = _prompt()
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ttids = (ids == IMG_TOK).astype(np.int64)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids[None]),
                pixel_values=torch.from_numpy(pixels),
                token_type_ids=torch.from_numpy(ttids[None])).logits.numpy()
    soft = np.asarray(vlm.image_soft_tokens(vp, vcfg, jnp.asarray(pixels)))
    mask = ids == IMG_TOK
    over = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
    over[0, mask] = soft.reshape(-1, cfg.hidden_size)
    spans = jnp.asarray(_image_spans(mask))[None, :]
    cache = qmodel.init_cache(cfg, 1, len(ids) + 4, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(
        params, cfg, jnp.asarray(ids[None]), cache,
        embeds_override=jnp.asarray(over),
        override_mask=jnp.asarray(mask)[None, :],
        bidir_spans=spans, all_logits=True)
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0],
                               rtol=2e-3, atol=2e-3)
    # the bidirectional mask matters: logits at the FIRST image position
    # must differ from the causal run (it now sees the later image tokens)
    cache2 = qmodel.init_cache(cfg, 1, len(ids) + 4, dtype=jnp.float32)
    causal, _ = qmodel.forward_cached(
        params, cfg, jnp.asarray(ids[None]), cache2,
        embeds_override=jnp.asarray(over),
        override_mask=jnp.asarray(mask)[None, :], all_logits=True)
    first_img = int(np.argmax(mask))
    assert not np.allclose(np.asarray(logits)[0, first_img],
                           np.asarray(causal)[0, first_img], atol=1e-4)


def test_engine_bidir_soft_request(tiny_vlm):
    """A gemma3 image request through the batched engine with
    soft_bidir=True matches the standalone bidirectional generate path."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.serving import engine as eng_mod

    d, td, m = tiny_vlm
    vp, vcfg = vlm.load_hf_vision(d)
    cfg = loader.load_config(td)
    params = loader.load_params(td, cfg)
    ids = _prompt()
    pixels = RNG.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ref = vlm.generate_with_images(params, cfg, vp, vcfg, ids, pixels,
                                   IMG_TOK, max_new_tokens=6)
    soft = np.asarray(vlm.image_soft_tokens(vp, vcfg, jnp.asarray(pixels)))
    soft = soft.reshape(-1, cfg.hidden_size)
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2,
                                           max_len=64)
    uid = eng.submit(ids, 6, soft_embeds=soft, soft_token_id=IMG_TOK,
                     soft_bidir=True)
    done = {r.uid: r for r in eng.run_until_done()}
    assert done[uid].output == ref
