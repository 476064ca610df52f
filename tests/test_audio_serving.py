"""Audio-language serving (serving/audio.py): Whisper tower + splice.

Oracle: transformers Qwen2AudioForConditionalGeneration.
"""

import json

import numpy as np
import pytest
import torch

from gptq_gguf_tpu.serving import audio as jaudio

RNG = np.random.default_rng(97)

AUD_TOK = 61


@pytest.fixture(scope="module")
def tiny_qwen2a(tmp_path_factory):
    from transformers import (Qwen2AudioConfig,
                              Qwen2AudioForConditionalGeneration)

    cfg = Qwen2AudioConfig(
        text_config=dict(model_type="qwen2", vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rms_norm_eps=1e-6, max_position_embeddings=128),
        audio_config=dict(d_model=32, encoder_ffn_dim=48, encoder_layers=2,
                          encoder_attention_heads=4, num_mel_bins=16,
                          max_source_positions=20),
        audio_token_index=AUD_TOK)
    torch.manual_seed(31)
    m = Qwen2AudioForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("q2a") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def _mel():
    # expected mel length = max_source_positions * conv strides = 20 * 2
    return RNG.normal(size=(1, 16, 40)).astype(np.float32)


def test_audio_soft_tokens_match_hf(tiny_qwen2a):
    d, m = tiny_qwen2a
    ap, acfg = jaudio.load_hf_audio(d)
    mel = _mel()
    ours = np.asarray(jaudio.audio_soft_tokens(ap, acfg, mel))
    with torch.no_grad():
        enc = m.audio_tower(torch.from_numpy(mel)).last_hidden_state
        ref = m.multi_modal_projector(enc).numpy()
    assert ours.shape == ref.shape  # (1, T//4 = 10, 48)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)


def test_audio_generate_matches_hf(tiny_qwen2a):
    import tempfile

    from transformers import Qwen2ForCausalLM

    from gptq_gguf_tpu.models import loader

    d, m = tiny_qwen2a
    ap, acfg = jaudio.load_hf_audio(d)
    tm = Qwen2ForCausalLM(m.config.text_config).eval().float()
    # Qwen2Audio's language_model is a full ForCausalLM (incl. lm_head)
    tm.load_state_dict(m.language_model.state_dict())
    with tempfile.TemporaryDirectory() as td:
        tm.save_pretrained(td, safe_serialization=True)
        cfg = loader.load_config(td)
        params = loader.load_params(td, cfg)
    mel = _mel()
    n_soft = 10  # 40 mel frames -> conv2 stride 2 -> 20 -> pool 2 -> 10
    base = RNG.integers(0, 56, size=(6,)).tolist()
    ids = np.asarray(base[:2] + [AUD_TOK] * n_soft + base[2:], np.int64)
    with torch.no_grad():
        ref = m.generate(
            input_ids=torch.from_numpy(ids[None]),
            input_features=torch.from_numpy(mel),
            feature_attention_mask=torch.ones((1, 40), dtype=torch.long),
            max_new_tokens=5, do_sample=False).numpy()[0]
    got = jaudio.generate_with_audio(params, cfg, ap, acfg, ids, mel,
                                     AUD_TOK, max_new_tokens=5)
    assert got == ref[len(ids):].tolist()


def test_audio_mmproj_gguf_roundtrip(tiny_qwen2a):
    from gptq_gguf_tpu.export import mmproj

    d, m = tiny_qwen2a
    out = mmproj.pack_mmproj(d, d.parent / "q2a-mm.gguf")
    ap_h, ac_h = jaudio.load_hf_audio(d)
    ap_g, ac_g = jaudio.load_mmproj_audio_gguf(out)
    assert ac_g.d_model == ac_h.d_model
    assert ac_g.num_mel_bins == 16
    mel = _mel()
    a = np.asarray(jaudio.audio_soft_tokens(ap_h, ac_h, mel))
    b = np.asarray(jaudio.audio_soft_tokens(ap_g, ac_g, mel))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)  # f16 pack


def test_serve_audio_cli(tiny_qwen2a, tmp_path):
    """serve --mmproj --audio end-to-end (GGUF decoder + audio mmproj GGUF
    + precomputed mel .npy)."""
    import tempfile

    from transformers import Qwen2ForCausalLM

    from gptq_gguf_tpu.__main__ import main
    from gptq_gguf_tpu.export import mmproj, packer

    d, m = tiny_qwen2a
    tm = Qwen2ForCausalLM(m.config.text_config).eval().float()
    tm.load_state_dict(m.language_model.state_dict())
    td = tmp_path / "text"
    tm.save_pretrained(td, safe_serialization=True)
    gguf = tmp_path / "text.gguf"
    packer.pack_model(td, tmp_path / "none", gguf)
    mm = tmp_path / "mm.gguf"
    mmproj.pack_mmproj(d, mm)
    mel = tmp_path / "mel.npy"
    np.save(mel, _mel()[0])
    rc = main(["serve", "--gguf-file", str(gguf), "--mmproj", str(mm),
               "--audio", str(mel), "--audio-token-id", str(AUD_TOK),
               "--prompt-tokens", "1", "2", "3", "--max-new-tokens", "4"])
    assert not rc


@pytest.fixture(scope="module")
def tiny_voxtral(tmp_path_factory):
    from transformers import VoxtralConfig, VoxtralForConditionalGeneration

    cfg = VoxtralConfig(
        text_config=dict(model_type="llama", vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rms_norm_eps=1e-6, max_position_embeddings=128),
        audio_config=dict(num_mel_bins=16, num_hidden_layers=2,
                          num_attention_heads=4, hidden_size=32,
                          max_source_positions=20, intermediate_size=128),
        audio_token_id=61)
    torch.manual_seed(37)
    m = VoxtralForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("vox") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_voxtral_soft_tokens_match_hf(tiny_voxtral):
    d, m = tiny_voxtral
    ap, acfg = jaudio.load_hf_audio(d)
    assert acfg.projector == "voxtral"
    assert acfg.stack_factor == 4
    mel = _mel()
    ours = np.asarray(jaudio.audio_soft_tokens(ap, acfg, mel))
    with torch.no_grad():
        ref = m.get_audio_features(torch.from_numpy(mel)).numpy()
    assert ours.reshape(-1, 48).shape == ref.shape  # 20 frames / 4 = 5
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=3e-4)


def test_voxtral_generate_matches_hf(tiny_voxtral):
    import tempfile

    from transformers import LlamaForCausalLM

    from gptq_gguf_tpu.models import loader

    d, m = tiny_voxtral
    ap, acfg = jaudio.load_hf_audio(d)
    tm = LlamaForCausalLM(m.config.text_config).eval().float()
    tm.load_state_dict(m.language_model.state_dict())
    with tempfile.TemporaryDirectory() as td:
        tm.save_pretrained(td, safe_serialization=True)
        cfg = loader.load_config(td)
        params = loader.load_params(td, cfg)
    mel = _mel()
    n_soft = 5  # 40 mel -> conv stride 2 -> 20 -> stack 4 -> 5
    base = RNG.integers(0, 56, size=(6,)).tolist()
    ids = np.asarray(base[:2] + [61] * n_soft + base[2:], np.int64)
    with torch.no_grad():
        ref = m.generate(input_ids=torch.from_numpy(ids[None]),
                         input_features=torch.from_numpy(mel),
                         max_new_tokens=5, do_sample=False).numpy()[0]
    got = jaudio.generate_with_audio(params, cfg, ap, acfg, ids, mel,
                                     61, max_new_tokens=5)
    assert got == ref[len(ids):].tolist()


def test_voxtral_mmproj_gguf_roundtrip(tiny_voxtral):
    from gptq_gguf_tpu.export import mmproj

    d, m = tiny_voxtral
    out = mmproj.pack_mmproj(d, d.parent / "vox-mm.gguf")
    ap_h, ac_h = jaudio.load_hf_audio(d)
    ap_g, ac_g = jaudio.load_mmproj_audio_gguf(out)
    assert ac_g.projector == "voxtral" and ac_g.stack_factor == 4
    mel = _mel()
    a = np.asarray(jaudio.audio_soft_tokens(ap_h, ac_h, mel))
    b = np.asarray(jaudio.audio_soft_tokens(ap_g, ac_g, mel))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)
