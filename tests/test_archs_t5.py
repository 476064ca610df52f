"""T5 family pack support: t5 / umt5 / t5encoder (reference converter
entries: T5Model :6612, T5EncoderModel :6750)."""

import json

import numpy as np
import torch

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader


def _unigram_tokenizer(path):
    json.dump({"model": {"type": "Unigram",
                         "vocab": [[f"<t{i}>", -float(i)] for i in range(32)],
                         "unk_id": 2},
               "added_tokens": []}, open(path / "tokenizer.json", "w"))


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def test_t5_pack(tmp_path):
    """T5ForConditionalGeneration: enc/dec prefixes, cross-attention slots,
    relative bias on block 0, shared embeddings deduped."""
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = T5Config(vocab_size=32, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8, n_positions=128,
                   decoder_start_token_id=0, tie_word_embeddings=True)
    torch.manual_seed(10)
    m = T5ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "t5"
    m.save_pretrained(d, safe_serialization=True)
    _unigram_tokenizer(d)
    r = _pack(tmp_path, d, "t5")
    assert r.get("general.architecture") == "t5"
    assert r.get("t5.attention.relative_buckets_count") == 8
    assert r.get("t5.decoder_start_token_id") == 0
    assert r.get("t5.attention.key_length") == 8
    assert r.get("tokenizer.ggml.model") == "t5"
    sd = m.state_dict()
    for n in ("token_embd.weight", "enc.blk.0.attn_q.weight",
              "enc.blk.0.attn_rel_b.weight", "enc.blk.1.ffn_up.weight",
              "enc.blk.0.attn_norm.weight", "enc.blk.0.ffn_norm.weight",
              "enc.output_norm.weight", "dec.blk.0.attn_q.weight",
              "dec.blk.0.cross_attn_q.weight", "dec.blk.1.cross_attn_norm.weight",
              "dec.blk.0.attn_rel_b.weight", "dec.output_norm.weight"):
        assert n in r.tensors, n
    # only one shared embedding copy; no duplicate tensor crash
    emb = r.tensor_float("token_embd.weight")
    np.testing.assert_allclose(
        emb, sd["shared.weight"].numpy().astype(np.float16).astype(np.float32),
        rtol=1e-3, atol=1e-4)
    q = r.tensor_float("dec.blk.0.cross_attn_q.weight")
    np.testing.assert_allclose(
        q, sd["decoder.block.0.layer.1.EncDecAttention.q.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_umt5_pack(tmp_path):
    """UMT5: per-layer relative bias, gated DenseGatedActDense wi_0/wi_1."""
    from transformers import UMT5Config, UMT5ForConditionalGeneration

    cfg = UMT5Config(vocab_size=32, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                     num_decoder_layers=2, num_heads=4,
                     relative_attention_num_buckets=8,
                     is_gated_act=True, feed_forward_proj="gated-gelu",
                     tie_word_embeddings=False)
    torch.manual_seed(11)
    m = UMT5ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "umt5"
    m.save_pretrained(d, safe_serialization=True)
    _unigram_tokenizer(d)
    r = _pack(tmp_path, d, "umt5")
    assert r.get("general.architecture") == "t5"
    # per-layer relative bias (umt5) present on every block
    assert "enc.blk.0.attn_rel_b.weight" in r.tensors
    assert "enc.blk.1.attn_rel_b.weight" in r.tensors
    # gated act: wi_0 -> ffn_gate, wi_1 -> ffn_up
    assert "enc.blk.0.ffn_gate.weight" in r.tensors
    assert "enc.blk.0.ffn_up.weight" in r.tensors
    assert "output.weight" in r.tensors  # untied lm_head


def test_t5_encoder_pack(tmp_path):
    """T5EncoderModel packs as arch 't5encoder' without decoder keys."""
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(vocab_size=32, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   architectures=["T5EncoderModel"])
    torch.manual_seed(12)
    m = T5EncoderModel(cfg).eval().float()
    d = tmp_path / "t5enc"
    m.save_pretrained(d, safe_serialization=True)
    _unigram_tokenizer(d)
    r = _pack(tmp_path, d, "t5enc")
    assert r.get("general.architecture") == "t5encoder"
    assert r.get("t5encoder.decoder_start_token_id") is None
    assert "enc.blk.0.attn_q.weight" in r.tensors
    assert not any(n.startswith("dec.") for n in r.tensors)
