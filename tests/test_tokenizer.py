"""GGUF-native tokenizer (serving/tokenizer.py) vs HF `tokenizers` oracles.

llama.cpp's vocab engine tokenizes from tokenizer.ggml.* metadata alone;
these tests pack vocabs through export/packer's tokenizer_metadata and
check encode/decode round trips against the original fast tokenizer."""

import json

import pytest

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer


class _MetaReader:
    """Minimal reader shim over a metadata dict for from_gguf-style use."""

    def __init__(self, md):
        self.md = md

    def get(self, k, default=None):
        return self.md.get(k, default)


def _gguf_tok(md):
    from gptq_gguf_tpu.serving import tokenizer as gtok

    return gtok.from_gguf(_MetaReader(md))


def _bpe_oracle(tmp_path, texts):
    """Train a tiny byte-level BPE with HF tokenizers, pack its metadata."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(texts, trainer)
    tok.save(str(tmp_path / "tokenizer.json"))
    md = packer.tokenizer_metadata(tmp_path, "llama")
    return tok, md


def test_bpe_encode_matches_hf(tmp_path):
    texts = ["the quick brown fox jumps over the lazy dog",
             "hello world, hello tokenizer!",
             "numbers 123 456 and   spaces"]
    hf, md = _bpe_oracle(tmp_path, texts)
    g = _gguf_tok(md)
    assert g.model == "gpt2"
    for t in texts + ["unseen wordş ünïcode"]:
        assert g.encode(t) == hf.encode(t).ids, t


def test_bpe_decode_roundtrip(tmp_path):
    texts = ["pack my box with five dozen liquor jugs"]
    hf, md = _bpe_oracle(tmp_path, texts)
    g = _gguf_tok(md)
    for t in texts + ["héllo wörld"]:
        assert g.decode(g.encode(t)) == t


def test_spm_greedy_score_merges():
    """llm_tokenizer_spm semantics: adjacent merges by highest piece score,
    byte fallback for out-of-vocab characters."""
    tokens = ["<unk>", "<s>", "▁", "▁he", "he", "llo", "▁hello", "l", "o",
              "▁w", "or", "ld", "▁world", "<0x21>", "h", "e",
              "ll", "orld", "w", "d", "r"]
    scores = [0.0, 0.0, -10.0, -3.0, -4.0, -5.0, -1.0, -8.0, -8.0,
              -3.0, -4.0, -5.0, -1.5, 0.0, -9.0, -9.0,
              -6.0, -6.0, -9.0, -9.0, -9.0]
    types = [2, 3] + [1] * 11 + [6] + [1] * 7
    g = GGUFTokenizer("llama", tokens, scores=scores, token_types=types,
                      bos_id=1, add_bos=True)
    ids = g.encode("hello world!")
    # "▁hello" (-1.0) and "▁world" (-1.5) win; "!" falls back to <0x21>
    assert ids == [1, tokens.index("▁hello"), tokens.index("▁world"), 13]
    assert g.decode(ids) == " hello world!"


def test_ugm_viterbi_matches_hf_unigram(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    vocab = [("<unk>", 0.0), ("▁", -5.0), ("▁t", -2.5), ("t", -4.0),
             ("o", -4.0), ("▁to", -1.2), ("ken", -1.5), ("k", -4.0),
             ("e", -4.0), ("n", -4.0), ("▁token", -1.0), ("s", -3.0),
             ("iz", -2.0), ("er", -2.0), ("▁a", -1.5)]
    tok = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    tok.save(str(tmp_path / "tokenizer.json"))
    md = packer.tokenizer_metadata(tmp_path, "xlm-roberta")
    g = _gguf_tok(md)
    assert g.model == "t5"
    for t in ["a token", "tokenizer", "to tokens"]:
        assert g.encode(t) == tok.encode(t).ids, t


def test_wpm_greedy_longest_match(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, normalizers

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "the": 3, "quick": 4,
             "fox": 5, "##es": 6, "jump": 7, "##ing": 8, "un": 9,
             "##seen": 10}
    tok = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
    tok.normalizer = normalizers.Lowercase()
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    json_path = tmp_path / "tokenizer.json"
    tok.save(str(json_path))
    # mark [UNK] special so the GGUF carries a CONTROL/UNKNOWN type
    d = json.load(open(json_path))
    d["added_tokens"] = [{"id": 1, "content": "[UNK]", "special": True}]
    json.dump(d, open(json_path, "w"))
    md = packer.tokenizer_metadata(tmp_path, "bert")
    g = _gguf_tok(md)
    assert g.model == "bert"
    assert g.encode("the quick foxes jumping") == [3, 4, 5, 6, 7, 8]
    assert g.encode("THE Quick") == [3, 4]  # lowercased
    # whole-word OOV -> single unknown id (type UNKNOWN at [UNK])
    unk_ids = g.encode("zzz")
    assert len(unk_ids) == 1
    assert g.decode([3, 4, 5, 6]) == "the quick foxes"


def test_serve_prompt_cli(tmp_path):
    """serve --prompt end to end: tiny GGUF with a BPE vocab."""
    import numpy as np
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptq_gguf_tpu.__main__ import main

    hf_cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=260, hidden_size=64,
        intermediate_size=128, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        torch_dtype="float32")
    torch.manual_seed(22)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    d = tmp_path / "m"
    m.save_pretrained(d, safe_serialization=True)
    vocab = {f"<t{i}>": i for i in range(256)}
    vocab.update({"ab": 256, "cd": 257, "a": 258, "b": 259})
    json.dump({"model": {"type": "BPE", "vocab": vocab, "merges": ["a b"]},
               "added_tokens": []}, open(d / "tokenizer.json", "w"))
    gguf = tmp_path / "m.gguf"
    rc = main(["pack", "--model_dir", str(d), "--quant_dir",
               str(tmp_path / "none"), "--outfile", str(gguf)])
    assert not rc
    rc = main(["serve", "--gguf-file", str(gguf), "--prompt", "ab",
               "--max-new-tokens", "3"])
    assert not rc


def test_chat_template_pack_and_render(tmp_path):
    """tokenizer.chat_template rides the GGUF and renders via jinja2."""
    tmpl = ("{% for m in messages %}<|{{ m.role }}|>{{ m.content }}</s>"
            "{% endfor %}{% if add_generation_prompt %}<|assistant|>{% endif %}")
    json.dump({"model": {"type": "BPE", "vocab": {"a": 0, "b": 1},
                         "merges": []}}, open(tmp_path / "tokenizer.json", "w"))
    json.dump({"chat_template": tmpl, "bos_token_id": 0},
              open(tmp_path / "tokenizer_config.json", "w"))
    md = packer.tokenizer_metadata(tmp_path, "llama")
    assert md["tokenizer.chat_template"] == tmpl
    g = GGUFTokenizer("gpt2", ["a", "b"], merges=[], chat_template=tmpl)
    out = g.apply_chat_template(
        [{"role": "user", "content": "hi"},
         {"role": "assistant", "content": "yo"}])
    assert out == "<|user|>hi</s><|assistant|>yo</s><|assistant|>"
    out = g.apply_chat_template([{"role": "user", "content": "x"}],
                                add_generation_prompt=False)
    assert out == "<|user|>x</s>"


def test_chat_template_named_list(tmp_path):
    json.dump({"model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}},
              open(tmp_path / "tokenizer.json", "w"))
    json.dump({"chat_template": [
        {"name": "default", "template": "D{{ messages[0].content }}"},
        {"name": "tool_use", "template": "T"}]},
        open(tmp_path / "tokenizer_config.json", "w"))
    md = packer.tokenizer_metadata(tmp_path, "llama")
    assert md["tokenizer.chat_template"] == "D{{ messages[0].content }}"
    assert md["tokenizer.chat_template.tool_use"] == "T"
    assert md["tokenizer.chat_templates"] == ["tool_use"]
