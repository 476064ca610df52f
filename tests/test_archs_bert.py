"""BERT-family encoder pack support: bert / roberta / xlm-roberta /
distilbert (reference converter entries: BertModel :4517, RobertaModel
:4758, XLMRobertaModel :4911, DistilBertModel :4738)."""

import json
from pathlib import Path

import numpy as np
import torch

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader

RNG = np.random.default_rng(48)


def _wordpiece_tokenizer(path: Path, vocab):
    json.dump({
        "model": {"type": "WordPiece",
                  "vocab": {t: i for i, t in enumerate(vocab)}},
        "added_tokens": [
            {"id": 0, "content": "[PAD]", "special": True},
            {"id": 1, "content": "[CLS]", "special": True},
        ],
    }, open(path / "tokenizer.json", "w"))


def _pack(tmp_path, d, name):
    out = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", out)
    return GGUFReader(out)


def _make(tmp_path, cfg, cls, sub):
    m = cls(cfg).eval().float()
    d = tmp_path / sub
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_bert_pack(tmp_path):
    """BertModel: non-causal flag, token types, pooling from the
    sentence-transformers sidecar, WordPiece phantom-space vocab."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=48,
                     max_position_embeddings=64, type_vocab_size=2,
                     layer_norm_eps=1e-12)
    torch.manual_seed(5)
    d, m = _make(tmp_path, cfg, BertModel, "bert")
    vocab = ["[PAD]", "[CLS]", "[SEP]", "the", "##ing"] + [
        f"w{i}" for i in range(27)]
    _wordpiece_tokenizer(d, vocab)
    (d / "1_Pooling").mkdir()
    json.dump({"pooling_mode_mean_tokens": True, "pooling_mode_cls_token": False},
              open(d / "1_Pooling" / "config.json", "w"))
    r = _pack(tmp_path, d, "bert")
    assert r.get("general.architecture") == "bert"
    assert r.get("bert.attention.causal") is False
    assert r.get("bert.pooling_type") == 1  # MEAN
    assert r.get("tokenizer.ggml.token_type_count") == 2
    assert r.get("tokenizer.ggml.model") == "bert"
    toks = r.get("tokenizer.ggml.tokens")
    assert toks[0] == "[PAD]" and toks[3] == "▁the" and toks[4] == "ing"
    sd = m.state_dict()
    for name in ("token_embd.weight", "token_types.weight",
                 "position_embd.weight", "token_embd_norm.weight",
                 "blk.0.attn_q.weight", "blk.0.attn_q.bias",
                 "blk.1.attn_output_norm.weight", "blk.1.layer_output_norm.bias",
                 "blk.0.ffn_up.weight", "blk.0.ffn_down.weight"):
        assert name in r.tensors, name
    # pooler dropped
    assert not any("pooler" in n for n in r.tensors)
    np.testing.assert_allclose(
        r.tensor_float("blk.0.ffn_up.weight"),
        sd["encoder.layer.0.intermediate.dense.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_bert_classifier_pack(tmp_path):
    """BertForSequenceClassification: bert.-prefixed weights, classifier ->
    cls.output, label list in metadata."""
    from transformers import BertConfig, BertForSequenceClassification

    cfg = BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=48,
                     max_position_embeddings=64,
                     id2label={0: "NEG", 1: "POS"},
                     label2id={"NEG": 0, "POS": 1})
    torch.manual_seed(6)
    d, m = _make(tmp_path, cfg, BertForSequenceClassification, "bertcls")
    _wordpiece_tokenizer(d, [f"w{i}" for i in range(32)])
    r = _pack(tmp_path, d, "bertcls")
    assert r.get("bert.classifier.output_labels") == ["NEG", "POS"]
    assert "cls.output.weight" in r.tensors
    assert "cls.output.bias" in r.tensors
    assert "token_embd.weight" in r.tensors  # bert. prefix stripped


def test_roberta_pack(tmp_path):
    """RobertaModel: BPE vocab, position matrix chopped by pad_token_id+1,
    context shortened by the same offset."""
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=48,
                        max_position_embeddings=66, pad_token_id=1,
                        type_vocab_size=1)
    torch.manual_seed(7)
    d, m = _make(tmp_path, cfg, RobertaModel, "roberta")
    json.dump({"model": {"type": "BPE",
                         "vocab": {f"<t{i}>": i for i in range(32)},
                         "merges": []},
               "added_tokens": []}, open(d / "tokenizer.json", "w"))
    r = _pack(tmp_path, d, "roberta")
    assert r.get("general.architecture") == "bert"
    assert r.get("bert.context_length") == 64  # 66 - (1 + pad 1)
    pos = r.tensor_float("position_embd.weight")
    assert pos.shape == (64, 32)
    sd = m.state_dict()
    np.testing.assert_allclose(
        pos, sd["embeddings.position_embeddings.weight"].numpy()[2:]
        .astype(np.float32), rtol=1e-6, atol=0)
    assert r.get("tokenizer.ggml.model") == "gpt2"
    assert r.get("tokenizer.ggml.token_type_count") == 1


def test_xlm_roberta_pack(tmp_path):
    """XLMRobertaModel: Unigram fast-tokenizer vocab + the roberta offset."""
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=4, intermediate_size=48,
                           max_position_embeddings=34, pad_token_id=1)
    torch.manual_seed(8)
    d, m = _make(tmp_path, cfg, XLMRobertaModel, "xlmr")
    json.dump({"model": {"type": "Unigram",
                         "vocab": [[f"<t{i}>", -float(i)] for i in range(32)],
                         "unk_id": 0},
               "added_tokens": []}, open(d / "tokenizer.json", "w"))
    r = _pack(tmp_path, d, "xlmr")
    assert r.get("general.architecture") == "bert"
    assert r.get("bert.context_length") == 32
    assert r.get("tokenizer.ggml.model") == "t5"  # unigram branch


def test_distilbert_pack(tmp_path):
    """DistilBertModel: flat q_lin/out_lin naming, dim/n_heads aliases,
    hardcoded 1e-12 eps, no token types."""
    from transformers import DistilBertConfig, DistilBertModel

    cfg = DistilBertConfig(vocab_size=32, dim=32, n_layers=2, n_heads=4,
                           hidden_dim=48, max_position_embeddings=64)
    torch.manual_seed(9)
    d, m = _make(tmp_path, cfg, DistilBertModel, "distil")
    _wordpiece_tokenizer(d, [f"w{i}" for i in range(32)])
    r = _pack(tmp_path, d, "distil")
    assert r.get("general.architecture") == "bert"
    assert r.get("bert.embedding_length") == 32
    assert r.get("bert.block_count") == 2
    assert r.get("bert.feed_forward_length") == 48
    assert abs(r.get("bert.attention.layer_norm_epsilon") - 1e-12) < 1e-18
    sd = m.state_dict()
    for name in ("blk.0.attn_q.weight", "blk.1.attn_output_norm.weight",
                 "blk.0.ffn_up.weight", "blk.0.layer_output_norm.weight"):
        assert name in r.tensors, name
    np.testing.assert_allclose(
        r.tensor_float("blk.0.attn_output.weight"),
        sd["transformer.layer.0.attention.out_lin.weight"].numpy()
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_neobert_pack(tmp_path):
    """NeoBERT (reference NeoBert :4882-4908): fused qkv + SwiGLU w12/w3,
    RMS norms, ffn length 2/3 of intermediate, CLS pooling, class-name
    dispatch (model_type is 'neobert' but architectures drives it too)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(60)
    h, ff, v = 32, 48, 32
    cfg = {"model_type": "neobert", "architectures": ["NeoBERTLMHead"],
           "vocab_size": v, "hidden_size": h, "num_hidden_layers": 1,
           "num_attention_heads": 4, "intermediate_size": ff,
           "norm_eps": 1e-6, "max_length": 4096}
    t = {
        "model.encoder.weight": rng.normal(size=(v, h)).astype(np.float32),
        "model.transformer_encoder.0.attention_norm.weight":
            rng.normal(size=(h,)).astype(np.float32),
        "model.transformer_encoder.0.qkv.weight":
            rng.normal(size=(3 * h, h)).astype(np.float32),
        "model.transformer_encoder.0.wo.weight":
            rng.normal(size=(h, h)).astype(np.float32),
        "model.transformer_encoder.0.ffn_norm.weight":
            rng.normal(size=(h,)).astype(np.float32),
        "model.transformer_encoder.0.ffn.w12.weight":
            rng.normal(size=(2 * ff, h)).astype(np.float32),
        "model.transformer_encoder.0.ffn.w3.weight":
            rng.normal(size=(h, ff)).astype(np.float32),
        "model.layer_norm.weight": rng.normal(size=(h,)).astype(np.float32),
        "decoder.weight": rng.normal(size=(v, h)).astype(np.float32),
        "decoder.bias": rng.normal(size=(v,)).astype(np.float32),
    }
    d = tmp_path / "neo"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    _wordpiece_tokenizer(d, [f"w{i}" for i in range(v)])
    r = _pack(tmp_path, d, "neo")
    assert r.get("general.architecture") == "neo-bert"
    assert r.get("neo-bert.feed_forward_length") == 32  # 2/3 * 48
    assert r.get("neo-bert.rope.freq_base") == 10000.0
    assert abs(r.get("neo-bert.attention.layer_norm_rms_epsilon") - 1e-6) < 1e-12
    assert r.get("neo-bert.pooling_type") == 2  # CLS
    assert r.get("neo-bert.context_length") == 4096
    assert r.get("neo-bert.attention.causal") is False
    for name in ("token_embd.weight", "blk.0.attn_norm.weight",
                 "blk.0.attn_qkv.weight", "blk.0.attn_output.weight",
                 "blk.0.ffn_norm.weight", "blk.0.ffn_up.weight",
                 "blk.0.ffn_down.weight", "enc.output_norm.weight"):
        assert name in r.tensors, name
    # decoder LM head dropped
    assert not any("decoder" in n or n == "output.weight" for n in r.tensors)
    np.testing.assert_allclose(
        r.tensor_float("blk.0.ffn_up.weight"),
        t["model.transformer_encoder.0.ffn.w12.weight"]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_jina_bert_v2_pack(tmp_path):
    """jina-embeddings-v2 (reference JinaBertV2Model :6036-6052): ALiBi
    BERT whose fused mlp.gated_layers splits gate|up at intermediate_size;
    model_type is plain 'bert' — dispatch rides architectures[0]."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(61)
    h, ff, v = 32, 48, 32
    cfg = {"model_type": "bert", "architectures": ["JinaBertForMaskedLM"],
           "vocab_size": v, "hidden_size": h, "num_hidden_layers": 2,
           "num_attention_heads": 4, "intermediate_size": ff,
           "layer_norm_eps": 1e-12, "type_vocab_size": 2,
           "max_position_embeddings": 8192, "feed_forward_type": "geglu"}
    t = {
        "embeddings.word_embeddings.weight":
            rng.normal(size=(v, h)).astype(np.float32),
        "embeddings.token_type_embeddings.weight":
            rng.normal(size=(2, h)).astype(np.float32),
        "embeddings.LayerNorm.weight": rng.normal(size=(h,)).astype(np.float32),
        "embeddings.LayerNorm.bias": rng.normal(size=(h,)).astype(np.float32),
    }
    for i in range(2):
        p = f"encoder.layer.{i}"
        gated = "mlp.gated_layers" if i == 0 else "mlp.up_gated_layer"
        t.update({
            f"{p}.attention.self.query.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.attention.self.query.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.attention.self.key.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.attention.self.key.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.attention.self.value.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.attention.self.value.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.attention.output.dense.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"{p}.attention.output.dense.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.attention.output.LayerNorm.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.attention.output.LayerNorm.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.{gated}.weight": rng.normal(size=(2 * ff, h)).astype(np.float32),
            f"{p}.mlp.wo.weight": rng.normal(size=(h, ff)).astype(np.float32),
            f"{p}.mlp.wo.bias": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.mlp.layernorm.weight": rng.normal(size=(h,)).astype(np.float32),
            f"{p}.mlp.layernorm.bias": rng.normal(size=(h,)).astype(np.float32),
        })
    d = tmp_path / "jina"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    _wordpiece_tokenizer(d, [f"w{i}" for i in range(v)])
    r = _pack(tmp_path, d, "jina")
    assert r.get("general.architecture") == "jina-bert-v2"
    assert r.get("jina-bert-v2.context_length") == 8192
    assert r.get("tokenizer.ggml.token_type_count") == 2
    for name in ("token_embd.weight", "token_types.weight",
                 "token_embd_norm.weight", "blk.0.attn_q.weight",
                 "blk.1.attn_output_norm.weight", "blk.0.ffn_gate.weight",
                 "blk.0.ffn_up.weight", "blk.1.ffn_down.weight",
                 "blk.1.layer_output_norm.weight"):
        assert name in r.tensors, name
    # gated_layers ships gate|up; up_gated_layer ships up|gate
    np.testing.assert_allclose(
        r.tensor_float("blk.0.ffn_gate.weight"),
        t["encoder.layer.0.mlp.gated_layers.weight"][:ff]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        r.tensor_float("blk.1.ffn_gate.weight"),
        t["encoder.layer.1.mlp.up_gated_layer.weight"][ff:]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        r.tensor_float("blk.1.ffn_up.weight"),
        t["encoder.layer.1.mlp.up_gated_layer.weight"][:ff]
        .astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-4)


def test_wavtokenizer_pack(tmp_path):
    """WavTokenizerDec (reference :3580-3616): codebook embed -> token_embd,
    Vocos backbone convnext/posnet blocks, ISTFT head; EMA bookkeeping
    tensors skipped; audio metadata keys."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(62)
    feat, h = 16, 24
    cfg = {"model_type": "wavtokenizer-dec", "vocab_size": 40,
           "n_embd": h, "n_embd_features": feat, "n_ff": 32, "n_layer": 2,
           "group_norm_epsilon": 1e-6, "group_norm_groups": 4,
           "posnet": {"n_embd": h, "n_layer": 2},
           "convnext": {"n_embd": h, "n_layer": 1}}
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)
    t = {
        "feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed":
            f32(40, feat),
        "feature_extractor.encodec.quantizer.vq.layers.0._codebook.cluster_size":
            f32(40),
        "feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed_avg":
            f32(40, feat),
        "feature_extractor.encodec.quantizer.vq.layers.0._codebook.inited":
            np.ones((1,), np.float32),
        "backbone.embed.weight": f32(h, feat, 7),
        "backbone.embed.bias": f32(h),
        "backbone.norm.weight": f32(h),
        "backbone.norm.bias": f32(h),
        "backbone.convnext.0.dwconv.weight": f32(h, 1, 7),
        "backbone.convnext.0.dwconv.bias": f32(h),
        "backbone.convnext.0.norm.weight": f32(h),
        "backbone.convnext.0.norm.bias": f32(h),
        "backbone.convnext.0.pwconv1.weight": f32(32, h),
        "backbone.convnext.0.pwconv1.bias": f32(32),
        "backbone.convnext.0.pwconv2.weight": f32(h, 32),
        "backbone.convnext.0.pwconv2.bias": f32(h),
        "backbone.convnext.0.gamma": f32(h),
        "backbone.pos_net.0.norm1.weight": f32(h),
        "backbone.pos_net.0.norm1.bias": f32(h),
        "backbone.pos_net.0.conv1.weight": f32(h, h, 3),
        "backbone.pos_net.0.conv1.bias": f32(h),
        "backbone.pos_net.0.norm2.weight": f32(h),
        "backbone.pos_net.0.norm2.bias": f32(h),
        "backbone.pos_net.0.conv2.weight": f32(h, h, 3),
        "backbone.pos_net.0.conv2.bias": f32(h),
        "backbone.pos_net.1.norm.weight": f32(h),
        "backbone.pos_net.1.norm.bias": f32(h),
        "backbone.pos_net.1.q.weight": f32(h, h, 1),
        "backbone.pos_net.1.k.weight": f32(h, h, 1),
        "backbone.pos_net.1.v.weight": f32(h, h, 1),
        "backbone.pos_net.1.proj_out.weight": f32(h, h, 1),
        "backbone.final_layer_norm.weight": f32(h),
        "backbone.final_layer_norm.bias": f32(h),
        "head.out.weight": f32(18, h),
        "head.out.bias": f32(18),
    }
    d = tmp_path / "wav"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    r = _pack(tmp_path, d, "wav")
    assert r.get("general.architecture") == "wavtokenizer-dec"
    assert r.get("wavtokenizer-dec.vocab_size") == 40
    assert r.get("wavtokenizer-dec.features_length") == feat
    assert r.get("wavtokenizer-dec.posnet.block_count") == 2
    assert r.get("wavtokenizer-dec.convnext.block_count") == 1
    assert r.get("wavtokenizer-dec.attention.group_norm_groups") == 4
    assert r.get("wavtokenizer-dec.attention.causal") is False
    assert r.get("tokenizer.ggml.model") == "none"
    for n in ("token_embd.weight", "conv1d.weight", "token_embd_norm.weight",
              "convnext.0.dw.weight", "convnext.0.pw1.weight",
              "convnext.0.gamma.weight",
              "posnet.0.conv1.weight", "posnet.1.attn_q.weight",
              "posnet.1.attn_output.weight", "output_norm.weight",
              "output.weight"):
        assert n in r.tensors, (n, sorted(r.tensors))
    # EMA bookkeeping skipped
    assert not any("cluster" in n or "embed_avg" in n or "inited" in n
                   for n in r.tensors)


def test_jina_v3_lora_adapters(tmp_path):
    """jina-embeddings-v3 (reference XLMRobertaModel :4911-5006): the main
    GGUF becomes jina-bert-v3 (rope-based, parametrizations unwrapped) and
    each LoRA task gets a sibling adapter GGUF with the stacked lora_A/B
    split per task — token_embd's lora_b transposed, token_types' a/b
    swapped (reference quirks)."""
    from safetensors.numpy import save_file

    from gptq_gguf_tpu.export import packer
    from gptq_gguf_tpu.formats.gguf import GGUFReader

    rng = np.random.default_rng(63)
    v, h, ff, r = 32, 24, 32, 4
    cfg = {"model_type": "xlm-roberta", "architectures": ["XLMRobertaLoRA"],
           "vocab_size": v, "hidden_size": h, "num_hidden_layers": 1,
           "num_attention_heads": 4, "intermediate_size": ff,
           "max_position_embeddings": 66, "pad_token_id": 1,
           "type_vocab_size": 1, "rotary_emb_base": 20000.0,
           "lora_adaptations": ["retrieval.query", "text-matching"],
           "lora_alpha": 2.0,
           "task_instructions": {"retrieval.query": "Represent the query: ",
                                 "text-matching": ""}}
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)
    P = ".parametrizations.weight"
    t = {
        f"roberta.embeddings.word_embeddings{P}.original": f32(v, h),
        f"roberta.embeddings.word_embeddings{P}.0.lora_A": f32(2, v, r),
        f"roberta.embeddings.word_embeddings{P}.0.lora_B": f32(2, r, h),
        f"roberta.embeddings.token_type_embeddings{P}.original": f32(1, h),
        f"roberta.embeddings.token_type_embeddings{P}.0.lora_A": f32(2, 1, r),
        f"roberta.embeddings.token_type_embeddings{P}.0.lora_B": f32(2, r, h),
        "roberta.embeddings.LayerNorm.weight": f32(h),
        "roberta.embeddings.LayerNorm.bias": f32(h),
    }
    p = "roberta.encoder.layer.0"
    for nm, shp in (("attention.self.query", (h, h)),
                    ("attention.self.key", (h, h)),
                    ("attention.self.value", (h, h)),
                    ("attention.output.dense", (h, h)),
                    ("intermediate.dense", (ff, h)),
                    ("output.dense", (h, ff))):
        t[f"{p}.{nm}{P}.original"] = f32(*shp)
        t[f"{p}.{nm}{P}.0.lora_A"] = f32(2, r, shp[1])
        t[f"{p}.{nm}{P}.0.lora_B"] = f32(2, shp[0], r)
        t[f"{p}.{nm}.bias"] = f32(shp[0])
    for nm in ("attention.output.LayerNorm", "output.LayerNorm"):
        t[f"{p}.{nm}.weight"] = f32(h)
        t[f"{p}.{nm}.bias"] = f32(h)
    d = tmp_path / "jv3"
    d.mkdir()
    save_file(t, d / "model.safetensors")
    json.dump(cfg, open(d / "config.json", "w"))
    _wordpiece_tokenizer(d, [f"w{i}" for i in range(v)])
    out = tmp_path / "jv3.gguf"
    packer.pack_model(d, d / "none", out)
    r_main = GGUFReader(out)
    assert r_main.get("general.architecture") == "jina-bert-v3"
    assert r_main.get("jina-bert-v3.rope.freq_base") == 20000.0
    assert "token_embd.weight" in r_main.tensors  # .original unwrapped
    assert "blk.0.attn_q.weight" in r_main.tensors
    assert not any("lora" in n for n in r_main.tensors)
    # per-task sidecars
    for task in ("retrieval.query", "text-matching"):
        rr = GGUFReader(tmp_path / f"lora-{task}-jv3.gguf")
        assert rr.get("general.type") == "adapter"
        assert rr.get("adapter.type") == "lora"
        assert rr.get("adapter.lora.alpha") == 2.0
        assert rr.get("adapter.lora.task_name") == task
        for n in ("token_embd.weight.lora_a", "token_embd.weight.lora_b",
                  "blk.0.attn_q.weight.lora_a", "blk.0.ffn_up.weight.lora_b"):
            assert n in rr.tensors, (task, n)
    rr = GGUFReader(tmp_path / "lora-retrieval.query-jv3.gguf")
    assert rr.get("adapter.lora.prompt_prefix") == "Represent the query: "
    # quirks: token_embd lora_b transposed; token_types a/b swapped
    np.testing.assert_allclose(
        rr.tensor_float("token_embd.weight.lora_b"),
        t[f"roberta.embeddings.word_embeddings{P}.0.lora_B"][0].T, rtol=1e-6)
    np.testing.assert_allclose(
        rr.tensor_float("token_types.weight.lora_a"),
        t[f"roberta.embeddings.token_type_embeddings{P}.0.lora_B"][0],
        rtol=1e-6)


def test_jina_v3_lora_apply(tmp_path):
    """Merging a packed task adapter reproduces W + (alpha/r) * B @ A
    (checked against a manual numpy merge through the encoder forward)."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import bert as jbert

    # reuse the structural fixture from the pack test
    test_jina_v3_lora_adapters(tmp_path)
    main = tmp_path / "jv3.gguf"
    adapter = tmp_path / "lora-retrieval.query-jv3.gguf"
    params, cfg = jbert.load_gguf_encoder(main)
    merged = jbert.apply_lora_gguf(params, cfg, adapter)
    r = GGUFReader(adapter)
    a = r.tensor_float("blk.0.attn_q.weight.lora_a")
    b = r.tensor_float("blk.0.attn_q.weight.lora_b")
    expect = (np.asarray(params["layers"][0]["q_w"], np.float32)
              + (2.0 / a.shape[0]) * (b @ a))
    np.testing.assert_allclose(np.asarray(merged["layers"][0]["q_w"]),
                               expect, rtol=1e-5, atol=1e-6)
    ea = r.tensor_float("token_embd.weight.lora_a")
    eb = r.tensor_float("token_embd.weight.lora_b")
    expect_e = (np.asarray(params["token_embd"], np.float32)
                + (2.0 / ea.shape[1]) * (ea @ eb.T))
    np.testing.assert_allclose(np.asarray(merged["token_embd"]), expect_e,
                               rtol=1e-5, atol=1e-6)
    # merged weights change the embedding output
    ids = RNG.integers(0, 32, size=(1, 6)).astype(np.int32)
    base_out = np.asarray(jbert.pooled_embedding(params, cfg, ids))
    lora_out = np.asarray(jbert.pooled_embedding(merged, cfg, ids))
    assert not np.allclose(base_out, lora_out, atol=1e-4)
