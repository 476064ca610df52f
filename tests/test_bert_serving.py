"""Encoder (BERT-family) serving: models/bert.py forward + embeddings.

The reference packs encoder GGUFs for llama.cpp's embedding server
(BertModel, pack_gptq_into_gguf.py:4518-4594); here the encoder runs
natively. Oracle: transformers BertModel logits parity.
"""

import json

import numpy as np
import pytest
import torch

from gptq_gguf_tpu.models import bert as jbert

RNG = np.random.default_rng(91)


@pytest.fixture(scope="module")
def hf_bert(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=48,
                     max_position_embeddings=64, type_vocab_size=2,
                     hidden_act="gelu")
    torch.manual_seed(77)
    m = BertModel(cfg).eval().float()
    d = tmp_path_factory.mktemp("bert") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_hf_parity_last_hidden(hf_bert):
    d, m = hf_bert
    params, cfg = jbert.load_hf_encoder(d)
    ids = RNG.integers(0, 48, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.float32)
    mask[1, 6:] = 0.0
    ours = np.asarray(jbert.encode(params, cfg, ids, mask))
    with torch.no_grad():
        ref = m(input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    # masked positions diverge (we don't zero them); compare valid ones
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[1, :6], ref[1, :6], rtol=2e-4, atol=2e-4)


def test_pooling_modes(hf_bert):
    d, m = hf_bert
    params, cfg = jbert.load_hf_encoder(d)
    ids = RNG.integers(0, 48, size=(1, 7)).astype(np.int32)
    h = np.asarray(jbert.encode(params, cfg, ids))
    import dataclasses

    cls_vec = np.asarray(jbert.pooled_embedding(
        params, dataclasses.replace(cfg, pooling_type=jbert.POOL_CLS),
        ids, normalize=False))
    np.testing.assert_allclose(cls_vec[0], h[0, 0], rtol=1e-5)
    mean_vec = np.asarray(jbert.pooled_embedding(
        params, dataclasses.replace(cfg, pooling_type=jbert.POOL_MEAN),
        ids, normalize=False))
    np.testing.assert_allclose(mean_vec[0], h[0].mean(0), rtol=1e-4, atol=1e-5)
    normed = np.asarray(jbert.pooled_embedding(
        params, dataclasses.replace(cfg, pooling_type=jbert.POOL_MEAN), ids))
    np.testing.assert_allclose(np.linalg.norm(normed, axis=-1), 1.0, rtol=1e-5)


@pytest.fixture(scope="module")
def bert_gguf(hf_bert, tmp_path_factory):
    from gptq_gguf_tpu.export import packer

    d, m = hf_bert
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
             + [f"w{i}" for i in range(44)])
    json.dump({
        "model": {"type": "WordPiece",
                  "vocab": {t: i for i, t in enumerate(vocab)},
                  "unk_token": "[UNK]"},
        "added_tokens": [
            {"id": 0, "content": "[PAD]", "special": True},
            {"id": 2, "content": "[CLS]", "special": True},
            {"id": 3, "content": "[SEP]", "special": True},
        ],
    }, open(d / "tokenizer.json", "w"))
    out = tmp_path_factory.mktemp("gguf") / "bert.gguf"
    packer.pack_model(d, d / "none", out)
    return out


def test_gguf_roundtrip_matches_hf(hf_bert, bert_gguf):
    d, m = hf_bert
    hf_params, cfg = jbert.load_hf_encoder(d)
    g_params, g_cfg = jbert.load_gguf_encoder(bert_gguf)
    assert g_cfg.hidden_size == cfg.hidden_size
    assert g_cfg.num_hidden_layers == cfg.num_hidden_layers
    ids = RNG.integers(0, 48, size=(1, 8)).astype(np.int32)
    a = np.asarray(jbert.encode(hf_params, cfg, ids))
    b = np.asarray(jbert.encode(g_params, g_cfg, ids))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)  # f16 pack


def test_embed_cli(bert_gguf, tmp_path, capsys):
    from gptq_gguf_tpu.__main__ import main

    main(["embed", "--gguf-file", str(bert_gguf), "--prompt", "w1 w2", "w3"])
    out = json.loads(capsys.readouterr().out)
    assert out["dim"] == 32
    assert len(out["embeddings"]) == 2
    v = np.asarray(out["embeddings"])
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-4)


def test_embeddings_endpoint(bert_gguf):
    import urllib.request

    from gptq_gguf_tpu.cli.tools import make_embedder
    from gptq_gguf_tpu.serving import server as server_mod

    class _NullEngine:
        slot_req: list = []
        queue: list = []
        completed: list = []

        def step(self):
            return 0

    embedder = make_embedder(bert_gguf)
    server, runner = server_mod.serve_http(
        _NullEngine(), port=0, block=False, embedder=embedder)
    try:
        addr = server.server_address
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/v1/embeddings",
            data=json.dumps({"input": ["w1 w2", "w3"]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["object"] == "list"
        assert len(out["data"]) == 2
        assert out["data"][1]["index"] == 1
        assert len(out["data"][0]["embedding"]) == 32
        assert out["usage"]["prompt_tokens"] > 0
    finally:
        server.shutdown()
        runner.stop()


@pytest.fixture(scope="module")
def reranker_gguf(tmp_path_factory):
    """Roberta-style classifier (bge-reranker shape): dense+tanh head,
    packed via the class-dispatch packer path."""
    from transformers import RobertaConfig, RobertaForSequenceClassification

    from gptq_gguf_tpu.export import packer

    cfg = RobertaConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=48,
                        max_position_embeddings=66, pad_token_id=1,
                        num_labels=1)
    torch.manual_seed(79)
    m = RobertaForSequenceClassification(cfg).eval().float()
    d = tmp_path_factory.mktemp("rr") / "hf"
    m.save_pretrained(d, safe_serialization=True)
    vocab = (["<s>", "<pad>", "</s>", "[UNK]"]
             + [f"w{i}" for i in range(44)])
    json.dump({
        "model": {"type": "WordPiece",
                  "vocab": {t: i for i, t in enumerate(vocab)},
                  "unk_token": "[UNK]"},
        "added_tokens": [
            {"id": 0, "content": "<s>", "special": True},
            {"id": 2, "content": "</s>", "special": True},
        ],
    }, open(d / "tokenizer.json", "w"))
    out = tmp_path_factory.mktemp("rr") / "rr.gguf"
    packer.pack_model(d, d / "none", out)
    return out, m


def test_rank_score_matches_hf(reranker_gguf):
    import jax.numpy as jnp

    out, m = reranker_gguf
    params, cfg = jbert.load_gguf_encoder(out)
    assert params["cls_w"] is not None and params["cls_out_w"] is not None
    ids = RNG.integers(4, 48, size=(2, 7)).astype(np.int32)
    ours = np.asarray(jbert.rank_score(params, cfg, jnp.asarray(ids)))
    # HF roberta positions start at pad+1; the packed GGUF table is chopped,
    # so feed HF the same rows via position_ids
    import torch as _t

    pos = _t.arange(2, 9).expand(2, -1)
    with _t.no_grad():
        ref = m(input_ids=_t.tensor(ids, dtype=_t.long),
                position_ids=pos).logits.numpy()[:, 0]
    np.testing.assert_allclose(ours, ref, rtol=5e-2, atol=5e-3)  # f16 pack


def test_rank_cli_and_endpoint(reranker_gguf, capsys):
    import urllib.request

    from gptq_gguf_tpu.__main__ import main
    from gptq_gguf_tpu.cli.tools import make_reranker
    from gptq_gguf_tpu.serving import server as server_mod

    out, m = reranker_gguf
    rc = main(["rank", "--gguf-file", str(out), "--query", "w1 w2",
               "--documents", "w3 w4", "w5"])
    assert not rc
    res = json.loads(capsys.readouterr().out)
    assert len(res["results"]) == 2
    assert res["results"][0]["relevance_score"] >= \
        res["results"][1]["relevance_score"]

    class _NullEngine:
        slot_req: list = []
        queue: list = []
        completed: list = []

        def step(self):
            return 0

    server, runner = server_mod.serve_http(
        _NullEngine(), port=0, block=False,
        reranker=make_reranker(out))
    try:
        addr = server.server_address
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/v1/rerank",
            data=json.dumps({"query": "w1", "documents": ["w2", "w3", "w4"],
                             "top_n": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out_json = json.loads(r.read())
        assert len(out_json["results"]) == 2
        assert "relevance_score" in out_json["results"][0]
    finally:
        server.shutdown()
        runner.stop()
