"""GGUF-direct perplexity: `ppl --gguf-file` dequantizes through the
serving loader and must agree with the HF-checkpoint path (the reference
measures GGUF ppl via llama-perplexity; this is the native equivalent)."""

import json

import numpy as np
import pytest
import torch

from gptq_gguf_tpu.export import packer


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("pplgguf")
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        torch_dtype="float32")
    torch.manual_seed(23)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp / "m"
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp / "m.gguf"
    packer.pack_model(d, tmp / "none", gguf)
    return d, gguf, tmp


def test_dense_gguf_load_matches_hf_forward(tiny):
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama, loader
    from gptq_gguf_tpu.serving import model as qmodel

    d, gguf, _ = tiny
    cfg = loader.load_config(d)
    hf_params = loader.load_params(d, cfg)
    dparams, dcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32,
                                                 dense=True)
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 128, size=(2, 12))
    ref = np.asarray(llama.forward(hf_params, jnp.asarray(ids), cfg))
    got = np.asarray(llama.forward(dparams, jnp.asarray(ids), dcfg))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)  # f16 pack


def test_ppl_cli_gguf_matches_hf(tiny, capsys):
    from gptq_gguf_tpu.__main__ import main

    d, gguf, tmp = tiny
    out_hf = tmp / "hf.json"
    out_gg = tmp / "gg.json"
    rc = main(["ppl", "--model_name_or_path", str(d), "--datasets",
               "synthetic", "--eval_tokens", "256", "--sequence_length",
               "64", "--output_path", str(out_hf)])
    assert not rc
    rc = main(["ppl", "--gguf-file", str(gguf), "--datasets", "synthetic",
               "--eval_tokens", "256", "--sequence_length", "64",
               "--output_path", str(out_gg)])
    assert not rc
    a = json.load(open(out_hf))["synthetic"]
    b = json.load(open(out_gg))["synthetic"]
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) / a < 0.02  # f16 pack rounding only


def test_serving_path_ppl_close_to_dense(tiny):
    """`ppl --gguf-path serving` (packed weights, fused kernels) must agree
    with the dense-dequant oracle to bf16-forward tolerance — this is the
    path 8B+ GGUFs take on one chip (dense f32 would exceed HBM)."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.evals import ppl
    from gptq_gguf_tpu.serving import model as qmodel

    _, gguf, _ = tiny
    rng = np.random.default_rng(11)
    data = [rng.integers(0, 128, size=(1, 48)) for _ in range(3)]

    dparams, dcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32,
                                                 dense=True)
    ref = ppl.compute_perplexity(dparams, dcfg, data)
    qparams, qcfg = qmodel.load_gguf_for_serving(gguf)
    got = ppl.compute_perplexity(qparams, qcfg, data, serving=True)
    assert abs(np.log(got) - np.log(ref)) < 0.05  # nats/token
