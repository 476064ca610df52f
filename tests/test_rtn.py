"""RTN (llama-quantize equivalent) tests incl. imatrix weighting."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.models import llama
from gptq_gguf_tpu.models.llama import LlamaConfig
from gptq_gguf_tpu.ops import kquant
from gptq_gguf_tpu.quant import rtn

RNG = np.random.default_rng(18)


def test_imatrix_changes_and_helps_weighted_error():
    x = (RNG.normal(size=(16, 512)) * 0.05).astype(np.float32)
    im = np.abs(RNG.normal(size=512)).astype(np.float32) + 0.1
    im[:64] *= 50  # some columns matter much more

    y_plain = np.asarray(kquant.dequantize_rtn(jnp.asarray(x), T.Q4_K))
    q, p = kquant.quantize_rtn(jnp.asarray(x), T.Q4_K, imatrix=jnp.asarray(im))
    y_im = np.asarray(kquant.dequantize(q, p, T.Q4_K))

    werr = lambda y: float((im[None, :] * (y - x) ** 2).sum())
    assert not np.array_equal(y_plain, y_im)
    assert werr(y_im) <= werr(y_plain) * 1.001


def test_rtn_quantize_model_and_imatrix(tmp_path):
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=3)
    calib = [RNG.integers(0, 128, size=(1, 32)) for _ in range(2)]
    im = rtn.compute_imatrix(params, cfg, calib)
    assert "model.layers.0.mlp.down_proj" in im
    assert im["model.layers.0.mlp.down_proj"].shape == (cfg.intermediate_size,)
    assert np.all(im["model.layers.0.self_attn.q_proj"] >= 0)

    qparams = rtn.rtn_quantize_model(
        params, cfg, {"q_proj": "Q2_K"}, tmp_path / "layers", imatrix=im
    )
    from gptq_gguf_tpu.quant import artifacts

    art = artifacts.load_layer(tmp_path / "layers", "model.layers.0.self_attn.q_proj")
    assert art.q_type == T.Q2_K
    art2 = artifacts.load_layer(tmp_path / "layers", "model.layers.0.mlp.down_proj")
    assert art2.q_type == T.Q4_K  # default


def test_quantization_summary(tmp_path):
    from gptq_gguf_tpu.formats.gguf import GGUFWriter

    p = tmp_path / "m.gguf"
    w = GGUFWriter(p, arch="llama")
    w.add_tensor("a", np.zeros((4, 256), np.float16))
    w.write()
    s = rtn.quantization_summary(p, tmp_path / "summary.json")
    assert s["total_elements"] == 1024
    assert abs(s["bits_per_weight"] - 16.0) < 1e-6
    assert (tmp_path / "summary.json").exists()
