"""End-to-end calibration walk on a tiny model.

The minimum end-to-end slice (SURVEY.md §7 phase 2): quantize a tiny llama
with GPTQ -> artifacts on disk -> perplexity of the quantized model must be
close to fp32 and at least as good as pure RTN quantization.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.evals import ppl
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.models import llama, loader
from gptq_gguf_tpu.ops import kquant
from gptq_gguf_tpu.ops.gptq import GPTQConfig
from gptq_gguf_tpu.quant import artifacts, calibrate

RNG = np.random.default_rng(6)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from tests.test_model import make_tiny_hf_model

    tmp = tmp_path_factory.mktemp("calib")
    model_dir, hf_model = make_tiny_hf_model(tmp, seed=3)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    # synthetic "language": markov-ish token stream so the model's ppl is finite
    calib = [RNG.integers(0, cfg.vocab_size, size=(1, 64)) for _ in range(8)]
    evald = [RNG.integers(0, cfg.vocab_size, size=(1, 64)) for _ in range(4)]
    return cfg, params, calib, evald


def test_quantize_model_end_to_end(tiny, tmp_path):
    cfg, params, calib, evald = tiny
    save_dir = tmp_path / "layers"
    qparams = calibrate.quantize_model(
        params,
        cfg,
        calib,
        quant_config={"q_proj": "Q4_K"},
        gptq_cfg=GPTQConfig(),
        save_dir=save_dir,
        batch_size=2,
    )

    # artifacts exist for all 7 linears of both blocks
    layer_dirs = artifacts.list_layers(save_dir)
    assert len(layer_dirs) == 7 * cfg.num_hidden_layers
    art = artifacts.load_layer(save_dir, "model.layers.0.self_attn.q_proj")
    assert art.q_type == T.Q4_K
    assert art.qweight.shape == (cfg.hidden_size, cfg.hidden_size)

    # quantized weight in params equals dequantized artifact
    w = np.asarray(llama.get_linear(qparams, "model.layers.0.self_attn.q_proj"))
    np.testing.assert_allclose(art.dequantize(), w, rtol=1e-5, atol=1e-6)

    # the weight actually changed (quantization happened)
    w0 = np.asarray(llama.get_linear(params, "model.layers.0.self_attn.q_proj"))
    assert np.abs(w - w0).max() > 0

    # perplexity sanity: quantized close to fp32, and GPTQ >= RTN quality
    ppl_fp = ppl.compute_perplexity(params, cfg, evald)
    ppl_q = ppl.compute_perplexity(qparams, cfg, evald)
    assert ppl_q < ppl_fp * 1.5

    # RTN baseline: quantize every linear with plain RTN
    rtn_params = params
    for name in llama.linear_layer_names(cfg):
        w = llama.get_linear(rtn_params, name)
        w_hat = kquant.dequantize_rtn(w.astype(jnp.float32), T.Q4_K).astype(w.dtype)
        rtn_params = llama.set_linear(rtn_params, name, w_hat)
    ppl_rtn = ppl.compute_perplexity(rtn_params, cfg, evald)
    assert ppl_q <= ppl_rtn * 1.02, (ppl_q, ppl_rtn)


def test_quant_non_block_modules(tiny, tmp_path):
    cfg, params, calib, _ = tiny
    save_dir = tmp_path / "layers_nb"
    calibrate.quantize_model(
        params,
        cfg,
        calib[:2],
        quant_config={"embed_tokens": "Q6_K", "lm_head": "Q6_K"},
        save_dir=save_dir,
        quant_non_block=True,
    )
    layer_dirs = artifacts.list_layers(save_dir)
    assert "model.embed_tokens" in layer_dirs
    assert "lm_head" in layer_dirs
    art = artifacts.load_layer(save_dir, "model.embed_tokens")
    assert art.q_type == T.Q6_K


def test_quantizable_regex_filter(tiny, tmp_path):
    cfg, params, calib, _ = tiny
    save_dir = tmp_path / "layers_f"
    calibrate.quantize_model(
        params,
        cfg,
        calib[:2],
        save_dir=save_dir,
        quantizable_regex=r"self_attn\.(q|k)_proj",
    )
    layer_dirs = artifacts.list_layers(save_dir)
    assert len(layer_dirs) == 2 * cfg.num_hidden_layers
    assert all("q_proj" in n or "k_proj" in n for n in layer_dirs)


def test_scan_batches_matches_loop(tmp_path):
    """scan_batches=True (single-program capture/propagate) must reproduce
    the sequential per-batch walk exactly (same EMA order)."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama as llama_mod

    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama_mod.init_params(cfg, seed=41)
    rng = np.random.default_rng(43)
    calib = [rng.integers(0, 128, size=(1, 32)) for _ in range(4)]

    d1 = tmp_path / "loop"
    d2 = tmp_path / "scan"
    p_loop = calibrate.quantize_model(params, cfg, calib, save_dir=d1,
                                      scan_batches=False)
    p_scan = calibrate.quantize_model(params, cfg, calib, save_dir=d2,
                                      scan_batches=True)
    w1 = np.asarray(p_loop["layers"][1]["down_proj"])
    w2 = np.asarray(p_scan["layers"][1]["down_proj"])
    np.testing.assert_allclose(w2, w1, rtol=1e-6, atol=1e-7)
    # artifacts byte-identical codes
    a1 = artifacts.load_layer(d1, "model.layers.1.mlp.down_proj")
    a2 = artifacts.load_layer(d2, "model.layers.1.mlp.down_proj")
    np.testing.assert_array_equal(a1.qweight, a2.qweight)


def test_quantize_model_host_staged_matches_device(tiny, tmp_path):
    """host=True loading (numpy weights, one block staged on device at a
    time — how checkpoints larger than HBM quantize) must produce the same
    artifacts as the all-on-device walk."""
    cfg, params, calib, _ = tiny
    host_params = {
        k: (v if k != "layers" else
            [{kk: np.asarray(vv) for kk, vv in l.items()} for l in v])
        for k, v in params.items()
    }
    host_params = {k: (np.asarray(v) if hasattr(v, "dtype") else v)
                   for k, v in host_params.items()}

    d_dir, h_dir = tmp_path / "dev", tmp_path / "host"
    qd = calibrate.quantize_model(params, cfg, calib, save_dir=d_dir,
                                  quant_non_block=True)
    # offload_weights=True: the >HBM behavior under test (auto keeps small
    # stacks device-resident since round 5)
    qh = calibrate.quantize_model(host_params, cfg, calib, save_dir=h_dir,
                                  quant_non_block=True, offload_weights=True)
    # every block weight came back to host numpy
    assert all(isinstance(v, np.ndarray)
               for v in qh["layers"][0].values())
    # identical quantized codes on disk
    a = artifacts.load_layer(d_dir, "model.layers.0.self_attn.q_proj")
    b = artifacts.load_layer(h_dir, "model.layers.0.self_attn.q_proj")
    np.testing.assert_array_equal(np.asarray(a.qweight), np.asarray(b.qweight))
    a = artifacts.load_layer(d_dir, "lm_head")
    b = artifacts.load_layer(h_dir, "lm_head")
    np.testing.assert_array_equal(np.asarray(a.qweight), np.asarray(b.qweight))


def test_offload_activations_equivalent():
    """Device-resident calibration activations (round-5 default for small
    sets) must produce identical quantized weights to host-offloaded ones
    (the pre-r5 behavior, still used above the 2 GB auto threshold)."""
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=3)
    calib = [RNG.integers(0, cfg.vocab_size, size=(1, 32)) for _ in range(3)]
    on = calibrate.quantize_model(dict(params), cfg, calib,
                                  offload_activations=True)
    off = calibrate.quantize_model(dict(params), cfg, calib,
                                   offload_activations=False)
    for li, (a, b) in enumerate(zip(on["layers"], off["layers"])):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"layer {li} {k}")
