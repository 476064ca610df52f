"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_gguf_tpu.evals import ppl
from gptq_gguf_tpu.models import llama
from gptq_gguf_tpu.ops import gptq as gptq_ops
from gptq_gguf_tpu.parallel import dp, mesh as mesh_mod, tp
from gptq_gguf_tpu.quant import calibrate

RNG = np.random.default_rng(13)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh():
    m = mesh_mod.make_mesh(tp=4)
    assert m.shape == {"dp": 2, "tp": 4}
    m2 = mesh_mod.make_mesh(dp=8, tp=1)
    assert m2.shape == {"dp": 8, "tp": 1}


def test_dp_hessian_matches_single_device():
    """Sharded-batch Hessian accumulation == sequential reference math."""
    m = mesh_mod.make_mesh(dp=8, tp=1)
    d = 64
    x = RNG.normal(size=(8, 16, d)).astype(np.float32)

    H0, n0 = gptq_ops.init_hessian(d)
    H_seq, n_seq = gptq_ops.accumulate_hessian(H0, n0, jnp.asarray(x))

    H1, n1 = gptq_ops.init_hessian(d)
    xs = dp.shard_batch(jnp.asarray(x), m)
    H_dp, n_dp = gptq_ops.accumulate_hessian(H1, n1, xs)

    np.testing.assert_allclose(np.asarray(H_dp), np.asarray(H_seq), rtol=1e-4, atol=1e-5)
    assert float(n_dp) == float(n_seq)


def test_explicit_hessian_allreduce():
    m = mesh_mod.make_mesh(dp=8, tp=1)
    H = jnp.asarray(RNG.normal(size=(32, 32)).astype(np.float32))
    out = dp.hessian_allreduce_mean(H, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(H), rtol=1e-6)


def test_tp_sharded_forward_matches_replicated():
    from gptq_gguf_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=0)
    ids = jnp.asarray(RNG.integers(0, 256, size=(2, 32)))
    ref = np.asarray(llama.forward(params, ids, cfg))

    m = mesh_mod.make_mesh(dp=2, tp=4)
    sharded = tp.shard_params(params, m)
    out = np.asarray(llama.forward(sharded, ids, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_calibration_with_mesh_matches_single(tmp_path):
    from gptq_gguf_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=1)
    calib = [RNG.integers(0, 128, size=(1, 32)) for _ in range(8)]

    q_single = calibrate.quantize_model(params, cfg, calib, batch_size=8)
    m = mesh_mod.make_mesh(dp=8, tp=1)
    q_mesh = calibrate.quantize_model(params, cfg, calib, batch_size=8, mesh=m)

    w_s = np.asarray(llama.get_linear(q_single, "model.layers.0.mlp.down_proj"))
    w_m = np.asarray(llama.get_linear(q_mesh, "model.layers.0.mlp.down_proj"))
    # same Hessian math (modulo reduction order) -> nearly identical codes
    assert np.mean(np.isclose(w_s, w_m, rtol=1e-4, atol=1e-6)) > 0.99


def test_tp_sharded_quantized_serving(tmp_path):
    """Quantized serving forward under TP shardings matches unsharded."""
    import jax.numpy as jnp
    from gptq_gguf_tpu.models.llama import LlamaConfig
    from gptq_gguf_tpu.ops import kquant, qmatmul
    from gptq_gguf_tpu.serving import model as qmodel
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=5)
    # quantize block linears into runtime format
    layer = dict(params["layers"][0])
    for key in llama.BLOCK_LINEAR_KEYS:
        w = layer[key]
        q, p = kquant.quantize_rtn(w.astype(jnp.float32), T.Q4_K)
        layer[key] = qmatmul.pack_runtime(np.asarray(q), p, T.Q4_K)
    qparams = {**params, "layers": [layer]}

    ids = jnp.asarray(RNG.integers(0, 128, size=(2, 16)))
    cache = qmodel.init_cache(cfg, 2, 16, dtype=jnp.float32)
    ref_logits, _ = qmodel.forward_cached(qparams, cfg, ids, cache)

    m = mesh_mod.make_mesh(dp=2, tp=4)
    sharded = tp.shard_serving_params(qparams, m)
    cache2 = qmodel.init_cache(cfg, 2, 16, dtype=jnp.float32)
    out_logits, _ = qmodel.forward_cached(sharded, cfg, ids, cache2)
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
    )
