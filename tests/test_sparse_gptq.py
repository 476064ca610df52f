"""FastOBQ / FastOBC / OWL / error-estimator tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.ops import sparse_gptq
from tests.test_gptq import make_problem, objective

RNG = np.random.default_rng(16)


def test_simple_find_params_asym():
    x = jnp.asarray(RNG.normal(size=(8, 64)).astype(np.float32))
    p = sparse_gptq.simple_find_params(x, 4, sym=False)
    assert p.scale.shape == (8,)
    # dequantized range covers data
    q, wq = sparse_gptq._flat_quantize(x, p.scale[:, None], p.zero[:, None], 15)
    assert np.abs(np.asarray(wq) - np.asarray(x)).max() < np.asarray(p.scale).max()


def test_fast_obq_ladder_monotone_and_beats_rtn():
    W, X, H = make_problem(d_row=8, d_col=256)
    res = sparse_gptq.fast_obq_quantize(
        jnp.asarray(W), jnp.asarray(H), [2, 4, 8], group_size=128
    )
    errs = {}
    for bits, (q, p, w_hat) in res.items():
        assert np.asarray(q).max() <= 2**bits - 1
        errs[bits] = objective(W, np.asarray(w_hat), H)
    assert errs[8] < errs[4] < errs[2]

    # GPTQ beats per-group RTN at 4 bits
    from gptq_gguf_tpu.ops.sparse_gptq import simple_find_params, _flat_quantize

    x = jnp.asarray(W).reshape(8, 2, 128)
    p = simple_find_params(x, 4, sym=False)
    _, wq = _flat_quantize(x, p.scale[..., None], p.zero[..., None], 15)
    rtn_err = objective(W, np.asarray(wq).reshape(8, 256), H)
    assert errs[4] < rtn_err


@pytest.mark.parametrize("sparsity", [0.3, 0.6])
def test_fast_obc_sparsity_levels(sparsity):
    W, X, H = make_problem(d_row=8, d_col=256)
    (w_s,) = sparse_gptq.fast_obc_prune(jnp.asarray(W), jnp.asarray(H), [sparsity])
    w_s = np.asarray(w_s)
    frac_zero = (w_s == 0).mean()
    assert abs(frac_zero - sparsity) < 0.05
    # better than magnitude pruning under the Hessian objective
    thr = np.quantile(np.abs(W), sparsity)
    w_mag = np.where(np.abs(W) > thr, W, 0.0)
    assert objective(W, w_s, H) < objective(W, w_mag, H) * 1.05


def test_owl_distribution():
    ratios = [0.1, 0.3, 0.2, 0.4]
    dist = sparse_gptq.owl_sparsity_distribution(ratios, 0.5, owl_lambda=0.08)
    assert abs(dist.mean() - 0.5) < 1e-9  # mean preserved
    assert dist[np.argmax(ratios)] == dist.min()  # most outliers -> least pruned
    flat = sparse_gptq.owl_sparsity_distribution([0.2, 0.2], 0.5, 0.08)
    np.testing.assert_allclose(flat, 0.5)


def test_relative_layer_error():
    W, X, H = make_problem(d_row=8, d_col=256)
    assert float(sparse_gptq.relative_layer_error(jnp.asarray(W), jnp.asarray(W), jnp.asarray(H))) == 0
    W_hat = W + RNG.normal(size=W.shape).astype(np.float32) * 0.01
    e1 = float(sparse_gptq.relative_layer_error(jnp.asarray(W), jnp.asarray(W_hat), jnp.asarray(H)))
    W_hat2 = W + RNG.normal(size=W.shape).astype(np.float32) * 0.1
    e2 = float(sparse_gptq.relative_layer_error(jnp.asarray(W), jnp.asarray(W_hat2), jnp.asarray(H)))
    assert 0 < e1 < e2


def test_ladder_walk_end_to_end(tmp_path):
    from gptq_gguf_tpu.models import llama as llama_mod
    from gptq_gguf_tpu.models.llama import LlamaConfig
    from gptq_gguf_tpu.search import ladder

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama_mod.init_params(cfg, seed=2)
    calib = [RNG.integers(0, 128, size=(1, 32)) for _ in range(2)]

    qdir = tmp_path / "obq"
    ladder.build_fastobq_ladder(
        params, cfg, calib, qdir, bitwidths=(3, 4), propagate_bits=4, group_size=128
    )
    assert (qdir / "model.layers.0.self_attn.q_proj" / "3.pth").exists()
    assert (qdir / "model.layers.0.mlp.down_proj" / "4.pth").exists()

    sdir = tmp_path / "obc"
    ladder.build_fastobc_ladder(
        params, cfg, calib, sdir, sparsity=0.5, num_levels=1, weights_diff=256 * 64
    )
    files = list((sdir / "model.layers.0.self_attn.q_proj").glob("*.pth"))
    assert len(files) >= 1
    import torch

    w0 = torch.load(sdir / "model.layers.0.self_attn.q_proj" / "0.pth", weights_only=True)
    assert abs(float((w0 == 0).float().mean()) - 0.5) < 0.05

    ratios = ladder.compute_owl_outlier_ratios(params, cfg, calib, m=3.0)
    assert len(ratios) == 1 and 0 <= ratios[0] <= 1


def test_estimate_layer_errors(tmp_path):
    import torch

    from gptq_gguf_tpu.models import llama as llama_mod
    from gptq_gguf_tpu.models.llama import LlamaConfig
    from gptq_gguf_tpu.ops import kquant
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.search import ladder

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama_mod.init_params(cfg, seed=4)
    calib = [RNG.integers(0, 128, size=(1, 32)) for _ in range(2)]

    db = tmp_path / "db"
    import jax.numpy as jnp
    for name in llama_mod.linear_layer_names(cfg):
        w = llama_mod.get_linear(params, name)
        for qt, tag in ((T.Q2_K, "2.5625-Q2_K"), (T.Q6_K, "6.5625-Q6_K")):
            w_hat = np.asarray(kquant.dequantize_rtn(w.astype(jnp.float32), qt))
            d = db / name
            d.mkdir(parents=True, exist_ok=True)
            torch.save(torch.from_numpy(w_hat), d / f"{tag}.pth")

    res = ladder.estimate_layer_errors(
        params, cfg, calib, db, out_path=tmp_path / "errs.json"
    )
    assert len(res) == 7
    for name, errs in res.items():
        assert errs["6.5625-Q6_K.pth"] < errs["2.5625-Q2_K.pth"]
    assert (tmp_path / "errs.json").exists()
