"""Flash (online-softmax chunked) attention parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.models import llama
from gptq_gguf_tpu.serving import model as qmodel

RNG = np.random.default_rng(67)


def _mk(B=2, nH=4, nKV=2, S=6, L=40, hd=16):
    q = jnp.asarray(RNG.normal(size=(B, nH, S, hd)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    return q, k, v


def _materialized(q, k, v, qpos, scale=None, softcap=None, window=None):
    """Oracle: the full masked-softmax attention (serving masked path)."""
    import math

    B, nH, S, hd = q.shape
    nKV, L = k.shape[1], k.shape[2]
    G = nH // nKV
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    qg = np.asarray(q).reshape(B, nKV, G, S, hd)
    s = np.einsum("bkgsh,bkth->bkgst", qg, np.asarray(k)) * scale
    if softcap:
        s = softcap * np.tanh(s / softcap)
    kp = np.arange(L)
    mask = kp[None, None, :] <= np.asarray(qpos)[:, :, None]
    if window:
        mask &= (np.asarray(qpos)[:, :, None] - kp[None, None, :]) < window
    s = np.where(mask[:, None, None, :, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bkgst,bkth->bkgsh", p, np.asarray(v))
    return out.reshape(B, nH, S, hd)


@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_flash_matches_materialized(chunk):
    q, k, v = _mk(L=40)  # L not a multiple of chunk for chunk=16,64
    qpos = jnp.asarray([[3, 5, 8, 11, 20, 39], [0, 1, 2, 3, 4, 5]])
    got = np.asarray(llama.flash_attention(q, k, v, qpos, chunk=chunk))
    ref = _materialized(q, k, v, qpos)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_flash_softcap_and_window():
    q, k, v = _mk(L=64)
    qpos = jnp.asarray([[10, 20, 30, 40, 50, 63], [5, 6, 7, 8, 9, 10]])
    got = np.asarray(llama.flash_attention(
        q, k, v, qpos, logit_softcap=30.0, sliding_window=12, chunk=16
    ))
    ref = _materialized(q, k, v, qpos, softcap=30.0, window=12)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_cached_attention_dispatches_flash_consistently():
    """Serving attention at L >= 2*FLASH_CHUNK must match the masked path."""
    B, nH, nKV, S, hd = 2, 4, 2, 1, 16
    L = 2 * llama.FLASH_CHUNK
    q = jnp.asarray(RNG.normal(size=(B, nH, S, hd)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    lengths = jnp.asarray([100, 999], jnp.int32)
    got = np.asarray(qmodel._cached_attention(q, k, v, lengths))
    qpos = np.asarray(lengths)[:, None] + np.arange(S)[None, :]
    ref = _materialized(q, k, v, qpos)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_long_forward_uses_flash_and_matches_short_blocks():
    """Full forward at S >= 2*FLASH_CHUNK equals block-by-block computation
    with the masked path (same model, shorter chunks through the KV cache)."""
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=4096,
    )
    params = llama.init_params(cfg, seed=5)
    S = 2 * llama.FLASH_CHUNK
    ids = RNG.integers(0, 64, size=(1, S))
    full = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))  # flash path
    # reference: cached forward in two sub-chunks (masked path, L small.. use
    # cache of exactly S but chunked queries of 512 < 2*FLASH_CHUNK each)
    cache = qmodel.init_cache(cfg, 1, S, dtype=jnp.float32)
    logits = []
    for i in range(0, S, 512):
        lg, cache = qmodel.forward_cached(params, cfg, jnp.asarray(ids[:, i:i+512]), cache)
        logits.append(np.asarray(lg))
    np.testing.assert_allclose(full[0, -1], logits[-1][0], rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("lens", [[100, 999], [5, 5], [1023, 7]])
def test_flash_dynamic_length_matches_full_scan(lens):
    """while_loop length-aware decode must equal the full-ring scan."""
    B, nH, nKV, S, hd, L = 2, 4, 2, 1, 16, 2048
    q = jnp.asarray(RNG.normal(size=(B, nH, S, hd)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, nKV, L, hd)).astype(np.float32))
    qpos = jnp.asarray(np.asarray(lens)[:, None], jnp.int32)
    full = np.asarray(llama.flash_attention(q, k, v, qpos, chunk=256))
    dyn = np.asarray(llama.flash_attention(q, k, v, qpos, chunk=256,
                                           dynamic_length=True))
    np.testing.assert_allclose(dyn, full, rtol=1e-6, atol=1e-6)
