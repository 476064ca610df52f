"""Perplexity evaluation.

Replicates the reference's running-mean NLL exactly
(evopress/src/metrics.py:10-37 == eval/src/metrics.py): per batch, the mean
cross-entropy over shifted tokens is folded into a running mean weighted by
token counts; perplexity is exp of the final mean. Matching this estimator
(rather than a plain token-mean) matters for reproducing published numbers
when batches differ in size.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.llama import LlamaConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_nll(params, ids: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Mean next-token NLL of one (B, S) batch, float32."""
    logits = llama.forward(params, ids, cfg)  # (B, S, V) f32
    shift_logits = logits[:, :-1, :]
    shift_labels = ids[:, 1:]
    logz = jax.scipy.special.logsumexp(shift_logits, axis=-1)
    tok = jnp.take_along_axis(shift_logits, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - tok)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_nll_serving(params, ids: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """_batch_nll through the QUANTIZED serving forward (fused dequant
    kernels, weights stay packed): the GGUF-direct path for models whose
    dense f32 dequant exceeds HBM (8B f32 = 32 GB on a 16 GB v5e)."""
    from ..serving import model as qmodel

    B, S = ids.shape
    cache = qmodel.init_cache(cfg, B, S, dtype=cfg.dtype)
    logits, _ = qmodel.forward_cached(params, cfg, ids, cache,
                                      all_logits=True)
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = ids[:, 1:]
    logz = jax.scipy.special.logsumexp(shift_logits, axis=-1)
    tok = jnp.take_along_axis(shift_logits, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - tok)


def compute_perplexity(
    params,
    cfg: LlamaConfig,
    data: Sequence[np.ndarray],
    batch_size: int = 1,
    serving: bool = False,
) -> float:
    """Reference-exact running-mean perplexity (metrics.py:10-37).

    serving=True scores through the quantized serving forward
    (_batch_nll_serving) instead of the dense llama.forward."""
    nll = _batch_nll_serving if serving else _batch_nll
    nll_running = 0.0
    tokens_processed = 0
    data = [np.atleast_2d(np.asarray(d)) for d in data]
    for i in range(0, len(data), batch_size):
        ids = np.concatenate(data[i : i + batch_size], axis=0)
        loss = float(nll(params, jnp.asarray(ids), cfg))
        n_new = ids[:, 1:].size
        a = n_new / (tokens_processed + n_new)
        b = tokens_processed / (tokens_processed + n_new)
        nll_running = a * loss + b * nll_running
        tokens_processed += n_new
    return float(np.exp(nll_running))


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"))
def _batch_kl(params, ids: jax.Array, target_logits: jax.Array, cfg: LlamaConfig, chunk: int = 1024):
    """Mean KL(student || teacher is target) over shifted positions, batchmean
    per 1024-token chunk like the reference (metrics.py:41-86)."""
    logits = llama.forward(params, ids, cfg)[:, :-1, :]
    targets = target_logits[:, :-1, :]
    logp = jax.nn.log_softmax(logits, axis=-1)
    logq = jax.nn.log_softmax(targets, axis=-1)
    # F.kl_div(input=logp, target=logq, log_target=True) = sum q * (logq - logp)
    kl = jnp.sum(jnp.exp(logq) * (logq - logp), axis=-1)  # (B, S-1)
    return jnp.mean(kl), kl


def compute_kl_div(
    params,
    cfg: LlamaConfig,
    data: Sequence[np.ndarray],
    target_logits: Sequence[np.ndarray],
) -> float:
    """KL divergence against cached teacher logits (metrics.py:41-86).

    The reference normalizes per-chunk by element count including the vocab
    axis (batchmean over B*S*V elements then scaled) — net effect with its
    running mean is the token-mean KL divided by vocab size; we return the
    token-mean KL (identical ranking, saner units)."""
    total = 0.0
    count = 0
    for ids, tl in zip(data, target_logits):
        ids = np.atleast_2d(np.asarray(ids))
        _, kl = _batch_kl(params, jnp.asarray(ids), jnp.asarray(tl), cfg)
        kl = np.asarray(kl)
        total += float(kl.sum())
        count += kl.size
    return total / max(count, 1)


def compute_sparse_kl_div(
    params,
    cfg: LlamaConfig,
    data: Sequence[np.ndarray],
    sparse_targets: Sequence[Any],
) -> float:
    """Top-k sparse KL (metrics.py:89-119): teacher logits restricted to the
    teacher's top-k token ids per position."""
    total = 0.0
    count = 0
    for ids, (t_logits, t_ids) in zip(data, sparse_targets):
        ids = np.atleast_2d(np.asarray(ids))
        logits = llama.forward(params, jnp.asarray(ids), cfg)
        g = jnp.take_along_axis(logits, jnp.asarray(t_ids), axis=-1)[:, :-1, :]
        t = jnp.asarray(t_logits)[:, :-1, :]
        logp = jax.nn.log_softmax(g, axis=-1)
        logq = jax.nn.log_softmax(t, axis=-1)
        kl = jnp.sum(jnp.exp(logq) * (logq - logp), axis=-1)
        kl = np.asarray(kl)
        total += float(kl.sum())
        count += kl.size
    return total / max(count, 1)


def compute_perplexity_layer_per_layer(
    params,
    cfg: LlamaConfig,
    data: Sequence[np.ndarray],
    batch_size: int = 1,
) -> float:
    """Memory-bounded perplexity: activations stream block by block with host
    offload between blocks (reference metrics.py:122-192). Device memory is
    bounded by one transformer block + one batch of activations.
    """
    from ..quant.calibrate import _propagate_step

    data = [np.atleast_2d(np.asarray(d)) for d in data]
    batches = [
        np.concatenate(data[i : i + batch_size], axis=0)
        for i in range(0, len(data), batch_size)
    ]
    S = batches[0].shape[1]
    positions = jnp.arange(S)[None, :]
    cos1, sin1 = llama.rope_cos_sin(cfg, positions)

    xs = [np.asarray(llama.embed_forward(params, jnp.asarray(b), cfg)) for b in batches]
    for li, layer in enumerate(params["layers"]):
        new_xs = []
        for x in xs:
            b = x.shape[0]
            cos = jnp.broadcast_to(cos1, (b, S, cos1.shape[-1]))
            sin = jnp.broadcast_to(sin1, (b, S, sin1.shape[-1]))
            mask = llama.causal_mask(b, S)
            new_xs.append(np.asarray(_propagate_step(layer, jnp.asarray(x), cos, sin, mask, cfg, li)))
        xs = new_xs

    nll_running = 0.0
    tokens_processed = 0
    for ids, x in zip(batches, xs):
        logits = llama.head_forward(params, jnp.asarray(x), cfg)
        shift_logits = logits[:, :-1, :]
        shift_labels = jnp.asarray(ids[:, 1:])
        logz = jax.scipy.special.logsumexp(shift_logits, axis=-1)
        tok = jnp.take_along_axis(shift_logits, shift_labels[..., None], axis=-1)[..., 0]
        loss = float(jnp.mean(logz - tok))
        n_new = ids[:, 1:].size
        a = n_new / (tokens_processed + n_new)
        b_ = tokens_processed / (tokens_processed + n_new)
        nll_running = a * loss + b_ * nll_running
        tokens_processed += n_new
    return float(np.exp(nll_running))
