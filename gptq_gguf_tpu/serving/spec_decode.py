"""Speculative decoding: a small draft model proposes, the target verifies.

llama.cpp ships this as `llama-speculative` (part of the inference runtime
the reference delegates to); this is the TPU-engine equivalent for greedy
decoding. The draft proposes ``draft_k`` tokens autoregressively; the target
scores the whole proposal block in ONE forward (``all_logits=True``) and the
longest matching prefix is committed plus the target's own next token
(correction on mismatch, bonus when everything matched). Output is
token-for-token identical to plain greedy decoding with the target — the
draft only changes wall-clock, never content.

Cache rollback costs nothing: KV entries past ``cache.lengths`` are masked
out of attention and overwritten by later writes, so rejecting draft tokens
is a lengths-counter reset, not a copy.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import model as qmodel

__all__ = ["generate_speculative"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _step_last(params, cfg, ids, cache):
    logits, cache = qmodel.forward_cached(params, cfg, ids, cache)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _step_all(params, cfg, ids, cache):
    logits, cache = qmodel.forward_cached(params, cfg, ids, cache,
                                          all_logits=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _feed(params, cfg, ids, cache):
    _, cache = qmodel.forward_cached(params, cfg, ids, cache)
    return cache


def _reset_len(cache, n: int):
    return cache._replace(lengths=jnp.full_like(cache.lengths, n))


def generate_speculative(
    target_params: Dict[str, Any],
    target_cfg,
    draft_params: Dict[str, Any],
    draft_cfg,
    prompts: Sequence[np.ndarray],
    max_new_tokens: int = 32,
    *,
    draft_k: int = 4,
    eos_token_id: Optional[int] = None,
    max_len: Optional[int] = None,
    collect_stats: Optional[dict] = None,
) -> List[List[int]]:
    """Greedy speculative generation; one prompt per independent pass.

    Returns exactly what ``engine.generate(target_params, ...)`` returns at
    temperature 0. ``collect_stats`` (optional dict) receives
    ``proposed``/``accepted`` totals for acceptance-rate reporting.
    """
    outs: List[List[int]] = []
    proposed = accepted_total = 0
    for prompt in prompts:
        prompt = np.atleast_1d(np.asarray(prompt)).reshape(-1).astype(np.int32)
        cap = max_len or (len(prompt) + max_new_tokens + draft_k + 2)
        t_cache = qmodel.init_cache(target_cfg, 1, cap, dtype=target_cfg.dtype)
        d_cache = qmodel.init_cache(draft_cfg, 1, cap, dtype=draft_cfg.dtype)

        ids = jnp.asarray(prompt[None, :])
        nxt, t_cache = _step_last(target_params, target_cfg, ids, t_cache)
        next_tok = int(nxt[0])
        # the draft's cache must always hold committed[:-1]
        d_cache = _feed(draft_params, draft_cfg, ids[:, :-1], d_cache) \
            if len(prompt) > 1 else d_cache
        d_len = len(prompt) - 1
        committed = list(map(int, prompt))

        out = [next_tok]
        committed.append(next_tok)
        while len(out) < max_new_tokens and next_tok != eos_token_id:
            k = min(draft_k, max_new_tokens - len(out) - 1)
            if k <= 0:  # one plain target step finishes the budget
                nxt, t_cache = _step_last(
                    target_params, target_cfg,
                    jnp.asarray([[next_tok]], jnp.int32), t_cache)
                next_tok = int(nxt[0])
                out.append(next_tok)
                committed.append(next_tok)
                continue
            # draft catch-up: consume committed tokens it has not cached yet
            missing = committed[d_len:-1]
            if missing:
                d_cache = _feed(draft_params, draft_cfg,
                                jnp.asarray([missing], jnp.int32), d_cache)
                d_len += len(missing)
            # draft proposes k tokens continuing from next_tok
            proposals: List[int] = []
            d_in = next_tok
            for _ in range(k):
                nx, d_cache = _step_last(
                    draft_params, draft_cfg,
                    jnp.asarray([[d_in]], jnp.int32), d_cache)
                d_in = int(nx[0])
                proposals.append(d_in)
            # target verifies the whole block in one forward
            block = [next_tok] + proposals
            preds, t_cache = _step_all(
                target_params, target_cfg,
                jnp.asarray([block], jnp.int32), t_cache)
            preds = [int(x) for x in np.asarray(preds[0])]  # k+1 greedy picks
            acc = 0
            while acc < k and proposals[acc] == preds[acc]:
                acc += 1
            commit = proposals[:acc] + [preds[acc]]
            proposed += k
            accepted_total += acc
            # roll the target back past the rejected tail; the bonus token
            # is deliberately NOT cached (it is next round's input)
            t_cache = _reset_len(t_cache, len(committed) + acc)
            # draft validity: it cached [next_tok, p1..p_{k-1}]; the prefix
            # matching the new committed stream stays
            d_len += 1 + min(acc, k - 1)
            d_cache = _reset_len(d_cache, d_len)
            if eos_token_id is not None and eos_token_id in commit:
                commit = commit[:commit.index(eos_token_id) + 1]
            out.extend(commit)
            committed.extend(commit)
            next_tok = commit[-1]
        outs.append(out[:max_new_tokens])
    if collect_stats is not None:
        collect_stats["proposed"] = proposed
        collect_stats["accepted"] = accepted_total
    return outs
