"""Per-slot batched sampling for the serving engine.

llama.cpp's sampler chain (common/sampling.cpp: penalties -> top-k ->
top-p -> min-p -> temperature -> dist) runs per sequence in C++; the
TPU-native equivalent is ONE jitted program over the whole (B, V) logits
batch with per-slot parameter arrays, so a continuous batch mixing greedy
and sampled requests — each with its own temperature/top-k/top-p/min-p/
penalty settings — stays a single cached XLA program per step. The
reference itself has no sampler (its deployment target is llama.cpp,
SURVEY.md §0); semantics here follow llama.cpp:

- repetition_penalty: multiplicative on seen tokens (positive logits
  divided, negative multiplied), llama.cpp penalties sampler.
- presence/frequency penalties: OpenAI-style subtractive terms from the
  per-slot token counts (prompt + generated so far).
- top_k <= 0 disables; top_p keeps the smallest prefix of the sorted
  distribution with cumulative probability >= top_p (always >= 1 token);
  min_p keeps tokens with prob >= min_p * max_prob.
- temperature <= 0 means greedy (argmax of the penalized logits).

One descending sort of the scaled logits serves top-k, top-p and min-p
thresholds; everything else is elementwise, so the sampler adds a single
(B, V) sort + softmax on top of the decode step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SamplingParams", "GREEDY", "SlotSampling", "init_state",
           "set_slot", "sample", "sample_step", "sample_slot"]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling settings (llama.cpp sampler-chain analogue)."""

    temperature: float = 0.0   # <= 0 -> greedy
    top_k: int = 0             # <= 0 -> disabled
    top_p: float = 1.0
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None  # per-request RNG seed (reproducible sampling)

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0

    @property
    def is_trivial(self) -> bool:
        """Greedy with no penalties: the plain argmax decode path applies."""
        return (self.is_greedy and self.presence_penalty == 0.0
                and self.frequency_penalty == 0.0
                and self.repetition_penalty == 1.0)


GREEDY = SamplingParams()


class SlotSampling(NamedTuple):
    """Device-resident per-slot sampler state (one row per slot)."""

    temperature: jax.Array  # (B,) f32
    top_k: jax.Array        # (B,) i32
    top_p: jax.Array        # (B,) f32
    min_p: jax.Array        # (B,) f32
    presence: jax.Array     # (B,) f32
    frequency: jax.Array    # (B,) f32
    repetition: jax.Array   # (B,) f32
    counts: jax.Array       # (B, V) i32 token counts (prompt + generated)
    keys: jax.Array         # (B, 2) u32 per-slot PRNG keys (seeded at admit)


def init_state(num_slots: int, vocab_size: int) -> SlotSampling:
    def z():  # distinct buffers: _set_slot donates the whole state
        return jnp.zeros((num_slots,), jnp.float32)

    return SlotSampling(
        temperature=z(), top_k=jnp.zeros((num_slots,), jnp.int32),
        top_p=jnp.ones((num_slots,), jnp.float32), min_p=z(),
        presence=z(), frequency=z(),
        repetition=jnp.ones((num_slots,), jnp.float32),
        counts=jnp.zeros((num_slots, vocab_size), jnp.int32),
        keys=jnp.zeros((num_slots, 2), jnp.uint32),
    )


@functools.partial(jax.jit, donate_argnames=("state",))
def _set_slot(state: SlotSampling, slot, temp, top_k, top_p, min_p,
              presence, frequency, repetition, counts_row,
              key_row) -> SlotSampling:
    return SlotSampling(
        temperature=state.temperature.at[slot].set(temp),
        top_k=state.top_k.at[slot].set(top_k),
        top_p=state.top_p.at[slot].set(top_p),
        min_p=state.min_p.at[slot].set(min_p),
        presence=state.presence.at[slot].set(presence),
        frequency=state.frequency.at[slot].set(frequency),
        repetition=state.repetition.at[slot].set(repetition),
        counts=state.counts.at[slot].set(counts_row),
        keys=state.keys.at[slot].set(key_row),
    )


def set_slot(state: SlotSampling, slot: int, sp: SamplingParams,
             prompt: Optional[np.ndarray] = None,
             fallback_seed: int = 0) -> SlotSampling:
    """Reset one slot's row for a newly admitted request (single jitted
    dispatch — eager per-field updates cost ~15ms each over the relay).
    The slot's PRNG key comes from sp.seed (reproducible sampling) or
    fallback_seed (engine-assigned, e.g. the request uid)."""
    V = state.counts.shape[1]
    counts = np.zeros((V,), np.int32)
    if prompt is not None and len(prompt):
        counts = np.bincount(
            np.asarray(prompt, np.int64) % V, minlength=V).astype(np.int32)
    seed = sp.seed if sp.seed is not None else fallback_seed
    key_row = np.asarray(
        jax.random.key_data(jax.random.PRNGKey(seed)), np.uint32)
    return _set_slot(
        state, slot, np.float32(sp.temperature), np.int32(sp.top_k),
        np.float32(sp.top_p), np.float32(sp.min_p),
        np.float32(sp.presence_penalty), np.float32(sp.frequency_penalty),
        np.float32(sp.repetition_penalty), counts, key_row)


@functools.partial(jax.jit, donate_argnames=("state",))
def sample_slot(logits_row: jax.Array, state: SlotSampling, slot
                ) -> Tuple[jax.Array, SlotSampling]:
    """Sample one token for a single slot using (and advancing) its own
    key (the prefill's first generated token, which otherwise would always
    be the argmax)."""
    new_key, use = jax.random.split(state.keys[slot])
    one = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0), state)
    tok = sample(logits_row[None, :], one, use)[0]
    return tok, state._replace(keys=state.keys.at[slot].set(new_key))


def sample_step(logits: jax.Array, state: SlotSampling
                ) -> Tuple[jax.Array, SlotSampling]:
    """One decode-time sampling step driven by the per-slot keys
    (reproducible per request via SamplingParams.seed). Returns
    ((B,) tokens, state with advanced keys)."""
    splits = jax.vmap(jax.random.split)(state.keys)  # (B, 2, 2)
    masked, penalized, greedy = _chain(logits, state)
    sampled = jax.vmap(jax.random.categorical)(splits[:, 1], masked)
    toks = jnp.where(greedy, jnp.argmax(penalized, axis=-1),
                     sampled).astype(jnp.int32)
    return toks, state._replace(keys=splits[:, 0])


def sample(logits: jax.Array, state: SlotSampling, key: jax.Array) -> jax.Array:
    """One sampling step over (B, V) logits with a single shared key.
    Returns (B,) int32 tokens. Pure function of the arrays."""
    masked, penalized, greedy = _chain(logits, state)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(greedy, jnp.argmax(penalized, axis=-1),
                     sampled).astype(jnp.int32)


def _chain(logits: jax.Array, state: SlotSampling):
    """The sampler chain up to (but excluding) the random draw: returns
    (masked scaled logits, penalized logits, per-row greedy flags)."""
    V = logits.shape[-1]
    l = logits.astype(jnp.float32)
    counts = state.counts.astype(jnp.float32)
    seen = counts > 0
    # llama.cpp repetition penalty: seen & positive -> /p, seen & negative -> *p
    rp = state.repetition[:, None]
    l = jnp.where(seen, jnp.where(l > 0, l / rp, l * rp), l)
    l = (l - jnp.where(seen, state.presence[:, None], 0.0)
         - counts * state.frequency[:, None])

    greedy = state.temperature <= 0.0
    t = jnp.where(greedy, 1.0, state.temperature)[:, None]
    s = l / t
    sorted_desc = -jnp.sort(-s, axis=-1)
    # top-k: threshold at the k-th largest (ties widen the pool)
    k = jnp.where(state.top_k <= 0, V, jnp.clip(state.top_k, 1, V))
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    keep = s >= kth
    # top-p over the sorted distribution (exclusive cumsum < p always keeps
    # the first token; the kept set's inclusive mass is >= p like llama.cpp)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    nkeep = jnp.maximum(
        jnp.sum((cum - probs) < state.top_p[:, None], axis=-1), 1)
    pth = jnp.take_along_axis(sorted_desc, (nkeep - 1)[:, None], axis=-1)
    keep &= s >= pth
    # min-p: prob >= min_p * max_prob  <=>  s >= s_max + log(min_p)
    keep &= s >= (sorted_desc[:, :1]
                  + jnp.log(jnp.maximum(state.min_p, 1e-38))[:, None])

    masked = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
    return masked, l, greedy
