"""Generation engine: jitted prefill/decode steps + continuous batching.

New capability relative to the reference (whose deployment target is
llama.cpp, SURVEY.md §0): a slot-based continuous-batching scheduler over
the KV-cached quantized model. B fixed slots; finished requests free their
slot and queued requests are prefilled into it while other slots keep
decoding — the standard orca-style loop expressed with fully static shapes
so every step is one cached XLA program.

Round-1 scope: contiguous per-slot KV (max_len per slot); block-paged KV and
a flash-decode kernel are the planned upgrades.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from . import model as qmodel
from . import sampling
from .model import KVCache
from .sampling import GREEDY, SamplingParams


# multi_step="auto" block-size caps (see ContinuousBatchingEngine.__init__):
# 128 matches the scored bench mode (round-5 k sweep: 769 tok/s at k=128 vs
# 746 at k=64 on the relay chip); 8 bounds queue admit latency when requests
# are waiting for a slot, and the HTTP runner caps at 8 while SSE streams
# are attached.
MULTI_STEP_AUTO_CAP = 128
MULTI_STEP_ADMIT_CAP = 8


def _kv_dtype(kv_quantized) -> Optional[str]:
    """Normalize the engine-facing kv_quantized knob: bools keep the legacy
    int8 meaning, strings name a cache dtype ("bf16" | "int8" | "int4")."""
    if isinstance(kv_quantized, str):
        return kv_quantized
    return "int8" if kv_quantized else None


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_step(params, cfg: LlamaConfig, tokens: jax.Array, cache: KVCache):
    # NOTE: no cache donation — measured 15% slower decode steps with a
    # donated ring (in-place aliasing serializes the scatter against the
    # rest of the step on this target); memory headroom is ample
    """One greedy decode step for all slots. tokens: (B,)."""
    logits, cache = qmodel.forward_cached(params, cfg, tokens[:, None], cache)
    next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_tokens, logits, cache


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _decode_steps_scan(params, cfg: LlamaConfig, tokens: jax.Array,
                       cache: KVCache, k: int):
    """k greedy decode steps in ONE program via lax.scan: one dispatch and
    one (k, B) token readback instead of k round trips. On dispatch-latency
    bound targets (this environment's relay adds ~25 ms per program round
    trip) this is the difference between serving at device speed and
    serving at network speed; on bare TPU it still cuts per-step dispatch
    overhead k-fold. EOS handling happens host-side after the block (at
    most k-1 wasted slot-steps per finished request)."""

    def body(carry, _):
        toks, cache = carry
        logits, cache = qmodel.forward_cached(params, cfg, toks[:, None], cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (tokens, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=k)
    return tokens, toks, cache  # toks: (k, B)


@functools.partial(jax.jit, static_argnames=("cfg", "k"),
                   donate_argnames=("sampler",))
def _sampled_decode_steps_scan(params, cfg: LlamaConfig, tokens, cache,
                               sampler: sampling.SlotSampling, k: int):
    """k sampled decode steps in one program (scan over the per-slot
    sampler chain; penalties/keys stay on device across the block)."""

    def body(carry, _):
        toks, cache, smp = carry
        counts = smp.counts.at[jnp.arange(toks.shape[0]), toks].add(1)
        smp = smp._replace(counts=counts)
        logits, cache = qmodel.forward_cached(params, cfg, toks[:, None], cache)
        nxt, smp = sampling.sample_step(logits, smp)
        return (nxt, cache, smp), nxt

    (tokens, cache, sampler), toks = jax.lax.scan(
        body, (tokens, cache, sampler), None, length=k)
    return tokens, toks, sampler, cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_step_shifted(params, cfg: LlamaConfig, tokens, cache: KVCache,
                         rope_delta):
    """Greedy decode with per-slot rope offsets: qwen2-vl text after an
    image resumes at max(position)+1, which trails the cache index by a
    per-request delta (HF rope_deltas). Text-only mrope == NeoX, so plain
    shifted positions are exact."""
    pos = (cache.lengths + rope_delta)[:, None]
    logits, cache = qmodel.forward_cached(
        params, cfg, tokens[:, None], cache, rope_positions=pos)
    next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_tokens, logits, cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sample_step(params, cfg: LlamaConfig, tokens, cache, key, temperature):
    logits, cache = qmodel.forward_cached(params, cfg, tokens[:, None], cache)
    key, sub = jax.random.split(key)
    next_tokens = jax.random.categorical(sub, logits / jnp.maximum(temperature, 1e-6))
    return next_tokens.astype(jnp.int32), logits, cache


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("sampler",))
def _sampled_decode_step(params, cfg: LlamaConfig, tokens, cache,
                         sampler: sampling.SlotSampling, rope_delta=None):
    """Decode step through the per-slot sampler chain. The fed tokens are
    counted here (each generated token is fed exactly once; prompt tokens
    were counted at admit), keeping the penalty state — and the per-slot
    PRNG keys (SamplingParams.seed reproducibility) — on device."""
    counts = sampler.counts.at[
        jnp.arange(tokens.shape[0]), tokens].add(1)
    sampler = sampler._replace(counts=counts)
    rope_pos = (None if rope_delta is None
                else (cache.lengths + rope_delta)[:, None])
    logits, cache = qmodel.forward_cached(params, cfg, tokens[:, None], cache,
                                          rope_positions=rope_pos)
    next_tokens, sampler = sampling.sample_step(logits, sampler)
    return next_tokens, logits, sampler, cache


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_logprobs(logits, chosen, k: int):
    """log-softmax top-k + the chosen token's logprob, on device (a host
    transfer of the full (B, V) logits would be 100x the data)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(lp, k)
    chosen_lp = jnp.take_along_axis(lp, chosen[:, None], axis=-1)[:, 0]
    return vals, ids, chosen_lp


_PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket_len(n: int, max_len: Optional[int] = None) -> int:
    for b in _PREFILL_BUCKETS:
        if n <= b and (max_len is None or b <= max_len):
            return b
    return n


def _pad_prompt(prompt: np.ndarray, max_len: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Right-pad to the next length bucket so prefill compiles once per
    bucket, not once per prompt length (round-1 weak spot: per-length
    compiles are unusable on slow-compile targets)."""
    n = len(prompt)
    b = max(_bucket_len(n, max_len), n)
    if b == n:
        return prompt, n
    out = np.zeros((b,), prompt.dtype)
    out[:n] = prompt
    return out, n


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _prefill_slot(params, cfg: LlamaConfig, prompt: jax.Array, cache, slot,
                  n_valid=None, start=0, soft=None, soft_mask=None,
                  rope_pos=None, spans=None):
    """Prefill one slot with a (1, S) prompt; other slots untouched.

    prompt may be right-padded; n_valid is the true token count (defaults
    to S). Compiles once per padded bucket length. Works for both the bf16
    and the int8-quantized cache. ``start`` places the new tokens at
    positions start..start+S (prefix-cache reuse: the slot already holds
    KV for the first ``start`` tokens of the request). ``soft``/``soft_mask``
    ((1, S, H) / (1, S)) splice multimodal soft tokens over the embeddings
    at the masked positions (VLM requests)."""
    S = prompt.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), S, jnp.int32)
    else:
        n_valid = jnp.asarray(n_valid, jnp.int32).reshape(1)
    start = jnp.asarray(start, jnp.int32).reshape(1)

    def take(arrs):
        return [jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0) for a in arrs]

    qcls = None
    if isinstance(cache, qmodel.KVCacheQ8):
        qcls = qmodel.KVCacheQ8
    elif isinstance(cache, qmodel.KVCacheQ4):
        qcls = qmodel.KVCacheQ4
    if qcls is not None:
        sub = qcls(take(cache.k), take(cache.v),
                   take(cache.k_s), take(cache.v_s), start)
    else:
        sub = KVCache(take(cache.k), take(cache.v), start)
    logits, sub = qmodel.forward_cached(
        params, cfg, prompt, sub, n_valid=n_valid,
        embeds_override=soft, override_mask=soft_mask,
        rope_positions=rope_pos, bidir_spans=spans)

    def put(full, subs):
        zero = jnp.zeros((), jnp.int32)
        return [
            jax.lax.dynamic_update_slice(f, sl, (slot,) + (zero,) * (f.ndim - 1))
            for f, sl in zip(full, subs)
        ]

    lengths = cache.lengths.at[slot].set(start[0] + n_valid[0])
    next_token = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
    if qcls is not None:
        out = qcls(put(cache.k, sub.k), put(cache.v, sub.v),
                   put(cache.k_s, sub.k_s), put(cache.v_s, sub.v_s),
                   lengths)
    else:
        out = KVCache(put(cache.k, sub.k), put(cache.v, sub.v), lengths)
    return next_token, logits[0], out


def generate(
    params,
    cfg: LlamaConfig,
    prompts: Sequence[np.ndarray],
    max_new_tokens: int = 32,
    *,
    max_len: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    temperature: float = 0.0,
    seed: int = 0,
    kv_quantized: bool = False,
) -> List[List[int]]:
    """Batch generation (greedy or sampled). Prompts may differ in length.

    kv_quantized: False/True (legacy int8 switch) or a kv_dtype string
    ("bf16" | "int8" | "int4")."""
    B = len(prompts)
    prompts = [np.atleast_1d(np.asarray(p)).reshape(-1) for p in prompts]
    if any(len(p) == 0 for p in prompts):
        # an empty prompt otherwise dies deep in XLA with an opaque gather
        # error (a GGUF tokenizer can return [] for out-of-vocab text)
        raise ValueError("empty prompt: every prompt needs >= 1 token")
    max_prompt = max(len(p) for p in prompts)
    max_len = max_len or (max_prompt + max_new_tokens)
    cache = qmodel.init_cache(cfg, B, max_len, dtype=jnp.bfloat16,
                              kv_dtype=_kv_dtype(kv_quantized))

    cur_tokens = np.zeros((B,), np.int32)
    for b, p in enumerate(prompts):
        padded, n = _pad_prompt(p, max_len)
        tok, _, cache = _prefill_slot(params, cfg, jnp.asarray(padded)[None, :], cache, b, n)
        cur_tokens[b] = int(tok)

    outputs: List[List[int]] = [[int(t)] for t in cur_tokens]
    done = [False] * B
    key = jax.random.PRNGKey(seed)
    tokens = jnp.asarray(cur_tokens)

    def record(host: np.ndarray) -> None:
        for b in range(B):
            if not done[b]:
                outputs[b].append(int(host[b]))
                if eos_token_id is not None and host[b] == eos_token_id:
                    done[b] = True

    # Pipelined decode (JetStream-style): token feedback stays on device, so
    # step N+1 is dispatched before step N's tokens are read back — the relay
    # round-trip and Python bookkeeping overlap the device step instead of
    # idling it. Emission (and therefore the EOS early-exit) trails by one
    # step; the at-most-one extra dispatched step only appends tokens for
    # slots that are already done, which record() ignores.
    pending: deque = deque()
    for _ in range(max_new_tokens - 1):
        if all(done):
            break
        if temperature > 0:
            key, sub = jax.random.split(key)
            tokens, _, cache = _sample_step(params, cfg, tokens, cache, sub, temperature)
        else:
            tokens, _, cache = _decode_step(params, cfg, tokens, cache)
        pending.append(tokens)
        if len(pending) > 1:
            record(np.asarray(pending.popleft()))
    while pending:  # drain unconditionally: record() ignores done slots
        record(np.asarray(pending.popleft()))
    return outputs


# ---------------------------------------------------------------------------
# Continuous batching
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray
    max_new_tokens: int
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_at: float = dataclasses.field(default_factory=time.time)
    finished_at: Optional[float] = None
    sampling: SamplingParams = GREEDY
    finish_reason: Optional[str] = None  # "stop" (eos) or "length"
    logprobs: int = 0  # top-k logprobs per generated token (0 = off)
    # one (chosen_logprob, top_ids, top_logprobs) triple per output token
    logprob_data: List[Tuple[float, List[int], List[float]]] = \
        dataclasses.field(default_factory=list)
    # VLM: (n_soft, H) soft embeddings for the image-token positions of
    # ``prompt`` (positions where prompt == soft_token_id)
    soft_embeds: Optional[np.ndarray] = None
    soft_token_id: Optional[int] = None
    # mrope (qwen2-vl): (3, len(prompt)) t/h/w position streams + the first
    # decode position (max(position)+1, HF rope_deltas semantics)
    rope_positions: Optional[np.ndarray] = None
    rope_next: Optional[int] = None
    # gemma3: contiguous image-token runs attend bidirectionally
    soft_bidir: bool = False


class ContinuousBatchingEngine:
    """Slot-based continuous batching over the quantized model.

    submit() enqueues requests; step() runs one decode step for all active
    slots, retiring finished requests and prefilling free slots from
    the queue. All device programs have static shapes (one decode program,
    one prefill program per prompt-length bucket).
    """

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        num_slots: int = 8,
        max_len: int = 2048,
        eos_token_id: Optional[int] = None,
        kv_quantized: bool = False,
        temperature: float = 0.0,
        seed: int = 0,
        multi_step="auto",
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_len = max_len
        self.eos = eos_token_id
        self.temperature = temperature
        # multi_step > 1: decode in k-step scan blocks (one program dispatch
        # + one (k, B) readback per k tokens). On this environment's relay
        # every program execution costs ~25 ms of serialized round trip, so
        # blocks are the difference between network-bound and device-bound
        # serving; on bare TPU they still amortize dispatch. Costs: EOS is
        # detected at block granularity (<= k-1 wasted slot-steps per
        # finished request) and slot turnover waits for the block edge.
        #
        # "auto" (the default since round 5): pick the block size per step —
        # the largest power of two <= MULTI_STEP_AUTO_CAP that fits the
        # smallest remaining token budget among active slots and the cache
        # headroom. Greedy and pure-sampling chains scan fine; logprob and
        # rope-shifted requests fall back to single steps automatically.
        # Power-of-two bucketing bounds the number of compiled scan programs
        # at log2(cap). Round 4 shipped multi_step=1 by default, which on
        # this relay was 85x slower than the scored mode (VERDICT r4 #6).
        if multi_step == "auto":
            self.multi_step = 0  # sentinel: _auto_block picks per step
        else:
            self.multi_step = max(1, int(multi_step))
        # extra "auto" cap the serving layer can tighten at runtime, e.g.
        # the HTTP runner drops it to 8 while SSE streams are attached so
        # stream chunks stay interactive (tokens emit at block edges)
        self.auto_cap: Optional[int] = None
        # legacy engine-wide temperature becomes the default per-request
        # sampler; submit(sampling=...) overrides per request
        self.default_sampling = (
            SamplingParams(temperature=temperature) if temperature > 0
            else GREEDY)
        self.key = jax.random.PRNGKey(seed)
        self._seed_base = seed * 1000003  # per-request fallback seeds
        self.sampler = sampling.init_state(num_slots, cfg.vocab_size)
        self.cache = qmodel.init_cache(cfg, num_slots, max_len, dtype=jnp.bfloat16,
                                       kv_dtype=_kv_dtype(kv_quantized))
        self.tokens = jnp.zeros((num_slots,), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        # host-side mirror of cache.lengths (saves a device readback per
        # step and powers the multi_step block's out-of-cache checks)
        self._fill = np.zeros((num_slots,), np.int64)
        # per-slot token history whose KV currently occupies positions
        # 0..lengths-1; valid only until the slot sits idle through a decode
        # step (idle slots keep being written by the batched decode program)
        self.slot_hist: List[Optional[List[int]]] = [None] * num_slots
        # per-slot rope offset vs cache index (mrope/VLM requests)
        self.rope_delta = np.zeros((num_slots,), np.int32)
        self.queue: deque = deque()
        self._uid = 0
        self.completed: List[Request] = []
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 64,
               sampling_params: Optional[SamplingParams] = None,
               logprobs: int = 0,
               soft_embeds: Optional[np.ndarray] = None,
               soft_token_id: Optional[int] = None,
               rope_positions: Optional[np.ndarray] = None,
               rope_next: Optional[int] = None,
               soft_bidir: bool = False) -> int:
        self._uid += 1
        if np.asarray(prompt).size == 0:
            raise ValueError("empty prompt: every request needs >= 1 token")
        # the cache must hold at least one prompt token plus the new tokens
        max_new_tokens = min(max_new_tokens, self.max_len - 1)
        self.queue.append(Request(
            self._uid, np.asarray(prompt).reshape(-1), max_new_tokens,
            sampling=sampling_params or self.default_sampling,
            logprobs=int(logprobs),
            soft_embeds=soft_embeds, soft_token_id=soft_token_id,
            rope_positions=rope_positions, rope_next=rope_next,
            soft_bidir=bool(soft_bidir)))
        return self._uid

    @staticmethod
    def _note_logprobs(req: Request, tok, logits_row) -> None:
        k = 1 << max(req.logprobs - 1, 0).bit_length()  # bucket compiles
        vals, ids, chosen = _topk_logprobs(
            logits_row[None, :], jnp.asarray([tok], jnp.int32), k)
        req.logprob_data.append((
            float(chosen[0]),
            np.asarray(ids[0])[:req.logprobs].tolist(),
            np.asarray(vals[0])[:req.logprobs].tolist()))

    def _admit_into(self, slot: int, req: Request) -> None:
        """Prefill ``req`` into ``slot``, reusing any shared KV prefix the
        slot's previous occupant left behind (llama.cpp prompt-cache
        analogue: multi-turn chats re-send the conversation so far)."""
        keep = max(1, self.max_len - req.max_new_tokens)
        prompt = list(map(int, req.prompt[-keep:]))
        hist = self.slot_hist[slot]
        shared = 0
        if hist and req.soft_embeds is None and req.rope_positions is None:
            # soft-token requests skip prefix reuse: equal image-token ids
            # do not imply equal image embeddings
            limit = min(len(hist), len(prompt) - 1)
            while shared < limit and hist[shared] == prompt[shared]:
                shared += 1
        if shared:
            self.prefix_hits += 1
            self.prefix_tokens_reused += shared
        remainder = np.asarray(prompt[shared:], dtype=np.int64)
        padded, n = _pad_prompt(remainder, self.max_len)
        rope_pos = None
        if req.rope_positions is not None:
            rp = np.asarray(req.rope_positions)[:, -len(prompt):]
            buf = np.zeros((3, len(padded)), np.int32)
            buf[:, : rp.shape[1]] = rp
            rope_pos = jnp.asarray(buf)[:, None, :]  # (3, 1, S)
            self.rope_delta[slot] = np.int32(req.rope_next - len(prompt))
        else:
            self.rope_delta[slot] = 0
        soft = soft_mask = spans = None
        if req.soft_embeds is not None:
            mask = padded == req.soft_token_id
            rows = np.asarray(req.soft_embeds, np.float32)
            need = int(mask.sum())
            if need != len(rows):
                rows = rows[-need:]  # prompt tail-trim dropped leading ones
            buf = np.zeros((len(padded), rows.shape[-1]), np.float32)
            buf[mask] = rows
            soft = jnp.asarray(buf)[None]
            soft_mask = jnp.asarray(mask)[None]
            if req.soft_bidir:
                from .vlm import _image_spans

                spans = jnp.asarray(_image_spans(mask))[None, :]
        tok, logits, cache = _prefill_slot(
            self.params, self.cfg, jnp.asarray(padded)[None, :],
            self.cache, slot, n, start=shared, soft=soft,
            soft_mask=soft_mask, rope_pos=rope_pos, spans=spans,
        )
        self.cache = cache
        # the sampler row is reset on EVERY admit: a stale non-greedy row
        # would otherwise leak into a later trivial request through the
        # batched sampled-decode program
        self.sampler = sampling.set_slot(
            self.sampler, slot, req.sampling, np.asarray(prompt),
            fallback_seed=self._seed_base + req.uid)
        if not req.sampling.is_greedy:
            # the first generated token must honor the sampler too
            tok, self.sampler = sampling.sample_slot(
                logits, self.sampler, slot)
        self.tokens = self.tokens.at[slot].set(tok)
        self._fill[slot] = shared + n
        req.output.append(int(tok))
        if req.logprobs:
            self._note_logprobs(req, int(tok), logits)
        self.slot_req[slot] = req
        self.slot_hist[slot] = prompt

    def _admit(self) -> None:
        for slot in range(self.num_slots):
            if self.slot_req[slot] is None and self.queue:
                self._admit_into(slot, self.queue.popleft())

    def cancel(self, uid: int) -> bool:
        """Drop a queued or in-flight request (client disconnect / early
        stop). Frees the slot immediately; the KV it leaves stays reusable
        as a shared prefix for the next occupant."""
        for i, r in enumerate(self.queue):
            if r.uid == uid:
                del self.queue[i]
                return True
        for slot, r in enumerate(self.slot_req):
            if r is not None and r.uid == uid:
                r.done = True
                r.finish_reason = "cancelled"
                r.finished_at = time.time()
                self.slot_req[slot] = None
                self.slot_hist[slot] = None
                self.rope_delta[slot] = 0
                self._fill[slot] = 0
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))
                return True
        return False

    def step(self) -> int:
        """Admit + one decode step (or one multi_step block); returns the
        number of active slots."""
        self._admit()
        active = [s for s, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return 0
        shifted = bool(self.rope_delta.any())
        if (self.multi_step != 1 and not shifted
                and not any(self.slot_req[s].logprobs for s in active)):
            k = self.multi_step or self._auto_block(active)
            if k > 1:
                return self._step_block(active, k)
        fed = np.asarray(self.tokens)  # decode inputs land in the KV cache
        if any(not self.slot_req[s].sampling.is_trivial for s in active):
            self.tokens, logits, self.sampler, self.cache = _sampled_decode_step(
                self.params, self.cfg, self.tokens, self.cache, self.sampler,
                jnp.asarray(self.rope_delta) if shifted else None
            )
        elif shifted:
            self.tokens, logits, self.cache = _decode_step_shifted(
                self.params, self.cfg, self.tokens, self.cache,
                jnp.asarray(self.rope_delta)
            )
        else:
            self.tokens, logits, self.cache = _decode_step(
                self.params, self.cfg, self.tokens, self.cache
            )
        lp_slots = [s for s in active if self.slot_req[s].logprobs]
        if lp_slots:
            kmax = max(self.slot_req[s].logprobs for s in lp_slots)
            k = 1 << max(kmax - 1, 0).bit_length()
            vals, ids, chosen = _topk_logprobs(logits, self.tokens, k)
            vals, ids, chosen = (np.asarray(vals), np.asarray(ids),
                                 np.asarray(chosen))
            for s in lp_slots:
                n = self.slot_req[s].logprobs
                self.slot_req[s].logprob_data.append((
                    float(chosen[s]), ids[s, :n].tolist(),
                    vals[s, :n].tolist()))
        host = np.asarray(self.tokens)
        self._fill += 1
        lengths = self._fill
        for slot in range(self.num_slots):
            if self.slot_req[slot] is not None:
                if self.slot_hist[slot] is not None:
                    self.slot_hist[slot].append(int(fed[slot]))
            else:
                # idle slots still get garbage KV writes from the batched
                # decode program: their cached prefix is no longer trustworthy
                self.slot_hist[slot] = None
        for slot in active:
            req = self.slot_req[slot]
            req.output.append(int(host[slot]))
            hit_eos = self.eos is not None and host[slot] == self.eos
            out_of_budget = len(req.output) >= req.max_new_tokens
            out_of_cache = lengths[slot] >= self.max_len - 1
            if hit_eos or out_of_budget or out_of_cache:
                req.done = True
                req.finish_reason = "stop" if hit_eos else "length"
                req.finished_at = time.time()
                self.completed.append(req)
                self.slot_req[slot] = None
                self.rope_delta[slot] = 0
                if self.queue:
                    # admit the queue head immediately: the retiring slot's
                    # KV prefix is still intact and may be shared
                    self._admit_into(slot, self.queue.popleft())
                else:
                    self.slot_hist[slot] = None
                    self._fill[slot] = 0
                    self.cache = self.cache._replace(
                        lengths=self.cache.lengths.at[slot].set(0)
                    )
        return len(active)

    def _auto_block(self, active) -> int:
        """Block size for multi_step="auto": the largest power of two <=
        MULTI_STEP_AUTO_CAP that (a) fits the smallest remaining token
        budget among active slots — so block edges coincide with budget
        exhaustion and retired slots don't decode garbage for long — and
        (b) fits the cache headroom of the fullest slot, so no write lands
        past max_len. With requests waiting in the queue the cap drops to
        MULTI_STEP_ADMIT_CAP: a retiring slot turns over at the next block
        edge, bounding queue admit latency."""
        budget = min(self.slot_req[s].max_new_tokens
                     - len(self.slot_req[s].output) for s in active)
        headroom = int(self.max_len - 1 - max(self._fill[s] for s in active))
        cap = MULTI_STEP_ADMIT_CAP if self.queue else MULTI_STEP_AUTO_CAP
        if self.auto_cap:
            cap = min(cap, self.auto_cap)
        k = min(cap, max(1, budget), max(1, headroom))
        return 1 << (k.bit_length() - 1)  # floor to a power of two

    def _step_block(self, active, k: int) -> int:
        """k decode steps as ONE scan program (see multi_step). Host-side
        bookkeeping replays the block rows; retired slots keep decoding
        garbage for the rest of the block (their outputs are dropped and
        their KV prefix below the retire point stays intact, so the next
        occupant still gets prefix reuse). Admits happen at block edges."""
        fed_prev = np.asarray(self.tokens)  # (B,) inputs of the first row
        if any(not self.slot_req[s].sampling.is_trivial for s in active):
            self.tokens, toks, self.sampler, self.cache = (
                _sampled_decode_steps_scan(
                    self.params, self.cfg, self.tokens, self.cache,
                    self.sampler, k))
        else:
            self.tokens, toks, self.cache = _decode_steps_scan(
                self.params, self.cfg, self.tokens, self.cache, k)
        host = np.asarray(toks)  # (k, B) — one readback per block
        for j in range(k):
            for slot in range(self.num_slots):
                if self.slot_req[slot] is not None:
                    if self.slot_hist[slot] is not None:
                        self.slot_hist[slot].append(int(fed_prev[slot]))
            for slot in range(self.num_slots):
                req = self.slot_req[slot]
                if req is None:
                    continue
                tok = int(host[j][slot])
                req.output.append(tok)
                hit_eos = self.eos is not None and tok == self.eos
                out_of_budget = len(req.output) >= req.max_new_tokens
                out_of_cache = self._fill[slot] + j + 1 >= self.max_len - 1
                if hit_eos or out_of_budget or out_of_cache:
                    req.done = True
                    req.finish_reason = "stop" if hit_eos else "length"
                    req.finished_at = time.time()
                    self.completed.append(req)
                    self.slot_req[slot] = None
                    self.rope_delta[slot] = 0
                    # lengths keep advancing through the rest of the block
                    # (garbage writes land beyond the prefix), so slot_hist
                    # stays valid for prefix reuse at the next admit
            fed_prev = host[j]
        self._fill += k
        return len(active)

    def run_until_done(self, max_steps: int = 100000) -> List[Request]:
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_req)) and steps < max_steps:
            self.step()
            steps += 1
        return self.completed


# ---------------------------------------------------------------------------
# Paged continuous batching (block-table KV, vLLM-style)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _paged_decode_step(params, cfg: LlamaConfig, tokens: jax.Array, cache):
    from . import paged

    logits, cache = paged.forward_paged(params, cfg, tokens[:, None], cache)
    next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_tokens, logits, cache


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache", "sampler"))
def _paged_sampled_decode_step(params, cfg: LlamaConfig, tokens, cache,
                               sampler: sampling.SlotSampling):
    from . import paged

    counts = sampler.counts.at[jnp.arange(tokens.shape[0]), tokens].add(1)
    sampler = sampler._replace(counts=counts)
    logits, cache = paged.forward_paged(params, cfg, tokens[:, None], cache)
    next_tokens, sampler = sampling.sample_step(logits, sampler)
    return next_tokens, logits, sampler, cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _paged_prefill_slot(params, cfg: LlamaConfig, prompt: jax.Array, cache, slot,
                        n_valid):
    """Prefill one slot of a paged cache (pages must be pre-assigned)."""
    from . import paged

    B = cache.lengths.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)
    mask = (jnp.arange(B) == slot)
    prompts = jnp.where(mask[:, None], jnp.broadcast_to(prompt, (B, prompt.shape[1])), 0)
    # zero out lengths advance + writes for the other slots by masking their
    # page tables to -1 (writes drop) and keeping their lengths
    table = jnp.where(mask[:, None], cache.page_table, -1)
    sub = paged.PagedKVCache(cache.k_pages, cache.v_pages, table,
                             jnp.where(mask, 0, cache.lengths),
                             cache.k_s_pages, cache.v_s_pages)
    nv = jnp.where(mask, n_valid, 1)
    logits, sub = paged.forward_paged(params, cfg, prompts, sub, n_valid=nv)
    lengths = jnp.where(mask, n_valid, cache.lengths)
    slot_logits = jnp.take(logits, slot, axis=0)
    next_token = jnp.argmax(slot_logits, axis=-1).astype(jnp.int32)
    return next_token, slot_logits, paged.PagedKVCache(
        sub.k_pages, sub.v_pages, cache.page_table, lengths,
        sub.k_s_pages, sub.v_s_pages)


class PagedContinuousBatchingEngine:
    """Continuous batching over the paged KV cache.

    Pages come from a shared pool (possibly oversubscribed: fewer pages than
    slots x max_len/page); requests are admitted only when their worst-case
    page need fits, and decode grows a slot's table one page at a time.
    """

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        num_slots: int = 8,
        max_len: int = 2048,
        page_size: int = 64,
        n_pages: Optional[int] = None,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
        kv_quantized=False,  # False | "int4" (paged int8 is not offered)
    ):
        from . import paged

        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_len = max_len
        kvd = _kv_dtype(kv_quantized)
        if (kvd == "int4" and jax.devices()[0].platform == "tpu"
                and page_size < 128 and max_len % 128 == 0
                and n_pages is None):
            # the combined-layout q4 flash-decode kernel needs page % 128
            # on real TPU (ops/paged_attention.q4_kernel_supported); a
            # 64-entry page would silently fall back to the full-pool
            # gather path
            page_size = 128
        self.page_size = page_size
        self.eos = eos_token_id
        self.key = jax.random.PRNGKey(seed)
        self._seed_base = seed * 1000003
        self.sampler = sampling.init_state(num_slots, cfg.vocab_size)
        self.cache = paged.init_paged_cache(cfg, num_slots, max_len, page_size,
                                            n_pages,
                                            kv_dtype=kvd)
        self.alloc = paged.PageAllocator(self.cache.k_pages[0].shape[0])
        self.slot_pages: List[List[int]] = [[] for _ in range(num_slots)]
        self.tokens = jnp.zeros((num_slots,), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        # host-side mirror of cache.lengths (saves a device readback per
        # step and powers the multi_step block's out-of-cache checks)
        self._fill = np.zeros((num_slots,), np.int64)
        self.queue: deque = deque()
        self._uid = 0
        self.completed: List[Request] = []

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 64,
               sampling_params: Optional[SamplingParams] = None,
               logprobs: int = 0,
               soft_embeds: Optional[np.ndarray] = None,
               soft_token_id: Optional[int] = None,
               rope_positions: Optional[np.ndarray] = None,
               rope_next: Optional[int] = None,
               soft_bidir: bool = False) -> int:
        if soft_embeds is not None or rope_positions is not None:
            raise NotImplementedError(
                "soft-token (VLM) requests need the contiguous engine")
        self._uid += 1
        max_new_tokens = min(max_new_tokens, self.max_len - 1)
        self.queue.append(Request(
            self._uid, np.asarray(prompt).reshape(-1), max_new_tokens,
            sampling=sampling_params or GREEDY, logprobs=int(logprobs)))
        return self._uid

    def _set_table_row(self, slot: int, pages: List[int]) -> None:
        pps = self.cache.page_table.shape[1]
        row = np.full((pps,), -1, np.int32)
        row[: len(pages)] = pages
        self.cache = self.cache._replace(
            page_table=self.cache.page_table.at[slot].set(jnp.asarray(row))
        )

    def _admit(self) -> None:
        from . import paged

        for slot in range(self.num_slots):
            if self.slot_req[slot] is None and self.queue:
                req = self.queue[0]
                keep = max(1, self.max_len - req.max_new_tokens)
                prompt = req.prompt[-keep:]
                need = -(-(len(prompt) + req.max_new_tokens) // self.page_size)
                need = min(need, self.cache.page_table.shape[1])
                pages = self.alloc.alloc(need)
                if pages is None:
                    return  # pool exhausted; wait for retirements
                self.queue.popleft()
                self.slot_pages[slot] = pages
                self._set_table_row(slot, pages)
                padded, n = _pad_prompt(prompt, self.max_len)
                tok, logits, cache = _paged_prefill_slot(
                    self.params, self.cfg, jnp.asarray(padded)[None, :],
                    self.cache, slot, n,
                )
                self.cache = cache
                self.sampler = sampling.set_slot(
                    self.sampler, slot, req.sampling, np.asarray(prompt),
                    fallback_seed=self._seed_base + req.uid)
                if not req.sampling.is_greedy:
                    tok, self.sampler = sampling.sample_slot(
                        logits, self.sampler, slot)
                self.tokens = self.tokens.at[slot].set(tok)
                req.output.append(int(tok))
                if req.logprobs:
                    ContinuousBatchingEngine._note_logprobs(
                        req, int(tok), logits)
                self.slot_req[slot] = req

    def cancel(self, uid: int) -> bool:
        """Drop a queued or in-flight request, releasing its pages."""
        for i, r in enumerate(self.queue):
            if r.uid == uid:
                del self.queue[i]
                return True
        for slot, r in enumerate(self.slot_req):
            if r is not None and r.uid == uid:
                r.done = True
                r.finish_reason = "cancelled"
                r.finished_at = time.time()
                self.slot_req[slot] = None
                self.alloc.release(self.slot_pages[slot])
                self.slot_pages[slot] = []
                self._set_table_row(slot, [])
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))
                return True
        return False

    def step(self) -> int:
        self._admit()
        active = [s for s, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return 0
        if any(not self.slot_req[s].sampling.is_trivial for s in active):
            self.tokens, logits, self.sampler, self.cache = \
                _paged_sampled_decode_step(
                    self.params, self.cfg, self.tokens, self.cache,
                    self.sampler
                )
        else:
            self.tokens, logits, self.cache = _paged_decode_step(
                self.params, self.cfg, self.tokens, self.cache
            )
        lp_slots = [s for s in active if self.slot_req[s].logprobs]
        if lp_slots:
            kmax = max(self.slot_req[s].logprobs for s in lp_slots)
            k = 1 << max(kmax - 1, 0).bit_length()
            vals, ids, chosen = _topk_logprobs(logits, self.tokens, k)
            vals, ids, chosen = (np.asarray(vals), np.asarray(ids),
                                 np.asarray(chosen))
            for s in lp_slots:
                n = self.slot_req[s].logprobs
                self.slot_req[s].logprob_data.append((
                    float(chosen[s]), ids[s, :n].tolist(),
                    vals[s, :n].tolist()))
        host = np.asarray(self.tokens)
        lengths = np.asarray(self.cache.lengths)
        for slot in active:
            req = self.slot_req[slot]
            req.output.append(int(host[slot]))
            hit_eos = self.eos is not None and host[slot] == self.eos
            out_of_budget = len(req.output) >= req.max_new_tokens
            out_of_cache = lengths[slot] >= self.max_len - 1
            if hit_eos or out_of_budget or out_of_cache:
                req.done = True
                req.finish_reason = "stop" if hit_eos else "length"
                req.finished_at = time.time()
                self.completed.append(req)
                self.slot_req[slot] = None
                self.alloc.release(self.slot_pages[slot])
                self.slot_pages[slot] = []
                self._set_table_row(slot, [])
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0)
                )
            elif (lengths[slot] + 1) // self.page_size >= len(self.slot_pages[slot]) \
                    and len(self.slot_pages[slot]) < self.cache.page_table.shape[1]:
                extra = self.alloc.alloc(1)
                if extra is not None:
                    self.slot_pages[slot].extend(extra)
                    self._set_table_row(slot, self.slot_pages[slot])
        return len(active)

    def run_until_done(self, max_steps: int = 100000) -> List[Request]:
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_req)) and steps < max_steps:
            if self.step() == 0 and self.queue:
                raise RuntimeError(
                    "page pool too small to admit any queued request"
                )
            steps += 1
        return self.completed
