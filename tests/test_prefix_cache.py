"""Prefix-cache reuse in the continuous-batching engine: a request admitted
into a retiring slot reuses the shared KV prefix (multi-turn chat pattern)
and must produce byte-identical output to a cold engine."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.serving import engine, model as qmodel

RNG = np.random.default_rng(56)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("prefix")
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=96, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        torch_dtype="float32")
    torch.manual_seed(41)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp / "m"
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp / "m.gguf"
    packer.pack_model(d, tmp / "none", gguf)
    params, cfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    return params, cfg


def _run(params, cfg, prompts, max_new=8, num_slots=1):
    eng = engine.ContinuousBatchingEngine(params, cfg, num_slots=num_slots,
                                          max_len=128)
    ids = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
    done = {r.uid: r.output for r in eng.run_until_done()}
    return [done[i] for i in ids], eng


def test_prefix_reuse_exact_multiturn(model):
    """Turn 2 re-sends turn 1's conversation: the retiring slot's KV prefix
    is reused and the output matches a cold engine exactly."""
    params, cfg = model
    turn1 = RNG.integers(0, 96, size=(10,))
    # cold pass to learn turn1's reply
    [reply1], _ = _run(params, cfg, [turn1])
    turn2 = np.concatenate([turn1, np.asarray(reply1),
                            RNG.integers(0, 96, size=(4,))])
    # cold reference for turn 2
    [ref2], cold = _run(params, cfg, [turn2])
    assert cold.prefix_hits == 0
    # warm: both turns through ONE single-slot engine -> turn2 is admitted
    # into turn1's retiring slot and reuses the shared prefix
    [got1, got2], warm = _run(params, cfg, [turn1, turn2])
    assert got1 == reply1
    assert got2 == ref2
    assert warm.prefix_hits == 1
    # shared prefix = turn1 prompt + its generated tokens (the final
    # output token is never fed back, so its KV was never written)
    assert warm.prefix_tokens_reused == len(turn1) + len(reply1) - 1


def test_prefix_reuse_divergent_prefix_exact(model):
    """A second request that diverges mid-prompt only reuses the matching
    part and still matches the cold output."""
    params, cfg = model
    p1 = RNG.integers(0, 96, size=(12,))
    p2 = np.concatenate([p1[:5], RNG.integers(0, 96, size=(9,))])
    [ref2], _ = _run(params, cfg, [p2])
    [_, got2], warm = _run(params, cfg, [p1, p2])
    assert got2 == ref2
    assert 0 < warm.prefix_tokens_reused <= 5


def test_prefix_reuse_disjoint_prompts_exact(model):
    """No shared prefix: behavior identical to the old engine."""
    params, cfg = model
    p1 = RNG.integers(48, 96, size=(8,))
    p2 = RNG.integers(0, 48, size=(8,))
    [ref2], _ = _run(params, cfg, [p2])
    [_, got2], warm = _run(params, cfg, [p1, p2])
    assert got2 == ref2


def test_prefix_multislot_batch_still_exact(model):
    """Mixed load on 2 slots with queued spillover stays byte-exact."""
    params, cfg = model
    prompts = [RNG.integers(0, 96, size=(n,)) for n in (6, 9, 6, 11)]
    prompts[2] = np.concatenate([prompts[0], RNG.integers(0, 96, size=(3,))])
    refs = [
        _run(params, cfg, [p], max_new=6)[0][0] for p in prompts
    ]
    got, _ = _run(params, cfg, prompts, max_new=6, num_slots=2)
    assert got == refs
