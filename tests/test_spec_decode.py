"""Speculative decoding: greedy output must be token-for-token identical to
plain greedy generation with the target, for both a perfect draft (target
== draft, all-accept path) and a disagreeing draft (rollback path)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.serving import engine, spec_decode, model as qmodel

RNG = np.random.default_rng(55)


def _tiny(tmp_path, seed, name):
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=96, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        torch_dtype="float32")
    torch.manual_seed(seed)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    gguf = tmp_path / f"{name}.gguf"
    packer.pack_model(d, tmp_path / "none", gguf)
    return qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    target = _tiny(tmp, 31, "target")
    draft = _tiny(tmp, 77, "draft")  # different weights: disagreements
    return target, draft


def test_spec_decode_exact_with_disagreeing_draft(models):
    (tp, tc), (dp, dc) = models
    prompts = [RNG.integers(0, 96, size=(7,)), RNG.integers(0, 96, size=(3,))]
    ref = engine.generate(tp, tc, prompts, max_new_tokens=12)
    stats = {}
    got = spec_decode.generate_speculative(
        tp, tc, dp, dc, prompts, max_new_tokens=12, draft_k=3,
        collect_stats=stats)
    assert got == ref
    assert stats["proposed"] > 0
    assert 0 <= stats["accepted"] <= stats["proposed"]


def test_spec_decode_exact_with_perfect_draft(models):
    (tp, tc), _ = models
    prompts = [RNG.integers(0, 96, size=(5,))]
    ref = engine.generate(tp, tc, prompts, max_new_tokens=10)
    stats = {}
    got = spec_decode.generate_speculative(
        tp, tc, tp, tc, prompts, max_new_tokens=10, draft_k=4,
        collect_stats=stats)
    assert got == ref
    # a perfect draft is always accepted
    assert stats["accepted"] == stats["proposed"]


def test_spec_decode_eos_and_budget(models):
    (tp, tc), (dp, dc) = models
    prompts = [RNG.integers(0, 96, size=(4,))]
    ref = engine.generate(tp, tc, prompts, max_new_tokens=9,
                          eos_token_id=int(1e9))  # never fires
    got = spec_decode.generate_speculative(
        tp, tc, dp, dc, prompts, max_new_tokens=9, draft_k=5,
        eos_token_id=int(1e9))
    assert got == ref
    assert len(got[0]) == 9
    # eos that DOES fire: pick the first generated token as eos
    eos = ref[0][2]
    ref_e = engine.generate(tp, tc, prompts, max_new_tokens=9, eos_token_id=eos)
    got_e = spec_decode.generate_speculative(
        tp, tc, dp, dc, prompts, max_new_tokens=9, draft_k=3,
        eos_token_id=eos)
    assert got_e == ref_e
