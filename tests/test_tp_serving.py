"""TP serving via shard_map: the Pallas kernel runs per-shard and numerics
match the unsharded quantized forward (VERDICT round-2 item #5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.models.llama import LlamaConfig
from gptq_gguf_tpu.ops import kquant, qmatmul
from gptq_gguf_tpu.parallel import mesh as mesh_mod, tp_serving
from gptq_gguf_tpu.serving import model as qmodel

RNG = np.random.default_rng(53)


def _quant_params(cfg):
    params = {
        "embed_tokens": jnp.asarray(
            RNG.normal(size=(cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
        ),
        "norm": jnp.ones((cfg.hidden_size,), jnp.float32),
        "layers": [],
    }
    H, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_key_value_heads * cfg.head_dim_
    for _ in range(cfg.num_hidden_layers):
        ld = {
            "input_layernorm": jnp.ones((H,), jnp.float32),
            "post_attention_layernorm": jnp.ones((H,), jnp.float32),
        }
        for key, (dout, din) in {
            "q_proj": (H, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
            "o_proj": (H, H), "gate_proj": (I, H), "up_proj": (I, H),
            "down_proj": (H, I),
        }.items():
            wx = (RNG.normal(size=(dout, din)) * 0.05).astype(np.float32)
            q, p = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
            ld[key] = qmatmul.pack_runtime_v2(np.asarray(q), p, T.Q4_K)
        params["layers"].append(ld)
    return params


@pytest.fixture(scope="module")
def tp_setup():
    # input-sharded (o/down) planes need n_supergroups = d_in/256 divisible
    # by tp, so hidden/intermediate are 512/1024
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = _quant_params(cfg)
    mesh = mesh_mod.make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    return cfg, params, mesh


def test_tp_decode_matches_unsharded(tp_setup):
    cfg, params, mesh = tp_setup
    B = 2
    cache_ref = qmodel.init_cache(cfg, B, 16, dtype=jnp.float32)
    tokens = jnp.asarray(RNG.integers(0, cfg.vocab_size, size=(B,)).astype(np.int32))

    logits_ref, cache_ref2 = qmodel.forward_cached(params, cfg, tokens[:, None], cache_ref)

    sparams = tp_serving.shard_serving_tree(params, mesh)
    cache = tp_serving.shard_cache(qmodel.init_cache(cfg, B, 16, dtype=jnp.float32), mesh)
    nxt, logits, cache2 = tp_serving.tp_decode_step(sparams, cfg, tokens, cache, mesh)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref), rtol=2e-4, atol=2e-4)
    assert np.asarray(nxt).tolist() == np.argmax(np.asarray(logits_ref), -1).tolist()
    # sharded cache holds the same K/V (gather global view and compare)
    np.testing.assert_allclose(
        np.asarray(cache2.k[0]), np.asarray(cache_ref2.k[0]), rtol=2e-4, atol=2e-4
    )
    assert np.asarray(cache2.lengths).tolist() == [1, 1]


def test_tp_prefill_then_decode_matches(tp_setup):
    cfg, params, mesh = tp_setup
    B, S = 2, 8
    prompts = jnp.asarray(RNG.integers(0, cfg.vocab_size, size=(B, S)))
    n_valid = jnp.asarray([S, S - 2], jnp.int32)

    cache_ref = qmodel.init_cache(cfg, B, 16, dtype=jnp.float32)
    logits_ref, cache_ref = qmodel.forward_cached(
        params, cfg, prompts, cache_ref, n_valid=n_valid
    )

    sparams = tp_serving.shard_serving_tree(params, mesh)
    cache = tp_serving.shard_cache(qmodel.init_cache(cfg, B, 16, dtype=jnp.float32), mesh)
    nxt, cache = tp_serving.tp_prefill(sparams, cfg, prompts, cache, n_valid, mesh)
    np.testing.assert_allclose(
        np.asarray(nxt), np.argmax(np.asarray(logits_ref), -1), atol=0
    )
    assert np.asarray(cache.lengths).tolist() == [S, S - 2]

    # one decode step after prefill also matches
    tok = jnp.asarray(nxt)
    logits_ref2, _ = qmodel.forward_cached(params, cfg, tok[:, None], cache_ref)
    _, logits2, _ = tp_serving.tp_decode_step(sparams, cfg, tok, cache, mesh)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits_ref2), rtol=2e-4, atol=2e-4)


def test_tp_paged_decode_matches_unsharded(tp_setup):
    """Paged TP decode (pools sharded over kv heads, replicated block
    table) matches the single-device paged forward (round 3)."""
    from gptq_gguf_tpu.serving import paged

    cfg, params, mesh = tp_setup
    B = 2
    pcache = paged.init_paged_cache(cfg, B, 16, page_size=8, dtype=jnp.float32)
    table = jnp.asarray(np.arange(2 * 2, dtype=np.int32).reshape(B, 2))
    pcache = pcache._replace(page_table=table)
    prompts = jnp.asarray(RNG.integers(0, cfg.vocab_size, size=(B, 5)))
    _, pcache = paged.forward_paged(params, cfg, prompts, pcache)
    tok = jnp.asarray(RNG.integers(0, cfg.vocab_size, size=(B,)).astype(np.int32))
    logits_ref, _ = paged.forward_paged(params, cfg, tok[:, None], pcache)

    sparams = tp_serving.shard_serving_tree(params, mesh)
    scache = tp_serving.shard_paged_cache(pcache, mesh)
    nxt, logits, scache2 = tp_serving.tp_paged_decode_step(
        sparams, cfg, tok, scache, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
    assert np.asarray(scache2.lengths).tolist() == [6, 6]


def test_tp_moe_decode_matches_unsharded(tp_setup):
    """Stacked packed MoE experts sharded Megatron-style within every
    expert: TP decode matches the single-device quantized MoE forward
    (round 3, VERDICT r2 #10)."""
    import dataclasses

    cfg, _, mesh = tp_setup
    mcfg = dataclasses.replace(cfg, moe_num_experts=4, moe_top_k=2)
    H, I, E = mcfg.hidden_size, mcfg.intermediate_size, 4
    kvd = mcfg.num_key_value_heads * mcfg.head_dim_
    params = {
        "embed_tokens": jnp.asarray(
            RNG.normal(size=(mcfg.vocab_size, H)).astype(np.float32) * 0.02),
        "norm": jnp.ones((H,), jnp.float32),
        "layers": [],
    }
    for _ in range(mcfg.num_hidden_layers):
        ld = {
            "input_layernorm": jnp.ones((H,), jnp.float32),
            "post_attention_layernorm": jnp.ones((H,), jnp.float32),
            "gate_inp": jnp.asarray(RNG.normal(size=(E, H)).astype(np.float32) * 0.05),
        }
        for key, (dout, din) in {
            "q_proj": (H, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
            "o_proj": (H, H),
        }.items():
            wx = (RNG.normal(size=(dout, din)) * 0.05).astype(np.float32)
            q, p = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
            ld[key] = qmatmul.pack_runtime_v2(np.asarray(q), p, T.Q4_K)
        for key, (dout, din) in {
            "experts_gate": (I, H), "experts_up": (I, H),
            "experts_down": (H, I),
        }.items():
            rqls = []
            for _e in range(E):
                wx = (RNG.normal(size=(dout, din)) * 0.05).astype(np.float32)
                q, p = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
                rqls.append(qmatmul.pack_runtime_v2(np.asarray(q), p, T.Q4_K))
            ld[key] = qmatmul.stack_runtime_v2(rqls)
        params["layers"].append(ld)

    B = 2
    tok = jnp.asarray(RNG.integers(0, mcfg.vocab_size, size=(B,)).astype(np.int32))
    cache_ref = qmodel.init_cache(mcfg, B, 16, dtype=jnp.float32)
    logits_ref, _ = qmodel.forward_cached(params, mcfg, tok[:, None], cache_ref)

    sparams = tp_serving.shard_serving_tree(params, mesh)
    cache = tp_serving.shard_cache(qmodel.init_cache(mcfg, B, 16, dtype=jnp.float32), mesh)
    nxt, logits, _ = tp_serving.tp_decode_step(sparams, mcfg, tok, cache, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
    assert np.asarray(nxt).tolist() == np.argmax(np.asarray(logits_ref), -1).tolist()


def test_tp_pallas_interpret_path(tp_setup):
    """Force the Pallas kernel (interpret mode) inside shard_map — the
    round-1 gap was TP silently using the XLA fallback."""
    cfg, params, mesh = tp_setup
    B = 2
    tokens = jnp.asarray(RNG.integers(0, cfg.vocab_size, size=(B,)).astype(np.int32))
    cache_ref = qmodel.init_cache(cfg, B, 16, dtype=jnp.float32)
    logits_ref, _ = qmodel.forward_cached(params, cfg, tokens[:, None], cache_ref)

    sparams = tp_serving.shard_serving_tree(params, mesh)
    cache = tp_serving.shard_cache(qmodel.init_cache(cfg, B, 16, dtype=jnp.float32), mesh)
    qmatmul.FORCE_PALLAS_INTERPRET = True
    try:
        _, logits, _ = tp_serving.tp_decode_step(sparams, cfg, tokens, cache, mesh)
    finally:
        qmatmul.FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref), rtol=2e-4, atol=2e-4)
