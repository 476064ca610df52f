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


def test_tp_paged_int4_decode_matches_unsharded(tp_setup):
    """int4 paged pools (packed codes + group-scale pools) sharded over kv
    heads: TP decode through the q4 kernel path matches the single-device
    int4 paged forward."""
    from gptq_gguf_tpu.serving import paged

    cfg, params, mesh = tp_setup
    B = 2
    pcache = paged.init_paged_cache(cfg, B, 16, page_size=8, kv_dtype="int4")
    assert pcache.q4  # combined pools: codes in k_pages, scales in v_pages
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
    assert scache2.q4
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


# ---------------------------------------------------------------------------
# 70B-shapes validation (VERDICT r3 #6): real Llama-3-70B layer dimensions
# (h=8192, I=28672, 64 q heads / 8 kv heads) at tp=8 on the virtual mesh.
# Catches plane-divisibility/sharding constraints the toy shapes above can't,
# and pins serving/memory_plan.py's byte math to the actual packed buffers.
# Weights are synthetic (random codes/scales in the v2 layout — identical
# shapes and bytes to fitted weights); vocab is shrunk to keep the test's
# embed/logits small, which does not affect the layer-shape constraints.
# ---------------------------------------------------------------------------

def _synth_v2_np(rng, d_out, d_in, qtype=T.Q4_K):
    from gptq_gguf_tpu.formats.ggml import KQUANT_SPECS

    spec = KQUANT_SPECS[qtype]
    gs = spec.group_size
    per_byte = 2 if spec.bits <= 4 else 1
    n_sg, ng, d_rep = d_in // 256, d_in // gs, 2
    qs = jnp.asarray(rng.integers(0, 256, (d_in // per_byte, d_out), dtype=np.uint8))
    d_sg = jnp.asarray(np.repeat(
        rng.random((n_sg, d_out), np.float32) * 1e-3 + 1e-5, d_rep, axis=0))
    if spec.signed:
        sc = jnp.asarray(rng.integers(-32, 32, (ng, d_out)).astype(np.int8))
        dmin = mn = None
    else:
        sc = jnp.asarray(rng.integers(0, 64, (ng, d_out), dtype=np.uint8))
        dmin = jnp.asarray(np.repeat(
            rng.random((n_sg, d_out), np.float32) * 1e-4, d_rep, axis=0))
        mn = jnp.asarray(rng.integers(0, 64, (ng, d_out), dtype=np.uint8))
    return qmatmul.RuntimeQuantLinearV2(
        qs, d_sg, dmin, sc, mn, d_in, gs, per_byte, -spec.qmin, d_rep)


def _rql_nbytes(r):
    n = r.qs.nbytes + r.d_sg.nbytes + r.sc_q.nbytes
    if r.dmin_sg is not None:
        n += r.dmin_sg.nbytes + r.mn_q.nbytes
    return int(n)


def test_tp8_llama70b_layer_shapes():
    from gptq_gguf_tpu.serving import memory_plan, paged

    rng = np.random.default_rng(7)
    V = 1024  # shrunk (embed/logits only); layer shapes are exact 70B
    cfg = LlamaConfig(
        vocab_size=V, hidden_size=8192, intermediate_size=28672,
        num_hidden_layers=2, num_attention_heads=64, num_key_value_heads=8,
        head_dim=128, max_position_embeddings=256, rope_theta=500000.0,
    )
    H, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_key_value_heads * cfg.head_dim_
    shapes = {
        "q_proj": (H, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
        "o_proj": (H, H), "gate_proj": (I, H), "up_proj": (I, H),
        "down_proj": (H, I),
    }
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(size=(V, H)).astype(np.float32) * 0.02),
        "norm": jnp.ones((H,), jnp.float32),
        "lm_head": _synth_v2_np(rng, V, H, T.Q6_K),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        ld = {
            "input_layernorm": jnp.ones((H,), jnp.float32),
            "post_attention_layernorm": jnp.ones((H,), jnp.float32),
        }
        for key, (dout, din) in shapes.items():
            ld[key] = _synth_v2_np(rng, dout, din)
        params["layers"].append(ld)

    # memory_plan's analytic bytes == the actual packed buffers, per tensor
    for key, (dout, din) in shapes.items():
        assert memory_plan.rql_v2_bytes(dout, din, T.Q4_K) == \
            _rql_nbytes(params["layers"][0][key]), key
    assert memory_plan.rql_v2_bytes(V, H, T.Q6_K) == _rql_nbytes(params["lm_head"])
    plan = memory_plan.plan_serving_memory(cfg, tp=8, chip="v5e")
    measured_layer = sum(_rql_nbytes(params["layers"][0][k]) for k in shapes)
    assert plan.detail["layer_bytes"] == measured_layer + 4 * H * 4  # + norms

    mesh = mesh_mod.make_mesh(dp=1, tp=8, devices=jax.devices()[:8])
    B = 2
    sparams = tp_serving.shard_serving_tree(params, mesh)
    # every packed plane actually splits 8 ways (no silent replication)
    q0 = sparams["layers"][0]["q_proj"].qs
    assert q0.addressable_shards[0].data.size * 8 == q0.size
    d0 = sparams["layers"][0]["down_proj"].qs
    assert d0.addressable_shards[0].data.size * 8 == d0.size

    tokens = jnp.asarray(rng.integers(0, V, size=(B,)).astype(np.int32))
    cache = tp_serving.shard_cache(
        qmodel.init_cache(cfg, B, 64, dtype=jnp.float32), mesh)
    nxt, logits, cache2 = tp_serving.tp_decode_step(
        sparams, cfg, tokens, cache, mesh)
    assert logits.shape == (B, V)
    assert bool(jnp.isfinite(logits).all())
    assert np.asarray(cache2.lengths).tolist() == [1, 1]
    # kv cache sharded over the 8 kv heads: 1 head per device
    assert cache2.k[0].addressable_shards[0].data.shape[1] == 1

    # paged decode at the same shapes (pools sharded over kv heads)
    pcache = paged.init_paged_cache(cfg, B, 64, page_size=32, dtype=jnp.float32)
    table = jnp.asarray(np.arange(B * 2, dtype=np.int32).reshape(B, 2))
    pcache = pcache._replace(page_table=table)
    scache = tp_serving.shard_paged_cache(pcache, mesh)
    nxt_p, logits_p, scache2 = tp_serving.tp_paged_decode_step(
        sparams, cfg, tokens, scache, mesh)
    assert logits_p.shape == (B, V)
    assert bool(jnp.isfinite(logits_p).all())
    assert np.asarray(scache2.lengths).tolist() == [1, 1]
    # dense and paged decode from an empty cache agree exactly
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)
