"""Serving memory-plan tests: 8B fits one v5e, 70B Q4_K needs >= 4 chips
(the BASELINE multi-host deployment target, validated analytically)."""

import numpy as np

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.ops import kquant, qmatmul
from gptq_gguf_tpu.serving import memory_plan as mp


def test_rql_bytes_matches_packed():
    """The planner's byte formula must equal the real packed object."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    w = rng.normal(size=(512, 1024)).astype(np.float32) * 0.1
    for qt in (T.Q4_K, T.Q6_K):
        q, p = kquant.quantize_rtn(jnp.asarray(w), qt)
        rql = qmatmul.pack_runtime_v2(np.asarray(q), p, qt)
        real = int(rql.qs.nbytes + rql.d_sg.nbytes + rql.sc_q.nbytes
                   + (rql.dmin_sg.nbytes + rql.mn_q.nbytes if rql.has_min else 0))
        assert mp.rql_v2_bytes(512, 1024, qt) == real


def test_8b_fits_single_v5e():
    plan = mp.plan_serving_memory(mp.LLAMA3_8B, batch=8, max_len=2048, tp=1)
    assert plan.fits, plan.summary()
    assert 4.5 < plan.gb(plan.weights_per_chip) < 6.5


def test_70b_needs_multichip():
    one = mp.plan_serving_memory(mp.LLAMA3_70B, batch=8, max_len=4096, tp=1)
    assert not one.fits  # ~42 GB of weights alone
    four = mp.plan_serving_memory(mp.LLAMA3_70B, batch=8, max_len=4096, tp=4)
    assert four.fits, four.summary()


def test_kv_quantization_halves_kv():
    a = mp.plan_serving_memory(mp.LLAMA3_8B, batch=16, max_len=8192)
    b = mp.plan_serving_memory(mp.LLAMA3_8B, batch=16, max_len=8192,
                               kv_quantized=True)
    assert b.kv_per_chip / a.kv_per_chip == (1 + 4 / mp.LLAMA3_8B.head_dim_) / 2
