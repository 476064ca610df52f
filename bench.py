"""Benchmark driver: one JSON line on stdout.

Measures decode-step throughput of the fused Q4_K dequant-matmul serving
path over the Llama-3-8B weight shapes (the BASELINE.json headline:
"tokens/s/chip at Q4_K Llama-3-8B"). vs_baseline is the fraction of the
weight-bound speed of light computed from the *measured* streaming
bandwidth of this chip (so the number is comparable across environments).

Timing methodology: the axon relay makes per-dispatch wall times unreliable,
so every measurement chains N iterations inside one jitted scan and forces a
dependent scalar readback.
"""

import json
import sys
import time

import numpy as np


def _chain(fn, n):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(x, _):
            y = fn(x)
            # scalar feedback forces sequential execution of the chain
            return x * (1.0 + 1e-12 * jnp.sum(y)), None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    return run


def measure_stream_bw_gbs(n_mb=128, steps=20):
    """Measured streaming HBM bandwidth (2 reads + 1 write per step)."""
    import jax
    import jax.numpy as jnp

    n = n_mb * 1024 * 1024 // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def run(x, y):
        def body(c, _):
            a, b = c
            return (b, a + 0.5 * b), None

        (a, b), _ = jax.lax.scan(body, (x, y), None, length=steps)
        return jnp.sum(b)

    float(run(x, y))
    t0 = time.time()
    float(run(x, y))
    dt = (time.time() - t0) / steps
    return 3 * n_mb / 1024 / dt


def main():
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import kquant, qmatmul

    rng = np.random.default_rng(0)
    B = 8  # decode batch
    N = 25

    # Llama-3-8B per-layer matmul shapes (d_out, d_in) and multiplicity
    shapes = [
        (4096, 4096, 1),  # q_proj
        (1024, 4096, 2),  # k/v_proj
        (4096, 4096, 1),  # o_proj
        (14336, 4096, 2),  # gate/up
        (4096, 14336, 1),  # down
    ]
    n_layers = 32

    total_time = 0.0
    total_bytes = 0
    for d_out, d_in, mult in shapes:
        w = (rng.normal(size=(d_out, d_in)) * 0.05).astype(np.float32)
        q, params = kquant.quantize_rtn(jnp.asarray(w), T.Q4_K)
        rql = qmatmul.pack_runtime(np.asarray(q), params, T.Q4_K)
        x0 = jnp.asarray(rng.normal(size=(B, d_in)).astype(np.float32))
        fn = lambda x: qmatmul.dequant_matmul(x, rql)
        run = _chain(fn, N)
        float(run(x0))  # compile
        t0 = time.time()
        float(run(x0))
        dt = (time.time() - t0) / N
        total_time += dt * mult * n_layers
        nbytes = d_out * d_in // rql.per_byte + 8 * d_out * (d_in // rql.group_size)
        total_bytes += nbytes * mult * n_layers

    tokens_per_s = B / total_time
    bw = measure_stream_bw_gbs()
    # weight-bound speed of light at the measured streaming bandwidth
    sol_tokens_per_s = B * bw * 1e9 / total_bytes
    result = {
        "metric": "decode_tokens_per_s_q4k_llama8b_shapes",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s/chip (B=8 decode, matmul path)",
        "vs_baseline": round(tokens_per_s / max(sol_tokens_per_s, 1e-9), 4),
        "detail": {
            "stream_bw_gbs": round(bw, 1),
            "weight_bytes_per_token_gb": round(total_bytes / 1e9, 3),
            "sol_tokens_per_s": round(sol_tokens_per_s, 2),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
