"""Benchmark driver: one JSON line on stdout.

Measures decode-step throughput of the fused Q4_K dequant-matmul serving
path over the Llama-3-8B layer shapes (BASELINE.json headline: "tokens/s/chip
at Q4_K Llama-3-8B"). One benchmark step chains all seven matmuls of a
transformer layer (q/k/v/o/gate/up/down) exactly as a decode step does, so
per-kernel pipeline bubbles amortize as they do in the real model; the result
is scaled to the 32-layer stack. vs_baseline is the fraction of the
weight-bound speed of light at this chip's *measured* streaming bandwidth.

Timing notes: this environment's relay makes isolated dispatch wall-times
unreliable, so measurements chain N iterations inside one jitted scan and
force a dependent scalar readback.
"""

import json
import time

import numpy as np


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
    N = 20
    n_layers = 32
    H, I, KV = 4096, 14336, 1024  # Llama-3-8B

    def mk(d_out, d_in):
        wx = (rng.normal(size=(d_out, d_in)) * 0.04).astype(np.float32)
        q, p = kquant.quantize_rtn(jnp.asarray(wx), T.Q4_K)
        return qmatmul.pack_runtime(np.asarray(q), p, T.Q4_K)

    qp, kp, vp, op = mk(H, H), mk(KV, H), mk(KV, H), mk(H, H)
    gp, up, dp = mk(I, H), mk(I, H), mk(H, I)
    weights = (qp, kp, vp, op, gp, up, dp)
    bytes_layer = sum(int(r.qs.size) + 8 * int(r.scale_t.size) for r in weights)
    x0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    mm = qmatmul.dequant_matmul

    def layer_step(x):
        q = mm(x, qp)
        k = mm(x, kp)
        v = mm(x, vp)
        a = mm(q, op)
        g = mm(a, gp)
        u = mm(a, up)
        d = mm(jax.nn.silu(g) * u, dp)
        return d + jnp.sum(k) * 1e-9 + jnp.sum(v) * 1e-9

    @jax.jit
    def run(x):
        def body(x, _):
            return layer_step(x) * 1e-3 + x, None

        x, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(x)

    float(run(x0))  # compile
    t0 = time.time()
    float(run(x0))
    dt_layer = (time.time() - t0) / N

    tokens_per_s = B / (dt_layer * n_layers)
    bw = measure_stream_bw_gbs()
    total_bytes = bytes_layer * n_layers
    sol_tokens_per_s = B * bw * 1e9 / total_bytes

    result = {
        "metric": "decode_tokens_per_s_q4k_llama8b_shapes",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s/chip (B=8 decode, 32-layer matmul path)",
        "vs_baseline": round(tokens_per_s / max(sol_tokens_per_s, 1e-9), 4),
        "detail": {
            "ms_per_layer": round(dt_layer * 1e3, 3),
            "eff_bw_gbs": round(bytes_layer / dt_layer / 1e9, 1),
            "stream_bw_gbs": round(bw, 1),
            "weight_bytes_per_token_gb": round(total_bytes / 1e9, 3),
            "sol_tokens_per_s": round(sol_tokens_per_s, 2),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
