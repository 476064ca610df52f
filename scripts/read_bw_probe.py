"""Probe read-dominated HBM bandwidth (two-point over scan length).

The bench's SOL denominator has used an axpy stream (2 reads + 1 write per
element). Decode is read-dominated (weights+KV read, ~nothing written), and
the fused kernels measure 480-540 GB/s effective — above the 267 GB/s axpy
number. This probe measures read-only patterns to find the honest ceiling.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def two_point(run, x, lo, hi, trials=5):
    float(run(x, lo))
    float(run(x, hi))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        float(run(x, lo))
        t_lo = time.time() - t0
        t0 = time.time()
        float(run(x, hi))
        t_hi = time.time() - t0
        dt = t_hi - t_lo
        if dt > 1e-4:
            best = min(best, dt / (hi - lo))
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    n_mb = 512
    n = n_mb * 1024 * 1024 // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    xu = (jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 256, jnp.int32)
          .astype(jnp.uint8))

    # read-only: reduce a big buffer, carry keeps a data dep
    @partial(jax.jit, static_argnames=("steps",))
    def run_sum(x, steps):
        def body(c, _):
            return c + jnp.sum(x * (1.0 + c * 1e-30)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    # read-only on u8 (the kernels' dominant operand dtype)
    @partial(jax.jit, static_argnames=("steps",))
    def run_sum_u8(x, steps):
        def body(c, _):
            s = jnp.sum((x ^ c.astype(jnp.uint8)).astype(jnp.int32))
            return (s % 251).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=steps)
        return c

    lo, hi = 8, 72
    for name, fn, buf, bytes_step in (
        ("read_f32_sum", run_sum, x, n * 4),
        ("read_bf16_sum", run_sum, xb, n * 2),
        ("read_u8_xor_sum", run_sum_u8, xu, n),
    ):
        dt = two_point(fn, buf, lo, hi)
        print(json.dumps({name: round(bytes_step / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
