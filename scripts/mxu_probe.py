"""MXU weight-streaming floor probe.

Every dequant-kernel variant (v1/v2/v3/v4f/v4x — i32, i8, fat/compact
scales) lands at 1.1-1.5 ms/layer while pure HBM reads do 826 GB/s. The
remaining invariant is the dot itself: at B=8 the 128x128 systolic array
streams 8 rows per weight tile — if weight-load time dominates, EVERY
matmul-based design is floored regardless of dequant cost.

Probes (two-point timed, carry-chained):
  1. Pallas kernel: y += x @ W  with W already bf16 (no dequant at all),
     same grid/tile structure as the v4 kernel, B in {8, 32, 128}.
  2. XLA dense dot at B in {8, 128} (fused big dot, no pallas).
  3. Pallas v4f-i32 kernel at B in {32, 128} (does more rows hide the
     dequant chain too?)
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def two_point(run, args, passes=6, reps=3):
    float(run(*args, steps=passes))
    float(run(*args, steps=5 * passes))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(*args, steps=passes))
        t_lo = time.time() - t0
        t0 = time.time()
        float(run(*args, steps=5 * passes))
        t_hi = time.time() - t0
        if t_hi - t_lo > 1e-4:
            best = min(best, (t_hi - t_lo) / (4 * passes))
    return best


def pallas_bf16_dot(B, d_in=4096, d_out=28672, tile_in=2048, tile_out=512):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = jax.random.normal(jax.random.PRNGKey(0), (d_in, d_out), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        j = pl.program_id(1)
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            o_ref[:] = acc

        @pl.when(j > 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    def call(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, d_out), jnp.float32),
            grid=(d_out // tile_out, d_in // tile_in),
            in_specs=[
                pl.BlockSpec((B, tile_in), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_in, tile_out), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, tile_out), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, w)

    @partial(jax.jit, static_argnames=("steps",))
    def run(x0, w, steps):
        def body(x, _):
            y = call(x.astype(jnp.bfloat16), w)
            return (y[:, :d_in] * 1e-9 + x).astype(jnp.float32), None
        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d_in), jnp.float32)
    dt = two_point(run, (x0, w))
    return round(2 * d_in * d_out / dt / 1e9, 1)  # bf16 GB/s


def xla_bf16_dot(B, d_in=4096, d_out=28672):
    import jax
    import jax.numpy as jnp

    w = jax.random.normal(jax.random.PRNGKey(0), (d_in, d_out), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("steps",))
    def run(x0, w, steps):
        def body(x, _):
            y = jnp.dot(x.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
            return (y[:, :d_in] * 1e-9 + x).astype(jnp.float32), None
        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d_in), jnp.float32)
    dt = two_point(run, (x0, w))
    return round(2 * d_in * d_out / dt / 1e9, 1)


def v4_kernel_at_B(B):
    import jax
    import jax.numpy as jnp
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import qmv4
    from gptq_gguf_tpu.ops.kquant import SuperGroupParams

    z = np.load("/tmp/kernel_lab_Q4_K_28672x4096.npz")
    p = SuperGroupParams(z["ss"], z["sz"], z["sq"], z["zq"])
    r = qmv4.pack_runtime_v4(z["q"], p, T.Q4_K)
    nbytes = int(r.qs.size) + 4 * int(r.scale.size) + 4 * int(r.offc.size)

    @partial(jax.jit, static_argnames=("steps",))
    def run(x0, r, steps):
        def body(x, _):
            y = qmv4.dequant_matmul_v4(x, r, tile_in=2048, tile_out=512)
            return y[:, :4096] * 1e-9 + x, None
        x, _ = jax.lax.scan(body, x0, None, length=steps)
        return jnp.sum(x)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 4096), jnp.float32)
    dt = two_point(run, (x0, r))
    return round(nbytes / dt / 1e9, 1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    out = {}
    for B in (8, 32, 128):
        out[f"pallas_bf16_dot_B{B}_gbs"] = pallas_bf16_dot(B)
        print(json.dumps(out), flush=True)
    for B in (8, 128):
        out[f"xla_bf16_dot_B{B}_gbs"] = xla_bf16_dot(B)
        print(json.dumps(out), flush=True)
    for B in (8, 32, 128):
        try:
            out[f"v4f_kernel_B{B}_gbs"] = v4_kernel_at_B(B)
        except Exception as e:
            out[f"v4f_kernel_B{B}_gbs"] = repr(e)[:200]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
