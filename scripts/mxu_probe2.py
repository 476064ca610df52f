"""MXU floor probe, take 2 — deque-pipelined timing (the methodology that
reproduces engine numbers; two-point scan deltas misbehave on this relay
for some program shapes).

Chains N matmul applications of DISTINCT weight arrays (24 gateup-sized
bf16 matrices = 5.6 GB) inside one jit, weights as arguments; times R
pipelined calls. Reports effective weight-streaming GB/s for:

  * pallas plain bf16 dot at B in {8, 32, 128}
  * XLA plain bf16 dot at B in {8, 128}
  * pallas v4f (i32) Q4_K kernel at B in {8, 32}  [lab cross-check]
"""

import json
import sys
import time
from collections import deque
from functools import partial

import numpy as np

sys.path.insert(0, ".")

N_MATS = 12
D_IN, D_OUT = 4096, 28672


def timed(step, x0, args, R=5):
    import jax

    probe = jax.jit(lambda c: c.ravel()[:8])
    x = step(x0, *args)
    np.asarray(probe(x))
    best = float("inf")
    for _ in range(2):
        x = x0
        pending = deque()
        t0 = time.time()
        for _ in range(R):
            x = step(x, *args)
            pending.append(probe(x))
            if len(pending) > 1:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        best = min(best, (time.time() - t0) / R)
    return best / N_MATS  # seconds per matmul


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    ws = [jax.random.normal(jax.random.PRNGKey(i), (D_IN, D_OUT), jnp.bfloat16)
          for i in range(N_MATS)]
    out = {}

    def pallas_call_dot(B, tile_in=2048, tile_out=512):
        def kernel(x_ref, w_ref, o_ref):
            j = pl.program_id(1)
            acc = jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _():
                o_ref[:] = acc

            @pl.when(j > 0)
            def _():
                o_ref[:] = o_ref[:] + acc

        def call(x, w):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, D_OUT), jnp.float32),
                grid=(D_OUT // tile_out, D_IN // tile_in),
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

        return call

    for B in (8, 32, 128):
        call = pallas_call_dot(B)

        @jax.jit
        def step(x, ws):
            for w in ws:
                y = call(x.astype(jnp.bfloat16), w)
                x = y[:, :D_IN] * 1e-9 + x
            return x

        x0 = jax.random.normal(jax.random.PRNGKey(99), (B, D_IN), jnp.float32)
        dt = timed(step, x0, (ws,))
        out[f"pallas_bf16_B{B}"] = {
            "ms": round(dt * 1e3, 3),
            "gbs": round(2 * D_IN * D_OUT / dt / 1e9, 1)}
        print(json.dumps(out), flush=True)

    for B in (8, 128):
        @jax.jit
        def step(x, ws):
            for w in ws:
                y = jnp.dot(x.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
                x = y[:, :D_IN] * 1e-9 + x
            return x

        x0 = jax.random.normal(jax.random.PRNGKey(99), (B, D_IN), jnp.float32)
        dt = timed(step, x0, (ws,))
        out[f"xla_bf16_B{B}"] = {
            "ms": round(dt * 1e3, 3),
            "gbs": round(2 * D_IN * D_OUT / dt / 1e9, 1)}
        print(json.dumps(out), flush=True)

    del ws
    # v4f quantized kernel cross-check at B 8/32
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import qmv4
    from gptq_gguf_tpu.ops.kquant import SuperGroupParams

    z = np.load("/tmp/kernel_lab_Q4_K_28672x4096.npz")
    p = SuperGroupParams(z["ss"], z["sz"], z["sq"], z["zq"])
    r0 = qmv4.pack_runtime_v4(z["q"], p, T.Q4_K)
    rs = [r0] * N_MATS  # same arrays: traffic identical per call
    nbytes = int(r0.qs.size) + 4 * int(r0.scale.size) + 4 * int(r0.offc.size)

    for B in (8, 32):
        @jax.jit
        def step(x, rs):
            for r in rs:
                y = qmv4.dequant_matmul_v4(x, r, tile_in=2048, tile_out=512)
                x = y[:, :D_IN] * 1e-9 + x
            return x

        x0 = jax.random.normal(jax.random.PRNGKey(99), (B, D_IN), jnp.float32)
        dt = timed(step, x0, (rs,))
        out[f"v4f_B{B}"] = {"ms": round(dt * 1e3, 3),
                            "gbs": round(nbytes / dt / 1e9, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
