"""Per-pallas-call overhead probe.

The engine step is pinned at ~28 ms regardless of weight format (v2 4.9 GB
vs v4 6.0 GB), and per-layer times scale with kernel-call count more than
with bytes. Measure the fixed cost of a pallas call on this target:

  1. N chained tiny pallas calls (negligible data) in one jit
  2. N chained tiny XLA matmuls (same chain, no pallas)
  3. N chained mid-size pallas dequant calls (o-proj sized) for scaling
"""

import json
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")


def timed(step, c0, args=(), R=6):
    import jax

    probe = jax.jit(lambda c: c.ravel()[:8])
    c = step(c0, *args)
    np.asarray(probe(c))
    best = float("inf")
    for _ in range(2):
        c = c0
        pending = deque()
        t0 = time.time()
        for _ in range(R):
            c = step(c, *args)
            pending.append(probe(c))
            if len(pending) > 1:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        best = min(best, (time.time() - t0) / R)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    out = {}

    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0000001

    def tiny_call(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    for n_calls in (32, 128, 512):
        @jax.jit
        def step(x):
            for _ in range(n_calls):
                x = tiny_call(x)
            return x

        x0 = jnp.ones((8, 128), jnp.float32)
        dt = timed(step, x0)
        out[f"tiny_pallas_{n_calls}calls_us_per_call"] = round(
            dt / n_calls * 1e6, 1)
        print(json.dumps(out), flush=True)

    # same chain as plain XLA ops
    for n_calls in (128, 512):
        @jax.jit
        def step(x):
            for _ in range(n_calls):
                x = x * 1.0000001
            return x

        x0 = jnp.ones((8, 128), jnp.float32)
        dt = timed(step, x0)
        out[f"tiny_xla_{n_calls}ops_us_per_op"] = round(dt / n_calls * 1e6, 1)
        print(json.dumps(out), flush=True)

    # mid-size: o-proj-shaped v4 dequant call (10.9 MB packed)
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import qmv4
    from gptq_gguf_tpu.ops.kquant import SuperGroupParams

    z = np.load("/tmp/kernel_lab_Q4_K_4096x4096.npz")
    p = SuperGroupParams(z["ss"], z["sz"], z["sq"], z["zq"])
    r = qmv4.pack_runtime_v4(z["q"], p, T.Q4_K)
    nbytes = int(r.qs.size) + 4 * int(r.scale.size) + 4 * int(r.offc.size)

    for n_calls in (16, 64):
        @jax.jit
        def step(x, r):
            for _ in range(n_calls):
                y = qmv4.dequant_matmul_v4(x, r, tile_in=2048, tile_out=512)
                x = y * 1e-9 + x
            return x

        x0 = jnp.ones((8, 4096), jnp.float32)
        dt = timed(step, x0, (r,))
        out[f"oproj_v4_{n_calls}calls"] = {
            "us_per_call": round(dt / n_calls * 1e6, 1),
            "eff_gbs": round(nbytes * n_calls / dt / 1e9, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
