"""DMA probe: achievable HBM->VMEM bandwidth vs block shape.

Reads a large uint8 array through a Pallas grid with near-zero compute
(one lane-reduction per block) at different block shapes, isolating the
automatic-pipelining DMA rate from dequant compute. If 512-byte-contiguous
rows read far slower than 2-4 KB rows, the qmatmul kernels' plateau at
~100 GB/s is strided-DMA-bound and wants wider tile_out (or a pre-tiled
contiguous weight layout).

Also probes the triad-style fully-contiguous flat read as the ceiling.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def probe(rows, cols, block_rows, block_cols, reps=3, passes=8):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (rows, cols), dtype=np.uint8))
    n_i, n_j = rows // block_rows, cols // block_cols

    def kernel(c_ref, a_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # touch one sublane-slice only: minimal VPU work per block (u8
        # reductions don't lower; a row-slice + widen is enough to keep
        # the block live). The carry input makes each scan step depend on
        # the previous one, so XLA can't hoist the call out of the scan.
        s = a_ref[0:1, 0:128].astype(jnp.int32).astype(jnp.float32)

        @pl.when((i == 0) & (j == 0))
        def _():
            o_ref[:] = c_ref[:]

        o_ref[:] = o_ref[:] + s

    @jax.jit
    def run(a, c0):
        def body(c, _):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                grid=(n_i, n_j),
                in_specs=[
                    pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_rows, block_cols),
                                 lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
            )(c, a)
            return o * 1e-3, None

        c, _ = jax.lax.scan(body, c0, None, length=passes)
        return jnp.sum(c)

    c0 = jnp.zeros((1, 128), jnp.float32)
    float(run(a, c0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(a, c0))
        best = min(best, time.time() - t0)
    per_pass = best / passes
    return rows * cols / per_pass / 1e9


def xla_read_bw(n_mb=512, reps=3):
    """XLA read-only ceiling: carry-dependent sum over a big f32 buffer."""
    import jax
    import jax.numpy as jnp

    n = n_mb * 2**20 // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)

    @jax.jit
    def run(x, c0):
        def body(c, _):
            return c + jnp.sum(x * (1.0 + c * 1e-30)), None

        c, _ = jax.lax.scan(body, c0, None, length=8)
        return c

    float(run(x, jnp.float32(0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(x, jnp.float32(0)))
        best = min(best, time.time() - t0)
    return n_mb * 8 / 1024 / best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    rows, cols = 2048, 28672  # gateup-shaped qs plane (~59 MB)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "array_mb": rows * cols / 2**20,
                      "xla_read_gbs": round(xla_read_bw(), 1)}), flush=True)
    for br, bc in [(1024, 512), (2048, 512), (1024, 1024), (1024, 2048),
                   (512, 2048), (1024, 4096), (512, 4096), (256, 28672),
                   (2048, 2048)]:
        if rows % br or cols % bc:
            continue
        try:
            bw = probe(rows, cols, br, bc)
            print(json.dumps({"block": [br, bc], "contig_bytes": bc,
                              "gbs": round(bw, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"block": [br, bc], "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
