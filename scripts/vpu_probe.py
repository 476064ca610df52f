"""VPU + read-ceiling probes (hoist-proof) for the kernel redesign.

Round-3 found the fused dequant kernels VPU-bound (~4 ops/weight at
~0.96T lane-ops/s => ~130 GB/s effective). Before redesigning, pin down:

  1. true pure-read ceiling with a non-factorable reduction
     (sum(min(x, c)) — XLA rewrites sum(x*k) to k*sum(x), which made the
     earlier 816 GB/s read_sum suspect)
  2. XLA u8 -> bf16 -> dot rate with a hoist-proof convert
  3. Pallas VPU op throughput: i32 bitwise, i32->f32/bf16 converts,
     bf16 multiplies, u16 bitwise (2-packed?), i8 ops (4-packed?)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def two_point(run, args, passes=8, reps=3):
    from functools import partial  # noqa: F401

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


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    out = {}

    # 1. hoist-proof pure read: sum(minimum(x, c)) — not factorable
    n_mb = 512
    n = n_mb * 2**20 // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)

    @partial(jax.jit, static_argnames=("steps",))
    def read_min(x, c0, steps):
        def body(c, _):
            return c * 0.5 + jnp.sum(jnp.minimum(x, c)), None
        c, _ = jax.lax.scan(body, c0, None, length=steps)
        return c

    dt = two_point(read_min, (x, jnp.float32(0)))
    out["read_min_gbs"] = round(n_mb / 1024 / dt, 1)
    del x

    # 2. hoist-proof XLA u8 -> bf16 -> dot (convert depends on carry)
    M, K2 = 16384, 32768  # (M, K2) u8 = 512 MB
    wq = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (M, K2), dtype=np.uint8))
    ones = jnp.ones((128, M), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("steps",))
    def read_dot_u8(w, c0, steps):
        def body(c, _):
            # xor with a carry-dependent u8 scalar: convert can't hoist
            mask8 = (c[0, 0] * 1e-30).astype(jnp.uint8)
            wb = (w ^ mask8).astype(jnp.bfloat16)
            y = jnp.dot(ones + c * 1e-30, wb,
                        preferred_element_type=jnp.float32)
            return y[:, : c.shape[1]] * 1e-6 + c * 0.5, None
        c, _ = jax.lax.scan(body, c0, None, length=steps)
        return jnp.sum(c)

    c0 = jnp.zeros((128, M), jnp.float32)
    dt = two_point(read_dot_u8, (wq, c0))
    out["read_dot_u8_hoistproof_gbs"] = round(n_mb / 1024 / dt, 1)
    del wq

    # 3. Pallas VPU op-throughput probes: resident VMEM data, N chained ops
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def vpu_probe(name, dtype_in, make_chain, rows=512, cols=512, n_ops=64):
        """ops/s for a chain of n_ops elementwise ops on a (rows, cols)
        VMEM-resident block."""
        if dtype_in == jnp.uint8:
            a_np = np.random.default_rng(0).integers(
                0, 255, (rows, cols), dtype=np.uint8)
        else:
            a_np = np.random.default_rng(0).normal(
                size=(rows, cols)).astype(np.float32)
        a = jnp.asarray(a_np, dtype=dtype_in)

        def kernel(c_ref, a_ref, o_ref):
            v = a_ref[:]
            v = make_chain(v, n_ops, c_ref)
            o_ref[:] = v.astype(jnp.float32)[:8, :128] + c_ref[:]

        @partial(jax.jit, static_argnames=("steps",))
        def run(a, c0, steps):
            def body(c, _):
                o = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(c, a)
                return o * 1e-3, None
            c, _ = jax.lax.scan(body, c0, None, length=steps)
            return jnp.sum(c)

        try:
            c0 = jnp.zeros((8, 128), jnp.float32)
            dt = two_point(run, (a, c0), passes=16)
            ops = rows * cols * n_ops
            return round(ops / dt / 1e9, 1)
        except Exception as e:
            return f"error: {repr(e)[:160]}"

    # i32 bitwise chain (the unpack workhorse)
    def chain_i32(v, n, c_ref):
        v = v.astype(jnp.int32)
        for i in range(n // 2):
            v = (v & 0x0F0F0F0F) | (i + 1)
        return v

    out["vpu_i32_bitwise_gops"] = vpu_probe("i32", jnp.uint8, chain_i32)

    # f32 multiply chain
    def chain_f32(v, n, c_ref):
        for i in range(n):
            v = v * np.float32(1.0000001)
        return v

    out["vpu_f32_mul_gops"] = vpu_probe("f32", jnp.float32, chain_f32)

    # bf16 multiply chain (2-packed?)
    def chain_bf16(v, n, c_ref):
        v = v.astype(jnp.bfloat16)
        for i in range(n):
            v = v * jnp.bfloat16(1.0078125)
        return v

    out["vpu_bf16_mul_gops"] = vpu_probe("bf16", jnp.float32, chain_bf16)

    # i32 -> bf16 convert chain (alternate back and forth)
    def chain_conv(v, n, c_ref):
        v = v.astype(jnp.int32)
        for i in range(n // 2):
            b = v.astype(jnp.bfloat16)
            v = b.astype(jnp.int32) | 1
        return v

    out["vpu_i32_bf16_roundtrip_gops"] = vpu_probe("conv", jnp.uint8, chain_conv)

    # u16 bitwise chain (2-packed if supported natively)
    def chain_u16(v, n, c_ref):
        v = pltpu.bitcast(v.reshape(v.shape[0], -1, 4), jnp.uint16).reshape(
            v.shape[0], -1) if False else v.astype(jnp.uint16)
        for i in range(n // 2):
            v = (v & 0x0F0F) | (i + 1)
        return v

    out["vpu_u16_bitwise_gops"] = vpu_probe("u16", jnp.uint8, chain_u16)

    # i8 bitwise chain (4-packed if supported natively)
    def chain_i8(v, n, c_ref):
        v = v.astype(jnp.int8)
        for i in range(n // 2):
            v = (v & 0x0F) | (i % 3 + 1)
        return v

    out["vpu_i8_bitwise_gops"] = vpu_probe("i8", jnp.uint8, chain_i8)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
