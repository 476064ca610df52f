"""Discriminate engine-vs-lab throughput contradiction.

bench_engine reads ~0.86 ms/layer-equivalent; the matmul lab reads 1.4-1.6
ms/layer for the same fused shapes. Structural difference found: the lab
CLOSED OVER weight arrays (compile-embedded constants on this relay — a
4-set unrolled variant even exceeded the remote-compile request limit),
while the engine passes params as jit arguments. Experiments, all passing
weights as arguments:

  A. lax.scan over 24 reps of one set vs unrolled python loop
  B. unrolled with 4 cycled sets vs 24 distinct sets (HBM reuse?)
  C. x dtype f32 vs bf16
"""

import json
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")


def timed_pipelined(step, c0, *args, R=5):
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    from gptq_gguf_tpu.ops import qmatmul
    from gptq_gguf_tpu.serving import model as qmodel

    rng = np.random.default_rng(1)
    B, H, I, KV = 8, 4096, 14336, 1024
    mm = qmatmul.dequant_matmul

    def mk_set():
        s = {
            "q_proj": bench.synth_v2(rng, H, H),
            "k_proj": bench.synth_v2(rng, KV, H),
            "v_proj": bench.synth_v2(rng, KV, H),
            "o_proj": bench.synth_v2(rng, H, H),
            "gate_proj": bench.synth_v2(rng, I, H),
            "up_proj": bench.synth_v2(rng, I, H),
            "down_proj": bench.synth_v2(rng, H, I),
        }
        return qmodel.fuse_layer_projections(s)

    def layer_step(x, lw):
        qkv = mm(x, lw["qkv_proj"])
        a = mm(qkv[:, :H], lw["o_proj"])
        gu = mm(a, lw["gateup_proj"])
        d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], lw["down_proj"])
        return (d * 1e-3 + x).astype(x.dtype)

    one_set = mk_set()
    bytes_layer = sum(bench.rql_bytes(one_set[k]) for k in
                      ("qkv_proj", "o_proj", "gateup_proj", "down_proj"))
    print(json.dumps({"bytes_per_layer": bytes_layer}), flush=True)

    x0f = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    x0b = x0f.astype(jnp.bfloat16)

    def report(name, dt):
        print(json.dumps({name: {
            "ms_per_layer": round(dt * 1e3, 3),
            "eff_bw_gbs": round(bytes_layer / dt / 1e9, 1)}}), flush=True)

    @jax.jit
    def run_scan(x, lw):
        def body(x, _):
            return layer_step(x, lw), None
        x, _ = jax.lax.scan(body, x, None, length=24)
        return x

    report("scan_1set_f32_args", timed_pipelined(run_scan, x0f, one_set) / 24)

    @jax.jit
    def run_unrolled(x, lw):
        for _ in range(24):
            x = layer_step(x, lw)
        return x

    report("unrolled_1set_f32_args",
           timed_pipelined(run_unrolled, x0f, one_set) / 24)
    report("unrolled_1set_bf16_args",
           timed_pipelined(run_unrolled, x0b, one_set) / 24)

    sets4 = [one_set] + [mk_set() for _ in range(3)]

    @jax.jit
    def run_4sets(x, sets):
        for i in range(24):
            x = layer_step(x, sets[i % 4])
        return x

    report("unrolled_4sets_bf16_args",
           timed_pipelined(run_4sets, x0b, sets4) / 24)

    sets24 = sets4 + [mk_set() for _ in range(20)]

    @jax.jit
    def run_24sets(x, sets):
        for i in range(24):
            x = layer_step(x, sets[i])
        return x

    report("unrolled_24sets_bf16_args",
           timed_pipelined(run_24sets, x0b, sets24) / 24)


if __name__ == "__main__":
    main()
