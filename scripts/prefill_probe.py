"""Prefill budget probe (VERDICT r3 #5, second half): device time of one
128-token single-slot prefill vs its compute roofline.

Decode is weight-read-bound; prefill is MXU-bound (every weight read feeds
S=128 MACs). Roofline terms at Llama-3-8B shapes:
  * compute: 2 * S * (layer params) bf16 FLOPs at the chip's MXU peak
  * weight read: the same 4.94 GB the decode step reads, overlapped

Methodology: two-point differencing over a lax.scan of chained prefill
forwards (token feedback defeats hoisting; the relay's fixed per-program
cost cancels — docs/KERNELS_r04.md). Prints JSON; paste into
docs/PROFILE_r04.md's prefill section.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    from gptq_gguf_tpu.serving import model as qmodel

    rng = np.random.default_rng(3)
    params, cfg, weight_bytes = bench.build_8b_params(512)
    S = 128
    ids0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, S)).astype(np.int32))
    cache0 = qmodel.init_cache(cfg, 1, 256, dtype=jnp.bfloat16)

    def mk(n):
        @jax.jit
        def run(ids, p, c):
            def body(ids, _):
                cc = c._replace(lengths=jnp.zeros_like(c.lengths))
                logits, _ = qmodel.forward_cached(p, cfg, ids, cc)
                tok = jnp.argmax(logits[:, -1] if logits.ndim == 3 else logits,
                                 -1).astype(jnp.int32)
                ids = ids.at[:, 0].set(tok % cfg.vocab_size)
                return ids, None
            ids, _ = jax.lax.scan(body, ids, None, length=n)
            return ids
        return run

    t = {}
    for L in (4, 16):
        run = mk(L)
        jax.device_get(run(ids0, params, cache0))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(ids0, params, cache0))
            best = min(best, time.time() - t0)
        t[L] = best
    ms = (t[16] - t[4]) / 12 * 1e3

    # roofline: per-layer matmul params (qkv+o+gateup+down) + lm_head
    layer_params = 4096 * (4096 + 2 * 1024) + 4096 * 4096 + \
        2 * 4096 * 14336 * 2 + 0  # gate+up+down counted below
    layer_params = (4096 * 6144 + 4096 * 4096 + 4096 * 28672 + 14336 * 4096)
    flops = 2 * S * (32 * layer_params + 128512 * 4096 // S)  # lm_head: last pos only
    # v5e MXU peak ~197 TFLOP/s bf16; weight read at the measured read BW
    peak = 197e12
    read_bw = bench.measure_read_bw_gbs(trials=3) * 1e9
    read_s = weight_bytes / read_bw
    sol_ms = max(flops / peak, read_s) * 1e3
    out = {
        "prefill_ms_device_two_point": round(ms, 2),
        "prompt_len": S,
        "flops_bf16": flops,
        "read_bw_gbs": round(read_bw / 1e9, 1),
        "sol_ms_compute_ceiling": round(flops / peak * 1e3, 2),
        "sol_ms_read_ceiling": round(read_s * 1e3, 2),
        "sol_ms_compute_or_read": round(sol_ms, 2),
        "frac_of_sol": round(sol_ms / ms, 3) if ms > 0 else None,
        "note": "single-slot prefill; engine pays this once per admitted "
                "request, pipelined against decode blocks",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
