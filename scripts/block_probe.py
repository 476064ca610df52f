"""Probe: engine decode via k-step scan blocks — device ms/step vs block size.

Times engine._decode_steps_scan at two block lengths (two-point: cancels the
relay's fixed per-program cost) AND reports the raw wall ms/step at each k
(what a server would actually see, dispatch included).
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
    from gptq_gguf_tpu.serving import engine, model as qmodel

    rng = np.random.default_rng(1)
    B, max_len, prompt_len = 8, 2048, 128
    params, cfg, weight_bytes = bench.build_8b_params(max_len)
    cache = qmodel.init_cache(cfg, B, max_len, dtype=jnp.bfloat16)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, prompt_len)).astype(np.int32))
    for slot in range(B):
        tok, _, cache = engine._prefill_slot(params, cfg, prompt, cache, slot)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)).astype(np.int32))

    results = {}
    for k in (8, 16, 32, 64):
        t, toks, c2 = engine._decode_steps_scan(params, cfg, tokens, cache, k)
        np.asarray(toks)  # compile + settle
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            t, toks, c2 = engine._decode_steps_scan(params, cfg, tokens, cache, k)
            np.asarray(toks)
            best = min(best, time.time() - t0)
        results[k] = {"wall_ms_total": round(best * 1e3, 2),
                      "wall_ms_per_step": round(best / k * 1e3, 3)}
        print(json.dumps({"k": k, **results[k]}), flush=True)

    # two-point: device step time with relay intercept cancelled
    lo, hi = 8, 64
    d = (results[hi]["wall_ms_total"] - results[lo]["wall_ms_total"]) / (hi - lo)
    print(json.dumps({"device_ms_per_step_two_point": round(d, 3),
                      "relay_intercept_ms": round(
                          results[lo]["wall_ms_total"] - d * lo, 1)}), flush=True)


if __name__ == "__main__":
    main()
