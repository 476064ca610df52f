"""Per-component breakdown of the engine decode step on the TPU.

VERDICT r2 #1 / r3 #2 require committed evidence attributing the SOL gap.
Methodology (docs/KERNELS_r04.md): this relay-attached target serializes a
~25-55 ms fixed cost onto every program execution, so every component here
is timed by TWO-POINT DIFFERENCING over scan length — the same jitted
program at lengths L1 < L2, ms/iter = (t(L2) - t(L1)) / (L2 - L1) — which
cancels the relay intercept and the dispatch+readback latency. Carry data
dependencies defeat XLA's loop-invariant hoisting. All large operands are
passed as jit ARGUMENTS (closure-captured arrays get serialized into the
program and a ~0.5 GB constant breaks the relay's remote_compile).

Components (B=8, Llama-3-8B shapes, Q4_K + Q6_K lm_head):
  * engine decode step: wall (k=128 multi_step block, what a server sees)
    and device (two-point over _decode_steps_scan k=8 vs 64)
  * fused matmul stack alone (qkv/o/gateup/down x 32 via lax.scan)
  * each projection alone (x 32)
  * decode flash-attention alone (32 layers, fill ~= bench fill)
  * KV cache update (scatter) alone (64 = k+v x 32)
  * lm_head (Q6_K 4096 -> 128256) alone
  * rms norms + embed + argmax (residual ops)

Writes docs/PROFILE_r05.md and prints the JSON.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def two_point(make_run, args, L1, L2, reps=3):
    """ms per scan iteration with the relay's fixed per-program cost
    cancelled: time the same program at scan lengths L1 and L2, return
    (t2 - t1) / (L2 - L1). make_run(L) returns a jitted fn; all operands
    are ARGUMENTS, never closure constants."""
    import jax

    # NB: jax.block_until_ready is NOT a reliable execution fence on this
    # relay backend (timings collapse to ~0); a host readback is. Runners
    # must therefore return something SMALL.
    t = {}
    for L in (L1, L2):
        run = make_run(L)
        jax.device_get(run(*args))  # compile + settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(run(*args))
            best = min(best, time.time() - t0)
        t[L] = best
    return (t[L2] - t[L1]) / (L2 - L1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.models import llama
    from gptq_gguf_tpu.ops import qmatmul
    from gptq_gguf_tpu.serving import engine, model as qmodel

    rng = np.random.default_rng(1)
    B, H, I, KV, L = 8, 4096, 14336, 1024, 32
    V = 128256
    rows = {}

    def emit(k, v):
        rows[k] = v
        print(json.dumps({k: round(v, 3)}), flush=True)

    mm = qmatmul.dequant_matmul

    # --- per-projection + fused stack (packs passed as pytree args) ---
    mk = lambda do, di, qt=None: bench.synth_v2(rng, do, di, qt)
    layer = {"qkv": mk(H + 2 * KV, H), "o": mk(H, H),
             "gateup": mk(2 * I, H), "down": mk(H, I)}
    x0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    def mk_one(n):
        @jax.jit
        def run(c, xin, r):
            def body(c, _):
                y = mm(xin * (1.0 + c * 1e-30), r)
                return jnp.sum(y) * 1e-30, None
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c
        return run

    for name, r in layer.items():
        xin = jnp.asarray(rng.normal(size=(B, r.d_in)).astype(np.float32))
        emit(f"matmul_{name}_32L",
             two_point(mk_one, (jnp.float32(0), xin, r), 32, 160) * 32)

    def mk_stack(n):
        @jax.jit
        def run(x, lyr):
            def body(x, _):
                qkv = mm(x, lyr["qkv"])
                a = mm(qkv[:, :H], lyr["o"])
                gu = mm(a, lyr["gateup"])
                d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], lyr["down"])
                return d * 1e-3 + x, None
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return run

    emit("matmul_stack_32L", two_point(mk_stack, (x0, layer), 16, 80) * 32)

    # --- decode attention alone (dynamic-length flash, fill like bench) ---
    fill = 128 + 129 + 192  # bench: prompt 128 + k=128 warmup + mid-run
    max_len = 2048
    k_cache = jax.random.normal(jax.random.PRNGKey(0), (B, 8, max_len, 128),
                                jnp.bfloat16)
    v_cache = jax.random.normal(jax.random.PRNGKey(1), (B, 8, max_len, 128),
                                jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 1, 128), jnp.bfloat16)
    lengths = jnp.full((B,), fill, jnp.int32)

    def mk_attn(n):
        @jax.jit
        def run(q, kc, vc, lens):
            def body(c, _):
                o = llama.flash_attention(c, kc, vc, lens[:, None],
                                          dynamic_length=True)
                return (c + o * 1e-6).astype(c.dtype), None
            c, _ = jax.lax.scan(body, q, None, length=n)
            return c
        return run

    emit("attention_32L",
         two_point(mk_attn, (q0, k_cache, v_cache, lengths), 32, 160) * 32)

    # --- KV scatter alone ---
    newk = jax.random.normal(jax.random.PRNGKey(3), (B, 8, 1, 128), jnp.bfloat16)

    def mk_scatter(n):
        @jax.jit
        def run(kc, nk, lens):
            bidx = jnp.arange(B)[:, None]
            def body(kc, _):
                kc = kc.at[bidx, :, lens[:, None], :].set(
                    nk.transpose(0, 2, 1, 3) + kc[:, :1, :1, :1] * 1e-30,
                    mode="drop")
                return kc, None
            kc, _ = jax.lax.scan(body, kc, None, length=n)
            return jnp.sum(kc.astype(jnp.float32))  # small readback
        return run

    emit("kv_scatter_64x",
         two_point(mk_scatter, (k_cache, newk, lengths), 64, 320) * 64)

    # --- lm_head alone ---
    # pad_dout_v2 matters: unpadded 128256 rows only tile at tile_out=256
    # and the r4 profile measured THAT (1.13 ms); the engine serves the
    # 512-padded head (0.73 ms, scripts/lmhead_race.py)
    lm = qmatmul.pad_dout_v2(bench.synth_v2(rng, V, H, T.Q6_K))
    emit("lm_head_x1", two_point(mk_one, (jnp.float32(0), x0, lm), 4, 20))

    # --- residual ops: norms + embed + argmax ---
    w = jnp.ones((H,), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(4), (V, H), jnp.bfloat16) * 0.02
    toks0 = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))

    def mk_resid(n):
        @jax.jit
        def run(toks, wn, e):
            x = e[toks][:, None, :]
            def body(x, _):
                h = llama.rms_norm(x, wn, 1e-5)
                h = llama.rms_norm(h, wn, 1e-5)
                return (x + h * 1e-3).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.argmax(jnp.sum(x, axis=1), axis=-1).astype(jnp.int32) % V
        return run

    emit("resid_embed_argmax",
         two_point(mk_resid, (toks0, w, emb), 32, 160) * 32)

    # --- engine step: wall (k=64 blocks) + device (two-point over k) ---
    prebuilt = bench.build_8b_params(2048)
    eng = bench.bench_engine(prebuilt=prebuilt)
    emit("engine_step_wall_k128", eng["ms_per_step"])

    params, cfg, _ = prebuilt
    cache = qmodel.init_cache(cfg, B, 2048, dtype=jnp.bfloat16)
    prompt = jnp.asarray(rng.integers(0, V, (1, 128)).astype(np.int32))
    for slot in range(B):
        tok, _, cache = engine._prefill_slot(params, cfg, prompt, cache, slot)
    tokens = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))

    def mk_engine(k):
        def run(toks, p, c):
            _, out, _ = engine._decode_steps_scan(p, cfg, toks, c, k)
            return out
        return run

    emit("engine_step_device",
         two_point(mk_engine, (tokens, params, cache), 8, 64))

    components = (rows["matmul_stack_32L"] + rows["attention_32L"]
                  + rows["kv_scatter_64x"] + rows["lm_head_x1"]
                  + rows["resid_embed_argmax"])
    emit("sum_of_components", components)
    emit("unattributed_gap", rows["engine_step_device"] - components)

    out = {"ms": {k: round(v, 3) for k, v in rows.items()},
           "engine_detail": eng,
           "note": "two-point differenced over scan length (relay intercept "
                   "cancelled, docs/KERNELS_r04.md); carry deps defeat scan "
                   "hoisting; all operands passed as jit args"}
    print(json.dumps(out))

    full = rows["engine_step_device"]
    with open("docs/PROFILE_r05.md", "w") as f:
        f.write("# Decode-step profile (round 5)\n\n")
        f.write("Per-component DEVICE time of one B=8 decode step at "
                "Llama-3-8B shapes (Q4_K weights, Q6_K lm_head), measured "
                "on the TPU by two-point differencing over scan length "
                "(cancels this relay's ~25-55 ms fixed per-program cost; "
                "docs/KERNELS_r04.md). `engine_step_wall_k128` is the wall "
                "time a multi_step server delivers per token step, "
                "dispatch included; shares are of `engine_step_device`.\n\n")
        f.write("| component | ms/step | share of device step |\n|---|---|---|\n")
        order = ["matmul_stack_32L", "matmul_qkv_32L", "matmul_o_32L",
                 "matmul_gateup_32L", "matmul_down_32L", "attention_32L",
                 "kv_scatter_64x", "lm_head_x1", "resid_embed_argmax",
                 "sum_of_components", "unattributed_gap",
                 "engine_step_device", "engine_step_wall_k128"]
        for k in order:
            f.write(f"| {k} | {rows[k]:.2f} | {rows[k] / full * 100:.1f}% |\n")
        f.write("\nEngine detail: " + json.dumps(eng) + "\n")


if __name__ == "__main__":
    main()
