"""Per-component breakdown of the engine decode step on the TPU.

VERDICT r2 #1 requires committed evidence attributing the SOL gap. The
relay makes single-dispatch trace timings unreliable, so this uses the same
methodology as bench.py: each component is timed through a layer-chained
jitted loop with a host readback data dependency, and the full engine step
is timed the way engine.generate runs it. Components:

  * full engine decode step (B=8, Llama-3-8B shapes, Q4_K + Q6_K lm_head)
  * fused matmul stack alone (qkv/o/gateup/down x 32 via lax.scan)
  * decode flash-attention alone (32 layers, fill ~= bench fill)
  * KV cache update (scatter) alone
  * lm_head (Q6_K 4096 -> 128256) alone
  * rms norms + rope + embed + argmax (residual ops)

Writes docs/PROFILE_r03.md (a markdown table) and prints the JSON.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, n=3, **kw):
    """Best-of-n wall time of fn() (fn must block on the result)."""
    fn(*args, **kw)  # compile/warmup
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn(*args, **kw)
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    sys.path.insert(0, ".")
    import bench
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.models import llama
    from gptq_gguf_tpu.ops import qmatmul

    rng = np.random.default_rng(1)
    B, H, I, KV, L = 8, 4096, 14336, 1024, 32
    V = 128256
    rows = {}

    # --- full engine step (reuses bench harness) ---
    eng = bench.bench_engine(B=B, steps=24)
    rows["full_engine_step"] = eng["ms_per_step"]

    # --- matmul stack alone at fused shapes (same weights format as engine) ---
    mk = lambda do, di, qt=None: bench.synth_v2(rng, do, di, qt)
    layer = {"qkv": mk(H + 2 * KV, H), "o": mk(H, H),
             "gateup": mk(2 * I, H), "down": mk(H, I)}
    x0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mm = qmatmul.dequant_matmul

    per_mm = {}
    for name, r in layer.items():
        xin = x0 if r.d_in == H else jnp.asarray(
            rng.normal(size=(B, r.d_in)).astype(np.float32))

        @jax.jit
        def run_one(x, r=r):
            def body(c, _):
                y = mm(x, r)
                return c + jnp.sum(y) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=32)
            return c

        per_mm[name] = timed(lambda: float(run_one(xin))) / 32 * 1e3

    @jax.jit
    def run_stack(x):
        def body(x, _):
            qkv = mm(x, layer["qkv"])
            a = mm(qkv[:, :H], layer["o"])
            gu = mm(a, layer["gateup"])
            d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], layer["down"])
            return d * 1e-3 + x, None
        x, _ = jax.lax.scan(body, x, None, length=32)
        return jnp.sum(x)

    rows["matmul_stack_32L"] = timed(lambda: float(run_stack(x0))) * 1e3
    rows.update({f"matmul_{k}_32L": v * 32 for k, v in per_mm.items()})

    # --- decode attention alone (dynamic-length flash, fill like bench) ---
    fill = 128 + 4 + 16  # bench: prompt 128 + warmup + mid-run
    max_len = 2048
    k_cache = jax.random.normal(jax.random.PRNGKey(0), (B, 8, max_len, 128),
                                jnp.bfloat16)
    v_cache = jax.random.normal(jax.random.PRNGKey(1), (B, 8, max_len, 128),
                                jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 1, 128), jnp.bfloat16)
    lengths = jnp.full((B,), fill, jnp.int32)

    @jax.jit
    def run_attn(q):
        def body(c, _):
            qpos = lengths[:, None]
            o = llama.flash_attention(c, k_cache, v_cache, qpos,
                                      dynamic_length=True)
            return (c + o * 1e-6).astype(c.dtype), None
        c, _ = jax.lax.scan(body, q, None, length=32)
        return jnp.sum(c)

    rows["attention_32L"] = timed(lambda: float(run_attn(q))) * 1e3

    # --- KV scatter alone ---
    newk = jax.random.normal(jax.random.PRNGKey(3), (B, 8, 1, 128), jnp.bfloat16)

    @jax.jit
    def run_scatter(kc):
        bidx = jnp.arange(B)[:, None]
        def body(kc, _):
            kc = kc.at[bidx, :, lengths[:, None], :].set(
                newk.transpose(0, 2, 1, 3), mode="drop")
            return kc, None
        kc, _ = jax.lax.scan(body, kc, None, length=64)  # 2 per layer (k+v)
        return jnp.sum(kc[:, :, fill])

    rows["kv_scatter_64x"] = timed(lambda: float(run_scatter(k_cache))) * 1e3

    # --- lm_head alone ---
    lm = bench.synth_v2(rng, V, H, T.Q6_K)

    @jax.jit
    def run_lm(x):
        def body(c, _):
            y = mm(x, lm)
            return c + jnp.sum(y) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return c

    rows["lm_head_x1"] = timed(lambda: float(run_lm(x0))) / 8 * 1e3

    # --- residual ops: norms + rope + embed + argmax ---
    w = jnp.ones((H,), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(4), (V, H), jnp.bfloat16) * 0.02
    toks = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))

    @jax.jit
    def run_resid(toks):
        x = emb[toks][:, None, :]
        def body(x, _):
            h = llama.rms_norm(x, w, 1e-5)
            h = llama.rms_norm(h, w, 1e-5)
            return (x + h * 1e-3).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=32)
        return jnp.argmax(jnp.sum(x, axis=1), axis=-1)

    rows["resid_embed_argmax"] = timed(lambda: np.asarray(run_resid(toks))) * 1e3

    components = (rows["matmul_stack_32L"] + rows["attention_32L"]
                  + rows["kv_scatter_64x"] + rows["lm_head_x1"]
                  + rows["resid_embed_argmax"])
    rows["sum_of_components"] = components
    rows["unattributed_gap"] = rows["full_engine_step"] - components

    out = {"ms": {k: round(v, 3) for k, v in rows.items()},
           "engine_detail": eng,
           "note": "layer-chained best-of-3 timings; relay dispatch latency "
                   "amortized over chained steps"}
    print(json.dumps(out))

    with open("docs/PROFILE_r03.md", "w") as f:
        f.write("# Decode-step profile (round 3)\n\n")
        f.write("Per-component wall time of one B=8 decode step at "
                "Llama-3-8B shapes (Q4_K weights, Q6_K lm_head), measured "
                "on the TPU with the layer-chained methodology of bench.py "
                "(single-dispatch timings are unreliable through the "
                "relay).\n\n")
        f.write("| component | ms/step | share of engine step |\n|---|---|---|\n")
        full = rows["full_engine_step"]
        order = ["matmul_stack_32L", "matmul_qkv_32L", "matmul_o_32L",
                 "matmul_gateup_32L", "matmul_down_32L", "attention_32L",
                 "kv_scatter_64x", "lm_head_x1", "resid_embed_argmax",
                 "sum_of_components", "unattributed_gap", "full_engine_step"]
        for k in order:
            f.write(f"| {k} | {rows[k]:.2f} | {rows[k] / full * 100:.1f}% |\n")
        f.write("\nEngine detail: " + json.dumps(eng) + "\n")


if __name__ == "__main__":
    main()
