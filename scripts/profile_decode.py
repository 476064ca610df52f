"""Per-component breakdown of the engine decode step on the TPU.

VERDICT r2 #1 requires committed evidence attributing the SOL gap. Two
timing pitfalls on this relay-attached target shape the methodology:
  * single-dispatch wall times include tens of ms of dispatch+readback
    latency, so every component here is timed through PIPELINED chained
    calls (dispatch R runs with lagged readback, drain at the end) — the
    exact loop shape engine.generate uses;
  * loop-invariant computations get hoisted out of lax.scan by XLA, so
    every chained run carries a data dependency on the previous one.

Components (B=8, Llama-3-8B shapes, Q4_K + Q6_K lm_head):
  * full engine decode step (bench.bench_engine)
  * fused matmul stack alone (qkv/o/gateup/down x 32 via lax.scan)
  * each projection alone (x 32)
  * decode flash-attention alone (32 layers, fill ~= bench fill)
  * KV cache update (scatter) alone (64 = k+v x 32)
  * lm_head (Q6_K 4096 -> 128256) alone
  * rms norms + embed + argmax (residual ops)

Writes docs/PROFILE_r03.md and prints the JSON.
"""

import json
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")


def timed_pipelined(step, c0, R=6, probe=None):
    """Seconds per call of step(carry)->carry, dispatch overlapped.

    probe(carry) -> small array is what gets read back per step (pass one
    when the carry itself is large, e.g. a KV cache)."""
    import jax.numpy as jnp
    import jax

    probe = probe or jax.jit(lambda c: jnp.ravel(
        jax.tree_util.tree_leaves(c)[0])[:8])
    c = step(c0)
    np.asarray(probe(c))  # compile + settle
    best = float("inf")
    for _ in range(2):
        c = c0
        pending = deque()
        t0 = time.time()
        for _ in range(R):
            c = step(c)
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
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.models import llama
    from gptq_gguf_tpu.ops import qmatmul

    rng = np.random.default_rng(1)
    B, H, I, KV, L = 8, 4096, 14336, 1024, 32
    V = 128256
    rows = {}

    # --- full engine step (bench harness, already pipeline-timed) ---
    eng = bench.bench_engine(B=B, steps=24)
    rows["full_engine_step"] = eng["ms_per_step"]

    # --- matmul stack alone at fused shapes (same format as engine) ---
    mk = lambda do, di, qt=None: bench.synth_v2(rng, do, di, qt)
    layer = {"qkv": mk(H + 2 * KV, H), "o": mk(H, H),
             "gateup": mk(2 * I, H), "down": mk(H, I)}
    x0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mm = qmatmul.dequant_matmul

    per_mm = {}
    for name, r in layer.items():
        xin = jnp.asarray(rng.normal(size=(B, r.d_in)).astype(np.float32))

        @jax.jit
        def run_one(c, r=r, xin=xin):
            def body(c, _):
                y = mm(xin * (1.0 + c * 1e-30), r)
                return jnp.sum(y) * 1e-30, None
            c, _ = jax.lax.scan(body, c, None, length=32)
            return c

        per_mm[name] = timed_pipelined(run_one, jnp.float32(0)) / 32 * 1e3

    @jax.jit
    def run_stack(x):
        def body(x, _):
            qkv = mm(x, layer["qkv"])
            a = mm(qkv[:, :H], layer["o"])
            gu = mm(a, layer["gateup"])
            d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], layer["down"])
            return d * 1e-3 + x, None
        x, _ = jax.lax.scan(body, x, None, length=32)
        return x

    rows["matmul_stack_32L"] = timed_pipelined(run_stack, x0) * 1e3
    rows.update({f"matmul_{k}_32L": v * 32 for k, v in per_mm.items()})

    # --- decode attention alone (dynamic-length flash, fill like bench) ---
    fill = 128 + 4 + 16  # bench: prompt 128 + warmup + mid-run
    max_len = 2048
    k_cache = jax.random.normal(jax.random.PRNGKey(0), (B, 8, max_len, 128),
                                jnp.bfloat16)
    v_cache = jax.random.normal(jax.random.PRNGKey(1), (B, 8, max_len, 128),
                                jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 1, 128), jnp.bfloat16)
    lengths = jnp.full((B,), fill, jnp.int32)

    @jax.jit
    def run_attn(q):
        def body(c, _):
            qpos = lengths[:, None]
            o = llama.flash_attention(c, k_cache, v_cache, qpos,
                                      dynamic_length=True)
            return (c + o * 1e-6).astype(c.dtype), None
        c, _ = jax.lax.scan(body, q, None, length=32)
        return c

    rows["attention_32L"] = timed_pipelined(run_attn, q0) * 1e3

    # --- KV scatter alone ---
    newk = jax.random.normal(jax.random.PRNGKey(3), (B, 8, 1, 128), jnp.bfloat16)

    @jax.jit
    def run_scatter(kc):
        bidx = jnp.arange(B)[:, None]
        def body(kc, _):
            kc = kc.at[bidx, :, lengths[:, None], :].set(
                newk.transpose(0, 2, 1, 3) + kc[:, :1, :1, :1] * 1e-30,
                mode="drop")
            return kc, None
        kc, _ = jax.lax.scan(body, kc, None, length=64)  # 2 per layer (k+v)
        return kc

    rows["kv_scatter_64x"] = timed_pipelined(run_scatter, k_cache) * 1e3

    # --- lm_head alone ---
    lm = bench.synth_v2(rng, V, H, T.Q6_K)

    @jax.jit
    def run_lm(c):
        def body(c, _):
            y = mm(x0 * (1.0 + c * 1e-30), lm)
            return jnp.sum(y) * 1e-30, None
        c, _ = jax.lax.scan(body, c, None, length=4)
        return c

    rows["lm_head_x1"] = timed_pipelined(run_lm, jnp.float32(0)) / 4 * 1e3

    # --- residual ops: norms + embed + argmax ---
    w = jnp.ones((H,), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(4), (V, H), jnp.bfloat16) * 0.02
    toks0 = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))

    @jax.jit
    def run_resid(toks):
        x = emb[toks][:, None, :]
        def body(x, _):
            h = llama.rms_norm(x, w, 1e-5)
            h = llama.rms_norm(h, w, 1e-5)
            return (x + h * 1e-3).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=32)
        return jnp.argmax(jnp.sum(x, axis=1), axis=-1).astype(jnp.int32) % V

    rows["resid_embed_argmax"] = timed_pipelined(run_resid, toks0) * 1e3

    components = (rows["matmul_stack_32L"] + rows["attention_32L"]
                  + rows["kv_scatter_64x"] + rows["lm_head_x1"]
                  + rows["resid_embed_argmax"])
    rows["sum_of_components"] = components
    rows["unattributed_gap"] = rows["full_engine_step"] - components

    out = {"ms": {k: round(v, 3) for k, v in rows.items()},
           "engine_detail": eng,
           "note": "pipelined chained timings (dispatch overlapped), "
                   "best-of-2 medians; carry deps defeat scan hoisting"}
    print(json.dumps(out))

    with open("docs/PROFILE_r03.md", "w") as f:
        f.write("# Decode-step profile (round 3)\n\n")
        f.write("Per-component wall time of one B=8 decode step at "
                "Llama-3-8B shapes (Q4_K weights, Q6_K lm_head), measured "
                "on the TPU with pipelined chained dispatch (the loop shape "
                "engine.generate runs; synchronous per-call timings on this "
                "relay include tens of ms of dispatch latency and are not "
                "comparable).\n\n")
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
