"""Benchmark driver: one JSON line on stdout.

Primary metric (round 4): decode tokens/s through the serving engine's
k-step scan-block decode (`engine._decode_steps_scan`, the `multi_step`
serving mode) at Llama-3-8B shapes with synthetic Q4_K-packed weights —
attention scores, KV-cache reads/writes, norms and the (Q6_K) lm_head all
included. Wall-clock includes program dispatch: it is the throughput a
server running multi_step blocks actually delivers.

``vs_baseline`` is the fraction of the READ-bound speed of light: decode
traffic is read-dominated (weights + KV in, ~64 KB of KV written per
step), so the ceiling is the measured read-only HBM bandwidth (f32
reduce, two-point). Rounds 1-3 scored against an axpy (2R+1W) stream
that measures 267 GB/s on this chip vs 743 GB/s read-only — a 2.8x-lax
denominator; the axpy SOL is still reported in detail for continuity.
Full methodology + the round-3 correction: docs/KERNELS_r04.md.

detail also carries the matmul-path microbench (v1/v2/v4 kernels,
two-point differenced) and the continuous-batching mixed-stream numbers
(real scheduler: interleaved prefill + decode, slot turnover).

Timing notes: this environment's relay serializes a ~25-55 ms fixed cost
per program execution that pipelined dispatch cannot hide. All kernel
timings here difference two scan lengths of the SAME program to cancel
it; the engine score does NOT difference it away — it amortizes it with
k=64 blocks, exactly as the multi_step engine does in production.
"""

import json
import time

import numpy as np


def measure_stream_bw_gbs(sizes_mb=(128, 256, 512), steps_lo=8, steps_hi=72,
                          trials=5, detail=None):
    """Measured streaming HBM bandwidth (2 reads + 1 write per step).

    Two-point differencing: time the same jitted scan at two lengths and
    divide the *extra* bytes by the *extra* time. The relay's fixed
    dispatch+readback latency (tens of ms on this target) cancels out —
    a single-length measurement under-reads bandwidth by 2x here, which
    round 2's pipelined engine exposed by "beating" that SOL.

    Round-3 robustness (VERDICT r2 #2/#3): the denominator swung 109-267
    GB/s across rounds. Now sweeps three buffer sizes x best-of-N trials,
    *skips* trials with non-positive time deltas (a clamped delta used to
    produce ~1e13 GB/s which max() then selected), takes the median of the
    per-size bests, and reports the spread in ``detail`` (a dict filled in
    with per-size numbers when passed)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("steps",))
    def run(x, y, steps):
        def body(c, _):
            a, b = c
            return (b, a + 0.5 * b), None

        (a, b), _ = jax.lax.scan(body, (x, y), None, length=steps)
        return jnp.sum(b)

    per_size = {}
    for n_mb in sizes_mb:
        n = n_mb * 1024 * 1024 // 4
        x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
        y = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
        float(run(x, y, steps_lo))  # compile both lengths
        float(run(x, y, steps_hi))
        bws = []
        for _ in range(trials):
            t0 = time.time()
            float(run(x, y, steps_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            float(run(x, y, steps_hi))
            t_hi = time.time() - t0
            dt = t_hi - t_lo
            if dt <= 1e-4:  # scheduling hiccup: skip, don't clamp
                continue
            bws.append(3 * n_mb * (steps_hi - steps_lo) / 1024 / dt)
        if bws:
            per_size[n_mb] = max(bws)
        del x, y
    if not per_size:
        raise RuntimeError("all stream-BW trials had non-positive deltas")
    vals = sorted(per_size.values())
    med = vals[len(vals) // 2]
    if detail is not None:
        detail["per_size_gbs"] = {k: round(v, 1) for k, v in per_size.items()}
        detail["spread_gbs"] = round(vals[-1] - vals[0], 1)
    return med


def measure_read_bw_gbs(n_mb=512, steps_lo=8, steps_hi=200, trials=7):
    """Measured read-only HBM bandwidth (f32 reduce, two-point differenced).

    Decode is read-dominated, so this — not the axpy 2R+1W stream — is the
    honest SOL denominator (scripts/read_bw_probe.py: 743 GB/s read vs
    267 GB/s axpy on this chip; the fused kernels measure 486-543 GB/s
    effective, impossible under a 267 GB/s 'ceiling').

    Robustness (round 5): the old 8-vs-72 gap put ~43 ms of device delta
    against ±10-30 ms of relay dispatch jitter, and min-dt selection then
    took the luckiest trial — one run read an impossible 1352 GB/s and
    cratered the scored ratio. Now the gap is ~96 GB of extra reads
    (~130 ms of signal) and the estimate is the MEDIAN of valid trials,
    with a physical sanity check against the bf16-read ceiling."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("steps",))
    def run(x, steps):
        def body(c, _):
            return c + jnp.sum(x * (1.0 + c * 1e-30)), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    n = n_mb * 1024 * 1024 // 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    float(run(x, steps_lo))
    float(run(x, steps_hi))
    bws = []
    for _ in range(trials):
        t0 = time.time()
        float(run(x, steps_lo))
        t_lo = time.time() - t0
        t0 = time.time()
        float(run(x, steps_hi))
        t_hi = time.time() - t0
        dt = t_hi - t_lo
        if dt > 1e-3:
            bw = n_mb / 1024 * (steps_hi - steps_lo) / dt
            if bw < 1000.0:  # bf16 read ceiling ~956 GB/s; f32 must be below
                bws.append(bw)
    if not bws:
        raise RuntimeError("all read-BW trials had non-positive deltas")
    bws.sort()
    return bws[len(bws) // 2]


def synth_v2(rng, d_out, d_in, qtype=None):
    """Random weights directly in the v2 runtime format (no fitting; codes
    and scales are arbitrary — identical HBM traffic to a real model)."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T, KQUANT_SPECS
    from gptq_gguf_tpu.ops.qmatmul import RuntimeQuantLinearV2

    qtype = qtype or T.Q4_K
    spec = KQUANT_SPECS[qtype]
    gs = spec.group_size
    per_byte = 2 if spec.bits <= 4 else 1
    n_sg = d_in // 256
    ng = d_in // gs
    d_rep = 2
    qs = jnp.asarray(rng.integers(0, 256, (d_in // per_byte, d_out), dtype=np.uint8))
    d_sg = jnp.asarray(
        np.repeat(rng.random((n_sg, d_out), np.float32) * 1e-3 + 1e-5, d_rep, axis=0)
    )
    if spec.signed:
        sc = jnp.asarray(rng.integers(-32, 32, (ng, d_out)).astype(np.int8))
        dmin = mn = None
    else:
        sc = jnp.asarray(rng.integers(0, 64, (ng, d_out), dtype=np.uint8))
        dmin = jnp.asarray(np.repeat(rng.random((n_sg, d_out), np.float32) * 1e-4, d_rep, axis=0))
        mn = jnp.asarray(rng.integers(0, 64, (ng, d_out), dtype=np.uint8))
    return RuntimeQuantLinearV2(qs, d_sg, dmin, sc, mn, d_in, gs, per_byte,
                                -spec.qmin, d_rep)


def synth_v2_dev(key, d_out, d_in, qtype=None):
    """synth_v2 generated ON DEVICE (jax.random): 32 distinct layer sets
    would take minutes of host RNG + relay uploads otherwise."""
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T, KQUANT_SPECS
    from gptq_gguf_tpu.ops.qmatmul import RuntimeQuantLinearV2

    qtype = qtype or T.Q4_K
    spec = KQUANT_SPECS[qtype]
    gs = spec.group_size
    per_byte = 2 if spec.bits <= 4 else 1
    n_sg = d_in // 256
    ng = d_in // gs
    d_rep = 2
    ks = jax.random.split(key, 5)
    qs = jax.random.randint(ks[0], (d_in // per_byte, d_out), 0, 256,
                            jnp.int32).astype(jnp.uint8)
    d_sg = jnp.repeat(
        jax.random.uniform(ks[1], (n_sg, d_out), jnp.float32) * 1e-3 + 1e-5,
        d_rep, axis=0)
    if spec.signed:
        sc = jax.random.randint(ks[2], (ng, d_out), -32, 32, jnp.int32
                                ).astype(jnp.int8)
        dmin = mn = None
    else:
        sc = jax.random.randint(ks[2], (ng, d_out), 0, 64, jnp.int32
                                ).astype(jnp.uint8)
        dmin = jnp.repeat(
            jax.random.uniform(ks[3], (n_sg, d_out), jnp.float32) * 1e-4,
            d_rep, axis=0)
        mn = jax.random.randint(ks[4], (ng, d_out), 0, 64, jnp.int32
                                ).astype(jnp.uint8)
    return RuntimeQuantLinearV2(qs, d_sg, dmin, sc, mn, d_in, gs, per_byte,
                                -spec.qmin, d_rep)


def synth_v1_dev(key, d_out, d_in, qtype=None):
    """Random weights in the v1 runtime format, generated on device."""
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T, KQUANT_SPECS
    from gptq_gguf_tpu.ops.qmatmul import RuntimeQuantLinear

    qtype = qtype or T.Q4_K
    spec = KQUANT_SPECS[qtype]
    gs = spec.group_size
    per_byte = 2 if spec.bits <= 4 else 1
    ng = d_in // gs
    ks = jax.random.split(key, 3)
    qs = jax.random.randint(ks[0], (d_in // per_byte, d_out), 0, 256,
                            jnp.int32).astype(jnp.uint8)
    scale_t = jax.random.uniform(ks[1], (ng, d_out), jnp.float32) * 1e-3 + 1e-5
    offset_t = jax.random.uniform(ks[2], (ng, d_out), jnp.float32) * 1e-4
    return RuntimeQuantLinear(qs, scale_t, offset_t, d_in, gs, per_byte)


def rql_bytes(r) -> int:
    from gptq_gguf_tpu.ops.qmatmul import RuntimeQuantLinearV2
    from gptq_gguf_tpu.ops.qmv4 import RuntimeQuantLinearV4

    if isinstance(r, RuntimeQuantLinearV4):
        n = int(r.qs.size) + r.scale.dtype.itemsize * int(r.scale.size)
        if r.offc is not None:
            n += 4 * int(r.offc.size)
        return n
    if isinstance(r, RuntimeQuantLinearV2):
        n = int(r.qs.size) + 4 * int(r.d_sg.size) + int(r.sc_q.size)
        if r.dmin_sg is not None:
            n += 4 * int(r.dmin_sg.size) + int(r.mn_q.size)
        return n
    return int(r.qs.size) + 8 * int(r.scale_t.size)


def matmul_synth_map():
    """variant name -> synthetic-weight builder. Every v2* dispatcher
    variant shares the v2 runtime format; kept in sync with
    qmatmul._V2_KERNELS so a new kernel entry is benchable by name the
    moment it exists (tests/test_bench_smoke.py pins this — round 4's
    scored artifact died on a KeyError here)."""
    synth = {"v1": synth_v1_dev,
             "v4": lambda k, do, di: synth_v4_dev(k, do, di)}
    from gptq_gguf_tpu.ops.qmatmul import _V2_KERNELS
    for _v in _V2_KERNELS:
        synth[_v] = synth_v2_dev
    return synth


def bench_matmul_path(B=8, n_lo=16, n_hi=80,
                      variants=("v1", "v2", "v2g", "v2m", "v4")):
    """Layer-chained matmul microbench at FUSED serving shapes (qkv/o/
    gateup/down — the projections the engine actually launches), two-point
    differenced over scan length so the relay's fixed per-program cost
    cancels (round-3 single-length timings under-read the kernels ~5x,
    docs/KERNELS_r04.md)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from gptq_gguf_tpu.ops import qmatmul

    H, I, KV = 4096, 14336, 1024
    n_layers = 32
    shapes = {"qkv": (H + 2 * KV, H), "o": (H, H),
              "gateup": (2 * I, H), "down": (H, I)}
    synth = matmul_synth_map()

    import jax.random as jrandom

    results = {}
    saved_variant = qmatmul.PALLAS_V2_VARIANT
    for name in variants:
        # v2-format rows race in-kernel dequant variants via the dispatcher
        qmatmul.PALLAS_V2_VARIANT = name if name.startswith("v2") else saved_variant
        key = jrandom.PRNGKey(11)
        layer = {}
        for idx, (nm, (do, di)) in enumerate(shapes.items()):
            layer[nm] = synth[name](jrandom.fold_in(key, idx), do, di)
        bytes_layer = sum(rql_bytes(r) for r in layer.values())
        x0 = jax.random.normal(jrandom.fold_in(key, 9), (B, H), jnp.float32)
        mm = qmatmul.dequant_matmul

        @partial(jax.jit, static_argnames=("n",))
        def run(x, n, layer=layer):
            def body(x, _):
                qkv = mm(x, layer["qkv"])
                a = mm(qkv[:, :H], layer["o"])
                gu = mm(a, layer["gateup"])
                d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], layer["down"])
                return d * 1e-3 + x, None

            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x)

        float(run(x0, n_lo))
        float(run(x0, n_hi))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(run(x0, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            float(run(x0, n_hi))
            t_hi = time.time() - t0
            if t_hi - t_lo > 1e-4:
                best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        dt_layer = best
        results[name] = {
            "tokens_per_s": round(B / (dt_layer * n_layers), 2),
            "ms_per_layer": round(dt_layer * 1e3, 3),
            "eff_bw_gbs": round(bytes_layer / dt_layer / 1e9, 1),
            "bytes_per_layer": bytes_layer,
        }
    qmatmul.PALLAS_V2_VARIANT = saved_variant
    return results


def synth_v4_dev(key, d_out, d_in, qtype=None, layout="i32"):
    """synth_v2_dev's v4-format sibling (random codes/scales, on device)."""
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T, KQUANT_SPECS
    from gptq_gguf_tpu.ops.qmv4 import RuntimeQuantLinearV4

    qtype = qtype or T.Q4_K
    spec = KQUANT_SPECS[qtype]
    gs = spec.group_size
    per_byte = 2 if spec.bits <= 4 else 1
    ng = d_in // gs
    ks = jax.random.split(key, 3)
    qs = jax.random.randint(ks[0], (d_in // per_byte, d_out), 0, 256,
                            jnp.int32).astype(jnp.uint8)
    scale = jax.random.uniform(ks[1], (ng, d_out), jnp.float32) * 1e-3 + 1e-5
    offc = jax.random.uniform(ks[2], (ng, d_out), jnp.float32) * 1e-4
    return RuntimeQuantLinearV4(qs, scale, offc, d_in, gs, per_byte, layout)


# engine-bench weight format: "v2" | "v4" | "v4i8" (flipped by kernel races)
BENCH_FORMAT = "v2"


def _synth_dev(key, d_out, d_in, qtype=None):
    if BENCH_FORMAT == "v2":
        return synth_v2_dev(key, d_out, d_in, qtype)
    layout = "i8" if BENCH_FORMAT == "v4i8" else "i32"
    return synth_v4_dev(key, d_out, d_in, qtype, layout=layout)


def build_8b_params(max_len=2048):
    """Synthetic Llama-3-8B-shaped quantized serving params: 32 DISTINCT
    weight sets, generated on device. Round-2 cycled 4 sets over 32 layers
    to dodge host-side generation cost; round-3 replica measurements showed
    re-reading a 0.5 GB working set streams ~20% faster than the honest
    4.4 GB stream, so cycling flattered the bench."""
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.models.llama import LlamaConfig
    from gptq_gguf_tpu.serving import model as qmodel

    V, H, I, L = 128256, 4096, 14336, 32
    cfg = LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I, num_hidden_layers=L,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=max_len, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(7)
    layers = []
    for li in range(L):
        k = jax.random.fold_in(key, li)
        ks = jax.random.split(k, 7)
        lset = {
            "input_layernorm": jnp.ones((H,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16),
            "q_proj": _synth_dev(ks[0], H, H),
            "k_proj": _synth_dev(ks[1], 1024, H),
            "v_proj": _synth_dev(ks[2], 1024, H),
            "o_proj": _synth_dev(ks[3], H, H),
            "gate_proj": _synth_dev(ks[4], I, H),
            "up_proj": _synth_dev(ks[5], I, H),
            "down_proj": _synth_dev(ks[6], H, I),
        }
        layers.append(qmodel.fuse_layer_projections(lset))  # qkv/gateup fusion
    embed = jax.random.normal(jax.random.PRNGKey(2), (V, H), jnp.bfloat16) * 0.02
    lm_head = _synth_dev(jax.random.fold_in(key, 99), V, H, T.Q6_K)
    if BENCH_FORMAT == "v2":
        from gptq_gguf_tpu.ops import qmatmul as _qm
        lm_head = _qm.pad_dout_v2(lm_head)  # 512-tile lm_head (serving does too)
    params = {"embed_tokens": embed, "layers": layers,
              "norm": jnp.ones((H,), jnp.bfloat16), "lm_head": lm_head}
    weight_bytes_layer = sum(
        rql_bytes(layers[0][k])
        for k in ("qkv_proj", "o_proj", "gateup_proj", "down_proj")
    )
    weight_bytes = weight_bytes_layer * L + rql_bytes(lm_head)
    return params, cfg, weight_bytes


def bench_engine(B=8, max_len=2048, prompt_len=128, k=128, blocks=3,
                 prebuilt=None):
    """End-to-end decode at Llama-3-8B shapes through the engine's k-step
    scan block (`engine._decode_steps_scan` — the `multi_step` serving
    mode). Wall-clock per step INCLUDES the per-block dispatch + token
    readback: it is what a multi_step server delivers. The per-token
    `_decode_step` loop round 1-3 scored pays this environment's ~42 ms
    relay cost once per TOKEN (31 ms/step observed); blocks pay it once
    per k tokens (docs/KERNELS_r04.md). Round-5 k sweep (quiet machine):
    k=64 745.8, k=128 769.3, k=192 743.0 tok/s — k=192's loss is real
    physics (longer measured window = larger average KV fill = more
    flash chunks read), so k=128 is the sweet spot and the engine's
    MULTI_STEP_AUTO_CAP matches it."""
    import jax
    import jax.numpy as jnp

    from gptq_gguf_tpu.serving import engine, model as qmodel

    rng = np.random.default_rng(1)
    params, cfg, weight_bytes = prebuilt or build_8b_params(max_len)
    V, L = cfg.vocab_size, cfg.num_hidden_layers
    # decode attention is length-aware: it reads ceil(fill/chunk) KV chunks,
    # not the whole ring; account the average fill over the measured steps
    from gptq_gguf_tpu.models.llama import FLASH_CHUNK

    steps = blocks * k
    fill0 = prompt_len + 1 + k  # after prefill + the warmup block
    fills = [fill0 + t for t in range(steps)]
    avg_chunks = float(np.mean([-(-f // FLASH_CHUNK) for f in fills]))
    kv_bytes = int(2 * L * B * 8 * FLASH_CHUNK * avg_chunks * 128 * 2)
    bytes_per_step = weight_bytes + kv_bytes

    cache = qmodel.init_cache(cfg, B, max_len, dtype=jnp.bfloat16)
    prompt = jnp.asarray(rng.integers(0, V, (1, prompt_len)).astype(np.int32))

    t_prefill = []
    for slot in range(B):
        t0 = time.time()
        tok, _, cache = engine._prefill_slot(params, cfg, prompt, cache, slot)
        np.asarray(tok)  # block_until_ready is not a reliable relay fence
        t_prefill.append(time.time() - t0)

    tokens = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))
    # warmup block: compile + settle (also advances fill to fill0)
    tokens, toks, cache = engine._decode_steps_scan(params, cfg, tokens, cache, k)
    np.asarray(toks)
    t0 = time.time()
    for _ in range(blocks):
        tokens, toks, cache = engine._decode_steps_scan(
            params, cfg, tokens, cache, k)
        np.asarray(toks)  # per-block token emit, exactly as the server does
    dt_step = (time.time() - t0) / steps

    return {
        "tokens_per_s": round(B / dt_step, 2),
        "ms_per_step": round(dt_step * 1e3, 3),
        "multi_step_k": k,
        "blocks": blocks,
        "weight_gb_per_step": round(weight_bytes / 1e9, 3),
        "kv_gb_per_step": round(kv_bytes / 1e9, 3),
        "bytes_per_step": bytes_per_step,
        "prefill_ms_steady": round(float(np.median(t_prefill[2:])) * 1e3, 1)
        if len(t_prefill) > 2 else None,
        "prompt_len": prompt_len,
        "max_len": max_len,
        "batch": B,
    }


def bench_engine_mixed(n_requests=24, B=8, max_len=1024, prebuilt=None):
    """Continuous-batching throughput under a steady mixed admit stream
    (VERDICT r2 #8): n_requests with prompt lengths cycling 3 buckets
    (64/192/448 -> pads to 64/256/512) and 24 new tokens each, run through
    the real scheduler (prefill + decode interleaved, slot turnover).
    Reports generated tokens/s and total (prompt+generated) tokens/s."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.serving import engine

    rng = np.random.default_rng(5)
    params, cfg, _ = prebuilt or build_8b_params(max_len)
    eng = engine.ContinuousBatchingEngine(
        params, cfg, num_slots=B, max_len=max_len, multi_step=8)
    prompt_lens = [64, 192, 448]
    new_tokens = 24

    # warmup: compile the decode + all three prefill buckets
    for pl_ in prompt_lens:
        eng.submit(rng.integers(0, cfg.vocab_size, (pl_,)), 2)
    eng.run_until_done()
    eng.completed.clear()

    prompts = [rng.integers(0, cfg.vocab_size, (prompt_lens[i % 3],))
               for i in range(n_requests)]
    t0 = time.time()
    for p in prompts:
        eng.submit(p, new_tokens)
    done = eng.run_until_done()
    dt = time.time() - t0
    gen = sum(len(r.output) for r in done)
    total = gen + sum(len(p) for p in prompts)
    return {
        "gen_tokens_per_s": round(gen / dt, 2),
        "total_tokens_per_s": round(total / dt, 2),
        "n_requests": n_requests,
        "prompt_lens": prompt_lens,
        "new_tokens": new_tokens,
        "wall_s": round(dt, 2),
    }


def main():
    import jax

    # persistent compilation cache: the first bench run on a chip pays
    # ~30 min of relay compiles; subsequent runs (e.g. the driver's) reuse
    # the serialized executables when the backend supports it
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    bw_detail = {}
    axpy_bw = measure_stream_bw_gbs(detail=bw_detail)
    read_bw = measure_read_bw_gbs()
    matmul = bench_matmul_path()
    prebuilt = build_8b_params(2048)
    eng = bench_engine(prebuilt=prebuilt)
    mixed = bench_engine_mixed(prebuilt=prebuilt)

    # Two ceilings (docs/KERNELS_r04.md): the read-bound SOL at measured
    # read-only HBM bandwidth is the strict, honest one for read-dominated
    # decode and is what vs_baseline scores against; the legacy axpy SOL
    # (rounds 1-3's denominator) stays in detail for continuity.
    sol_read = eng["batch"] * read_bw * 1e9 / eng["bytes_per_step"]
    sol_axpy = eng["batch"] * axpy_bw * 1e9 / eng["bytes_per_step"]
    result = {
        "metric": "engine_decode_tokens_per_s_q4k_llama8b_shapes",
        "value": eng["tokens_per_s"],
        "unit": "tokens/s/chip (B=8 multi_step decode blocks: matmuls+attention+KV+lm_head)",
        "vs_baseline": round(eng["tokens_per_s"] / max(sol_read, 1e-9), 4),
        "detail": {
            "engine": eng,
            "engine_tokens_per_s": eng["tokens_per_s"],
            "sol_tokens_per_s_read_bound": round(sol_read, 2),
            "sol_tokens_per_s_axpy_legacy": round(sol_axpy, 2),
            "vs_axpy_sol_legacy": round(
                eng["tokens_per_s"] / max(sol_axpy, 1e-9), 4),
            "read_bw_gbs": round(read_bw, 1),
            "stream_bw_gbs": round(axpy_bw, 1),
            "stream_bw_detail": bw_detail,
            "matmul_path": matmul,
            "engine_mixed": mixed,
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
