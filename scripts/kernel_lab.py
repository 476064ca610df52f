"""Kernel lab: race fused dequant-matmul variants at Llama-8B decode shapes.

Times each variant through a layer-chained lax.scan (token feedback keeps
execution real; the relay's fixed dispatch latency amortizes over N layers),
at the *fused* serving shapes the engine actually runs per layer:

    qkv    4096 -> 6144     o     4096 -> 4096
    gateup 4096 -> 28672    down 14336 -> 4096

Prints one JSON line per variant: ms/layer, effective HBM GB/s (packed
bytes / time), projected decode tokens/s for a 32-layer model (matmuls
only), plus a numerics check (max rel err vs the exact XLA dequant) on a
small shape.

Usage: python scripts/kernel_lab.py [--variants v2,v4f,...] [--steps N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_weights(rng, d_out, d_in, qtype=None):
    """Fit RTN once (disk-cached), then pack into every runtime format."""
    import os
    import jax.numpy as jnp
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import kquant, qmatmul, qmv4
    from gptq_gguf_tpu.ops.kquant import SuperGroupParams

    qtype = qtype or T.Q4_K
    cache = f"/tmp/kernel_lab_{qtype.name}_{d_out}x{d_in}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        q = z["q"]
        p = SuperGroupParams(z["ss"], z["sz"], z["sq"], z["zq"])
    else:
        wx = (rng.normal(size=(d_out, d_in)) * 0.04).astype(np.float32)
        q, p = kquant.quantize_rtn(jnp.asarray(wx), qtype)
        q = np.asarray(q)
        np.savez(cache, q=q, ss=np.asarray(p.super_scale),
                 sz=np.asarray(p.super_zero), sq=np.asarray(p.scale_q),
                 zq=np.asarray(p.zero_q))
    return {
        "v1": qmatmul.pack_runtime(q, p, qtype),
        "v2": qmatmul.pack_runtime_v2(q, p, qtype),
        "v4f": qmv4.pack_runtime_v4(q, p, qtype, scale_dtype=jnp.float32),
        "v4b": qmv4.pack_runtime_v4(q, p, qtype, scale_dtype=jnp.bfloat16),
        "v4x": qmv4.pack_runtime_v4(q, p, qtype, scale_dtype=jnp.float32,
                                    layout="i8"),
        "v4xb": qmv4.pack_runtime_v4(q, p, qtype, scale_dtype=jnp.bfloat16,
                                     layout="i8"),
    }


def rql_bytes(r) -> int:
    from gptq_gguf_tpu.ops.qmatmul import RuntimeQuantLinear, RuntimeQuantLinearV2
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
    assert isinstance(r, RuntimeQuantLinear)
    return int(r.qs.size) + 8 * int(r.scale_t.size)


def _fit_tiles(d_in, d_out, ti, to):
    ti = ti if d_in % ti == 0 else d_in
    to = to if d_out % to == 0 else min(to, d_out)
    while d_out % to:
        to //= 2
    return ti, to


def mm_for(variant, tiles=None):
    from gptq_gguf_tpu.ops import qmatmul, qmv4

    if variant == "v1":
        ti, to = tiles or (1024, 512)
        def f(x, r):
            t = _fit_tiles(r.d_in_local, r.d_out, ti, to)
            return qmatmul.dequant_matmul_pallas(x, r, tile_in=t[0], tile_out=t[1])
        return f
    if variant in ("v2", "v3", "v2f", "v2h", "v2g", "v2s", "v2m", "v2t", "v2p"):
        kv = variant
        def f(x, r):
            if tiles:
                t = _fit_tiles(r.d_in_local, r.d_out, *tiles)
            else:
                t = qmatmul.select_tiles_v2(r.d_in_local, r.d_out)
            return qmatmul.dequant_matmul_pallas_v2(
                x, r, tile_in=t[0], tile_out=t[1], variant=kv)
        return f
    if variant.startswith("v4"):
        ti, to = tiles or (2048, 512)
        def f(x, r):
            t = _fit_tiles(r.d_in_local, r.d_out, ti, to)
            return qmv4.dequant_matmul_v4(x, r, tile_in=t[0], tile_out=t[1])
        return f
    raise ValueError(variant)


def numerics_check(variant, tiles=None):
    """Max rel err of the fused kernel vs exact XLA dequant, small shape."""
    import jax.numpy as jnp
    from gptq_gguf_tpu.ops import qmv4

    rng = np.random.default_rng(7)
    packs = make_weights(rng, 512, 1024)
    key = "v2" if variant.startswith("v2") or variant == "v3" else variant
    r = packs[key]
    x = jnp.asarray(rng.normal(size=(8, 1024)).astype(np.float32))
    y = np.asarray(mm_for(variant, tiles)(x, r))
    ref = np.asarray(qmv4.dequant_matmul_xla_v4(x, packs["v4f"]))
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    return float(np.max(np.abs(y - ref) / denom))


def _effective_label(variant, packs_by_name, B):
    """Which kernel actually runs per pack (ADVICE r4: 'v2m' results on
    gs=16 packs silently measured v2g; now v2p — either way, say so)."""
    if not (variant.startswith("v2") or variant == "v3"):
        return variant
    from gptq_gguf_tpu.ops import qmatmul

    effs = {name: qmatmul.effective_v2_variant_for(p["v2"], B, variant)
            for name, p in packs_by_name.items()} if isinstance(
                next(iter(packs_by_name.values())), dict) else {}
    if not effs:
        return variant
    uniq = sorted(set(effs.values()))
    return uniq[0] if len(uniq) == 1 else effs


def bench_variant(variant, packs_by_name, B=8, N=None, tiles=None):
    """Two-point-over-scan-length timing: per-layer device time =
    (t(N_hi) - t(N_lo)) / (N_hi - N_lo). The relay costs a serialized
    ~25-55 ms per PROGRAM execution that neither synchronous nor depth-1
    pipelined loops can hide (round-3 scan_k probe: block time is linear in
    k with a ~55 ms intercept), so per-call loop timings are contaminated;
    differencing two program lengths cancels the intercept exactly."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    key = "v2" if variant.startswith("v2") or variant == "v3" else variant
    layer = {n: p[key] for n, p in packs_by_name.items()}
    bytes_layer = sum(rql_bytes(r) for r in layer.values())
    mm = mm_for(variant, tiles)

    H = layer["qkv"].d_in_local
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    def layer_step(x):
        qkv = mm(x, layer["qkv"])
        a = mm(qkv[:, :H], layer["o"])
        gu = mm(a, layer["gateup"])
        I = gu.shape[1] // 2
        d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], layer["down"])
        return d

    @partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(x, _):
            return layer_step(x) * 1e-3 + x, None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    n_lo, n_hi = 16, 80
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
    return {
        "variant": variant,
        "effective": _effective_label(variant, packs_by_name, B),
        "tiles": tiles,
        "ms_per_layer": round(dt_layer * 1e3, 3),
        "eff_bw_gbs": round(bytes_layer / dt_layer / 1e9, 1),
        "bytes_per_layer": bytes_layer,
        "proj_tokens_per_s_32L": round(B / (dt_layer * 32), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="v1,v2,v3,v4f,v4b")
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--tile-sweep", default="",
                    help="variant:ti,to;ti,to extra tile configs")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "device": str(jax.devices()[0])}), flush=True)

    rng = np.random.default_rng(0)
    H, I, KV = 4096, 14336, 1024
    shapes = {"qkv": (H + 2 * KV, H), "o": (H, H),
              "gateup": (2 * I, H), "down": (H, I)}
    t0 = time.time()
    packs_by_name = {n: make_weights(rng, do, di) for n, (do, di) in shapes.items()}
    print(json.dumps({"pack_s": round(time.time() - t0, 1)}), flush=True)

    for variant in args.variants.split(","):
        try:
            err = None if args.skip_check else numerics_check(variant)
            res = bench_variant(variant, packs_by_name, N=args.steps)
            res["max_rel_err"] = err
            print(json.dumps(res), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "error": repr(e)[:500]}),
                  flush=True)

    if args.tile_sweep:
        variant, configs = args.tile_sweep.split(":")
        for cfg in configs.split(";"):
            ti, to = (int(v) for v in cfg.split(","))
            try:
                res = bench_variant(variant, packs_by_name, N=args.steps,
                                    tiles=(ti, to))
                print(json.dumps(res), flush=True)
            except Exception as e:
                print(json.dumps({"variant": variant, "tiles": [ti, to],
                                  "error": repr(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
