"""Race dequant-matmul kernels at the Q6_K lm_head shape (VERDICT r4 #3).

The decode profile (docs/PROFILE_r04.md) put the lm_head at 1.13 ms of the
11.99 ms device step — ~380 GB/s effective, well under v2g's 658 GB/s at
the fused projection shapes — because Q6_K's gs=16 groups were locked out
of the group-dot kernel family. Round 5's v2p (pair-group dots) lifts
that; this probe measures ms per lm_head matmul and effective GB/s per
variant, two-point differenced over scan length.

Usage: python scripts/lmhead_race.py [--variants v2,v2g,v2p] [--b 8]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="v2,v2g,v2p")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n-lo", type=int, default=8)
    ap.add_argument("--n-hi", type=int, default=40)
    ap.add_argument("--qtype", default="Q6_K")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import bench
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import qmatmul

    V, H = 128256, 4096
    qtype = T[args.qtype]
    rql = bench.synth_v2_dev(jax.random.PRNGKey(3), V, H, qtype)
    rql = qmatmul.pad_dout_v2(rql)  # serving pads vocab rows to 512 tiles
    bytes_head = bench.rql_bytes(rql)
    tiles = qmatmul.select_tiles_v2(rql.d_in_local, rql.d_out, n_rows=args.b)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (args.b, H), jnp.float32)

    # rql must be an explicit jit ARGUMENT: closed-over weight arrays embed
    # as HLO constants and the relay's compile endpoint rejects the ~0.5 GB
    # request body (HTTP 413)
    @partial(jax.jit, static_argnames=("n", "variant"))
    def run(x, r, n, variant):
        def body(x, _):
            y = qmatmul.dequant_matmul_pallas_v2(
                x, r, tile_in=tiles[0], tile_out=tiles[1], variant=variant)
            # fold logits back to H lanes to chain the scan
            return jnp.tanh(y[:, :H]) * 1e-3 + x, None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    for variant in args.variants.split(","):
        eff = qmatmul.effective_v2_variant_for(rql, args.b, variant)

        try:
            float(run(x0, rql, args.n_lo, variant))
            float(run(x0, rql, args.n_hi, variant))
        except Exception as e:
            print(json.dumps({"variant": variant, "effective": eff,
                              "error": repr(e)[:400]}), flush=True)
            continue
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            float(run(x0, rql, args.n_lo, variant))
            t_lo = time.time() - t0
            t0 = time.time()
            float(run(x0, rql, args.n_hi, variant))
            t_hi = time.time() - t0
            if t_hi - t_lo > 1e-4:
                best = min(best, (t_hi - t_lo) / (args.n_hi - args.n_lo))
        print(json.dumps({
            "variant": variant, "effective": eff,
            "ms_per_matmul": round(best * 1e3, 3),
            "eff_bw_gbs": round(bytes_head / best / 1e9, 1),
            "bytes": bytes_head, "tiles": list(tiles), "qtype": args.qtype,
        }), flush=True)


if __name__ == "__main__":
    main()
