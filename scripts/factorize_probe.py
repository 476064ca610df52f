"""Factorization-cost probe (round 5): where the warm-cache GPTQ walk's
remaining factorize_solve time goes. Times, two calls each (first =
compile), on the real chip:

  * _factorize_device at d_col 4096 and 14336 (Cholesky + explicit
    triangular inverse — the reference's linalg pipeline, gptq.py:304-324)
  * the blocked triangular inverse (_trinv_blocked) at the same sizes
  * one full gptq_quantize_matrix per walk shape (qkv/o/gateup/down)

Usage: python scripts/factorize_probe.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t2(fn, *args):
    """(first_s, steady_s) — steady is best of 2 post-compile calls."""
    t0 = time.time()
    jax_block(fn(*args))
    first = time.time() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax_block(fn(*args))
        best = min(best, time.time() - t0)
    return round(first, 2), round(best, 3)


def jax_block(x):
    import jax

    # np readback of a scalar-ish reduce: reliable fence on the relay
    import jax.numpy as jnp

    return np.asarray(jnp.sum(x[0] if isinstance(x, tuple) else x))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
    from gptq_gguf_tpu.ops import gptq

    rng = np.random.default_rng(0)
    out = {}
    for n in (4096, 14336):
        A = rng.normal(size=(n, n)).astype(np.float32)
        H = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
        out[f"factorize_device_{n}"] = t2(gptq._factorize_device, H)
        print(json.dumps({f"factorize_device_{n}":
                          out[f"factorize_device_{n}"]}), flush=True)

    shapes = {"qkv": (6144, 4096), "o": (4096, 4096),
              "gateup": (28672, 4096), "down": (4096, 14336)}
    for name, (d_row, d_col) in shapes.items():
        W = jnp.asarray(rng.normal(size=(d_row, d_col)).astype(np.float32) * 0.02)
        X = rng.normal(size=(2048, d_col)).astype(np.float32)
        H = jnp.asarray((X.T @ X) / len(X))

        def run(W=W, H=H):
            return gptq.gptq_quantize_matrix(W, H, T.Q4_K).qweight.astype(
                jnp.float32)

        out[f"solve_{name}"] = t2(run)
        print(json.dumps({f"solve_{name}": out[f"solve_{name}"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
