"""GPTQ solve-throughput probe (VERDICT r4 #5): one qkv-shaped solve on
the real chip, first call (compile) vs steady state. Round-5 result
(TPU v5 lite, 2026-08-21): first 173.9 s / steady 0.17 s with the Pallas
column-block kernel — ~148 Mw/s for the solve step proper (the XLA scan
path this replaced was launch-overhead-bound; docs/KERNELS_r05.md)."""

import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.ops import gptq

rng = np.random.default_rng(0)
d_row, d_col = 6144, 4096
W = jnp.asarray(rng.normal(size=(d_row, d_col)).astype(np.float32) * 0.02)
X = rng.normal(size=(4096, d_col)).astype(np.float32)
H = jnp.asarray((X.T @ X) / len(X))
print("compiling solve (kernel path:", gptq._use_solve_kernel(d_row, 128), ")", flush=True)
t0 = time.time()
res = gptq.gptq_quantize_matrix(W, H, T.Q4_K)
s = float(jnp.sum(res.qweight.astype(jnp.float32)))
print(json.dumps({"first_call_s": round(time.time() - t0, 1), "qsum": s}), flush=True)
t0 = time.time()
res = gptq.gptq_quantize_matrix(W, H, T.Q4_K)
float(jnp.sum(res.qweight.astype(jnp.float32)))
print(json.dumps({"steady_s": round(time.time() - t0, 2)}), flush=True)
