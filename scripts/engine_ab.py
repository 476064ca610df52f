"""Engine-level kernel A/B (the repo's GO/NO-GO rule, docs/KERNELS_r04.md):
run the driver-format engine bench for each requested kernel variant in a
FRESH process (the variant is baked in at trace time, so in-process flips
would silently reuse the cached program) and print one JSON line per
variant plus a verdict.

Usage: python scripts/engine_ab.py [v2g v2m ...]  (default: v2g v2m)
Run on a quiet machine: concurrent CPU load perturbs the relay wall-clock.
"""

import json
import os
import subprocess
import sys

VARIANTS = sys.argv[1:] or ["v2g", "v2m"]

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import bench
prebuilt = bench.build_8b_params(2048)
eng = bench.bench_engine(prebuilt=prebuilt)
print("ENGINE_AB " + json.dumps(eng))
"""


def main():
    results = {}
    for v in VARIANTS:
        env = dict(os.environ, GG_PALLAS_V2_VARIANT=v,
                   JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache")
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, cwd="/root/repo")
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("ENGINE_AB ")), None)
        if line is None:
            print(json.dumps({"variant": v, "error": r.stderr[-800:]}))
            continue
        results[v] = json.loads(line[len("ENGINE_AB "):])
        print(json.dumps({"variant": v, **results[v]}), flush=True)
    if len(results) >= 2:
        best = max(results, key=lambda v: results[v]["tokens_per_s"])
        print(json.dumps({"winner": best,
                          "tokens_per_s": {v: r["tokens_per_s"]
                                           for v, r in results.items()}}))


if __name__ == "__main__":
    main()
