"""bench.py integrity tests (CPU-only, no chip needed).

Round 4's driver-scored artifact was `rc=1, KeyError: 'v2m'`: a kernel
variant was added to `bench_matmul_path`'s default variants tuple but not
to its synthetic-weight map, and bench.py was never re-run before the
snapshot (VERDICT round 4, weak #1). These tests make that class of bug
uncommittable: every benchable variant name must resolve in BOTH the
synth map and the kernel registry, and the shipped default variant must
be a real kernel.
"""

import inspect

import bench
from gptq_gguf_tpu.ops import qmatmul


def test_default_variants_resolve_in_synth_map():
    sig = inspect.signature(bench.bench_matmul_path)
    variants = sig.parameters["variants"].default
    synth = bench.matmul_synth_map()
    for name in variants:
        assert name in synth, f"bench variant {name!r} missing from synth map"


def test_default_variants_resolve_in_kernel_registry():
    sig = inspect.signature(bench.bench_matmul_path)
    variants = sig.parameters["variants"].default
    for name in variants:
        if name.startswith("v2"):
            assert name in qmatmul._V2_KERNELS, (
                f"bench variant {name!r} not in qmatmul._V2_KERNELS")
        else:
            assert name in ("v1", "v4"), f"unknown non-v2 variant {name!r}"


def test_every_v2_kernel_is_benchable():
    synth = bench.matmul_synth_map()
    for name in qmatmul._V2_KERNELS:
        assert name in synth, (
            f"kernel {name!r} registered but not benchable by name")


def test_shipped_default_variant_is_registered():
    assert qmatmul.PALLAS_V2_VARIANT in qmatmul._V2_KERNELS


def test_bench_format_is_known():
    assert bench.BENCH_FORMAT in ("v2", "v4", "v4i8")


def test_matmul_path_smoke_tiny():
    """Run the actual matmul-path bench body at tiny shapes on CPU for one
    v2 variant + v1/v4 — catches signature/shape drift, not perf."""
    import jax.numpy as jnp
    import jax.random as jrandom

    synth = bench.matmul_synth_map()
    for name in ("v1", "v2m", "v4"):
        r = synth[name](jrandom.PRNGKey(0), 256, 512)
        x = jnp.ones((2, 512), jnp.float32)
        out = qmatmul.dequant_matmul(x, r)
        assert out.shape == (2, 256)
        assert bool(jnp.all(jnp.isfinite(out)))
