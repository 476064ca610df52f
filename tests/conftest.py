"""Test configuration: force an 8-device virtual CPU mesh.

The reference could only test distributed behavior on real multi-GPU nodes
(SURVEY.md §4); we exploit JAX's host-platform device virtualization so every
multi-chip code path runs in CI on CPU.

Note: this environment's TPU plugin (axon) force-sets jax_platforms at
interpreter start, so the env var alone is not enough — we must update the
config after importing jax.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-program state between test modules.

    Round 4's full suite deterministically segfaulted inside XLA:CPU
    backend_compile_and_load at tests/test_tp_serving.py after ~430 green
    tests when run in ONE process (chunked runs passed 529/529) — cumulative
    compiled-program accumulation on the 8-device virtual CPU mesh. Clearing
    JAX's executable caches at module boundaries keeps the process footprint
    bounded; module-scoped fixtures (e.g. `served`) recompile at most once
    per module, which costs ~1 min across the suite.
    """
    yield
    jax.clear_caches()
