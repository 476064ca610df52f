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
