"""Device mesh construction and axis conventions.

Replaces the reference's torch.distributed/NCCL process groups
(quant/gptq/quant.py:149-155, SURVEY.md §2.4) with JAX single-controller
SPMD: one ``jax.sharding.Mesh`` with named axes

  dp — data parallel (calibration batches, EvoPress candidate shards)
  tp — tensor parallel (weight/KV sharding for eval + serving)

Collectives are inserted by XLA from sharding annotations; explicit barriers
and rank-0 broadcasts disappear (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    If dp is None, it is inferred as n_devices // tp. tp should map to the
    fastest (ICI-adjacent) axis, so it is the innermost mesh dimension.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces dist.init_process_group, quant.py:149).

    On TPU pods with default env vars, jax.distributed.initialize() requires
    no arguments.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
