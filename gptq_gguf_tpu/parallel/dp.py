"""Data-parallel calibration utilities.

The reference shards calibration sequences per NCCL rank and all-reduces
Hessians before each solve (quant.py:176-180, gptq.py:131-132). Here the
same math happens through shardings: calibration batches are placed with
their batch axis sharded over the ``dp`` mesh axis, and the jitted
``X^T X`` inside the capture step makes XLA insert the cross-device
reduce-scatter/all-reduce automatically — no explicit collective calls in
user code, and the result is bit-equivalent to the reference's
``all_reduce(AVG)`` for balanced shards.

``hessian_allreduce_mean`` is the explicit shard_map form for flows that
accumulate per-host partial Hessians (multi-controller deployments).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(x, mesh: Mesh):
    """Place a (B, ...) batch with B sharded across dp.

    Single-controller form: every process holds the full batch. For
    multi-host runs where each process only has its own shard, use
    :func:`shard_local_batch`."""
    if jax.process_count() > 1:
        return shard_local_batch(x, mesh)
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_local_batch(x_local, mesh: Mesh):
    """Multi-host batch placement: each process contributes its LOCAL
    (B_local, ...) shard; the result is the global (B_local * n_processes,
    ...) array sharded over dp. This is the multi-host calibration data
    path — the analogue of the reference feeding each NCCL rank its own
    sequence shard (quant.py:176-180)."""
    import numpy as np

    if isinstance(x_local, jax.Array) and not x_local.is_fully_addressable:
        return x_local  # already a global array (propagated layer inputs)
    x_local = np.asarray(x_local)
    spec = P("dp", *([None] * (x_local.ndim - 1)))
    global_shape = (x_local.shape[0] * jax.process_count(),) + x_local.shape[1:]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), x_local, global_shape
    )


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def hessian_allreduce_mean(H, mesh: Mesh, axis: str = "dp"):
    """Average per-shard Hessians across the dp axis — the direct analogue of
    the reference's ``dist.all_reduce(H, AVG)`` (gptq.py:131-132)."""
    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        lambda h: jax.lax.pmean(h, axis),
        mesh=mesh,
        in_specs=P(),
        out_specs=P(),
        check_rep=False,
    )
    return fn(H)


# kept as the hook point used by quant.calibrate when a mesh is active; with
# single-controller sharded batches the Hessian is already globally reduced,
# so this is an identity on a replicated array.
def allreduce_mean_hessian(H, mesh: Mesh):
    return H
