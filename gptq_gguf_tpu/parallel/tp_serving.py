"""Tensor-parallel serving: the quantized decode/prefill step under shard_map.

Round-1 TP serving relied on GSPMD propagating shardings through the XLA
fallback matmul (parallel/tp.py); the Pallas kernel never ran sharded. Here
the whole cached forward runs inside ``shard_map`` over the ``tp`` mesh
axis, so every device executes the fused dequant-matmul kernel on its local
weight shard and the only cross-device traffic is:

  * one psum after o_proj and one after down_proj per layer (Megatron),
  * one psum for the vocab-sharded embedding gather,
  * one tiled all_gather of the vocab-sharded logits.

KV caches are sharded over the head axis; lengths/tokens are replicated.
New design territory relative to the reference (SURVEY.md §2.3: it has no
TP at all).

Limitation: per-head q/k norms (qwen3/gemma3, weight shape (hd,)) replicate
fine, but olmo2's flat full-projection q/k norms would need head-sharding —
unsupported under TP for now.

ICI/compute overlap: the decode step is weight-bandwidth-bound, so the
Megatron-style trick of splitting each matmul into chunks to overlap the
o_proj/down_proj psums would re-read the packed weights once per chunk —
a net loss. Overlap is instead left to XLA's latency-hiding scheduler,
which issues the per-layer psums as async collectives (start/done pairs)
and schedules independent work between them; no user-level collective
calls exist in this path by design.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig
from ..ops.qmatmul import (RuntimeQuantLinear, RuntimeQuantLinearV2,
                           StackedQuantLinearV2)
from ..ops.qmv4 import RuntimeQuantLinearV4
from ..serving import model as qmodel
from ..serving.model import KVCache

_ROW_PARALLEL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                 "shared_gate", "shared_up"}
_COL_PARALLEL = {"o_proj", "down_proj", "shared_down"}
# stacked MoE expert weights: sharded like dense TP within every expert
# (routing weights replicate, so each device computes its slice of every
# routed expert and the per-layer psum folds the partials — no all-to-all)
_MOE_ROW = {"experts_gate", "experts_up"}
_MOE_COL = {"experts_down"}

# packed planes are input-dim-major: axis 0 = input dim, axis 1 = output dim
_OUT_SHARDED = P(None, "tp")
_IN_SHARDED = P("tp", None)


def _rql_spec(role: str):
    return _OUT_SHARDED if role in _ROW_PARALLEL else _IN_SHARDED


def serving_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree (leaf-aligned) for a serving param tree that may
    contain RuntimeQuantLinear(V2) leaves."""

    def rql_specs(rql, role: str):
        s = _rql_spec(role)
        if isinstance(rql, RuntimeQuantLinearV4):
            return RuntimeQuantLinearV4(
                s, s, s if rql.offc is not None else None,
                rql.d_in, rql.group_size, rql.per_byte, rql.layout,
            )
        if isinstance(rql, RuntimeQuantLinearV2):
            return RuntimeQuantLinearV2(
                s, s, s if rql.dmin_sg is not None else None,
                s, s if rql.mn_q is not None else None,
                rql.d_in, rql.group_size, rql.per_byte, rql.shift, rql.d_rep,
            )
        return RuntimeQuantLinear(s, s, s, rql.d_in, rql.group_size, rql.per_byte)

    def stacked_specs(st, role: str):
        # leading expert axis replicated; per-expert planes sharded like
        # the dense role (planes are input-dim x output-dim after axis 0)
        s2 = _rql_spec("q_proj" if role in _MOE_ROW else "o_proj")
        s = P(None, *s2)
        return StackedQuantLinearV2(
            s, s, s if st.dmin_sg is not None else None,
            s, s if st.mn_q is not None else None,
            st.d_in, st.group_size, st.per_byte, st.shift, st.d_rep,
        )

    _RQL = (RuntimeQuantLinear, RuntimeQuantLinearV2, RuntimeQuantLinearV4)

    specs: Dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            out_layers = []
            for layer in val:
                ls = {}
                for k, v in layer.items():
                    if isinstance(v, StackedQuantLinearV2):
                        ls[k] = stacked_specs(v, k)
                    elif isinstance(v, _RQL):
                        ls[k] = rql_specs(v, k)
                    elif k.endswith("_bias"):
                        ls[k] = P("tp")
                    elif k in ("q_norm", "k_norm") or v.ndim == 1:
                        ls[k] = P(None)
                    else:
                        ls[k] = P(None)
                out_layers.append(ls)
            specs["layers"] = out_layers
        elif key in ("embed_tokens", "lm_head"):
            v = params[key]
            if isinstance(v, _RQL):
                specs[key] = rql_specs(v, "q_proj")  # vocab rows = out dim
            else:
                specs[key] = P("tp", None)
        else:
            specs[key] = P(None)
    return specs


def cache_specs(cache: KVCache) -> KVCache:
    """KV sharded over the kv-head axis; lengths replicated."""
    return KVCache(
        [P(None, "tp", None, None) for _ in cache.k],
        [P(None, "tp", None, None) for _ in cache.v],
        P(None),
    )


def shard_serving_tree(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the serving tree with the TP shardings used by the
    shard_map step (global-view arrays)."""
    specs = serving_param_specs(params)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    # RQL leaves are registered pytrees, so default flattening pairs each
    # packed plane with its PartitionSpec
    return jax.tree.map(put, params, specs)


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_specs(cache)
    return KVCache(
        [jax.device_put(k, NamedSharding(mesh, s)) for k, s in zip(cache.k, specs.k)],
        [jax.device_put(v, NamedSharding(mesh, s)) for v, s in zip(cache.v, specs.v)],
        jax.device_put(cache.lengths, NamedSharding(mesh, specs.lengths)),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_decode_step(params, cfg: LlamaConfig, tokens: jax.Array, cache: KVCache,
                   mesh: Mesh):
    """One greedy decode step for all slots, sharded over the tp axis.

    Inside shard_map every _q_linear call sees only the local weight shard,
    so the Pallas kernel runs per-shard (the round-1 gap: TP silently used
    the XLA fallback, parallel/tp.py:74-77)."""
    pspecs = serving_param_specs(params)
    cspecs = cache_specs(cache)

    def step(params_l, tokens_l, cache_l):
        logits, new_cache = qmodel.forward_cached(
            params_l, cfg, tokens_l[:, None], cache_l, psum_axis="tp"
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, logits, new_cache

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, P(None), cspecs),
        out_specs=(P(None), P(None), cspecs),
        check_vma=False,
    )
    return fn(params, tokens, cache)


def paged_cache_specs(cache):
    """PagedKVCache specs: page pools (and int4 scale pools) sharded over
    the kv-head axis, block table + lengths replicated."""
    from ..serving.paged import PagedKVCache

    pool = P(None, "tp", None, None)
    return PagedKVCache(
        [pool for _ in cache.k_pages],
        [pool for _ in cache.v_pages],
        P(None, None),
        P(None),
        ([pool for _ in cache.k_s_pages]
         if cache.k_s_pages is not None else None),
        ([pool for _ in cache.v_s_pages]
         if cache.v_s_pages is not None else None),
    )


def shard_paged_cache(cache, mesh: Mesh):
    from ..serving.paged import PagedKVCache

    specs = paged_cache_specs(cache)
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    return PagedKVCache(
        [put(k, s) for k, s in zip(cache.k_pages, specs.k_pages)],
        [put(v, s) for v, s in zip(cache.v_pages, specs.v_pages)],
        put(cache.page_table, specs.page_table),
        put(cache.lengths, specs.lengths),
        ([put(k, s) for k, s in zip(cache.k_s_pages, specs.k_s_pages)]
         if cache.k_s_pages is not None else None),
        ([put(v, s) for v, s in zip(cache.v_s_pages, specs.v_s_pages)]
         if cache.v_s_pages is not None else None),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_paged_decode_step(params, cfg: LlamaConfig, tokens: jax.Array, cache,
                         mesh: Mesh):
    """One greedy decode step off the page pools, sharded over tp: each
    device walks the (replicated) block table against its local kv-head
    slice of the pools, running the Pallas paged flash-decode kernel on
    local heads (round-3; VERDICT r2 #10)."""
    pspecs = serving_param_specs(params)
    cspecs = paged_cache_specs(cache)

    def step(params_l, tokens_l, cache_l):
        from ..serving import paged as paged_mod

        logits, new_cache = paged_mod.forward_paged(
            params_l, cfg, tokens_l[:, None], cache_l, psum_axis="tp"
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, logits, new_cache

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, P(None), cspecs),
        out_specs=(P(None), P(None), cspecs),
        check_vma=False,
    )
    return fn(params, tokens, cache)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_prefill(params, cfg: LlamaConfig, prompts: jax.Array, cache: KVCache,
               n_valid: jax.Array, mesh: Mesh):
    """Prefill all B slots at once (B, S), sharded over tp."""
    pspecs = serving_param_specs(params)
    cspecs = cache_specs(cache)

    def step(params_l, prompts_l, cache_l, n_valid_l):
        logits, new_cache = qmodel.forward_cached(
            params_l, cfg, prompts_l, cache_l, n_valid=n_valid_l, psum_axis="tp"
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, new_cache

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, P(None), cspecs, P(None)),
        out_specs=(P(None), cspecs),
        check_vma=False,
    )
    return fn(params, prompts, cache, n_valid)
