"""Tensor-parallel shardings for the Llama param pytree.

New design territory relative to the reference (SURVEY.md §2.3: the
reference has no TP at all). Standard Megatron-style partitioning expressed
as PartitionSpecs; XLA inserts the all-reduces at o_proj/down_proj outputs:

  q/k/v_proj   (out, in)  -> rows sharded over tp (head-parallel)
  o_proj       (out, in)  -> columns sharded over tp
  gate/up_proj (out, in)  -> rows sharded
  down_proj    (out, in)  -> columns sharded
  embed/lm_head (V, H)    -> vocab rows sharded
  norms                   -> replicated
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig

_LAYER_SPECS: Dict[str, P] = {
    "q_proj": P("tp", None),
    "k_proj": P("tp", None),
    "v_proj": P("tp", None),
    "o_proj": P(None, "tp"),
    "gate_proj": P("tp", None),
    "up_proj": P("tp", None),
    "down_proj": P(None, "tp"),
    "q_bias": P("tp"),
    "k_bias": P("tp"),
    "v_bias": P("tp"),
    "q_norm": P(None),
    "k_norm": P(None),
    "input_layernorm": P(None),
    "post_attention_layernorm": P(None),
}


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params pytree."""
    specs: Dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            specs["layers"] = [
                {k: _LAYER_SPECS.get(k, P(None)) for k in layer} for layer in val
            ]
        elif key in ("embed_tokens", "lm_head"):
            specs[key] = P("tp", None)
        else:
            specs[key] = P(None)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place params on the mesh with TP shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def shard_serving_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """TP-shard a serving param tree that may contain RuntimeQuantLinear
    leaves: row-parallel linears (q/k/v/gate/up) shard the output dim,
    column-parallel (o/down) shard the input dim; packed code/scale arrays
    shard along the matching axis.

    On CPU test meshes the quantized matmuls run through the XLA fallback
    and XLA inserts the collectives; the Pallas kernel + shard_map serving
    path is multi-chip follow-up work.
    """
    from ..ops.qmatmul import RuntimeQuantLinear, RuntimeQuantLinearV2

    row_parallel = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    col_parallel = {"o_proj", "down_proj"}

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def shard_rql(rql, role: str):
        # row-parallel shards the output dim = axis 1 of every plane
        # (input-dim-major layout); column-parallel shards the input dim
        spec = P(None, "tp") if role in row_parallel else P("tp", None)
        if isinstance(rql, RuntimeQuantLinearV2):
            return RuntimeQuantLinearV2(
                put(rql.qs, spec),
                put(rql.d_sg, spec),
                put(rql.dmin_sg, spec) if rql.dmin_sg is not None else None,
                put(rql.sc_q, spec),
                put(rql.mn_q, spec) if rql.mn_q is not None else None,
                rql.d_in, rql.group_size, rql.per_byte, rql.shift, rql.d_rep,
            )
        return RuntimeQuantLinear(
            put(rql.qs, spec),
            put(rql.scale_t, spec),
            put(rql.offset_t, spec),
            rql.d_in, rql.group_size, rql.per_byte,
        )

    out = dict(params)
    layers = []
    for layer in params["layers"]:
        new_layer = {}
        for key, val in layer.items():
            if isinstance(val, (RuntimeQuantLinear, RuntimeQuantLinearV2)):
                new_layer[key] = shard_rql(val, key)
            else:
                spec = _LAYER_SPECS.get(key, P(None))
                if isinstance(val, jax.Array) and val.ndim < len([a for a in spec if a]):
                    spec = P(None)
                new_layer[key] = put(val, spec if val.ndim == 2 or key.endswith("_bias") else P(None))
        layers.append(new_layer)
    out["layers"] = layers
    for key in ("embed_tokens", "lm_head"):
        if key in out and isinstance(out[key], jax.Array):
            out[key] = put(out[key], P("tp", None))
        elif key in out:
            from ..ops.qmatmul import RuntimeQuantLinear as RQL

            if isinstance(out[key], RQL):
                out[key] = shard_rql(out[key], "q_proj")
    if "norm" in out:
        out["norm"] = put(out["norm"], P(None))
    return out
