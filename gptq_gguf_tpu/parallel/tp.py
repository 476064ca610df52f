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
