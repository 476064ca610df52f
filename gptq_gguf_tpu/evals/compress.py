"""Model-surgery utilities for evaluation of compressed models.

Functional equivalents of the reference's eval-time weight surgery:
* layer dropping (evopress/src/model_utils.py:130-238: ZeroMLP /
  ZeroAttention / IdentityLayer) — expressed by zeroing the sublayer output
  projections, which is numerically identical in a pre-norm residual
  architecture (the residual stream passes through unchanged);
* ``load_compressed_weights`` (eval/ppleval.py:124-152): swap layer weights
  from a multi-level database per config line or uniformly;
* ``load_sparse_weights`` (evopress/src/model_utils.py:337-362).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..models import llama


def apply_layer_drops(params, drop_config: List[str]):
    """drop_config[i] in {none, mlp, attn, attn+mlp}
    (model_utils.py:215-238)."""
    assert len(drop_config) == len(params["layers"])
    layers = []
    for layer, mode in zip(params["layers"], drop_config):
        new_layer = dict(layer)
        if mode in ("attn", "attn+mlp"):
            new_layer["o_proj"] = jnp.zeros_like(layer["o_proj"])
        if mode in ("mlp", "attn+mlp"):
            new_layer["down_proj"] = jnp.zeros_like(layer["down_proj"])
        if mode not in ("none", "attn", "mlp", "attn+mlp"):
            raise ValueError(f"bad drop mode {mode!r}")
        layers.append(new_layer)
    return {**params, "layers": layers}


def load_drop_config(path: Union[str, Path]) -> List[str]:
    """(model_utils.py:232-238)"""
    with open(path) as f:
        return [line.strip("\n") for line in f if line.strip("\n") != ""]


def _load_weight_file(path: Path) -> np.ndarray:
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    return t.float().numpy()


def load_compressed_weights(
    params,
    compressed_weights_path: Union[str, Path],
    compressed_config_path: Optional[Union[str, Path]] = None,
    default_level: Union[int, str] = 0,
):
    """Swap layer weights from a multi-level DB (ppleval.py:124-152).

    Config lines: ``<hf_layer_name>: <level>``. Without a config, every layer
    directory is loaded at ``default_level``.
    """
    root = Path(compressed_weights_path)
    if compressed_config_path:
        with open(compressed_config_path) as f:
            for line in f:
                if ":" not in line:
                    continue
                name, level = line.split(":")
                name = name.strip()
                level = level.strip().split(" ")[0]
                level = str(int(float(level))) if level.replace(".", "").isdigit() else level
                w = _load_weight_file(root / name / f"{level}.pth")
                old = llama.get_linear(params, name)
                params = llama.set_linear(params, name, jnp.asarray(w, dtype=old.dtype))
    else:
        for name in sorted(os.listdir(root)):
            if not (root / name).is_dir():
                continue
            w = _load_weight_file(root / name / f"{default_level}.pth")
            old = llama.get_linear(params, name)
            params = llama.set_linear(params, name, jnp.asarray(w, dtype=old.dtype))
    return params


load_sparse_weights = load_compressed_weights  # same mechanism (model_utils.py:337-362)
