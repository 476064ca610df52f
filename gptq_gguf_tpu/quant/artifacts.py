"""Per-layer quantization artifacts.

The reference writes one ``<save_dir>/<hf_module_name>/data.pth`` per layer
(quantizer.py:267-275) holding {q_type, qweight, super_group_scale,
super_group_zero, group_scale_quant, group_zero_quant}; the GGUF packer
consumes these (pack_gptq_into_gguf.py:310-324). We keep the directory
convention (drop-in layout compatibility) with a native ``data.npz`` format,
and can read/write the torch ``data.pth`` flavor for interop with reference
artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from ..formats.ggml import GGMLQuantizationType
from ..ops.kquant import SuperGroupParams

_KEYS = (
    "qweight",
    "super_group_scale",
    "super_group_zero",
    "group_scale_quant",
    "group_zero_quant",
)


@dataclasses.dataclass
class LayerArtifact:
    q_type: GGMLQuantizationType
    qweight: np.ndarray  # (d_row, d_col) int codes
    super_group_scale: np.ndarray  # (d_row, n_sg) fp16
    super_group_zero: np.ndarray
    group_scale_quant: np.ndarray  # (d_row, n_groups) u8/i8
    group_zero_quant: np.ndarray

    @staticmethod
    def from_result(q_type: GGMLQuantizationType, qweight, params: SuperGroupParams):
        return LayerArtifact(
            q_type=q_type,
            qweight=np.asarray(qweight),
            super_group_scale=np.asarray(params.super_scale),
            super_group_zero=np.asarray(params.super_zero),
            group_scale_quant=np.asarray(params.scale_q),
            group_zero_quant=np.asarray(params.zero_q),
        )

    def params(self) -> SuperGroupParams:
        import jax.numpy as jnp

        return SuperGroupParams(
            jnp.asarray(self.super_group_scale),
            jnp.asarray(self.super_group_zero),
            jnp.asarray(self.group_scale_quant),
            jnp.asarray(self.group_zero_quant),
        )

    def dequantize(self) -> np.ndarray:
        from ..ops import kquant
        import jax.numpy as jnp

        return np.asarray(
            kquant.dequantize(jnp.asarray(self.qweight.astype(np.int8 if self.qweight.dtype == np.int8 else np.uint8)), self.params(), self.q_type)
        )


def save_layer(save_dir: Union[str, Path], layer_name: str, art: LayerArtifact) -> Path:
    d = Path(save_dir) / layer_name
    d.mkdir(parents=True, exist_ok=True)
    np.savez(
        d / "data.npz",
        q_type=np.int32(int(art.q_type)),
        qweight=art.qweight,
        super_group_scale=art.super_group_scale.astype(np.float16),
        super_group_zero=art.super_group_zero.astype(np.float16),
        group_scale_quant=art.group_scale_quant,
        group_zero_quant=art.group_zero_quant,
    )
    return d / "data.npz"


def load_layer(save_dir: Union[str, Path], layer_name: str) -> LayerArtifact:
    d = Path(save_dir) / layer_name
    npz = d / "data.npz"
    if npz.exists():
        z = np.load(npz)
        return LayerArtifact(
            q_type=GGMLQuantizationType(int(z["q_type"])),
            qweight=z["qweight"],
            super_group_scale=z["super_group_scale"],
            super_group_zero=z["super_group_zero"],
            group_scale_quant=z["group_scale_quant"],
            group_zero_quant=z["group_zero_quant"],
        )
    pth = d / "data.pth"
    if pth.exists():
        return _load_pth(pth)
    raise FileNotFoundError(f"no artifact for layer {layer_name} in {save_dir}")


def _load_pth(path: Path) -> LayerArtifact:
    """Read a reference-format torch data.pth artifact."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return LayerArtifact(
        q_type=GGMLQuantizationType(int(obj["q_type"])),
        qweight=obj["qweight"].numpy(),
        super_group_scale=obj["super_group_scale"].numpy(),
        super_group_zero=obj["super_group_zero"].numpy(),
        group_scale_quant=obj["group_scale_quant"].numpy(),
        group_zero_quant=obj["group_zero_quant"].numpy(),
    )


def list_layers(save_dir: Union[str, Path]) -> Dict[str, Path]:
    """All layer artifact dirs under save_dir (name -> dir)."""
    out = {}
    root = Path(save_dir)
    if not root.exists():
        return out
    for data in sorted(root.rglob("data.npz")) + sorted(root.rglob("data.pth")):
        name = str(data.parent.relative_to(root))
        out.setdefault(name, data.parent)
    return out
