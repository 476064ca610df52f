"""Uniform RTN K-quant quantization — the llama-quantize replacement.

The reference shells out to the llama.cpp ``llama-quantize`` binary for
standard (non-GPTQ) K-quant models, optionally with an importance matrix
(quant/gguf/run_quant.sh:12,130-147). This module does both natively:

* :func:`compute_imatrix` — one calibration pass collecting per-column mean
  squared activations for every linear (== diag(H)/2, what llama.cpp's
  imatrix tool measures);
* :func:`rtn_quantize_model` — round-to-nearest K-quant of every selected
  layer (imatrix-weighted scale fitting when given), writing the same layer
  artifacts as the GPTQ walk so the packer/DB tooling applies unchanged;
* :func:`quantization_summary` — the size/bpw report of
  quant/gguf/run_quant.sh:282-312.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..formats.ggml import GGMLQuantizationType, KQUANT_SPECS
from ..models import llama
from ..models.llama import LlamaConfig
from ..ops import kquant
from . import artifacts
from .calibrate import _LINEAR_SPECS, _capture_step, resolve_quant_config, DEFAULT_BLOCK_QTYPE, DEFAULT_NON_BLOCK_QTYPE


def compute_imatrix(
    params, cfg: LlamaConfig, calibration_ids: Sequence[np.ndarray], batch_size: int = 1
) -> Dict[str, np.ndarray]:
    """Per-layer importance vectors (mean squared activation per input
    column) from one float-model calibration pass."""
    ids = [np.atleast_2d(np.asarray(a)) for a in calibration_ids]
    S = ids[0].shape[1]
    batches = [
        np.concatenate(ids[i : i + batch_size], axis=0)
        for i in range(0, len(ids), batch_size)
    ]
    positions = jnp.arange(S)[None, :]
    cos1, sin1 = llama.rope_cos_sin(cfg, positions)

    out: Dict[str, np.ndarray] = {}
    xs = [np.asarray(llama.embed_forward(params, jnp.asarray(b), cfg)) for b in batches]
    for li in range(cfg.num_hidden_layers):
        layer = params["layers"][li]
        sizes = {
            "qkv": cfg.hidden_size,
            "o": cfg.num_attention_heads * cfg.head_dim_,
            "gateup": cfg.hidden_size,
            "down": cfg.intermediate_size,
        }
        hs = {k: jnp.zeros((d, d), jnp.float32) for k, d in sizes.items()}
        counts = {k: jnp.zeros((), jnp.float32) for k in sizes}
        outs = []
        for x in xs:
            b = x.shape[0]
            cos = jnp.broadcast_to(cos1, (b, S, cos1.shape[-1]))
            sin = jnp.broadcast_to(sin1, (b, S, sin1.shape[-1]))
            mask = llama.causal_mask(b, S)
            o, hs, counts = _capture_step(layer, jnp.asarray(x), cos, sin, mask, hs, counts, cfg, li)
            outs.append(np.asarray(o))
        diag = {k: np.asarray(jnp.diagonal(h)) / 2.0 for k, h in hs.items()}
        for key, cap, name_tpl in _LINEAR_SPECS:
            out[name_tpl.format(i=li)] = diag[cap]
        xs = outs  # float-model propagation (imatrix measured on fp weights)
    return out


def rtn_quantize_model(
    params,
    cfg: LlamaConfig,
    quant_config: Optional[Dict[str, Any]] = None,
    save_dir: Optional[Union[str, Path]] = None,
    *,
    scale_cfg: kquant.ScaleSearchConfig = kquant.ScaleSearchConfig(),
    imatrix: Optional[Dict[str, np.ndarray]] = None,
    quant_non_block: bool = False,
    quantizable_regex: str = ".*",
):
    """Quantize every selected linear with (optionally imatrix-weighted) RTN."""
    qcfg = resolve_quant_config(quant_config)
    pattern = re.compile(quantizable_regex)

    def quantize_one(name, key, W, qtype):
        im = None
        if imatrix is not None and name in imatrix:
            im = jnp.asarray(imatrix[name])
        q, p = kquant.quantize_rtn(W.astype(jnp.float32), qtype, scale_cfg, im)
        spec = KQUANT_SPECS[qtype]
        q = q.astype(jnp.int8 if spec.signed else jnp.uint8)
        if save_dir is not None:
            artifacts.save_layer(
                save_dir, name, artifacts.LayerArtifact.from_result(qtype, q, p)
            )
        return kquant.dequantize(q, p, qtype).astype(W.dtype)

    if quant_non_block:
        for name in ["model.embed_tokens"] + (
            [] if cfg.tie_word_embeddings else ["lm_head"]
        ):
            key = name.split(".")[-1]
            qtype = qcfg.get(key, DEFAULT_NON_BLOCK_QTYPE)
            W = llama.get_linear(params, name)
            params = llama.set_linear(params, name, quantize_one(name, key, W, qtype))

    layers = []
    for li, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for key, cap, name_tpl in _LINEAR_SPECS:
            name = name_tpl.format(i=li)
            if not pattern.search(name):
                continue
            qtype = qcfg.get(key, DEFAULT_BLOCK_QTYPE)
            new_layer[key] = quantize_one(name, key, layer[key], qtype)
        layers.append(new_layer)
    return {**params, "layers": layers}


def quantization_summary(
    gguf_path: Union[str, Path], out_path: Optional[Union[str, Path]] = None
) -> Dict[str, Any]:
    """Size / bits-per-weight report (quant/gguf/run_quant.sh:282-312)."""
    from ..formats.gguf import GGUFReader
    from ..formats.ggml import BITS_PER_WEIGHT

    r = GGUFReader(gguf_path)
    per_type: Dict[str, Dict[str, int]] = {}
    total_bytes = 0
    total_elems = 0
    for name, info in r.tensors.items():
        t = per_type.setdefault(info.ggml_type.name, {"tensors": 0, "bytes": 0, "elements": 0})
        t["tensors"] += 1
        t["bytes"] += info.nbytes
        t["elements"] += info.n_elements
        total_bytes += info.nbytes
        total_elems += info.n_elements
    summary = {
        "file": str(gguf_path),
        "file_size_bytes": Path(gguf_path).stat().st_size,
        "tensor_bytes": total_bytes,
        "total_elements": total_elems,
        "bits_per_weight": 8.0 * total_bytes / max(total_elems, 1),
        "types": per_type,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=2)
    return summary
