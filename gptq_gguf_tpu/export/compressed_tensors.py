"""compressed-tensors (GPTQ W4A16) checkpoint -> Q4_0 GGUF importer.

TPU-framework equivalent of the reference's
``pack_compressed_tensors_into_gguf.py`` (:312-333 reads
``*.weight_packed/_shape/_scale`` from safetensors, :8717-8741 packs Q4_0).
The ``unpack_from_int32`` bit math is re-implemented here (the
compressed-tensors package is not available in this environment): 8 4-bit
values per int32, value j at bit (j % 8) * 4, stored with a +2^(bits-1)
offset (symmetric signed codes).

Only symmetric, non-reordered 4-bit group quantization can be represented as
Q4_0 (the reference has the same restriction and ignores
``weight_zero_point``/``weight_g_idx``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from ..formats import ggml
from ..formats.ggml import GGMLQuantizationType
from ..formats.gguf import GGUFWriter
from . import packer as packer_mod


def unpack_from_int32(packed: np.ndarray, num_bits: int, shape: Tuple[int, int]) -> np.ndarray:
    """Inverse of compressed-tensors' pack_to_int32 (packed along columns).

    packed: (rows, ceil(cols / (32/num_bits))) int32. Returns signed codes
    (rows, cols) int8 in [-2^(b-1), 2^(b-1)-1].
    """
    rows, cols = int(shape[0]), int(shape[1])
    pack_factor = 32 // num_bits
    mask = (1 << num_bits) - 1
    u = packed.view(np.uint32) if packed.dtype == np.int32 else packed.astype(np.uint32)
    out = np.empty((rows, u.shape[1] * pack_factor), dtype=np.int16)
    for j in range(pack_factor):
        out[:, j::pack_factor] = ((u >> (num_bits * j)) & mask).astype(np.int16)
    out = out[:, :cols]
    return (out - (1 << (num_bits - 1))).astype(np.int8)


def pack_q4_0_from_codes(q_signed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Signed 4-bit codes (rows, cols) + per-group scales (rows, cols/G)
    -> Q4_0 block bytes (reference pack_Q4_0, :8717-8741)."""
    rows, cols = q_signed.shape
    n_groups = scales.shape[1]
    repeat = (cols // 32) // n_groups
    if repeat * n_groups != cols // 32:
        raise ValueError(f"group count {n_groups} incompatible with {cols} cols")
    q = np.clip(q_signed.astype(np.int16) + 8, 0, 15).astype(np.uint8).reshape(-1, 32)
    d = np.repeat(scales.astype(np.float16).astype(np.float32), repeat, axis=1).reshape(-1)
    return ggml.pack_q4_0(q, d)


def _quant_config(hf_cfg: Dict[str, Any]) -> Dict[str, Any]:
    qc = hf_cfg.get("quantization_config")
    if not qc:
        raise ValueError("config.json has no quantization_config (not a "
                         "compressed-tensors checkpoint)")
    group = qc.get("config_groups", {}).get("group_0", {}).get("weights", {})
    num_bits = int(group.get("num_bits", 4))
    if num_bits != 4:
        raise NotImplementedError(f"only 4-bit supported, got {num_bits}")
    if not group.get("symmetric", True):
        raise NotImplementedError("asymmetric compressed-tensors cannot map to Q4_0")
    return {"num_bits": num_bits, "group_size": group.get("group_size", 128)}


def pack_compressed_tensors_model(
    model_dir: Union[str, Path],
    out_path: Union[str, Path],
    quant_dir: Optional[Union[str, Path]] = None,
) -> Path:
    """Produce a Q4_0 .gguf from a compressed-tensors HF checkpoint.

    model_dir: HF checkpoint with config.json (+ tokenizer); quant_dir holds
    the safetensors with *.weight_packed (defaults to model_dir — the usual
    layout has them in the main shards).
    """
    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    quant_dir = Path(quant_dir) if quant_dir is not None else model_dir
    with open(model_dir / "config.json") as f:
        hf_cfg = json.load(f)
    qc = _quant_config(hf_cfg)
    model_type = hf_cfg.get("model_type", "llama")
    spec_cls = packer_mod._ARCH_REGISTRY.get(model_type)
    if spec_cls is None:
        raise NotImplementedError(f"unsupported model_type {model_type!r}")
    spec = spec_cls(hf_cfg)

    # gather all tensors (packed shards may differ from model shards)
    tensors: Dict[str, np.ndarray] = {}
    for name, arr in _iter_safetensors(quant_dir):
        tensors[name] = arr
    if quant_dir != model_dir:
        for name, arr in _iter_safetensors(model_dir):
            tensors.setdefault(name, arr)

    writer = GGUFWriter(out_path)
    for k, v in spec.metadata().items():
        writer.add_kv(k, v)
    for k, v in packer_mod.tokenizer_metadata(model_dir, model_type).items():
        writer.add_kv(k, v)
    writer.add_kv("general.file_type", 2)  # MOSTLY_Q4_0

    seen_embed = None
    has_lm_head = False
    for name in list(tensors):
        if not name.endswith(".weight"):
            continue
        base = name[: -len(".weight")]
        gguf_name = spec.tensor_name(name)
        if gguf_name is None:
            continue
        if name == "model.embed_tokens.weight":
            seen_embed = tensors[name]
        if name == "lm_head.weight":
            has_lm_head = True
        packed_name = base + ".weight_packed"
        if packed_name in tensors:
            q = unpack_from_int32(
                tensors[packed_name], qc["num_bits"], tensors[base + ".weight_shape"]
            )
            scales = _to_f32(tensors[base + ".weight_scale"])
            if base + ".weight_g_idx" in tensors:
                g_idx = tensors[base + ".weight_g_idx"]
                if g_idx.size and not np.array_equal(
                    np.asarray(g_idx).reshape(-1),
                    np.arange(q.shape[1]) // max(int(qc["group_size"]), 1),
                ):
                    raise NotImplementedError(
                        f"{base}: act-order (g_idx) models cannot map to Q4_0"
                    )
            perm = spec.row_permutation(name, q.shape[0])
            if perm is not None:
                q, scales = q[perm], scales[perm]
            if q.shape[1] % 32 != 0:
                raise ValueError(f"{base}: cols {q.shape[1]} not a multiple of 32")
            blocks = pack_q4_0_from_codes(q, scales)
            writer.add_tensor(gguf_name, blocks,
                              raw_dtype=GGMLQuantizationType.Q4_0, raw_shape=q.shape)
        else:
            arr = _to_f32(tensors[name])
            perm = spec.row_permutation(name, arr.shape[0])
            if perm is not None:
                arr = arr[perm]
            if arr.ndim == 1 or gguf_name.endswith("_norm.weight"):
                writer.add_tensor(gguf_name, arr.astype(np.float32))
            else:
                writer.add_tensor(gguf_name, arr.astype(np.float16))

    if not has_lm_head and hf_cfg.get("tie_word_embeddings") and seen_embed is not None:
        writer.add_tensor("output.weight", _to_f32(seen_embed).astype(np.float16))
    writer.write()
    return Path(out_path)
