"""Conversion between layer quantization artifacts and GGML block bytes.

Bridges ``ops.kquant`` outputs (integer codes + SuperGroupParams) to the
bit-exact block codecs in ``formats.ggml`` — the equivalent of the
reference's packing_utils.py dispatch in pack_gptq_into_gguf.py:326-338,
plus the inverse direction (blocks -> codes/params) which the reference
lacked entirely.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import ggml
from .ggml import GGMLQuantizationType, KQUANT_SPECS, QK_K


def pack_layer(
    qweight: np.ndarray,
    super_scale: np.ndarray,
    scale_q: np.ndarray,
    super_zero: np.ndarray,
    zero_q: np.ndarray,
    qtype: GGMLQuantizationType,
) -> np.ndarray:
    """Pack a quantized (d_row, d_col) layer into GGML blocks.

    Inputs mirror the reference layer artifact (quantizer.py:267-275):
    qweight (d_row, d_col) int codes; super_scale/super_zero (d_row, n_sg);
    scale_q/zero_q (d_row, n_groups). Returns (n_blocks, type_size) uint8.
    """
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = qweight.shape
    if d_col % QK_K != 0:
        raise ValueError(f"d_col {d_col} not divisible by {QK_K}")
    q = np.asarray(qweight).reshape(-1, QK_K)
    d = np.asarray(super_scale, dtype=np.float32).reshape(-1)
    sc = np.asarray(scale_q).reshape(-1, spec.num_groups)
    if qtype == GGMLQuantizationType.Q2_K:
        dmin = np.asarray(super_zero, dtype=np.float32).reshape(-1)
        mn = np.asarray(zero_q).reshape(-1, spec.num_groups)
        return ggml.pack_q2_k(q, d, sc, dmin, mn)
    if qtype == GGMLQuantizationType.Q3_K:
        return ggml.pack_q3_k(q, d, sc)
    if qtype == GGMLQuantizationType.Q4_K:
        dmin = np.asarray(super_zero, dtype=np.float32).reshape(-1)
        mn = np.asarray(zero_q).reshape(-1, spec.num_groups)
        return ggml.pack_q4_k(q, d, sc, dmin, mn)
    if qtype == GGMLQuantizationType.Q5_K:
        dmin = np.asarray(super_zero, dtype=np.float32).reshape(-1)
        mn = np.asarray(zero_q).reshape(-1, spec.num_groups)
        return ggml.pack_q5_k(q, d, sc, dmin, mn)
    if qtype == GGMLQuantizationType.Q6_K:
        return ggml.pack_q6_k(q, d, sc)
    raise NotImplementedError(f"pack_layer: {qtype!r}")


def unpack_layer(
    blocks: np.ndarray, qtype: GGMLQuantizationType, shape: Tuple[int, int]
):
    """Inverse of :func:`pack_layer`.

    Returns (qweight, super_scale, scale_q, super_zero, zero_q) in layer
    layout. super_zero/zero_q are zeros for the signed types.
    """
    spec = KQUANT_SPECS[qtype]
    d_row, d_col = shape
    n_sg = d_col // QK_K
    ng = n_sg * spec.num_groups
    flat = np.ascontiguousarray(blocks).view(np.uint8).reshape(-1, ggml.type_size(qtype))
    if qtype == GGMLQuantizationType.Q2_K:
        q, d, sc, dmin, mn = ggml.unpack_q2_k(flat)
    elif qtype == GGMLQuantizationType.Q3_K:
        q, d, sc = ggml.unpack_q3_k(flat)
        dmin = np.zeros_like(d)
        mn = np.zeros_like(sc)
    elif qtype == GGMLQuantizationType.Q4_K:
        q, d, sc, dmin, mn = ggml.unpack_q4_k(flat)
    elif qtype == GGMLQuantizationType.Q5_K:
        q, d, sc, dmin, mn = ggml.unpack_q5_k(flat)
    elif qtype == GGMLQuantizationType.Q6_K:
        q, d, sc = ggml.unpack_q6_k(flat)
        dmin = np.zeros_like(d)
        mn = np.zeros_like(sc)
    else:
        raise NotImplementedError(f"unpack_layer: {qtype!r}")
    return (
        q.reshape(d_row, d_col),
        d.astype(np.float16).reshape(d_row, n_sg),
        sc.reshape(d_row, ng),
        dmin.astype(np.float16).reshape(d_row, n_sg),
        mn.reshape(d_row, ng),
    )
