"""llama-quantize-style GGUF -> GGUF requantization with mixed-type recipes.

The reference wraps the llama.cpp ``llama-quantize`` binary
(quant/gguf/run_quant.sh:12,89-147): an F16/F32 GGUF goes in, a quantized
GGUF comes out, where the *recipe* (ftype, e.g. Q4_K_M) assigns different
GGML types per tensor (output.weight gets Q6_K, select ffn_down/attn_v
layers get an upgrade, ...). This module implements that natively:

* the per-tensor type assignment mirrors llama.cpp's
  ``llama_tensor_get_type`` for the dense llama-family tensor names
  (use_more_bits layer striping included);
* K-quant tensors are fitted with ops.kquant (same math as our RTN path,
  imatrix-weighted when given) and bit-packed with formats.ggml;
* Q4_0 / Q8_0 / IQ4_NL / IQ4_XS are quantized with the formats.ggml
  round-to-nearest codecs.

``--pure`` (run_quant.sh:136-139) disables the recipe and applies the base
type to every quantizable tensor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Union

import numpy as np

from ..formats import convert, ggml
from ..formats.ggml import GGMLQuantizationType as T
from ..formats.gguf import GGUFReader, GGUFWriter

# LLAMA_FTYPE ids (llama.h) for general.file_type
FTYPE_IDS: Dict[str, int] = {
    "F32": 0, "F16": 1, "Q4_0": 2, "Q8_0": 7,
    "Q2_K": 10, "Q2_K_S": 21,
    "Q3_K_S": 11, "Q3_K_M": 12, "Q3_K_L": 13,
    "Q4_K_S": 14, "Q4_K_M": 15,
    "Q5_K_S": 16, "Q5_K_M": 17,
    "Q6_K": 18,
    "IQ4_NL": 25, "IQ4_XS": 30,
}

# base (default) tensor type per recipe
_BASE_TYPE: Dict[str, T] = {
    "F32": T.F32, "F16": T.F16, "Q4_0": T.Q4_0, "Q8_0": T.Q8_0,
    "Q2_K": T.Q2_K, "Q2_K_S": T.Q2_K,
    "Q3_K_S": T.Q3_K, "Q3_K_M": T.Q3_K, "Q3_K_L": T.Q3_K,
    "Q4_K_S": T.Q4_K, "Q4_K_M": T.Q4_K,
    "Q5_K_S": T.Q5_K, "Q5_K_M": T.Q5_K,
    "Q6_K": T.Q6_K,
    "IQ4_NL": T.IQ4_NL, "IQ4_XS": T.IQ4_XS,
}


def use_more_bits(i_layer: int, n_layers: int) -> bool:
    """llama.cpp's layer striping: first/last eighth + every third layer in
    between get the bigger type in the _M recipes."""
    return (
        i_layer < n_layers // 8
        or i_layer >= 7 * n_layers // 8
        or (i_layer - n_layers // 8) % 3 == 2
    )


def recipe_tensor_type(
    ftype: str, tensor_name: str, i_layer: int, n_layers: int, n_gqa: int = 1
) -> T:
    """Per-tensor GGML type for a recipe (llama.cpp llama_tensor_get_type,
    reduced to the dense llama-family tensor names this framework packs)."""
    base = _BASE_TYPE[ftype]
    if ftype in ("F32", "F16"):
        return base
    t = tensor_name
    if t == "output.weight":
        return T.Q8_0 if base in (T.Q4_0, T.Q8_0) else T.Q6_K
    if t == "token_embd.weight":
        if ftype in ("Q2_K", "Q2_K_S"):
            return T.Q2_K
        return base
    if ".attn_v.weight" in t:
        if ftype == "Q2_K":
            return T.Q4_K if n_gqa >= 4 else T.Q3_K
        if ftype == "Q2_K_S":
            return T.Q4_K if n_gqa >= 4 else T.Q2_K
        if ftype == "Q3_K_M":
            return T.Q5_K if i_layer < 2 else T.Q4_K
        if ftype == "Q3_K_L":
            return T.Q5_K
        if ftype in ("Q4_K_M", "Q5_K_M") and use_more_bits(i_layer, n_layers):
            return T.Q6_K
        if ftype == "Q4_K_S" and i_layer < 4:
            return T.Q5_K
        return base
    if ".ffn_down" in t:
        if ftype == "Q2_K":
            return T.Q3_K if i_layer < n_layers // 8 else T.Q2_K
        if ftype == "Q3_K_M":
            if i_layer < n_layers // 16:
                return T.Q5_K
            return T.Q4_K if use_more_bits(i_layer, n_layers) else T.Q3_K
        if ftype == "Q3_K_L":
            return T.Q5_K
        if ftype in ("Q4_K_M", "Q5_K_M") and use_more_bits(i_layer, n_layers):
            return T.Q6_K
        if ftype == "Q4_K_S" and i_layer < n_layers // 8:
            return T.Q5_K
        if ftype == "IQ4_NL" and i_layer < n_layers // 8:
            return T.Q5_K
        return base
    if ".attn_output.weight" in t:
        if ftype in ("Q2_K", "Q2_K_S"):
            return T.Q3_K
        if ftype == "Q3_K_M":
            return T.Q4_K
        if ftype == "Q3_K_L":
            return T.Q5_K
        return base
    if ".attn_qkv.weight" in t:
        if ftype == "Q3_K_M":
            return T.Q4_K
        if ftype == "Q4_K_M":
            return T.Q5_K
        if ftype == "Q5_K_M":
            return T.Q6_K
        return base
    return base


def quantize_tensor_blocks(
    w: np.ndarray,
    qtype: T,
    imatrix_row: Optional[np.ndarray] = None,
    scale_cfg=None,
) -> np.ndarray:
    """RTN-quantize a float (d_out, d_in) tensor directly to GGML blocks."""
    import jax.numpy as jnp

    from ..ops import kquant

    if qtype == T.F32:
        return np.ascontiguousarray(w.astype(np.float32)).view(np.uint8)
    if qtype == T.F16:
        return np.ascontiguousarray(w.astype(np.float16)).view(np.uint8)
    if qtype in ggml.KQUANT_SPECS:
        im = jnp.asarray(imatrix_row) if imatrix_row is not None else None
        kwargs = {"scale_cfg": scale_cfg} if scale_cfg is not None else {}
        q, p = kquant.quantize_rtn(jnp.asarray(w, jnp.float32), qtype, imatrix=im, **kwargs)
        return convert.pack_layer(
            np.asarray(q),
            np.asarray(p.super_scale), np.asarray(p.scale_q),
            np.asarray(p.super_zero), np.asarray(p.zero_q),
            qtype,
        )
    rows = w.astype(np.float32)
    if qtype == T.Q8_0:
        return ggml.quantize_q8_0(rows.reshape(-1, 32))
    if qtype == T.Q4_0:
        return ggml.quantize_q4_0(rows.reshape(-1, 32))
    if qtype in (T.IQ4_NL, T.IQ4_XS):
        be = ggml.block_elems(qtype)
        qw = None
        if imatrix_row is not None:
            qw = np.tile(np.asarray(imatrix_row, np.float32), w.shape[0]).reshape(-1, be)
        fn = ggml.quantize_iq4_nl if qtype == T.IQ4_NL else ggml.quantize_iq4_xs
        return fn(rows.reshape(-1, be), qw)
    raise NotImplementedError(f"quantize_tensor_blocks: {qtype!r}")


def _is_quantizable(name: str, shape) -> bool:
    if len(shape) < 2:
        return False
    return name.endswith(".weight") and (
        name.startswith("blk.") or name in ("token_embd.weight", "output.weight")
    ) and "norm" not in name


def llama_quantize(
    in_path: Union[str, Path],
    out_path: Union[str, Path],
    ftype: str,
    *,
    imatrix: Optional[Dict[str, np.ndarray]] = None,
    pure: bool = False,
    scale_cfg=None,
    progress: Optional[Callable[[str, str], None]] = None,
) -> Path:
    """Requantize a GGUF with a llama.cpp-style recipe.

    in_path: source .gguf (any types our dequantizers read — typically F16).
    ftype: recipe name from FTYPE_IDS (e.g. "Q4_K_M", "IQ4_XS").
    imatrix: optional per-tensor importance vectors keyed by GGUF tensor name.
    pure: apply the base type to every quantizable tensor (llama-quantize
    ``--pure``, run_quant.sh:136-139).
    """
    ftype = ftype.upper()
    if ftype not in _BASE_TYPE:
        raise ValueError(f"unknown recipe {ftype!r}; known: {sorted(_BASE_TYPE)}")
    r = GGUFReader(in_path)
    arch = r.get("general.architecture", "llama")
    n_layers = int(r.get(f"{arch}.block_count", 0) or 0)
    n_head = r.get(f"{arch}.attention.head_count", 1)
    n_kv = r.get(f"{arch}.attention.head_count_kv", n_head)
    n_gqa = max(1, (n_head or 1) // max(n_kv or 1, 1))

    w = GGUFWriter(out_path)
    for key, val in r.metadata.items():
        if key == "general.file_type":
            continue
        w.add_kv(key, val)
    w.add_kv("general.file_type", FTYPE_IDS[ftype])

    for name in r.tensor_order:
        info = r.tensors[name]
        if not _is_quantizable(name, info.shape):
            # passthrough, preserving the original encoding byte-for-byte
            w.add_tensor(name, np.asarray(r.tensor_bytes(name)),
                         raw_dtype=info.ggml_type, raw_shape=info.shape)
            continue
        i_layer = int(name.split(".")[1]) if name.startswith("blk.") else 0
        if pure:
            qtype = _BASE_TYPE[ftype]
        else:
            qtype = recipe_tensor_type(ftype, name, i_layer, n_layers, n_gqa)
        be = ggml.block_elems(qtype)
        if info.shape[-1] % be != 0 or (
            qtype in ggml.KQUANT_SPECS and info.shape[-1] % ggml.QK_K != 0
        ):
            qtype = T.F16  # llama.cpp falls back when rows don't tile
        data = r.tensor_float(name)
        im = None
        if imatrix is not None:
            im = imatrix.get(name)
        blocks = quantize_tensor_blocks(data, qtype, im, scale_cfg)
        w.add_tensor(name, blocks, raw_dtype=qtype, raw_shape=info.shape)
        if progress is not None:
            progress(name, qtype.name)
    w.write()
    return Path(out_path)
