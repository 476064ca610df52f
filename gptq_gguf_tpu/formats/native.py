"""ctypes loader for the native GGML codec (native/ggml_codec.cpp).

Builds the shared library on first use if a compiler is available; the numpy
codecs in formats/ggml.py remain the always-available fallback and the
correctness oracle (tests assert byte equality between the two).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "ggml_codec.cpp"
_LIB_PATH = _REPO_ROOT / "native" / "libggml_codec.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GGT_DISABLE_NATIVE"):
        return None
    if not _LIB_PATH.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    for name in ("dequant_q2_k", "dequant_q3_k", "dequant_q4_k", "dequant_q5_k", "dequant_q6_k"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, f32p, i64]
        fn.restype = None
    lib.pack_q2_k.argtypes = [u8p, f32p, u8p, f32p, u8p, u8p, i64]
    lib.pack_q4_k.argtypes = [u8p, f32p, u8p, f32p, u8p, u8p, i64]
    lib.pack_q5_k.argtypes = [u8p, f32p, u8p, f32p, u8p, u8p, i64]
    lib.pack_q3_k.argtypes = [i8p, f32p, i8p, u8p, i64]
    lib.pack_q6_k.argtypes = [i8p, f32p, i8p, u8p, i64]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_dequant(qtype_name: str, blocks: np.ndarray, n_blocks: int,
                   block_elems: int = 256) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    fn = getattr(lib, f"dequant_{qtype_name.lower()}", None)
    if fn is None:
        return None
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    out = np.empty((n_blocks, block_elems), dtype=np.float32)
    fn(_ptr(blocks, ctypes.c_uint8), _ptr(out, ctypes.c_float), n_blocks)
    return out


def native_pack(qtype_name: str, q, d, sc, dmin=None, mn=None) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    n_blocks = q.shape[0]
    sizes = {"q2_k": 84, "q3_k": 110, "q4_k": 144, "q5_k": 176, "q6_k": 210}
    name = qtype_name.lower()
    out = np.empty((n_blocks, sizes[name]), dtype=np.uint8)
    d = np.ascontiguousarray(d, dtype=np.float32)
    if name in ("q2_k", "q4_k", "q5_k"):
        q = np.ascontiguousarray(q, dtype=np.uint8)
        sc = np.ascontiguousarray(sc, dtype=np.uint8)
        mn = np.ascontiguousarray(mn, dtype=np.uint8)
        dmin = np.ascontiguousarray(dmin, dtype=np.float32)
        getattr(lib, f"pack_{name}")(
            _ptr(q, ctypes.c_uint8), _ptr(d, ctypes.c_float), _ptr(sc, ctypes.c_uint8),
            _ptr(dmin, ctypes.c_float), _ptr(mn, ctypes.c_uint8),
            _ptr(out, ctypes.c_uint8), n_blocks,
        )
    else:
        q = np.ascontiguousarray(q, dtype=np.int8)
        sc = np.ascontiguousarray(sc, dtype=np.int8)
        getattr(lib, f"pack_{name}")(
            _ptr(q, ctypes.c_int8), _ptr(d, ctypes.c_float), _ptr(sc, ctypes.c_int8),
            _ptr(out, ctypes.c_uint8), n_blocks,
        )
    return out
