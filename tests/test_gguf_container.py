"""GGUF v3 container round-trip tests (reader/writer)."""

import numpy as np
import pytest

from gptq_gguf_tpu.formats import ggml
from gptq_gguf_tpu.formats.gguf import (
    GGUFReader,
    GGUFValue,
    GGUFValueType,
    GGUFWriter,
)

RNG = np.random.default_rng(1)


def test_kv_roundtrip(tmp_path):
    path = tmp_path / "kv.gguf"
    w = GGUFWriter(path, arch="llama")
    w.add_kv("test.u32", 7)
    w.add_kv("test.i32", -7)
    w.add_kv("test.u64", 2**40)
    w.add_kv("test.f32", 0.25)
    w.add_kv("test.bool", True)
    w.add_kv("test.str", "hello world")
    w.add_kv("test.arr_i", [1, 2, 3], vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.INT32)
    w.add_kv("test.arr_f", [1.5, 2.5], vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.FLOAT32)
    w.add_kv("test.arr_s", ["a", "bb", "ccc"])
    w.add_kv("test.typed", GGUFValue(GGUFValueType.UINT8, 3))
    w.write()

    r = GGUFReader(path)
    assert r.version == 3
    assert r.get("general.architecture") == "llama"
    assert r.get("test.u32") == 7
    assert r.metadata["test.u32"].type == GGUFValueType.UINT32
    assert r.get("test.i32") == -7
    assert r.metadata["test.i32"].type == GGUFValueType.INT32
    assert r.get("test.u64") == 2**40
    assert r.get("test.f32") == 0.25
    assert r.get("test.bool") is True
    assert r.get("test.str") == "hello world"
    assert r.get("test.arr_i") == [1, 2, 3]
    assert r.metadata["test.arr_i"].elem_type == GGUFValueType.INT32
    assert r.get("test.arr_f") == [1.5, 2.5]
    assert r.get("test.arr_s") == ["a", "bb", "ccc"]
    assert r.get("test.typed") == 3
    assert r.metadata["test.typed"].type == GGUFValueType.UINT8


def test_tensor_roundtrip_float(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, arch="llama")
    a = RNG.normal(size=(4, 256)).astype(np.float32)
    b = RNG.normal(size=(8, 32)).astype(np.float16)
    w.add_tensor("a.weight", a)
    w.add_tensor("b.weight", b)
    w.write()

    r = GGUFReader(path)
    assert r.tensor_order == ["a.weight", "b.weight"]
    ai = r.tensors["a.weight"]
    assert ai.shape == (4, 256)
    assert ai.ggml_type == ggml.GGMLQuantizationType.F32
    np.testing.assert_array_equal(r.tensor_float("a.weight"), a)
    np.testing.assert_allclose(r.tensor_float("b.weight"), b.astype(np.float32))


def test_tensor_roundtrip_quantized(tmp_path):
    path = tmp_path / "q.gguf"
    q = RNG.integers(0, 16, size=(16, 256)).astype(np.uint8)
    sc = RNG.integers(0, 64, size=(16, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(16, 8)).astype(np.uint8)
    d = np.abs(RNG.normal(size=16)).astype(np.float32) * 0.01
    dmin = np.abs(RNG.normal(size=16)).astype(np.float32) * 0.01
    blocks = ggml.pack_q4_k(q, d, sc, dmin, mn)  # 16 blocks = rows (8, 512)
    w = GGUFWriter(path, arch="llama")
    w.add_tensor(
        "blk.0.attn_q.weight",
        blocks,
        raw_dtype=ggml.GGMLQuantizationType.Q4_K,
        raw_shape=(8, 512),
    )
    w.write()

    r = GGUFReader(path)
    info = r.tensors["blk.0.attn_q.weight"]
    assert info.shape == (8, 512)
    assert info.ggml_type == ggml.GGMLQuantizationType.Q4_K
    assert info.nbytes == 16 * 144
    raw = r.tensor_bytes("blk.0.attn_q.weight")
    np.testing.assert_array_equal(np.asarray(raw), blocks.reshape(-1))
    deq = r.tensor_float("blk.0.attn_q.weight")
    np.testing.assert_allclose(deq.reshape(16, 256), ggml.dequant_q4_k(blocks))


def test_alignment(tmp_path):
    path = tmp_path / "align.gguf"
    w = GGUFWriter(path, arch="llama")
    # first tensor has odd byte count via F16 of odd elements
    w.add_tensor("odd", np.ones((3, 5), dtype=np.float16))
    w.add_tensor("next", np.ones((2, 2), dtype=np.float32))
    w.write()
    r = GGUFReader(path)
    assert r.data_start % 32 == 0
    assert r.tensors["next"].offset % 32 == 0
    np.testing.assert_array_equal(r.tensor_float("next"), np.ones((2, 2), np.float32))


def test_raw_size_mismatch_rejected(tmp_path):
    w = GGUFWriter(tmp_path / "x.gguf", arch="llama")
    with pytest.raises(ValueError):
        w.add_tensor(
            "bad",
            np.zeros((3, 100), dtype=np.uint8),
            raw_dtype=ggml.GGMLQuantizationType.Q4_K,
            raw_shape=(8, 512),
        )


def test_metadata_passthrough_roundtrip(tmp_path):
    """Stitcher-style copy: read metadata, write to a new file preserving types
    (reference gguf_stitcher.py:676-774)."""
    p1, p2 = tmp_path / "src.gguf", tmp_path / "dst.gguf"
    w = GGUFWriter(p1, arch="llama")
    w.add_kv("llama.block_count", 2)
    w.add_kv("tokenizer.ggml.tokens", ["<s>", "</s>", "hi"])
    w.add_kv("tokenizer.ggml.scores", [0.0, -1.0, -2.0], vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.FLOAT32)
    w.add_tensor("t", np.zeros((2, 2), np.float32))
    w.write()

    r1 = GGUFReader(p1)
    w2 = GGUFWriter(p2)
    w2.add_metadata(r1.metadata)
    w2.add_tensor("t", r1.tensor_float("t"))
    w2.write()

    r2 = GGUFReader(p2)
    assert {k: (v.type, v.value) for k, v in r1.metadata.items()} == {
        k: (v.type, v.value) for k, v in r2.metadata.items()
    }


def test_iq_opaque_tensor_roundtrip(tmp_path):
    """IQ codebook types are first-class container types: correct block
    sizes, byte-exact passthrough (encoding needs llama.cpp's grid tables,
    which even the reference only gets by shelling out to llama-quantize)."""
    cases = [
        (ggml.GGMLQuantizationType.IQ2_XXS, 66),
        (ggml.GGMLQuantizationType.IQ2_XS, 74),
        (ggml.GGMLQuantizationType.IQ2_S, 82),
        (ggml.GGMLQuantizationType.IQ3_XXS, 98),
        (ggml.GGMLQuantizationType.IQ3_S, 110),
        (ggml.GGMLQuantizationType.IQ1_S, 50),
        (ggml.GGMLQuantizationType.IQ1_M, 56),
    ]
    path = tmp_path / "iq.gguf"
    w = GGUFWriter(path, arch="llama")
    payloads = {}
    for qt, tsize in cases:
        assert ggml.type_size(qt) == tsize and ggml.block_elems(qt) == 256
        raw = RNG.integers(0, 256, size=4 * tsize).astype(np.uint8)
        name = f"blk.0.{qt.name.lower()}.weight"
        w.add_tensor(name, raw, raw_dtype=qt, raw_shape=(2, 512))
        payloads[name] = raw
    w.write()
    r = GGUFReader(path)
    for qt, tsize in cases:
        name = f"blk.0.{qt.name.lower()}.weight"
        info = r.tensors[name]
        assert info.ggml_type == qt and info.shape == (2, 512)
        assert info.nbytes == 4 * tsize
        np.testing.assert_array_equal(
            np.asarray(r.tensor_bytes(name)), payloads[name]
        )
