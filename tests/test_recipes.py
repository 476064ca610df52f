"""llama-quantize recipe engine tests (quant/recipes.py)."""

import numpy as np
import pytest

from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.quant import recipes

RNG = np.random.default_rng(23)


def test_use_more_bits_striping():
    n = 32
    sel = [i for i in range(n) if recipes.use_more_bits(i, n)]
    assert 0 in sel and n - 1 in sel
    assert sel == [0, 1, 2, 3, 6, 9, 12, 15, 18, 21, 24, 27, 28, 29, 30, 31]


@pytest.mark.parametrize("ftype,tensor,i,expect", [
    ("Q4_K_M", "output.weight", 0, T.Q6_K),
    ("Q4_K_M", "blk.0.ffn_down.weight", 0, T.Q6_K),
    ("Q4_K_M", "blk.5.ffn_down.weight", 5, T.Q4_K),
    ("Q4_K_M", "blk.0.attn_q.weight", 0, T.Q4_K),
    ("Q4_K_S", "blk.0.attn_v.weight", 0, T.Q5_K),
    ("Q3_K_M", "blk.0.attn_v.weight", 0, T.Q5_K),
    ("Q3_K_M", "blk.10.attn_output.weight", 10, T.Q4_K),
    ("Q3_K_L", "blk.10.ffn_down.weight", 10, T.Q5_K),
    ("Q2_K", "token_embd.weight", 0, T.Q2_K),
    ("Q6_K", "blk.3.ffn_up.weight", 3, T.Q6_K),
    ("IQ4_XS", "blk.3.ffn_gate.weight", 3, T.IQ4_XS),
    ("Q8_0", "output.weight", 0, T.Q8_0),
])
def test_recipe_tensor_type(ftype, tensor, i, expect):
    assert recipes.recipe_tensor_type(ftype, tensor, i, 32, n_gqa=4) == expect


@pytest.fixture(scope="module")
def f16_gguf(tmp_path_factory):
    """Tiny F16 GGUF via the packer (no quant artifacts)."""
    from tests.test_model import make_tiny_hf_model
    from tests.test_packer import write_tiny_tokenizer
    from gptq_gguf_tpu.export import packer

    tmp = tmp_path_factory.mktemp("recipes")
    model_dir, _ = make_tiny_hf_model(tmp, seed=31)
    write_tiny_tokenizer(model_dir)
    out = tmp / "f16.gguf"
    packer.pack_model(model_dir, tmp / "no-artifacts", out)
    return tmp, out


@pytest.mark.parametrize("ftype", ["Q4_K_M", "IQ4_XS", "Q8_0"])
def test_llama_quantize_end_to_end(f16_gguf, ftype):
    tmp, src = f16_gguf
    dst = tmp / f"{ftype}.gguf"
    recipes.llama_quantize(src, dst, ftype)
    r0 = GGUFReader(src)
    r1 = GGUFReader(dst)
    assert r1.get("general.file_type") == recipes.FTYPE_IDS[ftype]
    assert r1.tensor_order == r0.tensor_order
    base = recipes._BASE_TYPE[ftype]
    # norms survive untouched
    assert r1.tensors["blk.0.attn_norm.weight"].ggml_type == T.F32
    np.testing.assert_array_equal(
        r1.tensor_float("blk.0.attn_norm.weight"), r0.tensor_float("blk.0.attn_norm.weight")
    )
    # quantized payloads dequantize close to the source
    for name in ("blk.0.attn_q.weight", "blk.1.ffn_up.weight"):
        assert r1.tensors[name].ggml_type == base
        w0 = r0.tensor_float(name)
        w1 = r1.tensor_float(name)
        err = np.abs(w1 - w0).max() / max(np.abs(w0).max(), 1e-9)
        assert err < 0.25, f"{name}: {err}"
    if ftype == "Q4_K_M":
        assert r1.tensors["output.weight"].ggml_type == T.Q6_K


def test_llama_quantize_pure(f16_gguf):
    tmp, src = f16_gguf
    dst = tmp / "pure.gguf"
    recipes.llama_quantize(src, dst, "Q4_K_M", pure=True)
    r = GGUFReader(dst)
    assert r.tensors["output.weight"].ggml_type == T.Q4_K  # no Q6_K upgrade


def test_llama_quantize_with_imatrix(f16_gguf):
    tmp, src = f16_gguf
    r0 = GGUFReader(src)
    im = {
        name: np.abs(RNG.normal(size=info.shape[-1])).astype(np.float32) + 0.1
        for name, info in r0.tensors.items() if len(info.shape) == 2
    }
    dst = tmp / "im.gguf"
    recipes.llama_quantize(src, dst, "IQ4_XS", imatrix=im)
    dst2 = tmp / "noim.gguf"
    recipes.llama_quantize(src, dst2, "IQ4_XS")
    b1 = GGUFReader(dst).tensor_bytes("blk.0.attn_q.weight")
    b2 = GGUFReader(dst2).tensor_bytes("blk.0.attn_q.weight")
    assert (np.asarray(b1) != np.asarray(b2)).any()


def test_imatrix_file_roundtrip(tmp_path):
    """llama.cpp .imatrix binary: write means, read back means + trailer."""
    import numpy as np
    from gptq_gguf_tpu.quant.imatrix_io import load_imatrix, save_imatrix

    rng = np.random.default_rng(5)
    im = {"blk.0.ffn_up.weight": rng.random(64).astype(np.float32),
          "blk.0.attn_q.weight": rng.random(32).astype(np.float32),
          "output.weight": rng.random(16).astype(np.float32)}
    path = tmp_path / "x.imatrix"
    save_imatrix(im, path, ncall=7, dataset="wikitext2")
    got, ncalls, ds = load_imatrix(path)
    assert ds == "wikitext2"
    assert set(got) == set(im)
    assert all(n == 7 for n in ncalls.values())
    for k in im:
        np.testing.assert_allclose(got[k], im[k], rtol=1e-6)


def test_imatrix_file_rejects_garbage(tmp_path):
    import pytest
    from gptq_gguf_tpu.quant.imatrix_io import load_imatrix

    p = tmp_path / "bad.imatrix"
    p.write_bytes(b"\xff\xff\xff\xff" + b"junk" * 4)
    with pytest.raises(ValueError, match="not a llama.cpp imatrix"):
        load_imatrix(p)
