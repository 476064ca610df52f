"""Native C++ codec must agree byte-for-byte with the numpy codecs."""

import numpy as np
import pytest

from gptq_gguf_tpu.formats import ggml, native

RNG = np.random.default_rng(17)

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="native codec unavailable")


def _mk_unsigned(qmax, ngroups):
    n = 16
    q = RNG.integers(0, qmax + 1, size=(n, 256)).astype(np.uint8)
    sc = RNG.integers(0, 64 if ngroups == 8 else 16, size=(n, ngroups)).astype(np.uint8)
    mn = RNG.integers(0, 64 if ngroups == 8 else 16, size=(n, ngroups)).astype(np.uint8)
    d = (RNG.normal(size=n) * 0.01).astype(np.float32)
    dmin = (RNG.normal(size=n) * 0.01).astype(np.float32)
    return q, d, sc, dmin, mn


def test_pack_dequant_q2_k():
    q, d, sc, dmin, mn = _mk_unsigned(3, 16)
    ref = ggml.pack_q2_k(q, d, sc, dmin, mn)
    nat = native.native_pack("q2_k", q, d, sc, dmin, mn)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_allclose(
        native.native_dequant("q2_k", ref, 16), ggml.dequant_q2_k(ref), rtol=1e-6
    )


def test_pack_dequant_q4_k():
    q, d, sc, dmin, mn = _mk_unsigned(15, 8)
    ref = ggml.pack_q4_k(q, d, sc, dmin, mn)
    nat = native.native_pack("q4_k", q, d, sc, dmin, mn)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_allclose(
        native.native_dequant("q4_k", ref, 16), ggml.dequant_q4_k(ref), rtol=1e-6
    )


def test_pack_dequant_q5_k():
    q, d, sc, dmin, mn = _mk_unsigned(31, 8)
    ref = ggml.pack_q5_k(q, d, sc, dmin, mn)
    nat = native.native_pack("q5_k", q, d, sc, dmin, mn)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_allclose(
        native.native_dequant("q5_k", ref, 16), ggml.dequant_q5_k(ref), rtol=1e-6
    )


def test_pack_dequant_q3_k():
    n = 16
    q = RNG.integers(-4, 4, size=(n, 256)).astype(np.int8)
    sc = RNG.integers(0, 32, size=(n, 16)).astype(np.int8)
    d = (RNG.normal(size=n) * 0.01).astype(np.float32)
    ref = ggml.pack_q3_k(q, d, sc)
    nat = native.native_pack("q3_k", q, d, sc)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_allclose(
        native.native_dequant("q3_k", ref, n), ggml.dequant_q3_k(ref), rtol=1e-6
    )


def test_pack_dequant_q6_k():
    n = 16
    q = RNG.integers(-32, 32, size=(n, 256)).astype(np.int8)
    sc = RNG.integers(-128, 128, size=(n, 16)).astype(np.int8)
    d = (RNG.normal(size=n) * 0.01).astype(np.float32)
    ref = ggml.pack_q6_k(q, d, sc)
    nat = native.native_pack("q6_k", q, d, sc)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_allclose(
        native.native_dequant("q6_k", ref, n), ggml.dequant_q6_k(ref), rtol=1e-6
    )


def test_fp16_conversion_edge_cases():
    """The native fp16 converter must round-trip like numpy's."""
    vals = np.array(
        [0.0, -0.0, 1.0, -2.5, 65504.0, 1e-8, 6.1e-5, 5.96e-8, 1e9, np.inf],
        dtype=np.float32,
    )
    n = len(vals)
    q = np.zeros((n, 256), np.uint8)
    sc = np.zeros((n, 8), np.uint8)
    mn = np.zeros((n, 8), np.uint8)
    dmin = np.zeros(n, np.float32)
    ref = ggml.pack_q4_k(q, vals, sc, dmin, mn)
    nat = native.native_pack("q4_k", q, vals, sc, dmin, mn)
    np.testing.assert_array_equal(ref[:, 0:2], nat[:, 0:2])


def test_native_q8k_iq4_dequant_matches_numpy():
    """C++ fast path for the round-2 codecs must byte-match numpy."""
    from gptq_gguf_tpu.formats import ggml, native

    if native.get_lib() is None:
        import pytest

        pytest.skip("no compiler")
    rng = np.random.default_rng(5)
    x8 = rng.normal(size=(4, 256)).astype(np.float32)
    blocks = ggml.quantize_q8_k(x8)
    got = native.native_dequant("Q8_K", blocks, 4, 256)
    np.testing.assert_array_equal(got, ggml.dequant_q8_k(blocks))

    xn = rng.normal(size=(8, 32)).astype(np.float32)
    bn = ggml.quantize_iq4_nl(xn)
    got = native.native_dequant("IQ4_NL", bn, 8, 32)
    np.testing.assert_array_equal(got, ggml.dequant_iq4_nl(bn))

    xx = rng.normal(size=(4, 256)).astype(np.float32)
    bx = ggml.quantize_iq4_xs(xx)
    got = native.native_dequant("IQ4_XS", bx, 4, 256)
    np.testing.assert_array_equal(got, ggml.dequant_iq4_xs(bx))
