"""Mapper tests: split -> DB -> stitch round trip, config conversion."""

import json

import numpy as np
import pytest

from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.mapper import config_converter, db_builder, splitter, stitcher


@pytest.fixture(scope="module")
def packed_model(tmp_path_factory):
    """Reuse the packer pipeline to create two GGUF variants (Q4_K, Q6_K)."""
    from tests.test_model import make_tiny_hf_model
    from tests.test_packer import write_tiny_tokenizer
    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.quant import calibrate
    from gptq_gguf_tpu.export import packer

    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("mapper")
    model_dir, _ = make_tiny_hf_model(tmp, seed=7)
    write_tiny_tokenizer(model_dir)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    calib = [rng.integers(0, cfg.vocab_size, size=(1, 64)) for _ in range(4)]

    outs = {}
    for qt in ("Q4_K", "Q6_K"):
        quant_dir = tmp / f"layers-{qt}"
        calibrate.quantize_model(
            params, cfg, calib,
            quant_config={k: qt for k in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")},
            save_dir=quant_dir,
        )
        out = tmp / f"tiny-{qt}.gguf"
        packer.pack_model(model_dir, quant_dir, out)
        outs[qt] = out
    return tmp, outs, cfg


def test_split_gguf_layout(packed_model, tmp_path):
    tmp, outs, cfg = packed_model
    db = tmp_path / "layers-gguf"
    manifest = splitter.split_gguf(outs["Q4_K"], db, exact=True)
    # layer dirs with <bits>-<QTYPE>.pth raw bytes
    q_dir = db / "blk.0.attn_q.weight"
    assert (q_dir / "4.5-Q4_K.pth").exists()
    meta = json.loads((q_dir / "4.5-Q4_K-metadata.json").read_text())
    assert meta["tensor_info"]["quantization"] == "Q4_K"
    assert meta["tensor_info"]["np_dtype"] == "uint8"
    # raw bytes identical to the source tensor
    r = GGUFReader(outs["Q4_K"])
    raw = np.asarray(r.tensor_bytes("blk.0.attn_q.weight"))
    np.testing.assert_array_equal(
        np.frombuffer((q_dir / "4.5-Q4_K.pth").read_bytes(), dtype=np.uint8), raw
    )
    assert (db / "manifest.json").exists()
    assert "blk.0.attn_q.weight" in manifest["layers"]


def test_split_hf_layout_inverse_permutation(packed_model, tmp_path):
    import torch

    tmp, outs, cfg = packed_model
    db = tmp_path / "layers-hf"
    splitter.split_hf(outs["Q4_K"], db, exact=True)
    d = db / "model.layers.0.self_attn.q_proj"
    assert (d / "4.5-Q4_K.pth").exists()
    w = torch.load(d / "4.5-Q4_K.pth", weights_only=True).float().numpy()
    # must equal the *HF-layout* dequantized artifact (inverse GQA permute)
    art_w = None
    from gptq_gguf_tpu.quant import artifacts

    art = artifacts.load_layer(tmp / "layers-Q4_K", "model.layers.0.self_attn.q_proj")
    np.testing.assert_allclose(w, art.dequantize().astype(np.float16).astype(np.float32), atol=1e-3, rtol=1e-2)
    # only the 7 block linears are emitted
    names = {p.name for p in db.iterdir() if p.is_dir()}
    assert all("proj" in n for n in names)


def test_build_ep_database_and_stitch_mixed(packed_model, tmp_path):
    tmp, outs, cfg = packed_model
    ep = tmp_path / "ep_database"
    db_builder.build_ep_database([outs["Q4_K"], outs["Q6_K"]], ep, skip_hf=True)
    gguf_db = ep / "layers-gguf"
    # both bitwidth variants present per tensor
    opts = stitcher.discover_layers(gguf_db)
    assert {c["quant_type"] for c in opts["blk.0.attn_q.weight"]} >= {"Q4_K", "Q6_K"}

    # mixed config: layer 0 at Q6_K, rest default Q4_K
    config_path = tmp_path / "mix.txt"
    config_path.write_text(
        "blk.0.attn_q.weight: 6.5625 (6.5625-Q6_K.pth)\n"
        "blk.0.attn_k.weight: 6.5625 (6.5625-Q6_K.pth)\n"
    )
    st = stitcher.GGUFStitcher(gguf_db, config_path, default_bitwidth=4.5, default_quant_type="Q4_K")
    assert st.validate() == []
    out = tmp_path / "stitched.gguf"
    st.stitch(out)

    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == T.Q6_K
    assert r.tensors["blk.1.attn_q.weight"].ggml_type == T.Q4_K
    # stitched Q6_K tensor bytes == source Q6_K model bytes
    r6 = GGUFReader(outs["Q6_K"])
    np.testing.assert_array_equal(
        np.asarray(r.tensor_bytes("blk.0.attn_q.weight")),
        np.asarray(r6.tensor_bytes("blk.0.attn_q.weight")),
    )
    np.testing.assert_array_equal(
        np.asarray(r.tensor_bytes("blk.1.ffn_down.weight")),
        np.asarray(GGUFReader(outs["Q4_K"]).tensor_bytes("blk.1.ffn_down.weight")),
    )
    # metadata preserved with exact types
    assert r.get("general.architecture") == "llama"
    assert r.get("llama.block_count") == cfg.num_hidden_layers
    assert r.metadata["llama.block_count"].type == r6.metadata["llama.block_count"].type
    assert r.get("general.file_type") == 12  # dominant 4.5 -> int 4 -> Q4_K


def test_config_converter_dense():
    hf_text = (
        "model.layers.0.self_attn.q_proj: 4.5 (4.5-Q4_K.pth)\n"
        "model.layers.0.mlp.down_proj: 6.5625 (6.5625-Q6_K.pth)\n"
        "model.embed_tokens: 16\n"
    )
    out = config_converter.convert_hf_to_gguf_config(hf_text, missing_value="32")
    assert out["blk.0.attn_q.weight"] == "4.5 (4.5-Q4_K.pth)"
    assert out["blk.0.ffn_down.weight"] == "6.5625 (6.5625-Q6_K.pth)"
    assert out["blk.0.ffn_up.weight"] == "32"  # missing default
    assert out["blk.0.attn_norm.weight"] == "32"
    assert out["token_embd.weight"] == "16"
    assert not config_converter.detect_moe(hf_text)


def test_config_converter_moe_detect():
    text = "model.layers.0.mlp.experts.down_proj: 4\n"
    assert config_converter.detect_moe(text)
    out = config_converter.convert_hf_to_gguf_config(text, is_moe=True)
    assert out["blk.0.ffn_down_exps.weight"] == "4"


def test_infer_qtype_from_filename():
    f = db_builder.infer_qtype_from_filename
    assert f("Llama-3.2-1B-Q4_K_M.gguf") == "Q4_K_M"
    assert f("model-IQ2_XS.gguf") == "IQ2_XS"
    assert f("model-F16.gguf") == "F16"
    assert f("model.gguf") is None


def test_stitcher_empty_dir_invalid(tmp_path):
    """validate() must fail on a missing/empty split dir (found by probing:
    it previously reported 'configuration valid' for a nonexistent path)."""
    st = stitcher.GGUFStitcher(tmp_path / "nope")
    problems = st.validate()
    assert problems and "no layer directories" in problems[0]
