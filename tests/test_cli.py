"""CLI smoke tests: the full pipeline through `python -m gptq_gguf_tpu`."""

import json
import subprocess
import sys

import numpy as np
import pytest


def run_cli(args, cwd=None):
    import gptq_gguf_tpu.__main__ as m

    m.main([str(a) for a in args])


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.test_model import make_tiny_hf_model
    from tests.test_packer import write_tiny_tokenizer

    tmp = tmp_path_factory.mktemp("cli")
    d, _ = make_tiny_hf_model(tmp, seed=30)
    write_tiny_tokenizer(d)
    return d


def test_pipeline_quantize_pack_split_stitch(model_dir, tmp_path, capsys):
    layers = tmp_path / "layers"
    run_cli([
        "quantize", "--model_name_or_path", model_dir,
        "--calibration_data", "synthetic", "--calibration_tokens", 256,
        "--calibration_sequence_length", 64,
        "--default_bit_width", "Q4_K", "--save_dir", layers,
    ])
    assert (layers / "model.layers.0.self_attn.q_proj" / "data.npz").exists()

    gguf = tmp_path / "model-Q4_K.gguf"
    run_cli(["pack", "--model_dir", model_dir, "--quant_dir", layers, "--outfile", gguf])
    assert gguf.exists()

    db = tmp_path / "db"
    run_cli(["split", "--gguf-file", gguf, "--output-dir", db, "--gguf-layers"])
    assert (db / "manifest.json").exists()

    out2 = tmp_path / "stitched.gguf"
    run_cli(["stitch", "--split-dir", db, "--output", out2])
    assert out2.exists()

    from gptq_gguf_tpu.formats.gguf import GGUFReader

    r1, r2 = GGUFReader(gguf), GGUFReader(out2)
    np.testing.assert_array_equal(
        np.asarray(r1.tensor_bytes("blk.0.attn_q.weight")),
        np.asarray(r2.tensor_bytes("blk.0.attn_q.weight")),
    )

    run_cli([
        "ppl", "--model_name_or_path", model_dir, "--datasets", "synthetic",
        "--eval_tokens", 256, "--sequence_length", 64,
        "--output_path", tmp_path / "ppl.json",
    ])
    res = json.loads((tmp_path / "ppl.json").read_text())
    assert "synthetic" in res and res["synthetic"] > 1

    run_cli(["serve", "--gguf-file", gguf, "--max-new-tokens", 4,
             "--prompt-tokens", 1, 2, 3])
    out = capsys.readouterr().out
    assert "tok/s" in out


def test_convert_config_cli(tmp_path):
    src = tmp_path / "hf.txt"
    src.write_text("model.layers.0.self_attn.q_proj: 4.5 (4.5-Q4_K.pth)\n")
    dst = tmp_path / "gguf.txt"
    run_cli(["convert-config", "--input", src, "--output", dst])
    assert "blk.0.attn_q.weight: 4.5 (4.5-Q4_K.pth)" in dst.read_text()
