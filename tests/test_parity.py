"""Parity harness tests (evals/parity.py): the acceptance-bar pipeline runs
end to end on a synthetic checkpoint and reports deltas vs the built-in
reference tables."""

import json

import numpy as np

from gptq_gguf_tpu.evals import parity


def test_reference_row_matching():
    assert parity.reference_row("/models/Llama-3.2-1B-Instruct")["Q4_K"] == 12.16
    assert parity.reference_row("meta-llama/Llama-3.1-8B-Instruct")["Q2_K"] == 10.96
    assert parity.reference_row("unknown-model") is None


def test_parity_pipeline_synthetic(tmp_path):
    model_dir = parity.make_synthetic_checkpoint(tmp_path / "ckpt", "tiny", seed=3)
    results = parity.run_parity(
        model_dir, tmp_path / "out", ["Q4_K"],
        calibration_data="synthetic", calibration_tokens=256,
        sequence_length=64, eval_tokens=256,
        reference_name="tiny", verbose=False,
    )
    r = results[0]
    assert np.isfinite(r.measured_ppl)
    assert r.reference_ppl is None and r.passed is None  # no table row for tiny
    assert (tmp_path / "out" / "model-Q4_K.gguf").exists()
    with open(tmp_path / "out" / "parity_report.json") as f:
        report = json.load(f)
    assert report["results"][0]["bit_width"] == "Q4_K"
    assert report["tolerance"] == 0.05


def test_parity_cli_wiring():
    from gptq_gguf_tpu.cli.tools import SUBCOMMANDS

    assert "parity" in SUBCOMMANDS
