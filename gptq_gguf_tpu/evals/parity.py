"""Real-model parity harness: quantize -> pack -> ppl vs the reference tables.

The acceptance bar for this framework (BASELINE.md / BASELINE.json) is
<= 0.05 WikiText2 perplexity delta vs the reference's published GPTQ numbers
at matched bit-width. This module makes that a single command:

    python -m gptq_gguf_tpu parity --model_name_or_path /models/Llama-3.2-1B \
        --bit_widths Q4_K Q5_K

It runs the full pipeline per bit-width (GPTQ calibration walk -> GGUF pack
-> WikiText2 perplexity on the dequantized model), diffs against the
reference table, and writes a JSON report. In the zero-egress build
environment there are no HF weights, so ``--synthetic-shapes`` fabricates a
random checkpoint at real model shapes and swaps the datasets for the
offline synthetic corpus — exercising every piece of the plumbing so the
real run is one flag away when weights are available.

Reference numbers: IST-DASLab/gptq-gguf-toolkit README.md:377-412 (8B),
:482-504 (1B); see BASELINE.md.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

# WikiText2 perplexity, reference GPTQ at matched type (BASELINE.md)
REFERENCE_PPL: Dict[str, Dict[str, float]] = {
    "llama-3.2-1b": {
        "F32": 11.55, "Q3_K": 16.84, "Q4_K": 12.16, "Q5_K": 11.67, "Q6_K": 11.58,
    },
    "llama-3.1-8b": {
        "F32": 6.73, "Q2_K": 10.96, "Q3_K": 8.02, "Q4_K": 6.89,
        "Q5_K": 6.79, "Q6_K": 6.75,
    },
}

PPL_TOLERANCE = 0.05  # BASELINE.json acceptance bar


def reference_row(model_name: str) -> Optional[Dict[str, float]]:
    name = model_name.lower().replace("_", "-")
    for key, row in REFERENCE_PPL.items():
        if key in name:
            return row
    return None


@dataclasses.dataclass
class ParityResult:
    bit_width: str
    measured_ppl: float
    reference_ppl: Optional[float]
    delta: Optional[float]
    passed: Optional[bool]
    gguf_path: Optional[str]
    seconds: float


def make_synthetic_checkpoint(out_dir: Path, preset: str = "llama-3.2-1b",
                              seed: int = 0) -> Path:
    """Random-weights HF checkpoint at real model shapes (plumbing dry run)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    shapes = {
        "llama-3.2-1b": dict(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            head_dim=64, max_position_embeddings=131072, rope_theta=500000.0,
            tie_word_embeddings=True,
        ),
        "llama-3.1-8b": dict(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=131072, rope_theta=500000.0,
        ),
        "tiny": dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        ),
    }
    cfg = AutoConfig.for_model(model_type="llama", torch_dtype="float32",
                               **shapes[preset])
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(cfg).eval()
    out_dir.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(out_dir, safe_serialization=True)
    # minimal byte-level BPE so the packer emits a vocab
    vocab = {f"<b{i}>": i for i in range(cfg.vocab_size)}
    with open(out_dir / "tokenizer.json", "w") as f:
        json.dump({"model": {"type": "BPE", "vocab": vocab, "merges": []},
                   "added_tokens": []}, f)
    return out_dir


def run_parity(
    model_dir: str,
    out_dir: str,
    bit_widths: Sequence[str] = ("Q4_K",),
    *,
    calibration_data: str = "wikitext2",
    calibration_tokens: int = 2 ** 19,
    sequence_length: Optional[int] = None,
    eval_data: Optional[str] = None,
    eval_tokens: int = 2 ** 19,
    reference_name: Optional[str] = None,
    pack: bool = True,
    verbose: bool = True,
) -> List[ParityResult]:

    from ..export import packer
    from ..models import loader
    from ..quant import calibrate
    from ..utils.data import get_data
    from .ppl import compute_perplexity

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    seq = sequence_length or min(cfg.max_position_embeddings, 4096)

    from transformers import AutoTokenizer

    tokenizer = None
    if not calibration_data.startswith("synthetic"):
        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    calib = get_data(calibration_data, calibration_tokens, seq, tokenizer,
                     train=True, vocab_size=cfg.vocab_size)
    eval_name = eval_data or (
        "wikitext2" if not calibration_data.startswith("synthetic") else "synthetic"
    )
    eval_seqs = get_data(eval_name, eval_tokens, seq, tokenizer, train=False,
                         vocab_size=cfg.vocab_size)

    ref_row = reference_row(reference_name or str(model_dir))
    results: List[ParityResult] = []
    for bw in bit_widths:
        t0 = time.time()
        qdir = out / f"layers-{bw}"
        qparams = calibrate.quantize_model(
            params, cfg, calib,
            quant_config={k: bw for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                                          "gate_proj", "up_proj", "down_proj")},
            save_dir=qdir,
        )
        ppl = compute_perplexity(qparams, cfg, eval_seqs)
        gguf_path = None
        if pack:
            gguf_path = str(out / f"model-{bw}.gguf")
            packer.pack_model(model_dir, qdir, gguf_path)
        ref = ref_row.get(bw) if ref_row else None
        delta = (ppl - ref) if ref is not None else None
        passed = (delta <= PPL_TOLERANCE) if delta is not None else None
        results.append(ParityResult(bw, float(ppl), ref, delta, passed,
                                    gguf_path, time.time() - t0))
        if verbose:
            tag = ("PASS" if passed else "FAIL") if passed is not None else "n/a"
            ref_s = f"{ref:.2f}" if ref is not None else "—"
            print(f"{bw}: ppl {ppl:.3f} vs reference {ref_s} [{tag}] "
                  f"({results[-1].seconds:.0f}s)")

    report = {
        "model": str(model_dir),
        "eval_dataset": eval_name,
        "tolerance": PPL_TOLERANCE,
        "results": [dataclasses.asdict(r) for r in results],
    }
    with open(out / "parity_report.json", "w") as f:
        json.dump(report, f, indent=2)
    return results
