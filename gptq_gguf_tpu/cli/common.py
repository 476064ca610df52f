"""Shared CLI plumbing: model/tokenizer/data loading, mesh setup."""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np


def add_model_args(p: argparse.ArgumentParser, required: bool = True) -> None:
    p.add_argument("--model_name_or_path", type=str, required=required,
                   help="HF checkpoint directory (config.json + safetensors)")
    p.add_argument("--tokenizer_name", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "float16"])


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--calibration_data", type=str, default="synthetic",
                   help="wikitext2 | c4 | fineweb_edu | synthetic | token file")
    p.add_argument("--calibration_tokens", type=int, default=2**20)
    p.add_argument("--calibration_sequence_length", type=int, default=None)


def add_mesh_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dp", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before building the "
                        "mesh (TPU pods: coordinator/process env vars or "
                        "--coordinator/--num_processes/--process_id)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def resolve_dtype(name: str):
    import jax.numpy as jnp

    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def load_model(args, host: bool = False):
    from ..models import loader

    cfg = loader.load_config(args.model_name_or_path, dtype=resolve_dtype(args.dtype))
    params = loader.load_params(args.model_name_or_path, cfg, host=host)
    return cfg, params


def load_tokenizer(args):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(
            args.tokenizer_name or args.model_name_or_path
        )
    except Exception:
        return None


def load_calibration(args, cfg, tokenizer, train: bool = True):
    from ..utils.data import get_data

    seq = args.calibration_sequence_length or min(cfg.max_position_embeddings, 4096)
    return get_data(
        args.calibration_data,
        args.calibration_tokens,
        seq,
        tokenizer,
        train=train,
        vocab_size=cfg.vocab_size,
        seed=getattr(args, "seed", 0),
    )


def make_mesh_from_args(args):
    """Build a mesh only when the user explicitly asked for parallelism."""
    if getattr(args, "multihost", False):
        from ..parallel import mesh as mesh_mod

        mesh_mod.init_distributed(
            coordinator=getattr(args, "coordinator", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        )
    dp = getattr(args, "dp", None)
    tp = getattr(args, "tp", 1)
    if dp in (None, 0, 1) and tp in (None, 0, 1):
        return None
    from ..parallel import mesh as mesh_mod

    return mesh_mod.make_mesh(dp=dp, tp=tp or 1)
