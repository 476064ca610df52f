"""Ladder builders: per-layer multi-level databases for EvoPress.

TPU re-expressions of the block-walk orchestrators in
evopress/src/quantizer.py:18-171 (FastOBQ bit-width ladders, saved as
``<layer>/<bits>.pth`` dequantized weights) and evopress/src/pruner.py:14-165
(FastOBC sparsity ladders, ``<layer>/<level>.pth``), plus the OWL-weighted
variant (owl_pruner.py). Reuses the jitted Hessian capture step of the
GPTQ calibration walk; activation propagation uses a chosen ladder level
(the reference swaps a QLinear at the calibration bitwidth,
quantizer.py:167-170).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.llama import LlamaConfig
from ..ops import sparse_gptq
from ..quant.calibrate import _LINEAR_SPECS, _capture_step, _propagate_step


def _save_pth(path: Path, w: np.ndarray) -> None:
    import torch

    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(torch.from_numpy(np.array(w, copy=True)).half(), path)


def _block_walk(params, cfg: LlamaConfig, calibration_ids, batch_size, solver):
    """Shared walk: per block, accumulate Hessians, call
    solver(layer_index, key, W, H) -> replacement weight, propagate."""
    ids = [np.atleast_2d(np.asarray(a)) for a in calibration_ids]
    S = ids[0].shape[1]
    batches = [
        np.concatenate(ids[i : i + batch_size], axis=0)
        for i in range(0, len(ids), batch_size)
    ]
    positions = jnp.arange(S)[None, :]
    cos1, sin1 = llama.rope_cos_sin(cfg, positions)

    xs = [np.asarray(llama.embed_forward(params, jnp.asarray(b), cfg)) for b in batches]
    for li in range(cfg.num_hidden_layers):
        layer = params["layers"][li]
        sizes = {
            "qkv": cfg.hidden_size,
            "o": cfg.num_attention_heads * cfg.head_dim_,
            "gateup": cfg.hidden_size,
            "down": cfg.intermediate_size,
        }
        hs = {k: jnp.zeros((d, d), jnp.float32) for k, d in sizes.items()}
        counts = {k: jnp.zeros((), jnp.float32) for k in sizes}
        for x in xs:
            b = x.shape[0]
            cos = jnp.broadcast_to(cos1, (b, S, cos1.shape[-1]))
            sin = jnp.broadcast_to(sin1, (b, S, sin1.shape[-1]))
            mask = llama.causal_mask(b, S)
            _, hs, counts = _capture_step(layer, jnp.asarray(x), cos, sin, mask, hs, counts, cfg, li)

        new_layer = dict(layer)
        for key, cap, name_tpl in _LINEAR_SPECS:
            name = name_tpl.format(i=li)
            replacement = solver(li, key, name, layer[key], hs[cap])
            if replacement is not None:
                new_layer[key] = replacement.astype(layer[key].dtype)

        layers = list(params["layers"])
        layers[li] = new_layer
        params = {**params, "layers": layers}

        new_xs = []
        for x in xs:
            b = x.shape[0]
            cos = jnp.broadcast_to(cos1, (b, S, cos1.shape[-1]))
            sin = jnp.broadcast_to(sin1, (b, S, sin1.shape[-1]))
            mask = llama.causal_mask(b, S)
            new_xs.append(np.asarray(_propagate_step(new_layer, jnp.asarray(x), cos, sin, mask, cfg, li)))
        xs = new_xs
    return params


def build_fastobq_ladder(
    params,
    cfg: LlamaConfig,
    calibration_ids,
    save_dir: Union[str, Path],
    bitwidths: Sequence[int] = (2, 3, 4, 5, 6, 8),
    *,
    propagate_bits: Optional[int] = 4,
    sym: bool = False,
    group_size: Optional[int] = None,
    block_size: int = 128,
    rel_damp: float = 1e-2,
    batch_size: int = 1,
):
    """FastOBQ multi-bitwidth database (evopress/src/quantizer.py:130-171)."""
    save_dir = Path(save_dir)

    def solver(li, key, name, W, H):
        results = sparse_gptq.fast_obq_quantize(
            W.astype(jnp.float32), H, bitwidths,
            sym=sym, group_size=group_size, block_size=block_size, rel_damp=rel_damp,
        )
        for bits, (_, _, w_hat) in results.items():
            _save_pth(save_dir / name / f"{bits}.pth", np.asarray(w_hat))
        if propagate_bits is not None and propagate_bits in results:
            return results[propagate_bits][2]
        return None

    return _block_walk(params, cfg, calibration_ids, batch_size, solver)


def build_fastobc_ladder(
    params,
    cfg: LlamaConfig,
    calibration_ids,
    save_dir: Union[str, Path],
    sparsity: float = 0.5,
    num_levels: int = 4,
    weights_diff: int = 1 << 20,
    *,
    sparsity_distribution: Optional[np.ndarray] = None,
    block_size: int = 128,
    rel_damp: float = 1e-2,
    batch_size: int = 1,
    propagate: bool = True,
):
    """FastOBC sparsity-level database (evopress/src/pruner.py:149-165):
    per layer, levels ``sparsity + l * weights_diff / numel`` for l in
    [-min_level, max_level], saved as ``<level>.pth``.

    ``sparsity_distribution``: optional per-block-index target sparsity
    (OWL, owl_pruner.py:226-266)."""
    save_dir = Path(save_dir)

    def solver(li, key, name, W, H):
        numel = int(np.prod(W.shape))
        base = (
            float(sparsity_distribution[li])
            if sparsity_distribution is not None
            else sparsity
        )
        step = weights_diff / numel
        min_level = min(int(base // step), num_levels)
        max_level = min(int((1 - base) // step), num_levels)
        sparsities = [base + l * step for l in range(-min_level, max_level + 1)]
        sparse = sparse_gptq.fast_obc_prune(
            W.astype(jnp.float32), H, sparsities,
            block_size=block_size, rel_damp=rel_damp,
        )
        for level, w in zip(range(-min_level, max_level + 1), sparse):
            _save_pth(save_dir / name / f"{level}.pth", np.asarray(w))
        if propagate:
            return sparse[min_level]  # level 0 == base sparsity
        return None

    return _block_walk(params, cfg, calibration_ids, batch_size, solver)


def compute_owl_outlier_ratios(
    params,
    cfg: LlamaConfig,
    calibration_ids,
    m: float = 5.0,
    batch_size: int = 1,
) -> List[float]:
    """Per-block mean outlier ratio of the OWL metric (owl_pruner.py:169-201).

    Uses full Hessians' diagonals (the reference accumulates only diagonals;
    the diagonal of our accumulated H is identical)."""
    ratios: List[float] = []

    def solver_factory():
        per_block: Dict[int, List[float]] = {}

        def solver(li, key, name, W, H):
            metric = sparse_gptq.owl_metric(W.astype(jnp.float32), jnp.diagonal(H))
            per_block.setdefault(li, []).append(sparse_gptq.owl_outlier_ratio(metric, m))
            return None

        return solver, per_block

    solver, per_block = solver_factory()
    _block_walk(params, cfg, calibration_ids, batch_size, solver)
    for li in sorted(per_block):
        ratios.append(float(np.mean(per_block[li])))
    return ratios


def estimate_layer_errors(
    params,
    cfg: LlamaConfig,
    calibration_ids,
    db_path: Union[str, Path],
    batch_size: int = 1,
    out_path: Optional[Union[str, Path]] = None,
) -> Dict[str, Dict[str, float]]:
    """Per-layer normalized proxy loss (dW H dW^T)/(W H W^T) against every
    available database level (reference evopress/src/error_estimator.py:16-262).

    Returns {layer_name: {level_filename: relative_error}}; optionally dumps
    JSON. Useful for seeding/pruning the EvoPress search space.
    """
    import json

    import torch

    from ..ops.sparse_gptq import relative_layer_error

    db_path = Path(db_path)
    results: Dict[str, Dict[str, float]] = {}

    def solver(li, key, name, W, H):
        layer_dir = db_path / name
        if not layer_dir.is_dir():
            return None
        errs = {}
        for f in sorted(layer_dir.glob("*.pth")):
            w_hat = torch.load(f, map_location="cpu", weights_only=True).float().numpy()
            errs[f.name] = float(
                relative_layer_error(W.astype(jnp.float32), jnp.asarray(w_hat), H)
            )
        results[name] = errs
        return None

    _block_walk(params, cfg, calibration_ids, batch_size, solver)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    return results
