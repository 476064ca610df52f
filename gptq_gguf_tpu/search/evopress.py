"""EvoPress evolutionary bit-width search.

TPU-framework re-expression of evopress/evo_quant_search.py:26-812. The
algorithm (generational loop with budget-preserving bit-width swaps and a
staged selection funnel) is preserved exactly; the execution substrate is
different: candidates are evaluated by functionally swapping layer weights
into a jitted JAX model (donated pytree updates replace
``layer.weight.data = torch.load(...)``, evo_quant_search.py:133-136).

Improvements over the reference (SURVEY.md §5):
* generation-level checkpointing (the reference loses all progress on a
  crash, writing its config only at the end);
* layer sizes come from the database metadata, so the search can run
  without instantiating the model (e.g. for dry planning).
"""

from __future__ import annotations

import copy
import dataclasses
import functools
import json
import math
import os
import random
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..evals import ppl as ppl_mod
from ..models import llama
from ..models.llama import LlamaConfig

State = List[List[float]]  # bitwidth per [group][layer]


# ---------------------------------------------------------------------------
# Database scanning (evo_quant_search.py:26-52)
# ---------------------------------------------------------------------------


def scan_available_bitwidths(db_path: Union[str, Path]) -> Dict[str, List[Tuple[float, str]]]:
    out: Dict[str, List[Tuple[float, str]]] = {}
    db_path = Path(db_path)
    for layer_dir in sorted(db_path.iterdir()):
        if not layer_dir.is_dir():
            continue
        opts = []
        for f in layer_dir.glob("*.pth"):
            try:
                opts.append((float(f.name.split("-")[0].replace(".pth", "")), f.name))
            except ValueError:
                continue
        if opts:
            opts.sort(key=lambda t: t[0])
            out[layer_dir.name] = opts
    return out


def layer_order_fn(layer_name: str):
    """Sort key: (block_id, *components) (model_utils.py:365-369)."""
    parts = layer_name.split(".")
    return (int(parts[2]), *parts[3:])


def group_layers(
    layer_names: Sequence[str], rule: str, numel_fn: Callable[[str], int]
) -> List[List[str]]:
    """Group by none/name/size (model_utils.py:371-385)."""
    assert rule in ("none", "name", "size")
    groups: Dict[Any, List[str]] = {}
    for n in layer_names:
        if rule == "none":
            key = 0
        elif rule == "name":
            key = n.split(".")[-1]
        else:
            key = numel_fn(n)
        groups.setdefault(key, []).append(n)
    return [v for v in groups.values()]


# ---------------------------------------------------------------------------
# Model adapter
# ---------------------------------------------------------------------------


class SearchModel:
    """Holds (params, cfg) and swaps DB layer variants functionally."""

    def __init__(self, params, cfg: LlamaConfig, db_path: Union[str, Path]):
        self.params = params
        self.cfg = cfg
        self.db_path = Path(db_path)
        self.state: Optional[State] = None

    def numel(self, layer_name: str) -> int:
        return int(np.prod(llama.get_linear(self.params, layer_name).shape))

    def _load_file(self, layer_name: str, filename: str) -> np.ndarray:
        path = self.db_path / layer_name / filename
        try:
            import torch

            t = torch.load(path, map_location="cpu", weights_only=True)
            return t.float().numpy()
        except Exception:
            # npz / raw numpy variants
            z = np.load(path, allow_pickle=False)
            return np.asarray(z)

    def load_layers(
        self,
        grouped_layer_names: Sequence[Sequence[str]],
        new_state: State,
        available: Dict[str, List[Tuple[float, str]]],
    ) -> None:
        """Swap layers whose bitwidth changed (evo_quant_search.py:110-138)."""
        import jax.numpy as jnp

        if self.state is None:
            self.state = [[None] * len(g) for g in grouped_layer_names]
        for gi, names in enumerate(grouped_layer_names):
            for li, name in enumerate(names):
                new_bw = new_state[gi][li]
                if new_bw == self.state[gi][li]:
                    continue
                filename = None
                for bw, fn in available[name]:
                    if abs(bw - new_bw) < 1e-6:
                        filename = fn
                        break
                if filename is None:
                    raise ValueError(f"no file for {name} at {new_bw}")
                w = self._load_file(name, filename)
                old = llama.get_linear(self.params, name)
                self.params = llama.set_linear(
                    self.params, name, jnp.asarray(w, dtype=old.dtype)
                )
        self.state = copy.deepcopy(new_state)


# ---------------------------------------------------------------------------
# Budget accounting (evo_quant_search.py:55-107)
# ---------------------------------------------------------------------------


def calculate_total_bits(state: State, groups: Sequence[Sequence[str]], numel_fn) -> float:
    total = 0
    for gi, names in enumerate(groups):
        for li, name in enumerate(names):
            total += numel_fn(name) * state[gi][li]
    return total


def get_next_bitwidth(
    state: State,
    target_bits: float,
    groups: Sequence[Sequence[str]],
    available: Dict[str, List[Tuple[float, str]]],
    numel_fn,
    gi: int,
    li: int,
    direction: str = "decrease",
) -> Optional[float]:
    name = groups[gi][li]
    cur = state[gi][li]
    if direction == "decrease":
        cands = [bw for bw, _ in available[name] if bw < cur]
        return cands[-1] if cands else None
    cands = [bw for bw, _ in available[name] if bw > cur]
    if not cands:
        return None
    cur_total = calculate_total_bits(state, groups, numel_fn)
    numel = numel_fn(name)
    for bw in cands:
        if cur_total + numel * (bw - cur) <= target_bits:
            return bw
    return None


# ---------------------------------------------------------------------------
# Fitness + selection (evo_quant_search.py:141-199)
# ---------------------------------------------------------------------------


def compute_fitness(model: SearchModel, data, fitness_fn, target_logits=None) -> float:
    if fitness_fn == "ppl":
        return ppl_mod.compute_perplexity(model.params, model.cfg, data)
    if fitness_fn == "kl":
        return ppl_mod.compute_kl_div(model.params, model.cfg, data, target_logits)
    if fitness_fn == "sparse_kl":
        return ppl_mod.compute_sparse_kl_div(model.params, model.cfg, data, target_logits)
    raise ValueError(fitness_fn)


def sample_minibatch(calibration_data, num_tokens, target_logits=None, fitness_fn="ppl"):
    """Random token-exact minibatch (evo_quant_search.py:150-182)."""
    minibatch, used_ids, tl_minibatch = [], [], []
    tokens_used = 0
    while tokens_used < num_tokens:
        i = random.randint(0, len(calibration_data) - 1)
        if i in used_ids:
            continue
        used_ids.append(i)
        sample = np.atleast_2d(np.asarray(calibration_data[i]))
        remaining = num_tokens - tokens_used
        if sample.shape[1] > remaining:
            minibatch.append(sample[:, :remaining])
            if fitness_fn == "kl":
                tl_minibatch.append(target_logits[i][:, :remaining])
            elif fitness_fn == "sparse_kl":
                tl_minibatch.append(
                    (target_logits[i][0][:, :remaining], target_logits[i][1][:, :remaining])
                )
            tokens_used = num_tokens
        else:
            minibatch.append(sample)
            if fitness_fn in ("kl", "sparse_kl"):
                tl_minibatch.append(target_logits[i])
            tokens_used += sample.shape[1]
    return minibatch, (tl_minibatch or None)


def selection(
    model: SearchModel,
    groups,
    available,
    candidates: List[State],
    num_survive: int,
    calibration_data,
    num_tokens: int,
    fitness_fn: str = "ppl",
    target_logits=None,
    mesh=None,
):
    minibatch, tl = sample_minibatch(calibration_data, num_tokens, target_logits, fitness_fn)
    if mesh is not None:
        fitnesses = _parallel_candidate_fitness(
            model, groups, available, candidates, minibatch, mesh,
            fitness_fn=fitness_fn, tl_minibatch=tl,
        )
    else:
        fitnesses = []
        for cand in candidates:
            model.load_layers(groups, cand, available)
            fitnesses.append(compute_fitness(model, minibatch, fitness_fn, tl))
    best = np.argsort(fitnesses)[:num_survive]
    return [candidates[i] for i in best], [fitnesses[i] for i in best]


@functools.partial(jax.jit, static_argnames=("cfg", "names", "fitness_fn"))
def _stacked_candidate_fitness_jit(base_params, stacked, ids, mask, teacher,
                                   cfg: LlamaConfig, names: Tuple[str, ...],
                                   fitness_fn: str):
    """vmapped masked token-mean fitness over a leading candidate axis.

    stacked: tuple of (C, out, in) weight stacks aligned with ``names``; the
    candidate axis is sharded over the mesh's dp devices, so each device
    evaluates its own candidate (SURVEY §7.13: the reference leaves every
    non-main rank idle here). fitness_fn selects the per-position score:
    NLL (ppl), dense KL vs cached teacher logits, or top-k sparse KL —
    teacher arrays are candidate-invariant, so they replicate across the
    mesh while only the weight stacks shard."""

    def one(swaps):
        p = base_params
        for name, w in zip(names, swaps):
            p = llama.set_linear(p, name, w)
        logits = llama.forward(p, ids, cfg)
        m = mask[:, 1:].astype(jnp.float32)
        if fitness_fn == "ppl":
            shift_logits = logits[:, :-1, :]
            shift_labels = ids[:, 1:]
            logz = jax.scipy.special.logsumexp(shift_logits, axis=-1)
            tok = jnp.take_along_axis(
                shift_logits, shift_labels[..., None], axis=-1)[..., 0]
            score = logz - tok
        elif fitness_fn == "kl":
            logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
            logq = jax.nn.log_softmax(teacher[:, :-1, :], axis=-1)
            score = jnp.sum(jnp.exp(logq) * (logq - logp), axis=-1)
        else:  # sparse_kl: teacher = (top-k logits, top-k ids)
            t_vals, t_ids = teacher
            g = jnp.take_along_axis(logits, t_ids, axis=-1)[:, :-1, :]
            logp = jax.nn.log_softmax(g, axis=-1)
            logq = jax.nn.log_softmax(t_vals[:, :-1, :], axis=-1)
            score = jnp.sum(jnp.exp(logq) * (logq - logp), axis=-1)
        return jnp.sum(score * m) / jnp.sum(m)

    return jax.vmap(one, in_axes=(0,))(stacked)


def _parallel_candidate_fitness(
    model: SearchModel, groups, available, candidates: List[State], minibatch,
    mesh, fitness_fn: str = "ppl", tl_minibatch=None,
) -> List[float]:
    """Device-parallel candidate evaluation: stack each candidate's layer
    choices along a dp-sharded axis and evaluate all of them in one program.

    Token-mean scores over the padded minibatch order candidates identically
    to the sequential loops (ppl: exp is monotonic and equal-length
    weighting matches batch_size=1 token-count weighting; kl/sparse_kl:
    the sequential total/count IS the masked token mean)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    names = tuple(n for g in groups for n in g)
    S = max(np.atleast_2d(np.asarray(m)).shape[1] for m in minibatch)
    ids = np.zeros((len(minibatch), S), np.int64)
    mask = np.zeros((len(minibatch), S), np.bool_)
    for i, m in enumerate(minibatch):
        m = np.atleast_2d(np.asarray(m))
        ids[i, : m.shape[1]] = m[0]
        mask[i, : m.shape[1]] = True
    ids_j = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)

    teacher = None
    if fitness_fn == "kl":
        V = np.atleast_3d(np.asarray(tl_minibatch[0])).shape[-1]
        t = np.zeros((len(minibatch), S, V), np.float32)
        for i, tl in enumerate(tl_minibatch):
            tl = np.asarray(tl).reshape(1, -1, V)
            t[i, : tl.shape[1]] = tl[0]
        teacher = jnp.asarray(t)
    elif fitness_fn == "sparse_kl":
        K = np.asarray(tl_minibatch[0][0]).shape[-1]
        tv = np.zeros((len(minibatch), S, K), np.float32)
        ti = np.zeros((len(minibatch), S, K), np.int32)
        for i, (vals, idx) in enumerate(tl_minibatch):
            vals = np.asarray(vals).reshape(1, -1, K)
            idx = np.asarray(idx).reshape(1, -1, K)
            tv[i, : vals.shape[1]] = vals[0]
            ti[i, : idx.shape[1]] = idx[0]
        teacher = (jnp.asarray(tv), jnp.asarray(ti))

    n_dev = int(mesh.shape.get("dp", 1))
    bw_index = {
        name: {round(bw, 6): fn for bw, fn in available[name]} for name in names
    }

    def file_for(name, bw):
        return bw_index[name][round(bw, 6)]

    fitnesses: List[float] = []
    for start in range(0, len(candidates), n_dev):
        chunk = list(candidates[start : start + n_dev])
        real = len(chunk)
        while len(chunk) < n_dev:
            chunk.append(chunk[-1])
        stacked = []
        for gi, g in enumerate(groups):
            for li, name in enumerate(g):
                ws = [
                    model._load_file(name, file_for(name, cand[gi][li]))
                    for cand in chunk
                ]
                arr = jnp.asarray(np.stack(ws), dtype=jnp.float32)
                stacked.append(
                    jax.device_put(arr, NamedSharding(mesh, P("dp", None, None)))
                )
        fits = _stacked_candidate_fitness_jit(
            model.params, tuple(stacked), ids_j, mask_j, teacher, model.cfg,
            names, fitness_fn,
        )
        fitnesses.extend(np.asarray(fits)[:real].tolist())
    return fitnesses


# ---------------------------------------------------------------------------
# Mutation (evo_quant_search.py:509-742)
# ---------------------------------------------------------------------------


def _pick_group(groups) -> int:
    return random.choices(range(len(groups)), weights=[len(g) for g in groups])[0]


def _ids_where(state, target_bits, groups, available, numel_fn, gi, direction):
    return [
        i
        for i in range(len(groups[gi]))
        if get_next_bitwidth(state, target_bits, groups, available, numel_fn, gi, i, direction)
        is not None
    ]


def _repair_budget(state, target_bits, groups, available, numel_fn, max_iterations=1000):
    """Decrease random layers until under budget."""
    bits = calculate_total_bits(state, groups, numel_fn)
    it = 0
    while bits > target_bits and it < max_iterations:
        it += 1
        gi = _pick_group(groups)
        decr = _ids_where(state, target_bits, groups, available, numel_fn, gi, "decrease")
        if not decr:
            break
        li = random.choice(decr)
        state[gi][li] = get_next_bitwidth(
            state, target_bits, groups, available, numel_fn, gi, li, "decrease"
        )
        bits = calculate_total_bits(state, groups, numel_fn)
    return bits


def mutate_ungrouped(offspring, num_flips, target_bits, groups, available, numel_fn) -> bool:
    """group_rule == "none" mutation (evo_quant_search.py:517-633)."""
    _repair_budget(offspring, target_bits, groups, available, numel_fn)
    successful_increases = 0
    decrease_attempts = 0
    for _ in range(num_flips):
        gi = _pick_group(groups)
        incr = _ids_where(offspring, target_bits, groups, available, numel_fn, gi, "increase")
        if not incr:
            for _ in range(3):
                decrease_attempts += 1
                dgi = _pick_group(groups)
                decr = _ids_where(offspring, target_bits, groups, available, numel_fn, dgi, "decrease")
                if decr:
                    dli = random.choice(decr)
                    offspring[dgi][dli] = get_next_bitwidth(
                        offspring, target_bits, groups, available, numel_fn, dgi, dli, "decrease"
                    )
                    incr = _ids_where(
                        offspring, target_bits, groups, available, numel_fn, gi, "increase"
                    )
                    if incr:
                        break
        if incr:
            li = random.choice(incr)
            offspring[gi][li] = get_next_bitwidth(
                offspring, target_bits, groups, available, numel_fn, gi, li, "increase"
            )
            successful_increases += 1
    if successful_increases == 0 and decrease_attempts > 5:
        return False
    return True


def mutate_grouped(offspring, num_flips, target_bits, groups, available, numel_fn) -> bool:
    """group_rule in ("name", "size") mutation — swaps within a group of
    same-size layers (evo_quant_search.py:636-742)."""
    _repair_budget(offspring, target_bits, groups, available, numel_fn, max_iterations=100)
    successful = 0
    for _ in range(num_flips):
        gi = _pick_group(groups)
        decr = _ids_where(offspring, target_bits, groups, available, numel_fn, gi, "decrease")
        if not decr:
            continue
        decr_id = random.choice(decr)
        incr = _ids_where(offspring, target_bits, groups, available, numel_fn, gi, "increase")
        if not incr:
            others = [i for i in decr if i != decr_id]
            if others:
                other = random.choice(others)
                offspring[gi][other] = get_next_bitwidth(
                    offspring, target_bits, groups, available, numel_fn, gi, other, "decrease"
                )
                incr = _ids_where(offspring, target_bits, groups, available, numel_fn, gi, "increase")
            if not incr:
                continue
        incr_id = random.choice(incr)
        offspring[gi][decr_id] = get_next_bitwidth(
            offspring, target_bits, groups, available, numel_fn, gi, decr_id, "decrease"
        )
        offspring[gi][incr_id] = get_next_bitwidth(
            offspring, target_bits, groups, available, numel_fn, gi, incr_id, "increase"
        )
        successful += 1
    return successful > 0


# ---------------------------------------------------------------------------
# Search driver (evo_quant_search.py:310-812)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EvoPressConfig:
    target_bitwidth: float = 4.0
    generations: int = 50
    offspring: int = 128
    survivors_per_selection: Tuple[int, ...] = (16, 4, 1)
    tokens_per_selection: Tuple[int, ...] = (2048, 16384, 131072)
    fitness_fn: str = "ppl"  # ppl | kl | sparse_kl
    group_rule: str = "size"
    initially_generated: int = 64
    initial_tokens: int = 16384
    kl_topk: int = 64
    eval_every: int = 10
    seed: int = 0
    checkpoint_path: Optional[str] = None


def write_config(
    path: Union[str, Path],
    groups: Sequence[Sequence[str]],
    state: State,
    available: Dict[str, List[Tuple[float, str]]],
) -> None:
    """Final config text format (evo_quant_search.py:780-795)."""
    lines = []
    for names, bws in zip(groups, state):
        for name, bw in zip(names, bws):
            filename = next(
                (fn for b, fn in available[name] if abs(b - bw) < 1e-6), None
            )
            lines.append(f"{name}: {bw} ({filename})")
    Path(path).write_text("\n".join(lines))


def parse_state_config(path: Union[str, Path]) -> Dict[str, Tuple[float, str]]:
    out = {}
    for line in Path(path).read_text().splitlines():
        if ":" not in line:
            continue
        name, rest = line.split(":", 1)
        parts = rest.strip().split(" ", 1)
        bw = float(parts[0])
        fn = parts[1].strip("()") if len(parts) > 1 else None
        out[name.strip()] = (bw, fn)
    return out


def evo_press_search(
    model: SearchModel,
    calibration_data,
    cfg: EvoPressConfig,
    *,
    eval_datasets: Optional[Dict[str, Any]] = None,
    target_logits=None,
    mesh=None,
    log: Callable[[str], None] = print,
) -> Tuple[State, List[List[str]], Dict[str, List[Tuple[float, str]]]]:
    """Run the generational search; returns (best_state, groups, available)."""
    assert len(cfg.survivors_per_selection) == len(cfg.tokens_per_selection)
    assert cfg.survivors_per_selection[-1] == 1
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    available = scan_available_bitwidths(model.db_path)
    layer_names = sorted(available.keys(), key=layer_order_fn)
    numel_fn = model.numel
    groups = group_layers(layer_names, cfg.group_rule, numel_fn)

    target_bits = sum(
        int(numel_fn(n) * cfg.target_bitwidth) for g in groups for n in g
    )
    quantizable = sum(numel_fn(n) for g in groups for n in g)

    # ---- init (evo_quant_search.py:402-483) ----
    if int(cfg.target_bitwidth) == cfg.target_bitwidth:
        parent: State = []
        for names in groups:
            row = []
            for n in names:
                bws = [bw for bw, _ in available[n]]
                row.append(
                    cfg.target_bitwidth
                    if cfg.target_bitwidth in bws
                    else min(bws, key=lambda x: abs(x - cfg.target_bitwidth))
                )
            parent.append(row)
        train_fitness = float("inf")
    else:
        candidates = []
        for _ in range(cfg.initially_generated):
            cand: State = []
            for names in groups:
                row = []
                for n in names:
                    bws = [bw for bw, _ in available[n]]
                    row.append(min(bws, key=lambda x: abs(x - math.ceil(cfg.target_bitwidth))))
                cand.append(row)
            _repair_budget(cand, target_bits, groups, available, numel_fn)
            candidates.append(cand)
        candidates, fits = selection(
            model, groups, available, candidates, 1,
            calibration_data, cfg.initial_tokens, cfg.fitness_fn, target_logits,
            mesh=mesh,
        )
        parent, train_fitness = candidates[0], fits[0]

    parent_bits = calculate_total_bits(parent, groups, numel_fn)

    for generation in range(cfg.generations):
        log(
            f"[evopress] gen {generation + 1}/{cfg.generations} "
            f"bits/weight {parent_bits / quantizable:.4f} fitness {train_fitness:.4e}"
        )
        model.load_layers(groups, parent, available)

        if eval_datasets and generation % cfg.eval_every == 0:
            for name, ds in eval_datasets.items():
                log(f"[evopress]   {name} ppl: {ppl_mod.compute_perplexity(model.params, model.cfg, ds):.3f}")

        # ---- offspring generation with dedup (evo_quant_search.py:509-756)
        offspring_list: List[State] = []
        duplicates = 0
        while len(offspring_list) < cfg.offspring:
            off = copy.deepcopy(parent)
            num_flips = min(random.randint(1, 3), random.randint(1, 3))
            if cfg.group_rule == "none":
                ok = mutate_ungrouped(off, num_flips, target_bits, groups, available, numel_fn)
            else:
                ok = mutate_grouped(off, num_flips, target_bits, groups, available, numel_fn)
            if not ok:
                continue
            if off in offspring_list or off == parent:
                duplicates += 1
                if duplicates > 10:
                    log(f"[evopress] too many duplicates, {len(offspring_list)} offspring")
                    break
                continue
            duplicates = 0
            offspring_list.append(off)

        # ---- staged selection funnel with elitism (:758-776) ----
        for num_survive, num_tokens in zip(
            cfg.survivors_per_selection, cfg.tokens_per_selection
        ):
            if num_survive == cfg.survivors_per_selection[-1] and parent not in offspring_list:
                offspring_list.append(parent)
            offspring_list, fits = selection(
                model, groups, available, offspring_list, num_survive,
                calibration_data, num_tokens, cfg.fitness_fn, target_logits,
                mesh=mesh,
            )
        train_fitness = fits[0]
        parent = offspring_list[0]
        parent_bits = calculate_total_bits(parent, groups, numel_fn)

        if cfg.checkpoint_path:
            with open(cfg.checkpoint_path, "w") as f:
                json.dump(
                    {
                        "generation": generation,
                        "parent": parent,
                        "train_fitness": train_fitness,
                        "groups": [list(g) for g in groups],
                    },
                    f,
                )

    return parent, [list(g) for g in groups], available


def compute_target_logits(model: SearchModel, calibration_data, fitness_fn: str, topk: int = 64):
    """Cache teacher logits for KL fitness (evo_quant_search.py:360-373)."""
    import jax.numpy as jnp

    out = []
    for sample in calibration_data:
        ids = np.atleast_2d(np.asarray(sample))
        logits = np.asarray(llama.forward(model.params, jnp.asarray(ids), model.cfg))
        if fitness_fn == "kl":
            out.append(logits)
        else:  # sparse_kl: (values, indices)
            idx = np.argsort(-logits, axis=-1)[..., :topk]
            vals = np.take_along_axis(logits, idx, axis=-1)
            out.append((vals, idx))
    return out
