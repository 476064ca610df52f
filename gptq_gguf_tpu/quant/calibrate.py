"""Sequential block-wise GPTQ calibration walk.

Functional re-expression of the reference Quantizer orchestrator
(quant/gptq/src/quantizer.py:25-330):

* block-0 inputs come from running the embedding explicitly — no
  InputCollector/ForwardInterrupt hook machinery (quantizer.py:77-89);
* per block, ONE jitted capture step accumulates the Hessians of all
  quantizable linears simultaneously (the reference attaches one hook +
  Hessian per linear, quantizer.py:222-240 — but q/k/v and gate/up share
  identical inputs, so we keep 4 Hessians instead of 7 with numerics
  unchanged);
* each linear is solved with ``ops.gptq.gptq_quantize_matrix`` and its
  weight functionally replaced by the dequantized result
  (quantizer.py:242-275), then the block is re-run to propagate quantized
  activations (quantizer.py:161-172);
* embeddings / lm_head are RTN-quantized without a Hessian
  (quantizer.py:278-330) when ``quant_non_block`` is set;
* per-layer artifacts are written immediately after each solve, keeping the
  reference's restartability property (SURVEY.md §5.4).

Weights stage one block at a time; calibration activations stay
device-resident by default (they don't grow with depth) and offload to
host numpy only when the set exceeds 2 GB — see ``offload_activations``
(the reference's ``cpu_offload_activations``, round-5: the unconditional
host staging cost a ~256 MB/layer relay round trip at 8B shapes).
"""

from __future__ import annotations

import functools
import re
import time
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.ggml import GGMLQuantizationType, KQUANT_SPECS
from ..models import llama
from ..models.llama import LlamaConfig
from ..ops import gptq as gptq_ops
from ..ops import kquant
from ..ops.gptq import GPTQConfig
from . import artifacts

# which capture feeds each linear, and the HF module-name template
_LINEAR_SPECS = [
    ("q_proj", "qkv", "model.layers.{i}.self_attn.q_proj"),
    ("k_proj", "qkv", "model.layers.{i}.self_attn.k_proj"),
    ("v_proj", "qkv", "model.layers.{i}.self_attn.v_proj"),
    ("o_proj", "o", "model.layers.{i}.self_attn.o_proj"),
    ("gate_proj", "gateup", "model.layers.{i}.mlp.gate_proj"),
    ("up_proj", "gateup", "model.layers.{i}.mlp.up_proj"),
    ("down_proj", "down", "model.layers.{i}.mlp.down_proj"),
]

# MLA attention (deepseek_v2/v3): q_a/q_proj and kv_a share the block input
# ("qkv" capture); the low-rank second stages get their own captures
_MLA_ATTN_SPECS = [
    ("q_proj", "qkv", "model.layers.{i}.self_attn.q_proj"),
    ("q_a_proj", "qkv", "model.layers.{i}.self_attn.q_a_proj"),
    ("kv_a_proj", "qkv", "model.layers.{i}.self_attn.kv_a_proj_with_mqa"),
    ("q_b_proj", "q_b", "model.layers.{i}.self_attn.q_b_proj"),
    ("kv_b_proj", "kv_b", "model.layers.{i}.self_attn.kv_b_proj"),
    ("o_proj", "o", "model.layers.{i}.self_attn.o_proj"),
]


def _layer_specs(layer) -> list:
    """(key, capture, name_template) for the quantizable linears actually
    present in this layer's param dict (shape-driven: MLA vs GQA attention,
    gated vs gateless MLP)."""
    mla = "kv_a_proj" in layer
    attn = _MLA_ATTN_SPECS if mla else _LINEAR_SPECS[:4]
    specs = [s for s in attn if s[0] in layer]
    specs += [s for s in _LINEAR_SPECS[4:] if s[0] in layer]
    return specs


def _capture_sizes(layer, cfg) -> Dict[str, int]:
    """capture name -> input dim, for the dense-layer Hessians."""
    sizes = {"qkv": cfg.hidden_size, "o": layer["o_proj"].shape[1]}
    if "q_b_proj" in layer:
        sizes["q_b"] = layer["q_b_proj"].shape[1]
    if "kv_b_proj" in layer:
        sizes["kv_b"] = layer["kv_b_proj"].shape[1]
    if "gate_inp" not in layer:
        if "gate_proj" in layer or "up_proj" in layer:
            sizes["gateup"] = cfg.hidden_size
        if "down_proj" in layer:
            sizes["down"] = layer["down_proj"].shape[1]
    return sizes

DEFAULT_BLOCK_QTYPE = GGMLQuantizationType.Q4_K  # quantizer.py:249-250
DEFAULT_NON_BLOCK_QTYPE = GGMLQuantizationType.Q6_K  # quantizer.py:106-107


def resolve_quant_config(
    quant_config: Optional[Dict[str, Union[str, GGMLQuantizationType]]]
) -> Dict[str, GGMLQuantizationType]:
    out = {}
    for k, v in (quant_config or {}).items():
        out[k] = GGMLQuantizationType[v] if isinstance(v, str) else GGMLQuantizationType(v)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "layer_idx"), donate_argnames=("hs",))
def _capture_step(layer, x, cos, sin, mask, hs, counts, cfg: LlamaConfig, layer_idx: int = 0):
    """Forward one batch through a block, updating the 4 Hessians."""
    out, caps = llama.block_capture(layer, x, cos, sin, mask, cfg, layer_idx)
    new_hs = {}
    new_counts = {}
    for key in hs:
        h, n = gptq_ops.accumulate_hessian(hs[key], counts[key], caps[key])
        new_hs[key] = h
        new_counts[key] = n
    return out, new_hs, new_counts


@functools.partial(jax.jit, static_argnames=("cfg", "layer_idx"))
def _propagate_step(layer, x, cos, sin, mask, cfg: LlamaConfig, layer_idx: int = 0):
    return llama.block_forward(layer, x, cos, sin, mask, cfg, layer_idx)


@functools.partial(jax.jit, static_argnames=("cfg", "layer_idx"), donate_argnames=("hs",))
def _capture_scan(layer, xs, cos, sin, mask, hs, counts, cfg: LlamaConfig,
                  layer_idx: int = 0):
    """All calibration batches through one block in a single program.

    xs: (N, B, S, H). One dispatch instead of N (the round-1 walk was
    dominated by host-loop dispatch/sync on the relay chip, ROADMAP #4);
    the EMA accumulation order matches the sequential loop exactly.
    """

    def body(carry, x):
        hs, counts = carry
        out, caps = llama.block_capture(layer, x, cos, sin, mask, cfg, layer_idx)
        new_hs, new_counts = {}, {}
        for key in hs:
            h, n = gptq_ops.accumulate_hessian(hs[key], counts[key], caps[key])
            new_hs[key] = h
            new_counts[key] = n
        return (new_hs, new_counts), out

    (hs, counts), outs = jax.lax.scan(body, (hs, counts), xs)
    return outs, hs, counts


@functools.partial(jax.jit, static_argnames=("cfg", "layer_idx"))
def _propagate_scan(layer, xs, cos, sin, mask, cfg: LlamaConfig, layer_idx: int = 0):
    def body(_, x):
        return None, llama.block_forward(layer, x, cos, sin, mask, cfg, layer_idx)

    _, outs = jax.lax.scan(body, None, xs)
    return outs


@functools.partial(
    jax.jit, static_argnames=("cfg", "layer_idx"), donate_argnames=("hs", "moe_sums")
)
def _capture_step_moe(layer, x, cos, sin, mask, hs, counts, moe_sums,
                      cfg: LlamaConfig, layer_idx: int = 0):
    """Capture step for sparse-MoE blocks: dense Hessians for qkv/o/router
    (+ shared expert) plus per-expert raw X^T X sums over routed tokens
    (GPTQ is invariant to Hessian scaling, so raw sums suffice)."""
    out, caps = llama.block_capture(layer, x, cos, sin, mask, cfg, layer_idx)
    new_hs, new_counts = {}, {}
    cap_src = {"shared_down": "shared_down_in"}
    for key in hs:
        h, n = gptq_ops.accumulate_hessian(hs[key], counts[key], caps[cap_src.get(key, key)])
        new_hs[key] = h
        new_counts[key] = n
    new_moe = {
        "in": moe_sums["in"] + caps["experts_in_xtx"],
        "down": moe_sums["down"] + caps["experts_down_xtx"],
        "n": moe_sums["n"] + caps["experts_tokens"],
    }
    return out, new_hs, new_counts, new_moe


class CalibrationResult(Dict[str, Any]):
    pass


def quantize_model(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    calibration_ids: Sequence[np.ndarray],
    quant_config: Optional[Dict[str, Any]] = None,
    gptq_cfg: GPTQConfig = GPTQConfig(),
    save_dir: Optional[Union[str, Path]] = None,
    *,
    quant_non_block: bool = False,
    quantizable_regex: str = ".*",
    batch_size: int = 1,
    mesh=None,
    scan_batches: Optional[bool] = None,
    verbose: bool = False,
    stage_times: Optional[Dict[str, float]] = None,
    offload_activations: Optional[bool] = None,
    offload_weights: Optional[bool] = None,
) -> Dict[str, Any]:
    """Run the GPTQ calibration walk; returns params with quantized weights.

    calibration_ids: list of (B, S) or (S,) int token arrays (equal S).
    quant_config: {module_suffix: qtype}, e.g. {"q_proj": "Q4_K", ...};
    unlisted block linears default to Q4_K, non-block modules to Q6_K.
    mesh: optional Mesh for data-parallel Hessian accumulation (see
    parallel.dp) — calibration batches are sharded and Hessians psum-reduced,
    replacing the reference's NCCL all_reduce (gptq.py:131-132).
    scan_batches: run all calibration batches through each block in ONE
    jitted lax.scan (activations stay device-resident between blocks) —
    removes the per-batch host dispatch/sync of the walk. Opt-in: the scan
    program costs one (large) extra compile, which only amortizes for deep
    models / many batches; measured on the relay chip the compile exceeded
    15 min, so None defaults to off.
    stage_times: when a dict is passed, the walk accumulates per-stage
    wall-clock into it (stage_in / capture / factorize_solve / artifact /
    propagate / unstage, seconds) — it inserts device syncs at stage
    boundaries, so only enable it to profile (VERDICT r4 #5: the 8B solve
    measured 1.0 Mw/s end-to-end with no breakdown to aim the fix at).
    offload_activations: stage calibration activations to host numpy
    between blocks (the reference's cpu_offload_activations). None (auto):
    offload only when the activation set exceeds 2 GB — the set doesn't
    grow with depth, so at typical calibration sizes (16 x 1 x 512 x 4096
    f32 = 128 MB for 8B) keeping it device-resident saves a ~256 MB/layer
    host<->device round trip on the relay for nothing.
    offload_weights: return each quantized block to host numpy after
    propagation (bounds HBM at ~one block of the model — required for
    checkpoints that do not fit on one chip). None (auto): offload only
    when the whole stack would exceed 4 GB device-resident. The round-5
    stage breakdown measured the unconditional offload at ~42 s/layer of
    pure device->host relay transfer at 8B shapes.
    """
    qcfg = resolve_quant_config(quant_config)
    pattern = re.compile(quantizable_regex)
    t_start = time.perf_counter()

    class _tick:
        """Context manager accumulating wall time into stage_times[name],
        with a device sync on the given arrays at exit. No-op (and no
        syncs) when profiling is off."""

        def __init__(self, name):
            self.name = name

        def __enter__(self):
            if stage_times is not None:
                self.t0 = time.perf_counter()
            return self

        def sync(self, *arrays):
            self._arrays = arrays

        def __exit__(self, *exc):
            if stage_times is not None and exc[0] is None:
                for a in getattr(self, "_arrays", ()):
                    jax.block_until_ready(a)
                stage_times[self.name] = (
                    stage_times.get(self.name, 0.0)
                    + time.perf_counter() - self.t0)
            return False

    ids = [np.atleast_2d(np.asarray(a)) for a in calibration_ids]
    S = ids[0].shape[1]
    batches: List[np.ndarray] = []
    for i in range(0, len(ids), batch_size):
        batches.append(np.concatenate(ids[i : i + batch_size], axis=0))

    positions = jnp.arange(S)[None, :]
    cos1, sin1 = llama.rope_cos_sin(cfg, positions)

    def rope_for(b):
        return jnp.broadcast_to(cos1, (b, S, cos1.shape[-1])), jnp.broadcast_to(
            sin1, (b, S, sin1.shape[-1])
        )

    # ---- non-block pre module: embed_tokens (quantizer.py:94-128) ----
    if quant_non_block:
        qtype = qcfg.get("embed_tokens", DEFAULT_NON_BLOCK_QTYPE)
        params = _quant_non_block(
            params, "model.embed_tokens", qtype, gptq_cfg, save_dir, verbose
        )

    # ---- block-0 inputs ----
    # host-staged checkpoints (loader.load_params(host=True)): only the
    # embedding visits the device here; each block is staged in the walk
    if offload_activations is None:
        act_bytes = sum(b.shape[0] * S * cfg.hidden_size * 4 for b in batches)
        offload_activations = act_bytes > 2 * 2 ** 30
    _stage_act = np.asarray if offload_activations else (lambda a: a)
    if offload_weights is None:
        stack_bytes = sum(
            a.size * a.dtype.itemsize
            for l in params["layers"]
            for a in jax.tree_util.tree_leaves(l))
        offload_weights = stack_bytes > 4 * 2 ** 30
    _stage_out = np.asarray if offload_weights else (lambda a: a)

    def _stage_in(a):
        """Upload one block leaf; fp16 host checkpoints upload at fp16
        (half the relay bytes) and widen to f32 on device — identical
        values to widening host-side."""
        x = jnp.asarray(a)
        return x.astype(jnp.float32) if x.dtype == jnp.float16 else x

    # async artifact pipeline: the codes/params readback is pure
    # device->host relay transfer (round-5 breakdown: the dominant stage).
    # copy_to_host_async() starts the transfer immediately; the MAIN thread
    # materializes one layer later (by then the copy has landed under the
    # next layer's compute) and only the FILE WRITE runs on a worker
    # thread — all jax calls stay on the main thread (the relay transport
    # is not thread-safe; a worker-thread device_get deadlocked it).
    _saver = None
    _save_futures: List[Any] = []
    _save_pending: List[Any] = []
    if save_dir is not None:
        import concurrent.futures

        _saver = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def _save_async(name, qtype, arrs):
        """arrs: (qweight, super_scale, super_zero, scale_q, zero_q) device
        slices; transfer kicked off now, drained at the next layer edge."""
        for a in arrs:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        _save_pending.append((name, qtype, arrs))

    def _drain_saves():
        while _save_pending:
            name, qtype, arrs = _save_pending.pop(0)
            qw, ss_, sz_, sq_, zq_ = [np.asarray(a) for a in arrs]
            art = artifacts.LayerArtifact(
                q_type=qtype, qweight=qw, super_group_scale=ss_,
                super_group_zero=sz_, group_scale_quant=sq_,
                group_zero_quant=zq_)
            _save_futures.append(
                _saver.submit(artifacts.save_layer, save_dir, name, art))

    # async weight offload (round 5): when offload_weights is on, the
    # solved block's device->host copy starts right after propagation and
    # materializes ONE LAYER LATER on the main thread — the transfer rides
    # under the next block's capture/solve instead of serializing ~40 s of
    # relay D2H per 8B layer (the 12-layer run measured unstage at 479 s).
    _unstage_pending: List[Any] = []
    # fp16 checkpoints offload back at fp16: the dequantized block's f32
    # values round to the checkpoint's own precision (well below K-quant
    # noise), halving the device->host bytes on the ~15-20 MB/s relay
    _offload_f16 = any(
        isinstance(a, np.ndarray) and a.dtype == np.float16
        for a in jax.tree_util.tree_leaves(params["layers"][0]))

    def _unstage_async(li_, layer_tree):
        if _offload_f16:
            layer_tree = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float16)
                if a.dtype == jnp.float32 else a, layer_tree)
        for a in jax.tree_util.tree_leaves(layer_tree):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        _unstage_pending.append((li_, layer_tree))

    def _drain_unstage(params):
        while _unstage_pending:
            li_, tree = _unstage_pending.pop(0)
            layers = list(params["layers"])
            layers[li_] = jax.tree_util.tree_map(np.asarray, tree)
            params = {**params, "layers": layers}
        return params
    _embed_keys = ("embed_tokens", "pos_embed", "embed_norm", "embed_norm_bias")
    _staged = {k: jnp.asarray(params[k]) for k in _embed_keys
               if isinstance(params.get(k), np.ndarray)}
    _p_embed = {**params, **_staged} if _staged else params
    xs = [
        _stage_act(llama.embed_forward(_p_embed, jnp.asarray(b), cfg))
        for b in batches
    ]
    del _staged, _p_embed

    any_moe = any("gate_inp" in l for l in params["layers"])
    uniform = len({b.shape for b in batches}) == 1
    if scan_batches is None:
        scan_batches = False
    if scan_batches and (not uniform or any_moe):
        raise ValueError("scan_batches requires uniform batch shapes and no MoE layers")
    xs_stack = jnp.asarray(np.stack(xs)) if scan_batches else None

    # ---- sequential block walk ----
    n_layers = cfg.num_hidden_layers
    _prefetched = None
    for li in range(n_layers):
        t0 = time.perf_counter()
        # stage this block onto the device (no-op when already there) and
        # kick off the NEXT block's upload so it overlaps this block's
        # capture/solve; offload_weights returns solved blocks to host
        if save_dir is not None:
            with _tick("artifact"):
                _drain_saves()  # previous layer's readbacks (overlapped)
        with _tick("stage_in") as tk:
            layer = (_prefetched if _prefetched is not None else
                     jax.tree_util.tree_map(_stage_in, params["layers"][li]))
            _prefetched = (
                jax.tree_util.tree_map(_stage_in, params["layers"][li + 1])
                if li + 1 < n_layers else None)
            tk.sync(layer)
        _stage = list(params["layers"])
        _stage[li] = layer
        params = {**params, "layers": _stage}
        is_moe = "gate_inp" in layer
        sizes = _capture_sizes(layer, cfg)
        if is_moe:
            E, I_e = layer["experts_gate"].shape[0], layer["experts_gate"].shape[1]
            sizes["moe_router"] = cfg.hidden_size
            if "shared_down" in layer:
                sizes["shared_down"] = layer["shared_down"].shape[1]
            moe_sums = {
                "in": jnp.zeros((E, cfg.hidden_size, cfg.hidden_size), jnp.float32),
                "down": jnp.zeros((E, I_e, I_e), jnp.float32),
                "n": jnp.zeros((E,), jnp.float32),
            }
        hs = {k: jnp.zeros((d, d), jnp.float32) for k, d in sizes.items()}
        counts = {k: jnp.zeros((), jnp.float32) for k in sizes}

        with _tick("capture") as tk:
            if scan_batches:
                b0 = batches[0].shape[0]
                cos, sin = rope_for(b0)
                mask = llama.causal_mask(b0, S)
                _, hs, counts = _capture_scan(
                    layer, xs_stack, cos, sin, mask, hs, counts, cfg, li
                )
            for x in (xs if not scan_batches else ()):
                xj = jnp.asarray(x)
                if mesh is not None:
                    # batch axis sharded over dp: XLA all-reduces X^T X across
                    # devices inside the jitted step (replaces the reference's
                    # NCCL all_reduce, gptq.py:131-132). On multi-host runs the
                    # per-process shard assembles into a LARGER global batch.
                    from ..parallel import dp as dp_mod

                    xj = dp_mod.shard_batch(xj, mesh)
                b = xj.shape[0]
                cos, sin = rope_for(b)
                mask = llama.causal_mask(b, S)
                if is_moe:
                    _, hs, counts, moe_sums = _capture_step_moe(
                        layer, xj, cos, sin, mask, hs, counts, moe_sums, cfg, li
                    )
                else:
                    _, hs, counts = _capture_step(layer, xj, cos, sin, mask, hs, counts, cfg, li)
            tk.sync(hs)

        if is_moe:
            params = _solve_moe_block(
                params, li, hs, moe_sums, qcfg, gptq_cfg, pattern, save_dir, verbose
            )
            new_layer = params["layers"][li]
            # fall through to propagation below
            layers = list(params["layers"])
            layers[li] = new_layer
            params = {**params, "layers": layers}
            new_xs = []
            for x in xs:
                b = x.shape[0]
                cos, sin = rope_for(b)
                mask = llama.causal_mask(b, S)
                out = _propagate_step(new_layer, jnp.asarray(x), cos, sin, mask, cfg, li)
                new_xs.append(_stage_act(out))
            xs = new_xs
            layers = list(params["layers"])
            layers[li] = jax.tree_util.tree_map(_stage_out, layers[li])
            params = {**params, "layers": layers}
            if verbose:
                print(
                    f"[calibrate] block {li + 1}/{n_layers} (moe, {E} experts) "
                    f"done in {time.perf_counter() - t0:.2f}s"
                )
            continue

        # ---- solve each selected linear (quantizer.py:242-275) ----
        # Linears sharing a Hessian AND a quant type are solved together by
        # row-concatenation (rows are independent given the shared Cholesky):
        # q/k/v in one solve, gate/up in another — fewer dispatches and
        # better row-dim utilization than the reference's per-layer solves.
        new_layer = dict(layer)
        by_cap: Dict[str, list] = {}
        for key, cap, name_tpl in _layer_specs(layer):
            name = name_tpl.format(i=li)
            if not pattern.search(name):
                continue
            qtype = qcfg.get(key, DEFAULT_BLOCK_QTYPE)
            by_cap.setdefault(cap, []).append((key, name, qtype))

        for cap, members in by_cap.items():
            groups_by_qtype: Dict[Any, list] = {}
            for m in members:
                groups_by_qtype.setdefault(m[2], []).append(m)
            for qtype, group in groups_by_qtype.items():
                with _tick("factorize_solve") as tk:
                    Ws = [layer[key] for key, _, _ in group]
                    W_cat = jnp.concatenate(
                        [w.astype(jnp.float32) for w in Ws], axis=0
                    ) if len(group) > 1 else Ws[0].astype(jnp.float32)
                    res = gptq_ops.gptq_quantize_matrix(W_cat, hs[cap], qtype, gptq_cfg)
                    w_hat_cat = kquant.dequantize(res.qweight, res.params, qtype)
                    tk.sync(w_hat_cat)
                row = 0
                for (key, name, _), W in zip(group, Ws):
                    n = W.shape[0]
                    sl = slice(row, row + n)
                    row += n
                    new_layer[key] = w_hat_cat[sl].astype(W.dtype)
                    if save_dir is not None:
                        with _tick("artifact"):
                            _save_async(name, qtype, (
                                res.qweight[sl],
                                res.params.super_scale[sl],
                                res.params.super_zero[sl],
                                res.params.scale_q[sl],
                                res.params.zero_q[sl],
                            ))
                if verbose and bool(res.issue_non_invertible):
                    names = ", ".join(n for _, n, _ in group)
                    print(f"[calibrate] {names}: non-invertible Hessian, identity fallback")

        layers = list(params["layers"])
        layers[li] = new_layer
        params = {**params, "layers": layers}

        # ---- propagate quantized activations (quantizer.py:161-172) ----
        with _tick("propagate") as tk:
            if scan_batches:
                b0 = batches[0].shape[0]
                cos, sin = rope_for(b0)
                mask = llama.causal_mask(b0, S)
                xs_stack = _propagate_scan(new_layer, xs_stack, cos, sin, mask, cfg, li)
                tk.sync(xs_stack)
            else:
                new_xs = []
                for x in xs:
                    b = x.shape[0]
                    cos, sin = rope_for(b)
                    mask = llama.causal_mask(b, S)
                    out = _propagate_step(new_layer, jnp.asarray(x), cos, sin, mask, cfg, li)
                    new_xs.append(_stage_act(out))
                xs = new_xs

        with _tick("unstage"):
            if offload_weights:
                params = _drain_unstage(params)   # lag-1: previous block
                _unstage_async(li, params["layers"][li])
            # else: the solved block stays device-resident

        if verbose:
            print(
                f"[calibrate] block {li + 1}/{n_layers} done in "
                f"{time.perf_counter() - t0:.2f}s"
            )

    # ---- flush async weight offloads ----
    if offload_weights:
        with _tick("unstage"):
            params = _drain_unstage(params)

    # ---- flush async artifact writes ----
    if _saver is not None:
        with _tick("artifact_flush"):
            _drain_saves()
            for f in _save_futures:
                f.result()
        _saver.shutdown()

    # ---- non-block post module: lm_head (quantizer.py:181-214) ----
    if quant_non_block and not cfg.tie_word_embeddings:
        qtype = qcfg.get("lm_head", DEFAULT_NON_BLOCK_QTYPE)
        params = _quant_non_block(params, "lm_head", qtype, gptq_cfg, save_dir, verbose)

    if verbose:
        print(f"[calibrate] total {time.perf_counter() - t_start:.2f}s")
    return params


def _solve_moe_block(params, li, hs, moe_sums, qcfg, gptq_cfg, pattern, save_dir,
                     verbose):
    """GPTQ solves for one sparse-MoE block: attention linears with their
    shared Hessians, shared expert from the router-input Hessian, and each
    expert's gate/up (+down) from its routed-token Hessian. The router
    (gate_inp) stays float, matching llama.cpp's f32 ffn_gate_inp."""
    layer = params["layers"][li]
    new_layer = dict(layer)

    def solve_rows(Ws, H, qtype, names, dtypes):
        W_cat = jnp.concatenate([w.astype(jnp.float32) for w in Ws], axis=0) \
            if len(Ws) > 1 else Ws[0].astype(jnp.float32)
        res = gptq_ops.gptq_quantize_matrix(W_cat, H, qtype, gptq_cfg)
        w_hat = kquant.dequantize(res.qweight, res.params, qtype)
        out = []
        row = 0
        for W, name, dt in zip(Ws, names, dtypes):
            n = W.shape[0]
            sl = slice(row, row + n)
            row += n
            out.append(w_hat[sl].astype(dt))
            if save_dir is not None and name is not None:
                artifacts.save_layer(
                    save_dir, name,
                    artifacts.LayerArtifact(
                        q_type=qtype,
                        qweight=np.asarray(res.qweight[sl]),
                        super_group_scale=np.asarray(res.params.super_scale[sl]),
                        super_group_zero=np.asarray(res.params.super_zero[sl]),
                        group_scale_quant=np.asarray(res.params.scale_q[sl]),
                        group_zero_quant=np.asarray(res.params.zero_q[sl]),
                    ),
                )
        return out

    # attention linears (GQA q/k/v/o or MLA q_a/q_b/kv_a/kv_b/o), grouped
    # by shared capture Hessian
    attn_caps: Dict[str, list] = {}
    for key, cap, name_tpl in _layer_specs(layer):
        if key.startswith(("gate_", "up_", "down_")):
            continue  # MLP handled per-expert / shared-expert below
        name = name_tpl.format(i=li)
        if pattern.search(name):
            attn_caps.setdefault(cap, []).append((key, name))
    for cap, members in attn_caps.items():
        by_qtype = {}
        for key, name in members:
            by_qtype.setdefault(qcfg.get(key, DEFAULT_BLOCK_QTYPE), []).append((key, name))
        for qtype, group in by_qtype.items():
            Ws = [layer[k] for k, _ in group]
            names = [n for _, n in group]
            outs = solve_rows(Ws, hs[cap], qtype, names, [w.dtype for w in Ws])
            for (k, _), w in zip(group, outs):
                new_layer[k] = w

    # shared expert (qwen2moe): gate/up from the router-input Hessian
    if "shared_gate" in layer and pattern.search(f"model.layers.{li}.mlp.shared_expert"):
        qt_g = qcfg.get("gate_proj", DEFAULT_BLOCK_QTYPE)
        qt_u = qcfg.get("up_proj", DEFAULT_BLOCK_QTYPE)
        qt_d = qcfg.get("down_proj", DEFAULT_BLOCK_QTYPE)
        base = f"model.layers.{li}.mlp.shared_expert"
        if qt_g == qt_u:
            g, u = solve_rows(
                [layer["shared_gate"], layer["shared_up"]], hs["moe_router"], qt_g,
                [f"{base}.gate_proj", f"{base}.up_proj"],
                [layer["shared_gate"].dtype, layer["shared_up"].dtype],
            )
        else:
            (g,) = solve_rows([layer["shared_gate"]], hs["moe_router"], qt_g,
                              [f"{base}.gate_proj"], [layer["shared_gate"].dtype])
            (u,) = solve_rows([layer["shared_up"]], hs["moe_router"], qt_u,
                              [f"{base}.up_proj"], [layer["shared_up"].dtype])
        (d,) = solve_rows([layer["shared_down"]], hs["shared_down"], qt_d,
                          [f"{base}.down_proj"], [layer["shared_down"].dtype])
        new_layer["shared_gate"], new_layer["shared_up"], new_layer["shared_down"] = g, u, d

    # per-expert solves
    E = layer["experts_gate"].shape[0]
    eg, eu, ed = layer["experts_gate"], layer["experts_up"], layer["experts_down"]
    new_g, new_u, new_d = [], [], []
    qt_g = qcfg.get("gate_proj", DEFAULT_BLOCK_QTYPE)
    qt_u = qcfg.get("up_proj", DEFAULT_BLOCK_QTYPE)
    qt_d = qcfg.get("down_proj", DEFAULT_BLOCK_QTYPE)
    for e in range(E):
        base = f"model.layers.{li}.mlp.experts.{e}"
        if not pattern.search(base):
            new_g.append(eg[e]); new_u.append(eu[e]); new_d.append(ed[e])
            continue
        H_in = moe_sums["in"][e]
        if qt_g == qt_u:
            g, u = solve_rows([eg[e], eu[e]], H_in, qt_g,
                              [f"{base}.gate_proj", f"{base}.up_proj"],
                              [eg.dtype, eu.dtype])
        else:
            (g,) = solve_rows([eg[e]], H_in, qt_g, [f"{base}.gate_proj"], [eg.dtype])
            (u,) = solve_rows([eu[e]], H_in, qt_u, [f"{base}.up_proj"], [eu.dtype])
        (d,) = solve_rows([ed[e]], moe_sums["down"][e], qt_d,
                          [f"{base}.down_proj"], [ed.dtype])
        new_g.append(g); new_u.append(u); new_d.append(d)
    new_layer["experts_gate"] = jnp.stack(new_g)
    new_layer["experts_up"] = jnp.stack(new_u)
    new_layer["experts_down"] = jnp.stack(new_d)

    layers = list(params["layers"])
    layers[li] = new_layer
    return {**params, "layers": layers}


def _quant_non_block(params, name, qtype, gptq_cfg, save_dir, verbose):
    W = llama.get_linear(params, name)
    q, p = kquant.quantize_rtn(W.astype(jnp.float32), qtype, gptq_cfg.scale_cfg)
    spec = KQUANT_SPECS[qtype]
    q = q.astype(jnp.int8 if spec.signed else jnp.uint8)
    # host numpy: non-block weights (embed/lm_head) stay off-device
    w_hat = np.asarray(kquant.dequantize(q, p, qtype)).astype(W.dtype)
    if save_dir is not None:
        artifacts.save_layer(
            save_dir, name, artifacts.LayerArtifact.from_result(qtype, q, p)
        )
    if verbose:
        print(f"[calibrate] RTN-quantized {name} to {qtype.name}")
    return llama.set_linear(params, name, w_hat)
