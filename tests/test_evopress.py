"""EvoPress search tests on a tiny model + 3-level database."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.evals import ppl as ppl_mod
from gptq_gguf_tpu.formats.ggml import NOMINAL_BITS
from gptq_gguf_tpu.models import llama, loader
from gptq_gguf_tpu.quant import calibrate
from gptq_gguf_tpu.search import evopress

RNG = np.random.default_rng(12)


@pytest.fixture(scope="module")
def search_setup(tmp_path_factory):
    import torch
    from tests.test_model import make_tiny_hf_model

    tmp = tmp_path_factory.mktemp("evo")
    model_dir, _ = make_tiny_hf_model(tmp, seed=9)
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    calib = [RNG.integers(0, cfg.vocab_size, size=(1, 64)) for _ in range(8)]

    db = tmp / "db"
    for qt in ("Q2_K", "Q4_K", "Q6_K"):
        qparams = calibrate.quantize_model(
            params, cfg, calib[:4],
            quant_config={k: qt for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                                          "gate_proj", "up_proj", "down_proj")},
        )
        bits = NOMINAL_BITS[qt]
        prefix = str(bits) if bits != int(bits) else str(int(bits))
        for name in llama.linear_layer_names(cfg):
            w = np.asarray(llama.get_linear(qparams, name))
            d = db / name
            d.mkdir(parents=True, exist_ok=True)
            torch.save(torch.from_numpy(w).half(), d / f"{prefix}-{qt}.pth")
    return cfg, params, calib, db


def test_scan_and_grouping(search_setup):
    cfg, params, calib, db = search_setup
    avail = evopress.scan_available_bitwidths(db)
    assert len(avail) == 7 * cfg.num_hidden_layers
    bws = [bw for bw, _ in avail["model.layers.0.self_attn.q_proj"]]
    assert bws == sorted(bws) and len(bws) == 3

    model = evopress.SearchModel(params, cfg, db)
    names = sorted(avail, key=evopress.layer_order_fn)
    g_name = evopress.group_layers(names, "name", model.numel)
    assert len(g_name) == 7  # one group per proj type
    g_size = evopress.group_layers(names, "size", model.numel)
    sizes = {model.numel(n) for n in names}
    assert len(g_size) == len(sizes)
    g_none = evopress.group_layers(names, "none", model.numel)
    assert len(g_none) == 1 and len(g_none[0]) == len(names)


def test_budget_accounting(search_setup):
    cfg, params, calib, db = search_setup
    avail = evopress.scan_available_bitwidths(db)
    model = evopress.SearchModel(params, cfg, db)
    names = sorted(avail, key=evopress.layer_order_fn)
    groups = evopress.group_layers(names, "name", model.numel)
    state = [[4.5] * len(g) for g in groups]
    total = evopress.calculate_total_bits(state, groups, model.numel)
    assert total == sum(model.numel(n) * 4.5 for n in names)
    # decrease from 4.5 -> 2.5625
    nb = evopress.get_next_bitwidth(state, total, groups, avail, model.numel, 0, 0, "decrease")
    assert nb == NOMINAL_BITS["Q2_K"]
    # increase blocked when at budget
    nb = evopress.get_next_bitwidth(state, total, groups, avail, model.numel, 0, 0, "increase")
    assert nb is None
    # increase allowed with slack
    nb = evopress.get_next_bitwidth(state, total * 2, groups, avail, model.numel, 0, 0, "increase")
    assert nb == NOMINAL_BITS["Q6_K"]


def test_load_layers_swaps_weights(search_setup):
    cfg, params, calib, db = search_setup
    avail = evopress.scan_available_bitwidths(db)
    model = evopress.SearchModel(params, cfg, db)
    names = sorted(avail, key=evopress.layer_order_fn)
    groups = evopress.group_layers(names, "name", model.numel)
    s45 = [[4.5] * len(g) for g in groups]
    model.load_layers(groups, s45, avail)
    w45 = np.asarray(llama.get_linear(model.params, names[0]))
    s2 = [[NOMINAL_BITS["Q2_K"]] * len(g) for g in groups]
    model.load_layers(groups, s2, avail)
    w2 = np.asarray(llama.get_linear(model.params, names[0]))
    assert np.abs(w45 - w2).max() > 0
    # unchanged bitwidths are not reloaded (state tracking)
    model.load_layers(groups, s2, avail)
    assert model.state == s2


def test_search_end_to_end(search_setup, tmp_path):
    cfg, params, calib, db = search_setup
    model = evopress.SearchModel(params, cfg, db)
    ecfg = evopress.EvoPressConfig(
        target_bitwidth=4.0,
        generations=2,
        offspring=6,
        survivors_per_selection=(2, 1),
        tokens_per_selection=(128, 256),
        group_rule="name",
        seed=0,
        checkpoint_path=str(tmp_path / "ckpt.json"),
    )
    logs = []
    best, groups, avail = evopress.evo_press_search(
        model, calib, ecfg, log=logs.append
    )
    numel_fn = model.numel
    target_bits = sum(int(numel_fn(n) * 4.0) for g in groups for n in g)
    assert evopress.calculate_total_bits(best, groups, numel_fn) <= target_bits
    assert (tmp_path / "ckpt.json").exists()

    out = tmp_path / "evo-ppl-configuration-4.0.txt"
    evopress.write_config(out, groups, best, avail)
    parsed = evopress.parse_state_config(out)
    assert len(parsed) == sum(len(g) for g in groups)
    # every line has a real filename
    for name, (bw, fn) in parsed.items():
        assert fn and fn.endswith(".pth")
        assert (db / name / fn).exists()


def test_sparse_kl_fitness(search_setup):
    cfg, params, calib, db = search_setup
    model = evopress.SearchModel(params, cfg, db)
    tl = evopress.compute_target_logits(model, calib[:2], "sparse_kl", topk=8)
    val = ppl_mod.compute_sparse_kl_div(model.params, model.cfg, calib[:2], tl)
    assert abs(val) < 1e-5  # same model => ~0 KL (float noise can be <0)
    kl_full = evopress.compute_target_logits(model, calib[:2], "kl")
    val2 = ppl_mod.compute_kl_div(model.params, model.cfg, calib[:2], kl_full)
    assert abs(val2) < 1e-5


def test_parallel_candidate_selection_matches_sequential(search_setup):
    """Device-parallel candidate fitness (dp-sharded candidate axis) must
    pick the same survivors as the sequential loop (SURVEY §7.13)."""
    import random

    import jax

    from gptq_gguf_tpu.parallel import mesh as mesh_mod

    cfg, params, calib, db = search_setup
    model = evopress.SearchModel(dict(params), cfg, db)
    available = evopress.scan_available_bitwidths(db)
    names = sorted(available.keys(), key=evopress.layer_order_fn)
    groups = evopress.group_layers(names, "name", model.numel)
    rng = np.random.default_rng(3)
    base = [[4.5 for _ in g] for g in groups]
    candidates = []
    for _ in range(5):
        cand = [list(g) for g in base]
        gi = rng.integers(0, len(groups))
        li = rng.integers(0, len(groups[gi]))
        opts = [bw for bw, _ in available[groups[gi][li]]]
        cand[gi][li] = float(rng.choice(opts))
        candidates.append(cand)

    random.seed(11)
    seq_model = evopress.SearchModel(dict(params), cfg, db)
    seq_best, seq_fits = evopress.selection(
        seq_model, groups, available, candidates, 2, calib, 64, "ppl"
    )
    mesh = mesh_mod.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    random.seed(11)  # same minibatch sampling
    par_best, par_fits = evopress.selection(
        model, groups, available, candidates, 2, calib, 64, "ppl", mesh=mesh
    )
    assert par_best == seq_best
    # fitness values agree up to padding/averaging arithmetic
    ref = [np.log(f) for f in seq_fits]  # sequential returns ppl = exp(nll)
    np.testing.assert_allclose(par_fits, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fitness_fn", ["kl", "sparse_kl"])
def test_parallel_kl_selection_matches_sequential(search_setup, fitness_fn):
    """Round-3 (VERDICT r2 #4): the dp-parallel candidate path must cover
    kl and sparse_kl — the published default fitness — not just ppl.
    Teacher logits are candidate-invariant and replicate across the mesh."""
    import random

    import jax

    from gptq_gguf_tpu.parallel import mesh as mesh_mod

    cfg, params, calib, db = search_setup
    model = evopress.SearchModel(dict(params), cfg, db)
    available = evopress.scan_available_bitwidths(db)
    names = sorted(available.keys(), key=evopress.layer_order_fn)
    groups = evopress.group_layers(names, "name", model.numel)
    rng = np.random.default_rng(5)
    candidates = []
    for _ in range(5):
        cand = [[4.5 for _ in g] for g in groups]
        gi = rng.integers(0, len(groups))
        li = rng.integers(0, len(groups[gi]))
        opts = [bw for bw, _ in available[groups[gi][li]]]
        cand[gi][li] = float(rng.choice(opts))
        candidates.append(cand)

    tl = evopress.compute_target_logits(model, calib, fitness_fn, topk=8)

    random.seed(13)
    seq_model = evopress.SearchModel(dict(params), cfg, db)
    seq_best, seq_fits = evopress.selection(
        seq_model, groups, available, candidates, 2, calib, 64, fitness_fn,
        target_logits=tl,
    )
    mesh = mesh_mod.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    random.seed(13)  # same minibatch sampling
    par_best, par_fits = evopress.selection(
        model, groups, available, candidates, 2, calib, 64, fitness_fn,
        target_logits=tl, mesh=mesh,
    )
    assert par_best == seq_best
    np.testing.assert_allclose(par_fits, seq_fits, rtol=1e-4, atol=1e-5)
