"""MoE packer/splitter tests: stacked ffn_*_exps tensors (reference
gguf_splitter.py:148-282, pack via convert_hf_to_gguf MoE stacking)."""

import json

import numpy as np
import pytest

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.formats.ggml import GGMLQuantizationType as T
from gptq_gguf_tpu.mapper import splitter

RNG = np.random.default_rng(37)

MOE_CFG = {
    "model_type": "qwen3_moe", "architectures": ["Qwen3MoeForCausalLM"],
    "vocab_size": 128, "hidden_size": 256, "intermediate_size": 256,
    "moe_intermediate_size": 256, "num_experts": 4, "num_experts_per_tok": 2,
    "num_hidden_layers": 2, "num_attention_heads": 4, "num_key_value_heads": 2,
    "head_dim": 64, "rms_norm_eps": 1e-6, "max_position_embeddings": 256,
    "decoder_sparse_step": 1, "mlp_only_layers": [], "norm_topk_prob": True,
    "torch_dtype": "float32", "pad_token_id": 0, "tie_word_embeddings": False,
}


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("moe")
    cfg = AutoConfig.for_model(**MOE_CFG)
    torch.manual_seed(3)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    model_dir = tmp / "hf"
    m.save_pretrained(model_dir, safe_serialization=True)
    return tmp, model_dir, m


def test_moe_pack_float(moe_model):
    tmp, model_dir, m = moe_model
    out = tmp / "moe-f16.gguf"
    packer.pack_model(model_dir, tmp / "no-artifacts", out)
    r = GGUFReader(out)
    assert r.get("general.architecture") == "qwen3moe"
    assert r.get("qwen3moe.expert_count") == 4
    assert r.get("qwen3moe.expert_used_count") == 2
    assert r.get("qwen3moe.expert_feed_forward_length") == 256
    info = r.tensors["blk.0.ffn_gate_exps.weight"]
    assert info.shape == (4, 256, 256)
    assert "blk.0.ffn_gate_inp.weight" in r.tensors
    # stacked expert data matches the HF per-expert weights
    w = r.tensor_float("blk.0.ffn_gate_exps.weight")
    sd = m.state_dict()
    for e in range(4):
        ref = sd[f"model.layers.0.mlp.experts.{e}.gate_proj.weight"].numpy()
        np.testing.assert_allclose(w[e], ref.astype(np.float16).astype(np.float32))


def test_moe_pack_quantized_experts(moe_model):
    """Per-expert K-quant artifacts stack into one quantized 3-D tensor."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.ops import kquant
    from gptq_gguf_tpu.quant import artifacts

    tmp, model_dir, m = moe_model
    qdir = tmp / "layers"
    sd = m.state_dict()
    for li in range(2):
        for e in range(4):
            for proj in ("gate_proj", "up_proj", "down_proj"):
                name = f"model.layers.{li}.mlp.experts.{e}.{proj}"
                wt = sd[name + ".weight"].numpy()
                q, p = kquant.quantize_rtn(jnp.asarray(wt), T.Q4_K)
                artifacts.save_layer(
                    qdir, name,
                    artifacts.LayerArtifact.from_result(T.Q4_K, q.astype(jnp.uint8), p),
                )
    out = tmp / "moe-q4k.gguf"
    packer.pack_model(model_dir, qdir, out)
    r = GGUFReader(out)
    info = r.tensors["blk.1.ffn_down_exps.weight"]
    assert info.ggml_type == T.Q4_K
    assert info.shape == (4, 256, 256)
    # expert 2's slab dequantizes to its artifact's dequantization
    art = artifacts.load_layer(qdir, "model.layers.1.mlp.experts.2.down_proj")
    w = r.tensor_float("blk.1.ffn_down_exps.weight")
    np.testing.assert_allclose(w[2], art.dequantize(), rtol=1e-6, atol=1e-7)


def test_moe_split_roundtrip(moe_model):
    tmp, model_dir, m = moe_model
    gguf = tmp / "moe-f16.gguf"
    if not gguf.exists():
        packer.pack_model(model_dir, tmp / "no-artifacts", gguf)
    # raw split keeps the stacked tensor as one DB entry
    db1 = tmp / "db-gguf"
    splitter.split_gguf(gguf, db1)
    assert (db1 / "blk.0.ffn_gate_exps.weight").is_dir()
    # HF split fans experts out to per-expert torch tensors
    import torch

    db2 = tmp / "db-hf"
    splitter.split_hf(gguf, db2)
    d = db2 / "model.layers.0.mlp.experts.3.up_proj"
    assert d.is_dir(), sorted(p.name for p in db2.iterdir())[:10]
    t = torch.load(next(d.glob("*.pth")), weights_only=True)
    ref = m.state_dict()["model.layers.0.mlp.experts.3.up_proj.weight"].numpy()
    np.testing.assert_allclose(
        t.float().numpy(), ref.astype(np.float16).astype(np.float32), rtol=1e-3, atol=1e-3
    )
    with open(db2 / "hf_to_gguf_mapping.json") as f:
        mapping = json.load(f)
    assert mapping["model.layers.0.mlp.experts.3.up_proj.weight"] == "blk.0.ffn_up_exps.weight"


def test_gguf_to_hf_name_moe():
    assert splitter.gguf_to_hf_name("blk.3.ffn_down_exps.weight") == \
        "model.layers.3.mlp.experts.{e}.down_proj.weight"
    assert splitter.gguf_to_hf_name("blk.0.ffn_gate_inp.weight") == \
        "model.layers.0.mlp.gate.weight"


# ---------------------------------------------------------------------------
# MoE model forward + calibration (round 2: full pipeline entry for MoE)
# ---------------------------------------------------------------------------


def test_moe_forward_matches_hf(moe_model):
    """Functional JAX MoE forward must match transformers' Qwen3Moe logits."""
    import jax.numpy as jnp
    import torch

    from gptq_gguf_tpu.models import llama, loader

    tmp, model_dir, m = moe_model
    cfg = loader.load_config(model_dir)
    assert cfg.moe_num_experts == 4 and cfg.moe_top_k == 2
    params = loader.load_params(model_dir, cfg)
    assert params["layers"][0]["experts_gate"].shape == (4, 256, 256)
    assert params["layers"][0]["gate_inp"].shape == (4, 256)

    ids = RNG.integers(0, 128, size=(1, 24))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_moe_calibration_and_pack(moe_model, tmp_path):
    """GPTQ calibration walk over a MoE model: per-expert Hessians, expert
    artifacts, quantized stacked exps in the packed GGUF."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama, loader
    from gptq_gguf_tpu.quant import artifacts, calibrate

    tmp, model_dir, m = moe_model
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    calib = [RNG.integers(0, 128, size=(1, 32)) for _ in range(2)]
    qdir = tmp_path / "layers"
    qparams = calibrate.quantize_model(params, cfg, calib, save_dir=qdir)

    # expert artifacts exist and dequantize to the new weights
    art = artifacts.load_layer(qdir, "model.layers.0.mlp.experts.1.gate_proj")
    np.testing.assert_allclose(
        np.asarray(qparams["layers"][0]["experts_gate"][1]), art.dequantize(),
        rtol=1e-6, atol=1e-6,
    )
    # attention linears also quantized
    assert (qdir / "model.layers.0.self_attn.q_proj").is_dir()

    # quantized model still runs and correlates with the float model
    ids = RNG.integers(0, 128, size=(1, 16))
    lq = np.asarray(llama.forward(qparams, jnp.asarray(ids), cfg))
    lf = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    cc = np.corrcoef(lq.reshape(-1), lf.reshape(-1))[0, 1]
    assert cc > 0.95, cc

    # pack picks up the per-expert artifacts -> quantized stacked tensor
    out = tmp_path / "moe-cal.gguf"
    packer.pack_model(model_dir, qdir, out)
    r = GGUFReader(out)
    assert r.tensors["blk.0.ffn_gate_exps.weight"].ggml_type == T.Q4_K
    w = r.tensor_float("blk.0.ffn_gate_exps.weight")
    np.testing.assert_allclose(
        w[1], np.asarray(qparams["layers"][0]["experts_gate"][1]), rtol=1e-6, atol=1e-6
    )


def test_moe_serving_forward(moe_model):
    """Serving cached forward handles MoE layers (dense experts)."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama, loader
    from gptq_gguf_tpu.serving import model as qmodel

    tmp, model_dir, m = moe_model
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, 128, size=(1, 12))
    full = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    cache = qmodel.init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, -1, :], rtol=2e-3, atol=2e-3)


def test_mixtral_forward_and_pack(tmp_path):
    """Mixtral lineage: block_sparse_moe names load, forward matches HF,
    packer maps to GGUF arch 'llama' with expert tensors."""
    import jax.numpy as jnp
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptq_gguf_tpu.models import llama, loader

    cfg_d = {
        "model_type": "mixtral", "architectures": ["MixtralForCausalLM"],
        "vocab_size": 128, "hidden_size": 256, "intermediate_size": 256,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 256, "torch_dtype": "float32",
        "pad_token_id": 0, "tie_word_embeddings": False,
    }
    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(9)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp_path / "mix"
    m.save_pretrained(model_dir, safe_serialization=True)

    cfg = loader.load_config(model_dir)
    assert cfg.moe_num_experts == 4 and cfg.moe_norm_topk  # mixtral renormalizes
    params = loader.load_params(model_dir, cfg)
    assert params["layers"][0]["experts_gate"].shape == (4, 256, 256)

    ids = RNG.integers(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    out = tmp_path / "mix.gguf"
    packer.pack_model(model_dir, tmp_path / "no-artifacts", out)
    r = GGUFReader(out)
    assert r.get("general.architecture") == "llama"
    assert r.get("llama.expert_count") == 4
    assert r.tensors["blk.0.ffn_gate_exps.weight"].shape == (4, 256, 256)


def test_moe_gguf_serving_roundtrip(moe_model, tmp_path):
    """Packed qwen3moe GGUF serves: stacked experts load dense, logits match
    the float forward."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import llama, loader
    from gptq_gguf_tpu.serving import model as qmodel

    tmp, model_dir, m = moe_model
    gguf = tmp / "moe-f16.gguf"
    if not gguf.exists():
        packer.pack_model(model_dir, tmp / "no-artifacts", gguf)
    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    assert gcfg.moe_num_experts == 4 and gcfg.moe_top_k == 2
    assert qparams["layers"][0]["experts_gate"].shape == (4, 256, 256)

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    ids = RNG.integers(0, 128, size=(1, 12))
    ref = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))[:, -1, :]
    cache = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    logits, _ = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=5e-2, atol=5e-2)


def test_qwen2moe_shared_expert(tmp_path):
    """qwen2moe adds a shared expert with a sigmoid gate; forward must match
    HF and calibration must quantize the shared projections too."""
    import jax.numpy as jnp
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptq_gguf_tpu.models import llama, loader
    from gptq_gguf_tpu.quant import artifacts, calibrate

    cfg_d = {
        "model_type": "qwen2_moe", "architectures": ["Qwen2MoeForCausalLM"],
        "vocab_size": 128, "hidden_size": 256, "intermediate_size": 256,
        "moe_intermediate_size": 256, "shared_expert_intermediate_size": 256,
        "num_experts": 4, "num_experts_per_tok": 2, "norm_topk_prob": False,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 256, "decoder_sparse_step": 1,
        "mlp_only_layers": [], "torch_dtype": "float32", "pad_token_id": 0,
        "tie_word_embeddings": False,
    }
    hf_cfg = AutoConfig.for_model(**cfg_d)
    torch.manual_seed(21)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp_path / "q2moe"
    m.save_pretrained(model_dir, safe_serialization=True)

    cfg = loader.load_config(model_dir)
    assert not cfg.moe_norm_topk
    params = loader.load_params(model_dir, cfg)
    l0 = params["layers"][0]
    assert "shared_gate" in l0 and "shared_gate_inp" in l0

    ids = RNG.integers(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = m(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    calib = [RNG.integers(0, 128, size=(1, 24)) for _ in range(2)]
    qdir = tmp_path / "layers"
    calibrate.quantize_model(params, cfg, calib, save_dir=qdir)
    assert (qdir / "model.layers.0.mlp.shared_expert.gate_proj").is_dir()
    assert (qdir / "model.layers.0.mlp.shared_expert.down_proj").is_dir()


def test_quantized_expert_serving(moe_model):
    """A K-quant MoE GGUF serves with experts kept packed
    (StackedQuantLinearV2): logits match the dense-dequantized float model,
    and the decode (gathered) and prefill (scanned) expert paths agree."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.ops import qmatmul
    from gptq_gguf_tpu.serving import model as qmodel

    tmp, model_dir, m = moe_model
    gguf = tmp / "moe-q4k.gguf"
    assert gguf.exists(), "test_moe_pack_quantized_experts builds this first"
    qparams, gcfg = qmodel.load_gguf_for_serving(gguf, dtype=jnp.float32)
    eg = qparams["layers"][0]["experts_gate"]
    assert isinstance(eg, qmatmul.StackedQuantLinearV2)
    assert eg.n_experts == 4 and eg.d_out == 256 and eg.d_in == 256

    # reference: dequantize every expert and serve through the dense path
    r = GGUFReader(gguf)
    dense = {"layers": []}
    for k, v in qparams.items():
        if k != "layers":
            dense[k] = v
    for li, layer in enumerate(qparams["layers"]):
        dl = dict(layer)
        for key in ("experts_gate", "experts_up", "experts_down"):
            name = {"experts_gate": "ffn_gate_exps", "experts_up": "ffn_up_exps",
                    "experts_down": "ffn_down_exps"}[key]
            dl[key] = jnp.asarray(r.tensor_float(f"blk.{li}.{name}.weight"))
        dense["layers"].append(dl)

    # per-expert exactness: stacked slab 1 dequantizes to the GGUF bytes
    w1 = np.asarray(
        qmatmul._wt_v2_fields(
            *(np.asarray(f[1]) for f in (eg.qs, eg.d_sg, eg.dmin_sg, eg.sc_q, eg.mn_q)),
            gs=eg.group_size, per_byte=eg.per_byte, shift=eg.shift, d_rep=eg.d_rep,
        )
    ).T
    np.testing.assert_allclose(
        w1, np.asarray(dense["layers"][0]["experts_gate"][1]), rtol=1e-6, atol=1e-7
    )

    # prefill (12 tokens > E: scanned path) and decode (1 token: gathered)
    ids = RNG.integers(0, 128, size=(1, 12))
    cache_q = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    cache_d = qmodel.init_cache(gcfg, 1, 16, dtype=jnp.float32)
    lq, cache_q = qmodel.forward_cached(qparams, gcfg, jnp.asarray(ids), cache_q)
    ld, cache_d = qmodel.forward_cached(dense, gcfg, jnp.asarray(ids), cache_d)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld), rtol=2e-3, atol=2e-3)
    step = jnp.asarray(RNG.integers(0, 128, size=(1, 1)))
    lq1, _ = qmodel.forward_cached(qparams, gcfg, step, cache_q)
    ld1, _ = qmodel.forward_cached(dense, gcfg, step, cache_d)
    np.testing.assert_allclose(np.asarray(lq1), np.asarray(ld1), rtol=2e-3, atol=2e-3)

    # gather path == scan path on identical inputs (same layer, same h)
    h = jnp.asarray(RNG.normal(size=(1, 1, 256)).astype(np.float32))
    layer = qparams["layers"][0]
    out_g = qmodel._moe_q_ffn(h, layer, gcfg)              # T*k=2 < E=4: gather
    out_s = qmodel._moe_q_ffn(jnp.tile(h, (1, 4, 1)), layer, gcfg)[:, :1]
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_s), rtol=1e-4, atol=1e-5
    )


def test_quantize_params_for_serving_moe(moe_model):
    """HF-artifacts serving path stacks per-expert artifacts into packed
    expert weights; logits track the float model."""
    import jax.numpy as jnp

    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.ops import qmatmul
    from gptq_gguf_tpu.serving import model as qmodel

    tmp, model_dir, m = moe_model
    qdir = tmp / "layers"  # RTN expert artifacts from the pack test
    assert qdir.is_dir()
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    qparams = qmodel.quantize_params_for_serving(params, cfg, qdir)
    eg = qparams["layers"][0]["experts_gate"]
    assert isinstance(eg, qmatmul.StackedQuantLinearV2) and eg.n_experts == 4

    ids = RNG.integers(0, 128, size=(1, 12))
    cache_q = qmodel.init_cache(cfg, 1, 16, dtype=jnp.float32)
    cache_f = qmodel.init_cache(cfg, 1, 16, dtype=jnp.float32)
    lq, _ = qmodel.forward_cached(qparams, cfg, jnp.asarray(ids), cache_q)
    lf, _ = qmodel.forward_cached(params, cfg, jnp.asarray(ids), cache_f)
    cc = np.corrcoef(np.asarray(lq).reshape(-1), np.asarray(lf).reshape(-1))[0, 1]
    assert cc > 0.99, cc
