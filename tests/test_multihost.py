"""True multi-process (simulated multi-host) collectives: two local
processes joined via jax.distributed over CPU devices, running the same
psum/mesh machinery multi-host calibration uses (parallel/mesh.py
init_distributed + build_mesh). The reference's analogue is
torchrun/NCCL process groups (dist_utils.py); here the coordinator is
jax.distributed and the collectives ride XLA.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import sys
    import numpy as np
    import jax

    coord, rank = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coord, num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    # per-process local batch shard -> global array (the multi-host
    # calibration data layout: each host feeds its own sequences)
    local = np.full((4, 16), float(rank + 1), np.float32)
    global_shape = (8, 16)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)), local, global_shape
    )

    # simple global reduction through pjit-style auto-sharding
    total = float(jax.jit(lambda x: x.sum())(arr))
    expect = 4 * 16 * 1.0 + 4 * 16 * 2.0
    assert abs(total - expect) < 1e-5, (total, expect)

    # explicit collective inside shard_map (the dp.py pattern)
    from jax.experimental.shard_map import shard_map

    def red(x):
        return jax.lax.psum(x.sum(), "dp")

    s = shard_map(red, mesh=mesh, in_specs=P("dp", None), out_specs=P())
    got = float(jax.jit(s)(arr))
    assert abs(got - expect) < 1e-5, (got, expect)
    print(f"RANK{rank}_OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out, out


_CALIB_WORKER = textwrap.dedent("""
    import json, pathlib, sys
    import numpy as np
    import jax

    coord, rank, model_dir, out_dir = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coord, num_processes=2, process_id=rank)

    from jax.sharding import Mesh
    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.quant import calibrate

    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))

    rng = np.random.default_rng(7)
    full = [rng.integers(0, cfg.vocab_size, (8, 32)) for _ in range(2)]
    local = [b[rank::2] for b in full]  # interleaved per-host shard (4 rows)

    save = pathlib.Path(out_dir) / "multi" if rank == 0 else None
    calibrate.quantize_model(params, cfg, local, save_dir=save, mesh=mesh)
    print(f"CALIB_RANK{rank}_OK", flush=True)
""")


def test_multihost_calibration_matches_single(tmp_path):
    """Two-process DP calibration (per-host local batch shards assembled
    into global arrays) produces the same artifacts as a single process
    seeing the full batches — the reference's per-rank sharding +
    all_reduce(AVG) recipe (quant.py:176-180), TPU-style."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    import jax
    jax.config.update("jax_platforms", "cpu")
    from gptq_gguf_tpu.models import loader
    from gptq_gguf_tpu.quant import artifacts, calibrate

    hf_cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=96, hidden_size=256,
        intermediate_size=256, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        torch_dtype="float32")
    torch.manual_seed(5)
    m = AutoModelForCausalLM.from_config(hf_cfg).eval().float()
    model_dir = tmp_path / "hf"
    m.save_pretrained(model_dir, safe_serialization=True)

    # single-process reference over the FULL batches
    cfg = loader.load_config(model_dir)
    params = loader.load_params(model_dir, cfg)
    rng = np.random.default_rng(7)
    full = [rng.integers(0, cfg.vocab_size, (8, 32)) for _ in range(2)]
    # match the workers' interleaved order: [rank0 rows; rank1 rows]
    reordered = [np.concatenate([b[0::2], b[1::2]]) for b in full]
    calibrate.quantize_model(params, cfg, reordered,
                             save_dir=tmp_path / "single")

    script = tmp_path / "calib_worker.py"
    script.write_text(_CALIB_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PYTHONPATH": os.getcwd()}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(rank),
             str(model_dir), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for rank in range(2)
    ]
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"CALIB_RANK{rank}_OK" in out

    for name in ("model.layers.0.self_attn.q_proj",
                 "model.layers.0.mlp.down_proj"):
        a = artifacts.load_layer(tmp_path / "single", name)
        b = artifacts.load_layer(tmp_path / "multi", name)
        np.testing.assert_allclose(
            np.asarray(a.dequantize()), np.asarray(b.dequantize()),
            rtol=1e-5, atol=1e-6,
        )
