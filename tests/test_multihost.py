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
