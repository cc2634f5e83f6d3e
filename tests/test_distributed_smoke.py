"""Two-process jax.distributed smoke test for the multi-host path.

Validates what docs/multihost.md prescribes: each process initializes
jax.distributed against a shared coordinator, sees the GLOBAL device set,
builds the same ('data','model') mesh over it, and runs a jitted computation
whose gradient all-reduce spans both processes (GSPMD over the global mesh).
CPU-only: each worker gets 2 virtual local devices -> 4 global.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PROC_ID"]),
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    sys.path.insert(0, "/root/repo")
    from alphazero_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=2, num_model=2)   # global mesh, both hosts
    assert dict(mesh.shape) == {"data": 2, "model": 2}

    # per-process local shard of a (4, 8) global batch sharded over 'data'
    sharding = NamedSharding(mesh, P("data", None))
    local = np.full((2, 8), float(jax.process_index() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local, (4, 8))

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)            # GSPMD inserts the cross-host reduce

    m = float(global_mean(garr))
    # processes 0 and 1 contribute 1.0 and 2.0 halves -> global mean 1.5
    assert abs(m - 1.5) < 1e-6, m
    print(f"proc {jax.process_index()} ok: global mean {m}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in (0, 1):
        env = dict(env_base)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["COORD"] = f"127.0.0.1:{port}"
        env["PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out, out
