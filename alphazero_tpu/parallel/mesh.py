"""Device mesh + sharding utilities.

The reference's complete parallelism inventory is intra-process thread
batching + manual process scale-out + Ray PBT over the filesystem (SURVEY.md
§2.5).  The TPU-native equivalents here:

- mesh ('data', 'model'): self-play lanes and training batches shard over
  'data' (the actor/learner data-parallel axis); large dense kernels may
  shard over 'model' (tensor parallelism).  XLA inserts psum/all-gather
  collectives over ICI automatically from input shardings (GSPMD) — no
  hand-written communication backend, by design.
- multi-host: the same code runs under jax.distributed with a global mesh;
  nothing here assumes single-process.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    n = num_data * num_model
    dev = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (B, ...) arrays with B sharded over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)


def spans_processes(mesh: Optional[Mesh]) -> bool:
    """True when the mesh covers devices of more than one JAX process
    (multi-host) — host transfers then need explicit replication."""
    if mesh is None:
        return False
    return len({d.process_index for d in mesh.devices.flat}) > 1


# one jitted all-gather identity per mesh: re-wrapping per call would
# retrace/recompile on every chunk of every iteration in multi-host runs
# (a single replicated out_sharding is a valid prefix pytree for any tree,
# and jit's own cache handles distinct tree structures/shapes under it)
_REPLICATE_FNS: dict = {}


def fetch_replicated(tree, mesh: Optional[Mesh]):
    """device_get that also works on cross-process sharded arrays: when the
    mesh spans processes, route through a jitted identity with replicated
    out_shardings (GSPMD inserts the all-gather over ICI/DCN) so every
    process holds the full value, then read it locally.  Single-process
    meshes take the plain device_get path."""
    if not spans_processes(mesh):
        return jax.device_get(tree)
    fn = _REPLICATE_FNS.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=replicated(mesh))
        _REPLICATE_FNS[mesh] = fn
    return jax.device_get(fn(tree))


def host_to_global(tree, mesh: Optional[Mesh]):
    """Upload host arrays as REPLICATED global arrays on the mesh.  Under
    multi-process SPMD every process must pass the same value (the Coach's
    host state is replicated by construction: same seeds, same all-gathered
    self-play data); single-process, this is a no-op passthrough — jit
    upload + in-program sharding constraints already handle placement."""
    if not spans_processes(mesh):
        return tree
    sh = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def shard_params(params, mesh: Mesh, model_parallel: bool = True):
    """Place parameters: tensor-parallel shard of large 2D kernels over
    'model' (last dim), everything else replicated."""
    model_size = mesh.shape["model"]

    def place(x):
        if (model_parallel and model_size > 1 and x.ndim >= 2
                and x.shape[-1] % model_size == 0 and x.shape[-1] >= 64):
            spec = P(*([None] * (x.ndim - 1)), "model")
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, params)
