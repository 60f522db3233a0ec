"""Device mesh construction and sharding rules.

The reference is single-device (SURVEY.md §2.4); the TPU framework's
distributed story is batch data-parallelism under jit over a ("data",) mesh —
XLA inserts the psum gradient all-reduce over ICI. Parameters are replicated
by default; an optional "fsdp" mode shards large parameter leaves over the
data axis (fully-sharded data parallel) to stretch HBM for bigger models.
The same jitted train step runs unchanged on 1 chip or a full slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, mode: str = "replicated"):
    """A pytree of NamedShardings for the parameters.

    mode="replicated": every leaf replicated (pure DP).
    mode="fsdp": leaves with a dimension divisible by the mesh size get that
    (largest eligible) dimension sharded over the data axis; XLA all-gathers
    them at use and reduce-scatters gradients.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    rep = NamedSharding(mesh, P())

    def shard_leaf(leaf):
        if mode != "fsdp" or leaf.ndim == 0 or leaf.size < 2**16:
            return rep
        # pick the largest dimension divisible by the mesh size
        dims = sorted(
            range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
        )
        for d in dims:
            if leaf.shape[d] % n == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree.map(shard_leaf, params)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if isinstance(x, jax.Array):
            # already on device (e.g. data_device.DeviceBatchLoader):
            # reshard instead of passing through — device_put with the target
            # sharding is a no-op when already correctly placed, and on a
            # multi-device mesh it fixes a single-device-resident batch that
            # would otherwise flow in unsharded
            return jax.device_put(x, sh if x.ndim else rep)
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, sh)

    return {k: put(v) for k, v in batch.items() if k not in ("indices", "n_real")}
