"""Device mesh construction and sharding rules.

The reference is single-device (SURVEY.md §2.4); the TPU framework's
distributed story is sharding annotations under jit — XLA's GSPMD partitioner
inserts the collectives over ICI. Three composable modes:

  * batch data-parallelism over a ("data",) mesh (grad psum);
  * "fsdp": large parameter leaves sharded over the data axis (all-gather at
    use, reduce-scatter of gradients) to stretch HBM for bigger models;
  * tensor parallelism over the "model" axis of a 2D ("data", "model") mesh —
    Megatron-style column-parallel qkv/fc1 and row-parallel proj/fc2 in every
    transformer block (tp_tree_sharding). Pure annotation: the same model
    code and train step run unchanged; XLA inserts the per-block collectives.

The same jitted train step runs on 1 chip or a full slice either way.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(tp: int, devices=None) -> Mesh:
    """A ("data", "model") mesh with `tp` devices on the model axis.

    tp=1 degenerates to pure DP (shape (n, 1)); tp=n to pure tensor
    parallelism. On real slices the model axis should map to the
    fastest-ICI-adjacent devices — jax.devices() order already enumerates
    neighbors first on v5e, so a contiguous reshape keeps tp traffic on
    nearest-neighbor links.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    return Mesh(np.asarray(devices).reshape(n // tp, tp), ("data", "model"))


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


# Megatron-style rules for the transformer blocks (layers.py Attention/Mlp):
# column-parallel layers split their OUTPUT features over "model" (bias too);
# row-parallel layers split their INPUT features and keep output replicated —
# XLA inserts the block's two all-reduces (after proj and after fc2) exactly
# like the hand-written Megatron psum placement. Matched as path SUFFIXES so
# the same table applies to params and to optimizer moment trees (whose
# paths end with the same module/leaf names).
_TP_RULES: tuple[tuple[tuple[str, ...], tuple], ...] = (
    (("attn", "qkv", "kernel"), (None, "model")),
    (("attn", "qkv", "bias"), ("model",)),
    (("attn", "proj", "kernel"), ("model", None)),
    (("mlp", "fc1", "kernel"), (None, "model")),
    (("mlp", "fc1", "bias"), ("model",)),
    (("mlp", "fc2", "kernel"), ("model", None)),
)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def tp_tree_sharding(mesh: Mesh, tree, fsdp: bool = False):
    """NamedShardings for a param-shaped tree on a ("data", "model") mesh.

    Transformer-block matmul weights follow _TP_RULES (tensor parallel over
    "model"); everything else is replicated, or — with fsdp=True — sharded
    over the "data" axis on its largest eligible dimension (same policy as
    param_sharding). Apply to state.params AND to optimizer moment trees:
    AdamW's mu/nu mirror the param tree, so suffix matching gives each moment
    the same layout as its parameter and the update stays fully sharded
    (no gather of m/v at step time).

    A leaf whose matched dimension is not divisible by the model-axis size
    falls back to replicated (correct, just not TP) rather than erroring —
    ViT-B's 2304/3072/768 dims divide any power-of-two tp <= 8.
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def shard_leaf(path, leaf):
        names = _path_names(path)
        if getattr(leaf, "ndim", 0) > 0:
            for suffix, spec in _TP_RULES:
                if names[-len(suffix):] == suffix and leaf.ndim == len(spec):
                    dims_ok = all(
                        s is None or leaf.shape[d] % n_model == 0
                        for d, s in enumerate(spec)
                    )
                    if dims_ok:
                        return NamedSharding(mesh, P(*spec))
                    return rep
        if not fsdp or getattr(leaf, "ndim", 0) == 0 or leaf.size < 2**16:
            return rep
        dims = sorted(
            range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
        )
        for d in dims:
            if leaf.shape[d] % n_data == 0:
                spec = [None] * leaf.ndim
                spec[d] = "data"
                return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree_util.tree_map_with_path(shard_leaf, tree)


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
