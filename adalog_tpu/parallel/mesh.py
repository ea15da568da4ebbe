"""Device-mesh parallelism.

The reference is hard-coded single-GPU (SURVEY.md §2: no torch.distributed
anywhere; device pinning at test_quant.py:156-159). The TPU-native scaling
story replaces that with a jax.sharding Mesh:

  - eval / BRECQ training: data-parallel over the batch axis — the batch is
    sharded with P('dp'); XLA GSPMD inserts the psum for loss/grad reductions
    over ICI. (The reference's per-batch accumulations at linear.py:340-345
    are embarrassingly data-parallel.)
  - calibration scoring: the flattened token axis is sharded with P('dp');
    every similarity reduction over tokens becomes a psum. Candidates and
    weights are replicated — at eq_n=128 and ViT-size weights, replication is
    cheaper than an all-to-all re-shard per FPCS step.

All sharding is expressed with in_shardings/NamedSharding on jitted functions;
no explicit collectives are written — the compiler lays them on ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def dp(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard leading axis over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_axis(mesh: Mesh, ndim: int, dim: int, axis: str = "dp"
               ) -> NamedSharding:
    """Shard one array dimension over the mesh, replicate the rest.

    Used by layer-batched calibration: stacked site groups are (L, T, ...)
    with L vmapped sites, so the token/batch axis to shard is dim=1."""
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Pad-free placement of a batch onto the dp axis (batch must divide)."""
    return jax.device_put(x, dp(mesh, x.ndim))


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_mesh_2d(dp_size: int, tp_size: int,
                 axes=("dp", "tp")) -> Mesh:
    """2D device mesh: data-parallel × tensor-parallel."""
    devices = jax.devices()
    need = dp_size * tp_size
    if len(devices) < need:
        raise ValueError(f"make_mesh_2d({dp_size}, {tp_size}) needs {need} "
                         f"devices; only {len(devices)} available")
    return Mesh(np.array(devices[:need]).reshape(dp_size, tp_size), axes)


# Megatron-pattern tensor-parallel placement for the transformer zoo
# (scaling-book recipe: annotate shardings, let GSPMD insert the
# collectives over ICI). Column-parallel layers shard the output features
# (w dim 0, b sharded); row-parallel layers shard the input features
# (w dim 1, b replicated) and GSPMD all-reduces their partial outputs:
#   qkv / fc1 / head  -> column-parallel
#   proj / fc2        -> row-parallel
# Everything else (norms, embeddings, conv patch embed, per-channel
# quantizer scales) is replicated — tiny next to the matmul weights.
_TP_COL = (".qkv", ".fc1", ".head")
_TP_ROW = (".proj.w", ".fc2.w")


def tp_shardings(params, mesh: Mesh, axis: str = "tp"):
    """Pytree of NamedShardings implementing the placement table above.

    Family-agnostic: rules key on parameter-path suffixes shared by ViT and
    Swin (…attn.qkv.w, …mlp.fc1.w, …). A dimension that does not divide the
    tp axis falls back to replicated (e.g. a 10-class test head on tp=4).
    """
    tp = mesh.shape[axis]

    def rule(path, leaf):
        ks = jax.tree_util.keystr(path)
        ndim = getattr(leaf, "ndim", 0)
        if any(ks.endswith(t + ".w") or ks.endswith(t + ".b")
               for t in _TP_COL) and ndim >= 1 and leaf.shape[0] % tp == 0:
            return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
        if any(ks.endswith(t) for t in _TP_ROW) and ndim == 2 \
                and leaf.shape[1] % tp == 0:
            return NamedSharding(mesh, P(None, axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """Place a param pytree onto the mesh with the tp placement table."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh, axis))


def dp_shard_map(fn, mesh: Mesh, n_replicated: int, axis: str = "dp"):
    """shard_map wrapper for data-parallel eval: the LAST argument of ``fn``
    is batch-sharded on ``axis``; the first ``n_replicated`` arguments
    (params, qstate, ...) are replicated.

    GSPMD cannot partition an opaque ``pallas_call`` along a sharded batch —
    under plain jit it inserts all-gathers around every kernel call. Running
    the whole per-device forward inside shard_map sidesteps that: each chip
    executes the full program (fused Pallas attention kernels included) on
    its local batch shard, with no collectives in the forward at all.
    Varying-manual-axes checking is off because pallas_call carries no
    replication rule.
    """
    in_specs = tuple([P()] * n_replicated + [P(axis)])
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
                         check_vma=False)
