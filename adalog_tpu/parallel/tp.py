"""Tensor-parallel eval inside jax.shard_map — Megatron placement with the
fused Pallas attention kernels kept active.

The GSPMD path (parallel/mesh.py::tp_shardings) annotates weight shardings
and lets the compiler insert collectives — but an opaque ``pallas_call``
cannot be tp-partitioned by GSPMD, so the fused attention kernels had to be
disabled under ``--mesh-tp``. This module runs the WHOLE per-device forward
inside ``jax.shard_map`` over the 2D (dp, tp) mesh instead: every device
executes the full program — flash attention kernel included — on its local
(batch shard × parameter shard), and the only collectives are one
``lax.psum`` after each row-parallel linear (models/layers.py::qlinear,
gated by the trace-time tp_row_context).

Placement (the Megatron recipe, scaling-book §tensor-parallelism):

  qkv   column-parallel, rows pre-permuted chunk-interleaved [q|k|v] per
        device so the local (3, D/tp, I) row-group view and the local
        (B, N, 3, H/tp, hd) head reshape both hold; requires tp | heads
  fc1   column-parallel (output features sharded); requires tp | hidden
  proj / fc2  row-parallel (input features sharded; partial outputs psum'd
        over tp, bias added once on the full result)
  everything else (norms, embeddings, conv patch embed, head, per-tensor
        quantizer scales) replicated

Per-head quantizer state rides along: matmul1/matmul2 (1, H, 1, 1) scale
layouts and Swin's pre-gathered (1, H, N, N) rel-pos bias are sharded on
their head axis, so each device's kernel sees exactly its local heads. A
block whose heads (or hidden dim) the tp degree does not divide falls back
to replicated compute for that sub-block — always correct, just unsharded.

Reference parity note: the reference is single-GPU (SURVEY.md §2); this is
the beyond-parity serving path for models that exceed one chip.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, FrozenSet

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from adalog_tpu.models.layers import (
    LinearSite, MatMulSite, tp_row_context,
)


def _norm_path(path) -> str:
    """jax key path -> dotted string: '.blocks[0].attn.qkv.w' ->
    'blocks.0.attn.qkv.w'."""
    s = jax.tree_util.keystr(path)
    return s.replace("[", ".").replace("]", "").replace("'", "").lstrip(".")


def _param_site(norm: str, family: str) -> str:
    """Param-tree path -> quant-site name (strip the trailing field, map the
    Swin param layout onto its reference site names)."""
    s = re.sub(r"\.(w|b)$", "", norm)
    if family == "swin":
        s = re.sub(r"^stages\.", "layers.", s)
        s = re.sub(r"(blocks\.\d+)\.fc([12])$", r"\1.mlp.fc\2", s)
    return s


@dataclass(frozen=True)
class TPPlan:
    """Static tensor-parallel placement for one (model, qstate, tp) triple."""
    axis: str
    tp: int
    family: str
    col_sites: Dict[str, int] = field(default_factory=dict)   # name -> n_V
    row_sites: FrozenSet[str] = frozenset()
    attn_sharded: FrozenSet[str] = frozenset()                # '...attn' prefixes

    # -- params ------------------------------------------------------------
    def permute_params(self, params):
        """Chunk-interleave fused-qkv rows ([q|k|v] per device chunk) so a
        contiguous dim-0 shard decomposes as the local (3, D/tp, ·) view."""
        tp = self.tp

        def rule(path, leaf):
            norm = _norm_path(path)
            site = _param_site(norm, self.family)
            V = self.col_sites.get(site, 0)
            if V <= 1 or not norm.endswith((".w", ".b")):
                return leaf
            O = leaf.shape[0]
            R = O // V
            chunked = leaf.reshape((V, tp, R // tp) + leaf.shape[1:])
            return chunked.swapaxes(0, 1).reshape(leaf.shape)

        return jax.tree_util.tree_map_with_path(rule, params)

    def params_specs(self, params):
        axis = self.axis

        def rule(path, leaf):
            norm = _norm_path(path)
            site = _param_site(norm, self.family)
            ndim = getattr(leaf, "ndim", 0)
            if site in self.col_sites:
                if norm.endswith(".w") and ndim == 2:
                    return P(axis, *([None] * (ndim - 1)))
                if norm.endswith(".b") and ndim == 1:
                    return P(axis)
            if site in self.row_sites and norm.endswith(".w") and ndim == 2:
                return P(None, axis)
            if norm.endswith(".attn.rel_pos_bias") and ndim == 4:
                attn = _param_site(re.sub(r"\.rel_pos_bias$", "", norm),
                                   self.family)
                if attn in self.attn_sharded:
                    return P(None, axis, None, None)
            return P()

        return jax.tree_util.tree_map_with_path(rule, params)

    # -- qstate ------------------------------------------------------------
    def qstate_specs(self, qstate):
        axis = self.axis
        out = {}
        for name, site in qstate.items():
            attn_ok = isinstance(site, MatMulSite) and \
                name.rsplit(".", 1)[0] in self.attn_sharded

            def rule(path, leaf, _name=name, _attn=attn_ok):
                ks = jax.tree_util.keystr(path)
                ndim = getattr(leaf, "ndim", 0)
                if _name in self.col_sites and ".wq" in ks and ndim == 3:
                    # (V, R, 1) per-row weight scale/zp (+ AdaRound alpha
                    # (V, R, I)): rows shard with the weight's output dim
                    return P(None, axis, None)
                if _name in self.row_sites and ks.endswith("alpha") \
                        and ndim == 3:
                    return P(None, None, axis)   # (V, R, I): input dim shards
                if _attn and ndim == 4 and leaf.shape[1] >= self.tp \
                        and leaf.shape[1] % self.tp == 0:
                    return P(None, axis, None, None)   # per-head (1,H,1,1)
                return P()                             # per-tensor layouts

            out[name] = jax.tree_util.tree_map_with_path(rule, site)
        return out


def make_tp_plan(spec, qstate, tp: int, axis: str = "tp") -> TPPlan:
    """Build the placement for a model spec (family + cfg) at tp degree."""
    cfg = spec.cfg
    fam = spec.family
    blocks = []
    if fam == "vit":
        hid = int(cfg.dim * cfg.mlp_ratio)
        for i in range(cfg.depth):
            blocks.append((f"blocks.{i}", cfg.heads, hid))
    elif fam == "swin":
        for i, depth in enumerate(cfg.depths):
            hid = int(cfg.stage_dim(i) * cfg.mlp_ratio)
            for j in range(depth):
                blocks.append((f"layers.{i}.blocks.{j}", cfg.heads[i], hid))
    else:                                         # pragma: no cover
        raise ValueError(f"unknown model family {fam!r}")

    col, row, attn = {}, set(), set()
    for pre, H, hid in blocks:
        if tp > 1 and H % tp == 0:
            col[f"{pre}.attn.qkv"] = 3
            row.add(f"{pre}.attn.proj")
            attn.add(f"{pre}.attn")
        if tp > 1 and hid % tp == 0:
            col[f"{pre}.mlp.fc1"] = 1
            row.add(f"{pre}.mlp.fc2")
    # only sites that exist (and are LinearSites) participate; a raw model
    # with no qstate still shards the weights. Dropping a qkv also drops its
    # paired proj/attn entries — a half-sharded attention (replicated qkv,
    # row-sharded proj) would be shape-inconsistent.
    for nm in list(col):
        if nm in qstate and not isinstance(qstate[nm], LinearSite):
            del col[nm]                           # pragma: no cover
            if nm.endswith(".attn.qkv"):
                pre = nm[:-len(".qkv")]
                row.discard(pre + ".proj")
                attn.discard(pre)
    return TPPlan(axis=axis, tp=tp, family=fam, col_sites=col,
                  row_sites=frozenset(row), attn_sharded=frozenset(attn))


def tp_eval_fn(spec, fwd, params, qstate, mesh: Mesh, *, axis: str = "tp",
               dp_axis: str = "dp", dtype=jnp.float32):
    """Jitted quantized-eval callable over the 2D (dp, tp) mesh.

    Returns (run, plan): ``run(x)`` expects the batch to divide the dp axis
    (callers pad, see cli.py) and returns fp32 logits. The per-device body
    runs the full forward — fused Pallas attention kernels included — under
    the tp_row_context that psums row-parallel partial outputs.
    """
    from jax.sharding import NamedSharding

    plan = make_tp_plan(spec, qstate, mesh.shape[axis], axis)
    p_perm = plan.permute_params(params)
    pspecs = plan.params_specs(p_perm)
    qspecs = plan.qstate_specs(qstate)
    # place params/qstate onto the mesh ONCE at build time — otherwise every
    # predict call re-transfers the whole parameter set from the default
    # device into the shard_map layout
    p_perm = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        p_perm, pspecs)
    q_dev = {k: jax.tree_util.tree_map(
                 lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                 v, qspecs[k])
             for k, v in qstate.items()}

    def local(pp, lqs, x):
        with tp_row_context(axis, plan.row_sites):
            x = x.astype(dtype)
            pp = jax.tree_util.tree_map(lambda a: a.astype(dtype), pp)
            return fwd(spec.cfg, pp, x, lqs,
                       {"*": "quant"}).astype(jnp.float32)

    sm = jax.shard_map(local, mesh=mesh,
                       in_specs=(pspecs, qspecs, P(dp_axis)),
                       out_specs=P(dp_axis), check_vma=False)
    f = jax.jit(sm)

    def run(x):
        return f(p_perm, q_dev, x)

    return run, plan
