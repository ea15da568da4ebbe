"""Block-unit registry for BRECQ reconstruction.

The reference reconstructs per "block": timm PatchEmbed, ViT Block,
SwinTransformerBlock, PatchMerging, and the classifier head
(block_recon.py:23-30). Here each unit is a closure over the corresponding
functional sub-forward; units expose the quant-site names they contain so the
trainer knows which alphas / activation scales belong to the block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

from adalog_tpu.models import vit as V
from adalog_tpu.models import swin as SW
from adalog_tpu.models.zoo import ModelSpec


@dataclass
class BlockUnit:
    name: str
    site_names: Tuple[str, ...]
    # forward(params, qstate, x, modes, training, soft) -> out
    forward: Callable


def _vit_units(spec: ModelSpec) -> List[BlockUnit]:
    cfg = spec.cfg
    units = [BlockUnit(
        "patch_embed", ("patch_embed.proj",),
        lambda p, qs, x, modes, training, soft: V.vit_patch_embed(
            cfg, p, qs, x, modes, None, training=training, soft=soft))]
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        sites = tuple(f"{pre}.{s}" for s in (
            "attn.qkv", "attn.matmul1", "attn.matmul2", "attn.proj",
            "mlp.fc1", "mlp.fc2"))

        def fwd(p, qs, x, modes, training, soft, i=i, pre=pre):
            return V.vit_block(cfg, p.blocks[i], qs, pre, x, modes, None,
                               training=training, soft=soft)

        units.append(BlockUnit(pre, sites, fwd))
    units.append(BlockUnit(
        "head", ("head",),
        lambda p, qs, x, modes, training, soft: V.vit_head(
            cfg, p, qs, x, modes, None, training=training, soft=soft)))
    return units


def _swin_units(spec: ModelSpec) -> List[BlockUnit]:
    cfg = spec.cfg
    units = [BlockUnit(
        "patch_embed", ("patch_embed.proj",),
        lambda p, qs, x, modes, training, soft: SW.swin_patch_embed(
            cfg, p, qs, x, modes, None, training=training, soft=soft))]
    for i, depth in enumerate(cfg.depths):
        if i > 0:
            dname = f"layers.{i}.downsample"

            def dfwd(p, qs, x, modes, training, soft, i=i, dname=dname):
                return SW.patch_merging(p.stages[i].downsample, qs, dname, x,
                                        modes, None, training=training,
                                        soft=soft)

            units.append(BlockUnit(dname, (f"{dname}.reduction",), dfwd))
        for j in range(depth):
            pre = f"layers.{i}.blocks.{j}"
            sites = tuple(f"{pre}.{s}" for s in (
                "attn.qkv", "attn.matmul1", "attn.matmul2", "attn.proj",
                "mlp.fc1", "mlp.fc2"))

            def bfwd(p, qs, x, modes, training, soft, i=i, j=j, pre=pre):
                return SW.swin_block(cfg, p.stages[i].blocks[j], qs, pre, i, j,
                                     x, modes, None, training=training,
                                     soft=soft)

            units.append(BlockUnit(pre, sites, bfwd))
    units.append(BlockUnit(
        "head", ("head.fc",),
        lambda p, qs, x, modes, training, soft: SW.swin_head(
            p, qs, x, modes, None, training=training, soft=soft)))
    return units


def block_units(spec: ModelSpec) -> List[BlockUnit]:
    return _vit_units(spec) if spec.family == "vit" else _swin_units(spec)
