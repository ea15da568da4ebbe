"""Functional ViT / DeiT forward with named quantization sites.

Replaces timm's VisionTransformer + the reference's monkey-patched attention
(utils/wrap_net.py:19-32 vit_attn_forward): here the two attention matmuls are
first-class quant sites (``...attn.matmul1`` for q·kᵀ, ``...attn.matmul2`` for
softmax·v) rather than modules grafted onto a foreign class. Site names match
the reference module paths so checkpoints and per-site search results map 1:1:

    patch_embed.proj, blocks.{i}.attn.qkv, blocks.{i}.attn.matmul1,
    blocks.{i}.attn.matmul2, blocks.{i}.attn.proj, blocks.{i}.mlp.fc1,
    blocks.{i}.mlp.fc2, head

Attention math parity (wrap_net.py:19-32): attn = (q @ kᵀ) * head_dim**-0.5,
softmax in FP, then attn @ v — the scale multiply happens *after* the first
quantized matmul for ViT (Swin differs; see swin.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from adalog_tpu.models.layers import (
    LinearP, ConvP, LayerNormP, qlinear, qconv2d, qmatmul, layer_norm, gelu,
)


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    in_chans: int = 3

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


@struct.dataclass
class AttentionP:
    qkv: LinearP
    proj: LinearP
    # timm >=0.9 Attention carries q_norm/k_norm slots (Identity for every
    # zoo model; wrap_net.py:24 applies them in the patched forward). None
    # means identity; LayerNormP when a checkpoint carries real affines.
    q_norm: Optional[LayerNormP] = None
    k_norm: Optional[LayerNormP] = None


@struct.dataclass
class MlpP:
    fc1: LinearP
    fc2: LinearP


@struct.dataclass
class BlockP:
    norm1: LayerNormP
    attn: AttentionP
    norm2: LayerNormP
    mlp: MlpP


@struct.dataclass
class ViTParams:
    patch_proj: ConvP
    cls_token: jnp.ndarray          # (1, 1, D)
    pos_embed: jnp.ndarray          # (1, N+1, D)
    blocks: tuple                   # tuple[BlockP]
    norm: LayerNormP
    head: LinearP


def mode_of(modes, name: str) -> str:
    if modes is None:
        return "raw"
    return modes.get(name, modes.get("*", "raw"))


def site_of(qstate, name: str):
    return None if qstate is None else qstate.get(name)


def _tap(taps, name, *tensors):
    if taps is not None:
        taps[name] = tensors


def vit_attention(cfg: ViTConfig, ap: AttentionP, qstate, prefix: str, x,
                  modes, taps, *, training: bool = False, soft: bool = False):
    B, N, C = x.shape
    hd = cfg.head_dim

    nm = f"{prefix}.qkv"
    qkv = qlinear(ap.qkv, site_of(qstate, nm), x, mode=mode_of(modes, nm),
                  training=training, soft=soft, name=nm)
    _tap(taps, nm, x, qkv)
    # head count from the qkv output width, not cfg.heads: under the
    # tensor-parallel shard_map eval (parallel/tp.py) the local qkv shard
    # holds heads/tp heads in chunk-interleaved [q|k|v] row order
    H = qkv.shape[-1] // (3 * hd)
    qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    # q/k norms (wrap_net.py:24); getattr: params unpickled from pre-field
    # checkpoints lack the attribute
    qn, kn = getattr(ap, "q_norm", None), getattr(ap, "k_norm", None)
    q = q if qn is None else layer_norm(qn, q)
    k = k if kn is None else layer_norm(kn, k)

    nm = f"{prefix}.matmul1"
    kT = jnp.swapaxes(k, -2, -1)
    m1_site, m1_mode = site_of(qstate, nm), mode_of(modes, nm)
    nm2 = f"{prefix}.matmul2"
    m2_site, m2_mode = site_of(qstate, nm2), mode_of(modes, nm2)

    out = attn = None
    if taps is None and not training:
        from adalog_tpu.ops import fq_attn
        if fq_attn.supports_flash(m1_site, m2_site, m1_mode, m2_mode):
            # eval fast path: the whole quantized attention — uq(q) @ uq(kT)
            # -> scale -> softmax -> AdaLog quant -> @ uq(v) — runs in one
            # Pallas kernel; the (B, H, N, N) logits never touch HBM
            out = fq_attn.run_flash(m1_site, m2_site, q, kT, v,
                                    logit_scale=hd ** -0.5)
    if out is None:
        attn = qmatmul(m1_site, q, kT, mode=m1_mode, training=training)
        _tap(taps, nm, q, kT, attn)
        attn = attn * (hd ** -0.5)
        if taps is None and not training and m2_site is not None:
            # partial fast path: softmax + AdaLog quant + AV matmul fused
            # (the logits are still an HBM operand)
            from adalog_tpu.ops import fq_attn
            if fq_attn.supports_softmax(m2_site, m2_mode):
                out = fq_attn.run_softmax(m2_site, attn, v)
                attn = None
    if attn is not None:
        attn = jax.nn.softmax(attn, axis=-1)
        out = qmatmul(m2_site, attn, v, mode=m2_mode, training=training)
        _tap(taps, nm2, attn, v, out)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, H * hd)

    nm = f"{prefix}.proj"
    y = qlinear(ap.proj, site_of(qstate, nm), out, mode=mode_of(modes, nm),
                training=training, soft=soft, name=nm)
    _tap(taps, nm, out, y)
    return y


def vit_mlp(mp: MlpP, qstate, prefix: str, x, modes, taps, *,
            training: bool = False, soft: bool = False):
    nm = f"{prefix}.fc1"
    h = qlinear(mp.fc1, site_of(qstate, nm), x, mode=mode_of(modes, nm),
                training=training, soft=soft, name=nm)
    _tap(taps, nm, x, h)
    h = gelu(h)
    nm = f"{prefix}.fc2"
    y = qlinear(mp.fc2, site_of(qstate, nm), h, mode=mode_of(modes, nm),
                training=training, soft=soft, name=nm)
    _tap(taps, nm, h, y)
    return y


def vit_block(cfg: ViTConfig, bp: BlockP, qstate, prefix: str, x, modes, taps,
              *, training: bool = False, soft: bool = False):
    """Pre-norm transformer block; also the BRECQ reconstruction unit
    (block_recon.py:23-30 uses timm Block as a unit)."""
    x = x + vit_attention(cfg, bp.attn, qstate, f"{prefix}.attn",
                          layer_norm(bp.norm1, x), modes, taps,
                          training=training, soft=soft)
    x = x + vit_mlp(bp.mlp, qstate, f"{prefix}.mlp",
                    layer_norm(bp.norm2, x), modes, taps,
                    training=training, soft=soft)
    return x


def vit_patch_embed(cfg: ViTConfig, params: ViTParams, qstate, x, modes, taps,
                    *, training: bool = False, soft: bool = False):
    """Image (B, H, W, 3) -> tokens (B, N, D). BRECQ unit 'patch_embed'."""
    nm = "patch_embed.proj"
    y = qconv2d(params.patch_proj, site_of(qstate, nm), x,
                mode=mode_of(modes, nm), training=training, soft=soft)
    _tap(taps, nm, x, y)
    B = y.shape[0]
    return y.reshape(B, cfg.num_patches, cfg.dim)


def vit_head(cfg: ViTConfig, params: ViTParams, qstate, x, modes, taps, *,
             training: bool = False, soft: bool = False):
    """Pooled feature -> logits. BRECQ unit 'head'."""
    nm = "head"
    y = qlinear(params.head, site_of(qstate, nm), x, mode=mode_of(modes, nm),
                training=training, soft=soft)
    _tap(taps, nm, x, y)
    return y


def vit_forward(cfg: ViTConfig, params: ViTParams, x, qstate=None, modes=None,
                *, capture: bool = False, capture_blocks: bool = False,
                training: bool = False, soft: bool = False):
    """Full forward. x: (B, H, W, 3) NHWC.

    Returns logits, or (logits, taps) when capture/capture_blocks is set.
    taps[site] = (*inputs, output); taps['blocks.{i}'] = (block_in, block_out).
    """
    taps = {} if (capture or capture_blocks) else None
    site_taps = taps if capture else None

    tok = vit_patch_embed(cfg, params, qstate, x, modes, site_taps,
                          training=training, soft=soft)
    if capture_blocks:
        taps["patch_embed"] = (x, tok)
    B = tok.shape[0]
    cls = jnp.broadcast_to(params.cls_token, (B, 1, cfg.dim))
    h = jnp.concatenate([cls, tok], axis=1) + params.pos_embed

    for i, bp in enumerate(params.blocks):
        h_in = h
        h = vit_block(cfg, bp, qstate, f"blocks.{i}", h, modes, site_taps,
                      training=training, soft=soft)
        if capture_blocks:
            taps[f"blocks.{i}"] = (h_in, h)

    h = layer_norm(params.norm, h)
    pooled = h[:, 0]
    logits = vit_head(cfg, params, qstate, pooled, modes, site_taps,
                      training=training, soft=soft)
    if capture_blocks:
        taps["head"] = (pooled, logits)
    if taps is not None:
        return logits, taps
    return logits


def vit_init(cfg: ViTConfig, key) -> ViTParams:
    """Random init (trunc-normal-ish); used for tests and benchmarking when no
    pretrained checkpoint is available."""
    ks = jax.random.split(key, 8)

    def lin(k, o, i, std=0.02):
        return LinearP(w=jax.random.normal(k, (o, i), jnp.float32) * std,
                       b=jnp.zeros((o,), jnp.float32))

    D, P = cfg.dim, cfg.patch_size
    blocks = []
    bkeys = jax.random.split(ks[3], cfg.depth)
    hidden = int(D * cfg.mlp_ratio)
    for bk in bkeys:
        k1, k2, k3, k4 = jax.random.split(bk, 4)
        blocks.append(BlockP(
            norm1=LayerNormP(g=jnp.ones((D,)), b=jnp.zeros((D,)), eps=1e-6),
            attn=AttentionP(qkv=lin(k1, 3 * D, D), proj=lin(k2, D, D)),
            norm2=LayerNormP(g=jnp.ones((D,)), b=jnp.zeros((D,)), eps=1e-6),
            mlp=MlpP(fc1=lin(k3, hidden, D), fc2=lin(k4, D, hidden)),
        ))
    return ViTParams(
        patch_proj=ConvP(
            w=jax.random.normal(ks[0], (D, cfg.in_chans, P, P), jnp.float32) * 0.02,
            b=jnp.zeros((D,), jnp.float32), stride=(P, P), padding=(0, 0)),
        cls_token=jax.random.normal(ks[1], (1, 1, D), jnp.float32) * 0.02,
        pos_embed=jax.random.normal(ks[2], (1, cfg.num_patches + 1, D),
                                    jnp.float32) * 0.02,
        blocks=tuple(blocks),
        norm=LayerNormP(g=jnp.ones((D,)), b=jnp.zeros((D,)), eps=1e-6),
        head=lin(ks[4], cfg.num_classes, D),
    )
