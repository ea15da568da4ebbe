"""Functional Swin Transformer (v1) forward with named quantization sites.

Mirrors timm 0.9.2 swin_transformer semantics (the zoo the reference wraps,
README.md:20) in NHWC layout — already TPU-native, no layout surgery needed:

  patch_embed (conv k4 s4 + LayerNorm) -> 4 stages; stage i>0 starts with
  PatchMerging (2x2 concat -> norm -> reduction Linear 4C->2C, bias-free);
  blocks alternate shift 0 / window//2 (shift disabled when resolution ==
  window); window attention adds a relative-position bias after the first
  quantized matmul and the shifted-window mask before softmax
  (reference utils/wrap_net.py:35-52 swin_attn_forward).

Unlike ViT, q is multiplied by head_dim**-0.5 *before* the first quantized
matmul (wrap_net.py:41-42) — this changes matmul1's input ranges and is
preserved exactly.

Site names match reference module paths (layers.{i}.blocks.{j}.attn.qkv, ...,
layers.{i}.downsample.reduction, head.fc) so search results and checkpoints
map 1:1. Shift masks and relative-position-index gathers are precomputed as
static constants — no dynamic control flow under jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from adalog_tpu.models.layers import (
    LinearP, ConvP, LayerNormP, qlinear, qconv2d, qmatmul, layer_norm, gelu,
)
from adalog_tpu.models.vit import mode_of, site_of, _tap


@dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    in_chans: int = 3

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)

    def stage_res(self, i: int) -> int:
        return self.img_size // self.patch_size // (2 ** i)

    def stage_window_shift(self, i: int, j: int) -> Tuple[int, int]:
        """(window, shift) for block j of stage i; shift disabled when the
        resolution does not exceed the window (timm _calc_window_shift)."""
        res = self.stage_res(i)
        ws = min(self.window, res)
        shift = 0 if res <= ws else (0 if j % 2 == 0 else ws // 2)
        return ws, shift


@struct.dataclass
class WindowAttentionP:
    qkv: LinearP
    proj: LinearP
    rel_pos_bias: jnp.ndarray       # (1, heads, N, N) — pre-gathered from the table


@struct.dataclass
class SwinBlockP:
    norm1: LayerNormP
    attn: WindowAttentionP
    norm2: LayerNormP
    fc1: LinearP
    fc2: LinearP


@struct.dataclass
class PatchMergingP:
    norm: LayerNormP
    reduction: LinearP              # (2C, 4C), bias-free until reparam adds one


@struct.dataclass
class SwinStageP:
    downsample: Optional[PatchMergingP]
    blocks: tuple


@struct.dataclass
class SwinParams:
    patch_proj: ConvP
    patch_norm: LayerNormP
    stages: tuple
    norm: LayerNormP
    head: LinearP


# ---------------------------------------------------------------------------
# Static geometry helpers (numpy, evaluated at trace time)
# ---------------------------------------------------------------------------

def relative_position_index(ws: int) -> np.ndarray:
    """Standard Swin relative-position index, (ws*ws, ws*ws) int array."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]        # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                               # (N, N)


def gather_rel_pos_bias(table: np.ndarray, ws: int) -> np.ndarray:
    """table ((2ws-1)^2, heads) -> (1, heads, N, N), pre-gathered constant."""
    idx = relative_position_index(ws)
    bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, -1)
    return bias.transpose(2, 0, 1)[None]


def ungather_rel_pos_bias(bias: np.ndarray, ws: int) -> np.ndarray:
    """Inverse of gather_rel_pos_bias: (1, H, N, N) -> ((2ws-1)^2, H).

    Every relative offset occurs for at least one (i, j) pair, so scattering
    the gathered bias back through the index recovers the full table exactly.
    """
    idx = relative_position_index(ws).reshape(-1)          # (N*N,)
    H = bias.shape[1]
    flat = np.asarray(bias)[0].reshape(H, -1)              # (H, N*N)
    table = np.zeros(((2 * ws - 1) ** 2, H), np.float32)
    table[idx] = flat.T                                    # later dups identical
    return table


def shift_attn_mask(res: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (-100 / 0) for shifted windows."""
    img = np.zeros((res, res), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(res // ws, ws, res // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)                   # (nW, N)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B * nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(x, ws: int, H: int, W: int):
    """(B * nW, ws*ws, C) -> (B, H, W, C)."""
    C = x.shape[-1]
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def swin_window_attention(ap: WindowAttentionP, qstate, prefix: str, x, heads,
                          mask, modes, taps, *, training=False, soft=False):
    """x: (B_, N, C) windows; mask: None or (nW, N, N) static constant."""
    B_, N, C = x.shape
    hd = C // heads

    nm = f"{prefix}.qkv"
    qkv = qlinear(ap.qkv, site_of(qstate, nm), x, mode=mode_of(modes, nm),
                  training=training, soft=soft, name=nm)
    _tap(taps, nm, x, qkv)
    # local head count from the qkv output width (see vit.py): under the
    # tensor-parallel shard_map eval this is heads/tp, and ap.rel_pos_bias
    # arrives sliced to the same local heads
    heads = qkv.shape[-1] // (3 * hd)
    qkv = qkv.reshape(B_, N, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd ** -0.5)

    nm = f"{prefix}.matmul1"
    kT = jnp.swapaxes(k, -2, -1)
    m1_site, m1_mode = site_of(qstate, nm), mode_of(modes, nm)
    nm2 = f"{prefix}.matmul2"
    m2_site, m2_mode = site_of(qstate, nm2), mode_of(modes, nm2)

    out = attn = None
    if taps is None and not training:
        from adalog_tpu.ops import fq_attn
        if fq_attn.supports_flash(m1_site, m2_site, m1_mode, m2_mode):
            # eval fast path (see vit.py): whole quantized window attention
            # in one Pallas kernel; rel-pos bias (+ shifted-window mask)
            # folds into a (P, N, N) additive logit bias with broadcast
            # period P over the flattened (B, nW, heads) slices
            bias = jnp.broadcast_to(ap.rel_pos_bias,
                                    (1, heads, N, N))[0]       # (heads, N, N)
            if mask is not None:
                nW = mask.shape[0]
                bias = (bias[None] + mask[:, None]).reshape(-1, N, N)
            out = fq_attn.run_flash(m1_site, m2_site, q, kT, v,
                                    logit_scale=1.0, bias=bias)
    if out is None:
        attn = qmatmul(m1_site, q, kT, mode=m1_mode, training=training)
        _tap(taps, nm, q, kT, attn)
        attn = attn + ap.rel_pos_bias
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(-1, nW, heads, N, N) + mask[None, :, None]
            attn = attn.reshape(-1, heads, N, N)
        if taps is None and not training and m2_site is not None:
            # partial fast path: softmax + AdaLog quant + AV matmul fused —
            # logits (already carrying bias and mask) remain an HBM operand
            from adalog_tpu.ops import fq_attn
            if fq_attn.supports_softmax(m2_site, m2_mode):
                out = fq_attn.run_softmax(m2_site, attn, v)
                attn = None
    if attn is not None:
        attn = jax.nn.softmax(attn, axis=-1)
        out = qmatmul(m2_site, attn, v, mode=m2_mode, training=training)
        _tap(taps, nm2, attn, v, out)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, heads * hd)

    nm = f"{prefix}.proj"
    y = qlinear(ap.proj, site_of(qstate, nm), out, mode=mode_of(modes, nm),
                training=training, soft=soft, name=nm)
    _tap(taps, nm, out, y)
    return y


def swin_block(cfg: SwinConfig, bp: SwinBlockP, qstate, prefix: str,
               stage: int, blk: int, x, modes, taps, *,
               training=False, soft=False):
    """x: (B, H, W, C). BRECQ unit (SwinTransformerBlock, block_recon.py:27)."""
    B, H, W, C = x.shape
    ws, shift = cfg.stage_window_shift(stage, blk)
    heads = cfg.heads[stage]

    shortcut = x
    h = layer_norm(bp.norm1, x)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    win = window_partition(h, ws)
    mask = (jnp.asarray(shift_attn_mask(H, ws, shift)) if shift else None)
    win = swin_window_attention(bp.attn, qstate, f"{prefix}.attn", win, heads,
                                mask, modes, taps, training=training, soft=soft)
    h = window_reverse(win, ws, H, W)
    if shift:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h

    h = layer_norm(bp.norm2, x)
    nm = f"{prefix}.mlp.fc1"
    m = qlinear(bp.fc1, site_of(qstate, nm), h, mode=mode_of(modes, nm),
                training=training, soft=soft, name=nm)
    _tap(taps, nm, h, m)
    m = gelu(m)
    nm = f"{prefix}.mlp.fc2"
    m2 = qlinear(bp.fc2, site_of(qstate, nm), m, mode=mode_of(modes, nm),
                 training=training, soft=soft, name=nm)
    _tap(taps, nm, m, m2)
    return x + m2


def patch_merging(pm: PatchMergingP, qstate, prefix: str, x, modes, taps, *,
                  training=False, soft=False):
    """(B, H, W, C) -> (B, H/2, W/2, 2C). BRECQ unit (PatchMerging).

    2x2 neighbor concat order matches timm 0.9.2:
    channel blocks [x(0,0), x(1,0), x(0,1), x(1,1)] by (row, col) offsets.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 4, 2, 5)                # (B, H2, W2, sw, sh, C)
    x = x.reshape(B, H // 2, W // 2, 4 * C)
    x = layer_norm(pm.norm, x)
    nm = f"{prefix}.reduction"
    y = qlinear(pm.reduction, site_of(qstate, nm), x, mode=mode_of(modes, nm),
                training=training, soft=soft)
    _tap(taps, nm, x, y)
    return y


def swin_patch_embed(cfg: SwinConfig, params: SwinParams, qstate, x, modes,
                     taps, *, training=False, soft=False):
    """Image (B, H, W, 3) -> (B, H/4, W/4, C). BRECQ unit 'patch_embed'."""
    nm = "patch_embed.proj"
    y = qconv2d(params.patch_proj, site_of(qstate, nm), x,
                mode=mode_of(modes, nm), training=training, soft=soft)
    _tap(taps, nm, x, y)
    return layer_norm(params.patch_norm, y)


def swin_head(params: SwinParams, qstate, x, modes, taps, *,
              training=False, soft=False):
    """Post-norm NHWC feature -> logits (ClassifierHead: avg-pool + fc).
    BRECQ unit 'head'."""
    pooled = jnp.mean(x, axis=(1, 2))
    nm = "head.fc"
    y = qlinear(params.head, site_of(qstate, nm), pooled,
                mode=mode_of(modes, nm), training=training, soft=soft)
    _tap(taps, nm, pooled, y)
    return y


def swin_forward(cfg: SwinConfig, params: SwinParams, x, qstate=None,
                 modes=None, *, capture: bool = False,
                 capture_blocks: bool = False, training: bool = False,
                 soft: bool = False):
    taps = {} if (capture or capture_blocks) else None
    site_taps = taps if capture else None

    h = swin_patch_embed(cfg, params, qstate, x, modes, site_taps,
                         training=training, soft=soft)
    if capture_blocks:
        taps["patch_embed"] = (x, h)

    for i, sp in enumerate(params.stages):
        if sp.downsample is not None:
            h_in = h
            h = patch_merging(sp.downsample, qstate, f"layers.{i}.downsample",
                              h, modes, site_taps, training=training, soft=soft)
            if capture_blocks:
                taps[f"layers.{i}.downsample"] = (h_in, h)
        for j, bp in enumerate(sp.blocks):
            h_in = h
            h = swin_block(cfg, bp, qstate, f"layers.{i}.blocks.{j}", i, j, h,
                           modes, site_taps, training=training, soft=soft)
            if capture_blocks:
                taps[f"layers.{i}.blocks.{j}"] = (h_in, h)

    h = layer_norm(params.norm, h)
    logits = swin_head(params, qstate, h, modes, site_taps,
                       training=training, soft=soft)
    if capture_blocks:
        taps["head"] = (h, logits)
    if taps is not None:
        return logits, taps
    return logits


def swin_init(cfg: SwinConfig, key) -> SwinParams:
    """Random init for tests/benchmarks."""
    def lin(k, o, i, bias=True, std=0.02):
        return LinearP(w=jax.random.normal(k, (o, i), jnp.float32) * std,
                       b=jnp.zeros((o,), jnp.float32) if bias else None)

    def ln(d):
        return LayerNormP(g=jnp.ones((d,)), b=jnp.zeros((d,)))

    keys = jax.random.split(key, 2 + len(cfg.depths))
    stages = []
    for i, depth in enumerate(cfg.depths):
        D = cfg.stage_dim(i)
        ws = min(cfg.window, cfg.stage_res(i))
        bkeys = jax.random.split(keys[2 + i], depth * 5 + 1)
        down = None
        if i > 0:
            down = PatchMergingP(
                norm=ln(4 * cfg.stage_dim(i - 1)),
                reduction=lin(bkeys[-1], D, 4 * cfg.stage_dim(i - 1), bias=False))
        blocks = []
        hidden = int(D * cfg.mlp_ratio)
        for j in range(depth):
            k1, k2, k3, k4, k5 = bkeys[j * 5:j * 5 + 5]
            table = jax.random.normal(
                k5, ((2 * ws - 1) ** 2, cfg.heads[i]), jnp.float32) * 0.02
            blocks.append(SwinBlockP(
                norm1=ln(D),
                attn=WindowAttentionP(
                    qkv=lin(k1, 3 * D, D), proj=lin(k2, D, D),
                    rel_pos_bias=jnp.asarray(
                        gather_rel_pos_bias(np.asarray(table), ws))),
                norm2=ln(D),
                fc1=lin(k3, hidden, D), fc2=lin(k4, D, hidden),
            ))
        stages.append(SwinStageP(downsample=down, blocks=tuple(blocks)))

    D0 = cfg.embed_dim
    num_feat = cfg.stage_dim(len(cfg.depths) - 1)
    return SwinParams(
        patch_proj=ConvP(
            w=jax.random.normal(keys[0], (D0, cfg.in_chans, cfg.patch_size,
                                          cfg.patch_size), jnp.float32) * 0.02,
            b=jnp.zeros((D0,), jnp.float32),
            stride=(cfg.patch_size, cfg.patch_size), padding=(0, 0)),
        patch_norm=ln(D0),
        stages=tuple(stages),
        norm=ln(num_feat),
        head=lin(keys[1], cfg.num_classes, num_feat),
    )
