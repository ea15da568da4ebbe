"""Import timm-format pretrained weights into our param pytrees.

The reference calls timm.create_model with a local checkpoint
(test_quant.py:181-184, ./checkpoints/vit_raw/<timm_id>.bin). We read the same
files: a torch state_dict (.bin/.pth, loaded CPU-side via torch when present)
or an .npz with identical key names, and map keys to the functional pytrees.
Relative-position-bias tables are pre-gathered into dense (1, H, N, N) biases
at import time (a static gather — done once here instead of every forward).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from adalog_tpu.models.layers import LinearP, ConvP, LayerNormP
from adalog_tpu.models.vit import (
    ViTConfig, ViTParams, AttentionP, MlpP, BlockP,
)
from adalog_tpu.models.swin import (
    SwinConfig, SwinParams, SwinBlockP, SwinStageP, WindowAttentionP,
    PatchMergingP, gather_rel_pos_bias,
)


def read_state_dict(path: str) -> dict:
    """Load {key: np.ndarray} from .pth/.bin (torch) or .npz (numpy)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # CPU-only torch is available in the image
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # deit official checkpoints nest under 'model'
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _lin(sd, prefix, bias=True) -> LinearP:
    w = jnp.asarray(sd[f"{prefix}.weight"], jnp.float32)
    b = None
    if bias and f"{prefix}.bias" in sd:
        b = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
    return LinearP(w=w, b=b)


def _ln(sd, prefix, eps=1e-5) -> LayerNormP:
    return LayerNormP(g=jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
                      b=jnp.asarray(sd[f"{prefix}.bias"], jnp.float32), eps=eps)


def load_vit(cfg: ViTConfig, sd: dict) -> ViTParams:
    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blocks.append(BlockP(
            norm1=_ln(sd, f"{p}.norm1", eps=1e-6),
            attn=AttentionP(
                qkv=_lin(sd, f"{p}.attn.qkv"),
                proj=_lin(sd, f"{p}.attn.proj"),
                # timm q_norm/k_norm slots (Identity in zoo checkpoints, so
                # absent from their state dicts; wrap_net.py:24)
                q_norm=(_ln(sd, f"{p}.attn.q_norm", eps=1e-6)
                        if f"{p}.attn.q_norm.weight" in sd else None),
                k_norm=(_ln(sd, f"{p}.attn.k_norm", eps=1e-6)
                        if f"{p}.attn.k_norm.weight" in sd else None)),
            norm2=_ln(sd, f"{p}.norm2", eps=1e-6),
            mlp=MlpP(fc1=_lin(sd, f"{p}.mlp.fc1"),
                     fc2=_lin(sd, f"{p}.mlp.fc2")),
        ))
    return ViTParams(
        patch_proj=ConvP(
            w=jnp.asarray(sd["patch_embed.proj.weight"], jnp.float32),
            b=jnp.asarray(sd["patch_embed.proj.bias"], jnp.float32),
            stride=(cfg.patch_size, cfg.patch_size), padding=(0, 0)),
        cls_token=jnp.asarray(sd["cls_token"], jnp.float32),
        pos_embed=jnp.asarray(sd["pos_embed"], jnp.float32),
        blocks=tuple(blocks),
        norm=_ln(sd, "norm", eps=1e-6),
        head=_lin(sd, "head"),
    )


def load_swin(cfg: SwinConfig, sd: dict) -> SwinParams:
    stages = []
    for i, depth in enumerate(cfg.depths):
        ws = min(cfg.window, cfg.stage_res(i))
        down = None
        if f"layers.{i}.downsample.reduction.weight" in sd:
            down = PatchMergingP(
                norm=_ln(sd, f"layers.{i}.downsample.norm"),
                reduction=_lin(sd, f"layers.{i}.downsample.reduction", bias=True))
        blocks = []
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            table = np.asarray(sd[f"{p}.attn.relative_position_bias_table"],
                               np.float32)
            blocks.append(SwinBlockP(
                norm1=_ln(sd, f"{p}.norm1"),
                attn=WindowAttentionP(
                    qkv=_lin(sd, f"{p}.attn.qkv"),
                    proj=_lin(sd, f"{p}.attn.proj"),
                    rel_pos_bias=jnp.asarray(gather_rel_pos_bias(table, ws))),
                norm2=_ln(sd, f"{p}.norm2"),
                fc1=_lin(sd, f"{p}.mlp.fc1"),
                fc2=_lin(sd, f"{p}.mlp.fc2"),
            ))
        stages.append(SwinStageP(downsample=down, blocks=tuple(blocks)))

    head_key = "head.fc" if "head.fc.weight" in sd else "head"
    return SwinParams(
        patch_proj=ConvP(
            w=jnp.asarray(sd["patch_embed.proj.weight"], jnp.float32),
            b=jnp.asarray(sd["patch_embed.proj.bias"], jnp.float32),
            stride=(cfg.patch_size, cfg.patch_size), padding=(0, 0)),
        patch_norm=_ln(sd, "patch_embed.norm"),
        stages=tuple(stages),
        norm=_ln(sd, "norm"),
        head=_lin(sd, head_key),
    )


def load_timm_state_dict(spec, path: str):
    sd = read_state_dict(path)
    if spec.family == "vit":
        return load_vit(spec.cfg, sd)
    return load_swin(spec.cfg, sd)
