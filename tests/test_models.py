"""Model forward tests: shapes, quant-site taps, and a torch-oracle parity
check for the ViT forward + timm-format weight import.

The torch oracle is an independent minimal ViT written here from the published
architecture (pre-norm blocks, fused qkv, token pooling) — it produces a
timm-style state_dict which exercises the same import path real checkpoints use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.models.swin import (
    SwinConfig, swin_init, swin_forward, window_partition, window_reverse,
    shift_attn_mask, relative_position_index,
)

TINY_VIT = ViTConfig(img_size=32, patch_size=8, dim=64, depth=2, heads=2,
                     num_classes=10)
TINY_SWIN = SwinConfig(img_size=32, patch_size=4, embed_dim=16,
                       depths=(1, 2), heads=(2, 4), window=4, num_classes=10)


def test_vit_forward_shapes_and_taps(rng):
    params = vit_init(TINY_VIT, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    logits = vit_forward(TINY_VIT, params, x)
    assert logits.shape == (2, 10)

    logits2, taps = vit_forward(TINY_VIT, params, x, capture=True,
                                capture_blocks=True)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    for name in ["patch_embed.proj", "blocks.0.attn.qkv", "blocks.0.attn.matmul1",
                 "blocks.0.attn.matmul2", "blocks.0.attn.proj",
                 "blocks.1.mlp.fc1", "blocks.1.mlp.fc2", "head",
                 "patch_embed", "blocks.0", "blocks.1"]:
        assert name in taps, name
    # matmul taps carry (A, B, out)
    A, B, out = taps["blocks.0.attn.matmul1"]
    assert A.shape == (2, 2, 17, 32) and B.shape == (2, 2, 32, 17)
    assert out.shape == (2, 2, 17, 17)
    # block taps carry (in, out) with residual-stream shapes
    bin_, bout = taps["blocks.0"]
    assert bin_.shape == bout.shape == (2, 17, 64)


def test_swin_forward_shapes_and_taps(rng):
    params = swin_init(TINY_SWIN, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    logits, taps = swin_forward(TINY_SWIN, params, x, capture=True,
                                capture_blocks=True)
    assert logits.shape == (2, 10)
    for name in ["patch_embed.proj", "layers.0.blocks.0.attn.qkv",
                 "layers.1.downsample.reduction", "layers.1.blocks.1.attn.matmul2",
                 "head.fc", "layers.1.downsample", "layers.1.blocks.0"]:
        assert name in taps, name
    # stage-1 runs at half resolution, double channels
    bin_, bout = taps["layers.1.blocks.0"]
    assert bin_.shape == bout.shape == (2, 4, 4, 32)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 5)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # window content check against a naive gather
    win00 = np.asarray(x)[0, 0:4, 0:4, :].reshape(16, 5)
    np.testing.assert_array_equal(np.asarray(w)[0], win00)


def test_shift_mask_blocks_cross_region_attention():
    mask = shift_attn_mask(8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # first window (no region boundary) is fully visible
    np.testing.assert_array_equal(mask[0], np.zeros((16, 16)))
    # some cross-region pairs in the last window are masked
    assert (mask[-1] == -100.0).any()
    assert set(np.unique(mask)) <= {-100.0, 0.0}


def test_relative_position_index_properties():
    ws = 4
    idx = relative_position_index(ws)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    # symmetric pairs map to mirrored offsets: idx[i,j] determined by coord diff
    assert idx[0, 0] == idx[5, 5] == idx[15, 15]


@pytest.mark.slow
def test_vit_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    cfg = TINY_VIT

    class OracleAttn(tnn.Module):
        def __init__(s, dim, heads):
            super().__init__()
            s.heads = heads
            s.qkv = tnn.Linear(dim, dim * 3)
            s.proj = tnn.Linear(dim, dim)

        def forward(s, x):
            B, N, C = x.shape
            qkv = s.qkv(x).reshape(B, N, 3, s.heads, C // s.heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (C // s.heads) ** -0.5
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return s.proj(x)

    class OracleBlock(tnn.Module):
        def __init__(s, dim, heads):
            super().__init__()
            s.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            s.attn = OracleAttn(dim, heads)
            s.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            s.mlp = tnn.Sequential()
            s.mlp.fc1 = tnn.Linear(dim, dim * 4)
            s.mlp.fc2 = tnn.Linear(dim * 4, dim)

        def forward(s, x):
            x = x + s.attn(s.norm1(x))
            h = s.mlp.fc2(tF.gelu(s.mlp.fc1(s.norm2(x))))
            return x + h

    class OracleViT(tnn.Module):
        def __init__(s):
            super().__init__()
            D, P = cfg.dim, cfg.patch_size
            s.patch_embed = tnn.Sequential()
            s.patch_embed.proj = tnn.Conv2d(3, D, P, stride=P)
            s.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
            s.pos_embed = tnn.Parameter(
                torch.randn(1, cfg.num_patches + 1, D) * 0.02)
            s.blocks = tnn.ModuleList(
                [OracleBlock(D, cfg.heads) for _ in range(cfg.depth)])
            s.norm = tnn.LayerNorm(D, eps=1e-6)
            s.head = tnn.Linear(D, cfg.num_classes)

        def forward(s, x):
            B = x.shape[0]
            t = s.patch_embed.proj(x).flatten(2).transpose(1, 2)
            t = torch.cat([s.cls_token.expand(B, -1, -1), t], dim=1)
            t = t + s.pos_embed
            for b in s.blocks:
                t = b(t)
            t = s.norm(t)
            return s.head(t[:, 0])

    torch.manual_seed(0)
    oracle = OracleViT().eval()

    from adalog_tpu.models.load import load_vit
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = load_vit(cfg, sd)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = vit_forward(cfg, params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_vit_qk_norm_slots(rng):
    """timm q_norm/k_norm slots (wrap_net.py:24): None means identity; real
    affines are applied per-head between qkv and matmul1, matching a torch
    computation."""
    torch = pytest.importorskip("torch")
    from adalog_tpu.models.vit import vit_attention, AttentionP
    from adalog_tpu.models.layers import LinearP, LayerNormP

    D, H, N, B = 32, 2, 5, 3
    hd = D // H
    cfg = ViTConfig(img_size=16, patch_size=8, dim=D, depth=1, heads=H,
                    num_classes=10)
    wqkv = (rng.standard_normal((3 * D, D)) * 0.2).astype(np.float32)
    bqkv = (rng.standard_normal(3 * D) * 0.1).astype(np.float32)
    wproj = (rng.standard_normal((D, D)) * 0.2).astype(np.float32)
    bproj = (rng.standard_normal(D) * 0.1).astype(np.float32)
    gq = (1 + 0.1 * rng.standard_normal(hd)).astype(np.float32)
    bq = (0.1 * rng.standard_normal(hd)).astype(np.float32)
    gk = (1 + 0.1 * rng.standard_normal(hd)).astype(np.float32)
    bk = (0.1 * rng.standard_normal(hd)).astype(np.float32)
    x = rng.standard_normal((B, N, D)).astype(np.float32)

    ap = AttentionP(
        qkv=LinearP(w=jnp.asarray(wqkv), b=jnp.asarray(bqkv)),
        proj=LinearP(w=jnp.asarray(wproj), b=jnp.asarray(bproj)),
        q_norm=LayerNormP(g=jnp.asarray(gq), b=jnp.asarray(bq), eps=1e-6),
        k_norm=LayerNormP(g=jnp.asarray(gk), b=jnp.asarray(bk), eps=1e-6))
    got = np.asarray(vit_attention(cfg, ap, None, "a", jnp.asarray(x),
                                   None, None))

    with torch.no_grad():
        xt = torch.tensor(x)
        qkv = (xt @ torch.tensor(wqkv).T + torch.tensor(bqkv))
        qkv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = torch.nn.functional.layer_norm(
            q, (hd,), torch.tensor(gq), torch.tensor(bq), 1e-6)
        k = torch.nn.functional.layer_norm(
            k, (hd,), torch.tensor(gk), torch.tensor(bk), 1e-6)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, D)
        want = (out @ torch.tensor(wproj).T + torch.tensor(bproj)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # None slots remain the identity path
    ap0 = AttentionP(qkv=ap.qkv, proj=ap.proj)
    ap1 = AttentionP(qkv=ap.qkv, proj=ap.proj,
                     q_norm=None, k_norm=None)
    np.testing.assert_array_equal(
        np.asarray(vit_attention(cfg, ap0, None, "a", jnp.asarray(x), None,
                                 None)),
        np.asarray(vit_attention(cfg, ap1, None, "a", jnp.asarray(x), None,
                                 None)))
