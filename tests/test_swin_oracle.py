"""Swin parity vs an independent torch oracle.

The oracle implements Swin-v1 semantics (windowed attention with relative
position bias, shifted windows with additive masks, 2x2 patch merging,
avg-pool head) directly in torch, producing a timm-0.9-style state_dict that
exercises the real weight-import path. Agreement validates the JAX forward's
window partitioning, rolls, masks and merge ordering against a second
implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adalog_tpu.models.swin import SwinConfig, swin_forward
from adalog_tpu.models.load import load_swin

CFG = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 1),
                 heads=(2, 4), window=4, num_classes=10)  # stage0 block 1 is SHIFTED


@pytest.mark.slow
def test_swin_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    ws = 4

    def rel_index(ws):
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        return rel.sum(-1)

    class OracleWindowAttn(tnn.Module):
        def __init__(s, dim, heads):
            super().__init__()
            s.heads = heads
            s.qkv = tnn.Linear(dim, 3 * dim)
            s.proj = tnn.Linear(dim, dim)
            s.relative_position_bias_table = tnn.Parameter(
                torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
            s.register_buffer("rpi", rel_index(ws))

        def forward(s, x, mask=None):
            B_, N, C = x.shape
            qkv = s.qkv(x).reshape(B_, N, 3, s.heads, C // s.heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q * (C // s.heads) ** -0.5
            attn = q @ k.transpose(-2, -1)
            bias = s.relative_position_bias_table[s.rpi.view(-1)].view(
                N, N, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(-1, nW, s.heads, N, N) + \
                    mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, s.heads, N, N)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
            return s.proj(x)

    def win_part(x):  # (B,H,W,C) -> (B*nW, ws*ws, C)
        B, H, W, C = x.shape
        x = x.view(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    def win_rev(x, H, W):
        C = x.shape[-1]
        B = x.shape[0] // ((H // ws) * (W // ws))
        x = x.view(B, H // ws, W // ws, ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)

    def attn_mask(res, shift):
        img = torch.zeros(res, res)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img[hs, wsl] = cnt
                cnt += 1
        win = win_part(img[None, :, :, None]).squeeze(-1)
        diff = win.unsqueeze(1) - win.unsqueeze(2)
        return diff.masked_fill(diff != 0, -100.0)

    class OracleBlock(tnn.Module):
        def __init__(s, dim, heads, shift):
            super().__init__()
            s.shift = shift
            s.norm1 = tnn.LayerNorm(dim)
            s.attn = OracleWindowAttn(dim, heads)
            s.norm2 = tnn.LayerNorm(dim)
            s.mlp = tnn.Sequential()
            s.mlp.fc1 = tnn.Linear(dim, 4 * dim)
            s.mlp.fc2 = tnn.Linear(4 * dim, dim)

        def forward(s, x):
            B, H, W, C = x.shape
            h = s.norm1(x)
            if s.shift:
                h = torch.roll(h, (-s.shift, -s.shift), (1, 2))
            winx = win_part(h)
            mask = attn_mask(H, s.shift) if s.shift else None
            winx = s.attn(winx, mask)
            h = win_rev(winx, H, W)
            if s.shift:
                h = torch.roll(h, (s.shift, s.shift), (1, 2))
            x = x + h
            h = s.norm2(x)
            return x + s.mlp.fc2(tF.gelu(s.mlp.fc1(h)))

    class OracleMerge(tnn.Module):
        def __init__(s, dim):
            super().__init__()
            s.norm = tnn.LayerNorm(4 * dim)
            s.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

        def forward(s, x):
            B, H, W, C = x.shape
            x = x.view(B, H // 2, 2, W // 2, 2, C)
            x = x.permute(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2, 4 * C)
            return s.reduction(s.norm(x))

    class Stage(tnn.Module):
        def __init__(s, in_dim, dim, heads, depth, res, down):
            super().__init__()
            s.downsample = OracleMerge(in_dim) if down else tnn.Identity()
            shifts = [0 if (res <= ws or j % 2 == 0) else ws // 2
                      for j in range(depth)]
            s.blocks = tnn.ModuleList(
                [OracleBlock(dim, heads, sh) for sh in shifts])

        def forward(s, x):
            x = s.downsample(x)
            for b in s.blocks:
                x = b(x)
            return x

    class OracleSwin(tnn.Module):
        def __init__(s):
            super().__init__()
            E = CFG.embed_dim
            s.patch_embed = tnn.Sequential()
            s.patch_embed.proj = tnn.Conv2d(3, E, 4, stride=4)
            s.patch_embed.norm = tnn.LayerNorm(E)
            s.layers = tnn.ModuleList([
                Stage(E, E, CFG.heads[0], CFG.depths[0], 8, False),
                Stage(E, 2 * E, CFG.heads[1], CFG.depths[1], 4, True),
            ])
            s.norm = tnn.LayerNorm(2 * E)
            s.head = tnn.Sequential()
            s.head.fc = tnn.Linear(2 * E, CFG.num_classes)

        def forward(s, x):
            x = s.patch_embed.proj(x).permute(0, 2, 3, 1)  # NHWC
            x = s.patch_embed.norm(x)
            for stage in s.layers:
                x = stage(x)
            x = s.norm(x)
            x = x.mean(dim=(1, 2))
            return s.head.fc(x)

    torch.manual_seed(0)
    oracle = OracleSwin().eval()

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()
          if not k.endswith(".rpi")}
    params = load_swin(CFG, sd)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = swin_forward(CFG, params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
