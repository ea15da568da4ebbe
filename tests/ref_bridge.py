"""Bridge to run the ACTUAL reference (torch/CUDA) code on CPU.

The reference hard-requires CUDA (linear.py:113-117, conv.py:145-149,
matmul.py:97-101 raise EnvironmentError; `.cuda()` re-uploads throughout the
search loops). On this CPU-torch image those gates are the only obstacle: the
math is stock torch ops. We stub them — `torch.cuda.is_available` -> True, a
fake `get_device_properties` with a large `total_memory` (so `parallel_eq_n`
covers all candidates for the tiny test tensors), and identity
`Tensor.cuda`/`Module.cuda` — then import the reference modules verbatim from
/root/reference with its flat-package sys.path layout.

This gives the differential tests (test_ref_differential.py) the strongest
parity evidence this environment permits: our JAX searches compared against
the UPSTREAM implementation itself, not a re-implementation of it.
"""

import contextlib
import sys
from types import SimpleNamespace

_REF_ROOT = "/root/reference"
_cache = None


@contextlib.contextmanager
def cuda_stubs():
    """Patch torch's CUDA surface to no-op CPU passthroughs for the duration.

    Restores everything on exit so the rest of the suite sees stock torch.
    """
    import torch

    saved = (torch.cuda.is_available, torch.cuda.get_device_properties,
             torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.cuda.is_available = lambda: True
    torch.cuda.get_device_properties = (
        lambda idx=0: SimpleNamespace(total_memory=64 << 30))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield torch
    finally:
        (torch.cuda.is_available, torch.cuda.get_device_properties,
         torch.Tensor.cuda, torch.nn.Module.cuda) = saved


def load_reference():
    """Import the reference quant_layers/quantizers from /root/reference.

    Import is done once per process; module-level code in the reference does
    not touch CUDA, so no stubs are needed at import time.
    """
    global _cache
    if _cache is not None:
        return _cache
    if _REF_ROOT not in sys.path:
        # append (not prepend) so repo modules always win name lookups
        sys.path.append(_REF_ROOT)
    import quant_layers.linear as ref_linear  # noqa: E402
    import quant_layers.matmul as ref_matmul  # noqa: E402
    import quant_layers.conv as ref_conv      # noqa: E402
    import quantizers.logarithm as ref_logarithm  # noqa: E402
    import quantizers.uniform as ref_uniform  # noqa: E402
    _cache = SimpleNamespace(linear=ref_linear, matmul=ref_matmul,
                             conv=ref_conv, logarithm=ref_logarithm,
                             uniform=ref_uniform)
    return _cache


# ---------------------------------------------------------------------------
# minimal fake timm: just enough for the reference's wrap_net/block_recon
# imports and isinstance checks (the real timm is not in this image)
# ---------------------------------------------------------------------------

def install_fake_timm():
    """Register a minimal `timm` in sys.modules so /root/reference's
    utils.wrap_net / utils.calibrator / utils.block_recon import cleanly.
    Returns the timm module. The classes mirror timm 0.9 structure exactly
    where the reference touches it: attribute names, state-dict keys, and
    the pre-norm block wiring."""
    import types
    import torch
    import torch.nn as nn

    if "timm" in sys.modules:
        return sys.modules["timm"]

    class Attention(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)
            self.q_norm = nn.Identity()
            self.k_norm = nn.Identity()
            self.attn_drop = nn.Identity()
            self.proj_drop = nn.Identity()

        def forward(self, x):   # replaced by wrap_net's vit_attn_forward
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(
                B, N, 3, self.num_heads, C // self.num_heads
            ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attention(dim, num_heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self, in_chans, dim, patch):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, dim, patch, stride=patch)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    import numpy as _np

    def _rel_pos_index(ws):
        coords = _np.stack(_np.meshgrid(_np.arange(ws), _np.arange(ws),
                                        indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
        rel = rel.astype(_np.int64)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        return rel.sum(-1)

    def _shift_mask(res, ws, shift):
        img = _np.zeros((res, res), _np.int32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img[hs, wsl] = cnt
                cnt += 1
        win = img.reshape(res // ws, ws, res // ws, ws).transpose(0, 2, 1, 3)
        win = win.reshape(-1, ws * ws)
        diff = win[:, None, :] - win[:, :, None]
        return _np.where(diff != 0, -100.0, 0.0).astype(_np.float32)

    class WindowAttention(nn.Module):
        """timm 0.9.2 WindowAttention surface as touched by the reference:
        qkv/proj Linears, num_heads, scale, drops, relative_position_bias
        via _get_rel_pos_bias() (wrap_net.py:35-52 swin_attn_forward)."""

        def __init__(self, dim, num_heads, window_size):
            super().__init__()
            self.num_heads = num_heads
            self.window_size = window_size
            self.window_area = window_size * window_size
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)
            self.attn_drop = nn.Identity()
            self.proj_drop = nn.Identity()
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * window_size - 1) ** 2, num_heads))
            # plain attribute: timm registers this persistent=False, so it
            # does not appear in the state dict either
            self.relative_position_index = torch.tensor(
                _rel_pos_index(window_size))

        def _get_rel_pos_bias(self):
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(
                self.window_area, self.window_area, -1)
            return bias.permute(2, 0, 1).contiguous().unsqueeze(0)

        def forward(self, x, mask=None):   # pre-wrap FP32 path
            B_, N, C = x.shape
            qkv = self.qkv(x).reshape(
                B_, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q * self.scale
            attn = q @ k.transpose(-2, -1)
            attn = attn + self._get_rel_pos_bias()
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(-1, nW, self.num_heads, N, N) + \
                    mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.num_heads, N, N)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
            return self.proj(x)

    class SwinTransformerBlock(nn.Module):
        """timm 0.9.2 block: NHWC in/out, cyclic shift + window partition
        around WindowAttention, pre-norm MLP."""

        def __init__(self, dim, num_heads, res, window_size, shift_size,
                     mlp_ratio=4):
            super().__init__()
            self.window_size = window_size
            self.window_area = window_size * window_size
            self.shift_size = shift_size
            self.norm1 = nn.LayerNorm(dim)
            self.attn = WindowAttention(dim, num_heads, window_size)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))
            self.attn_mask = (torch.tensor(_shift_mask(
                res, window_size, shift_size)) if shift_size else None)

        def forward(self, x):              # (B, H, W, C)
            B, H, W, C = x.shape
            shortcut = x
            x = self.norm1(x)
            if self.shift_size:
                x = torch.roll(x, (-self.shift_size, -self.shift_size),
                               dims=(1, 2))
            xw = window_partition(x, self.window_size)
            xw = xw.view(-1, self.window_area, C)
            aw = self.attn(xw, mask=self.attn_mask)
            aw = aw.view(-1, self.window_size, self.window_size, C)
            x = window_reverse(aw, self.window_size, H, W)
            if self.shift_size:
                x = torch.roll(x, (self.shift_size, self.shift_size),
                               dims=(1, 2))
            x = shortcut + x
            return x + self.mlp(self.norm2(x))

    class PatchMerging(nn.Module):
        """timm 0.9.2 PatchMerging: 2x2 concat in (r0c0, r1c0, r0c1, r1c1)
        channel-block order, norm(4C), bias-free reduction. The reduction's
        reparam must CREATE its bias (linear.py:607-609; test_quant.py:116-117
        materializes it at load time)."""

        def __init__(self, dim, out_dim):
            super().__init__()
            self.norm = nn.LayerNorm(4 * dim)
            self.reduction = nn.Linear(4 * dim, out_dim, bias=False)

        def forward(self, x):              # (B, H, W, C)
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C).permute(
                0, 1, 3, 4, 2, 5).flatten(3)
            return self.reduction(self.norm(x))

    def window_partition(x, ws):
        B, H, W, C = x.shape
        x = x.view(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)

    def window_reverse(w, ws, H, W):
        B = int(w.shape[0] / (H * W / ws / ws))
        x = w.view(B, H // ws, W // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    swm = types.ModuleType("timm.models.swin_transformer")
    layers = types.ModuleType("timm.layers")
    pe = types.ModuleType("timm.layers.patch_embed")

    vt.Attention, vt.Block, vt.Mlp = Attention, Block, Mlp
    swm.WindowAttention = WindowAttention
    swm.SwinTransformerBlock = SwinTransformerBlock
    swm.PatchMerging = PatchMerging
    swm.window_partition = window_partition
    swm.window_reverse = window_reverse
    pe.PatchEmbed = PatchEmbed
    layers.patch_embed = pe
    layers.PatchEmbed = PatchEmbed
    models.vision_transformer = vt
    models.swin_transformer = swm
    timm.models = models
    timm.layers = layers
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.vision_transformer", vt),
                      ("timm.models.swin_transformer", swm),
                      ("timm.layers", layers),
                      ("timm.layers.patch_embed", pe)):
        sys.modules[name] = mod
    return timm


def make_tiny_timm_vit(img=16, patch=8, dim=32, depth=2, heads=2,
                       classes=10, seed=0):
    """A timm-structured torch ViT: state-dict keys and module paths match
    what the reference's wrap_net walks (blocks.N.attn.qkv, mlp.fc1/fc2,
    patch_embed.proj, head)."""
    import torch
    import torch.nn as nn

    timm = install_fake_timm()
    vt = sys.modules["timm.models.vision_transformer"]
    pe = sys.modules["timm.layers.patch_embed"]

    class TinyViT(nn.Module):
        def __init__(self):
            super().__init__()
            n_tok = (img // patch) ** 2
            self.patch_embed = pe.PatchEmbed(3, dim, patch)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
            self.pos_embed = nn.Parameter(torch.zeros(1, n_tok + 1, dim))
            self.blocks = nn.Sequential(*[vt.Block(dim, heads)
                                          for _ in range(depth)])
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.head = nn.Linear(dim, classes)

        def forward(self, x):
            t = self.patch_embed(x)
            cls = self.cls_token.expand(t.shape[0], -1, -1)
            h = torch.cat([cls, t], dim=1) + self.pos_embed
            h = self.blocks(h)
            h = self.norm(h)
            return self.head(h[:, 0])

    torch.manual_seed(seed)
    m = TinyViT()
    with torch.no_grad():
        m.cls_token.normal_(0, 0.5)
        m.pos_embed.normal_(0, 0.5)
    return m


def make_tiny_timm_swin(img=32, patch=4, embed_dim=16, depths=(2, 2),
                        heads=(2, 4), window=4, classes=10, seed=0):
    """A timm-0.9.2-structured torch Swin: module paths and state-dict keys
    match what the reference wrap_net walks (layers.N.blocks.M.attn.qkv,
    downsample.{norm,reduction}, mlp.fc1/fc2, head.fc) AND what our
    load_swin reads. Stage 0 contains a SHIFTED block (res 8 > window 4);
    stage 1 opens with PatchMerging (timm 0.9 stages downsample first)."""
    import torch
    import torch.nn as nn

    install_fake_timm()
    swm = sys.modules["timm.models.swin_transformer"]

    class SwinPatchEmbed(nn.Module):
        def __init__(self, in_chans, dim, p):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, dim, p, stride=p)
            self.norm = nn.LayerNorm(dim)

        def forward(self, x):              # NCHW -> NHWC
            return self.norm(self.proj(x).permute(0, 2, 3, 1))

    class SwinStage(nn.Module):
        def __init__(self, in_dim, out_dim, depth, num_heads, res, ws,
                     downsample):
            super().__init__()
            self.downsample = (swm.PatchMerging(in_dim, out_dim)
                               if downsample else nn.Identity())
            blocks = []
            for j in range(depth):
                # timm _calc_window_shift: no shift when res <= window
                shift = 0 if res <= ws else (0 if j % 2 == 0 else ws // 2)
                blocks.append(swm.SwinTransformerBlock(
                    out_dim, num_heads, res, ws, shift))
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(self.downsample(x))

    class SwinHead(nn.Module):
        def __init__(self, dim, n):
            super().__init__()
            self.fc = nn.Linear(dim, n)

        def forward(self, x):              # (B, H, W, C) avg-pool + fc
            return self.fc(x.mean(dim=(1, 2)))

    class TinySwin(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = SwinPatchEmbed(3, embed_dim, patch)
            stages = []
            res = img // patch
            for i, d in enumerate(depths):
                in_dim = embed_dim * (2 ** max(i - 1, 0))
                out_dim = embed_dim * (2 ** i)
                ws = min(window, res)
                stages.append(SwinStage(in_dim, out_dim, d, heads[i], res,
                                        ws, downsample=(i > 0)))
                if i + 1 < len(depths):
                    res //= 2
            self.layers = nn.Sequential(*stages)
            self.norm = nn.LayerNorm(embed_dim * (2 ** (len(depths) - 1)))
            self.head = SwinHead(embed_dim * (2 ** (len(depths) - 1)),
                                 classes)

        def forward(self, x):
            h = self.patch_embed(x)
            h = self.layers(h)
            return self.head(self.norm(h))

    torch.manual_seed(seed)
    m = TinySwin()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, swm.WindowAttention):
                mod.relative_position_bias_table.normal_(0, 0.5)
    return m


def load_reference_full():
    """Import the reference's pipeline modules (wrap_net + calibrator),
    with the fake timm installed first."""
    load_reference()
    install_fake_timm()
    import utils.wrap_net as ref_wrap_net        # noqa: E402
    import utils.calibrator as ref_calibrator    # noqa: E402
    from types import SimpleNamespace as NS
    return NS(wrap_net=ref_wrap_net, calibrator=ref_calibrator)
