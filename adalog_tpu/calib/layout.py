"""Quantization layout: which sites exist, their quantizer kinds and bit
widths, and (for reparameterized sites) which LayerNorm they fold into.

This is the functional replacement for the reference's graph surgery
(utils/wrap_net.py:55-172): instead of swapping nn.Modules, we enumerate the
model's quant sites from its config and record a SiteSpec per site. Selection
rules mirror wrap_net exactly:
  - head Linears use qhead_a_bit (wrap_net.py:122-123)
  - fused qkv uses n_V=3 row groups (wrap_net.py:134)
  - qkv/fc1/reduction get channel-wise + LayerNorm reparam when
    a_bit == w_bit and calibrating fresh (wrap_net.py:139-153)
  - fc2 uses the post-GeLU quantizer from cfg (wrap_net.py:154-163)
  - matmul2 uses the post-Softmax quantizer at s_bit (wrap_net.py:110-116)
  - the patch-embed conv uses qconv_a_bit (wrap_net.py:78-96)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

from adalog_tpu.utils.config import Config
from adalog_tpu.models.zoo import ModelSpec


@dataclass(frozen=True)
class SiteSpec:
    kind: str            # 'conv' | 'linear' | 'linear_reparam' | 'postgelu'
                         # | 'postgelu_twin' | 'matmul' | 'matmul_post'
    w_bits: int = 8
    a_bits: int = 8      # for matmul sites: the B-operand bits
    s_bits: int = 8      # matmul_post A-operand bits
    n_V: int = 1
    heads: int = 0
    param_path: Tuple = ()
    norm_path: Optional[Tuple] = None      # LayerNorm folded by reparam
    post_quantizer: str = "adalog"         # adalog | log2 | logsqrt2 | ptq4vit


def _linear_kind(name: str, cfg: Config, reparam: bool, a_bits: int) -> str:
    if any(t in name for t in ("qkv", "reduction", "fc1")) and \
            a_bits == cfg.w_bit and reparam:
        return "linear_reparam"
    if "fc2" in name and cfg.post_gelu_quantizer in (
            "adalog", "log2", "logsqrt2", "ptq4vit"):
        return "postgelu_twin" if cfg.post_gelu_quantizer == "ptq4vit" \
            else "postgelu"
    return "linear"


def vit_layout(spec: ModelSpec, cfg: Config, reparam: bool = True):
    m = spec.cfg
    sites = {}
    sites["patch_embed.proj"] = SiteSpec(
        kind="conv", w_bits=cfg.w_bit, a_bits=cfg.qconv_a_bit,
        param_path=("patch_proj",))
    for i in range(m.depth):
        p = f"blocks.{i}"
        pp = ("blocks", i)
        sites[f"{p}.attn.qkv"] = SiteSpec(
            kind=_linear_kind("qkv", cfg, reparam, cfg.a_bit),
            w_bits=cfg.w_bit, a_bits=cfg.a_bit, n_V=3,
            param_path=pp + ("attn", "qkv"), norm_path=pp + ("norm1",))
        sites[f"{p}.attn.proj"] = SiteSpec(
            kind="linear", w_bits=cfg.w_bit, a_bits=cfg.a_bit,
            param_path=pp + ("attn", "proj"))
        sites[f"{p}.attn.matmul1"] = SiteSpec(
            kind="matmul", a_bits=cfg.a_bit, s_bits=cfg.a_bit, heads=m.heads,
            param_path=())
        sites[f"{p}.attn.matmul2"] = SiteSpec(
            kind="matmul_post", a_bits=cfg.a_bit, s_bits=cfg.s_bit,
            heads=m.heads, param_path=(),
            post_quantizer=cfg.post_softmax_quantizer)
        sites[f"{p}.mlp.fc1"] = SiteSpec(
            kind=_linear_kind("fc1", cfg, reparam, cfg.a_bit),
            w_bits=cfg.w_bit, a_bits=cfg.a_bit,
            param_path=pp + ("mlp", "fc1"), norm_path=pp + ("norm2",))
        sites[f"{p}.mlp.fc2"] = SiteSpec(
            kind=_linear_kind("fc2", cfg, reparam, cfg.a_bit),
            w_bits=cfg.w_bit, a_bits=cfg.a_bit,
            param_path=pp + ("mlp", "fc2"),
            post_quantizer=cfg.post_gelu_quantizer)
    sites["head"] = SiteSpec(
        kind="linear", w_bits=cfg.w_bit, a_bits=cfg.qhead_a_bit,
        param_path=("head",))
    return sites


def swin_layout(spec: ModelSpec, cfg: Config, reparam: bool = True):
    m = spec.cfg
    sites = {}
    sites["patch_embed.proj"] = SiteSpec(
        kind="conv", w_bits=cfg.w_bit, a_bits=cfg.qconv_a_bit,
        param_path=("patch_proj",))
    for i, depth in enumerate(m.depths):
        if i > 0:
            sites[f"layers.{i}.downsample.reduction"] = SiteSpec(
                kind=_linear_kind("reduction", cfg, reparam, cfg.a_bit),
                w_bits=cfg.w_bit, a_bits=cfg.a_bit,
                param_path=("stages", i, "downsample", "reduction"),
                norm_path=("stages", i, "downsample", "norm"))
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            pp = ("stages", i, "blocks", j)
            sites[f"{p}.attn.qkv"] = SiteSpec(
                kind=_linear_kind("qkv", cfg, reparam, cfg.a_bit),
                w_bits=cfg.w_bit, a_bits=cfg.a_bit, n_V=3,
                param_path=pp + ("attn", "qkv"), norm_path=pp + ("norm1",))
            sites[f"{p}.attn.proj"] = SiteSpec(
                kind="linear", w_bits=cfg.w_bit, a_bits=cfg.a_bit,
                param_path=pp + ("attn", "proj"))
            sites[f"{p}.attn.matmul1"] = SiteSpec(
                kind="matmul", a_bits=cfg.a_bit, s_bits=cfg.a_bit,
                heads=m.heads[i], param_path=())
            sites[f"{p}.attn.matmul2"] = SiteSpec(
                kind="matmul_post", a_bits=cfg.a_bit, s_bits=cfg.s_bit,
                heads=m.heads[i], param_path=(),
                post_quantizer=cfg.post_softmax_quantizer)
            sites[f"{p}.mlp.fc1"] = SiteSpec(
                kind=_linear_kind("fc1", cfg, reparam, cfg.a_bit),
                w_bits=cfg.w_bit, a_bits=cfg.a_bit,
                param_path=pp + ("fc1",), norm_path=pp + ("norm2",))
            sites[f"{p}.mlp.fc2"] = SiteSpec(
                kind=_linear_kind("fc2", cfg, reparam, cfg.a_bit),
                w_bits=cfg.w_bit, a_bits=cfg.a_bit,
                param_path=pp + ("fc2",),
                post_quantizer=cfg.post_gelu_quantizer)
    sites["head.fc"] = SiteSpec(
        kind="linear", w_bits=cfg.w_bit, a_bits=cfg.qhead_a_bit,
        param_path=("head",))
    return sites


def quant_layout(spec: ModelSpec, cfg: Config, reparam: bool = True):
    if spec.family == "vit":
        return vit_layout(spec, cfg, reparam)
    return swin_layout(spec, cfg, reparam)


# ---------------------------------------------------------------------------
# Pytree path access (functional setattr for the reparam rewrites)
# ---------------------------------------------------------------------------

def tree_get(obj, path):
    for p in path:
        obj = obj[p] if isinstance(p, int) else getattr(obj, p)
    return obj


def tree_set(obj, path, value):
    """Return a copy of ``obj`` with the leaf at ``path`` replaced."""
    if not path:
        return value
    p = path[0]
    if isinstance(p, int):
        as_list = list(obj)
        as_list[p] = tree_set(obj[p], path[1:], value)
        return tuple(as_list)
    child = getattr(obj, p)
    return obj.replace(**{p: tree_set(child, path[1:], value)})
