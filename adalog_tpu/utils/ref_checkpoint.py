"""Interop: load checkpoints produced by the upstream PyTorch implementation.

The reference saves ``torch.save(model.state_dict())`` of the wrapped model
(test_quant.py:95-106): per quant site it carries the (possibly reparamed)
weights plus every quantizer's searched parameters —
  {site}.weight / {site}.bias
  {site}.w_quantizer.scale / .zero_point                  (per row-group)
  {site}.a_quantizer.scale / .zero_point [.shift .q .table1 .table2
                                          .bias_reparamed]
  {site}.A_quantizer.* / {site}.B_quantizer.*             (matmul sites)
A user switching from the reference can load such a checkpoint here and get
the identical quantized model (the reference's --load-calibrate-checkpoint /
--load-optimize-checkpoint semantics, test_quant.py:109-127).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from adalog_tpu.utils.config import Config
from adalog_tpu.models.zoo import ModelSpec, build_model
from adalog_tpu.models.load import read_state_dict
from adalog_tpu.models.layers import LinearSite, ConvSite, MatMulSite
from adalog_tpu.quantizers.state import QuantizerState, WeightQuantizerState
from adalog_tpu.calib.layout import quant_layout, tree_get, tree_set

_LOG_KINDS = {"adalog", "log2", "logsqrt2"}


def _arr(sd, key, default=None):
    if key in sd:
        return jnp.asarray(np.asarray(sd[key], np.float32))
    return default


def _act_state(sd, prefix: str, kind: str, bits: int) -> QuantizerState:
    scale = _arr(sd, f"{prefix}.scale", jnp.ones((1,), jnp.float32))
    shift = _arr(sd, f"{prefix}.shift")
    reparamed = None
    if f"{prefix}.bias_reparamed" in sd:
        reparamed = jnp.asarray(bool(np.asarray(sd[f"{prefix}.bias_reparamed"])))
    if kind == "twin":
        return QuantizerState(scale=scale.reshape(2, 1), kind="twin", bits=bits)
    if kind in _LOG_KINDS:
        q = _arr(sd, f"{prefix}.q")
        return QuantizerState(
            scale=scale.reshape(-1) if scale.ndim <= 1 else scale,
            shift=shift, log_q=q.reshape(()) if q is not None else None,
            bias_reparamed=reparamed if shift is not None else None,
            kind=kind, bits=bits, shifted=shift is not None)
    return QuantizerState(
        scale=scale, zero_point=_arr(sd, f"{prefix}.zero_point"),
        shift=shift, bias_reparamed=reparamed if shift is not None else None,
        kind="uniform", bits=bits, shifted=shift is not None)


def _np(a):
    return np.asarray(a, np.float32)


def export_reference_state_dict(spec: ModelSpec, cfg: Config, params,
                                qstate) -> dict:
    """Inverse interop: emit a reference-format flat state dict (numpy) from
    our (params, qstate) so reference-side tooling can consume our results.
    (ViT/DeiT and Swin backbones; the Swin rel-pos-bias tables are recovered
    from the pre-gathered biases by the exact scatter inverse.)"""
    sd = {}
    if spec.family == "vit":
        m, p = spec.cfg, params
        sd["cls_token"] = _np(p.cls_token)
        sd["pos_embed"] = _np(p.pos_embed)
        sd["patch_embed.proj.weight"] = _np(p.patch_proj.w)
        sd["patch_embed.proj.bias"] = _np(p.patch_proj.b)
        for i, bp in enumerate(p.blocks):
            pre = f"blocks.{i}"
            sd[f"{pre}.norm1.weight"], sd[f"{pre}.norm1.bias"] = \
                _np(bp.norm1.g), _np(bp.norm1.b)
            sd[f"{pre}.norm2.weight"], sd[f"{pre}.norm2.bias"] = \
                _np(bp.norm2.g), _np(bp.norm2.b)
            for key, lin in ((f"{pre}.attn.qkv", bp.attn.qkv),
                             (f"{pre}.attn.proj", bp.attn.proj),
                             (f"{pre}.mlp.fc1", bp.mlp.fc1),
                             (f"{pre}.mlp.fc2", bp.mlp.fc2)):
                sd[f"{key}.weight"] = _np(lin.w)
                if lin.b is not None:
                    sd[f"{key}.bias"] = _np(lin.b)
        sd["norm.weight"], sd["norm.bias"] = _np(p.norm.g), _np(p.norm.b)
        sd["head.weight"], sd["head.bias"] = _np(p.head.w), _np(p.head.b)
    else:
        from adalog_tpu.models.swin import ungather_rel_pos_bias
        m, p = spec.cfg, params
        sd["patch_embed.proj.weight"] = _np(p.patch_proj.w)
        sd["patch_embed.proj.bias"] = _np(p.patch_proj.b)
        sd["patch_embed.norm.weight"] = _np(p.patch_norm.g)
        sd["patch_embed.norm.bias"] = _np(p.patch_norm.b)
        for i, sp in enumerate(p.stages):
            if sp.downsample is not None:
                d = f"layers.{i}.downsample"
                sd[f"{d}.norm.weight"] = _np(sp.downsample.norm.g)
                sd[f"{d}.norm.bias"] = _np(sp.downsample.norm.b)
                sd[f"{d}.reduction.weight"] = _np(sp.downsample.reduction.w)
                if sp.downsample.reduction.b is not None:
                    sd[f"{d}.reduction.bias"] = _np(sp.downsample.reduction.b)
            ws = min(m.window, m.stage_res(i))
            for j, bp in enumerate(sp.blocks):
                pre = f"layers.{i}.blocks.{j}"
                sd[f"{pre}.norm1.weight"], sd[f"{pre}.norm1.bias"] = \
                    _np(bp.norm1.g), _np(bp.norm1.b)
                sd[f"{pre}.norm2.weight"], sd[f"{pre}.norm2.bias"] = \
                    _np(bp.norm2.g), _np(bp.norm2.b)
                sd[f"{pre}.attn.relative_position_bias_table"] = \
                    ungather_rel_pos_bias(np.asarray(bp.attn.rel_pos_bias), ws)
                for key, lin in ((f"{pre}.attn.qkv", bp.attn.qkv),
                                 (f"{pre}.attn.proj", bp.attn.proj),
                                 (f"{pre}.mlp.fc1", bp.fc1),
                                 (f"{pre}.mlp.fc2", bp.fc2)):
                    sd[f"{key}.weight"] = _np(lin.w)
                    if lin.b is not None:
                        sd[f"{key}.bias"] = _np(lin.b)
        sd["norm.weight"], sd["norm.bias"] = _np(p.norm.g), _np(p.norm.b)
        sd["head.fc.weight"], sd["head.fc.bias"] = _np(p.head.w), _np(p.head.b)

    from adalog_tpu.quantizers.logarithm import make_adalog_tables
    for name, site in qstate.items():
        if isinstance(site, MatMulSite):
            for tag, qs in (("A_quantizer", site.Aq), ("B_quantizer", site.Bq)):
                sd[f"{name}.{tag}.scale"] = _np(qs.scale)
                if qs.zero_point is not None:
                    sd[f"{name}.{tag}.zero_point"] = _np(qs.zero_point)
                if qs.log_q is not None:
                    q = int(np.asarray(qs.log_q))
                    sd[f"{name}.{tag}.q"] = np.asarray([q])
                    t1, t2 = make_adalog_tables(q, qs.bits)
                    sd[f"{name}.{tag}.table1"] = _np(t1)
                    sd[f"{name}.{tag}.table2"] = _np(t2)
            continue
        sd[f"{name}.w_quantizer.scale"] = _np(site.wq.scale)
        if site.wq.zero_point is not None:
            sd[f"{name}.w_quantizer.zero_point"] = _np(site.wq.zero_point)
        aq = site.aq
        sd[f"{name}.a_quantizer.scale"] = _np(aq.scale)
        if aq.zero_point is not None:
            sd[f"{name}.a_quantizer.zero_point"] = _np(aq.zero_point)
        if aq.shift is not None:
            sd[f"{name}.a_quantizer.shift"] = _np(aq.shift)
            sd[f"{name}.a_quantizer.bias_reparamed"] = np.asarray(
                bool(np.asarray(aq.bias_reparamed)))
        if aq.log_q is not None:
            q = int(np.asarray(aq.log_q))
            sd[f"{name}.a_quantizer.q"] = np.asarray([q])
            t1, t2 = make_adalog_tables(q, aq.bits)
            sd[f"{name}.a_quantizer.table1"] = _np(t1)
            sd[f"{name}.a_quantizer.table2"] = _np(t2)
    return sd


def load_reference_checkpoint(spec: ModelSpec, cfg: Config, path: str,
                              params=None):
    """Returns (params, qstate) from a reference-format state dict.

    ``params``: base params to overlay (default: fresh build). The state dict's
    site weights (possibly reparamed) and LayerNorm affines overwrite the base;
    quantizer tensors become the qstate.
    """
    return _load_reference_sd(spec, cfg, read_state_dict(path), params)


def _load_reference_sd(spec: ModelSpec, cfg: Config, sd: dict, params=None):
    if params is None:
        _, params = build_model(spec.name)
    # 1) model weights: the reference dict uses timm names for everything the
    #    importer already understands — reuse it wholesale when possible
    from adalog_tpu.models.load import load_vit, load_swin
    have_backbone = "patch_embed.proj.weight" in sd
    if have_backbone:
        params = load_vit(spec.cfg, sd) if spec.family == "vit" \
            else load_swin(spec.cfg, sd)

    # 2) quantizer states per layout site
    layout = quant_layout(spec, cfg, reparam=False)
    qstate = {}
    for name, ss in layout.items():
        if ss.kind in ("matmul", "matmul_post"):
            a_kind = cfg.post_softmax_quantizer if ss.kind == "matmul_post" \
                else "uniform"
            Aq = _act_state(sd, f"{name}.A_quantizer", a_kind, ss.s_bits)
            Bq = _act_state(sd, f"{name}.B_quantizer", "uniform", ss.a_bits)
            H = ss.heads if cfg.matmul_head_channel_wise else 1
            Aq = Aq.replace(scale=Aq.scale.reshape(1, -1, 1, 1))
            if Aq.zero_point is not None:
                Aq = Aq.replace(zero_point=Aq.zero_point.reshape(1, -1, 1, 1))
            Bq = Bq.replace(scale=Bq.scale.reshape(1, H, 1, 1),
                            zero_point=Bq.zero_point.reshape(1, H, 1, 1))
            qstate[name] = MatMulSite(Aq=Aq, Bq=Bq)
            continue

        w_scale = _arr(sd, f"{name}.w_quantizer.scale")
        w_zp = _arr(sd, f"{name}.w_quantizer.zero_point")
        if w_scale is None:
            continue
        wq = WeightQuantizerState(scale=w_scale, zero_point=w_zp,
                                  bits=ss.w_bits, symmetric=w_zp is None)
        if ss.kind == "conv":
            aq = QuantizerState(scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                                kind="uniform", bits=ss.a_bits, symmetric=True)
            qstate[name] = ConvSite(wq=wq, aq=aq)
        else:
            a_kind = "uniform"
            if ss.kind == "postgelu":
                a_kind = ss.post_quantizer
            elif ss.kind == "postgelu_twin":
                a_kind = "twin"
            aq = _act_state(sd, f"{name}.a_quantizer", a_kind, ss.a_bits)
            qstate[name] = LinearSite(wq=wq, aq=aq, n_V=ss.n_V)

        # site weights may be reparamed; overlay them explicitly (covers the
        # Swin reduction bias the reference materializes at load,
        # test_quant.py:116-117)
        w = _arr(sd, f"{name}.weight")
        if w is not None and ss.param_path:
            p = tree_get(params, ss.param_path)
            b = _arr(sd, f"{name}.bias")
            if ss.kind == "conv":
                params = tree_set(params, ss.param_path,
                                  p.replace(w=w, b=b))
            else:
                params = tree_set(params, ss.param_path,
                                  p.replace(w=w, b=b))
    return params, qstate
