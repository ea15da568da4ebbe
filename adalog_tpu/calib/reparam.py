"""Reparameterization transforms.

Two weight rewrites from the reference, expressed as pure functions over the
param pytree instead of in-place nn.Parameter mutation:

1. LayerNorm channel reparam (linear.py:596-621): fold per-input-channel
   activation ranges of a qkv/fc1/reduction Linear into the preceding
   LayerNorm's affine and the Linear's weights/bias, so a per-tensor quantizer
   suffices afterwards. The composition LayerNorm∘Linear is mathematically
   unchanged; the cached calibration input must be rewritten the same way
   (x' = x/r - b, linear.py:616).

2. Post-GeLU bias fold (linear.py:999-1006 reparam_bias): fold the constant
   GeLU shift through the *quantized* fc2 weights into the layer bias and flip
   the quantizer's bias_reparamed flag, so inference quantizes x+shift
   directly without the subtract-back.
"""

from __future__ import annotations

import jax.numpy as jnp

from adalog_tpu.models.layers import LinearP, LayerNormP, linear_view
from adalog_tpu.quantizers.apply import apply_weight_quantizer


def layernorm_channel_reparam(norm: LayerNormP, lin: LinearP, a_scale, a_zp):
    """Returns (norm', lin', r, b, target_scale, target_zp).

    a_scale/a_zp: per-input-channel (I,) from the channel-wise self-search.
    r rescales channels to a common range; b shifts channel minima to a common
    zero point. norm: g /= r, b = b/r - shift; lin: w *= r (per column),
    bias += W'·shift (bias created if absent — the Swin reduction case,
    test_quant.py:116-117).
    """
    channel_min = -a_zp * a_scale
    target_scale = jnp.mean(a_scale).reshape(1)
    target_zp = jnp.round(jnp.mean(a_zp)).reshape(1)
    target_min = -target_zp * target_scale
    r = a_scale / target_scale                    # (I,)
    b = channel_min / r - target_min              # (I,)

    new_norm = norm.replace(g=norm.g / r, b=norm.b / r - b)
    new_w = lin.w * r[None, :]
    add = new_w @ b                               # (O,)
    new_bias = add if lin.b is None else lin.b + add
    return new_norm, lin.replace(w=new_w, b=new_bias), r, b, \
        target_scale, target_zp


def rewrite_cached_input(x, r, b):
    """Apply the channel reparam to a cached calibration input (linear.py:616)."""
    return x / r - b


def fold_gelu_shift_into_bias(lin: LinearP, site, *, shift) -> LinearP:
    """reparam_bias: bias' = bias + (-shift·1)·W_qᵀ with W_q the fake-quantized
    weight (linear.py:999-1006). Caller flips site.aq.bias_reparamed."""
    w_v = linear_view(lin.w, site.n_V)
    w_q = apply_weight_quantizer(site.wq, w_v).reshape(lin.w.shape)
    add = w_q @ jnp.full((lin.w.shape[1],), -shift, lin.w.dtype)
    bias = add if lin.b is None else lin.b + add
    return lin.replace(b=bias)
