"""Functional layer primitives with quantization taps.

The reference mutates a live torch module tree — swapping nn.Linear/Conv2d and
inserted MatMul shims for stateful "quant layers" with a ``mode`` attribute and
forward hooks (utils/wrap_net.py:55-172, quant_layers/*.py). Here the same
capability is three pure functions (qlinear / qconv2d / qmatmul) that take the
layer parameters, an optional quant-site state, and a static mode:

    mode: 'raw'     -> FP forward                      (linear.py:27-28)
          'quant'   -> fake-quant weights + acts       (linear.py:46-51)
          'w_only'  -> quantize weights only           (linear.py:53-56, debug_only_quant_weight)
          'a_only'  -> quantize activations only       (linear.py:58-61, debug_only_quant_act)

Captured taps (the hook replacement) are returned through a ``taps`` dict the
caller threads through the forward — one forward pass over the calibration set
captures every site at once, replacing the reference's O(layers) full-model
passes (utils/calibrator.py:44-47).
"""

from __future__ import annotations

import contextvars
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from adalog_tpu.quantizers.state import QuantizerState, WeightQuantizerState
from adalog_tpu.quantizers.apply import apply_quantizer, apply_weight_quantizer

MODES = ("raw", "quant", "w_only", "a_only")

# Parity-critical default: this JAX build's DEFAULT matmul precision computes
# fp32 dots through a low-precision path (~1e-1 abs error vs fp64 on unit-scale
# data). Calibration scoring and reference-parity eval need true fp32; the
# bfloat16 fast path opts out by casting inputs to bf16 (where DEFAULT is
# exact for the dtype).
HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Parameter pytrees
# ---------------------------------------------------------------------------

@struct.dataclass
class LinearP:
    w: jnp.ndarray                     # (out, in)
    b: Optional[jnp.ndarray] = None    # (out,)


@struct.dataclass
class ConvP:
    w: jnp.ndarray                     # (oc, ic, kh, kw) — canonical OIHW
    b: Optional[jnp.ndarray] = None
    stride: tuple = struct.field(pytree_node=False, default=(1, 1))
    padding: tuple = struct.field(pytree_node=False, default=(0, 0))


@struct.dataclass
class LayerNormP:
    g: jnp.ndarray
    b: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)


# ---------------------------------------------------------------------------
# Quant-site state pytrees
# ---------------------------------------------------------------------------

@struct.dataclass
class LinearSite:
    """Quant state for a Linear site.

    n_V row groups split the output dim (PTQSL "split-linear", linear.py:64-92);
    n_V=3 separates the fused q/k/v rows (wrap_net.py:134).
    """
    wq: WeightQuantizerState
    aq: QuantizerState
    n_V: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class ConvSite:
    wq: WeightQuantizerState          # scale shape (oc, 1) over (oc, ic*kh*kw)
    aq: QuantizerState


@struct.dataclass
class MatMulSite:
    """Quant state for a bare A@B site (the two attention matmuls)."""
    Aq: QuantizerState                # per-head scale (1, H, 1, 1) when head_channel_wise
    Bq: QuantizerState


# ---------------------------------------------------------------------------
# Tensor-parallel context (shard_map eval path)
# ---------------------------------------------------------------------------

# When the eval forward runs inside jax.shard_map over a tensor-parallel mesh
# axis (parallel/tp.py), row-parallel linears (proj/fc2 in the Megatron
# placement) hold an input-feature shard of the weight: their local matmul
# output is a PARTIAL sum that must be psum'd over the tp axis before the
# bias is added (once, on the full result). The context carries (axis_name,
# frozenset of row-parallel site names); it is consulted at trace time only.
_TP_ROW: contextvars.ContextVar = contextvars.ContextVar(
    "adalog_tp_row", default=None)


def tp_row_axis(name: Optional[str]) -> Optional[str]:
    ctx = _TP_ROW.get()
    if ctx is not None and name is not None and name in ctx[1]:
        return ctx[0]
    return None


class tp_row_context:
    """Trace-time context manager marking ``names`` as row-parallel on
    mesh axis ``axis`` (used by parallel/tp.py inside its shard_map body)."""

    def __init__(self, axis: str, names):
        self.axis, self.names = axis, frozenset(names)

    def __enter__(self):
        self._tok = _TP_ROW.set((self.axis, self.names))

    def __exit__(self, *exc):
        _TP_ROW.reset(self._tok)


# ---------------------------------------------------------------------------
# Functional forwards
# ---------------------------------------------------------------------------

def linear_view(w: jnp.ndarray, n_V: int) -> jnp.ndarray:
    """(out, in) -> (n_V, out/n_V, in) row-group view (linear.py:91)."""
    out, inf = w.shape
    return w.reshape(n_V, out // n_V, inf)


def quant_linear_weight(p: LinearP, site: LinearSite, *, soft: bool = False,
                        training: bool = False) -> jnp.ndarray:
    wv = linear_view(p.w, site.n_V)
    wq = apply_weight_quantizer(site.wq, wv, soft=soft, training=training)
    return wq.reshape(p.w.shape)


def qlinear(p: LinearP, site: Optional[LinearSite], x, *, mode: str = "raw",
            training: bool = False, soft: bool = False,
            name: Optional[str] = None):
    """y = x @ W^T + b with optional fake quantization of W and/or x.

    On TPU eval (when enabled), supported sites route through the Pallas fused
    fake-quant GEMM (ops/fq_gemm.py): weight dequantized once, activation
    quantize fused into the MXU matmul.

    ``name`` identifies the site for the tensor-parallel shard_map path: when
    the tp context marks it row-parallel, the local partial product is psum'd
    over the tp axis before the (replicated) bias is added once.
    """
    row_axis = tp_row_axis(name)
    if site is not None and mode == "quant" and not training \
            and row_axis is None:
        from adalog_tpu.ops import int8_linear
        if int8_linear.supports(site, mode):
            return int8_linear.int8_qlinear(p, site, x, name=name)
    w = p.w
    if site is not None and mode in ("quant", "w_only"):
        w = None
        if not training and not soft:
            # load-time-prepared fake-quant weights (ops/weight_prep.py):
            # skips the per-call round/clip/scale over the full O*I matrix
            from adalog_tpu.ops import weight_prep
            w = weight_prep.lookup(name, p.w.shape)
        if w is None:
            w = quant_linear_weight(p, site, soft=soft, training=training)
    if site is not None and mode in ("quant", "a_only"):
        from adalog_tpu.ops import fq_gemm
        if not training and row_axis is None and fq_gemm.supports(site, mode):
            lead = x.shape[:-1]
            y = fq_gemm.fq_gemm(
                x.reshape(-1, x.shape[-1]), w.T,
                fq_gemm.site_params(site.aq),
                kind=fq_gemm.kernel_kind(site), bits=site.aq.bits)
            y = y.reshape(*lead, w.shape[0])
            if p.b is not None:
                y = y + p.b
            return y
        x = apply_quantizer(site.aq, x, training=training)
    y = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=None if x.dtype == jnp.bfloat16 else HIGHEST)
    if row_axis is not None:
        y = jax.lax.psum(y, row_axis)
    if p.b is not None:
        y = y + p.b
    return y


def conv_view(w: jnp.ndarray) -> jnp.ndarray:
    """(oc, ic, kh, kw) -> (oc, ic*kh*kw) flat view (conv.py:118-120)."""
    return w.reshape(w.shape[0], -1)


def quant_conv_weight(p: ConvP, site: ConvSite, *, soft: bool = False,
                      training: bool = False) -> jnp.ndarray:
    wv = conv_view(p.w)
    wq = apply_weight_quantizer(site.wq, wv, soft=soft, training=training)
    return wq.reshape(p.w.shape)


def qconv2d(p: ConvP, site: Optional[ConvSite], x, *, mode: str = "raw",
            training: bool = False, soft: bool = False):
    """NHWC conv with optional fake quantization.

    Activations pass through unquantized when a-bits >= 8 (conv.py:55-58);
    the shipped configs always set qconv_a_bit=8, so the patch-embed conv is
    weight-only quantized.
    """
    w = p.w
    if site is not None and mode in ("quant", "w_only"):
        w = quant_conv_weight(p, site, soft=soft, training=training)
    if site is not None and mode in ("quant", "a_only") and site.aq.bits < 8:
        x = apply_quantizer(site.aq, x, training=training)
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)),   # OIHW -> HWIO
        window_strides=p.stride,
        padding=[(p.padding[0], p.padding[0]), (p.padding[1], p.padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
        precision=None if x.dtype == jnp.bfloat16 else HIGHEST)
    if p.b is not None:
        y = y + p.b
    return y


def qmatmul(site: Optional[MatMulSite], A, B, *, mode: str = "raw",
            training: bool = False):
    """A @ B with optional fake quantization of both operands (matmul.py:28-45).

    On TPU eval (when enabled) supported sites route through the Pallas fused
    attention kernel (ops/fq_attn.py): both quantizers fused into the batched
    MXU matmul.
    """
    if site is not None and mode == "quant":
        if not training and A.ndim == 4:
            from adalog_tpu.ops import fq_attn
            if fq_attn.supports(site, mode):
                return fq_attn.run(site, A, B)
        A = apply_quantizer(site.Aq, A, training=training)
        B = apply_quantizer(site.Bq, B, training=training)
    return jnp.matmul(A, B, preferred_element_type=A.dtype,
                      precision=None if A.dtype == jnp.bfloat16 else HIGHEST)


def layer_norm(p: LayerNormP, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + p.eps) * p.g + p.b


def gelu(x):
    """Exact (erf) GeLU — torch.nn.GELU default, which the reference models use."""
    return jax.nn.gelu(x, approximate=False)
