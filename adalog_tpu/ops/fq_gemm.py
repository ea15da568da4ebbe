"""Pallas TPU kernel: fused activation-fake-quant GEMM.

Eval-path quantized Linear is y = fq_a(x) @ fq_w(W)^T + b. The weight half is
input-independent, so the wrapper dequantizes W once per call (XLA CSEs it per
step); the activation half is fused INTO the GEMM: each (TM, K) x-tile is
fake-quantized in VMEM (fp32 math on the VPU) and fed straight to the MXU —
the quantized activations never round-trip through HBM, which is the traffic
the unfused XLA path pays (quantize-x writes + matmul reads of a full x copy).

Supported activation quantizers (static ``kind``):
  'uniform'       asymmetric per-tensor (the default Linear sites)
  'adalog_shift'  shifted AdaLog with folded bias (the post-GeLU fc2 path,
                  inference form: quantize x+shift, no subtract-back)

Numerics match the XLA path: quant math in fp32; the MXU dot runs fp32 for
fp32 inputs and bf16 for bf16 inputs (the bf16 fast path casts after
quantization, preserving the fp32-precise grid snap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adalog_tpu.quantizers.logarithm import ADALOG_R

# module switch consulted by the model layer (set_enabled); default off —
# enabled by the CLI/bench on TPU backends.
_ENABLED = False
# interpreter mode for CPU tests of kernel numerics
INTERPRET = False


def set_enabled(flag: bool):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled() -> bool:
    return _ENABLED and jax.default_backend() == "tpu"


def _quantize_tile(x, s, zp, shift, qq, kind: str, bits: int):
    """Fake-quantize one fp32 tile with scalar quantizer params."""
    N = 2 ** (bits - 1)
    if kind == "uniform":
        z = jnp.round(zp)
        q = jnp.clip(jnp.round(x / s) + z, 0.0, 2.0 * N - 1)
        return (q - z) * s
    # adalog_shift (bias already folded: quantize x+shift, keep shifted value)
    scaled = jnp.clip((x + shift) / s, 1e-15, 1.0)
    code = jnp.round(-jnp.log2(scaled) * ADALOG_R / qq)
    keep = (code < 2 * N).astype(jnp.float32)
    code = jnp.clip(code, 0.0, 2.0 * N - 1)
    prod = code * qq
    ts = 1.0 / (4 * N - 2)
    mant = jnp.round(jnp.exp2(-jnp.remainder(prod, ADALOG_R) / ADALOG_R) / ts) * ts
    dq = jnp.exp2(-jnp.floor(prod / ADALOG_R)) * mant
    return dq * keep * s  # shift already folded into the consumer's bias


def _kernel(params_ref, x_ref, w_ref, out_ref, *, kind: str, bits: int,
            compute_dtype):
    # SMEM permits scalar loads only
    xq = _quantize_tile(x_ref[:].astype(jnp.float32), params_ref[0],
                        params_ref[1], params_ref[2], params_ref[3],
                        kind, bits)
    out_ref[:] = jax.lax.dot(
        xq.astype(compute_dtype), w_ref[:].astype(compute_dtype),
        precision=(None if compute_dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST),
        preferred_element_type=jnp.float32)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


VMEM_BUDGET = 12 * 1024 * 1024   # leave headroom under the ~16 MB/core VMEM


def _pick_tiles(K: int, itemsize: int):
    """Largest (tm, to) with double-buffered x/w/out tiles under the budget."""
    for tm, to in ((256, 512), (256, 256), (128, 256), (128, 128), (64, 128)):
        if 2 * (tm * K + K * to + tm * to) * itemsize <= VMEM_BUDGET:
            return tm, to
    return 32, 128


@functools.partial(jax.jit, static_argnames=("kind", "bits", "tm", "to"))
def fq_gemm(x, w_t, params, *, kind: str, bits: int, tm: int = None,
            to: int = None):
    """y = fake_quant(x) @ w_t with the quantize fused into the GEMM.

    x: (T, K); w_t: (K, O) pre-quantized weight (already transposed);
    params: (4,) fp32 [scale, zero_point, shift, log_q] (unused slots zero).
    Returns (T, O) in x.dtype's compute precision, fp32 accumulated.
    """
    T, K = x.shape
    O = w_t.shape[1]
    if tm is None or to is None:
        atm, ato = _pick_tiles(K, x.dtype.itemsize)
        tm, to = tm or atm, to or ato
    compute_dtype = x.dtype
    xp = _pad_to(x, tm, 0)
    wp = _pad_to(w_t, to, 1)
    Tp, Op = xp.shape[0], wp.shape[1]

    out = pl.pallas_call(
        functools.partial(_kernel, kind=kind, bits=bits,
                          compute_dtype=compute_dtype),
        grid=(Tp // tm, Op // to),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, to), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, to), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Op), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * Op, bytes_accessed=(Tp * K + K * Op + Tp * Op) * 4,
            transcendentals=Tp * K if kind != "uniform" else 0),
        interpret=INTERPRET,
    )(params, xp, wp)
    return out[:T, :O].astype(compute_dtype)


def site_params(aq) -> jnp.ndarray:
    """Pack a QuantizerState into the kernel's (4,) param vector."""
    z = jnp.zeros((), jnp.float32)
    scale = aq.scale.reshape(-1)[0].astype(jnp.float32)
    zp = (aq.zero_point.reshape(-1)[0].astype(jnp.float32)
          if aq.zero_point is not None else z)
    shift = (aq.shift.reshape(-1)[0].astype(jnp.float32)
             if aq.shift is not None else z)
    q = (aq.log_q.reshape(-1)[0].astype(jnp.float32)
         if aq.log_q is not None else z)
    return jnp.stack([scale, zp, shift, q])


def supports(site, mode: str) -> bool:
    """Can this Linear site's eval forward run through the fused kernel?

    Static decision made at trace time: per-tensor asymmetric uniform sites
    always; shifted-AdaLog fc2 sites only once the GeLU shift has been folded
    into the bias (inference form). bias_reparamed must be a concrete array
    (qstate closed over by the eval jit), else we conservatively decline.
    """
    if not enabled() or mode != "quant":
        return False
    aq = site.aq
    if aq.bits == 32:
        return False
    if aq.kind == "uniform" and not aq.symmetric and aq.scale.size == 1:
        return True
    if aq.kind == "adalog" and aq.shifted:
        try:
            return bool(aq.bias_reparamed)
        except Exception:
            return False
    return False


def kernel_kind(site) -> str:
    return "uniform" if site.aq.kind == "uniform" else "adalog_shift"
