"""True-integer execution of quantized Linear sites.

The reference (and our default path) evaluates FAKE quantization: dequantized
fp32 values through fp GEMMs, with the integer story left implicit
(SURVEY.md §3.3). On TPU the MXU executes int8 x int8 -> int32 at twice the
bf16 rate, so for uniform-quantized sites we can run the REAL integer GEMM:

    y = s_a * (x_int @ w_int^T) * s_w_row (+ bias)
    x_int = clip(round(x/s_a) + zp_a, 0, 2N-1) - zp_a      in [-2N+1, 2N-1]
    w_int = clip(round(w/s_w) + zp_w, 0, 2N-1) - zp_w      per row group

For bit widths <= 7 both operands fit int8 and the int32 accumulation is
EXACT — bit-identical integer products, no fp rounding inside the GEMM (the
fp fake-quant path rounds every product to fp32). Enabled via
Config.eval_int8 / set_enabled().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False


def set_enabled(flag: bool):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled() -> bool:
    return _ENABLED


def supports(site, mode: str) -> bool:
    """Uniform asymmetric per-tensor activations + uniform weights, both
    narrow enough for int8 operands."""
    if not enabled() or mode != "quant":
        return False
    aq, wq = site.aq, site.wq
    return (aq.kind == "uniform" and not aq.symmetric and aq.scale.size == 1
            and aq.bits <= 7 and wq.bits <= 7 and wq.alpha is None)


def int8_qlinear(p, site, x):
    """Integer-arithmetic forward for a uniform Linear site.

    x: (..., I); returns (..., O) in x.dtype. Exactly equivalent to the
    fake-quant path (integer products are exact; the final scaling is the
    same fp multiply the fake-quant path applies before its GEMM).
    """
    aq, wq = site.aq, site.wq
    Na = 2 ** (aq.bits - 1)
    Nw = 2 ** (wq.bits - 1)

    azp = jnp.round(aq.zero_point.reshape(()))
    a_scale = aq.scale.reshape(())
    x32 = x.astype(jnp.float32)
    x_codes = jnp.clip(jnp.round(x32 / a_scale) + azp, 0, 2 * Na - 1)
    x_int = (x_codes - azp).astype(jnp.int8)

    O, I = p.w.shape
    V = site.n_V
    w_v = p.w.reshape(V, O // V, I).astype(jnp.float32)
    w_scale = wq.scale
    w_zp = jnp.round(wq.zero_point)
    w_codes = jnp.clip(jnp.round(w_v / w_scale) + w_zp, 0, 2 * Nw - 1)
    w_int = (w_codes - w_zp).astype(jnp.int8).reshape(O, I)
    s_row = (jnp.broadcast_to(w_scale, (V, O // V, 1))
             .reshape(O).astype(jnp.float32))

    acc = jax.lax.dot_general(
        x_int, w_int, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale * s_row)
    if p.b is not None:
        y = y + p.b.astype(jnp.float32)
    return y.astype(x.dtype)
