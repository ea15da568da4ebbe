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

# name -> (w_int int8 (O, I), s_row fp32 (O,)): weight codes materialized
# ONCE at load time. Without this the fake->int conversion of the WEIGHTS
# (round/clip over the full O*I matrix) re-runs inside every forward — pure
# HBM traffic + VPU work the GEMM does not need (the codes are a constant of
# the checkpoint). Populated by prepare(); consulted by int8_qlinear when a
# site name is given.
_PREP: dict = {}


def set_enabled(flag: bool):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled() -> bool:
    return _ENABLED


def weight_codes(p, site):
    """Integer weight codes + per-row scales for a uniform Linear site.
    Exactly the per-call math of int8_qlinear, hoisted."""
    wq = site.wq
    Nw = 2 ** (wq.bits - 1)
    O, I = p.w.shape
    V = site.n_V
    w_v = p.w.reshape(V, O // V, I).astype(jnp.float32)
    w_zp = jnp.round(wq.zero_point)
    w_codes = jnp.clip(jnp.round(w_v / wq.scale) + w_zp, 0, 2 * Nw - 1)
    w_int = (w_codes - w_zp).astype(jnp.int8).reshape(O, I)
    s_row = (jnp.broadcast_to(wq.scale, (V, O // V, 1))
             .reshape(O).astype(jnp.float32))
    return w_int, s_row


def prepare(spec, params, qstate, cfg) -> int:
    """Materialize weight codes for every eligible Linear site; returns the
    number prepared. Codes are computed from the fp32 master weights (same
    values the fake-quant path would produce every call)."""
    from adalog_tpu.calib.layout import quant_layout, tree_get
    from adalog_tpu.models.layers import LinearSite

    _PREP.clear()
    layout = quant_layout(spec, cfg)
    for nm, ss in layout.items():
        site = qstate.get(nm)
        if not isinstance(site, LinearSite) or not supports(site, "quant",
                                                            _force=True):
            continue
        p = tree_get(params, ss.param_path)
        _PREP[nm] = weight_codes(p, site)
    return len(_PREP)


def clear_prepared():
    _PREP.clear()


def supports(site, mode: str, _force: bool = False) -> bool:
    """Uniform asymmetric per-tensor activations + uniform weights, both
    narrow enough for int8 operands."""
    if not (_force or enabled()) or mode != "quant":
        return False
    aq, wq = site.aq, site.wq
    return (aq.kind == "uniform" and not aq.symmetric and aq.scale.size == 1
            and aq.bits <= 7 and wq.bits <= 7 and wq.alpha is None)


def int8_qlinear(p, site, x, name=None):
    """Integer-arithmetic forward for a uniform Linear site.

    x: (..., I); returns (..., O) in x.dtype. Exactly equivalent to the
    fake-quant path (integer products are exact; the final scaling is the
    same fp multiply the fake-quant path applies before its GEMM). When
    ``name`` has been prepare()d, the weight codes come from the registry
    (constants of the jitted program) instead of being recomputed per call.
    """
    aq = site.aq
    Na = 2 ** (aq.bits - 1)

    azp = jnp.round(aq.zero_point.reshape(()))
    a_scale = aq.scale.reshape(())
    x32 = x.astype(jnp.float32)
    x_codes = jnp.clip(jnp.round(x32 / a_scale) + azp, 0, 2 * Na - 1)
    x_int = (x_codes - azp).astype(jnp.int8)

    if name is not None and name in _PREP:
        w_int, s_row = _PREP[name]
    else:
        w_int, s_row = weight_codes(p, site)

    acc = jax.lax.dot_general(
        x_int, w_int, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale * s_row)
    if p.b is not None:
        y = y + p.b.astype(jnp.float32)
    return y.astype(x.dtype)
