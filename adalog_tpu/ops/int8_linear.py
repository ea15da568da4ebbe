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

Weight codes can be materialized ONCE at load time (``prepare``) instead of
recomputed inside every forward (round/clip over the full O*I matrix is pure
HBM traffic + VPU work the GEMM does not need — the codes are a constant of
the checkpoint). ``prepare`` returns a plain table the caller owns; it is
consulted only while ``activate(table)`` is entered, so two concurrently
loaded models can never see each other's codes (a lazily-traced predictor
bakes whatever table is active at ITS first call — with a process-global
registry a second load would silently rebind it).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_ENABLED = False

# The table active for the predictor currently tracing/executing, or None.
# Set only via activate(); never mutated in place.
_ACTIVE = None


def set_enabled(flag: bool):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled() -> bool:
    return _ENABLED


@contextmanager
def activate(table):
    """Make ``table`` (a ``prepare()`` result, or None for a no-op) visible
    to int8_qlinear for the duration — including jit TRACE time, which is
    when the codes are baked into the executable as constants."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = table
    try:
        yield
    finally:
        _ACTIVE = prev


def weight_codes(p, site, cast_dtype=None):
    """Integer weight codes + per-row scales for a uniform Linear site.
    Exactly the per-call math of int8_qlinear, hoisted. ``cast_dtype``
    first casts the master weights to the eval dtype (the per-call path
    sees params already cast by the predictor — codes must be derived from
    the SAME values or they can differ at rounding boundaries)."""
    wq = site.wq
    Nw = 2 ** (wq.bits - 1)
    w = p.w if cast_dtype is None else p.w.astype(cast_dtype)
    O, I = w.shape
    V = site.n_V
    w_v = w.reshape(V, O // V, I).astype(jnp.float32)
    w_zp = jnp.round(wq.zero_point)
    w_codes = jnp.clip(jnp.round(w_v / wq.scale) + w_zp, 0, 2 * Nw - 1)
    w_int = (w_codes - w_zp).astype(jnp.int8).reshape(O, I)
    s_row = (jnp.broadcast_to(wq.scale, (V, O // V, 1))
             .reshape(O).astype(jnp.float32))
    return w_int, s_row


def prepare(spec, params, qstate, cfg, cast_dtype=None) -> dict:
    """Materialize weight codes for every eligible Linear site of a loaded
    model; returns ``{site_name: (w_int, s_row)}``. Pure — the caller keeps
    the table and enters ``activate(table)`` around predictor calls.
    ``cast_dtype``: the predictor's eval dtype (str or jnp dtype), so the
    codes match what the per-call path would compute on cast weights."""
    from adalog_tpu.calib.layout import quant_layout, tree_get
    from adalog_tpu.models.layers import LinearSite

    if isinstance(cast_dtype, str):
        cast_dtype = jnp.bfloat16 if cast_dtype == "bfloat16" else None
    table = {}
    layout = quant_layout(spec, cfg)
    for nm, ss in layout.items():
        site = qstate.get(nm)
        if not isinstance(site, LinearSite) or not supports(site, "quant",
                                                            _force=True):
            continue
        p = tree_get(params, ss.param_path)
        table[nm] = weight_codes(p, site, cast_dtype=cast_dtype)
    return table


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
    same fp multiply the fake-quant path applies before its GEMM). When a
    prepared table is active and holds ``name``, the weight codes come from
    it (constants of the jitted program) instead of being recomputed per
    call.
    """
    aq = site.aq
    Na = 2 ** (aq.bits - 1)

    azp = jnp.round(aq.zero_point.reshape(()))
    a_scale = aq.scale.reshape(())
    x32 = x.astype(jnp.float32)
    x_codes = jnp.clip(jnp.round(x32 / a_scale) + azp, 0, 2 * Na - 1)
    x_int = (x_codes - azp).astype(jnp.int8)

    w_int = s_row = None
    if name is not None and _ACTIVE is not None:
        hit = _ACTIVE.get(name)
        # Under tensor parallelism p.w is the device-local (O/tp, I) or
        # (O, I/tp) shard while the table holds full-model codes — the
        # shapes disagree, so requantize the local shard instead.
        if hit is not None and hit[0].shape == p.w.shape:
            w_int, s_row = hit
    if w_int is None:
        w_int, s_row = weight_codes(p, site)

    acc = jax.lax.dot_general(
        x_int, w_int, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale * s_row)
    if p.b is not None:
        y = y + p.b.astype(jnp.float32)
    return y.astype(x.dtype)
