"""Load-time materialization of fake-quantized Linear weights.

The fake-quant eval forward recomputes ``w_q = dequant(quant(w))`` on every
call — round/clip/scale over the full O×I matrix, pure VPU + HBM work the
GEMM itself does not need (the reference recomputes it per batch too,
quant_layers/linear.py:46-51). When the predictor used to CLOSE OVER the
weights, XLA constant-folded that whole computation at compile time; passing
weights as jit arguments (required past ~400 MB — see serve.make_predictor)
un-folds it, measured -10% end-to-end at deit_base. This module restores the
fold at LOAD time: quantized weights are computed once per checkpoint and
threaded through the jitted forward as traced arguments, so the executable
stays weight-free and the runtime GEMM consumes ready weights.

Same activation pattern as ops/int8_linear: the table is consulted only
inside ``activate(table)`` (entered within the traced body, making the
prepared arrays traced args of that very trace), keyed by site name with a
shape guard so tensor-parallel weight shards fall back to per-call quant.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

_ACTIVE = None


@contextmanager
def activate(table):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = table
    try:
        yield
    finally:
        _ACTIVE = prev


def lookup(name, shape):
    """The prepared quantized weight for site ``name`` (or None). The shape
    guard rejects device-local tp shards of a full-model table."""
    if name is None or _ACTIVE is None:
        return None
    hit = _ACTIVE.get(name)
    if hit is not None and hit.shape == shape:
        return hit
    return None


def prepare(spec, params, qstate, cfg, *, skip=()) -> dict:
    """{site_name: w_fakequant} for every Linear site, computed from the
    SAME (already cast) params the predictor will run — bit-identical to
    what the per-call path would produce. ``skip``: site names another
    prepared path already owns (int8 codes take precedence in qlinear, so
    materializing their fp weights too would only burn HBM)."""
    from adalog_tpu.calib.layout import quant_layout, tree_get
    from adalog_tpu.models.layers import LinearSite, quant_linear_weight

    table = {}
    layout = quant_layout(spec, cfg)
    for nm, ss in layout.items():
        if nm in skip:
            continue
        site = qstate.get(nm)
        if not isinstance(site, LinearSite) or site.wq.bits == 32:
            continue
        p = tree_get(params, ss.param_path)
        table[nm] = quant_linear_weight(p, site)
    return table
