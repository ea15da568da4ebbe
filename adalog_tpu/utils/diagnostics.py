"""Per-site quantization error diagnostics.

The reference exposes debug modes (debug_only_quant_weight / debug_only_quant
_act, linear.py:31-34) for manual per-layer ablation. This tool productizes
them: for every calibrated site, compute the layer-local output error of
weight-only, activation-only, and full quantization against the raw capture —
one report for the whole model from a single capture pass. Used to locate the
layers that dominate accuracy loss at low bit widths.

Note: run BEFORE the post-GeLU bias fold for cleanest fc2 numbers — after the
fold, a_only mixes raw weights with a bias compensated for quantized weights
(the reference's debug modes have the same post-reparam_bias artifact).
"""

from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from adalog_tpu.models.layers import (
    LinearSite, ConvSite, MatMulSite, qlinear, qconv2d, qmatmul,
)
from adalog_tpu.calib.layout import tree_get
from adalog_tpu.calib.calibrator import capture_all_sites, _flat2d

log = logging.getLogger("adalog_tpu")


def _rel(err, ref):
    denom = float(jnp.linalg.norm(ref))
    return float(jnp.linalg.norm(err)) / max(denom, 1e-12)


def site_error_report(spec, params, qstate, layout, batches) -> List[Dict]:
    """Returns one row per site: relative layer-output error under
    w_only / a_only / quant modes, computed on the calibration capture."""
    taps = capture_all_sites(spec, params, batches)
    rows = []
    for name, site in qstate.items():
        tap = taps.get(name)
        if tap is None:
            continue
        ss = layout[name]
        row = {"site": name, "kind": ss.kind}
        if isinstance(site, MatMulSite):
            A, B, y = tap
            for mode in ("quant",):
                out = qmatmul(site, jnp.asarray(A), jnp.asarray(B), mode=mode)
                row[mode] = _rel(out - y, y)
            row["w_only"] = row["a_only"] = None
        else:
            x, y = jnp.asarray(tap[0]), jnp.asarray(tap[1])
            p = tree_get(params, ss.param_path)
            fn = qconv2d if isinstance(site, ConvSite) else qlinear
            for mode in ("w_only", "a_only", "quant"):
                out = fn(p, site, x, mode=mode)
                row[mode] = _rel(out - y, y)
        rows.append(row)
        taps[name] = None
    return rows


def log_report(rows: List[Dict], top: int = 10):
    rows_sorted = sorted(rows, key=lambda r: -(r.get("quant") or 0.0))
    log.info("%-40s %-14s %8s %8s %8s", "site", "kind", "w_only", "a_only",
             "quant")
    for r in rows_sorted[:top]:
        log.info("%-40s %-14s %8s %8s %8s", r["site"], r["kind"],
                 *(f"{r[k]:.4f}" if r[k] is not None else "-"
                   for k in ("w_only", "a_only", "quant")))
