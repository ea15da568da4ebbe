#!/usr/bin/env python
"""Per-family probe: default-precision scoring GEMMs vs HIGHEST (on real TPU).

The candidate-scoring GEMMs historically ran at precision=HIGHEST (~14 TFLOP/s
achieved fp32 on v5e) to reproduce the reference's exact-fp32 CUDA numerics.
DEFAULT precision runs the MXU's native fp32 path (~46 TFLOP/s) with fp32
ACCUMULATION — only operand mantissas are rounded — so argmax-compared
candidate rankings should flip only at near-ties. This script measures, per
search family, whether the SELECTIONS actually change on real deit_small
shapes, and what it does to wall-clock and end-to-end quantized output.

Run on the TPU (nohup + poll; see CLAUDE.md relay hazards):
  nohup python scripts/probe_precision.py > /tmp/probe_prec.log 2>&1 &
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_calib(precision: str, spec, params, batches):
    import jax
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                 search_precision=precision)
    if os.environ.get("PROBE_SMOKE"):     # CPU smoke-test of this script
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1, search_precision=precision)
    t0 = time.time()
    calib = QuantCalibrator(spec, params, cfg)
    new_params, qstate = calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    host_q = jax.tree_util.tree_map(np.asarray, qstate)   # true sync
    host_p = jax.tree_util.tree_map(np.asarray, new_params)
    dt = time.time() - t0
    return host_p, host_q, calib.layout, dt


def main():
    import jax
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(message)s",
                        stream=sys.stderr, force=True)

    from adalog_tpu.models.zoo import build_model, model_forward_fn

    print(f"devices: {jax.devices()}", flush=True)
    model = os.environ.get("PROBE_MODEL", "deit_small")
    spec, params = build_model(model, seed=0)
    rng = np.random.default_rng(0)
    img = spec.cfg.img_size
    n = int(os.environ.get("PROBE_CALIB", "32"))
    batches = [rng.standard_normal((n, img, img, 3)).astype(np.float32)]

    results = {}
    states = {}
    order = os.environ.get("PROBE_ORDER", "highest,default").split(",")
    for prec in order:
        p, q, layout, dt = run_calib(prec, spec, params, batches)
        states[prec] = (p, q)
        results[f"calib_s_{prec}"] = round(dt, 1)
        print(f"PROBE calibration [{prec}]: {dt:.1f}s", flush=True)
        time.sleep(5)

    layout_kinds = {nm: ss.kind for nm, ss in layout.items()}
    p_hi, q_hi = states["highest"]
    p_df, q_df = states["default"]

    # --- per-family selection comparison ---
    fam = {}
    for nm, kind in layout_kinds.items():
        s_hi, s_df = q_hi[nm], q_df[nm]
        leaves_hi = jax.tree_util.tree_leaves(s_hi)
        leaves_df = jax.tree_util.tree_leaves(s_df)
        n_eq = sum(np.array_equal(a, b)
                   for a, b in zip(leaves_hi, leaves_df))
        rel = 0.0
        for a, b in zip(leaves_hi, leaves_df):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            if a.shape != b.shape:
                rel = np.inf
                continue
            denom = np.maximum(np.abs(a), 1e-12)
            if a.size:
                rel = max(rel, float(np.max(np.abs(a - b) / denom)))
        f = fam.setdefault(kind, {"sites": 0, "leaves": 0, "leaves_eq": 0,
                                  "max_rel": 0.0, "q_mismatch": 0})
        f["sites"] += 1
        f["leaves"] += len(leaves_hi)
        f["leaves_eq"] += n_eq
        f["max_rel"] = max(f["max_rel"], rel)
        # integer log-base comparisons where present
        for attr in ("aq", "Aq"):
            qz_hi = getattr(s_hi, attr, None)
            qz_df = getattr(s_df, attr, None)
            if qz_hi is not None and getattr(qz_hi, "log_q", None) is not None:
                if not np.array_equal(qz_hi.log_q, qz_df.log_q):
                    f["q_mismatch"] += 1
    results["families"] = fam

    # --- end-to-end objective check: quantized output vs raw, both ---
    fwd = model_forward_fn(spec)
    x = jax.numpy.asarray(batches[0][:8])
    y_raw = np.asarray(fwd(spec.cfg, params, x))

    def rel_err(p, q):
        y = np.asarray(fwd(spec.cfg, jax.tree_util.tree_map(
            jax.numpy.asarray, p), x, q, {"*": "quant"}))
        return float(np.linalg.norm(y - y_raw) / np.linalg.norm(y_raw))

    results["quant_rel_err_highest"] = rel_err(p_hi, q_hi)
    results["quant_rel_err_default"] = rel_err(p_df, q_df)

    print("PROBE_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
