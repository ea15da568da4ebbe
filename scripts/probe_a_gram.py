#!/usr/bin/env python
"""On-chip probe: Gram-form activation scoring (a_search_gram) vs direct.

The activation output-MSE scorer is the last full-GEMM-per-candidate path in
the default Linear search (weight candidates already score through the Gram
form). At sites with out_features > in_features (qkv 3x, fc1 4x, head ~2.6x)
the Gram form cuts the per-candidate FLOPs by O/I; this script measures, on
real deit_small shapes at the shipped config, whether selections drift and
what it does to wall-clock.

Run on the TPU (nohup + poll; see CLAUDE.md relay hazards):
  nohup python scripts/probe_a_gram.py > /tmp/probe_a_gram.log 2>&1 &
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_calib(a_gram: bool, spec, params, batches):
    import jax
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                 a_search_gram=a_gram)
    if os.environ.get("PROBE_SMOKE"):     # CPU smoke-test of this script
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1, a_search_gram=a_gram)
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
    # second run reuses warm caches for everything the flag doesn't retrace,
    # so run direct first: the a_gram run only pays compiles for the gated
    # programs (qkv/fc1/head groups)
    for flag in (False, True):
        tag = "a_gram" if flag else "direct"
        p, q, layout, dt = run_calib(flag, spec, params, batches)
        states[tag] = (p, q)
        results[f"calib_s_{tag}"] = round(dt, 1)
        print(f"PROBE calibration [{tag}]: {dt:.1f}s", flush=True)
        time.sleep(5)

    p_d, q_d = states["direct"]
    p_g, q_g = states["a_gram"]

    fam = {}
    for nm, ss in layout.items():
        s_d, s_g = q_d[nm], q_g[nm]
        l_d = jax.tree_util.tree_leaves(s_d)
        l_g = jax.tree_util.tree_leaves(s_g)
        f = fam.setdefault(ss.kind, {"sites": 0, "leaves": 0, "leaves_eq": 0,
                                     "q_mismatch": 0})
        f["sites"] += 1
        f["leaves"] += len(l_d)
        f["leaves_eq"] += sum(np.array_equal(a, b)
                              for a, b in zip(l_d, l_g))
        for attr in ("aq", "Aq"):
            z_d = getattr(s_d, attr, None)
            z_g = getattr(s_g, attr, None)
            if z_d is not None and getattr(z_d, "log_q", None) is not None \
                    and not np.array_equal(z_d.log_q, z_g.log_q):
                f["q_mismatch"] += 1
    results["families"] = fam

    fwd = model_forward_fn(spec)
    x = jax.numpy.asarray(batches[0][:8])
    y_raw = np.asarray(fwd(spec.cfg, params, x))

    def rel_err(p, q):
        y = np.asarray(fwd(spec.cfg, jax.tree_util.tree_map(
            jax.numpy.asarray, p), x, q, {"*": "quant"}))
        return float(np.linalg.norm(y - y_raw) / np.linalg.norm(y_raw))

    results["quant_rel_err_direct"] = rel_err(p_d, q_d)
    results["quant_rel_err_a_gram"] = rel_err(p_g, q_g)

    print("A_GRAM_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
