#!/usr/bin/env python
"""On-chip drift + timing probe for bf16 spill capture (VERDICT item 6).

Forces the capture-spill path on deit_small (budget 1 GB < its ~3.5 GB
capture) and runs the full W4A4 calibration twice — fp32 taps vs bf16 taps —
comparing selections, end-to-end quantized output quality, and wall-clock.

  nohup python scripts/probe_spill_dtype.py > /tmp/probe_spill.log 2>&1 &
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(message)s",
                        stream=sys.stderr, force=True)

    from adalog_tpu.models.zoo import build_model, model_forward_fn
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    print(f"devices: {jax.devices()}", flush=True)
    model = os.environ.get("SPILL_MODEL", "deit_small")
    spec, params = build_model(model, seed=0)
    img = spec.cfg.img_size
    rng = np.random.default_rng(0)
    batches = [rng.standard_normal((32, img, img, 3)).astype(np.float32)]

    results = {}
    states = {}
    for sd in ("float32", "bfloat16"):
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                     capture_device_budget_bytes=1 << 30,
                     capture_spill_dtype=sd, streaming_calib="off")
        t0 = time.time()
        calib = QuantCalibrator(spec, params, cfg)
        p, q = calib.calibrate(batches)
        p, q = calib.finish_calibration()
        hq = jax.tree_util.tree_map(np.asarray, q)
        hp = jax.tree_util.tree_map(np.asarray, p)
        dt = time.time() - t0
        states[sd] = (hp, hq)
        results[f"calib_s_{sd}"] = round(dt, 1)
        print(f"SPILL probe [{sd}]: {dt:.1f}s", flush=True)
        time.sleep(5)

    p32, q32 = states["float32"]
    p16, q16 = states["bfloat16"]
    n_eq = tot = 0
    qmis = 0
    for nm in q32:
        l32 = jax.tree_util.tree_leaves(q32[nm])
        l16 = jax.tree_util.tree_leaves(q16[nm])
        tot += len(l32)
        n_eq += sum(np.array_equal(a, b) for a, b in zip(l32, l16))
        for attr in ("aq", "Aq"):
            z32 = getattr(q32[nm], attr, None)
            z16 = getattr(q16[nm], attr, None)
            if z32 is not None and getattr(z32, "log_q", None) is not None \
                    and not np.array_equal(z32.log_q, z16.log_q):
                qmis += 1
    results["leaves_equal"] = f"{n_eq}/{tot}"
    results["log_q_mismatches"] = qmis

    fwd = model_forward_fn(spec)
    x = jax.numpy.asarray(batches[0][:8])
    y_raw = np.asarray(fwd(spec.cfg, params, x))

    def rel(p, q):
        y = np.asarray(fwd(spec.cfg, jax.tree_util.tree_map(
            jax.numpy.asarray, p), x, q, {"*": "quant"}))
        return float(np.linalg.norm(y - y_raw) / np.linalg.norm(y_raw))

    results["quant_rel_err_float32"] = rel(p32, q32)
    results["quant_rel_err_bfloat16"] = rel(p16, q16)
    print("SPILL_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
