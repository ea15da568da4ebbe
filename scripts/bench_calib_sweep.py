#!/usr/bin/env python
"""Calibration wall-clock sweep on the real TPU (one variant per invocation).

Env knobs: SWEEP_BATCH_SITES=0/1, SWEEP_GRAM=0/1, SWEEP_DTYPE=float32/bfloat16.
Prints per-site INFO timings and a final `SWEEP_RESULT {...}` line.
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

    from adalog_tpu.models.zoo import build_model
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    batch_sites = os.environ.get("SWEEP_BATCH_SITES", "1") == "1"
    gram = os.environ.get("SWEEP_GRAM", "0") == "1"
    sdtype = os.environ.get("SWEEP_DTYPE", "float32")

    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                 w_search_gram=gram, search_dtype=sdtype)
    cfg.batch_sites = batch_sites
    spec, params = build_model("deit_small", seed=0)

    rng = np.random.default_rng(0)
    batches = [rng.standard_normal((32, 224, 224, 3)).astype(np.float32)]

    t0 = time.time()
    calib = QuantCalibrator(spec, params, cfg)
    new_params, qstate = calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    jax.block_until_ready(jax.tree_util.tree_leaves(qstate)[0])
    # force a real sync through the tunnel (CLAUDE.md hazard)
    _ = np.asarray(jax.tree_util.tree_leaves(qstate)[0])
    dt = time.time() - t0
    print("SWEEP_RESULT " + json.dumps({
        "batch_sites": batch_sites, "gram": gram, "dtype": sdtype,
        "calib_s": round(dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
