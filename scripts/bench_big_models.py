#!/usr/bin/env python
"""Full calibration of the big models on the real TPU (VERDICT item 6).

Runs the complete W4A4 FPCS calibration for vit_large / swin_base_384 with
the shipped config sizes (calib_size 32), exercising the capture-spill path
end-to-end (their capture footprints — ~15 / ~32 GB — exceed the 8 GB
device budget, so taps spill to host and re-upload per search). Logs
wall-clock per phase and whether spill actually triggered.

Usage: BIG_MODEL=vit_large python scripts/bench_big_models.py
"""

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

    model = os.environ.get("BIG_MODEL", "vit_large")
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    # BIG_SPILL_DTYPE=bfloat16 halves the host<->device spill transfers
    cfg.capture_spill_dtype = os.environ.get("BIG_SPILL_DTYPE",
                                             cfg.capture_spill_dtype)
    # BIG_CAPTURE_DTYPE=bfloat16 halves the ON-DEVICE capture footprint —
    # vit_large's 15 GB fp32 tap set becomes 7.5 GB and never spills at all
    cfg.capture_dtype = os.environ.get("BIG_CAPTURE_DTYPE", cfg.capture_dtype)
    # BIG_A_GRAM=1 enables Gram-form activation/matmul scoring (selection
    # safety probed at deit scale — scripts/probe_a_gram.py; slower there
    # because deit search is dispatch-bound, to be probed at these scales)
    if os.environ.get("BIG_A_GRAM"):
        cfg.a_search_gram = True
    # BIG_STREAMING=off disables the streaming capture waves (the default
    # 'auto' streams exactly when one-pass capture would spill to host —
    # swin_base_384's 32 GB fp32 taps become 4 on-device waves)
    cfg.streaming_calib = os.environ.get("BIG_STREAMING",
                                         cfg.streaming_calib)
    spec, params = build_model(model, seed=0)
    img = spec.cfg.img_size

    rng = np.random.default_rng(0)
    # batch per calib step sized to the shipped calib_batch_size
    bs = cfg.calib_batch_size
    batches = [rng.standard_normal((bs, img, img, 3)).astype(np.float32)
               for _ in range(cfg.calib_size // bs)]

    t0 = time.time()
    # .rs2 = the v2 framed-npz resume format; a stale round-2 .pkl at the old
    # path would be rejected loudly and kill the run
    calib = QuantCalibrator(spec, params, cfg,
                            resume_path=f"/tmp/{model}_resume.rs2")
    new_params, qstate = calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    jax.block_until_ready(jax.tree_util.tree_leaves(qstate)[0])
    _ = np.asarray(jax.tree_util.tree_leaves(qstate)[0])
    dt = time.time() - t0
    print(f"BIG_RESULT {model}: full W4A4 calibration in {dt:.1f}s "
          f"({len(qstate)} sites)", flush=True)


if __name__ == "__main__":
    main()
