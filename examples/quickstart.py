#!/usr/bin/env python
"""Quickstart: calibrate, reconstruct, evaluate and export a quantized ViT.

Runs end-to-end on synthetic data with the tiny fixture model so it completes
in ~a minute anywhere; swap the model name / loader for real use:

    python examples/quickstart.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu import Config, QuantCalibrator, BlockReconstructor, \
    build_model, model_forward_fn
from adalog_tpu.calib.layout import quant_layout
from adalog_tpu.utils.export import export_quantized
from adalog_tpu.utils.diagnostics import site_error_report, log_report

import logging
logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    # 1) model + config (use "deit_small" + checkpoint_path=... for real runs)
    spec, params = build_model("test_tiny", seed=0)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                 eq_n=32, steps=2, search_round=1,          # tiny-run settings
                 recon_iters=50, optim_batch_size=4)
    params_fp32 = params  # pristine twin for BRECQ targets

    # 2) calibration data (swap for ImageNetLoader(...).calib_batches(...))
    rng = np.random.default_rng(0)
    batches = [rng.standard_normal((8, 32, 32, 3)).astype(np.float32)]

    # 3) FPCS calibration
    calib = QuantCalibrator(spec, params, cfg)
    params, qstate = calib.calibrate(batches)

    # 4) BRECQ block reconstruction (optional)
    recon = BlockReconstructor(spec, params, params_fp32, qstate,
                               quant_layout(spec, cfg), cfg)
    params, qstate = recon.reconstruct(batches, quant_act=cfg.train_act)
    calib.params, calib.qstate = params, dict(qstate)
    params, qstate = calib.finish_calibration()

    # 5) quantized inference
    fwd = model_forward_fn(spec)
    x = jnp.asarray(batches[0])
    logits = fwd(spec.cfg, params, x, qstate, {"*": "quant"})
    print("quantized logits:", np.asarray(logits)[0, :5])

    # 6) where does the quantization error live?
    log_report(site_error_report(spec, params, qstate,
                                 quant_layout(spec, cfg), batches), top=5)

    # 7) serving export (StableHLO)
    blob = export_quantized(spec, params, qstate, batch_size=8)
    print(f"exported artifact: {len(blob)} bytes")


if __name__ == "__main__":
    main()
