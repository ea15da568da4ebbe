#!/usr/bin/env python
"""On-chip wall-clock for the optimize phase (BRECQ block reconstruction).

The north-star target (BASELINE.json) covers calibration+BRECQ wall-clock;
bench.py times calibration, this times the reconstruction stage on the real
TPU at the shipped config (reference: block_recon.py:84-137 — 20,000 Adam
iters per block, optim batch 32, act-scale lr 4e-5 cosine).

Usage:
  BRECQ_MODEL=deit_small [BRECQ_OPTIM_SIZE=1024] [BRECQ_ITERS=20000] \
      [BRECQ_BLOCK_GROUP=1] [BRECQ_RESUME=/tmp/brecq_resume.bin] \
      [BRECQ_STOP_AFTER=N] python scripts/bench_brecq.py
Prints BRECQ_RESULT <model>: calib <s> + recon <s> (<blocks> block units).

BRECQ_STOP_AFTER=N exits the process cleanly after N blocks have been
reconstructed AND recorded to the resume log — the controlled stand-in for
a killed run (same resume records a SIGKILL would leave behind, without
risking a mid-RPC kill that wedges the relay claim; CLAUDE.md hazards).
Re-running with the same BRECQ_RESUME then proves per-block resume: the log
shows "resumed N reconstructed blocks" and reconstruction continues at
block N+1.
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
    from adalog_tpu.recon.brecq import BlockReconstructor

    model = os.environ.get("BRECQ_MODEL", "deit_small")
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    cfg.optim_size = int(os.environ.get("BRECQ_OPTIM_SIZE", cfg.optim_size))
    cfg.recon_iters = int(os.environ.get("BRECQ_ITERS",
                                         getattr(cfg, "recon_iters", 20000)))
    # 4-block vmapped groups stack ~2.5 GB of cached block IO at deit_small /
    # optim 1024 — past the ~1 GB line that crashes the v5e worker (see
    # batch_group_bytes); default to ungrouped on-chip
    cfg.recon_block_group = int(os.environ.get("BRECQ_BLOCK_GROUP", 1))
    spec, params = build_model(model, seed=0)
    params_full = params
    img = spec.cfg.img_size

    rng = np.random.default_rng(0)
    bs = cfg.calib_batch_size
    calib_batches = [rng.standard_normal((bs, img, img, 3)).astype(np.float32)
                     for _ in range(cfg.calib_size // bs)]
    obs = min(cfg.optim_batch_size, cfg.optim_size)
    optim_batches = [rng.standard_normal(
        (obs, img, img, 3)).astype(np.float32)
        for _ in range(max(1, cfg.optim_size // obs))]

    resume = os.environ.get("BRECQ_RESUME", "/tmp/brecq_resume.bin")
    stop_after = int(os.environ.get("BRECQ_STOP_AFTER", "0"))

    t0 = time.time()
    calib = QuantCalibrator(spec, params, cfg,
                            resume_path=resume + ".calib")
    params, qstate = calib.calibrate(calib_batches)
    jax.block_until_ready(jax.tree_util.tree_leaves(qstate)[-1])
    _ = np.asarray(jax.tree_util.tree_leaves(qstate)[-1])
    t_calib = time.time() - t0

    t1 = time.time()
    recon = BlockReconstructor(spec, params, params_full, qstate,
                               calib.layout, cfg, resume_path=resume)
    if stop_after:
        real_record, n_done = recon._record_block, [0]

        def record_and_maybe_stop(unit):
            real_record(unit)
            n_done[0] += 1
            if n_done[0] >= stop_after:
                print(f"BRECQ_STOPPED after {stop_after} recorded blocks "
                      f"(controlled kill; resume log: {resume})", flush=True)
                sys.exit(0)
        recon._record_block = record_and_maybe_stop
    params, qstate = recon.reconstruct(optim_batches, quant_act=cfg.train_act)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[-1])
    _ = np.asarray(jax.tree_util.tree_leaves(params)[-1])
    t_recon = time.time() - t1

    # finish (post-GeLU bias fold), save the optimized checkpoint, reload it
    # and validate the reconstructed model on the calib set (quantized output
    # must track the FP32 model; reference flow test_quant.py:228-240)
    calib.params, calib.qstate = params, dict(qstate)
    params, qstate = calib.finish_calibration()
    from adalog_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                             checkpoint_name)
    from adalog_tpu.models.zoo import model_forward_fn
    ck = "/tmp/" + checkpoint_name(model, cfg, "optimize")
    save_checkpoint(ck, params, qstate)
    p2, q2, _ = load_checkpoint(ck)
    fwd = model_forward_fn(spec)
    xb = jax.numpy.asarray(calib_batches[0])
    y_raw = np.asarray(fwd(spec.cfg, params_full, xb))
    y_q = np.asarray(fwd(spec.cfg, p2, xb, q2, {"*": "quant"}))
    rel = float(np.linalg.norm(y_q - y_raw) / np.linalg.norm(y_raw))
    print(f"BRECQ_VALIDATE {model}: reloaded-checkpoint quant-vs-raw rel err "
          f"{rel:.4f} on the calib set", flush=True)

    print(f"BRECQ_RESULT {model}: calib {t_calib:.1f}s + recon {t_recon:.1f}s "
          f"(iters={cfg.recon_iters}, optim_size={cfg.optim_size})",
          flush=True)


if __name__ == "__main__":
    main()
