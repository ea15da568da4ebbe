#!/usr/bin/env python
"""Localize the midscale BRECQ fork (blocks 5/6/8 at ~1.5x ref rec error,
/tmp/r5_brecq_probe.log) to its calibrate-stage origin.

Runs OUR calibrate only (deterministic on CPU — the same state the failing
test computed), then reports per block:
  - AdaLog bases (post-softmax matmul2.Aq, post-GeLU fc2.aq) vs the
    calibrate fixture's reference picks,
  - the post-GeLU quantizer KIND after the downgrade decision,
  - block rec error at the CALIBRATE state (pre-BRECQ) on pristine I/O —
    if 5/6/8 are already elevated here, BRECQ merely inherits the fork.

Usage: JAX_PLATFORMS=cpu python scripts/probe_midscale_brecq_fork.py
"""

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)

import midscale_differential as md  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig, vit_forward
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.recon.brecq import capture_block_io
    from adalog_tpu.recon.blocks import block_units

    fx = np.load(md.BRECQ_FIXTURE, allow_pickle=False)
    fx_cal = np.load(md.FIXTURES[0], allow_pickle=False)
    meta = json.loads(str(fx["meta"]))

    seed_model, seed_data = md.SEEDS[0]
    tm = md.make_model(seed_model)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = md.make_data(seed_data, meta["val_n"])

    cfg_j = ViTConfig(img_size=md.IMG, patch_size=md.PATCH, dim=md.DIM,
                      depth=md.DEPTH, heads=md.HEADS, num_classes=md.CLASSES)

    class Spec:
        family = "vit"
        cfg = cfg_j

    params = load_vit(cfg_j, sd)
    params_full = jax.tree_util.tree_map(lambda a: a, params)
    cfg = Config(w_bit=md.BITS, a_bit=md.BITS, s_bit=md.BITS,
                 qhead_a_bit=md.BITS, eq_n=md.EQ_N, search_round=md.ROUNDS,
                 steps=md.STEPS)
    calib = QuantCalibrator(Spec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])
    # NOTE: calibrate state pre-finish (matches the optimize flow convention)

    q_post = [float(qstate[f"blocks.{i}.attn.matmul2"].Aq.log_q)
              for i in range(md.DEPTH)]
    q_gelu = [float(qstate[f"blocks.{i}.mlp.fc2"].aq.log_q)
              for i in range(md.DEPTH)]
    kinds = [str(getattr(qstate[f"blocks.{i}.mlp.fc2"].aq, "kind", "?"))
             for i in range(md.DEPTH)]
    post_kinds = [str(getattr(qstate[f"blocks.{i}.attn.matmul2"].Aq,
                              "kind", "?")) for i in range(md.DEPTH)]

    io = capture_block_io(Spec, params_full, [calib_np])
    block_rec = {}
    for u in block_units(Spec):
        rin, rout = io[u.name]
        qsb = {cn: qstate[nm] for nm, cn in u.canon.items() if nm in qstate}
        modes = {cn: "quant" for cn in qsb}
        pred = np.asarray(u.forward(u.extract(params_q), qsb,
                                    jnp.asarray(rin), modes, False, False))
        block_rec[u.name] = float(((pred - rout) ** 2).mean())

    logits_calib = np.asarray(vit_forward(cfg_j, params_q,
                                          jnp.asarray(val_np), qstate,
                                          {"*": "quant"}))
    np.savez_compressed("/tmp/midscale_fork_calibstate.npz",
                        q_post=np.array(q_post), q_gelu=np.array(q_gelu),
                        logits_calib=logits_calib,
                        block_rec_names=np.array(sorted(block_rec)),
                        block_rec=np.array([block_rec[n]
                                            for n in sorted(block_rec)]))

    out = dict(
        q_post_ours=q_post, q_post_ref=[float(x) for x in fx_cal["q_post"]],
        q_gelu_ours=q_gelu, q_gelu_ref=[float(x) for x in fx_cal["q_gelu"]],
        gelu_kinds=kinds, post_kinds=post_kinds,
        block_rec_calibstate={n: round(v, 6) for n, v in block_rec.items()},
    )
    print("MIDSCALE_FORK_CALIB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
