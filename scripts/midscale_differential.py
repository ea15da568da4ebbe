#!/usr/bin/env python
"""Mid-scale reference differential: deit-tiny shape (img 224, dim 192,
depth 12 — 197 tokens), real percentile/accumulation regime.

The toy e2e differentials (tests/test_ref_e2e_differential.py) prove
pipeline parity at IMG=16/DIM=32/DEPTH=2; this closes the gap to real model
shapes as far as the image allows (no timm weights / ImageNet here —
/root/reference/README.md:77-85 accuracy rows need those). The reference
side (actual upstream code, CPU torch, CUDA gates stubbed) costs ~0.5-1 h
at the reduced config below, so it runs ONCE via this script and is cached
as a small fixture; tests/test_ref_midscale_differential.py then replays
our pipeline against it (the torch model regenerates bit-identically from
the stored seed — a weight checksum in the fixture guards that).

Usage:
    python scripts/midscale_differential.py --ref     # reference side -> fixture
    python scripts/midscale_differential.py --ours    # our side, compare (CPU)

Reduced config vs the shipped 4-bit (configs/4bit.py): calib_size 16 (vs
32), eq_n 32 (vs 128), search_round 1 (vs 3) — scales the measured 88,182 s
reference-CPU wall-clock (BASELINE_DERIVED.json, deit_small) by
(192/384)^2 * 16/32 * 32/128 * 1/3 ~= 1/97 ~= 15-30 min. The percentile
capture, per-token accumulation, and n_levels grids — the behaviors that
differ between 9 and 197 tokens — are untouched by those reductions.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)

FIXTURE = os.path.join(_REPO, "tests", "fixtures", "midscale_ref.npz")

# deit-tiny geometry (timm deit_tiny_patch16_224)
IMG, PATCH, DIM, DEPTH, HEADS, CLASSES = 224, 16, 192, 12, 3, 1000
BITS = 4
CALIB_N, VAL_N, EQ_N, ROUNDS, STEPS = 16, 16, 32, 1, 6
SEED_MODEL, SEED_DATA = 0, 100


def make_data():
    rng = np.random.default_rng(SEED_DATA)
    calib = rng.standard_normal((CALIB_N, IMG, IMG, 3)).astype(np.float32)
    val = rng.standard_normal((VAL_N, IMG, IMG, 3)).astype(np.float32)
    return calib, val


def make_model():
    from ref_bridge import make_tiny_timm_vit
    tm = make_tiny_timm_vit(IMG, PATCH, DIM, DEPTH, HEADS, CLASSES,
                            seed=SEED_MODEL)
    tm.eval()
    return tm


def weight_checksum(tm):
    import torch
    with torch.no_grad():
        return float(sum(p.double().abs().sum() for p in tm.parameters()))


def ref_cfg():
    class RefCfg:
        w_bit = BITS
        a_bit = BITS
        s_bit = BITS
        qhead_a_bit = BITS
        qconv_a_bit = 8
        calib_batch_size = CALIB_N
        search_round = ROUNDS
        eq_n = EQ_N
        fpcs = True
        steps = STEPS
        matmul_head_channel_wise = True
        post_softmax_quantizer = "adalog"
        post_gelu_quantizer = "adalog"
    return RefCfg


def run_reference():
    from ref_bridge import cuda_stubs, load_reference_full
    ref = load_reference_full()
    tm = make_model()
    chk = weight_checksum(tm)
    calib_np, val_np = make_data()

    t0 = time.time()
    with cuda_stubs() as torch:
        with torch.no_grad():
            fp_ref = tm(torch.tensor(val_np.transpose(0, 3, 1, 2))).numpy()
        ref.wrap_net.wrap_modules_in_net(tm, ref_cfg(), reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(CALIB_N))]
        print(f"[{time.time()-t0:.0f}s] wrapped; calibrating "
              f"(reference CPU, expect ~0.5-1 h)", flush=True)
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        for m in tm.modules():                 # finish_training
            if hasattr(m, "reparam_bias"):
                m.reparam_bias()
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()
    wall = time.time() - t0

    # AdaLog integer bases at every post-softmax and post-GeLU site — the
    # selections that must agree across implementations (toy-scale evidence:
    # exact equality at 4/6-bit, tests/test_ref_e2e_differential.py)
    q_post, q_gelu = [], []
    for i in range(DEPTH):
        blk = tm.blocks[i]
        q_post.append(float(blk.attn.matmul2.A_quantizer.q))
        q_gelu.append(float(blk.mlp.fc2.a_quantizer.q))

    q_err_ref = float(np.abs(ref_logits - fp_ref).mean())
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(
        FIXTURE,
        fp_ref=fp_ref, ref_logits=ref_logits,
        q_post=np.array(q_post), q_gelu=np.array(q_gelu),
        q_err_ref=q_err_ref, weight_checksum=chk, wall_s=wall,
        meta=json.dumps(dict(img=IMG, patch=PATCH, dim=DIM, depth=DEPTH,
                             heads=HEADS, classes=CLASSES, bits=BITS,
                             calib_n=CALIB_N, val_n=VAL_N, eq_n=EQ_N,
                             rounds=ROUNDS, steps=STEPS,
                             seed_model=SEED_MODEL, seed_data=SEED_DATA)))
    print(f"reference side done in {wall:.1f}s; q_err_ref={q_err_ref:.5f}; "
          f"fixture -> {FIXTURE}", flush=True)


def run_ours():
    """Our pipeline at the same shape/config; compares against the fixture.
    Same logic as tests/test_ref_midscale_differential.py but runnable
    standalone (e.g. on the TPU instead of CPU)."""
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig, vit_forward
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    fx = np.load(FIXTURE, allow_pickle=False)
    tm = make_model()
    assert abs(weight_checksum(tm) - float(fx["weight_checksum"])) < 1e-3, \
        "torch model regeneration diverged from the fixture's weights"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = make_data()

    cfg_j = ViTConfig(img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH,
                      heads=HEADS, num_classes=CLASSES)

    class Spec:
        family = "vit"
        cfg = cfg_j

    params = load_vit(cfg_j, sd)
    cfg = Config(w_bit=BITS, a_bit=BITS, s_bit=BITS, qhead_a_bit=BITS,
                 eq_n=EQ_N, search_round=ROUNDS, steps=STEPS)
    t0 = time.time()
    calib = QuantCalibrator(Spec, params, cfg)
    calib.calibrate([calib_np])
    params_q, qstate = calib.finish_calibration()
    wall = time.time() - t0

    our_logits = np.asarray(vit_forward(cfg_j, params_q, jnp.asarray(val_np),
                                        qstate, {"*": "quant"}))
    fp_ours = np.asarray(vit_forward(cfg_j, params, jnp.asarray(val_np)))

    fp_err = float(np.abs(fp_ours - fx["fp_ref"]).mean())
    q_err_ours = float(np.abs(our_logits - fp_ours).mean())
    q_err_ref = float(fx["q_err_ref"])
    agree = float((our_logits.argmax(-1) ==
                   fx["ref_logits"].argmax(-1)).mean())
    q_post = [float(qstate[f"blocks.{i}.attn.matmul2"].Aq.log_q)
              for i in range(DEPTH)]
    q_gelu = [float(qstate[f"blocks.{i}.mlp.fc2"].aq.log_q)
              for i in range(DEPTH)]
    post_exact = sum(a == b for a, b in zip(q_post, fx["q_post"]))
    gelu_exact = sum(a == b for a, b in zip(q_gelu, fx["q_gelu"]))

    out = dict(fp_err=fp_err, q_err_ours=q_err_ours, q_err_ref=q_err_ref,
               ratio=q_err_ours / q_err_ref, agree=agree,
               q_post_exact=f"{post_exact}/{DEPTH}",
               q_gelu_exact=f"{gelu_exact}/{DEPTH}",
               ours_wall_s=round(wall, 1),
               ref_wall_s=round(float(fx["wall_s"]), 1))
    print("MIDSCALE_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--ours", action="store_true")
    a = ap.parse_args()
    if a.ref:
        run_reference()
    if a.ours:
        run_ours()
