#!/usr/bin/env python
"""Mid-scale Swin reference differential: real 224 resolution, window 7,
two stages with PatchMerging — the genuine window-partition + shifted-mask +
rel-pos-bias regime (/root/reference/utils/wrap_net.py:35-52) that the toy
differential (tests/test_ref_swin_e2e_differential.py, 32px/window 4) does
not reach: 64 windows per shifted block at stage 0, shift masks at both
stages, PatchMerging reparam at a 56->28 downsample.

Geometry is swin-tiny-like but width-reduced (embed 48 vs 96, depths (2,2)
vs (2,2,6,2)) to keep the one-time reference-CPU run ~20-40 min; per-site
search cost at 3136 tokens x dim 48 matches the ViT midscale fixture's
197 x 192. The window/mask/merge code paths — what this fixture exists to
cover — are the real ones.

Usage:
    python scripts/midscale_swin_differential.py --ref    # once -> fixture
    python scripts/midscale_swin_differential.py --ours   # compare (CPU)
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

FIXTURE = os.path.join(_REPO, "tests", "fixtures", "midscale_swin_ref.npz")

IMG, PATCH, EMBED, WINDOW, CLASSES = 224, 4, 48, 7, 1000
DEPTHS, HEADS = (2, 2), (3, 6)
BITS = 4
CALIB_N, VAL_N, EQ_N, ROUNDS, STEPS = 16, 64, 32, 1, 6
SEED_MODEL, SEED_DATA = 0, 100


def make_data():
    rng = np.random.default_rng(SEED_DATA)
    calib = rng.standard_normal((CALIB_N, IMG, IMG, 3)).astype(np.float32)
    val = rng.standard_normal((VAL_N, IMG, IMG, 3)).astype(np.float32)
    return calib, val


def make_model():
    from ref_bridge import make_tiny_timm_swin
    tm = make_tiny_timm_swin(IMG, PATCH, EMBED, DEPTHS, HEADS, WINDOW,
                             CLASSES, seed=SEED_MODEL)
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
              f"(reference CPU, expect ~20-40 min)", flush=True)
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        for m in tm.modules():                 # finish_training
            if hasattr(m, "reparam_bias"):
                m.reparam_bias()
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()

        # the reduction reparam must have CREATED a bias from None
        # (PatchMerging reparam, wrap_net.py:146-171)
        assert tm.layers[1].downsample.reduction.bias is not None
        ref_red_b = tm.layers[1].downsample.reduction.bias.detach().numpy()
    wall = time.time() - t0

    # AdaLog integer bases at every post-softmax / post-GeLU site
    q_post, q_gelu = [], []
    for i, d in enumerate(DEPTHS):
        for j in range(d):
            blk = tm.layers[i].blocks[j]
            q_post.append(float(blk.attn.matmul2.A_quantizer.q))
            q_gelu.append(float(blk.mlp.fc2.a_quantizer.q))

    q_err_ref = float(np.abs(ref_logits - fp_ref).mean())
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(
        FIXTURE,
        fp_ref=fp_ref, ref_logits=ref_logits,
        q_post=np.array(q_post), q_gelu=np.array(q_gelu),
        ref_red_b=ref_red_b,
        q_err_ref=q_err_ref, weight_checksum=chk, wall_s=wall,
        meta=json.dumps(dict(img=IMG, patch=PATCH, embed=EMBED,
                             depths=list(DEPTHS), heads=list(HEADS),
                             window=WINDOW, classes=CLASSES, bits=BITS,
                             calib_n=CALIB_N, val_n=VAL_N, eq_n=EQ_N,
                             rounds=ROUNDS, steps=STEPS,
                             seed_model=SEED_MODEL, seed_data=SEED_DATA)))
    print(f"reference side done in {wall:.1f}s; q_err_ref={q_err_ref:.5f}; "
          f"fixture -> {FIXTURE}", flush=True)


def our_pipeline():
    """Our Swin pipeline at the fixture shape/config; returns stats.
    Shared by --ours and tests/test_ref_midscale_differential.py."""
    import jax
    import jax.numpy as jnp
    from adalog_tpu.models.swin import SwinConfig, swin_forward
    from adalog_tpu.models.load import load_swin
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.calib.layout import tree_get

    fx = np.load(FIXTURE, allow_pickle=False)
    tm = make_model()
    assert abs(weight_checksum(tm) - float(fx["weight_checksum"])) < 1e-3, \
        "torch model regeneration diverged from the fixture's weights"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = make_data()

    cfg_j = SwinConfig(img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
                       depths=DEPTHS, heads=HEADS, window=WINDOW,
                       num_classes=CLASSES)

    class Spec:
        family = "swin"
        cfg = cfg_j

    params = load_swin(cfg_j, sd)
    cfg = Config(w_bit=BITS, a_bit=BITS, s_bit=BITS, qhead_a_bit=BITS,
                 eq_n=EQ_N, search_round=ROUNDS, steps=STEPS)
    t0 = time.time()
    calib = QuantCalibrator(Spec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])
    params_q, qstate = calib.finish_calibration()
    wall = time.time() - t0

    our_logits = np.asarray(swin_forward(cfg_j, params_q, jnp.asarray(val_np),
                                         qstate, {"*": "quant"}))
    fp_ours = np.asarray(swin_forward(cfg_j, params, jnp.asarray(val_np)))

    red_p = tree_get(calib.params,
                     calib.layout["layers.1.downsample.reduction"].param_path)
    q_post = [float(qstate[f"layers.{i}.blocks.{j}.attn.matmul2"].Aq.log_q)
              for i, d in enumerate(DEPTHS) for j in range(d)]
    q_gelu = [float(qstate[f"layers.{i}.blocks.{j}.mlp.fc2"].aq.log_q)
              for i, d in enumerate(DEPTHS) for j in range(d)]

    return dict(fx=fx, our_logits=our_logits, fp_ours=fp_ours,
                q_post=q_post, q_gelu=q_gelu,
                red_b=None if red_p.b is None else np.asarray(red_p.b),
                wall_s=wall)


def run_ours():
    r = our_pipeline()
    fx = r["fx"]
    fp_err = float(np.abs(r["fp_ours"] - fx["fp_ref"]).mean())
    q_err_ours = float(np.abs(r["our_logits"] - r["fp_ours"]).mean())
    q_err_ref = float(fx["q_err_ref"])
    agree = float((r["our_logits"].argmax(-1) ==
                   fx["ref_logits"].argmax(-1)).mean())
    n = len(r["q_post"])
    post_exact = sum(a == b for a, b in zip(r["q_post"], fx["q_post"]))
    gelu_exact = sum(a == b for a, b in zip(r["q_gelu"], fx["q_gelu"]))
    out = dict(fp_err=fp_err, q_err_ours=q_err_ours, q_err_ref=q_err_ref,
               ratio=q_err_ours / q_err_ref, agree=agree,
               q_post=r["q_post"], q_post_ref=[float(v) for v in fx["q_post"]],
               q_gelu=r["q_gelu"], q_gelu_ref=[float(v) for v in fx["q_gelu"]],
               q_post_exact=f"{post_exact}/{n}",
               q_gelu_exact=f"{gelu_exact}/{n}",
               red_b_norm=None if r["red_b"] is None else
               float(np.linalg.norm(r["red_b"] - fx["ref_red_b"])),
               ours_wall_s=round(r["wall_s"], 1),
               ref_wall_s=round(float(fx["wall_s"]), 1))
    print("MIDSCALE_SWIN_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--ours", action="store_true")
    a = ap.parse_args()
    if a.ref:
        run_reference()
    if a.ours:
        run_ours()
