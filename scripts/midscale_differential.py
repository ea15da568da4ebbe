#!/usr/bin/env python
"""Mid-scale reference differential: deit-tiny shape (img 224, dim 192,
depth 12 — 197 tokens), real percentile/accumulation regime.

The toy e2e differentials (tests/test_ref_e2e_differential.py) prove
pipeline parity at IMG=16/DIM=32/DEPTH=2; this closes the gap to real model
shapes as far as the image allows (no timm weights / ImageNet here —
/root/reference/README.md:77-85 accuracy rows need those). The reference
side (actual upstream code, CPU torch, CUDA gates stubbed) costs ~20-50 min
per fixture at the reduced config below, so it runs ONCE via this script and
is cached as a small fixture; the tests then replay our pipeline against it
(the torch model regenerates bit-identically from the stored seed — a weight
checksum in the fixture guards that).

Fixtures (tests/fixtures/):
  midscale_ref.npz        --ref                calibrate, seed set 0, val 64
  midscale_ref_s1.npz     --ref --seed-set 1   calibrate, seed set 1, val 64
  midscale_brecq_ref.npz  --ref-optimize       calibrate + BRECQ (reduced
                          iters), per-block final rec errors + final logits

Usage:
    python scripts/midscale_differential.py --ref            # -> fixture
    python scripts/midscale_differential.py --ours           # compare (CPU)
    python scripts/midscale_differential.py --ref-optimize
    python scripts/midscale_differential.py --ours-optimize

Reduced config vs the shipped 4-bit (configs/4bit.py): calib_size 16 (vs
32), eq_n 32 (vs 128), search_round 1 (vs 3) — scales the measured 88,182 s
reference-CPU wall-clock (BASELINE_DERIVED.json, deit_small) by
(192/384)^2 * 16/32 * 32/128 * 1/3 ~= 1/97 ~= 15-30 min. The percentile
capture, per-token accumulation, and n_levels grids — the behaviors that
differ between 9 and 197 tokens — are untouched by those reductions.
BRECQ reduction: 300 iters (vs 20,000) with optim set == batch (16) so the
batch CONTENT is identical every iteration in both implementations (the
reference's torch.randperm and our jax.random.permutation then only permute
order within the same full-set batch) — the remaining divergence is
optimizer fp math, not data sampling.
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

FIXDIR = os.path.join(_REPO, "tests", "fixtures")
FIXTURES = {0: os.path.join(FIXDIR, "midscale_ref.npz"),
            1: os.path.join(FIXDIR, "midscale_ref_s1.npz")}
BRECQ_FIXTURE = os.path.join(FIXDIR, "midscale_brecq_ref.npz")

# deit-tiny geometry (timm deit_tiny_patch16_224)
IMG, PATCH, DIM, DEPTH, HEADS, CLASSES = 224, 16, 192, 12, 3, 1000
BITS = 4
CALIB_N, VAL_N, EQ_N, ROUNDS, STEPS = 16, 64, 32, 1, 6
# seed set -> (model seed, data seed); set 0 matches the round-4 fixture
SEEDS = {0: (0, 100), 1: (1, 101)}
# BRECQ reduction (see module docstring)
RECON_ITERS, OPT_BATCH = 300, 16
# The BRECQ fixture calibrates at eq_n=64, not 32: the post-GeLU joint FPCS
# (reference linear.py:941-967, fpcs_width=32) degenerates at eq_n=32 into a
# one-child-per-survivor walk whose delta DOUBLES each step — the final
# (scale, base) argmax over 32 near-tie candidates is then fp-noise-chaotic,
# and the measured result is block-specific fc2 scale forks that start BRECQ
# from a ~1.5x worse state in 4 of 12 blocks (/tmp/r5_site_fork.log,
# scripts/probe_midscale_site_fork.py). eq_n=64 keeps the refinement a
# contraction (2 children, delta/1.5), so the BRECQ differential gates BRECQ
# itself, not an amplified calibrate near-tie. Shipped configs use eq_n=128
# and never enter the degenerate regime; the calibrate fixtures keep eq_n=32
# deliberately (they gate the search including that regime, with measured
# tolerances).
BRECQ_EQ_N = 64


def make_data(seed_data, val_n=VAL_N):
    rng = np.random.default_rng(seed_data)
    calib = rng.standard_normal((CALIB_N, IMG, IMG, 3)).astype(np.float32)
    val = rng.standard_normal((val_n, IMG, IMG, 3)).astype(np.float32)
    return calib, val


def make_model(seed_model):
    from ref_bridge import make_tiny_timm_vit
    tm = make_tiny_timm_vit(IMG, PATCH, DIM, DEPTH, HEADS, CLASSES,
                            seed=seed_model)
    tm.eval()
    return tm


def weight_checksum(tm):
    import torch
    with torch.no_grad():
        return float(sum(p.double().abs().sum() for p in tm.parameters()))


def ref_cfg(eq=EQ_N):
    class RefCfg:
        w_bit = BITS
        a_bit = BITS
        s_bit = BITS
        qhead_a_bit = BITS
        qconv_a_bit = 8
        calib_batch_size = CALIB_N
        search_round = ROUNDS
        eq_n = eq
        fpcs = True
        steps = STEPS
        matmul_head_channel_wise = True
        post_softmax_quantizer = "adalog"
        post_gelu_quantizer = "adalog"
    return RefCfg


def _adalog_bases(tm):
    """AdaLog integer bases at every post-softmax and post-GeLU site — the
    selections that must agree across implementations (toy-scale evidence:
    exact equality at 4/6-bit, tests/test_ref_e2e_differential.py)."""
    q_post, q_gelu = [], []
    for i in range(DEPTH):
        blk = tm.blocks[i]
        q_post.append(float(blk.attn.matmul2.A_quantizer.q))
        q_gelu.append(float(blk.mlp.fc2.a_quantizer.q))
    return q_post, q_gelu


def run_reference(seed_set: int):
    from ref_bridge import cuda_stubs, load_reference_full
    ref = load_reference_full()
    seed_model, seed_data = SEEDS[seed_set]
    tm = make_model(seed_model)
    chk = weight_checksum(tm)
    calib_np, val_np = make_data(seed_data)

    t0 = time.time()
    with cuda_stubs() as torch:
        with torch.no_grad():
            fp_ref = tm(torch.tensor(val_np.transpose(0, 3, 1, 2))).numpy()
        ref.wrap_net.wrap_modules_in_net(tm, ref_cfg(), reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(CALIB_N))]
        print(f"[{time.time()-t0:.0f}s] wrapped; calibrating "
              f"(reference CPU, expect ~20-30 min)", flush=True)
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        for m in tm.modules():                 # finish_training
            if hasattr(m, "reparam_bias"):
                m.reparam_bias()
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()
    wall = time.time() - t0

    q_post, q_gelu = _adalog_bases(tm)
    q_err_ref = float(np.abs(ref_logits - fp_ref).mean())
    os.makedirs(FIXDIR, exist_ok=True)
    np.savez_compressed(
        FIXTURES[seed_set],
        fp_ref=fp_ref, ref_logits=ref_logits,
        q_post=np.array(q_post), q_gelu=np.array(q_gelu),
        q_err_ref=q_err_ref, weight_checksum=chk, wall_s=wall,
        meta=json.dumps(dict(img=IMG, patch=PATCH, dim=DIM, depth=DEPTH,
                             heads=HEADS, classes=CLASSES, bits=BITS,
                             calib_n=CALIB_N, val_n=len(val_np), eq_n=EQ_N,
                             rounds=ROUNDS, steps=STEPS,
                             seed_model=seed_model, seed_data=seed_data)))
    print(f"reference side done in {wall:.1f}s; q_err_ref={q_err_ref:.5f}; "
          f"fixture -> {FIXTURES[seed_set]}", flush=True)


def run_reference_optimize():
    """Reference calibrate + BRECQ at reduced iters (the CLI --optimize flow,
    test_quant.py:203-240: calibrate -> wrap_reparamed_modules_in_net ->
    BlockReconstructor.reconstruct_model -> finish_training), with per-block
    FINAL reconstruction errors captured for block-level gating."""
    import copy
    from ref_bridge import cuda_stubs, load_reference_full
    ref = load_reference_full()
    import utils.block_recon as ref_br

    seed_model, seed_data = SEEDS[0]
    tm = make_model(seed_model)
    chk = weight_checksum(tm)
    calib_np, val_np = make_data(seed_data)

    t0 = time.time()
    with cuda_stubs() as torch:
        full_model = copy.deepcopy(tm)
        with torch.no_grad():
            fp_ref = tm(torch.tensor(val_np.transpose(0, 3, 1, 2))).numpy()
        ref.wrap_net.wrap_modules_in_net(tm, ref_cfg(eq=BRECQ_EQ_N),
                                         reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(CALIB_N))]
        print(f"[{time.time()-t0:.0f}s] wrapped; calibrating", flush=True)
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        tm = ref.wrap_net.wrap_reparamed_modules_in_net(tm)
        tm.eval()
        # the optimize flow validates the calibrated model WITHOUT
        # finish_training (test_quant.py:215-221 only calls it when
        # --optimize is absent); same convention on our side
        with torch.no_grad():
            ref_logits_calib = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()
        print(f"[{time.time()-t0:.0f}s] calibrated; reconstructing "
              f"{RECON_ITERS} iters/block", flush=True)

        recon = ref_br.BlockReconstructor(tm, full_model, loader)
        device = torch.device("cpu")
        for m in tm.modules():
            if hasattr(m, "mode"):
                m.mode = "raw"
        block_names, block_rec = [], []
        for name in recon.blocks.keys():
            blk = recon.blocks[name]
            recon.init_block_raw_data(blk, recon.full_blocks[name], name,
                                      device)
            rin = blk.raw_input.clone()
            rout = blk.raw_out.clone()
            recon.reconstruct_single_block(name, blk, device,
                                           batch_size=OPT_BATCH,
                                           iters=RECON_ITERS, quant_act=True)
            # final rec error on the full optim set: hard AdaRound weights
            # (soft_targets=False after training) + trained act scales
            recon.set_block_mode(blk, "quant_forward")
            with torch.no_grad():
                pred = blk(rin)
            recon.set_block_mode(blk, "raw")
            err = float(((pred - rout) ** 2).mean())
            block_names.append(name)
            block_rec.append(err)
            print(f"[{time.time()-t0:.0f}s] {name}: final rec {err:.6f}",
                  flush=True)
        # hard freeze (block_recon.py:151-157)
        for m in tm.modules():
            if hasattr(m, "mode"):
                m.mode = "quant_forward"
            if hasattr(m, "w_quantizer"):
                m.weight.data.copy_(
                    m.w_quantizer.get_hard_value(m.weight.data))
                del m.w_quantizer.alpha
                m.w_quantizer.round_mode = "nearest"
        for m in tm.modules():                 # finish_training
            if hasattr(m, "reparam_bias"):
                m.reparam_bias()
        tm.eval()
        with torch.no_grad():
            ref_logits_opt = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()
    wall = time.time() - t0

    q_err_calib = float(np.abs(ref_logits_calib - fp_ref).mean())
    q_err_opt = float(np.abs(ref_logits_opt - fp_ref).mean())
    os.makedirs(FIXDIR, exist_ok=True)
    np.savez_compressed(
        BRECQ_FIXTURE,
        fp_ref=fp_ref, ref_logits_calib=ref_logits_calib,
        ref_logits_opt=ref_logits_opt,
        block_names=np.array(block_names), block_rec=np.array(block_rec),
        q_err_calib=q_err_calib, q_err_opt=q_err_opt,
        weight_checksum=chk, wall_s=wall,
        meta=json.dumps(dict(img=IMG, patch=PATCH, dim=DIM, depth=DEPTH,
                             heads=HEADS, classes=CLASSES, bits=BITS,
                             calib_n=CALIB_N, val_n=len(val_np),
                             eq_n=BRECQ_EQ_N, rounds=ROUNDS, steps=STEPS,
                             recon_iters=RECON_ITERS, opt_batch=OPT_BATCH,
                             seed_model=seed_model, seed_data=seed_data)))
    print(f"reference optimize done in {wall:.1f}s; "
          f"q_err calib={q_err_calib:.5f} -> opt={q_err_opt:.5f}; "
          f"fixture -> {BRECQ_FIXTURE}", flush=True)


def _our_pipeline(seed_set: int, optimize: bool, val_n: int,
                  eq_n: int = None):
    """Our calibrate (+ optional BRECQ) at the fixture config; returns the
    comparison statistics. Shared by --ours/--ours-optimize and the tests.
    ``eq_n`` defaults to EQ_N for calibrate fixtures and BRECQ_EQ_N for the
    optimize flow (see the BRECQ_EQ_N comment)."""
    import jax
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig, vit_forward
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    seed_model, seed_data = SEEDS[seed_set]
    tm = make_model(seed_model)
    chk = weight_checksum(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = make_data(seed_data, val_n)

    cfg_j = ViTConfig(img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH,
                      heads=HEADS, num_classes=CLASSES)

    class Spec:
        family = "vit"
        cfg = cfg_j

    params = load_vit(cfg_j, sd)
    params_full = jax.tree_util.tree_map(lambda a: a, params)
    if eq_n is None:
        eq_n = BRECQ_EQ_N if optimize else EQ_N
    cfg = Config(w_bit=BITS, a_bit=BITS, s_bit=BITS, qhead_a_bit=BITS,
                 eq_n=eq_n, search_round=ROUNDS, steps=STEPS,
                 recon_iters=RECON_ITERS, optim_batch_size=OPT_BATCH)
    t0 = time.time()
    calib = QuantCalibrator(Spec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])

    out = dict(weight_checksum=chk, spec=Spec, params=params,
               cfg_j=cfg_j, qstate=None)
    if optimize:
        from adalog_tpu.recon.brecq import BlockReconstructor, \
            capture_block_io
        from adalog_tpu.recon.blocks import block_units
        from adalog_tpu.calib.layout import quant_layout

        # calibrate-state logits, same convention as the reference optimize
        # flow (pre-finish_training validation)
        logits_calib = np.asarray(vit_forward(
            cfg_j, params_q, jnp.asarray(val_np), qstate, {"*": "quant"}))
        recon = BlockReconstructor(Spec, params_q, params_full, qstate,
                                   quant_layout(Spec, cfg, reparam=True),
                                   cfg)
        params_q, qstate = recon.reconstruct([calib_np], quant_act=True)
        calib.params, calib.qstate = params_q, dict(qstate)
        params_q, qstate = calib.finish_calibration()

        # per-block final rec errors, same definition as the reference side:
        # reconstructed block in quant mode over the pristine-model raw I/O
        io = capture_block_io(Spec, params_full, [calib_np])
        block_rec = {}
        for u in block_units(Spec):
            rin, rout = io[u.name]
            qsb = {cn: qstate[nm] for nm, cn in u.canon.items()
                   if nm in qstate}
            modes = {cn: "quant" for cn in qsb}
            pred = np.asarray(u.forward(u.extract(params_q), qsb,
                                        jnp.asarray(rin), modes, False,
                                        False))
            block_rec[u.name] = float(((pred - rout) ** 2).mean())
        out["block_rec"] = block_rec
        out["logits_calib"] = logits_calib
    else:
        params_q, qstate = calib.finish_calibration()

    out["wall_s"] = time.time() - t0
    out["logits"] = np.asarray(vit_forward(
        cfg_j, params_q, jnp.asarray(val_np), qstate, {"*": "quant"}))
    out["fp_ours"] = np.asarray(vit_forward(cfg_j, params,
                                            jnp.asarray(val_np)))
    out["qstate"] = qstate
    if optimize:
        # fork-analysis artifact: margins / per-sample flips vs the fixture
        # are recoverable without a pipeline re-run (also written when the
        # test drives this path)
        np.savez_compressed(
            "/tmp/midscale_brecq_ours.npz", logits=out["logits"],
            logits_calib=out["logits_calib"], fp_ours=out["fp_ours"],
            block_rec_names=np.array(sorted(out["block_rec"])),
            block_rec=np.array([out["block_rec"][n]
                                for n in sorted(out["block_rec"])]))
    return out


def run_ours(seed_set: int):
    """Our calibrate pipeline at the fixture shape/config; compares against
    the fixture. Same logic as tests/test_ref_midscale_differential.py but
    runnable standalone (e.g. on the TPU instead of CPU)."""
    fx = np.load(FIXTURES[seed_set], allow_pickle=False)
    meta = json.loads(str(fx["meta"]))
    r = _our_pipeline(seed_set, optimize=False, val_n=meta["val_n"])
    assert abs(r["weight_checksum"] - float(fx["weight_checksum"])) < 1e-3, \
        "torch model regeneration diverged from the fixture's weights"

    qstate = r["qstate"]
    our_logits, fp_ours = r["logits"], r["fp_ours"]
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

    out = dict(seed_set=seed_set, fp_err=fp_err, q_err_ours=q_err_ours,
               q_err_ref=q_err_ref, ratio=q_err_ours / q_err_ref,
               agree=agree,
               q_post_exact=f"{post_exact}/{DEPTH}",
               q_gelu_exact=f"{gelu_exact}/{DEPTH}",
               ours_wall_s=round(r["wall_s"], 1),
               ref_wall_s=round(float(fx["wall_s"]), 1))
    print("MIDSCALE_RESULT " + json.dumps(out), flush=True)


def run_ours_optimize():
    fx = np.load(BRECQ_FIXTURE, allow_pickle=False)
    meta = json.loads(str(fx["meta"]))
    r = _our_pipeline(0, optimize=True, val_n=meta["val_n"])
    assert abs(r["weight_checksum"] - float(fx["weight_checksum"])) < 1e-3

    our_logits, fp_ours = r["logits"], r["fp_ours"]
    q_err_calib = float(np.abs(r["logits_calib"] - fp_ours).mean())
    q_err_opt = float(np.abs(our_logits - fp_ours).mean())
    ref_names = [str(n) for n in fx["block_names"]]
    ref_rec = {n: float(e) for n, e in zip(ref_names, fx["block_rec"])}
    ratios = {n: r["block_rec"][n] / ref_rec[n]
              for n in ref_rec if n in r["block_rec"]}
    agree = float((our_logits.argmax(-1) ==
                   fx["ref_logits_opt"].argmax(-1)).mean())
    out = dict(q_err_calib=q_err_calib, q_err_opt=q_err_opt,
               ref_q_err_calib=float(fx["q_err_calib"]),
               ref_q_err_opt=float(fx["q_err_opt"]),
               opt_ratio=q_err_opt / float(fx["q_err_opt"]),
               agree=agree,
               block_rec_ours={n: round(v, 6)
                               for n, v in r["block_rec"].items()},
               block_rec_ref={n: round(v, 6) for n, v in ref_rec.items()},
               block_ratios={n: round(v, 3) for n, v in ratios.items()},
               ours_wall_s=round(r["wall_s"], 1),
               ref_wall_s=round(float(fx["wall_s"]), 1))
    print("MIDSCALE_BRECQ_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--ours", action="store_true")
    ap.add_argument("--ref-optimize", action="store_true")
    ap.add_argument("--ours-optimize", action="store_true")
    ap.add_argument("--seed-set", type=int, default=0, choices=sorted(SEEDS))
    a = ap.parse_args()
    if a.ref:
        run_reference(a.seed_set)
    if a.ours:
        run_ours(a.seed_set)
    if a.ref_optimize:
        run_reference_optimize()
    if a.ours_optimize:
        run_ours_optimize()
