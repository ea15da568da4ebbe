"""Mid-scale pipeline differential at deit-tiny shape (img 224, dim 192,
depth 12 — 197 tokens, 1000 classes).

The reference side (actual upstream code on CPU torch) costs ~20-50 min per
fixture, so it is run ONCE by scripts/midscale_differential.py (--ref /
--ref-optimize) and cached as small fixtures (logits + AdaLog base
selections + per-block rec errors + weight checksum); these tests regenerate
the bit-identical torch model from the stored seed, replay OUR pipeline at
the same reduced config, and hold it to the same equivalence criteria as the
toy e2e differentials (test_ref_e2e_differential.py) — now in the real
percentile/accumulation regime (197 tokens vs 9) the toy shapes cannot
reach. Two independent seed sets and a 64-image val batch (round 5) shrink
the binomial slack the round-4 16-image fixture needed.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
import midscale_differential as md  # noqa: E402


@pytest.mark.slow
@pytest.mark.parametrize("seed_set", sorted(md.SEEDS))
def test_midscale_pipeline_vs_reference(seed_set):
    if not os.path.exists(md.FIXTURES[seed_set]):
        pytest.skip(f"midscale fixture {seed_set} not built "
                    f"(scripts/midscale_differential.py --ref "
                    f"--seed-set {seed_set})")
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig, vit_forward
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    fx = np.load(md.FIXTURES[seed_set], allow_pickle=False)
    meta = json.loads(str(fx["meta"]))
    seed_model, seed_data = md.SEEDS[seed_set]
    tm = md.make_model(seed_model)
    # guards fixture/model drift: the fixture's logits are only comparable
    # if torch regenerated the exact weights the reference calibrated
    assert abs(md.weight_checksum(tm) - float(fx["weight_checksum"])) < 1e-3
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = md.make_data(seed_data, meta["val_n"])

    cfg_j = ViTConfig(img_size=md.IMG, patch_size=md.PATCH, dim=md.DIM,
                      depth=md.DEPTH, heads=md.HEADS,
                      num_classes=md.CLASSES)

    class Spec:
        family = "vit"
        cfg = cfg_j

    params = load_vit(cfg_j, sd)
    cfg = Config(w_bit=md.BITS, a_bit=md.BITS, s_bit=md.BITS,
                 qhead_a_bit=md.BITS, eq_n=md.EQ_N,
                 search_round=md.ROUNDS, steps=md.STEPS)
    calib = QuantCalibrator(Spec, params, cfg)
    calib.calibrate([calib_np])
    params_q, qstate = calib.finish_calibration()

    our_logits = np.asarray(vit_forward(cfg_j, params_q,
                                        jnp.asarray(val_np),
                                        qstate, {"*": "quant"}))
    fp_ours = np.asarray(vit_forward(cfg_j, params, jnp.asarray(val_np)))

    # the FP32 models are the same function at 197-token scale
    fp_err = float(np.abs(fp_ours - fx["fp_ref"]).mean())
    assert fp_err < 5e-4, fp_err

    # quality equivalence: both quantized models approximate FP32 equally
    # well (same two-sided gate as the toy differential; see its docstring
    # for why near-tie reparam forks make exact-state equality the wrong
    # criterion)
    q_err_ours = float(np.abs(our_logits - fp_ours).mean())
    q_err_ref = float(fx["q_err_ref"])
    assert q_err_ours <= q_err_ref * 1.3 and q_err_ref <= q_err_ours * 1.3, \
        (q_err_ours, q_err_ref)

    # prediction preservation over 1000 classes. On random weights the FP
    # top1-top2 margin (0.067 mean) is far below the 4-bit quant error
    # (q_err_ref ~0.11), so quantization alone flips the reference's own
    # argmax ~35-40% of the time here — direct ours-vs-ref agreement is
    # bounded by that noise, not by pipeline parity. The calibrated gate:
    # our quantization must preserve FP predictions at least as well as the
    # reference's does. The two rates are a PAIRED comparison on the same
    # images but the two trajectories fork (reparam near-ties), so the
    # difference still carries ~sqrt(2 p(1-p)/n) binomial noise ~0.08 at
    # n=64, p~0.6; 4/64 = 0.0625 is within one std — it catches systematic
    # degradation, not noise (round-4 fixture needed 2/16 = 0.125).
    fp_pred = fp_ours.argmax(-1)
    agree_ref_fp = float((fx["ref_logits"].argmax(-1) == fp_pred).mean())
    agree_ours_fp = float((our_logits.argmax(-1) == fp_pred).mean())
    n = fp_pred.shape[0]
    assert agree_ours_fp >= agree_ref_fp - 4.0 / n, \
        (agree_ours_fp, agree_ref_fp)

    # AdaLog integer bases. Post-softmax: exact at >=75% of depths (stable
    # in the toy sweep and on both seed sets here). Post-GeLU: the 13-vs-14
    # decision is a measured fp64 near-tie at this shape (objective gap
    # 0.1-1.8% of |s|, top candidates always {13, 14, 15} — measured on BOTH
    # seed sets with scripts/probe_midscale_gelu_fork.py; on seed 1 the
    # fp64 oracle's own argmax is 14 at 8/12 depths while the reference
    # picked 13 almost everywhere, i.e. the exact pick tracks FPCS
    # scale-trajectory interleaving and fp32 rounding, not quantizer
    # quality). Gate: every site exact-or-adjacent (|dq| <= 1); the quality
    # consequence of the fork is bound by the two-sided q_err gate above.
    q_post = [float(qstate[f"blocks.{i}.attn.matmul2"].Aq.log_q)
              for i in range(md.DEPTH)]
    q_gelu = [float(qstate[f"blocks.{i}.mlp.fc2"].aq.log_q)
              for i in range(md.DEPTH)]
    post_exact = sum(a == b for a, b in zip(q_post, fx["q_post"]))
    assert post_exact >= int(np.ceil(md.DEPTH * 0.75)), (q_post,
                                                         list(fx["q_post"]))
    gelu_adj = sum(abs(a - b) <= 1 for a, b in zip(q_gelu, fx["q_gelu"]))
    assert gelu_adj == md.DEPTH, (q_gelu, list(fx["q_gelu"]))


@pytest.mark.slow
def test_midscale_brecq_vs_reference():
    """--optimize differential at deit-tiny shape (VERDICT r4 missing #2):
    the reference BlockReconstructor ran ONCE at 300 iters/block with the
    optimization set equal to the batch (16), so both implementations see
    the identical full-set batch every iteration — the remaining divergence
    is optimizer/rounding fp math, not data sampling. This fixture
    calibrates at eq_n=64 (not the calibrate fixtures' 32): at eq_n=32 the
    reference's width-32 post-GeLU joint FPCS degenerates into a
    delta-doubling walk whose final argmax is fp-noise-chaotic, which forked
    fc2 scales in 4 of 12 blocks and started BRECQ from a ~1.5x worse state
    there (measured: scripts/probe_midscale_site_fork.py; see BRECQ_EQ_N in
    the harness). Gates: per-block FINAL reconstruction errors against
    pristine-model I/O, end-to-end quantized quality, optimize-vs-calibrate
    delta parity, and prediction preservation."""
    if not os.path.exists(md.BRECQ_FIXTURE):
        pytest.skip("midscale BRECQ fixture not built "
                    "(scripts/midscale_differential.py --ref-optimize)")
    fx = np.load(md.BRECQ_FIXTURE, allow_pickle=False)
    meta = json.loads(str(fx["meta"]))
    r = md._our_pipeline(0, optimize=True, val_n=meta["val_n"],
                         eq_n=meta["eq_n"])
    assert abs(r["weight_checksum"] - float(fx["weight_checksum"])) < 1e-3

    our_logits, fp_ours = r["logits"], r["fp_ours"]
    fp_err = float(np.abs(fp_ours - fx["fp_ref"]).mean())
    assert fp_err < 5e-4, fp_err

    # block-level: final rec error of every reconstructed block on the same
    # pristine-model I/O, same MSE definition both sides. AdaRound
    # trajectories fork per block (fp optimizer math over 300 iters), so the
    # gate is a two-sided per-block ratio plus a tighter geometric-mean
    # bound across the 14 blocks (systematic quality loss cannot hide in
    # per-block noise).
    ref_rec = {str(n): float(e)
               for n, e in zip(fx["block_names"], fx["block_rec"])}
    ours_rec = r["block_rec"]
    assert set(ref_rec) == set(ours_rec), (sorted(ref_rec),
                                           sorted(ours_rec))
    ratios = np.array([ours_rec[n] / ref_rec[n] for n in sorted(ref_rec)])
    gmean = float(np.exp(np.log(ratios).mean()))
    assert (ratios < 2.0).all() and (ratios > 0.5).all(), \
        dict(zip(sorted(ref_rec), ratios.round(3)))
    assert 0.75 <= gmean <= 1.33, (gmean, ratios.round(3))

    # end-to-end: both reconstructed models approximate FP32 equally well
    # (toy BRECQ gate 1.4, test_ref_e2e_differential.py; the deterministic
    # full-set batch here removes the sampling fork that gate absorbed)
    q_err_ours = float(np.abs(our_logits - fp_ours).mean())
    q_err_ref = float(fx["q_err_opt"])
    assert q_err_ours <= q_err_ref * 1.4 and q_err_ref <= q_err_ours * 1.4, \
        (q_err_ours, q_err_ref)

    # optimize-vs-calibrate delta parity. At 300 iters with the 16-image
    # optim set the reference's OWN block reconstruction slightly WORSENS
    # e2e q_err (fixture: 0.0730 -> 0.0754, +3.3%; blocks are optimized
    # greedily against pristine-model I/O, and at this reduced scale 14
    # locally-better blocks do not compose into a better end-to-end model —
    # at the shipped 20k iters it improves, per the toy differential). The
    # direct evidence that the training loop optimizes is the block-level
    # rec-error gate above; here the e2e EFFECT of optimization must match
    # the reference's: degradation factors within ±0.05 (measured ours
    # 1.057 vs ref 1.033 on this fixture — 2x the observed 0.024 gap).
    q_err_calib = float(np.abs(r["logits_calib"] - fp_ours).mean())
    factor_ours = q_err_ours / q_err_calib
    factor_ref = float(fx["q_err_opt"]) / float(fx["q_err_calib"])
    assert abs(factor_ours - factor_ref) <= 0.05, (factor_ours, factor_ref)

    # prediction preservation, same paired-binomial reasoning as the
    # calibrate gate above (n=64)
    fp_pred = fp_ours.argmax(-1)
    agree_ref_fp = float((fx["ref_logits_opt"].argmax(-1) == fp_pred).mean())
    agree_ours_fp = float((our_logits.argmax(-1) == fp_pred).mean())
    n = fp_pred.shape[0]
    assert agree_ours_fp >= agree_ref_fp - 4.0 / n, \
        (agree_ours_fp, agree_ref_fp)
