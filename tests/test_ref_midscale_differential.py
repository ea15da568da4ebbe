"""Mid-scale pipeline differential at deit-tiny shape (img 224, dim 192,
depth 12 — 197 tokens, 1000 classes).

The reference side (actual upstream code on CPU torch) costs ~0.5-1 h, so
it is run ONCE by scripts/midscale_differential.py --ref and cached as a
small fixture (logits + AdaLog base selections + weight checksum); this
test regenerates the bit-identical torch model from the stored seed,
replays OUR pipeline at the same reduced config, and holds it to the same
equivalence criteria as the toy e2e differential
(test_ref_e2e_differential.py) — now in the real percentile/accumulation
regime (197 tokens vs 9) the toy shapes cannot reach.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
import midscale_differential as md  # noqa: E402


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(md.FIXTURE),
                    reason="midscale fixture not built "
                           "(scripts/midscale_differential.py --ref)")
def test_midscale_pipeline_vs_reference():
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig, vit_forward
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator

    fx = np.load(md.FIXTURE, allow_pickle=False)
    tm = md.make_model()
    # guards fixture/model drift: the fixture's logits are only comparable
    # if torch regenerated the exact weights the reference calibrated
    assert abs(md.weight_checksum(tm) - float(fx["weight_checksum"])) < 1e-3
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, val_np = md.make_data()

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
    # (q_err_ref 0.114), so the REFERENCE's own quantized argmax only
    # matches its FP argmax 10/16 = 0.625 — quantization itself flips the
    # prediction ~37% of the time here, and direct ours-vs-ref agreement
    # (measured 0.6875) is bounded by that noise, not by pipeline parity.
    # The calibrated gate: our quantization must preserve FP predictions at
    # least as well as the reference's does, within 2/16 binomial slack
    # (std of a 16-sample agreement rate at p=0.625 is ~0.12).
    fp_pred = fp_ours.argmax(-1)
    agree_ref_fp = float((fx["ref_logits"].argmax(-1) == fp_pred).mean())
    agree_ours_fp = float((our_logits.argmax(-1) == fp_pred).mean())
    n = fp_pred.shape[0]
    assert agree_ours_fp >= agree_ref_fp - 2.0 / n, \
        (agree_ours_fp, agree_ref_fp)

    # AdaLog integer bases. Post-softmax: exact at >=75% of depths (stable
    # in the toy sweep and here). Post-GeLU: the 13-vs-14 decision is a
    # measured fp64 near-tie at this shape (objective gap 0.5-1.8% of |s|,
    # top-3 candidates always {14, 13, 15}; the single-pass fp64 oracle in
    # fact prefers 14 even at depths where BOTH pipelines picked 13 —
    # scripts/probe_midscale_gelu_fork.py), so the pick flips on FPCS
    # scale-trajectory interleaving and fp32 rounding. Gate: every site
    # exact-or-adjacent (|dq| <= 1), majority exact; quality consequence is
    # already bound by the two-sided q_err gate above.
    q_post = [float(qstate[f"blocks.{i}.attn.matmul2"].Aq.log_q)
              for i in range(md.DEPTH)]
    q_gelu = [float(qstate[f"blocks.{i}.mlp.fc2"].aq.log_q)
              for i in range(md.DEPTH)]
    post_exact = sum(a == b for a, b in zip(q_post, fx["q_post"]))
    assert post_exact >= int(np.ceil(md.DEPTH * 0.75)), (q_post,
                                                         list(fx["q_post"]))
    gelu_exact = sum(a == b for a, b in zip(q_gelu, fx["q_gelu"]))
    gelu_adj = sum(abs(a - b) <= 1 for a, b in zip(q_gelu, fx["q_gelu"]))
    assert gelu_adj == md.DEPTH, (q_gelu, list(fx["q_gelu"]))
    assert gelu_exact >= int(np.ceil(md.DEPTH * 0.5)), (q_gelu,
                                                        list(fx["q_gelu"]))
