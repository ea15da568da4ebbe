"""END-TO-END Swin pipeline differential vs the ACTUAL reference code.

The ViT e2e differential (test_ref_e2e_differential.py) covers the straight
transformer path; this covers the Swin-only machinery through the reference's
own wrap_modules_in_net + QuantCalibrator (not a hand-built oracle):

  - WindowAttention monkey-patch with rel-pos bias + shifted-window mask
    (wrap_net.py:35-52 swin_attn_forward),
  - the PatchMerging ``reduction`` channel-wise reparam wired to the
    PatchMerging's own norm (wrap_net.py:149-151), with the bias CREATED
    from None inside reparam (linear.py:607-609; the load-time analog is
    test_quant.py:116-117),
  - per-head matmul quantizers inside windows.

Fixture: a tiny timm-0.9.2-structured torch Swin (2 stages, stage 0 has a
shifted block, stage 1 opens with PatchMerging) whose state dict loads into
our SwinParams via load_swin — identical weights and calibration data on
both sides.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_bridge import cuda_stubs, load_reference_full, make_tiny_timm_swin

from adalog_tpu.models.swin import SwinConfig, swin_forward
from adalog_tpu.models.load import load_swin
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator
from adalog_tpu.calib.layout import tree_get

IMG, PATCH, DIM, WINDOW, CLASSES = 32, 4, 16, 4, 10
DEPTHS, HEADS = (2, 2), (2, 4)
CFG = SwinConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                 depths=DEPTHS, heads=HEADS, window=WINDOW,
                 num_classes=CLASSES)


class TinySpec:
    family = "swin"
    cfg = CFG


def make_ref_cfg(bits: int):
    class RefCfg:
        w_bit = bits
        a_bit = bits
        s_bit = bits
        qhead_a_bit = bits
        qconv_a_bit = 8
        calib_batch_size = 8
        search_round = 3
        # >= 64 keeps the width-32 joint (scale, q) FPCS non-degenerate
        # (see test_ref_differential.py::test_postgelu_adalog_vs_reference)
        eq_n = 64
        fpcs = True
        steps = 6
        matmul_head_channel_wise = True
        post_softmax_quantizer = "adalog"
        post_gelu_quantizer = "adalog"
    return RefCfg


def run_pipelines(rng, bits):
    """Run the reference Swin pipeline (actual upstream code) and ours on
    identical weights/data; return comparison statistics. Shared by the test
    below and scripts/probe_e2e_ratio.py (seed-sweep tolerance evidence)."""
    ref = load_reference_full()
    tm = make_tiny_timm_swin(IMG, PATCH, DIM, DEPTHS, HEADS, WINDOW,
                             CLASSES, seed=0)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    calib_np = rng.standard_normal((8, IMG, IMG, 3)).astype(np.float32)
    val_np = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)

    # ---- reference pipeline (actual upstream code) ----
    with cuda_stubs() as torch:
        with torch.no_grad():
            fp_ref = tm(torch.tensor(val_np.transpose(0, 3, 1, 2))).numpy()
        ref.wrap_net.wrap_modules_in_net(tm, make_ref_cfg(bits), reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(8))]
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        for m in tm.modules():                 # finish_training
            if hasattr(m, "reparam_bias"):
                m.reparam_bias()
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()

    # the reference's reduction reparam CREATED a bias from None
    assert tm.layers[1].downsample.reduction.bias is not None

    # ---- our pipeline, same weights/data ----
    params = load_swin(CFG, sd)
    cfg = Config(w_bit=bits, a_bit=bits, s_bit=bits, qhead_a_bit=bits,
                 eq_n=64, search_round=3, steps=6)
    calib = QuantCalibrator(TinySpec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])
    params_q, qstate = calib.finish_calibration()
    our_logits = np.asarray(swin_forward(CFG, params_q, jnp.asarray(val_np),
                                         qstate, {"*": "quant"}))
    fp_ours = np.asarray(swin_forward(CFG, params, jnp.asarray(val_np)))

    # sanity: identical FP32 function (validates the whole fixture: masks,
    # rel-pos gather, merge order, window round-trips)
    np.testing.assert_allclose(fp_ours, fp_ref, rtol=2e-4, atol=2e-4)

    # our reduction gained its bias through the same reparam
    red_p = tree_get(calib.params,
                     calib.layout["layers.1.downsample.reduction"].param_path)
    assert red_p.b is not None
    ref_red_b = tm.layers[1].downsample.reduction.bias.detach().numpy()

    pairs = []
    for i, d in enumerate(DEPTHS):
        for j in range(d):
            blk = tm.layers[i].blocks[j]
            pairs.append((float(blk.attn.matmul2.A_quantizer.q), float(
                qstate[f"layers.{i}.blocks.{j}.attn.matmul2"].Aq.log_q)))
            pairs.append((float(blk.mlp.fc2.a_quantizer.q), float(
                qstate[f"layers.{i}.blocks.{j}.mlp.fc2"].aq.log_q)))

    return dict(
        q_err_ours=float(np.abs(our_logits - fp_ours).mean()),
        q_err_ref=float(np.abs(ref_logits - fp_ref).mean()),
        agree=float((our_logits.argmax(-1) == ref_logits.argmax(-1)).mean()),
        pairs=pairs, our_logits=our_logits, ref_logits=ref_logits,
        red_b=np.asarray(red_p.b), ref_red_b=ref_red_b)


@pytest.mark.slow
@pytest.mark.parametrize("bits", [4, 6])
def test_swin_full_pipeline_vs_reference(rng, bits):
    r = run_pipelines(rng, bits)

    # both folds derive bias = W'·b from their own channel selections;
    # magnitudes must be in the same regime (exactness is covered by the
    # unit-level fold differential, test_ref_differential.py)
    assert np.linalg.norm(r["red_b"] - r["ref_red_b"]) <= \
        max(1.0, np.linalg.norm(r["ref_red_b"]))

    # quality equivalence of the two quantized models vs their FP32 models.
    # Tolerance evidence (scripts/probe_e2e_ratio.py PROBE_FAMILY=swin, W4A4
    # seeds 1-8): ratio min 0.938 / max 1.080 / geomean 0.987 — symmetric
    # near-tie noise, comfortably inside 1.25.
    q_err_ours, q_err_ref = r["q_err_ours"], r["q_err_ref"]
    assert q_err_ours <= q_err_ref * 1.25 and q_err_ref <= q_err_ours * 1.25, \
        (q_err_ours, q_err_ref)

    # floor 0.45: n=16 random-init argmax is tie-dominated when trajectories
    # fork (see the ViT e2e test / ADALOG_TEST_SEED sweep); q_err binds
    assert r["agree"] >= 0.45, (r["agree"], r["our_logits"].argmax(-1),
                                r["ref_logits"].argmax(-1))

    # per-site spot checks: AdaLog integer bases at every post-softmax
    # matmul and fc2 site. The FPCS joint search forks on fp32 near-ties on
    # rare (seed, site) combinations (the seed sweep saw one ±1-step fc2
    # fork across 8 sites at seed 4) — require a large majority exact;
    # quality equivalence above stays binding.
    exact = sum(rq == oq for rq, oq in r["pairs"])
    assert exact >= int(np.ceil(len(r["pairs"]) * 0.75)), r["pairs"]
