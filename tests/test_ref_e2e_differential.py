"""END-TO-END pipeline differential: the reference's full wrap+calibrate
(actual /root/reference code, fake timm shim, CPU torch) vs our full
calibrate on identical weights and calibration data.

This is the strongest in-image accuracy-parity evidence: it exercises the
reference's site-selection rules (wrap_net.py:55-172), its sequential
calibrator (calibrator.py:9-67), every search family, the LayerNorm channel
reparam, and the post-GeLU bias fold — then compares the two resulting
QUANTIZED MODELS end to end on held-out inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_bridge import cuda_stubs, load_reference_full, make_tiny_timm_vit

from adalog_tpu.models.vit import ViTConfig, vit_forward
from adalog_tpu.models.load import load_vit
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator

IMG, PATCH, DIM, DEPTH, HEADS, CLASSES = 16, 8, 32, 2, 2, 10
CFG = ViTConfig(img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH,
                heads=HEADS, num_classes=CLASSES)


class TinySpec:
    family = "vit"
    cfg = CFG


def make_ref_cfg(bits: int):
    """The reference Config surface consumed by wrap_modules_in_net."""
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


RefCfg = make_ref_cfg(4)


def run_pipelines(rng, bits):
    """Run the reference pipeline (actual upstream code) and ours on
    identical weights/data; return the comparison statistics. Shared by the
    test below and scripts/probe_e2e_ratio.py (seed-sweep evidence)."""
    ref = load_reference_full()
    tm = make_tiny_timm_vit(IMG, PATCH, DIM, DEPTH, HEADS, CLASSES, seed=0)
    import torch
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    calib_np = rng.standard_normal((8, IMG, IMG, 3)).astype(np.float32)
    val_np = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)

    # ---- reference pipeline (actual upstream code) ----
    with cuda_stubs() as torch:
        with torch.no_grad():
            fp_ref = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()
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

    # ---- our pipeline, same weights/data ----
    params = load_vit(CFG, sd)
    cfg = Config(w_bit=bits, a_bit=bits, s_bit=bits, qhead_a_bit=bits,
                 eq_n=64, search_round=3, steps=6)
    calib = QuantCalibrator(TinySpec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])
    params_q, qstate = calib.finish_calibration()
    our_logits = np.asarray(vit_forward(CFG, params_q, jnp.asarray(val_np),
                                        qstate, {"*": "quant"}))
    fp_ours = np.asarray(vit_forward(CFG, params, jnp.asarray(val_np)))

    # sanity: the FP32 models are the same function
    np.testing.assert_allclose(fp_ours, fp_ref, rtol=2e-4, atol=2e-4)

    q_err_ref = float(np.abs(ref_logits - fp_ref).mean())
    q_err_ours = float(np.abs(our_logits - fp_ours).mean())
    agree = float((our_logits.argmax(-1) == ref_logits.argmax(-1)).mean())
    pairs = []
    for i in range(DEPTH):
        blk = tm.blocks[i]
        pairs.append((float(blk.attn.matmul2.A_quantizer.q),
                      float(qstate[f"blocks.{i}.attn.matmul2"].Aq.log_q)))
        pairs.append((float(blk.mlp.fc2.a_quantizer.q),
                      float(qstate[f"blocks.{i}.mlp.fc2"].aq.log_q)))
    # the exact artifact the reference CLI writes after calibration
    # (test_quant.py:95-106 saves model.state_dict() post finish_training)
    ref_sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}
    return dict(q_err_ours=q_err_ours, q_err_ref=q_err_ref, agree=agree,
                pairs=pairs, our_logits=our_logits, ref_logits=ref_logits,
                ref_state_dict=ref_sd, val_np=val_np)


@pytest.mark.slow
@pytest.mark.parametrize("bits", [4, 3, 6])
def test_full_pipeline_vs_reference(rng, bits):
    """Parametrized over the three shipped bit widths (configs/{3,4,6}bit.py):
    3-bit stresses the zp grid num_zp=min(16, n_levels)=4 and the AdaLog
    table at n_levels=4; 6-bit the fine-grid end."""
    r = run_pipelines(rng, bits)

    # The two pipelines' selections match exactly at every AdaLog site and
    # at most uniform sites; they diverge at the LayerNorm-reparam sites,
    # where per-channel fp32 near-ties cascade through the mean-coupled
    # rescale r into the rewritten weights (each pipeline then optimizes its
    # own captures). The right equivalence criterion is QUALITY: both
    # quantized models must be equally good approximations of the FP32
    # model, and mostly agree in prediction. Tolerance calibrated by the
    # seed sweep (scripts/probe_e2e_ratio.py): W4A4 seeds 1-12 ratio
    # min 0.945 / max 1.227 / geomean 1.049; W6A6 seeds 1-8 min 0.869 /
    # max 1.199 / geomean 1.039; W3A3 seeds 1-8 min 0.889 / max 1.025 /
    # geomean 0.964 — noise in BOTH directions at these tiny random-init
    # shapes; 1.3 bounds the observed max.
    q_err_ours, q_err_ref = r["q_err_ours"], r["q_err_ref"]
    assert q_err_ours <= q_err_ref * 1.3 and q_err_ref <= q_err_ours * 1.3, \
        (q_err_ours, q_err_ref)

    # random-init quantized logits are near-tied (the seed sweep saw val
    # sets where only 2 of 10 classes ever win), so argmax agreement between
    # two equally-good models whose reparam trajectories forked is
    # noise-dominated at n=16 — the q_err ratio above is the meaningful
    # criterion; the floor only catches gross divergence
    assert r["agree"] >= 0.45, (r["agree"], r["our_logits"].argmax(-1),
                                r["ref_logits"].argmax(-1))

    # per-site spot checks: the AdaLog integer bases selected by both
    # pipelines at the post-softmax and fc2 sites. At 3-bit the joint
    # (scale, q) landscape is degenerate (8 levels over a tiny range: many
    # bases give near-identical grids) and the FPCS trajectory forks on fp32
    # near-ties — the seed sweep measured forks with fp64 objective ratios
    # 0.97-1.02 in BOTH directions — so a minority of fork sites is allowed
    # there; the q_err equivalence above stays binding. 4/6-bit are stable:
    # exact equality at every site, every seed.
    pairs = r["pairs"]
    exact = sum(rq == oq for rq, oq in pairs)
    need = (int(np.ceil(len(pairs) * 0.75)) if bits != 3
            else (len(pairs) + 1) // 2)
    assert exact >= need, pairs


@pytest.mark.slow
def test_reference_produced_checkpoint_loop(rng, tmp_path):
    """Close the interop loop FROM THE REFERENCE SIDE: torch.save the actual
    reference-calibrated model's state_dict (the exact .pth artifact
    test_quant.py:95-106 writes), pull it through load_reference_checkpoint
    -> serve.make_predictor, and require the served model to reproduce the
    reference's own quantized logits. Unlike test_ref_checkpoint.py (which
    round-trips our exporter), every tensor here was produced by upstream
    torch code."""
    import torch
    from adalog_tpu.models.vit import vit_init
    from adalog_tpu.utils.ref_checkpoint import load_reference_checkpoint
    from adalog_tpu.serve import make_predictor

    r = run_pipelines(rng, 4)
    path = str(tmp_path / "ref_calib.pth")
    torch.save(r["ref_state_dict"], path)

    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=64,
                 search_round=3, steps=6)
    # base params are fully overwritten by the checkpoint's (reparamed)
    # backbone weights; pass a random init to prove nothing leaks through
    base = vit_init(CFG, jax.random.PRNGKey(7))
    params_r, qstate_r = load_reference_checkpoint(TinySpec, cfg, path,
                                                   params=base)
    predict = make_predictor(TinySpec, params_r, qstate_r)
    got = np.asarray(predict(jnp.asarray(r["val_np"])))

    # same quantized function, two implementations: only fp accumulation
    # order differs, except where a pre-round value sits within fp noise of
    # a rounding boundary (one LSB flip moves a tiny-model logit ~1e-2) —
    # bound the bulk tightly and allow isolated boundary flips via argmax
    ref_logits = r["ref_logits"]
    err = np.abs(got - ref_logits)
    assert np.median(err) < 2e-3, (np.median(err), err.max())
    assert (got.argmax(-1) == ref_logits.argmax(-1)).mean() >= 0.94


@pytest.mark.slow
def test_full_optimize_pipeline_vs_reference(rng):
    """--optimize differential: both pipelines run calibrate + BRECQ block
    reconstruction (reduced iters) on identical weights/data. RNG streams
    for batch sampling necessarily differ (torch.randperm vs jax.random), so
    the criterion is quality: both reconstructed quantized models must
    approximate FP32 equally well, and the hard-freeze orchestration must
    leave both models in eval-ready state (block_recon.py:139-157)."""
    import copy
    ref = load_reference_full()
    import utils.block_recon as ref_br

    tm = make_tiny_timm_vit(IMG, PATCH, DIM, DEPTH, HEADS, CLASSES, seed=0)
    import torch as _t0
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    calib_np = rng.standard_normal((8, IMG, IMG, 3)).astype(np.float32)
    val_np = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)
    ITERS = 60

    with cuda_stubs() as torch:
        full_model = copy.deepcopy(tm)
        with torch.no_grad():
            fp_ref = tm(torch.tensor(val_np.transpose(0, 3, 1, 2))).numpy()
        ref.wrap_net.wrap_modules_in_net(tm, RefCfg, reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(8))]
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        recon = ref_br.BlockReconstructor(tm, full_model, loader)
        # reconstruct_model with reduced iters (its body, block_recon.py:139-157)
        device = torch.device("cpu")
        for m in tm.modules():
            if hasattr(m, "mode"):
                m.mode = "raw"
        for name in recon.blocks.keys():
            recon.init_block_raw_data(recon.blocks[name],
                                      recon.full_blocks[name], name, device)
            recon.reconstruct_single_block(name, recon.blocks[name], device,
                                           batch_size=8, iters=ITERS,
                                           quant_act=True)
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
            ref_logits = tm(torch.tensor(
                val_np.transpose(0, 3, 1, 2))).numpy()

    # ---- ours ----
    from adalog_tpu.recon.brecq import BlockReconstructor
    from adalog_tpu.calib.layout import quant_layout

    params = load_vit(CFG, sd)
    params_full = jax.tree_util.tree_map(lambda a: a, params)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                 search_round=3, steps=6, recon_iters=ITERS,
                 optim_batch_size=8)
    calib = QuantCalibrator(TinySpec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])
    recon2 = BlockReconstructor(TinySpec, params_q, params_full, qstate,
                                quant_layout(TinySpec, cfg, reparam=True),
                                cfg)
    params_q, qstate = recon2.reconstruct([calib_np], quant_act=True)
    calib.params, calib.qstate = params_q, dict(qstate)
    params_q, qstate = calib.finish_calibration()

    our_logits = np.asarray(vit_forward(CFG, params_q, jnp.asarray(val_np),
                                        qstate, {"*": "quant"}))
    fp_ours = np.asarray(vit_forward(CFG, params, jnp.asarray(val_np)))
    np.testing.assert_allclose(fp_ours, fp_ref, rtol=2e-4, atol=2e-4)

    q_err_ref = float(np.abs(ref_logits - fp_ref).mean())
    q_err_ours = float(np.abs(our_logits - fp_ours).mean())
    # wider than the calibrate-only gate: BRECQ adds optimizer stochasticity
    # (torch.randperm vs jax.random batch sampling) on top of the reparam
    # forks; the seed sweep measured ratios to 0.80 (OURS 25% better after
    # reconstruction, seed 31) — 1.4 bounds the observed spread
    assert q_err_ours <= q_err_ref * 1.4 and q_err_ref <= q_err_ours * 1.4, \
        (q_err_ours, q_err_ref)
    # random-init logits are near-uniform, so argmax is tie-dominated on a
    # 16-sample val set; the floor only catches gross divergence (0.45:
    # binomial noise at n=16 — the seed sweep saw 0.5 from two equally-good
    # models whose BRECQ RNG streams necessarily differ)
    agree = (our_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree >= 0.45, agree
