"""End-to-end calibration + reconstruction on a tiny Swin (the shifted-window
path of BASELINE.json config 4, CPU-sized): exercises window-attention matmul
sites, the PatchMerging reduction reparam (bias created from None), and the
Swin block units in BRECQ."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.swin import SwinConfig, swin_init, swin_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator
from adalog_tpu.calib.layout import quant_layout, tree_get
from adalog_tpu.recon.brecq import BlockReconstructor

CFG = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                 heads=(2, 4), window=4, num_classes=10)  # stage0 block 1 is SHIFTED


class TinySpec:
    family = "swin"
    cfg = CFG


@pytest.fixture(scope="module")
def calibrated():
    cfg = Config(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6, eq_n=32, steps=2,
                 search_round=1, calib_size=8, calib_batch_size=8)
    params = swin_init(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [rng.standard_normal((8, 32, 32, 3)).astype(np.float32)]
    calib = QuantCalibrator(TinySpec, params, cfg)
    prefold, _ = calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    return cfg, params, prefold, new_params, qstate, batches, calib


def test_swin_sites_calibrated(calibrated):
    cfg, _, _, _, qstate, _, calib = calibrated
    assert set(qstate) == set(calib.layout)
    # reduction got reparamed to a per-tensor quantizer and gained a bias
    red = qstate["layers.1.downsample.reduction"]
    assert red.aq.scale.shape == (1,)
    p = tree_get(calib.params,
                 calib.layout["layers.1.downsample.reduction"].param_path)
    assert p.b is not None
    # per-head matmul scales at stage heads
    mm1 = qstate["layers.1.blocks.0.attn.matmul1"]
    assert mm1.Aq.scale.shape == (1, 4, 1, 1)


def test_swin_reparam_preserves_fp32(calibrated):
    _, params0, prefold, _, _, batches, _ = calibrated
    x = jnp.asarray(batches[0])
    y0 = np.asarray(swin_forward(CFG, params0, x))
    y1 = np.asarray(swin_forward(CFG, prefold, x))
    np.testing.assert_allclose(y1, y0, rtol=5e-3, atol=5e-3)


def test_swin_quant_forward_close(calibrated):
    _, params0, _, params1, qstate, batches, _ = calibrated
    x = jnp.asarray(batches[0])
    y_raw = np.asarray(swin_forward(CFG, params0, x))
    y_q = np.asarray(swin_forward(CFG, params1, x, qstate, {"*": "quant"}))
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_raw) / np.linalg.norm(y_raw)
    assert rel < 0.5, rel


def test_swin_brecq_runs(calibrated):
    cfg, params0, _, params1, qstate, batches, calib = calibrated
    cfg2 = Config(**{**cfg.__dict__})
    cfg2.recon_iters = 20
    cfg2.optim_batch_size = 4
    recon = BlockReconstructor(TinySpec, params1, params0, qstate,
                               calib.layout, cfg2)
    new_params, new_qstate = recon.reconstruct(batches, quant_act=True)
    x = jnp.asarray(batches[0])
    out = swin_forward(CFG, new_params, x, new_qstate, {"*": "quant"})
    assert np.isfinite(np.asarray(out)).all()
