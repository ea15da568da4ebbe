"""End-to-end calibration with the alternate post-GeLU / post-Softmax
quantizer configs (cfg.post_gelu_quantizer / post_softmax_quantizer in
{log2, logsqrt2, ptq4vit}; wrap_net.py:110-116, 154-163)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=1, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def _run(post_gelu, post_softmax, rng):
    cfg = Config(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6, eq_n=32, steps=2,
                 search_round=1, post_gelu_quantizer=post_gelu,
                 post_softmax_quantizer=post_softmax)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    calib = QuantCalibrator(TinySpec, params, cfg)
    calib.calibrate(batches)
    p, q = calib.finish_calibration()
    x = jnp.asarray(batches[0])
    out = vit_forward(CFG, p, x, q, {"*": "quant"})
    assert np.isfinite(np.asarray(out)).all()
    return params, p, q, x


@pytest.mark.slow
def test_log2_variants(rng):
    params0, p, q, x = _run("log2", "log2", rng)
    fc2 = q["blocks.0.mlp.fc2"]
    assert fc2.aq.kind == "log2" and fc2.aq.shifted
    assert fc2.aq.log_q is None          # downgraded from the adalog search
    mm2 = q["blocks.0.attn.matmul2"]
    assert mm2.Aq.kind == "log2" and mm2.Aq.log_q is None


@pytest.mark.slow
def test_logsqrt2_variants(rng):
    _, p, q, x = _run("logsqrt2", "logsqrt2", rng)
    assert q["blocks.0.mlp.fc2"].aq.kind == "logsqrt2"
    assert q["blocks.0.attn.matmul2"].Aq.kind == "logsqrt2"


@pytest.mark.slow
def test_ptq4vit_twin_fc2(rng):
    _, p, q, x = _run("ptq4vit", "adalog", rng)
    fc2 = q["blocks.0.mlp.fc2"]
    assert fc2.aq.kind == "twin" and fc2.aq.scale.shape == (2, 1)
    # negative scale fixed at GELU_MIN/N (linear.py:653-657)
    from adalog_tpu.quantizers.state import GELU_MIN
    np.testing.assert_allclose(float(fc2.aq.scale[1, 0]),
                               GELU_MIN / 2 ** 5, rtol=1e-6)
