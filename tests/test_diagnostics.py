"""Per-site diagnostics report + bit-width monotonicity of calibrated error."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator
from adalog_tpu.utils.diagnostics import site_error_report, log_report

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def _calibrate(bits, batches):
    cfg = Config(w_bit=bits, a_bit=bits, s_bit=bits, qhead_a_bit=bits,
                 eq_n=32, steps=2, search_round=1)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    calib = QuantCalibrator(TinySpec, params, cfg)
    calib.calibrate(batches)
    p, q = calib.finish_calibration()
    return params, p, q, calib.layout


@pytest.mark.slow
def test_report_and_bits_monotonicity(rng):
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    x = jnp.asarray(batches[0])

    rels = {}
    for bits in (4, 8):
        params0, params, qstate, layout = _calibrate(bits, batches)
        y_raw = np.asarray(vit_forward(CFG, params0, x))
        y_q = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
        rels[bits] = (np.linalg.norm(y_q - y_raw) /
                      np.linalg.norm(y_raw))
        if bits == 4:
            rows = site_error_report(TinySpec, params, qstate, layout, batches)
            assert len(rows) == len(qstate)
            lin_rows = [r for r in rows if r["w_only"] is not None]
            assert all(r["quant"] >= 0 for r in rows)
            assert any(r["quant"] > 0 for r in lin_rows)
            log_report(rows)

    # more bits -> lower end-to-end quantization error
    assert rels[8] < rels[4], rels
