"""Layer-batched calibration: vmapped same-shape site searches produce the
same quantizer states as per-site searches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


@pytest.mark.slow
def test_batched_equals_sequential(rng):
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    states = {}
    for flag in (False, True):
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1, batch_sites=flag)
        calib = QuantCalibrator(TinySpec, params, cfg)
        calib.calibrate(batches)
        p, q = calib.finish_calibration()
        states[flag] = (p, q)

    p0, q0 = states[False]
    p1, q1 = states[True]
    assert set(q0) == set(q1)
    for nm in q0:
        l0 = jax.tree_util.tree_leaves(q0[nm])
        l1 = jax.tree_util.tree_leaves(q1[nm])
        for a, b in zip(l0, l1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=nm)

    x = jnp.asarray(batches[0])
    y0 = np.asarray(vit_forward(CFG, p0, x, q0, {"*": "quant"}))
    y1 = np.asarray(vit_forward(CFG, p1, x, q1, {"*": "quant"}))
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_group_chunking_equals_unchunked(rng):
    """batch_group_bytes caps the stacked device bytes of one vmapped group
    (vit_large-scale groups crash the TPU worker otherwise); chunked groups
    must produce identical states."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    states = {}
    for budget in (1 << 30, 60_000):   # one big group vs ~1-2 jobs per chunk
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1)
        cfg.batch_group_bytes = budget
        calib = QuantCalibrator(TinySpec, params, cfg)
        calib.calibrate(batches)
        p, q = calib.finish_calibration()
        states[budget] = (p, q)

    (p0, q0), (p1, q1) = states[1 << 30], states[60_000]
    assert set(q0) == set(q1)
    for nm in q0:
        for a, b in zip(jax.tree_util.tree_leaves(q0[nm]),
                        jax.tree_util.tree_leaves(q1[nm])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
