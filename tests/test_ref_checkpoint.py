"""Reference-checkpoint interop: export our calibrated state to the upstream
flat state-dict format, load it back, and verify the quantized forward is
bit-identical — a user can move checkpoints between the two implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.zoo import model_spec
from adalog_tpu.models.vit import vit_forward, vit_init
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator
from adalog_tpu.utils.ref_checkpoint import (
    export_reference_state_dict, load_reference_checkpoint,
)


@pytest.mark.slow
def test_reference_format_roundtrip(tmp_path, rng):
    spec = model_spec("test_tiny")
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32, steps=2,
                 search_round=1)
    params = vit_init(spec.cfg, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 32, 32, 3)).astype(np.float32)]
    calib = QuantCalibrator(spec, params, cfg)
    calib.calibrate(batches)
    params_c, qstate = calib.finish_calibration()

    sd = export_reference_state_dict(spec, cfg, params_c, qstate)
    # reference-checkpoint essentials present
    assert "blocks.0.attn.qkv.weight" in sd
    assert "blocks.0.attn.qkv.w_quantizer.scale" in sd
    assert "blocks.0.mlp.fc2.a_quantizer.q" in sd
    assert "blocks.0.mlp.fc2.a_quantizer.table1" in sd
    assert "blocks.1.attn.matmul2.A_quantizer.q" in sd
    assert bool(sd["blocks.0.mlp.fc2.a_quantizer.bias_reparamed"])

    path = str(tmp_path / "ref_ckpt.npz")
    np.savez(path, **sd)

    params_r, qstate_r = load_reference_checkpoint(spec, cfg, path)
    x = jnp.asarray(batches[0])
    want = np.asarray(vit_forward(spec.cfg, params_c, x, qstate,
                                  {"*": "quant"}))
    got = np.asarray(vit_forward(spec.cfg, params_r, x, qstate_r,
                                 {"*": "quant"}))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_swin_reference_format_roundtrip(tmp_path, rng):
    from adalog_tpu.models.swin import swin_init, swin_forward
    spec = model_spec("test_tiny_swin")
    cfg = Config(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6, eq_n=32, steps=2,
                 search_round=1)
    params = swin_init(spec.cfg, jax.random.PRNGKey(1))
    batches = [rng.standard_normal((8, 32, 32, 3)).astype(np.float32)]
    calib = QuantCalibrator(spec, params, cfg)
    calib.calibrate(batches)
    params_c, qstate = calib.finish_calibration()

    sd = export_reference_state_dict(spec, cfg, params_c, qstate)
    assert "layers.1.blocks.0.attn.relative_position_bias_table" in sd
    assert "layers.1.downsample.reduction.bias" in sd   # created by reparam
    path = str(tmp_path / "ref_swin.npz")
    np.savez(path, **sd)

    params_r, qstate_r = load_reference_checkpoint(spec, cfg, path)
    x = jnp.asarray(batches[0])
    want = np.asarray(swin_forward(spec.cfg, params_c, x, qstate,
                                   {"*": "quant"}))
    got = np.asarray(swin_forward(spec.cfg, params_r, x, qstate_r,
                                  {"*": "quant"}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
