"""Serving export: StableHLO serialization round-trip equals the live model."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.models.zoo import build_model, model_forward_fn
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.utils.export import export_quantized, load_exported


def test_export_roundtrip(rng):
    cfg = Config(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6)
    spec, params = build_model("test_tiny", seed=0)
    qstate = init_qstate(spec, cfg, params)
    fwd = model_forward_fn(spec)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    want = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))

    blob = export_quantized(spec, params, qstate, batch_size=4)
    assert isinstance(blob, bytes) and len(blob) > 1000
    served = load_exported(blob)
    got = np.asarray(served(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
