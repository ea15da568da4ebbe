"""Model-level Pallas dispatch: quantized forward with the fused kernels
(interpret mode) equals the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.ops import fq_gemm, fq_attn

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=1, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def test_pallas_model_path_matches_xla(rng, monkeypatch):
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    # make act quantizer params realistic so the kernels do real work
    for nm, site in list(qstate.items()):
        if hasattr(site, "aq") and site.aq.kind == "uniform" and \
                site.aq.zero_point is not None:
            qstate[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full_like(site.aq.scale, 0.05),
                zero_point=jnp.full_like(site.aq.zero_point, 8.0)))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))

    want = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    fq_gemm.INTERPRET = True
    fq_attn.INTERPRET = True
    # force 'enabled' despite the CPU test backend — fq_attn too, so the
    # fully fused flash attention path runs (interpret mode) in-model
    monkeypatch.setattr(fq_gemm, "enabled", lambda: True)
    monkeypatch.setattr(fq_attn, "enabled", lambda: True)
    try:
        got = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    finally:
        fq_gemm.INTERPRET = False
        fq_attn.INTERPRET = False

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flash_swin_model_path_matches_xla(rng, monkeypatch):
    """Swin quantized forward with the flash attention kernel (interpret
    mode) equals the XLA path — exercises the rel-pos-bias (+ shifted-window
    mask) fold into the kernel's period-P additive logit bias, which only
    the in-model dispatch builds (swin.py, not the kernel-level tests)."""
    from adalog_tpu.models.zoo import model_spec, build_model, \
        model_forward_fn

    spec, params = build_model("test_tiny_swin", seed=0)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    qstate = init_qstate(spec, cfg, params)
    fwd = model_forward_fn(spec)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    want = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))

    fq_attn.INTERPRET = True
    monkeypatch.setattr(fq_attn, "enabled", lambda: True)
    calls = []
    real_run_flash = fq_attn.run_flash
    monkeypatch.setattr(
        fq_attn, "run_flash",
        lambda *a, **k: calls.append(1) or real_run_flash(*a, **k))
    try:
        got = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))
    finally:
        fq_attn.INTERPRET = False

    # depths (1, 2): stage-1 block 1 is shifted (mask path) — all three
    # attention sites must have gone through the flash kernel
    assert len(calls) == 3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
