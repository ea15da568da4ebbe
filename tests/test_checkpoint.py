"""Checkpoint round-trip: saved (params, qstate) restores to an identical
quantized forward (the reference's --load-calibrate-checkpoint semantics)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, checkpoint_name,
)
from adalog_tpu.calib.init_state import init_qstate

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def test_roundtrip(tmp_path, rng):
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    y0 = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    path = os.path.join(tmp_path, "ck.ckpt")
    save_checkpoint(path, params, qstate, {"model": "tiny"})
    p2, q2, meta = load_checkpoint(path)
    assert meta["model"] == "tiny"
    # static metadata survives
    assert q2["blocks.0.mlp.fc2"].aq.kind == "adalog"
    assert q2["blocks.0.attn.qkv"].n_V == 3
    y1 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    np.testing.assert_array_equal(y0, y1)


def test_checkpoint_naming():
    cfg = Config(w_bit=4, a_bit=4, s_bit=4)
    assert checkpoint_name("deit_small", cfg, "calibrate") == \
        "deit_small_w4_a4_s4_calibsize_32.ckpt"
    assert checkpoint_name("deit_small", cfg, "optimize") == \
        "deit_small_w4_a4_s4_optimsize_1024.ckpt"
