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


def test_v2_format_is_npz_no_pickle(tmp_path, rng):
    """The v2 file is a plain npz: loadable with allow_pickle=False and
    carrying a JSON schema — no pickled code objects anywhere."""
    import zipfile
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    path = os.path.join(tmp_path, "ck.ckpt")
    save_checkpoint(path, params, qstate)
    assert zipfile.is_zipfile(path)
    with np.load(path, allow_pickle=False) as z:
        assert "__schema__" in z.files


def test_legacy_pickle_still_loads(tmp_path, rng):
    """Round-1 checkpoints were raw pickles of the same pytrees; they must
    keep loading (through the restricted unpickler)."""
    import pickle
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    host = jax.tree_util.tree_map(np.asarray, {"params": params,
                                               "qstate": qstate})
    path = os.path.join(tmp_path, "legacy.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"version": 1, "params": host["params"],
                     "qstate": host["qstate"], "meta": {}}, f)
    p2, q2, _ = load_checkpoint(path)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    y0 = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    y1 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    np.testing.assert_array_equal(y0, y1)


def test_poisoned_pickle_rejected(tmp_path):
    """A pickle that resolves anything outside numpy/adalog_tpu must raise,
    not execute (the arbitrary-code-execution vector in stock pickle)."""
    import pickle
    import pytest

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    path = os.path.join(tmp_path, "evil.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"params": Evil(), "qstate": {}, "meta": {}}, f)
    with pytest.raises(pickle.UnpicklingError, match="forbidden global"):
        load_checkpoint(path)


def test_package_callable_pickle_rejected(tmp_path):
    """The whitelist is by exact (module, name) pair, not module prefix —
    adalog_tpu itself contains REDUCE gadgets (utils.config.load_config
    importlib-execs an arbitrary .py path; data.native_loader.build shells
    out to make), so 'anything under adalog_tpu.*' is NOT a safe rule."""
    import pickle
    import pytest
    from adalog_tpu.utils.config import load_config

    class Gadget:
        def __reduce__(self):
            return (load_config, ("/tmp/attacker.py",))

    path = os.path.join(tmp_path, "gadget.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"params": Gadget(), "qstate": {}, "meta": {}}, f)
    with pytest.raises(pickle.UnpicklingError, match="forbidden global"):
        load_checkpoint(path)


def test_encode_decode_bytes_roundtrip(rng):
    """The framed-resume blob encoder round-trips mixed records exactly and
    contains no pickle (decode loads with allow_pickle=False)."""
    from adalog_tpu.utils.checkpoint import encode_bytes, decode_bytes
    from adalog_tpu.models.layers import LinearP

    lin = LinearP(w=jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
                  b=jnp.zeros((4,), jnp.float32))
    rec = ("fold", "blocks.0.attn.qkv",
           {"lin": lin, "r": np.ones(3, np.float32), "n": 7, "tag": "x"})
    out = decode_bytes(encode_bytes(rec))
    assert out[0] == "fold" and out[1] == "blocks.0.attn.qkv"
    np.testing.assert_array_equal(np.asarray(lin.w), out[2]["lin"].w)
    assert out[2]["n"] == 7 and out[2]["tag"] == "x"
