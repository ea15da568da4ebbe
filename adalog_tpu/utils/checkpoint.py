"""Checkpointing.

Reference semantics (test_quant.py:95-127): two whole-run milestones
(calibrated / optimized), each a single file carrying model weights (possibly
reparameterized) plus every quantizer's searched parameters (scale, zero_point,
shift, q, bias_reparamed). Loading restores a ready-to-eval quantized model.

Format: a pickle of numpy-ified pytrees — the param/qstate dataclasses carry
their own static metadata (kinds, bits), so no side-channel schema is needed.
File naming mirrors the reference:
  {model}_w{w}_a{a}_s{s}_{calibsize|optimsize}_{n}.ckpt  (test_quant.py:97-102)
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def checkpoint_name(model: str, cfg, mode: str) -> str:
    assert mode in ("calibrate", "optimize")
    size = cfg.calib_size if mode == "calibrate" else cfg.optim_size
    tag = "calibsize" if mode == "calibrate" else "optimsize"
    return f"{model}_w{cfg.w_bit}_a{cfg.a_bit}_s{cfg.s_bit}_{tag}_{size}.ckpt"


def save_checkpoint(path: str, params, qstate, meta: dict | None = None):
    payload = {
        "version": 1,
        "params": _to_host(params),
        "qstate": _to_host(qstate),
        "meta": meta or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str):
    """Returns (params, qstate, meta), arrays on the default device."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return (_to_device(payload["params"]), _to_device(payload["qstate"]),
            payload.get("meta", {}))
