"""Checkpointing.

Reference semantics (test_quant.py:95-127): two whole-run milestones
(calibrated / optimized), each a single file carrying model weights (possibly
reparameterized) plus every quantizer's searched parameters (scale, zero_point,
shift, q, bias_reparamed). Loading restores a ready-to-eval quantized model.

Format (version 2): a .npz archive — raw arrays plus one JSON schema string
describing the pytree structure. Dataclass nodes are encoded by NAME against a
whitelist registry, so loading executes no pickled code objects: unknown node
types are a hard error, not an import. File naming mirrors the reference:
  {model}_w{w}_a{a}_s{s}_{calibsize|optimsize}_{n}.ckpt  (test_quant.py:97-102)

Round-1 checkpoints were raw pickles of the same pytrees; ``load_checkpoint``
still reads them through a restricted unpickler that only resolves numpy array
reconstruction and this package's own dataclasses — anything else (the
poisoned-pickle vector) raises.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import pickle
import zipfile

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 2


def _registry():
    """Whitelisted dataclass node types, by stable name."""
    from adalog_tpu.models import vit, swin, layers
    from adalog_tpu.quantizers import state
    classes = [
        layers.LinearP, layers.ConvP, layers.LayerNormP,
        layers.LinearSite, layers.ConvSite, layers.MatMulSite,
        state.QuantizerState, state.WeightQuantizerState,
        vit.ViTParams, vit.BlockP, vit.AttentionP, vit.MlpP,
        swin.SwinParams, swin.SwinStageP, swin.SwinBlockP,
        swin.PatchMergingP, swin.WindowAttentionP,
    ]
    return {c.__name__: c for c in classes}


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


# ---------------------------------------------------------------------------
# v2 encode/decode: JSON structure + npz arrays
# ---------------------------------------------------------------------------

def _encode(obj, arrays: list, names: dict):
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        arrays.append(np.asarray(obj))
        return {"__arr__": len(arrays) - 1}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, dict):
        return {"__dict__": [[_encode(k, arrays, names),
                              _encode(v, arrays, names)]
                             for k, v in obj.items()]}
    if isinstance(obj, tuple):
        return {"__tuple__": [_encode(v, arrays, names) for v in obj]}
    if isinstance(obj, list):
        return {"__list__": [_encode(v, arrays, names) for v in obj]}
    if dataclasses.is_dataclass(obj):
        name = type(obj).__name__
        if name not in names:
            raise TypeError(f"unregistered dataclass in checkpoint: {name}")
        return {"__dc__": name,
                "fields": {f.name: _encode(getattr(obj, f.name), arrays, names)
                           for f in dataclasses.fields(obj)}}
    raise TypeError(f"cannot checkpoint object of type {type(obj)!r}")


def _decode(node, arrays, registry):
    if node is None or isinstance(node, (bool, int, float, str)):
        return node
    if not isinstance(node, dict):
        raise ValueError(f"malformed checkpoint node: {node!r}")
    if "__arr__" in node:
        return arrays[node["__arr__"]]
    if "__dict__" in node:
        return {_decode(k, arrays, registry): _decode(v, arrays, registry)
                for k, v in node["__dict__"]}
    if "__tuple__" in node:
        return tuple(_decode(v, arrays, registry) for v in node["__tuple__"])
    if "__list__" in node:
        return [_decode(v, arrays, registry) for v in node["__list__"]]
    if "__dc__" in node:
        cls = registry.get(node["__dc__"])
        if cls is None:
            raise ValueError(f"checkpoint names unknown dataclass "
                             f"{node['__dc__']!r}; refusing to load")
        return cls(**{k: _decode(v, arrays, registry)
                      for k, v in node["fields"].items()})
    raise ValueError(f"malformed checkpoint node: {list(node)!r}")


def save_checkpoint(path: str, params, qstate, meta: dict | None = None):
    arrays: list = []
    names = _registry()
    schema = {
        "version": FORMAT_VERSION,
        "params": _encode(_to_host(params), arrays, names),
        "qstate": _encode(_to_host(qstate), arrays, names),
        "meta": meta or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {f"a{i}": a for i, a in enumerate(arrays)}
    payload["__schema__"] = np.frombuffer(
        json.dumps(schema).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _load_v2(path: str):
    with np.load(path, allow_pickle=False) as z:
        schema = json.loads(bytes(z["__schema__"]).decode())
        n = sum(1 for k in z.files if k.startswith("a"))
        arrays = [z[f"a{i}"] for i in range(n)]
    registry = _registry()
    params = _decode(schema["params"], arrays, registry)
    qstate = _decode(schema["qstate"], arrays, registry)
    return (_to_device(params), _to_device(qstate), schema.get("meta", {}))


def encode_bytes(obj) -> bytes:
    """Encode one pytree as a self-contained npz blob (v2 encoder: arrays +
    JSON schema, no pickled code). Used by the framed calibration-resume
    format (calib/calibrator.py) — each appended record is one such blob."""
    arrays: list = []
    schema = {"version": FORMAT_VERSION,
              "obj": _encode(obj, arrays, _registry())}
    payload = {f"a{i}": a for i, a in enumerate(arrays)}
    payload["__schema__"] = np.frombuffer(
        json.dumps(schema).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


def decode_bytes(data: bytes):
    """Inverse of encode_bytes; loads with allow_pickle=False."""
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        schema = json.loads(bytes(z["__schema__"]).decode())
        n = sum(1 for k in z.files if k.startswith("a"))
        arrays = [z[f"a{i}"] for i in range(n)]
    return _decode(schema["obj"], arrays, _registry())


# ---------------------------------------------------------------------------
# legacy (round-1) pickle loader, restricted
# ---------------------------------------------------------------------------

class _RestrictedUnpickler(pickle.Unpickler):
    """Resolves only numpy reconstruction helpers and this package's
    whitelisted dataclasses, by exact (module, name) pair; any other global
    (the arbitrary-code-execution vector in stock pickle) raises instead of
    importing. A module-prefix whitelist is NOT enough: adalog_tpu contains
    callables a crafted pickle could REDUCE into code execution (e.g.
    utils.config.load_config importlib-execs an arbitrary .py path)."""

    _NUMPY_OK = {
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "scalar"),
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
        ("numpy.core.numeric", "_frombuffer"),
        ("numpy._core.numeric", "_frombuffer"),
    }
    _BUILTINS_OK = ("dict", "list", "tuple", "set", "frozenset")

    @classmethod
    def _allowed_dataclasses(cls):
        cached = getattr(cls, "_dc_cache", None)
        if cached is None:
            cached = {(c.__module__, c.__name__)
                      for c in _registry().values()}
            cls._dc_cache = cached
        return cached

    def find_class(self, module, name):
        if (module, name) in self._NUMPY_OK or \
                module.startswith("numpy.dtypes"):
            return super().find_class(module, name)
        if (module, name) in self._allowed_dataclasses():
            return super().find_class(module, name)
        if module == "builtins" and name in self._BUILTINS_OK:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint pickle references forbidden global "
            f"{module}.{name}; refusing to load")


def load_checkpoint(path: str):
    """Returns (params, qstate, meta), arrays on the default device.

    Dispatches on content: v2 .npz (zip magic) or the legacy round-1 pickle
    (loaded through the restricted unpickler)."""
    if zipfile.is_zipfile(path):
        return _load_v2(path)
    with open(path, "rb") as f:
        payload = _RestrictedUnpickler(f).load()
    return (_to_device(payload["params"]), _to_device(payload["qstate"]),
            payload.get("meta", {}))
