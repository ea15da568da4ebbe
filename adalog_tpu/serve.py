"""Serving API: a quantized model as one jitted batch predictor.

The reference has no deployment story beyond its test loop
(test_quant.py:197-241 evaluates inline). This module is the TPU-native
serving surface: build/load a quantized model once, get back a single
``predict(images) -> logits`` callable that hides the device-mesh layout —

  - no mesh: one jitted program on the default device;
  - 1D mesh ('dp',): the whole per-device forward runs inside
    ``jax.shard_map`` on the batch shard, so the fused Pallas attention
    kernels stay active (GSPMD would insert all-gathers around the opaque
    pallas_call); remainder batches take the single-program path;
  - 2D mesh ('dp', 'tp'): Megatron tensor parallelism inside shard_map
    (parallel/tp.py) — column/row-parallel weights, per-head quantizer
    state sharded, in-forward psum over ICI; remainder batches are padded
    to a dp multiple and sliced back (a single-device fallback would
    materialize every unsharded weight on one chip, defeating tp for
    exactly the models that need it).

Inputs are NHWC float32 images (use data/imagenet.py transforms for parity
with the reference's timm pipeline); outputs are fp32 logits.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

log = logging.getLogger("adalog_tpu")


def make_predictor(spec, params, qstate, *, eval_dtype: str = "float32",
                   mesh=None, int8_prep=None):
    """Build ``predict(images) -> logits`` for a (params, qstate) pair.

    ``mesh``: None, a 1D ('dp',) jax.sharding.Mesh, or a 2D ('dp', 'tp')
    mesh. ``eval_dtype='bfloat16'`` runs the forward in bf16 (quantizer math
    stays fp32 internally) — the shipped fast path on TPU. ``int8_prep``:
    an ``ops.int8_linear.prepare()`` table; it is activated around every
    predictor call (including the lazy first-trace) so THIS load's weight
    codes are baked in even if another model is loaded in between.
    """
    import jax
    import jax.numpy as jnp
    from adalog_tpu.models.zoo import model_forward_fn

    fwd = model_forward_fn(spec)
    dtype = jnp.bfloat16 if eval_dtype == "bfloat16" else jnp.float32

    def _with_prep(fn):
        if int8_prep is None:
            return fn
        from adalog_tpu.ops import int8_linear

        def wrapped(x):
            with int8_linear.activate(int8_prep):
                return fn(x)
        return wrapped

    @jax.jit
    def f_single(x):
        x = x.astype(dtype)
        pp = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        return fwd(spec.cfg, pp, x, qstate, {"*": "quant"}).astype(jnp.float32)

    if mesh is None:
        return _with_prep(f_single)

    if "tp" in mesh.axis_names:
        from adalog_tpu.parallel.mesh import shard_batch
        from adalog_tpu.parallel.tp import tp_eval_fn

        f_tp, plan = tp_eval_fn(spec, fwd, params, qstate, mesh, dtype=dtype)
        log.info("shard_map tp eval: %d column / %d row sites sharded",
                 len(plan.col_sites), len(plan.row_sites))
        dp_n = mesh.shape["dp"]

        def predict_tp(x):
            x = jnp.asarray(x)
            n = x.shape[0]
            pad = (-n) % dp_n
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            out = f_tp(shard_batch(x, mesh))
            return out[:n] if pad else out

        return _with_prep(predict_tp)

    from adalog_tpu.parallel.mesh import dp_shard_map, shard_batch

    def local(pp, lqs, x):
        return fwd(spec.cfg, pp, x, lqs, {"*": "quant"}).astype(jnp.float32)

    sm = dp_shard_map(local, mesh, n_replicated=2)

    @jax.jit
    def f_sm(x):
        x = x.astype(dtype)
        pp = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        return sm(pp, qstate, x)

    def predict_dp(x):
        x = jnp.asarray(x)
        if x.shape[0] % mesh.devices.size == 0:
            return f_sm(shard_batch(x, mesh))
        return f_single(x)        # remainder batch: single-program path

    return _with_prep(predict_dp)


def load_quantized(model: str, checkpoint: str, *, config=None,
                   eval_dtype: Optional[str] = None, mesh_devices: int = 0,
                   mesh_tp: int = 1, use_pallas: Optional[bool] = None,
                   checkpoint_path: Optional[str] = None):
    """One-call deployment: model name + quantized checkpoint -> predictor.

    ``checkpoint`` accepts our native .ckpt (v2 npz) or a reference-format
    torch state_dict (.pth/.bin, test_quant.py:109-127 semantics — requires
    ``checkpoint_path``/random weights to rebuild the fp params it patches).
    ``config``: a Config object or path to a config .py (defaults to the
    shipped 4-bit config values). Returns (predict, spec, params, qstate).
    """
    import jax
    from adalog_tpu.models.zoo import build_model
    from adalog_tpu.utils.config import Config, load_config

    if config is None:
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    elif isinstance(config, str):
        cfg = load_config(config)
    else:
        cfg = config
    if eval_dtype is None:
        eval_dtype = getattr(cfg, "eval_dtype", "float32")

    if checkpoint.endswith((".pth", ".pt", ".bin")):
        # reference torch state_dicts patch fp params, so those are needed
        from adalog_tpu.models.zoo import build_model
        from adalog_tpu.utils.ref_checkpoint import load_reference_checkpoint
        spec, params = build_model(model, seed=0,
                                   checkpoint_path=checkpoint_path)
        params, qstate = load_reference_checkpoint(spec, cfg, checkpoint,
                                                   params)
    else:
        # native .ckpt carries the full params — don't random-init a large
        # model only to throw the arrays away
        from adalog_tpu.models.zoo import model_spec
        from adalog_tpu.utils.checkpoint import load_checkpoint
        spec = model_spec(model)
        params, qstate, _ = load_checkpoint(checkpoint)

    enable = cfg.use_pallas if use_pallas is None else use_pallas
    if enable:
        from adalog_tpu.ops import fq_attn
        fq_attn.set_enabled(True)
    int8_prep = None
    if getattr(cfg, "eval_int8", False):
        from adalog_tpu.ops import int8_linear
        int8_linear.set_enabled(True)
        int8_prep = int8_linear.prepare(spec, params, qstate, cfg,
                                        cast_dtype=eval_dtype)
        log.info("int8 eval: weight codes materialized for %d sites",
                 len(int8_prep))

    mesh = None
    if mesh_tp > 1 and not mesh_devices:
        raise ValueError("mesh_tp > 1 requires mesh_devices (the total "
                         "device count, dp*tp)")
    if mesh_devices:
        n_local = len(jax.devices())
        n = n_local if mesh_devices == -1 else mesh_devices
        if n > n_local:
            raise ValueError(f"mesh_devices={n} > {n_local} local devices")
        if mesh_tp > 1:
            if n % mesh_tp:
                raise ValueError(f"mesh_tp={mesh_tp} must divide "
                                 f"mesh_devices={n}")
            from adalog_tpu.parallel.mesh import make_mesh_2d
            mesh = make_mesh_2d(n // mesh_tp, mesh_tp)
        elif n > 1:
            from adalog_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n)

    predict = make_predictor(spec, params, qstate, eval_dtype=eval_dtype,
                             mesh=mesh, int8_prep=int8_prep)
    return predict, spec, params, qstate
