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


# Past this many weight bytes the predictor passes params as jit arguments
# instead of baking them into the executable as constants: the serialized
# HLO grows by the weight bytes (the axon relay's remote-compile rejects
# vit_large's ~600 MB with HTTP 413, and recompiles repeat per checkpoint).
# Below it, baking wins ~3-6% end-to-end (XLA constant-folds the entire
# weight fake-quant pipeline and specializes layouts at compile time —
# deit_small measured 3850 img/s baked vs 3731 best-args, BENCH_r04/r05).
BAKE_LIMIT_BYTES = 128 * 1024 * 1024


def make_predictor(spec, params, qstate, *, eval_dtype: str = "float32",
                   mesh=None, int8_prep=None, cfg=None, bake_weights=None):
    """Build ``predict(images) -> logits`` for a (params, qstate) pair.

    ``mesh``: None, a 1D ('dp',) jax.sharding.Mesh, or a 2D ('dp', 'tp')
    mesh. ``eval_dtype='bfloat16'`` runs the forward in bf16 (quantizer math
    stays fp32 internally) — the shipped fast path on TPU. ``int8_prep``:
    an ``ops.int8_linear.prepare()`` table bound to THIS predictor (not a
    process global), so two loaded models never see each other's codes.
    ``cfg``: when given, fake-quantized weights for the remaining Linear
    sites are ALSO materialized once here (ops/weight_prep.py) — without it
    every call re-quantizes every weight matrix (measured -10% end-to-end
    at deit_base). ``bake_weights``: None = auto by total weight bytes
    (BAKE_LIMIT_BYTES); True/False forces constants vs jit-argument weights.
    """
    import jax
    import jax.numpy as jnp
    from adalog_tpu.models.zoo import model_forward_fn
    from adalog_tpu.ops import int8_linear as _i8
    from adalog_tpu.ops import weight_prep as _wp

    fwd = model_forward_fn(spec)
    dtype = jnp.bfloat16 if eval_dtype == "bfloat16" else jnp.float32

    # cast to the eval dtype ONCE here instead of inside every call
    pp0 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(dtype), params)
    wprep = None
    if cfg is not None:
        wprep = _wp.prepare(spec, pp0, qstate, cfg,
                            skip=set(int8_prep or ()))
    if bake_weights is None:
        n_bytes = sum(a.size * a.dtype.itemsize
                      for a in jax.tree_util.tree_leaves(pp0))
        bake_weights = n_bytes <= BAKE_LIMIT_BYTES
    log.info("predictor: bake_weights=%s", bake_weights)

    if bake_weights:
        # small model: close over everything — XLA constant-folds the weight
        # pipeline and layout-specializes the executable
        @jax.jit
        def fj_baked(x):
            with _i8.activate(int8_prep), _wp.activate(wprep):
                return fwd(spec.cfg, pp0, x.astype(dtype), qstate,
                           {"*": "quant"}).astype(jnp.float32)

        def f_single(x):
            return fj_baked(x)
    else:
        def _body(pp, qs, prep, wp, x):
            # activating INSIDE the traced body makes the tables' arrays
            # traced arguments of this very trace (the layer fns read the
            # active table at trace time), so prepared codes/weights are
            # not constants either
            with _i8.activate(prep), _wp.activate(wp):
                return fwd(spec.cfg, pp, x.astype(dtype), qs,
                           {"*": "quant"}).astype(jnp.float32)

        fj_single = jax.jit(_body)

        def f_single(x):
            return fj_single(pp0, qstate, int8_prep, wprep, x)

    if mesh is None:
        return f_single

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
            # tp weight shards mismatch the full-model prep tables (the
            # layer fns then requantize the local shard), but unsharded
            # sites still hit them — keep the trace-time activation
            if int8_prep is not None:
                with _i8.activate(int8_prep):
                    out = f_tp(shard_batch(x, mesh))
            else:
                out = f_tp(shard_batch(x, mesh))
            return out[:n] if pad else out

        return predict_tp

    from adalog_tpu.parallel.mesh import dp_shard_map, shard_batch

    if bake_weights:
        def local_baked(x):
            with _i8.activate(int8_prep), _wp.activate(wprep):
                return fwd(spec.cfg, pp0, x.astype(dtype), qstate,
                           {"*": "quant"}).astype(jnp.float32)

        f_sm_b = jax.jit(dp_shard_map(local_baked, mesh, n_replicated=0))

        def f_sm(x_sharded):
            return f_sm_b(x_sharded)
    else:
        def local(pp, lqs, prep, wp, x):
            with _i8.activate(prep), _wp.activate(wp):
                return fwd(spec.cfg, pp, x.astype(dtype), lqs,
                           {"*": "quant"}).astype(jnp.float32)

        f_sm_a = jax.jit(dp_shard_map(local, mesh, n_replicated=4))

        def f_sm(x_sharded):
            return f_sm_a(pp0, qstate, int8_prep, wprep, x_sharded)

    def predict_dp(x):
        x = jnp.asarray(x)
        if x.shape[0] % mesh.devices.size == 0:
            return f_sm(shard_batch(x, mesh))
        return f_single(x)        # remainder batch: single-program path

    return predict_dp


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

    from adalog_tpu.ops.kernel_defaults import resolve_kernel_config
    resolve_kernel_config(cfg, spec)   # None = auto -> measured per-model
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
                             mesh=mesh, int8_prep=int8_prep, cfg=cfg)
    return predict, spec, params, qstate
