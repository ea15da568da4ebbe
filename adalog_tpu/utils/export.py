"""Deployment export of calibrated models.

The reference stops at fake-quantized torch checkpoints; for production
serving we additionally export the quantized forward as a serialized StableHLO
artifact (jax.export): device-agnostic, loadable without the Python model
definition, and AOT-compilable by any XLA runtime (TPU serving stacks, IFRT).
The quantizer math is baked into the exported computation; only image batches
cross the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adalog_tpu.models.zoo import ModelSpec, model_forward_fn


def make_serving_fn(spec: ModelSpec, params, qstate, *,
                    eval_dtype: str = "float32"):
    """Closure (images NHWC float32) -> logits float32, all params baked in."""
    fwd = model_forward_fn(spec)
    dtype = jnp.bfloat16 if eval_dtype == "bfloat16" else jnp.float32
    cast = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    def serve(x):
        return fwd(spec.cfg, cast, x.astype(dtype), qstate,
                   {"*": "quant"}).astype(jnp.float32)

    return serve


def export_quantized(spec: ModelSpec, params, qstate, batch_size: int, *,
                     eval_dtype: str = "float32",
                     platforms=None) -> bytes:
    """Serialize the quantized forward to a StableHLO artifact (bytes)."""
    serve = make_serving_fn(spec, params, qstate, eval_dtype=eval_dtype)
    s = spec.cfg.img_size
    x_spec = jax.ShapeDtypeStruct((batch_size, s, s, 3), jnp.float32)
    exported = jax.export.export(
        jax.jit(serve),
        platforms=platforms or [jax.default_backend()])(x_spec)
    return bytes(exported.serialize())


def load_exported(blob: bytes):
    """Deserialize and return a callable (images) -> logits."""
    exported = jax.export.deserialize(blob)
    return lambda x: exported.call(x)
