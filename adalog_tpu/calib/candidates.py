"""Candidate generation for the calibration search.

Percentile-derived scale grids crossed with an integer zero-point grid,
mirroring the reference's candidate construction:
  weights    linear.py:432-451 (per row-group, num_zp = min(16, N))
  activations linear.py:453-481 (per tensor/channel, num_zp = min(16, 2N))
  matmul     matmul.py:211-240 (per head)
  post-GeLU  linear.py:763-814 (percentile over positive values only)

Candidate e decomposes as (zp_index, scale_index) with scale varying fastest —
the FPCS delta (step between adjacent scale candidates) relies on this layout.

Everything is exact: quantiles are computed by full sorts on-device instead of
the reference's OOM-retry minibatch approximations (linear.py:459-471,
matmul.py:216-230); with mini_batch_size=1 those loops compute the exact
quantile anyway, so this is the no-OOM limit of the reference semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def _zp_grid(bits: int, num_zp: int) -> jnp.ndarray:
    N = 2 ** (bits - 1)
    return jnp.arange(N - num_zp // 2, N + num_zp // 2, dtype=jnp.float32)


def weight_candidates(w_v, bits: int, eq_n: int, l=0.9, r=1.0):
    """w_v: (V, R, I) -> scales2d/zps2d (eq_n, V*R) canonical unit layout."""
    N = 2 ** (bits - 1)
    num_zp = min(16, N, eq_n)
    num_scale = eq_n // num_zp
    V, R, _ = w_v.shape
    pct = jnp.asarray([l, r], jnp.float32)
    uppers = jnp.quantile(w_v, pct, axis=-1)          # (2, V, R)
    lowers = jnp.quantile(w_v, 1.0 - pct, axis=-1)    # (2, V, R)
    delta_min = (uppers[0] - lowers[0]).reshape(1, V * R)
    delta_max = (uppers[1] - lowers[1]).reshape(1, V * R)
    splits = jnp.linspace(0.0, 1.0, num_scale)[:, None] * (delta_max - delta_min)
    scales = jnp.tile((delta_min + splits) / (2 * N - 1), (num_zp, 1))
    zps = jnp.repeat(_zp_grid(bits, num_zp), num_scale)[:, None]
    return scales, jnp.broadcast_to(zps, scales.shape)


def act_candidates(x2d, bits: int, eq_n: int, *, channel_wise: bool,
                   l=0.9, r=1.0):
    """x2d: (T, I) -> scales2d/zps2d of shape (eq_n, 1) or (eq_n, I)."""
    N = 2 ** (bits - 1)
    num_zp = min(16, 2 * N, eq_n)
    num_scale = eq_n // num_zp
    pct = jnp.asarray([l, r], jnp.float32)
    if channel_wise:
        uppers = jnp.quantile(x2d, pct, axis=0)       # (2, I)
        lowers = jnp.quantile(x2d, 1.0 - pct, axis=0)
    else:
        flat = x2d.reshape(-1)
        uppers = jnp.quantile(flat, pct)[:, None]     # (2, 1)
        lowers = jnp.quantile(flat, 1.0 - pct)[:, None]
    delta_min = (uppers[0] - lowers[0])[None, :]
    delta_max = (uppers[1] - lowers[1])[None, :]
    splits = jnp.linspace(0.0, 1.0, num_scale)[:, None] * (delta_max - delta_min)
    scales = jnp.clip(jnp.tile((delta_min + splits) / (2 * N - 1), (num_zp, 1)),
                      1e-4, None)
    zps = jnp.repeat(_zp_grid(bits, num_zp), num_scale)[:, None]
    return scales, jnp.broadcast_to(zps, scales.shape)


def matmul_candidates(op, bits: int, eq_n: int, *, head_channel_wise: bool,
                      l=0.9, r=1.0):
    """op: (N, H, S, C) -> scales2d/zps2d (eq_n, H) or (eq_n, 1).

    num_zp follows the B-operand bit width in the reference for both operands
    (matmul.py:212); callers pass the B bits here.
    """
    N = 2 ** (bits - 1)
    num_zp = min(16, N, eq_n)
    num_scale = eq_n // num_zp
    pct = jnp.asarray([l, r], jnp.float32)
    if head_channel_wise:
        H = op.shape[1]
        per_head = jnp.moveaxis(op, 1, 0).reshape(H, -1)
        uppers = jnp.quantile(per_head, pct, axis=-1)  # (2, H)
        lowers = jnp.quantile(per_head, 1.0 - pct, axis=-1)
    else:
        flat = op.reshape(-1)
        uppers = jnp.quantile(flat, pct)[:, None]
        lowers = jnp.quantile(flat, 1.0 - pct)[:, None]
    delta_min = (uppers[0] - lowers[0])[None, :]
    delta_max = (uppers[1] - lowers[1])[None, :]
    splits = jnp.linspace(0.0, 1.0, num_scale)[:, None] * (delta_max - delta_min)
    scales = jnp.tile((delta_min + splits) / (2 * N - 1), (num_zp, 1))
    zps = jnp.repeat(_zp_grid(bits, num_zp), num_scale)[:, None]
    return scales, jnp.broadcast_to(zps, scales.shape)


def positive_percentile(flat, qs):
    """Percentile over strictly-positive values (linear.py:763-798).

    flat: (M,) raw values; qs: (K,) percentiles. rank = clip(ceil(count*q)-1, 0)
    over the ascending-sorted positives; 0 when no positives exist.
    """
    pos = flat > 0
    count = jnp.sum(pos)
    # push non-positives to the end of the sort with +inf
    sorted_pos = jnp.sort(jnp.where(pos, flat, jnp.inf))
    ranks = jnp.clip(jnp.ceil(count * qs).astype(jnp.int32) - 1, 0, flat.size - 1)
    vals = sorted_pos[ranks]
    return jnp.where(count > 0, vals, 0.0)


def postgelu_scale_candidates(x2d, shift, eq_n: int, l=0.9, r=1.0):
    """Post-GeLU scale grid: eq_n points interpolated between the l/r positive
    percentiles of (x + shift handled by caller) (linear.py:800-814).

    Returns (ud, scales2d): ud (2,) percentile endpoints (+shift), scales2d
    (eq_n, 1)."""
    ud = positive_percentile(x2d.reshape(-1), jnp.asarray([l, r], jnp.float32))
    ud = ud + shift
    t = jnp.arange(eq_n, dtype=jnp.float32) / (eq_n - 1)
    scales = (ud[0] + (ud[1] - ud[0]) * t)[:, None]
    return ud, scales
