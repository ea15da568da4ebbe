"""FPCS hyperparameter search, per quant-site family.

The reference's per-layer `hyperparameter_searching` methods are stateful
Python loops over candidate chunks with host<->device shuttling
(linear.py:525-545, 585-594, 697-721, 969-997; matmul.py:264-283, 360-378;
conv.py:313-334). Here each family is ONE jitted function: candidate
generation, the full FPCS refine schedule and all alternating search rounds
trace into a single XLA program per layer shape — compiled once, reused for
every layer of that shape in the model.

FPCS (Fast Progressive Combining Search): score a percentile-derived candidate
grid, keep the top-k, re-grid around each survivor with a shrinking delta, and
repeat ``steps`` times, final step keeping the top-1. Candidate count is always
eq_n (static shapes). Canonical layout: scales/zps as (E, U) with U independent
units (row-groups, channels, heads, or 1), scale index varying fastest.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from adalog_tpu.calib import candidates as C
from adalog_tpu.ops import scoring as S


# ---------------------------------------------------------------------------
# Generic FPCS over canonical (E, U) candidates
# ---------------------------------------------------------------------------

def _topk_gather(sims, scales, zps, k):
    """sims/scales/zps: (E, U) -> top-k per unit: (k, U) each."""
    _, idx = jax.lax.top_k(sims.T, k)            # (U, k)
    idx = idx.T                                   # (k, U)
    return (jnp.take_along_axis(scales, idx, axis=0),
            jnp.take_along_axis(zps, idx, axis=0))


def fpcs(score2d, scales, zps, *, eq_n: int, steps: int, width: int = 16,
         clamp_min=None):
    """Run the FPCS schedule; returns (best_scale (U,), best_zp (U,)).

    steps=1 degenerates to a single scoring pass over the initial grid, which
    is exactly the reference's fpcs=False path (linear.py:530-534).
    Refine grid per reference linear.py:491-502: offsets (linspace(0,1,cnt)-.5)
    times the current delta, delta shrinking by (cnt-0.5) each step.

    The refine iterations are a lax.scan (identical structure each step, the
    scoring body traces ONCE) — compile time stays flat in ``steps``.
    """
    delta0 = scales[1] - scales[0]                # (U,) adjacent-scale step
    cnt = eq_n // width
    if steps > 1 and cnt < 2:
        # Faithful to the reference, but degenerate: with one child per
        # survivor the refine step is a fixed -0.5*delta shift and the delta
        # DOUBLES each step (delta /= cnt-0.5 = 0.5) — a noise-sensitive
        # random walk instead of a contraction (reference linear.py:491-502
        # with eq_n/width < 2, reachable via the width-32 joint FPCS when
        # eq_n < 64). Shipped configs (eq_n=128) never hit this.
        import logging
        logging.getLogger("adalog_tpu").warning(
            "fpcs: eq_n=%d with width=%d gives refine count 1 — the "
            "refinement degenerates to a diverging scale walk (use eq_n >= "
            "%d)", eq_n, width, 2 * width)
    sims0 = score2d(scales, zps)
    if steps == 1:
        best_s, best_z = _topk_gather(sims0, scales, zps, 1)
        return best_s[0], best_z[0]
    k0 = _topk_gather(sims0, scales, zps, width)
    offs_unit = jnp.linspace(0.0, 1.0, cnt)[:, None] - 0.5   # (cnt, 1)

    def body(carry, _):
        (k_s, k_z), delta = carry
        cands_s = (k_s[:, None, :] + offs_unit[None, :, :] * delta
                   ).reshape(eq_n, -1)
        if clamp_min is not None:
            cands_s = jnp.clip(cands_s, clamp_min, None)
        cands_z = jnp.repeat(k_z, cnt, axis=0)
        sims = score2d(cands_s, cands_z)
        k_next = _topk_gather(sims, cands_s, cands_z, width)
        best = _topk_gather(sims, cands_s, cands_z, 1)
        return (k_next, delta / (cnt - 0.5)), best

    (_, _), bests = lax.scan(body, (k0, delta0), None, length=steps - 1)
    best_s, best_z = bests
    return best_s[-1][0], best_z[-1][0]


def _steps(fpcs_on: bool, steps: int) -> int:
    return steps if fpcs_on else 1


# ---------------------------------------------------------------------------
# Linear family
# ---------------------------------------------------------------------------

def _wq(w_v, scale_u, zp_u, bits):
    """Quantize the viewed weight with per-unit (V*R) params."""
    V, R, _ = w_v.shape
    s = scale_u.reshape(V, R, 1)
    z = zp_u.reshape(V, R, 1)
    return S.uq_asym(w_v, s, z, bits)


def _linear_default_impl(x, y, w, b, *, w_bits: int, a_bits: int, n_V: int,
                         eq_n: int, steps: int, rounds: int, use_fpcs: bool,
                         gram: bool = False, a_gram: bool = False,
                         mem_scale: int = 1):
    """Default asymmetric Linear search (linear.py:525-545), untraced body.

    x: (T, I) flattened input; y: (T, O) raw output; w: (O, I); b: (O,)|None.
    Flow: weight self-FPCS, activation self-FPCS, then ``rounds`` alternating
    output-MSE FPCS passes over weights and activations.
    Returns (w_scale (V,R,1), w_zp, a_scale (1,), a_zp (1,)).
    """
    O, I = w.shape
    V, R = n_V, O // n_V
    w_v = w.reshape(V, R, I)
    tgt = y - b if b is not None else y
    st = _steps(use_fpcs, steps)

    def exp_w(s2d, z2d):
        return (s2d.reshape(-1, V, R, 1), z2d.reshape(-1, V, R, 1))

    # ---- init: self searches (linear.py:527-529) ----
    ws0, wz0 = C.weight_candidates(w_v, w_bits, eq_n)
    w_s, w_z = fpcs(
        lambda s, z: S.score_weight_self(w_v, *exp_w(s, z), w_bits,
                                         mem_scale).reshape(eq_n, V * R),
        ws0, wz0, eq_n=eq_n, steps=st)
    as0, az0 = C.act_candidates(x, a_bits, eq_n, channel_wise=False)
    a_s, a_z = fpcs(
        lambda s, z: S.score_act_self(x, s[:, :, None], z[:, :, None], a_bits,
                                      channel_wise=False, n_batch=1,
                                      mem_scale=mem_scale).reshape(eq_n, 1),
        as0, az0, eq_n=eq_n, steps=st, clamp_min=1e-4)

    # ---- rounds: output-MSE searches (linear.py:536-542), as one lax.scan
    # (the percentile candidate grids are data-independent across rounds, so
    # they are hoisted and reused — identical to the reference's per-round
    # regeneration) ----
    def round_body(carry, _):
        w_s, w_z, a_s, a_z = carry
        x_q = S.uq_asym(x, a_s, a_z, a_bits)
        if gram:
            G, Cm = S.gram_stats(x_q, tgt)
            w_score = lambda s, z: S.score_linear_w_out_gram(
                G, Cm, w_v, *exp_w(s, z), w_bits,
                mem_scale).reshape(eq_n, V * R)
        else:
            w_score = lambda s, z: S.score_linear_w_out(
                x_q, tgt, w_v, *exp_w(s, z), w_bits,
                mem_scale).reshape(eq_n, V * R)
        w_s, w_z = fpcs(w_score, ws0, wz0, eq_n=eq_n, steps=st)
        w_q2 = _wq(w_v, w_s, w_z, w_bits).reshape(O, I)
        if a_gram and O > I:
            # Gram form only pays off where out_features > in_features
            # (qkv/fc1/head); the O-vs-I gate is static, so fc2/proj keep the
            # direct scorer inside the same traced program
            Mw, Gw = S.act_gram_stats(tgt, w_q2)
            a_score = lambda s, z: S.score_linear_a_out_gram(
                x, Mw, Gw, s, z, a_bits, mem_scale)[:, None]
        else:
            a_score = lambda s, z: S.score_linear_a_out(
                x, tgt, w_q2, s, z, a_bits, mem_scale)[:, None]
        a_s, a_z = fpcs(a_score, as0, az0, eq_n=eq_n, steps=st,
                        clamp_min=1e-4)
        return (w_s, w_z, a_s, a_z), None

    (w_s, w_z, a_s, a_z), _ = lax.scan(
        round_body, (w_s, w_z, a_s, a_z), None, length=rounds)

    return (w_s.reshape(V, R, 1), w_z.reshape(V, R, 1), a_s, a_z)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs", "gram", "a_gram"))
def search_linear_default(x, y, w, b, *, w_bits: int, a_bits: int, n_V: int,
                          eq_n: int, steps: int, rounds: int, use_fpcs: bool,
                          gram: bool = False, a_gram: bool = False):
    return _linear_default_impl(x, y, w, b, w_bits=w_bits, a_bits=a_bits,
                                n_V=n_V, eq_n=eq_n, steps=steps, rounds=rounds,
                                use_fpcs=use_fpcs, gram=gram, a_gram=a_gram)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs", "gram", "a_gram"))
def search_linear_default_batched(xs, ys, ws, bs, *, w_bits: int, a_bits: int,
                                  n_V: int, eq_n: int, steps: int, rounds: int,
                                  use_fpcs: bool, gram: bool = False,
                                  a_gram: bool = False):
    """Layer-batched default Linear search: all L same-shape sites (e.g. every
    block's qkv) searched in ONE vmapped program — per-site quantiles, FPCS
    schedules and alternating rounds run lockstep on the MXU, with the scoring
    memory budget divided by L.

    xs: (L, T, I); ys: (L, T, O); ws: (L, O, I); bs: (L, O).
    Returns stacked (w_scale (L,V,R,1), w_zp, a_scale (L,1), a_zp (L,1)).
    """
    L = xs.shape[0]

    def one(x, y, w, b):
        return _linear_default_impl(x, y, w, b, w_bits=w_bits, a_bits=a_bits,
                                    n_V=n_V, eq_n=eq_n, steps=steps,
                                    rounds=rounds, use_fpcs=use_fpcs,
                                    gram=gram, a_gram=a_gram, mem_scale=L)

    return jax.vmap(one)(xs, ys, ws, bs)


def _act_channelwise_impl(x, *, a_bits: int, eq_n: int, steps: int,
                          use_fpcs: bool, mem_scale: int = 1):
    as0, az0 = C.act_candidates(x, a_bits, eq_n, channel_wise=True)
    a_s, a_z = fpcs(
        lambda s, z: S.score_act_self(x, s[:, None, :], z[:, None, :], a_bits,
                                      channel_wise=True, n_batch=1,
                                      mem_scale=mem_scale),
        as0, az0, eq_n=eq_n, steps=_steps(use_fpcs, steps), clamp_min=1e-4)
    return a_s, a_z


@partial(jax.jit, static_argnames=("a_bits", "eq_n", "steps", "use_fpcs"))
def search_act_channelwise(x, *, a_bits: int, eq_n: int, steps: int,
                           use_fpcs: bool):
    """Per-input-channel activation self-search — the pre-reparam stage of the
    channel-wise Linear (linear.py:585-594). Returns (scale (I,), zp (I,))."""
    return _act_channelwise_impl(x, a_bits=a_bits, eq_n=eq_n, steps=steps,
                                 use_fpcs=use_fpcs)


@partial(jax.jit, static_argnames=("a_bits", "eq_n", "steps", "use_fpcs"))
def search_act_channelwise_batched(xs, *, a_bits: int, eq_n: int, steps: int,
                                   use_fpcs: bool):
    """Layer-batched pre-reparam self-search: every same-shape reparam site's
    channel-wise FPCS runs in ONE vmapped program (qkv and fc1 inputs share
    (T, d_model), so all of a model's reparam sites typically fuse here).

    xs: (L, T, I) -> (scale (L, I), zp (L, I))."""
    L = xs.shape[0]

    def one(x):
        return _act_channelwise_impl(x, a_bits=a_bits, eq_n=eq_n, steps=steps,
                                     use_fpcs=use_fpcs, mem_scale=L)

    return jax.vmap(one)(xs)


def _postgelu_adalog_impl(x, y, w, b, shift, *, w_bits: int,
                          a_bits: int, n_V: int, eq_n: int, steps: int,
                          rounds: int, use_fpcs: bool,
                          gram: bool = False, mem_scale: int = 1):
    """Post-GeLU AdaLog fc2 search (linear.py:969-997), untraced body.

    Flow: weight self-FPCS; scale init at the second-to-last percentile point;
    rounds of [log-base top-8 x 16-scale joint FPCS (width 32), then weight
    output-MSE FPCS]. Returns (w_scale, w_zp, a_scale (1,), q (scalar)).
    """
    O, I = w.shape
    V, R = n_V, O // n_V
    w_v = w.reshape(V, R, I)
    tgt = y - b if b is not None else y
    st = _steps(use_fpcs, steps)

    def exp_w(s2d, z2d):
        return (s2d.reshape(-1, V, R, 1), z2d.reshape(-1, V, R, 1))

    ws0, wz0 = C.weight_candidates(w_v, w_bits, eq_n)
    w_s, w_z = fpcs(
        lambda s, z: S.score_weight_self(w_v, *exp_w(s, z), w_bits,
                                         mem_scale).reshape(eq_n, V * R),
        ws0, wz0, eq_n=eq_n, steps=st)

    ud, scale_grid = C.postgelu_scale_candidates(x, shift, eq_n)
    a_s = scale_grid[-2]                      # (1,) init (linear.py:977)
    q = jnp.asarray(37.0)

    q_grid = jnp.arange(10, 10 + eq_n, dtype=jnp.float32)
    scale16 = (ud[0] + (ud[1] - ud[0]) *
               (jnp.arange(16, dtype=jnp.float32) / 15.0))

    def round_body(carry, _):
        w_s, w_z, a_s, q = carry
        w_q2 = _wq(w_v, w_s, w_z, w_bits).reshape(O, I)
        if use_fpcs:
            # stage 1: top base_num=8 log bases at the current scale
            sims_q = S.score_linear_a_out_adalog(
                x, tgt, w_q2, shift, jnp.broadcast_to(a_s, (eq_n, 1)),
                q_grid[:, None], a_bits, mem_scale)
            _, q_idx = jax.lax.top_k(sims_q, 8)
            # stage 2: joint (scale, q): 16 scales x 8 bases, width-32 FPCS
            joint_s = jnp.tile(scale16, 8)[:, None]                  # (128, 1)
            joint_q = jnp.repeat(q_grid[q_idx], 16)[:, None]         # (128, 1)
            a_s2d, qv = fpcs(
                lambda s, z: S.score_linear_a_out_adalog(
                    x, tgt, w_q2, shift, s, z, a_bits, mem_scale)[:, None],
                joint_s, joint_q, eq_n=eq_n, steps=st, width=32)
            a_s, q = a_s2d, qv[0]
        else:
            # non-fpcs: independent base then scale argmax (linear.py:985-986)
            sims_q = S.score_linear_a_out_adalog(
                x, tgt, w_q2, shift, jnp.broadcast_to(a_s, (eq_n, 1)),
                q_grid[:, None], a_bits)
            q = q_grid[jnp.argmax(sims_q)]
            sims_s = S.score_linear_a_out_adalog(
                x, tgt, w_q2, shift, scale_grid,
                jnp.broadcast_to(q, (eq_n, 1)), a_bits)
            a_s = scale_grid[jnp.argmax(sims_s)]
        # weight output-MSE with the AdaLog-quantized input
        x_q = S.adalog_fq_search(x + shift, a_s, q, a_bits) - shift
        if gram:
            G, Cm = S.gram_stats(x_q, tgt)
            w_score = lambda s, z: S.score_linear_w_out_gram(
                G, Cm, w_v, *exp_w(s, z), w_bits,
                mem_scale).reshape(eq_n, V * R)
        else:
            w_score = lambda s, z: S.score_linear_w_out(
                x_q, tgt, w_v, *exp_w(s, z), w_bits,
                mem_scale).reshape(eq_n, V * R)
        w_s, w_z = fpcs(w_score, ws0, wz0, eq_n=eq_n, steps=st)
        return (w_s, w_z, jnp.reshape(a_s, (1,)), q), None

    (w_s, w_z, a_s, q), _ = lax.scan(
        round_body, (w_s, w_z, jnp.reshape(a_s, (1,)), q), None,
        length=rounds)

    return (w_s.reshape(V, R, 1), w_z.reshape(V, R, 1),
            jnp.reshape(a_s, (1,)), q)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs", "gram"))
def search_linear_postgelu_adalog(x, y, w, b, shift, *, w_bits: int,
                                  a_bits: int, n_V: int, eq_n: int, steps: int,
                                  rounds: int, use_fpcs: bool,
                                  gram: bool = False):
    return _postgelu_adalog_impl(x, y, w, b, shift, w_bits=w_bits,
                                 a_bits=a_bits, n_V=n_V, eq_n=eq_n,
                                 steps=steps, rounds=rounds,
                                 use_fpcs=use_fpcs, gram=gram)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs", "gram"))
def search_linear_postgelu_adalog_batched(xs, ys, ws, bs, shift, *,
                                          w_bits: int, a_bits: int, n_V: int,
                                          eq_n: int, steps: int, rounds: int,
                                          use_fpcs: bool, gram: bool = False):
    """Layer-batched post-GeLU fc2 search: all L same-shape fc2 sites in one
    vmapped program (see search_linear_default_batched)."""
    L = xs.shape[0]

    def one(x, y, w, b):
        return _postgelu_adalog_impl(x, y, w, b, shift, w_bits=w_bits,
                                     a_bits=a_bits, n_V=n_V, eq_n=eq_n,
                                     steps=steps, rounds=rounds,
                                     use_fpcs=use_fpcs, gram=gram,
                                     mem_scale=L)

    return jax.vmap(one)(xs, ys, ws, bs)


def _postgelu_twin_impl(x, y, w, b, *, w_bits: int, a_bits: int, n_V: int,
                        eq_n: int, steps: int, rounds: int, use_fpcs: bool,
                        mem_scale: int = 1):
    """PTQ4ViT twin-uniform fc2 search (linear.py:697-721), untraced body.

    Negative scale fixed at GELU_MIN/N (linear.py:653-657); positive scale
    searched over 2^i * neg_scale, i in [-5, 24] (linear.py:707-709).
    Returns (w_scale, w_zp, scale_pos (1,), scale_neg (1,)).
    """
    from adalog_tpu.quantizers.state import GELU_MIN
    O, I = w.shape
    V, R = n_V, O // n_V
    N = 2 ** (a_bits - 1)
    w_v = w.reshape(V, R, I)
    tgt = y - b if b is not None else y
    st = _steps(use_fpcs, steps)

    def exp_w(s2d, z2d):
        return (s2d.reshape(-1, V, R, 1), z2d.reshape(-1, V, R, 1))

    ws0, wz0 = C.weight_candidates(w_v, w_bits, eq_n)
    w_s, w_z = fpcs(
        lambda s, z: S.score_weight_self(w_v, *exp_w(s, z), w_bits,
                                         mem_scale).reshape(eq_n, V * R),
        ws0, wz0, eq_n=eq_n, steps=st)

    s_neg = jnp.asarray([GELU_MIN / N], jnp.float32)
    s_pos = jnp.abs(x).max().reshape(1) / (N - 0.5)
    # 29 evaluated candidates: 2^-5..2^23 times s_neg (the reference's loop
    # covers indices 0..eq_n-1 of a 30-point grid)
    pos_grid = (jnp.exp2(jnp.arange(-5, 24, dtype=jnp.float32)) * s_neg)[:, None]

    def round_body(carry, _):
        w_s, w_z, s_pos = carry
        w_q2 = _wq(w_v, w_s, w_z, w_bits).reshape(O, I)
        sims = S.score_linear_a_out_twin(x, tgt, w_q2, pos_grid, s_neg,
                                         a_bits, mem_scale)
        s_pos = pos_grid[jnp.argmax(sims)]
        x_pos = jnp.clip(jnp.round(x / s_pos), 0, N - 1) * s_pos
        x_neg = jnp.clip(jnp.round(x / s_neg), -N, 0) * s_neg
        x_q = x_pos + x_neg
        w_s, w_z = fpcs(
            lambda s, z: S.score_linear_w_out(x_q, tgt, w_v, *exp_w(s, z),
                                              w_bits,
                                              mem_scale).reshape(eq_n, V * R),
            ws0, wz0, eq_n=eq_n, steps=st)
        return (w_s, w_z, s_pos), None

    (w_s, w_z, s_pos), _ = lax.scan(round_body, (w_s, w_z, s_pos), None,
                                    length=rounds)
    return (w_s.reshape(V, R, 1), w_z.reshape(V, R, 1), s_pos, s_neg)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs"))
def search_linear_postgelu_twin(x, y, w, b, *, w_bits: int, a_bits: int,
                                n_V: int, eq_n: int, steps: int, rounds: int,
                                use_fpcs: bool):
    return _postgelu_twin_impl(x, y, w, b, w_bits=w_bits, a_bits=a_bits,
                               n_V=n_V, eq_n=eq_n, steps=steps, rounds=rounds,
                               use_fpcs=use_fpcs)


@partial(jax.jit, static_argnames=("w_bits", "a_bits", "n_V", "eq_n", "steps",
                                   "rounds", "use_fpcs"))
def search_linear_postgelu_twin_batched(xs, ys, ws, bs, *, w_bits: int,
                                        a_bits: int, n_V: int, eq_n: int,
                                        steps: int, rounds: int,
                                        use_fpcs: bool):
    """Layer-batched twin fc2 search: all L same-shape twin sites (the
    `post_gelu_quantizer='twin'` config) in one vmapped program (see
    search_linear_default_batched)."""
    L = xs.shape[0]

    def one(x, y, w, b):
        return _postgelu_twin_impl(x, y, w, b, w_bits=w_bits, a_bits=a_bits,
                                   n_V=n_V, eq_n=eq_n, steps=steps,
                                   rounds=rounds, use_fpcs=use_fpcs,
                                   mem_scale=L)

    return jax.vmap(one)(xs, ys, ws, bs)


# ---------------------------------------------------------------------------
# MatMul family
# ---------------------------------------------------------------------------

def _mm_expand(s2d, z2d, H, head_cw):
    """(E, U) -> (E, 1, H|1, 1, 1) native matmul broadcast layout."""
    U = H if head_cw else 1
    return (s2d.reshape(-1, 1, U, 1, 1), z2d.reshape(-1, 1, U, 1, 1))


def _matmul_impl(A, B, y, *, A_bits: int, B_bits: int, eq_n: int, steps: int,
                 rounds: int, use_fpcs: bool, head_cw: bool,
                 gram: bool = False, mem_scale: int = 1):
    """q@kT matmul search (matmul.py:264-283), untraced body.

    A: (N, H, S, C); B: (N, H, C, S2); y: (N, H, S, S2) raw product.
    Init both operands at the second-to-last percentile candidate, then
    ``rounds`` of alternating A/B output-MSE FPCS. With ``gram``, candidate
    scoring switches to the Gram form where the contraction dim C is smaller
    than the dropped output dim (q@kT: S2/C ~ 3-4.5x fewer FLOPs/candidate);
    the gates are static, so ungated shapes keep the direct scorer.
    """
    H = A.shape[1]
    s_dim, c_dim, s2_dim = A.shape[2], A.shape[3], B.shape[3]
    U = H if head_cw else 1
    a_gram = gram and s2_dim > c_dim
    b_gram = gram and s_dim > c_dim

    As0, Az0 = C.matmul_candidates(A, B_bits, eq_n, head_channel_wise=head_cw)
    Bs0, Bz0 = C.matmul_candidates(B, B_bits, eq_n, head_channel_wise=head_cw)
    A_s, A_z = As0[-2], Az0[-2]        # (U,) init (matmul.py:266-271)
    B_s, B_z = Bs0[-2], Bz0[-2]
    st = _steps(use_fpcs, steps)

    def nat(u):
        return u.reshape(1, U, 1, 1)

    def round_body(carry, _):
        A_s, A_z, B_s, B_z = carry
        B_q = S.uq_asym(B, nat(B_s), nat(B_z), B_bits)
        if a_gram:
            G_B, M = S.matmul_gram_stats_opA(B_q, y)
            a_score = lambda s, z: S.score_matmul_opA_gram(
                A, G_B, M, s2_dim, *_mm_expand(s, z, H, head_cw), A_bits,
                head_channel_wise=head_cw, mem_scale=mem_scale
                ).reshape(eq_n, U)
        else:
            a_score = lambda s, z: S.score_matmul_opA(
                A, B_q, y, *_mm_expand(s, z, H, head_cw), A_bits,
                head_channel_wise=head_cw, mem_scale=mem_scale
                ).reshape(eq_n, U)
        A_s, A_z = fpcs(a_score, As0, Az0, eq_n=eq_n, steps=st)
        A_q = S.uq_asym(A, nat(A_s), nat(A_z), A_bits)
        if b_gram:
            G_A, M2 = S.matmul_gram_stats_opB(A_q, y)
            b_score = lambda s, z: S.score_matmul_opB_gram(
                B, G_A, M2, s_dim, *_mm_expand(s, z, H, head_cw), B_bits,
                head_channel_wise=head_cw, mem_scale=mem_scale
                ).reshape(eq_n, U)
        else:
            b_score = lambda s, z: S.score_matmul_opB(
                A_q, B, y, *_mm_expand(s, z, H, head_cw), B_bits,
                head_channel_wise=head_cw, mem_scale=mem_scale
                ).reshape(eq_n, U)
        B_s, B_z = fpcs(b_score, Bs0, Bz0, eq_n=eq_n, steps=st)
        return (A_s, A_z, B_s, B_z), None

    (A_s, A_z, B_s, B_z), _ = lax.scan(round_body, (A_s, A_z, B_s, B_z),
                                       None, length=rounds)
    return nat(A_s), nat(A_z), nat(B_s), nat(B_z)


@partial(jax.jit, static_argnames=("A_bits", "B_bits", "eq_n", "steps",
                                   "rounds", "use_fpcs", "head_cw", "gram"))
def search_matmul(A, B, y, *, A_bits: int, B_bits: int, eq_n: int, steps: int,
                  rounds: int, use_fpcs: bool, head_cw: bool,
                  gram: bool = False):
    return _matmul_impl(A, B, y, A_bits=A_bits, B_bits=B_bits, eq_n=eq_n,
                        steps=steps, rounds=rounds, use_fpcs=use_fpcs,
                        head_cw=head_cw, gram=gram)


@partial(jax.jit, static_argnames=("A_bits", "B_bits", "eq_n", "steps",
                                   "rounds", "use_fpcs", "head_cw", "gram"))
def search_matmul_batched(As, Bs, ys, *, A_bits: int, B_bits: int, eq_n: int,
                          steps: int, rounds: int, use_fpcs: bool,
                          head_cw: bool, gram: bool = False):
    """Layer-batched q@kT search: all L same-shape attention matmul sites in
    one vmapped program."""
    L = As.shape[0]

    def one(A, B, y):
        return _matmul_impl(A, B, y, A_bits=A_bits, B_bits=B_bits, eq_n=eq_n,
                            steps=steps, rounds=rounds, use_fpcs=use_fpcs,
                            head_cw=head_cw, gram=gram, mem_scale=L)

    return jax.vmap(one)(As, Bs, ys)


def _matmul_postsoftmax_impl(A, B, y, *, A_bits: int, B_bits: int, eq_n: int,
                             steps: int, rounds: int, use_fpcs: bool,
                             head_cw: bool, a_kind: str, mem_scale: int = 1):
    """softmax@v matmul search (matmul.py:360-378), untraced body.

    A (post-softmax) gets a log quantizer (``a_kind``) with scale frozen at
    1.0; for AdaLog the integer base q is argmax-searched each round,
    alternating with B-scale FPCS. Log2/LogSqrt2 run a single B round
    (matmul.py:374-375). Returns (q (scalar), B_scale, B_zp).
    """
    from adalog_tpu.quantizers.logarithm import log2_quant, logsqrt2_quant

    H = A.shape[1]
    U = H if head_cw else 1
    search_base = a_kind == "adalog"

    Bs0, Bz0 = C.matmul_candidates(B, B_bits, eq_n, head_channel_wise=head_cw)
    B_s, B_z = Bs0[-2], Bz0[-2]
    q = jnp.asarray(37.0)
    q_grid = jnp.arange(10, 10 + eq_n, dtype=jnp.float32)
    st = _steps(use_fpcs, steps)

    def nat(u):
        return u.reshape(1, U, 1, 1)

    def b_fpcs(A_q, B_s, B_z):
        return fpcs(
            lambda s, z: S.score_matmul_opB(
                A_q, B, y, *_mm_expand(s, z, H, head_cw), B_bits,
                head_channel_wise=head_cw, mem_scale=mem_scale
                ).reshape(eq_n, U),
            Bs0, Bz0, eq_n=eq_n, steps=st)

    if search_base:
        def round_body(carry, _):
            q, B_s, B_z = carry
            B_q = S.uq_asym(B, nat(B_s), nat(B_z), B_bits)
            sims = S.score_postsoftmax_base(A, B_q, y, q_grid, A_bits,
                                            mem_scale=mem_scale)
            q = q_grid[jnp.argmax(sims)]
            A_q = S.adalog_fq_search(A, 1.0, q, A_bits, clamp_upper=False)
            B_s, B_z = b_fpcs(A_q, B_s, B_z)
            return (q, B_s, B_z), None

        (q, B_s, B_z), _ = lax.scan(round_body, (q, B_s, B_z), None,
                                    length=rounds)
    else:
        A_q = (log2_quant if a_kind == "log2" else logsqrt2_quant)(
            A, jnp.float32(1.0), bits=A_bits)
        B_s, B_z = b_fpcs(A_q, B_s, B_z)

    return q, nat(B_s), nat(B_z)


@partial(jax.jit, static_argnames=("A_bits", "B_bits", "eq_n", "steps",
                                   "rounds", "use_fpcs", "head_cw", "a_kind"))
def search_matmul_postsoftmax(A, B, y, *, A_bits: int, B_bits: int, eq_n: int,
                              steps: int, rounds: int, use_fpcs: bool,
                              head_cw: bool, a_kind: str):
    return _matmul_postsoftmax_impl(A, B, y, A_bits=A_bits, B_bits=B_bits,
                                    eq_n=eq_n, steps=steps, rounds=rounds,
                                    use_fpcs=use_fpcs, head_cw=head_cw,
                                    a_kind=a_kind)


@partial(jax.jit, static_argnames=("A_bits", "B_bits", "eq_n", "steps",
                                   "rounds", "use_fpcs", "head_cw", "a_kind"))
def search_matmul_postsoftmax_batched(As, Bs, ys, *, A_bits: int, B_bits: int,
                                      eq_n: int, steps: int, rounds: int,
                                      use_fpcs: bool, head_cw: bool,
                                      a_kind: str):
    """Layer-batched softmax@v search: all L same-shape post-softmax sites in
    one vmapped program."""
    L = As.shape[0]

    def one(A, B, y):
        return _matmul_postsoftmax_impl(A, B, y, A_bits=A_bits, B_bits=B_bits,
                                        eq_n=eq_n, steps=steps, rounds=rounds,
                                        use_fpcs=use_fpcs, head_cw=head_cw,
                                        a_kind=a_kind, mem_scale=L)

    return jax.vmap(one)(As, Bs, ys)


# ---------------------------------------------------------------------------
# Conv family
# ---------------------------------------------------------------------------

def _conv_impl(x, y, w, b, *, w_bits: int, eq_n: int, steps: int,
               use_fpcs: bool, conv_dims, mem_scale: int = 1):
    """Patch-embed conv search (conv.py:313-334), untraced body: weight-only
    (activations are 8-bit passthrough), a single output-MSE FPCS round with
    per-out-channel candidates (num_zp = n_levels, conv.py:266).

    x: (N, H, W, IC) NHWC; y: (N, FH, FW, OC); w: (OC, IC, KH, KW); b: (OC,).
    Returns (w_scale (OC, 1), w_zp (OC, 1)).
    """
    OC = w.shape[0]
    w_flat = w.reshape(OC, -1)
    tgt = y - b if b is not None else y
    N_lv = 2 ** (w_bits - 1)
    num_zp = min(N_lv, eq_n)      # conv uses num_zp = n_levels (conv.py:266),
    num_scale = eq_n // num_zp    # clamped so the scale grid is never empty

    # percentile candidates, conv variant (num_zp differs from linear)
    pct = jnp.asarray([0.9, 1.0], jnp.float32)
    uppers = jnp.quantile(w_flat, pct, axis=-1)
    lowers = jnp.quantile(w_flat, 1.0 - pct, axis=-1)
    delta_min = (uppers[0] - lowers[0])[None, :]
    delta_max = (uppers[1] - lowers[1])[None, :]
    splits = jnp.linspace(0.0, 1.0, num_scale)[:, None] * (delta_max - delta_min)
    ws0 = jnp.tile((delta_min + splits) / (2 * N_lv - 1), (num_zp, 1))
    zgrid = jnp.arange(N_lv - num_zp // 2, N_lv + num_zp // 2, dtype=jnp.float32)
    wz0 = jnp.broadcast_to(jnp.repeat(zgrid, num_scale)[:, None], ws0.shape)

    w_s, w_z = fpcs(
        lambda s, z: S.score_conv_w_out(
            x, tgt, w_flat, conv_dims, s[:, :, None], z[:, :, None], w_bits,
            mem_scale),
        ws0, wz0, eq_n=eq_n, steps=_steps(use_fpcs, steps))
    return w_s[:, None], w_z[:, None]


@partial(jax.jit, static_argnames=("w_bits", "eq_n", "steps", "use_fpcs",
                                   "conv_dims"))
def search_conv(x, y, w, b, *, w_bits: int, eq_n: int, steps: int,
                use_fpcs: bool, conv_dims):
    return _conv_impl(x, y, w, b, w_bits=w_bits, eq_n=eq_n, steps=steps,
                      use_fpcs=use_fpcs, conv_dims=conv_dims)


@partial(jax.jit, static_argnames=("w_bits", "eq_n", "steps", "use_fpcs",
                                   "conv_dims"))
def search_conv_batched(xs, ys, ws, bs, *, w_bits: int, eq_n: int, steps: int,
                        use_fpcs: bool, conv_dims):
    """Layer-batched conv search: all L same-shape conv sites in one vmapped
    program. Every shipped zoo model has exactly one conv (the patch embed),
    so groups are singletons there — this exists for layouts with repeated
    convs and for API parity with the other families."""
    L = xs.shape[0]

    def one(x, y, w, b):
        return _conv_impl(x, y, w, b, w_bits=w_bits, eq_n=eq_n, steps=steps,
                          use_fpcs=use_fpcs, conv_dims=conv_dims,
                          mem_scale=L)

    return jax.vmap(one)(xs, ys, ws, bs)
