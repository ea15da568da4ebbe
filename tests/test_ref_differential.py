"""Differential parity: our JAX searches vs the ACTUAL reference torch code.

Each test builds the reference quant layer from /root/reference (CUDA gates
stubbed, see ref_bridge.py), runs its real ``hyperparameter_searching()`` on
tiny tensors, runs our jitted search on the same inputs, and compares the
selected hyperparameters. Both sides search identical candidate grids, so
selections should agree exactly up to fp32-vs-accumulation-order near-ties;
we demand a high exact-agreement fraction AND (for the scalar selections)
objective-equivalence: the float64 output-MSE of both selections must match
to a small relative tolerance.

Reference entry points exercised:
  linear.py:525-545  AsymmetricallyBatchingQuantLinear
  linear.py:697-721  PostGeluTwinUniformBatchingQuantLinear
  linear.py:969-997  PostGeluLogBasedBatchingQuantLinear
  matmul.py:264-283  AsymmetricallyBatchingQuantMatMul
  matmul.py:360-378  PostSoftmaxAsymmetricallyBatchingQuantMatMul
  conv.py:313-334    AsymmetricallyBatchingQuantConv2d
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adalog_tpu.calib import search as SRCH
from adalog_tpu.quantizers.state import GELU_MIN

from ref_bridge import cuda_stubs, load_reference

BITS = 4
EQ_N = 32
ROUNDS = 3
STEPS = 6
N_LV = 2 ** (BITS - 1)


def _t(a):
    import torch
    return torch.tensor(np.asarray(a))


def _uq64(x, s, z, bits):
    n = 2 ** (bits - 1)
    q = np.clip(np.round(x / s) + np.round(z), 0, 2 * n - 1)
    return (q - np.round(z)) * s


def _linear_mse(x, tgt, w, w_s, w_z, a_s, a_z, bits=BITS):
    """float64 output-SSE of a (w, a) selection — the search objective."""
    x_q = _uq64(x, a_s, a_z, bits)
    w_q = _uq64(w, w_s, w_z, bits)
    return float(np.sum((tgt - x_q @ w_q.T) ** 2))


def _agree(a, b, rtol=1e-5):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return np.mean(np.isclose(a, b, rtol=rtol)), (a, b)


def _row_sse(x_q, tgt, w, s, z, bits=BITS):
    """float64 per-output-row SSE — the reference's per-row w objective
    (linear.py:355-392 scores each row-group row independently)."""
    w_q = _uq64(w, s.reshape(-1, 1), z.reshape(-1, 1), bits)
    return np.sum((tgt - x_q @ w_q.T) ** 2, axis=0)


def assert_w_equiv(x64, tgt, w64, w_s, w_z, rw_s, rw_z, a_sel, ra_sel,
                   min_agree=0.6, row_rtol=0.01, bits=BITS):
    """FPCS selects by argmax over fp32 scores; accumulation-order near-ties
    flip individual rows between candidates of equal quality. Demand a
    majority of rows agree exactly AND every row's fp64 objective match to
    ``row_rtol`` under each side's own activation selection."""
    frac, pair = _agree(w_s, rw_s)
    assert frac >= min_agree, pair
    O = w64.shape[0]
    x_q_repo = _uq64(x64, *a_sel, bits)
    x_q_ref = _uq64(x64, *ra_sel, bits)
    sse_repo = _row_sse(x_q_repo, tgt,  w64,
                        np.asarray(w_s, np.float64).reshape(O),
                        np.asarray(w_z, np.float64).reshape(O), bits)
    sse_ref = _row_sse(x_q_ref, tgt, w64,
                       np.asarray(rw_s, np.float64).reshape(O),
                       np.asarray(rw_z, np.float64).reshape(O), bits)
    ratio = sse_repo / np.maximum(sse_ref, 1e-30)
    if row_rtol is None:
        # 6-bit: candidate scores sit at the fp32 noise floor, so individual
        # row forks reach fp64 ratios ~1.5 in BOTH directions (seed sweep)
        # while the geometric mean over rows stays near 1 — bind the geomean
        # (a systematic selection error would shift it; sweep measured 0.924
        # at one seed, in OUR favor) plus a gross per-row catch. The total
        # fp64 output-MSE equivalence below stays the binding quality gate.
        g = float(np.exp(np.mean(np.log(ratio))))
        assert 0.90 <= g <= 1.10, (g, ratio.min(), ratio.max())
        assert np.all(ratio <= 2.0) and np.all(ratio >= 0.5), \
            (ratio.min(), ratio.max())
    else:
        assert np.all(ratio <= 1 + row_rtol) and \
            np.all(ratio >= 1 - row_rtol), (ratio.min(), ratio.max())


# ---------------------------------------------------------------------------
# default Linear (linear.py:525-545)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("n_V,gram,bits", [
    (1, False, 4), (3, False, 4), (1, True, 4), (3, True, 4),
    # W3A3 stresses the zp grid (num_zp=min(16, n_levels)=4 -> num_scale 8)
    # and W6A6 the fine-grid end (num_zp=16); configs/{3,6}bit.py
    (1, False, 3), (3, True, 3), (1, False, 6), (3, True, 6),
])
def test_linear_default_vs_reference(rng, n_V, gram, bits):
    ref = load_reference()
    S, T, I, O = 8, 6, 16, 24
    x3 = rng.standard_normal((S, T, I)).astype(np.float32)
    w = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(O) * 0.1).astype(np.float32)
    y3 = (x3 @ w.T + b).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.linear.AsymmetricallyBatchingQuantLinear(
            I, O, bias=True, w_bit=bits, a_bit=bits, calib_batch_size=4,
            search_round=ROUNDS, eq_n=EQ_N, n_V=n_V, fpcs=True, steps=STEPS)
        with torch.no_grad():
            m.weight.copy_(_t(w))
            m.bias.copy_(_t(b))
        m.raw_input, m.raw_out = _t(x3), _t(y3)
        with torch.no_grad():
            m.hyperparameter_searching()
        rw_s = m.w_quantizer.scale.detach().numpy()
        rw_z = m.w_quantizer.zero_point.detach().numpy()
        ra_s = float(m.a_quantizer.scale.detach())
        ra_z = float(m.a_quantizer.zero_point.detach())

    w_s, w_z, a_s, a_z = SRCH.search_linear_default(
        jnp.asarray(x3.reshape(-1, I)), jnp.asarray(y3.reshape(-1, O)),
        jnp.asarray(w), jnp.asarray(b), w_bits=bits, a_bits=bits, n_V=n_V,
        eq_n=EQ_N, steps=STEPS, rounds=ROUNDS, use_fpcs=True, gram=gram)

    x2 = x3.reshape(-1, I).astype(np.float64)
    tgt = (y3.reshape(-1, O) - b).astype(np.float64)
    # At 6-bit, candidate scores sit at the fp32 noise floor (all candidates
    # are good), so the FPCS refinement trajectory forks on accumulation-order
    # near-ties: with identical grids and scores, a controlled replication of
    # the reference FPCS agrees with ours on 22/24 rows and OURS has the
    # lower fp64 SSE on the 2 diffs — the residual full-pipeline deltas
    # (total MSE ratio <= 1.017 over 6 seeds, isolated rows to ~15%) are
    # exploration divergence, not selection error. Tolerances scale with that
    # measurement; 3/4-bit stay strict. The exact-agreement floor is a
    # heuristic at 6-bit (seed sweep: dips to 0.25 while every row stays
    # objective-equivalent); the per-row fp64 check is the binding invariant.
    # tot_rtol at 6-bit: the activation-scale FPCS forks on noise-floor
    # near-ties; the sweep measured a fork where OUR selection's fp64 total
    # MSE was 5.6% better (seed 15) — 8% bounds it, both directions
    row_rtol, tot_rtol = (None, 0.08) if bits >= 6 else (0.01, 0.01)
    min_agree = 0.2 if bits >= 6 else 0.6
    assert_w_equiv(x2, tgt, w.astype(np.float64), w_s, w_z, rw_s, rw_z,
                   (float(a_s[0]), float(a_z[0])), (ra_s, ra_z), bits=bits,
                   row_rtol=row_rtol, min_agree=min_agree)

    # activation selection: exact, or objective-equivalent under near-tie
    mse_repo = _linear_mse(x2, tgt, w.astype(np.float64),
                           np.asarray(w_s, np.float64).reshape(O, 1),
                           np.asarray(w_z, np.float64).reshape(O, 1),
                           float(a_s[0]), float(a_z[0]), bits)
    mse_ref = _linear_mse(x2, tgt, w.astype(np.float64),
                          rw_s.astype(np.float64).reshape(O, 1),
                          rw_z.astype(np.float64).reshape(O, 1), ra_s, ra_z,
                          bits)
    assert mse_repo <= mse_ref * (1 + tot_rtol) and \
        mse_ref <= mse_repo * (1 + tot_rtol), \
        (mse_repo, mse_ref, float(a_s[0]), ra_s)


# ---------------------------------------------------------------------------
# q@kT MatMul (matmul.py:264-283)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_matmul_vs_reference(rng):
    ref = load_reference()
    S, H, T, D = 4, 3, 8, 6
    A = rng.standard_normal((S, H, T, D)).astype(np.float32)
    B = rng.standard_normal((S, H, D, T)).astype(np.float32)
    y = (A @ B).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.matmul.AsymmetricallyBatchingQuantMatMul(
            A_bit=BITS, B_bit=BITS, calib_batch_size=2, search_round=ROUNDS,
            eq_n=EQ_N, head_channel_wise=True, num_heads=H, fpcs=True,
            steps=STEPS)
        m.raw_input = [_t(A), _t(B)]
        m.raw_out = _t(y)
        with torch.no_grad():
            m.hyperparameter_searching()
        rA = (m.A_quantizer.scale.detach().numpy(),
              m.A_quantizer.zero_point.detach().numpy())
        rB = (m.B_quantizer.scale.detach().numpy(),
              m.B_quantizer.zero_point.detach().numpy())

    A_s, A_z, B_s, B_z = SRCH.search_matmul(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(y), A_bits=BITS,
        B_bits=BITS, eq_n=EQ_N, steps=STEPS, rounds=ROUNDS, use_fpcs=True,
        head_cw=True)

    got = np.concatenate([np.asarray(v).ravel()
                          for v in (A_s, A_z, B_s, B_z)])
    want = np.concatenate([v.ravel() for v in (*rA, *rB)])
    frac, pair = _agree(got, want)
    assert frac >= 0.6, pair

    # objective equivalence on the full quadruple
    def mm_mse(As, Az, Bs, Bz):
        A_q = _uq64(A.astype(np.float64), As.reshape(1, H, 1, 1),
                    Az.reshape(1, H, 1, 1), BITS)
        B_q = _uq64(B.astype(np.float64), Bs.reshape(1, H, 1, 1),
                    Bz.reshape(1, H, 1, 1), BITS)
        return float(np.sum((y - A_q @ B_q) ** 2))

    mse_repo = mm_mse(*(np.asarray(v, np.float64) for v in
                        (A_s, A_z, B_s, B_z)))
    mse_ref = mm_mse(*(v.astype(np.float64) for v in (*rA, *rB)))
    assert mse_repo <= mse_ref * 1.02 and mse_ref <= mse_repo * 1.02, \
        (mse_repo, mse_ref)


# ---------------------------------------------------------------------------
# post-Softmax MatMul, AdaLog base search (matmul.py:360-378)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("a_kind,bits", [("adalog", 4), ("log2", 4),
                                         ("logsqrt2", 4),
                                         # 3-bit stresses the AdaLog LUT at
                                         # n_levels=4; 6-bit the fine grid
                                         ("adalog", 3), ("adalog", 6)])
def test_matmul_postsoftmax_vs_reference(rng, a_kind, bits):
    ref = load_reference()
    S, H, T, D = 4, 3, 8, 6
    logits = rng.standard_normal((S, H, T, T)).astype(np.float32) * 2.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    A = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    B = rng.standard_normal((S, H, T, D)).astype(np.float32)
    y = (A @ B).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.matmul.PostSoftmaxAsymmetricallyBatchingQuantMatMul(
            A_bit=bits, B_bit=bits, calib_batch_size=2, search_round=ROUNDS,
            eq_n=EQ_N, head_channel_wise=True, num_heads=H, fpcs=True,
            steps=STEPS, quantizer=a_kind)
        m.raw_input = [_t(A), _t(B)]
        m.raw_out = _t(y)
        with torch.no_grad():
            m.hyperparameter_searching()
        r_q = float(m.A_quantizer.q) if a_kind == "adalog" else None
        rB_s = m.B_quantizer.scale.detach().numpy()
        rB_z = m.B_quantizer.zero_point.detach().numpy()

    q, B_s, B_z = SRCH.search_matmul_postsoftmax(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(y), A_bits=bits,
        B_bits=bits, eq_n=EQ_N, steps=STEPS, rounds=ROUNDS, use_fpcs=True,
        head_cw=True, a_kind=a_kind)

    # fp64 oracle of the post-softmax log quantizers (scale frozen at 1.0,
    # matmul.py:330-337 decomposition; search path scoring.py:106-118)
    N = 2 ** (bits - 1)
    ts = 1.0 / (4 * N - 2)
    A64 = np.clip(A.astype(np.float64), 1e-30, None)

    def a_q64(qa):
        if a_kind == "adalog":
            code = np.round(-np.log2(A64) * 37.0 / qa)
            keep = code < 2 * N
            prod = np.clip(code, 0, 2 * N - 1) * qa
            mant = np.round(np.exp2(-np.remainder(prod, 37.0) / 37.0)
                            / ts) * ts
            return np.exp2(-np.floor(prod / 37.0)) * mant * keep
        base = 1.0 if a_kind == "log2" else 2.0
        code = np.round(-np.log2(A64) * base)
        keep = code < 2 * N
        code = np.clip(code, 0, 2 * N - 1)
        if a_kind == "log2":
            return np.exp2(-code) * keep
        odd = (code % 2) * (np.sqrt(2.0) - 1.0) + 1.0
        return np.exp2(-np.ceil(code / 2.0)) * odd * keep

    def head_sse(qa, Bs, Bz):
        """fp64 per-head output-SSE of a full (q, B_scale, B_zp) selection."""
        A_q = a_q64(qa)
        B_q = _uq64(B.astype(np.float64),
                    np.asarray(Bs, np.float64).reshape(1, H, 1, 1),
                    np.asarray(Bz, np.float64).reshape(1, H, 1, 1), bits)
        return np.sum((y - A_q @ B_q) ** 2, axis=(0, 2, 3))

    if a_kind == "adalog" and float(q) != r_q:
        # AdaLog base fork on an fp32 scoring near-tie: each side's full
        # selection must be fp64 objective-equivalent in total
        sse_o = float(np.sum(head_sse(float(q), B_s, B_z)))
        sse_r = float(np.sum(head_sse(r_q, rB_s, rB_z)))
        assert sse_o <= sse_r * 1.05 and sse_r <= sse_o * 1.05, \
            (float(q), r_q, sse_o, sse_r)
    else:
        if a_kind == "adalog":
            assert float(q) == r_q, (float(q), r_q)
        got = np.concatenate([np.asarray(B_s).ravel(),
                              np.asarray(B_z).ravel()])
        want = np.concatenate([rB_s.ravel(), rB_z.ravel()])
        # exact agreement is a heuristic floor (per-head (scale, zp) pairs
        # fork on fp32 near-ties — seed sweep saw 3/6 leaves at one seed);
        # the binding invariant is per-head fp64 objective equivalence.
        # Fork magnitude measured at these tiny shapes: up to 1.063 at 6-bit
        # (T*D=48 samples/head, fp32 scoring noise magnified in fp64), in
        # both directions across seeds — 10% bounds it with margin.
        frac, pair = _agree(got, want)
        assert frac >= 0.3, pair
        qa = float(q) if a_kind == "adalog" else 37.0
        sse_o = head_sse(qa, B_s, B_z)
        sse_r = head_sse(qa, rB_s, rB_z)
        ratio = sse_o / np.maximum(sse_r, 1e-30)
        assert np.all(ratio <= 1.10) and np.all(ratio >= 1 / 1.10), \
            (ratio.min(), ratio.max())


# ---------------------------------------------------------------------------
# post-GeLU fc2, AdaLog joint (scale, q) search (linear.py:969-997)
# ---------------------------------------------------------------------------

def _gelu(pre):
    import math
    import numpy as _np
    return (0.5 * pre * (1.0 + _np.vectorize(math.erf)(pre / _np.sqrt(2.0)))
            ).astype(_np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("a_kind,gram,bits", [
    ("adalog", False, 4), ("log2", False, 4), ("adalog", True, 4),
    # W3A3/W6A6 parametrization (configs/{3,6}bit.py): 3-bit exercises the
    # shift/mantissa AdaLog decomposition at n_levels=4
    ("adalog", True, 3), ("adalog", True, 6),
])
def test_postgelu_adalog_vs_reference(rng, a_kind, gram, bits):
    # The joint (scale, q) FPCS runs at width 32 (linear.py:941
    # activation_fpcs fpcs_width=32), so eq_n must be >= 64 for a
    # non-degenerate refine count: at eq_n=32 the reference's own
    # fpcs_new_cnt = eq_n/width = 1, making each refine step a single
    # -0.5*delta shift with the delta DOUBLING (delta /= cnt-0.5 = 0.5) —
    # a noise-sensitive random walk both engines replicate but whose
    # trajectory forks on fp32 accumulation-order near-ties. The shipped
    # configs use eq_n=128 (cnt=4); 64 (cnt=2) is the smallest sane grid.
    eq_n = 64
    ref = load_reference()
    S, T, I, O = 8, 6, 16, 24
    x3 = _gelu(rng.standard_normal((S, T, I)).astype(np.float32) * 1.5)
    w = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(O) * 0.1).astype(np.float32)
    y3 = (x3 @ w.T + b).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.linear.PostGeluLogBasedBatchingQuantLinear(
            I, O, bias=True, w_bit=bits, a_bit=bits, calib_batch_size=4,
            search_round=ROUNDS, eq_n=eq_n, n_V=1, quantizer=a_kind,
            fpcs=True, steps=STEPS)
        with torch.no_grad():
            m.weight.copy_(_t(w))
            m.bias.copy_(_t(b))
        m.raw_input, m.raw_out = _t(x3), _t(y3)
        with torch.no_grad():
            m.hyperparameter_searching()
        ra_s = float(m.a_quantizer.scale.detach())
        r_q = float(m.a_quantizer.q) if a_kind == "adalog" else None
        rw_s = m.w_quantizer.scale.detach().numpy()
        rw_z = m.w_quantizer.zero_point.detach().numpy()

    w_s, w_z, a_s, q = SRCH.search_linear_postgelu_adalog(
        jnp.asarray(x3.reshape(-1, I)), jnp.asarray(y3.reshape(-1, O)),
        jnp.asarray(w), jnp.asarray(b), GELU_MIN, w_bits=bits, a_bits=bits,
        n_V=1, eq_n=eq_n, steps=STEPS, rounds=ROUNDS, use_fpcs=True,
        gram=gram)

    # NOTE: our postgelu search covers a_kind via the calibrator's downgrade
    # (logarithm.py:754-761 semantics); the search itself is the adalog one,
    # and for log2/logsqrt2 the reference runs the same search then swaps the
    # quantizer keeping the selected scale (linear.py:991-995).
    N = 2 ** (bits - 1)
    ts = 1.0 / (4 * N - 2)

    def adalog_xq(sa, qa):
        x64 = x3.reshape(-1, I).astype(np.float64) + float(GELU_MIN)
        scaled = np.clip(x64 / sa, 1e-15, 1.0)
        code = np.round(-np.log2(scaled) * 37.0 / qa)
        keep = code < 2 * N
        code = np.clip(code, 0, 2 * N - 1)
        prod = code * qa
        mant = np.round(np.exp2(-np.remainder(prod, 37.0) / 37.0) / ts) * ts
        return (np.exp2(-np.floor(prod / 37.0)) * mant * keep * sa
                ) - float(GELU_MIN)

    tgt64 = (y3.reshape(-1, O) - b).astype(np.float64)

    def total_sse(sa, qa, ws, wz):
        return float(np.sum(_row_sse(
            adalog_xq(sa, qa), tgt64, w.astype(np.float64),
            np.asarray(ws, np.float64).reshape(O),
            np.asarray(wz, np.float64).reshape(O), bits)))

    same_sel = np.isclose(float(a_s[0]), ra_s, rtol=1e-4) and (
        a_kind != "adalog" or float(q) == r_q)
    if not same_sel:
        # the joint (scale, q) FPCS trajectory forks on fp32 near-ties (most
        # often at 3-bit, where many bases give near-identical 8-level
        # grids); the seed sweep measured fork objective ratios 0.92-1.02
        # in BOTH directions (the 0.92 — OUR selection 8.5% better — at
        # seed 31). A forked selection must be fp64 objective-equivalent
        # under each side's own full (scale, q, w) pick; 15% bounds the
        # observed forks with margin.
        sse_o = total_sse(float(a_s[0]), float(q), w_s, w_z)
        sse_r = total_sse(ra_s, r_q if r_q is not None else float(q),
                          rw_s, rw_z)
        assert sse_o <= sse_r * 1.15 and sse_r <= sse_o * 1.15, \
            (float(a_s[0]), ra_s, float(q), r_q, sse_o, sse_r)
    else:
        # exact w-row agreement is a heuristic floor (seed sweep: dips to
        # ~0.46 at some seeds while every row stays objective-equivalent);
        # the per-row fp64 check below is the binding invariant
        frac, pair = _agree(w_s, rw_s)
        assert frac >= 0.3, pair
        # w rows that differ are fp32 near-tie refinement forks; with the
        # agreed (scale, q) both selections must be fp64
        # objective-equivalent per row
        x_q = adalog_xq(float(a_s[0]), float(q))
        sse_ours = _row_sse(x_q, tgt64, w.astype(np.float64),
                            np.asarray(w_s, np.float64).reshape(O),
                            np.asarray(w_z, np.float64).reshape(O), bits)
        sse_ref = _row_sse(x_q, tgt64, w.astype(np.float64),
                           rw_s.astype(np.float64).reshape(O),
                           rw_z.astype(np.float64).reshape(O), bits)
        ratio = sse_ours / np.maximum(sse_ref, 1e-30)
        assert np.all(ratio <= 1.05) and np.all(ratio >= 1 / 1.05), \
            (float(ratio.min()), float(ratio.max()))


# ---------------------------------------------------------------------------
# post-GeLU fc2, PTQ4ViT twin-uniform (linear.py:697-721)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_postgelu_twin_vs_reference(rng):
    """Also settles the 29-vs-30 candidate question: the reference builds a
    30-point grid (linear.py:707-709) but truncates eq_n to 29 inside
    `_search_best_a_scale` (linear.py:661-663), so index 29 (2^24) is never
    scored — our 29-candidate grid is the faithful one."""
    ref = load_reference()
    S, T, I, O = 8, 6, 16, 24
    x3 = _gelu(rng.standard_normal((S, T, I)).astype(np.float32) * 1.5)
    w = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(O) * 0.1).astype(np.float32)
    y3 = (x3 @ w.T + b).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.linear.PostGeluTwinUniformBatchingQuantLinear(
            I, O, bias=True, w_bit=BITS, a_bit=BITS, calib_batch_size=4,
            search_round=ROUNDS, eq_n=EQ_N, n_V=1, fpcs=True, steps=STEPS)
        with torch.no_grad():
            m.weight.copy_(_t(w))
            m.bias.copy_(_t(b))
        m.raw_input, m.raw_out = _t(x3), _t(y3)
        with torch.no_grad():
            m.hyperparameter_searching()
        r_pos = float(m.a_quantizer.scale[0].detach())
        r_neg = float(m.a_quantizer.scale[1].detach())
        rw_s = m.w_quantizer.scale.detach().numpy()

    w_s, w_z, s_pos, s_neg = SRCH.search_linear_postgelu_twin(
        jnp.asarray(x3.reshape(-1, I)), jnp.asarray(y3.reshape(-1, O)),
        jnp.asarray(w), jnp.asarray(b), w_bits=BITS, a_bits=BITS, n_V=1,
        eq_n=EQ_N, steps=STEPS, rounds=ROUNDS, use_fpcs=True)

    assert np.isclose(float(s_neg[0]), r_neg, rtol=1e-6)
    assert np.isclose(float(s_pos[0]), r_pos, rtol=1e-5), \
        (float(s_pos[0]), r_pos)
    frac, pair = _agree(w_s, rw_s)
    assert frac >= 0.6, pair


# ---------------------------------------------------------------------------
# patch-embed Conv2d (conv.py:313-334)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conv_vs_reference(rng):
    ref = load_reference()
    S, C, HW, OC, K = 8, 3, 16, 12, 4
    x = rng.standard_normal((S, C, HW, HW)).astype(np.float32)
    w = (rng.standard_normal((OC, C, K, K)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(OC) * 0.1).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.conv.AsymmetricallyBatchingQuantConv2d(
            C, OC, K, stride=K, bias=True, w_bit=BITS, a_bit=8,
            calib_batch_size=4, search_round=ROUNDS, eq_n=EQ_N, fpcs=True,
            steps=STEPS)
        with torch.no_grad():
            m.weight.copy_(_t(w))
            m.bias.copy_(_t(b))
            y = torch.nn.functional.conv2d(_t(x), _t(w), _t(b), stride=K)
        m.raw_input, m.raw_out = _t(x), y.clone()
        with torch.no_grad():
            m.hyperparameter_searching()
        rw_s = m.w_quantizer.scale.detach().numpy()
        rw_z = m.w_quantizer.zero_point.detach().numpy()
        y_np = y.numpy()

    w_s, w_z = SRCH.search_conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y_np.transpose(0, 2, 3, 1)),
        jnp.asarray(w), jnp.asarray(b), w_bits=BITS, eq_n=EQ_N, steps=STEPS,
        use_fpcs=True, conv_dims=(K, K, K, 0))

    frac, pair = _agree(w_s, rw_s)
    assert frac >= 0.6, pair
    frac, pair = _agree(w_z, rw_z, rtol=1e-6)
    assert frac >= 0.6, pair


# ---------------------------------------------------------------------------
# channel-wise Linear + LayerNorm reparam (linear.py:548-621)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_channelwise_reparam_vs_reference(rng):
    """Full channel-wise pipeline vs upstream: per-channel self-search ->
    reparam fold into the preceding LayerNorm -> cached-input rewrite ->
    per-tensor re-search."""
    ref = load_reference()
    from adalog_tpu.calib.reparam import (layernorm_channel_reparam,
                                          rewrite_cached_input)
    from adalog_tpu.models.layers import LinearP, LayerNormP

    S, T, I, O = 8, 6, 16, 24
    x3 = (rng.standard_normal((S, T, I)) *
          (0.5 + rng.random(I))[None, None, :]).astype(np.float32)
    w = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(O) * 0.1).astype(np.float32)
    y3 = (x3 @ w.T + b).astype(np.float32)
    g_ln = (1 + 0.1 * rng.standard_normal(I)).astype(np.float32)
    b_ln = (0.1 * rng.standard_normal(I)).astype(np.float32)

    with cuda_stubs() as torch:
        m = ref.linear.AsymmetricallyChannelWiseBatchingQuantLinear(
            I, O, bias=True, w_bit=BITS, a_bit=BITS, calib_batch_size=4,
            search_round=ROUNDS, eq_n=EQ_N, n_V=1, fpcs=True, steps=STEPS)
        ln = torch.nn.LayerNorm(I)
        with torch.no_grad():
            ln.weight.copy_(_t(g_ln))
            ln.bias.copy_(_t(b_ln))
            m.weight.copy_(_t(w))
            m.bias.copy_(_t(b))
        m.prev_layer = ln
        m.raw_input, m.raw_out = _t(x3), _t(y3)
        with torch.no_grad():
            m.hyperparameter_searching()     # channel-wise self-search only
            r_cw_scale = m.a_quantizer.scale.detach().numpy().copy()
            r_cw_zp = m.a_quantizer.zero_point.detach().numpy().copy()
            m.reparam()                      # fold + rewrite + re-search
        ref_ln_w = ln.weight.detach().numpy()
        ref_ln_b = ln.bias.detach().numpy()
        ref_w = m.weight.detach().numpy()
        ref_b = m.bias.detach().numpy()
        ra_s = float(m.a_quantizer.scale.detach())
        ra_z = float(m.a_quantizer.zero_point.detach())
        rw_s = m.w_quantizer.scale.detach().numpy()
        rw_z = m.w_quantizer.zero_point.detach().numpy()

    # 1) our channel-wise self-search agrees with the reference's (modulo
    #    per-channel near-ties)
    from adalog_tpu.calib import search as SRCH2
    x2 = jnp.asarray(x3.reshape(-1, I))
    a_s, a_z = SRCH2.search_act_channelwise(
        x2, a_bits=BITS, eq_n=EQ_N, steps=STEPS, use_fpcs=True)
    frac, pair = _agree(a_s, r_cw_scale, rtol=1e-5)
    assert frac >= 0.8, pair

    # 2) fold math: feed the REFERENCE's own channel selections into our
    #    reparam — every derived quantity must then match exactly (the
    #    target mean couples all channels, so selection flips cannot be
    #    tolerated out per-channel)
    norm = LayerNormP(g=jnp.asarray(g_ln), b=jnp.asarray(b_ln))
    lin = LinearP(w=jnp.asarray(w), b=jnp.asarray(b))
    new_norm, new_lin, r, bb, _, _ = layernorm_channel_reparam(
        norm, lin, jnp.asarray(r_cw_scale), jnp.asarray(r_cw_zp))
    np.testing.assert_allclose(np.asarray(new_norm.g), ref_ln_w,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_norm.b), ref_ln_b,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_lin.w), ref_w,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_lin.b), ref_b,
                               rtol=1e-4, atol=1e-5)

    # 3) per-tensor re-search on the identically rewritten input:
    #    objective-equivalent selections
    x2r = rewrite_cached_input(x2, r, bb)
    w_s, w_z, a_s2, a_z2 = SRCH2.search_linear_default(
        x2r, jnp.asarray(y3.reshape(-1, O)), new_lin.w, new_lin.b,
        w_bits=BITS, a_bits=BITS, n_V=1, eq_n=EQ_N, steps=STEPS,
        rounds=ROUNDS, use_fpcs=True)
    x64 = np.asarray(x2r, np.float64)
    tgt = (y3.reshape(-1, O) - ref_b).astype(np.float64)
    mse_repo = _linear_mse(x64, tgt, np.asarray(new_lin.w, np.float64),
                           np.asarray(w_s, np.float64).reshape(O, 1),
                           np.asarray(w_z, np.float64).reshape(O, 1),
                           float(a_s2[0]), float(a_z2[0]))
    mse_ref = _linear_mse(x64, tgt, ref_w.astype(np.float64),
                          rw_s.astype(np.float64).reshape(O, 1),
                          rw_z.astype(np.float64).reshape(O, 1),
                          ra_s, ra_z)
    assert mse_repo <= mse_ref * 1.01 and mse_ref <= mse_repo * 1.01, \
        (mse_repo, mse_ref)
