"""Candidate-scoring primitives for the calibration search.

The reference evaluates ``parallel_eq_n`` candidate quantization params per
batched pass, chunked by GPU memory and looped in Python with host<->device
re-uploads on every chunk (linear.py:141-235, 296-430; matmul.py:135-240;
conv.py:170-260). Here each scoring family is one jit-compatible function
vmapped over all eq_n candidates, chunked deterministically with
``lax.map(..., batch_size=...)`` so intermediates stay under a fixed budget and
everything runs on-device in a single compiled program.

Conventions
  - similarity = negative sum of squared error (reference `_get_similarity`,
    linear.py:87-88); reductions follow the reference's mean-over-feature /
    sum-over-batch ordering where it affects ranking granularity.
  - x is pre-flattened to (T, I) tokens; targets have the layer bias already
    subtracted (the bias is candidate-independent, so folding it into the
    target is exact and removes E copies of the bias add).
  - all math in float32 (scores are argmax-compared; see SURVEY.md §7 on
    accumulation-order parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from adalog_tpu.quantizers.logarithm import ADALOG_R, adalog_mantissa

HIGHEST = jax.lax.Precision.HIGHEST

# Max bytes for any single candidate-chunk intermediate. Determines the
# deterministic analog of the reference's GPU-memory-derived parallel_eq_n
# (linear.py:111-121) — no try/except-OOM retries (XLA cannot catch OOM).
SCORE_BUDGET_BYTES = 1 << 30

# dtype of the scoring GEMMs. float32 (default) matches the reference's CUDA
# fp32 numerics; bfloat16 runs the MXU ~4x faster with fp32 accumulation —
# candidate *rankings* are argmax-compared, so bf16 input rounding only
# perturbs near-ties (validated in tests/test_search_dtype.py). Set via
# set_score_dtype() from Config.search_dtype. Measured SLOWER on-chip than
# fp32 at default precision (the astype copies cost more than the MXU saves,
# ROUND2_NOTES) — superseded by set_score_precision below.
_SCORE_DTYPE = jnp.float32

# Precision of the fp32 candidate-scoring GEMMs. HIGHEST reproduces the
# reference's exact-fp32 CUDA numerics (~14 TFLOP/s measured on v5e);
# DEFAULT lets the MXU run its native passes on fp32 operands (~46 TFLOP/s)
# while ACCUMULATION stays fp32 — only operand mantissas are rounded, so
# candidate rankings flip only at near-ties (probed per family on real
# deit_small shapes: scripts/probe_precision.py; differential oracles stay
# on HIGHEST via tests which pin cfg.search_precision).
_SCORE_PRECISION = HIGHEST


def set_score_dtype(name: str):
    """Select the scoring GEMM dtype. The dtype is baked into traced search
    programs, so switching it invalidates jit caches."""
    global _SCORE_DTYPE
    new = jnp.bfloat16 if name == "bfloat16" else jnp.float32
    if new is not _SCORE_DTYPE:
        _SCORE_DTYPE = new
        jax.clear_caches()


def set_score_precision(name: str):
    """Select fp32 scoring-GEMM precision: 'highest' or 'default'. Baked
    into traced programs, so switching invalidates jit caches."""
    global _SCORE_PRECISION
    new = HIGHEST if name == "highest" else jax.lax.Precision.DEFAULT
    if new is not _SCORE_PRECISION:
        _SCORE_PRECISION = new
        jax.clear_caches()


def _mm(a, b):
    """Scoring matmul in the configured dtype, fp32 accumulate."""
    if _SCORE_DTYPE == jnp.bfloat16:
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, precision=_SCORE_PRECISION,
                      preferred_element_type=jnp.float32)


def _chunk_size(eq_n: int, bytes_per_candidate: int) -> int:
    cap = max(1, SCORE_BUDGET_BYTES // max(1, bytes_per_candidate))
    c = min(eq_n, cap)
    # largest divisor of eq_n not exceeding the cap keeps lax.map shapes static
    while eq_n % c:
        c -= 1
    return c


def _map(fn, cands, eq_n: int, bytes_per_candidate: int):
    bs = _chunk_size(eq_n, bytes_per_candidate)
    return lax.map(fn, cands, batch_size=bs)


def uq_asym(x, scale, zp, bits: int):
    """Search-path asymmetric fake quant (zp candidates are already integers)."""
    N = 2 ** (bits - 1)
    q = jnp.clip(jnp.round(x / scale) + zp, 0, 2 * N - 1)
    return (q - zp) * scale


def adalog_fq_search(x, scale, q, bits: int, clamp_upper: bool = True):
    """Search-path AdaLog fake quant via the shift/mantissa decomposition
    (linear.py:829-836, matmul.py:330-337). ``scale``/``q`` may be candidates."""
    N = 2 ** (bits - 1)
    scaled = x / scale
    scaled = jnp.clip(scaled, 1e-15, 1.0) if clamp_upper else scaled
    code = jnp.round(-jnp.log2(scaled) * ADALOG_R / q)
    keep = code < 2 * N
    code = jnp.clip(code, 0, 2 * N - 1)
    prod = code * q
    dq = jnp.exp2(-jnp.floor(prod / ADALOG_R)) * adalog_mantissa(
        jnp.round(jnp.remainder(prod, ADALOG_R)), bits)
    return dq * keep * scale


# ---------------------------------------------------------------------------
# Self-searches (score the quantization error of the tensor itself)
# ---------------------------------------------------------------------------

def score_weight_self(w_v, scales, zps, bits: int, mem_scale: int = 1):
    """w_v: (V, R, I); scales/zps: (E, V, R, 1) -> similarity (E, V, R).

    Reference linear.py:296-318 (_search_best_w_scale_self): per-row-group mean
    of squared weight quantization error.
    """
    E = scales.shape[0]

    def one(c):
        s, z = c
        dq = uq_asym(w_v, s, z, bits)
        return -jnp.mean(jnp.square(w_v - dq), axis=-1)

    return _map(one, (scales, zps), E, w_v.size * 4 * mem_scale)


def score_act_self(x, scales, zps, bits: int, *, channel_wise: bool,
                   n_batch: int, mem_scale: int = 1):
    """x: (T, I) flattened tokens from n_batch calibration samples.

    Per-tensor: scales (E, 1) -> (E,);  channel-wise: scales (E, I) -> (E, I).
    Reference linear.py:320-353 (_search_best_a_scale_self): mean over token
    dims, sum over batch — with equal-sized batches that ordering equals a
    constant times the mean over T, which is ranking-equivalent.
    """
    E = scales.shape[0]

    def one(c):
        s, z = c
        dq = uq_asym(x, s, z, bits)
        err = jnp.square(x - dq)
        if channel_wise:
            return -jnp.sum(err, axis=0) * (n_batch / x.shape[0])
        return -jnp.mean(err) * n_batch

    return _map(one, (scales, zps), E, x.size * 4 * mem_scale)


# ---------------------------------------------------------------------------
# Output-MSE searches (score layer-output reconstruction)
# ---------------------------------------------------------------------------

def score_linear_w_out(x_q, target, w_v, scales, zps, bits: int,
                       mem_scale: int = 1):
    """Weight-candidate scoring against layer output.

    x_q: (T, I) activation-quantized input; target: (T, O) raw output minus
    bias; w_v: (V, R, I); scales/zps: (E, V, R, 1) -> similarity (E, V, R).
    Reference linear.py:355-392 (_search_best_w_scale): per-output-unit SSE.
    """
    E = scales.shape[0]
    T, O = target.shape
    V, R, I = w_v.shape
    tgt = target.reshape(T, V, R)

    def one(c):
        s, z = c
        w_dq = uq_asym(w_v, s, z, bits)                       # (V, R, I)
        if _SCORE_DTYPE == jnp.bfloat16:
            out = jnp.einsum("ti,vri->tvr", x_q.astype(jnp.bfloat16),
                             w_dq.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("ti,vri->tvr", x_q, w_dq,
                             preferred_element_type=jnp.float32,
                             precision=_SCORE_PRECISION)
        return -jnp.sum(jnp.square(tgt - out), axis=0)        # (V, R)

    return _map(one, (scales, zps), E, (T * O + V * R * I) * 4 * mem_scale)


def gram_stats(x_q, target):
    """Precompute (G, C) for the Gram-form weight scoring.

    G = x_qᵀ x_q (I, I);  C[o, i] = Σ_t target[t, o]·x_q[t, i] (O, I).
    Computed once per search round; every candidate then scores in O(O·I²)
    instead of O(T·O·I) — a ~T/I-fold FLOP cut with no E×T×O intermediate.
    """
    G = jnp.matmul(x_q.T, x_q, precision=HIGHEST)
    Cm = jnp.matmul(target.T, x_q, precision=HIGHEST)
    return G, Cm


def score_linear_w_out_gram(G, Cm, w_v, scales, zps, bits: int,
                            mem_scale: int = 1):
    """Gram-form weight-candidate scoring, ranking-equivalent to
    score_linear_w_out: per output unit,
        -SSE[e,o] = -(Σtgt² - 2·w·C[o] + w·G·w) ≡ 2·w·C[o] - w·G·w + const.
    The target-energy constant is dropped (it cancels in the per-unit argmax),
    which also removes one source of fp32 cancellation.
    """
    E = scales.shape[0]
    V, R, I = w_v.shape
    Cv = Cm.reshape(V, R, I)

    def one(c):
        s, z = c
        w_dq = uq_asym(w_v, s, z, bits)                       # (V, R, I)
        term2 = jnp.sum(w_dq * Cv, axis=-1)                   # (V, R)
        wG = jnp.einsum("vri,ij->vrj", w_dq, G,
                        preferred_element_type=jnp.float32,
                        precision=_SCORE_PRECISION)
        term3 = jnp.sum(wG * w_dq, axis=-1)                   # (V, R)
        return 2.0 * term2 - term3

    return _map(one, (scales, zps), E, 2 * V * R * I * 4 * mem_scale)


def score_linear_a_out(x, target, w_q, scales, zps, bits: int,
                       mem_scale: int = 1):
    """Activation-candidate scoring against layer output (per-tensor).

    x: (T, I); target: (T, O) minus bias; w_q: (O, I) weight-quantized.
    scales/zps: (E, 1) -> similarity (E,).
    Reference linear.py:394-430 (_search_best_a_scale).
    """
    E = scales.shape[0]
    T, O = target.shape

    def one(c):
        s, z = c
        x_dq = uq_asym(x, s, z, bits)
        out = _mm(x_dq, w_q.T)
        return -jnp.sum(jnp.square(target - out))

    return _map(one, (scales, zps), E, (T * O + x.size) * 4 * mem_scale)


def act_gram_stats(target, w_q):
    """Precompute (Mw, Gw) for the Gram-form ACTIVATION scoring.

    Mw[t, i] = Σ_o target[t, o]·w_q[o, i] (T, I);  Gw = w_qᵀ w_q (I, I).
    Computed once per round (w_q is fixed while activation candidates vary);
    every candidate then scores in O(T·I²) instead of O(T·I·O) — a ~O/I-fold
    FLOP cut at the sites where out_features > in_features (qkv 3x, fc1 4x,
    head ~2.6x). Stats at HIGHEST like gram_stats: their cost is one direct
    candidate eval, amortized over the whole FPCS grid.
    """
    Mw = jnp.matmul(target, w_q, precision=HIGHEST)
    Gw = jnp.matmul(w_q.T, w_q, precision=HIGHEST)
    return Mw, Gw


def score_linear_a_out_gram(x, Mw, Gw, scales, zps, bits: int,
                            mem_scale: int = 1):
    """Gram-form activation-candidate scoring, ranking-equivalent to
    score_linear_a_out:
        -SSE(e) = -(Σtgt² - 2·Σ x_dq∘Mw + Σ (x_dq Gw)∘x_dq)
                ≡ 2·Σ x_dq∘Mw - Σ (x_dq Gw)∘x_dq + const.
    The constant target energy is dropped (cancels in the argmax over e).
    """
    E = scales.shape[0]

    def one(c):
        s, z = c
        x_dq = uq_asym(x, s, z, bits)
        term2 = jnp.sum(x_dq * Mw)
        if _SCORE_DTYPE == jnp.bfloat16:
            xG = jnp.matmul(x_dq.astype(jnp.bfloat16),
                            Gw.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        else:
            xG = jnp.matmul(x_dq, Gw, preferred_element_type=jnp.float32,
                            precision=_SCORE_PRECISION)
        term3 = jnp.sum(xG * x_dq)
        return 2.0 * term2 - term3

    return _map(one, (scales, zps), E, 2 * x.size * 4 * mem_scale)


def score_linear_a_out_twin(x, target, w_q, scales_pos, scale_neg, bits: int,
                            mem_scale: int = 1):
    """PTQ4ViT twin-range positive-scale scoring (linear.py:660-695).

    scales_pos: (E, 1); scale_neg: fixed (1,). similarity (E,).
    """
    E = scales_pos.shape[0]
    N = 2 ** (bits - 1)
    T, O = target.shape
    x_neg = jnp.clip(jnp.round(x / scale_neg), -N, 0) * scale_neg

    def one(sp):
        x_pos = jnp.clip(jnp.round(x / sp), 0, N - 1) * sp
        out = _mm(x_pos + x_neg, w_q.T)
        return -jnp.sum(jnp.square(target - out))

    return _map(one, scales_pos, E, (T * O + x.size) * 4 * mem_scale)


def score_linear_a_out_adalog(x, target, w_q, shift, scales, qs, bits: int,
                              mem_scale: int = 1):
    """Post-GeLU AdaLog scoring with per-candidate (scale, q) pairs.

    x: (T, I) raw input; target minus bias; shift: scalar (GELU_MIN).
    scales/qs: (E, 1) -> similarity (E,).
    Reference linear.py:816-939 (_search_best_a_scale/_log_base/_scale_logbase
    share this kernel; fixing one of scale/q gives the single-axis searches).
    """
    E = scales.shape[0]
    T, O = target.shape

    def one(c):
        s, q = c
        x_dq = adalog_fq_search(x + shift, s, q, bits) - shift
        out = _mm(x_dq, w_q.T)
        return -jnp.sum(jnp.square(target - out))

    return _map(one, (scales, qs), E, (T * O + x.size) * 4 * mem_scale)


# ---------------------------------------------------------------------------
# MatMul searches (attention q@kT and softmax@v)
# ---------------------------------------------------------------------------

def _matmul_sim(err2, head_channel_wise: bool):
    """err2: (N, H, S, S2) -> (H,) or () following matmul.py:157-162:
    per-head mean over trailing dims, sum over batch."""
    if head_channel_wise:
        return -jnp.sum(jnp.mean(err2, axis=(2, 3)), axis=0)
    return -jnp.sum(jnp.mean(err2, axis=(1, 2, 3)), axis=0)


def score_matmul_opA(A, B_q, target, scales, zps, bits: int,
                     head_channel_wise: bool, mem_scale: int = 1):
    """Candidate-quantize A against raw A@B output (matmul.py:135-173).

    A: (N, H, S, C); B_q: (N, H, C, S2) already quantized; target: (N, H, S, S2).
    scales/zps: (E, 1, H|1, 1, 1) -> similarity (E, H) or (E,).
    """
    E = scales.shape[0]

    def one(c):
        s, z = c                        # (1, H|1, 1, 1) broadcast vs (N, H, S, C)
        A_dq = uq_asym(A, s, z, bits)
        out = _mm(A_dq, B_q)
        return _matmul_sim(jnp.square(target - out), head_channel_wise)

    return _map(one, (scales, zps), E, (target.size + A.size) * 4 * mem_scale)


def score_matmul_opB(A_q, B, target, scales, zps, bits: int,
                     head_channel_wise: bool, mem_scale: int = 1):
    """Candidate-quantize B against raw A@B output (matmul.py:175-209)."""
    E = scales.shape[0]

    def one(c):
        s, z = c
        B_dq = uq_asym(B, s, z, bits)
        out = _mm(A_q, B_dq)
        return _matmul_sim(jnp.square(target - out), head_channel_wise)

    return _map(one, (scales, zps), E, (target.size + B.size) * 4 * mem_scale)


def _es(subs, a, b):
    """Scoring einsum in the configured dtype, fp32 accumulate (einsum
    analog of _mm for the batched-per-head gram contractions)."""
    if _SCORE_DTYPE == jnp.bfloat16:
        return jnp.einsum(subs, a.astype(jnp.bfloat16),
                          b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(subs, a, b, precision=_SCORE_PRECISION,
                      preferred_element_type=jnp.float32)


def _matmul_sim_gram(sse, denom, head_channel_wise: bool):
    """sse: (N, H) per-slice SSE (up to the dropped target-energy constant)
    -> (H,) or () with _matmul_sim's mean/sum ordering."""
    sim = -sse / denom
    if head_channel_wise:
        return jnp.sum(sim, axis=0)
    return jnp.sum(jnp.mean(sim, axis=1), axis=0)


def matmul_gram_stats_opA(B_q, target):
    """(G_B, M) for the Gram-form A-candidate matmul scoring.

    B_q: (N, H, C, S2) quantized; target: (N, H, S, S2).
    G_B[n,h] = B_q B_qᵀ (C, C);  M[n,h] = target·B_qᵀ (S, C).
    Every A candidate then scores in O(S·C²) per slice instead of O(S·S2·C)
    — an S2/C-fold FLOP cut (~3x at ViT head_dim 64, ~4.5x at Swin windows).
    Stats at HIGHEST: their cost is one direct candidate eval, amortized
    over the whole FPCS grid.
    """
    G = jnp.einsum("nhcs,nhds->nhcd", B_q, B_q, precision=HIGHEST)
    M = jnp.einsum("nhst,nhct->nhsc", target, B_q, precision=HIGHEST)
    return G, M


def score_matmul_opA_gram(A, G_B, M, target_s2: int, scales, zps, bits: int,
                          head_channel_wise: bool, mem_scale: int = 1):
    """Gram-form A-candidate scoring, ranking-equivalent to score_matmul_opA:
    per (n, h), SSE = tr(A_dqᵀA_dq · G_B) − 2⟨A_dq, M⟩ + const (dropped).
    target_s2: the S2 extent of the dropped target (mean denominator)."""
    E = scales.shape[0]
    N, H, S, C = A.shape
    denom = S * target_s2

    def one(c):
        s, z = c
        A_dq = uq_asym(A, s, z, bits)
        GA = _es("nhsc,nhsd->nhcd", A_dq, A_dq)
        sse = (jnp.sum(GA * G_B, axis=(2, 3))
               - 2.0 * jnp.sum(A_dq * M, axis=(2, 3)))          # (N, H)
        return _matmul_sim_gram(sse, denom, head_channel_wise)

    return _map(one, (scales, zps), E,
                (A.size + N * H * C * C) * 4 * mem_scale)


def matmul_gram_stats_opB(A_q, target):
    """(G_A, M2) for the Gram-form B-candidate matmul scoring.

    A_q: (N, H, S, C) quantized; target: (N, H, S, S2).
    G_A[n,h] = A_qᵀ A_q (C, C);  M2[n,h] = A_qᵀ·target (C, S2).
    Every B candidate then scores in O(C²·S2) per slice instead of
    O(S·C·S2) — an S/C-fold FLOP cut.
    """
    G = jnp.einsum("nhsc,nhsd->nhcd", A_q, A_q, precision=HIGHEST)
    M2 = jnp.einsum("nhsc,nhst->nhct", A_q, target, precision=HIGHEST)
    return G, M2


def score_matmul_opB_gram(B, G_A, M2, target_s: int, scales, zps, bits: int,
                          head_channel_wise: bool, mem_scale: int = 1):
    """Gram-form B-candidate scoring, ranking-equivalent to score_matmul_opB:
    per (n, h), SSE = tr(B_dqᵀ·G_A·B_dq) − 2⟨B_dq, M2⟩ + const (dropped).
    target_s: the S extent of the dropped target (for the mean denominator).
    """
    E = scales.shape[0]
    N, H, C, S2 = B.shape
    denom = target_s * S2

    def one(c):
        s, z = c
        B_dq = uq_asym(B, s, z, bits)
        GB = _es("nhcd,nhds->nhcs", G_A, B_dq)
        sse = (jnp.sum(GB * B_dq, axis=(2, 3))
               - 2.0 * jnp.sum(B_dq * M2, axis=(2, 3)))         # (N, H)
        return _matmul_sim_gram(sse, denom, head_channel_wise)

    return _map(one, (scales, zps), E,
                (B.size + N * H * C * S2) * 4 * mem_scale)


def score_postsoftmax_base(A, B_q, target, qs, bits: int,
                           mem_scale: int = 1):
    """AdaLog log-base (q) scoring for the post-softmax operand, scale frozen
    at 1.0 (matmul.py:321-358). A in [0, 1]; qs: (E,) -> similarity (E,)."""
    E = qs.shape[0]

    def one(q):
        A_dq = adalog_fq_search(A, 1.0, q, bits, clamp_upper=False)
        out = _mm(A_dq, B_q)
        return _matmul_sim(jnp.square(target - out), head_channel_wise=False)

    return _map(one, qs, E, (target.size + A.size) * 4 * mem_scale)


# ---------------------------------------------------------------------------
# Conv search (patch-embed projection)
# ---------------------------------------------------------------------------

def score_conv_w_out(x, target, w_flat, conv_dims, scales, zps, bits: int,
                     mem_scale: int = 1):
    """Weight-candidate scoring for conv (conv.py:233-264): per-out-channel SSE.

    x: (N, H, W, IC) NHWC (activations pass through unquantized at >=8 bits,
    conv.py:55-58); target: (N, FH, FW, OC) minus bias; w_flat: (OC, IC*KH*KW);
    conv_dims: (kh, kw, stride, padding) static; scales/zps: (E, OC, 1).
    """
    E = scales.shape[0]
    kh, kw, stride, padding = conv_dims
    OC = w_flat.shape[0]
    IC = x.shape[-1]
    N, H, W, _ = x.shape

    if kh == stride and kw == stride and padding == 0 \
            and H % kh == 0 and W % kw == 0:
        # Patch-embed case (every zoo model): kernel == stride means the conv
        # IS patch extraction + GEMM. The direct conv lowering is ~100x slower
        # on TPU — XLA pads the 3-lane input channel up to the 128-wide
        # register lane, so nearly all MXU work is on padding (measured 281 s
        # for this one site on a v5e). Extract patches once, flattened in the
        # weight's (IC, KH, KW) order, and score candidates with plain GEMMs.
        Ho, Wo = H // kh, W // kw
        patches = x.reshape(N, Ho, kh, Wo, kw, IC).transpose(
            0, 1, 3, 5, 2, 4).reshape(N * Ho * Wo, IC * kh * kw)
        tgt2 = target.reshape(N, Ho * Wo, OC)

        def one(c):
            s, z = c
            out = _mm(patches, uq_asym(w_flat, s, z, bits).T)
            err2 = jnp.square(tgt2 - out.reshape(N, Ho * Wo, OC))
            # mean over spatial dims, sum over batch (conv.py:256)
            return -jnp.sum(jnp.mean(err2, axis=1), axis=0)

        return _map(one, (scales, zps), E,
                    (target.size + w_flat.size) * 4 * mem_scale)

    def one(c):
        s, z = c
        w_dq = uq_asym(w_flat, s, z, bits).reshape(OC, IC, kh, kw)
        out = lax.conv_general_dilated(
            x, jnp.transpose(w_dq, (2, 3, 1, 0)),
            window_strides=(stride, stride),
            padding=[(padding, padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32, precision=_SCORE_PRECISION)
        # mean over spatial dims, sum over batch -> per-out-channel (conv.py:256)
        return -jnp.sum(jnp.mean(jnp.square(target - out), axis=(1, 2)), axis=0)

    return _map(one, (scales, zps), E, (target.size + w_flat.size) * 4 * mem_scale)
