"""Calibration orchestration.

The reference calibrates layer-by-layer: for each quant module it re-runs the
FULL model over the calibration set with hooks to capture that module's I/O,
then searches (utils/calibrator.py:30-67) — O(layers) full passes with
host<->device copies at every hook. Because every module stays in 'raw' mode
until calibration ends (calibrator.py:65-67), all captured activations are pure
FP32 — so here we capture EVERY site's I/O in ONE jitted forward pass per
calibration batch, then run each site's search independently on-device.

The LayerNorm channel reparam (sites wired to a prev norm) rewrites the param
pytree and that site's cached input, exactly as linear.py:614-621; downstream
sites are unaffected because the rewrite preserves the composite function.

After all searches, ``finish_calibration`` applies the post-GeLU bias fold
(test_quant.py:130-133 finish_training) unless block reconstruction follows.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.utils.config import Config
from adalog_tpu.models.zoo import ModelSpec, model_forward_fn
from adalog_tpu.models.layers import LinearSite, ConvSite, MatMulSite
from adalog_tpu.quantizers.state import (
    QuantizerState, WeightQuantizerState, GELU_MIN,
)
from adalog_tpu.calib.layout import quant_layout, tree_get, tree_set, SiteSpec
from adalog_tpu.utils.resume import RESUME_MAGIC, resume_scan, resume_append
from adalog_tpu.calib import search as SRCH
from adalog_tpu.ops import scoring
from adalog_tpu.calib.reparam import (
    layernorm_channel_reparam, rewrite_cached_input, fold_gelu_shift_into_bias,
)

log = logging.getLogger("adalog_tpu")


def capture_all_sites(spec: ModelSpec, params, batches: List[np.ndarray],
                      device_budget_bytes: int = None, names=None,
                      spill_dtype=None, capture_dtype=None, mesh=None):
    """Run the raw model once per batch, capturing every quant site's I/O.

    Returns dict name -> tuple of concatenated arrays (inputs..., output).
    ``names`` restricts capture to those sites (resume skips already-searched
    ones). When the total capture footprint (known ahead of time via
    jax.eval_shape) exceeds ``device_budget_bytes``, taps spill to host memory
    per batch and are re-uploaded site-by-site at search time — the
    deterministic analog of the reference's keep-activations-on-CPU policy
    (calibrator.py:17-28), taken only when actually needed. In spill mode the
    taps are additionally captured in GROUPS over multiple forward passes: a
    single program returning the full 15-30 GB tap set both exceeds device
    memory and crashes XLA's remat pass at vit_large scale, while the extra
    forward FLOPs are negligible next to the searches.

    ``spill_dtype`` (e.g. jnp.bfloat16) downcasts taps ON DEVICE before the
    host transfer — only when spilling — halving the device<->host bytes that
    dominate big-model wall-clock through the ~20 MB/s tunnel (vit_large:
    ~1,230 s of 2,983 s, ROUND2_NOTES). Search still runs in fp32 (taps are
    upcast after re-upload); selection drift is bounded by the spill-parity
    differential (tests/test_calib_e2e.py) and the on-chip probe.

    ``capture_dtype`` (e.g. jnp.bfloat16) keeps the taps in that dtype ON
    DEVICE unconditionally — halving the capture FOOTPRINT, not just the
    transfers. The spill decision is then made against the halved bytes, so
    a model whose fp32 taps exceed the device budget (vit_large: 15 GB vs
    8 GB) can avoid spilling entirely and never touch the slow tunnel.
    Implies the same rounding class as spill_dtype (searches upcast to fp32
    at consumption); when set it supersedes spill_dtype.

    ``mesh``: data-parallel capture — each batch is dp-sharded over the mesh
    before the jitted forward, so capture FLOPs and resident tap memory
    scale across chips; the taps come out sharded along the batch axis,
    composing with the token-sharded searches downstream (both shard dim 0
    of the flattened (tokens, features) view).
    """
    from functools import partial

    fwd = model_forward_fn(spec)

    @partial(jax.jit, static_argnames=("names",))
    def run_group(p, x, names=None):
        _, taps = fwd(spec.cfg, p, x, capture=True)
        return taps if names is None else {k: taps[k] for k in names}

    spill = False
    shapes = jax.eval_shape(run_group, params, jax.ShapeDtypeStruct(
        batches[0].shape, jnp.float32))
    if names is not None:
        shapes = {nm: shapes[nm] for nm in names}
        if not shapes:
            return {}
    groups = [None] if names is None else [tuple(shapes)]
    tap_itemsize = 2 if capture_dtype == jnp.bfloat16 else 4
    if device_budget_bytes is not None:
        site_bytes = {
            nm: sum(int(np.prod(s.shape)) * tap_itemsize for s in tup)
            for nm, tup in shapes.items()}
        per_batch_bytes = sum(site_bytes.values())
        total = per_batch_bytes * len(batches)
        spill = total > device_budget_bytes
        # grouped passes whenever ONE pass's return set is large — even when
        # the total fits on device (bf16 capture_dtype at vit_large scale):
        # a single program returning the multi-GB tap set crashes XLA's
        # remat pass and spikes memory (forward intermediates + all taps)
        pass_cap = max(device_budget_bytes // 4, max(site_bytes.values()))
        if per_batch_bytes > pass_cap:
            groups, cur, cur_b = [], [], 0
            for nm in shapes:                    # insertion = layout order
                if cur and cur_b + site_bytes[nm] > pass_cap:
                    groups.append(tuple(cur))
                    cur, cur_b = [], 0
                cur.append(nm)
                cur_b += site_bytes[nm]
            if cur:
                groups.append(tuple(cur))
            log.info("capture footprint %.1f GB (budget %.1f GB): %s in "
                     "%d passes/batch",
                     total / 2**30, device_budget_bytes / 2**30,
                     "spilling to host" if spill else
                     "grouped on-device capture", len(groups))

    cast_dtype = capture_dtype or (spill_dtype if spill else None)

    @partial(jax.jit, static_argnames=("names",))
    def run_group_cast(p, x, names=None):
        taps = run_group(p, x, names)
        return jax.tree_util.tree_map(
            lambda a: a.astype(cast_dtype), taps)

    per_batch = []
    for xb in batches:
        xb = jnp.asarray(xb)
        if mesh is not None and xb.shape[0] % mesh.devices.size == 0:
            from adalog_tpu.parallel.mesh import shard_batch
            xb = shard_batch(xb, mesh)
        taps = {}
        for g in groups:
            if cast_dtype is not None:
                part = run_group_cast(params, xb, g)
            else:
                part = run_group(params, xb, g)
            if spill:
                part = jax.tree_util.tree_map(lambda a: np.asarray(a), part)
            taps.update(part)
        per_batch.append(taps)
    cat = np.concatenate if spill else jnp.concatenate
    names = per_batch[0].keys()
    out = {}
    for nm in names:
        arity = len(per_batch[0][nm])
        out[nm] = tuple(
            cat([pb[nm][k] for pb in per_batch], axis=0)
            for k in range(arity))
    return out


def _flat2d(x):
    return x.reshape(-1, x.shape[-1])


class QuantCalibrator:
    """Functional analog of the reference QuantCalibrator (calibrator.py:9-67).

    mesh: optional jax.sharding.Mesh — calibration batches and the flattened
    token axis of every search are sharded over its 'dp' axis; GSPMD turns the
    similarity reductions into psums over ICI.
    resume_path: optional file — per-site results are appended after each
    search so an interrupted calibration restarts where it left off (the
    reference has no mid-calibration resume, SURVEY.md §5).
    """

    def __init__(self, spec: ModelSpec, params, cfg: Config,
                 reparam: bool = True, mesh=None, resume_path: str = None):
        self.spec = spec
        self.params = params
        self.cfg = cfg
        self.layout = quant_layout(spec, cfg, reparam)
        self.qstate: Dict[str, object] = {}
        self.mesh = mesh
        self.resume_path = resume_path
        self._pending = {}
        self._folded = {}    # name -> (r, b) of resume-restored reparam folds
        # sites whose taps were captured AFTER their fold was restored into
        # the params (streaming resume): the folded norm already outputs
        # x/r - b, so the cached-input rewrite must be skipped
        self._taps_post_fold = set()
        self._spill_dtype = (jnp.bfloat16 if getattr(
            cfg, "capture_spill_dtype", "float32") == "bfloat16" else None)
        self._capture_dtype = (jnp.bfloat16 if getattr(
            cfg, "capture_dtype", "float32") == "bfloat16" else None)
        scoring.set_score_dtype(cfg.search_dtype)
        scoring.set_score_precision(getattr(cfg, "search_precision",
                                            "highest"))

    def _dev_f32(self, x):
        """Upcast a bf16 spill tap to fp32 ON DEVICE (the bf16 array is what
        crosses the slow host<->device link; search math stays fp32)."""
        if getattr(x, "dtype", None) == jnp.bfloat16:
            return jnp.asarray(x).astype(jnp.float32)
        return x

    def _shard_tokens(self, x, dim: int = 0):
        x = self._dev_f32(x)
        if self.mesh is None:
            return x
        from adalog_tpu.parallel.mesh import shard_axis
        n = self.mesh.devices.size
        if x.shape[dim] % n:
            # exact semantics are preserved either way; zero-padding would
            # corrupt the percentile candidate grids, so replicate instead —
            # loudly (calib token counts are calib_size*tokens and divide the
            # mesh for every shipped config; this is the odd-size escape hatch)
            log.warning(
                "mesh: dim %d of %s not divisible by %d devices; keeping the "
                "array replicated for this search", dim, x.shape, n)
            return x
        return jax.device_put(jnp.asarray(x),
                              shard_axis(self.mesh, x.ndim, dim))

    # -- resume file: framed npz records, no pickle anywhere ----------------
    #
    # Each record is one v2-encoded npz blob (utils/checkpoint.py encode_bytes:
    # arrays + a JSON schema against the whitelisted dataclass registry, loaded
    # with allow_pickle=False), framed as MAGIC + uint64-LE length + blob so
    # records append atomically and a death mid-write only truncates the tail.
    #
    # Record kinds:
    #   ("site", name, site_state)          — a searched site's qstate entry
    #   ("fold", name, {norm, lin, r, b})   — a LayerNorm channel reparam: the
    #     folded norm/linear leaves plus the (r, b) input rewrite. Stored
    #     per-site (not as a whole-params snapshot) so a fold and its
    #     per-tensor re-search stay consistent across an interruption: on
    #     resume the fold is re-applied to the params, and the site's captured
    #     input — captured from the ORIGINAL params, exactly like an
    #     uninterrupted run's one-pass capture — is rewritten with the stored
    #     (r, b) instead of re-running stage 1 and folding a second time.

    _RESUME_MAGIC = RESUME_MAGIC     # kept for callers/tests; format owner
    #                                  is utils/resume.py (shared with BRECQ)

    def _resume_scan(self):
        """Read all complete records from the resume file (without applying)."""
        return resume_scan(self.resume_path)

    def _resume_apply(self, recs):
        n_sites = n_folds = 0
        for tag, name, payload in recs:
            if tag == "site":
                self.qstate[name] = payload
                n_sites += 1
            elif tag == "fold":
                ss = self.layout[name]
                self.params = tree_set(self.params, ss.norm_path,
                                       payload["norm"])
                self.params = tree_set(self.params, ss.param_path,
                                       payload["lin"])
                self._folded[name] = (payload["r"], payload["b"])
                n_folds += 1
        if recs:
            log.info("resumed %d calibrated sites (+%d reparam folds) from %s",
                     n_sites, n_folds, self.resume_path)

    def _resume_append(self, records):
        """Append ("site"|"fold", name, payload) records. Device leaves are
        materialized to host by the encoder — this is also the true-sync
        point the instrumented per-group timings rely on."""
        resume_append(self.resume_path, records)

    def _site_records(self, names):
        return [("site", nm, self.qstate[nm]) for nm in names]

    # -- per-family handlers -------------------------------------------------

    def _common(self):
        c = self.cfg
        return dict(eq_n=c.eq_n, steps=c.steps, use_fpcs=c.fpcs)

    def _do_conv(self, name, ss: SiteSpec, x, y):
        p = tree_get(self.params, ss.param_path)
        if getattr(self.cfg, "batch_sites", True):
            # defer like the other families so same-shape conv sites batch
            # (every shipped zoo model has a single patch-embed conv, so the
            # group is a singleton there and flushes through search_conv)
            key = ("conv", x.shape, p.w.shape, ss.w_bits, ss.a_bits)
            self._pending.setdefault(key, []).append((name, ss, x, y, p))
            return
        self._search_conv_now(name, ss, x, y, p)

    def _search_conv_now(self, name, ss, x, y, p):
        x, y = self._shard_tokens(x), self._shard_tokens(y)
        kh, kw = p.w.shape[2], p.w.shape[3]
        w_s, w_z = SRCH.search_conv(
            x, y, p.w, p.b, w_bits=ss.w_bits,
            conv_dims=(kh, kw, p.stride[0], p.padding[0]), **self._common())
        self._set_conv_state(name, ss, w_s, w_z)

    def _set_conv_state(self, name, ss, w_s, w_z):
        self.qstate[name] = ConvSite(
            wq=WeightQuantizerState(scale=w_s, zero_point=w_z,
                                    bits=ss.w_bits, symmetric=False),
            aq=QuantizerState(scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                              kind="uniform", bits=ss.a_bits, symmetric=True))

    def _linear_site(self, ss, w_s, w_z, aq) -> LinearSite:
        return LinearSite(
            wq=WeightQuantizerState(scale=w_s, zero_point=w_z,
                                    bits=ss.w_bits, symmetric=False),
            aq=aq, n_V=ss.n_V)

    def _do_linear(self, name, ss: SiteSpec, x, y):
        p = tree_get(self.params, ss.param_path)
        x2, y2 = _flat2d(x), _flat2d(y)

        if ss.kind == "linear_reparam":
            if name in self._folded:
                # resume restored this site's fold into the params; go
                # straight to the per-tensor search — folding again would
                # miscalibrate. One-pass capture ran from the ORIGINAL
                # params, so the stored (r, b) rewrite the tap; a streaming
                # wave captured AFTER the fold was applied sees the folded
                # norm's output (already x/r - b) and must not rewrite.
                if name not in self._taps_post_fold:
                    r, b = self._folded[name]
                    x2 = rewrite_cached_input(x2, jnp.asarray(r),
                                              jnp.asarray(b))
                    if self._capture_dtype is not None:
                        x2 = x2.astype(self._capture_dtype)
            elif getattr(self.cfg, "batch_sites", True) and p.b is not None:
                # defer stage 1 too: the channel-wise self-searches of every
                # same-shape reparam site run as one vmapped program (qkv and
                # fc1 inputs share (T, d_model)); the LayerNorm fold and the
                # per-tensor re-search happen at flush (_flush_reparam_group).
                if isinstance(y, np.ndarray) and not isinstance(x2, np.ndarray):
                    x2 = np.asarray(x2)
                key = ("reparam", x2.shape, ss.a_bits)
                self._pending.setdefault(key, []).append((name, ss, x2, y2, p))
                return
            else:
                # stage 1: channel-wise activation self-search
                # (linear.py:585-594)
                a_s, a_z = SRCH.search_act_channelwise(
                    self._shard_tokens(x2), a_bits=ss.a_bits, **self._common())
                # stage 2: fold ranges into the preceding LayerNorm
                # (linear.py:614-621)
                norm = tree_get(self.params, ss.norm_path)
                new_norm, new_lin, r, b, _, _ = layernorm_channel_reparam(
                    norm, p, a_s, a_z)
                self.params = tree_set(self.params, ss.norm_path, new_norm)
                self.params = tree_set(self.params, ss.param_path, new_lin)
                p = new_lin
                x2 = rewrite_cached_input(x2, r, b)
                self._resume_append([("fold", name, {
                    "norm": new_norm, "lin": new_lin, "r": r, "b": b})])

        if getattr(self.cfg, "batch_sites", True) and p.b is not None:
            # defer: same-shape sites are searched together in one vmapped
            # program (layer-batched calibration); any mesh sharding is
            # applied to the stacked group at flush time. In capture-spill
            # mode the stash stays on host so deferral cannot blow device
            # memory.
            if isinstance(y, np.ndarray) and not isinstance(x2, np.ndarray):
                x2 = np.asarray(x2)
            key = ("linear", x2.shape, p.w.shape, ss.w_bits, ss.a_bits,
                   ss.n_V)
            self._pending.setdefault(key, []).append((name, ss, x2, y2, p))
            return

        x2, y2 = self._shard_tokens(x2), self._shard_tokens(y2)
        w_s, w_z, a_s, a_z = SRCH.search_linear_default(
            x2, y2, p.w, p.b, w_bits=ss.w_bits, a_bits=ss.a_bits, n_V=ss.n_V,
            rounds=self.cfg.search_round, gram=self.cfg.w_search_gram,
            a_gram=getattr(self.cfg, "a_search_gram", False),
            **self._common())
        self._set_linear_state(name, ss, w_s, w_z, a_s, a_z)

    def _set_linear_state(self, name, ss, w_s, w_z, a_s, a_z):
        aq = QuantizerState(scale=a_s, zero_point=a_z, kind="uniform",
                            bits=ss.a_bits, symmetric=False)
        self.qstate[name] = self._linear_site(ss, w_s, w_z, aq)

    def _group_chunks(self, jobs, stacked_slice=slice(2, None)):
        """Split a same-shape job group so the stacked device arrays of one
        vmapped search stay under a fixed budget — at vit_large scale a
        24-site group's stacked captures plus sort/scoring scratch can crash
        the TPU worker (observed on-chip). Equal-size chunks reuse one
        compiled program; a smaller remainder chunk costs one extra compile.

        stacked_slice selects which job fields actually get stacked on device
        (reparam stage 1 only stacks x2; its y2 is budgeted later by the
        per-tensor group it joins).

        The 512 MB default is empirically derived: at vit_large shapes a
        20-site stacked group (~1 GB) reliably crashes the v5e worker while a
        10-site (~516 MB) group runs fine (scripts + ROUND2_NOTES). Chunks
        are balanced (sizes differ by at most 1) so most chunks share one
        compiled program instead of leaving a small remainder chunk.
        """
        budget = int(getattr(self.cfg, "batch_group_bytes", 1 << 29))

        def el_bytes(el):
            # arrays count directly; param dataclasses (LinearP etc.) count
            # their array leaves — the stacked ws/bs of a wide-weight group
            # (fc1/fc2 at vit_large+) are real device bytes too
            if hasattr(el, "shape"):
                return int(np.prod(el.shape)) * 4
            leaves = jax.tree_util.tree_leaves(el)
            return sum(int(np.prod(a.shape)) * 4
                       for a in leaves if hasattr(a, "shape"))

        per = sum(el_bytes(el) for el in jobs[0][stacked_slice])
        n = max(1, min(len(jobs), budget // max(per, 1)))
        k = -(-len(jobs) // n)                  # number of chunks
        bounds = np.linspace(0, len(jobs), k + 1).astype(int)
        return [jobs[a:b] for a, b in zip(bounds[:-1], bounds[1:])]

    def _flush_pending(self):
        """Run deferred searches, layer-batched per shape group (one vmapped
        XLA program per group; jobs of size 1 fall back). Reparam stage-1
        groups flush first — their LayerNorm folds enqueue the per-tensor
        re-search jobs that the next sweep of the loop flushes."""
        while self._pending:
            pending, self._pending = self._pending, {}
            for key in sorted(pending, key=lambda k: k[0] != "reparam"):
                if key[0] == "reparam":
                    for jobs in self._group_chunks(pending[key],
                                                   stacked_slice=slice(2, 3)):
                        self._flush_reparam_group(jobs)
                else:
                    for jobs in self._group_chunks(pending[key]):
                        self._flush_one_group(key, jobs)

    def _flush_reparam_group(self, jobs):
        """Batched stage 1 of the channel-wise Linear: one vmapped
        channel-wise self-search over all sites in the group, then the
        sequential LayerNorm folds (each touches only its own norm + linear,
        linear.py:596-621) and cached-input rewrites; the per-tensor
        re-searches join the regular pending groups."""
        t1 = time.time()
        ss = jobs[0][1]
        spill = isinstance(jobs[0][2], np.ndarray)
        xs = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
        a_ss, a_zs = SRCH.search_act_channelwise_batched(
            xs, a_bits=ss.a_bits, **self._common())
        folds = []
        for i, (name, ssi, x2, y2, p) in enumerate(jobs):
            norm = tree_get(self.params, ssi.norm_path)
            new_norm, new_lin, r, b, _, _ = layernorm_channel_reparam(
                norm, p, a_ss[i], a_zs[i])
            self.params = tree_set(self.params, ssi.norm_path, new_norm)
            self.params = tree_set(self.params, ssi.param_path, new_lin)
            x2r = rewrite_cached_input(x2, r, b)
            if self._capture_dtype is not None:
                # keep the stash in the capture dtype so the on-device tap
                # set stays half-size (the rewrite promoted it to fp32);
                # second bf16 rounding is part of the measured drift budget
                x2r = x2r.astype(self._capture_dtype)
            if spill:
                # same, for the host copy and the re-upload
                if self._spill_dtype is not None and \
                        self._capture_dtype is None:
                    x2r = x2r.astype(self._spill_dtype)
                x2r = np.asarray(x2r)
            key2 = ("linear", x2r.shape, new_lin.w.shape, ssi.w_bits,
                    ssi.a_bits, ssi.n_V)
            self._pending.setdefault(key2, []).append(
                (name, ssi, x2r, y2, new_lin))
            folds.append(("fold", name, {"norm": new_norm, "lin": new_lin,
                                         "r": r, "b": b}))
        self._resume_append(folds)
        log.info("reparamed %d x %-30s [batched] in %.2fs",
                 len(jobs), jobs[0][0], time.time() - t1)

    def _flush_one_group(self, key, jobs):
        t1 = time.time()
        ss = jobs[0][1]
        if key[0] in ("matmul", "matmul_post"):
            self._flush_matmul_group(key, jobs, t1)
            return
        if key[0] == "conv":
            self._flush_conv_group(jobs, t1)
            return
        if key[0] == "postgelu_twin":
            self._flush_twin_group(jobs, t1)
            return
        postgelu = key[0] == "postgelu"
        common = dict(w_bits=ss.w_bits, a_bits=ss.a_bits, n_V=ss.n_V,
                      rounds=self.cfg.search_round,
                      gram=self.cfg.w_search_gram, **self._common())
        shift = jnp.float32(GELU_MIN)
        if len(jobs) == 1:
            name, ss, x2, y2, p = jobs[0]
            x2, y2 = self._shard_tokens(x2), self._shard_tokens(y2)
            if postgelu:
                res = SRCH.search_linear_postgelu_adalog(
                    x2, y2, p.w, p.b, shift, **common)
                self._set_postgelu_state(name, ss, *res)
            else:
                res = SRCH.search_linear_default(
                    x2, y2, p.w, p.b,
                    a_gram=getattr(self.cfg, "a_search_gram", False),
                    **common)
                self._set_linear_state(name, ss, *res)
        else:
            # sites vmap over axis 0; the token axis (1) is dp-sharded
            xs = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
            ys = self._shard_tokens(jnp.stack([j[3] for j in jobs]), dim=1)
            ws = jnp.stack([j[4].w for j in jobs])
            bs = jnp.stack([j[4].b for j in jobs])
            if postgelu:
                w_s, w_z, a_s, q = \
                    SRCH.search_linear_postgelu_adalog_batched(
                        xs, ys, ws, bs, shift, **common)
                for i, (name, ssi, _, _, _) in enumerate(jobs):
                    self._set_postgelu_state(name, ssi, w_s[i], w_z[i],
                                             a_s[i], q[i])
            else:
                w_s, w_z, a_s, a_z = SRCH.search_linear_default_batched(
                    xs, ys, ws, bs,
                    a_gram=getattr(self.cfg, "a_search_gram", False),
                    **common)
                for i, (name, ssi, _, _, _) in enumerate(jobs):
                    self._set_linear_state(name, ssi, w_s[i], w_z[i],
                                           a_s[i], a_z[i])
        self._resume_append(self._site_records([j[0] for j in jobs]))
        log.info("searched %d x %-30s [batched] in %.2fs",
                 len(jobs), jobs[0][0], time.time() - t1)

    def _flush_conv_group(self, jobs, t1):
        if len(jobs) == 1:
            name, ss, x, y, p = jobs[0]
            self._search_conv_now(name, ss, x, y, p)
        else:
            ss = jobs[0][1]
            p0 = jobs[0][4]
            kh, kw = p0.w.shape[2], p0.w.shape[3]
            xs = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
            ys = self._shard_tokens(jnp.stack([j[3] for j in jobs]), dim=1)
            ws = jnp.stack([j[4].w for j in jobs])
            bs = jnp.stack([j[4].b for j in jobs])
            w_s, w_z = SRCH.search_conv_batched(
                xs, ys, ws, bs, w_bits=ss.w_bits,
                conv_dims=(kh, kw, p0.stride[0], p0.padding[0]),
                **self._common())
            for i, (name, ssi, _, _, _) in enumerate(jobs):
                self._set_conv_state(name, ssi, w_s[i], w_z[i])
        self._resume_append(self._site_records([j[0] for j in jobs]))
        log.info("searched %d x %-30s [batched] in %.2fs",
                 len(jobs), jobs[0][0], time.time() - t1)

    def _flush_twin_group(self, jobs, t1):
        ss = jobs[0][1]
        common = dict(w_bits=ss.w_bits, a_bits=ss.a_bits, n_V=ss.n_V,
                      rounds=self.cfg.search_round, **self._common())
        if len(jobs) == 1:
            name, ss, x2, y2, p = jobs[0]
            x2, y2 = self._shard_tokens(x2), self._shard_tokens(y2)
            w_s, w_z, s_pos, s_neg = SRCH.search_linear_postgelu_twin(
                x2, y2, p.w, p.b, **common)
            self._set_twin_state(name, ss, w_s, w_z, s_pos, s_neg)
        else:
            xs = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
            ys = self._shard_tokens(jnp.stack([j[3] for j in jobs]), dim=1)
            ws = jnp.stack([j[4].w for j in jobs])
            bs = jnp.stack([j[4].b for j in jobs])
            w_s, w_z, s_pos, s_neg = SRCH.search_linear_postgelu_twin_batched(
                xs, ys, ws, bs, **common)
            for i, (name, ssi, _, _, _) in enumerate(jobs):
                self._set_twin_state(name, ssi, w_s[i], w_z[i],
                                     s_pos[i], s_neg[i])
        self._resume_append(self._site_records([j[0] for j in jobs]))
        log.info("searched %d x %-30s [batched] in %.2fs",
                 len(jobs), jobs[0][0], time.time() - t1)

    def _set_twin_state(self, name, ss, w_s, w_z, s_pos, s_neg):
        aq = QuantizerState(scale=jnp.stack([s_pos, s_neg]),
                            kind="twin", bits=ss.a_bits)
        self.qstate[name] = self._linear_site(ss, w_s, w_z, aq)

    def _flush_matmul_group(self, key, jobs, t1):
        ss = jobs[0][1]
        hcw = self.cfg.matmul_head_channel_wise
        common = dict(A_bits=ss.s_bits, B_bits=ss.a_bits,
                      rounds=self.cfg.search_round, head_cw=hcw,
                      **self._common())
        if len(jobs) == 1:
            self._search_matmul_now(*jobs[0])
        elif key[0] == "matmul":
            As = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
            Bs = self._shard_tokens(jnp.stack([j[3] for j in jobs]), dim=1)
            ys = self._shard_tokens(jnp.stack([j[4] for j in jobs]), dim=1)
            A_s, A_z, B_s, B_z = SRCH.search_matmul_batched(
                As, Bs, ys, gram=getattr(self.cfg, "a_search_gram", False),
                **common)
            for i, (name, ssi, _, _, _) in enumerate(jobs):
                Aq = QuantizerState(scale=A_s[i], zero_point=A_z[i],
                                    kind="uniform", bits=ssi.s_bits,
                                    symmetric=False)
                self._set_matmul_state(name, ssi, Aq, B_s[i], B_z[i])
        else:
            As = self._shard_tokens(jnp.stack([j[2] for j in jobs]), dim=1)
            Bs = self._shard_tokens(jnp.stack([j[3] for j in jobs]), dim=1)
            ys = self._shard_tokens(jnp.stack([j[4] for j in jobs]), dim=1)
            q, B_s, B_z = SRCH.search_matmul_postsoftmax_batched(
                As, Bs, ys, a_kind=ss.post_quantizer, **common)
            for i, (name, ssi, _, _, _) in enumerate(jobs):
                self._set_matmul_state(name, ssi,
                                       self._postsoftmax_aq(ssi, q[i]),
                                       B_s[i], B_z[i])
        self._resume_append(self._site_records([j[0] for j in jobs]))
        log.info("searched %d x %-30s [batched] in %.2fs",
                 len(jobs), jobs[0][0], time.time() - t1)

    def _do_postgelu(self, name, ss: SiteSpec, x, y):
        p = tree_get(self.params, ss.param_path)
        x2, y2 = _flat2d(x), _flat2d(y)
        if ss.kind == "postgelu_twin":
            if getattr(self.cfg, "batch_sites", True) and p.b is not None:
                if isinstance(y, np.ndarray) and not isinstance(x2, np.ndarray):
                    x2 = np.asarray(x2)
                key = ("postgelu_twin", x2.shape, p.w.shape, ss.w_bits,
                       ss.a_bits, ss.n_V)
                self._pending.setdefault(key, []).append((name, ss, x2, y2, p))
                return
            x2, y2 = self._shard_tokens(x2), self._shard_tokens(y2)
            w_s, w_z, s_pos, s_neg = SRCH.search_linear_postgelu_twin(
                x2, y2, p.w, p.b, w_bits=ss.w_bits, a_bits=ss.a_bits,
                n_V=ss.n_V, rounds=self.cfg.search_round, **self._common())
            aq = QuantizerState(scale=jnp.stack([s_pos, s_neg]),
                                kind="twin", bits=ss.a_bits)
        else:
            if getattr(self.cfg, "batch_sites", True) and p.b is not None:
                if isinstance(y, np.ndarray) and not isinstance(x2, np.ndarray):
                    x2 = np.asarray(x2)
                key = ("postgelu", x2.shape, p.w.shape, ss.w_bits, ss.a_bits,
                       ss.n_V)
                self._pending.setdefault(key, []).append((name, ss, x2, y2, p))
                return
            x2, y2 = self._shard_tokens(x2), self._shard_tokens(y2)
            shift = jnp.float32(GELU_MIN)
            w_s, w_z, a_s, q = SRCH.search_linear_postgelu_adalog(
                x2, y2, p.w, p.b, shift, w_bits=ss.w_bits, a_bits=ss.a_bits,
                n_V=ss.n_V, rounds=self.cfg.search_round,
                gram=self.cfg.w_search_gram, **self._common())
            self._set_postgelu_state(name, ss, w_s, w_z, a_s, q)
            return
        self.qstate[name] = self._linear_site(ss, w_s, w_z, aq)

    def _set_postgelu_state(self, name, ss, w_s, w_z, a_s, q):
        kind = ss.post_quantizer  # adalog | log2 | logsqrt2 (linear.py:990-994)
        aq = QuantizerState(
            scale=a_s, shift=jnp.full((1,), GELU_MIN, jnp.float32),
            log_q=q if kind == "adalog" else None,
            bias_reparamed=jnp.zeros((), jnp.bool_),
            kind=kind, bits=ss.a_bits, shifted=True)
        self.qstate[name] = self._linear_site(ss, w_s, w_z, aq)

    def _do_matmul(self, name, ss: SiteSpec, A, B, y):
        if getattr(self.cfg, "batch_sites", True):
            key = (ss.kind, A.shape, B.shape, ss.s_bits, ss.a_bits,
                   ss.post_quantizer)
            self._pending.setdefault(key, []).append((name, ss, A, B, y))
            return
        self._search_matmul_now(name, ss, A, B, y)

    def _set_matmul_state(self, name, ss, Aq, B_s, B_z):
        Bq = QuantizerState(scale=B_s, zero_point=B_z, kind="uniform",
                            bits=ss.a_bits, symmetric=False)
        self.qstate[name] = MatMulSite(Aq=Aq, Bq=Bq)

    def _postsoftmax_aq(self, ss, q):
        return QuantizerState(
            scale=jnp.ones((1, 1, 1, 1), jnp.float32),
            log_q=q if ss.post_quantizer == "adalog" else None,
            kind=ss.post_quantizer, bits=ss.s_bits)

    def _search_matmul_now(self, name, ss, A, B, y):
        A, B, y = (self._shard_tokens(A), self._shard_tokens(B),
                   self._shard_tokens(y))
        hcw = self.cfg.matmul_head_channel_wise
        if ss.kind == "matmul":
            A_s, A_z, B_s, B_z = SRCH.search_matmul(
                A, B, y, A_bits=ss.s_bits, B_bits=ss.a_bits,
                rounds=self.cfg.search_round, head_cw=hcw,
                gram=getattr(self.cfg, "a_search_gram", False),
                **self._common())
            Aq = QuantizerState(scale=A_s, zero_point=A_z, kind="uniform",
                                bits=ss.s_bits, symmetric=False)
        else:
            q, B_s, B_z = SRCH.search_matmul_postsoftmax(
                A, B, y, A_bits=ss.s_bits, B_bits=ss.a_bits,
                rounds=self.cfg.search_round, head_cw=hcw,
                a_kind=ss.post_quantizer, **self._common())
            Aq = QuantizerState(
                scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                log_q=q if ss.post_quantizer == "adalog" else None,
                kind=ss.post_quantizer, bits=ss.s_bits)
        Bq = QuantizerState(scale=B_s, zero_point=B_z, kind="uniform",
                            bits=ss.a_bits, symmetric=False)
        self.qstate[name] = MatMulSite(Aq=Aq, Bq=Bq)

    # -- driver --------------------------------------------------------------

    def _run_sites(self, names, taps):
        """Dispatch each site's search (or deferral) from its captured tap,
        freeing taps eagerly; then flush the deferred groups."""
        for name in names:
            if name in self.qstate:      # resumed
                taps.pop(name, None)
                continue
            ss = self.layout[name]
            t1 = time.time()
            tap = taps[name]
            if ss.kind == "conv":
                self._do_conv(name, ss, *tap)
            elif ss.kind in ("matmul", "matmul_post"):
                self._do_matmul(name, ss, *tap)
            elif ss.kind in ("linear", "linear_reparam"):
                self._do_linear(name, ss, *tap)
            else:
                self._do_postgelu(name, ss, *tap)
            # free this site's captures eagerly (device memory)
            taps[name] = None
            if name in self.qstate:      # deferred sites append at flush
                self._resume_append(self._site_records([name]))
            log.info("calibrated %-38s [%s] in %.2fs", name, ss.kind,
                     time.time() - t1)
        self._flush_pending()

    def _tap_bytes(self, batches, names):
        """Per-site capture footprint (all batches), via shape-only tracing."""
        fwd = model_forward_fn(self.spec)
        shapes = jax.eval_shape(
            lambda p, x: fwd(self.spec.cfg, p, x, capture=True)[1],
            self.params,
            jax.ShapeDtypeStruct(batches[0].shape, jnp.float32))
        item = 2 if self._capture_dtype == jnp.bfloat16 else 4
        return {nm: sum(int(np.prod(s.shape)) * item for s in shapes[nm])
                * len(batches) for nm in names}

    def _streaming_waves(self, batches, need):
        """Partition sites into capture waves under the device budget, or
        return None when streaming is off / unnecessary (cfg.streaming_calib:
        'auto' streams only when one-pass capture would spill)."""
        mode = str(getattr(self.cfg, "streaming_calib", "auto")).lower()
        budget = self.cfg.capture_device_budget_bytes
        if mode in ("off", "false") or budget is None:
            return None
        site_bytes = self._tap_bytes(batches, need)
        total = sum(site_bytes.values())
        if mode == "auto" and total <= budget:
            return None              # one-pass capture stays on device anyway
        waves, cur, cur_b = [], [], 0
        for nm in need:              # layout order
            if cur and cur_b + site_bytes[nm] > budget:
                waves.append(cur)
                cur, cur_b = [], 0
            cur.append(nm)
            cur_b += site_bytes[nm]
        if cur:
            waves.append(cur)
        if len(waves) > 1 or mode in ("on", "true"):
            log.info("streaming calibration: %.1f GB of taps in %d waves "
                     "(budget %.1f GB, zero host spill)",
                     total / 2**30, len(waves), budget / 2**30)
            return waves
        return None

    def calibrate(self, batches: List[np.ndarray]):
        """Full calibration: capture, then search every site.

        Returns (params, qstate) — params possibly reparameterized.

        Two capture strategies (identical numerics up to fusion order):
        one-pass capture of every site (spilling to host over the budget),
        or streaming waves — capture a budget-sized slice of sites
        on-device, search it, free, re-run the raw forward for the next
        slice (cfg.streaming_calib). Raw taps are invariant under the
        already-applied reparam folds, so per-wave recapture is exact.
        """
        t0 = time.time()
        recs = self._resume_scan()
        done = {name for tag, name, _ in recs if tag == "site"}
        need = [nm for nm in self.layout if nm not in done]

        waves = self._streaming_waves(batches, need)
        if waves is not None:
            # streaming: apply resume records FIRST — waves capture from the
            # folded params, so restored-fold sites' taps come out already
            # rewritten (the folded norm outputs x/r - b directly)
            self._resume_apply(recs)
            self._taps_post_fold = set(self._folded)
            for i, wave in enumerate(waves):
                t1 = time.time()
                # spill_dtype only matters for the escape hatch of a single
                # site whose tap alone exceeds the budget (its wave spills)
                taps = capture_all_sites(
                    self.spec, self.params, batches,
                    self.cfg.capture_device_budget_bytes, names=tuple(wave),
                    spill_dtype=self._spill_dtype,
                    capture_dtype=self._capture_dtype, mesh=self.mesh)
                log.info("wave %d/%d: captured %d sites in %.1fs",
                         i + 1, len(waves), len(taps), time.time() - t1)
                self._run_sites(wave, taps)
            return self.params, self.qstate

        # one-pass: capture BEFORE applying resume records, from the
        # ORIGINAL params: bitwise-identical taps to an uninterrupted run's
        # capture (reparam folds preserve the composite function, and folded
        # sites' cached inputs are rewritten from the stored (r, b)).
        # Already-searched sites are excluded from capture entirely.
        taps = capture_all_sites(self.spec, self.params, batches,
                                 self.cfg.capture_device_budget_bytes,
                                 names=None if not recs else need,
                                 spill_dtype=self._spill_dtype,
                                 capture_dtype=self._capture_dtype,
                                 mesh=self.mesh)
        log.info("capture: %d sites in %.1fs", len(taps), time.time() - t0)
        self._resume_apply(recs)
        self._run_sites(list(self.layout), taps)
        return self.params, self.qstate

    def finish_calibration(self):
        """Post-GeLU bias fold for every shifted-log fc2 site
        (test_quant.py:130-133 finish_training)."""
        for name, ss in self.layout.items():
            site = self.qstate.get(name)
            if site is None or ss.kind != "postgelu" or \
                    not getattr(site.aq, "shifted", False):
                continue
            if bool(site.aq.bias_reparamed):
                continue
            p = tree_get(self.params, ss.param_path)
            new_lin = fold_gelu_shift_into_bias(p, site, shift=GELU_MIN)
            self.params = tree_set(self.params, ss.param_path, new_lin)
            self.qstate[name] = site.replace(
                aq=site.aq.replace(bias_reparamed=jnp.ones((), jnp.bool_)))
        return self.params, self.qstate
