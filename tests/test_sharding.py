"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.parallel.mesh import make_mesh, dp, replicate, shard_batch
from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.calib import search as SRCH

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_eval_matches_single_device(rng):
    mesh = make_mesh(8)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((16, 16, 16, 3)).astype(np.float32))

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    params_r = replicate(params, mesh)
    x_sh = shard_batch(x, mesh)

    @jax.jit
    def f(xx):
        return vit_forward(CFG, params_r, xx, qstate, {"*": "quant"})

    y_dp = np.asarray(f(x_sh))
    np.testing.assert_allclose(y_dp, y_single, rtol=2e-5, atol=2e-5)


def test_tp_eval_matches_single_device(rng):
    """2D dp×tp mesh quantized eval: Megatron-pattern placement (qkv/fc1
    column-parallel, proj/fc2 row-parallel) + dp-sharded batch; GSPMD
    inserts the all-reduces. Output must equal the single-device path."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_params_tp, \
        shard_batch
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(2, 4)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    params_tp = shard_params_tp(params, mesh)
    # the placement table really sharded the big weights...
    blk = params_tp.blocks[0]
    assert blk.mlp.fc1.w.sharding.spec == P("tp", None)
    assert blk.mlp.fc2.w.sharding.spec == P(None, "tp")
    assert blk.attn.qkv.w.sharding.spec == P("tp", None)
    assert blk.attn.proj.w.sharding.spec == P(None, "tp")
    # ...replicated the rest, and guarded non-divisible dims (10-class head)
    assert blk.norm1.g.sharding.spec == P()
    assert params_tp.head.w.sharding.spec == P()

    @jax.jit
    def f(xx):
        return vit_forward(CFG, params_tp, xx, qstate, {"*": "quant"})

    y_tp = np.asarray(f(shard_batch(x, mesh)))
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)


def test_tp_swin_eval_matches_single_device(rng):
    """Swin quantized forward on the 2×4 dp×tp mesh: GSPMD must propagate
    the tp weight shardings through window partition/merge reshapes and the
    shifted-window rolls without changing the result."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_params_tp, \
        shard_batch
    from adalog_tpu.models.zoo import build_model, model_forward_fn
    from adalog_tpu.calib.init_state import init_qstate

    mesh = make_mesh_2d(2, 4)
    spec, params = build_model("test_tiny_swin", seed=0)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    qstate = init_qstate(spec, cfg, params)
    fwd = model_forward_fn(spec)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))

    y_single = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))

    params_tp = shard_params_tp(params, mesh)

    @jax.jit
    def f(xx):
        return fwd(spec.cfg, params_tp, xx, qstate, {"*": "quant"})

    y_tp = np.asarray(f(shard_batch(x, mesh)))
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)


def test_tp_placement_rules_swin():
    """The suffix rules are family-agnostic: Swin qkv/proj/fc1/fc2 weights
    shard, norms/rel-pos tables replicate, and the (large-class) head
    column-shards."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, tp_shardings
    from adalog_tpu.models.zoo import build_model
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(2, 4)
    spec, params = build_model("test_tiny_swin", seed=0)
    sh = tp_shardings(params, mesh)
    flat = {jax.tree_util.keystr(p): s
            for p, s in jax.tree_util.tree_leaves_with_path(sh)}
    qkv = [k for k in flat if k.endswith(".qkv.w")]
    fc2 = [k for k in flat if k.endswith(".fc2.w")]
    assert qkv and fc2
    assert all(flat[k].spec == P("tp", None) for k in qkv)
    assert all(flat[k].spec == P(None, "tp") for k in fc2)
    norms = [k for k in flat if ".norm1.g" in k]
    assert norms and all(flat[k].spec == P() for k in norms)


def test_dp_shard_map_flash_eval_matches_single_device(rng, monkeypatch):
    """dp_shard_map eval with the fused attention kernels (interpret mode):
    each virtual device runs the full quantized forward — flash kernel
    included — on its local batch shard, with no GSPMD all-gathers around
    the opaque pallas_call. Output must equal the single-device XLA path."""
    from adalog_tpu.parallel.mesh import dp_shard_map
    from adalog_tpu.ops import fq_attn

    mesh = make_mesh(8)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    # realistic act-quantizer params so the kernels do real work
    for nm, site in list(qstate.items()):
        if hasattr(site, "aq") and site.aq.kind == "uniform" and \
                site.aq.zero_point is not None:
            qstate[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full_like(site.aq.scale, 0.05),
                zero_point=jnp.full_like(site.aq.zero_point, 8.0)))
    x = jnp.asarray(rng.standard_normal((16, 16, 16, 3)).astype(np.float32))

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    def local(pp, lqs, xx):
        return vit_forward(CFG, pp, xx, lqs, {"*": "quant"})

    sm = jax.jit(dp_shard_map(local, mesh, n_replicated=2))

    fq_attn.INTERPRET = True
    monkeypatch.setattr(fq_attn, "enabled", lambda: True)
    calls = []
    real = fq_attn.run_flash
    monkeypatch.setattr(fq_attn, "run_flash",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    try:
        y_sm = np.asarray(sm(params, qstate, shard_batch(x, mesh)))
    finally:
        fq_attn.INTERPRET = False

    assert calls, "flash kernel was not dispatched under shard_map"
    np.testing.assert_allclose(y_sm, y_single, rtol=2e-4, atol=2e-4)


def test_token_sharded_search_matches_single_device(rng):
    """search_linear_default with the token axis dp-sharded returns the same
    searched parameters (psum reductions are order-stable enough here)."""
    mesh = make_mesh(8)
    T, I, O = 64, 16, 24
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)

    kw = dict(w_bits=4, a_bits=4, n_V=1, eq_n=32, steps=2, rounds=1,
              use_fpcs=True)
    r_single = SRCH.search_linear_default(x, y, w, b, **kw)

    x_sh = jax.device_put(x, dp(mesh, 2))
    y_sh = jax.device_put(y, dp(mesh, 2))
    r_sh = SRCH.search_linear_default(x_sh, y_sh, w, b, **kw)
    for a, bb in zip(r_single, r_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


def test_dp_capture_matches_single_device(rng):
    """capture_all_sites with a mesh dp-shards each batch over the devices;
    taps must equal the single-device capture (and a full mesh calibration —
    dp capture composing with token-sharded searches — must match too)."""
    from adalog_tpu.calib.calibrator import capture_all_sites, QuantCalibrator

    mesh = make_mesh(8)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)

    single = capture_all_sites(TinySpec, params, [b])
    sharded = capture_all_sites(TinySpec, params, [b], mesh=mesh)
    for nm in single:
        for a, c in zip(single[nm], sharded[nm]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-5, atol=2e-5)

    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                 steps=2, search_round=1)
    qs = {}
    for m in (None, mesh):
        calib = QuantCalibrator(TinySpec, params, cfg, mesh=m)
        calib.calibrate([b])
        _, qs[m is None] = calib.finish_calibration()
    x = np.asarray(b)
    p = params
    y0 = np.asarray(vit_forward(CFG, p, x, qs[True], {"*": "quant"}))
    y1 = np.asarray(vit_forward(CFG, p, x, qs[False], {"*": "quant"}))
    yr = np.asarray(vit_forward(CFG, p, x))
    # selections may flip on fp32 psum-order near-ties; quality must match
    assert np.linalg.norm(y1 - yr) <= np.linalg.norm(y0 - yr) * 1.05


def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_traces():
    """entry() returns a jittable fn; abstract-evaluate it (no compile)."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 1000)


# ---------------------------------------------------------------------------
# Tensor-parallel shard_map eval (parallel/tp.py): Megatron placement with
# the fused Pallas attention kernels kept active
# ---------------------------------------------------------------------------

def _quant_qstate(spec, params, seed=0):
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    qstate = init_qstate(spec, cfg, params)
    # realistic act-quantizer params so quantization does real work
    for nm, site in list(qstate.items()):
        if hasattr(site, "aq") and site.aq.kind == "uniform" and \
                site.aq.zero_point is not None:
            qstate[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full_like(site.aq.scale, 0.05),
                zero_point=jnp.full_like(site.aq.zero_point, 8.0)))
    return qstate


def test_tp_shard_map_vit_matches_single_device(rng):
    """shard_map dp×tp eval: qkv chunk-interleaved column-parallel, proj/fc2
    row-parallel with in-forward psum, per-head matmul quantizer scales
    sharded. Must equal the single-device quantized forward."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_batch
    from adalog_tpu.parallel.tp import tp_eval_fn, make_tp_plan
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(4, 2)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = _quant_qstate(TinySpec, params)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    plan = make_tp_plan(TinySpec, qstate, 2)
    assert plan.col_sites.get("blocks.0.attn.qkv") == 3
    assert "blocks.0.attn.proj" in plan.row_sites
    assert "blocks.0.mlp.fc2" in plan.row_sites
    assert "blocks.0.attn" in plan.attn_sharded
    # per-head matmul scales shard on the head axis
    qsp = plan.qstate_specs(qstate)
    m1 = qstate["blocks.0.attn.matmul1"]
    if m1.Aq.scale.ndim == 4:
        assert qsp["blocks.0.attn.matmul1"].Aq.scale == \
            P(None, "tp", None, None)

    run, plan2 = tp_eval_fn(TinySpec, vit_forward, params, qstate, mesh)
    y_tp = np.asarray(run(shard_batch(x, mesh)))
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)


def test_tp_shard_map_flash_kernels_active(rng, monkeypatch):
    """The whole point of the shard_map tp path: the fused flash attention
    kernel dispatches per-device on the LOCAL heads and the result matches
    the single-device XLA chain."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_batch
    from adalog_tpu.parallel.tp import tp_eval_fn
    from adalog_tpu.ops import fq_attn

    mesh = make_mesh_2d(2, 2)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = _quant_qstate(TinySpec, params)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))

    fq_attn.INTERPRET = True
    monkeypatch.setattr(fq_attn, "enabled", lambda: True)
    calls = []
    real = fq_attn.run_flash

    def spy(m1, m2, q, kT, v, **kw):
        calls.append(q.shape)
        return real(m1, m2, q, kT, v, **kw)

    monkeypatch.setattr(fq_attn, "run_flash", spy)
    try:
        run, _ = tp_eval_fn(TinySpec, vit_forward, params, qstate, mesh)
        y_tp = np.asarray(run(shard_batch(x, mesh)))
    finally:
        fq_attn.INTERPRET = False

    assert calls, "flash kernel was not dispatched under shard_map tp"
    # traced on the LOCAL head count (2 heads / tp=2 -> 1 head per device)
    assert all(s[1] == CFG.heads // 2 for s in calls)
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)


def test_tp_shard_map_fallback_nondivisible_heads(rng):
    """tp=4 does not divide heads=2: attention falls back to replicated
    compute while the MLP (hidden 128 % 4 == 0) still shards. Output must
    be unchanged."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_batch
    from adalog_tpu.parallel.tp import tp_eval_fn, make_tp_plan

    mesh = make_mesh_2d(2, 4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = _quant_qstate(TinySpec, params)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))

    plan = make_tp_plan(TinySpec, qstate, 4)
    assert not plan.attn_sharded
    assert "blocks.0.attn.proj" not in plan.row_sites
    assert plan.col_sites.get("blocks.0.mlp.fc1") == 1
    assert "blocks.0.mlp.fc2" in plan.row_sites

    y_single = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    run, _ = tp_eval_fn(TinySpec, vit_forward, params, qstate, mesh)
    y_tp = np.asarray(run(shard_batch(x, mesh)))
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)


def test_tp_shard_map_swin_matches_single_device(rng):
    """Swin under shard_map tp=2: both stages shard (heads 2 and 4), the
    pre-gathered rel-pos bias shards on its head axis, shifted-window masks
    fold per local head. Must equal the single-device path."""
    from adalog_tpu.parallel.mesh import make_mesh_2d, shard_batch
    from adalog_tpu.parallel.tp import tp_eval_fn, make_tp_plan
    from adalog_tpu.models.zoo import build_model, model_forward_fn
    from adalog_tpu.calib.init_state import init_qstate as init_qs
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(4, 2)
    spec, params = build_model("test_tiny_swin", seed=0)
    qstate = _quant_qstate(spec, params)
    fwd = model_forward_fn(spec)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))

    y_single = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))

    plan = make_tp_plan(spec, qstate, 2)
    assert "layers.0.blocks.0.attn" in plan.attn_sharded
    assert "layers.1.blocks.1.attn" in plan.attn_sharded
    psp = plan.params_specs(plan.permute_params(params))
    flat = {jax.tree_util.keystr(p).replace("[", ".").replace("]", ""): s
            for p, s in jax.tree_util.tree_leaves_with_path(psp)}
    assert flat[".stages.0.blocks.0.attn.rel_pos_bias"] == \
        P(None, "tp", None, None)
    assert flat[".stages.1.blocks.0.attn.qkv.w"] == P("tp", None)
    assert flat[".stages.1.blocks.0.fc2.w"] == P(None, "tp")
    assert flat[".head.w"] == P()

    run, _ = tp_eval_fn(spec, fwd, params, qstate, mesh)
    y_tp = np.asarray(run(shard_batch(x, mesh)))
    np.testing.assert_allclose(y_tp, y_single, rtol=2e-4, atol=2e-4)
