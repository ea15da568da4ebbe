"""BRECQ block-reconstruction tests on a tiny block (CPU-sized)."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.calib.layout import quant_layout, tree_get
from adalog_tpu.recon.brecq import BlockReconstructor, capture_block_io, \
    _b_temperature, _rec_loss
from adalog_tpu.recon.blocks import block_units

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def _setup():
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32, steps=2,
                 search_round=1, recon_iters=40, optim_batch_size=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    layout = quant_layout(TinySpec, cfg, reparam=False)
    return cfg, params, qstate, layout


def test_temperature_schedule():
    assert float(_b_temperature(jnp.float32(0.0), 100)) == 20.0
    assert float(_b_temperature(jnp.float32(19.0), 100)) == 20.0
    assert abs(float(_b_temperature(jnp.float32(100.0), 100)) - 2.0) < 1e-5
    mid = float(_b_temperature(jnp.float32(60.0), 100))
    assert 2.0 < mid < 20.0


def test_rec_loss_forms(rng):
    p = jnp.asarray(rng.standard_normal((4, 6, 8)).astype(np.float32))
    t = p + 0.1
    mse = float(_rec_loss(p, t, "mse"))
    # sum over dim1 of 0.01, mean, /10
    assert abs(mse - 0.01 * 6 / 10) < 1e-5
    logits = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    assert float(_rec_loss(logits, logits, "kl")) < 1e-6
    assert float(_rec_loss(logits, logits + 1.0, "kl")) < 1e-6  # shift-invariant
    assert float(_rec_loss(logits, -logits, "kl")) > 0.0


def test_capture_block_io_chains(rng):
    _, params, _, _ = _setup()
    batches = [rng.standard_normal((4, 16, 16, 3)).astype(np.float32)]
    io = capture_block_io(TinySpec, params, batches)
    assert set(io) == {"patch_embed", "blocks.0", "blocks.1", "head"}
    # block chaining: blocks.0 out == blocks.1 in
    np.testing.assert_array_equal(io["blocks.0"][1], io["blocks.1"][0])
    assert io["head"][1].shape == (4, 10)


def test_block_reconstruction_reduces_error(rng):
    cfg, params, qstate, layout = _setup()
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    recon = BlockReconstructor(TinySpec, params, params, qstate, layout, cfg)
    io = capture_block_io(TinySpec, params, batches)
    unit = block_units(TinySpec)[1]          # blocks.0
    raw_in, raw_out = io[unit.name]

    tr, rec_first, rec_last = recon._train_block(
        unit, raw_in, raw_out, quant_act=True, rec_kind="mse")
    assert np.isfinite(rec_first) and np.isfinite(rec_last)
    assert rec_last <= rec_first * 1.5       # training does not diverge

    # freeze: hard weights written back, alphas dropped, act scales updated
    w_before = np.asarray(tree_get(recon.params,
                                   layout["blocks.0.attn.qkv"].param_path).w)
    recon._freeze_block(unit, tr, quant_act=True)
    w_after = np.asarray(tree_get(recon.params,
                                  layout["blocks.0.attn.qkv"].param_path).w)
    assert not np.array_equal(w_before, w_after)
    site = recon.qstate["blocks.0.attn.qkv"]
    assert site.wq.alpha is None
    # hard weights sit on the scale grid: w/scale integral
    scale = np.asarray(site.wq.scale)
    ratio = (w_after.reshape(3, -1, w_after.shape[-1]) / scale)
    np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-3)


def test_reconstructed_model_still_runs(rng):
    cfg, params, qstate, layout = _setup()
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    recon = BlockReconstructor(TinySpec, params, params, qstate, layout, cfg)
    new_params, new_qstate = recon.reconstruct(batches, quant_act=True)
    x = jnp.asarray(batches[0])
    out = vit_forward(CFG, new_params, x, new_qstate, {"*": "quant"})
    assert np.isfinite(np.asarray(out)).all()


def test_grouped_block_training_equals_sequential(rng):
    """vmapped block-group training == sequential per-block training."""
    from adalog_tpu.models.vit import vit_forward
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    results = {}
    for group in (1, 4):
        cfg, params, qstate, layout = _setup()
        cfg.recon_block_group = group
        recon = BlockReconstructor(TinySpec, params, params, qstate, layout,
                                   cfg)
        p, q = recon.reconstruct(batches, quant_act=True)
        results[group] = (p, q)

    p1, q1 = results[1]
    p4, q4 = results[4]
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    x = jnp.asarray(batches[0])
    y1 = np.asarray(vit_forward(CFG, p1, x, q1, {"*": "quant"}))
    y4 = np.asarray(vit_forward(CFG, p4, x, q4, {"*": "quant"}))
    np.testing.assert_allclose(y4, y1, rtol=1e-5, atol=1e-5)


def test_segmented_training_equals_monolithic(rng):
    """recon_seg_iters chunks the training scan into bounded device
    executions (multi-minute monolithic scans crash the tunneled TPU worker);
    the carry hand-off must reproduce the monolithic run exactly — same PRNG
    stream, temperature offsets and optimizer state."""
    from adalog_tpu.models.vit import vit_forward
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    results = {}
    for seg in (1000, 7):      # one segment vs 40 iters in 6 segments
        cfg, params, qstate, layout = _setup()
        cfg.recon_seg_iters = seg
        recon = BlockReconstructor(TinySpec, params, params, qstate, layout,
                                   cfg)
        p, q = recon.reconstruct(batches, quant_act=True)
        results[seg] = (p, q)

    (p0, q0), (p1, q1) = results[1000], results[7]
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    x = jnp.asarray(batches[0])
    y0 = np.asarray(vit_forward(CFG, p0, x, q0, {"*": "quant"}))
    y1 = np.asarray(vit_forward(CFG, p1, x, q1, {"*": "quant"}))
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)


def test_recon_resume_round_trip(rng, tmp_path):
    """A killed reconstruction resumes at the last completed block: applying
    a partial resume log and retraining the rest reproduces the full run."""
    from adalog_tpu.utils.resume import resume_scan, resume_append

    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    f_full = str(tmp_path / "full.resume")
    cfg, params, qstate, layout = _setup()
    recon = BlockReconstructor(TinySpec, params, params, qstate, layout, cfg,
                               resume_path=f_full)
    p_full, q_full = recon.reconstruct(batches, quant_act=True)

    recs = resume_scan(f_full)
    assert [t for t, _, _ in recs].count("recon") == len(recs) == 4

    # simulate a run killed after the first TWO blocks finished
    f_part = str(tmp_path / "part.resume")
    resume_append(f_part, recs[:2])
    cfg2, params2, qstate2, layout2 = _setup()
    recon2 = BlockReconstructor(TinySpec, params2, params2, qstate2, layout2,
                                cfg2, resume_path=f_part)
    p_res, q_res = recon2.reconstruct(batches, quant_act=True)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    x = jnp.asarray(batches[0])
    y0 = np.asarray(vit_forward(CFG, p_full, x, q_full, {"*": "quant"}))
    y1 = np.asarray(vit_forward(CFG, p_res, x, q_res, {"*": "quant"}))
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)

    # a complete log short-circuits reconstruction entirely
    cfg3, params3, qstate3, layout3 = _setup()
    recon3 = BlockReconstructor(TinySpec, params3, params3, qstate3, layout3,
                                cfg3, resume_path=f_full)
    p_all, q_all = recon3.reconstruct(batches, quant_act=True)
    y2 = np.asarray(vit_forward(CFG, p_all, x, q_all, {"*": "quant"}))
    np.testing.assert_allclose(y2, y0, rtol=1e-6, atol=1e-6)


def test_recon_group_budget_derates(rng):
    """recon_group_bytes derates the vmapped group to sequential when one
    block's stacked I/O exceeds the budget — results identical either way."""
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]

    results = {}
    for budget in (1 << 29, 1):        # unrestricted vs force-sequential
        cfg, params, qstate, layout = _setup()
        cfg.recon_block_group = 4
        cfg.recon_group_bytes = budget
        recon = BlockReconstructor(TinySpec, params, params, qstate, layout,
                                   cfg)
        results[budget] = recon.reconstruct(batches, quant_act=True)

    (p0, q0), (p1, q1) = results[1 << 29], results[1]
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
