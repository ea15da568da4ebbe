#!/usr/bin/env python
"""Site-level localization of the midscale BRECQ fork.

Facts so far (/tmp/r5_brecq_probe.log, /tmp/r5_fork_probe.log): our calibrate
state carries ~1.5x block rec error at blocks 5/6/8 (and 11) BEFORE any
reconstruction, AdaLog bases match the reference exactly at those blocks, and
BRECQ then improves every block by a similar relative amount — so the fork is
some OTHER per-site quantizer state chosen during calibrate. This probe runs
BOTH calibrates (reference torch on CPU, ours on CPU jax) at the fixture
config and measures, per block and per site, the one-hot quantized block MSE
(everything raw except one site) on pristine-model I/O — the culprit site is
the one whose ours/ref MSE ratio is elevated exactly at the stuck blocks. Per
-site quantizer params are dumped alongside for the follow-up diff.

Output: /tmp/midscale_site_fork.npz + MIDSCALE_SITE_FORK json line.
Runtime: ~40 min CPU (ref ~25 min + ours ~13 min).
"""

import copy
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import midscale_differential as md  # noqa: E402

OUT = "/tmp/midscale_site_fork.npz"


def _qparams(mod):
    """Flatten one reference quant module's quantizer params to lists."""
    out = {}
    for qn in ("a_quantizer", "w_quantizer", "A_quantizer", "B_quantizer"):
        q = getattr(mod, qn, None)
        if q is None:
            continue
        for fn in ("scale", "zero_point", "shift", "q"):
            v = getattr(q, fn, None)
            if v is None:
                continue
            try:
                out[f"{qn}.{fn}"] = np.asarray(
                    v.detach().double().numpy()).ravel().tolist()
            except Exception:
                out[f"{qn}.{fn}"] = [float(v)]
    return out


def run_ref_side():
    from ref_bridge import cuda_stubs, load_reference_full
    ref = load_reference_full()
    import utils.block_recon as ref_br

    seed_model, seed_data = md.SEEDS[0]
    tm = md.make_model(seed_model)
    calib_np, _ = md.make_data(seed_data)

    t0 = time.time()
    mse_all, mse_site, params = {}, {}, {}
    with cuda_stubs() as torch:
        full_model = copy.deepcopy(tm)
        ref.wrap_net.wrap_modules_in_net(tm, md.ref_cfg(), reparam=True)
        loader = [(torch.tensor(calib_np.transpose(0, 3, 1, 2)),
                   torch.zeros(md.CALIB_N))]
        print(f"[{time.time()-t0:.0f}s] ref calibrating...", flush=True)
        ref.calibrator.QuantCalibrator(tm, loader).batching_quant_calib()
        tm = ref.wrap_net.wrap_reparamed_modules_in_net(tm)
        tm.eval()

        recon = ref_br.BlockReconstructor(tm, full_model, loader)
        device = torch.device("cpu")
        for m in tm.modules():
            if hasattr(m, "mode"):
                m.mode = "raw"
        for bname, blk in recon.blocks.items():
            recon.init_block_raw_data(blk, recon.full_blocks[bname], bname,
                                      device)
            rin, rout = blk.raw_input, blk.raw_out
            qmods = [(sn, m) for sn, m in blk.named_modules()
                     if hasattr(m, "mode")]

            def _mse():
                with torch.no_grad():
                    return float(((blk(rin) - rout) ** 2).mean())

            recon.set_block_mode(blk, "quant_forward")
            mse_all[bname] = _mse()
            recon.set_block_mode(blk, "raw")
            for sn, m in qmods:
                key = f"{bname}.{sn}" if sn else bname
                m.mode = "quant_forward"
                mse_site[key] = _mse()
                m.mode = "raw"
                params[key] = _qparams(m)
            blk.raw_input = blk.raw_out = None
            print(f"[{time.time()-t0:.0f}s] ref {bname}: "
                  f"all={mse_all[bname]:.6f}", flush=True)
    return mse_all, mse_site, params


def run_our_side():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from adalog_tpu.models.vit import ViTConfig
    from adalog_tpu.models.load import load_vit
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.recon.brecq import capture_block_io
    from adalog_tpu.recon.blocks import block_units

    seed_model, seed_data = md.SEEDS[0]
    tm = md.make_model(seed_model)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    calib_np, _ = md.make_data(seed_data)

    cfg_j = ViTConfig(img_size=md.IMG, patch_size=md.PATCH, dim=md.DIM,
                      depth=md.DEPTH, heads=md.HEADS, num_classes=md.CLASSES)

    class Spec:
        family = "vit"
        cfg = cfg_j

    params = load_vit(cfg_j, sd)
    params_full = jax.tree_util.tree_map(lambda a: a, params)
    cfg = Config(w_bit=md.BITS, a_bit=md.BITS, s_bit=md.BITS,
                 qhead_a_bit=md.BITS, eq_n=md.EQ_N, search_round=md.ROUNDS,
                 steps=md.STEPS)
    t0 = time.time()
    print("ours calibrating...", flush=True)
    calib = QuantCalibrator(Spec, params, cfg)
    params_q, qstate = calib.calibrate([calib_np])

    io = capture_block_io(Spec, params_full, [calib_np])
    mse_all, mse_site, qparams = {}, {}, {}
    for u in block_units(Spec):
        rin, rout = io[u.name]
        rin = jnp.asarray(rin)
        qsb = {cn: qstate[nm] for nm, cn in u.canon.items() if nm in qstate}

        def _mse(modes):
            pred = np.asarray(u.forward(u.extract(params_q), qsb, rin,
                                        modes, False, False))
            return float(((pred - rout) ** 2).mean())

        mse_all[u.name] = _mse({cn: "quant" for cn in qsb})
        for nm, cn in u.canon.items():
            if nm not in qstate:
                continue
            modes = {c: "raw" for c in qsb}
            modes[cn] = "quant"
            mse_site[nm] = _mse(modes)
            st = qstate[nm]
            p = {}
            for qn in ("aq", "Aq", "Bq", "wq"):
                q = getattr(st, qn, None)
                if q is None:
                    continue
                for fn in ("scale", "zero_point", "shift", "log_q"):
                    v = getattr(q, fn, None)
                    if v is not None:
                        p[f"{qn}.{fn}"] = np.asarray(v, np.float64) \
                            .ravel().tolist()
            qparams[nm] = p
        print(f"[{time.time()-t0:.0f}s] ours {u.name}: "
              f"all={mse_all[u.name]:.6f}", flush=True)
    return mse_all, mse_site, qparams


def main():
    ref_all, ref_site, ref_params = run_ref_side()
    our_all, our_site, our_params = run_our_side()
    np.savez_compressed(
        OUT,
        ref_all=json.dumps(ref_all), ref_site=json.dumps(ref_site),
        ref_params=json.dumps(ref_params),
        our_all=json.dumps(our_all), our_site=json.dumps(our_site),
        our_params=json.dumps(our_params))

    # align key spaces: ref head key is "head", ours too; block sites match
    rows = []
    for k in sorted(ref_site):
        if k in our_site and ref_site[k] > 0:
            rows.append((k, our_site[k] / ref_site[k], our_site[k],
                         ref_site[k]))
    rows.sort(key=lambda r: -r[1])
    print("MIDSCALE_SITE_FORK " + json.dumps(dict(
        block_all_ratio={k: round(our_all[k] / ref_all[k], 3)
                         for k in sorted(ref_all) if k in our_all},
        worst_sites=[(k, round(r, 3), round(o, 6), round(f, 6))
                     for k, r, o, f in rows[:20]])), flush=True)


if __name__ == "__main__":
    main()
