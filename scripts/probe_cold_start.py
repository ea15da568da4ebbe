#!/usr/bin/env python
"""Cold-start anatomy of one calibration run (VERDICT r3 #2).

bench.py's run 1 pays a multiple of the warm wall-clock even with the
persistent compilation cache fully populated. This probe runs ONE deit_small
W4A4 calibration in the current (fresh) process with phase timing and the
persistent-cache hit/miss log enabled, so the cold cost decomposes into:

  - client init (tunneled PJRT backend bring-up; 5 s healthy, ~150 s for up
    to ~10 min after any worker crash)
  - trace+lower+cache-load (Python tracing and disk-cache deserialization —
    per-process, unavoidable by a disk cache)
  - remote compiles (true cache misses, printed by the miss log)

Run:  python scripts/probe_cold_start.py   (fresh process, quiet host)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_explain_cache_misses", True)

from adalog_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from adalog_tpu.models.zoo import build_model  # noqa: E402
from adalog_tpu.utils.config import Config  # noqa: E402
from adalog_tpu.calib.calibrator import QuantCalibrator  # noqa: E402

t_import = time.time() - t0
print(f"imports: {t_import:.1f}s", flush=True)

t0 = time.time()
dev = jax.devices()
t_init = time.time() - t0
print(f"client init: {t_init:.1f}s ({dev})", flush=True)

cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
spec, params = build_model("deit_small", seed=0)
rng = np.random.default_rng(0)
batches = [rng.standard_normal((32, 224, 224, 3)).astype(np.float32)]

t0 = time.time()
calib = QuantCalibrator(spec, params, cfg)
calib.calibrate(batches)
new_params, qstate = calib.finish_calibration()
jax.tree_util.tree_map(lambda a: np.asarray(a), qstate)  # true sync
t_run1 = time.time() - t0
print(f"calibration run 1 (cold process): {t_run1:.1f}s", flush=True)

t0 = time.time()
calib = QuantCalibrator(spec, params, cfg)
calib.calibrate(batches)
new_params, qstate = calib.finish_calibration()
jax.tree_util.tree_map(lambda a: np.asarray(a), qstate)
t_run2 = time.time() - t0
print(f"calibration run 2 (warm process): {t_run2:.1f}s", flush=True)
print(f"COLD_ANATOMY import={t_import:.1f} init={t_init:.1f} "
      f"run1={t_run1:.1f} run2={t_run2:.1f} "
      f"per_process_overhead={t_run1 - t_run2:.1f}", flush=True)
